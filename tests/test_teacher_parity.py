"""Distillation-teacher parity: the torch ResNet-50 control shim vs the
JAX teacher.

The distillation control (BASELINE.md) feeds the SAME finetuned .pth to
both stacks: the reference's ``get_teacher`` builds the shim torchvision
resnet50 (tools/refcontrol/shims/torchvision/models.py), ours builds
``make_teacher_fn`` over resnet_apply_torch_sd
(myrtle_vision_tpu/models/resnet.py).  The control is only meaningful if
the two teachers agree on logits for the same weights."""
import numpy as np
import pytest

torch = pytest.importorskip("torch")


def test_shim_resnet50_matches_jax_teacher():
    import sys

    sys.path.insert(
        0, "tools/refcontrol/shims"
    )
    from torchvision.models import resnet50  # the shim

    from myrtle_vision_tpu.models.resnet import (
        random_state_dict,
        resnet_apply_torch_sd,
    )

    sd = random_state_dict("resnet50", num_classes=10, seed=3)
    model = resnet50(num_classes=10)
    missing, unexpected = model.load_state_dict(
        {k: torch.from_numpy(np.asarray(v)) for k, v in sd.items()},
        strict=True,
    )
    assert not missing and not unexpected
    model.eval()

    rng = np.random.RandomState(0)
    img = rng.randn(2, 3, 80, 80).astype(np.float32)
    with torch.no_grad():
        ref = model(torch.from_numpy(img)).numpy()
    ours = np.asarray(
        resnet_apply_torch_sd(sd, np.transpose(img, (0, 2, 3, 1)))
    )
    np.testing.assert_allclose(ours, ref, rtol=2e-4, atol=2e-4)
