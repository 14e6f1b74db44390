"""Distillation stack tests: ResNet teacher, DistillWrapper loss, e2e DeiT
training through the classification CLI (reference models/distill.py +
utils/models.py:14-22)."""
import json
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

TESTS_DIR = os.path.dirname(os.path.abspath(__file__))
REPO = os.path.dirname(TESTS_DIR)


class TestResNet:
    def test_resnet18_forward_shape(self):
        from myrtle_vision_tpu.models.resnet import (
            load_torch_resnet,
            random_state_dict,
            resnet_apply,
        )

        sd = random_state_dict("resnet18", num_classes=7)
        params = load_torch_resnet(sd, "resnet18")
        out = resnet_apply(params, jnp.zeros((2, 64, 64, 3)), "resnet18")
        assert out.shape == (2, 7)
        assert np.isfinite(np.asarray(out)).all()

    def test_resnet50_matches_torchvision_semantics(self):
        """Raw-state-dict apply must equal the folded-BN apply."""
        from myrtle_vision_tpu.models.resnet import (
            load_torch_resnet,
            random_state_dict,
            resnet_apply,
            resnet_apply_torch_sd,
        )

        sd = random_state_dict("resnet50", num_classes=5, seed=1)
        x = jnp.asarray(
            np.random.RandomState(0).rand(1, 64, 64, 3), jnp.float32
        )
        a = resnet_apply(load_torch_resnet(sd, "resnet50"), x, "resnet50")
        b = resnet_apply_torch_sd(sd, x, "resnet50")
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-4
        )

class TestDistillWrapper:
    def test_loss_composition(self):
        from myrtle_vision_tpu.models.distill import DistillWrapper
        from myrtle_vision_tpu.models.vit import ViT

        student = ViT(
            decoder="classification",
            image_size=80,
            patch_size=16,
            num_classes=4,
            dim=32,
            depth=1,
            heads=1,
            mlp_dim=64,
            dim_head=32,
            dtype=jnp.float32,
        )
        wrapper = DistillWrapper(student=student, temperature=3.0, alpha=0.5)
        img = jnp.zeros((2, 80, 80, 3))
        labels = jnp.array([0, 1])
        teacher_logits = jnp.array(
            [[5.0, 0, 0, 0], [0, 5.0, 0, 0]], jnp.float32
        )
        variables = wrapper.init(
            jax.random.PRNGKey(0), img, labels, teacher_logits
        )
        loss, logits = wrapper.apply(
            variables, img, labels, teacher_logits
        )
        assert logits.shape == (2, 4)
        assert float(loss) > 0
        # alpha=1 -> pure CE on student logits
        loss_ce, _ = wrapper.apply(
            variables, img, labels, teacher_logits, alpha=1.0
        )
        from myrtle_vision_tpu.training.optim import cross_entropy_loss

        expected = cross_entropy_loss(logits, labels)
        assert float(loss_ce) == pytest.approx(float(expected), rel=1e-5)

    def test_loss_matches_torch_kl_div(self):
        """distillation_loss must reproduce the reference's torch formula
        (distill.py:142-151) exactly."""
        torch = pytest.importorskip("torch")
        import torch.nn.functional as F

        from myrtle_vision_tpu.models.distill import distillation_loss

        rng = np.random.RandomState(0)
        student = rng.randn(4, 6).astype(np.float32)
        distill = rng.randn(4, 6).astype(np.float32)
        teacher = rng.randn(4, 6).astype(np.float32)
        labels = np.array([0, 2, 5, 1])
        T, alpha = 3.0, 0.5

        ours = float(
            distillation_loss(
                jnp.array(student), jnp.array(distill), jnp.array(teacher),
                jnp.array(labels), T, alpha,
            )
        )
        t_ce = F.cross_entropy(
            torch.from_numpy(student), torch.from_numpy(labels)
        )
        t_kl = F.kl_div(
            F.log_softmax(torch.from_numpy(distill) / T, dim=-1),
            F.softmax(torch.from_numpy(teacher) / T, dim=-1),
            reduction="batchmean",
        ) * T ** 2
        expected = float(t_ce * alpha + t_kl * (1 - alpha))
        assert ours == pytest.approx(expected, rel=1e-5)


class TestDistillE2E:
    def test_deit_training_runs(self, tmp_path):
        """Full DeiT path through the classification train CLI: student ViT
        + frozen ResNet teacher + distillation token."""
        import torch

        from myrtle_vision_tpu.models.resnet import random_state_dict
        from test_e2e_classification import make_config

        # teacher weights file
        sd = random_state_dict("resnet50", num_classes=3)
        weights_path = str(tmp_path / "teacher.pth")
        torch.save({k: torch.from_numpy(np.asarray(v))
                    for k, v in sd.items()}, weights_path)


        root = tmp_path / "resisc"
        from PIL import Image

        rng = np.random.RandomState(0)
        classes = ["a", "b", "c"]
        paths = []
        for ci, name in enumerate(classes):
            os.makedirs(root / "images" / name)
            for i in range(8):
                arr = rng.randint(0, 255, (48, 48, 3), dtype=np.uint8)
                rel = f"images/{name}/img_{i}.jpg"
                Image.fromarray(arr).save(root / rel)
                paths.append(rel)
        for split, sl in [("train", slice(0, 16)), ("val", slice(16, 20)),
                          ("test", slice(20, 24))]:
            with open(root / f"{split}_imagepaths.txt", "w") as f:
                f.write("\n".join(paths[sl]) + "\n")
        with open(root / "label_map.json", "w") as f:
            json.dump({n: i for i, n in enumerate(classes)}, f)

        config = make_config(root, tmp_path)
        config["train_config"]["epochs"] = 1
        config["distiller_config"] = {
            "temperature": 3,
            "alpha": 0.5,
            "teacher_weights_path": weights_path,
        }
        from conftest import load_script_module

        train_mod = load_script_module(
            os.path.join(REPO, "classification", "train.py"),
            "cls_train_script_distill",
        )
        train_mod.train(config)
        out_dir = config["train_config"]["output_directory"]
        assert sorted(os.listdir(out_dir))
