"""End-to-end classification training on a synthetic RESISC-style dataset.

Covers BASELINE configs 1-2 at tiny scale on the virtual 8-device CPU mesh:
the full train entry point (SPMD train step, grad accumulation, checkpoint,
validation) and the eval path, without any real data or hardware
(SURVEY.md §4 test strategy).
"""
import json
import os

import numpy as np
import pytest
from PIL import Image

TESTS_DIR = os.path.dirname(os.path.abspath(__file__))
REPO = os.path.dirname(TESTS_DIR)


@pytest.fixture(scope="module")
def synthetic_resisc(tmp_path_factory):
    """Tiny 3-class image-folder dataset with split files + label map."""
    root = tmp_path_factory.mktemp("resisc")
    classes = ["desert", "forest", "river"]
    rng = np.random.RandomState(0)
    train_paths, val_paths, test_paths = [], [], []
    for ci, name in enumerate(classes):
        os.makedirs(root / "images" / name)
        for i in range(14):
            arr = rng.randint(0, 255, (48, 48, 3), dtype=np.uint8)
            # class-dependent tint so the model can learn something
            arr[..., ci % 3] = np.clip(arr[..., ci % 3] + 120, 0, 255)
            # label is path component 1 (reference utils/utils.py:43)
            rel = f"images/{name}/img_{i:02}.jpg"
            Image.fromarray(arr).save(root / rel)
            (train_paths if i < 10 else val_paths if i < 12 else test_paths
             ).append(rel)
    for split, paths in [
        ("train", train_paths), ("val", val_paths), ("test", test_paths)
    ]:
        with open(root / f"{split}_imagepaths.txt", "w") as f:
            f.write("\n".join(paths) + "\n")
    with open(root / "label_map.json", "w") as f:
        json.dump({n: i for i, n in enumerate(classes)}, f)
    return root, classes


def make_config(root, tmp_path, **vit_overrides):
    data_config = {
        "dataset_path": str(root),
        "train_files": "train_imagepaths.txt",
        "valid_files": "val_imagepaths.txt",
        "test_files": "test_imagepaths.txt",
        "label_map": "label_map.json",
        "number_of_classes": 3,
        "transform_ops_train": {
            "RandomResizedCrop": 80,
            "RandomHorizontalFlip": None,
            "Normalize": {"Mean": [0.5, 0.5, 0.5], "Std": [0.5, 0.5, 0.5]},
        },
        "transform_ops_val": {
            "Resize": 80,
            "Normalize": {"Mean": [0.5, 0.5, 0.5], "Std": [0.5, 0.5, 0.5]},
        },
    }
    data_config_path = str(tmp_path / "data_config.json")
    with open(data_config_path, "w") as f:
        json.dump(data_config, f)
    vit_config = {
        "decoder": "classification",
        "image_size": 80,
        "patch_size": 16,
        "embed_dim": 32,
        "depth": 1,
        "heads": 1,
        "mlp_dim": 64,
        "dropout": 0.0,
        "emb_dropout": 0.0,
        "q_format": "FP32",
        "compute_dtype": "float32",
    }
    vit_config.update(vit_overrides)
    return {
        "train_config": {
            "output_directory": str(tmp_path / "ckpts"),
            "checkpoint_path": "",
            "epochs": 2,
            "local_batch_size": 2,
            "global_batch_size": 16,
            "iters_per_checkpoint": 1,
            "iters_per_val": 2,
            "seed": 7,
            "drop_last_batch": True,
            "optimizer": "adamw",
            "opt_eps": 1e-8,
            "opt_betas": None,
            "clip_grad": None,
            "momentum": 0.9,
            "weight_decay": 0.05,
            "scheduler": "cosine",
            "lr": 1e-3,
            "lr_noise": None,
            "warmup_lr": 1e-6,
            "min_lr": 1e-5,
            "decay_epochs": 15,
            "warmup_epochs": 0,
            "cooldown_epochs": 0,
            "patience_epochs": 5,
            "decay_rate": 0.1,
            "distributed": True,
            "pretrained_backbone": None,
        },
        "data_config_path": data_config_path,
        "dist_config": {
            "dist_backend": "nccl",
            "dist_url": "tcp://localhost:54321",
        },
        "vit_config": vit_config,
    }


def _load_train_module():
    from conftest import load_script_module

    return load_script_module(
        os.path.join(REPO, "classification", "train.py"), "cls_train_script"
    )


class TestEndToEnd:
    def test_train_checkpoints_and_eval(self, synthetic_resisc, tmp_path):
        root, classes = synthetic_resisc
        config = make_config(root, tmp_path)
        train_mod = _load_train_module()
        train_mod.train(config)

        out_dir = config["train_config"]["output_directory"]
        ckpts = sorted(os.listdir(out_dir))
        assert ckpts, "no checkpoints written"

        # evaluate the final checkpoint through the test CLI path
        config["train_config"]["checkpoint_path"] = os.path.join(
            out_dir, ckpts[-1]
        )
        from conftest import load_script_module

        test_mod = load_script_module(
            os.path.join(REPO, "classification", "test.py"),
            "cls_test_script",
        )
        test_mod.test_deit(config)

    def test_qat_fp16_and_int8_with_quantized_eval(
        self, synthetic_resisc, tmp_path
    ):
        """BASELINE config 3: QAT training with the format active, then
        test_quantize --quantized_ckpt (reference test_quantize.py flow)."""
        root, _ = synthetic_resisc
        from conftest import load_script_module

        for fmt in ("FP16_16", "PyTorchINT8"):
            config = make_config(root, tmp_path, q_format=fmt)
            config["train_config"]["epochs"] = 1
            config["train_config"]["output_directory"] = str(
                tmp_path / f"qat_{fmt}"
            )
            train_mod = _load_train_module()
            train_mod.train(config)
            out_dir = config["train_config"]["output_directory"]
            ckpt = sorted(os.listdir(out_dir))[-1]
            config["train_config"]["checkpoint_path"] = os.path.join(
                out_dir, ckpt
            )
            tq = load_script_module(
                os.path.join(REPO, "classification", "test_quantize.py"),
                f"cls_tq_script_{fmt}",
            )
            tq.test_deit(config, calib_steps=1, quantized_ckpt=True)

    def test_resume_from_checkpoint(self, synthetic_resisc, tmp_path):
        root, _ = synthetic_resisc
        config = make_config(root, tmp_path)
        config["train_config"]["epochs"] = 1
        train_mod = _load_train_module()
        train_mod.train(config)
        out_dir = config["train_config"]["output_directory"]
        ckpt = sorted(os.listdir(out_dir))[-1]

        config2 = make_config(root, tmp_path)
        config2["train_config"]["checkpoint_path"] = os.path.join(
            out_dir, ckpt
        )
        config2["train_config"]["epochs"] = 2
        train_mod.train(config2)


class TestTensorParallelEndToEnd:
    def test_train_cli_engages_fused_tp(
        self, synthetic_resisc, tmp_path, capsys
    ):
        """Full trainer CLI with dist_config tensor_parallel=2 on the
        8-device virtual mesh: the fused-TP gate (parallel/tp.py
        fused_gate) must engage (heads/mlp divide, dropout 0, FP32,
        short sequence), training must run, and checkpoints must load
        back through the non-TP eval path (params stay replicated over
        'model' — the checkpoint schema is unchanged)."""
        import jax

        if len(jax.devices()) < 8:
            pytest.skip("needs the 8-device virtual mesh")
        root, classes = synthetic_resisc
        # heads=2 / mlp divisible by 2 so the fused gate engages
        config = make_config(root, tmp_path, embed_dim=64, heads=2)
        config["dist_config"]["tensor_parallel"] = 2
        config["train_config"]["epochs"] = 1
        train_mod = _load_train_module()
        train_mod.train(config)
        out = capsys.readouterr().out
        assert "fused-kernel head sharding (x2)" in out, out[-2000:]
        assert "(data=4, model=2)" in out

        out_dir = config["train_config"]["output_directory"]
        ckpts = sorted(os.listdir(out_dir))
        assert ckpts, "no checkpoints written"
        config["train_config"]["checkpoint_path"] = os.path.join(
            out_dir, ckpts[-1]
        )
        from conftest import load_script_module

        test_mod = load_script_module(
            os.path.join(REPO, "classification", "test.py"),
            "cls_test_script_tp",
        )
        test_mod.test_deit(config)
