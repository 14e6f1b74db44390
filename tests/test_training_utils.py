"""Unit tests: batch-size arithmetic, LR schedule, loader, checkpointing."""
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from myrtle_vision_tpu.training.optim import (
    create_optimizer,
    lr_at_epoch,
    set_learning_rate,
)
from myrtle_vision_tpu.utils.config import get_batch_sizes


class TestGetBatchSizes:
    """Exact parity with reference utils/utils.py:86-125."""

    def test_preferred_batch(self):
        assert get_batch_sizes(32, 2, 64) == (32, 1)

    def test_accumulation(self):
        assert get_batch_sizes(32, 2, 128) == (32, 2)

    def test_single_device_accum(self):
        assert get_batch_sizes(32, 1, 64) == (32, 2)

    def test_fallback_smaller_batch(self):
        # global 48 over 2 devices -> 24/device; target 32 unreachable;
        # largest divisor of 24 that is < 32 is 24
        assert get_batch_sizes(32, 2, 48) == (24, 1)

    def test_indivisible_raises(self):
        with pytest.raises(ValueError):
            get_batch_sizes(32, 3, 64)


class TestLrSchedule:
    CFG = {
        "lr": 6.25e-5,
        "min_lr": 1e-5,
        "warmup_lr": 1e-6,
        "warmup_epochs": 5,
        "epochs": 300,
        "seed": 1234,
    }

    def test_warmup_start(self):
        assert lr_at_epoch(self.CFG, 0) == pytest.approx(1e-6)

    def test_warmup_linear(self):
        lr2 = lr_at_epoch(self.CFG, 2)
        expected = 1e-6 + 2 * (6.25e-5 - 1e-6) / 5
        assert lr2 == pytest.approx(expected)

    def test_peak_after_warmup(self):
        assert lr_at_epoch(self.CFG, 5) == pytest.approx(6.25e-5)

    def test_cosine_midpoint(self):
        # halfway through the cosine cycle: (lr + min_lr) / 2
        mid = 5 + (300 - 5) // 2
        lr_mid = lr_at_epoch(self.CFG, mid)
        assert 1e-5 < lr_mid < 6.25e-5

    def test_cooldown_floor(self):
        assert lr_at_epoch(self.CFG, 300) == pytest.approx(1e-5)
        assert lr_at_epoch(self.CFG, 304) == pytest.approx(1e-5)

    def test_noise_active_and_deterministic(self):
        cfg = dict(self.CFG, lr_noise=0.1)
        a = lr_at_epoch(cfg, 200)
        b = lr_at_epoch(cfg, 200)
        assert a == b
        assert a != pytest.approx(lr_at_epoch(self.CFG, 200))


class TestOptimizer:
    TRAIN_CONFIG = {
        "optimizer": "adamw",
        "opt_eps": 1e-8,
        "opt_betas": None,
        "clip_grad": 1.0,
        "momentum": 0.9,
        "weight_decay": 0.05,
        "lr": 1e-3,
    }

    def test_set_learning_rate_with_clip_chain(self):
        tx = create_optimizer(self.TRAIN_CONFIG)
        params = {"kernel": jnp.ones((4, 4)), "bias": jnp.zeros((4,))}
        opt_state = tx.init(params)
        new_state = set_learning_rate(opt_state, 5e-4)
        grads = {"kernel": jnp.ones((4, 4)), "bias": jnp.ones((4,))}
        updates, _ = tx.update(grads, new_state, params)
        # lr actually applied
        assert np.abs(np.asarray(updates["kernel"])).max() < 1e-3

    def test_weight_decay_mask(self):
        tx = create_optimizer(dict(self.TRAIN_CONFIG, clip_grad=None))
        params = {"kernel": jnp.ones((4, 4)), "bias": jnp.ones((4,))}
        opt_state = tx.init(params)
        zero_grads = {
            "kernel": jnp.zeros((4, 4)),
            "bias": jnp.zeros((4,)),
        }
        updates, _ = tx.update(zero_grads, opt_state, params)
        # kernel decays toward zero, bias does not
        assert np.abs(np.asarray(updates["kernel"])).max() > 0
        np.testing.assert_array_equal(np.asarray(updates["bias"]), 0.0)


class TestLoader:
    def _dataset(self, n=10):
        class DS:
            def __len__(self):
                return n

            def __getitem__(self, i, rng=None):
                return {
                    "image": np.full((4, 4, 3), i, np.float32),
                    "label": np.int32(i),
                }

        return DS()

    def test_batching_and_drop_last(self):
        from myrtle_vision_tpu.data.loader import DataLoader

        loader = DataLoader(self._dataset(10), batch_size=4, drop_last=True)
        batches = list(loader.epoch(0))
        assert len(batches) == 2
        assert batches[0]["image"].shape == (4, 4, 4, 3)

    def test_shuffle_differs_by_epoch_and_is_seeded(self):
        from myrtle_vision_tpu.data.loader import DataLoader

        loader = DataLoader(
            self._dataset(64), batch_size=8, shuffle=True, seed=3
        )
        e0 = np.concatenate([b["label"] for b in loader.epoch(0)])
        e1 = np.concatenate([b["label"] for b in loader.epoch(1)])
        e0b = np.concatenate([b["label"] for b in loader.epoch(0)])
        assert not np.array_equal(e0, e1)
        np.testing.assert_array_equal(e0, e0b)

    def test_ragged_final_batch_without_drop_last(self):
        from myrtle_vision_tpu.data.loader import DataLoader

        loader = DataLoader(self._dataset(10), batch_size=4, drop_last=False)
        batches = list(loader.epoch(0))
        assert len(batches) == 3
        assert [b["image"].shape[0] for b in batches] == [4, 4, 2]

    def test_pad_last_single_shape_with_n_valid(self):
        from myrtle_vision_tpu.data.loader import DataLoader

        loader = DataLoader(
            self._dataset(10), batch_size=4, drop_last=False, pad_last=True
        )
        batches = list(loader.epoch(0))
        # one compiled shape: every batch is full-size
        assert [b["image"].shape[0] for b in batches] == [4, 4, 4]
        assert [b["_n_valid"] for b in batches] == [4, 4, 2]
        # the tail pads by repeating the last valid item
        np.testing.assert_array_equal(
            batches[2]["label"], np.array([8, 9, 9, 9], np.int32)
        )


class TestCheckpoint:
    def test_roundtrip(self, tmp_path):
        from myrtle_vision_tpu.training.trainer import TrainState
        from myrtle_vision_tpu.utils.checkpoint import (
            load_checkpoint,
            save_checkpoint,
        )

        tx = create_optimizer(
            {
                "optimizer": "adamw",
                "opt_eps": 1e-8,
                "opt_betas": None,
                "clip_grad": None,
                "momentum": 0.9,
                "weight_decay": 0.05,
                "lr": 1e-3,
            }
        )
        params = {"w": jnp.arange(6.0).reshape(2, 3)}
        state = TrainState(
            params=params,
            opt_state=tx.init(params),
            quant={},
            iteration=jnp.asarray(7, jnp.int32),
        )
        path = str(tmp_path / "ckpt")
        save_checkpoint(state, path)

        blank = TrainState(
            params={"w": jnp.zeros((2, 3))},
            opt_state=tx.init(params),
            quant={},
            iteration=jnp.asarray(0, jnp.int32),
        )
        restored, iteration = load_checkpoint(blank, path)
        assert iteration == 7
        np.testing.assert_array_equal(
            np.asarray(restored.params["w"]), np.asarray(params["w"])
        )

    def test_prepare_model_empty_path(self):
        from myrtle_vision_tpu.training.trainer import TrainState
        from myrtle_vision_tpu.utils.checkpoint import (
            prepare_model_and_load_ckpt,
        )

        state = TrainState(
            params={}, opt_state=(), quant={},
            iteration=jnp.asarray(0, jnp.int32),
        )
        _, iteration = prepare_model_and_load_ckpt(
            {"checkpoint_path": ""}, state
        )
        assert iteration == 0


class TestMetrics:
    def test_accuracy_topk(self):
        from myrtle_vision_tpu.utils.metrics import accuracy

        logits = jnp.array(
            [[0.1, 0.9, 0.0], [0.8, 0.1, 0.1], [0.0, 0.2, 0.8]]
        )
        target = jnp.array([1, 0, 1])
        top1, top2 = accuracy(logits, target, topk=(1, 2))
        assert float(top1) == pytest.approx(100 * 2 / 3)
        assert float(top2) == pytest.approx(100.0)

    def test_miou_streaming(self):
        from myrtle_vision_tpu.utils.metrics import MIoU

        m = MIoU(num_classes=3)
        pred = np.array([[0, 0], [1, 2]])
        gt = np.array([[0, 1], [1, 2]])
        m.add_img(pred, gt)
        per_class = m.get_per_class_iou()
        # class0: inter 1, union 2 -> 0.5; class1: inter 1, union 2 -> 0.5;
        # class2: 1/1
        np.testing.assert_allclose(per_class, [0.5, 0.5, 1.0])
        assert m.get_miou() == pytest.approx(2 / 3)


class TestNoDonate:
    def test_mvt_no_donate_step_runs_and_matches(self, monkeypatch):
        """MVT_NO_DONATE=1 (the XLA:CPU donated-buffer escape hatch,
        trainer.py) must produce the same update as the donating step."""
        from myrtle_vision_tpu.models.vit import ViT
        from myrtle_vision_tpu.training.classification import make_loss_fn
        from myrtle_vision_tpu.training.trainer import (
            init_train_state,
            make_train_step,
        )

        model = ViT(
            decoder="classification", image_size=80, patch_size=16,
            num_classes=3, dim=64, depth=1, heads=1, mlp_dim=128,
            dtype=jnp.float32,
        )
        tx = create_optimizer({
            "optimizer": "adamw", "opt_eps": 1e-8, "opt_betas": None,
            "clip_grad": None, "momentum": 0.9, "weight_decay": 0.05,
            "lr": 1e-3,
        })
        batch = {
            "image": jnp.ones((1, 2, 80, 80, 3), jnp.float32),
            "label": jnp.zeros((1, 2), jnp.int32),
        }
        rng = jax.random.PRNGKey(0)

        def run():
            state = init_train_state(
                model, tx, jax.random.PRNGKey(0),
                jnp.zeros((1, 80, 80, 3)),
            )
            step = make_train_step(make_loss_fn(model), tx, 1)
            for _ in range(2):
                state, metrics = step(state, batch, 1e-3, rng)
            return float(metrics["loss"]), jax.device_get(state.params)

        loss_don, params_don = run()
        monkeypatch.setenv("MVT_NO_DONATE", "1")
        loss_nod, params_nod = run()
        assert loss_don == loss_nod
        jax.tree_util.tree_map(
            np.testing.assert_array_equal, params_don, params_nod
        )
