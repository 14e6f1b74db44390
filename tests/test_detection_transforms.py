"""Detection transform DSL tests (reference transforms/detection.py:
functional ops semantics + from_config interpretation)."""
import numpy as np
from PIL import Image

from myrtle_vision_tpu.transforms import detection as T


def make_sample(w=100, h=80, boxes=((10, 10, 30, 40),)):
    img = Image.new("RGB", (w, h), (128, 128, 128))
    boxes = np.asarray(boxes, np.float32)
    target = {
        "boxes": boxes,
        "labels": np.arange(len(boxes), dtype=np.int32),
        "area": (boxes[:, 2] - boxes[:, 0]) * (boxes[:, 3] - boxes[:, 1]),
        "iscrowd": np.zeros(len(boxes), np.int32),
        "orig_size": np.array([h, w]),
        "size": np.array([h, w]),
        "image_id": np.int64(1),
    }
    return img, target


class TestFunctionalOps:
    def test_hflip_boxes(self):
        img, tgt = make_sample(100, 80, [(10, 10, 30, 40)])
        _, out = T.hflip(img, tgt)
        np.testing.assert_allclose(out["boxes"][0], [70, 10, 90, 40])

    def test_resize_mod16_snapping(self):
        # min side 80 -> requested 100 -> (100, 125) -> snapped (96, 112)
        img, tgt = make_sample(100, 80)
        out_img, out = T.resize(img, tgt, 100)
        assert out_img.size == (112, 96)[::-1] or out_img.size == (112, 96)
        # size is [h, w]
        assert out["size"].tolist() == [96, 112]
        assert out["size"][0] % 16 == 0 and out["size"][1] % 16 == 0

    def test_resize_max_size_cap(self):
        # 300x100 with size 200, max 250: 200*3 = 600 > 250 ->
        # size = round(250*100/300) = 83 -> h=83->80, w=249->240
        img, tgt = make_sample(300, 100)
        out_img, out = T.resize(img, tgt, 200, max_size=250)
        h, w = out["size"]
        assert h % 16 == 0 and w % 16 == 0
        assert max(h, w) <= 250

    def test_resize_scales_boxes_and_area(self):
        img, tgt = make_sample(100, 80, [(10, 10, 30, 40)])
        out_img, out = T.resize(img, tgt, 160)
        rw = out_img.size[0] / 100
        rh = out_img.size[1] / 80
        np.testing.assert_allclose(
            out["boxes"][0], [10 * rw, 10 * rh, 30 * rw, 40 * rh], rtol=1e-5
        )
        np.testing.assert_allclose(
            out["area"][0], 20 * 30 * rw * rh, rtol=1e-5
        )

    def test_crop_clamps_and_drops_empty(self):
        img, tgt = make_sample(
            100, 80, [(10, 10, 30, 40), (60, 60, 90, 75)]
        )
        _, out = T.crop(img, tgt, (0, 0, 50, 50))  # top-left 50x50
        # second box is entirely outside -> dropped
        assert len(out["boxes"]) == 1
        np.testing.assert_allclose(out["boxes"][0], [10, 10, 30, 40])
        assert out["labels"].tolist() == [0]

    def test_normalize_boxes_to_cxcywh(self):
        img, tgt = make_sample(100, 80, [(10, 10, 30, 40)])
        arr = np.asarray(img, np.float32) / 255.0
        _, out = T.Normalize([0.5] * 3, [0.5] * 3)(arr, tgt, None)
        np.testing.assert_allclose(
            out["boxes"][0],
            [20 / 100, 25 / 80, 20 / 100, 30 / 80],
            rtol=1e-5,
        )


class TestFromConfig:
    def test_val_pipeline_structure(self):
        pipeline = T.from_config(
            {
                "RandomResize": {"scales": [800],
                                 "max_size_ratio": [1333, 800]},
                "Normalize": {"Mean": [0.5] * 3, "Std": [0.5] * 3},
            }
        )
        kinds = [type(t).__name__ for t in pipeline.transforms]
        assert kinds == ["RandomResize", "ToArray", "Normalize"]
        rr = pipeline.transforms[0]
        assert rr.max_size == 800 * 1333 // 800

    def test_train_pipeline_with_randomselect(self):
        pipeline = T.from_config(
            {
                "RandomHorizontalFlip": None,
                "RandomSelect": {
                    "RandomResize": {"scales": [256, 512],
                                     "max_size_ratio": [1333, 800]},
                    "Compose": {
                        "PreRandomResize": {"scales": [400]},
                        "RandomSizeCrop": [384, 600],
                        "PostRandomResize": {"scales": [256],
                                             "max_size_ratio": [1333, 800]},
                    },
                },
                "Normalize": {"Mean": [0.5] * 3, "Std": [0.5] * 3},
            }
        )
        kinds = [type(t).__name__ for t in pipeline.transforms]
        assert kinds == [
            "RandomHorizontalFlip", "RandomSelect", "ToArray", "Normalize",
        ]
        select = pipeline.transforms[1]
        assert type(select.transforms1).__name__ == "RandomResize"
        inner = select.transforms2
        inner_kinds = [type(t).__name__ for t in inner.transforms]
        assert inner_kinds == [
            "RandomResize", "RandomSizeCrop", "RandomResize",
        ]

    def test_pipeline_executes(self):
        pipeline = T.from_config(
            {
                "RandomHorizontalFlip": None,
                "RandomResize": {"scales": [64, 96],
                                 "max_size_ratio": None},
                "Normalize": {"Mean": [0.5] * 3, "Std": [0.5] * 3},
            }
        )
        img, tgt = make_sample(100, 80)
        rng = np.random.default_rng(0)
        arr, out = pipeline(img, tgt, rng)
        assert arr.dtype == np.float32
        assert arr.shape[0] % 16 == 0 and arr.shape[1] % 16 == 0
        assert (out["boxes"] <= 1.0).all() and (out["boxes"] >= 0.0).all()


class TestCollate:
    def test_bucketing_and_padding(self):
        items = []
        for w, h, n_boxes in [(100, 80, 2), (140, 120, 1)]:
            img, tgt = make_sample(w, h)
            arr = np.zeros((h, w, 3), np.float32)
            tgt["boxes"] = np.tile(
                np.array([[0.5, 0.5, 0.2, 0.2]], np.float32), (n_boxes, 1)
            )
            tgt["labels"] = np.zeros(n_boxes, np.int32)
            items.append((arr, tgt))
        batch = T.collate_detection(items, max_boxes=5, bucket=64)
        assert batch["image"].shape == (2, 128, 192, 3)
        assert batch["labels"].shape == (2, 5)
        assert batch["valid"].sum() == 3
        assert batch["size"][0].tolist() == [80, 100]

    def test_default_bucket_is_reference_geometry(self):
        """The default granularity is the patch size (16): for mod-16
        inputs (everything the resize DSL emits — it snaps H,W down to
        multiples of 16 like the reference's detection.py:188-207), the
        collated canvas is EXACTLY the batch max, i.e. the reference's
        NestedTensor padding geometry (detection.py:59-81).  Round 3
        measured that a coarser bucket (160 -> 256 canvas) makes models
        from the two stacks non-comparable (BASELINE.md row 5)."""
        items = []
        for w, h in [(160, 160), (144, 160)]:
            img, tgt = make_sample(w, h)
            items.append((np.zeros((h, w, 3), np.float32), tgt))
        batch = T.collate_detection(items, max_boxes=4)
        assert batch["image"].shape == (2, 160, 160, 3)

    def test_bucket_env_override(self, monkeypatch):
        monkeypatch.setenv("MVT_COLLATE_BUCKET", "128")
        img, tgt = make_sample(160, 160)
        batch = T.collate_detection(
            [(np.zeros((160, 160, 3), np.float32), tgt)], max_boxes=4
        )
        assert batch["image"].shape == (1, 256, 256, 3)


class TestAuxTransforms:
    def test_random_crop_fixed_size(self):
        img, target = make_sample(100, 80)
        rng = np.random.default_rng(0)
        out, t = T.RandomCrop((48, 64))(img, target, rng)
        assert out.size == (64, 48)
        assert tuple(t["size"]) == (48, 64)

    def test_random_erasing_erases_region(self):
        img = np.ones((64, 64, 3), np.float32)
        rng = np.random.default_rng(0)
        out, _ = T.RandomErasing(p=1.0, value=0.0)(img, {"x": 1}, rng)
        assert (out == 0).any() and (out == 1).any()
        # p=0 leaves the image untouched
        out2, _ = T.RandomErasing(p=0.0)(img, None, rng)
        assert (out2 == 1).all()


def test_dlrsd_palette():
    from myrtle_vision_tpu.utils.colors import (
        colorize_mask,
        dlrsd_colors,
        palette,
    )

    colors = dlrsd_colors()
    assert len(colors) == 17
    assert colors["airplane"] == [166, 202, 240]
    assert colors["water"] == [0, 255, 255]
    pal = palette()
    assert pal.shape == (17, 3) and pal.dtype == np.uint8
    rgb = colorize_mask(np.array([[0, 16], [3, 3]]))
    assert rgb.shape == (2, 2, 3)
    assert tuple(rgb[0, 0]) == (166, 202, 240)
    assert tuple(rgb[1, 0]) == (255, 0, 0)  # cars
