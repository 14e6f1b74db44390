"""Minimal pycocotools shim for running the reference detection stack as
an accuracy control (pycocotools is not installable in this image).

Provides the surface the reference uses (datasets/coco_eval.py +
torchvision-style CocoDetection): ``pycocotools.coco.COCO``,
``pycocotools.cocoeval.COCOeval`` (bbox protocol, including the
internals — params/_prepare/computeIoU/evaluateImg — that the
reference's vendored ``evaluate()`` drives directly), and a
``pycocotools.mask`` stub (segm/keypoints paths are never hit by the
reference's bbox-only configs).

The evaluation protocol implementation mirrors
myrtle_vision_tpu/eval/coco_eval.py (the from-scratch numpy COCOeval
this framework uses), reorganized into pycocotools' class shape; both
are differentially tested against the golden fixture in
tests/test_coco_eval.py.
"""
