"""pycocotools.mask shim — import-surface stub.

The reference imports this module (datasets/coco_eval.py:20) but only
calls it on the segm/keypoints iou types; the detection configs are
bbox-only, so every entry point raises if reached.
"""


def _unsupported(*args, **kwargs):
    raise NotImplementedError(
        "pycocotools.mask shim: segm mask encoding is not used by the "
        "bbox-only reference detection configs"
    )


encode = _unsupported
decode = _unsupported
iou = _unsupported
area = _unsupported
toBbox = _unsupported
frPyObjects = _unsupported
merge = _unsupported
