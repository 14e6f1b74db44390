"""torchvision.transforms.functional shim (PIL-backed, documented
torchvision semantics).

Surface used by the reference stacks:
  - segmentation transforms (reference transforms/segmentation.py):
    resize, hflip, resized_crop, get_image_size
  - detection transforms (reference transforms/detection.py):
    crop, hflip, resize, pad, to_tensor, normalize

All geometry functions operate on PIL images (the reference applies them
before ToTensor); to_tensor/normalize follow the tensor conventions of
the sibling class shims.
"""
import numbers

import numpy as np
import torch
from PIL import Image

from . import InterpolationMode, Normalize, ToTensor


def _resample(interpolation):
    if isinstance(interpolation, InterpolationMode):
        return interpolation.value
    return interpolation  # already a PIL resample int


def get_image_size(img):
    """Returns [w, h] (torchvision convention)."""
    return list(img.size)


def resize(img, size, interpolation=InterpolationMode.BILINEAR):
    resample = _resample(interpolation)
    if isinstance(size, numbers.Number):
        # shorter edge -> size, preserve aspect ratio
        w, h = img.size
        if (w <= h and w == size) or (h <= w and h == size):
            return img
        if w < h:
            ow = int(size)
            oh = int(round(size * h / w))
        else:
            oh = int(size)
            ow = int(round(size * w / h))
        return img.resize((ow, oh), resample)
    h, w = size
    return img.resize((int(w), int(h)), resample)


def hflip(img):
    return img.transpose(Image.FLIP_LEFT_RIGHT)


def crop(img, top, left, height, width):
    return img.crop((left, top, left + width, top + height))


def resized_crop(
    img, top, left, height, width, size, interpolation=InterpolationMode.BILINEAR
):
    return resize(crop(img, top, left, height, width), size, interpolation)


def pad(img, padding, fill=0, padding_mode="constant"):
    """padding = (left, top, right, bottom) or (lr, tb) or int."""
    assert padding_mode == "constant"
    if isinstance(padding, numbers.Number):
        pl = pt = pr = pb = int(padding)
    elif len(padding) == 2:
        pl = pr = int(padding[0])
        pt = pb = int(padding[1])
    else:
        pl, pt, pr, pb = (int(p) for p in padding)
    w, h = img.size
    out = Image.new(img.mode, (w + pl + pr, h + pt + pb), fill)
    out.paste(img, (pl, pt))
    return out


def to_tensor(img):
    return ToTensor()(img)


def normalize(tensor, mean, std, inplace=False):
    return Normalize(mean, std)(tensor)


def interpolate(*args, **kwargs):  # masks-only path, never hit for bbox
    raise NotImplementedError(
        "functional.interpolate shim: segmentation-mask detection targets "
        "are not used by the reference configs"
    )
