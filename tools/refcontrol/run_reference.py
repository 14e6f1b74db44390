#!/usr/bin/env python
"""Run a reference entry script (torch, CPU) with shimmed dependencies.

The accuracy-parity control runs recorded in BASELINE.md execute the
REFERENCE stack itself from /root/reference (read-only), on CPU, against
the same generated dataset this framework trains on.  qtorch / timm /
torchvision are not installable in this image, so minimal shims
(tools/refcontrol/shims/) provide exactly the surface the reference uses;
their semantics are documented in each shim module.

Usage:
    python tools/refcontrol/run_reference.py \
        /root/reference/classification/train.py -c <config.json>
"""
import os
import runpy
import sys


def _patch_cuda_to_cpu():
    """The reference eval CLIs hardcode device="cuda"
    (classification/test.py:27, test_quantize.py:49-53); on this CPU-only
    torch build, transparently map cuda -> cpu so they run unmodified."""
    import torch

    if torch.cuda.is_available():
        return

    def _fix(a):
        if isinstance(a, str) and a.startswith("cuda"):
            return "cpu"
        if isinstance(a, torch.device) and a.type == "cuda":
            return torch.device("cpu")
        if isinstance(a, int) and not isinstance(a, bool):  # .to(rank)
            return "cpu"
        return a

    tensor_to = torch.Tensor.to
    module_to = torch.nn.Module.to

    def t_to(self, *args, **kwargs):
        args = tuple(_fix(a) for a in args)
        if "device" in kwargs:
            kwargs["device"] = _fix(kwargs["device"])
        return tensor_to(self, *args, **kwargs)

    def m_to(self, *args, **kwargs):
        args = tuple(_fix(a) for a in args)
        if "device" in kwargs:
            kwargs["device"] = _fix(kwargs["device"])
        return module_to(self, *args, **kwargs)

    torch.Tensor.to = t_to
    torch.nn.Module.to = m_to


def _repair_detection():
    """The reference's detection forward never appends its det tokens:
    ``self.decoder`` is clobbered from the decoder NAME to the decoder
    MODULE (vit.py:196 vs 235-252), so the ``self.decoder == "detection"``
    checks (vit.py:287,299) are always False.  For the detection control
    runs the intended (YOLOS) semantics are restored exactly as in
    tests/test_reference_parity.py::_detection_repair: DetectionDecoder
    gets a string-aware __eq__."""
    from myrtle_vision.models.vit import DetectionDecoder

    DetectionDecoder.__eq__ = lambda self, other: other == "detection"
    DetectionDecoder.__hash__ = object.__hash__


def main():
    if len(sys.argv) < 2:
        raise SystemExit(__doc__)
    args = sys.argv[1:]
    repair = "--repair-detection" in args
    if repair:
        args.remove("--repair-detection")
    script = args[0]
    shims = os.path.join(os.path.dirname(os.path.abspath(__file__)), "shims")
    sys.path.insert(0, shims)
    sys.path.insert(0, "/root/reference/src")
    _patch_cuda_to_cpu()
    if repair:
        _repair_detection()
    sys.argv = [script] + args[1:]
    runpy.run_path(script, run_name="__main__")


if __name__ == "__main__":
    main()
