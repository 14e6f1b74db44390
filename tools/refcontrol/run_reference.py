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


def _repair_distill():
    """The reference's DistillableViT.forward references ``self.pool``,
    ``self.to_latent`` and ``self.mlp_head`` (distill.py:76-80), attributes
    that do not exist on its ViT (vit.py:164-265 defines ``self.decoder``)
    — EVERY student forward crashes with AttributeError, distill token or
    not (SURVEY §2.2).  For the distillation control runs, restore the
    intended semantics — cls-token pooling through the model's own
    classification decoder, with the main ViT.forward's on-the-fly
    pos-embedding interpolation (vit.py:291-302) so non-224px controls run
    — as a replacement forward.  Everything else (patchify, quant stubs,
    FloatFunctional cats, ``_attend``'s dropout+transformer, the distill
    token split) keeps the reference's own code paths and modules, so the
    state dict is exactly the plain-ViT naming."""
    import torch.nn.functional as F
    from myrtle_vision.models.distill import DistillableViT

    def forward(self, img, distill_token=None):
        b_dim, c_dim, h_dim, w_dim = img.shape
        p = self.patch_size
        x = (
            img.reshape(b_dim, c_dim, h_dim // p, p, w_dim // p, p)
            .permute(0, 2, 4, 3, 5, 1)
            .reshape(b_dim, (h_dim // p) * (w_dim // p), p * p * c_dim)
        )
        x = self.quant_img(x)
        with self.cm_patch_to_embedding:
            x = self.patch_to_embedding(x)
        b = x.shape[0]

        cls_tokens = self.cls_token.repeat(b, 1, 1)
        cls_tokens = self.quant_cls_token(cls_tokens)
        x = self.cls_token_cat.cat((cls_tokens, x), dim=1)

        # on-the-fly pos-embedding interpolation, verbatim semantics of
        # the reference ViT.forward (vit.py:291-302)
        pos_cls = self.pos_embedding[:, 0:1, :]
        pos = self.pos_embedding[:, 1:, :].transpose(1, 2).reshape(
            1, -1, 14, 14
        )
        pos = F.interpolate(
            pos, size=(h_dim // p, w_dim // p), mode="bicubic",
            align_corners=False,
        )
        pos = pos.reshape(1, -1, (h_dim // p) * (w_dim // p)).transpose(
            1, 2
        )
        pos = self.pos_embedding_cat.cat((pos_cls, pos), dim=1)
        x = self.pos_embedding_add.add(
            x, self.quant_pos_embedding(pos.repeat(x.size(0), 1, 1))
        )

        if distill_token is not None:
            # distillation token appended at the end (distill.py:65-69)
            distill_tokens = distill_token.repeat(b, 1, 1)
            distill_tokens = self.quant_distill_token(distill_tokens)
            x = self.distill_token_cat.cat((x, distill_tokens), dim=1)

        x = self._attend(x)  # dropout + transformer (distill.py:29-33)

        if distill_token is not None:
            x, distill_tokens = x[:, :-1], x[:, -1]

        out = self.decoder(x)  # ClassificationDecoder pools the cls token
        out = self.dequant_out(out)

        if distill_token is not None:
            distill_tokens = self.dequant_distill_tokens(distill_tokens)
            return out, distill_tokens
        return out

    DistillableViT.forward = forward


def main():
    if len(sys.argv) < 2:
        raise SystemExit(__doc__)
    args = sys.argv[1:]
    repair = "--repair-detection" in args
    if repair:
        args.remove("--repair-detection")
    repair_distill = "--repair-distill" in args
    if repair_distill:
        args.remove("--repair-distill")
    script = args[0]
    shims = os.path.join(os.path.dirname(os.path.abspath(__file__)), "shims")
    sys.path.insert(0, shims)
    sys.path.insert(0, "/root/reference/src")
    _patch_cuda_to_cpu()
    if repair:
        _repair_detection()
    if repair_distill:
        _repair_distill()
    sys.argv = [script] + args[1:]
    runpy.run_path(script, run_name="__main__")


if __name__ == "__main__":
    main()
