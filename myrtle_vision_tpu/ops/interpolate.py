"""Separable resize as precomputed weight matmuls (torch-exact kernels).

torch.nn.functional.interpolate's bicubic uses the cubic convolution kernel
with A = -0.75 and half-pixel sampling (align_corners=False); JAX's
``jax.image.resize`` uses the Keys kernel (A = -0.5), which diverges enough
to break positional-embedding parity with timm/reference checkpoints
(reference: src/myrtle_vision/models/vit.py:296 interpolates pos embeddings
bicubically every forward).

Because the source/target grids are static under jit, the resize is
expressed as two small constant weight matrices applied as matmuls:
``out = W_h @ img @ W_w^T`` — this hits the MXU instead of gather pipelines
and fuses cleanly.  No antialiasing (matching torch's default).
"""
from __future__ import annotations

import functools

import jax.numpy as jnp
import numpy as np


def _cubic_kernel(t: np.ndarray, a: float) -> np.ndarray:
    """Cubic convolution kernel (Keys); torch uses a=-0.75."""
    t = np.abs(t)
    out = np.where(
        t <= 1.0,
        (a + 2.0) * t ** 3 - (a + 3.0) * t ** 2 + 1.0,
        np.where(
            t < 2.0,
            a * t ** 3 - 5.0 * a * t ** 2 + 8.0 * a * t - 4.0 * a,
            0.0,
        ),
    )
    return out


@functools.lru_cache(maxsize=None)
def _resize_matrix(src: int, dst: int, a: float = -0.75) -> np.ndarray:
    """(dst, src) bicubic weight matrix, half-pixel centers, edge clamp —
    torch interpolate(mode='bicubic', align_corners=False) semantics."""
    scale = src / dst
    out_coord = (np.arange(dst) + 0.5) * scale - 0.5
    base = np.floor(out_coord).astype(np.int64)
    frac = out_coord - base
    w = np.zeros((dst, src), np.float64)
    for offset in range(-1, 3):
        idx = np.clip(base + offset, 0, src - 1)
        weight = _cubic_kernel(frac - offset, a)
        np.add.at(w, (np.arange(dst), idx), weight)
    return w.astype(np.float32)


@functools.lru_cache(maxsize=None)
def _linear_resize_matrix(src: int, dst: int) -> np.ndarray:
    """(dst, src) bilinear weight matrix, half-pixel centers, edge clamp —
    torch interpolate(mode='bilinear', align_corners=False) semantics."""
    scale = src / dst
    out_coord = (np.arange(dst) + 0.5) * scale - 0.5
    base = np.floor(out_coord).astype(np.int64)
    frac = out_coord - base
    w = np.zeros((dst, src), np.float64)
    for offset in range(2):
        idx = np.clip(base + offset, 0, src - 1)
        weight = np.where(offset == 0, 1.0 - frac, frac)
        np.add.at(w, (np.arange(dst), idx), weight)
    return w.astype(np.float32)


def _apply_separable(img, wh, ww):
    """img: (..., H, W, C); apply (H'->H) and (W'->W) weight matrices.

    Forced to full fp32 precision: TPU fp32 matmuls default to bf16 MXU
    passes, which would break bit-parity with torch interpolation; these
    matrices are tiny so HIGHEST costs nothing.
    """
    import jax

    wh = jnp.asarray(wh)
    ww = jnp.asarray(ww)
    out = jnp.einsum(
        "oh,...hwc->...owc", wh, img.astype(jnp.float32),
        precision=jax.lax.Precision.HIGHEST,
    )
    out = jnp.einsum(
        "pw,...owc->...opc", ww, out, precision=jax.lax.Precision.HIGHEST
    )
    return out


def resize_bicubic(img, out_h: int, out_w: int):
    """torch-exact bicubic resize of (..., H, W, C) to (..., out_h, out_w, C)."""
    h, w = img.shape[-3], img.shape[-2]
    return _apply_separable(
        img, _resize_matrix(h, out_h), _resize_matrix(w, out_w)
    )


def resize_bilinear(img, out_h: int, out_w: int):
    """torch-exact bilinear resize of (..., H, W, C)."""
    h, w = img.shape[-3], img.shape[-2]
    return _apply_separable(
        img, _linear_resize_matrix(h, out_h), _linear_resize_matrix(w, out_w)
    )
