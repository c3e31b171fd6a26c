"""Bilinear/bicubic resize with torch semantics, including align_corners=True.

The AVS decoder upsampling requires F.interpolate(..., mode='bilinear',
align_corners=True) parity (AVS/model/Swin_AVSModel.py:107-109); jax.image.resize
only implements the half-pixel (align_corners=False) convention, so the
align_corners=True path is built from an explicit gather + lerp.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def _axis_weights(in_size: int, out_size: int, align_corners: bool):
    if align_corners and out_size > 1:
        src = jnp.arange(out_size, dtype=jnp.float32) * (in_size - 1) / (out_size - 1)
    else:
        scale = in_size / out_size
        src = (jnp.arange(out_size, dtype=jnp.float32) + 0.5) * scale - 0.5
        src = jnp.clip(src, 0.0, in_size - 1)
    lo = jnp.floor(src).astype(jnp.int32)
    hi = jnp.minimum(lo + 1, in_size - 1)
    w = src - lo.astype(jnp.float32)
    return lo, hi, w


def resize_bilinear(x, out_h: int, out_w: int, align_corners: bool = False):
    """x: (..., H, W, C) -> (..., out_h, out_w, C); torch bilinear semantics
    (no antialiasing, matching F.interpolate)."""
    dt = x.dtype
    xf = x.astype(jnp.float32)
    H, W = x.shape[-3], x.shape[-2]
    lo_h, hi_h, wh = _axis_weights(H, out_h, align_corners)
    lo_w, hi_w, ww = _axis_weights(W, out_w, align_corners)
    top = jnp.take(xf, lo_h, axis=-3)
    bot = jnp.take(xf, hi_h, axis=-3)
    rows = top + (bot - top) * wh[:, None, None]
    left = jnp.take(rows, lo_w, axis=-2)
    right = jnp.take(rows, hi_w, axis=-2)
    out = left + (right - left) * ww[:, None]
    return out.astype(dt)


def _cubic_axis_weights(in_size: int, out_size: int, align_corners: bool):
    """torch bicubic source positions + 4-tap cubic-convolution weights
    (A=-0.75, no antialias — upsample_bicubic2d semantics). Unlike bilinear,
    torch does NOT clamp the cubic source index; each tap index is clamped
    individually (border replicate)."""
    if align_corners and out_size > 1:
        src = jnp.arange(out_size, dtype=jnp.float32) * (in_size - 1) / (out_size - 1)
    else:
        scale = in_size / out_size
        src = (jnp.arange(out_size, dtype=jnp.float32) + 0.5) * scale - 0.5
    i0 = jnp.floor(src)
    t = src - i0
    A = -0.75
    # taps at i0-1, i0, i0+1, i0+2 — torch computes w3 as 1 - (w0+w1+w2)
    w0 = ((A * (t + 1) - 5 * A) * (t + 1) + 8 * A) * (t + 1) - 4 * A
    w1 = ((A + 2) * t - (A + 3)) * t * t + 1
    u = 1 - t
    w2 = ((A + 2) * u - (A + 3)) * u * u + 1
    w3 = 1.0 - w0 - w1 - w2
    base = i0.astype(jnp.int32)
    idx = [jnp.clip(base + d, 0, in_size - 1) for d in (-1, 0, 1, 2)]
    return idx, (w0, w1, w2, w3)


def resize_bicubic(x, out_h: int, out_w: int, align_corners: bool = False):
    """x: (..., H, W, C) -> (..., out_h, out_w, C) with exact torch
    F.interpolate(mode='bicubic', antialias=False) semantics — the AVQA
    visual protocol (torchvision Resize([224,224], BICUBIC) on tensors,
    AVQA/dataloader.py:86-90). Separable 4-tap cubic convolution, A=-0.75,
    border-replicated taps."""
    dt = x.dtype
    xf = x.astype(jnp.float32)
    H, W = x.shape[-3], x.shape[-2]
    idx_h, w_h = _cubic_axis_weights(H, out_h, align_corners)
    rows = sum(jnp.take(xf, ih, axis=-3) * w[:, None, None]
               for ih, w in zip(idx_h, w_h))
    idx_w, w_w = _cubic_axis_weights(W, out_w, align_corners)
    out = sum(jnp.take(rows, iw, axis=-2) * w[:, None]
              for iw, w in zip(idx_w, w_w))
    return out.astype(dt)


def interpolate_scale2_bilinear(x, align_corners: bool = True):
    """F.interpolate(scale_factor=2, mode='bilinear') on (..., H, W, C)."""
    return resize_bilinear(x, x.shape[-3] * 2, x.shape[-2] * 2, align_corners)


def adaptive_avg_pool(x, out_h: int, out_w: int):
    """torch AdaptiveAvgPool2d on (..., H, W, C) for divisible sizes."""
    H, W = x.shape[-3], x.shape[-2]
    assert H % out_h == 0 and W % out_w == 0, "adaptive pool requires divisible sizes"
    kh, kw = H // out_h, W // out_w
    shape = x.shape[:-3] + (out_h, kh, out_w, kw, x.shape[-1])
    return x.reshape(shape).mean(axis=(-4, -2))
