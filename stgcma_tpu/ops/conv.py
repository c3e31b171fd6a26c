"""Convolution wrappers (NHWC / NDHWC layouts — TPU-friendly channel-last).

Weights are stored HWIO (2D) / DHWIO (3D); the checkpoint converter transposes
torch OIHW / OIDHW accordingly. Replaces cuDNN Conv2d/Conv3d call sites
(SURVEY.md §2.13) with lax.conv_general_dilated.
"""
from __future__ import annotations

import math
from typing import Tuple, Union

import jax
import jax.numpy as jnp


def conv2d_init(key, in_ch, out_ch, kernel_size, bias=True, std=None):
    """torch Conv2d default init (kaiming uniform) unless std given (then normal)."""
    kh, kw = (kernel_size, kernel_size) if isinstance(kernel_size, int) else kernel_size
    k1, k2 = jax.random.split(key)
    fan_in = in_ch * kh * kw
    if std is None:
        bound = 1.0 / math.sqrt(fan_in)
        kernel = jax.random.uniform(k1, (kh, kw, in_ch, out_ch), jnp.float32, -bound, bound)
    else:
        kernel = std * jax.random.normal(k1, (kh, kw, in_ch, out_ch), jnp.float32)
    p = {"kernel": kernel}
    if bias:
        bound = 1.0 / math.sqrt(fan_in)
        p["bias"] = jax.random.uniform(k2, (out_ch,), jnp.float32, -bound, bound)
    return p


def conv3d_init(key, in_ch, out_ch, kernel_size: Tuple[int, int, int], bias=True):
    kd, kh, kw = kernel_size
    k1, k2 = jax.random.split(key)
    fan_in = in_ch * kd * kh * kw
    bound = 1.0 / math.sqrt(fan_in)
    p = {"kernel": jax.random.uniform(k1, (kd, kh, kw, in_ch, out_ch), jnp.float32,
                                      -bound, bound)}
    if bias:
        p["bias"] = jax.random.uniform(k2, (out_ch,), jnp.float32, -bound, bound)
    return p


def conv2d(p, x, stride: Union[int, Tuple[int, int]] = 1, padding="VALID", dilation=1):
    """x: (B, H, W, C_in) -> (B, H', W', C_out). padding: 'VALID'|'SAME'|int|pairs."""
    s = (stride, stride) if isinstance(stride, int) else tuple(stride)
    d = (dilation, dilation) if isinstance(dilation, int) else tuple(dilation)
    if isinstance(padding, int):
        padding = [(padding, padding), (padding, padding)]
    y = jax.lax.conv_general_dilated(
        x, p["kernel"].astype(x.dtype), window_strides=s, padding=padding,
        rhs_dilation=d, dimension_numbers=("NHWC", "HWIO", "NHWC"))
    if "bias" in p:
        y = y + p["bias"].astype(y.dtype)
    return y


def conv3d(p, x, stride: Tuple[int, int, int] = (1, 1, 1), padding="VALID"):
    """x: (B, D, H, W, C_in) -> (B, D', H', W', C_out)."""
    if isinstance(padding, int):
        padding = [(padding, padding)] * 3
    y = jax.lax.conv_general_dilated(
        x, p["kernel"].astype(x.dtype), window_strides=tuple(stride), padding=padding,
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"))
    if "bias" in p:
        y = y + p["bias"].astype(y.dtype)
    return y


def batchnorm_init(ch):
    """BatchNorm with running stats (inference-style apply; training update in
    train/steps.py where needed). TPAVI W_z BN is zero-init (TPAVI.py:57-63)."""
    return {"scale": jnp.ones((ch,), jnp.float32),
            "bias": jnp.zeros((ch,), jnp.float32),
            "mean": jnp.zeros((ch,), jnp.float32),
            "var": jnp.ones((ch,), jnp.float32)}


def batchnorm(p, x, eps=1e-5):
    """Inference-mode batchnorm over the last (channel) axis."""
    dt = x.dtype
    xf = x.astype(jnp.float32)
    inv = jax.lax.rsqrt(p["var"] + eps)
    y = (xf - p["mean"]) * inv * p["scale"] + p["bias"]
    return y.astype(dt)


def batchnorm_train(p, x, eps=1e-5, momentum=0.1):
    """Training-mode batchnorm over all axes except the last; returns
    (y, updated_stats). Matches torch BatchNorm semantics (biased batch var for
    normalization, unbiased for the running update)."""
    dt = x.dtype
    xf = x.astype(jnp.float32)
    axes = tuple(range(xf.ndim - 1))
    mean = jnp.mean(xf, axis=axes)
    var = jnp.mean(jnp.square(xf - mean), axis=axes)
    n = xf.size // xf.shape[-1]
    unbiased = var * n / max(n - 1, 1)
    y = (xf - mean) * jax.lax.rsqrt(var + eps) * p["scale"] + p["bias"]
    new_stats = {**p,
                 "mean": (1 - momentum) * p["mean"] + momentum * mean,
                 "var": (1 - momentum) * p["var"] + momentum * unbiased}
    return y.astype(dt), new_stats
