"""PVT-v2 encoder (JAX, channel-last) — the reference AVS baseline backbone.

Reference: AVS/model/pvt.py (PyramidVisionTransformerV2; the repo wires
pvt_v2_b5 into the unwired LAVISH-baseline PVT_AVSModel, PVT_AVSModel.py:323).
Implements the non-'linear' variant: overlapping conv patch embeds, spatial-
reduction attention (conv k=sr, s=sr + LN on kv), depthwise-conv FFN.
Outputs the 4 stage feature maps consumed by the AVS decoder
(vis_dim = [64, 128, 320, 512] matches AVSHeadConfig defaults).
"""
from __future__ import annotations

import math
from typing import Any, Dict, List

import jax
import jax.numpy as jnp

from ..ops.common import (gelu, layernorm, layernorm_init, linear, linear_init)
from ..ops.conv import conv2d

B5 = dict(embed_dims=(64, 128, 320, 512), num_heads=(1, 2, 5, 8),
          mlp_ratios=(4, 4, 4, 4), depths=(3, 6, 40, 3), sr_ratios=(8, 4, 2, 1))
B0 = dict(embed_dims=(32, 64, 160, 256), num_heads=(1, 2, 5, 8),
          mlp_ratios=(8, 8, 4, 4), depths=(2, 2, 2, 2), sr_ratios=(8, 4, 2, 1))
TINY = dict(embed_dims=(16, 32), num_heads=(1, 2), mlp_ratios=(4, 4),
            depths=(1, 1), sr_ratios=(4, 2))
LN_EPS = 1e-6


def _dwconv_init(key, dim):
    k1, k2 = jax.random.split(key)
    fan_out = 9  # 3*3*dim / groups(dim)
    std = math.sqrt(2.0 / fan_out)
    return {"kernel": std * jax.random.normal(k1, (3, 3, 1, dim), jnp.float32),
            "bias": jnp.zeros((dim,), jnp.float32)}


def _dwconv(p, x, H, Wd):
    """Depthwise 3x3 on (B, N, C) tokens reshaped to the (H, W) grid."""
    B, N, C = x.shape
    y = x.reshape(B, H, Wd, C)
    y = jax.lax.conv_general_dilated(
        y, p["kernel"].astype(x.dtype), (1, 1), [(1, 1), (1, 1)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"), feature_group_count=C)
    y = y + p["bias"].astype(x.dtype)
    return y.reshape(B, N, C)


def _block_init(key, dim, heads, mlp_ratio, sr):
    ks = jax.random.split(key, 8)
    p = {
        "norm1": layernorm_init(dim),
        "norm2": layernorm_init(dim),
        "attn": {"q": linear_init(ks[0], dim, dim),
                 "kv": linear_init(ks[1], dim, 2 * dim),
                 "proj": linear_init(ks[2], dim, dim)},
        "mlp": {"fc1": linear_init(ks[3], dim, dim * mlp_ratio),
                "dwconv": _dwconv_init(ks[4], dim * mlp_ratio),
                "fc2": linear_init(ks[5], dim * mlp_ratio, dim)},
    }
    if sr > 1:
        fan_out = sr * sr * dim
        std = math.sqrt(2.0 / fan_out)
        p["attn"]["sr"] = {"kernel": std * jax.random.normal(
            ks[6], (sr, sr, dim, dim), jnp.float32),
            "bias": jnp.zeros((dim,), jnp.float32)}
        p["attn"]["norm"] = layernorm_init(dim)
    return p


def _sra_attention(p, x, H, Wd, heads, sr):
    """Spatial-reduction attention (pvt.py:102-131)."""
    B, N, C = x.shape
    dh = C // heads
    scale = dh ** -0.5
    q = linear(p["q"], x).reshape(B, N, heads, dh).transpose(0, 2, 1, 3)
    if sr > 1:
        xr = x.reshape(B, H, Wd, C)
        xr = conv2d(p["sr"], xr, stride=sr)
        xr = xr.reshape(B, -1, C)
        xr = layernorm(p["norm"], xr, eps=LN_EPS)
    else:
        xr = x
    kv = linear(p["kv"], xr).reshape(B, -1, 2, heads, dh).transpose(2, 0, 3, 1, 4)
    k, v = kv[0], kv[1]
    attn = jnp.einsum("bhnd,bhmd->bhnm", q * scale, k,
                      preferred_element_type=jnp.float32)
    attn = jax.nn.softmax(attn, axis=-1).astype(x.dtype)
    out = jnp.einsum("bhnm,bhmd->bhnd", attn, v)
    out = out.transpose(0, 2, 1, 3).reshape(B, N, C)
    return linear(p["proj"], out)


def _block_apply(p, x, H, Wd, heads, sr, mlp_ratio):
    x = x + _sra_attention(p["attn"], layernorm(p["norm1"], x, eps=LN_EPS),
                           H, Wd, heads, sr)
    y = layernorm(p["norm2"], x, eps=LN_EPS)
    y = linear(p["mlp"]["fc1"], y)
    y = _dwconv(p["mlp"]["dwconv"], y, H, Wd)
    y = gelu(y)
    y = linear(p["mlp"]["fc2"], y)
    return x + y


def pvt_init(key, cfg: Dict = B5, in_chans: int = 3) -> Dict[str, Any]:
    n_stages = len(cfg["embed_dims"])
    ks = jax.random.split(key, n_stages * 2 + 1)
    params: Dict[str, Any] = {}
    for i in range(n_stages):
        dim = cfg["embed_dims"][i]
        cin = in_chans if i == 0 else cfg["embed_dims"][i - 1]
        ksize = 7 if i == 0 else 3
        fan_out = ksize * ksize * dim
        std = math.sqrt(2.0 / fan_out)
        k1, k2 = jax.random.split(ks[i])
        params[f"patch_embed{i+1}"] = {
            "proj": {"kernel": std * jax.random.normal(
                k1, (ksize, ksize, cin, dim), jnp.float32),
                "bias": jnp.zeros((dim,), jnp.float32)},
            "norm": layernorm_init(dim)}
        bkeys = jax.random.split(ks[n_stages + i], cfg["depths"][i])
        params[f"block{i+1}"] = [
            _block_init(bk, dim, cfg["num_heads"][i], cfg["mlp_ratios"][i],
                        cfg["sr_ratios"][i]) for bk in bkeys]
        params[f"norm{i+1}"] = layernorm_init(dim)
    return params


def pvt_apply(params, x, cfg: Dict = B5) -> List[jnp.ndarray]:
    """x: (B, H, W, 3) -> [stage1 (B,H/4,W/4,C1), ..., stage4 (B,H/32,W/32,C4)]
    (pvt.py forward_features)."""
    outs = []
    n_stages = len(cfg["embed_dims"])
    for i in range(n_stages):
        pe = params[f"patch_embed{i+1}"]
        ksize, stride = (7, 4) if i == 0 else (3, 2)
        pad = ksize // 2
        x = conv2d(pe["proj"], x, stride=stride, padding=pad)
        B, H, Wd, C = x.shape
        x = x.reshape(B, H * Wd, C)
        x = layernorm(pe["norm"], x, eps=LN_EPS)
        for bp in params[f"block{i+1}"]:
            x = _block_apply(bp, x, H, Wd, cfg["num_heads"][i],
                             cfg["sr_ratios"][i], cfg["mlp_ratios"][i])
        x = layernorm(params[f"norm{i+1}"], x, eps=LN_EPS)
        x = x.reshape(B, H, Wd, C)
        outs.append(x)
    return outs
