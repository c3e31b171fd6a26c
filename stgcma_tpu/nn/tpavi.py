"""TPAVI: temporal-pixel audio-visual non-local block ('dot' mode, dimension=3).

Reference: AVS/model/TPAVI.py:6-152. All 1x1x1 Conv3d are expressed as token-level
linears (channel-last), which XLA fuses into the surrounding matmuls. The W_z
BatchNorm3d is zero-initialized so a fresh TPAVI block is identity + LayerNorm.

Layout: visual features flow as (B, T, H, W, C) channel-last.
"""
from __future__ import annotations


import jax
import jax.numpy as jnp

from ..ops.common import layernorm, layernorm_init, linear, linear_torch_default_init
from ..ops.conv import batchnorm, batchnorm_init, batchnorm_train


def tpavi_init(key, in_channels: int, audio_dim: int = 128):
    inter = max(in_channels // 2, 1)
    ks = jax.random.split(key, 5)
    return {
        "align_channel": linear_torch_default_init(ks[0], audio_dim, in_channels),
        "norm_layer": layernorm_init(in_channels),
        "g": linear_torch_default_init(ks[1], in_channels, inter),
        "theta": linear_torch_default_init(ks[2], in_channels, inter),
        "phi": linear_torch_default_init(ks[3], in_channels, inter),
        # W_z = Conv(inter->C) + BN(C); BN scale/bias zero-init (TPAVI.py:62-63)
        "W_z": {"conv": linear_torch_default_init(ks[4], inter, in_channels),
                "bn": {**batchnorm_init(in_channels),
                       "scale": jnp.zeros((in_channels,), jnp.float32)}},
    }


def tpavi_apply(p, x, audio=None, train: bool = False):
    """x: (B, T, H, W, C); audio: (B, T, 128) or None (video self-attention).

    Returns (z, audio_aligned, bn_stats_update_or_None). 'dot' mode: attention
    logits divided by the position count, not softmaxed (TPAVI.py:133-135).
    """
    B, T, H, W, C = x.shape
    THW = T * H * W
    if audio is not None:
        audio_temp = linear(p["align_channel"], audio)  # (B, T, C)
        au = jnp.broadcast_to(audio_temp[:, :, None, None, :], (B, T, H, W, C))
    else:
        audio_temp = None
        au = x

    # g/theta act on the visual map, phi on the (broadcast) audio map
    # (TPAVI.py:101-116)
    g_x = linear(p["g"], x).reshape(B, THW, -1)
    theta_x = linear(p["theta"], x).reshape(B, THW, -1)
    phi_x = linear(p["phi"], au).reshape(B, THW, -1)

    # 'dot' mode is softmax-free — the attention is LINEAR in g
    # (f = theta @ phi^T; y = (f / THW) @ g, TPAVI.py:133-139) — so it
    # reassociates exactly as y = theta @ (phi^T @ g) / THW. The (THW, THW)
    # gram (983 MB fp32 per batch element at stage-1 resolution, the
    # dominant HBM cost of the AVS forward) never materializes; the
    # contracted (inter, inter) factor is ~64 KB. Equality is float
    # reassociation only (pinned vs the torch full-gram reference in
    # tests/test_ref_model_parity.py::test_avs_fusion_parity).
    pg = jnp.einsum("bmc,bmd->bcd", phi_x, g_x,
                    preferred_element_type=jnp.float32)
    pg = (pg / THW).astype(x.dtype)
    y = jnp.einsum("bnc,bcd->bnd", theta_x, pg).reshape(B, T, H, W, -1)

    w = linear(p["W_z"]["conv"], y)
    if train:
        w, bn_new = batchnorm_train(p["W_z"]["bn"], w)
    else:
        w, bn_new = batchnorm(p["W_z"]["bn"], w), None
    z = w + x
    z = layernorm(p["norm_layer"], z)
    return z, audio_temp, bn_new
