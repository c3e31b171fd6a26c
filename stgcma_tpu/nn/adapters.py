"""Bottleneck adapters — the only trainable compute inside frozen blocks.

Reference: AVE/model/Swin_AVE.py:10-58 (Adapter / SAdapter2 / T_Adapter),
AVE/model/CLIP_AVE.py:13-31 (skip_connect flag variant).
D_fc2 is zero-initialized so a freshly-initialized adapter is a no-op
(Swin_AVE.py:1422-1468).
"""
from __future__ import annotations

import jax

from ..ops.common import gelu, linear, linear_init, zeros_linear


def adapter_init(key, dim: int, mlp_ratio: float):
    hidden = int(dim * mlp_ratio)
    return {"D_fc1": linear_init(key, dim, hidden),
            "D_fc2": zeros_linear(hidden, dim)}


def adapter_apply(p, x, skip: bool):
    """skip=True -> SAdapter2 (residual); skip=False -> Adapter/T_Adapter."""
    xs = linear(p["D_fc2"], gelu(linear(p["D_fc1"], x)))
    return x + xs if skip else xs


def adapter_hidden(p, x):
    """Hidden state after D_fc1 + GELU — the STG-CMA fusion operand
    (Swin_AVE.py:747-748)."""
    return gelu(linear(p["D_fc1"], x))


def adapter_out(p, hidden):
    """Project fused hidden back up (Swin_AVE.py:762-763)."""
    return linear(p["D_fc2"], hidden)
