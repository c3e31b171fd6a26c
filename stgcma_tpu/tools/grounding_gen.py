"""AVQA grounding/matching pretraining — offline stage (reference:
AVQA/grounding_gen/{main_grd_gen.py, nets_grd_gen.py, dataloader_grd_gen.py}).

Model: VGGish audio features (B,T,128) -> fc_a1/fc_a2; frozen ResNet18 layer4
visual features (stride-1 layer4 => 14x14); normalized dot-product grounding;
4-layer match MLP -> 2-way CE on interleaved pos/neg frame pairs.

The trained head weights splice into the AVQA model under avqatask_* names
(Swin_AVQAModel_V1.py:1520-1540) — here `splice_into_avqa` moves them directly
between param trees. `apply(..., return_attention=True)` reproduces the
*_vis heatmap-dump variant (main_grd_gen_vis.py).
"""
from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

import numpy as np
import jax
import jax.numpy as jnp

from ..nn.resnet import resnet18_features, resnet18_init
from ..ops.common import linear, linear_torch_default_init
from ..train.losses import cross_entropy_int


def init_grounding(key) -> Dict[str, Any]:
    ks = jax.random.split(key, 8)
    return {
        "fc_a1": linear_torch_default_init(ks[0], 128, 512),
        "fc_a2": linear_torch_default_init(ks[1], 512, 512),
        "fc_gl": linear_torch_default_init(ks[2], 1024, 512),
        "fc1": linear_torch_default_init(ks[3], 1024, 512),
        "fc2": linear_torch_default_init(ks[4], 512, 256),
        "fc3": linear_torch_default_init(ks[5], 256, 128),
        "fc4": linear_torch_default_init(ks[6], 128, 2),
        "visual_net": resnet18_init(ks[7]),
    }


def _l2norm(x, axis):
    return x / jnp.maximum(jnp.linalg.norm(x.astype(jnp.float32), axis=axis,
                                           keepdims=True), 1e-12).astype(x.dtype)


def apply_grounding(p, audio, frames, return_attention: bool = False):
    """audio: (B, T, 128) VGGish; frames: (B, T, H, W, 3) normalized.
    Returns match logits (B*T, 2) [, attention (B*T, HW)]."""
    B, T = audio.shape[0], audio.shape[1]
    af = jax.nn.relu(linear(p["fc_a1"], audio))
    af = linear(p["fc_a2"], af).reshape(B * T, -1)          # (BT, 512)

    vis = frames.reshape((B * T,) + frames.shape[2:])
    feat = resnet18_features(p["visual_net"], vis)          # (BT, 14, 14, 512)
    v_before = feat.mean(axis=(1, 2))                       # (BT, 512)
    v = feat.reshape(B * T, -1, feat.shape[-1])
    v = _l2norm(v, axis=2)

    a_n = _l2norm(af[:, :, None], axis=1)
    x2_va = jnp.einsum("bnc,bcx->bnx", v, a_n)[..., 0]
    x2_p = jax.nn.softmax(x2_va.astype(jnp.float32), axis=-1).astype(v.dtype)
    grd = jnp.einsum("bn,bnc->bc", x2_p, v)
    gl = jnp.tanh(jnp.concatenate([v_before, grd], axis=-1))
    grd = linear(p["fc_gl"], gl)

    feat = jnp.concatenate([af, grd], axis=-1)
    feat = jax.nn.relu(linear(p["fc1"], feat))
    feat = jax.nn.relu(linear(p["fc2"], feat))
    feat = jax.nn.relu(linear(p["fc3"], feat))
    out = linear(p["fc4"], feat)
    if return_attention:
        return out, x2_p
    return out


def grounding_loss(p, audio, frames_pos, frames_neg):
    """CE on interleaved pos/neg pairs (main_grd_gen.py:27-50)."""
    out_pos = apply_grounding(p, audio, frames_pos)
    out_neg = apply_grounding(p, audio, frames_neg)
    n = out_pos.shape[0]
    out = jnp.stack([out_pos, out_neg], axis=1).reshape(2 * n, -1)
    labels = jnp.tile(jnp.array([1, 0], jnp.int32), n)
    return cross_entropy_int(out, labels)


HEAD_KEYS = ("fc_a1", "fc_a2", "fc_gl", "fc1", "fc2", "fc3", "fc4")


def splice_into_avqa(avqa_params: Dict[str, Any], grd_params: Dict[str, Any]):
    """Move the pretrained grounding head into the AVQA tree
    (the reference's avqatask_* key remap, Swin_AVQAModel_V1.py:1520-1540).
    Note the AVQA model's fc_a2/fc_gl/fc1 have different widths (1536-d
    features); only matching-shaped leaves are copied, like load_state_dict
    with filtered dicts."""
    hp = avqa_params["avqatask"]
    for k in HEAD_KEYS:
        if k not in hp or k not in grd_params:
            continue
        src, dst = grd_params[k], hp[k]
        if src["kernel"].shape == dst["kernel"].shape:
            hp[k] = jax.tree_util.tree_map(lambda x: x, src)
    return avqa_params
