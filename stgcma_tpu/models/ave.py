"""AVE-29 audio-visual event localization models (Swin and CLIP backbones).

Reference: SwinTransformer2D_Adapter_New (AVE/model/Swin_AVE.py:1129-1599) and
MM_CLIP_AVE (AVE/model/CLIP_AVE.py:716-1140). I/O contract (§2.6):
  Swin fusion:  a [B,10,224,224], v [B,10,224,224,3] (native layout) -> [B*10, 29]
  CLIP fusion:  a [B,10,102,128], v [B,10,224,224,3] -> [B*10, label_dim]
"""
from __future__ import annotations

from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp

from ..configs import ClipConfig, SwinConfig
from ..nn import clip_vit, swin
from ..ops.common import layernorm, layernorm_init, linear, linear_init


def _mlp_head_init(key, in_dim: int, label_dim: int, dual: bool):
    """dual (multimodal/fusion): Linear(2C,512)+Dropout+Linear(512,label);
    single: LayerNorm(C)+Linear(C,label) (Swin_AVE.py:1319-1325)."""
    k1, k2 = jax.random.split(key)
    if dual:
        return {"fc1": linear_init(k1, in_dim * 2, 512),
                "fc2": linear_init(k2, 512, label_dim)}
    return {"ln": layernorm_init(in_dim), "fc": linear_init(k1, in_dim, label_dim)}


def _mlp_head_apply(p, x, rng=None, dropout_rate=0.5):
    if "fc1" in p:
        x = linear(p["fc1"], x)
        if rng is not None:
            keep = jax.random.bernoulli(rng, 1.0 - dropout_rate, x.shape)
            x = jnp.where(keep, x / (1.0 - dropout_rate), 0.0).astype(x.dtype)
        return linear(p["fc2"], x)
    return linear(p["fc"], layernorm(p["ln"], x))


# ---------------------------------------------------------------------------
# Swin flavor
# ---------------------------------------------------------------------------

def init_swin_ave(key, cfg: SwinConfig) -> Dict[str, Any]:
    k1, k2 = jax.random.split(key)
    dual = cfg.ftmode in ("multimodal", "fusion")
    return {"backbone": swin.backbone_init(k1, cfg),
            "mlp_head": _mlp_head_init(k2, cfg.num_features, cfg.label_dim, dual)}


def apply_swin_ave(params, cfg: SwinConfig, a, v, rng=None):
    """Forward in cfg.ftmode. Returns logits (B*T, label_dim)."""
    feats = swin.backbone_apply(params["backbone"], cfg, a=a, v=v)
    if cfg.ftmode == "videoonly":
        pooled = feats["v"].mean(axis=1)
    elif cfg.ftmode == "audioonly":
        pooled = feats["a"].mean(axis=1)
    else:
        pv = feats["v"].mean(axis=1)
        pa = feats["a"].mean(axis=1)
        pooled = jnp.concatenate([pa, pv], axis=-1)  # cat (a, v) — Swin_AVE.py:1596
    return _mlp_head_apply(params["mlp_head"], pooled, rng=rng)


# ---------------------------------------------------------------------------
# CLIP flavor
# ---------------------------------------------------------------------------

def init_clip_ave(key, cfg: ClipConfig) -> Dict[str, Any]:
    k1, k2 = jax.random.split(key)
    dual = cfg.ftmode in ("multimodal", "fusion")
    return {"backbone": clip_vit.clip_backbone_init(k1, cfg),
            "mlp_head": _mlp_head_init(k2, cfg.embed_dim, cfg.label_dim, dual)}


def apply_clip_ave(params, cfg: ClipConfig, a, v, rng=None):
    feats = clip_vit.clip_backbone_apply(params["backbone"], cfg, a=a, v=v)
    if cfg.ftmode == "videoonly":
        pooled = feats["v"]
    elif cfg.ftmode == "audioonly":
        pooled = feats["a"]
    else:
        pooled = jnp.concatenate([feats["a"], feats["v"]], axis=-1)
    return _mlp_head_apply(params["mlp_head"], pooled, rng=rng)
