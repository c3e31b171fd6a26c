"""MUSIC-AVQA model: 3-stream Swin fusion backbone + question LSTM encoder +
audio-visual grounding + matching head + question-conditioned attention QA head.

Reference: SwinTransformer2D_Adapter_AVQA (AVQA/model/Swin_AVQAModel_V1.py:1220-1903).
I/O (§2.6): a [B,10,224,224], v/v_nega [B,10,224,224,3] (native), question [B,14] int
  -> (out_qa [B,42], out_match_posi [B*10,2], out_match_nega [B*10,2]).
"""
from __future__ import annotations

from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp

from ..configs import AVQAHeadConfig, SwinConfig
from ..nn import swin
from ..nn.lstm import lstm_apply, lstm_init
from ..ops.attention import mha
from ..ops.common import (layernorm, layernorm_init, linear, linear_init,
                          trunc_normal)


def _l2norm(x, axis):
    return x / jnp.maximum(jnp.linalg.norm(x.astype(jnp.float32), axis=axis,
                                           keepdims=True), 1e-12).astype(x.dtype)


def init_qst_encoder(key, hcfg: AVQAHeadConfig):
    """QstEncoder(93, 1536, 1536, 1, 1536) (Swin_AVQAModel_V1.py:37-59, 1453)."""
    k1, k2, k3 = jax.random.split(key, 3)
    return {
        "word2vec": trunc_normal(k1, (hcfg.vocab_size, hcfg.qst_word_embed)),
        "lstm": lstm_init(k2, hcfg.qst_word_embed, hcfg.qst_hidden, hcfg.qst_layers),
        "fc": linear_init(k3, 2 * hcfg.qst_layers * hcfg.qst_hidden, hcfg.feat_dim),
    }


def apply_qst_encoder(p, question, hcfg: AVQAHeadConfig):
    """question: (B, L) int32 -> (B, feat_dim)."""
    emb = p["word2vec"][question]                     # (B, L, E)
    emb = jnp.tanh(emb)
    emb = emb.transpose(1, 0, 2)                      # (L, B, E) seq-first
    _, (h, c) = lstm_apply(p["lstm"], emb, hcfg.qst_hidden)
    q = jnp.concatenate([h, c], axis=2)               # (layers, B, 2H)
    q = q.transpose(1, 0, 2).reshape(q.shape[1], -1)  # (B, 2*layers*H)
    q = jnp.tanh(q)
    return linear(p["fc"], q)


def _mha_init(key, dim, std=0.02):
    k1, k2 = jax.random.split(key)
    return {"in_proj": {"kernel": trunc_normal(k1, (dim, 3 * dim), std=std),
                        "bias": jnp.zeros((3 * dim,), jnp.float32)},
            "out_proj": linear_init(k2, dim, dim)}


def init_avqa_head(key, hcfg: AVQAHeadConfig) -> Dict[str, Any]:
    d = hcfg.feat_dim
    ks = jax.random.split(key, 20)
    return {
        "fc_a2": linear_init(ks[0], d, d),
        "fc_gl": linear_init(ks[1], 2 * d, d),
        "fc1": linear_init(ks[2], 2 * d, 512),
        "fc2": linear_init(ks[3], 512, 256),
        "fc3": linear_init(ks[4], 256, 128),
        "fc4": linear_init(ks[5], 128, 2),
        "linear11": linear_init(ks[6], d, d),
        "linear12": linear_init(ks[7], d, d),
        "linear21": linear_init(ks[8], d, d),
        "linear22": linear_init(ks[9], d, d),
        "norm1": layernorm_init(d),
        "norm2": layernorm_init(d),
        "attn_a": _mha_init(ks[10], d),
        "attn_v": _mha_init(ks[11], d),
        "question_encoder": init_qst_encoder(ks[12], hcfg),
        "fc_fusion": linear_init(ks[13], 2 * d, d),
        "fc_ans": linear_init(ks[14], d, hcfg.answer_dim),
    }


def init_avqa(key, cfg: SwinConfig, hcfg: AVQAHeadConfig) -> Dict[str, Any]:
    k1, k2 = jax.random.split(key)
    return {"backbone": swin.backbone_init(k1, cfg),
            "avqatask": init_avqa_head(k2, hcfg)}


def _grounding_and_match(hp, audio_feat, visual, hcfg: AVQAHeadConfig):
    """Normalized dot-product grounding + 4-layer match MLP
    (Swin_AVQAModel_V1.py:1806-1866). visual: (B*T, H, W, C); audio: (B*T, C)."""
    BT, H, W, C = visual.shape
    v_before = visual.mean(axis=(1, 2))                         # avgpool -> (BT, C)
    v_feat = visual.reshape(BT, H * W, C)
    v_feat = _l2norm(v_feat, axis=2)
    a_n = _l2norm(audio_feat[:, :, None], axis=1)               # (BT, C, 1)
    x2_va = jnp.einsum("bnc,bcx->bnx", v_feat, a_n)[..., 0]     # (BT, HW)
    x2_p = jax.nn.softmax(x2_va.astype(jnp.float32), axis=-1).astype(v_feat.dtype)
    grd = jnp.einsum("bn,bnc->bc", x2_p, v_feat)                # (BT, C)
    gl = jnp.concatenate([v_before, grd], axis=-1)
    grd = linear(hp["fc_gl"], jnp.tanh(gl))                     # (BT, C)

    feat = jnp.concatenate([audio_feat, grd], axis=-1)
    feat = jax.nn.relu(linear(hp["fc1"], feat))
    feat = jax.nn.relu(linear(hp["fc2"], feat))
    feat = jax.nn.relu(linear(hp["fc3"], feat))
    out_match = linear(hp["fc4"], feat)                         # (BT, 2)
    return grd, out_match


def apply_avqa(params, cfg: SwinConfig, hcfg: AVQAHeadConfig, a, v, v_nega,
               question, train: bool = False, dropout_rng=None):
    """Fusion forward. Returns (out_qa, out_match_posi, out_match_nega).

    train + dropout_rng enable the QA head's attention-weight dropout
    (reference trains attn_a/attn_v with MultiheadAttention dropout=0.1,
    Swin_AVQAModel_V1.py:1449-1450); eval path is deterministic."""
    feats = swin.backbone_apply(params["backbone"], cfg, a=a, v=v, v_nega=v_nega)
    hp = params["avqatask"]
    B, T = feats["B"], feats["T"]
    g = hcfg.grid
    d = hcfg.feat_dim

    f_v = feats["v"]                                   # (B*T, 49, C)
    f_a = feats["a"]
    f_n = feats["v_nega"]

    visual_posi = f_v.reshape(B * T, g, g, d)
    visual_nega = f_n.reshape(B * T, g, g, d)

    audio = f_a.mean(axis=1)                           # (B*T, C)
    audio_feat = jax.nn.relu(audio)
    audio_feat = linear(hp["fc_a2"], audio_feat)       # (B*T, C)
    audio_feat_pure = audio_feat

    qst_feature = apply_qst_encoder(hp["question_encoder"], question, hcfg)  # (B, C)

    grd_posi, out_match_posi = _grounding_and_match(hp, audio_feat, visual_posi, hcfg)
    _, out_match_nega = _grounding_and_match(hp, audio_feat, visual_nega, hcfg)

    # question-as-query attention over grounded visual / audio sequences
    # (Swin_AVQAModel_V1.py:1873-1891)
    xq = qst_feature[:, None, :]                       # (B, 1, C)
    v_seq = grd_posi.reshape(B, T, d)
    a_seq = audio_feat_pure.reshape(B, T, d)

    drop = hcfg.attn_dropout if (train and dropout_rng is not None) else 0.0
    rng_v = rng_a = None
    if drop > 0.0:
        rng_v, rng_a = jax.random.split(dropout_rng)
    v_att = mha(hp["attn_v"], xq, v_seq, v_seq, hcfg.attn_heads,
                dropout_rate=drop, dropout_rng=rng_v)[:, 0]  # (B, C)
    src = linear(hp["linear12"], jax.nn.relu(linear(hp["linear11"], v_att)))
    v_att = layernorm(hp["norm1"], v_att + src)

    a_att = mha(hp["attn_a"], xq, a_seq, a_seq, hcfg.attn_heads,
                dropout_rate=drop, dropout_rng=rng_a)[:, 0]
    src = linear(hp["linear22"], jax.nn.relu(linear(hp["linear21"], a_att)))
    a_att = layernorm(hp["norm2"], a_att + src)

    feat = jnp.concatenate([a_att + a_seq.mean(axis=1), v_att + v_seq.mean(axis=1)],
                           axis=-1)
    feat = jnp.tanh(feat)
    feat = linear(hp["fc_fusion"], feat)
    combined = jnp.tanh(feat * qst_feature)
    out_qa = linear(hp["fc_ans"], combined)            # (B, 42)
    return out_qa, out_match_posi, out_match_nega
