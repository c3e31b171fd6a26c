"""Attention ops: Swin window/temporal attention (shared weights), torch-compatible
multi-head attention, and the STG-CMA bidirectional gated cross-modal fusion op.

Reference semantics:
- WindowAttention.forward (spatial + temporal modes, per-modality temporal bias):
  AVE/model/Swin_AVE.py:231-276
- STG-CMA fusion core (adapter-hidden cross-attention with zero-init gates):
  AVE/model/Swin_AVE.py:747-763, 796-811
- nn.MultiheadAttention parity (packed in_proj): AVQA/model/Swin_AVQAModel_V1.py:1449-1450
"""
from __future__ import annotations


import jax
import jax.numpy as jnp

from .common import linear


def _split_heads(x, num_heads):
    # (B, N, C) -> (B, h, N, dh)
    B, N, C = x.shape
    x = x.reshape(B, N, num_heads, C // num_heads)
    return x.transpose(0, 2, 1, 3)


def _merge_heads(x):
    # (B, h, N, dh) -> (B, N, C)
    B, h, N, dh = x.shape
    return x.transpose(0, 2, 1, 3).reshape(B, N, h * dh)


def qkv_attention(p, x, num_heads: int, bias=None, mask=None):
    """Shared core: qkv linear -> scaled dot-product (+static bias, +window mask) -> proj.

    Args:
      p: {'qkv': linear, 'proj': linear}
      x: (B_, N, C)
      bias: optional (num_heads, N, N) additive position bias (fp32)
      mask: optional (nW, N, N) additive window mask; B_ must be a multiple of nW.
    """
    B_, N, C = x.shape
    dh = C // num_heads
    scale = dh ** -0.5
    qkv = linear(p["qkv"], x)  # (B_, N, 3C)
    qkv = qkv.reshape(B_, N, 3, num_heads, dh).transpose(2, 0, 3, 1, 4)
    q, k, v = qkv[0], qkv[1], qkv[2]
    attn = jnp.einsum("bhnd,bhmd->bhnm", q * scale, k,
                      preferred_element_type=jnp.float32)
    if bias is not None:
        attn = attn + bias[None].astype(jnp.float32)
    if mask is not None:
        nW = mask.shape[0]
        attn = attn.reshape(B_ // nW, nW, num_heads, N, N)
        attn = attn + mask[None, :, None].astype(jnp.float32)
        attn = attn.reshape(B_, num_heads, N, N)
    attn = jax.nn.softmax(attn, axis=-1).astype(x.dtype)
    out = jnp.einsum("bhnm,bhmd->bhnd", attn, v)
    out = _merge_heads(out)
    return linear(p["proj"], out)


def gather_bias(table, index, num_heads: int, N: int):
    """Bias table lookup: table (M, nH), index (N*N,) or (N,N) -> (nH, N, N) fp32."""
    idx = index.reshape(-1)
    b = table.astype(jnp.float32)[idx]  # (N*N, nH)
    return b.reshape(N, N, num_heads).transpose(2, 0, 1)


def window_attention(p, x, num_heads: int, rel_index, mask=None):
    """Spatial W-MSA/SW-MSA with relative position bias (Swin_AVE.py:256-269)."""
    N = x.shape[1]
    bias = gather_bias(p["relative_position_bias_table"], rel_index, num_heads, N)
    return qkv_attention(p, x, num_heads, bias=bias, mask=mask)


def temporal_attention(p, x, num_heads: int, t_index, signal: str = "video"):
    """Temporal attention over frame tokens with per-modality bias table
    (Swin_AVE.py:244-255). Uses the SAME qkv/proj weights as spatial attention."""
    T = x.shape[1]
    key = ("temporal_position_bias_table" if signal == "video"
           else "temporal_position_bias_table_audio")
    bias = gather_bias(p[key], t_index, num_heads, T)
    return qkv_attention(p, x, num_heads, bias=bias)


def cross_modal_fuse(v_hidden, a_hidden, gate_v, gate_a,
                     nv_real: int = None, na_real: int = None):
    """STG-CMA core: bidirectional cross-modal attention over adapter hidden states,
    merged through zero-init scalar gates (Swin_AVE.py:747-763).

    v_hidden: (B, Nv, d); a_hidden: (B, Na, d). Returns updated (v_hidden, a_hidden).

    nv_real/na_real: real token counts when a stream carries a resident
    trailing pad (CLIP resident-pad layout). Padded KEYS are masked out of
    the opposite stream's softmax (exp(-1e30)=0, so real-query outputs are
    bit-identical to the unpadded math); padded QUERY rows produce bounded
    garbage that stays in the dead rows.
    """
    dt = v_hidden.dtype
    logits_va = jnp.einsum("bnd,bmd->bnm", v_hidden, a_hidden,
                           preferred_element_type=jnp.float32)
    Nv, Na = v_hidden.shape[1], a_hidden.shape[1]
    l_va = logits_va
    if na_real is not None and na_real < Na:   # mask padded a keys
        l_va = jnp.where(jnp.arange(Na)[None, None, :] >= na_real,
                         jnp.float32(-1e30), l_va)
    attn_vs = jax.nn.softmax(l_va, axis=-1).astype(dt)               # [B, Nv, Na]
    a2v = jnp.einsum("bnm,bmd->bnd", attn_vs, a_hidden)
    l_av = logits_va.transpose(0, 2, 1)
    if nv_real is not None and nv_real < Nv:   # mask padded v keys
        l_av = jnp.where(jnp.arange(Nv)[None, None, :] >= nv_real,
                         jnp.float32(-1e30), l_av)
    attn_as = jax.nn.softmax(l_av, axis=-1).astype(dt)
    v2a = jnp.einsum("bmn,bnd->bmd", attn_as, v_hidden)
    v_out = v_hidden + gate_v.astype(dt) * a2v
    a_out = a_hidden + gate_a.astype(dt) * v2a
    return v_out, a_out


def mha(p, q, k, v, num_heads: int, mask=None, dropout_rate: float = 0.0,
        dropout_rng=None):
    """torch nn.MultiheadAttention-compatible attention (batch_first=False inputs
    transposed by the caller; here q/k/v are (B, N, C)).

    p: {'in_proj': {'kernel' (C, 3C), 'bias' (3C,)}, 'out_proj': linear}
    Weight layout matches torch's packed in_proj ([q; k; v] stacked on out-dim).
    dropout_rate/dropout_rng: train-time dropout on the attention weights
    (torch MultiheadAttention(dropout=p) semantics — the AVQA QA head trains
    with p=0.1, Swin_AVQAModel_V1.py:1449-1450); inactive when rng is None.
    """
    C = q.shape[-1]
    dh = C // num_heads
    scale = dh ** -0.5
    if "kernel_q" in p["in_proj"]:  # int8 serving mode (ops/quant.py)
        if q is k and k is v:
            qkv = linear(p["in_proj"], q)
            qp, kp, vp = qkv[..., :C], qkv[..., C:2 * C], qkv[..., 2 * C:]
        else:
            def slc(lo, hi):
                d = {"kernel_q": p["in_proj"]["kernel_q"][:, lo:hi],
                     "kernel_s": p["in_proj"]["kernel_s"][:, lo:hi]}
                if "bias" in p["in_proj"]:
                    d["bias"] = p["in_proj"]["bias"][lo:hi]
                return d
            qp = linear(slc(0, C), q)
            kp = linear(slc(C, 2 * C), k)
            vp = linear(slc(2 * C, 3 * C), v)
        qh, kh, vh = (_split_heads(t, num_heads) for t in (qp, kp, vp))
    else:
        wk = p["in_proj"]["kernel"].astype(q.dtype)
        bk = p["in_proj"]["bias"].astype(q.dtype)
        wq, wkk, wv = wk[:, :C], wk[:, C:2 * C], wk[:, 2 * C:]
        bq, bkk, bv = bk[:C], bk[C:2 * C], bk[2 * C:]
        qh = _split_heads(q @ wq + bq, num_heads)
        kh = _split_heads(k @ wkk + bkk, num_heads)
        vh = _split_heads(v @ wv + bv, num_heads)
    attn = jnp.einsum("bhnd,bhmd->bhnm", qh * scale, kh,
                      preferred_element_type=jnp.float32)
    if mask is not None:
        attn = attn + mask.astype(jnp.float32)
    attn = jax.nn.softmax(attn, axis=-1).astype(q.dtype)
    if dropout_rate > 0.0 and dropout_rng is not None:
        keep = jax.random.bernoulli(dropout_rng, 1.0 - dropout_rate, attn.shape)
        attn = attn * keep.astype(attn.dtype) / (1.0 - dropout_rate)
    out = _merge_heads(jnp.einsum("bhnm,bhmd->bhnd", attn, vh))
    return linear(p["out_proj"], out)
