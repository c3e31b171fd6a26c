"""int8 weight + dynamic activation quantization for frozen-tower serving.

The STG-CMA towers are FROZEN (only adapters/gates/heads train —
AVE/model/Swin_AVE.py:1422-1468), so post-training int8 quantization of the
tower matmuls is a pure serving optimization: v5e's MXU runs int8 at 2x the
bf16 rate (394 vs 197 TOPS). Weights are per-output-channel symmetric int8;
activations are quantized per-row (token) on the fly. Adapters, gates, LN,
softmax, and heads stay in bf16/fp32 — accuracy-critical and tiny.

This is an OPT-IN serving mode (STGCMA_INT8_TOWERS=1): it trades the
north-star <=1e-3 logit parity for throughput; the deviation is measured and
reported by tests/bench, not silently imposed.
"""
from __future__ import annotations

from typing import Any, Dict

import jax
import jax.numpy as jnp


def quantize_weight(w: jnp.ndarray):
    """(K, N) float -> (int8 (K, N), fp32 scale (1, N)) per-out-channel."""
    wf = w.astype(jnp.float32)
    s = jnp.max(jnp.abs(wf), axis=0, keepdims=True) / 127.0
    s = jnp.maximum(s, 1e-12)
    q = jnp.clip(jnp.round(wf / s), -127, 127).astype(jnp.int8)
    return q, s


def int8_matmul(x: jnp.ndarray, wq: jnp.ndarray, ws: jnp.ndarray,
                bias=None, out_dtype=None):
    """x: (..., K) bf16/f32; wq: (K, N) int8; ws: (1, N) fp32.

    Dynamic per-row symmetric activation quant -> int8 MXU dot (int32
    accumulate) -> dequant. XLA fuses the quantize/dequantize elementwise
    chains around the convert."""
    out_dtype = out_dtype or x.dtype
    shape = x.shape
    xf = x.reshape(-1, shape[-1]).astype(jnp.float32)
    ax = jnp.max(jnp.abs(xf), axis=-1, keepdims=True)         # (M, 1)
    sx = jnp.maximum(ax / 127.0, 1e-12)
    xq = jnp.clip(jnp.round(xf / sx), -127, 127).astype(jnp.int8)
    acc = jax.lax.dot_general(xq, wq, (((1,), (0,)), ((), ())),
                              preferred_element_type=jnp.int32)
    out = acc.astype(jnp.float32) * sx * ws
    if bias is not None:
        out = out + bias.astype(jnp.float32)
    return out.astype(out_dtype).reshape(shape[:-1] + (wq.shape[1],))


def quantize_linear_params(p: Dict[str, Any]) -> Dict[str, Any]:
    """{'kernel', 'bias'?} -> adds 'kernel_q'/'kernel_s' (keeps bias)."""
    q, s = quantize_weight(p["kernel"])
    out = {"kernel_q": q, "kernel_s": s}
    if "bias" in p:
        out["bias"] = p["bias"]
    return out


def linear_q(p: Dict[str, Any], x: jnp.ndarray):
    """Drop-in for ops.common.linear over quantized params."""
    return int8_matmul(x, p["kernel_q"], p["kernel_s"], bias=p.get("bias"))


def int8_towers_enabled() -> bool:
    import os
    return os.environ.get("STGCMA_INT8_TOWERS", "0") == "1"


def quantize_clip_tower(params: Dict[str, Any]) -> Dict[str, Any]:
    """Quantize the frozen CLIP tower matmuls (attn in/out proj + FFN) of
    every resblock to int8. Adapters/gates/LN/embeddings stay float; the
    model code routes on the presence of 'kernel_q' (nn/clip_vit.py)."""
    out = dict(params)
    blocks = []
    for bp in params["resblocks"]:
        b = dict(bp)
        attn = dict(bp["attn"])
        attn["in_proj"] = quantize_linear_params(bp["attn"]["in_proj"])
        attn["out_proj"] = quantize_linear_params(bp["attn"]["out_proj"])
        b["attn"] = attn
        b["mlp"] = {"c_fc": quantize_linear_params(bp["mlp"]["c_fc"]),
                    "c_proj": quantize_linear_params(bp["mlp"]["c_proj"])}
        blocks.append(b)
    out["resblocks"] = blocks
    return out


def quantize_swin_tower(params: Dict[str, Any]) -> Dict[str, Any]:
    """Same for the Swin backbone: per-block qkv/proj/mlp to int8
    (nn/swin.py routes on 'kernel' presence)."""
    out = dict(params)
    layers = []
    for layer in params["layers"]:
        lo = dict(layer)
        blocks = []
        for bp in layer["blocks"]:
            b = dict(bp)
            attn = dict(bp["attn"])
            attn["qkv"] = quantize_linear_params(bp["attn"]["qkv"])
            attn["proj"] = quantize_linear_params(bp["attn"]["proj"])
            b["attn"] = attn
            b["mlp"] = {"fc1": quantize_linear_params(bp["mlp"]["fc1"]),
                        "fc2": quantize_linear_params(bp["mlp"]["fc2"])}
            blocks.append(b)
        lo["blocks"] = blocks
        layers.append(lo)
    out["layers"] = layers
    return out
