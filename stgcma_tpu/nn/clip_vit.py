"""CLIP visual tower with ST-adapters + STG-CMA token-level fusion.

Reference: AVE/model/CLIP_AVE.py — ResidualAttentionBlock active paths
(:110-143 video_adapt, :160-174 audio_adapt, :210-243 multimodal, :359-430 fusion)
and MM_CLIP_AVE (:716-1140). Audio shares the visual tower (same attn/mlp
weights) through its own conv1_audio / positional_embedding_audio.

Internally tokens are (BT, N, C) batch-first (the reference's LND permutes are
a torch MHA artifact and are algebraically transparent).
"""
from __future__ import annotations

from typing import Any, Dict

import jax
import jax.numpy as jnp

from ..configs import ClipConfig
from ..ops.attention import cross_modal_fuse, mha
from ..ops.common import (layernorm, layernorm_init, linear, linear_init,
                          quick_gelu, trunc_normal)
from ..ops.conv import conv2d, conv2d_init
from .adapters import adapter_apply, adapter_hidden, adapter_init, adapter_out

_MODE = {"videoonly": "video_adapt", "audioonly": "audio_adapt",
         "multimodal": "multimodal_adapt_no_fusion", "fusion": "fusion_adapt"}


# ---------------------------------------------------------------------------
# block
# ---------------------------------------------------------------------------

def clip_block_init(key, cfg: ClipConfig, mode: str) -> Dict[str, Any]:
    d = cfg.embed_dim
    ks = jax.random.split(key, 12)
    p: Dict[str, Any] = {
        "ln_1": layernorm_init(d),
        "ln_2": layernorm_init(d),
        "attn": {
            "in_proj": {"kernel": trunc_normal(ks[0], (d, 3 * d)),
                        "bias": jnp.zeros((3 * d,), jnp.float32)},
            "out_proj": linear_init(ks[1], d, d),
        },
        "mlp": {"c_fc": linear_init(ks[2], d, 4 * d),
                "c_proj": linear_init(ks[3], 4 * d, d)},
        "gate_v": jnp.zeros((1,), jnp.float32),
        "gate_a": jnp.zeros((1,), jnp.float32),
    }
    r = cfg.adapter_ratio
    video = mode in ("video_adapt", "multimodal_adapt_no_fusion", "fusion_adapt")
    audio = mode in ("audio_adapt", "multimodal_adapt_no_fusion", "fusion_adapt")
    if video:
        p["S_Adapter"] = adapter_init(ks[4], d, r)
        p["T_Adapter"] = adapter_init(ks[5], d, r)
        p["MLP_Adapter"] = adapter_init(ks[6], d, r)
    if audio:
        p["S_Adapter_Audio"] = adapter_init(ks[7], d, r)
        p["T_Adapter_Audio"] = adapter_init(ks[8], d, r)
        p["MLP_Adapter_Audio"] = adapter_init(ks[9], d, r)
    return p


def _attention(p, x, heads: int):
    """self.attention(): MHA(x, x, x) (CLIP_AVE.py:106-108)."""
    from ..ops.pallas_attn import fused_attention_enabled, mha_self_fused
    if fused_attention_enabled() and heads <= 16:
        return mha_self_fused(p["attn"], x, heads)
    return mha(p["attn"], x, x, x, heads)


def _attn_ln(p, x, heads: int, n_real: int = None):
    """ln_1 + self-attention, LN fused into the kernel on TPU (the kernel
    routes to the int8 W8A8 variant when the tower is quantized). n_real:
    real token count under the resident-pad layout (padded keys masked)."""
    from ..ops.pallas_attn import clip_temporal_megakernel, fused_attention_enabled
    if fused_attention_enabled() and heads <= 16:
        return clip_temporal_megakernel(p["attn"], p["ln_1"], x, heads,
                                        n_real=n_real)
    assert n_real is None or n_real == x.shape[1], \
        "resident-pad layout requires the fused attention kernels"
    return _attention(p, layernorm(p["ln_1"], x), heads)


def _mlp(p, x):
    return linear(p["mlp"]["c_proj"], quick_gelu(linear(p["mlp"]["c_fc"], x)))


def _ffn_clip(p, x):
    """ln_2 + MLP (QuickGELU). Pallas FFN kernel is opt-in for bf16
    (STGCMA_FUSED_FFN=1; measured slower than XLA's fusion here —
    BENCH_NOTES.md) but ALWAYS used for the int8 tower (the fused in-kernel
    activation quant is what makes W8A8 pay — ops/pallas_attn.py)."""
    import os
    from ..ops.pallas_attn import (ffn_megakernel, ffn_q_megakernel,
                                   fused_attention_enabled)
    if "kernel_q" in p["mlp"]["c_fc"] and fused_attention_enabled():
        return ffn_q_megakernel(p["mlp"], p["ln_2"], x, act="quick_gelu",
                                keys=("c_fc", "c_proj"))
    if os.environ.get("STGCMA_FUSED_FFN") == "1" and fused_attention_enabled() \
            and "kernel" in p["mlp"]["c_fc"]:
        return ffn_megakernel(p["mlp"], p["ln_2"], x, act="quick_gelu",
                              keys=("c_fc", "c_proj"))
    return _mlp(p, layernorm(p["ln_2"], x))


def _qfuse_adapters(p) -> bool:
    """int8 serving with the adapter down-proj fused into the megakernels.
    OPT-IN (STGCMA_QFUSE_ADAPTERS=1): measured NEUTRAL-to-NEGATIVE on v5e
    (232.5-233.6 vs 236.1-237.2 clips/s, CLIP-B/16 int8 B=8, two A/B orders —
    BENCH_NOTES round 4): the adapter chain's HBM traffic it removes was
    already overlapped, while the in-kernel down-proj + narrow-lane hidden
    store lengthen the kernels' serial chain. Kept tested for other shape
    regimes."""
    import os
    return ("kernel_q" in p["attn"]["in_proj"]
            and os.environ.get("STGCMA_QFUSE_ADAPTERS", "0") == "1")


def _t_adapt(p, x, heads: int, T: int, adapter_key: str):
    """temporal adaptation: attention over the frame axis + no-skip T_Adapter +
    residual (CLIP_AVE.py:131-135). x: (B*T, N, C)."""
    import os
    from ..ops.pallas_attn import fused_attention_enabled, temporal_adapt_v2
    BT, N, C = x.shape
    B = BT // T
    if _qfuse_adapters(p) and fused_attention_enabled() and heads <= 16:
        # int8 serving: attn_out exists only to feed T_Adapter, so the kernel
        # emits just the dA=C/16-wide adapter hidden — the full-width tensor
        # never returns to HBM and the layout round-trip transposes shrink
        # 16x on the way back (VERDICT r3 #1b).
        from ..ops.common import linear
        from ..ops.pallas_attn import clip_attn_megakernel_h
        xt = x.reshape(B, T, N, C).transpose(0, 2, 1, 3).reshape(B * N, T, C)
        h = clip_attn_megakernel_h(p["attn"], p["ln_1"], p[adapter_key], xt,
                                   heads, emit_o=False)
        dA = h.shape[-1]
        h = h.reshape(B, N, T, dA).transpose(0, 2, 1, 3).reshape(BT, N, dA)
        return x + linear(p[adapter_key]["D_fc2"], h)
    if fused_attention_enabled() and heads <= 16 and T <= 16 \
            and jax.default_backend() != "cpu" \
            and os.environ.get("STGCMA_TV2", "0") == "1":
        # transpose-free temporal kernel (opt-in): measured NEGATIVE on v5e
        # both as rank-3 dots/TG=1 (188/228 clips/s bf16/int8) and as flat
        # 2D dots/TG=2 (178/215) vs the packed no-pad path (196/245) — the
        # in-VMEM (T,N)->(N,T) permute costs more than the XLA HBM
        # transposes it replaces. Kept tested for other geometries.
        return temporal_adapt_v2(p["attn"], p["ln_1"], p[adapter_key], x,
                                 heads, T)
    xt = x.reshape(B, T, N, C).transpose(0, 2, 1, 3).reshape(B * N, T, C)
    from ..ops.pallas_attn import clip_temporal_megakernel
    # whole-block fusion measured NEUTRAL for int8 too (243.5 vs 244.8
    # clips/s r3) — the separate int8 kernels are already near floor; the
    # fused temporal+adapter variant stays opt-in
    tadapt_fused = os.environ.get("STGCMA_CLIP_TADAPT_FUSED", "0") == "1"
    if fused_attention_enabled() and heads <= 16 \
            and jax.default_backend() != "cpu" and tadapt_fused:
        # one kernel: LN + qkv + attn + proj + T_Adapter + residual
        from ..ops.pallas_clip_block import clip_temporal_adapt_block
        xt = clip_temporal_adapt_block(p["attn"], p["ln_1"], p[adapter_key],
                                       xt, heads)
    elif fused_attention_enabled() and heads <= 16:
        # float AND int8 towers: the megakernel routes on 'kernel_q'
        attn_out = clip_temporal_megakernel(p["attn"], p["ln_1"], xt, heads)
        xt = xt + adapter_apply(p[adapter_key], attn_out, skip=False)
    else:
        attn_out = _attention(p, layernorm(p["ln_1"], xt), heads)
        xt = xt + adapter_apply(p[adapter_key], attn_out, skip=False)
    return xt.reshape(B, N, T, C).transpose(0, 2, 1, 3).reshape(BT, N, C)


def _n_real(x, cfg: ClipConfig, sfx: str):
    """Real token count for a stream under the resident-pad layout, or None
    when the stream is unpadded (see ops.pallas_attn.resident_pad_enabled)."""
    real = (cfg.num_patches_audio if sfx else cfg.num_patches) + 1
    return real if x.shape[1] > real else None


def _single(p, x, cfg: ClipConfig, sfx: str):
    """video_adapt / audio_adapt (CLIP_AVE.py:128-143, 160-174)."""
    from ..ops.pallas_attn import fused_attention_enabled
    h = cfg.heads
    nr = _n_real(x, cfg, sfx)
    x = _t_adapt(p, x, h, cfg.num_frames, "T_Adapter" + sfx)
    if _qfuse_adapters(p) and fused_attention_enabled() and h <= 16:
        from ..ops.pallas_attn import clip_attn_megakernel_h, ffn_qh_megakernel
        xs, xs_h = clip_attn_megakernel_h(p["attn"], p["ln_1"],
                                          p["S_Adapter" + sfx], x, h,
                                          emit_o=True, n_real=nr)
        x = x + xs + adapter_out(p["S_Adapter" + sfx], xs_h)
        xn, xn_h = ffn_qh_megakernel(p["mlp"], p["ln_2"],
                                     p["MLP_Adapter" + sfx], x,
                                     act="quick_gelu", keys=("c_fc", "c_proj"))
        return x + xn + adapter_out(p["MLP_Adapter" + sfx], xn_h)
    x = x + adapter_apply(p["S_Adapter" + sfx], _attn_ln(p, x, h, nr),
                          skip=True)
    xn = _ffn_clip(p, x)
    return x + xn + adapter_apply(p["MLP_Adapter" + sfx], xn, skip=False)


def _fusion(p, v, a, cfg: ClipConfig):
    """fusion_adapt — token-level STG-CMA (CLIP_AVE.py:359-430)."""
    h = cfg.heads
    nv, na = _n_real(v, cfg, ""), _n_real(a, cfg, "_Audio")
    v = _t_adapt(p, v, h, cfg.num_frames, "T_Adapter")
    a = _t_adapt(p, a, h, cfg.num_frames, "T_Adapter_Audio")

    import os
    from ..ops.pallas_attn import fused_attention_enabled
    if fused_attention_enabled() and h <= 16 and jax.default_backend() != "cpu" \
            and os.environ.get("STGCMA_CLIP_WHOLE_BLOCK", "0") == "1" \
            and nv is None and na is None:
        # whole-block megakernel: spatial attn + dual STG-CMA fusion + FFN
        # in one VMEM pass (ops/pallas_clip_block.py); does its own padding,
        # so it opts out of the resident-pad layout
        from ..ops.pallas_clip_block import clip_fusion_spatial_block
        return clip_fusion_spatial_block(p, v, a, h)

    qf = _qfuse_adapters(p) and fused_attention_enabled() and h <= 16
    if qf:
        # int8 serving: the megakernels emit (attn/ffn out, adapter hidden)
        # in one pass — the XLA adapter_hidden full-width re-reads disappear
        # (VERDICT r3 #1a).
        from ..ops.pallas_attn import clip_attn_megakernel_h, ffn_qh_megakernel
        vs, vs_h = clip_attn_megakernel_h(p["attn"], p["ln_1"],
                                          p["S_Adapter"], v, h, emit_o=True,
                                          n_real=nv)
        a_s, as_h = clip_attn_megakernel_h(p["attn"], p["ln_1"],
                                           p["S_Adapter_Audio"], a, h,
                                           emit_o=True, n_real=na)
    else:
        vs = _attn_ln(p, v, h, nv)
        a_s = _attn_ln(p, a, h, na)
        vs_h = adapter_hidden(p["S_Adapter"], vs)
        as_h = adapter_hidden(p["S_Adapter_Audio"], a_s)
    vs_h, as_h = cross_modal_fuse(vs_h, as_h, p["gate_v"], p["gate_a"],
                                  nv_real=nv, na_real=na)
    v = v + vs + adapter_out(p["S_Adapter"], vs_h)
    a = a + a_s + adapter_out(p["S_Adapter_Audio"], as_h)

    if qf:
        vn, vn_h = ffn_qh_megakernel(p["mlp"], p["ln_2"], p["MLP_Adapter"],
                                     v, act="quick_gelu",
                                     keys=("c_fc", "c_proj"))
        an, an_h = ffn_qh_megakernel(p["mlp"], p["ln_2"],
                                     p["MLP_Adapter_Audio"], a,
                                     act="quick_gelu", keys=("c_fc", "c_proj"))
    else:
        vn = _ffn_clip(p, v)
        an = _ffn_clip(p, a)
        vn_h = adapter_hidden(p["MLP_Adapter"], vn)
        an_h = adapter_hidden(p["MLP_Adapter_Audio"], an)
    vn_h, an_h = cross_modal_fuse(vn_h, an_h, p["gate_v"], p["gate_a"],
                                  nv_real=nv, na_real=na)
    v = v + vn + adapter_out(p["MLP_Adapter"], vn_h)
    a = a + an + adapter_out(p["MLP_Adapter_Audio"], an_h)
    return v, a


def clip_block_apply(p, x, cfg: ClipConfig, mode: str):
    if mode == "video_adapt":
        return _single(p, x, cfg, "")
    if mode == "audio_adapt":
        return _single(p, x, cfg, "_Audio")
    if mode == "multimodal_adapt_no_fusion":
        v, a = x
        return _single(p, v, cfg, ""), _single(p, a, cfg, "_Audio")
    if mode == "fusion_adapt":
        return _fusion(p, x[0], x[1], cfg)
    raise ValueError(mode)


# ---------------------------------------------------------------------------
# tower
# ---------------------------------------------------------------------------

def clip_backbone_init(key, cfg: ClipConfig) -> Dict[str, Any]:
    d = cfg.embed_dim
    scale = d ** -0.5
    ks = jax.random.split(key, cfg.layers + 8)
    mode = _MODE[cfg.ftmode]
    return {
        "conv1": conv2d_init(ks[0], 3, d, cfg.patch_size, bias=False),
        "conv1_audio": conv2d_init(ks[1], 1, d, cfg.patch_size, bias=False),
        "class_embedding": scale * jax.random.normal(ks[2], (d,), jnp.float32),
        "positional_embedding": scale * jax.random.normal(
            ks[3], (cfg.num_patches + 1, d), jnp.float32),
        "positional_embedding_audio": scale * jax.random.normal(
            ks[4], (cfg.num_patches_audio + 1, d), jnp.float32),
        "temporal_embedding": jnp.zeros((1, cfg.num_frames, d), jnp.float32),
        "temporal_embedding_audio": jnp.zeros((1, cfg.num_frames, d), jnp.float32),
        "ln_pre": layernorm_init(d),
        "ln_post": layernorm_init(d),
        "resblocks": [clip_block_init(ks[5 + i], cfg, mode) for i in range(cfg.layers)],
    }


def _embed(params, x, conv_key: str, pos_key: str, cfg: ClipConfig):
    """patchify + class token + pos embed + temporal embed + ln_pre.
    x: (B, T, H, W, Cin) -> (B*T, N+1, D) (CLIP_AVE.py:1091-1105)."""
    B, T = x.shape[0], x.shape[1]
    x = x.reshape((B * T,) + x.shape[2:])
    y = conv2d(params[conv_key], x, stride=cfg.patch_size)  # (BT, gh, gw, D)
    BT = y.shape[0]
    y = y.reshape(BT, -1, cfg.embed_dim)
    cls = params["class_embedding"].astype(y.dtype)
    cls = jnp.broadcast_to(cls, (BT, 1, cfg.embed_dim))
    y = jnp.concatenate([cls, y], axis=1)
    y = y + params[pos_key].astype(y.dtype)
    N = y.shape[1]
    t_emb = params["temporal_embedding" if pos_key == "positional_embedding"
                   else "temporal_embedding_audio"].astype(y.dtype)  # (1, T, D)
    y = y.reshape(B, T, N, -1) + t_emb[:, :, None, :]
    y = y.reshape(BT, N, -1)
    # ln_pre stays on XLA: the fused-LN kernel measured -1.2% end-to-end here
    # (M=BT*197 rows only admit 80-row divisor tiles -> 197 tiny grid steps).
    return layernorm(params["ln_pre"], y)


def stack_resblocks(params):
    """Convert params['resblocks'] from a per-block list into one stacked tree
    (leading axis = depth). The blocks are homogeneous, so this is lossless;
    _run_resblocks consumes the stacked form directly with lax.scan. Do this
    OUTSIDE jit for big train programs: the optimizer/dtype-cast plumbing then
    emits one op per weight instead of one per weight per block, shrinking the
    L/14 fwd+bwd+Adam HLO below compile-relay request limits (BENCH_NOTES)."""
    if "resblocks" not in params and "backbone" in params:
        p = dict(params)
        p["backbone"] = stack_resblocks(params["backbone"])
        return p
    blocks = params["resblocks"]
    if not isinstance(blocks, (list, tuple)):
        return params
    p = dict(params)
    p["resblocks"] = jax.tree_util.tree_map(
        lambda *xs: jnp.stack(xs), *blocks)
    return p


def _run_resblocks(params, cfg: ClipConfig, x, mode: str):
    """Unrolled loop, or lax.scan over stacked block params when
    cfg.scan_blocks enables it (CLIP blocks are homogeneous — same mode and
    shapes every depth — so the scan is numerically identical to the
    unrolled loop up to XLA fusion reassociation; cf. SwinConfig.scan_blocks).
    Accepts either a per-block list or the pre-stacked form of
    stack_resblocks (always scanned)."""
    blocks = params["resblocks"]
    if isinstance(blocks, (list, tuple)):
        if not (cfg.scan_blocks and len(blocks) >= cfg.scan_blocks):
            for bp in blocks:
                x = clip_block_apply(bp, x, cfg, mode)
            return x
        stacked = jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *blocks)
    else:
        stacked = blocks

    def body(carry, bp):
        y = clip_block_apply(bp, carry, cfg, mode)
        return y, None

    if cfg.use_checkpoint:
        body = jax.checkpoint(body)
    x, _ = jax.lax.scan(body, x, stacked)
    return x


def _maybe_resident_pad(x):
    """Resident-pad layout (default-on on TPU, STGCMA_RESIDENT_PAD=0 to
    disable): pad the token axis to the
    16-multiple the spatial kernel would re-pad to on EVERY call (prime
    N=197 -> 208), ONCE, right after embed. Dead tokens are masked out of all
    softmax keys downstream (n_real threading), the class token (index 0) is
    untouched, and _ln_post_cls reads index 0 only — so outputs are
    bit-identical while the per-block pad/slice HBM copies and the prime-row
    FFN/temporal pad fallbacks disappear (~2 ms/iter of the round-4 int8
    trace, BENCH_NOTES)."""
    from ..ops.pallas_attn import fused_attention_enabled, resident_pad_enabled
    if not (resident_pad_enabled() and fused_attention_enabled()):
        return x
    N = x.shape[1]
    NP = -(-N // 16) * 16
    if NP != N:
        x = jnp.pad(x, ((0, 0), (0, NP - N), (0, 0)))
    return x


def _ln_post_cls(params, x):
    """ln_post on the class token only. LayerNorm normalizes each token
    independently, so layernorm(x)[:, 0] == layernorm(x[:, 0]) exactly — the
    reference normalizes all N tokens and slices (CLIP_AVE.py:1087-1096);
    slicing first skips (N-1)/N of the fp32 LN volume."""
    return layernorm(params["ln_post"], x[:, 0])


def clip_backbone_apply(params, cfg: ClipConfig, a=None, v=None):
    """Returns dict of per-stream class-token features (BT, D) after ln_post
    (MM_CLIP_AVE.forward, CLIP_AVE.py:979-1140).

    v: (B, T, H, W, 3); a: (B, T, La, Fa) fbank (La=audio_tdim rows, Fa=mel cols).
    """
    mode = _MODE[cfg.ftmode]
    out: Dict[str, Any] = {}
    if cfg.ftmode == "videoonly":
        x = _maybe_resident_pad(
            _embed(params, v, "conv1", "positional_embedding", cfg))
        x = _run_resblocks(params, cfg, x, mode)
        out["v"] = _ln_post_cls(params, x)
        return out
    if cfg.ftmode == "audioonly":
        x = _embed(params, a[..., None], "conv1_audio", "positional_embedding_audio", cfg)
        x = _run_resblocks(params, cfg, x, mode)
        out["a"] = _ln_post_cls(params, x)
        return out
    vt = _maybe_resident_pad(
        _embed(params, v, "conv1", "positional_embedding", cfg))
    at = _embed(params, a[..., None], "conv1_audio", "positional_embedding_audio", cfg)
    x = (vt, at)
    x = _run_resblocks(params, cfg, x, mode)
    out["v"] = _ln_post_cls(params, x[0])
    out["a"] = _ln_post_cls(params, x[1])
    return out
