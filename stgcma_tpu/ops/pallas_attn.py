"""Pallas TPU kernel: unscaled softmax cross-attention, row-block tiled.

The STG-CMA joint/global fusion computes softmax(v_h @ a_h^T) @ a_h over the
FULL stage token grid (N up to 3136 at Swin stage 0 — Swin_AVE.py:796-811).
The naive XLA lowering materializes an (B, N, N) fp32 logits tensor (~3 GB at
stage 0, batch 8), making the block ~75x slower than its FLOPs. This kernel
keeps each (TQ, Nk) logits row-block in VMEM: one MXU matmul -> masked softmax
-> one MXU matmul, never touching HBM with logits.

Semantics: out = softmax(q @ k^T, axis=-1) @ v  — NO 1/sqrt(d) scale (the
reference applies none). Gradient support via custom_vjp with a recomputing
XLA backward (training keeps reference numerics; forward pass is the hot path
for serving/eval).
"""
from __future__ import annotations

import functools
import os
from typing import Tuple

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


def _fit_tile(R: int, want: int):
    """Row-tile for a LEADING grid dim (no sublane constraint): the largest
    exact divisor of R <= want, provided it keeps at least half the budget;
    otherwise fall back to `want` with explicit padding. Returns (tile, RP —
    the padded row count; RP == R when a divisor was found).

    Partial last blocks are deliberately NOT used: a ceil-div grid with a
    store-masked partial block measured exact in inference graphs but
    hard-faulted the TPU worker inside train graphs (CLIP-B/16 fwd+bwd B=2,
    temporal megakernel, v5e) — whether the clamped tile DMA is safe depends
    on surrounding buffer layout, so it cannot be relied on. The divisor fit
    keeps the no-pad benefit wherever an aligned tile exists."""
    want = max(1, min(want, R))
    for t in range(want, 0, -1):
        if R % t == 0:
            if 2 * t >= want:
                return t, R
            break
    return want, _round_up(R, want)


def _fit_tile8(M: int, want: int):
    """Like _fit_tile for a SUBLANE-constrained row dim (rank-2 (M, C) views):
    tiles must be multiples of 8 (Mosaic), so search divisors in steps of 8."""
    want = max(8, want // 8 * 8)
    t = min(want, M // 8 * 8)
    while t >= 8:
        if M % t == 0:
            if 2 * t >= want:
                return t, M
            break
        t -= 8
    return want, _round_up(M, want)


def fused_attention_enabled() -> bool:
    """Policy: fused Pallas attention on TPU (override with STGCMA_FUSED_ATTN)."""
    import os
    env = os.environ.get("STGCMA_FUSED_ATTN")
    if env is not None:
        return env == "1"
    return jax.default_backend() == "tpu"


def _exact_softmax() -> bool:
    """STGCMA_EXACT_SOFTMAX=1 restores exact two-pass softmax math in the
    fusion kernels (default: single-exp + approx-reciprocal, ~1e-4 rel)."""
    import os
    return os.environ.get("STGCMA_EXACT_SOFTMAX") == "1"


def _pnorm(e):
    """exp-numerator -> probabilities over the last axis (fp32). Default:
    approx-reciprocal multiply (~1e-4 rel, VPU full-rate) instead of the
    per-element divide; STGCMA_EXACT_SOFTMAX=1 restores the exact divide."""
    s = jnp.sum(e, axis=-1, keepdims=True)
    if _exact_softmax():
        return e / s
    return e * pl.reciprocal(s, approx=True)


def _softmax_exp(x):
    """Softmax numerator exp on max-subtracted logits (x <= 0). Default
    jnp.exp; STGCMA_FAST_EXP=1 swaps in an exp2-bitcast approximation
    (floor-split exponent + quadratic 2^frac, ~2e-3 rel). Measured NEGATIVE
    on v5e (CLIP-B/16 int8 B=8: 232.8 vs 251.7 clips/s — BENCH_NOTES round
    4): Mosaic's native exp lowering beats the 9-op bitcast sequence, i.e.
    softmax exp is NOT a reducible VPU term on this hardware. Kept as the
    documented probe; never enable in production."""
    if os.environ.get("STGCMA_FAST_EXP") != "1":
        return jnp.exp(x)
    t = x * np.float32(1.4426950408889634)          # exp2 domain
    t = jnp.maximum(t, np.float32(-125.0))          # clamp: keep 2^i normal
    i = jnp.floor(t)
    f = t - i                                       # [0, 1)
    # quadratic 2^f with exact endpoints (f=0 -> 1, f->1 -> 2): max rel err
    # ~2e-3 on [0,1)
    p = 1.0 + f * (np.float32(0.6565) + f * np.float32(0.3435))
    two_i = jax.lax.bitcast_convert_type(
        (i.astype(jnp.int32) + 127) << 23, jnp.float32)
    return two_i * p


def _gsem(n: int):
    """dimension_semantics for the megakernel grids. Every grid here is
    data-parallel over row tiles (each output tile written by exactly one
    grid step; weight operands constant-indexed), so declaring 'parallel'
    is always sound and lets Mosaic overlap grid steps (double-buffered
    HBM<->VMEM prefetch) instead of the conservative 'arbitrary' schedule —
    the kernel-level pipelining residual in the round-4 floor accounting
    (VERDICT r4 #4). STGCMA_PARALLEL_GRID=0 reverts (A/B:
    scripts/ab_parallel_grid.py); read at trace time."""
    if os.environ.get("STGCMA_PARALLEL_GRID", "1") == "0":
        return None
    return ("parallel",) * n


def _winblock_tile_bytes() -> int:
    """x-tile byte budget for the windowed block megakernels
    (STGCMA_WINBLOCK_TILE_MB, default 1)."""
    import os
    return int(float(os.environ.get("STGCMA_WINBLOCK_TILE_MB", "1"))
               * (1 << 20))


def _attn_kernel(q_ref, k_ref, v_ref, o_ref, *, nk_real: int):
    # q: (1, TQ, D), k: (1, NKP, D), v: (1, NKP, DV), o: (1, TQ, DV)
    q = q_ref[0]
    k = k_ref[0]
    v = v_ref[0]
    logits = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                                 preferred_element_type=jnp.float32)  # (TQ, NKP)
    if nk_real != k.shape[0]:
        col = jax.lax.broadcasted_iota(jnp.int32, logits.shape, 1)
        logits = jnp.where(col < nk_real, logits, -1e30)
    m = jnp.max(logits, axis=-1, keepdims=True)
    e = jnp.exp(logits - m)
    p = _pnorm(e)
    o_ref[0] = jax.lax.dot_general(p.astype(v.dtype), v, (((1,), (0,)), ((), ())),
                                   preferred_element_type=jnp.float32
                                   ).astype(o_ref.dtype)


def _attn_fwd_pallas(q, k, v, tq: int = 256):
    """q: (B, Nq, D), k: (B, Nk, D), v: (B, Nk, DV) -> (B, Nq, DV)."""
    B, Nq, D = q.shape
    Nk, DV = k.shape[1], v.shape[2]
    TQ = min(tq, _round_up(Nq, 8))
    NQP = _round_up(Nq, TQ)
    NKP = _round_up(Nk, 128)
    DP = _round_up(D, 128)
    DVP = _round_up(DV, 128)

    qp = jnp.pad(q, ((0, 0), (0, NQP - Nq), (0, DP - D)))
    kp = jnp.pad(k, ((0, 0), (0, NKP - Nk), (0, DP - D)))
    vp = jnp.pad(v, ((0, 0), (0, NKP - Nk), (0, DVP - DV)))

    grid = (B, NQP // TQ)
    out = pl.pallas_call(
        functools.partial(_attn_kernel, nk_real=Nk),
        out_shape=jax.ShapeDtypeStruct((B, NQP, DVP), q.dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, TQ, DP), lambda b, i: (b, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, NKP, DP), lambda b, i: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, NKP, DVP), lambda b, i: (b, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, TQ, DVP), lambda b, i: (b, i, 0),
                               memory_space=pltpu.VMEM),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=_gsem(2),
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=(jax.default_backend() == "cpu"),
    )(qp, kp, vp)
    return out[:, :Nq, :DV]


def _attn_ref(q, k, v):
    """Naive XLA reference (used for backward + small N)."""
    logits = jnp.einsum("bnd,bmd->bnm", q, k, preferred_element_type=jnp.float32)
    p = jax.nn.softmax(logits, axis=-1).astype(q.dtype)
    return jnp.einsum("bnm,bmd->bnd", p, v)


@jax.custom_vjp
def unscaled_attention(q, k, v):
    """softmax(q k^T) v with a Pallas forward and recomputing XLA backward."""
    return _attn_fwd_pallas(q, k, v)


def _fwd(q, k, v):
    return _attn_fwd_pallas(q, k, v), (q, k, v)


def _bwd(res, g):
    q, k, v = res
    logits = jnp.einsum("bnd,bmd->bnm", q, k, preferred_element_type=jnp.float32)
    p = jax.nn.softmax(logits, axis=-1)
    gf = g.astype(jnp.float32)
    vf = v.astype(jnp.float32)
    dv = jnp.einsum("bnm,bnd->bmd", p, gf)
    dp = jnp.einsum("bnd,bmd->bnm", gf, vf)
    ds = (dp - jnp.sum(dp * p, axis=-1, keepdims=True)) * p
    dq = jnp.einsum("bnm,bmd->bnd", ds, k.astype(jnp.float32))
    dk = jnp.einsum("bnm,bnd->bmd", ds, q.astype(jnp.float32))
    return dq.astype(q.dtype), dk.astype(k.dtype), dv.astype(v.dtype)


unscaled_attention.defvjp(_fwd, _bwd)


# ---------------------------------------------------------------------------
# fused window attention (W-MSA/SW-MSA)
# ---------------------------------------------------------------------------

def _wmsa_kernel_small_bias(q_ref, k_ref, v_ref, bm_ref, o_ref):
    # q/k/v: (TR, N, dh); bm: (nwh, N, N) with nwh dividing TR
    q = q_ref[:]
    logits = jax.lax.dot_general(q, k_ref[:], (((2,), (2,)), ((0,), (0,))),
                                 preferred_element_type=jnp.float32)  # (TR,N,N)
    TR, N = q.shape[0], q.shape[1]
    nwh = bm_ref.shape[0]
    logits = logits.reshape(TR // nwh, nwh, N, N) + bm_ref[:][None]
    m = jnp.max(logits, axis=-1, keepdims=True)
    e = jnp.exp(logits - m)
    p = _pnorm(e).reshape(TR, N, N)
    o_ref[:] = jax.lax.dot_general(p.astype(q.dtype), v_ref[:],
                                   (((2,), (1,)), ((0,), (0,))),
                                   preferred_element_type=jnp.float32
                                   ).astype(o_ref.dtype)


def _wmsa_kernel_blocked_bias(q_ref, k_ref, v_ref, bm_ref, o_ref):
    # bm block already aligned to the row tile: (TR, N, N)
    q = q_ref[:]
    logits = jax.lax.dot_general(q, k_ref[:], (((2,), (2,)), ((0,), (0,))),
                                 preferred_element_type=jnp.float32)
    logits = logits + bm_ref[:]
    m = jnp.max(logits, axis=-1, keepdims=True)
    e = jnp.exp(logits - m)
    p = _pnorm(e)
    o_ref[:] = jax.lax.dot_general(p.astype(q.dtype), v_ref[:],
                                   (((2,), (1,)), ((0,), (0,))),
                                   preferred_element_type=jnp.float32
                                   ).astype(o_ref.dtype)


def _wmsa_pallas(q, k, v, biasmask, rows_per_tile: int = 128):
    """q/k/v: (R, N, dh) with R = BT * nW * heads (head fastest); biasmask:
    (nW*heads, N, N) fp32, repeating along R with period nW*heads."""
    R, N, dh = q.shape
    nwh = biasmask.shape[0]
    if nwh <= rows_per_tile:
        # tile must stay a multiple of the bias period nwh; fit an exact
        # divisor of the R/nwh group count to avoid BOTH the pad/slice HBM
        # copies and partial last blocks (see _fit_tile)
        g, GP = _fit_tile(R // nwh, max(1, rows_per_tile // nwh))
        TR = g * nwh
        RP = GP * nwh
        kern = _wmsa_kernel_small_bias
        bias_spec = pl.BlockSpec((nwh, N, N), lambda i: (0, 0, 0),
                                 memory_space=pltpu.VMEM)
    else:
        assert nwh % rows_per_tile == 0, (nwh, rows_per_tile)
        TR = rows_per_tile
        RP = _round_up(R, TR)  # R is a multiple of nwh = nb*TR, so RP == R
        kern = _wmsa_kernel_blocked_bias
        n_bias_blocks = nwh // TR
        bias_spec = pl.BlockSpec((TR, N, N),
                                 lambda i, nb=n_bias_blocks: (i % nb, 0, 0),
                                 memory_space=pltpu.VMEM)
    if RP != R:
        pad = ((0, RP - R), (0, 0), (0, 0))
        q, k, v = jnp.pad(q, pad), jnp.pad(k, pad), jnp.pad(v, pad)
    out = pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((RP, N, dh), q.dtype),
        grid=(RP // TR,),
        in_specs=[
            pl.BlockSpec((TR, N, dh), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TR, N, dh), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TR, N, dh), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            bias_spec,
        ],
        out_specs=pl.BlockSpec((TR, N, dh), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=_gsem(1),
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=(jax.default_backend() == "cpu"),
    )(q, k, v, biasmask)
    return out[:R]


@jax.custom_vjp
def _wmsa_attention(q, k, v, biasmask):
    return _wmsa_pallas(q, k, v, biasmask)


def _wmsa_ref(q, k, v, biasmask):
    R, N, _ = q.shape
    nwh = biasmask.shape[0]
    logits = jnp.einsum("rnd,rmd->rnm", q, k, preferred_element_type=jnp.float32)
    logits = logits.reshape(R // nwh, nwh, N, N) + biasmask[None]
    p = jax.nn.softmax(logits, axis=-1).reshape(R, N, N).astype(q.dtype)
    return jnp.einsum("rnm,rmd->rnd", p, v)


def _wmsa_fwd(q, k, v, biasmask):
    return _wmsa_pallas(q, k, v, biasmask), (q, k, v, biasmask)


def _wmsa_bwd(res, g):
    q, k, v, biasmask = res
    R, N, _ = q.shape
    nwh = biasmask.shape[0]
    logits = jnp.einsum("rnd,rmd->rnm", q, k, preferred_element_type=jnp.float32)
    logits = logits.reshape(R // nwh, nwh, N, N) + biasmask[None]
    p = jax.nn.softmax(logits, axis=-1).reshape(R, N, N)
    gf, vf = g.astype(jnp.float32), v.astype(jnp.float32)
    dv = jnp.einsum("rnm,rnd->rmd", p, gf)
    dp = jnp.einsum("rnd,rmd->rnm", gf, vf)
    ds = (dp - jnp.sum(dp * p, axis=-1, keepdims=True)) * p
    dq = jnp.einsum("rnm,rmd->rnd", ds, k.astype(jnp.float32))
    dk = jnp.einsum("rnm,rnd->rmd", ds, q.astype(jnp.float32))
    dbm = ds.reshape(R // nwh, nwh, N, N).sum(0)
    return (dq.astype(q.dtype), dk.astype(k.dtype), dv.astype(v.dtype),
            dbm.astype(biasmask.dtype))


_wmsa_attention.defvjp(_wmsa_fwd, _wmsa_bwd)


def window_attention_fused(p, x, num_heads: int, rel_index, mask=None):
    """Fused W-MSA: qkv/proj dense matmuls stay in XLA; the per-window
    softmax-attention core runs as one Pallas kernel with logits in VMEM
    (naive XLA materializes (B_, h, N, N) fp32 in HBM — the stage-0 hotspot).

    Drop-in for ops.attention.window_attention (same params/semantics)."""
    from .common import linear
    from .attention import gather_bias
    B_, N, C = x.shape
    dh = C // num_heads
    scale = dh ** -0.5
    qkv = linear(p["qkv"], x)
    qkv = qkv.reshape(B_, N, 3, num_heads, dh).transpose(2, 0, 3, 1, 4)
    q, k, v = qkv[0], qkv[1], qkv[2]                     # (B_, h, N, dh)
    bias = gather_bias(p["relative_position_bias_table"], rel_index,
                       num_heads, N)                     # (h, N, N) fp32
    if mask is not None:
        nW = mask.shape[0]
        bm = bias[None] + mask[:, None].astype(jnp.float32)   # (nW, h, N, N)
        bm = bm.reshape(nW * num_heads, N, N)
    else:
        bm = bias
    q = (q * scale).reshape(B_ * num_heads, N, dh)
    k = k.reshape(B_ * num_heads, N, dh)
    v = v.reshape(B_ * num_heads, N, dh)
    out = _wmsa_attention(q, k, v, bm)
    out = out.reshape(B_, num_heads, N, dh).transpose(0, 2, 1, 3).reshape(B_, N, C)
    return linear(p["proj"], out)


# ---------------------------------------------------------------------------
# W-MSA megakernel: LN + qkv + per-head attention + proj in one VMEM pass
# ---------------------------------------------------------------------------

def _win_block_kernel(x_ref, lns_ref, lnb_ref, wqkv_ref, bqkv_ref,
                      wproj_ref, bproj_ref, bm_ref, o_ref, *, heads: int,
                      ln_eps: float = 1e-5):
    """x: (TW, N, C) raw window tokens; bm: (nWb, heads, N, N) fp32 with nWb
    dividing TW (bias+mask repeat with period nWb along the window axis).
    o = proj(MSA(LN(x))) — everything stays in VMEM."""
    TW, N, C = x_ref.shape
    dh = C // heads
    scale = dh ** -0.5
    x = x_ref[:].reshape(TW * N, C)
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(xf - mean), axis=-1, keepdims=True)
    xn = (xf - mean) * jax.lax.rsqrt(var + ln_eps)
    xn = (xn * lns_ref[:].astype(jnp.float32) + lnb_ref[:].astype(jnp.float32)
          ).astype(x.dtype)
    qkv = jnp.dot(xn, wqkv_ref[:], preferred_element_type=jnp.float32)
    qkv = (qkv + bqkv_ref[:].astype(jnp.float32)).astype(x.dtype)  # (TW*N, 3C)

    nWb = bm_ref.shape[0]
    outs = []
    for h in range(heads):
        q = qkv[:, h * dh:(h + 1) * dh].reshape(TW, N, dh) * scale
        k = qkv[:, C + h * dh: C + (h + 1) * dh].reshape(TW, N, dh)
        v = qkv[:, 2 * C + h * dh: 2 * C + (h + 1) * dh].reshape(TW, N, dh)
        logits = jax.lax.dot_general(q, k, (((2,), (2,)), ((0,), (0,))),
                                     preferred_element_type=jnp.float32)
        logits = logits.reshape(TW // nWb, nWb, N, N) + bm_ref[:, h][None]
        m = jnp.max(logits, axis=-1, keepdims=True)
        e = jnp.exp(logits - m)
        p = _pnorm(e).reshape(TW, N, N)
        oh = jax.lax.dot_general(p.astype(x.dtype), v,
                                 (((2,), (1,)), ((0,), (0,))),
                                 preferred_element_type=jnp.float32)
        outs.append(oh.astype(x.dtype).reshape(TW * N, dh))
    o = jnp.concatenate(outs, axis=-1)          # (TW*N, C) heads merged
    o = jnp.dot(o, wproj_ref[:], preferred_element_type=jnp.float32)
    o = o + bproj_ref[:].astype(jnp.float32)
    o_ref[:] = o.astype(o_ref.dtype).reshape(TW, N, C)


def _win_block_naive(x, ln, attn_p, num_heads, biasmask_nwh):
    """XLA reference of the megakernel (used for backward + CPU)."""
    from .common import layernorm
    from .attention import qkv_attention
    # qkv_attention with an explicit (nwh, N, N) combined bias
    B_, N, C = x.shape
    xn = layernorm(ln, x)
    nwh = biasmask_nwh.shape[0]
    from .common import linear
    dh = C // num_heads
    scale = dh ** -0.5
    qkv = linear(attn_p["qkv"], xn)
    qkv = qkv.reshape(B_, N, 3, num_heads, dh).transpose(2, 0, 3, 1, 4)
    q, k, v = qkv[0] * scale, qkv[1], qkv[2]
    logits = jnp.einsum("bhnd,bhmd->bhnm", q, k,
                        preferred_element_type=jnp.float32)
    bm = biasmask_nwh.reshape(nwh // num_heads, num_heads, N, N)
    logits = logits.reshape(B_ // (nwh // num_heads), nwh // num_heads,
                            num_heads, N, N) + bm[None]
    p = jax.nn.softmax(logits, axis=-1).reshape(B_, num_heads, N, N).astype(x.dtype)
    o = jnp.einsum("bhnm,bhmd->bhnd", p, v)
    o = o.transpose(0, 2, 1, 3).reshape(B_, N, C)
    return linear(attn_p["proj"], o)


@functools.partial(jax.custom_vjp, nondiff_argnums=(6,))
def _win_block_op(x, ln_scale, ln_bias, wqkv, bqkv_wproj_bproj, bm, heads):
    wproj, bqkv, bproj = (bqkv_wproj_bproj["wproj"], bqkv_wproj_bproj["bqkv"],
                          bqkv_wproj_bproj["bproj"])
    return _win_block_pallas(x, ln_scale, ln_bias, wqkv, bqkv, wproj, bproj,
                             bm, heads)


def _win_block_pallas(x, ln_scale, ln_bias, wqkv, bqkv, wproj, bproj, bm, heads):
    B_, N, C = x.shape
    nW, h = bm.shape[0], bm.shape[1]
    # tile budget (default ~1 MB of x per tile), aligned to the bias period;
    # STGCMA_WINBLOCK_TILE_MB tunes it (bigger tiles = fewer grid steps +
    # larger matmuls, bounded by the fp32 qkv/gram intermediates in VMEM)
    budget = max(1, _winblock_tile_bytes() // (N * C * 2))
    # tile = exact divisor of the B_/nW group count when one exists (no HBM
    # pad/slice AND no partial blocks — see _fit_tile); bias phase preserved
    # because the tile stays a multiple of nW
    g, GP = _fit_tile(B_ // nW, max(1, budget // nW))
    TW = g * nW
    BP = GP * nW
    if BP != B_:
        x = jnp.pad(x, ((0, BP - B_), (0, 0), (0, 0)))
    out = pl.pallas_call(
        functools.partial(_win_block_kernel, heads=heads),
        out_shape=jax.ShapeDtypeStruct((BP, N, C), x.dtype),
        grid=(BP // TW,),
        in_specs=[
            pl.BlockSpec((TW, N, C), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),   # ln scale (C,)
            pl.BlockSpec(memory_space=pltpu.VMEM),   # ln bias
            pl.BlockSpec(memory_space=pltpu.VMEM),   # wqkv (C, 3C)
            pl.BlockSpec(memory_space=pltpu.VMEM),   # bqkv (3C,)
            pl.BlockSpec(memory_space=pltpu.VMEM),   # wproj (C, C)
            pl.BlockSpec(memory_space=pltpu.VMEM),   # bproj (C,)
            pl.BlockSpec((nW, h, N, N), lambda i: (0, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((TW, N, C), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=_gsem(1),
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=(jax.default_backend() == "cpu"),
    )(x, ln_scale, ln_bias, wqkv, bqkv, wproj, bproj, bm)
    return out[:B_]


def _win_block_fwd(x, ln_scale, ln_bias, wqkv, bqkv_wproj_bproj, bm, heads):
    out = _win_block_op(x, ln_scale, ln_bias, wqkv, bqkv_wproj_bproj, bm, heads)
    return out, (x, ln_scale, ln_bias, wqkv, bqkv_wproj_bproj, bm)


def _win_block_bwd(heads, res, g):
    x, ln_scale, ln_bias, wqkv, rest, bm = res

    def naive(x, ln_scale, ln_bias, wqkv, rest, bm):
        ln = {"scale": ln_scale, "bias": ln_bias}
        attn_p = {"qkv": {"kernel": wqkv, "bias": rest["bqkv"]},
                  "proj": {"kernel": rest["wproj"], "bias": rest["bproj"]}}
        nW, h, N, _ = bm.shape
        return _win_block_naive(x, ln, attn_p, heads, bm.reshape(nW * h, N, N))

    _, vjp = jax.vjp(naive, x, ln_scale, ln_bias, wqkv, rest, bm)
    return vjp(g)


_win_block_op.defvjp(_win_block_fwd, _win_block_bwd)


def _win_pack(rows: int, bias_period: int) -> int:
    """Largest valid gram-pack factor <= STGCMA_WINPACK (default 2): must
    divide the window-row count, and the bias period must be 1 or divisible
    by it (see _pack_blockdiag)."""
    want = int(os.environ.get("STGCMA_WINPACK", "2"))
    pack = 1
    p = 2
    while p <= want:
        if rows % p == 0 and (bias_period == 1 or bias_period % p == 0):
            pack = p
        p *= 2
    return pack


def _pack_blockdiag(x, bm, pack: int):
    """Gram packing: fold `pack` consecutive windows into one block-diagonal
    attention problem of width pack*N. One MXU pass then computes `pack` grams
    (cross-window logits are masked to -1e30 through the bias), beating the
    per-pass latency floor of tiny grams.

    x: (R, N, C) -> (R/pack, pack*N, C); bm: (nWb, h, N, N) ->
    (P, h, pack*N, pack*N) with P = bias period over packed groups."""
    R, N, C = x.shape
    nWb, h = bm.shape[0], bm.shape[1]
    assert R % pack == 0
    x2 = x.reshape(R // pack, pack * N, C)
    if nWb % pack == 0:
        P = nWb // pack
    else:
        P = nWb  # lcm fallback (nWb=1 or coprime): period nWb groups
        assert nWb == 1, "unsupported bias period/pack combination"
    idx = (np.arange(P * pack) % nWb)
    blocks = bm[jnp.asarray(idx)].reshape(P, pack, h, N, N)
    neg = jnp.full((P, h, N, N), -1e30, bm.dtype)
    rows = []
    for j in range(pack):
        row = [blocks[:, j] if k == j else neg for k in range(pack)]
        rows.append(jnp.concatenate(row, axis=-1))
    bmp = jnp.concatenate(rows, axis=-2)  # (P, h, pack*N, pack*N)
    return x2, bmp


def window_block_megakernel(attn_p, ln, x, num_heads: int, rel_index, mask=None):
    """LN + W-MSA + proj fused (drop-in for layernorm+window_attention in
    _spatial_windows). x: (BT*nW, N, C) raw window tokens.

    N (=ws^2, typically 49) is padded to a bf16-sublane multiple (16) so the
    in-kernel (TW, N, C) <-> (TW*N, C) collapses are layout-pure; padded keys
    are masked through the bias, padded query rows are sliced off."""
    from .attention import gather_bias
    B_, N, C = x.shape
    bias = gather_bias(attn_p["relative_position_bias_table"], rel_index,
                       num_heads, N)                 # (h, N, N)
    if mask is not None:
        bm = bias[None] + mask[:, None].astype(jnp.float32)  # (nW, h, N, N)
    else:
        bm = bias[None]                                      # (1, h, N, N)
    NP = _round_up(N, 16)
    if NP != N:
        x = jnp.pad(x, ((0, 0), (0, NP - N), (0, 0)))
        # pad keys: -1e30 (masked); pad query rows: 0 bias (finite, discarded)
        bm = jnp.pad(bm, ((0, 0), (0, 0), (0, NP - N), (0, 0)))
        bm = jnp.pad(bm, ((0, 0), (0, 0), (0, 0), (0, NP - N)),
                     constant_values=-1e30)
    quantized = "kernel_q" in attn_p["qkv"]     # int8 serving mode
    pack = _win_pack(x.shape[0], bm.shape[0])
    if quantized:
        qp = _attn_qparams(attn_p)
        if pack > 1:
            xp, bmp = _pack_blockdiag(x, bm, pack)
            out = _win_block_q_pallas(xp, ln["scale"], ln["bias"], qp, bmp,
                                      num_heads)
            out = out.reshape(x.shape[0], NP, -1)
        else:
            out = _win_block_q_pallas(x, ln["scale"], ln["bias"], qp, bm,
                                      num_heads)
        return out[:, :N, :]
    rest = {"bqkv": attn_p["qkv"]["bias"], "wproj": attn_p["proj"]["kernel"],
            "bproj": attn_p["proj"]["bias"]}
    if pack > 1:
        xp, bmp = _pack_blockdiag(x, bm, pack)
        out = _win_block_op(xp, ln["scale"], ln["bias"], attn_p["qkv"]["kernel"],
                            rest, bmp, num_heads)
        out = out.reshape(x.shape[0], NP, -1)
    else:
        out = _win_block_op(x, ln["scale"], ln["bias"], attn_p["qkv"]["kernel"],
                            rest, bm, num_heads)
    return out[:, :N, :]


def temporal_block_megakernel(attn_p, ln, x, num_heads: int, t_index,
                              signal: str = "video"):
    """LN + temporal attention + proj fused — same kernel as the W-MSA
    megakernel with the per-modality temporal bias table and T padded to a
    sublane multiple. x: (B*N, T, C)."""
    from .attention import gather_bias
    B_, T, C = x.shape
    key = ("temporal_position_bias_table" if signal == "video"
           else "temporal_position_bias_table_audio")
    bias = gather_bias(attn_p[key], t_index, num_heads, T)    # (h, T, T)
    bm = bias[None]                                           # (1, h, T, T)
    # T is tiny: pack 8 rows into one block-diag gram. When 8*T is already a
    # sublane multiple (T=10 -> 80) the T->16 pad is skipped entirely (no
    # wasted qkv/proj tokens, no HBM pad/slice copies).
    pack = 8
    TP = T if (pack * T) % 16 == 0 else _round_up(T, 16)
    if TP != T:
        x = jnp.pad(x, ((0, 0), (0, TP - T), (0, 0)))
        bm = jnp.pad(bm, ((0, 0), (0, 0), (0, TP - T), (0, 0)))
        bm = jnp.pad(bm, ((0, 0), (0, 0), (0, 0), (0, TP - T)),
                     constant_values=-1e30)
    R = x.shape[0]
    RP = _round_up(R, pack)
    if RP != R:
        x = jnp.pad(x, ((0, RP - R), (0, 0), (0, 0)))
    xp, bmp = _pack_blockdiag(x, bm, pack)
    if "kernel_q" in attn_p["qkv"]:         # int8 serving mode
        out = _win_block_q_pallas(xp, ln["scale"], ln["bias"],
                                  _attn_qparams(attn_p), bmp, num_heads)
    else:
        rest = {"bqkv": attn_p["qkv"]["bias"],
                "wproj": attn_p["proj"]["kernel"],
                "bproj": attn_p["proj"]["bias"]}
        out = _win_block_op(xp, ln["scale"], ln["bias"],
                            attn_p["qkv"]["kernel"], rest, bmp, num_heads)
    out = out.reshape(RP, TP, -1)[:R]
    return out[:, :T, :]


def temporal_attention_fused(p, x, num_heads: int, t_index, signal: str = "video"):
    """Fused temporal attention (drop-in for ops.attention.temporal_attention):
    same kernel as W-MSA with rows = B*N*heads and bias (heads, T, T)."""
    from .attention import gather_bias
    from .common import linear
    B_, T, C = x.shape
    dh = C // num_heads
    scale = dh ** -0.5
    key = ("temporal_position_bias_table" if signal == "video"
           else "temporal_position_bias_table_audio")
    bias = gather_bias(p[key], t_index, num_heads, T)    # (h, T, T)
    qkv = linear(p["qkv"], x)
    qkv = qkv.reshape(B_, T, 3, num_heads, dh).transpose(2, 0, 3, 1, 4)
    q, k, v = qkv[0], qkv[1], qkv[2]
    q = (q * scale).reshape(B_ * num_heads, T, dh)
    k = k.reshape(B_ * num_heads, T, dh)
    v = v.reshape(B_ * num_heads, T, dh)
    out = _wmsa_attention(q, k, v, bias)
    out = out.reshape(B_, num_heads, T, dh).transpose(0, 2, 1, 3).reshape(B_, T, C)
    return linear(p["proj"], out)


# ---------------------------------------------------------------------------
# fused FFN: LN + fc1 + activation + fc2 in one VMEM pass
# ---------------------------------------------------------------------------

def _ffn_kernel(x_ref, lns_ref, lnb_ref, w1_ref, b1_ref, w2_ref, b2_ref,
                o_ref, *, act: str, ln_eps: float = 1e-5):
    x = x_ref[:]
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(xf - mean), axis=-1, keepdims=True)
    xn = (xf - mean) * jax.lax.rsqrt(var + ln_eps)
    xn = (xn * lns_ref[:].astype(jnp.float32) +
          lnb_ref[:].astype(jnp.float32)).astype(x.dtype)
    h = jnp.dot(xn, w1_ref[:], preferred_element_type=jnp.float32)
    h = h + b1_ref[:].astype(jnp.float32)
    if act == "quick_gelu":
        h = h * jax.nn.sigmoid(1.702 * h)
    else:
        # exact GELU via the A&S-7.1.26 polynomial erf (Mosaic has no erf/erfc)
        from .pallas_clip_block import _erf
        h = 0.5 * h * (1.0 + _erf(h * (2.0 ** -0.5)))
    h = h.astype(x.dtype)
    o = jnp.dot(h, w2_ref[:], preferred_element_type=jnp.float32)
    o_ref[:] = (o + b2_ref[:].astype(jnp.float32)).astype(o_ref.dtype)


def _ffn_pallas(x, ln_scale, ln_bias, w1, b1, w2, b2, act: str):
    M, C = x.shape
    hid = w1.shape[1]
    # token-tile budget: keep the fp32 hidden block ~4 MB; exact-divisor fit
    # (8-aligned) avoids the pad/slice HBM copies without partial blocks
    TT, MP = _fit_tile8(M, min(1024, _round_up((1 << 22) // (hid * 4), 8)))
    if MP != M:
        x = jnp.pad(x, ((0, MP - M), (0, 0)))
    out = pl.pallas_call(
        functools.partial(_ffn_kernel, act=act),
        out_shape=jax.ShapeDtypeStruct((MP, C), x.dtype),
        grid=(MP // TT,),
        in_specs=[
            pl.BlockSpec((TT, C), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((TT, C), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=_gsem(1),
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=(jax.default_backend() == "cpu"),
    )(x, ln_scale, ln_bias, w1, b1, w2, b2)
    return out[:M]


@functools.partial(jax.custom_vjp, nondiff_argnums=(7,))
def _ffn_op(x, ln_scale, ln_bias, w1, b1, w2, b2, act):
    return _ffn_pallas(x, ln_scale, ln_bias, w1, b1, w2, b2, act)


def _ffn_naive(x, ln_scale, ln_bias, w1, b1, w2, b2, act):
    from .common import gelu, layernorm, quick_gelu
    xn = layernorm({"scale": ln_scale, "bias": ln_bias}, x)
    h = xn @ w1.astype(x.dtype) + b1.astype(x.dtype)
    h = quick_gelu(h) if act == "quick_gelu" else gelu(h)
    return h @ w2.astype(x.dtype) + b2.astype(x.dtype)


def _ffn_fwd(x, ln_scale, ln_bias, w1, b1, w2, b2, act):
    return _ffn_pallas(x, ln_scale, ln_bias, w1, b1, w2, b2, act), \
        (x, ln_scale, ln_bias, w1, b1, w2, b2)


def _ffn_bwd(act, res, g):
    _, vjp = jax.vjp(lambda *a: _ffn_naive(*a, act), *res)
    return vjp(g)


_ffn_op.defvjp(_ffn_fwd, _ffn_bwd)


def _ln_kernel(x_ref, s_ref, b_ref, o_ref, *, eps: float):
    xf = x_ref[:].astype(jnp.float32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(xf - mean), axis=-1, keepdims=True)
    y = (xf - mean) * jax.lax.rsqrt(var + eps)
    o_ref[:] = (y * s_ref[:].astype(jnp.float32) +
                b_ref[:].astype(jnp.float32)).astype(o_ref.dtype)


def _ln_tile(M: int, C: int, itemsize: int):
    """Pick the row-tile TT (multiple of 8, Mosaic sublane constraint) and the
    padded row count MP for the LN kernel. Prefers an exact divisor of M —
    ~1 MB of input per tile — so the whole-array HBM pad copy (which would eat
    most of the kernel's win) is skipped. Trace-time only, <= budget/8 steps."""
    budget = max(8, ((1 << 20) // (C * itemsize)) // 8 * 8)
    TT = min(budget, M // 8 * 8) if M >= 8 else 0
    while TT > 8 and M % TT:
        TT -= 8
    if TT >= 8 and M % TT == 0:
        return TT, M
    TT = min(budget, _round_up(M, 8))
    return TT, _round_up(M, TT)


def _ln_pallas(x, scale, bias, eps: float):
    M, C = x.shape
    TT, MP = _ln_tile(M, C, x.dtype.itemsize)
    if MP != M:
        x = jnp.pad(x, ((0, MP - M), (0, 0)))
    out = pl.pallas_call(
        functools.partial(_ln_kernel, eps=eps),
        out_shape=jax.ShapeDtypeStruct((MP, C), x.dtype),
        grid=(MP // TT,),
        in_specs=[
            pl.BlockSpec((TT, C), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((TT, C), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        interpret=(jax.default_backend() == "cpu"),
    )(x, scale, bias)
    return out[:M]


@jax.custom_vjp
def _ln_op(x, scale, bias):
    return _ln_pallas(x, scale, bias, 1e-5)


def _ln_fwd(x, scale, bias):
    return _ln_pallas(x, scale, bias, 1e-5), (x, scale, bias)


def _ln_bwd(res, g):
    from .common import layernorm
    _, vjp = jax.vjp(
        lambda x, s, b: layernorm({"scale": s, "bias": b}, x), *res)
    return vjp(g)


_ln_op.defvjp(_ln_fwd, _ln_bwd)


def layernorm_fused(p, x, min_elems: int = 1 << 20):
    """Drop-in for ops.common.layernorm on LARGE activations (patch-embed /
    patch-merging norms at early-stage resolutions). The XLA lowering
    materializes the fp32 upcast of the whole tensor in HBM (it is consumed
    by mean, var AND normalize) plus fp32 stat/copy chains — ~5 ms/iter of
    the Swin-Base profile; this kernel keeps fp32 stats per row-tile in VMEM
    with bf16 HBM traffic only. Exact two-pass math (same as layernorm)."""
    if x.size < min_elems or not fused_attention_enabled():
        from .common import layernorm
        return layernorm(p, x)
    shape = x.shape
    out = _ln_op(x.reshape(-1, shape[-1]), p["scale"], p["bias"])
    return out.reshape(shape)


def ffn_megakernel(mlp_p, ln, x, act: str = "gelu",
                   keys: Tuple[str, str] = ("fc1", "fc2")):
    """Fused LN+FFN (drop-in for mlp_apply(p, layernorm(ln, x))).
    x: (..., N, C); returns the FFN output (residual added by the caller)."""
    shape = x.shape
    flat = x.reshape(-1, shape[-1])
    f1, f2 = keys
    out = _ffn_op(flat, ln["scale"], ln["bias"],
                  mlp_p[f1]["kernel"], mlp_p[f1]["bias"],
                  mlp_p[f2]["kernel"], mlp_p[f2]["bias"], act)
    return out.reshape(shape)


def resident_pad_enabled() -> bool:
    """Resident-pad token layout: the CLIP video token stream stays padded to
    a 16-multiple ACROSS all resblocks (padded once after embed) instead of
    the spatial kernel re-padding 197->208 per call — the prime-197 pad/slice
    HBM copies in the round-4 trace (~2 ms/iter, BENCH_NOTES). Real-token
    outputs are bit-identical: the kernel already computes over the padded
    grid with -1e30 key masks; this only hoists the pad out of the per-block
    calls. Measured +8.5% on CLIP-B/16 int8 serving (237.6 -> 257.8 clips/s,
    BENCH_NOTES round 4), so it is ON by default on TPU (like the fused
    kernels themselves); override with STGCMA_RESIDENT_PAD=0/1. Read at
    trace time; pad rows carry zero loss cotangents (ln_post reads the class
    token only), so training gradients are unaffected
    (tests/test_resident_pad.py pins float + int8 end-to-end)."""
    import os
    env = os.environ.get("STGCMA_RESIDENT_PAD")
    if env is not None:
        return env == "1"
    return jax.default_backend() == "tpu"


def clip_temporal_megakernel(attn_p, ln, x, num_heads: int,
                             n_real: int = None):
    """CLIP temporal-axis self-attention fused: LN + packed in_proj + attention
    + out_proj in one VMEM pass (drop-in for
    mha(attn_p, LN(x), ...) over the T<=16 frame axis). x: (B*N, T, C).

    Also serves the SPATIAL token axis (T = token count > 16). n_real < T
    marks trailing resident-pad tokens: they are masked out of the softmax
    keys exactly like the internal pad below, so passing a pre-padded x with
    n_real set skips the per-call pad/slice without changing any output."""
    B_, T, C = x.shape
    quantized = "kernel_q" in attn_p["in_proj"]
    if T <= 16 and (8 * T) % 16 == 0 and (n_real is None or n_real == T):
        # pack-without-pad: 8 rows of T tokens make one 8T-token group that is
        # already sublane-aligned (e.g. T=10 -> 80 = 5x16), so the T->16 HBM
        # pad (1.6x wasted qkv/proj tokens + pad/slice copies) is skipped
        # entirely. Cross-row attention is masked block-diagonally.
        pack = 8
        RP = _round_up(B_, pack)
        if RP != B_:
            x = jnp.pad(x, ((0, RP - B_), (0, 0), (0, 0)))
        xp = x.reshape(RP // pack, pack * T, C)
        bm_np = np.full((pack * T, pack * T), -1e30, np.float32)
        for j in range(pack):
            bm_np[j * T:(j + 1) * T, j * T:(j + 1) * T] = 0.0
        bm = jnp.asarray(np.broadcast_to(
            bm_np, (1, num_heads) + bm_np.shape).copy())
        if quantized:
            out = _win_block_q_pallas(
                xp, ln["scale"], ln["bias"],
                _attn_qparams(attn_p, "in_proj", "out_proj"), bm, num_heads)
        else:
            rest = {"bqkv": attn_p["in_proj"]["bias"],
                    "wproj": attn_p["out_proj"]["kernel"],
                    "bproj": attn_p["out_proj"]["bias"]}
            out = _win_block_op(xp, ln["scale"], ln["bias"],
                                attn_p["in_proj"]["kernel"], rest, bm,
                                num_heads)
        return out.reshape(RP, T, C)[:B_]
    TP = _round_up(T, 16)
    nr = T if n_real is None else n_real
    bm = np.zeros((1, num_heads, TP, TP), np.float32)
    if nr != TP:
        bm[..., nr:] = -1e30
    if TP != T:
        x = jnp.pad(x, ((0, 0), (0, TP - T), (0, 0)))
    if quantized:                           # int8 serving mode
        out = _win_block_q_pallas(
            x, ln["scale"], ln["bias"],
            _attn_qparams(attn_p, "in_proj", "out_proj"),
            jnp.asarray(bm), num_heads)
        return out[:, :T, :]
    rest = {"bqkv": attn_p["in_proj"]["bias"],
            "wproj": attn_p["out_proj"]["kernel"],
            "bproj": attn_p["out_proj"]["bias"]}
    out = _win_block_op(x, ln["scale"], ln["bias"], attn_p["in_proj"]["kernel"],
                        rest, jnp.asarray(bm), num_heads)
    return out[:, :T, :]


def clip_attn_megakernel_h(attn_p, ln, adapter_p, x, num_heads: int,
                           emit_o: bool, n_real: int = None):
    """int8-serving twin of clip_temporal_megakernel with the bottleneck
    adapter's down-projection + GELU fused in. emit_o=False returns only the
    hidden gelu(fc1_ad(attn_out)) (B_, T, dA) — the CLIP temporal site, where
    attn_out feeds nothing else (CLIP_AVE.py:131-135) and dA = C/16, so the
    full-width tensor never round-trips HBM. emit_o=True returns
    (attn_out, hidden) — the spatial site, where attn_out is also the
    S_Adapter residual operand. Requires quantized attn params."""
    B_, T, C = x.shape
    qp = _attn_qparams(attn_p, "in_proj", "out_proj")
    wd = adapter_p["D_fc1"]["kernel"]
    bd = adapter_p["D_fc1"]["bias"]
    dA = wd.shape[1]
    if T <= 16 and (8 * T) % 16 == 0 and (n_real is None or n_real == T):
        pack = 8
        RP = _round_up(B_, pack)
        if RP != B_:
            x = jnp.pad(x, ((0, RP - B_), (0, 0), (0, 0)))
        xp = x.reshape(RP // pack, pack * T, C)
        bm_np = np.full((pack * T, pack * T), -1e30, np.float32)
        for j in range(pack):
            bm_np[j * T:(j + 1) * T, j * T:(j + 1) * T] = 0.0
        bm = jnp.asarray(np.broadcast_to(
            bm_np, (1, num_heads) + bm_np.shape).copy())
        res = _win_block_qad_pallas(xp, ln["scale"], ln["bias"], qp, wd, bd,
                                    bm, num_heads, emit_o)
        if emit_o:
            return (res[0].reshape(RP, T, C)[:B_],
                    res[1].reshape(RP, T, dA)[:B_])
        return res.reshape(RP, T, dA)[:B_]
    TP = _round_up(T, 16)
    nr = T if n_real is None else n_real
    bm = np.zeros((1, num_heads, TP, TP), np.float32)
    if nr != TP:
        bm[..., nr:] = -1e30
    if TP != T:
        x = jnp.pad(x, ((0, 0), (0, TP - T), (0, 0)))
    res = _win_block_qad_pallas(x, ln["scale"], ln["bias"], qp, wd, bd,
                                jnp.asarray(bm), num_heads, emit_o)
    if emit_o:
        return res[0][:, :T, :], res[1][:, :T, :]
    return res[:, :T, :]


def mha_self_fused(p, x, num_heads: int):
    """Dense self-attention (CLIP ResidualAttentionBlock.attention) through the
    W-MSA kernel with a zero bias — logits stay in VMEM instead of XLA
    materializing (BT, h, N, N) fp32 in HBM. Drop-in for ops.attention.mha
    with q=k=v=x."""
    from .common import linear
    B_, N, C = x.shape
    dh = C // num_heads
    scale = dh ** -0.5
    if "kernel_q" in p["in_proj"]:  # int8 serving mode: XLA int8 qkv,
        qkv = linear(p["in_proj"], x)  # Pallas gram core, int8 out_proj
    else:
        wk = p["in_proj"]["kernel"].astype(x.dtype)
        bk = p["in_proj"]["bias"].astype(x.dtype)
        qkv = x @ wk + bk
    qkv = qkv.reshape(B_, N, 3, num_heads, dh).transpose(2, 0, 3, 1, 4)
    q, k, v = qkv[0] * scale, qkv[1], qkv[2]
    q = q.reshape(B_ * num_heads, N, dh)
    k = k.reshape(B_ * num_heads, N, dh)
    v = v.reshape(B_ * num_heads, N, dh)
    if N <= 16:
        # tiny grams (CLIP temporal axis, T=10): pad to 16 and pack 8 per
        # 128-wide block-diagonal gram to beat MXU pass latency. The bias is
        # head-independent here (zero + pad/off-diagonal -1e30 masks), so one
        # (1, 8*16, 8*16) mask serves every packed row group.
        NP, pack = 16, 8
        padn = ((0, 0), (0, NP - N), (0, 0))
        q, k, v = jnp.pad(q, padn), jnp.pad(k, padn), jnp.pad(v, padn)
        R = q.shape[0]
        RP = _round_up(R, pack)
        padr = ((0, RP - R), (0, 0), (0, 0))
        q, k, v = jnp.pad(q, padr), jnp.pad(k, padr), jnp.pad(v, padr)
        q = q.reshape(RP // pack, pack * NP, dh)
        k = k.reshape(RP // pack, pack * NP, dh)
        v = v.reshape(RP // pack, pack * NP, dh)
        blk = np.full((NP, NP), -1e30, np.float32)
        blk[:, :N] = 0.0                       # valid keys within a block
        bm_np = np.full((pack * NP, pack * NP), -1e30, np.float32)
        for j in range(pack):
            bm_np[j * NP:(j + 1) * NP, j * NP:(j + 1) * NP] = blk
        bm = jnp.asarray(bm_np)[None]          # (1, 128, 128)
        out = _wmsa_attention(q, k, v, bm)
        out = out.reshape(RP, NP, dh)[:B_ * num_heads, :N]
    else:
        bm = jnp.zeros((num_heads, N, N), jnp.float32)
        out = _wmsa_attention(q, k, v, bm)
    out = out.reshape(B_, num_heads, N, dh).transpose(0, 2, 1, 3).reshape(B_, N, C)
    return linear(p["out_proj"], out)


def cross_modal_fuse_flash(v_hidden, a_hidden, gate_v, gate_a,
                           min_tokens: int = 120):
    """Drop-in for ops.attention.cross_modal_fuse using the Pallas kernel when
    the token count justifies it (joint/global fusion over full stage grids)."""
    from .attention import cross_modal_fuse
    Nv, Na = v_hidden.shape[1], a_hidden.shape[1]
    D = v_hidden.shape[2]
    if Nv < min_tokens or not fused_attention_enabled() \
            or jax.default_backend() == "cpu":
        # CPU: interpret-mode pallas is debug-speed; XLA naive is the fast path
        return cross_modal_fuse(v_hidden, a_hidden, gate_v, gate_a)
    if (Nv % 16 == 0 and Na % 16 == 0 and D % 8 == 0
            and Na * D * 4 <= (16 << 20)):
        # single-gram bidirectional kernel: each (TQ, Na) logits tile is
        # built once and consumed by both softmax directions (the two-call
        # form below computes the same gram twice)
        return _bidir_fuse_op(v_hidden, a_hidden, gate_v, gate_a)
    dt = v_hidden.dtype
    a2v = unscaled_attention(v_hidden, a_hidden, a_hidden)
    v2a = unscaled_attention(a_hidden, v_hidden, v_hidden)
    v_out = v_hidden + gate_v.astype(dt) * a2v
    a_out = a_hidden + gate_a.astype(dt) * v2a
    return v_out, a_out


# ---------------------------------------------------------------------------
# bidirectional cross-modal fusion: ONE gram, both softmax directions
# ---------------------------------------------------------------------------

def _bidir_fuse_kernel(vh_ref, ah_ref, gv_ref, ga_ref, vo_ref, ao_ref,
                       cm_ref, cs_ref, cnum_ref, *, nv_real: int, nq_blocks: int):
    """Tiled bidirectional STG-CMA joint fusion (Swin_AVE.py:796-811):
        vo = vh + gv * softmax_row(vh @ ah^T) @ ah
        ao = ah + ga * softmax_col(vh @ ah^T)^T @ vh
    Each (TQ, Na) logits tile is built ONCE and consumed by both directions:
    rows are complete within a tile (exact row softmax); the column direction
    accumulates flash-style (running max cm, sum cs, numerator cnum in VMEM
    scratch, rescaled per tile). The naive lowering computes the full gram
    twice and materializes it (39 MB at Swin stage 0)."""
    i = pl.program_id(1)
    vh = vh_ref[0]                       # (TQ, D) query tile
    ah = ah_ref[0]                       # (Na, D)
    gv = gv_ref[0]
    ga = ga_ref[0]
    dt = vh.dtype
    TQ = vh.shape[0]
    logits = jax.lax.dot_general(vh, ah, (((1,), (1,)), ((), ())),
                                 preferred_element_type=jnp.float32)  # (TQ,Na)
    # row direction (exact within the tile)
    m = jnp.max(logits, axis=-1, keepdims=True)
    e = jnp.exp(logits - m)
    pa = _pnorm(e).astype(dt)
    a2v = jax.lax.dot_general(pa, ah, (((1,), (0,)), ((), ())),
                              preferred_element_type=jnp.float32)
    vo_ref[0] = vh + (gv * a2v).astype(dt)

    # column direction: online accumulation across row tiles
    @pl.when(i == 0)
    def _init():
        cm_ref[:] = jnp.full_like(cm_ref, -1e30)
        cs_ref[:] = jnp.zeros_like(cs_ref)
        cnum_ref[:] = jnp.zeros_like(cnum_ref)

    row = jax.lax.broadcasted_iota(jnp.int32, logits.shape, 0) + i * TQ
    lc = jnp.where(row < nv_real, logits, -1e30)   # mask padded query rows
    tile_max = jnp.max(lc, axis=0, keepdims=True)            # (1, Na)
    m_new = jnp.maximum(cm_ref[:], tile_max)
    factor = jnp.exp(cm_ref[:] - m_new)                      # (1, Na)
    ec = jnp.exp(lc - m_new)                                 # (TQ, Na)
    cs_ref[:] = cs_ref[:] * factor + jnp.sum(ec, axis=0, keepdims=True)
    cnum_ref[:] = cnum_ref[:] * factor.T + jax.lax.dot_general(
        ec.astype(dt), vh, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)                  # (Na, D)
    cm_ref[:] = m_new

    @pl.when(i == nq_blocks - 1)
    def _finalize():
        v2a = cnum_ref[:] / cs_ref[:].T
        ao_ref[0] = ah + (ga * v2a).astype(dt)


def _bidir_fuse_full_kernel(vh_ref, ah_ref, gv_ref, ga_ref, vo_ref, ao_ref):
    """Single-tile variant: full (Nv, Na) fp32 logits resident in VMEM (39 MB
    at Swin stage 0). The joint fusion is exp-throughput-bound on the VPU
    (~1.6G fp32 exps/block at stage 0 in the two-pass form), so the gram's
    exp is computed ONCE against the row max and the column direction is
    derived from it via the per-row correction w_i = exp(m_i - M) (M = global
    max): exp(l_ij - M) = e_ij * w_i is a valid unnormalized numerator for
    BOTH softmax directions. Divides are approx-reciprocal multiplies
    (~1e-4 rel — inside the 1e-3 parity budget; STGCMA_EXACT_SOFTMAX=1
    restores two-pass exact math). Degradation only when a gram column sits
    >~87 below the global max (fp32 underflow zeroes that column's v2a)."""
    vh = vh_ref[0]
    ah = ah_ref[0]
    gv = gv_ref[0]
    ga = ga_ref[0]
    dt = vh.dtype
    logits = jax.lax.dot_general(vh, ah, (((1,), (1,)), ((), ())),
                                 preferred_element_type=jnp.float32)  # (Nv,Na)
    m = jnp.max(logits, axis=-1, keepdims=True)
    e = jnp.exp(logits - m)
    pa = _pnorm(e).astype(dt)
    a2v = jax.lax.dot_general(pa, ah, (((1,), (0,)), ((), ())),
                              preferred_element_type=jnp.float32)
    vo_ref[0] = vh + (gv * a2v).astype(dt)
    if _exact_softmax():
        lt = logits.T                       # row-direction (lane) reductions
        mc = jnp.max(lt, axis=-1, keepdims=True)
        ec = jnp.exp(lt - mc)
        pv = _pnorm(ec).astype(dt)
        v2a = jax.lax.dot_general(pv, vh, (((1,), (0,)), ((), ())),
                                  preferred_element_type=jnp.float32)
    else:
        # column softmax from the SAME exp pass — no 2nd (Nv,Na) exp, no
        # explicit 39 MB transpose (the matmul contracts over rows instead)
        ew = e * jnp.exp(m - jnp.max(m))                   # == exp(l - M)
        s_col = jnp.maximum(jnp.sum(ew, axis=0, keepdims=True), 1e-30)
        pv = (ew * pl.reciprocal(s_col, approx=True)).astype(dt)
        v2a = jax.lax.dot_general(pv, vh, (((0,), (0,)), ((), ())),
                                  preferred_element_type=jnp.float32)
    ao_ref[0] = ah + (ga * v2a).astype(dt)


def _bidir_fuse_pallas(vh, ah, gate_v, gate_a, tq: int = 512):
    B, Nv, D = vh.shape
    Na = ah.shape[1]
    assert Nv % 16 == 0 and Na % 16 == 0 and D % 8 == 0, (Nv, Na, D)
    if Nv * Na * 4 <= (48 << 20):
        gv = gate_v.astype(jnp.float32)
        ga = gate_a.astype(jnp.float32)
        vspec = pl.BlockSpec((1, Nv, D), lambda b: (b, 0, 0),
                             memory_space=pltpu.VMEM)
        aspec = pl.BlockSpec((1, Na, D), lambda b: (b, 0, 0),
                             memory_space=pltpu.VMEM)
        gspec = pl.BlockSpec(memory_space=pltpu.VMEM)
        return pl.pallas_call(
            _bidir_fuse_full_kernel,
            out_shape=(jax.ShapeDtypeStruct(vh.shape, vh.dtype),
                       jax.ShapeDtypeStruct(ah.shape, ah.dtype)),
            grid=(B,),
            in_specs=[vspec, aspec, gspec, gspec],
            out_specs=(vspec, aspec),
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=_gsem(1),
                vmem_limit_bytes=110 * 1024 * 1024),
            interpret=(jax.default_backend() == "cpu"),
        )(vh, ah, gv, ga)
    TQ = min(tq, Nv)
    NQP = _round_up(Nv, TQ)
    if NQP != Nv:
        vh = jnp.pad(vh, ((0, 0), (0, NQP - Nv), (0, 0)))
    gv = gate_v.astype(jnp.float32)
    ga = gate_a.astype(jnp.float32)
    qspec = pl.BlockSpec((1, TQ, D), lambda b, i: (b, i, 0),
                         memory_space=pltpu.VMEM)
    aspec = pl.BlockSpec((1, Na, D), lambda b, i: (b, 0, 0),
                         memory_space=pltpu.VMEM)
    gspec = pl.BlockSpec(memory_space=pltpu.VMEM)
    vo, ao = pl.pallas_call(
        functools.partial(_bidir_fuse_kernel, nv_real=Nv,
                          nq_blocks=NQP // TQ),
        out_shape=(jax.ShapeDtypeStruct((B, NQP, D), vh.dtype),
                   jax.ShapeDtypeStruct((B, Na, D), ah.dtype)),
        grid=(B, NQP // TQ),
        in_specs=[qspec, aspec, gspec, gspec],
        out_specs=(qspec, aspec),
        scratch_shapes=[pltpu.VMEM((1, Na), jnp.float32),
                        pltpu.VMEM((1, Na), jnp.float32),
                        pltpu.VMEM((Na, D), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=_gsem(2),
            vmem_limit_bytes=110 * 1024 * 1024),
        interpret=(jax.default_backend() == "cpu"),
    )(vh, ah, gv, ga)
    return vo[:, :Nv], ao


@jax.custom_vjp
def _bidir_fuse_op(vh, ah, gate_v, gate_a):
    return _bidir_fuse_pallas(vh, ah, gate_v, gate_a)


def _bidir_fwd(vh, ah, gate_v, gate_a):
    return _bidir_fuse_pallas(vh, ah, gate_v, gate_a), (vh, ah, gate_v, gate_a)


def _bidir_bwd(res, g):
    from .attention import cross_modal_fuse
    _, vjp = jax.vjp(cross_modal_fuse, *res)
    return vjp(g)


_bidir_fuse_op.defvjp(_bidir_fwd, _bidir_bwd)


# ---------------------------------------------------------------------------
# windowed bidirectional fusion: per-window grams, both directions, one pass
# (the spatial STG-CMA exchange at Swin stages 0/1 — Swin_AVE.py:747-763)
# ---------------------------------------------------------------------------

def _win_fuse_kernel(vh_ref, ah_ref, gv_ref, ga_ref, fm_ref, vo_ref, ao_ref):
    """vh/ah: (TW, NP, d) window tiles; fm: (NP, NP) additive pad mask
    (symmetric). Same math as _bidir_fuse_full_kernel, batched over windows."""
    vh = vh_ref[:]
    ah = ah_ref[:]
    gv = gv_ref[0]
    ga = ga_ref[0]
    dt = vh.dtype
    logits = jax.lax.dot_general(vh, ah, (((2,), (2,)), ((0,), (0,))),
                                 preferred_element_type=jnp.float32)
    logits = logits + fm_ref[:][None]
    m = jnp.max(logits, axis=-1, keepdims=True)
    e = jnp.exp(logits - m)
    pa = _pnorm(e).astype(dt)
    a2v = jax.lax.dot_general(pa, ah, (((2,), (1,)), ((0,), (0,))),
                              preferred_element_type=jnp.float32)
    lt = logits.transpose(0, 2, 1)          # pad mask is symmetric
    mc = jnp.max(lt, axis=-1, keepdims=True)
    ec = jnp.exp(lt - mc)
    pv = _pnorm(ec).astype(dt)
    v2a = jax.lax.dot_general(pv, vh, (((2,), (1,)), ((0,), (0,))),
                              preferred_element_type=jnp.float32)
    vo_ref[:] = vh + (gv * a2v).astype(dt)
    ao_ref[:] = ah + (ga * v2a).astype(dt)


def _win_fuse_pallas(vh, ah, gate_v, gate_a):
    R, N, D = vh.shape
    NP = _round_up(N, 16)
    DP = _round_up(D, 8)
    fm = np.zeros((NP, NP), np.float32)
    if NP != N:
        fm[:, N:] = -1e30
        fm[N:, :] = -1e30
        pad = ((0, 0), (0, NP - N), (0, DP - D))
        vh = jnp.pad(vh, pad)
        ah = jnp.pad(ah, pad)
    elif DP != D:
        vh = jnp.pad(vh, ((0, 0), (0, 0), (0, DP - D)))
        ah = jnp.pad(ah, ((0, 0), (0, 0), (0, DP - D)))
    # tile budget: the fp32 (TW, NP, NP) logits block + its transpose and
    # both exp/prob products dominate — keep them ~16 MB total; exact-divisor
    # fit avoids pad/slice HBM copies without partial blocks (_fit_tile)
    TW, RP = _fit_tile(R, max(1, (2 << 20) // (NP * NP * 4)))
    if RP != R:
        vh = jnp.pad(vh, ((0, RP - R), (0, 0), (0, 0)))
        ah = jnp.pad(ah, ((0, RP - R), (0, 0), (0, 0)))
    spec = pl.BlockSpec((TW, NP, DP), lambda i: (i, 0, 0),
                        memory_space=pltpu.VMEM)
    gspec = pl.BlockSpec(memory_space=pltpu.VMEM)
    vo, ao = pl.pallas_call(
        _win_fuse_kernel,
        out_shape=(jax.ShapeDtypeStruct(vh.shape, vh.dtype),
                   jax.ShapeDtypeStruct(ah.shape, ah.dtype)),
        grid=(RP // TW,),
        in_specs=[spec, spec, gspec, gspec,
                  pl.BlockSpec((NP, NP), lambda i: (0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=(spec, spec),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=_gsem(1),
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=(jax.default_backend() == "cpu"),
    )(vh, ah, gate_v.astype(jnp.float32), gate_a.astype(jnp.float32),
      jnp.asarray(fm))
    return vo[:R, :N, :D], ao[:R, :N, :D]


@jax.custom_vjp
def _win_fuse_op(vh, ah, gate_v, gate_a):
    return _win_fuse_pallas(vh, ah, gate_v, gate_a)


def _wf_fwd(vh, ah, gate_v, gate_a):
    return _win_fuse_pallas(vh, ah, gate_v, gate_a), (vh, ah, gate_v, gate_a)


def _wf_bwd(res, g):
    from .attention import cross_modal_fuse
    _, vjp = jax.vjp(cross_modal_fuse, *res)
    return vjp(g)


_win_fuse_op.defvjp(_wf_fwd, _wf_bwd)


def cross_modal_fuse_windows(v_hidden, a_hidden, gate_v, gate_a):
    """Drop-in for ops.attention.cross_modal_fuse on WINDOW token batches
    ((BT*nW, ws^2, d) — the spatial STG-CMA exchange at Swin stages 0/1).
    The XLA naive path materializes (R, N, N) fp32 logits twice (49 MB x2 per
    stage-0 block); the kernel runs both directions per window tile in VMEM."""
    from .attention import cross_modal_fuse
    if not fused_attention_enabled() or jax.default_backend() == "cpu":
        return cross_modal_fuse(v_hidden, a_hidden, gate_v, gate_a)
    return _win_fuse_op(v_hidden, a_hidden, gate_v, gate_a)


# ---------------------------------------------------------------------------
# int8 serving variants: W8A8 with fused dynamic activation quantization.
#
# The frozen towers (Swin_AVE.py:1422-1468 trains only adapters/gates/heads)
# quantize to per-out-channel int8 weights (ops/quant.py); these kernels fuse
# the per-row activation quant (abs-max -> scale -> round, all on the VPU,
# VMEM-resident) directly around the int8 MXU dot so the 2x int8 MXU rate is
# realized without the HBM-level quant passes that sank the XLA int8 path
# (BENCH_NOTES round 2: 20 vs 57 clips/s). Measured on v5e: fused dyn-quant
# matmul is 1.4-1.55x the bf16 kernel rate at CLIP shapes (scripts/perf_int8).
#
# Attention grams / softmax / LN / biases stay fp32-bf16 — only the tower
# projections (qkv, out-proj, FFN fc1/fc2) run int8. Serving-only: no VJP
# (int8 mode is inference; training uses the float kernels).
# ---------------------------------------------------------------------------

def _quant_rows(xf):
    """Per-row symmetric int8 quant of an fp32 (M, K) block. Returns
    (int8 values, fp32 (M, 1) scale). approx-reciprocal error (~2^-12) is
    absorbed by dequantizing with the exact scale."""
    ax = jnp.max(jnp.abs(xf), axis=-1, keepdims=True)
    sx = jnp.maximum(ax, 1e-30) * (1.0 / 127.0)
    xq = jnp.clip(jnp.round(xf * pl.reciprocal(sx, approx=True)),
                  -127, 127).astype(jnp.int8)
    return xq, sx


def _bf16_dequant() -> bool:
    """STGCMA_Q_BF16_DEQUANT=1 (probe, VERDICT r3 #1c): run the int8 kernels'
    dequant chain (int32 acc convert + two scale multiplies per element) in
    bf16 instead of fp32 — saved VPU volume if Mosaic packs bf16 lanes 2x on
    v5e, extra ~0.4% rounding on top of the ~1% int8 quant error if not.
    Measured via scripts/ab_bf16_dequant.py; read at trace time."""
    import os
    return os.environ.get("STGCMA_Q_BF16_DEQUANT", "0") == "1"


def _dotq(xf, wq, ws):
    """fp32 activations -> fused row-quant -> int8 MXU dot -> dequant (fp32).
    wq: int8 (K, N); ws: fp32 (1, N) per-out-channel scales."""
    xq, sx = _quant_rows(xf)
    acc = jax.lax.dot_general(xq, wq, (((1,), (0,)), ((), ())),
                              preferred_element_type=jnp.int32)
    if _bf16_dequant():
        out = (acc.astype(jnp.bfloat16) * sx.astype(jnp.bfloat16)
               * ws.astype(jnp.bfloat16))
        return out.astype(jnp.float32)
    return acc.astype(jnp.float32) * sx * ws


def _int8_grams() -> str:
    """STGCMA_Q_INT8_GRAMS: quantize the ATTENTION GRAMS inside the int8
    kernels (VERDICT r4 #3 — the one floor term still priced at bf16/197
    TOPS). Read at trace time. Values:
      ""   (default) — grams stay bf16
      "qk" — q·kᵀ int8 (per-row quant along dh; cheap quant, 2x gram rate)
      "all" — q·kᵀ AND p·v int8 (p rows + v contraction-columns quantized)
    Fidelity is bounded per run by the bench int8-fidelity extra."""
    return os.environ.get("STGCMA_Q_INT8_GRAMS", "")


def _gram_qk(q, k):
    """Batched attention gram q·kᵀ: (G,N,dh)x(G,M,dh)->(G,N,M) fp32.
    bf16 MXU by default; int8 with per-row dynamic quant under
    STGCMA_Q_INT8_GRAMS (both operands contract over dh — row-scale exact)."""
    dims = (((2,), (2,)), ((0,), (0,)))
    if _int8_grams() in ("qk", "all"):
        qf = q.astype(jnp.float32)
        kf = k.astype(jnp.float32)
        sq = jnp.maximum(jnp.max(jnp.abs(qf), axis=-1, keepdims=True),
                         1e-30) * (1.0 / 127.0)
        sk = jnp.maximum(jnp.max(jnp.abs(kf), axis=-1, keepdims=True),
                         1e-30) * (1.0 / 127.0)
        qq = jnp.clip(jnp.round(qf * pl.reciprocal(sq, approx=True)),
                      -127, 127).astype(jnp.int8)
        kq = jnp.clip(jnp.round(kf * pl.reciprocal(sk, approx=True)),
                      -127, 127).astype(jnp.int8)
        acc = jax.lax.dot_general(qq, kq, dims,
                                  preferred_element_type=jnp.int32)
        return acc.astype(jnp.float32) * sq * sk.transpose(0, 2, 1)
    return jax.lax.dot_general(q, k, dims,
                               preferred_element_type=jnp.float32)


def _gram_pv(p, v):
    """Probability-weighted value gram p·v: (G,N,M) fp32 x (G,M,dh) ->
    (G,N,dh) fp32. bf16 MXU by default; int8 under STGCMA_Q_INT8_GRAMS=all
    (p per-row: p>=0 so row max IS the scale; v per contraction-column)."""
    dims = (((2,), (1,)), ((0,), (0,)))
    if _int8_grams() == "all":
        pf = p.astype(jnp.float32)
        vf = v.astype(jnp.float32)
        sp = jnp.maximum(jnp.max(pf, axis=-1, keepdims=True),
                         1e-30) * (1.0 / 127.0)
        sv = jnp.maximum(jnp.max(jnp.abs(vf), axis=1, keepdims=True),
                         1e-30) * (1.0 / 127.0)
        pq = jnp.round(pf * pl.reciprocal(sp, approx=True)).astype(jnp.int8)
        vq = jnp.clip(jnp.round(vf * pl.reciprocal(sv, approx=True)),
                      -127, 127).astype(jnp.int8)
        acc = jax.lax.dot_general(pq, vq, dims,
                                  preferred_element_type=jnp.int32)
        return acc.astype(jnp.float32) * sp * sv
    return jax.lax.dot_general(p.astype(v.dtype), v, dims,
                               preferred_element_type=jnp.float32)


def _win_block_q_core(x_ref, lns_ref, lnb_ref, wqkv_ref, sqkv_ref, bqkv_ref,
                      wproj_ref, sproj_ref, bproj_ref, bm_ref, *,
                      heads: int, ln_eps: float):
    """Shared int8 attention-block body: LN + int8 qkv + attention + int8
    proj. Returns the raw fp32 attention output (TW*N, C) — callers write it
    and/or feed it through a fused adapter down-projection."""
    TW, N, C = x_ref.shape
    dh = C // heads
    scale = dh ** -0.5
    x = x_ref[:].reshape(TW * N, C)
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(xf - mean), axis=-1, keepdims=True)
    xn = (xf - mean) * jax.lax.rsqrt(var + ln_eps)
    xn = xn * lns_ref[:].astype(jnp.float32) + lnb_ref[:].astype(jnp.float32)
    qkv = (_dotq(xn, wqkv_ref[:], sqkv_ref[:])
           + bqkv_ref[:].astype(jnp.float32)).astype(jnp.bfloat16)

    nWb = bm_ref.shape[0]
    outs = []
    for h in range(heads):
        q = qkv[:, h * dh:(h + 1) * dh].reshape(TW, N, dh) * scale
        k = qkv[:, C + h * dh: C + (h + 1) * dh].reshape(TW, N, dh)
        v = qkv[:, 2 * C + h * dh: 2 * C + (h + 1) * dh].reshape(TW, N, dh)
        logits = _gram_qk(q, k)
        logits = logits.reshape(TW // nWb, nWb, N, N) + bm_ref[:, h][None]
        m = jnp.max(logits, axis=-1, keepdims=True)
        e = _softmax_exp(logits - m)
        p = _pnorm(e).reshape(TW, N, N)
        oh = _gram_pv(p, v)
        outs.append(oh.astype(jnp.bfloat16).reshape(TW * N, dh))
    o = jnp.concatenate(outs, axis=-1)          # (TW*N, C) heads merged
    o = _dotq(o.astype(jnp.float32), wproj_ref[:], sproj_ref[:])
    return o + bproj_ref[:].astype(jnp.float32)


def _win_block_q_kernel(x_ref, lns_ref, lnb_ref, wqkv_ref, sqkv_ref, bqkv_ref,
                        wproj_ref, sproj_ref, bproj_ref, bm_ref, o_ref, *,
                        heads: int, ln_eps: float = 1e-5):
    """int8 twin of _win_block_kernel: LN + int8 qkv + attention + int8 proj."""
    TW, N, C = x_ref.shape
    o = _win_block_q_core(x_ref, lns_ref, lnb_ref, wqkv_ref, sqkv_ref,
                          bqkv_ref, wproj_ref, sproj_ref, bproj_ref, bm_ref,
                          heads=heads, ln_eps=ln_eps)
    o_ref[:] = o.astype(o_ref.dtype).reshape(TW, N, C)


def _adapter_down(o, wd_ref, bd_ref):
    """Bottleneck-adapter down-projection + GELU on the raw fp32 attention/FFN
    output (adapters.adapter_hidden fused in-kernel). o is cast to bf16 first
    so the fused hidden matches the unfused path's numerics (the megakernels
    hand bf16 outputs to the XLA adapter)."""
    from .pallas_clip_block import _erf
    h = jax.lax.dot_general(o.astype(jnp.bfloat16),
                            wd_ref[:].astype(jnp.bfloat16),
                            (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32)
    h = h + bd_ref[:].astype(jnp.float32)
    return 0.5 * h * (1.0 + _erf(h * (2.0 ** -0.5)))


def _win_block_qd_kernel(x_ref, lns_ref, lnb_ref, wqkv_ref, sqkv_ref,
                         bqkv_ref, wproj_ref, sproj_ref, bproj_ref, bm_ref,
                         wd_ref, bd_ref, h_ref, *, heads: int,
                         ln_eps: float = 1e-5):
    """Attention block + fused adapter down+GELU, emitting ONLY the (narrow)
    adapter hidden — the CLIP temporal site consumes attn_out exclusively
    through T_Adapter (CLIP_AVE.py:131-135), so the full-width output never
    needs to reach HBM."""
    TW, N, _ = x_ref.shape
    dA = h_ref.shape[-1]
    o = _win_block_q_core(x_ref, lns_ref, lnb_ref, wqkv_ref, sqkv_ref,
                          bqkv_ref, wproj_ref, sproj_ref, bproj_ref, bm_ref,
                          heads=heads, ln_eps=ln_eps)
    h = _adapter_down(o, wd_ref, bd_ref)
    h_ref[:] = h.astype(h_ref.dtype).reshape(TW, N, dA)


def _win_block_qh_kernel(x_ref, lns_ref, lnb_ref, wqkv_ref, sqkv_ref,
                         bqkv_ref, wproj_ref, sproj_ref, bproj_ref, bm_ref,
                         wd_ref, bd_ref, o_ref, h_ref, *, heads: int,
                         ln_eps: float = 1e-5):
    """Attention block emitting BOTH the full-width output (residual operand)
    and the fused adapter hidden (STG-CMA fusion operand) — saves the XLA
    adapter's full-width re-read at the CLIP spatial site."""
    TW, N, C = x_ref.shape
    dA = h_ref.shape[-1]
    o = _win_block_q_core(x_ref, lns_ref, lnb_ref, wqkv_ref, sqkv_ref,
                          bqkv_ref, wproj_ref, sproj_ref, bproj_ref, bm_ref,
                          heads=heads, ln_eps=ln_eps)
    o_ref[:] = o.astype(o_ref.dtype).reshape(TW, N, C)
    h = _adapter_down(o, wd_ref, bd_ref)
    h_ref[:] = h.astype(h_ref.dtype).reshape(TW, N, dA)


def _win_block_q_pallas(x, ln_scale, ln_bias, qp, bm, heads):
    """qp: {'wqkv_q','wqkv_s','bqkv','wproj_q','wproj_s','bproj'}."""
    B_, N, C = x.shape
    nW = bm.shape[0]
    budget = max(1, _winblock_tile_bytes() // (N * C * 2))
    # exact-divisor tile fit (bias phase preserved: TW stays a multiple of
    # nW); explicit pad fallback — see _fit_tile for why no partial blocks
    g, GP = _fit_tile(B_ // nW, max(1, budget // nW))
    TW = g * nW
    BP = GP * nW
    if BP != B_:
        x = jnp.pad(x, ((0, BP - B_), (0, 0), (0, 0)))
    wspec = pl.BlockSpec(memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        functools.partial(_win_block_q_kernel, heads=heads),
        out_shape=jax.ShapeDtypeStruct((BP, N, C), x.dtype),
        grid=(BP // TW,),
        in_specs=[
            pl.BlockSpec((TW, N, C), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            wspec, wspec,           # ln scale/bias
            wspec, wspec, wspec,    # wqkv_q (C,3C) int8, wqkv_s (1,3C), bqkv
            wspec, wspec, wspec,    # wproj_q, wproj_s, bproj
            pl.BlockSpec((nW,) + bm.shape[1:], lambda i: (0, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((TW, N, C), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=_gsem(1),
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=(jax.default_backend() == "cpu"),
    )(x, ln_scale, ln_bias, qp["wqkv_q"], qp["wqkv_s"], qp["bqkv"],
      qp["wproj_q"], qp["wproj_s"], qp["bproj"], bm)
    return out[:B_]


def _win_block_qad_pallas(x, ln_scale, ln_bias, qp, wd, bd, bm, heads,
                          emit_o: bool):
    """qp as in _win_block_q_pallas, plus the adapter down-proj (wd (C, dA),
    bd (dA,)). emit_o=False -> returns the adapter hidden (B_, N, dA) only
    (temporal site); emit_o=True -> (out (B_, N, C), hidden) (spatial/FFN-free
    sites). Tiling identical to _win_block_q_pallas."""
    B_, N, C = x.shape
    dA = wd.shape[1]
    nW = bm.shape[0]
    budget = max(1, _winblock_tile_bytes() // (N * C * 2))
    g, GP = _fit_tile(B_ // nW, max(1, budget // nW))
    TW = g * nW
    BP = GP * nW
    if BP != B_:
        x = jnp.pad(x, ((0, BP - B_), (0, 0), (0, 0)))
    wspec = pl.BlockSpec(memory_space=pltpu.VMEM)
    tile = pl.BlockSpec((TW, N, C), lambda i: (i, 0, 0),
                        memory_space=pltpu.VMEM)
    htile = pl.BlockSpec((TW, N, dA), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM)
    kern = _win_block_qh_kernel if emit_o else _win_block_qd_kernel
    out_shape = [jax.ShapeDtypeStruct((BP, N, dA), x.dtype)]
    out_specs = [htile]
    if emit_o:
        out_shape = [jax.ShapeDtypeStruct((BP, N, C), x.dtype)] + out_shape
        out_specs = [tile] + out_specs
    res = pl.pallas_call(
        functools.partial(kern, heads=heads),
        out_shape=out_shape,
        grid=(BP // TW,),
        in_specs=[
            tile,
            wspec, wspec,           # ln scale/bias
            wspec, wspec, wspec,    # wqkv_q, wqkv_s, bqkv
            wspec, wspec, wspec,    # wproj_q, wproj_s, bproj
            pl.BlockSpec((nW,) + bm.shape[1:], lambda i: (0, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            wspec, wspec,           # adapter wd (C, dA), bd (dA,)
        ],
        out_specs=out_specs,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=_gsem(1),
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=(jax.default_backend() == "cpu"),
    )(x, ln_scale, ln_bias, qp["wqkv_q"], qp["wqkv_s"], qp["bqkv"],
      qp["wproj_q"], qp["wproj_s"], qp["bproj"], bm, wd, bd)
    if emit_o:
        return res[0][:B_], res[1][:B_]
    return res[0][:B_]


def _attn_qparams(attn_p, qkv_key: str = "qkv", proj_key: str = "proj"):
    qkv, proj = attn_p[qkv_key], attn_p[proj_key]
    return {"wqkv_q": qkv["kernel_q"], "wqkv_s": qkv["kernel_s"],
            "bqkv": qkv["bias"],
            "wproj_q": proj["kernel_q"], "wproj_s": proj["kernel_s"],
            "bproj": proj["bias"]}


def _ffn_q_kernel(x_ref, lns_ref, lnb_ref, w1_ref, s1_ref, b1_ref,
                  w2_ref, s2_ref, b2_ref, o_ref, *, act: str,
                  ln_eps: float = 1e-5):
    """int8 twin of _ffn_kernel: LN + int8 fc1 + act + int8 fc2."""
    x = x_ref[:]
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(xf - mean), axis=-1, keepdims=True)
    xn = (xf - mean) * jax.lax.rsqrt(var + ln_eps)
    xn = xn * lns_ref[:].astype(jnp.float32) + lnb_ref[:].astype(jnp.float32)
    h = _dotq(xn, w1_ref[:], s1_ref[:]) + b1_ref[:].astype(jnp.float32)
    if act == "quick_gelu":
        h = h * jax.nn.sigmoid(1.702 * h)
    else:
        from .pallas_clip_block import _erf
        h = 0.5 * h * (1.0 + _erf(h * (2.0 ** -0.5)))
    o = _dotq(h, w2_ref[:], s2_ref[:]) + b2_ref[:].astype(jnp.float32)
    o_ref[:] = o.astype(o_ref.dtype)


def _ffn_q_pallas(x, ln_scale, ln_bias, w1q, s1, b1, w2q, s2, b2, act: str):
    M, C = x.shape
    hid = w1q.shape[1]
    # exact-divisor tile fit (8-aligned); explicit pad fallback (_fit_tile8)
    TT, MP = _fit_tile8(M, min(1024, _round_up((1 << 22) // (hid * 4), 8)))
    if MP != M:
        x = jnp.pad(x, ((0, MP - M), (0, 0)))
    wspec = pl.BlockSpec(memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        functools.partial(_ffn_q_kernel, act=act),
        out_shape=jax.ShapeDtypeStruct((MP, C), x.dtype),
        grid=(MP // TT,),
        in_specs=[pl.BlockSpec((TT, C), lambda i: (i, 0),
                               memory_space=pltpu.VMEM)] + [wspec] * 8,
        out_specs=pl.BlockSpec((TT, C), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=_gsem(1),
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=(jax.default_backend() == "cpu"),
    )(x, ln_scale, ln_bias, w1q, s1, b1, w2q, s2, b2)
    return out[:M]


def ffn_q_megakernel(mlp_p, ln, x, act: str = "gelu",
                     keys: Tuple[str, str] = ("fc1", "fc2")):
    """Fused LN+FFN over int8-quantized weights (serving mode)."""
    shape = x.shape
    flat = x.reshape(-1, shape[-1])
    f1, f2 = keys
    out = _ffn_q_pallas(flat, ln["scale"], ln["bias"],
                        mlp_p[f1]["kernel_q"], mlp_p[f1]["kernel_s"],
                        mlp_p[f1]["bias"],
                        mlp_p[f2]["kernel_q"], mlp_p[f2]["kernel_s"],
                        mlp_p[f2]["bias"], act)
    return out.reshape(shape)


def _ffn_qh_kernel(x_ref, lns_ref, lnb_ref, w1_ref, s1_ref, b1_ref,
                   w2_ref, s2_ref, b2_ref, wd_ref, bd_ref, o_ref, h_ref, *,
                   act: str, ln_eps: float = 1e-5):
    """_ffn_q_kernel + fused adapter down+GELU second output (the MLP_Adapter
    hidden is computed from the FFN output — CLIP_AVE.py:420-428)."""
    x = x_ref[:]
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(xf - mean), axis=-1, keepdims=True)
    xn = (xf - mean) * jax.lax.rsqrt(var + ln_eps)
    xn = xn * lns_ref[:].astype(jnp.float32) + lnb_ref[:].astype(jnp.float32)
    h = _dotq(xn, w1_ref[:], s1_ref[:]) + b1_ref[:].astype(jnp.float32)
    if act == "quick_gelu":
        h = h * jax.nn.sigmoid(1.702 * h)
    else:
        from .pallas_clip_block import _erf
        h = 0.5 * h * (1.0 + _erf(h * (2.0 ** -0.5)))
    o = _dotq(h, w2_ref[:], s2_ref[:]) + b2_ref[:].astype(jnp.float32)
    o_ref[:] = o.astype(o_ref.dtype)
    h_ref[:] = _adapter_down(o, wd_ref, bd_ref).astype(h_ref.dtype)


def _ffn_qh_pallas(x, ln_scale, ln_bias, w1q, s1, b1, w2q, s2, b2, wd, bd,
                   act: str):
    M, C = x.shape
    hid = w1q.shape[1]
    dA = wd.shape[1]
    TT, MP = _fit_tile8(M, min(1024, _round_up((1 << 22) // (hid * 4), 8)))
    if MP != M:
        x = jnp.pad(x, ((0, MP - M), (0, 0)))
    wspec = pl.BlockSpec(memory_space=pltpu.VMEM)
    o, h = pl.pallas_call(
        functools.partial(_ffn_qh_kernel, act=act),
        out_shape=[jax.ShapeDtypeStruct((MP, C), x.dtype),
                   jax.ShapeDtypeStruct((MP, dA), x.dtype)],
        grid=(MP // TT,),
        in_specs=[pl.BlockSpec((TT, C), lambda i: (i, 0),
                               memory_space=pltpu.VMEM)] + [wspec] * 10,
        out_specs=[pl.BlockSpec((TT, C), lambda i: (i, 0),
                                memory_space=pltpu.VMEM),
                   pl.BlockSpec((TT, dA), lambda i: (i, 0),
                                memory_space=pltpu.VMEM)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=_gsem(1),
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=(jax.default_backend() == "cpu"),
    )(x, ln_scale, ln_bias, w1q, s1, b1, w2q, s2, b2, wd, bd)
    return o[:M], h[:M]


def ffn_qh_megakernel(mlp_p, ln, adapter_p, x, act: str = "gelu",
                      keys: Tuple[str, str] = ("fc1", "fc2")):
    """Fused LN+FFN (int8) that ALSO emits the bottleneck-adapter hidden
    gelu(fc1_adapter(ffn_out)) — one HBM pass instead of the XLA adapter
    re-reading the full-width FFN output. Returns (ffn_out, hidden)."""
    shape = x.shape
    flat = x.reshape(-1, shape[-1])
    f1, f2 = keys
    o, h = _ffn_qh_pallas(flat, ln["scale"], ln["bias"],
                          mlp_p[f1]["kernel_q"], mlp_p[f1]["kernel_s"],
                          mlp_p[f1]["bias"],
                          mlp_p[f2]["kernel_q"], mlp_p[f2]["kernel_s"],
                          mlp_p[f2]["bias"],
                          adapter_p["D_fc1"]["kernel"],
                          adapter_p["D_fc1"]["bias"], act)
    dA = h.shape[-1]
    return o.reshape(shape), h.reshape(shape[:-1] + (dA,))


# ---------------------------------------------------------------------------
# temporal v2: transpose-free temporal attention (+ optional adapter)
#
# The temporal stage needs tokens in (B*N, T, C) order, but the tower flows in
# (B*T, N, C); the XLA transposes cost ~4 ms/model on CLIP-B (profile r3).
# Observation: the (T, N, C) slab of ONE batch element is contiguous in the
# (B*T, N, C) layout, so a grid-over-B kernel can DMA it untransposed and do
# the (T, N) -> (N, T) permute entirely in VMEM. Per-token temporal attention
# is then block-diagonal over packed n-groups (pad T->16 in VMEM, 8 tokens ->
# one 128-wide gram); qkv/proj/adapter run on the unpermuted flat tokens.
# Padded n rows only ever attend themselves (block-diagonal), so no n-masking
# is needed; the caller slices them off.
# ---------------------------------------------------------------------------

def _tblock_v2_kernel(x_ref, lns, lnb, wqkv, sqkv, bqkv, wproj, sproj, bproj,
                      a1k, a1b, a2k, a2b, bm_ref, o_ref, *, heads: int,
                      quantized: bool, with_adapter: bool):
    """x: (TG, T, NP, C) with NP a 16-multiple; bm: (1, heads, 128, 128)
    block-diag temporal bias (T-pad masked); o = x + adapter(proj(attn(ln x)))
    (or just the attention output when with_adapter=False)."""
    x = x_ref[:]                                   # (TG, T, NP, C)
    TG, T, NP, C = x.shape
    dh = C // heads
    scale = dh ** -0.5
    TP = 16
    rows = TG * T * NP
    G = TG * (NP // 8)

    flat = x.reshape(rows, C)                      # pure: NP % 16 == 0
    xf = flat.astype(jnp.float32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(xf - mean), axis=-1, keepdims=True)
    xn = (xf - mean) * jax.lax.rsqrt(var + 1e-5)
    xn = xn * lns[:].astype(jnp.float32) + lnb[:].astype(jnp.float32)
    if quantized:
        xq, sx = _quant_rows(xn)
        acc = jax.lax.dot_general(xq, wqkv[:], (((1,), (0,)), ((), ())),
                                  preferred_element_type=jnp.int32)
        qkv = acc.astype(jnp.float32) * sx * sqkv[:]
    else:
        qkv = jnp.dot(xn.astype(x.dtype), wqkv[:].astype(x.dtype),
                      preferred_element_type=jnp.float32)
    qkv = (qkv + bqkv[:].astype(jnp.float32)).astype(x.dtype)

    # VMEM permute to temporal-major + T pad + pack 8 n's per 128-token gram
    qkvT = jnp.transpose(qkv.reshape(TG, T, NP, 3 * C), (0, 2, 1, 3))
    qkvT = jnp.pad(qkvT, ((0, 0), (0, 0), (0, TP - T), (0, 0)))
    qkvT = qkvT.reshape(G, 8 * TP, 3 * C)          # (G, 128, 3C)

    outs = []
    for h in range(heads):
        q = qkvT[:, :, h * dh:(h + 1) * dh] * scale
        k = qkvT[:, :, C + h * dh:C + (h + 1) * dh]
        v = qkvT[:, :, 2 * C + h * dh:2 * C + (h + 1) * dh]
        if quantized:
            logits = _gram_qk(q, k)
        else:
            logits = jax.lax.dot_general(q, k, (((2,), (2,)), ((0,), (0,))),
                                         preferred_element_type=jnp.float32)
        logits = logits + bm_ref[0, h][None]
        m = jnp.max(logits, axis=-1, keepdims=True)
        e = jnp.exp(logits - m)
        if quantized:
            p = _pnorm(e)
            outs.append(_gram_pv(p, v).astype(x.dtype))
        else:
            p = _pnorm(e).astype(x.dtype)
            outs.append(jax.lax.dot_general(p, v, (((2,), (1,)), ((0,), (0,))),
                                            preferred_element_type=jnp.float32
                                            ).astype(x.dtype))
    o = jnp.concatenate(outs, axis=-1)             # (G, 128, C)
    o = o.reshape(TG, NP, TP, C)[:, :, :T]         # drop T pad
    o = jnp.transpose(o, (0, 2, 1, 3)).reshape(rows, C)   # token-major
    if quantized:
        oq, so = _quant_rows(o.astype(jnp.float32))
        acc = jax.lax.dot_general(oq, wproj[:], (((1,), (0,)), ((), ())),
                                  preferred_element_type=jnp.int32)
        o = acc.astype(jnp.float32) * so * sproj[:]
    else:
        o = jnp.dot(o, wproj[:].astype(x.dtype),
                    preferred_element_type=jnp.float32)
    o = o + bproj[:].astype(jnp.float32)
    if with_adapter:
        from .pallas_clip_block import _erf
        h1 = jnp.dot(o.astype(x.dtype), a1k[:].astype(x.dtype),
                     preferred_element_type=jnp.float32)
        h1 = h1 + a1b[:].astype(jnp.float32)
        h1 = 0.5 * h1 * (1.0 + _erf(h1 * (2.0 ** -0.5)))
        res = jnp.dot(h1.astype(x.dtype), a2k[:].astype(x.dtype),
                      preferred_element_type=jnp.float32)
        res = res + a2b[:].astype(jnp.float32)
        o_ref[:] = (flat.astype(jnp.float32) + res
                    ).astype(o_ref.dtype).reshape(TG, T, NP, C)
    else:
        o_ref[:] = o.astype(o_ref.dtype).reshape(TG, T, NP, C)


def _tv2_pallas(cp, ln, ad_p, x, bias, heads: int, T: int, tg: int = 2):
    BT, N, C = x.shape
    B = BT // T
    NP = _round_up(N, 16)   # 16-mult: in-kernel (TG*T*NP, C) flatten is pure
    x4 = x.reshape(B, T, N, C)
    if NP != N:
        x4 = jnp.pad(x4, ((0, 0), (0, 0), (0, NP - N), (0, 0)))
    TG = min(tg, B)
    BP = _round_up(B, TG)
    if BP != B:
        x4 = jnp.pad(x4, ((0, BP - B), (0, 0), (0, 0), (0, 0)))
    TP = 16
    blk = np.full((TP, TP), -1e30, np.float32)
    blk[:, :T] = 0.0
    bm_np = np.full((8 * TP, 8 * TP), -1e30, np.float32)
    for j in range(8):
        bm_np[j * TP:(j + 1) * TP, j * TP:(j + 1) * TP] = blk
    bm = jnp.asarray(np.broadcast_to(bm_np, (1, heads) + bm_np.shape).copy())
    if bias is not None:
        biasp = jnp.pad(bias.astype(jnp.float32),
                        ((0, 0), (0, TP - T), (0, TP - T)))
        bm = bm + jnp.tile(biasp, (1, 8, 8))[None]           # (1,h,128,128)

    quantized = "kernel_q" in cp["qkv"]
    dummy = jnp.zeros((1, 1), jnp.float32)

    def wk(lp):
        if "kernel_q" in lp:
            return [lp["kernel_q"], lp["kernel_s"], lp["bias"]]
        return [lp["kernel"], dummy, lp["bias"]]

    with_adapter = ad_p is not None
    if with_adapter:
        ad_args = [ad_p["D_fc1"]["kernel"], ad_p["D_fc1"]["bias"],
                   ad_p["D_fc2"]["kernel"], ad_p["D_fc2"]["bias"]]
    else:
        ad_args = [dummy, dummy, dummy, dummy]
    args = [ln["scale"], ln["bias"], *wk(cp["qkv"]),
            *wk(cp["proj"]), *ad_args]
    xspec = pl.BlockSpec((TG, T, NP, C), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        functools.partial(_tblock_v2_kernel, heads=heads,
                          quantized=quantized, with_adapter=with_adapter),
        out_shape=jax.ShapeDtypeStruct((BP, T, NP, C), x.dtype),
        grid=(BP // TG,),
        in_specs=[xspec] + [pl.BlockSpec(memory_space=pltpu.VMEM)
                            for _ in args]
        + [pl.BlockSpec((1, heads, 8 * TP, 8 * TP),
                        lambda i: (0, 0, 0, 0), memory_space=pltpu.VMEM)],
        out_specs=xspec,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=_gsem(1),
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=(jax.default_backend() == "cpu"),
    )(x4, *args, bm)
    return out[:B, :, :N].reshape(BT, N, C)


def _tv2_naive(cp, ln, ad_p, x, bias, heads: int, T: int):
    """XLA mirror of the v2 kernel (backward recompute): explicit transposes +
    temporal attention + optional adapter residual."""
    from .attention import mha
    from .common import layernorm, linear
    BT, N, C = x.shape
    B = BT // T
    xt = x.reshape(B, T, N, C).transpose(0, 2, 1, 3).reshape(B * N, T, C)
    xn = layernorm(ln, xt)
    if bias is None:
        attn_p = {"in_proj": cp["qkv"], "out_proj": cp["proj"]}
        out = mha(attn_p, xn, xn, xn, heads)
    else:
        dh = C // heads
        qkv = linear(cp["qkv"], xn).reshape(B * N, T, 3, heads, dh
                                            ).transpose(2, 0, 3, 1, 4)
        q, k, v = qkv[0] * dh ** -0.5, qkv[1], qkv[2]
        logits = jnp.einsum("bhnd,bhmd->bhnm", q, k,
                            preferred_element_type=jnp.float32)
        p = jax.nn.softmax(logits + bias[None].astype(jnp.float32),
                           axis=-1).astype(x.dtype)
        o = jnp.einsum("bhnm,bhmd->bhnd", p, v)
        out = linear(cp["proj"], o.transpose(0, 2, 1, 3).reshape(B * N, T, C))
    if ad_p is not None:
        from ..nn.adapters import adapter_apply
        out = xt + adapter_apply(ad_p, out, skip=False)
    return out.reshape(B, N, T, C).transpose(0, 2, 1, 3).reshape(BT, N, C)


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6))
def _tv2_op(cp, ln, ad_p, x, bias, heads, T):
    return _tv2_pallas(cp, ln, ad_p, x, bias, heads, T)


def _tv2_fwd(cp, ln, ad_p, x, bias, heads, T):
    return _tv2_pallas(cp, ln, ad_p, x, bias, heads, T), \
        (cp, ln, ad_p, x, bias)


def _tv2_bwd(heads, T, res, g):
    cp, ln, ad_p, x, bias = res
    _, vjp = jax.vjp(lambda *a: _tv2_naive(*a, heads, T), cp, ln, ad_p, x,
                     bias)
    return vjp(g)


_tv2_op.defvjp(_tv2_fwd, _tv2_bwd)


def temporal_adapt_v2(attn_p, ln, ad_p, x, heads: int, T: int,
                      bias=None,
                      qkv_key: str = "in_proj", proj_key: str = "out_proj"):
    """Transpose-free CLIP temporal stage: x (B*T, N, C) in SPATIAL layout ->
    x + T_Adapter(MHA_time(LN(x))), still in spatial layout. `bias`: optional
    (heads, T, T) additive temporal bias (Swin tables); None = zeros (CLIP).
    """
    cp = {"qkv": attn_p[qkv_key], "proj": attn_p[proj_key]}
    if "kernel_q" in attn_p[qkv_key]:     # int8 serving: forward-only
        return _tv2_pallas(cp, ln, ad_p, x, bias, heads, T)
    return _tv2_op(cp, ln, ad_p, x, bias, heads, T)
