"""Whole-block Pallas megakernel for the Swin STG-CMA fusion block.

Reference semantics: AVE/model/Swin_AVE.py:693-813 (the fusion_adapt branch of
SwinTransformerBlock) — everything AFTER the temporal stage:

    shifted W-MSA per modality (shared qkv/proj, relative position bias)
    S_Adapter2 hiddens + gated bidirectional cross-modal fusion PER WINDOW
    window merge + shortcut residual
    FFN (LN2 + Mlp, exact GELU) per modality
    S_Adapter hiddens + gated cross-modal fusion over the FULL stage grid
    final residuals

TPU-first design — full-grid masked attention instead of window partition:
the roll + window_partition + window_reverse + roll-back sequence is four
whole-tensor HBM copies per block in the windowed lowering. Here the window
structure is encoded STATICALLY: attention runs over the full (H*W) token
grid with an additive mask that is -1e30 across rolled-window boundaries
(exactly reproducing the per-window softmax — masked keys underflow to 0)
plus the reference's -100 region mask for shifted blocks. Window-level
spatial fusion becomes the same masked-gram trick. The whole block then
needs ONE HBM read and ONE write per stream.

Only profitable where the full gram is small (stage 2: 196 tokens x18
blocks, stage 3: 49 — together 20/24 Swin-Base blocks); stages 0/1 keep the
windowed megakernels (the 56x56 full gram would cost 3x the block FLOPs).

Heads run through a lax.fori_loop with per-head weight slabs pre-split on a
LEADING dim (wqkv -> (h, C, 3dh)) so dynamic indexing never touches the lane
axis. This keeps Mosaic IR size constant in head count — the unrolled
per-head Python loop of the v1 kernels blows up compilation at 32 heads
(Swin-Base stage 3) and 24/48 heads (Swin-Large stages 2/3).

Gradients: custom_vjp with a recomputing XLA backward from the naive mirror
(`_fullgrid_naive`) — training numerics match the unfused path, including
relative-position-bias-table gradients (the gather is re-done in XLA).
"""
from __future__ import annotations

import functools
from typing import Dict, Tuple

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .pallas_attn import _gsem
from .pallas_clip_block import _erf, _ln  # shared Mosaic-safe primitives


def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


def _p_norm(e, dt):
    """exp-numerator -> probabilities (shared numerics policy in pallas_attn:
    approx-reciprocal by default, STGCMA_EXACT_SOFTMAX=1 for exact divide)."""
    from .pallas_attn import _pnorm
    return _pnorm(e).astype(dt)


def _gelu(x):
    """Exact (erf) GELU — Swin adapters/Mlp use torch nn.GELU (Swin_AVE.py:34)."""
    xf = x.astype(jnp.float32)
    y = 0.5 * xf * (1.0 + _erf(xf * (2.0 ** -0.5)))
    return y.astype(x.dtype)


# ---------------------------------------------------------------------------
# static full-grid geometry (numpy, cached per block shape)
# ---------------------------------------------------------------------------

class _Geo:
    """Static constants for one (H, W, ws, ss) block geometry."""

    def __init__(self, H: int, W: int, ws: int, ss: int):
        N = H * W
        NP = _round_up(N, 16)  # bf16 sublane tile: keeps in-kernel reshapes pure
        ii, jj = np.meshgrid(np.arange(H), np.arange(W), indexing="ij")
        # token (i,j) sits at rolled coords (r,c) after x=roll(x, (-ss,-ss))
        r = (ii - ss) % H
        c = (jj - ss) % W
        win = (r // ws) * (W // ws) + (c // ws)
        pos = (r % ws) * ws + (c % ws)
        win_f = win.reshape(-1)
        pos_f = pos.reshape(-1)
        same_win = win_f[:, None] == win_f[None, :]

        from .window import relative_position_index
        rel = relative_position_index(ws)  # (ws^2, ws^2)
        bias_index = rel[pos_f[:, None], pos_f[None, :]].astype(np.int32)

        attn_mask = np.where(same_win, 0.0, -1e30).astype(np.float32)
        if ss > 0:
            # reference shift mask: -100 between different pre-roll regions
            # inside the same rolled window (Swin_AVE.py:368-391). Region is a
            # function of the ROLLED coordinate (img_mask is partitioned
            # without rolling).
            region = np.zeros((H, W), np.int32)
            cnt = 0
            for hs in (slice(0, -ws), slice(-ws, -ss), slice(-ss, None)):
                for wsl in (slice(0, -ws), slice(-ws, -ss), slice(-ss, None)):
                    region[hs, wsl] = cnt
                    cnt += 1
            reg_f = region[r, c].reshape(-1)
            attn_mask += np.where(
                same_win & (reg_f[:, None] != reg_f[None, :]),
                np.float32(-100.0), np.float32(0.0))
        fuse_mask = np.where(same_win, 0.0, -1e30).astype(np.float32)

        def _pad(m):
            out = np.full((NP, NP), -1e30, np.float32)
            out[:N, :N] = m
            return out

        self.N, self.NP = N, NP
        self.bias_index = bias_index                       # (N, N) int32
        bias_index_p = np.zeros((NP, NP), np.int32)
        bias_index_p[:N, :N] = bias_index
        self.bias_index_p = bias_index_p
        self.attn_mask = attn_mask                         # (N, N)
        self.attn_mask_p = _pad(attn_mask)                 # (NP, NP)
        self.fuse_mask = fuse_mask
        self.fuse_mask_p = _pad(fuse_mask)
        joint = np.zeros((N, N), np.float32)
        self.joint_mask_p = _pad(joint)

        # ---- window-major layout (rolled windows contiguous) -------------
        # slot s = win*WS + pos; attention/spatial-fusion grams shrink from
        # (NP, NP) to per-window (WS, WS) — 2.6x less logits/exp volume at
        # stage 2 — at the cost of one gather in / one gather out around the
        # kernel and 49->64 row padding on the token axis.
        ws2 = ws * ws
        WS = _round_up(ws2, 16)
        nW = (H // ws) * (W // ws)
        NPW = nW * WS
        slot_of = (win_f * WS + pos_f).astype(np.int32)
        perm = np.zeros((NPW,), np.int32)
        valid = np.zeros((NPW,), bool)
        perm[slot_of] = np.arange(N, dtype=np.int32)
        valid[slot_of] = True
        self.nW, self.WS, self.NPW = nW, WS, NPW
        self.perm = perm                       # winmajor slot -> rowmajor idx
        self.inv_perm = slot_of                # rowmajor idx -> winmajor slot
        rel_p = np.zeros((WS, WS), np.int32)
        rel_p[:ws2, :ws2] = rel
        self.rel_p = rel_p
        wmask = np.full((nW, WS, WS), -1e30, np.float32)
        if ss > 0:
            from .window import shift_attn_mask
            wmask[:, :ws2, :ws2] = shift_attn_mask(H, W, ws, ss)
        else:
            wmask[:, :ws2, :ws2] = 0.0
        self.wmask = wmask                     # (nW, WS, WS) additive
        fw = np.full((WS, WS), -1e30, np.float32)
        fw[:ws2, :ws2] = 0.0
        self.fuse_w = fw
        jw = np.zeros((NPW, NPW), np.float32)
        # mask pad-slot keys SYMMETRICALLY: the in-kernel _fuse reuses the
        # transposed logits for the second direction, so column-only masking
        # would leak pad v-keys into the audio update
        jw[:, ~valid] = -1e30
        jw[~valid, :] = -1e30
        self.joint_w = jw


_GEO_CACHE: Dict[Tuple[int, int, int, int], _Geo] = {}


def _geo(H: int, W: int, ws: int, ss: int) -> _Geo:
    key = (H, W, ws, ss)
    if key not in _GEO_CACHE:
        _GEO_CACHE[key] = _Geo(H, W, ws, ss)
    return _GEO_CACHE[key]


# ---------------------------------------------------------------------------
# naive XLA mirror (backward recompute + CPU path + parity oracle)
# ---------------------------------------------------------------------------

def _fullgrid_naive(p, v, a, heads: int, geo: _Geo):
    """Mathematically identical to the windowed _dual_fusion body (post-
    temporal): masked full-grid attention == per-window attention because
    -1e30 keys underflow to exactly 0 in fp32 softmax."""
    from .common import layernorm, linear, mlp_apply, gelu

    BT, N, C = v.shape
    dh = C // heads
    scale = dh ** -0.5
    table = p["attn"]["relative_position_bias_table"].astype(jnp.float32)
    bias = table[jnp.asarray(geo.bias_index.reshape(-1))]
    bias = bias.reshape(N, N, heads).transpose(2, 0, 1)       # (h, N, N)
    bias_full = bias + jnp.asarray(geo.attn_mask)[None]
    fuse_mask = jnp.asarray(geo.fuse_mask)

    def attn(x):
        xn = layernorm(p["norm1"], x)
        qkv = linear(p["attn"]["qkv"], xn)
        qkv = qkv.reshape(BT, N, 3, heads, dh).transpose(2, 0, 3, 1, 4)
        q, k, vv = qkv[0] * scale, qkv[1], qkv[2]
        logits = jnp.einsum("bhnd,bhmd->bhnm", q, k,
                            preferred_element_type=jnp.float32)
        logits = logits + bias_full[None]
        pr = jax.nn.softmax(logits, axis=-1).astype(x.dtype)
        o = jnp.einsum("bhnm,bhmd->bhnd", pr, vv)
        o = o.transpose(0, 2, 1, 3).reshape(BT, N, C)
        return linear(p["attn"]["proj"], o)

    def fuse(vh, ah, mask):
        dt = vh.dtype
        logits = jnp.einsum("bnd,bmd->bnm", vh, ah,
                            preferred_element_type=jnp.float32)
        if mask is not None:
            logits = logits + mask[None]
        pa = jax.nn.softmax(logits, axis=-1).astype(dt)
        a2v = jnp.einsum("bnm,bmd->bnd", pa, ah)
        pv = jax.nn.softmax(logits.transpose(0, 2, 1), axis=-1).astype(dt)
        v2a = jnp.einsum("bmn,bnd->bmd", pv, vh)
        return (vh + p["gate_v"].astype(dt) * a2v,
                ah + p["gate_a"].astype(dt) * v2a)

    vs = attn(v)
    a_s = attn(a)
    vh = gelu(linear(p["S_Adapter2"]["D_fc1"], vs))
    ah = gelu(linear(p["S_Adapter2_Audio"]["D_fc1"], a_s))
    vh, ah = fuse(vh, ah, fuse_mask)
    v = v + vs + linear(p["S_Adapter2"]["D_fc2"], vh)
    a = a + a_s + linear(p["S_Adapter2_Audio"]["D_fc2"], ah)

    vn = mlp_apply(p["mlp"], layernorm(p["norm2"], v))
    an = mlp_apply(p["mlp"], layernorm(p["norm2"], a))
    vh2 = gelu(linear(p["S_Adapter"]["D_fc1"], vn))
    ah2 = gelu(linear(p["S_Adapter_Audio"]["D_fc1"], an))
    vh2, ah2 = fuse(vh2, ah2, None)
    v = v + vn + linear(p["S_Adapter"]["D_fc2"], vh2)
    a = a + an + linear(p["S_Adapter_Audio"]["D_fc2"], ah2)
    return v, a


# ---------------------------------------------------------------------------
# the kernel
# ---------------------------------------------------------------------------

def _swin_block_kernel(v_ref, a_ref,
                       ln1s, ln1b, wqkv_r, sqkv_r, bqkv_r, wproj, sproj, bproj,
                       ln2s, ln2b, w1, s1, b1, w2, s2, b2,
                       s2v1k, s2v1b, s2v2k, s2v2b,
                       s2a1k, s2a1b, s2a2k, s2a2b,
                       sgv1k, sgv1b, sgv2k, sgv2b,
                       sga1k, sga1b, sga2k, sga2b,
                       gv_ref, ga_ref, bias_ref, fmask_ref, jmask_ref,
                       vo_ref, ao_ref, oh_scratch, *, heads: int, nW: int,
                       quantized: bool = False):
    """v/a: (TB, NP, C) with NP = nW * WS (window-major token layout; the
    row-major mask-encoded mode is the nW=1 special case). wqkv_r:
    (h, C, 3dh); bqkv_r: (h, 1, 3dh); wproj: (C, C); bias:
    (h, nW, WS, WS) fp32 (rel-pos bias + shift mask + pad); fmask: (WS, WS)
    per-window spatial-fusion mask; jmask: (NP, NP); oh_scratch:
    (h, 2TB*NP, dh) VMEM scratch for per-head attention outputs (the proj
    then runs as ONE (rows, C) @ (C, C) matmul — a per-head
    (rows, dh) @ (dh, C) accumulation is MXU pass-latency-bound at dh=32)."""
    v = v_ref[:]
    a = a_ref[:]
    TB, NP, C = v.shape
    WS = NP // nW
    dh = C // heads
    scale = dh ** -0.5
    dt = v.dtype
    gv = gv_ref[0]
    ga = ga_ref[0]

    # ---- shifted W-MSA (per rolled window), both streams batched ---------
    x2 = jnp.concatenate([v, a], axis=0)                   # (2TB, NP, C)
    B2 = 2 * TB
    rows = B2 * NP
    BW = B2 * nW
    xn = _ln(x2.reshape(rows, C), ln1s[:], ln1b[:])
    if quantized:
        # one per-row activation quant shared by every head's int8 qkv slab
        from .pallas_attn import _quant_rows
        xn_q, xn_s = _quant_rows(xn.astype(jnp.float32))

    def _one_head(qkv_h, bias_h):
        # qkv_h: (rows, 3dh) for one head; bias_h: (nW, WS, WS);
        # returns (rows, dh)
        q = qkv_h[:, :dh].reshape(BW, WS, dh) * scale
        k = qkv_h[:, dh:2 * dh].reshape(BW, WS, dh)
        vv = qkv_h[:, 2 * dh:].reshape(BW, WS, dh)
        if quantized:
            from .pallas_attn import _gram_pv, _gram_qk
            logits = _gram_qk(q, k)
        else:
            logits = jax.lax.dot_general(q, k, (((2,), (2,)), ((0,), (0,))),
                                         preferred_element_type=jnp.float32)
        logits = logits.reshape(B2, nW, WS, WS) + bias_h[None]
        m = jnp.max(logits, axis=-1, keepdims=True)
        e = jnp.exp(logits - m)
        if quantized:
            pr = _p_norm(e, jnp.float32).reshape(BW, WS, WS)
            oh = _gram_pv(pr, vv)
        else:
            pr = _p_norm(e, dt).reshape(BW, WS, WS)
            oh = jax.lax.dot_general(pr, vv, (((2,), (1,)), ((0,), (0,))),
                                     preferred_element_type=jnp.float32)
        return oh.astype(dt).reshape(rows, dh)

    def _head_qkv(h):
        if quantized:
            acc = jax.lax.dot_general(xn_q, wqkv_r[h], (((1,), (0,)), ((), ())),
                                      preferred_element_type=jnp.int32)
            qkv_h = acc.astype(jnp.float32) * xn_s * sqkv_r[h]
        else:
            qkv_h = jnp.dot(xn, wqkv_r[h], preferred_element_type=jnp.float32)
        return (qkv_h + bqkv_r[h].astype(jnp.float32)).astype(dt)

    if heads <= 16:
        # unrolled per-head bodies: Mosaic's scheduler can interleave head
        # h+1's matmuls under head h's softmax (a serial fori_loop leaves the
        # MXU idle during VPU work). Same per-head matmuls as the fori path —
        # a single wide qkv + static 96-lane slices measured slower
        # (unaligned lane slices relayout).
        outs = [_one_head(_head_qkv(h), bias_ref[h]) for h in range(heads)]
        o = jnp.concatenate(outs, axis=-1)
    else:
        # many heads (Swin-Large stages 2/3): fori_loop keeps Mosaic IR size
        # constant in head count; outputs land in VMEM scratch
        def head_body(h, carry):
            oh_scratch[h] = _one_head(_head_qkv(h), bias_ref[h])
            return carry

        jax.lax.fori_loop(0, heads, head_body, jnp.int32(0))
        # heads -> lanes via static concat (a (rows, h, dh) -> (rows, C)
        # shape cast is not lowerable; one concat keeps IR size O(h))
        o = jnp.concatenate([oh_scratch[h] for h in range(heads)], axis=-1)
    if quantized:
        from .pallas_attn import _dotq
        acc = _dotq(o.astype(jnp.float32), wproj[:], sproj[:])
    else:
        acc = jnp.dot(o, wproj[:].astype(dt),
                      preferred_element_type=jnp.float32)
    attn2 = (acc + bproj[:].astype(jnp.float32)).astype(dt).reshape(B2, NP, C)
    vs = attn2[:TB]
    a_s = attn2[TB:]

    def _ad_h(x, w, b):
        h = jnp.dot(x, w, preferred_element_type=jnp.float32)
        return _gelu((h + b.astype(jnp.float32)).astype(dt))

    def _ad_o(h, w, b):
        o = jnp.dot(h, w, preferred_element_type=jnp.float32)
        return (o + b.astype(jnp.float32)).astype(dt)

    def _fuse(vh, ah, mask):
        # bidirectional gated cross attention; mask is symmetric so the
        # transposed logits reuse the masked matrix (Swin_AVE.py:747-763).
        # The gram's exp is computed ONCE (row-max basis); the column
        # direction derives from it via the per-row correction
        # w = exp(ma - M): ea*w == exp(logits - M) is a valid unnormalized
        # numerator for both softmax directions (see
        # pallas_attn._bidir_fuse_full_kernel).
        from .pallas_attn import _exact_softmax
        logits = jax.lax.dot_general(vh, ah, (((2,), (2,)), ((0,), (0,))),
                                     preferred_element_type=jnp.float32)
        logits = logits + mask[None]
        ma = jnp.max(logits, axis=-1, keepdims=True)
        ea = jnp.exp(logits - ma)
        pa = _p_norm(ea, dt)
        a2v = jax.lax.dot_general(pa, ah, (((2,), (1,)), ((0,), (0,))),
                                  preferred_element_type=jnp.float32)
        if _exact_softmax():
            lt = logits.transpose(0, 2, 1)
            mv = jnp.max(lt, axis=-1, keepdims=True)
            ev = jnp.exp(lt - mv)
            pv = (ev / jnp.sum(ev, axis=-1, keepdims=True)).astype(dt)
            v2a = jax.lax.dot_general(pv, vh, (((2,), (1,)), ((0,), (0,))),
                                      preferred_element_type=jnp.float32)
        else:
            ew = ea * jnp.exp(ma - jnp.max(ma, axis=1, keepdims=True))
            s_col = jnp.maximum(jnp.sum(ew, axis=1, keepdims=True), 1e-30)
            pv = (ew * pl.reciprocal(s_col, approx=True)).astype(dt)
            v2a = jax.lax.dot_general(pv, vh, (((1,), (1,)), ((0,), (0,))),
                                      preferred_element_type=jnp.float32)
        return (vh + (gv * a2v).astype(dt), ah + (ga * v2a).astype(dt))

    # ---- spatial S-adapter + per-window fusion ---------------------------
    dA = s2v1k.shape[1]
    TW = TB * nW
    vh = _ad_h(vs.reshape(TB * NP, C), s2v1k[:], s2v1b[:]).reshape(TW, WS, dA)
    ah = _ad_h(a_s.reshape(TB * NP, C), s2a1k[:], s2a1b[:]).reshape(TW, WS, dA)
    vh, ah = _fuse(vh, ah, fmask_ref[:])
    vh = vh.reshape(TB, NP, dA)
    ah = ah.reshape(TB, NP, dA)
    v = v + vs + _ad_o(vh.reshape(TB * NP, dA), s2v2k[:], s2v2b[:]
                       ).reshape(TB, NP, C)
    a = a + a_s + _ad_o(ah.reshape(TB * NP, dA), s2a2k[:], s2a2b[:]
                        ).reshape(TB, NP, C)

    # ---- FFN (both streams batched) --------------------------------------
    x2 = jnp.concatenate([v, a], axis=0).reshape(rows, C)
    xn2 = _ln(x2, ln2s[:], ln2b[:])
    if quantized:
        from .pallas_attn import _dotq
        hmid = _dotq(xn2.astype(jnp.float32), w1[:], s1[:])
        hmid = hmid + b1[:].astype(jnp.float32)
        hmid = 0.5 * hmid * (1.0 + _erf(hmid * (2.0 ** -0.5)))
        n2 = _dotq(hmid, w2[:], s2[:])
    else:
        hmid = jnp.dot(xn2, w1[:], preferred_element_type=jnp.float32)
        hmid = _gelu((hmid + b1[:].astype(jnp.float32)).astype(dt))
        n2 = jnp.dot(hmid, w2[:], preferred_element_type=jnp.float32)
    n2 = (n2 + b2[:].astype(jnp.float32)).astype(dt)
    vn = n2[:TB * NP]
    an = n2[TB * NP:]

    # ---- joint/global adapter fusion over the full grid ------------------
    dG = sgv1k.shape[1]
    vh2 = _ad_h(vn, sgv1k[:], sgv1b[:]).reshape(TB, NP, dG)
    ah2 = _ad_h(an, sga1k[:], sga1b[:]).reshape(TB, NP, dG)
    vh2, ah2 = _fuse(vh2, ah2, jmask_ref[:])
    vo_ref[:] = v + vn.reshape(TB, NP, C) + _ad_o(
        vh2.reshape(TB * NP, dG), sgv2k[:], sgv2b[:]).reshape(TB, NP, C)
    ao_ref[:] = a + an.reshape(TB, NP, C) + _ad_o(
        ah2.reshape(TB * NP, dG), sga2k[:], sga2b[:]).reshape(TB, NP, C)


def _winmajor_enabled() -> bool:
    """Window-major layout measured NET NEGATIVE at Swin-Base stage 2
    (53.4 vs 57.9 clips/s): the in/out permutation gathers plus 49->64
    per-window row padding on FFN/qkv outweigh the 2.6x logits/exp savings.
    Kept as a tested opt-in (STGCMA_SWIN_WINMAJOR=1) for other geometries."""
    import os
    return os.environ.get("STGCMA_SWIN_WINMAJOR", "0") == "1"


def _fullgrid_pallas(p, v, a, geo_key, winmajor=None):
    H, W, ws, ss, heads = geo_key
    geo = _geo(H, W, ws, ss)
    BT, N, C = v.shape
    dh = C // heads
    dt = v.dtype
    if winmajor is None:
        winmajor = _winmajor_enabled()
    winmajor = winmajor and geo.nW > 1

    table = p["attn"]["relative_position_bias_table"].astype(jnp.float32)
    if winmajor:
        # window-major token layout: per-window (WS, WS) grams instead of the
        # (NP, NP) mask-encoded full grid — 2.6x less logits/exp volume at
        # stage 2; one gather in / one gather out around the kernel.
        NP, nW, WS = geo.NPW, geo.nW, geo.WS
        v = v[:, jnp.asarray(geo.perm), :]
        a = a[:, jnp.asarray(geo.perm), :]
        bias = table[jnp.asarray(geo.rel_p.reshape(-1))]
        bias = bias.reshape(WS, WS, heads).transpose(2, 0, 1)  # (h, WS, WS)
        bias = bias[:, None] + jnp.asarray(geo.wmask)[None]    # (h,nW,WS,WS)
        fmask = jnp.asarray(geo.fuse_w)
        jmask = jnp.asarray(geo.joint_w)
    else:
        NP, nW = geo.NP, 1
        # bias gather in XLA (tiny; shared across BT tiles + both streams)
        bias = table[jnp.asarray(geo.bias_index_p.reshape(-1))]
        bias = bias.reshape(NP, NP, heads).transpose(2, 0, 1)
        bias = (bias + jnp.asarray(geo.attn_mask_p)[None])[:, None]
        fmask = jnp.asarray(geo.fuse_mask_p)
        jmask = jnp.asarray(geo.joint_mask_p)

    # per-head weight slabs: leading-dim indexed inside the kernel
    quantized = "kernel_q" in p["attn"]["qkv"]
    dummy = jnp.zeros((1, 1), jnp.float32)
    wqkv = p["attn"]["qkv"]["kernel_q"] if quantized \
        else p["attn"]["qkv"]["kernel"].astype(dt)             # (C, 3C)
    wq, wk, wv = wqkv[:, :C], wqkv[:, C:2 * C], wqkv[:, 2 * C:]
    def _slab(w):                                              # (C,C)->(h,C,dh)
        return w.reshape(C, heads, dh).transpose(1, 0, 2)
    wqkv_r = jnp.concatenate([_slab(wq), _slab(wk), _slab(wv)], axis=-1)
    if quantized:
        sq = p["attn"]["qkv"]["kernel_s"]                      # (1, 3C)
        def _sslab(ss_):                                       # (1,C)->(h,1,dh)
            return ss_.reshape(1, heads, dh).transpose(1, 0, 2)
        sqkv_r = jnp.concatenate([_sslab(sq[:, :C]), _sslab(sq[:, C:2 * C]),
                                  _sslab(sq[:, 2 * C:])], axis=-1)
    else:
        sqkv_r = jnp.zeros((heads, 1, 1), jnp.float32)
    bqkv = p["attn"]["qkv"]["bias"]
    bq, bk, bv = bqkv[:C], bqkv[C:2 * C], bqkv[2 * C:]
    # (h, 1, 3dh): singleton middle dim keeps the in-kernel dynamic head index
    # on an untiled leading dim (Mosaic can't prove sublane alignment on 2D)
    bqkv_r = jnp.concatenate([bq.reshape(heads, 1, dh), bk.reshape(heads, 1, dh),
                              bv.reshape(heads, 1, dh)], axis=-1)
    def wkq(lp):
        if quantized:
            return [lp["kernel_q"], lp["kernel_s"], lp["bias"]]
        return [lp["kernel"].astype(dt), dummy, lp["bias"]]

    args = [
        p["norm1"]["scale"], p["norm1"]["bias"],
        wqkv_r, sqkv_r, bqkv_r, *wkq(p["attn"]["proj"]),
        p["norm2"]["scale"], p["norm2"]["bias"],
        *wkq(p["mlp"]["fc1"]), *wkq(p["mlp"]["fc2"]),
        p["S_Adapter2"]["D_fc1"]["kernel"].astype(dt), p["S_Adapter2"]["D_fc1"]["bias"],
        p["S_Adapter2"]["D_fc2"]["kernel"].astype(dt), p["S_Adapter2"]["D_fc2"]["bias"],
        p["S_Adapter2_Audio"]["D_fc1"]["kernel"].astype(dt), p["S_Adapter2_Audio"]["D_fc1"]["bias"],
        p["S_Adapter2_Audio"]["D_fc2"]["kernel"].astype(dt), p["S_Adapter2_Audio"]["D_fc2"]["bias"],
        p["S_Adapter"]["D_fc1"]["kernel"].astype(dt), p["S_Adapter"]["D_fc1"]["bias"],
        p["S_Adapter"]["D_fc2"]["kernel"].astype(dt), p["S_Adapter"]["D_fc2"]["bias"],
        p["S_Adapter_Audio"]["D_fc1"]["kernel"].astype(dt), p["S_Adapter_Audio"]["D_fc1"]["bias"],
        p["S_Adapter_Audio"]["D_fc2"]["kernel"].astype(dt), p["S_Adapter_Audio"]["D_fc2"]["bias"],
        p["gate_v"].astype(jnp.float32), p["gate_a"].astype(jnp.float32),
        bias, fmask, jmask,
    ]

    # tile: bound the dominant fp32 transients (FFN hidden + one head's
    # logits + fusion logits) to ~24 MB
    import os
    tb_env = os.environ.get("STGCMA_SWIN_WB_TB")
    hid = (p["mlp"]["fc1"]["kernel_q"] if quantized
           else p["mlp"]["fc1"]["kernel"]).shape[1]
    WSb = NP // nW
    per_tb = 2 * NP * hid * 4 + 4 * nW * WSb * WSb * 4 + 2 * NP * NP * 4
    TB = int(tb_env) if tb_env else max(1, min(BT, (24 << 20) // per_tb))
    BTP = _round_up(BT, TB)
    vp = jnp.pad(v, ((0, BTP - BT), (0, NP - v.shape[1]), (0, 0)))
    ap = jnp.pad(a, ((0, BTP - BT), (0, NP - a.shape[1]), (0, 0)))

    xspec = pl.BlockSpec((TB, NP, C), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM)
    wspecs = [pl.BlockSpec(memory_space=pltpu.VMEM) for _ in args]
    vo, ao = pl.pallas_call(
        functools.partial(_swin_block_kernel, heads=heads, nW=nW,
                          quantized=quantized),
        out_shape=(jax.ShapeDtypeStruct((BTP, NP, C), dt),
                   jax.ShapeDtypeStruct((BTP, NP, C), dt)),
        grid=(BTP // TB,),
        in_specs=[xspec, xspec] + wspecs,
        out_specs=(xspec, xspec),
        scratch_shapes=[pltpu.VMEM((heads, 2 * TB * NP, dh), dt)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=_gsem(1),
            vmem_limit_bytes=110 * 1024 * 1024),
        interpret=(jax.default_backend() == "cpu"),
    )(vp, ap, *args)
    if winmajor:
        return vo[:BT][:, jnp.asarray(geo.inv_perm), :], \
            ao[:BT][:, jnp.asarray(geo.inv_perm), :]
    return vo[:BT, :N], ao[:BT, :N]


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def _swin_block_op(p, v, a, geo_key):
    return _fullgrid_pallas(p, v, a, geo_key)


def _sb_fwd(p, v, a, geo_key):
    return _fullgrid_pallas(p, v, a, geo_key), (p, v, a)


def _sb_bwd(geo_key, res, g):
    p, v, a = res
    H, W, ws, ss, heads = geo_key
    geo = _geo(H, W, ws, ss)

    def naive(p, v, a):
        return _fullgrid_naive(p, v, a, heads, geo)

    _, vjp = jax.vjp(naive, p, v, a)
    return vjp(g)


_swin_block_op.defvjp(_sb_fwd, _sb_bwd)


# ---------------------------------------------------------------------------
# public entry
# ---------------------------------------------------------------------------

def swin_whole_block_enabled(st) -> bool:
    """Whole-block kernel policy: fusion mode with both fusion adapters on,
    small enough grid that the full gram is cheaper than 4 layout copies
    (default <= 256 tokens: Swin stages 2-3 = 20/24 Base blocks)."""
    import os
    from .pallas_attn import fused_attention_enabled
    if os.environ.get("STGCMA_SWIN_WHOLE_BLOCK", "1") != "1":
        return False
    if not fused_attention_enabled():
        return False
    maxgrid = int(os.environ.get("STGCMA_SWIN_WB_MAXGRID", "256"))
    return (st.H * st.W <= maxgrid and st.use_s_adapter and st.use_g_adapter
            and st.dim % st.num_heads == 0)


def swin_fusion_whole_block(p, v, a, st):
    """Post-temporal fusion block body as one Pallas kernel.

    p: block params (block_init); v/a: (BT, H*W, C) token streams.
    Drop-in replacement for the windowed _dual_fusion body (nn/swin.py)."""
    geo_key = (st.H, st.W, st.window_size, st.shift_size, st.num_heads)
    if jax.default_backend() == "cpu":
        geo = _geo(st.H, st.W, st.window_size, st.shift_size)
        return _fullgrid_naive(p, v, a, st.num_heads, geo)
    return _swin_block_op(p, v, a, geo_key)
