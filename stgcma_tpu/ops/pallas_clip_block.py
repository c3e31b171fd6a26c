"""Whole-block Pallas megakernel for the CLIP fusion transformer block.

Reference semantics: AVE/model/CLIP_AVE.py:359-430 (the active fusion_adapt
branch of ResidualAttentionBlock) — everything AFTER the temporal adaptation:

    vs   = attention(ln_1(v));            a_s  = attention(ln_1(a))
    vs_h = act(S_Adapter.fc1(vs));        as_h = act(S_Adapter_A.fc1(a_s))
    vs_h += gate_v * softmax(vs_h as_h^T) as_h   (and symmetrically for a)
    v    = v + vs + S_Adapter.fc2(vs_h);  a    = a + a_s + S_A_A.fc2(as_h)
    vn   = mlp(ln_2(v));                  an   = mlp(ln_2(a))
    vn_h = act(MLP_Adapter.fc1(vn));      an_h = act(MLP_A_A.fc1(an))
    vn_h += gate_v * softmax(vn_h an_h^T) an_h   (and symmetrically)
    v    = v + vn + MLP_Adapter.fc2(vn_h); a   = a + an + MLP_A_A.fc2(an_h)

The naive lowering round-trips v/a through HBM ~10x per block (attention out,
adapter hiddens, fusion products, MLP hidden, residual adds). This kernel keeps
one (TB, Nv+Na, C) tile resident in VMEM and performs the whole block in a
single pass: v/a are read once and written once per block. Tower weights
(~8M params for CLIP-B) stay VMEM-resident across grid steps.

Gradients: custom_vjp with a recomputing XLA backward built from the naive
mirror (`_fusion_spatial_naive`) — training numerics match the unfused path.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


def _ln(x, scale, bias, eps=1e-5):
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(xf - mean), axis=-1, keepdims=True)
    xn = (xf - mean) * jax.lax.rsqrt(var + eps)
    return (xn * scale.astype(jnp.float32) + bias.astype(jnp.float32)
            ).astype(x.dtype)


def _linq(flat, w, s, b):
    """Tower matmul: bf16 dot, or fused-dynamic-quant int8 dot when a scale
    row `s` is provided (serving mode — see ops/pallas_attn._dotq)."""
    if s is not None:
        from .pallas_attn import _dotq
        out = _dotq(flat.astype(jnp.float32), w, s)
    else:
        out = jnp.dot(flat, w.astype(flat.dtype),
                      preferred_element_type=jnp.float32)
    return out + b.astype(jnp.float32)


def _self_attn(x, wqkv, bqkv, wproj, bproj, heads: int, n_real: int,
               sqkv=None, sproj=None):
    """Per-tile multi-head self-attention. x: (TB, N, C) (already LN'ed).
    Padded key columns (>= n_real) are masked; padded query rows produce
    garbage that callers slice away."""
    TB, N, C = x.shape
    dh = C // heads
    scale = dh ** -0.5
    flat = x.reshape(TB * N, C)
    qkv = _linq(flat, wqkv, sqkv, bqkv).astype(x.dtype)
    # int8-gram policy applies only in serving/int8 mode (sqkv set) so the
    # faithful-numerics bf16 class is never affected by the env toggle
    from .pallas_attn import _gram_pv, _gram_qk
    gram_qk = _gram_qk if sqkv is not None else (
        lambda q, k: jax.lax.dot_general(
            q, k, (((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32))
    gram_pv = _gram_pv if sqkv is not None else (
        lambda p, v: jax.lax.dot_general(
            p.astype(v.dtype), v, (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32))
    outs = []
    for h in range(heads):
        q = qkv[:, h * dh:(h + 1) * dh].reshape(TB, N, dh) * scale
        k = qkv[:, C + h * dh:C + (h + 1) * dh].reshape(TB, N, dh)
        v = qkv[:, 2 * C + h * dh:2 * C + (h + 1) * dh].reshape(TB, N, dh)
        logits = gram_qk(q, k)
        if n_real != N:
            col = jax.lax.broadcasted_iota(jnp.int32, logits.shape, 2)
            logits = jnp.where(col < n_real, logits, -1e30)
        m = jnp.max(logits, axis=-1, keepdims=True)
        e = jnp.exp(logits - m)
        p = _pnorm(e)
        oh = gram_pv(p, v)
        outs.append(oh.astype(x.dtype).reshape(TB * N, dh))
    o = jnp.concatenate(outs, axis=-1)
    o = _linq(o, wproj, sproj, bproj)
    return o.astype(x.dtype).reshape(TB, N, C)


# exp-numerator -> probabilities: single shared numerics policy (approx-
# reciprocal by default, STGCMA_EXACT_SOFTMAX=1 for the exact divide) — one
# definition so a tuning change cannot silently miss a kernel family
from .pallas_attn import _gsem, _pnorm  # noqa: E402


def _erf(x):
    """Abramowitz & Stegun 7.1.26 rational erf (|err| <= 1.5e-7 with the exact
    divide) — Mosaic has no erf/erfc lowering, so the exact-GELU kernels use
    this polynomial. Under the default fast-numerics policy (same gate as the
    softmax: STGCMA_EXACT_SOFTMAX unset) the 1/(1+p|x|) divide runs as the
    VPU reciprocal estimate (~2e-4 rel in t -> ~1e-3 abs worst-case in erf,
    i.e. <=5e-4 abs on the GELU output, bounded end-to-end by the bench
    fidelity extra and tests/test_softmax_approx.py)."""
    from .pallas_attn import _exact_softmax
    a1, a2, a3 = 0.254829592, -0.284496736, 1.421413741
    a4, a5, p = -1.453152027, 1.061405429, 0.3275911
    s = jnp.sign(x)
    ax = jnp.abs(x)
    d = 1.0 + p * ax
    t = (1.0 / d) if _exact_softmax() else pl.reciprocal(d, approx=True)
    poly = ((((a5 * t + a4) * t + a3) * t + a2) * t + a1) * t
    return s * (1.0 - poly * jnp.exp(-ax * ax))


def _gelu(x):
    # exact (erf) GELU — matches torch nn.GELU to ~2e-7 absolute.
    xf = x.astype(jnp.float32)
    y = 0.5 * xf * (1.0 + _erf(xf * (2.0 ** -0.5)))
    return y.astype(x.dtype)


def _adapter_h(flat, w1, b1):
    h = jnp.dot(flat, w1.astype(flat.dtype), preferred_element_type=jnp.float32)
    return _gelu((h + b1.astype(jnp.float32)).astype(flat.dtype))


def _adapter_o(h, w2, b2):
    o = jnp.dot(h, w2.astype(h.dtype), preferred_element_type=jnp.float32)
    return (o + b2.astype(jnp.float32)).astype(h.dtype)


def _xfuse(vh, ah, gate_v, gate_a, nv_real: int, na_real: int):
    """Bidirectional unscaled cross attention over adapter hiddens
    (CLIP_AVE.py:386-399). vh: (TB, Nv, d); ah: (TB, Na, d); gates are fp32
    SCALARS (Mosaic supports 32-bit scalar splats, not (1,)-vector broadcasts
    over sublanes+lanes)."""
    logits = jax.lax.dot_general(vh, ah, (((2,), (2,)), ((0,), (0,))),
                                 preferred_element_type=jnp.float32)  # (TB,Nv,Na)
    ca = jax.lax.broadcasted_iota(jnp.int32, logits.shape, 2)
    cv = jax.lax.broadcasted_iota(jnp.int32, logits.shape, 1)
    la = jnp.where(ca < na_real, logits, -1e30)       # mask padded a keys
    ma = jnp.max(la, axis=-1, keepdims=True)
    ea = jnp.exp(la - ma)
    pa = _pnorm(ea).astype(vh.dtype)
    a2v = jax.lax.dot_general(pa, ah, (((2,), (1,)), ((0,), (0,))),
                              preferred_element_type=jnp.float32)     # fp32

    lv = jnp.where(cv < nv_real, logits, -1e30)       # mask padded v keys
    lv = lv.transpose(0, 2, 1)                        # (TB, Na, Nv)
    mv = jnp.max(lv, axis=-1, keepdims=True)
    ev = jnp.exp(lv - mv)
    pv = _pnorm(ev).astype(vh.dtype)
    v2a = jax.lax.dot_general(pv, vh, (((2,), (1,)), ((0,), (0,))),
                              preferred_element_type=jnp.float32)     # fp32
    return (vh + (gate_v * a2v).astype(vh.dtype),
            ah + (gate_a * v2a).astype(ah.dtype))


def _fusion_block_kernel(v_ref, a_ref,
                         ln1s, ln1b, wqkv, sqkv, bqkv, wproj, sproj, bproj,
                         ln2s, ln2b, wfc, sfc, bfc, wcp, scp, bcp,
                         sav1k, sav1b, sav2k, sav2b,
                         saa1k, saa1b, saa2k, saa2b,
                         mav1k, mav1b, mav2k, mav2b,
                         maa1k, maa1b, maa2k, maa2b,
                         gv_ref, ga_ref,
                         vo_ref, ao_ref, *,
                         heads: int, nv_real: int, na_real: int,
                         quantized: bool = False):
    v = v_ref[:]
    a = a_ref[:]
    TB, Nv, C = v.shape
    Na = a.shape[1]
    # fp32 scalar extracts (gates are cast to fp32 in _flat_args — Mosaic
    # supports only 32-bit scalar vector.extracts)
    gv = gv_ref[0]
    ga = ga_ref[0]
    q_qkv = sqkv[:] if quantized else None
    q_proj = sproj[:] if quantized else None

    # ---- spatial attention + S-adapter fusion --------------------------
    vs = _self_attn(_ln(v, ln1s[:], ln1b[:]), wqkv[:], bqkv[:], wproj[:],
                    bproj[:], heads, nv_real, q_qkv, q_proj)
    a_s = _self_attn(_ln(a, ln1s[:], ln1b[:]), wqkv[:], bqkv[:], wproj[:],
                     bproj[:], heads, na_real, q_qkv, q_proj)
    vs_h = _adapter_h(vs.reshape(TB * Nv, C), sav1k[:], sav1b[:]
                      ).reshape(TB, Nv, -1)
    as_h = _adapter_h(a_s.reshape(TB * Na, C), saa1k[:], saa1b[:]
                      ).reshape(TB, Na, -1)
    vs_h, as_h = _xfuse(vs_h, as_h, gv, ga, nv_real, na_real)
    v = v + vs + _adapter_o(vs_h.reshape(TB * Nv, -1), sav2k[:], sav2b[:]
                            ).reshape(TB, Nv, C)
    a = a + a_s + _adapter_o(as_h.reshape(TB * Na, -1), saa2k[:], saa2b[:]
                             ).reshape(TB, Na, C)

    # ---- FFN + MLP-adapter fusion (token-wise: process v|a concatenated)
    x = jnp.concatenate([v.reshape(TB * Nv, C), a.reshape(TB * Na, C)], axis=0)
    xn = _ln(x, ln2s[:], ln2b[:])
    h = _linq(xn, wfc[:], sfc[:] if quantized else None, bfc[:])
    h = h * jax.nn.sigmoid(1.702 * h)                       # QuickGELU (fp32)
    if not quantized:
        h = h.astype(x.dtype)
    n = _linq(h, wcp[:], scp[:] if quantized else None, bcp[:])
    n = n.astype(x.dtype)
    vn = n[:TB * Nv]
    an = n[TB * Nv:]
    vn_h = _adapter_h(vn, mav1k[:], mav1b[:]).reshape(TB, Nv, -1)
    an_h = _adapter_h(an, maa1k[:], maa1b[:]).reshape(TB, Na, -1)
    vn_h, an_h = _xfuse(vn_h, an_h, gv, ga, nv_real, na_real)
    vo_ref[:] = v + vn.reshape(TB, Nv, C) + _adapter_o(
        vn_h.reshape(TB * Nv, -1), mav2k[:], mav2b[:]).reshape(TB, Nv, C)
    ao_ref[:] = a + an.reshape(TB, Na, C) + _adapter_o(
        an_h.reshape(TB * Na, -1), maa2k[:], maa2b[:]).reshape(TB, Na, C)


def _flat_args(p):
    """Flatten the block param dict into the kernel operand list. Tower
    linears carry (kernel, scale) pairs: float towers get a dummy (1, 1)
    scale the kernel never reads; int8 towers (ops/quant.py) pass
    (kernel_q, kernel_s)."""
    att, mlp = p["attn"], p["mlp"]
    sv, sa = p["S_Adapter"], p["S_Adapter_Audio"]
    mv, ma = p["MLP_Adapter"], p["MLP_Adapter_Audio"]
    dummy = jnp.zeros((1, 1), jnp.float32)

    def wk(lp):
        if "kernel_q" in lp:
            return [lp["kernel_q"], lp["kernel_s"], lp["bias"]]
        return [lp["kernel"], dummy, lp["bias"]]

    return [
        p["ln_1"]["scale"], p["ln_1"]["bias"],
        *wk(att["in_proj"]), *wk(att["out_proj"]),
        p["ln_2"]["scale"], p["ln_2"]["bias"],
        *wk(mlp["c_fc"]), *wk(mlp["c_proj"]),
        sv["D_fc1"]["kernel"], sv["D_fc1"]["bias"],
        sv["D_fc2"]["kernel"], sv["D_fc2"]["bias"],
        sa["D_fc1"]["kernel"], sa["D_fc1"]["bias"],
        sa["D_fc2"]["kernel"], sa["D_fc2"]["bias"],
        mv["D_fc1"]["kernel"], mv["D_fc1"]["bias"],
        mv["D_fc2"]["kernel"], mv["D_fc2"]["bias"],
        ma["D_fc1"]["kernel"], ma["D_fc1"]["bias"],
        ma["D_fc2"]["kernel"], ma["D_fc2"]["bias"],
        p["gate_v"].astype(jnp.float32), p["gate_a"].astype(jnp.float32),
    ]


def _fusion_spatial_naive(p, v, a):
    """XLA mirror of the kernel (backward recompute + CPU path).
    Matches nn.clip_vit._fusion minus the temporal stage."""
    from ..nn.adapters import adapter_hidden, adapter_out
    from .attention import cross_modal_fuse, mha
    from .common import layernorm, linear, quick_gelu
    heads = p["__heads__"]
    pp = {k: val for k, val in p.items() if k != "__heads__"}

    def attn_ln(x):
        xn = layernorm(pp["ln_1"], x)
        return mha(pp["attn"], xn, xn, xn, heads)

    def ffn(x):
        xn = layernorm(pp["ln_2"], x)
        return linear(pp["mlp"]["c_proj"], quick_gelu(linear(pp["mlp"]["c_fc"], xn)))

    vs = attn_ln(v)
    a_s = attn_ln(a)
    vs_h = adapter_hidden(pp["S_Adapter"], vs)
    as_h = adapter_hidden(pp["S_Adapter_Audio"], a_s)
    vs_h, as_h = cross_modal_fuse(vs_h, as_h, pp["gate_v"], pp["gate_a"])
    v = v + vs + adapter_out(pp["S_Adapter"], vs_h)
    a = a + a_s + adapter_out(pp["S_Adapter_Audio"], as_h)
    vn = ffn(v)
    an = ffn(a)
    vn_h = adapter_hidden(pp["MLP_Adapter"], vn)
    an_h = adapter_hidden(pp["MLP_Adapter_Audio"], an)
    vn_h, an_h = cross_modal_fuse(vn_h, an_h, pp["gate_v"], pp["gate_a"])
    v = v + vn + adapter_out(pp["MLP_Adapter"], vn_h)
    a = a + an + adapter_out(pp["MLP_Adapter_Audio"], an_h)
    return v, a


def _fusion_pallas(p, v, a, heads: int, tile_bt: int = 4):
    BT, Nv, C = v.shape
    Na = a.shape[1]
    NvP = _round_up(Nv, 16)
    NaP = _round_up(Na, 16)
    TB = min(tile_bt, BT)
    BTP = _round_up(BT, TB)
    vp = jnp.pad(v, ((0, BTP - BT), (0, NvP - Nv), (0, 0)))
    ap = jnp.pad(a, ((0, BTP - BT), (0, NaP - Na), (0, 0)))
    args = _flat_args(p)
    vspec = pl.BlockSpec((TB, NvP, C), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM)
    aspec = pl.BlockSpec((TB, NaP, C), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM)
    wspecs = [pl.BlockSpec(memory_space=pltpu.VMEM) for _ in args]
    vo, ao = pl.pallas_call(
        functools.partial(_fusion_block_kernel, heads=heads,
                          nv_real=Nv, na_real=Na,
                          quantized="kernel_q" in p["attn"]["in_proj"]),
        out_shape=(jax.ShapeDtypeStruct((BTP, NvP, C), v.dtype),
                   jax.ShapeDtypeStruct((BTP, NaP, C), a.dtype)),
        grid=(BTP // TB,),
        in_specs=[vspec, aspec] + wspecs,
        out_specs=(vspec, aspec),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=_gsem(1),
            vmem_limit_bytes=110 * 1024 * 1024),
        interpret=(jax.default_backend() == "cpu"),
    )(vp, ap, *args)
    return vo[:BT, :Nv], ao[:BT, :Na]


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def _fusion_block_op(p, v, a, heads):
    return _fusion_pallas(p, v, a, heads)


def _fb_fwd(p, v, a, heads):
    return _fusion_pallas(p, v, a, heads), (p, v, a)


def _fb_bwd(heads, res, g):
    p, v, a = res

    def naive(p, v, a):
        return _fusion_spatial_naive({**p, "__heads__": heads}, v, a)

    _, vjp = jax.vjp(naive, p, v, a)
    return vjp(g)


_fusion_block_op.defvjp(_fb_fwd, _fb_bwd)


# ---------------------------------------------------------------------------
# temporal stage: LN + qkv + attention + proj + T_Adapter + residual, fused
# (CLIP_AVE.py:369-377: v = v + T_Adapter(attention(ln_1(vt))))
# ---------------------------------------------------------------------------

def _tadapt_kernel(x_ref, ln1s, ln1b, wqkv, sqkv, bqkv, wproj, sproj, bproj,
                   a1k, a1b, a2k, a2b, bm_ref, o_ref, *, heads: int,
                   quantized: bool = False):
    """x: (TR, N, C) packed temporal rows; bm: (1, heads, N, N) additive mask
    (block-diagonal for packed rows + pad masking).
    o = x + T_Adapter(attn(ln(x))) with T_Adapter = fc2(gelu(fc1(.)))."""
    x = x_ref[:]
    TR, N, C = x.shape
    dh = C // heads
    scale = dh ** -0.5
    flat = _ln(x, ln1s[:], ln1b[:]).reshape(TR * N, C)
    qkv = _linq(flat, wqkv[:], sqkv[:] if quantized else None, bqkv[:]
                ).astype(x.dtype)
    from .pallas_attn import _gram_pv, _gram_qk
    gram_qk = _gram_qk if quantized else (
        lambda q, k: jax.lax.dot_general(
            q, k, (((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32))
    gram_pv = _gram_pv if quantized else (
        lambda p, v: jax.lax.dot_general(
            p.astype(v.dtype), v, (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32))
    outs = []
    for h in range(heads):
        q = qkv[:, h * dh:(h + 1) * dh].reshape(TR, N, dh) * scale
        k = qkv[:, C + h * dh:C + (h + 1) * dh].reshape(TR, N, dh)
        v = qkv[:, 2 * C + h * dh:2 * C + (h + 1) * dh].reshape(TR, N, dh)
        logits = gram_qk(q, k)
        logits = logits + bm_ref[0, h][None]
        m = jnp.max(logits, axis=-1, keepdims=True)
        e = jnp.exp(logits - m)
        p = _pnorm(e)
        oh = gram_pv(p, v)
        outs.append(oh.astype(x.dtype).reshape(TR * N, dh))
    o = jnp.concatenate(outs, axis=-1)
    o = _linq(o, wproj[:], sproj[:] if quantized else None, bproj[:]
              ).astype(x.dtype)
    h1 = _adapter_h(o, a1k[:], a1b[:])
    res = _adapter_o(h1, a2k[:], a2b[:])
    o_ref[:] = x + res.reshape(TR, N, C)


def _tadapt_naive(attn_p, ln, ad_p, x, heads):
    from ..nn.adapters import adapter_apply
    from .attention import mha
    from .common import layernorm
    xn = layernorm(ln, x)
    out = mha(attn_p, xn, xn, xn, heads)
    return x + adapter_apply(ad_p, out, skip=False)


def _tadapt_pallas(attn_p, ln, ad_p, x, heads: int, pack: int = 8):
    """x: (R, T, C) temporal rows. Packs `pack` rows into one block-diagonal
    gram (amortizes MXU pass latency over tiny T); skips the T->16 pad when
    pack*T is already sublane-aligned (T=10 -> 80 tokens)."""
    import numpy as np
    R, T, C = x.shape
    TP = T if (pack * T) % 16 == 0 else _round_up(T, 16)
    xp = jnp.pad(x, ((0, 0), (0, TP - T), (0, 0))) if TP != T else x
    RP = _round_up(R, pack)
    xp = jnp.pad(xp, ((0, RP - R), (0, 0), (0, 0)))
    xp = xp.reshape(RP // pack, pack * TP, C)
    blk = np.full((TP, TP), -1e30, np.float32)
    blk[:, :T] = 0.0
    bm_np = np.full((pack * TP, pack * TP), -1e30, np.float32)
    for j in range(pack):
        bm_np[j * TP:(j + 1) * TP, j * TP:(j + 1) * TP] = blk
    bm = jnp.asarray(np.broadcast_to(bm_np, (1, heads) + bm_np.shape).copy())

    G = xp.shape[0]
    # tile: ~1 MB of x per program
    TG = max(1, (1 << 20) // (pack * TP * C * 2))
    GP = _round_up(G, TG)
    if GP != G:
        xp = jnp.pad(xp, ((0, GP - G), (0, 0), (0, 0)))
    dummy = jnp.zeros((1, 1), jnp.float32)
    quantized = "kernel_q" in attn_p["in_proj"]

    def wk(lp):
        if "kernel_q" in lp:
            return [lp["kernel_q"], lp["kernel_s"], lp["bias"]]
        return [lp["kernel"], dummy, lp["bias"]]

    args = [ln["scale"], ln["bias"],
            *wk(attn_p["in_proj"]), *wk(attn_p["out_proj"]),
            ad_p["D_fc1"]["kernel"], ad_p["D_fc1"]["bias"],
            ad_p["D_fc2"]["kernel"], ad_p["D_fc2"]["bias"]]
    out = pl.pallas_call(
        functools.partial(_tadapt_kernel, heads=heads, quantized=quantized),
        out_shape=jax.ShapeDtypeStruct((GP, pack * TP, C), x.dtype),
        grid=(GP // TG,),
        in_specs=[pl.BlockSpec((TG, pack * TP, C), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM)]
        + [pl.BlockSpec(memory_space=pltpu.VMEM) for _ in args]
        + [pl.BlockSpec((1, heads, pack * TP, pack * TP),
                        lambda i: (0, 0, 0, 0), memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((TG, pack * TP, C), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=_gsem(1),
            vmem_limit_bytes=110 * 1024 * 1024),
        interpret=(jax.default_backend() == "cpu"),
    )(xp, *args, bm)
    return out.reshape(GP * pack, TP, C)[:R, :T]


@functools.partial(jax.custom_vjp, nondiff_argnums=(4,))
def _tadapt_op(attn_p, ln, ad_p, x, heads):
    return _tadapt_pallas(attn_p, ln, ad_p, x, heads)


def _ta_fwd(attn_p, ln, ad_p, x, heads):
    return _tadapt_pallas(attn_p, ln, ad_p, x, heads), (attn_p, ln, ad_p, x)


def _ta_bwd(heads, res, g):
    attn_p, ln, ad_p, x = res
    _, vjp = jax.vjp(lambda a, l, d, xx: _tadapt_naive(a, l, d, xx, heads),
                     attn_p, ln, ad_p, x)
    return vjp(g)


_tadapt_op.defvjp(_ta_fwd, _ta_bwd)


def clip_temporal_adapt_block(attn_p, ln, ad_p, x, heads: int):
    """Temporal stage of the CLIP block as one kernel: x + T_Adapter(MHA(LN(x)))
    over the frame axis. x: (B*N, T, C) with T <= 16."""
    from .pallas_attn import fused_attention_enabled
    if not fused_attention_enabled() or jax.default_backend() == "cpu":
        return _tadapt_naive(attn_p, ln, ad_p, x, heads)
    return _tadapt_op(attn_p, ln, ad_p, x, heads)


def clip_fusion_spatial_block(p, v, a, heads: int):
    """Spatial-attention + dual-fusion + FFN stage of the CLIP fusion block as
    ONE Pallas kernel (everything in CLIP_AVE.py:379-430 after temporal).

    p: clip_block_init params. v: (BT, Nv, C); a: (BT, Na, C)."""
    from .pallas_attn import fused_attention_enabled
    if not fused_attention_enabled() or jax.default_backend() == "cpu":
        return _fusion_spatial_naive({**p, "__heads__": heads}, v, a)
    return _fusion_block_op(p, v, a, heads)
