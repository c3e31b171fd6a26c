"""int8 W8A8 Pallas kernel variants + the transpose-free temporal v2 kernel
(interpret mode on CPU). The serving-mode int8 kernels fuse per-row activation
quant around int8 MXU dots (ops/pallas_attn.py) and route from the same
megakernel entry points on 'kernel_q' presence."""
import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest

os.environ.setdefault("STGCMA_FUSED_ATTN", "1")

from stgcma_tpu.ops import pallas_attn as PA
from stgcma_tpu.ops import pallas_swin_block as SB
from stgcma_tpu.ops.attention import mha
from stgcma_tpu.ops.common import layernorm
from stgcma_tpu.ops.quant import quantize_linear_params, quantize_weight


def _lin(rng, i, o, s=0.05):
    return {"kernel": jnp.asarray(rng.randn(i, o) * s, jnp.float32),
            "bias": jnp.asarray(rng.randn(o) * 0.01, jnp.float32)}


def test_win_block_q_matches_float():
    rng = np.random.RandomState(0)
    C, heads, N, B_ = 128, 4, 16, 8
    x = jnp.asarray(rng.randn(B_, N, C), jnp.float32)
    lns = jnp.ones((C,), jnp.float32)
    lnb = jnp.zeros((C,), jnp.float32)
    qkv = _lin(rng, C, 3 * C)
    proj = _lin(rng, C, C)
    bm = jnp.zeros((1, heads, N, N), jnp.float32)
    qq, qs = quantize_weight(qkv["kernel"])
    pq, ps = quantize_weight(proj["kernel"])
    qp = {"wqkv_q": qq, "wqkv_s": qs, "bqkv": qkv["bias"],
          "wproj_q": pq, "wproj_s": ps, "bproj": proj["bias"]}
    out_q = PA._win_block_q_pallas(x, lns, lnb, qp, bm, heads)
    out_f = PA._win_block_pallas(x, lns, lnb, qkv["kernel"], qkv["bias"],
                                 proj["kernel"], proj["bias"], bm, heads)
    rel = float(jnp.max(jnp.abs(out_q - out_f))) / float(jnp.max(jnp.abs(out_f)))
    assert rel < 0.05, rel


def test_ffn_q_matches_float():
    rng = np.random.RandomState(1)
    C, hid, M = 128, 512, 64
    x = jnp.asarray(rng.randn(M, C), jnp.float32)
    lns = jnp.ones((C,), jnp.float32)
    lnb = jnp.zeros((C,), jnp.float32)
    f1, f2 = _lin(rng, C, hid), _lin(rng, hid, C)
    w1q, s1 = quantize_weight(f1["kernel"])
    w2q, s2 = quantize_weight(f2["kernel"])
    oq = PA._ffn_q_pallas(x, lns, lnb, w1q, s1, f1["bias"], w2q, s2,
                          f2["bias"], "quick_gelu")
    of = PA._ffn_pallas(x, lns, lnb, f1["kernel"], f1["bias"], f2["kernel"],
                        f2["bias"], "quick_gelu")
    rel = float(jnp.max(jnp.abs(oq - of))) / float(jnp.max(jnp.abs(of)))
    assert rel < 0.05, rel


@pytest.fixture
def tv2_setup():
    rng = np.random.RandomState(2)
    C, heads, T, B, N = 128, 4, 10, 3, 21   # odd N: exercises NP padding
    x = jnp.asarray(rng.randn(B * T, N, C) * 0.5, jnp.float32)
    ln = {"scale": jnp.asarray(rng.rand(C) + 0.5, jnp.float32),
          "bias": jnp.asarray(rng.randn(C) * 0.1, jnp.float32)}
    attn_p = {"in_proj": _lin(rng, C, 3 * C), "out_proj": _lin(rng, C, C)}
    ad = {"D_fc1": _lin(rng, C, 32, 0.1), "D_fc2": _lin(rng, 32, C, 0.1)}
    return rng, C, heads, T, B, N, x, ln, attn_p, ad


def test_temporal_v2_matches_naive(tv2_setup):
    rng, C, heads, T, B, N, x, ln, attn_p, ad = tv2_setup
    cp = {"qkv": attn_p["in_proj"], "proj": attn_p["out_proj"]}
    out_k = PA.temporal_adapt_v2(attn_p, ln, ad, x, heads, T)
    out_n = PA._tv2_naive(cp, ln, ad, x, None, heads, T)
    assert float(jnp.max(jnp.abs(out_k - out_n))) < 2e-4


def test_temporal_v2_swin_bias_no_adapter(tv2_setup):
    rng, C, heads, T, B, N, x, ln, attn_p, ad = tv2_setup
    bias = jnp.asarray(rng.randn(heads, T, T) * 0.1, jnp.float32)
    cp = {"qkv": attn_p["in_proj"], "proj": attn_p["out_proj"]}
    out_k = PA.temporal_adapt_v2(attn_p, ln, None, x, heads, T, bias=bias)
    out_n = PA._tv2_naive(cp, ln, None, x, bias, heads, T)
    assert float(jnp.max(jnp.abs(out_k - out_n))) < 2e-4


def test_temporal_v2_int8(tv2_setup):
    rng, C, heads, T, B, N, x, ln, attn_p, ad = tv2_setup
    pq = {"in_proj": quantize_linear_params(attn_p["in_proj"]),
          "out_proj": quantize_linear_params(attn_p["out_proj"])}
    cp = {"qkv": attn_p["in_proj"], "proj": attn_p["out_proj"]}
    out_n = PA._tv2_naive(cp, ln, ad, x, None, heads, T)
    out_q = PA.temporal_adapt_v2(pq, ln, ad, x, heads, T)
    rel = float(jnp.max(jnp.abs(out_q - out_n))) / float(jnp.max(jnp.abs(out_n)))
    assert rel < 0.05, rel


def test_temporal_v2_grad_matches_naive(tv2_setup):
    rng, C, heads, T, B, N, x, ln, attn_p, ad = tv2_setup
    cp = {"qkv": attn_p["in_proj"], "proj": attn_p["out_proj"]}

    def loss_k(cp_, x_):
        return (PA._tv2_op(cp_, ln, ad, x_, None, heads, T) ** 2).sum()

    def loss_n(cp_, x_):
        return (PA._tv2_naive(cp_, ln, ad, x_, None, heads, T) ** 2).sum()

    gk = jax.grad(loss_k, argnums=(0, 1))(cp, x)
    gn = jax.grad(loss_n, argnums=(0, 1))(cp, x)
    errs = jax.tree_util.tree_map(
        lambda a_, b_: float(jnp.max(jnp.abs(a_ - b_))), gk, gn)
    assert max(jax.tree_util.tree_leaves(errs)) < 5e-2


def test_swin_whole_block_int8():
    rng = np.random.RandomState(3)
    H = W_ = 8
    ws, ss, heads, C, BT = 4, 2, 4, 64, 4
    N = H * W_
    geo = SB._geo(H, W_, ws, ss)
    p = {"norm1": {"scale": jnp.ones((C,)), "bias": jnp.zeros((C,))},
         "norm2": {"scale": jnp.ones((C,)), "bias": jnp.zeros((C,))},
         "attn": {"qkv": _lin(rng, C, 3 * C), "proj": _lin(rng, C, C),
                  "relative_position_bias_table": jnp.asarray(
                      rng.randn((2 * ws - 1) ** 2, heads) * 0.02, jnp.float32)},
         "mlp": {"fc1": _lin(rng, C, 4 * C), "fc2": _lin(rng, 4 * C, C)},
         "S_Adapter2": {"D_fc1": _lin(rng, C, 16, .1), "D_fc2": _lin(rng, 16, C, .1)},
         "S_Adapter2_Audio": {"D_fc1": _lin(rng, C, 16, .1), "D_fc2": _lin(rng, 16, C, .1)},
         "S_Adapter": {"D_fc1": _lin(rng, C, 16, .1), "D_fc2": _lin(rng, 16, C, .1)},
         "S_Adapter_Audio": {"D_fc1": _lin(rng, C, 16, .1), "D_fc2": _lin(rng, 16, C, .1)},
         "gate_v": jnp.asarray([0.3], jnp.float32),
         "gate_a": jnp.asarray([0.2], jnp.float32)}
    v = jnp.asarray(rng.randn(BT, N, C) * 0.5, jnp.float32)
    a = jnp.asarray(rng.randn(BT, N, C) * 0.5, jnp.float32)
    geo_key = (H, W_, ws, ss, heads)
    out_n = SB._fullgrid_naive(p, v, a, heads, geo)
    pq = dict(p)
    pq["attn"] = {**p["attn"], "qkv": quantize_linear_params(p["attn"]["qkv"]),
                  "proj": quantize_linear_params(p["attn"]["proj"])}
    pq["mlp"] = {"fc1": quantize_linear_params(p["mlp"]["fc1"]),
                 "fc2": quantize_linear_params(p["mlp"]["fc2"])}
    out_q = SB._fullgrid_pallas(pq, v, a, geo_key, winmajor=False)
    rel = max(
        float(jnp.max(jnp.abs(out_q[0] - out_n[0]))) / float(jnp.max(jnp.abs(out_n[0]))),
        float(jnp.max(jnp.abs(out_q[1] - out_n[1]))) / float(jnp.max(jnp.abs(out_n[1]))))
    assert rel < 0.05, rel


def test_bf16_dequant_probe_close_to_fp32_dequant(monkeypatch):
    """STGCMA_Q_BF16_DEQUANT=1 (VERDICT r3 #1c probe) reruns the int8 dequant
    chain in bf16; outputs must stay within bf16-rounding distance of the
    fp32-dequant int8 path (the ~1% int8 quant error itself is shared)."""
    rng = np.random.RandomState(4)
    C, heads, N, B_ = 128, 4, 16, 8
    x = jnp.asarray(rng.randn(B_, N, C), jnp.float32)
    lns = jnp.ones((C,), jnp.float32)
    lnb = jnp.zeros((C,), jnp.float32)
    qkv = _lin(rng, C, 3 * C)
    proj = _lin(rng, C, C)
    bm = jnp.zeros((1, heads, N, N), jnp.float32)
    qq, qs = quantize_weight(qkv["kernel"])
    pq, ps = quantize_weight(proj["kernel"])
    qp = {"wqkv_q": qq, "wqkv_s": qs, "bqkv": qkv["bias"],
          "wproj_q": pq, "wproj_s": ps, "bproj": proj["bias"]}
    monkeypatch.setenv("STGCMA_Q_BF16_DEQUANT", "0")
    ref = PA._win_block_q_pallas(x, lns, lnb, qp, bm, heads)
    monkeypatch.setenv("STGCMA_Q_BF16_DEQUANT", "1")
    out = PA._win_block_q_pallas(x, lns, lnb, qp, bm, heads)
    scale = float(jnp.max(jnp.abs(ref))) + 1e-6
    rel = float(jnp.max(jnp.abs(out.astype(jnp.float32)
                                - ref.astype(jnp.float32)))) / scale
    assert rel < 3e-2, rel


@pytest.mark.parametrize("mode", ["qk", "all"])
def test_int8_grams_close_to_bf16_grams(monkeypatch, mode):
    """STGCMA_Q_INT8_GRAMS quantizes the attention grams inside the W8A8
    kernels (VERDICT r4 #3 probe — measured NEGATIVE on v5e, kept as a
    documented opt-in; BENCH_NOTES round 5). Pin the opt-in path's numerics
    vs the default bf16-gram int8 kernel."""
    monkeypatch.setenv("STGCMA_Q_INT8_GRAMS", mode)
    rng = np.random.RandomState(1)
    C, heads, N, B_ = 128, 4, 16, 8
    x = jnp.asarray(rng.randn(B_, N, C), jnp.float32)
    lns = jnp.ones((C,), jnp.float32)
    lnb = jnp.zeros((C,), jnp.float32)
    qkv = _lin(rng, C, 3 * C)
    proj = _lin(rng, C, C)
    bm = jnp.zeros((1, heads, N, N), jnp.float32)
    qq, qs = quantize_weight(qkv["kernel"])
    pq, ps = quantize_weight(proj["kernel"])
    qp = {"wqkv_q": qq, "wqkv_s": qs, "bqkv": qkv["bias"],
          "wproj_q": pq, "wproj_s": ps, "bproj": proj["bias"]}
    out_g = PA._win_block_q_pallas(x, lns, lnb, qp, bm, heads)
    monkeypatch.setenv("STGCMA_Q_INT8_GRAMS", "")
    jax.clear_caches()
    out_q = PA._win_block_q_pallas(x, lns, lnb, qp, bm, heads)
    rel = float(jnp.max(jnp.abs(out_g - out_q))) / float(jnp.max(jnp.abs(out_q)))
    assert rel < 0.05, rel
