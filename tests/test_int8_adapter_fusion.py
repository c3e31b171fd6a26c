"""int8 serving with the bottleneck-adapter down-projection fused into the
megakernels (VERDICT r3 #1a/#1b — interpret mode on CPU).

Three fused surfaces, each pinned against the separate-XLA-adapter int8 path
(which is itself parity-tested against float in test_int8_kernels.py):

  - clip_attn_megakernel_h(emit_o=False): temporal site — only the dA-wide
    adapter hidden leaves the kernel (attn_out feeds nothing else,
    CLIP_AVE.py:131-135),
  - clip_attn_megakernel_h(emit_o=True): spatial site — (attn_out, hidden),
  - ffn_qh_megakernel: FFN site — (ffn_out, MLP_Adapter hidden),

plus end-to-end CLIP fusion-block parity: STGCMA_QFUSE_ADAPTERS=1 vs =0 on a
quantized tiny tower must agree to bf16/fast-erf tolerance.
"""
import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest

os.environ.setdefault("STGCMA_FUSED_ATTN", "1")

from stgcma_tpu.ops import pallas_attn as PA
from stgcma_tpu.ops.common import gelu, linear
from stgcma_tpu.ops.quant import quantize_linear_params


def _lin(rng, i, o, s=0.05):
    return {"kernel": jnp.asarray(rng.randn(i, o) * s, jnp.float32),
            "bias": jnp.asarray(rng.randn(o) * 0.01, jnp.float32)}


@pytest.fixture
def setup():
    rng = np.random.RandomState(7)
    C, heads, dA = 128, 4, 16
    ln = {"scale": jnp.asarray(rng.rand(C) + 0.5, jnp.float32),
          "bias": jnp.asarray(rng.randn(C) * 0.1, jnp.float32)}
    attn_q = {"in_proj": quantize_linear_params(_lin(rng, C, 3 * C)),
              "out_proj": quantize_linear_params(_lin(rng, C, C))}
    ad = {"D_fc1": _lin(rng, C, dA, 0.1), "D_fc2": _lin(rng, dA, C, 0.1)}
    return rng, C, heads, dA, ln, attn_q, ad


def _unfused_hidden(attn_q, ln, ad, x, heads):
    """separate-kernel reference: int8 megakernel -> XLA adapter_hidden."""
    o = PA.clip_temporal_megakernel(attn_q, ln, x, heads)
    return o, gelu(linear(ad["D_fc1"], o))


def test_temporal_site_hidden_only(setup):
    rng, C, heads, dA, ln, attn_q, ad = setup
    x = jnp.asarray(rng.randn(24, 10, C) * 0.5, jnp.float32)  # T=10 pack path
    o_ref, h_ref = _unfused_hidden(attn_q, ln, ad, x, heads)
    h = PA.clip_attn_megakernel_h(attn_q, ln, ad, x, heads, emit_o=False)
    assert h.shape == (24, 10, dA)
    scale = float(jnp.max(jnp.abs(h_ref))) + 1e-6
    assert float(jnp.max(jnp.abs(h - h_ref))) / scale < 2e-2


def test_spatial_site_both_outputs(setup):
    rng, C, heads, dA, ln, attn_q, ad = setup
    x = jnp.asarray(rng.randn(6, 21, C) * 0.5, jnp.float32)   # N=21 pad path
    o_ref, h_ref = _unfused_hidden(attn_q, ln, ad, x, heads)
    o, h = PA.clip_attn_megakernel_h(attn_q, ln, ad, x, heads, emit_o=True)
    assert o.shape == x.shape and h.shape == (6, 21, dA)
    np.testing.assert_allclose(np.asarray(o), np.asarray(o_ref),
                               atol=2e-2, rtol=0)
    scale = float(jnp.max(jnp.abs(h_ref))) + 1e-6
    assert float(jnp.max(jnp.abs(h - h_ref))) / scale < 2e-2


def test_ffn_site_both_outputs(setup):
    rng, C, heads, dA, ln, attn_q, ad = setup
    mlp_q = {"c_fc": quantize_linear_params(_lin(rng, C, 4 * C)),
             "c_proj": quantize_linear_params(_lin(rng, 4 * C, C))}
    x = jnp.asarray(rng.randn(6, 21, C) * 0.5, jnp.float32)
    o_ref = PA.ffn_q_megakernel(mlp_q, ln, x, act="quick_gelu",
                                keys=("c_fc", "c_proj"))
    h_ref = gelu(linear(ad["D_fc1"], o_ref))
    o, h = PA.ffn_qh_megakernel(mlp_q, ln, ad, x, act="quick_gelu",
                                keys=("c_fc", "c_proj"))
    assert o.shape == x.shape and h.shape == (6, 21, dA)
    np.testing.assert_allclose(np.asarray(o), np.asarray(o_ref),
                               atol=2e-2, rtol=0)
    scale = float(jnp.max(jnp.abs(h_ref))) + 1e-6
    assert float(jnp.max(jnp.abs(h - h_ref))) / scale < 2e-2


def test_clip_fusion_block_end_to_end(monkeypatch):
    """Whole quantized fusion block: fused-adapter path vs separate-adapter
    path through the public clip_block_apply."""
    from stgcma_tpu.configs import ClipConfig
    from stgcma_tpu.nn import clip_vit

    rng = np.random.RandomState(11)
    cfg = ClipConfig(ftmode="fusion", embed_dim=64, heads=4, layers=1,
                     input_resolution=32, patch_size=16, num_frames=2,
                     audio_tdim=32, adapter_ratio=0.25)
    key = jax.random.PRNGKey(0)
    p = clip_vit.clip_block_init(key, cfg, "fusion_adapt")
    # non-trivial gates + adapters (zero-init would make the fusion a no-op)
    p["gate_v"] = jnp.asarray([0.4], jnp.float32)
    p["gate_a"] = jnp.asarray([0.3], jnp.float32)
    for k in list(p):
        if "Adapter" in k:
            p[k] = {"D_fc1": _lin(rng, 64, 16, 0.1),
                    "D_fc2": _lin(rng, 16, 64, 0.1)}
    pq = dict(p)
    pq["attn"] = {"in_proj": quantize_linear_params(p["attn"]["in_proj"]),
                  "out_proj": quantize_linear_params(p["attn"]["out_proj"])}
    pq["mlp"] = {"c_fc": quantize_linear_params(p["mlp"]["c_fc"]),
                 "c_proj": quantize_linear_params(p["mlp"]["c_proj"])}
    v = jnp.asarray(rng.randn(4, 5, 64) * 0.5, jnp.float32)  # (B*T, N, C)
    a = jnp.asarray(rng.randn(4, 3, 64) * 0.5, jnp.float32)

    monkeypatch.setenv("STGCMA_QFUSE_ADAPTERS", "0")
    v0, a0 = clip_vit.clip_block_apply(pq, (v, a), cfg, "fusion_adapt")
    monkeypatch.setenv("STGCMA_QFUSE_ADAPTERS", "1")
    v1, a1 = clip_vit.clip_block_apply(pq, (v, a), cfg, "fusion_adapt")
    for x0, x1 in ((v0, v1), (a0, a1)):
        scale = float(jnp.max(jnp.abs(x0))) + 1e-6
        assert float(jnp.max(jnp.abs(x1 - x0))) / scale < 2e-2
