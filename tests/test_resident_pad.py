"""Resident-pad token layout (STGCMA_RESIDENT_PAD=1).

The CLIP video stream's token count (grid^2 + class = 197 at 224^2/16) is
prime, so every spatial-kernel call re-pads 197->208 and every FFN/temporal
row view hits the explicit-pad fallback (~2 ms/iter of the round-4 int8
trace, BENCH_NOTES). The resident layout pads ONCE after embed and threads
the real token count into the kernels' softmax key masks; since the kernels
already compute over the same padded grid with the same -1e30 masks, real
outputs must match the unpadded path to float-reassociation tolerance.

Pinned here (interpret mode on CPU, STGCMA_FUSED_ATTN=1):
  - cross_modal_fuse key masking: padded streams == sliced streams exactly
  - clip_temporal_megakernel with pre-padded x + n_real == per-call pad path
  - end-to-end apply_clip_ave: resident vs normal, float AND int8 towers
"""
import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest

os.environ.setdefault("STGCMA_FUSED_ATTN", "1")

from stgcma_tpu.configs import ClipConfig
from stgcma_tpu.models import ave
from stgcma_tpu.ops import pallas_attn as PA
from stgcma_tpu.ops.attention import cross_modal_fuse
from stgcma_tpu.ops.quant import quantize_clip_tower, quantize_linear_params


def _rel(x, ref):
    scale = float(jnp.max(jnp.abs(ref))) + 1e-6
    return float(jnp.max(jnp.abs(x - ref))) / scale


def test_cross_modal_fuse_masks_padded_keys():
    rng = np.random.RandomState(3)
    B, Nv, Na, d = 2, 13, 5, 8
    vh = jnp.asarray(rng.randn(B, Nv, d), jnp.float32)
    ah = jnp.asarray(rng.randn(B, Na, d), jnp.float32)
    gv = jnp.asarray([0.7], jnp.float32)
    ga = jnp.asarray([0.4], jnp.float32)
    v_ref, a_ref = cross_modal_fuse(vh, ah, gv, ga)
    vp = jnp.pad(vh, ((0, 0), (0, 3), (0, 0)))          # resident-pad video
    v_out, a_out = cross_modal_fuse(vp, ah, gv, ga, nv_real=Nv)
    np.testing.assert_allclose(np.asarray(v_out[:, :Nv]), np.asarray(v_ref),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(a_out), np.asarray(a_ref),
                               rtol=1e-5, atol=1e-6)


def test_spatial_kernel_prepadded_n_real_matches_per_call_pad():
    rng = np.random.RandomState(5)
    C, heads, N = 128, 4, 26                             # N % 16 != 0
    ln = {"scale": jnp.asarray(rng.rand(C) + 0.5, jnp.float32),
          "bias": jnp.asarray(rng.randn(C) * 0.1, jnp.float32)}
    attn = {"in_proj": {"kernel": jnp.asarray(rng.randn(C, 3 * C) * 0.05,
                                              jnp.float32),
                        "bias": jnp.asarray(rng.randn(3 * C) * 0.01,
                                            jnp.float32)},
            "out_proj": {"kernel": jnp.asarray(rng.randn(C, C) * 0.05,
                                               jnp.float32),
                         "bias": jnp.asarray(rng.randn(C) * 0.01,
                                             jnp.float32)}}
    x = jnp.asarray(rng.randn(8, N, C) * 0.5, jnp.float32)
    ref = PA.clip_temporal_megakernel(attn, ln, x, heads)          # pads 26->32
    NP = -(-N // 16) * 16
    xp = jnp.pad(x, ((0, 0), (0, NP - N), (0, 0)))
    out = PA.clip_temporal_megakernel(attn, ln, xp, heads, n_real=N)
    assert out.shape == (8, NP, C)
    assert _rel(out[:, :N], ref) < 1e-5

    # int8 twin
    attn_q = {"in_proj": quantize_linear_params(attn["in_proj"]),
              "out_proj": quantize_linear_params(attn["out_proj"])}
    ref_q = PA.clip_temporal_megakernel(attn_q, ln, x, heads)
    out_q = PA.clip_temporal_megakernel(attn_q, ln, xp, heads, n_real=N)
    assert _rel(out_q[:, :N], ref_q) < 1e-5


def _tiny_fusion_cfg():
    # video grid 5x5 -> 26 tokens (not a 16-multiple, like prime 197);
    # audio stays small and unpadded
    return ClipConfig(ftmode="fusion", embed_dim=64, heads=4, layers=2,
                      input_resolution=80, patch_size=16, num_frames=2,
                      audio_tdim=48, audio_fdim=32, adapter_ratio=0.25,
                      label_dim=7)


def _nontrivial(params, seed=11):
    keys = iter(jax.random.split(jax.random.PRNGKey(seed), 4096))
    return jax.tree_util.tree_map(
        lambda x: jax.random.normal(next(keys), x.shape, jnp.float32) * 0.05
        if hasattr(x, "ndim") and x.ndim >= 1 else x, params)


@pytest.mark.parametrize("int8", [False, True])
def test_apply_clip_ave_resident_matches_normal(monkeypatch, int8):
    cfg = _tiny_fusion_cfg()
    params = _nontrivial(ave.init_clip_ave(jax.random.PRNGKey(0), cfg))
    if int8:
        params = dict(params)
        params["backbone"] = quantize_clip_tower(params["backbone"])
    rng = np.random.RandomState(7)
    a = jnp.asarray(rng.randn(2, cfg.num_frames, cfg.audio_tdim,
                              cfg.audio_fdim), jnp.float32)
    v = jnp.asarray(rng.randn(2, cfg.num_frames, cfg.input_resolution,
                              cfg.input_resolution, 3), jnp.float32)

    monkeypatch.setenv("STGCMA_RESIDENT_PAD", "0")
    ref = ave.apply_clip_ave(params, cfg, a, v)
    monkeypatch.setenv("STGCMA_RESIDENT_PAD", "1")
    out = ave.apply_clip_ave(params, cfg, a, v)
    assert out.shape == ref.shape
    assert _rel(out, ref) < 1e-5
