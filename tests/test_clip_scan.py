"""ClipConfig.scan_blocks: lax.scan over the homogeneous resblocks must be
numerically identical to the unrolled loop (forward + grads), like the Swin
pair-scan (tests/test_swin_scan.py). Needed so L/14 train programs stay under
the compile-relay request-size limit (BENCH_NOTES)."""
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from stgcma_tpu.configs import ClipConfig
from stgcma_tpu.models import ave


def _tiny(ftmode, **kw):
    return ClipConfig(embed_dim=32, layers=4, heads=2, patch_size=16,
                      input_resolution=32, num_frames=2, audio_fdim=32,
                      audio_tdim=16, adapter_ratio=0.25, ftmode=ftmode,
                      label_dim=7, **kw)


@pytest.mark.parametrize("ftmode", ["fusion", "videoonly"])
def test_scan_matches_unrolled_forward(ftmode):
    cfg = _tiny(ftmode)
    params = ave.init_clip_ave(jax.random.PRNGKey(0), cfg)
    params = jax.tree_util.tree_map(
        lambda x: jax.random.normal(jax.random.PRNGKey(3), x.shape,
                                    jnp.float32) * 0.05
        if hasattr(x, "ndim") and x.ndim >= 1 else x, params)
    rng = np.random.RandomState(0)
    a = jnp.asarray(rng.randn(2, 2, cfg.audio_tdim, cfg.audio_fdim),
                    jnp.float32)
    v = jnp.asarray(rng.randn(2, 2, 32, 32, 3), jnp.float32)
    ref = ave.apply_clip_ave(params, cfg, a, v)
    cfg_s = dataclasses.replace(cfg, scan_blocks=2)
    out = ave.apply_clip_ave(params, cfg_s, a, v)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-5, atol=2e-6)


def test_prestacked_matches_unrolled():
    """stack_resblocks (stacking OUTSIDE jit, one leaf per weight) must match
    the unrolled loop; this is the form the L/14 train bench feeds to the
    optimizer so Adam plumbing stays O(1) in depth."""
    from stgcma_tpu.nn.clip_vit import stack_resblocks
    cfg = _tiny("fusion")
    params = ave.init_clip_ave(jax.random.PRNGKey(0), cfg)
    rng = np.random.RandomState(0)
    a = jnp.asarray(rng.randn(2, 2, cfg.audio_tdim, cfg.audio_fdim),
                    jnp.float32)
    v = jnp.asarray(rng.randn(2, 2, 32, 32, 3), jnp.float32)
    ref = ave.apply_clip_ave(params, cfg, a, v)
    stacked = stack_resblocks(params)
    # one leaf per weight: resblocks subtree leaf count shrank by depth x
    n_ref = len(jax.tree_util.tree_leaves(params["backbone"]["resblocks"]))
    n_st = len(jax.tree_util.tree_leaves(stacked["backbone"]["resblocks"]))
    assert n_ref == cfg.layers * n_st
    out = ave.apply_clip_ave(stacked, dataclasses.replace(cfg, scan_blocks=2),
                             a, v)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-5, atol=2e-6)
    # idempotent on already-stacked trees
    again = stack_resblocks(stacked)
    assert again["backbone"]["resblocks"] is stacked["backbone"]["resblocks"]


@pytest.mark.parametrize("ckpt", [False, True])
def test_scan_matches_unrolled_grads(ckpt):
    cfg = _tiny("fusion")
    params = ave.init_clip_ave(jax.random.PRNGKey(1), cfg)
    params = jax.tree_util.tree_map(
        lambda x: jax.random.normal(jax.random.PRNGKey(5), x.shape,
                                    jnp.float32) * 0.05
        if hasattr(x, "ndim") and x.ndim >= 1 else x, params)
    rng = np.random.RandomState(1)
    a = jnp.asarray(rng.randn(1, 2, cfg.audio_tdim, cfg.audio_fdim),
                    jnp.float32)
    v = jnp.asarray(rng.randn(1, 2, 32, 32, 3), jnp.float32)

    def loss(p, c):
        return ave.apply_clip_ave(p, c, a, v).astype(jnp.float32).sum()

    g_ref = jax.grad(loss)(params, cfg)
    cfg_s = dataclasses.replace(cfg, scan_blocks=2, use_checkpoint=ckpt)
    g_scan = jax.grad(loss)(params, cfg_s)
    flat_r = jax.tree_util.tree_leaves(g_ref)
    flat_s = jax.tree_util.tree_leaves(g_scan)
    assert len(flat_r) == len(flat_s)
    for x, y in zip(flat_r, flat_s):
        np.testing.assert_allclose(np.asarray(y), np.asarray(x),
                                   rtol=5e-4, atol=1e-5)
