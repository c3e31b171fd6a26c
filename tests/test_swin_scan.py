"""Pair-scanned deep stages == unrolled loop (SwinConfig.scan_blocks).

Within a stage all even blocks share one BlockStatic and all odd blocks
another (make_block_static depends on block_idx only via parity), so
lax.scan over stacked (regular, shifted) pair params must reproduce the
unrolled numerics (up to XLA fusion reassociation, ~1e-6 rel) — forward
AND gradients. This is what makes the
full-depth (2,2,18,2) multichip dryrun compile in O(1) of stage depth.
Reference: Swin_AVE.py:1032-1076 (BasicLayer's python loop over blocks).
"""
import dataclasses

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from stgcma_tpu.configs import swin_tiny_test
from stgcma_tpu.models import ave
from stgcma_tpu.nn import swin


@pytest.fixture(scope="module")
def setup():
    cfg = swin_tiny_test(ftmode="fusion", label_dim=5, depths=(4, 2),
                         num_heads=(2, 4), img_size=56, window_size=7)
    params = ave.init_swin_ave(jax.random.PRNGKey(0), cfg)
    rng = np.random.RandomState(0)
    a = jnp.asarray(rng.randn(1, cfg.num_frames, cfg.img_size, cfg.img_size),
                    jnp.float32)
    v = jnp.asarray(
        rng.randn(1, cfg.num_frames, cfg.img_size, cfg.img_size, 3),
        jnp.float32)
    return cfg, params, a, v


def test_scan_matches_unrolled_forward(setup):
    cfg, params, a, v = setup
    cfg_scan = dataclasses.replace(cfg, scan_blocks=4)
    out_ref = ave.apply_swin_ave(params, cfg, a, v)
    out_scan = ave.apply_swin_ave(params, cfg_scan, a, v)
    np.testing.assert_allclose(np.asarray(out_ref), np.asarray(out_scan),
                               rtol=1e-5, atol=1e-7)


def test_scan_matches_unrolled_grads(setup):
    cfg, params, a, v = setup
    cfg_scan = dataclasses.replace(cfg, scan_blocks=4)

    def loss(p, c):
        return jnp.sum(ave.apply_swin_ave(p, c, a, v) ** 2)

    g_ref = jax.grad(loss)(params, cfg)
    g_scan = jax.grad(loss)(params, cfg_scan)
    flat_ref, tree_ref = jax.tree_util.tree_flatten(g_ref)
    flat_scan, tree_scan = jax.tree_util.tree_flatten(g_scan)
    assert tree_ref == tree_scan
    for r, s in zip(flat_ref, flat_scan):
        np.testing.assert_allclose(np.asarray(r), np.asarray(s),
                                   rtol=1e-4, atol=1e-6)


def test_scan_with_checkpoint_and_nega(setup):
    cfg, _, a, v = setup
    cfg3 = dataclasses.replace(cfg, with_nega_stream=True, use_checkpoint=True)
    cfg3_scan = dataclasses.replace(cfg3, scan_blocks=4)
    params = ave.init_swin_ave(jax.random.PRNGKey(1), cfg3)
    st = swin.backbone_statics(cfg3)
    out_ref = swin.backbone_apply(params["backbone"], cfg3, a=a, v=v, v_nega=v)
    out_scan = swin.backbone_apply(params["backbone"], cfg3_scan, a=a, v=v,
                                   v_nega=v)
    # scanned stage 0 (res 14, ws 7) has real shifted masks on odd blocks
    assert st[0][0].shift_size == 0 and st[0][1].shift_size > 0
    for k in ("v", "a", "v_nega"):
        np.testing.assert_allclose(np.asarray(out_ref[k]),
                                   np.asarray(out_scan[k]),
                                   rtol=1e-5, atol=1e-6)
