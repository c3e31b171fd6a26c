"""Swin whole-block fusion megakernel: the full-grid mask formulation vs the
windowed reference path, and the Pallas kernel (interpret mode) vs its naive
mirror — forward and gradient."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from stgcma_tpu.nn.swin import BlockStatic, block_apply, block_init
from stgcma_tpu.ops.pallas_swin_block import (_fullgrid_naive, _fullgrid_pallas,
                                              _geo, _swin_block_op)


def _setup(seed=0, H=8, W=8, ws=4, shift=0, heads=2, C=16, BT=3):
    st = BlockStatic(dim=C, H=H, W=W, num_heads=heads, window_size=ws,
                     shift_size=shift, t_attn=False, num_frames=2,
                     adapter_ratio=0.25, mode="fusion_adapt")
    p = block_init(jax.random.PRNGKey(seed), st)
    # make gates + zero-init adapter outputs numerically live
    p = jax.tree.map(
        lambda x: jax.random.normal(jax.random.PRNGKey(11), x.shape) * 0.1
        if x.ndim >= 1 else x, p)
    k = jax.random.PRNGKey(seed + 1)
    v = jax.random.normal(k, (BT, H * W, C)) * 0.5
    a = jax.random.normal(jax.random.fold_in(k, 1), (BT, H * W, C)) * 0.5
    return st, p, v, a


@pytest.mark.parametrize("shift", [0, 2])
def test_fullgrid_matches_windowed_block(shift):
    """The mask-encoded full-grid formulation must equal the roll+partition
    windowed path (block_apply with kernels disabled) exactly."""
    st, p, v, a = _setup(shift=shift)
    vr, ar = block_apply(p, (v, a), st)       # windowed path (CPU -> naive)
    geo = _geo(st.H, st.W, st.window_size, st.shift_size)
    vo, ao = _fullgrid_naive(p, v, a, st.num_heads, geo)
    np.testing.assert_allclose(np.asarray(vo), np.asarray(vr), rtol=2e-5, atol=2e-5)
    np.testing.assert_allclose(np.asarray(ao), np.asarray(ar), rtol=2e-5, atol=2e-5)


@pytest.mark.parametrize("shift", [0, 2])
def test_swin_block_kernel_matches_naive(shift):
    st, p, v, a = _setup(shift=shift)
    geo_key = (st.H, st.W, st.window_size, st.shift_size, st.num_heads)
    vo, ao = _fullgrid_pallas(p, v, a, geo_key)
    geo = _geo(st.H, st.W, st.window_size, st.shift_size)
    vr, ar = _fullgrid_naive(p, v, a, st.num_heads, geo)
    np.testing.assert_allclose(np.asarray(vo), np.asarray(vr), rtol=3e-5, atol=3e-5)
    np.testing.assert_allclose(np.asarray(ao), np.asarray(ar), rtol=3e-5, atol=3e-5)


def test_swin_block_kernel_nonsquare_pad():
    """Grid not a multiple of the sublane tile (H*W=36 -> NP=48)."""
    st, p, v, a = _setup(H=6, W=6, ws=3, shift=1, heads=4, C=32)
    geo_key = (st.H, st.W, st.window_size, st.shift_size, st.num_heads)
    vo, ao = _fullgrid_pallas(p, v, a, geo_key)
    vr, ar = block_apply(p, (v, a), st)
    np.testing.assert_allclose(np.asarray(vo), np.asarray(vr), rtol=3e-5, atol=3e-5)
    np.testing.assert_allclose(np.asarray(ao), np.asarray(ar), rtol=3e-5, atol=3e-5)


def test_swin_block_kernel_grad():
    st, p, v, a = _setup(H=4, W=4, ws=2, shift=1, heads=2, C=16, BT=2)
    geo_key = (st.H, st.W, st.window_size, st.shift_size, st.num_heads)
    geo = _geo(st.H, st.W, st.window_size, st.shift_size)

    def loss_k(p, v, a):
        vo, ao = _swin_block_op(p, v, a, geo_key)
        return (vo ** 2).sum() + (ao ** 2).sum()

    def loss_n(p, v, a):
        vo, ao = _fullgrid_naive(p, v, a, st.num_heads, geo)
        return (vo ** 2).sum() + (ao ** 2).sum()

    g1 = jax.grad(loss_k, argnums=(0, 1, 2))(p, v, a)
    g2 = jax.grad(loss_n, argnums=(0, 1, 2))(p, v, a)
    for x, y in zip(jax.tree.leaves(g1), jax.tree.leaves(g2)):
        np.testing.assert_allclose(np.asarray(x), np.asarray(y),
                                   rtol=2e-4, atol=2e-4)


@pytest.mark.parametrize("shift", [0, 2])
def test_swin_block_kernel_winmajor(shift):
    """Window-major layout mode: per-window grams + perm/inv-perm gathers."""
    st, p, v, a = _setup(shift=shift)
    geo_key = (st.H, st.W, st.window_size, st.shift_size, st.num_heads)
    vo, ao = _fullgrid_pallas(p, v, a, geo_key, winmajor=True)
    vr, ar = block_apply(p, (v, a), st)
    np.testing.assert_allclose(np.asarray(vo), np.asarray(vr), rtol=3e-5, atol=3e-5)
    np.testing.assert_allclose(np.asarray(ao), np.asarray(ar), rtol=3e-5, atol=3e-5)


def test_swin_block_kernel_winmajor_nonsquare():
    st, p, v, a = _setup(H=6, W=6, ws=3, shift=1, heads=4, C=32)
    geo_key = (st.H, st.W, st.window_size, st.shift_size, st.num_heads)
    vo, ao = _fullgrid_pallas(p, v, a, geo_key, winmajor=True)
    vr, ar = block_apply(p, (v, a), st)
    np.testing.assert_allclose(np.asarray(vo), np.asarray(vr), rtol=3e-5, atol=3e-5)
    np.testing.assert_allclose(np.asarray(ao), np.asarray(ar), rtol=3e-5, atol=3e-5)
