"""Bound the default fast-softmax drift vs exact two-pass math.

The TPU serving kernels default to a single-exp bidirectional softmax with
approx-reciprocal normalization (pl.reciprocal(approx=True), ~1e-4 rel;
see pallas_attn._pnorm / _bidir_fuse_full_kernel). The suite pins
STGCMA_EXACT_SOFTMAX=1 (tests/conftest.py) so the kernel-vs-XLA equivalence
tests verify the exact math; this module flips the flag per-test and asserts
the approximate mode stays within an order-1e-3 envelope of exact — the
end-to-end reference parity budget.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

RTOL, ATOL = 1e-2, 1e-3


@pytest.fixture()
def approx_mode(monkeypatch):
    monkeypatch.setenv("STGCMA_EXACT_SOFTMAX", "0")


def test_unscaled_attention_approx_close(approx_mode, monkeypatch):
    from stgcma_tpu.ops.pallas_attn import unscaled_attention
    k = jax.random.PRNGKey(0)
    q = jax.random.normal(k, (2, 128, 16)) * 0.3
    kk = jax.random.normal(jax.random.fold_in(k, 1), (2, 96, 16)) * 0.3
    v = jax.random.normal(jax.random.fold_in(k, 2), (2, 96, 16))
    out_a = unscaled_attention(q, kk, v)
    monkeypatch.setenv("STGCMA_EXACT_SOFTMAX", "1")
    out_e = unscaled_attention(q, kk, v)
    np.testing.assert_allclose(np.asarray(out_a), np.asarray(out_e),
                               rtol=RTOL, atol=ATOL)


def test_bidir_fuse_approx_close(approx_mode, monkeypatch):
    """Single-exp column derivation + approx reciprocal vs two-pass exact
    (the Swin joint/global fusion kernel, full-gram variant)."""
    from stgcma_tpu.ops.pallas_attn import _bidir_fuse_pallas
    k = jax.random.PRNGKey(3)
    vh = jax.random.normal(k, (2, 256, 32)) * 0.4
    ah = jax.random.normal(jax.random.fold_in(k, 1), (2, 256, 32)) * 0.4
    gv = jnp.asarray([0.7], jnp.float32)
    ga = jnp.asarray([-0.3], jnp.float32)
    vo_a, ao_a = _bidir_fuse_pallas(vh, ah, gv, ga)
    monkeypatch.setenv("STGCMA_EXACT_SOFTMAX", "1")
    vo_e, ao_e = _bidir_fuse_pallas(vh, ah, gv, ga)
    np.testing.assert_allclose(np.asarray(vo_a), np.asarray(vo_e),
                               rtol=RTOL, atol=ATOL)
    np.testing.assert_allclose(np.asarray(ao_a), np.asarray(ao_e),
                               rtol=RTOL, atol=ATOL)


def test_swin_whole_block_approx_close(approx_mode, monkeypatch):
    """The whole-block kernel's W-MSA softmax + both fusion exchanges under
    approx mode vs the exact naive mirror."""
    from stgcma_tpu.nn.swin import BlockStatic, block_init
    from stgcma_tpu.ops.pallas_swin_block import (_fullgrid_naive,
                                                  _fullgrid_pallas, _geo)
    st = BlockStatic(dim=16, H=8, W=8, num_heads=2, window_size=4,
                     shift_size=2, t_attn=False, num_frames=2,
                     adapter_ratio=0.25, mode="fusion_adapt")
    p = block_init(jax.random.PRNGKey(0), st)
    p = jax.tree.map(
        lambda x: jax.random.normal(jax.random.PRNGKey(11), x.shape) * 0.1
        if x.ndim >= 1 else x, p)
    k = jax.random.PRNGKey(1)
    v = jax.random.normal(k, (3, 64, 16)) * 0.5
    a = jax.random.normal(jax.random.fold_in(k, 1), (3, 64, 16)) * 0.5
    geo_key = (st.H, st.W, st.window_size, st.shift_size, st.num_heads)
    vo_a, ao_a = _fullgrid_pallas(p, v, a, geo_key)
    monkeypatch.setenv("STGCMA_EXACT_SOFTMAX", "1")
    vr, ar = _fullgrid_naive(p, v, a, st.num_heads,
                             _geo(st.H, st.W, st.window_size, st.shift_size))
    np.testing.assert_allclose(np.asarray(vo_a), np.asarray(vr),
                               rtol=RTOL, atol=ATOL)
    np.testing.assert_allclose(np.asarray(ao_a), np.asarray(ar),
                               rtol=RTOL, atol=ATOL)


def test_column_underflow_guard(approx_mode):
    """A gram column sitting far below the global max must produce zeros (not
    NaN) in the v2a direction — the documented degradation mode."""
    from stgcma_tpu.ops.pallas_attn import _bidir_fuse_pallas
    vh = jnp.zeros((1, 16, 8), jnp.float32).at[0, 0, 0].set(100.0)
    ah = jnp.ones((1, 16, 8), jnp.float32) * jnp.linspace(-2, 2, 8)
    one = jnp.asarray([1.0], jnp.float32)
    vo, ao = _bidir_fuse_pallas(vh, ah, one, one)
    assert np.isfinite(np.asarray(vo)).all()
    assert np.isfinite(np.asarray(ao)).all()


def test_ffn_megakernel_fast_erf_close(approx_mode, monkeypatch):
    """The FFN megakernel's GELU erf under fast numerics (approx-reciprocal
    divide in the A&S 7.1.26 rational, pallas_clip_block._erf) vs exact."""
    from stgcma_tpu.ops.common import layernorm_init, mlp_init
    from stgcma_tpu.ops.pallas_attn import ffn_megakernel
    k = jax.random.PRNGKey(3)
    mlp = mlp_init(k, 32, 128)
    ln = layernorm_init(32)
    x = jax.random.normal(jax.random.fold_in(k, 1), (4, 24, 32)) * 2.0
    out_a = ffn_megakernel(mlp, ln, x)
    monkeypatch.setenv("STGCMA_EXACT_SOFTMAX", "1")
    out_e = ffn_megakernel(mlp, ln, x)
    np.testing.assert_allclose(np.asarray(out_a), np.asarray(out_e),
                               rtol=RTOL, atol=ATOL)
