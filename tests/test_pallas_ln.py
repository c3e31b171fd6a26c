"""Fused Pallas LayerNorm vs ops.common.layernorm (interpret mode on CPU)."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from stgcma_tpu.ops.common import layernorm
from stgcma_tpu.ops.pallas_attn import layernorm_fused


def _params(C, seed=0):
    rng = np.random.RandomState(seed)
    return {"scale": jnp.asarray(rng.randn(C).astype(np.float32)),
            "bias": jnp.asarray(rng.randn(C).astype(np.float32))}


@pytest.mark.parametrize("shape", [(8, 1024, 128), (80, 784, 512),
                                   (3, 1000, 256)])  # last: non-divisible M
@pytest.mark.parametrize("dtype", [jnp.bfloat16, jnp.float32])
def test_ln_fused_matches_naive(shape, dtype, monkeypatch):
    monkeypatch.setenv("STGCMA_FUSED_ATTN", "1")  # force kernel (interpret)
    rng = np.random.RandomState(1)
    x = jnp.asarray(rng.randn(*shape), dtype)
    p = _params(shape[-1])
    ref = layernorm(p, x)
    out = layernorm_fused(p, x, min_elems=0)
    assert out.dtype == ref.dtype
    np.testing.assert_allclose(np.asarray(out, np.float32),
                               np.asarray(ref, np.float32),
                               rtol=2e-2 if dtype == jnp.bfloat16 else 1e-6,
                               atol=2e-2 if dtype == jnp.bfloat16 else 1e-6)


def test_ln_fused_grads(monkeypatch):
    monkeypatch.setenv("STGCMA_FUSED_ATTN", "1")
    rng = np.random.RandomState(2)
    x = jnp.asarray(rng.randn(4, 96, 128), jnp.float32)
    p = _params(128, seed=3)

    def f_ref(p, x):
        return (layernorm(p, x) * jnp.cos(x)).sum()

    def f_fused(p, x):
        return (layernorm_fused(p, x, min_elems=0) * jnp.cos(x)).sum()

    g_ref = jax.grad(f_ref, argnums=(0, 1))(p, x)
    g_fus = jax.grad(f_fused, argnums=(0, 1))(p, x)
    for a, b in zip(jax.tree_util.tree_leaves(g_ref),
                    jax.tree_util.tree_leaves(g_fus)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-5)


def test_ln_fused_small_fallback(monkeypatch):
    # below min_elems the call must route to the plain XLA layernorm
    monkeypatch.setenv("STGCMA_FUSED_ATTN", "1")
    x = jnp.asarray(np.random.RandomState(4).randn(2, 8, 128), jnp.float32)
    p = _params(128)
    np.testing.assert_allclose(np.asarray(layernorm_fused(p, x)),
                               np.asarray(layernorm(p, x)), rtol=0, atol=0)


def test_ln_tile_mosaic_constraints():
    # Mosaic requires the sublane (row) block dim be a multiple of 8; the
    # CLIP ln_pre shape (15760, 768) regressed on real TPU when the divisor
    # search picked TT=10 (interpret mode does not enforce the constraint).
    from stgcma_tpu.ops.pallas_attn import _ln_tile
    for M, C, isz in [(15760, 768, 2), (250880, 128, 2), (62720, 256, 2),
                      (3920, 1024, 2), (1000, 256, 4), (4, 128, 4),
                      (8 * 197, 768, 2), (80 * 197, 1024, 2)]:
        TT, MP = _ln_tile(M, C, isz)
        assert TT % 8 == 0 and TT > 0, (M, C, TT)
        assert MP >= M and MP % TT == 0, (M, C, TT, MP)
        if M % 8 == 0:
            assert MP == M, (M, C, TT, MP)  # no pad copy for 8-aligned M
