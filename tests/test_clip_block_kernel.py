"""CLIP whole-block fusion megakernel vs the naive XLA mirror (interpret mode
on CPU), forward and gradient."""
import jax
import jax.numpy as jnp
import numpy as np

from stgcma_tpu.configs import ClipConfig
from stgcma_tpu.nn.clip_vit import clip_block_init
from stgcma_tpu.ops.pallas_clip_block import (_fusion_block_op,
                                              _fusion_pallas,
                                              _fusion_spatial_naive)


def _setup(seed=0, BT=3, Nv=37, Na=21, C=32, heads=4):
    cfg = ClipConfig(embed_dim=C, layers=1, heads=heads, adapter_ratio=0.25,
                     ftmode="fusion")
    p = clip_block_init(jax.random.PRNGKey(seed), cfg, "fusion_adapt")
    # make gates + adapters numerically live (init zeros them)
    p = jax.tree.map(
        lambda x: jax.random.normal(jax.random.PRNGKey(7), x.shape) * 0.1
        if x.ndim >= 1 else x, p)
    k = jax.random.PRNGKey(seed + 1)
    v = jax.random.normal(k, (BT, Nv, C)) * 0.5
    a = jax.random.normal(jax.random.fold_in(k, 1), (BT, Na, C)) * 0.5
    return p, v, a, heads


def test_fusion_block_kernel_matches_naive():
    p, v, a, heads = _setup()
    vo, ao = _fusion_pallas(p, v, a, heads)
    vr, ar = _fusion_spatial_naive({**p, "__heads__": heads}, v, a)
    np.testing.assert_allclose(np.asarray(vo), np.asarray(vr), rtol=3e-5, atol=3e-5)
    np.testing.assert_allclose(np.asarray(ao), np.asarray(ar), rtol=3e-5, atol=3e-5)


def test_temporal_adapt_kernel_matches_naive():
    from stgcma_tpu.ops.pallas_clip_block import _tadapt_naive, _tadapt_pallas
    p, _, _, heads = _setup()
    k = jax.random.PRNGKey(3)
    x = jax.random.normal(k, (13, 10, 32)) * 0.5   # R=13 (unaligned), T=10
    out = _tadapt_pallas(p["attn"], p["ln_1"], p["T_Adapter"], x, heads)
    ref = _tadapt_naive(p["attn"], p["ln_1"], p["T_Adapter"], x, heads)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=3e-5, atol=3e-5)


def test_temporal_adapt_kernel_grad():
    from stgcma_tpu.ops.pallas_clip_block import _tadapt_naive, _tadapt_op
    p, _, _, heads = _setup(C=16, heads=2)
    k = jax.random.PRNGKey(4)
    x = jax.random.normal(k, (5, 7, 16)) * 0.5

    def loss_k(a, l, d, x):
        return (_tadapt_op(a, l, d, x, heads) ** 2).sum()

    def loss_n(a, l, d, x):
        return (_tadapt_naive(a, l, d, x, heads) ** 2).sum()

    args = (p["attn"], p["ln_1"], p["T_Adapter"], x)
    g1 = jax.grad(loss_k, argnums=(0, 1, 2, 3))(*args)
    g2 = jax.grad(loss_n, argnums=(0, 1, 2, 3))(*args)
    for a, b in zip(jax.tree.leaves(g1), jax.tree.leaves(g2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-4, atol=2e-4)


def test_fusion_block_kernel_grad():
    p, v, a, heads = _setup(BT=2, Nv=18, Na=10, C=16, heads=2)

    def loss_k(p, v, a):
        vo, ao = _fusion_block_op(p, v, a, heads)
        return (vo ** 2).sum() + (ao ** 2).sum()

    def loss_n(p, v, a):
        vo, ao = _fusion_spatial_naive({**p, "__heads__": heads}, v, a)
        return (vo ** 2).sum() + (ao ** 2).sum()

    g1 = jax.grad(loss_k, argnums=(0, 1, 2))(p, v, a)
    g2 = jax.grad(loss_n, argnums=(0, 1, 2))(p, v, a)
    flat1, _ = jax.tree.flatten(g1)
    flat2, _ = jax.tree.flatten(g2)
    for x, y in zip(flat1, flat2):
        np.testing.assert_allclose(np.asarray(x), np.asarray(y),
                                   rtol=2e-4, atol=2e-4)
