"""TPAVI 'dot'-mode linearity: the reassociated form theta @ (phi^T @ g) / THW
must equal the reference's explicit-gram form (theta @ phi^T / THW) @ g
(AVS/model/TPAVI.py:133-139 — no softmax, so attention is linear in g).

The model-level torch parity lives in tests/test_ref_model_parity.py; this
pins the algebraic step itself at fp32 so a future kernel change can't
silently reintroduce the (THW, THW) gram semantics drift.
"""
import jax
import jax.numpy as jnp
import numpy as np

from stgcma_tpu.nn import tpavi


def _explicit_gram_apply(p, x, audio):
    """The pre-reassociation formulation (materializes the THW^2 gram)."""
    from stgcma_tpu.ops.common import layernorm, linear
    from stgcma_tpu.ops.conv import batchnorm
    B, T, H, W, C = x.shape
    THW = T * H * W
    audio_temp = linear(p["align_channel"], audio)
    au = jnp.broadcast_to(audio_temp[:, :, None, None, :], (B, T, H, W, C))
    g_x = linear(p["g"], x).reshape(B, THW, -1)
    theta_x = linear(p["theta"], x).reshape(B, THW, -1)
    phi_x = linear(p["phi"], au).reshape(B, THW, -1)
    f = jnp.einsum("bnc,bmc->bnm", theta_x, phi_x,
                   preferred_element_type=jnp.float32)
    f_div_C = (f / THW).astype(x.dtype)
    y = jnp.einsum("bnm,bmc->bnc", f_div_C, g_x).reshape(B, T, H, W, -1)
    w = linear(p["W_z"]["conv"], y)
    w = batchnorm(p["W_z"]["bn"], w)
    return layernorm(p["norm_layer"], w + x)


def test_tpavi_reassociation_matches_explicit_gram():
    rng = np.random.RandomState(0)
    B, T, H, W, C = 2, 3, 7, 7, 32
    p = tpavi.tpavi_init(jax.random.PRNGKey(0), C, audio_dim=16)
    # non-zero BN scale so W_z actually contributes
    p["W_z"]["bn"]["scale"] = jnp.asarray(rng.rand(C) + 0.5, jnp.float32)
    x = jnp.asarray(rng.randn(B, T, H, W, C), jnp.float32)
    audio = jnp.asarray(rng.randn(B, T, 16), jnp.float32)
    got, a_got, _ = tpavi.tpavi_apply(p, x, audio)
    want = _explicit_gram_apply(p, x, audio)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-5, atol=2e-5)


def test_tpavi_reassociation_grads_match():
    rng = np.random.RandomState(1)
    B, T, H, W, C = 1, 2, 5, 5, 16
    p = tpavi.tpavi_init(jax.random.PRNGKey(1), C, audio_dim=8)
    p["W_z"]["bn"]["scale"] = jnp.asarray(rng.rand(C) + 0.5, jnp.float32)
    x = jnp.asarray(rng.randn(B, T, H, W, C), jnp.float32)
    audio = jnp.asarray(rng.randn(B, T, 8), jnp.float32)

    def loss_new(p):
        return (tpavi.tpavi_apply(p, x, audio)[0] ** 2).mean()

    def loss_old(p):
        return (_explicit_gram_apply(p, x, audio) ** 2).mean()

    g_new = jax.grad(loss_new)(p)
    g_old = jax.grad(loss_old)(p)
    flat_new, _ = jax.tree_util.tree_flatten(g_new)
    flat_old, _ = jax.tree_util.tree_flatten(g_old)
    for a, b in zip(flat_new, flat_old):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=5e-5, atol=5e-6)
