"""Pallas unscaled cross-attention kernel vs naive XLA reference (interpret
mode on CPU), including gradient path and the fused STG-CMA wrapper."""
import numpy as np
import jax
import jax.numpy as jnp

from stgcma_tpu.ops.attention import cross_modal_fuse
from stgcma_tpu.ops.pallas_attn import (_attn_ref, cross_modal_fuse_flash,
                                        unscaled_attention)


def test_kernel_matches_reference():
    k = jax.random.PRNGKey(0)
    k1, k2, k3 = jax.random.split(k, 3)
    B, Nq, Nk, D = 3, 300, 260, 24   # deliberately unaligned sizes
    q = jax.random.normal(k1, (B, Nq, D)) * 0.3
    kk = jax.random.normal(k2, (B, Nk, D)) * 0.3
    v = jax.random.normal(k3, (B, Nk, D))
    out = unscaled_attention(q, kk, v)
    ref = _attn_ref(q, kk, v)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)


def test_kernel_grad_matches_reference():
    k = jax.random.PRNGKey(1)
    B, N, D = 2, 64, 16
    q = jax.random.normal(k, (B, N, D)) * 0.3
    kk = jax.random.normal(jax.random.fold_in(k, 1), (B, N, D)) * 0.3
    v = jax.random.normal(jax.random.fold_in(k, 2), (B, N, D))

    def loss_pallas(q, kk, v):
        return (unscaled_attention(q, kk, v) ** 2).sum()

    def loss_ref(q, kk, v):
        return (_attn_ref(q, kk, v) ** 2).sum()

    g1 = jax.grad(loss_pallas, argnums=(0, 1, 2))(q, kk, v)
    g2 = jax.grad(loss_ref, argnums=(0, 1, 2))(q, kk, v)
    for a, b in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-4)


def test_fuse_flash_matches_naive():
    k = jax.random.PRNGKey(2)
    B, N, D = 2, 300, 16
    vh = jax.random.normal(k, (B, N, D)) * 0.3
    ah = jax.random.normal(jax.random.fold_in(k, 1), (B, N, D)) * 0.3
    gv = jnp.asarray([0.7])
    ga = jnp.asarray([-0.3])
    v1, a1 = cross_modal_fuse_flash(vh, ah, gv, ga, min_tokens=1)
    v2, a2 = cross_modal_fuse(vh, ah, gv, ga)
    np.testing.assert_allclose(np.asarray(v1), np.asarray(v2), rtol=2e-5, atol=2e-5)
    np.testing.assert_allclose(np.asarray(a1), np.asarray(a2), rtol=2e-5, atol=2e-5)


def test_window_attention_fused_matches_naive():
    import stgcma_tpu.ops.window as W
    from stgcma_tpu.ops.attention import window_attention
    from stgcma_tpu.ops.pallas_attn import window_attention_fused
    k = jax.random.PRNGKey(3)
    B_, N, C, h, nW = 8, 49, 32, 4, 4
    p = {"qkv": {"kernel": jax.random.normal(k, (C, 3 * C)) * 0.05,
                 "bias": jnp.zeros((3 * C,))},
         "proj": {"kernel": jax.random.normal(jax.random.fold_in(k, 1),
                                              (C, C)) * 0.05,
                  "bias": jnp.zeros((C,))},
         "relative_position_bias_table": jax.random.normal(
             jax.random.fold_in(k, 2), (169, h)) * 0.02}
    x = jax.random.normal(jax.random.fold_in(k, 3), (B_, N, C))
    rel = jnp.asarray(W.relative_position_index(7))
    mask = jnp.where(jax.random.uniform(jax.random.fold_in(k, 4),
                                        (nW, N, N)) > 0.5, 0.0, -100.0)
    ref = window_attention(p, x, h, rel, mask=mask)
    out = window_attention_fused(p, x, h, rel, mask=mask)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)
    # no-mask path
    ref2 = window_attention(p, x, h, rel)
    out2 = window_attention_fused(p, x, h, rel)
    np.testing.assert_allclose(np.asarray(out2), np.asarray(ref2),
                               rtol=2e-5, atol=2e-5)


def test_window_attention_fused_grad():
    import stgcma_tpu.ops.window as W
    from stgcma_tpu.ops.attention import window_attention
    from stgcma_tpu.ops.pallas_attn import window_attention_fused
    k = jax.random.PRNGKey(5)
    B_, N, C, h = 4, 49, 16, 2
    p = {"qkv": {"kernel": jax.random.normal(k, (C, 3 * C)) * 0.05,
                 "bias": jnp.zeros((3 * C,))},
         "proj": {"kernel": jax.random.normal(jax.random.fold_in(k, 1),
                                              (C, C)) * 0.05,
                  "bias": jnp.zeros((C,))},
         "relative_position_bias_table": jax.random.normal(
             jax.random.fold_in(k, 2), (169, h)) * 0.02}
    x = jax.random.normal(jax.random.fold_in(k, 3), (B_, N, C))
    rel = jnp.asarray(W.relative_position_index(7))
    g1 = jax.grad(lambda p, x: (window_attention_fused(p, x, h, rel) ** 2).sum(),
                  argnums=(0, 1))(p, x)
    g2 = jax.grad(lambda p, x: (window_attention(p, x, h, rel) ** 2).sum(),
                  argnums=(0, 1))(p, x)
    for a, b in zip(jax.tree_util.tree_leaves(g1), jax.tree_util.tree_leaves(g2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-4)


def test_temporal_attention_fused_matches_naive():
    import stgcma_tpu.ops.window as W
    from stgcma_tpu.ops.attention import temporal_attention
    from stgcma_tpu.ops.pallas_attn import temporal_attention_fused
    k = jax.random.PRNGKey(6)
    B_, T, C, h = 12, 10, 32, 4
    p = {"qkv": {"kernel": jax.random.normal(k, (C, 3 * C)) * 0.05,
                 "bias": jnp.zeros((3 * C,))},
         "proj": {"kernel": jax.random.normal(jax.random.fold_in(k, 1),
                                              (C, C)) * 0.05,
                  "bias": jnp.zeros((C,))},
         "temporal_position_bias_table": jax.random.normal(
             jax.random.fold_in(k, 2), (2 * T - 1, h)) * 0.02,
         "temporal_position_bias_table_audio": jax.random.normal(
             jax.random.fold_in(k, 7), (2 * T - 1, h)) * 0.02}
    x = jax.random.normal(jax.random.fold_in(k, 3), (B_, T, C))
    t_index = jnp.asarray(W.temporal_relative_index(T))
    for signal in ("video", "audio"):
        ref = temporal_attention(p, x, h, t_index, signal=signal)
        out = temporal_attention_fused(p, x, h, t_index, signal=signal)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   rtol=2e-5, atol=2e-5)


def test_window_block_megakernel_matches_naive():
    """LN+W-MSA+proj megakernel vs the composed naive path, fwd + grad."""
    from stgcma_tpu.ops.attention import window_attention
    from stgcma_tpu.ops.common import layernorm
    from stgcma_tpu.ops.pallas_attn import window_block_megakernel
    import stgcma_tpu.ops.window as W
    k = jax.random.PRNGKey(9)
    B_, N, C, h, nW = 8, 49, 32, 4, 4
    p = {"qkv": {"kernel": jax.random.normal(k, (C, 3 * C)) * 0.05,
                 "bias": jax.random.normal(jax.random.fold_in(k, 8), (3 * C,)) * .01},
         "proj": {"kernel": jax.random.normal(jax.random.fold_in(k, 1),
                                              (C, C)) * 0.05,
                  "bias": jax.random.normal(jax.random.fold_in(k, 9), (C,)) * .01},
         "relative_position_bias_table": jax.random.normal(
             jax.random.fold_in(k, 2), (169, h)) * 0.02}
    ln = {"scale": 1.0 + 0.1 * jax.random.normal(jax.random.fold_in(k, 4), (C,)),
          "bias": 0.1 * jax.random.normal(jax.random.fold_in(k, 5), (C,))}
    x = jax.random.normal(jax.random.fold_in(k, 3), (B_, N, C))
    rel = jnp.asarray(W.relative_position_index(7))
    mask = jnp.where(jax.random.uniform(jax.random.fold_in(k, 6),
                                        (nW, N, N)) > 0.5, 0.0, -100.0)

    for m in (mask, None):
        ref = window_attention(p, layernorm(ln, x), h, rel, mask=m)
        out = window_block_megakernel(p, ln, x, h, rel, mask=m)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   rtol=3e-5, atol=3e-5)

    def loss_fused(p, ln, x):
        return (window_block_megakernel(p, ln, x, h, rel, mask=mask) ** 2).sum()

    def loss_ref(p, ln, x):
        return (window_attention(p, layernorm(ln, x), h, rel, mask=mask) ** 2).sum()

    g1 = jax.grad(loss_fused, argnums=(0, 1, 2))(p, ln, x)
    g2 = jax.grad(loss_ref, argnums=(0, 1, 2))(p, ln, x)
    for a, b in zip(jax.tree_util.tree_leaves(g1), jax.tree_util.tree_leaves(g2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-3, atol=1e-4)


def test_temporal_block_megakernel_matches_naive():
    import stgcma_tpu.ops.window as W
    from stgcma_tpu.ops.attention import temporal_attention
    from stgcma_tpu.ops.common import layernorm
    from stgcma_tpu.ops.pallas_attn import temporal_block_megakernel
    k = jax.random.PRNGKey(11)
    B_, T, C, h = 12, 10, 32, 4
    p = {"qkv": {"kernel": jax.random.normal(k, (C, 3 * C)) * 0.05,
                 "bias": jax.random.normal(jax.random.fold_in(k, 8), (3 * C,)) * .01},
         "proj": {"kernel": jax.random.normal(jax.random.fold_in(k, 1),
                                              (C, C)) * 0.05,
                  "bias": jnp.zeros((C,))},
         "temporal_position_bias_table": jax.random.normal(
             jax.random.fold_in(k, 2), (19, h)) * 0.02,
         "temporal_position_bias_table_audio": jax.random.normal(
             jax.random.fold_in(k, 7), (19, h)) * 0.02}
    ln = {"scale": 1.0 + 0.1 * jax.random.normal(jax.random.fold_in(k, 4), (C,)),
          "bias": 0.1 * jax.random.normal(jax.random.fold_in(k, 5), (C,))}
    x = jax.random.normal(jax.random.fold_in(k, 3), (B_, T, C))
    tid = jnp.asarray(W.temporal_relative_index(T))
    for signal in ("video", "audio"):
        ref = temporal_attention(p, layernorm(ln, x), h, tid, signal=signal)
        out = temporal_block_megakernel(p, ln, x, h, tid, signal=signal)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   rtol=3e-5, atol=3e-5)


def test_mha_self_fused_matches_mha():
    from stgcma_tpu.ops.attention import mha
    from stgcma_tpu.ops.pallas_attn import mha_self_fused
    k = jax.random.PRNGKey(12)
    B_, N, C, h = 3, 197, 64, 4
    p = {"in_proj": {"kernel": jax.random.normal(k, (C, 3 * C)) * 0.05,
                     "bias": jax.random.normal(jax.random.fold_in(k, 1),
                                               (3 * C,)) * 0.01},
         "out_proj": {"kernel": jax.random.normal(jax.random.fold_in(k, 2),
                                                  (C, C)) * 0.05,
                      "bias": jnp.zeros((C,))}}
    x = jax.random.normal(jax.random.fold_in(k, 3), (B_, N, C))
    ref = mha(p, x, x, x, h)
    out = mha_self_fused(p, x, h)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)


def test_mha_self_fused_tiny_n_packed():
    """N<=16 packed path (CLIP temporal axis) matches the naive MHA."""
    from stgcma_tpu.ops.attention import mha
    from stgcma_tpu.ops.pallas_attn import mha_self_fused
    k = jax.random.PRNGKey(13)
    B_, N, C, h = 37, 10, 32, 4   # odd B_ exercises row padding
    p = {"in_proj": {"kernel": jax.random.normal(k, (C, 3 * C)) * 0.05,
                     "bias": jax.random.normal(jax.random.fold_in(k, 1),
                                               (3 * C,)) * 0.01},
         "out_proj": {"kernel": jax.random.normal(jax.random.fold_in(k, 2),
                                                  (C, C)) * 0.05,
                      "bias": jnp.zeros((C,))}}
    x = jax.random.normal(jax.random.fold_in(k, 3), (B_, N, C))
    ref = mha(p, x, x, x, h)
    out = mha_self_fused(p, x, h)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)


def test_ffn_megakernel_matches_naive():
    from stgcma_tpu.ops.common import gelu, layernorm, mlp_apply, quick_gelu, linear
    from stgcma_tpu.ops.pallas_attn import ffn_megakernel
    k = jax.random.PRNGKey(14)
    B_, N, C = 3, 49, 32
    mlp_p = {"fc1": {"kernel": jax.random.normal(k, (C, 4 * C)) * 0.05,
                     "bias": jax.random.normal(jax.random.fold_in(k, 1),
                                               (4 * C,)) * 0.01},
             "fc2": {"kernel": jax.random.normal(jax.random.fold_in(k, 2),
                                                 (4 * C, C)) * 0.05,
                     "bias": jnp.zeros((C,))}}
    ln = {"scale": 1.0 + 0.1 * jax.random.normal(jax.random.fold_in(k, 3), (C,)),
          "bias": 0.1 * jax.random.normal(jax.random.fold_in(k, 4), (C,))}
    x = jax.random.normal(jax.random.fold_in(k, 5), (B_, N, C))
    ref = mlp_apply(mlp_p, layernorm(ln, x))
    out = ffn_megakernel(mlp_p, ln, x)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=3e-5, atol=3e-5)
    # quick_gelu flavor (CLIP)
    clip_p = {"c_fc": mlp_p["fc1"], "c_proj": mlp_p["fc2"]}
    ref_q = linear(clip_p["c_proj"], quick_gelu(linear(clip_p["c_fc"],
                                                       layernorm(ln, x))))
    out_q = ffn_megakernel(clip_p, ln, x, act="quick_gelu",
                           keys=("c_fc", "c_proj"))
    np.testing.assert_allclose(np.asarray(out_q), np.asarray(ref_q),
                               rtol=3e-5, atol=3e-5)
    # gradients through the custom vjp
    g1 = jax.grad(lambda p, x: (ffn_megakernel(p, ln, x) ** 2).sum(),
                  argnums=(0, 1))(mlp_p, x)
    g2 = jax.grad(lambda p, x: (mlp_apply(p, layernorm(ln, x)) ** 2).sum(),
                  argnums=(0, 1))(mlp_p, x)
    for a, b in zip(jax.tree_util.tree_leaves(g1), jax.tree_util.tree_leaves(g2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-4)


def test_clip_temporal_megakernel_matches_naive():
    from stgcma_tpu.ops.attention import mha
    from stgcma_tpu.ops.common import layernorm
    from stgcma_tpu.ops.pallas_attn import clip_temporal_megakernel
    k = jax.random.PRNGKey(15)
    B_, T, C, h = 21, 10, 32, 4
    p = {"in_proj": {"kernel": jax.random.normal(k, (C, 3 * C)) * 0.05,
                     "bias": jax.random.normal(jax.random.fold_in(k, 1),
                                               (3 * C,)) * 0.01},
         "out_proj": {"kernel": jax.random.normal(jax.random.fold_in(k, 2),
                                                  (C, C)) * 0.05,
                      "bias": jax.random.normal(jax.random.fold_in(k, 6),
                                                (C,)) * 0.01}}
    ln = {"scale": 1.0 + 0.1 * jax.random.normal(jax.random.fold_in(k, 3), (C,)),
          "bias": 0.1 * jax.random.normal(jax.random.fold_in(k, 4), (C,))}
    x = jax.random.normal(jax.random.fold_in(k, 5), (B_, T, C))
    ref = mha(p, layernorm(ln, x), layernorm(ln, x), layernorm(ln, x), h)
    out = clip_temporal_megakernel(p, ln, x, h)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=3e-5, atol=3e-5)


def test_bidir_fuse_matches_cross_modal_fuse():
    from stgcma_tpu.ops.attention import cross_modal_fuse
    from stgcma_tpu.ops.pallas_attn import _bidir_fuse_pallas
    rng = np.random.RandomState(0)
    vh = jnp.asarray(rng.randn(3, 64, 16), jnp.float32)
    ah = jnp.asarray(rng.randn(3, 32, 16), jnp.float32)
    gv = jnp.asarray([0.7], jnp.float32)
    ga = jnp.asarray([-0.3], jnp.float32)
    vo, ao = _bidir_fuse_pallas(vh, ah, gv, ga)
    vr, ar = cross_modal_fuse(vh, ah, gv, ga)
    np.testing.assert_allclose(np.asarray(vo), np.asarray(vr), rtol=2e-5, atol=2e-5)
    np.testing.assert_allclose(np.asarray(ao), np.asarray(ar), rtol=2e-5, atol=2e-5)


def test_bidir_fuse_grad():
    from stgcma_tpu.ops.attention import cross_modal_fuse
    from stgcma_tpu.ops.pallas_attn import _bidir_fuse_op
    rng = np.random.RandomState(1)
    vh = jnp.asarray(rng.randn(2, 32, 8), jnp.float32)
    ah = jnp.asarray(rng.randn(2, 16, 8), jnp.float32)
    gv = jnp.asarray([0.5], jnp.float32)
    ga = jnp.asarray([0.2], jnp.float32)

    def loss_k(*args):
        vo, ao = _bidir_fuse_op(*args)
        return (vo ** 2).sum() + (ao ** 2).sum()

    def loss_n(*args):
        vo, ao = cross_modal_fuse(*args)
        return (vo ** 2).sum() + (ao ** 2).sum()

    g1 = jax.grad(loss_k, argnums=(0, 1, 2, 3))(vh, ah, gv, ga)
    g2 = jax.grad(loss_n, argnums=(0, 1, 2, 3))(vh, ah, gv, ga)
    for x, y in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(x), np.asarray(y),
                                   rtol=2e-4, atol=2e-4)


def test_bidir_fuse_multi_tile_accumulation():
    """Online column-softmax accumulation across row tiles (tq < Nv)."""
    from stgcma_tpu.ops.attention import cross_modal_fuse
    from stgcma_tpu.ops.pallas_attn import _bidir_fuse_pallas
    rng = np.random.RandomState(2)
    vh = jnp.asarray(rng.randn(2, 80, 16) * 2.0, jnp.float32)  # pads to 96
    ah = jnp.asarray(rng.randn(2, 48, 16) * 2.0, jnp.float32)
    gv = jnp.asarray([1.3], jnp.float32)
    ga = jnp.asarray([-0.8], jnp.float32)
    vo, ao = _bidir_fuse_pallas(vh, ah, gv, ga, tq=32)
    vr, ar = cross_modal_fuse(vh, ah, gv, ga)
    np.testing.assert_allclose(np.asarray(vo), np.asarray(vr), rtol=3e-5, atol=3e-5)
    np.testing.assert_allclose(np.asarray(ao), np.asarray(ar), rtol=3e-5, atol=3e-5)


def test_win_fuse_matches_cross_modal_fuse():
    """Windowed bidirectional fusion kernel (stages 0/1 spatial exchange)."""
    from stgcma_tpu.ops.attention import cross_modal_fuse
    from stgcma_tpu.ops.pallas_attn import _win_fuse_op, _win_fuse_pallas
    rng = np.random.RandomState(5)
    vh = jnp.asarray(rng.randn(7, 49, 24), jnp.float32)   # unaligned N and D
    ah = jnp.asarray(rng.randn(7, 49, 24), jnp.float32)
    gv = jnp.asarray([0.9], jnp.float32)
    ga = jnp.asarray([-0.4], jnp.float32)
    vo, ao = _win_fuse_pallas(vh, ah, gv, ga)
    vr, ar = cross_modal_fuse(vh, ah, gv, ga)
    np.testing.assert_allclose(np.asarray(vo), np.asarray(vr), rtol=3e-5, atol=3e-5)
    np.testing.assert_allclose(np.asarray(ao), np.asarray(ar), rtol=3e-5, atol=3e-5)

    def loss_k(*args):
        vo, ao = _win_fuse_op(*args)
        return (vo ** 2).sum() + (ao ** 2).sum()

    def loss_n(*args):
        vo, ao = cross_modal_fuse(*args)
        return (vo ** 2).sum() + (ao ** 2).sum()

    g1 = jax.grad(loss_k, argnums=(0, 1, 2, 3))(vh, ah, gv, ga)
    g2 = jax.grad(loss_n, argnums=(0, 1, 2, 3))(vh, ah, gv, ga)
    for x, y in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(x), np.asarray(y),
                                   rtol=2e-4, atol=2e-4)
