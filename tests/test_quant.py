"""int8 frozen-tower serving mode: quantized linears + full-model deviation."""
import jax
import jax.numpy as jnp
import numpy as np

from stgcma_tpu.ops.common import linear
from stgcma_tpu.ops.quant import (int8_matmul, quantize_clip_tower,
                                  quantize_linear_params, quantize_swin_tower,
                                  quantize_weight)


def test_int8_matmul_close_to_float():
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(64, 96), jnp.float32)
    w = jnp.asarray(rng.randn(96, 128) * 0.05, jnp.float32)
    wq, ws = quantize_weight(w)
    out = int8_matmul(x, wq, ws)
    ref = x @ w
    denom = np.abs(np.asarray(ref)).max()
    assert np.abs(np.asarray(out) - np.asarray(ref)).max() / denom < 0.02


def test_linear_dispatches_on_quantized_params():
    rng = np.random.RandomState(1)
    p = {"kernel": jnp.asarray(rng.randn(32, 48) * 0.1, jnp.float32),
         "bias": jnp.asarray(rng.randn(48) * 0.1, jnp.float32)}
    x = jnp.asarray(rng.randn(8, 32), jnp.float32)
    ref = linear(p, x)
    out = linear(quantize_linear_params(p), x)
    assert np.abs(np.asarray(out) - np.asarray(ref)).max() < 0.05


def test_clip_tower_int8_logit_deviation():
    """Full CLIP fusion forward with int8 towers: logits stay close (the
    serving-mode deviation is measured, not assumed)."""
    from stgcma_tpu.configs import ClipConfig
    from stgcma_tpu.models import ave

    cfg = ClipConfig(embed_dim=64, layers=2, heads=2, patch_size=16,
                     input_resolution=32, audio_tdim=32, audio_fdim=32,
                     num_frames=2, ftmode="fusion", label_dim=5)
    params = ave.init_clip_ave(jax.random.PRNGKey(0), cfg)
    # randomize zero-init adapters/gates so fusion paths are live
    params = jax.tree_util.tree_map(
        lambda x: jax.random.normal(jax.random.PRNGKey(7), x.shape) * 0.05
        if x.ndim >= 1 else x + 0.3, params)
    rng = np.random.RandomState(2)
    a = jnp.asarray(rng.randn(1, 2, 32, 32), jnp.float32)
    v = jnp.asarray(rng.randn(1, 2, 32, 32, 3), jnp.float32)

    ref = np.asarray(ave.apply_clip_ave(params, cfg, a, v))
    pq = dict(params)
    pq["backbone"] = quantize_clip_tower(params["backbone"])
    out = np.asarray(ave.apply_clip_ave(pq, cfg, a, v))
    denom = max(np.abs(ref).max(), 1e-6)
    rel = np.abs(out - ref).max() / denom
    assert np.isfinite(out).all()
    assert rel < 0.08, rel


def test_swin_tower_int8_logit_deviation():
    from stgcma_tpu.configs import swin_tiny_test
    from stgcma_tpu.models import ave

    cfg = swin_tiny_test(ftmode="fusion", num_frames=2)
    params = ave.init_swin_ave(jax.random.PRNGKey(0), cfg)
    params = jax.tree_util.tree_map(
        lambda x: jax.random.normal(jax.random.PRNGKey(9), x.shape) * 0.05
        if x.ndim >= 1 else x + 0.3, params)
    rng = np.random.RandomState(3)
    a = jnp.asarray(rng.randn(1, 2, cfg.img_size, cfg.img_size), jnp.float32)
    v = jnp.asarray(rng.randn(1, 2, cfg.img_size, cfg.img_size, 3), jnp.float32)

    ref = np.asarray(ave.apply_swin_ave(params, cfg, a, v))
    pq = dict(params)
    pq["backbone"] = quantize_swin_tower(params["backbone"])
    out = np.asarray(ave.apply_swin_ave(pq, cfg, a, v))
    denom = max(np.abs(ref).max(), 1e-6)
    rel = np.abs(out - ref).max() / denom
    assert np.isfinite(out).all()
    assert rel < 0.08, rel
