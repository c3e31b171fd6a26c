"""Shape/finite smoke tests for the CLIP-AVE, AVS, and AVQA task models."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from stgcma_tpu.configs import (AVQAHeadConfig, AVSHeadConfig, clip_tiny_test,
                                swin_tiny_test)
from stgcma_tpu.models import ave, avqa, avs


@pytest.mark.parametrize("ftmode", ["videoonly", "audioonly", "fusion"])
def test_clip_ave_shapes(ftmode):
    cfg = clip_tiny_test(ftmode=ftmode, label_dim=29)
    params = ave.init_clip_ave(jax.random.PRNGKey(0), cfg)
    B = 2
    k = jax.random.PRNGKey(1)
    v = jax.random.normal(k, (B, cfg.num_frames, cfg.input_resolution,
                              cfg.input_resolution, 3))
    a = jax.random.normal(k, (B, cfg.num_frames, cfg.audio_tdim, cfg.audio_fdim))
    logits = ave.apply_clip_ave(params, cfg, a, v)
    assert logits.shape == (B * cfg.num_frames, 29)
    assert np.isfinite(np.asarray(logits)).all()


def test_avs_shapes():
    cfg = swin_tiny_test(ftmode="fusion", num_frames=5)
    # tiny backbone: 2 stages -> taps at 14x14 (56/4) and 7x7
    hcfg = AVSHeadConfig(stage_dims=(16, 32), stage_resolutions=(14, 7),
                         vis_dim=(64, 128), tpavi_stages=(0, 1),
                         audio_dim=32, num_frames=5)
    params = avs.init_avs(jax.random.PRNGKey(0), cfg, hcfg)
    B = 1
    k = jax.random.PRNGKey(2)
    v = jax.random.normal(k, (B, 5, cfg.img_size, cfg.img_size, 3))
    a = jax.random.normal(k, (B, 5, cfg.img_size, cfg.img_size))
    pred, fmaps, afeas = avs.apply_avs(params, cfg, hcfg, a, v)
    # 2-stage FPN: path2 (no skip) + path1 -> upsamples 7->14->28, conv head x2 -> 56
    assert pred.shape[0] == B * 5 and pred.shape[-1] == 1
    assert len(fmaps) == 2 and fmaps[0].shape[-1] == hcfg.channel
    assert afeas[0].shape == (B, 5, hcfg.channel)
    assert np.isfinite(np.asarray(pred)).all()


def test_avqa_shapes():
    cfg = swin_tiny_test(ftmode="fusion", num_frames=2)
    hcfg = AVQAHeadConfig(feat_dim=32, grid=7, num_frames=2)
    params = avqa.init_avqa(jax.random.PRNGKey(0), cfg, hcfg)
    B = 2
    k = jax.random.PRNGKey(3)
    v = jax.random.normal(k, (B, 2, cfg.img_size, cfg.img_size, 3))
    a = jax.random.normal(k, (B, 2, cfg.img_size, cfg.img_size))
    q = jax.random.randint(k, (B, 14), 0, hcfg.vocab_size)
    out_qa, m_pos, m_neg = avqa.apply_avqa(params, cfg, hcfg, a, v, v + 0.1, q)
    assert out_qa.shape == (B, hcfg.answer_dim)
    assert m_pos.shape == (B * 2, 2) and m_neg.shape == (B * 2, 2)
    assert np.isfinite(np.asarray(out_qa)).all()


def test_clip_fusion_equals_multimodal_at_init():
    """CLIP zero-init adapters: fusion exchange is a no-op at init, so fusion
    and multimodal-no-fusion produce identical features with shared weights."""
    from stgcma_tpu.nn import clip_vit
    cfg_f = clip_tiny_test(ftmode="fusion")
    cfg_m = clip_tiny_test(ftmode="multimodal")
    params = ave.init_clip_ave(jax.random.PRNGKey(5), cfg_f)
    B = 1
    k = jax.random.PRNGKey(6)
    v = jax.random.normal(k, (B, cfg_f.num_frames, cfg_f.input_resolution,
                              cfg_f.input_resolution, 3))
    a = jax.random.normal(k, (B, cfg_f.num_frames, cfg_f.audio_tdim,
                              cfg_f.audio_fdim))
    f1 = clip_vit.clip_backbone_apply(params["backbone"], cfg_f, a=a, v=v)
    f2 = clip_vit.clip_backbone_apply(params["backbone"], cfg_m, a=a, v=v)
    np.testing.assert_allclose(np.asarray(f1["v"]), np.asarray(f2["v"]),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(f1["a"]), np.asarray(f2["a"]),
                               rtol=1e-5, atol=1e-5)
