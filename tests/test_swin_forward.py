"""Swin backbone smoke + invariants: shapes per ftmode, zero-init adapter
no-op property, fusion gate behavior."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from stgcma_tpu.configs import swin_tiny_test
from stgcma_tpu.models import ave
from stgcma_tpu.nn import swin


def _inputs(cfg, B=2, key=0):
    k = jax.random.PRNGKey(key)
    k1, k2 = jax.random.split(k)
    v = jax.random.normal(k1, (B, cfg.num_frames, cfg.img_size, cfg.img_size, 3))
    a = jax.random.normal(k2, (B, cfg.num_frames, cfg.img_size, cfg.img_size))
    return a, v


@pytest.mark.parametrize("ftmode", ["videoonly", "audioonly", "multimodal", "fusion"])
def test_ave_swin_shapes(ftmode):
    cfg = swin_tiny_test(ftmode=ftmode, label_dim=29)
    params = ave.init_swin_ave(jax.random.PRNGKey(0), cfg)
    a, v = _inputs(cfg)
    logits = jax.jit(lambda p, a, v: ave.apply_swin_ave(p, cfg, a, v))(params, a, v)
    assert logits.shape == (2 * cfg.num_ttokens, 29)
    assert np.isfinite(np.asarray(logits)).all()


def test_fusion_gates_zero_init_match_no_crossmodal():
    """With zero-init gates the fusion path must equal a gate-ablated fusion path
    (cross-modal residual contributes nothing at init)."""
    cfg = swin_tiny_test(ftmode="fusion")
    params = ave.init_swin_ave(jax.random.PRNGKey(1), cfg)
    a, v = _inputs(cfg, B=1)
    out1 = ave.apply_swin_ave(params, cfg, a, v)

    # make adapters live (non-zero D_fc2), then verify gates steer the output:
    # gate-only bumps are invisible at init because zero D_fc2 kills the
    # cross-modal residual downstream — exactly the reference's zero-init design.
    def bump(p, with_gates):
        def f(path, leaf):
            s = jax.tree_util.keystr(path)
            if "D_fc2" in s and "kernel" in s:
                return leaf + 0.01
            if with_gates and ("gate_v" in s or "gate_a" in s):
                return leaf + 0.5
            return leaf
        return jax.tree_util.tree_map_with_path(f, p)

    out_nogate = np.asarray(ave.apply_swin_ave(bump(params, False), cfg, a, v))
    out_gate = np.asarray(ave.apply_swin_ave(bump(params, True), cfg, a, v))
    assert np.abs(out_nogate - out_gate).max() > 0, "gates must steer the output"
    assert np.abs(np.asarray(out1) - out_nogate).max() > 0


def test_zero_adapters_fusion_equals_multimodal():
    """At init (all adapter D_fc2 zero, gates zero) the fusion and
    multimodal-no-fusion paths produce identical features IF they share weights —
    the adapters and cross-modal exchange are exact no-ops."""
    cfg_f = swin_tiny_test(ftmode="fusion")
    cfg_m = swin_tiny_test(ftmode="multimodal")
    params = ave.init_swin_ave(jax.random.PRNGKey(2), cfg_f)
    a, v = _inputs(cfg_f, B=1)
    f1 = swin.backbone_apply(params["backbone"], cfg_f, a=a, v=v)
    f2 = swin.backbone_apply(params["backbone"], cfg_m, a=a, v=v)
    np.testing.assert_allclose(np.asarray(f1["v"]), np.asarray(f2["v"]),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(f1["a"]), np.asarray(f2["a"]),
                               rtol=1e-5, atol=1e-5)


def test_avqa_three_stream_shapes():
    cfg = swin_tiny_test(ftmode="fusion")
    params = swin.backbone_init(jax.random.PRNGKey(3), cfg)
    a, v = _inputs(cfg, B=1)
    out = swin.backbone_apply(params, cfg, a=a, v=v, v_nega=v + 0.1)
    assert out["v"].shape == out["v_nega"].shape


def test_multiscale_taps():
    cfg = swin_tiny_test(ftmode="fusion")
    params = swin.backbone_init(jax.random.PRNGKey(4), cfg)
    a, v = _inputs(cfg, B=1)
    out = swin.backbone_apply(params, cfg, a=a, v=v, collect_multiscale=True)
    ms = out["multi_scale"]
    assert len(ms) == cfg.num_layers
    r0 = cfg.patches_resolution[0]
    assert ms[0].shape[1] == r0 * r0
    assert ms[-1].shape[1] == (r0 // 2 ** (cfg.num_layers - 1)) ** 2


@pytest.mark.parametrize("flags", [
    dict(use_temporal_attn=False, use_t_adapter=False, use_s_adapter=False,
         use_g_adapter=False),                      # frozen ViT only
    dict(use_t_adapter=False),                      # temporal attn, no T adapter
    dict(use_g_adapter=False),                      # spatial+temporal only
    dict(use_s_adapter=False),                      # temporal+global only
])
def test_ablation_variants_run(flags):
    """AVS ablation switches (run_adapt_avs_ablation.sh variants) compile and
    produce finite outputs."""
    cfg = swin_tiny_test(ftmode="fusion", label_dim=5, **flags)
    params = ave.init_swin_ave(jax.random.PRNGKey(0), cfg)
    a, v = _inputs(cfg, B=1)
    out = ave.apply_swin_ave(params, cfg, a, v)
    assert np.isfinite(np.asarray(out)).all()
    flat = jax.tree_util.tree_flatten_with_path(params)[0]
    names = [jax.tree_util.keystr(p) for p, _ in flat]
    if not flags.get("use_s_adapter", True):
        assert not any("S_Adapter2" in n for n in names)
    if not flags.get("use_g_adapter", True):
        assert not any("'S_Adapter'" in n for n in names)
