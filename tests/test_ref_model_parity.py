"""End-to-end numerical parity against the ACTUAL reference implementation.

Imports the reference model files from /root/reference (via tests/ref_shims for
timm/ipdb/clip/loratorch/torchvision), randomizes their state dicts, converts
them with checkpoint/torch_convert, and asserts logits/masks match <=1e-3.

Covered:
  - AVE Swin  (AVE/model/Swin_AVE.py::SwinTransformer2D_Adapter_New), 4 ftmodes
  - AVE CLIP  (AVE/model/CLIP_AVE.py::MM_CLIP_AVE), 4 ftmodes
  - AVS       (AVS/model/Swin_AVSModel.py::SwinTransformer2D_Adapter_AVS), fusion
  - AVQA      (AVQA/model/Swin_AVQAModel_V1.py::SwinTransformer2D_Adapter_AVQA), fusion
  - AVE Swin at the reference Base width (embed 128, depths 2/2/18/2), fusion
"""
import importlib
import os
import sys

import numpy as np
import pytest

torch = pytest.importorskip("torch")

HERE = os.path.dirname(os.path.abspath(__file__))
SHIMS = os.path.join(HERE, "ref_shims")
REF = "/root/reference"

import jax.numpy as jnp

from stgcma_tpu.checkpoint.torch_convert import (load_reference_clip,
                                                 load_reference_swin)
from stgcma_tpu.configs import (AVQAHeadConfig, AVSHeadConfig, ClipConfig,
                                SwinConfig)
from stgcma_tpu.models import ave, avqa, avs

pytestmark = pytest.mark.skipif(not os.path.isdir(REF),
                                reason="reference repo not present")


def _import_ref(name):
    for p in (SHIMS, REF):
        if p not in sys.path:
            sys.path.insert(0, p)
    return importlib.import_module(name)


# ---------------------------------------------------------------------------
# state-dict randomization (the reference zero-inits adapter D_fc2 — we want
# every path numerically live, so re-randomize all parameters and BN stats)
# ---------------------------------------------------------------------------

def randomize_state_dict(model, seed: int):
    g = torch.Generator().manual_seed(seed)
    param_names = {n for n, _ in model.named_parameters()}
    sd = model.state_dict()
    new = {}
    for k, v in sd.items():
        if k not in param_names:  # buffer
            if k.endswith("running_mean"):
                new[k] = 0.05 * torch.randn(v.shape, generator=g)
            elif k.endswith("running_var"):
                new[k] = 0.7 + 0.6 * torch.rand(v.shape, generator=g)
            else:
                new[k] = v  # geometry buffers (indices, masks, counters)
            continue
        if v.ndim == 1 and k.endswith(".weight"):  # LayerNorm / BN scale
            new[k] = 1.0 + 0.1 * torch.randn(v.shape, generator=g)
        elif "gate" in k.split(".")[-1]:
            new[k] = 0.3 * torch.randn(v.shape, generator=g)
        else:
            new[k] = 0.02 * torch.randn(v.shape, generator=g)
    model.load_state_dict(new)
    model.eval()
    return model.state_dict()


def _assert_close(ref, got, tol=1e-3, what=""):
    ref = np.asarray(ref, np.float32)
    got = np.asarray(got, np.float32)
    assert ref.shape == got.shape, f"{what}: {ref.shape} vs {got.shape}"
    # guard against degenerate all-zero agreement
    assert float(np.abs(ref).max()) > 1e-4, f"{what}: reference output is ~0"
    diff = float(np.max(np.abs(ref - got)))
    assert diff <= tol, f"{what}: max |diff| {diff} > {tol}"


# ---------------------------------------------------------------------------
# AVE Swin
# ---------------------------------------------------------------------------

TINY = dict(img_size=56, embed_dim=16, depths=(2, 2), num_heads=(2, 4),
            num_frames=2, adapter_ratios=(0.25, 0.25))


def _run_swin_ave(ftmode: str, cfg: SwinConfig, seed: int):
    mod = _import_ref("AVE.model.Swin_AVE")
    ref = mod.SwinTransformer2D_Adapter_New(
        label_dim=cfg.label_dim, pretrained=None, img_size=cfg.img_size,
        embed_dim=cfg.embed_dim, depths=list(cfg.depths),
        num_heads=list(cfg.num_heads), num_frames=cfg.num_frames,
        window_size=cfg.window_size, drop_path_rate=0.0, ftmode=ftmode,
        adapter_mlp_ratio=list(cfg.adapter_ratios))
    sd = randomize_state_dict(ref, seed)
    # Latent reference bug: the audioonly branch reads self.layers_audio[-1]
    # (Swin_AVE.py:1521) but __init__ only ever builds self.layers; the value
    # feeds a dead local, so aliasing preserves reference semantics. (Set after
    # state_dict extraction so the alias doesn't duplicate keys.)
    ref.layers_audio = ref.layers

    B, T, S = 1, cfg.num_frames, cfg.img_size
    rng = np.random.default_rng(seed)
    v_t = torch.from_numpy(rng.standard_normal((B, 3, T, S, S)).astype(np.float32))
    a_t = torch.from_numpy(rng.standard_normal((B, T, S, S)).astype(np.float32))
    with torch.no_grad():
        out_ref = ref(a_t, v_t, ftmode).numpy()

    import jax
    params = ave.init_swin_ave(jax.random.PRNGKey(0), cfg)
    params, unexpected = load_reference_swin(
        params, sd, dual_head=ftmode in ("multimodal", "fusion"))
    assert unexpected == [], f"unconsumed checkpoint keys: {unexpected[:8]}"

    v_j = jnp.asarray(np.transpose(v_t.numpy(), (0, 2, 3, 4, 1)))  # B,T,H,W,3
    a_j = jnp.asarray(a_t.numpy())
    out = np.asarray(ave.apply_swin_ave(params, cfg, a_j, v_j))
    _assert_close(out_ref, out, what=f"swin-ave {ftmode}")


@pytest.mark.parametrize("ftmode", ["videoonly", "audioonly", "multimodal", "fusion"])
def test_swin_ave_tiny_parity(ftmode):
    cfg = SwinConfig(label_dim=7, ftmode=ftmode, **TINY)
    _run_swin_ave(ftmode, cfg, seed=1)


def test_swin_ave_base_fusion_parity():
    """Reference Base width (AVE/run_adapt_ave29.py driver config), fusion mode,
    T=2 frames to keep CPU time bounded."""
    cfg = SwinConfig(label_dim=29, ftmode="fusion", num_frames=2,
                     adapter_ratios=(0.125, 0.125, 0.0625, 0.0625))
    _run_swin_ave("fusion", cfg, seed=2)


# ---------------------------------------------------------------------------
# AVE CLIP
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("ftmode", ["videoonly", "audioonly", "multimodal", "fusion"])
def test_clip_ave_tiny_parity(ftmode):
    mod = _import_ref("AVE.model.CLIP_AVE")
    cfg = ClipConfig(embed_dim=32, layers=2, heads=4, patch_size=16,
                     input_resolution=64, num_frames=2, audio_fdim=128,
                     audio_tdim=48, adapter_ratio=0.0625, ftmode=ftmode,
                     label_dim=7)
    ref = mod.MM_CLIP_AVE(label_dim=7, input_resolution=64, audio_length=480,
                          num_video_frames=2, patch_size=16, embed_dim=32,
                          layers=2, heads=4, drop_path_rate=0.0,
                          num_tadapter=1, adapter_scale=0.5, pretrained=None,
                          ftmode=ftmode)
    sd = randomize_state_dict(ref, seed=3)

    B, T = 1, 2
    rng = np.random.default_rng(3)
    v_t = torch.from_numpy(rng.standard_normal((B, 3, T, 64, 64)).astype(np.float32))
    a_t = torch.from_numpy(rng.standard_normal((B, T, 48, 128)).astype(np.float32))
    with torch.no_grad():
        out_ref = ref(a_t, v_t, ftmode).numpy()

    import jax
    params = ave.init_clip_ave(jax.random.PRNGKey(0), cfg)
    params, unexpected = load_reference_clip(
        params, sd, cfg, dual_head=ftmode in ("multimodal", "fusion"))
    assert unexpected == [], f"unconsumed checkpoint keys: {unexpected[:8]}"

    v_j = jnp.asarray(np.transpose(v_t.numpy(), (0, 2, 3, 4, 1)))
    a_j = jnp.asarray(a_t.numpy())
    out = np.asarray(ave.apply_clip_ave(params, cfg, a_j, v_j))
    _assert_close(out_ref, out, what=f"clip-ave {ftmode}")


# ---------------------------------------------------------------------------
# AVS (fusion). The reference head hardcodes stage dims 192/384/768/1536,
# 56/28/14/7 taps and T=5 (pre_reshape_for_tpavi), so the smallest legal
# geometry is a depth-(1,1,1,1) Large-width tower at 224.
# ---------------------------------------------------------------------------

def test_avs_fusion_parity():
    mod = _import_ref("AVS.model.Swin_AVSModel")
    cfg = SwinConfig(embed_dim=192, depths=(1, 1, 1, 1), num_heads=(2, 4, 8, 16),
                     img_size=224, num_frames=5, ftmode="fusion",
                     adapter_ratios=(0.25, 0.25, 0.25, 0.25))
    hcfg = AVSHeadConfig()
    ref = mod.SwinTransformer2D_Adapter_AVS(
        pretrained=None, img_size=224, embed_dim=192, depths=[1, 1, 1, 1],
        num_heads=[2, 4, 8, 16], num_frames=5, window_size=7,
        drop_path_rate=0.0, ftmode="fusion",
        adapter_mlp_ratio=[0.25, 0.25, 0.25, 0.25],
        tpavi_stages=[0, 1, 2, 3], tpavi_va_flag=True)
    sd = randomize_state_dict(ref, seed=4)

    B, T = 1, 5
    rng = np.random.default_rng(4)
    v_t = torch.from_numpy(rng.standard_normal((B, T, 3, 224, 224)).astype(np.float32))
    a_t = torch.from_numpy(rng.standard_normal((B, T, 224, 224)).astype(np.float32))
    with torch.no_grad():
        pred_ref, fmaps_ref, afea_ref = ref(a_t, v_t, "fusion")

    import jax
    params = avs.init_avs(jax.random.PRNGKey(0), cfg, hcfg)
    params, unexpected = load_reference_swin(params, sd)
    assert unexpected == [], f"unconsumed checkpoint keys: {unexpected[:8]}"

    v_j = jnp.asarray(np.transpose(v_t.numpy(), (0, 1, 3, 4, 2)))  # B,T,H,W,3
    a_j = jnp.asarray(a_t.numpy())
    pred, fmaps, afea = avs.apply_avs(params, cfg, hcfg, a_j, v_j)

    # pred: ref (BT,1,224,224) vs ours (BT,224,224,1)
    _assert_close(pred_ref.numpy()[:, 0], np.asarray(pred)[..., 0], what="avs pred")
    for i, (fr, fo) in enumerate(zip(fmaps_ref, fmaps)):
        _assert_close(fr.numpy(), np.transpose(np.asarray(fo), (0, 3, 1, 2)),
                      what=f"avs fmap{i}")
    for i, (ar, ao) in enumerate(zip(afea_ref, afea)):
        if ar is not None:
            _assert_close(ar.numpy(), np.asarray(ao), what=f"avs a_fea{i}")


# ---------------------------------------------------------------------------
# AVQA (fusion). Head hardcodes 1536-dim features and a 7x7 grid, so the
# smallest legal tower is embed 768, depths (1,1), img 56.
# ---------------------------------------------------------------------------

def test_avqa_fusion_parity():
    mod = _import_ref("AVQA.model.Swin_AVQAModel_V1")
    cfg = SwinConfig(embed_dim=768, depths=(1, 1), num_heads=(4, 8),
                     img_size=56, num_frames=2, ftmode="fusion",
                     adapter_ratios=(0.25, 0.25), with_nega_stream=True)
    hcfg = AVQAHeadConfig(num_frames=2)
    ref = mod.SwinTransformer2D_Adapter_AVQA(
        grounding_pretrained=None, pretrained=None, img_size=56, embed_dim=768,
        depths=[1, 1], num_heads=[4, 8], num_frames=2, window_size=7,
        drop_path_rate=0.0, ftmode="fusion", adapter_mlp_ratio=[0.25, 0.25])
    sd = randomize_state_dict(ref, seed=5)

    B, T = 1, 2
    rng = np.random.default_rng(5)
    v_t = torch.from_numpy(rng.standard_normal((B, T, 3, 56, 56)).astype(np.float32))
    vn_t = torch.from_numpy(rng.standard_normal((B, T, 3, 56, 56)).astype(np.float32))
    a_t = torch.from_numpy(rng.standard_normal((B, T, 56, 56)).astype(np.float32))
    q_t = torch.from_numpy(rng.integers(0, 93, (B, 14)).astype(np.int64))
    with torch.no_grad():
        qa_ref, posi_ref, nega_ref = ref(a_t, v_t, vn_t, q_t, "fusion")

    import jax
    params = avqa.init_avqa(jax.random.PRNGKey(0), cfg, hcfg)
    params, unexpected = load_reference_swin(params, sd)
    assert unexpected == [], f"unconsumed checkpoint keys: {unexpected[:8]}"

    v_j = jnp.asarray(np.transpose(v_t.numpy(), (0, 1, 3, 4, 2)))
    vn_j = jnp.asarray(np.transpose(vn_t.numpy(), (0, 1, 3, 4, 2)))
    a_j = jnp.asarray(a_t.numpy())
    q_j = jnp.asarray(q_t.numpy())
    qa, posi, nega = avqa.apply_avqa(params, cfg, hcfg, a_j, v_j, vn_j, q_j)

    _assert_close(qa_ref.numpy(), np.asarray(qa), what="avqa out_qa")
    _assert_close(posi_ref.numpy(), np.asarray(posi), what="avqa match_posi")
    _assert_close(nega_ref.numpy(), np.asarray(nega), what="avqa match_nega")
