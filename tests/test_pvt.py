"""PVT-v2 encoder: geometry, SRA behavior, torch dwconv parity, AVS-PVT model."""
import numpy as np
import jax
import jax.numpy as jnp
import torch
import torch.nn.functional as tF

from stgcma_tpu.nn import pvt


def test_pvt_tiny_geometry():
    params = pvt.pvt_init(jax.random.PRNGKey(0), pvt.TINY)
    x = jnp.zeros((2, 64, 64, 3))
    outs = pvt.pvt_apply(params, x, pvt.TINY)
    assert len(outs) == 2
    assert outs[0].shape == (2, 16, 16, 16)   # /4
    assert outs[1].shape == (2, 8, 8, 32)     # /8
    for o in outs:
        assert np.isfinite(np.asarray(o)).all()


def test_dwconv_matches_torch():
    torch.manual_seed(0)
    dim, H, W = 8, 6, 5
    w = torch.randn(dim, 1, 3, 3) * 0.2
    b = torch.randn(dim) * 0.1
    x = torch.randn(2, dim, H, W)
    ref = tF.conv2d(x, w, b, padding=1, groups=dim)
    p = {"kernel": jnp.asarray(w.permute(2, 3, 1, 0).numpy()),
         "bias": jnp.asarray(b.numpy())}
    xt = jnp.asarray(x.permute(0, 2, 3, 1).numpy()).reshape(2, H * W, dim)
    out = pvt._dwconv(p, xt, H, W).reshape(2, H, W, dim)
    np.testing.assert_allclose(np.asarray(out),
                               ref.permute(0, 2, 3, 1).numpy(), rtol=1e-5,
                               atol=1e-5)


def test_sra_reduces_kv_tokens():
    k = jax.random.PRNGKey(1)
    dim, heads, sr, H, W = 16, 2, 4, 8, 8
    p = pvt._block_init(k, dim, heads, 4, sr)
    x = jax.random.normal(k, (2, H * W, dim))
    out = pvt._block_apply(p, x, H, W, heads, sr, 4)
    assert out.shape == x.shape
    assert np.isfinite(np.asarray(out)).all()


def test_avs_pvt_model():
    from stgcma_tpu.configs import AVSHeadConfig
    from stgcma_tpu.models import avs
    # tiny: replace B5 encoder with TINY via monkeypatching is heavy; use real
    # init but small input by shrinking the head to 2 tpavi stages and 64 img
    hcfg = AVSHeadConfig(tpavi_stages=(0, 1), num_frames=2)
    params = avs.init_avs_pvt(jax.random.PRNGKey(0), hcfg)
    B, T = 1, 2
    audio = jnp.asarray(np.random.RandomState(0).randn(B, T, 128), jnp.float32)
    frames = jnp.asarray(np.random.RandomState(1).randn(B * T, 64, 64, 3),
                         jnp.float32)
    pred, fmaps, afeas = avs.apply_avs_pvt(params, hcfg, audio, frames)
    # 64 input: stages 16/8/4/2 -> FPN up to 32 -> output conv x2 -> 64
    assert pred.shape == (B * T, 64, 64, 1)
    assert afeas[0].shape == (B, T, hcfg.channel)
    assert np.isfinite(np.asarray(pred)).all()


def test_pvt_converter_roundtrip():
    from stgcma_tpu.checkpoint import torch_convert as TC
    params = pvt.pvt_init(jax.random.PRNGKey(0), pvt.TINY)
    rng = np.random.RandomState(0)
    cfg = pvt.TINY
    sd = {}
    for i in range(2):
        dim = cfg["embed_dims"][i]
        cin = 3 if i == 0 else cfg["embed_dims"][i - 1]
        ks = 7 if i == 0 else 3
        sd[f"patch_embed{i+1}.proj.weight"] = rng.randn(dim, cin, ks, ks).astype(np.float32)
        sd[f"patch_embed{i+1}.proj.bias"] = rng.randn(dim).astype(np.float32)
        sd[f"patch_embed{i+1}.norm.weight"] = rng.randn(dim).astype(np.float32)
        sd[f"patch_embed{i+1}.norm.bias"] = rng.randn(dim).astype(np.float32)
        sd[f"norm{i+1}.weight"] = rng.randn(dim).astype(np.float32)
        sd[f"norm{i+1}.bias"] = rng.randn(dim).astype(np.float32)
        for j in range(cfg["depths"][i]):
            b = f"block{i+1}.{j}"
            hid = dim * cfg["mlp_ratios"][i]
            sr = cfg["sr_ratios"][i]
            sd[f"{b}.norm1.weight"] = rng.randn(dim).astype(np.float32)
            sd[f"{b}.norm1.bias"] = rng.randn(dim).astype(np.float32)
            sd[f"{b}.norm2.weight"] = rng.randn(dim).astype(np.float32)
            sd[f"{b}.norm2.bias"] = rng.randn(dim).astype(np.float32)
            sd[f"{b}.attn.q.weight"] = rng.randn(dim, dim).astype(np.float32)
            sd[f"{b}.attn.q.bias"] = rng.randn(dim).astype(np.float32)
            sd[f"{b}.attn.kv.weight"] = rng.randn(2 * dim, dim).astype(np.float32)
            sd[f"{b}.attn.kv.bias"] = rng.randn(2 * dim).astype(np.float32)
            sd[f"{b}.attn.proj.weight"] = rng.randn(dim, dim).astype(np.float32)
            sd[f"{b}.attn.proj.bias"] = rng.randn(dim).astype(np.float32)
            sd[f"{b}.attn.sr.weight"] = rng.randn(dim, dim, sr, sr).astype(np.float32)
            sd[f"{b}.attn.sr.bias"] = rng.randn(dim).astype(np.float32)
            sd[f"{b}.attn.norm.weight"] = rng.randn(dim).astype(np.float32)
            sd[f"{b}.attn.norm.bias"] = rng.randn(dim).astype(np.float32)
            sd[f"{b}.mlp.fc1.weight"] = rng.randn(hid, dim).astype(np.float32)
            sd[f"{b}.mlp.fc1.bias"] = rng.randn(hid).astype(np.float32)
            sd[f"{b}.mlp.dwconv.dwconv.weight"] = rng.randn(hid, 1, 3, 3).astype(np.float32)
            sd[f"{b}.mlp.dwconv.dwconv.bias"] = rng.randn(hid).astype(np.float32)
            sd[f"{b}.mlp.fc2.weight"] = rng.randn(dim, hid).astype(np.float32)
            sd[f"{b}.mlp.fc2.bias"] = rng.randn(dim).astype(np.float32)
    params, unexpected = TC.load_pvt_v2(params, sd)
    assert unexpected == [], unexpected
    np.testing.assert_allclose(
        np.asarray(params["block1"][0]["attn"]["q"]["kernel"]),
        sd["block1.0.attn.q.weight"].T, rtol=1e-6)
    np.testing.assert_allclose(
        np.asarray(params["block1"][0]["mlp"]["dwconv"]["kernel"]),
        sd["block1.0.mlp.dwconv.dwconv.weight"].transpose(2, 3, 1, 0), rtol=1e-6)
