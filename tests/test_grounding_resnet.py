"""ResNet18 feature extractor + grounding-gen head: torch parity of the basic
block, output geometry (stride-1 layer4 -> 14x14), converter round trip,
grounding loss sanity and AVQA splice."""
import numpy as np
import jax
import jax.numpy as jnp
import torch
import torch.nn.functional as tF

from stgcma_tpu.checkpoint import torch_convert as TC
from stgcma_tpu.nn.resnet import resnet18_features, resnet18_init
from stgcma_tpu.tools import grounding_gen as GG


def t2j(t):
    return jnp.asarray(t.detach().numpy())


def test_basic_block_matches_torch():
    torch.manual_seed(0)
    cin, cout = 8, 16
    w1 = torch.randn(cout, cin, 3, 3) * 0.1
    w2 = torch.randn(cout, cout, 3, 3) * 0.1
    wd = torch.randn(cout, cin, 1, 1) * 0.1
    bn = lambda c: (torch.randn(c).abs() + 0.5, torch.randn(c) * 0.1,
                    torch.randn(c) * 0.1, torch.randn(c).abs() + 0.5)
    g1, b1, m1, v1 = bn(cout)
    g2, b2, m2, v2 = bn(cout)
    g3, b3, m3, v3 = bn(cout)
    x = torch.randn(2, cin, 14, 14)

    def tbn(x, g, b, m, v):
        return tF.batch_norm(x, m, v, g, b, training=False)

    y = tF.conv2d(x, w1, stride=2, padding=1)
    y = tF.relu(tbn(y, g1, b1, m1, v1))
    y = tF.conv2d(y, w2, padding=1)
    y = tbn(y, g2, b2, m2, v2)
    idn = tbn(tF.conv2d(x, wd, stride=2), g3, b3, m3, v3)
    ref = tF.relu(y + idn).permute(0, 2, 3, 1).numpy()

    p = {"conv1": {"kernel": t2j(w1.permute(2, 3, 1, 0))},
         "bn1": {"scale": t2j(g1), "bias": t2j(b1), "mean": t2j(m1), "var": t2j(v1)},
         "conv2": {"kernel": t2j(w2.permute(2, 3, 1, 0))},
         "bn2": {"scale": t2j(g2), "bias": t2j(b2), "mean": t2j(m2), "var": t2j(v2)},
         "downsample": {"conv": {"kernel": t2j(wd.permute(2, 3, 1, 0))},
                        "bn": {"scale": t2j(g3), "bias": t2j(b3),
                               "mean": t2j(m3), "var": t2j(v3)}}}
    from stgcma_tpu.nn.resnet import _basic_block
    out = _basic_block(p, t2j(x.permute(0, 2, 3, 1)), stride=2)
    np.testing.assert_allclose(np.asarray(out), ref, rtol=1e-4, atol=1e-4)


def test_resnet_geometry_and_converter():
    params = resnet18_init(jax.random.PRNGKey(0))
    x = jnp.zeros((1, 224, 224, 3))
    feats = resnet18_features(params, x)
    assert feats.shape == (1, 14, 14, 512)  # stride-1 layer4 (visual_net.py:151)

    # converter round trip on a synthetic torchvision-layout state dict
    rng = np.random.RandomState(0)
    sd = {"conv1.weight": rng.randn(64, 3, 7, 7).astype(np.float32)}
    for s in ("weight", "bias", "running_mean", "running_var"):
        sd[f"bn1.{s}"] = rng.rand(64).astype(np.float32)
    sd["bn1.num_batches_tracked"] = np.array(1)
    widths = [64, 128, 256, 512]
    for li, w in enumerate(widths, start=1):
        cin = widths[li - 2] if li > 1 else 64
        for b in range(2):
            base = f"layer{li}.{b}"
            c_in = cin if b == 0 else w
            sd[f"{base}.conv1.weight"] = rng.randn(w, c_in, 3, 3).astype(np.float32)
            sd[f"{base}.conv2.weight"] = rng.randn(w, w, 3, 3).astype(np.float32)
            for mod in ("bn1", "bn2"):
                for s in ("weight", "bias", "running_mean", "running_var"):
                    sd[f"{base}.{mod}.{s}"] = rng.rand(w).astype(np.float32)
            if b == 0 and li > 1:
                sd[f"{base}.downsample.0.weight"] = \
                    rng.randn(w, c_in, 1, 1).astype(np.float32)
                for s in ("weight", "bias", "running_mean", "running_var"):
                    sd[f"{base}.downsample.1.{s}"] = rng.rand(w).astype(np.float32)
    sd["fc.weight"] = rng.randn(1000, 512).astype(np.float32)
    sd["fc.bias"] = rng.randn(1000).astype(np.float32)
    params, unexpected = TC.load_resnet18(params, sd)
    assert unexpected == [], unexpected
    np.testing.assert_allclose(
        np.asarray(params["conv1"]["kernel"]),
        sd["conv1.weight"].transpose(2, 3, 1, 0), rtol=1e-6)


def test_grounding_head_and_splice():
    p = GG.init_grounding(jax.random.PRNGKey(0))
    B, T = 1, 2
    audio = jnp.asarray(np.random.RandomState(0).randn(B, T, 128), jnp.float32)
    frames = jnp.asarray(np.random.RandomState(1).randn(B, T, 224, 224, 3),
                         jnp.float32)
    out, attn = GG.apply_grounding(p, audio, frames, return_attention=True)
    assert out.shape == (B * T, 2)
    assert attn.shape == (B * T, 196)
    np.testing.assert_allclose(np.asarray(attn.sum(-1)), 1.0, rtol=1e-4)

    loss = GG.grounding_loss(p, audio, frames, frames + 0.1)
    assert np.isfinite(float(loss))

    # splice: same-shaped heads (fc2/fc3/fc4) move into AVQA tree
    from stgcma_tpu.configs import AVQAHeadConfig, swin_tiny_test
    from stgcma_tpu.models import avqa
    cfg = swin_tiny_test(ftmode="fusion")
    hcfg = AVQAHeadConfig(feat_dim=cfg.num_features)
    ap = avqa.init_avqa(jax.random.PRNGKey(1), cfg, hcfg)
    ap2 = GG.splice_into_avqa(ap, p)
    np.testing.assert_allclose(np.asarray(ap2["avqatask"]["fc2"]["kernel"]),
                               np.asarray(p["fc2"]["kernel"]))
