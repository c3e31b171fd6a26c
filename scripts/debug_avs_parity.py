"""Bisect the AVS parity mismatch: compare per-stage intermediates between the
reference torch model and the JAX rebuild."""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tests", "ref_shims"))
sys.path.insert(0, "/root/reference")
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np
import torch

from tests.test_ref_model_parity import randomize_state_dict

from AVS.model.Swin_AVSModel import SwinTransformer2D_Adapter_AVS

import jax
import jax.numpy as jnp
from stgcma_tpu.checkpoint.torch_convert import load_reference_swin
from stgcma_tpu.configs import AVSHeadConfig, SwinConfig
from stgcma_tpu.models import avs
from stgcma_tpu.nn import swin, tpavi as tpavi_mod
from stgcma_tpu.nn.decoder import aspp_apply, ffb_apply, output_conv_apply
from stgcma_tpu.ops.common import linear

cfg = SwinConfig(embed_dim=192, depths=(1, 1, 1, 1), num_heads=(2, 4, 8, 16),
                 img_size=224, num_frames=5, ftmode="fusion",
                 adapter_ratios=(0.25, 0.25, 0.25, 0.25))
hcfg = AVSHeadConfig()
ref = SwinTransformer2D_Adapter_AVS(
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

caps = {}


def hook(name):
    def f(mod, inp, out):
        caps[name] = (tuple(x.detach() for x in inp if torch.is_tensor(x)),
                      out.detach() if torch.is_tensor(out) else out)
    return f


for nm in ["avstask_audio_linear", "avstask_x1_linear", "avstask_x4_linear",
           "avstask_conv1", "avstask_conv4", "avstask_tpavi_b1",
           "avstask_tpavi_b4", "avstask_path4", "avstask_path3",
           "avstask_path1", "avstask_output_conv"]:
    getattr(ref, nm).register_forward_hook(hook(nm))

with torch.no_grad():
    pred_ref, fmaps_ref, afea_ref = ref(a_t, v_t, "fusion")

params = avs.init_avs(jax.random.PRNGKey(0), cfg, hcfg)
params, unexpected = load_reference_swin(params, sd)
assert unexpected == [], unexpected[:8]

v_j = jnp.asarray(np.transpose(v_t.numpy(), (0, 1, 3, 4, 2)))
a_j = jnp.asarray(a_t.numpy())

# ---- re-run apply_avs stepwise -------------------------------------------
feats = swin.backbone_apply(params["backbone"], cfg, a=a_j, v=v_j,
                            collect_multiscale=True)
hp = params["avstask"]
Bj, Tj = feats["B"], feats["T"]


def cmp(name, t, j, tr=None):
    t = np.asarray(t, np.float32)
    j = np.asarray(j, np.float32)
    if tr is not None:
        j = np.transpose(j, tr)
    d = float(np.max(np.abs(t - j))) if t.shape == j.shape else f"SHAPE {t.shape} vs {j.shape}"
    print(f"{name:35s} {d}")


a_pool = feats["a"].mean(axis=1).reshape(Bj, Tj, -1)
cmp("audio pooled (pre audio_linear)", caps["avstask_audio_linear"][0][0], a_pool)
audio_feature = linear(hp["audio_linear"], a_pool)
cmp("audio_feature", caps["avstask_audio_linear"][1], audio_feature)

# multi-scale taps: compare x1_linear/x4_linear inputs
tap0 = feats["multi_scale"][0].reshape(-1, 56, 56, feats["multi_scale"][0].shape[-1])
cmp("tap0 (pre x1_linear)", caps["avstask_x1_linear"][0][0],
    tap0.reshape(caps["avstask_x1_linear"][0][0].shape))
tap3 = feats["multi_scale"][3].reshape(-1, 7, 7, feats["multi_scale"][3].shape[-1])
cmp("tap3 (pre x4_linear)", caps["avstask_x4_linear"][0][0],
    tap3.reshape(caps["avstask_x4_linear"][0][0].shape))

x1 = linear(hp["x1_linear"], tap0)
cmp("conv1 in (x1)", caps["avstask_conv1"][0][0], x1, tr=(0, 3, 1, 2))
c1 = aspp_apply(hp["conv1"], x1)
cmp("conv1 out", caps["avstask_conv1"][1], c1, tr=(0, 3, 1, 2))
x4 = linear(hp["x4_linear"], tap3)
c4 = aspp_apply(hp["conv4"], x4)
cmp("conv4 out", caps["avstask_conv4"][1], c4, tr=(0, 3, 1, 2))

# TPAVI stage 0 with MY pipeline input
fm = c1
BT, H, W, C = fm.shape
z, a_fea, _ = tpavi_mod.tpavi_apply(hp["tpavi_b1"], fm.reshape(Bj, Tj, H, W, C),
                                    audio_feature, train=False)
ref_z1 = caps["avstask_tpavi_b1"][1][0] if isinstance(caps["avstask_tpavi_b1"][1], tuple) else caps["avstask_tpavi_b1"][1]
cmp("tpavi_b1 out z (my input)", ref_z1, z.reshape(BT, H, W, C), tr=(0, 3, 1, 2))

# TPAVI stage 0 with REFERENCE-captured input (isolates wiring vs weights)
rin = caps["avstask_tpavi_b1"][0]       # (x [B,C,T,H,W], audio [B,T,128])
x_ref_in = np.transpose(rin[0].numpy(), (0, 2, 3, 4, 1))   # (B,T,H,W,C)
au_ref_in = rin[1].numpy()
z2, a2, _ = tpavi_mod.tpavi_apply(hp["tpavi_b1"], jnp.asarray(x_ref_in),
                                  jnp.asarray(au_ref_in), train=False)
cmp("tpavi_b1 out z (ref input)", ref_z1,
    np.asarray(z2).reshape(BT, H, W, C), tr=(0, 3, 1, 2))
cmp("tpavi_b1 in x (mine vs ref)", rin[0],
    np.asarray(fm.reshape(Bj, Tj, H, W, C)).transpose(0, 4, 1, 2, 3))
cmp("tpavi_b1 in audio", rin[1], audio_feature)

# full head for paths
pred, fmaps, afea = avs.apply_avs(params, cfg, hcfg, a_j, v_j)
for i in range(4):
    cmp(f"fmap{i} (post tpavi)", fmaps_ref[i], fmaps[i], tr=(0, 3, 1, 2))
p4_ref = caps["avstask_path4"][1]
cmp("path4 out", p4_ref,
    ffb_apply(hp["path4"], fmaps[3]), tr=(0, 3, 1, 2))
cmp("pred", pred_ref[:, 0], np.asarray(pred)[..., 0])
print("done")
