"""Numerical parity of primitive ops against torch CPU — the conversion-risk
surfaces SURVEY.md §7 ranks hardest: packed MHA in_proj, LSTM gate order,
conv layouts, align_corners bilinear, GELU flavor, LayerNorm."""
import numpy as np
import pytest
import torch
import torch.nn.functional as tF

import jax
import jax.numpy as jnp

from stgcma_tpu.ops.attention import mha, qkv_attention, gather_bias
from stgcma_tpu.ops.common import gelu, layernorm, linear, quick_gelu
from stgcma_tpu.ops.conv import conv2d, conv3d
from stgcma_tpu.ops.resize import adaptive_avg_pool, resize_bilinear
from stgcma_tpu.nn.lstm import lstm_apply

RTOL, ATOL = 2e-5, 2e-5


def t2j(t):
    return jnp.asarray(t.detach().numpy())


def test_mha_parity():
    torch.manual_seed(0)
    d, h, B, N = 64, 4, 3, 11
    m = torch.nn.MultiheadAttention(d, h)  # seq-first
    q = torch.randn(1, B, d)
    kv = torch.randn(N, B, d)
    out_t, _ = m(q, kv, kv, need_weights=False)
    p = {"in_proj": {"kernel": t2j(m.in_proj_weight).T, "bias": t2j(m.in_proj_bias)},
         "out_proj": {"kernel": t2j(m.out_proj.weight).T, "bias": t2j(m.out_proj.bias)}}
    # ours is batch-first
    out_j = mha(p, t2j(q.transpose(0, 1)), t2j(kv.transpose(0, 1)),
                t2j(kv.transpose(0, 1)), h)
    np.testing.assert_allclose(np.asarray(out_j), out_t.transpose(0, 1).detach().numpy(),
                               rtol=RTOL, atol=ATOL)


def test_lstm_parity():
    torch.manual_seed(1)
    in_sz, H, L, B, T = 24, 32, 1, 4, 14
    m = torch.nn.LSTM(in_sz, H, L)
    x = torch.randn(T, B, in_sz)
    out_t, (h_t, c_t) = m(x)
    params = {"layers": [{
        "w_ih": t2j(m.weight_ih_l0).T, "w_hh": t2j(m.weight_hh_l0).T,
        "b_ih": t2j(m.bias_ih_l0), "b_hh": t2j(m.bias_hh_l0)}]}
    out_j, (h_j, c_j) = lstm_apply(params, t2j(x), H)
    np.testing.assert_allclose(np.asarray(out_j), out_t.detach().numpy(), rtol=RTOL, atol=ATOL)
    np.testing.assert_allclose(np.asarray(h_j), h_t.detach().numpy(), rtol=RTOL, atol=ATOL)
    np.testing.assert_allclose(np.asarray(c_j), c_t.detach().numpy(), rtol=RTOL, atol=ATOL)


@pytest.mark.parametrize("dilation", [1, 3])
def test_conv2d_parity(dilation):
    torch.manual_seed(2)
    w = torch.randn(8, 5, 3, 3)
    b = torch.randn(8)
    x = torch.randn(2, 5, 14, 14)
    out_t = tF.conv2d(x, w, b, padding=dilation, dilation=dilation)
    p = {"kernel": t2j(w.permute(2, 3, 1, 0)), "bias": t2j(b)}
    out_j = conv2d(p, t2j(x.permute(0, 2, 3, 1)), padding=dilation, dilation=dilation)
    np.testing.assert_allclose(np.asarray(out_j), out_t.permute(0, 2, 3, 1).numpy(),
                               rtol=1e-4, atol=1e-4)


def test_conv3d_patchembed_parity():
    torch.manual_seed(3)
    w = torch.randn(16, 3, 1, 4, 4)
    b = torch.randn(16)
    x = torch.randn(2, 3, 4, 16, 16)  # B C T H W
    out_t = tF.conv3d(x, w, b, stride=(1, 4, 4))
    p = {"kernel": t2j(w.permute(2, 3, 4, 1, 0)), "bias": t2j(b)}
    out_j = conv3d(p, t2j(x.permute(0, 2, 3, 4, 1)), stride=(1, 4, 4))
    np.testing.assert_allclose(np.asarray(out_j),
                               out_t.permute(0, 2, 3, 4, 1).numpy(),
                               rtol=1e-4, atol=1e-4)


@pytest.mark.parametrize("align", [True, False])
@pytest.mark.parametrize("size", [(28, 28), (17, 23), (7, 7)])
def test_bilinear_parity(align, size):
    torch.manual_seed(4)
    x = torch.randn(2, 6, 14, 14)
    out_t = tF.interpolate(x, size=size, mode="bilinear", align_corners=align)
    out_j = resize_bilinear(t2j(x.permute(0, 2, 3, 1)), size[0], size[1],
                            align_corners=align)
    np.testing.assert_allclose(np.asarray(out_j), out_t.permute(0, 2, 3, 1).numpy(),
                               rtol=1e-5, atol=1e-5)


def test_adaptive_avgpool_parity():
    x = torch.randn(3, 5, 14, 14)
    out_t = torch.nn.AdaptiveAvgPool2d((7, 7))(x)
    out_j = adaptive_avg_pool(t2j(x.permute(0, 2, 3, 1)), 7, 7)
    np.testing.assert_allclose(np.asarray(out_j), out_t.permute(0, 2, 3, 1).numpy(),
                               rtol=1e-5, atol=1e-5)
    out_t1 = torch.nn.AdaptiveAvgPool2d((1, 1))(x)
    out_j1 = adaptive_avg_pool(t2j(x.permute(0, 2, 3, 1)), 1, 1)
    np.testing.assert_allclose(np.asarray(out_j1), out_t1.permute(0, 2, 3, 1).numpy(),
                               rtol=1e-5, atol=1e-5)


def test_gelu_layernorm_parity():
    x = torch.randn(4, 33)
    np.testing.assert_allclose(np.asarray(gelu(t2j(x))), tF.gelu(x).numpy(),
                               rtol=1e-6, atol=1e-6)
    qg = x * torch.sigmoid(1.702 * x)
    np.testing.assert_allclose(np.asarray(quick_gelu(t2j(x))), qg.numpy(),
                               rtol=1e-6, atol=1e-6)
    ln = torch.nn.LayerNorm(33)
    torch.nn.init.normal_(ln.weight)
    torch.nn.init.normal_(ln.bias)
    p = {"scale": t2j(ln.weight), "bias": t2j(ln.bias)}
    np.testing.assert_allclose(np.asarray(layernorm(p, t2j(x))),
                               ln(x).detach().numpy(), rtol=1e-5, atol=1e-5)


def test_window_attention_parity():
    """qkv_attention (packed qkv + rel-pos bias + window mask) vs a direct torch
    evaluation of the same attention math (Swin W-MSA semantics)."""
    torch.manual_seed(5)
    d, h, N, nW, B = 32, 4, 9, 4, 2
    B_ = nW * B
    qkv_w = torch.randn(3 * d, d) * 0.05
    qkv_b = torch.randn(3 * d) * 0.05
    proj_w = torch.randn(d, d) * 0.05
    proj_b = torch.randn(d) * 0.05
    table = torch.randn(25, h) * 0.02  # (2*3-1)^2 for ws=3
    x = torch.randn(B_, N, d)
    mask = torch.where(torch.rand(nW, N, N) > 0.5, 0.0, -100.0)

    # torch oracle
    qkv = (x @ qkv_w.T + qkv_b).reshape(B_, N, 3, h, d // h).permute(2, 0, 3, 1, 4)
    q, k, v = qkv[0] * (d // h) ** -0.5, qkv[1], qkv[2]
    attn = q @ k.transpose(-2, -1)
    import stgcma_tpu.ops.window as W
    rel = torch.from_numpy(W.relative_position_index(3)).long()
    bias = table[rel.reshape(-1)].reshape(N, N, h).permute(2, 0, 1)
    attn = attn + bias.unsqueeze(0)
    attn = attn.view(B, nW, h, N, N) + mask.unsqueeze(1).unsqueeze(0)
    attn = attn.view(B_, h, N, N).softmax(-1)
    out_t = ((attn @ v).transpose(1, 2).reshape(B_, N, d) @ proj_w.T + proj_b)

    p = {"qkv": {"kernel": t2j(qkv_w).T, "bias": t2j(qkv_b)},
         "proj": {"kernel": t2j(proj_w).T, "bias": t2j(proj_b)},
         "relative_position_bias_table": t2j(table)}
    from stgcma_tpu.ops.attention import window_attention
    out_j = window_attention(p, t2j(x), h, jnp.asarray(W.relative_position_index(3)),
                             mask=t2j(mask))
    np.testing.assert_allclose(np.asarray(out_j), out_t.numpy(), rtol=2e-5, atol=2e-5)
