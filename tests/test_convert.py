"""Checkpoint converter: key translation, surgery math, and merge semantics."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from stgcma_tpu.checkpoint import torch_convert as TC
from stgcma_tpu.configs import (AVQAHeadConfig, AVSHeadConfig, clip_tiny_test,
                                swin_tiny_test)


def test_inflate_patch_embed_matches_reference_math():
    """Swin_AVE.py:1373-1377: w3d = w2d.unsqueeze(2).repeat(pt)/pt;
    audio = mean over RGB of the inflated weight."""
    rng = np.random.RandomState(0)
    w2d = rng.randn(16, 3, 4, 4).astype(np.float32)  # (C,3,4,4) torch conv2d
    out = TC.inflate_patch_embed(w2d, pt=1)
    assert out.shape == (1, 4, 4, 3, 16)  # DHWIO
    np.testing.assert_allclose(out[0], w2d.transpose(2, 3, 1, 0), rtol=1e-6)

    out2 = TC.inflate_patch_embed(w2d, pt=2)
    assert out2.shape == (2, 4, 4, 3, 16)
    np.testing.assert_allclose(np.asarray(out2[0]), w2d.transpose(2, 3, 1, 0) / 2)

    au = TC.audio_patch_embed_from_video(w2d, pt=1)
    assert au.shape == (1, 4, 4, 1, 16)
    np.testing.assert_allclose(au[0, :, :, 0],
                               w2d.mean(axis=1).transpose(1, 2, 0), rtol=1e-6)


def test_translate_swin_backbone_keys():
    rng = np.random.RandomState(1)
    # linear
    [(p, a)] = TC.translate_swin_key("layers.0.blocks.1.attn.qkv.weight",
                                     rng.randn(48, 16))
    assert p == "backbone/layers/0/blocks/1/attn/qkv/kernel"
    assert a.shape == (16, 48)
    # layernorm
    [(p, a)] = TC.translate_swin_key("layers.2.blocks.0.norm1.weight",
                                     rng.randn(64))
    assert p == "backbone/layers/2/blocks/0/norm1/scale"
    # downsample reduction
    [(p, a)] = TC.translate_swin_key("layers.0.downsample.reduction.weight",
                                     rng.randn(32, 64))
    assert p == "backbone/layers/0/downsample/reduction/kernel"
    assert a.shape == (64, 32)
    # bias table passthrough
    [(p, a)] = TC.translate_swin_key(
        "layers.1.blocks.0.attn.temporal_position_bias_table_audio",
        rng.randn(19, 4))
    assert p == "backbone/layers/1/blocks/0/attn/temporal_position_bias_table_audio"
    # gates
    [(p, a)] = TC.translate_swin_key("layers.3.blocks.1.gate_v", rng.randn(1))
    assert p == "backbone/layers/3/blocks/1/gate_v"
    # module. prefix strip + adapter
    [(p, a)] = TC.translate_swin_key(
        "module.layers.0.blocks.0.S_Adapter2.D_fc1.weight", rng.randn(4, 16))
    assert p == "backbone/layers/0/blocks/0/S_Adapter2/D_fc1/kernel"
    # buffers skipped
    assert TC.translate_swin_key("layers.0.blocks.1.attn_mask",
                                 rng.randn(4, 49, 49)) == []
    assert TC.translate_swin_key(
        "layers.0.blocks.0.attn.relative_position_index",
        rng.randn(49, 49)) == []


def test_translate_head_keys():
    rng = np.random.RandomState(2)
    # AVE dual head
    [(p, a)] = TC.translate_swin_key("mlp_head.0.weight", rng.randn(512, 32),
                                     dual_head=True)
    assert p == "mlp_head/fc1/kernel" and a.shape == (32, 512)
    [(p, a)] = TC.translate_swin_key("mlp_head.2.bias", rng.randn(29),
                                     dual_head=True)
    assert p == "mlp_head/fc2/bias"
    # single head
    [(p, a)] = TC.translate_swin_key("mlp_head.0.weight", rng.randn(32),
                                     dual_head=False)
    assert p == "mlp_head/ln/scale"
    # AVS ASPP
    [(p, a)] = TC.translate_swin_key("avstask_conv1.conv2d_list.2.weight",
                                     rng.randn(256, 64, 3, 3))
    assert p == "avstask/conv1/convs/2/kernel" and a.shape == (3, 3, 64, 256)
    # AVS FPN
    [(p, a)] = TC.translate_swin_key(
        "avstask_path3.resConfUnit2.conv1.weight", rng.randn(256, 256, 3, 3))
    assert p == "avstask/path3/resConfUnit2/conv1/kernel"
    # AVS output conv
    [(p, a)] = TC.translate_swin_key("avstask_output_conv.4.weight",
                                     rng.randn(1, 32, 1, 1))
    assert p == "avstask/output_conv/conv4/kernel"
    # TPAVI conv1x1x1 -> linear
    [(p, a)] = TC.translate_swin_key("avstask_tpavi_b1.theta.weight",
                                     rng.randn(128, 256, 1, 1, 1))
    assert p == "avstask/tpavi_b1/theta/kernel" and a.shape == (256, 128)
    # TPAVI W_z bn
    [(p, a)] = TC.translate_swin_key("avstask_tpavi_b2.W_z.1.running_mean",
                                     rng.randn(256))
    assert p == "avstask/tpavi_b2/W_z/bn/mean"
    # AVQA MHA
    [(p, a)] = TC.translate_swin_key("avqatask_attn_a.in_proj_weight",
                                     rng.randn(96, 32))
    assert p == "avqatask/attn_a/in_proj/kernel" and a.shape == (32, 96)
    [(p, a)] = TC.translate_swin_key("avqatask_attn_v.out_proj.weight",
                                     rng.randn(32, 32))
    assert p == "avqatask/attn_v/out_proj/kernel"
    # AVQA LSTM
    [(p, a)] = TC.translate_swin_key(
        "avqatask_question_encoder.lstm.weight_ih_l0", rng.randn(128, 32))
    assert p == "avqatask/question_encoder/lstm/layers/0/w_ih"
    assert a.shape == (32, 128)
    [(p, a)] = TC.translate_swin_key(
        "avqatask_question_encoder.word2vec.weight", rng.randn(93, 32))
    assert p == "avqatask/question_encoder/word2vec" and a.shape == (93, 32)


def test_full_pretrained_load_into_tiny_tree():
    """Build a timm-layout 2D state dict for the tiny config, load it, and check
    every pretrained leaf landed (no unexpected keys, surgery applied)."""
    from stgcma_tpu.models import ave
    cfg = swin_tiny_test(ftmode="fusion")
    params = ave.init_swin_ave(jax.random.PRNGKey(0), cfg)

    rng = np.random.RandomState(3)
    C = cfg.embed_dim
    sd = {
        "patch_embed.proj.weight": rng.randn(C, 3, 4, 4).astype(np.float32),
        "patch_embed.proj.bias": rng.randn(C).astype(np.float32),
        "patch_embed.norm.weight": rng.randn(C).astype(np.float32),
        "patch_embed.norm.bias": rng.randn(C).astype(np.float32),
        "norm.weight": rng.randn(cfg.num_features).astype(np.float32),
        "norm.bias": rng.randn(cfg.num_features).astype(np.float32),
        "head.weight": rng.randn(1000, cfg.num_features).astype(np.float32),
        "head.bias": rng.randn(1000).astype(np.float32),
    }
    for s in range(cfg.num_layers):
        dim = cfg.stage_dim(s)
        for b in range(cfg.depths[s]):
            pre = f"layers.{s}.blocks.{b}"
            sd[f"{pre}.norm1.weight"] = rng.randn(dim).astype(np.float32)
            sd[f"{pre}.norm1.bias"] = rng.randn(dim).astype(np.float32)
            sd[f"{pre}.norm2.weight"] = rng.randn(dim).astype(np.float32)
            sd[f"{pre}.norm2.bias"] = rng.randn(dim).astype(np.float32)
            sd[f"{pre}.attn.qkv.weight"] = rng.randn(3 * dim, dim).astype(np.float32)
            sd[f"{pre}.attn.qkv.bias"] = rng.randn(3 * dim).astype(np.float32)
            sd[f"{pre}.attn.proj.weight"] = rng.randn(dim, dim).astype(np.float32)
            sd[f"{pre}.attn.proj.bias"] = rng.randn(dim).astype(np.float32)
            sd[f"{pre}.attn.relative_position_bias_table"] = \
                rng.randn(169, cfg.num_heads[s]).astype(np.float32)
            sd[f"{pre}.attn.relative_position_index"] = \
                np.zeros((49, 49), np.int64)
            sd[f"{pre}.mlp.fc1.weight"] = rng.randn(4 * dim, dim).astype(np.float32)
            sd[f"{pre}.mlp.fc1.bias"] = rng.randn(4 * dim).astype(np.float32)
            sd[f"{pre}.mlp.fc2.weight"] = rng.randn(dim, 4 * dim).astype(np.float32)
            sd[f"{pre}.mlp.fc2.bias"] = rng.randn(dim).astype(np.float32)
        if s < cfg.num_layers - 1:
            sd[f"layers.{s}.downsample.norm.weight"] = \
                rng.randn(4 * dim).astype(np.float32)
            sd[f"layers.{s}.downsample.norm.bias"] = \
                rng.randn(4 * dim).astype(np.float32)
            sd[f"layers.{s}.downsample.reduction.weight"] = \
                rng.randn(2 * dim, 4 * dim).astype(np.float32)

    params, unexpected = TC.load_pretrained_swin2d(params, sd, cfg)
    assert unexpected == [], unexpected

    # surgery checks
    pe = params["backbone"]["patch_embed"]["proj"]["kernel"]
    np.testing.assert_allclose(
        np.asarray(pe), sd["patch_embed.proj.weight"].transpose(2, 3, 1, 0)[None],
        rtol=1e-6)
    pa = params["backbone"]["patch_embed_audio"]["proj"]["kernel"]
    np.testing.assert_allclose(
        np.asarray(pa[0, :, :, 0]),
        sd["patch_embed.proj.weight"].mean(axis=1).transpose(1, 2, 0), rtol=1e-6)
    # qkv transposed
    q = params["backbone"]["layers"][0]["blocks"][0]["attn"]["qkv"]["kernel"]
    np.testing.assert_allclose(np.asarray(q),
                               sd["layers.0.blocks.0.attn.qkv.weight"].T, rtol=1e-6)
    # adapters untouched (still zero D_fc2)
    d2 = params["backbone"]["layers"][0]["blocks"][0]["S_Adapter"]["D_fc2"]["kernel"]
    assert float(jnp.abs(d2).max()) == 0.0


def test_clip_audio_pos_embed_crop():
    cfg = clip_tiny_test(input_resolution=64, patch_size=16, audio_fdim=64,
                         audio_tdim=48)
    # visual grid 4x4, audio crop dims: f=(64-16)//16+1=4, t=(48-16)//16+1=3
    rng = np.random.RandomState(4)
    pos = rng.randn(17, cfg.embed_dim).astype(np.float32)
    out = TC.derive_clip_audio_pos_embed(pos, cfg)
    assert out.shape == (1 + 4 * 3, cfg.embed_dim)
    np.testing.assert_allclose(out[0], pos[0])
    grid = pos[1:].reshape(4, 4, -1)
    # center crop cols to 3: start 4//2 - 3//2 = 1
    np.testing.assert_allclose(out[1:].reshape(4, 3, -1), grid[:, 1:4], rtol=1e-6)


def test_full_clip_pretrained_load():
    from stgcma_tpu.models import ave
    cfg = clip_tiny_test(ftmode="fusion")
    params = ave.init_clip_ave(jax.random.PRNGKey(0), cfg)
    rng = np.random.RandomState(5)
    d = cfg.embed_dim
    sd = {
        "conv1.weight": rng.randn(d, 3, 16, 16).astype(np.float32),
        "class_embedding": rng.randn(d).astype(np.float32),
        "positional_embedding": rng.randn(cfg.num_patches + 1, d).astype(np.float32),
        "ln_pre.weight": rng.randn(d).astype(np.float32),
        "ln_pre.bias": rng.randn(d).astype(np.float32),
        "ln_post.weight": rng.randn(d).astype(np.float32),
        "ln_post.bias": rng.randn(d).astype(np.float32),
        "proj": rng.randn(d, 512).astype(np.float32),
    }
    for i in range(cfg.layers):
        pre = f"transformer.resblocks.{i}"
        sd[f"{pre}.attn.in_proj_weight"] = rng.randn(3 * d, d).astype(np.float32)
        sd[f"{pre}.attn.in_proj_bias"] = rng.randn(3 * d).astype(np.float32)
        sd[f"{pre}.attn.out_proj.weight"] = rng.randn(d, d).astype(np.float32)
        sd[f"{pre}.attn.out_proj.bias"] = rng.randn(d).astype(np.float32)
        sd[f"{pre}.ln_1.weight"] = rng.randn(d).astype(np.float32)
        sd[f"{pre}.ln_1.bias"] = rng.randn(d).astype(np.float32)
        sd[f"{pre}.ln_2.weight"] = rng.randn(d).astype(np.float32)
        sd[f"{pre}.ln_2.bias"] = rng.randn(d).astype(np.float32)
        sd[f"{pre}.mlp.c_fc.weight"] = rng.randn(4 * d, d).astype(np.float32)
        sd[f"{pre}.mlp.c_fc.bias"] = rng.randn(4 * d).astype(np.float32)
        sd[f"{pre}.mlp.c_proj.weight"] = rng.randn(d, 4 * d).astype(np.float32)
        sd[f"{pre}.mlp.c_proj.bias"] = rng.randn(d).astype(np.float32)

    params, unexpected = TC.load_pretrained_clip(params, sd, cfg)
    assert unexpected == [], unexpected
    conv_a = params["backbone"]["conv1_audio"]["kernel"]
    np.testing.assert_allclose(
        np.asarray(conv_a),
        sd["conv1.weight"].sum(axis=1, keepdims=True).transpose(2, 3, 1, 0),
        rtol=1e-5)


def test_average_params():
    t1 = {"a": jnp.ones((2,)), "b": [jnp.zeros((3,))]}
    t2 = {"a": 3 * jnp.ones((2,)), "b": [2 * jnp.ones((3,))]}
    avg = TC.average_params([t1, t2])
    np.testing.assert_allclose(np.asarray(avg["a"]), 2 * np.ones(2))
    np.testing.assert_allclose(np.asarray(avg["b"][0]), np.ones(3))
