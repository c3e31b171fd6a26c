"""TRAIN-STEP parity against the ACTUAL reference implementation.

The inference parity suite (test_ref_model_parity.py) pins forward tensors;
this file pins the TRAINING path end-to-end: same randomized weights + same
batch -> same loss VALUE and same GRADIENTS (selected leaves on every
component: adapters, fusion gates, task heads), with train-mode semantics —
in particular the AVS TPAVI BatchNorm runs on batch statistics and its
running-stat momentum updates must match torch buffer semantics.

Loss composition mirrors the reference train loops exactly:
  AVE : CE on per-second logits, labels rearranged 'b t c -> (b t) c'
        (AVE/traintest_adapt_ave29.py:110-114,149-163)
  AVQA: CE(out_qa) + 0.5 * CE(batch_organize(posi, nega))
        (AVQA/traintest_adapt_avqa.py:16-30,172-179)
  AVS : IouSemanticAwareLoss(lambda_1=0, sa_loss_flag=False)
        (AVS/traintest_adapt_avs.py:161-167)

Reference dropout probabilities are zeroed after .train() for determinism
(drop_path/drop_rate already default to 0; the AVQA QA-head MHA dropout=0.1
is the only live one). Our matching train-time dropout is asserted
statistically in test_avqa_head_dropout below.
"""
import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax
import jax.numpy as jnp

from stgcma_tpu.checkpoint.torch_convert import load_reference_swin
from stgcma_tpu.configs import AVQAHeadConfig, AVSHeadConfig, SwinConfig
from stgcma_tpu.models import ave, avqa, avs
from stgcma_tpu.train import losses

from test_ref_model_parity import (TINY, _import_ref, randomize_state_dict,
                                   pytestmark)  # noqa: F401  (skip-if guard)


def _zero_dropout(model):
    for m in model.modules():
        if isinstance(m, torch.nn.Dropout):
            m.p = 0.0
        if isinstance(m, torch.nn.MultiheadAttention):
            m.dropout = 0.0


def _torch_grads(model):
    return {n: p.grad.detach().numpy() for n, p in model.named_parameters()
            if p.grad is not None}


def _close(ref, got, what, rtol=2e-3, atol=2e-6):
    ref = np.asarray(ref, np.float32)
    got = np.asarray(got, np.float32)
    assert ref.shape == got.shape, f"{what}: {ref.shape} vs {got.shape}"
    assert np.abs(ref).max() > 0, f"{what}: reference grad is exactly 0"
    np.testing.assert_allclose(got, ref, rtol=rtol, atol=atol, err_msg=what)


# ---------------------------------------------------------------------------
# AVE Swin: CE loss + grads
# ---------------------------------------------------------------------------

def test_ave_swin_train_step_parity():
    mod = _import_ref("AVE.model.Swin_AVE")
    cfg = SwinConfig(label_dim=7, ftmode="fusion", **TINY)
    ref = mod.SwinTransformer2D_Adapter_New(
        label_dim=7, pretrained=None, img_size=cfg.img_size,
        embed_dim=cfg.embed_dim, depths=list(cfg.depths),
        num_heads=list(cfg.num_heads), num_frames=cfg.num_frames,
        window_size=cfg.window_size, drop_path_rate=0.0, ftmode="fusion",
        adapter_mlp_ratio=list(cfg.adapter_ratios))
    sd = randomize_state_dict(ref, seed=11)
    ref.layers_audio = ref.layers  # latent reference alias (see inference test)
    ref.train()
    _zero_dropout(ref)

    B, T, S = 1, cfg.num_frames, cfg.img_size
    rng = np.random.default_rng(11)
    v_np = rng.standard_normal((B, 3, T, S, S)).astype(np.float32)
    a_np = rng.standard_normal((B, T, S, S)).astype(np.float32)
    lab_np = np.eye(7, dtype=np.float32)[rng.integers(0, 7, (B, T))]

    v_t = torch.from_numpy(v_np).requires_grad_(False)
    a_t = torch.from_numpy(a_np)
    out = ref(a_t, v_t, "fusion")
    loss_t = torch.nn.CrossEntropyLoss()(
        out, torch.from_numpy(lab_np.reshape(-1, 7)))
    loss_t.backward()
    g_ref = _torch_grads(ref)

    params = ave.init_swin_ave(jax.random.PRNGKey(0), cfg)
    params, unexpected = load_reference_swin(params, sd, dual_head=True)
    assert unexpected == []
    v_j = jnp.asarray(np.transpose(v_np, (0, 2, 3, 4, 1)))
    a_j = jnp.asarray(a_np)
    lab_j = jnp.asarray(lab_np)

    def loss_fn(p):
        return losses.ave_loss(ave.apply_swin_ave(p, cfg, a_j, v_j), lab_j)

    loss_j, grads = jax.value_and_grad(loss_fn)(params)
    np.testing.assert_allclose(float(loss_j), float(loss_t), rtol=1e-4)

    for s, b in ((0, 0), (0, 1), (1, 0), (1, 1)):
        blk = grads["backbone"]["layers"][s]["blocks"][b]
        _close(g_ref[f"layers.{s}.blocks.{b}.gate_v"], blk["gate_v"],
               f"gate_v[{s}][{b}]")
        _close(g_ref[f"layers.{s}.blocks.{b}.gate_a"], blk["gate_a"],
               f"gate_a[{s}][{b}]")
    _close(g_ref["layers.0.blocks.0.S_Adapter.D_fc2.weight"],
           np.asarray(grads["backbone"]["layers"][0]["blocks"][0]
                      ["S_Adapter"]["D_fc2"]["kernel"]).T,
           "S_Adapter.D_fc2")
    _close(g_ref["layers.0.blocks.0.T_Adapter_Audio.D_fc1.weight"],
           np.asarray(grads["backbone"]["layers"][0]["blocks"][0]
                      ["T_Adapter_Audio"]["D_fc1"]["kernel"]).T,
           "T_Adapter_Audio.D_fc1")
    # mlp_head final Linear (fusion head is Sequential(Linear, ReLU, Linear))
    head_w = next(v for k, v in g_ref.items()
                  if k.startswith("mlp_head") and v.shape == (7, 512))
    _close(head_w, np.asarray(grads["mlp_head"]["fc2"]["kernel"]).T,
           "mlp_head final linear")
    _close(g_ref["patch_embed_audio.proj.weight"],
           np.transpose(np.asarray(
               grads["backbone"]["patch_embed_audio"]["proj"]["kernel"]),
               (4, 3, 0, 1, 2)),
           "patch_embed_audio.proj", rtol=5e-3)


# ---------------------------------------------------------------------------
# AVQA: combined qa+match CE + grads
# ---------------------------------------------------------------------------

def test_avqa_train_step_parity():
    mod = _import_ref("AVQA.model.Swin_AVQAModel_V1")
    cfg = SwinConfig(embed_dim=768, depths=(1, 1), num_heads=(4, 8),
                     img_size=56, num_frames=2, ftmode="fusion",
                     adapter_ratios=(0.25, 0.25), with_nega_stream=True)
    hcfg = AVQAHeadConfig(num_frames=2)
    ref = mod.SwinTransformer2D_Adapter_AVQA(
        grounding_pretrained=None, pretrained=None, img_size=56, embed_dim=768,
        depths=[1, 1], num_heads=[4, 8], num_frames=2, window_size=7,
        drop_path_rate=0.0, ftmode="fusion", adapter_mlp_ratio=[0.25, 0.25])
    sd = randomize_state_dict(ref, seed=12)
    ref.train()
    _zero_dropout(ref)

    B, T = 1, 2
    rng = np.random.default_rng(12)
    v_np = rng.standard_normal((B, T, 3, 56, 56)).astype(np.float32)
    vn_np = rng.standard_normal((B, T, 3, 56, 56)).astype(np.float32)
    a_np = rng.standard_normal((B, T, 56, 56)).astype(np.float32)
    q_np = rng.integers(0, 93, (B, 14)).astype(np.int64)
    ans_np = rng.integers(0, 42, (B,)).astype(np.int64)

    qa, posi, nega = ref(torch.from_numpy(a_np), torch.from_numpy(v_np),
                         torch.from_numpy(vn_np), torch.from_numpy(q_np),
                         "fusion")
    # batch_organize (AVQA/traintest_adapt_avqa.py:16-30): interleave rows
    n = posi.shape[0]
    out_match = torch.zeros(2 * n, posi.shape[1])
    out_match[0::2] = posi
    out_match[1::2] = nega
    match_label = torch.tensor([1, 0] * n, dtype=torch.long)
    ce = torch.nn.CrossEntropyLoss()
    loss_t = ce(qa, torch.from_numpy(ans_np)) + 0.5 * ce(out_match, match_label)
    loss_t.backward()
    g_ref = _torch_grads(ref)

    params = avqa.init_avqa(jax.random.PRNGKey(0), cfg, hcfg)
    params, unexpected = load_reference_swin(params, sd)
    assert unexpected == []

    v_j = jnp.asarray(np.transpose(v_np, (0, 1, 3, 4, 2)))
    vn_j = jnp.asarray(np.transpose(vn_np, (0, 1, 3, 4, 2)))
    a_j = jnp.asarray(a_np)
    q_j = jnp.asarray(q_np)
    ans_j = jnp.asarray(ans_np)

    def loss_fn(p):
        out_qa, m_pos, m_neg = avqa.apply_avqa(p, cfg, hcfg, a_j, v_j, vn_j, q_j)
        total, _ = losses.avqa_loss(out_qa, m_pos, m_neg, ans_j)
        return total

    loss_j, grads = jax.value_and_grad(loss_fn)(params)
    np.testing.assert_allclose(float(loss_j), float(loss_t), rtol=1e-4)

    hp = grads["avqatask"]
    _close(g_ref["avqatask_fc_ans.weight"],
           np.asarray(hp["fc_ans"]["kernel"]).T, "fc_ans")
    _close(g_ref["avqatask_fc_fusion.weight"],
           np.asarray(hp["fc_fusion"]["kernel"]).T, "fc_fusion")
    _close(g_ref["avqatask_fc_gl.weight"],
           np.asarray(hp["fc_gl"]["kernel"]).T, "fc_gl (grounding)")
    _close(g_ref["avqatask_fc4.weight"],
           np.asarray(hp["fc4"]["kernel"]).T, "fc4 (match head)")
    blk = grads["backbone"]["layers"][0]["blocks"][0]
    _close(g_ref["layers.0.blocks.0.gate_v"], blk["gate_v"], "gate_v")
    # the question path: word embedding + LSTM input kernel
    _close(g_ref["avqatask_question_encoder.word2vec.weight"],
           np.asarray(hp["question_encoder"]["word2vec"]), "word2vec",
           rtol=5e-3)


# ---------------------------------------------------------------------------
# AVS: IoU-BCE loss + grads + TPAVI BatchNorm train semantics
# ---------------------------------------------------------------------------

def test_avs_train_step_parity(monkeypatch):
    # AVS/loss.py:18 hardcodes .cuda() on the frame-0 index tensor; torch here
    # is CPU-only, so neutralize the device move (same as test_avs_loss_parity)
    monkeypatch.setattr(torch.Tensor, "cuda", lambda self, *a, **k: self)
    mod = _import_ref("AVS.model.Swin_AVSModel")
    loss_mod = _import_ref("AVS.loss")
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
    sd = randomize_state_dict(ref, seed=13)
    # state_dict() tensors ALIAS module storage — the train-mode forward below
    # updates BN buffers in place, so clone the pre-step state for conversion
    sd = {k: v.clone() for k, v in sd.items()}
    ref.train()  # TPAVI W_z BatchNorm3d runs on batch stats + updates buffers
    _zero_dropout(ref)

    B, T = 1, 5
    rng = np.random.default_rng(13)
    v_np = rng.standard_normal((B, T, 3, 224, 224)).astype(np.float32)
    a_np = rng.standard_normal((B, T, 224, 224)).astype(np.float32)
    mask_np = (rng.random((B, 224, 224)) > 0.5).astype(np.float32)

    pred, fmaps, afeas = ref(torch.from_numpy(a_np), torch.from_numpy(v_np),
                             "fusion")
    mask_t = torch.from_numpy(mask_np).unsqueeze(1).unsqueeze(1)
    loss_t, loss_dict = loss_mod.IouSemanticAwareLoss(
        pred, mask_t, afeas, fmaps, lambda_1=0, count_stages=[],
        sa_loss_flag=False, mask_pooling_type="avg")
    loss_t.backward()
    g_ref = _torch_grads(ref)
    sd_after = ref.state_dict()

    params = avs.init_avs(jax.random.PRNGKey(0), cfg, hcfg)
    params, unexpected = load_reference_swin(params, sd)
    assert unexpected == []

    v_j = jnp.asarray(np.transpose(v_np, (0, 1, 3, 4, 2)))
    a_j = jnp.asarray(a_np)
    mask_j = jnp.asarray(mask_np)[..., None]  # (B, H, W, 1)

    def loss_fn(p):
        pred_j, _, _, bn_state = avs.apply_avs(p, cfg, hcfg, a_j, v_j,
                                               train=True, return_state=True)
        total, _ = losses.iou_semantic_aware_loss(pred_j, mask_j)
        return total, bn_state

    (loss_j, bn_state), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
    np.testing.assert_allclose(float(loss_j), float(loss_t), rtol=1e-4)

    hp = grads["avstask"]
    _close(g_ref["avstask_x1_linear.weight"],
           np.asarray(hp["x1_linear"]["kernel"]).T, "x1_linear")
    _close(g_ref["avstask_x4_linear.weight"],
           np.asarray(hp["x4_linear"]["kernel"]).T, "x4_linear")
    _close(g_ref["avstask_audio_linear.weight"],
           np.asarray(hp["audio_linear"]["kernel"]).T, "audio_linear",
           rtol=5e-3)
    blk = grads["backbone"]["layers"][2]["blocks"][0]
    _close(g_ref["layers.2.blocks.0.gate_v"], blk["gate_v"], "gate_v stage2")

    # TPAVI W_z BatchNorm running stats after ONE train-mode forward must
    # match torch buffer semantics (momentum 0.1, unbiased var for the
    # running update — AVS/model/TPAVI.py:57-63)
    for i in (1, 4):
        key = None
        for cand in (f"avstask_tpavi_b{i}.W_z.1.running_mean",
                     f"avstask_tpavi_b{i}.W_z[1].running_mean"):
            if cand in sd_after:
                key = cand
                break
        assert key is not None, [k for k in sd_after if f"tpavi_b{i}" in k][:6]
        ours = bn_state[f"tpavi_b{i}"]
        _close(sd_after[key].numpy(), ours["mean"],
               f"tpavi_b{i} BN running_mean", rtol=1e-3, atol=1e-6)
        _close(sd_after[key.replace("running_mean", "running_var")].numpy(),
               ours["var"], f"tpavi_b{i} BN running_var", rtol=1e-3, atol=1e-6)


# ---------------------------------------------------------------------------
# our AVQA QA-head train-time dropout (reference MHA dropout=0.1) — the
# torch side is zeroed above for determinism, so pin ours statistically
# ---------------------------------------------------------------------------

def test_avqa_head_dropout():
    cfg = SwinConfig(label_dim=7, ftmode="fusion", img_size=56, embed_dim=16,
                     depths=(1,), num_heads=(2,), num_frames=2,
                     adapter_ratios=(0.25,), with_nega_stream=True)
    hcfg = AVQAHeadConfig(feat_dim=16, qst_word_embed=16, qst_hidden=16,
                          attn_heads=2, num_frames=2, grid=14)
    params = avqa.init_avqa(jax.random.PRNGKey(1), cfg, hcfg)
    rng = np.random.default_rng(7)
    a = jnp.asarray(rng.standard_normal((1, 2, 56, 56)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((1, 2, 56, 56, 3)), jnp.float32)
    q = jnp.asarray(rng.integers(0, 93, (1, 14)))

    eval_out = avqa.apply_avqa(params, cfg, hcfg, a, v, v, q)[0]
    # eval path ignores dropout entirely (no rng)
    again = avqa.apply_avqa(params, cfg, hcfg, a, v, v, q, train=True)[0]
    np.testing.assert_array_equal(np.asarray(eval_out), np.asarray(again))
    # train path with an rng drops attention weights. The tiny geometry has
    # only 2 heads x 1 query x 2 keys per attention, so a single key often
    # keeps everything (p=0.9^8≈0.43) — scan a few fixed keys (deterministic:
    # jax PRNG is stable) and require at least one to differ from eval.
    outs = [avqa.apply_avqa(params, cfg, hcfg, a, v, v, q, train=True,
                            dropout_rng=jax.random.PRNGKey(s))[0]
            for s in range(8)]
    assert any(not np.allclose(np.asarray(o), np.asarray(eval_out))
               for o in outs), "dropout never altered the QA output"
