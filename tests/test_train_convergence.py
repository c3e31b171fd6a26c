"""Learning demonstration: Trainer.fit overfits tiny synthetic data to ~0
loss on every task family (VERDICT r3 #3 — nothing previously showed the
Trainer actually LEARNS end-to-end; the parity suites pin steps, not
convergence). Each test drives the real Trainer (cosine table, 2-group Adam,
bf16-off fp32 compute, per-epoch checkpoint/resume machinery) on a fixed
2-sample batch until the task loss collapses.
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from stgcma_tpu.configs import AVQAHeadConfig, AVSHeadConfig, swin_tiny_test
from stgcma_tpu.models import ave, avqa, avs
from stgcma_tpu.train import losses
from stgcma_tpu.train.loop import Trainer


def _fit(params, loss_fn, batch, tmp_path, *, n_epochs, spe=1, lr=2e-3,
         head_lr_mult=5.0, min_lr=None):
    trainer = Trainer(
        loss_fn=loss_fn, eval_fn=lambda p, b: {}, params=params,
        base_lr=lr, head_lr_mult=head_lr_mult, n_epochs=n_epochs,
        steps_per_epoch=spe, min_lr=lr * 0.5 if min_lr is None else min_lr,
        exp_dir=str(tmp_path),
        freeze_base=True, compute_dtype=jnp.float32, save_every_epoch=False)
    history = trainer.fit([batch] * spe, None, jax.random.PRNGKey(0))
    return [h["loss"] for h in history], trainer


def test_ave_overfit_to_zero_loss(tmp_path):
    cfg = swin_tiny_test(ftmode="fusion", label_dim=7)
    params = ave.init_swin_ave(jax.random.PRNGKey(0), cfg)
    rng = np.random.default_rng(0)
    B, T, S = 2, cfg.num_frames, cfg.img_size
    batch = {
        "a": jnp.asarray(rng.standard_normal((B, T, S, S)), jnp.float32),
        "v": jnp.asarray(rng.standard_normal((B, T, S, S, 3)), jnp.float32),
        "labels": jnp.asarray(np.eye(7, dtype=np.float32)[
            rng.integers(0, 7, (B, T))]),
    }

    def loss_fn(p, b, rng_):
        return losses.ave_loss(ave.apply_swin_ave(p, cfg, b["a"], b["v"]),
                               b["labels"]), {}

    ls, _ = _fit(params, loss_fn, batch, tmp_path, n_epochs=40, lr=5e-3)
    assert ls[0] > 1.0, f"initial CE should be near ln(7): {ls[0]}"
    assert min(ls) < 0.05, f"AVE did not overfit: {ls}"


def test_avs_overfit_to_zero_loss(tmp_path):
    cfg = swin_tiny_test(ftmode="fusion", num_frames=2)
    hcfg = AVSHeadConfig(stage_dims=(16, 32), stage_resolutions=(14, 7),
                         vis_dim=(64, 128), tpavi_stages=(0, 1),
                         audio_dim=32, num_frames=2)
    params = avs.init_avs(jax.random.PRNGKey(0), cfg, hcfg)
    rng = np.random.default_rng(1)
    B, T, S = 2, cfg.num_frames, cfg.img_size
    # smooth, decoder-representable targets (per-pixel random noise is not
    # expressible through the upsampling decoder): half-plane masks
    masks = np.zeros((B, S, S), np.float32)
    masks[0, :, : S // 2] = 1.0   # left half
    masks[1, : S // 2, :] = 1.0   # top half
    batch = {
        "a": jnp.asarray(rng.standard_normal((B, T, S, S)), jnp.float32),
        "v": jnp.asarray(rng.standard_normal((B, T, S, S, 3)), jnp.float32),
        "masks": jnp.asarray(masks),
    }

    def loss_fn(p, b, rng_):
        pred, fmaps, afeas, bn_state = avs.apply_avs(
            p, cfg, hcfg, b["a"], b["v"], train=True, return_state=True)
        total, aux = losses.iou_semantic_aware_loss(
            pred, b["masks"][..., None], afeas, fmaps,
            frames_per_clip=cfg.num_frames)
        aux = dict(aux)
        aux["state_updates"] = {"avstask": {
            k: {"W_z": {"bn": s}} for k, s in bn_state.items()}}
        return total, aux

    # lr=1e-3 with the 5x head multiplier saturates the decoder's BCE in one
    # Adam step on this random-init tiny model (logits pinned past +-8, zero
    # grad); the reference's own AVS recipe trains at 1e-4-scale LRs
    ls, _ = _fit(params, loss_fn, batch, tmp_path, n_epochs=40, lr=3e-4,
                 head_lr_mult=1.0)
    assert ls[0] > 0.4, f"initial BCE should be substantial: {ls[0]}"
    assert min(ls) < 0.1, f"AVS did not overfit: {ls}"


def test_avqa_overfit_to_zero_loss(tmp_path):
    from stgcma_tpu.ops.common import linear_torch_default_init

    cfg = swin_tiny_test(ftmode="fusion", embed_dim=16,
                         with_nega_stream=True)
    hcfg = AVQAHeadConfig(feat_dim=cfg.num_features, grid=7,
                          num_frames=cfg.num_frames)
    params = avqa.init_avqa(jax.random.PRNGKey(0), cfg, hcfg)
    # The reference never trains the match branch from trunc_normal(.02):
    # fc_a2/fc_gl/fc1..fc4 are SPLICED from the grounding-pretrained
    # checkpoint (Swin_AVQAModel_V1.py:1515-1541), whose own trainer built
    # them at torch-default (kaiming-uniform) scale. At .02-scale the 4-layer
    # match MLP attenuates the pos/nega differential ~8x per layer and the
    # match CE sits at its ln(2) contradictory-pair equilibrium for >>1e3
    # steps. Emulate the splice: healthy-scale init for the spliced layers.
    hp = params["avqatask"]
    ks = jax.random.split(jax.random.PRNGKey(5), 6)
    d = hcfg.feat_dim
    hp["fc_a2"] = linear_torch_default_init(ks[0], d, d)
    hp["fc_gl"] = linear_torch_default_init(ks[1], 2 * d, d)
    hp["fc1"] = linear_torch_default_init(ks[2], 2 * d, 512)
    hp["fc2"] = linear_torch_default_init(ks[3], 512, 256)
    hp["fc3"] = linear_torch_default_init(ks[4], 256, 128)
    hp["fc4"] = linear_torch_default_init(ks[5], 128, 2)
    rng = np.random.default_rng(2)
    # B=1: the match head still trains on a genuine posi/nega pair (the nega
    # stream supplies the 0-label row), while the qa CE avoids the B=2
    # pathology where the model parks at ln(2) splitting probability across
    # the two samples' answers — a chaotic symmetry-breaking regime that
    # escapes (or not) unpredictably within any fixed step budget.
    B, T, S = 1, cfg.num_frames, cfg.img_size
    batch = {
        "a": jnp.asarray(rng.standard_normal((B, T, S, S)), jnp.float32),
        "v": jnp.asarray(rng.standard_normal((B, T, S, S, 3)), jnp.float32),
        "vn": jnp.asarray(rng.standard_normal((B, T, S, S, 3)), jnp.float32),
        "question": jnp.asarray(rng.integers(0, 93, (B, 14)), jnp.int32),
        "answer": jnp.asarray(rng.integers(0, 42, (B,)), jnp.int32),
    }

    def loss_fn(p, b, rng_):
        out_qa, m_pos, m_neg = avqa.apply_avqa(
            p, cfg, hcfg, b["a"], b["v"], b["vn"], b["question"])
        total, aux = losses.avqa_loss(out_qa, m_pos, m_neg, b["answer"])
        return total, aux

    # min_lr=lr keeps the cosine table flat (measured: converges to 0.0 by
    # step ~30 at constant 5e-3)
    ls, _ = _fit(params, loss_fn, batch, tmp_path, n_epochs=60, lr=5e-3,
                 min_lr=5e-3)
    assert ls[0] > 2.0, f"initial qa CE should be near ln(42): {ls[0]}"
    # combined loss: qa CE -> 0 and match CE -> 0 jointly
    assert min(ls) < 0.05, f"AVQA did not overfit: {ls[::5]}"
