"""TPAVI BatchNorm training semantics (VERDICT r2 item 4).

The reference trains the W_z BN in train mode (AVS/model/TPAVI.py:57-63):
batch statistics normalize the forward, running stats get momentum updates
(torch buffer semantics — no gradients). These tests assert:
  1. BN running stats are labeled 'buffer' — excluded from the Adam groups.
  2. A Trainer step with the AVS train-mode loss propagates the momentum
     updates into the held state (running mean changes from init).
  3. The eval path consumes the updated running stats.
"""
import numpy as np
import jax
import jax.numpy as jnp

from stgcma_tpu.configs import AVSHeadConfig, swin_tiny_test
from stgcma_tpu.models import avs
from stgcma_tpu.train import losses
from stgcma_tpu.train.loop import Trainer
from stgcma_tpu.train.optim import label_params, trainable_mask


def _tiny_avs():
    cfg = swin_tiny_test(ftmode="fusion", num_frames=2)
    hcfg = AVSHeadConfig(stage_dims=(16, 32), stage_resolutions=(14, 7),
                         vis_dim=(64, 128), tpavi_stages=(0, 1),
                         audio_dim=32, num_frames=2)
    params = avs.init_avs(jax.random.PRNGKey(0), cfg, hcfg)
    return cfg, hcfg, params


def test_bn_stats_labeled_buffer():
    _, _, params = _tiny_avs()
    labels = label_params(params)
    bn = labels["avstask"]["tpavi_b1"]["W_z"]["bn"]
    assert bn["mean"] == "buffer" and bn["var"] == "buffer"
    assert bn["scale"] == "head" and bn["bias"] == "head"  # affine trains
    mask = trainable_mask(params)
    bnm = mask["avstask"]["tpavi_b1"]["W_z"]["bn"]
    assert not bnm["mean"] and not bnm["var"]
    # buffers stay untrainable even with freeze_base=False
    mask_all = trainable_mask(params, freeze_base=False)
    assert not mask_all["avstask"]["tpavi_b1"]["W_z"]["bn"]["mean"]


def test_train_step_updates_running_stats_and_eval_consumes_them():
    cfg, hcfg, params = _tiny_avs()
    rng = np.random.RandomState(0)
    B = 2
    batch = {
        "a": jnp.asarray(rng.randn(B, 2, cfg.img_size, cfg.img_size),
                         jnp.float32),
        "v": jnp.asarray(rng.randn(B, 2, cfg.img_size, cfg.img_size, 3),
                         jnp.float32),
        "masks": jnp.asarray((rng.rand(B, 1, cfg.img_size, cfg.img_size) > .5)
                             .astype(np.float32)),
    }

    def loss_fn(p, batch, rng_):
        pred, fmaps, afeas, bn_state = avs.apply_avs(
            p, cfg, hcfg, batch["a"], batch["v"], train=True,
            return_state=True)
        gt = batch["masks"][:, 0][..., None]
        total, aux = losses.iou_semantic_aware_loss(
            pred, gt, afeas, fmaps, 0.0, frames_per_clip=2)
        aux = dict(aux)
        aux["state_updates"] = {"avstask": {
            k: {"W_z": {"bn": s}} for k, s in bn_state.items()}}
        return total, aux

    tr = Trainer(loss_fn=loss_fn, eval_fn=lambda p, b: {}, params=params,
                 base_lr=1e-3, n_epochs=1, steps_per_epoch=2,
                 exp_dir="/tmp/test_avs_bn")
    bn0 = np.asarray(tr.frozen_p["avstask"]["tpavi_b1"]["W_z"]["bn"]["mean"])
    assert np.all(bn0 == 0.0)  # init
    tr.train_epoch(1, [batch, batch], jax.random.PRNGKey(0))
    bn1 = tr.frozen_p["avstask"]["tpavi_b1"]["W_z"]["bn"]["mean"]
    assert bn1.dtype == jnp.float32
    assert np.any(np.asarray(bn1) != 0.0), "running mean never updated"
    var1 = np.asarray(tr.frozen_p["avstask"]["tpavi_b1"]["W_z"]["bn"]["var"])
    assert np.any(var1 != 1.0), "running var never updated"

    # eval path: merged params carry the updated stats; inference-mode BN
    # (train=False) consumes them and stays finite
    merged = tr.params()
    got = np.asarray(
        merged["avstask"]["tpavi_b1"]["W_z"]["bn"]["mean"])
    np.testing.assert_array_equal(got, np.asarray(bn1))
    pred, _, _ = avs.apply_avs(merged, cfg, hcfg, batch["a"], batch["v"])
    assert np.isfinite(np.asarray(pred)).all()


def test_train_false_does_not_emit_state():
    cfg, hcfg, params = _tiny_avs()
    rng = np.random.RandomState(1)
    a = jnp.asarray(rng.randn(1, 2, cfg.img_size, cfg.img_size), jnp.float32)
    v = jnp.asarray(rng.randn(1, 2, cfg.img_size, cfg.img_size, 3), jnp.float32)
    _, _, _, bn_state = avs.apply_avs(params, cfg, hcfg, a, v, train=False,
                                      return_state=True)
    assert bn_state == {}
