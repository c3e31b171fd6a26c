"""Numerical parity of the AVS losses against the ACTUAL reference
AVS/loss.py (F1_IoU_BCELoss + A_MaskedV_SimmLoss composition and mask_iou) —
closes the train-path-fidelity gap on the loss-inputs leg (VERDICT r2 weak 4).
"""
import importlib
import os
import sys

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax.numpy as jnp

from stgcma_tpu.train import losses

REF = "/root/reference"
pytestmark = pytest.mark.skipif(not os.path.isdir(REF),
                                reason="reference repo not present")


@pytest.fixture()
def ref_loss(monkeypatch):
    # the reference pins tensors to CUDA (loss.py:19) — run it on CPU
    monkeypatch.setattr(torch.Tensor, "cuda", lambda self, *a, **k: self)
    p = os.path.join(REF, "AVS")
    if p not in sys.path:
        sys.path.insert(0, p)
    return importlib.import_module("loss")


def test_iou_semantic_aware_loss_parity(ref_loss):
    B, T, S, C, H = 2, 5, 32, 16, 16
    rng = np.random.RandomState(0)
    pred = rng.randn(B * T, S, S, 1).astype(np.float32) * 2
    gt = (rng.rand(B, S, S, 1) > 0.5).astype(np.float32)
    afeas = [rng.randn(B, T, C).astype(np.float32) for _ in range(2)]
    vmaps = [rng.randn(B * T, H, H, C).astype(np.float32) for _ in range(2)]

    t_pred = torch.tensor(pred.transpose(0, 3, 1, 2), requires_grad=True)
    t_gt = torch.tensor(gt.transpose(0, 3, 1, 2)[:, None])  # (B,1,1,S,S)
    t_a = [torch.tensor(a) for a in afeas]
    t_v = [torch.tensor(v.transpose(0, 3, 1, 2)) for v in vmaps]

    ref_total, ref_dict = ref_loss.IouSemanticAwareLoss(
        t_pred, t_gt, t_a, t_v, lambda_1=0.3, count_stages=[0, 1],
        sa_loss_flag=True)
    ours_total, ours_dict = losses.iou_semantic_aware_loss(
        jnp.asarray(pred), jnp.asarray(gt), [jnp.asarray(a) for a in afeas],
        [jnp.asarray(v) for v in vmaps], lambda_1=0.3, count_stages=(0, 1),
        sa_loss_flag=True, frames_per_clip=T)

    np.testing.assert_allclose(float(ours_total), float(ref_total),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(float(ours_dict["iou_loss"]),
                               ref_dict["iou_loss"], rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(float(ours_dict["sa_loss"]),
                               ref_dict["sa_loss"], rtol=1e-5, atol=1e-6)


def test_iou_loss_only_parity(ref_loss):
    """The launch-config path: sa_loss_flag=False (F1-IoU BCE alone)."""
    B, T, S = 3, 5, 16
    rng = np.random.RandomState(3)
    pred = rng.randn(B * T, S, S, 1).astype(np.float32)
    gt = (rng.rand(B, S, S, 1) > 0.3).astype(np.float32)
    t_pred = torch.tensor(pred.transpose(0, 3, 1, 2), requires_grad=True)
    t_gt = torch.tensor(gt.transpose(0, 3, 1, 2)[:, None])
    ref_total, _ = ref_loss.IouSemanticAwareLoss(t_pred, t_gt, [], [])
    ours_total, _ = losses.iou_semantic_aware_loss(
        jnp.asarray(pred), jnp.asarray(gt), frames_per_clip=T)
    np.testing.assert_allclose(float(ours_total), float(ref_total),
                               rtol=1e-5, atol=1e-6)


def test_mask_iou_parity(ref_loss):
    rng = np.random.RandomState(1)
    pred = rng.randn(6, 24, 24).astype(np.float32)
    target = (rng.rand(6, 24, 24) > 0.5).astype(np.float32)
    target[2] = 0.0  # exercise the empty-mask branch
    ref = ref_loss.mask_iou(torch.tensor(pred), torch.tensor(target).int())
    ours = losses.mask_iou(jnp.asarray(pred), jnp.asarray(target))
    np.testing.assert_allclose(float(ours), float(ref), rtol=1e-5, atol=1e-6)
