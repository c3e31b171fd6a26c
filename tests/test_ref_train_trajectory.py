"""Multi-step Adam TRAJECTORY parity against the actual reference train loop.

test_ref_train_step_parity pins ONE step (loss + grads + BN buffers); this
file pins the optimizer DYNAMICS over consecutive steps (VERDICT r3 #3):
same randomized weights + same batch sequence -> same per-step loss sequence
and same final trainable parameters, through

  - the 2-group Adam (adapt @ lr, mlp_head @ lr*head_lr, wd 5e-7,
    betas (0.95, 0.999)) with bias-correction evolution
    (AVE/traintest_adapt_ave29.py:68),
  - the per-step cosine LR tables — SEPARATE tables for the adapt and head
    groups, both decaying to the same min_lr, written into the param groups
    every step (AVE/traintest_adapt_ave29.py:84-101,136-142;
    utilities/scheduler.py:5-30), including the linear-warmup segment,
  - the ReduceLROnPlateau fallback (mode='max', factor=0.5) incl. the
    Trainer's optimizer-rebuild path (train/loop.py::_maybe_plateau),
    driven through the REAL Trainer.train_epoch loop.

Both sides run fp32 with dropout zeroed (the reference trains under AMP;
determinism needs fp32 here — the single-step suite covers numerics).
"""
import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax
import jax.numpy as jnp

from stgcma_tpu.checkpoint.torch_convert import load_reference_swin
from stgcma_tpu.configs import SwinConfig
from stgcma_tpu.models import ave
from stgcma_tpu.train import losses, optim
from stgcma_tpu.train.loop import Trainer

from test_ref_model_parity import (TINY, _import_ref, randomize_state_dict,
                                   pytestmark)  # noqa: F401  (skip-if guard)
from test_ref_train_step_parity import _zero_dropout

LR, HEAD_LR, WD, MIN_LR = 1e-3, 5.0, 5e-7, 1e-5


def _build_ref_model(seed):
    mod = _import_ref("AVE.model.Swin_AVE")
    cfg = SwinConfig(label_dim=7, ftmode="fusion", **TINY)
    ref = mod.SwinTransformer2D_Adapter_New(
        label_dim=7, pretrained=None, img_size=cfg.img_size,
        embed_dim=cfg.embed_dim, depths=list(cfg.depths),
        num_heads=list(cfg.num_heads), num_frames=cfg.num_frames,
        window_size=cfg.window_size, drop_path_rate=0.0, ftmode="fusion",
        adapter_mlp_ratio=list(cfg.adapter_ratios))
    sd = randomize_state_dict(ref, seed=seed)
    # state_dict() returns LIVE tensor references — snapshot before the torch
    # training loop mutates them, or the jax model would be converted from
    # the post-training weights
    sd = {k: v.detach().clone() for k, v in sd.items()}
    ref.layers_audio = ref.layers  # latent reference alias (see inference test)
    ref.train()
    _zero_dropout(ref)
    return ref, sd, cfg


def _ref_optimizer(ref):
    """The reference param partition + 2-group Adam
    (AVE/traintest_adapt_ave29.py:36-68): mlp_head group @ lr*head_lr,
    name-pattern 'adapt' group @ lr, everything else frozen."""
    pats = ("adapter", "temporal_embedding", "ln_post", "Adapter",
            "my_tokens", "gate_", "ln_before", "temporal_position_bias_table")
    mlp_params, adapt_params = [], []
    for n, p in ref.named_parameters():
        if n.startswith("mlp_head"):
            mlp_params.append(p)
        elif any(s in n for s in pats):
            adapt_params.append(p)
        else:
            p.requires_grad_(False)
    return torch.optim.Adam(
        [{"params": adapt_params, "lr": LR},
         {"params": mlp_params, "lr": LR * HEAD_LR}],
        weight_decay=WD, betas=(0.95, 0.999))


def _batches(cfg, n, seed):
    rng = np.random.default_rng(seed)
    B, T, S = 1, cfg.num_frames, cfg.img_size
    out = []
    for _ in range(n):
        out.append(dict(
            v=rng.standard_normal((B, 3, T, S, S)).astype(np.float32),
            a=rng.standard_normal((B, T, S, S)).astype(np.float32),
            lab=np.eye(7, dtype=np.float32)[rng.integers(0, 7, (B, T))]))
    return out


def _torch_loss(ref, b):
    out = ref(torch.from_numpy(b["a"]), torch.from_numpy(b["v"]), "fusion")
    return torch.nn.CrossEntropyLoss()(
        out, torch.from_numpy(b["lab"].reshape(-1, 7)))


def _jax_batch(b):
    return {"a": jnp.asarray(b["a"]),
            "v": jnp.asarray(np.transpose(b["v"], (0, 2, 3, 4, 1))),
            "labels": jnp.asarray(b["lab"])}


def _make_trainer(params, cfg, tmp_path, **kw):
    def loss_fn(p, batch, rng_):
        logits = ave.apply_swin_ave(p, cfg, batch["a"], batch["v"])
        return losses.ave_loss(logits, batch["labels"]), {}

    return Trainer(loss_fn=loss_fn, eval_fn=lambda p, b: {}, params=params,
                   base_lr=LR, head_lr_mult=HEAD_LR, weight_decay=WD,
                   min_lr=MIN_LR, exp_dir=str(tmp_path), freeze_base=True,
                   compute_dtype=jnp.float32, save_every_epoch=False, **kw)


def _assert_final_params(ref, trainer, rtol=2e-3, atol=2e-6):
    g = {n: p.detach().numpy() for n, p in ref.named_parameters()}
    tp = trainer.train_p
    blk = tp["backbone"]["layers"][0]["blocks"][0]
    np.testing.assert_allclose(
        np.asarray(blk["gate_v"]), g["layers.0.blocks.0.gate_v"],
        rtol=rtol, atol=atol, err_msg="gate_v")
    np.testing.assert_allclose(
        np.asarray(blk["S_Adapter"]["D_fc2"]["kernel"]).T,
        g["layers.0.blocks.0.S_Adapter.D_fc2.weight"],
        rtol=rtol, atol=atol, err_msg="S_Adapter.D_fc2")
    np.testing.assert_allclose(
        np.asarray(blk["T_Adapter_Audio"]["D_fc1"]["kernel"]).T,
        g["layers.0.blocks.0.T_Adapter_Audio.D_fc1.weight"],
        rtol=rtol, atol=atol, err_msg="T_Adapter_Audio.D_fc1")
    head_w = next(v for k, v in g.items()
                  if k.startswith("mlp_head") and v.ndim == 2
                  and v.shape[0] == 7)
    np.testing.assert_allclose(
        np.asarray(tp["mlp_head"]["fc2"]["kernel"]).T, head_w,
        rtol=rtol, atol=atol, err_msg="mlp_head final linear")


def test_cosine_trajectory_6_steps(tmp_path):
    """6 consecutive Adam steps under the reference's dual cosine LR tables
    (1 warmup epoch of 3 steps, then cosine decay): per-step loss sequence
    and final trainable params pinned."""
    n_epochs, spe = 2, 3
    ref, sd, cfg = _build_ref_model(seed=21)
    opt = _ref_optimizer(ref)
    # the ACTUAL reference scheduler builds both tables
    sched = _import_ref("utilities.scheduler")
    tab = sched.cosine_scheduler(LR, MIN_LR, n_epochs, spe, warmup_epochs=1)
    tab_head = sched.cosine_scheduler(LR * HEAD_LR, MIN_LR, n_epochs, spe,
                                      warmup_epochs=1)

    batches = _batches(cfg, 6, seed=22)
    ref_losses = []
    for step, b in enumerate(batches):
        # per-step param-group LR write (AVE/traintest_adapt_ave29.py:136-142)
        opt.param_groups[0]["lr"] = tab[step]
        opt.param_groups[1]["lr"] = tab_head[step]
        loss = _torch_loss(ref, b)
        opt.zero_grad()
        loss.backward()
        opt.step()
        ref_losses.append(float(loss))

    params = ave.init_swin_ave(jax.random.PRNGKey(0), cfg)
    params, unexpected = load_reference_swin(params, sd, dual_head=True)
    assert unexpected == []
    trainer = _make_trainer(params, cfg, tmp_path, n_epochs=n_epochs,
                            steps_per_epoch=spe, warmup_epochs=1,
                            lr_mode="cosine")
    # the Trainer's tables must BE the reference tables
    np.testing.assert_allclose(trainer.lr_table, tab, rtol=1e-6)
    np.testing.assert_allclose(trainer.head_lr_table, tab_head, rtol=1e-6)

    jl = []
    for i, b in enumerate(batches):
        trainer.train_p, trainer.opt_state, loss, _ = trainer.step_fn(
            trainer.train_p, trainer.frozen_p, trainer.opt_state,
            _jax_batch(b), jax.random.PRNGKey(i))
        jl.append(float(loss))
    np.testing.assert_allclose(jl, ref_losses, rtol=1e-3,
                               err_msg=f"loss sequences {jl} vs {ref_losses}")
    # the sequence must actually evolve (a frozen model would also "match")
    assert np.std(ref_losses) > 1e-4
    _assert_final_params(ref, trainer)


def test_plateau_rebuild_trajectory(tmp_path):
    """4 epochs x 2 steps under ReduceLROnPlateau(mode='max', factor=0.5,
    patience=1) with a non-improving metric sequence that forces one LR
    reduction mid-run — driven through the REAL Trainer.train_epoch +
    _maybe_plateau optimizer-rebuild path (train/loop.py:102-127), pinned
    against torch's scheduler on the actual reference model."""
    n_epochs, spe = 4, 2
    ref, sd, cfg = _build_ref_model(seed=31)
    opt = _ref_optimizer(ref)
    sched = torch.optim.lr_scheduler.ReduceLROnPlateau(
        opt, mode="max", factor=0.5, patience=1)

    batches = _batches(cfg, n_epochs * spe, seed=32)
    metrics = [0.5, 0.4, 0.3, 0.2]  # plateaus after epoch 1 -> cut at epoch 3
    ref_epoch_losses = []
    for e in range(n_epochs):
        ls = []
        for b in batches[e * spe:(e + 1) * spe]:
            loss = _torch_loss(ref, b)
            opt.zero_grad()
            loss.backward()
            opt.step()
            ls.append(float(loss))
        sched.step(metrics[e])
        ref_epoch_losses.append(float(np.mean(ls)))
    # the fabricated metric sequence must have triggered a reduction
    assert opt.param_groups[0]["lr"] == pytest.approx(LR * 0.5)
    assert opt.param_groups[1]["lr"] == pytest.approx(LR * HEAD_LR * 0.5)

    params = ave.init_swin_ave(jax.random.PRNGKey(0), cfg)
    params, unexpected = load_reference_swin(params, sd, dual_head=True)
    assert unexpected == []
    trainer = _make_trainer(params, cfg, tmp_path, n_epochs=n_epochs,
                            steps_per_epoch=spe, lr_mode="plateau",
                            plateau_patience=1, plateau_factor=0.5)
    jl = []
    for e in range(n_epochs):
        eb = [_jax_batch(b) for b in batches[e * spe:(e + 1) * spe]]
        avg = trainer.train_epoch(e + 1, eb, jax.random.PRNGKey(e))
        trainer._maybe_plateau(metrics[e])
        jl.append(avg)
    assert trainer.lr_table[0] == pytest.approx(LR * 0.5)
    assert trainer.head_lr_table[0] == pytest.approx(LR * HEAD_LR * 0.5)
    np.testing.assert_allclose(jl, ref_epoch_losses, rtol=1e-3,
                               err_msg=f"epoch losses {jl} vs "
                                       f"{ref_epoch_losses}")
    assert np.std(ref_epoch_losses) > 1e-4
    _assert_final_params(ref, trainer)
