"""Training engine: trainable partition, optimizer parity with torch.Adam,
loss decrease on a tiny AVE fusion model, frozen-backbone invariance."""
import numpy as np
import jax
import jax.numpy as jnp
import torch

from stgcma_tpu.configs import swin_tiny_test
from stgcma_tpu.models import ave
from stgcma_tpu.train import losses, optim, steps


def test_label_partition():
    cfg = swin_tiny_test(ftmode="fusion")
    params = ave.init_swin_ave(jax.random.PRNGKey(0), cfg)
    labels = optim.label_params(params)
    leaves = jax.tree_util.tree_flatten_with_path(labels)[0]
    by_label = {"adapt": 0, "head": 0, "frozen": 0}
    for path, lab in leaves:
        by_label[lab] += 1
        s = jax.tree_util.keystr(path)
        if "qkv" in s or "'mlp'" in s:
            assert lab == "frozen", s
        if "Adapter" in s or "gate_" in s:
            assert lab == "adapt", s
        if "mlp_head" in s:
            assert lab == "head", s
    assert by_label["adapt"] > 0 and by_label["head"] > 0 and by_label["frozen"] > 0


def test_cosine_schedule_matches_reference():
    import math
    table = optim.cosine_schedule(3e-4, 5e-7, epochs=10, steps_per_epoch=10,
                                  warmup_epochs=3)
    # reference formula re-evaluated inline (utilities/scheduler.py)
    warmup = np.linspace(0, 3e-4, 30)
    iters = np.arange(70)
    main = np.array([5e-7 + 0.5 * (3e-4 - 5e-7) * (1 + math.cos(math.pi * i / 70))
                     for i in iters])
    ref = np.concatenate([warmup, main])
    np.testing.assert_allclose(table, ref, rtol=1e-6)


def test_torch_adam_parity():
    """Our optax chain must track torch.optim.Adam(wd=5e-7, betas=(.95,.999))."""
    torch.manual_seed(0)
    w0 = torch.randn(5, 4)
    lin = torch.nn.Parameter(w0.clone())
    opt = torch.optim.Adam([lin], lr=1e-3, weight_decay=5e-7, betas=(0.95, 0.999))
    x = torch.randn(8, 5)
    jw = jnp.asarray(w0.numpy())
    tx = optim.torch_adam(lambda s: 1e-3)
    state = tx.init(jw)
    for i in range(5):
        loss = (x @ lin).pow(2).mean()
        opt.zero_grad(); loss.backward(); opt.step()
        g = jnp.asarray((2 * x.numpy().T @ (x.numpy() @ np.asarray(jw)) /
                         (8 * 4)).astype(np.float32))
        upd, state = tx.update(g, state, jw)
        jw = jw + upd
    np.testing.assert_allclose(np.asarray(jw), lin.detach().numpy(),
                               rtol=1e-4, atol=1e-5)


def test_train_step_updates_only_trainable_and_decreases_loss():
    cfg = swin_tiny_test(ftmode="fusion", label_dim=7)
    params = ave.init_swin_ave(jax.random.PRNGKey(0), cfg)
    tx = optim.build_optimizer(params, base_lr=3e-3, head_lr_mult=10.0)
    train_p, frozen_p, opt_state, mask = steps.init_train_state(params, tx)

    B = 2
    k = jax.random.PRNGKey(1)
    v = jax.random.normal(k, (B, cfg.num_frames, cfg.img_size, cfg.img_size, 3))
    a = jax.random.normal(k, (B, cfg.num_frames, cfg.img_size, cfg.img_size))
    labels = jax.nn.one_hot(
        jax.random.randint(k, (B, cfg.num_ttokens), 0, 7), 7)
    batch = {"a": a, "v": v, "labels": labels}

    def loss_fn(p, batch, rng):
        logits = ave.apply_swin_ave(p, cfg, batch["a"], batch["v"])
        return losses.ave_loss(logits, batch["labels"]), {}

    step = steps.make_train_step(loss_fn, tx, donate=False,
                                 compute_dtype=jnp.float32)
    frozen_before = jax.tree_util.tree_map(lambda x: np.asarray(x), frozen_p)
    ls = []
    tp, os_ = train_p, opt_state
    for i in range(8):
        tp, os_, loss, _ = step(tp, frozen_p, os_, batch, jax.random.PRNGKey(i))
        ls.append(float(loss))
    assert ls[-1] < ls[0], f"loss did not decrease: {ls}"
    # frozen params untouched by construction (they're inputs, not outputs)
    for (pa, x), (_, y) in zip(
            jax.tree_util.tree_flatten_with_path(frozen_before)[0],
            jax.tree_util.tree_flatten_with_path(frozen_p)[0]):
        np.testing.assert_array_equal(x, np.asarray(y))


def test_losses_avs_avqa():
    k = jax.random.PRNGKey(0)
    pred = jax.random.normal(k, (10, 16, 16, 1))  # B=2, T=5
    gt = (jax.random.uniform(k, (2, 16, 16, 1)) > 0.5).astype(jnp.float32)
    total, d = losses.iou_semantic_aware_loss(pred, gt)
    assert np.isfinite(float(total))

    iou = losses.mask_iou(jax.random.normal(k, (4, 16, 16)),
                          (jax.random.uniform(k, (4, 16, 16)) > 0.5).astype(jnp.float32))
    assert 0.0 <= float(iou) <= 1.0

    out_qa = jax.random.normal(k, (3, 42))
    posi = jax.random.normal(k, (30, 2))
    nega = jax.random.normal(k, (30, 2))
    ans = jnp.array([1, 5, 41])
    total, d = losses.avqa_loss(out_qa, posi, nega, ans)
    assert np.isfinite(float(total))
    # interleave check
    out, lab = losses.avqa_match_organize(posi, nega)
    np.testing.assert_array_equal(np.asarray(out[0]), np.asarray(posi[0]))
    np.testing.assert_array_equal(np.asarray(out[1]), np.asarray(nega[0]))
    assert lab[0] == 1 and lab[1] == 0


def test_ave_loss_matches_torch_ce():
    torch.manual_seed(2)
    logits = torch.randn(20, 29)
    labels = torch.zeros(20, 29)
    labels[torch.arange(20), torch.randint(0, 29, (20,))] = 1.0
    ref = torch.nn.CrossEntropyLoss()(logits, labels).item()
    ours = float(losses.ave_loss(jnp.asarray(logits.numpy()),
                                 jnp.asarray(labels.numpy().reshape(4, 5, 29))))
    assert abs(ref - ours) < 1e-5


def test_gradient_checkpointing_matches():
    """use_checkpoint=True must not change values or gradients."""
    cfg0 = swin_tiny_test(ftmode="fusion", label_dim=5)
    cfg1 = swin_tiny_test(ftmode="fusion", label_dim=5, use_checkpoint=True)
    params = ave.init_swin_ave(jax.random.PRNGKey(0), cfg0)
    k = jax.random.PRNGKey(1)
    v = jax.random.normal(k, (1, cfg0.num_frames, cfg0.img_size, cfg0.img_size, 3))
    a = jax.random.normal(k, (1, cfg0.num_frames, cfg0.img_size, cfg0.img_size))

    def loss(p, cfg):
        return (ave.apply_swin_ave(p, cfg, a, v) ** 2).mean()

    l0, g0 = jax.value_and_grad(lambda p: loss(p, cfg0))(params)
    l1, g1 = jax.value_and_grad(lambda p: loss(p, cfg1))(params)
    np.testing.assert_allclose(float(l0), float(l1), rtol=1e-6)
    for x, y in zip(jax.tree_util.tree_leaves(g0), jax.tree_util.tree_leaves(g1)):
        np.testing.assert_allclose(np.asarray(x), np.asarray(y),
                                   rtol=1e-5, atol=1e-6)
