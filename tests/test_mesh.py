"""Multi-chip sharding on the 8-device virtual CPU mesh: dp-only and dp+tp
train steps must compile, run, and agree with single-device results."""
import numpy as np
import jax
import jax.numpy as jnp

from stgcma_tpu.configs import swin_tiny_test
from stgcma_tpu.models import ave
from stgcma_tpu.runtime import mesh as M
from stgcma_tpu.train import losses, optim, steps


def _setup(model_axis):
    mesh = M.make_mesh(data=8 // model_axis, model=model_axis)
    cfg = swin_tiny_test(ftmode="fusion", label_dim=5, embed_dim=32,
                         num_heads=(2, 4))
    params = ave.init_swin_ave(jax.random.PRNGKey(0), cfg)
    tx = optim.build_optimizer(params, base_lr=1e-3)
    train_p, frozen_p, opt_state, _ = steps.init_train_state(params, tx)
    B = 8
    k = jax.random.PRNGKey(1)
    batch = {
        "a": jax.random.normal(k, (B, cfg.num_frames, cfg.img_size, cfg.img_size)),
        "v": jax.random.normal(k, (B, cfg.num_frames, cfg.img_size, cfg.img_size, 3)),
        "labels": jax.nn.one_hot(jax.random.randint(k, (B, cfg.num_ttokens), 0, 5), 5),
    }

    def loss_fn(p, b, rng):
        logits = ave.apply_swin_ave(p, cfg, b["a"], b["v"])
        return losses.ave_loss(logits, b["labels"]), {}

    step = steps.make_train_step(loss_fn, tx, donate=False,
                                 compute_dtype=jnp.float32)
    return mesh, cfg, (train_p, frozen_p, opt_state), batch, step


def test_dp_step_matches_single_device():
    mesh, cfg, (tp, fp, os_), batch, step = _setup(model_axis=1)
    # single device baseline
    _, _, loss_ref, _ = step(tp, fp, os_, batch, jax.random.PRNGKey(0))
    # sharded
    tp_s = M.replicate(tp, mesh)
    fp_s = M.replicate(fp, mesh)
    os_s = M.replicate(os_, mesh)
    batch_s = M.shard_batch(batch, mesh)
    with mesh:
        tp2, os2, loss_sh, _ = step(tp_s, fp_s, os_s, batch_s, jax.random.PRNGKey(0))
    np.testing.assert_allclose(float(loss_ref), float(loss_sh), rtol=1e-5)


def test_dp_tp_step_runs_and_matches():
    mesh, cfg, (tp, fp, os_), batch, step = _setup(model_axis=2)
    _, _, loss_ref, _ = step(tp, fp, os_, batch, jax.random.PRNGKey(0))
    tp_s = M.replicate(tp, mesh)
    fp_s = M.shard_params(fp, mesh)   # Megatron split of frozen backbone cores
    os_s = M.replicate(os_, mesh)
    batch_s = M.shard_batch(batch, mesh)
    with mesh:
        tp2, os2, loss_sh, _ = step(tp_s, fp_s, os_s, batch_s, jax.random.PRNGKey(0))
    np.testing.assert_allclose(float(loss_ref), float(loss_sh), rtol=1e-4)


def test_tp_spec_assignment():
    from jax.sharding import PartitionSpec as P
    assert M.param_spec("backbone/layers/0/blocks/0/attn/qkv/kernel",
                        np.zeros((32, 96))) == P(None, "model")
    assert M.param_spec("backbone/layers/0/blocks/0/attn/proj/kernel",
                        np.zeros((32, 32))) == P("model", None)
    assert M.param_spec("backbone/layers/0/blocks/0/mlp/fc1/kernel",
                        np.zeros((32, 128))) == P(None, "model")
    assert M.param_spec("backbone/norm/scale", np.zeros((32,))) == P()


def test_graft_entry_dryrun():
    # The suite exercises the dryrun's mesh/sharding plumbing on the tiny
    # config; the FULL-depth three-task dryrun (Swin-Base (2,2,18,2), AVE at
    # img 224) is the driver's own separate check and takes tens of minutes
    # on a loaded single host — opt in with STGCMA_TEST_FULL_DRYRUN=1.
    import importlib.util, os, pathlib
    spec = importlib.util.spec_from_file_location(
        "graft_entry", pathlib.Path(__file__).parent.parent / "__graft_entry__.py")
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    if os.environ.get("STGCMA_TEST_FULL_DRYRUN") != "1":
        os.environ["STGCMA_DRYRUN_TINY"] = "1"
    try:
        mod.dryrun_multichip(8)
    finally:
        os.environ.pop("STGCMA_DRYRUN_TINY", None)
