"""dp/tp-sharded multi-chip serving (MultiTaskServer(mesh=...)): predictions
equal the single-device server's, batches shard over 'data', and the tower
optionally tp-shards over 'model' (SURVEY.md §2.12 — the reference serves
single-GPU only, so the contract here is internal consistency)."""
import numpy as np
import pytest
import jax
import jax.numpy as jnp

from stgcma_tpu.configs import swin_tiny_test
from stgcma_tpu.models import ave
from stgcma_tpu.runtime import mesh as M
from stgcma_tpu.serving import MultiTaskServer


def _batch(cfg, B, seed=0):
    rng = np.random.RandomState(seed)
    return {
        "a": rng.randn(B, cfg.num_frames, cfg.img_size,
                       cfg.img_size).astype(np.float32),
        "v": rng.randn(B, cfg.num_frames, cfg.img_size, cfg.img_size,
                       3).astype(np.float32),
    }


@pytest.mark.parametrize("data,model,shard_tower", [(8, 1, False),
                                                    (4, 2, True)])
def test_sharded_serving_matches_single_device(data, model, shard_tower):
    cfg = swin_tiny_test(ftmode="fusion", num_frames=2)
    params = ave.init_swin_ave(jax.random.PRNGKey(0), cfg)

    ref = MultiTaskServer(dtype=jnp.float32)
    ref.add_ave("ave29", cfg, params)

    mesh = M.make_mesh(data=data, model=model,
                       devices=jax.devices("cpu")[:8])
    srv = MultiTaskServer(dtype=jnp.float32, mesh=mesh,
                          shard_tower=shard_tower)
    srv.add_ave("ave29", cfg, params)

    batch = _batch(cfg, B=data)
    want = ref.predict("ave29", batch)
    got = srv.predict("ave29", batch)
    assert got.shape == want.shape
    # tp row-splits reassociate the contraction partial sums (psum), so exact
    # bitwise equality is not guaranteed even in f32
    np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-5)


def test_sharded_serving_rejects_indivisible_batch():
    cfg = swin_tiny_test(ftmode="fusion", num_frames=2)
    params = ave.init_swin_ave(jax.random.PRNGKey(0), cfg)
    mesh = M.make_mesh(data=4, model=1, devices=jax.devices("cpu")[:4])
    srv = MultiTaskServer(dtype=jnp.float32, mesh=mesh)
    srv.add_ave("ave29", cfg, params)
    with pytest.raises(ValueError, match="data extent"):
        srv.predict("ave29", _batch(cfg, B=3))
