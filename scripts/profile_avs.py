"""Device-trace attribution for the AVS forward (backbone + ASPP/TPAVI/FPN
decoder) — the AVE flagships have per-op attributions in BENCH_NOTES; this
gives the segmentation path the same treatment. Usage:
    python scripts/profile_avs.py
"""
from __future__ import annotations

import functools
import os
import sys
import tempfile

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from profile_model import summarize  # noqa: E402


def main():
    import jax
    import jax.numpy as jnp
    jax.config.update("jax_compilation_cache_dir",
                      os.path.expanduser("~/.cache/stgcma_jax_tpu"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from stgcma_tpu.configs import AVSHeadConfig, swin_base
    from stgcma_tpu.models import avs
    from stgcma_tpu.ops.common import cast_tree

    rng = np.random.RandomState(0)
    B = int(os.environ.get("AVS_BATCH", "4"))
    cfg = swin_base(ftmode="fusion", label_dim=29, num_frames=5)
    hcfg = AVSHeadConfig(stage_dims=tuple(cfg.stage_dim(i) for i in range(4)),
                         audio_dim=cfg.num_features, num_frames=5)
    params = cast_tree(avs.init_avs(jax.random.PRNGKey(0), cfg, hcfg),
                       jnp.bfloat16)
    a = jnp.asarray(rng.randn(B, 5, cfg.img_size, cfg.img_size), jnp.bfloat16)
    v = jnp.asarray(rng.randn(B, 5, cfg.img_size, cfg.img_size, 3),
                    jnp.bfloat16)

    ITERS = 4

    @functools.partial(jax.jit, static_argnums=(3,))
    def fwd_many(params, a, v, n):
        def body(carry, _):
            masks = avs.apply_avs(params, cfg, hcfg,
                                  a + (carry * 1e-8).astype(jnp.bfloat16), v)[0]
            return masks.astype(jnp.float32).mean() * 1e-6, None
        acc, _ = jax.lax.scan(body, jnp.float32(0.0), None, length=n)
        return acc

    float(fwd_many(params, a, v, ITERS))
    td = tempfile.mkdtemp(prefix="stgcma_avs_trace_")
    jax.profiler.start_trace(td)
    float(fwd_many(params, a, v, ITERS))
    jax.profiler.stop_trace()
    summarize(td, ITERS)


if __name__ == "__main__":
    main()
