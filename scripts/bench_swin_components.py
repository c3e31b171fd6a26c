"""Component attribution inside Swin stage-0/1 fusion blocks.

Runs a stage-0-only tower (depths=(2,0,0,0)) with individual block
components disabled via the config ablation flags, on the TPU.
"""
from __future__ import annotations

import dataclasses
import functools
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir",
                      os.path.expanduser("~/.cache/stgcma_jax_tpu"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from stgcma_tpu.configs import swin_base
    from stgcma_tpu.models import ave
    from stgcma_tpu.ops.common import cast_tree

    B = int(os.environ.get("BENCH_BATCH", "8"))
    depths = tuple(int(x) for x in
                   os.environ.get("BENCH_DEPTHS", "2,0,0,0").split(","))
    rng = np.random.RandomState(0)

    def measure(label, **flags):
        cfg = dataclasses.replace(swin_base(ftmode="fusion", label_dim=29),
                                  depths=depths, **flags)
        params = cast_tree(ave.init_swin_ave(jax.random.PRNGKey(0), cfg),
                           jnp.bfloat16)
        a = jnp.asarray(rng.randn(B, cfg.num_frames, cfg.img_size,
                                  cfg.img_size), jnp.bfloat16)
        v = jnp.asarray(rng.randn(B, cfg.num_frames, cfg.img_size,
                                  cfg.img_size, 3), jnp.bfloat16)

        @functools.partial(jax.jit, static_argnums=(3,))
        def fwd_many(params, a, v, n):
            def body(carry, _):
                logits = ave.apply_swin_ave(
                    params, cfg, a + (carry * 1e-8).astype(jnp.bfloat16), v)
                return logits.astype(jnp.float32).mean() * 1e-6, None
            acc, _ = jax.lax.scan(body, jnp.float32(0.0), None, length=n)
            return acc

        float(fwd_many(params, a, v, 2))
        float(fwd_many(params, a, v, 8))

        def timed(n, reps=4):
            best = float("inf")
            for _ in range(reps):
                t0 = time.perf_counter()
                float(fwd_many(params, a, v, n))
                best = min(best, time.perf_counter() - t0)
            return best

        per = (timed(8) - timed(2)) / 6
        print(f"{label:32s} {per*1e3:8.1f} ms/batch", flush=True)
        return per

    full = measure("full")
    for label, flags in [
        ("no temporal attn", dict(use_temporal_attn=False)),
        ("no spatial (S) adapter+fusion", dict(use_s_adapter=False)),
        ("no joint (G) adapter+fusion", dict(use_g_adapter=False)),
        ("no T adapter", dict(use_t_adapter=False)),
        ("bare tower (all off)", dict(use_temporal_attn=False,
                                      use_s_adapter=False,
                                      use_g_adapter=False,
                                      use_t_adapter=False)),
    ]:
        per = measure(label, **flags)
        print(f"  -> component cost ~{(full-per)*1e3:.1f} ms", flush=True)


if __name__ == "__main__":
    main()
