"""Per-stage cost attribution for the Swin fusion flagship.

Times the full model with each stage's depth zeroed in turn; the delta vs the
full model is that stage's cost. Uses the same scan-differencing steady-state
harness as bench.py. Run on TPU: python scripts/bench_swin_stages.py
"""
from __future__ import annotations

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

    import dataclasses
    from stgcma_tpu.configs import swin_base
    from stgcma_tpu.models import ave
    from stgcma_tpu.ops.common import cast_tree

    B = int(os.environ.get("BENCH_BATCH", "8"))
    rng = np.random.RandomState(0)

    def measure(depths, label):
        cfg = swin_base(ftmode="fusion", label_dim=29)
        cfg = dataclasses.replace(cfg, depths=depths)
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

        n_small, n_large = 2, 8
        float(fwd_many(params, a, v, n_small))
        float(fwd_many(params, a, v, n_large))

        def timed(n, reps=4):
            best = float("inf")
            for _ in range(reps):
                t0 = time.perf_counter()
                float(fwd_many(params, a, v, n))
                best = min(best, time.perf_counter() - t0)
            return best

        per = (timed(n_large) - timed(n_small)) / (n_large - n_small)
        print(f"{label:28s} depths={depths}  {per*1e3:8.1f} ms/batch "
              f"({B/per:7.1f} clips/s)", flush=True)
        return per

    full = measure((2, 2, 18, 2), "full")
    for s in range(4):
        d = [2, 2, 18, 2]
        d[s] = 0
        per = measure(tuple(d), f"without stage {s}")
        print(f"  -> stage {s} cost ~{(full-per)*1e3:.1f} ms", flush=True)


if __name__ == "__main__":
    main()
