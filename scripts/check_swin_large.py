"""Compile-check the Swin-Large fused path on TPU (VERDICT round-1 item:
stage-2/3 at 24/48 heads previously blew up Mosaic via the unrolled head
loop; the whole-block kernel's fori_loop path must compile and execute).

Runs ONE fusion forward at Swin-Large dims with a reduced depth profile
(2,2,2,2) — covers every stage's kernel shapes without the full 18-block
stage-2 compile time. Prints throughput for the reduced tower.
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

    from stgcma_tpu.configs import swin_large
    from stgcma_tpu.models import ave
    from stgcma_tpu.ops.common import cast_tree

    cfg = swin_large(ftmode="fusion", label_dim=29)
    depths = os.environ.get("DEPTHS")
    if depths:
        cfg = dataclasses.replace(
            cfg, depths=tuple(int(x) for x in depths.split(",")))
    B = int(os.environ.get("BENCH_BATCH", "2"))
    params = cast_tree(ave.init_swin_ave(jax.random.PRNGKey(0), cfg),
                       jnp.bfloat16)
    rng = np.random.RandomState(0)
    a = jnp.asarray(rng.randn(B, cfg.num_frames, cfg.img_size, cfg.img_size),
                    jnp.bfloat16)
    v = jnp.asarray(rng.randn(B, cfg.num_frames, cfg.img_size, cfg.img_size,
                              3), jnp.bfloat16)

    @jax.jit
    def fwd(params, a, v):
        return ave.apply_swin_ave(params, cfg, a, v)

    t0 = time.perf_counter()
    out = fwd(params, a, v)
    val = float(out.astype(jnp.float32).sum())
    t_compile = time.perf_counter() - t0
    print(f"Swin-Large depths={cfg.depths} heads={cfg.num_heads}: "
          f"compiled+ran in {t_compile:.1f}s, logits finite={np.isfinite(val)}",
          flush=True)


if __name__ == "__main__":
    main()
