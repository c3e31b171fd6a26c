"""Benchmark: AVE Swin-Base fusion inference throughput (AV clips/sec/chip).

North-star metric from BASELINE.json: >= 500 AV clips/sec/chip on v5e for
AVE-29 inference (10 frames video + 10 fbank seconds per clip, both 224x224,
through the full dual-stream Swin-Base fusion backbone + head).

Measurement notes: this container reaches the chip through a relay with
~0.5 s per-dispatch latency and an unreliable block_until_ready, so the steady
state is measured on-device: a lax.scan chains N forwards with a data
dependence (carry perturbs the input, preventing CSE), and two scan lengths
are differenced to cancel the fixed dispatch+fetch overhead.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""
from __future__ import annotations

import functools
import json
import os
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir",
                      os.path.expanduser("~/.cache/stgcma_jax_tpu"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from stgcma_tpu.configs import clip_b16, swin_base
    from stgcma_tpu.models import ave
    from stgcma_tpu.ops.common import cast_tree

    # BASELINE.json configs[0] is "AVE-29: CLIP ViT-B/16 + STG-CMA adapter";
    # BENCH_MODEL=swin-base measures the windowed Swin flagship instead
    # (see BENCH_NOTES.md for both numbers).
    model = os.environ.get("BENCH_MODEL", "clip-b16")
    B = int(os.environ.get("BENCH_BATCH", "8"))
    rng = np.random.RandomState(0)
    if model == "swin-base":
        cfg = swin_base(ftmode="fusion", label_dim=29)
        params = cast_tree(ave.init_swin_ave(jax.random.PRNGKey(0), cfg),
                           jnp.bfloat16)
        apply_fn = ave.apply_swin_ave
        a_shape = (B, cfg.num_frames, cfg.img_size, cfg.img_size)
        v_shape = (B, cfg.num_frames, cfg.img_size, cfg.img_size, 3)
    else:
        cfg = clip_b16(ftmode="fusion", label_dim=29)
        params = cast_tree(ave.init_clip_ave(jax.random.PRNGKey(0), cfg),
                           jnp.bfloat16)
        apply_fn = ave.apply_clip_ave
        a_shape = (B, cfg.num_frames, cfg.audio_tdim, cfg.audio_fdim)
        v_shape = (B, cfg.num_frames, cfg.input_resolution,
                   cfg.input_resolution, 3)

    @functools.partial(jax.jit, static_argnums=(3,))
    def fwd_many(params, a, v, n):
        def body(carry, _):
            # carry-perturbed input defeats loop hoisting; cast keeps bf16 compute
            logits = apply_fn(params, cfg,
                              a + (carry * 1e-8).astype(jnp.bfloat16), v)
            return logits.astype(jnp.float32).mean() * 1e-6, None
        acc, _ = jax.lax.scan(body, jnp.float32(0.0), None, length=n)
        return acc

    a = jnp.asarray(rng.randn(*a_shape), jnp.bfloat16)
    v = jnp.asarray(rng.randn(*v_shape), jnp.bfloat16)

    n_small, n_large = 2, 12
    # compile both variants (fetch forces real execution through the relay)
    float(fwd_many(params, a, v, n_small))
    float(fwd_many(params, a, v, n_large))

    def timed(n, reps=6):
        best = float("inf")
        for _ in range(reps):
            t0 = time.perf_counter()
            float(fwd_many(params, a, v, n))
            best = min(best, time.perf_counter() - t0)
        return best

    t_small = timed(n_small)
    t_large = timed(n_large)
    per_iter = (t_large - t_small) / (n_large - n_small)
    clips_per_sec = B / per_iter

    dev = jax.devices()[0]
    name = "CLIP-B/16" if model != "swin-base" else "Swin-Base"
    print(json.dumps({
        "metric": f"AVE {name} fusion inference throughput "
                  f"(bf16, batch={B}, on-device steady state, {dev.device_kind})",
        "value": round(clips_per_sec, 2),
        "unit": "clips/sec/chip",
        "vs_baseline": round(clips_per_sec / 500.0, 3),
    }))


if __name__ == "__main__":
    main()
