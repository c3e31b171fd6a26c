"""Task-level inference throughput: AVS segmentation + AVQA answering on the
Swin-Base fusion backbone (the AVE numbers live in bench.py). Same
scan-differencing steady-state harness. Run: python scripts/bench_tasks.py
"""
from __future__ import annotations

import functools
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _timed(fn, n_small=2, n_large=8, reps=4):
    float(fn(n_small))
    float(fn(n_large))

    def t(n):
        best = float("inf")
        for _ in range(reps):
            t0 = time.perf_counter()
            float(fn(n))
            best = min(best, time.perf_counter() - t0)
        return best

    return (t(n_large) - t(n_small)) / (n_large - n_small)


def main():
    import jax
    import jax.numpy as jnp
    jax.config.update("jax_compilation_cache_dir",
                      os.path.expanduser("~/.cache/stgcma_jax_tpu"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from stgcma_tpu.configs import AVQAHeadConfig, AVSHeadConfig, swin_base
    from stgcma_tpu.models import avqa, avs
    from stgcma_tpu.ops.common import cast_tree

    rng = np.random.RandomState(0)

    # ---- AVS: 5-frame clips, 224x224 masks -------------------------------
    B = int(os.environ.get("AVS_BATCH", "4"))
    cfg = swin_base(ftmode="fusion", label_dim=29, num_frames=5)
    hcfg = AVSHeadConfig(stage_dims=tuple(cfg.stage_dim(i) for i in range(4)),
                         audio_dim=cfg.num_features, num_frames=5)
    params = cast_tree(avs.init_avs(jax.random.PRNGKey(0), cfg, hcfg),
                       jnp.bfloat16)
    a = jnp.asarray(rng.randn(B, 5, cfg.img_size, cfg.img_size), jnp.bfloat16)
    v = jnp.asarray(rng.randn(B, 5, cfg.img_size, cfg.img_size, 3),
                    jnp.bfloat16)

    @functools.partial(jax.jit, static_argnums=(3,))
    def avs_many(params, a, v, n):
        def body(carry, _):
            masks = avs.apply_avs(params, cfg, hcfg,
                                  a + (carry * 1e-8).astype(jnp.bfloat16), v)[0]
            return masks.astype(jnp.float32).mean() * 1e-6, None
        acc, _ = jax.lax.scan(body, jnp.float32(0.0), None, length=n)
        return acc

    per = _timed(lambda n: avs_many(params, a, v, n))
    print(f"AVS (Swin-Base fusion + ASPP/TPAVI/FPN decoder, B={B}, 5 frames):"
          f" {B * 5 / per:.1f} masks/s  ({B / per:.1f} clips/s)", flush=True)

    # ---- AVQA: question answering (pos+neg visual streams + LSTM) --------
    B = int(os.environ.get("AVQA_BATCH", "4"))
    cfg = swin_base(ftmode="fusion", label_dim=42, num_frames=10,
                    with_nega_stream=True)
    qcfg = AVQAHeadConfig(feat_dim=cfg.num_features, grid=7, num_frames=10)
    params = cast_tree(avqa.init_avqa(jax.random.PRNGKey(0), cfg, qcfg),
                       jnp.bfloat16)
    a = jnp.asarray(rng.randn(B, 10, cfg.img_size, cfg.img_size), jnp.bfloat16)
    v = jnp.asarray(rng.randn(B, 10, cfg.img_size, cfg.img_size, 3),
                    jnp.bfloat16)
    vn = jnp.asarray(rng.randn(B, 10, cfg.img_size, cfg.img_size, 3),
                     jnp.bfloat16)
    q = jnp.asarray(rng.randint(1, 90, (B, 14)), jnp.int32)

    @functools.partial(jax.jit, static_argnums=(5,))
    def avqa_many(params, a, v, vn, q, n):
        def body(carry, _):
            # perturb EVERY independent input stream with the carry: the nega
            # tower and the question LSTM are data-independent of the audio
            # stream, so a loop-invariant vn/q would let XLA hoist ~1/3 of the
            # visual compute + the LSTM out of the timed scan
            eps = (carry * 1e-8).astype(jnp.bfloat16)
            # data-dependent select XLA cannot fold away; ids stay valid
            qp = jnp.where(carry > 1e30, q + 1, q)
            out = avqa.apply_avqa(params, cfg, qcfg, a + eps,
                                  v + eps, vn + eps, qp)[0]
            return out.astype(jnp.float32).mean() * 1e-6, None
        acc, _ = jax.lax.scan(body, jnp.float32(0.0), None, length=n)
        return acc

    per = _timed(lambda n: avqa_many(params, a, v, vn, q, n))
    print(f"AVQA (Swin-Base fusion, pos+neg streams + LSTM QA head, B={B}):"
          f" {B / per:.1f} questions/s", flush=True)


if __name__ == "__main__":
    main()
