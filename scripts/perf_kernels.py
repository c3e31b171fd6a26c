"""Micro-bench the Pallas kernels vs naive XLA at stage-0 shapes on TPU."""
import sys, pathlib; sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))
import functools
import time

import numpy as np
import jax
import jax.numpy as jnp

import stgcma_tpu.ops.window as W
from stgcma_tpu.ops import pallas_attn as PA
from stgcma_tpu.ops.attention import temporal_attention, window_attention


def bench(fn, args, n1, n2, label, reps=3):
    @functools.partial(jax.jit, static_argnums=(1,))
    def many(args, n):
        def body(c, _):
            out = fn(c.astype(jnp.bfloat16), *args)
            leaves = jax.tree_util.tree_leaves(out)
            s = sum(l.astype(jnp.float32).mean() for l in leaves)
            return s * 1e-9, None
        acc, _ = jax.lax.scan(body, jnp.float32(0.0), None, length=n)
        return acc

    float(many(args, n1)); float(many(args, n2))

    def tmin(n):
        best = float("inf")
        for _ in range(reps):
            t0 = time.perf_counter(); float(many(args, n))
            best = min(best, time.perf_counter() - t0)
        return best

    per = (tmin(n2) - tmin(n1)) / (n2 - n1)
    print(f"{label}: {per*1e3:.3f} ms", flush=True)
    return per


def main():
    rng = np.random.RandomState(0)
    # stage-0 W-MSA shapes: B_=5120 windows, h=4, N=49, dh=32
    B_, h, N, dh, C = 5120, 4, 49, 32, 128
    p = {"qkv": {"kernel": jnp.asarray(rng.randn(C, 3 * C) * .05, jnp.bfloat16),
                 "bias": jnp.zeros((3 * C,), jnp.bfloat16)},
         "proj": {"kernel": jnp.asarray(rng.randn(C, C) * .05, jnp.bfloat16),
                  "bias": jnp.zeros((C,), jnp.bfloat16)},
         "relative_position_bias_table": jnp.asarray(rng.randn(169, h) * .02,
                                                     jnp.bfloat16),
         "temporal_position_bias_table": jnp.asarray(rng.randn(19, h) * .02,
                                                     jnp.bfloat16),
         "temporal_position_bias_table_audio": jnp.asarray(rng.randn(19, h) * .02,
                                                           jnp.bfloat16)}
    x = jnp.asarray(rng.randn(B_, N, C), jnp.bfloat16)
    rel = jnp.asarray(W.relative_position_index(7))
    mask = jnp.asarray(W.shift_attn_mask(56, 56, 7, 3))

    bench(lambda e, x: window_attention(p, x + e, h, rel), (x,), 4, 44,
          "W-MSA naive (no mask)")
    bench(lambda e, x: PA.window_attention_fused(p, x + e, h, rel), (x,), 4, 44,
          "W-MSA fused (no mask)")
    bench(lambda e, x: PA.window_attention_fused(p, x + e, h, rel, mask=mask),
          (x,), 4, 44, "W-MSA fused (mask)")

    # temporal shapes: B*N=25088, T=10
    xt = jnp.asarray(rng.randn(25088, 10, C), jnp.bfloat16)
    tid = jnp.asarray(W.temporal_relative_index(10))
    bench(lambda e, xt: temporal_attention(p, xt + e, h, tid), (xt,), 4, 44,
          "temporal naive")
    bench(lambda e, xt: PA.temporal_attention_fused(p, xt + e, h, tid), (xt,),
          4, 44, "temporal fused")

    # joint fusion shapes: (80, 3136, 16)
    vh = jnp.asarray(rng.randn(80, 3136, 16) * .3, jnp.bfloat16)
    ah = jnp.asarray(rng.randn(80, 3136, 16) * .3, jnp.bfloat16)
    bench(lambda e, vh, ah: PA._attn_ref(vh + e, ah, ah), (vh, ah), 2, 12,
          "joint naive (one direction)")
    bench(lambda e, vh, ah: PA.unscaled_attention(vh + e, ah, ah), (vh, ah),
          2, 22, "joint pallas (one direction)")


if __name__ == "__main__":
    main()
