"""Sweep rows_per_tile for the W-MSA kernel + isolate transpose overhead."""
import sys, pathlib; sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))
import functools
import time

import numpy as np
import jax
import jax.numpy as jnp

import stgcma_tpu.ops.window as W
from stgcma_tpu.ops import pallas_attn as PA


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
    B_, h, N, dh = 5120, 4, 49, 32
    R = B_ * h
    q = jnp.asarray(rng.randn(R, N, dh) * .2, jnp.bfloat16)
    k = jnp.asarray(rng.randn(R, N, dh) * .2, jnp.bfloat16)
    v = jnp.asarray(rng.randn(R, N, dh), jnp.bfloat16)
    bm = jnp.asarray(rng.randn(h, N, N) * .02, jnp.float32)

    for tr in (64, 128, 256, 512, 1024):
        bench(lambda e, q, k, v, tr=tr: PA._wmsa_pallas(q + e, k, v, bm,
                                                        rows_per_tile=tr),
              (q, k, v), 4, 44, f"wmsa core TR={tr}")

    # transpose overhead isolation: the 5D split/merge around the kernel
    C = h * dh
    x3 = jnp.asarray(rng.randn(B_, N, 3 * C), jnp.bfloat16)
    def split_merge(e, x3):
        qkv = (x3 + e).reshape(B_, N, 3, h, dh).transpose(2, 0, 3, 1, 4)
        qq = qkv[0].reshape(R, N, dh)
        return qq.reshape(B_, h, N, dh).transpose(0, 2, 1, 3).reshape(B_, N, C)
    bench(split_merge, (x3,), 8, 72, "qkv split + head merge transposes")


if __name__ == "__main__":
    main()
