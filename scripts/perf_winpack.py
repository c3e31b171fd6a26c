"""Micro-bench: gram-pack factor sweep for the W-MSA window megakernel.

The production kernel packs 2 windows into one block-diagonal gram
(N 49->64 pad, gram 128x128). Stage-2's whole-block kernel shows (208,208)
grams at K=32 run at ~53% MFU, so higher packs (4 -> 256, 8 -> 512) may beat
the per-pass latency floor further. Sweeps pack at Swin-Base stage-0/1
geometries.

Timing: scan-length differencing inside ONE jit (carry-perturbed input so
nothing hoists) — per-dispatch relay latency here is ~100 ms, so per-call
host timing is meaningless.

Usage: python scripts/perf_winpack.py
"""
from __future__ import annotations

import functools
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir",
                  os.path.expanduser("~/.cache/stgcma_jax_tpu"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from stgcma_tpu.ops.pallas_attn import (_pack_blockdiag, _round_up,  # noqa: E402
                                        _win_block_op)

N_LO, N_HI = 8, 40


def scan_ms(f, x, *rest):
    """ms per call via scan-length differencing of one jitted scan."""

    @functools.partial(jax.jit, static_argnums=(2,))
    def many(x, rest, n):
        def body(carry, _):
            xp = x + (carry * 1e-8).astype(x.dtype)
            out = f(xp, *rest)
            return out.astype(jnp.float32).mean() * 1e-6, None
        acc, _ = jax.lax.scan(body, jnp.float32(0.0), None, length=n)
        return acc

    for n in (N_LO, N_HI):
        float(many(x, rest, n))           # compile + warm
    ts = {}
    for n in (N_LO, N_HI):
        t0 = time.perf_counter()
        float(many(x, rest, n))
        ts[n] = time.perf_counter() - t0
    return (ts[N_HI] - ts[N_LO]) / (N_HI - N_LO) * 1e3


def run_case(name, BT, nW, C, heads, shifted):
    N = 49
    NP = _round_up(N, 16)
    B_ = BT * nW
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(B_, NP, C), jnp.bfloat16)
    lns = jnp.ones((C,), jnp.bfloat16)
    lnb = jnp.zeros((C,), jnp.bfloat16)
    wqkv = jnp.asarray(rng.randn(C, 3 * C) * 0.05, jnp.bfloat16)
    rest = {"bqkv": jnp.zeros((3 * C,), jnp.bfloat16),
            "wproj": jnp.asarray(rng.randn(C, C) * 0.05, jnp.bfloat16),
            "bproj": jnp.zeros((C,), jnp.bfloat16)}
    nWb = nW if shifted else 1
    bm = jnp.asarray(rng.randn(nWb, heads, NP, NP), jnp.float32)

    print(f"-- {name} (B_={B_}, NP={NP}, C={C}, h={heads}, "
          f"{'shifted' if shifted else 'unshifted'}) --")
    ref = None
    for pack in (1, 2, 4, 8):
        if B_ % pack or (nWb != 1 and nWb % pack):
            continue

        def f(x, lns, lnb, wqkv, rest, bm, pack=pack):
            if pack == 1:
                return _win_block_op(x, lns, lnb, wqkv, rest, bm, heads)
            xp, bmp = _pack_blockdiag(x, bm, pack)
            out = _win_block_op(xp, lns, lnb, wqkv, rest, bmp, heads)
            return out.reshape(B_, NP, C)

        got = np.asarray(jax.jit(f)(x, lns, lnb, wqkv, rest, bm), np.float32)
        if ref is None:
            ref = got
        dev = np.max(np.abs(got - ref)) / (np.max(np.abs(ref)) + 1e-9)
        t = scan_ms(f, x, lns, lnb, wqkv, rest, bm)
        print(f"  pack={pack} (gram {pack*NP:3d}) : {t:7.3f} ms/call   "
              f"max-rel-dev {dev:.2e}")


def main():
    run_case("stage-0", 80, 64, 128, 4, False)
    run_case("stage-0", 80, 64, 128, 4, True)
    run_case("stage-1", 80, 16, 256, 8, False)
    run_case("stage-1", 80, 16, 256, 8, True)


if __name__ == "__main__":
    main()
