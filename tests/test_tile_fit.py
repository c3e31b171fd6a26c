"""Tile-fit policy for the row-tiled Pallas wrappers.

Partial last blocks (ceil-div grids with store-masked OOB rows) measured
exact in inference graphs but hard-faulted the TPU worker inside train
graphs (CLIP-B/16 fwd+bwd at B=2 — the temporal megakernel's B_=50/TW=8
grid), so every wrapper now either fits an EXACT divisor tile or pads
explicitly. These tests pin that invariant and the fit quality at the
production shapes.
"""
import jax
import jax.numpy as jnp
import numpy as np

from stgcma_tpu.ops.pallas_attn import _fit_tile, _fit_tile8


def test_fit_tile_exact_divisors_at_hot_shapes():
    # Swin stage-0 windowed rows: 5120 groups of nW=64 -> want 3 groups
    t, rp = _fit_tile(5120 // 64, 3)
    assert rp == 5120 // 64 and (5120 // 64) % t == 0 and t >= 2
    # Swin stage-0 temporal packed rows: 3136 rows, budget 51 -> divisor 49
    t, rp = _fit_tile(3136, 51)
    assert (t, rp) == (49, 3136)
    # CLIP temporal at B=2: 50 packed rows, budget 8 -> divisor 5 (>= want/2)
    t, rp = _fit_tile(50, 8)
    assert (t, rp) == (5, 50)
    # degenerate: want >= R -> single full block, no pad
    t, rp = _fit_tile(7, 100)
    assert (t, rp) == (7, 7)


def test_fit_tile_pad_fallback_keeps_budget():
    # prime row count with no usable divisor >= want/2 -> pad to want
    t, rp = _fit_tile(197, 8)
    assert t == 8 and rp == 200 and rp % t == 0
    # never a partial block: rp is always a tile multiple
    for r in (1, 2, 13, 49, 50, 197, 3940):
        for w in (1, 3, 8, 51, 344, 1024):
            t, rp = _fit_tile(r, w)
            assert rp % t == 0 and rp >= r


def test_fit_tile8_sublane_aligned():
    # CLIP FFN rows at B=2 (3940 = 2^2*5*197, no 8-multiple divisor) -> pad
    t, mp = _fit_tile8(3940, 344)
    assert t % 8 == 0 and mp % t == 0 and mp >= 3940
    # Swin stage-0 FFN rows: 250880 = 2^10 * 245 -> 1024 divides exactly
    t, mp = _fit_tile8(250880, 1024)
    assert (t, mp) == (1024, 250880)
    for m in (8, 12, 3940, 15760, 250880):
        for w in (8, 344, 680, 1024):
            t, mp = _fit_tile8(m, w)
            assert t % 8 == 0 and mp % t == 0 and mp >= m


def test_win_block_unaligned_group_count_matches_naive():
    """The exact shape class that faulted on hardware: group count not a
    multiple of the tile budget (CLIP temporal pack at B=2: 50 groups of
    nW=1, budget 8). Pins wrapper numerics through the pad/fit path."""
    from stgcma_tpu.ops.pallas_attn import _win_block_naive, _win_block_op
    rng = np.random.RandomState(0)
    B_, N, C, heads = 50, 16, 32, 2
    x = jnp.asarray(rng.randn(B_, N, C), jnp.float32)
    lns = jnp.asarray(rng.rand(C) + 0.5, jnp.float32)
    lnb = jnp.asarray(rng.randn(C) * 0.1, jnp.float32)
    wqkv = jnp.asarray(rng.randn(C, 3 * C) * 0.1, jnp.float32)
    rest = {"bqkv": jnp.asarray(rng.randn(3 * C) * 0.1, jnp.float32),
            "wproj": jnp.asarray(rng.randn(C, C) * 0.1, jnp.float32),
            "bproj": jnp.asarray(rng.randn(C) * 0.1, jnp.float32)}
    bm = jnp.asarray(rng.randn(1, heads, N, N), jnp.float32)
    got = _win_block_op(x, lns, lnb, wqkv, rest, bm, heads)
    ln = {"scale": lns, "bias": lnb}
    attn_p = {"qkv": {"kernel": wqkv, "bias": rest["bqkv"]},
              "proj": {"kernel": rest["wproj"], "bias": rest["bproj"]}}
    want = _win_block_naive(x, ln, attn_p, heads, bm.reshape(heads, N, N))
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-4, atol=2e-4)
