"""Dissect CLIP-B/16 AVE fusion per-component cost on TPU."""
import sys, pathlib; sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))
import functools
import time

import numpy as np
import jax
import jax.numpy as jnp

from stgcma_tpu.configs import clip_b16
from stgcma_tpu.models import ave
from stgcma_tpu.nn import clip_vit
from stgcma_tpu.ops.common import cast_tree, layernorm


def bench(fn, args, n1, n2, label, reps=4):
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
    cfg = clip_b16(ftmode="fusion", label_dim=29)
    params = cast_tree(ave.init_clip_ave(jax.random.PRNGKey(0), cfg), jnp.bfloat16)
    bp = params["backbone"]["resblocks"][0]
    B = 8
    rng = np.random.RandomState(0)
    BT = B * cfg.num_frames
    Nv, Na, C, h = 197, 49, 768, 12
    v = jnp.asarray(rng.randn(BT, Nv, C) * .2, jnp.bfloat16)
    a = jnp.asarray(rng.randn(BT, Na, C) * .2, jnp.bfloat16)

    bench(lambda e, v, a: clip_vit._fusion(bp, v + e, a, cfg), (v, a), 4, 44,
          "full fusion block (x12)")
    bench(lambda e, v: clip_vit._t_adapt(bp, v + e, h, cfg.num_frames,
                                         "T_Adapter"), (v,), 4, 44,
          "t_adapt (visual)")
    bench(lambda e, v: clip_vit._attention(bp, layernorm(bp["ln_1"], v + e), h),
          (v,), 4, 44, "dense attention (visual 197 tokens)")
    bench(lambda e, v: clip_vit._ffn_clip(bp, v + e), (v,), 4, 44, "FFN (visual)")
    from stgcma_tpu.ops.pallas_attn import cross_modal_fuse_flash
    from stgcma_tpu.nn.adapters import adapter_hidden, adapter_out
    def fuse(e, v, a):
        vh = adapter_hidden(bp["S_Adapter"], v + e)
        ah = adapter_hidden(bp["S_Adapter_Audio"], a)
        vh, ah = cross_modal_fuse_flash(vh, ah, bp["gate_v"], bp["gate_a"])
        return adapter_out(bp["S_Adapter"], vh), adapter_out(bp["S_Adapter_Audio"], ah)
    bench(fuse, (v, a), 4, 44, "token-level STG-CMA fusion")
    # embed
    vi = jnp.asarray(rng.randn(B, 10, 224, 224, 3), jnp.bfloat16)
    bench(lambda e, vi: clip_vit._embed(params["backbone"], vi + e, "conv1",
                                        "positional_embedding", cfg),
          (vi,), 4, 24, "visual patchify+embed")


if __name__ == "__main__":
    main()
