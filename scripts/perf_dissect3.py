"""Round 3: dissect INSIDE the stage-0 fusion block to find the pathological op."""
import sys, pathlib; sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))
import functools
import time

import numpy as np
import jax
import jax.numpy as jnp

from stgcma_tpu.configs import swin_base
from stgcma_tpu.models import ave
from stgcma_tpu.nn import swin
from stgcma_tpu.nn.adapters import adapter_hidden, adapter_out
from stgcma_tpu.ops import window as W
from stgcma_tpu.ops.attention import cross_modal_fuse, qkv_attention, window_attention
from stgcma_tpu.ops.common import cast_tree, layernorm, linear, mlp_apply


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

    def t(n):
        return min(time.perf_counter() - t0
                   for t0 in [time.perf_counter()]
                   for _ in [float(many(args, n))])

    def tmin(n):
        best = float("inf")
        for _ in range(reps):
            t0 = time.perf_counter(); float(many(args, n))
            best = min(best, time.perf_counter() - t0)
        return best

    per = (tmin(n2) - tmin(n1)) / (n2 - n1)
    print(f"{label}: {per*1e3:.3f} ms/iter", flush=True)
    return per


def main():
    cfg = swin_base(ftmode="fusion", label_dim=29)
    params = cast_tree(ave.init_swin_ave(jax.random.PRNGKey(0), cfg), jnp.bfloat16)
    B = 8
    rng = np.random.RandomState(0)
    statics = swin.backbone_statics(cfg)
    st = statics[0][0]           # stage 0, t_attn block, no shift
    st1 = statics[0][1]          # shift block
    bp = params["backbone"]["layers"][0]["blocks"][0]
    bp1 = params["backbone"]["layers"][0]["blocks"][1]
    BT = B * cfg.num_ttokens
    N = st.H * st.W
    C = st.dim
    x = jnp.asarray(rng.randn(BT, N, C), jnp.bfloat16)
    rel = jnp.asarray(swin._StaticCache.rel_index(st.window_size))

    print(f"stage0: BT={BT} N={N} C={C} heads={st.num_heads} ws={st.window_size}",
          flush=True)

    # 1. layernorm alone
    bench(lambda e, x: layernorm(bp["norm1"], x + e), (x,), 8, 72, "layernorm")

    # 2. qkv+proj linears alone (token-level 2D matmuls)
    def lin_only(e, x):
        y = linear(bp["attn"]["qkv"], x + e)
        return linear(bp["attn"]["proj"], y[..., :C])
    bench(lin_only, (x,), 8, 72, "qkv+proj linears")

    # 3. mlp alone
    bench(lambda e, x: mlp_apply(bp["mlp"], x + e), (x,), 8, 72, "mlp (4x)")

    # 4. window partition + reverse + roll only
    def win_only(e, x):
        y = (x + e).reshape(BT, st.H, st.W, C)
        y = jnp.roll(y, (-3, -3), axis=(1, 2))
        w = W.window_partition(y, st.window_size)
        y = W.window_reverse(w, st.window_size, st.H, st.W)
        y = jnp.roll(y, (3, 3), axis=(1, 2))
        return y.reshape(BT, N, C)
    bench(win_only, (x,), 8, 72, "partition+reverse+roll")

    # 5. full window attention (no shift)
    def wattn(e, x):
        xw = W.window_partition((x + e).reshape(BT, st.H, st.W, C), st.window_size)
        return window_attention(bp["attn"], xw, st.num_heads, rel)
    bench(wattn, (x,), 8, 72, "window attention (W-MSA)")

    # 6. temporal branch
    bench(lambda e, x: swin._temporal_branch(bp, x + e, st, "video", "T_Adapter"),
          (x,), 8, 72, "temporal branch")

    # 7. spatial cross-modal fusion on windows
    xw = jnp.asarray(rng.randn(BT * 64, 49, C), jnp.bfloat16)
    def fuse_only(e, xw):
        vh = adapter_hidden(bp["S_Adapter2"], xw + e)
        ah = adapter_hidden(bp["S_Adapter2_Audio"], xw)
        vh, ah = cross_modal_fuse(vh, ah, bp["gate_v"], bp["gate_a"])
        return (adapter_out(bp["S_Adapter2"], vh),
                adapter_out(bp["S_Adapter2_Audio"], ah))
    bench(fuse_only, (xw,), 8, 72, "spatial STG-CMA fusion")

    # 8. joint fusion over full-length tokens (N=3136!)
    def joint_only(e, x):
        vh = adapter_hidden(bp["S_Adapter"], x + e)
        ah = adapter_hidden(bp["S_Adapter_Audio"], x)
        vh, ah = cross_modal_fuse(vh, ah, bp["gate_v"], bp["gate_a"])
        return adapter_out(bp["S_Adapter"], vh), adapter_out(bp["S_Adapter_Audio"], ah)
    bench(joint_only, (x,), 4, 20, "joint STG-CMA fusion (N=3136 bmm!)")


if __name__ == "__main__":
    main()
