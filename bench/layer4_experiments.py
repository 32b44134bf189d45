"""layer4 lowering experiments: close the 54.7% MFU gap (roofline row).

VERDICT round-3 directive 1: layer4 is the one conv-stack stage with
unexplained headroom — 6.08 ms measured vs a 3.33 ms flop bound
(54.7% MFU). Hypothesis: 7x7 spatial grids tile the MXU poorly (XLA's
conv emitter pads the 7-row sublane dim and windows over a tiny grid),
while the same FLOPs as [N*49, C] @ [C, C'] GEMMs (M = 18,816 rows)
tile near-perfectly. Variants, all bit-equivalent to the baseline up
to f32-accumulation reassociation:

  a. conv_baseline  — bottlenecks via lax.conv (what backbone.py does)
  b. dot4d          — 1x1 convs as channel-contraction dot_general on
                      [N, 7, 7, C]; 3x3 convs stay lax.conv
  c. flat_gemm      — the whole stage in 2-D [N*49, C]: 1x1 convs are
                      plain GEMMs; the 3x3 conv is 9 shifted GEMMs
                      accumulated in f32 (pad to 9x9, slice per tap)
  d. flat_im2col    — as (c) but the 3x3 conv is one concat-im2col
                      [N*49, 9*512] @ [4608, 512] GEMM
  e. conv_pad8      — lax.conv on a zero-padded 8x8 grid (re-zeroing
                      the pad row/col between blocks) to see whether
                      XLA's 7->8 spatial padding is the cost

Each variant is also timed WITH the global-average pool fused (the real
network consumes pooled [N, 2048]), because a winning formulation must
keep its win when the pool prevents the chained protocol from DCE-ing
the final write. Prints per-step ms (384 frames) with the salted-chain
depth-2 protocol (bench/stages.py conventions) plus a bf16-tolerance
numeric check of every variant against conv_baseline.

    python bench/layer4_experiments.py [--cpu --batch 8]
"""

import argparse
import functools
import json
import time

import numpy as np

WIDTH, OUT_W, C_IN = 512, 2048, 1024
BLOCKS = 3


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=384)
    ap.add_argument("--iters", type=int, default=6)
    ap.add_argument("--chain", type=int, default=6)
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()

    import jax
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    from jax import lax

    f32 = jnp.float32
    rng = np.random.default_rng(0)

    def mk(shape, scale=0.03):
        return jnp.asarray(rng.normal(0, scale, shape)
                           .astype(np.float32)).astype(jnp.bfloat16)

    # fused-BN inference weights: conv kernel + bias per conv
    weights = []
    c = C_IN
    for b in range(BLOCKS):
        p = {"conv1": (mk((1, 1, c, WIDTH)), mk((WIDTH,))),
             "conv2": (mk((3, 3, WIDTH, WIDTH)), mk((WIDTH,))),
             "conv3": (mk((1, 1, WIDTH, OUT_W)), mk((OUT_W,)))}
        if b == 0:
            p["down"] = (mk((1, 1, c, OUT_W)), mk((OUT_W,)))
        weights.append(p)
        c = OUT_W

    def conv(x, kb, stride=1, pad=0):
        k, bias = kb
        y = lax.conv_general_dilated(
            x, k, (stride, stride), [(pad, pad), (pad, pad)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        return y + bias

    def relu(x):
        return jnp.maximum(x, 0)

    # -- a. baseline -------------------------------------------------------
    def conv_baseline(x):
        for b, p in enumerate(weights):
            stride = 2 if b == 0 else 1
            res = conv(x, p["down"], stride) if b == 0 else x
            y = relu(conv(x, p["conv1"], stride))     # stride_in_1x1
            y = relu(conv(y, p["conv2"], 1, pad=1))
            y = conv(y, p["conv3"])
            x = relu(y + res)
        return x

    # -- b. dot4d: 1x1 convs as channel-contraction dots -------------------
    def dot1x1(x, kb):
        k, bias = kb
        y = lax.dot_general(x, k[0, 0], (((x.ndim - 1,), (0,)), ((), ())),
                            preferred_element_type=f32)
        return (y + bias.astype(f32)).astype(jnp.bfloat16)

    def dot4d(x):
        for b, p in enumerate(weights):
            if b == 0:
                x = x[:, ::2, ::2, :]                 # stride-2 entry
                res = dot1x1(x, p["down"])
            else:
                res = x
            y = relu(dot1x1(x, p["conv1"]))
            y = relu(conv(y, p["conv2"], 1, pad=1))
            y = dot1x1(y, p["conv3"])
            x = relu(y + res)
        return x

    # -- c/d. flat 2-D formulations ---------------------------------------
    def gemm(x2, kb):                                  # [M, Cin] @ 1x1
        k, bias = kb
        y = lax.dot_general(x2, k.reshape(k.shape[-2:]),
                            (((1,), (0,)), ((), ())),
                            preferred_element_type=f32)
        return (y + bias.astype(f32)).astype(jnp.bfloat16)

    def shifts3x3(x2, n):
        """[N*49, C] -> 9 shifted [N*49, C] views (zero-halo taps)."""
        xc = x2.reshape(n, 7, 7, x2.shape[-1])
        xp = jnp.pad(xc, ((0, 0), (1, 1), (1, 1), (0, 0)))
        return [xp[:, dy:dy + 7, dx:dx + 7, :].reshape(x2.shape)
                for dy in range(3) for dx in range(3)]

    def conv3x3_shift(x2, kb, n):
        k, bias = kb
        acc = None
        for t, xs in enumerate(shifts3x3(x2, n)):
            y = lax.dot_general(xs, k[t // 3, t % 3],
                                (((1,), (0,)), ((), ())),
                                preferred_element_type=f32)
            acc = y if acc is None else acc + y
        return (acc + bias.astype(f32)).astype(jnp.bfloat16)

    def conv3x3_im2col(x2, kb, n):
        k, bias = kb
        patches = jnp.concatenate(shifts3x3(x2, n), axis=-1)
        y = lax.dot_general(patches, k.reshape(-1, k.shape[-1]),
                            (((1,), (0,)), ((), ())),
                            preferred_element_type=f32)
        return (y + bias.astype(f32)).astype(jnp.bfloat16)

    def make_flat(conv3x3):
        def f(x):
            n = x.shape[0]
            x2 = x[:, ::2, ::2, :].reshape(n * 49, C_IN)
            for b, p in enumerate(weights):
                res = gemm(x2, p["down"]) if b == 0 else x2
                y = relu(gemm(x2, p["conv1"]))
                y = relu(conv3x3(y, p["conv2"], n))
                y = gemm(y, p["conv3"])
                x2 = relu(y + res)
            return x2.reshape(n, 7, 7, OUT_W)
        return f

    flat_gemm = make_flat(conv3x3_shift)
    flat_im2col = make_flat(conv3x3_im2col)

    # -- e. conv on an explicit 8x8 zero-padded grid -----------------------
    def conv_pad8(x):
        x = x[:, ::2, ::2, :]
        x = jnp.pad(x, ((0, 0), (0, 1), (0, 1), (0, 0)))   # 7x7 -> 8x8
        mask = (jnp.arange(8) < 7).astype(jnp.bfloat16)
        mask2 = mask[:, None] * mask[None, :]
        for b, p in enumerate(weights):
            res = conv(x, p["down"]) if b == 0 else x
            y = relu(conv(x, p["conv1"]))
            y = relu(conv(y, p["conv2"], 1, pad=1))
            y = conv(y, p["conv3"])
            # re-zero the pad row/col so the next block's 3x3 halo
            # reads zeros there (matches the true zero padding)
            x = relu(y + res) * mask2[None, :, :, None]
        return x[:, :7, :7, :]
    conv_pad8.pre_strided = True

    def with_pool(fn):
        def f(x):
            y = fn(x).astype(f32)
            return jnp.mean(y, axis=(1, 2))
        return f

    variants = [("conv_baseline", conv_baseline),
                ("dot4d", dot4d),
                ("flat_gemm", flat_gemm),
                ("flat_im2col", flat_im2col),
                ("conv_pad8", conv_pad8)]

    # numeric check vs baseline (bf16 tolerance), small input. ONE
    # jitted program per variant — eager ops through the axon tunnel
    # each cost a remote compile (CLAUDE.md), so never run this
    # section op-by-op.
    xs = jnp.asarray(rng.standard_normal((2, 14, 14, C_IN)),
                     jnp.bfloat16)
    ref = np.asarray(jax.jit(conv_baseline)(xs), np.float32)
    for name, fn in variants[1:]:
        got = np.asarray(jax.jit(fn)(xs), np.float32)
        err = np.abs(ref - got).max() / max(1e-6, np.abs(ref).max())
        print(json.dumps({"check": name, "rel_err": round(float(err), 6)}),
              flush=True)
        assert err < 2e-2, (name, err)

    from _timing import time_chained

    def timeit(fn):
        k = args.chain

        def chained(salt, x):
            return sum(jnp.sum(fn(x + (salt + 17 * i).astype(x.dtype))
                               .astype(f32)) for i in range(k))

        x = jax.jit(lambda: jax.random.normal(
            jax.random.PRNGKey(1), (args.batch, 14, 14, C_IN),
            f32).astype(jnp.bfloat16))()
        return time_chained(jax.jit(chained), (x,), args.iters, k)

    gflop = 562.0 * args.batch / 384            # roofline table scaling
    for name, fn in variants:
        dt = timeit(fn)
        print(json.dumps({"layer4": name,
                          "ms_per_step": round(dt * 1e3, 3),
                          "tflops": round(gflop / dt / 1e3, 1)}),
              flush=True)
    for name, fn in variants:
        dt = timeit(with_pool(fn))
        print(json.dumps({"layer4": name + "+pool",
                          "ms_per_step": round(dt * 1e3, 3),
                          "tflops": round(gflop / dt / 1e3, 1)}),
              flush=True)


if __name__ == "__main__":
    main()
