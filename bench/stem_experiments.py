"""Stem-lowering experiments: how to run conv1 (7x7/2, 3->64) fastest.

The ResNet stem is the classic low-MXU-occupancy op on TPU: 3 input
channels pack a (8, 128) vreg at ~2% and XLA's conv lowering reaches
~9% MFU (measured: 5.2 ms of a 42.5 ms step). Candidates, all
bit-equivalent to the baseline up to fp reassociation:

  a. baseline       — lax.conv 7x7 stride 2, pad 3 (what backbone.py does)
  b. space2depth    — pad kernel 7->8 leading zero, view input as 2x2
                      blocks: conv 4x4 stride 1 over [N, 112, 112, 12]
  c. im2col_gemm    — explicit patch extraction + one [M, 192] @ [192, 64]
                      GEMM from the space-to-depth layout
  d. composite112   — fold the 2x bilinear upscale INTO conv1: one 5x5
                      stride-1 conv straight on the 112x112 crop (also
                      eliminates the 4.8 ms upscale stage; edge rows
                      differ from upscale-then-conv — interior-exact)

Each prints per-step ms (384 frames) with the chained-fetch protocol.
Equivalence is asserted on CPU in tests; here we only time.
"""

import argparse
import json
import time

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=384)
    ap.add_argument("--iters", type=int, default=4)
    ap.add_argument("--chain", type=int, default=6)
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()

    import jax
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    n = args.batch
    rng = np.random.default_rng(0)
    x224 = jnp.asarray(rng.uniform(-128, 128, (n, 224, 224, 3))
                       .astype(np.float32)).astype(jnp.bfloat16)
    x112 = jnp.asarray(rng.uniform(0, 255, (n, 112, 112, 3))
                       .astype(np.float32)).astype(jnp.bfloat16)
    k7 = jnp.asarray(rng.normal(0, 0.05, (7, 7, 3, 64))
                     .astype(np.float32)).astype(jnp.bfloat16)

    def conv(x, k, stride, pad):
        if isinstance(pad[0], int):
            pad = (pad, pad)
        return jax.lax.conv_general_dilated(
            x, k, (stride, stride), list(pad),
            dimension_numbers=("NHWC", "HWIO", "NHWC"))

    def baseline(x):
        return conv(x, k7, 2, (3, 3))

    # -- space-to-depth ----------------------------------------------------
    # taps 2j-3..2j+3; pad kernel with a LEADING zero row/col -> taps
    # 2j-4..2j+3 = blocks (j-2..j+1), stride 1, pad 2 left / 1 right.
    k8 = jnp.pad(k7, ((1, 0), (1, 0), (0, 0), (0, 0)))
    # block-reorder: k8[2i+di, 2j+dj, c, o] -> k4[i, j, (di, dj, c), o]
    k4 = k8.reshape(4, 2, 4, 2, 3, 64).transpose(0, 2, 1, 3, 4, 5) \
           .reshape(4, 4, 12, 64)

    def s2d(x):
        nb, h, w, c = x.shape
        v = x.reshape(nb, h // 2, 2, w // 2, 2, c) \
             .transpose(0, 1, 3, 2, 4, 5).reshape(nb, h // 2, w // 2,
                                                  4 * c)
        return conv(v, k4, 1, ((2, 1), (2, 1)))

    # -- im2col GEMM from the s2d layout ------------------------------------
    def im2col(x):
        nb, h, w, c = x.shape
        v = x.reshape(nb, h // 2, 2, w // 2, 2, c) \
             .transpose(0, 1, 3, 2, 4, 5).reshape(nb, h // 2, w // 2,
                                                  4 * c)
        v = jnp.pad(v, ((0, 0), (2, 1), (2, 1), (0, 0)))
        cols = [v[:, i:i + 112, j:j + 112, :] for i in range(4)
                for j in range(4)]
        patches = jnp.concatenate(cols, axis=-1)        # [N,112,112,192]
        w_g = k4.reshape(16, 12, 64).reshape(192, 64)
        return (patches.reshape(-1, 192) @ w_g).reshape(nb, 112, 112, 64)

    # -- composite upscale2x . conv1 on the 112 crop -------------------------
    # u[2i] = .75 x[i] + .25 x[i-1]; u[2i+1] = .75 x[i] + .25 x[i+1]
    # out[j] = sum_k K[k] u[2j + k - 3]  ->  5-tap stride-1 kernel on x.
    up = np.zeros((7, 5), np.float32)    # tap k (0..6), x offset -2..2
    for k in range(7):
        pos = k - 3                       # u index offset from 2j
        i, r = divmod(pos + 4, 2)         # u[2m + r], m = j + i - 2
        if r == 0:
            up[k, i] += 0.75
            up[k, i - 1] += 0.25
        else:
            up[k, i] += 0.75
            up[k, i + 1] += 0.25
    comp = np.einsum("ku,lv,klcO->uvcO", up, up, np.asarray(
        k7, np.float32))                  # [5, 5, 3, 64]
    k5 = jnp.asarray(comp).astype(jnp.bfloat16)

    def composite112(x):
        return conv(x, k5, 1, ((2, 2), (2, 2)))

    variants = [("baseline_224", baseline, x224),
                ("space2depth_224", s2d, x224),
                ("im2col_gemm_224", im2col, x224),
                ("composite_112", composite112, x112)]

    from _timing import time_chained
    for name, fn, inp in variants:
        kch = args.chain
        jitted = jax.jit(lambda salt, x, _f=fn: sum(
            jnp.sum(_f((x + salt + 17.0 * i).astype(x.dtype)))
            for i in range(kch)))
        dt = time_chained(jitted, (inp,), args.iters, kch)
        print(json.dumps({"stem": name, "ms_per_step": round(dt * 1e3, 3)}))

    # numeric check (bf16 tolerance) of the s2d/gemm variants vs baseline
    a = np.asarray(baseline(x224[:2]), np.float32)
    for name, fn in (("space2depth", s2d), ("im2col", im2col)):
        b = np.asarray(fn(x224[:2]), np.float32)
        err = np.abs(a - b).max() / max(1e-6, np.abs(a).max())
        print(json.dumps({"check": name, "rel_err": float(err)}))


if __name__ == "__main__":
    main()
