"""Packed-output stem experiments: kill the 64->128 lane-padding write.

VERDICT r3 directive 1 (second avenue): the composite stem's main conv
(5x5 stride-1 on the 112x112 crop, ``backbone.composite_stem``) writes
a [N, 112, 112, 64] activation whose 64-channel minor dim is lane-
padded to 128 on TPU — a 2x write amplification on the largest stem
tensor (round-2 finding; roofline puts the stem at 41.5% of measured
HBM BW, consistent with exactly that padding).

Idea: emit the conv output *already space-to-depth packed* so the
minor dim is a full 128/256 lanes of REAL data, and make the maxpool
consume the packed layout directly (the pooled [N, 56, 56, 64] result
is 4x smaller, so its own padding costs 4x less):

  a. current     — conv5 s1 -> +bias relu -> maxpool 3x3/2  (production
                   lowering, minus the edge-correction slabs which cost
                   the same in every variant)
  b. packed_w    — kernel [5, 6, 3, 128], stride (1, 2): channel block
                   dw in {0,1} holds k5 shifted by dw in W, so
                   out[n, i, q, dw*64+o] == current[n, i, 2q+dw, o].
                   Pool unpacks W via 3 channel-block maxes, rows via
                   shifted slices.
  c. packed_hw   — kernel [6, 6, 3, 256], stride (2, 2): block (dh, dw)
                   holds k5 shifted by (dh, dw), so
                   out[n, p, q, (2dh+dw)*64+o] == current[n, 2p+dh, 2q+dw, o].
                   The conv write is EXACTLY the real bytes (no padding).
                   Pool = max over the 9 (row, col) choices, each a
                   shifted slice of a channel quarter.

All variants end at the same [N, 56, 56, 64] pooled tensor; a numeric
equivalence check runs at the end (f32, small batch). Timing uses the
chained-salted-fetch protocol (bench/stages.py conventions: the ~22 ms
tunnel dispatch floor is amortized over --chain applications per fetch).
"""

import argparse
import json
import time

import numpy as np

NEG = -1e30  # -inf stand-in that survives bf16


def build_variants(jnp, jax, k5, bias, work):
    def conv(v, kern, strides, pad):
        return jax.lax.conv_general_dilated(
            v, kern.astype(work), strides, pad,
            dimension_numbers=("NHWC", "HWIO", "NHWC"))

    def pool(z):
        return jax.lax.reduce_window(
            z, -jnp.inf if work == jnp.float32 else jnp.asarray(NEG, work),
            jax.lax.max, (1, 3, 3, 1), (1, 2, 2, 1),
            ((0, 0), (1, 1), (1, 1), (0, 0)))

    def current(x):
        z = jax.nn.relu(conv(x, k5, (1, 1), [(2, 2), (2, 2)]) + bias)
        return pool(z)

    # -- packed W: k[5, 6, 3, 128], stride (1, 2) ---------------------------
    k5n = np.asarray(k5, np.float32)
    kw = np.zeros((5, 6, 3, 128), np.float32)
    for dw in range(2):
        kw[:, dw:dw + 5, :, dw * 64:(dw + 1) * 64] = k5n
    kw = jnp.asarray(kw)
    bias_w = jnp.concatenate([bias, bias], axis=-1)

    def packed_w(x):
        zp = jax.nn.relu(conv(x, kw, (1, 2), [(2, 2), (2, 2)]) + bias_w)
        # zp: [N, 112, 56, 128]; col window {2q-1, 2q, 2q+1} =
        # blocks (q-1, dw=1), (q, dw=0), (q, dw=1)
        zpp = jnp.pad(zp, ((0, 0), (0, 0), (1, 0), (0, 0)),
                      constant_values=NEG)
        cmax = jnp.maximum(
            jnp.maximum(zpp[:, :, :-1, 64:], zpp[:, :, 1:, :64]),
            zpp[:, :, 1:, 64:])                       # [N, 112, 56, 64]
        # row window {2p-1, 2p, 2p+1}, stride 2
        return jax.lax.reduce_window(
            cmax, jnp.asarray(NEG, cmax.dtype), jax.lax.max,
            (1, 3, 1, 1), (1, 2, 1, 1), ((0, 0), (1, 1), (0, 0), (0, 0)))

    # -- packed HW: k[6, 6, 3, 256], stride (2, 2) --------------------------
    khw = np.zeros((6, 6, 3, 256), np.float32)
    for dh in range(2):
        for dw in range(2):
            blk = 2 * dh + dw
            khw[dh:dh + 5, dw:dw + 5, :, blk * 64:(blk + 1) * 64] = k5n
    khw = jnp.asarray(khw)
    bias_hw = jnp.concatenate([bias] * 4, axis=-1)

    def packed_hw(x):
        zp = jax.nn.relu(conv(x, khw, (2, 2), [(2, 2), (2, 2)]) + bias_hw)
        # zp: [N, 56, 56, 256]; block (dh, dw) at channels (2dh+dw)*64.
        zpp = jnp.pad(zp, ((0, 0), (1, 0), (1, 0), (0, 0)),
                      constant_values=NEG)
        blocks = {(dh, dw): zpp[..., (2 * dh + dw) * 64:
                                (2 * dh + dw + 1) * 64]
                  for dh in range(2) for dw in range(2)}
        # pool row 2p+i-1, i in {0,1,2} -> (a, dh) in
        # {(0, 1), (1, 0), (1, 1)} with padded index p + a; same for cols.
        sels = [(0, 1), (1, 0), (1, 1)]
        out = None
        for a, dh in sels:
            for b, dw in sels:
                term = blocks[(dh, dw)][:, a:a + 56, b:b + 56, :]
                out = term if out is None else jnp.maximum(out, term)
        return out

    return [("current", current), ("packed_w", packed_w),
            ("packed_hw", packed_hw)]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=384)
    ap.add_argument("--iters", type=int, default=4)
    ap.add_argument("--chain", type=int, default=6)
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--check-only", action="store_true")
    args = ap.parse_args()

    import jax
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    rng = np.random.default_rng(0)
    k7 = rng.normal(0, 0.05, (7, 7, 3, 64)).astype(np.float32)
    import os
    import sys
    sys.path.insert(0, os.path.dirname(
        os.path.dirname(os.path.abspath(__file__))))
    from mimamo_tpu.backbone import _UP
    k5f = np.einsum("ku,lv,klcO->uvcO", _UP, _UP, k7)
    bias_f = rng.normal(0, 0.1, (64,)).astype(np.float32)

    # numeric equivalence first (f32, small)
    k5_32, b_32 = jnp.asarray(k5f), jnp.asarray(bias_f)
    x_chk = jnp.asarray(rng.uniform(-128, 128, (2, 112, 112, 3))
                        .astype(np.float32))
    v32 = build_variants(jnp, jax, k5_32, b_32, jnp.float32)
    ref = np.asarray(v32[0][1](x_chk))
    for name, fn in v32[1:]:
        got = np.asarray(fn(x_chk))
        err = np.abs(ref - got).max() / max(1e-6, np.abs(ref).max())
        print(json.dumps({"check": name, "rel_err": float(err),
                          "shape": list(got.shape)}))
        assert err < 1e-5, (name, err)
    if args.check_only:
        return

    n = args.batch
    work = jnp.bfloat16
    x = jnp.asarray(rng.uniform(-128, 128, (n, 112, 112, 3))
                    .astype(np.float32)).astype(work)
    variants = build_variants(jnp, jax, k5_32.astype(work),
                              b_32.astype(work), work)
    from _timing import time_chained
    for name, fn in variants:
        kch = args.chain
        jitted = jax.jit(lambda salt, v, _f=fn: sum(
            jnp.sum(_f((v + salt + 17.0 * i).astype(v.dtype)))
            for i in range(kch)))
        dt = time_chained(jitted, (x,), args.iters, kch)
        print(json.dumps({"stem": name, "ms_per_step": round(dt * 1e3, 3)}))


if __name__ == "__main__":
    main()
