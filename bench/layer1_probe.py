"""Layer1 fusion probe: is the last unprobed conv stage worth a kernel?

VERDICT r4 directive 8: layer1 is the one stage neither optimized nor
closed — 10.51 ms/384-frame step, 78.3% of measured HBM bandwidth
against an analytic LOWER-bound byte count (BASELINE.md roofline), so
nominal headroom 1.28x. The known objection to a fused VMEM-resident
kernel (layer2_probe.py formulation) is layer1's 64-channel width:
every bottleneck dot has K and/or N = 64, wasting half the 128 MXU
lanes and most of its 256-deep contraction. This probe writes that
objection down as three measurements instead of an assertion:

  1. **XLA stage time** (same salted-chain protocol as the roofline) —
     the number a kernel must beat, refreshed in-process so the verdict
     is not a cross-day comparison.
  2. **Dots-only Pallas attribution** at the hypothetical kernel's
     exact dot set (grid=(N,), 3 unrolled bottleneck blocks on the
     padded 58x64 flattened grid, dx packed into K for conv2 — the
     layer2_probe.py formulation transposed to width 64, WITHOUT tap
     shifts/masks, so the measured time is a LOWER bound on any real
     kernel of this shape). If the dots alone are no faster than XLA's
     whole stage (which also pays the ~5.9 GB of HBM traffic the
     kernel would save), the avenue is closed a fortiori — the same
     attribution that closed layer2 (BASELINE.md 2026-08-18), whose
     dots were 128-lane aligned and still starved.
  3. **K/N=64 GEMM ceiling** (plain XLA, huge M, no per-frame
     streaming) — separates the intrinsic narrow-operand MXU ceiling
     from the per-frame-streaming effect, at the four dot shapes the
     kernel would issue: (K,N) = (64,64), (256,64), (192,64), (64,256)
     vs a 2048-cube reference.

Per-frame dot FLOPs executed by the attribution kernel: 1.581 GFLOP
(vs 1.336 analytic for the true 56x56 grid — the 3712-row padded grid
carries an 18% row overcount; both numbers are printed so the verdict
can be read either way).

    python bench/layer1_probe.py [--cpu] [--interpret] [--batch 384]

Verdict goes to BASELINE.md either way (measured win or measured
negative result).
"""

import argparse
import json
import sys

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import numpy as np

GRID_H, GRID_W = 58, 64          # padded 56x56 grid; row stride 64
P = GRID_H * GRID_W              # 3712 flattened grid rows
HALO = 64                        # conv2 scratch halo rows above/below
WIDTH, OUT_W, C_IN = 64, 256, 64
BLOCKS = 3
IN_HW = 56


def make_kernel_dots(jnp, pl, pltpu, jax):
    """Dots-only attribution kernel: the exact MXU dot sequence of a
    hypothetical fused layer1 (unrolled 3 blocks, conv2's dx packed
    into K=192), with NO tap assembly, pad masks, or sublane shifts —
    a lower bound on any real kernel's time. Output is numerically
    meaningless (timing only)."""
    f32 = jnp.float32
    bf16 = jnp.bfloat16

    def _dot(a, b):
        return jax.lax.dot_general(a, b, (((1,), (0,)), ((), ())),
                                   preferred_element_type=f32)

    def kernel(x_ref, wd_ref, w1a_ref, w1b_ref, w2_ref, w3_ref,
               b1_ref, b2_ref, b3_ref, out_ref, a_ref):
        # block-0 operands stay UNPADDED [*, 64]: the real kernel would
        # dot the 64-channel input directly, so the attribution must
        # not inflate block 0 with a 4x-padded contraction.
        x64 = x_ref[0].reshape(IN_HW * IN_HW, C_IN)
        x64 = jnp.concatenate(
            [x64, x64[:P - IN_HW * IN_HW]], axis=0).astype(bf16)  # [P,64]
        # zero the conv2 halo rows once (the real kernel must too);
        # uninitialized VMEM scratch can hold non-finite bf16 garbage
        a_ref[:HALO] = jnp.zeros((HALO, 3 * WIDTH), bf16)
        a_ref[HALO + P:] = jnp.zeros((HALO, 3 * WIDTH), bf16)
        x = None
        for b in range(BLOCKS):
            if b == 0:
                y1 = jnp.maximum(
                    _dot(x64, w1a_ref[...]) + b1_ref[b].astype(f32), 0.0)
                res = _dot(x64, wd_ref[...])            # projection
            else:
                y1 = jnp.maximum(
                    _dot(x, w1b_ref[b - 1]) + b1_ref[b].astype(f32), 0.0)
                res = x.astype(f32)
            a_ref[HALO:HALO + P] = jnp.concatenate(
                [y1.astype(bf16)] * 3, axis=1)          # one write, no shifts
            acc = _dot(a_ref[0:P], w2_ref[b, 0])
            acc += _dot(a_ref[HALO:HALO + P], w2_ref[b, 1])
            acc += _dot(a_ref[2 * HALO:2 * HALO + P], w2_ref[b, 2])
            y2 = jnp.maximum(acc + b2_ref[b].astype(f32), 0.0)
            y3 = _dot(y2.astype(bf16), w3_ref[b]) + b3_ref[b].astype(f32)
            x = jnp.maximum(y3 + res, 0.0).astype(bf16)      # [P, 256]

        out_ref[0] = x.reshape(GRID_H, GRID_W, OUT_W)[1:57, :56, :]

    return kernel


def layer1_dots(jax, jnp, pl, pltpu, x, weights, interpret=False):
    """x: [N, 56, 56, 64] bf16 -> [N, 56, 56, 256] (meaningless values)."""
    n = x.shape[0]
    wd, w1a, w1b, w2, w3, b1, b2, b3 = weights
    kern = make_kernel_dots(jnp, pl, pltpu, jax)
    const = lambda a: (lambda i: tuple(0 for _ in a.shape))
    specs = [pl.BlockSpec((1, IN_HW, IN_HW, C_IN), lambda i: (i, 0, 0, 0),
                          memory_space=pltpu.VMEM)]
    for a in (wd, w1a, w1b, w2, w3, b1, b2, b3):
        specs.append(pl.BlockSpec(a.shape, const(a),
                                  memory_space=pltpu.VMEM))
    return pl.pallas_call(
        kern,
        grid=(n,),
        in_specs=specs,
        out_specs=pl.BlockSpec((1, IN_HW, IN_HW, OUT_W),
                               lambda i: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, IN_HW, IN_HW, OUT_W),
                                       jnp.bfloat16),
        scratch_shapes=[
            pltpu.VMEM((P + 2 * HALO, 3 * WIDTH), jnp.bfloat16),
        ],
        interpret=interpret,
    )(x, wd, w1a, w1b, w2, w3, b1, b2, b3)


def dot_flops_per_frame() -> float:
    """FLOPs the attribution kernel actually executes per frame."""
    fl = 0.0
    fl += 2.0 * P * C_IN * WIDTH            # b0 conv1 [P,64]x[64,64]
    fl += 2.0 * P * C_IN * OUT_W            # b0 projection [P,64]x[64,256]
    fl += 2.0 * (BLOCKS - 1) * P * OUT_W * WIDTH   # b1/b2 conv1 K=256
    fl += 2.0 * BLOCKS * 3 * P * (3 * WIDTH) * WIDTH  # conv2 3x K=192
    fl += 2.0 * BLOCKS * P * WIDTH * OUT_W  # conv3 [P,64]x[64,256]
    return fl


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch-frames", type=int, default=384)
    ap.add_argument("--iters", type=int, default=6)
    ap.add_argument("--chain", type=int, default=6)
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--interpret", action="store_true",
                    help="Pallas interpret mode (CPU smoke test)")
    ap.add_argument("--only-gemm", action="store_true",
                    help="skip sections 1-2 (re-run the GEMM ceiling "
                         "without re-paying their tunnel compiles)")
    args = ap.parse_args()

    import jax
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import flax.linen as nn
    import jax.numpy as jnp
    from jax import lax
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from _timing import time_chained

    n = args.batch_frames

    def dev_randn(shape, scale=0.05):
        return jax.jit(
            lambda: (jax.random.normal(jax.random.PRNGKey(1), shape,
                                       jnp.float32) * scale
                     ).astype(jnp.bfloat16))()

    # -- 1. XLA layer1 stage (roofline construction, random weights) ----
    def conv(x, w, b, stride=1, pad=0):
        y = lax.conv_general_dilated(
            x, w, (stride, stride), [(pad, pad), (pad, pad)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        return y + b

    params = {}
    c = C_IN
    for blk in range(BLOCKS):
        p = {}
        if c != OUT_W:
            p["dw"] = (dev_randn((1, 1, c, OUT_W)),
                       dev_randn((OUT_W,)))
        p["c1"] = (dev_randn((1, 1, c, WIDTH)), dev_randn((WIDTH,)))
        p["c2"] = (dev_randn((3, 3, WIDTH, WIDTH)), dev_randn((WIDTH,)))
        p["c3"] = (dev_randn((1, 1, WIDTH, OUT_W)), dev_randn((OUT_W,)))
        params[blk] = p
        c = OUT_W

    def xla_layer1(x):
        for blk in range(BLOCKS):
            p = params[blk]
            res = conv(x, *p["dw"]) if "dw" in p else x
            y = nn.relu(conv(x, *p["c1"]))
            y = nn.relu(conv(y, *p["c2"], pad=1))
            y = conv(y, *p["c3"])
            x = nn.relu(y + res)
        return x

    x = dev_randn((n, IN_HW, IN_HW, C_IN), scale=1.0)

    def chained(fn, k):
        def f(salt, x):
            return sum(jnp.sum(fn(x + (salt + 17 * i).astype(x.dtype))
                               .astype(jnp.float32)) for i in range(k))
        return jax.jit(f)

    stage_flops = 513e9 / 384 * n      # analytic (BASELINE.md roofline)
    rows = []

    if not (args.interpret or args.only_gemm):
        dt = time_chained(chained(xla_layer1, args.chain), (x,),
                          args.iters, args.chain)
        rows.append({"which": "xla_layer1", "ms": round(dt * 1e3, 2),
                     "tflops": round(stage_flops / dt / 1e12, 1),
                     "us_per_frame": round(dt / n * 1e6, 1)})
        print(json.dumps(rows[-1]), flush=True)

    # -- 2. dots-only Pallas attribution --------------------------------
    weights = (
        dev_randn((C_IN, OUT_W)),                 # wd (block-0 proj)
        dev_randn((C_IN, WIDTH)),                 # w1a (block-0 conv1)
        dev_randn((BLOCKS - 1, OUT_W, WIDTH)),    # w1b
        dev_randn((BLOCKS, 3, 3 * WIDTH, WIDTH)),  # w2 (dy taps, dx in K)
        dev_randn((BLOCKS, WIDTH, OUT_W)),        # w3
        dev_randn((BLOCKS, 1, WIDTH)),            # b1
        dev_randn((BLOCKS, 1, WIDTH)),            # b2
        dev_randn((BLOCKS, 1, OUT_W)),            # b3
    )

    def dots(xx):
        return layer1_dots(jax, jnp, pl, pltpu, xx, weights,
                           interpret=args.interpret)

    if args.interpret:
        out = jax.jit(dots)(x[:2])
        assert out.shape == (2, IN_HW, IN_HW, OUT_W), out.shape
        assert bool(jnp.isfinite(out.astype(jnp.float32)).all())
        print(json.dumps({"which": "dots_interpret_smoke", "ok": True}))
        return 0

    if not args.only_gemm:
        kern_flops = dot_flops_per_frame() * n
        dt = time_chained(chained(dots, args.chain), (x,),
                          args.iters, args.chain)
        rows.append({
            "which": "pallas_dots_only", "ms": round(dt * 1e3, 2),
            "tflops_executed": round(kern_flops / dt / 1e12, 1),
            "us_per_frame": round(dt / n * 1e6, 1),
            "executed_gflop_per_frame": round(
                dot_flops_per_frame() / 1e9, 3),
            "analytic_gflop_per_frame": round(513.0 / 384, 3)})
        print(json.dumps(rows[-1]), flush=True)

    # -- 3. intrinsic narrow-operand GEMM ceiling (plain XLA, huge M) ---
    # Size M so each application runs ~5 ms at ITS OWN roofline bound
    # (max of the flop- and byte-row costs against the chip's measured
    # peaks) — fixed-FLOP sizing floors every narrow shape at the
    # ~30/chain ms dispatch latency and measures nothing (first run of
    # this probe made exactly that mistake: all five shapes "measured"
    # 0.8 TFLOP/s). Narrow K/N GEMMs are intrinsically BYTES-bound at
    # the XLA level (AI = 2KN/(2K+2N) FLOP/byte), so their ceiling is
    # bandwidth — the in-VMEM MXU story is section 2's job.
    f_peak, b_peak = 169.1e12, 712e9    # measured (BASELINE.md)
    for (k, nn_) in [(64, 64), (256, 64), (192, 64), (64, 256),
                     (2048, 2048)]:
        row_s = max(2.0 * k * nn_ / f_peak,
                    2.0 * (k + nn_) / b_peak)
        m = int(0.005 / row_s) // 256 * 256
        a = dev_randn((m, k), scale=1.0)
        w = dev_randn((k, nn_), scale=1.0)

        def gemm_chain(salt, a, w, k_=args.chain):
            acc = salt.astype(jnp.float32)
            for _ in range(k_):
                y = jax.lax.dot_general(
                    (a * (1.0 + acc * 1e-30).astype(a.dtype)), w,
                    (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)
                acc = jnp.sum(y) * 1e-20 + acc
            return acc

        dt = time_chained(jax.jit(gemm_chain), (a, w), args.iters,
                          args.chain)
        rows.append({"which": f"gemm_K{k}_N{nn_}", "m": m,
                     "ms": round(dt * 1e3, 3),
                     "tflops": round(2.0 * m * k * nn_ / dt / 1e12, 1)})
        print(json.dumps(rows[-1]), flush=True)

    return 0


if __name__ == "__main__":
    sys.exit(main())
