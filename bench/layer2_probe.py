"""Fused-layer2 Pallas probe: can cross-conv VMEM fusion beat XLA?

The roofline (BASELINE.md) puts layer2 at 9.36 ms/384-frame step, 74%
of measured HBM bandwidth and only 46% MFU — bytes-bound on the
residual stream it re-reads/re-writes around every bottleneck block.
XLA cannot fuse across conv boundaries, so the ~5 GB of analytic
traffic is structural. A Pallas kernel holding ONE FRAME's entire
layer2 residual stream in VMEM pays only 616 MB in + 308 MB out per
step (≈1.3 ms at 712 GB/s) against a 4.3 ms MXU floor — up to ~2x.

Layer2 (not layer1) is the Pallas-shaped stage: width 128 means every
GEMM is 128-lane aligned (K ∈ {512, 384, 128}), unlike layer1's
64-channel bottlenecks which waste half the MXU on K=64 contractions.

Kernel formulation (the part that avoids the stem kernel's fatal
im2col relayout tax, BASELINE.md 2026-08-16):
  * the 28x28 spatial grid lives FLATTENED in sublanes on a padded
    30x32 grid — pixel (i, j) at row 32*(i+1) + (j+1); row stride 32
    is a multiple of the 8-sublane alignment Mosaic requires, so all
    3x3 dy-taps are FREE aligned slices of a haloed scratch;
  * only the two dx = ±1 shifts pay a sublane-shift relayout (2 x
    0.25 MB per block), and the 3x3 conv collapses to 3 dots of
    K = 3*128 = 384 (dx packed into the contraction) — full MXU depth;
  * pad-row bias leakage is killed by masking y1 once per block (the
    only tensor whose pad rows feed neighbouring taps).

Protocol: salted-chain depth-2 (bench/stages.py conventions), plus a
bf16-tolerance numeric check of the kernel against the XLA bottleneck
chain. Input is fed as [N, 28, 2, 28, 512] (a free XLA reshape of
the [N, 56, 56, 256] layer1 output): the BlockSpec selects the
even-row plane directly, so the stride-2 subsample costs no in-kernel
ops AND the input DMA ships only the rows block 0 consumes (308
instead of 616 MB per 384-frame step).

    python bench/layer2_probe.py [--cpu] [--batch 384] [--check-only]

Verdict goes to BASELINE.md either way (VERDICT r3 directive 1
discipline: measured win or measured negative result).
"""

import argparse
import functools
import json
import time

import numpy as np

GRID_H, GRID_W = 30, 32          # padded 28x28 grid; row stride 32
P = GRID_H * GRID_W              # 960 flattened grid rows
HALO = 32                        # scratch halo rows above/below
WIDTH, OUT_W, C_IN = 128, 512, 256
BLOCKS = 4


def _mask_positions() -> np.ndarray:
    """bf16 [P, 1] mask: 1 at valid 28x28 pixels, 0 at grid padding."""
    r = np.arange(P)
    i, j = r // GRID_W, r % GRID_W
    ok = (i >= 1) & (i <= 28) & (j >= 1) & (j <= 28)
    return ok.astype(np.float32)[:, None]


def make_kernel(jnp, pl, pltpu, jax):
    f32 = jnp.float32
    bf16 = jnp.bfloat16

    def _dot(a, b):
        return jax.lax.dot_general(a, b, (((1,), (0,)), ((), ())),
                                   preferred_element_type=f32)

    def kernel(x_ref, wd_ref, w1a_ref, w1b_ref, w2_ref, w3_ref,
               bd_ref, b1_ref, b2_ref, b3_ref, m_ref,
               out_ref, a_ref):
        # -- grid pad (block-0 input) ---------------------------------------
        # x_ref[0, :, 0]: the even-row plane of the [N, 28, 2, 28, 512]
        # reshaped layer1 output (BlockSpec-selected — no strided load);
        # the lane dim packs (col-parity, channel): lanes [:256] are the
        # even columns' 256 channels.
        sub = x_ref[0, :, 0, :, :256]                   # [28, 28, 256]
        g = jnp.pad(sub, ((1, 1), (1, 3), (0, 0))).reshape(P, C_IN)
        mask = m_ref[...].astype(f32)                   # [P, 1]

        # zero the conv2 halo rows once; blocks only write rows
        # [HALO, HALO + P).
        a_ref[:HALO] = jnp.zeros((HALO, 3 * WIDTH), bf16)
        a_ref[HALO + P:] = jnp.zeros((HALO, 3 * WIDTH), bf16)

        x = g.astype(bf16)
        for b in range(BLOCKS):
            if b == 0:
                res = _dot(x, wd_ref[...]) + bd_ref[...].astype(f32)
                w1 = w1a_ref[...]
            else:
                res = x.astype(f32)
                w1 = w1b_ref[b - 1]
            y1 = jnp.maximum(_dot(x, w1) + b1_ref[b].astype(f32), 0.0)
            # mask pad rows: relu(bias) leaks there and the 3x3 taps of
            # valid pixels read them.
            y1 = (y1 * mask).astype(bf16)               # [P, 128]

            # conv2: dx packed into lanes (one sublane-shift relayout
            # per direction), dy via aligned halo slices.
            zrow = jnp.zeros((1, WIDTH), bf16)
            ym1 = jnp.concatenate([zrow, y1[:-1]], axis=0)   # y1[r-1]
            yp1 = jnp.concatenate([y1[1:], zrow], axis=0)    # y1[r+1]
            a_ref[HALO:HALO + P] = jnp.concatenate(
                [ym1, y1, yp1], axis=1)                 # [P, 384]
            acc = _dot(a_ref[0:P], w2_ref[b, 0])             # dy = -1
            acc += _dot(a_ref[HALO:HALO + P], w2_ref[b, 1])  # dy = 0
            acc += _dot(a_ref[2 * HALO:2 * HALO + P], w2_ref[b, 2])
            y2 = jnp.maximum(acc + b2_ref[b].astype(f32), 0.0)

            y3 = _dot(y2.astype(bf16), w3_ref[b]) + b3_ref[b].astype(f32)
            x = jnp.maximum(y3 + res, 0.0).astype(bf16)      # [P, 512]

        out_ref[0] = x.reshape(GRID_H, GRID_W, OUT_W)[1:29, 1:29, :]

    return kernel


def make_kernel_batched(jnp, pl, pltpu, jax, frames):
    """Frames-batched unrolled kernel: grid=(N/frames,), ``frames``
    frames share one Mosaic block so every dot's M-dim grows from 960
    to ``frames``*960 (the round-4 hardware attribution showed the
    per-frame dots top out near ~93 TFLOP/s — weight-reuse-starved —
    while XLA's 384-frame conv GEMMs run at 87.8 ms-level throughput
    with far better pipelining; this is the "batch >=8 frames per
    block" retry the BASELINE.md negative-result row names).

    Frame independence under the shared flattened grid is free: every
    frame keeps its OWN 1-ring of masked pad rows inside its 30x32
    grid, so dy (+-32-row) and dx (+-1-row) taps never read another
    frame's valid pixels — cross-frame reads land in pad rows that the
    per-frame y1 mask already zeroes.
    """
    f32 = jnp.float32
    bf16 = jnp.bfloat16
    FP = frames * P

    def _dot(a, b):
        return jax.lax.dot_general(a, b, (((1,), (0,)), ((), ())),
                                   preferred_element_type=f32)

    def kernel(x_ref, wd_ref, w1a_ref, w1b_ref, w2_ref, w3_ref,
               bd_ref, b1_ref, b2_ref, b3_ref, m_ref,
               out_ref, a_ref):
        sub = x_ref[:, :, 0, :, :256]                   # [F, 28, 28, 256]
        g = jnp.pad(sub, ((0, 0), (1, 1), (1, 3), (0, 0))) \
            .reshape(FP, C_IN)
        mask = m_ref[...].astype(f32)                   # [FP, 1]

        a_ref[:HALO] = jnp.zeros((HALO, 3 * WIDTH), bf16)
        a_ref[HALO + FP:] = jnp.zeros((HALO, 3 * WIDTH), bf16)

        x = g.astype(bf16)
        for b in range(BLOCKS):
            if b == 0:
                res = _dot(x, wd_ref[...]) + bd_ref[...].astype(f32)
                w1 = w1a_ref[...]
            else:
                res = x.astype(f32)
                w1 = w1b_ref[b - 1]
            y1 = jnp.maximum(_dot(x, w1) + b1_ref[b].astype(f32), 0.0)
            y1 = (y1 * mask).astype(bf16)               # [FP, 128]

            zrow = jnp.zeros((1, WIDTH), bf16)
            ym1 = jnp.concatenate([zrow, y1[:-1]], axis=0)
            yp1 = jnp.concatenate([y1[1:], zrow], axis=0)
            a_ref[HALO:HALO + FP] = jnp.concatenate(
                [ym1, y1, yp1], axis=1)                 # [FP, 384]
            acc = _dot(a_ref[0:FP], w2_ref[b, 0])
            acc += _dot(a_ref[HALO:HALO + FP], w2_ref[b, 1])
            acc += _dot(a_ref[2 * HALO:2 * HALO + FP], w2_ref[b, 2])
            y2 = jnp.maximum(acc + b2_ref[b].astype(f32), 0.0)

            y3 = _dot(y2.astype(bf16), w3_ref[b]) + b3_ref[b].astype(f32)
            x = jnp.maximum(y3 + res, 0.0).astype(bf16)      # [FP, 512]

        out_ref[...] = x.reshape(
            frames, GRID_H, GRID_W, OUT_W)[:, 1:29, 1:29, :]

    return kernel


def layer2_fused_batched(jax, jnp, pl, pltpu, x, weights, frames=4,
                         interpret=False):
    """grid=(N/frames,) frames-batched variant of :func:`layer2_fused`."""
    n = x.shape[0]
    assert n % frames == 0, (n, frames)
    (wd, bd), (w1a, _), w1b, b1, w2, b2, w3, b3 = weights
    mask = jnp.asarray(
        np.tile(_mask_positions(), (frames, 1)), jnp.bfloat16)
    kern = make_kernel_batched(jnp, pl, pltpu, jax, frames)
    const = lambda *shape: (lambda i: tuple(0 for _ in shape))
    specs = [
        pl.BlockSpec((frames, 28, 1, 28, 512),
                     lambda i: (i, 0, 0, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec(wd.shape, const(*wd.shape), memory_space=pltpu.VMEM),
        pl.BlockSpec(w1a.shape, const(*w1a.shape), memory_space=pltpu.VMEM),
        pl.BlockSpec(w1b.shape, const(*w1b.shape), memory_space=pltpu.VMEM),
        pl.BlockSpec(w2.shape, const(*w2.shape), memory_space=pltpu.VMEM),
        pl.BlockSpec(w3.shape, const(*w3.shape), memory_space=pltpu.VMEM),
        pl.BlockSpec(bd.shape, const(*bd.shape), memory_space=pltpu.VMEM),
        pl.BlockSpec(b1.shape, const(*b1.shape), memory_space=pltpu.VMEM),
        pl.BlockSpec(b2.shape, const(*b2.shape), memory_space=pltpu.VMEM),
        pl.BlockSpec(b3.shape, const(*b3.shape), memory_space=pltpu.VMEM),
        pl.BlockSpec(mask.shape, const(*mask.shape),
                     memory_space=pltpu.VMEM),
    ]
    return pl.pallas_call(
        kern,
        grid=(n // frames,),
        in_specs=specs,
        out_specs=pl.BlockSpec((frames, 28, 28, OUT_W),
                               lambda i: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, 28, 28, OUT_W), jnp.bfloat16),
        scratch_shapes=[
            pltpu.VMEM((frames * P + 2 * HALO, 3 * WIDTH), jnp.bfloat16),
        ],
        # f>=4 exceeds Mosaic's default 16M scoped-vmem cap (f4 22.1M,
        # f8 25.5M); the chip accepted a 64M scoped limit in the XLA
        # flag study, so raise the cap for this kernel only.
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024),
        interpret=interpret,
    )(x, wd, w1a, w1b, w2, w3, bd, b1, b2, b3, mask)


def make_kernel_g4(jnp, pl, pltpu, jax):
    """Single-block kernel; the block index is grid dim 1 (grid=(N, 4)).

    4x smaller Mosaic program than the unrolled kernel (a hedge against
    compile-time pathology) and only ONE block's weights resident at a
    time (BlockSpec-streamed). Block 0's narrower operands are zero-
    padded to the common [512, *] shapes so all four steps share one
    code path; the projection-vs-identity residual is the only
    pl.when-guarded difference.
    """
    f32 = jnp.float32
    bf16 = jnp.bfloat16

    def _dot(a, b):
        return jax.lax.dot_general(a, b, (((1,), (0,)), ((), ())),
                                   preferred_element_type=f32)

    def kernel(x_ref, wdp_ref, w1_ref, w2_ref, w3_ref,
               bdp_ref, b1_ref, b2_ref, b3_ref, m_ref,
               out_ref, s_ref, a_ref):
        b = pl.program_id(1)

        @pl.when(b == 0)
        def _init():
            sub = x_ref[0, :, 0, :, :256]               # [28, 28, 256]
            g = jnp.pad(sub, ((1, 1), (1, 3), (0, 0))).reshape(P, C_IN)
            s_ref[...] = jnp.pad(
                g, ((0, 0), (0, OUT_W - C_IN))).astype(bf16)
            a_ref[:HALO] = jnp.zeros((HALO, 3 * WIDTH), bf16)
            a_ref[HALO + P:] = jnp.zeros((HALO, 3 * WIDTH), bf16)

        mask = m_ref[...].astype(f32)
        x = s_ref[...]                                  # [P, 512] bf16
        y1 = jnp.maximum(_dot(x, w1_ref[0]) + b1_ref[0].astype(f32), 0.0)
        y1 = (y1 * mask).astype(bf16)
        zrow = jnp.zeros((1, WIDTH), bf16)
        ym1 = jnp.concatenate([zrow, y1[:-1]], axis=0)
        yp1 = jnp.concatenate([y1[1:], zrow], axis=0)
        a_ref[HALO:HALO + P] = jnp.concatenate([ym1, y1, yp1], axis=1)
        acc = _dot(a_ref[0:P], w2_ref[0, 0])
        acc += _dot(a_ref[HALO:HALO + P], w2_ref[0, 1])
        acc += _dot(a_ref[2 * HALO:2 * HALO + P], w2_ref[0, 2])
        y2 = jnp.maximum(acc + b2_ref[0].astype(f32), 0.0)
        y3 = _dot(y2.astype(bf16), w3_ref[0]) + b3_ref[0].astype(f32)

        @pl.when(b == 0)
        def _proj():
            res = _dot(x, wdp_ref[...]) + bdp_ref[...].astype(f32)
            s_ref[...] = jnp.maximum(y3 + res, 0.0).astype(bf16)

        @pl.when(b > 0)
        def _ident():
            s_ref[...] = jnp.maximum(y3 + x.astype(f32), 0.0).astype(bf16)

        @pl.when(b == BLOCKS - 1)
        def _emit():
            out_ref[0] = s_ref[...].reshape(
                GRID_H, GRID_W, OUT_W)[1:29, 1:29, :]

    return kernel


def make_kernel_dots(jnp, pl, pltpu, jax):
    """Timing-attribution kernel: the g4 variant's exact dot sequence
    (5 MXU dots per block incl. the block-0 projection every step, an
    upper bound) with NO tap assembly, masks, pads, or shifts — the
    delta to the full g4 kernel is the VPU/relayout overhead. Output
    is numerically meaningless."""
    f32 = jnp.float32
    bf16 = jnp.bfloat16

    def _dot(a, b):
        return jax.lax.dot_general(a, b, (((1,), (0,)), ((), ())),
                                   preferred_element_type=f32)

    def kernel(x_ref, wdp_ref, w1_ref, w2_ref, w3_ref,
               bdp_ref, b1_ref, b2_ref, b3_ref, m_ref,
               out_ref, s_ref, a_ref):
        b = pl.program_id(1)

        @pl.when(b == 0)
        def _init():
            s_ref[...] = jnp.concatenate(
                [x_ref[0, :, 0].reshape(28 * 28, 512)] * 2,
                axis=0)[:P].astype(bf16)

        x = s_ref[...]
        y1 = jnp.maximum(_dot(x, w1_ref[0]) + b1_ref[0].astype(f32), 0.0)
        a_ref[HALO:HALO + P] = jnp.concatenate([y1] * 3, axis=1).astype(
            bf16)  # one write, no shifts (keeps operand liveness honest)
        acc = _dot(a_ref[0:P], w2_ref[0, 0])
        acc += _dot(a_ref[HALO:HALO + P], w2_ref[0, 1])
        acc += _dot(a_ref[2 * HALO:2 * HALO + P], w2_ref[0, 2])
        y2 = jnp.maximum(acc + b2_ref[0].astype(f32), 0.0)
        y3 = _dot(y2.astype(bf16), w3_ref[0]) + b3_ref[0].astype(f32)
        res = _dot(x, wdp_ref[...]) + bdp_ref[...].astype(f32)
        s_ref[...] = jnp.maximum(y3 + res, 0.0).astype(bf16)

        @pl.when(b == BLOCKS - 1)
        def _emit():
            out_ref[0] = s_ref[...].reshape(
                GRID_H, GRID_W, OUT_W)[1:29, 1:29, :]

    return kernel


def layer2_fused_g4(jax, jnp, pl, pltpu, x, weights, interpret=False,
                    dots_only=False):
    """grid=(N, 4) variant of :func:`layer2_fused` (same math)."""
    n = x.shape[0]
    (wd, bd), (w1a, _), w1b, b1, w2, b2, w3, b3 = weights
    wdp = jnp.pad(wd, ((0, OUT_W - C_IN), (0, 0)))      # [512, 512]
    w1p = jnp.concatenate(
        [jnp.pad(w1a, ((0, OUT_W - C_IN), (0, 0)))[None], w1b])
    mask = jnp.asarray(_mask_positions(), jnp.bfloat16)
    kern = (make_kernel_dots if dots_only else make_kernel_g4)(
        jnp, pl, pltpu, jax)
    const = lambda a: (lambda i, b: tuple(0 for _ in a.shape))
    perblk = lambda a: (lambda i, b: (b,) + tuple(0 for _ in a.shape[1:]))
    specs = [
        pl.BlockSpec((1, 28, 1, 28, 512), lambda i, b: (i, 0, 0, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec(wdp.shape, const(wdp), memory_space=pltpu.VMEM),
        pl.BlockSpec((1,) + w1p.shape[1:], perblk(w1p),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1,) + w2.shape[1:], perblk(w2),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1,) + w3.shape[1:], perblk(w3),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec(bd.shape, const(bd), memory_space=pltpu.VMEM),
        pl.BlockSpec((1,) + b1.shape[1:], perblk(b1),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1,) + b2.shape[1:], perblk(b2),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1,) + b3.shape[1:], perblk(b3),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec(mask.shape, const(mask), memory_space=pltpu.VMEM),
    ]
    return pl.pallas_call(
        kern,
        grid=(n, BLOCKS),
        in_specs=specs,
        out_specs=pl.BlockSpec((1, 28, 28, OUT_W),
                               lambda i, b: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, 28, 28, OUT_W), jnp.bfloat16),
        scratch_shapes=[
            pltpu.VMEM((P, OUT_W), jnp.bfloat16),
            pltpu.VMEM((P + 2 * HALO, 3 * WIDTH), jnp.bfloat16),
        ],
        interpret=interpret,
    )(x, wdp, w1p, w2, w3, bd, b1, b2, b3, mask)


def layer2_fused(jax, jnp, pl, pltpu, x, weights, interpret=False):
    """x: [N, 28, 2, 28, 512] bf16 (reshaped layer1 output) -> [N,28,28,512]."""
    n = x.shape[0]
    (wd, bd), (w1a, _), w1b, b1, w2, b2, w3, b3 = weights
    mask = jnp.asarray(_mask_positions(), jnp.bfloat16)
    kern = make_kernel(jnp, pl, pltpu, jax)
    const = lambda *shape: (lambda i: tuple(0 for _ in shape))
    specs = [
        pl.BlockSpec((1, 28, 1, 28, 512), lambda i: (i, 0, 0, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec(wd.shape, const(*wd.shape), memory_space=pltpu.VMEM),
        pl.BlockSpec(w1a.shape, const(*w1a.shape), memory_space=pltpu.VMEM),
        pl.BlockSpec(w1b.shape, const(*w1b.shape), memory_space=pltpu.VMEM),
        pl.BlockSpec(w2.shape, const(*w2.shape), memory_space=pltpu.VMEM),
        pl.BlockSpec(w3.shape, const(*w3.shape), memory_space=pltpu.VMEM),
        pl.BlockSpec(bd.shape, const(*bd.shape), memory_space=pltpu.VMEM),
        pl.BlockSpec(b1.shape, const(*b1.shape), memory_space=pltpu.VMEM),
        pl.BlockSpec(b2.shape, const(*b2.shape), memory_space=pltpu.VMEM),
        pl.BlockSpec(b3.shape, const(*b3.shape), memory_space=pltpu.VMEM),
        pl.BlockSpec(mask.shape, const(*mask.shape),
                     memory_space=pltpu.VMEM),
    ]
    return pl.pallas_call(
        kern,
        grid=(n,),
        in_specs=specs,
        out_specs=pl.BlockSpec((1, 28, 28, OUT_W), lambda i: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, 28, 28, OUT_W), jnp.bfloat16),
        scratch_shapes=[
            pltpu.VMEM((P + 2 * HALO, 3 * WIDTH), jnp.bfloat16),
        ],
        interpret=interpret,
    )(x, wd, w1a, w1b, w2, w3, bd, b1, b2, b3, mask)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=384)
    ap.add_argument("--iters", type=int, default=6)
    ap.add_argument("--chain", type=int, default=6)
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--check-only", action="store_true")
    ap.add_argument("--variant", choices=("both", "unrolled", "g4"),
                    default="both")
    ap.add_argument("--frames", type=int, nargs="*", default=[],
                    help="also run the frames-batched unrolled kernel "
                         "at these frames-per-block counts (e.g. "
                         "--frames 2 4 8)")
    ap.add_argument("--dots-only", action="store_true",
                    help="also time the no-relayout dot-sequence kernel "
                         "(VPU-overhead attribution)")
    args = ap.parse_args()

    import jax
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    from jax import lax
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    f32 = jnp.float32
    rng = np.random.default_rng(0)

    def mk(shape, scale=0.05):
        return jnp.asarray(rng.normal(0, scale, shape)
                           .astype(np.float32)).astype(jnp.bfloat16)

    # fused-BN inference weights (HWIO conv layout for the XLA baseline)
    raw = []
    c = C_IN
    for b in range(BLOCKS):
        p = {"conv1": (mk((1, 1, c, WIDTH)), mk((WIDTH,))),
             "conv2": (mk((3, 3, WIDTH, WIDTH)), mk((WIDTH,))),
             "conv3": (mk((1, 1, WIDTH, OUT_W)), mk((OUT_W,)))}
        if b == 0:
            p["down"] = (mk((1, 1, c, OUT_W)), mk((OUT_W,)))
        raw.append(p)
        c = OUT_W

    def conv(x, kb, stride=1, pad=0):
        k, bias = kb
        y = lax.conv_general_dilated(
            x, k, (stride, stride), [(pad, pad), (pad, pad)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        return y + bias

    def xla_layer2(x):                       # x: [N, 56, 56, 256] bf16
        for b, p in enumerate(raw):
            stride = 2 if b == 0 else 1
            res = conv(x, p["down"], stride) if b == 0 else x
            y = jnp.maximum(conv(x, p["conv1"], stride), 0)
            y = jnp.maximum(conv(y, p["conv2"], 1, pad=1), 0)
            y = conv(y, p["conv3"])
            x = jnp.maximum(y + res, 0)
        return x

    # kernel operand packing
    def pack():
        wd = raw[0]["down"][0].reshape(C_IN, OUT_W)
        bd = raw[0]["down"][1].reshape(1, OUT_W).astype(f32)
        w1a = raw[0]["conv1"][0].reshape(C_IN, WIDTH)
        w1b = jnp.stack([raw[b]["conv1"][0].reshape(OUT_W, WIDTH)
                         for b in range(1, BLOCKS)])
        b1 = jnp.stack([raw[b]["conv1"][1].reshape(1, WIDTH)
                        for b in range(BLOCKS)]).astype(f32)
        # W2cat[b, dy]: rows 128*k + c_in for dx = k-1 (matches acat's
        # lane blocks [y1[r-1], y1[r], y1[r+1]])
        w2 = jnp.stack([
            jnp.stack([raw[b]["conv2"][0][dy].reshape(3 * WIDTH, WIDTH)
                       for dy in range(3)])
            for b in range(BLOCKS)])
        b2 = jnp.stack([raw[b]["conv2"][1].reshape(1, WIDTH)
                        for b in range(BLOCKS)]).astype(f32)
        w3 = jnp.stack([raw[b]["conv3"][0].reshape(WIDTH, OUT_W)
                        for b in range(BLOCKS)])
        b3 = jnp.stack([raw[b]["conv3"][1].reshape(1, OUT_W)
                        for b in range(BLOCKS)]).astype(f32)
        return ((wd, bd), (w1a, None), w1b, b1, w2, b2, w3, b3)

    weights = pack()
    fused_fns = {}
    for vname, vfn in (("unrolled", layer2_fused), ("g4", layer2_fused_g4)):
        if args.variant in ("both", vname):
            fused_fns[vname] = functools.partial(
                vfn, jax, jnp, pl, pltpu, weights=weights,
                interpret=args.cpu)
    for f in args.frames:
        fused_fns[f"batched_f{f}"] = functools.partial(
            layer2_fused_batched, jax, jnp, pl, pltpu, weights=weights,
            frames=f, interpret=args.cpu)

    # -- numeric check ------------------------------------------------------
    nchk = max([2] + list(args.frames))
    xs = jnp.asarray(rng.standard_normal((nchk, 56, 56, 256)),
                     jnp.bfloat16)
    ref = np.asarray(jax.jit(xla_layer2)(xs), np.float32)
    for vname, fused in fused_fns.items():
        got = np.asarray(jax.jit(lambda x, _f=fused: _f(
            x.reshape(nchk, 28, 2, 28, 512)))(xs), np.float32)
        err = np.abs(ref - got).max() / max(1e-6, np.abs(ref).max())
        print(json.dumps({"check": f"{vname}_vs_xla", "rel_err":
                          round(float(err), 6)}), flush=True)
        assert err < 2e-2, (vname, err)
    if args.check_only:
        return

    # -- timing (salted-chain, depth-2 fetch: bench/_timing.py) -------------
    from _timing import time_chained

    def timeit(fn, reshape):
        k = args.chain

        def chained(salt, x):
            out = 0.0
            for i in range(k):
                xi = x + (salt + 17 * i).astype(x.dtype)
                out += jnp.sum(fn(xi.reshape(reshape) if reshape
                                  else xi).astype(f32))
            return out

        x = jax.jit(lambda: jax.random.normal(
            jax.random.PRNGKey(1), (args.batch, 56, 56, 256),
            f32).astype(jnp.bfloat16))()
        return time_chained(jax.jit(chained), (x,), args.iters, k)

    gflop = 730.0 * args.batch / 384
    rows = [("xla_layer2", xla_layer2, None)]
    rows += [(f"pallas_{v}", f, (args.batch, 28, 2, 28, 512))
             for v, f in fused_fns.items()]
    if args.dots_only:
        rows.append(("pallas_g4_dots_only",
                     functools.partial(layer2_fused_g4, jax, jnp, pl,
                                       pltpu, weights=weights,
                                       interpret=args.cpu,
                                       dots_only=True),
                     (args.batch, 28, 2, 28, 512)))
    for name, fn, reshape in rows:
        dt = timeit(fn, reshape)
        print(json.dumps({"layer2": name,
                          "ms_per_step": round(dt * 1e3, 3),
                          "tflops": round(gflop / dt / 1e3, 1)}),
              flush=True)


if __name__ == "__main__":
    main()
