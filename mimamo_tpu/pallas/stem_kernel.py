"""Pallas TPU kernel: fused ResNet stem (2x upscale + conv1 + pool).

The appearance stream's stem — ``maxpool3x3/2(relu(conv1_7x7/2(
upscale2x(crop) - mean)))`` — is HBM-bandwidth-bound, not FLOP-bound:
stem-lowering experiments (bench/stem_experiments.py, BASELINE.md
2026-08-16) measured identical ~4.4-4.7 ms for the 7x7 conv, a
space-to-depth rewrite, and a composite 5x5 conv on the 112 grid,
because all of them write the [N, 112, 112, 64] conv output (>600 MB
per 384-frame step, lane-padded 64->128) to HBM, and the 224x224
upscaled image costs another materialization (~4.8 ms measured).

This kernel keeps both intermediates in VMEM: each grid step loads one
112x112x3 crop half, forms the 2x bilinear upscale as four parity
planes (u[2i+a, 2j+b] = plane[a,b][i,j] — exact half-pixel + edge-clamp
semantics of preprocess.upscale2x), assembles the 49-tap im2col matrix
in VMEM, runs ONE [147, 57, 128] x [147, 64] MXU dot against the
BN-folded conv1 weights, applies bias+relu, max-pools via parity
splits (no strided gathers), and writes only the pooled
[28, 56, 64] block. HBM traffic per image: 150 KB in + 200 KB out,
vs ~2.4 MB in + 1.6 MB out for the unfused chain.

**Measured verdict (v5e, 2026-08-16, BASELINE.md): the kernel LOSES —
10.9 ms vs 7.8 ms for the fused XLA chain at the flagship 384-frame
step.** The HBM saving is real but im2col's inherent 49x read
amplification lands in VMEM instead: ~2.4 MB of tap-slice relayout
writes per half-image (plus Mosaic's dot-operand relayouts) exceed the
HBM bytes saved. Variants tried: f32 vs bf16 tap slices, value-concat
vs scratch-ref im2col assembly — all within ~0.3 ms. The production
path stays on XLA with the bf16 upscale (preprocess.for_backbone); the
kernel is kept as a parity-tested (1e-5 vs the XLA chain in f32)
reference for the in-VMEM exact upscale+conv formulation and for the
Mosaic layout rules it established (see compile probes in the repo
history: lane-misaligned shape casts and non-multiple-of-8 dynamic
sublane offsets are rejected; rank-3 dot_general lowers via a
lane-merging flatten, so trailing dims must be 128-aligned).

Numerics match the XLA path: the upscale/mean-sub arithmetic is fp32,
inputs are cast to the conv dtype exactly where conv1 casts (bf16 in
the flagship config), and the dot accumulates fp32. The pool's zero
padding equals flax's -inf padding because post-relu activations are
>= 0. Reference behavior covered: SURVEY.md §2 "ResNet-50 FER+ graph
def" stem + Appendix A.5 preprocessing (upscale of 112x112 aligned
crops to the 224 backbone input).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# Static geometry (flagship config): 112x112 crops, 2x upscale, 7x7/2
# conv -> 112x112x64, 3x3/2 maxpool -> 56x56x64. Two halves per image.
CROP = 112
CONV = 112          # conv1 output resolution (224 input, stride 2)
CONV_PAD = 128      # lane-aligned conv column count inside the kernel
POOL = 56
HALF_POOL = POOL // 2          # pooled rows per grid step
HALF_CONV = HALF_POOL * 2 + 1  # conv rows a half needs (57, shared edge)


def _tap_split(k: int):
    """Kernel tap k (0..6) -> (parity, shift) of the upscale plane:
    u[2j + (k-3)] = plane[(k-3) % 2][j + shift]."""
    d = k - 3
    p = d % 2
    return p, (d - p) // 2


def _stem_kernel(x_ref, w_ref, b_ref, out_ref, planes_ref, a2_ref, *,
                 dtype):
    h = pl.program_id(1)                       # image half (0 = top)
    x = x_ref[0].astype(jnp.float32)           # [3, 112, 112] mean-subbed

    # -- 2x bilinear upscale as parity planes (fp32, VPU) ------------------
    # u[2i]   = 0.25 x[i-1] + 0.75 x[i]   (edge-clamped)
    # u[2i+1] = 0.75 x[i]   + 0.25 x[i+1]
    prev_r = jnp.concatenate([x[:, :1], x[:, :-1]], axis=1)
    next_r = jnp.concatenate([x[:, 1:], x[:, -1:]], axis=1)
    rows = (0.25 * prev_r + 0.75 * x, 0.75 * x + 0.25 * next_r)
    planes = []
    for ur in rows:
        prev_c = jnp.concatenate([ur[:, :, :1], ur[:, :, :-1]], axis=2)
        next_c = jnp.concatenate([ur[:, :, 1:], ur[:, :, -1:]], axis=2)
        planes.append(0.25 * prev_c + 0.75 * ur)
        planes.append(0.75 * ur + 0.25 * next_c)
    # planes[(row_parity)*2 + (col_parity)]; pad so out-of-range plane
    # indices read zero — exactly conv1's zero padding of the upscaled
    # image (rows: [-3, 112]; cols: [-2, 112]). Staged through a VMEM
    # scratch ref because Mosaic lowers dynamic (program-id-dependent)
    # slices on refs but not on values. Columns are padded out to
    # CONV_PAD (128): Mosaic's dot lowering flattens the rank-3 lhs into
    # lanes, which is only a supported layout cast when the minor dim is
    # a multiple of 128 (verified by compile probes); the 16 garbage
    # columns fall out of the contraction and are dropped after the dot.
    for i, p in enumerate(planes):
        planes_ref[i] = jnp.pad(
            p, ((0, 0), (3, 5), (2, CONV_PAD - CROP + 3 - 2)))

    # -- im2col over the 49 taps -------------------------------------------
    # Conv rows this half computes: [56h - 1, 56h + 55] (row 56h-1 is the
    # pool's top padding row; zeroed below for h == 0). Mosaic requires
    # dynamic sublane offsets to be provable multiples of 8, so each
    # parity plane is loaded once as a 64-row block at 56h (56 = 7*8);
    # the per-tap -2..+1 row shifts are static slices of the loaded
    # value. Tap row start in plane coords: (56h - 1 + s1) + pad(3)
    # = 56h + (s1 + 2), s1 in [-2, 1] -> block-local rows [0, 60).
    row0 = pl.multiple_of(56 * h, 8)
    blocks = [planes_ref[i, :, pl.ds(row0, 64), :].astype(dtype)
              for i in range(4)]
    for k1 in range(7):
        p1, s1 = _tap_split(k1)
        for k2 in range(7):
            p2, s2 = _tap_split(k2)
            t = k1 * 7 + k2
            a2_ref[3 * t: 3 * t + 3] = blocks[p1 * 2 + p2][
                :, s1 + 2: s1 + 2 + HALF_CONV,
                2 + s2: 2 + s2 + CONV_PAD]
    a2 = a2_ref[...]                                   # [147, 57, 128]

    # -- one MXU dot + bias + relu -----------------------------------------
    acc = jax.lax.dot_general(
        a2, w_ref[...], (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)            # [57, 128, 64]
    acc = acc[:, :CONV, :]                             # drop pad columns
    bias = b_ref[...].reshape(1, 1, 64).astype(jnp.float32)
    conv = jnp.maximum(acc + bias, 0.0)
    row_ids = jax.lax.broadcasted_iota(jnp.int32, (HALF_CONV, 1, 1), 0)
    conv = jnp.where((row_ids == 0) & (h == 0), 0.0, conv)

    # -- 3x3/2 maxpool via parity splits (no strided gathers) ---------------
    # Columns: pooled pc reads conv cols 2pc-1 (odd, shifted), 2pc (even),
    # 2pc+1 (odd). Zero pad == flax -inf pad since conv >= 0 post-relu.
    ce = conv.reshape(HALF_CONV, POOL, 2, 64)[:, :, 0]   # cols 2pc
    co = conv.reshape(HALF_CONV, POOL, 2, 64)[:, :, 1]   # cols 2pc+1
    co_prev = jnp.concatenate(
        [jnp.zeros((HALF_CONV, 1, 64), jnp.float32), co[:, :-1]], axis=1)
    colmax = jnp.maximum(jnp.maximum(ce, co), co_prev)   # [57, 56, 64]
    # Rows: pooled k reads local rows 2k, 2k+1, 2k+2.
    colmax = jnp.pad(colmax, ((0, 1), (0, 0), (0, 0)))   # 58 rows
    rsplit = colmax.reshape(HALF_POOL + 1, 2, POOL, 64)
    re, ro = rsplit[:, 0], rsplit[:, 1]                  # [29, 56, 64]
    pooled = jnp.maximum(jnp.maximum(re[:HALF_POOL], ro[:HALF_POOL]),
                         re[1:HALF_POOL + 1])
    out_ref[0] = pooled.astype(out_ref.dtype)


@functools.partial(jax.jit, static_argnames=("dtype", "interpret"))
def stem_fused(x_planes: jnp.ndarray, w2: jnp.ndarray, bias: jnp.ndarray,
               dtype=jnp.bfloat16, interpret: bool = False) -> jnp.ndarray:
    """Fused upscale2x + conv1(7x7/2) + bias + relu + maxpool(3x3/2).

    Args:
      x_planes: [N, 3, 112, 112] float32, already mean-subtracted and in
        the kernel's channel order (see :func:`prepare_stem_weights`).
      w2: [147, 64] conv1 weights reshaped (k1, k2, c) -> row 3*(7*k1+k2)+c,
        in ``dtype``.
      bias: [1, 64] float32 (BN-folded conv1 bias).
      dtype: conv compute dtype (bf16 matches the flagship backbone).

    Returns: [N, 56, 56, 64] in ``dtype`` — the input to layer1.
    """
    n = x_planes.shape[0]
    if x_planes.shape[1:] != (3, CROP, CROP):
        raise ValueError(f"expected [N, 3, {CROP}, {CROP}], got "
                         f"{x_planes.shape}")
    return pl.pallas_call(
        functools.partial(_stem_kernel, dtype=dtype),
        grid=(n, 2),
        in_specs=[
            pl.BlockSpec((1, 3, CROP, CROP), lambda i, h: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((147, 64), lambda i, h: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 64), lambda i, h: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, HALF_POOL, POOL, 64),
                               lambda i, h: (i, h, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, POOL, POOL, 64), dtype),
        scratch_shapes=[pltpu.VMEM((4, 3, CROP + 8, CONV_PAD + 3),
                                   jnp.float32),
                        pltpu.VMEM((147, HALF_CONV, CONV_PAD), dtype)],
        interpret=interpret,
    )(x_planes, w2, bias)


def prepare_stem_weights(conv1_kernel: jnp.ndarray, conv1_bias: jnp.ndarray,
                         channel_order: str = "rgb",
                         dtype=jnp.bfloat16):
    """BN-folded conv1 [7, 7, 3, 64] HWIO + [64] bias -> kernel operands.

    ``channel_order="bgr"`` folds the reference's BGR flip into the
    weight rows so the kernel consumes RGB crops directly.
    """
    k = jnp.asarray(conv1_kernel)
    if channel_order == "bgr":
        k = k[:, :, ::-1, :]
    w2 = k.reshape(49 * 3, 64).astype(dtype)
    return w2, jnp.asarray(conv1_bias, jnp.float32).reshape(1, 64)


def prepare_stem_input(crops_rgb: jnp.ndarray, mean_rgb) -> jnp.ndarray:
    """[N, 112, 112, 3] 0..255 crops -> mean-subtracted [N, 3, 112, 112].

    One fused XLA pass (cast + mean-sub + transpose); the mean is
    subtracted in RGB order — the BGR flip, when configured, lives in
    the weights (prepare_stem_weights), not the data.
    """
    x = crops_rgb.astype(jnp.float32) - jnp.asarray(mean_rgb, jnp.float32)
    return jnp.transpose(x, (0, 3, 1, 2))
