"""Pallas TPU kernel: fused ResNet-50 layer2 (4 bottleneck blocks).

Reference behavior: the four ``layer2_*`` bottlenecks of the FER+
ResNet-50 appearance backbone (SURVEY.md §2 "ResNet-50 FER+ graph
def"; backbone.py defines the XLA lowering this kernel must match in
its fused-BN inference form).

TPU-first rationale: the round-3 roofline (BASELINE.md) measured
layer2 at 9.36 ms per 384-frame step — 74% of measured HBM bandwidth
at only 46% MFU, bytes-bound on the [N, 28, 28, 512] residual stream
XLA re-reads and re-writes around every conv (cross-conv fusion is
beyond XLA's fusion model). This kernel keeps ONE FRAME's entire
layer2 residual stream in VMEM: HBM traffic drops to 308 MB in +
308 MB out per step (~0.9 ms at the measured 712 GB/s) against a
~4.3 ms MXU floor.

Layer2 is the Pallas-shaped stage — width 128 makes every GEMM
128-lane aligned (K ∈ {512, 384, 128}); layer1's 64-channel
bottlenecks would waste half the MXU on K=64 contractions, and
layer3/4 already run at/near their rooflines.

Formulation (what avoids the stem kernel's fatal im2col relayout tax):
  * the 28x28 spatial grid lives flattened in sublanes on a padded
    30x32 grid — pixel (i, j) at row 32*(i+1) + (j+1). Row stride 32
    is 8-sublane aligned, so the 3x3 conv's dy-taps are FREE aligned
    slices of a haloed scratch;
  * the dx = ±1 taps are packed into the contraction: one lane-concat
    [y1[r-1], y1[r], y1[r+1]] turns the 3x3 conv into 3 dots of
    K = 384 (full MXU depth), with only two sublane-shift relayouts;
  * grid = (N, 4): the block index is a grid dimension — a 4x smaller
    Mosaic program, one block's weights VMEM-resident at a time
    (BlockSpec-streamed). Block 0's narrower operands are zero-padded
    to the common [512, *] shapes; the projection-vs-identity residual
    is the only pl.when-guarded difference;
  * the input ships as [N, 28, 2, 28, 512] (a free XLA reshape of the
    [N, 56, 56, 256] layer1 output) and the BlockSpec selects the
    even-row plane, so the stride-2 subsample costs no in-kernel ops
    and only the rows block 0 consumes are DMA'd;
  * pad-row bias leakage (relu(bias) at grid padding would feed valid
    pixels' taps) is killed by masking y1 once per block.

Numerics: bf16 operands, f32 dot accumulation and bias/residual adds,
bf16 residual stream — the same rounding class as the XLA fused-BN
path (parity-tested in tests/test_backbone.py, interpret mode, and on
hardware by bench/check_pallas.py).

Measured verdict: see BASELINE.md round 4 (bench/layer2_probe.py is
the standalone experiment harness this kernel graduated from).
"""

from __future__ import annotations

import functools
from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# Test-only escape: force interpreter-mode lowering so the runner's
# layer2_mode="pallas" split path can run (and be parity-tested) on the
# CPU backend, where Mosaic cannot lower. Read at trace time by
# runner._pallas_layer2_ok/_finish_from_layer1; never set in production.
_FORCE_INTERPRET = False

GRID_H, GRID_W = 30, 32          # padded 28x28 grid; row stride 32
P = GRID_H * GRID_W              # 960 flattened grid rows
HALO = 32                        # scratch halo rows above/below
WIDTH, OUT_W, C_IN = 128, 512, 256
BLOCKS = 4
IN_HW = 56                       # layer1 output spatial size


def _mask_positions() -> np.ndarray:
    """[P, 1] f32 mask: 1 at valid 28x28 pixels, 0 at grid padding."""
    r = np.arange(P)
    i, j = r // GRID_W, r % GRID_W
    ok = (i >= 1) & (i <= 28) & (j >= 1) & (j <= 28)
    return ok.astype(np.float32)[:, None]


def _dot(a, b):
    return jax.lax.dot_general(a, b, (((1,), (0,)), ((), ())),
                               preferred_element_type=jnp.float32)


def _layer2_kernel(x_ref, wdp_ref, w1_ref, w2_ref, w3_ref,
                   bdp_ref, b1_ref, b2_ref, b3_ref, m_ref,
                   out_ref, s_ref, a_ref):
    f32, bf16 = jnp.float32, jnp.bfloat16
    b = pl.program_id(1)

    @pl.when(b == 0)
    def _init():
        # even-row plane of the [28, 2, 28, 512] input block; lanes
        # [:256] are the even columns' 256 channels.
        sub = x_ref[0, :, 0, :, :C_IN]                  # [28, 28, 256]
        g = jnp.pad(sub, ((1, 1), (1, 3), (0, 0))).reshape(P, C_IN)
        s_ref[...] = jnp.pad(g, ((0, 0), (0, OUT_W - C_IN))).astype(bf16)
        a_ref[:HALO] = jnp.zeros((HALO, 3 * WIDTH), bf16)
        a_ref[HALO + P:] = jnp.zeros((HALO, 3 * WIDTH), bf16)

    mask = m_ref[...].astype(f32)
    x = s_ref[...]                                      # [P, 512] bf16
    y1 = jnp.maximum(_dot(x, w1_ref[0]) + b1_ref[0].astype(f32), 0.0)
    y1 = (y1 * mask).astype(bf16)                       # [P, 128]
    zrow = jnp.zeros((1, WIDTH), bf16)
    ym1 = jnp.concatenate([zrow, y1[:-1]], axis=0)      # y1[r-1]
    yp1 = jnp.concatenate([y1[1:], zrow], axis=0)       # y1[r+1]
    a_ref[HALO:HALO + P] = jnp.concatenate([ym1, y1, yp1], axis=1)
    acc = _dot(a_ref[0:P], w2_ref[0, 0])                # dy = -1
    acc += _dot(a_ref[HALO:HALO + P], w2_ref[0, 1])     # dy = 0
    acc += _dot(a_ref[2 * HALO:2 * HALO + P], w2_ref[0, 2])
    y2 = jnp.maximum(acc + b2_ref[0].astype(f32), 0.0)
    y3 = _dot(y2.astype(bf16), w3_ref[0]) + b3_ref[0].astype(f32)

    @pl.when(b == 0)
    def _proj():
        res = _dot(x, wdp_ref[...]) + bdp_ref[...].astype(f32)
        s_ref[...] = jnp.maximum(y3 + res, 0.0).astype(jnp.bfloat16)

    @pl.when(b > 0)
    def _ident():
        s_ref[...] = jnp.maximum(y3 + x.astype(f32), 0.0).astype(
            jnp.bfloat16)

    @pl.when(b == BLOCKS - 1)
    def _emit():
        out_ref[0] = s_ref[...].reshape(GRID_H, GRID_W, OUT_W)[
            1:29, 1:29, :]


def pack_layer2_params(folded_backbone_params: Dict[str, Any]
                       ) -> Tuple[jnp.ndarray, ...]:
    """Folded-BN flax params (backbone.fold_batchnorm output's
    ``params`` subtree) -> the kernel's operand tuple.

    Blocks ``layer2_0..layer2_3`` each carry conv1/conv2/conv3 (HWIO
    kernels + biases); block 0 adds ``downsample_conv``. conv1's
    stride-2 is realized by the even-plane input selection (the
    stride_in_1x1=True placement backbone.py documents); conv2's dx
    taps are packed into the contraction rows 128*k + c_in for
    dx = k - 1.
    """
    p = folded_backbone_params
    blk = [p[f"layer2_{i}"] for i in range(BLOCKS)]
    f32 = jnp.float32
    wd = blk[0]["downsample_conv"]["kernel"].reshape(C_IN, OUT_W)
    wdp = jnp.pad(wd, ((0, OUT_W - C_IN), (0, 0))).astype(jnp.bfloat16)
    bdp = blk[0]["downsample_conv"]["bias"].reshape(1, OUT_W).astype(f32)
    w1s = [blk[0]["conv1"]["kernel"].reshape(C_IN, WIDTH)]
    w1s[0] = jnp.pad(w1s[0], ((0, OUT_W - C_IN), (0, 0)))
    w1s += [blk[i]["conv1"]["kernel"].reshape(OUT_W, WIDTH)
            for i in range(1, BLOCKS)]
    w1p = jnp.stack(w1s).astype(jnp.bfloat16)           # [4, 512, 128]
    b1 = jnp.stack([blk[i]["conv1"]["bias"].reshape(1, WIDTH)
                    for i in range(BLOCKS)]).astype(f32)
    w2 = jnp.stack([                                    # [4, 3, 384, 128]
        jnp.stack([blk[i]["conv2"]["kernel"][dy].reshape(3 * WIDTH, WIDTH)
                   for dy in range(3)])
        for i in range(BLOCKS)]).astype(jnp.bfloat16)
    b2 = jnp.stack([blk[i]["conv2"]["bias"].reshape(1, WIDTH)
                    for i in range(BLOCKS)]).astype(f32)
    w3 = jnp.stack([blk[i]["conv3"]["kernel"].reshape(WIDTH, OUT_W)
                    for i in range(BLOCKS)]).astype(jnp.bfloat16)
    b3 = jnp.stack([blk[i]["conv3"]["bias"].reshape(1, OUT_W)
                    for i in range(BLOCKS)]).astype(f32)
    return wdp, w1p, w2, w3, bdp, b1, b2, b3


@functools.partial(jax.jit, static_argnames=("interpret",))
def layer2_fused(x: jnp.ndarray, packed: Tuple[jnp.ndarray, ...],
                 interpret: bool = False) -> jnp.ndarray:
    """[N, 56, 56, 256] layer1 output -> [N, 28, 28, 512] layer2 output.

    ``packed``: :func:`pack_layer2_params` output. Accepts any input
    dtype castable to bf16 (the XLA path casts activations to the
    backbone compute dtype at each conv; this kernel is bf16-only —
    it exists for the bf16 serving config).
    """
    n = x.shape[0]
    if x.shape[1:] != (IN_HW, IN_HW, C_IN):
        raise ValueError(f"expected [N, {IN_HW}, {IN_HW}, {C_IN}], got "
                         f"{x.shape}")
    wdp, w1p, w2, w3, bdp, b1, b2, b3 = packed
    x5 = x.astype(jnp.bfloat16).reshape(n, 28, 2, 28, 512)
    mask = jnp.asarray(_mask_positions(), jnp.bfloat16)
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
        pl.BlockSpec(bdp.shape, const(bdp), memory_space=pltpu.VMEM),
        pl.BlockSpec((1,) + b1.shape[1:], perblk(b1),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1,) + b2.shape[1:], perblk(b2),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1,) + b3.shape[1:], perblk(b3),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec(mask.shape, const(mask), memory_space=pltpu.VMEM),
    ]
    return pl.pallas_call(
        _layer2_kernel,
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
    )(x5, wdp, w1p, w2, w3, bdp, b1, b2, b3, mask)
