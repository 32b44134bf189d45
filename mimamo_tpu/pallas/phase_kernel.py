"""Pallas TPU kernel: fused phase-difference + bilinear-resize.

The post-FFT chain of the micro-motion path is
``angle(c_t * conj(c_{t-1}))`` followed by a bilinear resize to
``phase_size`` (optionally amplitude-weighted). In the XLA path
(phase.py) the full-resolution wrapped phase tensor ([B, T-1, K, h_s,
w_s] float32 — ~600 MB for the flagship batch at scale 0) round-trips
through HBM between the elementwise atan2 and the resize matmuls,
because XLA does not fuse producers into dot operands. This kernel keeps
the whole chain in VMEM: one grid step loads a block of G band-pairs,
forms the complex products, takes atan2 (and the optional amplitude
weighting) on the VPU, and immediately contracts with the two small
interpolation matrices on the MXU, writing only the [G, P, P] result.

FFTs stay in XLA — Pallas has no FFT primitive (SURVEY.md §7 hard part
2); the kernel boundary is exactly "everything after the iFFT".

Accumulation is fp32 throughout (phase wraps are precision-sensitive);
inputs may be bf16 real/imag pairs, the atan2 runs in fp32.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..phase import _resize_matrix


# Odd minimax polynomial for atan(t), t in [0, 1]: atan(t) = t * P(t^2).
# Least-squares fit on Chebyshev nodes, max error 8.8e-8 rad (fit logged
# in the repo history). Mosaic has no atan2 lowering, so the kernel
# implements it from primitive ops (guide: "if something is not available
# in pallas, implement it").
_ATAN_COEFFS = (
    9.999999582e-01, -3.333230283e-01, 1.997368115e-01, -1.404013684e-01,
    9.967915930e-02, -6.021899162e-02, 2.475666561e-02, -4.831131187e-03,
)


def _atan2(y: jnp.ndarray, x: jnp.ndarray) -> jnp.ndarray:
    """Elementwise atan2 from primitives (VPU-friendly, branch-free)."""
    abs_y, abs_x = jnp.abs(y), jnp.abs(x)
    big = jnp.maximum(abs_x, abs_y)
    small = jnp.minimum(abs_x, abs_y)
    t = small / jnp.maximum(big, jnp.float32(1e-30))   # in [0, 1]
    z = t * t
    poly = jnp.float32(_ATAN_COEFFS[-1])
    for c in _ATAN_COEFFS[-2::-1]:
        poly = poly * z + jnp.float32(c)
    a = t * poly
    half_pi = jnp.float32(np.pi / 2)
    a = jnp.where(abs_y > abs_x, half_pi - a, a)       # octant fold
    a = jnp.where(x < 0, jnp.float32(np.pi) - a, a)    # left half-plane
    return jnp.where(y < 0, -a, a)                     # sign of y


def _make_blocked_kernel(weighting: bool):
    """G band-pairs per program: one fused VPU pass + two large MXU dots.

    A per-pair variant (one band per grid step) was measured slower than
    XLA's own fusion — its 48xH @ HxW @ Wx48 dots are tiny — and was
    removed (negative result recorded in BASELINE.md); blocking G pairs
    turns them into (G*H, W) @ (W, P) and (G*P, H) @ (H, P) — MXU-sized.

    ``weighting=True`` fuses the amplitude weighting knob (SURVEY.md
    Appendix A.2 / App. B item 4): dphi is scaled by
    ``amp / (mean(amp) + 1e-6)`` with ``amp = |c_t|*|c_prev| = |prod|``,
    computed in-kernel while the product is still in VMEM.
    """

    def kernel(ct_re, ct_im, cp_re, cp_im, rw, rh_t, out):
        g, h, w = ct_re.shape
        a_re = ct_re[...].astype(jnp.float32)
        a_im = ct_im[...].astype(jnp.float32)
        b_re = cp_re[...].astype(jnp.float32)
        b_im = cp_im[...].astype(jnp.float32)
        prod_re = a_re * b_re + a_im * b_im
        prod_im = a_im * b_re - a_re * b_im
        dphi = _atan2(prod_im, prod_re)                   # [G, h, w]
        if weighting:
            amp = jnp.sqrt(prod_re * prod_re + prod_im * prod_im)
            # Two single-axis keepdims sums, NOT jnp.mean(axis=(1, 2)):
            # the fused multi-axis reduce's internal reshape crashes the
            # Mosaic vector-layout inferer ("Check failed: arr.size() >=
            # layout_rank", libtpu 2026-08; probed in BASELINE.md r4).
            tot = jnp.sum(jnp.sum(amp, axis=2, keepdims=True),
                          axis=1, keepdims=True)
            dphi = dphi * (amp / (tot / (h * w) + 1e-6))
        p = rw.shape[1]
        tmp = jnp.dot(dphi.reshape(g * h, w), rw[...],
                      preferred_element_type=jnp.float32,
                      precision=jax.lax.Precision.HIGHEST)  # [G*h, P]
        t3 = jnp.swapaxes(tmp.reshape(g, h, p), 1, 2)       # [G, P, h]
        o2 = jnp.dot(t3.reshape(g * p, h), rh_t[...],
                     preferred_element_type=jnp.float32,
                     precision=jax.lax.Precision.HIGHEST)   # [G*P, P]
        out[...] = o2.reshape(g, p, p)                      # out[g, q, p]

    return kernel


@functools.partial(jax.jit,
                   static_argnames=("phase_size", "block", "interpret",
                                    "amplitude_weighting"))
def phase_diff_resize_blocked(c_t: jnp.ndarray, c_prev: jnp.ndarray,
                              phase_size: int = 48, block: int = 8,
                              interpret: bool = False,
                              amplitude_weighting: bool = False
                              ) -> jnp.ndarray:
    """Blocked fused ``resize(angle(c_t * conj(c_prev)))`` (see above)."""
    if c_t.shape != c_prev.shape:
        raise ValueError(f"shape mismatch {c_t.shape} vs {c_prev.shape}")
    lead = c_t.shape[:-2]
    h, w = c_t.shape[-2:]
    p = phase_size
    n = int(np.prod(lead)) if lead else 1
    g = min(block, n)
    pad = (-n) % g

    def prep(c):
        flat = c.reshape(n, h, w)
        if pad:
            flat = jnp.pad(flat, ((0, pad), (0, 0), (0, 0)))
        return flat

    ct, cp = prep(c_t), prep(c_prev)
    rw = jnp.asarray(_resize_matrix(w, p)).T              # [w, P]
    rh_t = jnp.asarray(_resize_matrix(h, p)).T            # [h, P]

    band_spec = pl.BlockSpec((g, h, w), lambda i: (i, 0, 0),
                             memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        _make_blocked_kernel(amplitude_weighting),
        grid=((n + pad) // g,),
        in_specs=[band_spec, band_spec, band_spec, band_spec,
                  pl.BlockSpec((w, p), lambda i: (0, 0),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec((h, p), lambda i: (0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((g, p, p), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n + pad, p, p), jnp.float32),
        interpret=interpret,
    )(ct.real, ct.imag, cp.real, cp.imag, rw, rh_t)
    # kernel emits [*, q, p] (width-major); swap back to [*, p, q]
    return jnp.swapaxes(out[:n], -1, -2).reshape(lead + (p, p))


def micro_motion_features_fused(frames: jnp.ndarray, pyramid_spec,
                                phase_spec, interpret: bool = False,
                                block: int = 8) -> jnp.ndarray:
    """Drop-in fused replacement for ``phase.micro_motion_features``.

    Same contract: [B, T, H, W] grayscale -> [B, T-1, S*K, P, P].
    FFT + mask multiply run in XLA; the atan2 + resize chain runs in the
    blocked Pallas kernel per scale.
    """
    from .. import pyramid as pyr_mod

    masks = pyr_mod.make_masks(pyramid_spec)
    x = pyr_mod.fft2_shifted(frames.astype(jnp.float32), pyramid_spec)
    p = phase_spec.phase_size
    chans = []
    for s in range(pyramid_spec.height):
        xc = pyr_mod._crop(x, s)[..., None, :, :]
        band = pyr_mod.ifft2_shifted(xc * masks["bands"][s], pyramid_spec)
        chans.append(phase_diff_resize_blocked(
            band[:, 1:], band[:, :-1], phase_size=p, block=block,
            interpret=interpret,
            amplitude_weighting=phase_spec.amplitude_weighting))
    return jnp.concatenate(chans, axis=2)
