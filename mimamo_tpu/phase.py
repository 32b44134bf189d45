"""Inter-frame phase-difference (micro-motion) extraction.

Reference behavior (SURVEY.md §2 "Phase-difference extractor", Appendix A.2;
mount empty — math pinned by the survey): per consecutive-frame pair and per
(scale, orientation) band, ``dphi = angle(c_t * conj(c_{t-1}))`` wrapped to
(-pi, pi], each map resized to ``phase_size x phase_size`` (48) and the
S*K maps stacked as channels (num_phase = 12 by default).

TPU-first design choices:
  * The product form ``angle(c_t * conj(c_{t-1}))`` is used directly — one
    atan2 per pixel, no wrap-around branch (numerically better than
    subtracting angles, and branch-free for the VPU).
  * Bilinear resize is expressed as two small matmuls with precomputed
    interpolation matrices (``R_h @ dphi @ R_w^T``) so it runs on the MXU
    and fuses into one XLA computation with the atan2 — instead of the
    reference's per-map ``cv2/F.interpolate`` gather.
  * Everything is batched over (batch, time, orientation) so the FFTs and
    matmuls see large leading dimensions.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .config import PhaseSpec, PyramidSpec
from . import pyramid as pyr_mod


@functools.lru_cache(maxsize=64)
def _resize_matrix(src: int, dst: int) -> np.ndarray:
    """[dst, src] bilinear interpolation matrix, half-pixel centers.

    Matches ``torch.nn.functional.interpolate(mode='bilinear',
    align_corners=False)`` / ``cv2.resize(INTER_LINEAR)`` sampling (edge
    clamped). Precomputed in NumPy; becomes an XLA constant.
    """
    pos = (np.arange(dst, dtype=np.float64) + 0.5) * (src / dst) - 0.5
    lo = np.floor(pos).astype(np.int64)
    frac = pos - lo
    w = np.zeros((dst, src), dtype=np.float64)
    rows = np.arange(dst)
    w[rows, np.clip(lo, 0, src - 1)] += 1.0 - frac
    w[rows, np.clip(lo + 1, 0, src - 1)] += frac
    return w.astype(np.float32)


def resize_bilinear(x: jnp.ndarray, out_hw: Tuple[int, int],
                    precision=jax.lax.Precision.HIGHEST) -> jnp.ndarray:
    """Bilinear-resize the trailing two dims of ``x`` via two matmuls.

    Expressed as two explicit reshaped 2-D dots ([N*h, w] @ [w, Q], then
    [N*Q, h] @ [h, P]) rather than a three-operand einsum: the MXU wants
    large clean GEMMs, and the einsum form was measured to lower poorly
    (cf. preprocess._upscale2x_axis note).

    Default HIGHEST precision: TPU f32 matmuls otherwise round inputs to
    bf16 on the MXU, costing ~8e-3 absolute error on phase values in
    (-pi, pi] — over the 1e-3 phase-map parity budget (BASELINE.json).
    """
    h, w = x.shape[-2], x.shape[-1]
    p, q = out_hw
    lead = x.shape[:-2]
    rh = jnp.asarray(_resize_matrix(h, p))          # [P, h]
    rw = jnp.asarray(_resize_matrix(w, q))          # [Q, w]
    y = jnp.dot(x.reshape(-1, w), rw.T,
                preferred_element_type=jnp.float32,
                precision=precision)                # [N*h, Q]
    y = jnp.swapaxes(y.reshape(lead + (h, q)), -1, -2)
    out = jnp.dot(y.reshape(-1, h), rh.T,
                  preferred_element_type=jnp.float32,
                  precision=precision)              # [N*Q, P]
    return jnp.swapaxes(out.reshape(lead + (q, p)), -1, -2)


def phase_diff(c_t: jnp.ndarray, c_prev: jnp.ndarray) -> jnp.ndarray:
    """Wrapped phase difference angle(c_t * conj(c_prev)) in (-pi, pi]."""
    prod = c_t * jnp.conj(c_prev)
    return jnp.arctan2(prod.imag, prod.real)


def micro_motion_features(
    frames: jnp.ndarray,
    pyramid_spec: PyramidSpec,
    phase_spec: PhaseSpec,
) -> jnp.ndarray:
    """Full micro-motion path: grayscale frames -> stacked phase-diff maps.

    Args:
      frames: [B, T, H, W] float grayscale clip batch.
      pyramid_spec / phase_spec: configuration.

    Returns:
      [B, T-1, S*K, P, P] float32 phase-diff stacks (channel order: scale-
      major, orientation-minor — channel c = s * K + k).
    """
    b, t = frames.shape[0], frames.shape[1]
    masks = pyr_mod.make_masks(pyramid_spec)
    x = pyr_mod.fft2_shifted(frames.astype(jnp.float32), pyramid_spec)

    p = phase_spec.phase_size
    chans = []
    for s in range(pyramid_spec.height):
        xc = pyr_mod._crop(x, s)[..., None, :, :]          # [B,T,1,hs,ws]
        band = pyr_mod.ifft2_shifted(xc * masks["bands"][s], pyramid_spec)
        dphi = phase_diff(band[:, 1:], band[:, :-1])       # [B,T-1,K,hs,ws]
        if phase_spec.amplitude_weighting:
            amp = jnp.abs(band[:, 1:]) * jnp.abs(band[:, :-1])
            denom = jnp.mean(amp, axis=(-2, -1), keepdims=True) + 1e-6
            dphi = dphi * (amp / denom)
        chans.append(resize_bilinear(dphi, (p, p)))        # [B,T-1,K,P,P]
    return jnp.concatenate(chans, axis=2)


def num_phase_channels(pyramid_spec: PyramidSpec) -> int:
    return pyramid_spec.height * pyramid_spec.orientations
