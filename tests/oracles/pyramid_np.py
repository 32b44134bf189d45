"""Independent NumPy oracle for the complex steerable pyramid.

Implemented *recursively* — peel one scale per level, cropping the DFT in
half each time — mirroring the reference's ``SCFpyr_PyTorch.build``
structure (SURVEY.md §3.4), from the math in SURVEY.md Appendix A.1. This
is intentionally a different code organization from
``mimamo_tpu/pyramid.py`` (which precomputes per-scale masks on cropped
grids directly), so agreement between the two validates both the math and
the crop-equivalence reasoning.

float64 throughout — the oracle is the precision reference.
"""

from __future__ import annotations

import math

import numpy as np


def _grids(h, w):
    fy = (np.arange(h) - h // 2) / (h / 2.0)
    fx = (np.arange(w) - w // 2) / (w / 2.0)
    xr, yr = np.meshgrid(fx, fy)
    angle = np.arctan2(yr, xr)
    rad = np.sqrt(xr * xr + yr * yr)
    rad[h // 2, w // 2] = rad[h // 2, w // 2 - 1]
    return np.log2(rad), angle


def _lo(log_rad, log_r0):
    t = log_rad - log_r0
    ramp = np.cos((np.pi / 2.0) * (np.clip(t, -1.0, 0.0) + 1.0))
    return np.where(t <= -1.0, 1.0, np.where(t >= 0.0, 0.0, ramp))


def _hi(log_rad, log_r0):
    lo = _lo(log_rad, log_r0)
    return np.sqrt(np.maximum(0.0, 1.0 - lo * lo))


def _angular(angle, k, nbands):
    order = nbands - 1
    alpha = (2.0 ** order) * math.factorial(order) / math.sqrt(
        nbands * math.factorial(2 * order))
    c = np.cos(angle - np.pi * k / nbands)
    return np.where(c > 0.0, alpha * np.abs(c) ** order, 0.0)


def _center_crop_half(x):
    h, w = x.shape[-2:]
    y0, x0 = h // 2 - h // 4, w // 2 - w // 4
    return x[..., y0:y0 + h // 2, x0:x0 + w // 2]


def build(im, height=3, nbands=4, complex_factor=True):
    """im: [H, W] or [B, H, W] float -> dict like mimamo_tpu.pyramid.build."""
    im = np.asarray(im, dtype=np.float64)
    h, w = im.shape[-2:]
    log_rad, angle = _grids(h, w)

    dft = np.fft.fftshift(np.fft.fft2(im), axes=(-2, -1))
    hi0 = np.fft.ifft2(
        np.fft.ifftshift(dft * _hi(log_rad, 0.0), axes=(-2, -1))).real

    cfac = (-1j) ** (nbands - 1) if complex_factor else 1.0
    lodft = dft * _lo(log_rad, 0.0)
    bands = []
    log_r0 = 0.0
    for _s in range(height):
        log_r0 -= 1.0
        himask = _hi(log_rad, log_r0)
        orients = []
        for k in range(nbands):
            banddft = cfac * 2.0 * lodft * himask * _angular(angle, k, nbands)
            orients.append(
                np.fft.ifft2(np.fft.ifftshift(banddft, axes=(-2, -1))))
        bands.append(np.stack(orients, axis=-3))  # [..., K, hs, ws]
        # Recurse: apply this level's lowpass, crop spectrum (and the
        # coordinate grids) in half — the reference's downsampling.
        lodft = _center_crop_half(lodft * _lo(log_rad, log_r0))
        log_rad = _center_crop_half(log_rad)
        angle = _center_crop_half(angle)
    low = np.fft.ifft2(np.fft.ifftshift(lodft, axes=(-2, -1))).real
    return {"high": hi0, "bands": tuple(bands), "low": low}


def phase_diff_stack(frames, height=3, nbands=4, phase_size=48):
    """Oracle for micro_motion_features. frames: [T, H, W] float.

    Returns [T-1, S*K, P, P] float64 using the same half-pixel bilinear
    resize convention (implemented independently via direct sampling).
    """
    pyr = build(frames, height=height, nbands=nbands)
    t = frames.shape[0]
    out = []
    for s in range(height):
        c = pyr["bands"][s]                      # [T, K, hs, ws]
        prod = c[1:] * np.conj(c[:-1])
        dphi = np.arctan2(prod.imag, prod.real)  # [T-1, K, hs, ws]
        out.append(_resize(dphi, phase_size))
    return np.concatenate(out, axis=1)


def _resize(x, p):
    """Bilinear resize of trailing 2 dims to (p, p), half-pixel centers."""
    src_h, src_w = x.shape[-2:]
    out = np.zeros(x.shape[:-2] + (p, p), dtype=x.dtype)

    def axis_weights(src):
        pos = (np.arange(p) + 0.5) * (src / p) - 0.5
        lo = np.floor(pos).astype(int)
        frac = pos - lo
        return np.clip(lo, 0, src - 1), np.clip(lo + 1, 0, src - 1), frac

    y0, y1, fy = axis_weights(src_h)
    x0, x1, fx = axis_weights(src_w)
    for i in range(p):
        row = (1 - fy[i]) * x[..., y0[i], :] + fy[i] * x[..., y1[i], :]
        out[..., i, :] = ((1 - fx) * row[..., x0] + fx * row[..., x1])
    return out
