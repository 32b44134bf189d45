"""Independent PyTorch-CPU oracle for the complex steerable pyramid.

Second oracle demanded by SURVEY.md §4 item 1: the reference adapts
``tomrunia/PyTorchSteerablePyramid`` (``SCFpyr_PyTorch``), whose original
code used the *legacy* ``torch.rfft(im, 2, onesided=False)`` API. That
call, despite the name, computes the FULL two-sided complex 2-D FFT —
``onesided=False`` disables the Hermitian-packed output — with an
unnormalized forward and a 1/N inverse (``torch.ifft``), i.e. exactly the
``numpy.fft`` / ``torch.fft.fft2`` default convention. So the modern
equivalent used here is ``torch.fft.fft2``/``ifft2`` with no ``norm=``
argument, and there is **no one-sided-spectrum discrepancy to model**:
the legacy and modern paths are numerically identical. (If a real
checkpoint-era run ever disagrees, the first thing to audit is whether
its rfft call really passed ``onesided=False``.)

Implemented recursively in float64 torch (peel a scale per level, crop
the DFT in half), mirroring the reference's ``SCFpyr_PyTorch.build``
control flow but derived from SURVEY.md Appendix A.1 math — structured
independently of both ``mimamo_tpu/pyramid.py`` (precomputed cropped-grid
masks) and ``tests/oracles/pyramid_np.py`` (NumPy). The phase-diff oracle
additionally uses ``torch.nn.functional.interpolate`` for the 48x48
resize, pinning the bilinear convention against torch's own resampler
rather than a hand-rolled matrix.
"""

from __future__ import annotations

import math

import numpy as np
import torch


def _polar_grids(h: int, w: int):
    fy = (torch.arange(h, dtype=torch.float64) - h // 2) / (h / 2.0)
    fx = (torch.arange(w, dtype=torch.float64) - w // 2) / (w / 2.0)
    yr, xr = torch.meshgrid(fy, fx, indexing="ij")
    angle = torch.atan2(yr, xr)
    rad = torch.sqrt(xr * xr + yr * yr)
    rad[h // 2, w // 2] = rad[h // 2, w // 2 - 1]  # dodge log2(0) at DC
    return torch.log2(rad), angle


def _lowpass(log_rad: torch.Tensor, log_r0: float) -> torch.Tensor:
    t = log_rad - log_r0
    ramp = torch.cos((math.pi / 2.0) * (torch.clamp(t, -1.0, 0.0) + 1.0))
    return torch.where(t <= -1.0, torch.ones_like(t),
                       torch.where(t >= 0.0, torch.zeros_like(t), ramp))


def _highpass(log_rad: torch.Tensor, log_r0: float) -> torch.Tensor:
    lo = _lowpass(log_rad, log_r0)
    return torch.sqrt(torch.clamp(1.0 - lo * lo, min=0.0))


def _steer(angle: torch.Tensor, k: int, nbands: int) -> torch.Tensor:
    order = nbands - 1
    alpha = (2.0 ** order) * math.factorial(order) / math.sqrt(
        nbands * math.factorial(2 * order))
    c = torch.cos(angle - math.pi * k / nbands)
    return torch.where(c > 0.0, alpha * torch.abs(c) ** order,
                       torch.zeros_like(c))


def _crop_half(x: torch.Tensor) -> torch.Tensor:
    h, w = x.shape[-2:]
    y0, x0 = h // 2 - h // 4, w // 2 - w // 4
    return x[..., y0:y0 + h // 2, x0:x0 + w // 2]


def _shift(x):
    return torch.fft.fftshift(x, dim=(-2, -1))


def _ishift(x):
    return torch.fft.ifftshift(x, dim=(-2, -1))


def _full_from_onesided(r: torch.Tensor, w: int) -> torch.Tensor:
    """One-sided rfft2 spectrum [..., H, W//2+1] -> full [..., H, W].

    Explicit Hermitian completion: ``X[i, j] = conj(X[-i mod H,
    (W - j) mod W])`` for the missing columns — the packing the legacy
    ``torch.rfft(..., onesided=True)`` API exposed. Reproducing the
    legacy one-sided route end-to-end (SURVEY.md A.1 parity trap) lets
    the test suite PROVE the convention coincides with full ``fft2``
    on these shapes rather than assert it in prose.
    """
    h = r.shape[-2]
    full = torch.zeros(r.shape[:-1] + (w,), dtype=r.dtype)
    full[..., : w // 2 + 1] = r
    rows = torch.arange(h).view(-1, 1)
    cols = torch.arange(w // 2 + 1, w).view(1, -1)
    full[..., :, w // 2 + 1:] = torch.conj(r[..., (-rows) % h, w - cols])
    return full


def build(im, height: int = 3, nbands: int = 4,
          complex_factor: bool = True, fft_impl: str = "fft2"):
    """im: [H, W] or [B, H, W] float -> dict like mimamo_tpu.pyramid.build.

    Values are numpy float64/complex128 arrays. ``fft_impl``:
    ``"fft2"`` (modern two-sided) or ``"rfft_hermitian"`` (one-sided
    ``rfft2`` + explicit Hermitian completion — the legacy
    ``torch.rfft`` spectrum layout); the masks/recursion downstream are
    identical, so any convention delta would surface in the bands.
    """
    x = torch.as_tensor(np.asarray(im), dtype=torch.float64)
    h, w = x.shape[-2:]
    log_rad, angle = _polar_grids(h, w)

    if fft_impl == "rfft_hermitian":
        dft = _shift(_full_from_onesided(
            torch.fft.rfft2(x).to(torch.complex128), w))
    elif fft_impl == "fft2":
        dft = _shift(torch.fft.fft2(x))
    else:
        raise ValueError(f"unknown fft_impl {fft_impl!r}")
    hi0 = torch.fft.ifft2(_ishift(dft * _highpass(log_rad, 0.0))).real

    cfac = (-1j) ** (nbands - 1) if complex_factor else 1.0
    lodft = dft * _lowpass(log_rad, 0.0)
    bands = []
    log_r0 = 0.0
    for _s in range(height):
        log_r0 -= 1.0
        himask = _highpass(log_rad, log_r0)
        orients = []
        for k in range(nbands):
            banddft = (cfac * 2.0) * lodft * himask * _steer(
                angle, k, nbands)
            orients.append(torch.fft.ifft2(_ishift(banddft)))
        bands.append(torch.stack(orients, dim=-3).numpy())
        lodft = _crop_half(lodft * _lowpass(log_rad, log_r0))
        log_rad = _crop_half(log_rad)
        angle = _crop_half(angle)
    low = torch.fft.ifft2(_ishift(lodft)).real
    return {"high": hi0.numpy(), "bands": tuple(bands),
            "low": low.numpy()}


def phase_diff_stack(frames, height: int = 3, nbands: int = 4,
                     phase_size: int = 48) -> np.ndarray:
    """Oracle for micro_motion_features. frames: [T, H, W] float.

    Returns [T-1, S*K, P, P] float64; the resize uses torch's own
    ``F.interpolate(mode='bilinear', align_corners=False)``, i.e. the
    convention our matmul-form resize claims to match.
    """
    pyr = build(frames, height=height, nbands=nbands)
    out = []
    for s in range(height):
        c = torch.as_tensor(pyr["bands"][s])       # [T, K, hs, ws] c128
        prod = c[1:] * torch.conj(c[:-1])
        dphi = torch.atan2(prod.imag, prod.real)   # [T-1, K, hs, ws] f64
        out.append(torch.nn.functional.interpolate(
            dphi, size=(phase_size, phase_size), mode="bilinear",
            align_corners=False).numpy())
    return np.concatenate(out, axis=1)
