"""Complex steerable pyramid as batched FFT-domain filtering (TPU-native).

Reference behavior: MIMAMO-Net adapts ``tomrunia/PyTorchSteerablePyramid``
(``SCFpyr_PyTorch.build``) — a *recursive* loop that peels one scale per
iteration, cropping the DFT in half each level (SURVEY.md §3.4; the
reference mount is empty so the math is pinned by SURVEY.md Appendix A.1
instead of file:line citations).

TPU-first design: the pyramid is a **fixed linear operator**, so all
radial/angular masks are precomputed in NumPy at trace time as constants,
and ``build`` is just ``fft2 -> (crop, mask-multiply, ifft2)`` per scale —
no Python recursion in the hot path, everything batched over frames so XLA
can tile the FFTs and fuse the mask multiplies.

Conventions (documented per SURVEY.md §7 "hard part 1"):
  * Radial coordinate normalized so the spectrum edge midpoint is r = pi;
    raised-cosine transitions are one octave wide in log2(r)
    (``L(r;r0) = cos(pi/2 * (log2(r/r0)+1))`` on -1 < log2(r/r0) < 0).
  * Oriented band at scale s (0-based) is computed on a grid of size
    (H/2^s, W/2^s) by center-cropping the fftshifted DFT — *lossless*
    because the band mask's support disk lies inside the cropped box.
  * The crop + small-grid ifft2 normalization scales band values by 4^s
    relative to the full-res signal (same as the reference's recursion);
    phase is unaffected, which is all the micro-motion path consumes.
  * Complex (analytic) bands carry the SCFpyr ``(-1j)**(K-1)`` constant and
    the half-plane doubling factor 2 (PhaseSpec-independent unit-modulus
    factor: irrelevant for phase *differences*, kept for band parity).
  * FFT normalization: unnormalized forward / 1/N inverse (numpy default).
  * Legacy ``torch.rfft`` convention (SURVEY.md A.1's last parity trap):
    the original SCFpyr code called ``torch.rfft(im, 2, onesided=False)``
    — the legacy API's name notwithstanding, that is the full two-sided
    unnormalized FFT. The one-sided variant differs only in packing:
    ``tests/test_pyramid.py::test_legacy_onesided_rfft_route_is_identical``
    *proves* (float64, incl. non-square sizes) that an rfft2 spectrum
    explicitly Hermitian-completed drives bit-identical bands, so no
    convention delta exists for this framework to model.
"""

from __future__ import annotations

import functools
import math
from typing import Dict, List, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .config import PyramidSpec

Pyramid = Dict[str, object]  # {"high": f32, "bands": tuple[c64], "low": f32}


# ---------------------------------------------------------------------------
# Mask construction (NumPy, trace-time constants)
# ---------------------------------------------------------------------------

def _freq_grid(h: int, w: int) -> Tuple[np.ndarray, np.ndarray]:
    """fftshifted frequency grid: log2-radius (edge midpoint = 0) and angle."""
    fy = (np.arange(h) - h // 2) / (h / 2.0)
    fx = (np.arange(w) - w // 2) / (w / 2.0)
    xr, yr = np.meshgrid(fx, fy)
    angle = np.arctan2(yr, xr)
    rad = np.sqrt(xr * xr + yr * yr)
    # Avoid log2(0) at DC: reuse the smallest nonzero radius (reference
    # SCFpyr convention); DC lands fully in the lowpass either way.
    rad[h // 2, w // 2] = rad[h // 2, w // 2 - 1]
    return np.log2(rad), angle


def _lo_transition(log_rad: np.ndarray, log_r0: float) -> np.ndarray:
    """Raised-cosine lowpass L(r; r0) in log2 domain (Appendix A.1)."""
    t = log_rad - log_r0
    ramp = np.cos((np.pi / 2.0) * (np.clip(t, -1.0, 0.0) + 1.0))
    return np.where(t <= -1.0, 1.0, np.where(t >= 0.0, 0.0, ramp))


def _hi_transition(log_rad: np.ndarray, log_r0: float) -> np.ndarray:
    lo = _lo_transition(log_rad, log_r0)
    return np.sqrt(np.maximum(0.0, 1.0 - lo * lo))


def _angular_windows(angle: np.ndarray, k_bands: int) -> List[np.ndarray]:
    """Steering windows G_k(theta) = alpha_K cos(theta - pi k/K)^(K-1) on the
    half-plane cos(theta - pi k/K) > 0 (Appendix A.1)."""
    order = k_bands - 1
    alpha = (2.0 ** order) * math.factorial(order) / math.sqrt(
        k_bands * math.factorial(2 * order))
    out = []
    for k in range(k_bands):
        c = np.cos(angle - np.pi * k / k_bands)
        out.append(np.where(c > 0.0, alpha * np.power(np.abs(c), order), 0.0))
    return out


def _crop_slices(h: int, w: int, scale: int) -> Tuple[slice, slice]:
    """Central (h/2^s, w/2^s) box of an fftshifted (h, w) spectrum."""
    hs, ws = h >> scale, w >> scale
    y0 = h // 2 - hs // 2
    x0 = w // 2 - ws // 2
    return slice(y0, y0 + hs), slice(x0, x0 + ws)


@functools.lru_cache(maxsize=8)
def make_masks(spec: PyramidSpec) -> Dict[str, tuple]:
    """Precompute all pyramid masks for a given spec.

    Returns numpy constants:
      hi0:   (H, W) float32 — highpass residual mask (full res)
      bands: tuple over scale s of (K, H/2^s, W/2^s) complex64 —
             oriented analytic band masks on the *cropped* grid
      low:   (H/2^S, W/2^S) float32 — lowpass residual mask (cropped grid)
    """
    h, w = spec.input_size
    s_scales, k_bands = spec.height, spec.orientations
    log_rad, angle = _freq_grid(h, w)
    g_k = _angular_windows(angle, k_bands)

    hi0 = _hi_transition(log_rad, 0.0)
    lo_cum = _lo_transition(log_rad, 0.0)

    cfac = (-1j) ** (k_bands - 1) if spec.complex_factor else 1.0 + 0.0j
    band_masks = []
    for s in range(s_scales):
        log_r0 = -float(s + 1)
        hi_s = _hi_transition(log_rad, log_r0)
        radial = lo_cum * hi_s          # ring: peak at r0, 2-octave support
        ys, xs = _crop_slices(h, w, s)
        per_orient = np.stack(
            [2.0 * radial[ys, xs] * g[ys, xs] for g in g_k], axis=0)
        band_masks.append((per_orient * cfac).astype(np.complex64))
        lo_cum = lo_cum * _lo_transition(log_rad, log_r0)

    ys, xs = _crop_slices(h, w, s_scales)
    low = lo_cum[ys, xs]
    return {
        "hi0": (hi0.astype(np.float32),),
        "bands": tuple(band_masks),
        "low": (low.astype(np.float32),),
    }


# ---------------------------------------------------------------------------
# FFT dispatch: XLA FFT vs DFT-as-matmul (MXU)
# ---------------------------------------------------------------------------
#
# XLA's TPU FFT lowering is scalar-heavy and slow; at the pyramid's sizes
# (<= 112 per axis) the 2-D DFT expressed as two [n, n] complex matmuls
# rides the MXU instead. fftshift/ifftshift are baked into the DFT
# matrices as row/column rolls, so `fftshift(fft2(x))` is exactly
# `A @ x @ A^T` and `ifft2(ifftshift(Y))` is `B @ Y @ B^T` — one fused
# XLA computation, no gather/roll ops. Elevated matmul precision keeps
# the band phases inside the 1e-3 parity budget (f32 inputs would
# otherwise round through bf16 on the MXU); spec.dft_precision picks
# 6-pass ("highest") vs 3-pass ("high") error compensation. Hardware-
# gated vs the float64 oracle: "high" FAILS (1.40 rad max phase error —
# see config.py note and BASELINE.md round 4); the default stays
# "highest".

_PRECISIONS = {"highest": jax.lax.Precision.HIGHEST,
               "high": jax.lax.Precision.HIGH,
               "default": jax.lax.Precision.DEFAULT}

# Bench-only escape hatch (bench/phase_precision_experiments.py A/B
# attribution): False re-enables the legacy zero-imag complex forward.
_SPLIT_REAL_FORWARD = True

# Trace-time engagement record for the A/B test: _mm2 adds the branch it
# traced ("split" / "complex") so the test can positively confirm the
# flag reached the trace instead of asserting the two lowerings round
# differently (round-5 advisor finding). Python-side only — no effect
# on the compiled program.
_TRACED_FORWARD_PATHS: set = set()


def _dft_precision(spec: PyramidSpec):
    return _PRECISIONS[spec.dft_precision]


def _dft_matrix(n: int, inverse: bool) -> np.ndarray:
    k = np.arange(n)
    sign = 2j if inverse else -2j
    m = np.exp(sign * np.pi * np.outer(k, k) / n)
    return (m / n) if inverse else m


@functools.lru_cache(maxsize=16)
def _fwd_shift_matrix(n: int) -> np.ndarray:
    """A with fftshift(fft2(x)) == A @ x @ A.T (even n)."""
    return np.roll(_dft_matrix(n, inverse=False), n // 2,
                   axis=0).astype(np.complex64)


@functools.lru_cache(maxsize=16)
def _inv_shift_matrix(n: int) -> np.ndarray:
    """B with ifft2(ifftshift(Y)) == B @ Y @ B.T (even n)."""
    return np.roll(_dft_matrix(n, inverse=True), n // 2,
                   axis=1).astype(np.complex64)


def _mm2(x: jnp.ndarray, m_h: np.ndarray, m_w: np.ndarray,
         precision=jax.lax.Precision.HIGHEST) -> jnp.ndarray:
    """M_h @ x @ M_w^T over the trailing two axes (complex matmuls).

    A real-dtype ``x`` takes the split row pass: ``A @ x`` for complex A
    and real x is computed as two *real* GEMMs (Re(A)@x, Im(A)@x) —
    mathematically identical to the complex product (the dropped terms
    are exact multiply-by-zero) at 2 instead of 4 MXU passes. NOT
    bitwise: XLA lowers complex matmuls via Gauss's 3-multiplication
    trick, whose reassociated imaginary part rounds differently (the
    split's direct products are the *more* accurate form; measured
    ~2e-4 apart on f32 phase maps, and 1.7e-5 vs the float64 oracle on
    hardware at flagship shape). XLA does not discover the split
    itself: ``astype(complex64)`` materializes a zero imaginary plane
    it then dutifully multiplies.
    """
    mh = jnp.asarray(m_h)
    if jnp.iscomplexobj(x) or not _SPLIT_REAL_FORWARD:
        if not jnp.iscomplexobj(x):
            _TRACED_FORWARD_PATHS.add("complex")
        y = jnp.einsum("ph,...hw->...pw", mh, x.astype(jnp.complex64),
                       precision=precision)
    else:
        _TRACED_FORWARD_PATHS.add("split")
        xr = x.astype(jnp.float32)
        y = jax.lax.complex(
            jnp.einsum("ph,...hw->...pw", mh.real, xr,
                       precision=precision),
            jnp.einsum("ph,...hw->...pw", mh.imag, xr,
                       precision=precision))
    return jnp.einsum("...pw,qw->...pq", y, jnp.asarray(m_w),
                      precision=precision)


def on_default_tpu() -> bool:
    """True when the default device is a TPU — including the axon PJRT
    plugin, whose *platform* string is 'axon', not 'tpu' (matching on
    jax.default_backend() alone misses the production hardware)."""
    dev = jax.devices()[0]
    return "tpu" in (dev.platform + " " + dev.device_kind).lower()


def _use_matmul_fft(spec: PyramidSpec) -> bool:
    if spec.fft_mode == "auto":
        return on_default_tpu()
    return spec.fft_mode == "matmul"


def fft2_shifted(x: jnp.ndarray, spec: PyramidSpec) -> jnp.ndarray:
    """fftshift(fft2(x)) over the trailing two axes, per spec.fft_mode."""
    if _use_matmul_fft(spec):
        h, w = x.shape[-2], x.shape[-1]
        return _mm2(x, _fwd_shift_matrix(h), _fwd_shift_matrix(w),
                    precision=_dft_precision(spec))
    return jnp.fft.fftshift(jnp.fft.fft2(x.astype(jnp.complex64)),
                            axes=(-2, -1))


def ifft2_shifted(y: jnp.ndarray, spec: PyramidSpec) -> jnp.ndarray:
    """ifft2(ifftshift(y)) over the trailing two axes, per spec.fft_mode."""
    if _use_matmul_fft(spec):
        h, w = y.shape[-2], y.shape[-1]
        return _mm2(y, _inv_shift_matrix(h), _inv_shift_matrix(w),
                    precision=_dft_precision(spec))
    return jnp.fft.ifft2(jnp.fft.ifftshift(y, axes=(-2, -1)))


# ---------------------------------------------------------------------------
# Build / reconstruct (JAX)
# ---------------------------------------------------------------------------

def _crop(x: jnp.ndarray, scale: int) -> jnp.ndarray:
    h, w = x.shape[-2], x.shape[-1]
    ys, xs = _crop_slices(h, w, scale)
    return x[..., ys, xs]


def build(frames: jnp.ndarray, spec: PyramidSpec) -> Pyramid:
    """Decompose grayscale frames into the complex steerable pyramid.

    Args:
      frames: [..., H, W] float array (grayscale).
      spec: pyramid configuration (H, W must match ``spec.input_size``).

    Returns:
      {"high": [..., H, W] float32,
       "bands": tuple over scale of [..., K, H/2^s, W/2^s] complex64,
       "low": [..., H/2^S, W/2^S] float32}
    """
    if frames.shape[-2:] != tuple(spec.input_size):
        raise ValueError(
            f"frames spatial shape {frames.shape[-2:]} != spec.input_size "
            f"{spec.input_size}")
    masks = make_masks(spec)
    x = fft2_shifted(frames.astype(jnp.float32), spec)

    def inv(spec_dom):
        return ifft2_shifted(spec_dom, spec)

    high = inv(x * masks["hi0"][0]).real
    bands = []
    for s in range(spec.height):
        xc = _crop(x, s)[..., None, :, :]           # [..., 1, hs, ws]
        bands.append(inv(xc * masks["bands"][s]))   # [..., K, hs, ws] c64
    low = inv(_crop(x, spec.height) * masks["low"][0]).real
    return {"high": high, "bands": tuple(bands), "low": low}


def _pad_spectrum(spec_dom: jnp.ndarray, h: int, w: int,
                  scale: int) -> jnp.ndarray:
    """Zero-pad an fftshifted cropped spectrum back to full (h, w)."""
    hs, ws = spec_dom.shape[-2], spec_dom.shape[-1]
    pad = [(0, 0)] * (spec_dom.ndim - 2)
    y0 = h // 2 - hs // 2
    x0 = w // 2 - ws // 2
    pad += [(y0, h - y0 - hs), (x0, w - x0 - ws)]
    return jnp.pad(spec_dom, pad)


def reconstruct(pyr: Pyramid, spec: PyramidSpec) -> jnp.ndarray:
    """Invert :func:`build` (perfect reconstruction up to fp32 FFT error).

    Used by tests to validate the filter bank (SURVEY.md §4 item 2); the
    inference path never calls it.
    """
    masks = make_masks(spec)
    h, w = spec.input_size

    def fwd(sig):
        return jnp.fft.fftshift(jnp.fft.fft2(sig), axes=(-2, -1))

    def herm_sym(d):
        # (d(w) + conj(d(-w)))/2 on an even-sized fftshifted grid: -w is
        # flip + roll-by-1 (the Nyquist row/col maps to itself).
        mirror = jnp.roll(jnp.flip(d, axis=(-2, -1)), shift=(1, 1),
                          axis=(-2, -1))
        return 0.5 * (d + jnp.conj(mirror))

    acc = fwd(pyr["high"].astype(jnp.complex64)) * masks["hi0"][0]
    acc = acc + _pad_spectrum(
        fwd(pyr["low"].astype(jnp.complex64)) * masks["low"][0],
        h, w, spec.height)
    for s in range(spec.height):
        band_dft = fwd(pyr["bands"][s])
        contrib = jnp.sum(band_dft * jnp.conj(masks["bands"][s]), axis=-3)
        # Each orientation's analysis covered one half-plane (doubled);
        # Hermitian-symmetrizing restores the mirror lobe, and the angular
        # windows sum to 1 over both lobes, so 0.5x closes the telescoping
        # PR identity hi0^2 + sum_s B_s^2 + lo^2 = 1.
        acc = acc + 0.5 * _pad_spectrum(herm_sym(contrib), h, w, s)
    return jnp.fft.ifft2(jnp.fft.ifftshift(acc, axes=(-2, -1))).real


def band_shapes(spec: PyramidSpec) -> Sequence[Tuple[int, int, int]]:
    """(K, h_s, w_s) per scale — static shape helper for downstream code."""
    return tuple((spec.orientations,) + spec.band_shape(s)
                 for s in range(spec.height))
