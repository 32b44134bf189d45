"""Golden + property tests for the steerable pyramid (SURVEY.md §4 1-2)."""

import numpy as np
import jax.numpy as jnp
import pytest

from mimamo_tpu.config import PyramidSpec
from mimamo_tpu import pyramid

from oracles import pyramid_np, pyramid_torch


SPEC = PyramidSpec(height=3, orientations=4, input_size=(64, 64))


def _rand_frames(shape, seed=0):
    rng = np.random.default_rng(seed)
    return rng.standard_normal(shape).astype(np.float32) * 50.0 + 128.0


class TestAgainstOracle:
    def test_band_values_match_recursive_oracle(self):
        # Scale-relative tolerances throughout (VERDICT round-3 weak
        # item 7): measured fp32-vs-f64 error is ~3e-7 relative, so
        # 1e-5 * scale keeps ~30x headroom while being far tighter
        # than the old flat atol (the "low" residual's scale is ~9e3 —
        # a flat 2e-3 there was one seed away from flaking, and a flat
        # bound on ~50-amplitude bands was a loose 4e-5 relative).
        # Complex BAND coefficients get 1e-4 * scale: their max|.| is
        # per-band much smaller than the residuals' (more cancellation
        # through the oriented masks), so the same absolute fp32 error
        # is a larger scale-relative one — still ~100x headroom.
        im = _rand_frames((2, 64, 64))
        got = pyramid.build(jnp.asarray(im), SPEC)
        want = pyramid_np.build(im, height=3, nbands=4)
        for part in ("high", "low"):
            scale = np.abs(want[part]).max()
            np.testing.assert_allclose(
                np.asarray(got[part]), want[part],
                atol=1e-5 * scale, rtol=0)
        for s in range(SPEC.height):
            g = np.asarray(got["bands"][s])
            w = want["bands"][s]
            assert g.shape == w.shape
            scale = np.abs(w).max()
            np.testing.assert_allclose(g, w, atol=1e-4 * scale, rtol=0)

    @pytest.mark.parametrize("height,orientations,size",
                             [(3, 4, 64), (2, 6, 32), (2, 2, 48)])
    def test_two_oracles_and_jax_path_agree(self, height, orientations,
                                            size):
        """SURVEY.md §4 item 1: NumPy and torch-CPU (torch.fft) oracles
        must agree to float64 precision with each other, and the JAX
        path within the 1e-3 fp32 budget with both — pinning the
        legacy-torch.rfft convention question (see pyramid_torch
        docstring: onesided=False == full fft2, numpy normalization)."""
        im = _rand_frames((2, size, size), seed=7)
        spec = PyramidSpec(height=height, orientations=orientations,
                           input_size=(size, size))
        got = pyramid.build(jnp.asarray(im), spec)
        w_np = pyramid_np.build(im, height=height, nbands=orientations)
        w_th = pyramid_torch.build(im, height=height, nbands=orientations)
        for part in ("high", "low"):
            scale = np.abs(w_np[part]).max()
            np.testing.assert_allclose(w_th[part], w_np[part],
                                       atol=1e-10 * scale, rtol=0)
            np.testing.assert_allclose(np.asarray(got[part]), w_np[part],
                                       atol=1e-3 * scale, rtol=0)
        for s in range(height):
            scale = np.abs(w_np["bands"][s]).max()
            np.testing.assert_allclose(w_th["bands"][s], w_np["bands"][s],
                                       atol=1e-10 * scale, rtol=0)
            np.testing.assert_allclose(
                np.asarray(got["bands"][s]), w_np["bands"][s],
                atol=1e-3 * scale, rtol=0)

    @pytest.mark.parametrize("height,orientations,h,w",
                             [(3, 4, 64, 64), (2, 6, 32, 48),
                              (2, 2, 48, 32), (1, 4, 24, 40)])
    def test_legacy_onesided_rfft_route_is_identical(self, height,
                                                     orientations, h, w):
        """SURVEY.md §4 item 1 / A.1 parity trap closed empirically:
        the legacy torch.rfft one-sided spectrum, explicitly
        Hermitian-completed, drives the identical-mask oracle to
        bit-level float64 agreement with the full-fft2 route —
        including non-square and 2-mod-4 sizes where an fftshift or
        completion-parity bug would surface. The legacy convention is
        therefore *proven* (not just argued) to coincide."""
        im = _rand_frames((2, h, w), seed=11)
        a = pyramid_torch.build(im, height=height, nbands=orientations,
                                fft_impl="fft2")
        b = pyramid_torch.build(im, height=height, nbands=orientations,
                                fft_impl="rfft_hermitian")
        for part in ("high", "low"):
            np.testing.assert_allclose(
                b[part], a[part], rtol=0,
                atol=1e-12 * np.abs(a[part]).max())
        for s in range(height):
            np.testing.assert_allclose(
                b["bands"][s], a["bands"][s], rtol=0,
                atol=1e-12 * np.abs(a["bands"][s]).max())

    @pytest.mark.parametrize("orientations", [2, 4, 6])
    def test_orientation_counts(self, orientations):
        spec = PyramidSpec(height=2, orientations=orientations,
                           input_size=(32, 32))
        im = _rand_frames((1, 32, 32), seed=1)
        got = pyramid.build(jnp.asarray(im), spec)
        want = pyramid_np.build(im, height=2, nbands=orientations)
        for s in range(2):
            w = want["bands"][s]
            np.testing.assert_allclose(
                np.asarray(got["bands"][s]), w,
                atol=1e-4 * np.abs(w).max(), rtol=0)


class TestProperties:
    def test_perfect_reconstruction(self):
        """Filter-bank PR property (SURVEY.md §4 item 2)."""
        im = _rand_frames((1, 64, 64), seed=2)
        pyr = pyramid.build(jnp.asarray(im), SPEC)
        rec = np.asarray(pyramid.reconstruct(pyr, SPEC))
        err = np.abs(rec - im).max() / np.abs(im).max()
        assert err < 1e-3, f"reconstruction rel-err {err}"

    def test_linearity(self):
        a = _rand_frames((1, 64, 64), seed=3)
        b = _rand_frames((1, 64, 64), seed=4)
        pa = pyramid.build(jnp.asarray(a), SPEC)
        pb = pyramid.build(jnp.asarray(b), SPEC)
        pab = pyramid.build(jnp.asarray(a + b), SPEC)
        for s in range(SPEC.height):
            want = (np.asarray(pa["bands"][s])
                    + np.asarray(pb["bands"][s]))
            # scale-relative (measured ~1e-6 relative; 1e-5*scale
            # keeps 10x headroom vs the old loose flat 2e-2)
            np.testing.assert_allclose(
                np.asarray(pab["bands"][s]), want,
                atol=1e-5 * np.abs(want).max(), rtol=0)

    def test_band_shapes_downsample_per_scale(self):
        im = jnp.zeros((1, 64, 64))
        pyr = pyramid.build(im, SPEC)
        assert pyr["high"].shape == (1, 64, 64)
        assert pyr["low"].shape == (1, 8, 8)
        for s in range(SPEC.height):
            assert pyr["bands"][s].shape == (1, 4, 64 >> s, 64 >> s)

    def test_translation_moves_phase(self):
        """A shifted image produces nonzero phase differences whose sign
        tracks the shift direction for the horizontal orientation band."""
        h = w = 64
        _, xx = np.meshgrid(np.arange(h), np.arange(w), indexing="ij")
        freq = 2 * np.pi * 6.0 / w
        f0 = np.cos(freq * xx).astype(np.float32)
        shift = 1.0
        f1 = np.cos(freq * (xx - shift)).astype(np.float32)
        frames = jnp.asarray(np.stack([f0, f1])[None])      # [1,2,H,W]
        spec = PyramidSpec(height=3, orientations=4, input_size=(64, 64))
        p0 = pyramid.build(frames[:, 0], spec)
        p1 = pyramid.build(frames[:, 1], spec)
        # Orientation k=0 is horizontal-frequency; expected dphi=freq*shift.
        best = None
        for s in range(3):
            c0, c1 = p0["bands"][s][:, 0], p1["bands"][s][:, 0]
            amp = np.abs(np.asarray(c0))
            if best is None or amp.max() > best[0]:
                prod = np.asarray(c1) * np.conj(np.asarray(c0))
                best = (amp.max(), prod, amp)
        _, prod, amp = best
        mask = amp > 0.5 * amp.max()
        dphi = np.arctan2(prod.imag, prod.real)[mask]
        # Rightward shift multiplies the positive-frequency analytic band
        # by exp(-i*freq*shift), so the wrapped phase diff is -freq*shift.
        np.testing.assert_allclose(dphi, -freq * shift, atol=1e-2)

    def test_rejects_wrong_input_size(self):
        with np.testing.assert_raises(ValueError):
            pyramid.build(jnp.zeros((1, 32, 32)), SPEC)


class TestMatmulDFT:
    """The MXU DFT path (fft_mode='matmul': shift-baked complex matmuls)
    must match jnp.fft numerically — it is the TPU production path."""

    def test_fft_roundtrip_and_parity(self):
        rng = np.random.default_rng(11)
        x = jnp.asarray(rng.standard_normal((3, 64, 64)).astype(
            np.float32) * 40)
        spec_mm = PyramidSpec(height=2, orientations=4,
                              input_size=(64, 64), fft_mode="matmul")
        got = np.asarray(pyramid.fft2_shifted(x, spec_mm))
        want = np.fft.fftshift(np.fft.fft2(np.asarray(x, np.float64)),
                               axes=(-2, -1))
        scale = np.abs(want).max()
        np.testing.assert_allclose(got, want, atol=2e-5 * scale, rtol=0)
        back = np.asarray(pyramid.ifft2_shifted(jnp.asarray(want), spec_mm))
        np.testing.assert_allclose(back.real, np.asarray(x), atol=1e-3)

    def test_micro_motion_modes_agree(self):
        from mimamo_tpu.config import PhaseSpec
        from mimamo_tpu import phase as phase_mod
        rng = np.random.default_rng(12)
        frames = jnp.asarray(
            rng.uniform(0, 255, (1, 4, 64, 64)).astype(np.float32))
        ph = PhaseSpec(phase_size=48)
        base = PyramidSpec(height=3, orientations=4, input_size=(64, 64),
                           fft_mode="fft")
        mm = PyramidSpec(height=3, orientations=4, input_size=(64, 64),
                         fft_mode="matmul")
        a = np.asarray(phase_mod.micro_motion_features(frames, base, ph))
        b = np.asarray(phase_mod.micro_motion_features(frames, mm, ph))
        np.testing.assert_allclose(a, b, atol=1e-3, rtol=0)

    def test_real_forward_split_matches_complex_cast(self):
        """The real-input forward split (two real GEMMs instead of a
        zero-imag complex product) is mathematically exact; it differs
        from the legacy complex-cast lowering only by XLA's Gauss-trick
        reassociation rounding (~2e-4 on f32 phase maps), far inside
        the 1e-3 parity budget. The HARDWARE gate lives in
        bench/phase_precision_experiments.py (dft_precision='high' is
        a measured NEGATIVE result there: 1.40 rad — keep 'highest')."""
        from mimamo_tpu.config import PhaseSpec
        from mimamo_tpu import phase as phase_mod
        rng = np.random.default_rng(13)
        frames = jnp.asarray(
            rng.uniform(0, 255, (1, 3, 64, 64)).astype(np.float32))
        ph = PhaseSpec(phase_size=48)
        mm = PyramidSpec(height=3, orientations=4, input_size=(64, 64),
                         fft_mode="matmul")
        assert pyramid._SPLIT_REAL_FORWARD
        # positive engagement signal: each run must TRACE its branch of
        # _mm2 (a stale jit cache on this path would make the A/B
        # vacuous). Asserting the outputs differ numerically instead
        # would spuriously fail if a future XLA version rounded the two
        # lowerings identically (round-5 advisor finding).
        pyramid._TRACED_FORWARD_PATHS.clear()
        a = np.asarray(phase_mod.micro_motion_features(frames, mm, ph))
        assert "split" in pyramid._TRACED_FORWARD_PATHS
        try:
            pyramid._SPLIT_REAL_FORWARD = False
            pyramid._TRACED_FORWARD_PATHS.clear()
            b = np.asarray(phase_mod.micro_motion_features(frames, mm, ph))
            assert "complex" in pyramid._TRACED_FORWARD_PATHS
        finally:
            pyramid._SPLIT_REAL_FORWARD = True
        np.testing.assert_allclose(a, b, atol=1e-3, rtol=0)

    def test_dft_precision_knob(self):
        """On CPU both precisions are exact f32, so 'high' must agree
        with 'highest' here; an unknown value fails fast at
        construction (frozen-config convention, CLAUDE.md)."""
        rng = np.random.default_rng(14)
        x = jnp.asarray(rng.standard_normal((2, 32, 32)).astype(
            np.float32) * 40)
        got = {}
        for p in ("highest", "high"):
            spec = PyramidSpec(height=2, orientations=4,
                               input_size=(32, 32), fft_mode="matmul",
                               dft_precision=p)
            got[p] = np.asarray(pyramid.fft2_shifted(x, spec))
        np.testing.assert_allclose(got["high"], got["highest"],
                                   atol=0, rtol=0)
        with pytest.raises(ValueError, match="dft_precision"):
            PyramidSpec(input_size=(32, 32), fft_mode="matmul",
                        dft_precision="bogus")
        with pytest.raises(ValueError, match="fft_mode"):
            PyramidSpec(input_size=(32, 32), fft_mode="bogus")
