"""Pallas fused phase kernel == XLA reference path (interpreter mode on
CPU; the real-TPU run is exercised by bench.py / the driver)."""

import numpy as np
import jax
import jax.numpy as jnp

from mimamo_tpu.config import PhaseSpec, PyramidSpec
from mimamo_tpu import phase
from mimamo_tpu.pallas import phase_kernel


PYR = PyramidSpec(height=3, orientations=4, input_size=(64, 64))
PH = PhaseSpec(phase_size=48)


class TestFusedKernel:
    def test_blocked_kernel_matches_xla(self):
        rng = np.random.default_rng(2)
        shape = (3, 5, 2, 32, 32)    # leading dims deliberately not a
        c_t = (rng.standard_normal(shape) +     # multiple of the block
               1j * rng.standard_normal(shape)).astype(np.complex64)
        c_p = (rng.standard_normal(shape) +
               1j * rng.standard_normal(shape)).astype(np.complex64)
        want = phase.resize_bilinear(
            phase.phase_diff(jnp.asarray(c_t), jnp.asarray(c_p)), (48, 48))
        got = phase_kernel.phase_diff_resize_blocked(
            jnp.asarray(c_t), jnp.asarray(c_p), phase_size=48, block=8,
            interpret=True)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   atol=1e-4, rtol=0)

    def test_micro_motion_fused_matches_unfused(self):
        rng = np.random.default_rng(1)
        frames = jnp.asarray(
            rng.uniform(0, 255, (1, 5, 64, 64)).astype(np.float32))
        want = np.asarray(phase.micro_motion_features(frames, PYR, PH))
        got = np.asarray(phase_kernel.micro_motion_features_fused(
            frames, PYR, PH, interpret=True))
        assert got.shape == want.shape == (1, 4, 12, 48, 48)
        np.testing.assert_allclose(got, want, atol=1e-3, rtol=0)

    def test_amplitude_weighting_matches_unfused(self):
        """The fused kernel implements the amplitude_weighting knob
        in-kernel (VERDICT round 1: no silent fallback)."""
        from mimamo_tpu.config import PhaseSpec
        ph = PhaseSpec(phase_size=48, amplitude_weighting=True)
        rng = np.random.default_rng(4)
        frames = jnp.asarray(
            rng.uniform(0, 255, (1, 4, 64, 64)).astype(np.float32))
        want = np.asarray(phase.micro_motion_features(frames, PYR, ph))
        got = np.asarray(phase_kernel.micro_motion_features_fused(
            frames, PYR, ph, interpret=True))
        np.testing.assert_allclose(got, want, atol=1e-3, rtol=0)
        # the knob actually does something
        base = np.asarray(phase.micro_motion_features(frames, PYR, PH))
        assert np.abs(want - base).max() > 1e-3

    def test_shape_mismatch_rejected(self):
        a = jnp.zeros((2, 8, 8), jnp.complex64)
        b = jnp.zeros((3, 8, 8), jnp.complex64)
        with np.testing.assert_raises(ValueError):
            phase_kernel.phase_diff_resize_blocked(a, b, interpret=True)


class TestStemKernel:
    """Fused upscale+conv1+pool stem (pallas/stem_kernel.py).

    The kernel measured SLOWER than the fused XLA chain at the flagship
    shape (negative result in BASELINE.md) and is not wired into the
    model path, but it is kept as the exact in-VMEM formulation — these
    tests pin its parity against the XLA reference chain, including the
    conv zero-pad / upscale edge-clamp corners and the BGR fold.
    """

    @staticmethod
    def _reference(crops, k7, b, spec):
        import flax.linen as nn
        from mimamo_tpu import preprocess
        imgs = preprocess.for_backbone(crops, spec)
        y = jax.lax.conv_general_dilated(
            imgs.astype(jnp.float32), k7, (2, 2), [(3, 3), (3, 3)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        return nn.max_pool(nn.relu(y + b), (3, 3), strides=(2, 2),
                           padding=((1, 1), (1, 1)))

    def test_matches_xla_chain_f32(self):
        from mimamo_tpu.config import BackboneSpec
        from mimamo_tpu.pallas import stem_kernel as sk
        rng = np.random.default_rng(0)
        crops = jnp.asarray(
            rng.uniform(0, 255, (2, 112, 112, 3)).astype(np.float32))
        k7 = jnp.asarray(
            rng.normal(0, 0.05, (7, 7, 3, 64)).astype(np.float32))
        b = jnp.asarray(rng.normal(0, 0.1, (64,)).astype(np.float32))
        for order in ("rgb", "bgr"):
            spec = BackboneSpec(dtype="float32", channel_order=order)
            want = self._reference(crops, k7, b, spec)
            w2, b2 = sk.prepare_stem_weights(k7, b, channel_order=order,
                                             dtype=jnp.float32)
            got = sk.stem_fused(
                sk.prepare_stem_input(crops, spec.mean_rgb), w2, b2,
                dtype=jnp.float32, interpret=True)
            assert got.shape == (2, 56, 56, 64)
            np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                       atol=1e-3, rtol=0)

    def test_rejects_wrong_shape(self):
        from mimamo_tpu.pallas import stem_kernel as sk
        with np.testing.assert_raises(ValueError):
            sk.stem_fused(jnp.zeros((1, 3, 64, 64)),
                          jnp.zeros((147, 64)), jnp.zeros((1, 64)),
                          interpret=True)
