"""Similarity alignment tests: cv2.warpAffine oracle + rotation recovery."""

import cv2
import numpy as np
import jax.numpy as jnp
import jax

from mimamo_tpu import preprocess
from mimamo_tpu.io import decode
from mimamo_tpu.runner import Mimamo

from test_runner import tiny_config


class TestWarpSimilarity:
    def test_matches_cv2_warp_affine(self):
        """On-device warp == cv2.warpAffine(WARP_INVERSE_MAP) oracle."""
        rng = np.random.default_rng(0)
        img = rng.uniform(0, 255, (60, 80, 3)).astype(np.float32)
        # inverse map in (y, x) convention: rotation + scale + shift
        th, s = 0.3, 1.3
        a = np.asarray([[s * np.cos(th), -s * np.sin(th), 7.0],
                        [s * np.sin(th), s * np.cos(th), 5.0]], np.float32)
        got = np.asarray(preprocess.warp_similarity(
            jnp.asarray(img[None]), jnp.asarray(a[None]), 32))[0]
        # cv2 works in (x, y) on integer pixel coords; ours uses
        # half-pixel centers — fold the difference into the translation.
        t_adj = a[:, :2] @ np.asarray([0.5, 0.5]) + a[:, 2] - 0.5
        m_xy = np.asarray([[a[1, 1], a[1, 0], t_adj[1]],
                           [a[0, 1], a[0, 0], t_adj[0]]], np.float32)
        want = cv2.warpAffine(
            img, m_xy, (32, 32),
            flags=cv2.INTER_LINEAR | cv2.WARP_INVERSE_MAP,
            borderMode=cv2.BORDER_REPLICATE)
        # interior only: edge-clamp details differ at the border
        np.testing.assert_allclose(got[2:-2, 2:-2], want[2:-2, 2:-2],
                                   atol=1e-2)

    def test_identity_transform_is_resize(self):
        rng = np.random.default_rng(1)
        img = rng.uniform(0, 255, (32, 32, 3)).astype(np.float32)
        eyes = np.asarray([[[0.38 * 32, 0.22 * 32],
                            [0.38 * 32, 0.78 * 32]]], np.float32)
        t = preprocess.similarity_from_eyes(eyes, 32, eye_y=0.38,
                                            eye_dx=0.28)
        got = np.asarray(preprocess.warp_similarity(
            jnp.asarray(img[None]), jnp.asarray(t), 32))[0]
        # eyes at (0.38, 0.22/0.78)*32 in source, canon (0.38, 0.5+-0.28):
        # scale = (0.78-0.22)/(0.28*2) = 1.0, no rotation, pure shift
        assert np.abs(got[8:24, 8:24] - img[8:24, 8:24]).max() < 1e-3

    def test_rotation_recovery(self):
        """A face rotated by theta in the source comes out upright:
        aligning with the rotated eye positions recovers the pattern at
        the canonical orientation."""
        size = 64
        yy, xx = np.mgrid[:size, :size].astype(np.float32)
        pattern = (np.sin(xx / 3.0) * np.cos(yy / 5.0) * 100 + 128)
        img = pattern[..., None].repeat(3, -1).astype(np.float32)

        # ground-truth eyes in an unrotated frame
        eyes0 = np.asarray([[24.0, 20.0], [24.0, 44.0]], np.float32)
        t0 = preprocess.similarity_from_eyes(eyes0[None], 48)
        ref = np.asarray(preprocess.warp_similarity(
            jnp.asarray(img[None]), jnp.asarray(t0), 48))[0]

        # rotate the image (and the eyes) by 20 degrees about the center
        ang = 20.0
        m = cv2.getRotationMatrix2D((size / 2, size / 2), ang, 1.0)
        rot = cv2.warpAffine(img, m, (size, size),
                             borderMode=cv2.BORDER_REPLICATE)
        pts_xy = np.stack([eyes0[:, 1], eyes0[:, 0], np.ones(2)])
        rot_xy = (m @ pts_xy).T                        # [(x, y), ...]
        eyes_rot = np.stack([rot_xy[:, 1], rot_xy[:, 0]], -1)[None]
        t1 = preprocess.similarity_from_eyes(
            eyes_rot.astype(np.float32), 48)
        aligned = np.asarray(preprocess.warp_similarity(
            jnp.asarray(rot[None]), jnp.asarray(t1), 48))[0]

        # central region matches the unrotated alignment
        diff = np.abs(aligned[12:36, 12:36, 0] - ref[12:36, 12:36, 0])
        assert diff.mean() < 6.0, f"mean diff {diff.mean()}"


class TestBoxTracking:
    @staticmethod
    def _moving_square_clip(t=10, size=96, step=3):
        """Textured square translating right by ``step`` px/frame (no
        detectable face, so only tracking moves the box)."""
        rng = np.random.default_rng(5)
        tex = rng.uniform(0, 255, (24, 24)).astype(np.float32)
        frames = np.full((t, size, size, 3), 32, np.uint8)
        for i in range(t):
            x0 = 12 + i * step
            frames[i, 36:60, x0:x0 + 24] = \
                tex[..., None].repeat(3, -1).astype(np.uint8)
        return frames

    class _FakeDet:
        """Detects the square once at frame 0, then goes blind — so any
        later box motion is the tracker's doing."""

        def __init__(self):
            self.calls = 0

        def detectMultiScale(self, gray, **kw):
            self.calls += 1
            return (np.asarray([[12, 36, 24, 24]]) if self.calls == 1
                    else ())

    def test_lk_tracking_follows_motion(self, monkeypatch):
        frames = self._moving_square_clip()
        monkeypatch.setattr(decode, "_haar_detector",
                            lambda: self._FakeDet())
        hold = decode.face_boxes(frames, detect_every=1000, track="hold")
        lk = decode.face_boxes(frames, detect_every=1000, track="lk")
        # hold-last never moves after the single detection; LK follows
        # the square rightward
        np.testing.assert_allclose(hold[1], hold[-1])
        drift = lk[-1, 1] - lk[0, 1]
        expected = 3.0 * (len(frames) - 1)
        assert drift > 0.6 * expected, (
            f"LK box moved {drift:.1f}px, expected ~{expected}")

    def test_lk_static_scene_stays_put(self):
        rng = np.random.default_rng(6)
        frame = rng.uniform(0, 255, (64, 64, 3)).astype(np.uint8)
        frames = np.repeat(frame[None], 6, axis=0)
        lk = decode.face_boxes(frames, detect_every=1000, track="lk")
        np.testing.assert_allclose(lk[0], lk[-1], atol=0.5)

    def test_rejects_unknown_mode(self):
        frames = np.zeros((2, 32, 32, 3), np.uint8)
        with np.testing.assert_raises(ValueError):
            decode.face_boxes(frames, track="nope")


class TestLandmarkPlumbing:
    def test_eye_landmarks_fallback_canonical(self):
        """No detectable eyes in noise -> canonical in-box positions."""
        rng = np.random.default_rng(2)
        frames = rng.uniform(0, 255, (3, 64, 64, 3)).astype(np.uint8)
        boxes = np.tile(np.asarray([[8.0, 8.0, 48.0, 48.0]], np.float32),
                        (3, 1))
        eyes = decode.eye_landmarks(frames, boxes)
        assert eyes.shape == (3, 2, 2)
        np.testing.assert_allclose(eyes[0, 0],
                                   [8 + 0.38 * 48, 8 + 0.22 * 48],
                                   atol=2.0)

    def test_predict_video_with_landmarks(self):
        model = Mimamo(tiny_config())
        variables = model.init_variables(jax.random.PRNGKey(0))
        rng = np.random.default_rng(3)
        frames = rng.uniform(0, 255, (8, 48, 64, 3)).astype(np.float32)
        boxes = np.tile(np.asarray([[8.0, 16.0, 32.0, 32.0]], np.float32),
                        (8, 1))
        eyes = decode.eye_landmarks(frames.astype(np.uint8), boxes)
        out = model.predict_video(variables, frames, boxes,
                                  landmarks=eyes, batch_clips=2)
        assert out.shape == (8, 2)
        assert np.all(np.isfinite(out))
