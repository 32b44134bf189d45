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

    def test_no_matmul_on_coordinate_path(self):
        """The warp must contain NO dot/einsum anywhere: on TPU a K=3
        coordinate einsum rounds its operands to bf16 (default matmul
        precision), shifting sampling positions by 0.26-1.75 px by
        source scale (measured on v5e 2026-08-19, bench/crop_probe.py
        — whose gather4 parity gate is the hardware regression test).
        Coordinates are elementwise FMAs and sampling is a gather, so
        any dot_general in the jaxpr is a reintroduction."""
        jaxpr = jax.make_jaxpr(
            lambda f, a: preprocess.warp_similarity(f, a, 32))(
            jnp.zeros((2, 60, 80, 3)), jnp.zeros((2, 2, 3)))
        # walk nested call/pjit subjaxprs too — einsum may be wrapped
        prims = set()
        stack = [jaxpr.jaxpr]
        while stack:
            j = stack.pop()
            for e in j.eqns:
                prims.add(e.primitive.name)
                for v in e.params.values():
                    if hasattr(v, "jaxpr"):
                        stack.append(v.jaxpr)
        assert "dot_general" not in prims, prims

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


class TestProcrustesAlignment:
    @staticmethod
    def _ring_landmarks(k=68):
        """Synthetic face-ish landmark template: ellipse + eye clusters
        at the iBUG eye indices so eyes_from_landmarks68 is meaningful."""
        ang = np.linspace(0, 2 * np.pi, k, endpoint=False)
        pts = np.stack([30 + 20 * np.sin(ang), 30 + 15 * np.cos(ang)],
                       axis=-1)
        pts[36:42] = [22.0, 22.0] + np.random.default_rng(0).normal(
            0, 0.5, (6, 2))
        pts[42:48] = [22.0, 38.0] + np.random.default_rng(1).normal(
            0, 0.5, (6, 2))
        return pts.astype(np.float64)

    def test_umeyama_recovers_known_similarity(self):
        dst = self._ring_landmarks()
        th, s, ty, tx = 0.4, 1.7, 5.0, -3.0
        rot = s * np.asarray([[np.cos(th), -np.sin(th)],
                              [np.sin(th), np.cos(th)]])
        src = dst @ rot.T + [ty, tx]
        a = preprocess._umeyama_fit(dst, src)
        np.testing.assert_allclose(a[:, :2], rot, atol=1e-9)
        np.testing.assert_allclose(a[:, 2], [ty, tx], atol=1e-9)

    def test_umeyama_matches_cv2_oracle(self):
        """Independent oracle (repo convention): our complex-LSQ fit vs
        cv2.estimateAffinePartial2D. Note cv2's LMEDS is a robust
        estimator (it refits on an inlier subset; cv2 offers no plain
        full-LSQ mode here), so under Gaussian noise the two estimates
        agree only to ~noise scale — hence the loose atol; do NOT
        tighten it expecting exact agreement."""
        rng = np.random.default_rng(3)
        dst = self._ring_landmarks()
        th, s = -0.25, 0.8
        rot = s * np.asarray([[np.cos(th), -np.sin(th)],
                              [np.sin(th), np.cos(th)]])
        src = dst @ rot.T + [12.0, -4.0] + rng.normal(0, 0.8, dst.shape)
        got = preprocess._umeyama_fit(dst, src)
        # cv2 works in (x, y); ours in (y, x) — swap both point sets
        m, _ = cv2.estimateAffinePartial2D(
            dst[:, ::-1].astype(np.float64),
            src[:, ::-1].astype(np.float64), method=cv2.LMEDS,
            refineIters=100)
        want = np.asarray([[m[1, 1], m[1, 0], m[1, 2]],
                           [m[0, 1], m[0, 0], m[0, 2]]])
        np.testing.assert_allclose(got, want, atol=5e-2)

    def test_umeyama_degenerate_raises(self):
        pts = np.ones((5, 2))
        with np.testing.assert_raises(ValueError):
            preprocess._umeyama_fit(pts, pts)

    def test_dense_alignment_matches_eye_alignment_for_rigid_motion(self):
        """For pure similarity motion of the landmarks, the Procrustes
        transform maps the same source points to the same output spots
        as the 2-eye fit (both place eye centers canonically)."""
        base = self._ring_landmarks()
        t = 4
        lm = np.empty((t, 68, 2))
        for i in range(t):
            th = 0.1 * i
            rot = (1 + 0.05 * i) * np.asarray(
                [[np.cos(th), -np.sin(th)], [np.sin(th), np.cos(th)]])
            lm[i] = base @ rot.T + [3.0 * i, -2.0 * i]
        from mimamo_tpu.io.openface import eyes_from_landmarks68
        a_dense = preprocess.similarity_from_landmarks68(lm, 48)
        a_eyes = preprocess.similarity_from_eyes(
            eyes_from_landmarks68(lm), 48)
        # same inverse maps (up to fit tolerance): rigid motion keeps
        # every frame's shape identical to the GPA mean
        np.testing.assert_allclose(a_dense, a_eyes, atol=1e-3)

    def test_dense_alignment_resists_landmark_jitter(self):
        """Perturb ONE eye point hard: the 2-point fit swings, the
        68-point fit barely moves — the stability OpenFace-style
        alignment is for."""
        base = self._ring_landmarks()
        lm = np.stack([base, base.copy()])
        lm[1, 37] += [6.0, 6.0]          # one corrupted eye landmark
        a_dense = preprocess.similarity_from_landmarks68(lm, 48)
        from mimamo_tpu.io.openface import eyes_from_landmarks68
        a_eyes = preprocess.similarity_from_eyes(
            eyes_from_landmarks68(lm), 48)
        drift_dense = np.abs(a_dense[1] - a_dense[0]).max()
        drift_eyes = np.abs(a_eyes[1] - a_eyes[0]).max()
        assert drift_dense < 0.5 * drift_eyes, (
            f"dense fit drift {drift_dense:.3f} not < half of eye-fit "
            f"drift {drift_eyes:.3f}")

    def test_generic_k_warns_and_eye_indices_silences(self):
        """K != 68 dense sets: the extremal-x pseudo-eye anchor is
        approximate, so it warns; explicit eye_indices restores the
        documented eye convention exactly (round-2 advisor finding)."""
        import warnings
        import pytest
        ang = np.linspace(0, 2 * np.pi, 20, endpoint=False)
        base = np.stack([30 + 20 * np.sin(ang), 30 + 15 * np.cos(ang)],
                        axis=-1)
        lm = np.tile(base[None], (2, 1, 1))
        with pytest.warns(UserWarning, match="pseudo-eyes"):
            preprocess.similarity_from_landmarks68(lm, 48)
        # pick two actual points as eyes: no warning, and the anchor
        # matches the 2-point eye fit applied to those template points
        with warnings.catch_warnings():
            warnings.simplefilter("error")
            a = preprocess.similarity_from_landmarks68(
                lm, 48, eye_indices=(3, 12))
        assert a.shape == (2, 2, 3) and np.isfinite(a).all()

    def test_dispatcher_shapes(self):
        eyes = np.tile(np.asarray([[[20.0, 15.0], [20.0, 40.0]]],
                                  np.float32), (2, 1, 1))
        assert preprocess.similarity_from_landmarks(eyes, 32).shape == \
            (2, 2, 3)
        dense = np.tile(self._ring_landmarks()[None], (2, 1, 1))
        assert preprocess.similarity_from_landmarks(dense, 32).shape == \
            (2, 2, 3)
        with np.testing.assert_raises(ValueError):
            preprocess.similarity_from_landmarks(eyes[0], 32)


class TestOpenFaceCSV:
    @staticmethod
    def _write_csv(path, rows, header=None):
        if header is None:
            header = (["frame", " face_id", " timestamp", " confidence",
                       " success"]
                      + [f" x_{i}" for i in range(68)]
                      + [f" y_{i}" for i in range(68)])
        with open(path, "w") as f:
            f.write(",".join(header) + "\n")
            for r in rows:
                f.write(",".join(str(v) for v in r) + "\n")

    @staticmethod
    def _row(frame, conf, success, xs, ys, face_id=0):
        return ([frame, face_id, frame / 25.0, conf, success]
                + list(xs) + list(ys))

    def test_parse_hold_last_and_best_face(self, tmp_path):
        from mimamo_tpu.io import openface
        path = str(tmp_path / "vid.openface.csv")
        xs0, ys0 = np.arange(68) * 1.0, np.arange(68) * 2.0
        xs1, ys1 = xs0 + 5, ys0 + 5
        rows = [
            self._row(1, 0.9, 1, xs0, ys0),
            self._row(1, 0.5, 1, xs1, ys1, face_id=1),  # lower conf
            self._row(2, 0.1, 0, xs1, ys1),             # failed
            # frame 3 missing entirely
            self._row(4, 0.8, 1, xs1, ys1),
        ]
        self._write_csv(path, rows)
        lm, success = openface.read_landmarks_csv(path, num_frames=4)
        assert lm.shape == (4, 68, 2)
        np.testing.assert_allclose(lm[0, :, 1], xs0)   # best face kept
        np.testing.assert_allclose(lm[0, :, 0], ys0)   # (y, x) order
        np.testing.assert_allclose(lm[1], lm[0])        # hold-last
        np.testing.assert_allclose(lm[2], lm[0])
        np.testing.assert_allclose(lm[3, :, 1], xs1)
        np.testing.assert_array_equal(success, [True, False, False, True])

    def test_parse_backfills_before_first_success(self, tmp_path):
        from mimamo_tpu.io import openface
        path = str(tmp_path / "v.csv")
        xs, ys = np.arange(68) * 1.0, np.arange(68) * 1.0
        rows = [self._row(1, 0.0, 0, xs, ys),
                self._row(2, 0.9, 1, xs + 3, ys + 3)]
        self._write_csv(path, rows)
        lm, success = openface.read_landmarks_csv(path)
        np.testing.assert_allclose(lm[0], lm[1])
        assert not success[0] and success[1]

    def test_parse_errors(self, tmp_path):
        from mimamo_tpu.io import openface
        bad = str(tmp_path / "bad.csv")
        with open(bad, "w") as f:
            f.write("a,b,c\n1,2,3\n")
        with np.testing.assert_raises(ValueError):
            openface.read_landmarks_csv(bad)
        nolm = str(tmp_path / "nolm.csv")
        with open(nolm, "w") as f:
            f.write("frame,success\n1,1\n")
        with np.testing.assert_raises(ValueError):
            openface.read_landmarks_csv(nolm)
        allfail = str(tmp_path / "fail.csv")
        xs, ys = np.arange(68) * 1.0, np.arange(68) * 1.0
        self._write_csv(allfail, [self._row(1, 0.0, 0, xs, ys)])
        with np.testing.assert_raises(ValueError):
            openface.read_landmarks_csv(allfail)

    def test_malformed_row_reports_line_number(self, tmp_path):
        from mimamo_tpu.io import openface
        path = str(tmp_path / "trunc.csv")
        xs, ys = np.arange(68) * 1.0, np.arange(68) * 2.0
        good = self._row(1, 0.9, 1, xs, ys)
        with open(path, "w") as f:
            hdr = (["frame", " face_id", " timestamp", " confidence",
                    " success"] + [f" x_{i}" for i in range(68)]
                   + [f" y_{i}" for i in range(68)])
            f.write(",".join(hdr) + "\n")
            f.write(",".join(str(v) for v in good) + "\n")
            f.write("2,0,0.08,0.9,1,12.5,oops\n")       # truncated row
        with np.testing.assert_raises(ValueError):
            try:
                openface.read_landmarks_csv(path)
            except ValueError as e:
                assert "trunc.csv:3" in str(e), e
                raise

    def test_boxes_from_landmarks(self):
        from mimamo_tpu.io import openface
        lm = np.zeros((2, 68, 2), np.float32)
        lm[:, :, 0] = np.linspace(10, 50, 68)     # y in 10..50
        lm[:, :, 1] = np.linspace(20, 40, 68)     # x in 20..40
        boxes = openface.boxes_from_landmarks68(lm, 100, 100, margin=0.25)
        assert boxes.shape == (2, 4)
        assert boxes[0, 2] == boxes[0, 3]          # squared
        np.testing.assert_allclose(boxes[0, 2], 50.0, atol=1e-5)

    def test_load_landmarks_csv_sidecar(self, tmp_path):
        """decode.load_landmarks probes <video>.openface.csv and returns
        dense landmarks that flow through predict_video."""
        video = str(tmp_path / "clip.mp4")
        xs, ys = 15 + np.arange(68) % 8 * 2.0, 10 + np.arange(68) // 8 * 3.0
        self._write_csv(video + ".openface.csv",
                        [self._row(i + 1, 0.9, 1, xs + i, ys) for i in
                         range(6)])
        lm = decode.load_landmarks(video, 6)
        assert lm is not None and lm.shape == (6, 68, 2)
        model = Mimamo(tiny_config())
        variables = model.init_variables(jax.random.PRNGKey(0))
        frames = np.random.default_rng(4).uniform(
            0, 255, (6, 48, 64, 3)).astype(np.float32)
        boxes = np.tile(np.asarray([[8.0, 16.0, 32.0, 32.0]], np.float32),
                        (6, 1))
        out = model.predict_video(variables, frames, boxes, landmarks=lm,
                                  batch_clips=2)
        assert out.shape == (6, 2) and np.all(np.isfinite(out))


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
