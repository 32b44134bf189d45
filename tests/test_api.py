"""API-layer tests: the reference-mirroring two-step workflow surface.

SURVEY.md §1 L1/L4: ``Video_Processor.process -> crops``,
``Resnet50_Extractor.extract -> features``, ``API.predict -> series``.
These classes are the drop-in-familiarity layer for reference users;
pin their file contracts and their equivalence to the fused path.
"""

import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from mimamo_tpu import api
from mimamo_tpu.io import decode
from mimamo_tpu.runner import Mimamo

from test_runner import tiny_config


@pytest.fixture(scope="module")
def video(tmp_path_factory):
    path = str(tmp_path_factory.mktemp("vid") / "clip.mp4")
    rng = np.random.default_rng(0)
    frames = rng.uniform(0, 255, (10, 48, 64, 3)).astype(np.uint8)
    decode.write_video(path, frames)
    return path


class TestVideoProcessor:
    def test_process_writes_crops_and_boxes(self, video, tmp_path):
        vp = api.VideoProcessor(save_size=32, config=tiny_config())
        out = vp.process(video, str(tmp_path / "work"))
        crops = np.load(out)
        assert crops.shape == (10, 32, 32, 3) and crops.dtype == np.uint8
        boxes = np.load(out.replace("clip.npy", "clip.boxes.npy"))
        assert boxes.shape == (10, 4)

    def test_process_decode_window_invariance(self, video, tmp_path):
        """VideoProcessor.process streams the decode in bounded windows;
        tiny windows must write byte-identical crops/boxes to a
        one-window pass (trackers threaded across windows)."""
        vp = api.VideoProcessor(save_size=32, config=tiny_config())
        a = vp.process(video, str(tmp_path / "w256"))
        b = vp.process(video, str(tmp_path / "w4"), decode_window=4)
        np.testing.assert_array_equal(np.load(a), np.load(b))
        np.testing.assert_array_equal(
            np.load(a.replace("clip.npy", "clip.boxes.npy")),
            np.load(b.replace("clip.npy", "clip.boxes.npy")))

    def test_process_align_writes_landmarks(self, video, tmp_path):
        vp = api.VideoProcessor(save_size=32, config=tiny_config())
        out = vp.process(video, str(tmp_path / "aligned"), align=True)
        lm = np.load(os.path.join(os.path.dirname(out),
                                  "clip.landmarks.npy"))
        assert lm.ndim == 3 and lm.shape[0] == 10 and lm.shape[-1] == 2
        assert np.load(out).shape == (10, 32, 32, 3)


class TestFeatureExtractor:
    def test_extract_matches_embed_frames(self, video, tmp_path):
        """.feat.npy == the fused path's embed_frames on the same crops
        (whatever tail padding the batching used must not leak)."""
        cfg = tiny_config()
        vp = api.VideoProcessor(save_size=32, config=cfg)
        crops_npy = vp.process(video, str(tmp_path / "w"))
        model = Mimamo(cfg)
        variables = model.init_variables(jax.random.PRNGKey(0))
        fx = api.FeatureExtractor(config=cfg, variables=variables,
                                  batch_size=4)   # forces tail padding
        feat_path = fx.extract(crops_npy)
        assert feat_path.endswith(".feat.npy")
        feats = np.load(feat_path)
        crops = np.load(crops_npy)
        want = np.asarray(jax.jit(model.embed_frames)(
            variables, jnp.asarray(crops)[None]))[0]
        assert feats.shape == want.shape
        # separate jit programs (different fusion choices) diverge by
        # ~1e-4 on O(50) pool5 activations — relative ~2e-6
        np.testing.assert_allclose(feats, want, rtol=1e-5, atol=1e-3)

    def test_extract_stride_uses_global_anchor_plan(self, video,
                                                    tmp_path):
        """appearance_stride > 1: extract must anchor over the WHOLE
        video, not per internal batch — a batch-local plan would hold
        the batch's last anchor at every 64-frame boundary."""
        import dataclasses
        cfg = tiny_config()
        cfg2 = dataclasses.replace(
            cfg, backbone=dataclasses.replace(cfg.backbone,
                                              appearance_stride=2))
        vp = api.VideoProcessor(save_size=32, config=cfg)
        crops_npy = vp.process(video, str(tmp_path / "ws"))
        model = Mimamo(cfg2)
        variables = model.init_variables(jax.random.PRNGKey(0))
        # batch=4 anchors -> multiple batches over 10 frames' 5 anchors
        fx = api.FeatureExtractor(config=cfg2, variables=variables,
                                  batch_size=4)
        feats = np.load(fx.extract(crops_npy))
        crops = np.load(crops_npy)
        want = np.asarray(model.embed_frames(
            variables, jnp.asarray(crops)[None]))[0]
        np.testing.assert_allclose(feats, want, rtol=1e-5, atol=1e-3)


class TestMimamoAPI:
    def test_predict_writes_csv_and_matches_runner(self, video,
                                                   tmp_path):
        cfg = tiny_config()
        a = api.MimamoAPI(config=cfg)
        csv = str(tmp_path / "out.csv")
        series = a.predict(video, out_csv=csv)
        assert series.shape == (10, 2)
        with open(csv) as f:
            rows = f.read().strip().splitlines()
        assert rows[0] == "frame,valence,arousal" and len(rows) == 11
        # same decode + boxes through the runner directly == API result
        frames, boxes = decode.load_video_with_boxes(video)
        want = a.model.predict_video(a.variables, frames, boxes)
        np.testing.assert_allclose(series, want, atol=1e-6)

    def test_streaming_decode_window_invariance(self, tmp_path):
        """Bounded-window decode must be invisible: a tiny decode_window
        (box/eye trackers threaded statefully across windows, uneven
        tail) == one-window decode, for box crops and aligned crops."""
        path = str(tmp_path / "long.mp4")
        rng = np.random.default_rng(3)
        decode.write_video(path, rng.uniform(
            0, 255, (20, 48, 64, 3)).astype(np.uint8))
        a = api.MimamoAPI(config=tiny_config())
        for kw in ({}, {"align": True}):
            big = a.predict(path, decode_window=256, **kw)
            small = a.predict(path, decode_window=6, **kw)
            assert big.shape == (20, 2)
            np.testing.assert_allclose(small, big, atol=1e-6)
        # Dense (Procrustes) sidecar: the GPA template must come from
        # the WHOLE landmark set, not be re-fit per decode window —
        # a per-window fit gives every window a different template
        # (round-3 review finding).
        ang = np.linspace(0, 2 * np.pi, 68, endpoint=False)
        base = np.stack([24 + 14 * np.sin(ang), 32 + 18 * np.cos(ang)],
                        axis=-1)
        lm = np.stack([base + [0.2 * i, 0.3 * i] for i in range(20)])
        np.save(path + ".landmarks.npy", lm.astype(np.float32))
        try:
            big = a.predict(path, align=True, decode_window=256)
            small = a.predict(path, align=True, decode_window=6)
            np.testing.assert_allclose(small, big, atol=1e-6)
        finally:
            os.remove(path + ".landmarks.npy")

    def test_predict_emotions_columns(self, video, tmp_path):
        """emotions=True: FER+ probabilities per frame, CSV columns in
        the FERPLUS_CLASSES order, rows normalized."""
        a = api.MimamoAPI(config=tiny_config())
        csv = str(tmp_path / "emo.csv")
        series, probs = a.predict(video, out_csv=csv, emotions=True)
        assert series.shape == (10, 2) and probs.shape == (10, 8)
        np.testing.assert_allclose(probs.sum(-1), 1.0, atol=1e-5)
        header = open(csv).readline().strip()
        assert header.startswith(
            "frame,valence,arousal,neutral,happiness,surprise")

    def test_even_smooth_rejected_before_decode(self, tmp_path):
        a = api.MimamoAPI(config=tiny_config())
        with pytest.raises(ValueError, match="odd"):
            # nonexistent video: the smooth check must fire first
            a.predict(str(tmp_path / "nope.mp4"), smooth=2)

    def test_smoothing_changes_series(self, video):
        a = api.MimamoAPI(config=tiny_config())
        raw = a.predict(video)
        sm = a.predict(video, smooth=5)
        assert raw.shape == sm.shape
        # smoothing reduces total variation
        tv = lambda s: np.abs(np.diff(s, axis=0)).sum()
        assert tv(sm) <= tv(raw) + 1e-6


class TestStreamingPredict:
    """Long-video bound on the predict path (VERDICT round-4 weak item
    3): past ``streaming_threshold`` frames, predict routes through the
    GRU carry-streaming machinery instead of accumulating the full crop
    buffer."""

    @pytest.fixture(scope="class")
    def videos(self, tmp_path_factory):
        d = tmp_path_factory.mktemp("long")
        paths = {}
        rng = np.random.default_rng(5)
        for t in (16, 32):
            p = str(d / f"v{t}.mp4")
            decode.write_video(p, rng.uniform(
                0, 255, (t, 48, 64, 3)).astype(np.uint8))
            paths[t] = p
        return paths

    def test_streaming_engages_and_matches_long_clip_forward(
            self, videos, monkeypatch):
        """Past the threshold the windowed merge must NOT run, and the
        streamed series must equal ONE long-clip forward over the same
        crops (the documented carry-streaming semantics)."""
        a = api.MimamoAPI(config=tiny_config())
        crops, _b, _l = api._windowed_crop_pipeline(
            a.model, videos[16], decode_window=4)
        want = np.asarray(a.model.predict_clips(
            a.variables, jnp.asarray(crops)[None]))[0]

        def _no_windowed(*_a, **_k):  # pragma: no cover - failure path
            raise AssertionError("windowed predict_from_crops ran — "
                                 "streaming did not engage")

        monkeypatch.setattr(type(a.model), "predict_from_crops",
                            _no_windowed)
        got = a.predict(videos[16], decode_window=4,
                        streaming_threshold=4)
        assert a.last_peak_crop_frames == 8   # 2 windows at switch-over
        np.testing.assert_allclose(got, want, atol=1e-4)

    def test_crop_residency_independent_of_video_length(self, videos,
                                                        monkeypatch):
        """REAL buffer-lifetime measurement: weak-ref every crop chunk
        the pipeline yields and record how many are simultaneously
        alive. Streaming keeps the peak CONSTANT as T doubles; the
        accumulate path grows linearly (the old behavior, still used
        under the threshold)."""
        import weakref
        import mimamo_tpu.api as api_mod
        real = api_mod._iter_crop_chunks

        def instrument(stats):
            def wrapper(*args, **kw):
                refs = []
                for crops, b, lm in real(*args, **kw):
                    refs.append(weakref.ref(crops))
                    alive = sum(r() is not None for r in refs)
                    stats["peak"] = max(stats.get("peak", 0), alive)
                    yield crops, b, lm
            return wrapper

        a = api.MimamoAPI(config=tiny_config())
        peaks = {}
        for t in (16, 32):
            stats = {}
            monkeypatch.setattr(api_mod, "_iter_crop_chunks",
                                instrument(stats))
            a.predict(videos[t], decode_window=4, streaming_threshold=4)
            peaks[t] = stats["peak"]
        assert peaks[16] == peaks[32], (
            f"streamed crop residency grew with T: {peaks}")
        # control: accumulation (threshold=None) grows with T
        stats = {}
        monkeypatch.setattr(api_mod, "_iter_crop_chunks",
                            instrument(stats))
        a.predict(videos[32], decode_window=4, streaming_threshold=None)
        assert stats["peak"] >= 8              # all 32/4 chunks alive
        assert stats["peak"] > peaks[32]
        assert a.last_peak_crop_frames == 32

    def test_short_video_path_unchanged(self, videos):
        """Under the threshold the series is byte-identical to the
        accumulate path (the default behavior is untouched)."""
        a = api.MimamoAPI(config=tiny_config())
        base = a.predict(videos[16], streaming_threshold=None)
        dflt = a.predict(videos[16])            # 16 << 4096 default
        np.testing.assert_array_equal(base, dflt)
        assert a.last_peak_crop_frames == 16

    def test_streaming_emotions_and_csv(self, videos, tmp_path):
        """emotions + CSV write work through the streamed path; probs
        match the classifier on the same crops."""
        a = api.MimamoAPI(config=tiny_config())
        csv = str(tmp_path / "s.csv")
        series, probs = a.predict(videos[16], out_csv=csv,
                                  decode_window=4, streaming_threshold=4,
                                  emotions=True)
        assert series.shape == (16, 2) and probs.shape == (16, 8)
        np.testing.assert_allclose(probs.sum(-1), 1.0, atol=1e-5)
        assert len(open(csv).readlines()) == 17


class TestPredictCrops:
    """Round 5: predict from PRECOMPUTED aligned crops — the missing
    CLI/API leg of the reference's two-step workflow (extract crops ->
    predict). SURVEY.md §3.2."""

    @pytest.fixture(scope="class")
    def crops_npy(self, tmp_path_factory):
        d = tmp_path_factory.mktemp("crops")
        rng = np.random.default_rng(7)
        crops = rng.uniform(0, 255, (12, 32, 32, 3)).astype(np.uint8)
        path = str(d / "clip.npy")
        np.save(path, crops)
        return path, crops

    def test_matches_predict_from_crops(self, crops_npy):
        path, crops = crops_npy
        a = api.MimamoAPI(config=tiny_config())
        got = a.predict_crops(path)
        want = np.asarray(a.model.predict_from_crops(a.variables,
                                                     crops))
        np.testing.assert_allclose(got, want, atol=1e-5)
        assert a.last_peak_crop_frames == 12

    def test_streams_past_threshold(self, crops_npy, monkeypatch):
        """Past the threshold the windowed merge must NOT run and the
        chunked series must equal ONE long-clip forward (same contract
        as the video path)."""
        path, crops = crops_npy
        a = api.MimamoAPI(config=tiny_config())
        want = np.asarray(a.model.predict_clips(
            a.variables, jnp.asarray(crops)[None]))[0]

        def _no_windowed(*_a, **_k):  # pragma: no cover - failure path
            raise AssertionError("windowed predict_from_crops ran")

        monkeypatch.setattr(type(a.model), "predict_from_crops",
                            _no_windowed)
        got = a.predict_crops(path, streaming_threshold=4, chunk=4)
        np.testing.assert_allclose(got, want, atol=1e-4)

    def test_image_dir_matches_packed_npy(self, crops_npy, tmp_path):
        """The OpenFace cropped_aligned-style image dir is the same
        input as the packed npy (CropSource contract)."""
        import cv2
        path, crops = crops_npy
        d = str(tmp_path / "dir")
        os.makedirs(d)
        for i, f in enumerate(crops):
            cv2.imwrite(os.path.join(d, f"frame_{i}.png"),
                        cv2.cvtColor(f, cv2.COLOR_RGB2BGR))
        a = api.MimamoAPI(config=tiny_config())
        np.testing.assert_array_equal(a.predict_crops(d),
                                      a.predict_crops(path))

    def test_max_frames_and_wrong_size(self, crops_npy, tmp_path):
        path, crops = crops_npy
        a = api.MimamoAPI(config=tiny_config())
        got = a.predict_crops(path, max_frames=9)
        assert got.shape == (9, 2)
        wrong = str(tmp_path / "wrong.npy")
        np.save(wrong, np.zeros((4, 16, 16, 3), np.uint8))
        with pytest.raises(ValueError, match="crops are"):
            a.predict_crops(wrong)   # config expects 32x32

    def test_cli_predict_crops_and_arg_coherence(self, crops_npy,
                                                 tmp_path):
        from mimamo_tpu import cli
        path, crops = crops_npy
        csv = str(tmp_path / "c.csv")
        rc = cli.main([
            "predict", "--crops", path, "--out", csv,
            "--crop-size", "32", "--backbone-size", "32",
            "--pyramid-height", "2", "--orientations", "2",
            "--phase-size", "16", "--clip-len", "8", "--stride", "4",
            "--cpu"])
        assert rc == 0
        assert len(open(csv).readlines()) == 13
        for bad in (["predict", "--crops", path, "--video", "x.mp4"],
                    ["predict", "--crops", path, "--align"],
                    ["predict"]):
            with pytest.raises(SystemExit):
                cli.main(bad + ["--cpu"])


class TestExtractCLI:
    def test_cli_extract_two_step_files(self, video, tmp_path):
        from mimamo_tpu import cli
        out_dir = str(tmp_path / "ext")
        rc = cli.main([
            "extract", "--video", video, "--out-dir", out_dir,
            "--crop-size", "32", "--backbone-size", "32",
            "--pyramid-height", "2", "--orientations", "2",
            "--phase-size", "16", "--clip-len", "8", "--stride", "4",
            "--cpu"])
        assert rc == 0
        assert np.load(os.path.join(out_dir, "clip.npy")).shape == \
            (10, 32, 32, 3)
        feats = np.load(os.path.join(out_dir, "clip.feat.npy"))
        assert feats.shape[0] == 10 and feats.ndim == 2
