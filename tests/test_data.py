"""Data layer + eval harness + CLI tests on synthetic fixtures."""

import json
import os

import numpy as np
import jax
import pytest

from mimamo_tpu.data import datasets, eval as eval_mod
from mimamo_tpu.runner import Mimamo

from test_runner import tiny_config


class TestOMG:
    @pytest.fixture(scope="class")
    def omg(self, tmp_path_factory):
        root = str(tmp_path_factory.mktemp("omg"))
        manifest = datasets.make_synthetic_omg(root, n_videos=2, n_utts=2,
                                               frames=20, size=32)
        cfg = tiny_config(clip_len=8, stride=4)
        return datasets.OMGEmotionDataset(root, manifest, cfg.clip), cfg

    def test_windows_and_batches(self, omg):
        ds, cfg = omg
        # 4 utterances x starts [0, 4, 8, 12] = 16 clips
        assert len(ds) == 16
        batches = list(ds.batches(4))
        assert len(batches) == 4
        b = batches[0]
        assert b["clips"].shape == (4, 8, 32, 32, 3)
        assert b["labels"].shape == (4, 8, 2)
        assert b["mask"].shape == (4, 8)
        # utterance-level labels broadcast over time
        assert (b["labels"][0] == b["labels"][0][0]).all()

    def test_cached_feature_sidecars(self, tmp_path):
        """.feat.npy sidecars (FeatureExtractor output naming) surface
        as a window-aligned 'features' batch key."""
        root = str(tmp_path / "omgf")
        manifest = datasets.make_synthetic_omg(root, n_videos=1,
                                               n_utts=2, frames=12,
                                               size=32)
        f = 8
        for u in range(2):
            base = os.path.join(root, "video0", f"utt{u}")
            # row t encodes (utt, t) so window alignment is checkable
            feats = np.stack([np.full(f, 100 * u + t, np.float32)
                              for t in range(12)])
            np.save(base + ".feat.npy", feats)
        cfg = tiny_config(clip_len=8, stride=4)
        ds = datasets.OMGEmotionDataset(root, manifest, cfg.clip)
        batches = list(ds.batches(2))
        for b in batches:
            assert b["features"].shape == (2, 8, f)
        # unshuffled order: clip j of utt u starts at 4*(j % 2)
        first = batches[0]["features"]
        np.testing.assert_allclose(first[0, :, 0], np.arange(8))
        np.testing.assert_allclose(first[1, :, 0], 4 + np.arange(8))

    def test_partial_sidecars_are_ignored(self, tmp_path):
        """features key appears only when EVERY sequence has a sidecar
        (a half-cached corpus must not silently mix random backbones)."""
        root = str(tmp_path / "omgp")
        manifest = datasets.make_synthetic_omg(root, n_videos=1,
                                               n_utts=2, frames=12,
                                               size=32)
        np.save(os.path.join(root, "video0", "utt0.feat.npy"),
                np.zeros((12, 8), np.float32))
        cfg = tiny_config(clip_len=8, stride=4)
        ds = datasets.OMGEmotionDataset(root, manifest, cfg.clip)
        assert "features" not in next(ds.batches(2))

    def test_process_sharded_batches_disjoint(self, omg):
        """Per-host input pipeline: the same shuffled index is split
        into disjoint slices whose union covers every clip."""
        ds, _ = omg

        def keys(pid, n):
            out = []
            for b in ds.batches(2, shuffle=True, seed=3,
                                process_id=pid, process_count=n):
                out.extend(map(tuple, np.asarray(
                    b["labels"][:, 0]).round(4)))
            return out

        a, b = keys(0, 2), keys(1, 2)
        total = keys(0, 1)
        assert len(a) + len(b) == len(total) == 16
        assert sorted(a + b) == sorted(total)

    def test_process_sharded_batches_uniform_counts(self, omg):
        """Hosts must yield IDENTICAL batch-count and batch-size
        sequences even when the clip count doesn't divide the host
        count — a host with one extra clip would enter a collective
        the others never join (round-4 review finding). At most
        process_count-1 clips are dropped per epoch."""
        ds, _ = omg   # 16 clips, 3 hosts -> 5 each, 1 dropped
        shapes, seen = [], []
        for pid in range(3):
            sizes = []
            for b in ds.batches(2, shuffle=True, seed=5,
                                process_id=pid, process_count=3):
                sizes.append(len(b["clips"]))
                seen.extend(map(tuple, np.asarray(
                    b["labels"][:, 0]).round(4)))
            shapes.append(sizes)
        assert shapes[0] == shapes[1] == shapes[2] == [2, 2, 1]
        assert len(seen) == 15   # one clip dropped for uniformity

    def test_stratified_batches_span_sources(self, omg):
        """Utterance-level protocol: stratify=True must never emit a
        batch whose clips all come from one source (zero label variance
        makes the batch-CCC loss degenerate) when more sources exist,
        and must still cover every clip exactly once."""
        ds, _ = omg
        # 4 utterances x 4 windows; per-utterance labels are constant,
        # so a batch's label set identifies its sources.
        for seed in range(5):
            seen = []
            for b in ds.batches(2, shuffle=True, seed=seed,
                                stratify=True):
                labels = np.asarray(b["labels"][:, 0])
                assert not np.allclose(labels[0], labels[1]), (
                    f"seed {seed}: single-source batch {labels}")
                seen.extend(map(tuple, labels.round(4)))
            assert len(seen) == 16 and len(set(seen)) == 4
        # determinism
        a = [np.asarray(b["labels"]).sum() for b in
             ds.batches(2, shuffle=True, seed=1, stratify=True)]
        b = [np.asarray(b["labels"]).sum() for b in
             ds.batches(2, shuffle=True, seed=1, stratify=True)]
        assert a == b

    def test_stratified_survives_process_split(self, omg):
        """Stratification must apply AFTER the per-process slice: a
        strided slice of a round-robin order is periodic and would give
        each host one source when gcd(sources, hosts) > 1."""
        ds, _ = omg   # 4 sources x 4 windows, 2 hosts -> gcd 2
        for pid in (0, 1):
            for b in ds.batches(2, shuffle=True, seed=2, stratify=True,
                                process_id=pid, process_count=2):
                labels = np.asarray(b["labels"][:, 0])
                if len(labels) == 2:
                    assert not np.allclose(labels[0], labels[1]), (
                        f"host {pid} got a single-source batch")

    def test_features_flag_skips_sidecars(self, tmp_path):
        root = str(tmp_path / "omgf")
        manifest = datasets.make_synthetic_omg(root, n_videos=1,
                                               n_utts=2, frames=12,
                                               size=32)
        for u in range(2):
            np.save(os.path.join(root, "video0", f"utt{u}.feat.npy"),
                    np.zeros((12, 8), np.float32))
        cfg = tiny_config(clip_len=8, stride=4)
        ds = datasets.OMGEmotionDataset(root, manifest, cfg.clip)
        assert "features" in next(ds.batches(2))
        assert "features" not in next(ds.batches(2, features=False))

    def test_shuffle_deterministic(self, omg):
        ds, _ = omg
        a = [b["labels"][0, 0, 0] for b in ds.batches(4, shuffle=True,
                                                      seed=7)]
        b = [b["labels"][0, 0, 0] for b in ds.batches(4, shuffle=True,
                                                      seed=7)]
        assert a == b

    def test_utterance_eval(self, omg):
        ds, cfg = omg
        model = Mimamo(cfg)
        variables = model.init_variables(jax.random.PRNGKey(0))
        out = eval_mod.evaluate_omg(model, variables, ds, chunk=8)
        assert out["n_utterances"] == 4
        assert -1.0 <= out["valence_ccc"] <= 1.0
        assert -1.0 <= out["arousal_ccc"] <= 1.0


class TestAffWild2:
    @pytest.fixture(scope="class")
    def aw(self, tmp_path_factory):
        root = str(tmp_path_factory.mktemp("affwild2"))
        datasets.make_synthetic_affwild2(root, n_videos=2, frames=24,
                                         size=32)
        cfg = tiny_config(clip_len=8, stride=8)
        return datasets.AffWild2Dataset(root, clip=cfg.clip), cfg

    def test_frame_labels_and_mask(self, aw):
        ds, _ = aw
        assert len(ds) == 6  # 2 videos x starts [0, 8, 16]
        b = next(ds.batches(6))
        # invalid frames (-5) are masked and zeroed
        assert ((b["labels"] >= -1.0) & (b["labels"] <= 1.0)).all()
        assert set(np.unique(b["mask"])) <= {0.0, 1.0}

    def test_length_mismatch_rejected(self, aw, tmp_path):
        root = str(tmp_path / "bad")
        datasets.make_synthetic_affwild2(root, n_videos=1, frames=10,
                                         size=32)
        ann = os.path.join(root, "annotations", "vid0.txt")
        with open(ann) as f:
            lines = f.read().splitlines()
        with open(ann, "w") as f:
            f.write("\n".join(lines[:-2]))
        with pytest.raises(ValueError, match="annotation rows"):
            # crop_size must match the synthetic 32-px crops: the
            # size check fails fast at construction (by design) and
            # would otherwise mask the annotation-length error under
            # the default 112 config
            datasets.AffWild2Dataset(
                root, clip=tiny_config().clip)

    def test_frame_eval(self, aw):
        ds, cfg = aw
        model = Mimamo(cfg)
        variables = model.init_variables(jax.random.PRNGKey(0))
        out = eval_mod.evaluate_affwild2(model, variables, ds, chunk=10)
        assert out["n_frames"] > 0
        assert -1.0 <= out["mean_ccc"] <= 1.0

    def test_tracker_sidecars_not_enumerated(self, tmp_path):
        """cli extract writes <vid>.boxes.npy (always) and
        <vid>.landmarks.npy (aligned runs) next to the crop arrays;
        enumeration must skip them like .feat.npy or construction
        crashes on the phantom video's missing annotation file
        (round-5 review finding)."""
        root = str(tmp_path / "aw")
        datasets.make_synthetic_affwild2(root, n_videos=2, frames=12,
                                         size=32)
        crops = os.path.join(root, "crops")
        np.save(os.path.join(crops, "vid0.boxes.npy"),
                np.zeros((12, 4), np.float32))
        np.save(os.path.join(crops, "vid0.landmarks.npy"),
                np.zeros((12, 2, 2), np.float32))
        ds = datasets.AffWild2Dataset(root,
                                      clip=tiny_config(8, 8).clip)
        assert ds.videos == ["vid0", "vid1"]


class TestEvalGuards:
    def test_single_process_zero_sequences_raises(self):
        """A single-host eval that streamed nothing is a mis-pointed
        root; NaN metrics with rc 0 must not escape (round-5 review
        finding — the zeros fallback exists for the multi-process
        empty-slice case only)."""
        with pytest.raises(ValueError, match="zero sequences"):
            eval_mod._reduce_ccc(np.zeros((0, 2)), np.zeros((0, 2)),
                                 None)

    def test_cli_rejects_slice_flags_without_coordinator(self):
        """--process-id/--num-processes without --coordinator would
        silently eval the FULL dataset single-process while the peers
        hang in jax.distributed.initialize (round-5 review finding)."""
        from mimamo_tpu import cli
        for extra in (["--process-id", "1"], ["--num-processes", "2"]):
            with pytest.raises(SystemExit, match="--coordinator"):
                cli.main(["eval", "--dataset", "omg", "--root", "/nope",
                          "--manifest", "/nope.csv", "--cpu"] + extra)


class TestBatchedEval:
    def test_batched_equals_sequential_and_fewer_dispatches(
            self, tmp_path):
        """Eval routed through the batch-of-streams session produces the
        same CCC as per-sequence streaming with far fewer device
        dispatches (VERDICT round 1 'eval harness runs batch=1')."""
        root = str(tmp_path / "omg8")
        manifest = datasets.make_synthetic_omg(root, n_videos=2, n_utts=4,
                                               frames=20, size=32)
        cfg = tiny_config(clip_len=8, stride=4)
        ds = datasets.OMGEmotionDataset(root, manifest, cfg.clip)
        model = Mimamo(cfg)
        variables = model.init_variables(jax.random.PRNGKey(0))

        calls = {"n": 0}
        for name in ("_predict_stream", "_predict_clips_with_carries"):
            orig = getattr(model, name)

            def counting(*a, _orig=orig, **k):
                calls["n"] += 1
                return _orig(*a, **k)

            setattr(model, name, counting)

        out_b = eval_mod.evaluate_omg(model, variables, ds, chunk=8,
                                      batch_streams=8)
        batched_calls = calls["n"]

        calls["n"] = 0
        preds, golds = [], []
        for _i, crops, label in ds.utterances():
            series = eval_mod._predict_sequence(model, variables, crops,
                                                chunk=8)
            preds.append(series.mean(axis=0))
            golds.append(label)
        seq_calls = calls["n"]
        ccc = eval_mod.ccc_np(np.stack(preds), np.stack(golds))

        np.testing.assert_allclose(out_b["valence_ccc"], ccc[0],
                                   atol=1e-4)
        np.testing.assert_allclose(out_b["arousal_ccc"], ccc[1],
                                   atol=1e-4)
        assert out_b["n_utterances"] == 8
        assert batched_calls <= seq_calls / 2, (
            f"batched eval should batch dispatches: {batched_calls} vs "
            f"sequential {seq_calls}")

    def test_unequal_lengths_slot_reuse(self, tmp_path):
        """Sequences of different lengths: freed slots are refilled and
        every sequence gets full-length predictions."""
        cfg = tiny_config(clip_len=4, stride=4)
        model = Mimamo(cfg)
        variables = model.init_variables(jax.random.PRNGKey(1))
        rng = np.random.default_rng(3)
        seqs = [("a", rng.uniform(0, 255, (5, 32, 32, 3))),
                ("b", rng.uniform(0, 255, (13, 32, 32, 3))),
                ("c", rng.uniform(0, 255, (4, 32, 32, 3))),
                ("d", rng.uniform(0, 255, (9, 32, 32, 3)))]
        got = dict(eval_mod.stream_predict_many(
            model, variables, seqs, chunk=4, batch_streams=2))
        assert set(got) == {"a", "b", "c", "d"}
        for key, crops in seqs:
            assert got[key].shape == (crops.shape[0], 2)
            # parity vs the per-sequence reference path
            want = eval_mod._predict_sequence(
                model, variables, crops.astype(np.float32), chunk=4)
            np.testing.assert_allclose(got[key], want, atol=1e-4)


    def test_mesh_sharded_eval_matches_single(self, tmp_path):
        """evaluate_omg over a 4-device mesh (slot axis sharded) ==
        single-device eval — the CLI's `eval --data-parallel` path."""
        import jax
        from mimamo_tpu import parallel
        root = str(tmp_path / "omgm")
        manifest = datasets.make_synthetic_omg(root, n_videos=2,
                                               n_utts=2, frames=14,
                                               size=32)
        cfg = tiny_config(clip_len=4, stride=4)
        ds = datasets.OMGEmotionDataset(root, manifest, cfg.clip)
        model = Mimamo(cfg)
        variables = model.init_variables(jax.random.PRNGKey(2))
        single = eval_mod.evaluate_omg(model, variables, ds, chunk=4,
                                       batch_streams=4)
        mesh = parallel.make_mesh(jax.devices()[:4])
        sharded = eval_mod.evaluate_omg(model, variables, ds, chunk=4,
                                        batch_streams=4, mesh=mesh)
        assert sharded["n_utterances"] == single["n_utterances"] == 4
        for k in ("valence_ccc", "arousal_ccc"):
            np.testing.assert_allclose(sharded[k], single[k], atol=1e-4)

    def test_chunk_readable_sources_bounded_reads(self):
        """stream_predict_many pulls chunk-readable sources one chunk
        per feed (host memory O(streams x chunk), VERDICT round 2 weak
        item 2) and matches in-memory-array inputs exactly."""
        cfg = tiny_config(clip_len=4, stride=4)
        model = Mimamo(cfg)
        variables = model.init_variables(jax.random.PRNGKey(1))
        rng = np.random.default_rng(4)

        class Recorder:
            def __init__(self, arr):
                self.arr, self.max_read = arr, 0

            def __len__(self):
                return len(self.arr)

            def read(self, start, count):
                self.max_read = max(self.max_read, count)
                return self.arr[start:start + count]

        arrays, recs = {}, {}
        for i, t in enumerate([11, 4, 9]):
            arrays[i] = rng.uniform(0, 255, (t, 32, 32, 3)).astype(
                np.float32)
            recs[i] = Recorder(arrays[i])
        got = dict(eval_mod.stream_predict_many(
            model, variables, list(recs.items()), chunk=4,
            batch_streams=2))
        want = dict(eval_mod.stream_predict_many(
            model, variables, list(arrays.items()), chunk=4,
            batch_streams=2))
        for k in arrays:
            np.testing.assert_allclose(got[k], want[k], atol=1e-6)
        assert max(r.max_read for r in recs.values()) <= 4


class TestImageDirLayout:
    """Reference-style per-frame image directories as crop sources."""

    def _write_image_dir(self, path, frames):
        import cv2
        os.makedirs(path)
        for i, f in enumerate(frames):
            cv2.imwrite(os.path.join(path, f"frame_{i:04d}.png"),
                        cv2.cvtColor(f, cv2.COLOR_RGB2BGR))

    def test_omg_image_dir_equals_npy(self, tmp_path):
        rng = np.random.default_rng(7)
        frames = rng.uniform(0, 255, (12, 32, 32, 3)).astype(np.uint8)
        root = str(tmp_path / "omg")
        os.makedirs(os.path.join(root, "video0"))
        np.save(os.path.join(root, "video0", "uttA.npy"), frames)
        self._write_image_dir(os.path.join(root, "video0", "uttB"),
                              frames)
        with open(os.path.join(root, "manifest.csv"), "w") as f:
            f.write("video,utterance,valence,arousal\n"
                    "video0,uttA,0.5,0.1\nvideo0,uttB,0.5,0.1\n")
        cfg = tiny_config(clip_len=8, stride=4)
        ds = datasets.OMGEmotionDataset(root, os.path.join(
            root, "manifest.csv"), cfg.clip)
        batches = list(ds.batches(4))
        clips = np.concatenate([b["clips"] for b in batches])
        # PNG round-trip is lossless: both sources yield identical clips
        half = len(clips) // 2
        np.testing.assert_array_equal(clips[:half], clips[half:])

    def test_unpadded_frame_numbers_sort_numerically(self, tmp_path):
        """frame_2.png must precede frame_10.png: lexicographic order
        would silently interleave temporally wrong frames (round-4
        review finding; decode.frame_sort_key is the one definition)."""
        import cv2
        path = str(tmp_path / "dir")
        os.makedirs(path)
        frames = np.stack([np.full((16, 16, 3), i, np.uint8)
                           for i in range(12)])
        for i, f in enumerate(frames):     # frame_0.png .. frame_11.png
            cv2.imwrite(os.path.join(path, f"frame_{i}.png"),
                        cv2.cvtColor(f, cv2.COLOR_RGB2BGR))
        src = datasets.CropSource(path, crop_size=16)
        got = src.read(0, 12)
        np.testing.assert_array_equal(got, frames)
        from mimamo_tpu.io import decode
        np.testing.assert_array_equal(decode.load_image_dir(path),
                                      frames)

    def test_affwild2_cropped_aligned_layout(self, tmp_path):
        rng = np.random.default_rng(8)
        frames = rng.uniform(0, 255, (10, 32, 32, 3)).astype(np.uint8)
        root = str(tmp_path / "aw")
        self._write_image_dir(
            os.path.join(root, "cropped_aligned", "vidX"), frames)
        os.makedirs(os.path.join(root, "annotations"))
        with open(os.path.join(root, "annotations", "vidX.txt"),
                  "w") as f:
            f.write("valence,arousal\n" +
                    "\n".join("0.1,0.2" for _ in range(10)))
        cfg = tiny_config(clip_len=8, stride=8)
        ds = datasets.AffWild2Dataset(root, clip=cfg.clip)
        assert ds.videos == ["vidX"]
        b = next(ds.batches(1))
        assert b["clips"].shape == (1, 8, 32, 32, 3)
        name, crops, labels, mask = next(ds.full_videos())
        np.testing.assert_array_equal(crops, frames)

    def test_missing_crops_raise(self, tmp_path):
        with np.testing.assert_raises(FileNotFoundError):
            datasets.CropSource(str(tmp_path / "nope.npy"))

    def test_rewritten_source_fails_fast(self, tmp_path):
        """A packed .npy rewritten SHORTER after dataset construction
        must raise on read, not silently return fewer rows (round-5
        review finding: the mtime-keyed mmap LRU re-resolves the file,
        but clip windows were built from the old length)."""
        path = str(tmp_path / "crops.npy")
        np.save(path, np.zeros((12, 16, 16, 3), np.uint8))
        src = datasets.CropSource(path, crop_size=16)
        assert len(src) == 12
        np.save(path, np.zeros((4, 16, 16, 3), np.uint8))
        # force a distinct mtime even on coarse-resolution filesystems
        st = os.stat(path)
        os.utime(path, ns=(st.st_atime_ns, st.st_mtime_ns + 1))
        with pytest.raises(RuntimeError, match="changed length"):
            src.read(0, 8)


class TestSmoothing:
    def test_moving_average_properties(self):
        from mimamo_tpu.api import smooth_series
        rng = np.random.default_rng(0)
        s = rng.standard_normal((20, 2))
        out = smooth_series(s, 5)
        assert out.shape == s.shape
        np.testing.assert_allclose(out[10], s[8:13].mean(0))  # interior
        np.testing.assert_allclose(smooth_series(np.ones((8, 2)), 3),
                                   1.0)                       # constant
        np.testing.assert_array_equal(smooth_series(s, 1), s)  # off
        with pytest.raises(ValueError, match="odd"):
            smooth_series(s, 4)


class TestCCCNp:
    def test_matches_jax_ccc(self):
        from mimamo_tpu import losses
        import jax.numpy as jnp
        rng = np.random.default_rng(0)
        p = rng.standard_normal((100, 2))
        y = rng.standard_normal((100, 2))
        np.testing.assert_allclose(
            eval_mod.ccc_np(p, y),
            np.asarray(losses.ccc(jnp.asarray(p), jnp.asarray(y))),
            atol=1e-5)


class TestDistributedCCC:
    """Moment-sum reduction for pod-slice eval (round-5): sums from
    disjoint row slices must recombine into the exact global CCC."""

    def test_moment_sums_partition_exact(self):
        rng = np.random.default_rng(3)
        p = rng.standard_normal((37, 2))
        y = 0.6 * p + 0.4 * rng.standard_normal((37, 2))
        whole = eval_mod.ccc_np(p, y)
        sums = (eval_mod.ccc_moment_sums(p[:20], y[:20])
                + eval_mod.ccc_moment_sums(p[20:], y[20:]))
        np.testing.assert_allclose(eval_mod.ccc_from_moment_sums(sums),
                                   whole, atol=1e-9)

    def test_empty_slice_is_identity(self):
        rng = np.random.default_rng(4)
        p = rng.standard_normal((11, 2))
        y = rng.standard_normal((11, 2))
        sums = (eval_mod.ccc_moment_sums(p, y)
                + eval_mod.ccc_moment_sums(np.zeros((0, 2)),
                                           np.zeros((0, 2))))
        np.testing.assert_allclose(eval_mod.ccc_from_moment_sums(sums),
                                   eval_mod.ccc_np(p, y), atol=1e-9)

    def test_process_slice_disjoint_union(self):
        items = [(i, f"src{i}") for i in range(7)]
        a = list(eval_mod._process_slice(iter(items), 0, 2))
        b = list(eval_mod._process_slice(iter(items), 1, 2))
        assert not set(a) & set(b)
        assert sorted(a + b) == items
        # single process: identity passthrough
        assert list(eval_mod._process_slice(iter(items), 0, 1)) == items
        assert list(eval_mod._process_slice(iter(items), None,
                                            None)) == items

    def test_process_slice_rejects_missing_process_id(self):
        """process_count > 1 with process_id=None must raise, not
        silently stream nothing (round-5 review finding: `j % n ==
        None` is False for every item -> plausible-looking ccc=0)."""
        items = [(i, f"src{i}") for i in range(3)]
        with pytest.raises(ValueError, match="process_id"):
            list(eval_mod._process_slice(iter(items), None, 4))
        with pytest.raises(ValueError, match="process_id"):
            list(eval_mod._process_slice(iter(items), 4, 4))

    def test_host_allgather_f64_single_process(self):
        from mimamo_tpu import parallel
        # values whose f32 rounding loses bits — full f64 fidelity must
        # survive (the uint32 bit-view gather contract; 1 + 2^-52 needs
        # all 52 mantissa bits, beyond any (hi, lo) f32 split)
        x = np.array([1.0 + 1e-12, -3.7e8 + 0.125, 1.0 + 2.0 ** -52])
        g = parallel.host_allgather_f64(x)
        assert g.shape == (1, 3)
        np.testing.assert_array_equal(g[0], x)

    def test_evaluate_sliced_sums_match_full(self, tmp_path):
        """Simulated 2-process eval IN one process: run evaluate_affwild2
        once per process id (the allgather is a no-op single-process,
        yielding LOCAL moment metrics), recombine the slices' raw
        moment sums, and match the full single-process eval. Proves the
        slicing + sums plumbing without a coordinator (the REAL
        2-process CLI run lives in test_multiprocess.py)."""
        import jax
        from mimamo_tpu import train
        from mimamo_tpu.runner import Mimamo
        from test_runner import tiny_config
        root = str(tmp_path / "aw2")
        datasets.make_synthetic_affwild2(root, n_videos=3, frames=9,
                                         size=32, seed=5)
        cfg = tiny_config(clip_len=4, stride=2)
        ds = datasets.AffWild2Dataset(root, clip=cfg.clip)
        model = Mimamo(cfg)
        state, _ = train.create_train_state(model, jax.random.PRNGKey(1))
        variables = train.variables_from_state(state)
        full = eval_mod.evaluate_affwild2(model, variables, ds, chunk=4,
                                          batch_streams=2)
        sums = np.zeros((6, 2))
        for pid in range(2):
            meta = {}

            def items():
                for vid, src, labels, mask in eval_mod._process_slice(
                        ds.video_sources(), pid, 2):
                    meta[vid] = (labels, mask)
                    yield vid, src

            preds, golds = [], []
            for vid, series in eval_mod.stream_predict_many(
                    model, variables, items(), chunk=4, batch_streams=2):
                labels, mask = meta[vid]
                valid = mask > 0
                preds.append(series[valid])
                golds.append(labels[valid])
            sums += eval_mod.ccc_moment_sums(np.concatenate(preds),
                                             np.concatenate(golds))
        ccc = eval_mod.ccc_from_moment_sums(sums)
        assert int(round(sums[0, 0])) == full["n_frames"]
        np.testing.assert_allclose(ccc[0], full["valence_ccc"], atol=1e-6)
        np.testing.assert_allclose(ccc[1], full["arousal_ccc"], atol=1e-6)


class TestCLI:
    def test_train_then_eval_omg(self, tmp_path):
        """Full CLI loop on a synthetic corpus: train 2 epochs w/ orbax
        checkpointing, then eval from the checkpoint."""
        import subprocess
        import sys
        root = str(tmp_path / "omg")
        os.makedirs(root)
        manifest = datasets.make_synthetic_omg(root, n_videos=1, n_utts=2,
                                               frames=12, size=32)
        ckpt = str(tmp_path / "ckpt")
        common = ["--clip-len", "8", "--stride", "4", "--crop-size", "32",
                  "--backbone-size", "32", "--pyramid-height", "2",
                  "--phase-size", "16", "--cpu"]
        env = dict(os.environ, JAX_PLATFORMS="cpu",
                   PYTHONPATH="/root/repo",
                   # share the suite's persistent compile cache (the
                   # subprocess doesn't run conftest.py)
                   JAX_COMPILATION_CACHE_DIR=os.environ.get(
                       "MIMAMO_TEST_CACHE",
                       "/tmp/jax_cache_mimamo_tests"),
                   JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS="2",
                   JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES="0")
        r = subprocess.run(
            [sys.executable, "-m", "mimamo_tpu.cli", "train",
             "--dataset", "omg", "--root", root, "--manifest", manifest,
             "--ckpt", ckpt, "--epochs", "2", "--batch", "2"] + common,
            capture_output=True, text=True, env=env, cwd="/root/repo",
            timeout=560)
        assert r.returncode == 0, r.stderr[-2000:]
        rows = [json.loads(ln) for ln in r.stdout.splitlines()
                if ln.startswith("{")]
        assert len(rows) == 2 and "loss" in rows[0]
        assert os.path.exists(ckpt + ".metrics.jsonl")

        r = subprocess.run(
            [sys.executable, "-m", "mimamo_tpu.cli", "eval",
             "--dataset", "omg", "--root", root, "--manifest", manifest,
             "--ckpt", ckpt] + common,
            capture_output=True, text=True, env=env, cwd="/root/repo",
            timeout=560)
        assert r.returncode == 0, r.stderr[-2000:]
        out = json.loads(r.stdout.strip().splitlines()[-1])
        assert out["n_utterances"] == 2

    def test_cosine_resume_uses_persisted_horizon(self, tmp_path):
        """The first cosine run persists its planned horizon next to
        the checkpoint; a resume rebuilds the schedule over that FIXED
        horizon instead of re-spanning (round-2 advisor: per-resume
        re-spanning jumps the lr discontinuously and stretches the
        decay forever); resuming past the horizon extends it."""
        import subprocess
        import sys
        root = str(tmp_path / "omg")
        os.makedirs(root)
        manifest = datasets.make_synthetic_omg(root, n_videos=1,
                                               n_utts=2, frames=12,
                                               size=32)
        ckpt = str(tmp_path / "ck")
        common = ["--clip-len", "8", "--stride", "4", "--crop-size",
                  "32", "--backbone-size", "32", "--pyramid-height",
                  "2", "--phase-size", "16", "--cpu",
                  "--lr-schedule", "cosine"]
        env = dict(os.environ, JAX_PLATFORMS="cpu",
                   PYTHONPATH="/root/repo",
                   JAX_COMPILATION_CACHE_DIR=os.environ.get(
                       "MIMAMO_TEST_CACHE",
                       "/tmp/jax_cache_mimamo_tests"),
                   JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS="2",
                   JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES="0")

        def train(epochs, resume=False):
            cmd = [sys.executable, "-m", "mimamo_tpu.cli", "train",
                   "--dataset", "omg", "--root", root, "--manifest",
                   manifest, "--ckpt", ckpt, "--epochs", str(epochs),
                   "--batch", "2"] + common + (
                       ["--resume"] if resume else [])
            r = subprocess.run(cmd, capture_output=True, text=True,
                               env=env, cwd="/root/repo", timeout=560)
            assert r.returncode == 0, r.stderr[-2000:]
            return r.stderr

        train(epochs=4)   # 4 clips / batch 2 -> 2 steps/epoch, plan 8
        plan = ckpt + ".plan.json"
        with open(plan) as f:
            assert json.load(f)["total_steps"] == 8
        # Simulate a longer original plan that was interrupted at step 8
        # (the persisted horizon is the contract, wherever it came from):
        # a resume below the horizon must rebuild over the SAVED value,
        # not re-span to resumed + planned.
        with open(plan, "w") as f:
            json.dump({"total_steps": 20}, f)
        err = train(epochs=1, resume=True)
        assert "cosine horizon: 20 steps" in err
        with open(plan) as f:
            assert json.load(f)["total_steps"] == 20
        # Past the horizon (plan 6 < resumed 10): extends by this run's
        # planned steps and persists the new horizon.
        with open(plan, "w") as f:
            json.dump({"total_steps": 6}, f)
        err = train(epochs=1, resume=True)
        assert "cosine horizon: 12 steps" in err
        with open(plan) as f:
            assert json.load(f)["total_steps"] == 12
