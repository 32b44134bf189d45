"""Datasets: OMG-Emotion (utterance-level) and Aff-Wild2 (frame-level).

Reference behavior (SURVEY.md §2 "Datasets / samplers"; mount empty): the
reference indexes precomputed ResNet features and aligned-crop directories
produced by its offline extraction step, samples sliding windows of
snippets, and yields (phase frames, resnet features, label) tuples via
``torch.utils.data.Dataset``; OMG labels are per-utterance (one (v, a) per
clip), Aff-Wild2 per-frame with invalid-frame markers.

TPU-first design: a plain-NumPy host pipeline (no worker processes — the
per-clip compute that the reference did in DataLoader workers lives on
device) emitting dict batches ``{"clips", "labels", "mask"}`` ready for
``device_put``; manifests are CSV/npy files so synthetic fixtures can be
generated in tests (real corpora are offline-unreachable).

Layouts:
  OMG manifest CSV: columns ``video,utterance,valence,arousal`` where
    ``<root>/<video>/<utterance>.npy`` holds [T, S, S, 3] uint8 crops.
  Aff-Wild2: ``<root>/crops/<video>.npy`` [T, S, S, 3] uint8 +
    ``<root>/annotations/<video>.txt`` with a ``valence,arousal`` header
    and one "v,a" line per frame (-5 marks invalid frames, masked out).
  Cached appearance features (the reference's actual training input —
    it never runs ResNet online, SURVEY.md §3.2/§3.3): a ``.feat.npy``
    [T, F] file next to each crop source (``api.FeatureExtractor``
    output naming). When EVERY sequence has one, batches carry a
    ``"features"`` key and the train step skips the frozen backbone
    forward entirely.
"""

from __future__ import annotations

import dataclasses
import functools
import os
from typing import Dict, Iterator, List, Optional, Sequence, Tuple

import numpy as np

from ..config import ClipSpec

Batch = Dict[str, np.ndarray]


@functools.lru_cache(maxsize=128)
def _mmap_npy(path: str, _mtime_ns: int, _size: int) -> np.ndarray:
    return np.load(path, mmap_mode="r")


def open_npy_mmap(path: str) -> np.ndarray:
    """Read-only mmap of a ``.npy``, through a BOUNDED process-wide LRU.

    Re-opening per clip read costs a file open + header parse on every
    access of the 1-core host input path (round-4 review finding), but
    an unbounded per-instance cache leaks one fd per source for the
    process lifetime — a corpus with thousands of sources can exhaust
    the fd limit on long-running eval/train processes (round-5 advisor
    finding). The LRU keeps at most 128 mmaps open (evicted ones close
    when their last array view is released) and keys on (mtime, size)
    so a rewritten sidecar is never served stale.
    """
    st = os.stat(path)
    return _mmap_npy(path, st.st_mtime_ns, st.st_size)


@dataclasses.dataclass(frozen=True)
class ClipIndex:
    """One sample: a window of a source sequence."""
    source: int        # index into the dataset's sequence table
    start: int         # first frame of the window


class CropSource:
    """Uniform reader over the two crop storage layouts: a packed
    ``.npy`` array, or the reference's per-frame image directory
    (OpenFace ``cropped_aligned`` style — SURVEY.md §2)."""

    def __init__(self, path: str, crop_size: Optional[int] = None):
        self.path = path
        self.crop_size = crop_size
        from ..io import decode
        self._decode = decode
        if os.path.isdir(path):
            self.kind = "dir"
            # decode.list_frame_images: numeric-aware frame order +
            # the shared reader below (the frame-dir convention lives
            # in ONE place — round-4 review finding)
            self._names = decode.list_frame_images(path)
            self._len = len(self._names)
        elif path.endswith(".npy") and os.path.exists(path):
            self.kind = "npy"
            # mmaps go through the bounded process-wide LRU (module
            # docstring of open_npy_mmap) rather than a per-instance
            # handle held for the dataset lifetime
            arr = open_npy_mmap(path)
            self._len = int(arr.shape[0])
            if (crop_size is not None and arr.ndim >= 3
                    and tuple(arr.shape[1:3]) != (crop_size,) * 2):
                # fail fast like the dir branch / feature sidecars: a
                # wrong-sized packed array would otherwise surface
                # deep inside train/eval as an opaque shape error
                raise ValueError(
                    f"{path}: crops are {tuple(arr.shape[1:3])} "
                    f"but the config expects "
                    f"({crop_size}, {crop_size})")
        else:
            raise FileNotFoundError(
                f"crops not found (tried npy file / image dir): {path}")

    def __len__(self) -> int:
        return self._len

    def read(self, start: int, count: int) -> np.ndarray:
        if self.kind == "npy":
            arr = open_npy_mmap(self.path)
            if int(arr.shape[0]) != self._len:
                # the LRU re-resolves by (mtime, size), so a sidecar
                # rewritten mid-run WOULD be served against the clip
                # windows built from the old length — numpy slicing
                # past the new end silently returns fewer rows and
                # fails deep inside train/eval as an opaque shape
                # error. Fail fast instead (round-5 review finding).
                raise RuntimeError(
                    f"{self.path}: source changed length "
                    f"{self._len} -> {int(arr.shape[0])} after dataset "
                    f"construction; rebuild the dataset")
            return np.asarray(arr[start:start + count])
        return self._decode.read_frame_images(
            self.path, self._names[start:start + count], self.crop_size)

    def read_all(self) -> np.ndarray:
        return self.read(0, self._len)


def _resolve_crops(base_without_ext: str,
                   crop_size: Optional[int]) -> CropSource:
    """Prefer ``<base>.npy``; fall back to the ``<base>/`` image dir."""
    npy = base_without_ext + ".npy"
    if os.path.exists(npy):
        return CropSource(npy, crop_size)
    return CropSource(base_without_ext, crop_size)


def _resolve_features(base_without_ext: str,
                      n_frames: int) -> Optional[str]:
    """``<base>.feat.npy`` cached-feature sidecar, if present.

    Length is validated HERE (a stale/short sidecar must fail at
    dataset construction, not as a mid-epoch crash on some shuffled
    window — or worse, train silently on misaligned features)."""
    path = base_without_ext + ".feat.npy"
    if not os.path.exists(path):
        return None
    rows = int(np.load(path, mmap_mode="r").shape[0])
    if rows != n_frames:
        raise ValueError(
            f"{path}: {rows} feature rows but {n_frames} crop frames — "
            f"stale cache? re-run the feature extraction")
    return path


class _ClipDataset:
    """Shared sliding-window clip sampling over variable-length sequences."""

    def __init__(self, clip: ClipSpec):
        self.clip = clip
        self._index: List[ClipIndex] = []
        # per-source cached-feature file paths (all-or-nothing: batches
        # carry "features" only when every source has a sidecar)
        self._features: List[Optional[str]] = []

    def _build_index(self, lengths: Sequence[int]) -> None:
        c, s = self.clip.clip_len, self.clip.stride
        self._index = []
        for src, t in enumerate(lengths):
            if t < c:
                continue
            starts = list(range(0, t - c + 1, s))
            if starts[-1] != t - c:
                starts.append(t - c)
            self._index.extend(ClipIndex(src, st) for st in starts)

    def __len__(self) -> int:
        return len(self._index)

    # subclasses implement _load(ClipIndex) -> (clips, labels, mask)

    def batches(self, batch_size: int, shuffle: bool = False,
                seed: int = 0, drop_remainder: bool = False,
                process_id: int = 0, process_count: int = 1,
                stratify: bool = False,
                features: bool = True) -> Iterator[Batch]:
        """``process_id``/``process_count`` give each host process a
        disjoint interleaved slice of the (identically shuffled) clip
        index — the per-host input pipeline for multi-host data
        parallelism (SURVEY.md §7 step 7): every process draws
        ``batch_size`` clips for its local devices, and the global batch
        is the concatenation across processes (assemble device arrays
        with ``jax.make_array_from_process_local_data`` on pod slices).

        ``stratify=True`` interleaves clips round-robin across source
        sequences (after shuffling), so consecutive clips — and hence
        batches — span as many distinct sources as possible. This
        matters for the utterance-level protocol (``loss_axis="batch"``,
        OMG): a batch whose clips are windows of ONE utterance has zero
        label variance, making the batch-CCC loss identically 1 and its
        gradient uninformative. The train CLI enables it automatically
        for that protocol.
        """
        order = np.arange(len(self._index))
        if shuffle:
            np.random.default_rng(seed).shuffle(order)
        if process_count > 1:
            if not 0 <= process_id < process_count:
                raise ValueError(f"process_id {process_id} out of range "
                                 f"for {process_count}")
            order = order[process_id::process_count]
            # Uniform per-host length (drop <= process_count-1 clips):
            # hosts with one extra clip would otherwise yield an extra
            # (or differently-sized final) batch, and the documented
            # make_array_from_process_local_data assembly would hang
            # in a collective the other hosts never join (round-4
            # review finding; the CLI's steps_per_epoch floor already
            # assumed this contract).
            order = order[:len(self._index) // process_count]
        if stratify:
            # AFTER the per-process split: a strided slice of a
            # round-robin sequence is periodic and would hand each host
            # a single source whenever gcd(sources, processes) > 1 —
            # re-creating the degeneracy stratification exists to
            # prevent. Each host stratifies its own (random) subset.
            by_src: Dict[int, list] = {}
            for j in order:
                by_src.setdefault(self._index[j].source, []).append(j)
            queues = list(by_src.values())   # shuffled within; insertion
            if shuffle:                      # order of sources shuffled
                np.random.default_rng(seed + 1).shuffle(queues)
            # Greedy most-remaining-first, never repeating the previous
            # source while an alternative exists: plain round-robin
            # clusters the majority source at the tail when per-source
            # counts are uneven (always the case after a per-process
            # split), re-creating single-source batches.
            interleaved: list = []
            prev = -1
            while queues:
                pick = max(
                    (qi for qi in range(len(queues))
                     if qi != prev or len(queues) == 1),
                    key=lambda qi: (len(queues[qi]), -qi))
                interleaved.append(queues[pick].pop(0))
                if queues[pick]:
                    prev = pick
                else:       # source exhausted: no repeat possible
                    queues.pop(pick)
                    prev = -1
            order = np.asarray(interleaved)
        # ``features=False`` skips cached .feat.npy attachment even when
        # every sequence has a sidecar — needed when the appearance
        # stream must run online (e.g. crop augmentation, fine-tuning).
        with_feats = (features and len(self._features) > 0
                      and all(f is not None for f in self._features))
        for i in range(0, len(order), batch_size):
            sel = order[i:i + batch_size]
            if drop_remainder and len(sel) < batch_size:
                return
            clips, labels, masks = zip(*(self._load(self._index[j])
                                         for j in sel))
            batch = {"clips": np.stack(clips).astype(np.float32),
                     "labels": np.stack(labels).astype(np.float32),
                     "mask": np.stack(masks).astype(np.float32)}
            if with_feats:
                batch["features"] = np.stack([
                    self._load_features(self._index[j]) for j in sel
                ]).astype(np.float32)
            yield batch

    def _load_features(self, ci: ClipIndex) -> np.ndarray:
        # bounded process-wide mmap LRU (see open_npy_mmap) — one fd
        # per HOT source, not one per source forever
        arr = open_npy_mmap(self._features[ci.source])
        out = np.asarray(arr[ci.start:ci.start + self.clip.clip_len])
        if len(out) != self.clip.clip_len:
            # same fail-fast as CropSource.read: a feature sidecar
            # rewritten shorter mid-run must not surface as an opaque
            # ragged-batch shape error downstream
            raise RuntimeError(
                f"{self._features[ci.source]}: short read "
                f"({len(out)} < {self.clip.clip_len} rows at "
                f"{ci.start}) — source changed after dataset "
                f"construction; rebuild the dataset")
        return out


class OMGEmotionDataset(_ClipDataset):
    """OMG-Emotion: utterance-level (v, a) regression.

    Each utterance has ONE label; every clip sampled from it carries that
    label broadcast over time (the reference trains the same way and
    evaluates utterance-level — SURVEY.md §3.5).
    """

    def __init__(self, root: str, manifest_csv: str, clip: ClipSpec):
        super().__init__(clip)
        import csv
        self.root = root
        self.rows: List[Tuple[str, str, float, float]] = []
        with open(manifest_csv, newline="") as f:
            for row in csv.DictReader(f):
                self.rows.append((row["video"], row["utterance"],
                                  float(row["valence"]),
                                  float(row["arousal"])))
        self._sources = []
        for video, utt, _v, _a in self.rows:
            base = os.path.join(root, video, utt)
            src = _resolve_crops(base, clip.crop_size)
            self._sources.append(src)
            self._features.append(_resolve_features(base, len(src)))
        self._build_index([len(s) for s in self._sources])

    def _load(self, ci: ClipIndex):
        t = self.clip.clip_len
        clips = self._sources[ci.source].read(ci.start, t)
        _video, _utt, v, a = self.rows[ci.source]
        labels = np.tile(np.asarray([v, a], np.float32), (t, 1))
        return clips, labels, np.ones(t, np.float32)

    def utterances(self) -> Iterator[Tuple[int, np.ndarray, np.ndarray]]:
        """(row index, full crop sequence, (v, a) label) per utterance —
        the evaluation granularity (materialized; prefer
        :meth:`utterance_sources` for memory-bounded eval)."""
        for i, src, label in self.utterance_sources():
            yield i, src.read_all(), label

    def utterance_sources(self) -> Iterator[
            Tuple[int, CropSource, np.ndarray]]:
        """(row index, chunk-readable CropSource, label) per utterance.

        The eval harness reads sources one chunk per feed
        (``eval.stream_predict_many``), keeping host memory
        O(streams x chunk) instead of O(streams x T)."""
        for i, (video, utt, v, a) in enumerate(self.rows):
            yield i, self._sources[i], np.asarray([v, a], np.float32)


class AffWild2Dataset(_ClipDataset):
    """Aff-Wild2: frame-level (v, a) regression with invalid-frame masks."""

    INVALID = -5.0

    def __init__(self, root: str, videos: Optional[Sequence[str]] = None,
                 clip: Optional[ClipSpec] = None):
        super().__init__(clip or ClipSpec())
        self.root = root
        crops_dir = os.path.join(root, "crops")
        if not os.path.isdir(crops_dir):
            # Reference Aff-Wild2 layout uses cropped_aligned/<video>/
            alt = os.path.join(root, "cropped_aligned")
            if os.path.isdir(alt):
                crops_dir = alt
        if videos is None:
            entries = os.listdir(crops_dir)
            # Sidecars live NEXT to the crop arrays and are not videos:
            # .feat.npy appearance features (api.FeatureExtractor),
            # .boxes.npy / .landmarks.npy tracker outputs (cli extract
            # always writes boxes, and landmarks when aligned).
            # Enumerating "vid.feat" crashed on its missing annotation
            # file (caught by the round-5 overfit test); "vid.boxes" /
            # "vid.landmarks" failed the same way.
            sidecars = (".feat.npy", ".boxes.npy", ".landmarks.npy")
            videos = sorted(
                {os.path.splitext(f)[0] for f in entries
                 if f.endswith(".npy")
                 and not f.endswith(sidecars)}
                | {f for f in entries
                   if os.path.isdir(os.path.join(crops_dir, f))})
        self.videos = list(videos)
        self._labels: List[np.ndarray] = []
        self._sources: List[CropSource] = []
        lengths = []
        for vid in self.videos:
            ann = os.path.join(root, "annotations", vid + ".txt")
            labels = _read_affwild2_annotations(ann)
            base = os.path.join(crops_dir, vid)
            src = _resolve_crops(base, self.clip.crop_size)
            if len(labels) != len(src):
                raise ValueError(
                    f"{vid}: {len(src)} crops but {len(labels)} "
                    f"annotation rows")
            self._sources.append(src)
            self._features.append(_resolve_features(base, len(src)))
            self._labels.append(labels)
            lengths.append(len(src))
        self._build_index(lengths)

    def _load(self, ci: ClipIndex):
        t = self.clip.clip_len
        clips = self._sources[ci.source].read(ci.start, t)
        labels = self._labels[ci.source][ci.start:ci.start + t]
        mask = (labels != self.INVALID).all(axis=-1).astype(np.float32)
        return clips, np.where(labels == self.INVALID, 0.0, labels), mask

    def full_videos(self) -> Iterator[
            Tuple[str, np.ndarray, np.ndarray, np.ndarray]]:
        """(name, crops, labels, mask) per video — frame-level eval
        (materialized; prefer :meth:`video_sources`)."""
        for vid, src, labels, mask in self.video_sources():
            yield vid, src.read_all(), labels, mask

    def video_sources(self) -> Iterator[
            Tuple[str, CropSource, np.ndarray, np.ndarray]]:
        """(name, chunk-readable CropSource, labels, mask) per video —
        memory-bounded counterpart of :meth:`full_videos`."""
        for i, vid in enumerate(self.videos):
            labels = self._labels[i]
            mask = (labels != self.INVALID).all(axis=-1).astype(np.float32)
            yield (vid, self._sources[i],
                   np.where(labels == self.INVALID, 0.0, labels), mask)


def _read_affwild2_annotations(path: str) -> np.ndarray:
    with open(path) as f:
        lines = [ln.strip() for ln in f if ln.strip()]
    if lines:
        # Header detection by parse attempt: first-character heuristics
        # misclassify data rows like ".5,.3" or "+0.2,0.1" as headers.
        try:
            [float(x) for x in lines[0].split(",")]
        except ValueError:
            lines = lines[1:]  # "valence,arousal" header
    return np.asarray([[float(x) for x in ln.split(",")] for ln in lines],
                      np.float32)


# ---------------------------------------------------------------------------
# Synthetic fixture generation (tests / offline demos)
# ---------------------------------------------------------------------------

def make_synthetic_omg(root: str, n_videos: int = 2, n_utts: int = 2,
                       frames: int = 20, size: int = 32,
                       seed: int = 0) -> str:
    """Write a synthetic OMG-layout corpus; returns the manifest path."""
    rng = np.random.default_rng(seed)
    rows = ["video,utterance,valence,arousal"]
    for v in range(n_videos):
        vdir = os.path.join(root, f"video{v}")
        os.makedirs(vdir, exist_ok=True)
        for u in range(n_utts):
            arr = rng.uniform(0, 255, (frames, size, size, 3)).astype(
                np.uint8)
            np.save(os.path.join(vdir, f"utt{u}.npy"), arr)
            val, ar = np.tanh(rng.standard_normal(2)).astype(np.float32)
            rows.append(f"video{v},utt{u},{val:.4f},{ar:.4f}")
    manifest = os.path.join(root, "manifest.csv")
    with open(manifest, "w") as f:
        f.write("\n".join(rows) + "\n")
    return manifest


def make_synthetic_affwild2(root: str, n_videos: int = 2, frames: int = 24,
                            size: int = 32, seed: int = 0) -> None:
    rng = np.random.default_rng(seed)
    os.makedirs(os.path.join(root, "crops"), exist_ok=True)
    os.makedirs(os.path.join(root, "annotations"), exist_ok=True)
    for v in range(n_videos):
        arr = rng.uniform(0, 255, (frames, size, size, 3)).astype(np.uint8)
        np.save(os.path.join(root, "crops", f"vid{v}.npy"), arr)
        labels = np.tanh(rng.standard_normal((frames, 2))).astype(
            np.float32)
        labels[rng.uniform(size=frames) < 0.1] = AffWild2Dataset.INVALID
        lines = ["valence,arousal"] + [
            f"{a:.4f},{b:.4f}" for a, b in labels]
        with open(os.path.join(root, "annotations", f"vid{v}.txt"),
                  "w") as f:
            f.write("\n".join(lines) + "\n")
