"""Evaluation harness: CCC per protocol (SURVEY.md §3.5).

OMG-Emotion scores utterance-level CCC (mean prediction per utterance
against the utterance label); Aff-Wild2 scores frame-level CCC over all
valid frames of all videos. Predictions come from the streaming runner so
full-length sequences are handled in O(chunk) memory.
"""

from __future__ import annotations

from typing import Dict, Optional

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
        out, carries = model.predict_stream(variables,
                                            jnp.asarray(piece), carries)
        outs.append(np.asarray(out[0, :n]))
    return np.concatenate(outs, axis=0)


def evaluate_omg(model: Mimamo, variables, dataset: OMGEmotionDataset,
                 chunk: int = 48) -> Dict[str, float]:
    """Utterance-level CCC for valence and arousal."""
    preds, golds = [], []
    for _i, crops, label in dataset.utterances():
        series = _predict_sequence(model, variables, crops, chunk=chunk)
        preds.append(series.mean(axis=0))
        golds.append(label)
    ccc = ccc_np(np.stack(preds), np.stack(golds))
    return {"valence_ccc": float(ccc[0]), "arousal_ccc": float(ccc[1]),
            "mean_ccc": float(ccc.mean()), "n_utterances": len(preds)}


def evaluate_affwild2(model: Mimamo, variables, dataset: AffWild2Dataset,
                      chunk: int = 48) -> Dict[str, float]:
    """Frame-level CCC over all valid frames of all videos."""
    preds, golds = [], []
    for _vid, crops, labels, mask in dataset.full_videos():
        series = _predict_sequence(model, variables, crops, chunk=chunk)
        valid = mask > 0
        preds.append(series[valid])
        golds.append(labels[valid])
    preds = np.concatenate(preds)
    golds = np.concatenate(golds)
    ccc = ccc_np(preds, golds)
    return {"valence_ccc": float(ccc[0]), "arousal_ccc": float(ccc[1]),
            "mean_ccc": float(ccc.mean()), "n_frames": int(len(preds))}
