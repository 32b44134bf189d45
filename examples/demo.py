"""End-to-end demo: synthesize a video, run the full two-step pipeline.

Prints the artifact paths and the head of the predicted (valence,
arousal) series — no accuracy metric is computable here (the synthetic
video has no ground-truth labels; use ``cli eval`` with a labeled
dataset for CCC).

The reference ships a ``run_example.py`` demo over a sample video
(SURVEY.md §2 "Demo / inference API"); no sample video can ship in this
offline environment, so this demo synthesizes one (a moving face-like
blob), then exercises every user-facing stage:

    python examples/demo.py [--cpu] [--out-dir /tmp/mimamo_demo]
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def synthesize_video(path: str, frames: int = 96, size: int = 160) -> None:
    from mimamo_tpu.io import decode
    rng = np.random.default_rng(0)
    vid = np.zeros((frames, size, size, 3), np.uint8)
    yy, xx = np.mgrid[:size, :size]
    for t in range(frames):
        cy = size / 2 + 10 * np.sin(t / 9.0)
        cx = size / 2 + 12 * np.cos(t / 13.0)
        blob = np.exp(-(((yy - cy) / 26.0) ** 2 + ((xx - cx) / 20.0) ** 2))
        mouth = np.exp(-(((yy - cy - 12) / 3.0) ** 2 +
                         ((xx - cx) / (6 + 3 * np.sin(t / 5.0))) ** 2))
        frame = (blob[..., None] * [210, 170, 150]
                 + mouth[..., None] * [-60, -60, -60]
                 + rng.uniform(0, 25, (size, size, 3)))
        vid[t] = np.clip(frame, 0, 255).astype(np.uint8)
    decode.write_video(path, vid)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out-dir", default="/tmp/mimamo_demo")
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--full-size", action="store_true",
                    help="use the flagship 112/224 geometry (slow on CPU)")
    args = ap.parse_args()

    import jax
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    from mimamo_tpu.api import FeatureExtractor, MimamoAPI, VideoProcessor
    from mimamo_tpu.config import (BackboneSpec, ClipSpec, MimamoConfig,
                                   PhaseSpec, PyramidSpec, TemporalSpec)

    os.makedirs(args.out_dir, exist_ok=True)
    video = os.path.join(args.out_dir, "demo.mp4")
    synthesize_video(video)
    print(f"[1/4] synthesized {video}")

    if args.full_size:
        config = MimamoConfig()
    else:
        config = MimamoConfig(
            pyramid=PyramidSpec(height=2, orientations=4,
                                input_size=(64, 64)),
            phase=PhaseSpec(phase_size=32),
            backbone=BackboneSpec(input_size=64),
            temporal=TemporalSpec(micro_cnn_features=(16, 32),
                                  micro_embed_dim=64, macro_embed_dim=64,
                                  gru_hidden=64, fusion_hidden=64),
            clip=ClipSpec(clip_len=24, stride=12, crop_size=64))

    # Stage workflow (reference two-step): crops + cached features
    vp = VideoProcessor(save_size=config.clip.crop_size, config=config)
    crops = vp.process(video, args.out_dir)
    feats = FeatureExtractor(config=config).extract(crops)
    print(f"[2/4] crops -> {crops}")
    print(f"[3/4] features -> {feats} "
          f"{np.load(feats).shape} (random-init weights: demo only)")

    # Fused end-to-end predict (one XLA program per clip batch)
    api = MimamoAPI(config=config)
    out_csv = os.path.join(args.out_dir, "predictions.csv")
    series = api.predict(video, out_csv=out_csv, align=True)
    print(f"[4/4] per-frame (valence, arousal) -> {out_csv}")
    print(json.dumps({
        "frames": len(series),
        "valence": [round(float(v), 3) for v in series[:6, 0]],
        "arousal": [round(float(a), 3) for a in series[:6, 1]],
    }, indent=None))


if __name__ == "__main__":
    main()
