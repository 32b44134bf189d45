"""Measure appearance-stride chunk-seam drift (the config.py error bar).

``BackboneSpec.appearance_stride > 1`` interpolates backbone embeddings
between every-k-th-frame anchors. Chunked streaming anchors per chunk,
so for k > 1 streamed outputs diverge from batch prediction of the same
frames at chunk seams (the anchor grid restarts and the chunk tail
clamps instead of reaching the next global anchor). This script
quantifies that divergence on flagship shapes so serving users have an
error bar (VERDICT round 2 weak item 4); the structural localization of
the drift is pinned by
tests/test_runner.py::test_streaming_seam_drift_localized_and_quantified.

Methodology: random-init weights (the real checkpoint is offline-
unreachable — SURVEY.md §0), a smooth synthetic face-like clip with
slow appearance drift plus per-frame sensor noise. The drift is a
property of the anchor geometry and the smoothness of embeddings over
time, so random-init figures are indicative; re-run with real weights
when assets land. Runs on CPU by default (~2 min).

    python bench/stride_drift.py [--tpu] [--frames 48] [--chunk 16]
"""

import argparse
import json
import sys

sys.path.insert(0, __file__.rsplit("/", 2)[0])


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=48)
    ap.add_argument("--chunk", type=int, default=16)
    ap.add_argument("--tpu", action="store_true",
                    help="default runs on CPU")
    ap.add_argument("--ks", default="2,4")
    args = ap.parse_args()

    import jax
    if not args.tpu:
        jax.config.update("jax_platforms", "cpu")
    import dataclasses

    import jax.numpy as jnp
    import numpy as np

    from mimamo_tpu.config import MimamoConfig, ClipSpec
    from mimamo_tpu.runner import Mimamo

    t, chunk = args.frames, args.chunk
    cfg = MimamoConfig(clip=ClipSpec(clip_len=t, stride=t // 2))
    # jitted init: eager init is minutes of remote compile on the tunnel
    model0 = Mimamo(cfg)
    variables = jax.jit(model0.init_variables)(jax.random.PRNGKey(0))

    # Smooth synthetic "face": gaussian blob drifting subpixel per frame
    # + slow brightness ramp + sensor noise (the regime the stride
    # profile is sold for: appearance changes slowly between frames).
    rng = np.random.default_rng(0)
    s = cfg.clip.crop_size
    yy, xx = np.mgrid[0:s, 0:s].astype(np.float32)
    frames = []
    for i in range(t):
        cy, cx = s / 2 + 2.0 * np.sin(i / 7.0), s / 2 + 2.0 * np.cos(i / 9.0)
        blob = np.exp(-(((yy - cy) ** 2 + (xx - cx) ** 2)
                        / (2 * (s / 4) ** 2)))
        img = 90 + 100 * blob[..., None] * np.array([1.0, 0.8, 0.7])
        img = img * (1 + 0.002 * i) + rng.normal(0, 2.0, (s, s, 3))
        frames.append(img)
    clips = jnp.asarray(np.clip(np.stack(frames), 0, 255)[None]
                        .astype(np.float32))

    rows = []
    for k in (int(x) for x in args.ks.split(",")):
        m = Mimamo(dataclasses.replace(
            cfg, backbone=dataclasses.replace(cfg.backbone,
                                              appearance_stride=k)))
        batch = np.asarray(m.predict_clips(variables, clips))
        outs, carries = [], None
        for st in range(0, t, chunk):
            o, carries = m.predict_stream(
                variables, clips[:, st:st + chunk], carries)
            outs.append(np.asarray(o))
        stream = np.concatenate(outs, axis=1)
        d = np.abs(stream - batch)
        row = {"k": k, "chunk": chunk, "frames": t,
               "max_abs_drift": round(float(d.max()), 6),
               "rms_drift": round(float(np.sqrt((d ** 2).mean())), 6),
               "output_std": round(float(batch.std()), 6),
               "max_drift_over_std": round(
                   float(d.max() / max(batch.std(), 1e-9)), 4)}
        rows.append(row)
        print(json.dumps(row))
    return 0


if __name__ == "__main__":
    sys.exit(main())
