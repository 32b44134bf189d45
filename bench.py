"""Throughput benchmark: end-to-end frames/sec/chip on the flagship model.

Measures the full compiled clip->prediction program (grayscale + steerable
pyramid + phase diffs + ResNet-50 embeddings + dual GRU + fusion) on
whatever accelerator is attached, against the north-star target of 2,000
frames/sec/chip (BASELINE.json). Prints ONE JSON line.
"""

import argparse
import json
import time

import numpy as np

BASELINE_FPS = 2000.0  # north-star: >=2,000 frames/sec/chip on v5e


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=8, help="clips per step")
    ap.add_argument("--clip-len", type=int, default=48)
    ap.add_argument("--iters", type=int, default=10)
    ap.add_argument("--warmup", type=int, default=2)
    ap.add_argument("--dtype", default="bfloat16",
                    choices=["float32", "bfloat16"])
    ap.add_argument("--backbone-size", type=int, default=224,
                    help="224 = reference parity (crops upscaled); 112 = "
                         "fast profile (native crop resolution, ~1.5x)")
    ap.add_argument("--streams", default="both",
                    choices=["both", "micro", "macro"],
                    help="stream ablation (micro-only skips the ResNet)")
    ap.add_argument("--appearance-stride", type=int, default=1,
                    help="ResNet every k-th frame + embedding "
                         "interpolation (opt-in, non-parity)")
    ap.add_argument("--layer2-mode", default="conv",
                    choices=["conv", "pallas"],
                    help="layer2 lowering A/B (pallas = fused "
                         "VMEM-resident kernel; TPU+bf16 only)")
    ap.add_argument("--cpu", action="store_true", help="force CPU backend")
    ap.add_argument("--verbose", action="store_true",
                    help="print stage timings to stderr")
    args = ap.parse_args()

    import sys

    def vlog(msg, _t0=[time.perf_counter()]):
        if args.verbose:
            print(f"[bench +{time.perf_counter() - _t0[0]:.1f}s] {msg}",
                  file=sys.stderr, flush=True)

    import jax
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    from mimamo_tpu.config import (BackboneSpec, ClipSpec, MimamoConfig,
                                   TemporalSpec)
    from mimamo_tpu.runner import Mimamo

    cfg = MimamoConfig(
        backbone=BackboneSpec(dtype=args.dtype,
                              input_size=args.backbone_size,
                              appearance_stride=args.appearance_stride,
                              layer2_mode=args.layer2_mode),
        temporal=TemporalSpec(streams=args.streams),
        clip=ClipSpec(clip_len=args.clip_len, stride=args.clip_len // 2),
    )
    model = Mimamo(cfg)
    if args.layer2_mode == "pallas" and not model._pallas_layer2_ok():
        # The flag exists for a hardware A/B; silently measuring the
        # conv fallback would record a bogus no-difference verdict
        # (round-4 review finding).
        raise SystemExit(
            "--layer2-mode pallas requires bfloat16 and a TPU backend "
            "(the trace-time gate rejected this config; the run would "
            "silently measure the conv path)")
    # One jitted init program — eager init dispatches hundreds of tiny ops
    # through the TPU tunnel (each a remote compile), taking minutes.
    variables = jax.jit(model.init_variables)(jax.random.PRNGKey(0))
    vlog("init done")

    # uint8 feed: production crops arrive as uint8, and shipping them
    # that way is 4x less host->device traffic; the cast to f32 happens
    # inside the jitted program (runner.forward).
    b, t, s = args.batch, args.clip_len, cfg.clip.crop_size
    clips = jax.device_put(jnp.asarray(np.random.default_rng(0).uniform(
        0, 255, (b, t, s, s, 3)).astype(np.uint8)))

    # Axon-tunnel-safe timing harness (all verified empirically on this
    # environment): (a) the tunnel caches executions with identical
    # arguments, so a fresh 4-byte scalar "salt" argument per call forces
    # real execution without building per-iteration 50 MB inputs (large
    # multi-buffer builders wedge the relay); (b) block_until_ready is
    # effectively a no-op and deep async queues degrade pathologically,
    # so each iteration synchronously fetches the tiny [B, T, 2] output.
    from mimamo_tpu.compile import tuned_jit

    @tuned_jit
    def step(variables, clips, salt):
        out, _ = model.forward(variables,
                               clips.astype(jnp.float32) + salt)
        return out

    def warm():
        for i in range(args.warmup):
            # NEGATIVE warmup salts: timed salts are 0..iters-1, so a
            # positive warmup salt would collide for large --iters and
            # those steps would hit the tunnel's identical-arg
            # execution cache (round-4 review finding)
            np.asarray(step(variables, clips, np.float32(-1 - i)))
            vlog(f"warmup {i} done")

    # The tunnel's remote compile occasionally fails/stalls transiently;
    # one retry after a pause salvages the run (the executable is cached
    # by then). Persistent failure still raises — no fake numbers.
    try:
        warm()
    except Exception as e:  # noqa: BLE001 - single retry, then re-raise
        print(f"[bench] warmup failed ({type(e).__name__}: {e}); "
              f"retrying in 60s", file=sys.stderr, flush=True)
        time.sleep(60)
        warm()

    # Depth-2 pipeline: keep exactly one execution in flight while
    # fetching the previous result — hides the tunnel's ~22 ms dispatch+
    # fetch latency behind compute (+59% measured) without tripping the
    # deep-async-queue pathology. Every step still computes (salted) and
    # every output is still fetched.
    start = time.perf_counter()
    pending = step(variables, clips, np.float32(0))
    for j in range(1, args.iters):
        nxt = step(variables, clips, np.float32(j))
        np.asarray(pending)
        pending = nxt
        vlog(f"iter {j - 1} done")
    np.asarray(pending)
    vlog(f"iter {args.iters - 1} done")
    elapsed = time.perf_counter() - start

    frames = b * t * args.iters
    fps = frames / elapsed
    print(json.dumps({
        "metric": "end_to_end_frames_per_sec_per_chip",
        "value": round(fps, 1),
        "unit": "frames/sec/chip",
        "vs_baseline": round(fps / BASELINE_FPS, 3),
    }))


if __name__ == "__main__":
    main()
