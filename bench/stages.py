"""Per-stage throughput breakdown on the attached accelerator.

The reference has no profiling story (SURVEY.md §5 "Tracing/profiling" —
``time.time()`` prints at best). This harness times each pipeline stage as
its own jitted program with the axon-tunnel-safe protocol: salted args
force real execution past the tunnel's result cache, and a depth-2
dispatch pipeline (one execution in flight while fetching the previous)
hides the ~22 ms tunnel round-trip that otherwise inflates every stage by
a constant — so the numbers are comparable to bench.py's end-to-end
figure. One JSON line per stage.

Usage: python bench/stages.py [--batch 8] [--clip-len 48] [--iters 5]
       [--trace DIR]  (writes a jax.profiler trace for Perfetto)
"""

import argparse
import json
import sys
import time

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--clip-len", type=int, default=48)
    ap.add_argument("--iters", type=int, default=8)
    ap.add_argument("--dtype", default="bfloat16")
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--trace", default=None,
                    help="jax.profiler trace output dir")
    ap.add_argument("--stages", nargs="*", default=None,
                    help="run only stages whose name contains one of "
                         "these substrings (sum_of_stages/"
                         "unfused_overhead are then meaningless and "
                         "skipped)")
    ap.add_argument("--chain", type=int, default=1,
                    help="salted applications of each stage chained inside "
                         "ONE jitted call; amortizes the ~22 ms tunnel "
                         "dispatch+fetch floor that otherwise dominates "
                         "sub-25ms stages (sec_per_step is per application)")
    args = ap.parse_args()

    import jax
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    from mimamo_tpu import preprocess
    from mimamo_tpu.config import BackboneSpec, ClipSpec, MimamoConfig
    from mimamo_tpu.phase import micro_motion_features
    from mimamo_tpu.runner import Mimamo

    cfg = MimamoConfig(
        backbone=BackboneSpec(dtype=args.dtype),
        clip=ClipSpec(clip_len=args.clip_len, stride=args.clip_len // 2))
    model = Mimamo(cfg)
    variables = jax.jit(model.init_variables)(jax.random.PRNGKey(0))

    b, t, s = args.batch, args.clip_len, cfg.clip.crop_size
    rng = np.random.default_rng(0)
    clips = jax.device_put(jnp.asarray(
        rng.uniform(0, 255, (b, t, s, s, 3)).astype(np.float32)))
    boxes = jax.device_put(jnp.asarray(np.tile(
        np.asarray([[4.0, 4.0, 100.0, 100.0]], np.float32), (b * t, 1))))
    frames_big = jax.device_put(jnp.asarray(
        rng.uniform(0, 255, (b * t, 128, 128, 3)).astype(np.float32)))
    bb = cfg.backbone.input_size
    imgs224 = jax.device_put(jnp.asarray(
        rng.uniform(-128, 128, (b * t, bb, bb, 3)).astype(np.float32)))

    from _timing import time_chained

    def stage(name, fn, *inputs, frames_per_step):
        # jnp.sum keeps the fetched payload tiny; the salt defeats the
        # tunnel's identical-args execution cache. With --chain k, the
        # stage runs k times (distinct salts -> no CSE) inside one
        # program, so the per-application time sheds the fetch floor.
        # FLOOR CAVEAT (round-5 crop probe): a chained stage measures
        # max(true_compute, ~28ms/k) per application — any row near
        # 28/k ms is an upper bound, not a cost. Small stages need
        # --chain 24-48 (--stages to avoid re-compiling the big ones).
        if args.stages is not None and not any(sub in name
                                               for sub in args.stages):
            return 0.0
        k = args.chain

        def chained(salt, *xs):
            return sum(jnp.sum(fn(*xs, salt + 17.0 * i))
                       for i in range(k))

        dt = time_chained(jax.jit(chained), inputs, args.iters, k)
        print(json.dumps({
            "stage": name, "sec_per_step": round(dt, 5),
            "frames_per_sec": round(frames_per_step / dt, 1)}))
        return dt

    fpstep = b * t
    total = 0.0
    total += stage(
        "crop_resize",
        lambda f, bx, salt: preprocess.crop_and_resize(f + salt, bx, s),
        frames_big, boxes, frames_per_step=fpstep)
    total += stage(
        "phase_pyramid",
        lambda c, salt: micro_motion_features(
            preprocess.to_grayscale(c + salt), cfg.pyramid, cfg.phase),
        clips, frames_per_step=fpstep)
    # FFT-dispatch comparison (not added to the total): XLA FFT vs the
    # MXU matmul-DFT path, explicitly forced either way.
    import dataclasses
    for mode in ("fft", "matmul"):
        pyr = dataclasses.replace(cfg.pyramid, fft_mode=mode)
        stage(
            f"phase/fft_mode={mode}",
            lambda c, salt, _p=pyr: micro_motion_features(
                preprocess.to_grayscale(c + salt), _p, cfg.phase),
            clips, frames_per_step=fpstep)
    total += stage(
        "backbone",
        lambda c, salt: model.embed_frames(variables, c + salt),
        clips, frames_per_step=fpstep)
    # Sub-stages of "backbone" (not added to the total): where does the
    # appearance stream spend — the 112->224 upscale or the conv stack?
    stage(
        "backbone/upscale+meansub",
        lambda c, salt: preprocess.for_backbone(
            (c + salt).reshape((b * t,) + c.shape[2:]), cfg.backbone),
        clips, frames_per_step=fpstep)
    from mimamo_tpu.backbone import fold_batchnorm
    fused_vars = jax.jit(fold_batchnorm)(variables["backbone"])
    stage(
        "backbone/conv_stack_224",
        lambda x, salt: model.backbone_fused.apply(fused_vars,
                                                   x + salt)[0],
        imgs224, frames_per_step=fpstep)
    # conv1 (7x7/2 on 3 channels) in isolation: the classic low-MXU-
    # occupancy stem — decides whether a space-to-depth stem pays.
    import flax.linen as nn
    c1k = fused_vars["params"]["conv1"]["kernel"].astype(jnp.bfloat16)
    c1b = fused_vars["params"]["conv1"]["bias"].astype(jnp.bfloat16)

    def conv1_pool(x, salt):
        y = jax.lax.conv_general_dilated(
            (x + salt).astype(jnp.bfloat16), c1k, (2, 2),
            [(3, 3), (3, 3)], dimension_numbers=("NHWC", "HWIO", "NHWC"))
        y = nn.relu(y + c1b)
        return nn.max_pool(y, (3, 3), strides=(2, 2),
                           padding=((1, 1), (1, 1)))

    stage("backbone/conv1_pool_224", conv1_pool, imgs224,
          frames_per_step=fpstep)

    p = cfg.phase.phase_size
    phase_in = jax.device_put(jnp.asarray(rng.standard_normal(
        (b, t - 1, cfg.num_phase, p, p)).astype(np.float32)))
    feats = jax.device_put(jnp.asarray(rng.standard_normal(
        (b, t, cfg.backbone.feature_dim)).astype(np.float32)))
    total += stage(
        "temporal(two-stream GRU)",
        lambda ph, ft, salt: model.temporal.apply(
            variables["temporal"], ph + salt, ft)[0],
        phase_in, feats, frames_per_step=fpstep)

    if args.stages is None:
        print(json.dumps({"stage": "sum_of_stages",
                          "sec_per_step": round(total, 5),
                          "frames_per_sec": round(fpstep / total, 1)}))

    if args.trace:
        import jax.profiler
        with jax.profiler.trace(args.trace):
            float(jax.jit(lambda salt: jnp.sum(model.forward(
                variables, clips + salt)[0]))(np.float32(123)))
        print(json.dumps({"trace": args.trace}))

    full = stage(
        "full_pipeline",
        lambda c, salt: model.forward(variables, c + salt)[0],
        clips, frames_per_step=fpstep)
    if args.stages is None:
        print(json.dumps({"stage": "unfused_overhead",
                          "sec_per_step": round(full - total, 5)}))


if __name__ == "__main__":
    main()
