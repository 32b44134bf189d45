"""Command-line interface: predict / extract / train / eval / bench.

The reference's scripts layer (SURVEY.md §1 L5: ``train.py``/``main.py``
argparse CLIs) as one entry point::

    python -m mimamo_tpu.cli predict --video clip.mp4 --out preds.csv
    python -m mimamo_tpu.cli extract --video clip.mp4 --out-dir work/
    python -m mimamo_tpu.cli train --dataset omg --root data/ \
        --manifest data/manifest.csv --ckpt ckpts/
    python -m mimamo_tpu.cli eval --dataset affwild2 --root data/ \
        --ckpt ckpts/
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from typing import Optional


def _add_common(p: argparse.ArgumentParser) -> None:
    p.add_argument("--clip-len", type=int, default=48)
    p.add_argument("--stride", type=int, default=24)
    p.add_argument("--crop-size", type=int, default=112)
    p.add_argument("--backbone-size", type=int, default=224)
    p.add_argument("--pyramid-height", type=int, default=3)
    p.add_argument("--orientations", type=int, default=4)
    p.add_argument("--phase-size", type=int, default=48)
    p.add_argument("--snippet-len", type=int, default=1,
                   help="frames per snippet (1 = per-frame GRU steps)")
    p.add_argument("--gru-layers", type=int, default=1,
                   help="stacked GRU layers per stream")
    p.add_argument("--streams", default="both",
                   choices=["both", "micro", "macro"],
                   help="stream ablation (paper baselines): micro-only "
                        "skips the ResNet, macro-only skips the pyramid")
    p.add_argument("--appearance-stride", type=int, default=1,
                   help="opt-in serving profile: run the ResNet every "
                        "k-th frame, interpolate embeddings between "
                        "(micro-motion still sees every frame; NOT "
                        "reference parity)")
    p.add_argument("--dtype", default="float32",
                   choices=["float32", "bfloat16"])
    p.add_argument("--fft-mode", default="auto",
                   choices=["auto", "fft", "matmul"],
                   help="pyramid DFT lowering: matmul = MXU DFT-as-"
                        "matmul (TPU default via auto), fft = jnp.fft")
    p.add_argument("--stem-mode", default="composite",
                   choices=["composite", "upscale"],
                   help="fused-inference stem lowering: composite folds "
                        "the 2x upscale into conv1 (+6%% measured); "
                        "upscale keeps the reference two-step lowering")
    p.add_argument("--use-pallas", action="store_true",
                   help="fused Pallas phase-diff kernel on TPU "
                        "(measured default stays XLA fusion — "
                        "BASELINE.md negative result)")
    p.add_argument("--cpu", action="store_true", help="force CPU backend")


def _add_multihost(p: argparse.ArgumentParser, what: str) -> None:
    """Pod-slice launch flags (train / eval / predict-corpus share the
    exact pattern: same command on every host, disjoint work slices —
    SURVEY.md §5 distributed row, §7 step 7)."""
    p.add_argument("--coordinator", default=None,
                   help="multi-host: coordinator address host:port "
                        "(jax.distributed.initialize); launch the SAME "
                        "command on every host with --process-id 0..P-1 "
                        f"(see docs/TRAINING.md). {what}")
    p.add_argument("--num-processes", type=int, default=None,
                   help="multi-host: total process count P")
    p.add_argument("--process-id", type=int, default=None,
                   help="multi-host: this process's id (0-based)")


def _init_multihost(args) -> None:
    """jax.distributed.initialize from the CLI flags (before any other
    backend use). No-op without any multi-host flag."""
    if not getattr(args, "coordinator", None):
        if (getattr(args, "num_processes", None) is not None
                or getattr(args, "process_id", None) is not None):
            # Fail fast: silently running single-process would stream
            # the FULL dataset on this host (not its slice) while the
            # peers hang in jax.distributed.initialize.
            raise SystemExit("--num-processes/--process-id require "
                             "--coordinator (pod-slice launch needs "
                             "all three on every host)")
        return
    import jax
    from . import parallel
    n = parallel.initialize_distributed(args.coordinator,
                                        args.num_processes,
                                        args.process_id)
    print(f"distributed: process {jax.process_index()} of "
          f"{jax.process_count()}, {n} global devices", file=sys.stderr)


def _config(args):
    from .config import (BackboneSpec, ClipSpec, MimamoConfig, PhaseSpec,
                         PyramidSpec, TemporalSpec)
    s = args.crop_size
    return MimamoConfig(
        pyramid=PyramidSpec(height=args.pyramid_height,
                            orientations=args.orientations,
                            input_size=(s, s),
                            fft_mode=args.fft_mode),
        phase=PhaseSpec(phase_size=args.phase_size),
        backbone=BackboneSpec(input_size=args.backbone_size,
                              dtype=args.dtype,
                              appearance_stride=args.appearance_stride,
                              stem_mode=args.stem_mode),
        temporal=TemporalSpec(snippet_len=args.snippet_len,
                              gru_layers=args.gru_layers,
                              streams=args.streams),
        clip=ClipSpec(clip_len=args.clip_len, stride=args.stride,
                      crop_size=s),
        use_pallas=args.use_pallas)


def _setup_backend(args) -> None:
    import jax
    if getattr(args, "cpu", False):
        jax.config.update("jax_platforms", "cpu")
    if getattr(args, "debug_nans", False):
        # SURVEY.md §5 "race detection / sanitizers" equivalent for the
        # single-controller model: fail loudly at the op that made a NaN.
        jax.config.update("jax_debug_nans", True)


def cmd_predict(args) -> int:
    # arg coherence before the (slow) backend setup
    if bool(args.video) == bool(args.crops):
        raise SystemExit("exactly one of --video / --crops is required")
    if args.crops and (args.align or args.boxes or args.landmarks):
        raise SystemExit("--crops takes precomputed ALIGNED crops — "
                         "--align/--boxes/--landmarks do not apply")
    _setup_backend(args)
    import numpy as np

    from .api import MimamoAPI
    api = MimamoAPI(config=_config(args), checkpoint_dir=args.ckpt)
    threshold = (None if args.streaming_threshold < 0
                 else args.streaming_threshold)
    if args.crops:
        out = api.predict_crops(args.crops, out_csv=args.out,
                                max_frames=args.max_frames,
                                smooth=args.smooth,
                                emotions=args.emotions,
                                streaming_threshold=threshold)
    else:
        out = api.predict(args.video, out_csv=args.out,
                          boxes_path=args.boxes,
                          max_frames=args.max_frames, align=args.align,
                          landmarks_path=args.landmarks,
                          smooth=args.smooth, emotions=args.emotions,
                          streaming_threshold=threshold)
    series, probs = out if args.emotions else (out, None)
    row = {"frames": len(series),
           "valence_mean": float(series[:, 0].mean()),
           "arousal_mean": float(series[:, 1].mean()),
           "out": args.out}
    if probs is not None:
        from .backbone import FERPLUS_CLASSES
        row["top_emotion"] = FERPLUS_CLASSES[
            int(np.argmax(probs.mean(axis=0)))]
    print(json.dumps(row))
    return 0


def cmd_extract(args) -> int:
    _setup_backend(args)
    from . import checkpoints as _ckpt
    from .api import FeatureExtractor, VideoProcessor
    config = _ckpt.apply_backbone_meta(_config(args), args.ckpt)
    vp = VideoProcessor(save_size=args.crop_size, config=config)
    crops = vp.process(args.video, args.out_dir, boxes_path=args.boxes,
                       max_frames=args.max_frames, align=args.align,
                       landmarks_path=args.landmarks)
    variables = None
    if args.ckpt:
        import jax
        from . import checkpoints, train
        from .runner import Mimamo
        model = Mimamo(config)
        state, _tx = train.create_train_state(model, jax.random.PRNGKey(0))
        variables = train.variables_from_state(
            checkpoints.restore(args.ckpt, state))
    feats = FeatureExtractor(config=config,
                             variables=variables).extract(crops)
    print(json.dumps({"crops": crops, "features": feats,
                      "weights": "checkpoint" if args.ckpt else
                      "RANDOM-INIT (pass --ckpt for real features)"}))
    return 0


def _dataset(args, config):
    from .data import datasets
    if args.dataset == "omg":
        if not args.manifest:
            raise SystemExit("--manifest is required for --dataset omg")
        return datasets.OMGEmotionDataset(args.root, args.manifest,
                                          config.clip)
    return datasets.AffWild2Dataset(args.root, clip=config.clip)


def cmd_train(args) -> int:
    _setup_backend(args)
    import jax

    from . import checkpoints, parallel, train
    from .runner import Mimamo
    from .config import TrainSpec
    import dataclasses

    if args.coordinator:
        # Must run before any backend use; afterwards jax.devices()
        # spans the pod slice (SURVEY.md §5 "Distributed communication
        # backend") and make_mesh() builds the global data mesh.
        if not args.data_parallel:
            raise SystemExit("multi-host training requires "
                             "--data-parallel (the global batch is "
                             "sharded over the pod-slice mesh)")
        _init_multihost(args)
    import jax.numpy as jnp
    import numpy as np

    loss_axis = args.loss_axis or (
        "batch" if args.dataset == "omg" else "time")
    # --mse-weight alone implies the composite loss; an explicit
    # --loss ccc+mse without a weight is caught by TrainSpec validation
    loss = ("ccc+mse" if args.mse_weight > 0 and args.loss == "ccc"
            else args.loss)
    try:
        train_spec = TrainSpec(
            learning_rate=args.lr, batch_size=args.batch,
            epochs=args.epochs, seed=args.seed,
            loss=loss, mse_weight=args.mse_weight,
            weight_decay=args.weight_decay,
            loss_axis=loss_axis,
            lr_schedule=args.lr_schedule,
            warmup_steps=args.warmup_steps,
            augment=args.augment,
            brightness_jitter=args.brightness_jitter,
            freeze_backbone=not args.finetune_backbone)
    except ValueError as e:
        raise SystemExit(str(e))
    config = dataclasses.replace(_config(args), train=train_spec)
    # Fine-tuning / resuming from a converted checkpoint must inherit
    # its preprocessing convention (mean / channel order) exactly like
    # every other --ckpt consumer — otherwise training silently uses
    # default means while eval of the same checkpoint uses the right
    # ones (round-3 advisor finding).
    config = checkpoints.apply_backbone_meta(config, args.ckpt)
    model = Mimamo(config)
    ds = _dataset(args, config)
    if len(ds) == 0:
        raise SystemExit("dataset produced 0 clips (too short sequences?)")

    # Per-host input pipeline: each process draws batch/P clips from its
    # disjoint slice of the (identically shuffled) clip index; the
    # global batch is assembled in parallel.global_batch. Single host:
    # nproc == 1 and everything below reduces to the round-2 behavior.
    nproc, pid = jax.process_count(), jax.process_index()
    if config.train.batch_size % nproc:
        raise SystemExit(
            f"--batch {config.train.batch_size} must be divisible by "
            f"the process count {nproc}")
    local_batch = config.train.batch_size // nproc
    # Identical step counts on every process (a process with one more
    # index entry must not run an extra collective step -> hang).
    steps_per_epoch = (len(ds) // nproc) // local_batch
    if steps_per_epoch == 0:
        # drop_remainder batching would silently yield ZERO steps per
        # epoch and save a random-init checkpoint (round-4 review
        # finding) — fail fast instead.
        raise SystemExit(
            f"dataset has {len(ds)} clips ({len(ds) // nproc} per "
            f"process) — fewer than one batch of {local_batch}; "
            f"shrink --batch or add data")
    if args.eval_every < 1:
        raise SystemExit(f"--eval-every must be >= 1, got "
                         f"{args.eval_every}")
    planned_steps = max(args.epochs * steps_per_epoch, 1)
    tx = train.make_optimizer(config, total_steps=planned_steps)
    state, tx = train.create_train_state(model, jax.random.PRNGKey(
        config.train.seed), tx=tx)
    # Online appearance stream is mandatory under crop augmentation
    # (cached .feat.npy embeddings cannot reflect augmented crops) and
    # under fine-tuning (the backbone must actually run to get grads).
    augmenting = (args.augment or args.brightness_jitter > 0
                  or args.finetune_backbone)
    if config.backbone.appearance_stride > 1:
        print("note: --appearance-stride applies only where the frozen "
              "backbone runs online; fine-tuning runs the real per-"
              "frame backbone, and training from cached .feat.npy "
              "applies no ADDITIONAL stride — but cached features "
              "inherit whatever stride their extraction config used, "
              "so they are not automatically stride-free",
              file=sys.stderr)
    import os as _os
    # The cosine horizon must be the ORIGINAL planned run length, not
    # re-derived per resume: re-spanning over resumed+planned on every
    # restart would jump the lr discontinuously at each resume and
    # stretch the decay forever (round-2 advisor finding). The first
    # run persists its plan next to the checkpoint; resumes rebuild the
    # schedule over that fixed horizon, extending only when the
    # restored step has already passed it.
    plan_path = (args.ckpt.rstrip("/") + ".plan.json" if args.ckpt
                 else None)
    horizon = planned_steps
    if args.resume and checkpoints.latest_step(args.ckpt) is not None:
        state = checkpoints.restore(args.ckpt, state)
        resumed = int(np.asarray(state.step))
        print(f"resumed from step {resumed}", file=sys.stderr)
        if resumed and config.train.lr_schedule == "cosine":
            # The restored optimizer count is already at ``resumed``; a
            # schedule sized only for this run's steps would spend the
            # whole resumed run past its decay horizon at lr ~= 0.
            # (The opt-state tree structure is schedule-independent, so
            # the restored Adam moments stay valid under a rebuilt tx.)
            horizon = resumed + planned_steps
            if plan_path and _os.path.exists(plan_path):
                with open(plan_path) as f:
                    saved = int(json.load(f)["total_steps"])
                horizon = (saved if resumed < saved
                           else resumed + planned_steps)
            tx = train.make_optimizer(config, total_steps=horizon)
            print(f"cosine horizon: {horizon} steps", file=sys.stderr)
    if plan_path and config.train.lr_schedule == "cosine":
        # persist the effective horizon (fresh plan, or a legacy/
        # past-horizon resume that extended it) for future resumes
        with open(plan_path, "w") as f:
            json.dump({"total_steps": horizon}, f)
    step_fn = train.make_train_step(model, tx)
    mesh = parallel.make_mesh() if args.data_parallel else None
    if mesh is not None and config.train.batch_size % mesh.devices.size:
        # Padding training batches would contaminate train-mode BN
        # statistics; unlike inference, require clean divisibility.
        raise SystemExit(
            f"--batch {config.train.batch_size} must be divisible by the "
            f"device count {mesh.devices.size} for --data-parallel")

    eval_ds = None
    if args.eval_root:
        import copy
        eval_args = copy.copy(args)
        eval_args.root = args.eval_root
        eval_args.manifest = args.eval_manifest or args.manifest
        eval_ds = _dataset(eval_args, config)

    log_path = args.log or (args.ckpt.rstrip("/") + ".metrics.jsonl"
                            if args.ckpt else None)
    log_f = open(log_path, "a") if log_path else None
    tb_writer = None
    if args.tensorboard:
        import tensorflow as tf  # installed in this image; soft dep
        tb_writer = tf.summary.create_file_writer(args.tensorboard)
    best_ccc = -2.0
    if mesh is not None:
        # Replicate ONCE; the jitted step's output sharding matches its
        # (replicated-params) input sharding, so re-placement per batch
        # would only add device round-trips.
        state = parallel.replicate(state, mesh)
    for epoch in range(args.epochs):
        t0 = time.time()
        n, agg = 0, {}
        # Depth-2 metric pipeline under the process-wide in-flight cap
        # (mimamo_tpu.dispatch): dispatching the next step before
        # fetching the previous step's metrics hides the host<->device
        # round-trip behind compute (the bench.py pattern; a deeper
        # async queue wedges the TPU tunnel — see CLAUDE.md).
        from . import dispatch as _dp
        pending = []

        def drain(limit):
            while len(pending) > limit:
                # one host fetch for the whole metrics dict (per-key
                # float() would pay one tunnel round-trip per metric);
                # fetch ONLY the metrics subtree — the state stays on
                # device as the next step's input.
                p, m = pending.pop(0)
                for k, v in p.fetch(m).items():
                    agg[k] = agg.get(k, 0.0) + float(v)

        for batch in ds.batches(local_batch, shuffle=True,
                                seed=config.train.seed + epoch,
                                drop_remainder=True,
                                process_id=pid, process_count=nproc,
                                stratify=loss_axis == "batch",
                                features=not augmenting):
            if n >= steps_per_epoch:
                break
            if nproc > 1:
                jb = parallel.global_batch(batch, mesh)
            else:
                jb = {k: jnp.asarray(v) for k, v in batch.items()}
                if mesh is not None:
                    jb = parallel.shard_batch(
                        parallel.pad_to_multiple(jb, mesh.devices.size),
                        mesh)
            p = _dp.dispatch(step_fn, state, jb, _block=not pending)
            if p is None:                      # budget contended
                drain(limit=0)
                p = _dp.dispatch(step_fn, state, jb)
            state, metrics = p.value
            pending.append((p, metrics))
            n += 1
            drain(limit=1)
        drain(limit=0)
        row = {"epoch": epoch, "steps": n,
               "sec": round(time.time() - t0, 2),
               **{k: round(v / max(n, 1), 4) for k, v in agg.items()}}
        if eval_ds is not None and (epoch + 1) % args.eval_every == 0:
            from .data import eval as eval_mod
            variables = train.variables_from_state(state)
            ev = (eval_mod.evaluate_omg if args.dataset == "omg"
                  else eval_mod.evaluate_affwild2)(
                model, variables, eval_ds, chunk=config.clip.clip_len)
            row.update({"val_" + k: round(v, 4)
                        for k, v in ev.items() if k.endswith("_ccc")})
            # Reference keeps the best-val checkpoint (SURVEY.md §3.3).
            if args.ckpt and ev["mean_ccc"] > best_ccc:
                best_ccc = ev["mean_ccc"]
                best_dir = args.ckpt.rstrip("/") + "_best"
                checkpoints.save(best_dir, state)
                # The best-val dir is consumed standalone by predict/
                # eval --ckpt: it needs the active preprocessing
                # convention too, or a bgr/custom-mean fine-tune would
                # silently evaluate with rgb defaults (round-3 advisor
                # bug, one directory over).
                checkpoints.save_backbone_meta(
                    best_dir, config.backbone.mean_rgb,
                    config.backbone.channel_order)
                row["best"] = True
        print(json.dumps(row))
        if log_f:
            log_f.write(json.dumps(row) + "\n")
            log_f.flush()
        if tb_writer is not None:
            with tb_writer.as_default(step=epoch):
                import tensorflow as tf
                for k, v in row.items():
                    if isinstance(v, (int, float)) and k != "epoch":
                        tf.summary.scalar(k, v)
            tb_writer.flush()
        if args.ckpt:
            checkpoints.save(args.ckpt, state)
            checkpoints.save_backbone_meta(
                args.ckpt, config.backbone.mean_rgb,
                config.backbone.channel_order)
    if log_f:
        log_f.close()
    return 0


def cmd_eval(args) -> int:
    _setup_backend(args)
    _init_multihost(args)
    import jax

    from . import checkpoints, train
    from .data import eval as eval_mod
    from .runner import Mimamo

    config = checkpoints.apply_backbone_meta(_config(args), args.ckpt)
    model = Mimamo(config)
    state, _tx = train.create_train_state(model, jax.random.PRNGKey(0))
    if args.ckpt:
        state = checkpoints.restore(args.ckpt, state)
    variables = train.variables_from_state(state)
    ds = _dataset(args, config)
    fn = (eval_mod.evaluate_omg if args.dataset == "omg"
          else eval_mod.evaluate_affwild2)
    mesh = None
    if args.data_parallel:
        from . import parallel
        # Multi-host eval shards WORK per process (disjoint sequence
        # slices) rather than sharding one global batch-of-streams:
        # each process's streaming session runs on its own addressable
        # devices (host feeds cannot device_put onto another host's
        # shards), and only the tiny CCC moment sums cross hosts.
        mesh = parallel.make_mesh(
            jax.local_devices() if jax.process_count() > 1 else None)
        if args.batch_streams % mesh.devices.size:
            raise SystemExit(
                f"--batch-streams {args.batch_streams} must be "
                f"divisible by the local device count "
                f"{mesh.devices.size} for --data-parallel")
    out = fn(model, variables, ds, chunk=config.clip.clip_len,
             batch_streams=args.batch_streams, mesh=mesh,
             process_id=jax.process_index(),
             process_count=jax.process_count())
    # every process computes (and prints) the identical global metrics
    print(json.dumps(out))
    return 0


def cmd_predict_corpus(args) -> int:
    _setup_backend(args)
    _init_multihost(args)
    import glob as globmod

    import jax

    from . import checkpoints, parallel, train
    from .corpus import CorpusRunner
    from .runner import Mimamo

    config = checkpoints.apply_backbone_meta(_config(args), args.ckpt)
    model = Mimamo(config)
    state, _tx = train.create_train_state(model, jax.random.PRNGKey(0))
    if args.ckpt:
        state = checkpoints.restore(args.ckpt, state)
    variables = train.variables_from_state(state)
    paths = sorted(globmod.glob(args.videos))
    if not paths:
        raise SystemExit(f"no videos match {args.videos!r}")
    # Multi-host: each process crunches its OWN corpus slice on its own
    # addressable devices (CorpusRunner shards the path list per
    # process); a global mesh would try to device_put host-local clip
    # batches onto other hosts' shards.
    mesh = (parallel.make_mesh(
        jax.local_devices() if jax.process_count() > 1 else None)
        if args.data_parallel else None)
    runner = CorpusRunner(model, variables, args.out_dir,
                          batch_clips=args.batch, mesh=mesh,
                          loader_threads=args.threads,
                          use_native=not args.no_native,
                          smooth=args.smooth, align=args.align)
    print(json.dumps(runner.run(paths)))
    return 0


def cmd_convert(args) -> int:
    """Reference ``.pth`` checkpoints -> one orbax checkpoint dir.

    The migration entry point for reference users (SURVEY.md §2
    "Pretrained assets"): feed the FER+ backbone ``.pth`` and/or a
    trained two-stream ``.pth``, get a checkpoint directory every other
    subcommand accepts via ``--ckpt``. Foreign key schemas translate via
    JSON rename/prefix maps (see docs/WEIGHTS.md); strict by default —
    unmapped tensors are an error, not a silent random-init.
    """
    _setup_backend(args)
    import jax
    from . import checkpoints, train
    from .runner import Mimamo

    if not (args.backbone_pth or args.temporal_pth):
        raise SystemExit("convert needs --backbone-pth and/or "
                         "--temporal-pth")

    def json_map(path):
        if not path:
            return None
        with open(path) as f:
            m = json.load(f)
        if (not isinstance(m, dict)
                or not all(isinstance(v, str) for v in m.values())):
            raise SystemExit(f"{path}: expected a flat "
                             f"{{source: canonical}} JSON object")
        return m

    config = _config(args)
    report = {}
    meta = backbone_sd = None
    if args.backbone_pth:
        # One deserialization for tensors + meta (a real FER+ .pth is
        # ~100 MB). Preprocessing metadata travels with MatConvNet
        # conversions (meta['mean'] / imageOrder — SURVEY.md A.5);
        # fold it into the config BEFORE building the model and record
        # it next to the checkpoint so --ckpt consumers inherit it
        # automatically.
        backbone_sd, meta = checkpoints.load_pth_all(args.backbone_pth)
        if meta:
            import dataclasses
            bspec = config.backbone
            if "mean" in meta:
                bspec = dataclasses.replace(
                    bspec, mean_rgb=tuple(meta["mean"]))
            if "channel_order" in meta:
                bspec = dataclasses.replace(
                    bspec, channel_order=meta["channel_order"])
            config = dataclasses.replace(config, backbone=bspec)
            report["backbone_meta"] = {
                "mean_rgb": list(bspec.mean_rgb),
                "channel_order": bspec.channel_order}
            if meta.get("std") and any(abs(s - 1.0) > 1e-6
                                       for s in meta["std"]):
                print(f"WARNING: checkpoint meta['std'] = {meta['std']} "
                      f"!= 1 — this importer assumes mean-subtraction-"
                      f"only preprocessing (SURVEY.md A.5); verify the "
                      f"source model", file=sys.stderr)
            if (meta.get("image_size")
                    and meta["image_size"] != config.backbone.input_size):
                print(f"note: checkpoint meta imageSize "
                      f"{meta['image_size']} != --backbone-size "
                      f"{config.backbone.input_size}; the ResNet is "
                      f"fully convolutional so weights load either "
                      f"way, but reference parity uses the meta size",
                      file=sys.stderr)
    model = Mimamo(config)
    from . import dispatch as _dp
    variables = dict(_dp.run_settled(jax.jit(model.init_variables),
                                     jax.random.PRNGKey(0)))
    strict = not args.no_strict
    if args.backbone_pth:
        from . import backbone as backbone_mod
        # The advertised zero-JSON path: the dag naming scheme is
        # deterministic, so the full 267-entry rename is generated
        # (backbone.ferplus_dag_rename) instead of hand-written.
        # resolve_torch_names is shared with --verify below so the
        # parity gate forwards exactly the tensors being converted.
        sd, how = backbone_mod.resolve_torch_names(
            backbone_sd, json_map(args.backbone_rename))
        if how == "dag":
            report["backbone_dag_rename"] = "auto"
            print("detected resnet50_ferplus_dag naming; applied the "
                  "built-in rename map", file=sys.stderr)
        variables["backbone"] = backbone_mod.load_torch_state_dict(
            sd, strict=strict)
        report["backbone_tensors"] = len(
            jax.tree_util.tree_leaves(variables["backbone"]))
    if args.temporal_pth:
        sd = checkpoints.load_pth(args.temporal_pth)
        overlay = checkpoints.load_temporal_state_dict(
            sd, prefix_map=json_map(args.temporal_prefix_map),
            spec=config.temporal, phase_size=config.phase.phase_size,
            strict=strict)

        def prune(over, base, path=""):
            """Drop overlay subtrees the target config has no params
            for (e.g. the inactive stream of a --streams ablation) —
            merging them would carry dangling tensors into the
            checkpoint. Shape mismatches against the config's tree are
            collected (strict: error; --no-strict: dropped) — e.g. a
            full two-stream checkpoint's fusion kernel is [2H, F] but a
            single-stream model's is [H, F].
            Returns (pruned, dropped_count, mismatches)."""
            dropped, mism = 0, []
            out = {}
            for k, v in over.items():
                p = f"{path}/{k}" if path else k
                if k not in base:
                    dropped += len(jax.tree_util.tree_leaves(v))
                elif isinstance(v, dict) and isinstance(base[k], dict):
                    out[k], d, m = prune(v, base[k], p)
                    dropped += d
                    mism += m
                elif isinstance(v, dict) != isinstance(base[k], dict):
                    def desc(x):
                        return ("subtree" if isinstance(x, dict)
                                else f"tensor {x.shape}")
                    mism.append(f"{p}: checkpoint {desc(v)} vs config "
                                f"{desc(base[k])}")
                    dropped += len(jax.tree_util.tree_leaves(v))
                elif v.shape != base[k].shape:
                    mism.append(f"{p}: checkpoint {v.shape} vs config "
                                f"{base[k].shape}")
                    dropped += 1
                else:
                    out[k] = v
            return out, dropped, mism

        dropped, mismatches = 0, []
        for col in list(overlay):
            overlay[col], d, m = prune(overlay[col],
                                       variables["temporal"].get(col, {}))
            dropped += d
            mismatches += m
        if mismatches and strict:
            raise SystemExit(
                "tensor shapes incompatible with this config (pass "
                "--no-strict to drop them): " + "; ".join(mismatches))
        variables["temporal"] = checkpoints.merge_variables(
            variables["temporal"], overlay)
        report["temporal_tensors"] = len(
            jax.tree_util.tree_leaves(overlay))
        if dropped:
            report["temporal_dropped_for_config"] = dropped
    if args.verify:
        # Forward the SOURCE tensors under torch-CPU (graph twins in
        # torch_ref.py, consuming source layouts directly) vs the
        # converted Flax model on a fixed input; fail BEFORE writing a
        # checkpoint if they disagree. This is the one-command parity
        # gate for the day real assets land (SURVEY.md §0 verification
        # protocol; VERDICT round-3 missing item 1). Requires a full
        # (strict-convertible) checkpoint for this config — tensors
        # dropped under --no-strict would diverge by construction.
        import functools
        import jax.numpy as jnp
        import numpy as np
        from . import torch_ref
        rng = np.random.default_rng(0)
        tol = args.verify_tol
        report["verify"] = {}

        def check(name, got, want):
            scale = float(np.abs(want).max()) + 1e-12
            diff = float(np.abs(np.asarray(got) - want).max())
            report["verify"][name] = {
                "max_abs_diff": diff, "scale": round(scale, 6),
                "rel": diff / scale}
            if diff > tol * scale:
                raise SystemExit(
                    f"convert --verify FAILED on {name}: max |delta| "
                    f"{diff:.3e} vs output scale {scale:.3e} "
                    f"(> {tol:.1e} relative). The converted model does "
                    f"NOT match the source .pth forward; no checkpoint "
                    f"was written.")

        if args.backbone_pth:
            # The torchvision-named view of the SOURCE tensors, via the
            # same shared helper as the import above — one precedence.
            tv_sd, _how = backbone_mod.resolve_torch_names(
                backbone_sd, json_map(args.backbone_rename))
            s = config.backbone.input_size
            imgs = rng.uniform(-120.0, 120.0, (2, s, s, 3)).astype(
                np.float32)
            emb_t, log_t = torch_ref.backbone_forward(tv_sd, imgs)
            emb_j, log_j = jax.jit(model.backbone.apply)(
                variables["backbone"], jnp.asarray(imgs))
            check("backbone_embeddings", emb_j, emb_t)
            check("backbone_logits", log_j, log_t)
        if args.temporal_pth:
            spec = config.temporal
            b, t = 2, 4
            ph = None
            if spec.streams in ("both", "micro"):
                ph = rng.standard_normal(
                    (b, t - 1, config.num_phase, config.phase.phase_size,
                     config.phase.phase_size)).astype(np.float32)
            ft = None
            if spec.streams in ("both", "macro"):
                ft = rng.standard_normal(
                    (b, t, config.backbone.feature_dim)).astype(
                    np.float32)
            want = torch_ref.temporal_forward(
                checkpoints.load_pth(args.temporal_pth), spec, ph, ft,
                num_frames=t)
            got, _carries = jax.jit(functools.partial(
                model.temporal.apply, num_frames=t))(
                variables["temporal"],
                None if ph is None else jnp.asarray(ph),
                None if ft is None else jnp.asarray(ft))
            check("temporal_outputs", got, want)
        print(json.dumps({"verify": report["verify"]}), file=sys.stderr)
    state, _ = train.create_train_state(model, jax.random.PRNGKey(0),
                                        variables=variables)
    out = checkpoints.save(args.out, state, step=0)
    if meta and ("mean" in meta or "channel_order" in meta):
        checkpoints.save_backbone_meta(args.out,
                                       config.backbone.mean_rgb,
                                       config.backbone.channel_order)
    print(json.dumps({**report, "out": out}))
    return 0


def cmd_serve(args) -> int:
    """Long-running JSON-lines serving daemon (see mimamo_tpu/serve.py).

    Keeps the loaded weights and every compiled program warm across an
    unbounded request sequence — the serving counterpart of the
    reference's one-script-per-video demo (SURVEY.md §3.1).
    """
    _setup_backend(args)
    import numpy as np
    from . import serve
    server = serve.Server(
        config=_config(args), checkpoint_dir=args.ckpt,
        capacity=args.capacity, chunk=args.chunk,
        stream_dtype=np.uint8 if args.uint8_streams else np.float32,
        warmup=not args.no_warmup, allowed_root=args.allowed_root)
    print(json.dumps({"ready": True, "capacity": args.capacity,
                      "chunk": args.chunk}), flush=True)
    serve.run(server)
    return 0


def cmd_bench(args) -> int:
    import subprocess
    # bench.py only parameterizes a subset of the common knobs; a knob
    # it cannot forward must not be silently ignored (the JSON line
    # would claim a config that wasn't benchmarked — round-4 review
    # finding). Defaults come from _add_common itself, not a hardcoded
    # copy, so changing a default there can't silently break the guard
    # (round-5 advisor finding).
    ref = argparse.ArgumentParser()
    _add_common(ref)
    unsupported = ("stride", "crop_size", "pyramid_height",
                   "orientations", "phase_size", "snippet_len",
                   "gru_layers")
    offending = [k for k in unsupported
                 if getattr(args, k) != ref.get_default(k)]
    if offending:
        raise SystemExit(
            "bench.py does not parameterize: "
            + ", ".join("--" + k.replace("_", "-") for k in offending)
            + " (run bench.py variants or bench/stages.py directly)")
    cmd = [sys.executable, "bench.py", "--dtype", args.dtype,
           "--clip-len", str(args.clip_len),
           "--backbone-size", str(args.backbone_size),
           "--streams", args.streams,
           "--appearance-stride", str(args.appearance_stride),
           "--stem-mode", args.stem_mode,
           "--fft-mode", args.fft_mode]
    if args.use_pallas:
        cmd.append("--use-pallas")
    if args.cpu:
        cmd.append("--cpu")
    return subprocess.call(cmd)


def main(argv: Optional[list] = None) -> int:
    ap = argparse.ArgumentParser(prog="mimamo_tpu",
                                 description=__doc__.splitlines()[0])
    sub = ap.add_subparsers(dest="cmd", required=True)

    p = sub.add_parser("predict", help="video -> per-frame (v, a) CSV")
    p.add_argument("--video", default=None)
    p.add_argument("--crops", default=None,
                   help="predict from PRECOMPUTED aligned crops "
                        "instead of a video: a packed [T, S, S, 3] "
                        ".npy (cli extract output) or a per-frame "
                        "image dir (OpenFace cropped_aligned style) — "
                        "the reference's two-step workflow")
    p.add_argument("--out", default=None, help="output CSV path")
    p.add_argument("--boxes", default=None, help="precomputed boxes .npy")
    p.add_argument("--ckpt", default=None, help="orbax checkpoint dir")
    p.add_argument("--max-frames", type=int, default=None)
    p.add_argument("--align", action="store_true",
                   help="similarity-align crops from landmarks "
                        "(OpenFace-style) instead of box crops; uses "
                        "<video>.landmarks.npy or <video>.openface.csv "
                        "when present, else the built-in Haar eye "
                        "tracker")
    p.add_argument("--landmarks", default=None,
                   help="precomputed landmarks: .npy ([T, 2, 2] eye "
                        "points or [T, 68, 2] dense, (y, x) source "
                        "pixels) or a raw OpenFace FeatureExtraction "
                        ".csv; implies --align")
    p.add_argument("--smooth", type=int, default=1,
                   help="odd moving-average window over the output "
                        "series (reference postprocess; 1 = off)")
    p.add_argument("--emotions", action="store_true",
                   help="also emit per-frame FER+ emotion "
                        "probabilities (8 classes) from the backbone's "
                        "classifier head — free with converted "
                        "resnet50_ferplus_dag weights")
    p.add_argument("--streaming-threshold", type=int, default=4096,
                   help="frames past which the video switches to GRU "
                        "carry streaming (O(threshold) crop memory "
                        "regardless of length; slightly different "
                        "series semantics than window overlap-"
                        "averaging — see api.MimamoAPI.predict); "
                        "-1 = never stream")
    _add_common(p)
    p.set_defaults(fn=cmd_predict)

    p = sub.add_parser("extract",
                       help="video -> aligned crops + 2048-d features")
    p.add_argument("--video", required=True)
    p.add_argument("--out-dir", required=True)
    p.add_argument("--boxes", default=None)
    p.add_argument("--align", action="store_true",
                   help="write similarity-aligned crops (OpenFace role)")
    p.add_argument("--landmarks", default=None,
                   help="precomputed landmark .npy ([T, 2, 2] eyes or "
                        "[T, 68, 2] dense) or OpenFace .csv; "
                        "implies --align")
    p.add_argument("--ckpt", default=None,
                   help="orbax checkpoint for backbone weights (without "
                        "it, features come from random init)")
    p.add_argument("--max-frames", type=int, default=None)
    _add_common(p)
    p.set_defaults(fn=cmd_extract)

    p = sub.add_parser("train", help="train on OMG / Aff-Wild2 layout")
    p.add_argument("--dataset", choices=["omg", "affwild2"], required=True)
    p.add_argument("--root", required=True)
    p.add_argument("--manifest", default=None)
    p.add_argument("--ckpt", default=None)
    p.add_argument("--log", default=None, help="metrics JSONL path")
    p.add_argument("--lr", type=float, default=1e-4)
    p.add_argument("--lr-schedule", default="constant",
                   choices=["constant", "cosine"],
                   help="cosine = linear warmup + cosine decay over the "
                        "whole run")
    p.add_argument("--warmup-steps", type=int, default=0)
    p.add_argument("--loss", choices=["ccc", "ccc+mse"], default="ccc",
                   help="training loss: 1-CCC, optionally + an MSE "
                        "term weighted by --mse-weight (the reference "
                        "exposes the same choice)")
    p.add_argument("--mse-weight", type=float, default=0.0,
                   help="MSE term weight; > 0 implies --loss ccc+mse")
    p.add_argument("--weight-decay", type=float, default=0.0,
                   help="decoupled AdamW weight decay (0 = plain Adam)")
    p.add_argument("--augment", action="store_true",
                   help="on-device per-clip random horizontal flip "
                        "(online appearance stream only)")
    p.add_argument("--brightness-jitter", type=float, default=0.0,
                   help="per-clip brightness scale jitter j: [1-j, 1+j]")
    p.add_argument("--finetune-backbone", action="store_true",
                   help="unfreeze the ResNet (train-mode BN, remat'd "
                        "backward); default keeps it frozen like the "
                        "reference")
    p.add_argument("--batch", type=int, default=4)
    p.add_argument("--epochs", type=int, default=1)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--resume", action="store_true")
    p.add_argument("--data-parallel", action="store_true",
                   help="shard batches over all devices")
    _add_multihost(p, "Implies per-process data sharding: each host "
                      "draws batch/P clips from a disjoint slice")
    p.add_argument("--eval-root", default=None,
                   help="validation dataset root (enables best-val ckpt)")
    p.add_argument("--eval-manifest", default=None)
    p.add_argument("--eval-every", type=int, default=1,
                   help="epochs between validations")
    p.add_argument("--debug-nans", action="store_true",
                   help="enable jax_debug_nans (slow; diagnosis runs)")
    p.add_argument("--loss-axis", choices=["time", "batch"], default=None,
                   help="CCC axis (default: batch for omg, time for "
                        "affwild2)")
    p.add_argument("--tensorboard", default=None,
                   help="TensorBoard log dir (optional)")
    _add_common(p)
    p.set_defaults(fn=cmd_train)

    p = sub.add_parser("eval", help="CCC eval per dataset protocol")
    p.add_argument("--dataset", choices=["omg", "affwild2"], required=True)
    p.add_argument("--root", required=True)
    p.add_argument("--manifest", default=None)
    p.add_argument("--ckpt", default=None)
    p.add_argument("--batch-streams", type=int, default=8,
                   help="sequences advanced together per device "
                        "dispatch (batch-of-streams eval)")
    p.add_argument("--data-parallel", action="store_true",
                   help="shard the batch-of-streams slot axis over "
                        "all devices (batch-streams must be a "
                        "multiple of the device count)")
    _add_multihost(p, "Each process streams a disjoint sequence slice "
                      "on its own devices; the CCC reduces exact "
                      "moment sums across hosts, so every process "
                      "prints the identical global metrics")
    _add_common(p)
    p.set_defaults(fn=cmd_eval)

    p = sub.add_parser(
        "predict-corpus",
        help="checkpointed batched inference over a video corpus")
    p.add_argument("--videos", required=True,
                   help="glob of video files, e.g. 'corpus/*.mp4'")
    p.add_argument("--out-dir", required=True,
                   help="CSV + resume-manifest directory")
    p.add_argument("--ckpt", default=None)
    p.add_argument("--batch", type=int, default=8, help="clips per step")
    p.add_argument("--threads", type=int, default=4,
                   help="native loader threads")
    p.add_argument("--no-native", action="store_true",
                   help="force the pure-Python loader")
    p.add_argument("--data-parallel", action="store_true")
    p.add_argument("--smooth", type=int, default=1,
                   help="odd moving-average window over each output "
                        "series (1 = off)")
    p.add_argument("--align", action="store_true",
                   help="similarity-align crops — same framing as "
                        "predict --align. Landmark sidecars "
                        "(<video>.landmarks.npy / .openface.csv) route "
                        "through the Python loader for exact parity; "
                        "without sidecars the C++ loader aligns from "
                        "its own eye tracker at full threaded "
                        "throughput")
    _add_multihost(p, "Each process works a disjoint round-robin video "
                      "slice and appends to its own manifest in the "
                      "shared --out-dir (BASELINE.json config 5: "
                      "pod-slice corpus throughput)")
    _add_common(p)
    p.set_defaults(fn=cmd_predict_corpus)

    p = sub.add_parser(
        "convert",
        help="reference .pth checkpoint(s) -> orbax checkpoint dir")
    p.add_argument("--backbone-pth", default=None,
                   help="ResNet-50 FER+ state_dict (.pth)")
    p.add_argument("--backbone-rename", default=None,
                   help="JSON {source: canonical-torchvision} name map "
                        "for non-torchvision backbone schemas")
    p.add_argument("--temporal-pth", default=None,
                   help="two-stream (micro CNN + GRUs + heads) .pth")
    p.add_argument("--temporal-prefix-map", default=None,
                   help="JSON {source-prefix: canonical-prefix} map "
                        "(see docs/WEIGHTS.md for the canonical schema)")
    p.add_argument("--out", required=True, help="orbax checkpoint dir")
    p.add_argument("--no-strict", action="store_true",
                   help="skip unmapped tensors instead of erroring")
    p.add_argument("--verify", action="store_true",
                   help="forward the SOURCE .pth under torch-CPU and "
                        "the converted Flax model on a fixed input; "
                        "print max |delta| per output and fail (before "
                        "writing anything) if they disagree — the "
                        "one-command parity gate for real assets")
    p.add_argument("--verify-tol", type=float, default=1e-3,
                   help="relative tolerance for --verify (max |delta| "
                        "over output scale; default 1e-3 covers "
                        "cross-framework f32 conv-stack drift)")
    _add_common(p)
    p.set_defaults(fn=cmd_convert)

    p = sub.add_parser(
        "serve", help="JSON-lines serving daemon over stdin/stdout")
    p.add_argument("--ckpt", default=None, help="orbax checkpoint dir")
    p.add_argument("--capacity", type=int, default=8,
                   help="concurrent stream slots")
    p.add_argument("--chunk", type=int, default=16,
                   help="frames per stream_feed chunk")
    p.add_argument("--uint8-streams", action="store_true",
                   help="ship stream chunks as uint8 (4x less transfer)")
    p.add_argument("--no-warmup", action="store_true",
                   help="skip compiling the stream program at startup")
    p.add_argument("--allowed-root", default=None,
                   help="restrict every request path (video/crops/"
                        "boxes/landmarks/out_csv) to resolve under "
                        "this directory — REQUIRED if the protocol is "
                        "exposed to untrusted clients (default: fully "
                        "trusted local client, no restriction)")
    _add_common(p)
    p.set_defaults(fn=cmd_serve)

    p = sub.add_parser("bench", help="throughput benchmark (bench.py)")
    _add_common(p)
    p.set_defaults(fn=cmd_bench)

    args = ap.parse_args(argv)
    return args.fn(args)


if __name__ == "__main__":
    sys.exit(main())
