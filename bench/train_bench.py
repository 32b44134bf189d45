"""Training-step throughput on the attached accelerator.

bench.py covers inference; this times the full jitted train step
(forward incl. in-graph pyramid, CCC loss, backward, optax update,
donated state) at parity shapes — the number a user sizing a training
run needs. Frozen backbone by default (the reference's regime);
--finetune measures the remat'd full-backprop variant.

Tunnel-safe protocol: salted clips defeat the execution cache, the
state is threaded through the loop (real dependency chain), and
metrics are fetched one step behind (depth-2).

    python bench/train_bench.py [--batch 8] [--clip-len 48]
    [--finetune] [--cached-features] [--cpu]
"""

import argparse
import json
import sys
import time

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import numpy as np


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--clip-len", type=int, default=48)
    ap.add_argument("--iters", type=int, default=8)
    ap.add_argument("--dtype", default="bfloat16")
    ap.add_argument("--finetune", action="store_true")
    ap.add_argument("--cached-features", action="store_true",
                    help="train from cached embeddings (the "
                         "reference's actual workflow: no backbone "
                         "forward at all)")
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()

    import jax
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from mimamo_tpu import train
    from mimamo_tpu.config import (BackboneSpec, ClipSpec, MimamoConfig,
                                   TrainSpec)
    from mimamo_tpu.runner import Mimamo

    cfg = MimamoConfig(
        backbone=BackboneSpec(dtype=args.dtype),
        clip=ClipSpec(clip_len=args.clip_len,
                      stride=args.clip_len // 2),
        train=TrainSpec(freeze_backbone=not args.finetune,
                        batch_size=args.batch))
    model = Mimamo(cfg)
    # jitted init: eager init is minutes of remote compile (CLAUDE.md)
    variables = jax.jit(model.init_variables)(jax.random.PRNGKey(0))
    state, tx = train.create_train_state(model, jax.random.PRNGKey(0),
                                         variables=variables)
    step = train.make_train_step(model, tx)

    b, t, s = args.batch, args.clip_len, cfg.clip.crop_size
    rng = np.random.default_rng(0)
    batch = {
        "clips": jnp.asarray(rng.uniform(
            0, 255, (b, t, s, s, 3)).astype(np.float32)),
        "labels": jnp.asarray(np.tanh(
            rng.standard_normal((b, t, 2))).astype(np.float32)),
        "mask": jnp.ones((b, t), jnp.float32),
    }
    if args.cached_features:
        batch["features"] = jnp.asarray(rng.standard_normal(
            (b, t, cfg.backbone.feature_dim)).astype(np.float32))

    # Salt IN-GRAPH: new pixels every step (the tunnel caches identical
    # args) without an eager device add per iteration — that add was a
    # third outstanding execution next to the depth-2 step pipeline
    # (round-4 review finding). Donation moves to the outer jit.
    salted_step = jax.jit(
        lambda st, bt, salt: step(st, {**bt, "clips":
                                       bt["clips"] + salt}),
        donate_argnums=0)

    state, metrics = salted_step(state, batch, jnp.float32(-1))  # compile
    float(metrics["loss"])
    t0 = time.perf_counter()
    pending = None
    for i in range(args.iters):
        state, metrics = salted_step(state, batch, jnp.float32(i))
        if pending is not None:
            float(pending["loss"])
        pending = metrics
    float(pending["loss"])
    dt = (time.perf_counter() - t0) / args.iters
    mode = ("finetune" if args.finetune else
            "cached-features" if args.cached_features else
            "frozen-backbone")
    print(json.dumps({
        "metric": f"train_step_{mode}",
        "sec_per_step": round(dt, 4),
        "clips_per_sec": round(b / dt, 1),
        "frames_per_sec": round(b * t / dt, 1)}))
    return 0


if __name__ == "__main__":
    sys.exit(main())
