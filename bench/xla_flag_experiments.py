"""XLA compiler-option experiments on the parity conv stack.

VERDICT round 2 weak item 3 asked for 2-3 scheduler/layout flag
experiments alongside the roofline table (bench/roofline.py). Env
``XLA_FLAGS`` may not reach this environment's remote (tunnel-side)
compiler, so options go through ``jax.jit(compiler_options=...)``,
which serializes into the PJRT compile request. Unknown/rejected
options are caught and recorded as such.

    python bench/xla_flag_experiments.py [--iters 6] [--chain 6]
"""

import argparse
import json
import sys
import time

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import numpy as np

EXPERIMENTS = [
    ("baseline", {}),
    # Scoped VMEM bounds how much on-chip memory fusions may claim;
    # larger values let bigger producer chains fuse (fewer HBM trips),
    # smaller values force splits. Default on v5e is ~16 MiB.
    ("scoped_vmem_64m", {"xla_tpu_scoped_vmem_limit_kib": "65536"}),
    ("scoped_vmem_8m", {"xla_tpu_scoped_vmem_limit_kib": "8192"}),
    # The latency-hiding scheduler reorders for async overlap; on a
    # single chip with no collectives it should be neutral — verify.
    ("no_latency_hiding_sched",
     {"xla_tpu_enable_latency_hiding_scheduler": "false"}),
]


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch-frames", type=int, default=384)
    ap.add_argument("--size", type=int, default=224)
    ap.add_argument("--iters", type=int, default=6)
    ap.add_argument("--chain", type=int, default=6)
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()

    import jax
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from mimamo_tpu.backbone import fold_batchnorm
    from mimamo_tpu.runner import Mimamo

    model = Mimamo()
    variables = jax.jit(model.init_variables)(jax.random.PRNGKey(0))
    fused = jax.jit(fold_batchnorm)(variables["backbone"])

    n, s, k = args.batch_frames, args.size, args.chain
    x = jax.jit(lambda: jax.random.normal(
        jax.random.PRNGKey(1), (n, s, s, 3),
        jnp.float32).astype(jnp.bfloat16))()

    def chained(salt, x):
        return sum(jnp.sum(model.backbone_fused.apply(
            fused, x + (salt + 17 * i).astype(x.dtype))[0])
            for i in range(k))

    from _timing import time_chained
    for name, opts in EXPERIMENTS:
        try:
            jitted = jax.jit(chained, compiler_options=opts or None)
            dt = time_chained(jitted, (x,), args.iters, k)
            print(json.dumps({"experiment": name, "ms": round(dt * 1e3, 2),
                              "frames_per_sec": round(n / dt, 1)}))
        except Exception as e:  # noqa: BLE001 — record rejected options
            print(json.dumps({"experiment": name,
                              "error": f"{type(e).__name__}: "
                                       f"{str(e)[:200]}"}))
    return 0


if __name__ == "__main__":
    sys.exit(main())
