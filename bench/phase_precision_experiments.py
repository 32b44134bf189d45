"""DFT-matmul precision experiments for the micro-motion (phase) stage.

The pyramid's DFT-as-matmul path (pyramid._mm2) historically ran every
complex GEMM at ``Precision.HIGHEST`` — 6 error-compensated bf16 MXU
passes per real matmul. Two candidate savings, both numerics-gated
here ON HARDWARE against the float64 NumPy oracle
(tests/oracles/pyramid_np.py) at the flagship 112x112 / S=3 / K=4 /
48-resize shape:

  1. ``Precision.HIGH`` (3-pass) for all DFT matmuls — half the MXU
     work; expected ~f32-equivalent accuracy, far inside the 1e-3
     phase-map parity budget (BASELINE.json).
  2. Real-input forward split (pyramid._mm2): ``A @ x`` with real x as
     two real GEMMs instead of a zero-imag complex product — exact
     (dropped terms are multiply-by-zero), 2 instead of 4 passes on the
     forward row stage.

Prints, as JSON lines:
  * parity: max |dphi - oracle| for highest/high (and highest-vs-high
    device delta), flagship shape;
  * timing: phase-stage ms/step for (precision x split) variants,
    chained-salted-fetch protocol ([8, 48, 112, 112] grayscale).
"""

import argparse
import json
import time

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--seq", type=int, default=48)
    ap.add_argument("--iters", type=int, default=4)
    ap.add_argument("--chain", type=int, default=6)
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--parity-only", action="store_true")
    args = ap.parse_args()

    import jax
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import os
    import sys
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    sys.path.insert(0, repo)
    sys.path.insert(0, os.path.join(repo, "tests"))
    import jax.numpy as jnp

    from mimamo_tpu import phase as phase_mod
    from mimamo_tpu import pyramid as pyr_mod
    from mimamo_tpu.config import PhaseSpec, PyramidSpec
    from oracles import pyramid_np

    ph = PhaseSpec()
    specs = {p: PyramidSpec(fft_mode="matmul", dft_precision=p)
             for p in ("highest", "high")}

    # ---- parity vs float64 oracle (flagship shape) -----------------------
    rng = np.random.default_rng(11)
    frames = (rng.standard_normal((3, 112, 112)).astype(np.float32)
              * 40 + 120)
    want = pyramid_np.phase_diff_stack(frames, height=3, nbands=4,
                                       phase_size=48)
    got = {}
    for p, spec in specs.items():
        fn = jax.jit(lambda f, _s=spec: phase_mod.micro_motion_features(
            f, _s, ph))
        got[p] = np.asarray(fn(jnp.asarray(frames[None])))[0]
        err = np.abs(got[p] - want).max()
        print(json.dumps({"parity": p, "max_abs_err_vs_f64_oracle":
                          float(err), "budget": 1e-3}), flush=True)
    print(json.dumps({"parity": "highest_vs_high_device_delta",
                      "max_abs": float(np.abs(got["highest"] -
                                              got["high"]).max())}),
          flush=True)
    if args.parity_only:
        return

    # ---- timing (chained-salted-fetch, stages.py conventions) ------------
    b, t = args.batch, args.seq
    gray = jnp.asarray(rng.uniform(0, 255, (b, t, 112, 112))
                       .astype(np.float32))
    variants = []
    for p in ("highest", "high"):
        for split in (True, False):
            variants.append((f"{p}_split{int(split)}", specs[p], split))

    from _timing import time_chained
    for name, spec, split in variants:
        pyr_mod._SPLIT_REAL_FORWARD = split
        kch = args.chain
        jitted = jax.jit(lambda salt, g, _s=spec: sum(
            jnp.sum(phase_mod.micro_motion_features(
                g + salt + 17.0 * i, _s, ph))
            for i in range(kch)))
        dt = time_chained(jitted, (gray,), args.iters, kch)
        print(json.dumps({"phase": name,
                          "ms_per_step": round(dt * 1e3, 3)}), flush=True)
    pyr_mod._SPLIT_REAL_FORWARD = True


if __name__ == "__main__":
    main()
