"""Shared tunnel-safe timing loop for the bench harnesses.

THE protocol (verified empirically on the axon TPU tunnel; CLAUDE.md):
  * the caller builds a jitted ``chained(salt, *inputs)`` program that
    applies the function-under-test ``k`` times with per-application
    salts (``salt + 17*i``) — distinct salts defeat both CSE inside
    the program and the tunnel's identical-arg execution cache, and
    chaining sheds the ~30 ms per-dispatch fetch floor;
  * one warm call (NEGATIVE salt, disjoint from the timed 0..iters-1
    range) compiles + first-executes;
  * the timed loop runs a DEPTH-2 pipeline: dispatch iteration j,
    then block on iteration j-1's scalar — one execution in flight
    while one is fetched, never more (>2 outstanding wedges the
    tunnel for every subsequent process).

Every harness must use :func:`time_chained` rather than re-inlining
the loop, so a protocol fix lands everywhere at once and cross-file
ms/step numbers in BASELINE.md stay comparable (round-4 review
finding).
"""

import time

import numpy as np


def time_chained(jitted, inputs, iters, per_step):
    """Time ``jitted(salt, *inputs)`` -> scalar under the depth-2
    salted-pipeline protocol.

    Args:
      jitted: jit-compiled ``(salt, *inputs) -> scalar`` chained
        program (scalar output keeps the per-iteration fetch tiny).
      inputs: device-resident operands, passed through unchanged.
      iters: timed dispatches (each internally applies the chain).
      per_step: applications per dispatch (the chain length ``k``);
        the return value is seconds per single application.

    Returns:
      Seconds per application of the function under test.
    """
    # NEGATIVE warm salt: timed salts are 0..iters-1, so a positive warm
    # salt (e.g. 999) would collide for --iters >= 1000 and that step
    # would hit the tunnel's identical-arg execution cache (same bug
    # class bench.py fixed with negative warmup salts).
    float(jitted(np.float32(-1), *inputs))         # compile + warm
    t0 = time.perf_counter()
    pending = jitted(np.float32(0), *inputs)
    for j in range(1, iters):
        nxt = jitted(np.float32(j), *inputs)
        float(pending)
        pending = nxt
    float(pending)
    return (time.perf_counter() - t0) / (iters * per_step)
