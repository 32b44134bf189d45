"""TPU jit wrapper with lazy per-platform compiler options.

Infrastructure for per-call XLA compiler options on the TPU path, plus
the measured verdict on the one candidate found so far (BASELINE.md
2026-08-17, bench/xla_flag_experiments.py + bench.py A/B):

  ``xla_tpu_scoped_vmem_limit_kib=65536`` (4x the default fusion
  budget) measured **+5%** in the only controlled comparison (both
  variants interleaved in one process, 6 chained applications per
  program, no per-step host fetch: 41.77 -> 39.77 ms) but is NOT
  resolvable above the tunnel's +-3% run-to-run noise under bench.py's
  one-dispatch-one-fetch serving protocol (8 runs, 9,026-9,582 f/s,
  variants interleaved through the band). Default here: NO extra
  options, keeping the recorded bench program byte-identical to the
  proven round-2 one; the knob stays available per call
  (``tuned_jit(fn, tpu_options={...})``) or globally
  (:data:`TPU_COMPILER_OPTIONS`) for chained-regime deployments.

Round-5 decision (VERDICT r4 directive 8): the empty default is
FINAL for this codebase. No shipped entry point runs the chained
regime — serve, predict, corpus, and streaming all dispatch one
program application per host round-trip, the regime where the option
was measured unresolvable (8 interleaved runs, 9,026–9,582 f/s). A
deployment that chains >=~6 applications per dispatch should set the
global; docs/SERVING.md carries the user-facing row.

Two constraints force the lazy shape of this wrapper:
  * ``compiler_options`` must only reach the TPU compiler — CPU/GPU
    reject unknown TPU options; and
  * the backend cannot be probed at decoration (import) time, because
    the CLI may still switch platforms (``--cpu`` flips jax_platforms
    after import but before first backend use).
So the real ``jax.jit`` is built on the first call, when the platform
is known (``pyramid.on_default_tpu``).
"""

from __future__ import annotations

import functools

import jax

# Default: no extra options (measured slower on the per-dispatch-fetch
# serving pattern — see module docstring). Set e.g.
# {"xla_tpu_scoped_vmem_limit_kib": "65536"} for chained multi-step
# programs.
TPU_COMPILER_OPTIONS: dict = {}


def tuned_jit(fn=None, tpu_options=None, **jit_kwargs):
    """``jax.jit`` that applies :data:`TPU_COMPILER_OPTIONS` on TPU.

    Usable as ``@tuned_jit``, ``@functools.partial(tuned_jit,
    static_argnums=0)``, or ``tuned_jit(fn, donate_argnums=0)``.
    """
    if fn is None:
        return lambda f: tuned_jit(f, tpu_options=tpu_options,
                                   **jit_kwargs)
    cache = {}

    @functools.wraps(fn)
    def wrapper(*args, **kwargs):
        if "jitted" not in cache:
            from .pyramid import on_default_tpu
            # tpu_options=None inherits the module-global options;
            # an explicit {} opts OUT (an `or` chain would treat the
            # empty dict as falsy and silently re-apply the globals —
            # round-4 review finding).
            opts = (tpu_options if tpu_options is not None
                    else TPU_COMPILER_OPTIONS)
            opts = (opts or None) if on_default_tpu() else None
            cache["jitted"] = jax.jit(fn, compiler_options=opts,
                                      **jit_kwargs)
        return cache["jitted"](*args, **kwargs)

    return wrapper
