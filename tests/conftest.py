"""Test configuration: run everything on CPU with 8 virtual devices.

SURVEY.md §4 item 4 — the JAX idiom for distributed tests without a
cluster: fake an 8-device mesh on the host CPU so pjit/shard_map paths are
exercised and compared against single-device runs.

Note: this machine's ``sitecustomize`` pins ``JAX_PLATFORMS=axon`` (the TPU
tunnel plugin), so the env var alone is not enough — ``jax.config.update``
is the override that sticks.
"""

import os

_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

# Persistent XLA compilation cache: the suite's wall time is dominated by
# CPU compiles of the full pipeline (~30-60s each); caching them across
# runs cuts repeat suite runs drastically (CLAUDE.md test budget).
#
# The directory is keyed by a CPU-feature fingerprint: this machine can
# be migrated to a different host generation between runs, and XLA:CPU
# then LOADS the stale AOT executables anyway ("machine type doesn't
# match ... could lead to SIGILL" spam) — producing ~1e-4 numeric drift
# between cached and freshly-compiled programs of the same function
# (observed 2026-08-17). A per-machine cache dir costs one cold compile
# after a migration instead.


def _cpu_cache_tag() -> str:
    import hashlib
    try:
        with open("/proc/cpuinfo") as f:
            line = next(l for l in f.read().splitlines()
                        if l.startswith("flags"))
    except (OSError, StopIteration):  # pragma: no cover
        import platform
        line = platform.processor()
    return hashlib.md5(line.encode()).hexdigest()[:10]


CACHE_DIR = f"/tmp/jax_cache_mimamo_tests_{_cpu_cache_tag()}"
# CLI-subprocess tests (which don't run conftest) read this env var.
os.environ["MIMAMO_TEST_CACHE"] = CACHE_DIR
jax.config.update("jax_compilation_cache_dir", CACHE_DIR)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
