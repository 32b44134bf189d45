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
jax.config.update("jax_compilation_cache_dir",
                  "/tmp/jax_cache_mimamo_tests")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
