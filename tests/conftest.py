"""Test harness config: force an 8-device CPU platform before any backend init.

This is the TPU-native analogue of the "fake backend" test rigs used by
distributed frameworks (SURVEY.md §4 item 3): every test runs on a simulated
8-device host-CPU platform so sharded code paths (mesh, pjit, collectives)
are exercised without TPU hardware.

Note: this environment's sitecustomize registers a TPU PJRT plugin and
force-sets ``jax_platforms="axon,cpu"`` in every interpreter, so the
``JAX_PLATFORMS`` env var alone is not enough — we must update the config
after importing jax but before any backend is initialized.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

# Persistent compilation cache: the suite is dominated by XLA compile time
# (sharded train chunks, checkpoint round-trips recompile identical programs
# run-to-run). Caching compiled executables under the repo's .pytest_cache
# makes re-runs several times faster without affecting test semantics.
_cache_dir = os.path.join(os.path.dirname(__file__), "..", ".pytest_cache", "jax_cache")
os.makedirs(_cache_dir, exist_ok=True)
jax.config.update("jax_compilation_cache_dir", os.path.abspath(_cache_dir))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
