"""Root conftest: force an 8-device virtual CPU mesh for all tests.

The environment's axon sitecustomize pins jax_platforms to "axon,cpu" via
jax.config at interpreter start, so the env var alone is not enough — we
override the config again here, before any backend initializes. Set
PARCELS_TPU_TEST_DEVICE=tpu to run the suite against real hardware.
"""

import os
import sys

if os.environ.get("PARCELS_TPU_TEST_DEVICE", "cpu") == "cpu":
    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()
    import jax

    jax.config.update("jax_platforms", "cpu")
    # Persistent compilation cache: the engine's traced while-loop programs
    # are identical across test runs, so this cuts suite time massively.
    os.makedirs("/tmp/jax_cache", exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

sys.path.insert(0, os.path.dirname(__file__))
