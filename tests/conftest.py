"""Test harness configuration.

Forces an 8-device virtual CPU mesh so multi-chip sharding tests run without
TPU hardware (the driver separately dry-runs the real multi-chip path).
Must run before the first ``import jax`` anywhere in the test process.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()
os.environ.setdefault("JAX_ENABLE_X64", "0")

# The axon TPU plugin re-sets JAX_PLATFORMS at registration time; the config
# knob takes precedence over the env var, so pin it explicitly.
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

# Persistent compilation cache: many test files compile the same tiny train
# step / forward program; within one suite run (and across re-runs on the
# same box) identical HLO hits the cache instead of re-invoking XLA.  This
# is the difference between the suite finishing in minutes vs hours on a
# 1-core box.  GLORIA_TEST_NO_COMPILE_CACHE=1 disables it (debug knob).
if not os.environ.get("GLORIA_TEST_NO_COMPILE_CACHE"):
    jax.config.update("jax_compilation_cache_dir", "/tmp/gloria_test_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
