"""Test configuration.

Tests run on CPU with a virtual 8-device mesh so sharding/collective code
paths compile and execute without TPU hardware (the driver benches on the
real chip). The environment pins JAX_PLATFORMS=axon (TPU tunnel) in a way
that shell overrides don't reach, so we force the platform through
jax.config before any backend initialization.
"""
import os
import sys

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

if not os.environ.get("CURDLEPROOFS_TEST_TPU"):
    jax.config.update("jax_platforms", "cpu")
# else: run on the environment's real backend (the axon TPU tunnel) — used
# by the `-m tpu` hardware subset, whose captured log is committed as
# TPU_TESTLOG.txt (on-hardware correctness evidence beyond bench.py's
# single spot check)

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
