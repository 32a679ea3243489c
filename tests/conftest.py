"""Test configuration: run JAX on a virtual 8-device CPU mesh.

Multi-chip TPU hardware is not available in CI; sharding tests validate
against 8 virtual CPU devices (the driver separately dry-run-compiles the
multi-chip path via __graft_entry__.dryrun_multichip).
"""
import os
import sys

# Force CPU: the session env may point JAX_PLATFORMS at a tunneled TPU
# (platform "axon") where every dispatch round-trips the tunnel and every
# compile goes through a remote compile service. The env-var route does
# not work here because a sitecustomize module imports jax at interpreter
# start (before conftest); use jax.config, which wins as long as no
# backend has been initialized yet.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)

# Persistent compile cache: the suite clears live executable caches
# between modules (memory pressure, below) — the disk cache makes the
# re-compiles near-free from the second run on.
from baby_plonk_tpu.utils import envfix, jaxcache  # noqa: E402

# 8-device SPMD executables exhaust the default vm.max_map_count mid-suite
# (LLVM mmap ENOMEM -> abort/segv); raise it or warn (utils/envfix.py)
envfix.ensure_map_count()
jaxcache.enable()

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


import pytest


@pytest.fixture(autouse=True, scope="module")
def _clear_jax_caches_between_modules():
    """Compiled executables accumulate across the suite and can exhaust
    memory (XLA CPU compile aborts); drop them after each test module."""
    yield
    import jax

    jax.clear_caches()
