"""Probe the tunneled TPU backend: exit 0 iff a trivial jit executes.

The axon tunnel can wedge server-side (device enumeration works, launches
hang) — run this under `timeout` before any TPU measurement session.
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from baby_plonk_tpu.utils import jaxcache

jaxcache.enable()
import jax
import jax.numpy as jnp
import numpy as np

np.asarray(jax.jit(lambda a: a + 1)(jnp.zeros((8,), jnp.uint32))[:1])
print("tpu alive:", jax.devices())
