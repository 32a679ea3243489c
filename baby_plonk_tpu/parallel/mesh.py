"""Device mesh helpers for the distributed prover.

The reference is single-address-space with zero parallelism machinery
(SURVEY.md §2.3); here scaling is first-class: work is sharded over a 1-D
``jax.sharding.Mesh`` ("shard" axis) and recombined with XLA collectives
riding ICI (all_gather for point partials, all_to_all for NTT stage
exchange). Multi-host extends the same mesh over DCN via
``jax.distributed`` — the code below is topology-agnostic.
"""
from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh

AXIS = "shard"


def make_mesh(n_devices: int | None = None) -> Mesh:
    devs = jax.devices()
    if n_devices is not None:
        assert len(devs) >= n_devices, f"need {n_devices} devices, have {len(devs)}"
        devs = devs[:n_devices]
    return Mesh(np.array(devs), (AXIS,))
