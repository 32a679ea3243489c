"""Distributed MSM: points sharded across the mesh, partials combined
with an all-gather + on-device tree reduction.

TPU-native equivalent of parallelizing the reference's bucket loop
(msm.rs:76-118): every device runs the full-width bit-serial kernel on
its point shard (ops.msm), producing one projective partial; partials are
all-gathered over ICI (3 x 24 u32 words per device — negligible traffic)
and summed with log2(ndev) complete additions. Group addition is not a
ring ``psum``, hence gather+add rather than a plain reduction.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from ..ops import g1_vec, msm as dmsm_ops
from .mesh import AXIS


def _local_then_gather(px, py, pz, scalars):
    out = dmsm_ops._msm_kernel(px, py, pz, scalars)  # (24,) x3 local partial
    gathered = tuple(
        jax.lax.all_gather(c, AXIS, axis=0).T for c in out
    )  # (24, ndev)
    return g1_vec.tree_reduce(gathered)


@functools.partial(jax.jit, static_argnums=(4,))
def _msm_sharded(px, py, pz, scalars, mesh):
    fn = jax.shard_map(
        _local_then_gather,
        mesh=mesh,
        in_specs=(P(None, AXIS),) * 3 + (P(None, AXIS),),
        out_specs=(P(), P(), P()),
        check_vma=False,
    )
    return fn(px, py, pz, scalars)


def msm_sharded_arrays(points_mont, scalars_raw, mesh):
    """Device MSM over the mesh. n must be divisible by mesh size and the
    per-device shard a power of two (pad with zero scalars first)."""
    ndev = mesh.devices.size
    px, py, pz = points_mont
    n = px.shape[-1]
    shard = n // ndev
    assert shard * ndev == n and shard & (shard - 1) == 0, (
        f"n={n} must be ndev*2^k (ndev={ndev})"
    )
    return _msm_sharded(px, py, pz, scalars_raw, mesh)


def msm_sharded(points, scalars, mesh):
    """Host boundary: list[G1] x list[int] -> host G1, sharded over mesh.
    Pads n up to ndev * 2^k with zero scalars."""
    from ..fields import fr
    from ..ops import g1_vec as gv

    ndev = mesh.devices.size
    n = min(len(points), len(scalars))
    shard = 1
    while shard * ndev < n:
        shard <<= 1
    total = shard * ndev
    pts = list(points[:n]) + [points[0]] * (total - n)
    sc = [s % fr.Q for s in scalars[:n]] + [0] * (total - n)
    arr = gv.points_to_device(pts)
    sc_arr = jnp.asarray(dmsm_ops.FR_SPEC.pack_raw(sc))
    out = msm_sharded_arrays(arr, sc_arr, mesh)
    return gv.point_from_device(out)
