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
from ..utils.expcache import ejit


def _local_then_gather(px, py, pz, scalars):
    out = dmsm_ops._msm_kernel(px, py, pz, scalars)  # (24,) x3 local partial
    gathered = tuple(
        jax.lax.all_gather(c, AXIS, axis=0).T for c in out
    )  # (24, ndev)
    return g1_vec.tree_reduce(gathered)


@ejit(static_argnums=(4,))
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


# ---------------------------------------------------------------------------
# sharded FIXED-BASE commits (subset-sum tables, ops/msm_fixed.py)
# ---------------------------------------------------------------------------


def _fb_build_local(px, py, pz):
    from ..ops import msm_fixed

    return msm_fixed._build_tables(px, py, pz)


@ejit(static_argnums=(3,))
def build_tables_sharded(px, py, pz, mesh):
    """Build the per-group subset-sum tables with the SRS sharded over the
    mesh: each device builds (and later holds) only its own shard's tables
    — a D-way speedup of the one-time build AND a D-way split of the table
    HBM footprint (the 2^20-SRS tables are ~6.4 GB on one chip, ~0.8 GB
    per chip on eight). Shard size must be a multiple of 8 (the group)."""
    fn = jax.shard_map(
        _fb_build_local,
        mesh=mesh,
        in_specs=(P(None, AXIS),) * 3,
        out_specs=(P(None, AXIS, None), P(None, AXIS, None)),
        check_vma=False,
    )
    return fn(px, py, pz)


def _fb_msm_local(tx, ty, sc):
    from ..ops import msm_fixed

    part = msm_fixed._msm_fixed_kernel(tx, ty, sc)
    gathered = tuple(jax.lax.all_gather(c, AXIS, axis=0).T for c in part)
    return g1_vec.tree_reduce(gathered)


@ejit(static_argnums=(3,))
def msm_fixed_sharded(tx, ty, scalars_raw, mesh):
    """Sharded fixed-base MSM: each device runs the Horner loop over its
    own table shard (width n/8D lanes), then the D projective partials
    are all-gathered and tree-added — the same combine as the bit-serial
    path but with the 8x table op-count reduction on every shard."""
    fn = jax.shard_map(
        _fb_msm_local,
        mesh=mesh,
        in_specs=(P(None, AXIS, None), P(None, AXIS, None), P(None, AXIS)),
        out_specs=(P(), P(), P()),
        check_vma=False,
    )
    return fn(tx, ty, scalars_raw)
