"""Multi-scalar multiplication on device (JAX).

Round-1 kernel: branch-free bit-serial double-and-add, vectorized over all
points (every iteration is one full-width complete add + double), followed
by a log-depth tree reduction. This replaces the reference's serial
Pippenger loop (src/msm.rs:76-118) with a formulation whose inner loop is
pure SIMD — no data-dependent scatters; O(bits) full-width passes
independent of n. A windowed/Pippenger Pallas kernel is the upgrade path.

Layouts (limb-major, batch last): points (24, n) x3 Montgomery, scalars
(16, n) raw (non-Montgomery) 16-bit limbs.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..fields import fr
from . import g1_vec, limbs

FR_SPEC = limbs.FieldSpec(fr.Q, 16)

BITS = 255


@jax.jit
def _msm_kernel(px, py, pz, scalars):
    """px/py/pz: (24, n) Montgomery; scalars: (16, n) raw limbs.

    Returns the (X, Y, Z) limb tuple (24,) of the total.
    """
    n = px.shape[-1]
    # identity (0:1:0) derived from the inputs so it inherits their
    # varying-manual-axes tag under shard_map (a constant-built carry
    # would not typecheck against the loop body's sharded output)
    zero = px & np.uint32(0)
    one = zero + jnp.asarray(g1_vec.FQ.one_mont)  # broadcast (L, 1)
    acc = (zero, one, zero)
    base = (px, py, pz)

    def step(bit, carry):
        acc, base = carry
        limb = jax.lax.dynamic_index_in_dim(scalars, bit >> 4, axis=0, keepdims=False)
        b = (limb >> (bit & 15).astype(jnp.uint32)) & 1
        acc = g1_vec.pselect(b == 1, g1_vec.padd(acc, base), acc)
        base = g1_vec.pdouble(base)
        return (acc, base)

    acc, _ = jax.lax.fori_loop(0, BITS, step, (acc, base))
    return g1_vec.tree_reduce(acc)


#: chunk size for large MSMs. Beyond ~2^14 lanes the kernel's per-point
#: rate degrades ~3.6x (working set leaves the fast regime); chunking at
#: the sweet spot keeps the 2^14 rate AND reuses one compiled shape.
CHUNK = 1 << 14


def msm_device_arrays(points_mont, scalars_raw):
    """Device MSM over pre-packed arrays. Pads n to a power of two and
    processes in CHUNK-sized pieces whose partial sums are tree-combined.

    Algorithm selected by config (bitserial | pippenger)."""
    from ..config import get_config

    if get_config().msm_algorithm == "pippenger":
        from . import msm_pippenger

        return msm_pippenger.msm_pippenger(points_mont, scalars_raw)
    px, py, pz = points_mont
    n = px.shape[-1]
    m = 1
    while m < n:
        m <<= 1
    if m != n:
        pad = m - n
        px = jnp.concatenate([px, jnp.tile(px[:, :1], (1, pad))], axis=-1)
        py = jnp.concatenate([py, jnp.tile(py[:, :1], (1, pad))], axis=-1)
        pz = jnp.concatenate([pz, jnp.tile(pz[:, :1], (1, pad))], axis=-1)
        scalars_raw = jnp.concatenate(
            [scalars_raw, jnp.zeros((16, pad), dtype=jnp.uint32)], axis=-1
        )
        n = m
    if n <= CHUNK:
        return _msm_kernel(px, py, pz, scalars_raw)
    parts = [
        _msm_kernel(
            px[:, i : i + CHUNK],
            py[:, i : i + CHUNK],
            pz[:, i : i + CHUNK],
            scalars_raw[:, i : i + CHUNK],
        )
        for i in range(0, n, CHUNK)
    ]
    stacked = tuple(
        jnp.stack([p[k] for p in parts], axis=-1) for k in range(3)
    )  # (L, nchunks) x3
    return _combine_partials(stacked)


@jax.jit
def _combine_partials(stacked):
    n = stacked[0].shape[-1]
    m = 1
    while m < n:
        m <<= 1
    if m != n:
        pad = m - n
        zero = jnp.zeros((stacked[0].shape[0], pad), dtype=jnp.uint32)
        one = zero + jnp.asarray(g1_vec.FQ.one_mont)
        stacked = (
            jnp.concatenate([stacked[0], zero], axis=-1),
            jnp.concatenate([stacked[1], one], axis=-1),
            jnp.concatenate([stacked[2], zero], axis=-1),
        )
    return g1_vec.tree_reduce(stacked)


def msm(points, scalars) -> "object":
    """Host boundary: list[G1] x list[int] -> host G1."""
    from ..curves.g1 import G1

    n = min(len(points), len(scalars))
    if n == 0:
        return G1.identity()
    pts = g1_vec.points_to_device(points[:n])
    sc = jnp.asarray(FR_SPEC.pack_raw([s % fr.Q for s in scalars[:n]]))
    out = msm_device_arrays(pts, sc)
    return g1_vec.point_from_device(out)
