"""Device-side SRS generation: powers-of-tau fixed-base multiplication.

The reference computes the SRS with a serial chain of 255-bit scalar
multiplications (setup.rs:12-31, one full G1 multiply per power). Here the
scalar powers tau^i are computed host-side (cheap field muls), then all
fixed-base multiplications tau^i * G run as ONE vectorized bit-serial
double-and-add over the batch — identical structure to the MSM kernel but
without the final reduction, so the cost is O(255) full-width passes for
the entire SRS.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..fields import fr
from . import g1_vec, limbs
from .g1_vec import FQ, FQ_SPEC
from .msm import FR_SPEC, BITS


@jax.jit
def _fixed_base_kernel(px, py, pz, scalars):
    """px/py/pz: (24, n) Montgomery base points (typically one point tiled);
    scalars: (16, n) raw limbs. Returns per-lane scalar multiples (24, n) x3."""
    zero = px & np.uint32(0)
    one = zero + jnp.asarray(FQ.one_mont)
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
    return acc


#: chunk size: past ~2^14 lanes the bit-serial kernel's per-lane rate
#: degrades ~3.6x (working set), and one compiled shape covers all chunks
SRS_CHUNK = 1 << 14


def powers_of_tau_device(powers: int, tau: int):
    """(X, Y, Z) device arrays (24, powers) with column i = tau^i * G.

    Chunked at the 2^14 sweet spot (same reasoning as ops/msm.py CHUNK):
    each chunk is one fixed-base batch; chunks reuse one compiled shape."""
    tau = tau % fr.Q
    cur = 1
    scalars = []
    for _ in range(powers):
        scalars.append(cur)
        cur = cur * tau % fr.Q
    from ..curves.g1 import G1
    from . import g1_vec

    base = g1_vec.points_to_device([G1.generator()])
    if powers <= SRS_CHUNK:
        px = jnp.tile(base[0], (1, powers))
        py = jnp.tile(base[1], (1, powers))
        pz = jnp.tile(base[2], (1, powers))
        sc = jnp.asarray(FR_SPEC.pack_raw(scalars))
        return _fixed_base_kernel(px, py, pz, sc)
    px = jnp.tile(base[0], (1, SRS_CHUNK))
    py = jnp.tile(base[1], (1, SRS_CHUNK))
    pz = jnp.tile(base[2], (1, SRS_CHUNK))
    outs = []
    for lo in range(0, powers, SRS_CHUNK):
        chunk = scalars[lo : lo + SRS_CHUNK]
        pad = SRS_CHUNK - len(chunk)
        sc = jnp.asarray(FR_SPEC.pack_raw(chunk + [0] * pad))
        outs.append(_fixed_base_kernel(px, py, pz, sc))
    res = tuple(
        jnp.concatenate([o[k] for o in outs], axis=-1)[:, :powers] for k in range(3)
    )
    return res


def powers_of_tau_sharded(powers: int, tau: int, mesh):
    """Distributed trusted-setup generation: the powers-of-tau batch
    block-sharded over a mesh. The fixed-base kernel is lane-wise, so a
    sharded placement partitions it with ZERO collectives — each device
    computes its tau^i range, a D-way speedup of setup, and the SRS is
    born in the layout the distributed prover consumes.

    Returns (X, Y, Z) sharded (24, N) arrays, N = powers padded up to a
    multiple of the mesh size (padding lanes hold scalar 0 -> identity)."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    from ..curves.g1 import G1
    from ..parallel.mesh import AXIS

    tau = tau % fr.Q
    D = int(mesh.devices.size)
    N = -(-powers // D) * D
    cur = 1
    scalars = []
    for _ in range(powers):
        scalars.append(cur)
        cur = cur * tau % fr.Q
    scalars += [0] * (N - powers)
    sharding = NamedSharding(mesh, P(None, AXIS))
    base = g1_vec.points_to_device([G1.generator()])
    px, py, pz = (
        jax.device_put(jnp.tile(c, (1, N)), sharding) for c in base
    )
    sc = jax.device_put(jnp.asarray(FR_SPEC.pack_raw(scalars)), sharding)
    return _fixed_base_kernel(px, py, pz, sc)


def device_points_to_host(p) -> list:
    """(24, n) x3 projective Montgomery -> list[G1] via one batch inversion."""
    from ..curves.g1 import G1
    from ..fields import fq

    from . import g1_vec

    conv = (lambda a: a) if g1_vec.FQ.radix == 16 else jax.jit(g1_vec.repack_12to16)
    X = FQ_SPEC.unpack_mont(np.asarray(jax.device_get(conv(p[0]))))
    Y = FQ_SPEC.unpack_mont(np.asarray(jax.device_get(conv(p[1]))))
    Z = FQ_SPEC.unpack_mont(np.asarray(jax.device_get(conv(p[2]))))
    # batch-invert nonzero Zs (Montgomery's trick)
    idxs = [i for i, z in enumerate(Z) if z != 0]
    invs = fq_batch_inv([Z[i] for i in idxs])
    out = [G1.identity()] * len(Z)
    for j, i in enumerate(idxs):
        zi = invs[j]
        out[i] = G1.from_affine(X[i] * zi % fq.P, Y[i] * zi % fq.P)
    return out


def fq_batch_inv(values):
    from ..fields import fq

    n = len(values)
    prefix = [1] * (n + 1)
    for i, v in enumerate(values):
        prefix[i + 1] = prefix[i] * v % fq.P
    total = fq.inv(prefix[n])
    out = [0] * n
    for i in range(n - 1, -1, -1):
        out[i] = prefix[i] * total % fq.P
        total = total * values[i] % fq.P
    return out
