"""Distributed NTT: four-step (transpose) algorithm over the device mesh.

Decomposes a size-n transform, n = D*m over D devices, into
  (1) a D-point NTT across the former device axis (made local by a tiled
      ``all_to_all``),
  (2) a twiddle by w^(i2*k1),
  (3) a second ``all_to_all`` transpose, and
  (4) a local m-point NTT (ops.ntt),
with w the order-n root. Index algebra (i = i1*m + i2, k = k2*D + k1):

  X[k2*D + k1] = NTT_m over i2 [ w^(i2*k1) * NTT_D over i1 [ x[i1*m + i2] ] ]

so a block-sharded natural-order input yields an output where device k1
holds the strided slice {k : k = k1 (mod D)} ("cyclic" order). The host
wrapper re-interleaves; on-device pipelines keep the cyclic convention.

This plays the role sequence-parallel attention plays in an ML stack
(SURVEY.md §5 long-context row): the stage exchange is two all_to_alls
over ICI, everything else is local VPU work.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import PartitionSpec as P

from ..fields import fr
from ..ops import limbs, ntt as ntt_ops
from ..ops.ntt import FR_SPEC
from .mesh import AXIS
from ..utils.expcache import ejit


@functools.lru_cache(maxsize=None)
def _dplan(n: int, D: int, inverse: bool):
    """Host tables: full twiddle table w^j (16, n), local plans."""
    root = fr.root_of_unity(n)
    if inverse:
        root = pow(root, fr.Q - 2, fr.Q)
    tw = [1] * n
    for i in range(1, n):
        tw[i] = tw[i - 1] * root % fr.Q
    return FR_SPEC.pack_mont(tw)


def _local_fourstep(a, inverse, D, m, n, tw_full, plan_D, plan_m):
    """shard_map body. a: (16, ..., m) local block (device d holds rows i1=d);
    extra axes between limb and position are batch."""
    d = jax.lax.axis_index(AXIS)
    mD = m // D
    pos = a.ndim - 1
    # transpose 1: split i2 into D chunks, gather all i1 -> (..., D, m/D)
    a = jax.lax.all_to_all(a, AXIS, split_axis=pos, concat_axis=pos, tiled=True)
    a = a.reshape(a.shape[:-1] + (D, mD))  # [..., i1, i2-within-chunk-d]
    # step 1: D-point NTT over i1
    a = jnp.swapaxes(a, -1, -2)  # (..., m/D, D)
    a = ntt_ops.ntt_mont(a, inverse, *plan_D)
    a = jnp.swapaxes(a, -1, -2)  # (..., D=k1, m/D=i2 chunk)
    # step 2: twiddle w^(i2 * k1), i2 = d*m/D + c
    k1 = jax.lax.broadcasted_iota(jnp.int32, (D, mD), 0)
    c = jax.lax.broadcasted_iota(jnp.int32, (D, mD), 1)
    i2 = d.astype(jnp.int32) * mD + c
    exp = (i2 * k1) % n
    w = jnp.take(tw_full, exp.reshape(-1), axis=-1).reshape(16, D, mD)
    w = w.reshape((16,) + (1,) * (a.ndim - 3) + (D, mD))
    a = limbs.mont_mul(FR_SPEC, a, w)
    # transpose 2: bring all i2 local for row k1=d
    a = jax.lax.all_to_all(a, AXIS, split_axis=a.ndim - 2, concat_axis=a.ndim - 2, tiled=True)
    a = a.reshape(a.shape[:-2] + (m,))  # i2 natural order
    # step 4: local m-point NTT over i2. For the inverse transform the
    # 1/D and 1/m scalings inside the sub-plans compose to the 1/n total.
    a = ntt_ops.ntt_mont(a, inverse, *plan_m)
    return a  # device d holds X[k2*D + d], k2 = 0..m-1


def _local_fourstep_dual(a, D, m, n, tw_full_inv, plan_D_inv, plan_m_inv):
    """shard_map body: the forward chain run backwards — consumes the
    CYCLIC layout the forward transform emits (device d holds X[k2*D+d])
    and returns the inverse transform in natural block-sharded order.

    Paired with the forward `_local_fourstep` this gives reorder-free
    convolution (DIF-forward / DIT-inverse pairing): the pointwise stage
    in between runs directly on cyclic data and no global permute is ever
    materialized. The 1/D and 1/m scalings of the inverse sub-plans
    compose to the 1/n total."""
    d = jax.lax.axis_index(AXIS)
    mD = m // D
    pos = a.ndim - 1
    # undo step 4: local m-point inverse NTT over k2 -> i2 natural
    a = ntt_ops.ntt_mont(a, True, *plan_m_inv)
    # undo transpose 2: send i2-chunk j to device j (transpose (d, j))
    a = a.reshape(a.shape[:-1] + (D, mD))
    a = jax.lax.all_to_all(a, AXIS, split_axis=a.ndim - 2, concat_axis=a.ndim - 2, tiled=True)
    # device d now holds [k1, c] with i2 = d*mD + c — undo the twiddle
    k1 = jax.lax.broadcasted_iota(jnp.int32, (D, mD), 0)
    c = jax.lax.broadcasted_iota(jnp.int32, (D, mD), 1)
    i2 = d.astype(jnp.int32) * mD + c
    exp = (i2 * k1) % n
    w = jnp.take(tw_full_inv, exp.reshape(-1), axis=-1).reshape(16, D, mD)
    w = w.reshape((16,) + (1,) * (a.ndim - 3) + (D, mD))
    a = limbs.mont_mul(FR_SPEC, a, w)
    # undo step 1: D-point inverse NTT over k1 -> i1
    a = jnp.swapaxes(a, -1, -2)
    a = ntt_ops.ntt_mont(a, True, *plan_D_inv)
    a = jnp.swapaxes(a, -1, -2)  # (..., i1, c)
    # undo transpose 1: chunk i1 back to device i1
    a = a.reshape(a.shape[:-2] + (m,))
    a = jax.lax.all_to_all(a, AXIS, split_axis=pos, concat_axis=pos, tiled=True)
    return a  # natural block-sharded x[i1*m + i2]


@ejit(static_argnums=(1,))
def _dntt_dual_jit(a, mesh):
    """Inverse transform of `_dntt_jit(..., inverse=False, ...)` that takes
    the cyclic layout directly and emits natural block order."""
    n = a.shape[-1]
    D = mesh.devices.size
    m = n // D
    tw_inv = jnp.asarray(_dplan(n, D, True))
    plan_D = tuple(jnp.asarray(t) for t in ntt_ops._plan(D, True))
    plan_m = tuple(jnp.asarray(t) for t in ntt_ops._plan(m, True))
    body = functools.partial(
        _local_fourstep_dual,
        D=D, m=m, n=n,
        tw_full_inv=tw_inv, plan_D_inv=plan_D, plan_m_inv=plan_m,
    )
    spec = P(*([None] * (a.ndim - 1) + [AXIS]))
    fn = jax.shard_map(body, mesh=mesh, in_specs=spec, out_specs=spec)
    return fn(a)


@ejit(static_argnums=(1, 2))
def _dntt_jit(a, inverse: bool, mesh):
    n = a.shape[-1]
    D = mesh.devices.size
    m = n // D
    tw_full = _dplan(n, D, inverse)
    plan_D = tuple(jnp.asarray(t) for t in ntt_ops._plan(D, inverse))
    plan_m = tuple(jnp.asarray(t) for t in ntt_ops._plan(m, inverse))
    body = functools.partial(
        _local_fourstep,
        inverse=inverse,
        D=D,
        m=m,
        n=n,
        tw_full=jnp.asarray(tw_full),
        plan_D=plan_D,
        plan_m=plan_m,
    )
    spec = P(*([None] * (a.ndim - 1) + [AXIS]))
    fn = jax.shard_map(body, mesh=mesh, in_specs=spec, out_specs=spec)
    return fn(a)


def ntt_sharded(a_mont, mesh, inverse: bool = False):
    """Distributed NTT of (16, n) Montgomery limbs, block-sharded input.

    Output is in cyclic order: global result X[k2*D + k1] lives at
    gathered position [k1*m + k2]. The host wrapper below re-interleaves
    to natural order.
    """
    n = a_mont.shape[-1]
    D = mesh.devices.size
    assert n % D == 0 and n // D >= D and (n // D) % D == 0, (
        f"need n = D*m with D | m (n={n}, D={D})"
    )
    return _dntt_jit(a_mont, inverse, mesh)


def ntt_ints_sharded(values, mesh, inverse: bool = False):
    """Host boundary with natural-order output (reorders the cyclic layout)."""
    n = len(values)
    D = mesh.devices.size
    m = n // D
    a = jnp.asarray(FR_SPEC.pack_mont(values))
    out = np.asarray(jax.device_get(ntt_sharded(a, mesh, inverse)))
    vals = FR_SPEC.unpack_mont(out)
    # gathered position k1*m + k2 holds X[k2*D + k1]
    res = [0] * n
    for k1 in range(D):
        for k2 in range(m):
            res[k2 * D + k1] = vals[k1 * m + k2]
    return res
