"""Vectorized BLS12-381 G1 arithmetic on device (JAX).

Branch-free complete projective formulas (Renes–Costello–Batina 2015,
Algorithms 7/9 for a=0) over arrays of points — the same formulas the
reference uses element-at-a-time (lib/bls12_381/src/g1.rs:638-752),
chosen here because they are exception-free and therefore ideal for SIMD:
the identity (0:1:0) and doubling cases need no branches.

A point batch is a tuple (X, Y, Z) of (24, ...batch) uint32 limb arrays
in Montgomery form (homogeneous projective: x = X/Z, y = Y/Z), limb axis
leading per ops.limbs. To keep compiled graphs small and the VPU busy,
the 12 field multiplies of an addition are issued as three *stacked*
Montgomery multiplies (the independent products of each dependency stage
are batched along a fresh axis).
"""
from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from ..fields import fq
from . import limbs
from .limbs import FieldSpec

FQ_SPEC = FieldSpec(fq.P, 24)

#: 3*b = 12 for y^2 = x^3 + 4, Montgomery form, shape (24, 1).
B3_MONT = FQ_SPEC.pack_mont([12])


def _add(a, b):
    return limbs.add_mod(FQ_SPEC, a, b)


def _sub(a, b):
    return limbs.sub_mod(FQ_SPEC, a, b)


def _stackmul(lhs, rhs):
    """Batched Montgomery product of equal-length operand lists.

    Stacks along a new axis 1 (after the limb axis) so one mont_mul graph
    covers the whole dependency stage."""
    a = jnp.stack(lhs, axis=1)
    b = jnp.stack(rhs, axis=1)
    out = limbs.mont_mul(FQ_SPEC, a, b)
    return [out[:, i] for i in range(len(lhs))]


def _stackmul_wide(lhs, rhs):
    """Batched full products WITHOUT reduction (lazy-reduction inputs)."""
    a = jnp.stack(lhs, axis=1)
    b = jnp.stack(rhs, axis=1)
    out = limbs.mul_wide_nored(FQ_SPEC, a, b)
    return [out[:, i] for i in range(len(lhs))]


def _stackreduce(wides):
    """One batched Montgomery reduction for a list of wide values."""
    out = limbs.mont_reduce_wide(FQ_SPEC, jnp.stack(wides, axis=1))
    return [out[:, i] for i in range(len(wides))]


def _b3(ref):
    return limbs.const_limbs(B3_MONT, ref.shape)


def padd(p1, p2):
    """Complete projective addition (RCB15 Algorithm 7, a=0). 12M as 3 stacked."""
    X1, Y1, Z1 = p1
    X2, Y2, Z2 = p2
    t0, t1, t2, m3, m4, m5 = _stackmul(
        [X1, Y1, Z1, _add(X1, Y1), _add(Y1, Z1), _add(X1, Z1)],
        [X2, Y2, Z2, _add(X2, Y2), _add(Y2, Z2), _add(X2, Z2)],
    )
    t3 = _sub(m3, _add(t0, t1))  # X1Y2 + X2Y1
    t4 = _sub(m4, _add(t1, t2))  # Y1Z2 + Y2Z1
    t5 = _sub(m5, _add(t0, t2))  # X1Z2 + X2Z1
    t0_3 = _add(_add(t0, t0), t0)  # 3 X1X2
    bz, y3t = _stackmul([_b3(t2), _b3(t5)], [t2, t5])  # b3 Z1Z2, b3 t5
    z3t = _add(t1, bz)
    t1m = _sub(t1, bz)
    # lazy reduction: each output coordinate is a sum/difference of two
    # full products sharing ONE Montgomery reduction (3 instead of 6)
    w0, w1, w2, w3, w4, w5 = _stackmul_wide(
        [t3, t4, y3t, t1m, z3t, t0_3],
        [t1m, y3t, t0_3, z3t, t4, t3],
    )
    X3, Y3, Z3 = _stackreduce(
        [
            limbs.sub_wide(FQ_SPEC, w0, w1),
            limbs.add_wide(FQ_SPEC, w2, w3),
            limbs.add_wide(FQ_SPEC, w4, w5),
        ]
    )
    return (X3, Y3, Z3)


def pdouble(p):
    """Complete projective doubling (RCB15 Algorithm 9, a=0). 3 stacked muls."""
    X, Y, Z = p
    t0, t1, zz, xy = _stackmul([Y, Y, Z, X], [Y, Z, Z, Y])
    z3 = _add(t0, t0)
    z3 = _add(z3, z3)
    z3 = _add(z3, z3)  # 8 Y^2
    (t2,) = _stackmul([_b3(zz)], [zz])  # b3 Z^2
    y3p = _add(t0, t2)
    t2_3 = _add(_add(t2, t2), t2)
    t0m = _sub(t0, t2_3)
    wx3a, wz3n, wy3n, wx3b = _stackmul_wide(
        [t2, t1, t0m, t0m], [z3, z3, y3p, xy]
    )
    Y3, Z3, x3b = _stackreduce(
        [limbs.add_wide(FQ_SPEC, wx3a, wy3n), wz3n, wx3b]
    )
    X3 = _add(x3b, x3b)
    return (X3, Y3, Z3)


def pselect(cond, p_true, p_false):
    """Lane select between point batches; cond (batch,) bool."""
    return tuple(limbs.select(cond, a, b) for a, b in zip(p_true, p_false))


def pidentity(shape_suffix):
    """Identity batch (0 : 1 : 0) in Montgomery form, coords (24, *shape_suffix)."""
    zero = jnp.zeros((24,) + shape_suffix, dtype=jnp.uint32)
    one = limbs.const_limbs(FQ_SPEC.one_mont, (24,) + shape_suffix)
    return (zero, one, zero)


# -- host <-> device conversion ----------------------------------------------


def points_to_device(points) -> tuple:
    """list[G1 host points] -> (X, Y, Z) Montgomery device arrays (24, n).

    Host points are Jacobian; normalize to affine first (identity -> (0:1:0)).
    """
    xs, ys, zs = [], [], []
    for p in points:
        aff = p.to_affine() if hasattr(p, "to_affine") else p
        if aff is None:
            xs.append(0)
            ys.append(1)
            zs.append(0)
        else:
            xs.append(aff[0])
            ys.append(aff[1])
            zs.append(1)
    return (
        jnp.asarray(FQ_SPEC.pack_mont(xs)),
        jnp.asarray(FQ_SPEC.pack_mont(ys)),
        jnp.asarray(FQ_SPEC.pack_mont(zs)),
    )


def point_from_device(p) -> "object":
    """Single point (X, Y, Z) limb arrays (24,) -> host G1 (exact)."""
    from ..curves.g1 import G1

    X, Y, Z = (FQ_SPEC.unpack_mont(np.asarray(c).reshape(24, 1))[0] for c in p)
    if Z == 0:
        return G1.identity()
    zinv = fq.inv(Z)
    return G1.from_affine(X * zinv % fq.P, Y * zinv % fq.P)


# -- reductions ---------------------------------------------------------------


def tree_reduce(p):
    """Sum a (24, n)-batch of points down to lane 0. n must be a power of 2.

    log2(n) halving steps, each one full-width complete add; geometry via
    gathers so a single add body is compiled (uniform shapes).
    """
    import jax

    n = p[0].shape[-1]
    assert n & (n - 1) == 0
    if n == 1:
        return tuple(c[..., 0] for c in p)
    logn = n.bit_length() - 1
    idx = jax.lax.broadcasted_iota(jnp.int32, (n, 1), 0)[:, 0]

    def step(s, p):
        m = jnp.int32(n) >> (s + 1)
        partner = (idx + m) % n
        shifted = tuple(jnp.take(c, partner, axis=-1) for c in p)
        summed = padd(p, shifted)
        return pselect(idx < m, summed, p)

    p = jax.lax.fori_loop(0, logn, step, p)
    return tuple(c[..., 0] for c in p)
