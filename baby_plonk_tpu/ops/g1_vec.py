"""Vectorized BLS12-381 G1 arithmetic on device (JAX).

Branch-free complete projective formulas (Renes–Costello–Batina 2015,
Algorithms 7/9 for a=0) over arrays of points — the same formulas the
reference uses element-at-a-time (lib/bls12_381/src/g1.rs:638-752),
chosen here because they are exception-free and therefore ideal for SIMD:
the identity (0:1:0) and doubling cases need no branches.

A point batch is a tuple (X, Y, Z) of (FQ.L, ...batch) uint32 limb arrays
in Montgomery form (homogeneous projective: x = X/Z, y = Y/Z), limb axis
leading per ops.limbs. The limb radix is selectable (BPT_FQ_RADIX=16|12;
16 is the measured-faster default, see PERFORMANCE.md) — the host
boundary always uses the radix-16 codecs with a jitted repack at
entry/exit when the compute radix differs. The 12 field multiplies of an
addition are issued as three *stacked* Montgomery multiplies per
dependency stage, with lazy wide-domain reduction in the final stage.
"""
from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from ..fields import fq
from . import limbs
from .limbs import FieldSpec

#: host-boundary codec spec (radix 16, fast bytes/native paths)
FQ_SPEC = FieldSpec(fq.P, 24)
#: on-device compute spec. Radix 16 measured FASTER than the radix-12
#: no-split variant on this chip (1.33 s vs 1.96 s MSM at 2^14: the taller
#: limb arrays + extra carry round outweigh the per-product op savings) —
#: both are supported, selectable via BPT_FQ_RADIX.
import os as _os

_FQ_RADIX = int(_os.environ.get("BPT_FQ_RADIX", "16"))
FQ = FQ_SPEC if _FQ_RADIX == 16 else FieldSpec(fq.P, 32, radix=12)



def repack_16to12(a16):
    """(24, ...) radix-16 limbs -> (32, ...) radix-12, same value."""
    import jax

    a = jnp.concatenate([a16, jnp.zeros_like(a16[:1])], axis=0)  # (25, ...)
    rows = []
    for j in range(32):
        bit = 12 * j
        w0 = bit // 16
        o = bit % 16
        comb = a[w0] | (a[w0 + 1] << 16)  # exact in uint32
        rows.append((comb >> o) & np.uint32(0xFFF))
    return jnp.stack(rows, axis=0)


def repack_12to16(a12):
    """(32, ...) radix-12 limbs -> (24, ...) radix-16, same value."""
    a = jnp.concatenate([a12, jnp.zeros_like(a12[:1])], axis=0)  # (33, ...)
    rows = []
    for w in range(24):
        bit = 16 * w
        j0 = bit // 12
        o = bit - 12 * j0  # 0, 4 or 8
        comb = (a[j0] >> o) | (a[j0 + 1] << (12 - o))
        rows.append(comb & np.uint32(0xFFFF))
    return jnp.stack(rows, axis=0)


def _add(a, b):
    return limbs.add_mod(FQ, a, b)


def _sub(a, b):
    return limbs.sub_mod(FQ, a, b)


# All G1 point arithmetic traces with the COMPACT product formulation:
# point kernels are mul-dense (a table build or MSM fori body holds tens
# of muls, hundreds per graph) — the flat form's ~35x HLO blow-up turned
# their XLA compiles from ~60 s into >10 min — and they always run at
# <= 2^14 lane widths, where compact and flat runtime are identical
# (scripts/bench_montmul.py; the flat form's 1.9x win only appears on
# 2^20-wide Fr field passes, which keep the flat default in ops/limbs.py).


def _stackmul(lhs, rhs):
    """Batched Montgomery product of equal-length operand lists.

    Stacks along a new axis 1 (after the limb axis) so one mont_mul graph
    covers the whole dependency stage."""
    a = jnp.stack(lhs, axis=1)
    b = jnp.stack(rhs, axis=1)
    with limbs.compact_mul():
        out = limbs.mont_mul(FQ, a, b)
    return [out[:, i] for i in range(len(lhs))]


def _stackmul_wide(lhs, rhs):
    """Batched full products WITHOUT reduction (lazy-reduction inputs)."""
    a = jnp.stack(lhs, axis=1)
    b = jnp.stack(rhs, axis=1)
    with limbs.compact_mul():
        out = limbs.mul_wide_nored(FQ, a, b)
    return [out[:, i] for i in range(len(lhs))]


def _stackreduce(wides, biases=None):
    """One batched Montgomery reduction for a list of wide values.
    ``biases``: per-slot net Karatsuba bias counts (sub_wide = 0,
    add_wide = 2, plain product = 1) — only consulted when
    BPT_FQ_MUL=karatsuba is active."""
    with limbs.compact_mul():
        out = limbs.mont_reduce_wide(FQ, jnp.stack(wides, axis=1), bias_count=biases)
    return [out[:, i] for i in range(len(wides))]


def _stacksqr(vals):
    """Batched Montgomery squares (one _sqr_cols graph for all slots) —
    ~half the limb products of a full mont_mul per slot."""
    a = jnp.stack(vals, axis=1)
    with limbs.compact_mul():
        out = limbs.mont_sqr(FQ, a)
    return [out[:, i] for i in range(len(vals))]


def _mul12(x):
    """b3 * x (b3 = 12 for y^2 = x^3 + 4) as shift-adds: one carry pass +
    4 conditional subtractions instead of a full mont_mul — removes 3 of
    the 24 field muls per MSM Horner step (1 in pdouble, 2 in the adds)."""
    return limbs.mul_small(FQ, x, 12)


def padd(p1, p2):
    """Complete projective addition (RCB15 Algorithm 7, a=0): 12 muls as
    3 stacked stages; the two b3 constant muls are shift-adds."""
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
    bz, y3t = _mul12(t2), _mul12(t5)  # b3 Z1Z2, b3 t5 (shift-add consts)
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
            limbs.sub_wide(FQ, w0, w1),
            limbs.add_wide(FQ, w2, w3),
            limbs.add_wide(FQ, w4, w5),
        ],
        biases=(0, 2, 2),
    )
    return (X3, Y3, Z3)


def pdouble(p):
    """Complete projective doubling (RCB15 Algorithm 9, a=0): 2 dedicated
    squares + 2 muls + 4 lazy wide muls; b3*Z^2 is a shift-add const."""
    X, Y, Z = p
    t0, zz = _stacksqr([Y, Z])  # Y^2, Z^2 via dedicated squaring
    t1, xy = _stackmul([Y, X], [Z, Y])
    z3 = _add(t0, t0)
    z3 = _add(z3, z3)
    z3 = _add(z3, z3)  # 8 Y^2
    t2 = _mul12(zz)  # b3 Z^2 (shift-add const)
    y3p = _add(t0, t2)
    t2_3 = _add(_add(t2, t2), t2)
    t0m = _sub(t0, t2_3)
    wx3a, wz3n, wy3n, wx3b = _stackmul_wide(
        [t2, t1, t0m, t0m], [z3, z3, y3p, xy]
    )
    Y3, Z3, x3b = _stackreduce(
        [limbs.add_wide(FQ, wx3a, wy3n), wz3n, wx3b], biases=(2, 1, 1)
    )
    X3 = _add(x3b, x3b)
    return (X3, Y3, Z3)


def padd_mixed(p1, q_affine):
    """Mixed addition P (projective) + Q (affine, Z2 = 1 implicit) —
    RCB15 Algorithm 8 for a = 0: 11 muls in 3 stacked stages (the two b3
    constant muls are shift-adds) vs padd's 12, and one fewer operand
    coordinate to load. Complete in P; Q must NOT be
    the identity (affine cannot represent it) — callers mask that case
    (the (0, 0) marker is off-curve, so it is unambiguous)."""
    X1, Y1, Z1 = p1
    X2, Y2 = q_affine
    t0, t1, m3, m4, m5 = _stackmul(
        [X1, Y1, _add(X1, Y1), Z1, Z1],
        [X2, Y2, _add(X2, Y2), Y2, X2],
    )
    bz = _mul12(Z1)  # b3 Z1 (shift-add const)
    t3 = _sub(m3, _add(t0, t1))  # X1Y2 + X2Y1
    t4 = _add(Y1, m4)  # Y1 + Y2Z1
    t5 = _add(X1, m5)  # X1 + X2Z1
    t0_3 = _add(_add(t0, t0), t0)  # 3 X1X2
    y3t = _mul12(t5)  # b3 (X1 + X2Z1)
    z3t = _add(t1, bz)
    t1m = _sub(t1, bz)
    w0, w1, w2, w3, w4, w5 = _stackmul_wide(
        [t3, t4, y3t, t1m, z3t, t0_3],
        [t1m, y3t, t0_3, z3t, t4, t3],
    )
    X3, Y3, Z3 = _stackreduce(
        [
            limbs.sub_wide(FQ, w0, w1),
            limbs.add_wide(FQ, w2, w3),
            limbs.add_wide(FQ, w4, w5),
        ],
        biases=(0, 2, 2),
    )
    return (X3, Y3, Z3)


def pselect(cond, p_true, p_false):
    """Lane select between point batches; cond (batch,) bool."""
    return tuple(limbs.select(cond, a, b) for a, b in zip(p_true, p_false))


def pidentity(shape_suffix):
    """Identity batch (0 : 1 : 0) in Montgomery form, coords (FQ.L, *shape_suffix)."""
    zero = jnp.zeros((FQ.L,) + shape_suffix, dtype=jnp.uint32)
    one = limbs.const_limbs(FQ.one_mont, (FQ.L,) + shape_suffix)
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
    import jax

    conv = (lambda a: a) if FQ.radix == 16 else jax.jit(repack_16to12)
    return (
        conv(jnp.asarray(FQ_SPEC.pack_mont(xs))),
        conv(jnp.asarray(FQ_SPEC.pack_mont(ys))),
        conv(jnp.asarray(FQ_SPEC.pack_mont(zs))),
    )


def point_from_device(p) -> "object":
    """Single point (X, Y, Z) limb arrays (24,) -> host G1 (exact)."""
    from ..curves.g1 import G1

    import jax

    conv = (lambda a: a) if FQ.radix == 16 else jax.jit(repack_12to16)
    X, Y, Z = (
        FQ_SPEC.unpack_mont(np.asarray(conv(c.reshape(FQ.L, 1))))[0] for c in p
    )
    if Z == 0:
        return G1.identity()
    zinv = fq.inv(Z)
    return G1.from_affine(X * zinv % fq.P, Y * zinv % fq.P)


def batch_normalize(p):
    """Projective batch (X, Y, Z) -> affine (x, y) arrays with ONE field
    inversion (device counterpart of g1.rs:806-839, via limbs.batch_inverse
    over the flattened batch). Identity lanes (Z = 0) map to the off-curve
    (0, 0) marker."""
    X, Y, Z = p
    shape = Z.shape
    with limbs.compact_mul():
        zinv = limbs.batch_inverse(FQ, Z.reshape(FQ.L, -1)).reshape(shape)
        x = limbs.mont_mul(FQ, X, zinv)
        y = limbs.mont_mul(FQ, Y, zinv)
    return (x, y)


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
