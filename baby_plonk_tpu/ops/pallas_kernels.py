"""Pallas TPU kernels for the hot compute paths.

The XLA formulations in ops.limbs/ops.msm materialize intermediate limb
arrays in HBM between ops; these kernels keep everything in VMEM:

* ``mont_mul_pallas`` — tiled Montgomery multiply (drop-in for
  limbs.mont_mul on (L, n) operands);
* ``msm_pallas`` — the full MSM: each grid program loads a tile of points
  + scalars once, runs the entire 255-bit double-and-add loop and an
  in-tile tree reduction in VMEM, and writes ONE partial point per tile.
  HBM traffic is O(n) total instead of O(255 n).

On CPU (tests) the kernels run in interpreter mode automatically.
"""
from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl

from . import g1_vec, limbs
from .g1_vec import FQ, FQ_SPEC
from .msm import FR_SPEC, BITS


def _interpret() -> bool:
    return jax.default_backend() == "cpu"


# -----------------------------------------------------------------------------
# Montgomery multiply
# -----------------------------------------------------------------------------


def _mont_mul_kernel(spec, a_ref, b_ref, o_ref):
    o_ref[...] = limbs.mont_mul(spec, a_ref[...], b_ref[...])


def mont_mul_pallas(spec, a, b, tile: int = 2048):
    """a, b: (L, n) Montgomery -> (L, n). n must be a multiple of ``tile``
    (or smaller than it)."""
    L, n = a.shape
    t = min(tile, n)
    assert n % t == 0
    return pl.pallas_call(
        functools.partial(_mont_mul_kernel, spec),
        out_shape=jax.ShapeDtypeStruct((L, n), jnp.uint32),
        grid=(n // t,),
        in_specs=[
            pl.BlockSpec((L, t), lambda i: (0, i)),
            pl.BlockSpec((L, t), lambda i: (0, i)),
        ],
        out_specs=pl.BlockSpec((L, t), lambda i: (0, i)),
        interpret=_interpret(),
    )(a, b)


# -----------------------------------------------------------------------------
# Fused MSM
# -----------------------------------------------------------------------------


def _msm_tile_kernel(px_ref, py_ref, pz_ref, sc_ref, ox_ref, oy_ref, oz_ref, *, tile):
    base = (px_ref[...], py_ref[...], pz_ref[...])
    zero = base[0] & np.uint32(0)
    one = zero + limbs.const_limbs(FQ.one_mont, zero.shape)
    acc = (zero, one, zero)

    # Static unroll over the 16 scalar limbs (Mosaic cannot lower dynamic
    # slices, so no traced limb index anywhere); inner fori over the 16
    # bits of each limb with a traced shift. Bit 255 is always 0 for
    # canonical Fr scalars, so the extra top bit is harmless.
    carry = (acc, base)
    for li in range(16):
        limb = sc_ref[li, :]

        def stepb(b, carry, limb=limb):
            acc, base = carry
            bitv = (limb >> b.astype(jnp.uint32)) & 1
            acc = g1_vec.pselect(bitv == 1, g1_vec.padd(acc, base), acc)
            base = g1_vec.pdouble(base)
            return (acc, base)

        carry = jax.lax.fori_loop(0, 16, stepb, carry)
    acc, _ = carry

    # in-tile tree reduction to one point (uniform-shape halving)
    m = tile
    while m > 1:
        half = m // 2
        lo = tuple(c[:, :half] for c in acc)
        hi = tuple(c[:, half : 2 * half] for c in acc)
        acc = g1_vec.padd(lo, hi)
        m = half
    # outputs are (1, 24, 128) blocks (TPU tiling: last dim 128); the
    # single reduced point is broadcast across the lane axis
    L = FQ.L
    ox_ref[...] = jnp.broadcast_to(acc[0].reshape(1, L, 1), (1, L, 128))
    oy_ref[...] = jnp.broadcast_to(acc[1].reshape(1, L, 1), (1, L, 128))
    oz_ref[...] = jnp.broadcast_to(acc[2].reshape(1, L, 1), (1, L, 128))


def msm_pallas_partials(points_mont, scalars_raw, tile: int = 256):
    """(24, n) x3 points + (16, n) scalars -> (24, ntiles) x3 partial sums.
    n must be a multiple of ``tile`` (itself a power of two)."""
    px, py, pz = points_mont
    n = px.shape[-1]
    t = min(tile, n)
    assert n % t == 0 and t & (t - 1) == 0
    ntiles = n // t
    kernel = functools.partial(_msm_tile_kernel, tile=t)
    L = FQ.L
    outs = pl.pallas_call(
        kernel,
        out_shape=[jax.ShapeDtypeStruct((ntiles, L, 128), jnp.uint32)] * 3,
        grid=(ntiles,),
        in_specs=[
            pl.BlockSpec((L, t), lambda i: (0, i)),
            pl.BlockSpec((L, t), lambda i: (0, i)),
            pl.BlockSpec((L, t), lambda i: (0, i)),
            pl.BlockSpec((16, t), lambda i: (0, i)),
        ],
        out_specs=[
            pl.BlockSpec((1, L, 128), lambda i: (i, 0, 0)),
            pl.BlockSpec((1, L, 128), lambda i: (i, 0, 0)),
            pl.BlockSpec((1, L, 128), lambda i: (i, 0, 0)),
        ],
        interpret=_interpret(),
    )(px, py, pz, scalars_raw)
    # (ntiles, 24, 128) -> (24, ntiles): lane 0 carries the point
    return tuple(o[:, :, 0].T for o in outs)


@jax.jit
def _reduce_partials(partials):
    n = partials[0].shape[-1]
    if n == 1:
        return tuple(c[:, 0] for c in partials)
    m = 1
    while m < n:
        m <<= 1
    if m != n:
        pad = m - n
        # pad with identity points (0:1:0)
        zero = jnp.zeros((FQ.L, pad), dtype=jnp.uint32)
        one = zero + jnp.asarray(FQ.one_mont)
        partials = (
            jnp.concatenate([partials[0], zero], axis=-1),
            jnp.concatenate([partials[1], one], axis=-1),
            jnp.concatenate([partials[2], zero], axis=-1),
        )
    return g1_vec.tree_reduce(partials)


def msm_pallas(points_mont, scalars_raw, tile: int = 256):
    """Full MSM via the fused tile kernel + cross-tile reduction.
    Returns (X, Y, Z) limb vectors (24,)."""
    partials = msm_pallas_partials(points_mont, scalars_raw, tile=tile)
    return _reduce_partials(partials)


# -----------------------------------------------------------------------------
# Fixed-base combo-table MSM (the DEFAULT commit path, ops/msm_fixed.py)
# -----------------------------------------------------------------------------
#
# The production Horner loop (msm_fixed._msm_fixed_kernel) does, per scalar
# bit: one 256-way table gather + one mixed add + one double over n/8 group
# lanes. In XLA each step round-trips the (24, G) accumulator and the limb
# intermediates through HBM; here the whole loop runs with the accumulator,
# a G-lane tile of both tables, and the precomputed gather indices resident
# in VMEM — HBM traffic is one table read total instead of per-bit.
#
# The scalar-bit -> table-index math (a lane-axis reshape Mosaic dislikes)
# is hoisted OUT of the kernel into a tiny XLA pass over the scalars
# (_fixed_indices): the kernel consumes a dense (256, G) int32 index plan.
# Replays msm.rs:76-118's MSB-first window walk with the window set to the
# 8-point group (msm.rs:107-115 is the Horner doubling being kept; the
# bucket scatter is replaced by the subset-sum gather).


GROUP8 = 8


@jax.jit
def _fixed_indices(scalars_raw):
    """(16, 8G) raw 16-bit scalar limbs -> (256, G) int32 table indices,
    row t = the gather index for Horner step t (MSB-first: bit 255 - t)."""
    G = scalars_raw.shape[-1] // 8
    # bits[b, k] = bit b of scalar k, b = 0..255 LSB-first
    limb = jnp.repeat(scalars_raw, 16, axis=0)  # (256, 8G)
    sh = jax.lax.broadcasted_iota(jnp.uint32, (256, 1), 0) % 16
    bits = (limb >> sh) & 1
    bits = bits[::-1]  # MSB-first rows
    shifts = jax.lax.broadcasted_iota(jnp.int32, (1, 1, GROUP8), 2)
    idx = jnp.sum(bits.reshape(256, G, GROUP8).astype(jnp.int32) << shifts, axis=-1)
    return idx  # (256, G) in [0, 256)


def _msm_fixed_tile_kernel(t_ref, idx_ref, ox_ref, oy_ref, oz_ref, *, tile):
    acc = g1_vec.pidentity((tile,))
    # Mosaic's dynamic_gather only supports same-shape 2D lookups, so the
    # 256-way table lookup is a one-hot select + sum — over the SUBLANE
    # (entry) axis of a (48, 256, tile) block, keeping the point lanes on
    # the lane axis. (The first on-chip attempt used (L, tile, 256) with
    # the entry axis minor: the per-step sum became a cross-LANE
    # reduction and the kernel ran 240x slower than the XLA path —
    # measured 27.4 s vs 112 ms at 2^14, 2026-08-21.) The sum is exact in
    # int32 because the mask is one-hot; tables are VMEM-resident so the
    # 256x read amplification rides VMEM bandwidth, not HBM.
    t = t_ref[...]  # (48, 256, tile): x limbs stacked over y limbs
    entry = jax.lax.broadcasted_iota(jnp.int32, (1, 256, 1), 1)
    zero = jnp.zeros((), t.dtype)

    def step(s, acc):
        sel = idx_ref[s][None, None, :] == entry  # (1, 256, tile) one-hot
        q = jnp.sum(
            jnp.where(sel, t, zero).astype(jnp.int32), axis=1
        ).astype(jnp.uint32)  # (48, tile)
        qx, qy = q[:24], q[24:]
        acc = g1_vec.pdouble(acc)
        added = g1_vec.padd_mixed(acc, (qx, qy))
        is_id = limbs.is_zero(qx) & limbs.is_zero(qy)  # (0,0) identity marker
        return g1_vec.pselect(is_id, acc, added)

    acc = jax.lax.fori_loop(0, 256, step, acc)

    # emit the full-width accumulators; the cross-lane tree reduction
    # happens OUTSIDE the kernel in XLA — the in-kernel padd tree stacked
    # point slots along a tiny axis-1, and Mosaic's concatenate cannot
    # reconcile the operands' vreg offsets there ("result/input offset
    # mismatch on non-concat dimension", logged 2026-08-21); the tree is
    # O(log tile) work on (24, tile) arrays, nothing worth fusing anyway
    ox_ref[...] = acc[0][None]
    oy_ref[...] = acc[1][None]
    oz_ref[...] = acc[2][None]


def msm_fixed_pallas(tx, ty, scalars_raw, tile: int = 128):
    """Fixed-base MSM over prebuilt subset-sum tables, fused in VMEM.

    tx/ty: (24, G, 256) affine tables (uint16 or uint32, ops/msm_fixed.py
    layout); scalars_raw: (16, 8G). Returns (X, Y, Z) limb tuple (24,).
    VMEM/program at tile=128: ~3.2 MB of u16 tables + 128 KB of indices.
    Step count is 256 (vs the XLA path's 255): the extra MSB step gathers
    entry 0 = the identity marker for canonical scalars and doubles the
    identity accumulator — a no-op kept for a static 16x16 bit grid."""
    G = tx.shape[1]
    t = min(tile, G)
    assert G % t == 0
    idx = _fixed_indices(scalars_raw)
    L = FQ.L
    # one-time relayout to the (48, 256, G) onehot orientation (the same
    # layout ops/msm_fixed.py's XLA onehot path uses on disk-cached tables)
    tbl = jnp.swapaxes(jnp.concatenate([tx, ty], axis=0), 1, 2)
    kernel = functools.partial(_msm_fixed_tile_kernel, tile=t)
    with limbs.mosaic_safe():
        # rotate-based limb shifts: Mosaic's internal assert on unaligned
        # sublane concatenates (limbs._row_shift docstring) blocked this
        # kernel's on-chip compile through round 4
        from jax.experimental.pallas import tpu as pltpu

        outs = pl.pallas_call(
            kernel,
            out_shape=[jax.ShapeDtypeStruct((G // t, L, t), jnp.uint32)] * 3,
            grid=(G // t,),
            in_specs=[
                pl.BlockSpec((2 * L, 256, t), lambda i: (0, 0, i)),
                pl.BlockSpec((256, t), lambda i: (0, i)),
            ],
            out_specs=[
                pl.BlockSpec((1, L, t), lambda i: (i, 0, 0)),
                pl.BlockSpec((1, L, t), lambda i: (i, 0, 0)),
                pl.BlockSpec((1, L, t), lambda i: (i, 0, 0)),
            ],
            # the in-kernel mont temporaries peak ~9x the live tile (cf.
            # the sub-NTT note); the default 16M scoped-vmem limit OOMs at
            # tile=128 (measured 20.3M) — raise it toward the chip's real
            # VMEM and let tile stay wide
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=int(
                    os.environ.get("BPT_PALLAS_VMEM", 100 * 1024 * 1024)
                )
            ),
            interpret=_interpret(),
        )(tbl, idx)
    # (G//t, L, t) -> (L, G) lane-major, then one XLA tree reduction
    return _reduce_partials(
        tuple(jnp.swapaxes(o, 0, 1).reshape(L, G) for o in outs)
    )


# -----------------------------------------------------------------------------
# NTT sub-transform (the four-step building block, ops/ntt.py)
# -----------------------------------------------------------------------------
#
# One fused kernel runs ALL log2(m) Pease butterfly stages of a length-m
# sub-NTT along the sublane axis with the data tile resident in VMEM —
# the XLA path writes the full array to HBM after every stage. Per-stage
# twiddles are precomputed as a (logm, L, m/2) table (leading-axis dynamic
# slice per stage; no in-kernel gather). Output is bit-reversed; the
# caller applies the row-gather permutation (cheap at row granularity).
# Replaces the stage loop of utils.rs:63-129's O(n^2) DFT equivalent.


@functools.lru_cache(maxsize=None)
def _stage_twiddles(m: int, inverse: bool):
    """(logm, 16, m/2) per-stage Pease twiddle table for a length-m sub-NTT
    over the primitive m-th root (stage s entry j = w^((j >> s) << s))."""
    from ..fields import fr
    from .ntt import FR_SPEC

    root = fr.root_of_unity(m)
    if inverse:
        root = pow(root, fr.Q - 2, fr.Q)
    half = m // 2
    pw = [1] * half
    for i in range(1, half):
        pw[i] = pw[i - 1] * root % fr.Q
    logm = m.bit_length() - 1
    rows = []
    for s in range(logm):
        rows.append([pw[(j >> s) << s] for j in range(half)])
    import numpy as _np

    return _np.stack([FR_SPEC.pack_mont(r) for r in rows])  # (logm, 16, half)


#: largest m whose fused single-kernel sub-NTT fits VMEM on the compiled
#: Mosaic path (the in-kernel mont_mul temporary stack peaks ~9x the
#: (16, m, 128) block; measured OOM at m = 256). Beyond this,
#: ntt_sub_pallas_4step recurses: m = m1*m2 with both factors <= this.
SUB_MAX_M = 128


def _ntt_sub_kernel(spec, a_ref, tws_ref, o_ref, *, m):
    logm = m.bit_length() - 1
    half = m // 2
    a = a_ref[...]  # (16, m, B)

    def stage(s, a):
        u = a[:, :half, :]
        v = a[:, half:, :]
        w = tws_ref[s][:, :, None]  # (16, half, 1)
        A = limbs.add_mod(spec, u, v)
        Bv = limbs.mont_mul(spec, limbs.sub_mod(spec, u, v), w)
        return jnp.stack([A, Bv], axis=-2).reshape(a.shape)

    o_ref[...] = jax.lax.fori_loop(0, logm, stage, a)


def ntt_sub_pallas(a, inverse: bool, lanes_tile: int | None = None):
    """Pease NTT along axis -2, all stages fused in one VMEM-resident
    kernel. a: (16, m, B) Montgomery -> (16, m, B) in BIT-REVERSED row
    order (caller applies the br row gather). B must be a multiple of the
    lane tile (default sized so one block is <= ~2 MB)."""
    from .ntt import FR_SPEC

    L, m, B = a.shape
    if m == 1:
        return a
    if lanes_tile is None:
        # Mosaic requires the lane-axis block to be a multiple of 128 (or
        # all of B); VMEM budget: the block is 64*m*t bytes and the
        # in-kernel mont_mul stack peaks at ~9x that (measured: a
        # (16, 256, 256) block = 4 MB OOMed at a 36.6 MB scoped
        # allocation vs the 16 MB limit) -> the compiled path fits up to
        # m = 128 at t = 128. Larger m only runs in interpreter mode
        # (tests) unless the caller tiles explicitly.
        lanes_tile = 128 if B >= 128 else B
    t = min(lanes_tile, B)
    assert B % t == 0
    tws = jnp.asarray(_stage_twiddles(m, inverse))
    logm = m.bit_length() - 1
    kernel = functools.partial(_ntt_sub_kernel, FR_SPEC, m=m)
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((L, m, B), jnp.uint32),
        grid=(B // t,),
        in_specs=[
            pl.BlockSpec((L, m, t), lambda i: (0, 0, i)),
            pl.BlockSpec((logm, L, m // 2), lambda i: (0, 0, 0)),
        ],
        out_specs=pl.BlockSpec((L, m, t), lambda i: (0, 0, i)),
        interpret=_interpret(),
    )(a, tws)


@functools.lru_cache(maxsize=None)
def _sub4_plan_device(m: int, inverse: bool):
    """Device-resident four-step pieces of ops/ntt.py::_plan4 for length m:
    (m1, m2, crossT (16, m1, m2), br1, br2)."""
    from .ntt import _plan4

    m1, m2, tw1, tw2, crossT, br1, br2, _ = _plan4(m, inverse)
    return m1, m2, jnp.asarray(crossT), jnp.asarray(br1), jnp.asarray(br2)


def ntt_sub_pallas_4step(a, inverse: bool):
    """Length-m sub-NTT along axis -2 in NATURAL output order, for m past
    the single-kernel VMEM limit (SUB_MAX_M): four-step m = m1*m2 whose
    two sub-passes are the fused Pallas kernel at VMEM-friendly sizes
    (m = 1024 -> two fused 32-point passes over 32x the lanes), with the
    cross-twiddle mont_mul and the (m1, m2) transpose left to XLA — both
    are row-granular and cheap; the butterfly stages (the HBM-round-trip
    cost in the XLA path) stay VMEM-resident.

    a: (16, m, B) Montgomery -> (16, m, B). Production shape: the 2^20
    four-step's m = 1024 factor (ops/ntt.py::ntt4_mont), which the plain
    ntt_sub_pallas cannot compile (its (16, 1024, 128) block alone is
    8 MB before the ~9x mont_mul temporary stack)."""
    from .ntt import FR_SPEC

    L, m, B = a.shape
    m1, m2, crossT, br1, br2 = _sub4_plan_device(m, inverse)
    assert m1 <= SUB_MAX_M and m2 <= SUB_MAX_M, (
        f"m={m} needs factors beyond one four-step level"
    )
    # NTT over i1 (length m1), lanes = (i2, b)
    a = ntt_sub_pallas(a.reshape(L, m1, m2 * B), inverse)
    a = jnp.take(a, br1, axis=-2).reshape(L, m1, m2, B)
    # cross twiddles w^(j1*i2)
    a = limbs.mont_mul(FR_SPEC, a, crossT[:, :, :, None])
    # NTT over i2 (length m2), lanes = (j1, b)
    a = jnp.swapaxes(a, 1, 2).reshape(L, m2, m1 * B)
    a = ntt_sub_pallas(a, inverse)
    a = jnp.take(a, br2, axis=-2)
    # (j2, j1) row-major flatten = index j1 + m1*j2 = natural order
    return a.reshape(L, m, B)
