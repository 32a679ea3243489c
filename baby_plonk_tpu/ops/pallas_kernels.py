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
