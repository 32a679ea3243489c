"""Distributed prefix/suffix products and the round-2 grand product.

The reference's grand product is a serial running product with 3n field
inversions (prover.rs:286-317). The single-chip engine replaces it with
prefix scans + one inversion (ops/tpu_engine.py); this module distributes
those scans over the mesh:

  local inclusive scan  ->  all_gather of the D per-shard totals (16 x D
  words — negligible ICI traffic)  ->  each device folds the totals of
  lower-ranked (resp. higher-ranked) shards into its local scan.

This is the same structure ring-attention-style SP uses for running
statistics: local work + one tiny collective.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import PartitionSpec as P

from ..fields import fr
from ..ops import limbs
from ..ops.ntt import FR_SPEC
from .mesh import AXIS
from ..utils.expcache import ejit

Q = fr.Q


def _mm(a, b):
    return limbs.mont_mul(FR_SPEC, a, b)


def _scan_mul_local(x):
    return limbs.doubling_scan(x, _mm, FR_SPEC.one_mont)


def _fold_totals(scan_loc, reverse: bool):
    """Fold other shards' totals into a local inclusive scan.

    scan_loc: (16, m) local inclusive prefix (or suffix) products. The
    shard's own total is its last (resp. first) column.
    """
    d = jax.lax.axis_index(AXIS)
    ndev = jax.lax.axis_size(AXIS)
    own_total = scan_loc[:, -1:] if not reverse else scan_loc[:, :1]
    totals = jax.lax.all_gather(own_total[:, 0], AXIS, axis=0)  # (D, 16)
    idx = jax.lax.broadcasted_iota(jnp.int32, (ndev, 1), 0)[:, 0]
    if not reverse:
        use = idx < d  # product of lower-ranked shard totals
    else:
        use = idx > d
    one = limbs.const_limbs(FR_SPEC.one_mont, (16, ndev))
    masked = jnp.where(use[None, :], totals.T, one)  # (16, D)
    # reduce the <=D totals with a log-depth halving product; pad the
    # column count to a power of two with Montgomery ones first (odd
    # widths would silently drop the trailing column otherwise)
    m = masked.shape[-1]
    mp = 1
    while mp < m:
        mp <<= 1
    if mp != m:
        pad = limbs.const_limbs(FR_SPEC.one_mont, (16, mp - m))
        masked = jnp.concatenate([masked, pad], axis=-1)
        m = mp
    while m > 1:
        half = m // 2
        masked = _mm(masked[:, :half], masked[:, half:])
        m = half
    offset = masked  # (16, 1)
    return _mm(scan_loc, offset)


def _gp_part1_local(a, b, c, s1, s2, s3, roots, k1r, k2r, beta, gamma):
    def rlc(x, y):
        return limbs.add_mod(
            FR_SPEC, limbs.add_mod(FR_SPEC, x, _mm(beta, y)), gamma
        )

    f = _mm(_mm(rlc(a, roots), rlc(b, k1r)), rlc(c, k2r))
    g = _mm(_mm(rlc(a, s1), rlc(b, s2)), rlc(c, s3))
    pf = _fold_totals(_scan_mul_local(f), reverse=False)
    pg = _fold_totals(_scan_mul_local(g), reverse=False)
    sufg = _fold_totals(
        jnp.flip(_scan_mul_local(jnp.flip(g, axis=-1)), axis=-1), reverse=True
    )
    return pf, pg, sufg


@ejit(static_argnums=(11,))
def _gp_part1(a, b, c, s1, s2, s3, roots, k1r, k2r, beta, gamma, mesh):
    sh = P(None, AXIS)
    rep = P(None, None)
    fn = jax.shard_map(
        _gp_part1_local,
        mesh=mesh,
        in_specs=(sh,) * 9 + (rep, rep),
        out_specs=(sh, sh, sh),
        check_vma=False,
    )
    return fn(a, b, c, s1, s2, s3, roots, k1r, k2r, beta, gamma)


@ejit
def _gp_part2(pf, sufg_shift, total_inv):
    return _mm(pf, _mm(sufg_shift, total_inv))


def grand_product_sharded(a, b, c, s1, s2, s3, roots, beta, gamma, k1, k2, mesh):
    """Distributed round-2 grand product; list[int] boundary, mirrors
    ops.tpu_engine.TpuEngine.grand_product."""
    n = len(roots)
    pk = FR_SPEC.pack_mont
    k1r = [r * k1 % Q for r in roots]
    k2r = [r * k2 % Q for r in roots]
    args = [jnp.asarray(pk(v)) for v in (a, b, c, s1, s2, s3, roots, k1r, k2r)]
    beta_m = jnp.asarray(pk([beta]))
    gamma_m = jnp.asarray(pk([gamma]))
    pf, pg, sufg = _gp_part1(*args, beta_m, gamma_m, mesh)
    total = FR_SPEC.unpack_mont(np.asarray(pg[:, -1:]))[0]
    total_inv = fr.inv(total)
    one = jnp.asarray(pk([1]))
    sufg_shift = jnp.concatenate([sufg[:, 1:], one], axis=-1)
    z_tail = _gp_part2(pf, sufg_shift, jnp.asarray(pk([total_inv])))
    return [1] + FR_SPEC.unpack_mont(np.asarray(z_tail))
