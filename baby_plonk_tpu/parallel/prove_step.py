"""Distributed prover compute step: the multi-chip flagship pipeline.

One jitted step over the mesh that covers the prover's round-1 compute
shape (SURVEY.md §3.2): sharded iNTT of the witness columns (all_to_all
stage exchange) followed by sharded KZG commits (per-device MSM partials
+ all_gather). The SRS is stored in *cyclic* order — the natural output
order of the distributed iNTT — so no global reshuffle sits between the
NTT and the MSM: coefficient j and power tau^j land on the same device
by construction.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from ..ops import g1_vec, limbs, msm as msm_ops, ntt as ntt_ops
from ..ops.ntt import FR_SPEC
from . import dmsm, dntt
from .mesh import AXIS
from ..utils.expcache import ejit


def cyclic_perm(n: int, D: int):
    """Permutation placing natural index k2*D + k1 at position k1*m + k2."""
    import numpy as np

    m = n // D
    perm = np.empty(n, dtype=np.int64)
    for k1 in range(D):
        for k2 in range(m):
            perm[k1 * m + k2] = k2 * D + k1
    return perm


@ejit(static_argnums=(4,))
def prove_step_sharded(cols, px, py, pz, mesh):
    """cols: (16, 3, n) witness columns a|b|c (block-sharded on n);
    px/py/pz: (24, n) SRS powers in cyclic order (sharded on n).
    Returns the three commitment points as (24,) limb tuples.

    This is the function the driver dry-runs multi-chip; it exercises the
    real collectives: all_to_all (iNTT stage exchange) + all_gather
    (MSM partial combine).
    """
    coeffs = dntt._dntt_jit(cols, True, mesh)  # cyclic-order monomial coeffs

    def commit_local(coeff_local, px_l, py_l, pz_l):
        # Montgomery form -> raw scalar limbs for the MSM bit loop
        raw = limbs.from_mont(FR_SPEC, coeff_local)
        outs = []
        for i in range(3):
            part = msm_ops._msm_kernel(px_l, py_l, pz_l, raw[:, i])
            gathered = tuple(
                jax.lax.all_gather(c, AXIS, axis=0).T for c in part
            )
            outs.append(g1_vec.tree_reduce(gathered))
        return tuple(outs)

    fn = jax.shard_map(
        commit_local,
        mesh=mesh,
        in_specs=(P(None, None, AXIS), P(None, AXIS), P(None, AXIS), P(None, AXIS)),
        out_specs=tuple((P(), P(), P()) for _ in range(3)),
        check_vma=False,
    )
    return fn(coeffs, px, py, pz)
