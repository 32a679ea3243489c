"""MeshEngine: the full 5-round prover distributed over a device mesh.

Drops into the unmodified ``protocol.Prover`` via the engine contract
(ops/engine.py) and shards every §2.3 latent-parallel structure
(SURVEY.md) across a 1-D ``jax.sharding.Mesh``:

  * iNTT / NTT            -> four-step decomposition, all_to_all stage
                             exchange (parallel/dntt.py)
  * KZG commits (9/proof) -> per-device MSM partials + all_gather
                             (parallel/dmsm.py, SRS padded & block-sharded)
  * grand product         -> cross-shard prefix/suffix scans
                             (parallel/dscan.py)
  * round-3 quotient      -> sharded coset NTTs + pointwise constraint
                             combination + sharded inverse NTT (this file)

Proofs are byte-identical to the host oracle and to the single-device
TpuEngine (tests/test_mesh_engine.py) — exact 255-bit field arithmetic
survives sharding because every collective moves Montgomery limbs, never
floats.  Shapes that don't divide the mesh (tiny circuits, odd commit
lengths) fall back to the single-device TpuEngine paths; commits pad the
scalar vector with zeros instead (a zero scalar contributes nothing to
the bit-serial MSM accumulator, so SRS padding points are never selected).

The four-step NTT emits *cyclic* order (coefficient k2*D + k1 at gathered
position k1*m + k2); round 3 keeps the pointwise combination in cyclic
order (permuting the Z_H / domain-point tables once per size instead of
the data) and inverts through the dual four-step (dntt._dntt_dual_jit),
which consumes the cyclic layout directly — the classic DIF-forward /
DIT-inverse pairing, so no global data permute exists anywhere in the
quotient pipeline.  Commits default to the sharded fixed-base subset-sum
tables (8x fewer add-lanes; each device builds and holds only its SRS
shard's tables, so the table HBM footprint ALSO divides by D).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import NamedSharding, PartitionSpec as P

from ..fields import fr
from ..ops import g1_vec, limbs
from ..ops.ntt import FR_SPEC
from ..ops.tpu_engine import TpuEngine
from . import dmsm, dntt, dscan
from .mesh import AXIS, make_mesh
from ..utils.expcache import ejit

Q = fr.Q


@ejit
def _permute_last(x, idx):
    return jnp.take(x, idx, axis=-1)


@ejit
def _mm(a, b):
    return limbs.mont_mul(FR_SPEC, a, b)


class MeshEngine(TpuEngine):
    name = "mesh"

    def __init__(self, mesh=None):
        self.mesh = mesh if mesh is not None else make_mesh()
        self.D = int(self.mesh.devices.size)
        self._shard = NamedSharding(self.mesh, P(None, AXIS))
        self._perms: dict[int, tuple[jnp.ndarray, jnp.ndarray]] = {}
        self._r3_cyc: dict[int, tuple] = {}
        self._roots: dict[int, jnp.ndarray] = {}

    # -- layout helpers -------------------------------------------------------

    def _can_shard(self, n: int) -> bool:
        D = self.D
        return n % D == 0 and (n // D) >= D and (n // D) % D == 0

    def _perm_pair(self, n: int):
        """(to_cyclic, to_natural) gather indices for the four-step layout:
        gathered position k1*m + k2 holds natural index k2*D + k1."""
        pair = self._perms.get(n)
        if pair is None:
            D, m = self.D, n // self.D
            k1, k2 = np.meshgrid(np.arange(D), np.arange(m), indexing="ij")
            nat_of_gath = (k2 * D + k1).reshape(-1)  # len n, at gathered pos
            to_natural = np.argsort(nat_of_gath)
            pair = (jnp.asarray(nat_of_gath), jnp.asarray(to_natural))
            self._perms[n] = pair
        return pair

    def _roots_placed(self, n: int):
        """{w^i} Montgomery-packed and block-sharded, cached per n (the
        host packing alone costs seconds at 2^16 — cf. _roots_mont_cached)."""
        r = self._roots.get(n)
        if r is None:
            r = self._place(jnp.asarray(FR_SPEC.pack_mont(fr.roots_of_unity(n))))
            self._roots[n] = r
        return r

    def _place(self, x):
        """Block-shard the last axis over the mesh."""
        return jax.device_put(x, NamedSharding(self.mesh, P(*([None] * (x.ndim - 1) + [AXIS]))))

    def _dntt_natural(self, vals, inverse: bool):
        """Distributed transform with natural-order output (one global
        permute after the all_to_all stages)."""
        n = vals.shape[-1]
        out = dntt._dntt_jit(self._place(vals), inverse, self.mesh)
        _, to_natural = self._perm_pair(n)
        return _permute_last(out, to_natural)

    # -- NTT family -----------------------------------------------------------

    def intt(self, values):
        if self._can_shard(len(values)):
            return dntt.ntt_ints_sharded(values, self.mesh, inverse=True)
        return super().intt(values)

    def ntt(self, values):
        if self._can_shard(len(values)):
            return dntt.ntt_ints_sharded(values, self.mesh)
        return super().ntt(values)

    def intt_poly(self, p):
        from ..protocol.poly import Basis
        from ..ops.dpoly import DPoly

        if isinstance(p, DPoly) and self._can_shard(p.vals.shape[-1]):
            assert p.basis == Basis.LAGRANGE
            return DPoly(self._dntt_natural(p.vals, True), Basis.MONOMIAL)
        return super().intt_poly(p)

    def intt_polys(self, ps):
        from ..protocol.poly import Basis
        from ..ops.dpoly import DPoly

        if not ps:
            return []
        lens = set()
        cols = []
        for p in ps:
            assert p.basis == Basis.LAGRANGE
            if isinstance(p, DPoly):
                cols.append(p.vals)
                lens.add(p.vals.shape[-1])
            else:
                cols.append(jnp.asarray(FR_SPEC.pack_mont(p.values)))
                lens.add(len(p.values))
        if len(lens) == 1 and self._can_shard(next(iter(lens))):
            stacked = jnp.stack(cols, axis=1)  # (16, k, n)
            out = self._dntt_natural(stacked, True)
            return [DPoly(out[:, i], Basis.MONOMIAL) for i in range(len(ps))]
        return super().intt_polys(ps)

    # -- KZG commit -----------------------------------------------------------

    def _mesh_srs(self, setup):
        """SRS limbs padded to D * 2^k columns and block-sharded; padding
        columns repeat the generator (any valid point — their scalars are
        always zero, and the bit-serial kernel never selects them)."""
        cached = getattr(setup, "_mesh_srs_cache", None)
        if cached is not None and cached[0] is not self.mesh:
            cached = None  # built for a different mesh — rebuild
        if cached is None:
            if setup._tpu_cache is None:
                setup._tpu_cache = g1_vec.points_to_device(setup.powers_of_x)
            px, py, pz = setup._tpu_cache
            n = px.shape[-1]
            shard = 1
            while shard * self.D < n:
                shard *= 2
            N = shard * self.D
            if N > n:
                pad = lambda a: jnp.concatenate(
                    [a, jnp.tile(a[:, :1], (1, N - n))], axis=-1
                )
                px, py, pz = pad(px), pad(py), pad(pz)
            cached = (self.mesh, self._place(px), self._place(py), self._place(pz), N)
            setup._mesh_srs_cache = cached
        return cached[1:]

    def _mesh_fb_tables(self, setup):
        """Sharded fixed-base tables: built once per (setup, mesh), each
        device holding only its SRS shard's subset sums."""
        cached = getattr(setup, "_mesh_fb_tables", None)
        if cached is not None and cached[0] is not self.mesh:
            cached = None
        if cached is None:
            px, py, pz, N = self._mesh_srs(setup)
            tx, ty = dmsm.build_tables_sharded(px, py, pz, self.mesh)
            cached = (self.mesh, tx, ty, N)
            setup._mesh_fb_tables = cached
        return cached[1:]

    def _commit_arrays(self, setup, scalars_raw):
        from ..config import get_config

        px, py, pz, N = self._mesh_srs(setup)
        k = scalars_raw.shape[-1]
        if k > N:
            return super()._commit_arrays(setup, scalars_raw)
        if k < N:
            scalars_raw = jnp.pad(scalars_raw, ((0, 0), (0, N - k)))
        sc = self._place(scalars_raw)
        # fixed-base subset-sum tables (8x fewer add-lanes) when the shard
        # admits the 8-point grouping; bit-serial otherwise
        if get_config().commit_fixed_base and (N // self.D) % 8 == 0:
            tx, ty, _ = self._mesh_fb_tables(setup)
            return dmsm.msm_fixed_sharded(tx, ty, sc, self.mesh)
        return dmsm._msm_sharded(px, py, pz, sc, self.mesh)

    # -- grand product --------------------------------------------------------

    def grand_product(self, a, b, c, s1, s2, s3, roots, beta, gamma, k1, k2):
        if len(roots) % self.D == 0:
            return dscan.grand_product_sharded(
                a, b, c, s1, s2, s3, roots, beta, gamma, k1, k2, self.mesh
            )
        return super().grand_product(a, b, c, s1, s2, s3, roots, beta, gamma, k1, k2)

    def grand_product_poly(self, a, b, c, pk, beta, gamma, k1, k2):
        """Device-resident sharded round 2: cross-shard scans (dscan) on the
        Lagrange columns the prover already holds; one device inversion."""
        from ..protocol.poly import Basis
        from ..ops.dpoly import DPoly

        n = a.vals.shape[-1]
        if n % self.D:
            return super().grand_product_poly(a, b, c, pk, beta, gamma, k1, k2)
        cached = getattr(pk, "_mesh_sigma_lagrange", None)
        if cached is None or cached[0] is not self.mesh or cached[1][0].shape[-1] != n:
            packed = tuple(
                self._place(jnp.asarray(FR_SPEC.pack_mont(p.values)))
                for p in (pk.s1, pk.s2, pk.s3)
            )
            pk._mesh_sigma_lagrange = cached = (self.mesh, packed)
        packed = cached[1]
        roots = self._roots_placed(n)
        sc = lambda v: jnp.asarray(FR_SPEC.pack_mont([v % Q]))
        k1r = _mm(roots, sc(k1))
        k2r = _mm(roots, sc(k2))
        pf, pg, sufg = dscan._gp_part1(
            a.vals, b.vals, c.vals, *packed, roots, k1r, k2r, sc(beta), sc(gamma),
            self.mesh,
        )
        total_inv = limbs.mont_pow_fixed(FR_SPEC, pg[:, -1:], Q - 2)
        one = limbs.const_limbs(FR_SPEC.one_mont, (16, 1))
        sufg_shift = jnp.concatenate([sufg[:, 1:], one], axis=-1)
        z_tail = dscan._gp_part2(pf, sufg_shift, total_inv)
        z = jnp.concatenate([one, z_tail[:, :-1]], axis=-1)
        return DPoly(z, Basis.LAGRANGE), z_tail[:, -1:]

    # -- round-3 quotient -----------------------------------------------------

    def _r3_cyclic_consts(self, m: int):
        """Round-3 coset tables with the position-dependent ones (1/Z_H and
        the coset domain points) pre-permuted into the four-step cyclic
        order, so the pointwise combination runs directly on dntt output."""
        c = self._r3_cyc.get(m)
        if c is None:
            from ..ops.prover_kernels import _round3_consts

            zh_inv, gpow, ginvpow, dpow = _round3_consts(m)
            nat_of_gath, to_natural = self._perm_pair(m)
            c = (
                self._place(_permute_last(zh_inv, nat_of_gath)),
                self._place(gpow),
                self._place(ginvpow),
                self._place(_permute_last(dpow, nat_of_gath)),
            )
            self._r3_cyc[m] = c
        return c

    def round3_quotient(
        self,
        a_c, b_c, c_c, z_c, zw_c, s1_c, s2_c, s3_c,
        ql_c, qr_c, qm_c, qo_c, qc_c, pi_c, l1_c,
        beta, gamma, alpha, k1, k2, n,
        pk_cache=None,
    ):
        from ..config import get_config
        from ..protocol.poly import Basis
        from ..ops.dpoly import DPoly, _pad_to
        from ..ops.prover_kernels import (
            _any_nonzero,
            _round3_combine_rows,
        )

        m = 4 * n
        all_dev = all(
            isinstance(p, DPoly)
            for p in (a_c, b_c, c_c, z_c, zw_c, s1_c, s2_c, s3_c,
                      ql_c, qr_c, qm_c, qo_c, qc_c, pi_c, l1_c)
        )
        if not all_dev or not self._can_shard(m):
            return super().round3_quotient(
                a_c, b_c, c_c, z_c, zw_c, s1_c, s2_c, s3_c,
                ql_c, qr_c, qm_c, qo_c, qc_c, pi_c, l1_c,
                beta, gamma, alpha, k1, k2, n, pk_cache=pk_cache,
            )
        zh_inv_cyc, gpow, ginvpow, dpow_cyc = self._r3_cyclic_consts(m)
        polys = [a_c, b_c, c_c, z_c, zw_c, s1_c, s2_c, s3_c,
                 ql_c, qr_c, qm_c, qo_c, qc_c, pi_c, l1_c]
        stacked = self._place(jnp.stack([_pad_to(p.vals, m) for p in polys], axis=1))
        coset = _mm(stacked, gpow[:, None, :])  # natural order, elementwise
        E = dntt._dntt_jit(coset, False, self.mesh)  # (16, 15, m) cyclic
        pk = lambda v: jnp.asarray(FR_SPEC.pack_mont([v % Q]))
        tE = _round3_combine_rows(
            *(E[:, i] for i in range(15)),
            zh_inv_cyc, dpow_cyc,
            pk(beta), pk(gamma), pk(alpha), pk(alpha * alpha), pk(k1), pk(k2),
        )
        # dual four-step inverse: consumes the cyclic layout directly and
        # emits natural block order — no global permute (DIF/DIT pairing)
        t = _mm(dntt._dntt_dual_jit(tE, self.mesh), ginvpow)
        if get_config().debug_asserts:
            assert not bool(
                jax.device_get(_any_nonzero(t[:, 3 * n + 6 :]))
            ), "constraint polynomial not divisible by Z_H"
        return DPoly(t[:, : 3 * n + 6], Basis.MONOMIAL)
