"""TPU compute engine: NTT, KZG commit (MSM) and grand product on device.

Implements the engine contract of ``baby_plonk_tpu.ops.engine`` with the
JAX kernels in this package. The protocol layer stays host-side Python;
only the hot paths identified in SURVEY.md §3.2 cross the device boundary:

  * iNTT/NTT             -> ops.ntt (radix-2, fori_loop butterflies)
  * commit               -> ops.msm against a device-cached SRS
  * grand product        -> associative scans + one host field inversion
    (the reference performs 3n *serial* addchain inversions,
    prover.rs:286-317; here: two prefix scans, a reverse scan, and a
    single inversion — Montgomery's trick in parallel form)
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..fields import fr
from . import g1_vec, limbs, msm as dmsm, ntt as dntt
from .limbs import FieldSpec

FR_SPEC = dmsm.FR_SPEC
Q = fr.Q


@jax.jit
def _from_mont_jit(vals):
    return limbs.from_mont(FR_SPEC, vals)


def _scan_mul(x):
    """Inclusive prefix product along the batch (last) axis (Montgomery form).

    Hillis–Steele doubling (log2(n) full-width mont_muls, shifted operand
    filled with the Montgomery identity R) instead of
    ``jax.lax.associative_scan``: the scan's internal odd/even interleave
    materializes (1, n) temporaries whose TPU layout pads the size-1
    dimension to a full 128-lane tile — at n = 2^20 the
    _grand_product_full compile wanted 33.9 GB of HBM (15.75 available),
    ~30 GB of it pure padding. The doubling scan only ever holds dense
    (16, n) operands. Work is n log n vs the scan's ~2n multiplies, but
    each step is one full-width vector op — measured comparable at small
    n and compiling ~2x faster."""
    return limbs.doubling_scan(
        x, lambda a, b: limbs.mont_mul(FR_SPEC, a, b), FR_SPEC.one_mont
    )


@jax.jit
def _grand_product_part1(a, b, c, s1, s2, s3, roots, k1r, k2r, beta, gamma):
    """Compute f, g and their prefix/suffix scans. All inputs Montgomery."""

    def rlc(x, y):
        return limbs.add_mod(
            FR_SPEC, limbs.add_mod(FR_SPEC, x, limbs.mont_mul(FR_SPEC, beta, y)), gamma
        )

    f = limbs.mont_mul(
        FR_SPEC,
        limbs.mont_mul(FR_SPEC, rlc(a, roots), rlc(b, k1r)),
        rlc(c, k2r),
    )
    g = limbs.mont_mul(
        FR_SPEC,
        limbs.mont_mul(FR_SPEC, rlc(a, s1), rlc(b, s2)),
        rlc(c, s3),
    )
    pf = _scan_mul(f)
    pg = _scan_mul(g)
    sufg = jnp.flip(_scan_mul(jnp.flip(g, axis=-1)), axis=-1)  # sufg[i] = g[i..n-1]
    return pf, pg, sufg


@jax.jit
def _grand_product_part2(pf, sufg_shift, total_inv):
    """z[i+1] = pf[i] * total_inv * g[i+1..n-1]."""
    t = limbs.mont_mul(FR_SPEC, sufg_shift, total_inv)
    return limbs.mont_mul(FR_SPEC, pf, t)


@jax.jit
def _grand_product_full(a, b, c, s1, s2, s3, roots, k1, k2, beta, gamma):
    """Fully device-resident grand product: ONE executable, no host syncs.

    Returns (z, closing): z the (16, n) Lagrange values with z[0] = 1,
    and closing = z_n (the full cycle, must equal 1 — prover.rs:319).
    The single field inversion runs on device (Fermat via mont_pow_fixed)
    instead of round-tripping the running total through the host."""
    mul = lambda x, y: limbs.mont_mul(FR_SPEC, x, y)

    def rlc(x, y):
        return limbs.add_mod(FR_SPEC, limbs.add_mod(FR_SPEC, x, mul(beta, y)), gamma)

    k1r = mul(roots, k1)
    k2r = mul(roots, k2)
    f = mul(mul(rlc(a, roots), rlc(b, k1r)), rlc(c, k2r))
    g = mul(mul(rlc(a, s1), rlc(b, s2)), rlc(c, s3))
    pf = _scan_mul(f)
    pg = _scan_mul(g)
    sufg = jnp.flip(_scan_mul(jnp.flip(g, axis=-1)), axis=-1)
    total_inv = limbs.mont_pow_fixed(FR_SPEC, pg[:, -1:], Q - 2)
    one = limbs.const_limbs(FR_SPEC.one_mont, (16, 1))
    sufg_shift = jnp.concatenate([sufg[:, 1:], one], axis=-1)
    z_tail = mul(pf, mul(sufg_shift, total_inv))  # z[1..n]
    z = jnp.concatenate([one, z_tail[:, :-1]], axis=-1)
    return z, z_tail[:, -1:]


_ROOTS_MONT: dict[int, jnp.ndarray] = {}


def _roots_mont_cached(n: int):
    """Montgomery-packed roots of unity {w^i}, packed once per n."""
    r = _ROOTS_MONT.get(n)
    if r is None:
        r = jnp.asarray(FR_SPEC.pack_mont(fr.roots_of_unity(n)))
        _ROOTS_MONT[n] = r
    return r


class TpuEngine:
    name = "tpu"

    # -- NTT ------------------------------------------------------------------

    def intt(self, values: list[int]) -> list[int]:
        return dntt.ntt_ints(values, inverse=True)

    def ntt(self, values: list[int]) -> list[int]:
        return dntt.ntt_ints(values)

    # -- polynomial factory ---------------------------------------------------

    def poly(self, values, basis):
        from .dpoly import DPoly

        return DPoly.from_ints(list(values), basis)

    def vanishing(self, n: int):
        from .dpoly import DPoly

        return DPoly.vanishing(n)

    def intt_poly(self, p):
        from ..protocol.poly import Basis
        from .dpoly import DPoly

        if isinstance(p, DPoly):
            return p.to_monomial()
        # host Poly input (e.g. preprocessed selectors): pack then convert
        return DPoly.from_ints(p.values, Basis.LAGRANGE).to_monomial()

    def intt_polys(self, ps):
        """One batched (16, k, n) inverse NTT for k same-length polys."""
        from ..protocol.poly import Basis
        from . import ntt as ntt_mod
        from .dpoly import DPoly

        if not ps:
            return []
        lens = set()
        cols = []
        for p in ps:
            if isinstance(p, DPoly):
                assert p.basis == Basis.LAGRANGE
                cols.append(p.vals)
                lens.add(p.vals.shape[-1])
            else:
                assert p.basis == Basis.LAGRANGE
                cols.append(jnp.asarray(FR_SPEC.pack_mont(p.values)))
                lens.add(len(p.values))
        if len(lens) != 1:
            return [self.intt_poly(p) for p in ps]
        stacked = jnp.stack(cols, axis=1)  # (16, k, n)
        out = ntt_mod.ntt_device(stacked, inverse=True)
        return [DPoly(out[:, i], Basis.MONOMIAL) for i in range(len(ps))]

    # -- KZG commit -----------------------------------------------------------

    def _commit_arrays(self, setup, scalars_raw):
        """Device MSM of raw scalar limbs (16, k) against the SRS prefix.
        Fixed-base tables (per-SRS cached) unless disabled by config."""
        from ..config import get_config

        if get_config().commit_fixed_base:
            from . import msm_fixed

            return msm_fixed.tables_for_setup(setup).msm(scalars_raw)
        px, py, pz = setup._tpu_cache
        k = scalars_raw.shape[-1]
        return dmsm.msm_device_arrays((px[:, :k], py[:, :k], pz[:, :k]), scalars_raw)

    def commit(self, setup, polynomial):
        from ..protocol.poly import Basis
        from .dpoly import DPoly

        assert polynomial.basis == Basis.MONOMIAL
        if isinstance(polynomial, DPoly):
            # device-resident fast path: no host sync of the coefficients
            k = polynomial.vals.shape[-1]
            assert k <= setup.srs_len(), (
                f"polynomial length {k} exceeds SRS size"
            )
            if setup._tpu_cache is None:
                setup._tpu_cache = g1_vec.points_to_device(setup.powers_of_x)
            raw = _from_mont_jit(polynomial.vals)
            return g1_vec.point_from_device(self._commit_arrays(setup, raw))
        values = list(polynomial.values)
        while values and values[-1] == 0:
            values.pop()
        if not values:
            from ..curves.g1 import G1

            return G1.identity()
        assert len(values) <= setup.srs_len(), (
            f"polynomial degree {len(values) - 1} exceeds SRS size"
        )
        if setup._tpu_cache is None:
            setup._tpu_cache = g1_vec.points_to_device(setup.powers_of_x)
        sc = jnp.asarray(FR_SPEC.pack_raw(values))
        return g1_vec.point_from_device(self._commit_arrays(setup, sc))

    def commit_many(self, setup, polys):
        """k commitments with ONE host<->device round trip: every MSM is
        dispatched asynchronously, then all k results fetch in a single
        batched transfer + one Fq batch inversion. Through a high-latency
        link (the tunneled chip) this turns k*(dispatch+sync+invert) into
        k dispatches + 1 sync — the difference between the verifier's 8
        preprocessed commits (verifier.rs:60-70) costing ~2 s and ~0.2 s."""
        from ..curves.g1 import G1
        from ..protocol.poly import Basis
        from .dpoly import DPoly
        from . import srs as srs_mod

        parts: list = []
        for p in polys:
            assert p.basis == Basis.MONOMIAL
            if isinstance(p, DPoly):
                k = p.vals.shape[-1]
                assert k <= setup.srs_len()
                if setup._tpu_cache is None:
                    setup._tpu_cache = g1_vec.points_to_device(setup.powers_of_x)
                raw = _from_mont_jit(p.vals)
            else:
                values = list(p.values)
                while values and values[-1] == 0:
                    values.pop()
                if not values:
                    parts.append(None)
                    continue
                assert len(values) <= setup.srs_len()
                if setup._tpu_cache is None:
                    setup._tpu_cache = g1_vec.points_to_device(setup.powers_of_x)
                raw = jnp.asarray(FR_SPEC.pack_raw(values))
            parts.append(self._commit_arrays(setup, raw))
        live = [pt for pt in parts if pt is not None]
        if not live:
            return [G1.identity()] * len(parts)
        stacked = tuple(
            jnp.stack([pt[c] for pt in live], axis=-1) for c in range(3)
        )
        pts = iter(srs_mod.device_points_to_host(stacked))
        return [G1.identity() if pt is None else next(pts) for pt in parts]

    def eval_polys(self, polys, x: int) -> list[int]:
        """One batched kernel + one transfer for k point-evaluations."""
        from .dpoly import DPoly, eval_many

        if all(isinstance(p, DPoly) for p in polys):
            return eval_many(polys, x)
        return [p.eval(x) for p in polys]

    def linear_combine(self, polys, coeffs, const):
        from .dpoly import DPoly
        from .prover_kernels import linear_combine_device

        if all(isinstance(p, DPoly) for p in polys):
            return linear_combine_device(polys, coeffs, const)
        from .engine import HostEngine

        return HostEngine.linear_combine(self, polys, coeffs, const)

    def round3_quotient(self, *args, **kwargs):
        """Fused coset-evaluation quotient (ops/prover_kernels.py); None
        signals the caller to use the generic unfused path."""
        from .dpoly import DPoly
        from .prover_kernels import round3_quotient_device

        if not all(isinstance(p, DPoly) for p in args[:15]):
            return None
        return round3_quotient_device(*args, **kwargs)

    # -- grand product --------------------------------------------------------

    def grand_product(
        self, a, b, c, s1, s2, s3, roots, beta, gamma, k1, k2
    ) -> list[int]:
        n = len(roots)
        pk = FR_SPEC.pack_mont
        k1r = [r * k1 % Q for r in roots]
        k2r = [r * k2 % Q for r in roots]
        args = [jnp.asarray(pk(v)) for v in (a, b, c, s1, s2, s3, roots, k1r, k2r)]
        beta_m = jnp.asarray(pk([beta]))
        gamma_m = jnp.asarray(pk([gamma]))
        pf, pg, sufg = _grand_product_part1(*args, beta_m, gamma_m)
        total = FR_SPEC.unpack_mont(np.asarray(pg[:, -1:]))[0]
        total_inv = fr.inv(total)
        # sufg shifted: row i holds g[i+1 .. n-1], row n-1 holds 1
        one = jnp.asarray(pk([1]))
        sufg_shift = jnp.concatenate([sufg[:, 1:], one], axis=-1)
        z_tail = _grand_product_part2(pf, sufg_shift, jnp.asarray(pk([total_inv])))
        return [1] + FR_SPEC.unpack_mont(np.asarray(z_tail))

    def grand_product_poly(self, a, b, c, pk, beta, gamma, k1, k2):
        """Device-resident round-2 fast path: takes the Lagrange DPolys the
        prover already holds on device, returns (DPoly z, closing) without
        unpacking n values through Python ints (the list-based
        ``grand_product`` costs seconds at 2^16 in host packing alone).
        σ columns and roots are packed once and cached on the pk / engine."""
        from ..protocol.poly import Basis
        from .dpoly import DPoly

        n = a.vals.shape[-1]
        packed = getattr(pk, "_tpu_sigma_lagrange", None)
        if packed is None or packed[0].shape[-1] != n:
            packed = tuple(
                jnp.asarray(FR_SPEC.pack_mont(p.values)) for p in (pk.s1, pk.s2, pk.s3)
            )
            pk._tpu_sigma_lagrange = packed
        roots = _roots_mont_cached(n)
        sc = lambda v: jnp.asarray(FR_SPEC.pack_mont([v % Q]))
        z, closing = _grand_product_full(
            a.vals, b.vals, c.vals, *packed, roots, sc(k1), sc(k2), sc(beta), sc(gamma)
        )
        return DPoly(z, Basis.LAGRANGE), closing
