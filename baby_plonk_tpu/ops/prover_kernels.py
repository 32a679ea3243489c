"""Fused device kernels for the prover's round-3 and round-5 pipelines.

The reference's round 3 (prover.rs:370-500) is a chain of polynomial
multiplies and a long division; the round-1 DPoly port issued each as a
separate device dispatch (~10 NTT round-trips). Here the whole quotient
is ONE fused computation in an evaluation domain:

  * all 15 operand polynomials are batched into a (16, 15, 4n) array,
    scaled onto the coset g*<w_4n> (g = Fr generator, not in the domain)
    and forward-NTT'd together;
  * the full constraint combination (gate + alpha*permutation +
    alpha^2*first-row, prover.rs:417-448) is evaluated POINTWISE;
  * division by Z_H is pointwise multiplication by 1/Z_H(g w^j) — on the
    coset Z_H never vanishes, and Z_H(g w^j) = g^n w_4^j - 1 takes only
    FOUR distinct values (w^(nj) cycles with period 4n/n), so the inverse
    table is 4 host inversions tiled;
  * one inverse NTT + coset unscale gives the exact quotient t of degree
    3n+5 < 4n (no aliasing), replacing the long division
    (polynomial.rs:314-380) entirely.

Round 5's linearization (prover.rs:543-647) is algebraically a single
linear combination sum_i c_i * p_i + const with host-computable scalar
coefficients; ``linear_combine_kernel`` evaluates it as one stacked
multiply-reduce.
"""
from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
import numpy as np

from ..fields import fr
from . import limbs, ntt as ntt_ops
from .ntt import FR_SPEC

Q = fr.Q


def _mm(a, b):
    return limbs.mont_mul(FR_SPEC, a, b)


def _add(a, b):
    return limbs.add_mod(FR_SPEC, a, b)


def _sub(a, b):
    return limbs.sub_mod(FR_SPEC, a, b)


@jax.jit
def _scale_row(row, gpow):
    return _mm(row, gpow)


def _coset_ntt_fwd_row(row, gpow):
    """Coset scale then forward NTT for ONE polynomial (split memory path).

    Dispatched as TWO executables on purpose: fusing the scale into the
    NTT graph raises peak liveness enough to trip the remote compiler's
    alternate-memory assignment CHECK (SIGABRT) at m=2^18, while the
    plain NTT executable compiles clean up to m=2^20 (bench.py).

    The transform goes through ``ntt_device`` (four-step + Pallas
    sub-NTTs above the threshold — 46.3 ms vs the Pease loop's ~6 s at
    2^22, PERFORMANCE.md r4) rather than the Pease plan passed in; the
    plan args (dropped this round) live in _round3_plans for the small
    fused path's kernel."""
    return ntt_ops.ntt_device(_scale_row(row, gpow), inverse=False)


@jax.jit
def _round3_combine_rows(
    aE, bE, cE, zE, zwE, s1E, s2E, s3E,
    qlE, qrE, qmE, qoE, qcE, piE, l1E,
    zh_inv, dpow, beta, gamma, alpha, alpha2, k1, k2,
):
    """Pointwise constraint combination + Z_H division on (16, w) eval
    slices — the split path calls this per position chunk so the ~30 live
    temporaries stay bounded regardless of the domain size."""

    def rlc(x, y):
        return _add(_add(x, _mm(beta, y)), gamma)

    gate = _add(
        _add(_add(_mm(aE, qlE), _mm(bE, qrE)), _mm(_mm(aE, bE), qmE)),
        _add(_add(_mm(cE, qoE), piE), qcE),
    )
    perm = _sub(
        _mm(
            _mm(_mm(rlc(aE, dpow), rlc(bE, _mm(k1, dpow))), rlc(cE, _mm(k2, dpow))),
            zE,
        ),
        _mm(_mm(_mm(rlc(aE, s1E), rlc(bE, s2E)), rlc(cE, s3E)), zwE),
    )
    one = limbs.const_limbs(FR_SPEC.one_mont, zE.shape)
    first = _mm(_sub(zE, one), l1E)
    allE = _add(gate, _add(_mm(alpha, perm), _mm(alpha2, first)))
    return _mm(allE, zh_inv)


def _coset_intt(tE, ginvpow):
    # two executables, same reason as _coset_ntt_fwd_row
    return _scale_row(ntt_ops.ntt_device(tE, inverse=True), ginvpow)


@functools.partial(jax.jit, static_argnums=(0,))
def _round3_kernel(
    n: int,
    stacked,      # (16, 15, m) monomial coeffs, m = 4n
    gpow,         # (16, m) coset powers g^i
    ginvpow,      # (16, m) g^{-i}
    zh_inv,       # (16, m) 1/Z_H on the coset (tiled 4-value pattern)
    dpow,         # (16, m) domain points g*w^j (order matches ntt output)
    beta, gamma, alpha, alpha2, k1, k2,   # (16, 1) Montgomery scalars
    perm_f, tw_f, ninv_f,                 # forward NTT plan (m)
    perm_i, tw_i, ninv_i,                 # inverse NTT plan (m)
):
    spec = FR_SPEC
    coset = _mm(stacked, gpow[:, None, :])
    E = ntt_ops.ntt_mont(coset, False, perm_f, tw_f, ninv_f)
    (aE, bE, cE, zE, zwE, s1E, s2E, s3E,
     qlE, qrE, qmE, qoE, qcE, piE, l1E) = (E[:, i] for i in range(15))

    def rlc(x, y):
        return _add(_add(x, _mm(beta, y)), gamma)

    gate = _add(
        _add(_add(_mm(aE, qlE), _mm(bE, qrE)), _mm(_mm(aE, bE), qmE)),
        _add(_add(_mm(cE, qoE), piE), qcE),
    )
    perm = _sub(
        _mm(
            _mm(_mm(rlc(aE, dpow), rlc(bE, _mm(k1, dpow))), rlc(cE, _mm(k2, dpow))),
            zE,
        ),
        _mm(_mm(_mm(rlc(aE, s1E), rlc(bE, s2E)), rlc(cE, s3E)), zwE),
    )
    one = limbs.const_limbs(spec.one_mont, zE.shape)
    first = _mm(_sub(zE, one), l1E)
    allE = _add(gate, _add(_mm(alpha, perm), _mm(alpha2, first)))
    tE = _mm(allE, zh_inv)
    t = ntt_ops.ntt_mont(tE, True, perm_i, tw_i, ninv_i)
    return _mm(t, ginvpow)


#: per-m device constants for round 3 (coset powers, 1/Z_H pattern,
#: domain points, NTT plans) — protocol constants, uploaded once
_R3_CONSTS: dict[int, tuple] = {}


def _round3_consts(m: int):
    c = _R3_CONSTS.get(m)
    if c is not None:
        return c
    from .dpoly import _pack_scalar, _pow_table

    n = m // 4
    g = fr.GENERATOR
    g_inv = pow(g, Q - 2, Q)
    w = fr.root_of_unity(m)
    # Z_H(g w^j) = g^n w^(nj) - 1; w^n has order 4
    w4 = pow(w, n, Q)
    gn = pow(g, n, Q)
    zh_vals = [pow((gn * pow(w4, j, Q) - 1) % Q, Q - 2, Q) for j in range(4)]
    zh_inv = jnp.tile(jnp.asarray(FR_SPEC.pack_mont(zh_vals)), (1, m // 4))
    gpow = _pow_table(_pack_scalar(g), m)
    ginvpow = _pow_table(_pack_scalar(g_inv), m)
    # g * w^j — MUST go through the jitted kernel: an eager mont_mul
    # at (16, 2^22) materializes every ~60 limb temporaries (256 MB
    # each) unfused and OOMs the 16 GB chip (seen at the 2^20 prove)
    dpow = _scale_row(_pow_table(_pack_scalar(w), m), _pack_scalar(g))
    c = (zh_inv, gpow, ginvpow, dpow)
    # ~4 (16, m)-sized tables = ~1 GB at m = 2^22: cache only while the
    # set fits the budget; above it, rebuild per prove (device-side pow
    # tables, ~100 ms) and let round 3's exit free the HBM — part of the
    # 2^20 prove's OOM fix
    if 4 * m * 16 * 4 <= int(os.environ.get("BPT_R3_CONSTS_BYTES", str(1 << 30))):
        _R3_CONSTS[m] = c
    return c


_R3_PLANS: dict[int, tuple] = {}


def _round3_plans(m: int):
    """Pease NTT plans for the small FUSED round-3 kernel only (the split
    memory path transforms via ntt_device and never needs these — and
    must not pay their host-side bit-reversal table at large m)."""
    p = _R3_PLANS.get(m)
    if p is None:
        plan_f = tuple(jnp.asarray(x) for x in ntt_ops._plan(m, False))
        plan_i = tuple(jnp.asarray(x) for x in ntt_ops._plan(m, True))
        p = (plan_f, plan_i)
        _R3_PLANS[m] = p
    return p


@jax.jit
def _any_nonzero(x):
    return jnp.any(x != 0)


def round3_quotient_device(
    a_c, b_c, c_c, z_c, zw_c, s1_c, s2_c, s3_c,
    ql_c, qr_c, qm_c, qo_c, qc_c, pi_c, l1_c,
    beta: int, gamma: int, alpha: int, k1: int, k2: int, n: int,
    pk_cache=None,
):
    """Inputs are DPoly (MONOMIAL). Returns the quotient t as a DPoly of
    3n+6 coefficients. Matches the unfused path bit-for-bit (exact field
    arithmetic throughout).

    ``pk_cache``: any object (normally the CommonPreprocessedInput) on
    which the split path may stash the coset evaluations of the NINE
    proof-independent rows (s1-s3, ql-qc, L1) — they are fixed per
    proving key, so steady-state proving runs only 5 forward NTTs
    (a, b, c, z, PI); zw's row is a circular shift of z's (see below)."""
    from ..protocol.poly import Basis
    from .dpoly import DPoly, _pad_to

    m = 4 * n
    zh_inv, gpow, ginvpow, dpow = _round3_consts(m)

    pk = lambda v: jnp.asarray(FR_SPEC.pack_mont([v % Q]))

    # memory-capped split path for large domains: the single fused kernel
    # keeps the whole 15-row stack plus ~30 temporaries live at once
    # (OOMs the 16 GB chip at 2^20 and SIGABRTs the remote compiler's
    # memory assignment at m=2^18, i.e. a 2^16-gate prove); above the
    # budget run per-row forward NTTs and chunk the pointwise combine
    # along the position axis. The default keeps the fused kernel only up
    # to m=2^14 (the largest shape it has compiled cleanly on the chip).
    budget = int(os.environ.get("BPT_ROUND3_BATCH_BYTES", str(1 << 27)))
    if 15 * m * 16 * 4 * 4 > budget:
        def fwd(p):
            return _coset_ntt_fwd_row(_pad_to(p.vals, m), gpow)

        # Stashing the 9 proof-independent coset rows saves 9 forward
        # NTTs per steady-state prove but holds 9 * (16, m) * 4 B of HBM
        # for the process lifetime — 2.3 GB at m = 2^22, which (on top of
        # the ~3.2 GB of fixed-base commit tables) OOMed the 16 GB chip
        # in round 4 of the 2^20 prove. Above the byte budget, recompute
        # them per prove (~9 NTTs ≈ 1 s at 2^22) instead of caching.
        rowcache_budget = int(
            os.environ.get("BPT_R3_ROWCACHE_BYTES", str(3 << 29))  # 1.5 GB
        )
        cacheable = pk_cache is not None and 9 * m * 16 * 4 <= rowcache_budget
        fixed = getattr(pk_cache, "_tpu_coset_rows", None) if cacheable else None
        if fixed is None or fixed["m"] != m:
            fixed = {
                "m": m,
                "rows": tuple(fwd(p) for p in (s1_c, s2_c, s3_c, ql_c, qr_c,
                                               qm_c, qo_c, qc_c, l1_c)),
            }
            if cacheable:
                pk_cache._tpu_coset_rows = fixed
        (s1E, s2E, s3E, qlE, qrE, qmE, qoE, qcE, l1E) = fixed["rows"]
        aE, bE, cE, zE, piE = fwd(a_c), fwd(b_c), fwd(c_c), fwd(z_c), fwd(pi_c)
        # zw(g W^j) = z(ω g W^j) = z(g W^(j + m/n)) since ω = W^(m/n): the
        # coset evaluations of z(ωx) are a circular left-shift of z's by
        # m/n = 4 positions (NTT output is in natural domain order), so no
        # forward NTT of zw_c is needed.
        zwE = jnp.roll(zE, -(m // n), axis=-1)
        rows = [aE, bE, cE, zE, zwE, s1E, s2E, s3E,
                qlE, qrE, qmE, qoE, qcE, piE, l1E]
        scal = (pk(beta), pk(gamma), pk(alpha), pk(alpha * alpha), pk(k1), pk(k2))
        pchunk = max(8, min(1 << 19, budget // 4096))
        parts = []
        for lo in range(0, m, pchunk):
            hi = min(lo + pchunk, m)
            parts.append(
                _round3_combine_rows(
                    *(r[:, lo:hi] for r in rows),
                    zh_inv[:, lo:hi], dpow[:, lo:hi], *scal,
                )
            )
        tE = parts[0] if len(parts) == 1 else jnp.concatenate(parts, axis=-1)
        t = _coset_intt(tE, ginvpow)
    else:
        polys = [a_c, b_c, c_c, z_c, zw_c, s1_c, s2_c, s3_c,
                 ql_c, qr_c, qm_c, qo_c, qc_c, pi_c, l1_c]
        stacked = jnp.stack([_pad_to(p.vals, m) for p in polys], axis=1)
        (perm_f, tw_f, ninv_f), (perm_i, tw_i, ninv_i) = _round3_plans(m)
        t = _round3_kernel(
            n, stacked, gpow, ginvpow, zh_inv, dpow,
            pk(beta), pk(gamma), pk(alpha), pk(alpha * alpha), pk(k1), pk(k2),
            perm_f, tw_f, ninv_f, perm_i, tw_i, ninv_i,
        )
    from ..config import get_config

    if get_config().debug_asserts:
        # exact division <=> the interpolant has degree <= 3n+5: the top
        # coefficients of the 4n-interpolation must vanish (checked on
        # device; fetching the slice itself is MBs at large n)
        assert not bool(
            jax.device_get(_any_nonzero(t[:, 3 * n + 6 :]))
        ), "constraint polynomial not divisible by Z_H"
    return DPoly(t[:, : 3 * n + 6], Basis.MONOMIAL)


@jax.jit
def _linear_combine_kernel(stacked, coeffs, const):
    """sum_i coeffs[i] * stacked[:, i] + const*x^0.

    stacked (16, R, m); coeffs (16, R, 1); const (16, 1)."""
    terms = _mm(stacked, coeffs)  # (16, R, m)
    R = terms.shape[1]
    while R > 1:
        half = R // 2
        lo = terms[:, :half]
        hi = terms[:, half : 2 * half]
        rest = terms[:, 2 * half :]
        terms = jnp.concatenate([_add(lo, hi), rest], axis=1)
        R = terms.shape[1]
    out = terms[:, 0]
    head = _add(out[:, :1], const)
    return jnp.concatenate([head, out[:, 1:]], axis=-1)


def linear_combine_device(polys, coeffs: list[int], const: int):
    """DPoly linear combination with one kernel.

    Above BPT_COMBINE_CHUNK positions (default 2^19) the combine runs in
    position chunks: the round-5 linearization stacks 15 rows of 3n+6
    coefficients, a 3.1 GB array at 2^20 gates before temporaries."""
    from ..protocol.poly import Basis
    from .dpoly import DPoly, _pad_to, _pack_scalar, _slice_pad

    assert polys and len(polys) == len(coeffs)
    m = max(p.vals.shape[-1] for p in polys)
    ck = jnp.asarray(FR_SPEC.pack_mont([c % Q for c in coeffs]))[:, :, None]
    W = int(os.environ.get("BPT_COMBINE_CHUNK", str(1 << 19)))
    if m <= W:
        stacked = jnp.stack([_pad_to(p.vals, m) for p in polys], axis=1)
        out = _linear_combine_kernel(stacked, ck, _pack_scalar(const))
        return DPoly(out, Basis.MONOMIAL)
    zero = _pack_scalar(0)
    parts = []
    for lo in range(0, m, W):
        w = min(W, m - lo)
        chunk = jnp.stack([_slice_pad(p.vals, lo, w) for p in polys], axis=1)
        parts.append(
            _linear_combine_kernel(
                chunk, ck, _pack_scalar(const) if lo == 0 else zero
            )
        )
    return DPoly(jnp.concatenate(parts, axis=-1), Basis.MONOMIAL)
