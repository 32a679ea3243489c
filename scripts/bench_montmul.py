"""A/B bench of mont_mul formulations at large batch on the live chip.

The prover's hot kernels (NTT stages, fixed-base MSM adds, round-3
pointwise combine) are all pointwise mont_muls over (L, n) limb arrays;
at n = 2^20 the production formulation measured 41-51 ms/pass where the
HBM roofline (read a + read b + write out = 192 MB at ~800 GB/s) is
~0.25 ms.  Hypothesis: the sequential `_slice_add` concat chains inside
`_mul_wide` (16 iterations x 2 accumulators, each materializing a full
(2L, n) uint32 buffer) defeat XLA fusion and turn one pass into ~30 GB
of HBM traffic.

Variants:
  A  production  ops.limbs.mont_mul (slice_add accumulators, 3 full carry passes)
  B  cols        column-sum _mul_wide (flat per-limb sums, no concats) with the
                 production mont_mul structure (carry-normalize every product)
  C  cols+lazy   column-sum products kept as raw column sums; carries resolved
                 only where required (t mod R, m mod R, one final 2L+1 pass)

Timing: K passes chained in one jit (fori_loop) -> one device sync, so the
tunnel's ~30 ms sync latency amortizes away.

Usage: python scripts/bench_montmul.py [--sizes 16,18,20] [--reps 20]
"""
from __future__ import annotations

import argparse
import sys
import time

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import functools

import jax
import jax.numpy as jnp
import numpy as np

from baby_plonk_tpu.fields import fr
from baby_plonk_tpu.ops import limbs
from baby_plonk_tpu.ops.limbs import MASK16, U32, FieldSpec, _borrow_scan, _carry_pass, _bc

SPEC = FieldSpec(fr.Q, 16)


# -- variant B/C building block: column-sum schoolbook product ----------------


def mul_wide_cols(a, b, out_limbs: int):
    """Raw column sums of the radix-16 schoolbook product.

    out[k] = sum_{i+j=k} lo(a_i*b_j) + sum_{i+j=k-1} hi(a_i*b_j); limbs are
    NOT carry-normalized (each < 2^21 for L <= 16 operands: <=16 lo + <=16 hi
    terms, each < 2^16).  One flat expression per output limb -> one XLA
    fusion, no concat-materialized accumulators.
    """
    La, Lb = a.shape[0], b.shape[0]
    shape = jnp.broadcast_shapes(a.shape[1:], b.shape[1:])
    terms = [[] for _ in range(out_limbs)]
    for i in range(La):
        for j in range(Lb):
            k = i + j
            if k >= out_limbs:
                break
            p = a[i] * b[j]  # exact 16x16 -> 32 bits
            terms[k].append(p & MASK16)
            if k + 1 < out_limbs:
                terms[k + 1].append(p >> 16)
    rows = []
    for k in range(out_limbs):
        if not terms[k]:
            rows.append(jnp.zeros(shape, dtype=U32))
            continue
        # pairwise tree to keep the expression shallow
        level = terms[k]
        while len(level) > 1:
            nxt = [level[i] + level[i + 1] for i in range(0, len(level) - 1, 2)]
            if len(level) % 2:
                nxt.append(level[-1])
            level = nxt
        rows.append(jnp.broadcast_to(level[0], shape))
    return jnp.stack(rows, axis=0)


def mont_mul_b(spec: FieldSpec, a, b):
    """Production mont_mul structure, column-sum products."""
    L = spec.L
    a, b = jnp.broadcast_arrays(a, b)
    t = _carry_pass(mul_wide_cols(a, b, 2 * L))
    m = _carry_pass(mul_wide_cols(t[:L], _bc(spec.nprime_limbs, t[:L]), L))
    m = jnp.concatenate([m[: L - 1], m[L - 1 :] & spec.mask], axis=0)
    mn = _carry_pass(mul_wide_cols(m, _bc(spec.n_limbs, m), 2 * L))
    s = t + mn
    s = jnp.concatenate([s, jnp.zeros((1,) + s.shape[1:], dtype=U32)], axis=0)
    u = _carry_pass(s)
    hi = u[L:]
    n_ext = jnp.concatenate(
        [_bc(spec.n_limbs, hi[:L]), jnp.zeros((1,) + hi.shape[1:], dtype=U32)], axis=0
    )
    red, borrow = _borrow_scan(hi, n_ext)
    return jnp.where(borrow, hi, red)[:L]


def mont_mul_c(spec: FieldSpec, a, b):
    """Lazy-carry mont_mul: carries resolved only for (t mod R), (m mod R),
    and one final 2L+1 pass over t_cols + mn_cols."""
    L = spec.L
    a, b = jnp.broadcast_arrays(a, b)
    t_cols = mul_wide_cols(a, b, 2 * L)  # limbs < 2^21
    t_low = _carry_pass(t_cols[:L], mask_top=True)  # == t mod R
    m = _carry_pass(
        mul_wide_cols(t_low, _bc(spec.nprime_limbs, t_low), L), mask_top=True
    )  # == m mod R
    mn_cols = mul_wide_cols(m, _bc(spec.n_limbs, m), 2 * L)  # limbs < 2^21
    s = t_cols + mn_cols  # limbs < 2^22
    s = jnp.concatenate([s, jnp.zeros((1,) + s.shape[1:], dtype=U32)], axis=0)
    u = _carry_pass(s)  # low L limbs are zero (t + m*n == 0 mod R)
    hi = u[L:]
    n_ext = jnp.concatenate(
        [_bc(spec.n_limbs, hi[:L]), jnp.zeros((1,) + hi.shape[1:], dtype=U32)], axis=0
    )
    red, borrow = _borrow_scan(hi, n_ext)
    return jnp.where(borrow, hi, red)[:L]


# -- harness -------------------------------------------------------------------


def chain_fn(mul, k: int):
    @jax.jit
    def run(x, y):
        def body(_, x):
            return mul(SPEC, x, y)

        return jax.lax.fori_loop(0, k, body, x)

    return run


def check(mul, n=257):
    rng = np.random.default_rng(7)
    xs = [(int(v) * 0x9E3779B97F4A7C15) % fr.Q for v in rng.integers(0, 1 << 63, size=n)]
    ys = [(int(v) * 0xC2B2AE3D27D4EB4F) % fr.Q for v in rng.integers(0, 1 << 63, size=n)]
    a = jnp.asarray(SPEC.pack_mont(xs))
    b = jnp.asarray(SPEC.pack_mont(ys))
    out = SPEC.unpack_mont(np.asarray(jax.device_get(mul(SPEC, a, b))))
    want = [x * y % fr.Q for x, y in zip(xs, ys)]
    assert out == want, "mont_mul variant disagrees with host"


def bench_one(name, mul, n, k, reps):
    rng = np.random.default_rng(3)
    xs = [int(v) % fr.Q for v in rng.integers(0, 1 << 62, size=n)]
    a = jnp.asarray(SPEC.pack_mont(xs))
    b = jnp.asarray(SPEC.pack_mont(list(reversed(xs))))
    f = chain_fn(mul, k)
    t0 = time.perf_counter()
    f(a, b).block_until_ready()
    compile_s = time.perf_counter() - t0
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        f(a, b).block_until_ready()
        best = min(best, time.perf_counter() - t0)
    per_pass = (best - 0.0) / k
    gbps = 3 * 16 * 4 * n / per_pass / 1e9  # read a + read b + write
    print(
        f"  {name:10s} n=2^{n.bit_length()-1:<2d} {per_pass*1e3:9.3f} ms/pass  "
        f"(chain of {k}: {best*1e3:8.1f} ms; compile {compile_s:5.1f} s; "
        f"min-traffic BW {gbps:6.1f} GB/s)"
    )
    return per_pass


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--sizes", default="16,18,20")
    ap.add_argument("--reps", type=int, default=5)
    ap.add_argument("--chain", type=int, default=16)
    ap.add_argument("--variants", default="A,B,C")
    args = ap.parse_args()

    print(f"devices: {jax.devices()}")
    variants = {
        "A": limbs.mont_mul,
        "B": mont_mul_b,
        "C": mont_mul_c,
    }
    sel = [v.strip() for v in args.variants.split(",")]
    for name in sel:
        check(variants[name])
        print(f"variant {name}: host agreement OK")

    for lg in [int(s) for s in args.sizes.split(",")]:
        for name in sel:
            bench_one(name, variants[name], 1 << lg, args.chain, args.reps)


if __name__ == "__main__":
    main()
