"""Vectorized multi-precision modular arithmetic for TPU (JAX).

TPUs have no 64-bit integer multiplier, so 255/381-bit field elements are
decomposed into 16-bit limbs held in uint32 lanes: a 16x16-bit product fits
a uint32 exactly, and column sums of <= 2*L such products stay under 2^22.
This is the TPU-native re-design of the reference's 64-bit Montgomery
arithmetic (lib/bls12_381/src/scalar.rs:514-588, fp.rs:565-611) — same
math, data layout and algorithms chosen for the VPU:

* **limb-major layout**: an element batch is an array of shape
  (L, ...batch) uint32 — limb index leading, batch dims trailing — so a
  per-limb operation is a full-width vector op over the batch (the batch
  rides the 128-lane axis), never a 1-lane column slice;
* **carry-lookahead, not carry chains**: carries/borrows are resolved
  with a Kogge–Stone generate/propagate prefix scan
  (``jax.lax.associative_scan`` over the limb axis, log2(L) depth)
  instead of an L-step sequential loop, keeping graphs small and the
  critical path logarithmic;
* field elements are kept in **Montgomery form** (x*R mod N, R = 2^(16L))
  and canonical ([0, N)); Montgomery reduction is the full-product
  variant (one m = t*N' mod R, one m*N, one shift) which vectorizes
  cleanly.

All functions are shape-polymorphic in the trailing (batch) dimensions
and jit-friendly (static limb counts, no data-dependent control flow).
"""
from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
import numpy as np

U32 = jnp.uint32
MASK16 = np.uint32(0xFFFF)


# -----------------------------------------------------------------------------
# Host-side packing (limb-major: (L, n))
# -----------------------------------------------------------------------------


def int_to_limbs(x: int, L: int, radix: int = 16) -> np.ndarray:
    """Python int -> (L,) uint32 little-endian limbs of ``radix`` bits."""
    m = (1 << radix) - 1
    return np.array([(x >> (radix * i)) & m for i in range(L)], dtype=np.uint32)


def limbs_to_int(a) -> int:
    """(L,) limbs -> Python int (host-side)."""
    a = np.asarray(a, dtype=np.uint64)
    return sum(int(v) << (16 * i) for i, v in enumerate(a))


def ints_to_array(xs, L: int) -> np.ndarray:
    """list[int] -> (L, n) uint32 limb array (host-side, via bytes codec)."""
    nbytes = 2 * L
    buf = b"".join(int(x).to_bytes(nbytes, "little") for x in xs)
    u16 = np.frombuffer(buf, dtype="<u2").reshape(len(xs), L)
    return np.ascontiguousarray(u16.T).astype(np.uint32)


def array_to_ints(a) -> list[int]:
    """(L, n) limb array -> list[int] (host-side, via bytes codec)."""
    a = np.asarray(a)
    L, n = a.shape
    u16 = np.ascontiguousarray(a.T.astype("<u2"))
    buf = u16.tobytes()
    nbytes = 2 * L
    return [
        int.from_bytes(buf[i * nbytes : (i + 1) * nbytes], "little") for i in range(n)
    ]


class FieldSpec:
    """Static (host-side) description of a prime field for the TPU kernels.

    Precomputes the Montgomery constants for modulus ``n``:
      R = 2^(16 L) mod n, R2 = R^2 mod n, NPRIME = -n^(-1) mod R.

    Note: both BLS12-381 moduli have top limb < 2^15, so the sum of two
    canonical elements never overflows the top 16-bit limb — add/sub can
    stay within L limbs.
    """

    def __init__(self, modulus: int, L: int, radix: int = 16):
        assert radix in (12, 16)
        assert modulus < (1 << (radix * L - 1)), "top limb must have headroom"
        self.modulus = modulus
        self.L = L
        self.radix = radix
        self.mask = np.uint32((1 << radix) - 1)
        self.R = (1 << (radix * L)) % modulus
        self.R2 = self.R * self.R % modulus
        self.NPRIME = (-pow(modulus, -1, 1 << (radix * L))) % (1 << (radix * L))
        # device-side constants, shape (L, 1) so they broadcast over batches
        self.n_limbs = int_to_limbs(modulus, L, radix).reshape(L, 1)
        self.nprime_limbs = int_to_limbs(self.NPRIME, L, radix).reshape(L, 1)
        self.r2_limbs = int_to_limbs(self.R2, L, radix).reshape(L, 1)
        self.one_mont = int_to_limbs(self.R % modulus, L, radix).reshape(L, 1)
        # native-codec constants (64-bit limb views); for radix 12 the
        # bit-width is radix*L, still a multiple of 64 for our specs
        nl = (radix * L) // 64
        self._mod_u64 = np.array(
            [(modulus >> (64 * i)) & 0xFFFFFFFFFFFFFFFF for i in range(nl)],
            dtype=np.uint64,
        )
        self._r2_u64 = np.array(
            [(self.R2 >> (64 * i)) & 0xFFFFFFFFFFFFFFFF for i in range(nl)],
            dtype=np.uint64,
        )
        self._n0inv64 = (-pow(modulus, -1, 1 << 64)) % (1 << 64)

    # -- host-side conversions -------------------------------------------------

    def to_mont_int(self, x: int) -> int:
        return x * self.R % self.modulus

    def from_mont_int(self, x: int) -> int:
        return x * pow(self.R, -1, self.modulus) % self.modulus

    def pack_mont(self, xs) -> np.ndarray:
        """list[int] canonical residues -> (L, n) Montgomery-form limb array.

        Uses the native CIOS batch kernel (baby_plonk_tpu.native) when
        available; pure-Python fallback otherwise."""
        from .. import native

        if self.radix == 16 and native.available() and len(xs) >= 8:
            u64 = self._ints_to_u64(xs)
            scaled = native.mont_mul_batch(u64, self._r2_u64, self._mod_u64, self._n0inv64)
            return self._u64_to_limbs(scaled)
        if self.radix != 16:
            return np.stack(
                [int_to_limbs(x * self.R % self.modulus, self.L, self.radix) for x in xs],
                axis=1,
            ) if xs else np.zeros((self.L, 0), dtype=np.uint32)
        return ints_to_array([x * self.R % self.modulus for x in xs], self.L)

    def unpack_mont(self, a) -> list[int]:
        from .. import native

        a = np.asarray(a)
        if self.radix == 16 and native.available() and a.shape[-1] >= 8:
            u64 = self._limbs_to_u64(a)
            one = np.zeros((16 * self.L) // 64, dtype=np.uint64)
            one[0] = 1
            canon = native.mont_mul_batch(u64, one, self._mod_u64, self._n0inv64)
            return self._u64_to_ints(canon)
        rinv = pow(self.R, -1, self.modulus)
        if self.radix != 16:
            vals = [
                sum(int(a[j, i]) << (self.radix * j) for j in range(self.L))
                for i in range(a.shape[1])
            ]
            return [v * rinv % self.modulus for v in vals]
        return [v * rinv % self.modulus for v in array_to_ints(a)]

    # -- native-codec helpers (64-bit limb views) ------------------------------

    def _ints_to_u64(self, xs) -> np.ndarray:
        nbytes = 2 * self.L
        buf = b"".join(int(x).to_bytes(nbytes, "little") for x in xs)
        return np.frombuffer(buf, dtype="<u8").reshape(len(xs), self.L // 4).copy()

    def _u64_to_ints(self, u64) -> list[int]:
        buf = np.ascontiguousarray(u64, dtype="<u8").tobytes()
        nbytes = 2 * self.L
        return [
            int.from_bytes(buf[i * nbytes : (i + 1) * nbytes], "little")
            for i in range(u64.shape[0])
        ]

    def _u64_to_limbs(self, u64) -> np.ndarray:
        n = u64.shape[0]
        u16 = np.ascontiguousarray(u64, dtype="<u8").view("<u2").reshape(n, self.L)
        return np.ascontiguousarray(u16.T).astype(np.uint32)

    def _limbs_to_u64(self, a) -> np.ndarray:
        L, n = a.shape
        u16 = np.ascontiguousarray(a.T.astype("<u2"))
        return u16.view("<u8").reshape(n, L // 4).copy()

    def pack_raw(self, xs) -> np.ndarray:
        """list[int] -> (L, n) limb array, NO Montgomery scaling (e.g. MSM scalars)."""
        if self.radix != 16:
            return np.stack(
                [int_to_limbs(x % self.modulus, self.L, self.radix) for x in xs], axis=1
            )
        return ints_to_array([x % self.modulus for x in xs], self.L)


# -----------------------------------------------------------------------------
# Carry / borrow resolution via Kogge–Stone prefix scans
# -----------------------------------------------------------------------------


def _shift_up(x, fill=0):
    """Shift rows up by one limb position: out[k] = x[k-1], out[0] = fill."""
    return _row_shift(x, 1, fill)


def _ks_prefix_carry(g, p):
    """Inclusive prefix carry-lookahead (Kogge–Stone): G[k] = carry-out of
    limbs 0..k given per-limb (generate, propagate) bools.

    Hand-rolled log-depth shift/combine (no lax.associative_scan — its
    lowering captures constants, which Pallas kernels reject), combining
    (g_hi | (p_hi & g_lo), p_lo & p_hi) with zero/one fills as identities.
    """
    L = g.shape[0]
    shift = 1
    if _MOSAIC_SAFE:
        # Mosaic cannot shift i1 vregs along sublanes (a bool concatenate
        # crashes the compiler internals; probed 2026-08-21: bool
        # shift-concat FAILs at every (L, lanes) shape while the same
        # lookahead in uint32 lanes PASSes) — run the chain in uint32.
        g32, p32 = g.astype(U32), p.astype(U32)
        while shift < L:
            g_lo = _row_shift(g32, shift, 0)
            p_lo = _row_shift(p32, shift, 1)
            g32 = g32 | (p32 & g_lo)
            p32 = p32 & p_lo
            shift <<= 1
        return g32.astype(jnp.bool_)
    while shift < L:
        g_lo = _row_shift(g, shift, False)
        p_lo = _row_shift(p, shift, True)
        g = g | (p & g_lo)
        p = p & p_lo
        shift <<= 1
    return g


def _carry_pass(t, mask_top: bool = False, radix: int = 16):
    """Normalize limbs to ``radix`` bits over axis 0.

    Precondition: every limb < 2^31 (headroom for one add). Output limbs
    are < 2^radix; the top limb keeps any residual carry unless
    ``mask_top``. Value rounds (enough that remaining carries are binary)
    then a Kogge–Stone binary-carry round.
    """
    mask = np.uint32((1 << radix) - 1)
    # value rounds: bound' = mask + (bound >> radix); stop when < 2*mask
    s = t
    bound = 1 << 31
    while bound > 2 * int(mask) - 1:
        s = (s & mask) + _shift_up(s >> radix)
        bound = int(mask) + (bound >> radix)
    g = (s >> radix).astype(jnp.bool_)
    p = (s & mask) == mask
    G = _ks_prefix_carry(g, p)
    carry_in = _shift_up(G.astype(U32))
    full = s + carry_in
    out = full & mask
    if not mask_top:
        # re-attach the top limb's carry-out (value may exceed radix bits)
        if _MOSAIC_SAFE:  # iota select instead of a sublane concat
            iota = jax.lax.broadcasted_iota(jnp.int32, out.shape, 0)
            out = jnp.where(iota == out.shape[0] - 1, full, out)
        else:
            out = jnp.concatenate([out[:-1], full[-1:]], axis=0)
    return out


def _borrow_scan(a, b, radix: int = 16):
    """Borrow-lookahead for a - b (limbwise, both canonical radix-bit limbs).

    Returns (diff_limbs, borrow_out) where diff = a - b + borrow_out * 2^(radix L).
    """
    base = np.uint32(1 << radix)
    mask = np.uint32((1 << radix) - 1)
    d = a + base - b  # borrow-free partial diff
    g = d < base  # generates a borrow
    p = (d & mask) == 0  # propagates a borrow (d == base)
    G = _ks_prefix_carry(g, p)
    borrow_in = _shift_up(G.astype(U32))
    out = (d - borrow_in) & mask
    # positive-index slice: a negative scalar index lowers to dynamic_slice,
    # which the Mosaic (Pallas TPU) backend cannot lower
    L = G.shape[0]
    return out, jnp.squeeze(G[L - 1 : L], axis=0)


def _geq(a, b, radix: int = 16):
    """a >= b over little-endian limbs. Returns bool (batch,)."""
    _, borrow = _borrow_scan(a, b, radix)
    return ~borrow


def _sub_raw(a, b, radix: int = 16):
    """a - b assuming a >= b."""
    out, _ = _borrow_scan(a, b, radix)
    return out


def _add_raw(a, b, radix: int = 16):
    """a + b with carries resolved (top limb may exceed radix bits)."""
    return _carry_pass(a + b, radix=radix)


# -----------------------------------------------------------------------------
# Modular ops (spec is a static argument)
# -----------------------------------------------------------------------------


def const_limbs(spec_const, shape):
    """Materialize a host-side (L, 1) constant as a (L, *shape[1:]) array
    built from scalar literals.

    Scalar literals inline into the jaxpr (no captured consts), which is
    required for these helpers to be usable inside Pallas kernels."""
    ints = [int(v) for v in np.asarray(spec_const).reshape(-1)]
    rows = [jnp.full(shape[1:], v, dtype=U32) for v in ints]
    return jnp.stack(rows, axis=0)


def _bc(spec_const, ref):
    """Broadcast an (L, 1) spec constant to ref's shape."""
    return const_limbs(spec_const, ref.shape)


def add_mod(spec: FieldSpec, a, b):
    """(a + b) mod n for canonical a, b."""
    a, b = jnp.broadcast_arrays(a, b)
    s = _add_raw(a, b, spec.radix)  # top limb in range (modulus headroom)
    n = _bc(spec.n_limbs, s)
    red, borrow = _borrow_scan(s, n, spec.radix)
    return jnp.where(borrow, s, red)


def sub_mod(spec: FieldSpec, a, b):
    """(a - b) mod n for canonical a, b."""
    a, b = jnp.broadcast_arrays(a, b)
    d, borrow = _borrow_scan(a, b, spec.radix)
    n = _bc(spec.n_limbs, d)
    # on borrow, d holds a - b + 2^(radix L); adding n and masking the top
    # limb's carry-out subtracts the 2^(radix L) again -> a - b + n
    fixed = _carry_pass(d + n, mask_top=True, radix=spec.radix)
    return jnp.where(borrow, fixed, d)


def neg_mod(spec: FieldSpec, a):
    """(-a) mod n; maps 0 -> 0."""
    n = _bc(spec.n_limbs, a)
    d = _sub_raw(n, a, spec.radix)
    return jnp.where(is_zero(a), jnp.zeros_like(a), d)


#: trace-time product-formulation switch (see _mul_cols). The FLAT form
#: emits one expression per output limb — fastest at wide batches (1.9x on
#: 2^20-lane mont_mul) but ~35x the HLO ops per product, which explodes
#: XLA compile time on mul-DENSE graphs (a tiny fixed-base table build —
#: hundreds of muls in one graph with the unrolled inversion addchain —
#: went from ~60 s to >10 min of compile). The COMPACT form accumulates
#: via slice+concat — ~15 HLO ops per row, proven round-2 compile times —
#: at ~2x runtime on 2^20-wide pointwise ops (irrelevant inside the
#: mul-dense kernels, which all run at <= 2^14 lanes where the forms tie).
#: Mul-dense kernels opt in with `with limbs.compact_mul(): ...` at trace
#: time (ops/msm_fixed.py, ops/srs.py, ops/msm.py).
_COMPACT_MUL = False


class compact_mul:
    """Context manager: trace enclosed code with the compile-light compact
    product formulation. Purely a trace-time switch — safe because each
    jitted kernel traces under a fixed setting."""

    def __enter__(self):
        global _COMPACT_MUL
        self._prev = _COMPACT_MUL
        _COMPACT_MUL = True

    def __exit__(self, *exc):
        global _COMPACT_MUL
        _COMPACT_MUL = self._prev


#: Trace-time switch for Pallas-TPU kernel bodies: Mosaic's vector
#: lowering hits an internal assert (`in_bounds_vreg.getType() ==
#: native_vreg_ty`, jax 0.9.0, logged 2026-08-20) on the sublane-axis
#: concatenates the carry/borrow passes use for their static row shifts
#: (offsets 1/2/4 are not vreg-aligned). Under `mosaic_safe()` those
#: shifts lower as a native sublane rotate (pltpu.roll) + an iota select
#: instead — same values, no concat.
_MOSAIC_SAFE = False


class mosaic_safe:
    """Context manager: trace enclosed code (a Pallas kernel body) with
    rotate-based limb shifts instead of sublane concatenates."""

    def __enter__(self):
        global _MOSAIC_SAFE
        self._prev = _MOSAIC_SAFE
        _MOSAIC_SAFE = True

    def __exit__(self, *exc):
        global _MOSAIC_SAFE
        _MOSAIC_SAFE = self._prev


def _row_shift(x, shift: int, fill):
    """out[k] = x[k - shift] for k >= shift, else ``fill`` (a scalar).
    Concat form by default; rotate+select under mosaic_safe()."""
    if not _MOSAIC_SAFE:
        pad = jnp.full_like(x[:shift], fill)
        return jnp.concatenate([pad, x[:-shift]], axis=0)
    from jax.experimental.pallas import tpu as pltpu

    r = pltpu.roll(x, shift, 0)
    iota = jax.lax.broadcasted_iota(jnp.int32, x.shape, 0)
    return jnp.where(iota < shift, jnp.full_like(x, fill), r)


def _slice_add(acc, start, p):
    # acc[start:start+|p|] += p via slice+concat: `.at[].add` lowers to
    # scatter, which Mosaic cannot lower and XLA updates by copy
    stop = start + p.shape[0]
    parts = []
    if start > 0:
        parts.append(acc[:start])
    parts.append(acc[start:stop] + p)
    if stop < acc.shape[0]:
        parts.append(acc[stop:])
    return jnp.concatenate(parts, axis=0) if len(parts) > 1 else parts[0]


def _mul_cols_compact(a, b, out_limbs: int, radix: int = 16):
    """Compact form of _mul_cols: same raw column sums, built by La
    slice+concat row accumulations over the (Lb,)-row partial products —
    O(La) HLO ops total instead of O(La*Lb) (see _COMPACT_MUL note)."""
    La = a.shape[0]
    Lb = b.shape[0]
    shape = jnp.broadcast_shapes(a.shape[1:], b.shape[1:])
    split = radix > 12
    acc = jnp.zeros((out_limbs,) + shape, dtype=U32)
    for i in range(La):
        w = min(Lb, out_limbs - i)
        if w <= 0:
            break
        p = a[i : i + 1] * b  # exact: 16x16 -> 32 bits (or 24 for radix 12)
        if not split:
            acc = _slice_add(acc, i, p[:w])
            continue
        acc = _slice_add(acc, i, p[:w] & MASK16)
        w2 = min(Lb, out_limbs - i - 1)
        if w2 > 0:
            acc = _slice_add(acc, i + 1, p[:w2] >> 16)
    return acc


def _mul_cols(a, b, out_limbs: int, radix: int = 16):
    """Raw column sums of the schoolbook product — NOT carry-normalized.

    a: (La, ...), b: (Lb, ...) -> (out_limbs, ...) with
    out[k] = sum_{i+j=k} lo(a_i*b_j) + sum_{i+j=k-1} hi(a_i*b_j).
    Every output limb stays < 2^23 (<= 2*min(La,Lb) <= 64 terms, each
    < 2^16 after the lo/hi split; radix <= 12 skips the split — raw
    24-bit products, sums < 2^30 for <= 32 terms).

    Default (flat) form: one expression per output limb (static row
    indexing, a pairwise add tree, one stack) so XLA compiles the whole
    product into a single loop fusion — ~2x wall-clock over the compact
    form on 2^20-element batches (measured: scripts/bench_montmul.py).
    Under `compact_mul()` the slice+concat form is used instead (35x
    fewer HLO ops; for mul-dense graphs whose compile time explodes).
    """
    if _COMPACT_MUL:
        return _mul_cols_compact(a, b, out_limbs, radix)
    La = a.shape[0]
    Lb = b.shape[0]
    shape = jnp.broadcast_shapes(a.shape[1:], b.shape[1:])
    split = radix > 12
    mask = np.uint32((1 << radix) - 1)
    terms: list[list] = [[] for _ in range(out_limbs)]
    for i in range(La):
        for j in range(Lb):
            k = i + j
            if k >= out_limbs:
                break
            p = a[i] * b[j]  # exact: 16x16 -> 32 bits (or 24 for radix 12)
            if not split:
                terms[k].append(p)
                continue
            terms[k].append(p & mask)
            if k + 1 < out_limbs:
                terms[k + 1].append(p >> radix)
    rows = []
    for k in range(out_limbs):
        level = terms[k]
        if not level:
            rows.append(jnp.zeros(shape, dtype=U32))
            continue
        while len(level) > 1:  # pairwise tree keeps the expression shallow
            nxt = [level[i] + level[i + 1] for i in range(0, len(level) - 1, 2)]
            if len(level) % 2:
                nxt.append(level[-1])
            level = nxt
        rows.append(jnp.broadcast_to(level[0], shape))
    return jnp.stack(rows, axis=0)


def _mul_wide(a, b, out_limbs: int, radix: int = 16):
    """Schoolbook product over radix-bit limbs, carry-normalized."""
    return _carry_pass(_mul_cols(a, b, out_limbs, radix), radix=radix)


def _sqr_cols_compact(a, out_limbs: int, radix: int = 16):
    """Compact (slice+concat) form of _sqr_cols; O(L) HLO ops."""
    L = a.shape[0]
    split = radix > 12
    shape = a.shape[1:]
    acc = jnp.zeros((out_limbs,) + shape, dtype=U32)
    for i in range(L):
        w = min(L - i, out_limbs - 2 * i)
        if w <= 0:
            break
        p = a[i : i + 1] * a[i : i + w]  # a_i*a_j, j >= i
        if not split:  # radix <= 12: products < 2^24, doubling is exact
            d = jnp.concatenate([p[:1], p[1:] * 2], axis=0) if w > 1 else p
            acc = _slice_add(acc, 2 * i, d)
            continue
        lo, hi = p & MASK16, p >> 16
        dlo = jnp.concatenate([lo[:1], lo[1:] * 2], axis=0) if w > 1 else lo
        acc = _slice_add(acc, 2 * i, dlo)
        w2 = min(L - i, out_limbs - 2 * i - 1)
        if w2 > 0:
            dhi = hi[:w2]
            dhi = (
                jnp.concatenate([dhi[:1], dhi[1:] * 2], axis=0)
                if w2 > 1
                else dhi
            )
            acc = _slice_add(acc, 2 * i + 1, dhi)
    return acc


def _sqr_cols(a, out_limbs: int, radix: int = 16):
    """Raw column sums of a*a with each off-diagonal product a_i*a_j
    (i < j) computed ONCE and doubled — L*(L+1)/2 limb products instead
    of _mul_cols' L^2 (300 vs 576 at L=24). Doubling happens AFTER the
    lo/hi split (a raw 16x16 product can exceed 2^31); column values are
    identical to the schoolbook sums, so every downstream bound
    (_carry_pass domain, Montgomery tail) is unchanged."""
    if _COMPACT_MUL:
        return _sqr_cols_compact(a, out_limbs, radix)
    L = a.shape[0]
    shape = a.shape[1:]
    split = radix > 12
    mask = np.uint32((1 << radix) - 1)
    terms: list[list] = [[] for _ in range(out_limbs)]
    for i in range(L):
        for j in range(i, L):
            k = i + j
            if k >= out_limbs:
                break
            p = a[i] * a[j]
            if not split:
                terms[k].append(p if i == j else p * 2)
                continue
            lo, hi = p & mask, p >> radix
            if i != j:
                lo, hi = lo * 2, hi * 2
            terms[k].append(lo)
            if k + 1 < out_limbs:
                terms[k + 1].append(hi)
    rows = []
    for k in range(out_limbs):
        level = terms[k]
        if not level:
            rows.append(jnp.zeros(shape, dtype=U32))
            continue
        while len(level) > 1:
            nxt = [level[i] + level[i + 1] for i in range(0, len(level) - 1, 2)]
            if len(level) % 2:
                nxt.append(level[-1])
            level = nxt
        rows.append(jnp.broadcast_to(level[0], shape))
    return jnp.stack(rows, axis=0)


# -- Karatsuba full products (opt-in: BPT_FQ_MUL=karatsuba) -------------------
#
# One level of Karatsuba for the 24-limb (Fq) full product: 12x12 + 12x12
# + 13x13 = 457 limb products instead of 576 (~21% fewer), at the cost of
# two 13-limb carry passes and a biased middle term. The middle columns
# zm - z0 - z2 can be NEGATIVE per column (though the value is not), so a
# 2^23 bias is added to each of the 25 middle columns — making every
# column nonnegative — and the known bias value
#   V = 2^23 * sum_{k=12}^{36} 2^(16 k)
# is removed mod n AFTER Montgomery reduction: reduce(t + V) =
# t*R^-1 + V*R^-1 (mod n), so subtracting the precomputed constant
# C = V*R^-1 mod n restores exactness. Wide (lazy) values carry a bias
# multiple per accumulation: sub_wide cancels it (both operands biased),
# add_wide doubles it; mont_reduce_wide takes the net count.

_KARA = os.environ.get("BPT_FQ_MUL", "") == "karatsuba"

_KARA_C: dict[tuple[int, int], np.ndarray] = {}

#: middle-term column span [lo, hi) and per-column bias (26 columns: a
#: 13x13 split product occupies 25 columns plus one carry-half column)
_KARA_LO, _KARA_HI, _KARA_BIAS = 12, 38, 1 << 23


def kara_enabled(spec: FieldSpec) -> bool:
    return _KARA and spec.radix == 16 and spec.L == 24


def kara_c(spec: FieldSpec, count: int = 1) -> np.ndarray:
    """(L, 1) canonical limbs of count * V * R^-1 mod n."""
    key = (spec.modulus, spec.L, spec.radix, count)
    c = _KARA_C.get(key)
    if c is None:
        V = sum(_KARA_BIAS << (16 * k) for k in range(_KARA_LO, _KARA_HI))
        R = 1 << (16 * spec.L)
        val = count * V % spec.modulus * pow(R, -1, spec.modulus) % spec.modulus
        c = int_to_limbs(val, spec.L, 16).reshape(spec.L, 1)
        _KARA_C[key] = c
    return c


def _mul_cols_kara24(a, b, radix: int = 16):
    """(24, ...) x2 -> (48, ...) BIASED column sums of a*b + V (above).
    Every column < 2^24 (carry-pass domain is 2^31)."""
    a0, a1, b0, b1 = a[:12], a[12:], b[:12], b[12:]
    # 12x12 split products occupy 24 columns (col 22's carry half lands
    # in col 23); the 13x13 middle product occupies 26
    z0 = _mul_cols(a0, b0, 24, radix)
    z2 = _mul_cols(a1, b1, 24, radix)
    zero1 = jnp.zeros((1,) + a.shape[1:], dtype=U32)
    sa = _carry_pass(jnp.concatenate([a0 + a1, zero1], axis=0), radix=radix)
    sb = _carry_pass(jnp.concatenate([b0 + b1, zero1], axis=0), radix=radix)
    zm = _mul_cols(sa, sb, 26, radix)
    pad2 = jnp.zeros((2,) + a.shape[1:], dtype=U32)
    z0p = jnp.concatenate([z0, pad2], axis=0).astype(jnp.int32)
    z2p = jnp.concatenate([z2, pad2], axis=0).astype(jnp.int32)
    mid = (zm.astype(jnp.int32) - z0p - z2p + jnp.int32(_KARA_BIAS)).astype(U32)
    # assemble t' = z0 + mid<<12 + z2<<24 over 48 columns
    sh = a.shape[1:]
    z0_48 = jnp.concatenate([z0, jnp.zeros((24,) + sh, U32)], axis=0)
    mid_48 = jnp.concatenate(
        [jnp.zeros((12,) + sh, U32), mid, jnp.zeros((10,) + sh, U32)], axis=0
    )
    z2_48 = jnp.concatenate([jnp.zeros((24,) + sh, U32), z2], axis=0)
    return z0_48 + mid_48 + z2_48


def mont_mul(spec: FieldSpec, a, b):
    """Montgomery product: a * b * R^{-1} mod n, canonical output.

    Full-product reduction (vector form of CIOS, cf. scalar.rs:514-588):
    t = a*b; m = (t mod R)*N' mod R; u = (t + m*n)/R; subtract n once.

    Carries are resolved lazily: t and m*n stay as raw column sums (limbs
    < 2^23, see _mul_cols) and only (t mod R), (m mod R) and the final
    (t + m*n)/R get a carry pass — carries in the low L columns of t never
    influence limbs >= L of the final sum beyond what the single full-width
    pass at the end resolves, because column sums represent the same value.
    """
    L = spec.L
    a, b = jnp.broadcast_arrays(a, b)
    kara = kara_enabled(spec)
    if kara:
        t_cols = _mul_cols_kara24(a, b, spec.radix)  # biased: value a*b + V
    else:
        t_cols = _mul_cols(a, b, 2 * L, spec.radix)  # raw column sums, t < n^2
    out = _mont_reduce_cols(spec, t_cols)
    if kara:
        out = sub_mod(spec, out, _bc(kara_c(spec), out))
    return out


def _mont_reduce_cols(spec: FieldSpec, t_cols):
    """Montgomery tail shared by mont_mul/mont_sqr: raw 2L column sums of
    t (limbs < 2^23) -> canonical t*R^-1 mod n."""
    L = spec.L
    rx = spec.radix
    t_low = _carry_pass(t_cols[:L], mask_top=True, radix=rx)  # == t mod R
    m = _carry_pass(
        _mul_cols(t_low, _bc(spec.nprime_limbs, t_low), L, rx),
        mask_top=True,
        radix=rx,
    )  # == (t mod R) * N' mod R
    mn_cols = _mul_cols(m, _bc(spec.n_limbs, m), 2 * L, rx)  # m*n < R*n
    # u = (t + m*n) / R; low L limbs of the sum are zero by construction.
    # Top limb of the sum may carry one extra bit -> append a zero limb.
    s = t_cols + mn_cols  # limbs < 2^24: safely inside _carry_pass's domain
    s = jnp.concatenate([s, jnp.zeros((1,) + s.shape[1:], dtype=U32)], axis=0)
    u = _carry_pass(s, radix=rx)
    hi = u[L:]  # (L+1, ...); value < 2n
    n_ext = jnp.concatenate(
        [_bc(spec.n_limbs, hi[:L]), jnp.zeros((1,) + hi.shape[1:], dtype=U32)], axis=0
    )
    red, borrow = _borrow_scan(hi, n_ext, rx)
    return jnp.where(borrow, hi, red)[:L]


def mont_sqr(spec: FieldSpec, a):
    """Montgomery square via dedicated squaring column sums — ~half the
    limb products of mont_mul's t pass (_sqr_cols). Bias-free under
    Karatsuba (squaring beats the biased kara mul outright: 300 vs 457
    products), so no constant correction is needed."""
    return _mont_reduce_cols(spec, _sqr_cols(a, 2 * spec.L, spec.radix))


_MULSMALL_P: dict[tuple, np.ndarray] = {}


def mul_small(spec: FieldSpec, x, c: int):
    """x * c mod n for a small static int c — NO limb products beyond the
    c-scaling: one carry pass over c-scaled columns + ceil(log2(c))
    conditional subtractions of 2^j * n. Linear, so it maps Montgomery
    form to Montgomery form; replaces full mont_muls by curve constants
    (b3 = 12 in the RCB15 point formulas: 3 of the 24 muls per MSM
    Horner step)."""
    assert 0 < c < (1 << (31 - spec.radix)), c  # c * limb must fit uint32
    ext = jnp.zeros((1,) + x.shape[1:], dtype=U32)
    t = _carry_pass(
        jnp.concatenate([x * jnp.uint32(c), ext], axis=0), radix=spec.radix
    )  # (L+1, ...), value < c * n
    for j in reversed(range((c - 1).bit_length())):
        key = (spec.modulus, spec.L, spec.radix, j)
        pj = _MULSMALL_P.get(key)
        if pj is None:
            pj = int_to_limbs(
                spec.modulus << j, spec.L + 1, spec.radix
            ).reshape(spec.L + 1, 1)
            _MULSMALL_P[key] = pj
        red, borrow = _borrow_scan(t, _bc(pj, t), spec.radix)
        t = jnp.where(borrow, t, red)
    return t[: spec.L]


# -- lazy (wide-domain) arithmetic --------------------------------------------
#
# Sums/differences of full products can share ONE Montgomery reduction:
#   reduce(a*b ± c*d) instead of mont_mul(a,b) ± mont_mul(c,d)
# Wide values are 2L-limb arrays < 2*N*R; the reduction below tolerates
# inputs < 2*N*R (output needs at most two conditional subtractions).


def mul_wide_nored(spec: FieldSpec, a, b):
    """Full 2L-limb product of canonical L-limb operands (no reduction).
    Under Karatsuba the value carries ONE bias V (see _mul_cols_kara24);
    sub_wide cancels it, add_wide doubles it — pass the net count to
    mont_reduce_wide."""
    a, b = jnp.broadcast_arrays(a, b)
    if kara_enabled(spec):
        return _carry_pass(_mul_cols_kara24(a, b, spec.radix), radix=spec.radix)
    return _mul_wide(a, b, 2 * spec.L, spec.radix)


def add_wide(spec: FieldSpec, x, y):
    """Sum of wide values (each < N*R, so the sum stays < 2*N*R)."""
    return _carry_pass(x + y, radix=spec.radix)


def sub_wide(spec: FieldSpec, x, y):
    """x - y + N*R for wide x < N*R, y < N*R: always nonnegative, < 2*N*R.
    Adding the multiple N*R of the modulus keeps the residue class of
    x - y (mod n) unchanged through Montgomery reduction."""
    L = spec.L
    nr = jnp.concatenate(
        [jnp.zeros_like(x[:L]), _bc(spec.n_limbs, x[:L])], axis=0
    )  # N * R as 2L limbs
    t = _carry_pass(x + nr, radix=spec.radix)
    d, _ = _borrow_scan(t, jnp.broadcast_to(y, t.shape), spec.radix)
    return d


def mont_reduce_wide(spec: FieldSpec, t, bias_count=None):
    """Montgomery reduction of a wide value t < 2*N*R -> canonical t*R^-1.

    Same full-product reduction as mont_mul's tail, but u < 3N, so up to
    two conditional subtractions. ``bias_count``: net Karatsuba bias
    multiples carried by t (per slot of axis 1 when a tuple) — the
    corresponding k*V*R^-1 constants are subtracted mod n after
    reduction; ignored unless Karatsuba is enabled."""
    L = spec.L
    nprime = _bc(spec.nprime_limbs, t[:L])
    m = _carry_pass(
        _mul_cols(t[:L], nprime, L, spec.radix), mask_top=True, radix=spec.radix
    )  # == (t mod R) * N' mod R
    mn = _mul_cols(m, _bc(spec.n_limbs, m), 2 * L, spec.radix)  # raw columns
    s = t + mn
    s = jnp.concatenate([s, jnp.zeros((1,) + s.shape[1:], dtype=U32)], axis=0)
    u = _carry_pass(s, radix=spec.radix)
    hi = u[L:]  # (L+1, ...); value < 3n
    n_ext = jnp.concatenate(
        [_bc(spec.n_limbs, hi[:L]), jnp.zeros((1,) + hi.shape[1:], dtype=U32)], axis=0
    )
    for _ in range(2):
        red, borrow = _borrow_scan(hi, n_ext, spec.radix)
        hi = jnp.where(borrow, hi, red)
    out = hi[:L]
    if bias_count is not None and kara_enabled(spec):
        if isinstance(bias_count, (tuple, list)):
            # stacked reduce: per-slot constants along axis 1, broadcast
            # over every remaining batch dim of out (L, k, *batch)
            cs = np.stack([kara_c(spec, k)[:, 0] for k in bias_count], axis=1)
            cs = cs.reshape(cs.shape + (1,) * (out.ndim - 2))
            out = sub_mod(spec, out, jnp.asarray(cs))
        elif bias_count:
            out = sub_mod(spec, out, _bc(kara_c(spec, int(bias_count)), out))
    return out


def from_mont(spec: FieldSpec, a):
    """Montgomery form -> canonical residue (multiply by 1)."""
    one = jnp.concatenate(
        [
            jnp.ones((1,) + a.shape[1:], dtype=U32),
            jnp.zeros((spec.L - 1,) + a.shape[1:], dtype=U32),
        ],
        axis=0,
    )
    return mont_mul(spec, a, one)


def to_mont(spec: FieldSpec, a):
    """Canonical residue -> Montgomery form (multiply by R^2)."""
    return mont_mul(spec, a, _bc(spec.r2_limbs, a))


def select(cond, a, b):
    """Lane select: cond (batch,) bool -> a where true else b. Limb axis leads."""
    return jnp.where(cond[None], a, b)


def is_zero(a):
    return jnp.all(a == 0, axis=0)


def eq(a, b):
    return jnp.all(a == b, axis=0)


def mont_pow_fixed(spec: FieldSpec, a, exponent: int):
    """a^exponent (Montgomery in/out) for a *static* exponent.

    Left-to-right square-and-multiply as a lax.scan over the exponent bits
    (compile cost: two mont_mul bodies, not bit-length many)."""
    if exponent == 0:
        return jnp.broadcast_to(_bc(spec.one_mont, a), a.shape)
    bits = jnp.asarray([int(c) for c in bin(exponent)[2:]], dtype=U32)  # MSB first

    def step(r, bit):
        r = mont_sqr(spec, r)
        r = jnp.where(bit == 1, mont_mul(spec, r, a), r)
        return r, None

    r, _ = jax.lax.scan(step, a, bits[1:])
    return r


def doubling_scan(x, combine, identity_const):
    """Inclusive prefix-combine along the last axis via Hillis–Steele
    doubling: log2(n) full-width combines, the shifted operand filled
    with the identity. Replaces ``jax.lax.associative_scan`` on limb
    arrays: the scan's odd/even interleave materializes (1, n)
    temporaries whose TPU layout pads the size-1 dim to a 128-lane tile
    (measured: 33.9 GB HBM demand for the 2^20 grand product, ~30 GB of
    it padding). Here every temporary is a dense (L, ..., n) array.
    ``identity_const`` is an (L, 1) host constant (e.g. spec.one_mont for
    products, zeros for sums)."""
    n = x.shape[-1]
    k = 1
    while k < n:
        pad = const_limbs(identity_const, x.shape[:-1] + (k,))
        x = combine(x, jnp.concatenate([pad, x[..., :-k]], axis=-1))
        k <<= 1
    return x


def batch_inverse(spec: FieldSpec, a):
    """Elementwise modular inverse over the last axis (Montgomery in/out)
    with ONE field inversion — Montgomery's trick in parallel form:
    inv(a_i) = prefix_{<i} * inv(total) * suffix_{>i}, the prefix/suffix
    products via log-depth associative scans. Zeros map to zero.

    Device counterpart of the reference's per-element addchain ``invert``
    (scalar.rs:416-512) and the engine behind batched affine
    normalization (g1.rs:806-839)."""
    one = _bc(spec.one_mont, a)
    nz = ~is_zero(a)
    safe = jnp.where(nz[None], a, one)
    mul = lambda x, y: mont_mul(spec, x, y)
    inc = doubling_scan(safe, mul, spec.one_mont)  # inclusive prefix
    total = inc[..., -1:]
    inv_total = mont_pow_fixed(spec, total, spec.modulus - 2)
    # exclusive prefix / suffix
    pre = jnp.concatenate([_bc(spec.one_mont, total), inc[..., :-1]], axis=-1)
    suf_inc = jnp.flip(
        doubling_scan(jnp.flip(safe, axis=-1), mul, spec.one_mont), axis=-1
    )
    suf = jnp.concatenate([suf_inc[..., 1:], _bc(spec.one_mont, total)], axis=-1)
    out = mul(mul(pre, inv_total), suf)
    return jnp.where(nz[None], out, jnp.zeros_like(out))


# Jitted entry points (spec is static). Always prefer these at call
# boundaries — eager dispatch of the lane ops inside a mont_mul is slow,
# especially through a remote TPU tunnel.
add_mod_jit = functools.partial(jax.jit, static_argnums=0)(add_mod)
sub_mod_jit = functools.partial(jax.jit, static_argnums=0)(sub_mod)
neg_mod_jit = functools.partial(jax.jit, static_argnums=0)(neg_mod)
mont_mul_jit = functools.partial(jax.jit, static_argnums=0)(mont_mul)
to_mont_jit = functools.partial(jax.jit, static_argnums=0)(to_mont)
from_mont_jit = functools.partial(jax.jit, static_argnums=0)(from_mont)
mont_pow_fixed_jit = functools.partial(jax.jit, static_argnums=(0, 2))(mont_pow_fixed)
