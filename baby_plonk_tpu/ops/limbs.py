"""Vectorized multi-precision modular arithmetic for TPU (JAX).

TPUs have no 64-bit integer multiplier, so 255/381-bit field elements are
decomposed into 16-bit limbs held in uint32 lanes: a 16x16-bit product fits
a uint32 exactly, and column sums of <= 2*L such products stay under 2^22,
so carries can be resolved in a single explicit pass. This is the
TPU-native re-design of the reference's 64-bit Montgomery arithmetic
(lib/bls12_381/src/scalar.rs:514-588, fp.rs:565-611) — same math, limb
layout chosen for the VPU instead of x86-64.

Layout: an element is an array of shape (..., L) uint32, little-endian
16-bit limbs, each limb in [0, 2^16). Field elements are kept in
**Montgomery form** (x*R mod N, R = 2^(16 L)) and canonical ([0, N)).

All functions are shape-polymorphic in the leading (batch) dimensions and
jit-friendly (static limb counts, no data-dependent control flow).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

U32 = jnp.uint32
MASK16 = np.uint32(0xFFFF)


def int_to_limbs(x: int, L: int) -> np.ndarray:
    """Python int -> L x uint32 little-endian 16-bit limbs (host-side)."""
    return np.array([(x >> (16 * i)) & 0xFFFF for i in range(L)], dtype=np.uint32)


def limbs_to_int(a) -> int:
    """L x uint32 limbs -> Python int (host-side)."""
    a = np.asarray(a, dtype=np.uint64)
    return sum(int(v) << (16 * i) for i, v in enumerate(a))


def ints_to_array(xs, L: int) -> np.ndarray:
    """list[int] -> (n, L) uint32 limb array (host-side)."""
    n = len(xs)
    out = np.empty((n, L), dtype=np.uint32)
    for i, x in enumerate(xs):
        for j in range(L):
            out[i, j] = (x >> (16 * j)) & 0xFFFF
    return out


def array_to_ints(a) -> list[int]:
    """(n, L) limb array -> list[int] (host-side)."""
    a = np.asarray(a, dtype=np.uint64)
    n, L = a.shape
    shifts = [16 * j for j in range(L)]
    return [sum(int(a[i, j]) << shifts[j] for j in range(L)) for i in range(n)]


def _carry_pass(t):
    """Normalize limbs to 16 bits: one sequential carry pass over the last axis.

    Precondition: every limb < 2^32 - 2^16 (so limb + carry never overflows
    uint32). Output limbs are < 2^16 except possibly the last, which absorbs
    the final carry.
    """
    L = t.shape[-1]
    cols = []
    carry = jnp.zeros(t.shape[:-1], dtype=U32)
    for k in range(L):
        v = t[..., k] + carry
        cols.append(v & MASK16 if k < L - 1 else v)
        carry = v >> 16
    return jnp.stack(cols, axis=-1)


def _geq(a, b):
    """a >= b, lexicographic over little-endian limbs. Returns bool (...,)."""
    L = a.shape[-1]
    borrow = jnp.zeros(a.shape[:-1], dtype=U32)
    for k in range(L):
        v = a[..., k] + np.uint32(0x10000) - b[..., k] - borrow
        borrow = np.uint32(1) - (v >> 16)
    return borrow == 0


def _sub_raw(a, b):
    """a - b assuming a >= b; limbwise with borrow."""
    L = a.shape[-1]
    cols = []
    borrow = jnp.zeros(a.shape[:-1], dtype=U32)
    for k in range(L):
        v = a[..., k] + np.uint32(0x10000) - b[..., k] - borrow
        cols.append(v & MASK16)
        borrow = np.uint32(1) - (v >> 16)
    return jnp.stack(cols, axis=-1)


def _add_raw(a, b):
    """a + b, limbwise with carries resolved (last limb may exceed 16 bits)."""
    return _carry_pass(a + b)


class FieldSpec:
    """Static (host-side) description of a prime field for the TPU kernels.

    Precomputes the Montgomery constants for modulus ``n``:
      R = 2^(16 L) mod n, R2 = R^2 mod n, NPRIME = -n^(-1) mod R.
    """

    def __init__(self, modulus: int, L: int):
        assert modulus < (1 << (16 * L))
        self.modulus = modulus
        self.L = L
        self.R = (1 << (16 * L)) % modulus
        self.R2 = self.R * self.R % modulus
        self.NPRIME = (-pow(modulus, -1, 1 << (16 * L))) % (1 << (16 * L))
        # device-side constants
        self.n_limbs = int_to_limbs(modulus, L)
        self.nprime_limbs = int_to_limbs(self.NPRIME, L)
        self.r2_limbs = int_to_limbs(self.R2, L)
        self.one_mont = int_to_limbs(self.R % modulus, L)
        self.zero = np.zeros(L, dtype=np.uint32)

    # -- host-side conversions -------------------------------------------------

    def to_mont_int(self, x: int) -> int:
        return x * self.R % self.modulus

    def from_mont_int(self, x: int) -> int:
        return x * pow(self.R, -1, self.modulus) % self.modulus

    def pack_mont(self, xs) -> np.ndarray:
        """list[int] canonical residues -> (n, L) Montgomery-form limb array."""
        return ints_to_array([x * self.R % self.modulus for x in xs], self.L)

    def unpack_mont(self, a) -> list[int]:
        rinv = pow(self.R, -1, self.modulus)
        return [v * rinv % self.modulus for v in array_to_ints(a)]

    def pack_raw(self, xs) -> np.ndarray:
        """list[int] -> limb array with NO Montgomery scaling (e.g. scalars for MSM)."""
        return ints_to_array([x % self.modulus for x in xs], self.L)


# -----------------------------------------------------------------------------
# Modular ops (all take the FieldSpec as a static first arg)
# -----------------------------------------------------------------------------


def add_mod(spec: FieldSpec, a, b):
    """(a + b) mod n for canonical a, b."""
    a, b = jnp.broadcast_arrays(a, b)
    s = _add_raw(a, b)  # last limb may hold a carry bit
    n = jnp.asarray(spec.n_limbs, dtype=U32)
    ge = _geq(s, jnp.broadcast_to(n, s.shape))
    red = _sub_raw(s, jnp.broadcast_to(n, s.shape))
    return jnp.where(ge[..., None], red, s)


def sub_mod(spec: FieldSpec, a, b):
    """(a - b) mod n for canonical a, b."""
    a, b = jnp.broadcast_arrays(a, b)
    n = jnp.asarray(spec.n_limbs, dtype=U32)
    lt = ~_geq(a, b)
    a_adj = jnp.where(lt[..., None], _add_raw(a, jnp.broadcast_to(n, a.shape)), a)
    return _sub_raw(a_adj, jnp.broadcast_to(b, a_adj.shape))


def neg_mod(spec: FieldSpec, a):
    """(-a) mod n; maps 0 -> 0."""
    n = jnp.asarray(spec.n_limbs, dtype=U32)
    is_zero = jnp.all(a == 0, axis=-1)
    d = _sub_raw(jnp.broadcast_to(n, a.shape), a)
    return jnp.where(is_zero[..., None], jnp.zeros_like(a), d)


def _mul_wide(a, b, out_limbs: int):
    """Schoolbook product of 16-bit-limb numbers, carry-normalized.

    a: (..., La), b: (..., Lb) -> (..., out_limbs), each output limb < 2^16
    except possibly the top. Shifted multiply-accumulate with lo/hi split so
    every intermediate stays in uint32.
    """
    La = a.shape[-1]
    Lb = b.shape[-1]
    shape = jnp.broadcast_shapes(a.shape[:-1], b.shape[:-1])
    lo = jnp.zeros(shape + (out_limbs,), dtype=U32)
    hi = jnp.zeros(shape + (out_limbs,), dtype=U32)
    for i in range(La):
        p = a[..., i : i + 1] * b  # exact: 16x16 -> 32 bits
        w = min(Lb, out_limbs - i)
        if w <= 0:
            break
        lo = lo.at[..., i : i + w].add(p[..., :w] & MASK16)
        w2 = min(Lb, out_limbs - i - 1)
        if w2 > 0:
            hi = hi.at[..., i + 1 : i + 1 + w2].add(p[..., :w2] >> 16)
    # each limb <= (La + Lb) * (2^16 - 1) < 2^22: one carry pass suffices
    return _carry_pass(lo + hi)


def mont_mul(spec: FieldSpec, a, b):
    """Montgomery product: a * b * R^{-1} mod n, canonical output.

    Full-product reduction (the vector-friendly form of CIOS,
    cf. scalar.rs:514-588): t = a*b; m = (t mod R) * N' mod R;
    u = (t + m*n) / R; subtract n if u >= n.
    """
    L = spec.L
    t = _mul_wide(a, b, 2 * L)  # (..., 2L)
    nprime = jnp.asarray(spec.nprime_limbs, dtype=U32)
    m = _mul_wide(t[..., :L], nprime, L)  # low L limbs only
    m = m.at[..., L - 1].set(m[..., L - 1] & MASK16)  # truncate mod R
    n = jnp.asarray(spec.n_limbs, dtype=U32)
    mn = _mul_wide(m, n, 2 * L + 1)
    # u = t + m*n; low L limbs are zero by construction; take limbs [L:2L+1]
    u = _carry_pass(
        jnp.concatenate([t, jnp.zeros(t.shape[:-1] + (1,), dtype=U32)], axis=-1) + mn
    )
    hi = u[..., L:]  # (..., L+1); value < 2n
    n_ext = jnp.concatenate([n, jnp.zeros(1, dtype=U32)])
    ge = _geq(hi, jnp.broadcast_to(n_ext, hi.shape))
    red = _sub_raw(hi, jnp.broadcast_to(n_ext, hi.shape))
    return jnp.where(ge[..., None], red, hi)[..., :L]


def mont_sqr(spec: FieldSpec, a):
    return mont_mul(spec, a, a)


def from_mont(spec: FieldSpec, a):
    """Montgomery form -> canonical residue (multiply by 1)."""
    one = jnp.zeros(spec.L, dtype=U32).at[0].set(1)
    return mont_mul(spec, a, one)


def to_mont(spec: FieldSpec, a):
    """Canonical residue -> Montgomery form (multiply by R^2)."""
    return mont_mul(spec, a, jnp.asarray(spec.r2_limbs, dtype=U32))


def select(cond, a, b):
    """Elementwise select: cond (...,) bool -> a where true else b."""
    return jnp.where(cond[..., None], a, b)


def is_zero(a):
    return jnp.all(a == 0, axis=-1)


def eq(a, b):
    return jnp.all(a == b, axis=-1)


def mont_pow_fixed(spec: FieldSpec, a, exponent: int):
    """a^exponent (Montgomery in/out) for a *static* exponent.

    Left-to-right square-and-multiply as a lax.scan over the exponent bits
    (compile cost: two mont_mul bodies, not bit-length many)."""
    if exponent == 0:
        return jnp.broadcast_to(jnp.asarray(spec.one_mont, dtype=U32), a.shape)
    bits = jnp.asarray(
        [int(b) for b in bin(exponent)[2:]], dtype=jnp.uint32
    )  # MSB first

    def step(r, bit):
        r = mont_sqr(spec, r)
        r = select(bit == 1, mont_mul(spec, r, a), r)
        return r, None

    # seed with the leading 1 bit: r = a, scan the rest
    r, _ = jax.lax.scan(step, a, bits[1:])
    return r


# Jitted entry points (spec is static). Always prefer these at call
# boundaries — eager dispatch of the hundreds of lane ops inside a
# mont_mul is prohibitively slow, especially through a remote TPU tunnel.
add_mod_jit = functools.partial(jax.jit, static_argnums=0)(add_mod)
sub_mod_jit = functools.partial(jax.jit, static_argnums=0)(sub_mod)
neg_mod_jit = functools.partial(jax.jit, static_argnums=0)(neg_mod)
mont_mul_jit = functools.partial(jax.jit, static_argnums=0)(mont_mul)
to_mont_jit = functools.partial(jax.jit, static_argnums=0)(to_mont)
from_mont_jit = functools.partial(jax.jit, static_argnums=0)(from_mont)
mont_pow_fixed_jit = functools.partial(jax.jit, static_argnums=(0, 2))(mont_pow_fixed)
