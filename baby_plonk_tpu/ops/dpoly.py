"""Device-resident dense polynomials over Fr (JAX, Montgomery limb arrays).

Duck-type compatible with the host ``protocol.poly.Poly`` (same operator
surface: +, -, * with polys/ints, ``eval``, ``divide_by_vanishing``,
``divide_by_linear``, ``scale_domain``, ``rlc``, basis conversions) so the
protocol layer runs unchanged with values living in HBM. Every op maps to
TPU-friendly structure:

  * monomial x monomial multiply    -> pad to 2^k, NTT, pointwise, iNTT
    (the reference's O(n^2) schoolbook, polynomial.rs:189-312, replaced)
  * divide by Z_H = x^n - 1         -> row-block suffix sums (the linear
    recurrence q_{j-n} = N_j + q_j vectorized; polynomial.rs:314-380)
  * divide by (x - z), Horner eval  -> power-table (associative_scan) +
    suffix-cumsum formulations; no sequential recurrences
  * add/sub/scalar ops              -> elementwise limb kernels

Values: (16, n) uint32 Montgomery-form limbs, position axis last.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..fields import fr
from ..protocol.poly import Basis
from . import limbs, ntt as ntt_ops
from .ntt import FR_SPEC

Q = fr.Q
_SPEC = FR_SPEC


def _next_pow2(n: int) -> int:
    m = 1
    while m < n:
        m <<= 1
    return m


# -----------------------------------------------------------------------------
# jitted kernels (shapes static per call signature)
# -----------------------------------------------------------------------------


@jax.jit
def _add(a, b):
    return limbs.add_mod(_SPEC, a, b)


@jax.jit
def _sub(a, b):
    return limbs.sub_mod(_SPEC, a, b)


@jax.jit
def _mul(a, b):
    return limbs.mont_mul(_SPEC, a, b)


@jax.jit
def _neg(a):
    return limbs.neg_mod(_SPEC, a)


@functools.partial(jax.jit, static_argnums=(1,))
def _pow_table(z, n: int):
    """[1, z, z^2, ..., z^(n-1)] as (16, n), z Montgomery (16, 1)."""
    one = jnp.asarray(_SPEC.one_mont)
    seq = jnp.concatenate([one, jnp.broadcast_to(z, (16, n - 1))], axis=-1)
    return limbs.doubling_scan(
        seq, lambda x, y: limbs.mont_mul(_SPEC, x, y), _SPEC.one_mont
    )


@jax.jit
def _reduce_add(x):
    """Modular sum over the last axis (any leading dims); n must be a power of 2."""
    n = x.shape[-1]
    while n > 1:
        x = limbs.add_mod(_SPEC, x[..., : n // 2], x[..., n // 2 :])
        n //= 2
    return x


@jax.jit
def _suffix_sum_excl(x):
    """S[k] = sum_{t>k} x[t] along the last axis (exclusive suffix sum)."""
    inc = limbs.doubling_scan(
        jnp.flip(x, axis=-1),
        lambda a, b: limbs.add_mod(_SPEC, a, b),
        np.zeros((16, 1), dtype=np.uint32),
    )
    inc = jnp.flip(inc, axis=-1)  # inclusive suffix
    zero = jnp.zeros((16, 1), dtype=jnp.uint32)
    return jnp.concatenate([inc[:, 1:], zero], axis=-1)


def _pack_scalar(v: int):
    return jnp.asarray(_SPEC.pack_mont([v % Q]))


_ZERO_LIMBS = None


def _pad_to(a, n: int):
    cur = a.shape[-1]
    if cur == n:
        return a
    assert cur < n
    return jnp.concatenate(
        [a, jnp.zeros((16, n - cur), dtype=jnp.uint32)], axis=-1
    )


def _slice_pad(vals, lo: int, width: int):
    """vals[..., lo:lo+width], zero-padded on the right to exactly
    ``width`` (used by the position-chunked kernels below)."""
    n = vals.shape[-1]
    if lo >= n:
        return jnp.zeros(vals.shape[:-1] + (width,), dtype=jnp.uint32)
    hi = min(lo + width, n)
    part = vals[..., lo:hi]
    if hi - lo < width:
        part = jnp.concatenate(
            [
                part,
                jnp.zeros(vals.shape[:-1] + (width - (hi - lo),), dtype=jnp.uint32),
            ],
            axis=-1,
        )
    return part


class DPoly:
    """Device polynomial; ``vals`` is (16, n) Montgomery limbs."""

    __slots__ = ("vals", "basis")

    def __init__(self, vals, basis: Basis):
        self.vals = vals
        self.basis = basis

    # -- constructors ---------------------------------------------------------

    @staticmethod
    def from_ints(values, basis: Basis) -> "DPoly":
        return DPoly(jnp.asarray(_SPEC.pack_mont([v % Q for v in values])), basis)

    @staticmethod
    def vanishing(n: int) -> "DPoly":
        vals = [Q - 1] + [0] * (n - 1) + [1]
        return DPoly.from_ints(vals, Basis.MONOMIAL)

    # -- host boundary --------------------------------------------------------

    @property
    def values(self):
        """Canonical int list (host sync)."""
        return _SPEC.unpack_mont(np.asarray(jax.device_get(self.vals)))

    def __len__(self):
        return self.vals.shape[-1]

    # -- basis conversion -----------------------------------------------------

    def to_monomial(self) -> "DPoly":
        if self.basis == Basis.MONOMIAL:
            return self
        return DPoly(ntt_ops.ntt_device(self.vals, inverse=True), Basis.MONOMIAL)

    def to_lagrange(self, n: int | None = None) -> "DPoly":
        if self.basis == Basis.LAGRANGE:
            return self
        vals = self.vals
        if n is not None:
            vals = _pad_to(vals, n)
        return DPoly(ntt_ops.ntt_device(vals), Basis.LAGRANGE)

    # -- arithmetic -----------------------------------------------------------

    def __add__(self, other):
        if isinstance(other, int):
            s = _pack_scalar(other)
            if self.basis == Basis.LAGRANGE:
                return DPoly(_add(self.vals, s), self.basis)
            v = self.vals
            head = _add(v[:, :1], s)
            return DPoly(jnp.concatenate([head, v[:, 1:]], axis=-1), self.basis)
        assert self.basis == other.basis, "basis mismatch"
        a, b = self.vals, other.vals
        if self.basis == Basis.LAGRANGE:
            assert a.shape == b.shape, "Lagrange add needs equal domains"
            return DPoly(_add(a, b), self.basis)
        n = max(a.shape[-1], b.shape[-1])
        return DPoly(_add(_pad_to(a, n), _pad_to(b, n)), self.basis)

    __radd__ = __add__

    def __sub__(self, other):
        if isinstance(other, int):
            return self + (-other % Q)
        assert self.basis == other.basis
        a, b = self.vals, other.vals
        if self.basis == Basis.LAGRANGE:
            assert a.shape == b.shape
            return DPoly(_sub(a, b), self.basis)
        n = max(a.shape[-1], b.shape[-1])
        return DPoly(_sub(_pad_to(a, n), _pad_to(b, n)), self.basis)

    def __mul__(self, other):
        if isinstance(other, int):
            return DPoly(_mul(self.vals, _pack_scalar(other)), self.basis)
        assert self.basis == other.basis
        if self.basis == Basis.LAGRANGE:
            assert self.vals.shape == other.vals.shape
            return DPoly(_mul(self.vals, other.vals), self.basis)
        la, lb = self.vals.shape[-1], other.vals.shape[-1]
        out_len = la + lb - 1
        size = _next_pow2(out_len)
        fa = ntt_ops.ntt_device(_pad_to(self.vals, size))
        fb = ntt_ops.ntt_device(_pad_to(other.vals, size))
        prod = ntt_ops.ntt_device(_mul(fa, fb), inverse=True)
        return DPoly(prod[:, :out_len], Basis.MONOMIAL)

    __rmul__ = __mul__

    def __neg__(self):
        return DPoly(_neg(self.vals), self.basis)

    def rlc(self, other, beta: int, gamma: int):
        return self + other * beta + gamma

    # -- evaluation & division ------------------------------------------------

    def eval(self, x: int) -> int:
        assert self.basis == Basis.MONOMIAL
        n = self.vals.shape[-1]
        size = _next_pow2(n)
        pw = _pow_table(_pack_scalar(x), size)
        terms = _mul(_pad_to(self.vals, size), pw)
        out = _reduce_add(terms)
        return _SPEC.unpack_mont(np.asarray(jax.device_get(out)))[0]

    def divide_by_vanishing(self, n: int, check: bool | None = None) -> "DPoly":
        """Exact division by Z_H = x^n - 1: q[k] = sum_{t>=1} N[k + t n]
        (row-block exclusive suffix sums over T = ceil(len/n) rows)."""
        assert self.basis == Basis.MONOMIAL
        if check is None:
            from ..config import get_config

            check = get_config().debug_asserts
        d = self.vals.shape[-1] - 1
        if d < n:
            if check:
                assert all(v == 0 for v in self.values), "not divisible by Z_H"
            return DPoly.from_ints([0], Basis.MONOMIAL)
        T = (d + 1 + n - 1) // n
        padded = _pad_to(self.vals, T * n).reshape(16, T, n)
        # q rows: Q[a] = sum_{s>a} R[s]
        rows = [padded[:, t] for t in range(T)]
        qrows = []
        acc = jnp.zeros((16, n), dtype=jnp.uint32)
        for t in range(T - 1, 0, -1):
            acc = _add(acc, rows[t])
            qrows.append(acc)
        qrows.reverse()  # q rows 0..T-2
        q = jnp.concatenate(qrows, axis=-1)[:, : d - n + 1]
        if check:
            # remainder: N[r] + q[r] == 0 for r < n (q[r]=0 beyond its length)
            q0 = _pad_to(q[:, : min(n, q.shape[-1])], n)
            rem = _add(rows[0], q0)
            assert not np.asarray(jax.device_get(rem)).any(), (
                "polynomial not divisible by Z_H"
            )
        return DPoly(q, Basis.MONOMIAL)

    def divide_by_linear(self, z: int, check: bool | None = None) -> "DPoly":
        """Exact division by (x - z): q[k] = z^{-(k+1)} * sum_{t>k} N[t] z^t."""
        assert self.basis == Basis.MONOMIAL
        if check is None:
            from ..config import get_config

            check = get_config().debug_asserts
        nlen = self.vals.shape[-1]
        if nlen == 1:
            if check:
                assert self.values == [0], "polynomial not divisible by (x - z)"
            return DPoly.from_ints([0], Basis.MONOMIAL)
        z = z % Q
        assert z != 0, "divide_by_linear expects nonzero z"
        z_inv = pow(z, Q - 2, Q)
        pw = _pow_table(_pack_scalar(z), nlen)
        m = _mul(self.vals, pw)  # N[t] z^t
        s = _suffix_sum_excl(m)  # S[k] = sum_{t>k}
        pw_inv = _pow_table(_pack_scalar(z_inv), nlen)
        # q[k] = S[k] * z^{-k} * z^{-1}
        q = _mul(_mul(s, pw_inv), _pack_scalar(z_inv))
        if check:
            # remainder = N[0] + z*q[0] must be 0  <=>  p(z) == 0
            head = _add(self.vals[:, :1], _mul(_pack_scalar(z), q[:, :1]))
            assert not np.asarray(jax.device_get(head)).any(), (
                "polynomial not divisible by (x - z)"
            )
        return DPoly(q[:, : nlen - 1], Basis.MONOMIAL)

    def slice_coeffs(self, start: int, stop: int | None = None) -> "DPoly":
        """Coefficient range [start, stop) as a monomial poly (zero-padded)."""
        assert self.basis == Basis.MONOMIAL
        n = self.vals.shape[-1]
        if start >= n:
            width = (stop - start) if stop is not None else 1
            return DPoly(
                jnp.zeros((16, max(width, 1)), dtype=jnp.uint32), Basis.MONOMIAL
            )
        v = self.vals[:, start:stop]
        if stop is not None and v.shape[-1] < stop - start:
            v = _pad_to(v, stop - start)
        return DPoly(v, Basis.MONOMIAL)

    def scale_domain(self, k: int) -> "DPoly":
        """p(x) -> p(k*x): coefficient i scaled by k^i (prover.rs:661-674)."""
        assert self.basis == Basis.MONOMIAL
        pw = _pow_table(_pack_scalar(k), self.vals.shape[-1])
        return DPoly(_mul(self.vals, pw), Basis.MONOMIAL)

    def degree(self) -> int:
        vals = self.values
        i = len(vals)
        while i > 0 and vals[i - 1] == 0:
            i -= 1
        return i - 1 if i else -1

    def __repr__(self):
        return f"DPoly({self.basis.name}, n={self.vals.shape[-1]})"


@jax.jit
def _eval_stack(vals, pw):
    """vals (16, k, m) coeffs, pw (16, m) power table -> (16, k, 1) sums."""
    return _reduce_add(_mul(vals, pw[:, None, :]))


def eval_many(polys: list[DPoly], x: int) -> list[int]:
    """Evaluate k monomial DPolys at one point with ONE kernel and ONE
    host transfer (the prover's round 4 does 6+ of these; prover.rs:502-541
    evaluates them one at a time).

    Above BPT_EVAL_CHUNK positions (default 2^19) the evaluation runs in
    position chunks of that width — p(x) = sum_c x^(c*W) * p_c(x) with
    p_c the c-th coefficient block — bounding peak HBM at ~(16, k, W)
    instead of padding everything to the next power of two (2^21-padded
    stacks were part of the 2^20 prove's round-4 OOM)."""
    assert all(p.basis == Basis.MONOMIAL for p in polys)
    if not polys:
        return []
    import os as _os

    L = max(p.vals.shape[-1] for p in polys)
    size = _next_pow2(L)
    W = int(_os.environ.get("BPT_EVAL_CHUNK", str(1 << 19)))
    if size <= W:
        stacked = jnp.stack([_pad_to(p.vals, size) for p in polys], axis=1)
        pw = _pow_table(_pack_scalar(x), size)
        out = _eval_stack(stacked, pw)  # (16, k, 1)
        flat = np.asarray(jax.device_get(out))[:, :, 0]
        return _SPEC.unpack_mont(flat)
    pw = _pow_table(_pack_scalar(x), W)
    acc = None
    for lo in range(0, L, W):
        chunk = jnp.stack([_slice_pad(p.vals, lo, W) for p in polys], axis=1)
        part = _eval_stack(chunk, pw)  # (16, k, 1)
        part = _mul(part, _pack_scalar(pow(x, lo, Q))[:, None, :])
        acc = part if acc is None else _add(acc, part)
    flat = np.asarray(jax.device_get(acc))[:, :, 0]
    return _SPEC.unpack_mont(flat)
