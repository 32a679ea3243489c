"""Radix-2 NTT over the 2-adic subgroup of Fr — device (JAX) implementation.

Computes the same function as the reference's O(n^2) matrix DFT
(src/utils.rs:63-81 forward, :106-129 inverse with final n^{-1} scaling):
forward X_j = sum_i x_i w^(ij), w = ROOT_OF_UNITY^(2^32/n). Here it is an
O(n log n) iterative Cooley–Tukey structured for XLA:

* one ``lax.fori_loop`` over the log2(n) stages whose body contains a
  single Montgomery multiply — butterfly geometry is derived from the
  stage counter with shift/mask arithmetic on an iota, so every stage has
  identical shapes and the compiled graph is O(1) in n;
* twiddles come from one (L, n/2) table of w^k (Montgomery form) indexed
  per stage — no per-stage tables;
* the bit-reversal permutation is a host-precomputed gather.

Data layout is limb-major: a polynomial batch is (16, ..., n) uint32 with
the position axis last (riding the TPU lane axis). Cross-chip stage
exchange lives in ``baby_plonk_tpu.parallel``.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..fields import fr
from . import limbs
from .limbs import FieldSpec

FR_SPEC = FieldSpec(fr.Q, 16)

#: butterfly radix: 4 fuses two Pease stages per relayout (A/B via env)
import os as _os  # noqa: E402

_RADIX = int(_os.environ.get("BPT_NTT_RADIX", "4"))


def _bit_reverse_perm(n: int) -> np.ndarray:
    bits = n.bit_length() - 1
    out = np.zeros(n, dtype=np.int32)
    for i in range(n):
        r = 0
        x = i
        for _ in range(bits):
            r = (r << 1) | (x & 1)
            x >>= 1
        out[i] = r
    return out


@functools.lru_cache(maxsize=None)
def _plan(n: int, inverse: bool):
    """(perm, twiddle_table (16, max(3n/4, 1)), n_inv (16, 1)) host tables.

    The table covers exponents < 3n/4 — radix-2 stages index < n/2, the
    fused radix-4 stages index up to 3e < 3n/4."""
    root = fr.root_of_unity(n) if n > 1 else 1
    if inverse:
        root = pow(root, fr.Q - 2, fr.Q)
    ntw = max(3 * n // 4, 1)
    tw = [1] * ntw
    for i in range(1, ntw):
        tw[i] = tw[i - 1] * root % fr.Q
    n_inv = FR_SPEC.pack_mont([pow(n, fr.Q - 2, fr.Q)])
    return _bit_reverse_perm(n), FR_SPEC.pack_mont(tw), n_inv


def ntt_mont(a, inverse: bool, perm, tw, n_inv):
    """NTT of Montgomery-form values. a: (16, ..., n) -> same shape.

    Constant-geometry (Pease) decimation-in-frequency: every stage is
    butterfly on (x[i], x[i + n/2]) -> interleaved outputs (2i, 2i+1),
    with stage-s twiddle exponent (i >> s) << s. Identical shapes every
    stage (one fori_loop body), ONE gather per stage (the twiddles — the
    butterfly operands are plain slices and the interleave is a
    stack+reshape), and a single bit-reversal gather at the end.
    """
    spec = FR_SPEC
    n = a.shape[-1]
    if n == 1:
        return a
    logn = n.bit_length() - 1
    nbatch = a.ndim - 2  # extra batch axes between limb and position
    half = n // 2
    j = jax.lax.broadcasted_iota(jnp.int32, (half, 1), 0)[:, 0]  # 0..n/2-1

    def stage(s, a):
        u = a[..., :half]
        v = a[..., half:]
        e = (j >> s) << s
        w = jnp.take(tw, e, axis=-1)  # (16, n/2)
        w = w.reshape(w.shape[:1] + (1,) * nbatch + w.shape[1:])
        A = limbs.add_mod(spec, u, v)
        B = limbs.mont_mul(spec, limbs.sub_mod(spec, u, v), w)
        # interleave: y[2i] = A[i], y[2i+1] = B[i]
        return jnp.stack([A, B], axis=-1).reshape(a.shape)

    if n >= 4 and _RADIX == 4:
        # fused radix-4 stages: the exact composition of radix-2 stages
        # (s, s+1) — identical outputs and mul count (4 per quartet, one
        # by the constant I = w^(n/4)), but ONE relayout per two stages
        # and 3 quarter-width twiddle gathers instead of 2 half-width.
        #   y[4m]   = A+B+C+D
        #   y[4m+1] = ((A+C) - (B+D)) * w^(2e)
        #   y[4m+2] = ((A-C) + I(B-D)) * w^e
        #   y[4m+3] = ((A-C) - I(B-D)) * w^(3e),   e = (m >> s) << s
        q = n // 4
        jq = jax.lax.broadcasted_iota(jnp.int32, (q, 1), 0)[:, 0]
        eye = jnp.take(tw, jnp.full((1,), n // 4, jnp.int32), axis=-1)
        eye = eye.reshape(eye.shape[:1] + (1,) * nbatch + (1,))

        def stage4(i, a):
            s = 2 * i
            A = a[..., :q]
            B = a[..., q : 2 * q]
            C = a[..., 2 * q : 3 * q]
            D = a[..., 3 * q :]
            e = (jq >> s) << s
            w1, w2, w3 = (
                jnp.take(tw, k * e, axis=-1).reshape(
                    tw.shape[:1] + (1,) * nbatch + (q,)
                )
                for k in (1, 2, 3)
            )
            t0 = limbs.add_mod(spec, A, C)
            t1 = limbs.add_mod(spec, B, D)
            t2 = limbs.sub_mod(spec, A, C)
            t3 = limbs.mont_mul(spec, limbs.sub_mod(spec, B, D), eye)
            y0 = limbs.add_mod(spec, t0, t1)
            y1 = limbs.mont_mul(spec, limbs.sub_mod(spec, t0, t1), w2)
            y2 = limbs.mont_mul(spec, limbs.add_mod(spec, t2, t3), w1)
            y3 = limbs.mont_mul(spec, limbs.sub_mod(spec, t2, t3), w3)
            return jnp.stack([y0, y1, y2, y3], axis=-1).reshape(a.shape)

        a = jax.lax.fori_loop(0, logn // 2, stage4, a)
        if logn % 2:
            a = stage(logn - 1, a)
    else:
        a = jax.lax.fori_loop(0, logn, stage, a)
    # result is in bit-reversed order; br is an involution so the forward
    # table doubles as the inverse permutation
    a = jnp.take(a, perm, axis=-1)
    if inverse:
        ni = n_inv.reshape(n_inv.shape[:1] + (1,) * nbatch + (1,))
        a = limbs.mont_mul(spec, a, ni)
    return a


@functools.partial(jax.jit, static_argnums=(1,))
def _ntt_jit(a, inverse: bool, perm, tw, n_inv):
    return ntt_mont(a, inverse, perm, tw, n_inv)


# -- four-step (single-chip) ---------------------------------------------------
#
# The Pease interleave above moves data across the TPU *lane* axis every
# stage (stack+reshape on the last axis = a cross-lane shuffle), which is
# what keeps the measured NTT ~10x above its lane-op bound.  The four-step
# factorization n = n1*n2 runs BOTH length-n1/n2 sub-NTTs along the
# sublane axis (full 128-lane rows per vector op, relayouts at row
# granularity), with one transpose and one pointwise twiddle pass between:
#
#   x.reshape(n1, n2) -> NTT_n1 over axis 0 -> * w^(i2*j1) -> transpose
#                     -> NTT_n2 over axis 0 -> flatten = X (natural order)
#
# (same factorization the distributed dNTT uses across chips,
# parallel/dntt.py — here it is the on-chip layout trick.)


@functools.lru_cache(maxsize=None)
def _plan4(n: int, inverse: bool):
    """(n1, n2, tw1 (16, n1), tw2 (16, n2), crossT (16, n1, n2), br1, br2,
    n_inv). tw1/tw2 are the sub-NTT twiddles (powers of w^n2 / w^n1);
    crossT[_, j1, i2] = w^(j1*i2) is the fully materialized step-2 twiddle
    matrix — input-independent, so built once here instead of a 16M-element
    device gather per call (measured: the gather made 4step *slower* than
    pease at 2^20)."""
    logn = n.bit_length() - 1
    log_n2 = (logn + 1) // 2  # lane axis gets the larger factor
    n1, n2 = 1 << (logn - log_n2), 1 << log_n2
    root = fr.root_of_unity(n)
    if inverse:
        root = pow(root, fr.Q - 2, fr.Q)
    w1, w2 = pow(root, n2, fr.Q), pow(root, n1, fr.Q)
    tw1, tw2 = [1] * n1, [1] * n2
    for i in range(1, n1):
        tw1[i] = tw1[i - 1] * w1 % fr.Q
    for i in range(1, n2):
        tw2[i] = tw2[i - 1] * w2 % fr.Q
    base_row = [1] * n2  # w^i2
    for i2 in range(1, n2):
        base_row[i2] = base_row[i2 - 1] * root % fr.Q
    cross = [1] * n  # row j1 = (row j1-1) * w^i2 elementwise = w^(j1*i2)
    for j1 in range(1, n1):
        row = j1 * n2
        prev = row - n2
        for i2 in range(n2):
            cross[row + i2] = cross[prev + i2] * base_row[i2] % fr.Q
    n_inv = FR_SPEC.pack_mont([pow(n, fr.Q - 2, fr.Q)])
    return (
        n1,
        n2,
        FR_SPEC.pack_mont(tw1),
        FR_SPEC.pack_mont(tw2),
        FR_SPEC.pack_mont(cross).reshape(FR_SPEC.L, n1, n2),
        _bit_reverse_perm(n1),
        _bit_reverse_perm(n2),
        n_inv,
    )


def _ntt_axis2(a, m: int, tw, br, nbatch: int):
    """Pease DIF NTT of length m along axis -2 (twiddle table tw holds the
    sub-root powers), bit-reversal fixed by a row gather."""
    spec = FR_SPEC
    if m == 1:
        return a
    logm = m.bit_length() - 1
    half = m // 2
    j = jax.lax.broadcasted_iota(jnp.int32, (half, 1), 0)[:, 0]

    def stage(s, a):
        u = a[..., :half, :]
        v = a[..., half:, :]
        e = (j >> s) << s
        w = jnp.take(tw, e, axis=-1)  # (16, half)
        w = w.reshape(w.shape[:1] + (1,) * nbatch + (half, 1))
        A = limbs.add_mod(spec, u, v)
        B = limbs.mont_mul(spec, limbs.sub_mod(spec, u, v), w)
        return jnp.stack([A, B], axis=-2).reshape(a.shape)

    a = jax.lax.fori_loop(0, logm, stage, a)
    return jnp.take(a, br, axis=-2)


#: BPT_NTT_SUB selects the four-step's sub-NTT implementation:
#: ``pallas`` = fused VMEM-resident kernels (ntt_sub_pallas, recursing
#: four-step past the VMEM limit) — measured 2.5x the XLA stage loop on
#: chip (2^20 NTT 116.7 -> 46.3 ms, bit-identical; PERFORMANCE.md r4);
#: ``xla`` = the stage loop. Default: pallas on TPU, xla elsewhere
#: (interpreter-mode Pallas is minutes-slow on the CPU test backend).
#: Resolved lazily so importing this module never initializes a backend.
@functools.lru_cache(maxsize=1)
def _sub_impl() -> str:
    env = _os.environ.get("BPT_NTT_SUB")
    if env:
        return env
    import jax

    # the tunneled chip registers as platform "axon"; Mosaic kernels are
    # TPU-only, so default to xla on anything else (cpu, gpu, ...)
    return "pallas" if jax.default_backend() in ("tpu", "axon") else "xla"


def _sub_ntt(a, m: int, tw, br, nbatch: int, inverse: bool):
    if _sub_impl() == "pallas" and nbatch == 0 and m > 1:
        from . import pallas_kernels

        if m > pallas_kernels.SUB_MAX_M:
            # recursive four-step: two VMEM-sized fused passes, natural
            # output order (no br fixup needed)
            return pallas_kernels.ntt_sub_pallas_4step(a, inverse)
        out = pallas_kernels.ntt_sub_pallas(a, inverse)
        return jnp.take(out, br, axis=-2)
    return _ntt_axis2(a, m, tw, br, nbatch)


def ntt4_mont(a, inverse: bool, n1: int, n2: int, tw1, tw2, crossT, br1, br2, n_inv):
    """Four-step NTT of Montgomery-form values. a: (16, ..., n) -> same."""
    spec = FR_SPEC
    n = n1 * n2
    assert a.shape[-1] == n
    nbatch = a.ndim - 2
    lead = a.shape[:-1]
    a = a.reshape(lead + (n1, n2))
    # columns: NTT over i1 (length n1, root w^n2), lanes = i2 untouched
    a = _sub_ntt(a, n1, tw1, br1, nbatch, inverse)
    # cross twiddles w^(j1*i2), precomputed (no gather)
    w = crossT.reshape(crossT.shape[:1] + (1,) * nbatch + (n1, n2))
    a = limbs.mont_mul(spec, a, w)
    # rows: transpose so i2 rides the sublane axis, then NTT over i2
    a = jnp.swapaxes(a, -1, -2)  # (16, ..., n2, n1)
    a = _sub_ntt(a, n2, tw2, br2, nbatch, inverse)
    # layout is now (j2, j1); flattening gives X[j1 + n1*j2] — natural order
    a = a.reshape(lead + (n,))
    if inverse:
        ni = n_inv.reshape(n_inv.shape[:1] + (1,) * nbatch + (1,))
        a = limbs.mont_mul(spec, a, ni)
    return a


@functools.partial(jax.jit, static_argnums=(1, 2, 3))
def _ntt4_jit(a, inverse: bool, n1: int, n2: int, tw1, tw2, crossT, br1, br2, n_inv):
    return ntt4_mont(a, inverse, n1, n2, tw1, tw2, crossT, br1, br2, n_inv)


#: BPT_NTT_ALGO=pease forces the constant-geometry path at every size
_ALGO = _os.environ.get("BPT_NTT_ALGO", "4step")
#: below this the lane axis isn't even full and the pease path is fine
_4STEP_MIN_N = int(_os.environ.get("BPT_NTT_4STEP_MIN", "4096"))


@functools.lru_cache(maxsize=None)
def _plan4_device(n: int, inverse: bool):
    """Device-resident four-step plan. The cross-twiddle matrix is (16, n1,
    n2) = 4n words — re-uploading it per call (a fresh jnp.asarray) costs a
    full host->device transfer of 16n bytes EVERY NTT (measured: 1.4 s of
    the 1.5 s 2^20 NTT). Upload once, keep the buffers alive."""
    n1, n2, tw1, tw2, crossT, br1, br2, n_inv = _plan4(n, inverse)
    return (
        n1,
        n2,
        jnp.asarray(tw1),
        jnp.asarray(tw2),
        jnp.asarray(crossT),
        jnp.asarray(br1),
        jnp.asarray(br2),
        jnp.asarray(n_inv),
    )


@functools.lru_cache(maxsize=None)
def _plan_device(n: int, inverse: bool):
    perm, tw, n_inv = _plan(n, inverse)
    return jnp.asarray(perm), jnp.asarray(tw), jnp.asarray(n_inv)


def ntt_device(a_mont, inverse: bool = False):
    """Jitted NTT on Montgomery-form Fr limbs (16, ..., n), position last."""
    n = a_mont.shape[-1]
    if _ALGO == "4step" and n >= _4STEP_MIN_N:
        n1, n2, tw1, tw2, crossT, br1, br2, n_inv = _plan4_device(n, inverse)
        return _ntt4_jit(a_mont, inverse, n1, n2, tw1, tw2, crossT, br1, br2, n_inv)
    perm, tw, n_inv = _plan_device(n, inverse)
    return _ntt_jit(a_mont, inverse, perm, tw, n_inv)


# -- host-boundary helpers ----------------------------------------------------


def ntt_ints(values: list[int], inverse: bool = False) -> list[int]:
    """list[int] -> list[int]; pack, run on device, unpack."""
    a = jnp.asarray(FR_SPEC.pack_mont(values))
    out = ntt_device(a, inverse)
    return FR_SPEC.unpack_mont(np.asarray(jax.device_get(out)))
