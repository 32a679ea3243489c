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
    """(perm, twiddle_table (16, n/2), n_inv (16, 1)) host tables."""
    root = fr.root_of_unity(n) if n > 1 else 1
    if inverse:
        root = pow(root, fr.Q - 2, fr.Q)
    tw = [1] * max(n // 2, 1)
    for i in range(1, n // 2):
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


def ntt_device(a_mont, inverse: bool = False):
    """Jitted NTT on Montgomery-form Fr limbs (16, ..., n), position last."""
    n = a_mont.shape[-1]
    perm, tw, n_inv = _plan(n, inverse)
    return _ntt_jit(
        a_mont, inverse, jnp.asarray(perm), jnp.asarray(tw), jnp.asarray(n_inv)
    )


# -- host-boundary helpers ----------------------------------------------------


def ntt_ints(values: list[int], inverse: bool = False) -> list[int]:
    """list[int] -> list[int]; pack, run on device, unpack."""
    a = jnp.asarray(FR_SPEC.pack_mont(values))
    out = ntt_device(a, inverse)
    return FR_SPEC.unpack_mont(np.asarray(jax.device_get(out)))
