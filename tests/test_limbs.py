"""Limb-vector modular arithmetic vs exact host oracle (SURVEY.md §7.1 step 1)."""
import random

import jax.numpy as jnp
import numpy as np
import pytest

from baby_plonk_tpu.fields import fr, fq
from baby_plonk_tpu.ops import limbs
from baby_plonk_tpu.ops.limbs import FieldSpec

FR = FieldSpec(fr.Q, 16)
FQ = FieldSpec(fq.P, 24)
FQ12 = FieldSpec(fq.P, 32, radix=12)  # radix-12 variant (no lo/hi product split)
FR12 = FieldSpec(fr.Q, 22, radix=12)

rng = random.Random(1234)


def _rand(spec, n):
    return [rng.randrange(spec.modulus) for _ in range(n)]


@pytest.mark.parametrize("spec", [FR, FQ], ids=["fr", "fq"])
def test_pack_roundtrip(spec):
    xs = _rand(spec, 7) + [0, 1, spec.modulus - 1]
    arr = limbs.ints_to_array(xs, spec.L)
    assert limbs.array_to_ints(arr) == xs
    m = spec.pack_mont(xs)
    assert spec.unpack_mont(m) == xs


def _unpack_raw(spec, a):
    a = np.asarray(a)
    return [
        sum(int(a[j, i]) << (spec.radix * j) for j in range(spec.L))
        for i in range(a.shape[1])
    ]


@pytest.mark.parametrize("spec", [FR, FQ, FQ12], ids=["fr", "fq", "fq12"])
def test_add_sub_neg(spec):
    n = 64
    xs = _rand(spec, n - 3) + [0, 1, spec.modulus - 1]
    ys = _rand(spec, n - 3) + [spec.modulus - 1, 0, spec.modulus - 1]
    a = spec.pack_raw(xs)
    b = spec.pack_raw(ys)
    got_add = _unpack_raw(spec, limbs.add_mod_jit(spec, a, b))
    got_sub = _unpack_raw(spec, limbs.sub_mod_jit(spec, a, b))
    got_neg = _unpack_raw(spec, limbs.neg_mod_jit(spec, a))
    M = spec.modulus
    assert got_add == [(x + y) % M for x, y in zip(xs, ys)]
    assert got_sub == [(x - y) % M for x, y in zip(xs, ys)]
    assert got_neg == [(-x) % M for x in xs]


@pytest.mark.parametrize("spec", [FR, FQ, FQ12, FR12], ids=["fr", "fq", "fq12", "fr12"])
def test_mont_mul(spec):
    n = 64
    xs = _rand(spec, n - 3) + [0, 1, spec.modulus - 1]
    ys = _rand(spec, n - 3) + [spec.modulus - 1, 1, spec.modulus - 1]
    a = spec.pack_mont(xs)
    b = spec.pack_mont(ys)
    got = spec.unpack_mont(np.asarray(limbs.mont_mul_jit(spec, a, b)))
    M = spec.modulus
    assert got == [x * y % M for x, y in zip(xs, ys)]


@pytest.mark.parametrize("spec", [FR, FQ], ids=["fr", "fq"])
def test_mont_form_conversions(spec):
    xs = _rand(spec, 9)
    raw = limbs.ints_to_array(xs, spec.L)
    m = limbs.to_mont_jit(spec, raw)
    assert spec.unpack_mont(np.asarray(m)) == xs
    back = limbs.from_mont_jit(spec, m)
    assert limbs.array_to_ints(np.asarray(back)) == xs


def test_mont_pow_fixed():
    xs = _rand(FR, 5)
    a = FR.pack_mont(xs)
    e = 0xDEADBEEF12345
    got = FR.unpack_mont(np.asarray(limbs.mont_pow_fixed_jit(FR, a, e)))
    assert got == [pow(x, e, fr.Q) for x in xs]


def test_broadcasting():
    xs = _rand(FR, 8)
    y = _rand(FR, 1)
    a = FR.pack_mont(xs).reshape(16, 2, 4)
    b = FR.pack_mont(y).reshape(16, 1, 1)
    got = FR.unpack_mont(np.asarray(limbs.mont_mul_jit(FR, a, b)).reshape(16, 8))
    assert got == [x * y[0] % fr.Q for x in xs]


@pytest.mark.slow
def test_batch_inverse():
    """Device batch inversion (Montgomery's trick, scan form)."""
    import jax.numpy as jnp

    from baby_plonk_tpu.fields import fr
    from baby_plonk_tpu.ops import limbs as L

    spec = L.FieldSpec(fr.Q, 16)
    rng2 = random.Random(99)
    vals = [rng2.randrange(1, fr.Q) for _ in range(33)] + [0, 1, fr.Q - 1]
    a = jnp.asarray(spec.pack_mont(vals))
    out = spec.unpack_mont(np.asarray(L.batch_inverse(spec, a)))
    for v, iv in zip(vals, out):
        if v == 0:
            assert iv == 0
        else:
            assert v * iv % fr.Q == 1


@pytest.mark.parametrize("spec", [FR, FQ, FQ12], ids=["fr", "fq", "fq12"])
def test_mont_sqr_dedicated(spec):
    """Dedicated squaring column sums (_sqr_cols: off-diagonals once,
    doubled post-split) vs exact host squares, flat + compact forms."""
    import jax

    xs = _rand(spec, 6) + [0, 1, spec.modulus - 1, spec.modulus - 2]
    a = jnp.asarray(spec.pack_mont(xs))
    want = [x * x % spec.modulus for x in xs]
    got = spec.unpack_mont(np.asarray(jax.jit(lambda v: limbs.mont_sqr(spec, v))(a)))
    assert got == want
    with limbs.compact_mul():
        got = spec.unpack_mont(
            np.asarray(jax.jit(lambda v: limbs.mont_sqr(spec, v))(a))
        )
    assert got == want


@pytest.mark.parametrize("spec", [FQ, FQ12], ids=["fq", "fq12"])
@pytest.mark.parametrize("c", [1, 2, 3, 12, 255])
def test_mul_small(spec, c):
    """Constant multiply via scaled carry pass + conditional subtractions
    (no limb products) — the b3 shortcut in the point formulas."""
    import jax

    xs = _rand(spec, 5) + [0, 1, spec.modulus - 1]
    a = jnp.asarray(spec.pack_mont(xs))
    got = spec.unpack_mont(
        np.asarray(jax.jit(lambda v: limbs.mul_small(spec, v, c))(a))
    )
    assert got == [x * c % spec.modulus for x in xs]
