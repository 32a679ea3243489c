"""Device polynomial engine vs host oracle."""
import random

import pytest

from baby_plonk_tpu.fields import fr
from baby_plonk_tpu.ops.dpoly import DPoly
from baby_plonk_tpu.protocol.poly import Basis, Poly

rng = random.Random(555)
Q = fr.Q


def _rand(n):
    return [rng.randrange(Q) for _ in range(n)]


def _dp(vals, basis=Basis.MONOMIAL):
    return DPoly.from_ints(vals, basis)


def test_add_sub_mul_scalar():
    a, b = _rand(10), _rand(7)
    k = rng.randrange(Q)
    ha, hb = Poly(a, Basis.MONOMIAL), Poly(b, Basis.MONOMIAL)
    da, db = _dp(a), _dp(b)
    assert (da + db).values == (ha + hb).values
    assert (da - db).values == (ha - hb).values
    assert (da * k).values == (ha * k).values
    assert (da + k).values == (ha + k).values
    assert (da - k).values == (ha - k).values


def test_mul_poly():
    a, b = _rand(9), _rand(14)
    got = (_dp(a) * _dp(b)).values
    want = (Poly(a, Basis.MONOMIAL) * Poly(b, Basis.MONOMIAL)).values
    assert got == want


def test_lagrange_ops():
    n = 16
    a, b = _rand(n), _rand(n)
    da, db = _dp(a, Basis.LAGRANGE), _dp(b, Basis.LAGRANGE)
    assert (da * db).values == [x * y % Q for x, y in zip(a, b)]
    assert da.to_monomial().values == Poly(a, Basis.LAGRANGE).to_monomial().values
    assert (
        _dp(a[:4]).to_lagrange(n).values
        == Poly(a[:4], Basis.MONOMIAL).to_lagrange(n).values
    )


@pytest.mark.slow
def test_eval_and_scale():
    a = _rand(13)
    z = rng.randrange(Q)
    assert _dp(a).eval(z) == Poly(a, Basis.MONOMIAL).eval(z)
    assert _dp(a).scale_domain(z).values == Poly(a, Basis.MONOMIAL).scale_domain(z).values


def test_divide_by_vanishing():
    n = 8
    q = _rand(2 * n + 5)
    zh = Poly([Q - 1] + [0] * (n - 1) + [1], Basis.MONOMIAL)
    num = Poly(q, Basis.MONOMIAL) * zh
    got = _dp(num.values).divide_by_vanishing(n).values
    want = num.divide_by_vanishing(n).values
    # lengths may differ by trailing zeros
    assert got[: len(want)] == want and all(v == 0 for v in got[len(want):])


def test_divide_by_vanishing_rejects_inexact():
    with pytest.raises(AssertionError):
        _dp(_rand(20)).divide_by_vanishing(8)


def test_divide_by_linear():
    z = rng.randrange(1, Q)
    q = _rand(11)
    num = Poly(q, Basis.MONOMIAL) * Poly([(-z) % Q, 1], Basis.MONOMIAL)
    got = _dp(num.values).divide_by_linear(z).values
    want = num.divide_by_linear(z).values
    assert got[: len(want)] == want and all(v == 0 for v in got[len(want):])


def test_slice_coeffs():
    a = _rand(20)
    d = _dp(a)
    h = Poly(a, Basis.MONOMIAL)
    assert d.slice_coeffs(0, 8).values == h.slice_coeffs(0, 8).values
    assert d.slice_coeffs(8, 16).values == h.slice_coeffs(8, 16).values
    assert d.slice_coeffs(16, 26).values == h.slice_coeffs(16, 26).values
    assert d.slice_coeffs(30, 34).values == h.slice_coeffs(30, 34).values
