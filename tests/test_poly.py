"""Polynomial engine tests: NTT correctness vs the reference's DFT
convention, algebra identities, special-form division."""
import random

from baby_plonk_tpu.fields import fr
from baby_plonk_tpu.protocol.poly import (
    Basis,
    Poly,
    i_ntt,
    ntt,
    vanishing_poly,
)

Q = fr.Q


def _naive_dft(values, inverse=False):
    """The reference's O(n^2) matrix DFT (utils.rs:63-129), as oracle."""
    n = len(values)
    w = fr.root_of_unity(n)
    if inverse:
        w = pow(w, Q - 2, Q)
    out = []
    for i in range(n):
        acc = 0
        for j, v in enumerate(values):
            acc = (acc + v * pow(w, i * j, Q)) % Q
        out.append(acc)
    if inverse:
        n_inv = pow(n, Q - 2, Q)
        out = [x * n_inv % Q for x in out]
    return out


def test_ntt_matches_reference_dft_convention():
    rng = random.Random(11)
    for n in (1, 2, 4, 8, 32):
        vals = [rng.randrange(Q) for _ in range(n)]
        assert ntt(vals) == _naive_dft(vals)
        assert i_ntt(vals) == _naive_dft(vals, inverse=True)


def test_ntt_roundtrip():
    rng = random.Random(12)
    for n in (8, 64, 1024):
        vals = [rng.randrange(Q) for _ in range(n)]
        assert i_ntt(ntt(vals)) == vals
        assert ntt(i_ntt(vals)) == vals


def test_poly_mul_matches_schoolbook():
    rng = random.Random(13)
    a = Poly([rng.randrange(Q) for _ in range(7)], Basis.MONOMIAL)
    b = Poly([rng.randrange(Q) for _ in range(5)], Basis.MONOMIAL)
    prod = a * b
    # schoolbook oracle
    out = [0] * (7 + 5 - 1)
    for i, x in enumerate(a.values):
        for j, y in enumerate(b.values):
            out[i + j] = (out[i + j] + x * y) % Q
    assert prod.values == out


def test_lagrange_ops():
    rng = random.Random(14)
    n = 8
    av = [rng.randrange(Q) for _ in range(n)]
    bv = [rng.randrange(Q) for _ in range(n)]
    a = Poly(av, Basis.LAGRANGE)
    b = Poly(bv, Basis.LAGRANGE)
    assert (a + b).values == [(x + y) % Q for x, y in zip(av, bv)]
    assert (a * b).values == [x * y % Q for x, y in zip(av, bv)]
    # scalar subtraction must actually subtract (reference bug at
    # polynomial.rs:126-129 NOT replicated)
    assert (a - 5).values == [(x - 5) % Q for x in av]


def test_lagrange_monomial_consistency():
    rng = random.Random(15)
    n = 16
    coeffs = [rng.randrange(Q) for _ in range(n)]
    p = Poly(coeffs, Basis.MONOMIAL)
    lag = p.to_lagrange()
    roots = fr.roots_of_unity(n)
    for i in (0, 1, 5, 15):
        assert lag.values[i] == p.eval(roots[i])
    assert lag.to_monomial().values == coeffs


def test_divide_by_vanishing():
    rng = random.Random(16)
    n = 8
    q = Poly([rng.randrange(Q) for _ in range(2 * n + 3)], Basis.MONOMIAL)
    num = q * vanishing_poly(n)
    assert num.divide_by_vanishing(n) == q


def test_divide_by_linear():
    rng = random.Random(17)
    q = Poly([rng.randrange(Q) for _ in range(12)], Basis.MONOMIAL)
    z = rng.randrange(Q)
    num = q * Poly([(-z) % Q, 1], Basis.MONOMIAL)
    assert num.divide_by_linear(z) == q


def test_scale_domain():
    rng = random.Random(18)
    p = Poly([rng.randrange(Q) for _ in range(9)], Basis.MONOMIAL)
    k = rng.randrange(Q)
    x = rng.randrange(Q)
    assert p.scale_domain(k).eval(x) == p.eval(k * x % Q)


def test_intt_of_roots_is_x():
    # iNTT([w^i]) == x — used in round 3 (prover.rs:424)
    n = 8
    roots = fr.roots_of_unity(n)
    coeffs = i_ntt(roots)
    assert coeffs == [0, 1] + [0] * (n - 2)


def test_general_divmod_and_exact_divide():
    """General schoolbook division surface (polynomial.rs:314-380 parity):
    q*d + r round-trips, exact `/` matches the specialized fast forms."""
    import random

    rng = random.Random(5150)
    for deg_n, deg_d in ((7, 3), (12, 1), (5, 5), (2, 4)):
        a = Poly([rng.randrange(fr.Q) for _ in range(deg_n + 1)], Basis.MONOMIAL)
        d = Poly(
            [rng.randrange(fr.Q) for _ in range(deg_d)] + [rng.randrange(1, fr.Q)],
            Basis.MONOMIAL,
        )
        q, r = divmod(a, d)
        assert r.degree() < d.degree() or r.values == [0]
        assert q * d + r == a
    # exact: multiply then divide round-trips
    a = Poly([rng.randrange(fr.Q) for _ in range(9)], Basis.MONOMIAL)
    d = Poly([rng.randrange(fr.Q) for _ in range(4)] + [1], Basis.MONOMIAL)
    assert (a * d) / d == a
    # agrees with the specialized forms
    n = 8
    zh = vanishing_poly(n)
    prod = a * zh
    assert prod / zh == prod.divide_by_vanishing(n)
    z = rng.randrange(fr.Q)
    lin = Poly([(-z) % fr.Q, 1], Basis.MONOMIAL)
    assert (a * lin) / lin == (a * lin).divide_by_linear(z)
    # inexact division asserts
    try:
        _ = Poly([1, 1, 1], Basis.MONOMIAL) / Poly([5, 1], Basis.MONOMIAL)
        assert False, "expected remainder assert"
    except AssertionError as e:
        assert "remainder" in str(e)
