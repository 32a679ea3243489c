"""Endomorphism-based subgroup checks (g1.rs:401-438, g2.rs:475-482).

Also a soundness regression: the old checks computed ``P * FR_ORDER``
through a scalar-mul that reduces mod r — identically the identity, i.e.
they accepted EVERY curve point. These tests include genuine
non-subgroup points (E(Fp) has cofactor h1 > 1; E'(Fp2) has h2 > 1) that
must now be rejected, both directly and through deserialization.
"""
import random

from baby_plonk_tpu.curves.g1 import BETA, G1, P
from baby_plonk_tpu.curves.g2 import G2, B2
from baby_plonk_tpu.fields import fq
from baby_plonk_tpu.fields.fr import Q as R
from baby_plonk_tpu.fields.tower import Fp2

rng = random.Random(777)

# cofactors (standard BLS12-381 parameters)
H1 = 0x396C8C005555E1568C00AAAB0000AAAB
H2 = 0x5D543A95414E7F1091D50792876A202CD91DE4547085ABAA68A205B2E5A7DDFA628F1CB4D9E82EF21537E293A6691AE1616EC6E786F0C70CF1C38E31C7238E5


def _curve_point_g1():
    """A point of E(Fp) sampled by x — in the r-subgroup with prob 1/h1."""
    while True:
        x = rng.randrange(P)
        y = fq.sqrt((x * x % P * x + 4) % P)
        if y is not None:
            return G1.from_affine(x, y)


def _curve_point_g2():
    while True:
        x = Fp2(rng.randrange(P), rng.randrange(P))
        y = (x.square() * x + B2).sqrt()
        if y is not None:
            return G2.from_affine(x, y)


def test_beta_is_cube_root_of_unity():
    assert BETA != 1 and pow(BETA, 3, P) == 1


def test_g1_torsion_free_accepts_subgroup():
    for k in (1, 2, rng.randrange(1, R)):
        assert (G1.generator() * k).is_torsion_free()
    assert G1.identity().is_torsion_free()


def test_g1_torsion_free_rejects_cofactor_points():
    for _ in range(3):
        p = _curve_point_g1()
        assert p.is_on_curve()
        # clearing the cofactor lands in the subgroup; the raw point is
        # outside it with overwhelming probability (1 - 1/h1)
        cleared = p._mul_int(H1)
        assert cleared.is_torsion_free()
        if not cleared.is_identity():
            assert not p.is_torsion_free()


def test_g1_from_compressed_rejects_non_subgroup():
    while True:
        p = _curve_point_g1()
        if not p._mul_int(R).is_identity():
            break
    data = p.to_compressed()
    assert G1.from_compressed(data) is None


def test_g2_psi_eigenvalue():
    """psi acts as multiplication by p (== x mod r) on the r-torsion."""
    g = G2.generator() * rng.randrange(1, R)
    assert g.psi() == g * (P % R)


def test_g2_torsion_free_accepts_subgroup():
    for k in (1, 3, rng.randrange(1, R)):
        assert (G2.generator() * k).is_torsion_free()
    assert G2.identity().is_torsion_free()


def test_g2_torsion_free_rejects_cofactor_points():
    for _ in range(2):
        p = _curve_point_g2()
        assert p.is_on_curve()
        cleared = p._mul_int(H2)
        assert cleared.is_torsion_free()
        if not cleared.is_identity():
            assert not p.is_torsion_free()


def test_g2_from_compressed_rejects_non_subgroup():
    while True:
        p = _curve_point_g2()
        if not p._mul_int(R).is_identity():
            break
    data = p.to_compressed()
    assert G2.from_compressed(data) is None


def test_g1_wnaf_mul_matches_double_and_add():
    g = G1.generator()
    for _ in range(5):
        k = rng.randrange(R)
        naive = G1.identity()
        base, kk = g, k
        while kk:
            if kk & 1:
                naive = naive + base
            base = base.double()
            kk >>= 1
        assert g * k == naive
    assert g * 0 == G1.identity()
    assert g * (R - 1) == -g


def test_g1_batch_normalize():
    pts = [G1.generator() * rng.randrange(1, R) for _ in range(7)]
    pts.insert(3, G1.identity())
    got = G1.batch_normalize(pts)
    for p, aff in zip(pts, got):
        assert aff == p.to_affine()
