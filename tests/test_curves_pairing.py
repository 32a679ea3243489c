"""Curve group laws, zkcrypto-format serialization (golden vectors), pairing."""
import os
import random

import pytest

from baby_plonk_tpu.curves.g1 import G1
from baby_plonk_tpu.curves.g2 import G2
from baby_plonk_tpu.curves import msm_host
from baby_plonk_tpu.curves.pairing import (
    final_exponentiation,
    final_exponentiation_slow,
    miller_loop,
    multi_miller_loop,
    pairing,
)
from baby_plonk_tpu.fields.fr import Q as R

_VEC_DIR = "/root/reference/lib/bls12_381/src/tests"


def test_g1_group_law():
    g = G1.generator()
    assert g.is_on_curve()
    assert (g + g) == g.double()
    assert (g * 5) == g + g + g + g + g
    assert (g * R).is_identity()
    assert (g + G1.identity()) == g
    assert (g - g).is_identity()


def test_g2_group_law():
    g = G2.generator()
    assert g.is_on_curve()
    assert (g + g) == g.double()
    assert (g * 5) == g + g + g + g + g
    assert (g * R).is_identity()
    assert (g - g).is_identity()


def test_g1_serialization_roundtrip():
    rng = random.Random(7)
    for _ in range(5):
        p = G1.generator() * rng.randrange(R)
        assert G1.from_compressed(p.to_compressed()) == p
        assert G1.from_uncompressed(p.to_uncompressed()) == p
    ident = G1.identity()
    assert G1.from_compressed(ident.to_compressed()).is_identity()


def test_g2_serialization_roundtrip():
    rng = random.Random(8)
    for _ in range(3):
        p = G2.generator() * rng.randrange(R)
        assert G2.from_compressed(p.to_compressed()) == p
        assert G2.from_uncompressed(p.to_uncompressed()) == p


@pytest.mark.skipif(not os.path.isdir(_VEC_DIR), reason="reference golden vectors unavailable")
@pytest.mark.parametrize(
    "fname,group,method",
    [
        ("g1_compressed_valid_test_vectors.dat", G1, "to_compressed"),
        ("g1_uncompressed_valid_test_vectors.dat", G1, "to_uncompressed"),
        ("g2_compressed_valid_test_vectors.dat", G2, "to_compressed"),
        ("g2_uncompressed_valid_test_vectors.dat", G2, "to_uncompressed"),
    ],
)
def test_golden_serialization_vectors(fname, group, method):
    """1000 cumulative multiples of the generator, byte-exact vs upstream
    zkcrypto golden files (lib/bls12_381/src/tests/mod.rs:4-60)."""
    data = open(os.path.join(_VEC_DIR, fname), "rb").read()
    e = group.identity()
    out = bytearray()
    for _ in range(1000):
        out += getattr(e, method)()
        e = e + group.generator()
    assert bytes(out) == data


def test_msm_host_matches_naive():
    rng = random.Random(9)
    pts = [G1.generator() * rng.randrange(R) for _ in range(50)]
    scalars = [rng.randrange(R) for _ in range(50)]
    assert msm_host.msm(pts, scalars) == msm_host.msm_naive(pts, scalars)
    # degenerate cases
    assert msm_host.msm([], []).is_identity()
    assert msm_host.msm(pts[:1], [0]).is_identity()


def test_pairing_bilinearity():
    g1, g2 = G1.generator(), G2.generator()
    assert pairing(g1 * 2, g2 * 3) == pairing(g1 * 6, g2)
    assert pairing(g1 * 2, g2 * 3) == pairing(g1, g2).pow(6)
    assert pairing(g1, g2).pow(R).is_one()
    assert not pairing(g1, g2).is_one()


def test_pairing_identity():
    assert pairing(G1.identity(), G2.generator()).is_one()
    assert pairing(G1.generator(), G2.identity()).is_one()


def test_final_exp_fast_matches_slow_oracle():
    f = miller_loop(G1.generator() * 5, G2.generator() * 7)
    assert final_exponentiation(f) == final_exponentiation_slow(f)


def test_multi_miller_loop_consistency():
    g1, g2 = G1.generator(), G2.generator()
    # e(aP, Q) * e(-P, aQ) == 1
    a = 12345
    f = multi_miller_loop([(g1 * a, g2), (-g1, g2 * a)])
    assert final_exponentiation(f).is_one()


def test_tower_squaring_formulas():
    """Fp6 CH-SQR2, Fp12 Karatsuba, and Granger-Scott cyclotomic squaring
    all agree with the dense product."""
    from baby_plonk_tpu.fields import fq
    from baby_plonk_tpu.fields.tower import Fp2, Fp6, Fp12

    rng = random.Random(42)

    def rfp2():
        return Fp2(rng.randrange(fq.P), rng.randrange(fq.P))

    for _ in range(5):
        a6 = Fp6(rfp2(), rfp2(), rfp2())
        assert a6.square() == a6 * a6
        a12 = Fp12(Fp6(rfp2(), rfp2(), rfp2()), Fp6(rfp2(), rfp2(), rfp2()))
        assert a12.square() == a12 * a12

    # cyclotomic squaring is only valid in the cyclotomic subgroup: use a
    # pairing output (and its powers) as representative elements
    f = pairing(G1.generator() * 3, G2.generator() * 11)
    for e in (1, 2, 5):
        g = f.pow(e)
        assert g.cyclotomic_square() == g * g
