"""Gt target-group type (pairings.rs:211-296 parity surface)."""
import random

from baby_plonk_tpu.curves.g1 import G1
from baby_plonk_tpu.curves.g2 import G2
from baby_plonk_tpu.curves.gt import Gt
from baby_plonk_tpu.curves.pairing import pairing
from baby_plonk_tpu.fields import fr

rng = random.Random(99)


def test_gt_group_law():
    g = Gt.generator()
    a, b = rng.randrange(fr.Q), rng.randrange(fr.Q)
    assert g * a + g * b == g * ((a + b) % fr.Q)
    assert g * a - g * a == Gt.identity()
    assert -(g * a) == g * (fr.Q - a)
    assert (g * a).double() == g * (2 * a % fr.Q)
    assert g + Gt.identity() == g
    assert Gt.identity().is_identity()
    assert not g.is_identity()


def test_gt_matches_pairing_bilinearity():
    a, b = rng.randrange(1, 2**32), rng.randrange(1, 2**32)
    lhs = Gt(pairing(G1.generator() * a, G2.generator() * b))
    assert lhs == Gt.generator() * (a * b)


def test_gt_serialization_roundtrip():
    g = Gt.generator() * rng.randrange(fr.Q)
    wire = g.to_bytes()
    assert len(wire) == 576
    back = Gt.from_bytes(wire)
    assert back is not None and back == g
    # identity round-trips too
    assert Gt.from_bytes(Gt.identity().to_bytes()) == Gt.identity()
    # malformed: wrong length, non-canonical coefficient, out-of-subgroup
    assert Gt.from_bytes(wire[:-1]) is None
    bad = b"\xff" * 48 + wire[48:]
    assert Gt.from_bytes(bad) is None
    notin = (2).to_bytes(48, "big") + b"\x00" * 528  # Fp12 value 2*w^...: order != r
    assert Gt.from_bytes(notin) is None


def test_gt_torsion():
    assert Gt.generator().is_torsion_free()
    assert (Gt.generator() * rng.randrange(fr.Q)).is_torsion_free()
