"""Batch verification: k proofs, one 2-pairing check.

Capability beyond the reference (verifier.rs verifies one proof per
pairing); soundness is the standard random-linear-combination argument,
with Fiat–Shamir-derived combiners over all proofs and public inputs.
"""
import pytest

from baby_plonk_tpu.protocol.program import Program
from baby_plonk_tpu.protocol.proof import Proof
from baby_plonk_tpu.protocol.prover import Prover
from baby_plonk_tpu.protocol.setup import Setup
from baby_plonk_tpu.protocol.verifier import Verifier, batch_verify


@pytest.fixture(scope="module")
def batch():
    n = 8
    setup = Setup.generate_srs(n + 6, tau=2718, cache=False)
    prog_a = Program.from_strs(["e public", "c <== a * b + b", "e <== c * d"], n)
    prog_b = Program.from_strs(["s public", "xx <== x * x", "s <== xx * 1 + y"], n)
    proofs = [
        (prog_a, Prover(setup, prog_a).prove({"a": 3, "b": 4, "c": 16, "d": 5, "e": 80}), [80]),
        (prog_b, Prover(setup, prog_b).prove({"x": 11, "xx": 121, "y": 7, "s": 128}), [128]),
        (prog_a, Prover(setup, prog_a).prove({"a": 2, "b": 5, "c": 15, "d": 3, "e": 45}), [45]),
    ]
    return setup, proofs


def test_batch_verify_accepts(batch):
    setup, proofs = batch
    checks = [(Verifier(setup, prog, pf), pub) for prog, pf, pub in proofs]
    assert batch_verify(checks)
    assert batch_verify([])  # vacuous batch


def test_batch_verify_rejects_one_bad_proof(batch):
    setup, proofs = batch
    prog, pf, pub = proofs[1]
    bad = bytearray(pf.to_bytes())
    bad[600] ^= 1  # flip a scalar byte
    checks = [
        (Verifier(setup, proofs[0][0], proofs[0][1]), proofs[0][2]),
        (Verifier(setup, prog, Proof.from_bytes(bytes(bad))), pub),
        (Verifier(setup, proofs[2][0], proofs[2][1]), proofs[2][2]),
    ]
    assert not batch_verify(checks)
    # and a wrong public input alone must also sink the batch
    checks2 = [
        (Verifier(setup, p, f), pub if i != 2 else [pub[0] + 1])
        for i, (p, f, pub) in enumerate(proofs)
    ]
    assert not batch_verify(checks2)


def test_batch_matches_individual(batch):
    setup, proofs = batch
    for prog, pf, pub in proofs:
        assert Verifier(setup, prog, pf).verify(pub)
        assert batch_verify([(Verifier(setup, prog, pf), pub)])
