"""End-to-end prove + verify tests — the reference's own integration
circuit (tests/verify_proof_test.rs:13-50) plus larger synthetic circuits."""
import random

import pytest

from baby_plonk_tpu.fields import fr
from baby_plonk_tpu.protocol.program import Program
from baby_plonk_tpu.protocol.proof import Proof
from baby_plonk_tpu.protocol.prover import Prover
from baby_plonk_tpu.protocol.setup import Setup
from baby_plonk_tpu.protocol.verifier import Verifier

Q = fr.Q

REF_CONSTRAINTS = ["e public", "c <== a * b + b", "e <== c * d"]
REF_WITNESS = {"a": 3, "b": 4, "c": 16, "d": 5, "e": 80}


@pytest.fixture(scope="module")
def ref_setup():
    return Setup.generate_srs(8 + 6, 101, cache=False)


def test_reference_circuit(ref_setup):
    """The exact reference e2e circuit: SRS(14, tau=101), group order 8."""
    program = Program.from_strs(REF_CONSTRAINTS, 8)
    proof = Prover(ref_setup, program).prove(REF_WITNESS)
    assert Verifier(ref_setup, program, proof).verify([80])


def test_wrong_public_input_rejected(ref_setup):
    program = Program.from_strs(REF_CONSTRAINTS, 8)
    proof = Prover(ref_setup, program).prove(REF_WITNESS)
    assert not Verifier(ref_setup, program, proof).verify([81])


def test_invalid_witness_rejected(ref_setup):
    program = Program.from_strs(REF_CONSTRAINTS, 8)
    bad_witness = dict(REF_WITNESS, c=17)  # violates c == a*b + b
    with pytest.raises(AssertionError):
        # inconsistent witness breaks quotient divisibility
        Prover(ref_setup, program).prove(bad_witness)


def test_proof_tamper_rejected(ref_setup):
    program = Program.from_strs(REF_CONSTRAINTS, 8)
    proof = Prover(ref_setup, program).prove(REF_WITNESS)
    raw = bytearray(proof.to_bytes())
    # flip a scalar byte (point bytes would fail decode)
    raw[-1] ^= 1
    tampered = Proof.from_bytes(bytes(raw))
    assert not Verifier(ref_setup, program, tampered).verify([80])


def test_deterministic_with_fixed_blinding(ref_setup):
    """Fixed blinding + fixed tau => byte-identical proofs. This is the
    self-golden regression anchor for transcript + commitment stability."""
    program = Program.from_strs(REF_CONSTRAINTS, 8)
    blinding = list(range(1, 12))
    p1 = Prover(ref_setup, program).prove(REF_WITNESS, blinding=blinding)
    p2 = Prover(ref_setup, program).prove(REF_WITNESS, blinding=blinding)
    assert p1.to_bytes() == p2.to_bytes()
    assert Verifier(ref_setup, program, p1).verify([80])


def test_proof_serialization_roundtrip(ref_setup):
    program = Program.from_strs(REF_CONSTRAINTS, 8)
    proof = Prover(ref_setup, program).prove(REF_WITNESS)
    assert Proof.from_bytes(proof.to_bytes()) == proof


def _random_mul_chain_circuit(n_gates: int, seed: int):
    """Chain: v0 public; v_{i+1} <== v_i * v_i + c_i."""
    rng = random.Random(seed)
    constraints = ["v0 public"]
    witness = {"v0": rng.randrange(1, 1000)}
    cur = witness["v0"]
    for i in range(n_gates - 1):
        c = rng.randrange(1000)
        constraints.append(f"v{i+1} <== v{i} * v{i} + {c}")
        cur = (cur * cur + c) % Q
        witness[f"v{i+1}"] = cur
    return constraints, witness


def test_larger_circuit_group_order_32():
    n = 32
    setup = Setup.generate_srs(n + 6, 0xDEADBEEF, cache=False)
    constraints, witness = _random_mul_chain_circuit(20, seed=42)
    program = Program.from_strs(constraints, n)
    proof = Prover(setup, program).prove(witness)
    assert Verifier(setup, program, proof).verify([witness["v0"]])


def test_multiple_public_inputs():
    n = 16
    setup = Setup.generate_srs(n + 6, 777, cache=False)
    constraints = ["x public", "y public", "z <== x * y", "w <== z * x + x"]
    x, y = 6, 7
    z = x * y
    w = (z * x + x) % Q
    witness = {"x": x, "y": y, "z": z, "w": w}
    program = Program.from_strs(constraints, n)
    proof = Prover(setup, program).prove(witness)
    assert Verifier(setup, program, proof).verify([x, y])
    assert not Verifier(setup, program, proof).verify([y, x])
