"""Frozen cross-stack golden fixtures (SURVEY.md §4 definition of done).

The committed fixture pins, for the reference's own integration circuit
(tests/verify_proof_test.rs:13-50) with fixed blinding (1..11) and fixed
tau = 101:

  * the full 5-round Fiat-Shamir challenge vector (beta, gamma, alpha,
    zeta, nu, mu) — derived through the byte-exact merlin/STROBE-128
    transcript (transcript.rs:8-86 incl. the b"z_1" alpha-label quirk);
  * the 624-byte proof wire encoding.

Any silent drift in the field/NTT/MSM/serialization/transcript pipeline
breaks these asserts. The values were frozen from the round-1 stack whose
transcript passes merlin 3.0's published library vector and whose G1/G2
codecs replay zkcrypto's 1000-point golden .dat files byte-exactly.
"""
import json
import os

import pytest

from baby_plonk_tpu.protocol.program import Program
from baby_plonk_tpu.protocol.proof import Proof
from baby_plonk_tpu.protocol.prover import Prover
from baby_plonk_tpu.protocol.setup import Setup
from baby_plonk_tpu.protocol.verifier import Verifier

_DIR = os.path.join(os.path.dirname(__file__), "fixtures")
#: golden_proof.json = the reference's 3-gate integration circuit;
#: golden_proof_mul_chain.json = 23-gate multiply chain at group order 32
#: whose variables each feed several gates — nontrivial sigma-permutation
#: cycles through all three wire columns (program.rs:76-147), which the
#: 3-gate circuit barely exercises. Regenerate: scripts/freeze_fixture.py.
FIXTURES = ["golden_proof.json", "golden_proof_mul_chain.json"]


@pytest.fixture(scope="module", params=FIXTURES)
def fix(request):
    with open(os.path.join(_DIR, request.param)) as f:
        return json.load(f)


@pytest.fixture(scope="module")
def reproved(fix):
    setup = Setup.generate_srs(fix["group_order"] + 6, tau=fix["tau"], cache=False)
    program = Program.from_strs(fix["circuit"], fix["group_order"])
    prover = Prover(setup, program)
    proof = prover.prove(fix["witness"], blinding=fix["blinding"])
    return setup, program, prover, proof


def test_challenge_vector_frozen(fix, reproved):
    _, _, prover, _ = reproved
    for name, want_hex in fix["challenges"].items():
        assert getattr(prover.ch, name) == int(want_hex, 16), (
            f"challenge {name} drifted from the frozen vector"
        )


def test_proof_bytes_frozen(fix, reproved):
    _, _, _, proof = reproved
    assert proof.to_bytes().hex() == fix["proof_hex"], (
        "fixed-blinding proof bytes drifted from the frozen fixture"
    )


def test_frozen_proof_bytes_verify(fix, reproved):
    """The committed byte string itself (not a reproved one) must verify."""
    setup, program, _, _ = reproved
    proof = Proof.from_bytes(bytes.fromhex(fix["proof_hex"]))
    assert Verifier(setup, program, proof).verify(fix["public"])


def test_frozen_proof_rejects_wrong_public(fix, reproved):
    setup, program, _, _ = reproved
    proof = Proof.from_bytes(bytes.fromhex(fix["proof_hex"]))
    wrong = [(fix["public"][0] + 1) % (2**255)]
    assert not Verifier(setup, program, proof).verify(wrong)
