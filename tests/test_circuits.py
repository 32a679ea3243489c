"""Circuit library end-to-end (host engine)."""
import pytest

from baby_plonk_tpu import circuits
from baby_plonk_tpu.protocol.program import Program
from baby_plonk_tpu.protocol.prover import Prover
from baby_plonk_tpu.protocol.setup import Setup
from baby_plonk_tpu.protocol.verifier import Verifier


def _round_trip(constraints, witness, public, n):
    setup = Setup.generate_srs(n + 6, tau=777, cache=False)
    program = Program.from_strs(constraints, n)
    proof = Prover(setup, program).prove(witness)
    assert Verifier(setup, program, proof).verify(public)
    assert not Verifier(setup, program, proof).verify([(public[0] + 1)])


def test_mul_chain():
    c, w, p = circuits.mul_chain(8)
    _round_trip(c, w, p, 8)


def test_fib_chain():
    c, w, p = circuits.fib_chain(14)
    _round_trip(c, w, p, 16)


def test_inner_product():
    c, w, p = circuits.inner_product([(2, 3), (5, 7), (11, 13)])
    assert p == [2 * 3 + 5 * 7 + 11 * 13]
    _round_trip(c, w, p, 16)


def test_poly_eval():
    coeffs = [4, 0, 7, 9]
    x = 5
    c, w, p = circuits.poly_eval(coeffs, x)
    want = sum(co * x**i for i, co in enumerate(coeffs))
    assert p == [want]
    _round_trip(c, w, p, 8)
