"""Per-round prover internals, mirroring the reference's unit tests
(prover.rs:794-918: test_round_1 gate identity, test_coset, round-2
grand-product structure)."""
import pytest

from baby_plonk_tpu.fields import fr
from baby_plonk_tpu.protocol.program import Program
from baby_plonk_tpu.protocol.prover import K1, K2, Prover
from baby_plonk_tpu.protocol.setup import Setup

Q = fr.Q
N = 8


@pytest.fixture(scope="module")
def prover():
    setup = Setup.generate_srs(N + 6, tau=101, cache=False)
    program = Program.from_strs(["e public", "c <== a * b + b", "e <== c * d"], N)
    p = Prover(setup, program)
    p.prove({"a": 3, "b": 4, "c": 16, "d": 5, "e": 80}, blinding=list(range(1, 12)))
    return p


def test_round_1_gate_identity(prover):
    """ql*a + qr*b + qm*a*b + qo*c + qc + PI == 0 on every row
    (prover.rs:847-859)."""
    pk = prover.pk
    a, b, c = prover.a_values, prover.b_values, prover.c_values
    pi = prover.public_input_poly.values
    for i in range(N):
        lhs = (
            pk.ql.values[i] * a[i]
            + pk.qr.values[i] * b[i]
            + pk.qm.values[i] * a[i] * b[i]
            + pk.qo.values[i] * c[i]
            + pk.qc.values[i]
            + pi[i]
        ) % Q
        assert lhs == 0, f"gate identity fails at row {i}"


def test_cosets_disjoint():
    """{w^i}, {k1 w^i}, {k2 w^i} pairwise disjoint (prover.rs:901-918)."""
    roots = fr.roots_of_unity(N)
    s0 = set(roots)
    s1 = {r * K1 % Q for r in roots}
    s2 = {r * K2 % Q for r in roots}
    assert not (s0 & s1) and not (s0 & s2) and not (s1 & s2)


def test_round_2_grand_product_recurrence(prover):
    """z_{i+1} = z_i * f_i / g_i rowwise and the cycle closes
    (prover.rs:286-319)."""
    roots = fr.roots_of_unity(N)
    a, b, c = prover.a_values, prover.b_values, prover.c_values
    pk = prover.pk
    beta, gamma = prover.ch.beta, prover.ch.gamma
    z = prover.z.values

    def rlc(x, y):
        return (x + beta * y + gamma) % Q

    assert z[0] == 1
    cur = 1
    for i in range(N):
        f = rlc(a[i], roots[i]) * rlc(b[i], roots[i] * K1 % Q) % Q * rlc(
            c[i], roots[i] * K2 % Q
        ) % Q
        g = rlc(a[i], pk.s1.values[i]) * rlc(b[i], pk.s2.values[i]) % Q * rlc(
            c[i], pk.s3.values[i]
        ) % Q
        cur = cur * f % Q * pow(g, Q - 2, Q) % Q
        if i < N - 1:
            assert z[i + 1] == cur, f"z recurrence fails at row {i}"
    assert cur == 1, "grand product cycle must close (prover.rs:319)"


def test_round_4_openings_match_polys(prover):
    """The six openings equal the stored coefficient polys at zeta
    (prover.rs:502-541)."""
    zeta = prover.ch.zeta
    a_bar, b_bar, c_bar, s1_bar, s2_bar, z_omega_bar = prover.evals
    assert a_bar == prover.a_coeff.eval(zeta)
    assert b_bar == prover.b_coeff.eval(zeta)
    assert c_bar == prover.c_coeff.eval(zeta)
    assert s1_bar == prover.s1_coeff.eval(zeta)
    assert s2_bar == prover.s2_coeff.eval(zeta)
    assert z_omega_bar == prover.z_omega_coeff.eval(zeta)


def test_round_3_quotient_degree(prover):
    """t pieces have the expected lengths (degree bookkeeping,
    SURVEY.md §7.3 item 6: cross-blinding adds an x^n term to t_lo/t_mid,
    prover.rs:470-481; t_hi reaches degree n+5)."""
    assert len(prover.t_lo_coeff) == N + 1
    assert len(prover.t_mid_coeff) == N + 1
    assert len(prover.t_hi_coeff) <= N + 6
