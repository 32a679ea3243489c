"""Assembly DSL + program preprocessing tests (src/assembly.rs, src/program.rs parity)."""
import pytest

from baby_plonk_tpu.fields import fr
from baby_plonk_tpu.protocol.assembly import (
    AssemblyEqn,
    eq_to_assembly,
    evaluate,
    get_product_key,
)
from baby_plonk_tpu.protocol.program import Program

Q = fr.Q


def test_evaluate_expression():
    # ['a', '+', 'b', '*', 'c', '*', '5'] -> {'a': 1, 'b*c': 5} (assembly.rs test)
    res = evaluate("a + b * c * 5".split())
    assert res == {"a": 1, "b*c": 5}
    res = evaluate("6000 - 700 - 80 + 9".split())
    assert res[None] == (6000 - 700 - 80 + 9) % Q
    res = evaluate("-6000 + 700 + 80 - 9".split())
    assert res[None] == (-6000 + 700 + 80 - 9) % Q
    res = evaluate("1 + 2 * 3".split())
    assert res[None] == 7
    res = evaluate("-1 + 2 * 3".split())
    assert res[None] == 5


def test_product_key_sorted():
    assert get_product_key("b", "a") == "a*b"
    assert get_product_key("a*b", "c") == "a*b*c"
    assert get_product_key("a", None) == "a"
    assert get_product_key(None, None) is None


def test_public_constraint():
    eqn = eq_to_assembly("e public")
    assert eqn.wires.L == "e" and eqn.wires.R is None and eqn.wires.O is None
    assert eqn.coeffs["e"] == Q - 1
    g = eqn.gate()
    # l = -(-1) = 1, o = $output_coeff = 0
    assert (g.L, g.R, g.M, g.O, g.C) == (1, 0, 0, 0, 0)


def test_mul_constraint_gate():
    eqn = eq_to_assembly("c <== a * b")
    assert (eqn.wires.L, eqn.wires.R, eqn.wires.O) == ("a", "b", "c")
    g = eqn.gate()
    # qm = -1 (coeff of a*b is 1, negated), qo = 1 (default)
    assert (g.L, g.R, g.M, g.O, g.C) == (0, 0, Q - 1, 1, 0)


def test_add_constraint_gate():
    g = eq_to_assembly("c <== a + b").gate()
    assert (g.L, g.R, g.M, g.O, g.C) == (Q - 1, Q - 1, 0, 1, 0)


def test_mixed_constraint_gate():
    # c <== a * b + b : qm = -1, qr = -1
    g = eq_to_assembly("c <== a * b + b").gate()
    assert (g.L, g.R, g.M, g.O, g.C) == (0, Q - 1, Q - 1, 1, 0)


def test_single_variable_duplicates_into_r():
    # 1-var equations duplicate the var into R (assembly.rs:190-195)
    eqn = eq_to_assembly("b <== a * a")
    assert eqn.wires.L == "a" and eqn.wires.R == "a"
    g = eqn.gate()
    # r() returns 0 because R == L (assembly.rs:38-45)
    assert g.R == 0
    assert g.M == Q - 1


def test_negated_output():
    eqn = eq_to_assembly("-c <== a * b")
    assert eqn.coeffs["$output_coeff"] == Q - 1
    assert eqn.gate().O == Q - 1


def test_constant_term():
    g = eq_to_assembly("c <== a * b + 42").gate()
    assert g.C == (-42) % Q


def test_three_variables_rejected():
    with pytest.raises(ValueError, match="Max 2 variables"):
        eq_to_assembly("d <== a + b + c")


def test_disallowed_multiplication():
    with pytest.raises(ValueError, match="Disallowed"):
        eq_to_assembly("c <== a * a * a")  # key a*a*a not allowed


def test_make_gate_polynomials():
    program = Program.from_strs(["e public", "c <== a * b + b", "e <== c * d"], 8)
    ql, qr, qm, qo, qc = program.make_gate_polynomials()
    assert ql.values[0] == 1  # public row
    assert qm.values[1] == Q - 1
    assert qr.values[1] == Q - 1
    assert qo.values[1] == 1
    assert qm.values[2] == Q - 1
    # padding rows all-zero
    assert all(v == 0 for v in ql.values[3:])


def test_make_s_polynomials_cycle():
    """Matches the reference unit test program.rs:206-239."""
    program = Program.from_strs(["c <== a * b", "b <== a * e"], 8)
    s1, s2, s3 = program.make_s_polynomials()
    roots = fr.roots_of_unity(8)
    unmoved_s1 = roots
    unmoved_s3 = [r * 3 % Q for r in roots]
    assert s1.values[0] == unmoved_s1[1]
    assert s2.values[0] == unmoved_s3[1]


def test_s_polynomials_are_permutation():
    """s1|s2|s3 must be a permutation of the identity labels
    {w^i, 2w^i, 3w^i} — the whole point of the copy-constraint encoding."""
    program = Program.from_strs(["e public", "c <== a * b + b", "e <== c * d"], 8)
    s1, s2, s3 = program.make_s_polynomials()
    roots = fr.roots_of_unity(8)
    identity = set()
    for k in (1, 2, 3):
        identity |= {r * k % Q for r in roots}
    perm = set(s1.values) | set(s2.values) | set(s3.values)
    assert perm == identity
    assert len(s1.values + s2.values + s3.values) == len(identity)


def test_get_public_assignment():
    program = Program.from_strs(["e public", "c <== a * b"], 8)
    assert program.get_public_assignment() == ["e"]
    bad = Program.from_strs(["c <== a * b", "e public"], 8)
    with pytest.raises(ValueError, match="at the top"):
        bad.get_public_assignment()
