"""Freeze a golden proof fixture (challenges + proof bytes) to JSON.

Usage: python scripts/freeze_fixture.py mul_chain > tests/fixtures/golden_proof_mul_chain.json

The mul_chain fixture pins a 24-gate squaring/multiply chain at group
order 32 whose intermediate variables each appear in SEVERAL gates —
a nontrivial sigma-permutation cycle structure (program.rs:76-147) that
the 3-gate reference circuit barely exercises. Fixed blinding + tau make
the proof deterministic; the frozen bytes catch silent drift anywhere in
the field/NTT/MSM/serialization/transcript pipeline.
"""
from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

Q = 0x73EDA753299D7D483339D80809A1D80553BDA402FFFE5BFEFFFFFFFF00000001


def mul_chain_spec():
    """24 gates: out public; x1 <== x0*x0; x_{i+1} <== x_i * x_{i-1} + x_{i-2}...

    Every x_i is used as an input by the two following gates AND produced
    by one gate -> 3+ cell permutation cycles across all three wire columns.
    """
    constraints = ["out public"]
    wit = {"x0": 3}
    xs = ["x0"]
    v = {"x0": 3}
    # x1 = x0*x0
    constraints.append("x1 <== x0 * x0")
    v["x1"] = v["x0"] * v["x0"] % Q
    xs.append("x1")
    for i in range(2, 22):
        a, b = xs[-1], xs[-2]
        name = f"x{i}"
        # alternate shapes to vary gate coefficient patterns
        if i % 3 == 0:
            constraints.append(f"{name} <== {a} * {b} + {b}")
            v[name] = (v[a] * v[b] + v[b]) % Q
        elif i % 3 == 1:
            constraints.append(f"{name} <== {a} * {b} - {b}")
            v[name] = (v[a] * v[b] - v[b]) % Q
        else:
            constraints.append(f"{name} <== {a} * {b}")
            v[name] = v[a] * v[b] % Q
        xs.append(name)
    constraints.append(f"out <== {xs[-1]} * x0")
    v["out"] = v[xs[-1]] * v["x0"] % Q
    wit = {k: int(val) for k, val in v.items()}
    return {
        "circuit": constraints,
        "group_order": 32,
        "tau": 4242,
        "blinding": list(range(101, 112)),
        "witness": wit,
        "public": [wit["out"]],
    }


def main():
    kind = sys.argv[1] if len(sys.argv) > 1 else "mul_chain"
    spec = {"mul_chain": mul_chain_spec}[kind]()

    from baby_plonk_tpu.protocol.program import Program
    from baby_plonk_tpu.protocol.prover import Prover
    from baby_plonk_tpu.protocol.setup import Setup
    from baby_plonk_tpu.protocol.verifier import Verifier

    setup = Setup.generate_srs(spec["group_order"] + 6, tau=spec["tau"], cache=False)
    program = Program.from_strs(spec["circuit"], spec["group_order"])
    prover = Prover(setup, program)
    proof = prover.prove(spec["witness"], blinding=spec["blinding"])
    assert Verifier(setup, program, proof).verify(spec["public"]), "fixture must verify"
    spec["challenges"] = {
        name: hex(getattr(prover.ch, name))
        for name in ("beta", "gamma", "alpha", "zeta", "nu", "mu")
    }
    spec["proof_hex"] = proof.to_bytes().hex()
    json.dump(spec, sys.stdout, indent=1)
    print()


if __name__ == "__main__":
    main()
