"""Per-op microbenchmarks — the counterpart of the reference's criterion
benches (lib/bls12_381/benches/groups.rs:9-170): pairing stages, G1/G2
group ops, (de)serialization, subgroup checks. Host-side ops (these are
the verifier-path primitives; MSM/NTT device benches live in bench.py).

Usage: python scripts/microbench.py [--json]
"""
from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import random

from baby_plonk_tpu.curves.g1 import G1
from baby_plonk_tpu.curves.g2 import G2
from baby_plonk_tpu.curves import pairing as pr
from baby_plonk_tpu.fields.fr import Q as R

rng = random.Random(99)


def bench(name, fn, n=None, results=None, min_time=0.25):
    # warm up + calibrate
    fn()
    reps = 1
    while True:
        t0 = time.perf_counter()
        for _ in range(reps):
            fn()
        dt = time.perf_counter() - t0
        if dt >= min_time or reps >= 1 << 16:
            break
        reps *= 4
    per = dt / reps
    unit = "us" if per < 1e-3 else "ms"
    val = per * (1e6 if unit == "us" else 1e3)
    print(f"{name:42s} {val:10.2f} {unit}/op")
    if results is not None:
        results[name] = per
    return per


def main():
    out = {}
    g1 = G1.generator() * rng.randrange(1, R)
    g1b = G1.generator() * rng.randrange(1, R)
    g2 = G2.generator() * rng.randrange(1, R)
    g2b = G2.generator() * rng.randrange(1, R)
    k = rng.randrange(1, R)

    # groups.rs:62-101 (G1), :103-142 (G2)
    bench("g1/is_on_curve", lambda: g1.is_on_curve(), results=out)
    bench("g1/eq", lambda: g1 == g1b, results=out)
    bench("g1/to_affine", lambda: g1.to_affine(), results=out)
    bench("g1/add", lambda: g1 + g1b, results=out)
    bench("g1/double", lambda: g1.double(), results=out)
    bench("g1/scalar_mul (wNAF)", lambda: g1 * k, results=out)
    bench("g1/to_compressed", lambda: g1.to_compressed(), results=out)
    c1 = g1.to_compressed()
    bench("g1/from_compressed (incl subgroup)", lambda: G1.from_compressed(c1), results=out)
    u1 = g1.to_uncompressed()
    bench("g1/from_uncompressed", lambda: G1.from_uncompressed(u1), results=out)
    bench("g1/is_torsion_free (endomorphism)", lambda: g1.is_torsion_free(), results=out)
    bench("g1/batch_normalize x64",
          lambda: G1.batch_normalize([g1] * 64), results=out)

    bench("g1/to_uncompressed", lambda: g1.to_uncompressed(), results=out)

    bench("g2/is_on_curve", lambda: g2.is_on_curve(), results=out)
    bench("g2/eq", lambda: g2 == g2b, results=out)
    bench("g2/to_affine", lambda: g2.to_affine(), results=out)
    bench("g2/add", lambda: g2 + g2b, results=out)
    bench("g2/double", lambda: g2.double(), results=out)
    bench("g2/scalar_mul", lambda: g2 * k, results=out)
    bench("g2/to_compressed", lambda: g2.to_compressed(), results=out)
    c2 = g2.to_compressed()
    bench("g2/from_compressed (incl subgroup)", lambda: G2.from_compressed(c2), results=out)
    u2 = g2.to_uncompressed()
    bench("g2/from_uncompressed", lambda: G2.from_uncompressed(u2), results=out)
    bench("g2/is_torsion_free (psi)", lambda: g2.is_torsion_free(), results=out)

    # groups.rs:9-60 (pairing stages)
    bench("pairing/g2_prepare (uncached)", lambda: pr.G2Prepared(g2), results=out)
    prep = pr.prepare(g2)
    bench("pairing/miller_loop (prepared)",
          lambda: pr.multi_miller_loop([(g1, prep)]), results=out)
    f = pr.multi_miller_loop([(g1, prep)])
    bench("pairing/final_exponentiation",
          lambda: pr.final_exponentiation(f), results=out)
    bench("pairing/full", lambda: pr.pairing(g1, g2), results=out)
    bench("pairing/2-pair verify shape",
          lambda: pr.final_exponentiation(
              pr.multi_miller_loop([(g1, prep), (g1b, prep)])
          ), results=out)

    # steady-state verify (deserialize + cached-init Verifier + verify):
    # the full wire-to-verdict path a proving service pays per proof
    from baby_plonk_tpu import circuits
    from baby_plonk_tpu.protocol.program import Program
    from baby_plonk_tpu.protocol.proof import Proof
    from baby_plonk_tpu.protocol.prover import Prover
    from baby_plonk_tpu.protocol.setup import Setup
    from baby_plonk_tpu.protocol.verifier import Verifier

    n = 256
    constraints, witness, public = circuits.mul_chain(n)
    setup = Setup.generate_srs(n + 6, tau=777, cache=False)
    program = Program.from_strs(constraints, n)
    wire = Prover(setup, program).prove(witness).to_bytes()
    Verifier(setup, program, Proof.from_bytes(wire)).verify(public)  # warm caches
    bench(
        "verify/steady-state wire-to-verdict (n=256)",
        lambda: Verifier(setup, program, Proof.from_bytes(wire)).verify(public),
        results=out,
    )

    # benches/hash_to_curve.rs:10-64 (encode/hash to G1/G2, XMD SHA-256)
    from baby_plonk_tpu.curves import hash_to_curve as h2c

    msg, dst = b"test message", b"test DST"
    bench("h2c/encode_to_g1 SSWU SHA-256", lambda: h2c.encode_to_g1(msg, dst), results=out)
    bench("h2c/hash_to_g1 SSWU SHA-256", lambda: h2c.hash_to_g1(msg, dst), results=out)
    bench("h2c/encode_to_g2 SSWU SHA-256", lambda: h2c.encode_to_g2(msg, dst), results=out)
    bench("h2c/hash_to_g2 SSWU SHA-256", lambda: h2c.hash_to_g2(msg, dst), results=out)

    if "--json" in sys.argv:
        print(json.dumps({k: v for k, v in out.items()}))


if __name__ == "__main__":
    main()
