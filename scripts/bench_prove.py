"""End-to-end prove wall-clock at scale (BASELINE.json north-star metric).

Builds a synthetic n-gate circuit (a chain of multiply-add constraints),
generates the SRS on device, proves with the TPU engine and verifies.
Reports per-phase timings to stderr and a JSON line to stdout.

Usage: python scripts/bench_prove.py [log2_gates=10]
"""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    logn = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    n = 1 << logn

    from baby_plonk_tpu.utils import jaxcache

    jaxcache.enable()

    from baby_plonk_tpu import circuits
    from baby_plonk_tpu.ops.tpu_engine import TpuEngine
    from baby_plonk_tpu.protocol.program import Program
    from baby_plonk_tpu.protocol.prover import Prover
    from baby_plonk_tpu.protocol.setup import Setup
    from baby_plonk_tpu.protocol.verifier import Verifier

    t0 = time.time()
    constraints, witness, public = circuits.mul_chain(n)
    program = Program.from_strs(constraints, n)
    log(f"circuit build ({n} gates): {time.time()-t0:.2f}s")

    t0 = time.time()
    setup = Setup.generate_srs_device(n + 6, tau=0xDEADBEEF)
    import jax

    jax.block_until_ready(setup._tpu_cache)
    log(f"SRS (device, {n+6} powers): {time.time()-t0:.2f}s")

    engine = TpuEngine()
    t0 = time.time()
    prover = Prover(setup, program, engine=engine)
    log(f"preprocess: {time.time()-t0:.2f}s")

    t0 = time.time()
    proof = prover.prove(witness)
    prove_dt = time.time() - t0
    log(f"prove: {prove_dt:.2f}s")
    from baby_plonk_tpu.utils.metrics import get_metrics

    log(f"rounds: {get_metrics().report()}")

    if "--twice" in sys.argv:
        # second prove in-process: all kernels compiled, SRS tables cached
        # -> the steady-state per-proof cost (what a proving service pays)
        get_metrics().reset()
        t0 = time.time()
        proof = prover.prove(witness)
        prove_dt = time.time() - t0
        log(f"prove (warm, in-process): {prove_dt:.2f}s")
        log(f"rounds: {get_metrics().report()}")

    t0 = time.time()
    ver = Verifier(setup, program, proof, engine=engine)
    log(f"verifier preprocess (8 commits, 1 round trip): {time.time()-t0:.2f}s")
    t0 = time.time()
    ok = ver.verify(public)
    log(f"verify: {time.time()-t0:.3f}s ok={ok}")
    assert ok
    t0 = time.time()
    ok = Verifier(setup, program, proof, engine=engine).verify(public)
    log(f"verify (vpi cached, steady state): {time.time()-t0:.3f}s ok={ok}")
    assert ok

    print(
        json.dumps(
            {
                "metric": f"prove_wall_s_2e{logn}",
                "value": round(prove_dt, 3),
                "unit": "s",
                "vs_baseline": None,
            }
        )
    )


if __name__ == "__main__":
    main()
