"""CLI — parity with the reference's `cargo verify` alias (.cargo/config:1-3).

  python -m baby_plonk_tpu demo          # reference e2e circuit, prove+verify
  python -m baby_plonk_tpu demo --tpu    # same through the TPU engine
  python -m baby_plonk_tpu bench         # delegates to bench.py
"""
from __future__ import annotations

import argparse
import sys
import time


def _demo(use_tpu: bool) -> int:
    from .fields import fr
    from .protocol.program import Program
    from .protocol.prover import Prover
    from .protocol.setup import Setup
    from .protocol.verifier import Verifier
    from .utils.metrics import get_metrics

    engine = None
    if use_tpu:
        from .ops.tpu_engine import TpuEngine

        engine = TpuEngine()

    # the reference's own end-to-end circuit (tests/verify_proof_test.rs:13-50)
    n = 8
    setup = Setup.generate_srs(n + 6, tau=101, cache=False)
    program = Program.from_strs(["e public", "c <== a * b + b", "e <== c * d"], n)
    witness = {"a": 3, "b": 4, "c": 16, "d": 5, "e": 80}

    t0 = time.time()
    proof = Prover(setup, program, engine=engine).prove(witness)
    prove_dt = time.time() - t0
    t0 = time.time()
    ok = Verifier(setup, program, proof, engine=engine).verify([80])
    verify_dt = time.time() - t0

    eng = "tpu" if use_tpu else "host"
    print(f"engine={eng} prove={prove_dt*1e3:.1f}ms verify={verify_dt*1e3:.1f}ms ok={ok}")
    print(f"proof: {len(proof.to_bytes())} bytes")
    print(f"metrics: {get_metrics().report()}")
    return 0 if ok else 1


def _warmup(logn: int, tau: int) -> int:
    """AOT priming for a proving service: trace + compile EVERY shape a
    prove at n = 2^logn needs (SRS build, fixed-base tables, all five
    prover rounds, verifier preprocessing) through the persistent caches
    (utils/jaxcache XLA executable cache + utils/expcache trace cache +
    the SRS/table npz caches), so a fresh process's FIRST proof runs at
    warm rate instead of paying cold kernel compiles (PERFORMANCE.md:
    2^20 cold 1284.7 s vs warm 108.7 s). Run once per (machine, n);
    re-run after editing kernel code (the caches key on source digests)."""
    from .utils import jaxcache

    jaxcache.enable()
    import jax

    from . import circuits
    from .ops.tpu_engine import TpuEngine
    from .protocol.program import Program
    from .protocol.prover import Prover
    from .protocol.setup import Setup
    from .protocol.verifier import Verifier

    n = 1 << logn
    t_all = time.time()
    constraints, witness, public = circuits.mul_chain(n)
    program = Program.from_strs(constraints, n)
    setup = Setup.generate_srs_device(n + 6, tau=tau)
    jax.block_until_ready(setup._tpu_cache)
    engine = TpuEngine()
    prover = Prover(setup, program, engine=engine)
    t0 = time.time()
    proof = prover.prove(witness)
    prove_dt = time.time() - t0
    t0 = time.time()
    ok = Verifier(setup, program, proof, engine=engine).verify(public)
    verify_dt = time.time() - t0
    print(
        f"warmup n=2^{logn}: prove={prove_dt:.1f}s verify={verify_dt:.3f}s "
        f"ok={ok} total={time.time()-t_all:.1f}s — caches primed; the next "
        "fresh-process prove at this size starts warm"
    )
    return 0 if ok else 1


def main(argv=None) -> int:
    p = argparse.ArgumentParser(prog="baby_plonk_tpu")
    sub = p.add_subparsers(dest="cmd", required=True)
    demo = sub.add_parser("demo", help="prove+verify the reference e2e circuit")
    demo.add_argument("--tpu", action="store_true", help="use the TPU engine")
    sub.add_parser("bench", help="run the benchmark harness (bench.py)")
    warm = sub.add_parser(
        "warmup", help="AOT-prime every shape a prove at n needs (cold-start fix)"
    )
    warm.add_argument("--log2", type=int, default=20, help="log2 of the gate count")
    warm.add_argument("--tau", type=lambda s: int(s, 0), default=0xDEADBEEF)
    args = p.parse_args(argv)

    if args.cmd == "demo":
        return _demo(args.tpu)
    if args.cmd == "warmup":
        return _warmup(args.log2, args.tau)
    if args.cmd == "bench":
        import runpy
        import os

        runpy.run_path(
            os.path.join(os.path.dirname(os.path.dirname(__file__)), "bench.py"),
            run_name="__main__",
        )
        return 0
    return 2


if __name__ == "__main__":
    sys.exit(main())
