"""TPU engine vs host engine: op-level agreement and byte-identical proofs."""
import random

import pytest

from baby_plonk_tpu.fields import fr
from baby_plonk_tpu.ops.engine import HostEngine
from baby_plonk_tpu.ops.tpu_engine import TpuEngine
from baby_plonk_tpu.protocol.program import Program
from baby_plonk_tpu.protocol.prover import Prover
from baby_plonk_tpu.protocol.setup import Setup
from baby_plonk_tpu.protocol.verifier import Verifier

rng = random.Random(31337)


@pytest.mark.slow
def test_grand_product_matches_host():
    n = 16
    roots = fr.roots_of_unity(n)
    mk = lambda: [rng.randrange(fr.Q) for _ in range(n)]
    a, b, c, s1, s2, s3 = mk(), mk(), mk(), mk(), mk(), mk()
    beta, gamma = rng.randrange(fr.Q), rng.randrange(fr.Q)
    host = HostEngine().grand_product(a, b, c, s1, s2, s3, roots, beta, gamma, 2, 3)
    tpu = TpuEngine().grand_product(a, b, c, s1, s2, s3, roots, beta, gamma, 2, 3)
    assert host == tpu


@pytest.mark.slow
def test_proof_bytes_identical_across_engines():
    """Fixed blinding => byte-identical proofs host vs TPU engine
    (SURVEY.md §4 determinism note)."""
    n = 8
    setup = Setup.generate_srs(n + 6, tau=101, cache=False)
    program = Program.from_strs(
        ["e public", "c <== a * b + b", "e <== c * d"], n
    )
    witness = {"a": 3, "b": 4, "c": 16, "d": 5, "e": 80}
    blinding = list(range(1, 12))

    p_host = Prover(setup, program, engine=HostEngine()).prove(witness, blinding=blinding)
    p_tpu = Prover(setup, program, engine=TpuEngine()).prove(witness, blinding=blinding)
    assert p_host.to_bytes() == p_tpu.to_bytes()
    assert Verifier(setup, program, p_tpu).verify([80])


@pytest.mark.slow
def test_chunked_memory_paths_byte_identical(monkeypatch):
    """The position-chunked round-4 eval / round-5 combine and the
    uncached round-3 consts (the large-n OOM levers, BPT_EVAL_CHUNK /
    BPT_COMBINE_CHUNK / BPT_R3_CONSTS_BYTES) must be byte-identical to
    the single-shot kernels; tiny thresholds force every chunk boundary
    at test sizes."""
    monkeypatch.setenv("BPT_EVAL_CHUNK", "8")
    monkeypatch.setenv("BPT_COMBINE_CHUNK", "8")
    monkeypatch.setenv("BPT_R3_CONSTS_BYTES", "0")
    n = 8
    setup = Setup.generate_srs(n + 6, tau=101, cache=False)
    program = Program.from_strs(
        ["e public", "c <== a * b + b", "e <== c * d"], n
    )
    witness = {"a": 3, "b": 4, "c": 16, "d": 5, "e": 80}
    blinding = list(range(1, 12))
    p_host = Prover(setup, program, engine=HostEngine()).prove(witness, blinding=blinding)
    p_tpu = Prover(setup, program, engine=TpuEngine()).prove(witness, blinding=blinding)
    assert p_host.to_bytes() == p_tpu.to_bytes()


@pytest.mark.slow
def test_round3_split_memory_path_byte_identical(monkeypatch):
    """The memory-capped round-3 path (grouped forward NTTs + separate
    combine/iNTT kernels) must produce the same proof as the fused kernel."""
    monkeypatch.setenv("BPT_ROUND3_BATCH_BYTES", "4096")  # force the split
    from baby_plonk_tpu.protocol.program import Program
    from baby_plonk_tpu.protocol.prover import Prover
    from baby_plonk_tpu.protocol.setup import Setup

    n = 8
    setup = Setup.generate_srs(n + 6, tau=101, cache=False)
    program = Program.from_strs(["e public", "c <== a * b + b", "e <== c * d"], n)
    w = {"a": 3, "b": 4, "c": 16, "d": 5, "e": 80}
    bl = list(range(1, 12))
    got = Prover(setup, program, engine=TpuEngine()).prove(w, blinding=bl)
    want = Prover(setup, program, engine=HostEngine()).prove(w, blinding=bl)
    assert got.to_bytes() == want.to_bytes()
