"""MeshEngine: the full 5-round prover over an 8-device mesh, byte-exact.

Runs on the virtual CPU mesh (tests/conftest.py forces 8 CPU devices);
the collectives exercised (all_to_all NTT stage exchange, all_gather MSM
partials, cross-shard scans) are the same graph that rides ICI on real
hardware."""
import random

import pytest

from baby_plonk_tpu import circuits
from baby_plonk_tpu.fields import fr
from baby_plonk_tpu.ops.engine import HostEngine
from baby_plonk_tpu.parallel.mesh import make_mesh
from baby_plonk_tpu.parallel.mesh_engine import MeshEngine
from baby_plonk_tpu.protocol.program import Program
from baby_plonk_tpu.protocol.prover import Prover
from baby_plonk_tpu.protocol.setup import Setup
from baby_plonk_tpu.protocol.verifier import Verifier

rng = random.Random(777)


@pytest.fixture(scope="module")
def engine():
    return MeshEngine(make_mesh(8))


@pytest.mark.slow
def test_mesh_prove_byte_identical(engine):
    """n=128: every heavy path shards (n/D=16, round-3 domain 512/D=64);
    proof bytes must equal the host oracle's under fixed blinding."""
    n = 128
    constraints, witness, public = circuits.mul_chain(n)
    setup = Setup.generate_srs(n + 6, tau=4242, cache=False)
    program = Program.from_strs(constraints, n)
    blinding = list(range(1, 12))

    p_host = Prover(setup, program, engine=HostEngine()).prove(
        witness, blinding=blinding
    )
    p_mesh = Prover(setup, program, engine=engine).prove(witness, blinding=blinding)
    assert p_host.to_bytes() == p_mesh.to_bytes()
    assert Verifier(setup, program, p_mesh).verify(public)


@pytest.mark.slow
def test_mesh_commit_matches_host_with_padding(engine):
    """Commit lengths that don't divide the mesh (n+5 etc.) go through the
    zero-scalar padding path and must agree with the host Pippenger."""
    from baby_plonk_tpu.protocol.poly import Basis, Poly

    setup = Setup.generate_srs(128 + 6, tau=999, cache=False)
    host = HostEngine()
    for k in (128, 133, 17):
        coeffs = [rng.randrange(fr.Q) for _ in range(k)]
        want = host.commit(setup, Poly(list(coeffs), Basis.MONOMIAL))
        got = engine.commit(setup, engine.poly(coeffs, Basis.MONOMIAL))
        assert got == want, k


@pytest.mark.slow
def test_mesh_intt_poly_natural_order(engine):
    """Distributed four-step iNTT (cyclic layout) must hand back
    natural-order coefficients through the DPoly boundary."""
    from baby_plonk_tpu.protocol import poly as hostpoly
    from baby_plonk_tpu.protocol.poly import Basis

    n = 128
    vals = [rng.randrange(fr.Q) for _ in range(n)]
    want = hostpoly.i_ntt(vals)
    got = engine.intt_poly(engine.poly(vals, Basis.LAGRANGE))
    assert got.values == want
    # and the batched variant
    (got2,) = engine.intt_polys([engine.poly(vals, Basis.LAGRANGE)])
    assert got2.values == want


@pytest.mark.slow
def test_mesh_fallback_small_shapes(engine):
    """Shapes below the shardability bound fall back to single-device
    kernels; the proof must still be byte-identical."""
    n = 8
    setup = Setup.generate_srs(n + 6, tau=101, cache=False)
    program = Program.from_strs(["e public", "c <== a * b + b", "e <== c * d"], n)
    witness = {"a": 3, "b": 4, "c": 16, "d": 5, "e": 80}
    blinding = list(range(1, 12))
    p_host = Prover(setup, program, engine=HostEngine()).prove(
        witness, blinding=blinding
    )
    p_mesh = Prover(setup, program, engine=engine).prove(witness, blinding=blinding)
    assert p_host.to_bytes() == p_mesh.to_bytes()
