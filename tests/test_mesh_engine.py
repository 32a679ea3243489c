"""MeshEngine: the full 5-round prover over an 8-device mesh, byte-exact.

Runs on the virtual CPU mesh (tests/conftest.py forces 8 CPU devices);
the collectives exercised (all_to_all NTT stage exchange, all_gather MSM
partials, cross-shard scans) are the same graph that rides ICI on real
hardware.

The two full-prove tests run in SUBPROCESSES. Root cause of the crashes
that motivated this: each large 8-device SPMD executable JIT-compiles
into thousands of memory mappings, and a long-lived process exhausts
vm.max_map_count (default 65530) — LLVM then dies with mmap ENOMEM
(utils/envfix.py raises the limit; conftest.py applies it). Subprocess
isolation additionally caps per-process accumulation, so these tests
stay robust even where the limit cannot be raised.
"""
import os
import random
import subprocess
import sys

import pytest

from baby_plonk_tpu.fields import fr
from baby_plonk_tpu.ops.engine import HostEngine
from baby_plonk_tpu.parallel.mesh import make_mesh
from baby_plonk_tpu.parallel.mesh_engine import MeshEngine
from baby_plonk_tpu.protocol.setup import Setup

rng = random.Random(777)

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_PROVE_SNIPPET = """
import jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)
from baby_plonk_tpu import circuits
from baby_plonk_tpu.ops.engine import HostEngine
from baby_plonk_tpu.parallel.mesh import make_mesh
from baby_plonk_tpu.parallel.mesh_engine import MeshEngine
from baby_plonk_tpu.protocol.program import Program
from baby_plonk_tpu.protocol.prover import Prover
from baby_plonk_tpu.protocol.setup import Setup
from baby_plonk_tpu.protocol.verifier import Verifier

n = {n}
constraints, witness, public = circuits.mul_chain(n)
setup = Setup.generate_srs(n + 6, tau={tau}, cache=False)
program = Program.from_strs(constraints, n)
blinding = list(range(1, 12))
p_host = Prover(setup, program, engine=HostEngine()).prove(witness, blinding=blinding)
p_mesh = Prover(
    setup, program, engine=MeshEngine(make_mesh(8))
).prove(witness, blinding=blinding)
assert p_host.to_bytes() == p_mesh.to_bytes(), "proof bytes differ"
assert Verifier(setup, program, p_mesh).verify(public)
print("MESH_PROVE_OK")
"""


def _run_mesh_prove(n: int, tau: int):
    env = dict(os.environ, JAX_PLATFORMS="cpu", PYTHONPATH=REPO)
    env.pop("BPT_ENGINE", None)
    r = subprocess.run(
        [sys.executable, "-c", _PROVE_SNIPPET.format(n=n, tau=tau)],
        env=env,
        capture_output=True,
        text=True,
        timeout=1800,
    )
    assert r.returncode == 0, f"rc={r.returncode}\n{r.stderr[-3000:]}"
    assert "MESH_PROVE_OK" in r.stdout


@pytest.fixture(scope="module")
def engine():
    return MeshEngine(make_mesh(8))


@pytest.mark.slow
def test_mesh_prove_byte_identical():
    """n=128: every heavy path shards (n/D=16, round-3 domain 512/D=64);
    proof bytes must equal the host oracle's under fixed blinding."""
    _run_mesh_prove(128, 4242)


@pytest.mark.slow
@pytest.mark.parametrize("fixed_base", [True, False])
def test_mesh_commit_matches_host_with_padding(engine, fixed_base):
    """Commit lengths that don't divide the mesh (n+5 etc.) go through the
    zero-scalar padding path and must agree with the host Pippenger —
    on both the sharded fixed-base-table path and the bit-serial one."""
    from baby_plonk_tpu import config as cfg
    from baby_plonk_tpu.protocol.poly import Basis, Poly

    old = cfg.get_config()
    new = cfg.Config()
    new.commit_fixed_base = fixed_base
    cfg.set_config(new)
    try:
        setup = Setup.generate_srs(128 + 6, tau=999, cache=False)
        host = HostEngine()
        for k in (128, 133, 17):
            coeffs = [rng.randrange(fr.Q) for _ in range(k)]
            want = host.commit(setup, Poly(list(coeffs), Basis.MONOMIAL))
            got = engine.commit(setup, engine.poly(coeffs, Basis.MONOMIAL))
            assert got == want, (fixed_base, k)
    finally:
        cfg.set_config(old)


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
def test_mesh_fallback_small_shapes():
    """n=8 sits below the four-step shardability bound for the NTTs (m < D)
    but the commit/grand-product paths still shard; the proof must be
    byte-identical either way."""
    _run_mesh_prove(8, 101)
