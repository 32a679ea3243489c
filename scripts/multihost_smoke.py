"""Two-process jax.distributed smoke test (DCN-style mesh).

Proves the claim in parallel/mesh.py that the sharded prover pipeline is
topology-agnostic: the SAME ``prove_step_sharded`` jit that runs on a
single-process ICI mesh runs over a ``jax.distributed`` multi-process
mesh (2 processes x 4 virtual CPU devices = 8 global devices), where the
collectives (all_to_all NTT stage exchange, all_gather MSM combine)
cross the process boundary.

Parent mode (no args): spawns the two workers and checks both succeed.
Worker mode: ``python scripts/multihost_smoke.py <pid> <port>``.
"""
from __future__ import annotations

import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def worker(pid: int, port: int) -> None:
    import faulthandler

    faulthandler.enable()
    os.environ["JAX_PLATFORMS"] = "cpu"
    os.environ["XLA_FLAGS"] = (
        os.environ.get("XLA_FLAGS", "")
        + " --xla_force_host_platform_device_count=4"
    ).strip()
    sys.path.insert(0, REPO)
    # SEGREGATED compile-cache dir for the 2-process topology: replaying a
    # single-process-compiled executable in a multi-controller run skips
    # the Gloo collective bootstrap ("Gloo context initialization failed:
    # Connect timeout" on the first cross-process collective) — the
    # shared xla-cpu dir must never mix the two worlds.
    os.environ.setdefault(
        "BPT_JAX_CACHE",
        os.path.join(
            os.path.expanduser("~"), ".cache", "baby_plonk_tpu", "xla-cpu-mp2"
        ),
    )
    from baby_plonk_tpu.utils import jaxcache

    jaxcache.enable()  # warm reruns: the 2-process full prove is compile-bound
    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.distributed.initialize(
        coordinator_address=f"localhost:{port}", num_processes=2, process_id=pid
    )
    assert jax.process_count() == 2, jax.process_count()
    assert len(jax.devices()) == 8, len(jax.devices())  # global devices

    import random

    import numpy as np

    sys.path.insert(0, REPO)
    from baby_plonk_tpu.curves.g1 import G1
    from baby_plonk_tpu.curves import msm_host
    from baby_plonk_tpu.fields import fr
    from baby_plonk_tpu.ops import g1_vec
    from baby_plonk_tpu.ops.ntt import FR_SPEC
    from baby_plonk_tpu.parallel import prove_step
    from baby_plonk_tpu.parallel.mesh import make_mesh
    from baby_plonk_tpu.protocol import poly as hostpoly

    rng = random.Random(808)  # identical data in both processes
    n, D = 64, 8
    cols_ints = [[rng.randrange(fr.Q) for _ in range(n)] for _ in range(3)]
    # numpy (host) inputs: jit distributes identical replicated host data
    # across the global mesh per the shard_map in_specs
    cols = np.stack([FR_SPEC.pack_mont(c) for c in cols_ints], axis=1)
    tau = 777
    srs = [G1.generator() * pow(tau, i, fr.Q) for i in range(n)]
    perm = prove_step.cyclic_perm(n, D)
    srs_cyclic = [srs[perm[i]] for i in range(n)]
    px, py, pz = (np.asarray(c) for c in g1_vec.points_to_device(srs_cyclic))

    mesh = make_mesh(D)
    outs = prove_step.prove_step_sharded(cols, px, py, pz, mesh)
    for i in range(3):
        got = g1_vec.point_from_device(tuple(np.asarray(c) for c in outs[i]))
        want = msm_host.msm(srs, hostpoly.i_ntt(cols_ints[i]))
        assert got == want, f"column {i} mismatch on process {pid}"
    print(f"process {pid}: prove_step_sharded over 2-process mesh OK", flush=True)

    if os.environ.get("BPT_SMOKE_FULL", "1") == "1":
        _full_prove(pid, mesh)


def _full_prove(pid: int, mesh) -> None:
    """Full 5-round MeshEngine prove + verify with the collectives crossing
    the 2-process boundary; byte-equality vs the single-process host oracle
    (same fixed blinding). Catches DCN-path regressions (e.g. in dscan's
    all_gather folding) that the single prove_step above cannot."""
    from baby_plonk_tpu import circuits
    from baby_plonk_tpu.ops.engine import HostEngine
    from baby_plonk_tpu.parallel.mesh_engine import MeshEngine
    from baby_plonk_tpu.protocol.program import Program
    from baby_plonk_tpu.protocol.prover import Prover
    from baby_plonk_tpu.protocol.setup import Setup
    from baby_plonk_tpu.protocol.verifier import Verifier

    n = 64
    constraints, witness, public = circuits.mul_chain(n)
    setup = Setup.generate_srs(n + 6, tau=777, cache=False)
    program = Program.from_strs(constraints, n)
    blinding = list(range(1, 12))
    p_host = Prover(setup, program, engine=HostEngine()).prove(
        witness, blinding=blinding
    )
    p_mesh = Prover(setup, program, engine=MeshEngine(mesh)).prove(
        witness, blinding=blinding
    )
    assert p_host.to_bytes() == p_mesh.to_bytes(), (
        f"process {pid}: mesh proof bytes diverge from host oracle"
    )
    assert Verifier(setup, program, p_mesh).verify(public)
    print(f"process {pid}: full 5-round MeshEngine prove over 2 processes OK",
          flush=True)


def main() -> int:
    # Retry wrapper: XLA:CPU's Gloo KV-store exchange has a hardcoded 30 s
    # window per communicator; on an oversubscribed box the two workers
    # can skew past it during cold compiles ("GetKeyValue() timed out").
    # Each attempt warms the (mp2-segregated) compile cache, shrinking the
    # skew, so a bounded retry converges where one cold shot races.
    tries = int(os.environ.get("BPT_SMOKE_RETRIES", "2"))
    rc = 1
    for attempt in range(tries):
        rc = _run_once()
        if rc == 0:
            break
        print(f"multihost smoke: attempt {attempt + 1} failed (rc={rc})", flush=True)
    print("multihost smoke:", "OK" if rc == 0 else "FAILED")
    return rc


def _run_once() -> int:
    import socket

    with socket.socket() as s:
        s.bind(("localhost", 0))
        port = s.getsockname()[1]
    env = dict(os.environ, PYTHONPATH=REPO)
    logs = [open(f"/tmp/multihost_worker{pid}.log", "w") for pid in range(2)]
    procs = [
        subprocess.Popen(
            [sys.executable, "-u", os.path.abspath(__file__), str(pid), str(port)],
            env=env,
            stdout=logs[pid],
            stderr=subprocess.STDOUT,
        )
        for pid in range(2)
    ]
    rc = 0
    for p in procs:
        try:
            # the FULL 5-round 2-process prove is XLA-CPU-compile-bound:
            # ~45 min cold, minutes warm (workers enable the persistent
            # compile cache). Every earlier "crash" of this script was in
            # fact this parent timeout killing worker 0 mid-compile.
            rc |= p.wait(timeout=int(os.environ.get("BPT_SMOKE_TIMEOUT", "3600")))
        except subprocess.TimeoutExpired:
            p.kill()
            rc |= 1
    for pid, f in enumerate(logs):
        f.close()
        with open(f.name) as fh:
            out = fh.read()
        sys.stdout.write(out[-4000:] if rc else out[-2000:])
    return rc


if __name__ == "__main__":
    if len(sys.argv) >= 3:
        worker(int(sys.argv[1]), int(sys.argv[2]))
    else:
        sys.exit(main())
