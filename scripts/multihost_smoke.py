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
    os.environ["JAX_PLATFORMS"] = "cpu"
    os.environ["XLA_FLAGS"] = (
        os.environ.get("XLA_FLAGS", "")
        + " --xla_force_host_platform_device_count=4"
    ).strip()
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


def main() -> int:
    import socket

    with socket.socket() as s:
        s.bind(("localhost", 0))
        port = s.getsockname()[1]
    env = dict(os.environ, PYTHONPATH=REPO)
    procs = [
        subprocess.Popen(
            [sys.executable, os.path.abspath(__file__), str(pid), str(port)],
            env=env,
        )
        for pid in range(2)
    ]
    rc = 0
    for p in procs:
        try:
            rc |= p.wait(timeout=600)
        except subprocess.TimeoutExpired:
            p.kill()
            rc |= 1
    print("multihost smoke:", "OK" if rc == 0 else "FAILED")
    return rc


if __name__ == "__main__":
    if len(sys.argv) >= 3:
        worker(int(sys.argv[1]), int(sys.argv[2]))
    else:
        sys.exit(main())
