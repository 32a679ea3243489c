"""dMSM scaling datapoint: 1 vs D virtual CPU devices + the analytic ICI model.

Real multi-chip hardware is unavailable (BASELINE.md); this bounds the
*collective overhead* of the sharded fixed-base commit path
(parallel/dmsm.py::msm_fixed_sharded) empirically on the virtual CPU mesh
and writes the numbers the analytic scaling model needs:

  * per-commit collective traffic: one all_gather of the 3 x 24-word
    projective partial per device = 288 B/device/commit — vs the >= 10 MB
    of local table reads per commit, a 1e5:1 compute:comm byte ratio;
  * measured wall-clock for the SAME total-size MSM on a 1-device and a
    D-device mesh (subprocesses: device count is fixed per process).
    On 4 physical cores the D=8 run oversubscribes ~2x, so the measured
    ratio is a LOWER bound on real-hardware scaling.

Usage: python scripts/bench_dmsm_scaling.py [log2_n=13] [D=8]
Prints one JSON line with both timings and the model.
"""
from __future__ import annotations

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_CHILD = """
import os, time, sys
import jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", {d})
sys.path.insert(0, {repo!r})
from baby_plonk_tpu.utils import jaxcache
jaxcache.enable()
import jax.numpy as jnp
import numpy as np
from baby_plonk_tpu.curves.g1 import G1
from baby_plonk_tpu.fields import fr
from baby_plonk_tpu.ops import msm_fixed
from baby_plonk_tpu.ops import msm as msm_ops
from baby_plonk_tpu.ops.g1_vec import FQ_SPEC
from baby_plonk_tpu.parallel import dmsm
from baby_plonk_tpu.parallel.mesh import make_mesh

n = {n}
mesh = make_mesh({d})
import random
rng = random.Random(42)
gx, gy = G1.generator().to_affine()
px = jnp.tile(jnp.asarray(FQ_SPEC.pack_mont([gx])), (1, n))
py = jnp.tile(jnp.asarray(FQ_SPEC.pack_mont([gy])), (1, n))
pz = jnp.tile(jnp.asarray(FQ_SPEC.pack_mont([1])), (1, n))
from jax.sharding import NamedSharding, PartitionSpec as P
from baby_plonk_tpu.parallel.mesh import AXIS
place = lambda x: jax.device_put(x, NamedSharding(mesh, P(*([None]*(x.ndim-1)+[AXIS]))))
px, py, pz = place(px), place(py), place(pz)
sc = place(jnp.asarray(msm_ops.FR_SPEC.pack_raw([rng.randrange(fr.Q) for _ in range(n)])))
t0 = time.time()
tx, ty = dmsm.build_tables_sharded(px, py, pz, mesh)
jax.block_until_ready((tx, ty))
build = time.time() - t0
t0 = time.time()
out = dmsm.msm_fixed_sharded(tx, ty, sc, mesh)
jax.block_until_ready(out)
cold = time.time() - t0
best = 1e30
for _ in range(3):
    t0 = time.time()
    out = dmsm.msm_fixed_sharded(tx, ty, sc, mesh)
    jax.block_until_ready(out)
    best = min(best, time.time() - t0)
print("RESULT", build, cold, best)
"""


def run(d: int, n: int) -> dict:
    env = dict(os.environ, JAX_PLATFORMS="cpu")
    env["XLA_FLAGS"] = (
        env.get("XLA_FLAGS", "") + f" --xla_force_host_platform_device_count={d}"
    ).strip()
    r = subprocess.run(
        [sys.executable, "-c", _CHILD.format(d=d, n=n, repo=REPO)],
        env=env,
        capture_output=True,
        text=True,
        timeout=3600,
        cwd=REPO,
    )
    assert r.returncode == 0, r.stderr[-3000:]
    line = [l for l in r.stdout.splitlines() if l.startswith("RESULT")][0]
    build, cold, best = (float(x) for x in line.split()[1:])
    return {"build_s": round(build, 3), "cold_s": round(cold, 3), "best_s": round(best, 4)}


def main():
    logn = int(sys.argv[1]) if len(sys.argv) > 1 else 13
    D = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    n = 1 << logn
    r1 = run(1, n)
    rD = run(D, n)
    ratio = r1["best_s"] / rD["best_s"] if rD["best_s"] else None
    out = {
        "metric": f"dmsm_scaling_2e{logn}",
        "d1": r1,
        "dD": rD,
        "D": D,
        "speedup_measured": round(ratio, 2),
        "physical_cores": os.cpu_count(),
        "collective_bytes_per_commit_per_device": 3 * 24 * 4,
        "note": (
            "virtual CPU mesh; D devices share the physical cores, so the "
            "measured speedup lower-bounds real-hardware scaling. Analytic "
            "ICI model: 288 B/device all_gather per commit (~us at ICI "
            "rates) vs O(n/D) local Horner compute -> near-ideal expected."
        ),
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
