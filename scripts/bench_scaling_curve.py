"""Scaling CURVE for the sharded commit (dMSM) and four-step dNTT.

VERDICT r4 next #7: one datapoint is not a curve. Runs D in {1, 2, 4, 8}
virtual CPU devices (subprocess per D — the device count is fixed per
process) x two sizes per workload, and prints one JSON object with every
section timing, so the 288 B/device/commit analytic ICI model has an
empirical curve against it.

Caveat (same as bench_dmsm_scaling.py): the D devices SHARE this box's
physical cores, so measured speedups lower-bound real-hardware scaling —
at D=8 on 4 cores the mesh is 2x oversubscribed.

Usage: python scripts/bench_scaling_curve.py [msm_log2s=12,14] [ntt_log2s=16,18]
"""
from __future__ import annotations

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_CHILD = """
import os, sys, time, json, random
import jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", {d})
sys.path.insert(0, {repo!r})
from baby_plonk_tpu.utils import jaxcache
jaxcache.enable()
import jax.numpy as jnp
import numpy as np
from jax.sharding import NamedSharding, PartitionSpec as P
from baby_plonk_tpu.curves.g1 import G1
from baby_plonk_tpu.fields import fr
from baby_plonk_tpu.ops import msm_fixed, msm as msm_ops, ntt as ntt_ops
from baby_plonk_tpu.ops.g1_vec import FQ_SPEC
from baby_plonk_tpu.ops.ntt import FR_SPEC
from baby_plonk_tpu.parallel import dmsm, dntt
from baby_plonk_tpu.parallel.mesh import make_mesh, AXIS

D = {d}
mesh = make_mesh(D)
rng = random.Random(42)
place = lambda x: jax.device_put(
    x, NamedSharding(mesh, P(*([None] * (x.ndim - 1) + [AXIS])))
)
out = {{"D": D, "msm": {{}}, "ntt": {{}}}}

for logn in {msm_logs}:
    n = 1 << logn
    gx, gy = G1.generator().to_affine()
    px = place(jnp.tile(jnp.asarray(FQ_SPEC.pack_mont([gx])), (1, n)))
    py = place(jnp.tile(jnp.asarray(FQ_SPEC.pack_mont([gy])), (1, n)))
    pz = place(jnp.tile(jnp.asarray(FQ_SPEC.pack_mont([1])), (1, n)))
    sc = place(jnp.asarray(
        msm_ops.FR_SPEC.pack_raw([rng.randrange(fr.Q) for _ in range(n)])
    ))
    t0 = time.time()
    tx, ty = dmsm.build_tables_sharded(px, py, pz, mesh)
    jax.block_until_ready((tx, ty))
    build = time.time() - t0
    t0 = time.time()
    r = dmsm.msm_fixed_sharded(tx, ty, sc, mesh)
    jax.block_until_ready(r)
    cold = time.time() - t0
    best = 1e30
    for _ in range(3):
        t0 = time.time()
        r = dmsm.msm_fixed_sharded(tx, ty, sc, mesh)
        jax.block_until_ready(r)
        best = min(best, time.time() - t0)
    out["msm"][str(logn)] = {{
        "build_s": round(build, 3), "cold_s": round(cold, 3),
        "best_s": round(best, 4),
    }}

for logn in {ntt_logs}:
    n = 1 << logn
    col = [rng.randrange(fr.Q) for _ in range(n)]
    a = place(jnp.asarray(FR_SPEC.pack_mont(col)))
    t0 = time.time()
    r = dntt.ntt_sharded(a, mesh)
    jax.block_until_ready(r)
    cold = time.time() - t0
    best = 1e30
    for _ in range(3):
        t0 = time.time()
        r = dntt.ntt_sharded(a, mesh)
        jax.block_until_ready(r)
        best = min(best, time.time() - t0)
    out["ntt"][str(logn)] = {{"cold_s": round(cold, 3), "best_s": round(best, 4)}}

print("RESULT " + json.dumps(out))
"""


def run(d: int, msm_logs, ntt_logs) -> dict:
    env = dict(os.environ, JAX_PLATFORMS="cpu")
    env["XLA_FLAGS"] = (
        env.get("XLA_FLAGS", "") + f" --xla_force_host_platform_device_count={d}"
    ).strip()
    r = subprocess.run(
        [
            sys.executable,
            "-c",
            _CHILD.format(d=d, repo=REPO, msm_logs=list(msm_logs), ntt_logs=list(ntt_logs)),
        ],
        env=env,
        capture_output=True,
        text=True,
        timeout=5400,
        cwd=REPO,
    )
    assert r.returncode == 0, r.stderr[-3000:]
    line = [l for l in r.stdout.splitlines() if l.startswith("RESULT")][0]
    return json.loads(line[len("RESULT ") :])


def main():
    msm_logs = [int(x) for x in (sys.argv[1] if len(sys.argv) > 1 else "12,14").split(",")]
    ntt_logs = [int(x) for x in (sys.argv[2] if len(sys.argv) > 2 else "16,18").split(",")]
    rows = []
    for d in (1, 2, 4, 8):
        rows.append(run(d, msm_logs, ntt_logs))
        print(f"D={d}: {json.dumps(rows[-1])}", file=sys.stderr, flush=True)
    base = rows[0]
    curve = {
        "metric": "scaling_curve",
        "physical_cores": os.cpu_count(),
        "collective_bytes_per_commit_per_device": 3 * 24 * 4,
        "rows": rows,
        "speedup_vs_d1": {
            "msm": {
                k: {str(r["D"]): round(base["msm"][k]["best_s"] / r["msm"][k]["best_s"], 2)
                    for r in rows}
                for k in base["msm"]
            },
            "ntt": {
                k: {str(r["D"]): round(base["ntt"][k]["best_s"] / r["ntt"][k]["best_s"], 2)
                    for r in rows}
                for k in base["ntt"]
            },
        },
    }
    print(json.dumps(curve))


if __name__ == "__main__":
    main()
