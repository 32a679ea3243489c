"""A/B the four-step NTT's sub-transform implementation on the chip.

Times ntt_device at n = 2^BPT_BENCH_NTT_LOG2 (default 20) with
BPT_NTT_SUB=xla (stage loop; round-3 record 112.6 ms at 2^20) vs
BPT_NTT_SUB=pallas (fused VMEM-resident kernels; m = 1024 factors run
the recursive four-step, ops/pallas_kernels.py::ntt_sub_pallas_4step).
Each variant runs in a subprocess (the knob is read at import time);
outputs are cross-checked bit-exactly.

Usage: python scripts/bench_ntt_sub.py [log2_n=20]
"""
from __future__ import annotations

import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_CHILD = """
import os, sys, time
sys.path.insert(0, {repo!r})
from baby_plonk_tpu.utils import jaxcache
jaxcache.enable()
import jax, jax.numpy as jnp
import numpy as np
from baby_plonk_tpu.ops import ntt as ntt_ops
from baby_plonk_tpu.ops.ntt import FR_SPEC

n = {n}
rng = np.random.default_rng(99)
a = jnp.asarray(FR_SPEC.pack_mont([int(x) for x in rng.integers(0, 2**63, size=n)]))

def sync(x):
    np.asarray(x[:1, :1])

sync(a + 0)
lat = 1e30
for _ in range(5):
    t0 = time.time(); sync(a + 0); lat = min(lat, time.time() - t0)
t0 = time.time()
out = ntt_ops.ntt_device(a)
sync(out)
print("compile+run: %.2fs" % (time.time() - t0), file=sys.stderr, flush=True)
best = 1e30
for _ in range(4):
    t0 = time.time()
    out = ntt_ops.ntt_device(a)
    sync(out)
    best = min(best, max(time.time() - t0 - lat, 1e-9))
print("BEST %.6f" % best)
np.save({out!r}, np.asarray(jax.device_get(out)))
"""


def run(sub: str, n: int, outfile: str) -> float:
    env = dict(os.environ, BPT_NTT_SUB=sub)
    r = subprocess.run(
        [sys.executable, "-c", _CHILD.format(repo=REPO, n=n, out=outfile)],
        env=env,
        capture_output=True,
        text=True,
        timeout=3600,
        cwd=REPO,
    )
    sys.stderr.write(r.stderr[-2000:])
    if r.returncode != 0:
        print(f"{sub}: FAILED rc={r.returncode}", file=sys.stderr)
        return float("nan")
    return float([l for l in r.stdout.splitlines() if l.startswith("BEST")][0].split()[1])


def main():
    import numpy as np

    logn = int(sys.argv[1]) if len(sys.argv) > 1 else 20
    n = 1 << logn
    t_xla = run("xla", n, "/tmp/ntt_sub_xla.npy")
    t_pal = run("pallas", n, "/tmp/ntt_sub_pallas.npy")
    print(f"xla:    {t_xla*1e3:8.1f} ms  ({n/t_xla:.3e} coeffs/s)")
    if t_pal == t_pal:  # not NaN
        print(f"pallas: {t_pal*1e3:8.1f} ms  ({n/t_pal:.3e} coeffs/s)")
        a = np.load("/tmp/ntt_sub_xla.npy")
        b = np.load("/tmp/ntt_sub_pallas.npy")
        assert np.array_equal(a, b), "pallas output != xla output"
        print("outputs bit-identical")


if __name__ == "__main__":
    main()
