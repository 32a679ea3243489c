"""A/B the segmented fixed-base MSM (BPT_MSM_SEGMENTS) on the attached chip.

Times, at n = 2^BPT_BENCH_MSM_LOG2 (default 14), the steady-state MSM for
S in {1, 3, 5}: one double + S gathers/mixed-adds per Horner iteration
over 255/S iterations (ops/msm_fixed.py). Table build time is reported
separately (one-time per SRS).

Usage: python scripts/bench_msm_segments.py
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from baby_plonk_tpu.utils import jaxcache

jaxcache.enable()

import jax.numpy as jnp
import numpy as np

from baby_plonk_tpu.curves.g1 import G1
from baby_plonk_tpu.fields import fr
from baby_plonk_tpu.ops import msm_fixed
from baby_plonk_tpu.ops import msm as msm_ops
from baby_plonk_tpu.ops.g1_vec import FQ_SPEC


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def sync(tree):
    import jax

    leaf = jax.tree_util.tree_leaves(tree)[0]
    np.asarray(leaf[..., :1] if leaf.ndim else leaf)


def main():
    import random

    rng = random.Random(20260819)
    n = 1 << int(os.environ.get("BPT_BENCH_MSM_LOG2", "14"))
    gx, gy = G1.generator().to_affine()
    px = jnp.tile(jnp.asarray(FQ_SPEC.pack_mont([gx])), (1, n))
    py = jnp.tile(jnp.asarray(FQ_SPEC.pack_mont([gy])), (1, n))
    pz = jnp.tile(jnp.asarray(FQ_SPEC.pack_mont([1])), (1, n))
    sc_ints = [rng.randrange(fr.Q) for _ in range(n)]
    sc = jnp.asarray(msm_ops.FR_SPEC.pack_raw(sc_ints))

    # calibrate dispatch round-trip latency (warm the kernel first — a
    # single cold sample includes the jit compile and overstates the
    # latency ~50x, zeroing every subtraction downstream)
    sync(px + 0)
    lat = 1e30
    for _ in range(5):
        t0 = time.time()
        sync(px + 0)
        lat = min(lat, time.time() - t0)
    log(f"sync latency: {lat*1e3:.1f} ms")

    results = {}
    svals = tuple(
        int(s) for s in os.environ.get("BPT_BENCH_SEGMENTS", "1,3,5").split(",")
    )
    for S in svals:
        tabs = msm_fixed.FixedBaseTables((px, py, pz), segments=S)
        t0 = time.time()
        nchunks = (n + tabs.chunk - 1) // tabs.chunk
        for ci in range(nchunks):
            sync(tabs._chunk_tables(ci))
        log(f"S={S}: table build {time.time()-t0:.2f}s ({nchunks} chunks)")
        t0 = time.time()
        sync(tabs.msm(sc))
        log(f"S={S}: msm compile+run {time.time()-t0:.2f}s")
        dt = 1e30
        for _ in range(int(os.environ.get("BPT_BENCH_ITERS", "3"))):
            t0 = time.time()
            sync(tabs.msm(sc))
            dt = min(dt, max(time.time() - t0 - lat, 1e-9))
        results[S] = dt
        log(f"S={S}: MSM n=2^{n.bit_length()-1}: {dt*1e3:.1f} ms -> {n/dt:.3e} points/s")

    base = results[1]
    for S, dt in results.items():
        log(f"S={S}: {dt*1e3:8.1f} ms   speedup vs S=1: {base/dt:.2f}x")


if __name__ == "__main__":
    main()
