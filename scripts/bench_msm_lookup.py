"""A/B the fixed-base MSM table-lookup strategies on the attached chip.

Round 3's segment A/B proved the Horner loop is gather-bound
(PERFORMANCE.md): this script times, at n = 2^BPT_BENCH_MSM_LOG2
(default 14), the steady-state MSM for BPT_MSM_LOOKUP in
{gather2, gather1, onehot} (ops/msm_fixed.py docstring for semantics).
Tables build once (shared disk/in-memory base layout); each strategy
pays only its one-time relayout. Correctness is cross-checked: all
strategies must produce identical limb outputs.

Usage: python scripts/bench_msm_lookup.py [lookups=gather2,gather1,onehot]
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

    rng = random.Random(20260820)
    n = 1 << int(os.environ.get("BPT_BENCH_MSM_LOG2", "14"))
    gx, gy = G1.generator().to_affine()
    px = jnp.tile(jnp.asarray(FQ_SPEC.pack_mont([gx])), (1, n))
    py = jnp.tile(jnp.asarray(FQ_SPEC.pack_mont([gy])), (1, n))
    pz = jnp.tile(jnp.asarray(FQ_SPEC.pack_mont([1])), (1, n))
    sc_ints = [rng.randrange(fr.Q) for _ in range(n)]
    sc = jnp.asarray(msm_ops.FR_SPEC.pack_raw(sc_ints))

    sync(px + 0)
    lat = 1e30
    for _ in range(5):
        t0 = time.time()
        sync(px + 0)
        lat = min(lat, time.time() - t0)
    log(f"sync latency: {lat*1e3:.1f} ms")

    lookups = (
        sys.argv[1] if len(sys.argv) > 1 else "gather2,gather1,onehot"
    ).split(",")

    # one shared base-table build (all strategies share the v1 layout)
    base_tabs = msm_fixed.FixedBaseTables((px, py, pz), lookup="gather2")
    t0 = time.time()
    nchunks = (n + base_tabs.chunk - 1) // base_tabs.chunk
    for ci in range(nchunks):
        sync(base_tabs._chunk_tables(ci))
    log(f"table build: {time.time()-t0:.2f}s ({nchunks} chunks)")

    results, outs = {}, {}
    for lk in lookups:
        tabs = msm_fixed.FixedBaseTables((px, py, pz), lookup=lk)
        tabs._tables = base_tabs._tables  # share the built base tables
        t0 = time.time()
        for ci in range(nchunks):
            sync(tabs._chunk_tables_fmt(ci))
        log(f"{lk}: relayout {time.time()-t0:.2f}s")
        t0 = time.time()
        out = tabs.msm(sc)
        sync(out)
        log(f"{lk}: msm compile+run {time.time()-t0:.2f}s")
        dt = 1e30
        for _ in range(int(os.environ.get("BPT_BENCH_ITERS", "3"))):
            t0 = time.time()
            out = tabs.msm(sc)
            sync(out)
            dt = min(dt, max(time.time() - t0 - lat, 1e-9))
        results[lk] = dt
        outs[lk] = tuple(np.asarray(c) for c in out)
        log(f"{lk}: MSM n=2^{n.bit_length()-1}: {dt*1e3:.1f} ms -> {n/dt:.3e} points/s")

    ref = outs[lookups[0]]
    for lk in lookups[1:]:
        for a, b in zip(ref, outs[lk]):
            assert np.array_equal(a, b), f"{lk} output != {lookups[0]}"
    log("all strategies agree bit-exactly")

    base = min(results.values())
    for lk, dt in results.items():
        mark = "  <-- best" if dt == base else ""
        log(f"{lk:8s}: {dt*1e3:8.1f} ms{mark}")


if __name__ == "__main__":
    main()
