"""A/B the fixed-base MSM chunk width on the attached chip.

The Horner loop runs at G = chunk/8 lanes; larger chunks amortize
per-chunk dispatch/combine overhead (the ~10-18% gap between the MSM and
its serial-mul arithmetic bound, bench.py roofline) at the cost of a
bigger per-chunk table working set. Times n = 2^BPT_BENCH_MSM_LOG2
(default 16) at each chunk width; outputs cross-checked bit-exactly.

Usage: python scripts/bench_msm_chunk.py [log2_chunks=14,15,16]
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
    n = 1 << int(os.environ.get("BPT_BENCH_MSM_LOG2", "16"))
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

    logcs = [
        int(x)
        for x in (sys.argv[1] if len(sys.argv) > 1 else "14,15,16").split(",")
    ]
    results, outs = {}, {}
    for lc in logcs:
        chunk = 1 << lc
        if chunk > n:
            continue
        tabs = msm_fixed.FixedBaseTables((px, py, pz), chunk=chunk)
        t0 = time.time()
        nchunks = (n + chunk - 1) // chunk
        for ci in range(nchunks):
            sync(tabs._chunk_tables_fmt(ci))
        log(f"chunk 2^{lc}: table build {time.time()-t0:.1f}s ({nchunks} chunks)")
        t0 = time.time()
        out = tabs.msm(sc)
        sync(out)
        log(f"chunk 2^{lc}: compile+run {time.time()-t0:.1f}s")
        dt = 1e30
        for _ in range(int(os.environ.get("BPT_BENCH_ITERS", "3"))):
            t0 = time.time()
            for _ in range(2):
                out = tabs.msm(sc)
            sync(out)
            dt = min(dt, max((time.time() - t0 - lat) / 2, 1e-9))
        results[lc] = dt
        # compare as host points: different chunk counts combine partials
        # in different orders, giving different (equivalent) projective Z
        from baby_plonk_tpu.ops import g1_vec

        outs[lc] = g1_vec.point_from_device(out)
        log(
            f"chunk 2^{lc}: MSM n=2^{n.bit_length()-1}: {dt*1e3:.1f} ms "
            f"-> {n/dt:.3e} points/s"
        )

    ref = outs[logcs[0]]
    for lc in logcs[1:]:
        if lc in outs:
            assert outs[lc] == ref, f"chunk 2^{lc} result differs"
    log("all chunk widths agree")
    best = min(results, key=results.get)
    for lc, dt in sorted(results.items()):
        log(f"chunk 2^{lc}: {dt*1e3:8.1f} ms{'  <-- best' if lc == best else ''}")


if __name__ == "__main__":
    main()
