"""Karatsuba full-product path (BPT_FQ_MUL=karatsuba) vs host oracle.

The one-level 24-limb Karatsuba (ops/limbs.py::_mul_cols_kara24) biases
the middle columns by 2^23 and removes the known constant V*R^-1 AFTER
Montgomery reduction; the wide (lazy) pipeline threads net bias COUNTS
through sub_wide (0) / add_wide (2) / plain product (1), with those
counts hardwired into g1_vec's padd/pdouble/padd_mixed. This test runs
the full flag matrix in a subprocess (the toggle is read at import) and
checks every form against exact host arithmetic — the bias bookkeeping
must not silently break under refactors of the wide-mul helpers
(ADVICE r4; VERDICT r4 next #1 step 1).
"""
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_karatsuba_flag_matrix():
    proc = subprocess.run(
        [sys.executable, os.path.abspath(__file__), "--worker"],
        capture_output=True,
        text=True,
        timeout=900,
        env=dict(
            os.environ,
            PYTHONPATH=REPO,
            BPT_FQ_MUL="karatsuba",
            JAX_PLATFORMS="cpu",
        ),
    )
    assert proc.returncode == 0, proc.stdout + proc.stderr
    assert "karatsuba worker: OK" in proc.stdout


def _worker() -> None:
    assert os.environ.get("BPT_FQ_MUL") == "karatsuba"
    import random

    import jax
    import jax.numpy as jnp
    import numpy as np

    from baby_plonk_tpu.curves import msm_host
    from baby_plonk_tpu.curves.g1 import G1
    from baby_plonk_tpu.fields import fq, fr
    from baby_plonk_tpu.ops import g1_vec, limbs, msm_fixed
    from baby_plonk_tpu.ops.limbs import FieldSpec
    from baby_plonk_tpu.ops.msm import FR_SPEC

    FQ = FieldSpec(fq.P, 24)
    assert limbs.kara_enabled(FQ), "flag did not reach limbs"
    # Fr (16 limbs) must NOT take the 24-limb path
    assert not limbs.kara_enabled(FieldSpec(fr.Q, 16))

    p = fq.P
    rng = random.Random(42)
    xs = [rng.randrange(p) for _ in range(6)] + [0, 1, p - 1, p - 2]
    ys = [rng.randrange(p) for _ in range(6)] + [p - 1, 0, p - 1, 1]
    ab = [a * b % p for a, b in zip(xs, ys)]
    A = jnp.asarray(FQ.pack_mont(xs))
    B = jnp.asarray(FQ.pack_mont(ys))

    got = FQ.unpack_mont(np.asarray(limbs.mont_mul_jit(FQ, A, B)))
    assert got == ab, "mont_mul"
    got = FQ.unpack_mont(np.asarray(limbs.mont_mul_jit(FQ, A, A)))
    assert got == [a * a % p for a in xs], "mont_sqr"

    @jax.jit
    def wide_ops(A, B):
        w0 = limbs.mul_wide_nored(FQ, A, B)  # bias 1
        w1 = limbs.mul_wide_nored(FQ, A, A)  # bias 1
        r1 = limbs.mont_reduce_wide(FQ, w0, bias_count=1)
        r0 = limbs.mont_reduce_wide(
            FQ, limbs.sub_wide(FQ, w0, w1), bias_count=0
        )
        r2 = limbs.mont_reduce_wide(
            FQ, limbs.add_wide(FQ, w0, w1), bias_count=2
        )
        st = limbs.mont_reduce_wide(
            FQ,
            jnp.stack(
                [limbs.sub_wide(FQ, w0, w1), limbs.add_wide(FQ, w0, w1), w0],
                axis=1,
            ),
            bias_count=(0, 2, 1),
        )
        return r1, r0, r2, st

    r1, r0, r2, st = (np.asarray(x) for x in wide_ops(A, B))
    asq = [a * a % p for a in xs]
    assert FQ.unpack_mont(r1) == ab, "reduce bias=1"
    assert FQ.unpack_mont(r0) == [(v - w) % p for v, w in zip(ab, asq)], (
        "sub_wide bias=0"
    )
    assert FQ.unpack_mont(r2) == [(v + w) % p for v, w in zip(ab, asq)], (
        "add_wide bias=2"
    )
    assert FQ.unpack_mont(st[:, 0]) == [(v - w) % p for v, w in zip(ab, asq)]
    assert FQ.unpack_mont(st[:, 1]) == [(v + w) % p for v, w in zip(ab, asq)]
    assert FQ.unpack_mont(st[:, 2]) == ab
    print("karatsuba worker: limbs OK", flush=True)

    # point kernels (the hardwired bias tuples) vs the host group law,
    # including identity lanes through the complete formulas
    pts = [G1.generator() * rng.randrange(1, fr.Q) for _ in range(4)]
    P = g1_vec.points_to_device(pts[:2] + [G1.identity()])
    Q = g1_vec.points_to_device(pts[2:] + [pts[0]])
    Qa = g1_vec.points_to_device(pts[2:])

    @jax.jit
    def point_ops(P, Q, Qa):
        return (
            g1_vec.padd(P, Q),
            g1_vec.pdouble(P),
            g1_vec.padd_mixed(
                tuple(c[:, :2] for c in P), (Qa[0], Qa[1])
            ),
        )

    radd, rdbl, rmix = point_ops(P, Q, Qa)
    hosts_add = [pts[0] + pts[2], pts[1] + pts[3], pts[0]]
    hosts_dbl = [pts[0].double(), pts[1].double(), G1.identity()]
    hosts_mix = [pts[0] + pts[2], pts[1] + pts[3]]
    for i, want in enumerate(hosts_add):
        got = g1_vec.point_from_device(tuple(np.asarray(c)[:, i] for c in radd))
        assert got == want, f"padd lane {i}"
    for i, want in enumerate(hosts_dbl):
        got = g1_vec.point_from_device(tuple(np.asarray(c)[:, i] for c in rdbl))
        assert got == want, f"pdouble lane {i}"
    for i, want in enumerate(hosts_mix):
        got = g1_vec.point_from_device(tuple(np.asarray(c)[:, i] for c in rmix))
        assert got == want, f"padd_mixed lane {i}"
    print("karatsuba worker: point kernels OK", flush=True)

    # full fixed-base MSM (the production commit path) end-to-end
    n = 8
    mpts = [G1.generator() * rng.randrange(1, fr.Q) for _ in range(n)]
    scalars = [rng.randrange(fr.Q) for _ in range(n)]
    tabs = msm_fixed.FixedBaseTables(
        g1_vec.points_to_device(mpts), chunk=8, cache_key=None
    )
    got = g1_vec.point_from_device(tabs.msm(jnp.asarray(FR_SPEC.pack_raw(scalars))))
    assert got == msm_host.msm(mpts, scalars), "fixed-base MSM under karatsuba"
    print("karatsuba worker: OK", flush=True)


if __name__ == "__main__":
    if "--worker" in sys.argv:
        _worker()
