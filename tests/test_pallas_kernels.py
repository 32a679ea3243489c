"""Pallas kernels (interpreter mode on CPU) vs existing device kernels."""
import random

import jax.numpy as jnp
import numpy as np
import pytest

pytestmark = pytest.mark.slow  # interpreter-mode kernels are minutes-slow

from baby_plonk_tpu.curves.g1 import G1
from baby_plonk_tpu.curves import msm_host
from baby_plonk_tpu.fields import fr, fq
from baby_plonk_tpu.ops import g1_vec, pallas_kernels as pk
from baby_plonk_tpu.ops.g1_vec import FQ_SPEC
from baby_plonk_tpu.ops.msm import FR_SPEC

rng = random.Random(8181)


def test_mont_mul_pallas():
    n = 64
    xs = [rng.randrange(fq.P) for _ in range(n)]
    ys = [rng.randrange(fq.P) for _ in range(n)]
    a = jnp.asarray(FQ_SPEC.pack_mont(xs))
    b = jnp.asarray(FQ_SPEC.pack_mont(ys))
    got = FQ_SPEC.unpack_mont(np.asarray(pk.mont_mul_pallas(FQ_SPEC, a, b, tile=32)))
    assert got == [x * y % fq.P for x, y in zip(xs, ys)]


def test_msm_pallas_matches_host():
    n = 32
    pts = [G1.generator() * rng.randrange(1, fr.Q) for _ in range(n)]
    scalars = [rng.randrange(fr.Q) for _ in range(n)]
    scalars[3] = 0
    dev = g1_vec.points_to_device(pts)
    sc = jnp.asarray(FR_SPEC.pack_raw(scalars))
    out = pk.msm_pallas(dev, sc, tile=8)
    got = g1_vec.point_from_device(out)
    assert got == msm_host.msm(pts, scalars)


def test_msm_fixed_pallas_matches_host():
    """The DEFAULT commit path's Horner loop, fused: prebuilt subset-sum
    tables + the VMEM-resident 256-step gather/double/mixed-add kernel."""
    from baby_plonk_tpu.ops import msm_fixed

    n = 64  # 8 groups -> G = 8, two tiles at tile=4
    pts = [G1.generator() * rng.randrange(1, fr.Q) for _ in range(n)]
    scalars = [rng.randrange(fr.Q) for _ in range(n)]
    scalars[0] = 0
    scalars[9] = 1
    dev = g1_vec.points_to_device(pts)
    tx, ty = msm_fixed._build_tables(*dev)
    sc = jnp.asarray(FR_SPEC.pack_raw(scalars))
    out = pk.msm_fixed_pallas(tx, ty, sc, tile=4)
    got = g1_vec.point_from_device(out)
    assert got == msm_host.msm(pts, scalars)


def test_ntt_sub_pallas_4step_matches_xla(monkeypatch):
    """The recursive four-step sub-NTT (m past the VMEM limit) must equal
    the XLA stage loop in natural order; SUB_MAX_M is patched down so the
    recursion triggers at an interpreter-friendly size."""
    from baby_plonk_tpu.ops import ntt as ntt_ops

    monkeypatch.setattr(pk, "SUB_MAX_M", 8)
    m, B = 64, 4  # factors 8 x 8 under the patched limit
    vals = [[rng.randrange(fr.Q) for _ in range(m)] for _ in range(B)]
    a = jnp.asarray(
        np.stack([ntt_ops.FR_SPEC.pack_mont(v) for v in vals], axis=-1)
    )  # (16, m, B)
    for inverse in (False, True):
        perm, tw, _ = ntt_ops._plan(m, inverse)
        want = ntt_ops._ntt_axis2(
            a, m, jnp.asarray(tw), jnp.asarray(perm), nbatch=0
        )
        got = pk.ntt_sub_pallas_4step(a, inverse)
        assert jnp.array_equal(want, got), f"inverse={inverse}"


def test_ntt_sub_pallas_matches_xla():
    """Fused all-stages sub-NTT kernel vs the production four-step path."""
    from baby_plonk_tpu.ops import ntt as ntt_ops

    m, B = 16, 16
    vals = [rng.randrange(fr.Q) for _ in range(m * B)]
    a = jnp.asarray(ntt_ops.FR_SPEC.pack_mont(vals)).reshape(16, B, m)
    a = jnp.swapaxes(a, -1, -2)  # (16, m, B): columns are length-m signals
    out = pk.ntt_sub_pallas(a, inverse=False, lanes_tile=8)
    br = ntt_ops._bit_reverse_perm(m)
    out = jnp.take(out, jnp.asarray(br), axis=-2)  # undo bit-reversal
    got = np.asarray(jnp.swapaxes(out, -1, -2)).reshape(16, m * B)
    # reference: per-column host NTT of length m
    root = fr.root_of_unity(m)
    for col in range(B):
        sig = vals[col * m : (col + 1) * m]
        want = [
            sum(sig[i] * pow(root, i * j, fr.Q) for i in range(m)) % fr.Q
            for j in range(m)
        ]
        got_col = ntt_ops.FR_SPEC.unpack_mont(
            got.reshape(16, B, m)[:, col, :]
        )
        assert got_col == want, f"column {col} mismatch"
