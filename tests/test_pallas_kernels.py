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
