"""Sorted-bucket Pippenger MSM vs host oracle."""
import random

import jax.numpy as jnp
import pytest

from baby_plonk_tpu.curves.g1 import G1
from baby_plonk_tpu.curves import msm_host
from baby_plonk_tpu.fields import fr
from baby_plonk_tpu.ops import g1_vec, msm_pippenger as pip
from baby_plonk_tpu.ops.msm import FR_SPEC

rng = random.Random(2718)


@pytest.mark.slow
@pytest.mark.parametrize("n,c", [(8, 4), (32, 8)])
def test_pippenger_matches_host(n, c):
    pts = [G1.generator() * rng.randrange(1, fr.Q) for _ in range(n)]
    scalars = [rng.randrange(fr.Q) for _ in range(n)]
    scalars[0] = 0
    scalars[1] = fr.Q - 1  # top window exercises the masked limb path
    dev = g1_vec.points_to_device(pts)
    sc = jnp.asarray(FR_SPEC.pack_raw(scalars))
    out = pip.msm_pippenger(dev, sc, c=c)
    got = g1_vec.point_from_device(out)
    assert got == msm_host.msm(pts, scalars)


@pytest.mark.slow
def test_pippenger_duplicate_digits():
    """Many equal digits -> long segment runs."""
    n = 16
    pts = [G1.generator() * (i + 1) for i in range(n)]
    scalars = [5] * 8 + [(5 << 8) | 5] * 8
    dev = g1_vec.points_to_device(pts)
    sc = jnp.asarray(FR_SPEC.pack_raw(scalars))
    out = pip.msm_pippenger(dev, sc, c=8)
    got = g1_vec.point_from_device(out)
    assert got == msm_host.msm(pts, scalars)
