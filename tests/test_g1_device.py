"""Device G1 ops + MSM vs host oracle (SURVEY.md §7.1 steps 3-4)."""
import random

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from baby_plonk_tpu.curves.g1 import G1
from baby_plonk_tpu.curves import msm_host
from baby_plonk_tpu.fields import fr
from baby_plonk_tpu.ops import g1_vec, msm
from baby_plonk_tpu.ops.g1_vec import FQ_SPEC

rng = random.Random(7)


def _rand_points(n):
    return [G1.generator() * rng.randrange(1, fr.Q) for _ in range(n)]


def test_point_roundtrip():
    pts = _rand_points(3) + [G1.identity()]
    dev = g1_vec.points_to_device(pts)
    for i, p in enumerate(pts):
        got = g1_vec.point_from_device(tuple(c[:, i] for c in dev))
        assert got == p


def test_padd_pdouble_matches_host():
    n = 8
    ps = _rand_points(n - 2) + [G1.identity(), G1.generator()]
    qs = _rand_points(n - 2) + [G1.generator(), G1.generator()]  # id+P and P+P cases
    a = g1_vec.points_to_device(ps)
    b = g1_vec.points_to_device(qs)
    summed = jax.jit(g1_vec.padd)(a, b)
    doubled = jax.jit(g1_vec.pdouble)(a)
    for i in range(n):
        assert g1_vec.point_from_device(tuple(c[:, i] for c in summed)) == ps[i] + qs[i]
        assert g1_vec.point_from_device(tuple(c[:, i] for c in doubled)) == ps[i].double()


def test_tree_reduce():
    n = 16
    ps = _rand_points(n)
    dev = g1_vec.points_to_device(ps)
    got = g1_vec.point_from_device(jax.jit(g1_vec.tree_reduce)(dev))
    want = G1.identity()
    for p in ps:
        want = want + p
    assert got == want


@pytest.mark.slow
@pytest.mark.parametrize("n", [1, 5, 16])
def test_msm_matches_host(n):
    pts = _rand_points(n)
    scalars = [rng.randrange(fr.Q) for _ in range(n)]
    scalars[0] = 0  # edge: zero scalar
    got = msm.msm(pts, scalars)
    want = msm_host.msm(pts, scalars)
    assert got == want


@pytest.mark.slow
def test_msm_chunked_path(monkeypatch):
    """Exercise the chunk+combine path used for large n (CHUNK shrunk)."""
    monkeypatch.setattr(msm, "CHUNK", 8)
    n = 32
    pts = _rand_points(n)
    scalars = [rng.randrange(fr.Q) for _ in range(n)]
    got = msm.msm(pts, scalars)
    assert got == msm_host.msm(pts, scalars)


@pytest.mark.slow
def test_padd_mixed_matches_padd():
    """Mixed addition (RCB15 Alg 8) vs complete projective addition."""
    import jax.numpy as jnp

    from baby_plonk_tpu.fields.fr import Q as R

    rngm = random.Random(55)
    pts1 = [G1.generator() * rngm.randrange(1, R) for _ in range(6)]
    pts2 = [G1.generator() * rngm.randrange(1, R) for _ in range(6)]
    pts2[3] = pts1[3]          # doubling case
    pts2[4] = -pts1[4]         # P + (-P) = identity
    p1 = g1_vec.points_to_device(pts1)
    p2 = g1_vec.points_to_device(pts2)
    aff = g1_vec.batch_normalize(p2)
    got = g1_vec.padd_mixed(p1, aff)
    for i in range(6):
        lane = tuple(c[:, i] for c in got)
        assert g1_vec.point_from_device(lane) == pts1[i] + pts2[i]


@pytest.mark.slow
def test_batch_normalize_device():
    from baby_plonk_tpu.fields.fr import Q as R
    from baby_plonk_tpu.ops.g1_vec import FQ_SPEC

    rngm = random.Random(56)
    pts = [G1.generator() * rngm.randrange(1, R) for _ in range(5)]
    p = g1_vec.points_to_device(pts + [G1.identity()])
    x, y = g1_vec.batch_normalize(p)
    xs = FQ_SPEC.unpack_mont(np.asarray(x))
    ys = FQ_SPEC.unpack_mont(np.asarray(y))
    for i, pt in enumerate(pts):
        assert (xs[i], ys[i]) == pt.to_affine()
    assert xs[5] == 0 and ys[5] == 0
