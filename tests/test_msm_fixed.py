"""Fixed-base combo-table MSM vs the host oracle (ops/msm_fixed.py)."""
import random

import jax.numpy as jnp
import pytest

from baby_plonk_tpu.curves.g1 import G1
from baby_plonk_tpu.curves import msm_host
from baby_plonk_tpu.fields import fr
from baby_plonk_tpu.ops import g1_vec, msm_fixed
from baby_plonk_tpu.ops.msm import FR_SPEC

rng = random.Random(20240817)


def _mk(n):
    pts = [G1.generator() * rng.randrange(1, fr.Q) for _ in range(n)]
    scalars = [rng.randrange(fr.Q) for _ in range(n)]
    return pts, scalars


@pytest.mark.parametrize(
    "n,chunk",
    [
        pytest.param(8, 8, marks=pytest.mark.slow),
        pytest.param(16, 16, marks=pytest.mark.slow),
        pytest.param(24, 32, marks=pytest.mark.slow),
        pytest.param(64, 32, marks=pytest.mark.slow),
    ],
)
def test_msm_fixed_matches_host(n, chunk):
    pts, scalars = _mk(n)
    tabs = msm_fixed.FixedBaseTables(g1_vec.points_to_device(pts), chunk=chunk)
    sc = jnp.asarray(FR_SPEC.pack_raw(scalars))
    got = g1_vec.point_from_device(tabs.msm(sc))
    assert got == msm_host.msm(pts, scalars)


@pytest.mark.slow
def test_msm_fixed_multi_sub_build(monkeypatch):
    """Chunks wider than the build kernel's limit assemble from BUILD_W-
    wide sub-builds (concatenated along the group axis) and must match
    the host oracle; BUILD_W is patched down to force the path."""
    monkeypatch.setattr(msm_fixed, "BUILD_W", 32)
    pts, scalars = _mk(64)
    tabs = msm_fixed.FixedBaseTables(
        g1_vec.points_to_device(pts), chunk=64, cache_key=None
    )
    sc = jnp.asarray(FR_SPEC.pack_raw(scalars))
    got = g1_vec.point_from_device(tabs.msm(sc))
    assert got == msm_host.msm(pts, scalars)


@pytest.mark.slow
def test_msm_fixed_prefix_and_reuse():
    """Commit-shaped use: same tables, different scalar lengths k <= n."""
    n = 40
    pts, _ = _mk(n)
    tabs = msm_fixed.FixedBaseTables(g1_vec.points_to_device(pts), chunk=16)
    for k in (1, 7, 16, 33, 40):
        scalars = [rng.randrange(fr.Q) for _ in range(k)]
        sc = jnp.asarray(FR_SPEC.pack_raw(scalars))
        got = g1_vec.point_from_device(tabs.msm(sc))
        assert got == msm_host.msm(pts[:k], scalars)


def test_msm_fixed_edge_scalars():
    """Zeros, ones, Q-1, and identity-heavy patterns."""
    n = 16
    pts, _ = _mk(n)
    tabs = msm_fixed.FixedBaseTables(g1_vec.points_to_device(pts), chunk=16)
    for scalars in (
        [0] * n,
        [1] * n,
        [fr.Q - 1] * n,
        [0, 1] * (n // 2),
        [rng.randrange(fr.Q)] + [0] * (n - 1),
    ):
        sc = jnp.asarray(FR_SPEC.pack_raw(scalars))
        got = g1_vec.point_from_device(tabs.msm(sc))
        assert got == msm_host.msm(pts, scalars)


@pytest.mark.slow
def test_tables_build_invariant():
    """Spot-check affine table entries: T[g][idx] = sum of the subset;
    the identity entry is the (0, 0) marker."""
    import numpy as np

    from baby_plonk_tpu.ops.g1_vec import FQ_SPEC

    n = 8
    pts, _ = _mk(n)
    tabs = msm_fixed.FixedBaseTables(g1_vec.points_to_device(pts), chunk=8)
    tx, ty = tabs._chunk_tables(0)
    assert not np.asarray(tx[:, 0, 0]).any() and not np.asarray(ty[:, 0, 0]).any()
    for idx in (1, 3, 0x55, 0xFF, rng.randrange(1, 256)):
        want = G1.identity()
        for j in range(8):
            if (idx >> j) & 1:
                want = want + pts[j]
        x = FQ_SPEC.unpack_mont(np.asarray(tx[:, 0, idx]).reshape(24, 1))[0]
        y = FQ_SPEC.unpack_mont(np.asarray(ty[:, 0, idx]).reshape(24, 1))[0]
        assert (x, y) == want.to_affine()


@pytest.mark.parametrize("segments", [3, 5])
@pytest.mark.slow
def test_msm_fixed_segmented_matches_host(segments):
    """Shifted-table Horner variant (BPT_MSM_SEGMENTS): one double per
    iteration, S gathers/adds; must agree with the host oracle."""
    n = 16
    pts, scalars = _mk(n)
    tabs = msm_fixed.FixedBaseTables(
        g1_vec.points_to_device(pts), chunk=16, segments=segments
    )
    for sc_list in (scalars, [fr.Q - 1] * n, [0, 1] * (n // 2)):
        sc = jnp.asarray(FR_SPEC.pack_raw(sc_list))
        got = g1_vec.point_from_device(tabs.msm(sc))
        assert got == msm_host.msm(pts, sc_list)
