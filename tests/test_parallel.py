"""Distributed kernels on the virtual 8-device CPU mesh (SURVEY.md §7.1 step 8)."""
import random

import jax
import jax.numpy as jnp
import numpy as np
import pytest

pytestmark = pytest.mark.slow  # heavy compiles / mesh pipelines

from baby_plonk_tpu.curves.g1 import G1
from baby_plonk_tpu.curves import msm_host
from baby_plonk_tpu.fields import fr
from baby_plonk_tpu.ops import g1_vec
from baby_plonk_tpu.ops.ntt import FR_SPEC
from baby_plonk_tpu.parallel import dmsm, dntt
from baby_plonk_tpu.parallel.mesh import make_mesh
from baby_plonk_tpu.protocol import poly as hostpoly

rng = random.Random(4242)


@pytest.fixture(scope="module")
def mesh():
    assert len(jax.devices()) >= 8
    return make_mesh(8)


def test_dntt_matches_host(mesh):
    n = 256  # D=8, m=32, m/D=4
    vals = [rng.randrange(fr.Q) for _ in range(n)]
    got = dntt.ntt_ints_sharded(vals, mesh)
    assert got == hostpoly.ntt(vals)


def test_dntt_inverse_matches_host(mesh):
    n = 512
    vals = [rng.randrange(fr.Q) for _ in range(n)]
    got = dntt.ntt_ints_sharded(vals, mesh, inverse=True)
    assert got == hostpoly.i_ntt(vals)


def test_dntt_dual_inverse_roundtrip(mesh):
    """The dual four-step (cyclic-in, natural-out) must invert the forward
    transform exactly — the reorder-free convolution pairing round 3 uses."""
    n = 256
    vals = [rng.randrange(fr.Q) for _ in range(n)]
    a = jnp.asarray(FR_SPEC.pack_mont(vals))
    fwd = dntt._dntt_jit(a, False, mesh)  # cyclic order
    back = dntt._dntt_dual_jit(fwd, mesh)  # natural order
    assert FR_SPEC.unpack_mont(np.asarray(jax.device_get(back))) == vals
    # batched leading dim (the (16, k, m) shape round 3 streams)
    a3 = jnp.stack([a, a], axis=1)
    back3 = dntt._dntt_dual_jit(dntt._dntt_jit(a3, False, mesh), mesh)
    assert FR_SPEC.unpack_mont(np.asarray(jax.device_get(back3[:, 0]))) == vals


def test_dmsm_matches_host(mesh):
    n = 32
    pts = [G1.generator() * rng.randrange(1, fr.Q) for _ in range(n)]
    scalars = [rng.randrange(fr.Q) for _ in range(n)]
    got = dmsm.msm_sharded(pts, scalars, mesh)
    assert got == msm_host.msm(pts, scalars)


def test_prove_step_sharded(mesh):
    """Full sharded round-1-shaped step: iNTT + 3 commits over the mesh."""
    from baby_plonk_tpu.parallel import prove_step
    from baby_plonk_tpu.curves import msm_host as mh

    n = 64
    D = 8
    cols_ints = [[rng.randrange(fr.Q) for _ in range(n)] for _ in range(3)]
    cols = jnp.asarray(
        np.stack([FR_SPEC.pack_mont(c) for c in cols_ints], axis=1)
    )  # (16, 3, n)
    tau = 9999
    srs = [G1.generator() * pow(tau, i, fr.Q) for i in range(n)]
    perm = prove_step.cyclic_perm(n, D)
    srs_cyclic = [srs[perm[i]] for i in range(n)]
    px, py, pz = g1_vec.points_to_device(srs_cyclic)
    outs = prove_step.prove_step_sharded(cols, px, py, pz, mesh)
    for i in range(3):
        got = g1_vec.point_from_device(outs[i])
        coeffs = hostpoly.i_ntt(cols_ints[i])
        want = mh.msm(srs, coeffs)
        assert got == want


def test_powers_of_tau_sharded(mesh):
    """Distributed SRS generation must reproduce the host powers-of-tau
    (padding lanes beyond `powers` are identity points)."""
    from baby_plonk_tpu.ops import srs

    powers, tau = 22, 31337  # deliberately not divisible by D=8
    out = srs.powers_of_tau_sharded(powers, tau, mesh)
    pts = srs.device_points_to_host(tuple(np.asarray(jax.device_get(c)) for c in out))
    want = [G1.generator() * pow(tau, i, fr.Q) for i in range(powers)]
    assert pts[:powers] == want
    assert all(p.is_identity() for p in pts[powers:])


def test_grand_product_sharded(mesh):
    from baby_plonk_tpu.ops.engine import HostEngine
    from baby_plonk_tpu.parallel import dscan

    n = 64
    roots = fr.roots_of_unity(n)
    mk = lambda: [rng.randrange(fr.Q) for _ in range(n)]
    a, b, c, s1, s2, s3 = mk(), mk(), mk(), mk(), mk(), mk()
    beta, gamma = rng.randrange(fr.Q), rng.randrange(fr.Q)
    want = HostEngine().grand_product(a, b, c, s1, s2, s3, roots, beta, gamma, 2, 3)
    got = dscan.grand_product_sharded(
        a, b, c, s1, s2, s3, roots, beta, gamma, 2, 3, mesh
    )
    assert got == want


@pytest.mark.parametrize("ndev", [3, 6])
def test_grand_product_sharded_non_pow2_mesh(ndev):
    """Regression: the cross-shard totals fold must not drop a shard on a
    non-power-of-two mesh (dscan._fold_totals pads with Montgomery ones)."""
    from baby_plonk_tpu.ops.engine import HostEngine
    from baby_plonk_tpu.parallel import dscan

    n = ndev * 16
    roots_n = 1 << (n - 1).bit_length()
    # grand product only needs equal-length columns, not a pow2 domain;
    # use the first n roots of the covering pow2 domain as identity values
    roots = fr.roots_of_unity(roots_n)[:n]
    mk = lambda: [rng.randrange(fr.Q) for _ in range(n)]
    a, b, c, s1, s2, s3 = mk(), mk(), mk(), mk(), mk(), mk()
    beta, gamma = rng.randrange(fr.Q), rng.randrange(fr.Q)
    want = HostEngine().grand_product(a, b, c, s1, s2, s3, roots, beta, gamma, 2, 3)
    got = dscan.grand_product_sharded(
        a, b, c, s1, s2, s3, roots, beta, gamma, 2, 3, make_mesh(ndev)
    )
    assert got == want
