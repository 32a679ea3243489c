"""Device NTT vs host oracle (bit-exactness, SURVEY.md §7.1 step 2)."""
import random

import pytest

from baby_plonk_tpu.fields import fr
from baby_plonk_tpu.ops import ntt as dntt
from baby_plonk_tpu.protocol import poly as hostpoly

rng = random.Random(99)


@pytest.mark.parametrize("n", [1, 2, 8, 64, 256])
@pytest.mark.parametrize("inverse", [False, True])
def test_ntt_matches_host(n, inverse):
    vals = [rng.randrange(fr.Q) for _ in range(n)]
    got = dntt.ntt_ints(vals, inverse=inverse)
    want = hostpoly.ntt(vals, inverse=inverse)
    assert got == want


def test_ntt_roundtrip():
    n = 128
    vals = [rng.randrange(fr.Q) for _ in range(n)]
    assert dntt.ntt_ints(dntt.ntt_ints(vals), inverse=True) == vals


@pytest.mark.parametrize("inverse", [False, True])
def test_ntt_four_step_matches_pease(inverse):
    """The four-step on-chip layout (ntt.ntt4_mont, default at n >= 4096)
    must agree with the constant-geometry path bit-for-bit, including at
    an odd log2 (asymmetric n1 != n2 split)."""
    import jax.numpy as jnp
    import numpy as np

    for n in (4096, 8192):
        vals = [rng.randrange(fr.Q) for _ in range(n)]
        a = jnp.asarray(dntt.FR_SPEC.pack_mont(vals))
        n1, n2, tw1, tw2, crossT, br1, br2, n_inv = dntt._plan4(n, inverse)
        got4 = dntt.FR_SPEC.unpack_mont(
            np.asarray(
                dntt._ntt4_jit(
                    a, inverse, n1, n2,
                    jnp.asarray(tw1), jnp.asarray(tw2), jnp.asarray(crossT),
                    jnp.asarray(br1), jnp.asarray(br2), jnp.asarray(n_inv),
                )
            )
        )
        perm, twp, n_invp = dntt._plan(n, inverse)
        want = dntt.FR_SPEC.unpack_mont(
            np.asarray(
                dntt._ntt_jit(
                    a, inverse,
                    jnp.asarray(perm), jnp.asarray(twp), jnp.asarray(n_invp),
                )
            )
        )
        assert got4 == want


def test_ntt_batched():
    import jax.numpy as jnp
    import numpy as np

    n, b = 32, 3
    polys = [[rng.randrange(fr.Q) for _ in range(n)] for _ in range(b)]
    a = jnp.asarray(
        np.stack([dntt.FR_SPEC.pack_mont(p) for p in polys], axis=1)
    )  # (16, b, n)
    out = dntt.ntt_device(a)
    for i in range(b):
        got = dntt.FR_SPEC.unpack_mont(np.asarray(out[:, i]))
        assert got == hostpoly.ntt(polys[i])
