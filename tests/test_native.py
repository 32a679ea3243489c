"""Native C runtime kernels vs Python fallbacks (bit-exactness)."""
import random

import numpy as np
import pytest

from baby_plonk_tpu import native
from baby_plonk_tpu.fields import fr, fq
from baby_plonk_tpu.ops.limbs import FieldSpec, ints_to_array, array_to_ints

rng = random.Random(12)


@pytest.mark.skipif(not native.available(), reason="native toolchain unavailable")
@pytest.mark.parametrize("mod,L", [(fr.Q, 16), (fq.P, 24)], ids=["fr", "fq"])
def test_native_codec_matches_python(mod, L):
    spec = FieldSpec(mod, L)
    xs = [rng.randrange(mod) for _ in range(100)] + [0, 1, mod - 1]
    packed = spec.pack_mont(xs)  # native path (n >= 8)
    want = ints_to_array([x * spec.R % mod for x in xs], L)
    assert np.array_equal(packed, want)
    assert spec.unpack_mont(packed) == xs


@pytest.mark.skipif(not native.available(), reason="native toolchain unavailable")
def test_native_keccak_matches_python():
    import baby_plonk_tpu.utils.keccak as K

    st_native = bytearray(rng.randbytes(200))
    st_python = bytearray(st_native)
    native.keccak_f1600(st_native)
    # force the pure-Python path
    avail = native.available
    native.available = lambda: False
    try:
        K.keccak_f1600(st_python)
    finally:
        native.available = avail
    assert st_native == st_python
