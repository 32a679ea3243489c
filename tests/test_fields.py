"""Field-layer tests: Fr/Fq arithmetic, roots of unity, batch inversion."""
import random

from baby_plonk_tpu.fields import fq, fr


def test_fr_constants_match_reference():
    # Rust Montgomery-form constants (scalar.rs:208-221) decoded: value * R mod q
    R = (1 << 256) % fr.Q
    rust_rou = [0xB9B58D8C5F0E466A, 0x5B1B4C801819D7EC, 0x0AF53AE352A31E64, 0x5BF3ADDA19E9B27B]
    rust_rou_int = sum(l << (64 * i) for i, l in enumerate(rust_rou))
    assert fr.ROOT_OF_UNITY * R % fr.Q == rust_rou_int
    rust_roui = [0x4256481ADCF3219A, 0x45F37B7F96B6CAD3, 0xF9C3F1D75F7A3B27, 0x2D2FC049658AFD43]
    assert fr.ROOT_OF_UNITY_INV * R % fr.Q == sum(l << (64 * i) for i, l in enumerate(rust_roui))


def test_root_of_unity_orders():
    for n in (1, 2, 4, 8, 256, 1 << 16):
        w = fr.root_of_unity(n)
        assert pow(w, n, fr.Q) == 1
        if n > 1:
            assert pow(w, n // 2, fr.Q) != 1


def test_roots_of_unity_list():
    roots = fr.roots_of_unity(8)
    w = fr.root_of_unity(8)
    assert roots == [pow(w, i, fr.Q) for i in range(8)]


def test_batch_inv():
    rng = random.Random(1)
    vals = [rng.randrange(1, fr.Q) for _ in range(100)]
    invs = fr.batch_inv(vals)
    for v, iv in zip(vals, invs):
        assert v * iv % fr.Q == 1


def test_fr_bytes_roundtrip():
    rng = random.Random(2)
    for _ in range(20):
        v = rng.randrange(fr.Q)
        assert fr.from_bytes(fr.to_bytes(v)) == v
    # non-canonical rejected
    assert fr.from_bytes(fr.Q.to_bytes(32, "little")) is None
    assert fr.from_bytes(b"\xff" * 32) is None


def test_fq_sqrt_and_sign():
    rng = random.Random(3)
    for _ in range(10):
        a = rng.randrange(fq.P)
        sq = a * a % fq.P
        r = fq.sqrt(sq)
        assert r is not None and r * r % fq.P == sq
    # exactly one of (y, -y) is lexicographically largest
    y = rng.randrange(1, fq.P)
    assert fq.lexicographically_largest(y) != fq.lexicographically_largest(fq.P - y)
