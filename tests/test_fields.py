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


def test_fr_sqrt():
    """Tonelli-Shanks over the 2-adic subgroup (scalar.rs:381-395)."""
    rng = random.Random(4)
    assert fr.sqrt(0) == 0
    assert fr.sqrt(1) in (1, fr.Q - 1)
    n_residues = 0
    for _ in range(20):
        a = rng.randrange(1, fr.Q)
        sq = a * a % fr.Q
        r = fr.sqrt(sq)
        assert r is not None and r * r % fr.Q == sq
        # a non-residue: generator * square (generator is a non-residue)
        nr = fr.GENERATOR * sq % fr.Q
        assert fr.sqrt(nr) is None
        n_residues += 1
    assert n_residues == 20


def test_fr_from_bytes_wide():
    """64-byte uniform reduction (scalar.rs:308-338)."""
    rng = random.Random(5)
    assert fr.from_bytes_wide(b"\x00" * 64) == 0
    assert fr.from_bytes_wide(b"\xff" * 64) == (2**512 - 1) % fr.Q
    for _ in range(10):
        v = rng.randrange(2**512)
        assert fr.from_bytes_wide(v.to_bytes(64, "little")) == v % fr.Q


def test_fr_pow_vartime():
    rng = random.Random(6)
    for _ in range(5):
        a = rng.randrange(fr.Q)
        e = rng.randrange(2**255)
        assert fr.pow_vartime(a, e) == pow(a, e, fr.Q)
