"""BLS12-381 G1 group — host-side exact arithmetic (Jacobian coordinates).

Curve: y^2 = x^3 + 4 over Fp. Reference parity: lib/bls12_381/src/g1.rs
(group law g1.rs:638-752, serialization g1.rs:221-391). Implemented from
the curve equations with Jacobian coordinates — NOT a port of the
reference's homogeneous complete formulas; the TPU kernels in
``baby_plonk_tpu.ops.g1_vec`` use branchless complete formulas instead.

Points are ``G1`` objects; the identity is represented by Z == 0.
Serialization matches zkcrypto's 48-byte compressed / 96-byte uncompressed
encodings bit-for-bit (validated against the upstream golden vectors).
"""
from __future__ import annotations

from ..fields import fq

P = fq.P
B = 4

# Standard generator (g1.rs:615, RFC 9380 / zkcrypto constants).
GEN_X = 0x17F1D3A73197D7942695638C4FA9AC0FC3688C4F9774B905A14E3A3F171BAC586C55E83FF97A1AEFFB3AF00ADB22C6BB
GEN_Y = 0x08B3F481E3AAA0F1A09E30ED741D8AE4FCF5E095D5D00AF600DB18CB2C04B3EDD03CC744A2888AE40CAA232946C5E7E1

# Fr group order (cofactor-cleared subgroup order).
from ..fields.fr import Q as FR_ORDER  # noqa: E402


class G1:
    """Jacobian point (X, Y, Z): affine x = X/Z^2, y = Y/Z^3; identity has Z = 0."""

    __slots__ = ("x", "y", "z")

    def __init__(self, x: int, y: int, z: int):
        self.x, self.y, self.z = x % P, y % P, z % P

    @staticmethod
    def identity() -> "G1":
        return G1(1, 1, 0)

    @staticmethod
    def generator() -> "G1":
        return G1(GEN_X, GEN_Y, 1)

    @staticmethod
    def from_affine(x: int, y: int) -> "G1":
        return G1(x, y, 1)

    def is_identity(self) -> bool:
        return self.z == 0

    def to_affine(self) -> tuple[int, int] | None:
        """Returns (x, y) or None for the identity."""
        if self.z == 0:
            return None
        zinv = fq.inv(self.z)
        zinv2 = zinv * zinv % P
        return (self.x * zinv2 % P, self.y * zinv2 % P * zinv % P)

    def double(self) -> "G1":
        if self.z == 0:
            return self
        X, Y, Z = self.x, self.y, self.z
        A = X * X % P
        Bq = Y * Y % P
        C = Bq * Bq % P
        D = 2 * ((X + Bq) * (X + Bq) - A - C) % P
        E = 3 * A % P
        F = E * E % P
        X3 = (F - 2 * D) % P
        Y3 = (E * (D - X3) - 8 * C) % P
        Z3 = 2 * Y * Z % P
        return G1(X3, Y3, Z3)

    def __add__(self, o: "G1") -> "G1":
        if self.z == 0:
            return o
        if o.z == 0:
            return self
        X1, Y1, Z1 = self.x, self.y, self.z
        X2, Y2, Z2 = o.x, o.y, o.z
        Z1Z1 = Z1 * Z1 % P
        Z2Z2 = Z2 * Z2 % P
        U1 = X1 * Z2Z2 % P
        U2 = X2 * Z1Z1 % P
        S1 = Y1 * Z2 % P * Z2Z2 % P
        S2 = Y2 * Z1 % P * Z1Z1 % P
        if U1 == U2:
            if S1 == S2:
                return self.double()
            return G1.identity()
        H = (U2 - U1) % P
        I = 4 * H * H % P
        J = H * I % P
        r = 2 * (S2 - S1) % P
        V = U1 * I % P
        X3 = (r * r - J - 2 * V) % P
        Y3 = (r * (V - X3) - 2 * S1 * J) % P
        Z3 = 2 * H * Z1 % P * Z2 % P
        return G1(X3, Y3, Z3)

    def __neg__(self) -> "G1":
        return G1(self.x, -self.y, self.z)

    def __sub__(self, o: "G1") -> "G1":
        return self + (-o)

    def __mul__(self, k: int) -> "G1":
        k = int(k) % FR_ORDER
        result = G1.identity()
        base = self
        while k:
            if k & 1:
                result = result + base
            base = base.double()
            k >>= 1
        return result

    __rmul__ = __mul__

    def __eq__(self, other) -> bool:
        if not isinstance(other, G1):
            return NotImplemented
        if self.z == 0 or other.z == 0:
            return self.z == 0 and other.z == 0
        # X1 Z2^2 == X2 Z1^2 and Y1 Z2^3 == Y2 Z1^3
        Z1Z1 = self.z * self.z % P
        Z2Z2 = other.z * other.z % P
        if self.x * Z2Z2 % P != other.x * Z1Z1 % P:
            return False
        return self.y * Z2Z2 % P * other.z % P == other.y * Z1Z1 % P * self.z % P

    def __hash__(self):
        aff = self.to_affine()
        return hash(aff)

    def is_on_curve(self) -> bool:
        if self.z == 0:
            return True
        x, y = self.to_affine()
        return y * y % P == (x * x % P * x + B) % P

    def is_torsion_free(self) -> bool:
        return (self * FR_ORDER).is_identity() if not self.is_identity() else True

    # -- serialization (g1.rs:221-391 format) --------------------------------

    def to_compressed(self) -> bytes:
        """48-byte big-endian x with flag bits 0x80 (compressed), 0x40 (inf), 0x20 (y sign)."""
        if self.z == 0:
            out = bytearray(48)
            out[0] = 0xC0
            return bytes(out)
        x, y = self.to_affine()
        out = bytearray(fq.to_bytes_be(x))
        out[0] |= 0x80
        if fq.lexicographically_largest(y):
            out[0] |= 0x20
        return bytes(out)

    def to_uncompressed(self) -> bytes:
        if self.z == 0:
            out = bytearray(96)
            out[0] = 0x40
            return bytes(out)
        x, y = self.to_affine()
        return fq.to_bytes_be(x) + fq.to_bytes_be(y)

    @staticmethod
    def from_compressed(data: bytes) -> "G1 | None":
        if len(data) != 48:
            return None
        flags = data[0]
        compression = bool(flags & 0x80)
        infinity = bool(flags & 0x40)
        sort = bool(flags & 0x20)
        if not compression:
            return None
        body = bytes([data[0] & 0x1F]) + data[1:]
        if infinity:
            if sort or any(body):
                return None
            return G1.identity()
        x = fq.from_bytes_be(body)
        if x is None:
            return None
        y = fq.sqrt((x * x % P * x + B) % P)
        if y is None:
            return None
        if fq.lexicographically_largest(y) != sort:
            y = (-y) % P
        pt = G1.from_affine(x, y)
        if not pt.is_torsion_free():
            return None
        return pt

    @staticmethod
    def from_uncompressed(data: bytes) -> "G1 | None":
        if len(data) != 96:
            return None
        flags = data[0]
        if flags & 0x80 or flags & 0x20:
            return None
        infinity = bool(flags & 0x40)
        body = bytes([data[0] & 0x1F]) + data[1:]
        if infinity:
            if any(body):
                return None
            return G1.identity()
        x = fq.from_bytes_be(body[:48])
        y = fq.from_bytes_be(body[48:])
        if x is None or y is None:
            return None
        pt = G1.from_affine(x, y)
        if not pt.is_on_curve() or not pt.is_torsion_free():
            return None
        return pt

    def __repr__(self):
        aff = self.to_affine()
        if aff is None:
            return "G1(identity)"
        return f"G1({hex(aff[0])}, {hex(aff[1])})"
