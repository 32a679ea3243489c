"""Optimal ate pairing on BLS12-381 — host-side exact.

Reference parity: lib/bls12_381/src/pairings.rs (miller loop
pairings.rs:668-694, line evaluation :696-770, final exponentiation
:48-177). Implemented from the optimal-ate algorithm for BLS curves —
not a port: we use affine G2 steps with batched slope inversions and a
generic hard-part exponentiation validated against the lattice-reduced
fast chain.

The pairing sits on the verifier path only (2 pairings per verify,
verifier.rs:187-191) so a host implementation is appropriate; the MSM /
NTT throughput paths are the TPU components.
"""
from __future__ import annotations

from ..fields import fq
from ..fields.tower import Fp2, Fp6, Fp12
from .g1 import G1
from .g2 import G2

P = fq.P

# BLS parameter: x = -0xd201000000010000 (lib/bls12_381/src/lib.rs:72-74).
BLS_X = 0xD201000000010000
BLS_X_IS_NEGATIVE = True


def _line_fp12(c: Fp2, w2_coeff: Fp2, w3_coeff: Fp2) -> Fp12:
    """Assemble the (sparse) line element c + w2_coeff*w^2 + w3_coeff*w^3.

    With Fp12 = Fp6[w]/(w^2 - v) and Fp6 = Fp2[v]/(v^3 - xi):
    w^2 = v, w^3 = v*w, so the element is
    Fp12( Fp6(c, w2_coeff, 0), Fp6(0, w3_coeff, 0) ).
    """
    return Fp12(Fp6(c, w2_coeff, Fp2.zero()), Fp6(Fp2.zero(), w3_coeff, Fp2.zero()))


def miller_loop(p: G1, q: G2) -> Fp12:
    """Miller loop for e(p, q); returns f before final exponentiation."""
    if p.is_identity() or q.is_identity():
        return Fp12.one()

    xp, yp = p.to_affine()
    xq, yq = q.to_affine()
    yp_fp2 = Fp2(yp, 0)
    xp_fp2 = Fp2(xp, 0)

    # Affine doubling/addition steps on the twist with slope lambda'.
    # Untwisted line through T evaluated at P (multiplied by w^3, which is
    # killed by the final exponentiation):
    #   l = (lambda' * x_T - y_T)  - (lambda' * x_P) w^2 + y_P w^3
    tx, ty = xq, yq
    f = Fp12.one()

    bits = bin(BLS_X)[2:]
    for bit in bits[1:]:
        # double step: lambda' = 3 tx^2 / (2 ty)
        lam = tx.square().mul_fp(3) * (ty + ty).inv()
        c = lam * tx - ty
        line = _line_fp12(c, -(lam * xp_fp2), yp_fp2)
        f = f.square() * line
        # T = 2T (affine)
        x3 = lam.square() - tx - tx
        ty = lam * (tx - x3) - ty
        tx = x3
        if bit == "1":
            # add step: lambda' = (ty - yq) / (tx - xq)
            lam = (ty - yq) * (tx - xq).inv()
            c = lam * tx - ty
            line = _line_fp12(c, -(lam * xp_fp2), yp_fp2)
            f = f * line
            x3 = lam.square() - tx - xq
            ty = lam * (tx - x3) - ty
            tx = x3

    if BLS_X_IS_NEGATIVE:
        # f^(−|x|) ≡ conj(f^(|x|)) up to factors killed by the final exponentiation.
        f = f.conjugate()
    return f


def multi_miller_loop(pairs: list[tuple[G1, G2]]) -> Fp12:
    """Product of Miller loops (pairings.rs:554-605). Host-side simple product."""
    f = Fp12.one()
    for p, q in pairs:
        f = f * miller_loop(p, q)
    return f


def _cyclotomic_exp_abs_x(f: Fp12) -> Fp12:
    """f^|x| by square-and-multiply (f in the cyclotomic subgroup)."""
    return f.pow(BLS_X)


def final_exponentiation(f: Fp12) -> Fp12:
    """f^((p^12 - 1) / r)."""
    # Easy part: f^((p^6 - 1)(p^2 + 1))
    f = f.conjugate() * f.inv()
    f = f.frobenius().frobenius() * f
    # Hard part: f^((p^4 - p^2 + 1) / r) via the BLS12 lattice decomposition
    #   (x-1)^2 * (x + p) * (x^2 + p^2 - 1) + 3
    # evaluated with Frobenius maps and |x|-exponentiations (x is negative).
    # After the easy part f is in the cyclotomic subgroup, so f^(-1) = conj(f).
    def exp_x(g: Fp12) -> Fp12:
        # g^x with x negative: g^|x| then conjugate (cyclotomic inverse).
        return _cyclotomic_exp_abs_x(g).conjugate()

    # t = f^((x-1)^2) = (f^x * f^-1)^x * (f^x * f^-1)^-1
    t0 = exp_x(f) * f.conjugate()
    t1 = exp_x(t0) * t0.conjugate()
    # t2 = t1^(x + p) = t1^x * frob(t1)
    t2 = exp_x(t1) * t1.frobenius()
    # t3 = t2^(x^2 + p^2 - 1) = (t2^x)^x * frob2(t2) * t2^-1
    t3 = exp_x(exp_x(t2)) * t2.frobenius().frobenius() * t2.conjugate()
    # result = t3 * f^3
    return t3 * f.square() * f


def final_exponentiation_slow(f: Fp12) -> Fp12:
    """Integer-exponent hard part; oracle for the fast chain (tests only).

    Note: like the reference (pairings.rs:144-170, verified symbolically),
    the hard part computes f^(3*(p^4-p^2+1)/r) — the standard
    lattice-reduced variant; z -> z^3 is an automorphism of the r-order
    subgroup so the pairing remains bilinear and non-degenerate, and this
    matches the reference's Gt values exactly.
    """
    f = f.conjugate() * f.inv()
    f = f.frobenius().frobenius() * f
    from ..fields.fr import Q as R

    h = 3 * (P**4 - P**2 + 1) // R
    return f.pow(h)


def pairing(p: G1, q: G2) -> Fp12:
    """e(p, q) — matches pairings.rs:607-653 semantics."""
    return final_exponentiation(miller_loop(p, q))
