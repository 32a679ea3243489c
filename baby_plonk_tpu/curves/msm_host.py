"""Host-side multi-scalar multiplication (Pippenger) over G1.

Correctness oracle and small-size fallback for the TPU MSM
(baby_plonk_tpu.ops.msm). Functional equivalent of src/msm.rs:76-118 but
with a size-adaptive window (the reference hardcodes c = 4, setup.rs:36)
and LSB-first windows (mathematically identical result).
"""
from __future__ import annotations

from ..fields.fr import Q
from .g1 import G1


def _window_size(n: int) -> int:
    if n < 4:
        return 1
    if n < 32:
        return 3
    if n < 256:
        return 5
    if n < 4096:
        return 8
    if n < 65536:
        return 11
    return 13


def msm(points: list[G1], scalars: list[int], c: int | None = None) -> G1:
    """sum_i scalars[i] * points[i]."""
    n = min(len(points), len(scalars))
    if n == 0:
        return G1.identity()
    if n == 1:
        return points[0] * scalars[0]
    if c is None:
        c = _window_size(n)
    scalars = [s % Q for s in scalars[:n]]
    points = points[:n]
    num_windows = (255 + c - 1) // c
    mask = (1 << c) - 1

    window_sums: list[G1] = []
    for w in range(num_windows):
        shift = w * c
        buckets: dict[int, G1] = {}
        for p, s in zip(points, scalars):
            digit = (s >> shift) & mask
            if digit:
                cur = buckets.get(digit)
                buckets[digit] = p if cur is None else cur + p
        # descending running-sum accumulation (cf. msm.rs:42-47)
        acc = G1.identity()
        total = G1.identity()
        for d in range(max(buckets) if buckets else 0, 0, -1):
            b = buckets.get(d)
            if b is not None:
                acc = acc + b
            total = total + acc
        window_sums.append(total)

    # Horner combine, MSB window first
    result = window_sums[-1]
    for w in range(num_windows - 2, -1, -1):
        for _ in range(c):
            result = result.double()
        result = result + window_sums[w]
    return result


def msm_naive(points: list[G1], scalars: list[int]) -> G1:
    """Oracle: plain sum of scalar multiplications."""
    acc = G1.identity()
    for p, s in zip(points, scalars):
        acc = acc + p * s
    return acc
