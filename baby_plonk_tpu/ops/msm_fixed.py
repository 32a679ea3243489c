"""Fixed-base MSM via precomputed group-combination tables (JAX).

KZG commits are *fixed-base* MSMs: the SRS points are known long before
the scalars (setup.rs:32-37 recomputes nothing either, but its Pippenger
loop is per-commit work; msm.rs:76-118). This kernel moves almost all
per-point work into a one-time per-SRS precomputation:

  * points are grouped 8 at a time; for each group the 2^8 = 256 subset
    sums  T[g][idx] = sum_{j: idx_j = 1} P_{8g+j}  are precomputed on
    device (8 halving-doubling concat steps, ~32n point-adds once);
  * the bit-serial Horner loop then processes ONE table lookup per group
    per scalar bit:  acc = 2*acc + T[g][bits of the 8 group scalars] —
    width n/8 instead of n, i.e. 2*255*(n/8) = ~64n add-lanes per MSM
    versus ~510n for the plain bit-serial kernel (ops/msm.py): an 8x
    op-count reduction with NO sorts and NO scatters (the failure modes
    that made the sorted-bucket Pippenger slower, PERFORMANCE.md).

Tables are stored AFFINE (batch-normalized with one inversion): 1/3 less
memory and gather traffic than projective, and the inner loop uses the
13-mul mixed addition (g1_vec.padd_mixed). The identity (index 0, all
bits clear) becomes the off-curve (0, 0) marker and is skipped with a
lane select. Tables build lazily per 2^14-point chunk and are cached per
SRS (``tables_for_setup``), so the 9 commits of one proof and every
later proof against the same SRS reuse them.
"""
from __future__ import annotations

import os

import jax
import jax.numpy as jnp

from . import g1_vec, limbs
from .msm import BITS, _combine_partials

GROUP = 8
#: points per chunk; width inside the kernel is CHUNK/GROUP lanes
CHUNK = 1 << 14
#: max points per table-BUILD kernel invocation (its 256-lane combo
#: working set OOMs the compile above this); larger chunks concatenate
BUILD_W = 1 << 14


#: table element dtype: uint16 halves HBM footprint and gather traffic
#: (limbs are canonical 16-bit after batch_normalize); uint32 opt-out for
#: backends where sub-word gathers regress.
TABLE_U16 = os.environ.get("BPT_MSM_TABLE_U16", "1") == "1"

#: Table-lookup strategy for the Horner inner loop. The round-3 on-chip
#: A/B proved the loop is GATHER-bound (doublings are cheap: S=3/5
#: segmented tables lost 2.5x despite fewer doubles) — so the lever is
#: the lookup itself:
#:   gather2  — two take_along_axis gathers (x table, y table) per step
#:              over the minor (table-entry) axis;   [round-3 default]
#:   gather1  — ONE gather over a single interleaved (48, G, 256) table:
#:              same bytes fetched, half the gather ops;
#:   onehot   — NO gather: tables stored (48, 256, G), lookup = masked
#:              select + sum over the 256 sublane axis. Streams the whole
#:              table from HBM each step (sequential, VPU-friendly)
#:              instead of random access; exact in uint16 because the
#:              mask is one-hot.
#: Selected via BPT_MSM_LOOKUP; A/B with scripts/bench_msm_lookup.py.
#: Measured on chip at 2^14, round 4 (2026-08-20): gather2 118.4 ms,
#: gather1 110.4 ms, onehot 115.5 ms. Re-measured round 5 after the
#: cheaper point arithmetic (mul_small b3, dedicated squaring): gather2
#: 157.2 ms, gather1 263.2 ms (!), onehot 112.6 ms — XLA's schedule for
#: the interleaved single-gather form degrades badly around the new op
#: mix, while the gather-free streaming form is stable; onehot is the
#: default (PERFORMANCE.md round 5).
LOOKUP = os.environ.get("BPT_MSM_LOOKUP", "onehot")

#: Horner segments (shifted-table variant, below). S > 1 stores S table
#: sets — segment j holds subset sums of 2^(j*255/S) * P — and runs a
#: 255/S-iteration Horner loop with S gathers + S mixed adds but only ONE
#: double per iteration: doubling lanes drop from 255*G to (255/S)*G at
#: S x the table memory. Op-count model (muls/lane: double 11, mixed add
#: 13): S=1 -> 255*(11+13)=6120; S=3 -> 85*11+255*13=4250 (1.44x); S=5 ->
#: 51*11+255*13=3876 (1.58x). Must divide 255 (1, 3, 5, 15, 17).
SEGMENTS = int(os.environ.get("BPT_MSM_SEGMENTS", "1"))


@jax.jit
def _build_tables(px, py, pz):
    """(24, m) x3 Montgomery points, m % 8 == 0 ->
    (24, m/8, 256) x2 affine subset-sum tables.

    Table invariant: T[g][idx] = sum over set bits j of idx of P_{8g+j},
    via the write-once recurrence T[idx] = T[idx - msb(idx)] + P_msb.
    Each of the 8 steps runs at the FULL 256-entry width with a mask
    (msb(idx) == b) — ~8x more add-lanes than the minimal doubling-width
    schedule, but ONE compiled padd body (a fori_loop) instead of eight
    differently-shaped graphs, which keeps compile time sane; the build
    is one-time per SRS chunk.

    The build works in (24, NB, G) layout so the per-step table gather
    (jnp.take over the NB axis) fetches CONTIGUOUS length-G rows — the
    original (24, G, NB) minor-axis gather was ~15x above the build's
    op-count bound (PERFORMANCE.md); the result is transposed once at the
    end to the (24, G, NB) layout the MSM inner loop wants."""
    m = px.shape[-1]
    G = m // GROUP
    NB = 1 << GROUP
    pts = tuple(
        jnp.swapaxes(c.reshape(24, G, GROUP), 1, 2) for c in (px, py, pz)
    )  # (24, GROUP, G)
    combos = g1_vec.pidentity((NB, G))
    idx = jax.lax.broadcasted_iota(jnp.int32, (NB, 1), 0)[:, 0]  # (256,)

    def step(b, combos):
        mask = (idx >> b) == 1  # b is the highest set bit of idx
        partner = idx & ((jnp.int32(1) << b) - 1)  # idx - 2^b where mask
        gathered = tuple(jnp.take(c, partner, axis=1) for c in combos)
        pb = tuple(
            jnp.broadcast_to(
                jax.lax.dynamic_index_in_dim(c, b, axis=1, keepdims=True),
                (24, NB, G),
            )
            for c in pts
        )
        added = g1_vec.padd(gathered, pb)
        return g1_vec.pselect(mask[:, None], added, combos)

    combos = jax.lax.fori_loop(0, GROUP, step, combos)
    # normalize to affine: 1/3 less memory and gather traffic, enables the
    # 13-mul mixed add in the MSM loop; identity (only entry 0, barring a
    # vanishing subset sum) becomes the off-curve (0, 0) marker
    tx, ty = g1_vec.batch_normalize(combos)
    tx, ty = (jnp.swapaxes(t, 1, 2) for t in (tx, ty))
    if TABLE_U16:
        tx, ty = tx.astype(jnp.uint16), ty.astype(jnp.uint16)
    return tx, ty


@jax.jit
def _msm_fixed_kernel(tx, ty, scalars):
    """tx/ty: (24, G, 256) affine tables; scalars: (16, 8G) raw 16-bit
    limbs. Returns the (X, Y, Z) limb tuple (24,) of the total."""
    G = tx.shape[1]
    acc = g1_vec.pidentity((G,))

    def step(i, acc):
        bit = BITS - 1 - i  # MSB-first Horner
        limb = jax.lax.dynamic_index_in_dim(
            scalars, bit >> 4, axis=0, keepdims=False
        )
        b = (limb >> (bit & 15).astype(jnp.uint32)) & 1  # (8G,)
        bits8 = b.reshape(G, GROUP).astype(jnp.int32)
        shifts = jax.lax.broadcasted_iota(jnp.int32, (1, GROUP), 1)
        idx = jnp.sum(bits8 << shifts, axis=-1)  # (G,) in [0, 256)
        gidx = idx[None, :, None]
        qx, qy = (
            jnp.take_along_axis(t, gidx, axis=2)[:, :, 0].astype(jnp.uint32)
            for t in (tx, ty)
        )
        acc = g1_vec.pdouble(acc)
        added = g1_vec.padd_mixed(acc, (qx, qy))
        # (0, 0) is the identity marker (off-curve, unambiguous): skip
        is_id = limbs.is_zero(qx) & limbs.is_zero(qy)
        return g1_vec.pselect(is_id, acc, added)

    acc = jax.lax.fori_loop(0, BITS, step, acc)
    return g1_vec.tree_reduce(acc)


@jax.jit
def _msm_fixed_kernel_i(t, scalars):
    """Interleaved single-gather variant: t is ONE (48, G, 256) affine
    table (x limbs stacked over y limbs), so each Horner step issues one
    take_along_axis instead of two — half the gather ops for the same
    fetched bytes (the round-3 A/B showed the loop is gather-bound)."""
    G = t.shape[1]
    acc = g1_vec.pidentity((G,))

    def step(i, acc):
        bit = BITS - 1 - i  # MSB-first Horner
        limb = jax.lax.dynamic_index_in_dim(
            scalars, bit >> 4, axis=0, keepdims=False
        )
        b = (limb >> (bit & 15).astype(jnp.uint32)) & 1  # (8G,)
        bits8 = b.reshape(G, GROUP).astype(jnp.int32)
        shifts = jax.lax.broadcasted_iota(jnp.int32, (1, GROUP), 1)
        idx = jnp.sum(bits8 << shifts, axis=-1)  # (G,) in [0, 256)
        q = jnp.take_along_axis(t, idx[None, :, None], axis=2)[:, :, 0].astype(
            jnp.uint32
        )
        qx, qy = q[:24], q[24:]
        acc = g1_vec.pdouble(acc)
        added = g1_vec.padd_mixed(acc, (qx, qy))
        is_id = limbs.is_zero(qx) & limbs.is_zero(qy)
        return g1_vec.pselect(is_id, acc, added)

    acc = jax.lax.fori_loop(0, BITS, step, acc)
    return g1_vec.tree_reduce(acc)


@jax.jit
def _msm_fixed_kernel_oh(t, scalars):
    """One-hot (gather-free) variant: t is (48, 256, G); the per-step
    lookup is a broadcast equality mask + masked sum over the 256-entry
    sublane axis — sequential streaming of the table instead of random
    access. The sum is exact in uint16 because exactly one mask entry per
    lane is set."""
    G = t.shape[2]
    NB = t.shape[1]
    acc = g1_vec.pidentity((G,))
    entry = jax.lax.broadcasted_iota(jnp.int32, (1, NB, 1), 1)

    def step(i, acc):
        bit = BITS - 1 - i
        limb = jax.lax.dynamic_index_in_dim(
            scalars, bit >> 4, axis=0, keepdims=False
        )
        b = (limb >> (bit & 15).astype(jnp.uint32)) & 1  # (8G,)
        bits8 = b.reshape(G, GROUP).astype(jnp.int32)
        shifts = jax.lax.broadcasted_iota(jnp.int32, (1, GROUP), 1)
        idx = jnp.sum(bits8 << shifts, axis=-1)  # (G,)
        mask = entry == idx[None, None, :]  # (1, 256, G) one-hot
        q = jnp.sum(
            jnp.where(mask, t, jnp.zeros((), t.dtype)), axis=1
        ).astype(jnp.uint32)  # (48, G)
        qx, qy = q[:24], q[24:]
        acc = g1_vec.pdouble(acc)
        added = g1_vec.padd_mixed(acc, (qx, qy))
        is_id = limbs.is_zero(qx) & limbs.is_zero(qy)
        return g1_vec.pselect(is_id, acc, added)

    acc = jax.lax.fori_loop(0, BITS, step, acc)
    return g1_vec.tree_reduce(acc)


import functools as _functools


@_functools.partial(jax.jit, static_argnums=1)
def _shift_points(pts, k: int):
    """(24, m) x3 Montgomery points -> 2^k * each point (k doublings)."""
    return jax.lax.fori_loop(0, k, lambda _, p: g1_vec.pdouble(p), pts)


@jax.jit
def _msm_seg_kernel(txs, tys, scalars):
    """txs/tys: (S, 24, G, 256) affine tables, segment j holding subset
    sums of 2^(j*255/S)-shifted points; scalars: (16, 8G) raw 16-bit
    limbs. One double + S gathers + S mixed adds per iteration over a
    255/S-iteration Horner loop. Returns the (X, Y, Z) limb tuple (24,)."""
    S, _, G, _ = txs.shape
    seg = BITS // S
    shifts = jax.lax.broadcasted_iota(jnp.int32, (1, GROUP), 1)
    acc = g1_vec.pidentity((G,))

    def step(i, acc):
        acc = g1_vec.pdouble(acc)
        for j in range(S):  # static unroll: S is tiny (3 or 5)
            bit = j * seg + (seg - 1 - i)  # MSB-first within segment j
            limb = jax.lax.dynamic_index_in_dim(
                scalars, bit >> 4, axis=0, keepdims=False
            )
            b = (limb >> (bit & 15).astype(jnp.uint32)) & 1  # (8G,)
            bits8 = b.reshape(G, GROUP).astype(jnp.int32)
            idx = jnp.sum(bits8 << shifts, axis=-1)  # (G,) in [0, 256)
            gidx = idx[None, :, None]
            qx, qy = (
                jnp.take_along_axis(t[j], gidx, axis=2)[:, :, 0].astype(
                    jnp.uint32
                )
                for t in (txs, tys)
            )
            added = g1_vec.padd_mixed(acc, (qx, qy))
            is_id = limbs.is_zero(qx) & limbs.is_zero(qy)
            acc = g1_vec.pselect(is_id, acc, added)
        return acc

    acc = jax.lax.fori_loop(0, seg, step, acc)
    return g1_vec.tree_reduce(acc)


class FixedBaseTables:
    """Lazily-built, chunk-cached subset-sum tables for a fixed point set.

    ``cache_key`` (the SRS identity, protocol/setup.py) enables an npz
    disk cache per chunk: the tables are pure functions of (SRS chunk,
    layout version, segments, dtype), and the 2^20-SRS steady-state build
    is ~5.4 s/chunk x 64 chunks per process without it (PERFORMANCE.md) —
    the same reasoning as the SRS npz cache itself (setup.rs:32-37 is the
    commit precompute being amortized)."""

    def __init__(
        self,
        points_mont,
        chunk: int = CHUNK,
        segments: int | None = None,
        cache_key: str | None = None,
        lookup: str | None = None,
    ):
        self.px, self.py, self.pz = points_mont
        self.n = self.px.shape[-1]
        assert chunk % GROUP == 0 and (chunk // GROUP) & (chunk // GROUP - 1) == 0
        self.chunk = chunk
        self.segments = SEGMENTS if segments is None else segments
        assert BITS % self.segments == 0, "segments must divide 255"
        self.lookup = LOOKUP if lookup is None else lookup
        assert self.lookup in ("gather2", "gather1", "onehot")
        self.cache_key = cache_key if os.environ.get("BPT_FBT_CACHE", "1") == "1" else None
        self._tables: dict[int, tuple] = {}
        self._fmt_tables: dict[int, object] = {}

    def _cache_path(self, ci: int) -> str | None:
        if self.cache_key is None:
            return None
        from ..config import get_config

        u16 = 1 if TABLE_U16 else 0
        return os.path.join(
            get_config().srs_cache_dir,
            f"fbt-v1-{self.cache_key}-c{self.chunk}-s{self.segments}-u{u16}-{ci}.npz",
        )

    def _chunk_tables(self, ci: int):
        t = self._tables.get(ci)
        if t is not None:
            return t
        path = self._cache_path(ci)
        if path is not None and os.path.exists(path):
            import numpy as _np

            data = _np.load(path)
            t = (jnp.asarray(data["tx"]), jnp.asarray(data["ty"]))
            self._tables[ci] = t
            return t
        lo = ci * self.chunk
        hi = min(lo + self.chunk, self.n)
        px, py, pz = (c[:, lo:hi] for c in (self.px, self.py, self.pz))
        pad = self.chunk - (hi - lo)
        if pad:
            # pad with copies of the first point; padded lanes only ever
            # see zero scalar bits (scalars are zero-padded), contributing
            # the identity table entry
            px = jnp.concatenate([px, jnp.tile(px[:, :1], (1, pad))], axis=-1)
            py = jnp.concatenate([py, jnp.tile(py[:, :1], (1, pad))], axis=-1)
            pz = jnp.concatenate([pz, jnp.tile(pz[:, :1], (1, pad))], axis=-1)
        if self.segments == 1:
            # the build kernel runs all 256 combo lanes at once and OOMs
            # the compile above 2^14 points; tables are per-8-point-group
            # independent, so wider chunks assemble from BUILD_W-wide builds
            bw = BUILD_W
            if self.chunk > bw:
                parts = [
                    _build_tables(*(c[:, s : s + bw] for c in (px, py, pz)))
                    for s in range(0, self.chunk, bw)
                ]
                t = tuple(
                    jnp.concatenate([p[i] for p in parts], axis=1)
                    for i in (0, 1)
                )
            else:
                t = _build_tables(px, py, pz)
        else:
            seg = BITS // self.segments
            per_seg, pts = [], (px, py, pz)
            for j in range(self.segments):
                if j:
                    pts = _shift_points(pts, seg)  # 2^seg * previous set
                per_seg.append(_build_tables(*pts))
            t = tuple(jnp.stack([s[c] for s in per_seg]) for c in (0, 1))
        if path is not None:
            import numpy as _np

            os.makedirs(os.path.dirname(path), exist_ok=True)
            tmp = path + ".tmp.npz"
            _np.savez(
                tmp,
                tx=_np.asarray(jax.device_get(t[0])),
                ty=_np.asarray(jax.device_get(t[1])),
            )
            os.replace(tmp, path)
        self._tables[ci] = t
        return t

    def _chunk_tables_fmt(self, ci: int):
        """Per-lookup-strategy device layout of chunk ci's tables.

        The disk cache stays in the v1 (24, G, 256) x2 layout; gather1/
        onehot relayouts happen once per process per chunk on device (a
        transpose/concat, trivial next to the build)."""
        t = self._fmt_tables.get(ci)
        if t is not None:
            return t
        tx, ty = self._chunk_tables(ci)
        if self.lookup == "gather1":
            t = jnp.concatenate([tx, ty], axis=0)  # (48, G, 256)
        elif self.lookup == "onehot":
            t = jnp.swapaxes(jnp.concatenate([tx, ty], axis=0), 1, 2)  # (48, 256, G)
        else:
            t = (tx, ty)
        if self.lookup != "gather2":
            # the relayout is a COPY: drop the base-layout tables so chunk
            # HBM stays ~50 MB, not ~100 MB (keeping both doubled the
            # 2^20 SRS's table footprint to 6.6 GB and OOMed the chip);
            # anything needing the base layout re-reads the npz cache
            self._tables.pop(ci, None)
        self._fmt_tables[ci] = t
        return t

    def msm(self, scalars_raw):
        """MSM of the first k points against scalars_raw (16, k), k <= n.
        Returns the (X, Y, Z) limb tuple (24,)."""
        k = scalars_raw.shape[-1]
        assert k <= self.n
        if k == 0:
            return g1_vec.pidentity(())
        nchunks = (k + self.chunk - 1) // self.chunk
        parts = []
        for ci in range(nchunks):
            lo = ci * self.chunk
            hi = min(lo + self.chunk, k)
            sc = scalars_raw[:, lo:hi]
            if hi - lo < self.chunk:
                sc = jnp.concatenate(
                    [sc, jnp.zeros((16, self.chunk - (hi - lo)), dtype=jnp.uint32)],
                    axis=-1,
                )
            if self.segments == 1:
                from ..config import get_config

                if get_config().msm_algorithm == "pallas-fixed":
                    # fused VMEM-resident Horner loop (BPT_MSM=pallas-fixed)
                    from . import pallas_kernels

                    tx, ty = self._chunk_tables(ci)
                    parts.append(pallas_kernels.msm_fixed_pallas(tx, ty, sc))
                elif self.lookup == "gather1":
                    parts.append(_msm_fixed_kernel_i(self._chunk_tables_fmt(ci), sc))
                elif self.lookup == "onehot":
                    parts.append(_msm_fixed_kernel_oh(self._chunk_tables_fmt(ci), sc))
                else:
                    parts.append(_msm_fixed_kernel(*self._chunk_tables_fmt(ci), sc))
            else:
                tx, ty = self._chunk_tables(ci)
                parts.append(_msm_seg_kernel(tx, ty, sc))
        if len(parts) == 1:
            return parts[0]
        stacked = tuple(
            jnp.stack([p[j] for p in parts], axis=-1) for j in range(3)
        )
        return _combine_partials(stacked)


def tables_for_setup(setup, chunk: int | None = None) -> FixedBaseTables:
    """Per-setup cached FixedBaseTables over the device SRS."""
    tabs = getattr(setup, "_fb_tables", None)
    if tabs is None:
        if setup._tpu_cache is None:
            from . import g1_vec as gv

            setup._tpu_cache = gv.points_to_device(setup.powers_of_x)
        if chunk is None:
            n = setup._tpu_cache[0].shape[-1]
            c = GROUP
            while c < min(n, CHUNK):
                c <<= 1
            chunk = c
        tabs = FixedBaseTables(
            setup._tpu_cache, chunk=chunk, cache_key=getattr(setup, "cache_key", None)
        )
        setup._fb_tables = tabs
    return tabs
