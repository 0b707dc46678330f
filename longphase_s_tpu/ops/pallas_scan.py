"""Pallas TPU kernel for the haplotype vote scan.

The scan (edgeConnectResult, PhasingGraph.cpp:286-474) is a true sequential
dependency, but only the *direction* of each cast vote depends on the carry
(the per-site haplotype decision). Everything else — edge-similarity
rejection, vote weights, Onelongcase eligibility, small-total counters — is
carry-independent, so it is folded into TWO precomputed vote planes in plain
XLA (`precompute_vote_planes`):

  plane1[t] = the (8, 128) ring increment if site t decides hp == 1
  plane2[t] = the same increment if site t decides hp == 2
              (rows: h1 votes, h2 votes, small-total counter,
               onelong h1, onelong h2, 3 zero rows)

which reduces the kernel's sequential step to its bare critical path:

  per step t:  read the 5 carry scalars from ring lane 0,
               decide hp/block (scalar unit),
               ring = roll(ring) * keep_last + select(hp, plane1, plane2),
               store one packed scalar to SMEM out.

Two (8, 128) tile loads + ~5 vector ops + scalar logic per step — no
masked reductions, no per-step row composes; the max-connected-offset
needed for the ``last_connect`` carry is precomputed per site
(`dmax`, SMEM). VMEM: 2 planes x Sb x 4 KB (~32 MB at the 4096-site
default block); longer site axes run as a carry-chained block sequence.

Numerics are the same exact ×10 integer arithmetic as ops/vote_scan.py; the
interpret-mode test proves element equality against the lax.scan engine.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..core.phase_algo import T_DANGER, T_INDEL, T_MOD, T_SNP

I32 = jnp.int32
LANES = 128


def precompute_vote_planes(counts_hi, counts_lo, vtype, vtype_band,
                           valid_band, edge_threshold_x10: float):
    """Carry-independent vote planes, padded to 128 lanes.

    Returns (plane1 [S, 8, 128] i32, plane2 [S, 8, 128] i32,
    dmax [S] i32) where plane{1,2} are the full ring increments for a
    site that decides hp 1/2 and dmax is the largest connected band
    offset (0 when none), feeding the last_connect carry.
    """
    S, W, _ = counts_hi.shape
    ch = counts_hi.astype(I32)
    cl = counts_lo.astype(I32)
    rr = ch[..., 0] * 10 + cl[..., 0]
    ra = ch[..., 1] * 10 + cl[..., 1]
    ar = ch[..., 2] * 10 + cl[..., 2]
    aa = ch[..., 3] * 10 + cl[..., 3]
    s_para = rr + aa
    s_cross = ra + ar
    total = s_para + s_cross
    mn = jnp.minimum(s_para, s_cross)
    mx = jnp.maximum(s_para, s_cross)

    vt = vtype.astype(I32)[:, None]
    tvt = vtype_band.astype(I32)
    modsnp = ((vt == T_SNP) & (tvt == T_MOD)) | ((vt == T_MOD) & (tvt == T_SNP))
    thr10 = jnp.where(modsnp, jnp.where(total < 10, -10.0, 3.0),
                      edge_threshold_x10)
    esr_reject = (mx > 0) & (10.0 * mn.astype(jnp.float32)
                             > thr10 * mx.astype(jnp.float32))
    decided = s_para != s_cross
    conn_ok = decided & jnp.logical_not(esr_reject) & valid_band

    big = ((10 * mn <= mx) & (total >= 10)) | \
          ((s_para < 10) & (s_cross >= 10)) | ((s_para >= 10) & (s_cross < 10))
    weight = jnp.where(big, 200, 10).astype(I32)
    weight = jnp.where(vt == T_DANGER, 1, weight)

    conn = conn_ok.astype(I32)
    small = (conn_ok & (total <= 10)).astype(I32)
    elig = (conn_ok & (total > 10) & (5 * mn < mx) & (weight >= 10) &
            (vt != T_INDEL)).astype(I32)
    same = (s_para > s_cross).astype(I32)
    diff = 1 - same

    v1 = conn * weight * same      # h1 votes when caster decides hp == 1
    v2 = conn * weight * diff
    e1 = elig * weight * same
    e2 = elig * weight * diff
    zero = jnp.zeros_like(v1)
    plane1 = jnp.stack([v1, v2, small, e1, e2, zero, zero, zero], axis=1)
    plane2 = jnp.stack([v2, v1, small, e2, e1, zero, zero, zero], axis=1)
    plane1 = jnp.pad(plane1, ((0, 0), (0, 0), (0, LANES - W)))
    plane2 = jnp.pad(plane2, ((0, 0), (0, 0), (0, LANES - W)))

    d_plus1 = jnp.arange(1, W + 1, dtype=I32)[None, :]
    dmax = jnp.max(jnp.where(conn_ok, d_plus1, 0), axis=1).astype(I32)
    return plane1, plane2, dmax


def _scan_kernel(p1_ref, p2_ref, gap_ref, dmax_ref, scal_in_ref, ring_in_ref,
                 out_ref, ring_out_ref, scal_out_ref, ring, *, S: int,
                 distance: int):
    """Sequential ring recurrence. ``ring`` rows: 0 h1, 1 h2, 2 counter,
    3 onelong-h1, 4 onelong-h2. out[t] packs (bstart+1) * 8 + hp * 2 +
    assigned into one SMEM scalar.

    Carry-chained: ``scal_in`` = (t0, last_connect, block_start, 0) in
    GLOBAL ranks plus the incoming vote ring, so a long site axis can run
    as a sequence of VMEM-sized blocks (the blocked wrapper below) —
    bstart outputs are global ranks either way (t0 = 0 when unblocked)."""
    from jax.experimental.pallas import tpu as pltpu

    ring[...] = ring_in_ref[...]
    t0 = scal_in_ref[0]
    keep_last = jnp.where(
        jax.lax.broadcasted_iota(I32, (8, LANES), 1) == LANES - 1, 0, 1)

    def step(t, carry):
        last_connect, block_start = carry
        tg = t + t0  # global site rank

        # ---- consume lane 0 (site t's accumulated votes) --------------
        h1 = ring[0, 0]
        h2 = ring[1, 0]
        cnt = ring[2, 0]
        oh1 = ring[3, 0]
        oh2 = ring[4, 0]
        use_special = (cnt > 3) & jnp.logical_not((oh1 == 0) & (oh2 == 0))
        H1 = jnp.where(use_special, oh1, h1)
        H2 = jnp.where(use_special, oh2, h2)

        g = gap_ref[t]
        skip_distance = g > distance
        eq = H1 == H2
        skip_connected = eq & (tg < last_connect)
        new_block = eq & jnp.logical_not(skip_connected) & \
            jnp.logical_not(skip_distance)
        assigned = jnp.logical_not(skip_distance) & \
            jnp.logical_not(skip_connected)
        hp = jnp.where(eq, 1, jnp.where(H1 > H2, 1, 2)).astype(I32)
        block_start = jnp.where(new_block, tg, block_start)
        bstart_out = jnp.where(assigned, block_start, -1)

        # ---- shift ring, add this site's sign-resolved votes ----------
        plane = jnp.where(hp == 1, p1_ref[t], p2_ref[t])
        shifted = pltpu.roll(ring[...], shift=LANES - 1, axis=1) * keep_last
        ring[...] = shifted + plane * assigned.astype(I32)

        dmax = dmax_ref[t]
        last_connect = jnp.where(assigned & (dmax > 0), tg + dmax,
                                 last_connect)

        out_ref[t] = (bstart_out + 1) * 8 + hp * 2 + assigned.astype(I32)
        return (last_connect, block_start)

    lc, bs = jax.lax.fori_loop(0, S, step,
                               (scal_in_ref[1], scal_in_ref[2]))
    ring_out_ref[...] = ring[...]
    scal_out_ref[0] = lc
    scal_out_ref[1] = bs
    scal_out_ref[2] = jnp.int32(0)
    scal_out_ref[3] = jnp.int32(0)


def _unpack(out):
    assigned = (out & 1).astype(bool)
    hp = (out >> 1) & 3
    bstart = (out >> 3) - 1
    return assigned, hp, bstart


def _pallas_block_call(p1, p2, gap, dmax, scal, ring, Sb: int, distance: int,
                       interpret: bool):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    return pl.pallas_call(
        partial(_scan_kernel, S=Sb, distance=distance),
        out_shape=[jax.ShapeDtypeStruct((Sb,), I32),
                   jax.ShapeDtypeStruct((8, LANES), I32),
                   jax.ShapeDtypeStruct((4,), I32)],
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.SMEM),
                  pl.BlockSpec(memory_space=pltpu.SMEM),
                  pl.BlockSpec(memory_space=pltpu.SMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
                   pl.BlockSpec(memory_space=pltpu.VMEM),
                   pl.BlockSpec(memory_space=pltpu.SMEM)],
        scratch_shapes=[pltpu.VMEM((8, LANES), I32)],
        interpret=interpret,
    )(p1, p2, gap, dmax, scal, ring)


def pallas_block_size() -> int:
    """Sites per Pallas block. The kernel holds two [Sb, 8, 128] i32 vote
    planes in VMEM (~8 KB per site, ~32 MB at 4096); chromosomes beyond
    this run as a carry-chained block sequence (one jit, lax.scan over
    blocks)."""
    import os

    return int(os.environ.get("LPS_PALLAS_BLOCK", "4096"))


def vote_scan_pallas(counts_hi, counts_lo, gap, vtype, vtype_band, valid_band,
                     window: int, distance: int, edge_threshold_x10: float,
                     interpret: bool = False):
    """Pallas engine with the same contract as ops.vote_scan.vote_scan_core:
    returns (assigned bool[S], hp int32[S], bstart int32[S]).

    S beyond the VMEM block budget runs as a carry-chained sequence of
    blocks (the scan is sequential anyway — blocking adds only per-block
    launch overhead, element-exact vs the single-shot kernel)."""
    S = counts_hi.shape[0]
    p1, p2, dmax = precompute_vote_planes(
        counts_hi, counts_lo, vtype, vtype_band, valid_band,
        edge_threshold_x10)
    gap = gap.astype(I32)
    zero_scal = jnp.array([0, -1, -1, 0], I32)
    zero_ring = jnp.zeros((8, LANES), I32)

    blk = pallas_block_size()
    if S <= blk:
        out, _ring, _scal = _pallas_block_call(
            p1, p2, gap, dmax, zero_scal, zero_ring,
            Sb=S, distance=distance, interpret=interpret)
        return _unpack(out)

    if S % blk:
        raise ValueError(f"S={S} not a multiple of block {blk}")
    B = S // blk

    def body(carry, xs):
        ring, lc_bs = carry
        p1_b, p2_b, gap_b, dmax_b, t0 = xs
        scal = jnp.concatenate([t0[None], lc_bs, jnp.zeros(1, I32)])
        out, ring2, scal2 = _pallas_block_call(
            p1_b, p2_b, gap_b, dmax_b, scal, ring,
            Sb=blk, distance=distance, interpret=interpret)
        return (ring2, scal2[:2]), out

    t0s = (jnp.arange(B, dtype=I32) * blk)
    xs = (p1.reshape(B, blk, 8, LANES), p2.reshape(B, blk, 8, LANES),
          gap.reshape(B, blk), dmax.reshape(B, blk), t0s)
    (_ring, _lc_bs), outs = jax.lax.scan(
        body, (zero_ring, jnp.array([-1, -1], I32)), xs)
    return _unpack(outs.reshape(S))



vote_scan_pallas_jit = jax.jit(
    vote_scan_pallas,
    static_argnames=("window", "distance", "edge_threshold_x10", "interpret"))


def _vote_scan_pallas_packed(counts_hi16, counts_lo16, gap, vtype, vtype_band,
                             valid_band, window, distance, edge_threshold_x10):
    """Tunnel-friendly entry: int16 count upload, one (S, 3) download."""
    assigned, hp, bstart = vote_scan_pallas(
        counts_hi16.astype(I32), counts_lo16.astype(I32), gap, vtype,
        vtype_band, valid_band, window=window, distance=distance,
        edge_threshold_x10=edge_threshold_x10)
    return jnp.stack([assigned.astype(I32), hp, bstart])


vote_scan_pallas_packed_jit = jax.jit(
    _vote_scan_pallas_packed,
    static_argnames=("window", "distance", "edge_threshold_x10"))
