"""Pallas TPU kernel for the haplotype vote scan.

The scan (edgeConnectResult, PhasingGraph.cpp:286-474) is a true sequential
dependency, but only the *direction* of each cast vote depends on the carry
(the per-site haplotype decision). Everything else — edge-similarity
rejection, vote weights, Onelongcase eligibility, small-total counters — is
carry-independent, so it is precomputed as dense [S, W] planes in plain XLA
(`precompute_vote_bands`) and the kernel reduces to a tight 128-lane ring
recurrence:

  per step t:  consume lane 0 of the vote ring -> decide hp/block,
               cast sign-resolved votes into lanes d-1 (d = 1..W),
               shift the ring left by one lane (static pltpu.roll).

VMEM footprint: 7 planes x S x 128 x 4B (~14 MB at S=4096) + a (8, 128)
ring scratch. All shifts are static; no gathers, no dynamic lane indexing —
the shape Mosaic compiles well.

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


def precompute_vote_bands(counts_hi, counts_lo, vtype, vtype_band, valid_band,
                          edge_threshold_x10: float):
    """Carry-independent per-(site, band-slot) planes, padded to 128 lanes.

    Returns int32 [S, 128] planes: conn_ok, weight, small (counter votes),
    elig (Onelongcase eligibility), same (ref-allele-same-haplotype).
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

    small = conn_ok & (total <= 10)
    elig = conn_ok & (total > 10) & (5 * mn < mx) & (weight >= 10) & \
        (vt != T_INDEL)
    same = s_para > s_cross

    def pad(x):
        return jnp.pad(x.astype(I32), ((0, 0), (0, LANES - W)))

    return (pad(conn_ok), pad(weight), pad(small), pad(elig), pad(same))


def _scan_kernel(conn_ref, weight_ref, small_ref, elig_ref, same_ref,
                 gap_ref, scal_in_ref, ring_in_ref, out_ref, ring_out_ref,
                 scal_out_ref, ring, *, S: int, distance: int):
    """Sequential ring recurrence. ``ring`` rows: 0 h1, 1 h2, 2 counter,
    3 onelong-h1, 4 onelong-h2. Outputs: out[t] = (assigned, hp, bstart).

    Carry-chained: ``scal_in`` = (t0, last_connect, block_start, 0) in
    GLOBAL ranks plus the incoming vote ring, so a long site axis can run
    as a sequence of VMEM-sized blocks (the blocked wrapper below) —
    bstart outputs are global ranks either way (t0 = 0 when unblocked)."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    ring[...] = ring_in_ref[...]
    t0 = scal_in_ref[0]
    lane0 = (jax.lax.broadcasted_iota(I32, (1, LANES), 1) == 0).astype(I32)
    keep_last = jnp.where(
        jax.lax.broadcasted_iota(I32, (8, LANES), 1) == LANES - 1, 0, 1)

    def step(t, carry):
        last_connect, block_start = carry
        tg = t + t0  # global site rank

        # ---- consume lane 0 (site t) ---------------------------------
        h1 = jnp.sum(ring[0:1, :] * lane0)
        h2 = jnp.sum(ring[1:2, :] * lane0)
        cnt = jnp.sum(ring[2:3, :] * lane0)
        oh1 = jnp.sum(ring[3:4, :] * lane0)
        oh2 = jnp.sum(ring[4:5, :] * lane0)
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

        # ---- cast votes (lane d-1 targets site t+d) ------------------
        conn = conn_ref[pl.ds(t, 1), :] * assigned.astype(I32)
        samev = same_ref[pl.ds(t, 1), :]
        mapped1 = jnp.where(hp == 1, samev, 1 - samev)
        w = weight_ref[pl.ds(t, 1), :]
        add_h1 = conn * mapped1 * w
        add_h2 = conn * (1 - mapped1) * w
        add_cnt = small_ref[pl.ds(t, 1), :] * assigned.astype(I32)
        elig = elig_ref[pl.ds(t, 1), :] * assigned.astype(I32)
        add_w1 = elig * mapped1 * w
        add_w2 = elig * (1 - mapped1) * w

        d_plus1 = jax.lax.broadcasted_iota(I32, (1, LANES), 1) + 1
        d_max = jnp.max(jnp.where(conn > 0, d_plus1, 0))
        last_connect = jnp.where(d_max > 0, tg + d_max, last_connect)

        # ---- shift ring left, then add the new votes -----------------
        shifted = pltpu.roll(ring[...], shift=LANES - 1, axis=1) * keep_last
        adds = jnp.concatenate(
            [add_h1, add_h2, add_cnt, add_w1, add_w2,
             jnp.zeros((3, LANES), I32)], axis=0)
        ring[...] = shifted + adds

        lanes = jax.lax.broadcasted_iota(I32, (1, LANES), 1)
        row = jnp.where(lanes == 0, assigned.astype(I32),
                        jnp.where(lanes == 1, hp,
                                  jnp.where(lanes == 2, bstart_out, 0)))
        out_ref[pl.ds(t, 1), :] = row
        return (last_connect, block_start)

    lc, bs = jax.lax.fori_loop(0, S, step,
                               (scal_in_ref[1], scal_in_ref[2]))
    ring_out_ref[...] = ring[...]
    scal_out_ref[0] = lc
    scal_out_ref[1] = bs
    scal_out_ref[2] = jnp.int32(0)
    scal_out_ref[3] = jnp.int32(0)


def _pallas_block_call(conn, weight, small, elig, same, gap, scal, ring,
                       Sb: int, distance: int, interpret: bool):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    return pl.pallas_call(
        partial(_scan_kernel, S=Sb, distance=distance),
        out_shape=[jax.ShapeDtypeStruct((Sb, LANES), I32),
                   jax.ShapeDtypeStruct((8, LANES), I32),
                   jax.ShapeDtypeStruct((4,), I32)],
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 5
        + [pl.BlockSpec(memory_space=pltpu.SMEM),
           pl.BlockSpec(memory_space=pltpu.SMEM),
           pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                   pl.BlockSpec(memory_space=pltpu.VMEM),
                   pl.BlockSpec(memory_space=pltpu.SMEM)],
        scratch_shapes=[pltpu.VMEM((8, LANES), I32)],
        interpret=interpret,
    )(conn, weight, small, elig, same, gap, scal, ring)


def pallas_block_size() -> int:
    """Sites per Pallas block. The kernel holds 7 [Sb, 128] i32 planes in
    VMEM (~3.5 MB per 1024 sites); 8192 (~28 MB) leaves headroom under the
    ~128 MB v5e VMEM. Chromosomes beyond this run as a carry-chained block
    sequence (one jit, lax.scan over blocks)."""
    import os

    return int(os.environ.get("LPS_PALLAS_BLOCK", "8192"))


def vote_scan_pallas(counts_hi, counts_lo, gap, vtype, vtype_band, valid_band,
                     window: int, distance: int, edge_threshold_x10: float,
                     interpret: bool = False):
    """Pallas engine with the same contract as ops.vote_scan.vote_scan_core:
    returns (assigned bool[S], hp int32[S], bstart int32[S]).

    S beyond the VMEM block budget runs as a carry-chained sequence of
    blocks (the scan is sequential anyway — blocking adds only per-block
    launch overhead, element-exact vs the single-shot kernel)."""
    S = counts_hi.shape[0]
    conn, weight, small, elig, same = precompute_vote_bands(
        counts_hi, counts_lo, vtype, vtype_band, valid_band,
        edge_threshold_x10)
    gap = gap.astype(I32)
    zero_scal = jnp.array([0, -1, -1, 0], I32)
    zero_ring = jnp.zeros((8, LANES), I32)

    blk = pallas_block_size()
    if S <= blk:
        out, _ring, _scal = _pallas_block_call(
            conn, weight, small, elig, same, gap, zero_scal, zero_ring,
            Sb=S, distance=distance, interpret=interpret)
        return out[:, 0].astype(bool), out[:, 1], out[:, 2]

    if S % blk:
        raise ValueError(f"S={S} not a multiple of block {blk}")
    B = S // blk

    def body(carry, xs):
        ring, lc_bs = carry
        conn_b, w_b, sm_b, el_b, sa_b, gap_b, t0 = xs
        scal = jnp.concatenate([t0[None], lc_bs, jnp.zeros(1, I32)])
        out, ring2, scal2 = _pallas_block_call(
            conn_b, w_b, sm_b, el_b, sa_b, gap_b, scal, ring,
            Sb=blk, distance=distance, interpret=interpret)
        return (ring2, scal2[:2]), out

    t0s = (jnp.arange(B, dtype=I32) * blk)
    xs = (conn.reshape(B, blk, LANES), weight.reshape(B, blk, LANES),
          small.reshape(B, blk, LANES), elig.reshape(B, blk, LANES),
          same.reshape(B, blk, LANES), gap.reshape(B, blk), t0s)
    (_ring, _lc_bs), outs = jax.lax.scan(
        body, (zero_ring, jnp.array([-1, -1], I32)), xs)
    out = outs.reshape(S, LANES)
    return out[:, 0].astype(bool), out[:, 1], out[:, 2]



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
