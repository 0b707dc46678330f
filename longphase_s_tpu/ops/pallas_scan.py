"""Pallas TPU kernel for the haplotype vote scan.

The scan (edgeConnectResult, PhasingGraph.cpp:286-474) is a true sequential
dependency, but only the *direction* of each cast vote depends on the carry
(the per-site haplotype decision). Everything else — edge-similarity
rejection, vote weights, Onelongcase eligibility, small-total counters — is
carry-independent, so it is folded into ONE bit-packed precomputed vote
plane in plain XLA (`precompute_vote_planes`): rows 0-1 hold the ring
increment if the site decides hp == 1 (packed votes h1:16|h2:16 and packed
special oh1:13|oh2:13|cnt:6), rows 2-3 the field-swapped hp == 2 image
(selected in-kernel by one sublane roll).

The kernel processes UNROLL (=8) sites per loop iteration: every in-group
site reads its carry base from ring lane i BEFORE the group's single ring
update, applies the missing votes from in-group predecessors on the scalar
unit (parked at a fixed lane by an XLA-side per-phase pre-roll), and only
then does one U-lane ring roll + per-site sublane-roll select + one mask
multiply. That keeps the serial critical path to ~2 lane reads + ~15
scalar ALU ops per site, with the VPU work enjoying U sites of slack —
measured 526 -> 242 us per 4096-site block on v5e across the r5 rewrites
(scalar-row packing, 2-site, then 8-site unroll). Skip-distance and the
max-connected-offset feeding the ``last_connect`` carry are packed into
one SMEM word per site. VMEM: one packed plane x Sb x 4 KB (~16 MB at
the 4096-site default block); longer site axes run as a carry-chained
block sequence.

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
    """Carry-independent vote planes, bit-packed to minimize the kernel's
    per-step scalar extractions (the measured critical path: a VMEM lane
    read costs ~20 cycles, so five per step dominated the old kernel).

    Returns (plane [S, 8, 128] i32, dmax [S] i32). Plane sublanes:

      row 0: hp==1 increment, votes   (h1 << 16) | h2
      row 1: hp==1 increment, special (oh1 << 19) | (oh2 << 6) | cnt
      row 2: hp==2 increment, votes   (h2 << 16) | h1
      row 3: hp==2 increment, special (oh2 << 19) | (oh1 << 6) | cnt
      rows 4-7: zero

    Field widths are safe by construction: each accumulated field sums at
    most W=35 caster contributions of weight <= 200 (x10 scale), i.e.
    <= 7000 < 2^13 for the 13-bit oh fields and < 2^16 for the vote
    fields; cnt sums 0/1 flags, <= 35 < 2^6. The hp==2 rows are the
    field-swapped image, so the kernel selects them with one sublane roll
    instead of a second 16 MB plane tensor (VMEM halved; the additive
    ring recurrence never carries across field boundaries).
    """
    ch = counts_hi.astype(I32)
    cl = counts_lo.astype(I32)
    rr = ch[..., 0] * 10 + cl[..., 0]
    ra = ch[..., 1] * 10 + cl[..., 1]
    ar = ch[..., 2] * 10 + cl[..., 2]
    aa = ch[..., 3] * 10 + cl[..., 3]
    return planes_from_pc(rr + aa, ra + ar, vtype, vtype_band, valid_band,
                          edge_threshold_x10)


def planes_from_pc(s_para, s_cross, vtype, vtype_band, valid_band,
                   edge_threshold_x10: float):
    """Vote planes from the x10-scaled parallel/cross pair sums [S, W] i32
    directly — the vote logic only ever consumes (rr+aa) and (ra+ar), so
    callers that can produce these two arrays cheaply (the MXU pack's
    sum/difference Gram trick, ops/mxu_pack.mxu_pc_counts) skip the 4-combo
    count planes entirely."""
    S, W = s_para.shape
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
    votes1 = (v1 << 16) | v2
    votes2 = (v2 << 16) | v1
    spec1 = (e1 << 19) | (e2 << 6) | small
    spec2 = (e2 << 19) | (e1 << 6) | small
    zero = jnp.zeros_like(v1)
    plane = jnp.stack([votes1, spec1, votes2, spec2,
                       zero, zero, zero, zero], axis=1)
    plane = jnp.pad(plane, ((0, 0), (0, 0), (0, LANES - W)))

    d_plus1 = jnp.arange(1, W + 1, dtype=I32)[None, :]
    dmax = jnp.max(jnp.where(conn_ok, d_plus1, 0), axis=1).astype(I32)
    return plane, dmax


def _decide(rA, rB, tg, sdm, last_connect, block_start):
    """Scalar-unit decision for one site from its two packed carries and
    its packed (dmax << 1 | skip_distance) word. Returns
    (hp, assigned_i32, out_word, last_connect', block_start')."""
    h1 = jax.lax.shift_right_logical(rA, 16)
    h2 = rA & 0xFFFF
    oh1 = jax.lax.shift_right_logical(rB, 19)
    oh2 = jax.lax.shift_right_logical(rB, 6) & 0x1FFF
    cnt = rB & 0x3F
    use_special = (cnt > 3) & jnp.logical_not((oh1 == 0) & (oh2 == 0))
    H1 = jnp.where(use_special, oh1, h1)
    H2 = jnp.where(use_special, oh2, h2)

    skip_distance = (sdm & 1) == 1
    eq = H1 == H2
    skip_connected = eq & (tg < last_connect)
    new_block = eq & jnp.logical_not(skip_connected) & \
        jnp.logical_not(skip_distance)
    assigned = jnp.logical_not(skip_distance) & \
        jnp.logical_not(skip_connected)
    hp = jnp.where(eq, 1, jnp.where(H1 > H2, 1, 2)).astype(I32)
    block_start = jnp.where(new_block, tg, block_start)
    bstart_out = jnp.where(assigned, block_start, -1)
    dmax = jax.lax.shift_right_logical(sdm, 1)
    last_connect = jnp.where(assigned & (dmax > 0), tg + dmax, last_connect)
    ai = assigned.astype(I32)
    out = (bstart_out + 1) * 8 + hp * 2 + ai
    return hp, ai, out, last_connect, block_start


UNROLL = 8  # sites per kernel loop iteration (ring updates once per group)


def _scan_kernel(p_ref, sdm_ref, scal_in_ref, ring_in_ref,
                 out_ref, ring_out_ref, scal_out_ref, ring, *, S: int):
    """Sequential ring recurrence over the bit-packed plane layout,
    UNROLL sites per loop iteration. ``ring`` row 0 = packed votes
    (h1:16 | h2:16), row 1 = packed special (oh1:13 | oh2:13 | cnt:6);
    rows 6-7 accumulate the unread image of the sublane-rolled hp==2
    selection (never consumed). out[t] packs (bstart+1) * 8 + hp * 2 +
    assigned into one SMEM scalar.

    Per-step critical path is the scalar decide chain: two lane reads per
    site (the 5-row layout's five were the measured bottleneck at ~20
    cycles each), bit-field unpack on the scalar unit. The group unroll
    keeps the vector work (one U-lane roll + one sublane-roll select per
    site + one mask multiply per group) off the serial chain: in-group
    site i reads its base from ring lane i BEFORE the update, and the
    missing votes from in-group predecessors are applied on the scalar
    unit. The XLA-side pre-roll (phase shift U-1-i lanes, see
    vote_scan_pallas) parks every predecessor contribution TO site i at
    the same lane, 128-(U-i): plane_j original lane k (offset d = k+1)
    lands at k - (U-1-j); for d = i-j that is i-U mod 128, independent
    of j. So the group's vector update only has to land before the NEXT
    group's lane reads — U sites of slack for the VPU pipeline.

    Carry-chained: ``scal_in`` = (t0, last_connect, block_start, 0) in
    GLOBAL ranks plus the incoming vote ring, so a long site axis can run
    as a sequence of VMEM-sized blocks (the blocked wrapper below) —
    bstart outputs are global ranks either way (t0 = 0 when unblocked).
    The final ring state is bit-identical to the single-site recurrence
    (the group update telescopes U rolls; wrapped lanes >= 128-U are
    re-zeroed by one mask), so blocks chain exactly."""
    from jax.experimental.pallas import tpu as pltpu

    U = UNROLL
    ring[...] = ring_in_ref[...]
    t0 = scal_in_ref[0]
    # zero the U wrapped lanes of the group roll (old lanes 0..U-1)
    keepU = jnp.where(
        jax.lax.broadcasted_iota(I32, (8, LANES), 1) >= LANES - U, 0, 1)

    def step(u, carry):
        last_connect, block_start = carry
        t = U * u
        planes = [p_ref[t + i] for i in range(U)]

        hps, ais, outs = [], [], []
        for i in range(U):
            rA = ring[0, i]
            rB = ring[1, i]
            # votes from in-group predecessors j < i, parked at lane
            # 128-(U-i) of each pre-rolled plane_j (early-issuable loads)
            for j in range(i):
                lane = LANES - (U - i)
                cA = jnp.where(hps[j] == 1, planes[j][0, lane],
                               planes[j][2, lane]) * ais[j]
                cB = jnp.where(hps[j] == 1, planes[j][1, lane],
                               planes[j][3, lane]) * ais[j]
                rA = rA + cA
                rB = rB + cB
            hp_i, a_i, out_i, last_connect, block_start = _decide(
                rA, rB, t + i + t0, sdm_ref[t + i], last_connect,
                block_start)
            hps.append(hp_i)
            ais.append(a_i)
            outs.append(out_i)

        # ---- one ring update for the group ----------------------------
        acc = pltpu.roll(ring[...], shift=LANES - U, axis=1)
        for i in range(U):
            sel = jnp.where(hps[i] == 1, planes[i],
                            pltpu.roll(planes[i], shift=6, axis=0))
            acc = acc + sel * ais[i]
        ring[...] = acc * keepU

        for i in range(U):
            out_ref[t + i] = outs[i]
        return (last_connect, block_start)

    lc, bs = jax.lax.fori_loop(0, S // U, step,
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


def _pallas_block_call(p, sdm, scal, ring, Sb: int, interpret: bool):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    return pl.pallas_call(
        partial(_scan_kernel, S=Sb),
        out_shape=[jax.ShapeDtypeStruct((Sb,), I32),
                   jax.ShapeDtypeStruct((8, LANES), I32),
                   jax.ShapeDtypeStruct((4,), I32)],
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.SMEM),
                  pl.BlockSpec(memory_space=pltpu.SMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
                   pl.BlockSpec(memory_space=pltpu.VMEM),
                   pl.BlockSpec(memory_space=pltpu.SMEM)],
        scratch_shapes=[pltpu.VMEM((8, LANES), I32)],
        interpret=interpret,
    )(p, sdm, scal, ring)


def _prep_plane(p, gap, dmax, distance: int):
    """XLA-side kernel prep: pre-roll each site's plane left by
    (UNROLL-1 - phase) lanes, where phase = site mod UNROLL — this parks
    every in-group predecessor contribution to site i at lane 128-(U-i)
    for the kernel's scalar pickup — and pack (dmax << 1 | gap > distance)
    into one SMEM word per site. Sites are padded to a multiple of UNROLL
    (dummy sites: zero plane, skip_distance set, so they never assign)."""
    U = UNROLL
    S = p.shape[0]
    if S % U:
        padn = U - S % U
        p = jnp.concatenate([p, jnp.zeros((padn, 8, LANES), I32)])
        gap = jnp.concatenate([gap, jnp.full((padn,), distance + 1, I32)])
        dmax = jnp.concatenate([dmax, jnp.zeros((padn,), I32)])
        S += padn
    pp = p.reshape(S // U, U, 8, LANES)
    rolled = [jnp.roll(pp[:, i], shift=-(U - 1 - i), axis=-1)
              for i in range(U)]
    p = jnp.stack(rolled, axis=1).reshape(S, 8, LANES)
    sdm = (dmax << 1) | (gap > distance).astype(I32)
    return p, sdm, S


def pallas_block_size() -> int:
    """Sites per Pallas block. The kernel holds one bit-packed [Sb, 8, 128]
    i32 vote plane in VMEM (4 KB per site, ~16 MB at 4096); chromosomes
    beyond this run as a carry-chained block sequence (one jit, lax.scan
    over blocks)."""
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
    p, dmax = precompute_vote_planes(
        counts_hi, counts_lo, vtype, vtype_band, valid_band,
        edge_threshold_x10)
    return _scan_from_planes(p, dmax, gap, distance, interpret)


def vote_scan_pallas_pc(s_para10, s_cross10, gap, vtype, vtype_band,
                        valid_band, window: int, distance: int,
                        edge_threshold_x10: float, interpret: bool = False):
    """vote_scan_pallas from the x10 parallel/cross pair sums [S, W]
    (ops/mxu_pack.mxu_pc_counts) — skips the 4-combo count planes."""
    p, dmax = planes_from_pc(s_para10, s_cross10, vtype, vtype_band,
                             valid_band, edge_threshold_x10)
    return _scan_from_planes(p, dmax, gap, distance, interpret)


def _scan_from_planes(p, dmax, gap, distance: int, interpret: bool):
    S = p.shape[0]
    gap = gap.astype(I32)
    zero_scal = jnp.array([0, -1, -1, 0], I32)
    zero_ring = jnp.zeros((8, LANES), I32)

    blk = pallas_block_size()
    if S <= blk:
        pk, sdm, Sb = _prep_plane(p, gap, dmax, distance)
        out, _ring, _scal = _pallas_block_call(
            pk, sdm, zero_scal, zero_ring, Sb=Sb, interpret=interpret)
        return _unpack(out[:S])

    if S % blk:
        raise ValueError(f"S={S} not a multiple of block {blk}")
    B = S // blk
    pk, sdm, _ = _prep_plane(p, gap, dmax, distance)  # blk is even

    def body(carry, xs):
        ring, lc_bs = carry
        p_b, sdm_b, t0 = xs
        scal = jnp.concatenate([t0[None], lc_bs, jnp.zeros(1, I32)])
        out, ring2, scal2 = _pallas_block_call(
            p_b, sdm_b, scal, ring, Sb=blk, interpret=interpret)
        return (ring2, scal2[:2]), out

    t0s = (jnp.arange(B, dtype=I32) * blk)
    xs = (pk.reshape(B, blk, 8, LANES), sdm.reshape(B, blk), t0s)
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
