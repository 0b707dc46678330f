"""Fused pair-packing + vote scan on device.

The classic path materializes the banded pair counts [S, W, 4] on host
(`core/fastpath.pack_flat`) and uploads them. This path uploads the merged
per-observation arrays instead and builds the counts ON DEVICE with one
scatter-add, feeding them straight into the vote-scan engine — one RPC
round-trip, no host-side bincount, no counts tensor on the host at all
(ARCHITECTURE.md "device-side pair packing" lever).

Pair semantics are identical to pack_flat (same shifted-window compares over
the merged-read observation stream); `tests/test_fused_pack.py` proves
element equality of both the counts and the full scan outputs.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

I32 = jnp.int32


def device_pair_counts(m_read, m_rank, m_allele, m_qok, S_pad: int,
                       window: int):
    """Banded pair counts [S_pad, W, 4] (hi, lo) from merged observation
    arrays. Padding rows must carry m_read == -1 (never pairs)."""
    W = window
    No = m_read.shape[0]
    size = S_pad * W * 4
    idx_parts = []
    val_parts = []
    for m in range(1, W + 1):
        p_read = jnp.roll(m_read, -m)
        p_rank = jnp.roll(m_rank, -m)
        p_allele = jnp.roll(m_allele, -m)
        p_qok = jnp.roll(m_qok, -m)
        tail = jnp.arange(No) >= No - m      # rolled-over partners
        same = (m_read == p_read) & (m_read >= 0) & jnp.logical_not(tail)
        d = p_rank - m_rank
        keep = same & (d >= 1) & (d <= W)
        combo = m_allele.astype(I32) * 2 + p_allele.astype(I32)
        lin = m_rank.astype(I32) * (W * 4) + (d - 1) * 4 + combo
        both = m_qok & p_qok
        # hi plane at [0, size), lo plane at [size, 2*size), dump at 2*size
        lin = lin + jnp.where(both, 0, size)
        lin = jnp.where(keep, lin, 2 * size)
        idx_parts.append(lin)
        val_parts.append(keep.astype(I32))
    idx = jnp.concatenate(idx_parts)
    val = jnp.concatenate(val_parts)
    buf = jnp.zeros(2 * size + 1, I32).at[idx].add(val)
    counts_hi = buf[:size].reshape(S_pad, W, 4)
    counts_lo = buf[size:2 * size].reshape(S_pad, W, 4)
    return counts_hi, counts_lo


def _fused_pack_scan(m_read, m_rank, m_allele, m_qok, gap, vtype, vtype_band,
                     valid_band, S_pad, window, distance, edge_threshold_x10,
                     use_pallas, interpret):
    counts_hi, counts_lo = device_pair_counts(m_read, m_rank, m_allele,
                                              m_qok, S_pad, window)
    if use_pallas:
        from .pallas_scan import vote_scan_pallas

        assigned, hp, bstart = vote_scan_pallas(
            counts_hi, counts_lo, gap, vtype, vtype_band, valid_band,
            window=window, distance=distance,
            edge_threshold_x10=edge_threshold_x10, interpret=interpret)
    else:
        from .vote_scan import vote_scan_core

        assigned, hp, bstart = vote_scan_core(
            counts_hi, counts_lo, gap, vtype, vtype_band, valid_band,
            window=window, distance=distance,
            edge_threshold_x10=edge_threshold_x10)
    return jnp.stack([assigned.astype(I32), hp, bstart])


fused_pack_scan_jit = jax.jit(
    _fused_pack_scan,
    static_argnames=("S_pad", "window", "distance", "edge_threshold_x10",
                     "use_pallas", "interpret"))


def run_fused_pack_scan(m_read, m_rank, m_allele, m_qok, positions, vtype,
                        params, use_pallas: bool, interpret: bool = False):
    """Host wrapper: pad the observation stream and site axis to power-of-2
    buckets, run the fused jit, return (assigned, hp, bstart) numpy arrays
    truncated to S."""
    W = params.connect_adjacent
    S = len(positions)
    S_pad = max(256, 1 << int(np.ceil(np.log2(S))))
    No = len(m_read)
    No_pad = max(1024, 1 << int(np.ceil(np.log2(max(No, 1)))))

    def pad_obs(a, fill, dtype):
        out = np.full(No_pad, fill, dtype)
        out[:No] = a
        return out

    m_read_p = pad_obs(m_read, -1, np.int32)
    m_rank_p = pad_obs(m_rank, 0, np.int32)
    m_allele_p = pad_obs(m_allele, 0, np.int8)
    m_qok_p = pad_obs(m_qok, False, bool)

    gap = np.full(S_pad, np.iinfo(np.int32).max, dtype=np.int32)
    if S > 1:
        gap[:S - 1] = np.minimum(np.diff(positions),
                                 np.iinfo(np.int32).max).astype(np.int32)
    ranks = np.arange(S)
    tgt = ranks[:, None] + np.arange(1, W + 1)[None, :]
    valid_band = np.zeros((S_pad, W), dtype=bool)
    valid_band[:S] = tgt < S
    vtype_band = np.zeros((S_pad, W), dtype=np.int8)
    vtype_band[:S] = np.where(tgt < S, vtype[np.minimum(tgt, S - 1)], 0)
    vtype_p = np.zeros(S_pad, dtype=np.int8)
    vtype_p[:S] = vtype

    out = np.array(fused_pack_scan_jit(
        jnp.asarray(m_read_p), jnp.asarray(m_rank_p), jnp.asarray(m_allele_p),
        jnp.asarray(m_qok_p), jnp.asarray(gap), jnp.asarray(vtype_p),
        jnp.asarray(vtype_band), jnp.asarray(valid_band),
        S_pad=S_pad, window=W, distance=params.distance,
        edge_threshold_x10=float(params.edge_threshold) * 10.0,
        use_pallas=use_pallas, interpret=interpret))
    return out[0, :S].astype(bool), out[1, :S], out[2, :S]
