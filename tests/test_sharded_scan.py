"""Site-axis sharded scan over the virtual 8-device CPU mesh must reproduce
the single-device scan exactly (carry chain over ppermute)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from longphase_s_tpu.ops.vote_scan import vote_scan_jax
from longphase_s_tpu.parallel.sharded_scan import (make_site_mesh,
                                                   sharded_vote_scan)


@pytest.mark.parametrize("seed,S", [(0, 1024), (1, 2048)])
def test_sharded_scan_matches_single(seed, S):
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    W = 35
    rng = np.random.default_rng(seed)
    ch = rng.integers(0, 15, size=(S, W, 4)).astype(np.int32)
    # sparsify so ties/blocks occur
    ch[rng.random(ch.shape) < 0.8] = 0
    cl = rng.integers(0, 2, size=(S, W, 4)).astype(np.int32)
    cl[rng.random(cl.shape) < 0.9] = 0
    gap = rng.integers(50, 4000, size=S).astype(np.int32)
    gap[rng.random(S) < 0.02] = 10 ** 6  # distance gaps
    vt = rng.choice([0, 0, 0, 3, 4], size=S).astype(np.int8)
    tgt = np.arange(S)[:, None] + np.arange(1, W + 1)[None, :]
    vb = tgt < S
    vtb = np.where(vb, vt[np.minimum(tgt, S - 1)], 0).astype(np.int8)

    args = [jnp.asarray(x) for x in (ch, cl, gap, vt, vtb, vb)]
    a1, h1, b1 = vote_scan_jax(*args, window=W, distance=300000,
                               edge_threshold_x10=7.0)

    mesh = make_site_mesh(jax.devices()[:8])
    a2, h2, b2 = sharded_vote_scan(mesh, *args, window=W, distance=300000,
                                   edge_threshold_x10=7.0)
    np.testing.assert_array_equal(np.array(a1), np.array(a2))
    np.testing.assert_array_equal(np.array(h1), np.array(h2))
    np.testing.assert_array_equal(np.array(b1), np.array(b2))
