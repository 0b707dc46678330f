"""Device-side pair packing equality: fused counts vs the host bincount
packer, and the full fused pack+scan vs the classic two-stage path."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from longphase_s_tpu.core.fastpath import merge_observations, pack_flat
from longphase_s_tpu.core.phase_algo import PhaseParams
from longphase_s_tpu.ops.fused import device_pair_counts, run_fused_pack_scan
from longphase_s_tpu.ops.vote_scan import assemble_blocks, run_vote_scan


def _random_flat(seed, n_reads=40, max_obs=60, n_sites=300):
    rng = np.random.default_rng(seed)
    positions = np.sort(rng.choice(np.arange(1000, 400000, 7), n_sites,
                                   replace=False))
    obs_pos = []
    offsets = [0]
    names = []
    for r in range(n_reads):
        k = int(rng.integers(1, max_obs))
        lo = int(rng.integers(0, n_sites - 1))
        hi = min(n_sites, lo + int(rng.integers(1, 80)))
        sites = np.sort(rng.choice(np.arange(lo, hi),
                                   min(k, hi - lo), replace=False))
        obs_pos.extend(positions[sites])
        offsets.append(len(obs_pos))
        # a few split alignments share a name (merged-read semantics)
        names.append(f"read_{r if rng.random() > 0.15 else max(0, r - 1)}")
    n = len(obs_pos)
    obs_pos = np.array(obs_pos, np.int64)
    obs_allele = rng.integers(0, 2, n).astype(np.int8)
    obs_qual = rng.integers(0, 40, n).astype(np.int16)
    return obs_pos, obs_allele, obs_qual, np.array(offsets, np.int64), names


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_device_counts_match_host(seed):
    params = PhaseParams()
    obs_pos, obs_allele, obs_qual, offsets, names = _random_flat(seed)
    packed = pack_flat(obs_pos, obs_allele, obs_qual, offsets, names, params)
    positions, vtype, rank, m_read, m_rank, m_allele, m_qok, _m_aln = \
        merge_observations(obs_pos, obs_allele, obs_qual, offsets, names,
                           params)
    S = len(positions)
    S_pad = max(256, 1 << int(np.ceil(np.log2(S))))
    hi, lo = jax.jit(device_pair_counts, static_argnums=(4, 5))(
        jnp.asarray(m_read.astype(np.int32)), jnp.asarray(m_rank),
        jnp.asarray(m_allele.astype(np.int8)), jnp.asarray(m_qok),
        S_pad, params.connect_adjacent)
    hi = np.array(hi)[:S]
    lo = np.array(lo)[:S]
    assert (hi == packed.counts_hi).all()
    assert (lo == packed.counts_lo).all()


@pytest.mark.parametrize("seed", [3, 4])
def test_fused_scan_matches_classic(seed):
    params = PhaseParams()
    obs_pos, obs_allele, obs_qual, offsets, names = _random_flat(seed)
    packed = pack_flat(obs_pos, obs_allele, obs_qual, offsets, names, params)
    ps0, ori0 = run_vote_scan(packed, params)
    positions, vtype, rank, m_read, m_rank, m_allele, m_qok, _m_aln = \
        merge_observations(obs_pos, obs_allele, obs_qual, offsets, names,
                           params)
    assigned, hp, bstart = run_fused_pack_scan(
        m_read, m_rank, m_allele, m_qok, positions, vtype, params,
        use_pallas=True, interpret=True)
    ps1, ori1 = assemble_blocks(positions, assigned, hp, bstart)
    assert (ps0 == ps1).all()
    assert (ori0 == ori1).all()
