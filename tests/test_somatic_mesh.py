"""Somatic tag-kernel reductions on the device mesh: batching the
per-chromosome walks across an 8-device mesh (the TPU-native analog of the
reference's contig parallel-for, SomaticVarCaller.cpp:822) must produce
results bit-identical to per-chromosome single-device calls, for all three
kernel modes (normal extract / tumor extract / tumor tag)."""

import numpy as np
import pytest


def _rand_item(rng):
    """A random but internally consistent (walk, tables) chromosome:
    indices in range, PS values non-negative (a negative PS at a matched
    SNP observation is the reference's hard-exit path, not a parity
    case)."""
    S = int(rng.integers(40, 300))
    A = int(rng.integers(30, 200))
    No = int(rng.integers(500, 3000))
    walk = {
        "obs_var": rng.integers(0, S, No).astype(np.int64),
        "obs_aln": rng.integers(0, A, No).astype(np.int64),
        "obs_aux": rng.integers(0, max(A // 2, 1), No).astype(np.int64),
        "obs_base": rng.integers(0, 6, No).astype(np.uint8),
        "obs_flags": rng.integers(0, 16, No).astype(np.uint8),
        "obs_kind": rng.integers(0, 3, No).astype(np.uint8),
        "category": np.zeros(A, np.uint8),
    }
    t = {"pos": np.arange(S, dtype=np.int64) * 50}
    for key in ("nor_has", "alt_eq_hp1", "alt_eq_hp2", "ref_eq_hp1",
                "ref_eq_hp2", "hp1_long", "hp2_long", "tum_has",
                "tum_ref_is1", "tum_alt_is1"):
        t[key] = rng.integers(0, 2, S).astype(bool)
    for key in ("nor_vt", "tum_vt"):
        t[key] = rng.integers(0, 4, S).astype(np.int32)
    for key in ("nor_gt", "tum_gt"):
        t[key] = rng.integers(-1, 2, S).astype(np.int32)
    for key in ("nor_ps", "tum_ps"):
        t[key] = rng.integers(0, 1000, S).astype(np.int64)
    for key in ("nor_ref0", "nor_alt0", "tum_ref0", "tum_alt0",
                "nor_hp1c", "nor_hp2c"):
        t[key] = rng.integers(0, 4, S).astype(np.int32)
    return {
        "walk": walk, "t": t,
        "is_som": rng.integers(0, 2, S).astype(bool),
        "derive": rng.integers(0, 3, S).astype(np.int8),
        "gate": rng.integers(0, 2, No).astype(np.uint8),
    }


@pytest.mark.parametrize("mode,want_posbase,want_derive", [
    ("normal", True, False),
    ("extract", True, False),
    ("haplotag", False, True),
])
def test_somatic_mesh_matches_single_device(mode, want_posbase, want_derive):
    from longphase_s_tpu.ops import tag_kernels as tk
    from longphase_s_tpu.parallel.mesh import make_mesh

    rng = np.random.default_rng(71)
    # 5 chromosomes on an 8-device mesh: exercises filler-chromosome batch
    # padding as well as the sharded axis
    items = [_rand_item(rng) for _ in range(5)]
    mesh = make_mesh()
    got = tk.somatic_counts_device_mesh(
        mesh, items, mode, want_posbase=want_posbase,
        want_derive=want_derive, ref_nonempty=(mode == "normal"))
    assert len(got) == len(items)
    for it, g in zip(items, got):
        ref = tk.somatic_counts_device(
            it["walk"], it["t"], mode, is_som=it["is_som"],
            derive=it["derive"], gate=it["gate"],
            want_posbase=want_posbase, want_derive=want_derive,
            ref_nonempty=(mode == "normal"))
        assert set(g) == set(ref)
        for k in ref:
            np.testing.assert_array_equal(g[k], ref[k], err_msg=f"{mode}/{k}")
