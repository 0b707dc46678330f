"""Per-contig checkpoint/resume (utils/checkpoint.py; SURVEY.md §5).

A killed WGS phase run must resume from its completed contigs and produce a
final VCF identical to an uninterrupted run; stale checkpoints (different
inputs/params) must be ignored."""

import pytest

from longphase_s_tpu.models import phase as phase_mod
from longphase_s_tpu.models.phase import PhaseConfig, run_phase
from longphase_s_tpu.testing.simulate import make_multichrom_fixture


@pytest.fixture(scope="module")
def fix(tmp_path_factory):
    d = tmp_path_factory.mktemp("ckpt_fix")
    return make_multichrom_fixture(str(d / "fix"), seed=41, n_chroms=4,
                                   base_length=50000)


def _cfg(fix, tmp_path, out, ckpt="", engine="oracle", **kw):
    return PhaseConfig(snp_file=fix["vcf"], bam_files=[fix["bam"]],
                       fasta_file=fix["fasta"],
                       result_prefix=str(tmp_path / out),
                       num_threads=1, is_pb=True, engine=engine,
                       checkpoint_dir=ckpt, **kw)


def _vcf(tmp_path, out):
    lines = (tmp_path / f"{out}.vcf").read_text().splitlines()
    return [l for l in lines if not l.startswith("##commandline")]


def test_kill_and_resume_identical_vcf(fix, tmp_path, monkeypatch):
    straight = run_phase(_cfg(fix, tmp_path, "straight"))

    # "kill" the run after two contigs complete: the third phase call dies
    ckpt_dir = str(tmp_path / "ckpt")
    real = phase_mod.phase_chromosome
    calls = {"n": 0}

    def dying(*a, **kw):
        calls["n"] += 1
        if calls["n"] > 2:
            raise KeyboardInterrupt("simulated kill")
        return real(*a, **kw)

    monkeypatch.setattr(phase_mod, "phase_chromosome", dying)
    with pytest.raises(KeyboardInterrupt):
        run_phase(_cfg(fix, tmp_path, "killed", ckpt=ckpt_dir))
    monkeypatch.setattr(phase_mod, "phase_chromosome", real)

    # resume: the two completed contigs load from the checkpoint, the rest
    # compute; final results and VCF identical to the uninterrupted run
    calls2 = {"n": 0}

    def counting(*a, **kw):
        calls2["n"] += 1
        return real(*a, **kw)

    monkeypatch.setattr(phase_mod, "phase_chromosome", counting)
    resumed = run_phase(_cfg(fix, tmp_path, "resumed", ckpt=ckpt_dir))
    assert resumed == straight
    assert calls2["n"] == 2  # only the two unfinished contigs recomputed
    assert _vcf(tmp_path, "resumed") == _vcf(tmp_path, "straight")


def test_stale_checkpoint_ignored(fix, tmp_path):
    ckpt_dir = str(tmp_path / "ckpt2")
    first = run_phase(_cfg(fix, tmp_path, "first", ckpt=ckpt_dir))
    # different params -> different fingerprint -> full recompute, same VCF
    from longphase_s_tpu.core.phase_algo import PhaseParams

    other = run_phase(_cfg(fix, tmp_path, "other", ckpt=ckpt_dir,
                           params=PhaseParams(distance=299999)))
    assert set(other) == set(first)
    # same params again -> resumes everything, zero recompute, same output
    resumed = run_phase(_cfg(fix, tmp_path, "again", ckpt=ckpt_dir))
    assert resumed == first
    assert _vcf(tmp_path, "again") == _vcf(tmp_path, "first")


def test_checkpoint_with_tpu_engine_multichip(fix, tmp_path, monkeypatch):
    """The mesh-batched path checkpoints through the same record() hook."""
    import jax

    if len(jax.devices()) < 2:
        pytest.skip("needs a multi-device mesh")
    monkeypatch.setenv("LPS_MULTICHIP", "1")
    ckpt_dir = str(tmp_path / "ckpt3")
    a = run_phase(_cfg(fix, tmp_path, "tpu_a", ckpt=ckpt_dir, engine="tpu"))
    b = run_phase(_cfg(fix, tmp_path, "tpu_b", ckpt=ckpt_dir, engine="tpu"))
    assert a == b
    assert _vcf(tmp_path, "tpu_a") == _vcf(tmp_path, "tpu_b")
