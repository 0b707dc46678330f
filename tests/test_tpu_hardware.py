"""Hardware-marked device-path test (ADVICE r1: the hermetic CPU suite never
executes the production TPU branch — Pallas is covered in interpret mode
only, so a Mosaic regression would surface as a silent perf cliff).

This test runs the fused device phase on the REAL accelerator with
LPS_STRICT_DEVICE=1 (fallback re-raises) in a subprocess (the suite's
conftest pins this process to CPU), and compares the VCF against the host
oracle. Skipped when no accelerator backend is reachable."""

import json
import os
import subprocess
import sys
import textwrap

import pytest

WORKER = textwrap.dedent("""
    import sys
    sys.path.insert(0, "/root/repo")
    import jax
    try:
        dev = jax.devices()[0]
    except Exception:
        sys.exit(42)  # no backend at all
    if dev.platform == "cpu":
        sys.exit(42)  # no accelerator: skip
    import json, os
    os.environ["LPS_STRICT_DEVICE"] = "1"
    os.environ["LPS_MULTICHIP"] = "0"
    fix = json.loads(sys.argv[1])
    from longphase_s_tpu.models.phase import PhaseConfig, run_phase
    tpu = run_phase(PhaseConfig(snp_file=fix["vcf"], bam_files=[fix["bam"]],
                                fasta_file=fix["fasta"],
                                result_prefix=sys.argv[2] + "/tpu",
                                num_threads=1, is_pb=True, engine="tpu"))
    oracle = run_phase(PhaseConfig(snp_file=fix["vcf"],
                                   bam_files=[fix["bam"]],
                                   fasta_file=fix["fasta"],
                                   result_prefix=sys.argv[2] + "/oracle",
                                   num_threads=1, is_pb=True,
                                   engine="oracle"))
    assert tpu == oracle, "device phase != oracle"
    print(f"DEVICE_OK platform={dev.platform} sites={len(tpu)}")
""")


@pytest.mark.tpu
def test_fused_device_phase_on_hardware(small_fixture, tmp_path):
    env = dict(os.environ)
    env.pop("JAX_PLATFORMS", None)
    env.pop("XLA_FLAGS", None)
    # keep the axon plugin importable alongside the repo
    env["PYTHONPATH"] = "/root/repo:/root/.axon_site"
    fix = {k: small_fixture[k] for k in ("vcf", "bam", "fasta")}
    try:
        r = subprocess.run(
            [sys.executable, "-c", WORKER, json.dumps(fix), str(tmp_path)],
            env=env, capture_output=True, timeout=300)
    except subprocess.TimeoutExpired:
        pytest.skip("accelerator backend unreachable (tunnel timeout)")
    if r.returncode == 42:
        pytest.skip("no accelerator backend available")
    assert r.returncode == 0, r.stderr.decode()[-3000:]
    assert b"DEVICE_OK" in r.stdout
