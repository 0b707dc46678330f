#!/usr/bin/env python
"""End-to-round benchmark: germline phase pipeline throughput.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Workload: synthetic diploid chromosome (4 Mbp, ~30x long reads, 5% error),
full `phase` pipeline (BAM decode -> allele extraction -> pack -> vote scan
on device -> read correction -> VCF write). Metric = alignments processed per
second. Baseline = the reference C++ binary (longphase-s) on the same fixture
and host, measured once and cached (re-measured when the binary is present).
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/lps_tpu_jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

BENCH_DIR = os.path.join(os.path.dirname(os.path.abspath(__file__)), ".bench_cache")
REF_BIN = os.path.join(os.path.dirname(os.path.abspath(__file__)), ".refbuild", "longphase-s")
FIXTURE_CFG = dict(seed=20, length=4_000_000, coverage=30, read_len=12000,
                   snp_rate=0.001, error_rate=0.05, qual=20)
# reference binary reads/s measured on this container (4-core) when the
# binary is unavailable at bench time; refreshed whenever it IS available.
FALLBACK_BASELINE_READS_PER_S = None  # set after first measurement


def get_fixture():
    from longphase_s_tpu.testing.simulate import make_fixture

    os.makedirs(BENCH_DIR, exist_ok=True)
    marker = os.path.join(BENCH_DIR, "fixture.json")
    if os.path.exists(marker):
        with open(marker) as f:
            meta = json.load(f)
        if meta.get("cfg") == {k: str(v) for k, v in FIXTURE_CFG.items()} and \
                os.path.exists(meta["bam"]):
            return meta
    fix = make_fixture(os.path.join(BENCH_DIR, "fix"), **FIXTURE_CFG)
    meta = {"cfg": {k: str(v) for k, v in FIXTURE_CFG.items()},
            "fasta": fix["fasta"], "vcf": fix["vcf"], "bam": fix["bam"],
            "chrom": fix["chrom"], "n_reads": len(fix["reads"])}
    with open(marker, "w") as f:
        json.dump(meta, f)
    return meta


def measure_ours(meta) -> tuple[float, int]:
    from longphase_s_tpu.core.phase_algo import PhaseParams
    from longphase_s_tpu.models.phase import PhaseConfig, run_phase

    out_prefix = os.path.join(BENCH_DIR, "ours")
    cfg = PhaseConfig(snp_file=meta["vcf"], bam_files=[meta["bam"]],
                      fasta_file=meta["fasta"], result_prefix=out_prefix,
                      engine="tpu", params=PhaseParams())
    run_phase(cfg)  # warm-up: jit compile (persistent-cached) + page cache
    best = float("inf")
    for _ in range(3):
        t0 = time.monotonic()
        run_phase(cfg)
        best = min(best, time.monotonic() - t0)
    return best, meta["n_reads"]


def measure_reference(meta) -> float | None:
    cache = os.path.join(BENCH_DIR, "baseline.json")
    if os.path.exists(REF_BIN):
        out_prefix = os.path.join(BENCH_DIR, "golden")
        nthreads = os.cpu_count() or 4
        cmd = [REF_BIN, "phase", "--pb", "-s", meta["vcf"], "-b", meta["bam"],
               "-r", meta["fasta"], "-o", out_prefix, "-t", str(nthreads)]
        elapsed = float("inf")
        for _ in range(2):
            t0 = time.monotonic()
            subprocess.run(cmd, check=True, capture_output=True, timeout=3600)
            elapsed = min(elapsed, time.monotonic() - t0)
        with open(cache, "w") as f:
            json.dump({"elapsed_s": elapsed, "n_reads": meta["n_reads"],
                       "threads": nthreads}, f)
        return elapsed
    if os.path.exists(cache):
        with open(cache) as f:
            return json.load(f)["elapsed_s"]
    return None


def main():
    meta = get_fixture()
    ours_s, n_reads = measure_ours(meta)
    ref_s = measure_reference(meta)
    reads_per_s = n_reads / ours_s
    vs_baseline = None
    if ref_s:
        vs_baseline = (n_reads / ref_s) and (reads_per_s / (n_reads / ref_s))
    print(json.dumps({
        "metric": "phase_reads_per_s",
        "value": round(reads_per_s, 2),
        "unit": "alignments/s",
        "vs_baseline": round(vs_baseline, 4) if vs_baseline else None,
    }))


if __name__ == "__main__":
    main()
