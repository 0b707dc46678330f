#!/usr/bin/env python
"""End-of-round benchmark: all five pipelines vs the reference binary.

Emits one JSON line per pipeline:
    {"metric": "<name>_reads_per_s", "value": N, "unit": "alignments/s",
     "vs_baseline": median per-rep speedup, "ratio_spread": [min, max],
     "reps": N}
followed by a final aggregate line (geometric mean of the per-pipeline
vs_baseline ratios, plus "floor" = geomean of per-pipeline worst-rep
ratios) — the driver records the tail, so all lines land in BENCH_r{N}.json.

Protocol: per pipeline, one warm-up on each side, then LPS_BENCH_REPS
(default 5) interleaved reference/ours pairs; the per-rep ratio pairs
adjacent runs so machine-load noise cancels (VERDICT r4 weak #6).

Workloads (cached under .bench_cache, reference baselines cached alongside
and re-measured whenever the binary is present):
  phase            4 Mbp diploid chromosome, ~30x long reads, 5% error
  haplotag         same BAM tagged with the reference's phased VCF
  somatic_haplotag 1.5 Mbp tumor/normal pair (25x/30x, purity 0.6)
  estimate_purity  same tumor/normal pair, reference-default q=20 flags
  modcall          2 Mbp MM/ML-tagged BAM, 25x
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

ROOT = os.path.dirname(os.path.abspath(__file__))
BENCH_DIR = os.path.join(ROOT, ".bench_cache")
REF_BIN = os.path.join(ROOT, ".refbuild", "longphase-s")
NTHREADS = os.cpu_count() or 4

# Fixture scale: BASELINE.json's configs are chr20-scale (~64 Mbp); these
# are 1/4-1/5 of that so a full bench (fixture sim + reference best-of-3 +
# ours) stays under ~0.5 h on a fresh container while amortizing fixed
# per-run costs the way real WGS inputs do. The 64 Mbp point is covered by
# tools/wgs_soak.py / WGS_SOAK.md.
PHASE_CFG = dict(seed=20, length=12_000_000, coverage=30, read_len=12000,
                 snp_rate=0.001, error_rate=0.05, qual=20)
SOMATIC_CFG = dict(seed=21, length=5_000_000, normal_coverage=25,
                   tumor_coverage=30, purity=0.6, n_somatic=400,
                   n_artifacts=100, read_len=12000, snp_rate=0.0012,
                   error_rate=0.02, qual=25)
METH_CFG = dict(seed=22, length=6_000_000, coverage=25, read_len=10000,
                snp_rate=0.0012, n_asm=480, n_homo_mod=240, qual=30)


def _cached_fixture(name, cfg, maker):
    os.makedirs(BENCH_DIR, exist_ok=True)
    marker = os.path.join(BENCH_DIR, f"fixture_{name}.json")
    want = {k: str(v) for k, v in cfg.items()}
    if os.path.exists(marker):
        with open(marker) as f:
            meta = json.load(f)
        if meta.get("cfg") == want and all(
                os.path.exists(meta[k]) for k in meta.get("paths", [])):
            return meta
    fix = maker(os.path.join(BENCH_DIR, name), **cfg)
    paths = [k for k, v in fix.items()
             if isinstance(v, str) and os.path.isfile(v)]
    meta = {k: v for k, v in fix.items()
            if k in paths or isinstance(v, (int, float))}
    meta["chrom"] = fix.get("chrom")
    meta["cfg"] = want
    meta["paths"] = paths
    if "reads" in fix:
        meta["n_reads"] = len(fix["reads"])
    with open(marker, "w") as f:
        json.dump(meta, f)
    return meta


def get_phase_fixture():
    from longphase_s_tpu.testing.simulate import make_fixture
    return _cached_fixture("fix", PHASE_CFG, make_fixture)


def get_somatic_fixture():
    from longphase_s_tpu.testing.simulate import make_somatic_fixture
    meta = _cached_fixture("fix_somatic", SOMATIC_CFG, make_somatic_fixture)
    # count alignments once (normal + tumor) for the throughput metric
    if "n_alignments" not in meta:
        from longphase_s_tpu.io.bam import BamReader
        n = 0
        for p in (meta["normal_bam"], meta["tumor_bam"]):
            r = BamReader(p)
            n += sum(1 for _ in r)
            r.close()
        meta["n_alignments"] = n
        with open(os.path.join(BENCH_DIR, "fixture_fix_somatic.json"), "w") as f:
            json.dump(meta, f)
    return meta


def get_meth_fixture():
    from longphase_s_tpu.testing.simulate import make_meth_fixture
    meta = _cached_fixture("fix_meth", METH_CFG, make_meth_fixture)
    if "n_alignments" not in meta:
        from longphase_s_tpu.io.bam import BamReader
        r = BamReader(meta["bam"])
        meta["n_alignments"] = sum(1 for _ in r)
        r.close()
        with open(os.path.join(BENCH_DIR, "fixture_fix_meth.json"), "w") as f:
            json.dump(meta, f)
    return meta


def get_phased_vcf(phase_meta):
    """Phased normal VCF used as haplotag input (reference output when the
    binary is available so both sides tag from identical phasing)."""
    out = os.path.join(BENCH_DIR, "phased_input")
    vcf = out + ".vcf"
    if os.path.exists(vcf) and os.path.getmtime(vcf) > os.path.getmtime(
            phase_meta["bam"]):
        return vcf
    if os.path.exists(REF_BIN):
        subprocess.run([REF_BIN, "phase", "--pb", "-s", phase_meta["vcf"],
                        "-b", phase_meta["bam"], "-r", phase_meta["fasta"],
                        "-o", out, "-t", str(NTHREADS)],
                       check=True, capture_output=True, timeout=3600)
    else:
        from longphase_s_tpu.core.phase_algo import PhaseParams
        from longphase_s_tpu.models.phase import PhaseConfig, run_phase
        run_phase(PhaseConfig(snp_file=phase_meta["vcf"],
                              bam_files=[phase_meta["bam"]],
                              fasta_file=phase_meta["fasta"],
                              result_prefix=out, engine="tpu",
                              params=PhaseParams()))
    return vcf


def get_phased_somatic_vcf(som_meta):
    out = os.path.join(BENCH_DIR, "phased_normal_somatic")
    vcf = out + ".vcf"
    if os.path.exists(vcf) and os.path.getmtime(vcf) > os.path.getmtime(
            som_meta["normal_bam"]):
        return vcf
    if os.path.exists(REF_BIN):
        subprocess.run([REF_BIN, "phase", "--pb", "-s", som_meta["normal_vcf"],
                        "-b", som_meta["normal_bam"], "-r", som_meta["fasta"],
                        "-o", out, "-t", str(NTHREADS)],
                       check=True, capture_output=True, timeout=3600)
    else:
        from longphase_s_tpu.core.phase_algo import PhaseParams
        from longphase_s_tpu.models.phase import PhaseConfig, run_phase
        run_phase(PhaseConfig(snp_file=som_meta["normal_vcf"],
                              bam_files=[som_meta["normal_bam"]],
                              fasta_file=som_meta["fasta"],
                              result_prefix=out, engine="tpu",
                              params=PhaseParams()))
    return vcf


REPS = int(os.environ.get("LPS_BENCH_REPS", "5"))


def _median(xs):
    s = sorted(xs)
    n = len(s)
    return s[n // 2] if n % 2 else 0.5 * (s[n // 2 - 1] + s[n // 2])


def _measure_pair(name, ours_fn, ref_cmd, cache_key, reps=None):
    """Interleaved ours/reference measurement (VERDICT r4 weak #6: best-of-3
    in separate phases cannot resolve a 4.95-vs-5.0 question against a +-30%
    reference-side spread).

    Each rep runs reference then ours back-to-back, so a slow-machine moment
    hits both sides of the same ratio; vs_baseline is the MEDIAN of the
    per-rep ratios and the min/max ratio spread is recorded alongside.
    Without the binary, cached per-rep reference times are reused and the
    ratio is median-vs-median (pairing is meaningless across sessions).

    Returns (ours_median_s, ref_median_s|None, ratios list).
    """
    reps = reps or REPS
    cache = os.path.join(BENCH_DIR, f"baseline_{name}.json")
    have_ref = os.path.exists(REF_BIN)

    def run_ref():
        t0 = time.monotonic()
        subprocess.run(ref_cmd, check=True, capture_output=True, timeout=3600)
        return time.monotonic() - t0

    def run_ours():
        t0 = time.monotonic()
        ours_fn()
        return time.monotonic() - t0

    # warm-up both sides: page cache, jit compile; first run after fixture
    # creation can be 2x slower than steady state
    if have_ref:
        run_ref()
    run_ours()
    ref_times, ours_times = [], []
    for _ in range(reps):
        if have_ref:
            ref_times.append(run_ref())
        ours_times.append(run_ours())
    ours_med = _median(ours_times)
    if have_ref:
        with open(cache, "w") as f:
            json.dump({"elapsed_s": _median(ref_times),
                       "elapsed_list": ref_times, "threads": NTHREADS,
                       "key": cache_key}, f)
        ratios = [r / o for r, o in zip(ref_times, ours_times)]
        return ours_med, _median(ref_times), ratios
    if os.path.exists(cache):
        with open(cache) as f:
            data = json.load(f)
        if data.get("key") == cache_key:
            ref_med = _median(data.get("elapsed_list", [data["elapsed_s"]]))
            return ours_med, ref_med, [ref_med / ours_med]
    return ours_med, None, []


def bench_phase(results):
    from longphase_s_tpu.core.phase_algo import PhaseParams
    from longphase_s_tpu.models.phase import PhaseConfig, run_phase

    meta = get_phase_fixture()
    out = os.path.join(BENCH_DIR, "ours_phase")
    cfg = PhaseConfig(snp_file=meta["vcf"], bam_files=[meta["bam"]],
                      fasta_file=meta["fasta"], result_prefix=out,
                      engine="tpu", params=PhaseParams())
    ours_s, ref_s, ratios = _measure_pair(
        "phase", lambda: run_phase(cfg),
        [REF_BIN, "phase", "--pb", "-s", meta["vcf"], "-b", meta["bam"],
         "-r", meta["fasta"], "-o", os.path.join(BENCH_DIR, "golden_phase"),
         "-t", str(NTHREADS)],
        json.dumps(PHASE_CFG, sort_keys=True))
    results.append(("phase", meta["n_reads"], ours_s, ref_s, ratios))


WRITER_STATS: dict = {}


def bench_haplotag(results):
    from longphase_s_tpu import native
    from longphase_s_tpu.models.haplotag import HaplotagConfig, run_haplotag

    meta = get_phase_fixture()
    phased = get_phased_vcf(meta)
    out = os.path.join(BENCH_DIR, "ours_haplotag")
    cfg = HaplotagConfig(snp_file=phased, bam_file=meta["bam"],
                         fasta_file=meta["fasta"], result_prefix=out,
                         num_threads=NTHREADS)
    ours_s, ref_s, ratios = _measure_pair(
        "haplotag", lambda: run_haplotag(cfg),
        [REF_BIN, "haplotag", "-s", phased, "-b", meta["bam"],
         "-r", meta["fasta"], "-o", os.path.join(BENCH_DIR, "golden_haplotag"),
         "-t", str(NTHREADS)],
        json.dumps(PHASE_CFG, sort_keys=True))
    results.append(("haplotag", meta["n_reads"], ours_s, ref_s, ratios))
    # bam_writer_util inputs, captured HERE so writer stats (the last ours
    # rep's native write) and the raw-deflate probe sample the same machine
    # state — reading them after other pipelines ran measures a different
    # write and a different load (and once produced util > 1)
    try:
        stats = native.last_tag_write_stats()
        if stats and stats[0] > 0:
            payload = native.bgzf_inflate_file(out + ".bam")
            best_s = float("inf")
            for _ in range(3):
                t0 = time.monotonic()
                native.bgzf_compress(payload, 3)
                best_s = min(best_s, time.monotonic() - t0)
            WRITER_STATS.update(wall_ms=stats[0], payload_n=stats[1],
                                deflate_s=best_s)
    except Exception as e:  # noqa: BLE001 — health metric only
        print(f"bench writer stats failed: {e!r}", file=sys.stderr)


def bench_haplotag_cram(results):
    """haplotag with CRAM input on both sides: captures the native CRAM
    decode inside an end-to-end flow (the reference reads CRAM via htslib)."""
    from longphase_s_tpu.models.haplotag import HaplotagConfig, run_haplotag

    meta = get_phase_fixture()
    phased = get_phased_vcf(meta)
    cram = os.path.join(BENCH_DIR, "fix_reads.cram")
    if not os.path.exists(cram) or os.path.getmtime(cram) < os.path.getmtime(
            meta["bam"]):
        from longphase_s_tpu.io.bam import BamReader
        from longphase_s_tpu.io.cram import CramWriter

        br = BamReader(meta["bam"])
        w = CramWriter(cram, br.header_text, br.references, br.lengths,
                       fasta_path=meta["fasta"])
        for rec in br:
            w.write(rec)
        w.close()
        br.close()
    out = os.path.join(BENCH_DIR, "ours_haplotag_cram")
    cfg = HaplotagConfig(snp_file=phased, bam_file=cram,
                         fasta_file=meta["fasta"], result_prefix=out,
                         num_threads=NTHREADS)

    def run_cold_decode():
        # drop the cached handle so every timed run pays the CRAM decode,
        # like the reference does (this line is ABOUT decode throughput)
        from longphase_s_tpu import native as _nat

        _nat.drain_bam_cache()
        run_haplotag(cfg)

    ours_s, ref_s, ratios = _measure_pair(
        "haplotag_cram", run_cold_decode,
        [REF_BIN, "haplotag", "-s", phased, "-b", cram,
         "-r", meta["fasta"], "-o",
         os.path.join(BENCH_DIR, "golden_haplotag_cram"),
         "-t", str(NTHREADS)],
        json.dumps(PHASE_CFG, sort_keys=True))
    results.append(("haplotag_cram", meta["n_reads"], ours_s, ref_s, ratios))


def bench_somatic(results):
    from longphase_s_tpu.models.somatic import SomaticConfig, run_somatic_haplotag

    meta = get_somatic_fixture()
    phased = get_phased_somatic_vcf(meta)
    out = os.path.join(BENCH_DIR, "ours_somatic")
    cfg = SomaticConfig(snp_file=phased, tumor_snv_file=meta["tumor_vcf"],
                        bam_file=meta["normal_bam"],
                        tumor_bam_file=meta["tumor_bam"],
                        fasta_file=meta["fasta"], result_prefix=out,
                        num_threads=NTHREADS)
    ours_s, ref_s, ratios = _measure_pair(
        "somatic_haplotag", lambda: run_somatic_haplotag(cfg),
        [REF_BIN, "somatic_haplotag", "-s", phased,
         "--tumor-snv-file", meta["tumor_vcf"], "-b", meta["normal_bam"],
         "--tumor-bam-file", meta["tumor_bam"], "-r", meta["fasta"],
         "-o", os.path.join(BENCH_DIR, "golden_somatic"),
         "-t", str(NTHREADS)],
        json.dumps(SOMATIC_CFG, sort_keys=True))
    results.append(("somatic_haplotag", meta["n_alignments"], ours_s, ref_s,
                    ratios))


def bench_purity(results):
    from longphase_s_tpu.models.somatic import SomaticConfig, run_estimate_purity

    meta = get_somatic_fixture()
    phased = get_phased_somatic_vcf(meta)
    out = os.path.join(BENCH_DIR, "ours_purity")
    cfg = SomaticConfig(snp_file=phased, tumor_snv_file=meta["tumor_vcf"],
                        bam_file=meta["normal_bam"],
                        tumor_bam_file=meta["tumor_bam"],
                        fasta_file=meta["fasta"], result_prefix=out,
                        quality_threshold=20, tag_supplementary=True,
                        num_threads=NTHREADS)
    ours_s, ref_s, ratios = _measure_pair(
        "estimate_purity", lambda: run_estimate_purity(cfg),
        [REF_BIN, "estimate_purity", "-s", phased,
         "--tumor-snv-file", meta["tumor_vcf"], "-b", meta["normal_bam"],
         "--tumor-bam-file", meta["tumor_bam"], "-r", meta["fasta"],
         "-o", os.path.join(BENCH_DIR, "golden_purity"),
         "-t", str(NTHREADS)],
        json.dumps(SOMATIC_CFG, sort_keys=True))
    results.append(("estimate_purity", meta["n_alignments"], ours_s, ref_s,
                    ratios))


def bench_modcall(results):
    from longphase_s_tpu.models.modcall import ModCallConfig, run_modcall

    meta = get_meth_fixture()
    out = os.path.join(BENCH_DIR, "ours_modcall")
    cfg = ModCallConfig(bam_files=[meta["bam"]], fasta_file=meta["fasta"],
                        snp_file=meta["vcf"], result_prefix=out,
                        num_threads=NTHREADS)
    ours_s, ref_s, ratios = _measure_pair(
        "modcall", lambda: run_modcall(cfg),
        [REF_BIN, "modcall", "-b", meta["bam"], "-r", meta["fasta"],
         "-s", meta["vcf"], "-o", os.path.join(BENCH_DIR, "golden_modcall"),
         "-t", str(NTHREADS)],
        json.dumps(METH_CFG, sort_keys=True))
    results.append(("modcall", meta["n_alignments"], ours_s, ref_s, ratios))


def writer_metrics(lines):
    """bam_writer_util (VERDICT r4 weak #7): the measured tag-writer wall
    (record assembly + parallel BGZF level-3 + ordered fwrite, recorded by
    the native writer itself during bench_haplotag's last ours rep) vs a
    pure parallel libdeflate level-3 pass over the SAME uncompressed
    payload on the same cores, both captured back-to-back inside
    bench_haplotag. util = deflate_wall / writer_wall (the writer also
    pays assembly + fwrite, so util < 1; ~0.9 = at the deflate roofline);
    vs_baseline carries the writer's payload MB/s."""
    if not WRITER_STATS:
        return
    wall_ms = WRITER_STATS["wall_ms"]
    util = (WRITER_STATS["deflate_s"] * 1e3) / wall_ms
    writer_mb_s = WRITER_STATS["payload_n"] / 1e6 / (wall_ms / 1e3)
    lines.append({"metric": "bam_writer_util", "value": round(util, 4),
                  "unit": "fraction_of_deflate_sol",
                  "vs_baseline": round(writer_mb_s, 1),
                  "payload_mb": round(WRITER_STATS["payload_n"] / 1e6, 1),
                  "writer_ms": round(wall_ms, 1),
                  "deflate_ms": round(WRITER_STATS["deflate_s"] * 1e3, 1)})


def device_metrics(lines):
    """Kernel health + speed-of-light metrics on the real accelerator.

    pallas_compiled_ok: the COMPILED Mosaic vote scan must equal the
    lax.scan engine on device (the hermetic suite only proves interpret
    mode; a Mosaic regression must be loud in BENCH_r*.json, VERDICT r2 #8).

    phase_kernel_util: measured per-call time of the PRODUCTION phase
    device path (_mxu_phase: MXU pair-pack + Pallas scan + block assembly,
    device-resident inputs, amortized over K in-jit dispatches) against
    the roofline model documented in ARCHITECTURE.md 'Speed of light':
    HBM traffic for the bit plane + plane/count handoffs at 819 GB/s
    (v5e) plus the sequential scan's S x ~30-cycle critical path at
    940 MHz (VERDICT r2 #4, re-based in r5 when the loop-hoisting flaw
    of the old measurement was found)."""
    import numpy as np

    import jax

    if jax.devices()[0].platform == "cpu":
        lines.append({"metric": "pallas_compiled_ok", "value": None,
                      "unit": "bool", "vs_baseline": None})
        lines.append({"metric": "phase_kernel_util", "value": None,
                      "unit": "fraction_of_sol", "vs_baseline": None})
        return
    import jax.numpy as jnp

    from longphase_s_tpu.core.phase_algo import PhaseParams
    from longphase_s_tpu.ops.fused import fused_phase_jit

    params = PhaseParams()
    W = params.connect_adjacent
    S_pad = 4096
    S = S_pad - 7
    rng = np.random.default_rng(0)
    cov, span = 30, 128  # ~30x reads, each covering ~128 sites
    n_reads = S * cov // span
    No = n_reads * span
    No_pad = 1 << int(np.ceil(np.log2(No)))
    m_read = np.repeat(np.arange(n_reads, dtype=np.int32), span)
    start = rng.integers(0, max(S - span, 1), n_reads)
    m_rank = (np.repeat(start, span)
              + np.tile(np.arange(span), n_reads)).astype(np.int32)
    m_allele = rng.integers(0, 2, No).astype(np.int8)
    m_qok = rng.random(No) > 0.05

    def pad(a, fill, dtype):
        out = np.full(No_pad, fill, dtype)
        out[:No] = a
        return out

    gap = np.full(S_pad, 150, np.int32)
    vtype = np.zeros(S_pad, np.int8)
    vtype_band = np.zeros((S_pad, W), np.int8)
    valid_band = np.zeros((S_pad, W), bool)
    valid_band[:S] = (np.arange(S)[:, None] + np.arange(1, W + 1)) < S
    positions = (np.arange(S_pad) * 150).astype(np.int32)
    A_pad = 1 << int(np.ceil(np.log2(n_reads)))
    args = [jax.device_put(x) for x in
            (pad(m_read, -1, np.int32), pad(m_rank, 0, np.int32),
             pad(m_allele, 0, np.int8), pad(m_qok, False, bool),
             pad(m_read, -1, np.int32), gap, vtype, vtype_band, valid_band,
             positions)]
    kw = dict(S=S, S_pad=S_pad, A_pad=A_pad, window=W,
              distance=params.distance,
              edge_threshold_x10=float(params.edge_threshold) * 10.0,
              read_confidence=float(params.read_confidence),
              snp_confidence=float(params.snp_confidence), interpret=False)
    out_p = np.array(fused_phase_jit(*args, use_pallas=True, **kw))
    out_s = np.array(fused_phase_jit(*args, use_pallas=False, **kw))
    ok = bool((out_p == out_s).all())
    lines.append({"metric": "pallas_compiled_ok", "value": int(ok),
                  "unit": "bool", "vs_baseline": None})

    # Per-call time of the PRODUCTION phase device path (_mxu_phase: nibble
    # unpack -> int8 Gram pair-pack -> reshape-skew band -> Pallas scan ->
    # gather-free block assembly). K iterations inside ONE jit amortize the
    # tunnel RPC; the input is xor-perturbed with a MOVING one-hot each
    # iteration — a provably loop-dependent value. (The old `i < 0`
    # predicate trick was unsound: XLA's range analysis sometimes folded
    # it and hoisted whole stages, which is how the 35 ms scatter pack hid
    # behind an 829 us reading in r4.)
    from functools import partial as _partial

    from longphase_s_tpu.ops.fused import _mxu_phase

    TILE = 128
    L = TILE + W
    T = S_pad // TILE
    R = 64  # ~30x coverage / 128-rank tile span
    bits = rng.integers(0, 5, (T, R, (L + 1) // 2)).astype(np.uint8)
    bits_d = jax.device_put(bits)
    pos_d = jax.device_put(positions)
    vt_d = jax.device_put(vtype)
    mkw = dict(S=S, window=W, distance=params.distance,
               edge_threshold_x10=kw["edge_threshold_x10"],
               use_pallas=True, interpret=False)

    @_partial(jax.jit, static_argnames=("K",))
    def loop(b, K):
        C = b.shape[2]
        def body(i, acc):
            oh = (jax.lax.broadcasted_iota(jnp.int32, b.shape, 2)
                  == (i % C)).astype(jnp.uint8)
            return acc + _mxu_phase(b ^ oh, vt_d, pos_d, **mkw)[0, 0]
        return jax.lax.fori_loop(0, K, body, jnp.int32(0))

    def timed(K):
        int(loop(bits_d, K=K))  # compile (int() forces the tunnel sync;
        # block_until_ready alone returns early on the axon client)
        best = float("inf")
        for _ in range(3):
            t0 = time.monotonic()
            int(loop(bits_d, K=K))
            best = min(best, time.monotonic() - t0)
        return best

    per_call = (timed(129) - timed(1)) / 128

    # device tag kernels: correctness + per-call wall on a synthetic walk
    # (the throughput pipelines only offload above LPS_TAG_DEVICE_MIN, so
    # this line keeps the kernels exercised on hardware every round)
    try:
        import os as _os

        from longphase_s_tpu.models.haplotag_fast import (aggregate_reads,
                                                          germline_votes)
        from longphase_s_tpu.ops import tag_kernels

        rng2 = np.random.default_rng(7)
        No2, A2, S2 = 400_000, 4_000, 3_000
        walk = {
            "obs_var": rng2.integers(0, S2, No2).astype(np.int32),
            "obs_aln": np.sort(rng2.integers(0, A2, No2)).astype(np.int32),
            "obs_base": rng2.choice(np.frombuffer(b"ACGT", np.uint8), No2),
            "obs_flags": rng2.integers(0, 16, No2).astype(np.uint8),
            "obs_kind": rng2.choice(np.array([0, 0, 0, 1], np.uint8), No2),
            "obs_aux": rng2.integers(0, 50, No2).astype(np.int32),
            "category": np.zeros(A2, np.uint8),
        }
        t = {
            "pos": np.arange(S2, dtype=np.int64) * 97 + 1000,
            "has": rng2.random(S2) > 0.05,
            "vtype": rng2.choice(np.array([1, 1, 2, 3], np.int8), S2),
            "gt": np.zeros(S2, np.int8),
            "ps": rng2.integers(1, 1 << 30, S2),
            "snp_ref": rng2.choice(np.frombuffer(b"ACGT", np.uint8), S2),
            "snp_alt": rng2.choice(np.frombuffer(b"ACGT", np.uint8), S2),
            "hp1c": rng2.choice(np.frombuffer(b"ACGT", np.uint8), S2),
            "hp2c": rng2.choice(np.frombuffer(b"ACGT", np.uint8), S2),
            "hp1_long": rng2.random(S2) > 0.8,
            "hp2_long": rng2.random(S2) > 0.8,
        }
        h1, h2, cps = germline_votes(walk, t, True)
        host = aggregate_reads(walk, t, h1, h2, cps)
        _os.environ["LPS_TAG_ENGINE"] = "device"
        try:
            dev = tag_kernels.germline_counts_device(walk, t, True)
            t0 = time.monotonic()
            dev = tag_kernels.germline_counts_device(walk, t, True)
            dev_ms = (time.monotonic() - t0) * 1e3
        finally:
            _os.environ.pop("LPS_TAG_ENGINE", None)
        ok_tag = all((np.asarray(a) == np.asarray(b)).all()
                     for a, b in zip(host, dev))
        lines.append({"metric": "tag_kernel_device_ok",
                      "value": int(ok_tag), "unit": "bool",
                      "vs_baseline": round(dev_ms, 1)})  # ms/call
    except Exception as e:  # noqa: BLE001
        print(f"bench tag_kernel_device failed: {e!r}", file=sys.stderr)
        lines.append({"metric": "tag_kernel_device_ok", "value": 0,
                      "unit": "bool", "vs_baseline": None})

    # roofline (v5e), see ARCHITECTURE.md "Speed of light": bits upload read
    # once + the XLA->Pallas plane handoff through HBM (write + read) + the
    # para/cross pair-sum handoff (write + read) + the sequential scan's
    # critical path. Gram materialization (~30 us today) is avoidable in
    # principle, so it is charged against us, not the bound.
    HBM_BPS = 819e9
    CLOCK = 0.94e9
    SCAN_CYCLES_PER_STEP = 30
    bits_bytes = T * R * ((L + 1) // 2)
    plane_bytes = 2 * S_pad * 8 * 128 * 4
    pc_bytes = 2 * 2 * S_pad * W * 4
    t_bw = (bits_bytes + plane_bytes + pc_bytes) / HBM_BPS
    t_scan = S_pad * SCAN_CYCLES_PER_STEP / CLOCK
    sol = t_bw + t_scan
    util = sol / per_call
    lines.append({"metric": "phase_kernel_util",
                  "value": round(util, 4), "unit": "fraction_of_sol",
                  "vs_baseline": round(per_call * 1e6, 1)})  # us/call


def main():
    # a Mosaic/device regression must fail the bench loudly, not silently
    # revert to the host packer (ADVICE r1: no invisible perf cliffs)
    os.environ.setdefault("LPS_STRICT_DEVICE", "1")
    # fresh container: build the reference baseline binary if it's absent
    # (tools/build_refbuild.sh is idempotent; failures just mean
    # vs_baseline falls back to the cached numbers / None)
    if not os.path.exists(REF_BIN):
        try:
            subprocess.run([os.path.join(ROOT, "tools", "build_refbuild.sh")],
                           check=True, capture_output=True, timeout=1200)
        except Exception as e:  # noqa: BLE001 — baseline is best-effort
            print(f"bench: reference build failed: {e!r}", file=sys.stderr)
    # a stalled remote-TPU tunnel must not hang the whole bench: probe it
    # in a disposable subprocess and fall back to CPU on timeout
    try:
        import jax
        from jax._src import xla_bridge

        from __graft_entry__ import _backend_responsive

        if not getattr(xla_bridge, "_backends", {}) \
                and not _backend_responsive():
            jax.config.update("jax_platforms", "cpu")
            print("bench: TPU tunnel unresponsive; CPU fallback",
                  file=sys.stderr)
    except Exception:  # noqa: BLE001 — probe is best-effort
        pass
    results = []  # (name, n_units, ours_s, ref_s|None)
    for fn in (bench_phase, bench_haplotag, bench_haplotag_cram,
               bench_somatic, bench_purity, bench_modcall):
        try:
            fn(results)
        except Exception as e:  # one broken pipeline must not hide the rest
            print(f"bench {fn.__name__} failed: {e!r}", file=sys.stderr)
            results.append((fn.__name__.replace("bench_", ""), 0,
                            float("nan"), None, []))

    lines = []
    try:
        writer_metrics(lines)
    except Exception as e:  # noqa: BLE001 — health metrics are best-effort
        print(f"bench writer_metrics failed: {e!r}", file=sys.stderr)
    try:
        device_metrics(lines)
    except Exception as e:  # noqa: BLE001 — health metrics are best-effort
        print(f"bench device_metrics failed: {e!r}", file=sys.stderr)
        lines.append({"metric": "pallas_compiled_ok", "value": 0,
                      "unit": "bool", "vs_baseline": None})
    med_ratios, min_ratios = [], []
    for name, n_units, ours_s, ref_s, reps in results:
        value = round(n_units / ours_s, 2) if ours_s and ours_s == ours_s else None
        vs = None
        line = {"metric": f"{name}_reads_per_s", "value": value,
                "unit": "alignments/s", "vs_baseline": vs}
        if reps and ours_s and ours_s == ours_s:
            vs = round(_median(reps), 4)
            med_ratios.append(vs)
            min_ratios.append(min(reps))
            line["vs_baseline"] = vs
            line["ratio_spread"] = [round(min(reps), 4), round(max(reps), 4)]
            line["reps"] = len(reps)
        lines.append(line)

    def _geo(rs):
        import math
        return round(math.exp(sum(math.log(r) for r in rs) / len(rs)), 4)

    geo = _geo(med_ratios) if med_ratios else None
    lines.append({"metric": "overall_speedup_geomean", "value": geo,
                  "unit": "x_vs_reference", "vs_baseline": geo,
                  # worst-rep geomean: the noise-band floor (VERDICT r4 #2 —
                  # "min ratio across reps" recorded so 5x is defensible)
                  "floor": _geo(min_ratios) if min_ratios else None})
    for line in lines:
        print(json.dumps(line))


if __name__ == "__main__":
    main()
