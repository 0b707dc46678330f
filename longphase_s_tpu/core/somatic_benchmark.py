"""Somatic read-level benchmark harness (SomaticBenchmark.{h,cpp}).

Loads a truth somatic VCF (+optional BED), records read-level observations
during the tagging pass, applies the reference's truth-based HP corrections,
and writes the Precision/Recall/F1 metrics report
(docs/somatic_haplotag.md:160-185 format).
"""

from __future__ import annotations

import sys
from dataclasses import dataclass, field

from ..io.bgzf import open_maybe_bgzf
from ..io.phased_vcf import NORMAL, TUMOR, TRUTH_SOMATIC, VarData
from .somatic_types import (NONE_SNP, READ_HP_STR, RH_H1, RH_H1_1, RH_H2,
                            RH_H2_1, RH_H3, RH_UNTAG, SOMATIC_H3)


@dataclass
class SomaticReadLog:
    chrom: str = ""
    read_id: str = ""
    hp_result: int = RH_UNTAG
    germline_similarity: float = 0.0
    derive_similarity: float = 0.0
    germline_snp_count: int = 0
    tumor_snp_count: int = 0
    somatic_snp_hp: dict = field(default_factory=dict)


@dataclass
class AlleleCounts:
    ref: int = 0
    alt: int = 0
    dels: int = 0


class SomaticReadBenchmark:
    def __init__(self, truth_vcf: str, truth_bed: str, mapq_threshold: int):
        self.truth_vcf = truth_vcf
        self.truth_bed = truth_bed
        self.mapq_threshold = mapq_threshold
        self.enabled = False
        self.loaded_bed = False
        self.bed_regions: dict[str, list[tuple[int, int]]] = {}
        # per chromosome
        self.pos_allele_counts: dict[str, dict[int, AlleleCounts]] = {}
        self.cover_truth_reads: dict[str, list[SomaticReadLog]] = {}
        self.tagged_somatic_reads: dict[str, list[SomaticReadLog]] = {}
        self.total_reads: dict[str, list[SomaticReadLog]] = {}
        # per-read scratch (truthSomaticPosVec)
        self._truth_pos_vec: list[tuple[int, int]] = []

    # -- loading -------------------------------------------------------
    def load_truth_vcf(self, chr_multi, info):
        """loadTruthSomaticVCF / parserProcess (SomaticBenchmark.cpp:280-337)."""
        if not self.enabled:
            return
        with open_maybe_bgzf(self.truth_vcf) as fh:
            for line in fh:
                line = line.rstrip("\n")
                if line.startswith("##"):
                    if "contig=" in line:
                        id_start = line.find("ID=") + 3
                        id_end = line.find(",length=")
                        len_start = id_end + 8
                        len_end = line.find(">")
                        chrom = line[id_start:id_end]
                        info.chr_vec.append(chrom)
                        info.chr_length[chrom] = int(line[len_start:len_end])
                    continue
                if line.startswith("#") or not line:
                    continue
                f = line.split()
                if len(f) < 5:
                    raise SystemExit(f"truth VCF format not supported: {line}")
                pos = int(f[1]) - 1
                var = VarData(ref=f[3], alt=f[4])
                chr_multi.setdefault(f[0], {}).setdefault(pos, {})[TRUTH_SOMATIC] = var

    def parse_bed(self):
        """parseBedFile (SomaticBenchmark.cpp:347-407)."""
        if not self.enabled or not self.truth_bed:
            return
        if "bed.gz" in self.truth_bed:
            print("[WARNING] BED .gz files are not supported.", file=sys.stderr)
            return
        valid = True
        with open(self.truth_bed) as f:
            for line in f:
                line = line.strip()
                if not line or line.startswith("#"):
                    continue
                parts = line.split()
                if len(parts) < 3:
                    valid = False
                    break
                chrom, start, end = parts[0], int(parts[1]), int(parts[2])
                if start < 0 or end <= start:
                    valid = False
                    break
                self.bed_regions.setdefault(chrom, []).append((start, end - 1))
        if valid:
            self.loaded_bed = True

    def mark_variants_in_bed(self, chr_vec, chr_multi, in_bed_flags):
        """markVariantsInBedRegions (SomaticBenchmark.cpp:418-506).

        ``in_bed_flags``: chr -> {pos: bool} output."""
        if not self.enabled or not self.loaded_bed:
            return
        for chrom in chr_vec:
            variants = chr_multi.get(chrom, {})
            flags = in_bed_flags.setdefault(chrom, {})
            regions = self.bed_regions.get(chrom, [])
            ri = 0
            for pos in sorted(variants):
                while ri < len(regions) and pos > regions[ri][1]:
                    ri += 1
                flags[pos] = (ri < len(regions)
                              and regions[ri][0] <= pos <= regions[ri][1])

    def remove_variants_out_bed(self, chr_multi, in_bed_flags):
        """removeVariantsOutBedRegion (SomaticBenchmark.cpp:517-553)."""
        if not self.enabled or not self.loaded_bed:
            return
        for chrom, variants in chr_multi.items():
            flags = in_bed_flags.get(chrom, {})
            for pos in list(variants):
                if flags.get(pos, False):
                    continue
                entry = variants[pos]
                has_tumor = TUMOR in entry
                has_truth = TRUTH_SOMATIC in entry
                if has_tumor or has_truth:
                    if NORMAL not in entry:
                        del variants[pos]
                    else:
                        entry.pop(TUMOR, None)
                        entry.pop(TRUTH_SOMATIC, None)

    # -- per-read recording (SomaticReadVerifier) ----------------------
    def record_ref_alt(self, chrom, pos, entry, base):
        """recordRefAltAlleleCount (SomaticBenchmark.cpp:51-70)."""
        if not self.enabled:
            return
        truth = entry.get(TRUTH_SOMATIC)
        if truth is None:
            return
        counts = self.pos_allele_counts.setdefault(chrom, {}).setdefault(
            pos, AlleleCounts())
        base_hp = NONE_SNP
        if base == truth.ref:
            counts.ref += 1
        elif base == truth.alt:
            counts.alt += 1
            base_hp = SOMATIC_H3
        self._truth_pos_vec.append((pos, base_hp))

    def record_del(self, chrom, pos, entry):
        """recordDelReadCount (SomaticBenchmark.cpp:29-39)."""
        if not self.enabled:
            return
        if TRUTH_SOMATIC not in entry:
            return
        self.pos_allele_counts.setdefault(chrom, {}).setdefault(
            pos, AlleleCounts()).dels += 1
        self._truth_pos_vec.append((pos, NONE_SNP))

    def _basic_log(self, chrom, read_id, hp_result, nor_sim, derive_sim, hp_count):
        return SomaticReadLog(
            chrom=chrom, read_id=read_id, hp_result=hp_result,
            germline_similarity=nor_sim, derive_similarity=derive_sim,
            germline_snp_count=hp_count[1] + hp_count[2],
            tumor_snp_count=hp_count[3])

    def record_tagged_read(self, chrom, read_id, hp_result, variants_hp,
                           hp_count, nor_sim, derive_sim, chr_variants):
        """recordTaggedRead (SomaticBenchmark.cpp:191-218)."""
        if not self.enabled or hp_result == RH_UNTAG:
            return
        log = self._basic_log(chrom, read_id, hp_result, nor_sim, derive_sim,
                              hp_count)
        exists = False
        for pos, snp_hp in variants_hp.items():
            entry = chr_variants.get(pos)
            if entry is not None and TRUTH_SOMATIC in entry and snp_hp == SOMATIC_H3:
                log.somatic_snp_hp[pos] = snp_hp
                exists = True
        if exists:
            self.tagged_somatic_reads.setdefault(chrom, []).append(log)
        self.total_reads.setdefault(chrom, []).append(log)

    def record_crossing_read(self, chrom, read_id, hp_result, variants_hp,
                             hp_count, nor_sim, derive_sim, chr_variants):
        """recordCrossingTruthSomaticSnpRead (SomaticBenchmark.cpp:120-174)."""
        if not self.enabled:
            return
        log = self._basic_log(chrom, read_id, hp_result, nor_sim, derive_sim,
                              hp_count)
        crossing = False
        exists_h3 = False
        for pos, base_hp in self._truth_pos_vec:
            if base_hp == SOMATIC_H3:
                exists_h3 = True
            log.somatic_snp_hp[pos] = base_hp
            crossing = True
        if crossing:
            if exists_h3:
                if hp_result == RH_H1:
                    log.hp_result = RH_H1_1
                elif hp_result == RH_H2:
                    log.hp_result = RH_H2_1
                elif hp_result == RH_UNTAG:
                    log.hp_result = RH_H3
            else:
                if hp_result == RH_H2_1:
                    log.hp_result = RH_H2
                elif hp_result == RH_H1_1:
                    log.hp_result = RH_H1
                elif hp_result == RH_H3:
                    log.hp_result = RH_UNTAG
            self.cover_truth_reads.setdefault(chrom, []).append(log)
        self._truth_pos_vec.clear()

    # -- reports -------------------------------------------------------
    def write_metrics_report(self, chr_vec, out_path):
        """writeTaggedSomaticReadReport -> writeReadLog
        (SomaticBenchmark.cpp:717-939)."""
        if not self.enabled:
            return
        self._write_read_log(chr_vec, out_path, self.tagged_somatic_reads)

    def write_total_truth_report(self, chr_vec, out_path):
        """writeTotalTruthSomaticReadReport (SomaticBenchmark.cpp:748-768):
        the same read-log layout over the reads covering truth positions."""
        if not self.enabled:
            return
        self._write_read_log(chr_vec, out_path, self.cover_truth_reads)

    def write_tagged_read_report(self, chr_vec, out_path):
        """writeTaggedReadReport (SomaticBenchmark.cpp:689-710): the read-log
        layout over every recorded (tagged-pass) read."""
        if not self.enabled:
            return
        self._write_read_log(chr_vec, out_path, self.total_reads)

    def write_pos_allele_count_log(self, chr_vec, out_path, chr_multi):
        """writePosAlleleCountLog (SomaticBenchmark.cpp:627-681).
        Positions print as stored (0-based) -- the reference does not add 1."""
        if not self.enabled:
            return
        total = sum(len(self.pos_allele_counts.get(c, {})) for c in chr_vec)
        with open(out_path, "w") as f:
            f.write("#############################\n")
            f.write("# Somatic SNP allele count #\n")
            f.write("#############################\n")
            f.write(f"##Benchmark VCF:{self.truth_vcf}\n")
            f.write(f"##MappingQualityThreshold:{self.mapq_threshold}\n")
            f.write(f"##Tatal variants:{total}\n")
            f.write("#CHROM\tPOS\tREF\tALT\tREF_COUNT\tALT_COUNT\tDEL_COUNT\n")
            for chrom in chr_vec:
                counts = self.pos_allele_counts.get(chrom, {})
                for pos in sorted(counts):
                    truth = chr_multi.get(chrom, {}).get(pos, {}).get(
                        TRUTH_SOMATIC)
                    ref = truth.ref if truth is not None else ""
                    alt = truth.alt if truth is not None else ""
                    c = counts[pos]
                    f.write(f"{chrom}\t{pos}\t{ref}\t{alt}\t"
                            f"{c.ref}\t{c.alt}\t{c.dels}\n")

    def write_bed_region_log(self, chr_vec, chr_multi, in_bed_flags,
                             out_prefix):
        """writeBedRegionLog (SomaticBenchmark.cpp:565-607): splits the
        surviving tumor variants into _var_in_bed.out / _var_out_bed.out.
        Runs after removeVariantsOutBedRegion, so the out-bed file normally
        holds only the header -- as in the reference."""
        if not self.enabled or not self.loaded_bed:
            return
        header = "#Chr\tPosition\tRef\tAlt\tVariant_Type\n"
        with open(out_prefix + "_var_in_bed.out", "w") as fin, \
                open(out_prefix + "_var_out_bed.out", "w") as fout:
            fin.write(header)
            fout.write(header)
            for chrom in chr_vec:
                flags = in_bed_flags.get(chrom, {})
                for pos in sorted(chr_multi.get(chrom, {})):
                    entry = chr_multi[chrom][pos]
                    tum = entry.get(TUMOR)
                    if tum is None:
                        continue
                    row = f"{chrom}\t{pos + 1}\t{tum.ref}\t{tum.alt}\tTUMOR\n"
                    if flags.get(pos, False):
                        fin.write(row)
                    else:
                        fout.write(row)

    def _write_read_log(self, chr_vec, out_path, read_vec_map):
        truth_map = {RH_H1_1: 0, RH_H2_1: 0, RH_H3: 0}
        tagged_truth_map = {RH_H1_1: 0, RH_H2_1: 0, RH_H3: 0}
        total_tagged_map = {RH_H1_1: 0, RH_H2_1: 0, RH_H3: 0}
        total_reads = 0
        total_truth = 0
        total_tagged_truth = 0
        total_tagged = 0
        for chrom in chr_vec:
            for r in self.cover_truth_reads.get(chrom, []):
                if r.hp_result in truth_map:
                    truth_map[r.hp_result] += 1
                    total_truth += 1
            for r in self.tagged_somatic_reads.get(chrom, []):
                if r.hp_result in tagged_truth_map:
                    total_tagged_truth += 1
                    tagged_truth_map[r.hp_result] += 1
            for r in self.total_reads.get(chrom, []):
                if r.hp_result in total_tagged_map:
                    total_tagged_map[r.hp_result] += 1
                    total_tagged += 1
                total_reads += 1

        def precision(tp, tp_fp):
            return 0.0 if tp_fp == 0 or tp == 0 else tp / tp_fp

        def recall(tp, tp_fn):
            return 0.0 if tp_fn == 0 or tp == 0 else tp / tp_fn

        def f1(r, p):
            return 0.0 if r == 0.0 or p == 0.0 else 2 * r * p / (r + p)

        o_recall = recall(total_tagged_truth, total_truth)
        o_precision = precision(total_tagged_truth, total_tagged)
        o_f1 = f1(o_recall, o_precision)

        w = 15
        with open(out_path, "w") as f:
            f.write("############################\n")
            f.write("# Somatic Haplotag Metrics #\n")
            f.write("############################\n")
            f.write(f"##Truth VCF File: {self.truth_vcf}\n")
            f.write(f"##Truth BED File: {self.truth_bed}\n")
            f.write(f"##MappingQualityThreshold: {self.mapq_threshold}\n")
            f.write(f"##Total reads: {total_reads}\n")
            f.write(f"##Total truth somatic reads: {total_truth}\n")
            f.write(f"##Total truth HP1-1: {truth_map[RH_H1_1]}\n")
            f.write(f"##Total truth HP2-1: {truth_map[RH_H2_1]}\n")
            f.write(f"##Total truth HP3: {truth_map[RH_H3]}\n")
            f.write(f"{'## Haplotype':<{w}}{'Precision':<{w}}{'Recall':<{w}}"
                    f"{'F1-Score':<{w}}{'TP':<{w}}{'FP':<{w}}{'FN':<{w}}\n")
            f.write("##" + "-" * 95 + "\n")
            for hp in (RH_H1_1, RH_H2_1, RH_H3):
                tp = tagged_truth_map[hp]
                fp = total_tagged_map[hp] - tagged_truth_map[hp]
                fn = truth_map[hp] - tagged_truth_map[hp]
                p = precision(tp, tp + fp)
                r = recall(tp, tp + fn)
                s = f1(r, p)
                label = "## HP" + READ_HP_STR[hp]
                f.write(f"{label:<{w}}{p:<{w}.4f}{r:<{w}.4f}{s:<{w}.4f}"
                        f"{tp:<{w}}{fp:<{w}}{fn:<{w}}\n")
            f.write("##" + "-" * 95 + "\n")
            f.write(f"{'## Overall':<{w}}{o_precision:<{w}.4f}"
                    f"{o_recall:<{w}.4f}{o_f1:<{w}.4f}"
                    f"{total_tagged_truth:<{w}}"
                    f"{total_tagged - total_tagged_truth:<{w}}"
                    f"{total_truth - total_tagged_truth:<{w}}\n")
            f.write("##\n")
            f.write("#CHROM\tREADID\tGERMLINE_VAR_SIMILARITY\t"
                    "DERIVE_BY_HP_SIMILARITY\tGERMLINE_SNP_COUNT\t"
                    "TUMOR_SNP_COUNT\tHAPLOTYPE\tTRUTH_VARIANT_POS,HP\n")
            for chrom in chr_vec:
                for r in read_vec_map.get(chrom, []):
                    # the C++ stream keeps fixed<<setprecision(4) from the
                    # metrics table above, so similarities print as 0.9444
                    f.write(f"{r.chrom}\t{r.read_id}\t"
                            f"{r.germline_similarity:.4f}\t"
                            f"{r.derive_similarity:.4f}\t"
                            f"{r.germline_snp_count}\t{r.tumor_snp_count}\t"
                            f"H{READ_HP_STR[r.hp_result]}\t")
                    for pos in sorted(r.somatic_snp_hp):
                        f.write(f"{pos + 1},{r.somatic_snp_hp[pos]}\t")
                    f.write("\n")


def _cpp_num(x: float) -> str:
    """C++ default ostream float formatting (6 significant digits)."""
    return f"{x:.6g}"
