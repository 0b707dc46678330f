"""Somatic variant recalibration engine (SomaticVarCaller.{h,cpp}).

Three stages over the tumor-normal pair:
1. extraction — per-position base/depth/read-HP statistics from the normal
   BAM (ExtractNorData*) and per-position somatic case statistics, per-read
   HP tallies and +-100bp mismatch windows from the tumor BAM
   (ExtractTumData*),
2. purity-tiered feature filters (TINC, messy-read, case-read count,
   haplotype consistency, variant cluster z-score, DenseAlt),
3. read-HP calibration + re-judgement + per-position derive-by statistics.
"""

from __future__ import annotations

import math
import sys

import numpy as np

from ..io.bam import (BAM_CDEL, BAM_CDIFF, BAM_CEQUAL, BAM_CHARD_CLIP,
                      BAM_CINS, BAM_CMATCH, BAM_CPAD, BAM_CREF_SKIP,
                      BAM_CSOFT_CLIP, SEQ_NT16, FLAG_SECONDARY,
                      FLAG_SUPPLEMENTARY, FLAG_UNMAP, BamReader,
                      region_bounds)
from ..io.phased_vcf import (NORMAL, PHASED_HETERO, TUMOR, UNPHASED_HETERO,
                             UNPHASED_HOMO, VT_DELETION, VT_INSERTION, VT_SNP)
from ..models.haplotag import _judge_snp_hap, judge_read_hap
from .cigar_walk import CigarWalk
from .somatic_judge import judge_somatic_read_hap, judge_somatic_snp_hap
from .somatic_types import (GERMLINE_H1, GERMLINE_H2, NONE_SNP, PosBase,
                            PosHpRecord, ReadVarHpCount, RH_H1, RH_H1_1,
                            RH_H2, RH_H2_1, RH_H3, RH_UNTAG, SOMATIC_H3,
                            SomaticData, calculate_base_common_info)

INTERVAL_SNP_MAX_DISTANCE = 5000


class FilterParams:
    """SomaticVarFilterParams + purity tier table
    (SomaticVarCaller.h:59-104, setFilterParamsWithPurity
    SomaticVarCaller.cpp:951-1060)."""

    def __init__(self):
        self.tumor_purity = 0.0
        self.nor_vaf_max = 0.130
        self.nor_depth_min = 1
        self.messy_ratio_thr = 1.0
        self.read_count_min = 1.0
        self.hapcon_read_count_max = 8.0
        self.hapcon_vaf_max = 0.020
        self.hapcon_somatic_read_min = 1.0
        self.interval_read_count_max = 8.0
        self.interval_vaf_max = 0.025
        self.interval_snp_count_min = 8.0
        self.zscore_max = 1.953
        # DenseAlt_condition*_thr are C++ float (SomaticVarCaller.h:85-86);
        # float32(0.6) > 0.6, so a ratio of exactly 0.6 (e.g. 3 alt / 2 ref)
        # must FAIL the >= compare like the reference (fuzz seed 10049)
        self.densealt_cond1 = float(np.float32(0.5))
        self.densealt_cond2 = float(np.float32(0.6))
        self.densealt_same_count_min = 3

    def set_with_purity(self, purity: float):
        # SomaticVarFilterParams.tumorPurity is a C++ float
        self.tumor_purity = float(np.float32(purity))
        if 0.9 <= purity <= 1.0:
            tier = (0.13, 1, 1.0, 3.0, 12.0, 0.144, 0.0, 12.0, 0.189, 4.0, 5.233)
        elif 0.7 <= purity < 0.9:
            tier = (0.13, 1, 1.0, 3.0, 10.0, 0.130, 1.0, 10.0, 0.133, 4.0, 2.676)
        elif 0.5 <= purity < 0.7:
            tier = (0.105, 1, 1.0, 1.0, 10.0, 0.071, 0.0, 10.0, 0.105, 4.0, 5.683)
        elif 0.3 <= purity < 0.5:
            tier = (0.117, 1, 1.0, 1.0, 8.0, 0.035, 1.0, 8.0, 0.049, 4.0, 3.043)
        else:
            tier = (0.130, 1, 1.0, 1.0, 8.0, 0.020, 1.0, 8.0, 0.025, 8.0, 1.953)
        # SomaticVarFilterParams fields are C++ float (SomaticVarCaller.h:
        # 59-104); keep the float32-exact values so threshold comparisons
        # round identically
        (self.nor_vaf_max, _depth, self.messy_ratio_thr,
         self.read_count_min, self.hapcon_read_count_max, self.hapcon_vaf_max,
         self.hapcon_somatic_read_min, self.interval_read_count_max,
         self.interval_vaf_max, self.interval_snp_count_min,
         self.zscore_max) = (float(np.float32(v)) for v in tier)
        self.nor_depth_min = int(tier[1])


# ---------------------------------------------------------------------------
# BAM iteration shared by extraction and tagging passes
# ---------------------------------------------------------------------------

def iter_somatic_reads(bam: BamReader, chrom: str, chrom_len,
                       positions, quality_threshold: int,
                       tag_supplementary: bool,
                       mapping_quality_filter: bool = False,
                       region: str = ""):
    """ChromosomeProcessor::processSingleChrom read dispatch
    (HaplotagParsingBam.cpp:421-499). Yields (rec, category) where category is
    'process' for reads reaching processRead; other categories mirror the
    reference's counters. A ranged ``region`` restricts the iterator the way
    sam_itr_querys does (HaplotagParsingBam.cpp:448-450)."""
    last_var = positions[-1] if positions else None
    beg, end = region_bounds(region, chrom_len) if region else (0, chrom_len)
    for rec in bam.fetch(chrom, beg, end):
        flag = rec.flag
        if mapping_quality_filter and rec.mapq < quality_threshold:
            yield rec, "low_quality"
        elif flag & FLAG_UNMAP:
            yield rec, "unmapped"
        elif flag & FLAG_SECONDARY:
            yield rec, "secondary"
        elif (flag & FLAG_SUPPLEMENTARY) and not tag_supplementary:
            yield rec, "supplementary"
        elif last_var is None:
            yield rec, "empty_variants"
        elif rec.pos <= last_var:
            yield rec, "process"
        else:
            yield rec, "other"


# ---------------------------------------------------------------------------
# Normal-BAM extraction (ExtractNorData*, SomaticVarCaller.cpp:75-293)
# ---------------------------------------------------------------------------

class ExtractNorWalker(CigarWalk):
    def __init__(self, positions, variants, ref_string, variant_base,
                 mpq_thr: int):
        super().__init__(positions, variants, ref_string)
        self.variant_base = variant_base      # pos -> PosBase
        self.mpq_thr = mpq_thr
        # per-read state
        self.hp_count = None
        self.variants_hp = None
        self.nor_count_ps = None
        self.tum_var_pos_vec = None

    def begin_read(self):
        self.hp_count = {1: 0, 2: 0}
        self.variants_hp = {}
        self.nor_count_ps = {}
        self.tum_var_pos_vec = []

    def process_match(self, pos, entry, base, is_alt, op_len, ci):
        tum = entry.get(TUMOR)
        if tum is not None and tum.variant_type in (VT_SNP, VT_INSERTION, VT_DELETION):
            self.tum_var_pos_vec.append(pos)
            pb = self.variant_base.setdefault(pos, PosBase())
            pb.count_base(base, self.rec.mapq, self.mpq_thr, is_alt,
                          tum.variant_type)
        nor = entry.get(NORMAL)
        if self.rec.mapq >= self.mpq_thr and nor is not None and \
                nor.gt == PHASED_HETERO:
            cigars = self.cigars
            if ci + 1 < len(cigars):
                next_op = cigars[ci + 1][0] \
                    if self.ref_pos + op_len - 1 == pos else -1
            else:
                next_op = None
            _judge_snp_hap(nor, base, next_op, self.hp_count, self.variants_hp,
                           self.nor_count_ps, pos)

    def process_deletion(self, pos, entry, op_len, ci, state):
        tum = entry.get(TUMOR)
        if tum is not None:
            self.tum_var_pos_vec.append(pos)
            pb = self.variant_base.setdefault(pos, PosBase())
            if tum.variant_type == VT_SNP:
                pb.count_deletion()
            elif tum.variant_type == VT_DELETION:
                pb.alt_count += 1
                pb.count_deletion()
        nor = entry.get(NORMAL)
        if self.rec.mapq >= self.mpq_thr and nor is not None and \
                not state["already"]:
            if nor.gt == PHASED_HETERO:
                state["already"] = True
                _germline_judge_deletion(
                    pos, nor, self.ref_pos, op_len, self.query_pos, self.seq,
                    self.ref_string, self.hp_count, self.variants_hp,
                    self.nor_count_ps)


def _germline_judge_deletion(pos, var, ref_pos, del_len, query_pos, seq,
                             ref_string, hp_count, variants_hp, count_ps):
    """GermlineHaplotagStrategy::judgeDeletionHap (HaplotagStrategy.cpp:147-209)."""
    from .alleles import homopolymer_length

    if ref_string == "":
        return
    if ref_pos + del_len + 1 == pos:
        return
    if not (ref_pos <= pos < ref_pos + del_len):
        return
    if homopolymer_length(pos, ref_string) < 3:
        return
    if var.variant_type == VT_SNP:
        base = SEQ_NT16[seq[query_pos]]
        if base == var.hp1:
            hp_count[1] += 1
            variants_hp[pos] = 0
        if base == var.hp2:
            hp_count[2] += 1
            variants_hp[pos] = 1
        count_ps[var.phased_set] = count_ps.get(var.phased_set, 0) + 1
    elif var.variant_type == VT_DELETION:
        hp1_long = len(var.hp1) != 1
        hp2_long = len(var.hp2) != 1
        if hp1_long and not hp2_long:
            hp_count[1] += 1
            variants_hp[pos] = 0
        elif not hp1_long and hp2_long:
            hp_count[2] += 1
            variants_hp[pos] = 1
        count_ps[var.phased_set] = count_ps.get(var.phased_set, 0) + 1


def extract_normal_chromosome(bam_path, chrom, chrom_len, positions, variants,
                              ref_string, sv_counts, cfg, fasta=None):
    """Per-chromosome normal-BAM pass. Returns pos -> PosBase."""
    variant_base: dict[int, PosBase] = {}
    walker = ExtractNorWalker(positions, variants, ref_string, variant_base,
                              cfg.quality_threshold)
    from ..io.cram import open_alignment
    bam = open_alignment(bam_path, fasta)
    try:
        if chrom not in bam.ref_id:
            return variant_base
        for rec, cat in iter_somatic_reads(bam, chrom, chrom_len, positions,
                                           cfg.quality_threshold,
                                           cfg.tag_supplementary,
                                           region=cfg.region):
            if cat != "process":
                continue
            walker.begin_read()
            walker.walk(rec)
            if rec.mapq >= cfg.quality_threshold:
                entry = sv_counts.get(rec.qname)
                if entry is not None:
                    walker.hp_count[1] += entry[0]
                    walker.hp_count[2] += entry[1]
            hp_result, _pq, _ps = judge_read_hap(
                walker.hp_count, cfg.percentage_threshold, walker.nor_count_ps)
            if hp_result == -1:
                hp_result = RH_UNTAG  # germline UNTAG(-1) -> ReadHP::unTag(0)
            for pos in walker.tum_var_pos_vec:
                pb = variant_base.setdefault(pos, PosBase())
                pb.read_hp_count[hp_result] = pb.read_hp_count.get(hp_result, 0) + 1
    finally:
        bam.close()
    # postProcess (SomaticVarCaller.cpp:176-210)
    for pos, pb in variant_base.items():
        tum = variants[pos].get(TUMOR)
        if tum is None:
            raise SystemExit(f"extractNorData:postProcess missing tumor var {pos}")
        if tum.variant_type in (VT_SNP, VT_INSERTION, VT_DELETION):
            calculate_base_common_info(pb, tum.alt, tum.variant_type)
    return variant_base


# ---------------------------------------------------------------------------
# Tumor-BAM extraction (ExtractTumData*, SomaticVarCaller.cpp:296-759)
# ---------------------------------------------------------------------------

def _process_cigar_operation(cigars, ci, end, direction, remaining, read_pos,
                             ref_pos):
    """processCigarOperation (SomaticVarCaller.cpp:627-653).
    Returns (ok, ci, remaining, read_pos, ref_pos, op)."""
    ci += direction
    while 0 <= ci < end:
        op, oplen = cigars[ci]
        if op in (BAM_CMATCH, BAM_CREF_SKIP, BAM_CPAD, BAM_CEQUAL, BAM_CDIFF):
            # note: reference's CIGAR_N==6 is BAM padding; faithful mapping
            remaining += oplen
            return True, ci, remaining, read_pos, ref_pos, op
        elif op == BAM_CINS:
            read_pos += oplen * direction
        elif op == BAM_CDEL:
            ref_pos += oplen * direction
        else:  # soft/hard clip or unknown
            return False, ci, remaining, read_pos, ref_pos, op
        ci += direction
    return False, ci, remaining, read_pos, ref_pos, 0


_SEQ_NT16_ASCII = np.frombuffer(SEQ_NT16.encode("ascii"), dtype=np.uint8)


def _order_windows_diff_fast(cigars, ci, seq_ascii, read_len, ref_arr,
                             read_pos, remaining, ref_pos, direction,
                             window=100):
    """Vectorized getOrderWindowsDiffRef (SomaticVarCaller.cpp:654-686).

    Identical step semantics to the scalar loop below (decrement-then-maybe-
    advance op transitions, N/P/X ops burning steps without moving, the
    refString[size()] quirk), but M/= runs compare whole segments with numpy.
    The scalar version is kept as the semantics oracle for the equivalence
    test."""
    end = len(cigars)
    ref_len = len(ref_arr)
    op = cigars[ci][0]
    out = []
    i = 1
    while i <= window:
        if remaining <= 1:
            remaining -= 1
            ok, ci, remaining, read_pos, ref_pos, op = \
                _process_cigar_operation(cigars, ci, end, direction,
                                         remaining, read_pos, ref_pos)
            if not ok:
                return out
            s = 1            # the transition step (already decremented)
        else:
            s = min(remaining - 1, window - i + 1)
            remaining -= s
        if op in (BAM_CDEL, BAM_CINS, BAM_CREF_SKIP, BAM_CPAD, BAM_CDIFF):
            i += s
            continue
        ks = np.arange(1, s + 1)
        rp = read_pos + direction * ks
        fp = ref_pos + direction * ks
        bad = (rp >= read_len) | (rp < 0) | (fp >= ref_len) | (fp < 0)
        n_cmp = s if not bad.any() else int(np.argmax(bad))
        if n_cmp:
            rpp = rp[:n_cmp]
            fpp = fp[:n_cmp]
            mism = np.nonzero(seq_ascii[rpp] != ref_arr[fpp])[0]
            for k in mism:
                out.append(((i + int(k)) * direction,
                            chr(seq_ascii[rpp[k]])))
        if n_cmp < s:
            # boundary step, original check order (SomaticVarCaller.cpp:664-681)
            rpk = int(rp[n_cmp])
            fpk = int(fp[n_cmp])
            if rpk > read_len or fpk > ref_len or rpk < 0 or fpk < 0:
                return out
            if rpk >= read_len:
                return out
            # fpk == ref_len: the quirk mismatch, then keep walking
            out.append(((i + n_cmp) * direction, chr(seq_ascii[rpk])))
            remaining += s - (n_cmp + 1)
            read_pos += direction * (n_cmp + 1)
            ref_pos += direction * (n_cmp + 1)
            i += n_cmp + 1
            continue
        read_pos += direction * s
        ref_pos += direction * s
        i += s
    return out


def _get_order_windows_diff_ref(cigars, ci, seq, read_len, ref_string, read_pos,
                                remaining, ref_pos, direction, window=100):
    """getOrderWindowsDiffRef (SomaticVarCaller.cpp:654-686)."""
    end = len(cigars)
    ref_len = len(ref_string)
    op = cigars[ci][0]
    out = []
    for i in range(1, window + 1):
        remaining -= 1
        if remaining == 0 or remaining == -1:
            ok, ci, remaining, read_pos, ref_pos, op = _process_cigar_operation(
                cigars, ci, end, direction, remaining, read_pos, ref_pos)
            if not ok:
                return out
        if op in (BAM_CDEL, BAM_CINS, BAM_CREF_SKIP, BAM_CPAD, BAM_CDIFF):
            continue
        read_pos += direction
        ref_pos += direction
        if read_pos > read_len or ref_pos > ref_len or read_pos < 0 or ref_pos < 0:
            return out
        if read_pos >= read_len:
            # unreachable in practice (cigar walk stops at read end); guard
            return out
        read_base = SEQ_NT16[seq[read_pos]]
        if ref_pos == ref_len:
            # reference quirk: refString[size()] yields '\0', always recorded
            # as a mismatch before the next step runs off the window
            out.append((i * direction, read_base))
            continue
        ref_base = ref_string[ref_pos]
        if read_base != ref_base:
            out.append((i * direction, read_base))
    return out


def get_windows_diff_ref(cigars, ci, seq, read_len, ref_string, query_pos,
                         read_offset, ref_pos, window=100):
    """getWindowsDiffRef (SomaticVarCaller.cpp:688-710).

    ``seq`` is the read as ASCII uint8, ``ref_string`` the chromosome as
    ASCII uint8. When the +-window fits entirely inside the current M op and
    all bounds, a single vectorized compare replaces both directional walks
    (provably identical: no op transition, no boundary case can trigger)."""
    op, oplen = cigars[ci]
    if (op in (BAM_CMATCH, BAM_CEQUAL)
            and read_offset >= window + 1
            and oplen - read_offset >= window + 1):
        read_pos = query_pos + read_offset
        if (read_pos >= window and read_pos + window < read_len
                and ref_pos >= window and ref_pos + window < len(ref_string)):
            s_lo = seq[read_pos - window:read_pos + window + 1]
            r_lo = ref_string[ref_pos - window:ref_pos + window + 1]
            neq = s_lo != r_lo
            out = []
            for k in np.nonzero(neq[:window])[0]:
                # window index k holds position read_pos-(window-k) = step i
                out.append((-(window - int(k)), chr(s_lo[k])))
            out.reverse()  # reverse walk emits i=1..window (descending pos)
            for k in np.nonzero(neq[window + 1:])[0]:
                out.append((int(k) + 1, chr(s_lo[window + 1 + k])))
            return out
    fwd_remaining = 0
    rev_remaining = 0
    read_pos = query_pos + read_offset
    if op != BAM_CINS:
        fwd_remaining = max(oplen - read_offset, 0)
        rev_remaining = max(read_offset, 0)
    out = []
    out += _order_windows_diff_fast(cigars, ci, seq, read_len, ref_string,
                                    read_pos, rev_remaining, ref_pos, -1,
                                    window)
    out += _order_windows_diff_fast(cigars, ci, seq, read_len, ref_string,
                                    read_pos, fwd_remaining, ref_pos, 1,
                                    window)
    return out


class ExtractTumWalker(CigarWalk):
    def __init__(self, positions, variants, ref_string, somatic_pos_info,
                 mpq_thr: int):
        super().__init__(positions, variants, ref_string)
        self.somatic_pos_info = somatic_pos_info  # pos -> SomaticData
        self.mpq_thr = mpq_thr
        self.ref_arr = np.frombuffer(ref_string.encode("latin-1"), np.uint8)
        self._seq_ascii = None
        self.hp_count = None
        self.variants_hp = None
        self.nor_count_ps = None
        self.tum_count_ps = None
        self.tumor_allele_pos_vec = None
        self.tumor_snp_pos_vec = None

    def begin_read(self):
        self.hp_count = {1: 0, 2: 0, 3: 0, 4: 0}
        self.variants_hp = {}
        self.nor_count_ps = {}
        self.tum_count_ps = {}
        self.tumor_allele_pos_vec = []
        self.tumor_snp_pos_vec = []
        self._seq_ascii = None

    def process_match(self, pos, entry, base, is_alt, op_len, ci):
        offset = pos - self.ref_pos
        if self._seq_ascii is None:
            self._seq_ascii = _SEQ_NT16_ASCII[self.seq]
        offset_base = get_windows_diff_ref(
            self.cigars, ci, self._seq_ascii, self.rec.l_seq, self.ref_arr,
            self.query_pos, offset, pos)
        if self.rec.mapq >= self.mpq_thr:
            judge_somatic_snp_hap(pos, entry, base, is_alt, self.hp_count,
                                  self.nor_count_ps, self.tum_count_ps,
                                  self.variants_hp, self.tumor_allele_pos_vec,
                                  "extract")
            if TUMOR in entry:
                self.tumor_snp_pos_vec.append(pos)
        tum = entry.get(TUMOR)
        if tum is not None and tum.variant_type in (VT_SNP, VT_INSERTION, VT_DELETION):
            sd = self.somatic_pos_info.setdefault(pos, SomaticData())
            if tum.variant_type != VT_SNP or (tum.ref == base or tum.alt == base):
                sd.allele_count[int(is_alt)] += 1
                sd.offset_bases[int(is_alt)].extend(offset_base)
            sd.base.count_base(base, self.rec.mapq, self.mpq_thr, is_alt,
                               tum.variant_type)

    def process_deletion(self, pos, entry, op_len, ci, state):
        tum = entry.get(TUMOR)
        if tum is not None:
            sd = self.somatic_pos_info.setdefault(pos, SomaticData())
            if tum.variant_type == VT_SNP:
                sd.base.count_deletion()
            elif tum.variant_type == VT_DELETION:
                sd.base.alt_count += 1
                sd.base.count_deletion()


def classify_reads_by_case(tumor_allele_pos_vec, nor_count_ps, hp_count,
                           somatic_pos_info):
    """classifyReadsByCase (SomaticVarCaller.cpp:462-518)."""
    record_read = True
    if len(nor_count_ps) > 1:
        record_read = False
    zero_count = 0
    if hp_count[1] == 0:
        zero_count += 1
    if hp_count[2] == 0:
        zero_count += 1
    if hp_count[3] == 0 and hp_count[4] == 0:
        raise SystemExit("classifyReadsByCase: hp3 or hp4 count is 0")
    tag_clean = False
    if zero_count in (1, 2) and hp_count[3] != 0:
        tag_clean = True
    elif hp_count[1] + hp_count[2] != 0:
        hp1_ratio = hp_count[1] / (hp_count[1] + hp_count[2])
        hp2_ratio = hp_count[2] / (hp_count[1] + hp_count[2])
        if hp1_ratio >= 1.0 or hp2_ratio >= 1.0:
            tag_clean = True
    for pos in tumor_allele_pos_vec:
        sd = somatic_pos_info.setdefault(pos, SomaticData())
        if not record_read:
            sd.untag += 1
        elif tag_clean:
            sd.total_clean_hp3_read += 1
            if hp_count[1] == 0 and hp_count[2] == 0 and hp_count[3] != 0:
                sd.pure_h3_read += 1
            elif hp_count[1] != 0 and hp_count[2] == 0:
                sd.pure_h1_1_read += 1
            elif hp_count[1] == 0 and hp_count[2] != 0:
                sd.pure_h2_1_read += 1
        else:
            sd.mixed_hp_read += 1


def extract_tumor_chromosome(bam_path, chrom, chrom_len, positions, variants,
                             ref_string, cfg, fasta=None):
    """Per-chromosome tumor-BAM pass. Returns (somatic_pos_info,
    read_hp_result_set, tumor_pos_read_corr_base_hp)."""
    somatic_pos_info: dict[int, SomaticData] = {}
    read_hp_result_set: dict[str, ReadVarHpCount] = {}
    tumor_pos_read_corr: dict[int, dict[str, int]] = {}
    walker = ExtractTumWalker(positions, variants, ref_string,
                              somatic_pos_info, cfg.quality_threshold)
    from ..io.cram import open_alignment
    bam = open_alignment(bam_path, fasta)
    try:
        if chrom not in bam.ref_id:
            return somatic_pos_info, read_hp_result_set, tumor_pos_read_corr
        for rec, cat in iter_somatic_reads(bam, chrom, chrom_len, positions,
                                           cfg.quality_threshold,
                                           cfg.tag_supplementary,
                                           region=cfg.region):
            if cat != "process":
                continue
            walker.begin_read()
            walker.walk(rec)
            hp_result, _pq, _ns, _ts = judge_somatic_read_hap(
                walker.hp_count, walker.nor_count_ps, cfg.percentage_threshold)

            if walker.tumor_allele_pos_vec:
                classify_reads_by_case(walker.tumor_allele_pos_vec,
                                       walker.nor_count_ps, walker.hp_count,
                                       somatic_pos_info)
                for pos in walker.tumor_allele_pos_vec:
                    base_hp = walker.variants_hp.get(pos, NONE_SNP)
                    if base_hp != SOMATIC_H3:
                        raise SystemExit("SomaticStatisticSomaticPosInfo: "
                                         f"baseHP is not HP3 at {pos}")
                    if hp_result in (RH_H1_1, RH_H2_1, RH_H3, RH_UNTAG):
                        sd = somatic_pos_info[pos]
                        sd.somatic_read_hp_count[hp_result] = \
                            sd.somatic_read_hp_count.get(hp_result, 0) + 1
                    elif hp_result in (RH_H1, RH_H2):
                        raise SystemExit("error somatic read HP")

            if walker.tumor_snp_pos_vec:
                read_id = rec.qname
                if read_id in read_hp_result_set:
                    read_hp_result_set[read_id].read_id_count += 1
                    read_id = (read_id + "-"
                               + str(read_hp_result_set[rec.qname].read_id_count))
                r = ReadVarHpCount(
                    hp1=walker.hp_count[1], hp2=walker.hp_count[2],
                    hp3=walker.hp_count[3], hp4=walker.hp_count[4],
                    nor_count_ps=dict(walker.nor_count_ps),
                    start_pos=rec.pos + 1, end_pos=walker.ref_pos,
                    read_length=walker.query_pos, hp_result=hp_result)
                # posHpPairs for the somatic read logs
                # (SomaticVarCaller.cpp:428-446)
                has_somatic = walker.hp_count[3] > 0 or walker.hp_count[4] > 0
                if hp_result in (RH_H1_1, RH_H2_1, RH_H3) or \
                        (has_somatic and hp_result in (RH_UNTAG, RH_H1, RH_H2)):
                    r.pos_hp_pairs = sorted(
                        (pos + 1, base_hp)
                        for pos, base_hp in walker.variants_hp.items())
                read_hp_result_set[read_id] = r
                for pos in walker.tumor_snp_pos_vec:
                    base_hp = walker.variants_hp.get(pos, NONE_SNP)
                    tumor_pos_read_corr.setdefault(pos, {})[read_id] = base_hp
                    sd = somatic_pos_info.setdefault(pos, SomaticData())
                    sd.base.read_hp_count[hp_result] = \
                        sd.base.read_hp_count.get(hp_result, 0) + 1
    finally:
        bam.close()

    # postProcess (SomaticVarCaller.cpp:520-603)
    for pos, sd in somatic_pos_info.items():
        tum = variants[pos].get(TUMOR)
        if tum is None:
            raise SystemExit(f"extractTumData:postProcess missing tumor var {pos}")
        if tum.variant_type in (VT_SNP, VT_INSERTION, VT_DELETION):
            total_clean = sd.total_clean_hp3_read
            sd.case_read_count = total_clean + sd.mixed_hp_read
            if sd.case_read_count != 0:
                denom = float(total_clean) + float(sd.mixed_hp_read)
                # float32 divisions (SomaticVarCaller.cpp:548-551)
                fd = np.float32(denom)
                sd.mixed_hp_ratio = float(np.float32(sd.mixed_hp_read) / fd)
                sd.pure_h1_1_ratio = float(np.float32(sd.pure_h1_1_read) / fd)
                sd.pure_h2_1_ratio = float(np.float32(sd.pure_h2_1_read) / fd)
                sd.pure_h3_ratio = float(np.float32(sd.pure_h3_read) / fd)
            calculate_base_common_info(sd.base, tum.alt, tum.variant_type)
            h1 = sd.base.read_hp_count.get(RH_H1, 0)
            h2 = sd.base.read_hp_count.get(RH_H2, 0)
            h1_1 = sd.base.read_hp_count.get(RH_H1_1, 0)
            h2_1 = sd.base.read_hp_count.get(RH_H2_1, 0)
            b1 = h1 + h1_1
            b2 = h2 + h2_1
            from .somatic_types import _imbalance

            sd.allelic_imbalance = _imbalance(b1, b2, b1 + b2)
            sd.somatic_hp_imbalance = _imbalance(h1_1, h2_1, h1_1 + h2_1)
            if tum.gt == UNPHASED_HOMO:
                sd.gt_type = "Homo"
            elif tum.gt == PHASED_HETERO:
                sd.gt_type = "Hetero"
            elif tum.gt == UNPHASED_HETERO:
                sd.gt_type = "UnphasedHetero"
            else:
                raise SystemExit(f"GTtype missing at {pos}")
    return somatic_pos_info, read_hp_result_set, tumor_pos_read_corr


# ---------------------------------------------------------------------------
# Calling stages (dense intervals, filters, calibration)
# ---------------------------------------------------------------------------

def get_dense_tumor_snp_interval(somatic_pos_info, read_hp_result_set,
                                 tumor_pos_read_corr):
    """getDenseTumorSnpInterval (SomaticVarCaller.cpp:1232-1353)."""
    for pos, reads in tumor_pos_read_corr.items():
        read_count = 0.0
        alt_mean = 0.0
        for read_id, base_hp in reads.items():
            if base_hp != SOMATIC_H3:
                continue
            read_count += 1
            r = read_hp_result_set.get(read_id)
            if r is None:
                raise SystemExit(f"readID not found in readHpResultSet: {read_id}")
            alt_mean += r.hp3
        if alt_mean != 0:
            # C++ accumulates in float: integer sums are float32-exact, so
            # only the division rounds — mirror it (SomaticVarCaller.cpp:1266)
            alt_mean = float(np.float32(alt_mean) / np.float32(read_count))
        if pos not in somatic_pos_info:
            raise SystemExit(f"somaticPosInfo not found: {pos}")
        somatic_pos_info[pos].mean_alt_per_var_read = alt_mean

    intervals = {}  # start -> (end, {pos: alt_mean}, snp_count, {pos: min_dist})
    keys = sorted(somatic_pos_info)
    recording = False
    start = 0
    snp_alt_mean = {}
    min_dist = {}
    snp_count = 0
    for idx in range(len(keys)):
        cur = keys[idx]
        if idx + 1 < len(keys):
            nxt = keys[idx + 1]
            dist = nxt - cur
            if dist <= INTERVAL_SNP_MAX_DISTANCE:
                if not recording:
                    recording = True
                    start = cur
                    snp_alt_mean[cur] = somatic_pos_info[cur].mean_alt_per_var_read
                    min_dist[cur] = dist
                    snp_count += 1
                if dist < min_dist.get(cur, 0):
                    min_dist[cur] = dist
                snp_alt_mean[nxt] = somatic_pos_info[nxt].mean_alt_per_var_read
                min_dist[nxt] = dist
                snp_count += 1
            else:
                if recording:
                    intervals[start] = (cur, dict(snp_alt_mean), snp_count,
                                        dict(min_dist))
                    recording = False
                    start = 0
                    snp_alt_mean = {}
                    min_dist = {}
                    snp_count = 0
    if recording:
        end = keys[-1]
        if end - start <= INTERVAL_SNP_MAX_DISTANCE:
            intervals[start] = (end, dict(snp_alt_mean), snp_count,
                                dict(min_dist))

    out_intervals = {}
    for start, (end, alt_means, count, mdist) in intervals.items():
        n = len(alt_means)
        mean = sum(alt_means.values()) / n if n else 0.0
        var = sum((v - mean) ** 2 for v in alt_means.values()) / n if n else 0.0
        std = math.sqrt(var)
        zscores = {pos: (0.0 if std == 0 else (v - mean) / std)
                   for pos, v in alt_means.items()}
        out_intervals[start] = (end, alt_means, count, mdist, mean, std, zscores)
        if count <= 1:
            continue
        for pos, z in zscores.items():
            sd = somatic_pos_info[pos]
            sd.in_dense_interval = True
            # SomaticData.zScore is a C++ float (HaplotagType.h:262)
            sd.z_score = float(np.float32(abs(z)))
            sd.interval_snp_count = count
        for pos, d in mdist.items():
            somatic_pos_info[pos].min_distance = d
    return out_intervals


def somatic_feature_filter(params: FilterParams, variants, somatic_pos_info,
                           nor_base, enable_filter: bool):
    """somaticFeatureFilter (SomaticVarCaller.cpp:1062-1230)."""
    for pos, sd in somatic_pos_info.items():
        tum = variants[pos].get(TUMOR)
        if tum is None:
            raise SystemExit(f"somaticFeatureFilter missing tumor var {pos}")
        if tum.variant_type not in (VT_SNP, VT_INSERTION, VT_DELETION):
            continue
        sd.is_filter_out = False

        nb = nor_base.get(pos, PosBase())
        nor_vaf = nb.vaf
        nor_depth = nb.depth
        stage1 = not (nor_vaf <= params.nor_vaf_max
                      and nor_depth > params.nor_depth_min)
        sd.filtered_by_tinc = stage1

        messy = sd.mixed_hp_ratio >= params.messy_ratio_thr
        sd.filtered_by_messy = messy

        read_count_f = sd.case_read_count <= params.read_count_min
        sd.filtered_by_read_count = read_count_f

        hap_f = False
        h1_1 = sd.somatic_read_hp_count.get(RH_H1_1, 0)
        h2_1 = sd.somatic_read_hp_count.get(RH_H2_1, 0)
        if sd.case_read_count <= params.hapcon_read_count_max and \
                sd.base.vaf <= params.hapcon_vaf_max:
            if h1_1 > params.hapcon_somatic_read_min and \
                    h2_1 > params.hapcon_somatic_read_min:
                hap_f = True
        sd.filtered_by_hap_consistency = hap_f

        z_f = False
        if sd.case_read_count <= params.interval_read_count_max and \
                sd.base.vaf <= params.interval_vaf_max:
            if sd.interval_snp_count > params.interval_snp_count_min and \
                    0.0 <= sd.z_score <= params.zscore_max:
                z_f = True
        sd.filtered_by_variant_cluster = z_f

        dense_f = False
        # C-speed counting: these two loops dominate the filter at WGS
        # scale (30x depth -> dozens of offsets per variant)
        from collections import Counter
        ref_offsets = Counter(off for off, _b in sd.offset_bases[0])
        alt_offsets = Counter(off for off, _b in sd.offset_bases[1])
        alt_count = sd.base.alt_count
        same_count = 0
        for off in sorted(alt_offsets):
            aa = alt_offsets[off]
            ra = ref_offsets.get(off, 0)
            cond1 = aa / alt_count if alt_count else math.inf
            cond2 = aa / (ra + aa)
            if cond1 >= params.densealt_cond1 and cond2 >= params.densealt_cond2:
                same_count += 1
                if same_count == params.densealt_same_count_min:
                    break
        sd.dense_alt_same_count = same_count
        if same_count >= params.densealt_same_count_min:
            dense_f = True
        sd.filtered_by_dense_alt = dense_f

        if stage1 or messy or read_count_f or hap_f or z_f or dense_f:
            sd.is_filter_out = True
        if enable_filter and sd.is_filter_out:
            continue
        sd.is_high_con = True


def calibrate_read_hp(somatic_pos_info, read_hp_result_set, tumor_pos_read_corr):
    """calibrateReadHP (SomaticVarCaller.cpp:1366-1405)."""
    for pos, sd in somatic_pos_info.items():
        if sd.is_high_con:
            continue
        reads = tumor_pos_read_corr.get(pos)
        if reads is None:
            raise SystemExit(f"calibrate read HP missing pos {pos}")
        for read_id, base_hp in reads.items():
            if base_hp == SOMATIC_H3:
                read_hp_result_set[read_id].hp3 -= 1
                if read_hp_result_set[read_id].hp3 < 0:
                    raise SystemExit("read HP3 SNP count < 0")


def calculate_read_set_hp(read_hp_result_set, percentage_threshold):
    """calculateReadSetHP (SomaticVarCaller.cpp:1418-1439), vectorized:
    the per-read judge consumes nor_count_ps only through len(...) > 1 and
    hp4 is always 0 (findOtherSomaticSnpHP is dead in the reference), so
    the batched judge_somatic_reads computes identical hp_result values
    (equality locked by the somatic goldens and the device-parity tests)."""
    rs = list(read_hp_result_set.values())
    if not rs:
        return
    from .somatic_fast import judge_somatic_reads

    n = len(rs)
    h1 = np.fromiter((r.hp1 for r in rs), np.int64, n)
    h2 = np.fromiter((r.hp2 for r in rs), np.int64, n)
    h3 = np.fromiter((r.hp3 for r in rs), np.int64, n)
    nps = np.fromiter((len(r.nor_count_ps) for r in rs), np.int64, n)
    hp, _pq, _ns, _hs, _cross, _wo = judge_somatic_reads(
        h1, h2, h3, nps, percentage_threshold)
    for r, v in zip(rs, hp.tolist()):
        r.hp_result = v


def statistic_somatic_pos_read_hp(somatic_pos_info, tumor_pos_read_corr,
                                  read_hp_result_set, distri=None):
    """statisticSomaticPosReadHP (SomaticVarCaller.cpp:1441-1518).

    When `distri` (a dict pos -> PosHpRecord) is supplied it plays the role
    of the caller's chrReadHpResult (`localReadHpDistri`), feeding the
    _read_distri_scaller logs."""
    for pos, sd in somatic_pos_info.items():
        if not sd.is_high_con:
            continue
        reads = tumor_pos_read_corr.get(pos)
        if reads is None:
            raise SystemExit(f"statistic read HP missing pos {pos}")
        rec = None
        if distri is not None:
            rec = distri[pos] = PosHpRecord()
        derive = {RH_H1_1: 0, RH_H2_1: 0}
        for read_id, base_hp in reads.items():
            hp_result = read_hp_result_set[read_id].hp_result
            if rec is not None:
                rec.record_read_hp(hp_result, base_hp)
            if base_hp == SOMATIC_H3:
                if hp_result in derive:
                    derive[hp_result] += 1
        total = derive[RH_H1_1] + derive[RH_H2_1]
        hp1_ratio = derive[RH_H1_1] / total if total > 0 and derive[RH_H1_1] > 0 else 0.0
        hp2_ratio = derive[RH_H2_1] / total if total > 0 and derive[RH_H2_1] > 0 else 0.0
        if hp1_ratio >= 1.0:
            sd.somatic_read_derive_by_hp = GERMLINE_H1
        elif hp2_ratio >= 1.0:
            sd.somatic_read_derive_by_hp = GERMLINE_H2
        else:
            sd.somatic_read_derive_by_hp = NONE_SNP
            if rec is not None and (0 < hp1_ratio < 1.0 or 0 < hp2_ratio < 1.0):
                rec.exist_derive_h1h2 = True
        if rec is not None:
            rec.record_derive_hp(sd.somatic_read_derive_by_hp, 0.0)
