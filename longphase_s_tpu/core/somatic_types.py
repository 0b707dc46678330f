"""Somatic data records and base-count analysis (HaplotagType.h:165-294,
HaplotagStrategy.h base_analysis namespace)."""

from __future__ import annotations

from dataclasses import dataclass, field

# SnpHP (HaplotagType.h:87-95)
NONE_SNP = 0
GERMLINE_H1 = 1
GERMLINE_H2 = 2
SOMATIC_H3 = 3
SOMATIC_H4 = 4

# ReadHP (HaplotagType.h:97-108)
RH_UNTAG = 0
RH_H1 = 1
RH_H2 = 2
RH_H3 = 3
RH_H4 = 4
RH_H1_1 = 5
RH_H1_2 = 6
RH_H2_1 = 7
RH_H2_2 = 8

READ_HP_STR = {
    RH_UNTAG: ".", RH_H1: "1", RH_H2: "2", RH_H3: "3", RH_H4: "4",
    RH_H1_1: "1-1", RH_H1_2: "1-2", RH_H2_1: "2-1", RH_H2_2: "2-2",
}


@dataclass(slots=True)
class PosBase:
    """Per-position base counters (HaplotagType.h:165-224)."""

    alt_count: int = 0
    counts: dict = field(default_factory=lambda: {"A": 0, "C": 0, "G": 0, "T": 0})
    unknown: int = 0
    depth: int = 0
    del_count: int = 0
    mpq_alt_count: int = 0
    mpq_counts: dict = field(default_factory=lambda: {"A": 0, "C": 0, "G": 0, "T": 0})
    mpq_unknown: int = 0
    mpq_depth: int = 0
    vaf: float = 0.0
    non_del_vaf: float = 0.0
    mpq_vaf: float = 0.0
    low_mpq_read_ratio: float = 0.0
    del_ratio: float = 0.0
    germline_hp_imbalance: float = 0.0
    pct_germline_hp: float = 0.0
    read_hp_count: dict = field(default_factory=dict)

    def count_base(self, base: str, mapq: int, mpq_thr: float, is_alt: bool,
                   variant_type: int):
        """CigarParser::countBaseNucleotide (HaplotagParsingBam.cpp:682-719)."""
        from ..io.phased_vcf import VT_DELETION

        if mapq >= mpq_thr:
            if base in self.mpq_counts:
                self.mpq_counts[base] += 1
            else:
                self.mpq_unknown += 1
            if is_alt:
                self.mpq_alt_count += 1
            self.mpq_depth += 1
        if base in self.counts:
            self.counts[base] += 1
        else:
            self.unknown += 1
        if is_alt:
            if variant_type == VT_DELETION:
                self.del_count += 1
            self.alt_count += 1
        self.depth += 1

    def count_deletion(self):
        """countDeletionBase (HaplotagParsingBam.cpp:727-730)."""
        self.del_count += 1
        self.depth += 1


def _vaf(alt: int, depth: int) -> float:
    """base_analysis::calculateVAF — float32 division (HaplotagStrategy.h:164)."""
    import numpy as np
    return 0.0 if depth == 0 or alt == 0 else \
        float(np.float32(alt) / np.float32(depth))


def _imbalance(h1: int, h2: int, total: int) -> float:
    """base_analysis::calculateHaplotypeImbalanceRatio."""
    if h1 > 0 and h2 > 0:
        return (h1 if h1 > h2 else h2) / total
    if h1 == 0 and h2 == 0:
        return 0.0
    return 1.0


def calculate_base_common_info(base: PosBase, tumor_alt: str, variant_type: int):
    """tumor_normal_analysis::calculateBaseCommonInfo (SomaticVarCaller.cpp:13-40)."""
    from ..io.phased_vcf import VT_DELETION, VT_INSERTION, VT_SNP

    if variant_type == VT_SNP:
        alt = base.counts.get(tumor_alt, 0)
        mpq_alt = base.mpq_counts.get(tumor_alt, 0)
    elif variant_type in (VT_INSERTION, VT_DELETION):
        alt = base.alt_count
        mpq_alt = base.mpq_alt_count
    else:
        alt = 0
        mpq_alt = 0
    base.vaf = _vaf(alt, base.depth)
    base.mpq_vaf = _vaf(mpq_alt, base.mpq_depth)
    base.non_del_vaf = _vaf(alt, base.depth - base.del_count)
    import numpy as np
    base.low_mpq_read_ratio = (0.0 if base.depth == 0
                               else float(np.float32(base.depth - base.mpq_depth)
                                          / np.float32(base.depth)))
    base.del_ratio = _vaf(base.del_count, base.depth)
    h1 = base.read_hp_count.get(RH_H1, 0)
    h2 = base.read_hp_count.get(RH_H2, 0)
    total = h1 + h2
    base.germline_hp_imbalance = _imbalance(h1, h2, total)
    base.pct_germline_hp = (0.0 if base.depth == 0 or total == 0
                            else total / base.depth)


@dataclass(slots=True)
class SomaticData:
    """Per-tumor-SNP statistics (HaplotagType.h:226-294)."""

    total_clean_hp3_read: int = 0
    pure_h1_1_read: int = 0
    pure_h2_1_read: int = 0
    pure_h3_read: int = 0
    mixed_hp_read: int = 0
    untag: int = 0
    case_read_count: int = 0
    pure_h1_1_ratio: float = 0.0
    pure_h2_1_ratio: float = 0.0
    pure_h3_ratio: float = 0.0
    mixed_hp_ratio: float = 0.0
    base: PosBase = field(default_factory=PosBase)
    gt_type: str = ""
    is_high_con: bool = False
    somatic_read_derive_by_hp: int = 0
    statistic_purity: bool = False
    allelic_imbalance: float = 0.0
    somatic_hp_imbalance: float = 0.0
    mean_alt_per_var_read: float = 0.0
    z_score: float = 0.0
    interval_snp_count: int = 0
    min_distance: int = 0
    in_dense_interval: bool = False
    dense_alt_same_count: int = 0
    filtered_by_tinc: bool = False
    filtered_by_messy: bool = False
    filtered_by_read_count: bool = False
    filtered_by_hap_consistency: bool = False
    filtered_by_variant_cluster: bool = False
    filtered_by_dense_alt: bool = False
    is_filter_out: bool = False
    somatic_read_hp_count: dict = field(default_factory=dict)
    # 0: ref-supporting reads' window mismatches, 1: alt-supporting
    offset_bases: tuple = field(default_factory=lambda: ([], []))
    allele_count: list = field(default_factory=lambda: [0, 0])


@dataclass(slots=True)
class ReadVarHpCount:
    """Per-read haplotype tallies from the tumor extraction pass
    (SomaticVarCaller.h ReadVarHpCount)."""

    hp1: int = 0
    hp2: int = 0
    hp3: int = 0
    hp4: int = 0
    nor_count_ps: dict = field(default_factory=dict)
    start_pos: int = 0
    end_pos: int = 0
    read_length: int = 0
    hp_result: int = RH_UNTAG
    read_id_count: int = 0
    pos_hp_pairs: list = field(default_factory=list)


INT32_MAX = 2**31 - 1
INT32_MIN = -(2**31)


class PosHpRecord:
    """Per-position read-HP distribution record (HaplotagType.h:311-322
    ReadHpResult + HaplotagLogging.cpp:13-73 record methods).

    Counters mirror std::map<int,int> operator[] semantics (zero-default,
    entry creation irrelevant to output). Cover region starts at the C++
    INT_MAX/INT_MIN sentinels so never-recorded positions print them,
    as the reference does."""

    __slots__ = ("read_hp_counter", "somatic_base_counter", "derive_sims",
                 "somatic_h3_count", "exist_derive_h1h2", "derive_hp",
                 "cover_start", "cover_end")

    def __init__(self):
        self.read_hp_counter = {}
        self.somatic_base_counter = {}
        self.derive_sims = []
        self.somatic_h3_count = 0
        self.exist_derive_h1h2 = False
        self.derive_hp = 0
        self.cover_start = INT32_MAX
        self.cover_end = INT32_MIN

    def record_read_hp(self, hp_result, base_hp):
        """chrReadHpResult::recordReadHp (HaplotagLogging.cpp:13-27)."""
        self.read_hp_counter[hp_result] = \
            self.read_hp_counter.get(hp_result, 0) + 1
        if hp_result != RH_UNTAG and base_hp == SOMATIC_H3:
            self.somatic_h3_count += 1
            self.somatic_base_counter[hp_result] = \
                self.somatic_base_counter.get(hp_result, 0) + 1

    def record_derive_hp(self, derive_hp, similarity=0.0):
        """chrReadHpResult::recordDeriveHp (HaplotagLogging.cpp:39-54).
        Similarity is stored as C++ float; 0.0 is not appended."""
        self.derive_hp = derive_hp
        if similarity != 0.0:
            import numpy as np
            self.derive_sims.append(np.float32(similarity))

    def record_cover_region(self, start, end):
        """chrReadHpResult::recordAlignCoverRegion (HaplotagLogging.cpp:66-73)."""
        if self.cover_start > start:
            self.cover_start = start
        if self.cover_end < end:
            self.cover_end = end
