"""Somatic haplotype judgement strategies (HaplotagStrategy.cpp:315-668)."""

from __future__ import annotations

import math

from ..io.phased_vcf import (NORMAL, PHASED_HETERO, TUMOR, UNPHASED_HETERO,
                             UNPHASED_HOMO, VT_DELETION, VT_INSERTION, VT_SNP)
from .somatic_types import (GERMLINE_H1, GERMLINE_H2, RH_H1, RH_H1_1, RH_H1_2,
                            RH_H2, RH_H2_1, RH_H2_2, RH_H3, RH_H4, RH_UNTAG,
                            SOMATIC_H3, SOMATIC_H4)


def judge_normal_snp_hap(pos, entry, base, hp_count, nor_count_ps, variants_hp):
    """judgeNormalSnpHap (HaplotagStrategy.cpp:403-435)."""
    var = entry[NORMAL]
    if base == var.ref or base == var.alt:
        if not var.has_ps:
            raise SystemExit(f"Unable to locate the phase set of the current "
                             f"normal SNP {pos}")
        if base == var.hp1:
            hp_count[1] += 1
            if variants_hp is not None:
                variants_hp[pos] = GERMLINE_H1
        if base == var.hp2:
            hp_count[2] += 1
            if variants_hp is not None:
                variants_hp[pos] = GERMLINE_H2
        nor_count_ps[var.phased_set] = nor_count_ps.get(var.phased_set, 0) + 1


def judge_tumor_only_extract(pos, entry, base, hp_count, tum_count_ps,
                             variants_hp, tumor_allele_pos_vec):
    """ExtractSomaticDataStragtegy::judgeTumorOnlySnpHap
    (HaplotagStrategy.cpp:617-638)."""
    var = entry[TUMOR]
    if base == var.alt:
        hp_count[3] += 1
        if variants_hp is not None:
            variants_hp[pos] = SOMATIC_H3
        tumor_allele_pos_vec.append(pos)
    if tum_count_ps is not None:
        tum_count_ps[var.phased_set] = tum_count_ps.get(var.phased_set, 0) + 1


def judge_tumor_only_haplotag(pos, entry, base, hp_count, tum_count_ps,
                              variants_hp, tumor_allele_pos_vec,
                              is_somatic: bool):
    """SomaticHaplotagStrategy::judgeTumorOnlySnpHap
    (HaplotagStrategy.cpp:653-668): only counts flagged somatic variants."""
    if not is_somatic:
        return
    var = entry[TUMOR]
    if base == var.alt:
        hp_count[3] += 1
        if variants_hp is not None:
            variants_hp[pos] = SOMATIC_H3
    if var.gt == PHASED_HETERO and tum_count_ps is not None:
        tum_count_ps[var.phased_set] = tum_count_ps.get(var.phased_set, 0) + 1


def judge_somatic_snp_hap(pos, entry, base, is_alt, hp_count, nor_count_ps,
                          tum_count_ps, variants_hp, tumor_allele_pos_vec,
                          tumor_only_fn, is_somatic=False):
    """judgeSomaticSnpHap (HaplotagStrategy.cpp:315-389).

    ``tumor_only_fn``: 'extract' or 'haplotag' strategy.
    """
    nor = entry.get(NORMAL)
    if nor is not None:
        if nor.gt == PHASED_HETERO:
            b = base
            if nor.variant_type in (VT_DELETION, VT_INSERTION):
                b = nor.alt if is_alt else nor.ref
            judge_normal_snp_hap(pos, entry, b, hp_count, nor_count_ps, variants_hp)
        return
    tum = entry.get(TUMOR)
    if tum is None:
        return
    matches = (tum.ref == base or tum.alt == base
               or tum.variant_type in (VT_DELETION, VT_INSERTION))
    if not matches:
        return
    b = base
    if tum.variant_type in (VT_DELETION, VT_INSERTION):
        b = tum.alt if is_alt else tum.ref
    if tum.gt == PHASED_HETERO:
        if not tum.has_ps:
            raise SystemExit(f"tumor phased SNP without PS at {pos}")
        if tumor_only_fn == "extract":
            judge_tumor_only_extract(pos, entry, b, hp_count, tum_count_ps,
                                     variants_hp, tumor_allele_pos_vec)
        else:
            judge_tumor_only_haplotag(pos, entry, b, hp_count, tum_count_ps,
                                      variants_hp, tumor_allele_pos_vec, is_somatic)
    elif tum.gt in (UNPHASED_HETERO, UNPHASED_HOMO):
        if tumor_only_fn == "extract":
            judge_tumor_only_extract(pos, entry, b, hp_count, None,
                                     variants_hp, tumor_allele_pos_vec)
        else:
            judge_tumor_only_haplotag(pos, entry, b, hp_count, None,
                                      variants_hp, tumor_allele_pos_vec, is_somatic)


def judge_somatic_read_hap(hp_count, nor_count_ps, percentage_threshold,
                           stats=None):
    """judgeSomaticReadHap (HaplotagStrategy.cpp:452-602).

    Returns (hp_result, pq, nor_similarity, tum_similarity).
    """
    h1, h2, h3, h4 = hp_count[1], hp_count[2], hp_count[3], hp_count[4]
    if h3 > h4:
        tum_min, tum_max, max_tumor = float(h4), float(h3), SOMATIC_H3
    else:
        tum_min, tum_max, max_tumor = float(h3), float(h4), SOMATIC_H4
    if h1 > h2:
        nor_min, nor_max, max_normal = float(h2), float(h1), GERMLINE_H1
    else:
        nor_min, nor_max, max_normal = float(h1), float(h2), GERMLINE_H2

    tum_sim = 0.0 if tum_max == 0 else tum_max / (tum_max + tum_min)
    nor_sim = 0.0 if nor_max == 0 else nor_max / (nor_max + nor_min)

    hp_result = RH_UNTAG
    pq = 0
    if tum_max != 0:
        if tum_sim >= percentage_threshold:
            if nor_sim >= percentage_threshold:
                if max_tumor == SOMATIC_H3:
                    hp_result = RH_H1_1 if max_normal == GERMLINE_H1 else RH_H2_1
                else:
                    hp_result = RH_H1_2 if max_normal == GERMLINE_H1 else RH_H2_2
            else:
                hp_result = RH_H3 if max_tumor == SOMATIC_H3 else RH_H4
        else:
            pq = 0
            if stats is not None:
                stats.total_high_similarity += 1
    elif nor_max != 0:
        if nor_sim >= percentage_threshold:
            hp_result = RH_H1 if max_normal == GERMLINE_H1 else RH_H2
        else:
            pq = 0
            if stats is not None:
                stats.total_high_similarity += 1

    if len(nor_count_ps) > 1:
        hp_result = RH_UNTAG
        if stats is not None:
            stats.total_cross_two_block += 1

    if nor_max == 0 and tum_max == 0:
        if stats is not None:
            stats.total_without_variant += 1
        pq = 0
    elif tum_max != 0:
        if tum_max == tum_max + tum_min:
            pq = 40
        else:
            pq = int(-10 * math.log10(tum_min / (tum_max + tum_min)))
    elif nor_max != 0:
        if nor_max == nor_max + nor_min:
            pq = 40
        else:
            pq = int(-10 * math.log10(nor_min / (nor_max + nor_min)))

    return hp_result, pq, nor_sim, tum_sim
