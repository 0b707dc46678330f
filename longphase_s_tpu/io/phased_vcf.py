"""Phased-VCF parsing for the haplotag family (VcfParser,
HaplotagVcfParser.cpp:236-532).

Loads phased heterozygous variants into per-chromosome tables keyed by
0-based position, with HP1/HP2 allele strings, integer PS (string PS values
auto-indexed), and variant typing. Tumor VCFs additionally keep unphased
het/hom records; SV/MOD phased VCFs contribute per-read haplotype counts from
RNAMES=/MR= INFO lists.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from .bgzf import open_maybe_bgzf

# Genome samples (HaplotagType.h:53-58)
NORMAL = 0
TUMOR = 1
TRUTH_SOMATIC = 2

# GenomeType (HaplotagType.h:60-66)
PHASED_HETERO = 0
UNPHASED_HETERO = 1
UNPHASED_HOMO = 2

# HaplotagVariantType
VT_NONE = 0
VT_SNP = 1
VT_INSERTION = 2
VT_DELETION = 3
VT_MNP = 4

NONE_PHASED_SET = -1


@dataclass(slots=True)
class VarData:
    ref: str = ""
    alt: str = ""
    phased_set: int = NONE_PHASED_SET
    hp1: str = ""
    hp2: str = ""
    variant_type: int = VT_NONE
    gt: int = -1

    def set_variant_type(self):
        """HaplotagType.h:129-141."""
        lr, la = len(self.ref), len(self.alt)
        if lr == 1 and la == 1:
            self.variant_type = VT_SNP
        elif lr == 1 and la > 1:
            self.variant_type = VT_INSERTION
        elif lr > 1 and la == 1:
            self.variant_type = VT_DELETION
        elif lr > 1 and lr == la:
            self.variant_type = VT_MNP
        else:
            raise ValueError(f"(loadVariantType)Invalid allele: {self.ref} {self.alt}")

    @property
    def has_ps(self) -> bool:
        return self.phased_set != NONE_PHASED_SET


@dataclass
class VcfInfo:
    sample: int = NORMAL
    chr_vec: list[str] = field(default_factory=list)
    chr_length: dict[str, int] = field(default_factory=dict)
    # read name -> [hap0 count, hap1 count] (SV/MOD RNAMES)
    read_sv_hap_count: dict[str, list[int]] = field(default_factory=dict)


def _subfield_start(format_field: str, key: str, sample: str) -> int:
    key_pos = format_field.find(key)
    colon_target = format_field[:key_pos].count(":") if key_pos >= 0 else 0
    current = 0
    start = 0
    for ch in sample:
        if current >= colon_target:
            break
        if ch == ":":
            current += 1
        start += 1
    return start


class PhasedVcfReader:
    """Stateful across files (string-PS index is shared, like VcfParser)."""

    def __init__(self, sample: int = NORMAL):
        self.sample = sample
        self.integer_ps = True
        self.ps_index: dict[str, int] = {}

    def parse(self, path: str, info: VcfInfo,
              chr_multi_variants: dict[str, dict[int, dict[int, VarData]]],
              mode: str = "snp"):
        """mode: 'snp' | 'sv' | 'mod'. chr_multi_variants[chr][pos][genome]."""
        with open_maybe_bgzf(path) as fh:
            for line in fh:
                line = line.rstrip("\n")
                if line.startswith("##") and mode == "snp":
                    if "contig=" in line:
                        id_start = line.find("ID=") + 3
                        id_end = line.find(",length=")
                        len_start = id_end + 8
                        len_end = line.find(">")
                        chrom = line[id_start:id_end]
                        info.chr_vec.append(chrom)
                        info.chr_length[chrom] = int(line[len_start:len_end])
                    if line.startswith("##FORMAT=<ID=PS,"):
                        if "Type=Integer" in line:
                            self.integer_ps = True
                        elif "Type=String" in line:
                            self.integer_ps = False
                        else:
                            raise ValueError("PS FORMAT without Integer/String type")
                    continue
                if line.startswith("#") or not line:
                    continue
                f = line.split()
                if len(f) < 10:
                    raise ValueError(f"VCF file format not supported: {line}")
                pos = int(f[1]) - 1
                chrom = f[0]
                gs = _subfield_start(f[8], "GT", f[9])
                gt_str = f[9][gs:gs + 3]
                phased_het = (len(gt_str) == 3 and gt_str[0] != gt_str[2]
                              and gt_str[1] == "|")
                if phased_het:
                    ps_start = _subfield_start(f[8], "PS", f[9])
                    nxt = f[9].find(":", ps_start + 1)
                    ps_value = f[9][ps_start:nxt] if nxt != -1 else f[9][ps_start:]
                    if mode == "snp":
                        var = VarData(ref=f[3])
                        alt_field = f[4]
                        if "," in alt_field:
                            if "2" in f[9][:gs + 3]:
                                continue
                            var.alt = alt_field.split(",")[0]
                        else:
                            var.alt = alt_field
                        var.gt = PHASED_HETERO
                        var.set_variant_type()
                        if info.sample == TUMOR and var.variant_type in (
                                VT_INSERTION, VT_DELETION):
                            if abs(len(var.alt) - len(var.ref)) > 100:
                                continue
                        if self.integer_ps:
                            var.phased_set = int(ps_value)
                        else:
                            if ps_value not in self.ps_index:
                                self.ps_index[ps_value] = len(self.ps_index)
                            var.phased_set = self.ps_index[ps_value]
                        # reference assigns the RAW ALT field (commas and all)
                        # to the haplotype strings (HaplotagVcfParser.cpp:387-394)
                        if gt_str[0] == "0" and gt_str[2] == "1":
                            var.hp1, var.hp2 = f[3], f[4]
                        elif gt_str[0] == "1" and gt_str[2] == "0":
                            var.hp1, var.hp2 = f[4], f[3]
                        chr_multi_variants.setdefault(chrom, {}).setdefault(
                            pos, {})[info.sample] = var
                    else:
                        # SV/MOD: read-name haplotype counts (RNAMES= / MR=)
                        key = "RNAMES=" if mode == "sv" else "MR="
                        rp = f[7].find(key)
                        rp = f[7].find("=", rp) + 1
                        nxt_f = f[7].find(";", rp)
                        total = f[7][rp:nxt_f] if nxt_f != -1 else f[7][rp:]
                        hap = 1 if (gt_str[0] == "0" and gt_str[2] == "1") else 0
                        for read in total.split(","):
                            entry = info.read_sv_hap_count.setdefault(read, [0, 0])
                            entry[hap] += 1
                elif info.sample == TUMOR and mode == "snp":
                    if len(gt_str) == 3 and gt_str[1] == "/" and \
                            gt_str[0] == "1" and gt_str[2] == "1":
                        gtype = UNPHASED_HOMO
                    elif len(gt_str) == 3 and gt_str[1] == "/" and \
                            gt_str[0] == "0" and gt_str[2] == "1":
                        gtype = UNPHASED_HETERO
                    else:
                        continue
                    var = VarData(ref=f[3])
                    var.alt = f[4].split(",")[0] if "," in f[4] else f[4]
                    var.gt = gtype
                    var.set_variant_type()
                    if var.variant_type in (VT_INSERTION, VT_DELETION):
                        if abs(len(var.alt) - len(var.ref)) > 100:
                            continue
                    chr_multi_variants.setdefault(chrom, {}).setdefault(
                        pos, {})[info.sample] = var
