"""VCF reading/writing with reference-identical semantics.

Read side mirrors SnpParser (ParsingBam.cpp:222-359): heterozygous bi-allelic
SNPs and (optionally) indels with GT in {0/1, 1/0, 0|1, 1|0}; multi-allelic
records skipped; low-QUAL indels filtered + logged.

Write side mirrors SnpParser::writeLine (ParsingBam.cpp:460-635): strip any
existing PS from FORMAT/sample, normalize GT (sort digits, '|'→'/'), then for
phased sites inject ``a|b`` GT and append ``PS=blockStart(1-based)``.
"""

from __future__ import annotations

import math
import re
from dataclasses import dataclass, field

from .bgzf import open_maybe_bgzf

HET_GTS = {"0/1", "1/0", "0|1", "1|0"}


@dataclass
class VariantInfo:
    ref: str
    alt: str
    is_danger: bool = False


@dataclass
class HetVariantSet:
    """Per-chromosome heterozygous variant tables (the phasing site universe)."""

    contigs: list[str] = field(default_factory=list)
    contig_lengths: dict[str, int] = field(default_factory=dict)
    # chrom -> {pos0: VariantInfo}; dict preserves insertion order but
    # positions are also kept sorted on demand.
    by_chrom: dict[str, dict[int, VariantInfo]] = field(default_factory=dict)
    # chrom -> set of 0-based positions of indels removed by the QUAL filter
    filtered_indels: dict[str, set[int]] = field(default_factory=dict)
    removed_indel_log: list[str] = field(default_factory=list)

    def last_snp(self, chrom: str) -> int:
        """Largest 0-based het-variant position, or -1 (SnpParser::getLastSNP)."""
        positions = self.by_chrom.get(chrom)
        if not positions:
            return -1
        return max(positions)

    def sorted_positions(self, chrom: str) -> list[int]:
        return sorted(self.by_chrom.get(chrom, {}))


@dataclass
class SVVariantSet:
    """SVParser (ParsingBam.cpp:915-1017): het SVs keyed by 1-based start with
    SVLEN; homozygous, SNP-conflicting and duplicate positions dropped."""

    # chrom -> {start_1based: svlen}
    by_chrom: dict[str, dict[int, int]] = field(default_factory=dict)


@dataclass
class MethVariantSet:
    """METHParser (ParsingBam.cpp:1647-1786): per representative position,
    read -> (is_reverse, is_modify); consecutive positions merge under the
    first position."""

    # chrom -> {rep_pos0: {read: (is_reverse, is_modify)}}
    by_chrom: dict[str, dict[int, dict[str, tuple[bool, bool]]]] = field(default_factory=dict)
    # pos0 -> representative pos0 (global map, like the reference)
    representative: dict[int, int] = field(default_factory=dict)


def read_sv_variants(path: str, het_set: HetVariantSet) -> SVVariantSet:
    out = SVVariantSet()
    dup: dict[str, dict[int, bool]] = {}
    with open_maybe_bgzf(path) as fh:
        for line in fh:
            line = line.rstrip("\n")
            if not line or line.startswith("#"):
                continue
            f = line.split()
            if not f:
                continue
            pos0 = int(f[1]) - 1
            chrom = f[0]
            gs = _subfield_start_generic(f[8], "GT", f[9])
            filt = False
            if f[9][gs] == f[9][gs + 2]:
                filt = True  # homozygous
            if pos0 in het_set.by_chrom.get(chrom, {}):
                filt = True  # conflicts with SNP
            d = dup.setdefault(chrom, {})
            if pos0 in d:
                d[pos0] = True
                filt = True
            else:
                d[pos0] = False
            if filt:
                continue
            start = int(f[1])
            info = f[7]
            sp = info.find("SVLEN=")
            if sp != -1:
                sp += 6
                semi = info.find(";", sp)
                svlen = int(info[sp:semi] if semi != -1 else info[sp:])
                out.by_chrom.setdefault(chrom, {})[start] = svlen
    # duplicate-position erase pass. Reference quirk (ParsingBam.cpp:931-940):
    # the duplicate table is 0-based but chrVariant is keyed by the 1-based
    # start, so the erase looks up pos0 in the 1-based map — it misses the
    # duplicated entry itself and can instead remove an unrelated SV at the
    # preceding coordinate. Reproduced faithfully.
    for chrom, d in dup.items():
        for pos0, is_dup in d.items():
            if is_dup:
                out.by_chrom.get(chrom, {}).pop(pos0, None)
    return out


def read_meth_variants(path: str, het_set: HetVariantSet,
                       sv_set: SVVariantSet) -> MethVariantSet:
    out = MethVariantSet()
    rep = -1
    up_pos = -1
    with open_maybe_bgzf(path) as fh:
        for line in fh:
            line = line.rstrip("\n")
            if not line or line.startswith("#"):
                continue
            f = line.split()
            if not f:
                continue
            pos0 = int(f[1]) - 1
            chrom = f[0]
            if up_pos + 1 != pos0:
                rep = pos0
            gs = _subfield_start_generic(f[8], "GT", f[9])
            if f[9][gs] == f[9][gs + 2]:
                continue
            # reference quirk: findSV receives the 0-based pos but the SV map
            # is keyed by 1-based start (ParsingBam.cpp:1730,1194-1206)
            if pos0 in het_set.by_chrom.get(chrom, {}) or \
                    pos0 in sv_set.by_chrom.get(chrom, {}):
                continue
            info = f[7]
            if "RS=P" in info:
                is_reverse = False
            elif "RS=N" in info:
                is_reverse = True
            else:
                continue
            table = out.by_chrom.setdefault(chrom, {}).setdefault(rep, {})
            for key, modify in (("MR=", True), ("NR=", False)):
                rp = info.find(key)
                rp = info.find("=", rp) + 1
                nx = info.find(";", rp)
                reads = info[rp:nx] if nx != -1 else info[rp:]
                for read in reads.split(","):
                    table[read] = (is_reverse, modify)
            out.representative[pos0] = rep
            up_pos = pos0
    return out


def _subfield_start_generic(format_field: str, key: str, sample: str) -> int:
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


_CONTIG_RE = re.compile(r"##contig=<([^>]*)>")


def _parse_contig_line(line: str):
    m = _CONTIG_RE.match(line)
    if not m:
        return None
    fields = dict(kv.split("=", 1) for kv in m.group(1).split(",") if "=" in kv)
    name = fields.get("ID")
    length = int(fields["length"]) if "length" in fields else 0
    return name, length


def _first_sample_gt(format_field: str, sample_field: str) -> str | None:
    keys = format_field.split(":")
    vals = sample_field.split(":")
    try:
        idx = keys.index("GT")
    except ValueError:
        return None
    if idx >= len(vals):
        return None
    return vals[idx]


def read_het_variants(path: str, phase_indel: bool = False,
                      indel_quality: int = 0) -> HetVariantSet:
    """Load heterozygous bi-allelic variants (ParsingBam.cpp:267-352)."""
    out = HetVariantSet()
    with open_maybe_bgzf(path) as fh:
        for line in fh:
            line = line.rstrip("\n")
            if not line:
                continue
            if line.startswith("##"):
                parsed = _parse_contig_line(line)
                if parsed:
                    out.contigs.append(parsed[0])
                    out.contig_lengths[parsed[0]] = parsed[1]
                continue
            if line.startswith("#"):
                continue
            f = line.split("\t")
            if len(f) < 10:
                continue
            chrom, pos1, _id, ref, alt = f[0], f[1], f[2], f[3], f[4]
            # multi-allelic records skipped (ParsingBam.cpp:294,344)
            if "," in alt:
                continue
            gt = _first_sample_gt(f[8], f[9])
            if gt not in HET_GTS:
                continue
            pos0 = int(pos1) - 1
            is_snp = len(ref) == 1 and len(alt) == 1 and ref != "*" and alt != "*"
            if is_snp:
                out.by_chrom.setdefault(chrom, {})[pos0] = VariantInfo(ref, alt)
            elif phase_indel:
                qual = 0.0
                if f[5] not in (".", ""):
                    try:
                        qual = float(f[5])
                    except ValueError:
                        qual = 0.0
                if math.isnan(qual):
                    qual = 0.0
                if indel_quality > 0 and qual < indel_quality:
                    out.removed_indel_log.append(
                        f"{chrom}\t{pos0 + 1}\t{ref}\t{alt}\t"
                        f"{f[5] if f[5] != '.' else '.'}"
                    )
                    out.filtered_indels.setdefault(chrom, set()).add(pos0)
                    continue
                out.by_chrom.setdefault(chrom, {})[pos0] = VariantInfo(ref, alt)
    return out


def mark_danger_indels(variants: dict[int, VariantInfo], ref_string: str):
    """Tandem-repeat marking (SnpParser::getVariants_markindel ParsingBam.cpp:378-417).

    An indel whose following reference bases are a 2-mer repeated >=5 times is
    marked ``is_danger``.
    """
    n = len(ref_string)
    for pos, info in variants.items():
        danger = False
        if len(info.ref) > 1 or len(info.alt) > 1:
            if pos + 3 <= n:
                r0, r1 = ref_string[pos + 1], ref_string[pos + 2]
                ref_pos = pos
                i = 0
                while i < 5:
                    if (ref_pos + 2 >= n or r0 != ref_string[ref_pos + 1]
                            or r1 != ref_string[ref_pos + 2]):
                        break
                    ref_pos += 2
                    i += 1
                danger = i == 5
        info.is_danger = danger


# ---------------------------------------------------------------------------
# Result VCF writing (SnpParser::writeLine semantics)
# ---------------------------------------------------------------------------

def _find_subfield_start(format_field: str, key_pos_in_format: int, sample: str) -> int:
    """Column position in the sample string for the Nth ':'-separated value."""
    colon_target = format_field[:key_pos_in_format].count(":")
    current = 0
    start = 0
    for ch in sample:
        if current >= colon_target:
            break
        if ch == ":":
            current += 1
        start += 1
    return start


def _strip_ps(format_field: str, sample: str) -> tuple[str, str]:
    ps_pos = format_field.find("PS")
    if ps_pos < 0:
        return format_field, sample
    start = _find_subfield_start(format_field, ps_pos, sample)
    if format_field.find(":", ps_pos + 1) != -1:
        format_field = format_field[:ps_pos] + format_field[ps_pos + 3:]
    else:
        format_field = format_field[:ps_pos - 1] + format_field[ps_pos + 2:]
    nxt = sample.find(":", start + 1)
    if nxt != -1:
        sample = sample[:start] + sample[nxt + 1:]
    else:
        sample = sample[:start - 1]
    return format_field, sample


def _normalize_gt(format_field: str, sample: str) -> str:
    gt_pos = format_field.find("GT")
    if gt_pos < 0:
        return sample
    start = _find_subfield_start(format_field, gt_pos, sample)
    s = list(sample)
    if start + 2 < len(s) and s[start + 1] == "|":
        if s[start] > s[start + 2]:
            s[start], s[start + 2] = s[start + 2], s[start]
        s[start + 1] = "/"
    return "".join(s)


def _apply_phase(format_field: str, sample: str, ra_status: str, block: int) -> tuple[str, str]:
    format_field = format_field + ":PS"
    sample = sample + ":" + str(block)
    gt_pos = format_field.find("GT")
    start = _find_subfield_start(format_field, gt_pos, sample)
    s = list(sample)
    s[start] = ra_status[0]
    s[start + 1] = "|"
    s[start + 2] = ra_status[2]
    return format_field, "".join(s)


def preprocess_deepsomatic_vcf(in_path: str, out_path: str):
    """SnpParser::preprocessDeepsomaticVCF (ParsingBam.cpp:651-835).

    Keeps only FILTER~GERMLINE records and re-derives a diploid GT by
    least-squares fit of observed allele fractions (AD preferred, VAF
    fallback) against expected fractions of each genotype.
    """
    with open(in_path) as fin, open(out_path, "w") as fout:
        for line in fin:
            line = line.rstrip("\n")
            if line.startswith("#"):
                fout.write(line + "\n")
                continue
            f = line.split()
            if len(f) < 10:
                continue
            if "GERMLINE" not in f[6]:
                continue
            fmt = f[8].split(":")
            sample = f[9].split(":")
            gt_index = fmt.index("GT") if "GT" in fmt else -1
            vaf_index = fmt.index("VAF") if "VAF" in fmt else -1
            ad_index = fmt.index("AD") if "AD" in fmt else -1
            if 0 <= gt_index < len(sample):
                alt_count = 0
                if f[4] and f[4] != ".":
                    alt_count = sum(1 for t in f[4].split(",") if t)
                allele_count = alt_count + 1
                observed = None
                if 0 <= ad_index < len(sample):
                    ad = []
                    for tok in sample[ad_index].split(","):
                        try:
                            ad.append(int(tok))
                        except ValueError:
                            ad.append(0)
                    s = sum(ad)
                    if s > 0 and len(ad) == allele_count:
                        observed = [v / s for v in ad]
                if observed is None and 0 <= vaf_index < len(sample):
                    vafs = []
                    for tok in sample[vaf_index].split(","):
                        if tok in (".", ""):
                            continue
                        try:
                            vafs.append(float(tok))
                        except ValueError:
                            pass
                    if alt_count == len(vafs) and alt_count >= 1:
                        ref_frac = max(0.0, 1.0 - sum(vafs))
                        observed = [ref_frac] + vafs
                if observed is not None and allele_count >= 1:
                    best = (0, 0)
                    best_cost = math.inf
                    for a in range(allele_count):
                        for b in range(a, allele_count):
                            expected = [0.0] * allele_count
                            if a == b:
                                expected[a] = 1.0
                            else:
                                expected[a] = 0.5
                                expected[b] = 0.5
                            cost = sum((o - e) ** 2
                                       for o, e in zip(observed, expected))
                            if cost < best_cost:
                                best_cost = cost
                                best = (a, b)
                    sample[gt_index] = f"{best[0]}/{best[1]}"
                    f[9] = ":".join(sample)
            fout.write("\t".join(f) + "\n")


def _rewrite_generic(in_path: str, out_path: str, phasing_result: dict,
                     version: str, command: str, resolve):
    """Shared body of the SV/METH writeLine variants (ParsingBam.cpp:1042-1193,
    1788-1942). ``resolve(fields) -> (key, in_set)``."""
    ps_def = False
    command_line_written = False
    with open_maybe_bgzf(in_path) as fin, open(out_path, "w") as fout:
        for line in fin:
            line = line.rstrip("\n")
            if line.startswith("##"):
                if line.startswith("##FORMAT=<ID=PS,"):
                    ps_def = True
                fout.write(line + "\n")
                continue
            if line.startswith("#CHROM") or line.startswith("#chrom"):
                if not command_line_written:
                    if not ps_def:
                        fout.write(
                            "##FORMAT=<ID=PS,Number=1,Type=Integer,"
                            "Description=\"Phase set identifier\">\n")
                        ps_def = True
                    fout.write(f"##longphaseVersion={version}\n")
                    fout.write(f"##commandline=\"{command}\"\n")
                    command_line_written = True
                fout.write(line + "\n")
                continue
            fields = line.split()
            if not fields:
                continue
            key, in_set = resolve(fields)
            fields[8], fields[9] = _strip_ps(fields[8], fields[9])
            fields[9] = _normalize_gt(fields[8], fields[9])
            element = phasing_result.get(key)
            if element is not None and in_set:
                ra_status, block = element
                fields[8], fields[9] = _apply_phase(fields[8], fields[9],
                                                    ra_status, block)
            else:
                fields[8] = fields[8] + ":PS"
                fields[9] = fields[9] + ":."
            fout.write("\t".join(fields) + "\n")


def rewrite_sv_vcf(in_path: str, out_path: str, phasing_result: dict,
                   sv_set: "SVVariantSet", version: str, command: str):
    def resolve(fields):
        pos0 = int(fields[1]) - 1
        key = f"{fields[0]}_{pos0}"
        in_set = (pos0 + 1) in sv_set.by_chrom.get(fields[0], {})
        return key, in_set

    _rewrite_generic(in_path, out_path, phasing_result, version, command, resolve)


def rewrite_meth_vcf(in_path: str, out_path: str, phasing_result: dict,
                     meth_set: "MethVariantSet", version: str, command: str):
    def resolve(fields):
        pos0 = int(fields[1]) - 1
        rep = meth_set.representative.get(pos0, 0)
        key = f"{fields[0]}_{rep}"
        in_set = rep in meth_set.by_chrom.get(fields[0], {})
        return key, in_set

    _rewrite_generic(in_path, out_path, phasing_result, version, command, resolve)


def rewrite_result_vcf(in_path: str, out_path: str, phasing_result: dict,
                       het_set: HetVariantSet, version: str, command: str,
                       phase_indel: bool = False, indel_quality: int = 0):
    """Annotate the input VCF with phased GT/PS (ParsingBam.cpp:460-635).

    ``phasing_result`` maps ``f"{chrom}_{pos0}"`` -> (ra_status, block).
    """
    from .. import native as _native

    if _native.available():
        with open(in_path, "rb") as f:
            raw = f.read()
        if raw[:2] == b"\x1f\x8b":
            import gzip as _gzip

            raw = _gzip.decompress(raw)
        if _native.vcf_rewrite(raw, out_path, phasing_result,
                               het_set.by_chrom, het_set.filtered_indels,
                               version, command, phase_indel, indel_quality):
            return

    ps_def = False
    command_line_written = False
    with open_maybe_bgzf(in_path) as fin, open(out_path, "w") as fout:
        for line in fin:
            line = line.rstrip("\n")
            if line.startswith("##"):
                if line.startswith("##FORMAT=<ID=PS,"):
                    ps_def = True
                if line.startswith("##FILTER=<ID=PASS"):
                    fout.write(line + "\n")
                    if phase_indel and indel_quality > 0:
                        fout.write(
                            "##FILTER=<ID=INDEL_QUAL_FILTERED,Description=\"Indel "
                            f"filtered due to QUAL below threshold ({indel_quality})\">\n"
                        )
                else:
                    fout.write(line + "\n")
                continue
            if line.startswith("#CHROM") or line.startswith("#chrom"):
                if not command_line_written:
                    if not ps_def:
                        fout.write(
                            "##FORMAT=<ID=PS,Number=1,Type=Integer,"
                            "Description=\"Phase set identifier\">\n"
                        )
                        ps_def = True
                    fout.write(f"##longphaseVersion={version}\n")
                    fout.write(f"##commandline=\"{command}\"\n")
                    command_line_written = True
                fout.write(line + "\n")
                continue
            fields = line.split()
            if not fields:
                continue
            pos0 = int(fields[1]) - 1
            key = f"{fields[0]}_{pos0}"
            fields[8], fields[9] = _strip_ps(fields[8], fields[9])
            fields[9] = _normalize_gt(fields[8], fields[9])
            in_het = pos0 in het_set.by_chrom.get(fields[0], {})
            filtered = (phase_indel and indel_quality > 0
                        and pos0 in het_set.filtered_indels.get(fields[0], set()))
            element = phasing_result.get(key)
            if element is not None and in_het:
                ra_status, block = element
                fields[8], fields[9] = _apply_phase(fields[8], fields[9], ra_status, block)
            else:
                fields[8] = fields[8] + ":PS"
                fields[9] = fields[9] + ":."
            if filtered:
                fields[6] = "INDEL_QUAL_FILTERED"
            fout.write("\t".join(fields) + "\n")
