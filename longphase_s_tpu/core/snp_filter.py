"""ONT homopolymer SNP filter (SnpParser::filterSNP, ParsingBam.cpp:837-912).

When two adjacent het SNPs both sit in a >=3bp homopolymer and are <=2bp
apart, the second is dropped — from the het-variant table (affecting the final
VCF annotation) and from every read's observations.
"""

from __future__ import annotations

from .alleles import ReadAln, homopolymer_length


def compute_ont_erasures(variants: dict[int, object], ref_string: str) -> set[int]:
    """Error-prone homopolymer SNP pair scan (ParsingBam.cpp:866-892).
    Mutates ``variants`` (erases dropped positions); returns the erased set."""
    homo = {pos: homopolymer_length(pos, ref_string) for pos in variants}
    error_prone: set[int] = set()
    ordered = sorted(variants)
    i = 0
    # pair scan with same-current-retry after an erasure (ParsingBam.cpp:878-890)
    while i + 1 < len(ordered):
        curr = ordered[i]
        nxt = ordered[i + 1]
        if homo[curr] >= 3 and homo[nxt] >= 3 and abs(curr - nxt) <= 2:
            error_prone.add(nxt)
            del variants[nxt]
            del ordered[i + 1]
            continue
        i += 1
    return error_prone


def filter_ont_snps(variants: dict[int, object], alns: list[ReadAln],
                    ref_string: str) -> set[int]:
    """Mutates ``variants`` (het table for one chromosome) and ``alns``.

    Returns the set of erased positions.
    """
    error_prone = compute_ont_erasures(variants, ref_string)

    if error_prone:
        for aln in alns:
            keep = [k for k, p in enumerate(aln.positions) if p not in error_prone]
            if len(keep) != len(aln.positions):
                aln.positions = [aln.positions[k] for k in keep]
                aln.alleles = [aln.alleles[k] for k in keep]
                aln.quals = [aln.quals[k] for k in keep]
    return error_prone
