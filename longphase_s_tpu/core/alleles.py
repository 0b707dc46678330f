"""Host-side allele extraction: BAM records -> per-read variant observations.

Re-implements the semantics of BamParser::get_snp (ParsingBam.cpp:1303-1634):
a CIGAR walk over each alignment emitting one observation per covered
het-variant site, with the reference's exact corner cases:

* SNP base compare against REF/ALT with base quality,
* insertion/deletion allele decided by "variant at end of M op and the next
  CIGAR op is I/D" (ParsingBam.cpp:1470-1510),
* sentinel qualities: -4 indel, -5 tandem-repeat ("danger") indel, -1 SV,
  -2/-3 forward/reverse modification,
* SNP-inside-deletion homopolymer rescue (ParsingBam.cpp:1539-1607),
* whole-alignment discard when a variant offset exceeds the query length
  (ParsingBam.cpp:1453-1455),
* soft/hard clip counting (>5 bp) into a front/back clip table
  (ParsingBam.cpp:1636-1645).

The output is a list of ReadAln (one per alignment, in BAM order) — the moral
equivalent of the reference's std::vector<ReadVariant> — which core/matrix.py
packs into dense device tensors.
"""

from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np

from ..io.bam import (
    BAM_CDEL, BAM_CDIFF, BAM_CEQUAL, BAM_CHARD_CLIP, BAM_CINS, BAM_CMATCH,
    BAM_CPAD, BAM_CREF_SKIP, BAM_CSOFT_CLIP, SEQ_NT16, BamRecord,
    FLAG_DUP, FLAG_SECONDARY, FLAG_UNMAP,
)

FRONT = 0
BACK = 1

# Sentinel qualities (reference: ParsingBam.cpp get_snp)
QUAL_SV = -1
QUAL_MOD_FWD = -2
QUAL_MOD_REV = -3
QUAL_INDEL = -4
QUAL_DANGER = -5

# Compat switch for the reference's unguarded `modPos < *variantIter` read
# at map::end() (libstdc++ yields the node count, silently dropping mods
# past the last SNP). Default emulates the quirk for byte parity with a
# libstdc++-built oracle; LPS_GUARD_MOD_END=1 keeps those mods (the
# guarded/correct behavior). Mirrored in native/lps_ingest.cpp:phase_walk.
import os as _os

_GUARD_MOD_END = bool(_os.environ.get("LPS_GUARD_MOD_END"))


@dataclass
class ReadAln:
    """One alignment's variant observations (reference Util.h:77-98 ReadVariant)."""

    read_name: str
    reference_start: int
    is_reverse: bool
    # parallel arrays: site position (0-based), allele (0 ref / 1 alt), quality
    positions: list[int] = field(default_factory=list)
    alleles: list[int] = field(default_factory=list)
    quals: list[int] = field(default_factory=list)


def homopolymer_length(pos: int, ref_string: str) -> int:
    """Util.cpp:21-54 — homopolymer run length around pos, capped at 10."""
    n = len(ref_string)
    length = 1
    if pos + 1 >= n:
        return length
    element = ref_string[pos]
    p = pos - 1
    while p >= 0 and ref_string[p] == element:
        p -= 1
        length += 1
        if length >= 10:
            break
    p = pos + 1
    while p < n and ref_string[p] == element:
        p += 1
        length += 1
        if length >= 10:
            break
    return length


class AlleleExtractor:
    """Streaming extraction over position-sorted BAM records for one chromosome.

    ``variants`` is the chromosome's het-variant table: sorted positions with
    (ref, alt, is_danger). SV/MOD streams are optional (added by the SV/METH
    milestones) and mirror ParsingBam.cpp:1321-1434.
    """

    def __init__(self, positions: list[int], infos: list, ref_string: str,
                 sv_entries: list[tuple[int, int]] | None = None,
                 mod_entries: list[tuple[int, dict]] | None = None,
                 sv_window: int = 20, sv_threshold: float = 0.1):
        self.positions = positions
        self.infos = infos
        self.ref_string = ref_string
        self.n = len(positions)
        self.first_idx = 0  # firstVariantIter (ParsingBam.cpp:1318)
        self.sv_entries = sv_entries or []
        self.first_sv_idx = 0
        self.mod_entries = mod_entries or []
        self.first_mod_idx = 0
        self.sv_window = sv_window
        self.sv_threshold = sv_threshold

    def reset_stream(self):
        """Reference resets the shared iterators per BAM file (ParsingBam.cpp:1252-1256)."""
        self.first_idx = 0
        self.first_sv_idx = 0
        self.first_mod_idx = 0

    # ------------------------------------------------------------------
    def process_record(self, rec: BamRecord, out: list[ReadAln],
                       clip_count: dict[int, list[int]]):
        positions = self.positions
        infos = self.infos
        ref_string = self.ref_string
        n = self.n
        svs = self.sv_entries
        n_sv = len(svs)
        mods = self.mod_entries
        n_mod = len(mods)

        aln = ReadAln(rec.qname, rec.pos, rec.is_reverse)
        ref_pos = rec.pos
        query_pos = 0

        # skip variants left of the read (stateful across reads)
        while self.first_idx < n and positions[self.first_idx] < ref_pos:
            self.first_idx += 1
        while self.first_sv_idx < n_sv and svs[self.first_sv_idx][0] < ref_pos:
            self.first_sv_idx += 1
        while self.first_mod_idx < n_mod and mods[self.first_mod_idx][0] < ref_pos:
            self.first_mod_idx += 1
        vi = self.first_idx
        si = self.first_sv_idx
        mi = self.first_mod_idx

        cigars = rec.cigar_tuples()
        n_cigar = len(cigars)
        l_qseq = rec.l_seq
        seq = None
        qual = None
        is_rev = rec.is_reverse
        qname = rec.qname

        for ci, (op, oplen) in enumerate(cigars):
            # skip variants already passed (e.g. consumed by deletions)
            while vi < n and positions[vi] < ref_pos:
                vi += 1

            # positions of the current heads
            # (reference computes these each op; ParsingBam.cpp:1350-1358)
            while True:
                mod_pos = mods[mi][0] if mi < n_mod else None
                sv_pos = svs[si][0] - 1 if si < n_sv else None
                var_pos = positions[vi] if vi < n else None
                limit = ref_pos + oplen
                mod_in = mod_pos is not None and mod_pos < limit
                sv_in = sv_pos is not None and sv_pos < limit
                var_in = var_pos is not None and var_pos < limit
                if not (mod_in or sv_in or var_in):
                    break

                big = 1 << 60
                m = mod_pos if mod_pos is not None else big
                s = sv_pos if sv_pos is not None else big
                v = var_pos if var_pos is not None else big

                if mod_pos is not None and m < v and m < s:
                    # modification head is minimal (ParsingBam.cpp:1373-1395)
                    entry = mods[mi][1].get(qname)
                    # reference quirk (ParsingBam.cpp:1380): the inner
                    # `modPos < variantPos` check is NOT end()-guarded;
                    # libstdc++'s *map::end() deterministically reads the
                    # tree's node count, so an exhausted SNP iterator makes
                    # variantPos == len(SNP map) and mods past the last SNP
                    # are silently dropped from the read.
                    # LPS_GUARD_MOD_END=1 selects the guarded (correct)
                    # behavior instead; parity default emulates libstdc++'s
                    # *map::end() node-count read (see PARITY.md)
                    if _GUARD_MOD_END:
                        stale_v = positions[vi] if vi < n else (1 << 62)
                    else:
                        stale_v = positions[vi] if vi < n else n
                    if entry is not None and mod_pos < stale_v:
                        entry_rev, is_modify = entry
                        if entry_rev == is_rev:
                            strand = QUAL_MOD_REV if is_rev else QUAL_MOD_FWD
                            allele = 0 if is_modify else 1
                            aln.positions.append(mod_pos)
                            aln.alleles.append(allele)
                            aln.quals.append(strand)
                    mi += 1
                elif sv_pos is not None and s < v and s < m:
                    # SV head is minimal (ParsingBam.cpp:1397-1434)
                    allele = 0
                    sv_start, sv_length = svs[si]
                    sv_end = sv_start + abs(sv_length)
                    sv_region = sv_end - sv_start + 1
                    for j in range(max(ci - self.sv_window, 0),
                                   min(ci + self.sv_window, n_cigar)):
                        jop, joplen = cigars[j]
                        if jop in (BAM_CINS, BAM_CDEL) and \
                                abs(sv_region - joplen) / abs(sv_region) < self.sv_threshold:
                            allele = 1
                            break
                    aln.positions.append(sv_pos)
                    aln.alleles.append(allele)
                    aln.quals.append(QUAL_SV)
                    si += 1
                elif var_pos is not None and v < s and v < m:
                    if op in (BAM_CMATCH, BAM_CEQUAL, BAM_CDIFF):
                        info = infos[vi]
                        ref_len = len(info.ref)
                        alt_len = len(info.alt)
                        offset = var_pos - ref_pos
                        base_q = 0
                        allele = -1
                        if query_pos + offset + 1 > l_qseq:
                            # whole-alignment discard (ParsingBam.cpp:1453-1455)
                            return
                        if ref_len == 1 and alt_len == 1:
                            if seq is None:
                                seq = rec.seq_nibbles()
                                qual = rec.qual()
                            base = SEQ_NT16[seq[query_pos + offset]]
                            if base == info.ref[0]:
                                allele = 0
                            elif base == info.alt[0]:
                                allele = 1
                            base_q = int(qual[query_pos + offset])
                        if ref_len == 1 and alt_len != 1 and ci + 1 < n_cigar:
                            # insertion (ParsingBam.cpp:1470-1491)
                            if ref_pos + oplen - 1 == var_pos and cigars[ci + 1][0] == BAM_CINS:
                                allele = 1
                            else:
                                allele = 0
                            base_q = QUAL_DANGER if info.is_danger else QUAL_INDEL
                        if ref_len != 1 and alt_len == 1 and ci + 1 < n_cigar:
                            # deletion (ParsingBam.cpp:1495-1510)
                            if ref_pos + oplen - 1 == var_pos and cigars[ci + 1][0] == BAM_CDEL:
                                allele = 1
                            else:
                                allele = 0
                            base_q = QUAL_DANGER if info.is_danger else QUAL_INDEL
                        if allele != -1:
                            aln.positions.append(var_pos)
                            aln.alleles.append(allele)
                            aln.quals.append(base_q)
                        vi += 1
                    else:
                        break
                else:
                    # Equal head positions never occur (parsers enforce
                    # distinct site streams); bail out rather than spin.
                    break

            # advance by op (ParsingBam.cpp:1531-1628)
            if op in (BAM_CMATCH, BAM_CEQUAL, BAM_CDIFF):
                query_pos += oplen
                ref_pos += oplen
            elif op == BAM_CINS:
                query_pos += oplen
            elif op == BAM_CDEL:
                if ref_string != "":
                    del_len = oplen
                    vp = positions[vi] if vi < n else None
                    if vp is not None and ref_pos + del_len + 1 == vp:
                        pass  # reference's empty special case (ParsingBam.cpp:1546-1550)
                    elif vp is not None and ref_pos <= vp < ref_pos + del_len:
                        # SNP-in-deletion homopolymer rescue (ParsingBam.cpp:1551-1604)
                        if homopolymer_length(vp, ref_string) >= 3:
                            info = infos[vi]
                            ref_len = len(info.ref)
                            alt_len = len(info.alt)
                            base_q = 0
                            if query_pos + 1 > l_qseq:
                                return
                            allele = -1
                            if ref_len == 1 and alt_len == 1:
                                if seq is None:
                                    seq = rec.seq_nibbles()
                                    qual = rec.qual()
                                base = SEQ_NT16[seq[query_pos]]
                                if base == info.ref[0]:
                                    allele = 0
                                elif base == info.alt[0]:
                                    allele = 1
                                base_q = int(qual[query_pos])
                            elif ref_len != 1 and alt_len == 1:
                                allele = 1
                                base_q = QUAL_INDEL
                            if allele != -1:
                                aln.positions.append(vp)
                                aln.alleles.append(allele)
                                aln.quals.append(base_q)
                                vi += 1
                ref_pos += oplen
            elif op == BAM_CREF_SKIP:
                ref_pos += oplen
            elif op == BAM_CSOFT_CLIP:
                query_pos += oplen
                _get_clip(ref_pos, ci, oplen, clip_count)
            elif op == BAM_CHARD_CLIP:
                _get_clip(ref_pos, ci, oplen, clip_count)
            elif op == BAM_CPAD:
                pass
            else:
                raise ValueError(f"unsupported CIGAR op {op} in read {qname}")

        if aln.positions:
            out.append(aln)


def _get_clip(pos: int, cigar_index: int, length: int, clip_count: dict[int, list[int]]):
    """ParsingBam.cpp:1636-1645 — count clips >5bp; first cigar op = FRONT."""
    if length > 5:
        entry = clip_count.setdefault(pos, [0, 0])
        if cigar_index == FRONT:
            entry[FRONT] += 1
        else:
            entry[BACK] += 1


def extract_chromosome(bam_paths: list[str], chrom: str, last_snp_pos: int,
                       positions: list[int], infos: list, ref_string: str,
                       mapping_quality: int = 1,
                       sv_entries=None, mod_entries=None,
                       sv_window: int = 20, sv_threshold: float = 0.1,
                       bam_cache=None, fasta=None):
    """BamParser::direct_detect_alleles (ParsingBam.cpp:1243-1301).

    Iterates every BAM over region chr:1-lastSNPPos with the reference's
    record filter (MAPQ / unmapped / secondary / duplicate; supplementary
    kept).
    """
    from ..io.cram import open_alignment

    # native fast path (C++ BGZF/CRAM decode + full three-stream CIGAR walk
    # incl. SV/MOD co-phasing observations)
    if True:
        from .. import native

        if native.available():
            out: list[ReadAln] = []
            clip_count: dict[int, list[int]] = {}
            ok = True
            for path in bam_paths:
                r = native.extract_phase(path, chrom, last_snp_pos, positions,
                                         infos, ref_string, mapping_quality,
                                         fasta_path=getattr(fasta, "path",
                                                            None),
                                         sv_entries=sv_entries,
                                         mod_entries=mod_entries,
                                         sv_window=sv_window,
                                         sv_threshold=sv_threshold)
                if r is None:
                    ok = False
                    break
                offs = r["aln_offsets"]
                n_offs = r["name_offsets"]
                names = r["names"]
                obs_pos = r["obs_pos"].tolist()
                obs_allele = r["obs_allele"].tolist()
                obs_qual = r["obs_qual"].tolist()
                starts = r["aln_start"]
                for i in range(len(starts)):
                    a, b = int(offs[i]), int(offs[i + 1])
                    aln = ReadAln(names[n_offs[i]:n_offs[i + 1]],
                                  int(starts[i]), False)
                    aln.positions = obs_pos[a:b]
                    aln.alleles = obs_allele[a:b]
                    aln.quals = obs_qual[a:b]
                    out.append(aln)
                for pos, side in zip(r["clip_pos"].tolist(),
                                     r["clip_side"].tolist()):
                    entry = clip_count.setdefault(pos, [0, 0])
                    entry[side] += 1
            if ok:
                return out, clip_count

    extractor = AlleleExtractor(positions, infos, ref_string,
                                sv_entries=sv_entries, mod_entries=mod_entries,
                                sv_window=sv_window, sv_threshold=sv_threshold)
    out: list[ReadAln] = []
    clip_count: dict[int, list[int]] = {}
    skip_mask = FLAG_UNMAP | FLAG_SECONDARY | FLAG_DUP
    for path in bam_paths:
        extractor.reset_stream()
        reader = open_alignment(path, fasta)
        try:
            if chrom not in reader.ref_id:
                continue
            for rec in reader.fetch(chrom, 0, last_snp_pos):
                if rec.mapq < mapping_quality or (rec.flag & skip_mask):
                    continue
                extractor.process_record(rec, out, clip_count)
        finally:
            reader.close()
    return out, clip_count
