"""Generic CIGAR walker (CigarParser::parsingCigar, HaplotagParsingBam.cpp:541-647).

Template-method framework shared by the somatic extraction / tagging
processors: walks an alignment against the per-chromosome multi-genome
variant table, invoking ``process_match`` per variant in M ops (with base and
the reference's IsAltIndel decision) and ``process_deletion`` per variant
inside D ops.
"""

from __future__ import annotations

import sys

from ..io.bam import (BAM_CDEL, BAM_CDIFF, BAM_CEQUAL, BAM_CHARD_CLIP,
                      BAM_CINS, BAM_CMATCH, BAM_CPAD, BAM_CREF_SKIP,
                      BAM_CSOFT_CLIP, SEQ_NT16)
from ..io.phased_vcf import NORMAL, TUMOR, VT_DELETION, VT_INSERTION, VT_SNP


class CigarWalk:
    """Stateful per-chromosome walker; subclasses override the hooks."""

    def __init__(self, positions, variants, ref_string: str):
        self.positions = positions
        self.variants = variants
        self.ref_string = ref_string
        self.first_idx = 0
        # per-alignment state (set in walk)
        self.rec = None
        self.seq = None
        self.cigars = None
        self.ref_pos = 0
        self.query_pos = 0

    # hooks -------------------------------------------------------------
    def process_match(self, pos, entry, base, is_alt, op_len, ci):
        pass

    def process_deletion(self, pos, entry, op_len, ci, state):
        pass

    def process_insertion(self, length):
        pass

    # ------------------------------------------------------------------
    def _is_alt_indel(self, pos, var, base, op_len, ci):
        """CigarParser::IsAltIndel (HaplotagParsingBam.cpp:650-670)."""
        n_cigar = len(self.cigars)
        if var.variant_type == VT_SNP:
            return base == var.alt
        if var.variant_type == VT_INSERTION and ci + 1 < n_cigar:
            return (self.ref_pos + op_len - 1 == pos
                    and self.cigars[ci + 1][0] == BAM_CINS)
        if var.variant_type == VT_DELETION and ci + 1 < n_cigar:
            return (self.ref_pos + op_len - 1 == pos
                    and self.cigars[ci + 1][0] == BAM_CDEL)
        return False

    def walk(self, rec):
        positions = self.positions
        variants = self.variants
        n = len(positions)

        while self.first_idx < n and positions[self.first_idx] < rec.pos:
            self.first_idx += 1
        if self.first_idx >= n:
            return
        vi = self.first_idx

        self.rec = rec
        self.seq = rec.seq_nibbles()
        self.cigars = rec.cigar_tuples()
        self.ref_pos = rec.pos
        self.query_pos = 0
        cigars = self.cigars

        for ci, (op, length) in enumerate(cigars):
            while vi < n and positions[vi] < self.ref_pos:
                vi += 1
            if op in (BAM_CMATCH, BAM_CEQUAL, BAM_CDIFF):
                while vi < n and positions[vi] < self.ref_pos + length:
                    pos = positions[vi]
                    offset = pos - self.ref_pos
                    if offset >= 0:
                        base = SEQ_NT16[self.seq[self.query_pos + offset]]
                        entry = variants[pos]
                        var = entry.get(NORMAL) or entry.get(TUMOR)
                        is_alt = (self._is_alt_indel(pos, var, base, length, ci)
                                  if var is not None else False)
                        self.process_match(pos, entry, base, is_alt, length, ci)
                    vi += 1
                self.query_pos += length
                self.ref_pos += length
            elif op == BAM_CINS:
                self.process_insertion(length)
                self.query_pos += length
            elif op == BAM_CDEL:
                state = {"already": False}
                while vi < n and positions[vi] < self.ref_pos + length:
                    self.process_deletion(positions[vi], variants[positions[vi]],
                                          length, ci, state)
                    vi += 1
                self.ref_pos += length
            elif op == BAM_CREF_SKIP:
                self.ref_pos += length
            elif op == BAM_CSOFT_CLIP:
                self.query_pos += length
            elif op in (BAM_CHARD_CLIP, BAM_CPAD):
                pass
            else:
                print(f"Alignment find unsupported CIGAR operation from read: "
                      f"{rec.qname}", file=sys.stderr)
                sys.exit(1)
