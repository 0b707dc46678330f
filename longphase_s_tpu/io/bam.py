"""BAM codec (reader + writer), implemented from the SAM/BAM spec v1.6.

Replaces htslib's sam_read1/sam_write1 for this framework. Records keep their
raw on-disk bytes so the haplotag pipeline can append HP/PS/PQ aux tags and
re-emit otherwise bit-identical records (reference behavior:
HaplotagProcess.cpp:357-361 appends tags to the htslib record then writes it).

CIGAR/seq decoding yields numpy arrays ready for the host allele-extraction
walk (core/alleles.py).
"""

from __future__ import annotations

import struct

import numpy as np

from .bgzf import BgzfReader, BgzfWriter

SEQ_NT16 = "=ACMGRSVTWYHKDBN"
_SEQ_NT16_LUT = np.frombuffer(SEQ_NT16.encode("ascii"), dtype=np.uint8)
CIGAR_OPS = "MIDNSHP=X"

# cigar op codes
BAM_CMATCH = 0
BAM_CINS = 1
BAM_CDEL = 2
BAM_CREF_SKIP = 3
BAM_CSOFT_CLIP = 4
BAM_CHARD_CLIP = 5
BAM_CPAD = 6
BAM_CEQUAL = 7
BAM_CDIFF = 8

# flags
FLAG_UNMAP = 0x4
FLAG_REVERSE = 0x10
FLAG_SECONDARY = 0x100
FLAG_QCFAIL = 0x200
FLAG_DUP = 0x400
FLAG_SUPPLEMENTARY = 0x800

_AUX_SIZE = {"A": 1, "c": 1, "C": 1, "s": 2, "S": 2, "i": 4, "I": 4, "f": 4}
_AUX_FMT = {"c": "<b", "C": "<B", "s": "<h", "S": "<H", "i": "<i", "I": "<I", "f": "<f"}


class BamRecord:
    """Lazy view over one alignment record's raw bytes (without block_size)."""

    __slots__ = ("raw", "_qname", "_cigar", "_extra", "_nib")

    def __init__(self, raw: bytes):
        self.raw = raw
        self._qname = None
        self._cigar = None
        self._extra = b""  # appended aux bytes (for tagging)
        self._nib = None

    # fixed fields -------------------------------------------------------
    @property
    def tid(self) -> int:
        return struct.unpack_from("<i", self.raw, 0)[0]

    @property
    def pos(self) -> int:
        return struct.unpack_from("<i", self.raw, 4)[0]

    @property
    def mapq(self) -> int:
        return self.raw[9]

    @property
    def flag(self) -> int:
        return struct.unpack_from("<H", self.raw, 14)[0]

    @property
    def n_cigar(self) -> int:
        return struct.unpack_from("<H", self.raw, 12)[0]

    @property
    def l_seq(self) -> int:
        return struct.unpack_from("<i", self.raw, 16)[0]

    @property
    def qname(self) -> str:
        if self._qname is None:
            l_read_name = self.raw[8]
            self._qname = self.raw[32:32 + l_read_name - 1].decode("ascii")
        return self._qname

    @property
    def is_reverse(self) -> bool:
        return bool(self.flag & FLAG_REVERSE)

    # variable fields ----------------------------------------------------
    def cigar(self) -> np.ndarray:
        """uint32 array: (oplen << 4) | op."""
        if self._cigar is None:
            off = 32 + self.raw[8]
            self._cigar = np.frombuffer(self.raw, dtype="<u4", count=self.n_cigar, offset=off)
        return self._cigar

    def cigar_tuples(self):
        c = self.cigar()
        return [(int(x) & 0xF, int(x) >> 4) for x in c]

    def ref_end(self) -> int:
        """0-based exclusive alignment end (bam_endpos semantics): pos plus
        reference-consuming op lengths (M/D/N/=/X)."""
        c = self.cigar()
        if len(c) == 0:
            return self.pos + 1
        ops = c & 0xF
        consumes = (ops == 0) | (ops == 2) | (ops == 3) | (ops == 7) | (ops == 8)
        return self.pos + int((c[consumes] >> 4).sum())

    def seq_nibbles(self) -> np.ndarray:
        """4-bit codes per base (nt16), decoded to one uint8 per base."""
        if self._nib is not None:
            return self._nib
        off = 32 + self.raw[8] + 4 * self.n_cigar
        n = self.l_seq
        packed = np.frombuffer(self.raw, dtype=np.uint8, count=(n + 1) // 2, offset=off)
        out = np.empty(n, dtype=np.uint8)
        out[0::2] = packed >> 4
        out[1::2] = packed[: n // 2] & 0xF
        self._nib = out
        return out

    def seq(self) -> str:
        return _SEQ_NT16_LUT[self.seq_nibbles()].tobytes().decode("ascii")

    def qual(self) -> np.ndarray:
        off = 32 + self.raw[8] + 4 * self.n_cigar + (self.l_seq + 1) // 2
        return np.frombuffer(self.raw, dtype=np.uint8, count=self.l_seq, offset=off)

    # aux tags -----------------------------------------------------------
    def _aux_offset(self) -> int:
        return 32 + self.raw[8] + 4 * self.n_cigar + (self.l_seq + 1) // 2 + self.l_seq

    def iter_aux(self):
        """Yield (tag, type_char, start_offset, end_offset) over raw bytes."""
        data = self.raw
        i = self._aux_offset()
        end = len(data)
        while i + 3 <= end:
            start = i
            tag = data[i:i + 2].decode("ascii")
            t = chr(data[i + 2])
            i += 3
            if t in _AUX_SIZE:
                i += _AUX_SIZE[t]
            elif t in ("Z", "H"):
                j = data.index(b"\x00", i)
                i = j + 1
            elif t == "B":
                sub = chr(data[i])
                count = struct.unpack_from("<I", data, i + 1)[0]
                i += 5 + _AUX_SIZE[sub] * count
            else:
                raise ValueError(f"bad aux type {t!r}")
            yield tag, t, start, i

    def get_tag(self, tag: str):
        for t, typ, start, end in self.iter_aux():
            if t == tag:
                body = self.raw[start + 3:end]
                if typ in _AUX_FMT:
                    return struct.unpack(_AUX_FMT[typ], body)[0]
                if typ == "A":
                    return chr(body[0])
                if typ in ("Z", "H"):
                    return body[:-1].decode("ascii")
                if typ == "B":
                    sub = chr(body[0])
                    count = struct.unpack_from("<I", body, 1)[0]
                    return list(struct.unpack_from("<" + _AUX_FMT[sub][1] * count, body, 5))
        return None

    def append_tag_int(self, tag: str, value: int):
        self._extra += tag.encode("ascii") + b"i" + struct.pack("<i", value)

    def append_tag_str(self, tag: str, value: str):
        self._extra += tag.encode("ascii") + b"Z" + value.encode("ascii") + b"\x00"

    def strip_tags(self, tags: set[str]):
        """Remove existing aux tags by name (rewrites raw)."""
        spans = [(s, e) for t, _ty, s, e in self.iter_aux() if t in tags]
        if not spans:
            return
        raw = bytearray(self.raw)
        for s, e in reversed(spans):
            del raw[s:e]
        self.raw = bytes(raw)
        self._cigar = None

    def to_bytes(self) -> bytes:
        return self.raw + self._extra


_COMPLEMENT = {"A": "T", "C": "G", "G": "C", "T": "A", "N": "N", "U": "A"}
# nt16 codes for unambiguous bases (htslib seq_nt16_table); ambiguity codes
# deliberately don't match a single-base MM target, same as the ASCII compare.
_NT16_OF_BASE = {"A": 1, "C": 2, "G": 4, "T": 8, "U": 8, "N": 15}


def _mod_tags(rec: "BamRecord"):
    """One aux walk fetching MM/Mm (str) and ML/Ml (uint8 array) together."""
    mm = None
    ml = None
    for t, typ, start, end in rec.iter_aux():
        if mm is None and typ == "Z" and t in ("MM", "Mm"):
            mm = rec.raw[start + 3:end - 1].decode("ascii")
        elif ml is None and typ == "B" and t in ("ML", "Ml"):
            if rec.raw[start + 3] == ord("C"):
                ml = np.frombuffer(rec.raw, dtype=np.uint8,
                                   count=end - start - 8, offset=start + 8)
            else:  # non-uint8 ML is out of spec; decode generically
                ml = np.asarray(rec.get_tag(t))
        if mm is not None and ml is not None:
            break
    return mm, ml


def decode_base_mods(rec: "BamRecord", want_code: str = "m"):
    """Decode MM/ML base-modification tags (SAM tags spec §1.7).

    Returns a sorted list of (stored_seq_pos, qual) for the requested mod code
    — the same stream htslib's bam_parse_basemod/bam_next_basemod yields
    (positions ascending in the stored sequence orientation; reverse-strand
    reads are walked from the tail counting complemented bases).
    """
    import re

    mm, ml = _mod_tags(rec)
    if not mm:
        return []
    if ml is None:
        ml = np.zeros(0, np.uint8)
    n_ml = len(ml)

    nib = rec.seq_nibbles()
    n = len(nib)
    reverse = rec.is_reverse
    out = []
    ml_idx = 0
    for sub in mm.split(";"):
        if not sub:
            continue
        parts = sub.split(",")
        head = parts[0]
        m = re.match(r"([ACGTUN])([-+])([a-z]+|\d+)([.?]?)", head)
        if not m:
            continue
        base, _strand, codes, _mode = m.groups()
        deltas = [int(d) for d in parts[1:]]
        code_list = [codes] if codes.isdigit() else list(codes)
        if base == "N":
            positions = np.arange(n)
        else:
            target = _COMPLEMENT.get(base, base) if reverse else base
            positions = np.nonzero(nib == _NT16_OF_BASE[target])[0]
        if reverse:
            positions = positions[::-1]
        npos = len(positions)
        if deltas and len(code_list) == 1:
            # common case fully vectorized: one mod code per subtag
            if code_list[0] == want_code:
                idxs = np.cumsum(np.asarray(deltas, np.int64) + 1) - 1
                js = np.nonzero(idxs < npos)[0]
                sel = positions[idxs[js]]
                mlp = ml_idx + js
                quals = np.where(mlp < n_ml, ml[np.minimum(mlp, n_ml - 1)], 0) \
                    if n_ml else np.zeros(len(js), np.uint8)
                out.extend(zip(sel.tolist(), quals.tolist()))
            ml_idx += len(deltas)
            continue
        idx = -1
        for d in deltas:
            idx += d + 1
            if idx >= npos:
                ml_idx += len(code_list)
                continue
            pos = int(positions[idx])
            for c in code_list:
                q = int(ml[ml_idx]) if ml_idx < n_ml else 0
                ml_idx += 1
                if c == want_code:
                    out.append((pos, q))
    out.sort()
    return out


class BamReader:
    def __init__(self, path: str):
        self._path = path
        self._bai = None
        self._bai_tried = False
        self._bgzf = BgzfReader(path)
        magic = self._bgzf.read(4)
        if magic != b"BAM\x01":
            raise ValueError(f"{path}: not a BAM file")
        l_text = struct.unpack("<i", self._bgzf.read(4))[0]
        self.header_text = self._bgzf.read(l_text).decode("ascii", "replace")
        n_ref = struct.unpack("<i", self._bgzf.read(4))[0]
        self.references: list[str] = []
        self.lengths: list[int] = []
        for _ in range(n_ref):
            l_name = struct.unpack("<i", self._bgzf.read(4))[0]
            name = self._bgzf.read(l_name)[:-1].decode("ascii")
            l_ref = struct.unpack("<i", self._bgzf.read(4))[0]
            self.references.append(name)
            self.lengths.append(l_ref)
        self.ref_id = {n: i for i, n in enumerate(self.references)}
        self._data_voffset = self._bgzf.tell_virtual()

    def _load_bai(self):
        """Parse the .bai companion (SAM spec section 5.2) once, lazily."""
        if self._bai_tried:
            return self._bai
        self._bai_tried = True
        import os
        for cand in (self._path + ".bai",
                     self._path.rsplit(".", 1)[0] + ".bai"):
            if os.path.exists(cand):
                break
        else:
            return None
        with open(cand, "rb") as f:
            buf = f.read()
        if buf[:4] != b"BAI\x01":
            return None
        off = 4
        (n_ref,) = struct.unpack_from("<i", buf, off)
        off += 4
        refs = []
        for _ in range(n_ref):
            (n_bin,) = struct.unpack_from("<i", buf, off)
            off += 4
            bins = {}
            for _ in range(n_bin):
                bin_id, n_chunk = struct.unpack_from("<Ii", buf, off)
                off += 8
                chunks = []
                for _ in range(n_chunk):
                    beg, cend = struct.unpack_from("<QQ", buf, off)
                    off += 16
                    chunks.append((beg, cend))
                bins[bin_id] = chunks
            (n_intv,) = struct.unpack_from("<i", buf, off)
            off += 4
            intervals = list(struct.unpack_from(f"<{n_intv}Q", buf, off))
            off += 8 * n_intv
            refs.append((bins, intervals))
        self._bai = refs
        return self._bai

    @staticmethod
    def _reg2bins(beg, end):
        end -= 1
        bins = [0]
        for shift, base in ((26, 1), (23, 9), (20, 73), (17, 585),
                            (14, 4681)):
            bins.extend(range(base + (beg >> shift), base + (end >> shift) + 1))
        return bins

    def close(self):
        self._bgzf.close()

    def __iter__(self):
        while True:
            head = self._bgzf.read(4)
            if len(head) < 4:
                return
            block_size = struct.unpack("<i", head)[0]
            raw = self._bgzf.read(block_size)
            if len(raw) < block_size:
                raise ValueError("truncated BAM record")
            yield BamRecord(raw)

    def seek_chromosome(self, chrom: str) -> int:
        """Position the BGZF stream at the chromosome's first candidate
        chunk (BAI) or at the data start; returns the tid. Used by the
        bounded-memory streaming extraction."""
        tid = self.ref_id[chrom]
        bai = self._load_bai()
        if bai is not None and tid < len(bai):
            bins, intervals = bai[tid]
            qend = self.lengths[tid] or (1 << 29) - 1
            chunks = []
            for b in self._reg2bins(0, max(qend, 1)):
                chunks.extend(bins.get(b, ()))
            if chunks:
                min_lin = intervals[0] if len(intervals) else 0
                cand = [c for c in chunks if c[1] > min_lin] or chunks
                self._bgzf.seek_virtual(min(c[0] for c in cand))
                return tid
        self._bgzf.seek_virtual(self._data_voffset)
        return tid

    def fetch(self, chrom: str, start: int = 0, end: int | None = None):
        """Region iteration (records overlapping [start, end)), htslib
        region-query semantics (the reference queries ``chr:1-lastSNPPos``,
        ParsingBam.cpp:1273-1279): a record overlaps if ref_start < end and
        ref_end > start. Uses the .bai index to seek to the first candidate
        chunk when one is present; falls back to a linear scan otherwise.
        """
        tid = self.ref_id[chrom]
        bai = self._load_bai()
        if bai is not None and tid < len(bai):
            bins, intervals = bai[tid]
            qend = end if end is not None else (self.lengths[tid]
                                                or (1 << 29) - 1)
            chunks = []
            for b in self._reg2bins(start, max(qend, start + 1)):
                chunks.extend(bins.get(b, ()))
            if not chunks:
                return
            min_lin = intervals[start >> 14] if (start >> 14) < len(intervals) \
                else 0
            cand = [c for c in chunks if c[1] > min_lin] or chunks
            self._bgzf.seek_virtual(min(c[0] for c in cand))
        else:
            self._bgzf.seek_virtual(self._data_voffset)
        for rec in self:
            if rec.tid != tid:
                if rec.tid > tid >= 0 and rec.tid != -1:
                    # BAM sorted by tid: once past, stop.
                    if rec.tid > tid:
                        return
                continue
            if end is not None and rec.pos >= end:
                return
            if start > 0 and rec.ref_end() <= start:
                continue
            yield rec


def region_bounds(region: str, chrom_len: int):
    """htslib region-string range: ``chr:beg-end`` is 1-based inclusive ->
    0-based [beg-1, end) (sam_itr_querys semantics, HaplotagParsingBam.cpp:449).
    Returns (start, end) for :meth:`BamReader.fetch`."""
    if ":" not in region:
        return 0, chrom_len
    rng = region.split(":", 1)[1].replace(",", "")
    if "-" in rng:
        b, e = rng.split("-", 1)
        return max(0, int(b) - 1), int(e)
    return max(0, int(rng) - 1), chrom_len


def _reg2bin(beg: int, end: int) -> int:
    """BAM spec reg2bin."""
    end -= 1
    if beg >> 14 == end >> 14:
        return ((1 << 15) - 1) // 7 + (beg >> 14)
    if beg >> 17 == end >> 17:
        return ((1 << 12) - 1) // 7 + (beg >> 17)
    if beg >> 20 == end >> 20:
        return ((1 << 9) - 1) // 7 + (beg >> 20)
    if beg >> 23 == end >> 23:
        return ((1 << 6) - 1) // 7 + (beg >> 23)
    if beg >> 26 == end >> 26:
        return ((1 << 3) - 1) // 7 + (beg >> 26)
    return 0


class BamWriter:
    def __init__(self, path: str, header_text: str, references: list[str], lengths: list[int]):
        self._bgzf = BgzfWriter(path)
        text = header_text.encode("ascii")
        self._bgzf.write(b"BAM\x01" + struct.pack("<i", len(text)) + text)
        self._bgzf.write(struct.pack("<i", len(references)))
        for name, length in zip(references, lengths):
            nb = name.encode("ascii") + b"\x00"
            self._bgzf.write(struct.pack("<i", len(nb)) + nb + struct.pack("<i", length))

    def write(self, rec: BamRecord):
        body = rec.to_bytes()
        self._bgzf.write(struct.pack("<i", len(body)) + body)

    def write_sam_fields(self, qname: str, flag: int, tid: int, pos: int, mapq: int,
                         cigar: list[tuple[int, int]], seq: str, qual: bytes,
                         next_tid: int = -1, next_pos: int = -1, tlen: int = 0,
                         tags: bytes = b""):
        """Build and write a record from parsed fields (used by test fixtures)."""
        name_b = qname.encode("ascii") + b"\x00"
        ref_len = sum(ln for op, ln in cigar if op in (0, 2, 3, 7, 8)) or 1
        bin_ = _reg2bin(pos, pos + ref_len) if pos >= 0 else 4680
        fixed = struct.pack(
            "<iiBBHHHiiii", tid, pos, len(name_b), mapq, bin_, len(cigar), flag,
            len(seq), next_tid, next_pos, tlen,
        )
        cig = b"".join(struct.pack("<I", (ln << 4) | op) for op, ln in cigar)
        nib = [SEQ_NT16.index(c) for c in seq.upper()]
        if len(nib) % 2:
            nib.append(0)
        packed = bytes((nib[i] << 4) | nib[i + 1] for i in range(0, len(nib), 2))
        body = fixed + name_b + cig + packed + bytes(qual) + tags
        self._bgzf.write(struct.pack("<i", len(body)) + body)

    def close(self):
        self._bgzf.close()
