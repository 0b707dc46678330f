"""FASTA + .fai random access.

Replaces htslib faidx for the reference's FastaParser (ParsingBam.cpp:17-59):
the phase pipeline fetches each chromosome's sequence ``[0, lastSNP+5]``.
"""

from __future__ import annotations

import os


class FastaFile:
    def __init__(self, path: str):
        self.path = path
        self.index: dict[str, tuple[int, int, int, int]] = {}
        fai = path + ".fai"
        if not os.path.exists(fai):
            build_fai(path)
        with open(fai) as f:
            for line in f:
                name, length, offset, linebases, linewidth = line.split("\t")[:5]
                self.index[name] = (int(length), int(offset), int(linebases), int(linewidth))
        self._fh = open(path, "rb")

    def close(self):
        self._fh.close()

    @property
    def references(self):
        return list(self.index)

    def length(self, name: str) -> int:
        return self.index[name][0]

    def fetch(self, name: str, start: int = 0, end: int | None = None) -> str:
        """0-based half-open fetch, clamped to the sequence (faidx semantics)."""
        length, offset, linebases, linewidth = self.index[name]
        if end is None or end > length:
            end = length
        start = max(0, start)
        if start >= end:
            return ""
        first_line = start // linebases
        first_col = start % linebases
        file_start = offset + first_line * linewidth + first_col
        last_line = (end - 1) // linebases
        last_col = (end - 1) % linebases
        file_end = offset + last_line * linewidth + last_col + 1
        self._fh.seek(file_start)
        raw = self._fh.read(file_end - file_start)
        return raw.decode("ascii").replace("\n", "").replace("\r", "")


def build_fai(path: str):
    """Generate a .fai index (same five-column format as samtools faidx)."""
    entries = []
    with open(path, "rb") as f:
        name = None
        length = 0
        offset = 0
        linebases = 0
        linewidth = 0
        first_line = True
        while True:
            pos = f.tell()
            line = f.readline()
            if not line:
                break
            if line.startswith(b">"):
                if name is not None:
                    entries.append((name, length, offset, linebases, linewidth))
                name = line[1:].split()[0].decode("ascii")
                length = 0
                offset = f.tell()
                first_line = True
            else:
                stripped = line.rstrip(b"\r\n")
                if first_line and stripped:
                    linebases = len(stripped)
                    linewidth = len(line)
                    first_line = False
                length += len(stripped)
        if name is not None:
            entries.append((name, length, offset, linebases, linewidth))
    with open(path + ".fai", "w") as out:
        for e in entries:
            out.write("\t".join(str(x) for x in e) + "\n")


def write_fasta(path: str, sequences: dict[str, str], width: int = 60):
    with open(path, "w") as f:
        for name, seq in sequences.items():
            f.write(f">{name}\n")
            for i in range(0, len(seq), width):
                f.write(seq[i:i + width] + "\n")
    build_fai(path)
