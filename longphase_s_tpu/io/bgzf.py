"""BGZF (Blocked GZip Format) codec.

Implemented from the SAM/BAM specification (section 4.1): a BGZF file is a
series of gzip members, each carrying a ``BC`` extra subfield whose payload is
``BSIZE`` (total member length minus one). Replaces the role htslib's bgzf.c
plays for the reference tool (the reference links htslib 1.16 for all BAM I/O;
see SURVEY.md L0). Written from the public spec — no htslib code used.
"""

from __future__ import annotations

import io
import struct
import zlib

_BGZF_HEADER = (
    b"\x1f\x8b\x08\x04"  # gzip magic, deflate, FEXTRA
    b"\x00\x00\x00\x00"  # mtime
    b"\x00\xff"          # XFL, OS=unknown
    b"\x06\x00"          # XLEN = 6
    b"\x42\x43\x02\x00"  # SI1='B' SI2='C' SLEN=2
)

# 28-byte EOF marker mandated by the spec.
BGZF_EOF = bytes.fromhex(
    "1f8b08040000000000ff0600424302001b0003000000000000000000"
)

MAX_BLOCK_SIZE = 65536


def is_bgzf(path: str) -> bool:
    with open(path, "rb") as f:
        head = f.read(18)
    return (
        len(head) >= 18
        and head[:4] == b"\x1f\x8b\x08\x04"
        and head[12:16] == b"\x42\x43\x02\x00"
    )


class BgzfReader(io.RawIOBase):
    """Sequential BGZF decompressor with virtual-offset support.

    Virtual offsets are ``coffset << 16 | uoffset`` as in the spec, enabling
    BAI-index seeks later.

    With the native library, blocks decode in batched multi-MB spans (one
    ctypes call + parallel inflate per span instead of one call per 64KB
    block) while the per-block offset tables keep virtual offsets exact.
    """

    _SPAN = 4 << 20  # compressed readahead per native span decode

    def __init__(self, path: str):
        self._fh = open(path, "rb")
        self._block_data = b""
        self._block_coffset = 0
        self._within = 0
        # span-mode state (native batched decode)
        self._span = None        # decoded bytes of the current span
        self._span_pos = 0       # cursor within the decoded span
        self._span_base = 0      # file offset of the span's first block
        self._span_coff = None   # per-block compressed offsets (within span)
        self._span_uoff = None   # per-block uncompressed starts (+ total)
        try:
            from .. import native
            self._native = native if native.available() else None
        except Exception:  # noqa: BLE001
            self._native = None

    # -- native span machinery -------------------------------------------
    def _load_span(self) -> bool:
        """Decode the next batch of blocks via one native call. Returns
        False at EOF or when the native path can't serve (fallback to the
        per-block loader)."""
        if self._native is None:
            return False
        base = self._fh.tell()
        raw = self._fh.read(self._SPAN)
        if not raw:
            self._span = None
            return False
        res = self._native.bgzf_inflate_span(raw)
        if res is None:
            self._fh.seek(base)
            self._span = None
            return False
        data, coff, uoff, used = res
        if used == 0:
            self._fh.seek(base)
            self._span = None
            return False
        self._fh.seek(base + used)
        self._span = data
        self._span_pos = 0
        self._span_base = base
        self._span_coff = coff
        self._span_uoff = uoff
        return True

    def close(self):
        self._fh.close()

    # -- block machinery -------------------------------------------------
    def _load_block(self) -> bool:
        self._block_coffset = self._fh.tell()
        header = self._fh.read(12)
        if len(header) == 0:
            self._block_data = b""
            self._within = 0
            return False
        if len(header) < 12 or header[:4] != b"\x1f\x8b\x08\x04":
            raise ValueError("corrupt BGZF block header")
        xlen = struct.unpack("<H", header[10:12])[0]
        extra = self._fh.read(xlen)
        bsize = None
        off = 0
        while off + 4 <= xlen:
            si1, si2, slen = extra[off], extra[off + 1], struct.unpack("<H", extra[off + 2:off + 4])[0]
            if si1 == 66 and si2 == 67 and slen == 2:
                bsize = struct.unpack("<H", extra[off + 4:off + 6])[0] + 1
            off += 4 + slen
        if bsize is None:
            raise ValueError("BGZF block missing BC subfield")
        cdata_len = bsize - 12 - xlen - 8
        cdata = self._fh.read(cdata_len)
        tail = self._fh.read(8)
        isize = struct.unpack("<I", tail[4:8])[0]
        if not isize:
            self._block_data = b""
        else:
            data = None
            if self._native is not None:
                data = self._native.inflate_raw(cdata, isize)
            self._block_data = data if data is not None \
                else zlib.decompress(cdata, -15)
        self._within = 0
        return True

    # -- reading ---------------------------------------------------------
    def read(self, n: int = -1) -> bytes:
        chunks = []
        if n < 0:
            while True:
                if self._span is not None and self._span_pos < len(self._span):
                    chunks.append(self._span[self._span_pos:])
                    self._span_pos = len(self._span)
                    continue
                if self._load_span():
                    continue
                if self._within >= len(self._block_data):
                    if not self._load_block():
                        break
                chunks.append(self._block_data[self._within:])
                self._within = len(self._block_data)
            return b"".join(chunks)
        remaining = n
        while remaining > 0:
            if self._span is not None and self._span_pos < len(self._span):
                take = min(remaining, len(self._span) - self._span_pos)
                chunks.append(self._span[self._span_pos:self._span_pos + take])
                self._span_pos += take
                remaining -= take
                continue
            if self._load_span():
                continue
            if self._within >= len(self._block_data):
                if not self._load_block():
                    break
            take = min(remaining, len(self._block_data) - self._within)
            chunks.append(self._block_data[self._within:self._within + take])
            self._within += take
            remaining -= take
        return b"".join(chunks)

    def readable(self) -> bool:
        return True

    # -- virtual offsets -------------------------------------------------
    def tell_virtual(self) -> int:
        if self._span is not None:
            import bisect

            # block containing the cursor (cursor==uoff[i+1] maps to the
            # next block at uoffset 0 — an equivalent virtual offset)
            i = bisect.bisect_right(self._span_uoff, self._span_pos) - 1
            if i >= len(self._span_coff):
                i = len(self._span_coff) - 1
            return ((self._span_base + self._span_coff[i]) << 16) | \
                (self._span_pos - self._span_uoff[i])
        return (self._block_coffset << 16) | self._within

    def seek_virtual(self, voffset: int):
        coffset, uoffset = voffset >> 16, voffset & 0xFFFF
        self._fh.seek(coffset)
        self._span = None
        if self._load_span():
            self._span_pos = uoffset
            return
        if not self._load_block():
            if uoffset:
                raise ValueError("seek past EOF")
            return
        self._within = uoffset


class BgzfWriter(io.RawIOBase):
    # with the native compressor, buffer this much before a parallel flush
    _NATIVE_FLUSH = 8 << 20

    def __init__(self, path_or_fh, level: int = 6):
        if isinstance(path_or_fh, str):
            self._fh = open(path_or_fh, "wb")
            self._own = True
        else:
            self._fh = path_or_fh
            self._own = False
        self._level = level
        self._buf = bytearray()
        try:
            from .. import native
            self._native = native if native.available() else None
        except Exception:  # noqa: BLE001
            self._native = None

    def write(self, data: bytes) -> int:
        self._buf += data
        if self._native is not None:
            # parallel multi-block compression (the htslib thread-pool analog)
            if len(self._buf) >= self._NATIVE_FLUSH:
                self._fh.write(self._native.bgzf_compress(bytes(self._buf),
                                                          self._level))
                self._buf = bytearray()
            return len(data)
        while len(self._buf) >= 65000:
            self._flush_block(self._buf[:65000])
            del self._buf[:65000]
        return len(data)

    def _flush_block(self, payload: bytes):
        co = zlib.compressobj(self._level, zlib.DEFLATED, -15)
        cdata = co.compress(bytes(payload)) + co.flush()
        bsize = len(cdata) + 12 + 6 + 8
        if bsize > MAX_BLOCK_SIZE:
            # Incompressible data: split payload.
            half = len(payload) // 2
            self._flush_block(payload[:half])
            self._flush_block(payload[half:])
            return
        self._fh.write(_BGZF_HEADER)
        self._fh.write(struct.pack("<H", bsize - 1))
        self._fh.write(cdata)
        self._fh.write(struct.pack("<II", zlib.crc32(bytes(payload)) & 0xFFFFFFFF, len(payload)))

    def close(self):
        if self._fh is None:
            return
        if self._buf:
            if self._native is not None:
                self._fh.write(self._native.bgzf_compress(bytes(self._buf),
                                                          self._level))
            else:
                self._flush_block(self._buf)
            self._buf = bytearray()
        self._fh.write(BGZF_EOF)
        if self._own:
            self._fh.close()
        self._fh = None

    def writable(self) -> bool:
        return True


def open_maybe_bgzf(path: str):
    """Open a text file that may be plain, gzip, or BGZF compressed."""
    import gzip

    with open(path, "rb") as f:
        magic = f.read(2)
    if magic == b"\x1f\x8b":
        return io.TextIOWrapper(gzip.open(path, "rb"), encoding="ascii")
    return open(path, "rt", encoding="ascii")
