"""CRAM 3.1 codecs, decode side: rANS Nx16 (block compression method 5)
and the tok3 read-name tokeniser (method 8).

Stream layouts follow the CRAMcodecs 3.1 draft specification; behavior is
validated against htslib 1.16's htscodecs implementations (reference:
/root/reference/htslib/htscodecs/htscodecs/rANS_static4x16pr.c,
tokenise_name3.c, pack.c, rle.c) through the tools/bam2cram31.c interop
oracle — htslib-written 3.1 CRAMs must decode to byte-identical records.

The 4-way interleaved rANS here uses 16-bit renormalisation with lower
bound 2^15 (vs the 4x8 codec's 8-bit renorm in cram.py) and 12-bit
frequencies for order-0 / 12-or-10-bit for order-1, plus the optional
bit-PACK, RLE and byte-STRIPE transforms layered around the entropy core.
The 32-way (X32/SIMD) layout is never emitted inside CRAM blocks by
htslib's encoder (it requires RANS_ORDER_SIMD_AUTO, which cram_io.c never
passes), so it is rejected rather than implemented.

This pure-Python path is the portable fallback; the native decoder in
native/lps_cram.cpp implements the same formats for the production path.
"""

from __future__ import annotations

import numpy as np

# flag bits of the leading format byte (CRAM 3.1 spec §rANS Nx16)
O1, X32, STRIPE, NOSZ, CAT, RLE, PACK = 1, 4, 8, 0x10, 0x20, 0x40, 0x80

_L16 = 1 << 15      # renormalisation lower bound
_TF12 = 12          # order-0 (and usual order-1) frequency precision


def uint7(buf, off):
    """Spec varint ("uint7"): 7 bits per byte, MSB-first, 0x80 continues."""
    v = 0
    while True:
        c = buf[off]
        off += 1
        v = (v << 7) | (c & 0x7F)
        if not (c & 0x80):
            return v, off


def _alphabet(data, off):
    """Symbol list with the spec's consecutive-run shorthand: after a
    symbol whose successor is also present, a run-length byte follows.
    Terminated by symbol 0 (which, first, can itself be a member)."""
    syms = []
    rle = 0
    j = data[off]
    off += 1
    while True:
        syms.append(j)
        if not rle and off < len(data) and data[off] == j + 1:
            j = data[off]
            rle = data[off + 1]
            off += 2
        elif rle:
            rle -= 1
            j += 1
        else:
            j = data[off]
            off += 1
        if j == 0:
            break
    return syms, off


def _norm_shift(freqs, total, target):
    """Frequencies are stored normalised to a power-of-two total dividing
    the target; scale them up to exactly the target."""
    if total == 0 or total == target:
        return freqs
    shift = 0
    while total < target:
        total *= 2
        shift += 1
    return [f << shift for f in freqs]


def _build_tables(syms, freqs, precision):
    """Cumulative lookup arrays over the [0, 2^precision) range:
    slot -> (symbol, freq, offset-within-symbol)."""
    size = 1 << precision
    ssym = np.zeros(size, np.uint8)
    sfreq = np.zeros(size, np.uint32)
    sbase = np.zeros(size, np.uint32)
    x = 0
    for s, f in zip(syms, freqs):
        if f == 0:
            continue
        if f > size - x:
            raise ValueError("rANS Nx16 frequency table overflow")
        ssym[x:x + f] = s
        sfreq[x:x + f] = f
        sbase[x:x + f] = np.arange(f, dtype=np.uint32)
        x += f
    if x != size:
        raise ValueError("rANS Nx16 frequency table does not sum to total")
    return ssym, sfreq, sbase


def _o0_core(data, off, out_sz):
    """Order-0 core: shared frequency table, 4 interleaved states,
    16-bit renorm. Decodes exactly ``out_sz`` bytes starting at ``off``."""
    syms, off = _alphabet(data, off)
    freqs = []
    total = 0
    for _ in syms:
        f, off = uint7(data, off)
        freqs.append(f)
        total += f
    freqs = _norm_shift(freqs, total, 1 << _TF12)
    ssym, sfreq, sbase = _build_tables(syms, freqs, _TF12)
    R = [int.from_bytes(data[off + 4 * k:off + 4 * k + 4], "little")
         for k in range(4)]
    off += 16
    n = len(data)
    mask = (1 << _TF12) - 1
    out = bytearray(out_sz)
    ssym_l = ssym.tolist()
    sfreq_l = sfreq.tolist()
    sbase_l = sbase.tolist()
    for i in range(out_sz):
        k = i & 3
        x = R[k]
        m = x & mask
        out[i] = ssym_l[m]
        x = sfreq_l[m] * (x >> _TF12) + sbase_l[m]
        if x < _L16 and off + 1 < n:
            x = (x << 16) | data[off] | (data[off + 1] << 8)
            off += 2
        R[k] = x
    return bytes(out)


def _o1_tables(data, off, end, shift):
    """Per-context order-1 tables: an order-0 alphabet, then for each
    context symbol a frequency list with zero-run shorthand."""
    f0_syms, off = _alphabet(data, off)
    present = sorted(set(f0_syms))
    tables = {}
    for i in present:
        freqs = []
        total = 0
        dz = 0
        for _j in present:
            if dz:
                f = 0
                dz -= 1
            else:
                f, off = uint7(data, off)
                if f == 0:
                    dz = data[off]
                    off += 1
            freqs.append(f)
            total += f
        if not total:
            continue
        tables[i] = _build_tables(
            present, _norm_shift(freqs, total, 1 << shift), shift)
    return tables, off


def _o1_core(data, off, out_sz):
    """Order-1 core: per-previous-symbol tables (optionally themselves
    order-0 rANS compressed), 4 states over output quarters, state 3
    finishing the remainder."""
    b0 = data[off]
    shift = b0 >> 4
    comp = b0 & 1
    off += 1
    if comp:
        u_sz, off = uint7(data, off)
        c_sz, off = uint7(data, off)
        tab = _o0_core(data[off:off + c_sz], 0, u_sz)
        tables, _ = _o1_tables(tab, 0, len(tab), shift)
        off += c_sz
    else:
        tables, off = _o1_tables(data, off, len(data), shift)
    R = [int.from_bytes(data[off + 4 * k:off + 4 * k + 4], "little")
         for k in range(4)]
    off += 16
    n = len(data)
    mask = (1 << shift) - 1
    out = bytearray(out_sz)
    isz4 = out_sz >> 2
    pos = [0, isz4, 2 * isz4, 3 * isz4]
    lim = [isz4, 2 * isz4, 3 * isz4, out_sz]
    ctx = [0, 0, 0, 0]
    # hot python loop: keep table rows as plain lists
    cache = {i: (t[0].tolist(), t[1].tolist(), t[2].tolist())
             for i, t in tables.items()}
    empty = ([0] * (mask + 1), [0] * (mask + 1), [0] * (mask + 1))
    for _ in range(isz4):
        for k in range(4):
            ssym, sfreq, sbase = cache.get(ctx[k], empty)
            x = R[k]
            m = x & mask
            c = ssym[m]
            out[pos[k]] = c
            x = sfreq[m] * (x >> shift) + sbase[m]
            if x < _L16 and off + 1 < n:
                x = (x << 16) | data[off] | (data[off + 1] << 8)
                off += 2
            R[k] = x
            ctx[k] = c
            pos[k] += 1
    k = 3
    while pos[k] < out_sz:
        ssym, sfreq, sbase = cache.get(ctx[k], empty)
        x = R[k]
        m = x & mask
        c = ssym[m]
        out[pos[k]] = c
        x = sfreq[m] * (x >> shift) + sbase[m]
        if x < _L16 and off + 1 < n:
            x = (x << 16) | data[off] | (data[off + 1] << 8)
            off += 2
        R[k] = x
        ctx[k] = c
        pos[k] += 1
    return bytes(out)


def _unpack(packed, out_len, vals):
    """Expand bit-packed sub-symbols (LSB-first within each byte)."""
    n = len(vals)
    arr = np.frombuffer(packed, np.uint8)
    lut = np.asarray(vals, np.uint8)
    if n <= 1:
        return bytes([vals[0] if vals else 0]) * out_len
    if n <= 2:
        bits = np.unpackbits(arr[:, None], axis=1, bitorder="little")
        return lut[bits.reshape(-1)[:out_len]].tobytes()
    if n <= 4:
        quads = np.stack([arr & 3, (arr >> 2) & 3, (arr >> 4) & 3,
                          arr >> 6], axis=1)
        return lut[quads.reshape(-1)[:out_len]].tobytes()
    # n <= 16: two symbols per byte, low nibble first
    nib = np.stack([arr & 15, arr >> 4], axis=1)
    return lut[nib.reshape(-1)[:out_len]].tobytes()


def _unrle(lit, rle_syms, run, out_cap):
    out = bytearray()
    saved = bytearray(256)
    for s in rle_syms:
        saved[s] = 1
    roff = 0
    for b in lit:
        if saved[b]:
            rlen, roff = uint7(run, roff)
            out += bytes([b]) * (rlen + 1)
        else:
            out.append(b)
        if len(out) > out_cap:
            raise ValueError("rANS Nx16 RLE overran output")
    return bytes(out)


def rans16_decode(data, out_size=None):
    """Decode one rANS Nx16 stream. ``out_size`` is required only for
    NOSZ streams (STRIPE sub-streams)."""
    data = bytes(data)
    flags = data[0]

    if flags & STRIPE:
        ulen, off = uint7(data, 1)
        N = data[off]
        off += 1
        clens = []
        for _ in range(N):
            c, off = uint7(data, off)
            clens.append(c)
        ulenN = [ulen // N + (1 if (ulen % N) > i else 0) for i in range(N)]
        out = np.zeros(ulen, np.uint8)
        for i in range(N):
            sub = rans16_decode(data[off:off + clens[i]], ulenN[i])
            out[i::N] = np.frombuffer(sub, np.uint8)
            off += clens[i]
        return out.tobytes()

    off = 1
    order = flags & O1
    if flags & X32:
        raise ValueError("rANS Nx16 32-way interleave not supported "
                         "(never emitted inside CRAM blocks by htslib)")
    if flags & NOSZ:
        if out_size is None:
            raise ValueError("NOSZ rANS stream needs an explicit size")
        osz = out_size
    else:
        osz, off = uint7(data, off)

    stage_sz = osz  # size the entropy core must produce

    pack_vals = do_unpack = None
    if flags & PACK:
        n = data[off]
        if n == 0:
            n = 256
        if n > 16:          # >16 distinct symbols: stored unpacked
            off += 1
            do_unpack = False
        else:
            pack_vals = list(data[off + 1:off + 1 + n])
            off += 1 + n
            do_unpack = True
        stage_sz, off = uint7(data, off)

    rle_syms = run = None
    if flags & RLE:
        u_meta, off = uint7(data, off)
        rle_len, off = uint7(data, off)
        if u_meta & 1:
            meta = data[off:off + u_meta // 2]
            off += u_meta // 2
        else:
            c_meta, off = uint7(data, off)
            meta = _o0_core(data[off:off + c_meta], 0, u_meta // 2)
            off += c_meta
        nsyms = meta[0] if meta[0] else 256
        rle_syms = meta[1:1 + nsyms]
        run = meta[1 + nsyms:]
        stage_sz = rle_len

    if flags & CAT:
        cur = data[off:off + stage_sz]
    elif order:
        cur = _o1_core(data, off, stage_sz)
    else:
        cur = _o0_core(data, off, stage_sz)

    if rle_syms is not None:
        cur = _unrle(cur, rle_syms, run,
                     osz if not do_unpack else (osz + 7))
    if do_unpack:
        cur = _unpack(cur, osz, pack_vals)
    if len(cur) != osz:
        raise ValueError(f"rANS Nx16 size mismatch: {len(cur)} != {osz}")
    return bytes(cur)


# ---------------------------------------------------------------------------
# tok3 name tokeniser (method 8)
# ---------------------------------------------------------------------------

# token types (spec §name tokenisation)
(T_TYPE, T_ALPHA, T_CHAR, T_DIGITS0, T_DZLEN, T_DUP, T_DIFF, T_DIGITS,
 T_DDELTA, T_DDELTA0, T_MATCH, T_NOP, T_END) = range(13)


class _Stream:
    __slots__ = ("buf", "pos")

    def __init__(self, buf):
        self.buf = buf
        self.pos = 0

    def u8(self):
        if self.pos >= len(self.buf):
            return -1
        v = self.buf[self.pos]
        self.pos += 1
        return v

    def u32(self):
        p = self.pos
        if p + 4 > len(self.buf):
            raise ValueError("tok3 stream exhausted")
        self.pos = p + 4
        return int.from_bytes(self.buf[p:p + 4], "little")

    def cstr(self):
        p = self.pos
        e = self.buf.find(0, p)
        if e < 0:
            e = len(self.buf)
        self.pos = e + 1
        return self.buf[p:e]


def tok3_decode(data):
    """Decode a tok3 name block into the \\0-separated name stream the
    CRAM slice machinery consumes."""
    data = bytes(data)
    nreads = int.from_bytes(data[4:8], "little")
    use_arith = data[8]
    if use_arith:
        raise ValueError("tok3 arith-coded streams not supported "
                         "(htslib emits them only in archive profiles)")
    o = 9
    desc: dict[int, _Stream] = {}
    tnum = -1
    while o < len(data):
        ttype = data[o]
        o += 1
        if ttype & 64:
            # duplicate of an earlier stream
            j = (data[o] << 4) + data[o + 1]
            o += 2
            if ttype & 128:
                tnum += 1
            if (ttype & 15) and (ttype & 128):
                desc[tnum << 4] = _Stream(
                    bytes([ttype & 15]) + bytes([T_MATCH]) * (nreads - 1))
            i = (tnum << 4) | (ttype & 15)
            desc[i] = _Stream(desc[j].buf)
            continue
        if ttype & 128:
            tnum += 1
        if (ttype & 15) and (ttype & 128):
            desc[tnum << 4] = _Stream(
                bytes([ttype & 15]) + bytes([T_MATCH]) * (nreads - 1))
        i = (tnum << 4) | (ttype & 15)
        clen, nb = uint7(data, o)
        desc[i] = _Stream(rans16_decode(data[nb:nb + clen]))
        o = nb + clen

    names: list[bytes] = []
    toks: list[list] = []   # per name: list of (type, ival, sval)
    out = bytearray()
    t0s = desc.get(0)
    while t0s is not None and t0s.pos < len(t0s.buf):
        cnum = len(names)
        if cnum >= nreads:
            break
        t0 = t0s.u8()
        dist = desc[t0].u32()
        pnum = max(cnum - dist, 0)
        if t0 == T_DUP:
            names.append(names[pnum])
            toks.append(toks[pnum])
            out += names[pnum] + b"\0"
            continue
        name = bytearray()
        tl: list = [None]  # token 0 unused
        ntok = 1
        while True:
            s = desc.get(ntok << 4)
            tok = s.u8() if s is not None else -1
            if tok == T_CHAR:
                c = desc[(ntok << 4) | T_CHAR].u8()
                name.append(c)
                tl.append((T_CHAR, c, None))
            elif tok == T_ALPHA:
                sv = desc[(ntok << 4) | T_ALPHA].cstr()
                name += sv
                tl.append((T_ALPHA, 0, sv))
            elif tok == T_DIGITS0:
                vl = desc[(ntok << 4) | T_DZLEN].u8()
                v = desc[(ntok << 4) | T_DIGITS0].u32()
                name += b"%0*d" % (vl, v)
                tl.append((T_DIGITS0, v, vl))
            elif tok == T_DDELTA0:
                d = desc[(ntok << 4) | T_DDELTA0].u8()
                pt = toks[pnum][ntok]
                v = pt[1] + d
                name += b"%0*d" % (pt[2], v)
                tl.append((T_DIGITS0, v, pt[2]))
            elif tok == T_DIGITS:
                v = desc[(ntok << 4) | T_DIGITS].u32()
                name += b"%d" % v
                tl.append((T_DIGITS, v, None))
            elif tok == T_DDELTA:
                d = desc[(ntok << 4) | T_DDELTA].u8()
                v = toks[pnum][ntok][1] + d
                name += b"%d" % v
                tl.append((T_DIGITS, v, None))
            elif tok == T_NOP:
                tl.append((T_NOP, 0, None))
            elif tok == T_MATCH:
                pt = toks[pnum][ntok]
                if pt[0] == T_CHAR:
                    name.append(pt[1])
                elif pt[0] == T_ALPHA:
                    name += pt[2]
                elif pt[0] == T_DIGITS:
                    name += b"%d" % pt[1]
                elif pt[0] == T_DIGITS0:
                    name += b"%0*d" % (pt[2], pt[1])
                else:
                    raise ValueError("tok3: bad MATCH target")
                tl.append(pt)
            else:  # T_END or exhausted type stream (elided END)
                tl.append((T_END, 0, None))
                break
            ntok += 1
        names.append(bytes(name))
        toks.append(tl)
        out += name + b"\0"
    return bytes(out)
