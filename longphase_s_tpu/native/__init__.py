"""ctypes bindings for the native ingest library (liblps.so).

Auto-builds from source on first use if a compiler is available; callers must
handle ``available() == False`` by falling back to the pure-Python path.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
_LIB_PATH = os.path.join(_HERE, "liblps.so")
_SRC_PATH = os.path.join(_HERE, "lps_ingest.cpp")
_lock = threading.Lock()
_lib = None
_tried = False


def build():
    # prefer libdeflate for BGZF block decode (2-3x zlib); fall back to
    # zlib-only when the library/headers are absent
    try:
        subprocess.run(
            ["g++", "-O3", "-std=c++17", "-DUSE_LIBDEFLATE", "-shared",
             "-fPIC", _SRC_PATH, "-o", _LIB_PATH, "-ldeflate", "-lz"],
            check=True, capture_output=True)
        return
    except subprocess.CalledProcessError:
        pass
    subprocess.run(
        ["g++", "-O3", "-std=c++17", "-shared", "-fPIC", _SRC_PATH,
         "-o", _LIB_PATH, "-lz"],
        check=True, capture_output=True)


def _load():
    global _lib, _tried
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        try:
            if not os.path.exists(_LIB_PATH) or \
                    os.path.getmtime(_LIB_PATH) < os.path.getmtime(_SRC_PATH):
                build()
            lib = ctypes.CDLL(_LIB_PATH)
        except Exception:  # noqa: BLE001 — no compiler / load failure
            return None
        lib.lps_extract_phase.restype = ctypes.c_void_p
        lib.lps_extract_phase.argtypes = [
            ctypes.c_char_p, ctypes.c_char_p, ctypes.c_int64,
            ctypes.c_int64, ctypes.c_void_p, ctypes.c_char_p, ctypes.c_char_p,
            ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p,
            ctypes.c_char_p, ctypes.c_int64, ctypes.c_int32,
        ]
        lib.lps_result_sizes.restype = ctypes.c_int64
        lib.lps_result_sizes.argtypes = [ctypes.c_void_p] + [ctypes.c_void_p] * 4
        lib.lps_result_fill.restype = ctypes.c_int64
        lib.lps_result_fill.argtypes = [ctypes.c_void_p] + [ctypes.c_void_p] * 9
        lib.lps_result_free.argtypes = [ctypes.c_void_p]
        _lib = lib
        return _lib


def available() -> bool:
    return _load() is not None


def extract_phase(bam_path: str, chrom: str, last_snp_pos: int,
                  positions, infos, ref_string: str, mapping_quality: int):
    """Native get_snp walk. Returns dict of flat numpy arrays or None."""
    lib = _load()
    if lib is None:
        return None
    n = len(positions)
    var_pos = np.asarray(positions, dtype=np.int64)
    ref0 = np.frombuffer(
        "".join((i.ref[0] if i.ref else "N") for i in infos).encode("ascii"),
        dtype=np.uint8) if n else np.zeros(0, np.uint8)
    alt0 = np.frombuffer(
        "".join((i.alt[0] if i.alt else "N") for i in infos).encode("ascii"),
        dtype=np.uint8) if n else np.zeros(0, np.uint8)
    ref_len = np.fromiter((len(i.ref) for i in infos), np.int32, n)
    alt_len = np.fromiter((len(i.alt) for i in infos), np.int32, n)
    danger = np.fromiter((1 if i.is_danger else 0 for i in infos), np.uint8, n)
    ref_bytes = ref_string.encode("ascii")

    handle = lib.lps_extract_phase(
        bam_path.encode(), chrom.encode(), last_snp_pos,
        n, var_pos.ctypes.data, ref0.tobytes(), alt0.tobytes(),
        ref_len.ctypes.data, alt_len.ctypes.data, danger.ctypes.data,
        ref_bytes, len(ref_bytes), mapping_quality)
    if not handle:
        return None
    try:
        n_obs = ctypes.c_int64()
        n_aln = ctypes.c_int64()
        names_len = ctypes.c_int64()
        n_clip = ctypes.c_int64()
        lib.lps_result_sizes(handle, ctypes.byref(n_obs), ctypes.byref(n_aln),
                             ctypes.byref(names_len), ctypes.byref(n_clip))
        obs_pos = np.empty(n_obs.value, np.int64)
        obs_allele = np.empty(n_obs.value, np.int8)
        obs_qual = np.empty(n_obs.value, np.int16)
        aln_offsets = np.empty(n_aln.value + 1, np.int64)
        aln_start = np.empty(n_aln.value, np.int32)
        name_offsets = np.empty(n_aln.value + 1, np.int64)
        names = ctypes.create_string_buffer(max(names_len.value, 1))
        clip_pos = np.empty(n_clip.value, np.int64)
        clip_side = np.empty(n_clip.value, np.int8)
        lib.lps_result_fill(
            handle, obs_pos.ctypes.data, obs_allele.ctypes.data,
            obs_qual.ctypes.data, aln_offsets.ctypes.data,
            aln_start.ctypes.data, name_offsets.ctypes.data, names,
            clip_pos.ctypes.data, clip_side.ctypes.data)
        return {
            "obs_pos": obs_pos, "obs_allele": obs_allele, "obs_qual": obs_qual,
            "aln_offsets": aln_offsets, "aln_start": aln_start,
            "name_offsets": name_offsets,
            "names": names.raw[:names_len.value].decode("ascii"),
            "clip_pos": clip_pos, "clip_side": clip_side,
        }
    finally:
        lib.lps_result_free(handle)


def _bgzf_bind(lib):
    import ctypes as ct
    if getattr(lib, "_bgzf_bound", False):
        return
    lib._bgzf_bound = True
    lib.lps_bgzf_compress.restype = ct.c_int64
    lib.lps_bgzf_compress.argtypes = [ct.c_char_p, ct.c_int64, ct.c_int32,
                                      ct.POINTER(ct.c_void_p)]
    lib.lps_bgzf_inflate_file.restype = ct.c_int64
    lib.lps_bgzf_inflate_file.argtypes = [ct.c_char_p,
                                          ct.POINTER(ct.c_void_p)]
    lib.lps_buf_free.argtypes = [ct.c_void_p]
    lib.lps_inflate_raw.restype = ct.c_int64
    lib.lps_inflate_raw.argtypes = [ct.c_char_p, ct.c_int64, ct.c_void_p,
                                    ct.c_int64]
    lib.lps_gzip.restype = ct.c_int64
    lib.lps_gzip.argtypes = [ct.c_char_p, ct.c_int64, ct.c_int32,
                             ct.POINTER(ct.c_void_p)]


def bgzf_compress(data: bytes, level: int = 6) -> bytes:
    """Parallel BGZF compression of a payload into standard member blocks
    (no EOF block appended)."""
    lib = _load()
    if lib is None:
        raise RuntimeError("native library unavailable")
    _bgzf_bind(lib)
    out_p = ctypes.c_void_p()
    n = lib.lps_bgzf_compress(data, len(data), level, ctypes.byref(out_p))
    try:
        return ctypes.string_at(out_p, n)
    finally:
        lib.lps_buf_free(out_p)


def bgzf_inflate_file(path: str) -> bytes | None:
    """Inflate an entire BGZF file with the parallel block decoder."""
    lib = _load()
    if lib is None:
        return None
    _bgzf_bind(lib)
    out_p = ctypes.c_void_p()
    n = lib.lps_bgzf_inflate_file(path.encode(), ctypes.byref(out_p))
    if n < 0:
        return None
    try:
        return ctypes.string_at(out_p, n)
    finally:
        lib.lps_buf_free(out_p)


_inflate_tls = threading.local()


def inflate_raw(src: bytes, out_size: int) -> bytes | None:
    """Raw-deflate decode of one BGZF block payload (libdeflate when built).
    Reuses a thread-local output buffer — create_string_buffer per call costs
    more than the decode itself at BGZF block sizes."""
    lib = _load()
    if lib is None:
        return None
    _bgzf_bind(lib)
    buf = getattr(_inflate_tls, "buf", None)
    if buf is None or len(buf) < out_size:
        buf = ctypes.create_string_buffer(max(out_size, 1 << 16))
        _inflate_tls.buf = buf
    n = lib.lps_inflate_raw(src, len(src), buf, len(buf))
    if n < 0 or n != out_size:
        return None
    return ctypes.string_at(buf, n)


def gzip_oneshot(data: bytes, level: int = 6) -> bytes | None:
    """Whole-buffer gzip member via libdeflate (CRAM block compression)."""
    lib = _load()
    if lib is None:
        return None
    _bgzf_bind(lib)
    out_p = ctypes.c_void_p()
    n = lib.lps_gzip(data, len(data), level, ctypes.byref(out_p))
    if n < 0:
        return None
    try:
        return ctypes.string_at(out_p, n)
    finally:
        lib.lps_buf_free(out_p)
