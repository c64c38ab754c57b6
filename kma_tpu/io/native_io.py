"""ctypes bridge to the native step-1 fastq reader (native/kma_io.cpp).

The C++ reader is an exact port of parse_fastq + phred_stat (seq.py;
reference runinput.c:127-313, seqparse.c:66-159) operating on whole
stream chunks; it is the default fast path of iter_reads when no -qc
statistics are requested.  Python remains the semantics reference and
the fallback (KMA_TPU_NO_NATIVE=1, or no compiler)."""

from __future__ import annotations

import ctypes
import os
import subprocess
import sys
from typing import Iterator, Tuple

import numpy as np

from .seq import PROB, TO2BIT, open_maybe_gz

_HERE = os.path.dirname(os.path.abspath(__file__))
_NATIVE_DIR = os.path.join(os.path.dirname(os.path.dirname(_HERE)),
                           "native")
_SRC = os.path.join(_NATIVE_DIR, "kma_io.cpp")
_SO = os.path.join(_NATIVE_DIR, "libkma_io.so")

_lib = None
_tried = False

_u8p = ctypes.POINTER(ctypes.c_uint8)
_f64p = ctypes.POINTER(ctypes.c_double)
_i64p = ctypes.POINTER(ctypes.c_longlong)


def _build() -> bool:
    if not os.path.exists(_SRC):
        return False
    for extra in (["-march=native"], []):
        try:
            subprocess.run(
                ["g++", "-O2", "-fPIC", "-shared"] + extra
                + ["-o", _SO + ".tmp"] + [_SRC],
                check=True, capture_output=True)
            os.replace(_SO + ".tmp", _SO)
            return True
        except Exception as e:
            err = e
    print(f"# native reader build failed: {err}", file=sys.stderr)
    return False


def get_lib():
    """Load (building if needed) the native reader; None if unavailable.

    Set KMA_TPU_NO_NATIVE=1 to force the Python fallback."""
    global _lib, _tried
    if _tried:
        return _lib
    _tried = True
    if os.environ.get("KMA_TPU_NO_NATIVE"):
        return None
    if (not os.path.exists(_SO)
            or (os.path.exists(_SRC)
                and os.path.getmtime(_SRC) > os.path.getmtime(_SO))):
        if not _build():
            return None
    try:
        lib = ctypes.CDLL(_SO)
    except OSError as e:  # pragma: no cover
        print(f"# native reader load failed: {e}", file=sys.stderr)
        return None
    lib.kio_parse_fastq.restype = ctypes.c_longlong
    lib.kio_parse_fastq.argtypes = [
        _u8p, ctypes.c_longlong, ctypes.c_int,           # buf, len, last
        _u8p, _f64p, ctypes.c_int,                       # to2bit, prob, scale
        ctypes.c_int, ctypes.c_int, ctypes.c_int,        # mp, mq, hmq
        ctypes.c_longlong, ctypes.c_longlong,            # min/max len
        _u8p, ctypes.c_longlong, _i64p,                  # codes, cap, off
        _u8p, ctypes.c_longlong, _i64p,                  # hdrs, cap, off
        ctypes.c_int,                                    # cap_reads
        ctypes.POINTER(ctypes.c_int),                    # n_out
        ctypes.POINTER(ctypes.c_int),                    # status
        ctypes.c_int, _u8p,                              # emit_all, passed
    ]
    lib.kio_dedup_values.restype = ctypes.c_longlong
    lib.kio_dedup_values.argtypes = [
        ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p,
        ctypes.c_longlong, ctypes.c_void_p, ctypes.c_void_p]
    _lib = lib
    return _lib


_CHUNK = 8 << 20
_CAP_READS = 1 << 17

_TO2BIT_C = np.ascontiguousarray(TO2BIT)
_PROB_C = np.ascontiguousarray(PROB)


def iter_fastq_native_batches(path: str, scale: int, min_phred: int,
                              min_q: int, hardmask_q: int, min_len: int,
                              max_len: int):
    """Yield whole parsed batches as flat arrays (codes, coff[n+1],
    hdr, hoff[n+1]) — the zero-copy feed for the fused native run driver
    (run_native.RunDriver.map_batch).  Offsets are int64; the arrays are
    freshly allocated per batch and safe to keep."""
    lib = get_lib()
    assert lib is not None
    coff = np.zeros(_CAP_READS + 1, dtype=np.int64)
    hoff = np.zeros(_CAP_READS + 1, dtype=np.int64)
    n_out = ctypes.c_int(0)
    status = ctypes.c_int(0)
    with open_maybe_gz(path) as f:
        carry = b""
        while True:
            chunk = f.read(_CHUNK)
            data = carry + chunk if carry else chunk
            last = 0 if chunk else 1
            if not data:
                break
            while data:
                buf = np.frombuffer(data, dtype=np.uint8)
                cap = len(data)
                codes_out = np.empty(cap, dtype=np.uint8)
                hdr_out = np.empty(cap, dtype=np.uint8)
                consumed = lib.kio_parse_fastq(
                    buf.ctypes.data_as(_u8p), cap, last,
                    _TO2BIT_C.ctypes.data_as(_u8p),
                    _PROB_C.ctypes.data_as(_f64p),
                    scale, min_phred, min_q, hardmask_q, min_len, max_len,
                    codes_out.ctypes.data_as(_u8p), cap,
                    coff.ctypes.data_as(_i64p),
                    hdr_out.ctypes.data_as(_u8p), cap,
                    hoff.ctypes.data_as(_i64p),
                    _CAP_READS, ctypes.byref(n_out), ctypes.byref(status),
                    0, None)
                n = n_out.value
                if n:
                    yield (codes_out, coff[:n + 1].copy(), hdr_out,
                           hoff[:n + 1].copy())
                if status.value:
                    raise ValueError("Malformed fastq input")
                if consumed == 0:
                    break  # incomplete record: need more input
                data = data[consumed:]
            carry = bytes(data)
            if not chunk:
                break


def iter_fastq_native(path: str, scale: int, min_phred: int, min_q: int,
                      hardmask_q: int, min_len: int,
                      max_len: int) -> Iterator[Tuple[np.ndarray, bytes]]:
    """Yield (codes, header-with-NUL) per surviving read, identical to the
    parse_fastq + phred_stat path of iter_reads (qc-less)."""
    lib = get_lib()
    assert lib is not None
    coff = np.zeros(_CAP_READS + 1, dtype=np.int64)
    hoff = np.zeros(_CAP_READS + 1, dtype=np.int64)
    n_out = ctypes.c_int(0)
    status = ctypes.c_int(0)
    with open_maybe_gz(path) as f:
        carry = b""
        while True:
            chunk = f.read(_CHUNK)
            data = carry + chunk if carry else chunk
            last = 0 if chunk else 1
            if not data:
                break
            while data:
                buf = np.frombuffer(data, dtype=np.uint8)
                cap = len(data)
                codes_out = np.empty(cap, dtype=np.uint8)
                hdr_out = np.empty(cap, dtype=np.uint8)
                consumed = lib.kio_parse_fastq(
                    buf.ctypes.data_as(_u8p), cap, last,
                    _TO2BIT_C.ctypes.data_as(_u8p),
                    _PROB_C.ctypes.data_as(_f64p),
                    scale, min_phred, min_q, hardmask_q, min_len, max_len,
                    codes_out.ctypes.data_as(_u8p), cap,
                    coff.ctypes.data_as(_i64p),
                    hdr_out.ctypes.data_as(_u8p), cap,
                    hoff.ctypes.data_as(_i64p),
                    _CAP_READS, ctypes.byref(n_out), ctypes.byref(status),
                    0, None)
                n = n_out.value
                hdr_bytes = hdr_out[:hoff[n]].tobytes()
                # batch N-position extraction; per-read slices are VIEWS
                # into this call's buffer (never reused afterwards)
                ns_all = np.flatnonzero(
                    codes_out[:coff[n]] == 4).astype(np.int64)
                nsplit = np.searchsorted(ns_all, coff[:n + 1])
                co, ho = coff.tolist(), hoff.tolist()
                nsp = nsplit.tolist()
                for i in range(n):
                    npos = (ns_all[nsp[i]:nsp[i + 1]]
                            - co[i]).astype(np.int32)
                    yield (codes_out[co[i]:co[i + 1]],
                           hdr_bytes[ho[i]:ho[i + 1]], npos)
                if status.value:
                    raise ValueError("Malformed fastq input")
                if consumed == 0:
                    break  # incomplete record: need more input
                data = data[consumed:]
            carry = bytes(data)
            if not chunk:
                break


def iter_fastq_native_pe_batches(path: str, scale: int, min_phred: int,
                                 min_q: int, hardmask_q: int, min_len: int,
                                 max_len: int):
    """Emit-all batches for the PE fused feed: yields (codes, coff[n+1],
    hdr, hoff[n+1], passed[n]) with EVERY record present (failed reads
    flagged 0) so two mate streams stay in lockstep."""
    lib = get_lib()
    assert lib is not None
    coff = np.zeros(_CAP_READS + 1, dtype=np.int64)
    hoff = np.zeros(_CAP_READS + 1, dtype=np.int64)
    passed = np.zeros(_CAP_READS, dtype=np.uint8)
    n_out = ctypes.c_int(0)
    status = ctypes.c_int(0)
    with open_maybe_gz(path) as f:
        carry = b""
        while True:
            chunk = f.read(_CHUNK)
            data = carry + chunk if carry else chunk
            last = 0 if chunk else 1
            if not data:
                break
            while data:
                buf = np.frombuffer(data, dtype=np.uint8)
                cap = len(data)
                codes_out = np.empty(cap, dtype=np.uint8)
                hdr_out = np.empty(cap, dtype=np.uint8)
                consumed = lib.kio_parse_fastq(
                    buf.ctypes.data_as(_u8p), cap, last,
                    _TO2BIT_C.ctypes.data_as(_u8p),
                    _PROB_C.ctypes.data_as(_f64p),
                    scale, min_phred, min_q, hardmask_q, min_len, max_len,
                    codes_out.ctypes.data_as(_u8p), cap,
                    coff.ctypes.data_as(_i64p),
                    hdr_out.ctypes.data_as(_u8p), cap,
                    hoff.ctypes.data_as(_i64p),
                    _CAP_READS, ctypes.byref(n_out), ctypes.byref(status),
                    1, passed.ctypes.data_as(_u8p))
                n = n_out.value
                if n:
                    yield (codes_out, coff[:n + 1].copy(), hdr_out,
                           hoff[:n + 1].copy(), passed[:n].copy())
                if status.value:
                    raise ValueError("Malformed fastq input")
                if consumed == 0:
                    break
                data = data[consumed:]
            carry = bytes(data)
            if not chunk:
                break


def iter_fastq_native_pe(path: str, scale: int, min_phred: int, min_q: int,
                         hardmask_q: int, min_len: int, max_len: int):
    """Like iter_fastq_native but yields EVERY record (codes-or-None,
    header-with-NUL): failed mates appear as None so PE streams stay in
    lockstep (run_input_PE, runinput.c:463-606)."""
    lib = get_lib()
    assert lib is not None
    coff = np.zeros(_CAP_READS + 1, dtype=np.int64)
    hoff = np.zeros(_CAP_READS + 1, dtype=np.int64)
    passed = np.zeros(_CAP_READS, dtype=np.uint8)
    n_out = ctypes.c_int(0)
    status = ctypes.c_int(0)
    with open_maybe_gz(path) as f:
        carry = b""
        while True:
            chunk = f.read(_CHUNK)
            data = carry + chunk if carry else chunk
            last = 0 if chunk else 1
            if not data:
                break
            while data:
                buf = np.frombuffer(data, dtype=np.uint8)
                cap = len(data)
                codes_out = np.empty(cap, dtype=np.uint8)
                hdr_out = np.empty(cap, dtype=np.uint8)
                consumed = lib.kio_parse_fastq(
                    buf.ctypes.data_as(_u8p), cap, last,
                    _TO2BIT_C.ctypes.data_as(_u8p),
                    _PROB_C.ctypes.data_as(_f64p),
                    scale, min_phred, min_q, hardmask_q, min_len, max_len,
                    codes_out.ctypes.data_as(_u8p), cap,
                    coff.ctypes.data_as(_i64p),
                    hdr_out.ctypes.data_as(_u8p), cap,
                    hoff.ctypes.data_as(_i64p),
                    _CAP_READS, ctypes.byref(n_out), ctypes.byref(status),
                    1, passed.ctypes.data_as(_u8p))
                n = n_out.value
                hdr_bytes = hdr_out[:hoff[n]].tobytes()
                co, ho = coff.tolist(), hoff.tolist()
                ok = passed[:n].tolist()
                for i in range(n):
                    h = hdr_bytes[ho[i]:ho[i + 1]]
                    if ok[i]:
                        yield codes_out[co[i]:co[i + 1]], h
                    else:
                        yield None, h
                if status.value:
                    raise ValueError("Malformed fastq input")
                if consumed == 0:
                    break
                data = data[consumed:]
            carry = bytes(data)
            if not chunk:
                break
