"""ctypes bridge to the native assembly hot loops (native/kma_assem.cpp).

Exact ports of pileup.py's alnToMat/callConsensus/getExtendedFeatures
loops (reference assembly.c:1317-1631, ef.c:48-127); pileup.py stays the
semantics reference and the fallback (KMA_TPU_NO_NATIVE=1)."""

from __future__ import annotations

import ctypes
import os
import subprocess
import sys

_HERE = os.path.dirname(os.path.abspath(__file__))
_NATIVE_DIR = os.path.join(os.path.dirname(os.path.dirname(_HERE)),
                           "native")
_SRC = os.path.join(_NATIVE_DIR, "kma_assem.cpp")
_SO = os.path.join(_NATIVE_DIR, "libkma_assem.so")

_lib = None
_tried = False

_u8p = ctypes.POINTER(ctypes.c_uint8)
_i64p = ctypes.POINTER(ctypes.c_longlong)

BASE_CALLERS = {"default": 0, "org": 1, "ref": 2, "nano": 3}
SIGNIFICANTS = {"mcnemar": 0, "and90": 1, "support": 2}


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
    print(f"# native assembly build failed: {err}", file=sys.stderr)
    return False


def get_lib():
    """Load (building if needed); None if unavailable or disabled."""
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
        print(f"# native assembler load failed: {e}", file=sys.stderr)
        return None
    lib.kassem_aln_to_mat.restype = ctypes.c_longlong
    lib.kassem_aln_to_mat.argtypes = [
        _i64p, _i64p, ctypes.c_longlong, ctypes.c_int,
        _u8p, _u8p, ctypes.c_longlong, ctypes.c_int]
    lib.kassem_aln_to_mat_dense.argtypes = [
        _i64p, _i64p, _u8p, _u8p, ctypes.c_longlong, ctypes.c_int]
    lib.kassem_consensus.argtypes = [
        _i64p, _i64p, _u8p, ctypes.c_int, ctypes.c_longlong,
        ctypes.c_int, ctypes.c_double, ctypes.c_double,
        ctypes.c_int, ctypes.c_int, _u8p, _u8p, _u8p, _i64p]
    lib.kassem_ef.argtypes = [
        _i64p, _i64p, _u8p, ctypes.c_int, ctypes.c_longlong,
        ctypes.c_double, _i64p]
    lib.kassem_walk.argtypes = [_i64p, ctypes.c_longlong, _i64p]
    _lib = lib
    return _lib
