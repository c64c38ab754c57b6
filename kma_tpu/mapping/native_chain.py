"""ctypes bridge to the native default-mode chain scanner
(native/kma_chain.cpp).

The C++ engine is an exact port of mapping/chain_scan.py (the semantics
reference, itself golden-tested against save_kmers_chain,
savekmers.c:5127-5944); it removes the per-window/per-template Python
interpreter overhead from default-mode mapping.  Handles plain-kmer
and cmer (-m/-hc, k <= 16) DBs; proxi and >32-bit cmer folds keep the
Python path."""

from __future__ import annotations

import ctypes
import os
import struct
import subprocess
import sys
from typing import List, Optional

import numpy as np

from ..config import Penalties
from ..index.format import KmaIndex
from ..io.seq import rc_codes
from .scan import AnkerHit

_HERE = os.path.dirname(os.path.abspath(__file__))
_NATIVE_DIR = os.path.join(os.path.dirname(os.path.dirname(_HERE)),
                           "native")
_SRC = os.path.join(_NATIVE_DIR, "kma_chain.cpp")
_SO = os.path.join(_NATIVE_DIR, "libkma_chain.so")

_lib = None
_tried = False

_u8p = ctypes.POINTER(ctypes.c_uint8)
_i32p = ctypes.POINTER(ctypes.c_int32)
_i64p = ctypes.POINTER(ctypes.c_longlong)
_vp = ctypes.c_void_p


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
    print(f"# native chain build failed: {err}", file=sys.stderr)
    return False


def get_lib():
    """Load (building if needed) the native chainer; None if unavailable.

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
        print(f"# native chain load failed: {e}", file=sys.stderr)
        return None
    lib.kchain_create.restype = _vp
    lib.kchain_create.argtypes = [
        _vp, ctypes.c_int, _vp, ctypes.c_int, _vp, ctypes.c_int,
        _vp, ctypes.c_int,
        ctypes.c_ulonglong, ctypes.c_ulonglong, ctypes.c_ulonglong,
        ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int,
        ctypes.c_int,
        _i64p,
        ctypes.c_longlong, ctypes.c_longlong, ctypes.c_longlong,
        ctypes.c_longlong, ctypes.c_longlong,
    ]
    lib.kchain_free.argtypes = [_vp]
    lib.kchain_scan_read.restype = ctypes.c_int
    lib.kchain_scan_read.argtypes = [
        _vp, _u8p, ctypes.c_int,
        ctypes.c_int, ctypes.c_longlong, ctypes.c_double, ctypes.c_double,
        ctypes.c_double, ctypes.c_int,
        _i64p, _i64p, _u8p,
        _u8p, _i64p, _i32p, _i32p, _i64p, _i32p,
        ctypes.c_int, ctypes.c_longlong,
    ]
    lib.kchain_scan_batch.restype = ctypes.c_int
    lib.kchain_scan_batch.argtypes = [
        _vp, _u8p, _i64p, ctypes.c_int,
        ctypes.c_int, ctypes.c_longlong, ctypes.c_double, ctypes.c_double,
        ctypes.c_double, ctypes.c_int,
        _i64p, _i64p, _u8p,
        _i32p, _u8p, _i64p, _i32p, _i32p, _i64p, _i32p,
        ctypes.c_int, ctypes.c_longlong,
    ]
    lib.kchain_pair_mate.restype = ctypes.c_int
    lib.kchain_pair_mate.argtypes = [
        _vp, _u8p, ctypes.c_int, ctypes.c_int,
        _i64p, _i64p, _i64p, _u8p,
        _i32p, ctypes.POINTER(ctypes.c_int),
        _i32p, ctypes.POINTER(ctypes.c_int),
    ]
    lib.kchain_save_kmers.restype = None
    lib.kchain_save_kmers.argtypes = [
        _vp, _u8p, ctypes.c_int, ctypes.c_int,
        ctypes.c_double, ctypes.c_int,
        _i64p, _i64p, _i64p, _u8p, _i64p,
        _i32p, ctypes.POINTER(ctypes.c_int),
        _i32p, ctypes.POINTER(ctypes.c_int),
        _i64p,
    ]
    lib.kchain_lookup_windows.restype = None
    lib.kchain_lookup_windows.argtypes = [_vp, _vp, ctypes.c_int, _vp]
    lib.kchain_dec_voffs.restype = None
    lib.kchain_dec_voffs.argtypes = [_vp, _vp, ctypes.c_longlong, _vp]
    lib.kchain_score_reps.restype = ctypes.c_int
    lib.kchain_score_reps.argtypes = [
        _vp, ctypes.c_longlong, ctypes.c_longlong, _vp, _vp,
        ctypes.c_int]
    lib.kchain_save_kmers_count.restype = None
    lib.kchain_save_kmers_count.argtypes = [
        _vp, _u8p, ctypes.c_int, _i64p, ctypes.c_int, ctypes.c_int,
        ctypes.c_double, ctypes.c_int,
        _i64p, _i64p, _i64p,
        _i32p, ctypes.POINTER(ctypes.c_int),
        _i32p, ctypes.POINTER(ctypes.c_int), _i64p]
    lib.kchain_translate_read.restype = ctypes.c_longlong
    lib.kchain_translate_read.argtypes = [
        _u8p, ctypes.c_int, ctypes.c_int, ctypes.c_int,
        ctypes.c_ulonglong, ctypes.POINTER(ctypes.c_uint64)]
    lib.kchain_score_window_runs.restype = ctypes.c_int
    lib.kchain_score_window_runs.argtypes = [
        _vp, _vp, ctypes.c_longlong, _vp, _vp, ctypes.c_int]
    lib.kchain_cut_limits.restype = None
    lib.kchain_cut_limits.argtypes = [
        _vp, _vp, _vp, ctypes.c_longlong, ctypes.c_longlong,
        _vp, ctypes.c_int, _vp]
    lib.kchain_hmm_extend.restype = ctypes.c_longlong
    lib.kchain_hmm_extend.argtypes = [
        _vp, _vp, _vp, ctypes.c_longlong, ctypes.c_longlong,
        ctypes.c_longlong, _vp, _vp, _vp, ctypes.c_longlong,
        ctypes.c_int, ctypes.c_double, ctypes.c_longlong, _vp,
        ctypes.c_longlong, _vp, _vp]
    lib.kchain_hmm_region.restype = ctypes.c_int
    lib.kchain_hmm_region.argtypes = [
        _vp, _vp, _vp, _vp, _vp,
        ctypes.c_int, ctypes.c_int, ctypes.c_int,
        _vp, _vp, _vp, ctypes.c_longlong, _vp]
    lib.kchain_lookup_kmer.restype = ctypes.c_longlong
    lib.kchain_lookup_kmer.argtypes = [_vp, ctypes.c_ulonglong]
    lib.kchain_scan_batch_dev.restype = ctypes.c_int
    lib.kchain_scan_batch_dev.argtypes = [
        _vp, _u8p, _i64p, ctypes.c_int,
        _i64p, _i64p, ctypes.c_longlong,
        ctypes.c_int, ctypes.c_longlong, ctypes.c_double, ctypes.c_double,
        ctypes.c_double, ctypes.c_int,
        _i64p, _i64p, _u8p,
        _i32p, _u8p, _i64p, _i32p, _i32p, _i64p, _i32p,
        ctypes.c_int, ctypes.c_longlong,
    ]
    _lib = lib
    return _lib


def _es(a: np.ndarray) -> int:
    return a.dtype.itemsize


class NativeChain:
    """One DB's native chain engine; holds references to the index arrays
    so ctypes pointers stay valid."""

    def __init__(self, lib, idx: KmaIndex, pen: Penalties,
                 template_lengths: np.ndarray):
        self._lib = lib
        self._idx = idx
        self._pen = pen
        self._clones: list = []
        self._wss: list = []
        self._pair_b = None
        self._pair_br = None
        # contiguous views (mmap/shm-backed arrays already are)
        self._exist = np.ascontiguousarray(idx.exist)
        self._values = np.ascontiguousarray(idx.values)
        if idx.mega:
            self._keyi = np.zeros(1, np.uint32)
            self._vali = np.zeros(1, np.uint32)
        else:
            self._keyi = np.ascontiguousarray(idx.key_index)
            self._vali = np.ascontiguousarray(idx.value_index)
        self._tl = np.ascontiguousarray(template_lengths, np.int64)
        self._h = lib.kchain_create(
            self._exist.ctypes.data_as(_vp), _es(self._exist),
            self._keyi.ctypes.data_as(_vp), _es(self._keyi),
            self._vali.ctypes.data_as(_vp), _es(self._vali),
            self._values.ctypes.data_as(_vp), _es(self._values),
            int(idx.null_index), int(idx.size - 1), int(idx.mask),
            1 if idx.mega else 0, 1 if idx.flag else 0,
            int(idx.flag & 3), int(idx.kmersize), int(idx.mlen),
            self._tl.ctypes.data_as(_i64p),
            pen.M, pen.MM, pen.U, pen.W1, pen.Wl)
        self._cap_hits = 64
        self._cap_tpl = 1 << 16
        self._alloc()

    def _alloc(self):
        self._hit_rc = np.zeros(self._cap_hits, np.uint8)
        self._hit_sc = np.zeros(self._cap_hits, np.int64)
        self._hit_b0 = np.zeros(self._cap_hits, np.int32)
        self._hit_b1 = np.zeros(self._cap_hits, np.int32)
        self._tpl_off = np.zeros(self._cap_hits + 1, np.int64)
        self._tpl = np.zeros(self._cap_tpl, np.int32)

    def __del__(self):  # pragma: no cover - interpreter teardown
        try:
            if self._h:
                self._lib.kchain_free(self._h)
                self._h = None
        except Exception:
            pass

    def scan(self, codes: np.ndarray, header: bytes, exhaustive: bool,
             Score: np.ndarray, extendScore: np.ndarray,
             include: np.ndarray, minlen: int, coverT: float, mrs: float,
             mrc: float, lc: bool) -> List[AnkerHit]:
        codes = np.ascontiguousarray(codes, np.uint8)
        while True:
            n = self._lib.kchain_scan_read(
                self._h, codes.ctypes.data_as(_u8p), len(codes),
                1 if exhaustive else 0, minlen, coverT, mrs, mrc,
                1 if lc else 0,
                Score.ctypes.data_as(_i64p),
                extendScore.ctypes.data_as(_i64p),
                include.ctypes.data_as(_u8p),
                self._hit_rc.ctypes.data_as(_u8p),
                self._hit_sc.ctypes.data_as(_i64p),
                self._hit_b0.ctypes.data_as(_i32p),
                self._hit_b1.ctypes.data_as(_i32p),
                self._tpl_off.ctypes.data_as(_i64p),
                self._tpl.ctypes.data_as(_i32p),
                self._cap_hits, self._cap_tpl)
            if n >= 0:
                break
            # caps exceeded: Score/extendScore/include are already back
            # to zero at every -1 return point, so the read can simply be
            # re-run from scratch with bigger buffers
            self._cap_hits *= 4
            self._cap_tpl *= 4
            self._alloc()
        if n == 0:
            return []
        out: List[AnkerHit] = []
        codes_r = None
        npos_f = npos_r = None
        seqlen = len(codes)
        for i in range(n):
            rc = int(self._hit_rc[i])
            bh = header + b"\x00" + struct.pack(
                "<ii", int(self._hit_b0[i]), int(self._hit_b1[i]))
            tpl = self._tpl[self._tpl_off[i]:self._tpl_off[i + 1]].copy()
            if rc == 1:
                if npos_f is None:
                    npos_f = np.flatnonzero(codes == 4).astype(np.int32)
                out.append(AnkerHit(codes=codes, n_positions=npos_f,
                                    rc_flag=int(self._hit_sc[i]),
                                    templates=tpl, header=bh, flag=0))
            else:
                if codes_r is None:
                    codes_r = rc_codes(codes)
                    npos_r = np.flatnonzero(codes_r == 4).astype(np.int32)
                out.append(AnkerHit(codes=codes_r, n_positions=npos_r,
                                    rc_flag=int(self._hit_sc[i]),
                                    templates=tpl, header=bh, flag=0))
        return out


    def _emit(self, codes, header, h0, h1):
        """AnkerHits for hits [h0, h1) of one read from the shared
        buffers (same construction as scan())."""
        out: List[AnkerHit] = []
        codes_r = None
        npos_f = npos_r = None
        for i in range(h0, h1):
            rc = int(self._hit_rc[i])
            bh = header + b"\x00" + struct.pack(
                "<ii", int(self._hit_b0[i]), int(self._hit_b1[i]))
            tpl = self._tpl[self._tpl_off[i]:self._tpl_off[i + 1]].copy()
            if rc == 1:
                if npos_f is None:
                    npos_f = np.flatnonzero(codes == 4).astype(np.int32)
                out.append(AnkerHit(codes=codes, n_positions=npos_f,
                                    rc_flag=int(self._hit_sc[i]),
                                    templates=tpl, header=bh, flag=0))
            else:
                if codes_r is None:
                    codes_r = rc_codes(codes)
                    npos_r = np.flatnonzero(codes_r == 4).astype(np.int32)
                out.append(AnkerHit(codes=codes_r, n_positions=npos_r,
                                    rc_flag=int(self._hit_sc[i]),
                                    templates=tpl, header=bh, flag=0))
        return out

    def scan_batch_mt(self, codes_list, headers, exhaustive: bool,
                      minlen: int, coverT: float, mrs: float, mrc: float,
                      lc: bool, threads: int):
        """Threaded scan_batch: per-read results are independent, so the
        batch splits into contiguous slices, each scanned by a clone
        engine with its own workspaces (the ctypes call releases the
        GIL; savekmers.c's kmerScan worker-pool analog).  Output order
        and content are identical to the single-thread path."""
        B = len(codes_list)
        threads = max(1, min(threads, (B + 63) // 64))
        if threads == 1 or B < 2:
            return self.scan_batch(codes_list, headers, exhaustive,
                                   self._ws(0)[0], self._ws(0)[1],
                                   self._ws(0)[2], minlen, coverT, mrs,
                                   mrc, lc)
        import concurrent.futures as cf
        bounds = [B * t // threads for t in range(threads + 1)]
        while len(self._clones) < threads - 1:
            self._clones.append(NativeChain(self._lib, self._idx,
                                            self._pen, self._tl))
        engines = [self] + self._clones[:threads - 1]

        def run(t):
            S, E, I = engines[t]._ws(t)
            return engines[t].scan_batch(
                codes_list[bounds[t]:bounds[t + 1]],
                headers[bounds[t]:bounds[t + 1]], exhaustive, S, E, I,
                minlen, coverT, mrs, mrc, lc)

        with cf.ThreadPoolExecutor(threads) as ex:
            parts = list(ex.map(run, range(threads)))
        out = []
        for p in parts:
            out.extend(p)
        return out

    def scan_batch_dev(self, codes_list, headers, voff_f: np.ndarray,
                       voff_r: np.ndarray, exhaustive: bool, minlen: int,
                       coverT: float, mrs: float, mrc: float, lc: bool):
        """scan_batch fed by device-computed per-window values offsets
        (chain_device.py): voff_f/voff_r are [B, stride] int64 rows, row
        r valid over [0, len_r - k + 1)."""
        B = len(codes_list)
        if not B:
            return []
        voff_f = np.ascontiguousarray(voff_f, np.int64)
        voff_r = np.ascontiguousarray(voff_r, np.int64)
        stride = voff_f.shape[1]
        coff = np.zeros(B + 1, np.int64)
        for i, c in enumerate(codes_list):
            coff[i + 1] = coff[i] + len(c)
        flat = np.ascontiguousarray(
            np.concatenate([np.asarray(c, np.uint8) for c in codes_list]))
        nhits = np.zeros(B, np.int32)
        results = [None] * B
        Score, extendScore, include = self._ws(0)
        r0 = 0
        while r0 < B:
            n_req = B - r0
            if self._cap_hits < 4 * n_req + 64:
                self._cap_hits = 4 * n_req + 64
                self._alloc()
            coff_v = np.ascontiguousarray(coff[r0:])
            consumed = self._lib.kchain_scan_batch_dev(
                self._h, flat.ctypes.data_as(_u8p),
                coff_v.ctypes.data_as(_i64p), n_req,
                voff_f[r0:].ctypes.data_as(_i64p),
                voff_r[r0:].ctypes.data_as(_i64p), stride,
                1 if exhaustive else 0, minlen, coverT, mrs, mrc,
                1 if lc else 0,
                Score.ctypes.data_as(_i64p),
                extendScore.ctypes.data_as(_i64p),
                include.ctypes.data_as(_u8p),
                nhits.ctypes.data_as(_i32p),
                self._hit_rc.ctypes.data_as(_u8p),
                self._hit_sc.ctypes.data_as(_i64p),
                self._hit_b0.ctypes.data_as(_i32p),
                self._hit_b1.ctypes.data_as(_i32p),
                self._tpl_off.ctypes.data_as(_i64p),
                self._tpl.ctypes.data_as(_i32p),
                self._cap_hits, self._cap_tpl)
            h = 0
            for i in range(consumed):
                n = int(nhits[i])
                results[r0 + i] = self._emit(codes_list[r0 + i],
                                             headers[r0 + i], h, h + n)
                h += n
            if consumed < n_req:
                self._cap_hits *= 4
                self._cap_tpl *= 4
                self._alloc()
            r0 += consumed
        return results

    def pair_mate(self, codes: np.ndarray, exhaustive: bool,
                  Score: np.ndarray, Score_r: np.ndarray,
                  extendScore: np.ndarray, include: np.ndarray):
        """get_kmers_for_pair (savekmers.c:427-688) via the native
        engine; Score/Score_r are left FILLED for the pair combiners."""
        if self._pair_b is None:
            n = len(self._tl) + 2
            self._pair_b = np.zeros(n, np.int32)
            self._pair_br = np.zeros(n, np.int32)
        codes = np.ascontiguousarray(codes, np.uint8)
        nb = ctypes.c_int(0)
        nbr = ctypes.c_int(0)
        cnt = self._lib.kchain_pair_mate(
            self._h, codes.ctypes.data_as(_u8p), len(codes),
            1 if exhaustive else 0,
            Score.ctypes.data_as(_i64p), Score_r.ctypes.data_as(_i64p),
            extendScore.ctypes.data_as(_i64p),
            include.ctypes.data_as(_u8p),
            self._pair_b.ctypes.data_as(_i32p), ctypes.byref(nb),
            self._pair_br.ctypes.data_as(_i32p), ctypes.byref(nbr))
        return (cnt, self._pair_b[:nb.value].tolist(),
                self._pair_br[:nbr.value].tolist())

    def save_kmers(self, codes: np.ndarray, exhaustive: bool,
                   Score: np.ndarray, Score_r: np.ndarray,
                   extendScore: np.ndarray, include: np.ndarray, proxi):
        """save_kmers strand scan + match selection (savekmers.c:
        2442-3065); returns ((bestScore, bests), (bestScore_r, bests_r));
        workspaces return to zero."""
        if self._pair_b is None:
            n = len(self._tl) + 2
            self._pair_b = np.zeros(n, np.int32)
            self._pair_br = np.zeros(n, np.int32)
        codes = np.ascontiguousarray(codes, np.uint8)
        nb = ctypes.c_int(0)
        nbr = ctypes.c_int(0)
        bs = np.zeros(2, np.int64)
        soft = None
        frac = 0.0
        use = 0
        if proxi is not None:
            use = 1
            frac = float(proxi.min_frac)
            if proxi.soft is not None:
                soft = proxi.soft.ctypes.data_as(_i64p)
        self._lib.kchain_save_kmers(
            self._h, codes.ctypes.data_as(_u8p), len(codes),
            1 if exhaustive else 0, frac, use,
            Score.ctypes.data_as(_i64p), Score_r.ctypes.data_as(_i64p),
            extendScore.ctypes.data_as(_i64p),
            include.ctypes.data_as(_u8p), soft,
            self._pair_b.ctypes.data_as(_i32p), ctypes.byref(nb),
            self._pair_br.ctypes.data_as(_i32p), ctypes.byref(nbr),
            bs.ctypes.data_as(_i64p))
        return ((int(bs[0]), self._pair_b[:nb.value].tolist()),
                (int(bs[1]), self._pair_br[:nbr.value].tolist()))

    def lookup_windows(self, fold: np.ndarray) -> np.ndarray:
        """voffs for EVERY window of an already-folded strand (the HMM
        scanner's unmasked lookups, savekmers.c:3975-3981)."""
        W = len(fold) - self._idx.kmersize + 1
        out = np.full(max(W, 0), -1, np.int64)
        if W > 0:
            fold = np.ascontiguousarray(fold, np.uint8)
            self._lib.kchain_lookup_windows(
                self._h, fold.ctypes.data, len(fold), out.ctypes.data)
        return out

    def dec_voffs(self, voffs: np.ndarray, Score: np.ndarray) -> None:
        if len(voffs):
            voffs = np.ascontiguousarray(voffs, np.int64)
            self._lib.kchain_dec_voffs(
                self._h, voffs.ctypes.data, len(voffs),
                Score.ctypes.data)

    def score_reps(self, voff: int, reps: int, Score: np.ndarray,
                   bt: np.ndarray, nb: int) -> int:
        return self._lib.kchain_score_reps(
            self._h, voff, reps, Score.ctypes.data, bt.ctypes.data, nb)

    def score_window_runs(self, win: np.ndarray, Score: np.ndarray,
                          bt: np.ndarray, nb: int) -> int:
        win = np.ascontiguousarray(win, np.int64)
        return self._lib.kchain_score_window_runs(
            self._h, win.ctypes.data, len(win),
            Score.ctypes.data, bt.ctypes.data, nb)

    def hmm_extend(self, VF_a, VR_a, lo, hi, Score, Score_r, include,
                   DB_size, mode, proxi, base_count, reg_buf, reg_len,
                   soft, state):
        softp = soft.ctypes.data if soft is not None else None
        return self._lib.kchain_hmm_extend(
            self._h, VF_a.ctypes.data, VR_a.ctypes.data, len(VF_a), lo,
            hi, Score.ctypes.data, Score_r.ctypes.data,
            include.ctypes.data, DB_size, mode, proxi, base_count,
            reg_buf.ctypes.data, reg_len, softp, state.ctypes.data)

    def cut_limits(self, VFs, VRs, start, jj, region) -> tuple:
        reg = np.asarray(region, np.int32)
        out2 = np.zeros(2, np.int64)
        self._lib.kchain_cut_limits(
            self._h, VFs.ctypes.data, VRs.ctypes.data, start, jj,
            reg.ctypes.data, len(reg), out2.ctypes.data)
        return int(out2[0]), int(out2[1])

    def save_kmers_count(self, codes: np.ndarray, n_positions,
                         exhaustive: bool, Score: np.ndarray,
                         Score_r: np.ndarray, proxi):
        """-ck scanner (savekmers.c:3067-3365); returns
        ((best, bests), (best_r, bests_r)); workspaces return to zero."""
        if self._pair_b is None:
            n = len(self._tl) + 2
            self._pair_b = np.zeros(n, np.int32)
            self._pair_br = np.zeros(n, np.int32)
        codes = np.ascontiguousarray(codes, np.uint8)
        npos = np.ascontiguousarray(n_positions, np.int64)
        nb = ctypes.c_int(0)
        nbr = ctypes.c_int(0)
        bs = np.zeros(2, np.int64)
        soft = None
        frac = 0.0
        use = 0
        if proxi is not None:
            use = 1
            frac = float(proxi.min_frac)
            if proxi.soft is not None:
                soft = proxi.soft.ctypes.data_as(_i64p)
        self._lib.kchain_save_kmers_count(
            self._h, codes.ctypes.data_as(_u8p), len(codes),
            npos.ctypes.data_as(_i64p), len(npos),
            1 if exhaustive else 0, frac, use,
            Score.ctypes.data_as(_i64p), Score_r.ctypes.data_as(_i64p),
            soft,
            self._pair_b.ctypes.data_as(_i32p), ctypes.byref(nb),
            self._pair_br.ctypes.data_as(_i32p), ctypes.byref(nbr),
            bs.ctypes.data_as(_i64p))
        return ((int(bs[0]), self._pair_b[:nb.value].tolist()),
                (int(bs[1]), self._pair_br[:nbr.value].tolist()))

    def hmm_region(self, VFL_a, VRL_a, VFs, VRs, NN_a, seqlen, k,
                   exhaustive, hp_a, st3, out4, vr0=-1, hfix=None):
        """One save_kmers_HMM region iteration (savekmers.c:3986-4283):
        seed search + both-direction HMM extension.  vr0/hfix carry the
        pure-minimizer hLenR emulation (kchain_hmm_region doc)."""
        return self._lib.kchain_hmm_region(
            VFL_a.ctypes.data, VRL_a.ctypes.data, VFs.ctypes.data,
            VRs.ctypes.data, NN_a.ctypes.data, seqlen, k,
            1 if exhaustive else 0, hp_a.ctypes.data, st3.ctypes.data,
            out4.ctypes.data, vr0,
            hfix.ctypes.data if hfix is not None else None)

    def lookup_kmer(self, kmer: int) -> int:
        """voff of one k-mer key (lookup(0) feeds the hLenR emulation)."""
        return int(self._lib.kchain_lookup_kmer(self._h, kmer))

    def _ws(self, t):
        """Per-thread Score/extendScore/include workspaces."""
        while len(self._wss) <= t:
            n = len(self._tl)
            self._wss.append((np.zeros(n, np.int64),
                              np.zeros(n, np.int64),
                              np.zeros(n, np.uint8)))
        return self._wss[t]

    def scan_batch(self, codes_list, headers, exhaustive: bool,
                   Score: np.ndarray, extendScore: np.ndarray,
                   include: np.ndarray, minlen: int, coverT: float,
                   mrs: float, mrc: float, lc: bool):
        """Per-read AnkerHit lists for a batch of reads; one ctypes
        round-trip per ~batch instead of per read."""
        B = len(codes_list)
        if not B:
            return []
        coff = np.zeros(B + 1, np.int64)
        for i, c in enumerate(codes_list):
            coff[i + 1] = coff[i] + len(c)
        flat = np.ascontiguousarray(
            np.concatenate([np.asarray(c, np.uint8) for c in codes_list]))
        nhits = np.zeros(B, np.int32)
        results = [None] * B
        r0 = 0
        while r0 < B:
            n_req = B - r0
            if self._cap_hits < 4 * n_req + 64:
                self._cap_hits = 4 * n_req + 64
                self._alloc()
            coff_v = np.ascontiguousarray(coff[r0:])
            consumed = self._lib.kchain_scan_batch(
                self._h, flat.ctypes.data_as(_u8p),
                coff_v.ctypes.data_as(_i64p), n_req,
                1 if exhaustive else 0, minlen, coverT, mrs, mrc,
                1 if lc else 0,
                Score.ctypes.data_as(_i64p),
                extendScore.ctypes.data_as(_i64p),
                include.ctypes.data_as(_u8p),
                nhits.ctypes.data_as(_i32p),
                self._hit_rc.ctypes.data_as(_u8p),
                self._hit_sc.ctypes.data_as(_i64p),
                self._hit_b0.ctypes.data_as(_i32p),
                self._hit_b1.ctypes.data_as(_i32p),
                self._tpl_off.ctypes.data_as(_i64p),
                self._tpl.ctypes.data_as(_i32p),
                self._cap_hits, self._cap_tpl)
            h = 0
            for i in range(consumed):
                n = int(nhits[i])
                results[r0 + i] = self._emit(codes_list[r0 + i],
                                             headers[r0 + i], h, h + n)
                h += n
            if consumed < n_req:
                self._cap_hits *= 4
                self._cap_tpl *= 4
                self._alloc()
            r0 += consumed
        return results


_engine_cache: dict = {}


def engine_for(idx: KmaIndex, pen: Penalties) -> Optional["NativeChain"]:
    """Cached per-index engine for ad-hoc native calls (pair scanning);
    the cache entry pins idx so the id() key stays valid."""
    key = (id(idx), pen.M, pen.MM, pen.U, pen.W1, pen.Wl)
    hit = _engine_cache.get(key)
    if hit is not None:
        return hit[1]
    eng = make_native_chain(idx, pen,
                            np.asarray(idx.template_lengths, np.int64))
    _engine_cache[key] = (idx, eng)
    return eng


def make_native_chain(idx: KmaIndex, pen: Penalties,
                      template_lengths: np.ndarray
                      ) -> Optional[NativeChain]:
    """NativeChain for this DB, or None when the native path does not
    apply (cmer DBs, missing toolchain, KMA_TPU_NO_NATIVE)."""
    if idx.values is None or idx.values.dtype.itemsize not in (2, 4):
        return None
    if idx.exist is None or idx.exist.dtype.itemsize not in (4, 8):
        return None
    if not idx.mega:
        if idx.key_index is None or idx.value_index is None:
            return None
        if idx.key_index.dtype.itemsize not in (4, 8) \
                or idx.value_index.dtype.itemsize not in (4, 8):
            return None
    lib = get_lib()
    if lib is None:
        return None
    return NativeChain(lib, idx, pen, template_lengths)


def translate_read_native(codes, kmersize, prefix_len, prefix):
    """translateToKmersAndDump (sparse.c:50-131) via the native lib;
    None when the lib is unavailable."""
    lib = get_lib()
    if lib is None:
        return None
    codes = np.ascontiguousarray(codes, np.uint8)
    out = np.empty(2 * max(len(codes), 1), np.uint64)
    n = lib.kchain_translate_read(
        codes.ctypes.data_as(_u8p), len(codes), kmersize, prefix_len,
        prefix, out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint64)))
    return out[:n]
