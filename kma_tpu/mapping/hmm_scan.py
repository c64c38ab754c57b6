"""save_kmers_HMM: probabilistic read splicing scanner (-hmm).

Re-implementation of the reference's HMM scanner family
(savekmers.c:3866-4522 save_kmers_HMM, :4522-4720 ankerAndClean,
:4852-5120 ankerAndClean_MEM).  A read is scanned for seed k-mer hits
(both strands); each seed is extended in both directions by an 8-param
log-space match/non-match HMM; the covered region's per-template hit
counts are then iteratively carved into anker records, each carrying a
word-aligned SLICE of the read and a "\\tstart\\tend" text suffix on the
header (visible in .frag.gz names, unlike chain mode's packed binary
q-bounds).

Several reference quirks are reproduced deliberately because they are
observable in output bytes:
  * the backward extension's N-boundary check is
    `Ncheck = (n > 0) ? -1 : qseq->N[n]` (savekmers.c:3912), i.e. a real
    previous-N position NEVER matches and the N-count can,
  * its inner catch-up loop `while(k >= kmersize && k < (j - kmersize))`
    (savekmers.c:4060) can never run,
  * ankerAndClean's proxi rc extension writes `regionTemplates[bestHits]`
    WITHOUT advancing bestHits (savekmers.c:4609), overwriting the last
    fw-extension slot,
  * ankerAndClean's non-proxi extension RESETS its write cursor to
    `*regionTemplates + 1` whenever a strictly better coverage appears
    (savekmers.c:4648).
"""

from __future__ import annotations

import math
from typing import Dict, List, Optional

import numpy as np

from ..index.format import KmaIndex
from ..io.seq import kmer_scan
from .scan import AnkerHit, lookup_voff


def _values(idx: KmaIndex, voff: int) -> np.ndarray:
    cnt = int(idx.values[voff])
    return idx.values[voff + 1: voff + 1 + cnt]


class HmmCompBuf:
    """Model of step 2's reused qseq_comp buffer (savekmers.c:139-143
    allocComp(1024) + getComp's grow-by-calloc, compdna.c getComp).

    A whole-word HMM slice's extra wire word (see AnkerHit.rc_override)
    reads one packed word PAST the current read's complen -- exposing
    residue bases of an earlier, longer read.  load() reproduces the
    buffer's base-level contents after each getComp."""

    def __init__(self):
        self.size = 1024            # capacity in bases
        self.base = np.zeros(1024, np.uint8)

    def load(self, codes: np.ndarray) -> None:
        L = len(codes)
        if L >= self.size:          # getComp realloc -> fresh zeros
            self.size = (((L >> 5) + 1) << 6) if (L & 31) else (L << 1)
            self.base = np.zeros(self.size, np.uint8)
        complen = ((L >> 5) + 1) if (L & 31) else (L >> 5)
        self.base[:L] = codes & 3
        self.base[L: complen * 32] = 0


class _WinMap:
    """Dict-like window->voff map on a dense array (ranges in the clear
    loops probe up to seqlen, hence the +1 slack)."""

    __slots__ = ("a",)

    def __init__(self, n: int):
        self.a = np.full(n, -1, np.int64)

    def __setitem__(self, k, v):
        self.a[k] = v

    def get(self, k, d=-1):
        v = int(self.a[k])
        return v if v >= 0 else d

    def pop(self, k, d=-1):
        v = int(self.a[k])
        if v >= 0:
            self.a[k] = -1
            return v
        return d

    def clear(self):
        self.a.fill(-1)


class _VCache:
    """Lazy per-window voff lookups for one strand (hash lookups are
    pure, so precomputation order does not affect semantics)."""

    def __init__(self, idx: KmaIndex, kmers: np.ndarray):
        self.idx = idx
        self.kmers = kmers
        self.cache: Dict[int, int] = {}

    def __call__(self, j: int) -> int:
        v = self.cache.get(j)
        if v is None:
            v = lookup_voff(self.idx, int(self.kmers[j]))
            self.cache[j] = v
        return v


class DeviceHmmStream:
    """Batch the HMM scanner's per-window probes through the device
    (savekmers.c:3941-3981 lookups; the devserve chain op or any
    (codes, lengths) -> (rows_f, rows_rc) callable).  The fold/rc-fold
    semantics are preserved: N folds to base 0 and EVERY in-length
    window probes, so the hit stream is identical to the host scan's.
    The seed/extend/carve walk stays host/native."""

    def __init__(self, idx: KmaIndex, lookup, voff_map,
                 batch: int = 2048, cell_budget: int = 8 << 20):
        self.k = int(idx.kmersize)
        self._lookup = lookup
        self.voff_map = np.concatenate(
            [np.asarray(voff_map, np.int64), [-1]])
        self.batch = batch
        self.cell_budget = cell_budget

    def _pad_len(self, n: int) -> int:
        b = 128
        while b < n:
            b = -(-b * 3 // 2) // 64 * 64
        return b

    def _flush(self, buf, scan_fn):
        k = self.k
        idxs = [i for i, r in enumerate(buf) if len(r.codes) >= k]
        empty = np.zeros(0, np.int64)
        if idxs:
            L = self._pad_len(max(len(buf[i].codes) for i in idxs))
            codes = np.full((len(idxs), L), 4, np.uint8)
            lengths = np.zeros(len(idxs), np.int32)
            for j, i in enumerate(idxs):
                c = buf[i].codes
                codes[j, : len(c)] = c & 3     # HMM fold: N -> base 0
                lengths[j] = len(c)
            rows_f, rows_rc = self._lookup(codes, lengths)
            vf = self.voff_map[rows_f]
            vr = self.voff_map[rows_rc]
        look = {}
        for j, i in enumerate(idxs):
            W = len(buf[i].codes) - k + 1
            # host VRL order is rc-window order: rc window w is the
            # revcomp of fw window W-1-w, which is rows_rc[W-1-w];
            # contiguous copies: the arrays feed native code
            look[i] = (np.ascontiguousarray(vf[j, :W]),
                       np.ascontiguousarray(vr[j, :W][::-1]))
        for i, r in enumerate(buf):
            yield r, scan_fn(r, lookups=look.get(i, (empty, empty)))

    def stream(self, reads, scan_fn):
        buf = []
        mx = 0
        for read in reads:
            buf.append(read)
            mx = max(mx, len(read.codes))
            if (len(buf) >= self.batch
                    or len(buf) * self._pad_len(mx) >= self.cell_budget):
                yield from self._flush(buf, scan_fn)
                buf = []
                mx = 0
        if buf:
            yield from self._flush(buf, scan_fn)


def hmm_scan_read(idx: KmaIndex, codes: np.ndarray, header: bytes,
                  template_lengths: np.ndarray, minlen: int,
                  Score: np.ndarray, Score_r: np.ndarray,
                  include: np.ndarray, mem_mode: bool = False,
                  proxi=None, exhaustive: bool = False,
                  decon: bool = False,
                  comp_buf: Optional[HmmCompBuf] = None,
                  lookups=None) -> List[AnkerHit]:
    """Scan one read with the HMM scanner; returns emitted anker records
    (empty = unmapped).  Score/Score_r/include are reusable DB_size+1
    dense arrays (zeroed between reads by construction, like the
    reference's shared thread buffers)."""
    k = idx.kmersize
    seqlen = len(codes)
    if comp_buf is not None:        # getComp runs for EVERY fragment
        comp_buf.load(codes)
    if seqlen < k:
        return []
    seqend = seqlen - k + 1
    DB_size = idx.db_size
    min_frac = float(proxi.min_frac) if proxi is not None else 0.0
    soft_proxi = proxi.soft if proxi is not None else None

    # k-mers from the PACKED view: compDNA stores N as base 0 and
    # rc_comp maps it to 3, so windows spanning Ns still produce
    # (bogus but deterministic) lookups during HMM extension
    fold = (codes & 3).astype(np.uint8)
    rc_fold = (3 - fold)[::-1].astype(np.uint8)
    from ..config import Penalties
    from .native_chain import engine_for
    eng = engine_for(idx, Penalties())
    if lookups is not None and eng is not None:
        # device-probed window voffs (devserve chain op; the HMM probes
        # fold N to base 0 and probe EVERY window, savekmers.c:3941)
        VFL_a, VRL_a = lookups

        def VFL(w: int) -> int:
            return int(VFL_a[w])

        def VRL(w: int) -> int:
            return int(VRL_a[w])
    elif eng is not None:
        VFL_a = eng.lookup_windows(fold)
        VRL_a = eng.lookup_windows(rc_fold)

        def VFL(w: int) -> int:
            return int(VFL_a[w])

        def VRL(w: int) -> int:
            return int(VRL_a[w])
    else:
        if idx.flag & 3:
            from ..io.seq import cmer_scan
            fw_kmers = cmer_scan(fold, k, idx.mlen, idx.flag)
            rc_kmers = cmer_scan(rc_fold, k, idx.mlen, idx.flag)
        else:
            fw_kmers = kmer_scan(fold, k)
            rc_kmers = kmer_scan(rc_fold, k)
        VFL = _VCache(idx, fw_kmers)
        VRL = _VCache(idx, rc_kmers)

    def VR_at(j: int) -> int:
        """rc lookup stored at fw window j (rc position seqlen-k-j)."""
        return VRL(seqlen - k - j)

    # qseq->N with the scanner's appended sentinel (savekmers.c:3981):
    # NN[0] = count, NN[1..count] positions, NN[count] = seqlen
    npos = np.flatnonzero(codes == 4)
    NN = [0] + [int(King) for King in npos] + [seqlen]
    NN[0] = len(npos) + 1

    # HMM parameters (savekmers.c:3943-3950)
    hp = (math.log(1 - 0.25 ** k), math.log(0.25 ** k),
          math.log(1 - 0.25 ** (k - 1) * 0.75),
          math.log(0.25 ** (k - 1) * 0.75),
          math.log(1 - 1.0 / k * 0.75 * 0.25),
          math.log(1.0 / k * 0.75 * 0.25),
          math.log(0.75), math.log(0.25))

    VF_scores = _WinMap(seqlen + 1)  # window -> voff (-1 = no entry)
    VR_scores = _WinMap(seqlen + 1)
    out: List[AnkerHit] = []

    i = 0
    i_r = seqlen - k
    N = 1
    NN_a = np.asarray(NN, np.int64)
    hp_a = np.asarray(hp, np.float64)
    st3 = np.zeros(3, np.int64)
    out4 = np.zeros(4, np.int64)
    # pure-minimizer DBs: save_kmers_HMM's uninitialized hLenR
    # (savekmers.c:3874; only hLen is set at :3935) makes every rc SEED
    # probe's cmer collapse to 0 (getMmerR with *kmersize = stack
    # garbage + x86 mod-64 shifts) until the read's first hit region
    # runs an initCmer (initMmer writes *H_len, stdnuc.c:250) -- after
    # which rc probes are true minimizers for the rest of the read.
    # hfix starts 0 per read in that mode; native kchain_hmm_region
    # carries the same emulation (vr0 = lookup(kmer 0)).
    _emul = (idx.flag & 3) == 2 and not exhaustive
    hfix_a = np.asarray([0 if _emul else 1], np.int64)
    if _emul:
        vr0 = (eng.lookup_kmer(0) if eng is not None
               else lookup_voff(idx, 0))
    else:
        vr0 = -1

    def VR_seed(j: int) -> int:
        return VR_at(j) if hfix_a[0] else vr0
    while N <= NN[0] and 0 <= i_r:
        if eng is not None:
            st3[0] = i
            st3[1] = i_r
            st3[2] = N
            HIT = eng.hmm_region(VFL_a, VRL_a, VF_scores.a, VR_scores.a,
                                 NN_a, seqlen, k, exhaustive, hp_a, st3,
                                 out4, vr0=vr0, hfix=hfix_a)
            i, i_r, N = int(st3[0]), int(st3[1]), int(st3[2])
            if not HIT:
                continue
            start = int(out4[0])
            j = int(out4[1])
            stop = int(out4[2])
            hitCounter = int(out4[3])
        else:
            # --- find a seed (savekmers.c:3986-4024) ---
            HIT = 0
            if exhaustive:
                if i < seqend:
                    hfix_a[0] = 1   # initCmer ran (savekmers.c:3985-3990)
                end = NN[N]
                i += k - 1
                while i < end and not HIT:
                    w = i - k + 1
                    if VFL(w) >= 0 or VR_seed(w) >= 0:
                        HIT = 1
                    else:
                        i += 1
                        i_r -= 1
                i -= k - 1
                end -= k - 1
            else:
                end = NN[N] - k + 1
                while i < end and not HIT:
                    if VFL(i) >= 0 or VR_seed(i) >= 0:
                        HIT = 1
                    else:
                        i += k
                        i_r -= k

            if not HIT:
                N += 1
                continue

            # --- evaluate seed (savekmers.c:4026-4283) ---
            hitCounter = 1
            VF_scores[i] = VFL(i)
            VR_scores[i] = VR_seed(i)

            # extend backward
            Ms_prev = hp[7] + hp[2]
            Ns_prev = hp[5] + hp[0]
            Ms = 0.0
            Ns = 0.0
            j = i - 1
            j_r = i_r + 1
            n = N - 1
            if 0 <= j:
                hfix_a[0] = 1   # backward init (savekmers.c:4051-4056)
            Ncheck = -1 if n > 0 else NN[n]   # reference quirk (see module doc)
            while j >= 0:
                if j == Ncheck:
                    kk = j
                    # dead inner loop preserved for fidelity
                    while kk >= k and kk < (j - k):  # pragma: no cover
                        if kk == Ncheck:
                            j = Ncheck
                            n -= 1
                            Ncheck = -1 if n > 0 else NN[n]
                        if (Ns_prev + hp[0] + hp[4]
                                >= Ms_prev + hp[3] + hp[4]):
                            Ns = Ns_prev + hp[0] + hp[4]
                        else:
                            Ns = Ms_prev + hp[3] + hp[4]
                        if (Ms_prev + hp[2] + hp[6]
                                >= Ns_prev + hp[1] + hp[6]):
                            Ms = Ms_prev + hp[2] + hp[6]
                        else:
                            Ms = Ns_prev + hp[1] + hp[6]
                            break
                        kk -= 1
                        Ns_prev = Ns
                        Ms_prev = Ms
                    if kk >= k and kk < (j - k):  # pragma: no cover
                        j = kk - 1
                        break
                    j = kk - 1
                    j_r = seqlen - k - kk + 1
                    if j != Ncheck:
                        hfix_a[0] = 1   # re-init (savekmers.c:4095-4101)
                else:
                    vf = VFL(j)
                    vr = VR_at(j)
                    if vf >= 0:
                        VF_scores[j] = vf
                    if vr >= 0:
                        VR_scores[j] = vr
                    if vf >= 0 or vr >= 0:
                        hitCounter += 1
                        if (Ns_prev + hp[0] + hp[5]
                                >= Ms_prev + hp[3] + hp[5]):
                            Ns = Ns_prev + hp[0] + hp[5]
                        else:
                            Ns = Ms_prev + hp[3] + hp[5]
                        if (Ms_prev + hp[2] + hp[7]
                                >= Ns_prev + hp[1] + hp[7]):
                            Ms = Ms_prev + hp[2] + hp[7]
                        else:
                            Ms = Ns_prev + hp[1] + hp[7]
                            j -= 1
                            break
                    else:
                        if (Ns_prev + hp[0] + hp[4]
                                >= Ms_prev + hp[3] + hp[4]):
                            Ns = Ns_prev + hp[0] + hp[4]
                        else:
                            Ns = Ms_prev + hp[3] + hp[4]
                        if (Ms_prev + hp[2] + hp[6]
                                >= Ns_prev + hp[1] + hp[6]):
                            Ms = Ms_prev + hp[2] + hp[6]
                        else:
                            Ms = Ns_prev + hp[1] + hp[6]
                            j -= 1
                            break
                    j -= 1
                    j_r += 1
                Ns_prev = Ns
                Ms_prev = Ms
            start = j + 1

            # extend forward
            Ms_prev = hp[7] + hp[2]
            Ns_prev = hp[5] + hp[0]
            j = i + 1
            j_r = i_r - 1
            Ncheck = NN[N] - k + 1
            if j != Ncheck:
                hfix_a[0] = 1   # forward init (savekmers.c:4166-4173)
            while j < seqend:
                if j == Ncheck:
                    kk = j
                    while kk < seqend and kk < (j + k):
                        if kk == Ncheck:
                            j = Ncheck
                            N += 1
                            Ncheck = (seqlen if N == NN[0]
                                      else NN[N] - k + 1)
                        if (Ns_prev + hp[0] + hp[4]
                                >= Ms_prev + hp[3] + hp[4]):
                            Ns = Ns_prev + hp[0] + hp[4]
                        else:
                            Ns = Ms_prev + hp[3] + hp[4]
                        if (Ms_prev + hp[2] + hp[6]
                                >= Ns_prev + hp[1] + hp[6]):
                            Ms = Ms_prev + hp[2] + hp[6]
                        else:
                            Ms = Ns_prev + hp[1] + hp[6]
                            break
                        kk += 1
                        Ns_prev = Ns
                        Ms_prev = Ms
                    if kk < seqend and kk < (j + k):
                        j = kk
                        break
                    j = kk
                    j_r = seqlen - k - kk
                    if j != Ncheck:
                        hfix_a[0] = 1   # re-init (savekmers.c:4215-4221)
                else:
                    vf = VFL(j)
                    # unfixed: the rolling cmerR is stuck at 0 with a
                    # huge Pos counter, so fwd rc lookups stay lookup(0)
                    vr = VRL(j_r) if hfix_a[0] else vr0
                    if vf >= 0:
                        VF_scores[j] = vf
                    if vr >= 0:
                        VR_scores[j] = vr
                    if vf >= 0 or vr >= 0:
                        hitCounter += 1
                        if (Ns_prev + hp[0] + hp[5]
                                >= Ms_prev + hp[3] + hp[5]):
                            Ns = Ns_prev + hp[0] + hp[5]
                        else:
                            Ns = Ms_prev + hp[3] + hp[5]
                        if (Ms_prev + hp[2] + hp[7]
                                >= Ns_prev + hp[1] + hp[7]):
                            Ms = Ms_prev + hp[2] + hp[7]
                        else:
                            Ms = Ns_prev + hp[1] + hp[7]
                            j += 1
                            break
                    else:
                        if (Ns_prev + hp[0] + hp[4]
                                >= Ms_prev + hp[3] + hp[4]):
                            Ns = Ns_prev + hp[0] + hp[4]
                        else:
                            Ns = Ms_prev + hp[3] + hp[4]
                        if (Ms_prev + hp[2] + hp[6]
                                >= Ns_prev + hp[1] + hp[6]):
                            Ms = Ms_prev + hp[2] + hp[6]
                        else:
                            Ms = Ns_prev + hp[1] + hp[6]
                            j += 1
                            break
                    j += 1
                    j_r -= 1
                Ns_prev = Ns
                Ms_prev = Ms
            stop = j + k - 1

        # --- evaluate hit (savekmers.c:4278-4502) ---
        if hitCounter > 0 and ((stop - start) > minlen or start == 0
                               or stop == seqlen):
            if decon:
                for kq in range(start, j):
                    vf = VF_scores.get(kq, -1)
                    vr = VR_scores.get(kq, -1)
                    if (vf >= 0 and int(_values(idx, vf)[-1]) == DB_size) \
                        or (vr >= 0
                            and int(_values(idx, vr)[-1]) == DB_size):
                        hitCounter -= 1

            if hitCounter > 0:
                last = -1
                reps = 0
                rlast = -1
                rreps = 0
                bt_buf = np.empty(DB_size + 2, np.int32)
                btr_buf = np.empty(DB_size + 2, np.int32)
                nb_f = 0
                nb_r = 0

                if eng is not None:
                    def _flush(voff, reps, score_arr, buf, n):
                        return eng.score_reps(int(voff), int(reps),
                                              score_arr, buf, n)
                else:
                    def _flush(voff, reps, score_arr, buf, n):
                        for t in _values(idx, voff):
                            t = int(t)
                            score_arr[t] += reps
                            if score_arr[t] == reps:
                                buf[n] = t
                                n += 1
                        return n

                if eng is not None:
                    nb_f = eng.score_window_runs(
                        VF_scores.a[start:j], Score, bt_buf, nb_f)
                    nb_r = eng.score_window_runs(
                        VR_scores.a[start:j], Score_r, btr_buf, nb_r)
                else:
                    for kq in range(start, j):
                        vf = VF_scores.get(kq, -1)
                        if vf >= 0:
                            if vf == last:
                                reps += 1
                            else:
                                if last >= 0:
                                    nb_f = _flush(last, reps, Score,
                                                  bt_buf, nb_f)
                                reps = 1
                                last = vf
                        vr = VR_scores.get(kq, -1)
                        if vr >= 0:
                            if vr == rlast:
                                rreps += 1
                            else:
                                if rlast >= 0:
                                    nb_r = _flush(rlast, rreps, Score_r,
                                                  btr_buf, nb_r)
                                rreps = 1
                                rlast = vr
                    if last >= 0:
                        nb_f = _flush(last, reps, Score, bt_buf, nb_f)
                    if rlast >= 0:
                        nb_r = _flush(rlast, rreps, Score_r, btr_buf, nb_r)
                bestT_a = bt_buf[:nb_f].copy()
                bestT_r_a = btr_buf[:nb_r].copy()

                # cut out template hits (savekmers.c:4404-4502).  The
                # reference's zero-score removal (swap-with-last while
                # bestScore == 0) only drops entries whose score is
                # already 0, which never changes any later read of the
                # lists — so the selection reduces to "ordered ties of
                # the global max, fw entries first iff the fw max ties
                # the global max"
                while HIT != 0:
                    sf = Score[bestT_a]
                    sr = Score_r[bestT_r_a]
                    mf = int(sf.max()) if len(sf) else 0
                    mr = int(sr.max()) if len(sr) else 0
                    bestScore = mf if mf >= mr else mr
                    region = []
                    if bestScore > 0:
                        if mf == bestScore:
                            region = bestT_a[sf == bestScore].tolist()
                        region += (-bestT_r_a[sr == bestScore]).tolist()

                    if bestScore > 0:
                        # find limits of match; the bound is re-read
                        # every step (a find at l ends the walk)
                        if eng is not None:
                            start_cut, end_cut = eng.cut_limits(
                                VF_scores.a, VR_scores.a, start, j, region)
                        else:
                            start_cut = j
                            for t in region:
                                ta = abs(t)
                                el = start
                                while el < start_cut:
                                    vr = VR_scores.get(el, -1)
                                    if vr >= 0 and _in_list(idx, vr, ta):
                                        start_cut = el
                                    vf = VF_scores.get(el, -1)
                                    if vf >= 0 and _in_list(idx, vf, ta):
                                        start_cut = el
                                    el += 1
                            end_cut = start_cut
                            for t in region:
                                ta = abs(t)
                                el = j
                                while el > end_cut:
                                    vr = VR_scores.get(el, -1)
                                    if vr >= 0 and _in_list(idx, vr, ta):
                                        end_cut = el
                                    vf = VF_scores.get(el, -1)
                                    if vf >= 0 and _in_list(idx, vf, ta):
                                        end_cut = el
                                    el -= 1

                        if (bestScore * k
                                > (end_cut - start_cut - bestScore + k)):
                            HIT = 1 if region[-1] > 0 else -1
                            interior = (start != 0 and j != seqlen)
                            mem = mem_mode and not interior
                            hit_rec = _anker_and_clean(
                                idx, codes, NN, region, Score, Score_r,
                                include, template_lengths, VF_scores,
                                VR_scores, HIT, bestScore, start_cut,
                                end_cut, header, seqlen, DB_size,
                                min_frac, soft_proxi, mem, comp_buf,
                                eng=eng)
                            if hit_rec is not None:
                                out.append(hit_rec)
                        else:
                            Score[bestT_a] = 0
                            Score_r[bestT_r_a] = 0
                            HIT = 0
                    else:
                        Score[bestT_a] = 0
                        Score_r[bestT_r_a] = 0
                        HIT = 0

        # clear scores (savekmers.c:4505-4509); the reference pops the
        # window hashmap entry-by-entry, but a full reset is outcome-
        # identical on the dense window arrays
        VF_scores.clear()
        VR_scores.clear()

        i = stop + 1
        i_r = seqlen - k - i

    return out


def _in_list(idx: KmaIndex, voff: int, template: int) -> bool:
    """intpos_bin_contamination (hashmapkma.c:90-146), exact replica
    INCLUDING its false positive: the search range starts at index 1 but
    `pos` can collapse to 0, where the final equality test compares the
    list's COUNT field with the template id (e.g. searching template 2
    in a 2-element list matches).  This is observable in -hmm cut limits
    so it must be reproduced bit-for-bit."""
    vals = idx.values
    up = int(vals[voff])
    if up == 0:
        return False
    down = 1
    pos = (up + down) >> 1
    while 0 < up - down:
        t = int(vals[voff + pos])
        if t == template:
            return True
        if t < template:
            down = pos + 1
        else:
            up = pos - 1
        pos = (up + down) >> 1
    return int(vals[voff + pos]) == template


def _anker_and_clean(idx, codes, NN, region, Score, Score_r, include,
                     template_lengths, VF_scores, VR_scores, HIT,
                     bestScore, start_cut, end_cut, header, seqlen,
                     DB_size, min_frac, soft_proxi, mem, comp_buf=None,
                     eng=None) -> Optional[AnkerHit]:
    """ankerAndClean (savekmers.c:4522-4720) / ankerAndClean_MEM
    (:4852-5120): extend the region list, decrement+clear window scores,
    slice the query 32-aligned, annotate the header, emit.

    `region` is mutated like the reference's regionTemplates array
    (including its overwrite quirks, see module doc); the emitted list is
    region[:count] after the extension cursor settles."""

    def dec_range(lo: int, hi: int) -> None:
        """dec_clear over [lo, hi): pops are idempotent and the
        decrements commute, so batching is order-equivalent."""
        lo = max(lo, 0)
        hi = min(hi, len(VF_scores.a))
        if hi <= lo:
            return
        for arr, sc in ((VF_scores.a, Score), (VR_scores.a, Score_r)):
            seg = arr[lo:hi]
            m = seg >= 0
            if m.any():
                vs = seg[m]
                if eng is not None:
                    eng.dec_voffs(vs, sc)
                else:
                    for vo in vs.tolist():
                        for t in _values(idx, vo):
                            sc[int(t)] -= 1
                seg[m] = -1

    # emulate the C regionTemplates array: list + explicit count/cursor
    reg = list(region)

    def reg_write(pos: int, val: int) -> None:
        while len(reg) <= pos:
            reg.append(0)
        reg[pos] = val

    if not mem:
        for t in reg:
            include[abs(t)] = 1
        bestHitsCov = min(int(template_lengths[abs(t)]) for t in reg)
        cursor = len(reg) - 1           # C bestHits is a 1-based cursor
        if eng is not None:
            # native extension walk (kchain_hmm_extend); quirks identical
            import struct as _st
            reg_buf = np.zeros(DB_size + len(reg) + 2, np.int32)
            reg_buf[: len(reg)] = reg
            state = np.zeros(3, np.int64)
            state[0] = cursor
            state[1] = HIT
            if min_frac:
                proxiScore = int(min_frac * bestScore)
                bestCov = 1.0 * proxiScore / bestHitsCov
                mode, parg = 1, float(proxiScore)
            else:
                bestCov = 1.0 * bestScore / bestHitsCov
                mode, parg = 0, 0.0
            state[2] = _st.unpack("<q", _st.pack("<d", bestCov))[0]
            eng.hmm_extend(VF_scores.a, VR_scores.a, start_cut + 92,
                           end_cut - 92, Score, Score_r, include,
                           DB_size, mode, parg, len(region), reg_buf,
                           len(reg), soft_proxi, state)
            cursor = int(state[0])
            HIT = int(state[1])
            reg = reg_buf[: cursor + 1].tolist()
        elif min_frac:
            proxiScore = int(min_frac * bestScore)
            bestCov = 1.0 * proxiScore / bestHitsCov
            for kq in range(start_cut + 92, end_cut - 92 + 1):
                vf = VF_scores.pop(kq, -1)
                if vf >= 0:
                    for t in _values(idx, vf):
                        t = int(t)
                        score = int(Score[t])
                        if (include[t] == 0 and t != DB_size
                            and (proxiScore <= score
                                 or bestCov * int(template_lengths[t])
                                 <= score)):
                            include[t] = 1
                            cursor += 1
                            reg_write(cursor, t)
                            if soft_proxi is not None:
                                soft_proxi[t] += score
                        Score[t] -= 1
                vr = VR_scores.pop(kq, -1)
                if vr >= 0:
                    for t in _values(idx, vr):
                        t = int(t)
                        score = int(Score_r[t])
                        if (include[t] == 0 and t != DB_size
                            and (proxiScore <= score
                                 or bestCov * int(template_lengths[t])
                                 <= score)):
                            include[t] = 1
                            # reference quirk: NO cursor advance here
                            reg_write(cursor, -t)
                            if soft_proxi is not None:
                                soft_proxi[t] += score
                        Score_r[t] -= 1
        elif True:
            bestCov = 1.0 * bestScore / bestHitsCov
            base_count = len(region)
            for kq in range(start_cut + 92, end_cut - 92 + 1):
                vf = VF_scores.pop(kq, -1)
                if vf >= 0:
                    for t in _values(idx, vf):
                        t = int(t)
                        if include[t] == 0 and t != DB_size:
                            thisCov = (1.0 * int(Score[t])
                                       / int(template_lengths[t]))
                            if thisCov > bestCov:
                                include[t] = 1
                                bestCov = thisCov
                                cursor = base_count  # reset write cursor
                                reg_write(cursor, t)
                            elif thisCov == bestCov:
                                include[t] = 1
                                cursor += 1
                                reg_write(cursor, t)
                        Score[t] -= 1
                vr = VR_scores.pop(kq, -1)
                if vr >= 0:
                    for t in _values(idx, vr):
                        t = int(t)
                        if include[t] == 0 and t != DB_size:
                            thisCov = (1.0 * int(Score_r[t])
                                       / int(template_lengths[t]))
                            if thisCov > bestCov:
                                include[t] = 1
                                HIT = -1
                                bestCov = thisCov
                                cursor = base_count
                                reg_write(cursor, -t)
                            elif thisCov == bestCov:
                                include[t] = 1
                                HIT = -1
                                cursor += 1
                                reg_write(cursor, -t)
                        Score_r[t] -= 1
        reg = reg[:cursor + 1]

        # clear nearest templates on both sides (savekmers.c:4731-4802)
        end = min(seqlen, start_cut + 92)
        start_cut = max(0, start_cut - 92)
        dec_range(start_cut, end)
        end = max(0, end_cut - 92)
        end_cut = min(seqlen, end_cut + 92)
        dec_range(end + 1, end_cut + 1)

        for t in reg:
            include[abs(t)] = 0

        # modify limits (savekmers.c:4812-4816): ANOTHER +-92 widening
        start_cut = max(0, start_cut - 92)
        end_cut = min(seqlen, end_cut + 92)
    else:
        # ankerAndClean_MEM
        cursor = len(reg) - 1
        if min_frac and eng is not None:
            import struct as _st
            for t in reg:
                include[abs(t)] = 1
            proxiScore = int(min_frac * bestScore)
            reg_buf = np.zeros(DB_size + len(reg) + 2, np.int32)
            reg_buf[: len(reg)] = reg
            state = np.zeros(3, np.int64)
            state[0] = cursor
            state[1] = HIT
            eng.hmm_extend(VF_scores.a, VR_scores.a, start_cut + 92,
                           end_cut - 92, Score, Score_r, include,
                           DB_size, 2, float(proxiScore), len(region),
                           reg_buf, len(reg), soft_proxi, state)
            cursor = int(state[0])
            reg = reg_buf[: cursor + 1].tolist()
            end = min(seqlen, start_cut + 92)
            dec_range(max(0, start_cut - 92), end)
            end = min(seqlen, end_cut + 92)
            dec_range(max(0, end_cut - 92), end)
            start_cut = max(0, start_cut - 92)
            end_cut = min(seqlen, end_cut + 92)
            for t in reg:
                include[abs(t)] = 0
        elif min_frac:
            for t in reg:
                include[abs(t)] = 1
            proxiScore = int(min_frac * bestScore)
            for kq in range(start_cut + 92, end_cut - 92 + 1):
                vf = VF_scores.pop(kq, -1)
                if vf >= 0:
                    for t in _values(idx, vf):
                        t = int(t)
                        if (include[t] == 0
                                and proxiScore <= int(Score[t])
                                and t != DB_size):
                            include[t] = 1
                            cursor += 1
                            reg_write(cursor, t)
                            if soft_proxi is not None:
                                soft_proxi[t] += int(Score[t])
                        Score[t] -= 1
                vr = VR_scores.pop(kq, -1)
                if vr >= 0:
                    for t in _values(idx, vr):
                        t = int(t)
                        if (include[t] == 0
                                and proxiScore <= int(Score_r[t])
                                and t != DB_size):
                            include[t] = 1
                            cursor += 1
                            reg_write(cursor, -t)
                            if soft_proxi is not None:
                                soft_proxi[t] += int(Score_r[t])
                        Score_r[t] -= 1
            reg = reg[:cursor + 1]
            end = min(seqlen, start_cut + 92)
            dec_range(max(0, start_cut - 92), end)
            end = min(seqlen, end_cut + 92)
            dec_range(max(0, end_cut - 92), end)
            start_cut = max(0, start_cut - 92)
            end_cut = min(seqlen, end_cut + 92)
            for t in reg:
                include[abs(t)] = 0
        else:
            start_cut = max(0, start_cut - 92)
            end_cut = min(seqlen, end_cut + 92)
            dec_range(start_cut, end_cut)

    # modify limits of match seq (savekmers.c:4814-4820 / :5085-5090)
    start_cut = (start_cut >> 5) << 5
    end_cut = min(((end_cut >> 5) << 5) + 32, seqlen)
    tmplen = end_cut - start_cut
    tmpN: List[int] = []
    for kq in range(1, NN[0]):
        if start_cut <= NN[kq]:
            p = NN[kq] - start_cut
            if p >= tmplen:
                break
            tmpN.append(p)

    # trim trailing gaps
    tmplen -= 1
    ln = len(tmpN)
    while ln and tmpN[ln - 1] == tmplen:
        tmplen -= 1
        ln -= 1
    tmplen += 1
    tmpN = tmpN[:ln]

    sub = codes[start_cut: start_cut + tmplen]
    # sprintf at header->len-1 overwrites the trailing NUL and appends a
    # new one (savekmers.c:4853)
    bh = header[:-1] + b"\t%d\t%d\x00" % (start_cut, end_cut)

    # seqlen % 32 == 0 slices carry one garbage word on the wire
    # (tmpQseq.complen = (len>>5)+1, savekmers.c:4846) and rc_comp skips
    # its shift for whole-word lengths (compdna.c:250-270), so step 3's
    # rc read is [rc of the 32 bases AFTER the slice] ++ rc(sub)[:-32].
    rc_override = None
    if tmplen and tmplen % 32 == 0:
        L = len(codes)
        fold = (codes & 3).astype(np.uint8)
        s = start_cut + tmplen
        if comp_buf is not None:
            # the extra word may lie past this read's complen words:
            # step 2's reused buffer exposes an earlier read's bases
            ext = comp_buf.base[s: s + 32].copy()
        else:
            ext = np.zeros(32, np.uint8)
            take = max(0, min(32, L - s))
            if take:
                ext[:take] = fold[s: s + take]
        true_rc = (3 - np.concatenate([fold[start_cut: s], ext]))[::-1]
        rc_override = true_rc[:tmplen].astype(np.uint8)
        # unCompDNA then restores Ns at the TRUE-rc N positions
        # (alnfrags.c:1061-1072), misaligned with the shifted content
        if tmpN:
            npr = (tmplen - 1) - np.asarray(tmpN, np.int64)
            rc_override[npr] = 4

    wire_words = None
    if comp_buf is not None:
        # the -s2 wire view: (tmplen>>5)+1 packed words straight out of
        # the step-2 buffer (tmpQseq.seq + start_cut>>5, complen + 1)
        from ..io.seq import pack_2bit
        nwords = (tmplen >> 5) + 1
        span = comp_buf.base[start_cut: start_cut + nwords * 32]
        if len(span) < nwords * 32:
            span = np.concatenate([span, np.zeros(nwords * 32 - len(span),
                                                  np.uint8)])
        wire_words = pack_2bit(span)[:nwords]

    return AnkerHit(codes=sub,
                    n_positions=np.asarray(tmpN, np.int32),
                    rc_flag=HIT * bestScore,
                    templates=np.asarray(reg, np.int32),
                    header=bh, flag=0, rc_override=rc_override,
                    wire_words=wire_words)
