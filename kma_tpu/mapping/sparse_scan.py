"""Scanners for mapping reads against -Sparse DBs (savekmers.c:826-2440).

A sparse DB indexes only k-mers that follow a prefix (or, for ``-Sparse -``,
every k-mer but with prefix flag set).  kmers.c:97-125 swaps the scan
pointers when the loaded DB has ``prefix_len != 0 || prefix != 0``:

  prefix DBs   -> save_kmers_Sparse (both strands counted into ONE list,
                  getMatchSparse score conversion, record emitted RC with
                  flag 16) / get_kmers_for_pair_Sparse
  "-" DBs      -> save_kmers_pseuodeSparse (forward-only save_kmers-style
                  scoring) / get_kmers_for_pair_pseoudoSparse

Records go through print_ankers_Sparse (ankers.c), which always stores a
NEGATIVE rc_flag.
"""

from __future__ import annotations

from typing import List, Optional, Tuple

import numpy as np

from ..config import Penalties
from ..index.format import KmaIndex
from ..io.seq import rc_codes
from .scan import AnkerHit, Proxi, _scan_strand, get_match


def _segments(codes: np.ndarray) -> List[Tuple[int, int]]:
    """N-free segments [start, N_end) like the qseq->N walk."""
    npos = np.flatnonzero(codes == 4).tolist()
    segs = []
    j = 0
    for ni in npos + [len(codes)]:
        segs.append((j, ni))
        j = ni + 1
    return segs


def _pack(codes: np.ndarray, start: int, ln: int) -> int:
    v = 0
    for c in codes[start: start + ln].tolist():
        v = (v << 2) | (c & 3)
    return v


def get_match_sparse(cands: List[int], Score, kmersize: int, n_kmers: int,
                     M: int, MM: int, proxi: Optional[Proxi] = None
                     ) -> Tuple[int, List[int]]:
    """getBestMatchSparse (savekmers.c:342-364) / getProxiMatchSparse
    (:366-413): counts are converted to cnt*k*M + (n_kmers-cnt)*MM."""
    bestScore = 0
    best: List[int] = []
    if proxi is None:
        for t in cands:
            cnt = int(Score[t])
            s = cnt * kmersize * M + (n_kmers - cnt) * MM
            if s > bestScore:
                bestScore = s
                best = [t]
            elif s == bestScore:
                best.append(t)
            Score[t] = 0
    else:
        for t in cands:
            cnt = int(Score[t])
            s = cnt * kmersize * M + (n_kmers - cnt) * MM
            if bestScore < s:
                bestScore = s
        ps = int(proxi.min_frac * bestScore)
        for t in cands:
            cnt = int(Score[t])
            s = cnt * kmersize * M + (n_kmers - cnt) * MM
            if ps <= s:
                best.append(t)
                if proxi.soft is not None:
                    proxi.soft[t] += s
            Score[t] = 0
    return bestScore, best


def _count_prefix_strand(idx: KmaIndex, cur: np.ndarray, Score, bests,
                         seqend: Optional[int] = None) -> Tuple[int, int]:
    """One strand of the prefix-count walk (savekmers.c:1966-2005):
    positions whose preceding prefix_len bases equal the prefix contribute
    the following k-mer.  Returns (hit_counter, n_kmers) increments."""
    k = idx.kmersize
    plen = idx.prefix_len
    prefix = idx.prefix
    hit_counter = 0
    n_kmers = 0
    for (s, e) in _segments(cur):
        if seqend is not None and s >= seqend:
            break
        end = e - k  # j < N[i] - kmersize
        j = s + plen - 1
        if j >= end:
            continue
        pmer = _pack(cur, s, plen - 1) if plen > 1 else 0
        pmask = (1 << (2 * plen)) - 1
        for p in range(j, end):
            pmer = ((pmer << 2) | (int(cur[p]) & 3)) & pmask
            if pmer == prefix:
                n_kmers += 1
                v = idx.lookup(_pack(cur, p + 1, k))
                if v is not None:
                    for t in v[1:].tolist():
                        if Score[t] == 0:
                            bests.append(int(t))
                        Score[t] += 1
                    hit_counter += 1
    return hit_counter, n_kmers


def _count_runs_sparse(idx: KmaIndex, cur: np.ndarray, Score, bests,
                       seqend: int) -> int:
    """The prefix-less reps walk of save_kmers_Sparse /
    get_kmers_for_pair_Sparse (savekmers.c:2059-2135,932-993).

    QUIRK kept: the mid-stream flush reads the count from the NEW value
    list; the SU branch even adds reps to the NEW list's members
    (savekmers.c:2076-2087).  Only the final flush uses the old list.
    Modelled for the short-unsigned layout (DB_size < USHRT_MAX), i.e. the
    flush adds reps to the new list.
    """
    k = idx.kmersize
    hit_counter = 0
    last_key = None
    last_list = None
    reps = 0
    for (s, e) in _segments(cur):
        if s >= seqend:
            break
        for j in range(s, e - k + 1):
            v = idx.lookup(_pack(cur, j, k))
            if v is not None:
                key = v.__array_interface__["data"][0]
                if key == last_key:
                    reps += 1
                else:
                    if last_key is not None:
                        # BUG kept: flushes the NEW list with the OLD reps
                        for t in v[1:].tolist():
                            if Score[t]:
                                Score[t] += reps
                            else:
                                Score[t] = reps
                                bests.append(int(t))
                        hit_counter += reps
                    reps = 1
                    last_key = key
                    last_list = v
    if last_key is not None:
        for t in last_list[1:].tolist():
            if Score[t]:
                Score[t] += reps
            else:
                Score[t] = reps
                bests.append(int(t))
        hit_counter += reps
    return hit_counter


def save_kmers_sparse(idx: KmaIndex, pen: Penalties, codes: np.ndarray,
                      n_positions: np.ndarray, header: bytes,
                      exhaustive: bool, Score, proxi: Optional[Proxi] = None
                      ) -> Optional[AnkerHit]:
    """save_kmers_Sparse (savekmers.c:1924-2157): -1t1 scan against a
    prefix DB.  Both strands are counted into ONE template list; the
    emitted qseq is the read's reverse complement (comp_rc is applied
    in place for the second pass) with sam flag 16."""
    k = idx.kmersize
    if len(codes) < k:
        return None
    M, MM = pen.M, pen.MM
    bests: List[int] = []
    if idx.prefix_len:
        flag = 16
        hit_counter = 0
        n_kmers = 0
        for rc in range(2):
            cur = codes if rc == 0 else rc_codes(codes)
            hc, nk = _count_prefix_strand(idx, cur, Score, bests)
            hit_counter += hc
            n_kmers += nk
        if hit_counter:
            bestScore, best = get_match_sparse(bests, Score, k, n_kmers,
                                               M, MM, proxi)
        else:
            for t in bests:
                Score[t] = 0
            bestScore, best = 0, []
        end = n_kmers - hit_counter - bestScore
        emit = rc_codes(codes)
    else:
        flag = 0
        seqend = len(codes) - k + 1
        hit = bool(exhaustive) or _quick_probe(idx, codes)
        hit_counter = 0
        if hit:
            hit_counter = _count_runs_sparse(idx, codes, Score, bests,
                                             seqend)
        if hit_counter:
            bestScore, best = get_match(bests, Score, proxi)
        else:
            for t in bests:
                Score[t] = 0
            bestScore, best = 0, []
        end = len(codes) + 1 - bestScore
        emit = codes
    if k <= bestScore or bestScore * k > end:
        npos = np.flatnonzero(emit == 4).astype(np.int32)
        return AnkerHit(codes=emit, n_positions=npos, rc_flag=bestScore,
                        templates=np.asarray(best, np.int32), header=header,
                        flag=flag)
    return None


def _quick_probe(idx: KmaIndex, codes: np.ndarray) -> bool:
    """Stride-k probe over N-free segments (savekmers.c:2043-2057)."""
    k = idx.kmersize
    for (s, e) in _segments(codes):
        j = s
        while j < e - k + 1:
            if idx.lookup(_pack(codes, j, k)) is not None:
                return True
            j += k
    return False


def save_kmers_pseudo_sparse(idx: KmaIndex, pen: Penalties,
                             codes: np.ndarray, n_positions: np.ndarray,
                             header: bytes, exhaustive: bool, Score,
                             extendScore, include,
                             proxi: Optional[Proxi] = None
                             ) -> Optional[AnkerHit]:
    """save_kmers_pseuodeSparse (savekmers.c:2159-2440): forward-only
    save_kmers scoring for "-" DBs; the reconnect SNP uses kmersize*M+MM
    (the rc-branch formula)."""
    k = idx.kmersize
    if len(codes) < k:
        return None
    bestScore, best = _scan_strand(idx, codes, pen, exhaustive, True,
                                   Score, extendScore, include, proxi)
    end = len(codes) + 1 - bestScore
    if k <= bestScore or bestScore * k > end:
        return AnkerHit(codes=codes, n_positions=np.asarray(n_positions,
                                                           np.int32),
                        rc_flag=bestScore,
                        templates=np.asarray(best, np.int32),
                        header=header, flag=0)
    return None


def get_kmers_for_pair_sparse(idx: KmaIndex, codes: np.ndarray,
                              rewards: Penalties, exhaustive: bool, Score,
                              Score_r, extendScore, include
                              ) -> Tuple[int, List[int], List[int]]:
    """get_kmers_for_pair_Sparse (savekmers.c:826-998): combined-strand
    counting into ONE side; extendScore[0] (set by the pair scanners
    between mates) routes mate 2 into the _r arrays."""
    k = idx.kmersize
    if len(codes) < k:
        return 0, [], []
    side2 = bool(extendScore[0])
    extendScore[0] = 0
    Scores = Score_r if side2 else Score
    bests: List[int] = []
    hit_counter = 0
    if idx.prefix_len:
        seqend = len(codes) - k - idx.prefix_len + 1
        n_kmers = 0
        for rc in range(2):
            cur = codes if rc == 0 else rc_codes(codes)
            hc, nk = _count_prefix_strand(idx, cur, Scores, bests,
                                          seqend=seqend)
            hit_counter += hc
            n_kmers += nk
        if hit_counter:
            hit_counter *= (((len(codes) - k + 1) << 1) // n_kmers)
    else:
        seqend = len(codes) - k + 1
        if bool(exhaustive) or _quick_probe(idx, codes):
            hit_counter = _count_runs_sparse(idx, codes, Scores, bests,
                                             seqend)
    if side2:
        return hit_counter, [], bests
    return hit_counter, bests, []


def get_kmers_for_pair_pseudo_sparse(idx: KmaIndex, codes: np.ndarray,
                                     rewards: Penalties, exhaustive: bool,
                                     Score, Score_r, extendScore, include
                                     ) -> Tuple[int, List[int], List[int]]:
    """get_kmers_for_pair_pseoudoSparse (savekmers.c:1000-1252):
    forward-only save_kmers scoring into one side; scores are LEFT in the
    arrays for the pair selectors (cleared there)."""
    k = idx.kmersize
    if len(codes) < k:
        return 0, [], []
    side2 = bool(extendScore[0])
    extendScore[0] = 0
    Scores = Score_r if side2 else Score
    bestScore, best, hit_counter = _scan_strand_keep(
        idx, codes, rewards, exhaustive, Scores, extendScore, include)
    if side2:
        return hit_counter, [], best
    return hit_counter, best, []


def _scan_strand_keep(idx: KmaIndex, codes: np.ndarray, rewards: Penalties,
                      exhaustive: bool, Score, extendScore, include):
    """Forward save_kmers-style scoring that LEAVES Score filled (the pair
    path clears in the selectors), returning (0, bests, hitCounter)."""
    from .scan import _gap_reconnect_mm, _hits_for_codes, _quick_hit, \
        ms_score
    k = idx.kmersize
    mlen = idx.mlen
    M, MM, U, W1 = rewards.M, rewards.MM, rewards.U, rewards.W1
    if not exhaustive and not _quick_hit(idx, codes):
        return 0, [], 0
    pos, voff = _hits_for_codes(idx, codes)
    if len(pos) == 0:
        return 0, [], 0
    bests: List[int] = []
    values = idx.values
    last = -1
    Ms = MMs = Us = W1s = 0
    HIT = 0
    for i in range(len(pos)):
        j, v = int(pos[i]), int(voff[i])
        gaps = j - (int(pos[i - 1]) if i else j) - 1 if i else 0
        if i and v == last:
            if gaps == 0:
                Ms += 1
            elif gaps == k:
                Ms += k
                MMs += 1
            elif k < gaps:
                ms, mms, us, w1s = _gap_reconnect_mm(gaps, k, M, MM, U, W1)
                Ms += ms
                MMs += mms
                Us += us
                W1s += w1s
            elif mlen != k:
                Ms += gaps
                MMs += 1
            else:
                Ms += gaps
                W1s += 1
                Us += (k - gaps)
            HIT = j
        elif i:
            score = Ms * M + MMs * MM + Us * U + W1s * W1
            cnt = int(values[last])
            for t in values[last + 1: last + 1 + cnt].tolist():
                Score[t] += score
                extendScore[t] = HIT
            HIT = j - 1
            cnt = int(values[v])
            for t in values[v + 1: v + 1 + cnt].tolist():
                if include[t]:
                    g = HIT - extendScore[t]
                    if g == 0:
                        s = M
                    elif g == k:
                        s = k * M + MM
                    elif k < g:
                        ms, mms, us, w1s = _gap_reconnect_mm(g, k, M, MM,
                                                             U, W1)
                        s = k * M + ms_score(ms - k, mms, us, w1s,
                                             M, MM, U, W1)
                    elif mlen != k:
                        s = g * M + MM
                    else:
                        s = g * M + (k - g) * U + W1
                    Score[t] += s
                else:
                    Score[t] = k * M
                    include[t] = 1
                    bests.append(t)
            last = v
            HIT = j
            Ms = MMs = Us = W1s = 0
        else:
            cnt = int(values[v])
            for t in values[v + 1: v + 1 + cnt].tolist():
                Score[t] = k * M
                include[t] = 1
                bests.append(t)
            last = v
            HIT = j
    score = Ms * M + MMs * MM + Us * U + W1s * W1
    cnt = int(values[last])
    for t in values[last + 1: last + 1 + cnt].tolist():
        Score[t] += score
    for t in bests:
        extendScore[t] = 0
        include[t] = 0
        if Score[t] < 0:
            Score[t] = 0
    return 0, bests, len(pos)
