"""Seed-chain-extend alignment (reference align.c / chain.c).

Host-exact translation of KMA() (align.c:214), KMA_score (align.c:509),
anker_rc / anker_rc_comp (align.c:780/993), chainSeeds{,_circular}
(chain.c:79/262) and the lead/trail tail alignment (align.c:53-212), built
on the exact NW module.
"""

from __future__ import annotations

import dataclasses
import math
from typing import List, Optional, Tuple

import numpy as np

from .cci import TemplateIndex
from .nw import Aligned, AlnScore, nw_band, nw_full


@dataclasses.dataclass
class Penalty:
    M: int
    MM: int
    U: int
    W1: int
    Wl: int
    d: np.ndarray
    PE: int = 7


class Points:
    """Seed point arrays (AlnPoints, chain.h)."""

    def __init__(self):
        self.qStart: List[int] = []
        self.qEnd: List[int] = []
        self.tStart: List[int] = []
        self.tEnd: List[int] = []
        self.weight: List[int] = []
        self.score: List[int] = []
        self.next: List[int] = []
        self.len = 0

    def clear(self):
        self.qStart.clear()
        self.qEnd.clear()
        self.tStart.clear()
        self.tEnd.clear()
        self.weight.clear()
        self.score.clear()
        self.next.clear()
        self.len = 0

    def add(self, qs, qe, ts, te, w):
        self.qStart.append(qs)
        self.qEnd.append(qe)
        self.tStart.append(ts)
        self.tEnd.append(te)
        self.weight.append(w)

    def trim_to(self, n):
        del self.qStart[n:]
        del self.qEnd[n:]
        del self.tStart[n:]
        del self.tEnd[n:]
        del self.weight[n:]

    def shift_down(self, offset, count):
        """intcpy of the rc seed block to the front (align.c:981-986)."""
        for arr in (self.tStart, self.tEnd, self.qStart, self.qEnd,
                    self.weight):
            arr[:count] = arr[offset: offset + count]
            del arr[count:]


def _mm_split(gap: int, k: int) -> Tuple[int, int]:
    """The Ms/MMs split of a gap (chain.c:119-127 et al.)."""
    Ms = gap
    if Ms == 2:
        return 0, 2
    MMs = Ms // k + (1 if Ms % k else 0)
    MMs = max(2, MMs)
    Ms = min(Ms - MMs, k)
    Ms = min(Ms, MMs)
    return Ms, MMs


def chain_seeds(points: Points, q_len: int, t_len: int, kmersize: int,
                rew: Penalty, circular: bool = False) -> Tuple[int, int]:
    """chainSeeds / chainSeeds_circular (chain.c:79-494).

    Returns (best starting index, mapQ); points.score[best] = bestScore.
    """
    W1, U, M, MM = rew.W1, rew.U, rew.M, rew.MM
    nMems = points.len
    points.score = [0] * (nMems + 1)
    points.next = [0] * (nMems + 1)
    bestPos = nMems - 1
    bestScore = 0
    secondScore = 0

    for i in range(nMems - 1, -1, -1):
        weight = points.weight[i] * M
        points.next[i] = 0
        tEnd = points.tEnd[i]
        qEnd = points.qEnd[i]

        # stop score (chain.c:104-129); note `if(--gap)` fires for gap-1 < 0
        # too (unlike the start penalty's `if(0 < --gap)`)
        gap = min(t_len - tEnd, q_len - qEnd)
        Ms = gap
        gap -= 1
        if gap:
            gap = gap * U + W1
        else:
            gap = W1
        m_, mm_ = _mm_split(Ms, kmersize)
        Ms = m_ * M + mm_ * MM
        score = weight + (gap if Ms < gap else Ms)

        nMin = min(nMems, i + 128)  # 128 = chain bandwidth (chain.c:132)
        for j in range(i + 1, nMin):
            if qEnd < points.qStart[j]:
                tStart_j = points.tStart[j]
                if tEnd < tStart_j:  # full compatibility
                    tGap = tStart_j - tEnd
                    qGap = points.qStart[j] - qEnd
                    g = abs(tGap - qGap)
                    if g:
                        g = (g - 1) * U + W1
                    m_, mm_ = _mm_split(min(tGap, qGap), kmersize)
                    g += weight + points.score[j] + m_ * M + mm_ * MM
                    if score <= g:
                        score = g
                        points.next[i] = j
                elif kmersize <= points.tEnd[j] - tEnd:  # semi compatibility
                    g = points.qStart[j] - qEnd
                    if g:
                        g = (g - 1) * U + W1
                    cut = (tStart_j - tEnd) if not circular else (tStart_j - tEnd)
                    g += weight + points.score[j] - cut * M
                    if score < g:
                        score = g
                        points.next[i] = j
                elif circular and points.tEnd[j] < points.tStart[i]:
                    # circular joining (chain.c:366-395)
                    tGap = t_len - tEnd + tStart_j
                    qGap = points.qStart[j] - qEnd
                    g = abs(tGap - qGap)
                    if g:
                        g = (g - 1) * U + W1
                    m_, mm_ = _mm_split(min(tGap, qGap), kmersize)
                    g += weight + points.score[j] + m_ * M + mm_ * MM
                    if score < g:
                        score = g
                        points.next[i] = j
            elif kmersize <= points.qEnd[j] - qEnd:
                tStart = points.tStart[j] + qEnd - points.qStart[j]
                if tEnd < tStart:
                    g = tStart - tEnd
                    if g:
                        g = (g - 1) * U + W1
                    g += weight + points.score[j] - (tStart - tEnd) * M
                    if circular:
                        if score <= g:
                            score = g
                            points.next[i] = j
                    else:
                        if score < g:
                            score = g
                            points.next[i] = j
                elif circular:
                    if t_len < tStart:
                        tStart -= t_len
                    if tStart != tEnd and points.tEnd[j] < tStart:
                        tGap = t_len - tEnd + tStart
                        g = tGap
                        if g:
                            g = (g - 1) * U + W1
                        g += weight + points.score[j] - (tEnd - tStart) * M
                        if score < g:
                            score = g
                            points.next[i] = j

        # update seed weight (chain.c:206-212)
        if points.next[i]:
            points.weight[i] += points.weight[points.next[i]] - kmersize + 1
        else:
            points.weight[i] -= kmersize - 1
        points.score[i] = score

        # penalize start (chain.c:214-241)
        gap = min(points.tStart[i], points.qStart[i])
        Ms = gap
        gap -= 1
        if 0 < gap:
            gap = gap * U + W1
        elif gap == 0:
            gap = W1
        else:
            gap = 0
        m_, mm_ = _mm_split(Ms, kmersize)
        Ms = m_ * M + mm_ * MM
        score += gap if Ms < gap else Ms

        if bestScore <= score:
            if points.next[i] != bestPos:
                secondScore = bestScore
            bestScore = score
            bestPos = i
        elif secondScore <= score and points.next[i] != bestPos:
            secondScore = bestScore

    if 0 < bestScore:
        mapQ = math.ceil(40 * (1 - 1.0 * secondScore / bestScore)
                         * min(1, points.weight[bestPos] / 10.0)
                         * math.log(bestScore))
    else:
        mapQ = 0
    points.score[bestPos] = bestScore
    return bestPos, mapQ


def trim_seeds(points: Points, start: int, ts: int, no_lead: bool = False):
    """trimSeeds / trimSeedsNoLead (chain.c:496-566)."""
    if not ts:
        return
    if no_lead or not points.qStart[start]:
        start = points.next[start]
        while start:
            ln = points.qEnd[start] - points.qStart[start]
            if ln < ts:
                ln -= 1
                points.tStart[start] += ln
                points.qStart[start] += ln
            else:
                points.tStart[start] += ts
                points.qStart[start] += ts
            start = points.next[start]
    else:
        while True:
            ln = points.qEnd[start] - points.qStart[start]
            if ln < ts:
                ln -= 1
                points.tStart[start] += ln
                points.qStart[start] += ln
            else:
                points.tStart[start] += ts
                points.qStart[start] += ts
            start = points.next[start]
            if not start:
                break


def _collect_seeds_bytes(tindex: TemplateIndex, qseq: np.ndarray, q_len: int,
                         q_start: int, q_end: int, points: Points,
                         lo: int, hi: int, bounded: bool,
                         score_mode: bool = False) -> int:
    """Seed scan over byte codes (KMA seeding, align.c:244-377, and the
    anker_rc per-strand scan align.c:823-957 when score_mode).

    Returns the anker score (score_mode) or 0.
    """
    k = tindex.kmerindex
    t_len = tindex.len
    tcodes = tindex.codes
    score_r = 0
    i = q_start
    while i < q_end:
        end = q_end
        nxt = np.flatnonzero(qseq[i:q_len] == 4)
        if len(nxt):
            end = i + int(nxt[0])
        if end > q_end and not score_mode:
            pass
        if not score_mode:
            # KMA: charpos over q_len then clamp to q_end on miss
            end_c = i + int(nxt[0]) if len(nxt) else -1
            end = end_c if end_c != -1 else q_end
        else:
            end_c = i + int(nxt[0]) if len(nxt) else -1
            end = end_c if end_c != -1 else q_end

        if i < end - k:
            key = 0
            for b in qseq[i: i + k - 1].tolist():
                key = (key << 2) | int(b)
            i += k - 1
        else:
            i = end + 1
            continue

        mask = (1 << (2 * k)) - 1
        while i < end:
            key = ((key << 2) | int(qseq[i])) & mask
            value = (tindex.get_bound(key, lo, hi) if bounded
                     else tindex.get(key))
            if value == 0:
                i += 1
            elif 0 < value:
                i -= k - 1
                prev = value - 2
                j = i - 1
                while 0 <= j and 0 <= prev and qseq[j] == tcodes[prev]:
                    j -= 1
                    prev -= 1
                    if score_mode:
                        score_r += 1
                points.add(j + 1, 0, prev + 2, 0, 0)
                value += k - 1
                i += k
                if score_mode:
                    score_r += k
                while i < end and value < t_len and qseq[i] == tcodes[value]:
                    i += 1
                    value += 1
                    if score_mode:
                        score_r += 1
                idx = len(points.qStart) - 1
                points.qEnd[idx] = i
                points.tEnd[idx] = value + 1
                if score_mode:
                    points.weight[idx] = points.tEnd[idx] - points.tStart[idx]
                else:
                    points.weight[idx] = i - points.qStart[idx]
                if i < end - k:
                    key = 0
                    for b in qseq[i: i + k - 1].tolist():
                        key = (key << 2) | int(b)
                    i += k - 1
                else:
                    i = end + 1
            else:
                i -= k - 1
                if score_mode:
                    score_r += k
                bias = i
                for value in tindex.dub_positions(key).tolist():
                    kk = i
                    prev = value - 2
                    j = kk - 1
                    while 0 <= j and 0 <= prev and qseq[j] == tcodes[prev]:
                        j -= 1
                        prev -= 1
                    points.add(j + 1, 0, prev + 2, 0, 0)
                    value += k - 1
                    kk += k
                    while kk < end and value < t_len and qseq[kk] == tcodes[value]:
                        kk += 1
                        value += 1
                    idx = len(points.qStart) - 1
                    points.qEnd[idx] = kk
                    points.tEnd[idx] = value + 1
                    points.weight[idx] = kk - points.qStart[idx]
                    if bias < kk:
                        bias = kk
                if score_mode:
                    score_r += bias - i
                i = bias + 1
                if i < end - k:
                    key = 0
                    for b in qseq[i: i + k - 1].tolist():
                        key = (key << 2) | int(b)
                    i += k - 1
                else:
                    i = end + 1
        i = end + 1
    return score_r


def _collect_seeds_comp(tindex: TemplateIndex, qseq: np.ndarray,
                        n_positions: np.ndarray, q_len: int, q_start: int,
                        q_end: int, points: Points) -> None:
    """KMA_score seed scan over compressed k-mer windows (align.c:529-639).

    The segment ends come from the read's N-position list with q_len
    appended; the LAST segment end is q_end-k+1 (align.c:536-540).
    """
    k = tindex.kmerindex
    t_len = tindex.len
    tcodes = tindex.codes
    from ..io.seq import kmer_scan
    kmers = kmer_scan(qseq, k)
    segs = [int(x) for x in n_positions] + [q_len]
    j = q_start
    for si, seg_end in enumerate(segs):
        if si != len(segs) - 1:
            end = seg_end - k + 1
        else:
            end = q_end - k + 1
        while j < end:
            key = int(kmers[j]) if j < len(kmers) else 0
            value = tindex.get(key)
            if value == 0:
                j += 1
            elif 0 < value:
                prev = value - 2
                kk = j - 1
                while 0 <= kk and 0 <= prev and qseq[kk] == tcodes[prev]:
                    kk -= 1
                    prev -= 1
                points.add(kk + 1, 0, prev + 2, 0, 0)
                value += k - 1
                j += k
                ext_end = end + (k - 1)
                while j < ext_end and value < t_len and qseq[j] == tcodes[value]:
                    j += 1
                    value += 1
                idx = len(points.qStart) - 1
                points.qEnd[idx] = j
                points.tEnd[idx] = value + 1
                points.weight[idx] = j - points.qStart[idx]
            else:
                bias = j
                for value in tindex.dub_positions(key).tolist():
                    ll = j
                    prev = value - 2
                    kk = ll - 1
                    while 0 <= kk and 0 <= prev and qseq[kk] == tcodes[prev]:
                        kk -= 1
                        prev -= 1
                    points.add(kk + 1, 0, prev + 2, 0, 0)
                    value += k - 1
                    ll += k
                    ext_end = end + (k - 1)
                    while ll < ext_end and value < t_len and qseq[ll] == tcodes[value]:
                        ll += 1
                        value += 1
                    idx = len(points.qStart) - 1
                    points.qEnd[idx] = ll
                    points.tEnd[idx] = value + 1
                    points.weight[idx] = ll - points.qStart[idx]
                    if bias < ll:
                        bias = ll
                j = bias + 1
        j = seg_end + 1


BANDWIDTH = 64  # align.c:216


def lead_tail_aln(aligned: Optional[Aligned], tindex: TemplateIndex,
                  qseq: np.ndarray, t_e: int, t_len: int, q_e: int,
                  rew: Penalty, skip: bool) -> AlnScore:
    """leadTailAln / skipLeadAln (align.c:34-131)."""
    st = AlnScore(pos=t_e)
    if skip:
        if aligned is not None:
            aligned.start = q_e
        return st
    if not q_e:
        return st
    t_s = 0
    q_s = 0
    bw = BANDWIDTH
    if (q_e << 1) < t_e or (q_e + bw) < t_e:
        t_s = t_e - (q_e + (q_e if q_e < bw else bw))
    elif (t_e << 1) < q_e or (t_e + bw) < q_e:
        q_s = q_e - (t_e + (t_e if t_e < bw else bw))

    if t_e - t_s > 0 and q_e - q_s > 0:
        band = abs(t_e - t_s - q_e + q_s) + bw
        frag = Aligned(pos=t_len) if aligned is not None else None
        k = -1 - (1 if t_s == 0 else 0)
        if q_e - q_s <= band or t_e - t_s <= band:
            nw = nw_full(tindex.codes, qseq, k, t_s, t_e, q_s, q_e, rew.d,
                         rew.W1, rew.U, rew.MM, t_len, aligned=frag)
        else:
            nw = nw_band(tindex.codes, qseq, k, t_s, t_e, q_s, q_e, band,
                         rew.d, rew.W1, rew.U, rew.MM, t_len, aligned=frag)
        if frag is not None:
            # trim leading dual-gaps (align.c:96-113)
            bias = 0
            if t_s == 0:
                while bias < nw.len and (frag.t[bias] == 5 or frag.q[bias] == 5):
                    if frag.t[bias] == 5:
                        nw.tGaps -= 1
                        frag.start += 1
                    else:
                        nw.qGaps -= 1
                    bias += 1
                nw.len -= bias
            aligned.t = frag.t[bias: bias + nw.len].copy()
            aligned.s = frag.s[bias: bias + nw.len].copy()
            aligned.q = frag.q[bias: bias + nw.len].copy()
            aligned.start = q_s + frag.start
        st.pos -= (nw.len - nw.tGaps)
        st.score = nw.score
        st.len = nw.len
        st.match = nw.match
        st.tGaps = nw.tGaps
        st.qGaps = nw.qGaps
    elif aligned is not None:
        aligned.start = q_s
    return st


def trail_tail_aln(aligned: Optional[Aligned], st: AlnScore,
                   tindex: TemplateIndex, qseq: np.ndarray, t_s: int,
                   t_len: int, q_s: int, q_len: int, rew: Penalty,
                   skip: bool) -> None:
    """trailTailAln / skipTrailAln (align.c:133-212)."""
    if skip:
        if aligned is not None:
            aligned.end = q_len - q_s
        return
    q_e = q_len
    t_e = t_len
    bw = BANDWIDTH
    if ((q_len - q_s) << 1) < (t_len - t_s) or (q_len - q_s + bw) < (t_len - t_s):
        te = q_len - q_s
        t_e = t_s + (te + (te if te < bw else bw))
    elif ((t_len - t_s) << 1) < (q_len - q_s) or (t_len - t_s + bw) < (q_len - q_s):
        qe = t_len - t_s
        q_e = q_s + (qe + (qe if qe < bw else bw))

    frag_end = 0
    if t_e - t_s > 0 and q_e - q_s > 0:
        band = abs(t_e - t_s - q_e + q_s) + bw
        frag = Aligned(pos=t_len) if aligned is not None else None
        k = 1 + (1 if t_e == t_len else 0)
        if q_e - q_s <= band or t_e - t_s <= band:
            nw = nw_full(tindex.codes, qseq, k, t_s, t_e, q_s, q_e, rew.d,
                         rew.W1, rew.U, rew.MM, t_len, aligned=frag)
        else:
            nw = nw_band(tindex.codes, qseq, k, t_s, t_e, q_s, q_e, band,
                         rew.d, rew.W1, rew.U, rew.MM, t_len, aligned=frag)
        if frag is not None:
            # trim trailing dual-gaps (align.c:175-193)
            if t_e == t_len:
                bias = nw.len - 1
                while bias and (frag.t[bias] == 5 or frag.q[bias] == 5):
                    if frag.t[bias] == 5:
                        nw.tGaps -= 1
                        frag.end += 1
                    else:
                        nw.qGaps -= 1
                    bias -= 1
                bias += 1
                if bias != nw.len:
                    nw.len = bias
            aligned.t = np.concatenate((aligned.t, frag.t[: nw.len]))
            aligned.s = np.concatenate((aligned.s, frag.s[: nw.len]))
            aligned.q = np.concatenate((aligned.q, frag.q[: nw.len]))
            frag_end = frag.end
        st.score += nw.score
        st.len += nw.len
        st.match += nw.match
        st.tGaps += nw.tGaps
        st.qGaps += nw.qGaps
    if aligned is not None:
        aligned.end = q_len - q_e + frag_end


def kma_align(tindex: TemplateIndex, qseq: np.ndarray, q_len: int,
              q_start: int, q_end: int, lo: int, hi: int, mq: int,
              rew: Penalty, points: Points, kmersize_unused: int,
              traceback: bool, n_positions: Optional[np.ndarray] = None,
              circular: bool = False, ts: int = 0,
              skip_tails: bool = False) -> Tuple[AlnScore, Optional[Aligned], int]:
    """KMA() / KMA_score (align.c:214-507 / 509-748).

    traceback=True follows KMA() (byte-scan seeding with t-range bounds and
    alignment emission); traceback=False follows KMA_score (compressed-window
    seeding, score only).  Returns (stat, aligned, mapQ).
    """
    from . import native_aln
    if native_aln.get_lib() is not None:
        return native_aln.kma_align(tindex, qseq, q_len, q_start, q_end,
                                    lo, hi, mq, rew, points, traceback,
                                    n_positions, circular, ts, skip_tails)
    t_len = tindex.len
    aligned = Aligned(pos=t_len) if traceback else None
    if traceback:
        aligned.t = np.empty(0, np.uint8)
        aligned.s = np.empty(0, np.uint8)
        aligned.q = np.empty(0, np.uint8)
        # circular, skip boundaries (align.c:237-240)
        if lo < hi:
            lo, hi = 0, t_len
        aligned.start = 0
        aligned.end = 0

    if not points.len:
        points.clear()
        if traceback:
            _collect_seeds_bytes(tindex, qseq, q_len, q_start, q_end, points,
                                 lo, hi, bounded=True)
        else:
            _collect_seeds_comp(tindex, qseq, n_positions, q_len, q_start,
                                q_end, points)
        points.len = len(points.qStart)

    if not points.len:
        st = AlnScore(score=0, len=1)
        if traceback:
            aligned.s = np.empty(0, np.uint8)
            aligned.t = np.empty(0, np.uint8)
            aligned.q = np.empty(0, np.uint8)
        points.len = 0
        return st, aligned, 0

    start, mapQ = chain_seeds(points, q_len, t_len, tindex.kmerindex, rew,
                              circular=circular)
    if aligned is not None:
        aligned.mapQ = mapQ
    score = points.score[start]
    if mapQ < mq or score < tindex.kmerindex:
        st = AlnScore(score=0, len=1)
        if traceback:
            aligned.s = np.empty(0, np.uint8)
            aligned.t = np.empty(0, np.uint8)
            aligned.q = np.empty(0, np.uint8)
        points.len = 0
        return st, aligned, mapQ

    trim_seeds(points, start, ts)

    st = lead_tail_aln(aligned, tindex, qseq, points.tStart[start] - 1,
                       t_len, points.qStart[start], rew, skip_tails)
    U, M, d = rew.U, rew.M, rew.d

    while True:
        q_s = points.qStart[start]
        seg = points.qEnd[start] - q_s
        if traceback:
            piece = qseq[q_s: points.qEnd[start]]
            aligned.t = np.concatenate((aligned.t, piece))
            aligned.s = np.concatenate((aligned.s,
                                        np.full(seg, ord("|"), np.uint8)))
            aligned.q = np.concatenate((aligned.q, piece))
        st.len += seg
        st.match += seg
        for i in range(q_s, points.qEnd[start]):
            nuc = int(qseq[i])
            st.score += int(d[nuc, nuc])

        if points.next[start]:
            q_s = points.qEnd[start]
            t_s = points.tEnd[start] - 1
            start = points.next[start]
            if points.qStart[start] < q_s:
                points.tStart[start] += q_s - points.qStart[start]
                points.qStart[start] = q_s
            t_e = points.tStart[start] - 1
            circular_join = False
            if t_e < t_s:
                if t_s <= points.tEnd[start]:
                    points.qStart[start] += t_s - t_e
                    t_e = t_s
                    t_l = t_e - t_s
                else:
                    circular_join = True
                    t_l = t_len - t_s + t_e
            else:
                t_l = t_e - t_s
            q_e = points.qStart[start]

            if (abs(t_l - q_e + q_s) * U > q_len * M or t_l > q_len
                    or q_e - q_s > (q_len >> 1)):
                stf = AlnScore(score=0, len=1)
                if traceback:
                    aligned.s = np.empty(0, np.uint8)
                    aligned.t = np.empty(0, np.uint8)
                    aligned.q = np.empty(0, np.uint8)
                points.len = 0
                return stf, aligned, mapQ
            if t_l > 0 or q_e - q_s > 0:
                band = abs(t_l - q_e + q_s) + BANDWIDTH
                frag = Aligned(pos=t_len) if traceback else None
                if q_e - q_s <= band or t_l <= band:
                    nw = nw_full(tindex.codes, qseq, 0, t_s, t_e, q_s, q_e,
                                 d, rew.W1, U, rew.MM, t_len, aligned=frag)
                else:
                    nw = nw_band(tindex.codes, qseq, 0, t_s, t_e, q_s, q_e,
                                 band, d, rew.W1, U, rew.MM, t_len,
                                 aligned=frag)
                if traceback:
                    aligned.t = np.concatenate((aligned.t, frag.t[: nw.len]))
                    aligned.s = np.concatenate((aligned.s, frag.s[: nw.len]))
                    aligned.q = np.concatenate((aligned.q, frag.q[: nw.len]))
                st.score += nw.score
                st.len += nw.len
                st.match += nw.match
                st.tGaps += nw.tGaps
                st.qGaps += nw.qGaps
        else:
            break

    trail_tail_aln(aligned, st, tindex, qseq, points.tEnd[start] - 1, t_len,
                   points.qEnd[start], q_len, rew, skip_tails)
    points.len = 0
    return st, aligned, mapQ


def anker_rc_comp(tindex: TemplateIndex, qseq: np.ndarray,
                  qseq_r: np.ndarray, n_pos_f: np.ndarray,
                  n_pos_r: np.ndarray, q_len: int, q_start: int, q_end: int,
                  points: Points, one2one: int) -> int:
    """anker_rc_comp (align.c:993-1176): score both strands, keep the
    winner's seeds in points.  Returns +score (fw), -score (rc) or 0."""
    from ..io.seq import kmer_scan
    k = tindex.kmerindex
    t_len = tindex.len
    tcodes = tindex.codes
    from . import native_aln
    if native_aln.get_lib() is not None:
        return native_aln.anker_rc_comp(tindex, qseq, qseq_r, n_pos_f,
                                        n_pos_r, q_len, q_start, q_end,
                                        points, one2one)
    points.clear()

    bestScore = 0
    score = 0
    mem_count = 0
    fw_count = 0
    for rc in range(2):
        if rc:
            cur, npos = qseq_r, n_pos_r
            score = score_r
            fw_count = mem_count
            i = q_len - q_start
            q_start_c, q_end_c = q_len - q_end, i
            i = q_start_c
        else:
            cur, npos = qseq, n_pos_f
            q_start_c, q_end_c = q_start, q_end
            if q_start_c:
                i = q_start_c
            else:
                i = _preseed(tindex, cur, q_end_c - q_start_c)
        score_r = 0
        mem_count = 0
        kmers = kmer_scan(cur, k)
        segs = [int(x) for x in npos] + [q_len]
        si = 0
        while i < q_end_c and si < len(segs):
            seg_end = segs[si]
            si += 1
            end = seg_end - k + 1
            while i < end:
                key = int(kmers[i]) if 0 <= i < len(kmers) else 0
                value = tindex.get(key)
                if value == 0:
                    i += 1
                elif 0 < value:
                    prev = value - 2
                    j = i - 1
                    while 0 <= j and 0 <= prev and cur[j] == tcodes[prev]:
                        j -= 1
                        prev -= 1
                        score_r += 1
                    points.add(j + 1, 0, prev + 2, 0, 0)
                    value += k - 1
                    i += k
                    score_r += k
                    while i < end and value < t_len and cur[i] == tcodes[value]:
                        i += 1
                        value += 1
                        score_r += 1
                    idx = len(points.qStart) - 1
                    points.qEnd[idx] = i
                    points.tEnd[idx] = value + 1
                    points.weight[idx] = points.tEnd[idx] - points.tStart[idx]
                    mem_count += 1
                    i += 1
                else:
                    score_r += k
                    bias = i
                    for value in tindex.dub_positions(key).tolist():
                        kk = i
                        prev = value - 2
                        j = kk - 1
                        while 0 <= j and 0 <= prev and cur[j] == tcodes[prev]:
                            j -= 1
                            prev -= 1
                        points.add(j + 1, 0, prev + 2, 0, 0)
                        value += k - 1
                        kk += k
                        while kk < end and value < t_len and cur[kk] == tcodes[value]:
                            kk += 1
                            value += 1
                        idx = len(points.qStart) - 1
                        points.qEnd[idx] = kk
                        points.tEnd[idx] = value + 1
                        points.weight[idx] = kk - points.qStart[idx]
                        mem_count += 1
                        if bias < kk:
                            bias = kk
                    score_r += bias - i
                    i = bias + 1
            i = end + k
        if bestScore < score_r:
            bestScore = score_r

    if (one2one and bestScore < k
            and bestScore * k < (q_len - k - bestScore)):
        points.clear()
        points.len = 0
        return 0
    if bestScore == score:
        points.trim_to(fw_count)
        points.len = fw_count
        return bestScore
    points.shift_down(fw_count, mem_count)
    points.len = mem_count
    return -bestScore


def anker_rc_bytes(tindex: TemplateIndex, qseq: np.ndarray,
                   qseq_r: np.ndarray, q_len: int, q_start: int, q_end: int,
                   points: Points, one2one: int) -> int:
    """anker_rc (align.c:780-991) — the BYTE variant used by assembly and
    Mt1 for score-0 fragments.  It genuinely differs from anker_rc_comp:
    seed extension runs to the FULL N-free segment end (align.c:862 vs
    1070), the scan resumes at the extension end without the comp
    variant's one-char skip, and a segment is entered only when the scan
    head is strictly below end-kmersize (align.c:829).
    Returns +score (fw kept), -score (rc kept) or 0."""
    from ..io.seq import kmer_scan
    k = tindex.kmerindex
    t_len = tindex.len
    tcodes = tindex.codes
    from . import native_aln
    if native_aln.get_lib() is not None:
        return native_aln.anker_rc_bytes(tindex, qseq, qseq_r, q_len,
                                         q_start, q_end, points, one2one)
    points.clear()

    bestScore = 0
    score = 0
    score_r = 0
    mem_count = 0
    fw_count = 0
    for rc in range(2):
        if rc:
            cur = qseq_r
            score = score_r
            fw_count = mem_count
            i = q_len - q_start
            q_start_c, q_end_c = q_len - q_end, i
            i = q_start_c
        else:
            cur = qseq
            q_start_c, q_end_c = q_start, q_end
            if q_start_c:
                i = q_start_c
            else:
                i = _preseed(tindex, cur, q_end_c - q_start_c)
        score_r = 0
        mem_count = 0
        kmers = kmer_scan(cur, k) if q_len >= k else \
            np.empty(0, dtype=np.uint64)
        npos = np.flatnonzero(cur == 4)
        while i < q_end_c:
            # charpos(qseq, 4, i, q_len): the bound is q_len, so an N
            # beyond q_end still terminates the segment there
            ni = np.searchsorted(npos, i)
            end = int(npos[ni]) if ni < len(npos) else q_end_c
            if i < end - k:
                pos = i + k - 1
                while pos < end:
                    s = pos - k + 1
                    value = tindex.get(int(kmers[s]))
                    if value == 0:
                        pos += 1
                    elif 0 < value:
                        prev = value - 2
                        j = s - 1
                        while 0 <= j and 0 <= prev and cur[j] == tcodes[prev]:
                            j -= 1
                            prev -= 1
                            score_r += 1
                        points.add(j + 1, 0, prev + 2, 0, 0)
                        value += k - 1
                        p2 = s + k
                        score_r += k
                        while p2 < end and value < t_len \
                                and cur[p2] == tcodes[value]:
                            p2 += 1
                            value += 1
                            score_r += 1
                        idx = len(points.qStart) - 1
                        points.qEnd[idx] = p2
                        points.tEnd[idx] = value + 1
                        points.weight[idx] = (points.tEnd[idx]
                                              - points.tStart[idx])
                        mem_count += 1
                        if p2 < end - k:
                            pos = p2 + k - 1
                        else:
                            pos = end
                    else:
                        score_r += k
                        bias = s
                        for value in tindex.dub_positions(
                                int(kmers[s])).tolist():
                            kk = s
                            prev = value - 2
                            j = kk - 1
                            while 0 <= j and 0 <= prev \
                                    and cur[j] == tcodes[prev]:
                                j -= 1
                                prev -= 1
                            points.add(j + 1, 0, prev + 2, 0, 0)
                            value += k - 1
                            kk += k
                            while kk < end and value < t_len \
                                    and cur[kk] == tcodes[value]:
                                kk += 1
                                value += 1
                            idx = len(points.qStart) - 1
                            points.qEnd[idx] = kk
                            points.tEnd[idx] = value + 1
                            points.weight[idx] = kk - points.qStart[idx]
                            mem_count += 1
                            if bias < kk:
                                bias = kk
                        score_r += bias - s
                        nx = bias + 1
                        if nx < end - k:
                            pos = nx + k - 1
                        else:
                            pos = end
            i = end + 1
        if bestScore < score_r:
            bestScore = score_r

    if (one2one and bestScore < k
            and bestScore * k < (q_len - k - bestScore)):
        points.clear()
        points.len = 0
        return 0
    if bestScore == score:
        points.trim_to(fw_count)
        points.len = fw_count
        return bestScore
    points.shift_down(fw_count, mem_count)
    points.len = mem_count
    return -bestScore


_preseed_exhaustive = [0]


def set_preseed_exhaustive(val: int):
    """preseed static init (align.c:750-758, called from kma.c:1249)."""
    _preseed_exhaustive[0] = val
    from . import native_aln
    lib = native_aln.get_lib()
    if lib is not None:
        lib.kaln_set_exhaustive(val)


def _preseed(tindex: TemplateIndex, qseq: np.ndarray, q_len: int) -> int:
    """preseed (align.c:750-770): stride-k probe; q_len on total miss."""
    if _preseed_exhaustive[0]:
        return 0
    k = tindex.kmerindex
    i = 0
    while i < q_len:
        key = 0
        ok = True
        for b in qseq[i: i + k].tolist():
            if b > 3:
                ok = False
                break
            key = (key << 2) | int(b)
        if ok and len(qseq) - i >= k and tindex.get_bound(key, 0, tindex.len):
            return 0
        i += k
    return i
