"""Default-mode chain scanner (save_kmers_chain, savekmers.c:5127-5944).

Both strands are segmented into "ankers" (runs of hits sharing a value
list, closed on gaps other than exact-match/SNP spacing); per-template
chains over the anker sequence are scored with the gap-classification
heuristic (kmeranker.c), the best chain's template set is rebuilt by a
backward walk (getBestChainTemplates), a segment tree masks claimed query
regions, and the scan iterates so one long/chimeric read can emit several
anker records ("splicing").  Query bounds ride in the header tail
(insertKmerBound, qseqs.c:41).
"""

from __future__ import annotations

import struct
from typing import List, Optional, Tuple

import numpy as np

from ..config import Penalties
from ..index.format import KmaIndex
from ..io.seq import rc_codes
from .scan import AnkerHit, lookup_voff, _quick_hit


class Anker:
    __slots__ = ("start", "end", "weight", "voff", "score", "score_len",
                 "len_len", "alive")

    def __init__(self):
        self.start = 0
        self.end = 0
        self.weight = 0
        self.voff = -1
        self.score = 0
        self.score_len = 0.0
        self.len_len = 1
        self.alive = True


def _collect_ankers(idx: KmaIndex, codes: np.ndarray, rc_strand: bool,
                    rewards: Penalties, exhaustive: bool) -> List[Anker]:
    """Anker collection for one strand (savekmers.c:5221-5454).

    Reference-shaped segment scan: the rc strand is segmented by the
    FORWARD N positions and, after every N crossing, resets its window
    offset to seqlen - j instead of seqlen - k - j (savekmers.c:5443) --
    later rc windows read k-1 positions past their nominal span including
    the 2-bit zero padding past the sequence end.  The quirk is
    observable in chain scores of N-containing reads and is kept for
    byte parity.  cmer DBs keep the symmetric scan (no native quirk port
    for the minimizer state machines)."""
    k = idx.kmersize
    M, MM = rewards.M, rewards.MM
    cur = rc_codes(codes) if rc_strand else codes
    if not exhaustive and not _quick_hit(idx, cur):
        return []
    seqlen = len(codes)
    W = seqlen - k + 1
    if idx.flag & 3:
        return _collect_ankers_sym(idx, codes, cur, rc_strand, rewards)

    strand = cur
    sN = np.flatnonzero(strand == 4)
    if rc_strand:
        aN = sorted((seqlen - 1 - int(p)) for p in sN)
    else:
        aN = [int(p) for p in sN]
    aN.append(seqlen)

    ankers: List[Anker] = []
    last = -1
    gaps = 0
    Ms = MMs = 0
    cur_anker: Optional[Anker] = None
    j = 0
    first_seg = True
    kroll = (1 << (2 * k)) - 1
    for ni in aN:
        if j >= W:
            break
        end = ni - k + 1
        key = 0
        inited = False
        while j < end:
            if not inited:
                if rc_strand:
                    wpos = (seqlen - k - j) if first_seg else (seqlen - j)
                    key = 0
                    for t in range(k):
                        p = wpos + t
                        # reference qseq_r stores N as complement of the
                        # packed 0 = 'T' (rc_comp, compdna.c:229-251);
                        # past seqlen the shifted padding reads 'A'
                        c = int(strand[p]) if 0 <= p < seqlen else 0
                        key = (key << 2) | (3 if c > 3 else c)
                else:
                    key = 0
                    for t in range(k):
                        key = (key << 2) | (int(strand[j + t]) & 3)
                    key &= kroll
                inited = True
            elif rc_strand:
                wpos = (seqlen - k - j) if first_seg else (seqlen - j)
                c = int(strand[wpos]) if 0 <= wpos < seqlen else 0
                key = ((3 if c > 3 else c) << (2 * (k - 1))) | (key >> 2)
            else:
                c = int(strand[j + k - 1])
                key = ((key << 2) | (c & 3)) & kroll
            v = lookup_voff(idx, key)
            if v >= 0:
                if v == last and cur_anker is not None:
                    if gaps == 0:
                        Ms += 1
                    elif gaps == k:
                        Ms += k
                        MMs += 1
                    else:
                        cur_anker.weight = Ms * M + MMs * MM
                        cur_anker.end = j - gaps + k
                        cur_anker = Anker()
                        cur_anker.start = j
                        cur_anker.voff = v
                        ankers.append(cur_anker)
                        Ms, MMs = k, 0
                else:
                    if cur_anker is not None:
                        cur_anker.weight = Ms * M + MMs * MM
                        cur_anker.end = j - gaps + k
                    cur_anker = Anker()
                    cur_anker.start = j
                    cur_anker.voff = v
                    ankers.append(cur_anker)
                    last = v
                    Ms, MMs = k, 0
                gaps = 0
            else:
                gaps += 1
            j += 1
        gaps += ni + 1 - j
        j = ni + 1
        if rc_strand:
            first_seg = False
    if cur_anker is not None:
        cur_anker.weight = Ms * M + MMs * MM
        cur_anker.end = seqlen - gaps
    return ankers


def _collect_ankers_sym(idx: KmaIndex, codes: np.ndarray, cur: np.ndarray,
                        rc_strand: bool, rewards: Penalties) -> List[Anker]:
    """The pre-quirk symmetric scan, kept for cmer DBs (no reference
    quirk port for the minimizer/HC window state machines)."""
    k = idx.kmersize
    M, MM = rewards.M, rewards.MM
    from ..io.seq import valid_kmer_mask
    from .scan import scan_keys
    kmers = scan_keys(idx, cur)
    valid = valid_kmer_mask(cur, k)
    seqlen = len(codes)
    W = seqlen - k + 1

    ankers: List[Anker] = []
    last = -1
    last_hit_j = 0
    gaps = 0
    Ms = MMs = 0
    cur_anker: Optional[Anker] = None

    def km_at(j):
        p = (seqlen - k - j) if rc_strand else j
        return (int(kmers[p]), bool(valid[p]))

    for j in range(W):
        km, ok = km_at(j)
        v = lookup_voff(idx, km) if ok else -1
        if v >= 0:
            last_hit_j = j
            if v == last and cur_anker is not None:
                if gaps == 0:
                    Ms += 1
                elif gaps == k:
                    Ms += k
                    MMs += 1
                else:
                    cur_anker.weight = Ms * M + MMs * MM
                    cur_anker.end = j - gaps + k
                    cur_anker = Anker()
                    cur_anker.start = j
                    cur_anker.voff = v
                    ankers.append(cur_anker)
                    Ms, MMs = k, 0
            else:
                if cur_anker is not None:
                    cur_anker.weight = Ms * M + MMs * MM
                    cur_anker.end = j - gaps + k
                cur_anker = Anker()
                cur_anker.start = j
                cur_anker.voff = v
                ankers.append(cur_anker)
                last = v
                Ms, MMs = k, 0
            gaps = 0
        else:
            gaps += 1
    if cur_anker is not None:
        cur_anker.weight = Ms * M + MMs * MM
        if rc_strand:
            cur_anker.end = seqlen - (gaps + k)
        else:
            cur_anker.end = seqlen - _tail_gaps(cur, k, last_hit_j,
                                                False, seqlen)
    return ankers


def _tail_gaps(cur: np.ndarray, k: int, last_hit_j: int, rc_strand: bool,
               seqlen: int) -> int:
    """Replay savekmers.c:5252-5330's gap bookkeeping from the last hit
    to the scan end, in the STRAND's own coordinates."""
    # strand coordinate of the last hit window
    w = (seqlen - k - last_hit_j) if rc_strand else last_hit_j
    strand = cur  # `cur` is already this strand's codes
    nbounds = [int(x) for x in np.flatnonzero(strand == 4) if int(x) > w] \
        + [seqlen]
    seqend = seqlen - k + 1
    g = 0
    j = w + 1
    for endN in nbounds:
        while j + k - 1 < endN:
            g += 1
            j += 1
        g += endN + 1 - j
        j = endN + 1
        # the outer for re-checks j < seqend only when ADVANCING to the
        # next segment (savekmers.c:5255), after the current jump
        if j >= seqend:
            break
    return g


def _chain_pass(idx: KmaIndex, ankers: List[Anker], q_len: int,
                template_lengths, rewards: Penalties, Score, extendScore,
                include, lc: bool, best_state) -> None:
    """Per-strand chain scoring (savekmers.c:5488-5634).

    best_state = [best_anker, ties, best_anker_len, ties_len] mutated in
    place; the FIRST anker of the strand is the initial best (aliased, so
    its self-comparison bumps the tie counter exactly like the reference).
    """
    k = idx.kmersize
    mlen = idx.mlen
    M, MM, U, W1, Wl = (rewards.M, rewards.MM, rewards.U, rewards.W1,
                        rewards.Wl)
    values = idx.values
    bests: List[int] = []
    for a in ankers:
        a.score = 0
        a.score_len = 0.0
        a.len_len = 1
        vo = a.voff
        cnt = int(values[vo])
        # reference walks the list tail-first (savekmers.c:5501-5511)
        for t in values[vo + cnt: vo: -1].tolist():
            score = int(Score[t])
            pos = int(extendScore[t])
            gaps = a.start - pos
            if not include[t]:
                include[t] = 1
                bests.append(t)
                if a.start:
                    s = W1 + (a.start - 1) * U
                    score = a.weight + max(Wl, s)
                else:
                    score = a.weight
            else:
                if gaps == -k:
                    score += a.weight - (k - 1) * M
                elif gaps == 0:
                    score += a.weight + MM
                elif 0 < gaps:
                    if gaps <= 2:
                        MMs, Ms = gaps, 0
                    else:
                        MMs = max(2, gaps // k + (1 if gaps % k else 0))
                        Ms = min(min(gaps - MMs, k), MMs)
                    if (W1 + (gaps - 1) * U) <= (MMs * MM + Ms * M):
                        score += a.weight + Ms * M + MMs * MM
                    else:
                        score += a.weight + (W1 + (gaps - 1) * U)
                elif mlen != k:
                    score += a.weight + gaps * M + MM
                else:
                    score += a.weight + gaps * M - (gaps + 1) * U + W1
                if score < 0:
                    test = (W1 + (a.start - 1) * U) if a.start else 0
                    test = max(test, Wl)
                    if score < test + a.weight:
                        score = test + a.weight
            if a.score < score:
                a.score = score
            len_len = int(template_lengths[t])
            if q_len < len_len:
                len_len = q_len
            score_len = float(score)
            if a.len_len != len_len:
                if len_len == 0:
                    # deCon: template_lengths[contamination] is the
                    # reference's out-of-bounds 0; C double division
                    # yields inf/nan, comparisons below then fail
                    score_len = (float("nan") if score == 0 else
                                 float("inf") * score * a.len_len)
                else:
                    score_len = score_len / len_len * a.len_len
            if (a.score_len < score_len
                    or (a.score_len == score_len and a.score_len < score)):
                a.score_len = score
                a.len_len = len_len
            Score[t] = score
            extendScore[t] = a.end

        # best (length-corrected) anker tracking (savekmers.c:5590-5622)
        bl = best_state[2]
        score_len = float(a.score)
        if bl is not None and a.len_len != bl.len_len:
            if a.len_len == 0:  # deCon OOB length, C gives inf/nan
                score_len = (float("nan") if a.score == 0 else
                             float("inf") * a.score * bl.len_len)
            else:
                score_len = score_len / a.len_len * bl.len_len
        if bl is None or bl.score_len < score_len:
            best_state[2] = a
            best_state[3] = 0
        elif bl.score_len == score_len:
            if bl.score_len < a.score_len:
                best_state[2] = a
                best_state[3] = 0
            elif bl.score_len == a.score_len:
                best_state[2] = a
                best_state[3] += 1
        b = best_state[0]
        if b is None or b.score < a.score:
            best_state[0] = a
            best_state[1] = 0
        elif b.score == a.score:
            if b.score_len < a.score_len:
                best_state[0] = a
                best_state[1] = 0
            else:
                best_state[0] = a
                best_state[1] += 1
    for t in bests:
        Score[t] = 0
        extendScore[t] = 0
        include[t] = 0


def get_chain_templates(idx: KmaIndex, ankers: List[Anker], src_i: int,
                        q_len: int, template_lengths, rewards: Penalties,
                        bests: List[int], Score, extendScore, include,
                        lc: bool, proxi=None) -> Optional[int]:
    """getBestChainTemplates (kmeranker.c:83-233): rebuild the chain
    backwards from anker src_i; returns the chain-start anker index or
    None.  bests is extended with the winning template set."""
    if proxi is not None:
        return _chain_templates_proxi(idx, ankers, src_i, q_len,
                                      template_lengths, rewards, bests,
                                      Score, extendScore, include, lc,
                                      proxi)
    k = idx.kmersize
    mlen = idx.mlen
    M, MM, U, W1, Wl = (rewards.M, rewards.MM, rewards.U, rewards.W1,
                        rewards.Wl)
    values = idx.values
    del bests[:]  # getBestChainTemplates overwrites the list head
    src = ankers[src_i]
    vo = src.voff
    cnt = int(values[vo])
    # the marking dance leaves bests in FORWARD list order
    # (kmeranker.c:97-122: both pointers walk backward in lockstep)
    marked = values[vo + 1: vo + 1 + cnt].tolist()
    nextAnker = False
    for t in marked:
        include[t] += 1
        if include[t] == 1:
            nextAnker = True
    if lc:
        bestScore = src.score_len
    else:
        bestScore = src.score
    target_len = src.len_len
    prev = src_i

    ni = src_i
    while nextAnker:
        node = ankers[ni]
        nvo = node.voff
        ncnt = int(values[nvo])
        start = node.start
        end = node.end
        for t in values[nvo + ncnt: nvo: -1].tolist():
            if include[t]:
                score = int(Score[t])
                pos = int(extendScore[t])
                gaps = pos - end
                if pos == 0:
                    score = node.weight
                else:
                    if gaps == -k:
                        score += node.weight - (k - 1) * M
                    elif gaps == 0:
                        score += node.weight + MM
                    elif 0 < gaps:
                        if gaps <= 2:
                            MMs, Ms = gaps, 0
                        else:
                            MMs = max(2, gaps // k + (1 if gaps % k else 0))
                            Ms = min(min(gaps - MMs, k), MMs)
                        if (W1 + (gaps - 1) * U) <= (MMs * MM + Ms * M):
                            score += node.weight + Ms * M + MMs * MM
                        else:
                            score += node.weight + (W1 + (gaps - 1) * U)
                    elif mlen != k:
                        score += node.weight + gaps * M + MM
                    else:
                        score += node.weight + gaps * M - (gaps + 1) * U + W1
                    node.score = 0  # mark as used
                if bestScore <= score:
                    if node.start:
                        tmp = W1 + (node.start - 1) * U
                        tmp = score + max(Wl, tmp)
                    else:
                        tmp = score
                    if tmp == bestScore and (
                            not lc or min(q_len, int(template_lengths[t]))
                            == target_len):
                        score = bestScore
                        nextAnker = False
                        prev = ni
                extendScore[t] = start
                Score[t] = score
        ni -= 1
        if ni < 0 and nextAnker:
            prev = 0
            break

    j_out = []
    for t in marked:
        if include[t] == 1:
            s = int(Score[t])
            if lc:
                ok = (bestScore / target_len
                      * min(q_len, int(template_lengths[t])) <= s) \
                    or bestScore <= s
            else:
                ok = bestScore <= s
            if ok:
                j_out.append(t)
        Score[t] = 0
        include[t] = 0
        extendScore[t] = 0
    if j_out:
        bests.extend(j_out)
        return prev
    return None


def _chain_templates_proxi(idx: KmaIndex, ankers: List[Anker], src_i: int,
                           q_len: int, template_lengths,
                           rewards: Penalties, bests: List[int], Score,
                           extendScore, include, lc: bool, proxi
                           ) -> Optional[int]:
    """getProxiChainTemplates (kmeranker.c:235-370): no include gating --
    every template on every chained anker is extended and pos==0 events
    grow the candidate list; selection keeps scores within
    minFrac * bestScore (double, via proxiTestBest[ScoreLen]) and feeds
    softProxi.  Always returns the chain-start anker index."""
    k = idx.kmersize
    mlen = idx.mlen
    M, MM, U, W1, Wl = (rewards.M, rewards.MM, rewards.U, rewards.W1,
                        rewards.Wl)
    values = idx.values
    del bests[:]
    src = ankers[src_i]
    bestScore = src.score_len if lc else src.score
    proxi_score = proxi.min_frac * bestScore  # stays double here
    target_len = src.len_len
    prev = src_i
    cand: List[int] = []
    nextAnker = True
    ni = src_i
    while nextAnker:
        node = ankers[ni]
        nvo = node.voff
        ncnt = int(values[nvo])
        start = node.start
        end = node.end
        for t in values[nvo + ncnt: nvo: -1].tolist():
            score = int(Score[t])
            pos = int(extendScore[t])
            gaps = pos - end
            if pos == 0:
                score = node.weight
                cand.append(t)
            else:
                if gaps == -k:
                    score += node.weight - (k - 1) * M
                elif gaps == 0:
                    score += node.weight + MM
                elif 0 < gaps:
                    if gaps <= 2:
                        MMs, Ms = gaps, 0
                    else:
                        MMs = max(2, gaps // k + (1 if gaps % k else 0))
                        Ms = min(min(gaps - MMs, k), MMs)
                    if (W1 + (gaps - 1) * U) <= (MMs * MM + Ms * M):
                        score += node.weight + Ms * M + MMs * MM
                    else:
                        score += node.weight + (W1 + (gaps - 1) * U)
                elif mlen != k:
                    score += node.weight + gaps * M + MM
                else:
                    score += node.weight + gaps * M - (gaps + 1) * U + W1
                node.score = 0  # mark as used
            if bestScore <= score:
                if node.start:
                    tmp = W1 + (node.start - 1) * U
                    tmp = score + max(Wl, tmp)
                else:
                    tmp = score
                if tmp == bestScore and (
                        not lc or min(q_len, int(template_lengths[t]))
                        == target_len):
                    score = bestScore
                    nextAnker = False
                    prev = ni
            extendScore[t] = start
            Score[t] = score
        ni -= 1
        if ni < 0 and nextAnker:
            prev = 0
            break

    j_out = []
    for t in cand:
        s = int(Score[t])
        if not include[t]:
            if lc:
                ok = (proxi_score / target_len
                      * min(q_len, int(template_lengths[t])) <= s) \
                    or proxi_score <= s
            else:
                ok = proxi_score <= s
            if ok:
                j_out.append(t)
                if proxi.soft is not None:
                    proxi.soft[t] += s
        Score[t] = 0
        extendScore[t] = 0
        include[t] = 0
    bests.extend(j_out)
    return prev


_U32 = 0xFFFFFFFF


class SegmentList:
    """Claimed-region bookkeeping (role of seqmenttree.c), re-derived
    from the behavioral contract pinned by tests/test_segtree.py (fuzzed
    against the compiled reference).  The structure is an APPROXIMATE
    binary segment union; its quirks feed chain acceptance
    (savekmers.c:5847), so the rules below state observed behavior:

    R1 inner engulfed: an insert strictly containing the subtree span
       collapses it to a leaf carrying the insert's covered value.
    R2 inner partial: span extends to the union; descent picks a half by
       comparing against the right child's start.  A straddling insert
       splits there -- upper part right first (its start snaps to
       left.end+1, dropping one base), then the SAME slot rewritten to
       the lower part goes left.  covered = sibling covered + result.
    R3 disjoint leaf: leaf becomes inner (old leaf copied aside), the
       covered values sum without overlap subtraction.
    R4 overlapping leaf: span extends; covered snaps to the span length.

    Queries sum covered over contained subtrees and clamp partial leaf
    overlaps; results are read through int32 (u32 wrap kept).  Insertion
    runs an explicit descend/unwind stack instead of recursion."""

    def __init__(self):
        # structure-of-arrays; child index -1 == leaf
        self.S: List[int] = []
        self.E: List[int] = []
        self.C: List[int] = []
        self.B0: List[int] = []
        self.B1: List[int] = []
        self.n = 0

    def clear(self):
        self.n = 0

    def _slot(self, i: int):
        while len(self.S) <= i:
            self.S.append(0)
            self.E.append(0)
            self.C.append(0)
            self.B0.append(-1)
            self.B1.append(-1)

    def _insert(self, node: int) -> int:
        S, E, C, B0, B1 = self.S, self.E, self.C, self.B0, self.B1
        path = []  # (parent, base_cov, split_left or -1, low_s, low_e)
        r = 0
        while True:
            # ---- descend to a terminal rule --------------------------
            while True:
                if B0[r] == -1:
                    if E[node] < S[r] or E[r] < S[node]:
                        # R3: disjoint leaf -> inner
                        cp = node + 1
                        S[cp], E[cp], C[cp] = S[r], E[r], C[r]
                        B0[cp] = B1[cp] = -1
                        if E[node] < S[r]:
                            S[r] = S[node]
                            B0[r], B1[r] = node, cp
                        else:
                            E[r] = E[node]
                            B0[r], B1[r] = cp, node
                        C[r] = (C[r] + C[node]) & _U32
                    else:
                        # R4: overlapping leaf
                        if S[node] < S[r]:
                            S[r] = S[node]
                        if E[r] < E[node]:
                            E[r] = E[node]
                        C[node] = 0
                        C[r] = (E[r] - S[r]) & _U32
                    v = C[r]
                    break
                if S[node] < S[r] and E[r] < E[node]:
                    # R1: engulfed inner -> collapse
                    S[r], E[r] = S[node], E[node]
                    C[r] = C[node]
                    C[node] = 0
                    B0[r] = -1
                    v = C[r]
                    break
                # R2: extend and descend / split
                if E[r] < E[node]:
                    E[r] = E[node]
                elif S[node] < S[r]:
                    S[r] = S[node]
                mid = S[B1[r]]
                if E[node] < mid:
                    path.append((r, C[B1[r]], -1, 0, 0))
                    r = B0[r]
                elif mid <= S[node]:
                    path.append((r, C[B0[r]], -1, 0, 0))
                    r = B1[r]
                else:
                    low_s, low_e = S[node], E[B0[r]]
                    S[node] = E[B0[r]] + 1   # 1-base gap quirk
                    C[node] = (E[node] - S[node]) & _U32
                    path.append((r, 0, B0[r], low_s, low_e))
                    r = B1[r]
            # ---- unwind; split continuations restart the descent -----
            redo = False
            while path:
                parent, base, split_left, low_s, low_e = path.pop()
                if split_left != -1:
                    S[node], E[node] = low_s, low_e
                    C[node] = (low_e - low_s) & _U32
                    path.append((parent, v, -1, 0, 0))
                    r = split_left
                    redo = True
                    break
                C[parent] = (base + v) & _U32
                v = C[parent]
            if not redo:
                return v

    def grow(self, start: int, end: int) -> int:
        if self.n == 0:
            self._slot(1)
            self.S[0] = start
            self.E[0] = end
            self.C[0] = (end - start) & _U32
            self.B0[0] = -1
            self.B1[0] = -1
            self.n = 1
            return (end - start) & _U32
        node = self.n
        self._slot(node + 1)
        self.S[node] = start
        self.E[node] = end
        self.C[node] = (end - start) & _U32
        self.B0[node] = -1
        self.B1[node] = -1
        self.C[0] = self._insert(node)
        if self.C[node]:
            self.n += 2
        v = self.C[0]
        return v - (1 << 32) if v >= (1 << 31) else v

    def query(self, start: int, end: int) -> int:
        """Contained-subtree sum with partial-leaf clamps; the u32 result
        is read back through int32 (savekmers.c:5135)."""
        if self.n == 0:
            return 0
        S, E, C, B0, B1 = self.S, self.E, self.C, self.B0, self.B1
        acc = 0
        st = [0]
        while st:
            r = st.pop()
            if end < S[r] or E[r] < start:
                continue
            if start <= S[r] and E[r] <= end:
                acc = (acc + C[r]) & _U32
                continue
            if B0[r] != -1:
                st.append(B0[r])
                st.append(B1[r])
                continue
            if S[r] <= start and end <= E[r]:
                acc = (acc + end - start) & _U32
            elif S[r] <= start and start < E[r]:
                acc = (acc + E[r] - start) & _U32
            elif S[r] < end and end <= E[r]:
                acc = (acc + end - S[r]) & _U32
        return acc - (1 << 32) if acc >= (1 << 31) else acc


def _get_best_anker(ankers: List[Anker], start_i: int, lc: bool
                    ) -> Tuple[Optional[int], int, int]:
    """getBestAnkerScore{,Len} (kmeranker.c:398-478) over alive ankers.

    Returns (best index, ties, new start index)."""
    n = len(ankers)
    i = start_i
    while i < n and (not ankers[i].alive or ankers[i].score == 0):
        i += 1
    if i >= n:
        return None, 0, n
    best = i
    ties = 0
    j = i
    while j + 1 < n:
        j += 1
        a = ankers[j]
        if not a.alive:
            continue
        if a.score:
            if lc:
                b = ankers[best]
                score_len = float(a.score_len)
                if a.len_len != b.len_len:
                    if a.len_len == 0:  # deCon OOB length -> inf/nan in C
                        score_len = (float("nan") if a.score_len == 0 else
                                     float("inf") * a.score_len * b.len_len)
                    else:
                        score_len = score_len / a.len_len * b.len_len
                if b.score_len < score_len:
                    best = j
                    ties = 0
                elif b.score_len == score_len:
                    if b.score_len < a.score_len:
                        best = j
                        ties = 0
                    elif b.score_len == a.score_len:
                        best = j
                        ties += 1
            else:
                if ankers[best].score < a.score:
                    best = j
                    ties = 0
                elif ankers[best].score == a.score:
                    best = j
                    ties += 1
    return best, ties, i


def chain_scan_read(idx: KmaIndex, rewards: Penalties, codes: np.ndarray,
                    header: bytes, exhaustive: bool, Score, extendScore,
                    include, template_lengths, minlen: int, coverT: float,
                    mrs: float, mrc: float, lc: bool = False, proxi=None
                    ) -> List[AnkerHit]:
    """save_kmers_chain for one read; returns the emitted anker records."""
    k = idx.kmersize
    seqlen = len(codes)
    if seqlen < k:
        return []
    VF = _collect_ankers(idx, codes, False, rewards, exhaustive)
    VR = _collect_ankers(idx, codes, True, rewards, exhaustive)
    if not VF and not VR:
        return []
    codes_r = rc_codes(codes)

    # chain both strands; tie counters carry across strands
    state = [VF[0] if VF else None, 0, VF[0] if VF else None, 0]
    if VF:
        state[0].score = 0
        state[0].score_len = 0.0
        state[0].len_len = 1
        _chain_pass(idx, VF, seqlen, template_lengths, rewards, Score,
                    extendScore, include, lc, state)
    best_f = state[0]
    bl_f = state[2]
    state[0] = VR[0] if VR else None
    state[2] = VR[0] if VR else None
    if VR:
        state[0].score = 0
        state[0].score_len = 0.0
        state[0].len_len = 1
        _chain_pass(idx, VR, seqlen, template_lengths, rewards, Score,
                    extendScore, include, lc, state)
    best_r = state[0]
    ties = state[1]

    # no good hits (savekmers.c:5637, BEFORE the -lc selector swap)
    f_score = best_f.score if best_f else 0
    r_score = best_r.score if best_r else 0
    if f_score < k and r_score < k:
        return []
    if lc:
        best_f, best_r, ties = bl_f, state[2], state[3]

    VF_start = VF[0].start if VF else 0
    VR_start = VR[0].start if VR else 0
    # prune (kmeranker.c:372-396)
    for a in VF:
        if a.score < k:
            a.alive = False
    for a in VR:
        if a.score < k:
            a.alive = False
    if not any(a.alive for a in VF) and best_f:
        best_f.score = 0
    if not any(a.alive for a in VR) and best_r:
        best_r.score = 0

    out: List[AnkerHit] = []
    segs = SegmentList()
    bestT: List[int] = []
    bestT_r: List[int] = []
    bf_i = VF.index(best_f) if best_f in VF else None
    br_i = VR.index(best_r) if best_r in VR else None

    cStart = cStart_r = -1
    if not (best_f and best_f.score) or not (best_r and best_r.score):
        if best_f and best_f.score:
            cs = get_chain_templates(idx, VF, bf_i, seqlen,
                                     template_lengths, rewards, bestT,
                                     Score, extendScore, include, lc, proxi)
            cStart = VF[cs].start if cs is not None else best_f.start
            start = cStart
            ln = best_f.end - start
            rc = 1
        else:
            cs = get_chain_templates(idx, VR, br_i, seqlen,
                                     template_lengths, rewards, bestT_r,
                                     Score, extendScore, include, lc, proxi)
            cStart_r = VR[cs].start if cs is not None else best_r.start
            start = cStart_r
            ln = best_r.end - start
            rc = 2
    else:
        cs = get_chain_templates(idx, VF, bf_i, seqlen, template_lengths,
                                 rewards, bestT, Score, extendScore,
                                 include, lc, proxi)
        cStart = VF[cs].start if cs is not None else best_f.start
        cs = get_chain_templates(idx, VR, br_i, seqlen, template_lengths,
                                 rewards, bestT_r, Score, extendScore,
                                 include, lc, proxi)
        cStart_r = VR[cs].start if cs is not None else best_r.start
        rc, start, ln = _choose_chain(best_f, best_r, cStart, cStart_r,
                                      coverT, proxi.min_frac if proxi
                                      else 1.0)

    score = max(f_score, r_score)
    if ln < minlen or score < k:
        return []

    fw_i = bf_i
    rv_i = br_i
    while best_f is not None or best_r is not None:
        if ties:
            if rc & 1:
                _merge_ties(idx, VF, fw_i, start, VF_start, ln, coverT,
                            seqlen, template_lengths, rewards, bestT,
                            Score, extendScore, include, lc, proxi)
            if rc & 2:
                _merge_ties(idx, VR, rv_i, start, VR_start, ln, coverT,
                            seqlen, template_lengths, rewards, bestT_r,
                            Score, extendScore, include, lc, proxi)

        # mapping-length filter (mrchain, kmeranker.c:57-81)
        rc_pre = rc
        if rc & 1 and mrc and seqlen < mrc * ln:
            bestT = [t for t in bestT
                     if mrc * ln <= int(template_lengths[t])]
            if not bestT:
                rc ^= 1
        if rc & 2 and mrc and seqlen < mrc * ln:
            bestT_r = [t for t in bestT_r
                       if mrc * ln <= int(template_lengths[t])]
            if not bestT_r:
                rc ^= 2
        if not rc:
            # livelock escape: when mrchain empties EVERY chosen strand,
            # the reference (savekmers.c:5786-5794) rebuilds the exact
            # same chain forever -- verified to hang upstream (-mrc 2 on
            # a chimeric read).  Nothing was emitted and no state can
            # change, so silencing the chains only diverges on inputs
            # where the reference never returns.
            if rc_pre & 1 and best_f is not None:
                best_f.score = 0
            if rc_pre & 2 and best_r is not None:
                best_r.score = 0

        if rc:
            segs.grow(start, start + ln)
            if rc & 1:
                bh = header + b"\x00" + struct.pack("<ii", start, start + ln)
            else:
                bh = header + b"\x00" + struct.pack(
                    "<ii", seqlen - best_r.end, seqlen - start)
            if rc & 1:
                templates = list(bestT)
                sc = best_f.score
                if rc & 2:
                    templates += [-t for t in bestT_r]
                    sc = -sc
                    best_r.score = 0
                    bestT_r = []
                npos = np.flatnonzero(codes == 4).astype(np.int32)
                out.append(AnkerHit(codes=codes, n_positions=npos,
                                    rc_flag=sc,
                                    templates=np.asarray(templates,
                                                         np.int32),
                                    header=bh, flag=0))
                best_f.score = 0
                bestT = []
            else:
                npos = np.flatnonzero(codes_r == 4).astype(np.int32)
                out.append(AnkerHit(codes=codes_r, n_positions=npos,
                                    rc_flag=best_r.score,
                                    templates=np.asarray(bestT_r, np.int32),
                                    header=bh, flag=0))
                best_r.score = 0
                bestT_r = []

        # next chains (savekmers.c:5837-5939)
        ties = 0
        rc = 0
        best_f, fw_i, cStart, got_f, ties = _advance(
            idx, VF, best_f, fw_i, segs, seqlen, template_lengths, rewards,
            bestT, Score, extendScore, include, minlen, coverT, mrs, lc,
            ties, proxi)
        if got_f:
            rc |= 1
        best_r, rv_i, cStart_r, got_r, ties = _advance(
            idx, VR, best_r, rv_i, segs, seqlen, template_lengths, rewards,
            bestT_r, Score, extendScore, include, minlen, coverT, mrs, lc,
            ties, proxi)
        if got_r:
            rc |= 2

        if best_f is None and best_r is None:
            return out
        if best_f is not None and best_r is not None:
            rc, start, ln = _choose_chain(best_f, best_r, cStart, cStart_r,
                                          coverT, proxi.min_frac if proxi
                                          else 1.0)
        elif best_f is not None:
            rc = 1
            start = cStart
            ln = best_f.end - start
        else:
            rc = 2
            start = cStart_r
            ln = best_r.end - start
    return out


def _advance(idx, V, best, b_i, segs, seqlen, template_lengths, rewards,
             bests, Score, extendScore, include, minlen, coverT, mrs, lc,
             ties, proxi=None):
    """One strand's next-chain selection (savekmers.c:5840-5880)."""
    if best is None:
        return None, None, -1, False, ties
    cStart = -1
    got = False
    if best.score:
        cs = get_chain_templates(idx, V, b_i, seqlen, template_lengths,
                                 rewards, bests, Score, extendScore,
                                 include, lc, proxi)
        if cs is not None:
            cStart = V[cs].start
            cover = segs.query(cStart, best.end)
            ln = best.end - cStart
            if minlen <= ln and cover <= coverT * ln \
                    and mrs * ln <= best.score:
                got = True
            else:
                best.score = 0
        else:
            best.score = 0
    while best is not None and best.score == 0:
        nb, nties, _ = _get_best_anker(V, 0, lc)
        ties = nties
        if nb is None:
            best = None
            b_i = None
            break
        best = V[nb]
        b_i = nb
        k = idx.kmersize
        if k < best.score:
            del bests[:]
            cs = get_chain_templates(idx, V, b_i, seqlen, template_lengths,
                                     rewards, bests, Score, extendScore,
                                     include, lc, proxi)
            if cs is not None:
                cStart = V[cs].start
                cover = segs.query(cStart, best.end)
                ln = best.end - cStart
                if minlen <= ln and cover <= coverT * ln \
                        and mrs * ln <= best.score:
                    got = True
                    break
                best.score = 0
            else:
                best.score = 0
        else:
            best.score = 0
    return best, b_i, cStart, got, ties


def _merge_ties(idx, V, b_i, start, V_start, ln, coverT, seqlen,
                template_lengths, rewards, bests, Score, extendScore,
                include, lc, proxi=None, inclusive=False):
    """Equal-anker merging (savekmers.c:5701-5781); the sparse chain's
    overlap stop test is <= (savekmers.c:6497) instead of <."""
    best = V[b_i]
    stop = max(start, V_start)
    i = b_i
    while True:
        # getTieAnker: walk raw array downward (kmeranker.c:480-494)
        found = None
        while i > 0:
            i -= 1
            a = V[i]
            if a.start <= stop:
                break
            if (not lc and a.score == best.score) or \
                    (lc and a.score_len == best.score_len
                     and a.len_len == best.len_len):
                found = i
                break
        if found is None:
            break
        a = V[found]
        if ((a.end - start) <= coverT * ln if inclusive
                else (a.end - start) < coverT * ln):
            break
        for t in bests:
            include[t] = 1
            Score[t] = 0
            extendScore[t] = 0
        adds: List[int] = []
        get_chain_templates(idx, V, found, seqlen, template_lengths,
                            rewards, adds, Score, extendScore, include, lc,
                            proxi)
        bests.extend(adds)
    for t in bests:
        include[t] = 0
        Score[t] = 0
        extendScore[t] = 0


def _choose_chain(best_f: Anker, best_r: Anker, cStart: int, cStart_r: int,
                  coverT: float, proxi: float = 1.0) -> Tuple[int, int, int]:
    """chooseChain (kmeranker.c:512-594)."""
    if proxi == 1.0:
        rc = 1 if best_r.score < best_f.score else \
            2 if best_f.score < best_r.score else 3
    elif best_r.score <= best_f.score:
        rc = 3 if proxi * best_f.score <= best_r.score else 1
    else:
        rc = 3 if proxi * best_r.score <= best_f.score else 2

    if rc == 1:
        start, end = cStart, best_f.end
    elif rc == 2:
        start, end = cStart_r, best_r.end
    else:
        if best_f.end < cStart_r:
            start, end = cStart, best_f.end
            rc = 1
        elif best_r.end < cStart:
            start, end = cStart_r, best_r.end
            rc = 2
        elif cStart <= cStart_r and best_r.end <= best_f.end:
            start, end = cStart, best_f.end
        elif cStart_r <= cStart and best_f.end <= best_r.end:
            start, end = cStart_r, best_r.end
        elif best_r.end < best_f.end:
            a = best_f.end - cStart
            b = best_r.end - cStart_r
            end = min(a, b)
            start = cStart_r
            if coverT * end <= best_r.end - cStart:
                end = best_f.end
            else:
                end = best_r.end
                rc = 2
        else:
            a = best_f.end - cStart
            b = best_r.end - cStart_r
            end = min(a, b)
            start = cStart
            if coverT * end <= best_f.end - cStart_r:
                end = best_r.end
            else:
                end = best_f.end
                rc = 1
    return rc, start, end - start


class _AdjK:
    """Index view with the chaining kmersize adjusted by prefix_len-1
    (savekmers.c:6183) for get_chain_templates/_advance/_merge_ties."""

    __slots__ = ("kmersize", "mlen", "values")

    def __init__(self, idx: KmaIndex, k: int):
        self.kmersize = k
        self.mlen = idx.mlen
        self.values = idx.values


def _collect_sparse_prefix_ankers(idx: KmaIndex, codes: np.ndarray,
                                  rewards: Penalties) -> List[Anker]:
    """Anker collection over a prefix DB (savekmers.c:6044-6183): forward
    and mirrored reverse-complement prefix positions feed ONE anker
    stream in forward coordinates; anker boundaries split at midpoints
    and weight is (end-start)*M."""
    from ..io.seq import kmer_scan, rc_codes
    from .scan import lookup_voff
    k0 = idx.kmersize
    plen = idx.prefix_len
    prefix = idx.prefix
    M = rewards.M
    seqlen = len(codes)
    rc = rc_codes(codes)
    pmers_f = kmer_scan(codes, plen) if seqlen >= plen else None
    pmers_r = kmer_scan(rc, plen) if seqlen >= plen else None
    kmers_f = kmer_scan(codes, k0) if seqlen >= k0 else None
    kmers_r = kmer_scan(rc, k0) if seqlen >= k0 else None

    npos = np.flatnonzero(codes == 4).tolist()
    out: List[Anker] = []
    cur = Anker()
    cur.voff = -1
    last = None
    hit_counter = 0
    i = 0
    j = seqlen - k0 - plen
    for ni in npos + [seqlen]:
        cur.end = i
        end = ni - k0 - plen + 1
        while i < end:
            voff = None
            if int(pmers_f[i]) == prefix:
                voff = lookup_voff(idx, int(kmers_f[i + plen]))
            elif j >= 0 and int(pmers_r[j]) == prefix:
                voff = lookup_voff(idx, int(kmers_r[j + plen]))
            else:
                i += 1
                j -= 1
                continue
            if voff >= 0:
                if voff == last:
                    cur.end = i
                elif last is not None:
                    # split at the midpoint between ankers
                    prev = cur
                    prev.end = (prev.end + i) >> 1
                    nxt = Anker()
                    nxt.start = prev.end + 1
                    nxt.end = i
                    nxt.voff = voff
                    prev.end += k0 + plen
                    prev.weight = (prev.end - prev.start) * M
                    out.append(prev)
                    cur = nxt
                    hit_counter += 1
                    last = voff
                else:
                    cur.start = ((cur.end + i) >> 1) if cur.end else 0
                    cur.end = i
                    cur.voff = voff
                    last = voff
            elif last is not None:
                prev = cur
                prev.end = ((prev.end + i) >> 1) + k0 + plen
                prev.weight = (prev.end - prev.start) * M
                out.append(prev)
                cur = Anker()
                cur.end = i
                cur.voff = -1
                hit_counter += 1
                last = None
            else:
                cur.end = i
            i += 1
            j -= 1
        if last is not None:
            prev = cur
            prev.end = i
            prev.weight = (prev.end - prev.start) * M
            out.append(prev)
            cur = Anker()
            cur.voff = -1
            hit_counter += 1
            last = None
        i = ni + 1
        j = seqlen - k0 - plen - i
    return out if hit_counter else []


def _sparse_chain_pass(idx_v, ankers: List[Anker], q_len: int,
                       template_lengths, rewards: Penalties, Score,
                       extendScore, include, best_state) -> None:
    """Chain scoring of the sparse anker stream (savekmers.c:6296-6450);
    differs from the standard pass: no gaps==0 case (it falls through to
    the snp/indel branches) and a <= negative-score clamp."""
    k = idx_v.kmersize
    mlen = idx_v.mlen
    M, MM, U, W1, Wl = (rewards.M, rewards.MM, rewards.U, rewards.W1,
                        rewards.Wl)
    values = idx_v.values
    bests: List[int] = []
    for a in ankers:
        a.score = 0
        a.score_len = 0.0
        a.len_len = 1
        vo = a.voff
        cnt = int(values[vo])
        for t in values[vo + cnt: vo: -1].tolist():
            score = int(Score[t])
            pos = int(extendScore[t])
            gaps = a.start - pos
            if not include[t]:
                include[t] = 1
                bests.append(t)
                if a.start:
                    s = W1 + (a.start - 1) * U
                    score = a.weight + max(Wl, s)
                else:
                    score = a.weight
            else:
                if gaps == -k:
                    score += a.weight - (k - 1) * M
                elif 0 < gaps:
                    if gaps <= 2:
                        MMs, Ms = gaps, 0
                    else:
                        MMs = max(2, gaps // k + (1 if gaps % k else 0))
                        Ms = min(min(gaps - MMs, k), MMs)
                    if (W1 + (gaps - 1) * U) <= (MMs * MM + Ms * M):
                        score += a.weight + Ms * M + MMs * MM
                    else:
                        score += a.weight + (W1 + (gaps - 1) * U)
                elif mlen != k:
                    score += a.weight + gaps * M + MM
                else:
                    score += a.weight + gaps * M - (gaps + 1) * U + W1
                if score < 0:
                    test = (W1 + (a.start - 1) * U) if a.start else 0
                    test = max(test, Wl)
                    if score <= test + a.weight:
                        score = test + a.weight
            if a.score < score:
                a.score = score
            len_len = int(template_lengths[t])
            if q_len < len_len:
                len_len = q_len
            score_len = float(score)
            if a.len_len != len_len:
                if len_len == 0:
                    score_len = (float("nan") if score == 0 else
                                 float("inf") * score * a.len_len)
                else:
                    score_len = score_len / len_len * a.len_len
            if (a.score_len < score_len
                    or (a.score_len == score_len and a.score_len < score)):
                a.score_len = score
                a.len_len = len_len
            Score[t] = score
            extendScore[t] = a.end

        bl = best_state[2]
        score_len = float(a.score)
        if bl is not None and a.len_len != bl.len_len:
            if a.len_len == 0:
                score_len = (float("nan") if a.score == 0 else
                             float("inf") * a.score * bl.len_len)
            else:
                score_len = score_len / a.len_len * bl.len_len
        if bl is None or bl.score_len < score_len:
            best_state[2] = a
            best_state[3] = 0
        elif bl.score_len == score_len:
            if bl.score_len < a.score_len:
                best_state[2] = a
                best_state[3] = 0
            elif bl.score_len == a.score_len:
                best_state[2] = a
                best_state[3] += 1
        b = best_state[0]
        if b is None or b.score < a.score:
            best_state[0] = a
            best_state[1] = 0
        elif b.score == a.score:
            if b.score_len < a.score_len:
                best_state[0] = a
                best_state[1] = 0
            else:
                best_state[0] = a
                best_state[1] += 1
    for t in bests:
        Score[t] = 0
        extendScore[t] = 0
        include[t] = 0


def sparse_chain_scan_read(idx: KmaIndex, rewards: Penalties,
                           codes: np.ndarray, header: bytes,
                           exhaustive: bool, Score, extendScore, include,
                           template_lengths, minlen: int, coverT: float,
                           mrs: float, mrc: float, lc: bool = False,
                           proxi=None) -> List[AnkerHit]:
    """save_kmers_sparse_chain (savekmers.c:5946-6578): chain scanner for
    sparse DBs.  One anker stream (both strands merged positionally for
    prefix DBs, forward-only for "-" DBs); the chaining kmersize is
    k+prefix_len-1 for prefix DBs.  QUIRKS kept: only the TIE counter
    swaps under -lc (:6479-6482, best_score stays the plain tracker), and
    the tie-merge overlap test is <= (:6497, standard chain uses <)."""
    k0 = idx.kmersize
    seqlen = len(codes)
    if seqlen < k0:
        return []
    if idx.prefix_len:
        ankers = _collect_sparse_prefix_ankers(idx, codes, rewards)
        flag = 16
        k = k0 + idx.prefix_len - 1
    else:
        if not exhaustive and not _quick_hit(idx, codes):
            return []
        ankers = _collect_ankers(idx, codes, False, rewards, exhaustive)
        flag = 0
        k = k0
    if not ankers:
        return []
    idx_v = _AdjK(idx, k)

    state = [ankers[0], 0, ankers[0], 0]
    state[0].score = 0
    state[0].score_len = 0.0
    state[0].len_len = 1
    _sparse_chain_pass(idx_v, ankers, seqlen, template_lengths, rewards,
                       Score, extendScore, include, state)
    best, ties, best_len, ties_len = state

    if best.score < k:
        return []
    # prune (kmeranker.c:372-396)
    V_start = ankers[0].start
    for a in ankers:
        if a.score < k:
            a.alive = False
    if not any(a.alive for a in ankers):
        best.score = 0

    out: List[AnkerHit] = []
    segs = SegmentList()
    bestT: List[int] = []
    b_i = ankers.index(best)
    cs = get_chain_templates(idx_v, ankers, b_i, seqlen, template_lengths,
                             rewards, bestT, Score, extendScore, include,
                             lc, proxi)
    score = best.score
    start = ankers[cs].start if cs is not None else best.start
    ln = best.end - start
    if ln < minlen or score < k:
        return []
    if lc:
        ties = ties_len

    while best is not None:
        if ties:
            _merge_ties(idx_v, ankers, b_i, start, V_start, ln, coverT,
                        seqlen, template_lengths, rewards, bestT, Score,
                        extendScore, include, lc, proxi, inclusive=True)
        # mrchain (kmeranker.c:57-81)
        if mrc and seqlen < mrc * ln:
            bestT = [t for t in bestT
                     if mrc * ln <= int(template_lengths[t])]
        if bestT:
            segs.grow(start, best.end)
            bh = header + b"\x00" + struct.pack("<ii", start, best.end)
            npos = np.flatnonzero(codes == 4).astype(np.int32)
            out.append(AnkerHit(codes=codes, n_positions=npos,
                                rc_flag=best.score,
                                templates=np.asarray(bestT, np.int32),
                                header=bh, flag=flag))
        # next chain (savekmers.c:6547-6573)
        ties = 0
        best.score = 0
        bestT = []
        while best is not None and best.score == 0:
            nb, nties, _ = _get_best_anker(ankers, 0, lc)
            ties = nties
            if nb is None:
                return out
            best = ankers[nb]
            b_i = nb
            if k < best.score:
                del bestT[:]
                cs = get_chain_templates(idx_v, ankers, b_i, seqlen,
                                         template_lengths, rewards, bestT,
                                         Score, extendScore, include, lc,
                                         proxi)
                if cs is not None:
                    start = ankers[cs].start
                    cover = segs.query(start, best.end)
                    ln = best.end - start
                    if ln < minlen or coverT * ln < cover \
                            or best.score < mrs * ln:
                        best.score = 0
                else:
                    best.score = 0
            else:
                best.score = 0
    return out
