"""Paired-end step-2 scanning (savekmers.c:427-688, 1648-1762, 3367-3570).

`get_kmers_for_pair` scores both strands of one mate into Score/Score_r;
`getF_Best`/`getR_Best` combine strand lists and detect the cross-mate
union; `save_kmers_unionPair` emits one proper-pair anker record or
separate single records, with exact sam-flag and orientation handling.
"""

from __future__ import annotations

from typing import List, Optional, Tuple

import numpy as np

from ..config import Penalties
from ..index.format import KmaIndex
from ..io.seq import rc_codes
from .scan import AnkerHit, _gap_reconnect_mm, _hits_for_codes, _quick_hit, scan_keys


def get_kmers_for_pair(idx: KmaIndex, codes: np.ndarray, rewards: Penalties,
                       exhaustive: bool, Score: np.ndarray,
                       Score_r: np.ndarray, extendScore: np.ndarray,
                       include: np.ndarray
                       ) -> Tuple[int, List[int], List[int]]:
    """Score both strands of one mate (savekmers.c:427-688).

    Unlike save_kmers' strand asymmetry, BOTH strands use the
    kmersize*M+MM SNP reconnect here (savekmers.c:586-588).
    Score/Score_r are left filled; returns (bestSeqCount, bests, bests_r).
    """
    k = idx.kmersize
    mlen = idx.mlen
    M, MM, U, W1 = rewards.M, rewards.MM, rewards.U, rewards.W1
    if len(codes) < k:
        return 0, [], []
    from .native_chain import engine_for
    eng = engine_for(idx, rewards)
    if eng is not None:
        return eng.pair_mate(codes, exhaustive, Score, Score_r,
                             extendScore, include)
    extendScore[0] = 0  # clear the sparse-pair side flag (savekmers.c:455)

    bestSeqCount = 0
    lists: List[List[int]] = []
    values = idx.values
    for rc in range(2):
        cur = codes if rc == 0 else rc_codes(codes)
        Scores = Score if rc == 0 else Score_r
        bests: List[int] = []
        lists.append(bests)
        if not exhaustive and not _quick_hit(idx, cur):
            continue
        pos, voff = _hits_for_codes(idx, cur)
        hitCounter = len(pos)
        if hitCounter == 0:
            continue
        last = -1
        Ms = MMs = Us = W1s = 0
        HIT = 0
        for i in range(len(pos)):
            j, v = int(pos[i]), int(voff[i])
            gaps = j - (int(pos[i - 1]) if i else j) - 1 if i else 0
            if i and v == last:
                if gaps == 0:
                    Ms += 1
                elif mlen <= gaps <= k:
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
                    Us += k - gaps
                HIT = j
            elif i:
                score = Ms * M + MMs * MM + Us * U + W1s * W1
                cnt = int(values[last])
                for t in values[last + 1: last + 1 + cnt].tolist():
                    Scores[t] += score
                    extendScore[t] = HIT
                HIT = j - 1
                cnt = int(values[v])
                for t in values[v + 1: v + 1 + cnt].tolist():
                    if include[t]:
                        g = HIT - extendScore[t]
                        if g == 0:
                            s = M
                        elif mlen <= g <= k:
                            s = k * M + MM  # same on both strands here
                        elif k < g:
                            ms, mms, us, w1s = _gap_reconnect_mm(
                                g, k, M, MM, U, W1)
                            s = k * M + (ms - k) * M + mms * MM \
                                + us * U + w1s * W1
                        elif mlen != k:
                            s = g * M + MM
                        else:
                            s = g * M + (k - g) * U + W1
                        Scores[t] += s
                    else:
                        Scores[t] = k * M
                        include[t] = 1
                        bests.append(t)
                last = v
                HIT = j
                Ms = MMs = Us = W1s = 0
            else:
                cnt = int(values[v])
                for t in values[v + 1: v + 1 + cnt].tolist():
                    Scores[t] = k * M
                    include[t] = 1
                    bests.append(t)
                last = v
                HIT = j
        if last >= 0:
            score = Ms * M + MMs * MM + Us * U + W1s * W1
            cnt = int(values[last])
            for t in values[last + 1: last + 1 + cnt].tolist():
                Scores[t] += score
            for t in bests:
                extendScore[t] = 0
                include[t] = 0
                if Scores[t] < 0:
                    Scores[t] = 0
        if bestSeqCount < hitCounter:
            bestSeqCount = hitCounter
    return bestSeqCount, lists[0], lists[1]


def get_kmers_for_pair_count(idx: KmaIndex, codes: np.ndarray,
                             rewards: Penalties, exhaustive: bool, Score,
                             Score_r, extendScore, include):
    """get_kmers_for_pair_count (savekmers.c:711-824): -ck inner scorer --
    pure repetition counting of identical value-list runs per strand."""
    from ..io.seq import kmer_scan, rc_codes
    k = idx.kmersize
    seqlen = len(codes)
    if seqlen < k:
        return 0, [], []
    extendScore[0] = 0
    seqend = seqlen - k + 1
    best_seq_count = 0
    out_lists = []
    for rc in range(2):
        cur = codes if rc == 0 else rc_codes(codes)
        Scores = Score if rc == 0 else Score_r
        bests = []
        npos = np.flatnonzero(cur == 4).tolist()
        HIT = bool(exhaustive)
        j = 0
        for ni in npos + [seqlen]:
            if HIT:
                break
            end = ni - k + 1
            while j < end:
                v = 0
                ok = True
                for c in cur[j: j + k].tolist():
                    v = (v << 2) | (c & 3)
                if idx.lookup(v) is not None:
                    HIT = True
                    break
                j += k
            j = ni + 1
        hit_counter = 0
        if HIT:
            kmers = scan_keys(idx, cur)
            last = None
            last_list = None
            reps = 0
            j = 0
            for ni in npos + [seqlen]:
                if j >= seqend:
                    break
                for j2 in range(j, ni - k + 1):
                    v = idx.lookup(int(kmers[j2]))
                    if v is not None:
                        key = v.__array_interface__["data"][0]
                        if key == last:
                            reps += 1
                        else:
                            if last is not None:
                                for t in last_list:
                                    Scores[t] += reps
                                    if Scores[t] == reps:
                                        bests.append(int(t))
                                hit_counter += reps
                            reps = 1
                            last = key
                            last_list = np.asarray(v[1:], np.int64)
                j = ni + 1
            if last is not None:
                for t in last_list:
                    Scores[t] += reps
                    if Scores[t] == reps:
                        bests.append(int(t))
                hit_counter += reps
        out_lists.append(bests)
        if best_seq_count < hit_counter:
            best_seq_count = hit_counter
    return best_seq_count, out_lists[0], out_lists[1]


def getF_best(bests: List[int], bests_r: List[int], Score, Score_r,
              proxi=None) -> Tuple[int, List[int]]:
    """getF_Best (savekmers.c:1648-1680) / getF_Proxi (:1764-1823): best
    over both strands into a signed region list (negative = rc strand);
    clears scores."""
    bestScore = 0
    region: List[int] = []
    if proxi is not None:
        for t in bests:
            if bestScore < Score[t]:
                bestScore = int(Score[t])
        for t in bests_r:
            if bestScore < Score_r[t]:
                bestScore = int(Score_r[t])
        ps = int(proxi.min_frac * bestScore)
        for t in bests:
            s = int(Score[t])
            if ps <= s:
                region.append(t)
                if proxi.soft is not None:
                    proxi.soft[t] += s
            Score[t] = 0
        for t in bests_r:
            s = int(Score_r[t])
            if ps <= s:
                region.append(-t)
                if proxi.soft is not None:
                    proxi.soft[t] += s
            Score_r[t] = 0
        return bestScore, region
    for t in bests:
        s = int(Score[t])
        if bestScore < s:
            bestScore = s
            region = [t]
        elif bestScore == s:
            region.append(t)
        Score[t] = 0
    for t in bests_r:
        s = int(Score_r[t])
        if bestScore < s:
            bestScore = s
            region = [-t]
        elif bestScore == s:
            region.append(-t)
        Score_r[t] = 0
    return bestScore, region


def getR_best(bests: List[int], bests_r: List[int], Score, Score_r,
              region: List[int], proxi=None) -> Tuple[int, List[int], bool]:
    """getR_Best (savekmers.c:1682-1762) / getR_Proxi (:1825-1922): mate2
    best + cross-mate union.

    Returns (bestScore_r, mate2 best list (signed), pe_found); `region` is
    reordered in place with paired entries first when pe_found.
    """
    bestScore_r = 0
    best2: List[int] = []
    if proxi is not None:
        for t in bests:
            if bestScore_r < Score[t]:
                bestScore_r = int(Score[t])
        for t in bests_r:
            if bestScore_r < Score_r[t]:
                bestScore_r = int(Score_r[t])
        ps = int(proxi.min_frac * bestScore_r)
        for t in bests:
            s = int(Score[t])
            if ps <= s:
                best2.append(t)
                if proxi.soft is not None:
                    proxi.soft[t] += s
            else:
                Score[t] = 0
        for t in bests_r:
            s = int(Score_r[t])
            if ps <= s:
                best2.append(-t)
                if proxi.soft is not None:
                    proxi.soft[t] += s
            else:
                Score_r[t] = 0
        pe_hits = 0
        for i in range(len(region)):
            t = region[i]
            paired = Score_r[t] if 0 < t else Score[-t]
            if paired:
                region[pe_hits], region[i] = region[i], region[pe_hits]
                pe_hits += 1
        for x in best2:
            if 0 < x:
                Score[x] = 0
            else:
                Score_r[-x] = 0
        if pe_hits:
            del region[pe_hits:]
            return bestScore_r, best2, True
        return bestScore_r, best2, False
    for t in bests:
        s = int(Score[t])
        if bestScore_r < s:
            for x in best2:
                if 0 < x:
                    Score[x] = 0
                else:
                    Score_r[-x] = 0
            bestScore_r = s
            best2 = [t]
        elif bestScore_r == s:
            best2.append(t)
        else:
            Score[t] = 0
    for t in bests_r:
        s = int(Score_r[t])
        if bestScore_r < s:
            for x in best2:
                if 0 < x:
                    Score[x] = 0
                else:
                    Score_r[-x] = 0
            bestScore_r = s
            best2 = [-t]
        elif bestScore_r == s:
            best2.append(-t)
        else:
            Score_r[t] = 0
    # check union: region entries whose template also scored for mate2
    pe_hits = 0
    for i in range(len(region)):
        t = region[i]
        paired = Score_r[t] if 0 < t else Score[-t]
        if paired:
            region[pe_hits], region[i] = region[i], region[pe_hits]
            pe_hits += 1
    # clear mate2 scores
    for x in best2:
        if 0 < x:
            Score[x] = 0
        else:
            Score_r[-x] = 0
    if pe_hits:
        del region[pe_hits:]
        return bestScore_r, best2, True
    return bestScore_r, best2, False


class PairAnker:
    """Result of a pair scan: one proper-pair record or up to two singles.

    records: list of (codes_emitted, n_positions, rc_flag, templates,
    header, sam_flag); a proper pair is two consecutive records with the
    first carrying 0 templates (printPair, ankers.c:150-161)."""

    __slots__ = ("records", "unmapped")

    def __init__(self, records, unmapped):
        self.records = records
        self.unmapped = unmapped


def _npos(codes: np.ndarray) -> np.ndarray:
    return np.flatnonzero(codes == 4).astype(np.int32)


def save_kmers_union_pair(idx: KmaIndex, rewards: Penalties,
                          codes1: np.ndarray, codes2: np.ndarray,
                          header1: bytes, header2: bytes, exhaustive: bool,
                          Score, Score_r, extendScore, include, proxi=None,
                          pair_fn=None, rev=True) -> Optional[PairAnker]:
    """save_kmers_unionPair (savekmers.c:3367-3570).

    rev=False is the pseudo-sparse ("-" DB) orientation model: the scan
    leaves reads FORWARD, so the rev-gated flag bits drop/swap and the
    negative-region emissions stay forward (savekmers.c:3374-3378)."""
    if pair_fn is None:
        pair_fn = get_kmers_for_pair
    k = idx.kmersize
    recs = []

    hc1, bests1, bests1_r = pair_fn(
        idx, codes1, rewards, exhaustive, Score, Score_r, extendScore,
        include)
    if hc1:
        bestScore, region = getF_best(bests1, bests1_r, Score, Score_r,
                                      proxi)
        if k < bestScore and bestScore * k < (len(codes1) - bestScore):
            bestScore = 0
    else:
        bestScore, region = 0, []

    extendScore[0] = 1  # route sparse mate 2 to the _r side (:3404)
    hc2, bests2, bests2_r = pair_fn(
        idx, codes2, rewards, exhaustive, Score, Score_r, extendScore,
        include)
    pe = False
    if hc2:
        if bestScore:
            bestScore_r, best2, pe = getR_best(bests2, bests2_r, Score,
                                               Score_r, region, proxi)
        else:
            bestScore_r, best2 = getF_best(bests2, bests2_r, Score, Score_r,
                                           proxi)
        if k < bestScore_r and bestScore_r * k < (len(codes2) - bestScore_r):
            bestScore_r = 0
            pe = False
    else:
        bestScore_r, best2 = 0, []

    rc1 = rc_codes(codes1)
    rc2 = rc_codes(codes2)
    flag, flag_r = 65, 129

    if 0 < bestScore and 0 < bestScore_r:
        if pe:
            flag |= 2
            flag_r |= 2
            if 0 < region[0]:
                # pair on mate1's fw strand: mate1 fw, mate2 rc
                if rev:
                    flag |= 32
                    flag_r |= 16
                else:
                    flag |= 16
                    flag_r |= 32
                recs.append((codes1, _npos(codes1), bestScore,
                             np.zeros(0, np.int32), header1, flag))
                recs.append((rc2, _npos(rc2), bestScore_r,
                             np.asarray(region, np.int32), header2, flag_r))
            else:
                if rev:
                    flag |= 16
                    flag_r |= 32
                else:
                    flag |= 32
                    flag_r |= 16
                neg = [-t for t in region]
                recs.append((codes2, _npos(codes2), bestScore_r,
                             np.zeros(0, np.int32), header2, flag_r))
                recs.append((rc1, _npos(rc1), bestScore,
                             np.asarray(neg, np.int32), header1, flag))
            return PairAnker(recs, 0)
        # both mapped, no pair: two separate records
        if 0 < region[0]:
            seq1, sc1 = codes1, bestScore
            if region[-1] < 0:
                sc1 = -bestScore
            out1 = region
        else:
            if rev:
                flag |= 16
                flag_r |= 32
            seq1, sc1 = (rc1 if rev else codes1), bestScore
            out1 = [-t for t in region]
        if 0 < best2[0]:
            seq2, sc2 = codes2, bestScore_r
            if best2[-1] < 0:
                sc2 = -bestScore_r
            out2 = best2
        else:
            if rev:
                flag |= 32
                flag_r |= 16
            seq2, sc2 = (rc2 if rev else codes2), bestScore_r
            out2 = [-t for t in best2]
        recs.append((seq1, _npos(seq1), sc1, np.asarray(out1, np.int32),
                     header1, flag))
        recs.append((seq2, _npos(seq2), sc2, np.asarray(out2, np.int32),
                     header2, flag_r))
        return PairAnker(recs, 0)
    if bestScore:
        if rev:
            flag |= 8 | 32
        if 0 < region[0]:
            seq1, sc1 = codes1, bestScore
            if region[-1] < 0:
                sc1 = -bestScore
            out1 = region
        else:
            if rev:
                flag |= 16
            seq1, sc1 = (rc1 if rev else codes1), bestScore
            out1 = [-t for t in region]
        recs.append((seq1, _npos(seq1), sc1, np.asarray(out1, np.int32),
                     header1, flag))
        return PairAnker(recs, 2)
    if bestScore_r:
        # when mate1 had no score, getF filled the region storage for
        # mate2 (savekmers.c:3412); best2 IS that region list
        lst = best2
        if rev:
            flag_r |= 8 | 32
        if 0 < lst[0]:
            seq2, sc2 = codes2, bestScore_r
            if lst[-1] < 0:
                sc2 = -bestScore_r
            out2 = lst
        else:
            if rev:
                flag_r |= 16
            seq2, sc2 = (rc2 if rev else codes2), bestScore_r
            out2 = [-t for t in lst]
        recs.append((seq2, _npos(seq2), sc2, np.asarray(out2, np.int32),
                     header2, flag_r))
        return PairAnker(recs, 1)
    return PairAnker([], 3)


def get_first_pen(bests: List[int], bests_r: List[int], Score, Score_r
                  ) -> Tuple[int, List[int], List[int]]:
    """getFirstPen (savekmers.c:1383-1413): ALL mate1 matches of both
    strands with their scores (rc negative); clears scores."""
    bestScore = 0
    region: List[int] = []
    rscores: List[int] = []
    for t in bests:
        s = int(Score[t])
        if bestScore < s:
            bestScore = s
        region.append(t)
        rscores.append(s)
        Score[t] = 0
    for t in bests_r:
        s = int(Score_r[t])
        if bestScore < s:
            bestScore = s
        region.append(-t)
        rscores.append(s)
        Score_r[t] = 0
    return bestScore, region, rscores


def get_second_best_pen(bests: List[int], bests_r: List[int], Score,
                        Score_r, region: List[int], rscores: List[int],
                        bestScore: int, PE: int, proxi=None):
    """getSecondBestPen (savekmers.c:1415-1512) / getSecondProxiPen
    (:1514-1646).

    Returns (bestScore_r, region_out, pe_found, best2): with a pair the
    region shrinks to the pair winners; otherwise region keeps mate1's
    bestScore entries and best2 holds mate2's bestScore_r entries (signed,
    with the `<=` quirk on rc entries, savekmers.c:1501)."""
    bestScore_r = 0
    for t in bests:
        s = int(Score[t])
        if bestScore_r < s:
            bestScore_r = s
    merged2 = list(bests)
    for t in bests_r:
        s = int(Score_r[t])
        if bestScore_r < s:
            bestScore_r = s
        merged2.append(-t)

    if proxi is not None:
        kept: List[int] = []
        if bestScore_r:
            comp_score = 0
            for i, t in enumerate(region):
                s = int(Score_r[t]) if 0 < t else int(Score[-t])
                if 0 < s:
                    s += rscores[i]
                    if comp_score < s:
                        comp_score = s
            if (bestScore + bestScore_r - PE) <= comp_score:
                ps = int(proxi.min_frac * comp_score)
                for i, t in enumerate(region):
                    s = int(Score_r[t]) if 0 < t else int(Score[-t])
                    if 0 < s:
                        s += rscores[i]
                        if ps <= s:
                            kept.append(t)
                            if proxi.soft is not None:
                                proxi.soft[abs(t)] += s
        if kept:
            for t in merged2:
                if 0 < t:
                    Score[t] = 0
                else:
                    Score_r[-t] = 0
            return bestScore_r, kept, True, []
        # SE split (savekmers.c:1609-1642)
        ps = int(proxi.min_frac * bestScore)
        region_out = [region[i] for i in range(len(region))
                      if ps <= rscores[i]]
        best2: List[int] = []
        ps = int(proxi.min_frac * bestScore_r)
        for t in merged2:
            if 0 < t:
                s = int(Score[t])
                if ps <= s:
                    best2.append(t)
                    if proxi.soft is not None:
                        proxi.soft[t] += s
                Score[t] = 0
            else:
                s = int(Score_r[-t])
                if ps <= s:
                    best2.append(t)
                    if proxi.soft is not None:
                        proxi.soft[-t] += s
                Score_r[-t] = 0
        return bestScore_r, region_out, False, best2

    best_hits: List[int] = []
    if bestScore_r:
        compScore = max(0, bestScore + bestScore_r - PE)
        for i, t in enumerate(region):
            s = int(Score_r[t]) if 0 < t else int(Score[-t])
            if 0 < s:
                s += rscores[i]
                if compScore < s:
                    compScore = s
                    best_hits = [t]
                elif compScore == s:
                    best_hits.append(t)

    if best_hits:
        for t in merged2:
            if 0 < t:
                Score[t] = 0
            else:
                Score_r[-t] = 0
        return bestScore_r, best_hits, True, []

    region_out = [region[i] for i in range(len(region))
                  if rscores[i] == bestScore]
    best2: List[int] = []
    for t in merged2:
        if 0 < t:
            if bestScore_r == int(Score[t]):
                best2.append(t)
            Score[t] = 0
        else:
            if bestScore_r <= int(Score_r[-t]):
                best2.append(t)
            Score_r[-t] = 0
    return bestScore_r, region_out, False, best2


def save_kmers_penalty_pair(idx: KmaIndex, rewards: Penalties,
                            codes1: np.ndarray, codes2: np.ndarray,
                            header1: bytes, header2: bytes,
                            exhaustive: bool, Score, Score_r, extendScore,
                            include, proxi=None,
                            pair_fn=None, rev=True) -> Optional[PairAnker]:
    """save_kmers_penaltyPair (savekmers.c:3572-3777).

    C's print-time comp_rc() restores the scan-flipped read to forward;
    its absence leaves RC bytes -- translated to explicit fw/rc arrays."""
    if pair_fn is None:
        pair_fn = get_kmers_for_pair
    k = idx.kmersize
    recs = []

    hc1, bests1, bests1_r = pair_fn(
        idx, codes1, rewards, exhaustive, Score, Score_r, extendScore,
        include)
    if hc1:
        bestScore, region, rscores = get_first_pen(bests1, bests1_r, Score,
                                                   Score_r)
    else:
        bestScore, region, rscores = 0, [], []

    extendScore[0] = 1  # sparse mate-2 side flag
    hc2, bests2, bests2_r = pair_fn(
        idx, codes2, rewards, exhaustive, Score, Score_r, extendScore,
        include)
    pe = False
    best2: List[int] = []
    if hc2:
        if 0 < bestScore:
            bestScore_r, region, pe, best2 = get_second_best_pen(
                bests2, bests2_r, Score, Score_r, region, rscores,
                bestScore, rewards.PE, proxi)
        else:
            bestScore_r, region = getF_best(bests2, bests2_r, Score,
                                            Score_r, proxi)
    else:
        bestScore_r = 0

    rc1 = rc_codes(codes1)
    rc2 = rc_codes(codes2)
    len1, len2 = len(codes1), len(codes2)
    flag, flag_r = 65, 129

    if 0 < bestScore and 0 < bestScore_r:
        if pe:
            flag |= 2
            flag_r |= 2
            compScore = min(hc1 + hc2, bestScore + bestScore_r)
            if (k <= compScore
                    or (len1 + len2 - compScore - (k << 1))
                    < compScore * k):
                if 0 < region[0]:
                    if rev:
                        flag |= 32
                        flag_r |= 16
                    else:
                        flag |= 16
                        flag_r |= 32
                    recs.append((codes1, _npos(codes1), bestScore,
                                 np.zeros(0, np.int32), header1, flag))
                    recs.append((rc2, _npos(rc2), bestScore_r,
                                 np.asarray(region, np.int32), header2,
                                 flag_r))
                else:
                    if rev:
                        flag |= 16
                        flag_r |= 32
                    else:
                        flag |= 32
                        flag_r |= 16
                    neg = [-t for t in region]
                    recs.append((codes2, _npos(codes2), bestScore_r,
                                 np.zeros(0, np.int32), header2, flag_r))
                    recs.append((rc1, _npos(rc1), bestScore,
                                 np.asarray(neg, np.int32), header1, flag))
                return PairAnker(recs, 0)
            return PairAnker([], 3)
        # both matched without pairing: per-mate gates (savekmers.c:
        # 3654-3710)
        h1 = min(hc1, bestScore)
        emit1 = k <= h1 or (len1 - h1 - k) < h1 * k
        h2 = min(hc2, bestScore_r)
        emit2 = k <= h2 or (len2 - h2 - k) < h2 * k
        if emit1:
            if 0 < region[0]:
                seq1, sc1 = codes1, bestScore
                if region[-1] < 0:
                    sc1 = -bestScore
                out1 = region
            else:
                if rev:
                    flag |= 16
                    flag_r |= 32
                seq1, sc1 = (rc1 if rev else codes1), bestScore
                out1 = [-t for t in region]
        if emit2:
            if 0 < best2[0]:
                seq2, sc2 = codes2, bestScore_r
                if best2[-1] < 0:
                    sc2 = -bestScore_r
                out2 = best2
            else:
                if rev:
                    flag |= 32
                    flag_r |= 16
                seq2, sc2 = (rc2 if rev else codes2), bestScore_r
                out2 = [-t for t in best2]
        if emit1:
            recs.append((seq1, _npos(seq1), sc1,
                         np.asarray(out1, np.int32), header1, flag))
        if emit2:
            recs.append((seq2, _npos(seq2), sc2,
                         np.asarray(out2, np.int32), header2, flag_r))
        return PairAnker(recs, 0 if (emit1 and emit2) else
                         (2 if emit1 else (1 if emit2 else 3)))
    if 0 < bestScore:
        h1 = min(hc1, bestScore)
        if k <= h1 or (len1 - h1 - k) < h1 * k:
            if rev:
                flag |= 8 | 32
            if 0 < region[0]:
                seq1, sc1 = codes1, bestScore
                if region[-1] < 0:
                    sc1 = -bestScore
                out1 = region
            else:
                if rev:
                    flag |= 16
                seq1, sc1 = (rc1 if rev else codes1), bestScore
                out1 = [-t for t in region]
            recs.append((seq1, _npos(seq1), sc1,
                         np.asarray(out1, np.int32), header1, flag))
        return PairAnker(recs, 2)
    if 0 < bestScore_r:
        h2 = min(hc2, bestScore_r)
        if k <= h2 or (len2 - h2 - k) < h2 * k:
            if rev:
                flag_r |= 8 | 32
            if 0 < region[0]:
                seq2, sc2 = codes2, bestScore_r
                if region[-1] < 0:
                    sc2 = -bestScore_r
                out2 = region
            else:
                if rev:
                    flag_r |= 16
                seq2, sc2 = (rc2 if rev else codes2), bestScore_r
                out2 = [-t for t in region]
            recs.append((seq2, _npos(seq2), sc2,
                         np.asarray(out2, np.int32), header2, flag_r))
        return PairAnker(recs, 1)
    return PairAnker([], 3)


def get_first_force(bests: List[int], bests_r: List[int], Score, Score_r
                    ) -> Tuple[List[int], List[int]]:
    """getFirstForce (savekmers.c:1254-1273)."""
    region: List[int] = []
    rscores: List[int] = []
    for t in bests:
        region.append(t)
        rscores.append(int(Score[t]))
        Score[t] = 0
    for t in bests_r:
        region.append(-t)
        rscores.append(int(Score_r[t]))
        Score_r[t] = 0
    return region, rscores


def get_second_best_force(bests: List[int], bests_r: List[int], Score,
                          Score_r, region: List[int], rscores: List[int],
                          proxi=None) -> Tuple[int, List[int]]:
    """getSecondBestForce (savekmers.c:1275-1318) / getSecondProxiForce
    (:1320-1381); note the caller scanned mate2 with SWAPPED score arrays,
    so `Score` here holds mate2's RC matches pairing with mate1's forward
    entries.  The proxi variant scores on the mate2 side only (no
    regionScores addition)."""
    best_hits: List[int] = []
    bestScore = 0
    if proxi is not None:
        for t in region:
            s = int(Score[t]) if 0 < t else int(Score_r[-t])
            if bestScore < s:
                bestScore = s
        ps = int(proxi.min_frac * bestScore)
        # QUIRK: the reference never writes the region count back
        # (savekmers.c:1350-1371 lacks `*regionTemplates = bestHits`), so
        # kept entries overwrite the front while the tail keeps STALE
        # original entries up to the old count
        best_hits = list(region)
        bh = 0
        for t in region:
            s = int(Score[t]) if 0 < t else int(Score_r[-t])
            if ps <= s:
                best_hits[bh] = t
                bh += 1
                if proxi.soft is not None:
                    proxi.soft[abs(t)] += s
        for t in bests:
            Score[t] = 0
        for t in bests_r:
            Score_r[t] = 0
        return bestScore, best_hits
    for i, t in enumerate(region):
        s = int(Score[t]) if 0 < t else int(Score_r[-t])
        if s:
            s += rscores[i]
            if bestScore < s:
                bestScore = s
                best_hits = [t]
            elif bestScore == s:
                best_hits.append(t)
    for t in bests:
        Score[t] = 0
    for t in bests_r:
        Score_r[t] = 0
    return bestScore, best_hits


def save_kmers_force_pair(idx: KmaIndex, rewards: Penalties,
                          codes1: np.ndarray, codes2: np.ndarray,
                          header1: bytes, header2: bytes, exhaustive: bool,
                          Score, Score_r, extendScore, include, proxi=None,
                          pair_fn=None, rev=True) -> Optional[PairAnker]:
    """save_kmers_forcePair (savekmers.c:3779-3864): only proper pairs
    survive; mate2 is scanned with swapped strand arrays so opposite
    orientations pair up."""
    if pair_fn is None:
        pair_fn = get_kmers_for_pair
    k = idx.kmersize

    hc1, bests1, bests1_r = pair_fn(
        idx, codes1, rewards, exhaustive, Score, Score_r, extendScore,
        include)
    if not hc1:
        return PairAnker([], 1)
    region, rscores = get_first_force(bests1, bests1_r, Score, Score_r)

    # swapped arrays: mate2 fw -> Score_r, mate2 rc -> Score
    extendScore[0] = 1  # sparse routes mate 2 to its _r side (:3799)
    hc2, bests2, bests2_r = pair_fn(
        idx, codes2, rewards, exhaustive, Score_r, Score, extendScore,
        include)
    bestScore = 0
    best_hits: List[int] = []
    if hc2:
        # returned lists: bests2 live in Score_r, bests2_r in Score
        bestScore, best_hits = get_second_best_force(
            bests2_r, bests2, Score, Score_r, region, rscores, proxi)
    if hc2 and bestScore:
        len1, len2 = len(codes1), len(codes2)
        if k <= bestScore or (len1 + len2 - bestScore) < bestScore * k:
            flag, flag_r = 67, 131
            sc = bestScore
            if best_hits[-1] < 0:
                sc = -bestScore
            rc1 = rc_codes(codes1)
            rc2 = rc_codes(codes2)
            recs = []
            if 0 < best_hits[0]:
                if rev:
                    flag |= 32
                    flag_r |= 16
                else:
                    flag |= 16
                    flag_r |= 32
                recs.append((codes1, _npos(codes1), sc,
                             np.zeros(0, np.int32), header1, flag))
                recs.append((rc2, _npos(rc2), sc,
                             np.asarray(best_hits, np.int32), header2,
                             flag_r))
            else:
                if rev:
                    flag |= 16
                    flag_r |= 32
                else:
                    flag |= 32
                    flag_r |= 16
                neg = [-t for t in best_hits]
                recs.append((codes2, _npos(codes2), sc,
                             np.zeros(0, np.int32), header2, flag_r))
                recs.append((rc1, _npos(rc1), sc,
                             np.asarray(neg, np.int32), header1, flag))
            return PairAnker(recs, 0)
    else:
        # clear leftover mate2 scores (savekmers.c:3851-3862)
        for t in bests2:
            Score_r[t] = 0
        for t in bests2_r:
            Score[t] = 0
    return PairAnker([], 3)
