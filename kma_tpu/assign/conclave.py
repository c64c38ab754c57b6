"""ConClave read-to-template resolution (reference conclave.c).

Each mapped read carries its candidate set (templates, starts, ends) and
the global per-template `alignment_scores` / `uniq_alignment_scores`
accumulated during alignment; ConClave-1 greedily assigns every multi-hit
read to one template by the (alignment_scores, score/length, uniq_scores,
lowest index) tie-break cascade (conclave.c:80-123).

On TPU this is a pure reduction: the score arrays are all-reduced across
hosts, and the per-read argmax over candidates is a vectorised gather —
the host loop here is the semantics reference.
"""

from __future__ import annotations

import dataclasses
from typing import Dict, List, Optional

import numpy as np


@dataclasses.dataclass
class FragRecord:
    """One spooled read candidate record (updatescores.c:203-298)."""

    q_len: int
    best_hits: int            # signed: negative marks PE partner follows
    score: int                # signed: negative marks PE partner follows
    header: bytes
    flag: int
    codes: np.ndarray         # base codes of emitted orientation
    starts: List[int]
    ends: List[int]
    templates: List[int]      # signed ids
    # PE mate payload (update_Scores_pe tail, updatescores.c:480-485)
    mate_codes: np.ndarray = None
    mate_header: bytes = b""
    mate_flag: int = 0


@dataclasses.dataclass
class Frag:
    """A read assigned to one template (conclave.c Frag, frags.h)."""

    q_len: int
    best_hits: int
    score: int
    start: int
    end: int
    header: bytes
    flag: int
    codes: np.ndarray


def run_conclave1(records: List[FragRecord], db_size: int,
                  alignment_scores: np.ndarray,
                  uniq_alignment_scores: np.ndarray,
                  template_lengths: np.ndarray,
                  w_scores: np.ndarray,
                  fragment_counts: Optional[np.ndarray] = None,
                  read_counts: Optional[np.ndarray] = None,
                  lc: bool = False) -> Dict[int, List[Frag]]:
    """ConClave-1 (runConClave, conclave.c:43-213; _lc variant :215-384).

    Returns per-template fragment lists in printFrags order: the reference
    PREPENDS to per-template linked lists and drains them LIFO
    (conclave.c:164-165, frags.c:40-56), so lists here are reversed at the
    end to match the file order consumed by assembly.
    """
    frag_lists: Dict[int, List[Frag]] = {}
    for rec in records:
        best_hits = abs(rec.best_hits)
        read_score = abs(rec.score)
        if best_hits > 1:
            bestTemplate = -1
            bestScore = 0.0
            best_read_score = 0
            bestNum = 0
            start = end = 0
            for i in range(best_hits):
                tt = rec.templates[i]
                t = -tt if tt < 0 else tt
                a = int(alignment_scores[t])
                u = int(uniq_alignment_scores[t])
                tmp_score = 1.0 * a / int(template_lengths[t])
                if lc:
                    better = (tmp_score > bestScore
                              or (tmp_score == bestScore and (
                                  a > best_read_score
                                  or (a == best_read_score and (
                                      u > bestNum
                                      or (u == bestNum
                                          and t < abs(bestTemplate)))))))
                else:
                    better = (a > best_read_score
                              or (a == best_read_score and (
                                  tmp_score > bestScore
                                  or (tmp_score == bestScore and (
                                      u > bestNum
                                      or (u == bestNum
                                          and t < abs(bestTemplate)))))))
                if better:
                    bestTemplate = tt
                    best_read_score = a
                    bestScore = tmp_score
                    bestNum = u
                    start = rec.starts[i]
                    end = rec.ends[i]
        else:
            bestTemplate = rec.templates[0]
            start = rec.starts[0]
            end = rec.ends[0]

        codes = rec.codes
        header = rec.header
        flag = rec.flag
        if bestTemplate < 0:
            bestTemplate = -bestTemplate
            from ..io.seq import rc_codes
            codes = rc_codes(codes)
            flag |= 16
            # q-bound inversion (conclave.c:137-145) applies to chain/HMM
            # records whose header tail carries bounds; handled by caller.

        w_scores[bestTemplate] += read_score
        if fragment_counts is not None:
            fragment_counts[bestTemplate] += 1
            read_counts[bestTemplate] += 1

        frag = Frag(q_len=rec.q_len, best_hits=best_hits,
                    score=0 if rec.best_hits < 0 else read_score,
                    start=start, end=end, header=header, flag=flag,
                    codes=codes)
        frag_lists.setdefault(bestTemplate, []).append(frag)

        if rec.score < 0:
            # PE mate record follows (conclave.c:169-194): same template,
            # same start/end/score, its own codes/header/flag
            if read_counts is not None:
                read_counts[bestTemplate] += 1
            mate = Frag(q_len=len(rec.mate_codes), best_hits=best_hits,
                        score=0 if rec.best_hits < 0 else read_score,
                        start=start, end=end, header=rec.mate_header,
                        flag=rec.mate_flag, codes=rec.mate_codes)
            frag_lists[bestTemplate].append(mate)

    # reference drains LIFO per template
    for lst in frag_lists.values():
        lst.reverse()
    return frag_lists
