"""Per-template pileup assembly and consensus calling (reference assembly.c).

The assembly matrix is the reference's circular linked array of count
cells: positions 0..t_len-1 chain via next[], insertion columns are spliced
in after their anchor position (assembly.c:1359-1429).  Counts saturate at
USHRT_MAX like the reference's u16 cells.

On TPU the pileup becomes a segment-sum scatter over (template, position)
pairs with insertion side-tables; this host module is the semantics
reference and handles the ragged insertion splicing.
"""

from __future__ import annotations

import dataclasses
import math
from typing import Optional

import numpy as np

from ..utils.stats import p_chisqr
from . import native_assem


def _nat_i64p(a):
    import ctypes
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_longlong))


def _nat_u8p(a):
    import ctypes
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8))

USHRT_MAX = 0xFFFF
BASES = b"ACGTN-"


@dataclasses.dataclass
class Assem:
    """Assembly result (Assem, assembly.h)."""

    score: int = 0
    fragmentCountAln: int = 0
    readCountAln: int = 0
    depth: int = 0
    depthVar: int = 0
    cover: int = 0
    aln_len: int = 0
    len: int = 0
    var: float = 0.0
    nucHighVar: int = 0
    maxDepth: int = 0
    snpSum: int = 0
    insertSum: int = 0
    deletionSum: int = 0
    t: Optional[np.ndarray] = None  # ascii
    s: Optional[np.ndarray] = None
    q: Optional[np.ndarray] = None


class AssemblyMatrix:
    """counts[pos][6] cells linked circularly with insertion splicing."""

    def __init__(self, t_len: int):
        self.t_len = t_len
        cap = max(16, t_len * 2)
        self.counts = np.zeros((cap, 6), dtype=np.int64)
        self.next = np.zeros(cap, dtype=np.int64)
        self.next[: t_len] = np.arange(1, t_len + 1)
        if t_len:
            self.next[t_len - 1] = 0  # circularise (assembly.c:1852-1855)
        self.len = t_len

    def _grow(self):
        self.ensure(len(self.next) * 2)

    def ensure(self, cap: int):
        """One-shot capacity growth (doubling copies are quadratic on
        Nanopore-sized fragment loads)."""
        cur = len(self.next)
        if cap <= cur:
            return
        counts = np.zeros((cap, 6), dtype=np.int64)
        counts[:cur] = self.counts
        nxt = np.zeros(cap, dtype=np.int64)
        nxt[:cur] = self.next
        self.counts = counts
        self.next = nxt

    def aln_to_mat(self, assem: Assem, aln_t: np.ndarray, aln_s: np.ndarray,
                   aln_q: np.ndarray, score: int, start: int, flag: int):
        """alnToMat (assembly.c:1317-1444)."""
        t_len = self.t_len
        aln_len = len(aln_t)
        assem.score += score
        if not (flag & 2) or (flag & 64):
            assem.fragmentCountAln += 1
        assem.readCountAln += 1

        lib = native_assem.get_lib()
        if lib is not None:
            while self.len + aln_len > len(self.next):
                self._grow()
            self.len = lib.kassem_aln_to_mat(
                _nat_i64p(self.counts), _nat_i64p(self.next), self.len,
                t_len, _nat_u8p(np.ascontiguousarray(aln_t, np.uint8)),
                _nat_u8p(np.ascontiguousarray(aln_q, np.uint8)), aln_len,
                start)
            return

        # trim trailing dual gaps
        i = aln_len - 1
        while i and (aln_t[i] == 5 or aln_q[i] == 5):
            i -= 1
        aln_len = i + 1
        i = 0
        while i < aln_len and (aln_t[i] == 5 or aln_q[i] == 5):
            if aln_q[i] == 5:
                start += 1
            i += 1

        pos = start
        counts = self.counts
        nxt = self.next
        while i < aln_len:
            if aln_t[i] == 5:  # insertion relative to template
                if t_len <= pos:
                    c = counts[pos, aln_q[i]] + 1
                    counts[pos, aln_q[i]] = USHRT_MAX if c > USHRT_MAX else c
                    if counts[pos, aln_q[i]] == 0:
                        counts[pos, aln_q[i]] = USHRT_MAX
                    i += 1
                    pos = nxt[pos]
                else:
                    gaps = pos
                    pos = pos - 1 if pos else t_len - 1
                    while nxt[pos] != gaps:
                        pos = nxt[pos]
                    myBias = int(counts[pos].sum())
                    tmp = int(counts[gaps].sum())
                    myBias = tmp if tmp < myBias else myBias - 1
                    if USHRT_MAX < myBias:
                        myBias = USHRT_MAX
                    while i < aln_len and aln_t[i] == 5:
                        if self.len == len(self.next):
                            self._grow()
                            counts = self.counts
                            nxt = self.next
                        nxt[pos] = self.len
                        self.len += 1
                        pos = nxt[pos]
                        nxt[pos] = gaps
                        counts[pos] = 0
                        counts[pos, 5] = myBias
                        counts[pos, aln_q[i]] = 1
                        i += 1
                    pos = nxt[pos]
            elif t_len <= pos:  # old insertion column not in this read
                c = counts[pos, 5] + 1
                counts[pos, 5] = USHRT_MAX if c > USHRT_MAX else c
                pos = nxt[pos]
            else:
                c = counts[pos, aln_q[i]] + 1
                counts[pos, aln_q[i]] = USHRT_MAX if c > USHRT_MAX else c
                i += 1
                pos = nxt[pos]

    def aln_to_mat_dense(self, assem: Assem, aln_t: np.ndarray,
                         aln_s: np.ndarray, aln_q: np.ndarray, score: int,
                         start: int, flag: int):
        """alnToMatDense (assembly.c:1446-1497): insertions (t gaps) are
        skipped so the matrix stays one cell per template position."""
        aln_len = len(aln_t)
        assem.score += score
        if not (flag & 2) or (flag & 64):
            assem.fragmentCountAln += 1
        assem.readCountAln += 1
        lib = native_assem.get_lib()
        if lib is not None:
            lib.kassem_aln_to_mat_dense(
                _nat_i64p(self.counts), _nat_i64p(self.next),
                _nat_u8p(np.ascontiguousarray(aln_t, np.uint8)),
                _nat_u8p(np.ascontiguousarray(aln_q, np.uint8)),
                len(aln_t), start)
            return
        # trim trailing dual gaps (C guard `i < aln_len` only stops via
        # the content check in practice)
        i = aln_len - 1
        while 0 <= i and (aln_t[i] == 5 or aln_q[i] == 5):
            i -= 1
        aln_len = i + 1
        # the reference's leading trim is dead code (`while(i && ...)`
        # with i == 0 never runs, assembly.c:1476)
        i = 0
        pos = start
        counts = self.counts
        nxt = self.next
        while i < aln_len:
            if aln_t[i] != 5:
                c = counts[pos, aln_q[i]] + 1
                counts[pos, aln_q[i]] = USHRT_MAX if c > USHRT_MAX else c
                pos = nxt[pos]
            i += 1

    def walk(self):
        """Positions in chain order from 0 (insertions interleaved)."""
        order = np.empty(self.len, dtype=np.int64)
        lib = native_assem.get_lib()
        if lib is not None and self.len:
            lib.kassem_walk(_nat_i64p(self.next), self.len,
                            _nat_i64p(order))
            return order
        pos = 0
        for i in range(self.len):
            order[i] = pos
            pos = self.next[pos]
        return order


def make_significance(significant: str, evalue: float, support: float):
    """significantNuc / And90 / AndSupport (assembly.c:143-160)."""
    def significant_base(X: int, Y: int) -> bool:
        if not (Y < X):
            return False
        chi = p_chisqr((X - Y) ** 2 / (X + Y)) if (X + Y) else 1.0
        if significant == "and90":
            return (9 * (X + Y) <= 10 * X) and chi <= evalue
        if significant == "support":
            return (support * (X + Y) <= X) and chi <= evalue
        return chi <= evalue
    return significant_base


def make_base_caller(base_caller: str, significant: str, evalue: float,
                     support: float):
    """baseCaller family (assembly.c:162-271) as a callable
    (bestNuc_char, tNuc_char, bestScore, depthUpdate, counts_row) -> char
    code."""
    significant_base = make_significance(significant, evalue, support)

    def call(bn: int, tchar: int, bestScore: int, depthUpdate: int, row):
        if base_caller == "org":
            if depthUpdate == 0 or bn == ord("-"):
                return ord("-")
            if not significant_base(bestScore, depthUpdate - bestScore):
                return bn | 0x20 if ord("A") <= bn <= ord("Z") else bn
            return bn
        if base_caller == "ref":
            if depthUpdate == 0 or (bn == ord("-") and tchar != ord("-")):
                return ord("n")
            if not significant_base(bestScore, depthUpdate - bestScore):
                return bn | 0x20 if ord("A") <= bn <= ord("Z") else bn
            return bn
        if base_caller == "nano":
            if depthUpdate == 0:
                return ord("-")
            if not significant_base(bestScore, depthUpdate - bestScore):
                if (bn == ord("-") and tchar != ord("-")
                        and bestScore != depthUpdate):
                    bestBaseScore = 0
                    bi = -1
                    for j in range(5):
                        if bestBaseScore < row[j]:
                            bestBaseScore = int(row[j])
                            bi = j
                    return ord("-") if bestBaseScore == 0                         else (BASES[bi] | 0x20)
                return bn | 0x20 if ord("A") <= bn <= ord("Z") else bn
            return bn
        # default baseCaller
        if depthUpdate == 0:
            return ord("-")
        if not significant_base(bestScore, depthUpdate - bestScore):
            if (bn == ord("-") and tchar != ord("-")
                    and bestScore != depthUpdate):
                return ord("n")
            return bn | 0x20 if ord("A") <= bn <= ord("Z") else bn
        return bn
    return call


def call_consensus(matrix: AssemblyMatrix, assem: Assem,
                   template_codes: np.ndarray, t_len: int, bcd: int,
                   evalue: float, support: float,
                   base_caller: str = "default",
                   significant: str = "mcnemar") -> None:
    """callConsensus (assembly.c:1499-1631) + base callers (:143-271)."""
    asm_len = matrix.len

    t_arr = np.empty(asm_len, dtype=np.uint8)
    s_arr = np.empty(asm_len, dtype=np.uint8)
    q_arr = np.empty(asm_len, dtype=np.uint8)

    lib = native_assem.get_lib()
    if lib is not None:
        stats = np.empty(4, np.int64)
        lib.kassem_consensus(
            _nat_i64p(matrix.counts), _nat_i64p(matrix.next),
            _nat_u8p(np.ascontiguousarray(template_codes, np.uint8)),
            t_len, asm_len, bcd, evalue, support,
            native_assem.BASE_CALLERS[base_caller],
            native_assem.SIGNIFICANTS[significant],
            _nat_u8p(t_arr), _nat_u8p(s_arr), _nat_u8p(q_arr),
            _nat_i64p(stats))
        assem.depth += int(stats[0])
        assem.depthVar += int(stats[1])
        assem.len = asm_len
        assem.aln_len += int(stats[2])
        assem.cover += int(stats[3])
        assem.t = t_arr
        assem.s = s_arr
        assem.q = q_arr
        return

    order = matrix.walk()
    counts = matrix.counts[order]
    depth_total = 0
    depth_var = 0
    aln_len = 0
    cover = 0

    def significant_base(X: int, Y: int) -> bool:
        if not (Y < X):
            return False
        chi = p_chisqr((X - Y) ** 2 / (X + Y)) if (X + Y) else 1.0
        if significant == "and90":
            return (9 * (X + Y) <= 10 * X) and chi <= evalue
        if significant == "support":
            return (support * (X + Y) <= X) and chi <= evalue
        return chi <= evalue

    for i in range(asm_len):
        pos = order[i]
        tn = int(template_codes[pos]) if pos < t_len else 5
        t_arr[i] = BASES[tn]
        row = counts[i]
        bestScore = int(row[tn])
        bestIdx = tn
        depthUpdate = 0
        for j in range(6):
            if bestScore < row[j]:
                bestScore = int(row[j])
                bestIdx = j
            depthUpdate += int(row[j])
        bestNuc = BASES[bestIdx]

        if not depthUpdate:
            bestNuc = ord("-")
        elif (bestScore << 1) < depthUpdate:
            # minor call (assembly.c:1567-1581)
            if bestNuc == ord("-"):
                bestBaseScore = int(row[4])
                bi = 4
                for j in range(4):
                    if bestBaseScore < row[j]:
                        bestBaseScore = int(row[j])
                        bi = j
                bestNuc = BASES[bi] | 0x20  # tolower
            else:
                bestNuc |= 0x20
            bestScore = depthUpdate - int(row[5])
        elif depthUpdate < bcd:
            bestNuc |= 0x20

        # baseCall (assembly.c:162-271)
        if isinstance(bestNuc, int):
            bn = bestNuc
        else:
            bn = ord(bestNuc)
        tchar = int(t_arr[i])
        if base_caller == "org":
            if depthUpdate == 0 or bn == ord("-"):
                bn = ord("-")
            elif not significant_base(bestScore, depthUpdate - bestScore):
                bn = bn | 0x20 if ord("A") <= bn <= ord("Z") else bn
        elif base_caller == "ref":
            if depthUpdate == 0 or (bn == ord("-") and tchar != ord("-")):
                bn = ord("n")
            elif not significant_base(bestScore, depthUpdate - bestScore):
                bn = bn | 0x20 if ord("A") <= bn <= ord("Z") else bn
        elif base_caller == "nano":
            if depthUpdate == 0:
                bn = ord("-")
            elif not significant_base(bestScore, depthUpdate - bestScore):
                if bn == ord("-") and tchar != ord("-") and bestScore != depthUpdate:
                    bestBaseScore = 0
                    bi = -1
                    for j in range(5):
                        if bestBaseScore < row[j]:
                            bestBaseScore = int(row[j])
                            bi = j
                    bn = ord("-") if bestBaseScore == 0 else (BASES[bi] | 0x20)
                else:
                    bn = bn | 0x20 if ord("A") <= bn <= ord("Z") else bn
        else:  # default baseCaller (assembly.c:162-179)
            if depthUpdate == 0:
                bn = ord("-")
            elif not significant_base(bestScore, depthUpdate - bestScore):
                if bn == ord("-") and tchar != ord("-") and bestScore != depthUpdate:
                    bn = ord("n")
                else:
                    bn = bn | 0x20 if ord("A") <= bn <= ord("Z") else bn

        q_arr[i] = bn
        if bn != ord("-"):
            depth_total += depthUpdate
            depth_var += depthUpdate * depthUpdate
            aln_len += 1
            upper = bn & ~0x20 if ord("a") <= bn <= ord("z") else bn
            if pos < t_len and tchar == upper:
                cover += 1
                s_arr[i] = ord("|")
            else:
                s_arr[i] = ord("_")
        else:
            s_arr[i] = ord("_")

    assem.depth += depth_total
    assem.depthVar += depth_var
    assem.len = asm_len
    assem.aln_len += aln_len
    assem.cover += cover
    assem.t = t_arr
    assem.s = s_arr
    assem.q = q_arr


def trim_dual_gaps(assem: Assem) -> None:
    """Drop columns where both template and consensus are '-'
    (assemble_KMA tail, assembly.c:2095-2124)."""
    keep = ~((assem.t == ord("-")) & (assem.q == ord("-")))
    assem.t = assem.t[keep]
    assem.s = assem.s[keep]
    assem.q = assem.q[keep]
    assem.len = len(assem.t)


def get_extended_features(assem: Assem, matrix: AssemblyMatrix,
                          template_codes: np.ndarray, t_len: int) -> None:
    """getExtendedFeatures (ef.c:48-127) + variance fix (assembly.c:2067-2081)."""
    nucHighVar_mean = assem.depth / t_len if t_len else 0.0
    var = assem.depthVar / t_len - nucHighVar_mean ** 2 if t_len else 0.0
    if var < 0:
        # fixVarOverflow iterates raw template positions (assembly.c:1656-1680)
        tot = matrix.counts[:t_len].sum(axis=1) if t_len else np.zeros(0)
        var = float(((tot - nucHighVar_mean) ** 2 / t_len).sum()) if t_len else 0
    assem.var = var

    highVar = nucHighVar_mean + 3 * math.sqrt(var) if var >= 0 else 0
    half = (assem.readCountAln >> 1) + (assem.readCountAln & 1)
    # ef.c:71: fragmentCountAln = max(fragmentCountAln, ceil(readCountAln/2))
    if assem.fragmentCountAln < half:
        assem.fragmentCountAln = half

    order = matrix.walk()
    lib = native_assem.get_lib()
    if lib is not None:
        out5 = np.zeros(5, np.int64)
        lib.kassem_ef(
            _nat_i64p(np.ascontiguousarray(matrix.counts)),
            _nat_i64p(order),
            _nat_u8p(np.ascontiguousarray(template_codes, np.uint8)),
            t_len, matrix.len, float(highVar), _nat_i64p(out5))
        assem.snpSum = int(out5[0])
        assem.insertSum = int(out5[1])
        assem.deletionSum = int(out5[2])
        assem.maxDepth = int(out5[3])
        assem.nucHighVar = int(out5[4])
        return
    snpSum = insertSum = deletionSum = 0
    maxDepth = 0
    nucHighVar = 0
    for i in range(matrix.len):
        pos = order[i]
        row = matrix.counts[pos]
        depthUpdate = int(row[:5].sum())
        if pos < t_len:
            deletionSum += int(row[5])
            snpSum += depthUpdate - int(row[int(template_codes[pos])])
        else:
            insertSum += depthUpdate
        depthUpdate += int(row[5])
        if maxDepth < depthUpdate:
            maxDepth = depthUpdate
        if highVar < depthUpdate:
            nucHighVar += 1
    assem.snpSum = snpSum
    assem.insertSum = insertSum
    assem.deletionSum = deletionSum
    assem.maxDepth = maxDepth
    assem.nucHighVar = nucHighVar
