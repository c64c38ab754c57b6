"""QC report (-qc): read/bp statistics as JSON (reference qc.c)."""

from __future__ import annotations

import math
from typing import IO, List

import numpy as np


class QCStat:
    """QCstat (qc.h / qc.c:26-104).

    Length distribution uses 512 bins at resolution 2^qresolution (merged
    upward on demand, qc.c:50-65); verbose mode (-qc -qc) keeps one bin
    per length (the reference leaves its reallocated tail uninitialised,
    qc.c:67-83 — zeroed here).
    """

    def __init__(self, verbose: int = 0):
        self.verbose = verbose
        self.count = 0
        self.org_count = 0
        self.fragcount = 0
        self.org_fragcount = 0
        self.bpcount = 0
        self.org_bpcount = 0
        self.totgc = 0
        self.totns = 0
        self.Eeq = 0.0
        self.maxlen = 0
        self.qresolution = 0
        self.phredScale = 33
        self.qdist = [0] * 256
        self.ldist: List[int] = [0] * 512

    def org_read(self, raw_len: int) -> None:
        """phredStat/fsastat entry (runinput.c:133-135)."""
        self.org_count += 1
        self.org_bpcount += raw_len

    def _rescale(self, maxlen: int) -> None:
        """rescale_ldist (qc.c:50-65): sequential upward merge."""
        masknew = self.qresolution + 1
        while 512 <= (maxlen >> masknew):
            masknew += 1
        mask = masknew - self.qresolution
        for i in range(1, 512):
            self.ldist[i >> mask] += self.ldist[i]
            self.ldist[i] = 0
        self.qresolution = masknew

    def update(self, ln: int, gc: int, ns: int, sp: float) -> None:
        """update_QCstat (qc.c:85-104)."""
        self.count += 1
        self.bpcount += ln
        self.totgc += gc
        self.totns += ns
        self.Eeq += sp
        if self.maxlen < ln:
            if not self.verbose:
                if 512 <= (ln >> self.qresolution):
                    self._rescale(ln)
            else:
                if len(self.ldist) < ln + 4:
                    self.ldist.extend([0] * (ln + 4 - len(self.ldist)))
            self.maxlen = ln
        if sp > 0:
            # sp == 0 (fasta input) makes the reference's qdist index
            # -inf -> a wild OOB write (qc.c:102); skipped here
            self.qdist[int(math.ceil(-10 * math.log10(sp / ln)))] += 1
        self.ldist[ln >> self.qresolution] += 1

    def finish_input(self, count: int, org_count: int,
                     phred_scale: int) -> None:
        """run_input tail (runinput.c:448-452)."""
        self.fragcount += count
        self.org_fragcount += org_count
        self.phredScale = phred_scale

    def read_stats(self, codes: np.ndarray, qual, phred_scale: int):
        """(gc, ns, sp) of a trimmed read for update(); equals the C
        accumulation when the bidirectional trim did not fire (and is the
        same region sum otherwise, modulo summation order)."""
        ns = int((codes == 4).sum())
        gc = int(((codes == 1) | (codes == 2)).sum())
        if qual is None:
            return gc, ns, 0.0
        from ..io.seq import PROB
        # plain left-to-right summation as the C loop (runinput.c:
        # 177-185); numpy pairwise reduction AND builtin sum() (Neumaier-
        # compensated for floats) both land reads in different Q bins
        sp = 0.0
        for v in PROB[np.asarray(qual, np.int64) - phred_scale].tolist():
            sp += v
        return gc, ns, sp


def print_qcstat(src: QCStat, min_q: int, min_phred: int, minmask_q: int,
                 minlen: int, maxlen: int, five_clip: int, three_clip: int,
                 dest: IO) -> None:
    """print_QCstat (qc.c:167-262), byte-exact formats."""
    w = dest.write
    w("{\n")
    w("\t\"Maximum Trim length\": %d,\n" % maxlen)
    w("\t\"Minimum Trim length\": %d,\n" % minlen)
    w("\t\"5'-clip\": %d,\n" % five_clip)
    w("\t\"3'-clip\": %d,\n" % three_clip)
    if src.Eeq:
        w("\t\"Minimum Q\": %d,\n" % min_q)
        w("\t\"End Trim Q\": %d,\n" % min_phred)
        w("\t\"Hard Mask Q\": %d,\n" % minmask_q)
        w("\t\"Phred Scale\": %d,\n" % src.phredScale)
    w("\t\"Fragment Count\": %d,\n" % src.fragcount)
    w("\t\"Org. Fragment Count\": %d,\n" % src.org_fragcount)
    w("\t\"Sequence Count\": %d,\n" % src.count)
    w("\t\"Org. Sequence Count\": %d,\n" % src.org_count)
    w("\t\"Bp Count\": %d,\n" % src.bpcount)
    w("\t\"Org. Bp Count\": %d,\n" % src.org_bpcount)
    w("\t\"Mean Read Length\": %f,\n"
      % (src.bpcount / src.count if src.count else 0))
    w("\t\"Org. Mean Read Length\": %f,\n"
      % (src.org_bpcount / src.org_count if src.org_count else 0))
    w("\t\"GC Content\": %f,\n"
      % (src.totgc / (src.bpcount - src.totns)
         if (src.bpcount - src.totns) else 0))
    w("\t\"Max Sequence Length\": %d,\n" % src.maxlen)

    # N50 (qc.c:200-234)
    dist = src.ldist
    scale = 1 << src.qresolution
    if (src.maxlen << 1) < src.bpcount:
        n50 = 0
        tot = 0
        if src.qresolution:
            i = 0
            while i < 511:
                if dist[i]:
                    p = dist[i + 1] / (dist[i] + dist[i + 1])
                    # C: double arithmetic truncated back into the ints
                    tot = int(tot + (n50 + p * scale) * dist[i])
                    if src.bpcount < (tot << 1):
                        n50 = int(n50 + p * scale)
                        i = 512
                    else:
                        n50 += scale
                else:
                    n50 += scale
                i += 1
        else:
            end = (src.maxlen + 1) if src.verbose else 512
            i = 0
            while i < end:
                tot += i * (dist[i] if i < len(dist) else 0)
                if src.bpcount < (tot << 1):
                    n50 = i
                    i = end
                i += 1
    else:
        n50 = src.maxlen
    w("\t\"N50\": %d,\n" % n50)

    if src.Eeq:
        q = src.qdist
        w("\t\"E(Q)\": %f,\n" % (-10 * math.log10(src.Eeq / src.bpcount)))
        w("\t\"Q Distribution\": [%d, %d, %d, %d" % tuple(q[0:4]))
        for i in range(4, 256, 4):
            w(", %d, %d, %d, %d" % tuple(q[i: i + 4]))
        w("],\n")

    dist = src.ldist + [0] * 4
    w("\t\"Length Resolution\": %d,\n" % scale)
    w("\t\"Length Distribution\": [%d, %d, %d, %d" % tuple(dist[0:4]))
    end = (src.maxlen + 1) if src.verbose else 512
    for i in range(4, end, 4):
        w(", %d, %d, %d, %d" % tuple(dist[i: i + 4]))
    w("]\n")
    w("}\n")
