"""SAM output (reference sam.c)."""

from __future__ import annotations

from typing import IO, List, Optional

import numpy as np

from ..assemble.pileup import BASES


def make_cigar(aligned) -> str:
    """makeCigar (sam.c:30-98): =/X/I/D runs with soft-clips."""
    if not len(aligned.t) and not aligned.start and not aligned.end:
        return "*"
    out = []
    if aligned.start:
        out.append(f"{aligned.start}S")
    t, s, q = aligned.t, aligned.s, aligned.q
    ln = len(t)
    if ln:
        def op_at(i):
            if s[i] == ord("|"):
                return "="
            if t[i] == 5:
                return "I"
            if q[i] == 5:
                return "D"
            return "X"
        pop = op_at(0)
        rep = 1
        for i in range(1, ln):
            op = op_at(i)
            if op == pop:
                rep += 1
            else:
                out.append(f"{rep}{pop}")
                pop = op
                rep = 1
        out.append(f"{rep}{pop}")
    if aligned.end:
        out.append(f"{aligned.end}S")
    return "".join(out)


def sam_header(names: List[bytes], template_lengths: np.ndarray,
               cmd: Optional[str], out: IO,
               version: str = "1.5.1") -> None:
    """saminit (sam.c:100-112)."""
    out.write("@HD\tVN:1.6\tGO:reference\n")
    if cmd:
        out.write(f"@PG\tID:KMA\tPN:kma\tVN:{version}\tCL:{cmd}\n")
    else:
        out.write(f"@PG\tID:KMA\tPN:kma\tVN:{version}\n")
    for t in range(1, len(template_lengths)):
        out.write("@SQ\tSN:%s\tLN:%d\n"
                  % (names[t - 1].decode("latin1"),
                     int(template_lengths[t])))


def sam_record(codes: np.ndarray, header: bytes, rname: Optional[str],
               aligned, stats: List[int], out: IO) -> None:
    """samwrite (sam.c:114-211).

    stats (aligned): [et, score, start, end, flag]; (unmapped): [et, flag].
    """
    qname_full = header.split(b"\x00", 1)[0].decode("latin1")
    qname = qname_full.split("\t", 1)[0]
    seq = np.frombuffer(BASES, dtype=np.uint8)[codes].tobytes() \
        .decode("latin1")
    qual = "*"
    if aligned is not None:
        mapq = min(254, aligned.mapQ)
        et = stats[0]
        score = stats[1]
        pos = stats[2] + 1
        tlen = stats[3] - pos
        flag = stats[4]
        cigar = make_cigar(aligned)
    else:
        mapq = 0
        et = stats[0]
        score = 0
        pos = 0
        tlen = 0
        flag = stats[1]
        if rname is None:
            rname = "*"
        cigar = "*"
    out.write("%s\t%d\t%s\t%d\t%d\t%s\t*\t0\t%d\t%s\t%s\tET:i:%d\tAS:i:%d\n"
              % (qname, flag, rname, pos, mapq, cigar, tlen, seq, qual, et,
                 score))
