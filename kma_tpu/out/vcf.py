"""VCF 4.2 output (reference vcf.c)."""

from __future__ import annotations

import math
import os
from typing import IO

import numpy as np

from ..assemble.pileup import AssemblyMatrix, BASES
from ..utils.stats import binP, p_chisqr

NUC2NUM = {65: 0, 67: 1, 71: 2, 84: 3, 78: 4, 45: 5,
           97: 0, 99: 1, 103: 2, 116: 3, 110: 4}


def vcf_header(template_filename: str, version: str = "1.5.1") -> bytes:
    """initialiseVcf (vcf.c:46-95)."""
    name = os.path.basename(template_filename) if template_filename \
        else "spltDB"
    lines = [
        "##fileformat=VCFv4.2",
        f"##kmaVersion={version}",
        '##FILTER=<ID=LowQual,Description="Low quality">',
        '##INFO=<ID=DP,Number=1,Type=Integer,Description="Total Depth">',
        '##INFO=<ID=AD,Number=1,Type=Integer,Description="Allele Depth">',
        '##INFO=<ID=AF,Number=1,Type=Float,Description="Allele Fraction">',
        '##INFO=<ID=RAF,Number=1,Type=Float,'
        'Description="Revised Allele Fraction">',
        '##INFO=<ID=DEL,Number=1,Type=Float,'
        'Description="Fraction of Reads Containing Spanning Deletions">',
        '##INFO=<ID=AD6,Number=6,Type=Integer,'
        'Description="Count of all alternative alleles: A,C,G,T,N,-">',
        '##FORMAT=<ID=Q,Number=1,Type=Float,'
        'Description="McNemar quantile">',
        '##FORMAT=<ID=P,Number=1,Type=Float,'
        'Description="McNemar p-value">',
        '##FORMAT=<ID=FT,Number=1,Type=String,Description="Filter">',
        "#CHROM\tPOS\tID\tREF\tALT\tQUAL\tFILTER\tINFO\tFORMAT\t" + name,
    ]
    return ("\n".join(lines) + "\n").encode()


def vcf_rows(template_name: str, assem_t: np.ndarray, evalue: float,
             support: float, bcd: int, t_len: int, matrix: AssemblyMatrix,
             filt: int, base_call) -> bytes:
    """updateVcf (vcf.c:97-282).

    assem_t is the (dual-gap-trimmed) consensus template char array; the
    matrix walk re-syncs at trimmed insertion rows (vcf.c:132-139).
    """
    ln_const = -10 / math.log(10)
    out = []
    order = matrix.walk()
    counts = matrix.counts
    nxt = matrix.next
    ti = 0
    for pos in order.tolist():
        next_pos = int(nxt[pos])
        nuc = int(assem_t[ti]) if ti < len(assem_t) else ord("-")
        if pos < t_len:
            ti += 1
        elif nuc != ord("-"):
            nuc = ord("-")
        else:
            ti += 1

        row = counts[pos]
        bestNuc_i = NUC2NUM.get(nuc, 8)
        bestScore = int(row[bestNuc_i]) if bestNuc_i < 6 else 0
        depthUpdate = 0
        for j in range(6):
            if bestScore < row[j]:
                bestScore = int(row[j])
                bestNuc_i = j
            depthUpdate += int(row[j])
        nucNum = bestNuc_i
        bestNuc = BASES[bestNuc_i] if bestNuc_i < 6 else ord("-")

        if not depthUpdate:
            nucNum = 5
            bestNuc = ord("-")
        elif (bestScore << 1) < depthUpdate:
            if bestNuc == ord("-"):
                bestBaseScore = 0
                bi = 4
                for j in range(5):
                    if bestBaseScore < row[j]:
                        bestBaseScore = int(row[j])
                        bi = j
                nucNum = bi
                bestNuc = BASES[bi] | 0x20
            else:
                bestNuc |= 0x20
            bestScore = depthUpdate - int(row[5])
        elif depthUpdate < bcd:
            bestNuc |= 0x20

        if bestScore:
            bestNuc = base_call(bestNuc, nuc, bestScore, depthUpdate, row)
            nucNum = NUC2NUM.get(bestNuc, 8)
            DP = depthUpdate
            AD = int(row[nucNum]) if nucNum < 6 else 0
            AF = AD / DP
            RAF = bestScore / DP
            DEL = int(row[5])
            Q = (depthUpdate - (bestScore << 1)) ** 2 / depthUpdate
            P = p_chisqr(Q)
            if (nuc != bestNuc or (t_len <= next_pos and
                                   (ti < len(assem_t)
                                    and assem_t[ti] == ord("-")))
                    or DP < bcd or evalue < P or AD < support * DP):
                QUAL = int(ln_const * math.log(binP(DP, AD, 0.25)))
                QUAL = 3079 if (QUAL < 0 or 3079 < QUAL) else QUAL
                if bcd <= DP and P <= evalue and support * DP <= AD:
                    FILTER = "PASS"
                elif bcd <= DP or P <= evalue or support * DP <= AD:
                    FILTER = "LowQual"
                else:
                    FILTER = "FAIL"
                fcol = FILTER if filt == 2 else "."
                ref = chr(nuc) if nuc != ord("-") else "<->"
                alt = chr(bestNuc) if bestNuc != ord("-") else "<->"
                p_str = "%d" % (pos + 1) if pos < t_len else "0"
                out.append(
                    "%s\t%s\t.\t%s\t%s\t%d\t%s\tDP=%d;AD=%d;AF=%.2f;"
                    "RAF=%.2f;DEL=%d;AD6=%d,%d,%d,%d,%d,%d\t"
                    "Q:P:FT\t%.2f:%4.1e:%s\n"
                    % (template_name, p_str, ref, alt, QUAL, fcol, DP, AD,
                       AF, RAF, DEL, int(row[0]), int(row[1]), int(row[2]),
                       int(row[3]), int(row[4]), int(row[5]), Q, P, FILTER))
        elif pos < t_len:
            FILTER = "FAIL"
            fcol = FILTER if filt == 2 else "."
            out.append(
                "%s\t%d\t.\t%c\t.\t0\t%s\tDP=0;AD=0;AF=0.00;RAF=0.00;"
                "DEL=0;AD6=0,0,0,0,0,0\tQ:P:FT\t0.00:%4.1e:%s\n"
                % (template_name, pos + 1, nuc, fcol, 1.0, FILTER))
        if next_pos == 0:
            break
    return "".join(out).encode()
