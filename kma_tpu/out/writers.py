"""Output file writers, byte-compatible with the reference formats.

- .res rows (runkma.c:621, 816)
- .fsa / .aln consensus (printconsensus.c:24-61)
- .frag.gz rows (updateFrags, assembly.c:49-83)
- .frag_raw.gz rows (updateAllFrag, frags.c:64-184)
- .mat.gz rows (updateMatrix, assembly.c:85-140)
- .mapstat (ef.c:30-136)
"""

from __future__ import annotations

import gzip
import os
import time
from typing import IO, List, Optional

import numpy as np

from ..assemble.pileup import Assem, AssemblyMatrix

RES_HEADER = ("#Template\tScore\tExpected\tTemplate_length\t"
              "Template_Identity\tTemplate_Coverage\tQuery_Identity\t"
              "Query_Coverage\tDepth\tq_value\tp_value\n")


def c_unsigned(x: float) -> int:
    """C cast (unsigned)(long double): truncation toward zero."""
    return int(x) & 0xFFFFFFFF


def res_row(name: str, read_score: int, expected: float, t_len: int,
            id_: float, cover: float, q_id: float, q_cover: float,
            depth: float, q_value: float, p_value: float) -> str:
    """runkma.c:816 printf format."""
    return ("%s\t%8d\t%8d\t%8d\t%8.2f\t%8.2f\t%8.2f\t%8.2f\t%8.2f\t"
            "%8.2f\t%4.1e\n" % (name, read_score, c_unsigned(expected),
                                t_len, id_, cover, q_id, q_cover, depth,
                                q_value, p_value))


def print_consensus(assem: Assem, name: str, aln_out: Optional[IO],
                    fsa_out: Optional[IO], ref_fsa: int) -> None:
    """printConsensus (printconsensus.c:24-61)."""
    aln_len = assem.len
    t = assem.t.tobytes().decode("latin1")
    s = assem.s.tobytes().decode("latin1")
    q = assem.q.tobytes().decode("latin1")
    if aln_out is not None:
        parts = [f"# {name}\n"]
        for i in range(0, aln_len, 60):
            parts += ("template: \t", t[i: i + 60],
                      "\n          \t", s[i: i + 60],
                      "\nquery:    \t", q[i: i + 60], "\n\n")
        aln_out.write("".join(parts))
    if fsa_out is None:
        return
    if ref_fsa == 0:
        q = q.replace("-", "")
        aln_len = len(q)
    elif ref_fsa == 1:
        q = q.replace("-", "n")
    parts = [f">{name}\n"]
    for i in range(0, aln_len, 60):
        parts += (q[i: i + 60], "\n")
    fsa_out.write("".join(parts))


BASES_STR = np.frombuffer(b"ACGTN-", dtype=np.uint8)


def frag_row(codes: np.ndarray, stats: List[int], template_name: str,
             header: bytes) -> bytes:
    """updateFrags (assembly.c:49-83): seq \t bestHits \t score \t start
    \t end \t template \t header."""
    seq = BASES_STR[codes].tobytes()
    hdr = header.split(b"\x00", 1)[0]
    return (seq + b"\t%d\t%d\t%d\t%d\t" % tuple(stats[:4])
            + template_name.encode() + b"\t" + hdr + b"\n")


def frag_raw_row(codes: np.ndarray, best_hits: int, score: int,
                 starts: List[int], ends: List[int], templates: List[int],
                 header: bytes) -> bytes:
    """updateAllFrag (frags.c:64-184)."""
    seq = BASES_STR[codes].tobytes()
    hdr = header.split(b"\x00", 1)[0]
    return (seq
            + b"\t%d\t%d\t" % (best_hits, score)
            + b",".join(b"%d" % s for s in starts)
            + b"\t" + b",".join(b"%d" % e for e in ends)
            + b"\t" + b",".join(b"%d" % t for t in templates)
            + b"\t" + hdr + b"\n")


def matrix_rows(matrix: AssemblyMatrix, template_codes: np.ndarray,
                template_name: str, t_len: int) -> bytes:
    """updateMatrix (assembly.c:85-140)."""
    out = [b"#" + template_name.encode() + b"\n"]
    order = matrix.walk()
    i = 0
    for pos in order.tolist():
        row = matrix.counts[pos]
        if pos < t_len:
            base = bytes([BASES_STR[int(template_codes[i])]])
            i += 1
        else:
            base = b"-"
        out.append(base + b"\t%d\t%d\t%d\t%d\t%d\t%d\n"
                   % tuple(int(x) for x in row))
    out.append(b"\n")
    return b"".join(out)


def mapstat_header(db_name: str, tot_frags: int, cmd: str,
                   version: str = "1.5.1") -> str:
    """initExtendedFeatures (ef.c:30-46)."""
    date = time.strftime("%Y-%m-%d")
    return (f"## method\tKMA\n## version\t{version}\n"
            f"## database\t{db_name}\n## fragmentCount\t{tot_frags}\n"
            f"## date\t{date}\n## command\t{cmd}\n"
            "# refSequence\treadCount\tfragmentCount\tmapScoreSum\t"
            "refCoveredPositions\trefConsensusSum\tbpTotal\tdepthVariance\t"
            "nucHighDepthVariance\tdepthMax\tsnpSum\tinsertSum\t"
            "deletionSum\treadCountAln\tfragmentCountAln\n")


def mapstat_header_splt(db_prefixes, cmd: str, fragment_count: int,
                        version: str = "1.5.1") -> str:
    """spltDB reducer mapstat heading (spltdb.c:576-593,805-807): databases
    list instead of a single database line, fragmentCount printed from the
    stream-0 trailing counter (readNum - 1, as %u), and a column header
    without the two *Aln columns."""
    date = time.strftime("%Y-%m-%d")
    dbs = ", ".join(os.path.basename(p) for p in db_prefixes)
    return (f"## method\tKMA\n## version\t{version}\n"
            f"## databases\t{dbs}\n## date\t{date}\n## command\t{cmd}\n"
            f"## fragmentCount\t{fragment_count & 0xFFFFFFFF}\n"
            "# refSequence\treadCount\tfragmentCount\tmapScoreSum\t"
            "refCoveredPositions\trefConsensusSum\tbpTotal\tdepthVariance\t"
            "nucHighDepthVariance\tdepthMax\tsnpSum\tinsertSum\t"
            "deletionSum\n")


def mapstat_row(name: str, assem: Assem, fragment_count: int,
                read_count: int) -> str:
    """printExtendedFeatures (ef.c:129-136)."""
    return (
        "%s\t%d\t%d\t%d\t%d\t%d\t%d\t%f\t%d\t%d\t%d\t%d\t%d\t%d\t%d\n"
        % (name, read_count, fragment_count, assem.score, assem.aln_len,
           assem.cover, assem.depth, assem.var, assem.nucHighVar,
           assem.maxDepth, assem.snpSum, assem.insertSum,
           assem.deletionSum, assem.readCountAln, assem.fragmentCountAln))


def open_gz(path: str):
    """Gzip writer approximating the reference zlib settings."""
    # the reference compresses at level 1 with Z_FILTERED
    # (filebuff.c:180); level 1 keeps the write path off the profile
    return gzip.open(path, "wb", compresslevel=1)


TSV_FIELDS = ["Template_Name", "Template_Length", "Template_Identity",
              "Template_Coverage", "Template_Depth", "Query_Identity",
              "Query_Coverage", "Query_Depth", "Read_Count_Map",
              "Read_Count_Aln", "Score", "Expected", "q_value", "p_value",
              "ConClave_Score", "ConClave_Quality"]


def tsv_headerline(flag: int) -> str:
    """initsv (tsv.c:26-47): tab between printed fields, newline with the
    highest remaining bit."""
    import math
    flag &= 65535
    out = []
    for i, name in enumerate(TSV_FIELDS):
        if flag & 1:
            flag >>= 1
            out.append(name + ("\t" if flag else "\n"))
        else:
            flag >>= 1
    return "".join(out)


def tsv_row(flag: int, name: str, assem, t_len: int, read_count: int,
            read_score: int, expected: float, q_value: float,
            p_value: float, conclave_score: int) -> str:
    """printsv (tsv.c:49-108)."""
    import math
    flag &= 65535
    aln_len = assem.aln_len
    if aln_len:
        q_id = "%f" % (100.0 * assem.cover / aln_len)
        q_dep = "%f" % (assem.depth / aln_len)
    else:
        # printsv divides by the RAW aln_len (tsv.c:77-84); for skip
        # assemblies C prints 0/0 as "-nan" and depth/0 as "inf"
        q_id = "-nan" if assem.cover == 0 else "inf"
        q_dep = "-nan" if assem.depth == 0 else "inf"
    vals = [
        ("%s", name),
        ("%d", t_len),
        ("%f", 100.0 * assem.cover / t_len),
        ("%f", 100.0 * assem.aln_len / t_len),
        ("%f", assem.depth / t_len),
        ("%s", q_id),
        ("%s", q_id),
        ("%s", q_dep),
        ("%d", read_count),
        ("%d", assem.readCountAln),
        ("%d", read_score),
        ("%f", expected),
        ("%f", q_value),
        ("%e", p_value),
        ("%d", conclave_score),
        ("%f", (40.0 * read_score / conclave_score * math.log(read_score))
         if conclave_score and read_score else 0.0),
    ]
    out = []
    for fmt, v in vals:
        if flag & 1:
            flag >>= 1
            out.append((fmt % v) + ("\t" if flag else "\n"))
        else:
            flag >>= 1
    return "".join(out)
