"""BLAST-ish XML output (reference xml.c)."""

from __future__ import annotations

import math
from typing import IO

import numpy as np

BASES = "ACGTN-"


def xml_init(out: IO, templatefilename: str, tot_frags: int, cmd: str,
             timestamp: int, version: str = "1.5.1") -> None:
    """initXML (xml.c:30-51)."""
    out.write("<?xml version=\"1.0\"?>\n")
    out.write("<!DOCTYPE BlastOutput PUBLIC \"-//NCBI//NCBI BlastOutput/EN\""
              " \"http://www.ncbi.nlm.nih.gov/dtd/NCBI_BlastOutput.dtd\">\n")
    out.write("<BlastOutput>\n")
    out.write("\t<BlastOutput_program>kma</BlastOutput_program>\n")
    out.write("\t<BlastOutput_version>KMA %s</BlastOutput_version>\n"
              % version)
    out.write("\t<BlastOutput_reference>Philip T.L.C. Clausen, "
              "Frank M. Aarestrup & Ole Lund, \"Rapid and precise "
              "alignment of raw reads against redundant databases with "
              "KMA\", BMC Bioinformatics, 2018;19:307.</BlastOutput_"
              "reference>\n")
    out.write("\t<BlastOutput_db>%s</BlastOutput_db>\n" % templatefilename)
    out.write("\t<BlastOutput_query-ID>kma-%s-%d</BlastOutput_query-ID>\n"
              % (templatefilename, timestamp))
    out.write("\t<BlastOutput_query-def>nucl</BlastOutput_query-def>\n")
    out.write("\t<BlastOutput_query-len>%d</BlastOutput_query-len>\n"
              % tot_frags)
    out.write("\t<BlastOutput_param>\n")
    out.write("\t\t<Parameters>\n")
    out.write("\t\t\t<Parameters_cmd>%s</Parameters_cmd>\n" % cmd)
    out.write("\t\t</Parameters>\n")
    out.write("\t</BlastOutput_param>\n")
    out.write("<BlastOutput_iterations>\n")


def xml_cap(out: IO) -> None:
    out.write("</BlastOutput_iterations>\n")
    out.write("</BlastOutput>\n")


def xml_new_iter(out: IO, template: int, t_len: int, name: str) -> None:
    """newIterXML (xml.c:82-90)."""
    out.write("<Iteration>\n")
    out.write("\t<Iteration_iter-num>%d</Iteration_iter-num>\n" % template)
    out.write("\t<Iteration_query-ID>Query_%d</Iteration_query-ID>\n"
              % template)
    out.write("\t<Iteration_query-def>%s</Iteration_query-def>\n" % name)
    out.write("\t<Iteration_query-len>%d</Iteration_query-len>\n" % t_len)
    out.write("<Iteration_hits>\n")


def _entropy(q: np.ndarray, ln: int) -> float:
    """getEntropy (xml.c:92-128)."""
    if ln == 0:
        return 0.0
    counts = np.bincount(np.asarray(q[:ln], np.uint8), minlength=256)
    h = 0.0
    for c in counts:
        if c:
            p = c / ln
            h -= p * math.log2(p)
    return h


def xml_cap_iter(out: IO, db_size: int, seqsize: int, t_len: int,
                 read_counts: int, p_value: float, read_score: int,
                 assem_q, aln_len: int) -> None:
    """capIterXML (xml.c:130-145)."""
    out.write("</Iteration_hits>\n")
    out.write("\t<Iteration_stat>\n")
    out.write("\t\t<Statistics>\n")
    out.write("\t\t\t<Statistics_db-num>%d</Statistics_db-num>\n" % db_size)
    out.write("\t\t\t<Statistics_db-len>%d</Statistics_db-len>\n" % seqsize)
    out.write("\t\t\t<Statistics_hsp-len>%d</Statistics_hsp-len>\n"
              % read_counts)
    out.write("\t\t\t<Statistics_eff-space>%d</Statistics_eff-space>\n"
              % (seqsize * t_len))
    out.write("\t\t\t<Statistics_kappa>%4.1e</Statistics_kappa>\n"
              % (p_value * read_score))
    out.write("\t\t\t<Statistics_lambda>%4.1e</Statistics_lambda>\n"
              % p_value)
    out.write("\t\t\t<Statistics_entropy>%f</Statistics_entropy>\n"
              % _entropy(assem_q, aln_len))
    out.write("\t\t</Statistics>\n")
    out.write("\t</Iteration_stat>\n")
    out.write("</Iteration>\n")


class XmlHitWriter:
    """hitXML (xml.c:147-230); the hit number is a process-wide counter.

    The reference prints the assembly thread's REUSED Aln buffers with
    %s, so each Hsp string runs past the current alignment into leftover
    bytes of earlier (longer) alignments until the first NUL.  The buffer
    lifecycle (code bytes written by every KMA call, in-place ASCII
    conversion by each printed hit, doubling reallocation that resets the
    content, assembly.c:398-411) is emulated here for byte parity.

    Two reference behaviors are undefined and deliberately NOT copied:
    (1) Hsp_bit-score prints ``aligned->score`` (xml.c:210), a field no
    code ever assigns -- the Aln struct is plain smalloc'd (runkma.c:660,
    mt1.c:293), so the reference emits uninitialized heap bytes (zero on
    fresh pages, garbage on recycled heap).  We print the fresh KMA
    realignment's AlnScore.score, the evidently intended value.
    (2) The smalloc'd Hsp buffers start with recycled-heap garbage before
    the first overlay; ours start zeroed (the fresh-mmap case), which is
    the only deterministic choice.  Both make large-run reference XML
    unreproducible bit-for-bit even against itself across allocator
    states; small fresh-heap runs (the db50 goldens) match exactly."""

    def __init__(self, out: IO, rew, delta: int = 1024):
        self.out = out
        self.num = 0
        self.rew = rew
        self.delta = delta
        self._alloc()

    def _alloc(self):
        cap = (self.delta + 1) << 1
        self.bt = bytearray(cap)
        self.bs = bytearray(cap)
        self.bq = bytearray(cap)

    def maybe_realloc(self, q_len: int) -> None:
        """assembly.c:398-411: fresh (practically zeroed) buffers when a
        longer read arrives."""
        if self.delta < q_len:
            self.delta = q_len << 1
            self._alloc()

    def overlay(self, aligned) -> None:
        """KMA wrote this alignment's code bytes into the shared buffers."""
        ln = len(aligned.t)
        self.bt[:ln] = bytes(bytearray(aligned.t))
        self.bs[:ln] = bytes(bytearray(aligned.s))
        self.bq[:ln] = bytes(bytearray(aligned.q))
        # only s is NUL-terminated by KMA (align.c:502); t/q leak
        self.bs[ln] = 0

    @staticmethod
    def _cstr(buf: bytearray) -> str:
        end = buf.find(b"\x00")
        if end < 0:
            end = len(buf)
        return buf[:end].decode("latin1")

    def hit(self, template: int, header: bytes, aligned, st, flag: int
            ) -> None:
        d = self.rew.d
        t = np.asarray(aligned.t, np.uint8)
        s = np.asarray(aligned.s, np.uint8)
        q = np.asarray(aligned.q, np.uint8)
        ln = len(t)
        # vectorized stat pass (hitXML's per-column loop): the `gap`
        # state is 0 only before the FIRST column (every column sets
        # it), so exactly one gap-open can count -- at column 0
        mid = s == ord("_")
        gapcol = mid & ((t == 5) | (q == 5))
        W1s = 1 if (ln and gapcol[0]) else 0
        Us = int(gapcol.sum()) - W1s
        Ms = int(ln - mid.sum())
        MMs = int((mid & ~gapcol).sum())
        # d is 5x5; gap columns (code 5) never read it in the scalar
        # loop, so clip the indexes and mask them out
        dpos = np.asarray(d)[np.minimum(t, 4), np.minimum(q, 4)] > 0
        pos = int((dpos & ~gapcol).sum())
        if ln:
            base_lut = np.frombuffer(BASES.encode(), np.uint8)
            self.bt[:ln] = base_lut[t].tobytes()
            self.bq[:ln] = base_lut[q].tobytes()
            self.bs[:ln] = np.where(mid, np.uint8(ord(" ")), s).tobytes()
        pos += W1s * (0 < self.rew.W1) + Us * (0 < self.rew.U)

        self.num += 1
        name = header.split(b"\x00", 1)[0].decode("latin1")
        o = self.out
        o.write("<Hit>\n")
        o.write("\t<Hit_num>%d</Hit_num>\n" % self.num)
        o.write("\t<Hit_id>gnl|BL_ORD_ID|%d</Hit_id>\n" % (template + 1))
        o.write("\t<Hit_def>%s</Hit_def>\n" % name)
        o.write("\t<Hit_accession>%d</Hit_accession>\n" % template)
        o.write("\t<Hit_len>%d</Hit_len>\n" % ln)
        o.write("\t<Hit_hsps>\n")
        o.write("\t\t<Hsp>\n")
        o.write("\t\t\t<Hsp_num>1</Hsp_num>\n")
        o.write("\t\t\t<Hsp_bit-score>%d</Hsp_bit-score>\n" % st.score)
        o.write("\t\t\t<Hsp_score>%d</Hsp_score>\n" % aligned.mapQ)
        o.write("\t\t\t<Hsp_evalue>%f</Hsp_evalue>\n"
                % (10.0 ** (aligned.mapQ / -10.0)))
        qf = aligned.end if (flag & 16) else aligned.start
        qt = aligned.start if (flag & 16) else aligned.end
        o.write("\t\t\t<Hsp_query-from>%d</Hsp_query-from>\n" % (qf + 1))
        o.write("\t\t\t<Hsp_query-to>%d</Hsp_query-to>\n" % (qt + 1))
        o.write("\t\t\t<Hsp_hit-from>%d</Hsp_hit-from>\n" % (st.pos + 1))
        o.write("\t\t\t<Hsp_hit-to>%d</Hsp_hit-to>\n"
                % (st.pos + st.len - st.tGaps + 1))
        o.write("\t\t\t<Hsp_query-frame>%d</Hsp_query-frame>\n"
                % (aligned.start % 3))
        o.write("\t\t\t<Hsp_hit-frame>%d</Hsp_hit-frame>\n" % (st.pos % 3))
        o.write("\t\t\t<Hsp_identity>%d</Hsp_identity>\n" % Ms)
        o.write("\t\t\t<Hsp_positive>%d</Hsp_positive>\n" % pos)
        o.write("\t\t\t<Hsp_gaps>%d</Hsp_gaps>\n" % (W1s + Us))
        o.write("\t\t\t<Hsp_align-len>%d</Hsp_align-len>\n" % ln)
        o.write("\t\t\t<Hsp_qseq>%s</Hsp_qseq>\n" % self._cstr(self.bq))
        o.write("\t\t\t<Hsp_hseq>%s</Hsp_hseq>\n" % self._cstr(self.bt))
        o.write("\t\t\t<Hsp_midline>%s</Hsp_midline>\n" % self._cstr(self.bs))
        o.write("\t\t</Hsp>\n")
        o.write("\t</Hit_hsps>\n")
        o.write("</Hit>\n")
