"""End-to-end mapping pipeline: the runKMA flow (reference runkma.c:130-908).

Stages (in-process instead of the reference's pipe-chained processes):
  1. read input + trimming          (io.pipeline.iter_reads)
  2. k-mer scan -> anker records     (mapping.scan.SaveKmersScanner)
  3. per-candidate alignment scoring (alnFragsSE, alnfrags.c:1052-1218)
  4. ConClave-1 assignment           (assign.conclave)
  5. per-template assembly/consensus (assemble.pileup)
  6. output files                    (out.writers)
"""

from __future__ import annotations

import sys
from typing import Dict, List, Optional

import numpy as np

from .align.cci import TemplateIndex
from .align.kma_aln import (Penalty, Points, anker_rc_comp, kma_align,
                            set_preseed_exhaustive)
from .assemble.pileup import (Assem, AssemblyMatrix, call_consensus,
                              get_extended_features, trim_dual_gaps)
from .assign.conclave import Frag, FragRecord, run_conclave1
from .config import MapConfig
from .index.format import KmaIndex, load_index, seq_offsets
from .io.pipeline import Read, iter_reads
from .io.seq import rc_codes, unpack_2bit
from .mapping.scan import SaveKmersScanner
from .out import writers
from .utils.stats import CMP, p_chisqr


def mrcheck(mrc: float, st, q_len: int, t_len: int) -> bool:
    """alnfrags.c:38."""
    return (mrc * q_len <= st.len - st.qGaps
            or mrc * t_len <= st.len - st.tGaps)


class TemplateStore:
    """Lazy per-template CCI indexes over .seq.b (templates_index[],
    runkma.c:203, alignLoad_fly)."""

    def __init__(self, seq_path: str, template_lengths: np.ndarray,
                 kmersize: int):
        self.seq_path = seq_path
        self.lengths = template_lengths
        self.offsets = seq_offsets(template_lengths)
        self.kmersize = kmersize
        self.cache: Dict[int, TemplateIndex] = {}

    def get(self, template: int) -> TemplateIndex:
        ti = self.cache.get(template)
        if ti is None:
            t_len = int(self.lengths[template])
            nwords = (t_len >> 5) + 1
            with open(self.seq_path, "rb") as f:
                f.seek(int(self.offsets[template]))
                words = np.fromfile(f, dtype="<u8", count=nwords)
            ti = TemplateIndex(unpack_2bit(words, t_len), self.kmersize)
            self.cache[template] = ti
        return ti


def aln_frags_se(store: TemplateStore, matched_templates: np.ndarray,
                 rc_flag: int, codes: np.ndarray, codes_r: np.ndarray,
                 n_pos: np.ndarray, n_pos_r: np.ndarray, header: bytes,
                 flag: int, kmersize: int, minlen: int, mq: int,
                 scoreT: float, mrc: float, rew: Penalty,
                 points: Points) -> Optional[FragRecord]:
    """alnFragsSE (alnfrags.c:1052-1218): score the read against every
    candidate template, keep best hits, emit the spool record."""
    q_len = len(codes)
    arc = rc_flag < 0
    Wl = -rew.Wl

    best_templates: List[int] = []
    best_start: List[int] = []
    best_end: List[int] = []
    scores: List[int] = []
    lengths: List[int] = []
    bestScore = 0.0
    best_read_score = 0

    for tt in matched_templates.tolist():
        template = tt
        tindex = store.get(abs(template))
        t_len = tindex.len
        # q-bound (alnfrags.c:1091-1099): chain/HMM records carry bounds
        q_start, q_end = 0, q_len
        if len(header) > 2 * 4 + 1 and header[len(header) - 2 * 4 - 1] == 0:
            import struct
            q_start, q_end = struct.unpack_from("<ii", header,
                                                len(header) - 8)

        points.len = 0
        if arc:
            rc = anker_rc_comp(tindex, codes, codes_r, n_pos, n_pos_r, q_len,
                               q_start, q_end, points, 1)
            if rc < 0:
                if 0 < template:
                    template = -template
                st, _, _ = kma_align(tindex, codes_r, q_len,
                                     q_len - q_end, q_len - q_start, 0, 0,
                                     mq, rew, points, kmersize,
                                     traceback=False, n_positions=n_pos_r)
            elif rc:
                if template < 0:
                    template = -template
                st, _, _ = kma_align(tindex, codes, q_len, q_start, q_end,
                                     0, 0, mq, rew, points, kmersize,
                                     traceback=False, n_positions=n_pos)
            else:
                from .align.nw import AlnScore
                st = AlnScore()
                points.len = 0
        else:
            if template < 0:
                st, _, _ = kma_align(tindex, codes_r, q_len, q_len - q_end,
                                     q_len - q_start, 0, 0, mq, rew, points,
                                     kmersize, traceback=False,
                                     n_positions=n_pos_r)
            else:
                st, _, _ = kma_align(tindex, codes, q_len, q_start, q_end,
                                     0, 0, mq, rew, points, kmersize,
                                     traceback=False, n_positions=n_pos)

        aln_len = st.len
        start = st.pos
        end = start + aln_len - st.tGaps
        if t_len < end:
            end -= t_len
        # normed score denominator (alnfrags.c:1140-1154)
        if q_len <= aln_len or t_len <= aln_len:
            denom = float(aln_len)
        else:
            denom = float(q_len if q_len < t_len else t_len)
        read_score = st.score
        if minlen <= aln_len and mrcheck(mrc, st, q_len, t_len):
            score = read_score / denom
        else:
            read_score = 0
            score = 0.0

        if kmersize < read_score and scoreT <= score:
            best_templates.append(template)
            best_start.append(start)
            best_end.append(end)
            scores.append(read_score)
            lengths.append(aln_len)
            if bestScore < score:
                bestScore = score
            if best_read_score < read_score:
                best_read_score = read_score

    if best_read_score > kmersize:
        return update_scores(codes, q_len, 1.0, len(best_templates),
                             best_read_score, bestScore, best_start,
                             best_end, best_templates, scores, lengths,
                             header, flag)
    return None


def update_scores(codes: np.ndarray, q_len: int, min_frac: float,
                  counter: int, best_read_score: int, best_score: float,
                  starts: List[int], ends: List[int], templates: List[int],
                  scores: List[int], lengths: List[int], header: bytes,
                  flag: int) -> FragRecord:
    """update_Scores (updatescores.c:203-298), minFrac == 1.0 path.

    NOTE: `minScore = score / Lengths[i]` is C INTEGER division assigned to
    a double (updatescores.c:220) while best_score is a float ratio; the
    filter is effectively `score == bestReadScore` plus exact int/float
    coincidences — reproduced verbatim.
    """
    sel_t: List[int] = []
    sel_s: List[int] = []
    sel_e: List[int] = []
    sel_score: List[int] = []
    for i in range(counter):
        score = scores[i]
        ln = lengths[i]
        min_score = float(score // ln if (score >= 0) == (ln > 0)
                          else -((-score) // ln)) if ln else 0.0
        if min_score == best_score or score == best_read_score:
            sel_t.append(templates[i])
            sel_s.append(starts[i])
            sel_e.append(ends[i])
            sel_score.append(score)
    return FragRecord(q_len=q_len, best_hits=len(sel_t),
                      score=best_read_score, header=header, flag=flag,
                      codes=codes, starts=sel_s, ends=sel_e,
                      templates=sel_t, ), sel_score


def run_kma(db_prefix: str, output_prefix: str, input_files: List[str],
            cfg: MapConfig, exe_cmd: str = "kma_tpu") -> int:
    """The runKMA flow (runkma.c:130-908) for the -1t1 SE path."""
    idx = load_index(db_prefix)
    db_size = idx.db_size
    template_lengths = idx.template_lengths.astype(np.int64)
    kmersize = cfg.kmersize or int(template_lengths[0])
    if kmersize < 4 or 31 < kmersize:
        kmersize = 16
    names = idx.names

    pen = cfg.penalties
    dmat = pen.score_matrix()
    rew = Penalty(M=pen.M, MM=pen.MM, U=pen.U, W1=pen.W1, Wl=pen.Wl, d=dmat)
    set_preseed_exhaustive(1 if cfg.exhaustive else 0)

    alignment_scores = np.zeros(db_size, dtype=np.int64)
    uniq_alignment_scores = np.zeros(db_size, dtype=np.int64)

    store = TemplateStore(db_prefix + ".seq.b", template_lengths, kmersize)
    scanner = SaveKmersScanner(idx, pen, exhaustive=cfg.exhaustive)
    points = Points()

    # --- steps 1-3: trim, scan, align, spool -----------------------------
    records: List[FragRecord] = []
    for read in iter_reads(input_files, min_phred=cfg.min_phred,
                           hardmask_q=cfg.hardmask_q, min_q=cfg.min_q,
                           min_len=cfg.min_len, max_len=cfg.max_len):
        hit = scanner.scan(read.codes, read.n_positions, read.header)
        if hit is None:
            continue
        codes = hit.codes
        q_len = len(codes)
        if kmersize > q_len:
            continue
        codes_r = rc_codes(codes)
        n_pos = hit.n_positions.astype(np.int64)
        n_pos_r = np.sort((q_len - 1) - n_pos[::-1]) if len(n_pos) else n_pos
        res = aln_frags_se(store, hit.templates, hit.rc_flag, codes, codes_r,
                           n_pos, n_pos_r, hit.header, hit.flag, kmersize,
                           cfg.min_len, cfg.mq, cfg.score_t, cfg.mrc, rew,
                           points)
        if res is None:
            continue
        rec, sel_scores = res
        # global score accumulation (updatescores.c:217-281, minFrac==1.0)
        if rec.best_hits == 1:
            t = abs(rec.templates[0])
            alignment_scores[t] += sel_scores[0]
            uniq_alignment_scores[t] += rec.score
        else:
            for i, t in enumerate(rec.templates):
                alignment_scores[abs(t)] += sel_scores[i]
        records.append(rec)

    # --- ConClave --------------------------------------------------------
    w_scores = np.zeros(db_size, dtype=np.int64)
    need_counts = bool(cfg.tsv or cfg.xml) or cfg.sasm or True
    fragment_counts = np.zeros(db_size, dtype=np.int64)
    read_counts = np.zeros(db_size, dtype=np.int64)
    frag_lists = run_conclave1(records, db_size, alignment_scores,
                               uniq_alignment_scores, template_lengths,
                               w_scores, fragment_counts, read_counts)

    template_tot_ulen = int(template_lengths[1:db_size].sum())
    Nhits = int(w_scores[1:].sum()) or 1

    # --- outputs ---------------------------------------------------------
    res_out = open(output_prefix + ".res", "w")
    res_out.write(writers.RES_HEADER)
    fsa_out = aln_out = None
    if (cfg.nc & 1) == 0:
        fsa_out = open(output_prefix + ".fsa", "w")
    if (cfg.nc & 2) == 0:
        aln_out = open(output_prefix + ".aln", "w")
        if fsa_out is None:
            fsa_out = open(output_prefix + ".fsa", "w")
    frag_out = None if cfg.nf else writers.open_gz(output_prefix + ".frag.gz")
    matrix_out = (writers.open_gz(output_prefix + ".mat.gz")
                  if cfg.print_matrix else None)
    mapstat_out = None

    cmp = CMP[cfg.cmp_mode]
    status = 0

    # --- assembly per template (runkma.c:763-863) ------------------------
    for template in range(1, db_size):
        if w_scores[template] <= 0:
            continue
        read_score = int(w_scores[template])
        t_len = int(template_lengths[template])
        expected = t_len / max(1, (template_tot_ulen - t_len)) \
            * (Nhits - read_score)
        if 0 < expected:
            q_value = ((read_score - expected) / (expected + read_score)
                       * (read_score - expected))
        else:
            q_value = float(read_score)
        p_value = p_chisqr(q_value)
        name = names[template - 1].decode("latin1")
        if not cmp(p_value <= cfg.evalue and read_score > expected,
                   read_score >= cfg.score_t * t_len):
            continue

        tindex = store.get(template)
        assem, matrix = assemble_template(
            tindex, t_len, frag_lists.get(template, []), kmersize, cfg, rew,
            points, name, frag_out)
        if assem.cover > 0:
            cover_score = assem.cover
            depth = assem.depth / t_len
            id_ = 100.0 * cover_score / t_len
            aln_len = assem.aln_len
            q_id = 100.0 * cover_score / aln_len
            cover = 100.0 * aln_len / t_len
            q_cover = 100.0 * t_len / aln_len
        else:
            aln_len = 0
            id_ = 0.0
            depth = q_id = cover = q_cover = 0.0

        if cfg.ID_t <= id_ and 0 < id_ and cfg.Depth_t <= depth:
            res_out.write(writers.res_row(name, read_score, expected, t_len,
                                          id_, cover, q_id, q_cover, depth,
                                          q_value, p_value))
            if fsa_out is not None:
                trim_dual_gaps(assem)
                writers.print_consensus(assem, name, aln_out, fsa_out,
                                        cfg.ref_fsa)
            if matrix_out is not None:
                matrix_out.write(writers.matrix_rows(
                    matrix, tindex.codes, name, t_len))

    res_out.close()
    for f in (fsa_out, aln_out, frag_out, matrix_out, mapstat_out):
        if f is not None:
            f.close()
    return status


def assemble_template(tindex: TemplateIndex, t_len: int, frags: List[Frag],
                      kmersize: int, cfg: MapConfig, rew: Penalty,
                      points: Points, name: str, frag_out):
    """assemble_KMA for one template (assembly.c:1689-2127)."""
    from .out.writers import frag_row

    assem = Assem()
    matrix = AssemblyMatrix(t_len)
    Wl = rew.Wl

    for frag in frags:
        codes = frag.codes
        q_len = frag.q_len
        header = frag.header
        # q-bound (assembly.c:1916-1924)
        q_start, q_end = 0, q_len
        if len(header) > 2 * 4 + 1 and header[len(header) - 2 * 4 - 1] == 0:
            import struct
            q_start, q_end = struct.unpack_from("<ii", header,
                                                len(header) - 8)
        stats2, stats3 = frag.start, frag.end
        read_score = frag.score
        if read_score or _anker_rc_bytes(tindex, codes, q_len, q_start,
                                         q_end, points):
            if stats3 <= stats2:
                stats2, stats3 = 0, t_len
            points.len = 0
            st, aligned, mapq = kma_align(
                tindex, codes, q_len, q_start, q_end, stats2,
                min(t_len, stats3), cfg.mq, rew, points, kmersize,
                traceback=True, circular=cfg.circular, ts=cfg.ts,
                skip_tails=cfg.skip_tail_aln)
            aln_len = st.len
            start = st.pos
            end = start + aln_len - st.tGaps
            if t_len < end:
                end -= t_len
            read_score = st.score
            # assembly.c:1946-1953 adds the RAW (negative) Wl per touched
            # template end — a penalty, unlike alnfrags.c:1077 which negates
            if start == 0:
                read_score += Wl
            if end == t_len:
                read_score += Wl
            if cfg.min_len <= aln_len and mrcheck(cfg.mrc, st, q_len, t_len):
                score = 1.0 * read_score / aln_len
            else:
                read_score = 0
                score = 0.0
            if 0 < read_score and cfg.score_t <= score:
                stats = [frag.best_hits, read_score, start,
                         end - t_len if t_len < end else end, frag.flag]
                matrix.aln_to_mat(assem, aligned.t, aligned.s, aligned.q,
                                  st.score, st.pos, frag.flag)
                if frag_out is not None:
                    frag_out.write(frag_row(codes, stats, name, header))

    if assem.score:
        call_consensus(matrix, assem, tindex.codes, t_len, cfg.bcd,
                       cfg.evalue, cfg.support, cfg.base_caller,
                       cfg.significant)
    else:
        assem.t = np.empty(0, np.uint8)
        assem.s = np.empty(0, np.uint8)
        assem.q = np.empty(0, np.uint8)
        assem.len = 0
    return assem, matrix


def _anker_rc_bytes(tindex, codes, q_len, q_start, q_end, points) -> int:
    """anker_rc fallback for score-0 frags (align.c:780); not used by the
    default SE path where ConClave scores are positive."""
    return 0
