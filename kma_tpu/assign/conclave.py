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


def invert_qbounds(header: bytes, q_len: int) -> bytes:
    """conclave.c:137-145: mirror the header-tail query bounds for a read
    assigned to the reverse strand."""
    import struct
    if len(header) > 9 and header[len(header) - 9] == 0:
        s, e = struct.unpack_from("<ii", header, len(header) - 8)
        return header[:-8] + struct.pack("<ii", q_len - e, q_len - s)
    return header


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


class RecordSpool:
    """maxFrag-bounded record store (-mf; conclave.c:196-208 + tmp.c).

    Records beyond the cap spill to an unlinked tmp file; iteration
    replays the spilled prefix then the RAM tail, any number of times
    (ConClave-2 streams the spool three times)."""

    def __init__(self, max_frag: int = 1000000, tmpdir=None):
        self.max_frag = max(1, max_frag)
        self.tmpdir = tmpdir
        self.mem: List[FragRecord] = []
        self.file = None
        self.n_spilled = 0

    def append(self, rec: "FragRecord") -> None:
        self.mem.append(rec)
        if len(self.mem) >= self.max_frag:
            self._spill()

    def extend(self, recs) -> None:
        for r in recs:
            self.append(r)

    def _spill(self) -> None:
        import pickle
        import tempfile
        if self.file is None:
            self.file = tempfile.TemporaryFile(dir=self.tmpdir,
                                               prefix="kma_frag_spool_")
        for r in self.mem:
            pickle.dump(r, self.file, protocol=pickle.HIGHEST_PROTOCOL)
        self.n_spilled += len(self.mem)
        self.mem.clear()

    def __len__(self) -> int:
        return self.n_spilled + len(self.mem)

    def __iter__(self):
        import pickle
        if self.file is not None:
            self.file.seek(0, 2)
            end = self.file.tell()
            self.file.seek(0)
            for _ in range(self.n_spilled):
                yield pickle.load(self.file)
            self.file.seek(end)
        yield from self.mem


class FragSpool:
    """-mf-bounded per-template fragment store (conclave.c:196-208,
    printFrags frags.c:30-62): when the in-memory fragment count passes
    max_frag, the current per-template lists are drained template-sorted
    (each list LIFO, matching the reference's linked-list drain) into a
    tmpfile "flush chunk".  Assembly consumes templates in ascending id
    order (runkma.c:736), so each spill file needs only one forward
    cursor and resident memory stays bounded by max_frag."""

    def __init__(self, max_frag: int = 1000000, tmpdir=None):
        self.max_frag = max(1, max_frag)
        self.tmpdir = tmpdir
        self.mem: Dict[int, List[Frag]] = {}
        self.n_mem = 0
        self.files: list = []
        self._cursors = None

    def append(self, template: int, frag: "Frag") -> None:
        self.mem.setdefault(template, []).append(frag)
        self.n_mem += 1

    def maybe_flush(self) -> None:
        """Flush check AFTER a whole record incl. its PE mate
        (conclave.c:196 runs after the mate block, so pairs never split
        across chunks)."""
        if self.n_mem >= self.max_frag:
            self._flush()

    def _flush(self) -> None:
        import pickle
        import tempfile
        f = tempfile.TemporaryFile(dir=self.tmpdir,
                                   prefix="kma_frag_lists_")
        for t in sorted(self.mem):
            lst = self.mem[t]
            lst.reverse()  # LIFO drain (frags.c:40-56)
            pickle.dump((t, lst), f, protocol=pickle.HIGHEST_PROTOCOL)
        pickle.dump((None, None), f, protocol=pickle.HIGHEST_PROTOCOL)
        self.files.append(f)
        self.mem = {}
        self.n_mem = 0

    def finalize(self) -> None:
        import pickle
        for lst in self.mem.values():
            lst.reverse()
        self._cursors = []
        for f in self.files:
            f.flush()
            f.seek(0)
            t, lst = pickle.load(f)
            self._cursors.append([t, lst, f])

    def get(self, template: int, default=None):
        """Frags for `template` (ascending request order)."""
        import pickle
        if self._cursors is None:
            self.finalize()
        out: List[Frag] = []
        for cur in self._cursors:
            while cur[0] is not None and cur[0] < template:
                cur[0], cur[1] = pickle.load(cur[2])
            if cur[0] == template:
                out.extend(cur[1])
                cur[0], cur[1] = pickle.load(cur[2])
        out.extend(self.mem.get(template, ()))
        return out if out else ([] if default is None else default)


def run_conclave1(records: List[FragRecord], db_size: int,
                  alignment_scores: np.ndarray,
                  uniq_alignment_scores: np.ndarray,
                  template_lengths: np.ndarray,
                  w_scores: np.ndarray,
                  fragment_counts: Optional[np.ndarray] = None,
                  read_counts: Optional[np.ndarray] = None,
                  lc: bool = False, max_frag: int = 1000000,
                  tmpdir=None) -> "FragSpool":
    """ConClave-1 (runConClave, conclave.c:43-213; _lc variant :215-384).

    Returns per-template fragment lists in printFrags order: the reference
    PREPENDS to per-template linked lists and drains them LIFO
    (conclave.c:164-165, frags.c:40-56), so lists here are reversed at the
    end to match the file order consumed by assembly.
    """
    frag_lists = FragSpool(max_frag, tmpdir)
    # a 0-hit record (possible from penalty/force PE) reads the previous
    # record's buffer slots in the reference (conclave.c:125-127)
    stale = (0, 0, 0)
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
        elif rec.templates:
            bestTemplate = rec.templates[0]
            start = rec.starts[0]
            end = rec.ends[0]
        else:
            bestTemplate, start, end = stale
        if rec.templates:
            stale = (rec.templates[0], rec.starts[0], rec.ends[0])

        codes = rec.codes
        header = rec.header
        flag = rec.flag
        if bestTemplate < 0:
            bestTemplate = -bestTemplate
            from ..io.seq import rc_codes
            codes = rc_codes(codes)
            flag |= 16
            header = invert_qbounds(header, rec.q_len)

        w_scores[bestTemplate] += read_score
        if fragment_counts is not None:
            fragment_counts[bestTemplate] += 1
            read_counts[bestTemplate] += 1

        frag = Frag(q_len=rec.q_len, best_hits=best_hits,
                    score=0 if rec.best_hits < 0 else read_score,
                    start=start, end=end, header=header, flag=flag,
                    codes=codes)
        frag_lists.append(bestTemplate, frag)

        if rec.score < 0:
            # PE mate record follows (conclave.c:169-194): same template,
            # same start/end/score, its own codes/header/flag
            if read_counts is not None:
                read_counts[bestTemplate] += 1
            mate = Frag(q_len=len(rec.mate_codes), best_hits=best_hits,
                        score=0 if rec.best_hits < 0 else read_score,
                        start=start, end=end, header=rec.mate_header,
                        flag=rec.mate_flag, codes=rec.mate_codes)
            frag_lists.append(bestTemplate, mate)
        frag_lists.maybe_flush()

    # reference drains LIFO per template
    frag_lists.finalize()
    return frag_lists


def _cc1_choice(rec: FragRecord, alignment_scores, uniq_alignment_scores,
                template_lengths, lc: bool = False, init_bt: int = -1):
    """The CC1 tie-break cascade over one record's candidates
    (conclave.c:80-123; pass C of CC2 starts from bestTemplate=0,
    conclave.c:604)."""
    best_hits = abs(rec.best_hits)
    if best_hits <= 1:
        if not rec.templates:
            return None  # caller substitutes its stale buffer
        return rec.templates[0], rec.starts[0], rec.ends[0]
    bestTemplate = init_bt
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
                      or (tmp_score == bestScore
                          and (a > best_read_score
                               or (a == best_read_score
                                   and (u > bestNum
                                        or (u == bestNum
                                            and t < abs(bestTemplate)))))))
        else:
            better = (a > best_read_score
                      or (a == best_read_score
                          and (tmp_score > bestScore
                               or (tmp_score == bestScore
                                   and (u > bestNum
                                        or (u == bestNum
                                            and t < abs(bestTemplate)))))))
        if better:
            bestTemplate = tt
            best_read_score = a
            bestScore = tmp_score
            bestNum = u
            start = rec.starts[i]
            end = rec.ends[i]
    return bestTemplate, start, end


def run_conclave2(records: List[FragRecord], db_size: int,
                  alignment_scores: np.ndarray,
                  uniq_alignment_scores: np.ndarray,
                  template_lengths: np.ndarray, w_scores: np.ndarray,
                  template_tot_ulen: int, scoreT: float, evalue: float,
                  cmp, fragment_counts: Optional[np.ndarray] = None,
                  read_counts: Optional[np.ndarray] = None,
                  lc: bool = False, max_frag: int = 1000000,
                  tmpdir=None) -> "FragSpool":
    """ConClave-2 (runConClave2, conclave.c:386-747).

    Pass A: CC1 w_scores; significance filter drops weak templates
    (conclave.c:477-491).  Pass B: reads now uniquely resolved add their
    score to uniq_alignment_scores.  Pass C: still-ambiguous reads are
    assigned by deterministic weighted sampling over uniq scores with a
    Park-Miller LCG seeded from the read's first/last 7 bases
    (conclave.c:564-580); reads with no surviving candidate fall back to
    the CC1 cascade, and zero-pick reads are dropped.
    """
    from ..utils.stats import p_chisqr

    # pass A (stale-buffer fallback for 0-hit records as in CC1)
    stale_bt = 0
    for rec in records:
        res = _cc1_choice(rec, alignment_scores, uniq_alignment_scores,
                          template_lengths, lc)
        bt = stale_bt if res is None else res[0]
        if rec.templates:
            stale_bt = rec.templates[0]
        w_scores[abs(bt)] += abs(rec.score)

    Nhits = int(w_scores[1:db_size].sum())
    ld = np.longdouble
    for template in range(1, db_size):
        read_score = int(w_scores[template])
        if read_score:
            t_len = int(template_lengths[template])
            expected = ld(t_len) / ld(max(1, template_tot_ulen - t_len)) \
                * ld(Nhits - read_score)
            q_value = ((ld(read_score) - expected)
                       / (expected + ld(read_score))
                       * (ld(read_score) - expected))
            p_value = p_chisqr(q_value)
            if not cmp(p_value <= evalue and read_score > expected,
                       read_score >= scoreT * t_len):
                w_scores[template] = 0

    # pass B
    for rec in records:
        best_hits = abs(rec.best_hits)
        if best_hits != 1:
            bt = 0
            ok = True
            for tt in rec.templates:
                t = abs(tt)
                if w_scores[t]:
                    if bt:
                        ok = False
                        break
                    bt = t
            if ok and bt:
                uniq_alignment_scores[bt] += abs(rec.score)

    # pass C
    w_scores[:] = 0
    frag_lists = FragSpool(max_frag, tmpdir)
    # a 0-hit record (possible from penalty/force PE) reads the previous
    # record's buffer slots in the reference (conclave.c:125-127)
    stale = (0, 0, 0)
    for rec in records:
        best_hits = abs(rec.best_hits)
        read_score = abs(rec.score)
        if best_hits != 1:
            bestTemplate = 0
            start = end = 0
            tot = sum(int(uniq_alignment_scores[abs(t)])
                      for t in rec.templates)
            q_len = rec.q_len
            if tot and 16 <= q_len:
                seq = rec.codes
                rand = int(seq[0])
                j = q_len
                for i in range(7):
                    j -= 1
                    rand = (((rand << 2) | int(seq[i])) << 2) | int(seq[j])
                rand = 16807 * (rand % 127773) - 2836 * (rand // 127773)
                if rand <= 0:
                    rand += 0x7FFFFFFF
                rand_score = int(rand / 0x7FFFFFFF * tot)
                score = 0
                for i, tt in enumerate(rec.templates):
                    score += int(uniq_alignment_scores[abs(tt)])
                    if rand_score < score:
                        bestTemplate = tt
                        start = rec.starts[i]
                        end = rec.ends[i]
                        break
                if bestTemplate == 0:
                    tot = 0
            else:
                tot = 0
            if tot == 0:
                res = _cc1_choice(rec, alignment_scores,
                                  uniq_alignment_scores, template_lengths,
                                  lc, init_bt=0)
                # pass C runs the cascade even over 0 candidates -> 0
                bestTemplate, start, end = res if res is not None \
                    else (0, 0, 0)
        elif rec.templates:
            bestTemplate = rec.templates[0]
            start = rec.starts[0]
            end = rec.ends[0]
        else:
            bestTemplate, start, end = stale
        if rec.templates:
            stale = (rec.templates[0], rec.starts[0], rec.ends[0])

        codes = rec.codes
        flag = rec.flag
        header = rec.header
        if bestTemplate < 0:
            bestTemplate = -bestTemplate
            from ..io.seq import rc_codes
            codes = rc_codes(codes)
            flag |= 16
            header = invert_qbounds(header, rec.q_len)
        if bestTemplate:
            w_scores[bestTemplate] += read_score
            if fragment_counts is not None:
                fragment_counts[bestTemplate] += 1
                read_counts[bestTemplate] += 1
            frag = Frag(q_len=rec.q_len, best_hits=best_hits,
                        score=0 if rec.best_hits < 0 else read_score,
                        start=start, end=end, header=header, flag=flag,
                        codes=codes)
            frag_lists.append(bestTemplate, frag)
            if rec.score < 0:
                if read_counts is not None:
                    read_counts[bestTemplate] += 1
                mate = Frag(q_len=len(rec.mate_codes), best_hits=best_hits,
                            score=0 if rec.best_hits < 0 else read_score,
                            start=start, end=end, header=rec.mate_header,
                            flag=rec.mate_flag, codes=rec.mate_codes)
                frag_lists.append(bestTemplate, mate)
            frag_lists.maybe_flush()

    frag_lists.finalize()
    return frag_lists
