"""Sparse mapping mode (`kma -Sparse`): k-mer counting without alignment.

Reference: sparse.c (translateToKmersAndDump:50-131, run_input_sparse:
246-336, save_kmers_sparse_batch:338-797), hashtable.c (collect_Kmers:
54-120, withDraw_Kmers:224-270) and hashmapkmers.c.

The greedy winner-takes-k-mers loop is order-sensitive: withDraw_Kmers
early-stops once the chosen template's scores are zeroed, leaving later
list nodes' counts intact for the remaining templates.  The node order is
the reverse traversal of the reference's chained count table, so that
table (bucket sizing, insertion order, realloc rehash) is simulated
exactly here.
"""

from __future__ import annotations

import struct
import sys
from typing import List, Optional, Tuple

import numpy as np

from ..index.format import KmaIndex, murmur
from ..io.seq import kmer_scan, rc_codes
from ..utils.stats import p_chisqr


def load_sparse_length_b(path: str) -> Tuple[np.ndarray, np.ndarray]:
    """Sparse .length.b sections (load_DBs_Sparse, sparse.c:133-177):
    [DB_size][lengths][slengths][ulengths]; the mapper skips lengths and
    uses slengths as "template_lengths" (depth denominator) and ulengths.
    """
    with open(path, "rb") as f:
        (db_size,) = struct.unpack("<i", f.read(4))
        rest = np.fromfile(f, dtype="<u4")
    if len(rest) < 3 * db_size:
        raise SystemExit("DB needs to sparse indexed, "
                         "to run a sparse mapping.")
    return rest[db_size: 2 * db_size].copy(), rest[2 * db_size: 3 * db_size].copy()


def translate_read(codes: np.ndarray, kmersize: int, prefix_len: int,
                   prefix: int) -> List[int]:
    """translateToKmersAndDump (sparse.c:50-131) on one read's byte codes.

    Returns the emitted k-mers of both strands in order (fw then rc).
    Quirk preserved: after a segment too short to scan, the next scan head
    skips kmersize extra positions (sparse.c:96/124).
    """
    from .native_chain import translate_read_native
    nat = translate_read_native(codes, kmersize, prefix_len, prefix)
    if nat is not None:
        return nat.tolist()
    out: List[int] = []
    for strand in (codes, rc_codes(codes)):
        seqlen = len(strand)
        npos = np.flatnonzero(strand == 4).tolist()
        kvals = kmer_scan(strand, kmersize) if seqlen >= kmersize else \
            np.empty(0, dtype=np.uint64)
        if prefix_len:
            pvals = kmer_scan(strand, prefix_len) if seqlen >= prefix_len \
                else np.empty(0, dtype=np.uint64)
        i = 0
        bi = 0
        while i < seqlen:
            while bi < len(npos) and npos[bi] < i:
                bi += 1
            end = npos[bi] if bi < len(npos) else seqlen
            if prefix_len:
                if i < end - kmersize - prefix_len:
                    # kmer starts s in [i+prefix_len, end-kmersize] whose
                    # preceding prefix_len-mer equals the prefix
                    s = np.arange(i + prefix_len, end - kmersize + 1)
                    s = s[pvals[s - prefix_len] == prefix]
                    out.extend(kvals[s].tolist())
                    i = end + 1
                else:
                    i = end + kmersize + 1
            else:
                lo, hi = i, end - kmersize
                if lo <= hi:
                    out.extend(kvals[lo: hi + 1].tolist())
                i = end + kmersize + 1
    return out


class FoundKmers:
    """hashMap_kmers (hashmapkmers.c): chained count table whose bucket
    traversal order determines the withdrawal list order."""

    def __init__(self, size: int, flag: int):
        # round to next power of two (hashmapkmers.c:27-35)
        n = size - 1
        for sh in (1, 2, 4, 8, 16, 32):
            n |= n >> sh
        self.mask = n
        self.flag = flag
        # chains stored head-first: index 0 is the newest (head) node
        self.table: List[List[list]] = [[] for _ in range(n + 1)]
        self.n = 0

    def _bucket(self, key: int) -> int:
        if self.flag:
            return murmur(key) & self.mask
        return key & self.mask

    def count(self, key: int) -> None:
        """hashMap_kmers_CountIndex (hashmapkmers.c:85-120)."""
        chain = self.table[self._bucket(key)]
        for node in chain:
            if node[0] == key:
                node[1] += 1
                return
        if self.n == self.mask:
            self._grow()
            chain = self.table[self._bucket(key)]
        self.n += 1
        chain.insert(0, [key, 1])

    def _grow(self) -> None:
        """reallocHashMap_kmers (hashmapkmers.c:46-83): nodes collected by
        bucket order / head-first into a prepend list, then re-prepended."""
        stack: List[list] = []
        for chain in self.table:
            for node in chain:
                stack.append(node)
        self.mask = ((self.mask + 1) << 1) - 1
        self.table = [[] for _ in range(self.mask + 1)]
        for node in reversed(stack):
            self.table[self._bucket(node[0])].insert(0, node)

    def traverse(self) -> List[list]:
        """Bucket 0..mask, chain head to tail (collect_Kmers order)."""
        out = []
        for chain in self.table:
            out.extend(chain)
        return out


def _collect_kmers(idx: KmaIndex, found: FoundKmers, db_size: int,
                   contamination: Optional[int] = None):
    """collect_Kmers / collect_Kmers_deCon (hashtable.c:54-222): per found
    k-mer node build a withdrawal node and accumulate unique (Scores) and
    total (Scores_tot) hit counts per template.  Lists are built by
    PREPEND; with deCon, nodes whose LAST template is the contamination id
    go to a separate table and do not contribute scores."""
    scores = np.zeros(db_size + 1, dtype=np.int64)
    scores_tot = np.zeros(db_size + 1, dtype=np.int64)
    hits_n = 0
    hits_tot = 0
    kmer_list: List[tuple] = []
    decon_list: List[tuple] = []
    for key, cnt in found.traverse():
        value = idx.lookup(key)
        if value is None:
            continue
        hits_n += 1
        hits_tot += cnt
        full = np.asarray(value, dtype=np.int64)  # [count, t1..tn]
        tpls = full[1:]
        if contamination is not None and int(tpls[-1]) == contamination:
            decon_list.append((cnt, tpls, full))
            continue
        scores[tpls] += 1
        scores_tot[tpls] += cnt
        kmer_list.append((cnt, tpls, full))
    kmer_list.reverse()
    decon_list.reverse()
    return kmer_list, decon_list, scores, scores_tot, hits_n, hits_tot


def intpos_bin(lst, n: int, x: int) -> bool:
    """Literal intpos_bin (hashtable.c:27-52) on [count, t1..tn].

    QUIRK: when the probe walks off the left edge (upLim 0, downLim 1)
    the final equality check lands on pos 0 -- the COUNT cell -- so a
    list whose count equals the searched template and whose smallest
    member exceeds it is a FALSE POSITIVE.  Parity requires keeping it.
    """
    up = n
    if up == 0:
        return False
    down = 1
    pos = (up + down) >> 1
    while 0 < up - down:
        v = int(lst[pos])
        if v == x:
            return True
        if v < x:
            down = pos + 1
        else:
            up = pos - 1
        pos = (up + down) >> 1
    return int(lst[pos]) == x


def _withdraw_kmers(w_scores, w_scores_tot, kmer_list, template):
    """withDraw_Kmers (hashtable.c:224-270): remove all nodes matching
    intpos_bin (membership plus its pos-0 quirk), decrementing every
    member's scores; EARLY STOP once the chosen template is zeroed
    (later nodes stay counted)."""
    out = []
    for i, node in enumerate(kmer_list):
        cnt, tpls, full = node
        if intpos_bin(full, len(tpls), template):
            w_scores[tpls] -= 1
            w_scores_tot[tpls] -= cnt
            if w_scores[template] == 0 and w_scores_tot[template] == 0:
                out.extend(kmer_list[i + 1:])
                return out
        else:
            out.append(node)
    return out


def _pick_best(ss, db_size, search, w_scores, w_scores_tot, slen, ulen,
               nhits_tot, templates_n, id_t, depth_t, evalue):
    """One greedy selection pass (sparse.c:676-763), mutating SearchList.

    Returns (template, score, cover, depth, expected, q_value, p_value);
    template stays 0 when nothing qualifies."""
    etta = 1.0e-6
    depth = 0.0
    cover = 0.0
    score = 0
    template = 0
    expected = q_value = p_value = 0.0
    for i in range(db_size):
        if not search[i]:
            continue
        if ss == "q" and not (w_scores_tot[i] >= score):
            continue
        tmp_cover = 100.0 * int(w_scores[i]) / int(ulen[i])
        tmp_score = int(w_scores_tot[i])
        tmp_depth = 1.0 * tmp_score / int(slen[i])
        if id_t <= tmp_cover and depth_t <= tmp_depth:
            if ss == "q":
                better = (tmp_score > score or
                          (tmp_cover > cover or
                           (tmp_cover == cover and
                            (tmp_depth > depth or
                             (tmp_depth == depth and
                              ulen[i] > ulen[template])))))
            elif ss == "d":
                better = (tmp_depth > depth or
                          (tmp_depth == depth and
                           (tmp_cover > cover or
                            (tmp_cover == cover and
                             (tmp_score > score or
                              (tmp_score == score and
                               ulen[i] > ulen[template]))))))
            else:
                better = (tmp_cover > cover or
                          (tmp_cover == cover and
                           (tmp_depth > depth or
                            (tmp_depth == depth and
                             (tmp_score > score or
                              (tmp_score == score and
                               ulen[i] > ulen[template]))))))
            if better:
                tmp_expected = (1.0 * (nhits_tot - tmp_score) * int(ulen[i])
                                / (templates_n - int(ulen[i]) + etta))
                tmp_q = ((tmp_score - tmp_expected)
                         * (tmp_score - tmp_expected)
                         / (tmp_score + tmp_expected))
                tmp_p = p_chisqr(tmp_q)
                if tmp_p <= evalue and tmp_score > tmp_expected:
                    score = tmp_score
                    cover = tmp_cover
                    depth = tmp_depth
                    template = i
                    expected = tmp_expected
                    p_value = tmp_p
                    q_value = tmp_q
                else:
                    search[i] = 0
        else:
            search[i] = 0
    return template, score, cover, depth, expected, q_value, p_value


def run_sparse(db_prefix: str, inputs: List[str], out_prefix: str,
               id_t: float = 1.0, depth_t: float = 0.0,
               evalue: float = 0.05, ss: str = "q", min_phred: int = 20,
               hardmask_q: int = 0, min_q: int = 0, five_clip: int = 0,
               three_clip: int = 0, min_len: int = 16,
               max_len: int = 2147483647, decon: bool = False,
               qc_report: int = 0) -> int:
    """Full sparse pipeline: translate reads to k-mers, count matches,
    greedily emit the .spa table (save_kmers_sparse_batch, sparse.c:
    338-797; -deCon uses .decon.comp.b and the contamination-withdrawal
    branch sparse.c:459-644)."""
    from ..index.format import load_comp_b, load_names
    from ..io.pipeline import iter_reads

    idx = load_comp_b(db_prefix
                      + (".decon.comp.b" if decon else ".comp.b"))
    slen, ulen = load_sparse_length_b(db_prefix + ".length.b")
    names = load_names(db_prefix + ".name")
    db_size = idx.db_size

    # found-kmer table sized from the largest slen (sparse.c:408-421)
    size = int(slen[0])
    for i in range(db_size - 1, 0, -1):
        if size < int(slen[i]):
            size = int(slen[i])
    size <<= 1
    size = min(1048576, size)
    found = FoundKmers(size, idx.flag)

    # membership test vectorised per read; per-hit insertion stays ordered
    if idx.mega:
        exist = idx.exist
        null_index = np.uint64(idx.null_index)

        def present(kmers: np.ndarray) -> np.ndarray:
            return exist[kmers & np.uint64(idx.size - 1)] != null_index
    else:
        keyset = frozenset(idx.key_index[: idx.n].tolist())

        def present(kmers: np.ndarray) -> np.ndarray:
            return np.fromiter((int(k) in keyset for k in kmers),
                               dtype=bool, count=len(kmers))

    qc = None
    if qc_report:
        from ..utils.qc import QCStat
        qc = QCStat(qc_report - 1)
    ntot = 0
    for read in iter_reads(inputs, min_phred=max(min_phred, hardmask_q),
                           hardmask_q=hardmask_q, min_q=min_q,
                           five_clip=five_clip, three_clip=three_clip,
                           min_len=min_len, max_len=max_len, qc=qc):
        kmers = translate_read(read.codes, idx.kmersize, idx.prefix_len,
                               idx.prefix if idx.prefix_len else 0)
        ntot += len(kmers)
        if not kmers:
            continue
        arr = np.asarray(kmers, dtype=np.uint64)
        for km in arr[present(arr)].tolist():
            found.count(km)

    if qc is not None:
        from ..utils.qc import print_qcstat
        with open(out_prefix + ".json", "w") as jf:
            print_qcstat(qc, min_q, max(min_phred, hardmask_q), hardmask_q,
                         min_len, max_len, five_clip, three_clip, jf)

    if out_prefix == "--":
        spa = sys.stdout
    else:
        spa = open(out_prefix + ".spa", "w")
    spa.write("#Template\tNum\tScore\tExpected\tTemplate_length\t"
              "Query_Coverage\tTemplate_Coverage\tDepth\t"
              "tot_query_Coverage\ttot_template_Coverage\ttot_depth\t"
              "q_value\tp_value\n")

    contamination = db_size if decon else None
    kmer_list, decon_list, scores, scores_tot, hits_n, hits_tot = \
        _collect_kmers(idx, found, db_size, contamination)
    print(f"# Total number of matches: {hits_tot} of {ntot} kmers",
          file=sys.stderr)
    w_scores = scores.copy()
    w_scores_tot = scores_tot.copy()
    search = (scores != 0).astype(np.int64)
    if decon:
        search[contamination] = 0

    stop = len(kmer_list) == 0 and not decon
    while not stop:
        template, score, cover, depth, expected, q_value, p_value = \
            _pick_best(ss, db_size, search, w_scores, w_scores_tot, slen,
                       ulen, hits_tot, idx.n, id_t, depth_t, evalue)
        if cover and id_t <= cover and depth_t <= depth:
            if decon:
                # withdraw contamination k-mers matching this template
                # (sparse.c:589-614), NO early stop
                score_add = 0
                score_tot_add = 0
                kept = []
                for node in decon_list:
                    cnt, tpls, full = node
                    if intpos_bin(full, len(tpls), template):
                        score_add += 1
                        score_tot_add += cnt
                    else:
                        kept.append(node)
                decon_list = kept
                w_tot = int(w_scores_tot[template]) + score_tot_add
                query_cover = 100.0 * w_tot / ntot
                cover = (100.0 * (int(w_scores[template]) + score_add)
                         / int(ulen[template]))
                depth = 1.0 * w_tot / int(slen[template])
                tot = int(scores_tot[template]) + score_tot_add
                tot_cover = (100.0 * (int(scores[template]) + score_add)
                             / int(ulen[template]))
                tot_depth = 1.0 * tot / int(slen[template])
                tot_query_cover = 100.0 * tot / ntot
                spa.write("%s\t%d\t%d\t%d\t%d\t%8.2f\t%8.2f\t%8.2f\t"
                          "%8.2f\t%8.2f\t%8.2f\t%f\t%e\n"
                          % (names[template - 1].decode("latin1"),
                             template, score, int(expected),
                             int(slen[template]), query_cover, cover,
                             depth, tot_query_cover, tot_cover, tot_depth,
                             q_value, p_value))
            else:
                query_cover = 100.0 * int(w_scores_tot[template]) / ntot
                tot_cover = (100.0 * int(scores[template])
                             / int(ulen[template]))
                tot_depth = (1.0 * int(scores_tot[template])
                             / int(slen[template]))
                tot_query_cover = 100.0 * int(scores_tot[template]) / ntot
                spa.write("%s\t%d\t%d\t%d\t%d\t%8.2f\t%8.2f\t%8.2f\t"
                          "%8.2f\t%8.2f\t%8.2f\t%8.2f\t%4.1e\n"
                          % (names[template - 1].decode("latin1"),
                             template, score, int(expected),
                             int(ulen[template]), query_cover, cover,
                             depth, tot_query_cover, tot_cover, tot_depth,
                             q_value, p_value))
            kmer_list = _withdraw_kmers(w_scores, w_scores_tot, kmer_list,
                                        template)
            search[template] = 0
            if not kmer_list:
                stop = True
        else:
            stop = True

    if spa is not sys.stdout:
        spa.close()
    return 0
