"""Index builder: fasta templates -> frozen KMA-format database.

Mirrors the observable behaviour of `kma index` (reference index.c,
makeindex.c:167-291, updateindex.c:33-77, compress.c:83-614) for the
standard (non-sparse, non-minimizer) path, producing databases that are
interchangeable with the reference's (validated with `kma cmp`).

The build is host-side NumPy: k-mer extraction is vectorised per template
and aggregation uses a dict of int keys (the reference uses a chained
hashmap, hashmap.c:164-256).
"""

from __future__ import annotations

import struct
import sys
from typing import Dict, List, Optional

import numpy as np

from ..io.seq import (kmer_scan, pack_2bit, parse_fasta, rc_codes, ref_trim,
                      valid_kmer_mask)
from .format import (KmaIndex, U16MAX, dump_comp_b, dump_length_b, murmur)


def effective_minlen(minlen: int, kmersize: int, kmerindex: int,
                     prefix_len: int = 0) -> tuple:
    """MinLen/MinKlen normalisation (index.c:599-606).

    Returns (MinLen, MinKlen): if the user MinLen exceeds k+prefix_len+1
    it is kept and MinKlen becomes the number of expected prefix k-mers of
    a MinLen sequence; otherwise MinLen falls back to max(k, kmerindex).
    """
    if minlen > (kmersize + prefix_len + 1):
        minklen = 2 * (minlen - kmersize - prefix_len + 1)
        for _ in range(prefix_len):
            minklen //= 4
        return minlen, minklen
    return max(kmersize, kmerindex), 1


def _codon_at(fold: np.ndarray, pos: int) -> int:
    return int(fold[pos]) * 16 + int(fold[pos + 1]) * 4 + int(fold[pos + 2])


_STOPS = (48, 50, 56)        # TAA TAG TGA
_STOPS_RC = (60, 28, 52)     # TTA CTA TCA


def _internal_stop_check1(fold: np.ndarray) -> bool:
    """internalStopCheck1 (makeindex.c:50-81): in-frame stops before the
    terminal codon reject the ORF."""
    L = len(fold)
    if L % 3:
        return False
    pos = 0
    while pos < L - 3:
        if _codon_at(fold, pos) in _STOPS:
            return False
        pos += 3
    return True


def orf_check(codes: np.ndarray, minlen: int, mode: int):
    """-c qualCheck / -C internalStopCheck (makeindex.c:83-165).

    Returns (passed, flip): flip marks a valid REVERSE-strand ORF, which
    the reference stores reverse-complemented (qualCheck's comp_rc)."""
    fold = (codes & 3).astype(np.uint8)
    L = len(fold)
    if mode == 2:
        if L < minlen:
            return False, False
        frames = frames_r = 0
        pos = 1                       # position 0 is never checked
        while pos < L - 4:
            c = _codon_at(fold, pos)
            if c in _STOPS:
                frames |= 1 << (pos % 3)
            elif c in _STOPS_RC:
                frames_r |= 1 << (pos % 3)
            if frames == 7 and frames_r == 7:
                return False, False
            pos += 1
        return True, False
    # mode 1: qualCheck
    if L < minlen or L % 3:
        return False, False
    start = _codon_at(fold, 0)
    stop = _codon_at(fold, L - 3)
    if ((start & 15) == 14 or start == 15) and stop in _STOPS:
        return _internal_stop_check1(fold), False
    if ((stop >> 2) == 4 or stop == 3) and start in _STOPS_RC:
        rc = (3 - fold)[::-1].astype(np.uint8)
        return _internal_stop_check1(rc), True
    return False, False


def build_index(input_files: List[str], out_prefix: str, kmersize: int = 16,
                minlen: int = 0, kmerindex: Optional[int] = None,
                mega: bool = False, quiet: bool = False,
                m_len: int = 0, hc: bool = False,
                append: Optional[dict] = None,
                orf: int = 0) -> KmaIndex:
    """Build and write a standard database.

    Per record (makeDB, makeindex.c:210-247): trim flanking Ns
    (compDNAref bias), length-check, add all forward-strand k-mers of
    N-free windows (updateDBs, updateindex.c:58-73), append the 2-bit
    sequence to .seq.b and the name (with ``B<bias>`` suffix when Ns were
    trimmed) to .name.
    """
    if append is not None:
        # -t_db incremental append (index.c:528-553): params come from
        # the loaded DB
        kmersize = append["kmersize"]
        kmerindex = append["kmerindex"]
        m_len = append["mlen"] if append["flag"] & 2 else 0
        hc = bool(append["flag"] & 1)
        mega = append["mega"]
    if kmerindex is None:
        kmerindex = kmersize
    minlen, _ = effective_minlen(minlen, kmersize, kmerindex)
    # cmer modes (index.c:246-262,516-527): -m sets the minimizer
    # length (flag bit 2), -hc homopolymer compression (bit 1); the
    # hash-key length mlen is the minimizer length when set
    flag = (1 if hc else 0) | (2 if m_len else 0)
    if m_len and kmersize <= m_len:
        raise SystemExit("Minimizer size cannot be smaller than kmersize.")
    mlen = m_len or kmersize
    mask = (1 << (2 * mlen)) - 1
    if mega or mask + 1 <= (1 << 20):
        mega = True

    # kmer (int) -> list of template ids; each template appended at most once
    # (updateValue only dedups consecutive adds, hashmap.c:126, which equals
    # once-per-template since templates are processed one at a time)
    spill = None
    if append is not None:
        table = append["table"]
        lengths = list(append["lengths"])
        names = list(append["names"])
        db_size = append["db_size"]
    else:
        table = None
        spill = KmerSpill()
        lengths = [0]
        names = []
        db_size = 1

    # .seq.b writes ((seqlen>>5)+1) u64 words per template (updateAnnots,
    # updateindex.c:172) even when seqlen%32 == 0, in which case the extra
    # word holds stale content of the reference's reused pack buffer.
    # Emulate that buffer (qseq capacity doubling in FileBuffgetFsa and
    # compressor reallocation in makeDB, makeindex.c:219-222) for byte parity.
    qseq_cap = 1024
    comp_words = np.zeros(1024 >> 5, dtype=np.uint64)

    seq_out = open(out_prefix + ".seq.b", "wb")
    if append is not None:
        seq_out.write(append["seq_bytes"])
    try:
        for path in input_files:
            if not quiet:
                print(f"# Reading inputfile: \t{path}", file=sys.stderr)
            for header, codes in parse_fasta(path):
                raw_len = len(codes)
                while raw_len >= qseq_cap:
                    qseq_cap <<= 1
                codes, bias = ref_trim(codes)
                seqlen = len(codes)
                if raw_len >= len(comp_words) * 32:
                    sz = qseq_cap if qseq_cap % 32 == 0 else ((qseq_cap >> 5) + 1) << 5
                    comp_words = np.zeros(sz >> 5, dtype=np.uint64)
                name = header[1:]
                # qualcheck gate (lenCheck / -c qualCheck /
                # -C internalStopCheck, makeindex.c:36-165)
                added = 0
                store_codes = None
                if orf:
                    gate, flip = orf_check(codes, minlen, orf)
                    if flip:
                        # comp_rc on the PACKED seq: Ns (stored 0)
                        # complement to T in .seq.b, while the N list
                        # still masks them for k-mer extraction
                        store_codes = (3 - (codes & 3))[::-1].astype(
                            np.uint8)
                        codes = rc_codes(codes)
                else:
                    gate, flip = minlen < seqlen, False
                if gate and seqlen >= kmersize:
                    if flag & 3:
                        from ..io.seq import cmer_scan
                        kmers = cmer_scan(codes, kmersize, mlen, flag)
                    else:
                        kmers = kmer_scan(codes, kmersize)
                    valid = valid_kmer_mask(codes, kmersize)
                    # POSITION-order first occurrence: the reference
                    # inserts while walking the template (updateindex.c:
                    # 58-73), which fixes hash-chain order for colliding
                    # keys (np.unique would sort)
                    kv = kmers[valid]
                    added = int(valid.sum())
                    if spill is not None:
                        # within-template repeats are dropped at merge
                        # time (KmerSpill.finalize): in a kmer group
                        # sorted by global position one template's
                        # occurrences are contiguous, so the adjacent
                        # same-tid mask equals the reference's
                        # once-per-template insert (hashmap.c:126)
                        spill.add(kv, db_size)
                    else:
                        _, fp = np.unique(kv, return_index=True)
                        kk = kv[np.sort(fp)]
                        for km in kk.tolist():
                            lst = table.get(km)
                            if lst is None:
                                table[km] = [db_size]
                            else:
                                lst.append(db_size)
                if added:
                    if bias > 0:
                        names.append(name + b" B%d" % bias)
                    else:
                        names.append(name)
                    packed = pack_2bit(store_codes if store_codes
                                       is not None else codes)
                    comp_words[: len(packed)] = packed
                    nwords = (seqlen >> 5) + 1
                    comp_words[:nwords].astype("<u8").tofile(seq_out)
                    lengths.append(seqlen)
                    db_size += 1
                    if not quiet:
                        print(f"# Added:\t{name.decode(errors='replace')}",
                              file=sys.stderr)
                elif not quiet:
                    print(f"# Skipped:\t{name.decode(errors='replace')}",
                          file=sys.stderr)
    finally:
        seq_out.close()

    if spill is not None:
        table = spill.finalize()
        if not len(table[0]):
            raise SystemExit("DB is empty!!!")
    elif not table:
        raise SystemExit("DB is empty!!!")

    idx = freeze(table, db_size, kmersize, mlen, mega=mega, flag=flag)
    idx.template_lengths = np.array([kmerindex] + lengths[1:], dtype=np.uint32)
    idx.names = names

    with open(out_prefix + ".comp.b", "wb") as f:
        dump_comp_b(idx, f)
    dump_length_b(idx.template_lengths, out_prefix + ".length.b")
    with open(out_prefix + ".name", "wb") as f:
        f.write(b"\n".join(names) + b"\n" if names else b"")
    idx.seq_path = out_prefix + ".seq.b"
    return idx



class KmerSpill:
    """Bounded-RSS (kmer, template) accumulator for the standard build.

    The reference survives DBs larger than RAM with compress.c's
    disk-swap failover (compress.c:83-614); the dict the small-DB path
    uses costs ~100 B per k-mer in Python object overhead.  This
    accumulator buffers pairs in flat arrays and spills kmer-sorted runs
    to disk; finalize() merges the runs into (kmers in FIRST-SEEN order,
    offsets, flat template ids) -- the exact iteration order freeze()
    needs for byte-identical .comp.b output.

    Per-kmer template order is append order; stable in-run sorts plus a
    merge that prefers earlier runs keep it across spills."""

    def __init__(self, tmpdir=None, cap: int = 1 << 22):
        self.cap = cap
        self.kb = np.empty(cap, np.uint64)
        self.tb = np.empty(cap, np.uint32)
        self.n = 0
        self.base = 0
        self.tmpdir = tmpdir
        self.runs: List = []

    def add(self, kmers: np.ndarray, tid: int) -> None:
        m = len(kmers)
        off = 0
        while m:
            take = min(m, self.cap - self.n)
            self.kb[self.n: self.n + take] = kmers[off: off + take]
            self.tb[self.n: self.n + take] = tid
            self.n += take
            off += take
            m -= take
            if self.n == self.cap:
                self._spill()

    def _spill(self) -> None:
        import tempfile
        order = np.argsort(self.kb[: self.n], kind="stable")
        f = tempfile.TemporaryFile(dir=self.tmpdir, prefix="kma_idx_run_")
        self.kb[order].tofile(f)
        (self.base + order).astype(np.uint64).tofile(f)
        self.tb[order].tofile(f)
        self.runs.append((f, self.n))
        self.base += self.n
        self.n = 0

    def finalize(self):
        """-> (kmers first-seen-ordered u64, offsets i64, flat u32)."""
        if not self.runs:
            order = np.argsort(self.kb[: self.n], kind="stable")
            sk = self.kb[order]
            sp = order.astype(np.uint64)
            st = self.tb[order]
        else:
            self._spill()
            parts_k, parts_p, parts_t = [], [], []
            for f, cnt in self.runs:
                f.seek(0)
                parts_k.append(np.fromfile(f, np.uint64, cnt))
                parts_p.append(np.fromfile(f, np.uint64, cnt))
                parts_t.append(np.fromfile(f, np.uint32, cnt))
                f.close()
            ak = np.concatenate(parts_k)
            ap = np.concatenate(parts_p)
            at = np.concatenate(parts_t)
            del parts_k, parts_p, parts_t
            order = np.lexsort((ap, ak))
            sk, sp, st = ak[order], ap[order], at[order]
            del ak, ap, at, order
        self.runs = []
        if not len(sk):
            return (np.empty(0, np.uint64), np.zeros(1, np.int64),
                    np.empty(0, np.uint32))
        # drop within-template repeats (adjacent same kmer + same tid
        # after the (kmer, position) sort — see build_index)
        keep = np.ones(len(sk), bool)
        keep[1:] = (sk[1:] != sk[:-1]) | (st[1:] != st[:-1])
        if not keep.all():
            sk, sp, st = sk[keep], sp[keep], st[keep]
        firsts = np.ones(len(sk), bool)
        firsts[1:] = sk[1:] != sk[:-1]
        gidx = np.flatnonzero(firsts)
        counts = np.diff(np.concatenate([gidx, [len(sk)]]))
        # first-seen order = ascending first global position
        fs = np.argsort(sp[gidx], kind="stable")
        kmers = sk[gidx][fs]
        counts = counts[fs]
        offs = np.zeros(len(kmers) + 1, np.int64)
        np.cumsum(counts, out=offs[1:])
        # one fancy gather instead of a per-kmer python loop: element j
        # of group i comes from st[src[i] + j]
        src = gidx[fs]
        within = np.arange(len(sk), dtype=np.int64) \
            - np.repeat(offs[:-1], counts)
        flat = st[np.repeat(src, counts) + within]
        return kmers, offs, flat


def load_for_append(old_prefix: str) -> dict:
    """load_DBs + hashMapKMA_openChains (loadupdate.c:64-210): reopen a
    frozen DB as the build-time table so new templates can be appended.
    Old keys are rebuilt in REVERSE record order (see the loop below);
    newly appended keys follow."""
    from .format import load_comp_b
    idx = load_comp_b(old_prefix + ".comp.b")
    table: Dict[int, List[int]] = {}
    values = idx.values
    # openChains inserts records in REVERSE flat order (`while(i--)`,
    # loadupdate.c:86/97); head-insert + the compress collect reversal
    # make that the final per-bucket order, so the rebuilt dict must
    # preserve it
    if idx.mega:
        keys = np.flatnonzero(idx.exist != idx.null_index)[::-1]
        offs = idx.exist[keys]
    else:
        keys = idx.key_index[: idx.n][::-1]
        offs = idx.value_index[: idx.n][::-1]
    for km, off in zip(keys.tolist(),
                       np.asarray(offs, np.int64).tolist()):
        cnt = int(values[off])
        table[int(km)] = values[off + 1: off + 1 + cnt].astype(
            np.int64).tolist()
    raw = open(old_prefix + ".length.b", "rb").read()
    db_size = struct.unpack_from("<i", raw)[0]
    body = np.frombuffer(raw[4:], "<u4")
    sparse = bool(idx.prefix or idx.prefix_len)
    if sparse:
        lengths = body[:db_size].tolist()
        slengths = body[db_size: 2 * db_size].tolist()
        ulengths = body[2 * db_size: 3 * db_size].tolist()
        kmerindex = int(slengths[0])  # load_DBs reads it there (:84)
    else:
        lengths = body[:db_size].tolist()
        slengths = ulengths = None
        kmerindex = int(lengths[0])
    names = open(old_prefix + ".name", "rb").read().splitlines()
    seq_bytes = open(old_prefix + ".seq.b", "rb").read()
    return {"table": table, "db_size": db_size, "lengths": lengths,
            "slengths": slengths, "ulengths": ulengths, "names": names,
            "seq_bytes": seq_bytes, "kmersize": idx.kmersize,
            "mlen": idx.mlen, "flag": idx.flag, "mega": idx.mega,
            "prefix_len": idx.prefix_len, "prefix": idx.prefix,
            "kmerindex": kmerindex, "sparse": sparse}


def parse_prefix(prefix_str: str) -> tuple:
    """-Sparse prefix parse (index.c:451-473): '-' -> pseudo-sparse
    (prefix_len 0, prefix 1); otherwise 2-bit packed bases."""
    if prefix_str == "-":
        return 0, 1
    val = 0
    lut = {"A": 0, "C": 1, "G": 2, "T": 3, "a": 0, "c": 1, "g": 2, "t": 3}
    for ch in prefix_str:
        if ch not in lut:
            raise SystemExit("Invalid prefix.")
        val = (val << 2) | lut[ch]
    return len(prefix_str), val


def _pack_rc_words(codes: np.ndarray) -> np.ndarray:
    """comp_rc (compdna.c:258-295) applied to a freshly compressed sequence:
    the stored 2-bit string (Ns packed as 0) reversed and complemented."""
    stored = codes.copy()
    stored[stored == 4] = 0
    return pack_2bit((3 - stored)[::-1].astype(np.uint8))


def _prefix_hit_count(codes: np.ndarray, kmersize: int, prefix_len: int,
                      prefix: int, cap: int) -> int:
    """Count prefix occurrences on one strand (lengthCheck inner loop,
    qualcheck.c:52-72): prefix start positions p in [seg_start,
    N_i - prefix_len - kmersize + 1) of each N-free segment, capped."""
    seqlen = len(codes)
    bounds = np.flatnonzero(codes == 4).tolist() + [seqlen]
    pvals = kmer_scan(codes, prefix_len) if seqlen >= prefix_len else \
        np.empty(0, dtype=np.uint64)
    total = 0
    j = 0
    for ni in bounds:
        end = ni - prefix_len - kmersize + 1
        if j < end:
            hits = int((pvals[j:end] == prefix).sum())
            total += hits
            if total >= cap:
                return cap
        j = ni + 1
    return total


def sparse_template_kmers(codes: np.ndarray, kmersize: int, prefix_len: int,
                          prefix: int) -> np.ndarray:
    """k-mer start positions emitted by updateDBs_sparse for ONE strand
    (updateindex.c:106-156): per N-free segment [seg, N_i), prefixed k-mers
    start in [seg+prefix_len, N_i-kmersize] (pseudo-sparse: [seg,
    N_i-kmersize]); segments whose scan head is past seqend are skipped."""
    seqlen = len(codes)
    seqend = seqlen - kmersize - prefix_len + 1
    bounds = np.flatnonzero(codes == 4).tolist() + [seqlen]
    if prefix_len:
        pvals = kmer_scan(codes, prefix_len) if seqlen >= prefix_len else \
            np.empty(0, dtype=np.uint64)
    out = []
    j = 0
    for ni in bounds:
        if j >= seqend:
            break
        lo = j + prefix_len
        hi = ni - kmersize
        if lo <= hi:
            s = np.arange(lo, hi + 1)
            if prefix_len:
                s = s[pvals[s - prefix_len] == prefix]
            out.append(s)
        j = ni + 1
    return np.concatenate(out) if out else np.empty(0, dtype=np.int64)


def _homology_check(table, codes, kmersize, prefix_len, prefix, minklen,
                    hq, ht, ulengths, db_size, header_name, and_comb,
                    mode):
    """queryCheck / templateCheck (qualcheck.c:81-325): coverage of the
    candidate against the PARTIAL database; prints the reference's
    per-record stdout report.  Returns True when the record is ADDED."""
    from ..io.seq import rc_codes
    scores_tot: Dict[int, int] = {}
    scores_u: Dict[int, int] = {}
    found = set()
    this_klen = 0
    for strand in (codes, rc_codes(codes)):
        pos = sparse_template_kmers(strand, kmersize, prefix_len, prefix)
        if len(pos) == 0:
            continue
        kvals = kmer_scan(strand, kmersize)[pos]
        this_klen += len(kvals)
        for km in kvals.tolist():
            lst = table.get(km)
            if lst is not None:
                for t in lst:
                    scores_tot[t] = scores_tot.get(t, 0) + 1
                if mode == "template" and km not in found:
                    found.add(km)
                    for t in lst:
                        scores_u[t] = scores_u.get(t, 0) + 1
            elif mode == "template":
                found.add(km)
    if this_klen < minklen:
        return False
    bestQ = 0.0
    templateQ = 0
    for t, s in scores_tot.items():
        q = s / this_klen
        if q > bestQ:
            bestQ = q
            templateQ = t
    if mode == "query":
        if bestQ < hq:
            print("%s\t%d\t%f\t%d" % (header_name, db_size, bestQ,
                                         templateQ))
            return True
        print("%s\t%d\t%f\t%d" % (header_name, templateQ, bestQ,
                                     templateQ))
        return False
    bestT = 0.0
    templateT = 0
    for t, s in scores_tot.items():
        tt = scores_u.get(t, 0) / max(1, int(ulengths[t]))
        if tt > bestT:
            bestT = tt
            templateT = t
    a, b = bestT < ht, bestQ < hq
    ok = (a and b) if and_comb else (a or b)
    if ok:
        print("%s\t%d\t%f\t%d\t%f\t%d" % (header_name, db_size, bestQ,
                                               templateQ, bestT, templateT))
        return True
    print("%s\t%d\t%f\t%d\t%f\t%d"
          % (header_name, templateQ if a else templateT, bestQ, templateQ,
             bestT, templateT))
    return False


def build_index_sparse(input_files: List[str], out_prefix: str,
                       prefix_str: str, kmersize: int = 16, minlen: int = 0,
                       kmerindex: Optional[int] = None, mega: bool = False,
                       quiet: bool = False, hq: float = 1.0, ht: float = 1.0,
                       and_comb: bool = False,
                       append: Optional[dict] = None) -> KmaIndex:
    """Build a Sparse database (`kma index -Sparse`, index.c:576-606,
    updateindex.c:79-199).

    Both strands' (prefix-matching) k-mers are added; .length.b gets four
    sections [DB_size, lengths, slengths, ulengths] where slen counts all
    prefix k-mers and ulen the distinct ones (makeindex.c:263-269)."""
    if append is not None:
        kmersize = append["kmersize"]
        kmerindex = append["kmerindex"]
        mega = append["mega"]
    if kmerindex is None:
        kmerindex = kmersize
    if append is not None:
        prefix_len, prefix = append["prefix_len"], append["prefix"]
        if prefix_len == 0 and prefix == 1:
            prefix_str = "-"
    else:
        prefix_len, prefix = parse_prefix(prefix_str)
    minlen, minklen = effective_minlen(minlen, kmersize, kmerindex,
                                       prefix_len)
    mlen = kmersize
    mask = (1 << (2 * mlen)) - 1
    if mega or mask + 1 <= (1 << 20):
        mega = True

    if append is not None:
        table = append["table"]
        lengths = list(append["lengths"])
        slengths = list(append["slengths"])
        ulengths = list(append["ulengths"])
        names = list(append["names"])
        db_size = append["db_size"]
    else:
        table = {}
        lengths = [0]
        slengths = [0]
        ulengths = [0]
        names = []
        db_size = 1

    qseq_cap = 1024
    comp_words = np.zeros(1024 >> 5, dtype=np.uint64)

    seq_out = open(out_prefix + ".seq.b", "wb")
    if append is not None:
        seq_out.write(append["seq_bytes"])
    try:
        for path in input_files:
            if not quiet:
                print(f"# Reading inputfile: \t{path}", file=sys.stderr)
            for header, codes in parse_fasta(path):
                raw_len = len(codes)
                while raw_len >= qseq_cap:
                    qseq_cap <<= 1
                codes, bias = ref_trim(codes)
                seqlen = len(codes)
                if raw_len >= len(comp_words) * 32:
                    sz = qseq_cap if qseq_cap % 32 == 0 \
                        else ((qseq_cap >> 5) + 1) << 5
                    comp_words = np.zeros(sz >> 5, dtype=np.uint64)
                name = header[1:]
                complen = (seqlen >> 5) + (1 if seqlen & 31 else 0)
                # compDNAref fills the reused buffer for EVERY record
                packed_fw = pack_2bit(codes)
                comp_words[:complen] = packed_fw

                added = False
                slen = ulen = 0
                if minlen < seqlen and seqlen >= kmersize \
                        and (ht < 1 or hq < 1):
                    # queryCheck / templateCheck (index.c:607-612): the
                    # homology gate replaces lengthCheck; either outcome
                    # leaves the reused buffer reverse-complemented
                    mode = "template" if ht < 1 else "query"
                    passed = False
                    if seqlen >= kmersize + prefix_len:
                        passed = _homology_check(
                            table, codes, kmersize, prefix_len, prefix,
                            minklen, hq, ht, ulengths, db_size,
                            name.decode("latin1"), and_comb, mode)
                    if passed:
                        seen = set()
                        for strand in (rc_codes(codes), codes):
                            pos = sparse_template_kmers(
                                strand, kmersize, prefix_len, prefix)
                            if len(pos):
                                kvals = kmer_scan(strand, kmersize)[pos]
                                slen += len(kvals)
                                for km in kvals.tolist():
                                    if km not in seen:
                                        seen.add(km)
                                        lst = table.get(km)
                                        if lst is None:
                                            table[km] = [db_size]
                                        elif lst[-1] != db_size:
                                            lst.append(db_size)
                        ulen = len(seen)
                        added = slen > 0
                        comp_words[:complen] = packed_fw
                    else:
                        comp_words[:complen] = _pack_rc_words(codes)
                elif minlen < seqlen and seqlen >= kmersize:
                    # QualCheck == lengthCheck (qualcheck.c:31-79); both
                    # outcomes leave qseq reverse-complemented except a
                    # pseudo-sparse length fail
                    if prefix_len == 0:
                        passed = (seqlen - kmersize + 1) * 2 >= minklen
                        flipped = passed
                    else:
                        fw_hits = _prefix_hit_count(
                            codes, kmersize, prefix_len, prefix, minklen)
                        if fw_hits < minklen:
                            rc = rc_codes(codes)
                            fw_hits += _prefix_hit_count(
                                rc, kmersize, prefix_len, prefix,
                                minklen - fw_hits)
                        passed = fw_hits >= minklen
                        flipped = True
                    if passed:
                        # updateDBs_sparse scans [rc, fw] (entry is rc'd)
                        # and leaves the buffer forward again
                        seen = set()
                        for strand in (rc_codes(codes), codes):
                            pos = sparse_template_kmers(
                                strand, kmersize, prefix_len, prefix)
                            if len(pos):
                                kvals = kmer_scan(strand, kmersize)[pos]
                                slen += len(kvals)
                                for km in kvals.tolist():
                                    if km not in seen:
                                        seen.add(km)
                                        lst = table.get(km)
                                        if lst is None:
                                            table[km] = [db_size]
                                        elif lst[-1] != db_size:
                                            lst.append(db_size)
                        ulen = len(seen)
                        added = slen > 0
                        flipped = False
                    if flipped:
                        comp_words[:complen] = _pack_rc_words(codes)
                if added:
                    if bias > 0:
                        names.append(name + b" B%d" % bias)
                    else:
                        names.append(name)
                    nwords = (seqlen >> 5) + 1
                    comp_words[:nwords].astype("<u8").tofile(seq_out)
                    lengths.append(seqlen)
                    slengths.append(slen)
                    ulengths.append(ulen)
                    db_size += 1
                    if not quiet:
                        print(f"# Added:\t{name.decode(errors='replace')}",
                              file=sys.stderr)
                elif not quiet:
                    print(f"# Skipped:\t{name.decode(errors='replace')}",
                          file=sys.stderr)
    finally:
        seq_out.close()

    if not table:
        raise SystemExit("DB is empty!!!")

    store_prefix = prefix if prefix_len else 1
    idx = freeze(table, db_size, kmersize, mlen, mega=mega,
                 prefix_len=prefix_len, prefix=store_prefix)
    # the sparse dump leaves lengths[0] untouched (makeindex.c:264-270);
    # it carries the creation-time kmerindex through appends
    if append is None:
        lengths[0] = kmerindex
    arr = np.array(lengths + slengths + ulengths, dtype=np.uint32)
    with open(out_prefix + ".length.b", "wb") as f:
        f.write(struct.pack("<i", db_size))
        arr.astype("<u4").tofile(f)
    idx.template_lengths = np.array(lengths, dtype=np.uint32)
    idx.names = names

    with open(out_prefix + ".comp.b", "wb") as f:
        dump_comp_b(idx, f)
    with open(out_prefix + ".name", "wb") as f:
        f.write(b"\n".join(names) + b"\n" if names else b"")
    idx.seq_path = out_prefix + ".seq.b"
    return idx


def build_decon(db_prefix: str, decon_files: List[str],
                quiet: bool = False) -> None:
    """kma index -deCon (decon.c:161-227, index.c:676-732): mark every DB
    k-mer that occurs in the contamination fastas (both strands) by
    appending the pseudo-template id DB_size to its value list, then dump
    as .decon.comp.b.  DB_size itself is NOT incremented."""
    from .format import dump_comp_b, load_comp_b

    idx = load_comp_b(db_prefix + ".comp.b")
    db_size = idx.db_size
    k = idx.kmersize
    plen = idx.prefix_len
    # pseudo-sparse DBs (prefix '-') use the plain deConNode (index.c:587)
    sparse_prefix = plen != 0

    # hashMapKMA_openValues (loadupdate.c:114): every record gets its own
    # mutable list, so shared value entries are contaminated independently
    table: Dict[int, List[int]] = {}
    if idx.mega:
        kmers = np.flatnonzero(idx.exist != idx.null_index)
    else:
        kmers = idx.key_index[: idx.n]
    for km in kmers.tolist():
        table[int(km)] = np.asarray(idx.lookup(int(km))[1:],
                                    np.int64).tolist()

    mapped = 0
    for path in decon_files:
        if not quiet:
            print(f"# Reading inputfile: \t{path}", file=sys.stderr)
        for header, codes in parse_fasta(path):
            if not quiet:
                print("# Decon:\t%s" %
                      header[1:].decode(errors="replace"), file=sys.stderr)
            if len(codes) <= k:  # raw length gate (decon.c:193)
                continue
            codes, _bias = ref_trim(codes)
            if len(codes) < k:
                continue
            for strand in (codes, rc_codes(codes)):
                if sparse_prefix:
                    # deConNode_sparse (decon.c:122-159): prefixed k-mers
                    if len(strand) < plen + k:
                        continue
                    valid = valid_kmer_mask(strand, plen + k)
                    pm = kmer_scan(strand, plen)[: len(valid)] == idx.prefix
                    pos = np.flatnonzero(valid & pm)
                    kvals = kmer_scan(strand, k)[pos + plen]
                else:
                    # deConNode (decon.c:77-120): every N-free k-mer
                    if len(strand) < k:
                        continue
                    valid = valid_kmer_mask(strand, k)
                    kvals = kmer_scan(strand, k)[valid]
                for km in kvals.tolist():
                    lst = table.get(km)
                    if lst is not None and lst[-1] != db_size:
                        lst.append(db_size)
                        mapped += 1
    if not quiet:
        print(f"# {mapped} kmers mapped to the DB.", file=sys.stderr)

    out = freeze(table, db_size, k, idx.mlen, mega=idx.mega,
                 prefix_len=plen, prefix=idx.prefix, flag=idx.flag)
    with open(db_prefix + ".decon.comp.b", "wb") as f:
        dump_comp_b(out, f)


def freeze(table: Dict[int, List[int]], db_size: int, kmersize: int,
           mlen: int, mega: bool = False, prefix_len: int = 0,
           prefix: int = 0, flag: int = 0) -> KmaIndex:
    """Freeze the build-time map into the flat query format
    (compressKMA_DB, compress.c:83-614).

    Identical template lists are deduplicated to one values entry
    (valueshash.c); records are grouped contiguously per hash bucket so the
    linear probe of hashMap_getGlobal terminates correctly.
    """
    if isinstance(table, tuple):
        # streaming build: (kmers first-seen-ordered, offsets, flat ids)
        kmers_fs, f_offs, f_flat = table
        n = len(kmers_fs)
    else:
        kmers_fs = f_offs = f_flat = None
        n = len(table)
    mask = (1 << (2 * mlen)) - 1

    # hash table size: starts at 2^20 buckets and doubles when n reaches
    # size (hashMap_addKMA growth, hashmap.c:190-238)
    size = 1 << 20
    while size < n:
        size <<= 1
    if mega or size >= mask + 1:
        mega = True
        size = mask + 1

    if kmers_fs is not None:
        kmers = kmers_fs
    else:
        kmers = np.fromiter(table.keys(), dtype=np.uint64, count=n)

    # deduplicate value lists in the COMPRESS WALK order
    # (compress.c:96-240): megaMap walks values[] by ascending key;
    # the chained table walks buckets ascending with chain order =
    # insertion order (head-insert + the collect double reversal,
    # compress.c:96-104), which the table dict preserves
    if mega or size >= mask + 1:
        # compressKMA_megaDB walks slots DESCENDING (compress.c:688)
        order = np.argsort(kmers, kind="stable")[::-1]
    else:
        _b = ((murmur(kmers) if flag else kmers)
              & np.uint64(size - 1)).astype(np.int64)
        order = np.argsort(_b, kind="stable")
    vdt = np.uint32  # width applied at dump time; keep wide here
    dedup: Dict[bytes, int] = {}
    v_off = np.empty(n, dtype=np.int64)
    if f_offs is not None:
        # streaming build: native dedup over the flat (offsets, ids)
        # arrays (valueshash.c's role, one C pass)
        from ..io import native_io
        lib = native_io.get_lib()
        ff = np.ascontiguousarray(f_flat, np.uint32)
        fo = np.ascontiguousarray(f_offs, np.int64)
        odr = np.ascontiguousarray(order, np.int64)
        if lib is not None:
            out_vals = np.empty(len(ff) + n, np.uint32)
            v_index = lib.kio_dedup_values(
                fo.ctypes.data, ff.ctypes.data, odr.ctypes.data, n,
                v_off.ctypes.data, out_vals.ctypes.data)
            values = out_vals[:v_index].copy()
        else:
            # identity keys are raw u32 byte slices of ONE flat buffer;
            # values assembled vectorized over the first occurrences
            all_b = ff.tobytes()
            lens = np.diff(fo)
            firsts: List[int] = []
            v_index = 0
            dget = dedup.get
            for i in odr.tolist():
                key = all_b[4 * fo[i]: 4 * fo[i + 1]]
                off = dget(key)
                if off is None:
                    dedup[key] = v_index
                    v_off[i] = v_index
                    firsts.append(i)
                    v_index += int(lens[i]) + 1
                else:
                    v_off[i] = off
            fi = np.asarray(firsts, np.int64)
            flens = lens[fi]
            voffs_u = v_off[fi]
            values = np.empty(v_index, dtype=vdt)
            values[voffs_u] = flens
            total = int(flens.sum())
            within = np.arange(total, dtype=np.int64) \
                - np.repeat(np.cumsum(flens) - flens, flens)
            values[np.repeat(voffs_u + 1, flens) + within] = \
                ff[np.repeat(fo[fi], flens) + within]
    else:
        chunks: List[np.ndarray] = []
        v_index = 0
        for i in order.tolist():
            lst = table[int(kmers[i])]
            key = np.asarray(lst, dtype=np.int64).tobytes()
            off = dedup.get(key)
            if off is None:
                arr = np.empty(len(lst) + 1, dtype=vdt)
                arr[0] = len(lst)
                arr[1:] = lst
                dedup[key] = v_index
                v_off[i] = v_index
                chunks.append(arr)
                v_index += len(arr)
            else:
                v_off[i] = off
        values = np.concatenate(chunks) if chunks \
            else np.empty(0, dtype=vdt)

    if mega:
        exist = np.full(size, 1, dtype=np.uint64)  # null_index == 1 (compress.c:804)
        exist[kmers & np.uint64(mask)] = v_off.astype(np.uint64)
        return KmaIndex(db_size=db_size, mlen=mlen, prefix_len=prefix_len,
                        prefix=prefix, kmersize=kmersize, flag=flag,
                        size=size, null_index=1, exist=exist, values=values,
                        key_index=None, value_index=None, n_stored=n)

    smask = size - 1
    buckets = (murmur(kmers) if flag else kmers) & np.uint64(smask)
    grp = np.argsort(buckets, kind="stable")
    key_index = np.empty(n + 1, dtype=np.uint64)
    key_index[:n] = kmers[grp]
    value_index = v_off[grp].astype(np.uint64)
    sorted_buckets = buckets[grp]
    exist = np.full(size, n, dtype=np.uint64)  # null_index == n
    # first record index of each bucket group
    first = np.ones(n, dtype=bool)
    first[1:] = sorted_buckets[1:] != sorted_buckets[:-1]
    exist[sorted_buckets[first]] = np.flatnonzero(first)

    # terminating key (compress.c:549-585): the first key from the top
    # whose bucket differs from the LAST record's bucket -- except the
    # flag path's do-while overshoots by one entry (kept verbatim)
    if n:
        if flag:
            j = int(murmur(int(key_index[n - 1]))) & smask
            i = 0
            while True:
                idx = int(murmur(int(key_index[i]))) & smask
                i += 1
                if j != idx:
                    break
            key_index[n] = key_index[i] if i < n else key_index[0]
        else:
            j = int(key_index[n - 1]) & smask
            i = 0
            while j == (int(key_index[i]) & smask):
                i += 1
            key_index[n] = key_index[i]

    return KmaIndex(db_size=db_size, mlen=mlen, prefix_len=prefix_len,
                    prefix=prefix, kmersize=kmersize, flag=flag, size=size,
                    null_index=n, exist=exist, values=values,
                    key_index=key_index, value_index=value_index)
