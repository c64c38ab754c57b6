"""Host-side sequence I/O: fasta/fastq parsing, 2-bit codes, quality trimming.

Mirrors the observable behaviour of the reference's seqparse.c / runinput.c /
compdna.c.  Internally sequences are uint8 code arrays (A=0 C=1 G=2 T=3 N=4);
64-bit 2-bit packing is only materialised at file-format boundaries
(.seq.b, step-1/step-2 binary streams).
"""

from __future__ import annotations

import gzip
import io
import math
from typing import Iterator, Optional, Tuple

import numpy as np

# --- translation table (kma.c:1442-1481) ---------------------------------
# defaults to 8 (ignored char), '\n' -> 16 (fastq line terminator)
TO2BIT = np.full(256, 8, dtype=np.uint8)
TO2BIT[ord("\n")] = 16
for _chars, _code in (
    ("Aa", 0), ("Cc", 1), ("Gg", 2), ("Tt", 3), ("Nn", 4),
    ("Rr", 0), ("Yy", 1), ("Ss", 2), ("Ww", 3), ("Kk", 2), ("Mm", 0),
    ("Bb", 1), ("Dd", 0), ("Hh", 3), ("Vv", 2), ("Xx", 4), ("Uu", 3),
):
    for _c in _chars:
        TO2BIT[ord(_c)] = _code

BASES = np.frombuffer(b"ACGTN-", dtype=np.uint8)  # code -> ascii (stdnuc.c:477)
# complement per strrc (stdnuc.c:453): 0<->3, 1<->2, 4->4, 5->5
COMP = np.array([3, 2, 1, 0, 4, 5], dtype=np.uint8)

# phred error-probability table prob[q] = 10^(-q/10) for raw byte q, offset
# by phredScale at use (kma.c:219-250 inlines prob[0..255])
def _phred_prob_table() -> np.ndarray:
    """The reference's inlined phred->error-probability table (kma.c:
    219-250) holds %.32f-rounded glibc pow(10, -q/10) values; reconstruct
    the exact doubles instead of copying the literals."""
    import ctypes
    try:
        libm = ctypes.CDLL("libm.so.6")
        libm.pow.restype = ctypes.c_double
        libm.pow.argtypes = [ctypes.c_double, ctypes.c_double]
        raw = [libm.pow(10.0, -0.1 * i) for i in range(256)]
    except OSError:  # pragma: no cover
        raw = [10.0 ** (-0.1 * i) for i in range(256)]
    return np.array([float("%.32f" % v) for v in raw], dtype=np.float64)


PROB = _phred_prob_table()


def open_maybe_gz(path: str) -> io.BufferedReader:
    """Transparently open plain or gzip files (magic sniffing, seqparse.c:29)."""
    f = open(path, "rb")
    magic = f.peek(2)[:2]
    if magic == b"\x1f\x8b":
        return io.BufferedReader(gzip.GzipFile(fileobj=f))  # type: ignore[arg-type]
    return f


def detect_format(path: str) -> str:
    """Return 'fastq' or 'fasta' by first byte (seqparse.c:29-64)."""
    with open_maybe_gz(path) as f:
        first = f.read(1)
    if first == b"@":
        return "fastq"
    if first == b">":
        return "fasta"
    raise ValueError(f"cannot determine format of {path}")


def _chomp(b: bytes) -> bytes:
    return b.rstrip(b" \t\r\n\x0b\x0c")


def parse_fasta(path: str) -> Iterator[Tuple[bytes, np.ndarray]]:
    """Yield (header, codes) per record.

    header keeps the leading '>' and is chomped of trailing whitespace
    (FileBuffgetFsa, seqparse.c:66-159); codes are TO2BIT-translated with
    chars translating to 8 dropped (seqparse.c:119 keeps only code>>3 == 0).
    """
    with open_maybe_gz(path) as f:
        header: Optional[bytes] = None
        chunks = []
        for line in f:
            if line.startswith(b">"):
                if header is not None:
                    yield header, _codes_from_chunks(chunks)
                header = _chomp(line)
                chunks = []
            elif header is not None:
                chunks.append(line)
        if header is not None:
            yield header, _codes_from_chunks(chunks)


def _codes_from_chunks(chunks) -> np.ndarray:
    if not chunks:
        return np.empty(0, dtype=np.uint8)
    raw = np.frombuffer(b"".join(chunks), dtype=np.uint8)
    codes = TO2BIT[raw]
    return codes[codes < 8]


def parse_fastq(path: str) -> Iterator[Tuple[bytes, np.ndarray, np.ndarray]]:
    """Yield (header, codes, qual_bytes) per record (FileBuffgetFq).

    header keeps the leading '@'.  qual is the raw phred byte string.
    """
    with open_maybe_gz(path) as f:
        while True:
            h = f.readline()
            if not h:
                return
            if not h.startswith(b"@"):
                raise ValueError("Malformed fastq input")
            seq = f.readline()
            plus = f.readline()
            qual = f.readline()
            if not qual:
                return
            del plus
            raw = np.frombuffer(_chomp(seq), dtype=np.uint8)
            codes = TO2BIT[raw]
            codes = codes[codes < 8]
            q = np.frombuffer(_chomp(qual), dtype=np.uint8)
            yield _chomp(h), codes, q[: len(codes)]


def _sniff_phred_np(data: bytes):
    """Vectorized getPhredFileBuff decision over whole quality lines;
    None = no quality data found (caller falls back to the scalar loop)."""
    if not data:
        return None
    arr = np.frombuffer(data, dtype=np.uint8)
    nl = np.flatnonzero(arr == 10)
    n = len(arr)
    if len(nl) == 0 or nl[-1] != n - 1:
        bnds = np.concatenate(([-1], nl, [n]))
    else:
        bnds = np.concatenate(([-1], nl))
    nlines = len(bnds) - 1
    qidx = np.arange(3, nlines, 4)
    if len(qidx) == 0:
        return None
    s = bnds[qidx] + 1
    e = bnds[qidx + 1]
    # gather the quality bytes line by line (a few thousand slices) —
    # building a whole-buffer membership mask via cumsum is far slower
    q = np.concatenate([arr[a:b] for a, b in zip(s, e)]) \
        if len(s) else arr[:0]
    bad = (q < 33) | ((q > 53) & (q < 59))
    if bad.any():
        first = int(np.argmax(bad))
        return 0 if q[first] < 33 else 33
    scale = 64 if (q > 94).any() else 33
    maxlen = int((e - s).max()) if len(s) else 0
    return scale if maxlen <= 301 else 33


def sniff_phred_scale(path: str) -> int:
    """Detect phred scale 33/64 from the first ~1MB (getPhredFileBuff,
    seqparse.c:551-589)."""
    with open_maybe_gz(path) as f:
        data = f.read(1 << 20)
    # vectorized fast path over whole quality lines (identical decision
    # rules; the Python loop below remains the semantics reference and
    # handles the exotic early-exit cases it bails on)
    res = _sniff_phred_np(data)
    if res is not None:
        return res
    scale = 33
    maxlen = 0
    i = 0
    n = len(data)
    while i < n:
        # skip 3 newlines (header, seq, plus)
        seek = 3
        while seek and i < n - 1:
            i += 1
            if data[i] == 0x0A:
                seek -= 1
        ln = 0
        cont = i < n - 1
        while cont and i < n - 1:
            i += 1
            c = data[i]
            if c == 0x0A:
                cont = False
            elif c < 33:
                return 0
            elif 53 < c < 59:
                return 33
            elif 94 < c:
                scale = 64
            if cont:
                ln += 1
        if maxlen < ln:
            maxlen = ln
        if i >= n - 1:
            break
    return scale if maxlen <= 301 else 33


# --- 2-bit packing (compdna.c) -------------------------------------------

def pack_2bit(codes: np.ndarray) -> np.ndarray:
    """Pack codes (uint8, 0-4) into uint64 words, MSB-first within each word
    (compDNA, compdna.c:99-127).  N (4) packs as 0 bits.
    """
    seqlen = len(codes)
    complen = (seqlen >> 5) + (1 if seqlen & 31 else 0)
    padded = np.zeros(complen * 32, dtype=np.uint64)
    c = codes.astype(np.uint64)
    c[codes == 4] = 0
    padded[:seqlen] = c
    shifts = np.uint64(62) - np.uint64(2) * np.arange(32, dtype=np.uint64)
    words = (padded.reshape(complen, 32) << shifts).sum(axis=1, dtype=np.uint64)
    return words


def unpack_2bit(words: np.ndarray, seqlen: int) -> np.ndarray:
    """Inverse of pack_2bit; returns uint8 codes 0-3 (Ns read as 0/A,
    matching getNuc on compDNAref-packed templates)."""
    shifts = np.uint64(62) - np.uint64(2) * np.arange(32, dtype=np.uint64)
    all_codes = ((words[:, None] >> shifts) & np.uint64(3)).astype(np.uint8)
    return all_codes.reshape(-1)[:seqlen]


def ref_trim(codes: np.ndarray) -> Tuple[np.ndarray, int]:
    """Trim leading/trailing Ns of a template (compDNAref, compdna.c:129-147).
    Returns (trimmed_codes, bias)."""
    nonN = np.flatnonzero(codes != 4)
    if len(nonN) == 0:
        return codes[:0], 0
    start, end = int(nonN[0]), int(nonN[-1]) + 1
    return codes[start:end], start


def kmer_scan(codes: np.ndarray, k: int) -> np.ndarray:
    """All k-mers (uint64) at positions 0..len-k of a code array.

    Windows containing an N are INVALID and must be masked by the caller
    (see valid_kmer_mask); their numeric value treats N as 0.
    """
    n = len(codes) - k + 1
    if n <= 0:
        return np.empty(0, dtype=np.uint64)
    c = codes.astype(np.uint64)
    c[codes == 4] = 0
    win = np.lib.stride_tricks.sliding_window_view(c, k)
    powers = np.uint64(4) ** np.arange(k - 1, -1, -1, dtype=np.uint64)
    return (win * powers).sum(axis=1, dtype=np.uint64)


def valid_kmer_mask(codes: np.ndarray, k: int) -> np.ndarray:
    """mask[i] True iff window [i, i+k) contains no N."""
    n = len(codes) - k + 1
    if n <= 0:
        return np.empty(0, dtype=bool)
    isN = (codes == 4).astype(np.int32)
    cs = np.concatenate(([0], np.cumsum(isN)))
    return (cs[k:] - cs[:-k]) == 0


def rc_codes(codes: np.ndarray) -> np.ndarray:
    """Reverse complement of a code array (strrc semantics)."""
    return COMP[codes[::-1]]


# --- quality trimming (runinput.c) ---------------------------------------

def phred_stat(codes: np.ndarray, qual: np.ndarray, phred_scale: int,
               min_phred: int, min_q: int, hardmask_q: int,
               min_len: int, max_len: int,
               stats_out: Optional[dict] = None) -> Tuple[int, int, int]:
    """Bidirectional phred trimming (phredStat, runinput.c:127-313).

    Mutates `codes` (hardmasking to N) like the reference mutates seq.
    QUIRK kept: the hardmask compare is RAW qual byte vs the raw -mi value
    (runinput.c:179) -- no phred-scale adjustment.
    Returns (effective_len, start, end); effective_len = (end-start) - #N.
    stats_out (for -qc) receives the C-tracked {len, gc, ns, sp} whose
    accumulate-then-subtract float order decides the Q histogram bin.
    """
    length = len(codes)
    if max_len < length:
        if stats_out is not None:
            stats_out["skip"] = True
        return 0, 0, 0

    minPhred = phred_scale + min_phred  # caller passes phredScale+minPhred
    start, end = 0, length
    while start < end and qual[start] < minPhred:
        start += 1
    while start < end and qual[end - 1] < minPhred:
        end -= 1
    ln = end - start

    if not min_q and not hardmask_q and stats_out is None:
        return ln, start, end

    # gc/ns/sp accumulation with in-place hardmasking (runinput.c:171-185);
    # sp MUST be a plain sequential sum: its rounding picks the Q bin
    seg = codes[start:end]
    mask = (seg == 4) | (qual[start:end] < hardmask_q)
    seg[mask] = 4
    ns = int(mask.sum())
    gc = int((((seg == 1) | (seg == 2)) & ~mask).sum())
    sp = 0.0
    for v in PROB[np.clip(qual[start:end].astype(np.int32)
                          - phred_scale, 0, 255)].tolist():
        sp += v

    minP = math.pow(10.0, -0.1 * min_q)
    if min_len <= (ln - ns) and (minP * ln) < sp:
        # iterative worst-end segment removal (runinput.c:192-301)
        quals = qual
        sptr = codes
        l5 = ns5 = gc5 = 0
        sp5 = 0.0
        p3 = end - 1
        l3 = ns3 = gc3 = 0
        sp3 = 0.0

        def take3(p3, l3, ns3, gc3, sp3, limit):
            for gate in (True, False):
                while l3 < limit and (quals[p3] >= minPhred) == gate:
                    sp3 += PROB[max(0, quals[p3] - phred_scale)]
                    l3 += 1
                    if sptr[p3] == 1 or sptr[p3] == 2:
                        gc3 += 1
                    elif sptr[p3] == 4:
                        ns3 += 1
                    p3 -= 1
            return p3, l3, ns3, gc3, sp3

        def take5(p5, l5, ns5, gc5, sp5, limit):
            for gate in (True, False):
                while l5 < limit and (quals[p5] >= minPhred) == gate:
                    sp5 += PROB[max(0, quals[p5] - phred_scale)]
                    l5 += 1
                    if sptr[p5] == 1 or sptr[p5] == 2:
                        gc5 += 1
                    elif sptr[p5] == 4:
                        ns5 += 1
                    p5 += 1
            return p5, l5, ns5, gc5, sp5

        p5 = start
        p3, l3, ns3, gc3, sp3 = take3(p3, l3, ns3, gc3, sp3, ln)
        while min_len <= (ln - ns) and (minP * ln) < sp:
            if (sp5 * l3) < (sp3 * l5):
                end -= l3
                ns -= ns3
                gc -= gc3
                ln -= l3
                sp -= sp3
                l3 = ns3 = gc3 = 0
                sp3 = 0.0
                p3, l3, ns3, gc3, sp3 = take3(p3, l3, ns3, gc3, sp3, ln)
            else:
                start += l5
                ln -= l5
                ns -= ns5
                gc -= gc5
                sp -= sp5
                l5 = ns5 = gc5 = 0
                sp5 = 0.0
                p5, l5, ns5, gc5, sp5 = take5(p5, l5, ns5, gc5, sp5, ln)

    if stats_out is not None:
        stats_out.update(len=ln, gc=gc, ns=ns, sp=sp)
    return ln - ns, start, end


def fsa_stat(codes: np.ndarray, min_len: int, max_len: int) -> Tuple[int, int, int]:
    """Fasta read trim: strip flanking Ns (fsastat, runinput.c:315-368)."""
    length = len(codes)
    if max_len < length:
        return 0, 0, 0
    start, end = 0, length
    while start <= end and end > 0 and codes[end - 1] == 4:
        end -= 1
    while start < end and codes[start] == 4:
        start += 1
    ns = int((codes[start:end] == 4).sum())
    return (end - start) - ns, start, end


def _hmer_int(kmer: int, k: int):
    """getHmer core (stdnuc.c:287-310): duplicate the first base, then
    append each base that differs from its predecessor.  Returns
    (hmer, compressed length)."""
    i = 2 * k - 2
    h = (kmer >> i) & 3
    h = (h << 2) | h
    hlen = 1
    i -= 2
    while i >= 0:
        nuc = (kmer >> i) & 3
        if nuc != (h & 3):
            h = (h << 2) | nuc
            hlen += 1
        i -= 2
    return h, hlen


def cmer_scan(codes: np.ndarray, kmersize: int, mlen: int,
              flag: int) -> np.ndarray:
    """Per-window hash keys under the DB's cmer mode (setCmerPointers,
    stdnuc.c:396-421): flag&3 = 1 homopolymer-compressed (getHmer),
    2 minimizer (getMmer), 3 both (getHMmer).  Values match the
    reference's streaming update functions (ties in the minimizer
    scan differ only in position, never value)."""
    kmers = kmer_scan(codes, kmersize)
    mode = flag & 3
    if not mode or len(kmers) == 0:
        return kmers
    if mode == 2:
        mmask = np.uint64((1 << (2 * mlen)) - 1)
        out = kmers & mmask
        cur = kmers.copy()
        for _ in range(kmersize - mlen):
            cur >>= np.uint64(2)
            np.minimum(out, cur & mmask, out=out)
        return out
    out = np.empty_like(kmers)
    if mode == 1:
        trunc = kmersize == 16   # stdnuc.c:67 32-bit fold
        for j, km in enumerate(kmers.tolist()):
            h, _ = _hmer_int(km, kmersize)
            out[j] = (h & 0xFFFFFFFF) if trunc else (h & ((1 << 64) - 1))
    else:
        mm = (1 << (2 * mlen)) - 1
        for j, km in enumerate(kmers.tolist()):
            h, hlen = _hmer_int(km, kmersize)
            m = h & mm
            if mlen < hlen:
                hh = h >> 2
                for _ in range(hlen - mlen):
                    if (hh & mm) < m:
                        m = hh & mm
                    hh >>= 2
            out[j] = m
    return out
