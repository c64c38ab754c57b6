"""Step-1 read preparation and the binary stream formats between stages.

The reference splits a run into three processes talking over pipes
(kma.c:1439/1602, kmapipe.c); here the stages are in-process, but the byte
formats are kept available for stage-by-stage parity testing against
`kma ... -s1` / `kma ... -s2` streams:

- step1 record (printFsa, runinput.c:765-787):
    i32[4]{seqlen, complen, nN, headerLen} (headerLen<0 = first mate),
    u64[complen] 2-bit seq, i32[nN] N positions, byte[headerLen] header
    (header excludes the '@'/'>' and carries a trailing NUL).
- step2 anker record (print_ankers, ankers.c:30-50):
    i32[7]{seqlen, complen, nN, rc_flag, nTemplates, headerLen, samFlag},
    seq, N positions, i32[nTemplates] signed ids, header; terminated by a
    single negative i32 = -readCount (kmers.c:257).
"""

from __future__ import annotations

import struct
import sys
from typing import BinaryIO, Iterator, List, Optional, Tuple

import numpy as np

from .seq import (detect_format, fsa_stat, pack_2bit, parse_fasta,
                  parse_fastq, phred_stat, sniff_phred_scale)


class Read:
    """A trimmed, coded read ready for mapping."""

    __slots__ = ("codes", "n_positions", "header", "mate_first")

    def __init__(self, codes: np.ndarray, header: bytes,
                 mate_first: bool = False, n_positions=None):
        self.codes = codes
        self.n_positions = n_positions if n_positions is not None \
            else np.flatnonzero(codes == 4).astype(np.int32)
        self.header = header  # without '@'/'>' prefix, WITH trailing NUL
        self.mate_first = mate_first


def _boot_pieces(codes: np.ndarray, header: bytes) -> Iterator[Read]:
    """-boot: overlapping 1024-base sub-sequences at stride 512, each an
    independent fragment with the read's header (bootFsa,
    runinput.c:732-763)."""
    end = len(codes) - 1024
    i = 0
    while i < end:
        yield Read(codes[i: i + 1024].copy(), header)
        i += 512
    yield Read(codes[i:].copy(), header)


def iter_reads(input_files: List[str], min_phred: int = 20,
               hardmask_q: int = 0, min_q: int = 0, five_clip: int = 0,
               three_clip: int = 0, min_len: int = 16,
               max_len: int = 2147483647, qc=None,
               boot: bool = False) -> Iterator[Read]:
    """Parse, trim and yield reads (run_input, runinput.c:370-461).

    With a QCStat, per-read statistics are recorded as phredStat/fsastat
    do (runinput.c:133-135, 304-306, 359-361) and the fragment counters
    at the end (runinput.c:448-452)."""
    if min_phred < hardmask_q:  # kma.c:1554-1556
        min_phred = hardmask_q
    if min_phred < min_q:
        min_phred = min_q
    count = 0
    org = 0
    scale = 33
    for path in input_files:
        fmt = detect_format(path)
        print("%s\t%s" % ("# Reading inputfile: ", path), file=sys.stderr)
        if fmt == "fastq":
            scale = sniff_phred_scale(path)
            print("# Phred scale:\t%d" % scale, file=sys.stderr)
            if qc is None:
                from .native_io import get_lib, iter_fastq_native
                if get_lib() is not None:
                    # native batch parse+trim+pack (runinput.c:370-461
                    # fast path; exact port of the loop below)
                    for codes, header, npos in iter_fastq_native(
                            path, scale, min_phred, min_q, hardmask_q,
                            min_len, max_len):
                        count += 1
                        if boot:
                            yield from _boot_pieces(codes, header)
                        else:
                            yield Read(codes, header, n_positions=npos)
                    continue
            for header, codes, qual in parse_fastq(path):
                org += 1
                if qc is not None:
                    qc.org_read(len(codes))
                st = {} if qc is not None else None
                ln, start, end = phred_stat(codes, qual, scale, min_phred,
                                            min_q, hardmask_q, min_len,
                                            max_len, stats_out=st)
                if qc is not None and min_len <= ln and "skip" not in st:
                    qc.update(st["len"], st["gc"], st["ns"], st["sp"])
                if min_len <= ln:
                    count += 1
                    if boot:
                        yield from _boot_pieces(codes[start:end],
                                                header[1:] + b"\x00")
                    else:
                        yield Read(codes[start:end].copy(),
                                   header[1:] + b"\x00")
        else:
            for header, codes in parse_fasta(path):
                org += 1
                if qc is not None:
                    qc.org_read(len(codes))
                ln, start, end = fsa_stat(codes, min_len, max_len)
                # fsastat's QC gate uses the N-inclusive length
                if qc is not None and min_len <= end - start:
                    gc, ns, _sp = qc.read_stats(codes[start:end], None, 33)
                    qc.update(end - start, gc, ns, 0.0)
                if min_len <= ln:
                    count += 1
                    if boot:
                        yield from _boot_pieces(codes[start:end],
                                                header[1:] + b"\x00")
                    else:
                        yield Read(codes[start:end].copy(),
                                   header[1:] + b"\x00")
    if qc is not None:
        qc.finish_input(count, org, scale)


def iter_read_pairs(pe_files: List[str], min_phred: int = 20,
                    hardmask_q: int = 0, min_q: int = 0, min_len: int = 16,
                    max_len: int = 2147483647, qc=None,
                    interleaved: bool = False):
    """Paired files (run_input_PE, runinput.c:463-606): yields
    (read1, read2) when both mates survive trimming, (read, None) when
    only one does.  interleaved=True treats each file as -int input
    (run_input_INT, runinput.c:608-730)."""
    if min_phred < hardmask_q:  # kma.c:1554-1556
        min_phred = hardmask_q
    if min_phred < min_q:
        min_phred = min_q
    count = 0
    org = 0
    last_scale = 33

    def _qc_mate(codes, st, start, end, ln):
        if qc is None:
            return
        qc.org_read(len(codes))
        if st is not None:
            if min_len <= ln and "skip" not in st:
                qc.update(st["len"], st["gc"], st["ns"], st["sp"])
        elif min_len <= end - start:
            gc, ns, _sp = qc.read_stats(codes[start:end], None, 33)
            qc.update(end - start, gc, ns, 0.0)

    if interleaved:
        # run_input_INT (runinput.c:608-730): consecutive records pair up
        def _pairwise(it):
            while True:
                try:
                    a = next(it)
                    b = next(it)
                except StopIteration:
                    return
                yield a, b
        file_pairs = [(f, f) for f in pe_files]
    else:
        file_pairs = [(pe_files[fi], pe_files[fi + 1])
                      for fi in range(0, len(pe_files), 2)]

    for f1, f2 in file_pairs:
        fmt = detect_format(f1)
        if fmt == "fastq":
            scale = sniff_phred_scale(f1) or sniff_phred_scale(f2)
            if qc is None:
                from .native_io import get_lib, iter_fastq_native_pe
                if get_lib() is not None:
                    # native batch parse+trim; failed mates come back as
                    # None so the streams stay paired (runinput.c:463-606)
                    last_scale = scale

                    def _nat(path):
                        return iter_fastq_native_pe(
                            path, scale, min_phred, min_q, hardmask_q,
                            min_len, max_len)
                    if interleaved:
                        it = _nat(f1)
                        pair_n = zip(it, it)
                    else:
                        pair_n = zip(_nat(f1), _nat(f2))
                    for (c1, h1), (c2, h2) in pair_n:
                        r1 = Read(c1, h1, True) if c1 is not None else None
                        r2 = Read(c2, h2) if c2 is not None else None
                        if r1 is not None and r2 is not None:
                            yield r1, r2
                        elif r1 is not None:
                            r1.mate_first = False
                            yield r1, None
                        elif r2 is not None:
                            yield r2, None
                    continue
            if interleaved:
                it1 = it2 = None
                pair_iter = _pairwise(parse_fastq(f1))
            else:
                it1 = parse_fastq(f1)
                it2 = parse_fastq(f2)
            last_scale = scale
            if not interleaved:
                pair_iter = zip(it1, it2)
            for (h1, c1, q1), (h2, c2, q2) in pair_iter:
                org += 1
                st1 = {} if qc is not None else None
                l1, s1, e1 = phred_stat(c1, q1, scale, min_phred, min_q,
                                        hardmask_q, min_len, max_len,
                                        stats_out=st1)
                _qc_mate(c1, st1, s1, e1, l1)
                st2 = {} if qc is not None else None
                l2, s2, e2 = phred_stat(c2, q2, scale, min_phred, min_q,
                                        hardmask_q, min_len, max_len,
                                        stats_out=st2)
                _qc_mate(c2, st2, s2, e2, l2)
                r1 = Read(c1[s1:e1].copy(), h1[1:] + b"\x00", True) \
                    if min_len <= l1 else None
                r2 = Read(c2[s2:e2].copy(), h2[1:] + b"\x00") \
                    if min_len <= l2 else None
                if r1 is not None and r2 is not None:
                    count += 1
                    yield r1, r2
                elif r1 is not None:
                    count += 1
                    r1.mate_first = False
                    yield r1, None
                elif r2 is not None:
                    count += 1
                    yield r2, None
        else:
            if interleaved:
                pair_iter_f = _pairwise(parse_fasta(f1))
            else:
                pair_iter_f = zip(parse_fasta(f1), parse_fasta(f2))
            for (h1, c1), (h2, c2) in pair_iter_f:
                org += 1
                l1, s1, e1 = fsa_stat(c1, min_len, max_len)
                _qc_mate(c1, None, s1, e1, l1)
                l2, s2, e2 = fsa_stat(c2, min_len, max_len)
                _qc_mate(c2, None, s2, e2, l2)
                r1 = Read(c1[s1:e1].copy(), h1[1:] + b"\x00", True) \
                    if min_len <= l1 else None
                r2 = Read(c2[s2:e2].copy(), h2[1:] + b"\x00") \
                    if min_len <= l2 else None
                if r1 is not None and r2 is not None:
                    count += 1
                    yield r1, r2
                elif r1 is not None:
                    count += 1
                    r1.mate_first = False
                    yield r1, None
                elif r2 is not None:
                    count += 1
                    yield r2, None
    if qc is not None:
        qc.finish_input(count, org, last_scale)


def write_step1_record(f: BinaryIO, read: Read) -> None:
    """printFsa wire format (runinput.c:765-787)."""
    codes = read.codes
    seqlen = len(codes)
    words = pack_2bit(codes)
    hlen = len(read.header)
    f.write(struct.pack("<iiii", seqlen, len(words), len(read.n_positions),
                        -hlen if read.mate_first else hlen))
    f.write(words.astype("<u8").tobytes())
    f.write(read.n_positions.astype("<i4").tobytes())
    f.write(read.header)


def read_step1_stream(f: BinaryIO) -> Iterator[Read]:
    """Inverse of write_step1_record (loadFsa, savekmers.c:50-92)."""
    from .seq import unpack_2bit
    while True:
        hdr = f.read(16)
        if len(hdr) < 16:
            return
        seqlen, complen, nN, hlen = struct.unpack("<iiii", hdr)
        words = np.frombuffer(f.read(8 * complen), dtype="<u8")
        npos = np.frombuffer(f.read(4 * nN), dtype="<i4")
        header = f.read(abs(hlen))
        codes = unpack_2bit(words, seqlen)
        codes[npos] = 4
        r = Read(codes, header, mate_first=hlen < 0)
        yield r


def write_anker(f: BinaryIO, codes: np.ndarray, n_positions: np.ndarray,
                rc_flag: int, templates: np.ndarray, header: bytes,
                sam_flag: int, wire_words=None) -> None:
    """print_ankers wire format (ankers.c:30-50)."""
    seqlen = len(codes)
    words = pack_2bit(codes) if wire_words is None else wire_words
    f.write(struct.pack("<iiiiiii", seqlen, len(words), len(n_positions),
                        rc_flag, len(templates), len(header), sam_flag))
    f.write(words.astype("<u8").tobytes())
    f.write(np.asarray(n_positions).astype("<i4").tobytes())
    f.write(np.asarray(templates).astype("<i4").tobytes())
    f.write(header)


class Anker:
    __slots__ = ("codes", "n_positions", "rc_flag", "templates", "header",
                 "flag")

    def __init__(self, codes, n_positions, rc_flag, templates, header, flag):
        self.codes = codes
        self.n_positions = n_positions
        self.rc_flag = rc_flag
        self.templates = templates
        self.header = header
        self.flag = flag


def read_anker_stream(f: BinaryIO) -> Iterator[Anker]:
    """get_ankers (ankers.c:163-220); stops at the -readCount sentinel."""
    from .seq import unpack_2bit
    while True:
        hdr = f.read(28)
        if len(hdr) < 4:
            return
        first = struct.unpack("<i", hdr[:4])[0]
        if first < 0:
            return
        if len(hdr) < 28:
            return
        seqlen, complen, nN, rc_flag, nt, hlen, flag = struct.unpack(
            "<iiiiiii", hdr)
        words = np.frombuffer(f.read(8 * complen), dtype="<u8")
        npos = np.frombuffer(f.read(4 * nN), dtype="<i4")
        templates = np.frombuffer(f.read(4 * nt), dtype="<i4")
        header = f.read(hlen)
        codes = unpack_2bit(words, seqlen)
        codes[npos] = 4
        yield Anker(codes, npos, rc_flag, templates, header, flag)
