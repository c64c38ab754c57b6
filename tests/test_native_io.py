"""Native step-1 fastq reader (native/kma_io.cpp) vs the Python path.

The Python parse_fastq + phred_stat implementation is the semantics
reference (itself byte-tested against the reference binary elsewhere);
the native reader must match it read-for-read, byte-for-byte across
trimming parameter combinations, gzip input, and chunk boundaries."""

import gzip

import numpy as np
import pytest

import kma_tpu.io.native_io as native_io
from kma_tpu.io.pipeline import iter_reads


def _mk_messy_fq(path, n=300, seed=7, crlf=False):
    rng = np.random.default_rng(seed)
    alpha = b"ACGTNacgtnRYSWKMBDHVXU"
    eol = b"\r\n" if crlf else b"\n"
    with open(path, "wb") as f:
        for i in range(n):
            ln = int(rng.integers(5, 180))
            seq = bytes(alpha[j] for j in rng.integers(0, len(alpha), ln))
            # quality: random walk with low-qual dips and low ends
            q = rng.integers(0, 41, ln)
            e5 = min(int(rng.integers(0, 8)), ln)
            e3 = min(int(rng.integers(0, 8)), ln - e5)
            q[:e5] = rng.integers(0, 20, e5)
            if e3:
                q[-e3:] = rng.integers(0, 20, e3)
            if rng.random() < 0.3:  # mid-read bad segment
                s = int(rng.integers(0, max(1, ln - 10)))
                q[s:s + 10] = rng.integers(0, 12, min(10, ln - s))
            qual = bytes((q + 33).tolist())
            f.write(b"@read_%d some description\t x " % i + eol)
            f.write(seq + eol + b"+" + eol + qual + eol)
        f.write(b"@trailing_partial" + eol + b"ACGT" + eol)  # dropped


def _collect(path, force_python, monkeypatch, **kw):
    from unittest import mock
    if force_python:
        with mock.patch.object(native_io, "get_lib", lambda: None):
            reads = list(iter_reads([str(path)], **kw))
    else:
        native_io._tried = False
        assert native_io.get_lib() is not None
        reads = list(iter_reads([str(path)], **kw))
    return [(r.header, r.codes.tobytes(), r.n_positions.tolist())
            for r in reads]


@pytest.mark.parametrize("kw", [
    dict(),
    dict(min_phred=30),
    dict(hardmask_q=53),                       # raw-byte quirk (-mi)
    dict(min_q=25),
    dict(min_q=20, hardmask_q=40, min_phred=25),
    dict(min_len=60),
    dict(max_len=120),
    dict(boot=True, min_len=5),
])
def test_native_matches_python(tmp_path, monkeypatch, kw):
    fq = tmp_path / "m.fq"
    _mk_messy_fq(fq)
    exp = _collect(fq, True, monkeypatch, **kw)
    got = _collect(fq, False, monkeypatch, **kw)
    assert got == exp
    # -mi/-mq raise min_phred (kma.c:1554) and trim the low-qual fixture
    # hard -- the parity assert above is the point there
    if not (kw.keys() & {"max_len", "min_len", "hardmask_q", "min_q"}):
        assert len(got) > 100  # the fixture mostly survives


def test_native_crlf_and_gz(tmp_path, monkeypatch):
    fq = tmp_path / "m.fq"
    _mk_messy_fq(fq, crlf=True, seed=11)
    gz = tmp_path / "m.fq.gz"
    gz.write_bytes(gzip.compress(fq.read_bytes()))
    for p in (fq, gz):
        exp = _collect(p, True, monkeypatch, min_q=13)
        got = _collect(p, False, monkeypatch, min_q=13)
        assert got == exp and len(got) > 50


def test_native_chunk_boundaries(tmp_path, monkeypatch):
    """Records split across chunk reads are carried, not corrupted."""
    fq = tmp_path / "m.fq"
    _mk_messy_fq(fq, n=120, seed=3)
    exp = _collect(fq, True, monkeypatch)
    monkeypatch.setattr(native_io, "_CHUNK", 257)
    got = _collect(fq, False, monkeypatch)
    assert got == exp


def test_native_malformed(tmp_path, monkeypatch):
    fq = tmp_path / "bad.fq"
    fq.write_bytes(b"@ok\nACGTACGTACGTACGTACGT\n+\n" + b"I" * 20 +
                   b"\nnot_a_header\nACGT\n+\nIIII\n")
    monkeypatch.setattr(native_io, "_tried", False)
    assert native_io.get_lib() is not None
    it = iter_reads([str(fq)], min_len=16)
    r = next(it)
    assert r.header == b"ok\x00"
    with pytest.raises(ValueError):
        next(it)
