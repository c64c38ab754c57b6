"""Index build/format parity tests against the reference kma_index."""

import subprocess

import numpy as np
import pytest

from kma_tpu.index.build import build_index
from kma_tpu.index.format import load_index
from kma_tpu.io.seq import (kmer_scan, pack_2bit, parse_fasta, rc_codes,
                            unpack_2bit, valid_kmer_mask)


@pytest.fixture(scope="module")
def both_indexes(tmp_path_factory, db50, ref_index_bin):
    d = tmp_path_factory.mktemp("idx")
    ref_prefix = str(d / "ref")
    my_prefix = str(d / "my")
    subprocess.run([str(ref_index_bin), "-i", str(db50), "-o", ref_prefix],
                   check=True, capture_output=True)
    build_index([str(db50)], my_prefix, quiet=True)
    return ref_prefix, my_prefix


def test_companion_files_identical(both_indexes):
    ref, my = both_indexes
    for ext in (".length.b", ".name", ".seq.b"):
        a = open(ref + ext, "rb").read()
        b = open(my + ext, "rb").read()
        assert a == b, f"{ext} differs"


def test_header_fields_match(both_indexes):
    ref, my = (load_index(p) for p in both_indexes)
    assert ref.db_size == my.db_size
    assert ref.n == my.n
    assert ref.size == my.size
    assert ref.v_index == my.v_index
    assert ref.kmersize == my.kmersize
    assert ref.flag == my.flag
    assert ref.null_index == my.null_index


def test_kmer_content_matches(both_indexes):
    ref, my = (load_index(p) for p in both_indexes)
    refk = np.sort(ref.key_index[: ref.n].astype(np.uint64))
    myk = np.sort(my.key_index[: my.n].astype(np.uint64))
    assert np.array_equal(refk, myk)
    rng = np.random.default_rng(7)
    for km in rng.choice(refk, 500).tolist():
        a = ref.lookup(int(km))
        b = my.lookup(int(km))
        assert a is not None and b is not None
        assert np.array_equal(np.asarray(a, np.int64), np.asarray(b, np.int64))


def test_ref_cmp_oracle(both_indexes, ref_bin):
    """The reference's own `kma cmp` must declare the hashmaps equal."""
    ref, my = both_indexes
    r = subprocess.run([str(ref_bin), "cmp", "-t_db", ref, "-s_db", my],
                       capture_output=True, text=True)
    assert "Hashmaps match" in r.stderr


def test_ref_binary_maps_against_my_index(both_indexes, ref_bin, db50, tmp_path):
    """The reference kma must be able to consume our index files."""
    ref, my = both_indexes
    reads = tmp_path / "reads.fq"
    # make some simple error-free reads from the fasta
    recs = list(parse_fasta(str(db50)))[:5]
    with open(reads, "w") as f:
        for i, (_h, codes) in enumerate(recs):
            seq = "".join("ACGTN"[c] for c in codes[:100])
            f.write(f"@r{i}\n{seq}\n+\n{'I' * len(seq)}\n")
    out_ref = tmp_path / "o_ref"
    out_my = tmp_path / "o_my"
    for db, out in ((ref, out_ref), (my, out_my)):
        r = subprocess.run([str(ref_bin), "-i", str(reads), "-o", str(out),
                            "-t_db", db, "-1t1"], capture_output=True)
        assert r.returncode == 0, r.stderr
    assert (out_ref.with_suffix(".res").read_bytes()
            == out_my.with_suffix(".res").read_bytes())


def test_pack_roundtrip():
    rng = np.random.default_rng(3)
    for n in (1, 31, 32, 33, 64, 100, 1000):
        codes = rng.integers(0, 4, n).astype(np.uint8)
        assert np.array_equal(unpack_2bit(pack_2bit(codes), n), codes)


def test_kmer_scan_matches_naive():
    rng = np.random.default_rng(4)
    codes = rng.integers(0, 5, 200).astype(np.uint8)
    k = 16
    kmers = kmer_scan(codes, k)
    valid = valid_kmer_mask(codes, k)
    for i in range(len(kmers)):
        win = codes[i: i + k]
        if (win == 4).any():
            assert not valid[i]
        else:
            expect = 0
            for c in win:
                expect = (expect << 2) | int(c)
            assert valid[i]
            assert int(kmers[i]) == expect


def test_rc_codes():
    codes = np.array([0, 1, 2, 3, 4], dtype=np.uint8)
    assert np.array_equal(rc_codes(codes), np.array([4, 0, 1, 2, 3]))


def test_spill_build_matches_dict_path(tmp_path, db50, ref_index_bin):
    """The bounded-RSS spill accumulator (KmerSpill) reproduces the
    reference .comp.b byte-for-byte even when forced to spill many runs
    (compress.c:83-614 disk-failover role)."""
    import subprocess as sp
    from kma_tpu.index import build as B

    ref_prefix = str(tmp_path / "ref")
    sp.run([str(ref_index_bin), "-i", str(db50), "-o", ref_prefix],
           check=True, capture_output=True)
    # force tiny runs so every record spills
    orig = B.KmerSpill.__init__

    def tiny(self, tmpdir=None, cap=1 << 12):
        orig(self, tmpdir, cap)
    B.KmerSpill.__init__ = tiny
    try:
        my_prefix = str(tmp_path / "my")
        B.build_index([str(db50)], my_prefix, quiet=True)
    finally:
        B.KmerSpill.__init__ = orig
    for ext in (".comp.b", ".length.b", ".name", ".seq.b"):
        assert (tmp_path / ("my" + ext)).read_bytes() \
            == (tmp_path / ("ref" + ext)).read_bytes(), ext
