"""Sparse mode (-Sparse) parity tests: sparse index build and the .spa
k-mer counting pipeline vs the reference (sparse.c, updateindex.c:79-199)."""

import subprocess

import numpy as np
import pytest

from kma_tpu.cli.main import main as kma_main
from kma_tpu.index.build import build_index_sparse
from kma_tpu.io.seq import parse_fasta


@pytest.fixture(scope="module")
def sparse_reads(tmp_path_factory, db50):
    rng = np.random.default_rng(42)
    recs = list(parse_fasta(str(db50)))
    comp = np.array([3, 2, 1, 0, 4, 5], dtype=np.uint8)
    out = tmp_path_factory.mktemp("sreads") / "reads.fq"
    with open(out, "w") as f:
        for ri in range(300):
            _h, codes = recs[rng.integers(len(recs))]
            L = int(rng.integers(80, 150))
            if len(codes) <= L:
                continue
            s = int(rng.integers(0, len(codes) - L))
            r = codes[s: s + L].copy()
            nerr = rng.binomial(L, 0.01)
            ppos = rng.integers(0, L, nerr)
            r[ppos] = (r[ppos] + rng.integers(1, 4, nerr)) % 4
            if rng.random() < 0.5:
                r = comp[r[::-1]]
            seq = "".join("ACGTN"[c] for c in r)
            f.write(f"@r{ri}\n{seq}\n+\n{'I' * len(seq)}\n")
    return out


@pytest.fixture(scope="module", params=["ATG", "-"])
def sparse_dbs(request, tmp_path_factory, db50, ref_index_bin):
    """(ref_db, my_db) sparse index pair for a real prefix and for
    pseudo-sparse ('-')."""
    prefix = request.param
    d = tmp_path_factory.mktemp("sidx")
    ref_db = str(d / "ref")
    my_db = str(d / "my")
    subprocess.run([str(ref_index_bin), "-i", str(db50), "-o", ref_db,
                    "-Sparse", prefix], check=True, capture_output=True)
    build_index_sparse([str(db50)], my_db, prefix, quiet=True)
    return ref_db, my_db


def test_sparse_companion_files_identical(sparse_dbs):
    """length.b gets the 4-section sparse layout (makeindex.c:263-269);
    .seq.b is dumped after the strand dance of updateDBs_sparse."""
    ref, my = sparse_dbs
    for ext in (".length.b", ".name", ".seq.b"):
        assert open(ref + ext, "rb").read() == open(my + ext, "rb").read(), \
            f"{ext} differs"


def test_sparse_hashmap_semantic_equal(sparse_dbs):
    """kma cmp rejects ANY sparse DB (cmp.c:109 trips on prefix != 0), so
    compare k-mer -> template lists directly."""
    from kma_tpu.index.format import load_comp_b
    a = load_comp_b(sparse_dbs[0] + ".comp.b")
    b = load_comp_b(sparse_dbs[1] + ".comp.b")
    assert (a.n, a.v_index, a.prefix, a.prefix_len) == \
        (b.n, b.v_index, b.prefix, b.prefix_len)
    ka = np.sort(a.key_index[: a.n])
    kb = np.sort(b.key_index[: b.n])
    assert np.array_equal(ka, kb)
    for km in ka[:: max(1, len(ka) // 512)].tolist():
        va = a.lookup(int(km))
        vb = b.lookup(int(km))
        assert vb is not None
        assert np.array_equal(np.asarray(va, np.int64),
                              np.asarray(vb, np.int64))


@pytest.mark.parametrize("extra", [[], ["-ss", "c"], ["-ss", "d"],
                                   ["-ID", "0.0", "-e", "1.0"]])
def test_spa_output_parity(tmp_path, sparse_dbs, sparse_reads, ref_bin,
                           extra):
    """.spa byte parity incl. the order-sensitive greedy withdrawal
    (withDraw_Kmers early stop, hashtable.c:254-257)."""
    ref_db, my_db = sparse_dbs
    ref_out = tmp_path / "ref"
    my_out = tmp_path / "my"
    r = subprocess.run([str(ref_bin), "-i", str(sparse_reads), "-o",
                        str(ref_out), "-t_db", ref_db, "-Sparse"] + extra,
                       capture_output=True)
    assert r.returncode == 0, r.stderr
    rc = kma_main(["-i", str(sparse_reads), "-o", str(my_out), "-t_db",
                   my_db, "-Sparse"] + extra)
    assert rc == 0
    a = (ref_out.parent / (ref_out.name + ".spa")).read_bytes()
    b = (my_out.parent / (my_out.name + ".spa")).read_bytes()
    assert a == b


def test_ref_binary_consumes_my_sparse_db(tmp_path, sparse_dbs,
                                          sparse_reads, ref_bin):
    ref_db, my_db = sparse_dbs
    outs = []
    for db in (ref_db, my_db):
        out = tmp_path / ("o" + db.replace("/", "_"))
        r = subprocess.run([str(ref_bin), "-i", str(sparse_reads), "-o",
                            str(out), "-t_db", db, "-Sparse"],
                           capture_output=True)
        assert r.returncode == 0, r.stderr
        outs.append((out.parent / (out.name + ".spa")).read_bytes())
    assert outs[0] == outs[1]
