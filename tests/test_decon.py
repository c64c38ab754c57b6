"""-deCon parity tests: contamination-marked index (.decon.comp.b,
decon.c), emit-time filtering (deConPrint, ankers.c:106-148) and the
sparse deCon branch (sparse.c:459-644)."""

import gzip
import subprocess
from pathlib import Path

import numpy as np
import pytest

from kma_tpu.cli.main import main as kma_main
from kma_tpu.index.format import load_comp_b
from kma_tpu.io.seq import parse_fasta


@pytest.fixture(scope="module")
def cont_fsa(tmp_path_factory, resfinder):
    """Three ResFinder templates (51-53) as the contamination set."""
    out = tmp_path_factory.mktemp("cont") / "cont.fsa"
    recs = 0
    lines = []
    for line in resfinder.read_text().splitlines(keepends=True):
        if line.startswith(">"):
            recs += 1
        if 50 < recs <= 53:
            lines.append(line)
        if recs > 53:
            break
    out.write_text("".join(lines))
    return out


@pytest.fixture(scope="module")
def dc_reads(tmp_path_factory, db50, cont_fsa):
    """Reads drawn from both the DB and the contamination templates."""
    rng = np.random.default_rng(7)
    recs = list(parse_fasta(str(db50))) + list(parse_fasta(str(cont_fsa))) * 3
    comp = np.array([3, 2, 1, 0, 4, 5], dtype=np.uint8)
    out = tmp_path_factory.mktemp("dcreads") / "reads.fq"
    with open(out, "w") as f:
        for ri in range(400):
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


@pytest.fixture(scope="module")
def decon_dbs(tmp_path_factory, db50, cont_fsa, ref_index_bin):
    d = tmp_path_factory.mktemp("dcidx")
    ref_db = str(d / "ref")
    my_db = str(d / "my")
    subprocess.run([str(ref_index_bin), "-i", str(db50), "-o", ref_db,
                    "-deCon", str(cont_fsa)], check=True,
                   capture_output=True)
    rc = kma_main(["index", "-i", str(db50), "-o", my_db, "-deCon",
                   str(cont_fsa)])
    assert rc == 0
    return ref_db, my_db


def test_decon_index_semantic_equal(decon_dbs, ref_bin):
    ref_db, my_db = decon_dbs
    a = load_comp_b(ref_db + ".decon.comp.b")
    b = load_comp_b(my_db + ".decon.comp.b")
    assert (a.db_size, a.n, a.v_index) == (b.db_size, b.n, b.v_index)
    r = subprocess.run([str(ref_bin), "cmp", "-t_db", ref_db + ".decon",
                        "-s_db", my_db + ".decon"], capture_output=True,
                       text=True)
    assert "Hashmaps match" in r.stderr


@pytest.mark.parametrize("mode", [[], ["-1t1"], ["-mem_mode"]])
def test_decon_mapping_parity(tmp_path, decon_dbs, dc_reads, ref_bin, mode):
    ref_db, my_db = decon_dbs
    ref_out = tmp_path / "ref"
    my_out = tmp_path / "my"
    r = subprocess.run([str(ref_bin), "-i", str(dc_reads), "-o",
                        str(ref_out), "-t_db", ref_db, "-deCon"] + mode,
                       capture_output=True)
    assert r.returncode == 0, r.stderr
    rc = kma_main(["-i", str(dc_reads), "-o", str(my_out), "-t_db", my_db,
                   "-deCon"] + mode)
    assert rc == 0
    for ext in (".res", ".fsa", ".aln"):
        a = (ref_out.parent / (ref_out.name + ext)).read_bytes()
        b = (my_out.parent / (my_out.name + ext)).read_bytes()
        assert a == b, f"{ext} differs"
    a = gzip.open(str(ref_out) + ".frag.gz").read()
    b = gzip.open(str(my_out) + ".frag.gz").read()
    assert a == b


@pytest.fixture(scope="session")
def padcalloc(ref_bin):
    """Allocation-padding shim: the reference's sparse deCon reads one
    slot past its Scores arrays (contamination id == DB_size, sparse.c:
    484/632); padding every allocation with zeroed bytes makes that OOB
    read deterministic so the binary can serve as an oracle."""
    src = Path(__file__).parent / "oracle" / "padcalloc.c"
    so = Path(__file__).parent.parent / ".ref_build" / "padcalloc.so"
    if not so.exists():
        subprocess.run(["gcc", "-O2", "-shared", "-fPIC", "-o", str(so),
                        str(src)], check=True)
    return so


@pytest.mark.parametrize("prefix", ["ATG", "-"])
def test_sparse_decon_spa_parity(tmp_path, db50, cont_fsa, dc_reads,
                                 ref_bin, ref_index_bin, padcalloc, prefix):
    import os
    ref_db = str(tmp_path / "ref")
    my_db = str(tmp_path / "my")
    subprocess.run([str(ref_index_bin), "-i", str(db50), "-o", ref_db,
                    "-Sparse", prefix, "-deCon", str(cont_fsa)],
                   check=True, capture_output=True)
    rc = kma_main(["index", "-i", str(db50), "-o", my_db, "-Sparse",
                   prefix, "-deCon", str(cont_fsa)])
    assert rc == 0
    env = dict(os.environ, LD_PRELOAD=str(padcalloc))
    for extra in ([], ["-ID", "0.0", "-e", "1.0"]):
        r = subprocess.run([str(ref_bin), "-i", str(dc_reads), "-o",
                            str(tmp_path / "refo"), "-t_db", ref_db,
                            "-Sparse", "-deCon"] + extra,
                           capture_output=True, env=env)
        assert r.returncode == 0, r.stderr
        rc = kma_main(["-i", str(dc_reads), "-o", str(tmp_path / "myo"),
                       "-t_db", my_db, "-Sparse", "-deCon"] + extra)
        assert rc == 0
        a = (tmp_path / "refo.spa").read_bytes()
        b = (tmp_path / "myo.spa").read_bytes()
        assert a == b
