"""-Mt1 parity: map everything against one template (mt1.c:46-500)."""

import gzip
import subprocess

import numpy as np
import pytest

from kma_tpu.cli.main import main as kma_main
from kma_tpu.io.seq import parse_fasta


@pytest.fixture(scope="module")
def mt1_pairs(tmp_path_factory, db50):
    rng = np.random.default_rng(99)
    recs = list(parse_fasta(str(db50)))
    comp = np.array([3, 2, 1, 0, 4, 5], dtype=np.uint8)
    d = tmp_path_factory.mktemp("mt1pe")
    f1p, f2p = d / "pe_1.fq", d / "pe_2.fq"
    with open(f1p, "w") as f1, open(f2p, "w") as f2:
        for ri in range(200):
            _h, codes = recs[rng.integers(len(recs))]
            ins = 205
            if len(codes) <= ins:
                continue
            s = int(rng.integers(0, len(codes) - ins))
            frag = codes[s: s + ins]
            r1 = frag[:100].copy()
            r2 = comp[frag[-100:][::-1]].copy()
            for r in (r1, r2):
                nerr = rng.binomial(100, 0.01)
                ppos = rng.integers(0, 100, nerr)
                r[ppos] = (r[ppos] + rng.integers(1, 4, nerr)) % 4
            f1.write("@p%d/1\n%s\n+\n%s\n"
                     % (ri, "".join("ACGTN"[c] for c in r1), "I" * 100))
            f2.write("@p%d/2\n%s\n+\n%s\n"
                     % (ri, "".join("ACGTN"[c] for c in r2), "I" * 100))
    return f1p, f2p


@pytest.mark.parametrize("mtn,extra", [(14, []), (3, ["-vcf", "-matrix"])])
def test_mt1_se_parity(tmp_path, sim_reads_mod, db50_index_mod, ref_bin,
                       mtn, extra):
    _compare(tmp_path, ref_bin, db50_index_mod,
             ["-i", str(sim_reads_mod)], mtn, extra)


def test_mt1_pe_parity(tmp_path, mt1_pairs, db50_index_mod, ref_bin):
    f1, f2 = mt1_pairs
    _compare(tmp_path, ref_bin, db50_index_mod,
             ["-ipe", str(f1), str(f2)], 14, [])


def _compare(tmp_path, ref_bin, db, inargs, mtn, extra):
    ref_out = tmp_path / "ref"
    my_out = tmp_path / "my"
    r = subprocess.run([str(ref_bin)] + inargs + ["-o", str(ref_out),
                       "-t_db", db, "-Mt1", str(mtn)] + extra,
                       capture_output=True)
    assert r.returncode == 0, r.stderr
    rc = kma_main(inargs + ["-o", str(my_out), "-t_db", db, "-Mt1",
                            str(mtn)] + extra)
    assert rc == 0
    for ext in (".res", ".fsa", ".aln"):
        a = (ref_out.parent / (ref_out.name + ext)).read_bytes()
        b = (my_out.parent / (my_out.name + ext)).read_bytes()
        assert a == b, f"{ext} differs"
    a = gzip.open(str(ref_out) + ".frag.gz").read()
    b = gzip.open(str(my_out) + ".frag.gz").read()
    assert a == b
    if "-matrix" in extra:
        a = gzip.open(str(ref_out) + ".mat.gz").read()
        b = gzip.open(str(my_out) + ".mat.gz").read()
        assert a == b
    if "-vcf" in extra:
        a = gzip.open(str(ref_out) + ".vcf.gz").read()
        b = gzip.open(str(my_out) + ".vcf.gz").read()
        assert a == b


@pytest.fixture(scope="module")
def sim_reads_mod(tmp_path_factory, db50):
    rng = np.random.default_rng(42)
    recs = list(parse_fasta(str(db50)))
    comp = np.array([3, 2, 1, 0, 4, 5], dtype=np.uint8)
    out = tmp_path_factory.mktemp("mt1reads") / "reads.fq"
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


@pytest.fixture(scope="module")
def db50_index_mod(tmp_path_factory, db50, ref_index_bin):
    d = tmp_path_factory.mktemp("mt1idx")
    prefix = str(d / "db")
    subprocess.run([str(ref_index_bin), "-i", str(db50), "-o", prefix],
                   check=True, capture_output=True)
    return prefix
