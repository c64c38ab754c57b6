"""End-to-end golden tests: full pipeline vs the reference binary."""

import gzip
import subprocess

import numpy as np
import pytest

from kma_tpu.cli.main import main as kma_main
from kma_tpu.io.seq import parse_fasta


@pytest.fixture(scope="module")
def sim_reads(tmp_path_factory, db50):
    """Deterministic synthetic reads with errors from db50 templates."""
    rng = np.random.default_rng(42)
    recs = list(parse_fasta(str(db50)))
    comp = np.array([3, 2, 1, 0, 4, 5], dtype=np.uint8)
    out = tmp_path_factory.mktemp("reads") / "reads.fq"
    with open(out, "w") as f:
        for ri in range(500):
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
def db50_index(tmp_path_factory, db50, ref_index_bin):
    d = tmp_path_factory.mktemp("db_idx")
    prefix = str(d / "db")
    subprocess.run([str(ref_index_bin), "-i", str(db50), "-o", prefix],
                   check=True, capture_output=True)
    return prefix


def test_full_pipeline_1t1_parity(tmp_path, sim_reads, db50_index, ref_bin):
    """kma -1t1 SE: .res/.fsa/.aln/.frag.gz parity (the reference at -t 1
    is the deterministic parity target, SURVEY.md hard part #2)."""
    ref_out = tmp_path / "ref"
    my_out = tmp_path / "my"
    r = subprocess.run([str(ref_bin), "-i", str(sim_reads), "-o",
                        str(ref_out), "-t_db", db50_index, "-1t1"],
                       capture_output=True)
    assert r.returncode == 0
    rc = kma_main(["-i", str(sim_reads), "-o", str(my_out), "-t_db",
                   db50_index, "-1t1"])
    assert rc == 0
    for ext in (".res", ".fsa", ".aln"):
        a = (ref_out.parent / (ref_out.name + ext)).read_bytes()
        b = (my_out.parent / (my_out.name + ext)).read_bytes()
        assert a == b, f"{ext} differs"
    a = gzip.open(str(ref_out) + ".frag.gz").read()
    b = gzip.open(str(my_out) + ".frag.gz").read()
    assert a == b, ".frag.gz content differs"


@pytest.fixture(scope="module")
def sim_pairs(tmp_path_factory, db50):
    """Proper pairs (insert 205) plus orientation flips and errors."""
    rng = np.random.default_rng(99)
    recs = list(parse_fasta(str(db50)))
    comp = np.array([3, 2, 1, 0, 4, 5], dtype=np.uint8)
    d = tmp_path_factory.mktemp("pe")
    f1p, f2p = d / "pe_1.fq", d / "pe_2.fq"
    with open(f1p, "w") as f1, open(f2p, "w") as f2:
        n = 0
        while n < 300:
            _h, codes = recs[rng.integers(len(recs))]
            ins, L = 205, 100
            if len(codes) <= ins + 2:
                continue
            s = int(rng.integers(0, len(codes) - ins))
            frag = codes[s: s + ins]
            r1 = frag[:L].copy()
            r2 = comp[frag[-L:][::-1]].copy()
            for r in (r1, r2):
                ne = rng.binomial(L, 0.01)
                pos = rng.integers(0, L, ne)
                r[pos] = (r[pos] + rng.integers(1, 4, ne)) % 4
            if rng.random() < 0.5:
                r1, r2 = comp[r2[::-1]].copy(), comp[r1[::-1]].copy()
            f1.write(f"@p{n}/1\n{''.join('ACGTN'[c] for c in r1)}\n+\n{'I' * L}\n")
            f2.write(f"@p{n}/2\n{''.join('ACGTN'[c] for c in r2)}\n+\n{'I' * L}\n")
            n += 1
    return f1p, f2p


def test_full_pipeline_pe_parity(tmp_path, sim_pairs, db50_index, ref_bin):
    """kma -ipe -1t1 (union pairing): output parity."""
    f1, f2 = sim_pairs
    ref_out = tmp_path / "ref"
    my_out = tmp_path / "my"
    r = subprocess.run([str(ref_bin), "-ipe", str(f1), str(f2), "-o",
                        str(ref_out), "-t_db", db50_index, "-1t1"],
                       capture_output=True)
    assert r.returncode == 0
    rc = kma_main(["-ipe", str(f1), str(f2), "-o", str(my_out), "-t_db",
                   db50_index, "-1t1"])
    assert rc == 0
    for ext in (".res", ".fsa", ".aln"):
        a = (ref_out.parent / (ref_out.name + ext)).read_bytes()
        b = (my_out.parent / (my_out.name + ext)).read_bytes()
        assert a == b, f"{ext} differs"
    a = gzip.open(str(ref_out) + ".frag.gz").read()
    b = gzip.open(str(my_out) + ".frag.gz").read()
    assert a == b


def test_all_output_formats_parity(tmp_path, sim_reads, db50_index, ref_bin):
    """-vcf -ef -tsv -matrix -sam: all secondary outputs match."""
    ref_out = tmp_path / "ref"
    my_out = tmp_path / "my"
    with open(tmp_path / "ref.sam", "w") as sam:
        subprocess.run([str(ref_bin), "-i", str(sim_reads), "-o",
                        str(ref_out), "-t_db", db50_index, "-1t1", "-vcf",
                        "-ef", "-tsv", "-matrix", "-sam"], stdout=sam,
                       stderr=subprocess.DEVNULL, check=True)
    import contextlib
    import io as _io
    import sys as _sys
    buf = _io.StringIO()
    with contextlib.redirect_stdout(buf):
        rc = kma_main(["-i", str(sim_reads), "-o", str(my_out), "-t_db",
                       db50_index, "-1t1", "-vcf", "-ef", "-tsv", "-matrix",
                       "-sam"])
    assert rc == 0
    for ext in (".res", ".tsv"):
        assert (ref_out.parent / (ref_out.name + ext)).read_bytes() == \
            (my_out.parent / (my_out.name + ext)).read_bytes(), ext
    for ext in (".vcf.gz", ".mat.gz", ".frag.gz"):
        a = gzip.open(str(ref_out) + ext).read()
        b = gzip.open(str(my_out) + ext).read()
        assert a == b, ext
    # mapstat rows (headers carry date/command)
    ra = [l for l in (tmp_path / "ref.mapstat").read_text().splitlines()
          if not l.startswith("##")]
    rb = [l for l in (tmp_path / "my.mapstat").read_text().splitlines()
          if not l.startswith("##")]
    assert ra == rb
    # sam records order-insensitively (reference thread interleaving)
    ref_sam = (tmp_path / "ref.sam").read_text().splitlines()
    my_sam = buf.getvalue().splitlines()
    assert sorted(l for l in ref_sam if not l.startswith("@")) == \
        sorted(l for l in my_sam if not l.startswith("@"))


@pytest.fixture(scope="module")
def nano_reads(tmp_path_factory, db50):
    """Chimeric error-rich long reads (splicing + nano caller exercise)."""
    rng = np.random.default_rng(1234)
    recs = list(parse_fasta(str(db50)))
    comp = np.array([3, 2, 1, 0, 4, 5], dtype=np.uint8)
    out = tmp_path_factory.mktemp("nano") / "nano.fq"

    def mutate(r, sub=0.05, indel=0.02):
        o = []
        for c in r:
            x = rng.random()
            if x < indel / 2:
                continue
            if x < indel:
                o.append(int(rng.integers(0, 4)))
            if rng.random() < sub:
                o.append(int((c + rng.integers(1, 4)) % 4))
            else:
                o.append(int(c))
        return np.array(o, dtype=np.uint8)

    with open(out, "w") as f:
        for i in range(150):
            nseg = int(rng.integers(1, 4))
            parts = []
            for _s in range(nseg):
                _h, codes = recs[rng.integers(len(recs))]
                L = int(rng.integers(200, min(900, len(codes))))
                st = int(rng.integers(0, len(codes) - L + 1))
                seg = mutate(codes[st: st + L])
                if rng.random() < 0.5:
                    seg = comp[seg[::-1]]
                parts.append(seg)
            r = np.concatenate(parts)
            f.write(f"@n{i}\n{''.join('ACGTN'[c] for c in r)}\n+\n"
                    f"{'I' * len(r)}\n")
    return out


def test_chain_mode_parity(tmp_path, sim_reads, db50_index, ref_bin):
    """Default mode (chain scanner, no -1t1)."""
    ref_out = tmp_path / "ref"
    my_out = tmp_path / "my"
    subprocess.run([str(ref_bin), "-i", str(sim_reads), "-o", str(ref_out),
                    "-t_db", db50_index], capture_output=True, check=True)
    assert kma_main(["-i", str(sim_reads), "-o", str(my_out), "-t_db",
                     db50_index]) == 0
    for ext in (".res", ".fsa", ".aln"):
        assert (ref_out.parent / (ref_out.name + ext)).read_bytes() == \
            (my_out.parent / (my_out.name + ext)).read_bytes(), ext
    assert gzip.open(str(ref_out) + ".frag.gz").read() == \
        gzip.open(str(my_out) + ".frag.gz").read()


def test_nanopore_chimeric_parity(tmp_path, nano_reads, db50_index, ref_bin):
    """Chimeric long reads: chain splicing + -bcNano -bc 0.7."""
    ref_out = tmp_path / "ref"
    my_out = tmp_path / "my"
    subprocess.run([str(ref_bin), "-i", str(nano_reads), "-o", str(ref_out),
                    "-t_db", db50_index, "-bcNano", "-bc", "0.7"],
                   capture_output=True, check=True)
    assert kma_main(["-i", str(nano_reads), "-o", str(my_out), "-t_db",
                     db50_index, "-bcNano", "-bc", "0.7"]) == 0
    for ext in (".res", ".fsa", ".aln"):
        assert (ref_out.parent / (ref_out.name + ext)).read_bytes() == \
            (my_out.parent / (my_out.name + ext)).read_bytes(), ext
    assert gzip.open(str(ref_out) + ".frag.gz").read() == \
        gzip.open(str(my_out) + ".frag.gz").read()


def test_conclave2_and_memmode_parity(tmp_path, sim_reads, db50_index,
                                      ref_bin):
    for extra in (["-ConClave", "2"], ["-mem_mode"]):
        ref_out = tmp_path / ("ref" + extra[0])
        my_out = tmp_path / ("my" + extra[0])
        subprocess.run([str(ref_bin), "-i", str(sim_reads), "-o",
                        str(ref_out), "-t_db", db50_index, "-1t1"] + extra,
                       capture_output=True, check=True)
        assert kma_main(["-i", str(sim_reads), "-o", str(my_out), "-t_db",
                         db50_index, "-1t1"] + extra) == 0
        for ext in (".res", ".fsa", ".aln"):
            assert (ref_out.parent / (ref_out.name + ext)).read_bytes() == \
                (my_out.parent / (my_out.name + ext)).read_bytes(), ext
