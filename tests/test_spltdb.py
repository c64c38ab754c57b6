"""spltDB (multiple -t_db) golden tests vs the reference map/reduce flow.

The reference runs one ``-s2`` mapper per shard DB writing an anker stream
to ``<out>.<n>``, then a reducer (kma with several -t_db values) that merges
the streams (spltdb.c:401-1293).  Our implementation is in-process; these
tests run the reference's own two-stage workflow to produce the golden
outputs.
"""

import gzip
import re
import subprocess

import numpy as np
import pytest

from kma_tpu.cli.main import main as kma_main
from kma_tpu.io.seq import parse_fasta

COMP = np.array([3, 2, 1, 0, 4, 5], dtype=np.uint8)


def _split_fasta(resfinder, out_path, lo, hi):
    recs = 0
    lines = []
    for line in resfinder.read_text().splitlines(keepends=True):
        if line.startswith(">"):
            recs += 1
        if lo < recs <= hi:
            lines.append(line)
        if recs > hi:
            break
    out_path.write_text("".join(lines))
    return out_path


@pytest.fixture(scope="module")
def splt_dbs(tmp_path_factory, resfinder, ref_index_bin):
    """Two shard DBs: templates 1-30 and 21-50 (ids 21-30 shared, so reads
    from them tie across shards and exercise the union merge)."""
    d = tmp_path_factory.mktemp("splt_db")
    fa = _split_fasta(resfinder, d / "a.fsa", 0, 30)
    fb = _split_fasta(resfinder, d / "b.fsa", 20, 50)
    pa, pb = str(d / "dbA"), str(d / "dbB")
    for fasta, prefix in ((fa, pa), (fb, pb)):
        subprocess.run([str(ref_index_bin), "-i", str(fasta), "-o", prefix],
                       check=True, capture_output=True)
    return pa, pb


@pytest.fixture(scope="module")
def splt_reads(tmp_path_factory, resfinder):
    """Reads over templates 1-50: A-only, B-only and shared sources."""
    rng = np.random.default_rng(7)
    recs = []
    for i, (h, codes) in enumerate(parse_fasta(str(resfinder))):
        if i >= 50:
            break
        recs.append(codes)
    out = tmp_path_factory.mktemp("splt_reads") / "reads.fq"
    with open(out, "w") as f:
        for ri in range(400):
            codes = recs[rng.integers(len(recs))]
            L = int(rng.integers(80, 150))
            if len(codes) <= L:
                continue
            s = int(rng.integers(0, len(codes) - L))
            r = codes[s: s + L].copy()
            nerr = rng.binomial(L, 0.01)
            ppos = rng.integers(0, L, nerr)
            r[ppos] = (r[ppos] + rng.integers(1, 4, nerr)) % 4
            if rng.random() < 0.5:
                r = COMP[r[::-1]]
            seq = "".join("ACGTN"[c] for c in r)
            f.write(f"@r{ri}\n{seq}\n+\n{'I' * len(seq)}\n")
    return out


def run_ref_spltdb(ref_bin, reads_args, dbs, out, extra=()):
    """Reference two-stage flow: per-shard -s2 mappers, then the reducer."""
    for n, db in enumerate(dbs):
        with open(f"{out}.{n}", "wb") as stream:
            r = subprocess.run(
                [str(ref_bin)] + reads_args + ["-spltDB", "-o", str(out),
                                               "-t_db", db, "-s2"]
                + list(extra), stdout=stream, stderr=subprocess.DEVNULL)
            assert r.returncode == 0
    r = subprocess.run(
        [str(ref_bin)] + reads_args + ["-o", str(out), "-t_db"] + list(dbs)
        + list(extra), capture_output=True, timeout=300)
    assert r.returncode == 0


def _cmp(ref_out, my_out, exts=(".res", ".fsa", ".aln")):
    for ext in exts:
        a = (ref_out.parent / (ref_out.name + ext)).read_bytes()
        b = (my_out.parent / (my_out.name + ext)).read_bytes()
        assert a == b, f"{ext} differs"
    a = gzip.open(str(ref_out) + ".frag.gz").read()
    b = gzip.open(str(my_out) + ".frag.gz").read()
    assert a == b, ".frag.gz content differs"


def test_spltdb_se_parity(tmp_path, splt_reads, splt_dbs, ref_bin):
    ref_out = tmp_path / "ref"
    my_out = tmp_path / "my"
    run_ref_spltdb(ref_bin, ["-i", str(splt_reads)], splt_dbs, ref_out)
    rc = kma_main(["-i", str(splt_reads), "-o", str(my_out), "-t_db",
                   splt_dbs[0], splt_dbs[1]])
    assert rc == 0
    _cmp(ref_out, my_out)


def test_spltdb_ef_vcf_parity(tmp_path, splt_reads, splt_dbs, ref_bin):
    """mapstat (databases list + trailing fragmentCount) and vcf headers."""
    ref_out = tmp_path / "ref"
    my_out = tmp_path / "my"
    run_ref_spltdb(ref_bin, ["-i", str(splt_reads)], splt_dbs, ref_out,
                   extra=["-ef", "-vcf"])
    rc = kma_main(["-i", str(splt_reads), "-o", str(my_out), "-t_db",
                   splt_dbs[0], splt_dbs[1], "-ef", "-vcf"])
    assert rc == 0
    _cmp(ref_out, my_out)

    def norm_mapstat(p):
        txt = (p.parent / (p.name + ".mapstat")).read_text()
        return re.sub(r"## (date|command)\t.*", r"## \1\t-", txt)

    assert norm_mapstat(ref_out) == norm_mapstat(my_out)
    a = gzip.open(str(ref_out) + ".vcf.gz").read()
    b = gzip.open(str(my_out) + ".vcf.gz").read()
    assert a == b, ".vcf.gz differs"


@pytest.fixture(scope="module")
def splt_pairs(tmp_path_factory, resfinder):
    rng = np.random.default_rng(13)
    recs = []
    for i, (h, codes) in enumerate(parse_fasta(str(resfinder))):
        if i >= 50:
            break
        recs.append(codes)
    d = tmp_path_factory.mktemp("splt_pe")
    f1p, f2p = d / "pe_1.fq", d / "pe_2.fq"
    with open(f1p, "w") as f1, open(f2p, "w") as f2:
        n = 0
        while n < 250:
            codes = recs[rng.integers(len(recs))]
            ins, L = 205, 100
            if len(codes) <= ins + 2:
                continue
            s = int(rng.integers(0, len(codes) - ins))
            frag = codes[s: s + ins]
            r1 = frag[:L].copy()
            r2 = COMP[frag[-L:][::-1]].copy()
            for r in (r1, r2):
                ne = rng.binomial(L, 0.01)
                pos = rng.integers(0, L, ne)
                r[pos] = (r[pos] + rng.integers(1, 4, ne)) % 4
            if rng.random() < 0.5:
                r1, r2 = COMP[r2[::-1]].copy(), COMP[r1[::-1]].copy()
            f1.write(f"@p{n}/1\n{''.join('ACGTN'[c] for c in r1)}\n"
                     f"+\n{'I' * L}\n")
            f2.write(f"@p{n}/2\n{''.join('ACGTN'[c] for c in r2)}\n"
                     f"+\n{'I' * L}\n")
            n += 1
    return f1p, f2p


def test_spltdb_pe_parity(tmp_path, splt_pairs, splt_dbs, ref_bin):
    """PE merge: printPair double-records, PE total = targetScore + 1."""
    f1, f2 = splt_pairs
    ref_out = tmp_path / "ref"
    my_out = tmp_path / "my"
    run_ref_spltdb(ref_bin, ["-ipe", str(f1), str(f2)], splt_dbs, ref_out)
    rc = kma_main(["-ipe", str(f1), str(f2), "-o", str(my_out), "-t_db",
                   splt_dbs[0], splt_dbs[1]])
    assert rc == 0
    _cmp(ref_out, my_out)


def test_spltdb_command_print(tmp_path, splt_dbs, capsys):
    """-spltDB with several DBs prints map + reduce commands and exits."""
    rc = kma_main(["-i", "reads.fq", "-spltDB", "-o", str(tmp_path / "o"),
                   "-t_db", splt_dbs[0], splt_dbs[1]])
    assert rc == 0
    out = capsys.readouterr().out
    assert f"-t_db {splt_dbs[0]}" in out
    assert f"-t_db {splt_dbs[1]}" in out
    assert "# Map" not in out  # map header goes to stderr
