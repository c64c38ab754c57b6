"""-qc JSON report parity (qc.c, runinput.c QC hooks)."""

import subprocess

import numpy as np
import pytest

from kma_tpu.cli.main import main as kma_main
from kma_tpu.io.seq import parse_fasta


@pytest.fixture(scope="module")
def vq_reads(tmp_path_factory, db50):
    """Reads with variable qualities (exercises trimming + Q binning)."""
    rng = np.random.default_rng(5)
    recs = list(parse_fasta(str(db50)))
    comp = np.array([3, 2, 1, 0, 4, 5], dtype=np.uint8)
    out = tmp_path_factory.mktemp("vq") / "reads.fq"
    with open(out, "w") as f:
        for ri in range(400):
            _h, codes = recs[rng.integers(len(recs))]
            L = int(rng.integers(60, 220))
            if len(codes) <= L:
                continue
            s = int(rng.integers(0, len(codes) - L))
            r = codes[s: s + L].copy()
            if rng.random() < 0.5:
                r = comp[r[::-1]]
            # quality profile: good middle, noisy ends, random dips
            q = np.full(L, 38, np.int64)
            q[: int(rng.integers(0, 12))] = rng.integers(2, 20)
            tail = int(rng.integers(0, 15))
            if tail:
                q[-tail:] = rng.integers(2, 20)
            dips = rng.integers(0, L, rng.integers(0, 8))
            q[dips] = rng.integers(2, 35)
            seq = "".join("ACGTN"[c] for c in r)
            qual = "".join(chr(33 + int(x)) for x in q)
            f.write(f"@v{ri}\n{seq}\n+\n{qual}\n")
    return out


@pytest.mark.parametrize("extra", [[], ["-mi", "25"], ["-eq", "30"],
                                   ["-mp", "30"]])
def test_qc_json_parity(tmp_path, vq_reads, db50_index_mod, ref_bin, extra):
    ref_out = tmp_path / "ref"
    my_out = tmp_path / "my"
    r = subprocess.run([str(ref_bin), "-i", str(vq_reads), "-o",
                        str(ref_out), "-t_db", db50_index_mod, "-qc"]
                       + extra, capture_output=True)
    assert r.returncode == 0, r.stderr
    rc = kma_main(["-i", str(vq_reads), "-o", str(my_out), "-t_db",
                   db50_index_mod, "-qc"] + extra)
    assert rc == 0
    a = (ref_out.parent / "ref.json").read_bytes()
    b = (my_out.parent / "my.json").read_bytes()
    assert a == b


def test_qc_json_pe(tmp_path, vq_reads, db50_index_mod, ref_bin):
    """PE counts fragments per pair but sequences per mate."""
    ref_out = tmp_path / "ref"
    my_out = tmp_path / "my"
    r = subprocess.run([str(ref_bin), "-ipe", str(vq_reads), str(vq_reads),
                        "-o", str(ref_out), "-t_db", db50_index_mod, "-qc"],
                       capture_output=True)
    assert r.returncode == 0, r.stderr
    rc = kma_main(["-ipe", str(vq_reads), str(vq_reads), "-o", str(my_out),
                   "-t_db", db50_index_mod, "-qc"])
    assert rc == 0
    a = (ref_out.parent / "ref.json").read_bytes()
    b = (my_out.parent / "my.json").read_bytes()
    assert a == b


from tests.test_mt1 import db50_index_mod  # noqa: E402,F401
