"""Chain-scan parity on N-containing reads.

The reference's rc chain scan resets its window offset to seqlen - j
after every N crossing (savekmers.c:5443) instead of the symmetric
seqlen - k - j, so later rc windows read k-1 positions past their
nominal span — through N positions stored as their complement 'T'
(rc_comp, compdna.c:229-251) and the zero padding past the sequence end.
The quirk is observable in -mem_mode chain scores; these tests pin the
reproduction (native collect_ankers_ref and the Python _collect_ankers).
"""

import gzip
import subprocess
import sys

import numpy as np
import pytest

from tests.conftest import REF_KMA
from kma_tpu.io.seq import parse_fasta

from tests.test_mt1 import db50_index_mod, sim_reads_mod  # noqa: F401
from tests.conftest import db50, resfinder, ref_index_bin  # noqa: F401

pytestmark = pytest.mark.skipif(not REF_KMA.exists(),
                                reason="reference binary unavailable")


@pytest.fixture(scope="module")
def n_reads(tmp_path_factory, db50):  # noqa: F811
    """Chimeric reads with indel errors and injected Ns — the shapes that
    exercise the rc-scan N quirk."""
    rng = np.random.default_rng(17)
    recs = [r for r in parse_fasta(str(db50)) if len(r[1]) > 400]
    comp = np.array([3, 2, 1, 0, 4, 5], dtype=np.uint8)
    out = tmp_path_factory.mktemp("nreads") / "reads.fq"
    with open(out, "w") as f:
        for ri in range(120):
            parts = []
            for _ in range(int(rng.integers(1, 4))):
                _h, codes = recs[rng.integers(len(recs))]
                hi = min(500, len(codes))
                L = int(rng.integers(150, hi)) if hi > 150 else hi
                s = int(rng.integers(0, len(codes) - L + 1))
                frag = codes[s:s + L].copy()
                if rng.random() < 0.5:
                    frag = comp[frag[::-1]]
                parts.append(frag)
            r = np.concatenate(parts)
            outb = []
            for c in r:
                x = rng.random()
                if x < 0.02:
                    outb.append(int(rng.integers(0, 4)))
                elif x < 0.035:
                    outb.append(int(c))
                    outb.append(int(rng.integers(0, 4)))
                elif x < 0.05:
                    pass
                else:
                    outb.append(int(c))
            for _ in range(int(rng.integers(1, 4))):
                outb[int(rng.integers(0, len(outb)))] = 4
            # leading/trailing N edge cases every few reads
            if ri % 7 == 0:
                outb.insert(0, 4)
            if ri % 11 == 0:
                outb.append(4)
            seq = "".join("ACGTN"[c] for c in outb)
            f.write(f"@n{ri}\n{seq}\n+\n{'I' * len(seq)}\n")
    return out


def _frag_raw(path):
    return sorted(tuple(l.rstrip("\n").split("\t"))
                  for l in gzip.open(path, "rt"))


@pytest.mark.parametrize("native", ["native", "python"])
def test_mem_mode_n_reads_parity(tmp_path, n_reads, db50_index_mod,
                                 native):  # noqa: F811
    """-mem_mode -a spool records byte-match the reference on N reads
    (the chain score IS the spool score there, exposing the quirk)."""
    ref_out = tmp_path / "ref"
    subprocess.run([str(REF_KMA), "-i", str(n_reads), "-t_db",
                    db50_index_mod, "-o", str(ref_out), "-mem_mode", "-a",
                    "-t", "1"], check=True, capture_output=True)
    my_out = tmp_path / ("my_" + native)
    import os
    env = dict(os.environ)
    env["KMA_TPU_NO_FUSED"] = "1"
    if native == "python":
        env["KMA_TPU_NO_NATIVE"] = "1"
    subprocess.run([sys.executable, "-m", "kma_tpu", "-i", str(n_reads),
                    "-t_db", db50_index_mod, "-o", str(my_out),
                    "-mem_mode", "-a", "-t", "1", "-device", "off"],
                   check=True, capture_output=True, env=env)
    assert _frag_raw(f"{ref_out}.frag_raw.gz") \
        == _frag_raw(f"{my_out}.frag_raw.gz")
    assert (ref_out.parent / "ref.res").read_bytes() \
        == (my_out.parent / f"my_{native}.res").read_bytes()


def test_mem_mode_n_reads_fused(tmp_path, n_reads, db50_index_mod):  # noqa: F811
    """The fused driver path reproduces the same quirk."""
    ref_out = tmp_path / "ref"
    subprocess.run([str(REF_KMA), "-i", str(n_reads), "-t_db",
                    db50_index_mod, "-o", str(ref_out), "-t", "1"],
                   check=True, capture_output=True)
    my_out = tmp_path / "my"
    subprocess.run([sys.executable, "-m", "kma_tpu", "-i", str(n_reads),
                    "-t_db", db50_index_mod, "-o", str(my_out), "-t", "1",
                    "-device", "off"],
                   check=True, capture_output=True)
    assert (ref_out.parent / "ref.res").read_bytes() \
        == (my_out.parent / "my.res").read_bytes()
    assert gzip.open(f"{ref_out}.frag.gz").read() \
        == gzip.open(f"{my_out}.frag.gz").read()
