"""-proxi / -lc / preset (-ont, -ill, -asm) golden tests vs the reference.

Proximity matching keeps every template whose k-mer (or alignment) score is
within minFrac of the best; soft proxi (negative) additionally accumulates
scanner scores that replace alignment_scores in mem_mode
(runkma.c:1154-1156).  The -ont/-ill/-asm presets bundle proxi, -lc
(score-length anker selection + ConClave_lc) and base-caller settings.
"""

import gzip
import subprocess

import pytest

from kma_tpu.cli.main import main as kma_main


def _run_both(tmp_path, reads, db, ref_bin, args, exts=(".res", ".fsa",
                                                        ".aln")):
    ref_out = tmp_path / "ref"
    my_out = tmp_path / "my"
    r = subprocess.run([str(ref_bin), "-i", str(reads), "-o", str(ref_out),
                        "-t_db", db] + args, capture_output=True,
                       timeout=600)
    assert r.returncode == 0, r.stderr.decode()[-800:]
    rc = kma_main(["-i", str(reads), "-o", str(my_out), "-t_db", db] + args)
    assert rc == 0
    for ext in exts:
        a = (ref_out.parent / (ref_out.name + ext)).read_bytes()
        b = (my_out.parent / (my_out.name + ext)).read_bytes()
        assert a == b, f"{ext} differs for {args}"
    a = gzip.open(str(ref_out) + ".frag.gz").read()
    b = gzip.open(str(my_out) + ".frag.gz").read()
    assert a == b, f".frag.gz differs for {args}"


@pytest.mark.parametrize("args", [
    ["-1t1", "-proxi", "0.9"],
    ["-1t1", "-proxi", "-0.9"],
    ["-1t1", "-mem_mode", "-proxi", "-0.9"],
    ["-proxi", "0.8"],
    ["-proxi", "-0.9"],
])
def test_proxi_se_parity(tmp_path, sim_reads, db50_index, ref_bin, args):
    _run_both(tmp_path, sim_reads, db50_index, ref_bin, args)


@pytest.mark.parametrize("args", [
    ["-1t1", "-lc"],
    ["-lc"],
    ["-lc", "-proxi", "-0.9"],
])
def test_lc_parity(tmp_path, sim_reads, db50_index, ref_bin, args):
    _run_both(tmp_path, sim_reads, db50_index, ref_bin, args)


@pytest.mark.parametrize("preset", ["-ont", "-ill", "-asm"])
def test_preset_parity(tmp_path, sim_reads, db50_index, ref_bin, preset):
    _run_both(tmp_path, sim_reads, db50_index, ref_bin, [preset])


@pytest.mark.parametrize("args", [
    ["-1t1", "-proxi", "0.9"],
    ["-1t1", "-proxi", "-0.9"],
    ["-1t1", "-proxi", "-0.9", "-pm", "p"],
    ["-1t1", "-proxi", "-0.9", "-pm", "f"],
    ["-ill"],
])
def test_proxi_pe_parity(tmp_path, sim_pairs, db50_index, ref_bin, args):
    f1, f2 = sim_pairs
    ref_out = tmp_path / "ref"
    my_out = tmp_path / "my"
    r = subprocess.run([str(ref_bin), "-ipe", str(f1), str(f2), "-o",
                        str(ref_out), "-t_db", db50_index] + args,
                       capture_output=True, timeout=600)
    assert r.returncode == 0, r.stderr.decode()[-800:]
    rc = kma_main(["-ipe", str(f1), str(f2), "-o", str(my_out), "-t_db",
                   db50_index] + args)
    assert rc == 0
    for ext in (".res", ".fsa", ".aln"):
        a = (ref_out.parent / (ref_out.name + ext)).read_bytes()
        b = (my_out.parent / (my_out.name + ext)).read_bytes()
        assert a == b, f"{ext} differs for {args}"
    a = gzip.open(str(ref_out) + ".frag.gz").read()
    b = gzip.open(str(my_out) + ".frag.gz").read()
    assert a == b
