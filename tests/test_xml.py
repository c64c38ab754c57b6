"""-xml parity (xml.c): BLAST-ish output incl. the reference's reused
Aln-buffer printing semantics.

Normalised before comparison (reference undefined behaviour):
- BlastOutput_query-ID embeds time(NULL)
- Parameters_cmd embeds the binary path
- Hsp_bit-score prints an UNINITIALISED struct field (xml.c:210; Aln.score
  is never assigned anywhere in the reference)
- Hsp_qseq/Hsp_hseq run into malloc garbage for the very first hit (the
  buffers are smalloc'd; later hits' leftovers are deterministic buffer
  reuse and ARE compared exactly via Hsp_midline, which the reference
  NUL-terminates per alignment, align.c:502)
"""

import re
import subprocess

import pytest

from kma_tpu.cli.main import main as kma_main


def norm(x: bytes) -> bytes:
    x = re.sub(rb"<BlastOutput_query-ID>kma-.*?</BlastOutput_query-ID>",
               b"<ID>", x)
    x = re.sub(rb"<Parameters_cmd>.*?</Parameters_cmd>", b"<CMD>", x)
    x = re.sub(rb"<Hsp_bit-score>-?\d+</Hsp_bit-score>", b"<BS>", x)
    out = []
    aln = 0
    for line in x.split(b"\n"):
        m = re.search(rb"<Hsp_align-len>(\d+)</Hsp_align-len>", line)
        if m:
            aln = int(m.group(1))
        m = re.match(rb"(\t*<Hsp_([qh])seq>)(.*)</Hsp_\2seq>", line)
        if m:
            line = m.group(1) + m.group(3)[:aln] + b"</X>"
        out.append(line)
    return b"\n".join(out)


@pytest.mark.parametrize("margs", [["-1t1"], [], ["-mem_mode"],
                                   ["-Mt1", "14"]])
def test_xml_parity(tmp_path, sim_reads_mod, db50_index_mod, ref_bin, margs):
    ref_out = tmp_path / "ref"
    my_out = tmp_path / "my"
    r = subprocess.run([str(ref_bin), "-i", str(sim_reads_mod), "-o",
                        str(ref_out), "-t_db", db50_index_mod, "-xml"]
                       + margs, capture_output=True)
    assert r.returncode == 0, r.stderr
    rc = kma_main(["-i", str(sim_reads_mod), "-o", str(my_out), "-t_db",
                   db50_index_mod, "-xml"] + margs)
    assert rc == 0
    a = norm((ref_out.parent / "ref.xml").read_bytes())
    b = norm((my_out.parent / "my.xml").read_bytes())
    assert a == b


# reuse the fixtures from test_mt1
from tests.test_mt1 import db50_index_mod, sim_reads_mod  # noqa: E402,F401
