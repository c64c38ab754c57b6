"""Flag/preset parity: -int, penalties, -cge/-mint2/-mint3, -dense."""

import gzip
import subprocess
from pathlib import Path

import pytest

from kma_tpu.cli.main import main as kma_main

from tests.test_mt1 import db50_index_mod, sim_reads_mod  # noqa: F401
from tests.test_mt1 import mt1_pairs  # noqa: F401


def _cmp(tmp_path, ref_bin, db, inargs, extra):
    ref_out = tmp_path / "ref"
    my_out = tmp_path / "my"
    r = subprocess.run([str(ref_bin)] + inargs + ["-o", str(ref_out),
                       "-t_db", db] + extra, capture_output=True)
    assert r.returncode == 0, r.stderr
    rc = kma_main(inargs + ["-o", str(my_out), "-t_db", db] + extra)
    assert rc == 0
    for ext in (".res", ".fsa", ".aln"):
        a = (ref_out.parent / (ref_out.name + ext)).read_bytes()
        b = (my_out.parent / (my_out.name + ext)).read_bytes()
        assert a == b, f"{ext} differs"
    a = gzip.open(str(ref_out) + ".frag.gz").read()
    b = gzip.open(str(my_out) + ".frag.gz").read()
    assert a == b
    for ext in (".vcf.gz", ".mat.gz"):
        pa = Path(str(ref_out) + ext)
        pb = Path(str(my_out) + ext)
        assert pa.exists() == pb.exists()
        if pa.exists():
            assert gzip.open(pa).read() == gzip.open(pb).read(), ext


@pytest.mark.parametrize("mode", [[], ["-1t1"], ["-mem_mode"]])
def test_interleaved_parity(tmp_path, mt1_pairs, db50_index_mod, ref_bin,
                            mode):
    f1, f2 = mt1_pairs
    l1 = f1.read_text().splitlines()
    l2 = f2.read_text().splitlines()
    intf = tmp_path / "int.fq"
    with open(intf, "w") as f:
        for i in range(0, len(l1), 4):
            f.write("\n".join(l1[i: i + 4]) + "\n")
            f.write("\n".join(l2[i: i + 4]) + "\n")
    _cmp(tmp_path, ref_bin, db50_index_mod, ["-int", str(intf)], mode)


@pytest.mark.parametrize("extra", [
    ["-cge"],
    ["-dense"],
    ["-mint2"],
    ["-mint3"],
    ["-reward", "2", "-penalty", "4", "-gapopen", "4"],
    ["-transition", "3", "-transversion", "1"],
    ["-per", "12"],
])
def test_penalty_preset_parity(tmp_path, sim_reads_mod, db50_index_mod,
                               ref_bin, extra):
    _cmp(tmp_path, ref_bin, db50_index_mod,
         ["-i", str(sim_reads_mod)], extra)
