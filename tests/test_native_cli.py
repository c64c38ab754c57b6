"""Native CLI driver parity net: native/kma_cli (the C++ host-path CLI
bin/kma execs first) must produce byte-identical artifacts to the Python
CLI on the configurations it covers, and exit 113 (fall back) on
everything else."""

import gzip
import os
import subprocess
import sys

import pytest

from tests.conftest import db50, db50_index, resfinder, ref_index_bin  # noqa
from tests.test_mt1 import sim_reads_mod  # noqa: F401

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
CLI = os.path.join(REPO, "native", "kma_cli")


def _ensure_cli():
    from kma_tpu.run_native import get_lib
    get_lib()   # builds libkma_run.so AND the kma_cli binary
    return os.path.exists(CLI)


def _env():
    env = dict(os.environ)
    env.pop("PALLAS_AXON_POOL_IPS", None)
    env["JAX_PLATFORMS"] = "cpu"
    return env


def _run_native(args, out):
    r = subprocess.run([CLI] + args + ["-o", out, "-t", "1", "-device",
                                       "off"],
                       capture_output=True, env=_env())
    return r.returncode


def _run_python(args, out):
    r = subprocess.run([sys.executable, "-m", "kma_tpu"] + args
                       + ["-o", out, "-t", "1", "-device", "off"],
                       capture_output=True, env=_env())
    assert r.returncode == 0, r.stderr.decode()[-2000:]


@pytest.mark.parametrize("margs", [
    ["-1t1"], [], ["-bcNano", "-bc", "0.7"], ["-mrs", "0.6"],
    ["-mem_mode"],
    ["-1t1", "-matrix", "-vcf", "-ef"], ["-vcf", "2"],
    ["-bcNano", "-bc", "0.7", "-matrix", "-vcf", "-ef"],
])
def test_native_cli_matches_python(tmp_path, sim_reads_mod, db50_index,
                                   margs):  # noqa: F811
    if not _ensure_cli():
        pytest.skip("native CLI unavailable")
    a = str(tmp_path / "nat")
    b = str(tmp_path / "py")
    base = ["-i", str(sim_reads_mod), "-t_db", db50_index] + margs
    rc = _run_native(base, a)
    assert rc == 0
    _run_python(base, b)
    for ext in (".res", ".fsa", ".aln"):
        assert (tmp_path / ("nat" + ext)).read_bytes() \
            == (tmp_path / ("py" + ext)).read_bytes(), ext
    gz_exts = [".frag.gz"]
    if "-matrix" in margs:
        gz_exts.append(".mat.gz")
    if "-vcf" in margs:
        gz_exts.append(".vcf.gz")
    for ext in gz_exts:
        with gzip.open(a + ext) as f1, gzip.open(b + ext) as f2:
            assert f1.read() == f2.read(), ext
    if "-ef" in margs:
        # mask the command echo + date lines (ef.c:30-46 metadata)
        def body(p):
            return [ln for ln in open(p, "rb").read().splitlines()
                    if not ln.startswith((b"## command", b"## date"))]
        assert body(a + ".mapstat") == body(b + ".mapstat")


@pytest.mark.parametrize("margs", [
    ["-Sparse"],
    ["-mf", "7"], ["-ID", "0"],
])
def test_native_cli_falls_back(tmp_path, sim_reads_mod, db50_index,
                               margs):  # noqa: F811
    if not _ensure_cli():
        pytest.skip("native CLI unavailable")
    rc = _run_native(["-i", str(sim_reads_mod), "-t_db", db50_index]
                     + margs, str(tmp_path / "x"))
    assert rc == 113


@pytest.mark.parametrize("margs", [
    ["-1t1", "-sam"], ["-sam"], ["-1t1", "-sam", "4"],
    ["-hmm", "-sam"],
])
def test_native_cli_sam_parity(tmp_path, sim_reads_mod, db50_index,
                               margs):  # noqa: F811
    """Native -sam: stdout rows byte-identical to the Python CLI
    (samwrite, sam.c:114-211) modulo the @PG command echo."""
    if not _ensure_cli():
        pytest.skip("native CLI unavailable")
    base = ["-i", str(sim_reads_mod), "-t_db", db50_index] + margs
    rn = subprocess.run([CLI] + base + ["-o", str(tmp_path / "nat"),
                                        "-t", "1", "-device", "off"],
                        capture_output=True, env=_env())
    assert rn.returncode == 0
    rp = subprocess.run([sys.executable, "-m", "kma_tpu"] + base
                        + ["-o", str(tmp_path / "py"), "-t", "1",
                           "-device", "off"],
                        capture_output=True, env=_env())
    assert rp.returncode == 0, rp.stderr.decode()[-2000:]

    def rows(buf):
        return [ln for ln in buf.decode().splitlines()
                if not ln.startswith("@PG")]

    assert rows(rn.stdout) == rows(rp.stdout)
    for ext in (".res", ".fsa", ".aln"):
        assert (tmp_path / ("nat" + ext)).read_bytes() \
            == (tmp_path / ("py" + ext)).read_bytes(), ext
