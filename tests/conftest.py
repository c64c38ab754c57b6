"""Test configuration.

Forces JAX onto a virtual 8-device CPU mesh so multi-chip sharding logic is
exercised without TPU hardware.  Must run before jax import.
"""

import os
import subprocess
import sys
from pathlib import Path

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import pytest

REPO = Path(__file__).resolve().parent.parent
REF_BUILD = REPO / ".ref_build"
REF_KMA = REF_BUILD / "kma"
REF_KMA_INDEX = REF_BUILD / "kma_index"
RESFINDER = REF_BUILD / "benchmarkCMDs" / "ResFinder.fasta"


def ensure_reference() -> bool:
    """Build the reference binary (golden-test oracle) if not present."""
    if REF_KMA.exists():
        return True
    ref_src = Path("/root/reference")
    if not ref_src.exists():
        return False
    REF_BUILD.mkdir(exist_ok=True)
    for f in ref_src.glob("*.[ch]"):
        (REF_BUILD / f.name).write_bytes(f.read_bytes())
    (REF_BUILD / "Makefile").write_bytes((ref_src / "Makefile").read_bytes())
    subprocess.run(["make", "-j8"], cwd=REF_BUILD, check=True,
                   capture_output=True)
    subprocess.run(["tar", "xzf", str(ref_src / "performanceAndComparisonCMDs.tar.gz")],
                   cwd=REF_BUILD, check=True)
    return REF_KMA.exists()


@pytest.fixture(scope="session")
def ref_bin():
    if not ensure_reference():
        pytest.skip("reference binary not available")
    return REF_KMA


@pytest.fixture(scope="session")
def ref_index_bin(ref_bin):
    return REF_KMA_INDEX


@pytest.fixture(scope="session")
def resfinder(ref_bin):
    return RESFINDER


@pytest.fixture(scope="session")
def db50(tmp_path_factory, resfinder):
    """First 50 ResFinder templates as a small test fasta."""
    out = tmp_path_factory.mktemp("db") / "db50.fsa"
    recs = 0
    lines = []
    for line in resfinder.read_text().splitlines(keepends=True):
        if line.startswith(">"):
            recs += 1
            if recs > 50:
                break
        lines.append(line)
    out.write_text("".join(lines))
    return out


def run_ref(args, **kw):
    """Run the reference kma binary."""
    return subprocess.run([str(REF_KMA)] + args, capture_output=True, **kw)
