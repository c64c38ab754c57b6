"""Benchmark: step-2 mapping scan throughput on one chip.

Maps synthetic 100bp reads against the ResFinder database (the reference's
own benchmark recipe, benchmarkCMDs/benchMarkCMDs.txt) with the -1t1
scanner and measures reads/sec through the PRODUCTION device scanner
(mapping/scan_dense.DenseScanner -- the same object pipeline.py uses for
`kma ... -1t1`), compared against the reference kma binary's
single-thread `-s2` stage on this host's CPU.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}
"""

import json
import os
import subprocess
import sys
import time
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parent
REF_BUILD = REPO / ".ref_build"
TESTDATA = REPO / "testdata"
N_READS = 20000
READ_LEN = 100
BATCH = 4096


def _precompile():
    """PYTHONDONTWRITEBYTECODE is set in this environment, so imports
    re-compile the package every run (~2.5 s of wall); a one-time
    compileall gives every later python a readable __pycache__."""
    try:
        import compileall
        sys.dont_write_bytecode = False
        compileall.compile_dir(str(REPO / "kma_tpu"), quiet=2)
    except Exception:
        pass


def ensure_assets():
    _precompile()
    sys.path.insert(0, str(REPO))
    from tests.conftest import ensure_reference
    have_ref = ensure_reference()
    TESTDATA.mkdir(exist_ok=True)
    resf = REF_BUILD / "benchmarkCMDs" / "ResFinder.fasta"
    db_prefix = TESTDATA / "bench_resf"
    if not (db_prefix.with_suffix(".comp.b")).exists() and resf.exists():
        from kma_tpu.index.build import build_index
        build_index([str(resf)], str(db_prefix), quiet=True)
    reads = TESTDATA / "bench_reads.fq"
    if not reads.exists() and resf.exists():
        from kma_tpu.io.seq import parse_fasta
        rng = np.random.default_rng(7)
        recs = list(parse_fasta(str(resf)))
        comp = np.array([3, 2, 1, 0, 4, 5], dtype=np.uint8)
        with open(reads, "w") as f:
            n = 0
            while n < N_READS:
                _h, codes = recs[rng.integers(len(recs))]
                if len(codes) <= READ_LEN + 1:
                    continue
                s = int(rng.integers(0, len(codes) - READ_LEN))
                r = codes[s: s + READ_LEN].copy()
                ne = rng.binomial(READ_LEN, 0.01)
                pos = rng.integers(0, READ_LEN, ne)
                r[pos] = (r[pos] + rng.integers(1, 4, ne)) % 4
                if rng.random() < 0.5:
                    r = comp[r[::-1]]
                f.write("@r%d\n%s\n+\n%s\n"
                        % (n, "".join("ACGTN"[c] for c in r),
                           "I" * READ_LEN))
                n += 1
    return have_ref, str(db_prefix), str(reads)


def baseline_reads_per_sec(db_prefix, reads):
    """Reference kma -s2 single-thread on this host's CPU."""
    kma = REF_BUILD / "kma"
    if not kma.exists():
        return None
    t0 = time.time()
    with open(os.devnull, "wb") as devnull:
        subprocess.run([str(kma), "-i", reads, "-o", "/dev/null", "-t_db",
                        db_prefix, "-1t1", "-s2"], stdout=devnull,
                       stderr=devnull, check=True)
    dt = time.time() - t0
    return N_READS / dt


def _device_alive(timeout: int = 180) -> bool:
    """Probe jax backend init in a SUBPROCESS: with the axon tunnel dead,
    any in-process jax call hangs forever rather than failing."""
    try:
        r = subprocess.run(
            [sys.executable, "-c",
             "import jax; print(jax.default_backend())"],
            capture_output=True, timeout=timeout)
        return r.returncode == 0
    except subprocess.TimeoutExpired:
        return False


def main():
    have_ref, db_prefix, reads = ensure_assets()
    if not _device_alive():
        # emit a marker instead of hanging the round on a dead tunnel
        print("# device backend unreachable; bench skipped",
              file=sys.stderr)
        print(json.dumps({
            "metric": "mapping_scan_reads_per_sec",
            "value": 0.0,
            "unit": "reads/s/chip (100bp vs ResFinder, -1t1 step2)",
            "vs_baseline": 0.0,
            "note": "device backend unreachable (tunnel down)",
        }))
        return
    from kma_tpu.config import Penalties
    from kma_tpu.index.format import load_index
    from kma_tpu.io.pipeline import iter_reads
    from kma_tpu.mapping.scan_dense import DenseScanner

    idx = load_index(db_prefix)
    pen = Penalties()
    pen.score_matrix()
    dev = DenseScanner(idx, pen, batch=BATCH)

    rs = list(iter_reads([reads]))
    L = max(len(r.codes) for r in rs)
    N = len(rs)
    codes = np.full((N, L), 4, dtype=np.uint8)
    lengths = np.zeros(N, np.int32)
    for i in range(N):
        codes[i, : len(rs[i].codes)] = rs[i].codes
        lengths[i] = len(rs[i].codes)

    # warmup / compile both tier kernels (tier 1 via a tiny forced rescan)
    dev.scan_reads(codes[:BATCH], lengths[:BATCH])
    dummy = np.zeros(N, bool)
    dev._rescan_wide(codes, lengths, np.array([0]), np.zeros(N, np.int32),
                     np.zeros(N, np.uint8), [None] * N, dummy)

    best = 0.0
    residual = 0
    for _ in range(3):
        t0 = time.time()
        scores, modes, tid_lists, over = dev.scan_reads(codes, lengths)
        dt = time.time() - t0
        best = max(best, N / dt)
        residual = int(over.sum())
    if residual:
        print(f"# residual host-fallback reads: {residual}/{N}",
              file=sys.stderr)

    # best-of-3 for the CPU baseline too: host load jitter otherwise
    # swings vs_baseline by +-30%
    base = None
    if have_ref:
        base = max(baseline_reads_per_sec(db_prefix, reads)
                   for _ in range(3))
    vs = best / base if base else 0.0
    print(json.dumps({
        "metric": "mapping_scan_reads_per_sec",
        "value": round(best, 1),
        "unit": "reads/s/chip (100bp vs ResFinder, -1t1 step2)",
        "vs_baseline": round(vs, 4),
    }))


if __name__ == "__main__":
    main()
