"""Batch-size sweep of full scan_reads on the bench workload."""
import sys
import time
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parent
sys.path.insert(0, str(REPO))
from bench import ensure_assets, BATCH  # noqa: E402

have_ref, db_prefix, reads = ensure_assets()
import jax  # noqa: E402
from kma_tpu.config import Penalties  # noqa: E402
from kma_tpu.index.format import load_index  # noqa: E402
from kma_tpu.io.pipeline import iter_reads  # noqa: E402
from kma_tpu.mapping.scan_dense import DenseScanner  # noqa: E402

idx = load_index(db_prefix)
pen = Penalties()
pen.score_matrix()

rs = list(iter_reads([reads]))
L = max(len(r.codes) for r in rs)
N = len(rs)
codes = np.full((N, L), 4, dtype=np.uint8)
lengths = np.zeros(N, np.int32)
for i in range(N):
    codes[i, : len(rs[i].codes)] = rs[i].codes
    lengths[i] = len(rs[i].codes)

for B in (int(sys.argv[1]),) if len(sys.argv) > 1 else (4096, 10240, 20480):
    dev = DenseScanner(idx, pen, batch=B)
    dev.scan_reads(codes[:B], lengths[:B])  # warmup/compile
    best = 0.0
    for _ in range(4):
        t0 = time.time()
        s, m, t, o = dev.scan_reads(codes, lengths)
        dt = time.time() - t0
        best = max(best, N / dt)
        print(f"B={B}: {dt*1e3:7.1f} ms ({N/dt:7.0f} reads/s)  "
              f"overflow={int(o.sum())}")
    nt = sum(len(x) for x in t if x is not None)
    print(f"B={B} best: {best:.0f} reads/s   total tie ids {nt} "
          f"({nt/N:.1f}/read)")
