"""Sweep batch size x tier0 best_cap with the merged epilogue."""
import sys, time
from pathlib import Path
import numpy as np
sys.path.insert(0, str(Path(__file__).resolve().parent))
from bench import ensure_assets
_, db_prefix, reads = ensure_assets()
from kma_tpu.index.format import load_index
from kma_tpu.config import Penalties
from kma_tpu.io.pipeline import iter_reads
from kma_tpu.mapping import scan_dense as sd

idx = load_index(db_prefix)
pen = Penalties(); pen.score_matrix()
rs = list(iter_reads([reads]))
L = max(len(r.codes) for r in rs); N = len(rs)
codes = np.full((N, L), 4, np.uint8); lengths = np.zeros(N, np.int32)
for i in range(N):
    codes[i, :len(rs[i].codes)] = rs[i].codes; lengths[i] = len(rs[i].codes)

base = None
for B, cap in [(4096, 256), (4096, 192), (2048, 256), (6144, 256), (8192, 256), (5120, 256)]:
    sd.DenseScanner.TIERS = ((48, cap), (192, 2048))
    dev = sd.DenseScanner(idx, pen, batch=B)
    dev.scan_reads(codes[:B], lengths[:B])
    best = 0; out = None
    for _ in range(4):
        t0 = time.time()
        out = dev.scan_reads(codes, lengths)
        best = max(best, N / (time.time() - t0))
    if base is None:
        base = out
    ok = all((a is None) == (b is None) and (a is None or np.array_equal(a, b))
             for a, b in zip(base[2], out[2])) and np.array_equal(base[0], out[0])
    print(f"B={B} cap={cap}: {best:.0f} reads/s  parity={ok}  n_over={int(out[3].sum())}")
