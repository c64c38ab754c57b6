"""n_best distribution + epilogue cost vs best_cap."""
import sys, time
from pathlib import Path
import numpy as np
import jax, jax.numpy as jnp
sys.path.insert(0, str(Path(__file__).resolve().parent))
from bench import ensure_assets
_, db_prefix, reads = ensure_assets()
from kma_tpu.index.format import load_index
from kma_tpu.config import Penalties
from kma_tpu.io.pipeline import iter_reads
from kma_tpu.mapping import scan_dense as sd

BATCH = 4096
idx = load_index(db_prefix)
pen = Penalties(); pen.score_matrix()
rs = list(iter_reads([reads]))
L = max(len(r.codes) for r in rs); N = len(rs)
codes = np.full((N, L), 4, np.uint8); lengths = np.zeros(N, np.int32)
for i in range(N):
    codes[i, :len(rs[i].codes)] = rs[i].codes; lengths[i] = len(rs[i].codes)

dev = sd.DenseScanner(idx, pen, batch=BATCH)
s, m, t, o = dev.scan_reads(codes, lengths)
nb = np.array([0 if x is None else len(x) for x in t])
print("per-read emitted ids: p50 %d p90 %d p99 %d p999 %d max %d"
      % tuple(np.percentile(nb, [50, 90, 99, 99.9]).astype(int).tolist() + [nb.max()]))
# per-strand n_best can exceed emitted; try caps anyway
for cap in (32, 64, 128, 256):
    sd.DenseScanner.TIERS = ((48, cap), (192, 2048))
    dev = sd.DenseScanner(idx, pen, batch=BATCH)
    dev.scan_reads(codes[:BATCH], lengths[:BATCH])
    best = 0
    for _ in range(4):
        t0 = time.time()
        s2, m2, t2, o2 = dev.scan_reads(codes, lengths)
        best = max(best, N / (time.time() - t0))
    ok = all((a is None and b is None) or (a is not None and b is not None and np.array_equal(a, b))
             for a, b in zip(t, t2))
    print(f"cap={cap}: {best:.0f} reads/s  parity={ok}")
