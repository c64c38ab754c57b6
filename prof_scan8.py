"""Phase breakdown of DenseScanner.scan_reads on the bench workload."""
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
from kma_tpu.mapping.scan_dense import (DenseScanner, fuse_slim_host,
                                        unfuse_slim)
BATCH = 4096
idx = load_index(db_prefix)
pen = Penalties(); pen.score_matrix()
dev = DenseScanner(idx, pen, batch=BATCH)
rs = list(iter_reads([reads]))
L = max(len(r.codes) for r in rs); N = len(rs)
codes = np.full((N, L), 4, dtype=np.uint8)
lengths = np.zeros(N, np.int32)
for i in range(N):
    codes[i, :len(rs[i].codes)] = rs[i].codes
    lengths[i] = len(rs[i].codes)
dev.scan_reads(codes[:BATCH], lengths[:BATCH])  # warm compile

# phase 1: host prep (slim packing)
t0 = time.time()
slims = [fuse_slim_host(codes[o:o+BATCH], lengths[o:o+BATCH])
         for o in range(0, N, BATCH)]
t_prep = time.time() - t0
# phase 2: H2D + unpack dispatch
t0 = time.time()
devins = []
for s in slims:
    devins.append(unfuse_slim(jnp.asarray(s[0]), jnp.asarray(s[1]), L=L))
t_h2d_disp = time.time() - t0
# phase 3: kernel dispatch
t0 = time.time()
futs = [dev._call(c, l, 0, 32*BATCH) for c, l in devins]
t_disp = time.time() - t0
# phase 4: device compute (wait)
t0 = time.time()
jax.block_until_ready(futs)
t_compute = time.time() - t0
# phase 5: D2H
t0 = time.time()
outs = jax.device_get(futs)
t_d2h = time.time() - t0
print(f"prep {t_prep*1e3:.1f}  h2d-dispatch {t_h2d_disp*1e3:.1f}  "
      f"dispatch {t_disp*1e3:.1f}  compute-wait {t_compute*1e3:.1f}  "
      f"d2h {t_d2h*1e3:.1f} ms")
# single-batch pure device time
c, l = devins[0]
f = dev._call(c, l, 0, 32*BATCH)
jax.block_until_ready(f)
ts=[]
for _ in range(5):
    t0=time.time(); jax.block_until_ready(dev._call(c, l, 0, 32*BATCH)); ts.append(time.time()-t0)
print(f"1-batch device: min {min(ts)*1e3:.1f} med {sorted(ts)[2]*1e3:.1f} ms -> {BATCH/min(ts):.0f} reads/s")
for _ in range(3):
    t0=time.time(); dev.scan_reads(codes, lengths); print(f"scan_reads {(time.time()-t0)*1e3:.1f} ms ({N/(time.time()-t0):.0f} r/s)")
