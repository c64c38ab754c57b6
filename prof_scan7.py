"""Host-side cost breakdown of the new scan_reads path."""
import sys
import time
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parent
sys.path.insert(0, str(REPO))
from bench import ensure_assets, BATCH  # noqa: E402

have_ref, db_prefix, reads = ensure_assets()
import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
from kma_tpu.config import Penalties  # noqa: E402
from kma_tpu.index.format import load_index  # noqa: E402
from kma_tpu.io.pipeline import iter_reads  # noqa: E402
from kma_tpu.mapping.scan_dense import (DenseScanner, fuse_h2d_host,
                                        unfuse_h2d)  # noqa: E402

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

dev.scan_reads(codes[:BATCH], lengths[:BATCH])

# host prep cost
t0 = time.time()
bufs = [fuse_h2d_host(codes[o:o + BATCH], lengths[o:o + BATCH])
        for o in range(0, N, BATCH)]
print(f"fuse_h2d_host x5: {(time.time()-t0)*1e3:.1f} ms")

# H2D alone (fused)
t0 = time.time()
dv = [jax.device_put(b) for b in bufs]
jax.block_until_ready(dv)
print(f"H2D fused x5: {(time.time()-t0)*1e3:.1f} ms "
      f"({sum(b.nbytes for b in bufs)/1e6:.2f} MB)")

# epilogue loop cost
s, m, t, o = dev.scan_reads(codes, lengths)
futs = []
for o2 in range(0, N, BATCH):
    cj_dev, lj_dev = unfuse_h2d(jnp.asarray(bufs[o2 // BATCH]), L=L)
    futs.append(dev._call(cj_dev, lj_dev, 0, 32 * BATCH))
outs = jax.device_get(futs)
t0 = time.time()
tid_lists = [None] * N
for bi, (meta, flat) in enumerate(outs):
    off = bi * BATCH
    n = min(BATCH, N - off)
    meta = np.asarray(meta)[:n]
    flat = np.asarray(flat, dtype=np.int32)
    packedm = meta[:, 1]
    mode = packedm & 3
    n_out = packedm >> 3
    offs = np.cumsum(n_out) - n_out
    for i in range(n):
        if mode[i]:
            tid_lists[off + i] = flat[offs[i]: offs[i] + n_out[i]]
print(f"epilogue loop: {(time.time()-t0)*1e3:.1f} ms")

# end-to-end again for reference
for _ in range(3):
    t0 = time.time()
    dev.scan_reads(codes, lengths)
    dt = time.time() - t0
    print(f"scan_reads: {dt*1e3:.1f} ms ({N/dt:.0f} reads/s)")
