"""Phase breakdown of DenseScanner.scan_reads on the bench workload."""
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
from kma_tpu.mapping.scan_dense import (DenseScanner, pack_2bit_host,
                                        rc_host, unpack_2bit)  # noqa: E402

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

dev.scan_reads(codes[:BATCH], lengths[:BATCH])  # warmup

# full pass timing
for _ in range(2):
    t0 = time.time()
    scores, modes, tid_lists, over = dev.scan_reads(codes, lengths)
    t_all = time.time() - t0
    print(f"scan_reads total: {t_all*1e3:.1f} ms  ({N/t_all:.0f} reads/s)")

# phase 1: host prep (rc + pack) per batch
t0 = time.time()
preps = []
for off in range(0, N, BATCH):
    cj = codes[off: off + BATCH]
    lj = lengths[off: off + BATCH]
    both = np.concatenate([cj, rc_host(cj, lj)], axis=0)
    packed, n_mask = pack_2bit_host(both)
    preps.append((packed, n_mask, np.concatenate([lj, lj])))
t_prep = time.time() - t0
print(f"host prep (rc+pack): {t_prep*1e3:.1f} ms")

# phase 2: H2D transfer only
t0 = time.time()
devs = []
for packed, n_mask, lj2 in preps:
    devs.append((jax.device_put(packed), jax.device_put(n_mask),
                 jax.device_put(lj2)))
jax.block_until_ready(devs)
t_h2d = time.time() - t0
print(f"H2D: {t_h2d*1e3:.1f} ms")

# phase 3: device compute (unpack + scan), inputs already resident
t0 = time.time()
futs = []
for packed, n_mask, lj2 in devs:
    cj_dev = unpack_2bit(packed, n_mask, L=L)
    futs.append(dev._call(cj_dev, lj2, 0, 32 * BATCH))
jax.block_until_ready(futs)
t_dev = time.time() - t0
print(f"device compute: {t_dev*1e3:.1f} ms")

# phase 4: D2H
t0 = time.time()
outs = jax.device_get(futs)
t_d2h = time.time() - t0
print(f"D2H: {t_d2h*1e3:.1f} ms")

# phase 5: host epilogue (unpack tid lists)
t0 = time.time()
for bi, (meta, flat) in enumerate(outs):
    off = bi * BATCH
    n = min(BATCH, N - off)
    meta = np.asarray(meta)[:n]
    flat = np.asarray(flat, dtype=np.int32)
    packedm = meta[:, 1]
    n_out = packedm >> 3
    offs = np.cumsum(n_out) - n_out
    for i in range(n):
        if packedm[i] & 3:
            _ = flat[offs[i]: offs[i] + n_out[i]]
t_ep = time.time() - t0
print(f"host epilogue: {t_ep*1e3:.1f} ms")
print(f"sum: {(t_prep+t_h2d+t_dev+t_d2h+t_ep)*1e3:.1f} ms")
