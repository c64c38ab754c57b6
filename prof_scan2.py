"""Finer timing: resident-input device throughput + repeat distribution."""
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

# resident inputs
devs = []
for off in range(0, N, BATCH):
    cj = codes[off: off + BATCH]
    lj = lengths[off: off + BATCH]
    both = np.concatenate([cj, rc_host(cj, lj)], axis=0)
    packed, n_mask = pack_2bit_host(both)
    devs.append((jax.device_put(packed), jax.device_put(n_mask),
                 jax.device_put(np.concatenate([lj, lj]))))
jax.block_until_ready(devs)

# compile once with resident args
futs = [dev._call(unpack_2bit(p, m, L=L), l, 0, 32 * BATCH)
        for p, m, l in devs]
jax.block_until_ready(futs)

for rep in range(4):
    t0 = time.time()
    futs = [dev._call(unpack_2bit(p, m, L=L), l, 0, 32 * BATCH)
            for p, m, l in devs]
    jax.block_until_ready(futs)
    t = time.time() - t0
    print(f"device-only (resident, no D2H): {t*1e3:.1f} ms "
          f"({N/t:.0f} reads/s)")

for rep in range(4):
    t0 = time.time()
    futs = [dev._call(unpack_2bit(p, m, L=L), l, 0, 32 * BATCH)
            for p, m, l in devs]
    outs = jax.device_get(futs)
    t = time.time() - t0
    print(f"device + D2H: {t*1e3:.1f} ms ({N/t:.0f} reads/s)")

for rep in range(4):
    t0 = time.time()
    dev.scan_reads(codes, lengths)
    t = time.time() - t0
    print(f"full scan_reads: {t*1e3:.1f} ms ({N/t:.0f} reads/s)")
