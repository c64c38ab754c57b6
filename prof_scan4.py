"""Dispatch-overhead probe: vary inputs, pipelined vs sync timing."""
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
from kma_tpu.mapping import scan_dense as sd  # noqa: E402

idx = load_index(db_prefix)
pen = Penalties()
pen.score_matrix()
dev = sd.DenseScanner(idx, pen, batch=BATCH)

rs = list(iter_reads([reads]))
L = max(len(r.codes) for r in rs)
N = len(rs)
codes = np.full((N, L), 4, dtype=np.uint8)
lengths = np.zeros(N, np.int32)
for i in range(N):
    codes[i, : len(rs[i].codes)] = rs[i].codes
    lengths[i] = len(rs[i].codes)

# 5 distinct resident batches
devs = []
for off in range(0, N, BATCH):
    cj = codes[off: off + BATCH]
    lj = lengths[off: off + BATCH]
    both = np.concatenate([cj, sd.rc_host(cj, lj)], axis=0)
    devs.append((jax.device_put(both),
                 jax.device_put(np.concatenate([lj, lj]))))
jax.block_until_ready(devs)

f = lambda c, l: dev._call(c, l, 0, 32 * BATCH)
jax.block_until_ready(f(*devs[0]))

# sync per batch (distinct inputs)
t0 = time.time()
for c, l in devs:
    jax.block_until_ready(f(c, l))
t_sync = time.time() - t0
print(f"5 batches, sync each: {t_sync*1e3:.1f} ms "
      f"({t_sync/5*1e3:.1f} ms/batch)")

# pipelined
t0 = time.time()
futs = [f(c, l) for c, l in devs]
jax.block_until_ready(futs)
t_pipe = time.time() - t0
print(f"5 batches, pipelined: {t_pipe*1e3:.1f} ms")

# single batch sync, repeated on DIFFERENT batches
for i, (c, l) in enumerate(devs):
    t0 = time.time()
    jax.block_until_ready(f(c, l))
    print(f"batch {i}: {(time.time()-t0)*1e3:.1f} ms")

# D2H of outputs only
futs = [f(c, l) for c, l in devs]
jax.block_until_ready(futs)
t0 = time.time()
outs = jax.device_get(futs)
print(f"D2H of 5 outputs: {(time.time()-t0)*1e3:.1f} ms")
nb = sum(np.asarray(m).nbytes + np.asarray(fl).nbytes for m, fl in outs)
print(f"output bytes: {nb/1e6:.2f} MB")
