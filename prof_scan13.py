"""Is D2H of (meta, flat) the remaining wall? Fetch-nothing vs fetch-all."""
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
dev = sd.DenseScanner(idx, pen, batch=BATCH)
rs = list(iter_reads([reads]))
L = max(len(r.codes) for r in rs); N = len(rs)
codes = np.full((N, L), 4, np.uint8); lengths = np.zeros(N, np.int32)
for i in range(N):
    codes[i, :len(rs[i].codes)] = rs[i].codes; lengths[i] = len(rs[i].codes)
dev.scan_reads(codes, lengths)  # warm all shapes

def run(fetch):
    futs = []
    for off in range(0, N, BATCH):
        cj = codes[off:off+BATCH]; lj = lengths[off:off+BATCH]
        slim = sd.fuse_slim_host(cj, lj)
        cj_d, lj_d = sd.unfuse_slim(jnp.asarray(slim[0]), jnp.asarray(slim[1]), L=L)
        futs.append(dev._call(cj_d, lj_d, 0, 24*BATCH))
    if fetch == "all":
        return jax.device_get(futs)
    if fetch == "meta":
        return jax.device_get([m for m, f in futs])
    if fetch == "scalar":
        return jax.device_get([jnp.sum(m) + jnp.sum(f.astype(jnp.int32)) for m, f in futs])

for mode in ["scalar", "meta", "all"]:
    run(mode)
    ts = []
    for _ in range(3):
        t0 = time.time(); run(mode); ts.append(time.time()-t0)
    print(f"fetch={mode}: min {min(ts)*1e3:.1f} ms")
