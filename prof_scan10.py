"""Bisect the front-end cost of the dense scan (forced via scalar fetch)."""
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
from kma_tpu.mapping.scan_jax import ScanParams, _segment_starts, _run_transition_score
from kma_tpu.mapping.device_index import batch_kmers, valid_windows, murmur32, MURMUR_SEED2

BATCH = 4096
idx = load_index(db_prefix)
pen = Penalties(); pen.score_matrix()
dev = sd.DenseScanner(idx, pen, batch=BATCH)
d = dev.didx
rs = list(iter_reads([reads]))
L = max(len(r.codes) for r in rs); N = len(rs)
codes = np.full((N, L), 4, np.uint8); lengths = np.zeros(N, np.int32)
for i in range(N):
    codes[i, :len(rs[i].codes)] = rs[i].codes; lengths[i] = len(rs[i].codes)
p = ScanParams(*dev._sparams(L, 0))
k = p.k

def mk(stage):
    def f(codes, lengths, exist, kv):
        G, Lc = codes.shape
        W = Lc - k + 1
        rc = jnp.flip(jnp.where(codes < 4, 3 - codes, codes), axis=-1)
        codes2 = jnp.concatenate([codes, rc], axis=0)
        lens2 = jnp.concatenate([lengths, jax.lax.full_like(lengths, Lc)], axis=0)
        starts2 = jnp.concatenate([jax.lax.full_like(lengths, 0), np.int32(Lc) - lengths], axis=0)
        if stage == "rc":
            return jnp.sum(codes2.astype(jnp.int32))
        kmers = batch_kmers(codes2, k)
        if stage == "kmers":
            return jnp.sum(kmers.astype(jnp.int32))
        valid = valid_windows(codes2, lens2, k, starts2)
        if stage == "valid":
            return jnp.sum(kmers.astype(jnp.int32)) + jnp.sum(valid)
        rows = sd._lookup_rows((exist, kv), kmers, mega=d.mega, size=d.size, max_probe=d.max_probe)
        rows = jnp.where(valid, rows, -1)
        if stage == "lookup":
            return jnp.sum(rows)
        hit = rows >= 0
        seg_start = _segment_starts(codes2)[:, :W]
        seg_start = jnp.maximum(seg_start, starts2[:, None])
        probe = valid & (((np.arange(W, dtype=np.int32)[None, :] - seg_start) % k) == 0)
        quick = jnp.any(probe & hit, axis=-1)
        hit = hit & quick[:, None]
        rows = jnp.where(hit, rows, -1)
        if stage == "probe":
            return jnp.sum(rows)
        posW = np.arange(W, dtype=np.int32)[None, :]
        hit_pos = jnp.where(hit, posW, -1)
        last_hit_le = jax.lax.cummax(hit_pos, axis=1)
        prev_hit = jnp.concatenate([np.full((2*BATCH,1), -1, np.int32), last_hit_le[:, :-1]], axis=-1)
        rows_fill = jax.lax.associative_scan(lambda a,b: jnp.where(b<0,a,b), jnp.where(hit, rows, -1), axis=1)
        rows_prev = jnp.concatenate([np.full((2*BATCH,1), -1, np.int32), rows_fill[:, :-1]], axis=-1)
        same_run = hit & (prev_hit >= 0) & (rows_prev == rows)
        new_run = hit & ~same_run
        gap = posW - prev_hit - 1
        trans = jnp.where(same_run, _run_transition_score(gap, p), 0).astype(jnp.int32)
        return jnp.sum(rows) + jnp.sum(new_run) + jnp.sum(trans)
    return jax.jit(f)

bats = []
for o in range(0, N, BATCH):
    cb = codes[o:o+BATCH]; lb = lengths[o:o+BATCH]
    if len(cb) < BATCH:
        cb = np.vstack([cb, np.full((BATCH-len(cb), L), 4, np.uint8)])
        lb = np.concatenate([lb, np.zeros(BATCH-len(lb), np.int32)])
    bats.append((jnp.asarray(cb), jnp.asarray(lb)))

ctrl = jax.jit(lambda c, l, e, kv: jnp.sum(c.astype(jnp.int32)) + jnp.sum(l))
for name in ["ctrl", "rc", "kmers", "valid", "lookup", "probe", "runs"]:
    f = ctrl if name == "ctrl" else mk(name)
    jax.device_get(f(*bats[0], d.exist, d.kv))
    t0=time.time()
    for c, l in bats[1:]:
        jax.device_get(f(c, l, d.exist, d.kv))
    print(f"{name}: {(time.time()-t0)/len(bats[1:])*1e3:.1f} ms/batch")
