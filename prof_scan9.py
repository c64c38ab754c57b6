"""Device-stage breakdown with input perturbation (axon content-caches)."""
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
from kma_tpu.mapping.device_index import batch_kmers, valid_windows

BATCH = 4096
idx = load_index(db_prefix)
pen = Penalties(); pen.score_matrix()
dev = sd.DenseScanner(idx, pen, batch=BATCH)
d = dev.didx
rs = list(iter_reads([reads]))
L = max(len(r.codes) for r in rs)
N = len(rs)
codes = np.full((N, L), 4, dtype=np.uint8)
lengths = np.zeros(N, np.int32)
for i in range(N):
    codes[i, :len(rs[i].codes)] = rs[i].codes
    lengths[i] = len(rs[i].codes)
sp = dev._sparams(L, 0)
p = ScanParams(*sp)
R = p.run_cap
BIG = sd.BIG

def front(codes, lengths, exist, kv):
    G, Lc = codes.shape
    k = p.k; W = Lc - k + 1
    rc = jnp.flip(jnp.where(codes < 4, 3 - codes, codes), axis=-1)
    codes2 = jnp.concatenate([codes, rc], axis=0)
    lens2 = jnp.concatenate([lengths, jax.lax.full_like(lengths, Lc)], axis=0)
    starts2 = jnp.concatenate([jax.lax.full_like(lengths, 0), np.int32(Lc) - lengths], axis=0)
    kmers = batch_kmers(codes2, k)
    valid = valid_windows(codes2, lens2, k, starts2)
    rows = sd._lookup_rows((exist, kv), kmers, mega=d.mega, size=d.size, max_probe=d.max_probe)
    rows = jnp.where(valid, rows, -1)
    hit = rows >= 0
    seg_start = _segment_starts(codes2)[:, :W]
    seg_start = jnp.maximum(seg_start, starts2[:, None])
    probe = valid & (((np.arange(W, dtype=np.int32)[None, :] - seg_start) % k) == 0)
    quick = jnp.any(probe & hit, axis=-1)
    hit = hit & quick[:, None]
    rows = jnp.where(hit, rows, -1)
    posW = np.arange(W, dtype=np.int32)[None, :]
    hit_pos = jnp.where(hit, posW, -1)
    last_hit_le = jax.lax.cummax(hit_pos, axis=1)
    prev_hit = jnp.concatenate([np.full((2*G,1), -1, np.int32), last_hit_le[:, :-1]], axis=-1)
    has_prev = prev_hit >= 0
    rows_fill = jax.lax.associative_scan(lambda a,b: jnp.where(b<0,a,b), jnp.where(hit, rows, -1), axis=1)
    rows_prev = jnp.concatenate([np.full((2*G,1), -1, np.int32), rows_fill[:, :-1]], axis=-1)
    same_run = hit & has_prev & (rows_prev == rows)
    new_run = hit & ~same_run
    gap = posW - prev_hit - 1
    trans = jnp.where(same_run, _run_transition_score(gap, p), 0).astype(jnp.int32)
    return rows, hit, new_run, trans

def compaction(codes, lengths, exist, kv):
    rows, hit, new_run, trans = front(codes, lengths, exist, kv)
    posW = np.arange(rows.shape[1], dtype=np.int32)[None, :]
    n_runs = jnp.sum(new_run, axis=-1)
    run_seg = jnp.cumsum(new_run.astype(jnp.int32), axis=-1)
    rids = np.arange(1, R+1, dtype=np.int32)[None, :, None]
    seg3 = run_seg[:, None, :]
    in_run = (seg3 == rids) & hit[:, None, :]
    is_start = (seg3 == rids) & new_run[:, None, :]
    posW3 = posW[None, None if False else slice(None)][None] if False else posW[None, :, :][: ]
    posW3 = posW[None, :, :]
    run_valid = rids[:, :, 0] <= n_runs[:, None]
    run_start = jnp.sum(jnp.where(is_start, posW3, 0), axis=-1)
    run_start = jnp.where(run_valid, run_start, BIG)
    run_row = jnp.sum(jnp.where(is_start, rows[:, None, :], 0), axis=-1)
    run_end = jnp.max(jnp.where(in_run, posW3, -1), axis=-1)
    run_score = jnp.sum(jnp.where(in_run, trans[:, None, :], 0), axis=-1)
    return n_runs, run_valid, run_start, run_row, run_end, run_score

j_front = jax.jit(front)
j_comp = jax.jit(compaction)
# pre-stage 5 distinct batches on device
bats = []
for o in range(0, N, BATCH):
    cb = codes[o:o+BATCH]; lb = lengths[o:o+BATCH]
    if len(cb) < BATCH:
        cb = np.vstack([cb, np.full((BATCH-len(cb), L), 4, np.uint8)])
        lb = np.concatenate([lb, np.zeros(BATCH-len(lb), np.int32)])
    bats.append((jnp.asarray(cb), jnp.asarray(lb)))
for name, f in [("front(lookup+runs)", j_front), ("+compaction", j_comp)]:
    jax.block_until_ready(f(*bats[0], d.exist, d.kv))
    t0=time.time()
    jax.block_until_ready([f(c, l, d.exist, d.kv) for c, l in bats[1:]])
    print(f"{name}: {(time.time()-t0)/len(bats[1:])*1e3:.1f} ms/batch")
jax.block_until_ready(dev._call(*bats[0], 0, 32*BATCH))
t0=time.time()
jax.block_until_ready([dev._call(c, l, 0, 32*BATCH) for c, l in bats[1:]])
print(f"full dense_scan_device: {(time.time()-t0)/len(bats[1:])*1e3:.1f} ms/batch")

# --- forcing via scalar fetch (block_until_ready is lazy on axon) ---
def sumall(f):
    def g(*a, **k):
        o = f(*a, **k)
        return jax.tree.reduce(lambda x, y: x + y,
                               jax.tree.map(lambda t: jnp.sum(t.astype(jnp.int32)), o))
    return jax.jit(g)
sf = sumall(front); sc = sumall(compaction)
def scall(c, l):
    m, fl = dev._call(c, l, 0, 32*BATCH)
    return jnp.sum(m) + jnp.sum(fl.astype(jnp.int32))
for name, f in [("front", sf), ("+compaction", sc), ("full", scall)]:
    jax.device_get(f(*bats[0], d.exist, d.kv) if f is not scall else f(*bats[0]))
    t0=time.time()
    for c, l in bats[1:]:
        jax.device_get(f(c, l, d.exist, d.kv) if f is not scall else f(c, l))
    print(f"[forced] {name}: {(time.time()-t0)/len(bats[1:])*1e3:.1f} ms/batch")
