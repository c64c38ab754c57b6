"""Stage-level device timing of the dense scan (throwaway profiler)."""
import sys
import time
from functools import partial
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
from kma_tpu.mapping.scan_jax import (ScanParams, _run_transition_score,
                                      _segment_starts)  # noqa: E402
from kma_tpu.mapping.device_index import batch_kmers, valid_windows  # noqa: E402

idx = load_index(db_prefix)
pen = Penalties()
pen.score_matrix()
dev = sd.DenseScanner(idx, pen, batch=BATCH)
d = dev.didx

rs = list(iter_reads([reads]))
L = max(len(r.codes) for r in rs)
N = len(rs)
codes = np.full((N, L), 4, dtype=np.uint8)
lengths = np.zeros(N, np.int32)
for i in range(N):
    codes[i, : len(rs[i].codes)] = rs[i].codes
    lengths[i] = len(rs[i].codes)

cj = codes[:BATCH]
lj = lengths[:BATCH]
both = np.concatenate([cj, sd.rc_host(cj, lj)], axis=0)
cjd = jax.device_put(both)
ljd = jax.device_put(np.concatenate([lj, lj]))
jax.block_until_ready([cjd, ljd])

p = ScanParams(*dev._sparams(L, 0))
t_pad, n_lists = d.t_pad, d.n_lists
G = both.shape[0]
rc_rowsg = np.arange(G, dtype=np.int32) >= G // 2
BIG = sd.BIG


@partial(jax.jit, static_argnames=("stage",))
def staged(codes, lengths, exist, kv, bits, bits_t, *, stage):
    k = p.k
    W = L - k + 1
    R = p.run_cap
    kmers = batch_kmers(codes, k)
    valid = valid_windows(codes, lengths, k)
    rows = sd._lookup_rows((exist, kv), kmers, mega=d.mega, size=d.size,
                           max_probe=d.max_probe)
    rows = jnp.where(valid, rows, -1)
    hit = rows >= 0
    if stage == "lookup":
        return rows.sum()
    if not p.exhaustive:
        seg_start = _segment_starts(codes)[:, :W]
        probe = valid & (((np.arange(W, dtype=np.int32)[None, :] - seg_start)
                          % k) == 0)
        quick = jnp.any(probe & hit, axis=-1)
        hit = hit & quick[:, None]
        rows = jnp.where(hit, rows, -1)
    posW = np.arange(W, dtype=np.int32)[None, :]
    hit_pos = jnp.where(hit, posW, -1)
    last_hit_le = jax.lax.cummax(hit_pos, axis=1)
    prev_hit = jnp.concatenate(
        [np.full((G, 1), -1, np.int32), last_hit_le[:, :-1]], axis=-1)
    has_prev = prev_hit >= 0
    rows_fill = jax.lax.associative_scan(
        lambda a, b: jnp.where(b < 0, a, b), jnp.where(hit, rows, -1), axis=1)
    rows_prev = jnp.concatenate(
        [np.full((G, 1), -1, np.int32), rows_fill[:, :-1]], axis=-1)
    same_run = hit & has_prev & (rows_prev == rows)
    new_run = hit & ~same_run
    gap = posW - prev_hit - 1
    trans = jnp.where(same_run, _run_transition_score(gap, p), 0
                      ).astype(jnp.int32)
    n_runs = jnp.sum(new_run, axis=-1)
    run_ov = n_runs > R
    run_seg = jnp.cumsum(new_run.astype(jnp.int32), axis=-1)
    rids = np.arange(1, R + 1, dtype=np.int32)[None, :, None]
    seg3 = run_seg[:, None, :]
    in_run = (seg3 == rids) & hit[:, None, :]
    is_start = (seg3 == rids) & new_run[:, None, :]
    posW3 = posW[None, :, :]
    run_valid = rids[:, :, 0] <= n_runs[:, None]
    run_start = jnp.sum(jnp.where(is_start, posW3, 0), axis=-1)
    run_start = jnp.where(run_valid, run_start, BIG)
    run_row = jnp.sum(jnp.where(is_start, rows[:, None, :], 0), axis=-1)
    run_end = jnp.max(jnp.where(in_run, posW3, -1), axis=-1)
    run_score = jnp.sum(jnp.where(in_run, trans[:, None, :], 0), axis=-1)
    if stage == "compact":
        return (run_start.sum() + run_row.sum() + run_end.sum()
                + run_score.sum())
    GT = 16
    from kma_tpu.ops.scan_kernel import run_score_pallas_vmem
    order = jnp.argsort(n_runs).astype(jnp.int32)
    inv = jnp.argsort(order).astype(jnp.int32)
    n_runs_s = n_runs[order]
    ract = run_valid[order].astype(jnp.int32)
    rc_s = jnp.asarray(rc_rowsg, jnp.int32)[order]
    rmax_tile = jnp.minimum(n_runs_s.reshape(G // GT, GT)[:, -1],
                            R).astype(jnp.int32)
    sparams_t = (p.k, p.mlen, p.M, p.MM, p.U, p.W1, t_pad, GT)
    score, first = run_score_pallas_vmem(
        bits_t, run_row[order].astype(jnp.int32),
        run_start[order].astype(jnp.int32),
        run_end[order].astype(jnp.int32),
        run_score[order].astype(jnp.int32), ract, rc_s, rmax_tile,
        sparams=sparams_t, interpret=False)
    if stage == "pallas":
        return score.sum() + first.sum()
    SBIG = np.int32(BIG)
    bestScore, tids, n_best, _, tie_ov, _ = sd._strand_epilogue(
        score, first, SBIG, p, t_pad, run_ov, proxi_frac=None)
    return (bestScore[inv].sum() + tids[inv].sum() + n_best[inv].sum()
            + tie_ov[inv].sum())


for stage in ("lookup", "compact", "pallas", "full"):
    f = lambda: staged(cjd, ljd, d.exist, d.kv, d.bits, d.bits_t,
                       stage=stage)
    jax.block_until_ready(f())
    ts = []
    for _ in range(6):
        t0 = time.time()
        jax.block_until_ready(f())
        ts.append(time.time() - t0)
    print(f"{stage:8s}: min {min(ts)*1e3:7.2f} ms  med "
          f"{sorted(ts)[len(ts)//2]*1e3:7.2f} ms")
