"""Batched save_kmers scoring on device (TPU path of savekmers.c:2442).

The reference walks each read sequentially, maintaining per-template
Score/extendScore/include arrays.  Here the identical arithmetic is
reorganised for SPMD batches with NO dense [batch, DB_size] state:

1. k-mer extraction + unrolled hash probe for every window (pure gathers),
2. run segmentation of the hit sequence by value-list identity using
   prefix scans over the position axis (a "run" = the reference's
   `values == last` streak), run aggregates via compaction + prefix sums,
3. expansion to the actual (run, template) membership pairs (bounded by a
   static per-read cap; wider reads fall back to the host scanner),
4. a stable sort of pairs by template id; per-template totals, the
   between-run reconnect scores, and the first-seen order then all come
   from neighbour comparisons and segmented prefix sums -- no scatters.

Everything scales with the pair stream, not the DB size, so the same
kernel serves thousand-template gene panels and million-template DBs.
Validated element-exact against mapping.scan.SaveKmersScanner.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .device_index import (DeviceIndex, batch_kmers, lookup_voffsets,
                           valid_windows)

BIG = np.int32(0x3FFFFFFF)  # host scalar: no device fetch at lowering
COMP_TABLE = jnp.array([3, 2, 1, 0, 4, 5, 6, 7], dtype=jnp.uint8)
MAX_BEST = 64  # static tie-list bound; host fallback beyond


@dataclasses.dataclass(frozen=True)
class ScanParams:
    k: int
    mlen: int
    M: int
    MM: int
    U: int
    W1: int
    max_list: int
    exhaustive: bool
    max_probe: int
    run_cap: int = 64     # max value-list runs per read handled on device
    pair_cap: int = 1024  # max (run, template) pairs per read on device
    best_cap: int = 64    # max tie-list size returned per read
    small_ids: bool = False  # template ids fit int16 (halves D2H traffic)


def _gap_mm_terms(gap, k, M, MM, U, W1):
    """The kmersize<gap branch (savekmers.c:2536-2557) vectorised."""
    g = gap - (k - 1)
    small = g <= 2
    mm_big = jnp.maximum(2, g // k + jnp.where(g % k != 0, 1, 0))
    mm = jnp.where(small, g, mm_big)
    m = jnp.where(small, 0, jnp.minimum(jnp.minimum(g - mm_big, k), mm_big))
    gap_opt = W1 + (g - 1) * U
    mm_opt = mm * MM + m * M
    return jnp.where(gap_opt <= mm_opt, mm_opt, gap_opt)


def _run_transition_score(gap, p: ScanParams):
    """In-run contribution per consecutive same-list hit
    (savekmers.c:2529-2569)."""
    k, mlen = p.k, p.mlen
    M, MM, U, W1 = p.M, p.MM, p.U, p.W1
    match = gap == 0
    snp = (mlen <= gap) & (gap <= k)
    big = k < gap
    s_snp = k * M + MM
    s_big = k * M + _gap_mm_terms(gap, k, M, MM, U, W1)
    if mlen != k:
        s_small = gap * M + MM
    else:
        s_small = gap * M + W1 + (k - gap) * U
    return jnp.where(match, M,
                     jnp.where(snp, s_snp,
                               jnp.where(big, s_big, s_small)))


def _reconnect_score(gap, p: ScanParams, rc_branch):
    """Flush-time reconnect for an already-included template
    (savekmers.c:2590-2625 fw, :2901-2936 rc; the SNP case differs).
    rc_branch may be a per-row bool array (fused-strand batches)."""
    k, mlen = p.k, p.mlen
    M, MM, U, W1 = p.M, p.MM, p.U, p.W1
    match = gap == 0
    snp = (mlen <= gap) & (gap <= k)
    big = k < gap
    s_snp = jnp.where(rc_branch, k * M + MM, gap * M + MM)
    s_big = k * M + _gap_mm_terms(gap, k, M, MM, U, W1)
    if mlen != k:
        s_small = gap * M + MM
    else:
        s_small = gap * M + (k - gap) * U + W1
    return jnp.where(match, M,
                     jnp.where(snp, s_snp,
                               jnp.where(big, s_big, s_small)))


def rc_batch(codes: jax.Array, lengths: jax.Array) -> jax.Array:
    """Per-read reverse complement within the padded buffer."""
    L = codes.shape[-1]
    idx = lengths[:, None] - 1 - np.arange(L, dtype=np.int32)[None, :]
    ok = idx >= 0
    gathered = jnp.take_along_axis(codes, jnp.where(ok, idx, 0), axis=-1)
    # arithmetic complement (0<->3, 1<->2, >=4 unchanged): a gather from a
    # constant table lowers to a catastrophically slow path on TPU
    comp = jnp.where(gathered < 4, jnp.uint8(3) - gathered, gathered)
    return jnp.where(ok, comp, jnp.uint8(4))


def _segment_starts(codes: jax.Array) -> jax.Array:
    """For each window position, the start of its N-free segment."""
    L = codes.shape[-1]
    pos = np.arange(L, dtype=np.int32)[None, :]
    lastN = jax.lax.cummax(jnp.where(codes == 4, pos, -1), axis=1)
    return lastN + 1


def _strand_scan(codes, lengths, lookup_fn, values, p: ScanParams,
                 rc_branch):
    """One strand of save_kmers over the batch; rc_branch is a per-row
    bool column (fw and rc rows share one fused kernel).

    Returns (bestScore [B], best_tids [B, best_cap] front-packed, n_best,
    overflow [B], n_pairs [B])."""
    B, L = codes.shape
    k = p.k
    W = L - k + 1
    kmers = batch_kmers(codes, k)
    valid = valid_windows(codes, lengths, k)

    voff = lookup_fn(kmers)
    voff = jnp.where(valid, voff, -1)
    hit = voff >= 0

    # quick stride-k probe (savekmers.c:2485-2495)
    if not p.exhaustive:
        seg_start = _segment_starts(codes)[:, :W]
        probe = valid & (((np.arange(W, dtype=np.int32)[None, :]
                           - seg_start) % k) == 0)
        quick = jnp.any(probe & hit, axis=-1)
        hit = hit & quick[:, None]
        voff = jnp.where(hit, voff, -1)

    posW = np.arange(W, dtype=np.int32)[None, :]
    hit_pos = jnp.where(hit, posW, -1)
    last_hit_le = jax.lax.cummax(hit_pos, axis=1)  # latest hit <= pos
    prev_hit = jnp.concatenate(
        [np.full((B, 1), -1, np.int32), last_hit_le[:, :-1]],
        axis=-1)
    has_prev = prev_hit >= 0
    voff_prev = jnp.take_along_axis(voff, jnp.where(has_prev, prev_hit, 0),
                                    axis=-1)
    same_run = hit & has_prev & (voff_prev == voff)
    new_run = hit & ~same_run
    gap = posW - prev_hit - 1
    trans = jnp.where(same_run, _run_transition_score(gap, p), 0
                      ).astype(jnp.int32)
    cum_trans = jnp.cumsum(trans, axis=-1)

    # --- compact runs (no scatters): sort run-start positions forward ----
    R = min(W, p.run_cap)
    n_runs = jnp.sum(new_run, axis=-1)
    overflow = n_runs > R
    order = jnp.argsort(jnp.where(new_run, posW, BIG), axis=-1)[:, :R]
    run_start = jnp.take_along_axis(jnp.where(new_run, posW, BIG), order,
                                    axis=-1)  # [B, R], BIG padded
    run_valid = run_start < BIG
    rs_safe = jnp.where(run_valid, run_start, 0)
    run_voff = jnp.take_along_axis(voff, rs_safe, axis=-1)
    nxt = jnp.concatenate(
        [run_start[:, 1:], np.full((B, 1), BIG, np.int32)], axis=-1)
    nxt = jnp.where(nxt < BIG, nxt, W)
    # run end = latest hit before the next run's start
    run_end = jnp.take_along_axis(last_hit_le, nxt - 1, axis=-1)
    # run score = sum of in-run transitions in [start, next_start)
    ct_pad = jnp.concatenate([np.zeros((B, 1), np.int32), cum_trans],
                             axis=-1)
    run_score = (jnp.take_along_axis(ct_pad, nxt, axis=-1)
                 - jnp.take_along_axis(ct_pad, rs_safe, axis=-1))

    # --- expand to (run, template) pairs ---------------------------------
    # NOTE ON LOWERING: XLA turns take_along_axis with computed indices
    # into flattened GLOBAL gathers (~85ms per [B,1024] on v5e) -- they,
    # not FLOPs, dominated this kernel.  All run->pair broadcasts below
    # therefore use one scatter of packed run attributes at each run's
    # first pair followed by cummax carry chains (the scatter seeds are
    # strictly increasing per row, so a running max propagates the
    # current run's packed attributes to all of its pairs), and the
    # per-template grouping uses a multi-operand lax.sort that moves the
    # payloads through the sort network instead of re-gathering them.
    PAIR_CAP = p.pair_cap
    cntR = jnp.where(run_valid, values[jnp.maximum(run_voff, 0)], 0)
    pair_start = jnp.cumsum(cntR, axis=-1) - cntR
    n_pairs = pair_start[:, -1] + cntR[:, -1]
    overflow = overflow | (n_pairs > PAIR_CAP)

    pidx = np.arange(PAIR_CAP, dtype=np.int32)[None, :]
    pvalid = pidx < jnp.minimum(n_pairs, PAIR_CAP)[:, None]

    # packed run attributes; bit budget checked statically
    PB = max(8, (W + 2).bit_length())        # run start/end bits
    SCORE_BITS = 31 - 2 * PB                 # biased run score
    SCORE_BIAS = 1 << (SCORE_BITS - 1)
    RB = (R + 1).bit_length()                # run index bits
    PSB = (PAIR_CAP + 1).bit_length()        # pair_start bits
    if RB + PSB > 31 or SCORE_BITS < 12:
        raise NotImplementedError("read length too large for packed scan")
    run_idx = np.arange(R, dtype=np.int32)[None, :]
    ne = run_valid & (cntR > 0)
    pb_run = ((jnp.clip(run_score + SCORE_BIAS, 0, (1 << SCORE_BITS) - 1)
               << (2 * PB))
              | (run_start << PB) | jnp.maximum(run_end, 0))
    # each carried word must be monotone over run starts; run_idx and
    # pair_start increase, the others ride as position-prefixed halves
    psm = pair_start << 16
    seed_list = [
        jnp.where(ne, (run_idx << PSB) | pair_start, -1),
        jnp.where(ne, psm | (pb_run & 0xFFFF), -1),
        jnp.where(ne, psm | ((pb_run >> 16) & 0x7FFF), -1),
        jnp.where(ne, psm | (run_voff & 0xFFFF), -1),
        jnp.where(ne, psm | ((run_voff >> 16) & 0x7FFF), -1),
    ]
    binc = np.repeat(np.arange(B, dtype=np.int32)[:, None], R, 1)
    ps_clip = jnp.minimum(pair_start, PAIR_CAP - 1)
    base = jax.lax.full_like(codes, -1, dtype=jnp.int32,
                             shape=(B, PAIR_CAP, 5))
    seeds = base.at[binc, ps_clip].max(jnp.stack(seed_list, axis=-1))
    car = jax.lax.cummax(seeds, axis=1)
    car_rp = car[..., 0]
    pb_p = ((car[..., 2] & 0x7FFF) << 16) | (car[..., 1] & 0xFFFF)
    vo_p = ((car[..., 4] & 0x7FFF) << 16) | (car[..., 3] & 0xFFFF)
    r_of = jnp.clip(car_rp >> PSB, 0, R - 1)
    ps_of = car_rp & ((1 << PSB) - 1)
    l_of = pidx - ps_of
    tid = values[jnp.where(pvalid, jnp.maximum(vo_p, 0) + 1 + l_of, 0)
                 ].astype(jnp.int32)
    tid = jnp.where(pvalid, tid, BIG)
    seen_p = r_of * (p.max_list + 1) + l_of

    # --- per-template segmented reduction over the sorted pair stream ----
    tid_s, pb_s, seen_s = jax.lax.sort((tid, pb_p, seen_p), dimension=-1,
                                       is_stable=True, num_keys=1)
    valid_s = tid_s < BIG
    rs_s = (pb_s >> (2 * PB)) - SCORE_BIAS
    start_s = (pb_s >> PB) & ((1 << PB) - 1)
    end_s = pb_s & ((1 << PB) - 1)

    first = jnp.concatenate(
        [jnp.ones((B, 1), bool), tid_s[:, 1:] != tid_s[:, :-1]], axis=-1) \
        & valid_s
    last = jnp.concatenate(
        [tid_s[:, 1:] != tid_s[:, :-1], jnp.ones((B, 1), bool)], axis=-1) \
        & valid_s
    prev_end = jnp.concatenate(
        [np.zeros((B, 1), np.int32), end_s[:, :-1]], axis=-1)
    rec_gap = (start_s - 1) - prev_end
    add_first = jnp.where(first, p.k * p.M,
                          _reconnect_score(rec_gap, p, rc_branch[:, None]))
    contrib = jnp.where(valid_s, rs_s + add_first, 0).astype(jnp.int32)

    cum = jnp.cumsum(contrib, axis=-1)
    # base of each group = cum just before its first pair, carried forward
    # as two 16-bit cummax halves of the biased value (gather-free)
    cumb = (cum - contrib) + (1 << 30)
    pidx_hi = pidx << 16
    base_lo = jax.lax.cummax(
        jnp.where(first, pidx_hi | (cumb & 0xFFFF), -1), axis=1) & 0xFFFF
    base_hi = jax.lax.cummax(
        jnp.where(first, pidx_hi | ((cumb >> 16) & 0x7FFF), -1),
        axis=1) & 0x7FFF
    group_base = ((base_hi << 16) | base_lo) - (1 << 30)
    group_sum = cum - group_base
    group_score = jnp.maximum(group_sum, 0)  # clamp (savekmers.c:2750-2752)

    # first-seen key of each group, same carry trick
    SB = (R * (p.max_list + 1) + p.max_list + 1).bit_length()
    if PSB + SB > 31:
        raise NotImplementedError("value lists too long for packed scan")
    group_seen = jax.lax.cummax(
        jnp.where(first, (pidx << SB) | seen_s, -1), axis=1) \
        & ((1 << SB) - 1)

    gscore = jnp.where(last, group_score, -1)
    bestScore = jnp.max(gscore, axis=-1)
    bestScore = jnp.maximum(bestScore, 0)

    is_best = last & (gscore == bestScore[:, None]) & (bestScore[:, None] > 0)
    bkey = jnp.where(is_best, group_seen, BIG)
    bkey_s, btid_s = jax.lax.sort((bkey, tid_s), dimension=-1,
                                  is_stable=True, num_keys=1)
    MB = p.best_cap
    best_valid = bkey_s[:, :MB] < BIG
    best_tids = jnp.where(best_valid, btid_s[:, :MB], 0)
    if p.small_ids:
        # the tie lists dominate D2H traffic (the axon tunnel makes
        # device->host copies the scan's wall-clock ceiling)
        best_tids = best_tids.astype(jnp.int16)
    n_best = jnp.sum(is_best, axis=-1)
    overflow = overflow | (n_best > MB)

    # best_valid is NOT returned: the tie lists are front-packed, so the
    # mask is just arange < n_best (reconstructed host-side)
    return bestScore, best_tids, n_best, overflow, n_pairs


@partial(jax.jit, static_argnames=("params",))
def strand_scan_device(codes, lengths, exist, kv, values, params: Tuple):
    """jit BOTH strands as one fused [2B] batch (rows 0..B-1 forward,
    B..2B-1 reverse complement).  Returns per-row
    (bestScore, tids, valid, n_best, overflow, n_pairs)."""
    (k, mlen, M, MM, U, W1, max_list, exhaustive, mega, size, null_index,
     flag, max_probe, run_cap, pair_cap, best_cap, small_ids) = params
    p = ScanParams(k=k, mlen=mlen, M=M, MM=MM, U=U, W1=W1,
                   max_list=max_list, exhaustive=exhaustive,
                   max_probe=max_probe, run_cap=run_cap, pair_cap=pair_cap,
                   best_cap=best_cap, small_ids=small_ids)

    def lookup_fn(kmers):
        return lookup_voffsets(exist, kv, kmers, size, max_probe, mega,
                               null_index)

    B = codes.shape[0]
    both = jnp.concatenate([codes, rc_batch(codes, lengths)], axis=0)
    lens2 = jnp.concatenate([lengths, lengths], axis=0)
    rc_rows = np.arange(2 * B, dtype=np.int32) >= B
    return _strand_scan(both, lens2, lookup_fn, values, p, rc_rows)


class DeviceScanner:
    """Batched -1t1 scanner with tiered pair capacities.

    Most reads fit the small pair budget; the fat-list tail (redundant
    gene families) reruns through a wide-cap kernel on a compacted
    sub-batch, and only reads beyond even that spill to the host scanner.
    """

    def __init__(self, didx: DeviceIndex, rewards, exhaustive=False,
                 run_cap=64, pair_cap=512, best_cap=64,
                 mid_pair_cap=2048, mid_rows=1024, big_pair_cap=8192,
                 big_rows=512):
        self.didx = didx
        # wide tiers also widen run_cap and the tie-list budget so only
        # genuinely pathological reads spill to the host scanner
        self.tiers = ((mid_pair_cap, mid_rows), (big_pair_cap, big_rows))
        tier_runs = (max(run_cap, 128), max(run_cap, 192))
        tier_bests = (max(best_cap, 256), max(best_cap, 1024))

        def mk(cap, rc=run_cap, bc=best_cap):
            return (didx.kmersize, didx.mlen, rewards.M, rewards.MM,
                    rewards.U, rewards.W1, didx.max_list, exhaustive,
                    didx.mega, didx.size, didx.null_index, didx.flag,
                    didx.max_probe, rc, cap, bc,
                    didx.db_size < (1 << 15))
        self.params = mk(pair_cap)
        self.tier_params = [mk(c, rc, bc) for (c, _), rc, bc
                            in zip(self.tiers, tier_runs, tier_bests)]


    @staticmethod
    def _pad_cols(a, width):
        if a.ndim == 2 and a.shape[1] < width:
            out = np.zeros((a.shape[0], width), a.dtype)
            out[:, : a.shape[1]] = a
            return out
        return a

    def _max_best(self):
        return max(self.params[-2], *(tp[-2] for tp in self.tier_params))

    def scan_device(self, cj, lj, params=None):
        d = self.didx
        return strand_scan_device(jnp.asarray(cj), jnp.asarray(lj),
                                  d.exist, d.kv, d.values,
                                  params or self.params)

    def _split(self, out, B):
        b, t, n, ov, npair = [np.asarray(x) for x in out]
        # tie lists are front-packed: valid = arange < n_best
        v = np.arange(t.shape[1])[None, :] < n[:, None]
        return ((b[:B], t[:B], v[:B], n[:B]),
                (b[B:], t[B:], v[B:], n[B:]),
                ov[:B] | ov[B:], np.maximum(npair[:B], npair[B:]))

    def scan_many(self, codes: np.ndarray, lengths: np.ndarray,
                  batch: int = 4096):
        """Tiered scan over an arbitrary number of reads with ONE host
        sync per tier: all tier-1 batches are dispatched asynchronously,
        the overflow tail is compacted across the whole set and re-run
        through the wider kernels, again asynchronously.  Returns the same
        tuple as scan()."""
        N = codes.shape[0]
        outs = []
        for off in range(0, N, batch):
            cj = codes[off: off + batch]
            lj = lengths[off: off + batch]
            if len(cj) < batch:
                cj = np.vstack([cj, np.zeros((batch - len(cj),
                                              codes.shape[1]),
                                             codes.dtype)])
                lj = np.concatenate([lj, np.zeros(batch - len(lj),
                                                  lengths.dtype)])
            outs.append(self.scan_device(cj, lj))
        # one sync for tier 1
        fws, rcs, ovs, npss = [], [], [], []
        for o, off in zip(outs, range(0, N, batch)):
            n = min(batch, N - off)
            fw, rc, ov, nps = self._split(o, batch)
            fws.append([x[:n] for x in fw])
            rcs.append([x[:n] for x in rc])
            ovs.append(ov[:n])
            npss.append(nps[:n])
        bf, tf, vf, nf = [np.concatenate([f[i] for f in fws])
                          for i in range(4)]
        br, tr, vr, nr = [np.concatenate([r[i] for r in rcs])
                          for i in range(4)]
        ov = np.concatenate(ovs)
        npairs = np.concatenate(npss)

        # wide tiers run on compacted sub-batches; results are collected
        # first so the main arrays are padded ONCE to the width actually
        # needed (padding everything to the widest tier cap dominated the
        # wall time before)
        tier_results = []
        for ti, ((cap, rows), tp) in enumerate(zip(self.tiers,
                                                   self.tier_params)):
            if ti == len(self.tiers) - 1:
                sel_all = np.flatnonzero(ov)
            else:
                sel_all = np.flatnonzero(ov & (npairs <= cap))
            if not len(sel_all):
                continue
            touts = []
            for off in range(0, len(sel_all), rows):
                sel = sel_all[off: off + rows]
                sub_c = np.zeros((rows, codes.shape[1]), codes.dtype)
                sub_l = np.zeros(rows, lengths.dtype)
                sub_c[: len(sel)] = codes[sel]
                sub_l[: len(sel)] = lengths[sel]
                touts.append((sel, self.scan_device(sub_c, sub_l, tp)))
            for sel, o in touts:
                sfw, src_, sov, _n2 = self._split(o, rows)
                ns = len(sel)
                tier_results.append((sel, [x[:ns] for x in sfw],
                                     [x[:ns] for x in src_], sov[:ns]))
                ov[sel] = sov[:ns]
        W = tf.shape[1]
        for sel, sfw, src_, sov in tier_results:
            ok = ~sov
            need = max(int(sfw[3][ok].max(initial=0)),
                       int(src_[3][ok].max(initial=0)))
            W = max(W, min(need, sfw[1].shape[1]))
        tf, vf, tr, vr = (self._pad_cols(tf, W), self._pad_cols(vf, W),
                          self._pad_cols(tr, W), self._pad_cols(vr, W))
        for sel, sfw, src_, sov in tier_results:
            for dst, src in ((bf, sfw[0]), (tf, sfw[1]), (vf, sfw[2]),
                             (nf, sfw[3]), (br, src_[0]), (tr, src_[1]),
                             (vr, src_[2]), (nr, src_[3])):
                if src.ndim == 2:
                    src = self._pad_cols(src, W)[:, :W]
                dst[sel] = src
        return bf, tf, vf, nf, br, tr, vr, nr, ov

    def scan(self, codes: np.ndarray, lengths: np.ndarray):
        """Tiered scan: a cheap small-cap pass measures each read's exact
        pair demand (n_pairs), the fat tail reruns through progressively
        wider kernels on compacted sub-batches.  Returns (bf, tids_f,
        valid_f, nf, br, tids_r, valid_r, nr, overflow) where overflow
        marks reads that exceeded even the widest tier (host scanner)."""
        B = codes.shape[0]
        fw, rc, ov, npairs = self._split(self.scan_device(codes, lengths),
                                         B)
        bf, tf, vf, nf = [x.copy() for x in fw]
        br, tr, vr, nr = [x.copy() for x in rc]
        tier_results = []
        for (cap, rows), tp in zip(self.tiers, self.tier_params):
            sel_all = np.flatnonzero(ov & (npairs <= cap))
            if cap == self.tiers[-1][0]:
                sel_all = np.flatnonzero(ov)  # widest tier takes the rest
            if not len(sel_all):
                continue
            for off in range(0, len(sel_all), rows):
                sel = sel_all[off: off + rows]
                sub_c = np.zeros((rows, codes.shape[1]), codes.dtype)
                sub_l = np.zeros(rows, lengths.dtype)
                sub_c[: len(sel)] = codes[sel]
                sub_l[: len(sel)] = lengths[sel]
                sfw, src_, sov, _n2 = self._split(
                    self.scan_device(sub_c, sub_l, tp), rows)
                ns = len(sel)
                tier_results.append((sel, [x[:ns] for x in sfw],
                                     [x[:ns] for x in src_], sov[:ns]))
                ov[sel] = sov[:ns]
        W = tf.shape[1]
        for sel, sfw, src_, sov in tier_results:
            ok = ~sov
            need = max(int(sfw[3][ok].max(initial=0)),
                       int(src_[3][ok].max(initial=0)))
            W = max(W, min(need, sfw[1].shape[1]))
        tf, vf, tr, vr = (self._pad_cols(tf, W), self._pad_cols(vf, W),
                          self._pad_cols(tr, W), self._pad_cols(vr, W))
        for sel, sfw, src_, sov in tier_results:
            for dst, src in ((bf, sfw[0]), (tf, sfw[1]), (vf, sfw[2]),
                             (nf, sfw[3]), (br, src_[0]), (tr, src_[1]),
                             (vr, src_[2]), (nr, src_[3])):
                if src.ndim == 2:
                    src = self._pad_cols(src, W)[:, :W]
                dst[sel] = src
        return bf, tf, vf, nf, br, tr, vr, nr, ov
