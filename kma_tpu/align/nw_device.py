"""Device (TPU) step-3 pre-pass: batched banded-NW window scoring.

The step-3 candidate scorer's hot loop is the exact-score pre-pass
(score-only banded NW over each candidate's lead/trail windows;
nw.c:892-1188 NW_band_score, SURVEY hard part #1).  With ``-device on``
those windows are exported per batch (native kaln_se_windows, already
content-deduped), their match-score slabs staged natively
(kaln_se_stage_msc), scored on the chip by the Pallas wavefront kernel
(ops/nw_kernel.py) -- through a devserve session when one is live,
in-process otherwise -- and fed back to the native phase-B scorer as
per-candidate score tables (kaln_set_dev_scores).  The skip rules the
scores drive are provably output-neutral, so byte parity holds by
construction; tests force the path on and assert it.

Auto-fallback: staging ships ~R*L bytes per window to the device.  On
co-located TPU hosts that is noise; through a ~30 MB/s tunnel it can
exceed the host pre-pass cost, so the auto mode only engages up to a
byte budget (KMA_TPU_NW_MAX_MB, default 8).  KMA_TPU_NW=force|off
overrides; `predev` in the KMA_ALN_PROF report counts kernel-fed
pre-passes.
"""

from __future__ import annotations

import os
import sys
from typing import Optional

import numpy as np

from . import native_aln as _nat

GT = 8          # kernel batch tile (rows per pallas program)
B_CHUNK = 1024  # windows per device dispatch (fixed compile shape)
# lead/trail window geometry clamps the span difference to BANDWIDTH,
# so band = |dt-dq| + 64 <= 128 always; 130 band lanes need 256
L_LANES = 256
MAX_BAND = 128

# process-wide counters (tests / diagnostics)
LAST_STATS = {"windows": 0, "dispatches": 0}


def _r_bucket(r: int) -> int:
    b = 128
    while b < r:
        b = -(-b * 3 // 2) // 64 * 64
    return b


def _gt_for(R: int) -> int:
    """Kernel row-tile: largest power of two whose [R, GT, L] msc block
    (double-buffered, so 2x in flight) stays within ~8 MB of VMEM.
    The doubled candidate is what must fit -- checking the current gt
    returned one step past the budget (R=256 -> GT=128 -> 16.9 MB
    scoped VMEM > the 16 MB limit, a hard compile error)."""
    gt = 8
    while gt < 256 and (R * 2 * (gt << 1) * L_LANES) <= (8 << 20):
        gt <<= 1
    return gt


class DeviceNWPrepass:
    """Per-run device scorer for the step-3 window pre-pass."""

    def __init__(self, client=None, mode: str = "auto",
                 max_mb: Optional[int] = None):
        self.client = client          # devserve.DevClient or None
        self.mode = mode
        if max_mb is None:
            try:
                max_mb = int(os.environ.get("KMA_TPU_NW_MAX_MB", "8"))
            except ValueError:
                max_mb = 8
        self.max_bytes = max_mb << 20
        self._local_fn = None
        self.windows_scored = 0
        self.dispatches = 0

    # -- scoring backends ---------------------------------------------------

    def _score_local(self, tl, ql, kf, hb, qext, tcol, gt, rew):
        if self._local_fn is None:
            import jax

            from ..ops.nw_kernel import nw_band_score_qext_pallas
            interpret = (jax.default_backend() == "cpu"
                         or os.environ.get("KMA_TPU_PALLAS")
                         == "interpret")
            DMAT = tuple(tuple(int(x) for x in row)
                         for row in np.asarray(rew.d)[:5, :5])

            def fn(tl, ql, kf, hb, qext, tcol, gt):
                return nw_band_score_qext_pallas(
                    tl, ql, kf, hb, qext, tcol, DMAT=DMAT,
                    W1=rew.W1, U=rew.U, MM=rew.MM, GT=gt,
                    interpret=interpret)

            self._local_fn = fn
        return np.asarray(self._local_fn(tl, ql, kf, hb, qext, tcol, gt),
                          np.int64)

    def _score(self, tl, ql, kf, hb, qext, tcol, gt, rew):
        self.dispatches += 1
        if self.client is not None:
            return np.asarray(
                self.client.nw_scores_qext(
                    tl, ql, kf, hb, qext, tcol,
                    dmat=np.asarray(rew.d)[:5, :5], W1=rew.W1, U=rew.U,
                    MM=rew.MM, GT=gt), np.int64)
        return self._score_local(tl, ql, kf, hb, qext, tcol, gt, rew)

    # -- batch entry ----------------------------------------------------------

    def compute(self, handles, tpl_ids, tpl_off, codes_flat, codes_off,
                npos_flat, npos_off, qbounds, arc_flags, rew,
                kmersize: int, mq: int, scoreT: float, crc_flat,
                crc_off):
        """Score this batch's heavy windows on the device; returns the
        (lead, has_lead, trail, has_trail) tables for
        native_aln.set_dev_scores, or None (host pre-pass)."""
        if self.mode == "off":
            return None
        out = _nat.se_windows(handles, tpl_ids, tpl_off, codes_flat,
                              codes_off, npos_flat, npos_off, qbounds,
                              arc_flags, rew, kmersize, mq, scoreT,
                              max_band=MAX_BAND, crc_flat=crc_flat,
                              crc_off=crc_off)
        if out is None:
            return None
        wins, lead_win, trail_win = out
        n_win = len(wins["read"])
        spans = (wins["te"] - wins["ts"]).astype(np.int64)
        # CODES staging ships ~2 bytes/template-row + one L-lane query
        # row per window (vs the r4 msc slab's span*L_LANES) -- ~100x
        # less, so the auto budget engages even through a thin tunnel
        est_bytes = int(np.minimum(spans, 1 << 20).sum()) * 2 \
            + n_win * L_LANES
        if self.mode != "force" and est_bytes > self.max_bytes:
            return None

        order = np.argsort(spans, kind="stable")
        scores = np.zeros(n_win, np.int64)
        # stage every chunk first, then PIPELINE the device calls: all
        # requests go out before the first response is awaited, so the
        # daemon round-trip latency is paid once, not per chunk.  Rows
        # pad to the fixed B_CHUNK so each R bucket is ONE compile.
        chunks = []
        for off in range(0, n_win, B_CHUNK):
            sel = order[off: off + B_CHUNK]
            R = _r_bucket(int(spans[sel].max()))
            n = len(sel)
            n_pad = GT if n <= GT else B_CHUNK
            sel_p = np.zeros(n_pad, np.int64)
            sel_p[:n] = sel
            qc0, tcol, inj, tl, ql, kf, hb = _nat.stage_codes(
                handles, codes_flat, codes_off, crc_flat, crc_off,
                wins, sel_p, R, L_LANES)
            if n < n_pad:
                # pad rows: degenerate 1x1 windows with pad codes
                tl[n:] = 1
                ql[n:] = 1
                kf[n:] = 0
                hb[n:] = 32
                qc0[n:, :] = 5
                tcol[:, n:] = 0
                inj[:, n:] = 5
            # qext = reversed inj ++ qc0: query codes over
            # qpos = K-R+1+j (the device expands the slab from these)
            qext = np.concatenate([inj.T[:, ::-1], qc0], axis=1)
            qext = np.ascontiguousarray(qext)
            gt = min(_gt_for(R), n_pad)
            chunks.append((sel, n, tl, ql, kf, hb, qext, tcol, gt))
        try:
            if self.client is not None:
                self.dispatches += len(chunks)
                for _sel, _n, tl, ql, kf, hb, qext, tcol, gt in chunks:
                    self.client.nw_scores_qext_send(
                        tl, ql, kf, hb, qext, tcol,
                        dmat=np.asarray(rew.d)[:5, :5], W1=rew.W1,
                        U=rew.U, MM=rew.MM, GT=gt)
                for sel, n, *_ in chunks:
                    got = np.asarray(self.client.nw_scores_qext_recv(),
                                     np.int64)
                    scores[sel] = got[:n]
            else:
                for sel, n, tl, ql, kf, hb, qext, tcol, gt in chunks:
                    got = self._score(tl, ql, kf, hb, qext, tcol, gt,
                                      rew)
                    scores[sel] = got[:n]
        except Exception as e:  # compile OOM, daemon loss, ...: a
            # device pre-pass failure must NEVER kill the run -- the
            # host pre-pass computes the same scores
            print("# device NW pre-pass failed (%s); host pre-pass "
                  "takes over" % type(e).__name__, file=sys.stderr)
            self.mode = "off"
            self.client = None
            self._local_fn = None
            return None
        self.windows_scored += n_win
        LAST_STATS["windows"] += n_win
        LAST_STATS["dispatches"] = self.dispatches

        total = int(tpl_off[-1])
        lead = np.zeros(total, np.int64)
        trail = np.zeros(total, np.int64)
        has_lead = (lead_win >= 0).astype(np.uint8)
        has_trail = (trail_win >= 0).astype(np.uint8)
        li = lead_win >= 0
        ti = trail_win >= 0
        lead[li] = scores[lead_win[li]]
        trail[ti] = scores[trail_win[ti]]
        return lead, has_lead, trail, has_trail


def make_nw_prepass(client=None) -> Optional[DeviceNWPrepass]:
    """DeviceNWPrepass for a ``-device on`` run, or None when disabled.

    KMA_TPU_NW: off | auto (default) | force."""
    mode = os.environ.get("KMA_TPU_NW", "auto")
    if mode == "off":
        return None
    if _nat.get_lib() is None:
        return None
    if client is None:
        # in-process scoring needs a jax backend; defer errors to first
        # use but avoid constructing when jax is plainly unavailable
        try:
            import jax  # noqa: F401
        except Exception:  # pragma: no cover
            return None
    return DeviceNWPrepass(client=client, mode=mode)
