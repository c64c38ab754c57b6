"""Native aligner (native/kma_align.cpp) vs the Python reference modules.

The Python kma_aln/nw implementation is oracle-tested against the
reference binary; the native engine must match it field-exactly on
randomized seed-chain-NW workloads, including traceback strings.
"""

import numpy as np
import pytest

from kma_tpu.align import native_aln
from kma_tpu.align.cci import TemplateIndex
from kma_tpu.align.kma_aln import Penalty, Points, kma_align
from kma_tpu.config import Penalties


def _penalty():
    pen = Penalties()
    d = pen.score_matrix()
    return Penalty(M=pen.M, MM=pen.MM, U=pen.U, W1=pen.W1, Wl=pen.Wl, d=d)


def _mutate(rng, codes, sub=0.04, ind=0.02):
    out = []
    for c in codes:
        r = rng.random()
        if r < ind / 2:
            continue  # deletion
        if r < ind:
            out.append(int(rng.integers(0, 4)))  # insertion
        if rng.random() < sub:
            out.append((int(c) + int(rng.integers(1, 4))) % 4)
        else:
            out.append(int(c))
    return np.array(out, dtype=np.uint8)


def _py_call(fn, *args, **kw):
    """Run fn with the native engine disabled."""
    saved = native_aln._lib, native_aln._tried
    native_aln._lib, native_aln._tried = None, True
    try:
        return fn(*args, **kw)
    finally:
        native_aln._lib, native_aln._tried = saved


@pytest.fixture(scope="module")
def lib():
    lib = native_aln.get_lib()
    if lib is None:
        pytest.skip("native aligner unavailable")
    return lib


@pytest.mark.parametrize("traceback", [False, True])
@pytest.mark.parametrize("circular", [False, True])
def test_kma_align_matches_python(lib, traceback, circular):
    rng = np.random.default_rng(11 + traceback + 2 * circular)
    rew = _penalty()
    for trial in range(60):
        t_len = int(rng.integers(60, 400))
        tcodes = rng.integers(0, 4, t_len).astype(np.uint8)
        tindex = TemplateIndex(tcodes, 16)
        s = int(rng.integers(0, max(1, t_len - 50)))
        ln = int(rng.integers(40, min(150, t_len - s) + 1))
        q = _mutate(rng, tcodes[s: s + ln])
        if rng.random() < 0.2:  # unrelated read
            q = rng.integers(0, 4, len(q)).astype(np.uint8)
        if len(q) < 20:
            continue
        q_len = len(q)
        npos = np.empty(0, dtype=np.int32)
        if rng.random() < 0.2 and q_len > 30:  # read with an N
            p = int(rng.integers(5, q_len - 5))
            q = q.copy()
            q[p] = 4
            npos = np.array([p], dtype=np.int32)

        args = dict(n_positions=npos, circular=circular,
                    ts=int(rng.integers(0, 3)) if rng.random() < 0.3 else 0)
        pts_n = Points()
        st_n, al_n, mq_n = kma_align(tindex, q, q_len, 0, q_len, 0, 0, 0,
                                     rew, pts_n, 16, traceback, **args)
        pts_p = Points()
        st_p, al_p, mq_p = _py_call(kma_align, tindex, q, q_len, 0, q_len,
                                    0, 0, 0, rew, pts_p, 16, traceback,
                                    **args)
        assert (st_n.score, st_n.pos, st_n.len, st_n.match, st_n.tGaps,
                st_n.qGaps) == (st_p.score, st_p.pos, st_p.len, st_p.match,
                                st_p.tGaps, st_p.qGaps), f"trial {trial}"
        assert mq_n == mq_p
        if traceback:
            assert np.array_equal(al_n.t, al_p.t), f"trial {trial}"
            assert np.array_equal(al_n.s, al_p.s)
            assert np.array_equal(al_n.q, al_p.q)
            assert (al_n.start, al_n.end) == (al_p.start, al_p.end)


def test_anker_rc_matches_python(lib):
    from kma_tpu.align.kma_aln import anker_rc_bytes, anker_rc_comp
    from kma_tpu.io.seq import rc_codes

    rng = np.random.default_rng(23)
    rew = _penalty()
    for trial in range(60):
        t_len = int(rng.integers(80, 300))
        tcodes = rng.integers(0, 4, t_len).astype(np.uint8)
        tindex = TemplateIndex(tcodes, 16)
        s = int(rng.integers(0, t_len - 60))
        q = _mutate(rng, tcodes[s: s + 60])
        if rng.random() < 0.5:
            q = rc_codes(q)
        q_len = len(q)
        npos_f = np.empty(0, dtype=np.int32)
        rc = rc_codes(q)
        npos_r = np.empty(0, dtype=np.int32)
        one2one = int(rng.random() < 0.5)

        for fn, fargs in (
                (anker_rc_comp, (tindex, q, rc, npos_f, npos_r, q_len, 0,
                                 q_len)),
                (anker_rc_bytes, (tindex, q, rc, q_len, 0, q_len))):
            pts_n = Points()
            res_n = fn(*fargs, pts_n, one2one)
            pts_p = Points()
            res_p = _py_call(fn, *fargs, pts_p, one2one)
            assert res_n == res_p, f"{fn.__name__} trial {trial}"
            assert pts_n.len == pts_p.len

            # the surviving seeds must drive an identical alignment
            if res_n and pts_n.len:
                cur = rc if res_n < 0 else q
                st_n, _, mq_n = kma_align(tindex, cur, q_len, 0, q_len,
                                          0, 0, 0, rew, pts_n, 16, False,
                                          n_positions=npos_f)
                # python needs its own seeds re-collected through its path
                pts_p2 = Points()
                _py_call(fn, *fargs, pts_p2, one2one)
                st_p, _, mq_p = _py_call(kma_align, tindex, cur, q_len, 0,
                                         q_len, 0, 0, 0, rew, pts_p2, 16,
                                         False, n_positions=npos_f)
                assert (st_n.score, st_n.pos, st_n.len) == \
                    (st_p.score, st_p.pos, st_p.len), f"trial {trial}"
                assert mq_n == mq_p


def test_frags_batch_minfrac_skip_is_exact(lib):
    """The bound-skip in kaln_frags_se_batch_mf (min_frac=1.0) must be
    observationally identical to the no-skip scorer (min_frac=NaN) after
    the update_Scores selection — including the INT-division tie rule
    that can equal an integral best_frac on long reads (the bug class
    this nets: a skipped candidate with sc >= aln_len being selected)."""
    from kma_tpu.align.native_aln import frags_se_batch, native_handle
    from kma_tpu.pipeline import update_scores

    rng = np.random.default_rng(11)
    rew = _penalty()
    for trial in range(40):
        # a base template plus near-identical siblings (SNPs) and junk
        t_len = int(rng.integers(150, 1200))
        base = rng.integers(0, 4, t_len).astype(np.uint8)
        tindexes = [TemplateIndex(base, 16)]
        for _ in range(int(rng.integers(2, 12))):
            sib = base.copy()
            ns = int(rng.integers(0, 6))
            pos = rng.integers(0, t_len, ns)
            sib[pos] = (sib[pos] + rng.integers(1, 4, ns)) % 4
            tindexes.append(TemplateIndex(sib, 16))
        # a couple of unrelated templates (low-bound candidates)
        for _ in range(2):
            tindexes.append(TemplateIndex(
                rng.integers(0, 4, t_len).astype(np.uint8), 16))

        n_reads = 6
        codes_l, tpl_l = [], []
        for ri in range(n_reads):
            if ri == 0:
                # full-length perfect read: frac == M exactly, the
                # integral-best_frac tie case
                q = base.copy()
            else:
                L = int(rng.integers(40, min(400, t_len)))
                s = int(rng.integers(0, t_len - L + 1))
                q = _mutate(rng, base[s: s + L], sub=0.03, ind=0.01)
            codes_l.append(q)
            tpl_l.append(np.arange(1, len(tindexes) + 1, dtype=np.int32))

        handles = np.array(
            [native_handle(t) for t in tindexes], np.uint64)
        tpl_off = np.zeros(n_reads + 1, np.int64)
        codes_off = np.zeros(n_reads + 1, np.int64)
        for i in range(n_reads):
            tpl_off[i + 1] = tpl_off[i] + len(tpl_l[i])
            codes_off[i + 1] = codes_off[i] + len(codes_l[i])
        tpl_ids = np.concatenate(tpl_l)
        cand_handles = np.ascontiguousarray(handles[np.abs(tpl_ids) - 1])
        codes_flat = np.concatenate(codes_l).astype(np.uint8)
        npos_flat = np.zeros(0, np.int32)
        npos_off = np.zeros(n_reads + 1, np.int64)
        qb = np.zeros(2 * n_reads, np.int32)
        for i in range(n_reads):
            qb[2 * i + 1] = len(codes_l[i])
        arcs = (rng.random(n_reads) < 0.5).astype(np.uint8)

        outs = {}
        for mf in (None, 1.0):
            outs[mf] = frags_se_batch(
                cand_handles, tpl_ids.copy(), tpl_off, codes_flat,
                codes_off, npos_flat, npos_off, qb, arcs, rew, 16, 16,
                0, 0.5, 0.0, 1, min_frac=mf)
        (nh0, best0, frac0, tpl0, st0, en0, sc0, ln0) = outs[None]
        (nh1, best1, frac1, tpl1, st1, en1, sc1, ln1) = outs[1.0]
        assert np.array_equal(best0, best1), f"trial {trial}"
        assert np.array_equal(frac0, frac1), f"trial {trial}"
        # the POST-SELECTION records must be identical
        for i in range(n_reads):
            if best0[i] <= 16:
                assert best1[i] <= 16
                continue
            recs = []
            for (nh, tpl, st, en, sc, ln, best, frac) in (
                    (nh0, tpl0, st0, en0, sc0, ln0, best0, frac0),
                    (nh1, tpl1, st1, en1, sc1, ln1, best1, frac1)):
                b = int(tpl_off[i])
                e = b + int(nh[i])
                rec, sel = update_scores(
                    codes_l[i], len(codes_l[i]), 1.0, int(nh[i]),
                    int(best[i]), float(frac[i]), st[b:e].tolist(),
                    en[b:e].tolist(), tpl[b:e].tolist(),
                    sc[b:e].tolist(), ln[b:e].tolist(), b"r", 0)
                recs.append((rec.templates, rec.starts, rec.ends,
                             rec.score, sel))
            assert recs[0] == recs[1], f"trial {trial} read {i}"
