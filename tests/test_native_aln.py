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
