"""Native chain scanner (native/kma_chain.cpp) vs the Python reference
implementation (mapping/chain_scan.py, itself golden-tested against the
reference binary in test_e2e.py::test_chain_mode_parity)."""

import numpy as np
import pytest

from kma_tpu.config import Penalties
from kma_tpu.index.format import load_index
from kma_tpu.mapping.chain_scan import chain_scan_read
from kma_tpu.mapping.native_chain import make_native_chain


@pytest.fixture(scope="module")
def resf(bench_resf_prefix):
    return load_index(bench_resf_prefix)


def _cases(rng, recs, n):
    """Messy read set: clean fragments, mutants, Ns, chimeras, shorties."""
    out = []
    for _ in range(n):
        t = recs[rng.integers(len(recs))]
        ln = int(rng.integers(30, min(400, len(t) + 1)))
        s = int(rng.integers(0, len(t) - ln + 1))
        c = t[s:s + ln].copy()
        kind = rng.random()
        if kind < 0.3:  # SNPs
            ne = rng.binomial(ln, 0.05)
            pp = rng.integers(0, ln, ne)
            c[pp] = (c[pp] + rng.integers(1, 4, ne)) % 4
        elif kind < 0.5:  # Ns
            pp = rng.integers(0, ln, rng.integers(1, 8))
            c[pp] = 4
        elif kind < 0.65:  # chimera: splice in another template
            t2 = recs[rng.integers(len(recs))]
            l2 = int(rng.integers(30, min(200, len(t2) + 1)))
            s2 = int(rng.integers(0, len(t2) - l2 + 1))
            c = np.concatenate([c, t2[s2:s2 + l2]])
        elif kind < 0.8:  # rc
            c = (3 - c) [::-1].copy()
            c[c > 3] = 4
        out.append(np.ascontiguousarray(c, np.uint8))
    return out


def _key(h):
    return (h.rc_flag, h.templates.tolist(), h.header, h.codes.tobytes(),
            h.n_positions.tolist(), h.flag)


@pytest.mark.parametrize("minlen,coverT,mrs,mrc,lc", [
    (16, 0.1, 0.5, 0.0, False),
    (16, 0.1, 0.5, 2.0, False),   # -mrc filtering
    (16, 0.1, 0.5, 0.0, True),    # -lc length-corrected selection
    (40, 0.5, 0.7, 1.2, False),   # tighter chain gates
])
def test_native_chain_matches_python(resf, bench_resf_prefix, minlen, coverT, mrs, mrc, lc):
    idx = resf
    pen = Penalties()
    tl = idx.template_lengths.astype(np.int64)
    nch = make_native_chain(idx, pen, tl)
    assert nch is not None

    from kma_tpu.pipeline import TemplateStore
    store = TemplateStore(bench_resf_prefix + ".seq.b",
                          idx.template_lengths.astype(np.int64),
                          idx.kmersize)
    rng = np.random.default_rng(20260818 + minlen)
    recs = [store.get(int(i)).codes for i in rng.integers(1, idx.db_size, 40)]
    cases = _cases(rng, recs, 250)

    db = idx.db_size
    S1, E1 = np.zeros(db, np.int64), np.zeros(db, np.int64)
    I1 = np.zeros(db, np.uint8)
    S2, E2 = np.zeros(db, np.int64), np.zeros(db, np.int64)
    I2 = np.zeros(db, np.uint8)
    for ci, c in enumerate(cases):
        hdr = b"r%d" % ci
        exp = chain_scan_read(idx, pen, c, hdr, False, S1, E1, I1, tl,
                              minlen, coverT, mrs, mrc, lc)
        got = nch.scan(c, hdr, False, S2, E2, I2, minlen, coverT, mrs,
                       mrc, lc)
        assert [_key(h) for h in got] == [_key(h) for h in exp], ci
    # both engines must leave the shared workspaces clean
    for a in (S1, E1, I1, S2, E2, I2):
        assert not a.any()


def test_native_chain_scan_batch(resf, bench_resf_prefix):
    """scan_batch == per-read scan, through 0-hit reads (whose early
    return must not disturb the shared tpl_off layout) and cap-overflow
    retries mid-batch."""
    idx = resf
    pen = Penalties()
    tl = idx.template_lengths.astype(np.int64)
    nch = make_native_chain(idx, pen, tl)
    nch._cap_tpl = 64  # force several mid-batch regrow retries
    nch._alloc()
    from kma_tpu.pipeline import TemplateStore
    store = TemplateStore(bench_resf_prefix + ".seq.b",
                          idx.template_lengths.astype(np.int64),
                          idx.kmersize)
    rng = np.random.default_rng(99)
    recs = [store.get(int(i)).codes for i in rng.integers(1, idx.db_size,
                                                          20)]
    cases = []
    for i in range(120):
        if i % 5 == 2:  # no-hit read
            cases.append(rng.integers(0, 4, 60).astype(np.uint8))
        elif i % 7 == 3:  # too-short read (early return)
            cases.append(recs[0][:8].copy())
        else:
            t = recs[rng.integers(len(recs))]
            s = int(rng.integers(0, max(1, len(t) - 120)))
            cases.append(np.ascontiguousarray(t[s:s + 120], np.uint8))
    headers = [b"b%d" % i for i in range(len(cases))]
    db = idx.db_size
    S1, E1 = np.zeros(db, np.int64), np.zeros(db, np.int64)
    I1 = np.zeros(db, np.uint8)
    S2, E2 = np.zeros(db, np.int64), np.zeros(db, np.int64)
    I2 = np.zeros(db, np.uint8)
    got = nch.scan_batch(cases, headers, False, S2, E2, I2,
                         16, 0.1, 0.5, 0.0, False)
    for c, h, g in zip(cases, headers, got):
        exp = nch.scan(c, h, False, S1, E1, I1, 16, 0.1, 0.5, 0.0, False)
        assert [_key(x) for x in g] == [_key(x) for x in exp]
    for a in (S1, E1, I1, S2, E2, I2):
        assert not a.any()


def test_native_chain_cap_regrow(resf, bench_resf_prefix):
    """Tiny initial caps force the -1 retry path."""
    idx = resf
    pen = Penalties()
    tl = idx.template_lengths.astype(np.int64)
    nch = make_native_chain(idx, pen, tl)
    nch._cap_hits, nch._cap_tpl = 1, 2
    nch._alloc()
    from kma_tpu.pipeline import TemplateStore
    store = TemplateStore(bench_resf_prefix + ".seq.b",
                          idx.template_lengths.astype(np.int64),
                          idx.kmersize)
    c = np.concatenate([store.get(5).codes[:150], store.get(9).codes[:150]])
    c = np.ascontiguousarray(c, np.uint8)
    db = idx.db_size
    S, E = np.zeros(db, np.int64), np.zeros(db, np.int64)
    I = np.zeros(db, np.uint8)
    got = nch.scan(c, b"x", False, S, E, I, 16, 0.1, 0.5, 0.0, False)
    S2, E2 = np.zeros(db, np.int64), np.zeros(db, np.int64)
    I2 = np.zeros(db, np.uint8)
    exp = chain_scan_read(idx, pen, c, b"x", False, S2, E2, I2, tl,
                          16, 0.1, 0.5, 0.0, False)
    assert [_key(h) for h in got] == [_key(h) for h in exp]
    assert len(got) >= 1
