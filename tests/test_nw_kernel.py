"""Pallas banded-NW wavefront kernel vs the oracle-exact host nw_band."""

import numpy as np
import pytest

from kma_tpu.align.nw import nw_band
from kma_tpu.config import Penalties
from kma_tpu.ops.nw_kernel import nw_band_score_pallas, stage_band_inputs


@pytest.mark.parametrize("seed,err", [(5, 0.08), (99, 0.2)])
def test_nw_band_score_pallas_exact(seed, err):
    """Scores bit-match nw_band (itself nw_oracle-exact) across k modes,
    length ratios, and band geometries -- incl. the reference's stale
    double-buffer reads that the k == -2 final scan observes."""
    pen = Penalties()
    d = pen.score_matrix().astype(np.int64)
    W1, U, MM = pen.W1, pen.U, pen.MM
    rng = np.random.default_rng(seed)
    B = 32
    band = 64

    templates, queries, tl, ql, ks = [], [], [], [], []
    for _ in range(B):
        tlen = int(rng.integers(10, 300))
        qlen = max(10, tlen + int(rng.integers(-60, 60)))
        t = rng.integers(0, 4, tlen).astype(np.uint8)
        q = t[:qlen].copy() if qlen <= tlen else np.concatenate(
            [t, rng.integers(0, 4, qlen - tlen)]).astype(np.uint8)
        ne = rng.binomial(qlen, err)
        pos = rng.integers(0, qlen, ne)
        q[pos] = (q[pos] + rng.integers(1, 4, ne)) % 4
        templates.append(t)
        queries.append(q)
        tl.append(tlen)
        ql.append(qlen)
        ks.append(int(rng.choice([0, 1, -1, 2, -2])))

    exp = [nw_band(templates[b], queries[b], ks[b], 0, tl[b], 0, ql[b],
                   band, d, W1, U, MM, tl[b]).score for b in range(B)]
    t_len, q_len, msc = stage_band_inputs(templates, queries, tl, ql,
                                          band, d)
    got = np.asarray(nw_band_score_pallas(
        t_len, q_len, np.asarray(ks, np.int32), msc,
        half_band=band // 2, W1=W1, U=U, MM=MM, interpret=True))
    assert got.tolist() == exp


def test_nw_band_score_pallas_mixed_bands():
    """Per-alignment runtime bands: alignments with different band
    widths share one dispatch (the production lead/trail windows mix
    bands 64..126)."""
    pen = Penalties()
    d = pen.score_matrix().astype(np.int64)
    W1, U, MM = pen.W1, pen.U, pen.MM
    rng = np.random.default_rng(17)
    B = 16
    templates, queries, tl, ql, ks, bands = [], [], [], [], [], []
    for b in range(B):
        tlen = int(rng.integers(30, 200))
        qlen = max(10, tlen + int(rng.integers(-30, 30)))
        t = rng.integers(0, 4, tlen).astype(np.uint8)
        q = t[:qlen].copy() if qlen <= tlen else np.concatenate(
            [t, rng.integers(0, 4, qlen - tlen)]).astype(np.uint8)
        ne = rng.binomial(qlen, 0.1)
        pos = rng.integers(0, qlen, ne)
        q[pos] = (q[pos] + rng.integers(1, 4, ne)) % 4
        templates.append(t)
        queries.append(q)
        tl.append(tlen)
        ql.append(qlen)
        ks.append(int(rng.choice([0, 1, -1, 2, -2])))
        bands.append(int(rng.choice([64, 80, 100, 126])))
    bands = np.asarray(bands, np.int32)
    bands += bands & 1
    exp = [nw_band(templates[b], queries[b], ks[b], 0, tl[b], 0, ql[b],
                   int(bands[b]), d, W1, U, MM, tl[b]).score
           for b in range(B)]
    t_len, q_len, msc = stage_band_inputs(templates, queries, tl, ql,
                                          bands, d)
    got = np.asarray(nw_band_score_pallas(
        t_len, q_len, np.asarray(ks, np.int32), msc,
        half_band=bands // 2, W1=W1, U=U, MM=MM, interpret=True))
    assert got.tolist() == exp


def test_nw_codes_and_qext_kernels_oracle():
    """Slim-staged kernel variants (round 5): the CODES kernel (in-VMEM
    roll+inject slab build) and the QEXT wrapper (on-device XLA slab
    expansion feeding the msc kernel) must match nw_band exactly --
    including N query codes, per-alignment bands and bands wider than
    the alignment (the K<0 saturation)."""
    import numpy as np
    from kma_tpu.align.nw import nw_band
    from kma_tpu.config import Penalties
    from kma_tpu.ops.nw_kernel import (nw_band_score_codes_pallas,
                                       nw_band_score_qext_pallas,
                                       stage_code_inputs)
    pen = Penalties()
    d = pen.score_matrix()[:5, :5].astype(np.int8)
    DMAT = tuple(tuple(int(x) for x in row) for row in d)
    rng = np.random.default_rng(29)
    B = 16
    ts, qs, tls, qls, kf, bands = [], [], [], [], [], []
    for b in range(B):
        band = [16, 32, 64, 126][b % 4]
        tlen = int(rng.integers(4, 160))
        qlen = max(1, tlen + int(rng.integers(-band // 2, band // 2 + 1)))
        ts.append(rng.integers(0, 4, tlen).astype(np.uint8))
        qs.append(rng.integers(0, 5, qlen).astype(np.uint8))
        tls.append(tlen)
        qls.append(qlen)
        kf.append([0, 1, -1, 2, -2][b % 5])
        bands.append(band)
    tl_, ql_, hb, qc0, tcol, inj = stage_code_inputs(
        ts, qs, tls, qls, np.asarray(bands))
    kfa = np.asarray(kf, np.int32)
    exp = [nw_band(ts[b], qs[b], kf[b], 0, tls[b], 0, qls[b],
                   bands[b] + (bands[b] & 1), d, pen.W1, pen.U, pen.MM,
                   tls[b]).score for b in range(B)]
    got = np.asarray(nw_band_score_codes_pallas(
        tl_, ql_, kfa, hb, qc0, tcol, inj, DMAT=DMAT, W1=pen.W1,
        U=pen.U, MM=pen.MM, GT=8, interpret=True))
    assert got.tolist() == exp
    qext = np.ascontiguousarray(
        np.concatenate([inj.T[:, ::-1], qc0], axis=1))
    got2 = np.asarray(nw_band_score_qext_pallas(
        tl_, ql_, kfa, hb, qext, tcol, DMAT=DMAT, W1=pen.W1, U=pen.U,
        MM=pen.MM, GT=8, interpret=True))
    assert got2.tolist() == exp
