"""Dense device scanner vs host-exact scanner (-1t1 save_kmers parity)."""

import numpy as np
import pytest

jax = pytest.importorskip("jax")

from kma_tpu.config import Penalties
from kma_tpu.index.build import freeze
from kma_tpu.io.seq import kmer_scan, rc_codes, valid_kmer_mask
from kma_tpu.mapping.scan import SaveKmersScanner
from kma_tpu.mapping.scan_dense import DenseScanner
from kma_tpu.mapping.scan_fast import FastScanner


@pytest.fixture(scope="module")
def tiny_db():
    rng = np.random.default_rng(3)
    k = 16
    table = {}
    templates = [None]
    for t in range(1, 13):
        codes = rng.integers(0, 4, 300).astype(np.uint8)
        if t > 1 and rng.random() < 0.6:
            src = templates[rng.integers(1, t)]
            s = rng.integers(0, 200)
            codes[s: s + 80] = src[s: s + 80]
        templates.append(codes)
        kms = kmer_scan(codes, k)
        ok = valid_kmer_mask(codes, k)
        for km in np.unique(kms[ok]).tolist():
            table.setdefault(km, []).append(t)
    idx = freeze(table, 13, k, k)
    idx.template_lengths = np.array([k] + [300] * 12, dtype=np.uint32)
    return idx, templates


@pytest.fixture(scope="module")
def read_batch(tiny_db):
    idx, templates = tiny_db
    rng = np.random.default_rng(5)
    B, L = 64, 80
    codes = np.full((B, L), 4, dtype=np.uint8)
    lengths = np.zeros(B, np.int32)
    for i in range(B):
        src = templates[1 + (i % 12)]
        s = rng.integers(0, len(src) - L)
        r = src[s: s + L].copy()
        ne = rng.binomial(L, 0.03)
        pos = rng.integers(0, L, ne)
        r[pos] = rng.integers(0, 5, ne)  # incl. some Ns
        if i % 3 == 0:
            r = rc_codes(r)
        ln = L - int(rng.integers(0, 10))
        codes[i, :ln] = r[:ln]
        codes[i, ln:] = 4
        lengths[i] = ln
    return codes, lengths


def _host_expect(idx, pen, codes, lengths):
    host = SaveKmersScanner(idx, pen)
    out = []
    for i in range(len(codes)):
        r = codes[i, : lengths[i]]
        npos = np.flatnonzero(r == 4).astype(np.int32)
        hit = host.scan(r, npos, b"r%d" % i)
        out.append(hit)
    return out


def _fast_as_lists(res):
    return (res.scores, res.modes,
            [res.tids(i) if res.modes[i] and not res.overflow[i] else None
             for i in range(len(res.scores))],
            res.overflow)


@pytest.mark.parametrize("scanner_cls", [DenseScanner, FastScanner])
def test_dense_scan_matches_host(tiny_db, read_batch, scanner_cls):
    idx, _ = tiny_db
    codes, lengths = read_batch
    pen = Penalties()
    pen.score_matrix()
    dev = scanner_cls(idx, pen, batch=32)
    out = dev.scan_reads(codes, lengths)
    if scanner_cls is FastScanner:
        scores, modes, tid_lists, over = _fast_as_lists(out)
    else:
        scores, modes, tid_lists, over = out
    expected = _host_expect(idx, pen, codes, lengths)
    n_checked = 0
    for i, exp in enumerate(expected):
        if over[i]:
            continue
        n_checked += 1
        if exp is None:
            assert modes[i] == 0, f"read {i}: device mapped, host did not"
            continue
        assert modes[i] != 0, f"read {i}: host mapped, device did not"
        assert scores[i] == exp.rc_flag, f"read {i} score"
        exp_flag = {0: None, 16: 2}.get(exp.flag)
        if exp.rc_flag < 0:
            assert modes[i] == 3
        elif exp.flag == 16:
            assert modes[i] == 2
        else:
            assert modes[i] == 1
        assert tid_lists[i].tolist() == exp.templates.tolist(), f"read {i}"
    assert n_checked >= len(codes) - 2


@pytest.mark.parametrize("scanner_cls", [DenseScanner, FastScanner])
def test_dense_scan_exhaustive_and_long(tiny_db, scanner_cls):
    """Long reads (> 500bp, past the round-1 packed-scan limit)."""
    idx, templates = tiny_db
    pen = Penalties()
    pen.score_matrix()
    rng = np.random.default_rng(11)
    B, L = 4, 900
    codes = np.full((B, L), 4, dtype=np.uint8)
    lengths = np.zeros(B, np.int32)
    for i in range(B):
        # chimera of three template windows
        parts = []
        for _ in range(3):
            src = templates[1 + int(rng.integers(1, 12))]
            s = int(rng.integers(0, len(src) - 250))
            parts.append(src[s: s + 250])
        r = np.concatenate(parts)
        ln = len(r)
        codes[i, :ln] = r
        lengths[i] = ln
    dev = scanner_cls(idx, pen, exhaustive=True, batch=4)
    out = dev.scan_reads(codes, lengths)
    if scanner_cls is FastScanner:
        scores, modes, tid_lists, over = _fast_as_lists(out)
    else:
        scores, modes, tid_lists, over = out
    expected = _host_expect(idx, pen, codes, lengths)
    for i, exp in enumerate(expected):
        assert not over[i]
        if exp is None:
            assert modes[i] == 0
            continue
        assert scores[i] == exp.rc_flag
        assert tid_lists[i].tolist() == exp.templates.tolist()


def test_rescan_wide_flat_spill(tiny_db):
    """A rescan chunk whose combined tie lists exceed its flat buffer must
    recurse instead of silently truncating lists (the spilled rows used to
    come back with 0- or 1-id lists)."""
    rng = np.random.default_rng(7)
    k = 16
    # 200 templates sharing one 64bp core: every core read ties ~200 ways
    core = rng.integers(0, 4, 64).astype(np.uint8)
    table = {}
    templates = [None]
    from kma_tpu.io.seq import kmer_scan, valid_kmer_mask
    for t in range(1, 201):
        codes = np.concatenate([rng.integers(0, 4, 40).astype(np.uint8),
                                core,
                                rng.integers(0, 4, 40).astype(np.uint8)])
        templates.append(codes)
        kms = kmer_scan(codes, k)
        ok = valid_kmer_mask(codes, k)
        for km in np.unique(kms[ok]).tolist():
            table.setdefault(km, []).append(t)
    from kma_tpu.index.build import freeze
    idx = freeze(table, 201, k, k)
    idx.template_lengths = np.array([k] + [144] * 200, dtype=np.uint32)
    pen = Penalties()
    pen.score_matrix()

    B, L = 512, 64
    codes = np.tile(core, (B, 1)).astype(np.uint8)
    lengths = np.full(B, L, np.int32)

    # tiny tier-0 cap so every read overflows into the wide rescan, and a
    # batch whose total ids (512 * ~200) overwhelm the 64*rows flat budget
    old_tiers = DenseScanner.TIERS
    DenseScanner.TIERS = ((8, 16), (192, 2048))
    try:
        dev = DenseScanner(idx, pen, batch=B)
        scores, modes, tid_lists, over = dev.scan_reads(codes, lengths)
    finally:
        DenseScanner.TIERS = old_tiers
    exp = _host_expect(idx, pen, codes[:1], lengths[:1])[0]
    assert exp is not None and len(exp.templates) >= 150
    for i in range(B):
        assert not over[i], f"read {i} left in overflow"
        assert scores[i] == exp.rc_flag
        assert tid_lists[i].tolist() == exp.templates.tolist(), f"read {i}"
