"""Device (JAX) scanner vs host-exact scanner, plus multichip sharding."""

import numpy as np
import pytest

jax = pytest.importorskip("jax")

from kma_tpu.config import Penalties
from kma_tpu.index.build import freeze
from kma_tpu.index.format import KmaIndex
from kma_tpu.io.seq import kmer_scan, rc_codes, valid_kmer_mask
from kma_tpu.mapping.device_index import DeviceIndex
from kma_tpu.mapping.scan import SaveKmersScanner, _scan_strand
from kma_tpu.mapping.scan_jax import DeviceScanner
from kma_tpu.parallel.dist import make_mesh, sharded_scan_step


@pytest.fixture(scope="module")
def tiny_db():
    rng = np.random.default_rng(3)
    k = 16
    table = {}
    templates = [None]
    for t in range(1, 13):
        codes = rng.integers(0, 4, 300).astype(np.uint8)
        # create shared segments between templates for multi-hit lists
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
    B, L = 16, 80
    codes = np.full((B, L), 4, dtype=np.uint8)
    lengths = np.zeros(B, np.int32)
    for i in range(B):
        src = templates[1 + (i % 12)]
        s = rng.integers(0, len(src) - L)
        r = src[s: s + L].copy()
        ne = rng.binomial(L, 0.02)
        pos = rng.integers(0, L, ne)
        r[pos] = rng.integers(0, 4, ne)
        if i % 3 == 0:
            r = rc_codes(r)
        codes[i, :L] = r
        lengths[i] = L
    return codes, lengths


def test_device_scan_matches_host(tiny_db, read_batch):
    idx, _ = tiny_db
    codes, lengths = read_batch
    pen = Penalties()
    pen.score_matrix()
    didx = DeviceIndex.from_host(idx)
    dev = DeviceScanner(didx, pen, run_cap=16, pair_cap=256)
    host = SaveKmersScanner(idx, pen)
    bf, tf, vf, nf, br, tr, vr, nr, ov = dev.scan(codes, lengths)
    for i in range(len(codes)):
        if ov[i]:
            continue
        r = codes[i, : lengths[i]]
        bs_f, best_f = _scan_strand(idx, r, pen, False, False, host.Score,
                                    host.extendScore, host.include)
        bs_r, best_r = _scan_strand(idx, rc_codes(r), pen, False, True,
                                    host.Score_r, host.extendScore,
                                    host.include)
        assert bs_f == bf[i] and bs_r == br[i]
        assert best_f == tf[i][vf[i]].tolist()
        assert best_r == tr[i][vr[i]].tolist()


def test_sharded_scan_matches_single(tiny_db, read_batch):
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    idx, _ = tiny_db
    codes, lengths = read_batch
    pen = Penalties()
    pen.score_matrix()
    didx = DeviceIndex.from_host(idx)
    dev = DeviceScanner(didx, pen, run_cap=16, pair_cap=256)
    single = dev.scan(codes, lengths)
    mesh = make_mesh(4, 2)
    step, place = sharded_scan_step(mesh, didx, dev.params)
    out = step(*place(codes, lengths))
    for a, b in zip(single, out):
        a = np.asarray(a)
        b = np.asarray(b)
        if a.ndim == 2:  # tiered scan pads tie lists to the widest cap
            w = min(a.shape[1], b.shape[1])
            assert np.array_equal(a[:, :w], b[:, :w])
            assert not a[:, w:].any()
        else:
            assert np.array_equal(a, b)
