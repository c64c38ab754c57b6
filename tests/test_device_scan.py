"""Production dense scanner sharded over a ('db',) device mesh.

The over-HBM path of scan_dense.DenseScanner: when the membership table
exceeds one device's budget, the bit-packed template columns are split
over every device (spltdb.c:625 DB-shard role, shm.c:466-476 residency
role) and the scan runs under GSPMD.  Asserted bit-equal to the
single-device production scanner on the 8-virtual-device CPU mesh.
"""

import numpy as np
import pytest

jax = pytest.importorskip("jax")

from kma_tpu.config import Penalties
from kma_tpu.index.build import freeze
from kma_tpu.io.seq import kmer_scan, rc_codes, valid_kmer_mask
from kma_tpu.mapping.scan_dense import DenseScanner


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


def _budget_forcing_shard(idx):
    """A per-device budget the single-device table exceeds but the
    8-way column-sharded table fits."""
    from kma_tpu.mapping.scan_dense import DenseIndex
    d1 = DenseIndex.from_host(idx)   # unsharded, to read V / t_pad
    need1 = d1.n_lists * d1.t_pad * 2
    return need1 - 1


def test_sharded_dense_scan_matches_single(tiny_db, read_batch):
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    idx, _ = tiny_db
    codes, lengths = read_batch
    pen = Penalties()
    pen.score_matrix()

    single = DenseScanner(idx, pen, batch=len(codes))
    assert not single.didx.sharded
    s_sc, s_md, s_tl, s_ov = single.scan_reads(codes, lengths)

    sharded = DenseScanner(idx, pen, batch=len(codes),
                           mem_budget_bytes=_budget_forcing_shard(idx))
    assert sharded.didx.sharded
    assert len(sharded.didx.bits.sharding.device_set) == 8
    d_sc, d_md, d_tl, d_ov = sharded.scan_reads(codes, lengths)

    assert np.array_equal(s_sc, d_sc)
    assert np.array_equal(s_md, d_md)
    assert np.array_equal(s_ov, d_ov)
    for a, b in zip(s_tl, d_tl):
        if a is None or b is None:
            assert a is None and b is None
        else:
            assert np.array_equal(np.asarray(a), np.asarray(b))


def test_sharded_dense_long_reads(tiny_db):
    """Wide-tier rescan + long (multi-segment) reads through the sharded
    scanner: same answers as the single-device scanner."""
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    idx, templates = tiny_db
    pen = Penalties()
    pen.score_matrix()
    rng = np.random.default_rng(11)
    B, L = 8, 280
    codes = np.full((B, L), 4, dtype=np.uint8)
    lengths = np.zeros(B, np.int32)
    for i in range(B):
        src = templates[1 + (i % 12)]
        r = src[: L].copy()
        r[rng.integers(0, L, 5)] = 4   # N breaks -> segment restarts
        codes[i, : len(r)] = r
        lengths[i] = len(r)

    single = DenseScanner(idx, pen, batch=B)
    sharded = DenseScanner(idx, pen, batch=B,
                           mem_budget_bytes=_budget_forcing_shard(idx))
    s = single.scan_reads(codes, lengths)
    d = sharded.scan_reads(codes, lengths)
    assert np.array_equal(s[0], d[0]) and np.array_equal(s[1], d[1])
    for a, b in zip(s[2], d[2]):
        if a is None or b is None:
            assert a is None and b is None
        else:
            assert np.array_equal(np.asarray(a), np.asarray(b))
