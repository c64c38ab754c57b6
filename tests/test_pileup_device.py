"""Device pileup (ops/pileup.py) vs the host assembly matrix.

The device scatter must reproduce alnToMatDense exactly (trailing
dual-gap trim, circular position wrap, u16 saturation), single-device
and sharded over the CPU mesh's 'data' axis with psum.
"""

import numpy as np
import pytest

jax = pytest.importorskip("jax")

from kma_tpu.assemble.pileup import Assem, AssemblyMatrix
from kma_tpu.ops.pileup import USHRT_MAX, pileup_dense, \
    pileup_dense_sharded


def _random_frags(rng, n, t_len, L=96):
    """Aligned byte rows in the realignment's output alphabet:
    codes 0-4 plus gap=5 on either side, random starts."""
    aln_t = np.full((n, L), 5, np.uint8)
    aln_q = np.full((n, L), 5, np.uint8)
    lens = np.zeros(n, np.int32)
    starts = np.zeros(n, np.int32)
    for i in range(n):
        ln = int(rng.integers(10, L))
        t = rng.integers(0, 6, ln).astype(np.uint8)
        q = rng.integers(0, 6, ln).astype(np.uint8)
        # avoid dual-gap columns inside (the aligner never emits them
        # mid-alignment) but leave some at the tail for the trim rule
        dual = (t == 5) & (q == 5)
        q[dual] = rng.integers(0, 5, int(dual.sum()))
        tail = int(rng.integers(0, 5))
        for z in range(tail):
            if ln - 1 - z >= 0:
                if rng.random() < 0.5:
                    t[ln - 1 - z] = 5
                else:
                    q[ln - 1 - z] = 5
        aln_t[i, :ln] = t
        aln_q[i, :ln] = q
        lens[i] = ln
        starts[i] = int(rng.integers(0, t_len))
    return aln_t, aln_q, lens, starts


def _host_counts(aln_t, aln_q, lens, starts, t_len):
    m = AssemblyMatrix(t_len)
    a = Assem()
    import os
    os.environ["KMA_TPU_NO_NATIVE"] = os.environ.get(
        "KMA_TPU_NO_NATIVE", "")
    for i in range(len(lens)):
        m.aln_to_mat_dense(a, aln_t[i, : lens[i]], None,
                           aln_q[i, : lens[i]], 0, int(starts[i]), 0)
    return m.counts[:t_len].copy()


@pytest.mark.parametrize("seed", [1, 9])
def test_pileup_dense_matches_host(seed):
    rng = np.random.default_rng(seed)
    t_len = 73
    aln_t, aln_q, lens, starts = _random_frags(rng, 64, t_len)
    exp = _host_counts(aln_t, aln_q, lens, starts, t_len)
    got = np.asarray(pileup_dense(aln_t, aln_q, lens, starts,
                                  t_len=t_len), np.int64)
    np.testing.assert_array_equal(got, exp)


def test_pileup_dense_saturation():
    """u16 saturation: sum-then-clip equals per-increment clamping."""
    t_len = 4
    n = 8
    L = 8
    aln_t = np.zeros((n, L), np.uint8)       # all advance, base A
    aln_q = np.zeros((n, L), np.uint8)
    lens = np.full(n, L, np.int32)
    starts = np.zeros(n, np.int32)
    # host path saturates via min(c, USHRT_MAX) per add; force overflow
    # by pre-scaling: run the device op many times and clip-accumulate
    acc = np.zeros((t_len, 6), np.int64)
    delta = np.asarray(pileup_dense(aln_t, aln_q, lens, starts,
                                    t_len=t_len), np.int64)
    for _ in range(5000):
        acc = np.minimum(acc + delta, USHRT_MAX)
    assert acc[0, 0] == USHRT_MAX
    assert acc[0, 1] == 0


def test_pileup_dense_sharded_psum():
    """Fragment-sharded psum over the 8-device CPU mesh equals the
    single-device scatter (SURVEY §7.6 count all-reduce)."""
    from jax.sharding import Mesh
    n_dev = len(jax.devices())
    if n_dev < 2:
        pytest.skip("needs a multi-device mesh")
    mesh = Mesh(np.array(jax.devices()), ("data",))
    rng = np.random.default_rng(3)
    t_len = 51
    n = 16 * n_dev
    aln_t, aln_q, lens, starts = _random_frags(rng, n, t_len)
    exp = _host_counts(aln_t, aln_q, lens, starts, t_len)
    got = np.asarray(pileup_dense_sharded(
        mesh, aln_t, aln_q, lens, starts, t_len=t_len), np.int64)
    np.testing.assert_array_equal(got, exp)
