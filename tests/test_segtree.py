"""SegmentList (chain claimed-region bookkeeping) vs the reference's
seqmenttree.c compiled verbatim (tests/oracle/seg_oracle.c): the tree is
an APPROXIMATE structure whose quirks (split boundary drop, node
aliasing, subtree discard, u32 wrap read as int) feed chain acceptance,
so both the Python and native ports must match it op-for-op."""

import os
import struct
import subprocess

import numpy as np
import pytest

from kma_tpu.mapping.chain_scan import SegmentList

HERE = os.path.dirname(os.path.abspath(__file__))
ORACLE_SRC = os.path.join(HERE, "oracle", "seg_oracle.c")
ORACLE_BIN = os.path.join(HERE, "oracle", "seg_oracle")


@pytest.fixture(scope="module")
def oracle(ref_bin):
    ref_build = os.path.join(os.path.dirname(HERE), ".ref_build")
    if (not os.path.exists(ORACLE_BIN)
            or os.path.getmtime(ORACLE_SRC) > os.path.getmtime(ORACLE_BIN)):
        subprocess.run(
            ["gcc", "-O2", "-o", ORACLE_BIN, ORACLE_SRC,
             os.path.join(ref_build, "seqmenttree.o"),
             os.path.join(ref_build, "pherror.o")],
            check=True, capture_output=True)
    return ORACLE_BIN


def _run_oracle(oracle, ops):
    blob = struct.pack("<i", len(ops)) + b"".join(
        struct.pack("<iII", k, s, e) for k, s, e in ops)
    r = subprocess.run([oracle], input=blob, capture_output=True,
                       check=True)
    return list(np.frombuffer(r.stdout, np.int32))


def _run_py(ops):
    t = SegmentList()
    out = []
    for k, s, e in ops:
        if k == 0:
            out.append(t.grow(s, e))
        elif k == 1:
            out.append(t.query(s, e))
        else:
            t.clear()
            out.append(0)
    return out


@pytest.mark.parametrize("seed", [1, 2, 3, 4])
def test_segtree_fuzz_vs_reference(oracle, seed):
    rng = np.random.default_rng(seed)
    ops = []
    grown = False
    for _ in range(4000):
        r = rng.random()
        a = int(rng.integers(0, 15000))
        b = a + int(rng.integers(1, 2500))
        if r < 0.45 or not grown:
            ops.append((0, a, b))
            grown = True
        elif r < 0.9:
            ops.append((1, a, b))
        else:
            ops.append((2, 0, 0))
            grown = False
    exp = _run_oracle(oracle, ops)
    got = _run_py(ops)
    assert got == exp


def test_segtree_chain_like_ops(oracle):
    """Sequences shaped like real chain splicing: grows of adjacent /
    overlapping / contained chunks with interleaved cover queries."""
    rng = np.random.default_rng(42)
    ops = []
    for _read in range(200):
        ops.append((2, 0, 0))
        L = int(rng.integers(200, 15000))
        pos = 0
        first = True
        while pos < L:
            ln = int(rng.integers(50, 1200))
            s = max(0, pos - int(rng.integers(0, 80)))
            e = min(L, s + ln)
            if e <= s:
                break
            if not first:
                ops.append((1, s, e))
            ops.append((0, s, e))
            first = False
            pos = e - int(rng.integers(0, 40))
            if rng.random() < 0.3:
                qs = int(rng.integers(0, L))
                ops.append((1, qs, min(L, qs + int(rng.integers(1, 900)))))
            pos += int(rng.integers(1, 300))
    exp = _run_oracle(oracle, ops)
    got = _run_py(ops)
    assert got == exp
