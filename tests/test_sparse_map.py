"""Mapping reads AGAINST -Sparse DBs (savekmers.c:826-2440, kmers.c:97-125).

Distinct from -Sparse run mode (kmer counting): a normal kma mapping run
whose -t_db was built with ``kma_index -Sparse <prefix>``.  The scanners
swap to save_kmers_Sparse (prefix DBs, both strands counted into one list,
record emitted reverse-complemented with flag 16) or
save_kmers_pseuodeSparse ("-" DBs, forward-only scoring), and all records
carry a negative rc_flag via print_ankers_Sparse.
"""

import gzip
import subprocess

import pytest

from kma_tpu.cli.main import main as kma_main


@pytest.fixture(scope="module", params=["TG", "-"])
def sparse_map_db(request, tmp_path_factory, db50, ref_index_bin):
    d = tmp_path_factory.mktemp("sparse_map_db")
    prefix = str(d / ("db_" + ("dash" if request.param == "-" else
                               request.param)))
    r = subprocess.run([str(ref_index_bin), "-i", str(db50), "-o", prefix,
                        "-Sparse", request.param], capture_output=True)
    assert r.returncode == 0, r.stderr.decode()[-500:]
    return prefix


def _cmp_outputs(ref_out, my_out, exts=(".res", ".fsa", ".aln")):
    for ext in exts:
        a = (ref_out.parent / (ref_out.name + ext)).read_bytes()
        b = (my_out.parent / (my_out.name + ext)).read_bytes()
        assert a == b, f"{ext} differs"
    a = gzip.open(str(ref_out) + ".frag.gz").read()
    b = gzip.open(str(my_out) + ".frag.gz").read()
    assert a == b, ".frag.gz differs"


@pytest.mark.parametrize("extra", [[], ["-mem_mode"]])
def test_sparse_db_se_parity(tmp_path, sim_reads, sparse_map_db, ref_bin,
                             extra):
    ref_out = tmp_path / "ref"
    my_out = tmp_path / "my"
    args = ["-1t1"] + extra
    r = subprocess.run([str(ref_bin), "-i", str(sim_reads), "-o",
                        str(ref_out), "-t_db", sparse_map_db] + args,
                       capture_output=True, timeout=600)
    assert r.returncode == 0, r.stderr.decode()[-500:]
    rc = kma_main(["-i", str(sim_reads), "-o", str(my_out), "-t_db",
                   sparse_map_db] + args)
    assert rc == 0
    _cmp_outputs(ref_out, my_out)


@pytest.mark.parametrize("pm", ["u", "p", "f"])
def test_sparse_db_pe_parity(tmp_path, sim_pairs, sparse_map_db, ref_bin,
                             pm):
    f1, f2 = sim_pairs
    ref_out = tmp_path / "ref"
    my_out = tmp_path / "my"
    args = ["-1t1", "-pm", pm]
    r = subprocess.run([str(ref_bin), "-ipe", str(f1), str(f2), "-o",
                        str(ref_out), "-t_db", sparse_map_db] + args,
                       capture_output=True, timeout=600)
    assert r.returncode == 0, r.stderr.decode()[-500:]
    rc = kma_main(["-ipe", str(f1), str(f2), "-o", str(my_out), "-t_db",
                   sparse_map_db] + args)
    assert rc == 0
    _cmp_outputs(ref_out, my_out)


def test_sparse_db_chain_parity(tmp_path, sim_reads, sparse_map_db,
                                ref_bin):
    """Default (chain) mode against a sparse DB -> save_kmers_sparse_chain
    (savekmers.c:5946-6578)."""
    ref_out = tmp_path / "ref"
    my_out = tmp_path / "my"
    r = subprocess.run([str(ref_bin), "-i", str(sim_reads), "-o",
                        str(ref_out), "-t_db", sparse_map_db],
                       capture_output=True, timeout=600)
    assert r.returncode == 0, r.stderr.decode()[-500:]
    rc = kma_main(["-i", str(sim_reads), "-o", str(my_out), "-t_db",
                   sparse_map_db])
    assert rc == 0
    _cmp_outputs(ref_out, my_out)
