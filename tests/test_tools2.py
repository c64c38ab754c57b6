"""Golden tests: kma trim real quality output and -boot sub-sequencing."""

import subprocess

import numpy as np
import pytest

from kma_tpu.cli.main import main as kma_main
from kma_tpu.io.seq import parse_fasta


@pytest.fixture(scope="module")
def messy_fq(tmp_path_factory, db50):
    """Reads with low-quality tails, internal low-q bases and Ns."""
    rng = np.random.default_rng(5)
    recs = list(parse_fasta(str(db50)))
    out = tmp_path_factory.mktemp("trim") / "messy.fq"
    with open(out, "w") as f:
        for i in range(200):
            _h, codes = recs[rng.integers(len(recs))]
            L = int(rng.integers(60, 900))
            if len(codes) <= L:
                continue
            s = int(rng.integers(0, len(codes) - L))
            r = codes[s: s + L].copy()
            npos = rng.integers(0, L, rng.integers(0, 4))
            r[npos] = 4
            q = rng.integers(2, 41, L)
            ltail = int(rng.integers(0, 12))
            rtail = int(rng.integers(0, 12))
            if ltail:
                q[:ltail] = rng.integers(0, 15, ltail)
            if rtail:
                q[-rtail:] = rng.integers(0, 15, rtail)
            f.write("@m%d\n%s\n+\n%s\n"
                    % (i, "".join("ACGTN"[c] for c in r),
                       "".join(chr(33 + int(x)) for x in q)))
    return out


@pytest.mark.parametrize("flags", [[], ["-mp", "25"],
                                   ["-mi", "20", "-eq", "15"],
                                   ["-ml", "50", "-xl", "600"]])
def test_trim_parity(tmp_path, messy_fq, ref_bin, flags, capfdbinary):
    """kma trim emits the REAL trimmed quality slice (trim.c:28-68)."""
    r = subprocess.run([str(ref_bin), "trim", "-i", str(messy_fq)] + flags,
                       capture_output=True)
    assert r.returncode == 0
    capfdbinary.readouterr()
    rc = kma_main(["trim", "-i", str(messy_fq)] + flags)
    outp = capfdbinary.readouterr().out
    assert rc == 0
    assert outp == r.stdout


def test_boot_parity(tmp_path, messy_fq, db50, ref_bin, ref_index_bin):
    """-boot maps overlapping 1024/512 sub-sequences (runinput.c:732)."""
    import gzip
    d = tmp_path
    prefix = str(d / "db")
    subprocess.run([str(ref_index_bin), "-i", str(db50), "-o", prefix],
                   check=True, capture_output=True)
    ref_out = d / "ref"
    my_out = d / "my"
    r = subprocess.run([str(ref_bin), "-i", str(messy_fq), "-o",
                        str(ref_out), "-t_db", prefix, "-boot"],
                       capture_output=True)
    assert r.returncode == 0
    rc = kma_main(["-i", str(messy_fq), "-o", str(my_out), "-t_db", prefix,
                   "-boot"])
    assert rc == 0
    for ext in (".res", ".fsa", ".aln"):
        assert (d / ("ref" + ext)).read_bytes() \
            == (d / ("my" + ext)).read_bytes(), f"{ext} differs"
    assert gzip.open(str(ref_out) + ".frag.gz").read() \
        == gzip.open(str(my_out) + ".frag.gz").read()


@pytest.fixture(scope="module")
def db50_index2(tmp_path_factory, db50, ref_index_bin):
    d = tmp_path_factory.mktemp("db_idx_t2")
    prefix = str(d / "db")
    subprocess.run([str(ref_index_bin), "-i", str(db50), "-o", prefix],
                   check=True, capture_output=True)
    return prefix


@pytest.mark.parametrize("flags", [[], ["-d", "8191", "-f", "5"],
                                   ["-d", "76", "-f", "0"],
                                   ["-d", "4444", "-f", "4"]])
def test_dist_parity(tmp_path, db50_index2, ref_bin, flags):
    """kma dist: all 13 measures, relaxed/fixed phylip, byte parity
    incl. the reference's mmap NUL padding (dist.c:593-768)."""
    ref_out = tmp_path / "ref.phy"
    my_out = tmp_path / "my.phy"
    r = subprocess.run([str(ref_bin), "dist", "-t_db", db50_index2,
                        "-o", str(ref_out)] + flags, capture_output=True)
    assert r.returncode == 0
    rc = kma_main(["dist", "-t_db", db50_index2, "-o", str(my_out)]
                  + flags)
    assert rc == 0
    assert ref_out.read_bytes() == my_out.read_bytes()


def _make_014(prefix15: str, dst_prefix: str) -> None:
    """Inverse of update.c's 0.14->0.15 conversion: synthesize a 0.14
    index from a current one (k<=16, standard length file)."""
    import shutil
    import struct
    with open(prefix15 + ".comp.b", "rb") as f:
        DB_size, kmersize, prefix_len = struct.unpack("<III", f.read(12))
        prefix, size, n, v_index, null_index = struct.unpack("<QQQQQ",
                                                             f.read(40))
        exist = np.fromfile(f, dtype="<u4", count=size)
        dt = "<u2" if DB_size < 0xFFFF else "<u4"
        values = np.fromfile(f, dtype=dt, count=v_index)
        key_index = np.fromfile(f, dtype="<u4", count=n + 1)
        value_index = np.fromfile(f, dtype="<u4", count=n)
    with open(dst_prefix + ".comp.b", "wb") as f:
        f.write(struct.pack("<III", DB_size, kmersize, prefix_len))
        f.write(struct.pack("<QQ", prefix, size))
        f.write(struct.pack("<IIII", n, 1, v_index, null_index))
        f.write(exist.astype("<u4").tobytes())
        f.write(np.zeros(1, "<u8").tobytes())      # unused seq word
        f.write(values.astype("<u4").tobytes())    # 0.14 stored u32
        f.write(key_index.astype("<u4").tobytes())
        f.write(value_index.astype("<u4").tobytes())
    # standard 0.14 length file: header + one block
    with open(prefix15 + ".length.b", "rb") as f:
        raw = f.read()
    sz = struct.unpack_from("<I", raw)[0]
    with open(dst_prefix + ".length.b", "wb") as f:
        f.write(raw[: 4 + 4 * sz])
    open(dst_prefix + ".b", "wb").write(b"legacy")
    for ext in (".name", ".seq.b"):
        shutil.copy(prefix15 + ext, dst_prefix + ext)


def test_update_migration_parity(tmp_path, db50_index2, ref_bin):
    """kma update -v 1415 migrates a 0.14 index byte-identically to the
    reference (update.c:66-206)."""
    import os
    a = str(tmp_path / "refdb")
    b = str(tmp_path / "mydb")
    _make_014(db50_index2, a)
    _make_014(db50_index2, b)
    r = subprocess.run([str(ref_bin), "update", "-t_db", a, "-v", "1415"],
                       capture_output=True)
    assert r.returncode == 0, r.stderr
    rc = kma_main(["update", "-t_db", b, "-v", "1415"])
    assert rc == 0
    for ext in (".comp.b", ".length.b"):
        assert open(a + ext, "rb").read() == open(b + ext, "rb").read(), ext
    assert not os.path.exists(a + ".b") and not os.path.exists(b + ".b")
    # the migrated DB must be loadable and usable
    from kma_tpu.index.format import load_index
    idx = load_index(b)
    assert idx.db_size > 1


def test_shm_and_mmap(tmp_path, db50_index2, messy_fq, ref_bin,
                      monkeypatch):
    """kma shm pins tmpfs copies; -shm/-mmap mapping runs stay
    byte-identical (shm.c analog + kmmap.c:33)."""
    import os
    shmdir = tmp_path / "shm"
    shmdir.mkdir()
    import kma_tpu.index.shm as shm_mod
    monkeypatch.setattr(shm_mod, "SHM_DIR", str(shmdir))
    rc = kma_main(["shm", "-t_db", db50_index2, "-shmLvl", "29"])
    assert rc == 0
    pinned = os.listdir(shmdir)
    assert len(pinned) == 4  # comp.b, length.b, seq.b, name (no decon)
    ref_out = tmp_path / "ref"
    my_out = tmp_path / "my"
    r = subprocess.run([str(ref_bin), "-i", str(messy_fq), "-o",
                        str(ref_out), "-t_db", db50_index2],
                       capture_output=True)
    assert r.returncode == 0
    rc = kma_main(["-i", str(messy_fq), "-o", str(my_out), "-t_db",
                   db50_index2, "-shm", "29", "-mmap"])
    assert rc == 0
    for ext in (".res", ".fsa", ".aln"):
        assert (tmp_path / ("ref" + ext)).read_bytes() \
            == (tmp_path / ("my" + ext)).read_bytes(), ext
    rc = kma_main(["shm", "-t_db", db50_index2, "-shmLvl", "29",
                   "-destroy"])
    assert rc == 0
    assert os.listdir(shmdir) == []


@pytest.mark.parametrize("iflags", [["-m", "14"], ["-hc"],
                                    ["-m", "8", "-hc"], ["-m", "10"]])
def test_cmer_index_parity(tmp_path, db50, ref_index_bin, iflags):
    """kma index -m/-hc: byte-identical .comp.b (stdnuc.c cmer modes +
    compress.c walk order incl. the terminating-key off-by-one)."""
    a = str(tmp_path / "ref")
    b = str(tmp_path / "my")
    subprocess.run([str(ref_index_bin), "-i", str(db50), "-o", a] + iflags,
                   check=True, capture_output=True)
    rc = kma_main(["index", "-i", str(db50), "-o", b] + iflags)
    assert rc == 0
    assert open(a + ".comp.b", "rb").read() == open(b + ".comp.b",
                                                    "rb").read()
    assert open(a + ".length.b", "rb").read() == open(b + ".length.b",
                                                      "rb").read()


@pytest.mark.parametrize("iflags,mflags", [
    (["-m", "14"], []), (["-hc"], []), (["-m", "14"], ["-hmm"]),
    (["-m", "8", "-hc"], []), (["-m", "10"], ["-1t1", "-device", "off"])])
def test_cmer_mapping_parity(tmp_path, db50, messy_fq, ref_bin,
                             ref_index_bin, iflags, mflags):
    """Mapping against -m/-hc DBs: full output parity (cmer lookups in
    the chain/1t1/HMM scanners)."""
    import gzip
    prefix = str(tmp_path / "db")
    subprocess.run([str(ref_index_bin), "-i", str(db50), "-o", prefix]
                   + iflags, check=True, capture_output=True)
    ref_out = tmp_path / "ref"
    my_out = tmp_path / "my"
    ref_flags = [f for i, f in enumerate(mflags)
                 if f != "-device" and (i == 0 or mflags[i - 1]
                                        != "-device")]
    r = subprocess.run([str(ref_bin), "-i", str(messy_fq), "-o",
                        str(ref_out), "-t_db", prefix] + ref_flags,
                       capture_output=True)
    assert r.returncode == 0
    rc = kma_main(["-i", str(messy_fq), "-o", str(my_out), "-t_db",
                   prefix] + mflags)
    assert rc == 0
    for ext in (".res", ".fsa", ".aln"):
        assert (tmp_path / ("ref" + ext)).read_bytes() \
            == (tmp_path / ("my" + ext)).read_bytes(), f"{ext} differs"
    assert gzip.open(str(ref_out) + ".frag.gz").read() \
        == gzip.open(str(my_out) + ".frag.gz").read()


def test_index_tier_parity(tmp_path, db50, ref_index_bin):
    """index tooling depth: -t_db append, -batch, homology filters,
    ORF checks and -k_t/-k_i all byte-match the reference."""
    import random
    recs = open(str(db50)).read().split(">")[1:]
    p1 = tmp_path / "p1.fsa"
    p2 = tmp_path / "p2.fsa"
    p1.write_text("".join(">" + r for r in recs[:30]))
    p2.write_text("".join(">" + r for r in recs[30:]))
    batch = tmp_path / "b.txt"
    batch.write_text("%s\n%s\n" % (p1, p2))
    # ORFy records
    random.seed(3)
    stops = ["TAA", "TAG", "TGA"]
    inner = [a + b + c for a in "ACGT" for b in "ACGT" for c in "ACGT"
             if a + b + c not in stops]
    comp = str.maketrans("ACGT", "TGCA")
    orf = tmp_path / "orf.fsa"
    with open(orf, "w") as f:
        for i in range(40):
            n = random.randint(30, 200)
            body = "".join(random.choice(inner) for _ in range(n))
            if i % 4 == 0:
                s = "ATG" + body + random.choice(stops)
            elif i % 4 == 1:
                s = ("ATG" + body
                     + random.choice(stops)).translate(comp)[::-1]
            elif i % 4 == 2:
                s = "ATG" + body[:30] + "TAA" + body[30:] + "TGA"
            else:
                s = "".join(random.choice("ACGT") for _ in range(3 * n + 1))
            f.write(">orf%d\n%s\n" % (i, s))

    def build_both(tag, ref_args, my_args=None):
        a = str(tmp_path / ("r" + tag))
        b = str(tmp_path / ("m" + tag))
        subprocess.run([str(ref_index_bin)] + [x.format(o=a) for x in
                                               ref_args],
                       check=True, capture_output=True)
        rc = kma_main(["index"] + [x.format(o=b) for x in
                                   (my_args or ref_args)])
        assert rc == 0
        for ext in (".comp.b", ".length.b", ".name", ".seq.b"):
            assert open(a + ext, "rb").read() == open(b + ext, "rb").read(), \
                (tag, ext)
        return a, b

    old_r, old_m = build_both("old", ["-i", str(p1), "-o", "{o}"])
    build_both("app", ["-t_db", old_r, "-i", str(p2), "-o", "{o}"],
               ["-t_db", old_m, "-i", str(p2), "-o", "{o}"])
    build_both("bat", ["-batch", str(batch), "-o", "{o}"])
    build_both("hq", ["-i", str(db50), "-o", "{o}", "-Sparse", "ATG",
                      "-hq", "0.5"])
    build_both("ht", ["-i", str(db50), "-o", "{o}", "-Sparse", "ATG",
                      "-ht", "0.4", "-hq", "0.6", "-and"])
    build_both("orfc", ["-i", str(orf), "-o", "{o}", "-c"])
    build_both("orfC", ["-i", str(orf), "-o", "{o}", "-C"])
    build_both("kt", ["-i", str(db50), "-o", "{o}", "-k_t", "14",
                      "-k_i", "17"])


def test_step_flags_and_spool(tmp_path, messy_fq, db50_index2, ref_bin,
                              capfdbinary):
    """-s1/-s2 wire-format parity and -mf spool output invariance."""
    import gzip
    o = str(tmp_path / "x")
    r1 = subprocess.run([str(ref_bin), "-s1", "-i", str(messy_fq), "-o",
                         o, "-t_db", db50_index2], capture_output=True)
    assert r1.returncode == 0
    capfdbinary.readouterr()
    rc = kma_main(["-s1", "-i", str(messy_fq), "-o", o, "-t_db",
                   db50_index2])
    my1 = capfdbinary.readouterr().out
    assert rc == 0 and my1 == r1.stdout and len(my1) > 16
    for mode in ([], ["-1t1"], ["-hmm"]):
        r2 = subprocess.run([str(ref_bin), "-s2", "-i", str(messy_fq),
                             "-o", o, "-t_db", db50_index2] + mode,
                            capture_output=True)
        assert r2.returncode == 0
        rc = kma_main(["-s2", "-i", str(messy_fq), "-o", o, "-t_db",
                       db50_index2] + mode)
        my2 = capfdbinary.readouterr().out
        assert rc == 0 and my2 == r2.stdout, mode

    a = tmp_path / "plain"
    b = tmp_path / "spool"
    assert kma_main(["-i", str(messy_fq), "-t_db", db50_index2, "-o",
                     str(a)]) == 0
    assert kma_main(["-i", str(messy_fq), "-t_db", db50_index2, "-o",
                     str(b), "-mf", "5", "-tmp", str(tmp_path)]) == 0
    for ext in (".res", ".fsa", ".aln"):
        assert (tmp_path / ("plain" + ext)).read_bytes() \
            == (tmp_path / ("spool" + ext)).read_bytes(), ext
    # frag.gz ROW ORDER legitimately depends on -mf (per-flush LIFO
    # chunks, conclave.c:196-208 -- the reference behaves the same, see
    # test_mf_frag_spooling_parity); the row multiset is invariant
    assert sorted(gzip.open(str(a) + ".frag.gz").read().splitlines()) \
        == sorted(gzip.open(str(b) + ".frag.gz").read().splitlines())


def test_mf_frag_spooling_parity(tmp_path, sim_reads, db50_index, ref_bin):
    """-mf 32: per-template fragment lists spill to tmpfiles mid-ConClave
    (conclave.c:196-208) and assembly replays them in printFrags order --
    outputs must match an unbounded run and the reference."""
    import subprocess
    from kma_tpu.cli.main import main as kma_main
    for mf, name in (("32", "a"), ("7", "b")):
        ref_out = tmp_path / ("ref" + name)
        subprocess.run([str(ref_bin), "-i", str(sim_reads), "-o",
                        str(ref_out), "-t_db", db50_index, "-mf", mf],
                       capture_output=True, check=True)
        my_out = tmp_path / name
        rc = kma_main(["-i", str(sim_reads), "-o", str(my_out), "-t_db",
                       db50_index, "-mf", mf])
        assert rc == 0
        for ext in (".res", ".fsa", ".aln"):
            a = (ref_out.parent / (ref_out.name + ext)).read_bytes()
            b = (my_out.parent / (my_out.name + ext)).read_bytes()
            assert a == b, (mf, ext)
        import gzip
        assert gzip.open(str(ref_out) + ".frag.gz").read() == \
            gzip.open(str(my_out) + ".frag.gz").read(), mf


def test_cmer_pe_mapping_parity(tmp_path, db50, ref_bin, ref_index_bin):
    """PE mapping against a -hc DB: the native pair scanner computes cmer
    keys (getHmer) identically to the reference."""
    import gzip
    import numpy as np
    from kma_tpu.io.seq import parse_fasta
    prefix = str(tmp_path / "db")
    subprocess.run([str(ref_index_bin), "-i", str(db50), "-o", prefix,
                    "-hc"], check=True, capture_output=True)
    rng = np.random.default_rng(88)
    recs = [c for _h, c in parse_fasta(str(db50)) if len(c) >= 260]
    f1, f2 = tmp_path / "p_1.fq", tmp_path / "p_2.fq"
    comp = np.array([3, 2, 1, 0, 4, 5], dtype=np.uint8)
    with open(f1, "w") as a, open(f2, "w") as b:
        for i in range(200):
            t = recs[rng.integers(len(recs))]
            s = int(rng.integers(0, len(t) - 250))
            fr = t[s:s + 250]
            m1 = fr[:100].copy()
            m2 = comp[fr[150:250]][::-1].copy()
            for m in (m1, m2):
                ne = rng.binomial(100, 0.02)
                pp = rng.integers(0, 100, ne)
                m[pp] = (m[pp] + rng.integers(1, 4, ne)) % 4
            a.write("@c%d/1\n%s\n+\n%s\n"
                    % (i, "".join("ACGTN"[c] for c in m1), "I" * 100))
            b.write("@c%d/2\n%s\n+\n%s\n"
                    % (i, "".join("ACGTN"[c] for c in m2), "I" * 100))
    ref_out = tmp_path / "ref"
    my_out = tmp_path / "my"
    subprocess.run([str(ref_bin), "-ipe", str(f1), str(f2), "-o",
                    str(ref_out), "-t_db", prefix], capture_output=True,
                   check=True)
    assert kma_main(["-ipe", str(f1), str(f2), "-o", str(my_out),
                     "-t_db", prefix]) == 0
    for ext in (".res", ".fsa", ".aln"):
        assert (ref_out.parent / (ref_out.name + ext)).read_bytes() == \
            (my_out.parent / (my_out.name + ext)).read_bytes(), ext
    assert gzip.open(str(ref_out) + ".frag.gz").read() == \
        gzip.open(str(my_out) + ".frag.gz").read()


def test_dist_disk_matrix_parity(tmp_path, db50_index, ref_bin):
    """-m (disk-backed ltdMatrix, matrix.c:89) output matches both the
    in-RAM path and the reference."""
    import subprocess as sp
    r = sp.run([str(ref_bin), "dist", "-t_db", db50_index, "-d", "4095",
                "-o", str(tmp_path / "ref.phy")], capture_output=True)
    assert r.returncode == 0, r.stderr
    from kma_tpu.cli.main import main as kma_main
    assert kma_main(["dist", "-t_db", db50_index, "-d", "4095",
                     "-o", str(tmp_path / "ram.phy")]) == 0
    assert kma_main(["dist", "-t_db", db50_index, "-d", "4095", "-m",
                     "-tmp", str(tmp_path),
                     "-o", str(tmp_path / "disk.phy")]) == 0
    ref = (tmp_path / "ref.phy").read_bytes()
    assert (tmp_path / "ram.phy").read_bytes() == ref
    assert (tmp_path / "disk.phy").read_bytes() == ref
