"""Flag/preset parity: -int, penalties, -cge/-mint2/-mint3, -dense."""

import gzip
import subprocess
from pathlib import Path

import pytest

from kma_tpu.cli.main import main as kma_main

from tests.test_mt1 import db50_index_mod, sim_reads_mod  # noqa: F401
from tests.test_mt1 import mt1_pairs  # noqa: F401


def _cmp(tmp_path, ref_bin, db, inargs, extra):
    ref_out = tmp_path / "ref"
    my_out = tmp_path / "my"
    r = subprocess.run([str(ref_bin)] + inargs + ["-o", str(ref_out),
                       "-t_db", db] + extra, capture_output=True)
    assert r.returncode == 0, r.stderr
    rc = kma_main(inargs + ["-o", str(my_out), "-t_db", db] + extra)
    assert rc == 0
    for ext in (".res", ".fsa", ".aln"):
        a = (ref_out.parent / (ref_out.name + ext)).read_bytes()
        b = (my_out.parent / (my_out.name + ext)).read_bytes()
        assert a == b, f"{ext} differs"
    a = gzip.open(str(ref_out) + ".frag.gz").read()
    b = gzip.open(str(my_out) + ".frag.gz").read()
    assert a == b
    for ext in (".vcf.gz", ".mat.gz"):
        pa = Path(str(ref_out) + ext)
        pb = Path(str(my_out) + ext)
        assert pa.exists() == pb.exists()
        if pa.exists():
            assert gzip.open(pa).read() == gzip.open(pb).read(), ext


@pytest.mark.parametrize("mode", [[], ["-1t1"], ["-mem_mode"]])
def test_interleaved_parity(tmp_path, mt1_pairs, db50_index_mod, ref_bin,
                            mode):
    f1, f2 = mt1_pairs
    l1 = f1.read_text().splitlines()
    l2 = f2.read_text().splitlines()
    intf = tmp_path / "int.fq"
    with open(intf, "w") as f:
        for i in range(0, len(l1), 4):
            f.write("\n".join(l1[i: i + 4]) + "\n")
            f.write("\n".join(l2[i: i + 4]) + "\n")
    _cmp(tmp_path, ref_bin, db50_index_mod, ["-int", str(intf)], mode)


@pytest.mark.parametrize("extra", [
    ["-cge"],
    ["-dense"],
    ["-mint2"],
    ["-mint3"],
    ["-reward", "2", "-penalty", "4", "-gapopen", "4"],
    ["-transition", "3", "-transversion", "1"],
    ["-per", "12"],
])
def test_penalty_preset_parity(tmp_path, sim_reads_mod, db50_index_mod,
                               ref_bin, extra):
    _cmp(tmp_path, ref_bin, db50_index_mod,
         ["-i", str(sim_reads_mod)], extra)


@pytest.fixture(scope="module")
def messy_pairs(tmp_path_factory, db50):
    """Discordant/junk/flipped/high-error pairs exercising every branch of
    the penalty/force pairing combiners."""
    import numpy as np
    from kma_tpu.io.seq import parse_fasta
    rng = np.random.default_rng(1234)
    recs = list(parse_fasta(str(db50)))
    comp = np.array([3, 2, 1, 0, 4, 5], dtype=np.uint8)
    d = tmp_path_factory.mktemp("messy")
    f1p, f2p = d / "m_1.fq", d / "m_2.fq"

    def mut(r, rate):
        r = r.copy()
        nerr = rng.binomial(len(r), rate)
        ppos = rng.integers(0, len(r), nerr)
        r[ppos] = (r[ppos] + rng.integers(1, 4, nerr)) % 4
        return r

    with open(f1p, "w") as f1, open(f2p, "w") as f2:
        n = 0
        for ri in range(350):
            kind = rng.random()
            _h, c1 = recs[rng.integers(len(recs))]
            if len(c1) < 230:
                continue
            if kind < 0.4:
                s = int(rng.integers(0, len(c1) - 205))
                frag = c1[s: s + 205]
                r1 = mut(frag[:100], 0.01)
                r2 = comp[mut(frag[-100:], 0.01)[::-1]]
            elif kind < 0.6:
                _h2, c2 = recs[rng.integers(len(recs))]
                if len(c2) < 120:
                    continue
                s1 = int(rng.integers(0, len(c1) - 100))
                s2 = int(rng.integers(0, len(c2) - 100))
                r1 = mut(c1[s1: s1 + 100], 0.02)
                r2 = comp[mut(c2[s2: s2 + 100], 0.02)[::-1]]
            elif kind < 0.75:
                s1 = int(rng.integers(0, len(c1) - 100))
                r1 = mut(c1[s1: s1 + 100], 0.01)
                r2 = rng.integers(0, 4, 100).astype(np.uint8)
            elif kind < 0.9:
                s = int(rng.integers(0, len(c1) - 205))
                frag = c1[s: s + 205]
                r1 = mut(frag[:100], 0.01)
                r2 = mut(frag[-100:], 0.01)
            else:
                s = int(rng.integers(0, len(c1) - 205))
                frag = c1[s: s + 205]
                r1 = mut(frag[:100], 0.08)
                r2 = comp[mut(frag[-100:], 0.08)[::-1]]
            if rng.random() < 0.3:
                r1, r2 = comp[r1[::-1]], comp[r2[::-1]]
            f1.write("@m%d/1\n%s\n+\n%s\n"
                     % (n, "".join("ACGTN"[c] for c in r1), "I" * len(r1)))
            f2.write("@m%d/2\n%s\n+\n%s\n"
                     % (n, "".join("ACGTN"[c] for c in r2), "I" * len(r2)))
            n += 1
    return f1p, f2p


@pytest.mark.parametrize("pm", ["p", "f", "u"])
@pytest.mark.parametrize("mode", [[], ["-1t1"], ["-mem_mode"],
                                  ["-ConClave", "2"]])
def test_pairing_mode_parity(tmp_path, messy_pairs, db50_index_mod, ref_bin,
                             pm, mode):
    f1, f2 = messy_pairs
    _cmp(tmp_path, ref_bin, db50_index_mod,
         ["-ipe", str(f1), str(f2)], ["-apm", pm] + mode)


@pytest.mark.parametrize("args", [
    ["-ck", "-1t1"],
    ["-ck", "-1t1", "-mem_mode"],
])
def test_ck_se_parity(tmp_path, sim_reads_mod, db50_index_mod, ref_bin,
                      args):
    _cmp(tmp_path, ref_bin, db50_index_mod,
         ["-i", str(sim_reads_mod)], args)


@pytest.mark.parametrize("pm", ["u", "p"])
def test_ck_pe_parity(tmp_path, messy_pairs, db50_index_mod, ref_bin, pm):
    f1, f2 = messy_pairs
    _cmp(tmp_path, ref_bin, db50_index_mod,
         ["-ipe", str(f1), str(f2)], ["-ck", "-apm", pm])


def test_sasm_and_unmapped_sam_parity(tmp_path, db50, db50_index_mod,
                                      ref_bin):
    """-sasm (skip assembly) + inline unmapped SAM records: .res rows come
    from the skip path (runkma.c:835-857) and every unmapped read gets a
    flag-4/20 record (savekmers.c:204-251, alnfrags.c:2261-2273).  SAM is
    compared as a multiset: the reference's step-2/step-3 interleaving is
    pipe-buffer timing, not semantics."""
    import subprocess
    import numpy as np
    from kma_tpu.io.seq import parse_fasta
    from kma_tpu.cli.main import main as kma_main
    rng = np.random.default_rng(321)
    recs = [c for _h, c in parse_fasta(str(db50))]
    fq = tmp_path / "r.fq"
    with open(fq, "w") as f:
        for i in range(120):
            if i % 3 == 0:  # junk read: unmapped
                c = rng.integers(0, 4, int(rng.integers(60, 140)))
            else:
                t = recs[rng.integers(len(recs))]
                ln = int(rng.integers(60, min(140, len(t))))
                st = int(rng.integers(0, len(t) - ln))
                c = t[st:st + ln].copy()
                ne = rng.binomial(ln, 0.25 if i % 3 == 1 else 0.02)
                pp = rng.integers(0, ln, ne)
                c = c.copy()
                c[pp] = (c[pp] + rng.integers(1, 4, ne)) % 4
            f.write("@u%d\n%s\n+\n%s\n"
                    % (i, "".join("ACGTN"[x] for x in c), "I" * len(c)))

    for mode in ([], ["-sasm"]):
        ref_out = tmp_path / ("ref" + str(len(mode)))
        my_out = tmp_path / ("my" + str(len(mode)))
        with open(str(ref_out) + ".sam", "w") as sam:
            subprocess.run([str(ref_bin), "-i", str(fq), "-o", str(ref_out),
                            "-t_db", db50_index_mod, "-sam"] + mode,
                           stdout=sam, stderr=subprocess.DEVNULL,
                           check=True)
        import io, contextlib, sys as _sys
        buf = io.BytesIO()
        old = _sys.stdout

        class SO:
            buffer = buf

            def write(self, t):
                buf.write(t.encode())

            def flush(self):
                pass
        with contextlib.redirect_stderr(io.StringIO()):
            _sys.stdout = SO()
            try:
                rc = kma_main(["-i", str(fq), "-o", str(my_out), "-t_db",
                               db50_index_mod, "-sam"] + mode)
            finally:
                _sys.stdout = old
        assert rc == 0
        (my_out.parent / (my_out.name + ".sam")).write_bytes(buf.getvalue())
        for ext in (".res", ".fsa", ".aln"):
            a = (ref_out.parent / (ref_out.name + ext)).read_bytes()
            b = (my_out.parent / (my_out.name + ext)).read_bytes()
            assert a == b, (mode, ext)

        def recs_of(p):
            lines = p.read_bytes().split(b"\n")
            hdr = sorted(ln for ln in lines
                         if ln.startswith(b"@") and not ln.startswith(b"@PG"))
            rows = sorted(ln for ln in lines
                          if ln and not ln.startswith(b"@"))
            return hdr, rows
        assert recs_of(ref_out.parent / (ref_out.name + ".sam")) \
            == recs_of(my_out.parent / (my_out.name + ".sam")), mode
        # the unmapped block must exist: junk reads get flag 20 records
        _h, rows = recs_of(my_out.parent / (my_out.name + ".sam"))
        flags = [int(r.split(b"\t")[1]) for r in rows]
        assert flags.count(20) >= 30, mode


@pytest.mark.parametrize("pm", [[], ["-pm", "p"], ["-pm", "f"]])
def test_pe_unmapped_sam_parity(tmp_path, messy_pairs, db50_index_mod,
                                ref_bin, pm):
    """PE unmapped SAM flag composition (savekmers.c:205-247) incl. the
    force-pair partner emission; multiset comparison."""
    import io
    import contextlib
    import subprocess
    import sys as _sys
    from kma_tpu.cli.main import main as kma_main
    f1, f2 = messy_pairs
    ref_out = tmp_path / "ref"
    my_out = tmp_path / "my"
    with open(str(ref_out) + ".sam", "w") as sam:
        subprocess.run([str(ref_bin), "-ipe", str(f1), str(f2), "-o",
                        str(ref_out), "-t_db", db50_index_mod, "-sam"] + pm,
                       stdout=sam, stderr=subprocess.DEVNULL, check=True)
    buf = io.BytesIO()
    old = _sys.stdout

    class SO:
        buffer = buf

        def write(self, t):
            buf.write(t.encode())

        def flush(self):
            pass
    with contextlib.redirect_stderr(io.StringIO()):
        _sys.stdout = SO()
        try:
            rc = kma_main(["-ipe", str(f1), str(f2), "-o", str(my_out),
                           "-t_db", db50_index_mod, "-sam"] + pm)
        finally:
            _sys.stdout = old
    assert rc == 0
    (my_out.parent / (my_out.name + ".sam")).write_bytes(buf.getvalue())

    def recs_of(p):
        lines = p.read_bytes().split(b"\n")
        hdr = sorted(ln for ln in lines
                     if ln.startswith(b"@") and not ln.startswith(b"@PG"))
        rows = sorted(ln for ln in lines if ln and not ln.startswith(b"@"))
        return hdr, rows
    assert recs_of(ref_out.parent / (ref_out.name + ".sam")) \
        == recs_of(my_out.parent / (my_out.name + ".sam"))
