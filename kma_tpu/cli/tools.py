"""Database tool subcommands (reference seq2fasta.c, db.c, cmp.c, merge.c,
shm.c, update.c).
"""

from __future__ import annotations

import sys
from typing import List

import numpy as np


def dispatch(cmd: str, argv: List[str]) -> int:
    fn = {"seq2fasta": seq2fasta_main, "db": db_main, "cmp": cmp_main,
          "merge": merge_main, "shm": shm_main, "update": update_main,
          "dist": dist_main, "trim": trim_main}.get(cmd)
    if fn is None:
        print(f"Unknown command: {cmd}", file=sys.stderr)
        return 1
    return fn(argv)


def _parse_db_flag(argv, flags=("-t_db",)):
    db = None
    rest = []
    i = 0
    while i < len(argv):
        if argv[i] in flags and i + 1 < len(argv):
            db = argv[i + 1]
            i += 2
        else:
            rest.append(argv[i])
            i += 1
    return db, rest


def seq2fasta_main(argv: List[str]) -> int:
    """kma seq2fasta (seq2fasta.c): dump templates back to fasta."""
    from ..index.format import load_length_b, load_names
    from ..io.seq import unpack_2bit, BASES
    db, rest = _parse_db_flag(argv)
    seqs = None
    i = 0
    while i < len(rest):
        if rest[i] == "-seqs" and i + 1 < len(rest):
            seqs = sorted(int(x) for x in rest[i + 1].split(","))
            i += 2
        else:
            i += 1
    if db is None:
        print("Too few arguments handed", file=sys.stderr)
        return 1
    lengths = load_length_b(db + ".length.b")
    names = load_names(db + ".name")
    out = sys.stdout.buffer
    with open(db + ".seq.b", "rb") as f:
        for t in range(1, len(lengths)):
            t_len = int(lengths[t])
            nwords = (t_len >> 5) + 1
            words = np.fromfile(f, dtype="<u8", count=nwords)
            if seqs is not None and t not in seqs:
                continue
            codes = unpack_2bit(words, t_len)
            out.write(b">" + names[t - 1] + b"\n")
            out.write(np.frombuffer(BASES, dtype=np.uint8)[codes].tobytes())
            out.write(b"\n")
    return 0


def db_main(argv: List[str]) -> int:
    """kma db (db.c:29-172): index statistics."""
    import os
    from ..index.format import load_comp_b
    db, _ = _parse_db_flag(argv)
    if db is None and argv:
        db = argv[0]
    if db is None:
        print("Too few arguments handed", file=sys.stderr)
        return 1
    print(f"DB:\t{db}")
    ntcount = 4 * os.path.getsize(db + ".seq.b")
    print(f"# nucleotides:\t{ntcount}")
    idx = load_comp_b(db + ".comp.b")
    print(f"# templates:\t{idx.db_size - 1}")
    print(f"k:\t{idx.kmersize}")
    print(f"m:\t{idx.mlen}")
    print(f"hc:\t{idx.flag & 1}")
    if idx.prefix_len:
        p = idx.prefix
        s = ""
        for _ in range(idx.prefix_len):
            s = "ACGTN-"[p & 3] + s
            p >>= 2
        print(f"prefix:\t{s}")
    elif idx.prefix != 0:
        print("prefix:\t-")
    print(f"# uniq k-mers:\t{idx.n}")
    print("k-mer fraction covered:\t%f" % (idx.n / 4.0 ** idx.kmersize))
    print(f"inferred tax size:\t{idx.v_index}")
    # unique value lists
    ntax = 0
    v = 0
    values = idx.values
    while v < idx.v_index:
        ntax += 1
        v += int(values[v]) + 1
    print(f"# inferred taxids:\t{ntax}")
    if idx.mega:
        vidx = idx.exist[idx.exist != idx.null_index].astype(np.int64)
    else:
        vidx = idx.value_index.astype(np.int64)
    counts = values[vidx].astype(np.float64)
    n = idx.n
    mean = counts.sum() / n
    var = (counts * counts / n).sum() - mean * mean
    print("k-mer co-occurence var:\t%f" % var)
    print("k-mer co-occurence mean:\t%f" % mean)
    print("k-mer co-occurence min:\t%d" % int(counts.min()))
    print("k-mer co-occurence max:\t%d" % int(counts.max()))
    return 0


def cmp_main(argv: List[str]) -> int:
    """kma cmp (cmp.c): semantic equality of two indexes."""
    from ..index.format import load_comp_b
    t_db = s_db = None
    i = 0
    while i < len(argv):
        if argv[i] == "-t_db" and i + 1 < len(argv):
            t_db = argv[i + 1]
            i += 2
        elif argv[i] == "-s_db" and i + 1 < len(argv):
            s_db = argv[i + 1]
            i += 2
        else:
            i += 1
    if not t_db or not s_db:
        print("Insufficient number of agruments parsed.", file=sys.stderr)
        return 1
    print("# Comparing *.comp.b", file=sys.stderr)
    a = load_comp_b(t_db + ".comp.b")
    b = load_comp_b(s_db + ".comp.b")
    ok = a.n == b.n and a.kmersize == b.kmersize and a.mlen == b.mlen
    if ok:
        if a.mega:
            kmers = np.flatnonzero(a.exist != a.null_index).astype(np.uint64)
        else:
            kmers = a.key_index[: a.n].astype(np.uint64)
        for km in kmers.tolist():
            va = a.lookup(int(km))
            vb = b.lookup(int(km))
            if vb is None or not np.array_equal(
                    np.asarray(va, np.int64), np.asarray(vb, np.int64)):
                ok = False
                print(f"# Mismatch at k-mer {km}", file=sys.stderr)
                break
    print("# Hashmaps match." if ok else "# Hashmaps does not match.",
          file=sys.stderr)
    return 0


def merge_main(argv: List[str]) -> int:
    """kma merge (merge.c:1391-1674): union two indexes; template ids of
    the second are biased by the first's DB size."""
    from ..index.build import freeze
    from ..index.format import (dump_comp_b, dump_length_b, load_comp_b,
                                load_length_b, load_names)
    t_db = s_db = out = None
    i = 0
    while i < len(argv):
        if argv[i] == "-t_db" and i + 1 < len(argv):
            t_db = argv[i + 1]
            i += 2
        elif argv[i] == "-s_db" and i + 1 < len(argv):
            s_db = argv[i + 1]
            i += 2
        elif argv[i] == "-o" and i + 1 < len(argv):
            out = argv[i + 1]
            i += 2
        else:
            i += 1
    if not t_db or not s_db or not out:
        print("Too few arguments handed", file=sys.stderr)
        return 1
    a = load_comp_b(t_db + ".comp.b")
    b = load_comp_b(s_db + ".comp.b")
    if a.kmersize != b.kmersize or a.mlen != b.mlen or a.flag != b.flag:
        print("Indexes are incompatible", file=sys.stderr)
        return 1
    bias = a.db_size - 1
    table = {}
    # template sets of the two DBs are disjoint after biasing, so the
    # merge is per-key list concatenation -- one vectorized pass per DB
    # (merge.c:1391-1674 walks hashmaps; the old per-element `in` dedup
    # was quadratic in list length)
    for idx, offset in ((a, 0), (b, bias)):
        if idx.mega:
            kmers = np.flatnonzero(idx.exist != idx.null_index)
            offs = idx.exist[kmers].astype(np.int64)
        else:
            kmers = idx.key_index[: idx.n]
            offs = idx.value_index[: idx.n].astype(np.int64)
        values = np.asarray(idx.values, np.int64)
        cnts = values[offs]
        total = int(cnts.sum())
        starts = np.cumsum(cnts) - cnts
        pos = np.arange(total, dtype=np.int64) - np.repeat(starts, cnts)
        tpls = values[np.repeat(offs, cnts) + 1 + pos] + offset
        bounds = np.concatenate([[0], np.cumsum(cnts)]).astype(np.int64)
        tpls_l = tpls.tolist()
        for i, km in enumerate(kmers.tolist()):
            seg = tpls_l[bounds[i]: bounds[i + 1]]
            cur = table.get(km)
            if cur is None:
                table[km] = seg
            else:
                cur.extend(seg)
    merged = freeze(table, a.db_size + b.db_size - 1, a.kmersize, a.mlen,
                    mega=a.mega and b.mega, prefix_len=a.prefix_len,
                    prefix=a.prefix, flag=a.flag)
    with open(out + ".comp.b", "wb") as f:
        dump_comp_b(merged, f)
    la = load_length_b(t_db + ".length.b")
    lb = load_length_b(s_db + ".length.b")
    dump_length_b(np.concatenate([la, lb[1:]]), out + ".length.b")
    names = load_names(t_db + ".name") + load_names(s_db + ".name")
    with open(out + ".name", "wb") as f:
        f.write(b"\n".join(names) + b"\n")
    with open(out + ".seq.b", "wb") as fo:
        for src in (t_db, s_db):
            with open(src + ".seq.b", "rb") as fi:
                fo.write(fi.read())
    return 0


def shm_main(argv: List[str]) -> int:
    """kma shm (shm.c:419-700): pin DB files in shared memory for
    cross-run reuse.  The SysV segments become tmpfs copies under
    /dev/shm (index/shm.py); mapping runs pick them up via -shm."""
    from ..index.shm import shm_setup
    db = None
    lvl = 1
    destroy = False
    i = 0
    while i < len(argv):
        a = argv[i]
        if a == "-t_db" and i + 1 < len(argv):
            db = argv[i + 1]
            i += 2
            continue
        if a == "-shmLvl" and i + 1 < len(argv):
            lvl = int(argv[i + 1])
            if not lvl:
                print("Invalid shmLvl", file=sys.stderr)
                return 1
            i += 2
            continue
        if a == "-destroy":
            destroy = True
        elif a == "-shm-h":
            print("# Flags for shared memory, add them to combine them.")
            print("# %8d\t%s" % (1, "*.comp.b"))
            print("# %8d\t%s" % (2, "*.decon.comp.b"))
            print("# %8d\t%s" % (4, "*.length.b"))
            print("# %8d\t%s" % (8, "*.seq.b"))
            print("# %8d\t%s" % (16, "*.name"))
            return 0
        i += 1
    if db is None:
        print("Too few arguments handed", file=sys.stderr)
        return 1
    return shm_setup(db, lvl, destroy=destroy)


def _convert_length_014to015(path: str) -> int:
    """convertLength_014to015 (update.c:29-64): rotate the 3-block
    length file (or duplicate the single 0.14 block) in place.  Returns
    the sparse-prefix marker."""
    import struct
    with open(path, "rb") as f:
        raw = f.read()
    size = struct.unpack_from("<I", raw)[0]
    body = np.frombuffer(raw[4:], dtype="<i4")
    nread = len(body)
    if nread == size:
        return 0
    if nread == 2 * size:
        print("DB is old.", file=sys.stderr)
        print('It will only work for "-Sparse" mapping!!!',
              file=sys.stderr)
        out = np.concatenate([body[:size], body[: 2 * size]])
        marker = 0
    elif nread == 3 * size:
        out = np.concatenate([body[2 * size: 3 * size], body[: 2 * size]])
        marker = 1
    else:
        print("DB is malformed.", file=sys.stderr)
        raise SystemExit(1)
    with open(path, "r+b") as f:
        f.seek(4)
        f.write(out.astype("<i4").tobytes())
    return marker


def _hashmapkma_014to015(prefix_path: str, sparse_prefix: int) -> int:
    """hashMapKMA_014to015 (update.c:66-206): widen the 0.14 header's
    u32 n/v_index/null_index to u64, narrow values to u16 when DB_size
    allows, and replace seq-position key_index entries with k-mers for
    kmersize > 16."""
    import os as _os
    import struct
    bpath = prefix_path + ".b"
    if _os.path.exists(bpath):
        _os.remove(bpath)
    with open(prefix_path + ".comp.b", "rb") as f:
        DB_size, kmersize, prefix_len = struct.unpack("<III", f.read(12))
        prefix, size = struct.unpack("<QQ", f.read(16))
        n, seqsize, v_index, null_index = struct.unpack("<IIII",
                                                        f.read(16))
        mask = (1 << (2 * kmersize)) - 1
        if size < n or n == 0:
            print("DB is not of version 0.14", file=sys.stderr)
            raise SystemExit(1)
        exist = np.fromfile(f, dtype="<u4", count=size)
        mega = mask == size - 1
        seq = None
        if not mega:
            seq = np.fromfile(f, dtype="<u8", count=seqsize)
        values = np.fromfile(f, dtype="<u4", count=v_index)
        key_index = value_index = None
        if not mega:
            key_index = np.fromfile(f, dtype="<u4", count=n + 1)
            value_index = np.fromfile(f, dtype="<u4", count=n)
    if sparse_prefix and prefix_len == 0:
        prefix = 1
    with open(prefix_path + ".comp.b", "wb") as f:
        f.write(struct.pack("<III", DB_size, kmersize, prefix_len))
        f.write(struct.pack("<QQQQQ", prefix, size, n, v_index,
                            null_index))
        f.write(exist.astype("<u4").tobytes())
        if DB_size < 0xFFFF:
            f.write(values.astype("<u2").tobytes())
        else:
            f.write(values.astype("<u4").tobytes())
        if mega:
            return 0
        if kmersize <= 16:
            f.write(key_index.astype("<u4").tobytes())
        else:
            # entries were positions into seq; store the k-mers
            shift = np.uint64(64 - 2 * kmersize)
            pos = key_index.astype(np.int64)
            w = pos >> 5
            off = (pos & 31).astype(np.uint64)
            lo = seq[np.minimum(w, len(seq) - 1)]
            hi = seq[np.minimum(w + 1, len(seq) - 1)]
            km = np.where(
                off == 0, lo >> shift,
                ((lo << (np.uint64(2) * off))
                 | (hi >> (np.uint64(64) - np.uint64(2) * off)))
                >> shift)
            f.write(km.astype("<u8").tobytes())
        f.write(value_index.astype("<u4").tobytes())
    return 0


def update_main(argv: List[str]) -> int:
    """kma update (update.c:250-320): migrate a 0.14 index to the 0.15
    format in place (-v 1415), incl. a .decon companion."""
    import os as _os
    db = None
    version = 0
    i = 0
    while i < len(argv):
        if argv[i] == "-t_db" and i + 1 < len(argv):
            db = argv[i + 1]
            i += 2
        elif argv[i] == "-v" and i + 1 < len(argv):
            try:
                version = int(argv[i + 1])
            except ValueError:
                print(" Invalid version specified.", file=sys.stderr)
                raise SystemExit(1)
            i += 2
        else:
            i += 1
    if not db or not version:
        print("Insuffient amount of arguments handed!!!", file=sys.stderr)
        return 0
    if version != 1415:
        print("Invalid version swifting specified.", file=sys.stderr)
        print("Valid conversions:", file=sys.stderr)
        print("\t%d\t%.2f -> %.2f" % (1415, 0.14, 0.15), file=sys.stderr)
        return 2
    marker = _convert_length_014to015(db + ".length.b")
    rc = _hashmapkma_014to015(db, marker)
    if _os.path.exists(db + ".decon.b"):
        rc += _hashmapkma_014to015(db + ".decon", marker)
    if rc:
        print("Conversion error.", file=sys.stderr)
        raise SystemExit(1)
    return 0


def _dist_measures():
    """(flag bit, section name, ltd, int?, fmt, d(Ni, Nj, D)) rows in the
    reference's section order (dist.c:321-478, threadDist:692-768)."""
    import math

    def clamp01(d):
        return 0.0 if d < 0 else (1.0 if 1 < d else d)

    def clamp100(d):
        return 0.0 if d < 0 else (100.0 if 100 < d else d)

    return [
        (1, "k-mer distance", True, True, "\t%10d",
         lambda Ni, Nj, D: max(0, Ni + Nj - 2 * D)),
        (2, "shared k-mers", True, True, "\t%10d",
         lambda Ni, Nj, D: D),
        (4, "Query k-mer coverage [%]", False, False, "\t%10.6f",
         lambda Ni, Nj, D: clamp100(100.0 * D / Ni)),
        (8, "Template k-mer coverage [%]", False, False, "\t%10.6f",
         lambda Ni, Nj, D: clamp100(100.0 * D / Nj)),
        (16, "Avg. k-mer coverage [%]", True, False, "\t%10.6f",
         lambda Ni, Nj, D: clamp100(200.0 * D / (Ni + Nj))),
        (32, "Inverse Avg. k-mer coverage", True, False, "\t%10.6f",
         lambda Ni, Nj, D: clamp100(100.0 - 200.0 * D / (Ni + Nj))),
        (64, "Jaccard Distance", True, False, "\t%.8f",
         lambda Ni, Nj, D: clamp01(1.0 - D / (Ni + Nj - D))),
        (128, "Jaccard Similarity", True, False, "\t%.8f",
         lambda Ni, Nj, D: clamp01(D / (Ni + Nj - D))),
        (256, "Cosine distance", True, False, "\t%.8f",
         lambda Ni, Nj, D: clamp01(
             1.0 - D / (math.sqrt(Ni) * math.sqrt(Nj)))),
        (512, "Cosine similarity", True, False, "\t%.8f",
         lambda Ni, Nj, D: clamp01(D / (math.sqrt(Ni) * math.sqrt(Nj)))),
        (1024, "Szymkiewicz–Simpson similarity", True, False, "\t%.8f",
         lambda Ni, Nj, D: clamp01(D / min(Ni, Nj))),
        (2048, "Szymkiewicz–Simpson dissimilarity", True, False,
         "\t%.8f", lambda Ni, Nj, D: clamp01(1.0 - D / min(Ni, Nj))),
        (4096, "Chi-square distance", True, True, "\t%10d",
         lambda Ni, Nj, D: max(0, (Ni + Nj - 2 * D) ** 2 // (Ni + Nj))),
    ]


def dist_main(argv: List[str]) -> int:
    """kma dist (dist.c:895-1050): 13 k-mer distance/similarity measures
    over the DB's value lists, relaxed-Phylip output."""
    from ..index.format import load_comp_b, load_names
    db, rest = _parse_db_flag(argv)
    flag = 1
    fmt_flag = 1
    outpath = None
    disk = False
    tmpdir = None
    i = 0
    while i < len(rest):
        if rest[i] == "-fh":  # dist.c:937-942
            print("# Format flags output, add them to combine them.\n#")
            print("#%9d\t%s" % (1, "Relaxed Phylip"))
            print("#%9d\t%s" % (4,
                                "Include distance method(s) in phylip "
                                "file"))
            return 0
        if rest[i] == "-dh":  # dist.c:952-969
            print("# Distance / Similarity calculation methods, add them "
                  "to combine them:\n#")
            for b, nm in ((1, "k-mer hamming distance"),
                          (2, "Shared k-mers"),
                          (4, "k-mer query coverage"),
                          (8, "k-mer template coverage"),
                          (16, "k-mer avg. coverage"),
                          (32, "k-mer inv. avg. coverage"),
                          (64, "Jaccard distance"),
                          (128, "Jaccard similarity"),
                          (256, "Cosine distance"),
                          (512, "Cosine similarity"),
                          (1024, "Szymkiewicz–Simpson similarity"),
                          (2048, "Szymkiewicz–Simpson dissimilarity"),
                          (4096, "Chi-square distance")):
                print("#%9d\t%s" % (b, nm))
            print("#")
            return 0
        if rest[i] == "-d" and i + 1 < len(rest):
            flag = int(rest[i + 1])
            i += 2
        elif rest[i] == "-f" and i + 1 < len(rest):
            fmt_flag = int(rest[i + 1])
            i += 2
        elif rest[i] == "-o" and i + 1 < len(rest):
            outpath = rest[i + 1]
            i += 2
        elif rest[i] == "-m":  # dist.c:887: matrix on disk
            disk = True
            i += 1
        elif rest[i] == "-tmp" and i + 1 < len(rest):
            tmpdir = rest[i + 1]
            i += 2
        else:
            i += 1
    if db is None:
        print("Too few arguments handed", file=sys.stderr)
        return 1
    idx = load_comp_b(db + ".comp.b")
    names = [n.decode("latin1") for n in load_names(db + ".name")]
    n = idx.db_size - 1

    # kmerSimilarity (dist.c:171-232): one contribution per stored k-mer;
    # identical (deduplicated) lists batched by multiplicity
    values = idx.values
    if idx.mega:
        offs = idx.exist[idx.exist != idx.null_index].astype(np.int64)
    else:
        offs = idx.value_index[: idx.n].astype(np.int64)
    uoffs, counts = np.unique(offs, return_counts=True)
    N = np.zeros(n, dtype=np.int64)
    # packed lower-triangular shared-kmer matrix (ltdMatrix, matrix.c:24);
    # -m backs it with a disk mapping (ltdMatrix_minit, matrix.c:89) so
    # cgMLST-scale DBs stay within bounded RSS
    n_ltd = n * (n - 1) // 2
    if disk:
        import tempfile
        _mf = tempfile.NamedTemporaryFile(dir=tmpdir or None,
                                          prefix="kma_dist_ltd_")
        _mf.truncate(max(8, n_ltd * 8))
        S = np.memmap(_mf, dtype=np.int64, mode="r+",
                      shape=(max(1, n_ltd),))
    else:
        S = np.zeros(max(1, n_ltd), dtype=np.int64)

    def _ltd(ii, jj):
        # packed index for i > j
        return ii * (ii - 1) // 2 + jj

    for off, c in zip(uoffs.tolist(), counts.tolist()):
        cnt = int(values[off])
        lst = values[off + 1: off + 1 + cnt].astype(np.int64) - 1
        N[lst] += c
        if len(lst) > 1:
            ii, jj = np.meshgrid(lst, lst, indexing="ij")
            m = ii > jj
            np.add.at(S, _ltd(ii[m], jj[m]), c)

    parts: List[str] = []
    for bit, method, ltd, _isint, efmt, dfun in _dist_measures():
        if not (flag & bit):
            continue
        if fmt_flag & 4:
            # C's %-35s pads to 35 BYTES (the en-dash is 3 UTF-8 bytes)
            mb = method.encode("utf-8")
            parts.append("# " + method
                         + " " * max(0, 35 - len(mb)) + "\n")
        parts.append("%10d" % n)
        for ti in range(n):
            nm = names[ti]
            if fmt_flag & 1:
                parts.append("\n%s" % nm)
            else:  # %-10.10s truncates/pads in bytes
                nb = nm.encode("latin1")[:10]
                parts.append("\n" + nb.decode("latin1")
                             + " " * (10 - len(nb)))
            jend = ti if ltd else n
            Ni = int(N[ti])
            for j in range(jend):
                if not ltd and j == ti:
                    parts.append(efmt % 100.0)
                else:
                    D = int(S[_ltd(ti, j)]) if j < ti \
                        else int(S[_ltd(j, ti)])
                    d = dfun(Ni, int(N[j]), D)
                    parts.append(efmt % (0 if d < 0 else d))
        parts.append("\n")
        if not (fmt_flag & 1):
            # getPhySize budgets DB_size*11 name bytes but only
            # DB_size-1 are printed; the mmap leaves 11 NULs per section
            parts.append("\x00" * 11)
    data = "".join(parts)
    if outpath:
        with open(outpath, "w") as f:
            f.write(data)
    else:
        sys.stdout.write(data)
    return 0


def trim_main(argv: List[str]) -> int:
    """kma trim (trim.c:149-420): standalone read trimming.

    Emits fastq with the REAL trimmed quality slice (printTrimFsa,
    trim.c:28-68) -- fasta input falls back to headerless-qual fasta
    records.  Supports -i/-ipe/-int/-o/-ml/-xl/-mp/-mi/-eq/-5p/-3p."""
    from ..io.seq import (BASES, detect_format, parse_fasta, parse_fastq,
                          fsa_stat, phred_stat, sniff_phred_scale)
    inputs: List[str] = []
    pe_inputs: List[str] = []
    int_inputs: List[str] = []
    outfile = None
    min_phred = 20
    hardmask_q = 0
    min_q = 0
    five_clip = 0
    three_clip = 0
    min_len = 16
    max_len = 2147483647
    i = 0

    def _take_files(dest):
        nonlocal i
        i += 1
        n0 = len(dest)
        while i < len(argv) and (not argv[i].startswith("-")
                                 or argv[i] == "--"):
            dest.append(argv[i])
            i += 1
        if len(dest) == n0:
            print("No files were specified.", file=sys.stderr)
            raise SystemExit(1)

    while i < len(argv):
        a = argv[i]
        if a == "-i":
            _take_files(inputs)
            continue
        if a == "-ipe":
            _take_files(pe_inputs)
            continue
        if a == "-int":
            _take_files(int_inputs)
            continue
        if a == "-o":
            i += 1
            outfile = argv[i]
        elif a == "-mp":
            i += 1
            min_phred = int(argv[i])
        elif a == "-mi":
            i += 1
            hardmask_q = int(argv[i])
        elif a == "-eq":
            i += 1
            min_q = int(argv[i])
        elif a == "-5p":
            i += 1
            five_clip = int(argv[i])
        elif a == "-3p":
            i += 1
            three_clip = int(argv[i])
        elif a == "-ml":
            i += 1
            min_len = int(argv[i])
        elif a == "-xl":
            i += 1
            max_len = int(argv[i])
        i += 1
    if min_phred < hardmask_q:
        min_phred = hardmask_q
    if min_phred < min_q:
        min_phred = min_q

    out = open(outfile, "wb") if outfile else sys.stdout.buffer
    basemap = np.frombuffer(BASES, dtype=np.uint8)

    def emit(header, codes, qual, start: int, end: int) -> None:
        seq = basemap[codes[start:end]].tobytes()
        h = bytes(header)
        if qual is not None:
            out.write(h + b"\n" + seq + b"\n+\n"
                      + bytes(memoryview(qual)[start:end]) + b"\n")
        else:
            out.write(b">" + h[1:] + b"\n" + seq + b"\n")

    def trim_one(path):
        """yields (header, codes, qual, start, end) for survivors."""
        if detect_format(path) == "fastq":
            scale = sniff_phred_scale(path)
            print("# Phred scale:\t%d" % scale, file=sys.stderr)
            for header, codes, qual in parse_fastq(path):
                # fiveClip/threeClip are dead params in the reference's
                # phredStat (runinput.c:127, never read in the body)
                ln, start, end = phred_stat(
                    codes, qual, scale, min_phred, min_q, hardmask_q,
                    min_len, max_len)
                if min_len <= ln:
                    yield header, codes, qual, start, end
        else:
            for header, codes in parse_fasta(path):
                ln, start, end = fsa_stat(codes, min_len, max_len)
                if min_len <= ln:
                    yield header, codes, None, start, end

    for path in inputs + int_inputs:
        print("%s\t%s" % ("# Reading inputfile: ", path), file=sys.stderr)
        for rec in trim_one(path):
            emit(*rec)
    for fi in range(0, len(pe_inputs), 2):
        # both mates must survive (printTrimFsa_pair, trim.c:70-128)
        f1, f2 = pe_inputs[fi], pe_inputs[fi + 1]
        print("# Reading inputfile:\t%s %s" % (f1, f2), file=sys.stderr)
        for r1, r2 in zip(trim_one(f1), trim_one(f2)):
            emit(*r1)
            emit(*r2)
    if outfile:
        out.close()
    return 0
