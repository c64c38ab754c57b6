"""Exact reader/writer for the reference on-disk index format.

Files produced by `kma index` (reference makeindex.c / compress.c /
hashmapkma.c):

- ``<db>.comp.b``   frozen k-mer hashmap (hashMapKMA_dump, hashmapkma.c:722-812)
- ``<db>.seq.b``    2-bit template sequences (updateAnnots, updateindex.c:172)
- ``<db>.length.b`` [DB_size, lengths...] (makeindex.c:263-273)
- ``<db>.name``     newline separated template names (makeindex.c:232-235)

Layout of .comp.b (header loadPrefix hashmapkma.c:180-262):
  u32 DB_size, u32 mlen, u32 prefix_len, u64 prefix,
  u64 size, u64 n, u64 v_index, u64 null_index,
  exist[size]        (u32 if (megaMap ? v_index<=U32MAX : n<=U32MAX) else u64)
  values[v_index]    (u16 if DB_size < 65535 else u32)
  [non-megaMap only:]
  key_index[n+1]     (u32 if mlen<=16 else u64)
  value_index[n]     (u32 if v_index<U32MAX else u64)
  u32 kmersize, u32 flag

megaMap (size-1 == mask): exist[kmer] holds the v_index offset directly,
null_index == 1 (compress.c:804).  Hashmap: exist[hash] holds the record
index into key_index/value_index, records grouped contiguously per bucket
(hashMap_getGlobal probes forward while keys still hash to the bucket,
hashmapkma.c:149-178); null_index == n.
"""

from __future__ import annotations

import dataclasses
import struct
from typing import BinaryIO, List, Optional

import numpy as np

U32MAX = 0xFFFFFFFF
U16MAX = 0xFFFF  # USHRT_MAX


def murmur(x: np.ndarray | int):
    """The reference's hash (stdstat.h:22):
    index = (3323198485 ^ kmer) * 0x5bd1e995; index ^= index >> 15 (on u64).
    """
    if isinstance(x, (int, np.integer)):
        v = (int(x) ^ 3323198485) * 0x5BD1E995 & 0xFFFFFFFFFFFFFFFF
        return v ^ (v >> 15)
    v = (x ^ np.uint64(3323198485)) * np.uint64(0x5BD1E995)
    return v ^ (v >> np.uint64(15))


@dataclasses.dataclass
class KmaIndex:
    """In-memory image of a frozen KMA database."""

    db_size: int              # number of templates + 1 (ids are 1-based)
    mlen: int                 # stored k-mer (minimizer) length
    prefix_len: int
    prefix: int
    kmersize: int
    flag: int                 # bit1 = homopolymer compression, bit2 = minimizer
    size: int                 # hash table size (2^b), or mask+1 for megaMap
    null_index: int
    exist: np.ndarray         # per format above
    values: np.ndarray        # concatenated [n, t1..tn] lists
    key_index: Optional[np.ndarray]    # None for megaMap
    value_index: Optional[np.ndarray]  # None for megaMap

    # companion files
    template_lengths: Optional[np.ndarray] = None  # .length.b ([0] = kmerindex)
    names: Optional[List[bytes]] = None            # .name lines
    seq_path: Optional[str] = None                 # .seq.b path
    n_stored: Optional[int] = None   # header n (live k-mers; megaMap only)

    @property
    def mask(self) -> int:
        return (1 << (2 * self.mlen)) - 1

    @property
    def mega(self) -> bool:
        return (self.size - 1) == self.mask

    @property
    def n(self) -> int:
        if self.key_index is not None:
            return len(self.key_index) - 1
        return self.n_stored or 0

    @property
    def v_index(self) -> int:
        return len(self.values)

    # --- queries (host reference path) -----------------------------------

    def lookup(self, kmer: int) -> Optional[np.ndarray]:
        """Template list for one k-mer or None (hashMap_getGlobal /
        megaMap_getGlobal, hashmapkma.c:149-273). Returns values slice
        [count, t1..tcount] view."""
        if self.mega:
            pos = int(self.exist[kmer & self.mask])
            if pos == self.null_index:
                return None
            cnt = int(self.values[pos])
            return self.values[pos: pos + cnt + 1]
        smask = self.size - 1
        kpos = (murmur(kmer) & smask) if self.flag else (kmer & smask)
        pos = int(self.exist[kpos])
        if pos == self.null_index:
            return None
        key_index = self.key_index
        while True:
            km = int(key_index[pos])
            if km == kmer:
                vi = int(self.value_index[pos])
                cnt = int(self.values[vi])
                return self.values[vi: vi + cnt + 1]
            h = murmur(km) if self.flag else km
            if kpos != (h & smask):
                return None
            pos += 1


def _exist_dtype(mega: bool, n: int, v_index: int) -> np.dtype:
    if mega:
        return np.dtype("<u4") if v_index <= U32MAX else np.dtype("<u8")
    return np.dtype("<u4") if n <= U32MAX else np.dtype("<u8")


def _values_dtype(db_size: int) -> np.dtype:
    return np.dtype("<u2") if db_size < U16MAX else np.dtype("<u4")


def load_comp_b(path: str, mmap: bool = False, shm: int = 0) -> KmaIndex:
    """Load a .comp.b file (hashMapKMA_load, hashmapkma.c:275-455).

    mmap=True demand-pages the arrays (hashMapKMAmmap, kmmap.c:33)
    instead of copying them; shm!=0 prefers the tmpfs copy pinned by
    `kma shm` (shm.c semantics, see index/shm.py)."""
    from .shm import resolve
    path = resolve(path, shm)

    with open(path, "rb") as f:
        hdr = f.read(3 * 4 + 5 * 8)
        db_size, mlen, prefix_len = struct.unpack("<III", hdr[:12])
        prefix, size, n, v_index, null_index = struct.unpack("<QQQQQ", hdr[12:])
        mask = (1 << (2 * mlen)) - 1
        mega = (size - 1) == mask

        off = len(hdr)

        def arr(dtype, count):
            nonlocal off
            dt = np.dtype(dtype)
            if mmap:
                a = np.memmap(path, dtype=dt, mode="r", offset=off,
                              shape=(count,))
            else:
                f.seek(off)
                a = np.fromfile(f, dtype=dt, count=count)
            off += dt.itemsize * count
            return a

        exist = arr(_exist_dtype(mega, n, v_index), size)
        values = arr(_values_dtype(db_size), v_index)
        if mega:
            key_index = value_index = None
        else:
            kd = np.dtype("<u4") if mlen <= 16 else np.dtype("<u8")
            key_index = arr(kd, n + 1)
            vd = np.dtype("<u4") if v_index < U32MAX else np.dtype("<u8")
            value_index = arr(vd, n)
        f.seek(off)
        trailer = f.read(8)
        if len(trailer) == 8:
            kmersize, flag = struct.unpack("<II", trailer)
        else:
            kmersize, flag = mlen, 0
    return KmaIndex(db_size=db_size, mlen=mlen, prefix_len=prefix_len,
                    prefix=prefix, kmersize=kmersize, flag=flag, size=size,
                    null_index=null_index, exist=exist, values=values,
                    key_index=key_index, value_index=value_index,
                    n_stored=int(n))


def dump_comp_b(idx: KmaIndex, f: BinaryIO) -> None:
    """Write .comp.b (hashMapKMA_dump / megaMapKMA_dump, hashmapkma.c:722-812)."""
    f.write(struct.pack("<III", idx.db_size, idx.mlen, idx.prefix_len))
    f.write(struct.pack("<QQQQQ", idx.prefix, idx.size, idx.n, idx.v_index,
                        idx.null_index))
    exist_dt = _exist_dtype(idx.mega, idx.n, idx.v_index)
    idx.exist.astype(exist_dt).tofile(f)
    idx.values.astype(_values_dtype(idx.db_size)).tofile(f)
    if not idx.mega:
        kd = np.dtype("<u4") if idx.mlen <= 16 else np.dtype("<u8")
        idx.key_index.astype(kd).tofile(f)
        vd = np.dtype("<u4") if idx.v_index < U32MAX else np.dtype("<u8")
        idx.value_index.astype(vd).tofile(f)
    f.write(struct.pack("<II", idx.kmersize, idx.flag))


def load_length_b(path: str, shm: int = 0) -> np.ndarray:
    """.length.b: i32 DB_size then u32 lengths[DB_size]; lengths[0] is the
    kmerindex (makeindex.c:263-273, runkma.c:162)."""
    from .shm import resolve
    path = resolve(path, shm)
    with open(path, "rb") as f:
        (db_size,) = struct.unpack("<i", f.read(4))
        return np.fromfile(f, dtype="<u4", count=db_size)


def dump_length_b(lengths: np.ndarray, path: str) -> None:
    with open(path, "wb") as f:
        f.write(struct.pack("<i", len(lengths)))
        lengths.astype("<u4").tofile(f)


def load_names(path: str, shm: int = 0) -> List[bytes]:
    """.name lines; template t (1-based) is names[t-1]."""
    from .shm import resolve
    path = resolve(path, shm)
    with open(path, "rb") as f:
        return f.read().splitlines()


def load_index(prefix: str, mmap: bool = False, shm: int = 0) -> KmaIndex:
    """Load all DB files by prefix."""
    from .shm import resolve
    idx = load_comp_b(prefix + ".comp.b", mmap=mmap, shm=shm)
    idx.template_lengths = load_length_b(prefix + ".length.b", shm=shm)
    idx.names = load_names(prefix + ".name", shm=shm)
    idx.seq_path = resolve(prefix + ".seq.b", shm & 8)
    return idx


def load_template_seq(seq_path: str, template_lengths: np.ndarray,
                      template: int) -> np.ndarray:
    """Read one template's 2-bit words from .seq.b.

    Template t occupies ((len>>5)+1) u64 words at the cumulative offset of
    its predecessors (seq_indexes, runkma.c:216-220).
    """
    offset = 0
    for t in range(1, template):
        offset = offset + ((int(template_lengths[t]) >> 5) + 1) * 8
    nwords = (int(template_lengths[template]) >> 5) + 1
    with open(seq_path, "rb") as f:
        f.seek(offset)
        return np.fromfile(f, dtype="<u8", count=nwords)


def seq_offsets(template_lengths: np.ndarray) -> np.ndarray:
    """Byte offset of each template in .seq.b (runkma.c:216-220)."""
    db_size = len(template_lengths)
    off = np.zeros(db_size, dtype=np.int64)
    for t in range(2, db_size):
        off[t] = off[t - 1] + ((int(template_lengths[t - 1]) >> 5) + 1) * 8
    return off
