"""Per-template alignment index (reference HashMapCCI, hashmapcci.c).

The reference hashes every forward-strand k-mer position of one template
into a murmur-addressed table with collision chains and re-extracts keys
from the 2-bit sequence on lookup.  Here the same queries are served from a
position-sorted dict: kmer -> ascending positions (1-based), with k-mer 0
(poly-A) excluded exactly like hashMapCCI_add (hashmapcci.c:414-417).
"""

from __future__ import annotations

from typing import Dict, Optional

import numpy as np

from ..io.seq import kmer_scan


class TemplateIndex:
    """Seed-position index over one template sequence."""

    __slots__ = ("len", "kmerindex", "codes", "_kmer_pos",
                 "native", "__weakref__")

    def __init__(self, codes: np.ndarray, kmersize: int):
        self.native = None  # native engine handle (align/native_aln.py)
        self.len = len(codes)
        self.kmerindex = kmersize
        self.codes = codes  # template codes 0..3 (Ns packed as A upstream)
        # built lazily: the native engine keeps its own index, so most
        # templates never need the Python dict (runs with the C++ aligner
        # only touch it through the pure-Python fallback paths)
        self._kmer_pos: Optional[Dict[int, np.ndarray]] = None

    @property
    def kmer_pos(self) -> Dict[int, np.ndarray]:
        if self._kmer_pos is None:
            kp: Dict[int, np.ndarray] = {}
            kmersize = self.kmerindex
            end = self.len - kmersize + 1
            if end > 0:
                kmers = kmer_scan(self.codes, kmersize)
                order = np.argsort(kmers, kind="stable")
                sk = kmers[order]
                boundaries = np.flatnonzero(
                    np.concatenate(([True], sk[1:] != sk[:-1])))
                starts = boundaries.tolist() + [len(sk)]
                for bi in range(len(boundaries)):
                    km = int(sk[starts[bi]])
                    if km == 0:
                        continue  # "undefined region" (hashmapcci.c:414)
                    pos = np.sort(order[starts[bi]: starts[bi + 1]]) + 1
                    kp[km] = pos.astype(np.int64)
            self._kmer_pos = kp
        return self._kmer_pos

    def get(self, kmer: int) -> int:
        """hashMapCCI_get semantics (hashmapcci.c:95-124): 0 = miss,
        +pos = unique position, -pos = duplicated (first position)."""
        pos = self.kmer_pos.get(kmer)
        if pos is None:
            return 0
        if len(pos) == 1:
            return int(pos[0])
        return -int(pos[0])

    def get_bound(self, kmer: int, lo: int, hi: int) -> int:
        """hashMapCCI_get_bound (hashmapcci.c:126-152): first position in
        (lo, hi) exclusive; sign marks duplication."""
        pos = self.kmer_pos.get(kmer)
        if pos is None:
            return 0
        if len(pos) == 1:
            p = int(pos[0])
            return p if lo < p < hi else 0
        for p in pos.tolist():
            if lo < p < hi:
                return -p
        return 0

    def dub_positions(self, kmer: int) -> np.ndarray:
        """All positions of a duplicated k-mer in chain order
        (getDubPos/getNextDubPos, hashmapcci.c:154-199)."""
        return self.kmer_pos[kmer]


def load_template_index(seq_path: str, template_lengths: np.ndarray,
                        seq_offsets: np.ndarray, template: int,
                        kmersize: int) -> TemplateIndex:
    """alignLoad_fly (hashmapcci.c:616-622): seek into .seq.b and build."""
    from ..io.seq import unpack_2bit
    t_len = int(template_lengths[template])
    nwords = (t_len >> 5) + 1
    with open(seq_path, "rb") as f:
        f.seek(int(seq_offsets[template]))
        words = np.fromfile(f, dtype="<u8", count=nwords)
    codes = unpack_2bit(words, t_len)
    return TemplateIndex(codes, kmersize)
