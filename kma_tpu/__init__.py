"""kma_tpu — a TPU-native re-implementation of the capabilities of KMA.

KMA (k-mer alignment, genomicepidemiology/kma) maps raw sequencing reads
against highly redundant reference databases with a seed-and-extend aligner
and resolves multi-mapping reads with the ConClave voting scheme.

This package re-builds that capability TPU-first:

- the frozen k-mer index (reference hashmapkma.c) becomes a device-resident
  open-addressing table queried with batched gathers,
- per-read candidate scoring (reference savekmers.c) becomes vectorised
  scans over read batches,
- the banded Needleman-Wunsch extension (reference nw.c) becomes a
  row-scan DP with an associative max-plus scan per row (Pallas / XLA),
- ConClave and consensus assembly (reference conclave.c / assembly.c)
  become segment-sum reductions over candidate tables.

Host-side NumPy reference paths reproduce the reference binary's observable
behaviour bit-for-bit (the parity target is the reference at `-t 1`), and the
JAX paths are validated against them.
"""

__version__ = "0.1.0"
KMA_COMPAT_VERSION = "1.5.1"  # reference version we mirror (version.h:20)
