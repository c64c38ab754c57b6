"""Multi-host mapping runtime: jax.distributed over the 'data' axis.

Replaces the reference's single-host pthread fan-out (kmers.c:186-230,
runkma.c:293-360) with a process-per-host SPMD layout:

- every process runs the FULL local pipeline (device scan -> native
  alignment -> spool records) over its round-robin shard of the reads
  (run_kma(shard=(pid, n), collect=True)),
- `alignment_scores` / `uniq_alignment_scores` are summed across
  processes (the ConClave inputs are additive, updatescores.c:217-281)
  via a jax.distributed all-gather,
- spool records are gathered to every process and merge-sorted by their
  GLOBAL read ordinal, restoring the reference's input-stream ConClave
  order exactly (the spltDB reducer merge, spltdb.c:625-1290, lifted to
  hosts), after which rank 0 runs ConClave + assembly + output.

Outputs are therefore bit-identical for ANY process count -- asserted by
tests/test_multihost.py.
"""

from __future__ import annotations

import pickle
import sys
from typing import List, Optional

import numpy as np


def _allgather_blob(blob: bytes) -> List[bytes]:
    """All-gather one ragged byte blob per process."""
    import jax
    from jax.experimental import multihost_utils as mh

    n = np.frombuffer(blob, dtype=np.uint8)
    sizes = mh.process_allgather(np.array([len(n)], np.int64))
    cap = int(sizes.max())
    padded = np.zeros(cap, np.uint8)
    padded[: len(n)] = n
    gathered = mh.process_allgather(padded)
    return [gathered[p, : int(sizes[p, 0])].tobytes()
            for p in range(gathered.shape[0])]


def run_kma_multihost(db_prefix: str, output_prefix: str,
                      input_files: List[str], cfg, exe_cmd: str,
                      coordinator: str, num_processes: int,
                      process_id: int,
                      pe_files: Optional[List[str]] = None,
                      int_files: Optional[List[str]] = None) -> int:
    import jax
    from jax.experimental import multihost_utils as mh

    from ..pipeline import _conclave_and_output, _sam_init_single, run_kma

    jax.distributed.initialize(coordinator_address=coordinator,
                               num_processes=num_processes,
                               process_id=process_id)

    # local shard: scan + align my fragments
    part = run_kma(db_prefix, output_prefix, input_files, cfg,
                   exe_cmd=exe_cmd, pe_files=pe_files,
                   int_files=int_files,
                   shard=(process_id, num_processes), collect=True)

    # global ConClave inputs: element-wise sums over the data axis
    g = mh.process_allgather(np.asarray(part["alignment_scores"]))
    alignment_scores = g.sum(axis=0)
    g = mh.process_allgather(np.asarray(part["uniq_alignment_scores"]))
    uniq_alignment_scores = g.sum(axis=0)
    g = mh.process_allgather(np.array([part["tot_frags"]], np.int64))
    tot_frags = int(g.sum())

    # candidate-record merge: gather + order by global read ordinal
    blob = pickle.dumps((part["rec_ords"], part["records"]),
                        protocol=pickle.HIGHEST_PROTOCOL)
    blobs = _allgather_blob(blob)
    print("# multihost: %d processes, %d local / %d total fragments"
          % (num_processes, part["tot_frags"], tot_frags),
          file=sys.stderr)

    if process_id != 0:
        return 0

    ords: List[int] = []
    records = []
    for b in blobs:
        o, r = pickle.loads(b)
        ords.extend(o)
        records.extend(r)
    order = np.argsort(np.asarray(ords, np.int64), kind="stable")
    records = [records[i] for i in order]

    names = part["names"]
    return _conclave_and_output(
        records, part["db_size"], part["template_lengths"],
        lambda t: names[t - 1].decode("latin1"), part["store"],
        alignment_scores, uniq_alignment_scores, cfg, part["rew"],
        part["points"], part["kmersize"], db_prefix, output_prefix,
        exe_cmd, tot_frags,
        sam_init=lambda out: _sam_init_single(
            names, part["template_lengths"], exe_cmd, out))
