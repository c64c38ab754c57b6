"""Multi-chip sharding of the mapping step (jax.sharding + shard_map).

Design (SURVEY.md §2.11: the spltDB map/reduce is the blueprint):

- mesh ('data', 'db'): read batches are sharded over 'data'; the hash
  table's `exist` array (the big one) is sharded by hash-slot range over
  'db', record/value arrays replicated (they are comparatively small).
- every db-shard resolves the k-mer windows whose bucket falls in its slot
  range and contributes the values-offset, missing lanes stay -1; a
  `lax.pmax` over 'db' merges shard results (each bucket lives on exactly
  one shard) — the ICI all-reduce standing in for the reference's
  shared-memory lookups (shm.c) and spltDB anker merge (spltdb.c:625).
- the scoring scan then runs data-parallel on merged hits.
"""

from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental.shard_map import shard_map
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..mapping.device_index import DeviceIndex
from ..mapping.scan_jax import ScanParams, _strand_scan, rc_batch


def make_mesh(n_data: int, n_db: int, devices=None) -> Mesh:
    """Build a ('data','db') mesh; falls back to the virtual-CPU backend
    when the default platform has too few devices."""
    need = n_data * n_db
    if devices is None:
        devices = jax.devices()
        if len(devices) < need:
            try:
                cpus = jax.devices("cpu")
                if len(cpus) >= need:
                    devices = cpus
            except RuntimeError:
                pass
    devs = np.array(devices[:need]).reshape(n_data, n_db)
    return Mesh(devs, axis_names=("data", "db"))


def _local_lookup_cuckoo(kv_l, kmers, size, n_db: int):
    """Cuckoo lookup over the row-sharded [2*size, 2] table: each db
    shard resolves the probes landing in its row range, a pmax merges."""
    from ..mapping.device_index import MURMUR_SEED2, murmur32
    d = jax.lax.axis_index("db")
    chunk = (2 * size) // n_db
    lo = (d * chunk).astype(jnp.int32)
    km = kmers.astype(jnp.int32)
    mask = jnp.uint32(size - 1)
    b1 = (murmur32(kmers) & mask).astype(jnp.int32)
    b2 = (murmur32(kmers, MURMUR_SEED2) & mask).astype(jnp.int32) \
        + jnp.int32(size)

    def probe(b):
        mine = (b >= lo) & (b < lo + chunk)
        e = kv_l[jnp.where(mine, b - lo, 0)]
        return jnp.where(mine & (e[..., 0] == km) & (e[..., 1] >= 0),
                         e[..., 1], jnp.int32(-1))

    return jnp.maximum(probe(b1), probe(b2))


def _local_lookup(exist_l, kv, kmers, size, max_probe: int, n_db: int):
    """Lookup restricted to this shard's hash-slot range (kv replicated)."""
    from ..mapping.device_index import murmur32
    d = jax.lax.axis_index("db")
    chunk = size // n_db
    bucket = murmur32(kmers) & jnp.uint32(size - 1)
    lo = (d * chunk).astype(jnp.uint32)
    mine = (bucket >= lo) & (bucket < lo + jnp.uint32(chunk))
    local_bucket = jnp.where(mine, bucket - lo, 0).astype(jnp.int32)
    pos0 = exist_l[local_bucket]
    km_i32 = kmers.astype(jnp.int32)
    done = ~mine | (pos0 < 0)
    pos0 = jnp.where(pos0 < 0, 0, pos0)
    found_pos = jnp.full(kmers.shape, -1, dtype=jnp.int32)
    for step in range(max_probe):
        pos = pos0 + step
        key = kv[pos, 0]
        hit = ~done & (key == km_i32)
        found_pos = jnp.where(hit, pos, found_pos)
        if step + 1 < max_probe:
            same_bucket = (murmur32(key.astype(jnp.uint32))
                           & jnp.uint32(size - 1)) == bucket
            done = done | hit | ~same_bucket
    ok = found_pos >= 0
    return jnp.where(ok, kv[jnp.where(ok, found_pos, 0), 1], -1)


def sharded_scan_step(mesh: Mesh, didx: DeviceIndex, params: Tuple):
    """Build the pjit-ed multi-chip mapping step.

    Returns (step_fn, place_fn) where place_fn shards host arrays onto the
    mesh and step_fn runs one mapping step (both strands, best-set
    extraction) with data+db parallelism.
    """
    (k, mlen, M, MM, U, W1, max_list, exhaustive, mega, size, null_index,
     flag, max_probe, run_cap, pair_cap, best_cap, small_ids) = params
    n_db = mesh.shape["db"]
    cuckoo = max_probe == 0
    assert (2 * size if cuckoo else size) % n_db == 0
    p = ScanParams(k=k, mlen=mlen, M=M, MM=MM, U=U, W1=W1,
                   max_list=max_list, exhaustive=exhaustive,
                   max_probe=max_probe, run_cap=run_cap, pair_cap=pair_cap,
                   best_cap=best_cap, small_ids=small_ids)

    def scan_local(exist_l, kv_l, values, codes, lengths):
        def lookup(kmers):
            if cuckoo:
                local = _local_lookup_cuckoo(kv_l, kmers, size, n_db)
            else:
                local = _local_lookup(exist_l, kv_l, kmers, size,
                                      max_probe, n_db)
            return jax.lax.pmax(local, "db")

        B = codes.shape[0]
        both = jnp.concatenate([codes, rc_batch(codes, lengths)], axis=0)
        lens2 = jnp.concatenate([lengths, lengths], axis=0)
        rc_rows = jnp.arange(2 * B) >= B
        b, o, n, ov, _np = _strand_scan(both, lens2, lookup, values, p,
                                        rc_rows)
        v = jnp.arange(o.shape[1])[None, :] < n[:, None]
        return (b[:B], o[:B], v[:B], n[:B], b[B:], o[B:], v[B:], n[B:],
                ov[:B] | ov[B:])

    kv_spec = P("db", None) if cuckoo else P(None)
    exist_spec = P(None) if cuckoo else P("db")
    in_specs = (exist_spec, kv_spec, P(None), P("data", None), P("data"))
    out_specs = (P("data"), P("data", None), P("data", None), P("data"),
                 P("data"), P("data", None), P("data", None), P("data"),
                 P("data"))
    fn = shard_map(scan_local, mesh=mesh, in_specs=in_specs,
                   out_specs=out_specs, check_rep=False)
    step = jax.jit(fn)

    def place(codes: np.ndarray, lengths: np.ndarray):
        rep = NamedSharding(mesh, P(None))
        exist = jax.device_put(
            didx.exist, rep if cuckoo else NamedSharding(mesh, P("db")))
        kv = jax.device_put(
            didx.kv,
            NamedSharding(mesh, P("db", None)) if cuckoo else rep)
        args = (exist, kv,
                jax.device_put(didx.values, rep),
                jax.device_put(jnp.asarray(codes),
                               NamedSharding(mesh, P("data", None))),
                jax.device_put(jnp.asarray(lengths),
                               NamedSharding(mesh, P("data"))))
        return args

    return step, place


def sharded_score_reduce(mesh: Mesh, db_size: int):
    """ConClave input all-reduce: each data shard scatter-adds its reads'
    best scores onto its local per-template accumulator, a psum over
    'data' yields the global alignment_scores (the multi-host analog of
    updatescores.c:217-281 + the spltDB reducer sums, spltdb.c:900)."""

    def local(best, tids, valid):
        contrib = jnp.where(valid, best[:, None], 0).astype(jnp.int32)
        idx = jnp.where(valid, jnp.abs(tids), db_size).reshape(-1)
        scores = jnp.zeros(db_size, jnp.int32).at[idx].add(
            contrib.reshape(-1), mode="drop")
        return jax.lax.psum(scores, "data")

    fn = shard_map(local, mesh=mesh,
                   in_specs=(P("data"), P("data", None), P("data", None)),
                   out_specs=P(None), check_rep=False)
    return jax.jit(fn)
