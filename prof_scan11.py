"""Bisect the back half: pallas run loop / strand epilogue / emit pack."""
import sys, time
from pathlib import Path
import numpy as np
import jax, jax.numpy as jnp
sys.path.insert(0, str(Path(__file__).resolve().parent))
from bench import ensure_assets
_, db_prefix, reads = ensure_assets()
from kma_tpu.index.format import load_index
from kma_tpu.config import Penalties
from kma_tpu.io.pipeline import iter_reads
from kma_tpu.mapping import scan_dense as sd
from kma_tpu.mapping.scan_jax import ScanParams

BATCH = 4096
idx = load_index(db_prefix)
pen = Penalties(); pen.score_matrix()
dev = sd.DenseScanner(idx, pen, batch=BATCH)
d = dev.didx
rs = list(iter_reads([reads]))
L = max(len(r.codes) for r in rs); N = len(rs)
codes = np.full((N, L), 4, np.uint8); lengths = np.zeros(N, np.int32)
for i in range(N):
    codes[i, :len(rs[i].codes)] = rs[i].codes; lengths[i] = len(rs[i].codes)
sp = dev._sparams(L, 0)
p = ScanParams(*sp)

STAGE = None
def mk(stage):
    def f(codes, lengths, exist, kv, bits, bits_t):
        G = codes.shape[0]; Lc = codes.shape[1]
        rc = jnp.flip(jnp.where(codes < 4, 3 - codes, codes), axis=-1)
        codes2 = jnp.concatenate([codes, rc], axis=0)
        lens2 = jnp.concatenate([lengths, jax.lax.full_like(lengths, Lc)], axis=0)
        starts2 = jnp.concatenate([jax.lax.full_like(lengths, 0), np.int32(Lc) - lengths], axis=0)
        rc_rowsg = np.arange(2*G, dtype=np.int32) >= G
        if stage == "scan_only":
            # monkeypatch epilogue to raw sums
            orig = sd._strand_epilogue
            def cheap(score, first, SBIG, p2, t_pad, run_ov, proxi_frac=None):
                bs = jnp.max(score, axis=-1).astype(jnp.int32)
                z = jnp.zeros((score.shape[0], min(p2.best_cap, t_pad)), jnp.int32)
                nb = jnp.sum(first < SBIG, axis=-1)
                return bs, z, nb, run_ov, nb > 10**9, None
            sd._strand_epilogue = cheap
            try:
                out = sd._dense_strand_scan(codes2, lens2, (exist, kv), bits, bits_t, p,
                                            rc_rowsg, mega=d.mega, size=d.size,
                                            max_probe=d.max_probe, t_pad=d.t_pad,
                                            n_lists=d.n_lists, proxi_frac=None,
                                            pallas_mode=dev.pallas_mode, starts=starts2)
            finally:
                sd._strand_epilogue = orig
            return jnp.sum(out[0]) + jnp.sum(out[2])
        out = sd._dense_strand_scan(codes2, lens2, (exist, kv), bits, bits_t, p,
                                    rc_rowsg, mega=d.mega, size=d.size,
                                    max_probe=d.max_probe, t_pad=d.t_pad,
                                    n_lists=d.n_lists, proxi_frac=None,
                                    pallas_mode=dev.pallas_mode, starts=starts2)
        bestScore, tids, n_best, run_ov, tie_ov, _ = out
        if stage == "epilogue":
            return jnp.sum(bestScore) + jnp.sum(tids) + jnp.sum(n_best)
        meta, flat = sd._emit_pack(bestScore, tids, n_best, run_ov, tie_ov, G, p.k,
                                   32*BATCH, dev.small_ids)
        return jnp.sum(meta) + jnp.sum(flat.astype(jnp.int32))
    return jax.jit(f)

bats = []
for o in range(0, N, BATCH):
    cb = codes[o:o+BATCH]; lb = lengths[o:o+BATCH]
    if len(cb) < BATCH:
        cb = np.vstack([cb, np.full((BATCH-len(cb), L), 4, np.uint8)])
        lb = np.concatenate([lb, np.zeros(BATCH-len(lb), np.int32)])
    bats.append((jnp.asarray(cb), jnp.asarray(lb)))
ctrl = jax.jit(lambda c, l, e, kv, b, bt: jnp.sum(c.astype(jnp.int32)) + jnp.sum(l))
for name in ["ctrl", "scan_only", "epilogue", "emit"]:
    f = ctrl if name == "ctrl" else mk(name)
    jax.device_get(f(*bats[0], d.exist, d.kv, d.bits, d.bits_t))
    t0=time.time()
    for c, l in bats[1:]:
        jax.device_get(f(c, l, d.exist, d.kv, d.bits, d.bits_t))
    print(f"{name}: {(time.time()-t0)/len(bats[1:])*1e3:.1f} ms/batch")
