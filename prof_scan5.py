"""Is the axon pool content-caching executions? Perturb inputs and time."""
import sys
import time
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parent
sys.path.insert(0, str(REPO))
from bench import ensure_assets, BATCH  # noqa: E402

have_ref, db_prefix, reads = ensure_assets()
import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
from kma_tpu.config import Penalties  # noqa: E402
from kma_tpu.index.format import load_index  # noqa: E402
from kma_tpu.io.pipeline import iter_reads  # noqa: E402
from kma_tpu.mapping import scan_dense as sd  # noqa: E402

idx = load_index(db_prefix)
pen = Penalties()
pen.score_matrix()
dev = sd.DenseScanner(idx, pen, batch=BATCH)

rs = list(iter_reads([reads]))
L = max(len(r.codes) for r in rs)
codes = np.full((BATCH, L), 4, dtype=np.uint8)
lengths = np.zeros(BATCH, np.int32)
for i in range(BATCH):
    codes[i, : len(rs[i].codes)] = rs[i].codes
    lengths[i] = len(rs[i].codes)

both0 = np.concatenate([codes, sd.rc_host(codes, lengths)], axis=0)
l2 = np.concatenate([lengths, lengths])

f = lambda c, l: dev._call(c, l, 0, 32 * BATCH)

# warmup/compile
c0 = jax.device_put(both0)
ld = jax.device_put(l2)
t0 = time.time()
jax.block_until_ready(f(c0, ld))
print(f"first exec (incl compile): {(time.time()-t0):.1f} s")

# same content, new buffer
c1 = jax.device_put(both0.copy())
jax.block_until_ready(c1)
t0 = time.time()
jax.block_until_ready(f(c1, ld))
print(f"same content, new buffer: {(time.time()-t0)*1e3:.1f} ms")

# perturbed content
for rep in range(4):
    b = both0.copy()
    b[rep, 0] = (b[rep, 0] + 1) % 4
    c2 = jax.device_put(b)
    jax.block_until_ready(c2)
    t0 = time.time()
    jax.block_until_ready(f(c2, ld))
    print(f"perturbed content rep {rep}: {(time.time()-t0)*1e3:.1f} ms")

# identical again
t0 = time.time()
jax.block_until_ready(f(c0, ld))
print(f"identical repeat: {(time.time()-t0)*1e3:.1f} ms")
