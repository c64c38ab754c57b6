"""Fuzz kma_tpu.align.kma_aln against the reference oracle binary."""
import numpy as np, struct, subprocess, sys
from kma_tpu.align.cci import TemplateIndex
from kma_tpu.align.kma_aln import (kma_align, anker_rc_comp, Penalty, Points,
                                   set_preseed_exhaustive)
from kma_tpu.config import Penalties
from kma_tpu.io.seq import rc_codes

def run(n_trials=300, seed=11, oracle='.ref_build/kma_oracle'):
    rng = np.random.default_rng(seed)
    pen = Penalties(); dmat = pen.score_matrix()
    rew = Penalty(M=pen.M, MM=pen.MM, U=pen.U, W1=pen.W1, Wl=pen.Wl, d=dmat)
    set_preseed_exhaustive(0)
    cases = []
    for trial in range(n_trials):
        k = 16
        t_len = int(rng.integers(60, 400))
        t_codes = rng.integers(0, 4, t_len).astype(np.uint8)
        q_len = int(rng.integers(40, min(200, t_len+30)))
        s = int(rng.integers(0, max(1, t_len - q_len + 1)))
        q = t_codes[s:s+q_len].copy(); q_len = len(q)
        ne = rng.binomial(q_len, 0.03)
        pos = rng.integers(0, q_len, ne); q[pos] = rng.integers(0, 4, ne)
        if rng.random() < 0.3 and q_len > 30:
            dp = int(rng.integers(5, q_len-5)); dl = int(rng.integers(1,4))
            q = np.concatenate([q[:dp], q[dp+dl:]]); q_len = len(q)
        if rng.random() < 0.2:
            npos_ins = rng.integers(0, q_len, rng.integers(1,3)); q[npos_ins] = 4
        mode = int(rng.choice([0,1,2]))
        if mode == 2 and rng.random() < 0.5:
            q = rc_codes(q)
        cases.append((mode, t_codes, q, 0, len(q), k))

    inp = struct.pack('<i', len(cases))
    for (mode, tc, qc, qs, qe, k) in cases:
        npos = np.flatnonzero(qc == 4).astype(np.int32)
        inp += struct.pack('<9i', mode, len(tc), len(qc), qs, qe, k, 0, 1, len(npos))
        inp += tc.tobytes() + qc.tobytes() + npos.tobytes()
    r = subprocess.run([oracle], input=inp, capture_output=True)
    assert r.returncode == 0, (r.returncode, r.stderr)
    out = r.stdout; off = 0
    fails = 0
    for ci, (mode, tc, qc, qs, qe, k) in enumerate(cases):
        tidx = TemplateIndex(tc, k)
        npos = np.flatnonzero(qc == 4).astype(np.int64)
        pts = Points()
        ok = True
        if mode == 0:
            vals = struct.unpack_from('<7i', out, off); off += 28
            st, _, _ = kma_align(tidx, qc, len(qc), qs, qe, 0, 0, 0, rew, pts, k,
                                 traceback=False, n_positions=npos)
            mine = (st.score, st.pos, st.len, st.match, st.tGaps, st.qGaps)
            ok = mine == vals[:6]
            if not ok and fails < 3: print("FAIL score", ci, "ref", vals[:6], "my", mine)
        elif mode == 1:
            vals = struct.unpack_from('<7i', out, off); off += 28
            se = struct.unpack_from('<2i', out, off); off += 8
            (alen,) = struct.unpack_from('<i', out, off); off += 4
            rt = out[off:off+alen]; off += alen
            rs = out[off:off+alen]; off += alen
            rq = out[off:off+alen]; off += alen
            st, al, mapq = kma_align(tidx, qc, len(qc), qs, qe, 0, len(tc), 0,
                                     rew, pts, k, traceback=True)
            mine = (st.score, st.pos, st.len, st.match, st.tGaps, st.qGaps, mapq)
            ok = mine == vals
            if ok and st.score:
                ok = (al.t[:st.len].tobytes() == rt and al.q[:st.len].tobytes() == rq
                      and al.s[:st.len].tobytes() == rs and al.start == se[0] and al.end == se[1])
            if not ok and fails < 3:
                print("FAIL KMA", ci, "ref", vals, se, "my", mine, al.start, al.end)
        else:
            (rc,) = struct.unpack_from('<i', out, off); off += 4
            (npts,) = struct.unpack_from('<i', out, off); off += 4
            refpts = [struct.unpack_from('<5i', out, off + 20*i) for i in range(npts)]
            off += 20 * npts
            qr = rc_codes(qc)
            npos_r = np.sort((len(qc) - 1) - npos[::-1]) if len(npos) else npos
            myrc = anker_rc_comp(tidx, qc, qr, npos, npos_r, len(qc), qs, qe, pts, 1)
            mypts = [(pts.qStart[i], pts.qEnd[i], pts.tStart[i], pts.tEnd[i], pts.weight[i])
                     for i in range(pts.len)]
            ok = myrc == rc and mypts == [tuple(x) for x in refpts]
            if not ok and fails < 3:
                print("FAIL arc", ci, "ref", rc, npts, refpts[:4], "my", myrc, pts.len, mypts[:4])
        if not ok: fails += 1
    print("fails:", fails, "/", len(cases))
    return fails

if __name__ == '__main__':
    sys.exit(1 if run() else 0)
