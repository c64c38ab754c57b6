// kma_run.cpp — fused end-to-end SE mapping driver.
//
// One native call per read batch runs the whole hot path of runKMA
// (reference runkma.c:130-908): step-2 scanning (savekmers.c:2442 -1t1 /
// savekmers.c:5127 chain), step-3 candidate scoring (alnFragsSE,
// alnfrags.c:1052-1218), the update_Scores spool (updatescores.c:203-298)
// and the global score arrays, with ConClave-1/2 (conclave.c:43-213,
// 386-747) as native passes over the in-memory spool.  This file contains
// the ORCHESTRATION only — the scan and alignment engines live in
// kma_chain.cpp / kma_align.cpp and are called through their public C
// entry points; all three translation units are linked into one
// libkma_run.so.
//
// Python (kma_tpu/run_native.py) holds the index arrays, feeds flat read
// batches straight from the native fastq reader, and pulls per-template
// fragment stages for assembly/output after conclave.

#include <algorithm>
#include <atomic>
#include <climits>
#include <cmath>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <mutex>
#include <thread>
#include <vector>

#include <chrono>
#include <cstdlib>

#include <fcntl.h>
#include <sys/mman.h>
#include <sys/stat.h>
#include <unistd.h>

typedef long long ll;

// ---- public entry points of the sibling translation units -----------------
extern "C" {
void *kchain_create(const void *exist, int exist_es, const void *key_index,
                    int key_es, const void *value_index, int vidx_es,
                    const void *values, int val_es,
                    unsigned long long null_index, unsigned long long smask,
                    unsigned long long mmask, int mega, int use_murmur,
                    int cmode, int k, int mlen,
                    const long long *template_lengths, long long M,
                    long long MM, long long U, long long W1, long long Wl);
void kchain_free(void *h);
int kchain_scan_read(void *h, const uint8_t *codes, int seqlen,
                     int exhaustive, long long minlen, double coverT,
                     double mrs, double mrc, int lc, long long *Score,
                     long long *extendScore, uint8_t *include,
                     uint8_t *hit_rc, long long *hit_sc, int *hit_b0,
                     int *hit_b1, long long *tpl_off, int *tpl_flat,
                     int cap_hits, long long cap_tpl);
void kchain_save_kmers(void *h, const uint8_t *codes, int seqlen,
                       int exhaustive, double proxi_frac, int use_proxi,
                       long long *Score_, long long *Score_r_,
                       long long *extendScore_, uint8_t *include,
                       long long *soft, int *bests_out, int *nb_out,
                       int *bests_r_out, int *nbr_out, long long *bs_out);
void *kidx_create(const uint8_t *codes, int len, int kmersize);
void kidx_free(void *h);
void kaln_frags_se_batch(
    void *const *handles, const int32_t *tpl_ids, const int64_t *tpl_off,
    const uint8_t *codes_flat, const int64_t *codes_off,
    const int32_t *npos_flat, const int64_t *npos_off,
    const int32_t *qbounds, const uint8_t *arc_flags, int n_reads, int M,
    int MM, int U, int W1, const int32_t *dmat, int kmersize, int minlen,
    int mq, double scoreT, double mrc, int n_threads, int32_t *out_nhits,
    long long *out_best_score, double *out_best_frac, int32_t *out_tpl,
    int32_t *out_start, int32_t *out_end, long long *out_score,
    int32_t *out_len);
}

namespace {

// p_chisqr / fastp (stdstat.c:37-147); long-double q as conclave.c uses.
const double FASTP_THR[44] = {
    114.5242, 109.9604, 105.3969, 100.8337, 96.27476, 91.71701, 87.16164,
    82.60901, 78.05917, 73.51245, 68.96954, 64.43048, 59.89615, 55.36699,
    50.84417, 46.32844, 41.82144, 37.32489, 32.84127, 28.37395, 23.92814,
    19.51139, 15.13671, 10.82759, 6.634897, 3.841443, 2.705532, 2.072251,
    1.642374, 1.323304, 1.074194, 0.8734571, 0.7083263, 0.5706519,
    0.4549364, 0.3573172, 0.2749959, 0.2059001, 0.1484719, 0.1015310,
    0.06418475, 0.03576578, 0.01579077, 0.00393214};
const double FASTP_P[44] = {
    1e-26, 1e-25, 1e-24, 1e-23, 1e-22, 1e-21, 1e-20, 1e-19, 1e-18, 1e-17,
    1e-16, 1e-15, 1e-14, 1e-13, 1e-12, 1e-11, 1e-10, 1e-9,  1e-8,  1e-7,
    1e-6,  1e-5,  1e-4,  1e-3,  0.01,  0.05,  0.1,   0.15,  0.2,   0.25,
    0.3,   0.35,  0.4,   0.45,  0.5,   0.55,  0.6,   0.65,  0.7,   0.75,
    0.8,   0.85,  0.9,   0.95};

double fastp_d(double q) {
    for (int i = 0; i < 44; ++i)
        if (q > FASTP_THR[i])
            return FASTP_P[i];
    if (q >= 0.0)
        return 1.0;
    return 1.0 - fastp_d(-q);
}

double p_chisqr_ld(long double q) {
    if (q < 0)
        return 1e-26;
    if (q > 49)
        return fastp_d((double)q);
    double x = (double)(0.5L * q);
    return 1 - 1.772453850 * erf(sqrt(x)) / tgamma(0.5);
}

bool cmp_mode(int mode, bool t, bool q) {
    if (mode == 1)
        return t && q;   // -and
    if (mode == 2)
        return true;     // -oa
    return t || q;       // default or
}

static const uint8_t RC_CODE[6] = {3, 2, 1, 0, 4, 5};

// One step-2 anker emit waiting for step-3 scoring.
struct PendUnit {
    int read;            // batch-local read index
    ll sc;               // rc_flag (signed best score)
    int b0, b1;          // chain q-bounds; -1 = absent (-1t1)
    int flag;            // sam-flag part (16 = rc winner, -1t1 only)
    ll cod_off;          // emit codes in the unit arena
    int q_len;
    ll tpl_off;          // candidates in the unit tpl arena
    int n_tpl;
};

struct Scratch {
    void *ctx = nullptr;
    std::vector<ll> Score, Score_r, extendScore;
    std::vector<uint8_t> include;
    std::vector<int> bests, bests_r;
    // chain hit buffers
    std::vector<uint8_t> hit_rc;
    std::vector<ll> hit_sc;
    std::vector<int> hit_b0, hit_b1;
    std::vector<ll> tpl_off;
    std::vector<int> tpl_flat;
    // per-read emit collection (read-major within the thread's slice)
    std::vector<PendUnit> units;
    std::vector<uint8_t> cod_arena;
    std::vector<int32_t> tpl_arena;

    void init(int db_size, int cap_hits, ll cap_tpl) {
        Score.assign(db_size + 1, 0);
        Score_r.assign(db_size + 1, 0);
        extendScore.assign(db_size + 1, 0);
        include.assign(db_size + 1, 0);
        bests.assign(db_size + 2, 0);
        bests_r.assign(db_size + 2, 0);
        hit_rc.resize(cap_hits);
        hit_sc.resize(cap_hits);
        hit_b0.resize(cap_hits);
        hit_b1.resize(cap_hits);
        tpl_off.resize(cap_hits + 1);
        tpl_flat.resize(cap_tpl);
    }
};

// The ConClave spool record (updatescores.c:203-298); struct-of-arrays.
struct Spool {
    std::vector<int32_t> q_len, flag;
    std::vector<int32_t> best_hits;   // signed (negative = PE follows)
    std::vector<ll> score;            // signed (negative = PE follows)
    std::vector<ll> ord;              // global read ordinal
    std::vector<uint8_t> hdr;
    std::vector<ll> hdr_off{0};
    std::vector<uint8_t> cod;
    std::vector<ll> cod_off{0};
    std::vector<int32_t> tpl, starts, ends;
    std::vector<ll> t_off{0};
    size_t size() const { return q_len.size(); }
};

// A read assigned to one template by conclave (frags.h Frag).
struct FragOut {
    int32_t rec;        // spool record index
    uint8_t rc;         // assigned to the reverse strand
    int32_t start, end;
    ll score;           // 0 when the record's best_hits was negative (PE)
    int32_t chunk;      // -mf flush chunk (conclave.c:196-208)
};

struct Run {
    // scan index handle(s): [0] is the primary, one clone per thread
    std::vector<void *> ctxs;
    std::vector<Scratch> scratch;
    // create args we need for clones
    struct {
        const void *exist, *key_index, *value_index, *values;
        int exist_es, key_es, vidx_es, val_es;
        unsigned long long null_index, smask, mmask;
        int mega, use_murmur, cmode, k, mlen;
        ll M, MM, U, W1, Wl;
    } ix;
    std::vector<ll> tlen;          // template_lengths copy [db_size(+1)]
    int db_size = 0;
    int32_t dmat[25];

    // config
    int mode = 0;                  // 0 = -1t1 save_kmers, 1 = chain
    int exhaustive = 0, minlen = 16, mq = 0, lc = 0;
    double scoreT = 0.5, mrc = 0.0, coverT = 0.1;
    double aln_min_frac = 1.0;
    ll contamination = -1;         // deCon pseudo-template id, -1 = none
    int n_threads = 1;

    // template store (.seq.b mmap)
    int seq_fd = -1;
    const uint8_t *seq_map = (const uint8_t *)MAP_FAILED;
    size_t seq_bytes = 0;
    std::vector<ll> seq_off;       // byte offset of template t
    std::vector<void *> handles;   // TIndex* per template (lazy)
    std::mutex handle_mu;

    // accumulators + spool
    std::vector<ll> alignment_scores, uniq_alignment_scores;
    Spool spool;

    // conclave output
    std::vector<std::vector<FragOut>> frags;   // per template

    // KMA_RUN_PROF=1 phase timing (seconds)
    double t_scan = 0, t_build = 0, t_score = 0, t_spool = 0;

    ~Run() {
        if (getenv("KMA_RUN_PROF"))
            fprintf(stderr,
                    "# krun prof: scan %.3f build %.3f score %.3f "
                    "spool %.3f\n",
                    t_scan, t_build, t_score, t_spool);
        for (auto *c : ctxs)
            if (c)
                kchain_free(c);
        for (auto *hd : handles)
            if (hd)
                kidx_free(hd);
        if (seq_map != MAP_FAILED)
            munmap((void *)seq_map, seq_bytes);
        if (seq_fd >= 0)
            close(seq_fd);
    }

    void *handle_for(int t) {
        void *h = handles[t];
        if (h)
            return h;
        std::lock_guard<std::mutex> g(handle_mu);
        if (handles[t])
            return handles[t];
        ll len = tlen[t];
        std::vector<uint8_t> codes((size_t)len);
        const uint64_t *words = (const uint64_t *)(seq_map + seq_off[t]);
        for (ll i = 0; i < len; ++i)
            codes[i] = (uint8_t)((words[i >> 5] >> (62 - 2 * (i & 31))) & 3);
        handles[t] = kidx_create(codes.data(), (int)len, ix.k);
        return handles[t];
    }
};

// deConPrint (ankers.c:106-124): drop the contamination id via
// find_contamination (first match from the END, back-filled with the last
// element) then find_contamination2 (rc side, stopping at the first
// positive id).
int decon_filter(int32_t *t, int n, ll contamination) {
    for (int i = n - 1; i >= 0; --i)
        if (t[i] == contamination) {
            t[i] = t[n - 1];
            --n;
            break;
        }
    for (int i = n - 1; i >= 0; --i) {
        if (t[i] == -contamination) {
            t[i] = t[n - 1];
            --n;
            break;
        }
        if (t[i] > 0)
            break;
    }
    return n;
}

}  // namespace

extern "C" {

void *krun_create(const void *exist, int exist_es, const void *key_index,
                  int key_es, const void *value_index, int vidx_es,
                  const void *values, int val_es,
                  unsigned long long null_index, unsigned long long smask,
                  unsigned long long mmask, int mega, int use_murmur,
                  int cmode, int k, int mlen,
                  const long long *template_lengths, long long tlen_n,
                  long long db_size, long long M, long long MM, long long U,
                  long long W1, long long Wl, const int32_t *dmat,
                  const char *seq_path, int mode, int exhaustive, int minlen,
                  int mq, double scoreT, double mrc, double coverT, int lc,
                  double aln_min_frac, long long contamination,
                  int n_threads) {
    Run *r = new Run();
    r->ix = {exist,      key_index, value_index, values, exist_es,
             key_es,     vidx_es,   val_es,      null_index,
             smask,      mmask,     mega,        use_murmur,
             cmode,      k,         mlen,        M,
             MM,         U,         W1,          Wl};
    r->tlen.assign(template_lengths, template_lengths + tlen_n);
    r->db_size = (int)db_size;
    memcpy(r->dmat, dmat, sizeof(r->dmat));
    r->mode = mode;
    r->exhaustive = exhaustive;
    r->minlen = minlen;
    r->mq = mq;
    r->scoreT = scoreT;
    r->mrc = mrc;
    r->coverT = coverT;
    r->lc = lc;
    r->aln_min_frac = aln_min_frac;
    r->contamination = contamination;
    r->n_threads = n_threads < 1 ? 1 : n_threads;

    r->seq_fd = open(seq_path, O_RDONLY);
    if (r->seq_fd < 0) {
        delete r;
        return nullptr;
    }
    struct stat st;
    fstat(r->seq_fd, &st);
    r->seq_bytes = (size_t)st.st_size;
    r->seq_map = (const uint8_t *)mmap(nullptr, r->seq_bytes ? r->seq_bytes : 1,
                                       PROT_READ, MAP_PRIVATE, r->seq_fd, 0);
    if (r->seq_map == MAP_FAILED) {
        delete r;
        return nullptr;
    }
    // seq_offsets (index/format.py:250, runkma.c:216-220): templates are
    // 1-based — slot 0 of template_lengths holds the kmersize, so the
    // accumulation starts at template 2 from offset 0
    r->seq_off.assign(tlen_n, 0);
    for (ll t = 2; t < tlen_n; ++t)
        r->seq_off[t] =
            r->seq_off[t - 1] + ((template_lengths[t - 1] >> 5) + 1) * 8;
    r->handles.assign(tlen_n, nullptr);
    r->alignment_scores.assign(db_size, 0);
    r->uniq_alignment_scores.assign(db_size, 0);

    int nt = r->n_threads;
    r->ctxs.resize(nt);
    r->scratch.resize(nt);
    for (int i = 0; i < nt; ++i) {
        r->ctxs[i] = kchain_create(exist, exist_es, key_index, key_es,
                                   value_index, vidx_es, values, val_es,
                                   null_index, smask, mmask, mega,
                                   use_murmur, cmode, k, mlen,
                                   template_lengths, M, MM, U, W1, Wl);
        r->scratch[i].ctx = r->ctxs[i];
        r->scratch[i].init((int)db_size + 1, 1024, 1 << 16);
    }
    return r;
}

void krun_free(void *h) { delete (Run *)h; }

// Map one batch of SE reads.  codes/headers are flat with [n+1] offsets;
// ords[i] is read i's global ordinal (multi-host round-robin).  Spool
// record order matches the reference: reads in input order, hits of one
// read in scan emit order.  Returns the spool size so far, or -1 on error.
long long krun_map_se_batch(void *hv, const uint8_t *codes_flat,
                            const long long *coff, const uint8_t *hdr_flat,
                            const long long *hoff, const long long *ords,
                            int n) {
    Run *R = (Run *)hv;
    const int k = R->ix.k;
    int nt = R->n_threads;
    if (nt > n)
        nt = n < 1 ? 1 : n;

    // ---- phase 1: parallel scan over contiguous read slices ------------
    std::vector<int> slice_begin(nt + 1);
    for (int i = 0; i <= nt; ++i)
        slice_begin[i] = (int)((ll)n * i / nt);

    auto _now = []() {
        return std::chrono::duration<double>(
                   std::chrono::steady_clock::now().time_since_epoch())
            .count();
    };
    double _t0 = _now();
    std::atomic<int> fail(0);
    auto scan_slice = [&](int ti) {
        Scratch &S = R->scratch[ti];
        S.units.clear();
        S.cod_arena.clear();
        S.tpl_arena.clear();
        std::vector<uint8_t> rc;
        for (int rd = slice_begin[ti]; rd < slice_begin[ti + 1]; ++rd) {
            const uint8_t *q = codes_flat + coff[rd];
            int q_len = (int)(coff[rd + 1] - coff[rd]);
            if (q_len < k)
                continue;
            if (R->mode == 0) {
                // save_kmers (-1t1) strand scan + emit rules
                // (savekmers.c:2442-3065; mapping/scan.py:315-360)
                int nb = 0, nbr = 0;
                ll bs[2] = {0, 0};
                kchain_save_kmers(S.ctx, q, q_len, R->exhaustive, 0.0, 0,
                                  S.Score.data(), S.Score_r.data(),
                                  S.extendScore.data(), S.include.data(),
                                  nullptr, S.bests.data(), &nb,
                                  S.bests_r.data(), &nbr, bs);
                ll b0 = bs[0], b1 = bs[1];
                if ((b0 <= 0 && b1 <= 0) || (k > b0 && k > b1))
                    continue;
                PendUnit u;
                u.read = rd;
                u.b0 = u.b1 = -1;
                u.q_len = q_len;
                u.cod_off = (ll)S.cod_arena.size();
                u.tpl_off = (ll)S.tpl_arena.size();
                if (b0 > b1) {
                    u.sc = b0;
                    u.flag = 0;
                    S.cod_arena.insert(S.cod_arena.end(), q, q + q_len);
                    S.tpl_arena.insert(S.tpl_arena.end(), S.bests.data(),
                                       S.bests.data() + nb);
                    u.n_tpl = nb;
                } else if (b0 < b1) {
                    u.sc = b1;
                    u.flag = 16;
                    size_t base = S.cod_arena.size();
                    S.cod_arena.resize(base + q_len);
                    for (int i = 0; i < q_len; ++i)
                        S.cod_arena[base + i] = RC_CODE[q[q_len - 1 - i]];
                    S.tpl_arena.insert(S.tpl_arena.end(), S.bests_r.data(),
                                       S.bests_r.data() + nbr);
                    u.n_tpl = nbr;
                } else {
                    u.sc = -b0;
                    u.flag = 0;
                    S.cod_arena.insert(S.cod_arena.end(), q, q + q_len);
                    S.tpl_arena.insert(S.tpl_arena.end(), S.bests.data(),
                                       S.bests.data() + nb);
                    for (int i = 0; i < nbr; ++i)
                        S.tpl_arena.push_back(-S.bests_r[i]);
                    u.n_tpl = nb + nbr;
                }
                S.units.push_back(u);
            } else {
                // save_kmers_chain (savekmers.c:5127-5944)
                int nh;
                for (;;) {
                    nh = kchain_scan_read(
                        S.ctx, q, q_len, R->exhaustive, R->minlen,
                        R->coverT, R->scoreT, R->mrc, R->lc,
                        S.Score.data(), S.extendScore.data(),
                        S.include.data(), S.hit_rc.data(), S.hit_sc.data(),
                        S.hit_b0.data(), S.hit_b1.data(), S.tpl_off.data(),
                        S.tpl_flat.data(), (int)S.hit_rc.size(),
                        (ll)S.tpl_flat.size());
                    if (nh >= 0)
                        break;
                    S.hit_rc.resize(S.hit_rc.size() * 4);
                    S.hit_sc.resize(S.hit_sc.size() * 4);
                    S.hit_b0.resize(S.hit_b0.size() * 4);
                    S.hit_b1.resize(S.hit_b1.size() * 4);
                    S.tpl_off.resize(S.hit_rc.size() + 1);
                    S.tpl_flat.resize(S.tpl_flat.size() * 4);
                }
                for (int hi = 0; hi < nh; ++hi) {
                    PendUnit u;
                    u.read = rd;
                    u.sc = S.hit_sc[hi];
                    u.b0 = S.hit_b0[hi];
                    u.b1 = S.hit_b1[hi];
                    u.flag = 0;
                    u.q_len = q_len;
                    u.cod_off = (ll)S.cod_arena.size();
                    if (S.hit_rc[hi] == 1) {
                        S.cod_arena.insert(S.cod_arena.end(), q, q + q_len);
                    } else {
                        size_t base = S.cod_arena.size();
                        S.cod_arena.resize(base + q_len);
                        for (int i = 0; i < q_len; ++i)
                            S.cod_arena[base + i] =
                                RC_CODE[q[q_len - 1 - i]];
                    }
                    u.tpl_off = (ll)S.tpl_arena.size();
                    u.n_tpl = (int)(S.tpl_off[hi + 1] - S.tpl_off[hi]);
                    S.tpl_arena.insert(
                        S.tpl_arena.end(),
                        S.tpl_flat.data() + S.tpl_off[hi],
                        S.tpl_flat.data() + S.tpl_off[hi + 1]);
                    S.units.push_back(u);
                }
            }
        }
    };
    if (nt == 1) {
        scan_slice(0);
    } else {
        std::vector<std::thread> th;
        for (int i = 0; i < nt; ++i)
            th.emplace_back(scan_slice, i);
        for (auto &t : th)
            t.join();
    }
    if (fail.load())
        return -1;
    R->t_scan += _now() - _t0;
    _t0 = _now();

    // ---- phase 2: build the flattened scoring batch (read order) --------
    // decon filter + short-read gate happen here, BEFORE scoring, exactly
    // as pipeline._consume does.
    struct Unit {
        int read, flag, q_len, b0, b1;
        ll sc;
        const uint8_t *cod;
        ll tpl_base;
        int n_tpl;
    };
    std::vector<Unit> units;
    std::vector<int32_t> tpl_ids;
    std::vector<int64_t> tpl_offv{0};
    for (int ti = 0; ti < nt; ++ti) {
        Scratch &S = R->scratch[ti];
        for (PendUnit &u : S.units) {
            int n_tpl = u.n_tpl;
            int32_t *t = S.tpl_arena.data() + u.tpl_off;
            if (R->contamination >= 0) {
                n_tpl = decon_filter(t, n_tpl, R->contamination);
                if (!n_tpl)
                    continue;
            }
            if (k > u.q_len)
                continue;
            Unit w;
            w.read = u.read;
            w.flag = u.flag;
            w.q_len = u.q_len;
            w.b0 = u.b0;
            w.b1 = u.b1;
            w.sc = u.sc;
            w.cod = S.cod_arena.data() + u.cod_off;
            w.tpl_base = (ll)tpl_ids.size();
            w.n_tpl = n_tpl;
            tpl_ids.insert(tpl_ids.end(), t, t + n_tpl);
            tpl_offv.push_back((ll)tpl_ids.size());
            units.push_back(w);
        }
    }
    // thread slices were contiguous in read order, so units are sorted;
    // (defensive) stable order is required for spool parity.
    int m = (int)units.size();
    if (!m)
        return (ll)R->spool.size();

    // handles for every candidate (parallel build of the missing ones)
    {
        std::vector<int32_t> uniq(tpl_ids);
        for (auto &t : uniq)
            t = t < 0 ? -t : t;
        std::sort(uniq.begin(), uniq.end());
        uniq.erase(std::unique(uniq.begin(), uniq.end()), uniq.end());
        std::vector<int32_t> missing;
        for (int32_t t : uniq)
            if (!R->handles[t])
                missing.push_back(t);
        if (!missing.empty()) {
            std::atomic<size_t> next(0);
            auto build = [&]() {
                for (;;) {
                    size_t i = next.fetch_add(1);
                    if (i >= missing.size())
                        break;
                    R->handle_for(missing[i]);
                }
            };
            if (nt == 1 || missing.size() < 8) {
                build();
            } else {
                std::vector<std::thread> th;
                for (int i = 0; i < nt; ++i)
                    th.emplace_back(build);
                for (auto &t : th)
                    t.join();
            }
        }
    }
    std::vector<void *> handles(tpl_ids.size());
    for (size_t i = 0; i < tpl_ids.size(); ++i)
        handles[i] =
            R->handles[tpl_ids[i] < 0 ? -tpl_ids[i] : tpl_ids[i]];

    // per-unit flat codes / npos / qbounds / arc
    std::vector<int64_t> cod_offv(m + 1, 0), npos_offv(m + 1, 0);
    for (int i = 0; i < m; ++i)
        cod_offv[i + 1] = cod_offv[i] + units[i].q_len;
    std::vector<uint8_t> cod_flat((size_t)cod_offv[m]);
    std::vector<int32_t> npos_flat;
    std::vector<int32_t> qb(2 * m);
    std::vector<uint8_t> arcs(m);
    for (int i = 0; i < m; ++i) {
        Unit &u = units[i];
        memcpy(cod_flat.data() + cod_offv[i], u.cod, u.q_len);
        for (int j = 0; j < u.q_len; ++j)
            if (u.cod[j] == 4)
                npos_flat.push_back(j);
        npos_offv[i + 1] = (ll)npos_flat.size();
        // chain hits carry explicit q-bounds (qseqs.c:41-55 header tail)
        if (u.b0 >= 0 || u.b1 >= 0) {
            qb[2 * i] = u.b0;
            qb[2 * i + 1] = u.b1;
        } else {
            qb[2 * i] = 0;
            qb[2 * i + 1] = u.q_len;
        }
        arcs[i] = u.sc < 0 ? 1 : 0;
    }
    if (npos_flat.empty())
        npos_flat.push_back(0);  // non-null base pointer

    R->t_build += _now() - _t0;
    _t0 = _now();

    // ---- phase 3: step-3 scoring (threaded inside) ----------------------
    ll total = tpl_offv[m];
    std::vector<int32_t> out_nh(m), out_tpl(total), out_start(total),
        out_end(total), out_len(total);
    std::vector<ll> out_best(m), out_score(total);
    std::vector<double> out_frac(m);
    kaln_frags_se_batch(handles.data(), tpl_ids.data(), tpl_offv.data(),
                        cod_flat.data(), cod_offv.data(), npos_flat.data(),
                        npos_offv.data(), qb.data(), arcs.data(), m,
                        (int)R->ix.M, (int)R->ix.MM, (int)R->ix.U,
                        (int)R->ix.W1, R->dmat, k, R->minlen, R->mq,
                        R->scoreT, R->mrc, R->n_threads, out_nh.data(),
                        out_best.data(), out_frac.data(), out_tpl.data(),
                        out_start.data(), out_end.data(), out_score.data(),
                        out_len.data());

    R->t_score += _now() - _t0;
    _t0 = _now();

    // ---- phase 4: sequential spool + score arrays (record order) --------
    Spool &sp = R->spool;
    const double min_frac = R->aln_min_frac;
    for (int i = 0; i < m; ++i) {
        Unit &u = units[i];
        ll best = out_best[i];
        if (best <= k)
            continue;
        ll b = tpl_offv[i];
        int nh = out_nh[i];
        double best_frac = out_frac[i];
        // update_Scores selection (updatescores.c:203-298)
        int first_sel = (int)sp.tpl.size();
        static thread_local std::vector<ll> sel_sc;
        sel_sc.clear();
        if (min_frac == 1.0) {
            for (int j = 0; j < nh; ++j) {
                ll sc = out_score[b + j];
                int ln = out_len[b + j];
                double min_score = ln ? (double)(sc / ln) : 0.0;
                if (min_score == best_frac || sc == best) {
                    sp.tpl.push_back(out_tpl[b + j]);
                    sp.starts.push_back(out_start[b + j]);
                    sp.ends.push_back(out_end[b + j]);
                    sel_sc.push_back(sc);
                }
            }
        } else {
            double mf = min_frac < 0 ? -min_frac : min_frac;
            double min_score = mf * best_frac;
            double min_read = mf * (double)best;
            bool acc_is_score = min_frac < 0;
            for (int j = 0; j < nh; ++j) {
                ll sc = out_score[b + j];
                if ((double)out_len[b + j] * min_score <= (double)sc ||
                    min_read <= (double)sc) {
                    sp.tpl.push_back(out_tpl[b + j]);
                    sp.starts.push_back(out_start[b + j]);
                    sp.ends.push_back(out_end[b + j]);
                    sel_sc.push_back(acc_is_score ? sc : best);
                }
            }
        }
        int n_sel = (int)((ll)sp.tpl.size() - first_sel);
        // score accumulation (pipeline.flush_aln / updatescores.c:217-281)
        if (n_sel == 1) {
            int t = sp.tpl[first_sel];
            if (t < 0)
                t = -t;
            R->alignment_scores[t] += sel_sc[0];
            R->uniq_alignment_scores[t] += best;
        } else {
            for (int j = 0; j < n_sel; ++j) {
                int t = sp.tpl[first_sel + j];
                if (t < 0)
                    t = -t;
                R->alignment_scores[t] += sel_sc[j];
            }
        }
        sp.t_off.push_back((ll)sp.tpl.size());
        sp.q_len.push_back(u.q_len);
        sp.flag.push_back(u.flag);
        sp.best_hits.push_back(n_sel);
        sp.score.push_back(best);
        sp.ord.push_back(ords[u.read]);
        // header: original bytes (+ NUL + chain q-bounds when present)
        const uint8_t *hp = hdr_flat + hoff[u.read];
        ll hlen = hoff[u.read + 1] - hoff[u.read];
        sp.hdr.insert(sp.hdr.end(), hp, hp + hlen);
        if (u.b0 >= 0 || u.b1 >= 0) {
            sp.hdr.push_back(0);
            int32_t bb[2] = {u.b0, u.b1};
            const uint8_t *bp = (const uint8_t *)bb;
            sp.hdr.insert(sp.hdr.end(), bp, bp + 8);
        }
        sp.hdr_off.push_back((ll)sp.hdr.size());
        sp.cod.insert(sp.cod.end(), u.cod, u.cod + u.q_len);
        sp.cod_off.push_back((ll)sp.cod.size());
    }
    R->t_spool += _now() - _t0;
    return (ll)R->spool.size();
}

void krun_scores(void *hv, long long *alignment_scores,
                 long long *uniq_alignment_scores) {
    Run *R = (Run *)hv;
    memcpy(alignment_scores, R->alignment_scores.data(),
           R->alignment_scores.size() * sizeof(ll));
    memcpy(uniq_alignment_scores, R->uniq_alignment_scores.data(),
           R->uniq_alignment_scores.size() * sizeof(ll));
}

// ConClave over the native spool (conclave.c:43-213 CC1 / 386-747 CC2).
// Outputs per-template w_scores / fragment_counts / read_counts and keeps
// the per-template fragment lists inside the handle for krun_stage_*.
void krun_conclave(void *hv, int version, int lc, long long *w_scores,
                   long long *fragment_counts, long long *read_counts,
                   long long template_tot_ulen, double scoreT, double evalue,
                   int cmpm, long long max_frag) {
    Run *R = (Run *)hv;
    Spool &sp = R->spool;
    size_t nrec = sp.size();
    int db = R->db_size;
    std::vector<ll> &as = R->alignment_scores;
    std::vector<ll> &us = R->uniq_alignment_scores;
    const ll *tl = R->tlen.data();
    R->frags.assign(db, {});

    auto cc1_choice = [&](size_t rec, ll init_bt, int *out_start,
                          int *out_end) -> ll {
        // conclave.c:80-123 tie-break cascade
        ll b = sp.t_off[rec];
        int nb = (int)(sp.t_off[rec + 1] - b);
        int bh = sp.best_hits[rec] < 0 ? -sp.best_hits[rec]
                                       : sp.best_hits[rec];
        if (bh <= 1) {
            if (!nb)
                return LLONG_MIN;  // caller substitutes stale buffer
            *out_start = sp.starts[b];
            *out_end = sp.ends[b];
            return sp.tpl[b];
        }
        ll bestTemplate = init_bt;
        double bestScore = 0.0;
        ll best_read_score = 0, bestNum = 0;
        int start = 0, end = 0;
        for (int i = 0; i < bh; ++i) {
            ll tt = sp.tpl[b + i];
            ll t = tt < 0 ? -tt : tt;
            ll a = as[t], u = us[t];
            double tmp_score = 1.0 * (double)a / (double)tl[t];
            ll abt = bestTemplate < 0 ? -bestTemplate : bestTemplate;
            bool better;
            if (lc)
                better = (tmp_score > bestScore ||
                          (tmp_score == bestScore &&
                           (a > best_read_score ||
                            (a == best_read_score &&
                             (u > bestNum || (u == bestNum && t < abt))))));
            else
                better = (a > best_read_score ||
                          (a == best_read_score &&
                           (tmp_score > bestScore ||
                            (tmp_score == bestScore &&
                             (u > bestNum || (u == bestNum && t < abt))))));
            if (better) {
                bestTemplate = tt;
                best_read_score = a;
                bestScore = tmp_score;
                bestNum = u;
                start = sp.starts[b + i];
                end = sp.ends[b + i];
            }
        }
        *out_start = start;
        *out_end = end;
        return bestTemplate;
    };

    ll n_since = 0;
    int32_t chunk = 0;
    if (max_frag < 1)
        max_frag = 1;
    auto commit = [&](size_t rec, ll bestTemplate, int start, int end,
                      bool skip_zero) {
        ll read_score =
            sp.score[rec] < 0 ? -sp.score[rec] : sp.score[rec];
        uint8_t rc = 0;
        if (bestTemplate < 0) {
            bestTemplate = -bestTemplate;
            rc = 1;
        }
        if (skip_zero && !bestTemplate)
            return;
        int bh = sp.best_hits[rec] < 0 ? -sp.best_hits[rec]
                                       : sp.best_hits[rec];
        w_scores[bestTemplate] += read_score;
        fragment_counts[bestTemplate] += 1;
        read_counts[bestTemplate] += 1;
        FragOut f;
        f.rec = (int32_t)rec;
        f.rc = rc;
        f.start = start;
        f.end = end;
        f.score = sp.best_hits[rec] < 0 ? 0 : read_score;
        f.chunk = chunk;
        (void)bh;
        R->frags[bestTemplate].push_back(f);
        // (PE mate records not produced by the SE driver)
        // maxFrag flush check AFTER the whole record (conclave.c:196-208)
        if (++n_since >= max_frag) {
            ++chunk;
            n_since = 0;
        }
    };

    if (version != 2) {
        // ---- ConClave-1 -------------------------------------------------
        ll stale_t = 0;
        int stale_s = 0, stale_e = 0;
        for (size_t rec = 0; rec < nrec; ++rec) {
            int start = 0, end = 0;
            ll bt = cc1_choice(rec, -1, &start, &end);
            if (bt == LLONG_MIN) {
                bt = stale_t;
                start = stale_s;
                end = stale_e;
            }
            if (sp.t_off[rec + 1] > sp.t_off[rec]) {
                ll b = sp.t_off[rec];
                stale_t = sp.tpl[b];
                stale_s = sp.starts[b];
                stale_e = sp.ends[b];
            }
            commit(rec, bt, start, end, false);
        }
    } else {
        // ---- ConClave-2 -------------------------------------------------
        // pass A: w_scores as CC1 would assign
        {
            ll stale_bt = 0;
            for (size_t rec = 0; rec < nrec; ++rec) {
                int s, e;
                ll bt = cc1_choice(rec, -1, &s, &e);
                if (bt == LLONG_MIN)
                    bt = stale_bt;
                if (sp.t_off[rec + 1] > sp.t_off[rec])
                    stale_bt = sp.tpl[sp.t_off[rec]];
                ll abt = bt < 0 ? -bt : bt;
                w_scores[abt] +=
                    sp.score[rec] < 0 ? -sp.score[rec] : sp.score[rec];
            }
        }
        ll Nhits = 0;
        for (int t = 1; t < db; ++t)
            Nhits += w_scores[t];
        for (int t = 1; t < db; ++t) {
            ll read_score = w_scores[t];
            if (!read_score)
                continue;
            ll t_len = tl[t];
            ll den = template_tot_ulen - t_len;
            if (den < 1)
                den = 1;
            long double expected = (long double)t_len / (long double)den *
                                   (long double)(Nhits - read_score);
            long double q_value =
                ((long double)read_score - expected) /
                (expected + (long double)read_score) *
                ((long double)read_score - expected);
            double p_value = p_chisqr_ld(q_value);
            if (!cmp_mode(cmpm,
                          p_value <= evalue &&
                              (long double)read_score > expected,
                          (double)read_score >= scoreT * (double)t_len))
                w_scores[t] = 0;
        }
        // pass B: newly-unique reads add uniq scores
        for (size_t rec = 0; rec < nrec; ++rec) {
            int bh = sp.best_hits[rec] < 0 ? -sp.best_hits[rec]
                                           : sp.best_hits[rec];
            if (bh == 1)
                continue;
            ll b = sp.t_off[rec], e = sp.t_off[rec + 1];
            ll bt = 0;
            bool ok = true;
            for (ll i = b; i < e; ++i) {
                ll t = sp.tpl[i] < 0 ? -sp.tpl[i] : sp.tpl[i];
                if (w_scores[t]) {
                    if (bt) {
                        ok = false;
                        break;
                    }
                    bt = t;
                }
            }
            if (ok && bt)
                us[bt] += sp.score[rec] < 0 ? -sp.score[rec] : sp.score[rec];
        }
        // pass C: weighted sampling by uniq scores (conclave.c:564-601)
        memset(w_scores, 0, (size_t)db * sizeof(ll));
        ll stale_t = 0;
        int stale_s = 0, stale_e = 0;
        for (size_t rec = 0; rec < nrec; ++rec) {
            int bh = sp.best_hits[rec] < 0 ? -sp.best_hits[rec]
                                           : sp.best_hits[rec];
            ll bestTemplate;
            int start = 0, end = 0;
            if (bh != 1) {
                bestTemplate = 0;
                ll b = sp.t_off[rec], e = sp.t_off[rec + 1];
                ll tot = 0;
                for (ll i = b; i < e; ++i) {
                    ll t = sp.tpl[i] < 0 ? -sp.tpl[i] : sp.tpl[i];
                    tot += us[t];
                }
                ll q_len = sp.q_len[rec];
                if (tot && 16 <= q_len) {
                    const uint8_t *seq = sp.cod.data() + sp.cod_off[rec];
                    ll rand = seq[0];
                    ll j = q_len;
                    for (int i = 0; i < 7; ++i) {
                        --j;
                        rand = (((rand << 2) | seq[i]) << 2) | seq[j];
                    }
                    // Park-Miller with Python floor-div semantics; rand
                    // is non-negative here so / and % match //
                    rand = 16807 * (rand % 127773) - 2836 * (rand / 127773);
                    if (rand <= 0)
                        rand += 0x7FFFFFFF;
                    ll rand_score =
                        (ll)((double)rand / (double)0x7FFFFFFF *
                             (double)tot);
                    ll score = 0;
                    for (ll i = b; i < e; ++i) {
                        ll t = sp.tpl[i] < 0 ? -sp.tpl[i] : sp.tpl[i];
                        score += us[t];
                        if (rand_score < score) {
                            bestTemplate = sp.tpl[i];
                            start = sp.starts[i];
                            end = sp.ends[i];
                            break;
                        }
                    }
                    if (bestTemplate == 0)
                        tot = 0;
                } else {
                    tot = 0;
                }
                if (tot == 0) {
                    ll bt = cc1_choice(rec, 0, &start, &end);
                    if (bt == LLONG_MIN) {
                        bt = 0;
                        start = 0;
                        end = 0;
                    }
                    bestTemplate = bt;
                }
            } else if (sp.t_off[rec + 1] > sp.t_off[rec]) {
                ll b = sp.t_off[rec];
                bestTemplate = sp.tpl[b];
                start = sp.starts[b];
                end = sp.ends[b];
            } else {
                bestTemplate = stale_t;
                start = stale_s;
                end = stale_e;
            }
            if (sp.t_off[rec + 1] > sp.t_off[rec]) {
                ll b = sp.t_off[rec];
                stale_t = sp.tpl[b];
                stale_s = sp.starts[b];
                stale_e = sp.ends[b];
            }
            commit(rec, bestTemplate, start, end, true);
        }
    }
    // reference drains per-template lists LIFO per -mf flush chunk
    // (frags.c:40-56; FragSpool chunk order in assign/conclave.py)
    for (auto &v : R->frags) {
        size_t i = 0;
        while (i < v.size()) {
            size_t j = i;
            while (j < v.size() && v[j].chunk == v[i].chunk)
                ++j;
            std::reverse(v.begin() + i, v.begin() + j);
            i = j;
        }
    }
}

// Per-template fragment staging for assembly: sizes first, then fill.
void krun_stage_meta(void *hv, long long t, long long *n_frags,
                     long long *codes_bytes, long long *header_bytes) {
    Run *R = (Run *)hv;
    auto &v = R->frags[t];
    ll cb = 0, hb = 0;
    for (auto &f : v) {
        cb += R->spool.q_len[f.rec];
        hb += R->spool.hdr_off[f.rec + 1] - R->spool.hdr_off[f.rec];
    }
    *n_frags = (ll)v.size();
    *codes_bytes = cb;
    *header_bytes = hb;
}

// Fill the per-frag arrays the assembly batch consumes
// (pipeline.assemble_template staging): codes (rc-applied), q-bounds
// (inverted for rc, conclave.c:137-145), fstats {score,start,end},
// best_hits/flag (frag_row columns), headers (inverted bounds applied).
void krun_stage_fill(void *hv, long long t, int32_t *q_len,
                     int32_t *best_hits, long long *score, int32_t *qb,
                     int32_t *fstats, int32_t *flag, uint8_t *codes_out,
                     long long *codes_off, uint8_t *hdr_out,
                     long long *hdr_off) {
    Run *R = (Run *)hv;
    Spool &sp = R->spool;
    auto &v = R->frags[t];
    ll co = 0, ho = 0;
    codes_off[0] = 0;
    hdr_off[0] = 0;
    for (size_t i = 0; i < v.size(); ++i) {
        FragOut &f = v[i];
        ll rec = f.rec;
        ll ql = sp.q_len[rec];
        q_len[i] = (int32_t)ql;
        int bh = sp.best_hits[rec] < 0 ? -sp.best_hits[rec]
                                       : sp.best_hits[rec];
        best_hits[i] = bh;
        score[i] = f.score;
        fstats[3 * i] = (int32_t)f.score;
        fstats[3 * i + 1] = f.start;
        fstats[3 * i + 2] = f.end;
        flag[i] = sp.flag[rec] | (f.rc ? 16 : 0);
        // codes
        const uint8_t *c = sp.cod.data() + sp.cod_off[rec];
        if (f.rc) {
            for (ll j = 0; j < ql; ++j)
                codes_out[co + j] = RC_CODE[c[ql - 1 - j]];
        } else {
            memcpy(codes_out + co, c, (size_t)ql);
        }
        // header (+ q-bound mirror for rc, invert_qbounds)
        const uint8_t *h = sp.hdr.data() + sp.hdr_off[rec];
        ll hl = sp.hdr_off[rec + 1] - sp.hdr_off[rec];
        memcpy(hdr_out + ho, h, (size_t)hl);
        int qs = 0, qe = (int)ql;
        bool has_b = hl > 9 && h[hl - 9] == 0;
        if (has_b) {
            int32_t bb[2];
            memcpy(bb, h + hl - 8, 8);
            qs = bb[0];
            qe = bb[1];
            if (f.rc) {
                int32_t nb[2] = {(int32_t)(ql - qe), (int32_t)(ql - qs)};
                memcpy(hdr_out + ho + hl - 8, nb, 8);
                qs = nb[0];
                qe = nb[1];
            }
        }
        qb[2 * i] = qs;
        qb[2 * i + 1] = qe;
        co += ql;
        ho += hl;
        codes_off[i + 1] = co;
        hdr_off[i + 1] = ho;
    }
}

void *krun_template_handle(void *hv, long long t) {
    return ((Run *)hv)->handle_for((int)t);
}

long long krun_spool_len(void *hv) { return (ll)((Run *)hv)->spool.size(); }

// Raw spool export (collect mode / .frag_raw.gz rows): sizes then arrays.
void krun_spool_meta(void *hv, long long *n, long long *tpl_total,
                     long long *cod_bytes, long long *hdr_bytes) {
    Spool &sp = ((Run *)hv)->spool;
    *n = (ll)sp.size();
    *tpl_total = sp.t_off.back();
    *cod_bytes = sp.cod_off.back();
    *hdr_bytes = sp.hdr_off.back();
}

void krun_spool_fill(void *hv, int32_t *q_len, int32_t *best_hits,
                     long long *score, int32_t *flag, long long *ord,
                     int32_t *tpl, int32_t *starts, int32_t *ends,
                     long long *t_off, uint8_t *cod, long long *cod_off,
                     uint8_t *hdr, long long *hdr_off) {
    Spool &sp = ((Run *)hv)->spool;
    size_t n = sp.size();
    memcpy(q_len, sp.q_len.data(), n * 4);
    memcpy(best_hits, sp.best_hits.data(), n * 4);
    memcpy(score, sp.score.data(), n * 8);
    memcpy(flag, sp.flag.data(), n * 4);
    memcpy(ord, sp.ord.data(), n * 8);
    memcpy(tpl, sp.tpl.data(), sp.tpl.size() * 4);
    memcpy(starts, sp.starts.data(), sp.starts.size() * 4);
    memcpy(ends, sp.ends.data(), sp.ends.size() * 4);
    memcpy(t_off, sp.t_off.data(), (n + 1) * 8);
    memcpy(cod, sp.cod.data(), sp.cod.size());
    memcpy(cod_off, sp.cod_off.data(), (n + 1) * 8);
    memcpy(hdr, sp.hdr.data(), sp.hdr.size());
    memcpy(hdr_off, sp.hdr_off.data(), (n + 1) * 8);
}

}  // extern "C"
