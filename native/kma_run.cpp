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
#include <cstdarg>
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
void kchain_set_proxi(void *h, double frac, long long *soft);
// save_kmers_HMM helpers (kma_chain.cpp; Python flow: hmm_scan.py)
void kchain_lookup_windows(void *h, const uint8_t *fold, int seqlen,
                           long long *out);
int kchain_hmm_region(const long long *VFL_a, const long long *VRL_a,
                      long long *VFs, long long *VRs,
                      const long long *NN, int seqlen, int k,
                      int exhaustive, const double *hp, long long *state,
                      long long *out,
                      long long vr0, long long *hfix);
long long kchain_lookup_kmer(void *h, unsigned long long kmer);
int kchain_score_window_runs(void *h, const long long *win, long long n,
                             long long *Score_, int *bt, int nb);
void kchain_cut_limits(void *h, const long long *VFs,
                       const long long *VRs, long long start,
                       long long jj, const int *region, int nreg,
                       long long *out2);
long long kchain_hmm_extend(void *h, long long *VF, long long *VR,
                            long long n_windows, long long lo,
                            long long hi, long long *Score_,
                            long long *Score_r_, unsigned char *include,
                            long long DB_size, int mode,
                            double proxi_score_or_bestcov,
                            long long base_count, int *reg,
                            long long reg_len_in, long long *soft,
                            long long *state);
void kchain_dec_voffs(void *h, const long long *voffs, long long n,
                      long long *Score_);
int kchain_scan_read(void *h, const uint8_t *codes, int seqlen,
                     int exhaustive, long long minlen, double coverT,
                     double mrs, double mrc, int lc, long long *Score,
                     long long *extendScore, uint8_t *include,
                     uint8_t *hit_rc, long long *hit_sc, int *hit_b0,
                     int *hit_b1, long long *tpl_off, int *tpl_flat,
                     int cap_hits, long long cap_tpl);
int kchain_scan_read_v(void *h, const uint8_t *codes, int seqlen,
                       const long long *voff_f, const long long *voff_r,
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
int kchain_pair_mate_v(void *h, const uint8_t *codes, int seqlen,
                       int exhaustive, long long *Score_,
                       long long *Score_r_, long long *extendScore_,
                       uint8_t *include, int *bests_out, int *nb_out,
                       int *bests_r_out, int *nbr_out,
                       const long long *voff_fw, const long long *voff_rc);
void kaln_pe_score_batch(
    void *const *handles, int32_t *tpl_ids, const int64_t *tpl_off,
    const uint8_t *a_flat, const int64_t *a_off, const uint8_t *b_flat,
    const int64_t *b_off, const uint8_t *arc_flags, int n_pairs, int M,
    int MM, int U, int W1, const int32_t *dmat, int mq, int n_threads,
    long long *o_sc1, int32_t *o_pos1, int32_t *o_len1, int32_t *o_tg1,
    int32_t *o_qg1, long long *o_sc2, int32_t *o_pos2, int32_t *o_len2,
    int32_t *o_tg2, int32_t *o_qg2, uint8_t *out_flipped,
    int minlen, double mrc);
void *kidx_create(const uint8_t *codes, int len, int kmersize);
const uint8_t *kidx_codes(void *h);
void* kxml_create(const int32_t* dmat, int W1, int U);
void kxml_free(void* s);
long long kxml_rows_len(void* s);
void kxml_rows_fetch(void* s, uint8_t* buf);
long long kaln_sam_emit_row(uint8_t *buf, long long cap, long long w,
                            const uint8_t *hdr, long long hdr_len,
                            const uint8_t *name, long long name_len,
                            const uint8_t *seq_codes, long long q_len,
                            int flag, int mapq, long long pos,
                            long long tlen, const void *aligned, int et,
                            long long as_score);
long long kassem_template_frags_sam(
    void *h, const uint8_t *codes_flat, const int64_t *codes_off,
    const int32_t *qbounds, const int32_t *fstats, int n_frags, int M,
    int MM, int U, int W1, const int32_t *dmat, int Wl_raw, int minlen,
    int mq, double scoreT, double mrc, int circular, int ts,
    int skip_tails, int dense, long long *counts, long long *next_,
    long long mat_len, int t_len_, uint8_t *o_acc, uint8_t *o_rc,
    long long *o_read_score, long long *o_mat_score, int32_t *o_start,
    int32_t *o_end, int32_t *o_len, int sam_mask,
    const uint8_t *hdr_flat, const int64_t *hdr_off,
    const int32_t *bhs, const int32_t *sflags, const uint8_t *name,
    long long name_len, uint8_t *sam_buf, long long sam_cap,
    long long *sam_len, void *xml_sink, long long xml_tpl);
void kassem_consensus(const long long *counts, const long long *nxt,
                      const unsigned char *template_codes, int t_len,
                      long long asm_len, int bcd, double evalue,
                      double support, int base_caller, int significant,
                      unsigned char *t_arr, unsigned char *s_arr,
                      unsigned char *q_arr, long long *out_stats);
void kidx_free(void *h);
long long kassem_template_frags(
    void *h, const uint8_t *codes_flat, const int64_t *codes_off,
    const int32_t *qbounds, const int32_t *fstats, int n_frags, int M,
    int MM, int U, int W1, const int32_t *dmat, int Wl_raw, int minlen,
    int mq, double scoreT, double mrc, int circular, int ts,
    int skip_tails, int dense, long long *counts, long long *next_,
    long long mat_len, int t_len_, uint8_t *o_acc, uint8_t *o_rcu,
    long long *o_rs, long long *o_ms, int32_t *o_st, int32_t *o_en,
    int32_t *o_ln);
void kaln_prof_report(void);
long long kassem_matrix_rows(const long long *counts, const long long *nxt,
                             long long mat_len, int t_len,
                             const unsigned char *template_codes,
                             const unsigned char *name, long long name_len,
                             unsigned char *buf, long long cap);
long long kassem_vcf_rows(const long long *counts, const long long *nxt,
                          long long mat_len, int t_len,
                          const unsigned char *assem_t, long long assem_len,
                          const unsigned char *name, long long name_len,
                          double evalue, double support, int bcd, int filt,
                          int base_caller, int significant,
                          unsigned char *buf, long long cap);
void kassem_ef(const long long *counts, const long long *order,
               const unsigned char *template_codes, int t_len,
               long long mat_len, double highVar, long long *out);
void kassem_walk(const long long *next_, long long mat_len,
                 long long *order);
void kaln_frags_se_batch_mf(
    void *const *handles, const int32_t *tpl_ids, const int64_t *tpl_off,
    const uint8_t *codes_flat, const int64_t *codes_off,
    const int32_t *npos_flat, const int64_t *npos_off,
    const int32_t *qbounds, const uint8_t *arc_flags,
    const uint8_t *crc_flat, const int64_t *crc_off, int n_reads, int M,
    int MM, int U, int W1, const int32_t *dmat, int kmersize, int minlen,
    int mq, double scoreT, double mrc, int n_threads, double sel_min_frac,
    int32_t *out_nhits, long long *out_best_score, double *out_best_frac,
    int32_t *out_tpl, int32_t *out_start, int32_t *out_end,
    long long *out_score, int32_t *out_len);
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
    int read;            // batch-local read/pair index
    ll sc;               // rc_flag (signed best score)
    int b0, b1;          // chain q-bounds; -1 = absent (-1t1)
    int flag;            // sam-flag part
    uint8_t hsrc;        // header source: 0 = read/mate a, 1 = mate b
    ll cod_off;          // emit codes in the unit arena
    int q_len;
    ll tpl_off;          // candidates in the unit tpl arena
    int n_tpl;
    // HMM ankers: sliced header (the "\tstart\tend" suffix) and the
    // whole-word-slice custom rc (AnkerHit.rc_override); -1 = none
    ll hdr_off = -1;
    int hdr_len = 0;
    ll crc_off = -1;
    int crc_len = 0;
};

// One proper-pair emit (printPair, ankers.c:150-161) awaiting PE step 3.
struct PairPend {
    int item;
    ll sc_a, sc_b;
    int flag_a, flag_b;
    uint8_t hsrc_a, hsrc_b;
    ll cod_a_off, cod_b_off;
    int la, lb;
    ll tpl_off;          // rec1 candidates in the tpl arena
    int n_tpl;
};

struct Scratch {
    void *ctx = nullptr;
    long long *soft = nullptr;   // per-thread softProxi accumulator
    std::vector<uint8_t> sam_scan;   // PE scan-phase unmapped rows
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
    std::vector<uint8_t> hdr_arena;   // HMM sliced headers
    std::vector<uint8_t> crc_arena;   // HMM custom rc codes
    // save_kmers_HMM scratch (scan_read_hmm)
    std::vector<ll> VFL, VRL, VFs, VRs, NNv;
    std::vector<int> bt, btr, reg_buf, hreg;
    std::vector<uint8_t> fold, rc_fold;
    // model of step 2's reused qseq_comp buffer (HmmCompBuf): residue
    // bases of earlier longer reads are observable through the
    // whole-word rc slice quirk
    std::vector<uint8_t> comp_base = std::vector<uint8_t>(1024, 0);
    // PE: pair emits + per-item ordered skeleton (kind 0 = SE unit,
    // kind 1 = pair; idx into units/pairs)
    std::vector<PairPend> pairs;
    std::vector<std::pair<uint8_t, int>> order;
    // pair-combiner scratch (cleared per pair)
    std::vector<int> region, best2;
    std::vector<ll> rscores;

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
    // PE mate payload (update_Scores_pe tail, updatescores.c:480-485);
    // empty slices / mflag -1 for SE records
    std::vector<uint8_t> mcod;
    std::vector<ll> mcod_off{0};
    std::vector<uint8_t> mhdr;
    std::vector<ll> mhdr_off{0};
    std::vector<int32_t> mflag;
    size_t size() const { return q_len.size(); }
};

// A read assigned to one template by conclave (frags.h Frag).
struct FragOut {
    int32_t rec;        // spool record index
    uint8_t rc;         // assigned to the reverse strand
    uint8_t mate;       // PE mate frag (conclave.c:169-194)
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
    // -proxi scan-level state (krun_set_proxi; kmers.c:132-151): the
    // scanners see |minFrac|; soft accumulators are PER THREAD so -t>1
    // stays deterministic, summed into alignment_scores at ConClave
    // time (runkma.c:1153-1156 replacement semantics)
    double scan_min_frac = 1.0;
    bool scan_soft = false;
    std::vector<std::vector<ll>> soft_bufs;
    ll contamination = -1;         // deCon pseudo-template id, -1 = none
    int n_threads = 1;
    ll pe_reward = 7;              // PE pair reward (kma.c:337)
    int mem_mode = 0;              // -mem_mode: spool step-2 ankers directly

    // template store (.seq.b mmap)
    int seq_fd = -1;
    const uint8_t *seq_map = (const uint8_t *)MAP_FAILED;
    size_t seq_bytes = 0;
    std::vector<ll> seq_off;       // byte offset of template t
    std::vector<void *> handles;   // TIndex* per template (lazy)
    std::mutex handle_mu;
    // background prebuilder: fills `handles` while the scan phase runs
    // (the reference overlaps input parsing with mapping the same way)
    std::thread prebuild_th;
    std::atomic<int> prebuild_stop{0};

    // accumulators + spool
    std::vector<ll> alignment_scores, uniq_alignment_scores;
    Spool spool;

    // conclave output
    std::vector<std::vector<FragOut>> frags;   // per template

    // SAM stream (samwrite rows in emission order; taken+cleared by
    // the caller via krun_sam_fetch)
    std::vector<uint8_t> out_sam;
    std::vector<uint8_t> pe_sam3;   // PE step-3 unmapped rows (batch)
    int sam_mask = 0;
    // -tsv rows (printsv, tsv.c:49-108)
    std::vector<uint8_t> out_tsv;
    unsigned long long tsv_mask = 0;
    // -xml: persistent hit sink (leaked Hsp buffers span templates)
    void *xml_sink = nullptr;
    std::vector<uint8_t> out_xml;
    // krun_output_all buffers (fetched then cleared by Python)
    std::vector<uint8_t> out_res, out_fsa, out_aln, out_frag;
    std::vector<uint8_t> out_mat, out_vcf, out_ef;
    // per-printed-template segment table: template id + the 7 buffer
    // byte counts it contributed (multi-host by-template stitch)
    std::vector<int32_t> seg_tpl;
    std::vector<ll> seg_lens;

    // KMA_RUN_PROF=1 phase timing (seconds)
    double t_scan = 0, t_build = 0, t_score = 0, t_spool = 0;

    ~Run() {
        prebuild_stop.store(1);
        if (prebuild_th.joinable())
            prebuild_th.join();
        if (getenv("KMA_RUN_PROF")) {
            fprintf(stderr,
                    "# krun prof: scan %.3f build %.3f score %.3f "
                    "spool %.3f\n",
                    t_scan, t_build, t_score, t_spool);
            kaln_prof_report();
        }
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



// A flattened SE scoring unit: emit codes + header + candidates resolved.
struct SUnit {
    int flag, q_len, b0, b1;
    int read = 0;        // batch-local read index (SAM row ordering)
    ll sc, ord;
    const uint8_t *cod;
    const uint8_t *hdr;
    ll hlen;
    const uint8_t *crc = nullptr;   // custom rc codes (HMM slices)
    int crc_len = 0;
};

struct SEOut {
    std::vector<int32_t> nh, tpl, start, end, len;
    std::vector<ll> best, score;
    std::vector<double> frac;
};

// decon + short-read gates, then append the unit + its candidate slice
// (pipeline._consume semantics).  hdr_b/hoff_b: mate-b header stream for
// PE units (hsrc == 1); null for SE batches.
static void collect_se_unit(Run *R, Scratch &S, PendUnit &u,
                            const uint8_t *hdr_a, const ll *hoff_a,
                            const uint8_t *hdr_b, const ll *hoff_b,
                            const ll *ords, std::vector<SUnit> &units,
                            std::vector<int32_t> &tpl_ids,
                            std::vector<int64_t> &tpl_offv) {
    int n_tpl = u.n_tpl;
    int32_t *t = S.tpl_arena.data() + u.tpl_off;
    if (R->contamination >= 0) {
        n_tpl = decon_filter(t, n_tpl, R->contamination);
        if (!n_tpl)
            return;
    }
    if (R->ix.k > u.q_len)
        return;
    SUnit w;
    w.flag = u.flag;
    w.read = u.read;
    w.q_len = u.q_len;
    w.b0 = u.b0;
    w.b1 = u.b1;
    w.sc = u.sc;
    w.ord = ords[u.read];
    w.cod = S.cod_arena.data() + u.cod_off;
    if (u.hdr_off >= 0) {
        // HMM anker: suffixed header from the scratch arena
        w.hdr = S.hdr_arena.data() + u.hdr_off;
        w.hlen = u.hdr_len;
    } else if (u.hsrc == 0) {
        w.hdr = hdr_a + hoff_a[u.read];
        w.hlen = hoff_a[u.read + 1] - hoff_a[u.read];
    } else {
        w.hdr = hdr_b + hoff_b[u.read];
        w.hlen = hoff_b[u.read + 1] - hoff_b[u.read];
    }
    if (u.crc_off >= 0) {
        w.crc = S.crc_arena.data() + u.crc_off;
        w.crc_len = u.crc_len;
    }
    tpl_ids.insert(tpl_ids.end(), t, t + n_tpl);
    tpl_offv.push_back((ll)tpl_ids.size());
    units.push_back(w);
}

// ensure native template handles exist for every candidate id
static void build_handles_for(Run *R, const std::vector<int32_t> &tpl_ids) {
    std::vector<int32_t> uniq(tpl_ids);
    for (auto &t : uniq)
        t = t < 0 ? -t : t;
    std::sort(uniq.begin(), uniq.end());
    uniq.erase(std::unique(uniq.begin(), uniq.end()), uniq.end());
    std::vector<int32_t> missing;
    for (int32_t t : uniq)
        if (!R->handles[t])
            missing.push_back(t);
    if (missing.empty())
        return;
    std::atomic<size_t> next(0);
    auto build = [&]() {
        for (;;) {
            size_t i = next.fetch_add(1);
            if (i >= missing.size())
                break;
            R->handle_for(missing[i]);
        }
    };
    int nt = R->n_threads;
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

// threaded alnFragsSE scoring over the collected units
static void score_se_batch(Run *R, const std::vector<SUnit> &units,
                           std::vector<int32_t> &tpl_ids,
                           const std::vector<int64_t> &tpl_offv, SEOut &o) {
    int m = (int)units.size();
    auto _snow = []() {
        return std::chrono::duration<double>(
                   std::chrono::steady_clock::now().time_since_epoch())
            .count();
    };
    const bool sprof = getenv("KMA_ALN_PROF") != nullptr;
    double st0 = sprof ? _snow() : 0.0;
    build_handles_for(R, tpl_ids);
    if (sprof) {
        fprintf(stderr, "# score stage: handles %.3f\n", _snow() - st0);
        st0 = _snow();
    }
    std::vector<void *> handles(tpl_ids.size());
    for (size_t i = 0; i < tpl_ids.size(); ++i)
        handles[i] = R->handles[tpl_ids[i] < 0 ? -tpl_ids[i] : tpl_ids[i]];
    std::vector<int64_t> cod_offv(m + 1, 0), npos_offv(m + 1, 0);
    bool any_crc = false;
    for (int i = 0; i < m; ++i) {
        cod_offv[i + 1] = cod_offv[i] + units[i].q_len;
        if (units[i].crc)
            any_crc = true;
    }
    std::vector<uint8_t> cod_flat((size_t)cod_offv[m]);
    std::vector<int32_t> npos_flat;
    std::vector<int32_t> qb(2 * m);
    std::vector<uint8_t> arcs(m);
    std::vector<uint8_t> crc_flat;
    std::vector<int64_t> crc_offv;
    if (any_crc)
        crc_offv.assign(m + 1, 0);
    for (int i = 0; i < m; ++i) {
        const SUnit &u = units[i];
        memcpy(cod_flat.data() + cod_offv[i], u.cod, u.q_len);
        for (int j = 0; j < u.q_len; ++j)
            if (u.cod[j] == 4)
                npos_flat.push_back(j);
        npos_offv[i + 1] = (ll)npos_flat.size();
        if (u.b0 >= 0 || u.b1 >= 0) {
            qb[2 * i] = u.b0;
            qb[2 * i + 1] = u.b1;
        } else {
            qb[2 * i] = 0;
            qb[2 * i + 1] = u.q_len;
        }
        arcs[i] = u.sc < 0 ? 1 : 0;
        if (any_crc) {
            if (u.crc)
                crc_flat.insert(crc_flat.end(), u.crc, u.crc + u.crc_len);
            crc_offv[i + 1] = (ll)crc_flat.size();
        }
    }
    if (npos_flat.empty())
        npos_flat.push_back(0);
    ll total = tpl_offv[m];
    o.nh.resize(m);
    o.best.resize(m);
    o.frac.resize(m);
    o.tpl.resize(total);
    o.start.resize(total);
    o.end.resize(total);
    o.score.resize(total);
    o.len.resize(total);
    if (sprof) {
        fprintf(stderr, "# score stage: arrays %.3f\n", _snow() - st0);
        st0 = _snow();
    }
    kaln_frags_se_batch_mf(
        handles.data(), tpl_ids.data(), tpl_offv.data(), cod_flat.data(),
        cod_offv.data(), npos_flat.data(), npos_offv.data(), qb.data(),
        arcs.data(), any_crc ? crc_flat.data() : nullptr,
        any_crc ? crc_offv.data() : nullptr, m, (int)R->ix.M, (int)R->ix.MM,
        (int)R->ix.U, (int)R->ix.W1, R->dmat, R->ix.k, R->minlen, R->mq,
        R->scoreT, R->mrc, R->n_threads, R->aln_min_frac, o.nh.data(),
        o.best.data(), o.frac.data(), o.tpl.data(), o.start.data(),
        o.end.data(), o.score.data(), o.len.data());
    if (sprof)
        fprintf(stderr, "# score stage: batch %.3f\n", _snow() - st0);
}

// one unit's update_Scores selection + spool append
// (updatescores.c:203-298; pipeline.flush_aln)
static void emit_se_spool(Run *R, const SUnit &u,
                          const std::vector<int32_t> &tpl_ids,
                          const std::vector<int64_t> &tpl_offv, SEOut &o,
                          int i) {
    Spool &sp = R->spool;
    const double min_frac = R->aln_min_frac;
    const int k = R->ix.k;
    ll best = o.best[i];
    if (best <= k)
        return;
    ll b = tpl_offv[i];
    int nh = o.nh[i];
    double best_frac = o.frac[i];
    int first_sel = (int)sp.tpl.size();
    static thread_local std::vector<ll> sel_sc;
    sel_sc.clear();
    if (min_frac == 1.0) {
        for (int j = 0; j < nh; ++j) {
            ll sc = o.score[b + j];
            int ln = o.len[b + j];
            double min_score = ln ? (double)(sc / ln) : 0.0;
            if (min_score == best_frac || sc == best) {
                sp.tpl.push_back(o.tpl[b + j]);
                sp.starts.push_back(o.start[b + j]);
                sp.ends.push_back(o.end[b + j]);
                sel_sc.push_back(sc);
            }
        }
    } else {
        double mf = min_frac < 0 ? -min_frac : min_frac;
        double min_score = mf * best_frac;
        double min_read = mf * (double)best;
        bool acc_is_score = min_frac < 0;
        for (int j = 0; j < nh; ++j) {
            ll sc = o.score[b + j];
            if ((double)o.len[b + j] * min_score <= (double)sc ||
                min_read <= (double)sc) {
                sp.tpl.push_back(o.tpl[b + j]);
                sp.starts.push_back(o.start[b + j]);
                sp.ends.push_back(o.end[b + j]);
                sel_sc.push_back(acc_is_score ? sc : best);
            }
        }
    }
    int n_sel = (int)((ll)sp.tpl.size() - first_sel);
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
    sp.ord.push_back(u.ord);
    sp.hdr.insert(sp.hdr.end(), u.hdr, u.hdr + u.hlen);
    if (u.b0 >= 0 || u.b1 >= 0) {
        sp.hdr.push_back(0);
        int32_t bb[2] = {u.b0, u.b1};
        const uint8_t *bp = (const uint8_t *)bb;
        sp.hdr.insert(sp.hdr.end(), bp, bp + 8);
    }
    sp.hdr_off.push_back((ll)sp.hdr.size());
    sp.cod.insert(sp.cod.end(), u.cod, u.cod + u.q_len);
    sp.cod_off.push_back((ll)sp.cod.size());
    sp.mcod_off.push_back((ll)sp.mcod.size());
    sp.mhdr_off.push_back((ll)sp.mhdr.size());
    sp.mflag.push_back(-1);
}

// One read's step-2 scan -> PendUnit emits appended to S (save_kmers
// -1t1, savekmers.c:2442-3065 / save_kmers_chain, savekmers.c:5127-5944;
// the emit rules mirror mapping/scan.py:315-360 and NativeChain.scan).
// ---- save_kmers_HMM scan (savekmers.c:3866-4522; Python reference
// flow mapping/hmm_scan.py).  Envelope: non-proxi, non-deCon (the CLI
// falls back to Python outside it); mem_mode follows
// ankerAndClean_MEM's non-proxi branch. -----------------------------------

// dec_clear over window range [lo, hi) (savekmers.c:4731-4802)
static void hmm_dec_range(Scratch &S, ll lo, ll hi) {
    if (lo < 0)
        lo = 0;
    ll n = (ll)S.VFs.size();
    if (hi > n)
        hi = n;
    if (hi <= lo)
        return;
    for (int which = 0; which < 2; ++which) {
        std::vector<ll> &arr = which ? S.VRs : S.VFs;
        std::vector<ll> &sc = which ? S.Score_r : S.Score;
        for (ll el = lo; el < hi; ++el) {
            ll v = arr[el];
            if (v >= 0) {
                kchain_dec_voffs(S.ctx, &v, 1, sc.data());
                arr[el] = -1;
            }
        }
    }
}

// ankerAndClean + slice emission for one carved region
// (savekmers.c:4522-4853; hmm_scan.py _anker_and_clean)
static void emit_hmm_anker(Run *R, Scratch &S, const uint8_t *q,
                           int seqlen, int item, int HIT, ll bestScore,
                           ll start_cut, ll end_cut, bool mem,
                           const uint8_t *hdr, ll hlen) {
    const ll DB_size = R->db_size;
    std::vector<int> &reg = S.hreg;
    ll cursor = (ll)reg.size() - 1;
    if (!mem) {
        for (int t : reg)
            S.include[t < 0 ? -t : t] = 1;
        ll bestHitsCov = LLONG_MAX;
        for (int t : reg) {
            ll tl = R->tlen[t < 0 ? -t : t];
            if (tl < bestHitsCov)
                bestHitsCov = tl;
        }
        if ((ll)S.reg_buf.size() < DB_size + (ll)reg.size() + 2)
            S.reg_buf.resize(DB_size + (ll)reg.size() + 2);
        std::fill(S.reg_buf.begin(), S.reg_buf.end(), 0);
        for (size_t z = 0; z < reg.size(); ++z)
            S.reg_buf[z] = reg[z];
        ll state[3];
        state[0] = cursor;
        state[1] = HIT;
        double bestCov = (double)bestScore / (double)bestHitsCov;
        memcpy(&state[2], &bestCov, 8);
        kchain_hmm_extend(S.ctx, S.VFs.data(), S.VRs.data(),
                          (ll)S.VFs.size(), start_cut + 92, end_cut - 92,
                          S.Score.data(), S.Score_r.data(),
                          S.include.data(), DB_size, 0, 0.0,
                          (ll)reg.size(), S.reg_buf.data(),
                          (ll)reg.size(), nullptr, state);
        cursor = state[0];
        HIT = (int)state[1];
        reg.assign(S.reg_buf.begin(), S.reg_buf.begin() + cursor + 1);
        // clear nearest templates on both sides
        ll end = seqlen < start_cut + 92 ? seqlen : start_cut + 92;
        start_cut = start_cut - 92 > 0 ? start_cut - 92 : 0;
        hmm_dec_range(S, start_cut, end);
        end = end_cut - 92 > 0 ? end_cut - 92 : 0;
        end_cut = seqlen < end_cut + 92 ? seqlen : end_cut + 92;
        hmm_dec_range(S, end + 1, end_cut + 1);
        for (int t : reg)
            S.include[t < 0 ? -t : t] = 0;
        start_cut = start_cut - 92 > 0 ? start_cut - 92 : 0;
        end_cut = seqlen < end_cut + 92 ? seqlen : end_cut + 92;
    } else {
        start_cut = start_cut - 92 > 0 ? start_cut - 92 : 0;
        end_cut = seqlen < end_cut + 92 ? seqlen : end_cut + 92;
        hmm_dec_range(S, start_cut, end_cut);
    }

    // modify limits of match seq: 32-align + N slice
    start_cut = (start_cut >> 5) << 5;
    {
        ll e32 = ((end_cut >> 5) << 5) + 32;
        end_cut = e32 < seqlen ? e32 : seqlen;
    }
    ll tmplen = end_cut - start_cut;
    static thread_local std::vector<int> tmpN;
    tmpN.clear();
    for (ll z = 1; z < S.NNv[0]; ++z) {
        if (start_cut <= S.NNv[z]) {
            ll p = S.NNv[z] - start_cut;
            if (p >= tmplen)
                break;
            tmpN.push_back((int)p);
        }
    }
    tmplen -= 1;
    size_t ln = tmpN.size();
    while (ln && tmpN[ln - 1] == tmplen) {
        --tmplen;
        --ln;
    }
    tmplen += 1;
    tmpN.resize(ln);

    PendUnit u;
    u.read = item;
    u.hsrc = 0;
    u.b0 = u.b1 = -1;
    u.q_len = (int)tmplen;
    u.sc = (ll)HIT * bestScore;
    u.flag = 0;
    u.cod_off = (ll)S.cod_arena.size();
    S.cod_arena.insert(S.cod_arena.end(), q + start_cut,
                       q + start_cut + tmplen);
    u.tpl_off = (ll)S.tpl_arena.size();
    S.tpl_arena.insert(S.tpl_arena.end(), reg.begin(), reg.end());
    u.n_tpl = (int)reg.size();
    // sprintf at header->len-1 overwrites the trailing NUL and appends
    // a new one (savekmers.c:4853)
    u.hdr_off = (ll)S.hdr_arena.size();
    char suf[48];
    int sn = snprintf(suf, sizeof(suf), "\t%lld\t%lld",
                      (long long)start_cut, (long long)end_cut);
    S.hdr_arena.insert(S.hdr_arena.end(), hdr, hdr + (hlen - 1));
    S.hdr_arena.insert(S.hdr_arena.end(), (const uint8_t *)suf,
                       (const uint8_t *)suf + sn);
    S.hdr_arena.push_back(0);
    u.hdr_len = (int)((ll)S.hdr_arena.size() - u.hdr_off);
    // whole-word slices: step 3's rc read is the shifted view through
    // the reused step-2 packed buffer (compdna.c:250-270 quirk)
    if (tmplen && tmplen % 32 == 0) {
        u.crc_off = (ll)S.crc_arena.size();
        u.crc_len = (int)tmplen;
        // true_rc = reverse(3 - comp_base[start_cut : start_cut +
        // tmplen + 32])[:tmplen]; the +32 window may expose residue
        // bases of an earlier, longer read (HmmCompBuf semantics)
        for (ll i = 0; i < tmplen; ++i) {
            ll xx = start_cut + tmplen + 32 - 1 - i;
            uint8_t c = xx < (ll)S.comp_base.size() ? S.comp_base[xx] : 0;
            S.crc_arena.push_back((uint8_t)(3 - c));
        }
        // unCompDNA restores Ns at the TRUE-rc N positions
        for (size_t z = 0; z < tmpN.size(); ++z) {
            ll npr = (tmplen - 1) - (ll)tmpN[z];
            S.crc_arena[u.crc_off + npr] = 4;
        }
    }
    S.units.push_back(u);
    S.order.emplace_back(0, (int)S.units.size() - 1);
}

static void scan_read_hmm(Run *R, Scratch &S, const uint8_t *q,
                          int q_len, int item, const uint8_t *hdr,
                          ll hlen, const ll *vf = nullptr,
                          const ll *vr = nullptr) {
    const int k = R->ix.k;
    const int seqlen = q_len;
    // HmmCompBuf.load: the reused step-2 packed buffer (getComp rules)
    {
        ll L = seqlen;
        ll size = (ll)S.comp_base.size();
        if (L >= size) {
            size = (L & 31) ? (((L >> 5) + 1) << 6) : (L << 1);
            S.comp_base.assign(size, 0);
        }
        ll complen = (L & 31) ? ((L >> 5) + 1) : (L >> 5);
        for (ll i = 0; i < L; ++i)
            S.comp_base[i] = q[i] & 3;
        for (ll i = L; i < complen * 32; ++i)
            S.comp_base[i] = 0;
    }
    if (seqlen < k)
        return;
    const int seqend = seqlen - k + 1;
    const ll DB_size = R->db_size;

    S.fold.resize(seqlen);
    S.rc_fold.resize(seqlen);
    for (int i = 0; i < seqlen; ++i)
        S.fold[i] = q[i] & 3;
    for (int i = 0; i < seqlen; ++i)
        S.rc_fold[i] = (uint8_t)(3 - S.fold[seqlen - 1 - i]);
    S.VFL.assign(seqend, -1);
    S.VRL.assign(seqend, -1);
    if (vf && vr) {
        // device-fed rows (devserve chain op over the FOLDED codes):
        // forward windows map 1:1; the rc rows are rc-KMER lookups in
        // forward window coordinates, so rc_fold window p is the rc
        // k-mer of forward window (seqend-1)-p
        for (int p = 0; p < seqend; ++p)
            S.VFL[p] = vf[p];
        for (int p = 0; p < seqend; ++p)
            S.VRL[p] = vr[seqend - 1 - p];
    } else {
        kchain_lookup_windows(S.ctx, S.fold.data(), seqlen,
                              S.VFL.data());
        kchain_lookup_windows(S.ctx, S.rc_fold.data(), seqlen,
                              S.VRL.data());
    }

    // qseq->N with the appended sentinel (savekmers.c:3981)
    S.NNv.clear();
    S.NNv.push_back(0);
    for (int i = 0; i < seqlen; ++i)
        if (q[i] == 4)
            S.NNv.push_back(i);
    S.NNv[0] = (ll)S.NNv.size();
    S.NNv.push_back(seqlen);

    // HMM parameters (savekmers.c:3943-3950)
    double hp[8];
    hp[0] = log(1 - pow(0.25, k));
    hp[1] = log(pow(0.25, k));
    hp[2] = log(1 - pow(0.25, k - 1) * 0.75);
    hp[3] = log(pow(0.25, k - 1) * 0.75);
    hp[4] = log(1 - 1.0 / k * 0.75 * 0.25);
    hp[5] = log(1.0 / k * 0.75 * 0.25);
    hp[6] = log(0.75);
    hp[7] = log(0.25);

    S.VFs.assign(seqlen + 1, -1);
    S.VRs.assign(seqlen + 1, -1);
    if ((ll)S.bt.size() < DB_size + 2) {
        S.bt.resize(DB_size + 2);
        S.btr.resize(DB_size + 2);
    }
    ll state3[3] = {0, (ll)(seqlen - k), 1};
    ll out4[4];
    // pure-minimizer DBs: save_kmers_HMM's uninitialized hLenR makes
    // every rc seed probe's cmer collapse to 0 until the read's first
    // hit runs an initCmer (see kchain_hmm_region's vr0/hfix doc)
    ll hfix = 1, vr0 = -1;
    if (R->ix.cmode == 2 && !R->exhaustive) {
        hfix = 0;
        vr0 = kchain_lookup_kmer(S.ctx, 0);
    }
    while (state3[2] <= S.NNv[0] && state3[1] >= 0) {
        int HIT = kchain_hmm_region(S.VFL.data(), S.VRL.data(),
                                    S.VFs.data(), S.VRs.data(),
                                    S.NNv.data(), seqlen, k,
                                    R->exhaustive, hp, state3, out4,
                                    vr0, &hfix);
        if (!HIT)
            continue;
        ll start = out4[0], j = out4[1], stop = out4[2],
           hitCounter = out4[3];
        if (hitCounter > 0
            && ((stop - start) > R->minlen || start == 0
                || stop == seqlen)) {
            int nb_f = kchain_score_window_runs(
                S.ctx, S.VFs.data() + start, j - start, S.Score.data(),
                S.bt.data(), 0);
            int nb_r = kchain_score_window_runs(
                S.ctx, S.VRs.data() + start, j - start, S.Score_r.data(),
                S.btr.data(), 0);
            // cut out template hits (savekmers.c:4404-4502)
            int HITc = HIT;
            while (HITc != 0) {
                ll mf = 0, mr = 0;
                for (int z = 0; z < nb_f; ++z)
                    if (S.Score[S.bt[z]] > mf)
                        mf = S.Score[S.bt[z]];
                for (int z = 0; z < nb_r; ++z)
                    if (S.Score_r[S.btr[z]] > mr)
                        mr = S.Score_r[S.btr[z]];
                ll bestScore = mf >= mr ? mf : mr;
                S.hreg.clear();
                if (bestScore > 0) {
                    if (mf == bestScore)
                        for (int z = 0; z < nb_f; ++z)
                            if (S.Score[S.bt[z]] == bestScore)
                                S.hreg.push_back(S.bt[z]);
                    for (int z = 0; z < nb_r; ++z)
                        if (S.Score_r[S.btr[z]] == bestScore)
                            S.hreg.push_back(-S.btr[z]);
                    ll out2[2];
                    kchain_cut_limits(S.ctx, S.VFs.data(), S.VRs.data(),
                                      start, j, S.hreg.data(),
                                      (int)S.hreg.size(), out2);
                    ll start_cut = out2[0], end_cut = out2[1];
                    if (bestScore * k
                            > (end_cut - start_cut - bestScore + k)) {
                        HITc = S.hreg.back() > 0 ? 1 : -1;
                        bool interior = (start != 0 && j != seqlen);
                        bool mem = R->mem_mode && !interior;
                        emit_hmm_anker(R, S, q, seqlen, item, HITc,
                                       bestScore, start_cut, end_cut,
                                       mem, hdr, hlen);
                    } else {
                        for (int z = 0; z < nb_f; ++z)
                            S.Score[S.bt[z]] = 0;
                        for (int z = 0; z < nb_r; ++z)
                            S.Score_r[S.btr[z]] = 0;
                        HITc = 0;
                    }
                } else {
                    for (int z = 0; z < nb_f; ++z)
                        S.Score[S.bt[z]] = 0;
                    for (int z = 0; z < nb_r; ++z)
                        S.Score_r[S.btr[z]] = 0;
                    HITc = 0;
                }
            }
        }
        // clear window maps (savekmers.c:4505-4509)
        std::fill(S.VFs.begin(), S.VFs.end(), -1);
        std::fill(S.VRs.begin(), S.VRs.end(), -1);
        state3[0] = stop + 1;
        state3[1] = seqlen - k - state3[0];
    }
}

static void scan_read_units(Run *R, Scratch &S, const uint8_t *q,
                            int q_len, int item, uint8_t hsrc,
                            const ll *voff_fw = nullptr,
                            const ll *voff_rc = nullptr) {
    const int k = R->ix.k;
    if (q_len < k)
        return;
    if (R->mode == 0) {
        int nb = 0, nbr = 0;
        ll bs[2] = {0, 0};
        kchain_save_kmers(S.ctx, q, q_len, R->exhaustive,
                          R->scan_min_frac,
                          R->scan_min_frac < 1.0 ? 1 : 0,
                          S.Score.data(), S.Score_r.data(),
                          S.extendScore.data(), S.include.data(), S.soft,
                          S.bests.data(), &nb, S.bests_r.data(), &nbr, bs);
        ll b0 = bs[0], b1 = bs[1];
        if ((b0 <= 0 && b1 <= 0) || (k > b0 && k > b1))
            return;
        PendUnit u;
        u.read = item;
        u.hsrc = hsrc;
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
        S.order.emplace_back(0, (int)S.units.size() - 1);
        return;
    }
    int nh;
    for (;;) {
        nh = kchain_scan_read_v(
            S.ctx, q, q_len, voff_fw, voff_rc,
            R->exhaustive, R->minlen, R->coverT,
            R->scoreT, R->mrc, R->lc, S.Score.data(), S.extendScore.data(),
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
        u.read = item;
        u.hsrc = hsrc;
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
                S.cod_arena[base + i] = RC_CODE[q[q_len - 1 - i]];
        }
        u.tpl_off = (ll)S.tpl_arena.size();
        u.n_tpl = (int)(S.tpl_off[hi + 1] - S.tpl_off[hi]);
        S.tpl_arena.insert(S.tpl_arena.end(),
                           S.tpl_flat.data() + S.tpl_off[hi],
                           S.tpl_flat.data() + S.tpl_off[hi + 1]);
        S.units.push_back(u);
        S.order.emplace_back(0, (int)S.units.size() - 1);
    }
}



// update_Scores_MEM / _pe_MEM (updatescores.c:26-107; pipeline.py
// handle_mem_anker): candidates and score come straight from the anker.
static void emit_mem_spool(Run *R, const SUnit &u,
                           const std::vector<int32_t> &tpl_ids,
                           const std::vector<int64_t> &tpl_offv, int i,
                           const SUnit *mate, ll mate_score) {
    Spool &sp = R->spool;
    ll b = tpl_offv[i];
    int n = (int)(tpl_offv[i + 1] - b);
    ll best_read_score = u.sc < 0 ? -u.sc : u.sc;
    int first_sel = (int)sp.tpl.size();
    bool sparse_mark = false;
    for (int t = 0; t < n; ++t) {
        int32_t id = tpl_ids[b + t];
        sp.tpl.push_back(id);
        sp.starts.push_back(0);
        sp.ends.push_back((int32_t)R->tlen[id < 0 ? -id : id]);
    }
    if (u.sc < 0 && n && tpl_ids[b + n - 1] > 0)
        sparse_mark = true;   // Sparse marker (runkma.c:1124-1126)
    ll score = best_read_score + (mate ? mate_score : 0);
    if (n == 1) {
        int t0 = sp.tpl[first_sel];
        if (t0 < 0)
            t0 = -t0;
        R->alignment_scores[t0] += score;
        R->uniq_alignment_scores[t0] += score;
    } else {
        for (int t = 0; t < n; ++t) {
            int id = sp.tpl[first_sel + t];
            R->alignment_scores[id < 0 ? -id : id] += score;
        }
    }
    sp.t_off.push_back((ll)sp.tpl.size());
    sp.q_len.push_back(u.q_len);
    sp.flag.push_back(u.flag);
    sp.best_hits.push_back(sparse_mark ? -n : n);
    sp.score.push_back(mate ? -score : score);
    sp.ord.push_back(u.ord);
    sp.hdr.insert(sp.hdr.end(), u.hdr, u.hdr + u.hlen);
    if (u.b0 >= 0 || u.b1 >= 0) {
        sp.hdr.push_back(0);
        int32_t bb[2] = {u.b0, u.b1};
        const uint8_t *bp = (const uint8_t *)bb;
        sp.hdr.insert(sp.hdr.end(), bp, bp + 8);
    }
    sp.hdr_off.push_back((ll)sp.hdr.size());
    sp.cod.insert(sp.cod.end(), u.cod, u.cod + u.q_len);
    sp.cod_off.push_back((ll)sp.cod.size());
    if (mate) {
        sp.mcod.insert(sp.mcod.end(), mate->cod, mate->cod + mate->q_len);
        sp.mhdr.insert(sp.mhdr.end(), mate->hdr, mate->hdr + mate->hlen);
        sp.mflag.push_back(mate->flag);
    } else {
        sp.mflag.push_back(-1);
    }
    sp.mcod_off.push_back((ll)sp.mcod.size());
    sp.mhdr_off.push_back((ll)sp.mhdr.size());
}


static void emit_mem_spool_pair(Run *R, const SUnit &prim,
                                const SUnit &mate, ll mate_score,
                                const int32_t *tpl, int n_tpl) {
    static thread_local std::vector<int32_t> ids;
    static thread_local std::vector<int64_t> off;
    ids.assign(tpl, tpl + n_tpl);
    off.assign({0, (int64_t)n_tpl});
    emit_mem_spool(R, prim, ids, off, 0, &mate, mate_score);
}

// ===================== paired-end machinery =============================
//
// Ports of the pair-scan combiners (savekmers.c:1383-1922, 3367-3777 /
// mapping/pair.py) and the PE step-3 appliers (alnfrags.c:1220-1972 /
// pipeline.aln_frags_union_pe, aln_frags_penalty_pe).  Sparse, proxi,
// force-pairing and SAM stay on the Python path (run_kma gates).

// getF_Best (savekmers.c:1648-1680): best over both strands into a
// signed region list (negative = rc strand); clears scores.
// getFirstForce (savekmers.c:1254-1273): keep every mate-1 best with
// its score, zero the arrays
static ll get_first_force(Scratch &S, int nb, int nbr,
                          std::vector<int> &region,
                          std::vector<ll> &rscores) {
    region.clear();
    rscores.clear();
    for (int i = 0; i < nb; ++i) {
        int t = S.bests[i];
        region.push_back(t);
        rscores.push_back(S.Score[t]);
        S.Score[t] = 0;
    }
    for (int i = 0; i < nbr; ++i) {
        int t = S.bests_r[i];
        region.push_back(-t);
        rscores.push_back(S.Score_r[t]);
        S.Score_r[t] = 0;
    }
    return region.empty() ? 0 : 1;
}

// getSecondBestForce (savekmers.c:1275-1318): mate 2 was scanned with
// SWAPPED arrays, so Score holds its RC matches pairing with mate 1's
// forward entries
static ll get_second_best_force(Scratch &S, int nb, int nbr,
                                const std::vector<int> &region,
                                const std::vector<ll> &rscores,
                                std::vector<int> &best_hits) {
    ll bestScore = 0;
    best_hits.clear();
    for (size_t i = 0; i < region.size(); ++i) {
        int t = region[i];
        ll s = 0 < t ? S.Score[t] : S.Score_r[-t];
        if (s) {
            s += rscores[i];
            if (bestScore < s) {
                bestScore = s;
                best_hits.clear();
                best_hits.push_back(t);
            } else if (bestScore == s) {
                best_hits.push_back(t);
            }
        }
    }
    for (int i = 0; i < nb; ++i)
        S.Score_r[S.bests[i]] = 0;
    for (int i = 0; i < nbr; ++i)
        S.Score[S.bests_r[i]] = 0;
    return bestScore;
}

static ll getF_best(Scratch &S, int nb, int nbr, std::vector<int> &region) {
    ll bestScore = 0;
    region.clear();
    for (int i = 0; i < nb; ++i) {
        int t = S.bests[i];
        ll sc = S.Score[t];
        if (bestScore < sc) {
            bestScore = sc;
            region.clear();
            region.push_back(t);
        } else if (bestScore == sc) {
            region.push_back(t);
        }
        S.Score[t] = 0;
    }
    for (int i = 0; i < nbr; ++i) {
        int t = S.bests_r[i];
        ll sc = S.Score_r[t];
        if (bestScore < sc) {
            bestScore = sc;
            region.clear();
            region.push_back(-t);
        } else if (bestScore == sc) {
            region.push_back(-t);
        }
        S.Score_r[t] = 0;
    }
    return bestScore;
}

// getR_Best (savekmers.c:1682-1762): mate2 best + cross-mate union;
// region is reordered with paired entries first when pe found.
static ll getR_best(Scratch &S, int nb, int nbr, std::vector<int> &region,
                    std::vector<int> &best2, bool *pe) {
    ll bestScore_r = 0;
    best2.clear();
    auto clear_best2 = [&]() {
        for (int x : best2) {
            if (0 < x)
                S.Score[x] = 0;
            else
                S.Score_r[-x] = 0;
        }
    };
    for (int i = 0; i < nb; ++i) {
        int t = S.bests[i];
        ll sc = S.Score[t];
        if (bestScore_r < sc) {
            clear_best2();
            bestScore_r = sc;
            best2.clear();
            best2.push_back(t);
        } else if (bestScore_r == sc) {
            best2.push_back(t);
        } else {
            S.Score[t] = 0;
        }
    }
    for (int i = 0; i < nbr; ++i) {
        int t = S.bests_r[i];
        ll sc = S.Score_r[t];
        if (bestScore_r < sc) {
            clear_best2();
            bestScore_r = sc;
            best2.clear();
            best2.push_back(-t);
        } else if (bestScore_r == sc) {
            best2.push_back(-t);
        } else {
            S.Score_r[t] = 0;
        }
    }
    size_t pe_hits = 0;
    for (size_t i = 0; i < region.size(); ++i) {
        int t = region[i];
        ll paired = 0 < t ? S.Score_r[t] : S.Score[-t];
        if (paired) {
            std::swap(region[pe_hits], region[i]);
            ++pe_hits;
        }
    }
    for (int x : best2) {
        if (0 < x)
            S.Score[x] = 0;
        else
            S.Score_r[-x] = 0;
    }
    if (pe_hits) {
        region.resize(pe_hits);
        *pe = true;
    } else {
        *pe = false;
    }
    return bestScore_r;
}

// getF_Proxi (savekmers.c:1764-1823): every template within
// minFrac*best over both strands (int-truncated threshold); soft mode
// accumulates kept scores into the per-thread softProxi
static ll getF_proxi(Scratch &S, Run *R, int nb, int nbr,
                     std::vector<int> &region) {
    ll bestScore = 0;
    region.clear();
    for (int i = 0; i < nb; ++i) {
        ll sc = S.Score[S.bests[i]];
        if (bestScore < sc)
            bestScore = sc;
    }
    for (int i = 0; i < nbr; ++i) {
        ll sc = S.Score_r[S.bests_r[i]];
        if (bestScore < sc)
            bestScore = sc;
    }
    ll proxiScore = (ll)(R->scan_min_frac * (double)bestScore);
    for (int i = 0; i < nb; ++i) {
        int t = S.bests[i];
        ll sc = S.Score[t];
        if (proxiScore <= sc) {
            region.push_back(t);
            if (S.soft)
                S.soft[t] += sc;
        }
        S.Score[t] = 0;
    }
    for (int i = 0; i < nbr; ++i) {
        int t = S.bests_r[i];
        ll sc = S.Score_r[t];
        if (proxiScore <= sc) {
            region.push_back(-t);
            if (S.soft)
                S.soft[t] += sc;
        }
        S.Score_r[t] = 0;
    }
    return bestScore;
}

// getR_Proxi (savekmers.c:1825-1923): mate-2 proxi filter, then the
// union reorder of mate-1's region (paired entries first, truncated on
// pe); mate-2 survivors keep their scores until after the union check
static ll getR_proxi(Scratch &S, Run *R, int nb, int nbr,
                     std::vector<int> &region, std::vector<int> &best2,
                     bool *pe) {
    ll bestScore = 0;
    best2.clear();
    for (int i = 0; i < nb; ++i) {
        ll sc = S.Score[S.bests[i]];
        if (bestScore < sc)
            bestScore = sc;
    }
    for (int i = 0; i < nbr; ++i) {
        ll sc = S.Score_r[S.bests_r[i]];
        if (bestScore < sc)
            bestScore = sc;
    }
    ll proxiScore = (ll)(R->scan_min_frac * (double)bestScore);
    for (int i = 0; i < nb; ++i) {
        int t = S.bests[i];
        ll sc = S.Score[t];
        if (proxiScore <= sc) {
            best2.push_back(t);
            if (S.soft)
                S.soft[t] += sc;
        } else {
            S.Score[t] = 0;
        }
    }
    for (int i = 0; i < nbr; ++i) {
        int t = S.bests_r[i];
        ll sc = S.Score_r[t];
        if (proxiScore <= sc) {
            best2.push_back(-t);
            if (S.soft)
                S.soft[t] += sc;
        } else {
            S.Score_r[t] = 0;
        }
    }
    size_t pe_hits = 0;
    for (size_t i = 0; i < region.size(); ++i) {
        int t = region[i];
        ll paired = 0 < t ? S.Score_r[t] : S.Score[-t];
        if (paired) {
            std::swap(region[pe_hits], region[i]);
            ++pe_hits;
        }
    }
    for (int x : best2) {
        if (0 < x)
            S.Score[x] = 0;
        else
            S.Score_r[-x] = 0;
    }
    if (pe_hits) {
        region.resize(pe_hits);
        *pe = true;
    } else {
        *pe = false;
    }
    return bestScore;
}

// getFirstPen (savekmers.c:1383-1413): ALL mate1 matches of both strands
// with their scores (rc negative); clears scores.
static ll get_first_pen(Scratch &S, int nb, int nbr,
                        std::vector<int> &region, std::vector<ll> &rscores) {
    ll bestScore = 0;
    region.clear();
    rscores.clear();
    for (int i = 0; i < nb; ++i) {
        int t = S.bests[i];
        ll sc = S.Score[t];
        if (bestScore < sc)
            bestScore = sc;
        region.push_back(t);
        rscores.push_back(sc);
        S.Score[t] = 0;
    }
    for (int i = 0; i < nbr; ++i) {
        int t = S.bests_r[i];
        ll sc = S.Score_r[t];
        if (bestScore < sc)
            bestScore = sc;
        region.push_back(-t);
        rscores.push_back(sc);
        S.Score_r[t] = 0;
    }
    return bestScore;
}

// getSecondBestPen (savekmers.c:1415-1512): pair winners (shrinking
// region) or the per-mate bests; clears mate2 scores.
static ll get_second_best_pen(Scratch &S, int nb, int nbr,
                              std::vector<int> &region,
                              const std::vector<ll> &rscores, ll bestScore,
                              ll PE, bool *pe, std::vector<int> &best2) {
    ll bestScore_r = 0;
    for (int i = 0; i < nb; ++i) {
        ll sc = S.Score[S.bests[i]];
        if (bestScore_r < sc)
            bestScore_r = sc;
    }
    static thread_local std::vector<int> merged2;
    merged2.clear();
    merged2.insert(merged2.end(), S.bests.data(), S.bests.data() + nb);
    for (int i = 0; i < nbr; ++i) {
        ll sc = S.Score_r[S.bests_r[i]];
        if (bestScore_r < sc)
            bestScore_r = sc;
        merged2.push_back(-S.bests_r[i]);
    }

    static thread_local std::vector<int> best_hits;
    best_hits.clear();
    if (bestScore_r) {
        ll compScore = bestScore + bestScore_r - PE;
        if (compScore < 0)
            compScore = 0;
        for (size_t i = 0; i < region.size(); ++i) {
            int t = region[i];
            ll sc = 0 < t ? S.Score_r[t] : S.Score[-t];
            if (0 < sc) {
                sc += rscores[i];
                if (compScore < sc) {
                    compScore = sc;
                    best_hits.clear();
                    best_hits.push_back(t);
                } else if (compScore == sc) {
                    best_hits.push_back(t);
                }
            }
        }
    }
    if (!best_hits.empty()) {
        for (int t : merged2) {
            if (0 < t)
                S.Score[t] = 0;
            else
                S.Score_r[-t] = 0;
        }
        region = best_hits;
        *pe = true;
        best2.clear();
        return bestScore_r;
    }
    // SE split (savekmers.c:1479-1511)
    size_t keep = 0;
    for (size_t i = 0; i < region.size(); ++i)
        if (rscores[i] == bestScore)
            region[keep++] = region[i];
    region.resize(keep);
    best2.clear();
    for (int t : merged2) {
        if (0 < t) {
            if (bestScore_r == S.Score[t])
                best2.push_back(t);
            S.Score[t] = 0;
        } else {
            if (bestScore_r <= S.Score_r[-t])
                best2.push_back(t);
            S.Score_r[-t] = 0;
        }
    }
    *pe = false;
    return bestScore_r;
}

// getSecondProxiForce (savekmers.c:1320-1381): keep region entries
// whose OPPOSITE-strand mate-2 score is within minFrac of the best
// such score (scores NOT combined with mate-1, unlike the Best
// variant); soft adds the mate-2 score
static ll get_second_proxi_force(Scratch &S, Run *R, int nb2, int nbr2,
                                 const std::vector<int> &region,
                                 std::vector<int> &best_hits) {
    ll bestScore = 0;
    for (int t : region) {
        ll sc = 0 < t ? S.Score[t] : S.Score_r[-t];
        if (bestScore < sc)
            bestScore = sc;
    }
    ll proxiScore = (ll)(R->scan_min_frac * (double)bestScore);
    // QUIRK (savekmers.c:1350-1371): the reference never writes the
    // region count back, so kept entries overwrite the FRONT while the
    // tail keeps STALE original entries up to the old count
    best_hits = region;
    size_t bh = 0;
    for (int t : region) {
        ll sc = 0 < t ? S.Score[t] : S.Score_r[-t];
        if (proxiScore <= sc) {
            best_hits[bh++] = t;
            if (S.soft)
                S.soft[0 < t ? t : -t] += sc;
        }
    }
    for (int i = 0; i < nb2; ++i)
        S.Score_r[S.bests[i]] = 0;
    for (int i = 0; i < nbr2; ++i)
        S.Score[S.bests_r[i]] = 0;
    return bestScore;
}

// getSecondProxiPen (savekmers.c:1514-1646): union kept when the best
// COMBINED score reaches bestScore+bestScore_r-PE, then proxi-filtered
// on combined scores; otherwise both mates split to SE with per-mate
// proxi filters
static ll get_second_proxi_pen(Scratch &S, Run *R, int nb, int nbr,
                               std::vector<int> &region,
                               const std::vector<ll> &rscores,
                               ll bestScore, ll PE, bool *pe,
                               std::vector<int> &best2) {
    ll bestScore_r = 0;
    for (int i = 0; i < nb; ++i) {
        ll sc = S.Score[S.bests[i]];
        if (bestScore_r < sc)
            bestScore_r = sc;
    }
    static thread_local std::vector<int> merged2;
    merged2.clear();
    merged2.insert(merged2.end(), S.bests.data(), S.bests.data() + nb);
    for (int i = 0; i < nbr; ++i) {
        ll sc = S.Score_r[S.bests_r[i]];
        if (bestScore_r < sc)
            bestScore_r = sc;
        merged2.push_back(-S.bests_r[i]);
    }
    static thread_local std::vector<int> best_hits;
    best_hits.clear();
    if (bestScore_r) {
        ll compScore = 0;
        for (size_t i = 0; i < region.size(); ++i) {
            int t = region[i];
            ll sc = 0 < t ? S.Score_r[t] : S.Score[-t];
            if (0 < sc) {
                sc += rscores[i];
                if (compScore < sc)
                    compScore = sc;
            }
        }
        if (bestScore + bestScore_r - PE <= compScore) {
            ll proxiScore = (ll)(R->scan_min_frac
                                 * (double)compScore);
            for (size_t i = 0; i < region.size(); ++i) {
                int t = region[i];
                ll sc = 0 < t ? S.Score_r[t] : S.Score[-t];
                if (0 < sc) {
                    sc += rscores[i];
                    if (proxiScore <= sc) {
                        best_hits.push_back(t);
                        if (S.soft)
                            S.soft[0 < t ? t : -t] += sc;
                    }
                }
            }
        }
    }
    if (!best_hits.empty()) {
        for (int t : merged2) {
            if (0 < t)
                S.Score[t] = 0;
            else
                S.Score_r[-t] = 0;
        }
        region = best_hits;
        *pe = true;
        best2.clear();
        return bestScore_r;
    }
    // SE split with per-mate proxi filters (savekmers.c:1609-1642)
    ll proxi1 = (ll)(R->scan_min_frac * (double)bestScore);
    size_t keep = 0;
    for (size_t i = 0; i < region.size(); ++i)
        if (proxi1 <= rscores[i])
            region[keep++] = region[i];
    region.resize(keep);
    ll proxi2 = (ll)(R->scan_min_frac * (double)bestScore_r);
    best2.clear();
    for (int t : merged2) {
        ll sc = 0 < t ? S.Score[t] : S.Score_r[-t];
        if (proxi2 <= sc) {
            best2.push_back(t);
            if (S.soft)
                S.soft[0 < t ? t : -t] += sc;
        }
        if (0 < t)
            S.Score[t] = 0;
        else
            S.Score_r[-t] = 0;
    }
    *pe = false;
    return bestScore_r;
}

// shared unmapped-SAM row append (samwrite's unmapped record shape)
static void sam_put_unmapped(std::vector<uint8_t> &sb, const uint8_t *hdr,
                             ll hlen, const uint8_t *cod, ll ql,
                             int flag) {
    for (;;) {
        size_t base = sb.size();
        sb.resize(base + (size_t)(hlen + 2 * ql + 160));
        ll w = kaln_sam_emit_row(sb.data(), (ll)sb.size(), (ll)base, hdr,
                                 hlen, nullptr, 0, cod, ql, flag, 0, 0, 0,
                                 nullptr, 0, 0);
        if (w >= 0) {
            sb.resize((size_t)w);
            return;
        }
        sb.resize(base + (sb.size() - base) * 2);
    }
}

// One emitted scan record of a pair combiner (pre step-3).
struct PEmit {
    int which;   // 0 = codes1, 1 = rc1, 2 = codes2, 3 = rc2
    ll sc;       // signed rc_flag
    int flag;
    uint8_t hsrc;  // 0 = header1, 1 = header2
    const std::vector<int> *tpl;  // nullptr = empty (pair record 0)
    bool neg;    // negate the template list on emit
};

// save_kmers_unionPair / penaltyPair (savekmers.c:3367-3777) minus the
// sparse/proxi/sam branches; rev (non-sparse) semantics fixed true.
// Returns emits (0-2 records); *is_pair marks a proper pair.
static void spool_pe_rec(Run *R, const uint8_t *codes, int q_len,
                         const uint8_t *mate_codes, int mate_len,
                         const std::vector<int> &ids,
                         const std::vector<ll> &scores,
                         const std::vector<int> &starts,
                         const std::vector<int> &ends, ll best_score,
                         const uint8_t *hdr, ll hlen,
                         const uint8_t *mhdr, ll mhlen, int flag,
                         int mate_flag, ll ord);

// alnFragsForcePE (alnfrags.c:1974-2148; pipeline.aln_frags_force_pe):
// a template survives only when BOTH mates align; combined scores spool
// as one pair record
static void apply_pe_force(Run *R, const uint8_t *c_a, int la,
                           const uint8_t *c_b, int lb, const uint8_t *h_a,
                           ll hla, const uint8_t *h_b, ll hlb, int flag_a,
                           int flag_b, bool arc, int32_t *tids, int n,
                           const ll *msc1, const int32_t *mpo1,
                           const int32_t *mln1, const int32_t *mtg1,
                           const int32_t *mqg1, const ll *msc2,
                           const int32_t *mpo2, const int32_t *mln2,
                           const int32_t *mtg2, const int32_t *mqg2,
                           bool flipped, ll ord) {
    const int k = R->ix.k;
    ll Wl = -R->ix.Wl;
    static thread_local std::vector<int> ids, sts, ens;
    static thread_local std::vector<ll> scs;
    static thread_local std::vector<uint8_t> rca, rcb;
    ids.clear();
    sts.clear();
    ens.clear();
    scs.clear();
    ll best = 0;
    for (int i = 0; i < n; ++i) {
        int t = tids[i] < 0 ? -tids[i] : tids[i];
        ll t_len = R->tlen[t];
        ll s1 = msc1[i];
        int l1 = mln1[i];
        if (!(0 < s1 && R->minlen <= l1
              && (R->mrc * la <= l1 - mqg1[i]
                  || R->mrc * (double)t_len <= l1 - mtg1[i])))
            continue;
        ll s2 = msc2[i];
        int l2 = mln2[i];
        if (!(0 < s2 && R->minlen <= l2
              && (R->mrc * lb <= l2 - mqg2[i]
                  || R->mrc * (double)t_len <= l2 - mtg2[i])))
            continue;
        ll aln_len = (ll)l1 + l2;
        ll start, end;
        if (mpo1[i] < mpo2[i]) {
            start = mpo1[i];
            end = (ll)mpo2[i] + l2 - mtg2[i];
        } else {
            start = mpo2[i];
            end = (ll)mpo1[i] + l1 - mtg1[i];
        }
        ll rs = s1 + s2;
        if (start == 0)
            rs += Wl;
        if (end == t_len)
            rs += Wl;
        double score = (double)rs / (double)aln_len;
        if (rs > k && score >= R->scoreT) {
            ids.push_back(t);   // abs stored (alnfrags.c:2105)
            scs.push_back(rs);
            sts.push_back((int)start);
            ens.push_back((int)end);
            if (best < rs)
                best = rs;
        }
    }
    if (!best) {
        if (R->sam_mask == 1) {
            // both unmapped (alnfrags.c:2147 return 3): working-
            // orientation bytes, unmutated flags
            static thread_local std::vector<uint8_t> ra2, rb2;
            const uint8_t *cu_a = c_a, *cu_b = c_b;
            if (!arc && flipped) {
                ra2.resize(la);
                for (int i = 0; i < la; ++i)
                    ra2[i] = RC_CODE[c_a[la - 1 - i]];
                rb2.resize(lb);
                for (int i = 0; i < lb; ++i)
                    rb2[i] = RC_CODE[c_b[lb - 1 - i]];
                cu_a = ra2.data();
                cu_b = rb2.data();
            }
            sam_put_unmapped(R->pe_sam3, h_a, hla, cu_a, la, flag_a);
            sam_put_unmapped(R->pe_sam3, h_b, hlb, cu_b, lb, flag_b);
        }
        return;
    }
    // alnfrags.c:2126-2143: ids are positive, so rc never sets and the
    // final strrc toggles the WORKING orientation once more: non-arc
    // spools the original bytes with a 48-flag toggle iff flipped; arc
    // always toggles flags and spools rc(working) = original when the
    // candidate loop left the buffers flipped, plain rc otherwise
    int fa = flag_a, fb = flag_b;
    const uint8_t *sa = c_a, *sb = c_b;
    if (arc) {
        if (!flipped) {
            rca.resize(la);
            for (int i = 0; i < la; ++i)
                rca[i] = RC_CODE[c_a[la - 1 - i]];
            rcb.resize(lb);
            for (int i = 0; i < lb; ++i)
                rcb[i] = RC_CODE[c_b[lb - 1 - i]];
            sa = rca.data();
            sb = rcb.data();
        }
        fa ^= 48;
        fb ^= 48;
    } else if (flipped) {
        fa ^= 48;
        fb ^= 48;
    }
    spool_pe_rec(R, sa, la, sb, lb, ids, scs, sts, ens, best, h_a, hla,
                 h_b, hlb, fa, fb, ord);
}

static int pair_scan(Run *R, Scratch &S, const uint8_t *q1, int l1,
                     const uint8_t *q2, int l2, int pm, PEmit *out,
                     bool *is_pair, const long long *v1f = nullptr,
                     const long long *v1r = nullptr,
                     const long long *v2f = nullptr,
                     const long long *v2r = nullptr,
                     int *um_out = nullptr) {
    const int k = R->ix.k;
    *is_pair = false;
    int um_local = 3;   // savekmers.c:205-247 unmapped bits
    int *um = um_out ? um_out : &um_local;
    *um = 3;
    int nb = 0, nbr = 0;
    int hc1 = kchain_pair_mate_v(S.ctx, q1, l1, R->exhaustive,
                                 S.Score.data(), S.Score_r.data(),
                                 S.extendScore.data(), S.include.data(),
                                 S.bests.data(), &nb, S.bests_r.data(),
                                 &nbr, v1f, v1r);
    std::vector<int> &region = S.region;
    std::vector<int> &best2 = S.best2;
    std::vector<ll> &rscores = S.rscores;
    if (pm == 2) {
        // save_kmers_forcePair (savekmers.c:3779-3864): only proper
        // pairs survive; mate 2 scans with SWAPPED strand arrays so
        // opposite orientations pair up
        if (!hc1) {
            *um = 1;
            return 0;
        }
        get_first_force(S, nb, nbr, region, rscores);
        int nb2 = 0, nbr2 = 0;
        int hc2 = kchain_pair_mate_v(
            S.ctx, q2, l2, R->exhaustive, S.Score_r.data(),
            S.Score.data(), S.extendScore.data(), S.include.data(),
            S.bests.data(), &nb2, S.bests_r.data(), &nbr2, v2f, v2r);
        ll fbest = 0;
        best2.clear();
        if (hc2)
            fbest = R->scan_min_frac < 1.0
                ? get_second_proxi_force(S, R, nb2, nbr2, region, best2)
                : get_second_best_force(S, nb2, nbr2, region, rscores,
                                        best2);
        if (hc2 && fbest) {
            if (k <= fbest || (ll)(l1 + l2) - fbest < fbest * k) {
                int flag = 67, flag_r = 131;
                ll sc = best2.back() < 0 ? -fbest : fbest;
                if (0 < best2[0]) {
                    flag |= 32;
                    flag_r |= 16;
                    out[0] = {0, sc, flag, 0, nullptr, false};
                    out[1] = {3, sc, flag_r, 1, &best2, false};
                } else {
                    flag |= 16;
                    flag_r |= 32;
                    out[0] = {2, sc, flag_r, 1, nullptr, false};
                    out[1] = {1, sc, flag, 0, &best2, true};
                }
                *is_pair = true;
                *um = 0;
                return 2;
            }
        } else {
            // clear leftover mate2 scores (savekmers.c:3851-3862)
            for (int i = 0; i < nb2; ++i)
                S.Score_r[S.bests[i]] = 0;
            for (int i = 0; i < nbr2; ++i)
                S.Score[S.bests_r[i]] = 0;
        }
        return 0;
    }
    ll bestScore = 0;
    const bool proxi_pair = R->scan_min_frac < 1.0;
    if (pm == 0) {
        if (hc1) {
            bestScore = proxi_pair
                ? getF_proxi(S, R, nb, nbr, region)
                : getF_best(S, nb, nbr, region);
            if (k < bestScore && bestScore * k < (l1 - bestScore))
                bestScore = 0;
        } else {
            region.clear();
        }
    } else {
        if (hc1) {
            bestScore = get_first_pen(S, nb, nbr, region, rscores);
        } else {
            region.clear();
            rscores.clear();
        }
    }

    int hc2 = kchain_pair_mate_v(S.ctx, q2, l2, R->exhaustive,
                                 S.Score.data(), S.Score_r.data(),
                                 S.extendScore.data(), S.include.data(),
                                 S.bests.data(), &nb, S.bests_r.data(),
                                 &nbr, v2f, v2r);
    bool pe = false;
    ll bestScore_r = 0;
    best2.clear();
    if (hc2) {
        if (pm == 0) {
            if (bestScore) {
                bestScore_r = proxi_pair
                    ? getR_proxi(S, R, nb, nbr, region, best2, &pe)
                    : getR_best(S, nb, nbr, region, best2, &pe);
            } else {
                bestScore_r = proxi_pair
                    ? getF_proxi(S, R, nb, nbr, best2)
                    : getF_best(S, nb, nbr, best2);
            }
            if (k < bestScore_r && bestScore_r * k < (l2 - bestScore_r)) {
                bestScore_r = 0;
                pe = false;
            }
        } else {
            if (0 < bestScore) {
                bestScore_r = proxi_pair
                    ? get_second_proxi_pen(S, R, nb, nbr, region,
                                           rscores, bestScore,
                                           R->pe_reward, &pe, best2)
                    : get_second_best_pen(S, nb, nbr, region, rscores,
                                          bestScore, R->pe_reward, &pe,
                                          best2);
            } else {
                bestScore_r = proxi_pair
                    ? getF_proxi(S, R, nb, nbr, region)
                    : getF_best(S, nb, nbr, region);
                // penalty path: mate2-only result lands in region; the
                // emit below reads best2 (mapping/pair.py:503-506)
                best2 = region;
            }
        }
    }

    int flag = 65, flag_r = 129;
    int n_out = 0;
    if (pm == 1 && 0 < bestScore && 0 < bestScore_r && pe) {
        // penalty proper pair (savekmers.c:3620-3652)
        flag |= 2;
        flag_r |= 2;
        ll compScore = bestScore + bestScore_r;
        if (hc1 + hc2 < compScore)
            compScore = hc1 + hc2;
        if (k <= compScore ||
            (ll)(l1 + l2) - compScore - ((ll)k << 1) < compScore * k) {
            if (0 < region[0]) {
                flag |= 32;
                flag_r |= 16;
                out[0] = {0, bestScore, flag, 0, nullptr, false};
                out[1] = {3, bestScore_r, flag_r, 1, &region, false};
            } else {
                flag |= 16;
                flag_r |= 32;
                out[0] = {2, bestScore_r, flag_r, 1, nullptr, false};
                out[1] = {1, bestScore, flag, 0, &region, true};
            }
            *is_pair = true;
            *um = 0;
            return 2;
        }
        return 0;
    }
    if (pm == 0 && 0 < bestScore && 0 < bestScore_r && pe) {
        // union proper pair (savekmers.c:3445-3487)
        flag |= 2;
        flag_r |= 2;
        if (0 < region[0]) {
            flag |= 32;
            flag_r |= 16;
            out[0] = {0, bestScore, flag, 0, nullptr, false};
            out[1] = {3, bestScore_r, flag_r, 1, &region, false};
        } else {
            flag |= 16;
            flag_r |= 32;
            out[0] = {2, bestScore_r, flag_r, 1, nullptr, false};
            out[1] = {1, bestScore, flag, 0, &region, true};
        }
        *is_pair = true;
        *um = 0;
        return 2;
    }
    if (0 < bestScore && 0 < bestScore_r) {
        // both mapped, no pair: per-mate emit gates (union none;
        // penalty savekmers.c:3654-3710)
        bool emit1 = true, emit2 = true;
        if (pm == 1) {
            ll h1 = hc1 < bestScore ? hc1 : bestScore;
            emit1 = (k <= h1) || ((ll)l1 - h1 - k) < h1 * k;
            ll h2 = hc2 < bestScore_r ? hc2 : bestScore_r;
            emit2 = (k <= h2) || ((ll)l2 - h2 - k) < h2 * k;
        }
        PEmit e1, e2;
        if (emit1) {
            if (0 < region[0]) {
                ll sc1 = region.back() < 0 ? -bestScore : bestScore;
                e1 = {0, sc1, 0, 0, &region, false};
            } else {
                flag |= 16;
                flag_r |= 32;
                e1 = {1, bestScore, 0, 0, &region, true};
            }
        }
        if (emit2) {
            if (0 < best2[0]) {
                ll sc2 = best2.back() < 0 ? -bestScore_r : bestScore_r;
                e2 = {2, sc2, 0, 1, &best2, false};
            } else {
                flag |= 32;
                flag_r |= 16;
                e2 = {3, bestScore_r, 0, 1, &best2, true};
            }
        }
        if (emit1) {
            e1.flag = flag;
            out[n_out++] = e1;
        }
        if (emit2) {
            e2.flag = flag_r;
            out[n_out++] = e2;
        }
        *um = (emit1 && emit2) ? 0 : (emit1 ? 2 : (emit2 ? 1 : 3));
        return n_out;
    }
    if (0 < bestScore) {
        *um = 2;
        bool emit1 = true;
        if (pm == 1) {
            ll h1 = hc1 < bestScore ? hc1 : bestScore;
            emit1 = (k <= h1) || ((ll)l1 - h1 - k) < h1 * k;
        }
        if (emit1) {
            flag |= 8 | 32;
            if (0 < region[0]) {
                ll sc1 = region.back() < 0 ? -bestScore : bestScore;
                out[n_out++] = {0, sc1, flag, 0, &region, false};
            } else {
                flag |= 16;
                out[n_out++] = {1, bestScore, flag, 0, &region, true};
            }
        }
        return n_out;
    }
    if (0 < bestScore_r) {
        *um = 1;
        bool emit2 = true;
        if (pm == 1) {
            ll h2 = hc2 < bestScore_r ? hc2 : bestScore_r;
            emit2 = (k <= h2) || ((ll)l2 - h2 - k) < h2 * k;
        }
        std::vector<int> &lst = best2;
        if (emit2 && !lst.empty()) {
            flag_r |= 8 | 32;
            if (0 < lst[0]) {
                ll sc2 = lst.back() < 0 ? -bestScore_r : bestScore_r;
                out[n_out++] = {2, sc2, flag_r, 1, &lst, false};
            } else {
                flag_r |= 16;
                out[n_out++] = {3, bestScore_r, flag_r, 1, &lst, true};
            }
        }
        return n_out;
    }
    return 0;
}


// ----------------------- PE step-3 appliers ----------------------------

// per-mate PE gate + full-gene Wl bonus (alnfrags.c:1320-1344)
static ll pe_gate(ll read_score, int aln, int pos, int tg, int qg,
                  int q_len, ll t_len, int minlen, double mrc, ll Wl,
                  double *score, int *start, int *end) {
    *score = 0.0;
    *start = 0;
    *end = 0;
    if (minlen <= aln && 0 < read_score &&
        (mrc * q_len <= aln - qg || mrc * (double)t_len <= aln - tg)) {
        *start = pos;
        *end = pos + aln - tg;
        if (*start == 0)
            read_score += Wl;
        if (*end == t_len)
            read_score += Wl;
        *score = 1.0 * (double)read_score / (double)aln;
    } else {
        read_score = 0;
    }
    return read_score;
}

// update_Scores_se (updatescores.c:300-388) -> spool append, no mate
static void spool_se_rec(Run *R, const uint8_t *codes, int q_len,
                         const std::vector<int> &ids,
                         const std::vector<ll> &scores,
                         const std::vector<int> &starts,
                         const std::vector<int> &ends, ll best_score,
                         const uint8_t *hdr, ll hlen, int flag, ll ord) {
    Spool &sp = R->spool;
    const double min_frac = R->aln_min_frac;
    int first_sel = (int)sp.tpl.size();
    if (min_frac == 1.0) {
        for (size_t i = 0; i < ids.size(); ++i) {
            if (scores[i] == best_score) {
                sp.tpl.push_back(ids[i]);
                sp.starts.push_back(starts[i]);
                sp.ends.push_back(ends[i]);
                R->alignment_scores[ids[i] < 0 ? -ids[i] : ids[i]] +=
                    best_score;
            }
        }
    } else {
        double mf = (min_frac < 0 ? -min_frac : min_frac) *
                    (double)best_score;
        for (size_t i = 0; i < ids.size(); ++i) {
            if (mf <= (double)scores[i]) {
                sp.tpl.push_back(ids[i]);
                sp.starts.push_back(starts[i]);
                sp.ends.push_back(ends[i]);
                R->alignment_scores[ids[i] < 0 ? -ids[i] : ids[i]] +=
                    min_frac < 0 ? scores[i] : best_score;
            }
        }
    }
    int n_sel = (int)((ll)sp.tpl.size() - first_sel);
    if (n_sel == 1) {
        int t = sp.tpl[first_sel];
        R->uniq_alignment_scores[t < 0 ? -t : t] += best_score;
    }
    sp.t_off.push_back((ll)sp.tpl.size());
    sp.q_len.push_back(q_len);
    sp.flag.push_back(flag);
    sp.best_hits.push_back(n_sel);
    sp.score.push_back(best_score);
    sp.ord.push_back(ord);
    sp.hdr.insert(sp.hdr.end(), hdr, hdr + hlen);
    sp.hdr_off.push_back((ll)sp.hdr.size());
    sp.cod.insert(sp.cod.end(), codes, codes + q_len);
    sp.cod_off.push_back((ll)sp.cod.size());
    sp.mcod_off.push_back((ll)sp.mcod.size());
    sp.mhdr_off.push_back((ll)sp.mhdr.size());
    sp.mflag.push_back(-1);
}

// update_Scores_pe (updatescores.c:390-488) -> spool append with mate
static void spool_pe_rec(Run *R, const uint8_t *codes, int q_len,
                         const uint8_t *mate_codes, int mate_len,
                         const std::vector<int> &ids,
                         const std::vector<ll> &scores,
                         const std::vector<int> &starts,
                         const std::vector<int> &ends, ll best_score,
                         const uint8_t *hdr, ll hlen,
                         const uint8_t *mhdr, ll mhlen, int flag,
                         int mate_flag, ll ord) {
    Spool &sp = R->spool;
    const double min_frac = R->aln_min_frac;
    int first_sel = (int)sp.tpl.size();
    if (min_frac == 1.0) {
        for (size_t i = 0; i < ids.size(); ++i) {
            if (scores[i] == best_score) {
                sp.tpl.push_back(ids[i]);
                sp.starts.push_back(starts[i]);
                sp.ends.push_back(ends[i]);
                R->alignment_scores[ids[i] < 0 ? -ids[i] : ids[i]] +=
                    scores[i];
            }
        }
    } else {
        double mf = (min_frac < 0 ? -min_frac : min_frac) *
                    (double)best_score;
        for (size_t i = 0; i < ids.size(); ++i) {
            if (mf <= (double)scores[i]) {
                sp.tpl.push_back(ids[i]);
                sp.starts.push_back(starts[i]);
                sp.ends.push_back(ends[i]);
                R->alignment_scores[ids[i] < 0 ? -ids[i] : ids[i]] +=
                    min_frac < 0 ? scores[i] : best_score;
            }
        }
    }
    int n_sel = (int)((ll)sp.tpl.size() - first_sel);
    if (n_sel == 1) {
        int t = sp.tpl[first_sel];
        R->uniq_alignment_scores[t < 0 ? -t : t] += best_score;
    }
    sp.t_off.push_back((ll)sp.tpl.size());
    sp.q_len.push_back(q_len);
    sp.flag.push_back(flag);
    sp.best_hits.push_back(n_sel);
    sp.score.push_back(-best_score);
    sp.ord.push_back(ord);
    sp.hdr.insert(sp.hdr.end(), hdr, hdr + hlen);
    sp.hdr_off.push_back((ll)sp.hdr.size());
    sp.cod.insert(sp.cod.end(), codes, codes + q_len);
    sp.cod_off.push_back((ll)sp.cod.size());
    sp.mcod.insert(sp.mcod.end(), mate_codes, mate_codes + mate_len);
    sp.mcod_off.push_back((ll)sp.mcod.size());
    sp.mhdr.insert(sp.mhdr.end(), mhdr, mhdr + mhlen);
    sp.mhdr_off.push_back((ll)sp.mhdr.size());
    sp.mflag.push_back(mate_flag);
}


// alnFragsUnionPE / PenaltyPE applier (alnfrags.c:1220-1972; the nat
// branches of pipeline.aln_frags_union_pe / aln_frags_penalty_pe): mate
// stats -> gates -> pairing decision -> spool emits.  No sparse/sam.
static void apply_pe_pair(Run *R, int fpm, const uint8_t *c_a, int la,
                          const uint8_t *c_b, int lb, const uint8_t *h_a,
                          ll hla, const uint8_t *h_b, ll hlb, int flag_a,
                          int flag_b, bool arc, int32_t *tids, int n,
                          const ll *msc1, const int32_t *mpo1,
                          const int32_t *mln1, const int32_t *mtg1,
                          const int32_t *mqg1, const ll *msc2,
                          const int32_t *mpo2, const int32_t *mln2,
                          const int32_t *mtg2, const int32_t *mqg2,
                          bool flipped, ll ord) {
    const int k = R->ix.k;
    ll Wl = -R->ix.Wl;
    ll PE = R->pe_reward;
    static thread_local std::vector<ll> scores1, scores2;
    static thread_local std::vector<int> starts, ends;
    static thread_local std::vector<uint8_t> rca, rcb;
    scores1.assign(n, 0);
    scores2.assign(n, 0);
    starts.assign(n, 0);
    ends.assign(n, 0);
    rca.resize(la);
    for (int i = 0; i < la; ++i)
        rca[i] = RC_CODE[c_a[la - 1 - i]];
    rcb.resize(lb);
    for (int i = 0; i < lb; ++i)
        rcb[i] = RC_CODE[c_b[lb - 1 - i]];
    ll best1 = 0, best2 = 0, compScore = 0;
    for (int i = 0; i < n; ++i) {
        ll t_len = R->tlen[tids[i] < 0 ? -tids[i] : tids[i]];
        double score;
        int start, end;
        ll rs = pe_gate(msc1[i], mln1[i], mpo1[i], mtg1[i], mqg1[i], la,
                        t_len, R->minlen, R->mrc, Wl, &score, &start,
                        &end);
        if (rs > k && score >= R->scoreT) {
            scores1[i] = rs;
            starts[i] = start;
            ends[i] = end;
            if (best1 < rs)
                best1 = rs;
        } else {
            scores1[i] = 0;
            starts[i] = -1;
            ends[i] = -1;
        }
        rs = pe_gate(msc2[i], mln2[i], mpo2[i], mtg2[i], mqg2[i], lb,
                     t_len, R->minlen, R->mrc, Wl, &score, &start, &end);
        if (rs > k && score >= R->scoreT) {
            scores2[i] = rs;
            if (scores1[i]) {
                if (start < starts[i])
                    starts[i] = start;
                else
                    ends[i] = end;
            } else {
                starts[i] = start;
                ends[i] = end;
            }
            if (best2 < rs)
                best2 = rs;
        } else {
            scores2[i] = 0;
        }
        // compScore uses the PRE-threshold mate2 score (alnfrags.c:1784)
        if (compScore < rs + scores1[i])
            compScore = rs + scores1[i];
    }
    if (!best1 && !best2) {
        if (R->sam_mask == 1) {
            // both mates unmapped at step 3 (alnfrags.c:1593 return 3):
            // rows with the UNmutated anker flags and emission bytes
            const uint8_t *cu_a = arc ? c_a : (flipped ? rca.data() : c_a);
            const uint8_t *cu_b = arc ? c_b : (flipped ? rcb.data() : c_b);
            sam_put_unmapped(R->pe_sam3, h_a, hla, cu_a, la, flag_a);
            sam_put_unmapped(R->pe_sam3, h_b, hlb, cu_b, lb, flag_b);
        }
        return;
    }
    bool rc_state;
    if (arc) {
        rc_state = false;
        for (int i = 0; i < n; ++i)
            if (tids[i] < 0) {
                rc_state = true;
                break;
            }
    } else {
        rc_state = !flipped;
    }
    const uint8_t *cur_a = arc ? c_a : (flipped ? rca.data() : c_a);
    const uint8_t *cur_b = arc ? c_b : (flipped ? rcb.data() : c_b);
    const uint8_t *res_a = arc ? rca.data() : c_a;
    const uint8_t *res_b = arc ? rcb.data() : c_b;
    double mf = R->aln_min_frac < 0 ? -R->aln_min_frac : R->aln_min_frac;
    static thread_local std::vector<int> u_ids, u_st, u_en;
    static thread_local std::vector<ll> u_sc;

    auto emit_pair = [&](std::vector<int> &ids, std::vector<ll> &psc,
                         std::vector<int> &pst, std::vector<int> &pen,
                         ll best) {
        int fa = flag_a, fb = flag_b;
        if (!ids.empty() && ids[0] < 0) {
            for (auto &x : ids)
                x = -x;
            spool_pe_rec(R, cur_b, lb, cur_a, la, ids, psc, pst, pen, best,
                         h_b, hlb, h_a, hla, fb, fa, ord);
        } else {
            const uint8_t *sa = cur_a, *sb = cur_b;
            if (!rc_state) {
                sa = res_a;
                sb = res_b;
                fa ^= 48;
                fb ^= 48;
            }
            spool_pe_rec(R, sa, la, sb, lb, ids, psc, pst, pen, best, h_a,
                         hla, h_b, hlb, fa, fb, ord);
        }
    };

    if (fpm == 1) {
        // penalty: proper pair when compScore + PE beats the gate
        double pair_gate = mf * (double)(best1 + best2);
        if (compScore && pair_gate <= (double)(compScore + PE)) {
            u_ids.clear();
            u_sc.clear();
            u_st.clear();
            u_en.clear();
            for (int i = 0; i < n; ++i) {
                if (scores1[i] && scores2[i]) {
                    u_ids.push_back(tids[i]);
                    u_sc.push_back(scores1[i] + scores2[i] + PE);
                    u_st.push_back(starts[i]);
                    u_en.push_back(ends[i]);
                }
            }
            emit_pair(u_ids, u_sc, u_st, u_en, compScore + PE);
            return;
        }
    } else if (best1 && best2) {
        // union: candidates passing both mates' thresholds
        double thr1 = (double)best1 * mf;
        double thr2 = (double)best2 * mf;
        u_ids.clear();
        u_sc.clear();
        u_st.clear();
        u_en.clear();
        for (int i = 0; i < n; ++i) {
            if (thr1 <= (double)scores1[i] && thr2 <= (double)scores2[i]) {
                u_ids.push_back(tids[i]);
                u_sc.push_back(scores1[i] + scores2[i]);
                u_st.push_back(starts[i]);
                u_en.push_back(ends[i]);
            }
        }
        if (!u_ids.empty()) {
            emit_pair(u_ids, u_sc, u_st, u_en, best1 + best2);
            return;
        }
    }
    if (best1 && best2) {
        // unmaided pair: separate SE spools (alnfrags.c:1447-1516 /
        // :1825-1895)
        double thr1 = mf * (double)best1;
        double thr2 = mf * (double)best2;
        static thread_local std::vector<int> f_ids, f_st, f_en, r_ids,
            r_st, r_en;
        static thread_local std::vector<ll> f_sc, r_sc;
        f_ids.clear();
        f_sc.clear();
        f_st.clear();
        f_en.clear();
        r_ids.clear();
        r_sc.clear();
        r_st.clear();
        r_en.clear();
        for (int i = 0; i < n; ++i) {
            if (thr1 <= (double)scores1[i]) {
                f_ids.push_back(tids[i]);
                f_sc.push_back(scores1[i]);
                f_st.push_back(starts[i]);
                f_en.push_back(ends[i]);
            } else if (thr2 <= (double)scores2[i]) {
                r_ids.push_back(tids[i]);
                r_sc.push_back(scores2[i]);
                r_st.push_back(starts[i]);
                r_en.push_back(ends[i]);
            }
        }
        int fa = flag_a, fb = flag_b;
        const uint8_t *seq_a = cur_a, *seq_b = cur_b;
        if (!f_ids.empty() && f_ids[0] < 0) {
            for (auto &x : f_ids)
                x = -x;
        } else if (!rc_state) {
            seq_a = res_a;
            fa ^= 16;
            fb ^= 32;
        }
        if (!r_ids.empty() && r_ids[0] < 0) {
            for (auto &x : r_ids)
                x = -x;
        } else if (!rc_state) {
            seq_b = res_b;
            fa ^= 32;
            fb ^= 16;
        }
        if (fa & 2) {
            fa ^= 2;
            fb ^= 2;
        }
        if (!f_ids.empty())
            spool_se_rec(R, seq_a, la, f_ids, f_sc, f_st, f_en, best1, h_a,
                         hla, fa, ord);
        if (!r_ids.empty())
            spool_se_rec(R, seq_b, lb, r_ids, r_sc, r_st, r_en, best2, h_b,
                         hlb, fb, ord);
        return;
    }
    if (best1) {
        // forward only (alnfrags.c:1518-1552 / :1897-1931)
        static thread_local std::vector<int> ids, stl, enl;
        static thread_local std::vector<ll> scl;
        ids.clear();
        scl.clear();
        stl.clear();
        enl.clear();
        for (int i = 0; i < n; ++i) {
            if (scores1[i]) {
                ids.push_back(tids[i]);
                scl.push_back(scores1[i]);
                stl.push_back(starts[i]);
                enl.push_back(ends[i]);
            }
        }
        int fa = flag_a, fb = flag_b;
        const uint8_t *seq_a = cur_a;
        if (!ids.empty() && ids[0] < 0) {
            for (auto &x : ids)
                x = -x;
        } else if (!rc_state) {
            seq_a = res_a;
            fa ^= 16;
            fb ^= 32;
        }
        fa |= 8;
        fb ^= 4;
        if (fa & 2) {
            fa ^= 2;
            fb ^= 2;
        }
        spool_se_rec(R, seq_a, la, ids, scl, stl, enl, best1, h_a, hla, fa,
                     ord);
        if (R->sam_mask == 1)   // mate b unmapped (alnfrags.c return 2)
            sam_put_unmapped(R->pe_sam3, h_b, hlb, cur_b, lb, fb);
        return;
    }
    // reverse only (alnfrags.c:1553-1590 / :1933-1969)
    static thread_local std::vector<int> ids, stl, enl;
    static thread_local std::vector<ll> scl;
    ids.clear();
    scl.clear();
    stl.clear();
    enl.clear();
    for (int i = 0; i < n; ++i) {
        if (scores2[i]) {
            ids.push_back(tids[i]);
            scl.push_back(scores2[i]);
            stl.push_back(starts[i]);
            enl.push_back(ends[i]);
        }
    }
    int fa = flag_a, fb = flag_b;
    const uint8_t *seq_b = cur_b;
    if (!ids.empty() && ids[0] < 0) {
        for (auto &x : ids)
            x = -x;
    } else if (!rc_state) {
        seq_b = res_b;
        fa ^= 32;
        fb ^= 16;
    }
    fb |= 8;
    fa ^= 4;
    if (fb & 2) {
        fa ^= 2;
        fb ^= 2;
    }
    spool_se_rec(R, seq_b, lb, ids, scl, stl, enl, best2, h_b, hlb, fb,
                 ord);
    if (R->sam_mask == 1)       // mate a unmapped (alnfrags.c return 1)
        sam_put_unmapped(R->pe_sam3, h_a, hla, cur_a, la, fa);
}

// Shared SE phases 2-4 (unit collection -> step-3 scoring -> spool):
// consumes the PendUnits of scratches [0, nt).
static ll se_batch_tail(Run *R, int nt, const uint8_t *hdr_flat,
                        const long long *hoff, const long long *ords,
                        const uint8_t *codes_flat = nullptr,
                        const long long *coff = nullptr,
                        int n_reads = 0) {
    auto _now = []() {
        return std::chrono::duration<double>(
                   std::chrono::steady_clock::now().time_since_epoch())
            .count();
    };
    double _t0 = _now();
    std::vector<SUnit> units;
    std::vector<int32_t> tpl_ids;
    std::vector<int64_t> tpl_offv{0};
    for (int ti = 0; ti < nt; ++ti) {
        Scratch &S = R->scratch[ti];
        for (PendUnit &u : S.units)
            collect_se_unit(R, S, u, hdr_flat, hoff, nullptr, nullptr,
                            ords, units, tpl_ids, tpl_offv);
    }
    int m = (int)units.size();
    if (!m)
        return (ll)R->spool.size();
    R->t_build += _now() - _t0;
    _t0 = _now();
    if (R->mem_mode) {
        for (int i = 0; i < m; ++i)
            emit_mem_spool(R, units[i], tpl_ids, tpl_offv, i, nullptr, 0);
        R->t_spool += _now() - _t0;
        return (ll)R->spool.size();
    }
    SEOut o;
    score_se_batch(R, units, tpl_ids, tpl_offv, o);
    R->t_score += _now() - _t0;
    _t0 = _now();
    for (int i = 0; i < m; ++i)
        emit_se_spool(R, units[i], tpl_ids, tpl_offv, o, i);
    if (R->sam_mask == 1 && codes_flat) {
        // map-phase unmapped rows in strict read order (runkma.c's
        // sequential samwrite: scan misses flag 20, step-3 misses
        // flag|4 with the unit's oriented codes); only the default
        // -sam level reports unmapped reads (pipeline sam_un gate)
        const int k = R->ix.k;
        size_t ui = 0;
        auto &sb = R->out_sam;
        auto put = [&](const uint8_t *hdr, ll hlen, const uint8_t *cod,
                       ll ql, int flag) {
            for (;;) {
                size_t base = sb.size();
                sb.resize(base + (size_t)(hlen + 2 * ql + 160));
                ll w = kaln_sam_emit_row(sb.data(), (ll)sb.size(),
                                         (ll)base, hdr, hlen, nullptr, 0,
                                         cod, ql, flag, 0, 0, 0, nullptr,
                                         0, 0);
                if (w >= 0) {
                    sb.resize((size_t)w);
                    return;
                }
                sb.resize(base + (sb.size() - base) * 2);
            }
        };
        for (int rd = 0; rd < n_reads; ++rd) {
            bool any = false;
            for (; ui < units.size() && units[ui].read == rd; ++ui) {
                any = true;
                if (o.best[ui] > k)
                    continue;
                const SUnit &u = units[ui];
                put(u.hdr, u.hlen, u.cod, u.q_len, u.flag | 4);
            }
            if (!any)
                put(hdr_flat + hoff[rd], hoff[rd + 1] - hoff[rd],
                    codes_flat + coff[rd], coff[rd + 1] - coff[rd], 20);
        }
    }
    R->t_spool += _now() - _t0;
    return (ll)R->spool.size();
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
    // overlap per-template seed-index builds with the scan phase on one
    // helper thread (the reference overlaps input parsing the same way);
    // bounded to DBs whose packed sequence fits a sane handle budget
    if (r->seq_bytes < (256u << 20) && tlen_n > 2) {
        Run *rp = r;
        ll tn = tlen_n;
        r->prebuild_th = std::thread([rp, tn]() {
            for (ll t = 1; t < tn; ++t) {
                if (rp->prebuild_stop.load(std::memory_order_relaxed))
                    return;
                rp->handle_for((int)t);
            }
        });
    }
    return r;
}

void krun_free(void *h) { delete (Run *)h; }

void krun_set_pe(void *h, long long pe_reward) {
    ((Run *)h)->pe_reward = pe_reward;
}

void krun_set_mem(void *h, int mem_mode) {
    ((Run *)h)->mem_mode = mem_mode;
}

// -sam stream: rows accumulate in emission order; the caller drains
// with krun_sam_fetch after each map batch and after output_all
void krun_set_proxi(void *h, double scanner_min_frac, int soft_on) {
    Run *r = (Run *)h;
    r->scan_min_frac = scanner_min_frac;
    r->scan_soft = soft_on != 0;
    r->soft_bufs.assign(r->ctxs.size(), {});
    for (size_t i = 0; i < r->ctxs.size(); ++i) {
        ll *sp = nullptr;
        if (soft_on) {
            r->soft_bufs[i].assign((size_t)r->db_size + 3, 0);
            sp = r->soft_bufs[i].data();
        }
        kchain_set_proxi(r->ctxs[i], scanner_min_frac, sp);
        r->scratch[i].soft = sp;
    }
}

void krun_set_sam(void *h, int mask) { ((Run *)h)->sam_mask = mask; }
long long krun_sam_len(void *h) {
    return (long long)((Run *)h)->out_sam.size();
}
void krun_sam_fetch(void *h, uint8_t *buf) {
    Run *R = (Run *)h;
    if (!R->out_sam.empty())
        memcpy(buf, R->out_sam.data(), R->out_sam.size());
    R->out_sam.clear();
}

void krun_set_tsv(void *h, unsigned long long mask) {
    ((Run *)h)->tsv_mask = mask;
}
long long krun_tsv_len(void *h) {
    return (long long)((Run *)h)->out_tsv.size();
}
void krun_tsv_fetch(void *h, uint8_t *buf) {
    Run *R = (Run *)h;
    if (!R->out_tsv.empty())
        memcpy(buf, R->out_tsv.data(), R->out_tsv.size());
    R->out_tsv.clear();
}

void krun_set_xml(void *h) {
    Run *R = (Run *)h;
    if (!R->xml_sink)
        R->xml_sink = kxml_create(R->dmat, (int)R->ix.W1, (int)R->ix.U);
}
long long krun_xml_len(void *h) {
    return (long long)((Run *)h)->out_xml.size();
}
void krun_xml_fetch(void *h, uint8_t *buf) {
    Run *R = (Run *)h;
    if (!R->out_xml.empty())
        memcpy(buf, R->out_xml.data(), R->out_xml.size());
    R->out_xml.clear();
}

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
        S.hdr_arena.clear();
        S.crc_arena.clear();
        S.tpl_arena.clear();
        S.pairs.clear();
        S.order.clear();
        for (int rd = slice_begin[ti]; rd < slice_begin[ti + 1]; ++rd) {
            const uint8_t *q = codes_flat + coff[rd];
            int q_len = (int)(coff[rd + 1] - coff[rd]);
            if (R->mode == 2)
                scan_read_hmm(R, S, q, q_len, rd,
                              hdr_flat + hoff[rd],
                              hoff[rd + 1] - hoff[rd]);
            else
                scan_read_units(R, S, q, q_len, rd, 0);
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

    return se_batch_tail(R, nt, hdr_flat, hoff, ords,
                         codes_flat, coff, n);
}

// Map one SE batch whose step-2 scan ALREADY RAN on the device (the
// devserve daemon's dense op, kma_tpu/devserve.py): dscores/dmodes/
// dcounts/dflat are scan_dense's per-read outputs (mode 0 unmapped,
// 1 fw, 2 rc, 3 merged with score negated and tpl = fw ++ -rc ids --
// exactly the savekmers.c:2766-2833 emit scan_read_units reproduces).
// Reads flagged overflow fall back to the native host scan, preserving
// byte parity for any tie width.
long long krun_map_se_batch_dev(void *hv, const uint8_t *codes_flat,
                                const long long *coff,
                                const uint8_t *hdr_flat,
                                const long long *hoff,
                                const long long *ords, int n,
                                const int32_t *dscores,
                                const uint8_t *dmodes,
                                const uint8_t *dover,
                                const int32_t *dcounts,
                                const int32_t *dflat) {
    Run *R = (Run *)hv;
    const int k = R->ix.k;
    Scratch &S = R->scratch[0];
    S.units.clear();
    S.cod_arena.clear();
    S.hdr_arena.clear();
    S.crc_arena.clear();
    S.tpl_arena.clear();
    S.pairs.clear();
    S.order.clear();
    auto _now = []() {
        return std::chrono::duration<double>(
                   std::chrono::steady_clock::now().time_since_epoch())
            .count();
    };
    double _t0 = _now();
    ll foff = 0;
    for (int rd = 0; rd < n; ++rd) {
        const uint8_t *q = codes_flat + coff[rd];
        int q_len = (int)(coff[rd + 1] - coff[rd]);
        ll fo = foff;
        foff += dcounts[rd];
        if (dover[rd]) {
            // device tie/run overflow: exact host rescan of this read
            scan_read_units(R, S, q, q_len, rd, 0);
            continue;
        }
        int mode = dmodes[rd];
        if (!mode || q_len < k)
            continue;
        PendUnit u;
        u.read = rd;
        u.hsrc = 0;
        u.b0 = u.b1 = -1;
        u.q_len = q_len;
        u.cod_off = (ll)S.cod_arena.size();
        u.tpl_off = (ll)S.tpl_arena.size();
        u.sc = dscores[rd];
        u.flag = mode == 2 ? 16 : 0;
        if (mode == 2) {
            size_t base = S.cod_arena.size();
            S.cod_arena.resize(base + q_len);
            for (int i = 0; i < q_len; ++i)
                S.cod_arena[base + i] = RC_CODE[q[q_len - 1 - i]];
        } else {
            S.cod_arena.insert(S.cod_arena.end(), q, q + q_len);
        }
        S.tpl_arena.insert(S.tpl_arena.end(), dflat + fo,
                           dflat + fo + dcounts[rd]);
        u.n_tpl = dcounts[rd];
        S.units.push_back(u);
        S.order.emplace_back(0, (int)S.units.size() - 1);
    }
    R->t_scan += _now() - _t0;
    return se_batch_tail(R, 1, hdr_flat, hoff, ords,
                         codes_flat, coff, n);
}

// Map one chain-mode SE batch whose per-window hash probes ALREADY RAN
// on the device (the devserve chain op): voff_f/voff_r are per-read
// [stride] value-offset rows in the symmetric window layout the native
// chain splicer consumes (kchain_scan_read_v; chain_device.py role).
long long krun_map_se_batch_chain_dev(
    void *hv, const uint8_t *codes_flat, const long long *coff,
    const uint8_t *hdr_flat, const long long *hoff, const long long *ords,
    int n, const long long *voff_f, const long long *voff_r,
    long long stride) {
    Run *R = (Run *)hv;
    Scratch &S = R->scratch[0];
    S.units.clear();
    S.cod_arena.clear();
    S.hdr_arena.clear();
    S.crc_arena.clear();
    S.tpl_arena.clear();
    S.pairs.clear();
    S.order.clear();
    auto _now = []() {
        return std::chrono::duration<double>(
                   std::chrono::steady_clock::now().time_since_epoch())
            .count();
    };
    double _t0 = _now();
    for (int rd = 0; rd < n; ++rd) {
        const uint8_t *q = codes_flat + coff[rd];
        int q_len = (int)(coff[rd + 1] - coff[rd]);
        scan_read_units(R, S, q, q_len, rd, 0,
                        voff_f + (ll)rd * stride,
                        voff_r + (ll)rd * stride);
    }
    R->t_scan += _now() - _t0;
    return se_batch_tail(R, 1, hdr_flat, hoff, ords,
                         codes_flat, coff, n);
}


// Map one HMM-mode SE batch whose per-window hash probes ALREADY RAN
// on the device (the devserve chain op over the FOLDED codes, q & 3 --
// save_kmers_HMM folds N before its lookups, savekmers.c:3941).
long long krun_map_se_batch_hmm_dev(
    void *hv, const uint8_t *codes_flat, const long long *coff,
    const uint8_t *hdr_flat, const long long *hoff, const long long *ords,
    int n, const long long *voff_f, const long long *voff_r,
    long long stride) {
    Run *R = (Run *)hv;
    Scratch &S = R->scratch[0];
    S.units.clear();
    S.cod_arena.clear();
    S.hdr_arena.clear();
    S.crc_arena.clear();
    S.tpl_arena.clear();
    S.pairs.clear();
    S.order.clear();
    auto _now = []() {
        return std::chrono::duration<double>(
                   std::chrono::steady_clock::now().time_since_epoch())
            .count();
    };
    double _t0 = _now();
    for (int rd = 0; rd < n; ++rd) {
        const uint8_t *q = codes_flat + coff[rd];
        int q_len = (int)(coff[rd + 1] - coff[rd]);
        scan_read_hmm(R, S, q, q_len, rd, hdr_flat + hoff[rd],
                      hoff[rd + 1] - hoff[rd], voff_f + (ll)rd * stride,
                      voff_r + (ll)rd * stride);
    }
    R->t_scan += _now() - _t0;
    return se_batch_tail(R, 1, hdr_flat, hoff, ords,
                         codes_flat, coff, n);
}


// Map one batch of read pairs (run_kma's PE loop, pipeline.py:1895-1997).
// Items with b absent (b_present==0) or a short mate fall back to the SE
// scan of the surviving/long-enough mates, in stream order.  pm / fpm:
// 0 = union, 1 = penalty (scan combiner / step-3 applier).
long long krun_map_pe_batch(void *hv, const uint8_t *a_flat,
                            const long long *a_off, const uint8_t *ha_flat,
                            const long long *ha_off, const uint8_t *b_flat,
                            const long long *b_off, const uint8_t *hb_flat,
                            const long long *hb_off,
                            const uint8_t *b_present, const long long *ords,
                            int n, int pm, int fpm,
                            const long long *va_f, const long long *va_r,
                            const long long *vb_f, const long long *vb_r,
                            long long vstride) {
    Run *R = (Run *)hv;
    const int k = R->ix.k;
    R->pe_sam3.clear();
    int nt = R->n_threads;
    if (nt > n)
        nt = n < 1 ? 1 : n;
    std::vector<int> slice_begin(nt + 1);
    for (int i = 0; i <= nt; ++i)
        slice_begin[i] = (int)((ll)n * i / nt);

    auto _now = []() {
        return std::chrono::duration<double>(
                   std::chrono::steady_clock::now().time_since_epoch())
            .count();
    };
    double _t0 = _now();

    auto scan_slice = [&](int ti) {
        Scratch &S = R->scratch[ti];
        S.units.clear();
        S.pairs.clear();
        S.order.clear();
        S.cod_arena.clear();
        S.hdr_arena.clear();
        S.crc_arena.clear();
        S.tpl_arena.clear();
        S.sam_scan.clear();
        const bool sam1 = R->sam_mask == 1;
        static thread_local std::vector<uint8_t> rc_tmp;
        auto se_fallback = [&](const uint8_t *q, int l, int it,
                               uint8_t hsrc) {
            size_t before = S.units.size();
            if (R->mode == 2) {
                // -hmm: single reads in the PE stream use kmerScan =
                // save_kmers_HMM (savekmers.c:129-137); pairs keep the
                // pair combiners
                const uint8_t *hd = hsrc ? hb_flat + hb_off[it]
                                         : ha_flat + ha_off[it];
                ll hl = hsrc ? hb_off[it + 1] - hb_off[it]
                             : ha_off[it + 1] - ha_off[it];
                scan_read_hmm(R, S, q, l, it, hd, hl);
            } else
                scan_read_units(R, S, q, l, it, hsrc);
            if (sam1 && S.units.size() == before) {
                // scan miss: flag 20 with the raw read (kmers.c:68-71)
                const uint8_t *hd = hsrc ? hb_flat + hb_off[it]
                                         : ha_flat + ha_off[it];
                ll hl = hsrc ? hb_off[it + 1] - hb_off[it]
                             : ha_off[it + 1] - ha_off[it];
                sam_put_unmapped(S.sam_scan, hd, hl, q, l, 20);
            }
        };
        PEmit em[2];
        for (int it = slice_begin[ti]; it < slice_begin[ti + 1]; ++it) {
            const uint8_t *qa = a_flat + a_off[it];
            int la = (int)(a_off[it + 1] - a_off[it]);
            const uint8_t *qb = b_flat + b_off[it];
            int lb = (int)(b_off[it + 1] - b_off[it]);
            if (!b_present[it]) {
                se_fallback(qa, la, it, 0);
                continue;
            }
            if (la < k || lb < k) {
                // short mate: SE of each long-enough mate
                // (pipeline.py:1904-1911)
                if (la >= k)
                    se_fallback(qa, la, it, 0);
                if (lb >= k)
                    se_fallback(qb, lb, it, 1);
                continue;
            }
            bool is_pair = false;
            const long long *p1f = va_f ? va_f + (ll)it * vstride : nullptr;
            const long long *p1r = va_r ? va_r + (ll)it * vstride : nullptr;
            const long long *p2f = vb_f ? vb_f + (ll)it * vstride : nullptr;
            const long long *p2r = vb_r ? vb_r + (ll)it * vstride : nullptr;
            int um = 3;
            int ne = pair_scan(R, S, qa, la, qb, lb, pm, em, &is_pair,
                               p1f, p1r, p2f, p2r, &um);
            if (sam1 && um) {
                // PE unmapped flag composition (savekmers.c:205-247;
                // pipeline.py's sam_unmapped block, non-pseudo DB)
                const bool force = pm == 2;
                if (um & 1) {
                    int fl = 4 | 65;
                    if ((um & 2) || force)
                        fl |= 8;
                    fl |= 16;
                    if ((fl & 8) && (um & 2))
                        fl |= 32;
                    rc_tmp.resize(la);
                    for (int i = 0; i < la; ++i)
                        rc_tmp[i] = RC_CODE[qa[la - 1 - i]];
                    sam_put_unmapped(S.sam_scan, ha_flat + ha_off[it],
                                     ha_off[it + 1] - ha_off[it],
                                     rc_tmp.data(), la, fl);
                }
                if ((um & 2) || (force && (um & 1))) {
                    int fl = 4 | 129;
                    if (um & 1)
                        fl |= 8;
                    if (um & 2)
                        fl |= 16;
                    if (fl & 8)
                        fl |= 32;
                    const uint8_t *seq2 = qb;
                    if (um & 2) {
                        rc_tmp.resize(lb);
                        for (int i = 0; i < lb; ++i)
                            rc_tmp[i] = RC_CODE[qb[lb - 1 - i]];
                        seq2 = rc_tmp.data();
                    }
                    sam_put_unmapped(S.sam_scan, hb_flat + hb_off[it],
                                     hb_off[it + 1] - hb_off[it], seq2,
                                     lb, fl);
                }
            }
            if (!ne)
                continue;
            auto put_codes = [&](int which) -> ll {
                ll off = (ll)S.cod_arena.size();
                if (which == 0) {
                    S.cod_arena.insert(S.cod_arena.end(), qa, qa + la);
                } else if (which == 1) {
                    size_t b0 = S.cod_arena.size();
                    S.cod_arena.resize(b0 + la);
                    for (int i = 0; i < la; ++i)
                        S.cod_arena[b0 + i] = RC_CODE[qa[la - 1 - i]];
                } else if (which == 2) {
                    S.cod_arena.insert(S.cod_arena.end(), qb, qb + lb);
                } else {
                    size_t b0 = S.cod_arena.size();
                    S.cod_arena.resize(b0 + lb);
                    for (int i = 0; i < lb; ++i)
                        S.cod_arena[b0 + i] = RC_CODE[qb[lb - 1 - i]];
                }
                return off;
            };
            auto put_tpl = [&](const PEmit &e) -> std::pair<ll, int> {
                ll off = (ll)S.tpl_arena.size();
                if (e.tpl == nullptr)
                    return {off, 0};
                for (int t : *e.tpl)
                    S.tpl_arena.push_back(e.neg ? -t : t);
                return {off, (int)e.tpl->size()};
            };
            if (is_pair) {
                PairPend pp;
                pp.item = it;
                pp.sc_a = em[0].sc;
                pp.sc_b = em[1].sc;
                pp.flag_a = em[0].flag;
                pp.flag_b = em[1].flag;
                pp.hsrc_a = em[0].hsrc;
                pp.hsrc_b = em[1].hsrc;
                pp.cod_a_off = put_codes(em[0].which);
                pp.la = (em[0].which < 2) ? la : lb;
                pp.cod_b_off = put_codes(em[1].which);
                pp.lb = (em[1].which < 2) ? la : lb;
                auto tp = put_tpl(em[1]);
                pp.tpl_off = tp.first;
                pp.n_tpl = tp.second;
                S.pairs.push_back(pp);
                S.order.emplace_back(1, (int)S.pairs.size() - 1);
            } else {
                for (int e = 0; e < ne; ++e) {
                    PendUnit u;
                    u.read = it;
                    u.hsrc = em[e].hsrc;
                    u.sc = em[e].sc;
                    u.b0 = u.b1 = -1;
                    u.flag = em[e].flag;
                    u.q_len = (em[e].which < 2) ? la : lb;
                    u.cod_off = put_codes(em[e].which);
                    auto tp = put_tpl(em[e]);
                    u.tpl_off = tp.first;
                    u.n_tpl = tp.second;
                    S.units.push_back(u);
                    S.order.emplace_back(0, (int)S.units.size() - 1);
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
    R->t_scan += _now() - _t0;
    _t0 = _now();

    // ---- flatten in stream order --------------------------------------
    struct PUnit {
        const uint8_t *c_a, *c_b, *h_a, *h_b;
        int la, lb, flag_a, flag_b;
        ll hla, hlb, ord, sc_a, sc_b;
        bool arc;
        ll tpl_base;
        int n_tpl;
    };
    std::vector<SUnit> se_units;
    std::vector<int32_t> se_tpl;
    std::vector<int64_t> se_off{0};
    std::vector<PUnit> pairs;
    std::vector<int32_t> pe_tpl;
    std::vector<int64_t> pe_off{0};
    std::vector<std::pair<uint8_t, int>> g_order;
    for (int ti = 0; ti < nt; ++ti) {
        Scratch &S = R->scratch[ti];
        for (auto &oe : S.order) {
            if (oe.first == 0) {
                PendUnit &u = S.units[oe.second];
                size_t before = se_units.size();
                collect_se_unit(R, S, u, ha_flat, ha_off, hb_flat, hb_off,
                                ords, se_units, se_tpl, se_off);
                if (se_units.size() > before)
                    g_order.emplace_back(0, (int)se_units.size() - 1);
            } else {
                PairPend &pp = S.pairs[oe.second];
                int n_tpl = pp.n_tpl;
                int32_t *t = S.tpl_arena.data() + pp.tpl_off;
                if (R->contamination >= 0) {
                    // deConPrintPair (ankers.c:126-148): one filter on
                    // the shared list; empty drops BOTH mates
                    n_tpl = decon_filter(t, n_tpl, R->contamination);
                    if (!n_tpl)
                        continue;
                }
                if (k > pp.la || k > pp.lb)
                    continue;
                PUnit w;
                w.c_a = S.cod_arena.data() + pp.cod_a_off;
                w.c_b = S.cod_arena.data() + pp.cod_b_off;
                w.la = pp.la;
                w.lb = pp.lb;
                w.flag_a = pp.flag_a;
                w.flag_b = pp.flag_b;
                if (pp.hsrc_a == 0) {
                    w.h_a = ha_flat + ha_off[pp.item];
                    w.hla = ha_off[pp.item + 1] - ha_off[pp.item];
                } else {
                    w.h_a = hb_flat + hb_off[pp.item];
                    w.hla = hb_off[pp.item + 1] - hb_off[pp.item];
                }
                if (pp.hsrc_b == 0) {
                    w.h_b = ha_flat + ha_off[pp.item];
                    w.hlb = ha_off[pp.item + 1] - ha_off[pp.item];
                } else {
                    w.h_b = hb_flat + hb_off[pp.item];
                    w.hlb = hb_off[pp.item + 1] - hb_off[pp.item];
                }
                w.ord = ords[pp.item];
                w.sc_a = pp.sc_a;
                w.sc_b = pp.sc_b;
                w.arc = pp.sc_a < 0;
                w.tpl_base = (ll)pe_tpl.size();
                w.n_tpl = n_tpl;
                pe_tpl.insert(pe_tpl.end(), t, t + n_tpl);
                pe_off.push_back((ll)pe_tpl.size());
                pairs.push_back(w);
                g_order.emplace_back(1, (int)pairs.size() - 1);
            }
        }
    }
    R->t_build += _now() - _t0;
    _t0 = _now();

    // ---- scoring ------------------------------------------------------
    SEOut so;
    if (!se_units.empty())
        score_se_batch(R, se_units, se_tpl, se_off, so);
    int np = (int)pairs.size();
    if (R->mem_mode)
        np = 0;   // mem mode spools ankers directly; no mate scoring
    const bool _peprof = getenv("KMA_ALN_PROF") != nullptr;
    static double _pe_handles = 0.0, _pe_stage = 0.0, _pe_kaln = 0.0;
    auto _pnow = []() {
        return std::chrono::duration<double>(
                   std::chrono::steady_clock::now().time_since_epoch())
            .count();
    };
    double _pt = _peprof ? _pnow() : 0.0;
    std::vector<ll> psc1(pe_tpl.size()), psc2(pe_tpl.size());
    std::vector<int32_t> ppo1(pe_tpl.size()), pln1(pe_tpl.size()),
        ptg1(pe_tpl.size()), pqg1(pe_tpl.size()), ppo2(pe_tpl.size()),
        pln2(pe_tpl.size()), ptg2(pe_tpl.size()), pqg2(pe_tpl.size());
    std::vector<uint8_t> pflip(np);
    if (np) {
        build_handles_for(R, pe_tpl);
        if (_peprof) {
            double t1 = _pnow();
            _pe_handles += t1 - _pt;
            _pt = t1;
        }
        std::vector<void *> handles(pe_tpl.size());
        for (size_t i = 0; i < pe_tpl.size(); ++i)
            handles[i] =
                R->handles[pe_tpl[i] < 0 ? -pe_tpl[i] : pe_tpl[i]];
        std::vector<int64_t> a_offv(np + 1, 0), b_offv(np + 1, 0);
        for (int i = 0; i < np; ++i) {
            a_offv[i + 1] = a_offv[i] + pairs[i].la;
            b_offv[i + 1] = b_offv[i] + pairs[i].lb;
        }
        std::vector<uint8_t> a_cat((size_t)a_offv[np]),
            b_cat((size_t)b_offv[np]), arcs(np);
        for (int i = 0; i < np; ++i) {
            memcpy(a_cat.data() + a_offv[i], pairs[i].c_a, pairs[i].la);
            memcpy(b_cat.data() + b_offv[i], pairs[i].c_b, pairs[i].lb);
            arcs[i] = pairs[i].arc ? 1 : 0;
        }
        std::vector<int64_t> offv(pe_off.begin(), pe_off.end());
        if (_peprof) {
            double t1 = _pnow();
            _pe_stage += t1 - _pt;
            _pt = t1;
        }
        kaln_pe_score_batch(handles.data(), pe_tpl.data(), offv.data(),
                            a_cat.data(), a_offv.data(), b_cat.data(),
                            b_offv.data(), arcs.data(), np, (int)R->ix.M,
                            (int)R->ix.MM, (int)R->ix.U, (int)R->ix.W1,
                            R->dmat, R->mq, R->n_threads, psc1.data(),
                            ppo1.data(), pln1.data(), ptg1.data(),
                            pqg1.data(), psc2.data(), ppo2.data(),
                            pln2.data(), ptg2.data(), pqg2.data(),
                            pflip.data(), R->minlen, R->mrc);
        if (_peprof) {
            _pe_kaln += _pnow() - _pt;
            fprintf(stderr,
                    "# pe score: handles %.3f stage %.3f kaln %.3f\n",
                    _pe_handles, _pe_stage, _pe_kaln);
        }
    }
    R->t_score += _now() - _t0;
    _t0 = _now();

    // ---- sequential spool emission (stream order) ---------------------
    for (auto &oe : g_order) {
        if (oe.first == 0) {
            int i = oe.second;
            if (R->mem_mode)
                emit_mem_spool(R, se_units[i], se_tpl, se_off, i, nullptr,
                               0);
            else {
                emit_se_spool(R, se_units[i], se_tpl, se_off, so, i);
                if (R->sam_mask == 1 && so.best[i] <= k) {
                    // step-3 miss: flag|4 with the oriented unit bytes
                    const SUnit &u = se_units[i];
                    sam_put_unmapped(R->pe_sam3, u.hdr, u.hlen, u.cod,
                                     u.q_len, u.flag | 4);
                }
            }
        } else {
            int i = oe.second;
            PUnit &w = pairs[i];
            ll b = pe_off[i];
            if (R->mem_mode) {
                // handle_mem_anker with mate (updatescores.c:64-107)
                SUnit prim, mate;
                prim.cod = w.c_a;
                prim.q_len = w.la;
                prim.flag = w.flag_a;
                prim.hdr = w.h_a;
                prim.hlen = w.hla;
                prim.sc = w.sc_a;
                prim.b0 = prim.b1 = -1;
                prim.ord = w.ord;
                mate.cod = w.c_b;
                mate.q_len = w.lb;
                mate.flag = w.flag_b;
                mate.hdr = w.h_b;
                mate.hlen = w.hlb;
                // synthesize a one-pair offset view
                emit_mem_spool_pair(R, prim, mate,
                                    w.sc_b < 0 ? -w.sc_b : w.sc_b,
                                    pe_tpl.data() + b, w.n_tpl);
                continue;
            }
            if (fpm == 2) {
                apply_pe_force(R, w.c_a, w.la, w.c_b, w.lb, w.h_a,
                               w.hla, w.h_b, w.hlb, w.flag_a, w.flag_b,
                               w.arc, pe_tpl.data() + b, w.n_tpl,
                               psc1.data() + b, ppo1.data() + b,
                               pln1.data() + b, ptg1.data() + b,
                               pqg1.data() + b, psc2.data() + b,
                               ppo2.data() + b, pln2.data() + b,
                               ptg2.data() + b, pqg2.data() + b,
                               pflip[i] != 0, w.ord);
                continue;
            }
            apply_pe_pair(R, fpm, w.c_a, w.la, w.c_b, w.lb, w.h_a, w.hla,
                          w.h_b, w.hlb, w.flag_a, w.flag_b, w.arc,
                          pe_tpl.data() + b, w.n_tpl, psc1.data() + b,
                          ppo1.data() + b, pln1.data() + b,
                          ptg1.data() + b, pqg1.data() + b,
                          psc2.data() + b, ppo2.data() + b,
                          pln2.data() + b, ptg2.data() + b,
                          pqg2.data() + b, pflip[i] != 0, w.ord);
        }
    }
    if (R->sam_mask == 1) {
        // batch rows: scan-phase unmapped (pair order across slices),
        // then the step-3 unmapped rows
        for (int ti = 0; ti < nt; ++ti) {
            Scratch &S = R->scratch[ti];
            R->out_sam.insert(R->out_sam.end(), S.sam_scan.begin(),
                              S.sam_scan.end());
            S.sam_scan.clear();
        }
        R->out_sam.insert(R->out_sam.end(), R->pe_sam3.begin(),
                          R->pe_sam3.end());
        R->pe_sam3.clear();
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

// Overwrite the global score arrays with externally reduced values (the
// multi-host all-reduce of updatescores.c:217-281's accumulators).
void krun_scores_set(void *hv, const long long *alignment_scores,
                     const long long *uniq_alignment_scores) {
    Run *R = (Run *)hv;
    memcpy(R->alignment_scores.data(), alignment_scores,
           R->alignment_scores.size() * sizeof(ll));
    memcpy(R->uniq_alignment_scores.data(), uniq_alignment_scores,
           R->uniq_alignment_scores.size() * sizeof(ll));
}

// Ragged segment gather: out = concat(flat[starts[i] : starts[i]+lens[i]])
// (byte offsets/lengths).  The multi-host merge's reorder of per-record
// slices — one memcpy per record instead of numpy index arithmetic.
void krun_ragged_gather(const uint8_t *flat, const long long *starts,
                        const long long *lens, long long n,
                        uint8_t *out) {
    ll w = 0;
    for (ll i = 0; i < n; ++i) {
        memcpy(out + w, flat + starts[i], (size_t)lens[i]);
        w += lens[i];
    }
}

// Replace the spool with externally merged records (the multi-host
// rank-0 reduce: per-rank spools merged in global read-ordinal order,
// the spltdb.c:625 merge lifted to flat arrays).
void krun_spool_import(void *hv, long long n, const int32_t *q_len,
                       const int32_t *best_hits, const long long *score,
                       const int32_t *flag, const long long *ord,
                       const int32_t *tpl, const int32_t *starts,
                       const int32_t *ends, const long long *t_off,
                       const uint8_t *cod, const long long *cod_off,
                       const uint8_t *hdr, const long long *hdr_off,
                       const uint8_t *mcod, const long long *mcod_off,
                       const uint8_t *mhdr, const long long *mhdr_off,
                       const int32_t *mflag) {
    Spool &sp = ((Run *)hv)->spool;
    sp.q_len.assign(q_len, q_len + n);
    sp.best_hits.assign(best_hits, best_hits + n);
    sp.score.assign(score, score + n);
    sp.flag.assign(flag, flag + n);
    sp.ord.assign(ord, ord + n);
    sp.tpl.assign(tpl, tpl + t_off[n]);
    sp.starts.assign(starts, starts + t_off[n]);
    sp.ends.assign(ends, ends + t_off[n]);
    sp.t_off.assign(t_off, t_off + n + 1);
    sp.cod.assign(cod, cod + cod_off[n]);
    sp.cod_off.assign(cod_off, cod_off + n + 1);
    sp.hdr.assign(hdr, hdr + hdr_off[n]);
    sp.hdr_off.assign(hdr_off, hdr_off + n + 1);
    sp.mcod.assign(mcod, mcod + mcod_off[n]);
    sp.mcod_off.assign(mcod_off, mcod_off + n + 1);
    sp.mhdr.assign(mhdr, mhdr + mhdr_off[n]);
    sp.mhdr_off.assign(mhdr_off, mhdr_off + n + 1);
    sp.mflag.assign(mflag, mflag + n);
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
    if (R->scan_soft) {
        // soft -proxi: the scanners' softProxi totals REPLACE the
        // spooled alignment scores before ConClave (runkma.c:1153-1156)
        std::fill(as.begin(), as.end(), 0);
        for (auto &buf : R->soft_bufs)
            for (int t = 0; t < db && t < (int)buf.size(); ++t)
                as[t] += buf[t];
        R->scan_soft = false;   // replace once per run
    }
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
        f.mate = 0;
        f.start = start;
        f.end = end;
        f.score = sp.best_hits[rec] < 0 ? 0 : read_score;
        f.chunk = chunk;
        (void)bh;
        R->frags[bestTemplate].push_back(f);
        ++n_since;
        if (sp.score[rec] < 0) {
            // PE mate record follows (conclave.c:169-194): same template,
            // start/end/score; its own codes/header/flag, never rc'd
            read_counts[bestTemplate] += 1;
            FragOut m = f;
            m.mate = 1;
            m.rc = 0;
            R->frags[bestTemplate].push_back(m);
            ++n_since;
        }
        // maxFrag flush check AFTER the whole record (conclave.c:196-208)
        if (n_since >= max_frag) {
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
        if (f.mate) {
            cb += R->spool.mcod_off[f.rec + 1] - R->spool.mcod_off[f.rec];
            hb += R->spool.mhdr_off[f.rec + 1] - R->spool.mhdr_off[f.rec];
        } else {
            cb += R->spool.q_len[f.rec];
            hb += R->spool.hdr_off[f.rec + 1] - R->spool.hdr_off[f.rec];
        }
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
        if (f.mate) {
            // mate frag: raw mate codes/header/flag (conclave.c:169-194)
            ll ql = sp.mcod_off[rec + 1] - sp.mcod_off[rec];
            q_len[i] = (int32_t)ql;
            int bhm = sp.best_hits[rec] < 0 ? -sp.best_hits[rec]
                                            : sp.best_hits[rec];
            best_hits[i] = bhm;
            score[i] = f.score;
            fstats[3 * i] = (int32_t)f.score;
            fstats[3 * i + 1] = f.start;
            fstats[3 * i + 2] = f.end;
            flag[i] = sp.mflag[rec];
            memcpy(codes_out + co, sp.mcod.data() + sp.mcod_off[rec],
                   (size_t)ql);
            ll hl = sp.mhdr_off[rec + 1] - sp.mhdr_off[rec];
            memcpy(hdr_out + ho, sp.mhdr.data() + sp.mhdr_off[rec],
                   (size_t)hl);
            qb[2 * i] = 0;
            qb[2 * i + 1] = (int32_t)ql;
            co += ql;
            ho += hl;
            codes_off[i + 1] = co;
            hdr_off[i + 1] = ho;
            continue;
        }
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


// Per-template assembly in ONE call: stage the conclave frag list,
// run the native frag loop (assemble_KMA, assembly.c:1689-2127) against
// the caller's pileup matrix, and format the accepted .frag.gz rows
// (updateFrags, assembly.c:49-83).  Python keeps consensus calling and
// the .res/.fsa row formatting.  Returns the new matrix length, or -1
// when rows_buf is too small (caller grows and retries).
long long krun_assemble_template(
    void *hv, long long t, long long Wl_raw, int minlen, int mq,
    double scoreT, double mrc, int circular, int ts, int skip_tails,
    int dense, long long *counts, long long *next_, long long mat_len,
    long long t_len, const uint8_t *name, long long name_len,
    long long *o_score, long long *o_frag_aln, long long *o_read_aln,
    uint8_t *rows_buf, long long rows_cap, long long *rows_len) {
    Run *R = (Run *)hv;
    Spool &sp = R->spool;
    auto &v = R->frags[t];
    int n = (int)v.size();
    *o_score = 0;
    *o_frag_aln = 0;
    *o_read_aln = 0;
    *rows_len = 0;
    if (!n)
        return mat_len;
    static thread_local std::vector<uint8_t> cod;
    static thread_local std::vector<int64_t> coff;
    static thread_local std::vector<int32_t> qb, fs, flags, bhs;
    static thread_local std::vector<const uint8_t *> hdrp;
    static thread_local std::vector<ll> hdrl;
    cod.clear();
    coff.assign(1, 0);
    qb.resize(2 * n);
    fs.resize(3 * n);
    flags.resize(n);
    bhs.resize(n);
    hdrp.resize(n);
    hdrl.resize(n);
    for (int i = 0; i < n; ++i) {
        FragOut &f = v[i];
        ll rec = f.rec;
        int bh = sp.best_hits[rec] < 0 ? -sp.best_hits[rec]
                                       : sp.best_hits[rec];
        bhs[i] = bh;
        fs[3 * i] = (int32_t)f.score;
        fs[3 * i + 1] = f.start;
        fs[3 * i + 2] = f.end;
        if (f.mate) {
            ll b = sp.mcod_off[rec], e = sp.mcod_off[rec + 1];
            cod.insert(cod.end(), sp.mcod.data() + b, sp.mcod.data() + e);
            flags[i] = sp.mflag[rec];
            hdrp[i] = sp.mhdr.data() + sp.mhdr_off[rec];
            hdrl[i] = sp.mhdr_off[rec + 1] - sp.mhdr_off[rec];
            qb[2 * i] = 0;
            qb[2 * i + 1] = (int32_t)(e - b);
        } else {
            ll b = sp.cod_off[rec], e = sp.cod_off[rec + 1];
            ll ql = e - b;
            size_t base = cod.size();
            cod.resize(base + ql);
            const uint8_t *c = sp.cod.data() + b;
            if (f.rc) {
                for (ll j = 0; j < ql; ++j)
                    cod[base + j] = RC_CODE[c[ql - 1 - j]];
            } else {
                memcpy(cod.data() + base, c, (size_t)ql);
            }
            flags[i] = sp.flag[rec] | (f.rc ? 16 : 0);
            hdrp[i] = sp.hdr.data() + sp.hdr_off[rec];
            hdrl[i] = sp.hdr_off[rec + 1] - sp.hdr_off[rec];
            // q-bounds from the header tail, mirrored for rc
            const uint8_t *h = hdrp[i];
            ll hl = hdrl[i];
            int qs = 0, qe = (int)ql;
            if (hl > 9 && h[hl - 9] == 0) {
                int32_t bb[2];
                memcpy(bb, h + hl - 8, 8);
                qs = bb[0];
                qe = bb[1];
                if (f.rc) {
                    int nqs = (int)(ql - qe), nqe = (int)(ql - qs);
                    qs = nqs;
                    qe = nqe;
                }
            }
            qb[2 * i] = qs;
            qb[2 * i + 1] = qe;
        }
        coff.push_back((int64_t)cod.size());
    }
    void *h = R->handle_for((int)t);
    static thread_local std::vector<uint8_t> acc, rcu;
    static thread_local std::vector<ll> rs, ms;
    static thread_local std::vector<int32_t> stt, enn, lnn;
    acc.resize(n);
    rcu.resize(n);
    rs.resize(n);
    ms.resize(n);
    stt.resize(n);
    enn.resize(n);
    lnn.resize(n);
    ll new_len;
    if (R->sam_mask || R->xml_sink) {
        // flatten the ragged spool headers for the SAM rows
        static thread_local std::vector<uint8_t> hflat;
        static thread_local std::vector<int64_t> hoffv;
        static thread_local std::vector<int32_t> bh32, fl32;
        static thread_local std::vector<uint8_t> sbuf;
        hflat.clear();
        hoffv.assign(1, 0);
        bh32.resize(n);
        fl32.resize(n);
        for (int i = 0; i < n; ++i) {
            hflat.insert(hflat.end(), hdrp[i], hdrp[i] + hdrl[i]);
            hoffv.push_back((ll)hflat.size());
            bh32[i] = bhs[i];
            fl32[i] = flags[i];
        }
        ll sam_cap = (ll)cod.size() * 10 + (ll)hflat.size()
                     + (ll)n * (name_len + 192) + 256;
        ll sam_len = -1;
        for (;;) {
            sbuf.resize((size_t)sam_cap);
            new_len = kassem_template_frags_sam(
                h, cod.data(), coff.data(), qb.data(), fs.data(), n,
                (int)R->ix.M, (int)R->ix.MM, (int)R->ix.U,
                (int)R->ix.W1, R->dmat, (int)Wl_raw, minlen, mq, scoreT,
                mrc, circular, ts, skip_tails, dense, counts, next_,
                mat_len, (int)t_len, acc.data(), rcu.data(), rs.data(),
                ms.data(), stt.data(), enn.data(), lnn.data(),
                R->sam_mask, hflat.data(), hoffv.data(), bh32.data(),
                fl32.data(), name, name_len, sbuf.data(), sam_cap,
                &sam_len, R->xml_sink, t);
            if (sam_len >= 0)
                break;
            sam_cap *= 4;
        }
        R->out_sam.insert(R->out_sam.end(), sbuf.data(),
                          sbuf.data() + sam_len);
    } else {
        new_len = kassem_template_frags(
            h, cod.data(), coff.data(), qb.data(), fs.data(), n,
            (int)R->ix.M, (int)R->ix.MM, (int)R->ix.U, (int)R->ix.W1,
            R->dmat, (int)Wl_raw, minlen, mq, scoreT, mrc, circular, ts,
            skip_tails, dense, counts, next_, mat_len, (int)t_len,
            acc.data(), rcu.data(), rs.data(), ms.data(), stt.data(),
            enn.data(), lnn.data());
    }
    // accepted-frag stats + .frag.gz rows (assembly.c:49-83)
    static const char B2C[6] = {'A', 'C', 'G', 'T', 'N', '-'};
    ll w = 0;
    for (int i = 0; i < n; ++i) {
        if (acc[i] != 1)
            continue;
        *o_score += ms[i];
        int fl = flags[i];
        if (!(fl & 2) || (fl & 64))
            *o_frag_aln += 1;
        *o_read_aln += 1;
        ll ql = coff[i + 1] - coff[i];
        // header text stops at the first NUL (writers.frag_row)
        ll hl = 0;
        while (hl < hdrl[i] && hdrp[i][hl] != 0)
            ++hl;
        if (w + ql + hl + name_len + 64 > rows_cap)
            return -1;
        const uint8_t *c = cod.data() + coff[i];
        if (rcu[i]) {
            for (ll j = 0; j < ql; ++j)
                rows_buf[w + j] = (uint8_t)B2C[RC_CODE[c[ql - 1 - j]]];
        } else {
            for (ll j = 0; j < ql; ++j)
                rows_buf[w + j] = (uint8_t)B2C[c[j]];
        }
        w += ql;
        w += snprintf((char *)rows_buf + w, 64, "\t%d\t%lld\t%d\t%d\t",
                      bhs[i], (long long)rs[i], stt[i], enn[i]);
        memcpy(rows_buf + w, name, (size_t)name_len);
        w += name_len;
        rows_buf[w++] = '\t';
        memcpy(rows_buf + w, hdrp[i], (size_t)hl);
        w += hl;
        rows_buf[w++] = '\n';
    }
    *rows_len = w;
    return new_len;
}

void *krun_template_handle(void *hv, long long t) {
    return ((Run *)hv)->handle_for((int)t);
}

namespace {
// append `n` bytes to an output buffer
inline void buf_put(std::vector<uint8_t> &b, const void *p, size_t n) {
    const uint8_t *c = (const uint8_t *)p;
    b.insert(b.end(), c, c + n);
}
inline void buf_printf(std::vector<uint8_t> &b, const char *fmt, ...) {
    char tmp[512];
    va_list ap;
    va_start(ap, fmt);
    int n = vsnprintf(tmp, sizeof tmp, fmt, ap);
    va_end(ap);
    if (n > 0)
        buf_put(b, tmp, (size_t)n);
}
}  // namespace

// Fast path of the output stage (runkma.c:763-863) for the plain output
// set: per passing template, the significance gate (runkma.c:770-783),
// native assembly (assemble_KMA) + consensus (callConsensus) + dual-gap
// trim (assembly.c:2095-2124), and .res/.fsa/.aln/.frag row formatting
// (runkma.c:816, printconsensus.c:24-61, assembly.c:49-83) into
// Run-held buffers.  Covers the no-sam/xml/vcf/tsv/ef/matrix, non-mem,
// ID_t>0 configuration; pipeline falls back to the per-template Python
// loop otherwise.  Returns 0, or -1 on error.
long long krun_output_all(
    void *hv, const long long *w_scores, const uint8_t *names_flat,
    const long long *names_off, long long db_size,
    long long template_tot_ulen, long long Nhits, double evalue,
    double score_t_gate, int cmp_mode, double ID_t, double Depth_t,
    int bcd, double support, int base_caller, int significant,
    int ref_fsa, int want_fsa, int want_aln, int want_frag,
    int want_matrix, int vcf_filt, int want_ef,
    const long long *fragment_counts, const long long *read_counts,
    int t_mod, int t_res,
    long long Wl_raw, int minlen, int mq, double scoreT, double mrc,
    int circular, int ts, int skip_tails, int dense,
    long long *o_res_len, long long *o_fsa_len, long long *o_aln_len,
    long long *o_frag_len, long long *o_mat_len, long long *o_vcf_len,
    long long *o_ef_len) {
    Run *R = (Run *)hv;
    R->out_res.clear();
    R->out_fsa.clear();
    R->out_aln.clear();
    R->out_frag.clear();
    R->out_mat.clear();
    R->out_vcf.clear();
    R->out_ef.clear();
    R->seg_tpl.clear();
    R->seg_lens.clear();
    std::vector<ll> mcounts, mnext, worder;
    std::vector<uint8_t> t_arr, s_arr, q_arr, rows, fmt;
    ll stats[4];
    ll prev[7] = {0, 0, 0, 0, 0, 0, 0};
    auto flush_seg = [&](ll t) {
        ll cur[7] = {(ll)R->out_res.size(),  (ll)R->out_fsa.size(),
                     (ll)R->out_aln.size(),  (ll)R->out_frag.size(),
                     (ll)R->out_mat.size(),  (ll)R->out_vcf.size(),
                     (ll)R->out_ef.size()};
        bool any = false;
        for (int i = 0; i < 7; ++i)
            if (cur[i] != prev[i])
                any = true;
        if (!any)
            return;
        R->seg_tpl.push_back((int32_t)t);
        for (int i = 0; i < 7; ++i) {
            R->seg_lens.push_back(cur[i] - prev[i]);
            prev[i] = cur[i];
        }
    };
    for (ll t = 1; t < db_size; ++t) {
        ll read_score = w_scores[t];
        if (read_score <= 0)
            continue;
        // t_mod < 0: contiguous range [t_res, -t_mod) (multihost
        // frag-count-balanced partition; stitching is then a plain
        // per-rank concatenation instead of per-template slicing)
        if (t_mod < 0 && (t < t_res || -t_mod <= t))
            continue;
        if (t_mod > 1 && (t % t_mod) != t_res)
            continue;   // another rank owns this template's output
        ll t_len = R->tlen[t];
        // significance gate, long-double exact (runkma.c:770-783)
        long double denom_t = (long double)(template_tot_ulen - t_len);
        if (denom_t < 1.0L)
            denom_t = 1.0L;
        long double expected =
            (long double)t_len / denom_t
            * (long double)(Nhits - read_score);
        long double q_value;
        if (0 < expected)
            q_value = ((long double)read_score - expected)
                      / (expected + (long double)read_score)
                      * ((long double)read_score - expected);
        else
            q_value = (long double)read_score;
        double p_value = p_chisqr_ld(q_value);
        bool c1 = p_value <= evalue
                  && (long double)read_score > expected;
        bool c2 = (long double)read_score
                  >= score_t_gate * (long double)t_len;
        bool passed = cmp_mode == 0 ? (c1 || c2)
                      : cmp_mode == 1 ? (c1 && c2) : true;
        if (!passed) {
            const bool id0 = ID_t == 0.0;
            if ((R->sam_mask && !(R->sam_mask & 2096)) || id0) {
                // skip_assemble path (assembly.c:1209-1315): the
                // template's fragments print unmapped-flagged
                const uint8_t *name = names_flat + names_off[t];
                ll name_len = names_off[t + 1] - names_off[t];
                Spool &sp = R->spool;
                static thread_local std::vector<uint8_t> fc;
                ll depth_sum = 0;
                const bool sam_rows = R->sam_mask
                                      && !(R->sam_mask & 2096);
                for (FragOut &f : R->frags[t]) {
                    ll rec = f.rec;
                    const uint8_t *c;
                    ll ql;
                    int flag;
                    const uint8_t *hdr;
                    ll hlen;
                    if (f.mate) {
                        ll b = sp.mcod_off[rec];
                        ql = sp.mcod_off[rec + 1] - b;
                        c = sp.mcod.data() + b;
                        flag = sp.mflag[rec];
                        hdr = sp.mhdr.data() + sp.mhdr_off[rec];
                        hlen = sp.mhdr_off[rec + 1] - sp.mhdr_off[rec];
                    } else {
                        ll b = sp.cod_off[rec];
                        ql = sp.cod_off[rec + 1] - b;
                        c = sp.cod.data() + b;
                        flag = sp.flag[rec] | (f.rc ? 16 : 0);
                        hdr = sp.hdr.data() + sp.hdr_off[rec];
                        hlen = sp.hdr_off[rec + 1] - sp.hdr_off[rec];
                    }
                    if (f.rc && !f.mate) {
                        fc.resize((size_t)ql);
                        for (ll j = 0; j < ql; ++j)
                            fc[j] = RC_CODE[c[ql - 1 - j]];
                        c = fc.data();
                    }
                    depth_sum += ql;
                    if (!sam_rows)
                        continue;
                    int bh = sp.best_hits[rec] < 0 ? -sp.best_hits[rec]
                                                   : sp.best_hits[rec];
                    auto &sb = R->out_sam;
                    for (;;) {
                        size_t base = sb.size();
                        sb.resize(base
                                  + (size_t)(hlen + 2 * ql + name_len
                                             + 192));
                        ll w = kaln_sam_emit_row(
                            sb.data(), (ll)sb.size(), (ll)base, hdr,
                            hlen, name, name_len, c, ql, flag | 4, 0, 0,
                            0, nullptr, bh, 0);
                        if (w >= 0) {
                            sb.resize((size_t)w);
                            break;
                        }
                        sb.resize(base + (sb.size() - base) * 2);
                    }
                }
                if (id0) {
                    // runkma.c:841-856: -ID 0 prints a zero-identity
                    // row from the skip-assembly (depth = summed read
                    // lengths, aln_len 0 -> cover 0, q_cover inf)
                    double depth = (double)depth_sum / (double)t_len;
                    unsigned exp_u = (unsigned)(long long)expected;
                    buf_put(R->out_res, name, (size_t)name_len);
                    buf_printf(R->out_res,
                               "\t%8lld\t%8u\t%8lld\t%8.2f\t%8.2f\t"
                               "%8.2f\t%8.2f\t%8.2f\t%8.2f\t%4.1e\n",
                               (long long)read_score, exp_u,
                               (long long)t_len, 0.0, 0.0, 0.0,
                               100.0 * (double)t_len / 0.0, depth,
                               (double)q_value, p_value);
                    if (R->tsv_mask) {
                        unsigned long long fl = R->tsv_mask & 65535ull;
                        char num[64];
                        auto fput = [&](const char *txt, ll n_) {
                            buf_put(R->out_tsv, txt, (size_t)n_);
                            fl >>= 1;
                            buf_put(R->out_tsv, fl ? "\t" : "\n", 1);
                        };
                        auto fnum = [&](const char *fmt, double v) {
                            int n_ = snprintf(num, sizeof num, fmt, v);
                            fput(num, n_);
                        };
                        auto fint = [&](ll v) {
                            int n_ = snprintf(num, sizeof num, "%lld",
                                              (long long)v);
                            fput(num, n_);
                        };
                        // printsv divides by the RAW aln_len (0 for
                        // skip assemblies): 0/0 -> -nan, depth/0 -> inf
                        double al0 = 0.0;
                        if (fl & 1) fput((const char *)name, name_len);
                        else fl >>= 1;
                        if (fl & 1) fint(t_len); else fl >>= 1;
                        if (fl & 1) fnum("%f", 0.0); else fl >>= 1;
                        if (fl & 1) fnum("%f", 0.0); else fl >>= 1;
                        if (fl & 1) fnum("%f", depth); else fl >>= 1;
                        if (fl & 1) fnum("%f", 100.0 * 0.0 / al0);
                        else fl >>= 1;
                        if (fl & 1) fnum("%f", 100.0 * 0.0 / al0);
                        else fl >>= 1;
                        if (fl & 1) fnum("%f", (double)depth_sum / al0);
                        else fl >>= 1;
                        if (fl & 1) fint(read_counts[t]); else fl >>= 1;
                        if (fl & 1) fint(0); else fl >>= 1;
                        if (fl & 1) fint(read_score); else fl >>= 1;
                        if (fl & 1) fnum("%f", (double)expected);
                        else fl >>= 1;
                        if (fl & 1) fnum("%f", (double)q_value);
                        else fl >>= 1;
                        if (fl & 1) fnum("%e", p_value); else fl >>= 1;
                        if (fl & 1) fint(R->alignment_scores[t]);
                        else fl >>= 1;
                        if (fl & 1)
                            fnum("%f",
                                 (R->alignment_scores[t] && read_score)
                                     ? 40.0 * (double)read_score
                                           / R->alignment_scores[t]
                                           * log((double)read_score)
                                     : 0.0);
                        else
                            fl >>= 1;
                    }
                    if (want_ef) {
                        buf_put(R->out_ef, name, (size_t)name_len);
                        buf_printf(
                            R->out_ef,
                            "\t%lld\t%lld\t%lld\t%lld\t%lld\t%lld\t"
                            "%f\t%lld\t%lld\t%lld\t%lld\t%lld\t%lld"
                            "\t%lld\n",
                            read_counts[t], fragment_counts[t], 0ll, 0ll,
                            0ll, depth_sum, 0.0, 0ll, 0ll, 0ll, 0ll,
                            0ll, 0ll, 0ll);
                    }
                    flush_seg(t);
                }
            }
            continue;
        }

        const uint8_t *name = names_flat + names_off[t];
        ll name_len = names_off[t + 1] - names_off[t];

        if (R->xml_sink) {
            // newIterXML (xml.c:82-90)
            buf_printf(R->out_xml,
                       "<Iteration>\n\t<Iteration_iter-num>%lld"
                       "</Iteration_iter-num>\n\t<Iteration_query-ID>"
                       "Query_%lld</Iteration_query-ID>\n"
                       "\t<Iteration_query-def>",
                       (long long)t, (long long)t);
            buf_put(R->out_xml, name, (size_t)name_len);
            buf_printf(R->out_xml,
                       "</Iteration_query-def>\n"
                       "\t<Iteration_query-len>%lld"
                       "</Iteration_query-len>\n<Iteration_hits>\n",
                       (long long)t_len);
        }

        // assembly matrix (AssemblyMatrix.__init__ shape)
        ll n_frags, cb, hb;
        krun_stage_meta(hv, t, &n_frags, &cb, &hb);
        ll cap = t_len * 2 > 16 ? t_len * 2 : 16;
        if (cap < t_len + cb + 1)
            cap = t_len + cb + 1;
        mcounts.assign((size_t)cap * 6, 0);
        mnext.assign((size_t)cap, 0);
        for (ll i = 0; i + 1 < t_len; ++i)
            mnext[i] = i + 1;
        if (t_len)
            mnext[t_len - 1] = 0;   // circularise (assembly.c:1852-1855)
        ll mat_len = t_len;
        ll rows_cap = cb + hb + n_frags * (80 + name_len) + 64;
        rows.resize((size_t)rows_cap);
        ll a_score = 0, a_fa = 0, a_ra = 0, rows_len = 0;
        for (;;) {
            ll new_len = krun_assemble_template(
                hv, t, Wl_raw, minlen, mq, scoreT, mrc, circular, ts,
                skip_tails, dense, mcounts.data(), mnext.data(), mat_len,
                t_len, name, name_len, &a_score, &a_fa, &a_ra,
                rows.data(), rows_cap, &rows_len);
            if (new_len >= 0) {
                mat_len = new_len;
                break;
            }
            rows_cap *= 4;
            rows.resize((size_t)rows_cap);
        }
        if (R->xml_sink) {
            ll xn = kxml_rows_len(R->xml_sink);
            if (xn) {
                size_t base = R->out_xml.size();
                R->out_xml.resize(base + (size_t)xn);
                kxml_rows_fetch(R->xml_sink, R->out_xml.data() + base);
            }
        }
        if (want_frag && rows_len)
            buf_put(R->out_frag, rows.data(), (size_t)rows_len);

        ll aln_len_s = 0, cover_s = 0, depth_s = 0, dvar_s = 0;
        ll asm_len = 0;
        if (a_score) {
            void *h = R->handle_for((int)t);
            const uint8_t *tcodes = kidx_codes(h);
            asm_len = mat_len;
            t_arr.resize((size_t)asm_len);
            s_arr.resize((size_t)asm_len);
            q_arr.resize((size_t)asm_len);
            kassem_consensus(mcounts.data(), mnext.data(), tcodes,
                             (int)t_len, asm_len, bcd, evalue, support,
                             base_caller, significant, t_arr.data(),
                             s_arr.data(), q_arr.data(), stats);
            depth_s = stats[0];
            dvar_s = stats[1];
            aln_len_s = stats[2];
            cover_s = stats[3];
            if (!dense) {
                // drop dual-gap columns (assembly.c:2095-2124)
                ll w = 0;
                for (ll i = 0; i < asm_len; ++i) {
                    if (t_arr[i] == '-' && q_arr[i] == '-')
                        continue;
                    t_arr[w] = t_arr[i];
                    s_arr[w] = s_arr[i];
                    q_arr[w] = q_arr[i];
                    ++w;
                }
                asm_len = w;
            }
        }

        double id_ = 0.0, q_id = 0.0, depth = 0.0, cover = 0.0,
               q_cover = 0.0;
        ll aln_len = 0;
        if (cover_s > 0) {
            depth = (double)depth_s / (double)t_len;
            id_ = 100.0 * (double)cover_s / (double)t_len;
            aln_len = aln_len_s;
            q_id = 100.0 * (double)cover_s / (double)aln_len;
            cover = 100.0 * (double)aln_len / (double)t_len;
            q_cover = 100.0 * (double)t_len / (double)aln_len;
        } else if (R->mem_mode) {
            // runkma.c:1515-1523: MEM keeps depth/cover of empty assemblies
            depth = (double)depth_s / (double)t_len;
            aln_len = aln_len_s;
            cover = 100.0 * (double)aln_len / (double)t_len;
        }
        if (R->xml_sink) {
            // capIterXML (xml.c:130-145) with getEntropy over the
            // trimmed consensus query
            double h_ = 0.0;
            if (aln_len_s > 0) {
                ll cnt[256] = {0};
                for (ll i = 0; i < aln_len_s && i < (ll)q_arr.size(); ++i)
                    ++cnt[q_arr[i]];
                for (int b2 = 0; b2 < 256; ++b2)
                    if (cnt[b2]) {
                        double pr = (double)cnt[b2] / (double)aln_len_s;
                        h_ -= pr * log2(pr);
                    }
            }
            ll seqsize = 4ll * (ll)R->seq_bytes;
            buf_printf(R->out_xml,
                       "</Iteration_hits>\n\t<Iteration_stat>\n"
                       "\t\t<Statistics>\n"
                       "\t\t\t<Statistics_db-num>%lld"
                       "</Statistics_db-num>\n"
                       "\t\t\t<Statistics_db-len>%lld"
                       "</Statistics_db-len>\n"
                       "\t\t\t<Statistics_hsp-len>%lld"
                       "</Statistics_hsp-len>\n"
                       "\t\t\t<Statistics_eff-space>%lld"
                       "</Statistics_eff-space>\n",
                       (long long)db_size, (long long)seqsize,
                       (long long)read_counts[t],
                       (long long)(seqsize * t_len));
            buf_printf(R->out_xml,
                       "\t\t\t<Statistics_kappa>%4.1e"
                       "</Statistics_kappa>\n"
                       "\t\t\t<Statistics_lambda>%4.1e"
                       "</Statistics_lambda>\n"
                       "\t\t\t<Statistics_entropy>%f"
                       "</Statistics_entropy>\n"
                       "\t\t</Statistics>\n\t</Iteration_stat>\n"
                       "</Iteration>\n",
                       p_value * (double)read_score, p_value, h_);
        }
        bool printed = R->mem_mode
                           ? (ID_t <= id_ && Depth_t <= depth)
                           : (ID_t <= id_ && 0 < id_ && Depth_t <= depth);
        if (!printed) {
            flush_seg(t);   // .frag rows may already be emitted
            continue;
        }

        // .res row (runkma.c:816); (unsigned)(long double) cast like
        // writers.c_unsigned
        unsigned exp_u = (unsigned)(long long)expected;
        buf_put(R->out_res, name, (size_t)name_len);
        buf_printf(R->out_res,
                   "\t%8lld\t%8u\t%8lld\t%8.2f\t%8.2f\t%8.2f\t%8.2f\t"
                   "%8.2f\t%8.2f\t%4.1e\n",
                   (long long)read_score, exp_u, (long long)t_len, id_,
                   cover, q_id, q_cover, depth, (double)q_value, p_value);
        if (R->tsv_mask) {
            // printsv (tsv.c:49-108): tab between printed fields,
            // newline with the highest remaining bit
            unsigned long long fl = R->tsv_mask & 65535ull;
            ll al_g = aln_len_s ? aln_len_s : 1;   // guarded aln_len
            ll ccs = R->alignment_scores[t];
            char num[64];
            auto fput = [&](const char *txt, ll n_) {
                buf_put(R->out_tsv, txt, (size_t)n_);
                fl >>= 1;
                buf_put(R->out_tsv, fl ? "\t" : "\n", 1);
            };
            auto fnum = [&](const char *fmt, double v) {
                int n_ = snprintf(num, sizeof num, fmt, v);
                fput(num, n_);
            };
            auto fint = [&](ll v) {
                int n_ = snprintf(num, sizeof num, "%lld",
                                  (long long)v);
                fput(num, n_);
            };
            // field order mirrors writers.TSV_FIELDS
            if (fl & 1) fput((const char *)name, name_len); else fl >>= 1;
            if (fl & 1) fint(t_len); else fl >>= 1;
            if (fl & 1) fnum("%f", 100.0 * (double)cover_s / t_len);
            else fl >>= 1;
            if (fl & 1) fnum("%f", 100.0 * (double)aln_len_s / t_len);
            else fl >>= 1;
            if (fl & 1) fnum("%f", (double)depth_s / t_len);
            else fl >>= 1;
            if (fl & 1) fnum("%f", 100.0 * (double)cover_s / al_g);
            else fl >>= 1;
            if (fl & 1) fnum("%f", 100.0 * (double)cover_s / al_g);
            else fl >>= 1;
            if (fl & 1) fnum("%f", (double)depth_s / al_g);
            else fl >>= 1;
            if (fl & 1) fint(read_counts[t]); else fl >>= 1;
            if (fl & 1) fint(a_ra); else fl >>= 1;
            if (fl & 1) fint(read_score); else fl >>= 1;
            if (fl & 1) fnum("%f", (double)expected); else fl >>= 1;
            if (fl & 1) fnum("%f", (double)q_value); else fl >>= 1;
            if (fl & 1) fnum("%e", p_value); else fl >>= 1;
            if (fl & 1) fint(ccs); else fl >>= 1;
            if (fl & 1)
                fnum("%f", (ccs && read_score)
                               ? 40.0 * (double)read_score / ccs
                                     * log((double)read_score)
                               : 0.0);
            else
                fl >>= 1;
        }

        // .aln / .fsa (printconsensus.c:24-61)
        if (want_aln) {
            buf_put(R->out_aln, "# ", 2);
            buf_put(R->out_aln, name, (size_t)name_len);
            buf_put(R->out_aln, "\n", 1);
            for (ll i = 0; i < asm_len; i += 60) {
                ll seg = asm_len - i < 60 ? asm_len - i : 60;
                buf_put(R->out_aln, "template: \t", 11);
                buf_put(R->out_aln, t_arr.data() + i, (size_t)seg);
                buf_put(R->out_aln, "\n          \t", 12);
                buf_put(R->out_aln, s_arr.data() + i, (size_t)seg);
                buf_put(R->out_aln, "\nquery:    \t", 12);
                buf_put(R->out_aln, q_arr.data() + i, (size_t)seg);
                buf_put(R->out_aln, "\n\n", 2);
            }
        }
        if (want_fsa) {
            // ref_fsa 0: strip '-'; 1: '-' -> 'n'
            ll flen = asm_len;
            if (ref_fsa == 0) {
                ll w = 0;
                for (ll i = 0; i < asm_len; ++i)
                    if (q_arr[i] != '-')
                        q_arr[w++] = q_arr[i];
                flen = w;
            } else if (ref_fsa == 1) {
                for (ll i = 0; i < asm_len; ++i)
                    if (q_arr[i] == '-')
                        q_arr[i] = 'n';
            }
            buf_put(R->out_fsa, ">", 1);
            buf_put(R->out_fsa, name, (size_t)name_len);
            buf_put(R->out_fsa, "\n", 1);
            for (ll i = 0; i < flen; i += 60) {
                ll seg = flen - i < 60 ? flen - i : 60;
                buf_put(R->out_fsa, q_arr.data() + i, (size_t)seg);
                buf_put(R->out_fsa, "\n", 1);
            }
        }

        // .mat.gz rows (updateMatrix, assembly.c:85-140)
        if (want_matrix) {
            void *h = R->handle_for((int)t);
            const uint8_t *tcodes = kidx_codes(h);
            ll cap2 = mat_len * 136 + name_len + 64;
            for (;;) {
                if ((ll)fmt.size() < cap2)
                    fmt.resize((size_t)cap2);
                cap2 = (ll)fmt.size();
                ll n = kassem_matrix_rows(
                    mcounts.data(), mnext.data(), mat_len, (int)t_len,
                    tcodes, name, name_len, fmt.data(), cap2);
                if (n >= 0) {
                    buf_put(R->out_mat, fmt.data(), (size_t)n);
                    break;
                }
                cap2 *= 2;
            }
        }

        // .mapstat row (getExtendedFeatures ef.c:48-127 +
        // printExtendedFeatures ef.c:129-136)
        if (want_ef) {
            double var = 0.0;
            ll out5[5] = {0, 0, 0, 0, 0};
            ll frag_aln = a_fa, read_aln = a_ra;
            if (a_score) {
                double mean = (double)depth_s / (double)t_len;
                var = (double)dvar_s / (double)t_len - mean * mean;
                if (var < 0) {
                    // fixVarOverflow (assembly.c:1656-1680): raw template
                    // positions only (naive left-to-right accumulation)
                    double acc = 0.0;
                    for (ll p = 0; p < t_len; ++p) {
                        double tot = 0.0;
                        for (int j = 0; j < 6; ++j)
                            tot += (double)mcounts[(size_t)p * 6 + j];
                        double d = tot - mean;
                        acc += d * d / (double)t_len;
                    }
                    var = acc;
                }
                double highVar = var >= 0 ? mean + 3.0 * sqrt(var) : 0.0;
                ll half = (read_aln >> 1) + (read_aln & 1);
                if (frag_aln < half)
                    frag_aln = half;
                worder.resize((size_t)mat_len);
                kassem_walk(mnext.data(), mat_len, worder.data());
                void *h = R->handle_for((int)t);
                const uint8_t *tcodes = kidx_codes(h);
                kassem_ef(mcounts.data(), worder.data(), tcodes,
                          (int)t_len, mat_len, highVar, out5);
            }
            buf_put(R->out_ef, name, (size_t)name_len);
            buf_printf(R->out_ef,
                       "\t%lld\t%lld\t%lld\t%lld\t%lld\t%lld\t%f\t%lld\t"
                       "%lld\t%lld\t%lld\t%lld\t%lld\t%lld\n",
                       read_counts[t], fragment_counts[t],
                       (long long)a_score, aln_len_s, cover_s, depth_s,
                       var, out5[4], out5[3], out5[0], out5[1], out5[2],
                       read_aln, frag_aln);
        }

        // .vcf.gz rows (updateVcf, vcf.c:97-282); t_arr is already
        // dual-gap-trimmed for !dense, matching the Python caller
        if (vcf_filt) {
            ll cap2 = mat_len * (name_len + 224) + 256;
            for (;;) {
                if ((ll)fmt.size() < cap2)
                    fmt.resize((size_t)cap2);
                cap2 = (ll)fmt.size();
                ll n = kassem_vcf_rows(
                    mcounts.data(), mnext.data(), mat_len, (int)t_len,
                    t_arr.data(), asm_len, name, name_len, evalue,
                    support, bcd, vcf_filt, base_caller, significant,
                    fmt.data(), cap2);
                if (n >= 0) {
                    buf_put(R->out_vcf, fmt.data(), (size_t)n);
                    break;
                }
                cap2 *= 2;
            }
        }
        flush_seg(t);
    }
    *o_mat_len = (ll)R->out_mat.size();
    *o_vcf_len = (ll)R->out_vcf.size();
    *o_ef_len = (ll)R->out_ef.size();
    *o_res_len = (ll)R->out_res.size();
    *o_fsa_len = (ll)R->out_fsa.size();
    *o_aln_len = (ll)R->out_aln.size();
    *o_frag_len = (ll)R->out_frag.size();
    return 0;
}

// Per-printed-template segment table (fetch BEFORE krun_output_fetch,
// which clears it): template ids + 7 byte counts each.
long long krun_output_nseg(void *hv) {
    return (ll)((Run *)hv)->seg_tpl.size();
}

void krun_output_segments(void *hv, int32_t *tpl, long long *lens7) {
    Run *R = (Run *)hv;
    memcpy(tpl, R->seg_tpl.data(), R->seg_tpl.size() * 4);
    memcpy(lens7, R->seg_lens.data(), R->seg_lens.size() * 8);
}

void krun_output_fetch(void *hv, uint8_t *res, uint8_t *fsa, uint8_t *aln,
                       uint8_t *frag, uint8_t *mat, uint8_t *vcf,
                       uint8_t *ef) {
    Run *R = (Run *)hv;
    if (res && !R->out_res.empty())
        memcpy(res, R->out_res.data(), R->out_res.size());
    if (fsa && !R->out_fsa.empty())
        memcpy(fsa, R->out_fsa.data(), R->out_fsa.size());
    if (aln && !R->out_aln.empty())
        memcpy(aln, R->out_aln.data(), R->out_aln.size());
    if (frag && !R->out_frag.empty())
        memcpy(frag, R->out_frag.data(), R->out_frag.size());
    if (mat && !R->out_mat.empty())
        memcpy(mat, R->out_mat.data(), R->out_mat.size());
    if (vcf && !R->out_vcf.empty())
        memcpy(vcf, R->out_vcf.data(), R->out_vcf.size());
    if (ef && !R->out_ef.empty())
        memcpy(ef, R->out_ef.data(), R->out_ef.size());
    for (auto *b : {&R->out_res, &R->out_fsa, &R->out_aln, &R->out_frag,
                    &R->out_mat, &R->out_vcf, &R->out_ef}) {
        b->clear();
        b->shrink_to_fit();
    }
    R->seg_tpl.clear();
    R->seg_lens.clear();
}

long long krun_spool_len(void *hv) { return (ll)((Run *)hv)->spool.size(); }

// Raw spool export (collect mode / .frag_raw.gz rows): sizes then arrays.
void krun_spool_meta(void *hv, long long *n, long long *tpl_total,
                     long long *cod_bytes, long long *hdr_bytes,
                     long long *mcod_bytes, long long *mhdr_bytes) {
    Spool &sp = ((Run *)hv)->spool;
    *n = (ll)sp.size();
    *tpl_total = sp.t_off.back();
    *cod_bytes = sp.cod_off.back();
    *hdr_bytes = sp.hdr_off.back();
    *mcod_bytes = sp.mcod_off.back();
    *mhdr_bytes = sp.mhdr_off.back();
}

void krun_spool_fill(void *hv, int32_t *q_len, int32_t *best_hits,
                     long long *score, int32_t *flag, long long *ord,
                     int32_t *tpl, int32_t *starts, int32_t *ends,
                     long long *t_off, uint8_t *cod, long long *cod_off,
                     uint8_t *hdr, long long *hdr_off, uint8_t *mcod,
                     long long *mcod_off, uint8_t *mhdr,
                     long long *mhdr_off, int32_t *mflag) {
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
    if (sp.mcod.size())
        memcpy(mcod, sp.mcod.data(), sp.mcod.size());
    memcpy(mcod_off, sp.mcod_off.data(), (n + 1) * 8);
    if (sp.mhdr.size())
        memcpy(mhdr, sp.mhdr.data(), sp.mhdr.size());
    memcpy(mhdr_off, sp.mhdr_off.data(), (n + 1) * 8);
    memcpy(mflag, sp.mflag.data(), n * 4);
}

}  // extern "C"
