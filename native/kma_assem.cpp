// Native assembly hot loops for kma_tpu (reference assembly.c).
//
// Exact ports of assemble/pileup.py's AssemblyMatrix.aln_to_mat /
// aln_to_mat_dense (alnToMat, assembly.c:1317-1497), call_consensus
// (callConsensus + baseCaller family, assembly.c:143-271,1499-1631) and
// the getExtendedFeatures position loop (ef.c:48-127).  The Python
// module stays the semantics reference and fallback.
//
// p-values route through glibc erf/tgamma exactly like the reference
// (and like utils/stats.py's ctypes libm calls), so consensus quality
// gating is bit-identical.

#include <cmath>
#include <cstdint>
#include <cstdio>
#include <cstring>

namespace {

const int64_t USHRT_MAX_ = 0xFFFF;
const uint8_t BASES[6] = {'A', 'C', 'G', 'T', 'N', '-'};

// stdstat.c:37-134 fastp lookup
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
    1e-16, 1e-15, 1e-14, 1e-13, 1e-12, 1e-11, 1e-10, 1e-9, 1e-8, 1e-7,
    1e-6, 1e-5, 1e-4, 1e-3, 0.01, 0.05, 0.1, 0.15, 0.2, 0.25, 0.3, 0.35,
    0.4, 0.45, 0.5, 0.55, 0.6, 0.65, 0.7, 0.75, 0.8, 0.85, 0.9, 0.95};

double fastp(double q) {
    for (int i = 0; i < 44; ++i)
        if (q > FASTP_THR[i])
            return FASTP_P[i];
    if (q >= 0.0)
        return 1.0;
    return 1.0 - fastp(-q);
}

// stdstat.c:136-147 (double-argument path, as the Python caller uses)
double p_chisqr(double q) {
    if (q < 0)
        return 1e-26;
    if (q > 49)
        return fastp(q);
    return 1 - 1.772453850 * erf(sqrt(0.5 * q)) / tgamma(0.5);
}

// significantNuc / And90 / AndSupport (assembly.c:143-160)
// significant: 0 mcnemar, 1 and90, 2 support
bool significant_base(int64_t X, int64_t Y, int significant,
                      double evalue, double support) {
    if (!(Y < X))
        return false;
    double chi = (X + Y)
                     ? p_chisqr((double)((X - Y) * (X - Y)) /
                                (double)(X + Y))
                     : 1.0;
    if (significant == 1)
        return (9 * (X + Y) <= 10 * X) && chi <= evalue;
    if (significant == 2)
        return (support * (double)(X + Y) <= (double)X) && chi <= evalue;
    return chi <= evalue;
}

// stdstat.c:149-159 exact binary exponentiation (rounding order matters)
double power_(double x, long long n) {
    if (n) {
        double y = power_(x, n >> 1);
        return (n & 1) ? y * y * x : y * y;
    }
    return 1.0;
}

// binomial point probability for VCF QUAL (stdstat.c:161-202)
double binP(long long n, long long k, double p) {
    double q = 1 - p;
    if (k == 0) {
        double P = power_(q, n);
        return P != 0.0 ? P : 1.0e-308;
    }
    if (n == k) {
        double P = power_(p, n);
        return P != 0.0 ? P : 1.0e-308;
    }
    if (p == 0 || q == 0)
        return 0.0;
    double P = 1.0;
    long long nk = n - k;
    double pq = p * q;
    long long i = n + 1;
    long long j = (k < nk ? k : nk) + 1;
    while (j > 1) {
        --j;
        --i;
        P *= ((double)i * pq / (double)j);
    }
    if (nk < k)
        P *= power_(p, k - nk);
    else if (k < nk)
        P *= power_(q, nk - k);
    return P != 0.0 ? P : 1.0e-308;
}

// baseCaller family as a pure function (assembly.c:162-271 /
// pileup.make_base_caller): (bestNuc_char, tNuc_char, bestScore,
// depthUpdate, row) -> char code.
int base_call(int base_caller, int significant, double evalue,
              double support, int bn, int tchar, int64_t bestScore,
              int64_t depthUpdate, const int64_t *row) {
    if (base_caller == 1) { // org
        if (depthUpdate == 0 || bn == '-')
            return '-';
        if (!significant_base(bestScore, depthUpdate - bestScore,
                              significant, evalue, support))
            return ('A' <= bn && bn <= 'Z') ? (bn | 0x20) : bn;
        return bn;
    }
    if (base_caller == 2) { // ref
        if (depthUpdate == 0 || (bn == '-' && tchar != '-'))
            return 'n';
        if (!significant_base(bestScore, depthUpdate - bestScore,
                              significant, evalue, support))
            return ('A' <= bn && bn <= 'Z') ? (bn | 0x20) : bn;
        return bn;
    }
    if (base_caller == 3) { // nano
        if (depthUpdate == 0)
            return '-';
        if (!significant_base(bestScore, depthUpdate - bestScore,
                              significant, evalue, support)) {
            if (bn == '-' && tchar != '-' && bestScore != depthUpdate) {
                int64_t bestBaseScore = 0;
                int bi = -1;
                for (int j = 0; j < 5; ++j)
                    if (bestBaseScore < row[j]) {
                        bestBaseScore = row[j];
                        bi = j;
                    }
                return bestBaseScore == 0 ? '-' : (BASES[bi] | 0x20);
            }
            return ('A' <= bn && bn <= 'Z') ? (bn | 0x20) : bn;
        }
        return bn;
    }
    // default
    if (depthUpdate == 0)
        return '-';
    if (!significant_base(bestScore, depthUpdate - bestScore, significant,
                          evalue, support)) {
        if (bn == '-' && tchar != '-' && bestScore != depthUpdate)
            return 'n';
        return ('A' <= bn && bn <= 'Z') ? (bn | 0x20) : bn;
    }
    return bn;
}

// fast unsigned decimal append (all VCF/matrix int fields are >= 0)
inline long long put_u(unsigned char *buf, unsigned long long v) {
    char tmp[24];
    int n = 0;
    do {
        tmp[n++] = (char)('0' + (int)(v % 10));
        v /= 10;
    } while (v);
    for (int i = 0; i < n; ++i)
        buf[i] = (unsigned char)tmp[n - 1 - i];
    return n;
}

inline long long put_lit(unsigned char *buf, const char *s) {
    size_t n = strlen(s);
    memcpy(buf, s, n);
    return (long long)n;
}

// direct-mapped format caches: pileup depths cluster, so the same few
// doubles are formatted millions of times; keys are exact bit patterns
struct FmtCache {
    struct Ent {
        uint64_t bits;
        uint8_t len;
        char str[22];
    };
    Ent e[2048] = {};
    template <typename F>
    long long put(unsigned char *buf, double v, F fmt) {
        uint64_t b;
        memcpy(&b, &v, 8);
        Ent &x = e[(b ^ (b >> 17) ^ (b >> 41)) & 2047];
        if (x.bits != b || !x.len) {
            x.bits = b;
            x.len = (uint8_t)fmt(x.str, v);
        }
        memcpy(buf, x.str, x.len);
        return x.len;
    }
};
thread_local FmtCache f2_cache, e1_cache;

// value caches on the same principle (exact-bit keys)
struct ValCache {
    struct Ent {
        uint64_t key;
        double val;
        bool set;
    };
    Ent e[2048] = {};
    template <typename F>
    double get(uint64_t key, F calc) {
        Ent &x = e[(key ^ (key >> 17) ^ (key >> 41)) & 2047];
        if (!x.set || x.key != key) {
            x.key = key;
            x.val = calc();
            x.set = true;
        }
        return x.val;
    }
};
thread_local ValCache pchi_cache, qual_cache;

inline long long put_f2(unsigned char *buf, double v) {
    return f2_cache.put(buf, v, [](char *s, double x) {
        return snprintf(s, 22, "%.2f", x);
    });
}
inline long long put_e1(unsigned char *buf, double v) {
    return e1_cache.put(buf, v, [](char *s, double x) {
        return snprintf(s, 16, "%4.1e", x);
    });
}

// vcf.c NUC2NUM: char -> base index, 8 when unknown
int nuc2num(int c) {
    switch (c) {
    case 'A': case 'a': return 0;
    case 'C': case 'c': return 1;
    case 'G': case 'g': return 2;
    case 'T': case 't': return 3;
    case 'N': case 'n': return 4;
    case '-': return 5;
    default: return 8;
    }
}

} // namespace

extern "C" {

// updateMatrix rows for one template (assembly.c:85-140 /
// writers.matrix_rows): "#name\n" then per walk position the ref base
// and the six counts, final blank line.  Returns bytes written, or -1
// when `cap` is too small (caller grows and retries).
long long kassem_matrix_rows(const long long *counts, const long long *nxt,
                             long long mat_len, int t_len,
                             const unsigned char *template_codes,
                             const unsigned char *name, long long name_len,
                             unsigned char *buf, long long cap) {
    const int64_t *cnt = (const int64_t *)counts;
    long long w = 0;
    if (w + name_len + 2 > cap)
        return -1;
    buf[w++] = '#';
    memcpy(buf + w, name, (size_t)name_len);
    w += name_len;
    buf[w++] = '\n';
    int64_t pos = 0;
    long long ti = 0;
    for (long long i = 0; i < mat_len; ++i, pos = nxt[pos]) {
        if (w + 136 > cap)
            return -1;
        unsigned char *p = buf + w;
        *p++ = pos < t_len ? BASES[template_codes[ti++]] : '-';
        const int64_t *row = cnt + pos * 6;
        for (int j = 0; j < 6; ++j) {
            *p++ = '\t';
            p += put_u(p, (unsigned long long)row[j]);
        }
        *p++ = '\n';
        w = (long long)(p - buf);
    }
    if (w + 1 > cap)
        return -1;
    buf[w++] = '\n';
    return w;
}

// updateVcf rows for one template (vcf.c:97-282 / out/vcf.vcf_rows).
// assem_t = the dual-gap-trimmed consensus template chars; the walk
// re-syncs at trimmed insertion rows.  Returns bytes written or -1 when
// `cap` is too small.
long long kassem_vcf_rows(const long long *counts, const long long *nxt,
                          long long mat_len, int t_len,
                          const unsigned char *assem_t, long long assem_len,
                          const unsigned char *name, long long name_len,
                          double evalue, double support, int bcd, int filt,
                          int base_caller, int significant,
                          unsigned char *buf, long long cap) {
    const int64_t *cnt = (const int64_t *)counts;
    const double ln_const = -10.0 / log(10.0);
    long long w = 0;
    int64_t pos = 0;
    long long ti = 0;
    for (long long i = 0; i < mat_len; ++i, pos = nxt[pos]) {
        int64_t next_pos = nxt[pos];
        int nuc = ti < assem_len ? assem_t[ti] : '-';
        if (pos < t_len) {
            ++ti;
        } else if (nuc != '-') {
            nuc = '-';
        } else {
            ++ti;
        }
        const int64_t *row = cnt + pos * 6;
        int bi = nuc2num(nuc);
        int64_t bestScore = bi < 6 ? row[bi] : 0;
        int64_t depthUpdate = 0;
        for (int j = 0; j < 6; ++j) {
            if (bestScore < row[j]) {
                bestScore = row[j];
                bi = j;
            }
            depthUpdate += row[j];
        }
        int nucNum = bi;
        int bestNuc = bi < 6 ? BASES[bi] : '-';
        if (!depthUpdate) {
            nucNum = 5;
            bestNuc = '-';
        } else if ((bestScore << 1) < depthUpdate) {
            if (bestNuc == '-') {
                int64_t bestBaseScore = 0;
                int bj = 4;
                for (int j = 0; j < 5; ++j)
                    if (bestBaseScore < row[j]) {
                        bestBaseScore = row[j];
                        bj = j;
                    }
                nucNum = bj;
                bestNuc = BASES[bj] | 0x20;
            } else {
                bestNuc |= 0x20;
            }
            bestScore = depthUpdate - row[5];
        } else if (depthUpdate < bcd) {
            bestNuc |= 0x20;
        }

        if (bestScore) {
            bestNuc = base_call(base_caller, significant, evalue, support,
                                bestNuc, nuc, bestScore, depthUpdate, row);
            nucNum = nuc2num(bestNuc);
            long long DP = depthUpdate;
            long long AD = nucNum < 6 ? (long long)row[nucNum] : 0;
            double AF = (double)AD / (double)DP;
            double RAF = (double)bestScore / (double)DP;
            long long DEL = (long long)row[5];
            long long d2 = depthUpdate - (bestScore << 1);
            double Q = (double)(d2 * d2) / (double)depthUpdate;
            uint64_t qb;
            memcpy(&qb, &Q, 8);
            double P = pchi_cache.get(qb, [&] { return p_chisqr(Q); });
            bool cond = nuc != bestNuc
                        || (t_len <= next_pos
                            && (ti < assem_len && assem_t[ti] == '-'))
                        || DP < bcd || evalue < P
                        || AD < support * (double)DP;
            if (cond) {
                uint64_t dk = ((uint64_t)DP << 24) ^ (uint64_t)AD;
                long long QUAL = (long long)qual_cache.get(dk, [&] {
                    return ln_const * log(binP(DP, AD, 0.25));
                });
                if (QUAL < 0 || 3079 < QUAL)
                    QUAL = 3079;
                const char *FILTER;
                if (bcd <= DP && P <= evalue
                    && support * (double)DP <= (double)AD)
                    FILTER = "PASS";
                else if (bcd <= DP || P <= evalue
                         || support * (double)DP <= (double)AD)
                    FILTER = "LowQual";
                else
                    FILTER = "FAIL";
                const char *fcol = filt == 2 ? FILTER : ".";
                if (w + name_len + 256 > cap)
                    return -1;
                unsigned char *p = buf + w;
                memcpy(p, name, (size_t)name_len);
                p += name_len;
                *p++ = '\t';
                if (pos < t_len)
                    p += put_u(p, (unsigned long long)(pos + 1));
                else
                    *p++ = '0';
                p += put_lit(p, "\t.\t");
                if (nuc != '-')
                    *p++ = (unsigned char)nuc;
                else
                    p += put_lit(p, "<->");
                *p++ = '\t';
                if (bestNuc != '-')
                    *p++ = (unsigned char)bestNuc;
                else
                    p += put_lit(p, "<->");
                *p++ = '\t';
                p += put_u(p, (unsigned long long)QUAL);
                *p++ = '\t';
                p += put_lit(p, fcol);
                p += put_lit(p, "\tDP=");
                p += put_u(p, (unsigned long long)DP);
                p += put_lit(p, ";AD=");
                p += put_u(p, (unsigned long long)AD);
                p += put_lit(p, ";AF=");
                p += put_f2(p, AF);
                p += put_lit(p, ";RAF=");
                p += put_f2(p, RAF);
                p += put_lit(p, ";DEL=");
                p += put_u(p, (unsigned long long)DEL);
                p += put_lit(p, ";AD6=");
                for (int j = 0; j < 6; ++j) {
                    p += put_u(p, (unsigned long long)row[j]);
                    *p++ = j < 5 ? ',' : '\t';
                }
                p += put_lit(p, "Q:P:FT\t");
                p += put_f2(p, Q);
                *p++ = ':';
                p += put_e1(p, P);
                *p++ = ':';
                p += put_lit(p, FILTER);
                *p++ = '\n';
                w = (long long)(p - buf);
            }
        } else if (pos < t_len) {
            // zero-depth row: all-literal tail ("%4.1e" of 1.0)
            const char *fcol = filt == 2 ? "FAIL" : ".";
            if (w + name_len + 160 > cap)
                return -1;
            unsigned char *p = buf + w;
            memcpy(p, name, (size_t)name_len);
            p += name_len;
            *p++ = '\t';
            p += put_u(p, (unsigned long long)(pos + 1));
            p += put_lit(p, "\t.\t");
            *p++ = (unsigned char)nuc;
            p += put_lit(p, "\t.\t0\t");
            p += put_lit(p, fcol);
            p += put_lit(p, "\tDP=0;AD=0;AF=0.00;RAF=0.00;DEL=0;"
                            "AD6=0,0,0,0,0,0\tQ:P:FT\t0.00:1.0e+00:FAIL\n");
            w = (long long)(p - buf);
        }
        if (next_pos == 0)
            break;
    }
    return w;
}

// alnToMat (assembly.c:1317-1444).  counts[cap][6]/next[cap] are the
// Python AssemblyMatrix arrays (int64); the caller pre-grows capacity to
// at least mat_len + aln_len.  Returns the new matrix length.
long long kassem_aln_to_mat(long long *counts, long long *next_,
                            long long mat_len, int t_len,
                            const unsigned char *aln_t,
                            const unsigned char *aln_q, long long aln_len,
                            int start) {
    int64_t *cnt = (int64_t *)counts;
    int64_t *nxt = (int64_t *)next_;
    long long i = aln_len - 1;
    while (i && (aln_t[i] == 5 || aln_q[i] == 5))
        --i;
    aln_len = i + 1;
    i = 0;
    while (i < aln_len && (aln_t[i] == 5 || aln_q[i] == 5)) {
        if (aln_q[i] == 5)
            ++start;
        ++i;
    }
    int64_t pos = start;
    while (i < aln_len) {
        if (aln_t[i] == 5) { // insertion relative to template
            if (t_len <= pos) {
                int64_t c = cnt[pos * 6 + aln_q[i]] + 1;
                cnt[pos * 6 + aln_q[i]] = c > USHRT_MAX_ ? USHRT_MAX_ : c;
                if (cnt[pos * 6 + aln_q[i]] == 0)
                    cnt[pos * 6 + aln_q[i]] = USHRT_MAX_;
                ++i;
                pos = nxt[pos];
            } else {
                int64_t gaps = pos;
                pos = pos ? pos - 1 : t_len - 1;
                while (nxt[pos] != gaps)
                    pos = nxt[pos];
                int64_t myBias = 0, tmp = 0;
                for (int j = 0; j < 6; ++j) {
                    myBias += cnt[pos * 6 + j];
                    tmp += cnt[gaps * 6 + j];
                }
                myBias = tmp < myBias ? tmp : myBias - 1;
                if (USHRT_MAX_ < myBias)
                    myBias = USHRT_MAX_;
                while (i < aln_len && aln_t[i] == 5) {
                    nxt[pos] = mat_len;
                    ++mat_len;
                    pos = nxt[pos];
                    nxt[pos] = gaps;
                    for (int j = 0; j < 6; ++j)
                        cnt[pos * 6 + j] = 0;
                    cnt[pos * 6 + 5] = myBias;
                    cnt[pos * 6 + aln_q[i]] = 1;
                    ++i;
                }
                pos = nxt[pos];
            }
        } else if (t_len <= pos) { // old insertion column not in read
            int64_t c = cnt[pos * 6 + 5] + 1;
            cnt[pos * 6 + 5] = c > USHRT_MAX_ ? USHRT_MAX_ : c;
            pos = nxt[pos];
        } else {
            int64_t c = cnt[pos * 6 + aln_q[i]] + 1;
            cnt[pos * 6 + aln_q[i]] = c > USHRT_MAX_ ? USHRT_MAX_ : c;
            ++i;
            pos = nxt[pos];
        }
    }
    return mat_len;
}

// alnToMatDense (assembly.c:1446-1497)
void kassem_aln_to_mat_dense(long long *counts, long long *next_,
                             const unsigned char *aln_t,
                             const unsigned char *aln_q, long long aln_len,
                             int start) {
    int64_t *cnt = (int64_t *)counts;
    int64_t *nxt = (int64_t *)next_;
    long long i = aln_len - 1;
    while (0 <= i && (aln_t[i] == 5 || aln_q[i] == 5))
        --i;
    aln_len = i + 1;
    int64_t pos = start;
    for (i = 0; i < aln_len; ++i) {
        if (aln_t[i] != 5) {
            int64_t c = cnt[pos * 6 + aln_q[i]] + 1;
            cnt[pos * 6 + aln_q[i]] = c > USHRT_MAX_ ? USHRT_MAX_ : c;
            pos = nxt[pos];
        }
    }
}

// callConsensus (assembly.c:1499-1631) + baseCaller family (:143-271).
// counts = RAW matrix counts [cap, 6]; nxt = the matrix chain (walked
// internally — saves the caller a walk + gather).
// base_caller: 0 default, 1 org, 2 ref, 3 nano.
// out_stats: {depth_total, depth_var, aln_len, cover}.
void kassem_consensus(const long long *counts, const long long *nxt,
                      const unsigned char *template_codes, int t_len,
                      long long asm_len, int bcd, double evalue,
                      double support, int base_caller, int significant,
                      unsigned char *t_arr, unsigned char *s_arr,
                      unsigned char *q_arr, long long *out_stats) {
    const int64_t *cw = (const int64_t *)counts;
    int64_t depth_total = 0, depth_var = 0, aln_len = 0, cover = 0;
    int64_t pos = 0;
    for (long long i = 0; i < asm_len; ++i, pos = nxt[pos]) {
        int tn = pos < t_len ? template_codes[pos] : 5;
        t_arr[i] = BASES[tn];
        const int64_t *row = cw + pos * 6;
        int64_t bestScore = row[tn];
        int bestIdx = tn;
        int64_t depthUpdate = 0;
        for (int j = 0; j < 6; ++j) {
            if (bestScore < row[j]) {
                bestScore = row[j];
                bestIdx = j;
            }
            depthUpdate += row[j];
        }
        int bn = BASES[bestIdx];

        if (!depthUpdate) {
            bn = '-';
        } else if ((bestScore << 1) < depthUpdate) {
            // minor call (assembly.c:1567-1581)
            if (bn == '-') {
                int64_t bestBaseScore = row[4];
                int bi = 4;
                for (int j = 0; j < 4; ++j)
                    if (bestBaseScore < row[j]) {
                        bestBaseScore = row[j];
                        bi = j;
                    }
                bn = BASES[bi] | 0x20;
            } else {
                bn |= 0x20;
            }
            bestScore = depthUpdate - row[5];
        } else if (depthUpdate < bcd) {
            bn |= 0x20;
        }

        int tchar = t_arr[i];
        if (base_caller == 1) { // org
            if (depthUpdate == 0 || bn == '-')
                bn = '-';
            else if (!significant_base(bestScore, depthUpdate - bestScore,
                                       significant, evalue, support))
                bn = ('A' <= bn && bn <= 'Z') ? (bn | 0x20) : bn;
        } else if (base_caller == 2) { // ref
            if (depthUpdate == 0 || (bn == '-' && tchar != '-'))
                bn = 'n';
            else if (!significant_base(bestScore, depthUpdate - bestScore,
                                       significant, evalue, support))
                bn = ('A' <= bn && bn <= 'Z') ? (bn | 0x20) : bn;
        } else if (base_caller == 3) { // nano
            if (depthUpdate == 0) {
                bn = '-';
            } else if (!significant_base(bestScore,
                                         depthUpdate - bestScore,
                                         significant, evalue, support)) {
                if (bn == '-' && tchar != '-' &&
                    bestScore != depthUpdate) {
                    int64_t bestBaseScore = 0;
                    int bi = -1;
                    for (int j = 0; j < 5; ++j)
                        if (bestBaseScore < row[j]) {
                            bestBaseScore = row[j];
                            bi = j;
                        }
                    bn = bestBaseScore == 0 ? '-' : (BASES[bi] | 0x20);
                } else {
                    bn = ('A' <= bn && bn <= 'Z') ? (bn | 0x20) : bn;
                }
            }
        } else { // default (assembly.c:162-179)
            if (depthUpdate == 0) {
                bn = '-';
            } else if (!significant_base(bestScore,
                                         depthUpdate - bestScore,
                                         significant, evalue, support)) {
                if (bn == '-' && tchar != '-' && bestScore != depthUpdate)
                    bn = 'n';
                else
                    bn = ('A' <= bn && bn <= 'Z') ? (bn | 0x20) : bn;
            }
        }

        q_arr[i] = (unsigned char)bn;
        if (bn != '-') {
            depth_total += depthUpdate;
            depth_var += depthUpdate * depthUpdate;
            ++aln_len;
            int upper = ('a' <= bn && bn <= 'z') ? (bn & ~0x20) : bn;
            if (pos < t_len && tchar == upper) {
                ++cover;
                s_arr[i] = '|';
            } else {
                s_arr[i] = '_';
            }
        } else {
            s_arr[i] = '_';
        }
    }
    out_stats[0] = depth_total;
    out_stats[1] = depth_var;
    out_stats[2] = aln_len;
    out_stats[3] = cover;
}

// getExtendedFeatures position loop (ef.c:48-127 / pileup.py:388-405).
// counts = RAW matrix counts [cap, 6]; order = walk order [mat_len].
// out: {snpSum, insertSum, deletionSum, maxDepth, nucHighVar}.
void kassem_ef(const long long *counts, const long long *order,
               const unsigned char *template_codes, int t_len,
               long long mat_len, double highVar, long long *out) {
    const int64_t *cnt = (const int64_t *)counts;
    int64_t snpSum = 0, insertSum = 0, deletionSum = 0, maxDepth = 0,
            nucHighVar = 0;
    for (long long i = 0; i < mat_len; ++i) {
        int64_t pos = order[i];
        const int64_t *row = cnt + pos * 6;
        int64_t depthUpdate = row[0] + row[1] + row[2] + row[3] + row[4];
        if (pos < t_len) {
            deletionSum += row[5];
            snpSum += depthUpdate - row[template_codes[pos]];
        } else {
            insertSum += depthUpdate;
        }
        depthUpdate += row[5];
        if (maxDepth < depthUpdate)
            maxDepth = depthUpdate;
        if (highVar < (double)depthUpdate)
            ++nucHighVar;
    }
    out[0] = snpSum;
    out[1] = insertSum;
    out[2] = deletionSum;
    out[3] = maxDepth;
    out[4] = nucHighVar;
}

// walk-order extraction (AssemblyMatrix.walk)
void kassem_walk(const long long *next_, long long mat_len,
                 long long *order) {
    int64_t pos = 0;
    for (long long i = 0; i < mat_len; ++i) {
        order[i] = pos;
        pos = ((const int64_t *)next_)[pos];
    }
}

} // extern "C"
