// Native step-1 fastq reader/packer for kma_tpu.
//
// Batch-parses fastq bytes, translates bases through the caller-supplied
// TO2BIT table (kma.c:1442-1481) and applies the bidirectional phred
// trim of phredStat (runinput.c:127-313) -- byte/float-exact with the
// Python reference implementation in kma_tpu/io/seq.py (phred_stat),
// including the raw-byte hardmask quirk (runinput.c:179) and the
// iterative worst-end segment removal with the caller's PROB double
// table so the floating-point sums match bit for bit.
//
// The Python pipeline (kma_tpu/io/pipeline.py iter_reads) feeds chunks
// of the (possibly gunzipped) stream and receives packed code/header
// arrays plus per-read offsets; per-read Python overhead drops to one
// array slice.

#include <cmath>
#include <cstdint>
#include <cstring>
#include <vector>

namespace {

inline long long find_nl(const unsigned char *buf, long long i,
                         long long n) {
    const void *q = memchr(buf + i, '\n', (size_t)(n - i));
    return q ? (long long)((const unsigned char *)q - buf) : -1;
}

// _chomp (seq.py:74): strip trailing " \t\r\n\v\f"
inline long long chomp_end(const unsigned char *b, long long s,
                           long long e) {
    while (e > s) {
        unsigned char c = b[e - 1];
        if (c == ' ' || c == '\t' || c == '\r' || c == '\n' || c == '\v' ||
            c == '\f')
            --e;
        else
            break;
    }
    return e;
}

} // namespace

extern "C" {

// Parse as many complete records from buf[0:len) as fit the output caps.
// last != 0 means buf is the end of the stream (a final line may lack
// its newline; a trailing incomplete record is silently dropped, like
// parse_fastq's `if not qual: return`).
//
// Outputs: codes_out/code_off (code_off[i]..code_off[i+1] = read i's
// trimmed, hardmasked codes), hdr_out/hdr_off (header without the
// leading '@', chomped, WITH trailing NUL).  *n_out = reads emitted.
// *status: 0 ok, 1 malformed (header line not starting with '@').
// Returns bytes consumed (records not emitted due to caps are NOT
// consumed; with status=1 the malformed record is not consumed).
long long kio_parse_fastq(
    const unsigned char *buf, long long len, int last,
    const unsigned char *to2bit, const double *prob, int scale,
    int min_phred, int min_q, int hardmask_q, long long min_len,
    long long max_len, unsigned char *codes_out, long long cap_codes,
    long long *code_off, unsigned char *hdr_out, long long cap_hdr,
    long long *hdr_off, int cap_reads, int *n_out, int *status,
    int emit_all, unsigned char *passed) {
    long long pos = 0;
    int n = 0;
    long long clen = 0, hlen = 0;
    code_off[0] = 0;
    hdr_off[0] = 0;
    *status = 0;
    const int minPhred = scale + min_phred;

    while (pos < len && n < cap_reads) {
        long long ls[4], le[4];
        long long p = pos;
        int got = 0;
        for (int i = 0; i < 4; ++i) {
            if (p >= len)
                break;
            ls[i] = p;
            long long nl = find_nl(buf, p, len);
            if (nl < 0) {
                if (!last)
                    break;
                le[i] = len;
                p = len;
            } else {
                le[i] = nl;
                p = nl + 1;
            }
            ++got;
        }
        if (got < 4) {
            if (last)
                pos = len; // trailing partial record: drop (readline EOF)
            break;         // else: carry for the next chunk
        }
        if (buf[ls[0]] != '@') {
            *status = 1;
            break;
        }

        // capacity: raw line lengths bound the packed sizes
        long long h_end = chomp_end(buf, ls[0], le[0]);
        long long hl = (h_end - (ls[0] + 1)) + 1; // sans '@', plus NUL
        long long seq_raw = le[1] - ls[1];
        if (clen + seq_raw > cap_codes || hlen + hl > cap_hdr)
            break;

        // translate seq (codes >= 8 dropped, seqparse.c:119)
        unsigned char *cp = codes_out + clen;
        long long nc = 0;
        for (long long i = ls[1]; i < le[1]; ++i) {
            unsigned char v = to2bit[buf[i]];
            if (v < 8)
                cp[nc++] = v;
        }

        // qual, truncated to len(codes) (seq.py:130)
        const unsigned char *qp = buf + ls[3];
        long long ql = chomp_end(buf, ls[3], le[3]) - ls[3];
        if (ql > nc)
            ql = nc;

        // --- phredStat (runinput.c:127-313 / seq.py phred_stat) ---
        long long length = nc;
        long long start = 0, end = length, ln_ret = 0;
        if (max_len >= length) {
            while (start < end &&
                   (start < ql ? qp[start] : 0) < minPhred)
                ++start;
            while (start < end &&
                   (end - 1 < ql ? qp[end - 1] : 0) < minPhred)
                --end;
            long long ln = end - start;
            if (!min_q && !hardmask_q) {
                ln_ret = ln;
            } else {
                // hardmask: RAW qual byte vs raw -mi (runinput.c:179)
                long long ns = 0;
                for (long long i = start; i < end; ++i) {
                    int qv = i < ql ? qp[i] : 0;
                    if (cp[i] == 4 || qv < hardmask_q) {
                        cp[i] = 4;
                        ++ns;
                    }
                }
                double sp = 0.0;
                for (long long i = start; i < end; ++i) {
                    int v = (i < ql ? qp[i] : 0) - scale;
                    if (v < 0)
                        v = 0;
                    if (v > 255)
                        v = 255;
                    sp += prob[v];
                }
                double minP = pow(10.0, -0.1 * (double)min_q);
                if (min_len <= (ln - ns) && (minP * (double)ln) < sp) {
                    // iterative worst-end removal (runinput.c:192-301)
                    long long p3 = end - 1, l3 = 0, ns3 = 0;
                    long long p5 = start, l5 = 0, ns5 = 0;
                    double sp3 = 0.0, sp5 = 0.0;
                    auto prob_at = [&](long long i) {
                        int v = (i < ql ? (int)qp[i] : 0) - scale;
                        return prob[v < 0 ? 0 : v];
                    };
                    auto take3 = [&](long long limit) {
                        for (int gate = 1; gate >= 0; --gate)
                            while (l3 < limit &&
                                   (((p3 < ql ? qp[p3] : 0) >= minPhred)
                                    == (gate != 0))) {
                                sp3 += prob_at(p3);
                                ++l3;
                                unsigned char c = cp[p3];
                                if (c == 4)
                                    ++ns3;
                                --p3;
                            }
                    };
                    auto take5 = [&](long long limit) {
                        for (int gate = 1; gate >= 0; --gate)
                            while (l5 < limit &&
                                   (((p5 < ql ? qp[p5] : 0) >= minPhred)
                                    == (gate != 0))) {
                                sp5 += prob_at(p5);
                                ++l5;
                                unsigned char c = cp[p5];
                                if (c == 4)
                                    ++ns5;
                                ++p5;
                            }
                    };
                    take3(ln);
                    while (min_len <= (ln - ns) &&
                           (minP * (double)ln) < sp) {
                        if ((sp5 * (double)l3) < (sp3 * (double)l5)) {
                            end -= l3;
                            ns -= ns3;
                            ln -= l3;
                            sp -= sp3;
                            l3 = ns3 = 0;
                            sp3 = 0.0;
                            take3(ln);
                        } else {
                            start += l5;
                            ln -= l5;
                            ns -= ns5;
                            sp -= sp5;
                            l5 = ns5 = 0;
                            sp5 = 0.0;
                            take5(ln);
                        }
                    }
                }
                ln_ret = ln - ns;
            }
        }

        if (min_len <= ln_ret) {
            if (start > 0)
                memmove(cp, cp + start, (size_t)(end - start));
            clen += end - start;
            memcpy(hdr_out + hlen, buf + ls[0] + 1,
                   (size_t)(hl - 1));
            hdr_out[hlen + hl - 1] = '\0';
            hlen += hl;
            if (passed)
                passed[n] = 1;
            ++n;
            code_off[n] = clen;
            hdr_off[n] = hlen;
        } else if (emit_all) {
            // PE streams need a slot for FAILED mates too (the pairing
            // walks both files in lockstep, run_input_PE)
            memcpy(hdr_out + hlen, buf + ls[0] + 1, (size_t)(hl - 1));
            hdr_out[hlen + hl - 1] = '\0';
            hlen += hl;
            if (passed)
                passed[n] = 0;
            ++n;
            code_off[n] = clen; // empty codes slice
            hdr_off[n] = hlen;
        }
        pos = p;
    }
    *n_out = n;
    return pos;
}

// Fasta sibling of kio_parse_fastq: '>'-headed records, sequence lines
// concatenated until the next '>' at line start.  Headers are emitted
// WITHOUT the leading '>' (matching the fastq parser's '@' strip; the
// reference's frag rows show bare names).  Trimming is fsastat (runinput.c:315-368): reject when
// max_len < raw length, trim edge Ns, keep when
// min_len <= (trimmed - internal Ns).
long long kio_parse_fasta(
    const unsigned char *buf, long long len, int last,
    const unsigned char *to2bit, long long min_len, long long max_len,
    unsigned char *codes_out, long long cap_codes, long long *code_off,
    unsigned char *hdr_out, long long cap_hdr, long long *hdr_off,
    int cap_reads, int *n_out, int *status, int emit_all,
    unsigned char *passed) {
    long long pos = 0;
    int n = 0;
    long long clen = 0, hlen = 0;
    code_off[0] = 0;
    hdr_off[0] = 0;
    *status = 0;
    while (pos < len && n < cap_reads) {
        if (buf[pos] == '\n') {   // stray blank line between records
            ++pos;
            continue;
        }
        if (buf[pos] != '>') {
            *status = 1;
            break;
        }
        long long hstart = pos;
        long long nl = find_nl(buf, pos, len);
        if (nl < 0) {
            if (last)
                pos = len;   // header with no sequence: drop
            break;
        }
        // record end: next line-start '>' or end of stream
        long long send = -1;
        for (long long p = nl + 1; p < len; ++p)
            if (buf[p] == '>' && buf[p - 1] == '\n') {
                send = p;
                break;
            }
        if (send < 0) {
            if (!last)
                break;       // carry the partial record
            send = len;
        }
        long long h_end = chomp_end(buf, hstart, nl);
        long long hl = (h_end - (hstart + 1)) + 1;  // sans '>', plus NUL
        long long seq_raw = send - (nl + 1);
        if (clen + seq_raw > cap_codes || hlen + hl > cap_hdr)
            break;
        unsigned char *cp = codes_out + clen;
        long long nc = 0;
        for (long long i = nl + 1; i < send; ++i) {
            unsigned char v = to2bit[buf[i]];
            if (v < 8)
                cp[nc++] = v;
        }
        // fsastat
        long long start = 0, end = nc, ln_ret = 0;
        if (max_len >= nc) {
            while (end > start && cp[end - 1] == 4)
                --end;
            while (start < end && cp[start] == 4)
                ++start;
            long long ns = 0;
            for (long long i = start; i < end; ++i)
                if (cp[i] == 4)
                    ++ns;
            ln_ret = (end - start) - ns;
        }
        if (min_len <= ln_ret) {
            if (start > 0)
                memmove(cp, cp + start, (size_t)(end - start));
            clen += end - start;
            memcpy(hdr_out + hlen, buf + hstart + 1, (size_t)(hl - 1));
            hdr_out[hlen + hl - 1] = '\0';
            hlen += hl;
            if (passed)
                passed[n] = 1;
            ++n;
            code_off[n] = clen;
            hdr_off[n] = hlen;
        } else if (emit_all) {
            memcpy(hdr_out + hlen, buf + hstart + 1, (size_t)(hl - 1));
            hdr_out[hlen + hl - 1] = '\0';
            hlen += hl;
            if (passed)
                passed[n] = 0;
            ++n;
            code_off[n] = clen;
            hdr_off[n] = hlen;
        }
        pos = send;
    }
    *n_out = n;
    return pos;
}

// values dedup of the index freeze (compressKMA_DB + valueshash.c):
// records visited in `order`; identical u32 template lists share one
// values entry [len, ids...].  out_values must hold n + sum(lens)
// entries (worst case, no duplicates); returns the used length.
// v_off[i] = the record's offset into out_values.
long long kio_dedup_values(const long long *f_offs,
                           const unsigned int *f_flat,
                           const long long *order, long long n,
                           long long *v_off, unsigned int *out_values) {
    // open-addressed (hash, first_record) table; key equality verified
    // against the already-emitted values entry
    unsigned long long cap = 64;
    while (cap < 2ull * (unsigned long long)(n ? n : 1))
        cap <<= 1;
    std::vector<long long> slot(cap, -1);
    unsigned long long hmask = cap - 1;
    long long v_index = 0;
    for (long long oi = 0; oi < n; ++oi) {
        long long i = order[oi];
        long long b = f_offs[i], e = f_offs[i + 1];
        long long len = e - b;
        const unsigned int *lst = f_flat + b;
        unsigned long long h = 1469598103934665603ull ^
                               (unsigned long long)len;
        for (long long j = 0; j < len; ++j) {
            h ^= lst[j];
            h *= 1099511628211ull;
        }
        h ^= h >> 33;
        unsigned long long s = h & hmask;
        long long off = -1;
        for (;;) {
            long long v = slot[s];
            if (v < 0) {
                slot[s] = v_index;
                break;
            }
            // verify against the emitted entry at offset v
            if ((long long)out_values[v] == len
                && memcmp(out_values + v + 1, lst,
                          (size_t)len * sizeof(unsigned int)) == 0) {
                off = v;
                break;
            }
            s = (s + 1) & hmask;
        }
        if (off >= 0) {
            v_off[i] = off;
        } else {
            v_off[i] = v_index;
            out_values[v_index] = (unsigned int)len;
            memcpy(out_values + v_index + 1, lst,
                   (size_t)len * sizeof(unsigned int));
            v_index += len + 1;
        }
    }
    return v_index;
}

} // extern "C"
