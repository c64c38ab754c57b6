/* Test oracle: drives the reference NW/NW_band/NW_score/NW_band_score
 * (linked from the locally built reference library) on binary test cases
 * so kma_tpu.align.nw can be validated cell-exactly.
 *
 * stdin (little endian):
 *   i32 n_cases
 *   per case: i32 variant (0=NW,1=NW_band,2=NW_score,3=NW_band_score)
 *             i32 k, i32 t_s, i32 t_e, i32 q_s, i32 q_e, i32 band,
 *             i32 template_length, i32 q_total,
 *             i32 M, MM, U, W1, Mn, Ts, Tv,
 *             u8[template_length] template codes (0..4)
 *             u8[q_total] query codes (0..4)
 * stdout per case:
 *   i32[6] {score, pos, len, match, tGaps, qGaps}
 *   i32[2] {aligned_start, aligned_end}
 *   i32 aln_len, then aln_len bytes each of t, s, q (variant 0/1 only)
 */
#include <stdio.h>
#include <stdlib.h>
#include <string.h>
#include "../../.ref_build/nw.h"
#include "../../.ref_build/penalties.h"

static long unsigned *pack(const unsigned char *codes, int len) {
    int words = (len >> 5) + 1;
    long unsigned *seq = calloc(words ? words : 1, sizeof(long unsigned));
    for (int i = 0; i < len; ++i) {
        int c = codes[i] == 4 ? 0 : codes[i];
        seq[i >> 5] |= ((long unsigned) c) << (62 - ((i & 31) << 1));
    }
    return seq;
}

int main(void) {
    int n_cases;
    if (fread(&n_cases, 4, 1, stdin) != 1) return 1;
    Penalties rew;
    int *dd = malloc(5 * sizeof(int *) + 25 * sizeof(int));
    int **d = (int **) dd;
    d[0] = (int *) (d + 5);
    for (int i = 1; i < 5; ++i) d[i] = d[i - 1] + 5;

    NWmat mat;
    mat.NW_s = 1024 * 1024;
    mat.NW_q = 1024;
    mat.E = malloc(mat.NW_s);
    mat.D[0] = malloc((mat.NW_q << 1) * sizeof(int));
    mat.P[0] = malloc((mat.NW_q << 1) * sizeof(int));
    mat.D[1] = mat.D[0] + mat.NW_q;
    mat.P[1] = mat.P[0] + mat.NW_q;
    mat.rewards = &rew;

    for (int c = 0; c < n_cases; ++c) {
        int hdr[16];
        if (fread(hdr, 4, 16, stdin) != 16) return 1;
        int variant = hdr[0], k = hdr[1], t_s = hdr[2], t_e = hdr[3];
        int q_s = hdr[4], q_e = hdr[5], band = hdr[6], t_total = hdr[7];
        int q_total = hdr[8];
        rew.M = hdr[9]; rew.MM = hdr[10]; rew.U = hdr[11]; rew.W1 = hdr[12];
        rew.Mn = hdr[13];
        int Ts = hdr[14], Tv = hdr[15];
        for (int i = 0; i < 4; ++i) {
            for (int j = 0; j < 4; ++j) d[i][j] = Tv;
            d[i][4] = rew.Mn;
            d[i][(i - 2) < 0 ? (i + 2) : (i - 2)] = Ts;
            d[i][i] = rew.M;
        }
        for (int i = 0; i < 5; ++i) d[4][i] = rew.Mn;
        d[4][4] = 0;
        rew.d = d;

        unsigned char *t_codes = malloc(t_total ? t_total : 1);
        unsigned char *q_codes = malloc(q_total ? q_total : 1);
        fread(t_codes, 1, t_total, stdin);
        fread(q_codes, 1, q_total, stdin);
        long unsigned *tseq = pack(t_codes, t_total);

        Aln aligned;
        aligned.t = malloc((q_total + t_total + 2) << 1);
        aligned.s = malloc((q_total + t_total + 2) << 1);
        aligned.q = malloc((q_total + t_total + 2) << 1);
        aligned.pos = t_total;
        aligned.start = 0;
        aligned.end = 0;

        AlnScore st;
        memset(&st, 0, sizeof(st));
        if (variant == 0) {
            st = NW(tseq, q_codes, k, t_s, t_e, q_s, q_e, &aligned, &mat, t_total);
        } else if (variant == 1) {
            st = NW_band(tseq, q_codes, k, t_s, t_e, q_s, q_e, &aligned, band, &mat, t_total);
        } else if (variant == 2) {
            st = NW_score(tseq, q_codes, k, t_s, t_e, q_s, q_e, &mat, t_total);
        } else {
            st = NW_band_score(tseq, q_codes, k, t_s, t_e, q_s, q_e, band, &mat, t_total);
        }
        int out[6] = {st.score, st.pos, st.len, st.match, st.tGaps, st.qGaps};
        fwrite(out, 4, 6, stdout);
        int se[2] = {aligned.start, aligned.end};
        fwrite(se, 4, 2, stdout);
        if (variant <= 1) {
            int alen = st.len;
            fwrite(&alen, 4, 1, stdout);
            fwrite(aligned.t, 1, alen, stdout);
            fwrite(aligned.s, 1, alen, stdout);
            fwrite(aligned.q, 1, alen, stdout);
        } else {
            int alen = 0;
            fwrite(&alen, 4, 1, stdout);
        }
        free(t_codes); free(q_codes); free(tseq);
        free(aligned.t); free(aligned.s); free(aligned.q);
    }
    fflush(stdout);
    return 0;
}
