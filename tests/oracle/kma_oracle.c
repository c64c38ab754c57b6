/* Test oracle for the reference KMA()/KMA_score/anker_rc_comp/chainSeeds
 * drivers (align.c, chain.c), linked against the locally built reference
 * library.  Validates kma_tpu.align.kma_aln.
 *
 * stdin:
 *   i32 n_cases
 *   per case:
 *     i32 mode (0=KMA_score, 1=KMA, 2=anker_rc_comp)
 *     i32 t_len, i32 q_len, i32 q_start, i32 q_end, i32 kmersize,
 *     i32 mq, i32 one2one, i32 nN
 *     u8[t_len] template codes (0..3)
 *     u8[q_len] query codes (0..4)
 *     i32[nN] N positions
 * stdout per case:
 *   mode 0/1: i32[7] {score,pos,len,match,tGaps,qGaps,mapQ}
 *             + mode 1: i32[2]{start,end}, i32 aln_len, t/s/q bytes
 *   mode 2:   i32 rc_result, i32 n_points,
 *             then i32[5*n_points] {qs,qe,ts,te,w}
 */
#include <fcntl.h>
#include <stdio.h>
#include <stdlib.h>
#include <string.h>
#include <unistd.h>
#include "../../.ref_build/align.h"
#include "../../.ref_build/chain.h"
#include "../../.ref_build/compdna.h"
#include "../../.ref_build/hashmapcci.h"
#include "../../.ref_build/nw.h"
#include "../../.ref_build/penalties.h"

int main(void) {
    int n_cases;
    if (fread(&n_cases, 4, 1, stdin) != 1) return 1;

    Penalties rew;
    rew.M = 1; rew.MM = -2; rew.U = -1; rew.W1 = -3; rew.Wl = -6; rew.Mn = 0;
    rew.PE = 7;
    int *dd = malloc(5 * sizeof(int *) + 25 * sizeof(int));
    int **d = (int **) dd;
    d[0] = (int *) (d + 5);
    for (int i = 1; i < 5; ++i) d[i] = d[i - 1] + 5;
    int Ts = -2, Tv = -2;
    rew.MM = (Ts + Tv - 1) / 2;
    for (int i = 0; i < 4; ++i) {
        for (int j = 0; j < 4; ++j) d[i][j] = Tv;
        d[i][4] = rew.Mn;
        d[i][(i - 2) < 0 ? (i + 2) : (i - 2)] = Ts;
        d[i][i] = rew.M;
    }
    for (int i = 0; i < 5; ++i) d[4][i] = rew.Mn;
    d[4][4] = 0;
    rew.d = d;

    NWmat mat;
    mat.NW_s = 1024 * 1024;
    mat.NW_q = 1024;
    mat.E = malloc(mat.NW_s);
    mat.D[0] = malloc((mat.NW_q << 1) * sizeof(int));
    mat.P[0] = malloc((mat.NW_q << 1) * sizeof(int));
    mat.D[1] = mat.D[0] + mat.NW_q;
    mat.P[1] = mat.P[0] + mat.NW_q;
    mat.rewards = &rew;

    AlnPoints *points = seedPoint_init(1024, &rew);

    /* one-time static inits as in kma_main (kma.c:1249, 1428-1429) */
    int one2one_init = 1;
    preseed(0, 0, 0);
    anker_rc(0, 0, one2one_init, 0, 0, 0);
    anker_rc_comp(0, 0, (unsigned char *)(&one2one_init), 0, 0, 0, 0, 0);

    for (int c = 0; c < n_cases; ++c) {
        int hdr[9];
        if (fread(hdr, 4, 9, stdin) != 9) return 1;
        int mode = hdr[0], t_len = hdr[1], q_len = hdr[2];
        int q_start = hdr[3], q_end = hdr[4], kmersize = hdr[5];
        int mq = hdr[6], one2one = hdr[7], nN = hdr[8];

        unsigned char *t_codes = malloc(t_len);
        unsigned char *q_codes = malloc(q_len + 1);
        int *npos = malloc((nN + 2) * sizeof(int));
        fread(t_codes, 1, t_len, stdin);
        fread(q_codes, 1, q_len, stdin);
        fread(npos, 4, nN, stdin);
        q_codes[q_len] = 0;

        /* write template seq 2-bit to a temp file and build the CCI */
        CompDNA tcomp;
        allocComp(&tcomp, t_len + 32);
        compDNA(&tcomp, t_codes, t_len);
        char tmpl[] = "/tmp/kma_oracle_XXXXXX";
        int fd = mkstemp(tmpl);
        write(fd, tcomp.seq, ((t_len >> 5) + 1) * sizeof(long unsigned));
        lseek(fd, 0, SEEK_SET);
        HashMapCCI *tindex = alignLoad_fly(0, fd, t_len, kmersize, 0);
        close(fd);
        unlink(tmpl);

        /* query CompDNA */
        CompDNA qcomp, qcomp_r;
        allocComp(&qcomp, q_len + 32);
        allocComp(&qcomp_r, q_len + 32);
        compDNA(&qcomp, q_codes, q_len);
        /* re-add Ns recorded by compDNA (codes==4) */

        points->len = 0;
        if (mode == 0) {
            qcomp.N[0]++;
            qcomp.N[qcomp.N[0]] = q_len;
            AlnScore st = KMA_score(tindex, q_codes, q_len, q_start, q_end,
                                    &qcomp, mq, 0.5, points, &mat);
            int out[7] = {st.score, st.pos, st.len, st.match, st.tGaps,
                          st.qGaps, 0};
            fwrite(out, 4, 7, stdout);
        } else if (mode == 1) {
            Aln aligned, frag;
            aligned.t = malloc((q_len + t_len + 2) << 1);
            aligned.s = malloc((q_len + t_len + 2) << 1);
            aligned.q = malloc((q_len + t_len + 2) << 1);
            frag.t = malloc((q_len + t_len + 2) << 1);
            frag.s = malloc((q_len + t_len + 2) << 1);
            frag.q = malloc((q_len + t_len + 2) << 1);
            frag.pos = 0;
            AlnScore st = KMA(tindex, q_codes, q_len, q_start, q_end,
                              &aligned, &frag, 0, t_len, mq, 0.5, points,
                              &mat);
            int out[7] = {st.score, st.pos, st.len, st.match, st.tGaps,
                          st.qGaps, (int) aligned.mapQ};
            fwrite(out, 4, 7, stdout);
            int se[2] = {aligned.start, aligned.end};
            fwrite(se, 4, 2, stdout);
            int alen = st.len;
            if (alen < 0) alen = 0;
            fwrite(&alen, 4, 1, stdout);
            fwrite(aligned.t, 1, alen, stdout);
            fwrite(aligned.s, 1, alen, stdout);
            fwrite(aligned.q, 1, alen, stdout);
            free(aligned.t); free(aligned.s); free(aligned.q);
            free(frag.t); free(frag.s); free(frag.q);
        } else if (mode == 2) {
            rc_comp(&qcomp, &qcomp_r);
            unsigned char *q_r = malloc(q_len + 1);
            unCompDNA(&qcomp_r, q_r);
            /* sentinel append as in alnFragsSE (alnfrags.c:1067-1072) */
            qcomp_r.N[0]++;
            qcomp_r.N[qcomp_r.N[0]] = q_len;
            qcomp.N[0]++;
            qcomp.N[qcomp.N[0]] = q_len;
            int rc = anker_rc_comp(tindex, q_codes, q_r, &qcomp, &qcomp_r,
                                   q_start, q_end, points);
            fwrite(&rc, 4, 1, stdout);
            fwrite(&points->len, 4, 1, stdout);
            for (int i = 0; i < points->len; ++i) {
                int row[5] = {points->qStart[i], points->qEnd[i],
                              points->tStart[i], points->tEnd[i],
                              points->weight[i]};
                fwrite(row, 4, 5, stdout);
            }
            free(q_r);
        } else {
            /* mode 3: the alnFragsSE arc flow (alnfrags.c:1104-1127):
             * anker_rc_comp seeds points, KMA_score consumes them on the
             * winning strand.  Tests the PRELOADED-points score path. */
            rc_comp(&qcomp, &qcomp_r);
            unsigned char *q_r = malloc(q_len + 1);
            unCompDNA(&qcomp_r, q_r);
            qcomp_r.N[0]++;
            qcomp_r.N[qcomp_r.N[0]] = q_len;
            qcomp.N[0]++;
            qcomp.N[qcomp.N[0]] = q_len;
            int rc = anker_rc_comp(tindex, q_codes, q_r, &qcomp, &qcomp_r,
                                   q_start, q_end, points);
            AlnScore st;
            if (rc < 0) {
                st = KMA_score(tindex, q_r, q_len, q_len - q_end,
                               q_len - q_start, &qcomp_r, mq, 0.5, points,
                               &mat);
            } else if (rc) {
                st = KMA_score(tindex, q_codes, q_len, q_start, q_end,
                               &qcomp, mq, 0.5, points, &mat);
            } else {
                memset(&st, 0, sizeof(st));
                points->len = 0;
            }
            fwrite(&rc, 4, 1, stdout);
            int out[7] = {st.score, st.pos, st.len, st.match, st.tGaps,
                          st.qGaps, 0};
            fwrite(out, 4, 7, stdout);
            free(q_r);
        }
        hashMapCCI_destroy(tindex);
        freeComp(&tcomp);
        freeComp(&qcomp);
        freeComp(&qcomp_r);
        free(t_codes); free(q_codes); free(npos);
    }
    fflush(stdout);
    return 0;
}
