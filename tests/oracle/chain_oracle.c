/* Test oracle for the reference save_kmers_chain (savekmers.c:5127-5944),
 * linked against the locally built reference library.  Validates the
 * kma_tpu chain scanner (mapping/chain_scan.py, native/kma_chain.cpp) on
 * reads with N positions / edge segment layouts.
 *
 * argv: db_prefix coverT mrs minlen exhaustive
 * stdin:
 *   i32 n_reads
 *   per read: i32 seqlen, u8[seqlen] codes (0..4; 4 = N)
 * stdout: the raw anker byte stream print_ankers writes (ankers.c:30-50),
 *   terminated by the -(readCount+1) sentinel the caller decodes.
 */
#include <stdio.h>
#include <stdlib.h>
#include <string.h>
#include "../../.ref_build/ankers.h"
#include "../../.ref_build/compdna.h"
#include "../../.ref_build/hashmapkma.h"
#include "../../.ref_build/kmers.h"
#include "../../.ref_build/penalties.h"
#include "../../.ref_build/pherror.h"
#include "../../.ref_build/qseqs.h"
#include "../../.ref_build/savekmers.h"
#include "../../.ref_build/kmeranker.h"
#include "../../.ref_build/stdnuc.h"

int main(int argc, char **argv) {
    if (argc < 6) return 2;
    char *prefix = argv[1];
    double coverT = atof(argv[2]);
    double mrs = atof(argv[3]);
    int minlen = atoi(argv[4]);
    int exhaustive = atoi(argv[5]);

    /* penalties as kma.c:328-337, 1307-1328 */
    Penalties rew;
    rew.M = 1; rew.MM = -2; rew.U = -1; rew.W1 = -3; rew.Wl = -6;
    rew.Mn = 0; rew.PE = 7;

    /* load the DB (kmers.c:84-93) */
    char fname[4096];
    snprintf(fname, sizeof(fname), "%s.comp.b", prefix);
    FILE *tf = sfopen(fname, "rb");
    HashMapKMA *templates = smalloc(sizeof(HashMapKMA));
    if (hashMapKMA_load(templates, tf, fname) == 1) {
        fprintf(stderr, "Wrong format of DB.\n");
        return 1;
    }
    fclose(tf);
    setCmerPointers(templates->flag);

    /* lengths (kmers.c:154-172) */
    snprintf(fname, sizeof(fname), "%s.length.b", prefix);
    tf = sfopen(fname, "rb");
    int db_size;
    sfread(&db_size, sizeof(int), 1, tf);
    int *template_lengths = smalloc(db_size * sizeof(int));
    sfread(template_lengths, sizeof(int), db_size, tf);
    fclose(tf);

    /* statics init (kmers.c:177, kma.c:1252) */
    int thread_num = 1;
    save_kmers_chain(0, 0, &thread_num, (int *)(&coverT), (int *)(&mrs),
                     template_lengths, 0, 0, 0, 0, minlen, 0, 0);
    double minFrac = 1.0;
    chooseChain(0, 0, 0, 0, (int *)(&coverT), (int *)(&minFrac));

    int n_reads;
    if (fread(&n_reads, 4, 1, stdin) != 1) return 1;
    int *bestTemplates = calloc((templates->DB_size << 1) + 4, sizeof(int));
    int *bestTemplates_r = calloc((templates->DB_size << 1) + 4, sizeof(int));
    int *Score = calloc(templates->DB_size + 1, sizeof(int));
    int *Score_r = calloc(templates->DB_size + 1, sizeof(int));
    int *extendScore = calloc(templates->DB_size + 1, sizeof(int));
    /* include array rides behind extendScore like kmers.c:219 */
    char *include = calloc(templates->DB_size + 1, 1);
    (void)include;
    volatile int excludeOut = 0;
    Qseqs *header = setQseqs(64);
    memcpy(header->seq, "x", 2);
    header->len = 2;
    CompDNA *qseq = smalloc(sizeof(CompDNA));
    CompDNA *qseq_r = smalloc(sizeof(CompDNA));
    allocComp(qseq, 1 << 20);
    allocComp(qseq_r, 1 << 20);

    for (int r = 0; r < n_reads; ++r) {
        int seqlen;
        if (fread(&seqlen, 4, 1, stdin) != 1) return 1;
        unsigned char *codes = smalloc(seqlen);
        if ((int)fread(codes, 1, seqlen, stdin) != seqlen) return 1;
        resetComp(qseq);
        resetComp(qseq_r);
        /* compDNA adds 2-bit codes; N recorded via qseq->N (compdna.c:99) */
        qseq->seqlen = seqlen;
        qseq->complen = (seqlen >> 5) + 1;
        memset(qseq->seq, 0, qseq->complen * sizeof(long unsigned));
        qseq->N[0] = 0;
        for (int i = 0; i < seqlen; ++i) {
            int c = codes[i] > 3 ? 4 : codes[i];
            if (c == 4) {
                qseq->N[0]++;
                qseq->N[qseq->N[0]] = i;
                c = 0;
            }
            qseq->seq[i >> 5] |= ((long unsigned)(c & 3))
                                 << (62 - ((i & 31) << 1));
        }
        rc_comp(qseq, qseq_r);
        header->len = 2;
        memcpy(header->seq, "x", 2);
        save_kmers_chain(templates, &rew, bestTemplates, bestTemplates_r,
                         Score, Score_r, qseq, qseq_r, header, extendScore,
                         exhaustive, &excludeOut, stdout);
        free(codes);
    }
    fflush(stdout);
    return 0;
}
