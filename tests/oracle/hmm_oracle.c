/* Test oracle for the reference save_kmers_HMM scanner (savekmers.c:3866),
 * linked against the locally built reference library.  Validates
 * kma_tpu.mapping.hmm_scan by emitting the print_ankers wire format for
 * each input read.
 *
 * argv: comp_b_path length_b_path minlen exhaustive mem_mode
 * stdin:
 *   i32 n_reads
 *   per read: i32 seqlen, i32 hlen, u8[seqlen] codes (0..4),
 *             byte[hlen] header (trailing NUL included)
 * stdout: print_ankers records (ankers.c:30-50) for every emitted anker,
 *   then i32 -1 terminator.
 */
#include <stdio.h>
#include <stdlib.h>
#include <string.h>
#include "../../.ref_build/ankers.h"
#include "../../.ref_build/compdna.h"
#include "../../.ref_build/hashmapkma.h"
#include "../../.ref_build/penalties.h"
#include "../../.ref_build/qseqs.h"
#include "../../.ref_build/savekmers.h"

int main(int argc, char **argv) {
    if (argc < 6) return 2;
    int minlen = atoi(argv[3]);
    int exhaustive = atoi(argv[4]);
    int mem_mode = atoi(argv[5]);

    FILE *tf = fopen(argv[1], "rb");
    if (!tf) return 3;
    HashMapKMA *templates = calloc(1, sizeof(HashMapKMA));
    hashMap_get = &hashMap_getGlobal;
    if (hashMapKMA_load(templates, tf, argv[1]) == 1) {
        fprintf(stderr, "bad DB\n");
        return 4;
    }
    fclose(tf);

    /* template lengths (.length.b) */
    FILE *lf = fopen(argv[2], "rb");
    if (!lf) return 5;
    int db_size;
    if (fread(&db_size, 4, 1, lf) != 1) return 5;
    int *template_lengths = malloc(db_size * sizeof(int));
    if (fread(template_lengths, sizeof(int), db_size, lf) != (size_t) db_size)
        return 5;
    fclose(lf);

    Penalties rewards;
    rewards.M = 1; rewards.MM = -2; rewards.U = -1; rewards.W1 = -3;
    rewards.Wl = -6; rewards.Mn = 0; rewards.PE = 7; rewards.d = 0;

    if (mem_mode) {
        ankerPtr = &ankerAndClean_MEM;
    }

    /* init call (kmers.c:174-175): minLen static + per-thread buffers */
    save_kmers_HMM(templates, 0, &(int){1}, template_lengths, 0, 0, 0, 0,
                   0, 0, minlen, 0, 0);

    int n1 = templates->DB_size;
    int *bestTemplates = calloc((n1 << 1) + 4, sizeof(int));
    int *bestTemplates_r = calloc((n1 << 1) + 4, sizeof(int));
    int *Score = calloc(n1, sizeof(int));
    int *Score_r = calloc(n1, sizeof(int));
    int *extendScore = calloc((n1 + 1) * sizeof(int) + n1 + 1, 1);
    *Score = 0;  /* thread slot 0 (savekmers.c uses *Score as index) */

    CompDNA qseq, qseq_r;
    allocComp(&qseq, 1 << 20);
    allocComp(&qseq_r, 1 << 20);
    Qseqs *header = setQseqs(1024);
    volatile int excludeOut = 0;

    int n_reads;
    if (fread(&n_reads, 4, 1, stdin) != 1) return 6;
    unsigned char *buf = malloc(1 << 20);
    for (int r = 0; r < n_reads; ++r) {
        int seqlen, hlen;
        if (fread(&seqlen, 4, 1, stdin) != 1) return 7;
        if (fread(&hlen, 4, 1, stdin) != 1) return 7;
        if (fread(buf, 1, seqlen, stdin) != (size_t) seqlen) return 7;
        if ((int) header->size <= hlen + 32) {
            header->seq = realloc(header->seq, hlen + 64);
            header->size = hlen + 64;
        }
        if (fread(header->seq, 1, hlen, stdin) != (size_t) hlen) return 7;
        header->len = hlen;
        resetComp(&qseq);
        resetComp(&qseq_r);
        compDNA(&qseq, buf, seqlen);
        save_kmers_HMM(templates, &rewards, bestTemplates, bestTemplates_r,
                       Score, Score_r, &qseq, &qseq_r, header, extendScore,
                       exhaustive, &excludeOut, stdout);
    }
    int term = -1;
    fwrite(&term, 4, 1, stdout);
    fflush(stdout);
    return 0;
}
