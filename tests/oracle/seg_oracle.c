/* Test oracle: drives the reference seqmenttree (seqmenttree.c, linked
 * from the locally built reference objects) on op streams so the claimed
 * -region bookkeeping of the chain scan can be validated exactly --
 * including the tree's approximation quirks (split boundary drop, node
 * aliasing during splits, subtree-discarding span adjustment).
 *
 * stdin (little endian):
 *   i32 n_ops
 *   per op: i32 kind (0 = grow, 1 = query, 2 = reset)
 *           u32 start, u32 end
 * stdout per op: i32 result (grow return / query return / 0)
 */
#include <stdio.h>
#include <stdlib.h>
#include "../../.ref_build/seqmenttree.h"

int main(void) {
    int n_ops;
    if (fread(&n_ops, 4, 1, stdin) != 1)
        return 1;
    SeqmentTree *t = initializeSeqmentTree(64);
    t->n = 0;
    for (int i = 0; i < n_ops; ++i) {
        int kind;
        unsigned s, e;
        if (fread(&kind, 4, 1, stdin) != 1 ||
            fread(&s, 4, 1, stdin) != 1 || fread(&e, 4, 1, stdin) != 1)
            return 1;
        int res = 0;
        if (kind == 0)
            res = growSeqmentTree(t, s, e);
        else if (kind == 1)
            res = (int)queSeqmentTree(t->root, s, e);
        else
            t->n = 0;
        fwrite(&res, 4, 1, stdout);
    }
    fflush(stdout);
    return 0;
}
