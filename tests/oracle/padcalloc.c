/* Pad calloc/malloc by 64 zeroed bytes so the reference's off-by-one
 * contamination-slot reads (sparse.c:484, kmers.c:168) see zeros. */
#define _GNU_SOURCE
#include <stddef.h>
#include <string.h>
extern void *__libc_calloc(size_t, size_t);
extern void *__libc_malloc(size_t);
void *calloc(size_t n, size_t sz) {
    void *p = __libc_calloc(n + (64 / (sz ? sz : 1)) + 1, sz);
    return p;
}
void *malloc(size_t n) {
    void *p = __libc_malloc(n + 64);
    if (p) memset((char *)p + n, 0, 64);
    return p;
}
