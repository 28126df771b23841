/* Suffix-array construction by induced sorting (SA-IS), int32 indices.
 *
 * Replaces the numpy prefix-doubling builder (index/build.py:103) for
 * genome-scale references: O(n) time, ~9n bytes working memory, handles
 * n up to 2^31-1 (a doubled 1 Gbp genome). The reference ships no index
 * builder (pidx.c loads `bwa index` artifacts), so this is our own
 * implementation of the standard SA-IS algorithm (Nong, Zhang & Chan,
 * "Linear Suffix Array Construction by Almost Pure Induced-Sorting") —
 * written from the algorithm, not from any existing code.
 *
 * Convention: the input string s[0..n-1] is over alphabet [0, K); a
 * virtual sentinel s[n] = -1 (smaller than everything) is implied. The
 * output sa[0..n-1] lists the suffixes of s in increasing order (the
 * sentinel suffix itself is NOT included, matching what index/build.py's
 * suffix_array returns).
 */

#include <stdint.h>
#include <stdlib.h>
#include <string.h>

#define GET(s, i) (elsize == 1 ? (int32_t)((const uint8_t *)(s))[i] \
                               : ((const int32_t *)(s))[i])

/* type array: 1 bit per position, 1 = S-type (suffix smaller than next) */
static inline int tget(const uint8_t *t, int32_t i) {
    return (t[i >> 3] >> (i & 7)) & 1;
}
static inline void tset(uint8_t *t, int32_t i, int v) {
    if (v) t[i >> 3] |= (uint8_t)(1u << (i & 7));
    else t[i >> 3] &= (uint8_t)~(1u << (i & 7));
}

static int is_lms(const uint8_t *t, int32_t i) {
    return i > 0 && tget(t, i) && !tget(t, i - 1);
}

static void bucket_sizes(const void *s, int elsize, int32_t n, int32_t K,
                         int32_t *C) {
    memset(C, 0, sizeof(int32_t) * (size_t)K);
    for (int32_t i = 0; i < n; i++) C[GET(s, i)]++;
}

static void bucket_heads(const int32_t *C, int32_t K, int32_t *B) {
    int32_t sum = 0;
    for (int32_t c = 0; c < K; c++) { B[c] = sum; sum += C[c]; }
}

static void bucket_tails(const int32_t *C, int32_t K, int32_t *B) {
    int32_t sum = 0;
    for (int32_t c = 0; c < K; c++) { sum += C[c]; B[c] = sum; }
}

/* induce L-type then S-type suffixes from the placed LMS/S entries.
 * sa holds -1 for empty slots. */
static void induce(const void *s, int elsize, int32_t n, int32_t K,
                   const uint8_t *t, int32_t *sa, int32_t *C, int32_t *B) {
    /* L: scan left to right; the sentinel's predecessor s[n-1] first */
    bucket_heads(C, K, B);
    if (n > 0 && !tget(t, n - 1))
        sa[B[GET(s, n - 1)]++] = n - 1;
    for (int32_t i = 0; i < n; i++) {
        int32_t j = sa[i];
        if (j > 0 && !tget(t, j - 1))
            sa[B[GET(s, j - 1)]++] = j - 1;
    }
    /* S: scan right to left */
    bucket_tails(C, K, B);
    for (int32_t i = n - 1; i >= 0; i--) {
        int32_t j = sa[i];
        if (j > 0 && tget(t, j - 1))
            sa[--B[GET(s, j - 1)]] = j - 1;
    }
}

static int sais_core(const void *s, int elsize, int32_t *sa, int32_t n,
                     int32_t K) {
    if (n == 0) return 0;
    if (n == 1) { sa[0] = 0; return 0; }

    uint8_t *t = calloc(((size_t)n >> 3) + 1, 1);
    int32_t *C = malloc(sizeof(int32_t) * (size_t)K);
    int32_t *B = malloc(sizeof(int32_t) * (size_t)K);
    if (!t || !C || !B) { free(t); free(C); free(B); return -1; }

    /* classify: position n-1 is L-type (greater than the sentinel) */
    tset(t, n - 1, 0);
    for (int32_t i = n - 2; i >= 0; i--) {
        int32_t a = GET(s, i), b = GET(s, i + 1);
        tset(t, i, a < b || (a == b && tget(t, i + 1)));
    }

    bucket_sizes(s, elsize, n, K, C);

    /* stage 1: sort LMS substrings by induction */
    for (int32_t i = 0; i < n; i++) sa[i] = -1;
    bucket_tails(C, K, B);
    for (int32_t i = 1; i < n; i++)
        if (is_lms(t, i)) sa[--B[GET(s, i)]] = i;
    induce(s, elsize, n, K, t, sa, C, B);

    /* compact the sorted LMS positions into the front of sa */
    int32_t nlms = 0;
    for (int32_t i = 0; i < n; i++)
        if (sa[i] > 0 && is_lms(t, sa[i])) sa[nlms++] = sa[i];

    /* name LMS substrings in sorted order (equal substrings get one name) */
    int32_t *names = sa + nlms; /* reuse the tail of sa as scratch */
    for (int32_t i = nlms; i < n; i++) sa[i] = -1;
    int32_t nname = 0, prev = -1;
    for (int32_t i = 0; i < nlms; i++) {
        int32_t pos = sa[i];
        int same = 0;
        if (prev >= 0) {
            /* compare LMS substrings at prev and pos (incl. end symbol) */
            int32_t a = prev, b = pos;
            same = 1;
            for (int32_t d = 0;; d++) {
                if (a + d >= n || b + d >= n) { same = 0; break; }
                int la = is_lms(t, a + d), lb = is_lms(t, b + d);
                if (la != lb || GET(s, a + d) != GET(s, b + d)) {
                    same = 0;
                    break;
                }
                if (d > 0 && la && lb)
                    break;  /* equal through the closing LMS char */
            }
        }
        if (!same) { nname++; prev = pos; }
        names[pos >> 1] = nname - 1;  /* LMS positions are >= 2 apart */
    }
    /* build the reduced string in LMS position order */
    int32_t *s1 = malloc(sizeof(int32_t) * (size_t)(nlms ? nlms : 1));
    if (!s1) { free(t); free(C); free(B); return -1; }
    {
        int32_t j = 0;
        for (int32_t i = 0; i < n; i++)
            if (is_lms(t, i)) s1[j++] = names[i >> 1];
    }

    if (nname < nlms) {
        /* recurse on the reduced problem */
        if (sais_core(s1, 4, sa, nlms, nname) != 0) {
            free(s1); free(t); free(C); free(B);
            return -1;
        }
    } else {
        for (int32_t i = 0; i < nlms; i++) sa[s1[i]] = i;
    }

    /* map reduced SA back to LMS positions (in text order list) */
    int32_t *lms = s1; /* reuse */
    {
        int32_t j = 0;
        for (int32_t i = 0; i < n; i++)
            if (is_lms(t, i)) lms[j++] = i;
    }
    /* stage 2: place LMS suffixes in their sorted order, then induce */
    int32_t *order = malloc(sizeof(int32_t) * (size_t)(nlms ? nlms : 1));
    if (!order) { free(s1); free(t); free(C); free(B); return -1; }
    for (int32_t i = 0; i < nlms; i++) order[i] = lms[sa[i]];
    for (int32_t i = 0; i < n; i++) sa[i] = -1;
    bucket_tails(C, K, B);
    for (int32_t i = nlms - 1; i >= 0; i--) {
        int32_t pos = order[i];
        sa[--B[GET(s, pos)]] = pos;
    }
    induce(s, elsize, n, K, t, sa, C, B);

    free(order);
    free(s1);
    free(t);
    free(C);
    free(B);
    return 0;
}

/* public entry: byte alphabet */
int mpibwa_sais_u8(const uint8_t *s, int32_t *sa, int64_t n, int32_t K) {
    if (n < 0 || n > 0x7FFFFFF0L) return -1;
    return sais_core(s, 1, sa, (int32_t)n, K);
}
