/* Oracle driver for golden-fixture generation.
 *
 * This is OUR test tool (no reference code in this file). It is compiled at
 * fixture-generation time against the reference engine sources located at
 * /root/reference/src (see build.sh) and dumps ground-truth values that the
 * mpibwa_tpu test suite compares against. It is never part of the shipped
 * framework.
 *
 * Modes:
 *   mem    <idx_prefix> <r1.fq> [r2.fq]   -- full alignment, SAM body to stdout
 *   smem   <idx_prefix> <r1.fq>           -- seeds from the 3-pass collector
 *   sa     <idx_prefix> <stride>          -- sampled bwt_sa values
 *   occ    <idx_prefix> <stride>          -- sampled bwt_occ4 values
 *   extend <idx_prefix> <problems.txt>    -- ksw_extend2 outputs
 *   global <idx_prefix> <problems.txt>    -- ksw_global2 score+cigar
 *   align  <idx_prefix> <problems.txt>    -- ksw_align2 (mate-rescue SW)
 *
 * Extra env vars for mem mode:
 *   ORACLE_BATCH  : process reads in batches of this many reads (default: all)
 *   ORACLE_NPROC_ACCUM : if set, accumulate n_processed across batches
 */
#include <stdio.h>
#include <stdlib.h>
#include <string.h>
#include <ctype.h>
#include <zlib.h>
#include "bwa.h"
#include "bwamem.h"
#include "bwt.h"
#include "bntseq.h"
#include "ksw.h"
#include "kvec.h"
#include "ksort.h"
#include "utils.h"

/* instantiate the same interval sort bwamem.c uses internally */
#define orc_intv_lt(a, b) ((a).info < (b).info)
KSORT_INIT(orc_intv, bwtintv_t, orc_intv_lt)

typedef struct { char *name, *comment, *seq, *qual; int l; } readrec_t;

/* FASTQ reader replicating the mpiBWA main parser behavior:
 * name = header token up to first space, with trailing "/<digit>" stripped. */
static readrec_t *read_fastq(const char *path, int *n_out) {
    FILE *f = fopen(path, "r");
    if (!f) { fprintf(stderr, "cannot open %s\n", path); exit(2); }
    size_t cap = 1 << 16, n = 0;
    readrec_t *v = malloc(cap * sizeof(readrec_t));
    char *line = 0; size_t lsz = 0; ssize_t ll;
    while ((ll = getline(&line, &lsz, f)) > 0) {
        while (ll > 0 && (line[ll-1] == '\n' || line[ll-1] == '\r')) line[--ll] = 0;
        if (ll == 0) continue;
        if (n == cap) { cap <<= 1; v = realloc(v, cap * sizeof(readrec_t)); }
        readrec_t *r = &v[n];
        if (line[0] != '@') { fprintf(stderr, "bad fastq header\n"); exit(2); }
        char *sp = line + 1; while (*sp && !isspace((unsigned char)*sp)) sp++;
        char *cmt = 0;
        if (*sp) { *sp = 0; cmt = sp + 1; }
        size_t nl = sp - (line + 1);
        if (nl >= 2 && line[1 + nl - 2] == '/' && isdigit((unsigned char)line[1 + nl - 1]))
            line[1 + nl - 2] = 0;
        r->name = strdup(line + 1);
        r->comment = cmt ? strdup(cmt) : 0;
        ll = getline(&line, &lsz, f);
        while (ll > 0 && (line[ll-1] == '\n' || line[ll-1] == '\r')) line[--ll] = 0;
        r->seq = strdup(line); r->l = (int)ll;
        getline(&line, &lsz, f); /* '+' line */
        ll = getline(&line, &lsz, f);
        while (ll > 0 && (line[ll-1] == '\n' || line[ll-1] == '\r')) line[--ll] = 0;
        r->qual = strdup(line);
        n++;
    }
    free(line); fclose(f);
    *n_out = (int)n;
    return v;
}

static void seq_to_nt4(const char *s, uint8_t *out, int l) {
    for (int i = 0; i < l; i++) out[i] = nst_nt4_table[(int)(unsigned char)s[i]];
}

static int run_mem(bwaidx_t *idx, mem_opt_t *opt, int argc, char **argv) {
    int n1 = 0, n2 = 0;
    readrec_t *r1 = read_fastq(argv[0], &n1), *r2 = 0;
    if (argc > 1) { r2 = read_fastq(argv[1], &n2); opt->flag |= MEM_F_PE;
        if (n1 != n2) { fprintf(stderr, "R1/R2 count mismatch\n"); exit(2); } }
    int n = r2 ? 2 * n1 : n1;
    int copy_comment = getenv("ORACLE_COMMENT") != 0; /* mpiBWA -C, default off */
    if (!copy_comment) {
        for (int i = 0; i < n1; i++) { r1[i].comment = 0; if (r2) r2[i].comment = 0; }
    }
    bseq1_t *seqs = calloc(n, sizeof(bseq1_t));
    for (int i = 0; i < n1; i++) {
        int j = r2 ? 2 * i : i;
        seqs[j].name = r1[i].name; seqs[j].comment = r1[i].comment;
        seqs[j].seq = r1[i].seq; seqs[j].qual = r1[i].qual; seqs[j].l_seq = r1[i].l;
        if (r2) {
            seqs[j+1].name = r2[i].name; seqs[j+1].comment = r2[i].comment;
            seqs[j+1].seq = r2[i].seq; seqs[j+1].qual = r2[i].qual; seqs[j+1].l_seq = r2[i].l;
        }
    }
    const char *bs = getenv("ORACLE_BATCH");
    int batch = bs ? atoi(bs) : n;
    if (r2 && batch % 2) batch++;
    long n_processed = 0;
    for (int off = 0; off < n; off += batch) {
        int cnt = off + batch <= n ? batch : n - off;
        mem_process_seqs(opt, idx->bwt, idx->bns, idx->pac,
                         getenv("ORACLE_NPROC_ACCUM") ? n_processed : 0,
                         cnt, seqs + off, 0);
        n_processed += cnt;
    }
    for (int i = 0; i < n; i++) { fputs(seqs[i].sam, stdout); }
    return 0;
}

/* replicate mem_collect_intv's 3 passes via the public bwt API */
static int run_smem(bwaidx_t *idx, mem_opt_t *opt, int argc, char **argv) {
    int n = 0;
    readrec_t *rr = read_fastq(argv[0], &n);
    bwtintv_v mem = {0,0,0}, mem1 = {0,0,0}, tv0 = {0,0,0}, tv1 = {0,0,0};
    bwtintv_v *tmpv[2] = { &tv0, &tv1 };
    for (int ri = 0; ri < n; ri++) {
        int len = rr[ri].l;
        uint8_t *q = malloc(len);
        seq_to_nt4(rr[ri].seq, q, len);
        mem.n = 0;
        int split_len = (int)(opt->min_seed_len * opt->split_factor + .499);
        int x = 0;
        while (x < len) {
            if (q[x] < 4) {
                x = bwt_smem1(idx->bwt, len, q, x, 1, &mem1, tmpv);
                for (size_t i = 0; i < mem1.n; i++) {
                    bwtintv_t *p = &mem1.a[i];
                    int slen = (uint32_t)p->info - (p->info >> 32);
                    if (slen >= opt->min_seed_len) kv_push(bwtintv_t, mem, *p);
                }
            } else ++x;
        }
        size_t old_n = mem.n;
        for (size_t k = 0; k < old_n; k++) {
            bwtintv_t *p = &mem.a[k];
            int start = p->info >> 32, end = (int32_t)p->info;
            if (end - start < split_len || p->x[2] > opt->split_width) continue;
            bwt_smem1(idx->bwt, len, q, (start + end) >> 1, p->x[2] + 1, &mem1, tmpv);
            for (size_t i = 0; i < mem1.n; i++)
                if ((uint32_t)mem1.a[i].info - (mem1.a[i].info >> 32) >= (uint32_t)opt->min_seed_len)
                    kv_push(bwtintv_t, mem, mem1.a[i]);
        }
        if (opt->max_mem_intv > 0) {
            x = 0;
            while (x < len) {
                if (q[x] < 4) {
                    bwtintv_t m;
                    x = bwt_seed_strategy1(idx->bwt, len, q, x, opt->min_seed_len, opt->max_mem_intv, &m);
                    if (m.x[2] > 0) kv_push(bwtintv_t, mem, m);
                } else ++x;
            }
        }
        ks_introsort(orc_intv, mem.n, mem.a);
        printf(">%s %d\n", rr[ri].name, (int)mem.n);
        for (size_t i = 0; i < mem.n; i++)
            printf("%llu %llu %llu %llu\n",
                   (unsigned long long)mem.a[i].x[0], (unsigned long long)mem.a[i].x[1],
                   (unsigned long long)mem.a[i].x[2], (unsigned long long)mem.a[i].info);
        free(q);
    }
    return 0;
}

/* fixmate over interleaved pairs: read SAM bodies from two files where
 * records of pair i are grouped; we reuse run_mem's in-memory seqs.
 * Mode: "fixmate <idx> <r1.fq> <r2.fq>" -- align PE then apply fixmate. */
#include "fixmate.h"
static int run_fixmate(bwaidx_t *idx, mem_opt_t *opt, int argc, char **argv) {
    int n1 = 0, n2 = 0;
    readrec_t *r1 = read_fastq(argv[0], &n1);
    readrec_t *r2 = read_fastq(argv[1], &n2);
    opt->flag |= MEM_F_PE;
    int n = 2 * n1;
    bseq1_t *seqs = calloc(n, sizeof(bseq1_t));
    for (int i = 0; i < n1; i++) {
        seqs[2*i].name = r1[i].name; seqs[2*i].seq = r1[i].seq;
        seqs[2*i].qual = r1[i].qual; seqs[2*i].l_seq = r1[i].l;
        seqs[2*i+1].name = r2[i].name; seqs[2*i+1].seq = r2[i].seq;
        seqs[2*i+1].qual = r2[i].qual; seqs[2*i+1].l_seq = r2[i].l;
    }
    mem_process_seqs(opt, idx->bwt, idx->bns, idx->pac, 0, n, seqs, 0);
    for (int i = 0; i < n1; i++) {
        int a = 0, b = 0;
        fixmate(0, &seqs[2*i], &seqs[2*i+1], &a, &b, idx);
    }
    for (int i = 0; i < n; i++) fputs(seqs[i].sam, stdout);
    return 0;
}

/* dump filtered chains + seeds per read */
typedef struct { int64_t rbeg; int32_t qbeg, len; int score; } orc_seed_t;
typedef struct {
    int n, m, first, rid;
    uint32_t w:29, kept:2, is_alt:1;
    float frac_rep;
    int64_t pos;
    orc_seed_t *seeds;
} orc_chain_t;
typedef struct { size_t n, m; orc_chain_t *a; } orc_chain_v;
orc_chain_v mem_chain(const mem_opt_t *opt, const bwt_t *bwt, const bntseq_t *bns,
                      int len, const uint8_t *seq, void *buf);
int mem_chain_flt(const mem_opt_t *opt, int n_chn, orc_chain_t *a);
void mem_flt_chained_seeds(const mem_opt_t *opt, const bntseq_t *bns, const uint8_t *pac,
                           int l_query, const uint8_t *query, int n_chn, orc_chain_t *a);
static int run_chains(bwaidx_t *idx, mem_opt_t *opt, const char *path) {
    int n = 0;
    readrec_t *rr = read_fastq(path, &n);
    for (int ri = 0; ri < n; ri++) {
        uint8_t *q = malloc(rr[ri].l);
        seq_to_nt4(rr[ri].seq, q, rr[ri].l);
        orc_chain_v chn = mem_chain(opt, idx->bwt, idx->bns, rr[ri].l, q, 0);
        chn.n = mem_chain_flt(opt, chn.n, chn.a);
        mem_flt_chained_seeds(opt, idx->bns, idx->pac, rr[ri].l, q, chn.n, chn.a);
        printf(">%s %d\n", rr[ri].name, (int)chn.n);
        for (size_t i = 0; i < chn.n; i++) {
            orc_chain_t *c = &chn.a[i];
            printf("C %lld %d %u %d %.6f %d\n", (long long)c->pos, c->rid, c->w,
                   c->kept, c->frac_rep, c->n);
            for (int j = 0; j < c->n; j++)
                printf("S %lld %d %d %d\n", (long long)c->seeds[j].rbeg,
                       c->seeds[j].qbeg, c->seeds[j].len, c->seeds[j].score);
            free(c->seeds);
        }
        free(chn.a); free(q);
    }
    return 0;
}

/* dump raw alignment regions per read (before mark_primary) */
mem_alnreg_v mem_align1_core(const mem_opt_t *opt, const bwt_t *bwt, const bntseq_t *bns,
                             const uint8_t *pac, int l_seq, char *seq, void *buf);
static int run_regs(bwaidx_t *idx, mem_opt_t *opt, const char *path) {
    int n = 0;
    readrec_t *rr = read_fastq(path, &n);
    for (int ri = 0; ri < n; ri++) {
        mem_alnreg_v a = mem_align1_core(opt, idx->bwt, idx->bns, idx->pac,
                                         rr[ri].l, rr[ri].seq, 0);
        printf(">%s %d\n", rr[ri].name, (int)a.n);
        for (size_t i = 0; i < a.n; i++) {
            mem_alnreg_t *p = &a.a[i];
            printf("%lld %lld %d %d %d %d %d %d %d %d %d %d %d %.6f\n",
                   (long long)p->rb, (long long)p->re, p->qb, p->qe, p->rid,
                   p->score, p->truesc, p->sub, p->csub, p->sub_n, p->w,
                   p->seedcov, p->seedlen0, p->frac_rep);
        }
        free(a.a);
    }
    return 0;
}

static int run_sa(bwaidx_t *idx, int stride) {
    for (bwtint_t k = 0; k <= idx->bwt->seq_len; k += stride)
        printf("%llu %llu\n", (unsigned long long)k, (unsigned long long)bwt_sa(idx->bwt, k));
    return 0;
}

static int run_occ(bwaidx_t *idx, int stride) {
    bwtint_t cnt[4];
    for (bwtint_t k = 0; k <= idx->bwt->seq_len; k += stride) {
        bwt_occ4(idx->bwt, k - 1, cnt); /* k-1 wraps to -1 for k=0: tests that path too */
        printf("%llu %llu %llu %llu %llu\n", (unsigned long long)k,
               (unsigned long long)cnt[0], (unsigned long long)cnt[1],
               (unsigned long long)cnt[2], (unsigned long long)cnt[3]);
    }
    return 0;
}

/* problems.txt lines: "<mode-params> <qseq> <tseq>" with seqs in ACGTN */
static int run_dp(bwaidx_t *idx, mem_opt_t *opt, const char *path, int mode) {
    (void)idx;
    FILE *f = fopen(path, "r");
    if (!f) { fprintf(stderr, "cannot open %s\n", path); exit(2); }
    char *line = 0; size_t lsz = 0;
    while (getline(&line, &lsz, f) > 0) {
        if (line[0] == '#' || line[0] == '\n') continue;
        char qs[4096], ts[4096];
        if (mode == 0) { /* extend: w end_bonus zdrop h0 qseq tseq */
            int w, eb, zd, h0;
            if (sscanf(line, "%d %d %d %d %4095s %4095s", &w, &eb, &zd, &h0, qs, ts) != 6) continue;
            int ql = strlen(qs), tl = strlen(ts);
            uint8_t *q = malloc(ql), *t = malloc(tl);
            seq_to_nt4(qs, q, ql); seq_to_nt4(ts, t, tl);
            int qle, tle, gtle, gscore, moff;
            int sc = ksw_extend2(ql, q, tl, t, 5, opt->mat, opt->o_del, opt->e_del,
                                 opt->o_ins, opt->e_ins, w, eb, zd, h0,
                                 &qle, &tle, &gtle, &gscore, &moff);
            printf("%d %d %d %d %d %d\n", sc, qle, tle, gtle, gscore, moff);
            free(q); free(t);
        } else if (mode == 1) { /* global: w qseq tseq */
            int w;
            if (sscanf(line, "%d %4095s %4095s", &w, qs, ts) != 3) continue;
            int ql = strlen(qs), tl = strlen(ts);
            uint8_t *q = malloc(ql), *t = malloc(tl);
            seq_to_nt4(qs, q, ql); seq_to_nt4(ts, t, tl);
            int n_cigar = 0; uint32_t *cigar = 0;
            int sc = ksw_global2(ql, q, tl, t, 5, opt->mat, opt->o_del, opt->e_del,
                                 opt->o_ins, opt->e_ins, w, &n_cigar, &cigar);
            printf("%d ", sc);
            for (int i = 0; i < n_cigar; i++)
                printf("%d%c", cigar[i] >> 4, "MIDSH"[cigar[i] & 0xf]);
            printf("\n");
            free(cigar); free(q); free(t);
        } else { /* align: xtra qseq tseq */
            int xtra;
            if (sscanf(line, "%d %4095s %4095s", &xtra, qs, ts) != 3) continue;
            int ql = strlen(qs), tl = strlen(ts);
            uint8_t *q = malloc(ql), *t = malloc(tl);
            seq_to_nt4(qs, q, ql); seq_to_nt4(ts, t, tl);
            kswr_t r = ksw_align2(ql, q, tl, t, 5, opt->mat, opt->o_del, opt->e_del,
                                  opt->o_ins, opt->e_ins, xtra, 0);
            printf("%d %d %d %d %d %d %d\n", r.score, r.te, r.qe, r.score2, r.te2, r.tb, r.qb);
            free(q); free(t);
        }
    }
    free(line); fclose(f);
    return 0;
}

int main(int argc, char **argv) {
    if (argc < 3) { fprintf(stderr, "usage: oracle <mode> <idx_prefix> ...\n"); return 2; }
    const char *mode = argv[1];
    mem_opt_t *opt = mem_opt_init();
    /* parse option overrides of the form k=v after the positional args */
    for (int i = 3; i < argc; i++) {
        if (strncmp(argv[i], "-T", 2) == 0) opt->T = atoi(argv[i] + 2);
        else if (strncmp(argv[i], "-t", 2) == 0) opt->n_threads = atoi(argv[i] + 2);
        else if (strncmp(argv[i], "-a", 2) == 0) opt->flag |= MEM_F_ALL;
        else if (strncmp(argv[i], "-Y", 2) == 0) opt->flag |= MEM_F_SOFTCLIP;
        else if (strncmp(argv[i], "-k", 2) == 0) opt->min_seed_len = atoi(argv[i] + 2);
        else if (strncmp(argv[i], "-L", 2) == 0) opt->pen_clip5 = opt->pen_clip3 = atoi(argv[i] + 2);
    }
    bwa_verbose = 1; /* silence info logs for clean stdout */
    bwaidx_t *idx = bwa_idx_load_from_disk(argv[2], BWA_IDX_ALL);
    if (!idx) { fprintf(stderr, "index load failed\n"); return 2; }
    /* positional (non-option) args only for the file-taking modes */
    char *pos[8]; int npos = 0;
    for (int i = 3; i < argc && npos < 8; i++)
        if (argv[i][0] != '-') pos[npos++] = argv[i];
    if (!strcmp(mode, "mem")) return run_mem(idx, opt, npos, pos);
    if (!strcmp(mode, "smem")) return run_smem(idx, opt, npos, pos);
    if (!strcmp(mode, "regs")) return run_regs(idx, opt, argv[3]);
    if (!strcmp(mode, "chains")) return run_chains(idx, opt, argv[3]);
    if (!strcmp(mode, "fixmate")) return run_fixmate(idx, opt, argc - 3, argv + 3);
    if (!strcmp(mode, "sa")) return run_sa(idx, atoi(argv[3]));
    if (!strcmp(mode, "occ")) return run_occ(idx, atoi(argv[3]));
    if (!strcmp(mode, "extend")) return run_dp(idx, opt, argv[3], 0);
    if (!strcmp(mode, "global")) return run_dp(idx, opt, argv[3], 1);
    if (!strcmp(mode, "align")) return run_dp(idx, opt, argv[3], 2);
    fprintf(stderr, "unknown mode %s\n", mode);
    return 2;
}
