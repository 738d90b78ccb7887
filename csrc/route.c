/* Beneš/Hall 3-stage permutation routing for the MXU one-hot gather.
 *
 * Role in the framework: the direct one-hot gather (ops/gather.py) that
 * feeds the host-sorted Pippenger MSM costs 4R*n*n bf16 MACs per window —
 * quadratic in n, and the dominant cost at n >= 2^16.  Writing the n
 * positions as an (r x c) matrix (n = r*c), Hall's theorem gives every
 * permutation a 3-stage factorization
 *
 *     within-rows  o  within-columns  o  within-rows
 *
 * so the gather becomes three batched one-hot gathers with contraction
 * widths c, r, c — ~85x fewer MACs at n = 2^16 and ~340x at 2^20.
 *
 * The routing itself: build the bipartite multigraph with an edge
 * (source row -> destination row) per element; it is c-regular, so it
 * splits into c perfect matchings (Koenig).  color(e) = matching index,
 * computed by recursive Euler splitting: walk Euler circuits assigning
 * alternate edges to the two halves (even circuits, since the graph is
 * bipartite), halving the regular degree per level — O(n log c) total.
 * Element e then routes (row_s, col_s) -> (row_s, color) -> (row_d, color)
 * -> (row_d, col_d), each hop inside one row/column.
 *
 * Implementation notes (the solve sits on the stream-MSM critical path —
 * it paces chunk dispatches on the 2-core bench host):
 *   * The circuit walk is a pointer chase: 1-2 random cache accesses per
 *     edge visit at DRAM-class latency, so a single walk runs at ~75 ns/
 *     visit regardless of ALU speed.  The only cure is memory-level
 *     parallelism: ILV walkers run in LOCKSTEP from one thread, keeping
 *     4-8 misses outstanding.  Early levels have fewer frames than
 *     walkers (level 0 has ONE), so walkers MULTI-START inside a frame:
 *     each walks an arc of an Euler circuit from a spread-out position
 *     and stamps edges with a per-arc SEGMENT id.  Alternating parity is
 *     then only consistent per segment; a streaming scan over the CSR
 *     position pairs derives one XOR constraint between segments per
 *     node adjacency they share, and a tiny parity union-find per frame
 *     resolves all segment flips before the partition pass.  (Flipping a whole
 *     circuit's colors is always valid — alternation is preserved — so
 *     roots are free and any consistent assignment works.)
 *   * Each circuit step is ONE fused load: u64 eid|twin for big groups,
 *     u32 for groups with m <= 32768 (halved cache traffic where 3/4 of
 *     the visits happen).
 *   * The per-level stable partition ping-pongs between two (grp, uv)
 *     buffer pairs instead of memcpy-ing back; frame regions are disjoint
 *     [off, off+m) slices of per-window arrays, so all frames of a level
 *     coexist.
 *
 * Exposed as decompose(r, c, src) -> (idx1, idx2, idx3) int32 gather
 * tables; see ops/route.py for the exact gather semantics and a pure-
 * Python twin used for tests and as fallback.
 */
#define PY_SSIZE_T_CLEAN
#include <Python.h>
#include <stdint.h>
#include <stdlib.h>
#include <string.h>
#if defined(__AVX512F__) && defined(__AVX512BW__) && defined(__AVX512VL__)
#include <immintrin.h>
#define ROUTE_AVX512 1
#endif

#include <time.h>
static double rt_prof[4]; /* build, walk, scan, part */
static int rt_prof_on = -1;
static double rt_now(void) {
    struct timespec ts;
    clock_gettime(CLOCK_MONOTONIC, &ts);
    return ts.tv_sec + 1e-9 * ts.tv_nsec;
}
#define ILV 8 /* interleaved circuit walkers per thread */
#define SEGCAP 16384 /* segment ids per frame: ub = used|parity|seg<<2 in
                        u16.  Adversarial inputs with >16k circuits in one
                        frame poison the frame, which is then re-walked
                        serially (classic single-walker, parity only). */

typedef struct { /* per-window state */
    int32_t *row_s, *col_s, *color;
    int32_t *grp[2]; /* ping-pong: original edge id per group slot */
    int32_t *uv[2];  /* ping-pong: row_s | (row_d << 16) per slot */
    uint16_t *ub;    /* bit1 = used, bit0 = parity, bits 2.. = segment */
    int32_t *firstpos;
    uint64_t *pair64; /* 2 half-edge slots per edge; frames use the
                         disjoint region [2*off, 2*(off+m)) (u64 view) or
                         [4*off, 4*off + 2m) (u32 view, small frames) */
} wwin;

typedef struct {
    int32_t win, off, m, base;
    int32_t segc;  /* segments allocated in this frame */
    int32_t mixed; /* >1 arcs touched one circuit: run the pair scan */
    int32_t poison; /* segment budget blown: re-walk the frame serially */
} bframe;

typedef struct {
    int alive, narrow;
    uint64_t *P64;
    uint32_t *P32;
    uint16_t *ub;
    int32_t *firstpos;
    int32_t m, i0;
    uint32_t p;
    uint8_t parity;
    uint16_t seg;
    int32_t seglen;
    bframe *fr;
} walker;

/* Build one frame's CSR twin-chain arrays (sequential, streaming).
 * start/cur are shared scratch of 2r+1 / 2r int32. */
static void frame_build(wwin *W, const bframe *f, int32_t r, int buf,
                        int32_t *start, int32_t *cur) {
    const int32_t *uv = W->uv[buf] + f->off;
    const int32_t m = f->m;
    const int32_t nn = 2 * r;
    uint16_t *ub = W->ub + f->off;
    int32_t *fp = W->firstpos + f->off;
    memset(start, 0, (size_t)(nn + 1) * sizeof(int32_t));
    for (int32_t i = 0; i < m; i++) {
        int32_t p = uv[i];
        start[(p & 0xFFFF) + 1]++;
        start[r + (p >> 16) + 1]++;
    }
    for (int32_t i = 0; i < nn; i++) start[i + 1] += start[i];
    memcpy(cur, start, (size_t)nn * sizeof(int32_t));
    if (m <= 32768) { /* u32 fused pairs: position and eid fit 16 bits */
        uint32_t *P = (uint32_t *)W->pair64 + 4 * (size_t)f->off;
        for (int32_t i = 0; i < m; i++) {
            int32_t p = uv[i];
            int32_t u = p & 0xFFFF;
            int32_t v = r + (p >> 16);
            int32_t pu = cur[u]++, pv = cur[v]++;
            P[pu] = (uint32_t)i | ((uint32_t)pv << 16);
            P[pv] = (uint32_t)i | ((uint32_t)pu << 16);
            fp[i] = pu;
            ub[i] = 0;
        }
    } else {
        uint64_t *P = W->pair64 + 2 * (size_t)f->off;
        for (int32_t i = 0; i < m; i++) {
            int32_t p = uv[i];
            int32_t u = p & 0xFFFF;
            int32_t v = r + (p >> 16);
            int32_t pu = cur[u]++, pv = cur[v]++;
            P[pu] = (uint64_t)(uint32_t)i | ((uint64_t)(uint32_t)pv << 32);
            P[pv] = (uint64_t)(uint32_t)i | ((uint64_t)(uint32_t)pu << 32);
            fp[i] = pu;
            ub[i] = 0;
        }
    }
}

static inline int alloc_seg(walker *wk) {
    bframe *f = wk->fr;
    if (f->segc >= SEGCAP) {
        f->poison = 1;
        return -1;
    }
    wk->seg = (uint16_t)f->segc++;
    wk->seglen = 0;
    return 0;
}

/* Bind walker t of K to a frame; spread starts give independent arcs of
 * the (few, large) early-level circuits.  The t = 0 walker's restart scan
 * covers [0, m), so its death certifies the frame fully walked. */
static void walker_bind(walker *wk, wwin *W, bframe *f, int t, int K) {
    wk->narrow = f->m <= 32768;
    wk->P64 = W->pair64 + 2 * (size_t)f->off;
    wk->P32 = (uint32_t *)W->pair64 + 4 * (size_t)f->off;
    wk->ub = W->ub + f->off;
    wk->firstpos = W->firstpos + f->off;
    wk->m = f->m;
    wk->fr = f;
    wk->alive = f->m > 0 && !f->poison;
    if (!wk->alive) return;
    int32_t i = (int32_t)(((int64_t)t * f->m) / K);
    while (i < wk->m && (wk->ub[i] & 2)) i++;
    wk->i0 = i;
    if (i >= wk->m || alloc_seg(wk) != 0) {
        wk->alive = 0;
        return;
    }
    wk->p = (uint32_t)wk->firstpos[i];
    wk->parity = 0;
}

/* One circuit step: inspect the current half-edge.  Unused: stamp it
 * (used | parity | seg) and leave through its twin's pair partner (^1:
 * node half-edge lists start even — every degree is even at every level —
 * so consecutive position pairs stay in one node).  Used (another arc got
 * here first, or our own arc closed): flag the frame as mixed — segment
 * flip constraints are derived later by the CSR pair scan, which sees
 * EVERY node adjacency (a join-time constraint would miss pairs whose two
 * edges were both crossed from mirror-orientation arcs) — and restart
 * from the next unused edge. */
static inline void walker_step(walker *wk) {
    uint32_t e, tw;
    if (wk->narrow) {
        uint32_t pe = wk->P32[wk->p];
        e = pe & 0xFFFF;
        tw = pe >> 16;
    } else {
        uint64_t pe = wk->P64[wk->p];
        e = (uint32_t)pe;
        tw = (uint32_t)(pe >> 32);
    }
    uint16_t u = wk->ub[e];
    if (u & 2) {
        if (wk->seglen > 0) wk->fr->mixed = 1; /* arcs met: pair scan */
        int32_t i = wk->i0;
        const int32_t m = wk->m;
        while (i < m && (wk->ub[i] & 2)) i++;
        wk->i0 = i;
        if (i >= m || wk->fr->poison ||
            (wk->seglen > 0 && alloc_seg(wk) != 0)) {
            wk->alive = 0;
            return;
        }
        wk->p = (uint32_t)wk->firstpos[i];
        wk->parity = 0;
        return; /* next call crosses the fresh edge */
    }
    wk->ub[e] = (uint16_t)(2u | wk->parity | ((uint32_t)wk->seg << 2));
    wk->seglen++;
    wk->parity ^= 1;
    wk->p = tw ^ 1;
}

/* Serial classic walk (parity only, seg 0) for poisoned frames: complete
 * circuits walked start-to-close need no flip constraints. */
static void classic_walk(wwin *W, const bframe *f) {
    uint16_t *ub = W->ub + f->off;
    const int32_t *fp = W->firstpos + f->off;
    const int32_t m = f->m;
    memset(ub, 0, (size_t)m * sizeof(uint16_t));
    int narrow = m <= 32768;
    const uint32_t *P32 = (uint32_t *)W->pair64 + 4 * (size_t)f->off;
    const uint64_t *P64 = W->pair64 + 2 * (size_t)f->off;
    int32_t i0 = 0;
    while (i0 < m) {
        uint32_t p0 = (uint32_t)fp[i0], p = p0;
        uint8_t parity = 0;
        do {
            uint32_t e, tw;
            if (narrow) {
                uint32_t pe = P32[p];
                e = pe & 0xFFFF;
                tw = pe >> 16;
            } else {
                uint64_t pe = P64[p];
                e = (uint32_t)pe;
                tw = (uint32_t)(pe >> 32);
            }
            ub[e] = (uint16_t)(2u | parity);
            parity ^= 1;
            p = tw ^ 1;
        } while (p != p0);
        while (i0 < m && (ub[i0] & 2)) i0++;
    }
}

/* Weighted (parity-carrying) union-find over one frame's segments. */
static int32_t uf_find(int32_t *par, uint8_t *rel, int32_t x,
                       uint8_t *rout) {
    int32_t r = x;
    uint8_t acc = 0;
    while (par[r] != r) {
        acc ^= rel[r];
        r = par[r];
    }
    int32_t cur = x;
    uint8_t a = 0;
    while (par[cur] != cur) {
        int32_t nxt = par[cur];
        uint8_t rc = rel[cur];
        par[cur] = r;
        rel[cur] = (uint8_t)(acc ^ a);
        a ^= rc;
        cur = nxt;
    }
    *rout = acc;
    return r;
}

/* Color all windows' edges with c colors (distinct within every source
 * row and every dest row), walking up to ILV arcs in lockstep. */
static int color_edges_batch(wwin *wins, int nw, int32_t n, int32_t r,
                             int32_t c, int32_t cshift) {
    for (int w = 0; w < nw; w++) {
        wwin *W = &wins[w];
        for (int32_t e = 0; e < n; e++) {
            W->grp[0][e] = e;
            W->uv[0][e] = W->row_s[e] | ((e >> cshift) << 16);
        }
        if (c == 1) memset(W->color, 0, (size_t)n * sizeof(int32_t));
    }
    if (c == 1) return 0;

    int levels = 0;
    for (int32_t k = c; k > 1; k >>= 1) levels++;
    size_t maxframes = (size_t)nw * (size_t)(c > 1 ? c : 1);
    bframe *cur_f = malloc(maxframes * sizeof(bframe));
    bframe *next_f = malloc(maxframes * sizeof(bframe));
    int32_t *start = malloc((size_t)(2 * r + 1) * sizeof(int32_t));
    int32_t *curs = malloc((size_t)(2 * r) * sizeof(int32_t));
    int32_t *uf_par = malloc((size_t)SEGCAP * sizeof(int32_t));
    uint8_t *uf_rel = malloc((size_t)SEGCAP);
    uint8_t *flip = malloc((size_t)SEGCAP);
    if (!cur_f || !next_f || !start || !curs || !uf_par || !uf_rel ||
        !flip) {
        free(cur_f);
        free(next_f);
        free(start);
        free(curs);
        free(uf_par);
        free(uf_rel);
        free(flip);
        return -1;
    }
    size_t nf = 0;
    for (int w = 0; w < nw; w++)
        cur_f[nf++] = (bframe){w, 0, n, 0, 0, 0, 0};

    int32_t k = c;
    int buf = 0;
    for (int lvl = 0; lvl < levels; lvl++, k >>= 1, buf ^= 1) {
        double rt_t0 = rt_now();
        /* phase A: sequential CSR builds (streaming, bandwidth-bound) */
        for (size_t i = 0; i < nf; i++) {
            cur_f[i].segc = 0;
            cur_f[i].mixed = 0;
            cur_f[i].poison = 0;
            frame_build(&wins[cur_f[i].win], &cur_f[i], r, buf, start, curs);
        }
        rt_prof[0] += rt_now() - rt_t0; rt_t0 = rt_now();
        /* phase B: interleaved arc walks (latency-bound).  Round-robin
         * one step per live walker per sweep; frames outnumbering walkers
         * get one walker each (the rest rebind on death); walkers
         * outnumbering frames multi-start WITHIN frames from spread
         * positions.  Exits when a full sweep performs no step. */
        {
            walker wks[ILV];
            size_t next = 0;
            int nb = 0;
            if (nf >= ILV) {
                for (; nb < ILV; nb++) {
                    walker_bind(&wks[nb], &wins[cur_f[next].win],
                                &cur_f[next], 0, 1);
                    next++;
                }
            } else if (nf > 0) {
                int per[ILV];
                for (size_t f = 0; f < nf; f++)
                    per[f] = (int)(ILV / nf) + (f < ILV % nf ? 1 : 0);
                for (size_t f = 0; f < nf; f++)
                    for (int t = 0; t < per[f]; t++)
                        walker_bind(&wks[nb++], &wins[cur_f[f].win],
                                    &cur_f[f], t, per[f]);
                next = nf;
            }
            int done = nb == 0;
            while (!done) {
                done = 1;
                for (int i = 0; i < nb; i++) {
                    if (!wks[i].alive) {
                        if (next < nf) {
                            walker_bind(&wks[i], &wins[cur_f[next].win],
                                        &cur_f[next], 0, 1);
                            next++;
                        }
                        if (!wks[i].alive) continue;
                    }
                    walker_step(&wks[i]);
                    done = 0;
                }
            }
        }
        rt_prof[1] += rt_now() - rt_t0; rt_t0 = rt_now();
        /* phase C: resolve segment flips, then stable partitions + next
         * level's frames; at the LAST level the color is just
         * base + parity so the partition passes are skipped entirely */
        size_t nnf = 0;
        int32_t k2 = k / 2;
        for (size_t i = 0; i < nf; i++) {
            bframe *f = &cur_f[i];
            wwin *W = &wins[f->win];
            if (f->poison) {
                classic_walk(W, f);
                f->segc = 1;
                f->mixed = 0;
            }
            const uint16_t *ub = W->ub + f->off;
            int32_t sc = f->segc;
            double rt_s0 = rt_now();
            if (f->mixed && sc > 1) {
                /* Pair scan: every consecutive CSR position pair (2q,
                 * 2q+1) holds the two edges that must land in opposite
                 * halves at that node.  Within one arc the alternating
                 * walk already satisfies this; across arcs it yields one
                 * XOR constraint between their segments' flip bits,
                 * resolved by a parity union-find.  (Join-time
                 * constraints would be incomplete: an arc walking the
                 * MIRROR orientation of a partially-walked circuit can
                 * cross both edges of a pair without ever stepping
                 * between them.) */
                for (int32_t s = 0; s < sc; s++) {
                    uf_par[s] = s;
                    uf_rel[s] = 0;
                }
                const int32_t m2 = 2 * f->m;
                if (f->m <= 32768) {
                    const uint32_t *P =
                        (uint32_t *)W->pair64 + 4 * (size_t)f->off;
                    for (int32_t q = 0; q < m2; q += 2) {
                        uint16_t u1 = ub[P[q] & 0xFFFF];
                        uint16_t u2 = ub[P[q + 1] & 0xFFFF];
                        if ((u1 ^ u2) >> 2) {
                            uint8_t pa, pb;
                            int32_t ra =
                                uf_find(uf_par, uf_rel, u1 >> 2, &pa);
                            int32_t rb =
                                uf_find(uf_par, uf_rel, u2 >> 2, &pb);
                            if (ra != rb) {
                                uf_par[ra] = rb;
                                uf_rel[ra] = (uint8_t)(
                                    ((u1 ^ u2) & 1) ^ 1 ^ pa ^ pb);
                            }
                        }
                    }
                } else {
                    const uint64_t *P = W->pair64 + 2 * (size_t)f->off;
                    for (int32_t q = 0; q < m2; q += 2) {
                        uint16_t u1 = ub[(uint32_t)P[q]];
                        uint16_t u2 = ub[(uint32_t)P[q + 1]];
                        if ((u1 ^ u2) >> 2) {
                            uint8_t pa, pb;
                            int32_t ra =
                                uf_find(uf_par, uf_rel, u1 >> 2, &pa);
                            int32_t rb =
                                uf_find(uf_par, uf_rel, u2 >> 2, &pb);
                            if (ra != rb) {
                                uf_par[ra] = rb;
                                uf_rel[ra] = (uint8_t)(
                                    ((u1 ^ u2) & 1) ^ 1 ^ pa ^ pb);
                            }
                        }
                    }
                }
                for (int32_t s = 0; s < sc; s++) {
                    uint8_t fl;
                    uf_find(uf_par, uf_rel, s, &fl);
                    flip[s] = fl;
                }
                /* fold the flips into the parity bit so the partition /
                 * color passes below read plain ub & 1 (vectorizable) */
                uint16_t *ubw = W->ub + f->off;
                for (int32_t j = 0; j < f->m; j++)
                    ubw[j] ^= flip[ubw[j] >> 2];
            }
            rt_prof[2] += rt_now() - rt_s0;
            int32_t *grp = W->grp[buf], *uv = W->uv[buf];
            if (k2 == 1) {
                for (int32_t j = 0; j < f->m; j++)
                    W->color[grp[f->off + j]] = f->base + (ub[j] & 1);
                continue;
            }
            /* Single-pass stable partition.  Every Euler split halves
             * each node's degree EXACTLY, so the 0-half is m/2 elements
             * — both output cursors are known up front. */
            int32_t *ogrp = W->grp[buf ^ 1], *ouv = W->uv[buf ^ 1];
            const int32_t m = f->m, half = m / 2;
            int32_t lo = f->off, hi = f->off + half;
            int32_t j = 0;
#ifdef ROUTE_AVX512
            {
                const __m256i one16 = _mm256_set1_epi16(1);
                for (; j + 16 <= m; j += 16) {
                    __m256i ubv =
                        _mm256_loadu_si256((const __m256i *)(ub + j));
                    __mmask16 m1 = _mm256_test_epi16_mask(ubv, one16);
                    __mmask16 m0 = (__mmask16)~m1;
                    __m512i g = _mm512_loadu_si512(
                        (const void *)(grp + f->off + j));
                    __m512i u = _mm512_loadu_si512(
                        (const void *)(uv + f->off + j));
                    _mm512_mask_compressstoreu_epi32(ogrp + lo, m0, g);
                    _mm512_mask_compressstoreu_epi32(ouv + lo, m0, u);
                    _mm512_mask_compressstoreu_epi32(ogrp + hi, m1, g);
                    _mm512_mask_compressstoreu_epi32(ouv + hi, m1, u);
                    int c0 = _mm_popcnt_u32((uint32_t)m0 & 0xFFFF);
                    lo += c0;
                    hi += 16 - c0;
                }
            }
#endif
            for (; j < m; j++) {
                if (!(ub[j] & 1)) {
                    ogrp[lo] = grp[f->off + j];
                    ouv[lo++] = uv[f->off + j];
                } else {
                    ogrp[hi] = grp[f->off + j];
                    ouv[hi++] = uv[f->off + j];
                }
            }
            next_f[nnf++] = (bframe){f->win, f->off, half, f->base, 0, 0, 0};
            next_f[nnf++] =
                (bframe){f->win, f->off + half, m - half, f->base + k2, 0, 0,
                         0};
        }
        rt_prof[3] += rt_now() - rt_t0;
        bframe *tmp = cur_f;
        cur_f = next_f;
        next_f = tmp;
        nf = nnf;
    }
    free(cur_f);
    free(next_f);
    free(start);
    free(curs);
    free(uf_par);
    free(uf_rel);
    free(flip);
    return 0;
}

static int is_pow2(int32_t v) { return v > 0 && (v & (v - 1)) == 0; }

static int wwin_alloc(wwin *Wn, int32_t n) {
    Wn->row_s = malloc((size_t)n * sizeof(int32_t));
    Wn->col_s = malloc((size_t)n * sizeof(int32_t));
    Wn->color = malloc((size_t)n * sizeof(int32_t));
    Wn->grp[0] = malloc((size_t)n * sizeof(int32_t));
    Wn->grp[1] = malloc((size_t)n * sizeof(int32_t));
    Wn->uv[0] = malloc((size_t)n * sizeof(int32_t));
    Wn->uv[1] = malloc((size_t)n * sizeof(int32_t));
    Wn->ub = malloc((size_t)n * sizeof(uint16_t));
    Wn->firstpos = malloc((size_t)n * sizeof(int32_t));
    Wn->pair64 = malloc((size_t)(2 * (int64_t)n) * sizeof(uint64_t));
    return !Wn->row_s || !Wn->col_s || !Wn->color || !Wn->grp[0] ||
           !Wn->grp[1] || !Wn->uv[0] || !Wn->uv[1] || !Wn->ub ||
           !Wn->firstpos || !Wn->pair64;
}

static void wwin_free(wwin *Wn) {
    free(Wn->row_s);
    free(Wn->col_s);
    free(Wn->color);
    free(Wn->grp[0]);
    free(Wn->grp[1]);
    free(Wn->uv[0]);
    free(Wn->uv[1]);
    free(Wn->ub);
    free(Wn->firstpos);
    free(Wn->pair64);
}

/* decompose(r, c, src_bytes): route W permutations of n = r*c elements.
 * src[w*n + d] = source position of the element that must end at d.
 * Returns (idx1, idx2, idx3) int32 bytes with, per window:
 *   stage1[a][j]  = in  [a*c + idx1[a*c + j]]        (within source rows)
 *   stage2[j][a2] = st1 [idx2[j*r + a2] ... col j]   (within columns)
 *   stage3[a2][b] = st2 [a2 ... col idx3[a2*c + b]]  (within dest rows)
 * so that stage3[a2][b] = in[src[a2*c + b]]. */
static PyObject *py_decompose(PyObject *self, PyObject *args) {
    (void)self;
    int r, c;
    Py_buffer buf;
    if (!PyArg_ParseTuple(args, "iiy*", &r, &c, &buf)) return NULL;
    int32_t n = (int32_t)((int64_t)r * c);
    if (!is_pow2(c) || r <= 0 || (int64_t)r * c != n) {
        PyBuffer_Release(&buf);
        PyErr_SetString(PyExc_ValueError, "need r > 0 and power-of-two c");
        return NULL;
    }
    if (buf.len % ((Py_ssize_t)n * 4) != 0 || buf.len == 0) {
        PyBuffer_Release(&buf);
        PyErr_SetString(PyExc_ValueError, "src must be W*r*c int32 values");
        return NULL;
    }
    Py_ssize_t W = buf.len / ((Py_ssize_t)n * 4);
    PyObject *o1 = PyBytes_FromStringAndSize(NULL, W * (Py_ssize_t)n * 4);
    PyObject *o2 = PyBytes_FromStringAndSize(NULL, W * (Py_ssize_t)n * 4);
    PyObject *o3 = PyBytes_FromStringAndSize(NULL, W * (Py_ssize_t)n * 4);
    if (!o1 || !o2 || !o3) {
        Py_XDECREF(o1);
        Py_XDECREF(o2);
        Py_XDECREF(o3);
        PyBuffer_Release(&buf);
        return NULL;
    }
    int32_t cshift = 0;
    {
        int32_t cc = c;
        while (cc > 1) {
            cshift++;
            cc >>= 1;
        }
    }
    wwin *wins = calloc((size_t)W, sizeof(wwin));
    int oom = wins == NULL;
    for (Py_ssize_t w = 0; !oom && w < W; w++) oom = wwin_alloc(&wins[w], n);
    if (!oom) {
        const int32_t *src = (const int32_t *)buf.buf;
        int32_t *i1 = (int32_t *)PyBytes_AS_STRING(o1);
        int32_t *i2 = (int32_t *)PyBytes_AS_STRING(o2);
        int32_t *i3 = (int32_t *)PyBytes_AS_STRING(o3);
        Py_BEGIN_ALLOW_THREADS
        for (Py_ssize_t w = 0; w < W; w++) {
            const int32_t *s = src + w * n;
            wwin *Wn = &wins[w];
            for (int32_t d = 0; d < n; d++) {
                int32_t sv = s[d];
                Wn->row_s[d] = sv >> cshift;
                Wn->col_s[d] = sv & (c - 1);
            }
        }
        /* one window at a time: a window's frames at any level total
         * n edges (~2 MB pair region) regardless of depth, so within-
         * window multi-start adds memory-level parallelism WITHOUT
         * growing the working set; cross-window interleave (8 windows
         * x 2 MB live at once) measured SLOWER than sequential — it
         * thrashes the LLC. */
        for (Py_ssize_t w = 0; w < W && !oom; w++)
            if (color_edges_batch(wins + w, 1, n, r, c, cshift) != 0)
                oom = 1;
        if (!oom)
            for (Py_ssize_t w = 0; w < W; w++) {
                wwin *Wn = &wins[w];
                int32_t *w1 = i1 + w * n, *w2 = i2 + w * n, *w3 = i3 + w * n;
                for (int32_t d = 0; d < n; d++) {
                    int32_t col = Wn->color[d];
                    int32_t a = Wn->row_s[d], a2 = d >> cshift,
                            b = d & (c - 1);
                    w1[(size_t)a * c + col] = Wn->col_s[d];
                    w2[(size_t)col * r + a2] = a;
                    w3[(size_t)a2 * c + b] = col;
                }
            }
        Py_END_ALLOW_THREADS
    }
    if (wins)
        for (Py_ssize_t w = 0; w < W; w++) wwin_free(&wins[w]);
    free(wins);
    PyBuffer_Release(&buf);
    if (oom) {
        Py_DECREF(o1);
        Py_DECREF(o2);
        Py_DECREF(o3);
        return PyErr_NoMemory();
    }
    PyObject *res = PyTuple_Pack(3, o1, o2, o3);
    Py_DECREF(o1);
    Py_DECREF(o2);
    Py_DECREF(o3);
    return res;
}

/* decompose_packed(r, c, src_bytes): same routing as decompose, but the
 * output is emitted directly in the transfer wire format consumed by
 * ops.msm._decode_packed_tables ("13a"/"13b" packing):
 *   combo : n int16 per window  — i1 | i3 << 8 over the flat (r, c) grids
 *   i2lo  : n u8   per window  — low byte of i2 in (c, r) row-major order
 *   i2hi  : n/16 u16 per window (only when r > 256) — 9th-bit bitplane,
 *           bit (q & 15) of word q >> 4 for flat index q = col*r + a2
 * Emitting the packed bytes here removes three int32 scatter streams from
 * the C fill AND the per-chunk numpy packing passes on the Python main
 * thread (which competed with route solves for the 2 host cores).
 * Requires c <= 256, r <= 512, r % 32 == 0 — the production slice shapes;
 * other shapes use decompose() + Python packing. */
static PyObject *py_decompose_packed(PyObject *self, PyObject *args) {
    (void)self;
    int r, c;
    Py_buffer buf;
    if (!PyArg_ParseTuple(args, "iiy*", &r, &c, &buf)) return NULL;
    int32_t n = (int32_t)((int64_t)r * c);
    if (!is_pow2(c) || r <= 0 || (int64_t)r * c != n || c > 256 || r > 512 ||
        (r % 32) != 0) {
        PyBuffer_Release(&buf);
        PyErr_SetString(PyExc_ValueError,
                        "need power-of-two c <= 256, r <= 512, r % 32 == 0");
        return NULL;
    }
    if (buf.len % ((Py_ssize_t)n * 4) != 0 || buf.len == 0) {
        PyBuffer_Release(&buf);
        PyErr_SetString(PyExc_ValueError, "src must be W*r*c int32 values");
        return NULL;
    }
    Py_ssize_t W = buf.len / ((Py_ssize_t)n * 4);
    int wide = r > 256; /* row ids need a 9th bit */
    PyObject *o1 = PyBytes_FromStringAndSize(NULL, W * (Py_ssize_t)n * 2);
    PyObject *o2 = PyBytes_FromStringAndSize(NULL, W * (Py_ssize_t)n);
    PyObject *o3 =
        PyBytes_FromStringAndSize(NULL, wide ? W * (Py_ssize_t)(n / 8) : 0);
    if (!o1 || !o2 || !o3) {
        Py_XDECREF(o1);
        Py_XDECREF(o2);
        Py_XDECREF(o3);
        PyBuffer_Release(&buf);
        return NULL;
    }
    int32_t cshift = 0;
    {
        int32_t cc = c;
        while (cc > 1) {
            cshift++;
            cc >>= 1;
        }
    }
    wwin *wins = calloc((size_t)W, sizeof(wwin));
    int oom = wins == NULL;
    for (Py_ssize_t w = 0; !oom && w < W; w++) oom = wwin_alloc(&wins[w], n);
    if (!oom) {
        const int32_t *src = (const int32_t *)buf.buf;
        uint8_t *combo = (uint8_t *)PyBytes_AS_STRING(o1);
        uint8_t *i2lo = (uint8_t *)PyBytes_AS_STRING(o2);
        uint16_t *i2hi = wide ? (uint16_t *)PyBytes_AS_STRING(o3) : NULL;
        Py_BEGIN_ALLOW_THREADS
        for (Py_ssize_t w = 0; w < W; w++) {
            const int32_t *s = src + w * n;
            wwin *Wn = &wins[w];
            for (int32_t d = 0; d < n; d++) {
                int32_t sv = s[d];
                Wn->row_s[d] = sv >> cshift;
                Wn->col_s[d] = sv & (c - 1);
            }
        }
        for (Py_ssize_t w = 0; w < W && !oom; w++)
            if (color_edges_batch(wins + w, 1, n, r, c, cshift) != 0) oom = 1;
        if (!oom)
            for (Py_ssize_t w = 0; w < W; w++) {
                wwin *Wn = &wins[w];
                uint8_t *cb = combo + (size_t)w * n * 2;
                uint8_t *lo = i2lo + (size_t)w * n;
                uint16_t *hi = wide ? i2hi + (size_t)w * (n / 16) : NULL;
                if (wide) memset(hi, 0, (size_t)(n / 16) * 2);
                for (int32_t d = 0; d < n; d++) {
                    int32_t col = Wn->color[d];
                    int32_t a = Wn->row_s[d], a2 = d >> cshift,
                            b = d & (c - 1);
                    cb[2 * ((size_t)a * c + col)] = (uint8_t)Wn->col_s[d];
                    cb[2 * ((size_t)a2 * c + b) + 1] = (uint8_t)col;
                    size_t q = (size_t)col * r + a2;
                    lo[q] = (uint8_t)a;
                    if (wide)
                        hi[q >> 4] |=
                            (uint16_t)((uint32_t)(a >> 8) << (q & 15));
                }
            }
        Py_END_ALLOW_THREADS
    }
    if (wins)
        for (Py_ssize_t w = 0; w < W; w++) wwin_free(&wins[w]);
    free(wins);
    PyBuffer_Release(&buf);
    if (oom) {
        Py_DECREF(o1);
        Py_DECREF(o2);
        Py_DECREF(o3);
        return PyErr_NoMemory();
    }
    PyObject *res = PyTuple_Pack(3, o1, o2, o3);
    Py_DECREF(o1);
    Py_DECREF(o2);
    Py_DECREF(o3);
    return res;
}

static PyObject *py_prof(PyObject *self, PyObject *args) {
    (void)self; (void)args;
    PyObject *r = Py_BuildValue("(dddd)", rt_prof[0], rt_prof[1],
                                rt_prof[2], rt_prof[3]);
    rt_prof[0] = rt_prof[1] = rt_prof[2] = rt_prof[3] = 0;
    return r;
}

static PyMethodDef methods[] = {
    {"decompose", py_decompose, METH_VARARGS,
     "decompose(r, c, src_int32_bytes) -> (idx1, idx2, idx3) bytes.\n"
     "3-stage rows/columns/rows routing of W permutations of r*c elements."},
    {"decompose_packed", py_decompose_packed, METH_VARARGS,
     "decompose_packed(r, c, src_int32_bytes) -> (combo, i2lo, i2hi) bytes\n"
     "in the '13a'/'13b' transfer wire format (c <= 256, r <= 512, "
     "r % 32 == 0)."},
    {"prof", py_prof, METH_NOARGS, "phase timers (build, walk, scan, part)"},
    {NULL, NULL, 0, NULL},
};

static struct PyModuleDef mod = {
    PyModuleDef_HEAD_INIT, "_route_native",
    "Benes/Hall 3-stage permutation routing (Euler-split coloring).", -1,
    methods, NULL, NULL, NULL, NULL,
};

PyMODINIT_FUNC PyInit__route_native(void) { return PyModule_Create(&mod); }
