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
 *   * The circuit walk is a pointer chase: ~1-2 random cache accesses per
 *     edge visit at ~60-cycle latency, so a single walk runs at ~20 ns/
 *     visit regardless of ALU speed.  The recursion therefore runs
 *     BREADTH-FIRST and walks up to ILV independent circuits (different
 *     groups, and with the batched entry point different windows) in
 *     LOCKSTEP from one thread — memory-level parallelism hides the
 *     latency behind 4-8 outstanding misses.  Level 0 of a single window
 *     has only one group (no interleave), which is why the Python callers
 *     pass SEVERAL windows per call.
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

#define ILV 8 /* interleaved circuit walkers per thread */

typedef struct { /* per-window state */
    int32_t *row_s, *col_s, *color;
    int32_t *grp[2]; /* ping-pong: original edge id per group slot */
    int32_t *uv[2];  /* ping-pong: row_s | (row_d << 16) per slot */
    uint8_t *ub;     /* bit1 = used, bit0 = parity (frame-local + off) */
    int32_t *firstpos;
    uint64_t *pair64; /* 2 half-edge slots per edge; frames use the
                         disjoint region [2*off, 2*(off+m)) (u64 view) or
                         [4*off, 4*off + 2m) (u32 view, small frames) */
} wwin;

typedef struct {
    int32_t win, off, m, base;
} bframe;

typedef struct {
    int alive, narrow;
    uint64_t *P64;
    uint32_t *P32;
    uint8_t *ub;
    int32_t *firstpos;
    int32_t m, i0;
    uint32_t p, p0;
    uint8_t parity;
} walker;

/* Build one frame's CSR twin-chain arrays (sequential, streaming).
 * start/cur are shared scratch of 2r+1 / 2r int32. */
static void frame_build(wwin *W, const bframe *f, int32_t r, int buf,
                        int32_t *start, int32_t *cur) {
    const int32_t *uv = W->uv[buf] + f->off;
    const int32_t m = f->m;
    const int32_t nn = 2 * r;
    uint8_t *ub = W->ub + f->off;
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

static void walker_bind(walker *wk, wwin *W, const bframe *f) {
    wk->narrow = f->m <= 32768;
    wk->P64 = W->pair64 + 2 * (size_t)f->off;
    wk->P32 = (uint32_t *)W->pair64 + 4 * (size_t)f->off;
    wk->ub = W->ub + f->off;
    wk->firstpos = W->firstpos + f->off;
    wk->m = f->m;
    wk->i0 = 0;
    wk->alive = f->m > 0;
    if (wk->alive) {
        wk->p0 = wk->p = (uint32_t)wk->firstpos[0];
        wk->parity = 0;
    }
}

/* One circuit step: cross the current half-edge's twin and leave through
 * its pair partner (^1: node half-edge lists start even — every degree is
 * even at every level — so consecutive position pairs stay in one node).
 * Each circuit is traversed once; the used bit set along it suppresses
 * the reverse direction. */
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
    wk->ub[e] = (uint8_t)(2 | wk->parity);
    wk->parity ^= 1;
    wk->p = tw ^ 1;
    if (wk->p == wk->p0) { /* circuit closed: start the next one */
        int32_t i = wk->i0;
        const int32_t m = wk->m;
        while (i < m && (wk->ub[i] & 2)) i++;
        wk->i0 = i;
        if (i >= m) {
            wk->alive = 0;
            return;
        }
        wk->p0 = wk->p = (uint32_t)wk->firstpos[i];
        wk->parity = 0;
    }
}

/* Color all windows' edges with c colors (distinct within every source
 * row and every dest row), walking up to ILV groups in lockstep. */
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
    if (!cur_f || !next_f || !start || !curs) {
        free(cur_f);
        free(next_f);
        free(start);
        free(curs);
        return -1;
    }
    size_t nf = 0;
    for (int w = 0; w < nw; w++)
        cur_f[nf++] = (bframe){w, 0, n, 0};

    int32_t k = c;
    int buf = 0;
    for (int lvl = 0; lvl < levels; lvl++, k >>= 1, buf ^= 1) {
        /* phase A: sequential CSR builds (streaming, bandwidth-bound) */
        for (size_t i = 0; i < nf; i++)
            frame_build(&wins[cur_f[i].win], &cur_f[i], r, buf, start, curs);
        /* phase B: interleaved circuit walks (latency-bound).  Round-robin
         * one step per live walker per sweep; a walker that finishes its
         * frame rebinds to the next pending frame.  Exits when a full
         * sweep performs no step (all walkers dead, no frames left). */
        {
            walker wks[ILV];
            size_t next = 0;
            int nb = (int)(nf < ILV ? nf : ILV);
            for (int i = 0; i < nb; i++)
                walker_bind(&wks[i], &wins[cur_f[next].win], &cur_f[next]),
                    next++;
            int done = nb == 0;
            while (!done) {
                done = 1;
                for (int i = 0; i < nb; i++) {
                    if (!wks[i].alive) {
                        if (next < nf) {
                            walker_bind(&wks[i], &wins[cur_f[next].win],
                                        &cur_f[next]);
                            next++;
                        }
                        if (!wks[i].alive) continue;
                    }
                    walker_step(&wks[i]);
                    done = 0;
                }
            }
        }
        /* phase C: stable partitions + next level's frames; at the LAST
         * level the color is just base + parity, so the partition passes
         * are skipped entirely */
        size_t nnf = 0;
        int32_t k2 = k / 2;
        for (size_t i = 0; i < nf; i++) {
            bframe *f = &cur_f[i];
            wwin *W = &wins[f->win];
            const uint8_t *ub = W->ub + f->off;
            int32_t *grp = W->grp[buf], *uv = W->uv[buf];
            if (k2 == 1) {
                for (int32_t j = 0; j < f->m; j++)
                    W->color[grp[f->off + j]] = f->base + (ub[j] & 1);
                continue;
            }
            int32_t *ogrp = W->grp[buf ^ 1], *ouv = W->uv[buf ^ 1];
            int32_t lo = f->off, hi;
            for (int32_t j = 0; j < f->m; j++)
                if (!(ub[j] & 1)) {
                    ogrp[lo] = grp[f->off + j];
                    ouv[lo++] = uv[f->off + j];
                }
            hi = lo;
            for (int32_t j = 0; j < f->m; j++)
                if (ub[j] & 1) {
                    ogrp[hi] = grp[f->off + j];
                    ouv[hi++] = uv[f->off + j];
                }
            int32_t mlo = lo - f->off;
            next_f[nnf++] = (bframe){f->win, f->off, mlo, f->base};
            next_f[nnf++] = (bframe){f->win, lo, f->m - mlo, f->base + k2};
        }
        bframe *tmp = cur_f;
        cur_f = next_f;
        next_f = tmp;
        nf = nnf;
    }
    free(cur_f);
    free(next_f);
    free(start);
    free(curs);
    return 0;
}

static int is_pow2(int32_t v) { return v > 0 && (v & (v - 1)) == 0; }

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
    for (Py_ssize_t w = 0; !oom && w < W; w++) {
        wwin *Wn = &wins[w];
        Wn->row_s = malloc((size_t)n * sizeof(int32_t));
        Wn->col_s = malloc((size_t)n * sizeof(int32_t));
        Wn->color = malloc((size_t)n * sizeof(int32_t));
        Wn->grp[0] = malloc((size_t)n * sizeof(int32_t));
        Wn->grp[1] = malloc((size_t)n * sizeof(int32_t));
        Wn->uv[0] = malloc((size_t)n * sizeof(int32_t));
        Wn->uv[1] = malloc((size_t)n * sizeof(int32_t));
        Wn->ub = malloc((size_t)n);
        Wn->firstpos = malloc((size_t)n * sizeof(int32_t));
        Wn->pair64 = malloc((size_t)(2 * (int64_t)n) * sizeof(uint64_t));
        oom = !Wn->row_s || !Wn->col_s || !Wn->color || !Wn->grp[0] ||
              !Wn->grp[1] || !Wn->uv[0] || !Wn->uv[1] || !Wn->ub ||
              !Wn->firstpos || !Wn->pair64;
    }
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
         * window interleave adds memory-level parallelism WITHOUT
         * growing the working set; cross-window interleave (8 windows
         * x 2 MB live at once) measured SLOWER than sequential — it
         * thrashes the LLC. Level 0 (single frame) stays one chain. */
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
        for (Py_ssize_t w = 0; w < W; w++) {
            free(wins[w].row_s);
            free(wins[w].col_s);
            free(wins[w].color);
            free(wins[w].grp[0]);
            free(wins[w].grp[1]);
            free(wins[w].uv[0]);
            free(wins[w].uv[1]);
            free(wins[w].ub);
            free(wins[w].firstpos);
            free(wins[w].pair64);
        }
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
    for (Py_ssize_t w = 0; !oom && w < W; w++) {
        wwin *Wn = &wins[w];
        Wn->row_s = malloc((size_t)n * sizeof(int32_t));
        Wn->col_s = malloc((size_t)n * sizeof(int32_t));
        Wn->color = malloc((size_t)n * sizeof(int32_t));
        Wn->grp[0] = malloc((size_t)n * sizeof(int32_t));
        Wn->grp[1] = malloc((size_t)n * sizeof(int32_t));
        Wn->uv[0] = malloc((size_t)n * sizeof(int32_t));
        Wn->uv[1] = malloc((size_t)n * sizeof(int32_t));
        Wn->ub = malloc((size_t)n);
        Wn->firstpos = malloc((size_t)n * sizeof(int32_t));
        Wn->pair64 = malloc((size_t)(2 * (int64_t)n) * sizeof(uint64_t));
        oom = !Wn->row_s || !Wn->col_s || !Wn->color || !Wn->grp[0] ||
              !Wn->grp[1] || !Wn->uv[0] || !Wn->uv[1] || !Wn->ub ||
              !Wn->firstpos || !Wn->pair64;
    }
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
        for (Py_ssize_t w = 0; w < W; w++) {
            free(wins[w].row_s);
            free(wins[w].col_s);
            free(wins[w].color);
            free(wins[w].grp[0]);
            free(wins[w].grp[1]);
            free(wins[w].uv[0]);
            free(wins[w].uv[1]);
            free(wins[w].ub);
            free(wins[w].firstpos);
            free(wins[w].pair64);
        }
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

static PyMethodDef methods[] = {
    {"decompose", py_decompose, METH_VARARGS,
     "decompose(r, c, src_int32_bytes) -> (idx1, idx2, idx3) bytes.\n"
     "3-stage rows/columns/rows routing of W permutations of r*c elements."},
    {"decompose_packed", py_decompose_packed, METH_VARARGS,
     "decompose_packed(r, c, src_int32_bytes) -> (combo, i2lo, i2hi) bytes\n"
     "in the '13a'/'13b' transfer wire format (c <= 256, r <= 512, "
     "r % 32 == 0)."},
    {NULL, NULL, 0, NULL},
};

static struct PyModuleDef mod = {
    PyModuleDef_HEAD_INIT, "_route_native",
    "Benes/Hall 3-stage permutation routing (Euler-split coloring).", -1,
    methods, NULL, NULL, NULL, NULL,
};

PyMODINIT_FUNC PyInit__route_native(void) { return PyModule_Create(&mod); }
