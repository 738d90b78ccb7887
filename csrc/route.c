/* Beneš/Hall 3-stage permutation routing for the MXU one-hot gather.
 *
 * Role in the framework: the direct one-hot gather (ops/gather.py) that
 * feeds the host-sorted Pippenger MSM costs 4R*n*n bf16 MACs per window —
 * quadratic in n and the dominant cost at n >= 2^16.  Writing the n
 * positions as an (r x c) matrix (n = r*c), Hall's theorem gives every
 * permutation a 3-stage factorization
 *
 *     within-rows  o  within-columns  o  within-rows
 *
 * so the gather becomes three batched one-hot gathers with contraction
 * widths c, r, c — 4R*n*(2c + r) MACs, ~85x fewer at n = 2^16 (r = 512,
 * c = 128) and ~340x at 2^20.
 *
 * The routing itself: build the bipartite multigraph with an edge
 * (source row -> destination row) per element; it is c-regular, so it
 * splits into c perfect matchings (Koenig).  color(e) = matching index,
 * computed by recursive Euler splitting: walk Euler circuits assigning
 * alternate edges to the two halves (even circuits, since the graph is
 * bipartite), halving the regular degree each level — O(n log c) total.
 * Element e then routes (row_s, col_s) -> (row_s, color) -> (row_d, color)
 * -> (row_d, col_d), each hop inside one row/column.
 *
 * Implementation notes (the solve sits on the stream-MSM critical path —
 * it paces chunk dispatches on the 2-core bench host):
 *   * Circuits are walked over a fused (eid, twin) pair array — one
 *     8-byte cache access per step — with the node-local successor given
 *     by pairing consecutive CSR positions (twin ^ 1; every node degree
 *     is even at every level, so each node's half-edge list starts at an
 *     even offset and position pairs (2i, 2i+1) stay within one node).
 *     No cursor re-scans, no separate used[]/oth[] streams: the old
 *     cursor walk touched ~6 random streams per edge, this one ~3.
 *   * used-flag and parity share one byte (ub: bit1 = used, bit0 = color
 *     bit), and the per-level stable partition ping-pongs between two
 *     (grp, uv) buffer pairs instead of memcpy-ing back.
 *   Measured ~27 ms -> ~20 ms per window at n = 2^17 (r=512, c=256).
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

typedef struct {
    int32_t r, c, n, cshift;
    /* per element (indexed by dest position d) */
    int32_t *row_s, *col_s; /* src / c, src % c */
    uint8_t *ub;            /* per edge-in-group: bit1 = used, bit0 = parity */
    int32_t *grp[2];        /* ping-pong: original edge id per group slot */
    int32_t *uv[2];         /* ping-pong: row_s | (row_d << 16) per slot */
    int32_t *color;
    /* CSR workspace (sized for the largest group: n edges) */
    int32_t *start; /* 2r+1 prefix offsets */
    int32_t *cur;   /* 2r filling cursors */
    int32_t *pair;  /* 2 int32 per half-edge: [edge-in-group, twin position]
                       — fused so each circuit step is one cache access */
    int32_t *firstpos; /* per edge-in-group: its u-side half-edge position */
} ws;

/* Assign alternating 0/1 bits (into ub bit0) along Euler circuits of the
 * bipartite multigraph formed by the m edges uv[0..m): left node
 * uv & 0xFFFF (source row), right node r + (uv >> 16) (dest row). */
static void euler_halve(ws *w, const int32_t *uv, int32_t m) {
    const int32_t r = w->r;
    int32_t nn = 2 * r;
    int32_t *start = w->start, *cur = w->cur, *pair = w->pair;
    int32_t *firstpos = w->firstpos;
    uint8_t *ub = w->ub;
    memset(start, 0, (size_t)(nn + 1) * sizeof(int32_t));
    for (int32_t i = 0; i < m; i++) {
        int32_t p = uv[i];
        start[(p & 0xFFFF) + 1]++;
        start[r + (p >> 16) + 1]++;
    }
    for (int32_t i = 0; i < nn; i++) start[i + 1] += start[i];
    memcpy(cur, start, (size_t)nn * sizeof(int32_t));
    for (int32_t i = 0; i < m; i++) {
        int32_t p = uv[i];
        int32_t u = p & 0xFFFF;
        int32_t v = r + (p >> 16);
        int32_t pu = cur[u]++, pv = cur[v]++;
        pair[2 * pu] = i;
        pair[2 * pu + 1] = pv;
        pair[2 * pv] = i;
        pair[2 * pv + 1] = pu;
        firstpos[i] = pu;
        ub[i] = 0;
    }
    /* Circuit walk: from half-edge p of edge e, cross to e's other
     * endpoint (twin) and leave through that position's pair partner
     * (^1).  Each circuit yields two traversal directions; the used bit
     * set along the first suppresses the second. */
    for (int32_t i0 = 0; i0 < m; i0++) {
        if (ub[i0] & 2) continue;
        int32_t p0 = firstpos[i0];
        int32_t p = p0;
        uint8_t parity = 0;
        do {
            int32_t e = pair[2 * p];
            int32_t tw = pair[2 * p + 1];
            ub[e] = (uint8_t)(2 | parity);
            parity ^= 1;
            p = tw ^ 1;
        } while (p != p0);
    }
}

/* Color all n edges with c colors, distinct within every source row and
 * every dest row.  Iterative stack over (offset, m, k, colorbase, buf). */
static void color_edges(ws *w) {
    const int32_t n = w->n, c = w->c, cshift = w->cshift;
    for (int32_t e = 0; e < n; e++) {
        w->grp[0][e] = e;
        w->uv[0][e] = w->row_s[e] | ((e >> cshift) << 16);
    }
    if (c == 1) {
        memset(w->color, 0, (size_t)n * sizeof(int32_t));
        return;
    }
    typedef struct {
        int32_t off, m, k, base;
        int32_t buf;
    } frame;
    /* DFS stack of depth log2(c)+1; 128 is comfortably above any real c */
    frame stack[128];
    int sp = 0;
    stack[sp++] = (frame){0, n, c, 0, 0};
    while (sp > 0) {
        frame f = stack[--sp];
        int32_t *grp = w->grp[f.buf], *uv = w->uv[f.buf];
        if (f.k == 1) {
            for (int32_t i = 0; i < f.m; i++) w->color[grp[f.off + i]] = f.base;
            continue;
        }
        euler_halve(w, uv + f.off, f.m);
        /* stable partition by parity bit into the other buffer pair */
        int32_t *ogrp = w->grp[f.buf ^ 1], *ouv = w->uv[f.buf ^ 1];
        int32_t lo = f.off, hi;
        for (int32_t i = 0; i < f.m; i++)
            if (!(w->ub[i] & 1)) {
                ogrp[lo] = grp[f.off + i];
                ouv[lo++] = uv[f.off + i];
            }
        hi = lo;
        for (int32_t i = 0; i < f.m; i++)
            if (w->ub[i] & 1) {
                ogrp[hi] = grp[f.off + i];
                ouv[hi++] = uv[f.off + i];
            }
        int32_t k2 = f.k / 2;
        int32_t mlo = lo - f.off;
        stack[sp++] = (frame){f.off, mlo, k2, f.base, f.buf ^ 1};
        stack[sp++] = (frame){lo, f.m - mlo, k2, f.base + k2, f.buf ^ 1};
    }
}

/* One window: src[d] = source position of the element destined to d.
 * Fills idx1 (r*c), idx2 (c*r), idx3 (r*c):
 *   stage1[a][j]  = in  [a*c + idx1[a*c + j]]          (within source rows)
 *   stage2[j][a2] = st1 [idx2[j*r + a2]*c ... col j]   (within columns)
 *   stage3[a2][b] = st2 [a2 ... col idx3[a2*c + b]]    (within dest rows)
 * so that stage3[a2][b] = in[src[a2*c + b]].  All idx values are local
 * (< c, < r, < c). */
static void decompose_one(ws *w, const int32_t *src, int32_t *idx1,
                          int32_t *idx2, int32_t *idx3) {
    const int32_t r = w->r, c = w->c, n = w->n, cshift = w->cshift;
    for (int32_t d = 0; d < n; d++) {
        int32_t s = src[d];
        w->row_s[d] = s >> cshift;
        w->col_s[d] = s & (c - 1);
    }
    color_edges(w);
    for (int32_t d = 0; d < n; d++) {
        int32_t col = w->color[d];
        int32_t a = w->row_s[d], a2 = d >> cshift, b = d & (c - 1);
        idx1[(size_t)a * c + col] = w->col_s[d];
        idx2[(size_t)col * r + a2] = a;
        idx3[(size_t)a2 * c + b] = col;
    }
}

static int is_pow2(int32_t v) { return v > 0 && (v & (v - 1)) == 0; }

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
    ws w = {0};
    w.r = r;
    w.c = c;
    w.n = n;
    {
        int32_t cc = c;
        while (cc > 1) {
            w.cshift++;
            cc >>= 1;
        }
    }
    w.row_s = malloc((size_t)n * sizeof(int32_t));
    w.col_s = malloc((size_t)n * sizeof(int32_t));
    w.ub = malloc((size_t)n);
    w.grp[0] = malloc((size_t)n * sizeof(int32_t));
    w.grp[1] = malloc((size_t)n * sizeof(int32_t));
    w.uv[0] = malloc((size_t)n * sizeof(int32_t));
    w.uv[1] = malloc((size_t)n * sizeof(int32_t));
    w.color = malloc((size_t)n * sizeof(int32_t));
    w.start = malloc((size_t)(2 * r + 1) * sizeof(int32_t));
    w.cur = malloc((size_t)(2 * r) * sizeof(int32_t));
    w.pair = malloc((size_t)(4 * (int64_t)n) * sizeof(int32_t));
    w.firstpos = malloc((size_t)n * sizeof(int32_t));
    int oom = !w.row_s || !w.col_s || !w.ub || !w.grp[0] || !w.grp[1] ||
              !w.uv[0] || !w.uv[1] || !w.color || !w.start || !w.cur ||
              !w.pair || !w.firstpos;
    if (!oom) {
        const int32_t *src = (const int32_t *)buf.buf;
        int32_t *i1 = (int32_t *)PyBytes_AS_STRING(o1);
        int32_t *i2 = (int32_t *)PyBytes_AS_STRING(o2);
        int32_t *i3 = (int32_t *)PyBytes_AS_STRING(o3);
        Py_BEGIN_ALLOW_THREADS for (Py_ssize_t wdw = 0; wdw < W; wdw++) {
            decompose_one(&w, src + wdw * n, i1 + wdw * n, i2 + wdw * n,
                          i3 + wdw * n);
        }
        Py_END_ALLOW_THREADS
    }
    free(w.row_s);
    free(w.col_s);
    free(w.ub);
    free(w.grp[0]);
    free(w.grp[1]);
    free(w.uv[0]);
    free(w.uv[1]);
    free(w.color);
    free(w.start);
    free(w.cur);
    free(w.pair);
    free(w.firstpos);
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
    {NULL, NULL, 0, NULL},
};

static struct PyModuleDef mod = {
    PyModuleDef_HEAD_INIT, "_route_native",
    "Benes/Hall 3-stage permutation routing (Euler-split coloring).", -1,
    methods, NULL, NULL, NULL, NULL,
};

PyMODINIT_FUNC PyInit__route_native(void) { return PyModule_Create(&mod); }
