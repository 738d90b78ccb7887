"""3-stage permutation routing for MXU one-hot gathers (host side).

A gather of n elements via one one-hot matmul costs 4R*n*n bf16 MACs —
quadratic in n, the dominant cost of the host-sorted Pippenger MSM at
n >= 2^16 and prohibitive at 2^20.  Viewing positions as an (r x c) matrix
(n = r*c), Hall's theorem factors ANY permutation as

    within-rows  o  within-columns  o  within-rows

turning the gather into three batched one-hot gathers with contraction
widths c, r, c: 4R*n*(2c + r) MACs, ~85x fewer at n = 2^16 and ~340x at
2^20 (ops.gather.routed_gather is the device half).

The routing is computed here on host: the bipartite multigraph with one
edge (source row -> dest row) per element is c-regular, hence (Koenig)
c-edge-colorable; color(e) = the column the element travels through.
Colors come from recursive Euler splitting — walk Euler circuits of each
subgraph assigning alternate edges to the two halves (circuits are even,
the graph being bipartite), halving the degree per level: O(n log c).

Native implementation in csrc/route.c (_route_native); the pure-Python
twin below is its correctness oracle and small-size fallback.
"""
from __future__ import annotations

from typing import Optional, Tuple

import numpy as np

try:
    from curdleproofs_tpu import _route_native as _NAT
except Exception:  # pragma: no cover - built ext is optional
    _NAT = None


def native_available() -> bool:
    return _NAT is not None


def pick_rc(n: int, min_factor: int = 128) -> Tuple[int, int]:
    """Factor n = r*c minimizing MACs ~ (2c + r), with both factors >=
    min_factor (128 so every one-hot tile meets Mosaic's 128-lane block rule
    on real TPUs; tests under the interpreter may pass less). Requires
    n >= min_factor^2 (use the direct gather below that)."""
    if n & (n - 1) or n < min_factor * min_factor:
        raise ValueError("routed gather needs power-of-two n >= min_factor^2")
    best = None
    c = min_factor
    while c * min_factor <= n:
        r = n // c
        if r >= min_factor:
            cost = 2 * c + r
            if best is None or cost < best[0]:
                best = (cost, r, c)
        c *= 2
    assert best is not None
    return best[1], best[2]


def decompose(r: int, c: int, src: np.ndarray):
    """Route W permutations of n = r*c elements.

    src: (W, n) int32, src[w, d] = source position of the element that must
    end at position d.  Returns (idx1 (W, r, c), idx2 (W, c, r),
    idx3 (W, r, c)) int32 with, writing in_w for the source vector:

        s1[w, a, j]  = in_w[a*c + idx1[w, a, j]]     (gather within src rows)
        s2[w, j, a2] = s1[w, idx2[w, j, a2], j]      (gather within columns)
        s3[w, a2, b] = s2[w, idx3[w, a2, b], a2]     (gather within dst rows)

    so that s3[w, a2, b] = in_w[src[w, a2*c + b]].
    """
    n = r * c
    src = np.ascontiguousarray(src, dtype=np.int32).reshape(-1, n)
    W = src.shape[0]
    if _NAT is not None:
        b1, b2, b3 = _NAT.decompose(r, c, src.tobytes())
        idx1 = np.frombuffer(b1, dtype=np.int32).reshape(W, r, c)
        idx2 = np.frombuffer(b2, dtype=np.int32).reshape(W, c, r)
        idx3 = np.frombuffer(b3, dtype=np.int32).reshape(W, r, c)
        return idx1, idx2, idx3
    return decompose_py(r, c, src)


def packed_available(r: int, c: int) -> bool:
    """True when the native solver can emit the '13a'/'13b' transfer wire
    format directly (ops.msm._decode_packed_tables): c <= 256, r <= 512,
    r % 32 == 0 — the production stream-MSM slice shapes."""
    return (
        _NAT is not None
        and hasattr(_NAT, "decompose_packed")
        and c <= 256
        and r <= 512
        and r % 32 == 0
    )


def decompose_packed(r: int, c: int, src: np.ndarray):
    """Route W permutations directly into the packed transfer format.

    Returns (pack, combo (W, r, c) i16, i2lo (W, c, r//2) i16[, i2hi
    (W, c, r//16) i16]) with pack "13b" when r > 256 else "13a" — the
    exact byte layout ops.msm._pack_idx_chunk would build from decompose()
    output, produced in C so neither the three int32 scatter-fill streams
    nor the numpy packing passes run on the Python main thread."""
    n = r * c
    src = np.ascontiguousarray(src, dtype=np.int32).reshape(-1, n)
    W = src.shape[0]
    cb, lob, hib = _NAT.decompose_packed(r, c, src.tobytes())
    combo = np.frombuffer(cb, np.int16).reshape(W, r, c)
    i2lo = np.frombuffer(lob, np.int16).reshape(W, c, r // 2)
    if hib:
        i2hi = np.frombuffer(hib, np.int16).reshape(W, c, r // 16)
        return ("13b", combo, i2lo, i2hi)
    return ("13a", combo, i2lo)


def decompose_py(r: int, c: int, src: np.ndarray):
    """Pure-Python twin of _route_native.decompose (tests / fallback)."""
    n = r * c
    src = np.ascontiguousarray(src, dtype=np.int32).reshape(-1, n)
    W = src.shape[0]
    idx1 = np.empty((W, r, c), np.int32)
    idx2 = np.empty((W, c, r), np.int32)
    idx3 = np.empty((W, r, c), np.int32)
    for w in range(W):
        color = _color_edges_py(r, c, src[w])
        d = np.arange(n)
        row_s, col_s = src[w] // c, src[w] % c
        row_d, col_d = d // c, d % c
        idx1[w, row_s, color] = col_s
        idx2[w, color, row_d] = row_s
        idx3[w, row_d, col_d] = color
    return idx1, idx2, idx3


def _color_edges_py(r: int, c: int, src: np.ndarray) -> np.ndarray:
    """Euler-split edge coloring; color[d] in [0, c), distinct within every
    source row and every dest row."""
    n = r * c
    row_s = src // c
    color = np.zeros(n, np.int32)
    stack = [(np.arange(n, dtype=np.int32), c, 0)]
    while stack:
        grp, k, base = stack.pop()
        if k == 1:
            color[grp] = base
            continue
        bits = _euler_halve_py(r, c, row_s, grp)
        stack.append((grp[bits == 0], k // 2, base))
        stack.append((grp[bits == 1], k // 2, base + k // 2))
    return color


def _euler_halve_py(r, c, row_s, grp):
    m = len(grp)
    head = {}
    nxt = np.empty(2 * m, np.int64)
    eid = np.empty(2 * m, np.int64)
    for i in range(m):
        e = int(grp[i])
        u = int(row_s[e])
        v = r + e // c
        nxt[2 * i] = head.get(u, -1)
        head[u] = 2 * i
        eid[2 * i] = i
        nxt[2 * i + 1] = head.get(v, -1)
        head[v] = 2 * i + 1
        eid[2 * i + 1] = i
    used = np.zeros(m, bool)
    bits = np.zeros(m, np.uint8)
    for i0 in range(m):
        if used[i0]:
            continue
        node = int(row_s[grp[i0]])
        parity = 0
        while True:
            h = head.get(node, -1)
            while h != -1 and used[eid[h]]:
                h = nxt[h]
            head[node] = h
            if h == -1:
                break
            i = int(eid[h])
            used[i] = True
            bits[i] = parity
            parity ^= 1
            e = int(grp[i])
            u = int(row_s[e])
            v = r + e // c
            node = v if node == u else u
    return bits
