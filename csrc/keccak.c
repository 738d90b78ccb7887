/* Native Keccak-f[1600] permutation for the STROBE/Merlin transcript layer.
 *
 * CPython C-API extension (no pybind11 dependency). Exposes one function:
 *   keccak_f1600(state: bytes[200]) -> bytes[200]
 * Bit-exact with curdleproofs_tpu/transcript/keccak.py (the portable
 * fallback); ~100x faster, which matters because Fiat-Shamir challenge
 * generation is the only sequential host hot path in the prover/verifier.
 */
#define PY_SSIZE_T_CLEAN
#include <Python.h>
#include <stdint.h>
#include <string.h>

#define ROTL64(x, n) (((x) << (n)) | ((x) >> (64 - (n))))

static const uint64_t RC[24] = {
    0x0000000000000001ULL, 0x0000000000008082ULL, 0x800000000000808aULL,
    0x8000000080008000ULL, 0x000000000000808bULL, 0x0000000080000001ULL,
    0x8000000080008081ULL, 0x8000000000008009ULL, 0x000000000000008aULL,
    0x0000000000000088ULL, 0x0000000080008009ULL, 0x000000008000000aULL,
    0x000000008000808bULL, 0x800000000000008bULL, 0x8000000000008089ULL,
    0x8000000000008003ULL, 0x8000000000008002ULL, 0x8000000000000080ULL,
    0x000000000000800aULL, 0x800000008000000aULL, 0x8000000080008081ULL,
    0x8000000000008080ULL, 0x0000000080000001ULL, 0x8000000080008008ULL};

/* rho rotation offsets and pi lane sources for the flat i = x + 5y layout */
static const int RHO[25] = {0,  1,  62, 28, 27, 36, 44, 6,  55, 20, 3,  10, 43,
                            25, 39, 41, 45, 15, 21, 8,  18, 2,  61, 56, 14};

static void keccakf(uint64_t a[25]) {
  uint64_t b[25], c[5], d[5];
  for (int round = 0; round < 24; round++) {
    /* theta */
    for (int x = 0; x < 5; x++)
      c[x] = a[x] ^ a[x + 5] ^ a[x + 10] ^ a[x + 15] ^ a[x + 20];
    for (int x = 0; x < 5; x++)
      d[x] = c[(x + 4) % 5] ^ ROTL64(c[(x + 1) % 5], 1);
    for (int i = 0; i < 25; i++) a[i] ^= d[i % 5];
    /* rho + pi: B[y][(2x+3y)%5] = rot(A[x][y]) */
    for (int x = 0; x < 5; x++)
      for (int y = 0; y < 5; y++) {
        int src = x + 5 * y;
        int dst = y + 5 * ((2 * x + 3 * y) % 5);
        int r = RHO[5 * y + x];
        b[dst] = r ? ROTL64(a[src], r) : a[src];
      }
    /* chi */
    for (int y = 0; y < 5; y++)
      for (int x = 0; x < 5; x++)
        a[x + 5 * y] =
            b[x + 5 * y] ^ ((~b[(x + 1) % 5 + 5 * y]) & b[(x + 2) % 5 + 5 * y]);
    /* iota */
    a[0] ^= RC[round];
  }
}

static PyObject *py_keccak_f1600(PyObject *self, PyObject *arg) {
  Py_buffer view;
  if (PyObject_GetBuffer(arg, &view, PyBUF_SIMPLE) < 0) return NULL;
  if (view.len != 200) {
    PyBuffer_Release(&view);
    PyErr_SetString(PyExc_ValueError, "state must be exactly 200 bytes");
    return NULL;
  }
  uint64_t lanes[25];
  memcpy(lanes, view.buf, 200); /* little-endian hosts only (x86/arm64) */
  PyBuffer_Release(&view);
  keccakf(lanes);
  return PyBytes_FromStringAndSize((const char *)lanes, 200);
}

static PyMethodDef Methods[] = {
    {"keccak_f1600", py_keccak_f1600, METH_O,
     "Apply Keccak-f[1600] to a 200-byte state."},
    {NULL, NULL, 0, NULL}};

static struct PyModuleDef moduledef = {PyModuleDef_HEAD_INIT,
                                       "_keccak_native",
                                       "Native Keccak-f[1600] permutation.",
                                       -1,
                                       Methods,
                                       NULL,
                                       NULL,
                                       NULL,
                                       NULL};

PyMODINIT_FUNC PyInit__keccak_native(void) {
  return PyModule_Create(&moduledef);
}
