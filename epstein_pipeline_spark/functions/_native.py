"""Optional compiled fast path for the signature kernels.

The signature stage is the dedup pipeline's dominant cost and both
kernels are tight integer loops over every byte/feature of the corpus
— exactly the "hand whole batches to native code" case of the
optimization playbook (vectorize the per-task work once the job shape
is right). The C implementations below are BIT-EXACT restatements of
the numpy reference paths in ``functions/minhash.py`` /
``functions/simhash.py`` (property-tested against them); every integer
op is exact (uint64 wraparound, Mersenne fold), so there is no
float-order freedom for the two paths to disagree on.

Build contract: compiled lazily with the system ``gcc`` into a
tmpdir cache keyed by the source hash (one compile per host; every
Spark python worker dlopens the cached .so). Any failure — no
compiler, sandboxed tmp, bad flags — degrades silently to the numpy
path: ``get_lib()`` returns ``None`` and callers fall back. Nothing
outside this module may assume the library exists.
"""

from __future__ import annotations

import ctypes
import hashlib
import os
import subprocess
import tempfile
from pathlib import Path

import numpy as np

_C_SRC = r"""
#include <stdint.h>

static const uint64_t M61 = (((uint64_t)1) << 61) - 1;
static const uint64_t BASE = 1000003ULL;

/* y % (2^61-1) via the Mersenne fold — bit-identical to
   functions/minhash._fold61 for every uint64. */
static inline uint64_t fold61(uint64_t y) {
    uint64_t f = y >> 61;
    y = (y & M61) + f;
    if (y >= M61) y -= M61;
    return y;
}

/* MinHash signatures over char-k byte shingles of utf-8 text.

   data: concatenated utf-8 bytes of all docs in the batch
   offs: n_docs+1 byte offsets into data
   pa/pb: num_perm universal-hash params (a*h+b mod 2^61-1)
   out:  n_docs x num_perm int64 signatures (row-major)

   Exactness contract vs the numpy path (minhash.py):
   - shingle hash = Horner polynomial over bytes mod 2^64, then the
     murmur-style xorshift mix; the rolling update (subtract top term,
     shift, add next byte) is exact in the mod-2^64 ring.
   - duplicate shingles are NOT deduped here: min over a multiset
     equals min over its support, so np.unique in the numpy path is
     set semantics only and cannot change the signature.
   - n < k: one shingle of the whole text (numpy: k = n).
   - n == 0: every slot = empty_slot. */
void minhash_batch(const uint8_t* data, const int64_t* offs, int64_t n_docs,
                   int64_t k, const uint64_t* pa, const uint64_t* pb,
                   int64_t num_perm, uint64_t empty_slot, int64_t* out)
{
    for (int64_t d = 0; d < n_docs; d++) {
        const uint8_t* b = data + offs[d];
        int64_t n = offs[d + 1] - offs[d];
        uint64_t* o = (uint64_t*)(out + d * num_perm);
        if (n == 0) {
            for (int64_t j = 0; j < num_perm; j++) o[j] = empty_slot;
            continue;
        }
        int64_t kk = k < n ? k : n;
        uint64_t top = 1;  /* BASE^(kk-1) mod 2^64 */
        for (int64_t j = 0; j < kk - 1; j++) top *= BASE;
        for (int64_t j = 0; j < num_perm; j++) o[j] = UINT64_MAX;
        uint64_t h = 0;
        for (int64_t j = 0; j < kk; j++) h = h * BASE + b[j];
        for (int64_t i = 0; ; i++) {
            uint64_t x = h;
            x ^= x >> 33; x *= 0xFF51AFD7ED558CCDULL; x ^= x >> 33;
            x = fold61(x);
            for (int64_t j = 0; j < num_perm; j++) {
                uint64_t y = pa[j] * x + pb[j];
                y = fold61(y);
                if (y < o[j]) o[j] = y;
            }
            if (i + kk >= n) break;
            h = (h - b[i] * top) * BASE + b[i + kk];
        }
    }
}

/* SimHash bit accumulation over (feature-hash, integer-weight) rows.

   hs/ws: concatenated per-doc feature hashes and fixed-point weights
   offs:  n_docs+1 offsets into hs/ws
   out:   n_docs int64 signatures

   acc[j] = sum over features of (bit j of hash ? +w : -w), exact
   int64 arithmetic (order-independent by construction); bit j of the
   signature is set iff acc[j] > 0. Empty feature range -> 0. */
void simhash_batch(const uint64_t* hs, const int64_t* ws, const int64_t* offs,
                   int64_t n_docs, int64_t* out)
{
    for (int64_t d = 0; d < n_docs; d++) {
        int64_t acc[64];
        for (int j = 0; j < 64; j++) acc[j] = 0;
        for (int64_t f = offs[d]; f < offs[d + 1]; f++) {
            uint64_t h = hs[f];
            int64_t w = ws[f];
            for (int j = 0; j < 64; j++) {
                /* bit ? +w : -w, branchless */
                int64_t m = (int64_t)((h >> j) & 1) - 1;
                acc[j] += (w ^ m) - m;
            }
        }
        uint64_t sim = 0;
        for (int j = 0; j < 64; j++)
            if (acc[j] > 0) sim |= ((uint64_t)1) << j;
        out[d] = (int64_t)sim;
    }
}
"""

_LIB = None
_TRIED = False


def get_lib():
    """Compile-once, dlopen-cached handle to the kernel library, or
    ``None`` when native compilation is unavailable (callers must fall
    back to the numpy paths)."""
    global _LIB, _TRIED
    if _TRIED:
        return _LIB
    _TRIED = True
    try:
        key = hashlib.sha256(_C_SRC.encode()).hexdigest()[:16]
        d = Path(tempfile.gettempdir()) / f"eps-native-{key}"
        so = d / "libepsnative.so"
        if not so.exists():
            d.mkdir(parents=True, exist_ok=True)
            import fcntl

            with open(d / ".lock", "w") as lk:
                fcntl.flock(lk, fcntl.LOCK_EX)
                if not so.exists():
                    csrc = d / "epsnative.c"
                    csrc.write_text(_C_SRC)
                    tmp = d / f".build-{os.getpid()}.so"
                    subprocess.run(
                        ["gcc", "-O3", "-march=native", "-shared", "-fPIC",
                         "-o", str(tmp), str(csrc)],
                        check=True, capture_output=True, timeout=120,
                    )
                    os.replace(tmp, so)
        lib = ctypes.CDLL(str(so))
        u8p = ctypes.POINTER(ctypes.c_uint8)
        i64p = ctypes.POINTER(ctypes.c_int64)
        u64p = ctypes.POINTER(ctypes.c_uint64)
        lib.minhash_batch.argtypes = [
            u8p, i64p, ctypes.c_int64, ctypes.c_int64, u64p, u64p,
            ctypes.c_int64, ctypes.c_uint64, i64p,
        ]
        lib.minhash_batch.restype = None
        lib.simhash_batch.argtypes = [u64p, i64p, i64p, ctypes.c_int64, i64p]
        lib.simhash_batch.restype = None
        _LIB = lib
    except Exception:
        _LIB = None
    return _LIB


def _as_ptr(arr: np.ndarray, ctype):
    return arr.ctypes.data_as(ctypes.POINTER(ctype))


def minhash_batch(enc: list[bytes], k: int, a: np.ndarray, b: np.ndarray,
                  empty_slot: int) -> np.ndarray | None:
    """(n_docs, num_perm) int64 signatures for a batch of utf-8 encoded
    docs, or None when the native library is unavailable."""
    lib = get_lib()
    if lib is None:
        return None
    n = len(enc)
    num_perm = a.shape[0]
    data = b"".join(enc)
    offs = np.zeros(n + 1, dtype=np.int64)
    np.cumsum(np.fromiter((len(e) for e in enc), np.int64, n), out=offs[1:])
    buf = np.frombuffer(data, dtype=np.uint8) if data else np.empty(0, np.uint8)
    out = np.empty((n, num_perm), dtype=np.int64)
    lib.minhash_batch(
        _as_ptr(buf, ctypes.c_uint8), _as_ptr(offs, ctypes.c_int64),
        n, k, _as_ptr(a, ctypes.c_uint64), _as_ptr(b, ctypes.c_uint64),
        num_perm, ctypes.c_uint64(empty_slot), _as_ptr(out, ctypes.c_int64),
    )
    return out


def simhash_batch(hs: np.ndarray, ws: np.ndarray, offs: np.ndarray) -> np.ndarray | None:
    """int64 SimHash per doc from concatenated (hash, weight) feature
    rows, or None when the native library is unavailable."""
    lib = get_lib()
    if lib is None:
        return None
    n = offs.shape[0] - 1
    out = np.empty(n, dtype=np.int64)
    if hs.shape[0] == 0:
        hs = np.empty(1, np.uint64)
        ws = np.empty(1, np.int64)
    lib.simhash_batch(
        _as_ptr(hs, ctypes.c_uint64), _as_ptr(ws, ctypes.c_int64),
        _as_ptr(offs, ctypes.c_int64), n, _as_ptr(out, ctypes.c_int64),
    )
    return out
