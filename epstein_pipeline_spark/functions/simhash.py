"""64-bit SimHash + Hamming-ball banding.

Replaces the reference's O(n^2) semantic cosine pass
(/root/reference/src/epstein_pipeline/processors/dedup.py:404-464) with
the scalable near-exact scheme from the north rule: 64-bit SimHash over
token features, 4x16-bit band equi-join (pigeonhole: any pair with
Hamming distance <= 3 shares at least one of 4 bands), then exact
``bit_count(s1 ^ s2) <= d`` verification JVM-side.

The signature is a pandas UDF with all inner math vectorized in numpy:
token feature hashes come from a batch-level vocabulary cache (web text
has high token reuse), bit contributions via ``np.unpackbits`` and one
matrix-vector product per document.

Feature weights are log1p-damped counts: raw counts let the shared
stopword mass dominate the bit sums and unrelated pages collapse into
the Hamming ball (the published SimHash deployments weight features by
idf for the same reason — log-damping needs no corpus pass and gives
the same head-suppression).
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql import types as T


def _token_hash(token: str) -> int:
    """Deterministic 64-bit token hash (blake2b, process-independent)."""
    return int.from_bytes(hashlib.blake2b(token.encode("utf-8"), digest_size=8).digest(), "little")


def py_simhash(text: str, ngram: int = 2) -> int:
    """Pure-Python SimHash oracle (signed int64) for tests."""
    tokens = text.split()
    feats: dict[str, int] = {}
    for i, t in enumerate(tokens):
        feats[t] = feats.get(t, 0) + 1
        if ngram >= 2 and i + 1 < len(tokens):
            bg = t + " " + tokens[i + 1]
            feats[bg] = feats.get(bg, 0) + 1
    if not feats:
        return 0
    acc = np.zeros(64, dtype=np.float64)
    for tok, w in feats.items():
        h = _token_hash(tok)
        bits = np.unpackbits(np.frombuffer(np.uint64(h).tobytes(), dtype=np.uint8), bitorder="little")
        acc += (2 * bits.astype(np.float64) - 1) * np.log1p(w)
    sim = 0
    for j in range(64):
        if acc[j] > 0:
            sim |= 1 << j
    return np.int64(np.uint64(sim)).item()


def make_simhash_udf(ngram: int = 2):
    """pandas UDF: normalized text -> 64-bit SimHash as LongType.

    Vectorization strategy: build a per-batch vocab of feature hashes
    once (dict lookups amortize across the batch), then per document a
    single (n_feats, 64) unpackbits matrix x weight vector product.
    """

    @F.pandas_udf(T.LongType())
    def simhash_sig(texts: pd.Series) -> pd.Series:
        vocab: dict[str, np.uint64] = {}

        def feat_hashes(feats: dict[str, int]) -> tuple[np.ndarray, np.ndarray]:
            hs = np.empty(len(feats), dtype=np.uint64)
            ws = np.empty(len(feats), dtype=np.float64)
            for idx, (tok, w) in enumerate(feats.items()):
                h = vocab.get(tok)
                if h is None:
                    h = np.uint64(_token_hash(tok))
                    vocab[tok] = h
                hs[idx] = h
                ws[idx] = w
            return hs, ws

        out = np.zeros(len(texts), dtype=np.int64)
        for row, t in enumerate(texts):
            if not t:
                continue
            tokens = t.split()
            feats: dict[str, int] = {}
            for i, tok in enumerate(tokens):
                feats[tok] = feats.get(tok, 0) + 1
                if ngram >= 2 and i + 1 < len(tokens):
                    bg = tok + " " + tokens[i + 1]
                    feats[bg] = feats.get(bg, 0) + 1
            if not feats:
                continue
            hs, ws = feat_hashes(feats)
            bits = np.unpackbits(hs.view(np.uint8).reshape(-1, 8), axis=1, bitorder="little")
            acc = np.log1p(ws) @ (2.0 * bits - 1.0)
            sim = np.uint64(0)
            one = np.uint64(1)
            for j in np.nonzero(acc > 0)[0]:
                sim |= one << np.uint64(j)
            out[row] = np.int64(sim)
        return pd.Series(out)

    return simhash_sig


def simhash_bands_expr(sim_col: Column | str, bands: int = 4, bits: int = 64) -> Column:
    """array<long> of band values: band i = bits [i*w, (i+1)*w) of the
    signature, extracted JVM-side with shiftrightunsigned + mask."""
    c = F.col(sim_col) if isinstance(sim_col, str) else sim_col
    width = bits // bands
    mask = (1 << width) - 1
    return F.array(
        *[F.shiftrightunsigned(c, i * width).bitwiseAND(F.lit(mask)) for i in range(bands)]
    )


def hamming_distance_expr(s1: Column, s2: Column) -> Column:
    """bit_count(s1 XOR s2) — JVM-side popcount."""
    return F.bit_count(s1.bitwiseXOR(s2))
