"""Text chunking (SURVEY.md F5/W4).

Reference: processors/chunker.py:104-360 — split documents into
overlapping chunks targeting a token budget, respecting paragraph
boundaries where possible, with sequential chunk_index and char
offsets; OCR noise cleaned first (chunker.py:26-29,381-388).

Spark surface: a vectorized pandas UDF returning
array<struct<chunk_index int, char_start int, char_end int,
chunk_text string>> + posexplode — the UDTF-shaped flatMap.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

CHUNK_SCHEMA = T.ArrayType(
    T.StructType(
        [
            T.StructField("chunk_index", T.IntegerType()),
            T.StructField("char_start", T.IntegerType()),
            T.StructField("char_end", T.IntegerType()),
            T.StructField("chunk_text", T.StringType()),
        ]
    )
)


def py_chunk(text: str, target_chars: int = 2000, overlap: int = 200) -> list[tuple[int, int, int, str]]:
    """Paragraph-respecting fixed-budget chunker: greedy paragraph
    packing up to target_chars; paragraphs longer than the budget are
    hard-split with ``overlap`` chars of context carry-over."""
    if not text:
        return []
    chunks: list[tuple[int, int, int, str]] = []
    pos = 0
    idx = 0
    paras: list[tuple[int, str]] = []
    for p in text.split("\n\n"):
        paras.append((pos, p))
        pos += len(p) + 2
    buf_start, buf = None, []

    def flush():
        nonlocal idx, buf_start, buf
        if buf:
            joined = "\n\n".join(buf)
            chunks.append((idx, buf_start, buf_start + len(joined), joined))
            idx += 1
            buf_start, buf = None, []

    for start, p in paras:
        if len(p) > target_chars:
            flush()
            s = 0
            while s < len(p):
                piece = p[max(0, s - overlap if s else 0) : s + target_chars]
                a = start + (s - overlap if s else s)
                a = max(start, a)
                chunks.append((idx, a, a + len(piece), piece))
                idx += 1
                s += target_chars
            continue
        if buf and sum(len(x) for x in buf) + len(p) > target_chars:
            flush()
        if not buf:
            buf_start = start
        buf.append(p)
    flush()
    return chunks


def make_chunk_udf(target_chars: int = 2000, overlap: int = 200):
    @F.pandas_udf(CHUNK_SCHEMA)
    def chunk_udf(texts: pd.Series) -> pd.Series:
        return pd.Series([py_chunk(t or "", target_chars, overlap) for t in texts])

    return chunk_udf


def chunk_documents(
    docs: DataFrame, id_col: str = "url", text_col: str = "text", target_chars: int = 2000
) -> DataFrame:
    """(url, chunk_index, char_start, char_end, chunk_text) — one row
    per chunk (reference DocumentChunk, chunker.py:44-57)."""
    udf = make_chunk_udf(target_chars)
    return (
        docs.select(F.col(id_col).alias("url"), udf(F.col(text_col)).alias("_chunks"))
        .select("url", F.explode("_chunks").alias("c"))
        .select("url", "c.chunk_index", "c.char_start", "c.char_end", "c.chunk_text")
    )
