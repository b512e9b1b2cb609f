"""Deterministic result-set checksum for golden pins.

Mirrors the shape of the driver's value-hash compare: columns sorted
by name, rows sorted as formatted lines, floats at fixed precision
(6 dp — every pinned query rounds its scores to <= 4 dp upstream, so
this adds headroom, not truncation)."""

from __future__ import annotations

import hashlib

from pyspark.sql import DataFrame


def _fmt(v) -> str:
    if isinstance(v, float):
        return f"{v:.6f}"
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(_fmt(x) for x in v) + "]"
    return str(v)


def result_checksum(df: DataFrame) -> str:
    cols = sorted(df.columns)
    rows = df.select(*cols).collect()
    lines = sorted("|".join(_fmt(v) for v in row) for row in rows)
    return hashlib.sha256("\n".join(lines).encode()).hexdigest()
