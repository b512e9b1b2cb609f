"""Co-occurrence knowledge-graph edges (SURVEY.md A5, S12).

Reference: processors/knowledge_graph.py:91-123,373-388 — weighted
undirected edges keyed (min(src,dst), max(src,dst), type), weights
accumulated with a Counter, exported sorted by weight.

Spark restatement: explode person-id arrays per document, self-join
within the document, canonicalize endpoint order, groupBy-sum — a
map-side-combinable aggregation.
"""

from __future__ import annotations

import json
from xml.sax.saxutils import escape

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def cooccurrence_edges(
    docs: DataFrame, id_col: str = "id", list_col: str = "personIds", edge_type: str = "co_occurrence"
) -> DataFrame:
    """(src, dst, type, weight) with src < dst; weight = number of
    documents where both appear."""
    m = docs.select(F.col(id_col).alias("_doc"), F.explode(list_col).alias("pid")).distinct()
    a, b = m.alias("a"), m.alias("b")
    return (
        a.join(b, "_doc")
        .filter(F.col("a.pid") < F.col("b.pid"))
        .groupBy(F.col("a.pid").alias("src"), F.col("b.pid").alias("dst"))
        .agg(F.count("*").alias("weight"))
        .withColumn("type", F.lit(edge_type))
        .select("src", "dst", "type", "weight")
    )


def top_edges(edges: DataFrame, k: int = 50) -> DataFrame:
    """O2: edges sorted by weight desc (knowledge_graph.py:388)."""
    return edges.orderBy(F.desc("weight"), "src", "dst").limit(k)


def to_d3_json(edges: DataFrame, max_edges: int = 10_000) -> str:
    """Driver-side D3 export of a (small, final) graph — mirrors
    knowledge_graph.py:447-477. Collect is bounded by max_edges."""
    rows = edges.orderBy(F.desc("weight"), "src", "dst").limit(max_edges).collect()
    nodes = sorted({r["src"] for r in rows} | {r["dst"] for r in rows})
    return json.dumps(
        {
            "nodes": [{"id": n} for n in nodes],
            "links": [
                {"source": r["src"], "target": r["dst"], "type": r["type"], "weight": r["weight"]}
                for r in rows
            ],
        }
    )


def to_gexf(edges: DataFrame, max_edges: int = 10_000) -> str:
    """Minimal GEXF serializer (mirrors knowledge_graph.py:399-446)."""
    rows = edges.orderBy(F.desc("weight"), "src", "dst").limit(max_edges).collect()
    nodes = sorted({r["src"] for r in rows} | {r["dst"] for r in rows})
    out = ['<?xml version="1.0" encoding="UTF-8"?>']
    out.append('<gexf xmlns="http://gexf.net/1.3" version="1.3">')
    out.append('<graph defaultedgetype="undirected">')
    out.append("<nodes>")
    out.extend(f'<node id="{escape(n)}" label="{escape(n)}"/>' for n in nodes)
    out.append("</nodes><edges>")
    for i, r in enumerate(rows):
        out.append(
            f'<edge id="{i}" source="{escape(r["src"])}" target="{escape(r["dst"])}" weight="{r["weight"]}"/>'
        )
    out.append("</edges></graph></gexf>")
    return "".join(out)
