"""Connected components via alternating large-star / small-star.

The scalable replacement for the reference's in-memory path-halving
union-find (processors/dedup.py:183-206). Algorithm: Kiveris et al.,
"Connected Components in MapReduce and Beyond" (SOCC'14) — public
literature; converges in O(log n) rounds:

    large-star: per node u, m = min(N(u) ∪ {u});
                emit (v, m) for every neighbor v > u
    small-star: per node u over downward edges (v < u),
                m = min(N-(u) ∪ {u}); emit (v, m) for v in N-(u) ∪ {u}

Iterate until the edge multiset is stable; the fixpoint is a forest of
stars (u -> component root, root = min node id). Node ids are the url
strings themselves — no global id assignment pass, and lexicographic
order is a total order, so "min" is deterministic.

Driver-loop notes (SURVEY.md §4): Catalyst cannot express iteration,
so this is a driver loop with ``localCheckpoint`` every
``checkpoint_every`` rounds to cut lineage; convergence is detected
with a (count, xor-of-hashes) edge-set digest, one tiny aggregate per
round. AQE's skew-join splitting handles the high-degree root of a
mega-cluster.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


def _salted_join(
    adj: DataFrame, m: DataFrame, salt: int, hot_min: int = 500_000
) -> DataFrame:
    """adj(src, dst) ⋈ m(src, m, deg) with DIFFERENTIATED hot-key
    salting.

    A mega-cluster root is a single src key carrying the whole
    component's adjacency — one shuffle partition does all its work.
    Only keys with ``deg >= hot_min`` get salted: their adj rows split
    by hash(dst) into ``salt`` sub-keys and ONLY their (src, m) rows
    replicate across them; everything else joins on sub-key 0
    unchanged. Blanket salting (replicate the whole m side x salt) was
    measured 1.6x SLOWER at 4.5M edges (scripts/measure_cc_salting.py)
    because the replication overhead scales with node count — the
    differentiated form scales it with the number of hubs, which is
    what a 10^12-page corpus with host-domain skew actually has. Hot
    keys are tagged via a broadcast of the (few) hub ids; min()/count()
    partial-aggregate map-side, so computing ``deg`` is free. AQE
    skew-join remains the runtime backstop for skew under hot_min.
    """
    if salt <= 1:
        return adj.join(m.select("src", "m"), "src")
    # m feeds TWO consumers below (hot-key broadcast + replication)
    # — without a checkpoint the groupBy aggregation behind it would
    # run once per consumer per round
    m = m.localCheckpoint(eager=False)
    hot_keys = m.filter(F.col("deg") >= F.lit(hot_min)).select("src")
    tagged = adj.join(
        F.broadcast(hot_keys.withColumn("_hot", F.lit(True))), "src", "left"
    )
    salted = tagged.withColumn(
        "_salt",
        F.when(F.col("_hot"), F.pmod(F.xxhash64("dst"), F.lit(salt)))
        .otherwise(F.lit(0))
        .cast("int"),
    ).drop("_hot")
    replicated = m.select(
        "src",
        "m",
        F.explode(
            F.when(
                F.col("deg") >= F.lit(hot_min),
                F.sequence(F.lit(0), F.lit(salt - 1)),
            ).otherwise(F.array(F.lit(0)))
        ).alias("_salt"),
    )
    return salted.join(replicated, ["src", "_salt"]).drop("_salt")


def _large_star(edges: DataFrame, salt: int = 1, hot_min: int = 500_000) -> DataFrame:
    """edges: (src, dst) symmetric. Emit (v, m) for v > u."""
    sym = edges.select("src", "dst").union(
        edges.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    )
    m = sym.groupBy("src").agg(
        F.least(F.min("dst"), F.first("src")).alias("m"),
        F.count(F.lit(1)).alias("deg"),
    )
    return (
        _salted_join(sym, m, salt, hot_min)
        .filter(F.col("dst") > F.col("src"))
        .select(F.col("dst").alias("src"), F.col("m").alias("dst"))
        .filter(F.col("src") != F.col("dst"))
        .distinct()
    )


def _small_star(edges: DataFrame, salt: int = 1, hot_min: int = 500_000) -> DataFrame:
    """edges oriented (src > dst). Emit (v, m) for v in N-(u) ∪ {u}."""
    down = edges.select(
        F.greatest("src", "dst").alias("src"), F.least("src", "dst").alias("dst")
    ).filter(F.col("src") != F.col("dst"))
    m = down.groupBy("src").agg(
        F.min("dst").alias("m"), F.count(F.lit(1)).alias("deg")
    )
    j = _salted_join(down, m, salt, hot_min)
    to_nbrs = j.select(F.col("dst").alias("src"), F.col("m").alias("dst"))
    to_self = j.select("src", F.col("m").alias("dst")).distinct()
    return (
        to_nbrs.union(to_self)
        .filter(F.col("src") != F.col("dst"))
        .distinct()
    )


def _digest(edges: DataFrame) -> tuple[int, int]:
    row = edges.agg(
        F.count("*").alias("n"),
        F.coalesce(F.expr("bit_xor(xxhash64(src, dst))"), F.lit(0)).alias("h"),
    ).collect()[0]
    return int(row["n"]), int(row["h"])


def connected_components(
    pairs: DataFrame,
    nodes: DataFrame | None = None,
    max_iters: int = 50,
    checkpoint_every: int = 3,
    loop_shuffle_partitions: int | None = None,
    salt_buckets: int = 1,
    salt_hot_degree: int = 500_000,
    local_max_edges: int = 1_000_000,
) -> DataFrame:
    """Label pairs' transitive closure: returns (url, cluster_id) where
    cluster_id = min url in the component.

    ``pairs`` needs columns url1/url2. If ``nodes`` (one column url) is
    given, they are UNIONED with the edge endpoints (full outer):
    nodes without any edge get cluster_id = their own url, and
    endpoints outside ``nodes`` keep their labels.
    ``salt_buckets > 1`` salts the star joins' hot root keys with
    degree >= ``salt_hot_degree`` (host-domain / mega-cluster skew —
    see ``_salted_join``; cold keys join unsalted).

    SIZE-GATED HYBRID (the broadcast-join pattern applied to CC): an
    edge list at or under ``local_max_edges`` rows is collected and
    labeled by the reference's own path-halving union-find
    (dedup.py:183-206) in one pass — the distributed loop's 4-6 s of
    per-round job-scheduling floors (O(log n) rounds x several
    shuffles each) dwarf the actual work on small graphs, and those
    floors do not shrink with executors. Driver cost of the probe is
    Arrow-columnar (~120 MB at the 1M default with ~60-char urls, no
    per-row Python objects), and the Python tuple list (~400 MB-class)
    is built only when the local path runs; a 10^12-page corpus is far
    past the gate and runs the star loop. ``local_max_edges=0`` forces
    the distributed path.

    The edge list is orders of magnitude smaller than the corpus, so
    the loop runs at ``loop_shuffle_partitions`` (task-launch latency
    dominates tiny shuffles otherwise); the session setting is
    restored afterwards. On a real cluster size this to
    edges_bytes / 64MB.
    """
    spark = pairs.sparkSession
    if local_max_edges > 0:
        # ONE execution answers both the size gate and (when small)
        # supplies the edges — a separate limit+count followed by a
        # collect would run an un-materialized upstream plan twice,
        # doubling exactly the cost the gate exists to avoid. The
        # collect goes through Arrow (columnar, no per-row Row
        # objects): a 1M-edge probe of two ~60-char urls is ~120 MB of
        # Arrow buffers, freed immediately when the gate rejects —
        # Python string/tuple objects are only built when the local
        # path actually runs (where union-find needs them anyway).
        # NULL endpoints and self-loops are dropped here like the star
        # loop's `src != dst` filter always did (a NULL id would
        # TypeError inside python union-find's `<` compare).
        tbl = (
            pairs.select("url1", "url2")
            .filter(F.col("url1").isNotNull() & F.col("url2").isNotNull())
            .filter(F.col("url1") != F.col("url2"))
            .limit(local_max_edges + 1)
            .toArrow()
        )
        if tbl.num_rows <= local_max_edges:
            edge_list = list(
                zip(tbl.column("url1").to_pylist(), tbl.column("url2").to_pylist())
            )
            return _cc_local_rows(pairs, edge_list, nodes)
        del tbl
    old_sp = spark.conf.get("spark.sql.shuffle.partitions")
    if loop_shuffle_partitions is None:
        # tiny-loop default: a handful of tasks per core — at 32+
        # partitions the per-round task-launch latency dominates the
        # (small) edge shuffles and the loop becomes a fixed driver
        # floor that never scales with cores
        loop_shuffle_partitions = max(8, 2 * spark.sparkContext.defaultParallelism)
    spark.conf.set("spark.sql.shuffle.partitions", str(loop_shuffle_partitions))
    try:
        return _cc_loop(
            pairs, nodes, max_iters, checkpoint_every, salt_buckets, salt_hot_degree
        )
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", old_sp)


def _cc_local_rows(
    pairs: DataFrame, edge_list: list[tuple], nodes: DataFrame | None
) -> DataFrame:
    """Driver-side union-find for gate-sized edge lists (edges already
    collected by the size gate — one plan execution total). Labels are
    IDENTICAL to the star loop's (min-id roots; `<` on the id type —
    Python string compare and Spark's UTF8 binary compare agree)."""
    spark = pairs.sparkSession
    labels = py_union_find(edge_list)
    dt = pairs.schema["url1"].dataType
    schema = T.StructType(
        [T.StructField("url", dt), T.StructField("cluster_id", dt)]
    )
    # ship the label table to the JVM as Arrow columns, not a python
    # tuple list: createDataFrame over per-row tuples pickles every row
    # driver-side (measured 4.2 s vs 1.2 s for 128k labels) and that
    # cost is serial at EVERY parallelism level — pure fixed floor
    import pyarrow as pa

    tbl = pa.table(
        {
            "url": pa.array(list(labels.keys())),
            "cluster_id": pa.array(list(labels.values())),
        }
    )
    out = spark.createDataFrame(tbl, schema=schema)
    if nodes is not None:
        # FULL outer: nodes ADD singletons, they never restrict the
        # edge-endpoint label set (incremental CC seeds label nodes
        # that are not in the delta node list)
        out = (
            nodes.select(F.col(nodes.columns[0]).alias("url"))
            .distinct()
            .join(out, "url", "full_outer")
            .select("url", F.coalesce("cluster_id", "url").alias("cluster_id"))
        )
    return out


def _cc_loop(
    pairs: DataFrame,
    nodes: DataFrame | None,
    max_iters: int,
    checkpoint_every: int,
    salt_buckets: int = 1,
    salt_hot_degree: int = 500_000,
) -> DataFrame:
    edges = pairs.select(F.col("url1").alias("src"), F.col("url2").alias("dst")).filter(
        F.col("src") != F.col("dst")
    ).distinct()

    prev = None
    for it in range(max_iters):
        edges = _small_star(
            _large_star(edges, salt_buckets, salt_hot_degree),
            salt_buckets,
            salt_hot_degree,
        )
        # LAZY localCheckpoint: the digest action right below both
        # materializes the checkpoint and computes the convergence
        # digest in ONE job per round (eager=True would run a separate
        # materialization job first — doubling the loop's fixed
        # per-round job-scheduling cost, which does not shrink with
        # more cores)
        edges = edges.localCheckpoint(eager=False)
        cur = _digest(edges)
        if cur == prev:
            break
        prev = cur

    labels = edges.select(F.col("src").alias("url"), F.col("dst").alias("cluster_id"))
    # roots appear only as dst; give them self-labels
    roots = edges.select(F.col("dst").alias("url")).distinct().withColumn(
        "cluster_id", F.col("url")
    )
    labels = labels.union(roots).groupBy("url").agg(F.min("cluster_id").alias("cluster_id"))

    if nodes is not None:
        # FULL outer, same contract as _cc_local_rows: nodes add singletons
        labels = (
            nodes.select(F.col(nodes.columns[0]).alias("url"))
            .distinct()
            .join(labels, "url", "full_outer")
            .select("url", F.coalesce("cluster_id", "url").alias("cluster_id"))
        )
    return labels


def py_union_find(pairs: list[tuple[str, str]]) -> dict[str, str]:
    """Path-halving union-find oracle — reference-equivalent semantics
    (processors/dedup.py:183-206) with min-id roots, used in tests to
    check the distributed labels exactly."""
    parent: dict[str, str] = {}

    def find(x: str) -> str:
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in pairs:
        ra, rb = find(a), find(b)
        if ra != rb:
            lo, hi = (ra, rb) if ra < rb else (rb, ra)
            parent[hi] = lo
    return {x: find(x) for x in parent}
