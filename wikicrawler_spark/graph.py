"""Link-graph analytics over the crawl's edge table.

The reference stubs its graph module (SURVEY §2.4 T13 — `oracle.py` keeps
history stacks but never materializes a graph); the engine's crawl already
emits an edges DataFrame (`extract_job.links_of`). This module adds the
iterative layer on top: PageRank as a driver-orchestrated power iteration
where every per-iteration quantity (out-degree contributions, dangling
mass, teleport) lives INSIDE the plan — zero per-iteration driver
actions, so a 1000-executor run has no serial section.

Scale design:
  * one `count()` up front (scalar), then `iterations` rounds of
    join + groupBy-sum — each round is ONE shuffle on dst plus a broadcast
    of the 1-row dangling-mass aggregate;
  * `localCheckpoint(eager=True)` every `checkpoint_every` rounds truncates
    the growing lineage (the classic iterative-algorithm failure mode:
    un-truncated plans re-execute the whole history per action and
    eventually blow the optimizer); production swaps this for a
    checkpoint dir / Iceberg table per SURVEY S11;
  * ranks stay double; the power iteration is a contraction (damping
    0.85), so cross-engine float-order differences stay ~1e-15 and the
    round-6 output is engine-stable — verified against an unrolled-CTE
    DuckDB replay of the identical expression shape.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def pagerank(edges: DataFrame, *, iterations: int = 6, damping: float = 0.85,
             src_col: str = "src", dst_col: str = "dst",
             checkpoint_every: int = 1, checkpoint_eager: bool = True) -> DataFrame:
    """Standard PageRank with uniform teleport and dangling-mass
    redistribution. ``edges`` is a directed (src, dst) DataFrame (dedupe
    parallel edges upstream if each should count once). Returns
    (node, rank) with rank rounded to 6."""
    src = F.col(src_col)
    dst = F.col(dst_col)
    e = edges.select(src.alias("src"), dst.alias("dst"))
    if checkpoint_every:
        # every iteration re-reads edges/nodes/deg: materialize them ONCE
        # (localCheckpoint here; a checkpoint dir / Iceberg table on a real
        # cluster) instead of recomputing the upstream plan 2*iterations
        # times down the dangling + contribution subtrees
        e = e.localCheckpoint(eager=checkpoint_eager)
    nodes = (
        e.select(F.col("src").alias("node"))
        .unionByName(e.select(F.col("dst").alias("node")))
        .distinct()
    )
    deg = e.groupBy("src").agg(F.count("*").cast("double").alias("outdeg"))
    if checkpoint_every:
        nodes = nodes.localCheckpoint(eager=checkpoint_eager)
        deg = deg.localCheckpoint(eager=checkpoint_eager)
    n = nodes.count()
    ranks = nodes.withColumn("rank", F.lit(1.0 / n))
    for i in range(iterations):
        # dangling mass: total rank sitting on nodes with no out-edges —
        # a 1-row aggregate broadcast into the update (no driver action)
        dang = (
            ranks.join(deg, ranks["node"] == deg["src"], "left")
            .filter(F.col("outdeg").isNull())
            .agg(F.coalesce(F.sum("rank"), F.lit(0.0)).alias("dm"))
        )
        contribs = (
            e.join(ranks, e["src"] == ranks["node"])
            .join(deg, "src")
            .groupBy(F.col("dst").alias("node"))
            .agg(F.sum(F.col("rank") / F.col("outdeg")).alias("s"))
        )
        ranks = (
            nodes.join(contribs, "node", "left")
            .crossJoin(F.broadcast(dang))
            .select(
                "node",
                (F.lit((1.0 - damping) / n)
                 + F.lit(damping)
                 * (F.coalesce(F.col("s"), F.lit(0.0)) + F.col("dm") / n)
                 ).alias("rank"),
            )
        )
        if checkpoint_every and (i + 1) % checkpoint_every == 0 \
                and i + 1 < iterations:
            # eager per-iteration materialization: the next round consumes
            # `ranks` TWICE (dangling branch + contribution branch); an
            # un-materialized plan would recompute the whole history down
            # both subtrees, compounding 2x per round
            ranks = ranks.localCheckpoint(eager=checkpoint_eager)
    return ranks.select("node", F.round("rank", 6).alias("rank"))


def pagerank_oracle_sql(edges_sql: str, *, iterations: int = 6,
                        damping: float = 0.85) -> str:
    """Generate the DuckDB replay of ``pagerank`` as an unrolled CTE chain
    (one CTE per iteration, same expression shape as the Spark plan).
    ``edges_sql`` must select columns (src, dst)."""
    d = damping
    parts = [
        f"WITH edges AS ({edges_sql})",
        "nodes AS (SELECT src AS node FROM edges UNION SELECT dst FROM edges)",
        "nn AS (SELECT count(*)::DOUBLE AS n FROM nodes)",
        ("deg AS (SELECT src, count(*)::DOUBLE AS outdeg FROM edges "
         "GROUP BY src)"),
        "r0 AS (SELECT node, (SELECT 1.0/n FROM nn) AS rank FROM nodes)",
    ]
    for i in range(1, iterations + 1):
        p = f"r{i - 1}"
        parts.append(f"""r{i} AS (
  SELECT nodes.node,
         (SELECT ({1.0 - d!r})/n FROM nn)
         + {d!r} * (COALESCE(c.s, 0.0)
                    + (SELECT dm FROM (SELECT COALESCE(sum(rank), 0.0) AS dm
                                       FROM {p} LEFT JOIN deg
                                       ON {p}.node = deg.src
                                       WHERE deg.outdeg IS NULL))
                      / (SELECT n FROM nn)) AS rank
  FROM nodes
  LEFT JOIN (SELECT e.dst AS node, sum(r.rank / d.outdeg) AS s
             FROM edges e
             JOIN {p} r ON e.src = r.node
             JOIN deg d ON e.src = d.src
             GROUP BY e.dst) c USING (node))""")
    return (",\n".join(parts)
            + f"\nSELECT node, round(rank, 6) AS rank FROM r{iterations}")
