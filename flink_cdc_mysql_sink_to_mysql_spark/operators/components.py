"""Connected components over near-dup pair graphs (dup clustering).

A training-data pipeline doesn't stop at near-dup PAIRS — it needs dup
CLUSTERS (the transitive closure of pairs) so it can keep one canonical
document per cluster and drop the rest. This module turns any pair
relation (MinHash-LSH, SimHash, embedding-cosine) into per-node cluster
labels, entirely in DataFrame ops.

Algorithm: the alternating **large-star / small-star** method of
Kiveris et al., "Connected Components in MapReduce and Beyond" (SOCC
2014). Each round is two groupBy+join passes over the edge list;
convergence is O(log² n) rounds w.h.p. even on adversarial path graphs
(vs O(diameter) for naive label propagation — a 1M-doc chain would need
1M label-prop rounds but ~40 star rounds). Per round the shuffled data
is one (node, min-neighbor) pair per edge — no neighborhood is ever
collected into a single row, so a hot node (a boilerplate doc paired
with millions of others) never exceeds a groupBy(min) partial
aggregate. That is the 100 TB story: rounds ∝ log n, bytes shuffled per
round ∝ |E|, skew handled by map-side partial min-aggregation.

The reference has nothing like this (no graph ops at all, SURVEY.md
§2.5); the oracle is a DuckDB recursive-CTE transitive closure, which
is exact (and exponential-ish — fine at oracle scale only).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MAX_ROUNDS = 25  # »O(log² n) for any test corpus; assertion guard only


def _symmetrize(edges: DataFrame) -> DataFrame:
    """(u,v) ∪ (v,u), self-loops dropped, distinct."""
    fwd = edges.select("u", "v")
    rev = edges.select(F.col("v").alias("u"), F.col("u").alias("v"))
    return fwd.union(rev).where(F.col("u") != F.col("v")).distinct()


def _large_star(sym: DataFrame) -> DataFrame:
    """For each node u: m = min(Γ(u) ∪ {u}); emit (v, m) for v ∈ Γ(u),
    v > u. Strictly-larger neighbors re-point at the neighborhood min."""
    nbr_min = sym.groupBy("u").agg(F.min("v").alias("mv"))
    m = F.least(F.col("u"), F.col("mv"))
    return (
        sym.join(nbr_min, "u")
        .where(F.col("v") > F.col("u"))
        .select(F.col("v").alias("u"), m.alias("v"))
        .where(F.col("u") != F.col("v"))
        .distinct()
    )


def _small_star(lg: DataFrame) -> DataFrame:
    """Orient every edge (u,v) with u > v; for each u: m = min(Γ<(u));
    emit (v, m) for v ∈ Γ<(u) ∪ {u} \\ {m}."""
    oriented = lg.select(
        F.greatest("u", "v").alias("u"), F.least("u", "v").alias("v")
    ).distinct()
    nbr_min = oriented.groupBy("u").agg(F.min("v").alias("mv"))
    down = (
        oriented.join(nbr_min, "u")
        .select(F.col("v").alias("u"), F.col("mv").alias("v"))
    )
    self_edge = nbr_min.select("u", F.col("mv").alias("v"))
    return (
        down.union(self_edge)
        .where(F.col("u") != F.col("v"))
        .distinct()
    )


def _checksum(edges: DataFrame) -> tuple:
    """Deterministic edge-set fingerprint (count + 2 independent XORed
    hashes; edges are distinct so XOR is collision-sound) — one tiny
    action per round, no edge-set collect, no ANSI sum overflow."""
    row = edges.agg(
        F.count(F.lit(1)).alias("n"),
        F.bit_xor(F.xxhash64("u", "v")).alias("h1"),
        F.bit_xor(F.xxhash64("v", "u", F.lit(7))).alias("h2"),
    ).collect()[0]
    return (row["n"], row["h1"], row["h2"])


def connected_components(
    pairs: DataFrame,
    src: str = "doc_a",
    dst: str = "doc_b",
    max_rounds: int = MAX_ROUNDS,
) -> DataFrame:
    """(node, component) for every node appearing in ``pairs``, where
    component = min node id of the connected component. Nodes with no
    pair are absent (caller coalesces to self — see dup_clusters)."""
    # Materialize the pair feed ONCE before symmetrizing: _symmetrize
    # references its input twice (fwd ∪ rev) and Spark does not reuse
    # common subplans across a union, so an expensive feed (the
    # MinHash-LSH pipeline: shingle → K minhashes → band join → verify)
    # would otherwise execute twice. One localCheckpoint pins it to a
    # (narrow) in-memory edge list — pairs are the SMALL output of the
    # feed, not the corpus.
    edges = pairs.select(
        F.col(src).alias("u"), F.col(dst).alias("v")
    ).localCheckpoint(eager=True)
    cur = _symmetrize(edges).localCheckpoint(eager=True)
    prev_sum = None
    for _ in range(max_rounds):
        nxt = _small_star(_large_star(_symmetrize(cur)))
        # localCheckpoint: truncate lineage so round N+1 doesn't replay
        # rounds 1..N (and make the convergence action pay once)
        nxt = nxt.localCheckpoint(eager=True)
        cur_sum = _checksum(nxt)
        if cur_sum == prev_sum:
            cur = nxt
            break
        prev_sum, cur = cur_sum, nxt
    else:
        raise RuntimeError(f"no convergence in {max_rounds} star rounds")
    # terminal state: a star per component — every non-root points at
    # the root; roots appear only as v
    comp = cur.select(F.col("u").alias("node"), F.col("v").alias("component"))
    roots = (
        cur.select(F.col("v").alias("node"))
        .distinct()
        .join(cur.select(F.col("u").alias("node")), "node", "left_anti")
        .select("node", F.col("node").alias("component"))
    )
    return comp.union(roots)


def dup_clusters(docs: DataFrame, pairs: DataFrame) -> DataFrame:
    """Cluster labels for EVERY doc: near-dup cluster id (min doc_id of
    the transitive closure of ``pairs``) or self for singletons, plus
    the keep/drop verdict a curation pipeline acts on."""
    cc = connected_components(pairs)
    return (
        docs.select("doc_id")
        .join(cc, docs["doc_id"] == cc["node"], "left")
        .select(
            "doc_id",
            F.coalesce("component", "doc_id").alias("cluster_id"),
            (F.coalesce("component", "doc_id") == F.col("doc_id")).alias(
                "is_canonical"
            ),
        )
    )


def dup_clusters_sql(rel: str, pairs_sql: str) -> str:
    """DuckDB oracle: recursive transitive closure → min reachable id.
    Exact but O(n·reach) — oracle-scale only; the Spark path above is
    the scale algorithm."""
    return f"""
    WITH RECURSIVE
    pairs AS ({pairs_sql}),
    edges AS (
      SELECT doc_a AS u, doc_b AS v FROM pairs
      UNION
      SELECT doc_b AS u, doc_a AS v FROM pairs
    ),
    reach(node, r) AS (
      SELECT doc_id, doc_id FROM ({rel})
      UNION
      SELECT reach.node, edges.v FROM reach JOIN edges ON reach.r = edges.u
    )
    SELECT node AS doc_id, MIN(r) AS cluster_id,
           (MIN(r) = node) AS is_canonical
    FROM reach GROUP BY node
    """
