"""Entity resolution over string keys: blocked fuzzy matching (candidate
pairs via cheap blocking, edit-distance verification inside blocks) and
canonicalization (connected components over the match graph, one canonical
surface form per entity cluster). This is the classic product/author/venue
dedup shape a training-data pipeline runs over scraped metadata before it
can group-by an entity — the string analog of `pipeline.dedup`'s document
near-dup family (pairs) + `pipeline.cluster` (components).

Scale design: NEVER all-pairs. Candidates are generated only inside blocks
(first token of the name), blocks above ``BLOCK_CAP`` distinct keys are
excluded (the `dedup_ngram_jaccard_capped` df-cap pattern — a degenerate
block like an empty-string token would otherwise go quadratic), and the
expensive ``levenshtein`` runs only on intra-block pairs. Matching runs on
DISTINCT surface forms with a support count, not raw rows — at 100 TB the
distinct-name frame is orders of magnitude smaller than the fact table, and
supports re-attach by one hash join at the end.

No reference counterpart (zixy17/LimeQO steers a query optimizer); this
extends the pipeline surface the way its training-data deployment would
need, like `pipeline.dedup`.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from limeqo_spark.io import table
from limeqo_spark.pipeline.cluster import connected_components_auto
from limeqo_spark.relational.registry import query

#: verified-match threshold: unit-cost Levenshtein (identical algorithm in
#: Spark and DuckDB) at most this far apart
MATCH_DIST = 4
#: blocks with more distinct keys than this are excluded from pairing —
#: a hot block (empty token, boilerplate prefix) is quadratic in its size
BLOCK_CAP = 256

#: distinct surface forms + support, blocked by first token, hot blocks
#: capped — the shared candidate-generation prefix of both oracles
_BLOCKED_SQL = f"""
    names AS (
      SELECT p_name AS name, CAST(COUNT(*) AS BIGINT) AS support
      FROM part GROUP BY 1
    ),
    blocked AS (
      SELECT name, support, split_part(name, ' ', 1) AS blk FROM names
    ),
    blk_ok AS (
      SELECT blk FROM blocked GROUP BY blk HAVING COUNT(*) <= {BLOCK_CAP}
    ),
    eligible AS (
      SELECT b.* FROM blocked b JOIN blk_ok USING (blk)
    ),
    pairs AS (
      SELECT a.name AS name_a, b.name AS name_b,
             CAST(levenshtein(a.name, b.name) AS INT) AS dist,
             a.support AS support_a, b.support AS support_b
      FROM eligible a JOIN eligible b
        ON a.blk = b.blk AND a.name < b.name
      WHERE levenshtein(a.name, b.name) <= {MATCH_DIST}
    )
"""


def _distinct_names(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ALL distinct part names + row support + first-token block key.
    The distinct-names aggregate is the only data-sized shuffle and has
    2-4 consumers (both pair sides, the canonical join, the CC edge
    build); materialize the vocabulary-sized result once (eager
    localCheckpoint, ContextCleaner-reclaimed)."""
    return (
        table(spark, sf_dir, "part")
        .groupBy(F.col("p_name").alias("name"))
        .agg(F.count("*").cast("bigint").alias("support"))
        .withColumn("blk", F.expr("split_part(name, ' ', 1)"))
        .localCheckpoint(eager=True)
    )


def _cap_hot_blocks(names: DataFrame) -> DataFrame:
    """Names eligible for PAIRING: hot blocks (> BLOCK_CAP distinct names)
    removed. The cap bounds the quadratic candidate stage ONLY — a
    hot-block name still appears in canonicalization output (self-
    canonical), exactly as the oracle's uncapped `names` CTE does."""
    blk_ok = (
        names.groupBy("blk")
        .agg(F.count("*").alias("blk_n"))
        .filter(F.col("blk_n") <= BLOCK_CAP)
        .select("blk")
    )
    return names.join(blk_ok, "blk")


def _match_pairs(blocked: DataFrame) -> DataFrame:
    """Intra-block candidate pairs verified by Levenshtein ≤ MATCH_DIST."""
    a = blocked.select(
        "blk",
        F.col("name").alias("name_a"),
        F.col("support").alias("support_a"),
    )
    b = blocked.select(
        "blk",
        F.col("name").alias("name_b"),
        F.col("support").alias("support_b"),
    )
    return (
        a.join(b, "blk")
        .filter(F.col("name_a") < F.col("name_b"))
        .withColumn(
            "dist", F.levenshtein("name_a", "name_b").cast("int")
        )
        .filter(F.col("dist") <= MATCH_DIST)
        .select("name_a", "name_b", "dist", "support_a", "support_b")
    )


@query(
    "er_fuzzy_match_blocked",
    oracle=f"""
    WITH {_BLOCKED_SQL}
    SELECT name_a, name_b, dist, support_a, support_b
    FROM pairs ORDER BY name_a, name_b
    """,
)
def er_fuzzy_match_blocked(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Blocked fuzzy self-match over part names: candidates share a first
    token (the block key), verified pairs are Levenshtein ≤ 4 apart.
    Matching runs over DISTINCT names carrying a support count — the
    match space depends on the vocabulary, not the row count, so the
    quadratic stage is fixed-size while supports scale with the data.

    Scale (100 TB): distinct-names groupBy is the only full-table
    shuffle; blocks above BLOCK_CAP=256 distinct keys are dropped before
    pairing (hot-block quadratic guard, the `dedup_ngram_jaccard_capped`
    pattern — the oracle derives the identical filter so the cap is part
    of the verified semantics, not a hidden heuristic). The intra-block
    join is a plain equi-join on ``blk`` with the distance filter on top
    — no cartesian, no UDF: ``levenshtein`` is a JVM codegen expression
    in Spark and the same unit-cost algorithm in DuckDB."""
    return _match_pairs(
        _cap_hot_blocks(_distinct_names(spark, sf_dir))
    ).orderBy("name_a", "name_b")


@query(
    "er_canonical_entities",
    oracle=f"""
    WITH RECURSIVE {_BLOCKED_SQL},
    sym AS (
      SELECT name_a AS a, name_b AS b FROM pairs
      UNION ALL
      SELECT name_b, name_a FROM pairs
    ),
    reach AS (
      SELECT name AS a, name AS b FROM names
      UNION
      SELECT r.a, s.b FROM reach r JOIN sym s ON r.b = s.a
    ),
    canon AS (SELECT a AS name, MIN(b) AS canonical_name FROM reach GROUP BY 1)
    SELECT c.name, c.canonical_name, n.support
    FROM canon c JOIN names n USING (name)
    ORDER BY canonical_name, name
    """,
)
def er_canonical_entities(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Entity canonicalization: connected components over the fuzzy match
    graph, canonical form = lexicographically smallest name reachable.
    Names with no match edge canonicalize to themselves via
    ``coalesce(component, nid)`` — the CC kernel only ever touches edge
    endpoints (the SemDeDup fix from round 8: isolated nodes never enter
    the iteration).

    The output covers ALL distinct names — the BLOCK_CAP guard bounds
    only the pairing stage, so a hot-block name simply canonicalizes to
    itself (the oracle's uncapped `names` CTE has the same semantics;
    capping the output too would silently DROP hot-block names from the
    result, a divergence the fixtures cannot surface because their
    blocks stay under the cap).

    Scale (100 TB): the match graph is vocabulary-sized, tiny next to
    the fact table. Components come from the size-dispatched
    `connected_components_auto` over a name→dense-id mapping (ids ranked
    by name, so the min-id component maps back to the min NAME): the
    min-label kernel's O(diameter) round cap would abort on long
    levenshtein chains (versioned/numbered surface forms), while the
    auto kernel union-finds small frames and switches to the O(log n)
    two-phase kernel beyond 200k edges. The DuckDB oracle computes the
    same components by recursive-CTE transitive closure — feasible
    exactly because the graph is small, which is the point of resolving
    entities over distinct names. Output re-attaches the support count
    by one hash join."""
    names = _distinct_names(spark, sf_dir)
    pairs = _match_pairs(_cap_hot_blocks(names)).select("name_a", "name_b")
    # dense ids ranked by name: lexicographic-min name == min id, which is
    # what the CC kernels minimize. The rank window is over the
    # vocabulary-sized frame, not the fact table.
    ids = names.select("name").withColumn(
        "nid", F.row_number().over(W.orderBy("name")).cast("long")
    ).localCheckpoint(eager=True)
    a = ids.select(F.col("name").alias("name_a"), F.col("nid").alias("a"))
    b = ids.select(F.col("name").alias("name_b"), F.col("nid").alias("b"))
    edges = pairs.join(a, "name_a").join(b, "name_b").select("a", "b")
    comp = connected_components_auto(edges)
    canon = (
        ids.join(comp, ids.nid == comp.node, "left")
        .withColumn("cid", F.coalesce("component", "nid"))
        .join(
            ids.select(
                F.col("nid").alias("cid"), F.col("name").alias("canonical_name")
            ),
            "cid",
        )
        .select("name", "canonical_name")
    )
    return (
        names.join(canon, "name")
        .select("name", "canonical_name", "support")
        .orderBy("canonical_name", "name")
    )
