"""Duplicate-cluster resolution: near-dup PAIRS are only half of dedup — a
pipeline must then group pairs into clusters (connected components) and pick
one canonical document per cluster to keep. This is the step between
`pipeline.dedup` (pair generation) and the final keep/drop decision.

Scale design: min-label propagation over the edge list — each iteration is
one join + one map-side-combinable min aggregate, both hash-partitioned on
the same key so the shuffle layout is reused; iterations needed = component
diameter, which for near-dup graphs is tiny (dup clusters are cliques-ish,
diameter ~2-3). Driver only checks a converged flag per round (a count, not
collected data). For adversarial billion-edge graphs you would switch to the
large-star/small-star algorithm (same DataFrame primitives, fewer rounds);
the loop below is the honest version of what GraphFrames' connected
components does under the hood, without the extra dependency.
"""

from __future__ import annotations

import logging

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

log = logging.getLogger(__name__)

from limeqo_spark.pipeline.corpus import CORPUS_SQL, planted_corpus
from limeqo_spark.pipeline.dedup import JACCARD_COMMON_SQL, ngram_jaccard_pairs
from limeqo_spark.relational.registry import query

#: the exact-Jaccard pair SQL (tau 0.6): the SAME shared CTE chain as
#: dedup_ngram_jaccard's oracle (dedup.JACCARD_COMMON_SQL — one
#: definition, review r8), reused as the edge set of the clustering oracle
_PAIRS_SQL = f"""
    {JACCARD_COMMON_SQL},
    pairs AS (
      SELECT a, b
      FROM common JOIN sizes sa ON sa.doc_id = a JOIN sizes sb ON sb.doc_id = b
      WHERE CAST(c AS DOUBLE) / (sa.sz + sb.sz - c) >= 0.6
    )
"""


def connected_components_min_label(
    edges: DataFrame, max_iter: int = 25, strict: bool = True
) -> DataFrame:
    """Connected components of an undirected edge list ``(a, b)``; returns
    ``(node, component)`` where component = the minimum node id reachable.
    Deterministic; converges in O(diameter) rounds. With ``strict`` (the
    default) raises if the loop exhausts ``max_iter`` before convergence —
    ``strict=False`` returns the partial labels (plan-inspection and
    bounded-round use only)."""
    sym = edges.select(F.col("a").alias("src"), F.col("b").alias("dst")).unionByName(
        edges.select(F.col("b").alias("src"), F.col("a").alias("dst"))
    )
    sym = sym.distinct().localCheckpoint(eager=True)
    labels = (
        sym.select(F.col("src").alias("node"))
        .distinct()
        .withColumn("label", F.col("node"))
        .localCheckpoint(eager=True)
    )
    for _ in range(max_iter):
        nbr_min = (
            sym.join(labels, sym.dst == labels.node)
            .groupBy("src")
            .agg(F.min("label").alias("nbr_label"))
        )
        stepped = labels.join(
            nbr_min, labels.node == nbr_min.src, "left"
        ).select(
            "node",
            "label",
            F.least(F.col("label"), F.coalesce("nbr_label", "label")).alias("new_label"),
        )
        # localCheckpoint: truncate the lineage so plan size stays constant
        # across rounds (an unbounded iterative plan re-executes everything)
        stepped = stepped.localCheckpoint(eager=True)
        changed = stepped.filter(F.col("new_label") < F.col("label")).limit(1).count()
        labels = stepped.select("node", F.col("new_label").alias("label"))
        if changed == 0:
            break
    else:
        # falling through with changed > 0 would silently return labels of
        # PARTIAL components (propagation distance > max_iter)
        if strict:
            raise RuntimeError(
                f"min-label propagation did not converge in {max_iter} rounds "
                "(component diameter exceeds max_iter); raise max_iter or use "
                "connected_components_two_phase for long-chain graphs"
            )
        log.warning(
            "min-label propagation stopped at max_iter=%d without converging; "
            "returning partial labels (strict=False)", max_iter,
        )
    return labels.select("node", F.col("label").alias("component"))


def connected_components_auto(
    edges: DataFrame,
    local_threshold: int = 200_000,
    stats: dict | None = None,
    pre_canonicalized: bool = False,
) -> DataFrame:
    """Connected components with size-dispatched execution: count the
    (deduplicated, canonicalized) edge frame once, solve it with a
    driver-side union-find when it fits under ``local_threshold`` edges,
    else run the distributed O(log n)-round large-star/small-star kernel.

    Rationale (r7 x16 probe, docs/scale_probe_semdedup_r7.json): near-dup
    edge frames are a tiny minority of the corpus by construction — the
    probe measured 15.2 s of per-round Spark-job latency iterating over
    TWENTY edges. No distributed formulation fixes fixed job latency;
    the scale-correct design is a cheap size gate. A 200k-edge frame is
    ~3 MB on the driver and union-find solves it in milliseconds; beyond
    the gate (billions of dup edges at 100 TB) the two-phase kernel takes
    over with logarithmic rounds. Semantics match
    :func:`connected_components_min_label`: returns ``(node, component)``
    for every edge endpoint, component = minimum member id.
    ``stats["mode"]`` records which path ran."""
    # lazy localCheckpoint: the count below is the first action, so it both
    # materializes AND persists the edge pipeline in ONE job (an eager
    # checkpoint would spend a separate job, then count again — opt r11);
    # the collect / two-phase loop that follows reads the persisted RDD
    if pre_canonicalized:
        # caller guarantees u < v, no self-loops, no duplicates (e.g. the
        # jaccard pair generator's groupBy(a, b) with a < b) — the
        # least/greatest projection and the distinct's exchange would be
        # pure overhead on an already-canonical frame (opt r11)
        e = edges.select(
            F.col("a").cast("long").alias("u"), F.col("b").cast("long").alias("v")
        ).localCheckpoint(eager=False)
    else:
        e = (
            edges.select(
                F.col("a").cast("long").alias("u"), F.col("b").cast("long").alias("v")
            )
            .filter("u <> v")
            .select(F.least("u", "v").alias("u"), F.greatest("u", "v").alias("v"))
            .distinct()
            .localCheckpoint(eager=False)
        )
    n_edges = e.count()
    if n_edges > local_threshold:
        if stats is not None:
            stats["mode"], stats["n_edges"] = "two_phase", n_edges
        return connected_components_two_phase(
            e.select(F.col("u").alias("a"), F.col("v").alias("b")),
            pre_canonicalized=True,
        )
    if stats is not None:
        stats["mode"], stats["n_edges"] = "local_union_find", n_edges
    parent: dict[int, int] = {}

    def find(x: int) -> int:
        root = x
        while parent[root] != root:
            root = parent[root]
        while parent[x] != root:  # path compression
            parent[x], x = root, parent[x]
        return root

    for row in e.collect():
        u, v = row["u"], row["v"]
        parent.setdefault(u, u)
        parent.setdefault(v, v)
        ru, rv = find(u), find(v)
        if ru != rv:
            # union by min id keeps the root the component minimum
            if ru < rv:
                parent[rv] = ru
            else:
                parent[ru] = rv
    rows = [(node, find(node)) for node in sorted(parent)]
    # one slice, already node-sorted: consumers that only need the sorted
    # order (dedup_cluster_canonical) can then skip the range-exchange +
    # sampling pass a global orderBy would plan on this tiny frame (opt r11)
    spark = edges.sparkSession
    return spark.createDataFrame(
        spark.sparkContext.parallelize(rows, 1), "node bigint, component bigint"
    )


def connected_components_two_phase(
    edges: DataFrame,
    max_iter: int = 20,
    stats: dict | None = None,
    pre_canonicalized: bool = False,
) -> DataFrame:
    """Connected components via large-star/small-star alternation — the
    O(log n)-round MapReduce algorithm (Kiveris et al. 2014, "Connected
    Components in MapReduce and Beyond"), built from the same DataFrame
    primitives as the min-label loop but converging in logarithmically many
    rounds on ANY diameter, which is the 100 TB answer for adversarial
    long-chain graphs (the min-label loop needs O(diameter) full shuffles).
    Fixpoint detection is one tiny (count, bit_xor-of-hashes) aggregate per
    round — nothing data-sized is collected.

    Each round: large-star hangs every larger neighbor of u under
    min(N(u) ∪ u); small-star re-hangs the smaller neighborhood the same
    way. Edges canonicalize to (min, max) pairs; at the fixpoint every
    component is a star rooted at its minimum id.
    Returns ``(node, component)``; ``stats["rounds"]`` records the rounds
    used when a dict is passed.
    """
    if pre_canonicalized:
        # caller (connected_components_auto) already cast/filtered/
        # canonicalized/deduplicated AND checkpointed this frame — a repeat
        # costs a redundant full shuffle + second materialization on the
        # large-graph path (review r8)
        e = edges.select(F.col("a").alias("u"), F.col("b").alias("v"))
    else:
        e = (
            edges.select(F.col("a").cast("long").alias("u"), F.col("b").cast("long").alias("v"))
            .filter("u <> v")
            .select(F.least("u", "v").alias("u"), F.greatest("u", "v").alias("v"))
            .distinct()
            .localCheckpoint(eager=True)
        )
    prev: tuple | None = None
    rounds = 0
    for _ in range(max_iter):
        rounds += 1
        # large-star: for each node, hang all LARGER neighbors under the
        # minimum of its closed neighborhood
        sym = e.unionByName(e.select(F.col("v").alias("u"), F.col("u").alias("v")))
        mins = (
            sym.groupBy("u")
            .agg(F.min("v").alias("mv"))
            .select("u", F.least("mv", F.col("u")).alias("m"))
        )
        big = sym.filter("v > u").join(mins, "u").select(F.col("v").alias("a"), F.col("m").alias("b"))
        e = (
            big.filter("a <> b")
            .select(F.least("a", "b").alias("u"), F.greatest("a", "b").alias("v"))
            .distinct()
        )
        # small-star: per node, re-hang the SMALLER neighborhood (plus the
        # node itself) under its minimum
        mins2 = e.groupBy("v").agg(F.min("u").alias("m"))
        small = (
            e.join(mins2, "v")
            .select("u", "m")
            .filter("u <> m")
            .unionByName(mins2.select(F.col("v").alias("u"), F.col("m").alias("m")))
        )
        e = (
            small.select(F.least("u", "m").alias("u"), F.greatest("u", "m").alias("v"))
            .distinct()
            .localCheckpoint(eager=True)  # constant-size plan per round
        )
        row = e.agg(
            F.count("*").alias("n"),
            F.expr("bit_xor(xxhash64(u, v))").alias("h"),  # overflow-free fingerprint
        ).collect()[0]
        chk = (row["n"], row["h"])
        if chk == prev:
            break
        prev = chk
    else:
        raise RuntimeError(
            f"large-star/small-star did not reach a fixpoint in {max_iter} rounds"
        )
    if stats is not None:
        stats["rounds"] = rounds
    roots = e.select(F.col("u").alias("node"), F.col("u").alias("component"))
    return (
        e.select(F.col("v").alias("node"), F.col("u").alias("component"))
        .unionByName(roots)
        .distinct()
    )


@query(
    "dedup_cluster_canonical",
    oracle=f"""
    WITH RECURSIVE
    {_PAIRS_SQL},
    edges AS (
      SELECT a AS src, b AS dst FROM pairs
      UNION
      SELECT b AS src, a AS dst FROM pairs
    ),
    walk(node, r) AS (
      SELECT src AS node, src AS r FROM edges
      UNION
      SELECT e.dst AS node, w.r FROM walk w JOIN edges e ON e.src = w.node
    )
    SELECT node AS doc_id,
           MIN(r) AS canonical_id,
           (MIN(r) = node) AS keep
    FROM walk GROUP BY node ORDER BY doc_id
    """,
)
def dedup_cluster_canonical(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cluster the exact-Jaccard near-dup pairs (tau 0.6) into connected
    components and mark the canonical (minimum-id) document of each cluster
    as the one to keep — the decision step a training-data dedup pipeline
    runs after pair generation. Oracle computes the same transitive closure
    with a recursive CTE. Components come from the size-dispatched kernel
    (opt r11): near-dup edge frames are a tiny minority of the corpus by
    construction, and the large-star/small-star loop was paying ~8 Spark
    jobs per round of fixed latency to label a few dozen edges — the
    bounded driver union-find solves those in milliseconds, while the
    O(log n)-round two-phase kernel remains the automatic fallback past
    200k edges (the 100 TB path; same dispatch the SemDeDup entry uses)."""
    pairs = ngram_jaccard_pairs(
        planted_corpus(spark, sf_dir), n=3, tau=0.6, ordered=False
    )
    stats: dict = {}
    comp = connected_components_auto(
        pairs.select("a", "b"), pre_canonicalized=True, stats=stats
    )
    out = comp.select(
        F.col("node").alias("doc_id"),
        F.col("component").alias("canonical_id"),
        (F.col("component") == F.col("node")).alias("keep"),
    )
    if stats["mode"] == "local_union_find":
        # the union-find result is a SINGLE-slice frame already sorted by
        # node, so a partition-local sort yields the identical global order
        # without the range exchange + sampling job orderBy plans (opt r11);
        # the distributed path below keeps the true global sort
        return out.sortWithinPartitions("doc_id")
    return out.orderBy("doc_id")


@query(
    "dedup_cluster_best_quality",
    oracle=f"""
    WITH RECURSIVE
    {_PAIRS_SQL},
    edges AS (
      SELECT a AS src, b AS dst FROM pairs
      UNION
      SELECT b AS src, a AS dst FROM pairs
    ),
    walk(node, r) AS (
      SELECT src AS node, src AS r FROM edges
      UNION
      SELECT e.dst AS node, w.r FROM walk w JOIN edges e ON e.src = w.node
    ),
    comp AS (SELECT node AS doc_id, MIN(r) AS component FROM walk GROUP BY node),
    scores AS (
      SELECT doc_id,
             len(string_split(text, ' '))
               - len(regexp_extract_all(text, '[0-9]')) AS q
      FROM corpus
    ),
    ranked AS (
      SELECT c.doc_id, c.component, s.q,
             ROW_NUMBER() OVER (
               PARTITION BY c.component ORDER BY s.q DESC, c.doc_id
             ) AS rn
      FROM comp c JOIN scores s USING (doc_id)
    ),
    keepers AS (SELECT component, doc_id AS keeper FROM ranked WHERE rn = 1)
    SELECT r.doc_id, k.keeper AS keeper_id, CAST(r.q AS BIGINT) AS q_score,
           (r.doc_id = k.keeper) AS keep
    FROM ranked r JOIN keepers k USING (component)
    ORDER BY r.doc_id
    """,
)
def dedup_cluster_best_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality-aware cluster resolution — keep the BEST-QUALITY member of
    each near-dup cluster instead of the lowest id (the production keeper
    policy: among duplicates, retain the longest least-noisy copy). The
    quality key is integer-exact (token count minus digit count — no
    float ratio, so cross-engine arg-max ties are impossible by
    construction), ties break to the lower doc_id. Composition of two
    verified operators: large-star/small-star connected components over
    the exact-Jaccard pairs + a per-component max_by aggregate (map-side
    combinable; no window over data-sized partitions)."""
    corpus = planted_corpus(spark, sf_dir)
    pairs = ngram_jaccard_pairs(corpus, n=3, tau=0.6, ordered=False)
    # size-dispatched CC (opt r11) — see dedup_cluster_canonical; pairs exit
    # groupBy(a, b) with a < b, so the canonicalization exchange is skippable
    comp = connected_components_auto(
        pairs.select("a", "b"), pre_canonicalized=True
    ).select(
        F.col("node").alias("doc_id"), F.col("component")
    )
    scores = corpus.select(
        "doc_id",
        (
            F.size(F.split("text", " "))
            - F.regexp_count("text", F.lit("[0-9]"))
        ).cast("bigint").alias("q"),
    )
    scored = comp.join(scores, "doc_id")
    keepers = scored.groupBy("component").agg(
        F.max_by(
            "doc_id", F.struct(F.col("q"), (-F.col("doc_id")).alias("neg"))
        ).alias("keeper")
    )
    return (
        scored.join(keepers, "component")
        .select(
            "doc_id",
            F.col("keeper").alias("keeper_id"),
            F.col("q").alias("q_score"),
            (F.col("doc_id") == F.col("keeper")).alias("keep"),
        )
        .orderBy("doc_id")
    )
