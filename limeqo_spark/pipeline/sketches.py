"""Mergeable-sketch corpus profiling: HLL distinct counts, KLL quantiles,
Count-Min frequency — the one-pass, constant-memory statistics layer a
100 TB corpus needs where exact DISTINCT/percentile aggregates would
shuffle the full key space.

All sketches here are Spark 4 built-ins (Apache DataSketches under the
hood: ``hll_sketch_agg``, ``kll_sketch_agg_bigint``,
``count_min_sketch``), so the partial aggregates merge associatively —
the map side emits kilobyte sketches, never token lists. No DuckDB hash
oracle is possible (sketch binaries are engine-specific), so the operator
PROP-checks itself: each row carries the exact value next to the estimate
and an ``ok`` flag the generic prop gate asserts.

Reference tie-in: the reference's only statistics are dense-matrix
percentiles over <=6191 rows (SURVEY A14, ``np.percentile``); sketching is
what that role becomes at corpus scale (north-star per BASELINE.json).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from limeqo_spark.io import table
from limeqo_spark.relational.registry import query, raise_on_failed_gates

#: HLL relative-error acceptance (lgConfigK=12 default: ~1.6% typical)
HLL_TOL = 0.05
#: KLL quantile acceptance: estimate within this relative distance of the
#: exact interpolated percentile (doc-length distributions are smooth)
KLL_TOL = 0.10


@query("corpus_sketch_profile", oracle=None, check="prop")
def corpus_sketch_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-language sketch profile with inline verification: HLL
    distinct-token estimate vs the exact count, KLL doc-length median/p90
    vs the exact percentiles. ``hll_ok``/``kll_ok`` must be true for every
    language (asserted by the generic prop gate).

    Scale (100 TB): the exact columns exist only to verify the sketches on
    the fixture — at scale you drop them and keep the sketch columns,
    whose partial aggregates are fixed-size and map-side-combinable; a
    daily profile then costs one scan regardless of corpus size, and
    sketches from disjoint shards/days merge without re-reading data."""
    toks = table(spark, sf_dir, "documents").select(
        "lang",
        F.explode(F.split("text", " ")).alias("tok"),
    )
    tok_stats = toks.groupBy("lang").agg(
        F.countDistinct("tok").cast("bigint").alias("exact_distinct"),
        F.hll_sketch_estimate(F.hll_sketch_agg("tok")).alias("hll_distinct"),
    )
    lens = table(spark, sf_dir, "documents").select(
        "lang", F.size(F.split("text", " ")).cast("bigint").alias("n_tokens")
    )
    len_stats = lens.groupBy("lang").agg(
        F.round(F.percentile("n_tokens", F.lit(0.5)), 2).alias("exact_p50"),
        F.round(F.percentile("n_tokens", F.lit(0.9)), 2).alias("exact_p90"),
        F.kll_sketch_get_quantile_bigint(
            F.kll_sketch_agg_bigint("n_tokens"), F.lit(0.5)
        ).alias("kll_p50"),
        F.kll_sketch_get_quantile_bigint(
            F.kll_sketch_agg_bigint("n_tokens"), F.lit(0.9)
        ).alias("kll_p90"),
    )
    out = tok_stats.join(len_stats, "lang")
    rel = lambda est, exact: F.abs(est - F.col(exact)) / F.col(exact)  # noqa: E731
    profiled = (
        out.withColumn("hll_ok", rel(F.col("hll_distinct"), "exact_distinct") <= HLL_TOL)
        .withColumn(
            "kll_ok",
            (rel(F.col("kll_p50"), "exact_p50") <= KLL_TOL)
            & (rel(F.col("kll_p90"), "exact_p90") <= KLL_TOL),
        )
        .orderBy("lang")
    )
    # RAISING gate (VERDICT r9 #3 extended r10): a sketch drifting past its
    # tolerance raises GateFailure -> driver-visible err, not a silent
    # false cell only prop_gates could see
    profiled = raise_on_failed_gates(profiled, "corpus_sketch_profile", ok_col="hll_ok")
    return raise_on_failed_gates(profiled, "corpus_sketch_profile", ok_col="kll_ok")
