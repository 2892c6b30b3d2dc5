"""Driver-visible roll-up of the property-checked (no-oracle) entries.

The grading driver's CORRECTNESS gate records rows-only evidence for
``check="prop"`` entries, so a property regression that flips an ``ok``
column inside one of those frames is invisible to it unless someone reads
the frame. ``prop_gates`` closes that blind spot (VERDICT r5, next-round
#6) on the ``ann_recall_gate`` / ``scale_pruning_gate`` pattern: it runs
each silent PROP entry, reduces every boolean column in its result to a
single pass/fail, and returns one ``(gate, n_rows, n_pass, ok)`` row per
entry — a uniform frame in which ANY property failure anywhere in the
PROP surface shows up as an ``ok=false`` row.

Scale note: the gate itself is driver-side orchestration over tiny
result frames (each sub-entry's output is <= a few dozen rows by
construction); the heavy lifting stays inside the sub-entries' own
distributed plans, which are unchanged.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from limeqo_spark.relational.registry import query, raise_on_failed_gates

#: The silent PROP entries rolled up here (VERDICT r5 #6 list + the quota
#: threshold sampler, which carries the same 4-sigma bound). Entries that
#: already ARE gate frames (ann_recall_gate, scale_pruning_gate,
#: text_quality_classifier, limeqo_mllib_complete_agree) are not re-run —
#: they are their own driver-visible rows, and the ANN/MLlib families are
#: too expensive to evaluate twice per driver pass.
_PROP_GATE_ENTRIES = (
    "corpus_mix_quota_threshold",
    "corpus_sketch_profile",
    "q18_approx_count_distinct",
    "q20_partial_agg_plan",
    "q36_seeded_sample",
    "q63_stratified_sample",
    "q64_sized_file_sink",
    "q87_compact_small_files",
)


@query("prop_gates", oracle=None, check="prop")
def prop_gates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One (gate, n_rows, n_pass, ok) row per silent PROP entry: ``n_pass``
    counts result rows whose boolean columns are ALL true, and ``ok``
    requires a non-empty result with every row passing. A regression in
    any rolled-up property (HLL/KLL error bounds, sampling 4-sigma bounds,
    seeded-sample reproducibility, file-sizing invariants, two-phase-agg
    plan shape) flips that gate's row to ``ok=false`` — and the builder then
    RAISES (``raise_on_failed_gates``), so the driver's rows-only check
    records a non-null ``err`` instead of the same 8-row count (VERDICT r6
    next-round #2)."""
    from limeqo_spark.relational.registry import REGISTRY

    rows = []
    for name in _PROP_GATE_ENTRIES:
        df = REGISTRY[name].builder(spark, sf_dir)
        bool_cols = [
            f.name for f in df.schema.fields if isinstance(f.dataType, T.BooleanType)
        ]
        if not bool_cols:
            # schema drift: an entry that lost every boolean column must read
            # as a FAILED gate row, not crash the whole roll-up (ADVICE r6)
            rows.append((name, int(df.count()), 0, False))
            continue
        all_ok = reduce(
            lambda a, b: a & b, (F.coalesce(F.col(c), F.lit(False)) for c in bool_cols)
        )
        agg = df.agg(
            F.count("*").alias("n"),
            F.sum(F.when(all_ok, 1).otherwise(0)).cast("bigint").alias("n_pass"),
        ).collect()[0]
        n, n_ok = int(agg["n"]), int(agg["n_pass"] or 0)
        rows.append((name, n, n_ok, n > 0 and n == n_ok))
    out = spark.createDataFrame(
        rows, "gate string, n_rows bigint, n_pass bigint, ok boolean"
    ).orderBy("gate")
    return raise_on_failed_gates(out, "prop_gates")
