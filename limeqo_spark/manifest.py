"""Central query manifest: importing this module registers every queries()
entry — relational surface, pipeline operators, streaming — into
:data:`limeqo_spark.relational.registry.REGISTRY`."""

import limeqo_spark.pipeline  # noqa: F401
import limeqo_spark.relational  # noqa: F401

try:  # streaming queries register themselves; keep import-gated during build
    import limeqo_spark.streaming  # noqa: F401
except ImportError:  # pragma: no cover
    pass

from limeqo_spark.relational.registry import REGISTRY, QuerySpec  # noqa: F401

#: Rotation aliases (round 3). The driver's CORRECTNESS gate verifies the
#: first 50 manifest entries in alphabetical order; rounds 1–2 therefore
#: never independently checked the 46 entries that sort after
#: ``q27_intersect_except``. Each name below gets an ``a3_``-prefixed alias
#: (sorts ahead of ``ann_*``) pointing at the *same* builder/oracle, so the
#: round-3 driver window verifies exactly the queries it has never seen.
#: Canonical names stay registered; local tests skip the aliases
#: (identical spec) to avoid double-running.
ROTATION_ALIAS_PREFIX = "a3_"
#: every alias prefix in use this round (local tests skip all of them)
ROTATION_ALIAS_PREFIXES = ("a3_", "a4_")
_ROTATION_R3 = [
    # q28-q34 were hash-green in the round-1 driver window (CORRECTNESS_r01)
    # so they do NOT need a rotation slot; their seven slots go to round-2
    # additions the driver has never seen (corpus_*, q67-q71) instead.
    "corpus_chunk_windows",
    "corpus_mix_quota_sample",
    "q67_tpch_q7_volume_shipping",
    "q68_tpch_q12_priority_classes",
    "q69_tpch_q19_bracketed_disjunction",
    "q70_tpch_q2_min_cost_supplier",
    "q71_tpch_q6_forecast_revenue",
    "q35_percentiles",
    "q36_seeded_sample",
    "q37_dedup_exact",
    "q40_tokenize_counts",
    "q41_scalar_udf",
    "q42_grouped_pandas",
    "q43_udtf_flatten",
    "q44a_stream_tumbling",
    "q44b_stream_sliding",
    "q44c_stream_session",
    "q44d_stream_dedup_watermark",
    "q45_stateful_user_totals",
    "q46_partition_pruned_scan",
    "q47_tpch_q3_shipping",
    "q48_tpch_q5_local_volume",
    "q49_tpch_q10_returns",
    "q50_foreachbatch_sink",
    "q51_bucketed_colocated_join",
    "q52_python_udtf_lateral",
    "q53_variant_json",
    "q54_stream_stream_join",
    "q56_pivot",
    "q57_cube_grouping",
    "q58_string_agg",
    "q59_tpch_q4_exists",
    "q60_tpch_q18_in_subquery",
    "q61_tpch_q17_scalar_subquery",
    "q62_binned_range_join",
    "q63_stratified_sample",
    "q64_sized_file_sink",
    "q65_iejoin_band",
    "skew_salted_join",
    "text_contamination_overlap",
    "text_fingerprint",
    "text_langid",
    "text_pii_redact",
    "text_quality_score",
    "text_repetition_ratio",
    "text_token_count_bpeish",
]

#: Four more aliases (``a4_`` sorts between ``a3_`` and ``ann_``) fill the
#: window's last four slots with round-2-addition HASH queries the driver
#: has never seen. This displaces three already-green ``ann_*`` rows AND
#: the never-checked ``ann_ivf_partitioned`` — a deliberate trade: it is
#: PROP (rows-only at the driver, its real assertions live in the local
#: suite), so four full value-hash verifications outrank one rows-only
#: row; it heads the round-4 rotation list below instead.
_ROTATION_R3_TAIL = [
    "cdc_scd2_history",
    "corpus_pack_bins",
    "dedup_chunk_reconstruct",
    "text_tfidf_top_terms",
]

# NOTE for round 4 (window math computed against the live registry, not
# guessed): once CORRECTNESS_r03 shows the aliases green, DELETE both
# alias blocks. The alias-free canonical window (first 50 of 145 names,
# ending at q12_left_join) then NATURALLY covers 12 never-checked
# entries (ann_ivf_partitioned, the eight corpus_* rows,
# dedup_cluster_best_quality, dedup_substring_spans, mm_binaryfile_ingest,
# pipeline_e2e_curate — all verified in-window by the computation above;
# RE-RUN it after any round-4 additions shift the boundary), so the
# round-4 rotation only needs aliases for the 26 never-checked entries
# that sort AFTER the window: q72-q96 and text_quality_classifier.
# 26 + the ~12 naturally-covered < 50, leaving slots; fill any remainder
# with the oldest-verified entries (q13+-range rows drift out of the
# alias-free window, so their verification ages — rotating a few back in
# each round keeps the whole manifest's evidence fresh).
for _name, _prefix in [(n, ROTATION_ALIAS_PREFIX) for n in _ROTATION_R3] + [
    (n, "a4_") for n in _ROTATION_R3_TAIL
]:
    _spec = REGISTRY[_name]
    _alias = _prefix + _name
    REGISTRY[_alias] = QuerySpec(
        _alias,
        _spec.builder,
        _spec.oracle,
        _spec.check,
        f"driver-window rotation alias of {_name}",
    )
