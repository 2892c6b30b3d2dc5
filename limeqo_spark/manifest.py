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
_ROTATION_R3 = [
    "q28_string_battery",
    "q29_date_battery",
    "q30_math_battery",
    "q31_array_explode",
    "q32_struct_battery",
    "q33_json_extract",
    "q34_conditional_null",
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

# NOTE for round 4: once CORRECTNESS_r03 shows these aliases green (the
# driver's 50-entry alphabetical window verifies them this round), DELETE
# the alias block and replace it with an ``a4_`` rotation for the entries
# the driver has then never checked: the round-3 additions
# (cdc_scd2_history, corpus_chunk_windows, corpus_mix_quota_sample,
# corpus_pack_bins, dedup_chunk_reconstruct, text_tfidf_top_terms,
# q70-q84, q82/q83, and q66 where registered) — they sort after the
# canonical first-50, so without a rotation they would stay outside the
# window indefinitely.
for _name in _ROTATION_R3:
    _spec = REGISTRY[_name]
    _alias = ROTATION_ALIAS_PREFIX + _name
    REGISTRY[_alias] = QuerySpec(
        _alias,
        _spec.builder,
        _spec.oracle,
        _spec.check,
        f"driver-window rotation alias of {_name}",
    )
