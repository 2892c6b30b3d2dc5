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

#: Rotation aliases (round 11). The driver's CORRECTNESS gate verifies the
#: first 50 manifest entries alphabetically; each name below gets an
#: ``a11_`` alias pointing at the same builder/oracle. Window computed by
#: ``scripts/rotation_plan.py --prefix a11_`` after the r11 planner fixes
#: (credit a10_ rows to their canonical entries; GLOBAL oldest-evidence-
#: first across changed+stale — VERDICT r10 #1). Coverage: ALL 45 canonical
#: entries whose last driver check was r7 or earlier — the q28-q34 function
#: batteries, the q65-q83 TPC-H tail + stream-static/time-range, the mm_*
#: family (last checked r5), the text_* battery, the corpus_{shuffle,
#: split,stats,temperature,sketch} rows, skew_salted_join and
#: pipeline_e2e_curate — plus the four oldest r8-checked changed-file
#: entries (dedup_chunk_reconstruct, dedup_embedding_cosine,
#: corpus_pack_bins, corpus_weighted_sample_pps). After this window every
#: canonical entry's last driver evidence is r8 or newer (the VERDICT #1
#: done-criterion). Every a10_ alias is RETIRED (CORRECTNESS_r10: 42 hash
#: + 8 clean raising-PROP rows). Canonical names stay registered; local
#: tests skip the aliases (identical spec) to avoid double-running.
ROTATION_ALIAS_PREFIX = "a11_"
#: every alias prefix in use this round (local tests skip all of them)
ROTATION_ALIAS_PREFIXES = ("a11_",)
_ROTATION_R11 = [
    "corpus_pack_bins",
    "corpus_shuffle_shards",
    "corpus_sketch_profile",
    "corpus_split_train_holdout",
    "corpus_stats_card",
    "corpus_temperature_resample",
    "corpus_weighted_sample_pps",
    "dedup_chunk_reconstruct",
    "dedup_embedding_cosine",
    "mm_binary_metadata",
    "mm_binaryfile_ingest",
    "mm_feature_extract",
    "mm_frame_sample",
    "mm_resize",
    "pipeline_e2e_curate",
    "q28_string_battery",
    "q29_date_battery",
    "q30_math_battery",
    "q31_array_explode",
    "q32_struct_battery",
    "q33_json_extract",
    "q34_conditional_null",
    "q65_iejoin_band",
    "q67_tpch_q7_volume_shipping",
    "q68_tpch_q12_priority_classes",
    "q69_tpch_q19_bracketed_disjunction",
    "q70_tpch_q2_min_cost_supplier",
    "q71_tpch_q6_forecast_revenue",
    "q72_tpch_q8_market_share",
    "q73_tpch_q9_product_profit",
    "q74_tpch_q11_important_stock",
    "q75_tpch_q13_customer_distribution",
    "q76_tpch_q14_promo_revenue",
    "q77_tpch_q15_top_supplier",
    "q78_tpch_q16_supplier_part_counts",
    "q79_tpch_q20_part_promotion",
    "q80_tpch_q21_waiting_suppliers",
    "q81_tpch_q22_global_sales_opportunity",
    "q82_stream_static_enrich",
    "q83_time_range_window",
    "skew_salted_join",
    "text_contamination_overlap",
    "text_fingerprint",
    "text_langid",
    "text_pii_redact",
    "text_quality_score",
    "text_repetition_ratio",
    "text_tfidf_top_terms",
    "text_token_count_bpeish",
]

for _name in _ROTATION_R11:
    _spec = REGISTRY[_name]
    _alias = ROTATION_ALIAS_PREFIX + _name
    REGISTRY[_alias] = QuerySpec(
        _alias,
        _spec.builder,
        _spec.oracle,
        _spec.check,
        f"driver-window rotation alias of {_name}",
    )
