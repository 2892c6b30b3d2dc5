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

#: Rotation aliases (round 8). The driver's CORRECTNESS gate verifies the
#: first 50 manifest entries in alphabetical order; each name below gets an
#: ``a8_``-prefixed alias (sorts ahead of ``ann_*``) pointing at the *same*
#: builder/oracle. Window computed by ``scripts/rotation_plan.py`` against
#: the live registry + git history (VERDICT r7 next-round #1): round 7's
#: 50 ``a7_`` aliases are RETIRED (all targets have green r7 driver rows),
#: and the r8 window covers (a) ALL 15 never-driver-checked entries
#: (q98, q100–q107, the BPE pair, PPS, CDC merge/diff, SemDeDup), (b) the
#: 11 entries whose implementing file changed after their last driver row
#: (the ann_/dedup families touched by r7-r8 probe fixes, cdc_upsert_latest,
#: the streaming dedup pair — the ann_* family and cdc_merge_apply sit in
#: the natural alphabetical window, no alias needed), then (c) stale rows
#: stalest-first (the r4-checked q84–q86 that rolled over, then the r5
#: wave) as far as the 50-slot window allows. Canonical names stay
#: registered; local tests skip the aliases (identical spec) to avoid
#: double-running.
ROTATION_ALIAS_PREFIX = "a8_"
#: every alias prefix in use this round (local tests skip all of them)
ROTATION_ALIAS_PREFIXES = ("a8_",)
_ROTATION_R8 = [
    # (a) never driver-checked
    "cdc_merge_apply",
    "cdc_snapshot_diff",
    "corpus_weighted_sample_pps",
    "dedup_semantic_clusters",
    "q100_data_quality_checks",
    "q101_frequent_pairs_apriori",
    "q102_recursive_cte_bom",
    "q103_python_datasource",
    "q104_table_stats_profile",
    "q105_stream_merge_apply",
    "q106_triangle_count",
    "q107_pagerank_fixed_point",
    "q98_skew_diagnostics",
    "text_bpe_encode",
    "text_bpe_vocab_merges",
    # (b) implementing file changed after the last driver row
    "cdc_upsert_latest",
    "dedup_cluster_canonical",
    "q86_stream_incremental_dedup",
    "q96_stream_neardup_minhash",
    # (c) stalest driver rows first: r4-checked rollovers, then the r5 wave
    "q84_orc_sink_roundtrip",
    "q85_schema_evolution_merge",
    "q87_compact_small_files",
    "q88_xml_source",
    "q89_text_source_lines",
    "q90_try_arithmetic",
    "q91_dynamic_partition_overwrite",
    "q92_unpivot_melt",
    "q93_forward_fill",
    "q94_null_safe_join",
    "q95_map_battery",
    "limeqo_mllib_complete_agree",
    "limeqo_wl_argmin_per_query",
    "limeqo_wl_default_vs_opt",
    "limeqo_wl_equivalence_groups",
    "limeqo_wl_min_observed",
    "limeqo_wl_percentiles",
    "limeqo_wl_topk_improvement",
    "mm_binary_metadata",
    "mm_feature_extract",
    "mm_frame_sample",
    "mm_resize",
    "q01_parquet_scan_checksum",
    "q02_csv_roundtrip",
]

for _name in _ROTATION_R8:
    _spec = REGISTRY[_name]
    _alias = ROTATION_ALIAS_PREFIX + _name
    REGISTRY[_alias] = QuerySpec(
        _alias,
        _spec.builder,
        _spec.oracle,
        _spec.check,
        f"driver-window rotation alias of {_name}",
    )
