"""Unit tests for the round-7 profiling/vocab operators: BPE merge-round
semantics (greedy leftmost non-overlap on identical-symbol runs — a corner
the fixture corpus does not force), PPS sampling invariants, and the
profiler frames' internal consistency."""

from __future__ import annotations

import pytest

from limeqo_spark.pipeline.mix import PPS_K
from limeqo_spark.pipeline.vocab import _merge_round
from limeqo_spark.relational.queries_profile import HH_TOP, MINSUP, SUP_PER_BASKETS
from limeqo_spark.relational.registry import REGISTRY


def _seq_from_words(spark, words: dict[str, int]):
    rows = []
    for w, cnt in words.items():
        for i, ch in enumerate(w, start=1):
            rows.append((w, cnt, i, ch))
    return spark.createDataFrame(rows, "word string, wcnt long, pos long, sym string")


def _word_syms(seq) -> dict[str, list[str]]:
    out: dict[str, list[str]] = {}
    for r in seq.orderBy("word", "pos").collect():
        out.setdefault(r["word"], []).append(r["sym"])
    return out


def test_bpe_merge_identical_symbol_run_fuses_leftmost_nonoverlapping(spark):
    # 'aaaa' x3 dominates: pair (a,a) has overlapping count 3*3=9.
    # Greedy leftmost fusion must yield ['aa','aa'], never ['a','aa','a'].
    seq = _seq_from_words(spark, {"aaaa": 3, "bc": 1})
    new_seq, mrow = _merge_round(seq, 1)
    m = mrow.collect()[0]
    assert (m["left_sym"], m["right_sym"], m["weight"]) == ("a", "a", 9)
    syms = _word_syms(new_seq)
    assert syms["aaaa"] == ["aa", "aa"]
    assert syms["bc"] == ["b", "c"]


def test_bpe_merge_odd_run_keeps_trailing_symbol(spark):
    # 'aaa': matches at pos 1,2 -> fuse pos1 only -> ['aa','a'].
    seq = _seq_from_words(spark, {"aaa": 2})
    new_seq, _ = _merge_round(seq, 1)
    assert _word_syms(new_seq)["aaa"] == ["aa", "a"]


def test_bpe_merge_disjoint_occurrences_all_fuse(spark):
    # 'abab': (a,b) occurs at pos 1 and 3 (disjoint islands) -> ['ab','ab'].
    seq = _seq_from_words(spark, {"abab": 5, "zz": 1})
    new_seq, mrow = _merge_round(seq, 1)
    m = mrow.collect()[0]
    assert (m["left_sym"], m["right_sym"], m["weight"]) == ("a", "b", 10)
    assert _word_syms(new_seq)["abab"] == ["ab", "ab"]


def test_bpe_tie_break_is_lexicographic(spark):
    # (x,y) and (p,q) both weight 1 -> lexicographically smaller pair wins.
    seq = _seq_from_words(spark, {"xy": 1, "pq": 1})
    _, mrow = _merge_round(seq, 1)
    m = mrow.collect()[0]
    assert (m["left_sym"], m["right_sym"]) == ("p", "q")


def test_bpe_second_round_operates_on_merged_symbols(spark):
    # Round 1 on 'abab...' merges (a,b); round 2 must see 'ab' as ONE
    # symbol and merge ('ab','ab').
    seq = _seq_from_words(spark, {"abab": 4})
    seq, _ = _merge_round(seq, 1)
    seq, mrow2 = _merge_round(seq, 2)
    m = mrow2.collect()[0]
    assert (m["left_sym"], m["right_sym"], m["sym"]) == ("ab", "ab", "abab")
    assert _word_syms(seq)["abab"] == ["abab"]


def test_pps_sample_exact_pick_count_and_weight_bias(spark, sf_dir):
    df = REGISTRY["corpus_weighted_sample_pps"].builder(spark, sf_dir).toPandas()
    assert int(df["n_picks"].sum()) == PPS_K
    assert (df["n_picks"] >= 1).all() and (df["wt"] > 0).all()
    # systematic PPS: mean weight of picked docs must exceed the corpus
    # mean weight (picks land proportional to weight)
    import duckdb

    corpus_mean = duckdb.sql(
        f"SELECT AVG(n_chars) FROM read_parquet('{sf_dir}/documents.parquet')"
    ).fetchone()[0]
    picked_mean = float((df["wt"] * df["n_picks"]).sum() / df["n_picks"].sum())
    assert picked_mean > corpus_mean


def test_skew_diagnostics_frame_shape_and_shares(spark, sf_dir):
    df = REGISTRY["q98_skew_diagnostics"].builder(spark, sf_dir).toPandas()
    hh = df[df["kind"] == "heavy_hitter"]
    assert len(hh) == HH_TOP
    # shares are basis points of total rows; heavy hitters sorted by rank
    total = int(df.loc[df["kind"] == "total_rows", "cnt"].iloc[0])
    assert ((hh["cnt"] * 10000 // total) == hh["bp"]).all()
    assert hh.sort_values("rk")["cnt"].is_monotonic_decreasing
    # uniform-ish fixture: max/avg skew below 3x
    skew = int(df.loc[df["kind"] == "max_over_avg_bp", "bp"].iloc[0])
    assert 10000 <= skew < 30000


def test_data_quality_audit_clean_fixture_has_zero_violations(spark, sf_dir):
    df = REGISTRY["q100_data_quality_checks"].builder(spark, sf_dir).toPandas()
    assert len(df) == 10
    bad = df[~df["ok"]]
    assert bad.empty, f"fixture should audit clean, got: {bad.to_dict('records')}"


def test_frequent_pairs_respect_apriori_property(spark, sf_dir):
    pairs = REGISTRY["q101_frequent_pairs_apriori"].builder(spark, sf_dir).toPandas()
    if pairs.empty:
        pytest.skip("no frequent pairs at this SF")
    # adaptive relative support: threshold derives from the basket count
    import duckdb

    n_baskets = duckdb.sql(
        f"SELECT COUNT(DISTINCT l_orderkey) FROM read_parquet('{sf_dir}/lineitem.parquet')"
    ).fetchone()[0]
    s = max(MINSUP, n_baskets // SUP_PER_BASKETS)
    assert (pairs["min_support"] == s).all()
    assert (pairs["support"] >= s).all()
    assert (pairs["part_a"] < pairs["part_b"]).all()
    # a-priori: every item in a frequent pair is itself frequent
    l1 = {
        r[0]
        for r in duckdb.sql(
            f"""SELECT item FROM (SELECT DISTINCT l_orderkey AS b, l_partkey AS item
                FROM read_parquet('{sf_dir}/lineitem.parquet'))
                GROUP BY item HAVING COUNT(*) >= {s}"""
        ).fetchall()
    }
    items = set(pairs["part_a"]) | set(pairs["part_b"])
    assert items <= l1


def test_semantic_dedup_resolves_planted_clones_and_only_them(spark, sf_dir):
    import numpy as np

    df = REGISTRY["dedup_semantic_clusters"].builder(spark, sf_dir).toPandas()
    emb = (
        REGISTRY["dedup_semantic_clusters"]
        .builder(spark, sf_dir)
        .sparkSession.read.parquet(f"{sf_dir}/embeddings.parquet")
        .toPandas()
    )
    n_base = len(emb)
    # every corpus vector exactly once (base + 20 planted clones)
    assert len(df) == n_base + 20
    assert df["vec_id"].is_unique
    # exactly the 20 clones dropped; each pair keeps the ORIGINAL
    assert int((~df["kept"]).sum()) == 20
    assert df.loc[df["vec_id"] < 20, "kept"].all()
    assert (~df.loc[df["vec_id"] >= 10000, "kept"]).all()
    # clone and original share component and cell
    by_id = df.set_index("vec_id")
    for v in range(20):
        assert by_id.loc[v, "cell_id"] == by_id.loc[v + 10000, "cell_id"]
        assert by_id.loc[v, "component"] == by_id.loc[v + 10000, "component"]
    # kept set: no surviving within-cluster pair at the threshold
    vecs = {int(r.vec_id): np.asarray(r.embedding, dtype=float) for r in emb.itertuples()}
    kept = df[df["kept"]]
    for cell, grp in kept.groupby("cell_id"):
        ids = [v for v in grp["vec_id"] if v in vecs]
        m = np.stack([vecs[v] / np.linalg.norm(vecs[v]) for v in ids])
        sims = m @ m.T
        np.fill_diagonal(sims, 0.0)
        assert sims.max() < 0.95, f"cell {cell} still has a near-dup pair"


# --- differential BPE property test -------------------------------------
# Reference implementation: Sennrich-style counting (overlapping zip pairs,
# word-frequency weighted) + greedy leftmost non-overlapping fusion.

def _ref_best_pair(words: dict[str, int], seqs: dict[str, list[str]]):
    from collections import Counter

    counts: Counter = Counter()
    for w, syms in seqs.items():
        for a, b in zip(syms, syms[1:]):
            counts[(a, b)] += words[w]
    if not counts:
        return None
    # count DESC, then lexicographic pair
    return min(counts.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1]))


def _ref_apply(syms: list[str], pair: tuple[str, str]) -> list[str]:
    out, i = [], 0
    while i < len(syms):
        if i + 1 < len(syms) and (syms[i], syms[i + 1]) == pair:
            out.append(syms[i] + syms[i + 1])
            i += 2
        else:
            out.append(syms[i])
            i += 1
    return out


def _ref_merge_round(words: dict[str, int], seqs: dict[str, list[str]]):
    best = _ref_best_pair(words, seqs)
    assert best is not None
    (a, b), cnt = best
    return (a, b, cnt), {w: _ref_apply(s, (a, b)) for w, s in seqs.items()}


from hypothesis import given, settings
from hypothesis import strategies as st

_word = st.text(alphabet="ab", min_size=2, max_size=8)
_words = st.dictionaries(_word, st.integers(min_value=1, max_value=9),
                         min_size=1, max_size=6)


@pytest.mark.filterwarnings("ignore::hypothesis.errors.HypothesisWarning")
@settings(max_examples=12, deadline=None)
@given(words=_words)
def test_bpe_merge_round_matches_reference_implementation(spark, words):
    # alphabet {a,b} maximizes identical-symbol runs and pair collisions —
    # the corners where the window/island dataflow could diverge from the
    # sequential reference
    seqs = {w: list(w) for w in words}
    (ra, rb, rcnt), ref_seqs = _ref_merge_round(words, seqs)
    seq_df = _seq_from_words(spark, words)
    new_seq, mrow = _merge_round(seq_df, 1)
    m = mrow.collect()[0]
    assert (m["left_sym"], m["right_sym"], m["weight"]) == (ra, rb, rcnt)
    assert _word_syms(new_seq) == ref_seqs


# --- plan-quality gates (the tests/test_plan_quality.py discipline) ------

def _plan(spark, name, sf_dir):
    return (
        REGISTRY[name]
        .builder(spark, sf_dir)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )


def test_q101_apriori_prune_broadcasts_and_never_cartesians(spark, sf_dir):
    plan = _plan(spark, "q101_frequent_pairs_apriori", sf_dir)
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan


def test_bpe_trainer_plan_is_jvm_side(spark, sf_dir):
    # the whole K-round trainer must stay in JVM expressions: no scalar
    # Python UDF, no Arrow batch eval; the only BNLJ nodes are the 1-row
    # best-pair broadcasts
    plan = _plan(spark, "text_bpe_vocab_merges", sf_dir)
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert "CartesianProduct" not in plan
    assert "partial_count" in plan or "partial_sum" in plan  # map-side combine


def test_semantic_dedup_floor_path_is_jvm_side(spark, sf_dir):
    # at the k=16 floor the assignment is a pure expression; the GEMM
    # pandas UDF only engages above the floor (probed, not fixture-visible)
    plan = _plan(spark, "dedup_semantic_clusters", sf_dir)
    assert "ArrowEvalPython" not in plan and "BatchEvalPython" not in plan


def test_q98_profile_runs_on_key_cardinality_frame(spark, sf_dir):
    # every consumer (heavy hitters, share denominator, summary) must read
    # the PERSISTED per-key count frame: the fact table fills the cache
    # once, so each of the three count subtrees goes through
    # InMemoryTableScan. (Don't compare against FileScan counts: the plan
    # STRING embeds the cached child's scan inside every InMemoryRelation,
    # and a warm-session re-invocation prints it twice more — execution
    # still scans once.)
    plan = _plan(spark, "q98_skew_diagnostics", sf_dir)
    assert plan.count("InMemoryTableScan") == 3


def test_bpe_encode_token_mass_matches_trainer_vocab(spark, sf_dir):
    # cross-operator invariant: the encode half's total token count equals
    # the train half's vocab weight mass (sum over words of wcnt * n_syms)
    enc = REGISTRY["text_bpe_encode"].builder(spark, sf_dir).toPandas()
    tr = REGISTRY["text_bpe_vocab_merges"].builder(spark, sf_dir).toPandas()
    vocab_mass = int(tr.loc[tr["kind"] == "vocab", "weight"].sum())
    assert int(enc["n_tokens"].sum()) == vocab_mass
    assert enc["doc_id"].is_unique and (enc["n_tokens"] > 0).all()


def test_merge_apply_leaves_untouched_partitions_files_alone(spark, tmp_path):
    import os

    from pyspark.sql import functions as F

    from limeqo_spark.pipeline.cdc import merge_apply

    path = str(tmp_path / "tbl")
    df = spark.createDataFrame(
        [(1, 10, "A"), (2, 20, "A"), (3, 30, "B"), (4, 40, "B")],
        "k long, v long, part string",
    )
    df.write.mode("overwrite").partitionBy("part").parquet(path)

    def listing(part):
        d = os.path.join(path, f"part={part}")
        return sorted(
            (f, os.path.getmtime(os.path.join(d, f)))
            for f in os.listdir(d)
            if not f.startswith(("_", "."))
        )

    before_b = listing("B")
    changes = spark.createDataFrame(
        [(1, 11, "A", "U"), (2, 20, "A", "D"), (5, 50, "A", "I")],
        "k long, v long, part string, op string",
    )
    merge_apply(spark, path, changes, key_col="k", part_col="part")
    # partition B: byte-identical file set, untouched mtimes
    assert listing("B") == before_b
    back = {(r.k, r.v, r.part) for r in spark.read.parquet(path).collect()}
    assert back == {(1, 11, "A"), (5, 50, "A"), (3, 30, "B"), (4, 40, "B")}


def test_snapshot_diff_applied_via_merge_reproduces_new(spark, tmp_path):
    """diff(old, new) applied to old reproduces new, THROUGH the real
    library functions (cdc.snapshot_diff -> cdc.merge_apply), including
    the ADVICE r7 failure cases: a delete whose partition value exists
    only on the OLD side (D rows must carry the old payload or the delete
    lands in a NULL partition bucket and is silently skipped) and
    NULL<->value payload flips (detection must be null-safe)."""
    from limeqo_spark.pipeline.cdc import merge_apply, snapshot_diff

    path = str(tmp_path / "tbl2")
    old = spark.createDataFrame(
        # k=2 will be DELETED (its part exists only here); k=7 has a NULL
        # payload that flips to a value (null-safe U); k=8 value -> NULL
        [
            (1, 10, "A"),
            (2, 20, "A"),
            (3, 30, "B"),
            (4, 40, "B"),
            (5, 50, "B"),
            (7, None, "B"),
            (8, 80, "A"),
        ],
        "k long, v long, part string",
    )
    new = spark.createDataFrame(
        [
            (1, 11, "A"),
            (3, 30, "B"),
            (4, 44, "B"),
            (5, 50, "B"),
            (6, 60, "A"),
            (7, 70, "B"),
            (8, None, "A"),
        ],
        "k long, v long, part string",
    )
    old.write.mode("overwrite").partitionBy("part").parquet(path)
    changes = snapshot_diff(old, new, key_col="k", payload_cols=["v", "part"])
    ops = {r.k: r.op for r in changes.collect()}
    assert ops == {1: "U", 2: "D", 4: "U", 6: "I", 7: "U", 8: "U"}, ops
    # the delete carries its OLD partition value, not NULL
    assert [r.part for r in changes.collect() if r.k == 2] == ["A"]
    merge_apply(spark, path, changes, key_col="k", part_col="part")
    back = {(r.k, r.v, r.part) for r in spark.read.parquet(path).collect()}
    assert back == {(r.k, r.v, r.part) for r in new.collect()}


def test_snapshot_diff_merge_roundtrip_randomized(spark, tmp_path):
    """Seeded randomized diff->merge roundtrip: 300-key snapshots with
    NULL-dense payloads, random deletes/updates/inserts and NULL<->value
    flips across 3 partitions — merge_apply(old_path, snapshot_diff(old,
    new)) must reproduce new exactly. Every partition always retains at
    least one row (the documented full-partition-delete limitation is out
    of scope here; keys never move partitions per the stable-key
    contract)."""
    import numpy as np

    from limeqo_spark.pipeline.cdc import merge_apply, snapshot_diff

    rng = np.random.default_rng(13)
    parts = ["A", "B", "C"]

    def payload():
        return None if rng.random() < 0.25 else int(rng.integers(0, 50))

    old_rows = [(k, payload(), parts[k % 3]) for k in range(300)]
    new_rows = []
    for k, v, p in old_rows:
        r = rng.random()
        if r < 0.15 and k >= 3:  # delete (keep keys 0,1,2 so no partition empties)
            continue
        if r < 0.55:
            new_rows.append((k, payload(), p))  # maybe-update (incl. NULL flips)
        else:
            new_rows.append((k, v, p))  # unchanged
    new_rows += [(1000 + k, payload(), parts[k % 3]) for k in range(40)]  # inserts

    schema = "k long, v long, part string"
    old = spark.createDataFrame(old_rows, schema)
    new = spark.createDataFrame(new_rows, schema)
    path = str(tmp_path / "rt")
    old.write.mode("overwrite").partitionBy("part").parquet(path)
    changes = snapshot_diff(old, new, key_col="k", payload_cols=["v", "part"])
    merge_apply(spark, path, changes, key_col="k", part_col="part")
    back = {(r.k, r.v, r.part) for r in spark.read.parquet(path).collect()}
    assert back == set(new_rows)
