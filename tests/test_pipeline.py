"""End-to-end: CDC-replayed transcript table -> training dataset shards."""

from __future__ import annotations

from pyspark.sql import functions as F

from aqueduct_core_spark.feedgen import generate_change_feed, write_segments
from aqueduct_core_spark.lake.table import LakeTable
from aqueduct_core_spark.pipeline import (
    build_training_dataset,
    pack_conversations,
    plan_shards,
)
from aqueduct_core_spark.streaming.engine import IngestEngine
from aqueduct_core_spark.transcripts import read_transcripts

from tests.util import ev, events_df


def test_pack_preserves_turn_order(spark, tmp_path):
    t = LakeTable.create(
        spark, str(tmp_path / "t"),
        __import__("aqueduct_core_spark.schema", fromlist=["x"]).TRANSCRIPT_PHYSICAL_SCHEMA,
        bucket_key="conv_id", n_buckets=4,
    )
    from aqueduct_core_spark.lake.merge import merge_change_batch

    batch = [
        ev(1, conv="A", turn=2, role="assistant", text="third"),
        ev(2, conv="A", turn=0, role="user", text="first"),
        ev(3, conv="A", turn=1, role="assistant", text="second"),
    ]
    merge_change_batch(t, events_df(spark, batch), batch_id=0)
    packed = pack_conversations(read_transcripts(t)).collect()
    assert packed[0]["document"] == "user: first\nassistant: second\nassistant: third"
    assert packed[0]["n_turns"] == 3


def test_full_dataset_build_from_replayed_feed(spark, tmp_path):
    feed_dir = str(tmp_path / "feed")
    feed = generate_change_feed(spark, 3000, 80, 8, seed=9, ts_jitter_s=10)
    write_segments(feed, feed_dir, n_segments=3)
    eng = IngestEngine(spark, str(tmp_path / "tbl"), str(tmp_path / "ckpt"),
                       n_buckets=8, merge_mode="mor")
    eng.run(feed_dir, max_files_per_trigger=3)

    transcripts = read_transcripts(LakeTable(spark, eng.table_root))
    ds = build_training_dataset(transcripts, tokens_per_shard=500, min_quality=0.0)
    rows = ds.orderBy("conv_id").collect()
    assert rows, "dataset should not be empty"
    # shard ids are contiguous from 0 and token budgets roughly respected
    shard_tokens = {}
    for r in rows:
        shard_tokens.setdefault(r["shard_id"], 0)
        shard_tokens[r["shard_id"]] += r["n_tokens"]
    assert min(shard_tokens) == 0
    assert sorted(shard_tokens) == list(range(len(shard_tokens)))
    # every shard except possibly the last stays within budget + one document
    max_doc = max(r["n_tokens"] for r in rows)
    for sid, tok in shard_tokens.items():
        if sid != max(shard_tokens):
            assert tok <= 500 + max_doc
    # documents are unique (exact dedup ran)
    docs = [r["document"] for r in rows]
    assert len(docs) == len(set(docs))


def test_plan_shards_deterministic(spark):
    df = spark.createDataFrame(
        [(f"c{i}", 100) for i in range(10)], "conv_id string, n_tokens int"
    )
    a = [(r["conv_id"], r["shard_id"]) for r in plan_shards(df, 250).collect()]
    b = [(r["conv_id"], r["shard_id"]) for r in plan_shards(df, 250).collect()]
    assert a == b
    sizes = {}
    for _, s in a:
        sizes[s] = sizes.get(s, 0) + 1
    # floor((100*(i-1))/250) over i=1..10 -> shard sizes 3,2,3,2
    assert sizes == {0: 3, 1: 2, 2: 3, 3: 2}


def test_plan_shards_distributed_equals_single_window(spark):
    """The distributed prefix-sum planner must reproduce the single-global-
    window reference plan exactly, on skewed token counts and string keys."""
    from aqueduct_core_spark.pipeline import plan_shards_single

    rows = [(f"c{i:04d}", (i * 37) % 400 + 1) for i in range(500)]
    df = spark.createDataFrame(rows, "conv_id string, n_tokens int")
    for n_chunks in (2, 7, 16):
        dist = {
            r["conv_id"]: r["shard_id"]
            for r in plan_shards(df, 1000, n_chunks=n_chunks).collect()
        }
        single = {
            r["conv_id"]: r["shard_id"]
            for r in plan_shards_single(df, 1000).collect()
        }
        assert dist == single


def test_plan_shards_no_single_partition_exchange(spark):
    """The production planner's physical plan must not funnel the corpus
    through Exchange SinglePartition (the 100 TB bottleneck the single-window
    form has)."""
    from aqueduct_core_spark.plans.inspect import explain_str
    from aqueduct_core_spark.pipeline import plan_shards_single

    rows = [(f"c{i:04d}", 100) for i in range(300)]
    df = spark.createDataFrame(rows, "conv_id string, n_tokens int")
    dist_plan = explain_str(plan_shards(df, 1000, n_chunks=8), "simple")
    assert "Exchange SinglePartition" not in dist_plan
    # sanity: the single-window twin DOES have it (proves the assertion bites)
    single_plan = explain_str(plan_shards_single(df, 1000), "simple")
    assert "Exchange SinglePartition" in single_plan


def test_plan_shards_heavy_hitter_guard(spark):
    """50% of rows on ONE order_col key: the sampled bounds would otherwise
    lump the hot key plus wide neighbor ranges into one serializing chunk.
    The guard re-splits over-cap chunks within their bound range; the hot key
    itself ends up isolated (a single key cannot be range-split), and every
    OTHER chunk stays under the row cap."""
    from aqueduct_core_spark.pipeline import _refined_bounds, plan_shards, plan_shards_single

    rows = [("hot", 10)] * 600 + [(f"k{i:04d}", 10) for i in range(600)]
    df = spark.createDataFrame(rows, "conv_id string, n_tokens int")

    n_chunks = 16
    bounds, stats = _refined_bounds(df, "conv_id", n_chunks)
    cap = 4.0 * 1200 / n_chunks  # 300 rows
    # reconstruct chunk -> distinct-key count to identify single-key chunks
    from aqueduct_core_spark.pipeline import _chunk_expr
    from pyspark.sql import functions as F

    per_chunk = {
        r["_chunk"]: (r["n"], r["keys"])
        for r in df.withColumn("_chunk", _chunk_expr("conv_id", bounds))
        .groupBy("_chunk")
        .agg(F.count(F.lit(1)).alias("n"), F.countDistinct("conv_id").alias("keys"))
        .collect()
    }
    assert any(n > cap and keys == 1 for n, keys in per_chunk.values()), (
        "hot key should be isolated into its own chunk"
    )
    assert all(n <= cap for n, keys in per_chunk.values() if keys > 1), (
        f"multi-key chunks must be under the row cap: {per_chunk}"
    )

    # correctness unchanged: the shard assignment multiset equals the global-
    # window form (hot rows all carry equal n_tokens, so the multiset is
    # order-independent among ties)
    out = sorted(
        (r["conv_id"], r["n_tokens"], r["shard_id"])
        for r in plan_shards(df, tokens_per_shard=100, n_chunks=n_chunks).collect()
    )
    single = sorted(
        (r["conv_id"], r["n_tokens"], r["shard_id"])
        for r in plan_shards_single(df, tokens_per_shard=100).collect()
    )
    assert out == single


def test_plan_shards_balance_no_runt_last_shard(spark):
    """balance=True wires the refinement stats' corpus token total into shard
    sizing: boundaries at k*total/n_shards in exact integer math. Under the
    heavy-hitter skew corpus every shard — including the LAST — stays within
    +/-10% of the requested budget, where the literal-budget default leaves a
    -69% runt; and the balanced assignment equals an exact driver-side
    reference computation on a varied-size corpus."""
    rows = [("hot", 10)] * 600 + [(f"k{i:04d}", 10) for i in range(600)]
    df = spark.createDataFrame(rows, "conv_id string, n_tokens int")

    def shard_tokens(collected):
        out = {}
        for r in collected:
            out[r["shard_id"]] = out.get(r["shard_id"], 0) + r["n_tokens"]
        return out

    base = shard_tokens(plan_shards(df, 130, n_chunks=16).collect())
    assert min(base.values()) == 40  # the runt: 12000 % 130 — what balance fixes

    bal = shard_tokens(plan_shards(df, 130, n_chunks=16, balance=True).collect())
    assert sorted(bal) == list(range(len(bal)))  # contiguous shard ids
    assert len(bal) == 92  # round(12000 / 130)
    assert all(abs(tok - 130) <= 13 for tok in bal.values()), bal  # +/-10%, last incl.

    # varied doc sizes, distinct keys: balanced output == exact reference
    vrows = [(f"c{i:04d}", (i * 37) % 40 + 1) for i in range(500)]
    vdf = spark.createDataFrame(vrows, "conv_id string, n_tokens int")
    got = {
        r["conv_id"]: r["shard_id"]
        for r in plan_shards(vdf, 700, n_chunks=8, balance=True).collect()
    }
    total = sum(t for _, t in vrows)
    n_shards = max(1, round(total / 700))
    start, expect = 0, {}
    for k, t in sorted(vrows):
        expect[k] = (start * n_shards) // total
        start += t
    assert got == expect
    vtok = {}
    for k, t in sorted(vrows):
        vtok[expect[k]] = vtok.get(expect[k], 0) + t
    assert all(abs(tok - 700) <= 70 for tok in vtok.values()), vtok


def test_plan_shards_balance_parallelism_invariant(spark):
    """balance=True must be a deterministic function of the DATA: the
    empty-bounds branch (small corpus / n_chunks=1) uses the same exact
    integer formula (start*n_shards div total) as the chunked path, not the
    rounded-budget floor — the two disagree at e.g. total=10, budget=3,
    start=7 (exact: 7*3//10=2; rounded budget ceil(10/3)=4: 7//4=1), so the
    old fallback made shard assignment vary with parallelism."""
    df = spark.createDataFrame(
        [("a", 4), ("b", 3), ("c", 3)], "conv_id string, n_tokens int"
    )
    want = {"a": 0, "b": 1, "c": 2}  # exact boundary-spread assignment
    for n_chunks in (1, 2):
        got = {
            r["conv_id"]: r["shard_id"]
            for r in plan_shards(df, 3, n_chunks=n_chunks, balance=True).collect()
        }
        assert got == want, (n_chunks, got)


def test_plan_shards_property_random_corpora(spark):
    """Property: for random corpora, BOTH planner modes equal an exact
    driver-side reference — default mode the literal floor(cumsum/budget),
    balance mode the boundary-spread start*n//total — across chunk counts
    (including ones that exercise refinement)."""
    from hypothesis import given, settings, strategies as st

    @settings(max_examples=8, deadline=None)
    @given(
        n_docs=st.integers(min_value=3, max_value=120),
        budget=st.integers(min_value=5, max_value=500),
        n_chunks=st.sampled_from([1, 2, 5, 16]),
        seed=st.integers(min_value=0, max_value=10_000),
    )
    def check(n_docs, budget, n_chunks, seed):
        import random as _r

        rng = _r.Random(seed)
        rows = [(f"k{i:05d}", rng.randint(1, 80)) for i in range(n_docs)]
        df = spark.createDataFrame(rows, "conv_id string, n_tokens int")
        total = sum(t for _, t in rows)

        got_plain = {
            r["conv_id"]: r["shard_id"]
            for r in plan_shards(df, budget, n_chunks=n_chunks).collect()
        }
        got_bal = {
            r["conv_id"]: r["shard_id"]
            for r in plan_shards(df, budget, n_chunks=n_chunks, balance=True).collect()
        }
        n_shards = max(1, round(total / budget))
        start, exp_plain, exp_bal = 0, {}, {}
        for k, t in sorted(rows):
            exp_plain[k] = start // budget
            exp_bal[k] = (start * n_shards) // total
            start += t
        assert got_plain == exp_plain
        assert got_bal == exp_bal

    check()


def test_top_k_per_group_values_and_plan(spark):
    from aqueduct_core_spark.pipeline import top_k_per_group
    from aqueduct_core_spark.plans.inspect import explain_str
    from pyspark.sql import functions as F

    rows = [(f"d{i:03d}", "en" if i % 4 else "de", float(i % 7)) for i in range(120)]
    df = spark.createDataFrame(rows, "doc_id string, lang string, quality double")
    out = top_k_per_group(df, ["lang"], [F.desc("quality"), F.col("doc_id")], 5)
    got = {(r["lang"], r["rank"]): r["doc_id"] for r in out.collect()}
    # oracle: python sort per group
    want = {}
    for lang in ("en", "de"):
        grp = sorted(
            ((q, d) for d, l, q in rows if l == lang), key=lambda t: (-t[0], t[1])
        )[:5]
        for rk, (q, d) in enumerate(grp, 1):
            want[(lang, rk)] = d
    assert got == want
    # scale shape: rank<=k must trigger Spark's WindowGroupLimit pushdown so
    # each task keeps at most k rows per group BEFORE the window shuffle —
    # the skew guard under a dominant group
    assert "WindowGroupLimit" in explain_str(out, "simple")


def test_quality_mix_deterministic(spark):
    from aqueduct_core_spark.pipeline import quality_mix

    rows = [
        (i, "the and is of to " * (i % 5 + 1), "en" if i % 3 else "de")
        for i in range(60)
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string, lang string")
    a = sorted(tuple(r) for r in quality_mix(df, 7, "lang").collect())
    b = sorted(tuple(r) for r in quality_mix(df, 7, "lang").collect())
    assert a == b and len(a) == 14  # reproducible, quota respected per stratum
