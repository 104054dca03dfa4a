"""Deterministic sampling / splits: content-stable, partition-stable."""

import pytest
from pyspark.sql import functions as F

from zzzarchived_arxiv_fulltext_spark.operators.sampling import (
    deterministic_sample,
    hash_split,
    split_boundaries,
)


@pytest.fixture(scope="module")
def docs(spark):
    return spark.range(0, 2000).select(F.col("id").alias("doc_id"))


def test_sample_is_stable_under_repartition(spark, docs):
    a = {r["doc_id"] for r in deterministic_sample(docs, 0.2).collect()}
    b = {r["doc_id"] for r in
         deterministic_sample(docs.repartition(7), 0.2).collect()}
    assert a == b
    assert 0.15 < len(a) / 2000 < 0.25  # ~20%


def test_sample_is_monotone_in_fraction(docs):
    small = {r["doc_id"] for r in deterministic_sample(docs, 0.1).collect()}
    big = {r["doc_id"] for r in deterministic_sample(docs, 0.3).collect()}
    assert small <= big  # growing the rate only ADDS documents


def test_sample_stable_under_corpus_growth(spark, docs):
    grown = spark.range(0, 4000).select(F.col("id").alias("doc_id"))
    before = {r["doc_id"] for r in deterministic_sample(docs, 0.2).collect()}
    after = {r["doc_id"]
             for r in deterministic_sample(grown, 0.2).collect()}
    assert before == {d for d in after if d < 2000}  # old members unchanged


def test_split_is_disjoint_exhaustive_and_sized(docs):
    out = hash_split(docs, {"train": 0.8, "val": 0.1, "test": 0.1})
    counts = {r["split"]: r["n"] for r in
              out.groupBy("split").agg(F.count("*").alias("n")).collect()}
    assert sum(counts.values()) == 2000
    assert 0.74 < counts["train"] / 2000 < 0.86
    assert counts["val"] > 0 and counts["test"] > 0
    # re-running yields byte-identical assignment
    again = hash_split(docs, {"train": 0.8, "val": 0.1, "test": 0.1})
    assert out.exceptAll(again).isEmpty()


def test_split_boundaries_and_validation(docs):
    bounds = split_boundaries({"a": 1, "b": 1}, buckets=100)
    assert bounds == [("a", 50), ("b", 100)]
    with pytest.raises(ValueError):
        split_boundaries({"a": 0.0})
    with pytest.raises(ValueError):
        deterministic_sample(docs, 1.5)


def test_split_is_a_pure_projection(spark, docs):
    import contextlib
    import io

    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        hash_split(docs, {"train": 0.9, "val": 0.1}).explain("formatted")
    plan = buf.getvalue()
    assert "Exchange" not in plan and "Python" not in plan


def test_stratified_sample_rates_and_stability(spark):
    from zzzarchived_arxiv_fulltext_spark.operators.sampling import (
        stratified_sample,
    )

    docs = spark.range(0, 3000).select(
        F.col("id").alias("doc_id"),
        F.when(F.col("id") % 3 == 0, "en")
        .when(F.col("id") % 3 == 1, "de").otherwise("fr").alias("lang"),
    )
    out = stratified_sample(docs, {"en": 0.5, "de": 0.1},
                            default_rate=0.0)
    counts = {r["lang"]: r["n"] for r in
              out.groupBy("lang").agg(F.count("*").alias("n")).collect()}
    assert 0.4 < counts["en"] / 1000 < 0.6
    assert 0.05 < counts["de"] / 1000 < 0.16
    assert "fr" not in counts  # default rate 0 drops the stratum
    # per-stratum membership is the global sample restricted to it
    from zzzarchived_arxiv_fulltext_spark.operators.sampling import (
        deterministic_sample,
    )
    en_ids = {r["doc_id"] for r in out.where("lang = 'en'").collect()}
    global_half = {r["doc_id"] for r in
                   deterministic_sample(docs, 0.5).collect()}
    assert en_ids == {i for i in global_half if i % 3 == 0}

    import pytest
    with pytest.raises(ValueError):
        stratified_sample(docs, {"en": 2.0})


def test_token_budget_shards_are_contiguous_and_sized(spark):
    from zzzarchived_arxiv_fulltext_spark.operators.sampling import (
        shard_by_token_budget,
    )

    docs = spark.createDataFrame(
        [(i, "w " * 99 + "w") for i in range(40)],  # 100 tokens each
        "doc_id int, text string",
    )
    rows = sorted(
        (r["doc_id"], r["shard"], r["n_tokens"])
        for r in shard_by_token_budget(docs, budget_tokens=1000).collect()
    )
    assert all(n == 100 for _, _, n in rows)
    # 10 docs of 100 tokens per 1000-token shard, in id order
    assert [s for _, s, _ in rows] == [i // 10 for i in range(40)]

    import pytest
    with pytest.raises(ValueError):
        shard_by_token_budget(docs, budget_tokens=0)


def test_token_budget_shards_string_ids_match_global_order(spark):
    """String-id path (prefix buckets): result == a global id-ordered
    prefix sum, stable under repartitioning."""
    from zzzarchived_arxiv_fulltext_spark.operators.sampling import (
        shard_by_token_budget,
    )

    rows = [(f"doc-{i:04d}" if i % 3 else f"d{i}", "tok " * (i % 17 + 1))
            for i in range(300)]
    docs = spark.createDataFrame(rows, "doc_id string, text string")
    got = {(r["doc_id"], r["shard"], r["n_tokens"])
           for r in shard_by_token_budget(docs, 200).collect()}
    # closed-form expectation: exclusive prefix sum in id order
    expected = set()
    acc = 0
    for doc_id, text in sorted(rows, key=lambda r: r[0]):
        n = len(text.split(" "))
        expected.add((doc_id, acc // 200, n))
        acc += n
    assert got == expected
    again = {(r["doc_id"], r["shard"], r["n_tokens"])
             for r in shard_by_token_budget(docs.repartition(7), 200)
             .collect()}
    assert again == expected


def test_token_budget_shards_numeric_nonuniform_ids(spark):
    """Numeric path with gappy, clustered ids: result == the closed-
    form global prefix sum."""
    from zzzarchived_arxiv_fulltext_spark.operators.sampling import (
        shard_by_token_budget,
    )

    ids = ([3, 4, 5] + list(range(1000, 1060)) +
           [10**9, 10**9 + 7] + list(range(500000, 500020)))
    rows = [(i, "tok " * ((i * 13) % 23 + 1)) for i in ids]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    got = {(r["doc_id"], r["shard"])
           for r in shard_by_token_budget(docs, 150).collect()}
    acc, expected = 0, set()
    for i, text in sorted(rows):
        n = len(text.split(" "))
        expected.add((i, acc // 150))
        acc += n
    assert got == expected


def test_deterministic_shuffle_is_seeded_and_stable(spark):
    from zzzarchived_arxiv_fulltext_spark.operators.sampling import (
        deterministic_shuffle,
    )

    base = spark.range(0, 200).select(F.col("id").alias("doc_id"))
    a = [r["doc_id"] for r in deterministic_shuffle(base, "s1").collect()]
    b = [r["doc_id"] for r in
         deterministic_shuffle(base.repartition(7), "s1").collect()]
    c = [r["doc_id"] for r in deterministic_shuffle(base, "s2").collect()]
    assert a == b                      # partition-stable
    assert a != c                      # seed changes the order
    assert sorted(a) == list(range(200))
    assert a != list(range(200))       # actually shuffled


def test_length_buckets_power_of_two(spark):
    from zzzarchived_arxiv_fulltext_spark.operators.sampling import (
        length_buckets,
    )

    docs = spark.createDataFrame(
        [(1, "w"), (2, "w " * 7 + "w"), (3, "w " * 15 + "w"),
         (4, "w " * 16 + "w")],
        ["doc_id", "text"],
    )
    got = {r["doc_id"]: (r["n_tokens"], r["len_bucket"])
           for r in length_buckets(docs).collect()}
    assert got[1] == (1, 0)
    assert got[2] == (8, 3)
    assert got[3] == (16, 4)
    assert got[4] == (17, 4)


def test_token_budget_shards_plan_has_no_global_sort(spark):
    """The 10^12-row guard: no single-partition exchange anywhere in
    the sharding plan — the prefix sum is partitioned by the
    order-preserving bucket (VERDICT r2 #1)."""
    import contextlib
    import io

    from zzzarchived_arxiv_fulltext_spark.operators.sampling import (
        shard_by_token_budget,
    )

    for schema, rows in (
        ("doc_id string, text string", [("a1", "x y z")] * 8),
        ("doc_id int, text string", [(1, "x y z")] * 8),
    ):
        df = spark.createDataFrame(rows, schema)
        out = shard_by_token_budget(df, 100)
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            out.explain("formatted")
        plan = buf.getvalue()
        assert "Exchange SinglePartition" not in plan, plan
        assert "SinglePartition" not in plan, plan


def test_weighted_sample_topk_matches_exact_replay(spark):
    """A-ES selection must equal an exact Python replay of the same
    hash-uniform keys, and heavy docs must dominate inclusion."""
    import hashlib
    import math

    from zzzarchived_arxiv_fulltext_spark.operators.sampling import (
        weighted_sample_topk,
    )

    rows = [(i, (i % 10) + 1) for i in range(200)] + [
        (900, None), (901, 0), (902, -5)]      # excluded weights
    df = spark.createDataFrame(rows, "doc_id long, w long")
    got = sorted(r["doc_id"]
                 for r in weighted_sample_topk(df, "w", 30).collect())

    def es_key(i, w):
        h = int(hashlib.md5(f"ws|{i}".encode()).hexdigest()[:8], 16)
        u = (float(h) + 1.0) / float((1 << 32) + 1)
        return math.log(u) / w

    expect = sorted(i for i, _ in sorted(
        ((i, es_key(i, w)) for i, w in rows if w and w > 0),
        key=lambda t: -t[1])[:30])
    assert got == expect
    # inclusion leans heavy: mean weight of the sample > corpus mean
    wmap = dict(rows)
    assert sum(wmap[i] for i in got) / 30 > 5.5


def test_weighted_sample_topk_plans_as_topk(spark):
    """orderBy().limit(k) must plan as TakeOrderedAndProject — a
    per-partition heap merge, never a global sort."""
    import contextlib
    import io

    from zzzarchived_arxiv_fulltext_spark.operators.sampling import (
        weighted_sample_topk,
    )

    df = spark.range(1000).select(
        F.col("id").alias("doc_id"), (F.col("id") % 7 + 1).alias("w"))
    out = weighted_sample_topk(df, "w", 10)
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        out.explain("formatted")
    plan = buf.getvalue()
    assert "TakeOrderedAndProject" in plan, plan


def test_sample_tokens_per_stratum_budget_and_stability(spark):
    import hashlib

    from zzzarchived_arxiv_fulltext_spark.operators.sampling import (
        sample_tokens_per_stratum,
    )

    rows = [(i, "en" if i % 2 else "de", "w " * ((i % 5) + 1))
            for i in range(60)]
    df = spark.createDataFrame(rows, ["doc_id", "lang", "text"])
    got = sample_tokens_per_stratum(df, {"en": 20, "de": 15})
    per = {r["doc_id"]: r for r in got.collect()}

    # exact replay: hash order, cumulative token floor per stratum
    expect = {}
    for lang, budget in (("en", 20), ("de", 15)):
        members = [(i, (i % 5) + 1) for i, l, _ in rows if l == lang]
        members.sort(key=lambda t: hashlib.md5(
            f"mix|{t[0]}".encode()).hexdigest())
        cum = 0
        for i, nt in members:
            cum += nt
            if cum > budget:
                break
            expect[i] = nt
    assert {i: r["n_tokens"] for i, r in per.items()} == expect
    # budgets are floors: never exceeded
    for lang, budget in (("en", 20), ("de", 15)):
        assert sum(r["n_tokens"] for r in per.values()
                   if r["lang"] == lang) <= budget
    # stable under repartitioning
    again = {r["doc_id"] for r in sample_tokens_per_stratum(
        df.repartition(7), {"en": 20, "de": 15}).collect()}
    assert again == set(per)


def test_pack_sequences_exact_replay_and_invariants(spark):
    import hashlib

    from zzzarchived_arxiv_fulltext_spark.operators.sampling import (
        pack_sequences,
    )

    rows = [(i, " ".join(f"d{i}w{j}" for j in range((i % 7) + 2)))
            for i in range(40)] + [(100, ""), (101, "   ")]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    L = 16
    got = {r["seq_id"]: r for r in pack_sequences(df, L).collect()}

    # independent replay
    docs = [(i, t.split()) for i, t in rows if t.split()]
    docs.sort(key=lambda d: hashlib.md5(f"pack|{d[0]}".encode())
              .hexdigest())
    stream = [w for _, ws in docs for w in ws]
    expect = {k: stream[k * L:(k + 1) * L]
              for k in range((len(stream) + L - 1) // L)}
    assert set(got) == set(expect)
    for k, toks in expect.items():
        assert got[k]["seq_text"].split() == toks, k
        assert got[k]["n_tokens"] == len(toks)
        assert got[k]["complete"] == int(len(toks) == L)
    # every sequence but (possibly) the last is exactly full
    full = [k for k in sorted(got) if got[k]["complete"]]
    assert full == sorted(got)[:len(full)]
    # stable under repartitioning
    again = {r["seq_id"]: r["seq_text"] for r in
             pack_sequences(df.repartition(7), L).collect()}
    assert again == {k: r["seq_text"] for k, r in got.items()}


def test_mixture_weights_shares_and_cap(spark):
    from zzzarchived_arxiv_fulltext_spark.operators.sampling import (
        mixture_weights,
    )

    df = spark.createDataFrame(
        [(1, "en", "w " * 70), (2, "en", "w " * 9),
         (3, "de", "w " * 10), (4, "xx", "w " * 10)],
        "doc_id long, lang string, text string")
    got = {r["stratum"]: r for r in mixture_weights(
        df, {"en": 0.5, "de": 0.5}, cap=3.0).collect()}
    # token counts: en 71+10=81, de 11, xx 11 → total 103
    assert got["en"]["n_tokens"] == 81 and got["de"]["n_tokens"] == 11
    assert abs(got["en"]["actual_share"] - 81 / 103) < 1e-6
    assert got["en"]["target_share"] == 0.5
    # de must upsample but the cap binds: 0.5/(11/103) ≈ 4.68 → 3.0
    assert got["de"]["weight"] == 3.0
    # stratum outside the target mix → weight 0
    assert got["xx"]["target_share"] == 0.0 and got["xx"]["weight"] == 0.0


def test_mixture_weights_validates_targets(spark):
    import pytest

    from zzzarchived_arxiv_fulltext_spark.operators.sampling import (
        mixture_weights,
    )

    df = spark.createDataFrame([(1, "en", "x")],
                               "doc_id long, lang string, text string")
    with pytest.raises(ValueError):
        mixture_weights(df, {})
    with pytest.raises(ValueError):
        mixture_weights(df, {"en": 0.0})


def test_leakage_safe_split_keeps_clusters_together(spark):
    from zzzarchived_arxiv_fulltext_spark.operators.sampling import (
        hash_split,
        leakage_safe_split,
    )

    docs = spark.createDataFrame(
        [(i, f"text {i}") for i in range(40)], "doc_id long, text string")
    # two planted clusters: {3, 17, 29} (a chain, exercising >1
    # propagation round) and {5, 11}
    pairs = spark.createDataFrame(
        [(3, 17), (17, 29), (5, 11)], "id_a long, id_b long")
    weights = {"train": 0.6, "val": 0.2, "test": 0.2}

    out = {r["doc_id"]: r for r in
           leakage_safe_split(docs, pairs, weights).collect()}

    assert out[3]["cluster"] == out[17]["cluster"] == out[29]["cluster"] == 3
    assert out[3]["split"] == out[17]["split"] == out[29]["split"]
    assert out[5]["cluster"] == out[11]["cluster"] == 5
    assert out[5]["split"] == out[11]["split"]

    # singletons are bit-identical to plain hash_split
    plain = {r["doc_id"]: r["split"]
             for r in hash_split(docs, weights).collect()}
    clustered = {3, 17, 29, 5, 11}
    for i in range(40):
        assert out[i]["cluster"] == (out[i]["cluster"] if i in clustered
                                     else i)
        if i not in clustered:
            assert out[i]["split"] == plain[i], i


def test_dsir_importance_weights_tilts_toward_target(spark):
    from zzzarchived_arxiv_fulltext_spark.operators.sampling import (
        dsir_importance_weights,
    )

    raw = spark.createDataFrame(
        [(1, "aa aa aa"), (2, "bb bb bb"), (3, "aa bb"),
         (4, "cc cc cc")],
        "doc_id int, text string",
    )
    target = spark.createDataFrame(
        [(100, "aa aa aa aa")], "doc_id int, text string")
    out = {r["doc_id"]: r for r in dsir_importance_weights(
        raw, target, buckets=16).collect()}
    assert {d: r["n_tokens"] for d, r in out.items()} == {
        1: 3, 2: 3, 3: 2, 4: 3}
    # the all-'aa' doc must outscore the no-'aa' docs; 'cc' (absent
    # from target AND distinct raw mass) scores below the mixed doc
    assert out[1]["log_weight"] > out[3]["log_weight"]
    assert out[3]["log_weight"] > out[2]["log_weight"]
    # every-token-unseen-in-target docs get negative weights
    assert out[2]["log_weight"] < 0 and out[4]["log_weight"] < 0


def test_dsir_weights_zero_for_empty_docs(spark):
    from zzzarchived_arxiv_fulltext_spark.operators.sampling import (
        dsir_importance_weights,
    )

    raw = spark.createDataFrame(
        [(1, "x y"), (2, "")], "doc_id int, text string")
    target = spark.createDataFrame([(9, "x")], "doc_id int, text string")
    out = {r["doc_id"]: (r["n_tokens"], r["log_weight"])
           for r in dsir_importance_weights(raw, target).collect()}
    assert out[2] == (0, 0.0)
    assert out[1][0] == 2
