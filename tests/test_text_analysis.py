

class TestPmiCollocations:
    def test_planted_collocation_ranks_first(self, spark):
        from db_integration_via_kafka_ksql_spark.operators.text_analysis import (
            pmi_collocations,
        )

        # "aurora borealis" always adjacent and exclusive; filler words
        # pair freely so their PMI is ~0
        filler = "the of and to in for on at by it"
        docs = spark.createDataFrame(
            [(i, f"{filler} aurora borealis {filler}") for i in range(10)],
            "doc_id long, text string",
        )
        rows = pmi_collocations(docs, min_count=5, top_k=5).collect()
        assert rows, "expected collocations"
        top = rows[0]
        assert (top["w1"], top["w2"]) == ("aurora", "borealis")
        assert top["pmi_micro"] > 0
        # c("aurora")=c("borealis")=c_xy=10 -> lift = N/10, PMI = ln(N/10)
        import math

        n_total = sum(r["c_xy"] for r in [top]) and 10 * 21  # 21 bigrams/doc
        want = math.log(n_total / 10)
        assert abs(top["pmi_micro"] / 1e6 - want) < 1e-4

    def test_min_count_filters_rare_pairs(self, spark):
        from db_integration_via_kafka_ksql_spark.operators.text_analysis import (
            pmi_collocations,
        )

        docs = spark.createDataFrame(
            [(1, "rare pair"), (2, "x y"), (3, "x y"), (4, "x y"),
             (5, "x y"), (6, "x y")],
            "doc_id long, text string",
        )
        rows = pmi_collocations(docs, min_count=5, top_k=10).collect()
        got = {(r["w1"], r["w2"]) for r in rows}
        assert ("rare", "pair") not in got
        assert ("x", "y") in got


class TestWeightedSample:
    def _docs(self, spark, weights):
        rows = [(i, "x" * w, "s", w) for i, w in enumerate(weights)]
        return spark.createDataFrame(
            rows, "doc_id long, text string, source string, n_chars long"
        )

    def test_matches_python_model(self, spark):
        import hashlib
        import math

        from db_integration_via_kafka_ksql_spark.operators.text_analysis import (
            weighted_sample_per_stratum,
        )

        weights = [5, 50, 500, 17, 1, 99, 3, 1000]
        docs = self._docs(spark, weights)
        got = [
            (r["doc_id"], r["priority_nano"], r["rnk"])
            for r in weighted_sample_per_stratum(
                docs, k=3, seed="w0"
            ).orderBy("rnk").collect()
        ]

        def pri(i, w):
            h = int(hashlib.md5(f"w0|{i}".encode()).hexdigest()[:15], 16)
            # math.log vs det-ln differ < 3e-6 -> compare with slack below
            return math.floor(1e9 * math.log((1 << 60) / (h + 1)) / max(w, 1))

        want = sorted(
            ((pri(i, w), i) for i, w in enumerate(weights))
        )[:3]
        assert [(d, r) for d, _, r in got] == [
            (i, rnk) for rnk, (_, i) in enumerate(want, start=1)
        ]
        for (_, p_nano, _), (p_want, _) in zip(got, want):
            assert abs(p_nano - p_want) <= 5000  # det-ln vs libm slack

    def test_heavy_docs_win_more_often(self, spark):
        from db_integration_via_kafka_ksql_spark.operators.text_analysis import (
            weighted_sample_per_stratum,
        )

        # one doc carries ~half the total weight; over 40 independent
        # salts it must win far more often than the 1/100 of uniform
        docs = self._docs(spark, [1000] + [10] * 99)
        wins = 0
        for salt in range(40):
            top = weighted_sample_per_stratum(
                docs, k=1, seed=f"s{salt}"
            ).collect()
            wins += top[0]["doc_id"] == 0
        assert wins >= 10, wins  # E[wins] ~= 20; P(<10) is negligible


def test_curriculum_order_shape_and_determinism(spark):
    """Easy-first bucket order, dense global positions, salt independence
    (same salt = identical order, new salt = different within-bucket
    order but identical bucket membership)."""
    from db_integration_via_kafka_ksql_spark.operators.text_analysis import (
        curriculum_order,
    )

    rows = [
        # high-quality docs: long, diverse
        (i, " ".join(f"tok{i}w{j}" for j in range(60))) for i in range(4)
    ] + [
        # low-quality docs: short, repetitive
        (10 + i, "the the the the the") for i in range(4)
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    a = {r["doc_id"]: tuple(r)[1:] for r in curriculum_order(docs).collect()}
    b = {r["doc_id"]: tuple(r)[1:] for r in curriculum_order(docs).collect()}
    assert a == b  # same salt -> bit-identical order
    # dense, unique global positions
    assert sorted(v[2] for v in a.values()) == list(range(len(rows)))
    # every high-quality doc precedes every low-quality doc (easy first)
    hi = {v[2] for k, v in a.items() if k < 4}
    lo = {v[2] for k, v in a.items() if k >= 10}
    assert max(hi) < min(lo)
    # a different salt keeps bucket membership, reshuffles within
    c = {
        r["doc_id"]: tuple(r)[1:]
        for r in curriculum_order(docs, salt="curriculum-v2").collect()
    }
    assert {k: v[0] for k, v in a.items()} == {k: v[0] for k, v in c.items()}
    assert any(a[k][1] != c[k][1] for k in a)


def test_quality_drift_identical_sources_zero(spark):
    """Two sources with identical doc sets drift ~0 from the corpus; a
    source of pure low-quality docs drifts far more; drift is bounded by
    2000 permille (total variation x2)."""
    from db_integration_via_kafka_ksql_spark.operators.text_analysis import (
        quality_drift_by_source,
    )

    good = [" ".join(f"w{i}x{j}" for j in range(60)) for i in range(6)]
    bad = ["the the the the the"] * 6
    rows = (
        [(i, t, "a") for i, t in enumerate(good)]
        + [(100 + i, t, "b") for i, t in enumerate(good)]
        + [(200 + i, t, "junk") for i, t in enumerate(bad)]
    )
    docs = spark.createDataFrame(rows, "doc_id long, text string, source string")
    got = {
        r["source"]: (r["n_docs"], r["drift_permille"])
        for r in quality_drift_by_source(docs).collect()
    }
    assert got["a"] == got["b"]
    assert got["junk"][1] > got["a"][1]
    assert all(0 <= v[1] <= 2000 for v in got.values())
    assert got["a"][0] == 6 and got["junk"][0] == 6
