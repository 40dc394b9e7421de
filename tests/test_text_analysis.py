

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
