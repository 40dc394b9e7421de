

class TestHistogramQuantiles:
    def test_within_one_bucket_of_exact(self, spark, sf_dir):
        import numpy as np

        from db_integration_via_kafka_ksql_spark.io import load_table
        from db_integration_via_kafka_ksql_spark.operators.relational import (
            histogram_quantiles,
        )

        ev = load_table(spark, sf_dir, "events")
        vals = np.array([r["value"] for r in ev.select("value").collect()])
        width = (vals.max() - vals.min()) / 256
        got = {
            r["q_permille"]: r["approx_value"]
            for r in histogram_quantiles(ev, "value").collect()
        }
        for q, v in got.items():
            exact = float(np.quantile(vals, q / 1000))
            assert exact <= v + 1e-9, (q, v, exact)   # upper-edge answer
            assert v - exact <= 2 * width, (q, v, exact)

    def test_degenerate_single_value(self, spark):
        from db_integration_via_kafka_ksql_spark.operators.relational import (
            histogram_quantiles,
        )

        df = spark.createDataFrame([(7.5,)] * 10, "value double")
        rows = histogram_quantiles(df, "value").collect()
        assert {r["approx_value"] for r in rows} == {7.5}
        assert {r["n_total"] for r in rows} == {10}
