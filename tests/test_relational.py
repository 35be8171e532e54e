"""As-of join parity vs pandas merge_asof + edge semantics."""

import pandas as pd
import pytest
from pyspark.sql import functions as F

from qizner_spark.operators.relational import asof_join_backward


@pytest.fixture()
def frames(spark):
    left = spark.createDataFrame(
        [(1, 1, 100), (2, 1, 205), (3, 1, 50), (4, 2, 300), (5, 3, 10)],
        ["lid", "k", "t"],
    )
    right = spark.createDataFrame(
        [(10, 1, 100), (11, 1, 200), (12, 2, 299), (13, 2, 301)],
        ["rid", "k", "t"],
    )
    return left, right


class TestAsofJoin:
    def test_backward_inclusive_matches_pandas(self, spark, frames):
        left, right = frames
        out = {
            (r["lid"], r["rid"]) for r in
            asof_join_backward(left, right.withColumnRenamed("t", "t")
                               .select("k", F.col("t"), "rid"),
                               on="k", ts_col="t").collect()
        }
        lp = pd.DataFrame([(1, 1, 100), (2, 1, 205), (3, 1, 50), (4, 2, 300), (5, 3, 10)],
                          columns=["lid", "k", "t"]).sort_values("t")
        rp = pd.DataFrame([(10, 1, 100), (11, 1, 200), (12, 2, 299), (13, 2, 301)],
                          columns=["rid", "k", "t"]).sort_values("t")
        want_df = pd.merge_asof(lp, rp, on="t", by="k", direction="backward")
        want = {
            (int(r.lid), int(r.rid) if pd.notna(r.rid) else None)
            for r in want_df.itertuples()
        }
        assert out == want
        # the inclusive edge: left t=100 matches right t=100
        assert (1, 10) in out
        # no-prior-right rows survive with null payload
        assert (3, None) in out and (5, None) in out

    def test_no_pair_explosion_plan(self, spark, frames):
        left, right = frames
        df = asof_join_backward(left, right.select("k", "t", "rid"), on="k", ts_col="t")
        df.collect()
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "BroadcastNestedLoopJoin" not in plan
        assert "CartesianProduct" not in plan

    def test_payload_collision_rejected(self, spark, frames):
        left, right = frames
        with pytest.raises(ValueError, match="lid"):
            asof_join_backward(
                left, right.withColumnRenamed("rid", "lid").select("k", "t", "lid"),
                on="k", ts_col="t",
            )

    def test_null_payload_field_stays_row_consistent(self, spark):
        """A right row carrying NULL in one payload column must NOT
        have that column back-filled from an EARLIER right row — all
        payload columns come from the same (latest) right row."""
        left = spark.createDataFrame([(1, 1, 300)], ["lid", "k", "t"])
        right = spark.createDataFrame(
            [(10, 1.5, 1, 100), (11, None, 1, 200)],
            "rid long, val double, k long, t long",
        )
        rows = asof_join_backward(
            left, right.select("k", "t", "rid", "val"), on="k", ts_col="t"
        ).collect()
        assert len(rows) == 1
        # latest right row is rid=11 whose val is legitimately NULL;
        # mixing would yield (rid=11, val=1.5)
        assert rows[0]["rid"] == 11 and rows[0]["val"] is None

    def test_tiebreak_must_be_payload(self, spark, frames):
        left, right = frames
        with pytest.raises(ValueError, match="tiebreak"):
            asof_join_backward(left, right.select("k", "t", "rid"),
                               on="k", ts_col="t", tiebreak="nope")

    def test_equal_ts_tiebreak_last_wins(self, spark):
        left = spark.createDataFrame([(1, 1, 100)], ["lid", "k", "t"])
        right = spark.createDataFrame(
            [(7, 1, 100), (9, 1, 100), (8, 1, 100)], ["rid", "k", "t"]
        )
        rows = asof_join_backward(
            left, right.select("k", "t", "rid"), on="k", ts_col="t", tiebreak="rid"
        ).collect()
        assert len(rows) == 1 and rows[0]["rid"] == 9
