"""local_df (Arrow local frames) must be value- and schema-identical
to the pickled-list createDataFrame it replaces — the r13 optimization
swapped the construction route of several broadcast dimensions and
driver-computed reports (kmeans centroids, markov report, curation
caps/weights, partition/schema dimensions), so this pins equivalence
for exactly the value shapes those sites produce."""

import pytest

from tidb_binlog_spark.localrel import local_df


@pytest.mark.parametrize("rows,schema", [
    ([("a", 1), ("b", 2)], "s string, n bigint"),
    ([(0, [1.5, -2.0]), (1, [0.0, 3.25])], "cid int, c_emb array<double>"),
    ([(0, [10, -20]), (1, [0, 7])], "cid int, cvec array<bigint>"),
    ([(1, 100, None), (2, 200, 300)],
     "active_version int, v_start_ts long, v_end_ts long"),
    ([("ch0", 1000, 900, 100, None)],
     "channel string, full_ppm bigint, removed_ppm bigint, "
     "drop_ppm bigint, share_ppm bigint"),
    ([("src0", 0.25), ("src1", 0.75)], "source string, w double"),
    ([], "s string, n bigint"),
])
def test_local_df_matches_pickled_route(spark, rows, schema):
    via_arrow = local_df(spark, rows, schema)
    via_pickle = spark.createDataFrame(rows, schema)
    assert via_arrow.schema == via_pickle.schema
    assert sorted(map(tuple, via_arrow.collect())) \
        == sorted(map(tuple, via_pickle.collect()))


def test_local_df_execution_uses_no_python_workers(spark):
    """The point of the swap: the plan must not contain a pickled
    Python RDD scan (``Scan ExistingRDD``) — the Arrow route plans a
    JVM-local relation/parallelized rows with no Python at exec."""
    df = local_df(spark, [("a", 1)], "s string, n bigint")
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "existingrdd" not in plan.lower(), plan
