"""Driver-local small frames without Python workers at execution.

``spark.createDataFrame(list_of_tuples, schema)`` plans a pickled RDD
split into ``defaultParallelism`` slices: every materialization runs
32 tasks (at local[32]) that each block on a Python worker just to
unpickle a handful of rows — measured 0.36 s per noop materialization
vs 0.06 s for the Arrow pandas route, and the blocked no-CPU tasks are
maximally exposed to host stalls (a profiled run showed 62 s of
executor runtime at 0.1 s CPU on exactly such a stage). The Arrow
route ships the rows to the JVM once, driver-side, at plan-build time;
execution never touches Python again — the right shape for the tiny
broadcast dimensions and driver-computed reports these frames carry
(guide §4: keep the Python boundary off the hot path).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def local_df(spark: SparkSession, rows, schema) -> DataFrame:
    """Arrow-backed replacement for ``spark.createDataFrame(rows,
    schema)`` on small driver-local row lists.

    ``schema`` is a DDL string or StructType and is authoritative:
    values are built into an object-dtype pandas frame (so pandas
    never coerces ints to floats around Nones) and converted by Arrow
    against the declared types — same values, same nullability as the
    pickle path for the exact ints/strings/float-lists these sites
    produce.
    """
    import pandas as pd
    from pyspark.sql.types import StructType

    if isinstance(schema, str):
        from pyspark.sql.types import _parse_datatype_string
        st = _parse_datatype_string(schema)
    else:
        st = schema
    assert isinstance(st, StructType), st
    rows = list(rows)
    if not rows:
        # empty pandas frames lose column identity; the plain path
        # yields an empty LocalRelation with no Python at exec time
        return spark.createDataFrame([], schema=st)
    names = [f.name for f in st.fields]
    data = {n: pd.Series([r[i] for r in rows], dtype=object)
            for i, n in enumerate(names)}
    return spark.createDataFrame(pd.DataFrame(data), schema=st)
