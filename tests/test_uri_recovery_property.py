"""Property test: dataset recovery inverts the URI minting rules.

The NT-import path (jobs.run_import_nt_job) depends on
sources/io.py::dataset_of_subject recovering the dataset from every
subject shape the engine mints. Dataset names follow the OpenSpending
convention (alphanumeric + dash, no slash, not dash-terminated); ids
are numeric (ConvertWorker.java:609).
"""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from linkedspending_spark import uris as U
from linkedspending_spark.model import PREFIX_INSTANCE

_ds_names = st.from_regex(r"[a-z0-9]+(-[a-z0-9]+){0,3}", fullmatch=True).filter(
    lambda s: len(s) <= 40
)
_ids = st.integers(min_value=0, max_value=10**9)


@settings(
    max_examples=25,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(st.lists(st.tuples(_ds_names, _ids), min_size=1, max_size=12, unique=True))
def test_dataset_recovery_inverts_minting(cases):
    from pyspark.sql import functions as F

    from linkedspending_spark.session import get_spark
    from linkedspending_spark.sources.io import dataset_of_subject

    spark = get_spark(8, app_name="ls_tests")
    rows = []
    for ds, i in cases:
        rows += [
            (U.dataset_uri_str(ds), ds),
            (U.dsd_uri_str(ds), ds),
            (U.view_uri_str(ds, "v1"), ds),
            (U.observation_uri_str(ds, str(i)), ds),
            (U.skolem_source_uri_str(ds, str(i)), ds),
        ]
    df = spark.createDataFrame(rows, "s string, want string")
    got = df.select(
        "s",
        "want",
        dataset_of_subject(F.col("s"), PREFIX_INSTANCE).alias("got"),
    ).collect()
    for r in got:
        assert r["got"] == r["want"], r["s"]
    # non-instance URIs yield NULL
    ext = spark.createDataFrame(
        [("http://dbpedia.org/resource/Euro",)], "s string"
    ).select(dataset_of_subject(F.col("s"), PREFIX_INSTANCE).alias("got"))
    assert ext.collect()[0]["got"] is None
