"""DistributedValue: named broadcast values set in the app, read from
remote tasks (builtinfunction.fs:60-97 parity)."""

from __future__ import annotations

from pyspark.sql import functions as F

from prajna_spark.operators.distvalue import get_value, put_value, remove_value


def test_put_get_and_remote_read(spark):
    dv = put_value(spark, "threshold", {"min_len": 3, "tag": "keep"})
    try:
        # driver-side get by name
        assert get_value("threshold").value == {"min_len": 3, "tag": "keep"}

        # remote read: tasks see the broadcast copy, not a driver call
        handle = get_value("threshold")

        def flag(batches):
            import pandas as pd

            cfg = handle.value  # executor-local broadcast block
            for pdf in batches:
                yield pd.DataFrame(
                    {"id": pdf["id"], "keep": pdf["id"] >= cfg["min_len"]}
                )

        out = (
            spark.range(6)
            .mapInPandas(flag, "id long, keep boolean")
            .where(F.col("keep"))
            .count()
        )
        assert out == 3  # ids 3, 4, 5
    finally:
        remove_value("threshold")


def test_reset_replaces_value_for_new_jobs(spark):
    put_value(spark, "gen", 1)
    try:
        assert get_value("gen").value == 1
        put_value(spark, "gen", 2)  # re-set in the app...
        h = get_value("gen")
        got = (
            spark.range(4)
            .mapInPandas(
                lambda it: (pdf.assign(g=h.value) for pdf in it), "id long, g long"
            )
            .select(F.min("g"), F.max("g"))
            .first()
        )
        assert tuple(got) == (2, 2)  # ...and observed remotely
    finally:
        remove_value("gen")


def test_unset_name_returns_none(spark):
    assert get_value("never_set") is None
