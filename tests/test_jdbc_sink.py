"""S9 JDBC sink executed end-to-end against embedded Derby (the JDBC
driver Spark itself bundles for the Hive metastore) — closes the one
environment-limited gap from round 1: the sink code path actually runs,
round-trips, and reproduces the reference's append-vs-overwrite
semantics (sync_gold_to_clickhouse.py:89-98, SURVEY.md §4 #2)."""

from __future__ import annotations

from data_lakehouse_spark.sources.writers import jdbc_sink

DERBY_DRIVER = "org.apache.derby.jdbc.EmbeddedDriver"


def _read(spark, url: str, table: str):
    return (
        spark.read.format("jdbc")
        .option("url", url)
        .option("dbtable", table)
        .option("driver", DERBY_DRIVER)
        .load()
    )


def test_jdbc_sink_roundtrip_and_modes(spark, tmp_path):
    url = f"jdbc:derby:{tmp_path}/derbydb;create=true"
    opts = {"driver": DERBY_DRIVER}
    df = spark.createDataFrame(
        [(1, "a", 10.5), (2, "b", 20.0)], "id long, s string, v double"
    )

    # first sync creates the table; values round-trip exactly
    jdbc_sink(df, url, "gold_mart", options=opts)
    back = _read(spark, url, "gold_mart")
    assert sorted((r.id, r.s, r.v) for r in back.collect()) == [
        (1, "a", 10.5),
        (2, "b", 20.0),
    ]

    # default append reproduces the reference's re-sync duplication quirk
    jdbc_sink(df, url, "gold_mart", options=opts)
    assert _read(spark, url, "gold_mart").count() == 4

    # the fixed behavior: overwrite + truncate is idempotent
    jdbc_sink(
        df, url, "gold_mart", mode="overwrite", options={**opts, "truncate": "true"}
    )
    assert _read(spark, url, "gold_mart").count() == 2
