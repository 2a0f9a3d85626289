"""dbt-style model runner (models.py): the reference's transform layer
is 8 dbt models on a Thrift endpoint (dbt/models/**, SURVEY.md §3.2) —
the runner executes that template surface (config/ref/source/this/
is_incremental) directly against the versioned catalog."""

from __future__ import annotations

import pytest

from data_lakehouse_spark.catalog import Catalog
from data_lakehouse_spark.models import ModelError, ModelRunner, parse_model


SILVER = """
{{
    config(
        materialized='incremental',
        incremental_strategy='append',
        unique_key='event_id'
    )
}}
SELECT *
FROM {{ source('bronze', 'raw_events') }}
{% if is_incremental() %}
WHERE ingested_at > (SELECT MAX(ingested_at) FROM {{ this }})
{% endif %}
"""

GOLD = """
{{ config(materialized='table', partition_by=['kind']) }}
SELECT kind, COUNT(*) AS n, SUM(amount) AS total
FROM {{ ref('silver_clean') }}
GROUP BY kind
"""

VIEW = """
{{ config(materialized='view') }}
SELECT kind FROM {{ ref('gold_by_kind') }} WHERE n > 1
"""


@pytest.fixture()
def cat(spark, tmp_path):
    return Catalog(spark, str(tmp_path / "wh"))


def _bronze(spark, cat, rows):
    df = spark.createDataFrame(
        rows, "event_id int, kind string, amount double, ingested_at int"
    )
    if cat.table_exists("raw_events"):
        cat.append("raw_events", df)
    else:
        cat.create_table("raw_events", df)


def test_parse_model_extracts_config_and_deps():
    m = parse_model("silver_clean", SILVER)
    assert m.config.materialized == "incremental"
    assert m.config.unique_key == ["event_id"]
    assert m.sources == [("bronze", "raw_events")]
    g = parse_model("gold_by_kind", GOLD)
    assert g.deps == ["silver_clean"]
    assert g.config.partition_by == ["kind"]


def test_parse_rejects_unknown_constructs():
    with pytest.raises(ModelError, match="unsupported template"):
        parse_model("m", "SELECT {{ dbt_utils.star(ref('x')) }} FROM y")
    with pytest.raises(ModelError, match="unknown config key"):
        parse_model("m", "{{ config(sort='x') }} SELECT 1")
    with pytest.raises(ModelError, match="unique_key"):
        parse_model(
            "m",
            "{{ config(materialized='incremental', "
            "incremental_strategy='merge') }} SELECT 1",
        )


def test_dag_run_and_incremental_append(spark, cat):
    _bronze(spark, cat, [(1, "a", 10.0, 1), (2, "b", 5.0, 1)])
    r = ModelRunner(cat, sources={("bronze", "raw_events"): "raw_events"})
    r.add_model("silver_clean", SILVER)
    r.add_model("gold_by_kind", GOLD)
    r.add_model("kinds_hot", VIEW)
    stats = r.run()
    # DAG order: silver before gold before view
    assert list(stats) == ["silver_clean", "gold_by_kind", "kinds_hot"]
    assert stats["silver_clean"]["full_refresh"] is False
    assert cat.row_count("silver_clean") == 2

    # new bronze batch; incremental run only appends the new span
    _bronze(spark, cat, [(3, "a", 1.0, 2), (4, "a", 2.0, 2)])
    stats2 = r.run()
    assert stats2["silver_clean"]["rows_appended"] == 2
    assert cat.row_count("silver_clean") == 4
    gold = {
        row.kind: (row.n, row.total)
        for row in cat.read("gold_by_kind").collect()
    }
    assert gold["a"] == (3, 13.0)
    hot = {row.kind for row in cat.read_view("kinds_hot").collect()}
    assert hot == {"a"}

    # incremental equals a full recompute of the same inputs
    full = ModelRunner(cat, sources={("bronze", "raw_events"): "raw_events"})
    full.add_model("silver_clean", SILVER)
    full.run(full_refresh=True)
    assert cat.row_count("silver_clean") == 4


def test_incremental_merge_strategy(spark, cat):
    _bronze(spark, cat, [(1, "a", 10.0, 1), (2, "b", 5.0, 1)])
    merge_model = """
{{ config(materialized='incremental', incremental_strategy='merge',
          unique_key='event_id') }}
SELECT event_id, kind, amount FROM {{ source('bronze', 'raw_events') }}
{% if is_incremental() %}
WHERE ingested_at >= 2
{% endif %}
"""
    r = ModelRunner(cat)
    r.add_model("events_latest", merge_model)
    r.run()
    assert cat.row_count("events_latest") == 2
    # second batch UPDATES event 2 and inserts event 5
    _bronze(spark, cat, [(2, "b", 99.0, 2), (5, "c", 7.0, 2)])
    out = r.run()
    assert out["events_latest"]["strategy"] == "merge"
    rows = {
        row.event_id: row.amount for row in cat.read("events_latest").collect()
    }
    assert rows == {1: 10.0, 2: 99.0, 5: 7.0}


def test_cycle_detection(cat):
    r = ModelRunner(cat)
    r.add_model("a", "SELECT * FROM {{ ref('b') }}")
    r.add_model("b", "SELECT * FROM {{ ref('a') }}")
    with pytest.raises(ModelError, match="cycle"):
        r.run()


def test_select_subset_pulls_ancestors(spark, cat):
    _bronze(spark, cat, [(1, "a", 10.0, 1)])
    r = ModelRunner(cat)
    r.add_model("silver_clean", SILVER)
    r.add_model("gold_by_kind", GOLD)
    stats = r.run(["gold_by_kind"])  # silver is built first, implicitly
    assert list(stats) == ["silver_clean", "gold_by_kind"]


def test_models_dir_loading(tmp_path, spark, cat):
    d = tmp_path / "models"
    (d / "gold").mkdir(parents=True)
    (d / "silver_clean.sql").write_text(SILVER)
    (d / "gold" / "gold_by_kind.sql").write_text(GOLD)
    _bronze(spark, cat, [(1, "a", 2.0, 1)])
    r = ModelRunner(cat)
    assert sorted(r.add_models_dir(str(d))) == [
        "gold_by_kind", "silver_clean"
    ]
    r.run()
    assert cat.read("gold_by_kind").collect()[0].n == 1


def test_schema_tests(spark, cat):
    _bronze(spark, cat, [(1, "a", 10.0, 1), (1, None, -5.0, 1)])
    r = ModelRunner(cat)
    results = r.test(
        {
            "raw_events": {
                "event_id": ["unique", "not_null"],
                "kind": [
                    "not_null",
                    {"accepted_values": ["a", "b"]},
                ],
            }
        }
    )
    assert results["raw_events.event_id.unique"] == 1
    assert results["raw_events.event_id.not_null"] == 0
    assert results["raw_events.kind.not_null"] == 1
    assert results["raw_events.kind.accepted_values"] == 0  # NULL ignored


def test_relationships_test(spark, cat):
    cat.create_table(
        "dim", spark.createDataFrame([(1,), (2,)], "id int")
    )
    cat.create_table(
        "fact", spark.createDataFrame([(1,), (9,), (None,)], "dim_id int")
    )
    r = ModelRunner(cat)
    results = r.test(
        {"fact": {"dim_id": [{"relationships": {"to": "dim", "field": "id"}}]}}
    )
    assert results["fact.dim_id.relationships"] == 1  # 9 dangles, NULL ok


def test_snapshot_materialization_scd2(spark, cat):
    """materialized='snapshot' — the dbt snapshot / Kimball SCD2 tier:
    changed keys close their validity interval, unchanged re-runs are
    no-ops."""
    src = spark.createDataFrame(
        [(1, "alice", "basic", 100), (2, "bob", "pro", 100)],
        "cust_id int, name string, plan string, at int",
    )
    if cat.table_exists("customers_src"):
        cat.overwrite("customers_src", src)
    else:
        cat.create_table("customers_src", src)
    snap = """
{{ config(materialized='snapshot', unique_key='cust_id',
          updated_at='at', check_cols=['plan']) }}
SELECT cust_id, name, plan, at FROM {{ source('crm', 'customers_src') }}
"""
    r = ModelRunner(cat)
    r.add_model("customers_snap", snap)
    out1 = r.run()["customers_snap"]
    assert out1 == {"materialized": "snapshot", "rows": 2, "current_rows": 2}

    # idempotent: unchanged source re-run adds nothing
    out2 = r.run()["customers_snap"]
    assert out2["rows"] == 2 and out2["current_rows"] == 2

    # bob upgrades plan at t=200 -> old row closes, new current opens
    cat.overwrite(
        "customers_src",
        spark.createDataFrame(
            [(1, "alice", "basic", 200), (2, "bob", "enterprise", 200)],
            "cust_id int, name string, plan string, at int",
        ),
    )
    out3 = r.run()["customers_snap"]
    assert out3["rows"] == 3 and out3["current_rows"] == 2
    rows = cat.read("customers_snap").collect()
    bob = sorted(
        [(row.plan, row.is_current, row.valid_to) for row in rows
         if row.cust_id == 2]
    )
    assert bob == [("enterprise", True, None), ("pro", False, 200)]


def test_snapshot_config_validation():
    with pytest.raises(ModelError, match="unique_key and updated_at"):
        parse_model(
            "s", "{{ config(materialized='snapshot', unique_key='k') }} SELECT 1"
        )


def test_seed_csv_loading(tmp_path, spark, cat):
    """dbt seed parity: CSVs become catalog tables, replace only on
    full_refresh, and models can ref them (via source fallback)."""
    d = tmp_path / "seeds"
    d.mkdir()
    (d / "country_codes.csv").write_text("code,name\nus,United States\nde,Germany\n")
    r = ModelRunner(cat)
    out = r.seed(str(d))
    assert out["country_codes"] == {"seeded": True, "rows": 2}
    # second seed run without full_refresh is a no-op
    (d / "country_codes.csv").write_text("code,name\nfr,France\n")
    assert r.seed(str(d))["country_codes"]["skipped"] == "exists"
    assert cat.row_count("country_codes") == 2
    assert r.seed(str(d), full_refresh=True)["country_codes"]["rows"] == 1
    # a model can join against the seed
    r.add_model(
        "country_upper",
        "{{ config(materialized='table') }} "
        "SELECT upper(code) AS code FROM {{ source('seeds', 'country_codes') }}",
    )
    r.run(["country_upper"])
    assert [row.code for row in cat.read("country_upper").collect()] == ["FR"]
    with pytest.raises(ModelError, match="no .csv seeds"):
        r.seed(str(tmp_path / "empty_nothing"))


def test_atomic_run_publishes_all_models_together(spark, cat):
    """run(atomic=True): silver + gold land in ONE transaction —
    mid-run external readers see the PREVIOUS snapshots of both; after
    the run both are new; downstream models read upstream staged data
    (read-your-own-writes)."""
    _bronze(spark, cat, [(1, "a", 10.0, 1), (2, "b", 5.0, 1)])
    r = ModelRunner(cat, sources={"bronze": {"raw_events": "raw_events"}})
    r.add_model("silver_clean", SILVER)
    r.add_model("gold_by_kind", GOLD)
    stats = r.run(atomic=True)
    assert stats["silver_clean"]["materialized"] == "incremental"
    assert cat.read("silver_clean").count() == 2
    # gold read the STAGED silver (2 rows), not a stale published one
    assert cat.read("gold_by_kind").count() == 2

    # second batch: stage both, verify atomicity by checking history —
    # each table gains staged + publish entries from one transaction
    _bronze(spark, cat, [(3, "a", 1.0, 2)])
    before_silver = cat.read("silver_clean").count()
    stats = r.run(atomic=True)
    assert stats["silver_clean"]["rows_appended"] == 1
    assert cat.read("silver_clean").count() == before_silver + 1
    got = {r_["kind"]: r_["total"] for r_ in cat.read("gold_by_kind").collect()}
    assert got == {"a": 11.0, "b": 5.0}
    # both tables' publish entries carry the SAME txn id
    snaps_s = cat.snapshots("silver_clean").collect()
    snaps_g = cat.snapshots("gold_by_kind").collect()
    assert any(row["operation"] == "publish" for row in snaps_s)
    assert any(row["operation"] == "publish" for row in snaps_g)


def test_atomic_run_aborts_all_on_model_error(spark, cat):
    """A failing downstream model rolls back the upstream's staged
    snapshot too — no partial layer publish."""
    _bronze(spark, cat, [(1, "a", 10.0, 1)])
    r = ModelRunner(cat, sources={"bronze": {"raw_events": "raw_events"}})
    r.add_model("silver_clean", SILVER)
    r.run()  # publish v1 normally
    assert cat.read("silver_clean").count() == 1

    _bronze(spark, cat, [(2, "b", 5.0, 2)])
    r.add_model(
        "gold_broken",
        "{{ config(materialized='table') }}\n"
        "SELECT no_such_column FROM {{ ref('silver_clean') }}",
    )
    with pytest.raises(Exception):
        r.run(atomic=True)
    # the new silver batch was staged but must NOT be published
    assert cat.read("silver_clean").count() == 1
    assert not cat.table_exists("gold_broken") or \
        cat.read("gold_broken").count() == 0


def test_atomic_run_refuses_snapshot_and_merge_models(spark, cat):
    _bronze(spark, cat, [(1, "a", 10.0, 1)])
    r = ModelRunner(cat, sources={"bronze": {"raw_events": "raw_events"}})
    r.add_model(
        "merge_model",
        "{{ config(materialized='incremental', incremental_strategy='merge',"
        " unique_key='event_id') }}\n"
        "SELECT * FROM {{ source('bronze', 'raw_events') }}",
    )
    r.run()  # first run creates the table
    with pytest.raises(ModelError, match="atomic"):
        r.run(atomic=True)


def test_run_parallel_threads_semantics(spark, cat):
    """dbt `threads: N`: independent models materialize concurrently
    while ref() edges still gate dependents; results identical to the
    serial run; failures surface after the graph settles."""
    import time as _time

    _bronze(spark, cat, [(1, "a", 10.0, 1), (2, "b", 5.0, 1)])
    runner = ModelRunner(cat, sources={("bronze", "raw_events"): "raw_events"})
    runner.add_model("silver_clean", SILVER)
    runner.add_model("gold_by_kind", GOLD)
    # two independent marts off silver: they may overlap in wall-clock
    spans = {}
    GOLD2 = """
{{ config(materialized='table') }}
SELECT kind, MAX(amount) AS max_amount
FROM {{ ref('silver_clean') }}
GROUP BY kind
"""
    runner.add_model("gold_max", GOLD2)
    stats = runner.run_parallel(threads=3)
    assert stats["silver_clean"]["materialized"] == "incremental"
    assert stats["gold_by_kind"]["rows"] == 2
    assert stats["gold_max"]["rows"] == 2
    assert cat.read("gold_max").count() == 2
    # dependency order held: gold tables exist and are consistent with
    # silver (2 kinds)
    assert cat.read("gold_by_kind").count() == 2

    # a failing model fails the run AFTER settling, names the model
    runner.add_model(
        "gold_bad",
        "{{ config(materialized='table') }}\n"
        "SELECT nope FROM {{ ref('silver_clean') }}",
    )
    with pytest.raises(ModelError, match="gold_bad"):
        runner.run_parallel(threads=3)


def test_wire_runner_merge_strategy_and_refusals(spark, tmp_path):
    """WireModelRunner beyond the reference set: the MERGE incremental
    strategy over the wire (upsert on unique_key), plus the wire-mode
    refusals — snapshot models refuse BEFORE any statement executes,
    and catalog-backed APIs refuse with a clear error."""
    import pytest as _pytest

    from data_lakehouse_spark import client as dbapi
    from data_lakehouse_spark.catalog import Catalog
    from data_lakehouse_spark.models import ModelError, WireModelRunner
    from data_lakehouse_spark.server import SqlEndpoint

    cat = Catalog(spark, str(tmp_path / "w"))
    cat.create_table(
        "src",
        spark.createDataFrame(
            [(1, "a", 10.0), (2, "b", 20.0)], "id long, seg string, amt double"
        ),
    )
    ep = SqlEndpoint(cat).start()
    try:
        conn = dbapi.connect(port=ep.port)
        r = WireModelRunner(conn)
        r.add_model(
            "m_merge",
            "{{ config(materialized='incremental', "
            "incremental_strategy='merge', unique_key='id') }}\n"
            "SELECT id, seg, amt FROM {{ source('bronze', 'src') }}",
        )
        out1 = r.run()
        assert out1["m_merge"]["full_refresh"] is False  # first build = CTAS
        assert cat.row_count("m_merge") == 2

        # source changes: one update image + one new row -> MERGE upserts
        cat.update_where("src", "id = 1", {"amt": "99.0"})
        cat.append(
            "src",
            spark.createDataFrame([(3, "c", 30.0)], "id long, seg string, amt double"),
        )
        out2 = r.run()
        assert out2["m_merge"]["strategy"] == "merge"
        got = {r_["id"]: r_["amt"] for r_ in cat.read("m_merge").collect()}
        assert got == {1: 99.0, 2: 20.0, 3: 30.0}

        # snapshot refusal happens before ANY statement executes
        r2 = WireModelRunner(conn)
        r2.add_model("v_ok", "SELECT id FROM {{ source('bronze', 'src') }}")
        r2.add_model(
            "snap",
            "{{ config(materialized='snapshot', unique_key='id', "
            "updated_at='amt') }}\n"
            "SELECT id, amt FROM {{ source('bronze', 'src') }}",
        )
        with _pytest.raises(ModelError, match="wire"):
            r2.run()
        assert not cat.table_exists("v_ok") and "v_ok" not in cat.views()

        # catalog-backed APIs refuse loudly
        for call in (lambda: r.seed("x"), lambda: r.test({}), lambda: r.run_parallel()):
            with _pytest.raises(ModelError, match="wire"):
                call()

        # SQL-injection hardening: tblproperties values with embedded
        # quotes are escaped (statement survives), hostile unique_key /
        # partition_by names are refused as invalid identifiers rather
        # than spliced into the generated statement
        r3 = WireModelRunner(conn)
        r3.add_model(
            "m_props",
            "{{ config(materialized='table', "
            "tblproperties={'note': \"it's quoted\"}) }}\n"
            "SELECT id FROM {{ source('bronze', 'src') }}",
        )
        r3.run()
        assert cat.table_exists("m_props")
        assert cat.table_properties("m_props").get("note") == "it's quoted"

        r4 = WireModelRunner(conn)
        r4.add_model(
            "m_badkey",
            "{{ config(materialized='incremental', "
            "incremental_strategy='merge', "
            "unique_key='id = id OR 1=1 --') }}\n"
            "SELECT id FROM {{ source('bronze', 'src') }}",
        )
        r4.run()  # first build is a CTAS — no key splice yet
        with _pytest.raises(ModelError, match="identifier"):
            r4.run()  # incremental MERGE must refuse the hostile key

        r5 = WireModelRunner(conn)
        r5.add_model(
            "m_badpart",
            "{{ config(materialized='table', "
            "partition_by='seg) AS SELECT 1; --') }}\n"
            "SELECT id, seg FROM {{ source('bronze', 'src') }}",
        )
        with _pytest.raises(ModelError, match="identifier"):
            r5.run()
        conn.close()
    finally:
        ep.stop()
