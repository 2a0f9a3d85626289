"""CLI surface: pipeline run + SQL over the produced warehouse + query
runner — the engine's spark-submit job parity (SURVEY.md §3.1/§3.2)."""

from __future__ import annotations

import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from data_lakehouse_spark.__main__ import main  # noqa: E402


def test_cli_pipeline_sql_tables(spark, sf_dir, tmp_path, capsys):
    wh = str(tmp_path / "wh")
    rc = main([
        "pipeline",
        "--input", f"{sf_dir}/events.parquet",
        "--warehouse", wh,
        "--cart-type", "click",
        "--as-of-date", "2024-02-01",
    ])
    assert rc == 0
    stats = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert stats["silver"]["mode"] == "create"
    assert stats["gold"]

    rc = main([
        "sql", "--warehouse", wh,
        "-e", "SELECT COUNT(*) AS n FROM silver_events",
    ])
    assert rc == 0
    row = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert row["n"] > 0

    rc = main(["tables", "--warehouse", wh])
    assert rc == 0
    names = {
        json.loads(l)["table"]
        for l in capsys.readouterr().out.strip().splitlines()
    }
    assert {"bronze_events", "silver_events"} <= names


def test_cli_dashboards(spark, sf_dir, tmp_path, capsys):
    out_dir = tmp_path / "superset_bundle"
    rc = main([
        "dashboards", "--sf-dir", sf_dir, "--out", str(out_dir),
    ])
    assert rc == 0
    report = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert report["errors"] == []
    assert len(report["charts"]) == 7
    assert (out_dir / "bundle.zip").exists()


def test_cli_query_runner(spark, sf_dir, capsys):
    rc = main([
        "query", "--name", "tpch_q6_forecast_revenue",
        "--sf-dir", sf_dir, "--limit", "5",
    ])
    assert rc == 0
    out = capsys.readouterr().out.strip().splitlines()
    assert json.loads(out[-1])["revenue"] > 0
    assert main(["query", "--name", "nope", "--sf-dir", sf_dir]) == 2


def test_cli_changes(spark, tmp_path, capsys):
    from data_lakehouse_spark.catalog import Catalog

    wh = str(tmp_path / "wh")
    cat = Catalog(spark, wh)
    cat.create_table("t", spark.createDataFrame([(1, "a")], ["id", "v"]))
    cat.append("t", spark.createDataFrame([(2, "b")], ["id", "v"]))
    rc = main([
        "changes", "--warehouse", wh, "--table", "t",
        "--from-version", "0", "--to-version", "1",
    ])
    assert rc == 0
    out = [json.loads(x) for x in capsys.readouterr().out.strip().splitlines()]
    assert out == [{"id": 2, "v": "b", "_change_type": "insert"}]


def test_cli_maintain(spark, tmp_path, capsys):
    from data_lakehouse_spark.catalog import Catalog

    wh = str(tmp_path / "wh")
    cat = Catalog(spark, wh)
    cat.create_table("t", spark.createDataFrame(
        [(i, f"u{i}") for i in range(6)], ["id", "v"]
    ))
    cat.delete_where("t", "id = 0", mode="mor")

    rc = main(["maintain", "row-count", "--warehouse", wh, "--table", "t"])
    assert rc == 0
    assert json.loads(capsys.readouterr().out.strip())["rows"] == 5

    rc = main(["maintain", "rewrite-deletes", "--warehouse", wh,
               "--table", "t"])
    assert rc == 0
    assert json.loads(
        capsys.readouterr().out.strip()
    )["delete_dirs_removed"] == 1

    rc = main(["maintain", "rollback", "--warehouse", wh, "--table", "t",
               "--version", "0"])
    assert rc == 0
    capsys.readouterr()
    rc = main(["maintain", "row-count", "--warehouse", wh, "--table", "t"])
    assert json.loads(capsys.readouterr().out.strip())["rows"] == 6

    rc = main(["maintain", "compact", "--warehouse", wh, "--table", "t"])
    assert rc == 0
    assert json.loads(capsys.readouterr().out.strip())["files_after"] >= 1


def test_cli_maintain_sweep_ann_policy(spark, tmp_path, capsys):
    """CLI `maintain sweep --ann-rebuild-after N`: the policy sweep
    rebuilds a drifted IVF-PQ index from its recorded source table."""
    from pyspark.sql import functions as F

    from data_lakehouse_spark.catalog import Catalog
    from data_lakehouse_spark.operators import similarity

    wh = str(tmp_path / "wh")
    cat = Catalog(spark, wh)
    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    cat.create_table("vectors", emb)
    similarity.build_ivf_pq_index(
        cat, cat.read("vectors"), "pq",
        k=8, m=8, sample_size=64, source_table="vectors",
    )
    onehot = spark.createDataFrame(
        [(90_000 + i, [1.0 if j == i else 0.0 for j in range(64)])
         for i in range(16)],
        "vec_id long, embedding array<double>",
    )
    cat.append("vectors", onehot)
    similarity.add_to_ivf_pq_index(cat, "pq", onehot, drift_factor=0.01)
    assert cat.table_properties("pq")["index.drift_consecutive"] == "1"

    rc = main(["maintain", "sweep", "--warehouse", wh, "--table", "pq",
               "--ann-rebuild-after", "1", "--dry-run"])
    assert rc == 0
    out = json.loads(capsys.readouterr().out.strip())
    acts = [a for a in out["actions"] if a["action"] == "rebuild_ivf_pq_index"]
    assert len(acts) == 1 and "result" not in acts[0]

    rc = main(["maintain", "sweep", "--warehouse", wh, "--table", "pq",
               "--ann-rebuild-after", "1"])
    assert rc == 0
    out = json.loads(capsys.readouterr().out.strip())
    acts = [a for a in out["actions"] if a["action"] == "rebuild_ivf_pq_index"]
    assert len(acts) == 1 and acts[0]["result"]["rebuilt"] is True
    assert cat.table_properties("pq")["index.drift_consecutive"] == "0"
    assert (
        cat.read("pq").filter(F.col("vec_id") >= 90_000).count() == 16
    )


def test_cli_maintain_refs(spark, tmp_path, capsys):
    """tag / branch / fast-forward through the CLI."""
    from data_lakehouse_spark.catalog import Catalog

    wh = str(tmp_path / "wh")
    cat = Catalog(spark, wh)
    cat.create_table("t", spark.createDataFrame([(1,)], "id long"))

    rc = main(["maintain", "tag", "--warehouse", wh, "--table", "t",
               "--ref", "rel1"])
    assert rc == 0
    assert json.loads(capsys.readouterr().out.strip())["tag"] == "rel1"
    assert [r["id"] for r in cat.read("t", tag="rel1").collect()] == [1]

    rc = main(["maintain", "branch", "--warehouse", wh, "--table", "t",
               "--ref", "wip"])
    assert rc == 0
    capsys.readouterr()
    cat.append("t", spark.createDataFrame([(2,)], "id long"), branch="wip")
    rc = main(["maintain", "fast-forward", "--warehouse", wh, "--table", "t",
               "--ref", "wip"])
    assert rc == 0
    assert json.loads(
        capsys.readouterr().out.strip()
    )["fast_forwarded_from"] == "wip"
    assert sorted(r["id"] for r in cat.read("t").collect()) == [1, 2]

    rc = main(["maintain", "clone", "--warehouse", wh, "--table", "t",
               "--ref", "t_dev"])
    assert rc == 0
    assert json.loads(capsys.readouterr().out.strip())["cloned_to"] == "t_dev"
    assert sorted(r["id"] for r in cat.read("t_dev").collect()) == [1, 2]


def test_cli_export_import_roundtrip(spark, tmp_path, capsys):
    """export → (external table on disk) → import into a second
    warehouse: the inbound+outbound migration story end to end, both
    formats."""
    from data_lakehouse_spark.catalog import Catalog

    wh = str(tmp_path / "wh")
    cat = Catalog(spark, wh)
    cat.create_table(
        "t", spark.createDataFrame([(1, "a"), (2, "b")], "id long, v string")
    )

    for fmt in ("iceberg", "delta"):
        dest = str(tmp_path / f"ext_{fmt}")
        rc = main([
            "export", "--warehouse", wh, "--table", "t",
            "--dest", dest, "--format", fmt,
        ])
        assert rc == 0
        out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
        assert out["rows"] == 2 and not out["materialized"]

        wh2 = str(tmp_path / f"wh2_{fmt}")
        rc = main([
            "import", "--warehouse", wh2, "--table", "t_in",
            "--source", dest, "--format", fmt,
        ])
        assert rc == 0
        out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
        assert out["rows"] == 2
        got = Catalog(spark, wh2).read("t_in")
        assert sorted((r["id"], r["v"]) for r in got.collect()) == [
            (1, "a"), (2, "b"),
        ]

    # history export via CLI
    cat.append("t", spark.createDataFrame([(3, "c")], "id long, v string"))
    hist = str(tmp_path / "ext_hist")
    rc = main([
        "export", "--warehouse", wh, "--table", "t",
        "--dest", hist, "--format", "iceberg", "--history",
    ])
    assert rc == 0
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert len(out["snapshots"]) == 2


def test_cli_models_and_sql_dml(spark, tmp_path, capsys):
    """models verb (the dbt-run analog) + DML through the sql verb."""
    wh = str(tmp_path / "whm")
    md = tmp_path / "models"
    md.mkdir()
    (md / "base_nums.sql").write_text(
        "{{ config(materialized='table') }}\n"
        "SELECT * FROM VALUES (1, 'a'), (2, 'b'), (3, 'a') AS v(n, k)"
    )
    (md / "k_counts.sql").write_text(
        "{{ config(materialized='table') }}\n"
        "SELECT k, COUNT(*) AS c FROM {{ ref('base_nums') }} GROUP BY k"
    )
    rc = main(["models", "--warehouse", wh, "--dir", str(md)])
    assert rc == 0
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert list(out["models"]) == ["base_nums", "k_counts"]

    rc = main([
        "sql", "--warehouse", wh,
        "-e", "DELETE FROM base_nums WHERE n = 3; "
              "SELECT COUNT(*) AS c FROM base_nums",
    ])
    assert rc == 0
    lines = capsys.readouterr().out.strip().splitlines()
    assert json.loads(lines[-1]) == {"c": 2}
    assert json.loads(lines[-2])["op"] == "delete"


def test_cli_maintain_recover_transactions(spark, tmp_path, capsys):
    """Warehouse-level crash recovery from the CLI: a decided-but-
    unflipped transaction publishes on `maintain recover-transactions`."""
    import json as _json
    import os as _os

    from data_lakehouse_spark.catalog import Catalog
    from data_lakehouse_spark.__main__ import main

    wh = str(tmp_path / "wh")
    cat = Catalog(spark, wh)
    cat.create_table("t", spark.createDataFrame([(1,)], "id long"))
    txn = cat.transaction()
    txn.append("t", spark.createDataFrame([(2,)], "id long"))
    tdir = _os.path.join(wh, "_txn")
    _os.makedirs(tdir, exist_ok=True)
    with open(_os.path.join(tdir, f"{txn.txn_id}.json"), "w") as f:
        _json.dump({"txn_id": txn.txn_id,
                    "tables": {n: v for n, (v, _) in txn._staged.items()}}, f)

    rc = main(["maintain", "recover-transactions", "--warehouse", wh])
    assert rc == 0
    out = _json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["recovered_txn_ids"] == [txn.txn_id]
    assert sorted(r.id for r in cat.read("t").collect()) == [1, 2]


def test_cli_pipeline_dag_and_serving_ddl(spark, sf_dir, tmp_path, capsys):
    """--dag runs the medallion graph (parallel gold fan-out, per-task
    report); serving-ddl prints the generated MergeTree script."""
    wh = str(tmp_path / "wh")
    rc = main([
        "pipeline",
        "--input", f"{sf_dir}/events.parquet",
        "--warehouse", wh,
        "--cart-type", "click",
        "--as-of-date", "2024-02-01",
        "--dag",
    ])
    assert rc == 0
    report = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert report["state"] == "success"
    assert report["tasks"]["build_gold_core"]["state"] == "success"
    assert report["tasks"]["test_gold"]["state"] == "success"
    # dbt-test analog inside the DAG found zero violations
    assert all(v == 0 for v in report["tasks"]["test_gold"]["result"].values())

    rc = main(["serving-ddl", "--warehouse", wh])
    assert rc == 0
    script = capsys.readouterr().out
    assert "CREATE DATABASE IF NOT EXISTS lakehouse;" in script
    assert "CREATE TABLE IF NOT EXISTS lakehouse.daily_sales_summary" in script
    assert "PARTITION BY toYYYYMM(sale_date)" in script
    assert "SETTINGS index_granularity = 8192" in script

    # empty warehouse → exit 1 with the marker comment
    rc = main(["serving-ddl", "--warehouse", str(tmp_path / "empty")])
    assert rc == 1
