"""SQL dialect router (sql.py): the dbt-over-Thrift statement surface
(SURVEY.md §3.2) routed onto the versioned catalog — CTAS, INSERT,
UPDATE, DELETE (COW + MOR hint), MERGE INTO, ALTER/DROP, time travel,
views, and CALL procedures, each as a SQL string."""

from __future__ import annotations

import pytest

from data_lakehouse_spark.catalog import Catalog
from data_lakehouse_spark.sql import (
    LakehouseSql,
    SqlError,
    execute_sql,
    execute_sql_script,
    is_query,
    mask_strings,
    split_statements,
    strip_comments,
)


# -- lexical helpers (no Spark) ---------------------------------------------


def test_strip_comments_preserves_literals_and_hints():
    sql = (
        "SELECT '--not a comment', 1 -- real comment\n"
        "/* block */ FROM t /*+ MOR */"
    )
    out = strip_comments(sql)
    assert "'--not a comment'" in out
    assert "real comment" not in out
    assert "block" not in out
    assert "/*+ MOR */" in out


def test_mask_strings_same_length_and_escapes():
    sql = "SELECT 'it''s AS OF' FROM t"
    masked = mask_strings(sql)
    assert len(masked) == len(sql)
    assert "AS OF" not in masked
    assert masked.startswith("SELECT '")
    assert "FROM t" in masked


def test_split_statements_ignores_semicolons_in_literals():
    stmts = split_statements("SELECT 'a;b' AS x; SELECT 2;")
    assert len(stmts) == 2
    assert stmts[0] == "SELECT 'a;b' AS x"


def test_is_query_classification():
    assert is_query("SELECT 1")
    assert is_query("  with x as (select 1) select * from x")
    assert is_query("SHOW TABLES")
    assert not is_query("DELETE FROM t")
    assert not is_query("MERGE INTO t USING s ON t.k = s.k WHEN ...")
    assert not is_query("CALL expire_snapshots('t')")


# -- end-to-end over a catalog ----------------------------------------------


@pytest.fixture()
def cat(spark, tmp_path):
    return Catalog(spark, str(tmp_path / "wh"))


def _seed(cat, spark):
    execute_sql(
        cat,
        "CREATE TABLE accounts AS "
        "SELECT id, name, CAST(balance AS DOUBLE) AS balance FROM VALUES "
        "(1, 'alice', 100.0), (2, 'bob', 50.0), (3, 'carol', 75.0) "
        "AS v(id, name, balance)",
    )


def test_ctas_insert_select_roundtrip(cat, spark):
    _seed(cat, spark)
    assert cat.row_count("accounts") == 3
    stats = execute_sql(
        cat, "INSERT INTO accounts VALUES (4, 'dave', 20.0)"
    )
    assert stats["rows_inserted"] == 1
    df = execute_sql(cat, "SELECT name FROM accounts ORDER BY id")
    assert [r.name for r in df.collect()] == ["alice", "bob", "carol", "dave"]


def test_ctas_modes(cat, spark):
    _seed(cat, spark)
    with pytest.raises(ValueError):
        execute_sql(cat, "CREATE TABLE accounts AS SELECT 1 AS x")
    skipped = execute_sql(
        cat, "CREATE TABLE IF NOT EXISTS accounts AS SELECT 1 AS x"
    )
    assert skipped.get("skipped") is True
    execute_sql(
        cat, "CREATE OR REPLACE TABLE accounts AS SELECT 1 AS x"
    )
    assert cat.read("accounts").columns == ["x"]


def test_ctas_partitioned_and_properties(cat, spark):
    execute_sql(
        cat,
        "CREATE TABLE pt PARTITIONED BY (seg) "
        "TBLPROPERTIES ('owner'='ops', 'tier'='gold') AS "
        "SELECT * FROM VALUES ('a', 1), ('b', 2) AS v(seg, n)",
    )
    props = cat.table_properties("pt")
    assert props.get("owner") == "ops" and props.get("tier") == "gold"
    assert cat.row_count("pt") == 2


def test_update_delete_where(cat, spark):
    _seed(cat, spark)
    up = execute_sql(
        cat,
        "UPDATE accounts SET balance = balance + 10, name = upper(name) "
        "WHERE id <= 2",
    )
    assert up["op"] == "update"
    rows = {
        r.id: (r.name, r.balance)
        for r in execute_sql(cat, "SELECT * FROM accounts").collect()
    }
    assert rows[1] == ("ALICE", 110.0)
    assert rows[3] == ("carol", 75.0)
    execute_sql(cat, "DELETE FROM accounts WHERE balance <= 60.0")
    assert cat.row_count("accounts") == 2  # bob (50+10 = 60.0) deleted


def test_delete_mor_hint(cat, spark):
    _seed(cat, spark)
    stats = execute_sql(cat, "DELETE /*+ MOR */ FROM accounts WHERE id = 2")
    assert stats["mode"] == "mor"
    assert cat.row_count("accounts") == 2
    assert {r.id for r in cat.read("accounts").collect()} == {1, 3}


def test_delete_mor_eq_hint(cat, spark):
    """DELETE /*+ MOR_EQ(key, ...) */ routes to the equality-delete
    write path: key-scoped suppression with sequence semantics (a row
    with a deleted key INSERTed after the delete survives)."""
    _seed(cat, spark)
    stats = execute_sql(
        cat, "DELETE /*+ MOR_EQ(id) */ FROM accounts WHERE id = 2"
    )
    assert stats["mode"] == "mor-eq" and stats["deleted_keys"] == 1
    assert {r.id for r in cat.read("accounts").collect()} == {1, 3}
    execute_sql(
        cat, "INSERT INTO accounts VALUES (2, 'bob2', 7.0)"
    )
    rows = {r.id: r.name for r in cat.read("accounts").collect()}
    assert rows[2] == "bob2"  # post-delete writer survives
    # multi-column key parses
    stats = execute_sql(
        cat,
        "DELETE /*+ MOR_EQ(id, name) */ FROM accounts WHERE id = 1",
    )
    assert stats["mode"] == "mor-eq"
    assert {r.id for r in cat.read("accounts").collect()} == {2, 3}


def test_merge_into_full_surface(cat, spark):
    _seed(cat, spark)
    stats = execute_sql(
        cat,
        """
        MERGE INTO accounts t
        USING (SELECT * FROM VALUES
               (2, 'bob', 500.0), (9, 'zoe', 1.0) AS v(id, name, balance)) s
        ON t.id = s.id
        WHEN MATCHED THEN UPDATE SET balance = s.balance + t.balance
        WHEN NOT MATCHED THEN INSERT *
        """,
    )
    assert stats["op"] == "merge"
    rows = {
        r.id: r.balance for r in cat.read("accounts").collect()
    }
    assert rows[2] == 550.0  # source + target
    assert rows[9] == 1.0  # inserted
    assert rows[1] == 100.0  # untouched


def test_merge_update_star_and_delete_clause(cat, spark):
    _seed(cat, spark)
    execute_sql(
        cat,
        """
        MERGE INTO accounts AS t
        USING (SELECT * FROM VALUES
               (1, 'alice2', 0.0), (3, 'carol', 75.0) AS v(id, name, balance)) AS s
        ON t.id = s.id
        WHEN MATCHED AND s.balance = 0.0 THEN DELETE
        WHEN MATCHED THEN UPDATE SET *
        """,
    )
    rows = {r.id: r.name for r in cat.read("accounts").collect()}
    assert 1 not in rows  # deleted (source balance 0)
    assert rows[3] == "carol"
    assert rows[2] == "bob"


def test_merge_using_named_table(cat, spark):
    _seed(cat, spark)
    execute_sql(
        cat,
        "CREATE TABLE updates AS SELECT * FROM VALUES "
        "(2, 'bobby', 1.0) AS v(id, name, balance)",
    )
    execute_sql(
        cat,
        "MERGE INTO accounts t USING updates s ON t.id = s.id "
        "WHEN MATCHED THEN UPDATE SET *",
    )
    rows = {r.id: r.name for r in cat.read("accounts").collect()}
    assert rows[2] == "bobby"


def test_merge_rejects_non_equi_on(cat, spark):
    _seed(cat, spark)
    with pytest.raises(SqlError, match="equalities"):
        execute_sql(
            cat,
            "MERGE INTO accounts t USING accounts s ON t.id > s.id "
            "WHEN MATCHED THEN UPDATE SET *",
        )


def test_time_travel_version_tag_and_timestamp(cat, spark):
    _seed(cat, spark)
    cat.create_tag("accounts", "v0")
    execute_sql(cat, "INSERT INTO accounts VALUES (4, 'dave', 20.0)")
    n_now = execute_sql(
        cat, "SELECT COUNT(*) AS n FROM accounts"
    ).collect()[0].n
    n_v0 = execute_sql(
        cat, "SELECT COUNT(*) AS n FROM accounts VERSION AS OF 0"
    ).collect()[0].n
    n_tag = execute_sql(
        cat, "SELECT COUNT(*) AS n FROM accounts VERSION AS OF 'v0'"
    ).collect()[0].n
    assert (n_now, n_v0, n_tag) == (4, 3, 3)
    n_asof = execute_sql(
        cat,
        "SELECT COUNT(*) AS n FROM accounts TIMESTAMP AS OF '9999-01-01 00:00:00'",
    ).collect()[0].n
    assert n_asof == 4


def test_time_travel_branch_read(cat, spark):
    _seed(cat, spark)
    cat.create_branch("accounts", "dev")
    cat.append(
        "accounts",
        spark.createDataFrame(
            [(99, "eve", 9.0)], "id int, name string, balance double"
        ),
        branch="dev",
    )
    n_main = execute_sql(
        cat, "SELECT COUNT(*) AS n FROM accounts"
    ).collect()[0].n
    n_dev = execute_sql(
        cat, "SELECT COUNT(*) AS n FROM accounts VERSION AS OF 'dev'"
    ).collect()[0].n
    assert (n_main, n_dev) == (3, 4)


def test_alter_table_ddl(cat, spark):
    _seed(cat, spark)
    execute_sql(
        cat, "ALTER TABLE accounts ADD COLUMN tier STRING COMMENT 'seg'"
    )
    assert "tier" in cat.read("accounts").columns
    execute_sql(cat, "ALTER TABLE accounts RENAME COLUMN tier TO segment")
    assert "segment" in cat.read("accounts").columns
    execute_sql(cat, "ALTER TABLE accounts DROP COLUMN segment")
    assert "segment" not in cat.read("accounts").columns
    execute_sql(cat, "ALTER TABLE accounts ALTER COLUMN id TYPE BIGINT")
    assert dict(cat.read("accounts").dtypes)["id"] == "bigint"


def test_views_and_show(cat, spark):
    _seed(cat, spark)
    execute_sql(
        cat,
        "CREATE VIEW rich AS SELECT name FROM accounts WHERE balance > 60.0",
    )
    names = {r.name for r in execute_sql(cat, "SELECT * FROM rich").collect()}
    assert names == {"alice", "carol"}
    listing = {
        (r.name, r.kind)
        for r in execute_sql(cat, "SHOW TABLES").collect()
    }
    assert ("accounts", "table") in listing and ("rich", "view") in listing
    # invalid view definitions refuse at CREATE, not first read
    with pytest.raises(Exception):
        execute_sql(cat, "CREATE VIEW broken AS SELECT nope FROM accounts")
    assert "broken" not in cat.views()
    execute_sql(cat, "DROP VIEW rich")
    assert "rich" not in cat.views()


def test_describe(cat, spark):
    _seed(cat, spark)
    cols = {
        r.col_name: r.data_type
        for r in execute_sql(cat, "DESCRIBE accounts").collect()
    }
    assert cols.get("balance") == "double"


def test_drop_table_and_clone_guard(cat, spark):
    _seed(cat, spark)
    cat.clone_table("accounts", "accounts_clone")
    with pytest.raises(ValueError, match="clone"):
        execute_sql(cat, "DROP TABLE accounts")
    execute_sql(cat, "DROP TABLE accounts_clone")
    execute_sql(cat, "DROP TABLE accounts")
    assert not cat.table_exists("accounts")
    skipped = execute_sql(cat, "DROP TABLE IF EXISTS accounts")
    assert skipped.get("skipped") is True


def test_call_procedures_and_maintenance(cat, spark):
    _seed(cat, spark)
    execute_sql(cat, "INSERT INTO accounts VALUES (4, 'dave', 20.0)")
    execute_sql(cat, "CALL create_tag('accounts', 'keep')")
    execute_sql(cat, "CALL rollback('accounts', 0)")
    assert cat.row_count("accounts") == 3
    out = execute_sql(cat, "OPTIMIZE accounts")
    assert out["op"] == "optimize"
    vac = execute_sql(cat, "VACUUM accounts RETAIN 0 HOURS DRY RUN")
    assert vac["op"] == "vacuum"
    with pytest.raises(SqlError, match="unknown procedure"):
        execute_sql(cat, "CALL drop_everything('accounts')")
    exp = execute_sql(
        cat, "CALL system.expire_snapshots('accounts', keep_last => 1)"
    )
    assert exp["op"] == "expire_snapshots"
    # tag-pinned snapshot must survive expiry
    assert cat.read("accounts", tag="keep").count() == 4


def test_insert_overwrite(cat, spark):
    _seed(cat, spark)
    execute_sql(
        cat,
        "INSERT OVERWRITE accounts "
        "SELECT * FROM VALUES (7, 'g', 1.0) AS v(id, name, balance)",
    )
    assert cat.row_count("accounts") == 1
    # previous snapshot still time-travelable
    assert (
        execute_sql(
            cat, "SELECT COUNT(*) AS n FROM accounts VERSION AS OF 0"
        ).collect()[0].n
        == 3
    )


def test_execute_script_multi_statement(cat, spark):
    results = execute_sql_script(
        cat,
        """
        CREATE TABLE t AS SELECT * FROM VALUES (1), (2) AS v(x);
        INSERT INTO t VALUES (3);
        UPDATE t SET x = x * 10 WHERE x = 1;
        SELECT SUM(x) AS s FROM t
        """,
    )
    assert results[1]["rows_inserted"] == 1
    assert results[-1].collect()[0].s == 10 + 2 + 3


def test_multi_statement_execute_refuses(cat, spark):
    with pytest.raises(SqlError, match="execute_script"):
        execute_sql(cat, "SELECT 1; SELECT 2")


def test_string_literal_cannot_confuse_router(cat, spark):
    _seed(cat, spark)
    # a literal containing 'VERSION AS OF 0' and a semicolon must not
    # trigger time travel or statement splitting
    df = execute_sql(
        cat,
        "SELECT 'accounts VERSION AS OF 0; DROP TABLE accounts' AS s, "
        "COUNT(*) AS n FROM accounts GROUP BY 1",
    )
    assert df.collect()[0].n == 3
    assert cat.table_exists("accounts")


def test_merge_qualified_assignment_rewrite(cat, spark):
    """Assignments may mix target and source refs with arithmetic."""
    _seed(cat, spark)
    execute_sql(
        cat,
        "MERGE INTO accounts t USING "
        "(SELECT 1 AS id, 'x' AS name, 7.0 AS balance) s "
        "ON t.id = s.id "
        "WHEN MATCHED THEN UPDATE SET "
        "balance = t.balance - s.balance, name = concat(t.name, '_', s.name)",
    )
    row = {r.id: r for r in cat.read("accounts").collect()}[1]
    assert row.balance == 93.0 and row.name == "alice_x"


def test_insert_column_list(cat, spark):
    _seed(cat, spark)
    stats = execute_sql(cat, "INSERT INTO accounts (id, name) VALUES (8, 'hana')")
    assert stats["rows_inserted"] == 1
    row = {r.id: r for r in cat.read("accounts").collect()}[8]
    assert row.name == "hana" and row.balance is None
    execute_sql(
        cat,
        "INSERT INTO accounts (balance, id) "
        "SELECT 5.0 AS b, 9 AS i",
    )
    row = {r.id: r for r in cat.read("accounts").collect()}[9]
    assert row.balance == 5.0 and row.name is None
    with pytest.raises(SqlError, match="not in accounts"):
        execute_sql(cat, "INSERT INTO accounts (nope) VALUES (1)")
    with pytest.raises(SqlError, match="arity"):
        execute_sql(cat, "INSERT INTO accounts (id, name) VALUES (1)")


def test_script_select_pins_statement_order_snapshot(cat, spark):
    """A mid-script SELECT evaluated AFTER a later DML must still
    return the statement-order-correct result — the snapshot file
    listing is pinned into the resolved plan at its position."""
    results = execute_sql_script(
        cat,
        "CREATE TABLE t2 AS SELECT 1 AS x; "
        "SELECT COUNT(*) AS n FROM t2; "
        "INSERT INTO t2 VALUES (2)",
    )
    assert cat.row_count("t2") == 2
    assert results[1].collect()[0].n == 1  # pre-insert snapshot


def test_ctas_tblproperties_with_quoted_paren(cat, spark):
    execute_sql(
        cat,
        "CREATE TABLE pq TBLPROPERTIES ('note'='a) tricky (value') AS "
        "SELECT 1 AS x",
    )
    assert cat.table_properties("pq").get("note") == "a) tricky (value"


def test_restore_and_truncate(cat, spark):
    _seed(cat, spark)
    execute_sql(cat, "INSERT INTO accounts VALUES (4, 'dave', 20.0)")
    out = execute_sql(cat, "RESTORE TABLE accounts TO VERSION AS OF 0")
    assert out == {"op": "restore", "name": "accounts", "version": 0}
    assert cat.row_count("accounts") == 3
    # timestamp form: far-future instant resolves to the latest
    # main-lineage snapshot (the restore commit itself)
    out = execute_sql(
        cat,
        "RESTORE TABLE accounts TO TIMESTAMP AS OF '9999-01-01 00:00:00'",
    )
    assert cat.row_count("accounts") == 3
    tr = execute_sql(cat, "TRUNCATE TABLE accounts")
    assert tr["op"] == "truncate"
    assert cat.row_count("accounts") == 0
    # truncation is a versioned commit: time travel still works
    assert (
        execute_sql(
            cat, "SELECT COUNT(*) AS n FROM accounts VERSION AS OF 0"
        ).collect()[0].n == 3
    )
    assert not is_query("RESTORE TABLE t TO VERSION AS OF 1")


def test_scoped_registration_resolves_only_referenced_tables(
    cat, spark, monkeypatch
):
    """Serving one statement must cost O(its tables), not O(catalog
    size): unreferenced tables' snapshots are never resolved."""
    _seed(cat, spark)
    execute_sql(cat, "CREATE TABLE other AS SELECT 1 AS x")
    execute_sql(
        cat,
        "CREATE VIEW rich2 AS SELECT name FROM accounts WHERE balance > 60.0",
    )
    resolved: list[str] = []
    real_read = Catalog.read

    def spying_read(self, name, **kw):
        resolved.append(name)
        return real_read(self, name, **kw)

    monkeypatch.setattr(Catalog, "read", spying_read)
    execute_sql(cat, "SELECT COUNT(*) AS n FROM accounts")
    assert "other" not in resolved and "accounts" in resolved
    # view closure pulls in the view's base table, still not 'other'
    resolved.clear()
    df = execute_sql(cat, "SELECT * FROM rich2")
    assert df.count() == 2
    assert "accounts" in resolved and "other" not in resolved


def test_copy_into_idempotent_ingestion(cat, spark, tmp_path):
    """COPY INTO: exactly-once file loads — the loaded-file list rides
    in the same commit as its rows, so re-runs skip and new files
    append."""
    _seed(cat, spark)
    land = tmp_path / "landing"
    land.mkdir()
    (land / "b1.csv").write_text("id,name,balance\n10,jo,1.5\n11,al,2.5\n")
    stmt = (
        f"COPY INTO accounts FROM '{land}' FILEFORMAT = CSV "
        "PATTERN = '*.csv'"
    )
    out = execute_sql(cat, stmt)
    assert out["files_loaded"] == 1 and out["rows_inserted"] == 2
    # idempotent re-run
    again = execute_sql(cat, stmt)
    assert again["files_loaded"] == 0 and again["files_skipped"] == 1
    assert cat.row_count("accounts") == 5
    # a new landing file loads incrementally
    (land / "b2.csv").write_text("id,name,balance\n12,ty,3.5\n")
    third = execute_sql(cat, stmt)
    assert third["files_loaded"] == 1 and third["files_skipped"] == 1
    assert cat.row_count("accounts") == 6
    rows = {r.id: r.name for r in cat.read("accounts").collect()}
    assert rows[12] == "ty"


def test_show_create_table(cat, spark):
    execute_sql(
        cat,
        "CREATE TABLE sc PARTITIONED BY (seg) "
        "TBLPROPERTIES ('owner'='ops') AS "
        "SELECT * FROM VALUES ('a', 1) AS v(seg, n)",
    )
    ddl = execute_sql(cat, "SHOW CREATE TABLE sc").collect()[0].createtab_stmt
    assert "CREATE TABLE sc" in ddl
    assert "seg STRING" in ddl and "n INT" in ddl
    assert "PARTITIONED BY (seg)" in ddl
    assert "'owner'='ops'" in ddl


# -- BEGIN ... COMMIT / ROLLBACK ---------------------------------------------


def test_txn_sql_commit_publishes_atomically(cat, spark):
    """BEGIN; two INSERTs; COMMIT — both invisible to a second session
    until COMMIT, visible to THIS session's reads meanwhile (RYOW)."""
    from data_lakehouse_spark.sql import LakehouseSql

    _seed(cat, spark)
    execute_sql(cat, "CREATE TABLE audit AS SELECT 0 AS id WHERE FALSE")
    sess = LakehouseSql(cat)
    other = LakehouseSql(cat)

    assert sess.execute("BEGIN")["op"] == "begin"
    r = sess.execute("INSERT INTO accounts VALUES (9, 'zoe', 1.0)")
    assert r["rows_inserted"] == 1 and "txn_id" in r
    sess.execute("INSERT INTO audit VALUES (1)")
    # RYOW: the open session sees its staged rows
    assert sess.execute(
        "SELECT COUNT(*) AS n FROM accounts"
    ).collect()[0].n == 4
    # another session does not
    assert other.execute(
        "SELECT COUNT(*) AS n FROM accounts"
    ).collect()[0].n == 3
    out = sess.execute("COMMIT")
    assert sorted(out["tables"]) == ["accounts", "audit"]
    assert other.execute(
        "SELECT COUNT(*) AS n FROM accounts"
    ).collect()[0].n == 4
    assert cat.row_count("audit") == 1


def test_txn_sql_rollback_and_guards(cat, spark):
    from data_lakehouse_spark.sql import LakehouseSql, SqlError

    _seed(cat, spark)
    sess = LakehouseSql(cat)
    sess.execute("BEGIN TRANSACTION")
    sess.execute("INSERT INTO accounts VALUES (9, 'zoe', 1.0)")
    # in-place DML refuses inside a transaction
    with pytest.raises(SqlError, match="not transactional"):
        sess.execute("DELETE FROM accounts WHERE id = 1")
    with pytest.raises(SqlError, match="no nesting"):
        sess.execute("BEGIN")
    sess.execute("ROLLBACK")
    assert cat.row_count("accounts") == 3
    # the table is writable again after the abort
    execute_sql(cat, "INSERT INTO accounts VALUES (5, 'ed', 2.0)")
    assert cat.row_count("accounts") == 4
    with pytest.raises(SqlError, match="COMMIT without"):
        sess.execute("COMMIT")


def test_txn_sql_script_form(cat, spark):
    """The whole transaction as one script: statement-ordered."""
    from data_lakehouse_spark.sql import execute_sql_script

    _seed(cat, spark)
    out = execute_sql_script(
        cat,
        "BEGIN; "
        "INSERT INTO accounts VALUES (7, 'gil', 3.0); "
        "INSERT OVERWRITE accounts SELECT id, name, balance * 2 AS balance"
        " FROM accounts; "
        "COMMIT",
    )
    assert out[0]["op"] == "begin" and out[-1]["op"] == "commit"
    rows = {r.name: r.balance for r in
            execute_sql(cat, "SELECT name, balance FROM accounts").collect()}
    # overwrite read the staged insert (RYOW), doubled everything
    assert rows["gil"] == 6.0 and rows["alice"] == 200.0 and len(rows) == 4


def test_table_changes_function_in_select(cat, spark):
    """Delta-style CDF table function: SELECT ... FROM
    table_changes('t', from [, to]) with _change_type images."""
    _seed(cat, spark)
    execute_sql(cat, "DELETE FROM accounts WHERE id = 2")
    df = execute_sql(
        cat,
        "SELECT id, name, _change_type FROM table_changes('accounts', 0) "
        "ORDER BY id",
    )
    rows = [(r.id, r._change_type) for r in df.collect()]
    assert (2, "delete") in rows
    # bounded form: nothing changed between v0 and v0
    df0 = execute_sql(
        cat, "SELECT COUNT(*) AS n FROM table_changes('accounts', 0, 0)"
    )
    assert df0.collect()[0].n == 0
    from data_lakehouse_spark.sql import SqlError
    with pytest.raises(SqlError, match="no table"):
        execute_sql(cat, "SELECT * FROM table_changes('nope', 0)")
    # a literal mentioning table_changes(...) must NOT trigger rewrite
    df2 = execute_sql(
        cat, "SELECT 'table_changes(''x'', 1)' AS s"
    )
    assert df2.collect()[0].s == "table_changes('x', 1)"


def test_show_transactions(cat, spark):
    from data_lakehouse_spark.sql import LakehouseSql

    _seed(cat, spark)
    sess = LakehouseSql(cat)
    assert sess.execute("SHOW TRANSACTIONS").count() == 0
    sess.execute("BEGIN")
    sess.execute("INSERT INTO accounts VALUES (9, 'zoe', 1.0)")
    rows = sess.execute("SHOW TRANSACTIONS").collect()
    assert len(rows) == 1
    assert rows[0]["state"] == "open" and rows[0]["table"] == "accounts"
    sess.execute("ROLLBACK")
    assert sess.execute("SHOW TRANSACTIONS").count() == 0

    # decided-but-unflipped intent shows as 'decided'
    import json as _json
    import os as _os

    txn = cat.transaction()
    txn.append("accounts", spark.createDataFrame(
        [(8, "hal", 2.0)], "id long, name string, balance double"))
    tdir = _os.path.join(cat.root, "_txn")
    _os.makedirs(tdir, exist_ok=True)
    with open(_os.path.join(tdir, f"{txn.txn_id}.json"), "w") as f:
        _json.dump({"txn_id": txn.txn_id,
                    "tables": {n: v for n, (v, _) in txn._staged.items()}}, f)
    rows = sess.execute("SHOW TRANSACTIONS").collect()
    assert [r["state"] for r in rows] == ["decided"]
    # next BEGIN recovers it
    sess.execute("BEGIN")
    sess.execute("COMMIT")
    assert sess.execute("SHOW TRANSACTIONS").count() == 0
    assert cat.row_count("accounts") == 4  # 3 seed + recovered hal (zoe was rolled back)
