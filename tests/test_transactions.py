"""Multi-table atomic transactions (transactions.py): all-or-nothing
visibility, abort semantics, crash roll-forward from the intent log,
and interaction with the WAP staging guard."""

from __future__ import annotations

import json
import os

import pytest

from data_lakehouse_spark.catalog import Catalog
from data_lakehouse_spark.transactions import recover_transactions


def _cat(spark, tmp_path) -> Catalog:
    cat = Catalog(spark, str(tmp_path / "w"))
    cat.create_table("a", spark.createDataFrame([(1,)], "id long"))
    cat.create_table("b", spark.createDataFrame([(10,)], "id long"))
    return cat


def _ids(cat, name):
    return sorted(r.id for r in cat.read(name).collect())


def test_txn_commit_publishes_both(spark, tmp_path):
    cat = _cat(spark, tmp_path)
    with cat.transaction() as txn:
        txn.append("a", spark.createDataFrame([(2,)], "id long"))
        txn.overwrite("b", spark.createDataFrame([(99,)], "id long"))
        # MID-transaction: nothing visible yet
        assert _ids(cat, "a") == [1]
        assert _ids(cat, "b") == [10]
    assert _ids(cat, "a") == [1, 2]
    assert _ids(cat, "b") == [99]
    # intent log cleaned up
    assert os.listdir(os.path.join(cat.root, "_txn")) == []


def test_txn_exception_aborts_both(spark, tmp_path):
    cat = _cat(spark, tmp_path)
    with pytest.raises(RuntimeError, match="boom"):
        with cat.transaction() as txn:
            txn.append("a", spark.createDataFrame([(2,)], "id long"))
            txn.append("b", spark.createDataFrame([(20,)], "id long"))
            raise RuntimeError("boom")
    assert _ids(cat, "a") == [1]
    assert _ids(cat, "b") == [10]
    # tables are writable again (staged snapshots buried by rollback)
    cat.append("a", spark.createDataFrame([(3,)], "id long"))
    assert _ids(cat, "a") == [1, 3]


def test_txn_blocks_concurrent_unstaged_writes(spark, tmp_path):
    """While a transaction is staging, a plain append on a touched table
    refuses (the WAP guard) instead of interleaving."""
    cat = _cat(spark, tmp_path)
    with cat.transaction() as txn:
        txn.append("a", spark.createDataFrame([(2,)], "id long"))
        with pytest.raises(ValueError, match="staged"):
            cat.append("a", spark.createDataFrame([(7,)], "id long"))
    assert _ids(cat, "a") == [1, 2]


def test_txn_crash_after_decision_rolls_forward(spark, tmp_path):
    """Crash between intent write and the manifest flips: the intent
    file IS the commit — recovery publishes every table."""
    cat = _cat(spark, tmp_path)
    txn = cat.transaction()
    txn.append("a", spark.createDataFrame([(2,)], "id long"))
    txn.append("b", spark.createDataFrame([(20,)], "id long"))
    # simulate the decision without the flips
    tdir = os.path.join(cat.root, "_txn")
    os.makedirs(tdir, exist_ok=True)
    with open(os.path.join(tdir, f"{txn.txn_id}.json"), "w") as f:
        json.dump(
            {
                "txn_id": txn.txn_id,
                "tables": {n: v for n, (v, _) in txn._staged.items()},
            },
            f,
        )
    # nothing visible pre-recovery
    assert _ids(cat, "a") == [1]
    recovered = recover_transactions(cat)
    assert recovered == [txn.txn_id]
    assert _ids(cat, "a") == [1, 2]
    assert _ids(cat, "b") == [10, 20]
    # idempotent: second run finds nothing and changes nothing
    assert recover_transactions(cat) == []
    assert _ids(cat, "a") == [1, 2]


def test_txn_crash_partial_flip_completes_only_missing(spark, tmp_path):
    """Crash after ONE of two flips: recovery publishes the other and
    does not double-publish the first."""
    cat = _cat(spark, tmp_path)
    txn = cat.transaction()
    txn.append("a", spark.createDataFrame([(2,)], "id long"))
    txn.append("b", spark.createDataFrame([(20,)], "id long"))
    from data_lakehouse_spark import transactions as T

    # flip table a only, then "crash" (leave intent behind)
    tdir = os.path.join(cat.root, "_txn")
    os.makedirs(tdir, exist_ok=True)
    with open(os.path.join(tdir, f"{txn.txn_id}.json"), "w") as f:
        json.dump(
            {
                "txn_id": txn.txn_id,
                "tables": {n: v for n, (v, _) in txn._staged.items()},
            },
            f,
        )
    T._roll_forward(cat, "a", txn._staged["a"][0], txn.txn_id)
    va = cat.snapshots("a").count()
    recover_transactions(cat)
    assert _ids(cat, "a") == [1, 2]
    assert _ids(cat, "b") == [10, 20]
    assert cat.snapshots("a").count() == va  # no duplicate publish entry


def test_txn_stacked_writes_same_table(spark, tmp_path):
    """Two staged appends to the same table in one transaction publish
    as one cumulative snapshot."""
    cat = _cat(spark, tmp_path)
    with cat.transaction() as txn:
        txn.append("a", spark.createDataFrame([(2,)], "id long"))
        txn.append("a", spark.createDataFrame([(3,)], "id long"))
    assert _ids(cat, "a") == [1, 2, 3]


def test_txn_empty_commit_is_noop(spark, tmp_path):
    cat = _cat(spark, tmp_path)
    with cat.transaction():
        pass
    assert _ids(cat, "a") == [1]


def test_txn_abort_preserves_audit_history(spark, tmp_path):
    """The aborted staged snapshot stays time-travel readable."""
    cat = _cat(spark, tmp_path)
    txn = cat.transaction()
    txn.append("a", spark.createDataFrame([(2,)], "id long"))
    staged_v = txn._staged["a"][0]
    txn.abort()
    assert _ids(cat, "a") == [1]
    assert sorted(
        r.id for r in cat.read("a", version=staged_v).collect()
    ) == [1, 2]


def test_txn_refuses_foreign_staged_snapshot(spark, tmp_path):
    """A transaction must not stack on another writer's staged data:
    committing would publish it, aborting would bury it."""
    cat = _cat(spark, tmp_path)
    cat.append("a", spark.createDataFrame([(8,)], "id long"), staged=True)
    txn = cat.transaction()
    with pytest.raises(ValueError, match="another writer"):
        txn.append("a", spark.createDataFrame([(2,)], "id long"))
    # untouched table still works in the same transaction
    txn.append("b", spark.createDataFrame([(20,)], "id long"))
    txn.commit()
    assert _ids(cat, "b") == [10, 20]
    assert _ids(cat, "a") == [1]  # foreign staged data stays unpublished
