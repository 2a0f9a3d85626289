"""Connected components: correctness on hand-built graphs, singleton
handling, and O(log n)-round convergence on a long chain."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from data_lakehouse_spark.operators.graph import connected_components


def _edges(spark, pairs):
    return spark.createDataFrame(pairs, "id_a bigint, id_b bigint")


def _cc(df):
    return {r["vec_id"]: r["component_id"] for r in df.collect()}


def test_two_components_and_chain(spark):
    # 1-2-3 chained (no 1-3 edge) plus 10-11; min id labels the cluster
    out = _cc(connected_components(_edges(spark, [(2, 1), (2, 3), (10, 11)])))
    assert out == {1: 1, 2: 1, 3: 1, 10: 10, 11: 10}


def test_isolated_vertices_from_universe(spark):
    verts = spark.range(6).select(F.col("id").alias("vec_id"))
    out = _cc(
        connected_components(
            _edges(spark, [(4, 5)]), vertices=verts, vertex_col="vec_id"
        )
    )
    assert out == {0: 0, 1: 1, 2: 2, 3: 3, 4: 4, 5: 4}


def test_long_chain_converges_within_log_rounds(spark):
    # path 0-1-2-...-63: diameter 63; pointer jumping must close it in
    # far fewer than 63 rounds (log2(64)=6, allow slack)
    out = _cc(
        connected_components(
            _edges(spark, [(i, i + 1) for i in range(63)]), max_iter=10
        )
    )
    assert set(out.values()) == {0}
    assert len(out) == 64


def test_nonconvergence_raises(spark):
    # driver_finish_max_edges=0 disables the union-find finish, so a
    # single contraction round cannot shrink the chain residue to zero
    # and the round cap must trip.
    with pytest.raises(RuntimeError, match="did not fit"):
        connected_components(
            _edges(spark, [(i, i + 1) for i in range(63)]),
            max_iter=1,
            driver_finish_max_edges=0,
        )


def test_stats_instrumentation_and_log_round_growth(spark):
    # SCALING diagnosis instrumentation (r9 verdict ask #1): the stats
    # sink reports input/residue sizes and the number of distributed
    # residue rounds, and that round count grows O(log n), not O(n):
    # a 16x longer adversarial chain may cost at most ~log2(16)=4 more
    # contraction rounds (pointer jumping halves depth per round).
    def rounds_for(n):
        st = {}
        out = _cc(
            connected_components(
                _edges(spark, [(i, i + 1) for i in range(n - 1)]),
                max_iter=20,
                driver_finish_max_edges=0,  # force full distributed closure
                stats=st,
            )
        )
        assert set(out.values()) == {0} and len(out) == n
        assert st["input_edges"] == 2 * (n - 1)  # symmetrized
        assert st["finish"] == "empty"
        assert st["residue_edges"][-1] == 0
        return st["residue_rounds"]

    r64, r1024 = rounds_for(64), rounds_for(1024)
    assert r1024 <= r64 + 5, (r64, r1024)
    assert r1024 <= 12  # far below O(n); log2(1024)=10

    # on a real near-dup graph (tiny components) one hook pass collapses
    # everything: zero residue rounds, driver finish on a residue that
    # is orders of magnitude under the guard
    st = {}
    _cc(
        connected_components(
            _edges(spark, [(2, 1), (2, 3), (10, 11)]), stats=st
        )
    )
    assert st["residue_rounds"] == 0
    assert st["finish"] in ("driver_union_find", "empty")


def test_distributed_contraction_fallback(spark):
    # guard of 0 forces the repeated-contraction path end-to-end: the
    # chain must still fully close via hooks alone (each round halves
    # chain depth), with no driver union-find involved.
    out = _cc(
        connected_components(
            _edges(spark, [(i, i + 1) for i in range(63)]),
            max_iter=10,
            driver_finish_max_edges=0,
        )
    )
    assert set(out.values()) == {0}
    assert len(out) == 64
