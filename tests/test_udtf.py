"""Python UDTF surface: the JSON key/value exploder must be row-for-row
identical to its built-in ``explode(from_json(..))`` twin — including
NULL payloads, malformed JSON, non-object JSON, and empty objects."""

from __future__ import annotations

from data_lakehouse_spark.functions import udtfs


def _rows(df):
    return sorted(
        ((r["event_id"], r["prop_key"], r["prop_value"]) for r in df.collect())
    )


def test_udtf_matches_builtin_on_edge_cases(spark):
    df = spark.createDataFrame(
        [
            (1, '{"k": 69}'),
            (2, '{"a": "x", "b": 2.5, "c": true, "d": null}'),
            (3, None),
            (4, "not json"),
            (5, "[1, 2]"),
            (6, "{}"),
            (7, '{"nested": {"deep": 1}}'),
        ],
        "event_id bigint, props string",
    )
    got_udtf = _rows(udtfs.explode_json_kv(df))
    got_builtin = _rows(udtfs.explode_json_kv_builtin(df))
    assert got_udtf == got_builtin
    # sanity on the shape itself, not just twin agreement
    as_dict: dict[tuple, str | None] = {
        (i, k): v for i, k, v in got_builtin
    }
    assert as_dict[(1, "k")] == "69"
    assert as_dict[(2, "c")] == "true"
    assert as_dict[(2, "d")] is None
    ids = {i for i, _, _ in got_builtin}
    assert ids.isdisjoint({3, 4, 5, 6})


def test_udtf_plain_invocation(spark):
    out = udtfs.json_kv_udtf(
        udtfs.F.lit('{"x": 1, "y": "z"}')
    ).collect()
    assert [(r["prop_key"], r["prop_value"]) for r in out] == [
        ("x", "1"),
        ("y", "z"),
    ]
