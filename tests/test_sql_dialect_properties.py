"""Property tests for the SQL dialect router's lexical layer and the
MERGE parser — the statement STRUCTURE parse must never be confused by
literal contents, and a SQL MERGE must be exactly equivalent to the
direct catalog API call it routes to."""

from __future__ import annotations

import pytest
from hypothesis import given, settings, strategies as st

from data_lakehouse_spark.sql import (
    SqlError,
    mask_strings,
    split_statements,
    strip_comments,
)


# -- lexical invariants ------------------------------------------------------

# text fragments including the hazards: quotes, semicolons, keywords,
# comment markers, parens
_frag = st.text(
    alphabet="abcXYZ09 _,()*=<>;'\n-/%".replace("''", "'"), max_size=30
)


def _well_quoted(parts: list[str]) -> str:
    """Interleave fragments with correctly-escaped string literals."""
    out = []
    for i, p in enumerate(parts):
        if i % 2:
            out.append("'" + p.replace("'", "''") + "'")
        else:
            out.append(p.replace("'", ""))
    return "".join(out)


@given(st.lists(_frag, min_size=1, max_size=6))
@settings(max_examples=300, deadline=None)
def test_mask_strings_invariants(parts):
    sql = _well_quoted(parts)
    masked = mask_strings(sql)
    # same length, identical outside literals, no quote char inside a
    # masked literal's interior
    assert len(masked) == len(sql)
    in_lit = False
    for orig, m in zip(sql, masked):
        if not in_lit:
            assert m == orig
            if orig == "'":
                in_lit = True
        else:
            if m == "'":
                in_lit = False
            else:
                assert m == " "
    assert not in_lit  # well-quoted input stays balanced


@given(st.lists(_frag, min_size=1, max_size=6))
@settings(max_examples=300, deadline=None)
def test_split_statements_preserves_content(parts):
    sql = _well_quoted(parts).replace("--", "xx").replace("/*", "xx")
    stmts = split_statements(sql)
    # splitting never loses non-separator, non-whitespace content
    assert "".join(stmts).replace(";", "").replace(" ", "").replace(
        "\n", ""
    ) == sql.replace(";", "").replace(" ", "").replace("\n", "")


@given(st.text(alphabet="ab'c;- /*\n", max_size=40))
@settings(max_examples=300, deadline=None)
def test_lexer_total_no_crash_beyond_sqlerror(s):
    """Arbitrary (possibly ill-formed) input either lexes or raises
    SqlError — never an unhandled exception."""
    try:
        split_statements(strip_comments(s))
    except SqlError:
        pass


# -- MERGE-equals-API equivalence --------------------------------------------


@pytest.mark.parametrize("seed", [1, 2, 3])
def test_sql_merge_equals_direct_api(spark, tmp_path, seed):
    """The SQL MERGE route and catalog.merge_into must produce
    IDENTICAL table states for the same inputs (seeded random keys
    with overlap, update-add assignments, conditional delete)."""
    import random

    from data_lakehouse_spark.catalog import Catalog
    from data_lakehouse_spark.sql import execute_sql

    rng = random.Random(seed)
    tgt_rows = [
        (k, rng.randint(0, 9), float(rng.randint(1, 99)))
        for k in rng.sample(range(40), 25)
    ]
    src_rows = [
        (k, rng.randint(0, 9), float(rng.randint(1, 99)))
        for k in rng.sample(range(60), 25)
    ]
    schema = "k int, grp int, amt double"

    cat_a = Catalog(spark, str(tmp_path / f"a{seed}"))
    cat_b = Catalog(spark, str(tmp_path / f"b{seed}"))
    for cat in (cat_a, cat_b):
        cat.create_table("t", spark.createDataFrame(tgt_rows, schema))
    src_df = spark.createDataFrame(src_rows, schema)
    src_df.createOrReplaceTempView(f"src_{seed}")

    execute_sql(
        cat_a,
        f"""
        MERGE INTO t
        USING src_{seed} s
        ON t.k = s.k
        WHEN MATCHED AND s.amt < 20.0 THEN DELETE
        WHEN MATCHED THEN UPDATE SET amt = t.amt + s.amt, grp = s.grp
        WHEN NOT MATCHED THEN INSERT *
        """,
    )
    cat_b.merge_into(
        "t", src_df, ["k"],
        when_matched={"amt": "amt + _s_amt", "grp": "_s_grp"},
        when_matched_delete="_s_amt < 20.0",
        insert_not_matched=True,
    )
    a = sorted(map(tuple, cat_a.read("t").collect()))
    b = sorted(map(tuple, cat_b.read("t").collect()))
    assert a == b
