"""operators.diff.table_diff ground truth: composite keys, compare-col
subsets, null handling, and the empty-diff identity."""

from __future__ import annotations

from dataengineeringworkshop_spark.operators.diff import table_diff


def _df(spark, rows):
    return spark.createDataFrame(rows, "k1 INT, k2 STRING, a INT, b STRING")


def test_table_diff_classifies_all_three_kinds(spark):
    old = _df(spark, [(1, "x", 10, "p"), (2, "x", 20, "q"), (3, "y", 30, "r")])
    new = _df(spark, [(1, "x", 10, "p"), (2, "x", 21, "q"), (4, "z", 40, "s")])
    got = {
        (r.k1, r.k2): r.change_type
        for r in table_diff(old, new, key=["k1", "k2"]).collect()
    }
    assert got == {(2, "x"): "changed", (3, "y"): "removed", (4, "z"): "added"}


def test_table_diff_compare_cols_subset_ignores_other_changes(spark):
    old = _df(spark, [(1, "x", 10, "p")])
    new = _df(spark, [(1, "x", 10, "DIFFERENT")])
    assert table_diff(old, new, key=["k1", "k2"], compare_cols=["a"]).count() == 0
    assert (
        table_diff(old, new, key=["k1", "k2"], compare_cols=["b"]).collect()[0].change_type
        == "changed"
    )


def test_table_diff_null_value_transitions_are_changes(spark):
    old = _df(spark, [(1, "x", None, "p"), (2, "x", 5, None)])
    new = _df(spark, [(1, "x", 0, "p"), (2, "x", 5, None)])
    got = {r.k1: r.change_type for r in table_diff(old, new, key=["k1", "k2"]).collect()}
    # NULL -> 0 is a change; the all-equal row (with its NULL) is not
    assert got == {1: "changed"}


def test_table_diff_identity_is_empty(spark):
    df = _df(spark, [(1, "x", 10, "p"), (2, "y", 20, "q")])
    assert table_diff(df, df, key=["k1", "k2"]).count() == 0


def _sdf(spark, rows):
    return spark.createDataFrame(rows, "k INT, a STRING, b STRING")


def test_table_diff_null_shift_is_a_change(spark):
    """concat_ws drops NULLs, so ('p', NULL) and (NULL, 'p') concat
    identically — the struct hash must classify the shift as changed
    (the round-6 advice's silent-drop failure mode)."""
    old = _sdf(spark, [(1, "p", None)])
    new = _sdf(spark, [(1, None, "p")])
    got = table_diff(old, new, key="k").collect()
    assert [(r.k, r.change_type) for r in got] == [(1, "changed")]


def test_table_diff_separator_straddle_is_a_change(spark):
    """('a||b', 'c') vs ('a', 'b||c') concat_ws-collide; struct hash
    must not."""
    old = _sdf(spark, [(1, "a||b", "c")])
    new = _sdf(spark, [(1, "a", "b||c")])
    got = table_diff(old, new, key="k").collect()
    assert [(r.k, r.change_type) for r in got] == [(1, "changed")]
