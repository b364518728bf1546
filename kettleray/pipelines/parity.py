"""Operator-parity queries: one oracle-checked pipeline per Kettle step.

Each ``q_*`` takes an sf_dir and returns a Dataset; ``ORACLES`` holds the
equivalent DuckDB SQL (same column names — the driver hash-compares
values after sorting columns/rows). Together with the CDC queries this is
the line-by-line SURVEY.md §2 coverage evidence.
"""

from __future__ import annotations

import pyarrow as pa

import ray.data

from kettleray import configure_ray_data
from kettleray.ops import aggregates as ag
from kettleray.ops import calculator as calc
from kettleray.ops import joins
from kettleray.ops import rowops as ro
from kettleray.ops import strings as st
from kettleray.ops.rowops import Cond, CondTree


def _t(sf_dir: str, name: str, columns=None):
    configure_ray_data()
    return ray.data.read_parquet(f"{sf_dir}/{name}.parquet",
                                 columns=columns)


# --- §2.4 row-level -------------------------------------------------------

def q_select_values(sf_dir):
    ds = _t(sf_dir, "lineitem",
            ["l_orderkey", "l_linenumber", "l_quantity"])
    return ro.select_values(ds, casts={"l_linenumber": pa.int64()},
                            rename={"l_quantity": "qty",
                                    "l_linenumber": "lineno"})


def q_filter_rows(sf_dir):
    ds = _t(sf_dir, "lineitem", ["l_orderkey", "l_linenumber", "l_quantity",
                                 "l_discount", "l_returnflag"])
    cond = CondTree("OR", [
        CondTree("AND", [Cond("l_quantity", ">=", 30),
                         Cond("l_discount", "<", 0.05)]),
        Cond("l_returnflag", "=", "R"),
    ])
    return ro.filter_rows(ds, cond)


def q_calculator(sf_dir):
    ds = _t(sf_dir, "lineitem", ["l_orderkey", "l_linenumber",
                                 "l_quantity", "l_extendedprice",
                                 "l_discount", "l_shipdate"])
    # chained ops: 1-l_discount first, then multiply, then round
    out = calc.calculator(ds, [
        calc.CalcOp("one_minus_disc", "subtract", const_a=1.0,
                    b="l_discount"),
        calc.CalcOp("revenue", "multiply", a="l_extendedprice",
                    b="one_minus_disc"),
        calc.CalcOp("revenue", "round", a="revenue", const_b=2),
        calc.CalcOp("ship_year", "year", a="l_shipdate"),
        calc.CalcOp("ship_quarter", "quarter", a="l_shipdate"),
        calc.CalcOp("ship_month", "month", a="l_shipdate"),
        calc.CalcOp("qty_sq", "square", a="l_quantity"),
        calc.CalcOp("hyp", "hypot", a="l_quantity", b="l_discount"),
        calc.CalcOp("hyp", "round", a="hyp", const_b=6),
        calc.CalcOp("plus_10pct", "percent_add", a="l_extendedprice",
                    const_b=10.0),
        calc.CalcOp("plus_10pct", "round", a="plus_10pct", const_b=4),
    ])
    return ro.select_values(out, select=["l_orderkey", "l_linenumber",
                                         "revenue", "ship_year",
                                         "ship_quarter", "ship_month",
                                         "qty_sq", "hyp", "plus_10pct"])


def q_string_ops(sf_dir):
    ds = _t(sf_dir, "customer", ["c_custkey", "c_name", "c_mktsegment"])
    out = st.string_operations(ds, case={"c_mktsegment": "lower"})
    out = st.strings_cut(out, {"c_name": (0, 8)}, {"c_name": "name_prefix"})
    out = st.replace_in_string(out, "c_name", "Customer", "Cust",
                               out_col="short_name")
    return ro.select_values(out, select=["c_custkey", "c_mktsegment",
                                         "name_prefix", "short_name"])


def q_split_to_rows(sf_dir):
    ds = _t(sf_dir, "part", ["p_partkey", "p_name"])
    return st.split_field_to_rows(ds, "p_name", " ", out_col="word")


def q_concat_fields(sf_dir):
    ds = _t(sf_dir, "customer", ["c_custkey", "c_name", "c_mktsegment"])
    out = st.concat_fields(ds, ["c_name", "c_mktsegment"], "|", "tag")
    return ro.select_values(out, select=["c_custkey", "tag"])


def q_value_mapper(sf_dir):
    ds = _t(sf_dir, "lineitem", ["l_orderkey", "l_linenumber",
                                 "l_returnflag"])
    return ro.value_mapper(ds, "l_returnflag",
                           {"R": "returned", "A": "accepted", "N": "none"},
                           target_field="flag_label")


def q_null_handling(sf_dir):
    ds = _t(sf_dir, "orders", ["o_orderkey", "o_orderstatus"])
    out = ro.null_if(ds, {"o_orderstatus": "O"})
    return ro.if_null(out, {"o_orderstatus": "X"})


def q_number_range(sf_dir):
    ds = _t(sf_dir, "orders", ["o_orderkey", "o_totalprice"])
    return ro.number_range(ds, "o_totalprice",
                           bounds=[0, 50_000, 150_000, 10_000_000],
                           labels=["small", "medium", "large"],
                           out_col="price_band")


def q_checksum(sf_dir):
    ds = _t(sf_dir, "customer", ["c_custkey", "c_name", "c_mktsegment"])
    return ro.checksum(ds, ["c_name", "c_mktsegment"], algo="md5",
                       out_col="row_md5")


def q_switch_case(sf_dir):
    ds = _t(sf_dir, "lineitem", ["l_orderkey", "l_linenumber",
                                 "l_returnflag"])
    return ro.switch_case(ds, "l_returnflag",
                          {"R": "returns", "A": "archive"},
                          default="other", route_col="route")


def q_clone_row(sf_dir):
    ds = _t(sf_dir, "region", ["r_regionkey", "r_name"])
    return ro.clone_row(ds, n=3, add_clone_num=True)


def q_add_sequence(sf_dir):
    ds = _t(sf_dir, "customer", ["c_custkey", "c_name"])
    return ro.add_sequence(ds, ["c_custkey"], out_col="seq")


def q_sample_rows(sf_dir):
    ds = _t(sf_dir, "orders", ["o_orderkey", "o_totalprice"])
    return ro.sample_rows(ds, [(5, 15), (25, 27)], order_by=["o_orderkey"])


def q_regex_eval(sf_dir):
    ds = _t(sf_dir, "part", ["p_partkey", "p_name"])
    return st.regex_eval(ds, "p_name", r"^(?P<first_word>\w+)",
                         ["first_word"])


def q_data_validator(sf_dir):
    ds = _t(sf_dir, "customer", ["c_custkey", "c_name", "c_acctbal",
                                 "c_mktsegment"])
    good, bad = ro.data_validator(ds, [
        ro.Rule("c_acctbal", min_val=0.0, code="NEG_BAL"),
        ro.Rule("c_mktsegment",
                allowed=["BUILDING", "AUTOMOBILE", "MACHINERY",
                         "HOUSEHOLD", "FURNITURE"], code="BAD_SEG"),
    ])
    return good


def q_data_validator_bad(sf_dir):
    """The error stream: rejected rows with error_code/error_field
    (first failing rule wins) — Kettle's red-hop error handling."""
    ds = _t(sf_dir, "customer", ["c_custkey", "c_name", "c_acctbal",
                                 "c_mktsegment"])
    good, bad = ro.data_validator(ds, [
        ro.Rule("c_acctbal", min_val=0.0, code="NEG_BAL"),
        ro.Rule("c_mktsegment",
                allowed=["BUILDING", "AUTOMOBILE", "MACHINERY",
                         "HOUSEHOLD", "FURNITURE"], code="BAD_SEG"),
    ])
    return bad.select_columns(["c_custkey", "error_code", "error_field"])


# --- §2.6 aggregates / sort / dedup / window ------------------------------

def q_group_by_q1(sf_dir):
    """TPC-H Q1 shape — the Group by step with algebraic aggregates."""
    ds = _t(sf_dir, "lineitem", ["l_returnflag", "l_linestatus",
                                 "l_quantity", "l_extendedprice"])
    out = ag.group_by(ds, ["l_returnflag", "l_linestatus"], [
        ag.Agg("l_quantity", "sum", "sum_qty"),
        ag.Agg("l_extendedprice", "sum", "sum_price"),
        ag.Agg("l_quantity", "avg", "avg_qty"),
        ag.Agg("l_quantity", "max", "max_qty"),
        ag.Agg("l_quantity", "min", "min_qty"),
        ag.Agg(None, "count", "n_rows"),
    ])
    return calc.calculator(out, [
        calc.CalcOp("sum_price", "round", a="sum_price", const_b=2),
        calc.CalcOp("avg_qty", "round", a="avg_qty", const_b=4),
    ])


def q_group_by_holistic(sf_dir):
    """Memory-group-by path: first/last by order, count_distinct, concat."""
    ds = _t(sf_dir, "orders", ["o_custkey", "o_orderkey", "o_orderstatus",
                               "o_totalprice"])
    out = ag.group_by(ds, ["o_custkey"], [
        ag.Agg("o_orderkey", "first", "first_order", order_col="o_orderkey"),
        ag.Agg("o_orderkey", "last", "last_order", order_col="o_orderkey"),
        ag.Agg("o_orderstatus", "count_distinct", "n_statuses"),
        ag.Agg(None, "count", "n_orders"),
    ], num_partitions=8)
    return out


def q_unique_rows(sf_dir):
    ds = _t(sf_dir, "lineitem", ["l_returnflag", "l_linestatus"])
    return ag.unique_rows(ds, ["l_returnflag", "l_linestatus"],
                          count_col="dup_count", num_partitions=4)


def q_top_k(sf_dir):
    ds = _t(sf_dir, "orders", ["o_orderkey", "o_totalprice"])
    return ag.top_k(ds, "o_totalprice", 10)


def q_analytic_lag(sf_dir):
    ds = _t(sf_dir, "orders", ["o_custkey", "o_orderkey", "o_totalprice"])
    return ag.analytic_query(ds, ["o_custkey"], "o_orderkey",
                             [("o_totalprice", "lag", 1, "prev_price"),
                              ("o_totalprice", "lead", 1, "next_price")],
                             num_partitions=8)


def q_fields_change_sequence(sf_dir):
    ds = _t(sf_dir, "orders", ["o_custkey", "o_orderkey"])
    return ag.fields_change_sequence(ds, ["o_custkey"], "o_orderkey",
                                     out_col="seq_in_cust",
                                     num_partitions=8)


def q_univariate_stats(sf_dir):
    import pyarrow.compute as pc
    ds = _t(sf_dir, "lineitem", ["l_extendedprice"])
    t = ag.univariate_stats(ds, "l_extendedprice")
    for col in ("l_extendedprice_mean", "l_extendedprice_std",
                "l_extendedprice_median"):
        i = t.column_names.index(col)
        t = t.set_column(i, col, pc.round(
            t[col], ndigits=4, round_mode="half_towards_infinity"))
    return t


def q_append_streams(sf_dir):
    a = _t(sf_dir, "nation", ["n_nationkey", "n_name"])
    b = _t(sf_dir, "region", ["r_regionkey", "r_name"])
    b2 = ro.select_values(b, rename={"r_regionkey": "n_nationkey",
                                     "r_name": "n_name"})
    return ag.append_streams(a, b2)


# --- §2.5 joins & lookups -------------------------------------------------

def q_merge_join_inner(sf_dir):
    o = _t(sf_dir, "orders", ["o_orderkey", "o_custkey", "o_totalprice"])
    c = _t(sf_dir, "customer", ["c_custkey", "c_name"])
    c = ro.select_values(c, rename={"c_custkey": "o_custkey"})
    j = joins.merge_join(o, c, ["o_custkey"], how="inner",
                         num_partitions=8)
    return j.select_columns(["o_orderkey", "o_custkey", "o_totalprice",
                             "c_name"])


def q_merge_join_left(sf_dir):
    li = _t(sf_dir, "lineitem", ["l_orderkey", "l_linenumber", "l_partkey"])
    p = _t(sf_dir, "part", ["p_partkey", "p_brand", "p_size"])
    p = ro.filter_rows(p, Cond("p_size", ">", 25))
    p = ro.select_values(p, select=["p_partkey", "p_brand"],
                         rename={"p_partkey": "l_partkey"})
    j = joins.merge_join(li, p, ["l_partkey"], how="left",
                         num_partitions=8)
    return j.select_columns(["l_orderkey", "l_linenumber", "l_partkey",
                             "p_brand"])


def q_merge_join_right(sf_dir):
    """≙ Merge join RIGHT OUTER (mergejoin/MergeJoin.java join type
    'RIGHT OUTER'): all customers kept, order columns null on miss."""
    o = _t(sf_dir, "orders", ["o_orderkey", "o_custkey", "o_totalprice"])
    o = ro.filter_rows(o, Cond("o_totalprice", ">", 150_000.0))
    o = ro.select_values(o, rename={"o_custkey": "c_custkey"})
    c = _t(sf_dir, "customer", ["c_custkey", "c_name"])
    j = joins.merge_join(o, c, ["c_custkey"], how="right",
                         num_partitions=8)
    return j.select_columns(["c_custkey", "c_name", "o_orderkey",
                             "o_totalprice"])


def q_asof_join(sf_dir):
    """As-of (backward) join: every event enriched with the user's most
    recent purchase value at-or-before its timestamp. One hash shuffle
    on user_id + per-partition vectorized sorted sweep; oracle =
    DuckDB's native ASOF LEFT JOIN."""
    ev = _t(sf_dir, "events",
            ["event_id", "user_id", "ts", "event_type", "value"])
    right = ev.filter(expr="event_type == 'purchase'").map_batches(
        lambda t: t.select(["user_id", "ts", "value"]).rename_columns(
            ["user_id", "ts", "purchase_value"]),
        batch_format="pyarrow", zero_copy_batch=True)
    return joins.asof_join(ev, right, by=["user_id"], on="ts",
                           right_cols=["purchase_value"],
                           num_partitions=8)


def q_range_join(sf_dir):
    """Range (interval) join: events.value banded against a broadcast
    interval table derived from region (5 bands of width 100). No
    shuffle — bands broadcast once, np.searchsorted per batch."""
    ev = _t(sf_dir, "events", ["event_id", "value"])
    reg = _t(sf_dir, "region", ["r_regionkey", "r_name"])

    def _bands(t):
        import pyarrow.compute as pc
        lo = pc.multiply(pc.cast(t["r_regionkey"], pa.float64()), 100.0)
        return pa.table({"lo": lo, "hi": pc.add(lo, 100.0),
                         "band_name": t["r_name"]})

    bands = reg.map_batches(_bands, batch_format="pyarrow",
                            zero_copy_batch=True)
    return joins.range_join(ev, bands, value_col="value",
                            band_cols=["band_name"])


def q_merge_join_full(sf_dir):
    """≙ Merge join FULL OUTER: misses on both sides survive with the
    key column coalesced."""
    o = _t(sf_dir, "orders", ["o_orderkey", "o_custkey", "o_totalprice"])
    o = ro.filter_rows(o, Cond("o_totalprice", ">", 150_000.0))
    o = ro.select_values(o, rename={"o_custkey": "c_custkey"})
    c = _t(sf_dir, "customer", ["c_custkey", "c_name", "c_acctbal"])
    c = ro.filter_rows(c, Cond("c_acctbal", "<", 1000.0))
    j = joins.merge_join(o, c, ["c_custkey"], how="full",
                         num_partitions=8)
    return j.select_columns(["c_custkey", "c_name", "o_orderkey",
                             "o_totalprice"])


def q_fuzzy_match_jw(sf_dir):
    """Fuzzy match in Jaro-Winkler mode (max similarity)."""
    n = _t(sf_dir, "nation", ["n_nationkey", "n_name"])
    r = _t(sf_dir, "region", ["r_regionkey", "r_name"])
    out = joins.fuzzy_match(n, r, "n_name", "r_name", algo="jaro_winkler",
                            out_match="best_region", out_score="jw")
    return calc.calculator(out, [
        calc.CalcOp("jw", "round", a="jw", const_b=6)])


def q_stream_lookup(sf_dir):
    li = _t(sf_dir, "lineitem", ["l_orderkey", "l_linenumber", "l_partkey"])
    p = _t(sf_dir, "part", ["p_partkey", "p_brand", "p_size"])
    p = ro.filter_rows(p, Cond("p_size", ">", 25))
    p = ro.select_values(p, select=["p_partkey", "p_brand"],
                         rename={"p_partkey": "l_partkey"})
    return joins.stream_lookup(li, p, ["l_partkey"], ["p_brand"],
                               defaults={"p_brand": "NONE"})


def q_anti_join(sf_dir):
    """Orders from customers NOT in the high-balance set (guaranteed
    non-empty so the result schema survives the comparison)."""
    o = _t(sf_dir, "orders", ["o_orderkey", "o_custkey"])
    c = _t(sf_dir, "customer", ["c_custkey", "c_acctbal"])
    c = ro.filter_rows(c, Cond("c_acctbal", ">", 5000.0))
    c = ro.select_values(c, select=["c_custkey"],
                         rename={"c_custkey": "o_custkey"})
    return joins.semi_join(o, c, ["o_custkey"], anti=True)


def q_semi_join(sf_dir):
    c = _t(sf_dir, "customer", ["c_custkey", "c_name"])
    o = _t(sf_dir, "orders", ["o_custkey"])
    o = ro.select_values(o, rename={"o_custkey": "c_custkey"})
    return joins.semi_join(c, o, ["c_custkey"], anti=False)


def q_join_cartesian(sf_dir):
    r = _t(sf_dir, "region", ["r_regionkey", "r_name"])
    n = _t(sf_dir, "nation", ["n_nationkey", "n_name"])
    return joins.join_rows_cartesian(n, r)


def q_closure(sf_dir):
    n = _t(sf_dir, "nation", ["n_name", "n_regionkey"])
    r = _t(sf_dir, "region", ["r_regionkey", "r_name"])
    r = ro.select_values(r, rename={"r_regionkey": "n_regionkey"})
    pairs = joins.merge_join(n, r, ["n_regionkey"], how="inner",
                             num_partitions=4)
    pairs = ro.select_values(pairs, select=["r_name", "n_name"],
                             rename={"r_name": "parent", "n_name": "child"})
    return joins.closure_generator(pairs, "parent", "child")


def q_row_normaliser(sf_dir):
    """Unpivot supplier numeric facts into (key, type, value) rows."""
    ds = _t(sf_dir, "part", ["p_partkey", "p_size", "p_retailprice"])
    return ro.row_normaliser(ds, ["p_partkey"],
                             ["p_size", "p_retailprice"],
                             type_col="measure", value_col="value")


def q_row_denormaliser(sf_dir):
    """Pivot back: round-trip of the normaliser output."""
    ds = _t(sf_dir, "part", ["p_partkey", "p_size", "p_retailprice"])
    melted = ro.row_normaliser(ds, ["p_partkey"],
                               ["p_size", "p_retailprice"],
                               type_col="measure", value_col="value")
    return ro.row_denormaliser(melted, ["p_partkey"], "measure", "value",
                               ["p_size", "p_retailprice"],
                               num_partitions=4)


def q_date_calculator(sf_dir):
    """Date function surface: iso week, isodow, day-diff, month floor."""
    import datetime
    ds = _t(sf_dir, "orders", ["o_orderkey", "o_orderdate"])
    out = calc.calculator(ds, [
        calc.CalcOp("iso_week", "week_iso", a="o_orderdate"),
        calc.CalcOp("dow", "day_of_week", a="o_orderdate"),
        calc.CalcOp("days_since_95", "date_diff_days", a="o_orderdate",
                    const_b=datetime.datetime(1995, 1, 1)),
        calc.CalcOp("month_start", "first_day_of_month", a="o_orderdate"),
        calc.CalcOp("doy", "day_of_year", a="o_orderdate"),
        calc.CalcOp("iso_year", "iso_year", a="o_orderdate"),
        calc.CalcOp("next_month", "add_months", a="o_orderdate",
                    const_b=1),
        calc.CalcOp("next_year", "add_years", a="o_orderdate", const_b=1),
        calc.CalcOp("month_end", "last_day_of_month", a="o_orderdate"),
        calc.CalcOp("plus_36h", "add_hours", a="o_orderdate", const_b=36),
        calc.CalcOp("workdays_since_95", "date_working_diff",
                    a="o_orderdate",
                    const_b=datetime.datetime(1995, 1, 1)),
        calc.CalcOp("date_str", "date_format", a="o_orderdate",
                    const_b="%Y/%m/%d"),
    ])
    out = calc.calculator(out, [
        calc.CalcOp("reparsed", "date_parse", a="date_str",
                    const_b="%Y/%m/%d")])
    # align dow with SQL isodow (Mon=1..Sun=7; Arrow gives Mon=0..Sun=6)
    out = calc.calculator(out, [
        calc.CalcOp("dow", "add", a="dow", const_b=1)])
    return out.select_columns(["o_orderkey", "iso_week", "dow",
                               "days_since_95", "month_start", "doy",
                               "iso_year", "next_month", "next_year",
                               "month_end", "plus_36h",
                               "workdays_since_95", "date_str",
                               "reparsed"])


def q_multiway_join(sf_dir):
    li = _t(sf_dir, "lineitem", ["l_orderkey", "l_linenumber",
                                 "l_quantity"])
    o = _t(sf_dir, "orders", ["o_orderkey", "o_custkey"])
    c = _t(sf_dir, "customer", ["c_custkey", "c_name"])
    o = ro.select_values(o, rename={"o_orderkey": "l_orderkey"})
    j1 = joins.merge_join(li, o, ["l_orderkey"], how="inner",
                          num_partitions=8)
    j1 = ro.select_values(j1, select=["l_orderkey", "l_linenumber",
                                      "l_quantity", "o_custkey"],
                          rename={"o_custkey": "c_custkey"})
    j2 = joins.merge_join(j1, c, ["c_custkey"], how="inner",
                          num_partitions=8)
    return j2.select_columns(["l_orderkey", "l_linenumber", "l_quantity",
                              "c_custkey", "c_name"])


def q_combination_lookup(sf_dir):
    """≙ Combination lookup/update: natural-key combo -> deterministic
    surrogate key (hash — avoids a global sequence actor)."""
    ds = _t(sf_dir, "lineitem", ["l_returnflag", "l_linestatus"])
    combos = ag.unique_rows(ds, ["l_returnflag", "l_linestatus"],
                            num_partitions=4)
    return ro.checksum(combos, ["l_returnflag", "l_linestatus"],
                       algo="md5", out_col="combo_key", sep="|")


def q_fuzzy_match(sf_dir):
    n = _t(sf_dir, "nation", ["n_nationkey", "n_name"])
    r = _t(sf_dir, "region", ["r_regionkey", "r_name"])
    return joins.fuzzy_match(n, r, "n_name", "r_name",
                             max_distance=20, out_match="best_region",
                             out_score="distance")


def q_string_distance(sf_dir):
    """Edit/phonetic distance surface (≙ Calculator LEVENSHTEIN/JARO/
    JARO_WINKLER + Kettle Utils Damerau; values match DuckDB's kernels
    bit-for-bit, verified in round 2)."""
    ds = _t(sf_dir, "customer", ["c_custkey", "c_name"])
    ref = "Customer#000000001"
    out = calc.calculator(ds, [
        calc.CalcOp("lev", "levenshtein", a="c_name", const_b=ref),
        calc.CalcOp("dam", "damerau_levenshtein", a="c_name", const_b=ref),
        calc.CalcOp("jaro", "jaro", a="c_name", const_b=ref),
        calc.CalcOp("jw", "jaro_winkler", a="c_name", const_b=ref),
        calc.CalcOp("nw", "needleman_wunsch", a="c_name", const_b=ref),
    ])
    return calc.calculator(out, [
        calc.CalcOp("jaro", "round", a="jaro", const_b=6),
        calc.CalcOp("jw", "round", a="jw", const_b=6),
    ])


def q_string_cleanup(sf_dir):
    """String cleanup / escape / hex family (≙ Calculator REMOVE_*,
    GET_ONLY_DIGIT, ESCAPE/UNESCAPE XML, USE_CDATA, ESCAPE_SQL,
    HEX_ENCODE/DECODE, LEFT/RIGHT — calculator/CalculatorMetaFunction
    .java)."""
    ds = _t(sf_dir, "customer", ["c_custkey", "c_name", "c_mktsegment"])
    out = calc.calculator(ds, [
        calc.CalcOp("digits", "get_only_digits", a="c_name"),
        calc.CalcOp("alpha", "remove_digits", a="c_name"),
        calc.CalcOp("l4", "left", a="c_name", const_b=4),
        calc.CalcOp("r3", "right", a="c_name", const_b=3),
        calc.CalcOp("tagged", "concat", a="c_name", const_b="<&>"),
        calc.CalcOp("xml_esc", "escape_xml", a="tagged"),
        calc.CalcOp("xml_rt", "unescape_xml", a="xml_esc"),
        calc.CalcOp("cdata", "use_cdata", a="c_name"),
        calc.CalcOp("quoted", "concat", a="c_mktsegment", const_b="'s"),
        calc.CalcOp("sql_esc", "escape_sql", a="quoted"),
        calc.CalcOp("hexed", "hex_encode", a="c_mktsegment"),
        calc.CalcOp("unhexed", "hex_decode", a="hexed"),
    ])
    return out.select_columns(["c_custkey", "digits", "alpha", "l4", "r3",
                               "xml_esc", "xml_rt", "cdata", "sql_esc",
                               "hexed", "unhexed"])


def q_split_fields(sf_dir):
    """≙ Field splitter: one field -> N columns by delimiter."""
    from kettleray.ops.strings import split_fields
    ds = _t(sf_dir, "customer", ["c_custkey", "c_name"])
    out = split_fields(ds, "c_name", "#", ["name_word", "name_num"])
    return out.select_columns(["c_custkey", "name_word", "name_num"])


def q_formula(sf_dir):
    """≙ Formula / Janino expression step: free-form vectorized row
    expression (ast-whitelisted, numpy-compiled once)."""
    from kettleray.ops.formula import formula
    ds = _t(sf_dir, "lineitem", ["l_orderkey", "l_linenumber",
                                 "l_quantity", "l_extendedprice",
                                 "l_discount", "l_tax"])
    out = formula(
        ds, "charge",
        "l_extendedprice * (1 - l_discount) * (1 + l_tax) "
        "if l_quantity > 20 else l_extendedprice * (1 - l_discount)",
        round_to=6)
    return out.select_columns(["l_orderkey", "l_linenumber", "charge"])


def q_top_orders_per_customer(sf_dir):
    """Per-group top-k (QUALIFY row_number): one group-key shuffle +
    vectorized per-block rank — never a global sort."""
    o = _t(sf_dir, "orders", ["o_orderkey", "o_custkey", "o_totalprice"])
    return ag.top_k_per_group(o, ["o_custkey"], "o_totalprice", 3,
                              descending=True, num_partitions=8)


def q_deterministic_sample(sf_dir):
    """Exact deterministic uniform k-sample: k smallest md5(key) —
    the distributed stand-in for reservoir sampling (same uniformity,
    reproducible, no sequential pass)."""
    ds = _t(sf_dir, "orders", ["o_orderkey", "o_totalprice"])
    h = ro.checksum(ds, ["o_orderkey"], algo="md5", out_col="__h")
    return ag.top_k(h, "__h", 20, descending=False)


def q_add_constants_set_value(sf_dir):
    """≙ Add constants + Set field value chained (constant/Constant.java,
    setvaluefield/SetValueField.java)."""
    ds = _t(sf_dir, "nation", ["n_nationkey", "n_name", "n_regionkey"])
    ds = ro.add_constants(ds, {"source_system": "kettleray",
                               "batch_id": 42})
    return ro.set_value_field(ds, target="n_regionkey",
                              source="n_nationkey")


def q_metadata_structure(sf_dir):
    """≙ Metadata structure of stream: one row per field (position, name,
    type) of the lineitem schema — oracled via duckdb_columns() with a
    DuckDB→Arrow type-name map."""
    return ro.metadata_structure(_t(sf_dir, "lineitem"))


def q_multiway_merge_join(sf_dir):
    """True N-way single-exchange merge join on one shared key
    (≙ multimerge/MultiMergeJoin.java): lineitem + orders + a per-order
    aggregate, all keyed by orderkey, shuffled ONCE."""
    li = _t(sf_dir, "lineitem", ["l_orderkey", "l_linenumber",
                                 "l_quantity"])
    o = ro.select_values(_t(sf_dir, "orders", ["o_orderkey", "o_custkey"]),
                         rename={"o_orderkey": "l_orderkey"})
    agg = ag.group_by(_t(sf_dir, "lineitem", ["l_orderkey"]),
                      ["l_orderkey"], [ag.Agg(None, "count", "n_lines")],
                      num_partitions=8)
    out = joins.multiway_merge_join([li, o, agg], ["l_orderkey"],
                                    how="inner", num_partitions=8)
    return out


def q_script_values(sf_dir):
    """≙ Script values step (scriptvalues_mod/ScriptValuesMod.java):
    multi-statement whitelisted row script, compiled once, vectorized
    numpy per batch."""
    from kettleray.ops.formula import script_step
    ds = _t(sf_dir, "lineitem", ["l_orderkey", "l_linenumber",
                                 "l_extendedprice", "l_discount", "l_tax"])
    out = script_step(ds, (
        "net = l_extendedprice * (1 - l_discount)\n"
        "taxed = net * (1 + l_tax)\n"
        "big = taxed > 2000\n"
        "bucket = floor(net / 500)\n"))
    return out.select_columns(["l_orderkey", "l_linenumber", "net",
                               "taxed", "big", "bucket"])


def q_window_running(sf_dir):
    """Running totals per customer over a tie-free order key — the
    cumulative window family Kettle's Analytic Query lacks."""
    ds = _t(sf_dir, "orders", ["o_custkey", "o_orderkey",
                               "o_totalprice"])
    return ag.running_aggregate(
        ds, ["o_custkey"], "o_orderkey",
        [("o_totalprice", "sum", "run_total"),
         ("o_totalprice", "count", "run_n"),
         ("o_totalprice", "max", "run_max"),
         ("o_totalprice", "mean", "run_avg"),
         (None, "row_number", "rn")],
        num_partitions=8)


def q_window_rank(sf_dir):
    """RANK / DENSE_RANK per priority over a tie-heavy order column
    (o_orderdate repeats within priority) — tie groups share ranks, so
    the result is deterministic under any arrival order."""
    ds = _t(sf_dir, "orders", ["o_orderkey", "o_orderpriority",
                               "o_orderdate"])
    return ag.running_aggregate(
        ds, ["o_orderpriority"], "o_orderdate",
        [(None, "rank", "rk"), (None, "dense_rank", "drk"),
         (None, "percent_rank", "prk"), (None, "cume_dist", "cd")],
        num_partitions=8)


def q_window_moving(sf_dir):
    """Trailing 5-row moving sum/avg/count per customer + the
    partition's first order value — the moving-frame family."""
    ds = _t(sf_dir, "orders", ["o_custkey", "o_orderkey",
                               "o_totalprice"])
    return ag.running_aggregate(
        ds, ["o_custkey"], "o_orderkey",
        [("o_totalprice", "sum", "mov_sum", 5),
         ("o_totalprice", "mean", "mov_avg", 5),
         ("o_totalprice", "count", "mov_n", 5),
         ("o_totalprice", "min", "mov_min", 5),
         ("o_totalprice", "max", "mov_max", 5),
         ("o_totalprice", "first_value", "first_price"),
         ("o_totalprice", "nth_value", "second_price", 2),
         (None, "ntile", "tile", 7)],
        num_partitions=8)


def q_rollup_sales(sf_dir):
    ds = _t(sf_dir, "lineitem", ["l_returnflag", "l_linestatus",
                                 "l_quantity", "l_extendedprice"])
    return ag.rollup_aggregate(
        ds, ["l_returnflag", "l_linestatus"],
        [ag.Agg("l_quantity", "sum", "sum_qty"),
         ag.Agg("l_extendedprice", "avg", "avg_price"),
         ag.Agg(None, "count", "n_rows")])


def q_cube_sales(sf_dir):
    ds = _t(sf_dir, "lineitem", ["l_returnflag", "l_linestatus",
                                 "l_quantity"])
    return ag.cube_aggregate(
        ds, ["l_returnflag", "l_linestatus"],
        [ag.Agg("l_quantity", "sum", "sum_qty"),
         ag.Agg("l_quantity", "min", "min_qty"),
         ag.Agg("l_quantity", "max", "max_qty")])


QUERIES = {
    "select_values": q_select_values,
    "filter_rows": q_filter_rows,
    "calculator": q_calculator,
    "string_ops": q_string_ops,
    "split_to_rows": q_split_to_rows,
    "concat_fields": q_concat_fields,
    "value_mapper": q_value_mapper,
    "null_handling": q_null_handling,
    "number_range": q_number_range,
    "add_constants_set_value": q_add_constants_set_value,
    "metadata_structure": q_metadata_structure,
    "checksum_md5": q_checksum,
    "switch_case": q_switch_case,
    "clone_row": q_clone_row,
    "add_sequence": q_add_sequence,
    "sample_rows": q_sample_rows,
    "regex_eval": q_regex_eval,
    "data_validator_good": q_data_validator,
    "data_validator_bad": q_data_validator_bad,
    "group_by_q1": q_group_by_q1,
    "group_by_holistic": q_group_by_holistic,
    "unique_rows": q_unique_rows,
    "top_k": q_top_k,
    "analytic_lag": q_analytic_lag,
    "fields_change_sequence": q_fields_change_sequence,
    "univariate_stats": q_univariate_stats,
    "append_streams": q_append_streams,
    "merge_join_inner": q_merge_join_inner,
    "merge_join_left": q_merge_join_left,
    "merge_join_right": q_merge_join_right,
    "merge_join_full": q_merge_join_full,
    "asof_join": q_asof_join,
    "range_join": q_range_join,
    "fuzzy_match_jw": q_fuzzy_match_jw,
    "stream_lookup": q_stream_lookup,
    "anti_join": q_anti_join,
    "semi_join": q_semi_join,
    "join_cartesian": q_join_cartesian,
    "closure_generator": q_closure,
    "row_normaliser": q_row_normaliser,
    "row_denormaliser": q_row_denormaliser,
    "date_calculator": q_date_calculator,
    "multiway_join": q_multiway_join,
    "multiway_merge_join": q_multiway_merge_join,
    "script_values": q_script_values,
    "combination_lookup": q_combination_lookup,
    "fuzzy_match": q_fuzzy_match,
    "string_distance": q_string_distance,
    "string_cleanup": q_string_cleanup,
    "top_k_per_group": q_top_orders_per_customer,
    "formula": q_formula,
    "split_fields": q_split_fields,
    "deterministic_sample": q_deterministic_sample,
    "window_running": q_window_running,
    "window_rank": q_window_rank,
    "window_moving": q_window_moving,
    "rollup_sales": q_rollup_sales,
    "cube_sales": q_cube_sales,
}


ORACLES = {
    "select_values":
        "SELECT l_orderkey, CAST(l_linenumber AS BIGINT) AS lineno, "
        "l_quantity AS qty FROM lineitem",
    "filter_rows":
        "SELECT l_orderkey, l_linenumber, l_quantity, l_discount, "
        "l_returnflag FROM lineitem WHERE (l_quantity >= 30 AND "
        "l_discount < 0.05) OR l_returnflag = 'R'",
    "calculator":
        "SELECT l_orderkey, l_linenumber, "
        "ROUND(l_extendedprice * (1.0 - l_discount), 2) AS revenue, "
        "EXTRACT(year FROM l_shipdate) AS ship_year, "
        "EXTRACT(quarter FROM l_shipdate) AS ship_quarter, "
        "EXTRACT(month FROM l_shipdate) AS ship_month, "
        "l_quantity * l_quantity AS qty_sq, "
        "ROUND(sqrt(l_quantity * l_quantity + l_discount * l_discount), "
        "6) AS hyp, "
        "ROUND(l_extendedprice + l_extendedprice * 10.0 / 100.0, 4) "
        "AS plus_10pct FROM lineitem",
    "string_ops":
        "SELECT c_custkey, lower(c_mktsegment) AS c_mktsegment, "
        "substr(c_name, 1, 8) AS name_prefix, "
        "replace(c_name, 'Customer', 'Cust') AS short_name FROM customer",
    "split_to_rows":
        "SELECT p_partkey, unnest(string_split(p_name, ' ')) AS word "
        "FROM part",
    "concat_fields":
        "SELECT c_custkey, c_name || '|' || c_mktsegment AS tag "
        "FROM customer",
    "value_mapper":
        "SELECT l_orderkey, l_linenumber, l_returnflag, "
        "CASE l_returnflag WHEN 'R' THEN 'returned' WHEN 'A' THEN "
        "'accepted' WHEN 'N' THEN 'none' ELSE l_returnflag END AS "
        "flag_label FROM lineitem",
    "null_handling":
        "SELECT o_orderkey, COALESCE(NULLIF(o_orderstatus, 'O'), 'X') "
        "AS o_orderstatus FROM orders",
    "add_constants_set_value":
        "SELECT n_nationkey, n_name, n_nationkey AS n_regionkey, "
        "'kettleray' AS source_system, CAST(42 AS BIGINT) AS batch_id "
        "FROM nation",
    "metadata_structure":
        "SELECT CAST(column_index AS BIGINT) AS position, "
        "column_name AS fieldname, CASE data_type "
        "WHEN 'BIGINT' THEN 'int64' WHEN 'INTEGER' THEN 'int32' "
        "WHEN 'DOUBLE' THEN 'double' WHEN 'FLOAT' THEN 'float' "
        "WHEN 'VARCHAR' THEN 'string' WHEN 'TIMESTAMP' THEN "
        "'timestamp[us]' ELSE data_type END AS type "
        "FROM duckdb_columns() WHERE table_name = 'lineitem'",
    "number_range":
        "SELECT o_orderkey, o_totalprice, CASE "
        "WHEN o_totalprice >= 0 AND o_totalprice < 50000 THEN 'small' "
        "WHEN o_totalprice >= 50000 AND o_totalprice < 150000 THEN 'medium' "
        "WHEN o_totalprice >= 150000 AND o_totalprice < 10000000 "
        "THEN 'large' ELSE 'other' END AS price_band FROM orders",
    "checksum_md5":
        "SELECT c_custkey, c_name, c_mktsegment, "
        "md5(c_name || c_mktsegment) AS row_md5 FROM customer",
    "switch_case":
        "SELECT l_orderkey, l_linenumber, l_returnflag, "
        "CASE l_returnflag WHEN 'R' THEN 'returns' WHEN 'A' THEN "
        "'archive' ELSE 'other' END AS route FROM lineitem",
    "clone_row":
        "SELECT r_regionkey, r_name, g.v AS clone_num FROM region "
        "CROSS JOIN generate_series(0, 2) g(v)",
    "add_sequence":
        "SELECT c_custkey, c_name, row_number() OVER (ORDER BY c_custkey) "
        "AS seq FROM customer",
    "sample_rows":
        "SELECT o_orderkey, o_totalprice FROM (SELECT *, row_number() "
        "OVER (ORDER BY o_orderkey) AS rn FROM orders) WHERE "
        "(rn BETWEEN 5 AND 15) OR (rn BETWEEN 25 AND 27)",
    "regex_eval":
        "SELECT p_partkey, p_name, regexp_extract(p_name, '^(\\w+)', 1) "
        "AS first_word FROM part",
    "data_validator_good":
        "SELECT c_custkey, c_name, c_acctbal, c_mktsegment FROM customer "
        "WHERE c_acctbal >= 0 AND c_mktsegment IN ('BUILDING', "
        "'AUTOMOBILE', 'MACHINERY', 'HOUSEHOLD', 'FURNITURE')",
    "data_validator_bad":
        "SELECT c_custkey, "
        "CASE WHEN NOT COALESCE(c_acctbal >= 0, FALSE) THEN 'NEG_BAL' "
        "ELSE 'BAD_SEG' END AS error_code, "
        "CASE WHEN NOT COALESCE(c_acctbal >= 0, FALSE) THEN 'c_acctbal' "
        "ELSE 'c_mktsegment' END AS error_field FROM customer "
        "WHERE NOT COALESCE(c_acctbal >= 0, FALSE) OR NOT COALESCE("
        "c_mktsegment IN ('BUILDING', 'AUTOMOBILE', 'MACHINERY', "
        "'HOUSEHOLD', 'FURNITURE'), FALSE)",
    "group_by_q1":
        "SELECT l_returnflag, l_linestatus, SUM(l_quantity) AS sum_qty, "
        "ROUND(SUM(l_extendedprice), 2) AS sum_price, "
        "ROUND(AVG(l_quantity), 4) AS avg_qty, MAX(l_quantity) AS max_qty, "
        "MIN(l_quantity) AS min_qty, COUNT(*) AS n_rows "
        "FROM lineitem GROUP BY l_returnflag, l_linestatus",
    "group_by_holistic":
        "SELECT o_custkey, MIN(o_orderkey) AS first_order, "
        "MAX(o_orderkey) AS last_order, "
        "COUNT(DISTINCT o_orderstatus) AS n_statuses, "
        "COUNT(*) AS n_orders FROM orders GROUP BY o_custkey",
    "unique_rows":
        "SELECT l_returnflag, l_linestatus, COUNT(*) AS dup_count "
        "FROM lineitem GROUP BY l_returnflag, l_linestatus",
    "top_k":
        "SELECT o_orderkey, o_totalprice FROM orders "
        "ORDER BY o_totalprice DESC LIMIT 10",
    "analytic_lag":
        "SELECT o_custkey, o_orderkey, o_totalprice, "
        "LAG(o_totalprice, 1) OVER (PARTITION BY o_custkey ORDER BY "
        "o_orderkey) AS prev_price, LEAD(o_totalprice, 1) OVER "
        "(PARTITION BY o_custkey ORDER BY o_orderkey) AS next_price "
        "FROM orders",
    "fields_change_sequence":
        "SELECT o_custkey, o_orderkey, row_number() OVER (PARTITION BY "
        "o_custkey ORDER BY o_orderkey) AS seq_in_cust FROM orders",
    "univariate_stats":
        "SELECT COUNT(l_extendedprice) AS l_extendedprice_n, "
        "ROUND(AVG(l_extendedprice), 4) AS l_extendedprice_mean, "
        "ROUND(STDDEV_SAMP(l_extendedprice), 4) AS l_extendedprice_std, "
        "MIN(l_extendedprice) AS l_extendedprice_min, "
        "MAX(l_extendedprice) AS l_extendedprice_max, "
        "ROUND(MEDIAN(l_extendedprice), 4) AS l_extendedprice_median "
        "FROM lineitem",
    "append_streams":
        "SELECT n_nationkey, n_name FROM nation UNION ALL "
        "SELECT r_regionkey AS n_nationkey, r_name AS n_name FROM region",
    "merge_join_inner":
        "SELECT o_orderkey, o_custkey, o_totalprice, c_name FROM orders "
        "JOIN customer ON o_custkey = c_custkey",
    "merge_join_left":
        "SELECT l_orderkey, l_linenumber, l_partkey, p_brand FROM "
        "lineitem LEFT JOIN (SELECT p_partkey, p_brand FROM part WHERE "
        "p_size > 25) p ON l_partkey = p_partkey",
    "merge_join_right":
        "SELECT c_custkey, c_name, o_orderkey, o_totalprice FROM "
        "(SELECT * FROM orders WHERE o_totalprice > 150000) o "
        "RIGHT JOIN customer ON o.o_custkey = c_custkey",
    "merge_join_full":
        "SELECT COALESCE(c.c_custkey, o.o_custkey) AS c_custkey, c_name, "
        "o_orderkey, o_totalprice FROM "
        "(SELECT * FROM orders WHERE o_totalprice > 150000) o "
        "FULL OUTER JOIN (SELECT c_custkey, c_name FROM customer WHERE "
        "c_acctbal < 1000) c ON o.o_custkey = c.c_custkey",
    "range_join":
        "SELECT e.event_id, e.value, b.band_name FROM events e "
        "LEFT JOIN (SELECT r_regionkey * 100.0 AS lo, "
        "r_regionkey * 100.0 + 100.0 AS hi, r_name AS band_name "
        "FROM region) b ON e.value >= b.lo AND e.value < b.hi",
    "asof_join":
        "SELECT e.event_id, e.user_id, e.ts, e.event_type, e.value, "
        "p.value AS purchase_value FROM events e ASOF LEFT JOIN "
        "(SELECT user_id, ts, value FROM events "
        "WHERE event_type = 'purchase') p "
        "ON e.user_id = p.user_id AND e.ts >= p.ts",
    "fuzzy_match_jw":
        "SELECT n_nationkey, n_name, "
        "(SELECT r_name FROM region ORDER BY "
        "jaro_winkler_similarity(n_name, r_name) DESC, r_name LIMIT 1) "
        "AS best_region, "
        "ROUND((SELECT MAX(jaro_winkler_similarity(n_name, r_name)) "
        "FROM region), 6) AS jw FROM nation",
    "stream_lookup":
        "SELECT l_orderkey, l_linenumber, l_partkey, "
        "COALESCE(p_brand, 'NONE') AS p_brand FROM lineitem LEFT JOIN "
        "(SELECT p_partkey, p_brand FROM part WHERE p_size > 25) p "
        "ON l_partkey = p_partkey",
    "anti_join":
        "SELECT o_orderkey, o_custkey FROM orders WHERE o_custkey NOT IN "
        "(SELECT c_custkey FROM customer WHERE c_acctbal > 5000)",
    "semi_join":
        "SELECT c_custkey, c_name FROM customer WHERE c_custkey IN "
        "(SELECT o_custkey FROM orders)",
    "join_cartesian":
        "SELECT n_nationkey, n_name, r_regionkey, r_name FROM nation "
        "CROSS JOIN region",
    "closure_generator":
        "SELECT n_name AS parent, n_name AS child, 0 AS depth FROM nation "
        "UNION ALL SELECT r_name AS parent, n_name AS child, 1 AS depth "
        "FROM nation JOIN region ON n_regionkey = r_regionkey",
    "row_normaliser":
        "SELECT p_partkey, 'p_size' AS measure, "
        "CAST(p_size AS DOUBLE) AS value FROM part UNION ALL "
        "SELECT p_partkey, 'p_retailprice' AS measure, p_retailprice "
        "AS value FROM part",
    "row_denormaliser":
        "SELECT p_partkey, CAST(p_size AS DOUBLE) AS p_size, "
        "p_retailprice FROM part",
    "date_calculator":
        "SELECT o_orderkey, "
        "CAST(extract(week FROM o_orderdate) AS BIGINT) AS iso_week, "
        "CAST(extract(isodow FROM o_orderdate) AS BIGINT) AS dow, "
        "CAST(datediff('day', DATE '1995-01-01', o_orderdate) AS BIGINT) "
        "AS days_since_95, "
        "date_trunc('month', o_orderdate) AS month_start, "
        "CAST(extract(doy FROM o_orderdate) AS BIGINT) AS doy, "
        "CAST(extract(isoyear FROM o_orderdate) AS BIGINT) AS iso_year, "
        "o_orderdate + INTERVAL 1 MONTH AS next_month, "
        "o_orderdate + INTERVAL 1 YEAR AS next_year, "
        "CAST(last_day(o_orderdate) AS TIMESTAMP) AS month_end, "
        "o_orderdate + INTERVAL 36 HOUR AS plus_36h, "
        "CAST((SELECT count(*) FROM UNNEST(generate_series("
        "DATE '1995-01-02', CAST(o_orderdate AS DATE), "
        "INTERVAL 1 DAY)) AS t(d) WHERE isodow(CAST(d AS DATE)) <= 5) "
        "AS BIGINT) AS workdays_since_95, "
        "strftime(o_orderdate, '%Y/%m/%d') AS date_str, "
        "strptime(strftime(o_orderdate, '%Y/%m/%d'), '%Y/%m/%d') "
        "AS reparsed FROM orders",
    "multiway_join":
        "SELECT l_orderkey, l_linenumber, l_quantity, c_custkey, c_name "
        "FROM lineitem JOIN orders ON l_orderkey = o_orderkey "
        "JOIN customer ON o_custkey = c_custkey",
    "multiway_merge_join":
        "SELECT l.l_orderkey, l.l_linenumber, l.l_quantity, o.o_custkey, "
        "a.n_lines FROM lineitem l "
        "JOIN orders o ON l.l_orderkey = o.o_orderkey "
        "JOIN (SELECT l_orderkey, COUNT(*) AS n_lines FROM lineitem "
        "GROUP BY l_orderkey) a ON a.l_orderkey = l.l_orderkey",
    "script_values":
        "SELECT l_orderkey, l_linenumber, "
        "l_extendedprice * (1 - l_discount) AS net, "
        "l_extendedprice * (1 - l_discount) * (1 + l_tax) AS taxed, "
        "l_extendedprice * (1 - l_discount) * (1 + l_tax) > 2000 AS big, "
        "FLOOR(l_extendedprice * (1 - l_discount) / 500) AS bucket "
        "FROM lineitem",
    "combination_lookup":
        "SELECT l_returnflag, l_linestatus, "
        "md5(l_returnflag || '|' || l_linestatus) AS combo_key "
        "FROM lineitem GROUP BY l_returnflag, l_linestatus",
    "fuzzy_match":
        "SELECT n_nationkey, n_name, "
        "(SELECT r_name FROM region ORDER BY levenshtein(n_name, r_name), "
        "r_name LIMIT 1) AS best_region, "
        "(SELECT MIN(levenshtein(n_name, r_name)) FROM region) AS distance "
        "FROM nation",
    "string_distance":
        "SELECT c_custkey, c_name, "
        "levenshtein(c_name, 'Customer#000000001') AS lev, "
        "damerau_levenshtein(c_name, 'Customer#000000001') AS dam, "
        "ROUND(jaro_similarity(c_name, 'Customer#000000001'), 6) AS jaro, "
        "ROUND(jaro_winkler_similarity(c_name, 'Customer#000000001'), 6) "
        "AS jw, "
        # unit-penalty Needleman-Wunsch global alignment == -levenshtein
        "-levenshtein(c_name, 'Customer#000000001') AS nw FROM customer",
    "string_cleanup":
        "SELECT c_custkey, "
        "regexp_replace(c_name, '[^0-9]', '', 'g') AS digits, "
        "regexp_replace(c_name, '[0-9]', '', 'g') AS alpha, "
        "substr(c_name, 1, 4) AS l4, "
        "substr(c_name, length(c_name) - 2, 3) AS r3, "
        "replace(replace(replace(replace(replace(c_name || '<&>', "
        "'&', '&amp;'), '<', '&lt;'), '>', '&gt;'), '\"', '&quot;'), "
        "'''', '&apos;') AS xml_esc, "
        "c_name || '<&>' AS xml_rt, "
        "'<![CDATA[' || c_name || ']]>' AS cdata, "
        "replace(c_mktsegment || '''s', '''', '''''') AS sql_esc, "
        "hex(c_mktsegment) AS hexed, "
        "c_mktsegment AS unhexed FROM customer",
    "top_k_per_group":
        "SELECT o_orderkey, o_custkey, o_totalprice, rank FROM "
        "(SELECT *, CAST(row_number() OVER (PARTITION BY o_custkey "
        "ORDER BY o_totalprice DESC) AS BIGINT) AS rank FROM orders) "
        "WHERE rank <= 3",
    "split_fields":
        "SELECT c_custkey, string_split(c_name, '#')[1] AS name_word, "
        "string_split(c_name, '#')[2] AS name_num FROM customer",
    "formula":
        "SELECT l_orderkey, l_linenumber, "
        "ROUND(CASE WHEN l_quantity > 20 THEN "
        "l_extendedprice * (1 - l_discount) * (1 + l_tax) "
        "ELSE l_extendedprice * (1 - l_discount) END, 6) AS charge "
        "FROM lineitem",
    "deterministic_sample":
        "SELECT o_orderkey, o_totalprice, "
        "md5(CAST(o_orderkey AS VARCHAR)) AS __h FROM orders "
        "ORDER BY __h LIMIT 20",
    "window_running":
        "SELECT o_custkey, o_orderkey, o_totalprice, "
        "SUM(o_totalprice) OVER w AS run_total, "
        "COUNT(o_totalprice) OVER w AS run_n, "
        "MAX(o_totalprice) OVER w AS run_max, "
        "AVG(o_totalprice) OVER w AS run_avg, "
        "ROW_NUMBER() OVER w AS rn FROM orders "
        "WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderkey "
        "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)",
    "window_rank":
        "SELECT o_orderkey, o_orderpriority, o_orderdate, "
        "RANK() OVER w AS rk, DENSE_RANK() OVER w AS drk, "
        "PERCENT_RANK() OVER w AS prk, CUME_DIST() OVER w AS cd "
        "FROM orders WINDOW w AS (PARTITION BY o_orderpriority "
        "ORDER BY o_orderdate)",
    "window_moving":
        "SELECT o_custkey, o_orderkey, o_totalprice, "
        "SUM(o_totalprice) OVER w5 AS mov_sum, "
        "AVG(o_totalprice) OVER w5 AS mov_avg, "
        "COUNT(o_totalprice) OVER w5 AS mov_n, "
        "MIN(o_totalprice) OVER w5 AS mov_min, "
        "MAX(o_totalprice) OVER w5 AS mov_max, "
        "FIRST_VALUE(o_totalprice) OVER wu AS first_price, "
        "NTH_VALUE(o_totalprice, 2) OVER wu AS second_price, "
        "NTILE(7) OVER (PARTITION BY o_custkey "
        "ORDER BY o_orderkey) AS tile "
        "FROM orders WINDOW "
        "w5 AS (PARTITION BY o_custkey ORDER BY o_orderkey "
        "ROWS BETWEEN 4 PRECEDING AND CURRENT ROW), "
        "wu AS (PARTITION BY o_custkey ORDER BY o_orderkey "
        "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)",
    "rollup_sales":
        "SELECT l_returnflag, l_linestatus, "
        "GROUPING(l_returnflag, l_linestatus) AS grouping_id, "
        "SUM(l_quantity) AS sum_qty, "
        "AVG(l_extendedprice) AS avg_price, "
        "COUNT(*) AS n_rows FROM lineitem "
        "GROUP BY ROLLUP (l_returnflag, l_linestatus)",
    "cube_sales":
        "SELECT l_returnflag, l_linestatus, "
        "GROUPING(l_returnflag, l_linestatus) AS grouping_id, "
        "SUM(l_quantity) AS sum_qty, MIN(l_quantity) AS min_qty, "
        "MAX(l_quantity) AS max_qty FROM lineitem "
        "GROUP BY CUBE (l_returnflag, l_linestatus)",
}
