"""Transform DSL tests: the reference example config's operations
(logmetrics_collector_transform.conf:40-47) row by row."""

import pandas as pd
from pyspark.sql import functions as F

from logmetrics_spark.config import TransformDef, TransformOp
from logmetrics_spark.operators.transform import transform_expr

APACHE_CHAIN = TransformDef(
    position=3,
    replace_only_one=True,
    operations=(
        TransformOp("replace", r"^.*/bid", "/bid/"),
        TransformOp("replace", r"^/(\w+)/.*$", "/@@1@@/"),
        TransformOp("replace", r"^/search\.php", "/search/"),
        TransformOp("replace", r"^/[^/]*$", "/"),
        TransformOp(
            "match_or_default",
            r"^/(|(|bid|buy|search|list|category|sitemap|info)/)$",
            "other",
        ),
    ),
)


def _apply(spark, tdef, values, compat=False):
    df = spark.createDataFrame(pd.DataFrame({"v": values}))
    out = df.select(transform_expr(F.col("v"), tdef, compat).alias("o")).collect()
    return [r["o"] for r in out]


def test_apache_path_cleanup_examples(spark):
    cases = {
        # comments from the reference config
        "/erronous/path/bid?params": "/bid/",  # ^.*/bid -> /bid/
        "/buy/now.php": "/buy/",  # /@@1@@/ backref
        "/search.php?q=x": "/search/",
        "/favicon.ico": "/",
        "/unknown/zone/deep": "other",  # whitelist default
        "/bid/item1": "/bid/",
        "/category/books/x": "/category/",
    }
    got = _apply(spark, APACHE_CHAIN, list(cases))
    assert got == list(cases.values())


def test_dash_to_zero(spark):
    tdef = TransformDef(position=4, operations=(TransformOp("replace", "^-$", "0"),))
    assert _apply(spark, tdef, ["-", "123", "a-b"]) == ["0", "123", "a-b"]


def test_match_or_default_keeps_matching(spark):
    tdef = TransformDef(
        position=1,
        operations=(TransformOp("match_or_default", r"^(GET|POST)$", "other"),),
    )
    assert _apply(spark, tdef, ["GET", "POST", "COOK"]) == ["GET", "POST", "other"]


def test_replace_only_one_stops_after_first_hit(spark):
    tdef = TransformDef(
        position=1,
        replace_only_one=True,
        operations=(
            TransformOp("replace", "^a", "X"),
            TransformOp("replace", "^X$", "Y"),  # must NOT run after first hit
        ),
    )
    assert _apply(spark, tdef, ["abc"]) == ["X"]


def test_compat_transform_apply_all_replays_reference(spark):
    tdef = TransformDef(
        position=1,
        replace_only_one=True,  # reference code ignores the flag (transform.go:48-60)
        operations=(
            TransformOp("replace", "^a", "X"),
            TransformOp("replace", "^X$", "Y"),
        ),
    )
    assert _apply(spark, tdef, ["abc"], compat=True) == ["Y"]


def test_template_multi_backref(spark):
    tdef = TransformDef(
        position=1,
        operations=(TransformOp("replace", r"^(\w+)-(\w+)$", "@@2@@_@@1@@"),),
    )
    assert _apply(spark, tdef, ["foo-bar", "nomatch"]) == ["bar_foo", "nomatch"]


def test_guard_before_replace_interleaves_in_config_order(spark):
    """ADVICE fix: ops apply in config order against the RUNNING
    value — a match_or_default placed before a replace feeds its
    modified value into that replace (oracle semantics)."""
    tdef = TransformDef(
        position=1,
        replace_only_one=True,
        operations=(
            TransformOp("match_or_default", r"^/api/", "/other/"),
            TransformOp("replace", r"^/other/", "fallback"),
        ),
    )
    # '/web/y' fails the guard -> '/other/' -> replace fires -> 'fallback'
    # '/api/x' passes the guard -> unchanged -> replace misses
    assert _apply(spark, tdef, ["/web/y", "/api/x"]) == ["fallback", "/api/x"]


def test_guard_before_replace_fused_kernel_matches(spark):
    """Same chain through the fused pandas path."""
    from logmetrics_spark.operators.fused import _apply_transform_series

    tdef = TransformDef(
        position=1,
        replace_only_one=True,
        operations=(
            TransformOp("match_or_default", r"^/api/", "/other/"),
            TransformOp("replace", r"^/other/", "fallback"),
        ),
    )
    got = _apply_transform_series(tdef, pd.Series(["/web/y", "/api/x"]), False)
    assert list(got) == ["fallback", "/api/x"]


def test_guard_before_replace_matches_oracle(spark):
    from logmetrics_spark.oracle import _apply_transform

    tdef = TransformDef(
        position=1,
        replace_only_one=True,
        operations=(
            TransformOp("match_or_default", r"^/api/", "/other/"),
            TransformOp("replace", r"^/other/", "fallback"),
        ),
    )
    assert _apply_transform(tdef, "/web/y", False) == "fallback"
    assert _apply_transform(tdef, "/api/x", False) == "/api/x"


# ---------------------------------------------------------------- property


def test_transform_three_paths_agree_randomized(spark):
    """Property: for random op chains (replace/match_or_default in any
    order, only_one on/off) and random values, the Catalyst expr, the
    fused pandas kernel, and the sequential oracle produce identical
    outputs. This is the contract the ADVICE round-2 fix restored —
    exercised at the path level so op-order regressions can't hide
    behind fixture configs."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from logmetrics_spark.operators.fused import _apply_transform_series
    from logmetrics_spark.oracle import _apply_transform

    # small alphabets keep collision (match) rates high
    pat = st.sampled_from(
        [r"^a", r"b$", r"ab", r"^(\w+)/", r"^-$", r"^x(\d+)", r"c.d", r"^/(\w+)/"]
    )
    arg_repl = st.sampled_from(["X", "@@1@@_t", "/@@1@@/", "", "0"])
    arg_dflt = st.sampled_from(["other", "", "dflt"])
    op = st.one_of(
        st.tuples(st.just("replace"), pat, arg_repl),
        st.tuples(st.just("match_or_default"), pat, arg_dflt),
    )
    value = st.text(alphabet="ab/x1-cd", min_size=0, max_size=8)

    @settings(max_examples=40, deadline=None)
    @given(
        ops=st.lists(op, min_size=1, max_size=4),
        values=st.lists(value, min_size=1, max_size=6),
        only_one=st.booleans(),
        compat=st.booleans(),
    )
    def check(ops, values, only_one, compat):
        # templates referencing group 1 require a pattern with a group
        ops = [
            TransformOp(k, p, a if "(" in p or "@@1@@" not in a else "X")
            for k, p, a in ops
        ]
        tdef = TransformDef(position=1, replace_only_one=only_one, operations=tuple(ops))
        want = [_apply_transform(tdef, v, compat) for v in values]
        got_fused = list(_apply_transform_series(tdef, pd.Series(values), compat))
        assert got_fused == want, f"fused != oracle for ops={ops} values={values}"
        got_expr = _apply(spark, tdef, values, compat)
        assert got_expr == want, f"expr != oracle for ops={ops} values={values}"

    check()
