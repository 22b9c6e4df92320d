from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from olist_snowflake_dbt_spark.plans import (
    CycleError,
    ModelRegistry,
    RefNotFoundError,
)


def _mini_registry(spark) -> ModelRegistry:
    r = ModelRegistry(spark)
    r.register_source("src", spark.range(10).withColumnRenamed("id", "x"))
    r.register("a", lambda ctx: ctx.source("src").filter(F.col("x") > 2))
    r.register("b", "select x + 1 as y from {{ ref('a') }}")
    r.register("c", lambda ctx: ctx.ref("b").filter(F.col("y") > 5), depends_on=("b",))
    return r


def test_build_chain(spark):
    r = _mini_registry(spark)
    rows = r.build("c").collect()
    assert sorted(x.y for x in rows) == [6, 7, 8, 9, 10]


def test_static_refs_and_topo(spark):
    r = _mini_registry(spark)
    order = r.topological_order()
    assert order.index("a") < order.index("b") < order.index("c")


def test_ref_not_found_is_compile_error(spark):
    r = ModelRegistry(spark)
    r.register("broken", "select * from {{ ref('missing') }}")
    with pytest.raises(RefNotFoundError):
        r.graph()
    with pytest.raises(RefNotFoundError):
        r.build("broken")


def test_cycle_detection(spark):
    r = ModelRegistry(spark)
    r.register("m1", "select * from {{ ref('m2') }}")
    r.register("m2", "select * from {{ ref('m1') }}")
    with pytest.raises(CycleError):
        r.topological_order()
    with pytest.raises(CycleError):
        r.build("m1")


def test_selection_grammar(spark):
    r = _mini_registry(spark)
    assert r.select("b") == {"b"}
    assert r.select("+b") == {"a", "b"}
    assert r.select("b+") == {"b", "c"}
    assert r.select("+b+") == {"a", "b", "c"}
    assert r.select("a c") == {"a", "c"}  # space = union (dbt CLI)
    assert r.select("+c,b+") == {"b", "c"}  # comma = INTERSECTION
    assert r.select("@a") == {"a", "b", "c"}  # at-operator
    assert r.select("+b+", exclude="a") == {"b", "c"}  # --exclude
    with pytest.raises(RefNotFoundError):
        r.select("nope")


def test_duplicate_model_rejected(spark):
    r = _mini_registry(spark)
    with pytest.raises(Exception):
        r.register("a", "select 1")


def test_build_memoized(spark):
    r = _mini_registry(spark)
    assert r.build("b") is r.build("b")


def test_tag_selector(spark):
    from olist_snowflake_dbt_spark.plans.registry import (
        ModelRegistry,
        RefNotFoundError,
    )
    import pytest as _pytest

    reg = ModelRegistry(spark)
    src = spark.createDataFrame([(1,)], "id long")
    reg.register_source("src", src)
    reg.register("a", "select * from {{ ref('src') }}", tags=("nightly",))
    reg.register("b", "select * from {{ ref('a') }}", tags=("nightly", "gold"))
    reg.register("c", "select * from {{ ref('b') }}")
    assert reg.select("tag:nightly") == {"a", "b"}
    assert reg.select("tag:gold+") == {"b", "c"}
    assert reg.select("+tag:gold") == {"a", "b"}
    assert reg.select("tag:nightly c") == {"a", "b", "c"}
    assert reg.select("tag:nightly,tag:gold") == {"b"}  # intersection
    with _pytest.raises(RefNotFoundError):
        reg.select("tag:nope")


def test_var_substitution(spark):
    from olist_snowflake_dbt_spark.plans.registry import (
        CompilationError,
        ModelRegistry,
    )
    import pytest as _pytest

    reg = ModelRegistry(spark, variables={"cutoff": 2, "label": "a'b"})
    src = spark.createDataFrame([(1, "x"), (3, "y")], "id long, v string")
    reg.register_source("src", src)
    reg.register(
        "filtered",
        "select id, {{ var('label') }} as tag from {{ ref('src') }} "
        "where id >= {{ var('cutoff') }}",
    )
    reg.register(
        "defaulted",
        "select count(*) as n from {{ ref('src') }} "
        "where id >= {{ var('missing', 0) }}",
    )
    rows = reg.build("filtered").collect()
    assert [(r.id, r.tag) for r in rows] == [(3, "a'b")]
    assert reg.build("defaulted").first().n == 2
    reg.register("boom", "select {{ var('nope') }} as x from {{ ref('src') }}")
    with _pytest.raises(CompilationError, match="undefined var"):
        reg.build("boom")


def test_var_types_and_bidirectional_tag_walk(spark):
    from olist_snowflake_dbt_spark.plans.registry import ModelRegistry

    reg = ModelRegistry(spark, variables={"flag": True, "lim": 1})
    reg.register_source("src", spark.createDataFrame([(1,), (2,)], "id long"))
    reg.register(
        "m",
        "select id from {{ ref('src') }} "
        "where {{ var('flag') }} and id <= {{ var('lim') }}",
        tags=("mid",),
    )
    assert [r.id for r in reg.build("m").collect()] == [1]
    reg.register("up", "select * from {{ ref('src') }}")
    reg.register("down", "select * from {{ ref('m') }}")
    # +tag:x+ walks both directions from every tagged core
    assert reg.select("+tag:mid+") >= {"m", "down"}


def test_var_default_with_parens_and_string_literal(spark):
    """ADVICE r05: defaults containing ')' must parse, and a quoted
    string default must render as a SQL string literal (never splice as
    a bare identifier)."""
    from olist_snowflake_dbt_spark.plans.registry import ModelRegistry

    reg = ModelRegistry(spark)
    reg.register_source("src", spark.createDataFrame([(1,)], "id long"))
    # quoted default containing parens and a comma
    reg.register(
        "parens",
        "select {{ var('x', '(a),b') }} as tag from {{ ref('src') }}",
    )
    assert reg.build("parens").first().tag == "(a),b"
    # double-quoted default → still a SQL STRING literal, not an identifier
    reg.register(
        "dquote",
        'select {{ var("y", "hello") }} as tag from {{ ref("src") }}',
    )
    assert reg.build("dquote").first().tag == "hello"
    # unquoted expression default with balanced parens splices verbatim
    reg.register(
        "expr",
        "select {{ var('n', (1 + 2) * 3) }} as n from {{ ref('src') }}",
    )
    assert reg.build("expr").first().n == 9
    # a SET variable still wins over the default
    reg2 = ModelRegistry(spark, variables={"x": "set"})
    reg2.register_source("src", spark.createDataFrame([(1,)], "id long"))
    reg2.register(
        "won", "select {{ var('x', '(d)') }} as tag from {{ ref('src') }}"
    )
    assert reg2.build("won").first().tag == "set"
