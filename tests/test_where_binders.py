"""Per-conjunct WHERE binder edge cases (r4 refactor: eq/IN conjuncts bind
as Columns via F.lit/isin with no per-key SQL parse; irregular conjuncts
re-bind text; static conjuncts parse once)."""

import pytest


@pytest.fixture(scope="module")
def strings(engine):
    return engine.register_memtable(
        "binder_strings",
        [(1, "O'Brien"), (2, "back\\slash"), (3, "plain"), (4, None)],
        "id int, name string",
    )


def test_eq_binder_quotes_and_backslashes(engine, strings):
    stmt = engine.prepare("SELECT id FROM binder_strings WHERE name = $1")
    assert [r.id for r in stmt.execute({"$1": "O'Brien"}).collect()] == [1]
    assert [r.id for r in stmt.execute({"$1": "back\\slash"}).collect()] == [2]


def test_eq_binder_null_matches_nothing(engine, strings):
    # SQL equality with NULL is never true — the row with name NULL must
    # NOT match, and no error is raised (reference: a value matching no
    # rows is an empty result, tests/preparable_context_basic_test.rs:221).
    stmt = engine.prepare("SELECT id FROM binder_strings WHERE name = $1")
    assert stmt.execute({"$1": None}).collect() == []


def test_in_binder_list_and_tuple(engine, strings):
    stmt = engine.prepare("SELECT id FROM binder_strings WHERE id IN $1")
    assert sorted(r.id for r in stmt.execute({"$1": [1, 3]}).collect()) == [1, 3]
    assert sorted(r.id for r in stmt.execute({"$1": (2,)}).collect()) == [2]


def test_mixed_static_text_and_eq_conjuncts(engine, testdata):
    # static conjunct + irregular (range -> text binder) + eq conjunct in
    # one WHERE; results must match the fully-literal execution.
    stmt = engine.prepare(
        "SELECT o_orderkey FROM orders WHERE o_orderstatus = 'O' "
        "AND o_totalprice > $1 AND o_custkey = $2"
    )
    got = sorted(r.o_orderkey for r in stmt.execute({"$1": 1000.0, "$2": 37}).collect())
    want = sorted(
        r.o_orderkey
        for r in engine.spark.sql(
            "SELECT o_orderkey FROM orders WHERE o_orderstatus = 'O' "
            "AND o_totalprice > 1000.0 AND o_custkey = 37"
        ).collect()
    )
    assert got == want and len(got) > 0


def test_or_precedence_binds_whole_where(engine, strings):
    # SQL parses `a OR b AND c` as `a OR (b AND c)`; re-ANDing split
    # conjuncts would flip it to `(a OR b) AND c`.  With id=1 named
    # O'Brien: rows where id = 1 OR (name = 'plain' AND id = :p).
    stmt = engine.prepare(
        "SELECT id FROM binder_strings WHERE id = 1 OR name = 'plain' AND id = $1"
    )
    # $1 = 2: name='plain' has id 3, so the AND arm is false; only id=1.
    assert sorted(r.id for r in stmt.execute({"$1": 2}).collect()) == [1]
    # $1 = 3: AND arm matches row 3; result is {1, 3}.
    assert sorted(r.id for r in stmt.execute({"$1": 3}).collect()) == [1, 3]


def test_and_inside_string_literal_not_split(engine):
    engine.register_memtable(
        "binder_lits",
        [(1, "rock AND roll"), (2, "rock"), (3, "roll")],
        "id int, name string",
    )
    stmt = engine.prepare(
        "SELECT id FROM binder_lits WHERE name = 'rock AND roll' AND id = $1"
    )
    assert [r.id for r in stmt.execute({"$1": 1}).collect()] == [1]
    assert stmt.execute({"$1": 2}).collect() == []


def test_or_inside_string_literal_still_splits(engine):
    engine.register_memtable(
        "binder_orlits",
        [(1, "this OR that"), (2, "other")],
        "id int, name string",
    )
    stmt = engine.prepare(
        "SELECT id FROM binder_orlits WHERE name = 'this OR that' AND id = $1"
    )
    assert [r.id for r in stmt.execute({"$1": 1}).collect()] == [1]
    assert stmt.execute({"$1": 2}).collect() == []


def test_in_list_with_top_level_or(engine, strings):
    # Found by the hypothesis fuzzer (tests/test_template_property.py): an
    # IN placeholder forced onto the whole-text binder by a top-level OR.
    # The prepare-time NULL trial used to render `id IN NULL` (syntax
    # error), demoting the statement to the literal path — where Spark's
    # parameterized parser cannot express `IN :p1` at all.  IN-positioned
    # placeholders now trial-bind as (NULL) and the literal path inlines
    # list values as SQL tuples.
    stmt = engine.prepare(
        "SELECT id FROM binder_strings WHERE id IN $1 OR name = $2"
    )
    assert stmt.mode == "dynamic"
    got = sorted(
        r.id for r in stmt.execute({"$1": [2, 3], "$2": "O'Brien"}).collect()
    )
    assert got == [1, 2, 3]


def test_in_list_on_forced_literal_path(engine, strings):
    # Same statement pinned to the literal path: list params must inline
    # as SQL tuples (Spark's args= has no list-valued marker).
    from datafusion_dynamic_filter_spark.prepared import PreparedStatement

    stmt = PreparedStatement(
        engine.spark,
        "SELECT id FROM binder_strings WHERE id IN $1 OR name = $2",
        mode="literal",
    )
    got = sorted(
        r.id for r in stmt.execute({"$1": [2, 3], "$2": "O'Brien"}).collect()
    )
    assert got == [1, 2, 3]


def test_repeat_execution_uses_plan_cache(engine, strings):
    stmt = engine.prepare("SELECT id FROM binder_strings WHERE id = $1")
    d1 = stmt.execute({"$1": 1})
    d2 = stmt.execute({"$1": 1})
    assert d1 is d2  # identical params -> cached DataFrame, zero re-planning
