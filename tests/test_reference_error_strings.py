"""Pinned byte-exact parity with the reference's two observable error
messages:

- prepare() of DDL -> "Cannot prepare DDL statement"
  (reference src/preparable_context.rs:18-28, emitted for CreateMemoryTable
  and CreateIndex);
- execute() with an unbound placeholder ->
  "Placeholder '<spelling>' was not provided a value for execution"
  (reference src/param_resolver.rs:90-93).

These are the strings reference users match on; a drift here is an API
break even if the exception types stay right.
"""

import pytest

from datafusion_dynamic_filter_spark.errors import ParameterError, PrepareError


def test_prepare_ddl_exact_message(engine):
    for ddl in (
        "CREATE TABLE t AS SELECT 1",
        "CREATE TABLE t (x INT)",
        "CREATE INDEX idx ON t (x)",
    ):
        with pytest.raises(PrepareError) as exc_info:
            engine.prepare(ddl)
        assert str(exc_info.value) == "Cannot prepare DDL statement"


def test_missing_placeholder_exact_message(engine, users):
    stmt = engine.prepare("SELECT id, name FROM users WHERE id = $1")
    with pytest.raises(ParameterError) as exc_info:
        stmt.execute({})
    assert (
        str(exc_info.value)
        == "Placeholder '$1' was not provided a value for execution"
    )


def test_missing_named_placeholder_keeps_original_spelling(engine, users):
    stmt = engine.prepare("SELECT id FROM users WHERE id = :uid")
    with pytest.raises(ParameterError) as exc_info:
        stmt.execute({})
    assert (
        str(exc_info.value)
        == "Placeholder ':uid' was not provided a value for execution"
    )
