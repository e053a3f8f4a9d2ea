"""Error types mirroring the observable error semantics of the reference.

Reference behaviors reproduced (see SURVEY.md §2 "Error semantics"):

- ``prepare()`` of DDL -> "Cannot prepare DDL statement"
  (reference: src/preparable_context.rs:18-28).
- ``execute()`` with a missing placeholder value ->
  "Placeholder '$1' was not provided a value for execution"
  (reference: src/param_resolver.rs:90-93).
"""

from __future__ import annotations


class EngineError(Exception):
    """Base class for engine errors."""


class PrepareError(EngineError):
    """Raised when a statement cannot be prepared (e.g. DDL)."""


class ParameterError(EngineError):
    """Raised for missing/unknown parameter bindings at execute time."""


def missing_placeholder(original_spelling: str) -> ParameterError:
    # Message shape matches reference src/param_resolver.rs:90-93.
    return ParameterError(
        f"Placeholder '{original_spelling}' was not provided a value for execution"
    )


def cannot_prepare_ddl() -> PrepareError:
    # Exact message of reference src/preparable_context.rs:18-28.
    return PrepareError("Cannot prepare DDL statement")
