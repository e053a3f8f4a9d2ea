"""Placeholder scanning, canonicalization, and literal binding.

The reference accepts PostgreSQL-style positional placeholders (``$1``,
``$2``, ...) anywhere sqlparser allows them (reference:
src/param_resolver.rs:77-100 rewrites ``Expr::Placeholder``).  Spark's
parameterized SQL uses named ``:name`` markers.  We accept both spellings
(plus ``?`` positional) and canonicalize to ``:pN`` named parameters so a
single binding path serves every mode.

Binding values as SQL literals is used by the plan-reuse ("dynamic") path,
where a cached DataFrame template gets a per-execution ``filter()`` with the
bound predicate — the Spark analog of the reference's
``DynamicFilterPhysicalExpr::update`` (src/physical.rs:247-255).
"""

from __future__ import annotations

import datetime as _dt
import re
from dataclasses import dataclass

from .errors import ParameterError, missing_placeholder

_IDENT = re.compile(r"[A-Za-z_][A-Za-z_0-9]*")


@dataclass(frozen=True)
class Placeholder:
    """A placeholder occurrence in the SQL text."""

    original: str  # as written: "$1", ":p1", "?"
    canonical: str  # canonical name: "p1", "p2", ...
    start: int  # offset of the first char in the original SQL
    end: int  # offset one past the last char


def _scan(sql: str):
    """Yield (kind, start, end) tokens for placeholder-relevant positions,
    skipping string literals, quoted identifiers, and comments."""
    i, n = 0, len(sql)
    while i < n:
        c = sql[i]
        if c == "'":  # string literal, '' escapes
            j = i + 1
            while j < n:
                if sql[j] == "'":
                    if j + 1 < n and sql[j + 1] == "'":
                        j += 2
                        continue
                    break
                j += 1
            i = j + 1
        elif c == '"' or c == "`":  # quoted identifier
            q = c
            j = i + 1
            while j < n and sql[j] != q:
                j += 1
            i = j + 1
        elif c == "-" and i + 1 < n and sql[i + 1] == "-":
            j = sql.find("\n", i)
            i = n if j < 0 else j + 1
        elif c == "/" and i + 1 < n and sql[i + 1] == "*":
            j = sql.find("*/", i + 2)
            i = n if j < 0 else j + 2
        elif c == "$":
            m = re.match(r"\$(\d+)", sql[i:])
            if m:
                yield ("dollar", i, i + m.end())
                i += m.end()
            else:
                i += 1
        elif c == ":":
            # skip "::" casts
            if i + 1 < n and sql[i + 1] == ":":
                i += 2
                continue
            m = _IDENT.match(sql, i + 1)
            if m:
                yield ("named", i, m.end())
                i = m.end()
            else:
                i += 1
        elif c == "?":
            yield ("qmark", i, i + 1)
            i += 1
        else:
            i += 1


def find_placeholders(sql: str) -> list[Placeholder]:
    """Find placeholders in order of appearance; canonical names are p1..pN
    for positional styles, and p<name-digits> / the given name for :name."""
    out: list[Placeholder] = []
    qmark_counter = 0
    for kind, start, end in _scan(sql):
        original = sql[start:end]
        if kind == "dollar":
            canonical = "p" + original[1:]
        elif kind == "named":
            name = original[1:]
            canonical = name if not name.isdigit() else "p" + name
        else:  # qmark
            qmark_counter += 1
            canonical = f"p{qmark_counter}"
        out.append(Placeholder(original, canonical, start, end))
    return out


def canonicalize(sql: str) -> tuple[str, list[Placeholder]]:
    """Rewrite every placeholder to its canonical ``:pN`` spelling.

    Returns the rewritten SQL and the placeholder list with offsets
    re-pointed into the REWRITTEN text (so ``bind_text`` can substitute
    directly), while ``original`` keeps the user's spelling for error
    messages."""
    phs = find_placeholders(sql)
    if not phs:
        return sql, []
    parts = []
    out_phs: list[Placeholder] = []
    last = 0
    out_len = 0
    for ph in phs:
        parts.append(sql[last : ph.start])
        out_len += ph.start - last
        token = ":" + ph.canonical
        out_phs.append(Placeholder(ph.original, ph.canonical, out_len, out_len + len(token)))
        parts.append(token)
        out_len += len(token)
        last = ph.end
    parts.append(sql[last:])
    return "".join(parts), out_phs


def normalize_params(params: dict | list | tuple | None, phs: list[Placeholder]) -> dict:
    """Accept user params keyed as "$1" / "p1" / "1" / ":p1" (or a positional
    list) and return a dict keyed by canonical names.  Raises the reference's
    missing-placeholder error if any placeholder has no value."""
    canon_names = []
    seen = set()
    for ph in phs:
        if ph.canonical not in seen:
            seen.add(ph.canonical)
            canon_names.append(ph.canonical)

    values: dict[str, object] = {}
    if params is None:
        params = {}
    if isinstance(params, (list, tuple)):
        for i, v in enumerate(params, start=1):
            values[f"p{i}"] = v
    else:
        for k, v in params.items():
            key = str(k)
            if key.startswith("$") or key.startswith(":"):
                key = key[1:]
            if key.isdigit():
                key = "p" + key
            values[key] = v

    unknown = set(values) - set(canon_names)
    if unknown:
        raise ParameterError(
            f"Unknown parameter(s) {sorted(unknown)}; statement placeholders are "
            f"{sorted(canon_names)}"
        )
    bound = {}
    for ph in phs:
        if ph.canonical in bound:
            continue
        if ph.canonical not in values:
            raise missing_placeholder(ph.original)
        bound[ph.canonical] = values[ph.canonical]
    return bound


def to_sql_literal(value: object) -> str:
    """Render a Python scalar as a Spark SQL literal (for the plan-reuse
    filter-binding path).  Strings are escaped for both quote and backslash
    (Spark's default parser treats backslash as an escape)."""
    if value is None:
        return "NULL"
    if isinstance(value, bool):
        return "TRUE" if value else "FALSE"
    if isinstance(value, int):
        return str(value)
    if isinstance(value, float):
        return repr(value)
    if isinstance(value, _dt.datetime):
        return "TIMESTAMP '" + value.strftime("%Y-%m-%d %H:%M:%S.%f") + "'"
    if isinstance(value, _dt.date):
        return "DATE '" + value.isoformat() + "'"
    if isinstance(value, str):
        escaped = value.replace("\\", "\\\\").replace("'", "\\'")
        return "'" + escaped + "'"
    if isinstance(value, (list, tuple)):
        return "(" + ", ".join(to_sql_literal(v) for v in value) + ")"
    raise ParameterError(f"Unsupported parameter type: {type(value).__name__}")


def in_context_placeholders(sql: str) -> set[str]:
    """Canonical names of placeholders that stand as the right operand of an
    ``IN`` — i.e. positions where the bound value is a VALUE LIST, not a
    scalar.  Callers use this to (a) bind list-typed NULLs in prepare-time
    trial builds (``x IN NULL`` is a syntax error, ``x IN (NULL)`` is not)
    and (b) inline the list as a literal tuple on the general path, since
    Spark's parameterized parser has no list-valued marker (``IN :p`` does
    not parse)."""
    out = set()
    for ph in find_placeholders(sql):
        if re.search(r"\bIN\s*$", sql[: ph.start], re.IGNORECASE):
            out.add(ph.canonical)
    return out


def bind_text(sql: str, phs: list[Placeholder], bound: dict) -> str:
    """Substitute canonical placeholder occurrences with SQL literals."""
    parts = []
    last = 0
    for ph in phs:
        parts.append(sql[last : ph.start])
        parts.append(to_sql_literal(bound[ph.canonical]))
        last = ph.end
    parts.append(sql[last:])
    return "".join(parts)
