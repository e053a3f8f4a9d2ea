"""Clause splitter for the plan-reuse ("dynamic") execution path.

The reference's ``DynamicFilterRule`` only rewrites placeholders that occur
inside a ``Filter`` predicate (src/rule.rs:32-49), while ``prepare()``
accepts any plannable statement — joins included
(src/preparable_context.rs:15-30).  We mirror that scope: statements of the
shape

    SELECT [DISTINCT] <items>
    FROM <table> [[INNER|LEFT|RIGHT|FULL|CROSS|LEFT SEMI|LEFT ANTI] JOIN
                  <table> ON <cond>]...
    [WHERE <pred>] [GROUP BY <exprs>] [ORDER BY <items>] [LIMIT n]

compile to a reusable DataFrame *template*: the scan+joins composition is
resolved ONCE at prepare time (``_from_df``), projections/orderings are
pre-parsed, and the WHERE is pre-split into per-conjunct binders — eq/IN
conjuncts bind per execute as Column expressions (``F.col() == F.lit()``,
no SQL text parse), irregular parameterized conjuncts re-bind text, static
conjuncts parse once.  No SQL statement parse happens per execution — the
Spark analog of re-executing a cached physical plan with
``DynamicFilterPhysicalExpr::update`` (reference src/physical.rs:247-255).  Placeholders outside WHERE (e.g. in a join
condition) and statements outside this grammar return ``None`` and the
caller falls back to Spark parameterized SQL (the reference's own "logical
plan" baseline, benches/dynamic_filter_benchmark.rs:146-183).
"""

from __future__ import annotations

import os
import re
import shutil
import tempfile
from dataclasses import dataclass, field

from .params import (
    Placeholder,
    bind_text,
    find_placeholders,
    in_context_placeholders,
)

_CLAUSE_KEYWORDS = ["FROM", "WHERE", "GROUP BY", "HAVING", "ORDER BY", "LIMIT"]
_UNSUPPORTED = re.compile(
    r"\b(UNION|INTERSECT|EXCEPT|QUALIFY|WITH|LATERAL|PIVOT|UNPIVOT)\b",
    re.IGNORECASE,
)
_IDENT_RE = re.compile(r"^[A-Za-z_][\w.]*(\s+(AS\s+)?[A-Za-z_]\w*)?$", re.IGNORECASE)
_JOIN_KW = re.compile(
    r"\b(?:(INNER|LEFT\s+OUTER|LEFT\s+SEMI|LEFT\s+ANTI|LEFT|RIGHT\s+OUTER|RIGHT|"
    r"FULL\s+OUTER|FULL|CROSS)\s+)?JOIN\b",
    re.IGNORECASE,
)
_JOIN_HOW = {
    None: "inner",
    "INNER": "inner",
    "LEFT": "left",
    "LEFT OUTER": "left",
    "LEFT SEMI": "left_semi",
    "LEFT ANTI": "left_anti",
    "RIGHT": "right",
    "RIGHT OUTER": "right",
    "FULL": "full",
    "FULL OUTER": "full",
    "CROSS": "cross",
}


def _depth0_positions(sql: str, word: str) -> list[int]:
    """Offsets where ``word`` appears at paren depth 0, outside strings."""
    out = []
    pat = re.compile(r"\b" + word.replace(" ", r"\s+") + r"\b", re.IGNORECASE)
    depth = 0
    i, n = 0, len(sql)
    while i < n:
        c = sql[i]
        if c == "'":
            j = i + 1
            while j < n:
                if sql[j] == "'" and not (j + 1 < n and sql[j + 1] == "'"):
                    break
                j += 2 if sql[j] == "'" else 1
            i = j + 1
            continue
        if c == "(":
            depth += 1
        elif c == ")":
            depth -= 1
        elif depth == 0:
            m = pat.match(sql, i)
            if m:
                out.append(i)
                i = m.end()
                continue
        i += 1
    return out


def _split_depth0_commas(text: str) -> list[str]:
    items, depth, cur = [], 0, []
    i, n = 0, len(text)
    while i < n:
        c = text[i]
        if c == "'":
            j = i + 1
            while j < n:
                if text[j] == "'" and not (j + 1 < n and text[j + 1] == "'"):
                    break
                j += 1
            cur.append(text[i : j + 1])
            i = j + 1
            continue
        if c == "(":
            depth += 1
        elif c == ")":
            depth -= 1
        if c == "," and depth == 0:
            items.append("".join(cur).strip())
            cur = []
        else:
            cur.append(c)
        i += 1
    if cur:
        items.append("".join(cur).strip())
    return [it for it in items if it]


@dataclass
class OrderItem:
    expr: str
    descending: bool = False
    nulls_first: bool | None = None


@dataclass
class JoinPart:
    table: str
    alias: str | None
    how: str  # pyspark join type string
    cond: str | None  # ON condition text (None only for cross joins)


@dataclass
class SimpleSelect:
    """Parsed representation of a fast-path statement."""

    select_items: list[str]
    distinct: bool
    table: str
    alias: str | None
    where: str | None
    where_placeholders: list[Placeholder] = field(default_factory=list)
    group_by: list[str] = field(default_factory=list)
    order_by: list[OrderItem] = field(default_factory=list)
    limit: int | None = None
    joins: list[JoinPart] = field(default_factory=list)
    # HAVING: a Filter over the Aggregate — inside the reference's dynamic
    # scope (DynamicFilterRule matches any LogicalPlan::Filter,
    # src/rule.rs:32-49), so parameterized HAVING binds per execute too.
    having: str | None = None
    having_placeholders: list[Placeholder] = field(default_factory=list)
    # CTEs: (name, body) pairs.  Bodies are arbitrary SQL resolved ONCE at
    # prepare time (the reference prepares any non-DDL statement,
    # src/preparable_context.rs:15-30); only the final SELECT follows the
    # fast-path grammar, and placeholders must not appear in a body.
    ctes: list[tuple[str, str]] = field(default_factory=list)


def _parse_with_prefix(text: str) -> tuple[list[tuple[str, str]], str] | None:
    """Strip a leading ``WITH name AS (body) [, ...]`` prefix.  Returns
    (ctes, remaining_main_query) or None when the prefix is malformed or a
    body carries a placeholder (those statements fall back to the literal
    path, where Spark binds the full text)."""
    m = re.match(r"^WITH\s+", text, re.IGNORECASE)
    if not m:
        return [], text
    ctes: list[tuple[str, str]] = []
    i = m.end()
    n = len(text)
    while True:
        mm = re.match(r"\s*([A-Za-z_]\w*)\s+AS\s*\(", text[i:], re.IGNORECASE)
        if not mm:
            return None
        name = mm.group(1)
        j = i + mm.end()  # first char inside the body parens
        depth, k = 1, j
        while k < n and depth:
            c = text[k]
            if c == "'":
                k += 1
                while k < n:
                    if text[k] == "'" and not (k + 1 < n and text[k + 1] == "'"):
                        break
                    k += 2 if text[k] == "'" else 1
            elif c == "(":
                depth += 1
            elif c == ")":
                depth -= 1
            k += 1
        if depth:
            return None  # unbalanced parens
        body = text[j : k - 1].strip()
        if not body or find_placeholders(body):
            return None
        ctes.append((name, body))
        mm2 = re.match(r"\s*,", text[k:])
        if mm2:
            i = k + mm2.end()
            continue
        return ctes, text[k:].strip()


def parse_simple_select(sql: str) -> SimpleSelect | None:
    """Parse the fast-path grammar; return None if out of scope."""
    text = sql.strip().rstrip(";").strip()
    with_parse = _parse_with_prefix(text)
    if with_parse is None:
        return None
    ctes, text = with_parse
    if not re.match(r"^SELECT\b", text, re.IGNORECASE):
        return None
    if _UNSUPPORTED.search(text):
        return None

    # Clause boundaries at depth 0.
    bounds: list[tuple[str, int]] = []
    for kw in _CLAUSE_KEYWORDS:
        pos = _depth0_positions(text, kw)
        if len(pos) > 1:
            return None
        if pos:
            bounds.append((kw, pos[0]))
    bounds.sort(key=lambda t: t[1])
    order = [kw for kw, _ in bounds]
    if order != [kw for kw in _CLAUSE_KEYWORDS if kw in order]:
        return None  # clauses out of canonical order
    if "FROM" not in order:
        return None

    clause_text: dict[str, str] = {}
    spans = bounds + [("<END>", len(text))]
    # SELECT list runs from after SELECT to the first clause keyword.
    sel_start = len("SELECT")
    clause_text["SELECT"] = text[sel_start : spans[0][1]]
    for (kw, start), (_, end) in zip(bounds, spans[1:]):
        clause_text[kw] = text[start + len(kw) : end]

    select_body = clause_text["SELECT"].strip()
    distinct = False
    m = re.match(r"^DISTINCT\b", select_body, re.IGNORECASE)
    if m:
        distinct = True
        select_body = select_body[m.end() :].strip()
    select_items = _split_depth0_commas(select_body)
    if not select_items:
        return None
    # Placeholders allowed only in WHERE (reference scope, src/rule.rs:32-49).
    if find_placeholders(select_body):
        return None

    from_body = clause_text["FROM"].strip()
    table, alias, joins = _parse_from(from_body)
    if table is None:
        return None

    where_body = clause_text.get("WHERE")
    where_placeholders: list[Placeholder] = []
    if where_body is not None:
        where_body = where_body.strip()
        if re.search(r"\bSELECT\b", where_body, re.IGNORECASE):
            return None  # subquery — expression parser can't bind it
        where_placeholders = find_placeholders(where_body)

    group_by = []
    if "GROUP BY" in clause_text:
        group_by = _split_depth0_commas(clause_text["GROUP BY"])
        if find_placeholders(clause_text["GROUP BY"]):
            return None
        # Fast path requires SELECT list to lead with the grouping exprs so
        # groupBy().agg() reproduces the output shape.
        norm = [re.sub(r"\s+", " ", g).lower() for g in group_by]
        lead = [re.sub(r"\s+", " ", s).lower() for s in select_items[: len(group_by)]]
        if norm != lead:
            return None
        if len(select_items) <= len(group_by):
            # SELECT a FROM t GROUP BY a — no aggregate select items left;
            # groupBy().agg() with no exprs raises at execute time, so fall
            # back to the literal path.
            return None

    having_body = clause_text.get("HAVING")
    having_placeholders: list[Placeholder] = []
    if having_body is not None:
        having_body = having_body.strip()
        if not group_by:
            return None  # HAVING without GROUP BY -> literal path
        if re.search(r"\bSELECT\b", having_body, re.IGNORECASE):
            return None  # subquery in HAVING -> literal path
        having_placeholders = find_placeholders(having_body)

    order_items: list[OrderItem] = []
    if "ORDER BY" in clause_text:
        if find_placeholders(clause_text["ORDER BY"]):
            return None
        for raw in _split_depth0_commas(clause_text["ORDER BY"]):
            item = OrderItem(raw)
            m = re.search(r"\bNULLS\s+(FIRST|LAST)\s*$", item.expr, re.IGNORECASE)
            if m:
                item.nulls_first = m.group(1).upper() == "FIRST"
                item.expr = item.expr[: m.start()].strip()
            m = re.search(r"\b(ASC|DESC)\s*$", item.expr, re.IGNORECASE)
            if m:
                item.descending = m.group(1).upper() == "DESC"
                item.expr = item.expr[: m.start()].strip()
            order_items.append(item)

    limit = None
    if "LIMIT" in clause_text:
        lim_body = clause_text["LIMIT"].strip()
        if not lim_body.isdigit():
            return None  # parameterized/expr limit -> fall back
        limit = int(lim_body)

    return SimpleSelect(
        select_items=select_items,
        distinct=distinct,
        table=table,
        alias=alias,
        where=where_body,
        where_placeholders=where_placeholders,
        group_by=group_by,
        order_by=order_items,
        limit=limit,
        joins=joins,
        having=having_body,
        having_placeholders=having_placeholders,
        ctes=ctes,
    )


def _parse_table_ref(text: str) -> tuple[str | None, str | None]:
    text = text.strip()
    if not _IDENT_RE.match(text):
        return None, None
    parts = re.split(r"\s+", text)
    return parts[0], (parts[-1] if len(parts) > 1 else None)


def _parse_from(from_body: str) -> tuple[str | None, str | None, list[JoinPart]]:
    """FROM clause: base table plus zero or more JOIN ... [ON ...] parts.

    Placeholders in join conditions are out of the reference's dynamic-
    filter scope (only Filter predicates are rewritten, src/rule.rs:32-49),
    so they reject the fast path here."""
    matches = []
    depth = 0
    i = 0
    while i < len(from_body):
        c = from_body[i]
        if c == "(":
            depth += 1
        elif c == ")":
            depth -= 1
        elif depth == 0:
            m = _JOIN_KW.match(from_body, i)
            if m:
                matches.append(m)
                i = m.end()
                continue
        i += 1
    if not matches:
        table, alias = _parse_table_ref(from_body)
        return table, alias, []

    table, alias = _parse_table_ref(from_body[: matches[0].start()])
    if table is None:
        return None, None, []
    joins: list[JoinPart] = []
    for idx, m in enumerate(matches):
        seg_end = matches[idx + 1].start() if idx + 1 < len(matches) else len(from_body)
        seg = from_body[m.end() : seg_end].strip()
        how_word = m.group(1)
        how = _JOIN_HOW.get(re.sub(r"\s+", " ", how_word.upper()) if how_word else None)
        if how is None:
            return None, None, []
        on_m = re.search(r"\bON\b", seg, re.IGNORECASE)
        if on_m is None:
            if how != "cross":
                return None, None, []  # NATURAL / USING forms -> fall back
            ref, cond = seg, None
        else:
            ref, cond = seg[: on_m.start()], seg[on_m.end() :].strip()
            if not cond or find_placeholders(cond):
                return None, None, []
        t, a = _parse_table_ref(ref)
        if t is None:
            return None, None, []
        joins.append(JoinPart(table=t, alias=a, how=how, cond=cond))
    return table, alias, joins


# Expression-codegen policy bound (r14).  nojit templates (wholestage off)
# still paid a Janino compile PER KEY through the non-wholestage expression
# path: bound literals are inlined into the generated predicate/projection
# source, so every fresh key is a codegen-cache miss (~10-20 ms driver-side).
# For executions whose scan only TOUCHES a few rows — hot templates (batch-
# stats pruning over the pinned relation: ~rows/batchSize stats rows + ~one
# decoded batch) and layout templates (static bucket pruning: ~rows/buckets)
# — the compile never pays back, and forcing the interpreted expression path
# (factoryMode=NO_CODEGEN, plus constraintPropagation off to shave the
# per-key optimizer pass) measured at sf0.1: hot fresh-key 2.54 -> 1.89 s /
# 50 keys, hot repeat 1.41 -> 0.89, layout 3.61 -> 3.28, DPP micro-batches
# 1.27 -> 1.06, IN-list-1000 a wash — while the FLAT cold template (every
# key's filter interpreted over all 150k scanned rows) regressed +6-14%,
# which locates the crossover at ~1e5 interpreted rows per execution.  The
# policy is therefore gated on the per-execution touched-row ESTIMATE from
# parquet footer metadata / the materialized cache count — scale-adaptive,
# not a local[32] constant: a 100 TB layout bucket or a huge pinned set
# keeps compiled expressions.
_INTERP_MAX_SCAN_ROWS = 131072


_AGG_FN_RE = re.compile(
    r"\b(count|sum|avg|mean|min|max|stddev\w*|var\w*|corr|covar\w*|"
    r"approx_count_distinct|percentile\w*|median|collect_list|collect_set|"
    r"first|last|any_value|bool_and|bool_or|skewness|kurtosis)\s*\(",
    re.IGNORECASE,
)


class CompiledTemplate:
    """A prepared fast-path statement: scan resolved once, projection
    pre-parsed; per-execute work is one filter bind + plan composition.

    ``hot=True`` additionally pins a column-pruned copy of the scan in
    executor memory at first use — the Spark analog of the reference
    benchmarking its prepared statements against a resident ``MemTable``
    (benches/dynamic_filter_benchmark.rs:96-99) and of its "table provider
    that optimizes DynamicFilters" fast path (README.md:39-44).  Repeated
    executions then read in-memory columnar batches instead of re-reading
    parquet.  Intended for lookup working sets that fit cluster memory; the
    default (cold) path keeps parquet scan + static filter pushdown, which
    is the correct regime for a 100 TB table."""

    def __init__(self, spark, parsed: SimpleSelect, *, hot: bool = False,
                 nojit: bool = False, layouts: dict | None = None,
                 session=None):
        from pyspark.sql import SparkSession, functions as F

        # Each template plans on a CLONED SparkSession: same shared state
        # (catalog cache, temp views as of prepare time) but a private
        # SQLConf, so the statement's codegen policy is baked in ONCE here
        # instead of toggled around every planning call.  No session-global
        # conf is ever mutated for template-mode statements, which removes
        # both the per-key conf round-trips and the cross-thread leak
        # surface the r3/r4 reviews worried about.  ``session`` lets a
        # multi-branch owner (UnionTemplate) supply ONE shared clone so
        # branch DataFrames compose without crossing sessions.
        self.driver_spark = spark
        owns_session = session is None
        if session is not None:
            self.spark = session
        else:
            self.spark = SparkSession(
                spark.sparkContext, spark._jsparkSession.cloneSession()
            )
        self.nojit = nojit
        if nojit:
            self.spark.conf.set("spark.sql.codegen.wholeStage", "false")
        self.parsed = parsed
        self.hot = hot
        self._param_dirs: list[str] = []
        # CTE bodies resolve ONCE here, as temp views on the template's
        # PRIVATE cloned session (clone-local catalog: registrations never
        # leak to the user's session, and a CTE name shadows a real table
        # only inside this template — standard CTE scoping).  Bodies are
        # arbitrary SQL; analysis errors in them surface at prepare, like
        # the reference planning the full statement in prepare()
        # (src/preparable_context.rs:30).
        self._cte_names = {name.lower() for name, _ in parsed.ctes}
        for cte_name, cte_body in parsed.ctes:
            self.spark.sql(cte_body).createOrReplaceTempView(cte_name)
        # Aggregating/DISTINCT templates change meaning under a batched
        # semi-join (one global result vs one result per parameter row), so
        # execute_batch must not take the semi-join fast path for them.
        self.is_aggregating = bool(parsed.group_by) or any(
            _AGG_FN_RE.search(item) for item in parsed.select_items
        )
        # Point-lookup shape: every parameterized WHERE conjunct is a plain
        # equality / IN on a column.  Used by the JIT policy (see
        # PreparedStatement): per-key wholestage compilation never pays for
        # this shape.
        self.is_point_lookup = _is_point_lookup(parsed)
        # Adopt a registered point layout when the statement's BASE table
        # has one and a parameterized eq/IN conjunct targets the layout
        # key: the scan then reads the bucket-partitioned copy, and bound
        # keys prune it — statically (literal bind augments the bucket
        # predicate) or via DPP (params-as-data bind).  Since r5 this
        # includes JOIN templates (the point-filtered fact side scans the
        # layout; an ambiguous key column fails the prepare-time trial
        # build and falls back to the literal path).  Hot templates skip
        # the layout: a pinned in-memory scan already beats any disk
        # layout.  The bucket column is dropped right after the filter so
        # the template's visible schema matches the base table exactly.
        self.layout = None
        if (
            layouts
            and not hot
            and parsed.table in layouts
            and parsed.table.lower() not in self._cte_names
            and parsed.where
            and parsed.where_placeholders
        ):
            lay = layouts[parsed.table]
            for c in _split_conjuncts(parsed.where):
                m = _BIND_EQ_RE.match(c)
                if m and find_placeholders(c) and _base_col(m.group(1)) == lay.key.lower():
                    self.layout = lay
                    break

        session = self.spark

        def resolve(table: str, alias: str | None):
            if self.layout is not None and table == parsed.table:
                df = session.read.parquet(self.layout.path)
            else:
                df = session.table(table)
            if hot:
                needed = _referenced_columns(parsed, df.columns)
                # Pin with FINE cache batches: InMemoryTableScan prunes
                # whole batches by min/max stats against the bound literal,
                # so batch size is the pruning granularity for point
                # lookups.  1024 vs the 10000 default measured 2.7x faster
                # per key on a 150k-row hot scan.  The conf is read when
                # persist() registers the relation — private to this
                # template's cloned session, so no toggle-restore dance.
                session.conf.set(
                    "spark.sql.inMemoryColumnarStorage.batchSize", "1024"
                )
                df = df.select(*needed).persist()
            if alias:
                df = df.alias(alias)
            return df

        self.scan_df = resolve(parsed.table, parsed.alias)
        self._persisted = [self.scan_df] if hot else []
        # Default until the point-lookup analysis at the end of __init__
        # (must exist before the first _composed_scan call below).
        self._broadcast_side: int | None = None
        # Join scans + pre-parsed ON conditions, resolved once at prepare.
        self.join_parts = []
        for jp in parsed.joins:
            jdf = resolve(jp.table, jp.alias)
            if hot:
                self._persisted.append(jdf)
            self.join_parts.append(
                (jdf, jp.how, F.expr(jp.cond) if jp.cond else None)
            )
        self._F = F
        # Pre-parse static pieces once (prepare-time, not execute-time).
        self.select_cols = [F.expr(item) for item in parsed.select_items]
        self.group_cols = [F.expr(g) for g in parsed.group_by]
        self.agg_cols = [F.expr(item) for item in parsed.select_items[len(parsed.group_by) :]]
        self.order_cols = []
        for o in parsed.order_by:
            c = F.expr(o.expr)
            if o.nulls_first is None:
                c = c.desc() if o.descending else c.asc()
            elif o.nulls_first:
                c = c.desc_nulls_first() if o.descending else c.asc_nulls_first()
            else:
                c = c.desc_nulls_last() if o.descending else c.asc_nulls_last()
            self.order_cols.append(c)
        if parsed.where and not parsed.where_placeholders:
            self.static_where = F.expr(parsed.where)
        else:
            self.static_where = None
        # HAVING placement, decided once: aggregate-bearing predicates are
        # evaluated INSIDE the aggregation (an extra boolean agg column,
        # filtered and dropped immediately) so they see true aggregate
        # values even when the SELECT list doesn't expose them; group-only
        # predicates post-filter the aggregated output.  Parameterized
        # HAVING re-binds text per execute, like irregular WHERE conjuncts.
        self.having_in_agg = bool(parsed.having and _AGG_FN_RE.search(parsed.having))
        # Params-as-data shape, resolved ONCE at prepare: each parameterized
        # conjunct must be `col = :param`; non-parameterized conjuncts ride
        # along as static filters.  Params then enter execution as a
        # broadcast LocalRelation row, never as plan literals — so the
        # optimized plan differs across keys only in broadcast DATA and the
        # generated code is byte-identical (codegen cache hit per key).
        # This is the Spark analog of the reference updating one physical
        # plan's filter state in place (src/physical.rs:247-255).
        self._semi_err = "semi-join execution requires a parameterized WHERE"
        self.semi_eq_cols: list[tuple[str, str]] | None = None
        self.semi_static: list[str] = []
        self.semi_schema = None
        if parsed.where and parsed.where_placeholders:
            eq_cols: list[tuple[str, str]] | None = []
            static: list[str] = []
            for c in _split_conjuncts(parsed.where):
                if not find_placeholders(c):
                    static.append(c)
                    continue
                m = _SEMI_EQ_RE.match(c)
                if not m:
                    self._semi_err = (
                        f"semi-join execution requires equality conjuncts, got: {c}"
                    )
                    eq_cols = None
                    break
                name = m.group(2) or ("p" + m.group(3))
                eq_cols.append((m.group(1), name))
            if eq_cols:
                from pyspark.sql.types import StructField, StructType

                key_fields = self._composed_scan().select(
                    *[c for c, _ in eq_cols]
                ).schema.fields
                self.semi_eq_cols = eq_cols
                self.semi_static = static
                self.semi_schema = StructType(
                    [
                        StructField(name, f.dataType, True)
                        for f, (_, name) in zip(key_fields, eq_cols)
                    ]
                )
        # Grouped-batch eligibility (see build_grouped_batch): GROUP BY
        # templates whose parameterized conjuncts are all equalities can
        # serve a whole parameter batch as ONE semi-join + ONE aggregation
        # instead of an O(N)-plan union.  DISTINCT/LIMIT change per-row
        # semantics under merging, and a parameterized HAVING binds a
        # different predicate per row — those keep the union fallback.
        self.grouped_batch_ok = (
            self.semi_eq_cols is not None
            and bool(parsed.group_by)
            and not parsed.distinct
            and parsed.limit is None
            and not parsed.having_placeholders
        )
        # Point-lookup JOIN templates: the side carrying the parameterized
        # equality filters shrinks to ~the key's row count at execution, so
        # IT should be the broadcast build side — Spark's static planner
        # only sees table-level sizes and would otherwise broadcast the
        # (much larger) unfiltered dimension every execute (measured 21%
        # faster at sf0.1 with the hint).  Invalid hints (e.g. the
        # preserved side of an outer join) are ignored by Spark, so this
        # is advisory-safe.
        if self.semi_eq_cols and self.join_parts:
            sides = {self._side_of(c) for c, _ in self.semi_eq_cols}
            if len(sides) == 1 and None not in sides:
                self._broadcast_side = sides.pop()
        # Pre-compose the static FROM clause (scan + joins + broadcast hint)
        # ONCE — it is key-independent, so re-resolving the joins on every
        # execute was pure per-key overhead.
        self._from_df = self._composed_scan()
        # Pre-split the parameterized WHERE into per-conjunct binders:
        #   eq/in  — `col = :p` / `col IN :p`: bind as a Column against
        #            F.lit()/isin() per key, NO SQL text parse per execute
        #            (lit also sidesteps string-escaping concerns);
        #   text   — any other parameterized conjunct: re-bind text per key
        #            (general fallback, same semantics as before);
        #   static — parsed to a Column once here.
        self._where_binders = None
        if parsed.where and parsed.where_placeholders:
            binders = []
            for c in _split_conjuncts(parsed.where):
                phs = find_placeholders(c)
                if not phs:
                    binders.append(("static", F.expr(c), None))
                    continue
                m = _BIND_EQ_RE.match(c)
                if m:
                    col, op = m.group(1), m.group(2).upper()
                    name = m.group(3) or ("p" + m.group(4))
                    binders.append(("in" if op == "IN" else "eq", col, name))
                else:
                    binders.append(("text", c, phs))
            self._where_binders = binders
        # Trial build with NULL-bound placeholders — the template path's
        # analog of the reference's typed-NULL pre-binding pass
        # (src/physical.rs:94-140): DataFrame construction runs Catalyst
        # ANALYSIS (no execution), so any unresolvable pre-parsed piece —
        # e.g. a HAVING mixing an output alias with an aggregate, which the
        # in-agg placement cannot resolve — surfaces HERE at prepare time,
        # where mode='auto' statements fall back to the literal path,
        # instead of failing on the user's first execute.
        in_ph = in_context_placeholders(parsed.where or "") | (
            in_context_placeholders(parsed.having or "")
        )
        nulls = {
            # IN-positioned placeholders take a LIST-typed null: the text
            # binder then renders `(NULL)` (valid) instead of `IN NULL`
            # (syntax error), and the isin binder matches nothing — either
            # way the trial analyzes instead of spuriously demoting the
            # statement to the literal path.
            ph.canonical: ([None] if ph.canonical in in_ph else None)
            for ph in parsed.where_placeholders + parsed.having_placeholders
        }
        self.build(nulls)
        self._hot_rows: int | None = None
        if hot:
            # "hot" promises a pinned scan: build the cache at prepare time
            # so the first execute runs at memory speed, not cache-fill
            # speed (prepare cost is the amortized cost by definition).
            counts = [pdf.count() for pdf in self._persisted]
            if counts:
                self._hot_rows = counts[0]
        # Expression-codegen policy (see _INTERP_MAX_SCAN_ROWS): decided
        # once at prepare, baked into the template's private cloned-session
        # conf like the wholestage policy.  A shared session (UnionTemplate
        # branches) defers to its owner, which requires every branch to
        # qualify.
        self.interp_exprs = False
        if nojit and owns_session:
            est = self._interp_scan_rows()
            if est is not None and est <= _INTERP_MAX_SCAN_ROWS:
                self.interp_exprs = True
                self.spark.conf.set(
                    "spark.sql.codegen.factoryMode", "NO_CODEGEN"
                )
                self.spark.conf.set(
                    "spark.sql.constraintPropagation.enabled", "false"
                )

    def _interp_scan_rows(self) -> int | None:
        """Estimated rows a single-key execution TOUCHES in the base scan —
        the input of the expression-codegen gate (_INTERP_MAX_SCAN_ROWS).
        Hot: the pinned relation's batch-stat rows (one stats row per
        1024-row cache batch) plus ~one decoded batch; layout: one pruned
        bucket (rows/buckets, exact footer counts).  None (= keep compiled
        expressions) for flat cold scans, whose filter runs over every
        scanned row."""
        if self.hot and self._hot_rows is not None:
            return self._hot_rows // 1024 + 1024
        if self.layout is not None:
            from .layouts import parquet_row_count

            return parquet_row_count(self.layout.path) // max(
                1, self.layout.buckets
            )
        return None

    def _side_of(self, col: str) -> int | None:
        """Which FROM-clause side a column belongs to: -1 = base scan,
        j = join_parts[j]; None if ambiguous/unresolvable."""
        name = col.split(".")[-1].lower()
        alias = col.split(".")[0].lower() if "." in col else None
        sides = [(-1, self.parsed.alias, self.scan_df)] + [
            (j, jp.alias, self.join_parts[j][0])
            for j, jp in enumerate(self.parsed.joins)
        ]
        hits = []
        for idx, al, df in sides:
            if alias is not None:
                if al and al.lower() == alias:
                    hits.append(idx)
            elif name in [c.lower() for c in df.columns]:
                hits.append(idx)
        return hits[0] if len(hits) == 1 else None

    def _composed_scan(self):
        """Base scan with all pre-resolved joins applied (FROM clause).
        The point-filtered side, if unambiguous, carries a broadcast hint
        (see _broadcast_side in __init__)."""
        F = self._F
        df = self.scan_df
        if self._broadcast_side == -1:
            df = F.broadcast(df)
        for j, (jdf, how, cond) in enumerate(self.join_parts):
            if self._broadcast_side == j:
                jdf = F.broadcast(jdf)
            df = df.join(jdf, on=cond, how=how) if cond is not None else df.crossJoin(jdf)
        return df

    def _bound_filter(self, bound: dict):
        """AND of the pre-split WHERE conjuncts with params bound — Column
        construction only for the eq/in shapes, text re-bind for the rest.
        In layout mode, eq/IN binders on the layout key additionally carry
        the derived bucket predicate, which Catalyst satisfies by STATIC
        partition pruning of the bucket-partitioned copy (the scan reads
        1 of ``buckets`` directories per key)."""
        F = self._F
        lay = self.layout
        out = None
        for kind, a, b in self._where_binders:
            if kind == "static":
                piece = a
            elif kind == "eq":
                piece = F.col(a) == F.lit(bound[b])
                if lay is not None and _base_col(a) == lay.key.lower():
                    kb = lay.bucket_of(bound[b])
                    if kb is not None:
                        piece = piece & (F.col(lay.bucket_col) == F.lit(kb))
            elif kind == "in":
                v = bound[b]
                vals = list(v) if isinstance(v, (list, tuple)) else [v]
                piece = F.col(a).isin(vals)
                if lay is not None and _base_col(a) == lay.key.lower():
                    kbs = [lay.bucket_of(x) for x in vals]
                    if kbs and all(k is not None for k in kbs):
                        piece = piece & F.col(lay.bucket_col).isin(
                            sorted(set(kbs))
                        )
            else:  # text
                piece = F.expr(bind_text(a, b, bound))
            out = piece if out is None else (out & piece)
        return out

    def build(self, bound: dict):
        """Compose the DataFrame for one execution with params bound."""
        p = self.parsed
        df = self._from_df
        if p.where:
            if p.where_placeholders:
                df = df.filter(self._bound_filter(bound))
            else:
                df = df.filter(self.static_where)
        if self.layout is not None:
            df = df.drop(self.layout.bucket_col)
        df = self._apply_agg(df, bound)
        if p.distinct:
            df = df.distinct()
        if self.order_cols:
            df = df.orderBy(*self.order_cols)
        if p.limit is not None:
            df = df.limit(p.limit)
        return df

    def _apply_agg(self, df, bound: dict | None):
        """GROUP BY + HAVING (or plain projection) with HAVING params bound.
        See ``having_in_agg`` in __init__ for the placement rule."""
        p = self.parsed
        F = self._F
        having = p.having
        if having and p.having_placeholders:
            if bound is None:
                raise ValueError(
                    "parameterized HAVING requires exactly one parameter row"
                )
            having = bind_text(having, p.having_placeholders, bound)
        if not p.group_by:
            return df.select(*self.select_cols)
        if having and self.having_in_agg:
            return (
                df.groupBy(*self.group_cols)
                .agg(*self.agg_cols, F.expr(f"({having})").alias("__having__"))
                .filter(F.col("__having__"))
                .drop("__having__")
            )
        df = df.groupBy(*self.group_cols).agg(*self.agg_cols)
        if having:
            df = df.filter(F.expr(having))
        return df

    def build_semi_join(self, key_rows: list[dict]):
        """Bind parameter rows as *data* and broadcast-semi-join the scan
        against them.  Two callers: ``execute_batch`` (N keys in one job —
        the reference README.md:46-51 IN-list regime) and single-key
        ``execute`` on an eq-shaped template (1-row params relation; the
        plan differs across keys only in broadcast data, so generated code
        and the JIT'd classes are reused verbatim).  The params relation is
        a LocalRelation with the scan columns' exact types (pre-resolved
        ``semi_schema``), so no per-key schema inference or cast appears in
        the plan."""
        from pyspark.sql import functions as F

        p = self.parsed
        if self.semi_eq_cols is None:
            raise ValueError(self._semi_err)
        # NOTE on a rejected alternative: binding moderate batches as a
        # literal IN-list (Column.isin) measures WORSE than this join —
        # marshaling 1000 Python literals into the expression costs
        # 1.1-1.5s driver-side alone, vs ~50ms for createDataFrame+join of
        # the same keys.  Params-as-data wins at every batch size here.
        params_df, bucket_cond = self._params_relation(key_rows)
        cond = None
        for col, name in self.semi_eq_cols:
            piece = F.col(col) == params_df[name]
            cond = piece if cond is None else (cond & piece)
        if bucket_cond is not None:
            cond = cond & bucket_cond
        df = self._from_df
        for c in self.semi_static:
            df = df.filter(c)
        df = df.join(F.broadcast(params_df), cond, "left_semi")
        if self.layout is not None:
            df = df.drop(self.layout.bucket_col)
        df = self._apply_agg(df, key_rows[0] if len(key_rows) == 1 else None)
        if p.distinct:
            df = df.distinct()
        if self.order_cols:
            df = df.orderBy(*self.order_cols)
        if p.limit is not None:
            df = df.limit(p.limit)
        return df

    def build_grouped_batch(self, key_rows: list[dict]):
        """One-job batched execution for GROUP BY templates: the union of
        per-parameter-row grouped results, computed WITHOUT a per-row plan
        union.

        Why it is exact: distinct parameter tuples cannot match the same
        fact row (each conjunct is ``col = value``, and two distinct tuples
        differ in at least one bound value), so the per-row result sets
        partition the semi-joined rows — grouping the ONE semi-joined
        relation by (group columns + the fact-side equality columns)
        reproduces every (parameter row, group) cell exactly, and dropping
        the equality columns afterwards restores the template's declared
        schema.  Zero-match parameter rows contribute zero groups on both
        paths (grouped aggregation over empty input is empty — unlike
        global aggregation, which is why global-agg templates keep the
        union fallback).

        Scale shape: the fallback union is O(N) plan nodes and N aggregate
        jobs; this is one broadcast semi-join + one partial+final
        aggregation whose plan size is independent of N — the grouped twin
        of the 1000-key IN-list regime (reference README.md:46-51)."""
        from pyspark.sql import functions as F

        p = self.parsed
        if not self.grouped_batch_ok:
            raise ValueError(
                "grouped batch requires a GROUP BY template with equality "
                "conjuncts and no DISTINCT/LIMIT/parameterized HAVING"
            )
        params_df, bucket_cond = self._params_relation(key_rows)
        cond = None
        for col, name in self.semi_eq_cols:
            piece = F.col(col) == params_df[name]
            cond = piece if cond is None else (cond & piece)
        if bucket_cond is not None:
            cond = cond & bucket_cond
        df = self._from_df
        for c in self.semi_static:
            df = df.filter(c)
        df = df.join(F.broadcast(params_df), cond, "left_semi")
        if self.layout is not None:
            df = df.drop(self.layout.bucket_col)
        group_bases = {_base_col(g) for g in p.group_by}
        extra = [
            col for col, _ in self.semi_eq_cols
            if _base_col(col) not in group_bases
        ]
        extra_cols = [F.col(c) for c in extra]
        having = p.having
        if having and self.having_in_agg:
            agg = (
                df.groupBy(*self.group_cols, *extra_cols)
                .agg(*self.agg_cols, F.expr(f"({having})").alias("__having__"))
                .filter(F.col("__having__"))
                .drop("__having__")
            )
        else:
            agg = df.groupBy(*self.group_cols, *extra_cols).agg(*self.agg_cols)
            if having:
                agg = agg.filter(F.expr(having))
        if extra:
            agg = agg.drop(*[_base_col(c) for c in extra])
        if self.order_cols:
            agg = agg.orderBy(*self.order_cols)
        return agg

    def _params_relation(self, key_rows: list[dict]):
        """(params_df, bucket_join_cond|None) for params-as-data binding.
        Layout templates bind through a parquet params relation so the scan
        gets a runtime partition filter; everything else (and any value the
        parquet path can't represent) binds as a LocalRelation."""
        if self.layout is not None:
            rel = self._arrow_params(key_rows)
            if rel is not None:
                return rel
        params_df = self.spark.createDataFrame(
            [tuple(row[name] for _, name in self.semi_eq_cols) for row in key_rows],
            self.semi_schema,
        )
        return params_df, None

    def _arrow_params(self, key_rows: list[dict]):
        """Params-as-data as a PARQUET relation, written driver-side with
        pyarrow (~1 ms for any realistic batch; a Spark write job costs
        seconds of committer overhead for the same 10 rows).  Catalyst's
        PartitionPruning rule only fires when the filtering side is a file
        scan carrying a likely-selective predicate — a LocalRelation of
        literals never qualifies — so batches bound this way get
        ``dynamicpruningexpression(pk_bucket IN <subquery>)`` in the scan's
        PartitionFilters while the plan stays byte-identical across
        batches: the Spark analog of the reference updating one physical
        plan's filter state in place (src/physical.rs:247-255).  Returns
        None when a value can't be bucketed or arrow-typed; the caller
        falls back to LocalRelation binding (correct, unpruned)."""
        import pyarrow as pa
        import pyarrow.parquet as pq

        F = self._F
        lay = self.layout
        key_name = None
        for col, name in self.semi_eq_cols:
            if _base_col(col) == lay.key.lower():
                key_name = name
        if key_name is None or not key_rows:
            return None
        buckets = [lay.bucket_of(row[key_name]) for row in key_rows]
        if any(b is None for b in buckets):
            return None
        arrays = {}
        for (col, name), sf in zip(self.semi_eq_cols, self.semi_schema.fields):
            at = _ARROW_TYPES.get(type(sf.dataType))
            if at is None:
                return None
            arrays[name] = pa.array([row[name] for row in key_rows], at)
        # int32 matches the partition directory values' inferred type — a
        # cast on the partitioned column would defeat DPP's detection.
        arrays["__kb"] = pa.array(buckets, pa.int32())
        d = tempfile.mkdtemp(prefix="ddf_params_")
        self._param_dirs.append(d)
        pq.write_table(pa.table(arrays), os.path.join(d, "part-0.parquet"))
        key_vals = [row[key_name] for row in key_rows]
        params_df = self.spark.read.parquet(d).filter(
            F.col(key_name) >= F.lit(min(key_vals))
        )
        return params_df, (F.col(lay.bucket_col) == params_df["__kb"])

    def cleanup(self) -> None:
        """Remove per-execution params relations written by _arrow_params."""
        for d in self._param_dirs:
            shutil.rmtree(d, ignore_errors=True)
        self._param_dirs.clear()


def split_union(sql: str) -> tuple[list[str], list[str]] | None:
    """Split a top-level set-operation chain into (branch texts, operator
    list).  Operators: ``"all"``/``"distinct"`` (UNION), ``"intersect"``/
    ``"intersect_all"``, ``"except"``/``"except_all"``.  Returns None when
    there is no top-level set operator, the statement has a CTE prefix
    (CTE views would register on one branch's session only), or the chain
    MIXES different operator kinds — SQL gives INTERSECT higher precedence
    than UNION/EXCEPT, which a flat left-assoc fold would misparse, so
    mixed chains stay on the literal path where Spark parses them."""
    text = sql.strip().rstrip(";").strip()
    if re.match(r"^WITH\b", text, re.IGNORECASE):
        return None
    marks: list[tuple[int, str]] = []
    for kw in ("UNION", "INTERSECT", "EXCEPT"):
        marks.extend((p, kw) for p in _depth0_positions(text, kw))
    if not marks:
        return None
    marks.sort()
    kinds = {kw for _, kw in marks}
    if len(kinds) > 1:
        return None
    branches: list[str] = []
    ops: list[str] = []
    start = 0
    for p, kw in marks:
        branches.append(text[start:p].strip())
        m = re.match(kw + r"(\s+ALL)?\b", text[p:], re.IGNORECASE)
        has_all = bool(m.group(1))
        if kw == "UNION":
            ops.append("all" if has_all else "distinct")
        else:
            ops.append(kw.lower() + ("_all" if has_all else ""))
        start = p + m.end()
    branches.append(text[start:].strip())
    if any(not b for b in branches):
        return None
    return branches, ops


class UnionTemplate:
    """Top-level set-operation chain (UNION [ALL] / INTERSECT [ALL] /
    EXCEPT [ALL]) of fast-path SELECT branches, compiled once.  Mixed
    operator kinds never reach here (split_union rejects them — SQL's
    INTERSECT precedence would make a flat fold misparse).

    In scope of the reference's mechanism: ``DynamicFilterRule`` runs
    top-down over the WHOLE plan and rewrites every placeholder-bearing
    Filter it finds (src/rule.rs:57-59, 32-49) — a union of parameterized
    SELECTs therefore gets every branch's filter dynamically bound, and
    ``prepare()`` admits the statement like any other non-DDL plan
    (src/preparable_context.rs:15-30).  Mirrored here by compiling one
    CompiledTemplate per branch on a SHARED cloned session (branch
    DataFrames must compose within one session) and folding
    union/distinct left-associatively per execute — SQL's associativity
    for same-precedence set operators.

    A union-level ORDER BY/LIMIT (written after the last branch) is
    lifted off that branch's parse and applied to the folded result,
    matching SQL scoping; ORDER BY/LIMIT on a NON-last branch is invalid
    SQL (needs parens) and raises here, so mode='auto' statements fall
    back to the literal path, which surfaces Spark's own parse error."""

    def __init__(self, spark, parsed_branches: list[SimpleSelect],
                 ops: list[str], *, hot: bool = False, nojit: bool = False,
                 layouts: dict | None = None):
        from pyspark.sql import SparkSession, functions as F

        self.driver_spark = spark
        self.spark = SparkSession(
            spark.sparkContext, spark._jsparkSession.cloneSession()
        )
        self.nojit = nojit
        if nojit:
            self.spark.conf.set("spark.sql.codegen.wholeStage", "false")
        self._F = F
        for p in parsed_branches[:-1]:
            if p.order_by or p.limit is not None:
                raise ValueError(
                    "ORDER BY/LIMIT on a non-final UNION branch requires "
                    "parentheses"
                )
        last = parsed_branches[-1]
        self.order_by = last.order_by
        self.limit = last.limit
        last.order_by, last.limit = [], None
        self.ops = ops
        self.branches = [
            CompiledTemplate(
                spark, p, hot=hot, nojit=nojit, layouts=layouts,
                session=self.spark,
            )
            for p in parsed_branches
        ]
        self.is_aggregating = any(b.is_aggregating for b in self.branches)
        # Expression-codegen policy for the SHARED branch session (see
        # _INTERP_MAX_SCAN_ROWS): every branch must qualify, because the
        # conf covers all of them.
        self.interp_exprs = False
        if nojit:
            ests = [b._interp_scan_rows() for b in self.branches]
            if all(e is not None and e <= _INTERP_MAX_SCAN_ROWS for e in ests):
                self.interp_exprs = True
                self.spark.conf.set(
                    "spark.sql.codegen.factoryMode", "NO_CODEGEN"
                )
                self.spark.conf.set(
                    "spark.sql.constraintPropagation.enabled", "false"
                )
        self.grouped_batch_ok = False
        # bind='data' single-key execution routes through build() (below);
        # batched execution folds per-branch semi-joins when every branch
        # supports them.
        self.semi_eq_cols = None
        self._persisted = [df for b in self.branches for df in b._persisted]
        self.order_cols = []
        for o in self.order_by:
            c = F.expr(o.expr)
            if o.nulls_first is None:
                c = c.desc() if o.descending else c.asc()
            elif o.nulls_first:
                c = c.desc_nulls_first() if o.descending else c.asc_nulls_first()
            else:
                c = c.desc_nulls_last() if o.descending else c.asc_nulls_last()
            self.order_cols.append(c)
        # Typed-NULL trial of the FOLDED plan (branch trials already ran in
        # each CompiledTemplate): surfaces union arity/type mismatches at
        # prepare time, like the reference planning the whole statement in
        # prepare() (src/preparable_context.rs:30).
        nulls: dict[str, object] = {}
        for p in parsed_branches:
            in_ph = in_context_placeholders(p.where or "") | (
                in_context_placeholders(p.having or "")
            )
            for ph in p.where_placeholders + p.having_placeholders:
                nulls[ph.canonical] = [None] if ph.canonical in in_ph else None
        self.build(nulls)

    def _fold(self, dfs):
        out = dfs[0]
        for op, df in zip(self.ops, dfs[1:]):
            if op == "all":
                out = out.unionAll(df)
            elif op == "distinct":
                out = out.unionAll(df).distinct()
            elif op == "intersect":
                out = out.intersect(df)
            elif op == "intersect_all":
                out = out.intersectAll(df)
            elif op == "except":
                out = out.subtract(df)  # EXCEPT DISTINCT semantics
            else:  # except_all
                out = out.exceptAll(df)
        if self.order_cols:
            out = out.orderBy(*self.order_cols)
        if self.limit is not None:
            out = out.limit(self.limit)
        return out

    def build(self, bound: dict):
        return self._fold([b.build(bound) for b in self.branches])

    def build_semi_join(self, key_rows: list[dict]):
        # Batch semantics are the union of per-row results.  Only UNION ALL
        # folds compose (per-branch semi-joins are unions over disjoint
        # per-row matches); a DISTINCT/INTERSECT/EXCEPT fold would mix
        # rows ACROSS parameter rows, and a union-level LIMIT would
        # truncate the batch, not each row — those shapes keep the
        # per-row fallback.
        if len(key_rows) > 1 and (
            any(op != "all" for op in self.ops) or self.limit is not None
        ):
            raise ValueError(
                "batched execution of DISTINCT/INTERSECT/EXCEPT or "
                "union-level LIMIT templates keeps per-row semantics"
            )
        return self._fold([b.build_semi_join(key_rows) for b in self.branches])

    def cleanup(self) -> None:
        for b in self.branches:
            b.cleanup()


def _base_col(col: str) -> str:
    """Unqualified lower-cased column name (strips any alias prefix)."""
    return col.split(".")[-1].lower()


def _arrow_types() -> dict:
    import pyarrow as pa
    from pyspark.sql import types as T

    return {
        T.LongType: pa.int64(),
        T.IntegerType: pa.int32(),
        T.ShortType: pa.int16(),
        T.ByteType: pa.int8(),
        T.StringType: pa.string(),
        T.DoubleType: pa.float64(),
        T.FloatType: pa.float32(),
        T.BooleanType: pa.bool_(),
    }


_ARROW_TYPES = _arrow_types()


_EQ_CONJUNCT_RE = re.compile(
    r"^\s*[A-Za-z_][\w.]*\s*(=|IN)\s*(?::[A-Za-z_]\w*|\$\d+)\s*$", re.IGNORECASE
)
# Capturing variant for the per-key Column binder: col, op, :name / $N.
_BIND_EQ_RE = re.compile(
    r"^\s*([A-Za-z_][\w.]*)\s*(=|IN)\s*(?::([A-Za-z_]\w*)|\$(\d+))\s*$", re.IGNORECASE
)
# Strict `col = :param` conjunct (the params-as-data join shape; IN-list
# params go through execute_batch's explicit key-row expansion instead).
_SEMI_EQ_RE = re.compile(r"^\s*([A-Za-z_][\w.]*)\s*=\s*(?::([A-Za-z_]\w*)|\$(\d+))\s*$")


def _is_point_lookup(parsed: SimpleSelect) -> bool:
    if not parsed.where or not parsed.where_placeholders:
        return False
    return all(
        _EQ_CONJUNCT_RE.match(c) or not find_placeholders(c)
        for c in _split_conjuncts(parsed.where)
    )


def _referenced_columns(parsed: SimpleSelect, all_columns: list[str]) -> list[str]:
    """Columns of the table mentioned anywhere in the statement — the
    projection to pin in memory for a hot template (cache only the width the
    statement can touch)."""
    pieces = list(parsed.select_items) + list(parsed.group_by)
    pieces += [o.expr for o in parsed.order_by]
    pieces += [jp.cond for jp in parsed.joins if jp.cond]
    if parsed.where:
        pieces.append(parsed.where)
    words = set(re.findall(r"[A-Za-z_]\w*", " ".join(pieces).lower()))
    needed = [c for c in all_columns if c.lower() in words]
    return needed or list(all_columns)


def _split_conjuncts(where: str) -> list[str]:
    """Split a WHERE into top-level AND conjuncts (quote- and paren-aware).

    A top-level OR makes AND-splitting change precedence — SQL parses
    ``a OR b AND c`` as ``a OR (b AND c)``, while re-ANDing split pieces
    would yield ``(a OR b) AND c`` — so the whole text is returned as one
    piece in that case (callers then bind/parse it atomically)."""
    if _depth0_positions(where, "OR"):
        stripped = where.strip()
        return [stripped] if stripped else []
    parts, depth, cur = [], 0, []
    i, n = 0, len(where)
    while i < n:
        c = where[i]
        if c == "'":
            j = i + 1
            while j < n:
                if where[j] == "'" and not (j + 1 < n and where[j + 1] == "'"):
                    break
                j += 2 if where[j] == "'" else 1
            cur.append(where[i : min(j + 1, n)])
            i = j + 1
            continue
        if c == "(":
            depth += 1
        elif c == ")":
            depth -= 1
        if depth == 0:
            m = re.match(r"AND\b", where[i:], re.IGNORECASE)
            if m and (i == 0 or not (where[i - 1].isalnum() or where[i - 1] == "_")):
                parts.append("".join(cur).strip())
                cur = []
                i += m.end()
                continue
        cur.append(c)
        i += 1
    if cur:
        parts.append("".join(cur).strip())
    return [p for p in parts if p]
