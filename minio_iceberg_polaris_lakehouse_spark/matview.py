"""Materialized views with incremental (changelog-driven) refresh.

The reference stack's catalog (Polaris) and table format (Iceberg) are
exactly the substrate real lakehouses build materialized views on: a
stored query + a storage table + the CDC changelog to keep them in sync
(`CALL system.create_changelog_view`, warehouse.Table.changes). This
module adds that layer natively:

- ``CREATE MATERIALIZED VIEW ns.mv AS SELECT ...`` materializes the
  query into a real warehouse table and records the definition in the
  catalog (``_matviews.json``).
- ``REFRESH MATERIALIZED VIEW ns.mv`` brings it up to date. When the
  definition is a single-table grouped aggregate of SUM/COUNT (parsed by
  :func:`parse_incremental`), refresh reads ONLY the base table's
  changelog since the last synced snapshot — O(changed data), never a
  rescan of the base — and folds signed deltas into the stored groups.
  MIN/MAX also maintain incrementally while the changelog window is
  insert-only (the append-only common case); a delete in the window
  forces their full recompute (a deleted extremum needs a rescan).
  Anything else (joins, AVG, HAVING, expressions in GROUP BY) falls
  back to a full recompute, honestly reported in the refresh result.
- The storage table carries a hidden ``_lh_count`` row count per group
  so groups whose last row is deleted disappear, even when the user's
  select list has no COUNT(*). SELECT/DESCRIBE through the SQL front-end
  never surface it.

Scale: the incremental path shuffles the changelog (churned dirs only)
plus the MV itself — an aggregate, orders of magnitude smaller than the
base fact table. MIN/MAX fold monotonically under
inserts but are not invertible under deletes, so the refresh gate
checks the window for deletes first and takes the full-recompute path
rather than a wrong answer.

Float caveat (documented, inherent to IVM everywhere): SUM over float
columns accumulates in a different order under incremental maintenance
than under recompute, so bit-exact equality holds for
integer/decimal aggregates; float MVs are approximately equal.
"""

from __future__ import annotations

import re
from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_IDENT = r"[A-Za-z_][A-Za-z0-9_]*"


@dataclass
class MatviewSpec:
    """A parsed incremental-maintainable definition:
    ``SELECT <group cols + SUM/COUNT aggs> FROM one_table [WHERE pred]
    GROUP BY <group cols>``."""

    table_text: str  # the raw [catalog.]ns.table reference
    where: str | None
    group_cols: list[str]  # base-table column names
    group_aliases: list[str]  # output names (select-list order)
    aggs: list[tuple[str, str, str]]  # (kind, expr, alias); kind in
    # {"sum", "count_star", "count"}


HIDDEN_COUNT = "_lh_count"

# any of these anywhere in the text disqualifies incremental
# maintenance (conservative: masked-literal scan, so a literal
# containing "JOIN" also falls back — to the SLOWER-but-correct path)
_DISQUALIFY = re.compile(
    r"(?i)\b(JOIN|UNION|INTERSECT|EXCEPT|HAVING|ORDER\s+BY|LIMIT|"
    r"DISTINCT|OVER|AVG|WITH)\b"
)


def _split_top_level(text: str) -> list[str]:
    parts, depth, cur = [], 0, []
    for ch in text:
        if ch == "(":
            depth += 1
        elif ch == ")":
            depth -= 1
        if ch == "," and depth == 0:
            parts.append("".join(cur).strip())
            cur = []
        else:
            cur.append(ch)
    tail = "".join(cur).strip()
    if tail:
        parts.append(tail)
    return parts


def parse_incremental(sql_text: str) -> MatviewSpec | None:
    """Parse a definition into an incrementally-maintainable spec, or
    None if it needs full recompute. Deliberately conservative: only the
    exact single-table SUM/COUNT/MIN/MAX grouped-aggregate shape
    qualifies (MIN/MAX additionally need insert-only refresh windows,
    gated at refresh time)."""
    s = sql_text.strip().rstrip(";")
    masked = re.sub(r"'(?:[^']|'')*'", "''", s)
    if _DISQUALIFY.search(masked):
        return None
    m = re.fullmatch(
        rf"SELECT\s+(?P<items>.*?)\s+FROM\s+"
        rf"(?P<tbl>(?:{_IDENT}\.){{1,2}}{_IDENT})"
        rf"(?:\s+WHERE\s+(?P<where>.*?))?"
        rf"\s+GROUP\s+BY\s+(?P<keys>[^()]*)",
        s,
        re.IGNORECASE | re.DOTALL,
    )
    if m is None:
        return None
    keys = [k.strip() for k in m.group("keys").split(",")]
    if not all(re.fullmatch(_IDENT, k) for k in keys):
        return None  # expression GROUP BY: full recompute
    group_cols: list[str] = []
    group_aliases: list[str] = []
    aggs: list[tuple[str, str, str]] = []
    for item in _split_top_level(m.group("items")):
        gm = re.fullmatch(rf"({_IDENT})(?:\s+AS\s+({_IDENT}))?", item, re.IGNORECASE)
        if gm and gm.group(1).upper() not in ("SUM", "COUNT", "MIN", "MAX"):
            group_cols.append(gm.group(1))
            group_aliases.append(gm.group(2) or gm.group(1))
            continue
        am = re.fullmatch(
            rf"(SUM|COUNT|MIN|MAX)\s*\((.+)\)\s+AS\s+({_IDENT})",
            item,
            re.IGNORECASE | re.DOTALL,
        )
        if am is None:
            return None  # unaliased or unsupported aggregate
        kind, inner, alias = am.group(1).lower(), am.group(2).strip(), am.group(3)
        if inner == "*":
            if kind != "count":
                return None
            aggs.append(("count_star", "*", alias))
        else:
            aggs.append((kind, inner, alias))
    # GROUP BY keys and select-list group columns must coincide
    if sorted(keys) != sorted(group_cols) or not aggs:
        return None
    if len(set(group_cols)) != len(group_cols):
        return None
    return MatviewSpec(
        table_text=m.group("tbl"),
        where=m.group("where"),
        group_cols=group_cols,
        group_aliases=group_aliases,
        aggs=aggs,
    )


def _group_exprs(spec: MatviewSpec):
    return [F.col(c).alias(a) for c, a in zip(spec.group_cols, spec.group_aliases)]


def materialize(base_df: DataFrame, spec: MatviewSpec) -> DataFrame:
    """Full materialization of an incremental spec over a (snapshot-
    pinned) base read, with the hidden per-group row count appended."""
    df = base_df.filter(spec.where) if spec.where else base_df
    aggs = []
    for kind, expr, alias in spec.aggs:
        if kind == "sum":
            aggs.append(F.sum(F.expr(expr)).alias(alias))
        elif kind == "min":
            aggs.append(F.min(F.expr(expr)).alias(alias))
        elif kind == "max":
            aggs.append(F.max(F.expr(expr)).alias(alias))
        elif kind == "count_star":
            aggs.append(F.count(F.lit(1)).alias(alias))
        else:
            aggs.append(F.count(F.expr(expr)).alias(alias))
    aggs.append(F.count(F.lit(1)).alias(HIDDEN_COUNT))
    return df.groupBy(*_group_exprs(spec)).agg(*aggs)


def delta(changes: DataFrame, spec: MatviewSpec) -> DataFrame:
    """Signed per-group deltas from a changelog window: inserts add,
    deletes subtract. Type-parallel with :func:`materialize` (SUM keeps
    the input's Spark sum type; COUNT columns are BIGINT)."""
    df = changes.filter(spec.where) if spec.where else changes
    sign = F.when(F.col("_change_type") == "insert", F.lit(1)).otherwise(F.lit(-1))
    aggs = []
    for kind, expr, alias in spec.aggs:
        if kind == "sum":
            aggs.append(F.sum(sign * F.expr(expr)).alias(alias))
        elif kind == "min":
            # inserts only: a delete row must never contribute a value
            # (the refresh gate already forces full recompute when the
            # window contains deletes — MIN/MAX are not invertible)
            aggs.append(F.min(F.when(sign == 1, F.expr(expr))).alias(alias))
        elif kind == "max":
            aggs.append(F.max(F.when(sign == 1, F.expr(expr))).alias(alias))
        elif kind == "count_star":
            aggs.append(F.sum(sign).cast("long").alias(alias))
        else:
            aggs.append(
                F.sum(F.when(F.expr(expr).isNotNull(), sign).otherwise(0))
                .cast("long")
                .alias(alias)
            )
    aggs.append(F.sum(sign).cast("long").alias(HIDDEN_COUNT))
    return df.groupBy(*_group_exprs(spec)).agg(*aggs)


def apply_delta(stored: DataFrame, delta_df: DataFrame, spec: MatviewSpec) -> DataFrame:
    """Fold deltas into the stored groups: union + re-aggregate (NULL
    group keys group together, exactly like the original GROUP BY), drop
    groups whose row count reaches zero, and cast back to the storage
    schema so repeated refreshes never widen types."""
    keys = spec.group_aliases
    folds = []
    for kind, _expr, alias in spec.aggs:
        fold = F.min if kind == "min" else F.max if kind == "max" else F.sum
        folds.append(fold(alias).alias(alias))
    folds.append(F.sum(HIDDEN_COUNT).alias(HIDDEN_COUNT))
    unioned = stored.select(*stored.columns).unionByName(delta_df.select(*stored.columns))
    out = (
        unioned.groupBy(*keys)
        .agg(*folds)
        .filter(F.col(HIDDEN_COUNT) > 0)
    )
    return out.select(
        *[F.col(f.name).cast(f.dataType).alias(f.name) for f in stored.schema.fields]
    )
