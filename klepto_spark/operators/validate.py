"""Declarative data-quality validation — N expectations, ONE scan.

A 100 TB table cannot afford one scan per quality check. Every expectation
here compiles to a conditional aggregate over the same pass, so the whole
suite costs exactly one scan + one partial-aggregate shuffle regardless of
how many checks run (plan-asserted). Uniqueness — the one check a row-local
aggregate can't express — rides a single groupBy on the key, and
referential integrity a single anti-join per foreign key; both are opt-in
per call because they add their own (keyed, AQE-managed) exchanges.

Checks:
- ``not_null(col)`` — NULL count
- ``unique(cols)`` — duplicate-key row count (rows beyond the first of
  each key)
- ``in_range(col, lo, hi)`` — values outside [lo, hi] (NULLs don't count;
  pair with not_null)
- ``matches(col, regex)`` — non-matching values
- ``accepted(col, values)`` — values outside the accepted set
- ``expression(sql)`` — rows where an arbitrary boolean SQL predicate is
  FALSE (the escape hatch)
- ``references(cols, other, other_cols)`` — foreign keys with no parent
  (orphan count)

``validate`` returns one row per check: (check, target, violations, pass).
All counting is exact; a pipeline gate is ``all(pass)``.

Reference scope note: hellofresh/klepto validates nothing (a copy tool);
this is engine-extension territory, the operational guardrail in front of
the dedup/sampling stages.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame, functions as F


@dataclass(frozen=True)
class Check:
    kind: str
    target: str
    params: tuple = field(default=())


def not_null(col: str) -> Check:
    return Check("not_null", col)


def unique(*cols: str) -> Check:
    return Check("unique", ",".join(cols), tuple(cols))


def in_range(col: str, lo, hi) -> Check:
    return Check("in_range", col, (lo, hi))


def matches(col: str, regex: str) -> Check:
    return Check("matches", col, (regex,))


def accepted(col: str, values: list) -> Check:
    return Check("accepted", col, tuple(values))


def expression(sql: str, name: str | None = None) -> Check:
    return Check("expression", name or sql, (sql,))


def references(cols: list[str], other: DataFrame,
               other_cols: list[str], other_name: str | None = None) -> Check:
    """Foreign-key orphan check. ``other_name`` (the parent's SQL table
    name) is optional and only needed when the suite must render through
    :func:`validate_sql` — the engine side joins the DataFrame."""
    return Check("references", ",".join(cols),
                 (tuple(cols), other, tuple(other_cols), other_name))


def _violation_expr(c: Check) -> F.Column:
    """The per-row 'is this row a violation' condition for the row-local
    check kinds (everything but unique/references)."""
    col = F.col(c.target.split(",")[0]) if c.kind != "expression" else None
    if c.kind == "not_null":
        return col.isNull()
    if c.kind == "in_range":
        lo, hi = c.params
        return col.isNotNull() & ((col < F.lit(lo)) | (col > F.lit(hi)))
    if c.kind == "matches":
        # FULL-match semantics (the expectation convention, and DuckDB's
        # regexp_full_match); the pattern must not carry its own anchors
        return col.isNotNull() & ~col.rlike(f"^(?:{c.params[0]})$")
    if c.kind == "accepted":
        return col.isNotNull() & ~col.isin(list(c.params))
    if c.kind == "expression":
        return ~F.coalesce(F.expr(c.params[0]), F.lit(False))
    raise ValueError(f"unknown row-local check {c.kind!r}")


def validate(df: DataFrame, checks: list[Check]) -> DataFrame:
    """Run every check; returns (check, target, violations, pass) rows.
    Row-local checks share ONE aggregate pass over one scan.

    The result is LAZY: one UNION of per-check one-row aggregates, not a
    driver loop of eager ``.first()``/``.count()`` actions (optimization
    r14, guide §1.2/§2.6). The eager form ran N sequential Spark jobs —
    v03's five checks serialised five full passes, ~1.9 s at sf0.1 with
    a plan the audit could not even see (a local-relation scan). As one
    union, every branch executes inside a single job, so independent
    stages overlap on free cores; row order (row-local first, then
    unique/references in declaration order) and all values are
    unchanged, and the physical plan now shows the real work."""
    row_local = [c for c in checks
                 if c.kind not in ("unique", "references")]
    frames: list[DataFrame] = []

    if row_local:
        aggs = [F.coalesce(F.sum(F.when(_violation_expr(c), 1)
                                 .otherwise(0)), F.lit(0))
                .cast("long").alias(f"_v{i}")
                for i, c in enumerate(row_local)]
        # labels as F.lit columns, never interpolated SQL text: an
        # expression check's display name is caller text whose quotes
        # or backslashes (e.g. rlike '\\d') the SQL string parser would
        # mangle (ADVICE r14). explode(array(...)) preserves the
        # declaration order stack() emitted.
        rows = F.array(*[
            F.struct(F.lit(c.kind).alias("check"),
                     F.lit(c.target).alias("target"),
                     F.col(f"_v{i}").alias("violations"))
            for i, c in enumerate(row_local)])
        frames.append(df.agg(*aggs).select(F.explode(rows).alias("_s"))
                      .select("_s.check", "_s.target", "_s.violations"))

    for c in checks:
        if c.kind == "unique":
            cols = list(c.params)
            frames.append(
                df.groupBy(*cols)
                .agg(F.count(F.lit(1)).alias("_n"))
                .filter(F.col("_n") > 1)
                .agg(F.coalesce(F.sum(F.col("_n") - 1), F.lit(0))
                     .cast("long").alias("violations"))
                .select(F.lit(c.kind).alias("check"),
                        F.lit(c.target).alias("target"),
                        F.col("violations")))
        elif c.kind == "references":
            cols, other, other_cols = c.params[:3]
            parents = (other.select(*[F.col(oc).alias(cc) for cc, oc
                                      in zip(cols, other_cols)])
                       .distinct())
            frames.append(
                df.select(*cols).na.drop()
                .join(parents, on=list(cols), how="left_anti")
                .agg(F.count(F.lit(1)).cast("long").alias("violations"))
                .select(F.lit(c.kind).alias("check"),
                        F.lit(c.target).alias("target"),
                        F.col("violations")))

    if not frames:  # no checks: empty result, same schema as ever
        return df.sparkSession.createDataFrame(
            [], "check string, target string, violations bigint, "
                "pass boolean")
    out = frames[0]
    for f in frames[1:]:
        out = out.unionByName(f)
    return out.select("check", "target", "violations",
                      (F.col("violations") == 0).alias("pass"))


def validate_sql(table: str, checks: list[Check]) -> str:
    """Portable-SQL twin (DuckDB oracle) for the row-local, unique, and
    references check kinds; a references check renders a NOT EXISTS
    scalar subquery and needs its parent's SQL table name
    (``references(cols, df, other_cols, other_name='parent')``)."""
    selects = []
    for c in checks:
        if c.kind == "not_null":
            v = f"SUM(CASE WHEN {c.target} IS NULL THEN 1 ELSE 0 END)"
        elif c.kind == "in_range":
            lo, hi = c.params
            v = (f"SUM(CASE WHEN {c.target} IS NOT NULL AND "
                 f"({c.target} < {lo} OR {c.target} > {hi}) "
                 f"THEN 1 ELSE 0 END)")
        elif c.kind == "accepted":
            vals = ", ".join(f"'{x}'" for x in c.params)
            v = (f"SUM(CASE WHEN {c.target} IS NOT NULL AND {c.target} "
                 f"NOT IN ({vals}) THEN 1 ELSE 0 END)")
        elif c.kind == "matches":
            v = (f"SUM(CASE WHEN {c.target} IS NOT NULL AND NOT "
                 f"regexp_full_match({c.target}, '{c.params[0]}') "
                 f"THEN 1 ELSE 0 END)")
        elif c.kind == "expression":
            v = (f"SUM(CASE WHEN NOT COALESCE({c.params[0]}, FALSE) "
                 f"THEN 1 ELSE 0 END)")
        elif c.kind == "unique":
            cols = ", ".join(c.params)
            v = (f"(SELECT COALESCE(SUM(n - 1), 0) FROM (SELECT COUNT(*) "
                 f"AS n FROM {table} GROUP BY {cols}) WHERE n > 1)")
        elif c.kind == "references":
            cols, _other, other_cols, other_name = c.params
            if other_name is None:
                raise ValueError(
                    "references needs other_name for a SQL twin "
                    "(references(cols, df, other_cols, other_name='t'))")
            notnull = " AND ".join(f"t.{x} IS NOT NULL" for x in cols)
            on = " AND ".join(f"p.{oc} = t.{cc}"
                              for cc, oc in zip(cols, other_cols))
            v = (f"(SELECT COUNT(*) FROM {table} t WHERE {notnull} "
                 f"AND NOT EXISTS (SELECT 1 FROM {other_name} p "
                 f"WHERE {on}))")
        else:
            raise ValueError(f"no SQL twin for {c.kind!r}")
        selects.append(
            f"SELECT '{c.kind}' AS \"check\", '{c.target}' AS target, "
            f"CAST({v} AS BIGINT) AS violations FROM {table}"
            if c.kind not in ("unique", "references") else
            # scalar-subquery checks: standalone select (an outer
            # FROM {table} would emit one row per table row)
            f"SELECT '{c.kind}' AS \"check\", '{c.target}' AS target, "
            f"CAST({v} AS BIGINT) AS violations")
    union = " UNION ALL ".join(f"({s})" for s in selects)
    return (f"SELECT \"check\", target, violations, "
            f"violations = 0 AS \"pass\" FROM ({union})")


def distribution_drift(a: DataFrame, b: DataFrame,
                       col: str) -> DataFrame:
    """Categorical-mixture drift between two corpus snapshots — the
    monitor a recurring ingest needs beside v01's row checks: per
    category of ``col``, the count and share in each snapshot plus the
    absolute share difference (sum(abs_diff)/2 downstream is the total
    variation distance; a category present in only one side still
    reports, with the missing share an exact 0.0 — as does an entirely
    EMPTY snapshot, whose total clamps to 1 so no div-by-zero artifact
    diverges between engines).

    Exactness: counts are BIGINTs; every share is one IEEE division of
    exact integers and ``abs_diff`` one subtraction of those — a pinned
    expression shape both engines compute bit-identically (the same
    rule v02 uses to avoid stddev()). No sketches, no sampling.

    Scale shape: one count-aggregate per snapshot (map-side combined),
    a full outer join on the category, and the totals via an
    unpartitioned window over the CATEGORY-cardinality frame — after
    the aggregates, rows = distinct categories, so the window's single
    partition holds kilobytes at any corpus size. Shuffles carry
    (category, count) rows only."""
    ca = a.groupBy(F.col(col).alias("cat")).agg(
        F.count(F.lit(1)).cast("long").alias("n_a"))
    cb = b.groupBy(F.col(col).alias("cat")).agg(
        F.count(F.lit(1)).cast("long").alias("n_b"))
    from pyspark.sql.window import Window
    w = Window.partitionBy()
    j = (ca.join(cb, "cat", "full_outer")
         .select(F.col("cat"),
                 F.coalesce("n_a", F.lit(0)).cast("long").alias("n_a"),
                 F.coalesce("n_b", F.lit(0)).cast("long").alias("n_b")))
    # greatest(total, 1): an EMPTY snapshot (every count 0) reports exact
    # 0.0 shares instead of an engine-dependent div-by-zero artifact
    # (Spark NULL vs DuckDB error) — 0/1 is the only case the clamp hits
    frac_a = F.col("n_a") / F.greatest(F.sum("n_a").over(w), F.lit(1))
    frac_b = F.col("n_b") / F.greatest(F.sum("n_b").over(w), F.lit(1))
    return j.select(
        F.col("cat").alias(col), "n_a", "n_b",
        frac_a.alias("frac_a"), frac_b.alias("frac_b"),
        F.abs(frac_a - frac_b).alias("abs_diff"))


def distribution_drift_sql(a_sql: str, b_sql: str, col: str) -> str:
    """DuckDB oracle for :func:`distribution_drift` — identical count
    aggregates, full outer join, window totals, and the same pinned
    divide-then-subtract-then-abs expression shape."""
    return f"""
WITH __a AS (SELECT {col} AS cat, CAST(count(*) AS BIGINT) AS n_a
             FROM ({a_sql}) GROUP BY 1),
__b AS (SELECT {col} AS cat, CAST(count(*) AS BIGINT) AS n_b
        FROM ({b_sql}) GROUP BY 1),
__j AS (SELECT coalesce(__a.cat, __b.cat) AS cat,
               CAST(coalesce(n_a, 0) AS BIGINT) AS n_a,
               CAST(coalesce(n_b, 0) AS BIGINT) AS n_b
        FROM __a FULL OUTER JOIN __b ON __a.cat = __b.cat)
SELECT cat AS {col}, n_a, n_b,
       n_a * 1.0 / greatest(SUM(n_a) OVER (), 1) AS frac_a,
       n_b * 1.0 / greatest(SUM(n_b) OVER (), 1) AS frac_b,
       abs(n_a * 1.0 / greatest(SUM(n_a) OVER (), 1)
           - n_b * 1.0 / greatest(SUM(n_b) OVER (), 1)) AS abs_diff
FROM __j"""


def numeric_drift(a: DataFrame, b: DataFrame, col: str,
                  bin_width: float, origin: float = 0.0) -> DataFrame:
    """Numeric-distribution drift between two corpus snapshots — the
    continuous complement of :func:`distribution_drift` (v04 monitors a
    categorical mixture; this monitors a numeric column's SHAPE, the
    ingest-time check that catches a feed whose lengths/scores/values
    quietly shifted even when the category mix held still).

    Values bin at fixed width: ``bin = floor((x - origin) / bin_width)``
    — one subtraction, one division, one floor, each a single IEEE op
    both engines compute identically (the same pinned-expression rule as
    v02/v04; no ln(), so no PSI-style cross-engine libm hazard — the
    total variation distance sum(abs_diff)/2 is the drift statistic and
    is derivable downstream exactly). NULL values report as NULL-bin
    rows — one ONE-SIDED row per snapshot, because NULL join keys never
    merge (the same semantic v04's null categories have, identical in
    both engines); bin bounds are reported as ``bin * width + origin``
    for readability.

    Scale shape: identical to v04 — the binning rides the scan
    projection, one count-aggregate per snapshot (map-side combined),
    and after the aggregates rows = distinct bins, so the totals window
    is trivial at any corpus size."""
    def binned(df: DataFrame) -> DataFrame:
        return df.select(
            F.floor((F.col(col) - F.lit(origin)) / F.lit(bin_width))
            .cast("long").alias("bin"))
    out = distribution_drift(binned(a), binned(b), "bin")
    lo = F.col("bin") * F.lit(bin_width) + F.lit(origin)
    return out.select(
        "bin", lo.alias("bin_lo"),
        (lo + F.lit(bin_width)).alias("bin_hi"),
        "n_a", "n_b", "frac_a", "frac_b", "abs_diff")


def numeric_drift_sql(a_sql: str, b_sql: str, col: str,
                      bin_width: float, origin: float = 0.0) -> str:
    """DuckDB oracle for :func:`numeric_drift`: the same binning
    expression spliced into :func:`distribution_drift_sql`'s shape."""
    def binned(src: str) -> str:
        return (f"SELECT CAST(floor(({col} - {origin!r}) / {bin_width!r})"
                f" AS BIGINT) AS bin FROM ({src})")
    inner = distribution_drift_sql(binned(a_sql), binned(b_sql), "bin")
    return f"""
SELECT bin, bin * {bin_width!r} + {origin!r} AS bin_lo,
       bin * {bin_width!r} + {origin!r} + {bin_width!r} AS bin_hi,
       n_a, n_b, frac_a, frac_b, abs_diff
FROM ({inner})"""
