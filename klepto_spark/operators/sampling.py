"""Deterministic sampling & dataset splitting (training-data pipeline ops).

A 100 TB curation pipeline needs samples that are REPRODUCIBLE — rerun the
job, get the same rows — and CONSISTENT across engines and re-partitionings.
Spark's built-in ``df.sample``/``sampleBy`` are seeded per-partition, so the
selected set changes whenever the partitioning does; that is useless as a
contract. These operators derive membership from a keyed hash instead:

    member(row)  :=  md5(salt || '|' || key)[:8]  <  hex(floor(rate * 16^8))

The hex prefix of md5 is uniform over [0, 16^8); comparing it to a constant
hex literal is a pure, stateless, codegen'd map-side predicate — no shuffle,
no state, no RNG, and both Spark and DuckDB compute the identical md5 of the
identical UTF-8 string, so every sample here has an exact SQL oracle
(the same portability trick as the MinHash signatures in dedup.py).

Families:
- sample_uniform:    Bernoulli(rate) by key — filter, zero shuffle.
- split_assign:      train/valid/test assignment from cumulative rate
                     thresholds — one CASE expression, zero shuffle; a row's
                     split NEVER changes when other rows come or go (the
                     property random splits lack).
- sample_stratified: per-stratum rates (e.g. downsample dominant languages)
                     as one CASE over the strata column — still zero shuffle.
- sample_exact_n:    exactly n rows per stratum, chosen by hash order —
                     a deterministic "reservoir". This one shuffles by
                     stratum (row_number needs the group together); strata
                     are typically few and heavy, so at scale pre-thin with
                     sample_stratified to ~4n/|stratum| first and take the
                     exact top-n from the survivors.

Keys should be stable identifiers (ints or strings). Numeric keys splice
through CAST(key AS STRING); the same magnitude caveats as the anonymiser
determinism key apply (functions/anonymise.py) — integers are always safe.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window, functions as F

_HEX_SPACE = 16 ** 8  # 8 hex chars = 32 bits of md5 prefix


#: stands in for a NULL key in the hash input. Spark's concat is
#: NULL-propagating while DuckDB's skips NULL arguments, so without a
#: sentinel the engines disagree on nullable keys (Spark drops the row,
#: DuckDB hashes 'salt|'). A real key value equal to the sentinel would
#: collide with NULL — keep keys NOT NULL where that matters.
_NULL_KEY = "<NULL>"


def _threshold_hex(rate: float) -> str:
    """Rate in [0,1] -> 8-char lowercase hex threshold.

    rate >= 1.0 returns the sentinel ``'g'``: it sorts above every hex
    string in both engines (bytewise compare, 'g' > 'f'), so "keep the
    whole stratum" keeps even the p=2^-32 keys whose md5 prefix is
    exactly 'ffffffff' — a plain hex threshold silently drops those."""
    if not 0.0 <= rate <= 1.0:
        raise ValueError(f"rate must be in [0,1], got {rate}")
    if rate >= 1.0:
        return "g"
    return format(min(int(rate * _HEX_SPACE), _HEX_SPACE - 1), "08x")


def _q(text: str) -> str:
    """Escape a value for splicing into a single-quoted SQL literal."""
    return str(text).replace("'", "''")


def hash_prefix(key_col: str, salt: str = "") -> Column:
    """The uniform 8-hex-char draw for a key (Spark side)."""
    return F.substring(
        F.md5(F.concat(F.lit(f"{salt}|"),
                       F.coalesce(F.col(key_col).cast("string"),
                                  F.lit(_NULL_KEY)))),
        1, 8)


def _hash_prefix_sql(key_col: str, salt: str = "") -> str:
    """The identical draw in DuckDB SQL."""
    return (f"substr(md5(concat('{_q(salt)}|', "
            f"coalesce(CAST({key_col} AS VARCHAR), '{_NULL_KEY}'))), 1, 8)")


def sample_uniform(df: DataFrame, key_col: str, rate: float,
                   salt: str = "") -> DataFrame:
    """Deterministic Bernoulli(rate) sample by key. Pure filter: no
    shuffle, no state; repartition-stable and engine-portable."""
    if rate >= 1.0:
        return df
    return df.filter(hash_prefix(key_col, salt) < F.lit(_threshold_hex(rate)))


def sample_uniform_sql(key_col: str, rate: float, salt: str = "") -> str:
    """WHERE-clause twin of :func:`sample_uniform`."""
    if rate >= 1.0:
        return "TRUE"
    return f"{_hash_prefix_sql(key_col, salt)} < '{_threshold_hex(rate)}'"


def split_assign(df: DataFrame, key_col: str, weights: dict[str, float],
                 salt: str = "", out_col: str = "split") -> DataFrame:
    """Assign every row to exactly one named split (train/valid/test...)
    by cumulative hash thresholds. Weights must sum to 1 (±1e-9).

    Membership depends only on (salt, key), so adding or removing OTHER
    rows never moves a row between splits — safe for incremental corpus
    growth (yesterday's training docs stay training docs)."""
    if abs(sum(weights.values()) - 1.0) > 1e-9:
        raise ValueError(f"split weights must sum to 1, got {weights}")
    h = hash_prefix(key_col, salt)
    names = list(weights)
    expr, cum = None, 0.0
    for name in names[:-1]:
        cum += weights[name]
        cond = h < F.lit(_threshold_hex(cum))
        expr = F.when(cond, name) if expr is None else expr.when(cond, name)
    expr = (F.lit(names[-1]) if expr is None
            else expr.otherwise(names[-1]))
    return df.withColumn(out_col, expr)


def split_assign_sql(key_col: str, weights: dict[str, float],
                     salt: str = "", out_col: str = "split") -> str:
    """SELECT-expression twin of :func:`split_assign`."""
    h = _hash_prefix_sql(key_col, salt)
    names = list(weights)
    if len(names) == 1:
        return f"'{names[0]}' AS {out_col}"
    parts, cum = [], 0.0
    for name in names[:-1]:
        cum += weights[name]
        parts.append(f"WHEN {h} < '{_threshold_hex(cum)}' THEN '{_q(name)}'")
    return ("CASE " + " ".join(parts)
            + f" ELSE '{_q(names[-1])}' END AS {out_col}")


def sample_stratified(df: DataFrame, strata_col: str, key_col: str,
                      rates: dict[str, float], default_rate: float = 0.0,
                      salt: str = "") -> DataFrame:
    """Per-stratum Bernoulli rates (downsample dominant strata, keep rare
    ones whole). One CASE predicate — still a pure map-side filter."""
    h = hash_prefix(key_col, salt)
    thresh = None
    for value, rate in rates.items():
        cond = F.col(strata_col) == value
        t = F.lit(_threshold_hex(rate))
        thresh = F.when(cond, t) if thresh is None else thresh.when(cond, t)
    thresh = (F.lit(_threshold_hex(default_rate)) if thresh is None
              else thresh.otherwise(_threshold_hex(default_rate)))
    return df.filter(h < thresh)


def sample_stratified_sql(strata_col: str, key_col: str,
                          rates: dict[str, float], default_rate: float = 0.0,
                          salt: str = "") -> str:
    """WHERE-clause twin of :func:`sample_stratified`."""
    h = _hash_prefix_sql(key_col, salt)
    whens = " ".join(
        f"WHEN {strata_col} = '{_q(v)}' THEN '{_threshold_hex(r)}'"
        for v, r in rates.items())
    return (f"{h} < (CASE {whens} "
            f"ELSE '{_threshold_hex(default_rate)}' END)")


def sample_exact_n(df: DataFrame, strata_col: str, key_col: str, n: int,
                   salt: str = "", out_col: str = "rn") -> DataFrame:
    """Exactly min(n, |stratum|) rows per stratum, in deterministic hash
    order — the batch equivalent of per-stratum reservoir sampling.

    Shuffles once on the strata column (row_number needs each stratum
    together). Strata are few-and-heavy by nature; at 100 TB, pre-thin
    with :func:`sample_stratified` at ~4n/|stratum| so the window sees
    thousands of rows per stratum, not billions.

    ``key_col`` must be unique within each stratum: the sort is
    (hash, key), so duplicate keys tie on both columns and which
    physical duplicate gets rn<=n is engine-dependent — the determinism
    and oracle contracts only hold for unique keys."""
    w = Window.partitionBy(strata_col).orderBy(
        hash_prefix(key_col, salt), F.col(key_col))
    return (df.withColumn(out_col, F.row_number().over(w))
            .filter(F.col(out_col) <= n))


def sample_exact_n_sql(table_sql: str, strata_col: str, key_col: str, n: int,
                       salt: str = "", out_col: str = "rn",
                       columns: str = "*") -> str:
    """Full-query twin of :func:`sample_exact_n` over ``table_sql``.

    With the default ``columns='*'`` the outer select is a bare ``*``
    (the inner subquery already carries ``out_col``; ``*, rn`` would
    emit the row-number column twice and break schema comparison)."""
    h = _hash_prefix_sql(key_col, salt)
    sel = "*" if columns.strip() == "*" else f"{columns}, {out_col}"
    return f"""
SELECT {sel} FROM (
  SELECT *, row_number() OVER (PARTITION BY {strata_col}
            ORDER BY {h}, {key_col}) AS {out_col}
  FROM {table_sql})
WHERE {out_col} <= {n}"""


def _hex_value(h: Column) -> Column:
    """The 8-hex-char draw as an exact integer in [0, 2^32): an unrolled
    8-term positional sum — the identical arithmetic is expressible in
    DuckDB (instr/strpos over the same alphabet), so weighted thresholds
    can compare NUMERICALLY across engines (the string compare the flat
    samplers use cannot carry a per-row threshold)."""
    out = None
    for i in range(8):
        digit = (F.instr(F.lit("0123456789abcdef"),
                         F.substring(h, i + 1, 1)) - 1).cast("long")
        term = digit * F.lit(16 ** (7 - i)).cast("long")
        out = term if out is None else out + term
    return out


def _hex_value_sql(h: str) -> str:
    terms = [(f"(CAST(strpos('0123456789abcdef', substr({h}, {i + 1}, 1)) "
              f"AS BIGINT) - 1) * {16 ** (7 - i)}")
             for i in range(8)]
    return "(" + " + ".join(terms) + ")"


def sample_weighted(df: DataFrame, key_col: str, weight_col: str,
                    rate: float = 1.0, salt: str = "") -> DataFrame:
    """Deterministic weighted Bernoulli sample: per-row keep probability
    ``clamp(rate * weight, 0, 1)`` — the corpus-mixing primitive (favor
    long/high-quality documents, downweight boilerplate sources) with the
    same portability contract as :func:`sample_uniform`: membership
    depends only on (salt, key, weight), so it is repartition-stable,
    incremental-growth-stable, and exactly replayable in SQL.

    Still a pure filter — no shuffle, no state, map-side only at any
    scale. NULL weights drop the row (NULL comparison), same as SQL.

    Exactness across engines: the draw is integer arithmetic; the
    threshold ``p * 2^32`` is one double multiply chain with pinned
    association, bit-identical in IEEE between Spark and DuckDB."""
    if rate < 0.0:
        raise ValueError(f"rate must be >= 0, got {rate}")
    hx = _hex_value(hash_prefix(key_col, salt))
    p = F.least(F.greatest(F.col(weight_col).cast("double") * F.lit(float(rate)),
                           F.lit(0.0)), F.lit(1.0))
    return df.filter(hx.cast("double") < p * F.lit(float(_HEX_SPACE)))


def sample_weighted_sql(key_col: str, weight_col: str, rate: float = 1.0,
                        salt: str = "") -> str:
    """WHERE-clause twin of :func:`sample_weighted` (DuckDB)."""
    hx = _hex_value_sql(_hash_prefix_sql(key_col, salt))
    p = (f"least(greatest(CAST({weight_col} AS DOUBLE) * {float(rate)!r}, "
         f"0.0), 1.0)")
    return f"CAST({hx} AS DOUBLE) < {p} * {float(_HEX_SPACE)!r}"


def mixture_sample(df: DataFrame, group_col: str, key_col: str,
                   weights: dict[str, float], salt: str = "") -> DataFrame:
    """Resample a multi-source corpus to a TARGET MIXTURE — the domain-
    reweighting step of every pretraining pipeline (C4/Pile/DoReMi-style
    "x% web, y% code, z% books"). ``weights`` gives the desired
    proportion per ``group_col`` value; the output is the LARGEST
    deterministic subsample achieving those proportions in expectation:
    the most-constraining group (min n_g / w_g) is kept whole and every
    other group is Bernoulli-thinned to match. Groups not listed are
    dropped; listed groups absent from the data simply contribute
    nothing (the realised mixture renormalises over present groups).

    Scale shape: pass one is a column-pruned COUNT per group (tiny
    result), pass two a map-side filter against the broadcast per-group
    rate — no shuffle of corpus rows at any scale. Membership depends
    only on (salt, key, group counts), so it is repartition-stable and
    exactly replayable in SQL: the rate ``(w_g * scale) / n_g`` is one
    pinned-association double chain, and the draw compare is the same
    integer-vs-double threshold as :func:`sample_weighted`."""
    if not weights:
        raise ValueError("weights must be non-empty")
    if any(w <= 0 for w in weights.values()):
        raise ValueError("mixture weights must be > 0 (omit a group to "
                         "drop it)")
    wcol = None
    for g, w in weights.items():
        cond = F.col(group_col) == g
        wcol = (F.when(cond, float(w)) if wcol is None
                else wcol.when(cond, float(w)))
    counts = (df.groupBy(group_col).count()
                .withColumn("__w", wcol)
                .filter(F.col("__w").isNotNull())
                .withColumn("__n", F.col("count").cast("double")))
    scale = counts.agg(F.min(F.col("__n") / F.col("__w")).alias("__sc"))
    rates = (counts.crossJoin(F.broadcast(scale))
                   .select(F.col(group_col).alias("__g"),
                           ((F.col("__w") * F.col("__sc")) / F.col("__n"))
                           .alias("__rate")))
    hx = _hex_value(hash_prefix(key_col, salt)).cast("double")
    out = (df.join(F.broadcast(rates), df[group_col] == F.col("__g"))
             .filter(hx < F.col("__rate") * F.lit(float(_HEX_SPACE))))
    return out.select(*[df[c] for c in df.columns])


def mixture_sample_sql(table_sql: str, group_col: str, key_col: str,
                       weights: dict[str, float], salt: str = "",
                       select: str = "d.*") -> str:
    """Full-query DuckDB twin of :func:`mixture_sample` (CTE-shaped —
    the rates are data-dependent, so a WHERE fragment can't carry them)."""
    vals = ", ".join(f"('{_q(g)}', CAST({float(w)!r} AS DOUBLE))"
                     for g, w in weights.items())
    hx = _hex_value_sql(_hash_prefix_sql(f"d.{key_col}", salt))
    return f"""
WITH __cnt AS (
  SELECT {group_col} AS g, CAST(COUNT(*) AS DOUBLE) AS n
  FROM {table_sql} GROUP BY {group_col}),
__w(g, w) AS (VALUES {vals}),
__sc AS (SELECT MIN(n / w) AS sc FROM __cnt JOIN __w USING (g)),
__rates AS (
  SELECT g, (w * sc) / n AS r
  FROM __cnt JOIN __w USING (g) CROSS JOIN __sc)
SELECT {select}
FROM {table_sql} d JOIN __rates ON d.{group_col} = __rates.g
WHERE CAST({hx} AS DOUBLE) < r * {float(_HEX_SPACE)!r}"""


def token_budget_sample(df: DataFrame, strata_col: str, key_col: str,
                        tokens_col: Column | str, budget: int,
                        salt: str = "") -> DataFrame:
    """Greedy per-stratum TOKEN-budget fill: walk each stratum's rows in
    deterministic hash order and keep documents while the running token
    total stays within ``budget`` (documents are never split — the last
    doc that would cross the budget is dropped, like sequence-bin
    packing's closed bins). This is the mixture primitive when targets
    are expressed in TOKENS rather than row proportions — "2B tokens of
    web, 500M of books" — which is how LLM data recipes are written.

    Membership depends only on (salt, key, stratum prefix sums), so
    appending NEW rows can only extend a stratum's tail, never evict an
    already-kept doc whose hash sorts earlier — stable under corpus
    growth in the same sense as :func:`split_assign` (docs hashing after
    a new arrival MAY be displaced; recipe reproducibility pins the salt
    and the snapshot).

    Scale shape: ONE shuffle on the strata column for the running-sum
    window (same shape as :func:`sample_exact_n`). Project down to
    (key, stratum, token count) BEFORE calling so the stratum sort moves
    counters, not document bodies, then semi-join the kept keys back if
    you need full rows. Strata are few-and-heavy: at 100 TB pre-thin
    with :func:`sample_stratified` at ~2x the expected keep rate so the
    window sees millions of rows, not billions.

    ``key_col`` must be unique per stratum (ties in the (hash, key) sort
    break engine-dependently otherwise — same contract as
    sample_exact_n)."""
    tok = F.col(tokens_col) if isinstance(tokens_col, str) else tokens_col
    w = (Window.partitionBy(strata_col)
         .orderBy(hash_prefix(key_col, salt), F.col(key_col))
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    return (df.withColumn("n_tokens", tok.cast("long"))
            .withColumn("cum_tokens", F.sum("n_tokens").over(w))
            .filter(F.col("cum_tokens") <= budget))


def token_budget_sample_sql(table_sql: str, strata_col: str, key_col: str,
                            tokens_sql: str, budget: int, salt: str = "",
                            columns: str = "*") -> str:
    """Full-query DuckDB twin of :func:`token_budget_sample`;
    ``tokens_sql`` must be the exact SQL replay of the Spark token
    expression (e.g. the whitespace token count both engines share)."""
    h = _hash_prefix_sql(key_col, salt)
    sel = "*" if columns.strip() == "*" else f"{columns}, n_tokens, cum_tokens"
    return f"""
SELECT {sel} FROM (
  SELECT *, CAST({tokens_sql} AS BIGINT) AS n_tokens,
         CAST(sum(CAST({tokens_sql} AS BIGINT)) OVER (
              PARTITION BY {strata_col}
              ORDER BY {h}, {key_col}
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
           AS cum_tokens
  FROM {table_sql})
WHERE cum_tokens <= {int(budget)}"""


def temperature_mixture(df: DataFrame, group_col: str, key_col: str,
                        alpha: float = 0.5, salt: str = "") -> DataFrame:
    """Temperature-based mixture resampling (the UniMax / multilingual-
    pretraining rule): target proportions follow ``n_g ** alpha`` rather
    than a hand-written weight table — ``alpha=1`` keeps the natural
    distribution, ``alpha -> 0`` flattens toward uniform, the standard
    0.2–0.7 range boosts tail languages/domains without starving heads.
    Like :func:`mixture_sample`, the output is the LARGEST deterministic
    subsample achieving the target in expectation: the smallest group is
    kept whole (its rate is exactly 1.0 by algebra: ``n^a * n^(1-a) / n``)
    and larger groups thin by ``(n_g / n_min) ** (alpha - 1)``.

    Scale shape: identical to mixture_sample — one column-pruned COUNT
    per group, then a map-side filter against broadcast rates; corpus
    rows never shuffle.

    Cross-engine exactness: ``alpha=0.5`` computes the weight via
    ``sqrt`` (IEEE-correctly-rounded in both engines, so the rate chain
    is bit-exact and the SQL twin hash-matches). Other alphas go through
    ``pow``, which libms don't guarantee to the last ulp — a draw within
    ~2^-40 of its threshold could flip between engines; fine for
    production, pinned contracts should use 0.5."""
    if not 0.0 < alpha <= 1.0:
        raise ValueError(f"alpha must be in (0, 1], got {alpha}")
    counts = (df.groupBy(group_col).count()
              .withColumn("__n", F.col("count").cast("double")))
    w = (F.sqrt(F.col("__n")) if alpha == 0.5
         else F.pow(F.col("__n"), F.lit(float(alpha))))
    counts = counts.withColumn("__w", w)
    scale = counts.agg(F.min(F.col("__n") / F.col("__w")).alias("__sc"))
    rates = (counts.crossJoin(F.broadcast(scale))
             .select(F.col(group_col).alias("__g"),
                     ((F.col("__w") * F.col("__sc")) / F.col("__n"))
                     .alias("__rate")))
    hx = _hex_value(hash_prefix(key_col, salt)).cast("double")
    out = (df.join(F.broadcast(rates), df[group_col] == F.col("__g"))
           .filter(hx < F.col("__rate") * F.lit(float(_HEX_SPACE))))
    return out.select(*[df[c] for c in df.columns])


def temperature_mixture_sql(table_sql: str, group_col: str, key_col: str,
                            alpha: float = 0.5, salt: str = "",
                            select: str = "d.*") -> str:
    """Full-query DuckDB twin of :func:`temperature_mixture` (same rate
    chain, same association order; sqrt path for alpha=0.5)."""
    w = "sqrt(n)" if alpha == 0.5 else f"pow(n, {float(alpha)!r})"
    hx = _hex_value_sql(_hash_prefix_sql(f"d.{key_col}", salt))
    return f"""
WITH __cnt AS (
  SELECT {group_col} AS g, CAST(COUNT(*) AS DOUBLE) AS n
  FROM {table_sql} GROUP BY {group_col}),
__w AS (SELECT g, n, {w} AS w FROM __cnt),
__sc AS (SELECT MIN(n / w) AS sc FROM __w),
__rates AS (SELECT g, (w * sc) / n AS r FROM __w CROSS JOIN __sc)
SELECT {select}
FROM {table_sql} d JOIN __rates ON d.{group_col} = __rates.g
WHERE CAST({hx} AS DOUBLE) < r * {float(_HEX_SPACE)!r}"""
