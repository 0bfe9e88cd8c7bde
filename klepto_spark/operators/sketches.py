"""Mergeable cardinality sketches (HLL) for corpus-scale distinct counts.

Exact ``COUNT(DISTINCT x)`` at 100 TB shuffles every distinct value to
reduce — the single most expensive aggregation shape there is. Spark's
Apache DataSketches HLL functions replace it with a fixed-size sketch per
partition plus a cheap merge: the shuffle carries ``2^lgk``-bucket
sketches (a few KB each) instead of the value universe.

Two properties matter at scale and are pinned by tests:

- **error bound**: the estimate is within the standard HLL relative error
  (~1.04/sqrt(2^lgk), ~1.6% at the default lgk=12) of the exact count.
- **mergeability**: per-group sketches union to the global sketch — the
  global estimate from ``hll_union_agg`` over per-source sketches equals
  the estimate from sketching the whole corpus directly, so daily/
  per-source sketches can be stored and rolled up without re-scanning
  history (the same at-rest pattern as the IVF index).

Reference scope note: hellofresh/klepto has no aggregation engine at all;
sketches are part of the engine's training-data-pipeline extension
(SURVEY §2.8-adjacent), alongside dedup and sampling.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F


def hll_distinct(df: DataFrame, value_col: str,
                 group_cols: list[str] | None = None,
                 lgk: int = 12) -> DataFrame:
    """Approximate distinct ``value_col`` per group (or globally):
    one hash-aggregate whose shuffle carries fixed-size sketches."""
    agg = F.hll_sketch_estimate(
        F.hll_sketch_agg(F.col(value_col), F.lit(lgk))).alias("approx_distinct")
    if group_cols:
        return df.groupBy(*group_cols).agg(agg)
    return df.agg(agg)


def hll_sketch_by(df: DataFrame, value_col: str, group_cols: list[str],
                  lgk: int = 12) -> DataFrame:
    """Materialisable per-group sketches (binary column): store these at
    rest and roll them up later with :func:`hll_rollup` — distinct counts
    over any group union without touching the raw data again."""
    return (df.groupBy(*group_cols)
            .agg(F.hll_sketch_agg(F.col(value_col), F.lit(lgk))
                 .alias("hll_sketch")))


def hll_rollup(sketches: DataFrame,
               group_cols: list[str] | None = None) -> DataFrame:
    """Merge stored sketches (all of them, or per coarser group) and
    estimate. Union is lossless for HLL: the rolled-up estimate is the
    estimate of the union of the original inputs."""
    agg = F.hll_sketch_estimate(
        F.hll_union_agg(F.col("hll_sketch"))).alias("approx_distinct")
    if group_cols:
        return sketches.groupBy(*group_cols).agg(agg)
    return sketches.agg(agg)


# --------------------------------------------------------------------------
# Misra-Gries heavy hitters (mergeable frequent-items summaries)
# --------------------------------------------------------------------------
#
# Exact per-value counts at 100 TB shuffle one row per distinct value; when
# only the heavy tail matters, a Misra-Gries summary bounds BOTH memory and
# shuffle at k counters per partition. The mergeable form (Agarwal et al.,
# "Mergeable Summaries", PODS'12): merge = sum counters, then subtract the
# (k+1)-th largest count from all and drop the non-positive — the total
# subtracted amount is the summary's error bound. Guarantees, pinned by
# tests:
#   - any value with true frequency > n/k survives every trim;
#   - stored_count <= true_count <= stored_count + err for survivors;
#   - with k > total distinct values NO trim ever fires and the summary is
#     EXACT (err = 0) — which makes the contract query value-checkable
#     against a plain GROUP BY oracle.

def _mg_trim(counts: dict, k: int) -> tuple[dict, int]:
    """Keep at most k counters; returns (trimmed, amount subtracted)."""
    if len(counts) <= k:
        return counts, 0
    kth = sorted(counts.values(), reverse=True)[k]
    out = {v: c - kth for v, c in counts.items() if c > kth}
    return out, kth


def heavy_hitters(df: "DataFrame", value_col: str,
                  group_cols: list[str] | None = None,
                  k: int = 256) -> "DataFrame":
    """Approximate frequent items per group: ``count_lo <= true count <=
    count_hi``; every value with true frequency > (group total)/k is
    guaranteed present. Two-level plan like the t-digest: per-partition
    summaries via mapInPandas (no raw-value shuffle), one summary-only
    exchange to merge."""
    import pandas as pd

    group_cols = group_cols or []
    dtypes = dict(df.dtypes)
    group_struct = "".join(f"{c} {dtypes[c]}, " for c in group_cols)
    val_t = dtypes[value_col]
    partial_schema = (f"{group_struct}mg_values array<{val_t}>, "
                      f"mg_counts array<bigint>, mg_err bigint")

    def build_partials(batches):
        acc: dict[tuple, dict] = {}
        errs: dict[tuple, int] = {}
        for pdf in batches:
            if group_cols:
                grouped = pdf.groupby(group_cols, dropna=False, sort=False)
            else:
                grouped = [((), pdf)]
            for key, sub in grouped:
                kt = key if isinstance(key, tuple) else (key,)
                d = acc.setdefault(kt, {})
                for v, c in sub[value_col].value_counts(dropna=True).items():
                    d[v] = d.get(v, 0) + int(c)
                d, sub_err = _mg_trim(d, k)
                acc[kt] = d
                errs[kt] = errs.get(kt, 0) + sub_err
        rows = [( *kt, list(d.keys()), [int(c) for c in d.values()],
                  errs.get(kt, 0))
                for kt, d in acc.items()]
        cols = group_cols + ["mg_values", "mg_counts", "mg_err"]
        yield pd.DataFrame(rows, columns=cols)

    partials = (df.select(*group_cols, value_col)
                .mapInPandas(build_partials, schema=partial_schema))

    out_schema = (f"{group_struct}{value_col} {val_t}, count_lo bigint, "
                  f"count_hi bigint")

    def merge_group(pdf: pd.DataFrame) -> pd.DataFrame:
        merged: dict = {}
        err = 0
        for vals, cnts, e in zip(pdf["mg_values"], pdf["mg_counts"],
                                 pdf["mg_err"]):
            err += int(e)
            for v, c in zip(vals, cnts):
                merged[v] = merged.get(v, 0) + int(c)
        merged, sub = _mg_trim(merged, k)
        err += sub
        head = pdf.iloc[0][group_cols] if group_cols else None
        rows = [(*(tuple(head) if group_cols else ()), v, c, c + err)
                for v, c in merged.items()]
        cols = group_cols + [value_col, "count_lo", "count_hi"]
        return pd.DataFrame(rows, columns=cols)

    if group_cols:
        grouped = partials.groupBy(*group_cols)
    else:
        grouped = partials.groupBy()
    return grouped.applyInPandas(merge_group, schema=out_schema)
