"""Mergeable t-digest quantile sketches (approximate twin of exact
percentiles — see ``a13_percentiles``).

Exact percentiles at 100 TB shuffle the whole value multiset per group;
the t-digest replaces that with a two-level plan mirroring the HLL module:

1. **partials** (``mapInPandas``, no shuffle of raw values): every input
   partition builds one digest per group it sees — O(delta) centroids each.
2. **merge** (``groupBy(group).applyInPandas``): the shuffle carries those
   fixed-size digests, never raw values; per group they merge into one
   digest that answers any quantile.

Like the HLL sketches, per-group digests are materialisable at rest
(:func:`tdigest_by`) and roll up losslessly-enough later
(:func:`tdigest_rollup`) — daily digests can answer monthly quantiles
without rescanning history.

The digest is Dunning's *merging* t-digest with the k1 (arcsine) scale
function: centroid capacity ~ q(1-q), so tail quantiles stay sharp while
the middle compresses. Accuracy and mergeability are pinned by tests in
rank-error terms (the t-digest's native guarantee): ~O(1/delta) rank error
at the default ``delta=100``.

Determinism: partial digests are built from sorted values, and every merge
re-sorts centroids by (mean, weight) before re-clustering, so results are
stable across runs regardless of Arrow batch or shuffle arrival order
(partition composition itself is deterministic for a parquet read).
"""

from __future__ import annotations

import math
from typing import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, functions as F

DEFAULT_DELTA = 100

_DIGEST_FIELDS = ("td_means array<double>, td_weights array<double>, "
                  "td_min double, td_max double")


def _k(q: float, delta: int) -> float:
    return delta / (2.0 * math.pi) * math.asin(2.0 * q - 1.0)


def _k_inv(k: float, delta: int) -> float:
    return (math.sin(k * 2.0 * math.pi / delta) + 1.0) / 2.0


def _compress(means: np.ndarray, weights: np.ndarray, delta: int
              ) -> tuple[np.ndarray, np.ndarray]:
    """Greedy left-to-right clustering of (mean-sorted) centroids under the
    k1 scale-function capacity. Deterministic for a given input order."""
    total = float(weights.sum())
    if total == 0.0 or len(means) == 0:
        return means[:0], weights[:0]
    out_m: list[float] = []
    out_w: list[float] = []
    q0 = 0.0
    q_limit = _k_inv(_k(q0, delta) + 1.0, delta)
    cur_m = float(means[0])
    cur_w = float(weights[0])
    for m, w in zip(means[1:], weights[1:]):
        q = q0 + (cur_w + w) / total
        if q <= q_limit:
            # weighted-mean merge keeps the centroid inside its capacity
            cur_m = (cur_m * cur_w + float(m) * float(w)) / (cur_w + float(w))
            cur_w += float(w)
        else:
            out_m.append(cur_m)
            out_w.append(cur_w)
            q0 += cur_w / total
            q_limit = _k_inv(_k(q0, delta) + 1.0, delta)
            cur_m, cur_w = float(m), float(w)
    out_m.append(cur_m)
    out_w.append(cur_w)
    return np.asarray(out_m), np.asarray(out_w)


def _build(values: np.ndarray, delta: int
           ) -> tuple[np.ndarray, np.ndarray, float, float]:
    v = np.sort(values[~np.isnan(values)].astype(np.float64))
    if len(v) == 0:
        return v, v, math.nan, math.nan
    m, w = _compress(v, np.ones(len(v)), delta)
    return m, w, float(v[0]), float(v[-1])


def _merge(parts: list[tuple[np.ndarray, np.ndarray]], delta: int
           ) -> tuple[np.ndarray, np.ndarray]:
    means = np.concatenate([p[0] for p in parts])
    weights = np.concatenate([p[1] for p in parts])
    if len(means) == 0:
        return means, weights
    # sort by (mean, weight): shuffle-arrival-order invariance
    order = np.lexsort((weights, means))
    return _compress(means[order], weights[order], delta)


def _quantile(means: np.ndarray, weights: np.ndarray,
              mn: float, mx: float, q: float) -> float:
    """Midpoint-rank linear interpolation (the standard t-digest estimator),
    clamped to the observed [min, max]."""
    if len(means) == 0:
        return math.nan
    total = float(weights.sum())
    target = q * total
    cum = np.cumsum(weights)
    mids = cum - weights / 2.0
    if target <= mids[0]:
        # interpolate from the true minimum to the first centroid
        if mids[0] <= 0.5 or means[0] == mn:
            return float(mn) if target <= 0.5 else float(means[0])
        frac = max(target - 0.5, 0.0) / (mids[0] - 0.5)
        return float(mn + frac * (means[0] - mn))
    if target >= mids[-1]:
        if total - mids[-1] <= 0.5 or means[-1] == mx:
            return float(mx) if target >= total - 0.5 else float(means[-1])
        frac = min(target - mids[-1], total - 0.5 - mids[-1]) \
            / (total - 0.5 - mids[-1])
        return float(means[-1] + frac * (mx - means[-1]))
    i = int(np.searchsorted(mids, target, side="right"))
    lo_m, hi_m = mids[i - 1], mids[i]
    frac = (target - lo_m) / (hi_m - lo_m)
    return float(means[i - 1] + frac * (means[i] - means[i - 1]))


# --------------------------------------------------------------------------
# DataFrame API
# --------------------------------------------------------------------------

def _partials(df: DataFrame, value_col: str, group_cols: list[str],
              delta: int) -> DataFrame:
    """Per-partition, per-group partial digests — built with NO shuffle of
    raw values (``mapInPandas``); everything downstream moves only these
    O(delta)-centroid rows."""
    group_struct = ", ".join(f"{c} {t}" for c, t in
                             [(c, dict(df.dtypes)[c]) for c in group_cols])
    partial_schema = f"{group_struct}, {_DIGEST_FIELDS}"

    def build_partials(batches: Iterator[pd.DataFrame]
                       ) -> Iterator[pd.DataFrame]:
        acc: dict[tuple, list[np.ndarray]] = {}
        for pdf in batches:
            for key, sub in pdf.groupby(group_cols, dropna=False, sort=False):
                k = key if isinstance(key, tuple) else (key,)
                acc.setdefault(k, []).append(
                    sub[value_col].to_numpy(dtype=np.float64, na_value=np.nan))
        rows = []
        for k, chunks in acc.items():
            m, w, mn, mx = _build(np.concatenate(chunks), delta)
            rows.append((*k, list(m), list(w), mn, mx))
        cols = group_cols + ["td_means", "td_weights", "td_min", "td_max"]
        yield pd.DataFrame(rows, columns=cols)

    return (df.select(*group_cols, value_col)
            .mapInPandas(build_partials, schema=partial_schema))


def tdigest_by(df: DataFrame, value_col: str, group_cols: list[str],
               delta: int = DEFAULT_DELTA) -> DataFrame:
    """Per-group digests as storable rows: centroid means/weights arrays
    plus observed min/max. One digest-only shuffle merges the partials."""
    group_struct = ", ".join(f"{c} {t}" for c, t in
                             [(c, dict(df.dtypes)[c]) for c in group_cols])
    partial_schema = f"{group_struct}, {_DIGEST_FIELDS}"
    partials = _partials(df, value_col, group_cols, delta)

    def merge_group(pdf: pd.DataFrame) -> pd.DataFrame:
        parts = [(np.asarray(m, dtype=np.float64),
                  np.asarray(w, dtype=np.float64))
                 for m, w in zip(pdf["td_means"], pdf["td_weights"])
                 if len(m)]
        if parts:
            m, w = _merge(parts, delta)
            mn = float(np.nanmin(pdf["td_min"].to_numpy(dtype=np.float64)))
            mx = float(np.nanmax(pdf["td_max"].to_numpy(dtype=np.float64)))
        else:
            m = w = np.empty(0)
            mn = mx = math.nan
        head = pdf.iloc[[0]][group_cols].reset_index(drop=True)
        head["td_means"] = [list(m)]
        head["td_weights"] = [list(w)]
        head["td_min"] = mn
        head["td_max"] = mx
        return head

    return partials.groupBy(*group_cols).applyInPandas(
        merge_group, schema=partial_schema)


def _estimate(digests: DataFrame, probs: list[float], group_cols: list[str],
              delta: int) -> DataFrame:
    out_fields = ", ".join(f"p{int(p * 100):02d} double" for p in probs)
    group_struct = ", ".join(f"{c} {t}" for c, t in
                             [(c, dict(digests.dtypes)[c])
                              for c in group_cols])

    def estimate(pdf: pd.DataFrame) -> pd.DataFrame:
        parts = [(np.asarray(m, dtype=np.float64),
                  np.asarray(w, dtype=np.float64))
                 for m, w in zip(pdf["td_means"], pdf["td_weights"])
                 if len(m)]
        head = pdf.iloc[[0]][group_cols].reset_index(drop=True)
        if parts:
            m, w = _merge(parts, delta) if len(parts) > 1 else parts[0]
            mn = float(np.nanmin(pdf["td_min"].to_numpy(dtype=np.float64)))
            mx = float(np.nanmax(pdf["td_max"].to_numpy(dtype=np.float64)))
            for p in probs:
                head[f"p{int(p * 100):02d}"] = _quantile(m, w, mn, mx, p)
        else:
            for p in probs:
                head[f"p{int(p * 100):02d}"] = math.nan
        return head

    return digests.groupBy(*group_cols).applyInPandas(
        estimate, schema=f"{group_struct}, {out_fields}")


def tdigest_quantiles(df: DataFrame, value_col: str, probs: list[float],
                      group_cols: list[str],
                      delta: int = DEFAULT_DELTA) -> DataFrame:
    """Approximate per-group quantiles: build partials, then merge +
    estimate in ONE grouped pass — a single shuffle end-to-end, carrying
    digests only. Output columns ``pNN`` mirror the exact-percentile
    query's shape."""
    return _estimate(_partials(df, value_col, group_cols, delta),
                     probs, group_cols, delta)


def tdigest_rollup(digests: DataFrame, probs: list[float],
                   group_cols: list[str],
                   delta: int = DEFAULT_DELTA) -> DataFrame:
    """Estimate quantiles over coarser groups from stored digests — merge
    is centroid-level, the raw data is never touched again."""
    return _estimate(digests, probs, group_cols, delta)
