"""Physical-plan inspection helpers.

The 100 TB posture is only real if the plans prove it: filters reach the
parquet scan (PushedFilters), projections prune (ReadSchema), small
restriction parents broadcast, top-k compiles to TakeOrderedAndProject,
and hot expressions sit inside WholeStageCodegen spans. These helpers make
those properties assertable in tests (tests/test_plans.py) instead of
hoped-for.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame


def executed_plan(df: DataFrame) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def final_plan(df: DataFrame) -> str:
    """The AQE-final physical plan text (the part above the Initial Plan
    echo). Under AQE, exchange reuse is decided at RUNTIME, so scan-count
    assertions must look at the final plan — this EXECUTES the query
    (collect) if it has not run yet. Use on small test inputs only."""
    qe = df._jdf.queryExecution()
    text = qe.executedPlan().toString()
    if "isFinalPlan=true" not in text:
        df.collect()
        text = qe.executedPlan().toString()
    return text.split("== Initial Plan ==")[0]


def final_scan_count(df: DataFrame) -> int:
    """Number of physical file scans in the AQE-final plan — ReusedExchange
    branches don't re-scan, so a '1' here proves the one-pass shape."""
    return len(re.findall(r"FileScan ", final_plan(df)))


def formatted_plan(df: DataFrame) -> str:
    import contextlib
    import io
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def pushed_filters(df: DataFrame) -> list[str]:
    """Filter predicates that reached the parquet scan."""
    out: list[str] = []
    for m in re.finditer(r"PushedFilters: \[([^\]]*)\]", formatted_plan(df)):
        out.extend(s.strip() for s in m.group(1).split(",") if s.strip())
    return out


def read_schemas(df: DataFrame) -> list[str]:
    """ReadSchema strings per scan — the columns actually read."""
    return re.findall(r"ReadSchema: (struct<[^\n]*)", formatted_plan(df))


def scan_columns(df: DataFrame) -> list[set[str]]:
    cols = []
    for schema in read_schemas(df):
        inner = schema[len("struct<"):].rstrip(">")
        cols.append({part.split(":")[0].strip()
                     for part in inner.split(",") if ":" in part})
    return cols


def partition_filters(df: DataFrame) -> list[str]:
    """Partition predicates applied at the scan (hive-partition pruning) —
    files of non-matching partitions are never opened."""
    out: list[str] = []
    for m in re.finditer(r"PartitionFilters: \[([^\]]*)\]", formatted_plan(df)):
        out.extend(s.strip() for s in m.group(1).split(",") if s.strip())
    return out


def has_broadcast_join(df: DataFrame) -> bool:
    return "BroadcastHashJoin" in executed_plan(df)


def has_top_k(df: DataFrame) -> bool:
    return "TakeOrderedAndProject" in executed_plan(df)


def codegen_span_count(df: DataFrame) -> int:
    """Number of WholeStageCodegen spans (wider/fewer is better)."""
    return len(set(re.findall(r"codegen id : (\d+)", formatted_plan(df))))


def shuffle_count(df: DataFrame) -> int:
    """Shuffle Exchange operators in the plan — each is a full shuffle of
    its input; the first thing to check when a query misbehaves at scale.
    BroadcastExchange is excluded (it ships one small side, not a shuffle)."""
    plan = executed_plan(df)
    return plan.count("Exchange") - plan.count("BroadcastExchange")


def exchange_inputs(df: DataFrame) -> list[str]:
    """The input attribute list of every shuffle Exchange (formatted
    plan) — what actually CROSSES the wire. The cheapest scale audit:
    assert wide payload columns (document text, blobs, embeddings)
    never appear here."""
    fmt = formatted_plan(df)
    return re.findall(
        r"\(\d+\) Exchange\s*\nInput \[\d+\]: \[([^\]]*)\]", fmt)


def plan_report(df: DataFrame) -> dict:
    return {
        "pushed_filters": pushed_filters(df),
        "scan_columns": [sorted(c) for c in scan_columns(df)],
        "broadcast_join": has_broadcast_join(df),
        "top_k": has_top_k(df),
        "codegen_spans": codegen_span_count(df),
        "shuffles": shuffle_count(df),
    }
