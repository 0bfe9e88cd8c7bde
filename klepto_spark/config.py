"""Pipeline spec: the engine's configuration layer.

Mirrors the reference's config surface (reference: pkg/config/config.go:27-67):
``Matchers`` (named reusable predicates), per-table ``Filter`` (match / limit /
sorts), ``Relationships`` (FK restriction-join edges), ``Anonymise``
(column -> faker spec), ``IgnoreData``. Differences by design:

- Sorts are an *ordered list* (the reference iterates a Go map, making
  multi-key sort order nondeterministic — pkg/reader/engine/engine.go:158-160;
  SURVEY §4.3.1). TOML table order is preserved by tomllib, so we keep
  declaration order.
- Unknown anonymiser names fail at load time (the reference emits an
  "Invalid anonymiser: X" poison value at runtime —
  pkg/anonymiser/anonymiser.go:84-91; SURVEY §4.3.5).
"""

from __future__ import annotations

import tomllib
from dataclasses import dataclass, field
from pathlib import Path


@dataclass
class FilterSpec:
    """reference: pkg/config/config.go:47-55."""
    match: str = ""
    limit: int = 0
    sorts: list[tuple[str, str]] = field(default_factory=list)  # (column, 'asc'|'desc')

    def __post_init__(self) -> None:
        for col, direction in self.sorts:
            if direction.lower() not in ("asc", "desc"):
                raise ValueError(f"invalid sort direction {direction!r} for {col!r}")


@dataclass
class Relationship:
    """FK edge; empty ``table`` means the table being scanned
    (reference: pkg/config/config.go:57-67, default applied at
    pkg/reader/engine/engine.go:140-152)."""
    foreign_key: str
    referenced_table: str
    referenced_key: str
    table: str = ""


@dataclass
class TableSpec:
    """reference: pkg/config/config.go:33-45.

    ``cast_policy``: 'string' (default — anonymised columns become
    strings, the reference's behaviour: everything is dumped as SQL text)
    or 'keep' (cast faked output back to the source column type; a faker
    whose output can't parse into that type fails at plan time)."""
    name: str
    ignore_data: bool = False
    filter: FilterSpec = field(default_factory=FilterSpec)
    anonymise: dict[str, str] = field(default_factory=dict)  # column -> faker spec
    relationships: list[Relationship] = field(default_factory=list)
    cast_policy: str = "string"
    # free-text PII masking (engine extension): columns listed here run
    # the operators.pii rule set AFTER anonymise — emails/IPs/long digit
    # runs inside text bodies, where column-level fakers can't reach
    pii_redact: list[str] = field(default_factory=list)
    # parallel-scan tuning for JDBC sources (engine extension): None =
    # auto-derive from the integral PK; "" = force single-partition;
    # a column name = partition on it (JdbcCatalog.apply_read_overrides)
    partition_column: str | None = None
    read_partitions: int | None = None
    # 'uniform' = min/max stride bounds (Spark's native columnPartition);
    # 'histogram' = one GROUP-BY histogram probe, then quantile range
    # predicates — balanced partitions even on a hot-tail / sparse PK;
    # 'auto' = COUNT(*) rides the min/max probe and key-span sparsity
    # (span > 2x rows) picks histogram, else uniform
    stride_mode: str | None = None

    def __post_init__(self) -> None:
        if self.cast_policy not in ("string", "keep"):
            raise ValueError(
                f"invalid cast_policy {self.cast_policy!r} for table "
                f"{self.name!r} (expected 'string' or 'keep')")
        if self.stride_mode not in (None, "uniform", "histogram", "auto"):
            raise ValueError(
                f"invalid stride_mode {self.stride_mode!r} for table "
                f"{self.name!r} (expected 'uniform', 'histogram' or "
                "'auto')")


@dataclass
class Spec:
    matchers: dict[str, str] = field(default_factory=dict)
    tables: list[TableSpec] = field(default_factory=list)
    locale: str = "en"  # wordpack for locale-sensitive fakers

    def find_table(self, name: str) -> TableSpec | None:
        for t in self.tables:
            if t.name == name:
                return t
        return None

    def resolve_matcher(self, match: str) -> str:
        """Named-matcher substitution, case-insensitive fallback
        (reference: pkg/config/config.go:101-117)."""
        if not match:
            return match
        if match in self.matchers:
            return self.matchers[match]
        lowered = {k.lower(): v for k, v in self.matchers.items()}
        return lowered.get(match.lower(), match)


def _parse_table(raw: dict) -> TableSpec:
    filt = FilterSpec()
    if "Filter" in raw:
        f = raw["Filter"]
        sorts = [(col, str(d)) for col, d in f.get("Sorts", {}).items()]
        filt = FilterSpec(match=f.get("Match", ""), limit=int(f.get("Limit", 0)),
                          sorts=sorts)
    rels = [
        Relationship(
            foreign_key=r["ForeignKey"],
            referenced_table=r["ReferencedTable"],
            referenced_key=r["ReferencedKey"],
            table=r.get("Table", ""),
        )
        for r in raw.get("Relationships", [])
    ]
    return TableSpec(
        name=raw["Name"],
        ignore_data=bool(raw.get("IgnoreData", False)),
        filter=filt,
        anonymise=dict(raw.get("Anonymise", {})),
        relationships=rels,
        cast_policy=str(raw.get("CastPolicy", "string")),
        pii_redact=list(raw.get("PiiRedact", [])),
        partition_column=(str(raw["PartitionColumn"])
                          if "PartitionColumn" in raw else None),
        read_partitions=(int(raw["ReadPartitions"])
                         if "ReadPartitions" in raw else None),
        stride_mode=(str(raw["StrideMode"])
                     if "StrideMode" in raw else None),
    )


def load_spec(path: str | Path | None = None, text: str | None = None,
              validate_anonymisers: bool = True) -> Spec:
    """Load a TOML spec (same shape as the reference's .klepto.toml:
    fixtures/.klepto.toml:1-35). Matcher aliases in ``Filter.Match`` are
    resolved eagerly, as the reference does at config load."""
    if text is None:
        text = Path(path).read_text()
    raw = tomllib.loads(text)
    spec = Spec(matchers=dict(raw.get("Matchers", {})),
                tables=[_parse_table(t) for t in raw.get("Tables", [])],
                locale=str(raw.get("Locale", "en")))
    for t in spec.tables:
        t.filter.match = spec.resolve_matcher(t.filter.match)
    if validate_anonymisers:
        from klepto_spark.functions.anonymise import (
            FAKER_LOCALES, validate_spec)
        if spec.locale not in FAKER_LOCALES:
            raise ValueError(f"unknown Locale {spec.locale!r} "
                             f"(have {', '.join(FAKER_LOCALES)})")
        for t in spec.tables:
            for column, faker_spec in t.anonymise.items():
                validate_spec(faker_spec, context=f"{t.name}.{column}")
    return spec


SAMPLE_SPEC = """\
[Matchers]
  ActiveUsers = "users.active = TRUE"

[[Tables]]
  Name = "users"
  [Tables.Filter]
    Match = "ActiveUsers"
    Limit = 100
    [Tables.Filter.Sorts]
      created_at = "desc"
  [Tables.Anonymise]
    email = "EmailAddress"
    username = "FirstName"

[[Tables]]
  Name = "orders"
  [Tables.Filter]
    Match = "ActiveUsers"
  [[Tables.Relationships]]
    ForeignKey = "user_id"
    ReferencedTable = "users"
    ReferencedKey = "id"

[[Tables]]
  Name = "logs"
  IgnoreData = true
"""


def write_sample(path: str | Path, overwrite: bool = False) -> None:
    """``klepto init`` equivalent (reference: cmd/init.go:27-47,
    pkg/config/config.go:123-159): refuses to overwrite."""
    p = Path(path)
    if p.exists() and not overwrite:
        raise FileExistsError(f"{p} already exists")
    p.write_text(SAMPLE_SPEC)
