"""klepto_spark — a PySpark-native data copy / anonymisation / analytics engine.

A brand-new engine with the query and data-processing capabilities of
hellofresh/klepto (reference: /root/reference), re-expressed Spark-first:

- config-driven per-table pipelines: scan -> FK-restriction join -> filter ->
  sort -> limit -> per-column anonymise -> sink
  (reference dataflow: pkg/dumper/engine/engine.go:75-144,
   query grammar: pkg/reader/engine/engine.go:136-167)
- a deterministic, seedable anonymiser registry covering the reference's full
  faker surface (pkg/anonymiser/fake.go:11-102), implemented as built-in
  Spark SQL expressions (JVM-side, whole-stage-codegen friendly) rather than
  Python UDFs
- large-scale training-data-pipeline extensions: dedup (exact/MinHash-LSH/
  SimHash/ngram-Jaccard/embedding-cosine), similarity search, text analysis,
  multimodal column plumbing
"""

__version__ = "0.1.0"

from klepto_spark.config import Spec, TableSpec, FilterSpec, Relationship, load_spec
from klepto_spark.session import get_spark


def steal(*args, **kwargs):
    """See :func:`klepto_spark.engine.steal` (lazy import: keeps bare
    ``import klepto_spark`` free of sink/engine imports)."""
    from klepto_spark.engine import steal as _steal
    return _steal(*args, **kwargs)


def connect(*args, **kwargs):
    """See :func:`klepto_spark.sources.catalog.connect`."""
    from klepto_spark.sources.catalog import connect as _connect
    return _connect(*args, **kwargs)


def steal_incremental(*args, **kwargs):
    """See :func:`klepto_spark.incremental.steal_incremental`."""
    from klepto_spark.incremental import steal_incremental as _si
    return _si(*args, **kwargs)


def steal_cdc(*args, **kwargs):
    """See :func:`klepto_spark.incremental.steal_cdc`."""
    from klepto_spark.incremental import steal_cdc as _sc
    return _sc(*args, **kwargs)


__all__ = [
    "Spec",
    "TableSpec",
    "FilterSpec",
    "Relationship",
    "load_spec",
    "get_spark",
    "steal",
    "steal_incremental",
    "steal_cdc",
    "connect",
]
