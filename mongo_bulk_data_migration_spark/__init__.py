"""PySpark-native CDC / incremental-ingest engine.

A from-scratch reimplementation of the *capabilities* of the reference
``360Learning/mongo-bulk-data-migration`` (a MongoDB bulk-migration library,
``/root/reference/src/index.ts:1-7``) re-expressed Spark-first:

- collections        -> snapshot-versioned, bucket-partitioned lake tables
                        (:mod:`.sources.laketable`)
- bulk update/delete -> key-partitioned MERGE (:mod:`.operators.merge`)
- rollback backups   -> changelog table with typed pre-images + snapshot
                        time-travel (:mod:`.plans.changelog`)
- FETCH_ALL resume   -> per-partition high-water marks (:mod:`.plans.hwm`)
- update callback    -> vectorized token transforms (:mod:`.functions.tokens`)

Public API mirrors the reference's exports
(``/root/reference/src/index.ts:1-7``).
"""

from .plans.migration import (
    DELETE_COLLECTION,
    DELETE_OPERATION,
    FETCH_ALL,
    NO_UPDATE,
    DataMigrationConfig,
    MigrationOptions,
)
from .plans.engine import MongoBulkDataMigrationSpark
from .sources.catalog import Catalog
from .sources.laketable import LakeTable

__all__ = [
    "MongoBulkDataMigrationSpark",
    "DataMigrationConfig",
    "MigrationOptions",
    "Catalog",
    "LakeTable",
    "DELETE_OPERATION",
    "DELETE_COLLECTION",
    "FETCH_ALL",
    "NO_UPDATE",
]

__version__ = "0.1.0"
