from .migration import (
    DELETE_COLLECTION,
    DELETE_OPERATION,
    FETCH_ALL,
    NO_UPDATE,
    DataMigrationConfig,
    MigrationOptions,
    BulkOperationResult,
)
from .engine import MongoBulkDataMigrationSpark

__all__ = [
    "MongoBulkDataMigrationSpark",
    "DataMigrationConfig",
    "MigrationOptions",
    "BulkOperationResult",
    "DELETE_OPERATION",
    "DELETE_COLLECTION",
    "FETCH_ALL",
    "NO_UPDATE",
]
