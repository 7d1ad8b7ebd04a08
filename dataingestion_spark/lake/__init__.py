from dataingestion_spark.lake.table import (  # noqa: F401
    CommitConflictError,
    LakeTable,
    Snapshot,
)
