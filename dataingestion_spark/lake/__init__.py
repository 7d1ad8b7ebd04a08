from dataingestion_spark.lake.table import (  # noqa: F401
    CommitConflictError,
    LakeTable,
    Snapshot,
)
from dataingestion_spark.lake.sync import (  # noqa: F401
    changes_to_batch,
    sync_incremental,
)
