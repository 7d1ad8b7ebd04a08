"""transcript-cdc-engine: a from-scratch PySpark-native CDC / incremental
ingest engine (binlog/WAL tail -> lake upsert) with the capabilities of the
reference Kafka->Lakehouse platform surveyed in SURVEY.md.

Layout:
  lake/       snapshot-isolated copy-on-write bucketed Parquet lake table
              (MERGE, time travel, epoch markers, schema ledger)
  operators/  LWW dedup, merge planning, skew salting, dedup/similarity/
              text-analysis operators for training-data pipelines
  functions/  column-expression helpers + the pluggable Transformer chain
  schema/     schema-evolution classifier (widening lattice, fail-fast)
  streaming/  Structured Streaming pipelines, exactly-once epoch markers,
              lineage/metrics
  sources/    change-log readers + deterministic synthetic datagen
"""

__version__ = "0.1.0"
