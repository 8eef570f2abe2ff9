"""A from-scratch PySpark-native CDC / incremental-ingest engine with the
capture semantics of the Debezium Cassandra connector (reference studied in
SURVEY.md; /root/reference, read-only).

Not a port: the reference is a threaded Java daemon pushing one mutation at a
time through handler -> queue -> Kafka emitter. This engine is set-oriented and
columnar: commit-log segments are rows of a partitioned Parquet ``mutation_log``
table; decode/classify/envelope are Catalyst column expressions; per-key
ordering is replaced by an order-insensitive cell-level last-writer-wins
reduction (groupBy + max_by); the Kafka sink is replaced by an idempotent
copy-on-write MERGE into a bucketed lakehouse table with a checkpointed offsets
table for exactly-once resume.

Layout
------
- ``model``          envelope / mutation-log / transcript schemas (SURVEY §1)
- ``sources``        mutation-log scan + segment planning, deterministic generator (S1-S5)
- ``functions``      decode + classification expressions, text/embedding functions (D1-D13)
- ``operators``      dedup, LWW reduce, tombstone apply, merge, data-pipeline ops (R1-R6)
- ``plans``          batch apply plan: decode -> dedup -> reduce -> merge (§3 lifecycle)
- ``streaming``      micro-batch runner, offsets/lineage/metrics checkpointing (R5, R7-R10)
- ``lake``           mini copy-on-write table format (versioned manifest, atomic
                     commit, schema evolution) standing in for Iceberg
"""

__version__ = "0.1.0"
