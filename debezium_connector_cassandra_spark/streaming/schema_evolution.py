"""R9 — mid-stream schema evolution replay.

Reference: driver DDL callbacks mutate the SchemaHolder so later mutations
decode with the new shape (Cassandra4SchemaChangeListener.onTableUpdated:
220-260, onTableCreated:114-159; scenario SchemaChangeListenerTest.java:
34-61 — ALTER TABLE ADD between two mutations changes subsequent events).

Spark formulation (FIXTURES F4): a ``schema_changes`` ledger
(schema_version, ddl, effective_segment); before applying a batch that
contains segments at or past a change's effective_segment, the change is
replayed onto the lake table as a metadata-only ADD COLUMN. Old files read
NULL for the new column; envelopes carrying the new cell merge normally
because the whole apply path is schema-driven (payload columns are
introspected per batch, operators/lww.py).
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import types as T

_DDL_TYPES = {
    "string": T.StringType(),
    "int": T.IntegerType(),
    "long": T.LongType(),
    "bigint": T.LongType(),
    "double": T.DoubleType(),
    "boolean": T.BooleanType(),
    "timestamp": T.TimestampType(),
}


@dataclass(frozen=True)
class SchemaChange:
    schema_version: int
    ddl: str              # "ADD COLUMN <name> <type>" | "ALTER COLUMN <name> <type>"
    effective_segment: int

    def parse(self) -> tuple[str, str, T.DataType]:
        """-> (op, column, spark type); op in {'add', 'alter'}.

        Types accept the engine shorthand (_DDL_TYPES) or any Cassandra DDL
        type string (functions/types.py TypeMapper) — so ``ADD COLUMN tags
        set<text>`` works. Reference DDL surface:
        Cassandra4SchemaChangeListener.onTableUpdated:220-260 (add + alter
        type), the alter-type path being Cassandra's own restriction to
        compatible changes."""
        parts = self.ddl.split(None, 3)
        if len(parts) != 4 or parts[1].upper() != "COLUMN":
            raise ValueError(f"unsupported ddl: {self.ddl!r}")
        op = parts[0].upper()
        if op not in ("ADD", "ALTER"):
            raise ValueError(f"unsupported ddl: {self.ddl!r}")
        name, type_name = parts[2], parts[3].strip().lower()
        if type_name in _DDL_TYPES:
            dtype = _DDL_TYPES[type_name]
        else:
            from ..functions.types import TypeMapper

            dtype = TypeMapper().spark_type(type_name)
        return op.lower(), name, dtype


def replay_schema_changes(target, changes: list[SchemaChange], up_to_segment: int) -> list[str]:
    """Apply all changes effective at or before ``up_to_segment`` to the lake
    target. Idempotent (ADD of an existing column / ALTER to the current type
    are no-ops), so crash/replay around a schema change is safe. Returns
    applied column names."""
    applied = []
    for ch in sorted(changes, key=lambda c: c.schema_version):
        if ch.effective_segment <= up_to_segment:
            op, name, dtype = ch.parse()
            if op == "add":
                target.add_payload_column(name, dtype)
            else:
                target.alter_payload_column(name, dtype)
            applied.append(name)
    return applied
