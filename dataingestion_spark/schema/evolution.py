"""Schema-evolution classifier and version state machine.

Reference parity (same algorithm, re-derived in Python over PySpark
StructTypes):

  * compareSchemas - classify old->new as NO_CHANGE / NON_BREAKING /
    BREAKING from (added, removed, modified) field sets
    (/root/reference/spark/src/main/scala/com/example/core/SchemaEvolution.scala:31-70).
  * widening lattice - Int->Long, Float->Double, Int->Double, Long->Double,
    anything->String compatible; nullable->non-nullable breaking
    (/root/reference/spark/src/main/scala/com/example/core/SchemaEvolution.scala:75-108).
  * handleSchemaEvolution - NO_CHANGE continue, NON_BREAKING evolve +
    continue, BREAKING fail fast
    (/root/reference/spark/src/main/scala/com/example/core/SchemaEvolution.scala:114-137).
  * version state machine - INITIAL -> v1 ACTIVE; NON_BREAKING -> old
    OBSOLETE + new ACTIVE v+1; BREAKING -> BLOCKED
    (/root/reference/metastore-java/src/main/java/com/example/metastore/service/DatasetService.java:204-264).
    Persisted as a JSON ledger by the lake table (lake/table.py) instead of
    Postgres rows.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from enum import Enum

from pyspark.sql import types as T


class ChangeType(str, Enum):
    NO_CHANGE = "NO_CHANGE"
    NON_BREAKING = "NON_BREAKING"
    BREAKING = "BREAKING"


class SchemaStatus(str, Enum):
    ACTIVE = "ACTIVE"
    PENDING = "PENDING"
    OBSOLETE = "OBSOLETE"
    BLOCKED = "BLOCKED"


class SchemaEvolutionError(RuntimeError):
    """Raised on a BREAKING change when fail-fast is enabled."""


# The widening lattice: (from, to) pairs that are compatible, mirroring
# SchemaEvolution.scala:94-108. `anything -> string` is handled separately.
_WIDENINGS: set[tuple[str, str]] = {
    ("integer", "long"),
    ("float", "double"),
    ("integer", "double"),
    ("long", "double"),
    ("short", "integer"),
    ("short", "long"),
    ("short", "double"),
    ("byte", "short"),
    ("byte", "integer"),
    ("byte", "long"),
    ("byte", "double"),
}


def is_compatible_type_change(old: T.DataType, new: T.DataType) -> bool:
    if old == new:
        return True
    if isinstance(new, T.StringType):
        return True  # anything -> string
    return (old.typeName(), new.typeName()) in _WIDENINGS


def is_compatible_field_change(old: T.StructField, new: T.StructField) -> bool:
    """Type must widen (or be equal); nullable -> non-nullable is breaking,
    the reverse is fine (SchemaEvolution.scala:75-88)."""
    if old.nullable and not new.nullable:
        return False
    return is_compatible_type_change(old.dataType, new.dataType)


@dataclass
class SchemaComparison:
    change_type: ChangeType
    added: list[str] = field(default_factory=list)
    removed: list[str] = field(default_factory=list)
    modified: list[str] = field(default_factory=list)  # common fields whose change is compatible (widenings)
    incompatible: list[str] = field(default_factory=list)  # common fields whose change is breaking

    def describe(self) -> str:
        return (
            f"{self.change_type.value}"
            f" added={self.added} removed={self.removed}"
            f" widened={self.modified} incompatible={self.incompatible}"
        )


def compare_schemas(old: T.StructType, new: T.StructType) -> SchemaComparison:
    """Classify old->new. Field order is irrelevant (set semantics,
    SchemaEvolution.scala:39-41)."""
    old_fields = {f.name: f for f in old.fields}
    new_fields = {f.name: f for f in new.fields}
    added = sorted(set(new_fields) - set(old_fields))
    removed = sorted(set(old_fields) - set(new_fields))
    modified: list[str] = []
    incompatible: list[str] = []
    for name in sorted(set(old_fields) & set(new_fields)):
        of, nf = old_fields[name], new_fields[name]
        if of.dataType == nf.dataType and of.nullable == nf.nullable:
            continue
        if is_compatible_field_change(of, nf):
            modified.append(name)
        else:
            incompatible.append(name)

    # Removed fields and incompatible modifications are breaking; added
    # nullable fields and widenings are non-breaking. An added
    # NON-nullable field is breaking (existing rows cannot satisfy it).
    added_non_nullable = [n for n in added if not new_fields[n].nullable]
    if removed or incompatible or added_non_nullable:
        ct = ChangeType.BREAKING
    elif added or modified:
        ct = ChangeType.NON_BREAKING
    else:
        ct = ChangeType.NO_CHANGE
    return SchemaComparison(ct, added, removed, modified, incompatible)


def merge_schemas(old: T.StructType, new: T.StructType) -> T.StructType:
    """The evolved schema after a NON_BREAKING change: old field order
    preserved (with widened types where modified), added fields appended in
    new-schema order, everything nullable-preserving."""
    new_fields = {f.name: f for f in new.fields}
    out: list[T.StructField] = []
    for f in old.fields:
        nf = new_fields.get(f.name)
        if nf is not None and nf.dataType != f.dataType:
            out.append(T.StructField(f.name, nf.dataType, True))
        else:
            out.append(f)
    old_names = {f.name for f in old.fields}
    for f in new.fields:
        if f.name not in old_names:
            out.append(T.StructField(f.name, f.dataType, True))
    return T.StructType(out)


def schema_from_json(text: str) -> T.StructType:
    return T.StructType.fromJson(__import__("json").loads(text))


def schema_to_json(schema: T.StructType) -> str:
    return schema.json()
