"""LakeTable: a from-scratch snapshot-isolated, bucketed, copy-on-write
Parquet lake table with keyed MERGE - the engine's sink.

The reference reaches these semantics through Hudi copy-on-write upsert
(/root/reference/spark/src/main/scala/com/example/Phase2Job.scala:137-145,
options /root/reference/spark/src/main/scala/com/example/core/SparkUtils.scala:131-146);
the north rule re-targets them at Iceberg MERGE INTO. This sandbox ships no
Iceberg/Hudi runtime jars, so the table format itself is built here from
first principles - the same ideas Iceberg uses (file-level manifests,
atomic snapshot commits, hidden bucket partitioning, schema evolution by
metadata, commit properties for exactly-once markers), in ~one file of
driver-side Python around pure DataFrame ops:

  table_root/
    _meta/snapshots/v<N>.json   immutable snapshot manifests; commit =
                                O_EXCL create of the next version (atomic,
                                optimistic - a losing concurrent writer
                                gets CommitConflictError, nothing partial)
    data/<commit-uuid>/_pb=<bucket>/part-*.parquet
                                immutable data files; a snapshot references
                                the exact file list per bucket, so readers
                                NEVER list directories (object-store-scale
                                friendly) and time travel is free

Scale design points (10^10-event replay, SURVEY.md §4/§7):

  * Hidden bucket partitioning: every row is assigned
    ``_bucket = pmod(xxhash64(conv_id), num_buckets)``. A MERGE touches
    only the buckets present in the change batch - bucket pruning bounds
    the copy-on-write rewrite to touched data, independent of table size.
  * The MERGE's probe of batch-vs-table is a single full-outer equi-join
    on the primary key over *touched buckets only*; AQE handles residual
    skew and the write side is explicitly salted for hot conversations
    (operators/salting.py) so no single reducer owns a hot bucket.
  * Late/duplicate events: the table persists ``_lsn`` per row and MERGE
    only lets a source row win when ``s.lsn >= t._lsn``; deletes write
    tombstones (``_deleted = true``) rather than removing rows, so an
    out-of-order event older than an applied DELETE cannot resurrect the
    key across epochs (SURVEY.md §7.3 "deletes + late arrivals").
    ``compact()`` purges tombstones once the stream is past them.
  * Exactly-once: each snapshot carries ``pipelines: {id: last_epoch}``;
    re-running an epoch (foreachBatch is at-least-once) is detected and
    skipped (reference design /root/reference/artifacts/lld/LLD.md:386).
  * Schema evolution by metadata only: NON_BREAKING changes merge the
    schema in the snapshot; old files are never rewritten (missing columns
    read as null, widened ints read under the wider type - both native to
    Spark 4's Parquet reader). BREAKING changes fail fast and are recorded
    BLOCKED in the schema ledger (schema/evolution.py).
"""

from __future__ import annotations

import datetime
import json
import os
import re
import shutil
import threading
import time
import uuid
from collections import OrderedDict
from dataclasses import dataclass, field
from pathlib import Path

from pyspark.sql import Column, DataFrame, Observation, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

from dataingestion_spark.operators.lww import lww_dedupe
from dataingestion_spark.operators.salting import SALT_COL, with_salt
from dataingestion_spark.schema.evolution import (
    ChangeType,
    SchemaEvolutionError,
    SchemaStatus,
    compare_schemas,
    is_compatible_type_change,
    merge_schemas,
)

BUCKET_COL = "_bucket"
LSN_COL = "_lsn"
DELETED_COL = "_deleted"
DELTA_SEQ_COL = "_seq"  # commit ordinal stamped into MOR delta files
PARTIAL_COL = "_partial"  # MOR delta rows that are per-column overlays
_OP_COL = "_op"  # transient: change op carried through _conform for partial
_PARTITION_DIR_COL = "_pb"  # physical partition dir; _bucket stays a data column
SYSTEM_COLS = [LSN_COL, DELETED_COL, BUCKET_COL]


class CommitConflictError(RuntimeError):
    """Another writer committed the same snapshot version first."""


# Serializes the merge's session-conf tuned window (AQE off + pinned shuffle
# partitions for small epochs). Spark has no per-query AQE toggle, so the
# tuning necessarily goes through session-global conf; without coordination
# a concurrent merge could capture the OTHER merge's overrides as "session
# values" and restore them permanently. The lock makes conf save/restore
# race-free: exactly one merge holds the tuned window at a time, and a
# merge that finds the lock taken simply runs UNDER THE SESSION CONF
# (correct, marginally slower for small epochs) instead of waiting.
# Caveat (documented contract): while a holder has AQE off, unrelated
# queries planned concurrently on the same SparkSession also plan with AQE
# off - a perf effect only, never correctness. Pipelines that need full
# isolation should use one SparkSession per pipeline.
_TUNE_LOCK = threading.Lock()

# Branch names: no dashes (the snapshot filename grammar B-<name>-v<N>.json
# must parse unambiguously), no path separators.
_BRANCH_NAME_RE = re.compile(r"^[A-Za-z0-9_.]+$")


@dataclass
class Snapshot:
    version: int
    parent: int | None
    schema_json: dict
    schema_version: int
    num_buckets: int
    pk_fields: list[str]
    order_fields: list[str]
    # bucket (as str) -> table-relative file paths. In-memory view; on disk
    # each bucket's lists live in a per-bucket MANIFEST file referenced by
    # manifest_refs, so a commit touching k of N buckets writes k manifest
    # files and the snapshot json - never a full file-list rewrite
    # (Iceberg's manifest-list model; at 100 TB the untouched buckets'
    # metadata is shared structurally across snapshots).
    files: dict[str, list[str]] = field(default_factory=dict)
    properties: dict = field(default_factory=dict)
    operation: str = "create"
    summary: dict = field(default_factory=dict)
    committed_at: float = 0.0
    # merge-on-read delta files per bucket (Hudi-MOR analog): rows here
    # override base rows by LWW on (_lsn, ts) at read time; compact() folds
    # them into the base. Empty for pure copy-on-write tables.
    deltas: dict[str, list[str]] = field(default_factory=dict)
    # bucket (as str) -> table-relative manifest path (persisted form)
    manifest_refs: dict[str, str] = field(default_factory=dict)
    # chain this snapshot belongs to ("main" or a WAP branch name); legacy
    # snapshot jsons lack the field and load as main
    branch: str = "main"

    @property
    def schema(self) -> T.StructType:
        return T.StructType.fromJson(self.schema_json)

    def to_json(self) -> str:
        """Persisted form: per-bucket lists are externalized to manifest
        files (manifest_refs), keeping the snapshot json O(buckets)."""
        d = dict(self.__dict__)
        d.pop("files")
        d.pop("deltas")
        return json.dumps(d, indent=1, sort_keys=True)

    @classmethod
    def from_json(cls, text: str) -> "Snapshot":
        return cls(**json.loads(text))


def bucket_expr(key_col: str, num_buckets: int, key_type: T.DataType | None = None):
    """Hidden-partitioning transform: pmod(xxhash64(key), N), the analog of
    Iceberg's bucket(N, col).

    ``key_type`` pins the hashed physical type. xxhash64 hashes int and long
    inputs differently, so every bucket computation over a table's pk MUST
    cast to the table schema's resolved pk type first - otherwise a batch
    arriving with a narrower pk type (pre-widening) lands rows in different
    buckets than the conformed winners, and a copy-on-write commit that
    trusts the pre-scan would silently drop them."""
    col = F.col(key_col)
    if key_type is not None:
        col = col.cast(key_type)
    return F.pmod(F.xxhash64(col), F.lit(num_buckets)).cast("int")


class LakeTable:
    """Handle to one lake table rooted at a directory."""

    # Below this many change events per epoch, merge jobs run with AQE off
    # and shuffle partitions pinned to the bucket count: AQE's per-stage
    # shuffle materialization + re-planning adds several fixed-latency jobs
    # per epoch, which dominates micro-batch apply (measured ~1.6x on 250k
    # event epochs at local[32]) while buying nothing - skew is already
    # handled by explicit salting, and a small batch cannot produce the
    # oversized partitions AQE exists to split. Large epochs keep the
    # session's AQE/partition settings: there the materialization cost
    # amortizes and runtime coalesce/skew-split earn their keep.
    SMALL_EPOCH_EVENTS = 20_000_000

    # COW broadcast-probe merge (the local analog of Iceberg's
    # storage-partitioned join, SCALE.md "COW join shuffles the table
    # side"): when no bucket's batch slice exceeds this many pre-LWW
    # rows, the merge streams the table side through broadcast hash
    # joins instead of shuffling it - zero Exchange over current table
    # rows. Touched buckets are processed in groups whose combined batch
    # slice stays under the budget, so the per-group broadcast is
    # executor-memory-sized at ANY epoch size; a single bucket over
    # budget falls back to the shuffle plans.
    BROADCAST_MERGE_ENABLED = True
    BROADCAST_GROUP_EVENTS = 1_000_000

    # The broadcast-probe plan trades the table-side shuffle for extra
    # fixed-latency jobs (winner broadcast + presence probe), so it pays
    # exactly when the table side DWARFS the batch - the steady-state
    # ingest regime (measured: ~0.9x at table/batch ~1.3 during a
    # from-scratch replay, >1x once the table outgrows the epoch).
    # Engage only when the touched buckets' base rows (exact, from the
    # stats sidecars) are at least this multiple of the batch.
    BROADCAST_TABLE_BATCH_RATIO = 4.0

    # Adaptive COW plan choice. Whether the broadcast-probe plan beats
    # the one-exchange shuffle plan is a property of the TOPOLOGY, not
    # the data: on a network-bound cluster the avoided table-side
    # exchange dominates; on a shuffle-cheap single box (tmpfs shuffle,
    # shared-memory "network") the broadcast plan's extra fixed-latency
    # jobs + second table scan make it measurably slower (soak A/B at
    # 4M-row table / 250k-event epochs: 36.8k eps broadcast vs 86.4k
    # shuffle). No static gate can know which side it is on, so in the
    # eligible regime the merge PROBES each plan once, records its
    # measured events/s in the snapshot properties (EWMA, survives
    # restarts), exploits the faster one, and re-probes the loser every
    # COW_PLAN_REPROBE_EVERY eligible epochs to track environment drift.
    # The FIRST eligible epoch always runs the broadcast plan (the
    # cluster-scale design choice wins ties and keeps the decision
    # deterministic for tests). Set False to pin the broadcast plan
    # whenever eligible (the pre-adaptive behavior).
    COW_PLAN_ADAPTIVE = True
    COW_PLAN_REPROBE_EVERY = 64
    COW_PLAN_EWMA = 0.5

    # Absolute floor for hot-key salting. Salting exists to split
    # PHYSICALLY oversized shuffle partitions and write files; whether a
    # key needs it is a property of its row volume, not its share of the
    # batch. A fractional-only threshold mis-fires on micro-batches: in a
    # 1,000-event steady-state epoch a 5% threshold salts 50-row keys -
    # pure plan overhead (and it vetoes the broadcast-probe COW plan in
    # exactly the regime that plan targets). 100k transcript rows is
    # single-digit MB - far below any executor partition or file-size
    # budget - so a key is hot only when it holds BOTH >= threshold of
    # the batch AND at least this many rows. At 10^10-event replay scale
    # the floor is invisible (an 8M-event epoch's 5% is 400k rows); it
    # only silences salting where salting cannot help.
    HOT_KEY_MIN_ROWS = 100_000

    # Bounded snapshot cache: a long-running apply stream commits one
    # snapshot per epoch, and each internalized Snapshot holds every
    # bucket's file list - an unbounded cache leaks driver memory
    # O(epochs x buckets x files) over thousands of epochs, undermining the
    # O(buckets) manifest design. An LRU of the latest few versions keeps
    # the hot path (current snapshot re-read per epoch) cached while old
    # epochs age out; history()/time-travel re-reads evicted manifests from
    # disk, which is what they cost on a fresh handle anyway.
    SNAP_CACHE_SIZE = 8

    def __init__(
        self, spark: SparkSession, root: str | Path, branch: str = "main"
    ):
        self.spark = spark
        self.root = Path(root)
        # Which snapshot CHAIN this handle reads and commits to. "main" is
        # the published table; any other name is a WAP branch created by
        # create_branch() - same root, same manifests/data files, its own
        # version files (B-<name>-v*.json). Every read/write entry point
        # resolves heads through _snapshot_path/current_version, so the
        # whole API (merge/append/DML/compact/rollback/time travel/
        # changelog/epoch markers) is branch-scoped for free.
        if branch != "main" and not _BRANCH_NAME_RE.match(branch):
            raise ValueError(
                f"invalid branch name {branch!r}: use [A-Za-z0-9_.]+ "
                "(no dashes)"
            )
        self.branch_name = branch
        # snapshots are immutable once committed - LRU-cache internalized
        # (manifest-resolved) snapshots per version for this handle
        self._snap_cache: OrderedDict[int, Snapshot] = OrderedDict()
        # per-commit-dir stats sidecars (file-level min/max), also bounded
        self._stats_cache: dict[str, dict] = {}

    # ------------------------------------------------------------------
    # metadata plumbing
    # ------------------------------------------------------------------
    @property
    def _snap_dir(self) -> Path:
        return self.root / "_meta" / "snapshots"

    def _snapshot_path(self, version: int) -> Path:
        if self.branch_name == "main":
            return self._snap_dir / f"v{version:012d}.json"
        return self._snap_dir / f"B-{self.branch_name}-v{version:012d}.json"

    @property
    def _snap_pattern(self) -> str:
        """Glob for THIS handle's chain: branch files start with "B-" so
        the main pattern ("v*.json") never matches them and vice versa."""
        if self.branch_name == "main":
            return "v*.json"
        return f"B-{self.branch_name}-v*.json"

    @staticmethod
    def _snap_version(p: Path) -> int:
        """Version number from a snapshot filename of either chain."""
        return int(p.stem.rsplit("v", 1)[1])

    def retained_versions(self) -> list[int]:
        """Sorted versions still retained on this handle's chain."""
        return sorted(
            self._snap_version(p)
            for p in self._snap_dir.glob(self._snap_pattern)
        )

    def exists(self) -> bool:
        return self._snap_dir.is_dir() and any(
            self._snap_dir.glob(self._snap_pattern)
        )

    def current_version(self) -> int:
        versions = [
            self._snap_version(p)
            for p in self._snap_dir.glob(self._snap_pattern)
        ]
        if not versions:
            raise FileNotFoundError(
                f"no snapshots under {self.root} (branch {self.branch_name!r})"
            )
        return max(versions)

    def _cache_put(self, version: int, snap: Snapshot) -> None:
        self._snap_cache[version] = snap
        self._snap_cache.move_to_end(version)
        while len(self._snap_cache) > self.SNAP_CACHE_SIZE:
            self._snap_cache.popitem(last=False)

    def snapshot(self, version: int | str | None = None) -> Snapshot:
        if isinstance(version, str):
            version = self.resolve_tag(version)
        v = self.current_version() if version is None else version
        if v in self._snap_cache:
            self._snap_cache.move_to_end(v)
            return self._snap_cache[v]
        d = json.loads(self._snapshot_path(v).read_text())
        # legacy inline form carried files/deltas in the snapshot json
        inline_files = d.pop("files", None)
        inline_deltas = d.pop("deltas", None)
        snap = Snapshot(**d)
        if snap.manifest_refs:
            for b, ref in snap.manifest_refs.items():
                files, deltas = self._resolve_manifest(ref)
                if files:
                    snap.files[b] = files
                if deltas:
                    snap.deltas[b] = deltas
        else:
            snap.files = inline_files or {}
            snap.deltas = inline_deltas or {}
        self._cache_put(v, snap)
        return snap

    def version_as_of(self, ts) -> int:
        """Latest committed version whose commit time is <= ``ts`` - the
        Iceberg ``TIMESTAMP AS OF`` resolution step. ``ts`` is unix
        seconds or a datetime (naive = local time, matching
        ``committed_at``'s time.time() base). Raises when ``ts`` predates
        the oldest RETAINED snapshot (an expired version cannot be read,
        so resolving to it would lie) or no snapshot exists yet.

        O(retained versions) driver-side metadata reads - an admin/read
        entry point, never on the ingest hot path (same cost class as
        Iceberg scanning its metadata log)."""
        import datetime as _dt

        if isinstance(ts, _dt.datetime):
            ts = ts.timestamp()
        ts = float(ts)
        best: Snapshot | None = None
        oldest: Snapshot | None = None
        for snap in self.history():
            if oldest is None or snap.version < oldest.version:
                oldest = snap
            if snap.committed_at <= ts and (
                best is None or snap.version > best.version
            ):
                best = snap
        if best is None:
            if oldest is None:
                raise ValueError("table has no snapshots")
            raise ValueError(
                f"as-of {ts} predates the oldest retained snapshot "
                f"(v{oldest.version} @ {oldest.committed_at}); earlier "
                "history has been expired"
            )
        return best.version

    def history(self) -> list[Snapshot]:
        return [self.snapshot(v) for v in self.retained_versions()]

    # ------------------------------------------------------------------
    # snapshot tags (Iceberg tag analog): named, expiry-protected versions
    # ------------------------------------------------------------------
    # The training-data use case: "dataset release v1" pins the exact
    # snapshot a corpus was cut from, readable forever by name
    # (read(version="release-1")) and immune to expire_snapshots until the
    # tag is dropped. Stored as one JSON map name->version; writes go
    # through tmp+rename (atomic vs readers). Tagging is a maintenance
    # operation - concurrent tag() calls are last-writer-wins on the map,
    # like Iceberg's tag DDL under a single catalog writer.

    @property
    def _tags_path(self) -> Path:
        return self.root / "_meta" / "tags.json"

    def _tags_raw(self) -> dict:
        """All tags across every chain, as stored: name -> {"version",
        "branch"} (legacy int values read as main-chain tags)."""
        p = self._tags_path
        raw = json.loads(p.read_text()) if p.is_file() else {}
        return {
            n: (
                e
                if isinstance(e, dict)
                else {"version": int(e), "branch": "main"}
            )
            for n, e in raw.items()
        }

    def tags(self) -> dict[str, int]:
        """Tags of THIS handle's chain only (name -> version). Tags are
        chain-scoped: version numbers are only meaningful within one
        snapshot chain, so a tag minted on a WAP branch must never
        resolve against main's snapshot of the same number (and vice
        versa). Chain scoping also keeps expire_snapshots' tag
        protection exact - each chain's expiry honors its own tags."""
        return {
            n: int(e["version"])
            for n, e in self._tags_raw().items()
            if e.get("branch", "main") == self.branch_name
        }

    def resolve_tag(self, name: str) -> int:
        all_tags = self._tags_raw()
        if name not in all_tags:
            raise KeyError(
                f"unknown tag {name!r} (have: {sorted(all_tags) or 'none'})"
            )
        entry = all_tags[name]
        chain = entry.get("branch", "main")
        if chain != self.branch_name:
            raise ValueError(
                f"tag {name!r} was created on chain {chain!r} and cannot "
                f"resolve from a {self.branch_name!r} handle: v"
                f"{entry['version']} names a DIFFERENT snapshot there; "
                f"use branch({chain!r}) to read the tagged state"
                if chain != "main"
                else f"tag {name!r} belongs to the main chain; use the "
                "main-table handle to read it"
            )
        return int(entry["version"])

    def _write_tags(self, tags: dict[str, int]) -> None:
        tmp = self._tags_path.with_suffix(f".{uuid.uuid4().hex[:8]}.tmp")
        tmp.write_text(json.dumps(tags, sort_keys=True))
        tmp.replace(self._tags_path)

    def _own_tag_entry(self, tags: dict, name: str, verb: str) -> None:
        """Refuse to retarget/remove a tag another chain owns: the tag
        map is name-global, and resolve_tag's cross-chain refusal would
        be hollow if a branch handle could silently overwrite (or drop)
        main's 'release-1' - stripping its expire_snapshots shield."""
        entry = tags.get(name)
        if entry is None:
            return
        chain = (
            entry.get("branch", "main") if isinstance(entry, dict) else "main"
        )
        if chain != self.branch_name:
            raise ValueError(
                f"cannot {verb} tag {name!r}: it belongs to chain "
                f"{chain!r}, not {self.branch_name!r}; use a handle on "
                "that chain (tag names are table-global)"
            )

    def tag(self, name: str, version: int | None = None) -> int:
        """Pin ``version`` (default: current) under ``name``. The version
        must still be retained; re-tagging an existing name repoints it
        (same-chain only - see :meth:`_own_tag_entry`)."""
        v = self.current_version() if version is None else int(version)
        if not self._snapshot_path(v).is_file():
            raise FileNotFoundError(f"cannot tag v{v}: snapshot not retained")
        tags = self._tags_raw()
        self._own_tag_entry(tags, name, "retag")
        tags[name] = {"version": v, "branch": self.branch_name}
        self._write_tags(tags)
        return v

    def drop_tag(self, name: str) -> None:
        tags = self._tags_raw()
        self._own_tag_entry(tags, name, "drop")
        tags.pop(name, None)
        self._write_tags(tags)

    # ------------------------------------------------------------------
    # branches (Iceberg branch / write-audit-publish analog)
    # ------------------------------------------------------------------
    # The WAP pattern a production CDC pipeline runs before exposing data
    # to consumers: stage one or more commits on a BRANCH (same table
    # root, its own snapshot chain), run audits against the branch head
    # (row counts, constraint scans, oracle diffs), then PUBLISH the
    # audited state to main as one atomic metadata-only commit - or drop
    # the branch and let vacuum reclaim its files. Iceberg spells this
    # spark.wap.branch + fast_forward; the mechanics here are the same:
    # branch snapshots live beside main's in _meta/snapshots as
    # B-<name>-v<N>.json, share ALL manifests/data files structurally,
    # and every LakeTable entry point works on a branch handle because
    # head resolution goes through _snapshot_path/current_version.
    #
    # Fork and publish are both O(buckets) metadata ops - no data file is
    # read, rewritten, or moved at ANY table size. Publish is guarded:
    # it refuses when main advanced past the fork point (the audit
    # validated a state that no longer exists; re-fork and re-audit).
    # Epoch markers ride along deliberately - a stream that staged epochs
    # on the branch is, after publish, exactly-once against main too.

    def branches(self) -> dict[str, int]:
        """Map of branch name -> head version (retained chains only)."""
        heads: dict[str, int] = {}
        for p in self._snap_dir.glob("B-*-v*.json"):
            name, _, vs = p.stem[2:].rpartition("-v")
            v = int(vs)
            if heads.get(name, -1) < v:
                heads[name] = v
        return heads

    def branch(self, name: str) -> "LakeTable":
        """Handle for an existing branch's chain."""
        bh = LakeTable(self.spark, self.root, branch=name)
        if not bh.exists():
            raise KeyError(
                f"unknown branch {name!r} "
                f"(have: {sorted(self.branches()) or 'none'})"
            )
        return bh

    def create_branch(
        self, name: str, at_version: int | str | None = None
    ) -> "LakeTable":
        """Fork a branch off this chain at ``at_version`` (default: head)
        and return its handle. Metadata-only: the fork snapshot SHARES the
        source's manifest refs, so no manifest, chunk, or data file is
        written. The fork base is recorded in snapshot properties
        (surviving branch-side expiry) for publish's guard."""
        if name == "main":
            raise ValueError("'main' is the published chain, not a branch")
        if not _BRANCH_NAME_RE.match(name):
            raise ValueError(
                f"invalid branch name {name!r}: use [A-Za-z0-9_.]+ (no dashes)"
            )
        if any(self._snap_dir.glob(f"B-{name}-v*.json")):
            raise ValueError(f"branch {name!r} already exists")
        src = self.snapshot(
            self.resolve_tag(at_version)
            if isinstance(at_version, str)
            else at_version
        )
        props = json.loads(json.dumps(src.properties))
        props["branch_base"] = {"chain": self.branch_name, "version": src.version}
        fork = Snapshot(
            version=src.version,
            parent=src.parent,
            schema_json=json.loads(json.dumps(src.schema_json)),
            schema_version=src.schema_version,
            num_buckets=src.num_buckets,
            pk_fields=list(src.pk_fields),
            order_fields=list(src.order_fields),
            files={k: list(v) for k, v in src.files.items()},
            properties=props,
            operation="fork",
            summary={"forked_from": f"{self.branch_name}@{src.version}"},
            deltas={k: list(v) for k, v in src.deltas.items()},
            manifest_refs=dict(src.manifest_refs),
            committed_at=time.time(),
            branch=name,
        )
        bh = LakeTable(self.spark, self.root, branch=name)
        path = bh._snapshot_path(fork.version)
        try:
            fd = os.open(path, os.O_CREAT | os.O_EXCL | os.O_WRONLY)
        except FileExistsError as e:  # raced create_branch(same name)
            raise ValueError(f"branch {name!r} already exists") from e
        with os.fdopen(fd, "w") as f:
            f.write(fork.to_json())
        bh._cache_put(fork.version, fork)
        return bh

    def publish_branch(self, name: str) -> Snapshot | None:
        """Atomically publish branch ``name``'s audited head onto THIS
        chain as one squash commit (operation ``publish``) - the
        Iceberg fast-forward/cherry-pick step of WAP. Metadata-only: the
        commit shares every manifest the branch head references. The
        branch's pipeline epoch markers come along, so a stream that
        staged epochs on the branch stays exactly-once after publish.

        Returns None (no-op) when nothing was staged. Raises
        CommitConflictError when this chain advanced past the fork point:
        the audit blessed a state built on a stale base - splicing it in
        could silently drop or duplicate rows, so the caller must re-fork
        from the new head and re-audit. The branch itself is left intact
        either way (drop_branch when done)."""
        staged = self.branch(name).snapshot()
        base = staged.properties.get("branch_base") or {}
        base_chain = base.get("chain", "main")
        if base_chain != self.branch_name:
            raise ValueError(
                f"branch {name!r} forked from {base_chain!r}; publish it "
                f"there, not onto {self.branch_name!r}"
            )
        base_v = int(base.get("version", staged.version))
        if staged.version == base_v and staged.operation == "fork":
            return None  # nothing staged since the fork
        head = self.snapshot()
        if head.version != base_v:
            raise CommitConflictError(
                f"cannot publish branch {name!r}: {self.branch_name} advanced "
                f"from v{base_v} to v{head.version} since the fork; "
                "re-create the branch from the new head and re-audit"
            )
        props = json.loads(json.dumps(staged.properties))
        props.pop("branch_base", None)
        snap = Snapshot(
            version=head.version + 1,
            parent=head.version,
            schema_json=json.loads(json.dumps(staged.schema_json)),
            schema_version=staged.schema_version,
            num_buckets=staged.num_buckets,
            pk_fields=list(staged.pk_fields),
            order_fields=list(staged.order_fields),
            files={k: list(v) for k, v in staged.files.items()},
            properties=props,
            operation="publish",
            summary={
                "published_branch": name,
                "branch_head": staged.version,
                "staged_commits": staged.version - base_v,
            },
            deltas={k: list(v) for k, v in staged.deltas.items()},
            branch=self.branch_name,
        )
        # parent=staged shares ALL manifest refs; a concurrent main commit
        # loses the O_EXCL race -> CommitConflictError (no retry: any main
        # advance invalidates the audited base by definition)
        return self._commit(snap, parent=staged)

    def drop_branch(self, name: str) -> int:
        """Delete a branch's snapshot files (the chain's data/manifest
        files become orphans reclaimed by vacuum). Returns the number of
        snapshots dropped."""
        # Same validation as create_branch: a name containing glob
        # metacharacters (e.g. "*") must not expand across OTHER
        # branches' snapshot files.
        if not _BRANCH_NAME_RE.match(name):
            raise ValueError(
                f"invalid branch name {name!r} "
                f"(must match {_BRANCH_NAME_RE.pattern})"
            )
        files = sorted(self._snap_dir.glob(f"B-{name}-v*.json"))
        if not files:
            raise KeyError(f"unknown branch {name!r}")
        # drop the chain's tags with the chain: a stale chain-scoped tag
        # would be permanently un-droppable (_own_tag_entry refuses every
        # other chain) and, worse, would resolve against an UNRELATED
        # chain if the branch name is ever reused - the wrong-snapshot
        # read the chain scoping exists to prevent. Tags go FIRST: a
        # crash between the two steps then leaves a still-droppable
        # branch (minus tags), not a dead chain with orphaned tags.
        tags = self._tags_raw()
        orphaned = [
            t
            for t, e in tags.items()
            if isinstance(e, dict) and e.get("branch", "main") == name
        ]
        if orphaned:
            for t in orphaned:
                tags.pop(t)
            self._write_tags(tags)
        for p in files:
            p.unlink()
        return len(files)

    @property
    def _manifest_dir(self) -> Path:
        return self.root / "_meta" / "manifests"

    # Second-level manifests: a bucket manifest holds SEALED chunk refs
    # plus an inline tail. Appends (MOR delta files, insert-only appends)
    # rewrite only the tail; once the tail reaches this many entries it is
    # sealed into an immutable chunk file shared by every later snapshot.
    # Per-epoch metadata write per touched bucket is then O(chunk refs +
    # tail) instead of O(total accumulated files): at 10^7 files/bucket a
    # flat manifest rewrites ~10^7 entries every epoch, the chunked form
    # ~10^7/CHUNK entries of refs + a bounded tail (SCALE.md's deferred
    # manifest-of-manifests, now in).
    MANIFEST_CHUNK_ENTRIES = 256

    def _resolve_manifest(self, ref: str) -> tuple[list[str], list[str]]:
        """Resolve a bucket manifest to (files, deltas): sealed chunks in
        order, then the inline tail. The legacy flat form ({"files":...,
        "deltas":...} with no "chunks") resolves identically."""
        m = json.loads((self.root / ref).read_text())
        files: list[str] = []
        deltas: list[str] = []
        for cref in m.get("chunks", []):
            c = json.loads((self.root / cref).read_text())
            files += c.get("files", [])
            deltas += c.get("deltas", [])
        files += m.get("files", [])
        deltas += m.get("deltas", [])
        return files, deltas

    def _commit(self, snap: Snapshot, parent: Snapshot | None = None) -> Snapshot:
        """Atomically publish a snapshot: write per-bucket manifest files
        for CHANGED buckets only (unchanged buckets structurally share the
        parent's manifest; append-only changes share the parent's sealed
        CHUNKS and rewrite just the tail), then O_EXCL create the next
        version file. Losers of a concurrent race raise CommitConflictError
        with no partial state (data/manifest/chunk files of a failed commit
        are simply unreferenced - removable by maintenance)."""
        self._snap_dir.mkdir(parents=True, exist_ok=True)
        self._manifest_dir.mkdir(parents=True, exist_ok=True)
        refs: dict[str, str] = {}
        parent_files = parent.files if parent else {}
        parent_deltas = parent.deltas if parent else {}
        parent_refs = parent.manifest_refs if parent else {}
        commit_tag = uuid.uuid4().hex[:12]
        chunk_cap = self.MANIFEST_CHUNK_ENTRIES
        for b in sorted(set(snap.files) | set(snap.deltas), key=int):
            files = snap.files.get(b, [])
            deltas = snap.deltas.get(b, [])
            if not files and not deltas:
                continue
            pf = parent_files.get(b, [])
            pd_ = parent_deltas.get(b, [])
            if b in parent_refs and pf == files and pd_ == deltas:
                refs[b] = parent_refs[b]  # unchanged bucket: share manifest
                continue
            chunks: list[str] = []
            tail_f, tail_d = files, deltas
            if (
                b in parent_refs
                and (pf or pd_)
                and files[: len(pf)] == pf
                and deltas[: len(pd_)] == pd_
            ):
                # append-only change: keep the parent's sealed chunks,
                # extend only its tail with the new entries. The prefix
                # check is an O(len) pointer-fast str compare - ~10ms at
                # 10^7 entries, driver-side, bounded per touched bucket.
                pm = json.loads((self.root / parent_refs[b]).read_text())
                chunks = list(pm.get("chunks", []))
                sealed_f = len(pf) - len(pm.get("files", []))
                sealed_d = len(pd_) - len(pm.get("deltas", []))
                tail_f = files[sealed_f:]
                tail_d = deltas[sealed_d:]
            if len(tail_f) + len(tail_d) >= chunk_cap:
                cpath = (
                    self._manifest_dir / f"c-{commit_tag}-{b}-{len(chunks)}.json"
                )
                cpath.write_text(json.dumps({"files": tail_f, "deltas": tail_d}))
                chunks.append(str(cpath.relative_to(self.root)))
                tail_f, tail_d = [], []
            mpath = self._manifest_dir / f"m-{commit_tag}-{b}.json"
            payload: dict = {"files": tail_f, "deltas": tail_d}
            if chunks:
                payload["chunks"] = chunks
            mpath.write_text(json.dumps(payload))
            refs[b] = str(mpath.relative_to(self.root))
        snap.manifest_refs = refs
        snap.committed_at = time.time()
        path = self._snapshot_path(snap.version)
        try:
            fd = os.open(path, os.O_CREAT | os.O_EXCL | os.O_WRONLY)
        except FileExistsError as e:
            raise CommitConflictError(
                f"snapshot v{snap.version} already exists at {path}"
            ) from e
        with os.fdopen(fd, "w") as f:
            f.write(snap.to_json())
        self._cache_put(snap.version, snap)
        return snap

    # ------------------------------------------------------------------
    # create / read
    # ------------------------------------------------------------------
    @classmethod
    def create(
        cls,
        spark: SparkSession,
        root: str | Path,
        schema: T.StructType,
        pk_fields: list[str],
        order_fields: list[str] | None = None,
        num_buckets: int = 32,
        properties: dict | None = None,
    ) -> "LakeTable":
        tbl = cls(spark, root)
        if tbl.exists():
            raise FileExistsError(f"table already exists at {root}")
        snap = Snapshot(
            version=1,
            parent=None,
            schema_json=json.loads(schema.json()),
            schema_version=1,
            num_buckets=num_buckets,
            pk_fields=list(pk_fields),
            order_fields=list(order_fields or ["lsn", "ts"]),
            files={},
            properties={"pipelines": {}, **(properties or {})},
            operation="create",
        )
        tbl._commit(snap)
        tbl._ledger_append(
            {
                "schema_version": 1,
                "status": SchemaStatus.ACTIVE.value,
                "change_type": "INITIAL",
                "schema_json": json.loads(schema.json()),
            }
        )
        return tbl

    def _physical_schema(
        self, snap: Snapshot, schema: T.StructType | None = None
    ) -> T.StructType:
        fields = list((schema or snap.schema).fields)
        fields.append(T.StructField(LSN_COL, T.LongType(), True))
        fields.append(T.StructField(DELETED_COL, T.BooleanType(), True))
        fields.append(T.StructField(BUCKET_COL, T.IntegerType(), True))
        return T.StructType(fields)

    def _read_files(
        self,
        snap: Snapshot,
        buckets: list[int] | None,
        schema: T.StructType | None = None,
        file_map: dict[str, list[str]] | None = None,
        with_seq: bool = False,
        with_partial: bool = False,
        renames: dict[str, list[str]] | None = None,
    ) -> DataFrame:
        """Read a snapshot's files (base by default, or any manifest dict
        such as ``snap.deltas``), optionally restricted to buckets and
        optionally under an evolved (wider) schema: pre-evolution files
        null-fill added columns and widen promoted ones natively.
        ``with_seq`` additionally surfaces the per-commit delta ordinal
        column stamped into merge-on-read delta files; ``with_partial``
        surfaces the overlay flag of partial-update delta rows (null-filled
        False for full-row delta files).

        Columns renamed by :meth:`rename_column` resolve through the
        snapshot's prior-name map (``properties["renames"]``, overridable
        via ``renames`` for cross-snapshot reads): the scan schema carries
        the current name AND every prior physical name (typed as the
        current - widened - type), and each renamed column projects as
        ``coalesce(current, *priors)``. Any one file physically contains
        at most ONE of the names (writes always use the name current at
        write time), so the coalesce is exact, never a value preference."""
        source = snap.files if file_map is None else file_map
        wanted = (
            source
            if buckets is None
            else {str(b): source.get(str(b), []) for b in buckets}
        )
        files = [str(self.root / f) for fl in wanted.values() for f in fl]
        phys = self._physical_schema(snap, schema)
        if with_seq:
            phys = T.StructType(
                list(phys.fields) + [T.StructField(DELTA_SEQ_COL, T.LongType(), True)]
            )
        if with_partial:
            phys = T.StructType(
                list(phys.fields) + [T.StructField(PARTIAL_COL, T.BooleanType(), True)]
            )
        if not files:
            return self.spark.createDataFrame([], phys)
        if renames is None:
            renames = snap.properties.get("renames", {})
        cur_names = {f.name for f in phys.fields}
        active = {
            f.name: renames[f.name]
            for f in phys.fields
            if f.name in renames
        }
        if not active:
            # Manifest-driven read: exact file list, no directory listing;
            # the explicit schema gives null-fill for pre-evolution files
            # and widened-type reads.
            return self.spark.read.schema(phys).parquet(*files)
        types = {f.name: f.dataType for f in phys.fields}
        prior_fields = [
            T.StructField(p, types[cur], True)
            for cur, priors in active.items()
            for p in priors
            if p not in cur_names
        ]
        scan_schema = T.StructType(list(phys.fields) + prior_fields)
        df = self.spark.read.schema(scan_schema).parquet(*files)
        return df.select(
            *[
                (
                    F.coalesce(F.col(f.name), *[F.col(p) for p in active[f.name]])
                    if f.name in active
                    else F.col(f.name)
                ).alias(f.name)
                for f in phys.fields
            ]
        )

    def _resolved(
        self,
        snap: Snapshot,
        buckets: list[int] | None,
        schema: T.StructType | None = None,
        renames: dict[str, list[str]] | None = None,
        file_map: dict[str, list[str]] | None = None,
        delta_map: dict[str, list[str]] | None = None,
    ) -> DataFrame:
        """Base ∪ delta rows with read-time LWW resolution (merge-on-read):
        for every pk the winner by (_lsn, delta commit ordinal) survives,
        tombstones included. Equal to the base read for pure-COW tables.

        Ordering is deterministic across epochs: every delta write stamps
        its rows with the committing snapshot's version (DELTA_SEQ_COL), so
        equal-lsn rows for one key resolve to the newest commit - the same
        "newer source wins ties" rule the COW join applies (s.lsn >= t._lsn).
        Base rows order as ordinal 0. The LWW runs on transient ordering
        columns; stored ``_lsn`` values (incl. nulls from append mode) pass
        through unchanged."""
        base = self._read_files(snap, buckets, schema, file_map=file_map,
                                renames=renames)
        effective_deltas = snap.deltas if delta_map is None else delta_map
        has_deltas = any(
            fl
            for b, fl in effective_deltas.items()
            if buckets is None or int(b) in buckets
        )
        if not has_deltas:
            return base
        partial_buckets = {
            int(b) for b in snap.properties.get("partial_delta_buckets", [])
        }
        has_partial = any(
            buckets is None or b in buckets for b in partial_buckets
        )
        deltas = self._read_files(
            snap, buckets, schema, file_map=effective_deltas, with_seq=True,
            with_partial=has_partial, renames=renames,
        )
        if has_partial:
            return self._resolve_partial(snap, base, deltas, schema)
        union = base.withColumn(
            "_pref", F.lit(0).cast("long")
        ).unionByName(
            deltas.withColumn(
                "_pref", F.coalesce(F.col(DELTA_SEQ_COL), F.lit(1)).cast("long")
            ).drop(DELTA_SEQ_COL)
        )
        # append-originated rows carry null _lsn -> lowest precedence, via a
        # TRANSIENT ordering column only (the stored _lsn stays null).
        union = union.withColumn("_lsn_ord", F.coalesce(F.col(LSN_COL), F.lit(-1)))
        resolved = lww_dedupe(
            union, snap.pk_fields, ["_lsn_ord", "_pref"], tiebreak_fields=[]
        )
        return resolved.drop("_pref", "_lsn_ord")

    def _resolve_partial(
        self,
        snap: Snapshot,
        base: DataFrame,
        deltas: DataFrame,
        schema: T.StructType | None = None,
    ) -> DataFrame:
        """Read-time resolution when merge-on-read delta chains contain
        PARTIAL overlay rows (update_mode='partial' commits): per key,
        the newest FULL row (base row, full delta row, or tombstone) is the
        barrier; overlay rows ordered after it contribute their non-null
        columns, last writer per column. Overlays with no barrier at all
        (an update that arrived before any insert - the reference's
        'UPDATE on missing key' case, demo/test_pipeline.sh:256-258) stay
        invisible until a barrier lands underneath them."""
        payload_cols = [
            f.name for f in (schema or snap.schema).fields
            if f.name not in snap.pk_fields
        ]
        pk = snap.pk_fields
        union = base.withColumn("_pref", F.lit(0).cast("long")).withColumn(
            PARTIAL_COL, F.lit(False)
        ).unionByName(
            deltas.withColumn(
                "_pref", F.coalesce(F.col(DELTA_SEQ_COL), F.lit(1)).cast("long")
            )
            .withColumn(PARTIAL_COL, F.coalesce(F.col(PARTIAL_COL), F.lit(False)))
            .drop(DELTA_SEQ_COL)
        )
        union = union.withColumn(
            "_ord",
            F.struct(
                F.coalesce(F.col(LSN_COL), F.lit(-1)).alias("l"),
                F.col("_pref").alias("p"),
            ),
        )
        is_full = ~F.col(PARTIAL_COL)
        w = Window.partitionBy(*pk)
        union = union.withColumn(
            "_b_ord", F.max(F.when(is_full, F.col("_ord"))).over(w)
        )
        after_barrier = F.col(PARTIAL_COL) & (F.col("_ord") > F.col("_b_ord"))
        agg = union.groupBy(*pk).agg(
            F.max_by(
                F.struct(
                    *[F.col(c).alias(c) for c in payload_cols],
                    F.col(LSN_COL).alias(LSN_COL),
                    F.col(DELETED_COL).alias(DELETED_COL),
                    F.col(BUCKET_COL).alias(BUCKET_COL),
                ),
                F.when(is_full, F.col("_ord")),
            ).alias("_b"),
            F.max(F.when(after_barrier, F.col(LSN_COL))).alias("_m_lsn"),
            *[
                F.max_by(
                    F.col(c),
                    F.when(after_barrier & F.col(c).isNotNull(), F.col("_ord")),
                ).alias(f"_u_{c}")
                for c in payload_cols
            ],
        )
        # overlay-only keys (no barrier): invisible
        agg = agg.filter(F.col("_b").isNotNull())
        b_deleted = F.coalesce(F.col(f"_b.{DELETED_COL}"), F.lit(False))
        return agg.select(
            *pk,
            *[
                F.when(b_deleted, F.col(f"_b.{c}"))
                .otherwise(F.coalesce(F.col(f"_u_{c}"), F.col(f"_b.{c}")))
                .alias(c)
                for c in payload_cols
            ],
            F.greatest(
                F.col(f"_b.{LSN_COL}"), F.col("_m_lsn")
            ).alias(LSN_COL),
            F.col(f"_b.{DELETED_COL}").alias(DELETED_COL),
            F.col(f"_b.{BUCKET_COL}").alias(BUCKET_COL),
        )

    def read(
        self,
        version: int | str | None = None,
        buckets: list[int] | None = None,
        include_system: bool = False,
        where: dict[str, tuple] | None = None,
        as_of=None,
    ) -> DataFrame:
        """Current (or time-travel) table state: live rows only (delta
        files LWW-resolved against the base for merge-on-read tables).

        Time travel: ``version`` (number or tag name), or ``as_of`` (unix
        seconds / datetime - resolved to the latest snapshot committed at
        or before it, Iceberg ``TIMESTAMP AS OF``); passing both is an
        error.

        ``where={col: (lo, hi)}`` (numeric/timestamp/string closed ranges;
        either bound may be None) applies file-level min/max DATA SKIPPING before
        the scan plus an exact residual filter after it - the Iceberg/Delta
        stats-pruning analog for time-range reads ("transcripts since ts").
        Skipping only drops whole files proven disjoint from the range, so
        results equal read().filter(...) exactly. When the candidate
        buckets carry unresolved MOR delta files the file pruning is
        SKIPPED (only the residual filter applies): dropping a base file
        by a payload predicate could change a key's read-time LWW winner -
        pruning must never see through unresolved overlays. After
        compact() the table is delta-free and skipping resumes."""
        if as_of is not None:
            if version is not None:
                raise ValueError("pass either version or as_of, not both")
            version = self.version_as_of(as_of)
        snap = self.snapshot(version)
        pruned_map = None
        if where:
            has_deltas = any(
                fl
                for b, fl in snap.deltas.items()
                if buckets is None or int(b) in buckets
            )
            if not has_deltas:
                pruned_map, _ = self.candidate_files(snap.version, buckets, where)
        if pruned_map is not None:
            df = self._read_files(snap, None, file_map=pruned_map)
        else:
            df = self._resolved(snap, buckets)
        if where:
            for c, (lo, hi) in where.items():
                if lo is not None:
                    df = df.filter(F.col(c) >= F.lit(lo))
                if hi is not None:
                    df = df.filter(F.col(c) <= F.lit(hi))
        df = df.filter(~F.coalesce(F.col(DELETED_COL), F.lit(False)))
        if include_system:
            return df
        return df.select(*[f.name for f in snap.schema.fields])

    def changed_buckets(self, from_version: int, to_version: int | None = None) -> list[int]:
        """Buckets whose file or delta manifests differ between two
        snapshots - the only buckets that can contain row-level changes.
        O(buckets) driver-side: buckets that structurally share a manifest
        ref between the snapshots are skipped without touching their file
        lists, so an incremental consumer of a single-epoch diff pays for
        the epoch's touched buckets, never the table."""
        snap_a = self.snapshot(from_version)
        snap_b = self.snapshot(to_version)
        changed: list[int] = []
        for b in set(snap_a.files) | set(snap_b.files) | set(snap_a.deltas) | set(
            snap_b.deltas
        ):
            ref_a = snap_a.manifest_refs.get(b)
            if ref_a is not None and ref_a == snap_b.manifest_refs.get(b):
                continue  # structurally shared manifest: identical by construction
            if snap_a.files.get(b, []) == snap_b.files.get(b, []) and snap_a.deltas.get(
                b, []
            ) == snap_b.deltas.get(b, []):
                continue
            changed.append(int(b))
        return sorted(changed)

    def _diff_images(
        self, from_version: int, snap_b: "Snapshot"
    ) -> tuple[DataFrame, Column, Column, Column] | None:
        """Shared core of the changelog readers (:meth:`read_changes` and
        :meth:`read_changes_envelope`): the pk-keyed full-outer join of the
        two snapshots' live states, bucket-pruned to :meth:`changed_buckets`
        via exact manifest lists. Returns ``(joined, is_insert, is_delete,
        is_update)`` where ``joined`` carries the coalesced pk columns plus
        ``_a_pay`` / ``_b_pay`` pre-/post-image payload structs, or ``None``
        when the range provably contains no changed buckets. Classification
        predicates are returned (not applied) so each caller projects its
        own output shape off ONE join."""
        snap_a = self.snapshot(from_version)
        if snap_a.version > snap_b.version:
            raise ValueError(
                f"from_version {snap_a.version} is newer than to_version "
                f"{snap_b.version}"
            )
        schema = snap_b.schema
        pk = list(snap_b.pk_fields)
        payload = [f.name for f in schema.fields if f.name not in pk]
        changed = (
            []
            if snap_a.version == snap_b.version
            else self.changed_buckets(snap_a.version, snap_b.version)
        )
        if not changed:
            return None

        def _live(snap: Snapshot) -> DataFrame:
            # the `to` side's prior-name map covers renames that happened
            # anywhere in the range, so the `from` side's files read
            # correctly under the `to` schema's (renamed) column names
            df = self._resolved(
                snap, changed, schema=schema,
                renames=snap_b.properties.get("renames", {}),
            )
            df = df.filter(~F.coalesce(F.col(DELETED_COL), F.lit(False)))
            return df.select(*pk, *payload)

        a = _live(snap_a).withColumn("_a_present", F.lit(True))
        b = _live(snap_b).withColumn("_b_present", F.lit(True))
        a = a.select(
            *pk,
            F.struct(*[F.col(c).alias(c) for c in payload]).alias("_a_pay"),
            "_a_present",
        )
        b = b.select(
            *pk,
            F.struct(*[F.col(c).alias(c) for c in payload]).alias("_b_pay"),
            "_b_present",
        )
        j = a.join(b, on=pk, how="full_outer")
        is_insert = F.col("_a_present").isNull()
        is_delete = F.col("_b_present").isNull()
        # null-safe struct equality: one comparison covers every payload col
        is_update = (
            ~is_insert & ~is_delete & ~F.col("_a_pay").eqNullSafe(F.col("_b_pay"))
        )
        return j, is_insert, is_delete, is_update

    def read_changes(
        self,
        from_version: int,
        to_version: int | None = None,
        include_preimages: bool = False,
    ) -> DataFrame:
        """Incremental changelog between two snapshots (Iceberg
        changelog-scan / Hudi incremental-query / Delta CDF analog): the
        NET row-level diff of the live table states, one row per changed
        key, so a downstream consumer can chain CDC pipelines off the lake
        instead of re-reading full snapshots.

        Returns ``change_type`` + the ``to`` snapshot's columns:
          * ``insert`` - key live in ``to`` only (post-image);
          * ``update`` - key live in both with differing payload
            (post-image); with ``include_preimages=True`` each update
            instead emits ``update_preimage`` (old row) +
            ``update_postimage`` (new row), the Delta CDF convention;
          * ``delete`` - key live in ``from`` only (pre-image).

        Scale shape: both states are read bucket-pruned to
        :meth:`changed_buckets` via exact manifest file lists, then one
        pk-keyed full-outer join classifies rows - for a single-epoch diff
        on a 100 TB table that is the epoch's touched buckets, not a table
        scan. Schema evolution across the range is handled by reading the
        ``from`` side under the ``to`` snapshot's (wider) schema, the same
        null-fill/widen path time travel uses; a row that differs only in
        a column added after ``from`` diffs as an update whose pre-image
        value for that column is null, matching what a reader of ``from``
        would have observed.

        The diff is NET: a key inserted and deleted strictly between the
        two snapshots appears in neither state and emits nothing -
        changelog semantics over snapshots, not a binlog replay."""
        snap_b = self.snapshot(to_version)
        pk = list(snap_b.pk_fields)
        payload = [f.name for f in snap_b.schema.fields if f.name not in pk]
        joined = self._diff_images(from_version, snap_b)
        if joined is None:
            out_fields = [
                T.StructField("change_type", T.StringType(), False)
            ] + list(snap_b.schema.fields)
            return self.spark.createDataFrame([], T.StructType(out_fields))
        j, is_insert, is_delete, is_update = joined

        def _tagged(tag: str, side: str):
            return F.struct(
                F.lit(tag).alias("change_type"),
                *[F.col(f"{side}.{c}").alias(c) for c in payload],
            )

        upd_rows = (
            F.array(
                _tagged("update_preimage", "_a_pay"),
                _tagged("update_postimage", "_b_pay"),
            )
            if include_preimages
            else F.array(_tagged("update", "_b_pay"))
        )
        rows = (
            F.when(is_insert, F.array(_tagged("insert", "_b_pay")))
            .when(is_delete, F.array(_tagged("delete", "_a_pay")))
            .when(is_update, upd_rows)
        )
        exploded = j.select(*pk, F.explode(rows).alias("_chg"))
        return exploded.select(
            F.col("_chg.change_type").alias("change_type"),
            *pk,
            *[F.col(f"_chg.{c}").alias(c) for c in payload],
        )

    def read_changes_envelope(
        self,
        from_version: int,
        to_version: int | None = None,
        db: str = "lake",
        table_name: str | None = None,
        ts_col: str = "ts",
    ) -> DataFrame:
        """OUTBOUND CDC feed: the snapshot-range changelog as Kafka-record-
        shaped Debezium change events, so downstream consumers subscribe to
        this table exactly like they would to a Debezium connector (the
        emit-side complement of :func:`sources.cdc_formats.parse_debezium`;
        public Debezium envelope, before/after/source/op/ts_ms).

        Returns two string columns - ``key`` (JSON of the pk fields, the
        Kafka record key, so a keyed topic partitioner preserves per-key
        ordering) and ``value`` (the envelope JSON):

          * insert -> op ``c``: ``before`` null, ``after`` = post-image;
          * update -> op ``u``: ``before`` = pre-image, ``after`` =
            post-image (one event per key - the NET diff, not the
            intermediate history);
          * delete -> op ``d``: ``before`` = pre-image, ``after`` null
            (Debezium's delete convention: the only row image is before).

        ``source.lsn`` is the ``to`` snapshot version - the feed's monotone
        replay ordinal, exactly what a consumer needs for LWW ordering
        across successive emits (version numbers are totally ordered and
        publish-gated). ``ts_ms`` is the post-image's ``ts_col`` in epoch
        millis (pre-image for deletes), null when the table has no such
        column - deterministic event time, never emit wall-clock.

        Same scale shape as :meth:`read_changes`: ONE bucket-pruned
        pk-keyed full-outer join, then a pure projection - the JSON
        rendering is ``to_json`` (JVM codegen, ``ignoreNullFields=false``
        so the envelope carries explicit ``"before": null`` like Debezium
        does). Round-trip contract (tested): ``parse_debezium`` over this
        output recovers op/keys/payload exactly, so a second LakeTable can
        chain off the feed with the standard adapter."""
        snap_b = self.snapshot(to_version)
        pk = list(snap_b.pk_fields)
        payload = [f.name for f in snap_b.schema.fields if f.name not in pk]
        out_schema = T.StructType(
            [
                T.StructField("key", T.StringType(), False),
                T.StructField("value", T.StringType(), False),
            ]
        )
        joined = self._diff_images(from_version, snap_b)
        if joined is None:
            return self.spark.createDataFrame([], out_schema)
        j, is_insert, is_delete, is_update = joined

        def _image(side: str) -> Column:
            return F.struct(
                *[F.col(c).alias(c) for c in pk],
                *[F.col(f"{side}.{c}").alias(c) for c in payload],
            )

        before = F.when(is_delete | is_update, _image("_a_pay"))
        after = F.when(~is_delete, _image("_b_pay"))
        op = (
            F.when(is_insert, F.lit("c"))
            .when(is_delete, F.lit("d"))
            .when(is_update, F.lit("u"))
        )
        if ts_col in payload:
            ts_ms = F.unix_millis(
                F.when(is_delete, F.col(f"_a_pay.{ts_col}")).otherwise(
                    F.col(f"_b_pay.{ts_col}")
                ).cast("timestamp")
            )
        else:
            ts_ms = F.lit(None).cast("long")
        source = F.struct(
            F.lit(db).alias("db"),
            F.lit(table_name or self.root.name).alias("table"),
            F.lit(int(snap_b.version)).cast("long").alias("lsn"),
        )
        envelope = F.struct(
            before.alias("before"),
            after.alias("after"),
            source.alias("source"),
            op.alias("op"),
            ts_ms.alias("ts_ms"),
        )
        return j.filter(is_insert | is_delete | is_update).select(
            F.to_json(F.struct(*[F.col(c).alias(c) for c in pk])).alias("key"),
            F.to_json(envelope, {"ignoreNullFields": "false"}).alias("value"),
        )

    def read_keys(
        self,
        keys,
        version: int | None = None,
        broadcast_keys: bool = True,
        use_bloom: bool = True,
    ) -> DataFrame:
        """Point lookups: the live rows for an explicit key set - the
        serving-side read of a CDC-fed table ("fetch these conversations"),
        priced by the KEYS' buckets, never the table.

        ``keys`` is a DataFrame carrying the pk columns (extra columns are
        ignored) or a list of tuples/values in pk order. The first pk
        field's bucket transform prunes the scan to the buckets the keys
        can live in - O(distinct buckets) driver-side, each bucket's files
        read through the normal manifest/MOR-resolution path - then a
        semi-join keeps exactly the requested keys. Inside each file,
        clustered compaction's pk sort lets parquet row-group pruning cut
        further. ``broadcast_keys`` (default) hints the key set to every
        executor - right for serving-size lookups; pass False when joining
        a huge key relation, which then shuffles instead.

        Scale shape at 100 TB: k keys over B buckets touch at most
        min(k, B) buckets; for a handful of conversations that is a few
        file reads regardless of table size."""
        snap = self.snapshot(version)
        pk = list(snap.pk_fields)
        if not isinstance(keys, DataFrame):
            rows = [k if isinstance(k, tuple) else (k,) for k in keys]
            keys = self.spark.createDataFrame(
                rows, T.StructType([snap.schema[c] for c in pk])
            )
        missing = [c for c in pk if c not in keys.columns]
        if missing:
            raise ValueError(f"keys relation lacks pk columns {missing}")
        keys = keys.select(
            *[F.col(c).cast(snap.schema[c].dataType).alias(c) for c in pk]
        ).distinct()
        keyed = keys.withColumn(
            BUCKET_COL,
            bucket_expr(pk[0], snap.num_buckets, key_type=snap.schema[pk[0]].dataType),
        )
        # driver memory stays bounded at ANY key count: the tuple
        # collect is capped, and past the cap only the distinct bucket
        # set (<= num_buckets rows) and a capped pk0 sample come back.
        # The serving-size path (the common case) stays ONE driver job.
        kdist = (
            keyed.select(BUCKET_COL, *pk)
            .limit(self.PUSHDOWN_MAX_KEYS + 1)
            .collect()
        )
        small = len(kdist) <= self.PUSHDOWN_MAX_KEYS
        if small:
            buckets = sorted({int(r[0]) for r in kdist})
            pk0_vals = sorted({r[1] for r in kdist if r[1] is not None})
        else:
            buckets = sorted(
                int(r[0])
                for r in keyed.select(BUCKET_COL).distinct().collect()
            )
            # composite pks: many tuples can still span FEW first-pk
            # values (one conversation, many turns) - sample pk0
            # separately so the scan pushdown survives past the cap
            pk0_rows = (
                keyed.select(pk[0])
                .distinct()
                .limit(self.PUSHDOWN_MAX_KEYS + 1)
                .collect()
            )
            pk0_vals = (
                sorted(r[0] for r in pk0_rows if r[0] is not None)
                if len(pk0_rows) <= self.PUSHDOWN_MAX_KEYS
                else []
            )
        if not buckets:
            return self.spark.createDataFrame([], snap.schema)
        if small:
            # build the probe from the COLLECTED tuples, not the lazy
            # relation: the bucket list, bloom consult, and pushdown all
            # derive from this one sample, and re-evaluating a caller's
            # possibly-nondeterministic keys lineage for the semi-join
            # could produce keys whose buckets were never opened. A
            # local literal relation pins all four consumers to the SAME
            # key set - and costs the caller's lineage exactly once.
            probe = self.spark.createDataFrame(
                [tuple(r[1:]) for r in kdist],
                T.StructType([snap.schema[c] for c in pk]),
            )
            if broadcast_keys:
                probe = F.broadcast(probe)
        else:
            probe = keyed.select(*pk)
            # explicit broadcast hints bypass autoBroadcastJoinThreshold:
            # a change-volume-sized key relation (the sync paths)
            # shuffles instead of being funneled through the driver onto
            # every executor. (Past the cap the key relation must be
            # deterministic - same contract as any repeated-read input.)
            if broadcast_keys and keyed.count() <= self.BROADCAST_KEYS_MAX:
                probe = F.broadcast(probe)
        file_map = delta_map = None
        if use_bloom and small:
            # File-level bloom skipping (lake/bloom.py, Hudi bloom-index
            # analog): drop candidate files that provably hold none of the
            # keys BEFORE the scan is planned. Unindexed files stay.
            pruned = self._bloom_prune(
                snap, buckets, [tuple(r[1:]) for r in kdist]
            )
            if pruned is not None:
                file_map, delta_map, _ = pruned
                if not any(file_map.values()) and not any(delta_map.values()):
                    # every candidate file proven key-free
                    return self.spark.createDataFrame([], snap.schema)
        df = self._resolved(
            snap, buckets, file_map=file_map, delta_map=delta_map
        ).filter(~F.coalesce(F.col(DELETED_COL), F.lit(False)))
        if pk0_vals:
            # Key-predicate pushdown: an IN(<first pk>) filter reaches the
            # parquet scan, where clustered compaction's pk sort (row-group
            # min/max), dictionary pages, and the pk bloom filters written
            # at compaction each skip row groups that provably lack the
            # keys - the file is opened but its data pages mostly aren't
            # read. The semi-join below stays the exact filter (composite
            # pks: IN on pk[0] is a superset). Above the cap the literal
            # list stops paying for itself; the semi-join alone is exact.
            df = df.filter(F.col(pk[0]).isin(pk0_vals))
        return df.join(probe, on=pk, how="left_semi").select(
            *[f.name for f in snap.schema.fields]
        )

    def read_prefix(
        self,
        keys,
        version: int | None = None,
        broadcast_keys: bool = True,
    ) -> DataFrame:
        """Live rows whose LEADING pk fields match any key in the set -
        "fetch these whole conversations" for a (conv_id, turn_idx)
        table, the serving read :meth:`read_keys` cannot express (it
        requires every pk field). Priced identically: the bucket
        transform hashes ONLY the first pk field, so a prefix is exactly
        as bucket-prunable as a full key - k prefixes touch at most
        min(k, num_buckets) buckets regardless of table size.

        ``keys`` is a DataFrame carrying the first k pk columns (k =
        the longest leading run of pk fields present; other columns are
        ignored) or a list of scalars/tuples in pk order. The file-level
        pk bloom index is NOT consulted (its bitmaps hash full pk
        tuples, so a prefix can prove nothing); the IN(<first pk>)
        pushdown still prunes row groups inside each opened file."""
        snap = self.snapshot(version)
        pk = list(snap.pk_fields)
        if not isinstance(keys, DataFrame):
            rows = [k if isinstance(k, tuple) else (k,) for k in keys]
            widths = {len(r) for r in rows}
            if len(widths) > 1:
                raise ValueError(f"mixed prefix widths {sorted(widths)}")
            k = widths.pop() if widths else 1
            if not 1 <= k <= len(pk):
                raise ValueError(
                    f"prefix width {k} outside 1..{len(pk)} (pk {pk})"
                )
            keys = self.spark.createDataFrame(
                rows, T.StructType([snap.schema[c] for c in pk[:k]])
            )
        else:
            k = 0
            while k < len(pk) and pk[k] in keys.columns:
                k += 1
            if k == 0:
                raise ValueError(
                    f"keys relation lacks the leading pk column {pk[0]!r}"
                )
        prefix = pk[:k]
        keys = keys.select(
            *[F.col(c).cast(snap.schema[c].dataType).alias(c) for c in prefix]
        ).distinct()
        keyed = keys.withColumn(
            BUCKET_COL,
            bucket_expr(pk[0], snap.num_buckets, key_type=snap.schema[pk[0]].dataType),
        )
        # same shape as read_keys: ONE capped collect serves the bucket
        # list, the pk0 pushdown, AND (when complete) the semi-join
        # probe as a local literal relation - pinning every consumer to
        # the same sample and costing the caller's lineage exactly once.
        # Past the cap, driver memory stays bounded: the bucket-set
        # collect is <= num_buckets rows and the pk0 sample is capped -
        # a multi-million-conversation sync must not funnel every key
        # through the driver just to learn which buckets to open.
        kdist = (
            keyed.select(BUCKET_COL, *prefix)
            .distinct()
            .limit(self.PUSHDOWN_MAX_KEYS + 1)
            .collect()
        )
        small = len(kdist) <= self.PUSHDOWN_MAX_KEYS
        if small:
            buckets = sorted({int(r[0]) for r in kdist})
            pk0_vals = sorted({r[1] for r in kdist if r[1] is not None})
        else:
            buckets = sorted(
                {int(r[0]) for r in keyed.select(BUCKET_COL).distinct().collect()}
            )
            pk0_rows = (
                keyed.select(pk[0])
                .distinct()
                .limit(self.PUSHDOWN_MAX_KEYS + 1)
                .collect()
            )
            pk0_vals = (
                sorted(r[0] for r in pk0_rows if r[0] is not None)
                if len(pk0_rows) <= self.PUSHDOWN_MAX_KEYS
                else []
            )
        if not buckets:
            return self.spark.createDataFrame([], snap.schema)
        if small:
            probe = self.spark.createDataFrame(
                [tuple(r[1:]) for r in kdist],
                T.StructType([snap.schema[c] for c in prefix]),
            )
            if broadcast_keys:
                probe = F.broadcast(probe)
        else:
            probe = keyed.select(*prefix)
            # explicit hints bypass autoBroadcastJoinThreshold - gate on
            # the measured count so change-volume key sets shuffle-join
            if broadcast_keys and keyed.count() <= self.BROADCAST_KEYS_MAX:
                probe = F.broadcast(probe)
        df = self._resolved(snap, buckets).filter(
            ~F.coalesce(F.col(DELETED_COL), F.lit(False))
        )
        if pk0_vals:
            df = df.filter(F.col(pk[0]).isin(pk0_vals))
        return df.join(probe, on=prefix, how="left_semi").select(
            *[f.name for f in snap.schema.fields]
        )

    # ------------------------------------------------------------------
    # file-level bloom index (Hudi bloom-index / metadata-table analog)
    # ------------------------------------------------------------------
    BLOOM_SPEC_HASH = "pandas-siphash-v1"

    def update_ndv_sketch(
        self,
        cols: list[str],
        lg_k: int | None = None,
        rebuild: bool = False,
    ) -> dict:
        """Incrementally maintain per-bucket HLL NDV sketches under
        ``_meta/ndv/`` (lake/ndv.py - the Iceberg puffin-blob / Delta
        computeStats analog): ONE ``hll_sketch_agg`` job over only the
        buckets whose file sets changed since the last call, grouped by
        bucket, over LIVE rows (MOR resolved, tombstones out). Unchanged
        buckets keep their sketch untouched - maintenance cost scales
        with churn, never table size. Idempotent: a second call on the
        same snapshot returns ``applied: False`` and runs no job.

        One index, one precision: a call whose ``lg_k`` disagrees with
        the recorded spec fails fast unless ``rebuild=True``. Adding NEW
        columns to an existing index recomputes every bucket for those
        columns (their sketches don't exist yet) but leaves existing
        columns' fresh buckets alone."""
        from dataingestion_spark.lake import ndv as N

        snap = self.snapshot()
        by_name = {f.name: f.dataType for f in snap.schema.fields}
        unknown = [c for c in cols if c not in by_name]
        if unknown:
            raise ValueError(f"ndv columns not in schema: {unknown}")
        bad = [c for c in cols if not N.sketchable(by_name[c])]
        if bad:
            raise ValueError(
                f"ndv needs numeric/string/binary/timestamp/date columns; "
                f"unsupported: {bad}"
            )
        store = N.NdvStore(self.root)
        lg_k = int(lg_k or N.DEFAULT_LG_K)
        spec = store.spec()
        if spec is not None and not rebuild and spec["lg_k"] != lg_k:
            raise ValueError(
                f"ndv index already built with lg_k={spec['lg_k']}; one "
                "index, one precision - pass rebuild=True to re-create"
            )
        if spec is None or rebuild:
            if rebuild:
                for b in store.buckets():
                    store.drop_bucket(b)
            spec = {"lg_k": lg_k, "cols": []}
        all_cols = sorted(set(spec["cols"]) | set(cols))
        live_buckets = sorted(set(snap.files) | set(snap.deltas), key=int)
        stale: list[int] = []
        prints: dict[int, str] = {}
        for b in live_buckets:
            fp = N.fingerprint(
                list(snap.files.get(b, [])) + list(snap.deltas.get(b, []))
            )
            prints[int(b)] = fp
            entry = store.load_bucket(b)
            if entry.get("fingerprint") != fp or any(
                c not in entry.get("sketches", {}) for c in all_cols
            ):
                stale.append(int(b))
        for b in store.buckets():  # buckets no longer live (rebucket)
            if str(b) not in set(snap.files) | set(snap.deltas):
                store.drop_bucket(b)
        if not stale:
            if sorted(spec["cols"]) != all_cols:
                store.write_spec({"lg_k": lg_k, "cols": all_cols})
            return {"applied": False, "buckets_refreshed": 0}
        df = self._resolved(snap, stale).filter(
            ~F.coalesce(F.col(DELETED_COL), F.lit(False))
        )
        aggs = [
            F.hll_sketch_agg(N.sketch_input(c, by_name[c]), F.lit(lg_k))
            .alias(c)
            for c in all_cols
        ]
        rows = {
            int(r["_b"]): r
            for r in df.groupBy(F.col(BUCKET_COL).alias("_b")).agg(*aggs).collect()
        }
        for b in stale:
            r = rows.get(b)
            store.write_bucket(
                b,
                {
                    "fingerprint": prints[b],
                    "sketches": {
                        c: (N.NdvStore.encode(r[c]) if r and r[c] else None)
                        for c in all_cols
                    },
                },
            )
        store.write_spec({"lg_k": lg_k, "cols": all_cols})
        return {"applied": True, "buckets_refreshed": len(stale)}

    def approx_ndv(self, col: str, refresh: bool = True) -> int:
        """Approximate COUNT(DISTINCT col) over live rows from the
        per-bucket HLL sketches: refresh stale buckets (one job over only
        the churned buckets; ``refresh=False`` serves the possibly-stale
        stored estimate for zero jobs), then union the bucket sketches -
        an O(buckets)-row job over ~1 KiB binaries, never a data scan.
        HLL union is lossless, so sharding costs no accuracy
        (~2.5% relative std error at the default lg_k=12)."""
        from dataingestion_spark.lake import ndv as N

        store = N.NdvStore(self.root)
        spec = store.spec()
        if refresh or spec is None or col not in (spec or {}).get("cols", []):
            self.update_ndv_sketch(
                [col], lg_k=(spec or {}).get("lg_k")
            )
        sketches = [
            N.NdvStore.decode(s)
            for b in store.buckets()
            if (s := store.load_bucket(b).get("sketches", {}).get(col))
        ]
        if not sketches:
            return 0
        df = self.spark.createDataFrame(
            [(s,) for s in sketches],
            T.StructType([T.StructField("sk", T.BinaryType())]),
        )
        return int(
            df.agg(
                F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("ndv")
            ).collect()[0]["ndv"]
        )

    def update_bloom_index(
        self,
        bits_per_key: int = 10,
        k: int = 7,
        rebuild: bool = False,
    ) -> dict:
        """Incrementally maintain the file-level bloom index under
        ``_meta/bloom/`` (see lake/bloom.py): build bitmaps for live data
        files (base AND merge-on-read delta files) that lack one, drop
        entries for files no longer live, touch only buckets whose file
        sets changed. Idempotent: a second call on the same snapshot
        returns ``applied: False`` and writes nothing.

        Like the LSH band index (lake/sync.py sync_band_index), ONE index
        has ONE hash-family/sizing spec: a call whose (bits_per_key, k)
        disagrees with the recorded spec fails fast unless
        ``rebuild=True``, which wipes and rebuilds under the new spec.

        The spark-local build reads each new file's pk columns with
        pyarrow on the driver - the same stand-in posture as the stats
        sidecar footer pass (:meth:`_write_stats_sidecar`); a cluster
        port builds bitmaps executor-side in the writer, as Hudi does.
        Cost is O(new-file rows) per call, never O(table)."""
        from dataingestion_spark.lake import bloom as B

        snap = self.snapshot()
        pk = list(snap.pk_fields)
        if not B.indexable_pk(snap.schema, pk):
            raise ValueError(
                f"bloom index needs string/integer pk columns; table pk "
                f"{pk} has non-indexable types"
            )
        store = B.BloomIndexStore(self.root)
        want = {
            "hash": self.BLOOM_SPEC_HASH,
            "bits_per_key": int(bits_per_key),
            "k": int(k),
            "pk_fields": pk,
        }
        spec = store.spec()
        if spec is not None and not rebuild:
            if {key: spec.get(key) for key in want} != want:
                raise ValueError(
                    "bloom index already built with spec "
                    f"{ {key: spec.get(key) for key in want} }; one index, "
                    "one hash family - pass rebuild=True to re-create"
                )
        if spec is None or rebuild:
            if rebuild:
                for p in store.dir.glob("bucket-*.json"):
                    p.unlink()
            store.write_spec(want)
        renames = snap.properties.get("renames", {})
        indexed = dropped = covered = 0
        buckets = sorted(set(snap.files) | set(snap.deltas), key=int)
        for b in buckets:
            live = list(snap.files.get(b, [])) + list(snap.deltas.get(b, []))
            entries = store.load_bucket(b)
            fresh: dict[str, dict] = {}
            changed = False
            for rel in live:
                if rel in entries:
                    fresh[rel] = entries[rel]
                    continue
                frame = self._read_pk_frame(rel, pk, renames)
                if frame is None:
                    continue  # pre-rename legacy file w/o pk: stays unindexed
                fresh[rel] = B.build_bitmap(frame, bits_per_key, k)
                indexed += 1
                changed = True
            stale = len(entries) - sum(1 for r in entries if r in fresh)
            if stale:
                dropped += stale
                changed = True
            covered += len(fresh)
            if changed:
                store.write_bucket(b, fresh)
        return {
            "applied": bool(indexed or dropped),
            "version": snap.version,
            "indexed": indexed,
            "dropped": dropped,
            "covered_files": covered,
        }

    # ------------------------------------------------------------------
    # secondary-column bloom index (Hudi 1.0 secondary-index analog)
    # ------------------------------------------------------------------
    @staticmethod
    def _secondary_store_name(col: str) -> str:
        return f"bloom-col-{col}"

    def secondary_index_cols(self) -> list[str]:
        """Columns carrying a secondary bloom index (spec present)."""
        meta = self.root / "_meta"
        out = []
        for p in sorted(meta.glob("bloom-col-*")) if meta.is_dir() else []:
            if (p / "spec.json").is_file():
                out.append(p.name[len("bloom-col-"):])
        return out

    def update_secondary_index(
        self,
        col: str,
        bits_per_key: int = 10,
        k: int = 7,
        rebuild: bool = False,
    ) -> dict:
        """Incrementally maintain a SECONDARY bloom index over ``col``
        (the Hudi 1.0 secondary-index shape: value -> which part of the
        table can hold it, for columns the bucketing does NOT hash).
        Same machinery, store layout, freshness discipline and
        one-index-one-spec contract as the pk bloom index
        (:meth:`update_bloom_index`); one bitmap per live file under
        ``_meta/bloom-col-<col>/``. Consumed by :meth:`read_in`, which
        prunes at BUCKET granularity - the exact-under-MOR rule (see
        there)."""
        from dataingestion_spark.lake import bloom as B
        from dataingestion_spark.lake.shardstore import ShardStore

        snap = self.snapshot()
        if not B.indexable_pk(snap.schema, [col]):
            raise ValueError(
                f"secondary index needs a string/integer column; "
                f"{col!r} is not indexable (or not in the schema)"
            )
        store = ShardStore(self.root, self._secondary_store_name(col))
        want = {
            "hash": self.BLOOM_SPEC_HASH,
            "bits_per_key": int(bits_per_key),
            "k": int(k),
            "col": col,
        }
        spec = store.spec()
        if spec is not None and not rebuild:
            if {key: spec.get(key) for key in want} != want:
                raise ValueError(
                    "secondary index already built with spec "
                    f"{ {key: spec.get(key) for key in want} }; one index, "
                    "one hash family - pass rebuild=True to re-create"
                )
        if spec is None or rebuild:
            if rebuild:
                for b in store.buckets():
                    store.drop_bucket(b)
            store.write_spec(want)
        renames = snap.properties.get("renames", {})
        indexed = dropped = covered = 0
        for b in sorted(set(snap.files) | set(snap.deltas), key=int):
            live = list(snap.files.get(b, [])) + list(snap.deltas.get(b, []))
            entries = store.load_bucket(b)
            fresh: dict[str, dict] = {}
            changed = False
            for rel in live:
                if rel in entries:
                    fresh[rel] = entries[rel]
                    continue
                frame = self._read_pk_frame(rel, [col], renames)
                if frame is None:
                    continue  # legacy file w/o the column: stays unindexed
                fresh[rel] = B.build_bitmap(frame, bits_per_key, k)
                indexed += 1
                changed = True
            stale = len(entries) - sum(1 for r in entries if r in fresh)
            if stale:
                dropped += stale
                changed = True
            covered += len(fresh)
            if changed:
                store.write_bucket(b, fresh)
        return {
            "applied": bool(indexed or dropped),
            "version": snap.version,
            "indexed": indexed,
            "dropped": dropped,
            "covered_files": covered,
        }

    def _secondary_prune(
        self, snap: Snapshot, col: str, values: list
    ) -> tuple[list[int], dict[str, list[str]]] | None:
        """(buckets, base-file map) that can hold a live row with
        ``col`` in ``values``, per the secondary bloom bitmaps; None
        when no index exists (keep everything).

        Granularity is two-level. BUCKET granularity is what keeps this
        EXACT under merge-on-read: a winning (LWW-resolved) row carries
        value V only if SOME physical row in SOME file of its bucket
        carries V, so a bucket every one of whose files provably lacks
        all requested values cannot contribute a result row - while
        dropping individual files inside a DELTA-CARRYING bucket could
        drop the newer overlay that supersedes a stale match. Inside an
        OVERLAY-FREE bucket (no delta files) no read-time resolution
        happens among base rows, so each base file stands alone and a
        file whose bloom provably lacks every requested value is pruned
        INDIVIDUALLY - post-compaction point lookups touch only the
        files that may match, not the whole bucket."""
        from dataingestion_spark.lake import bloom as B
        from dataingestion_spark.lake.shardstore import ShardStore

        store = ShardStore(self.root, self._secondary_store_name(col))
        if store.spec() is None:
            return None
        h1, h2 = B.key_hashes([(v,) for v in values])
        kept: list[int] = []
        kept_files: dict[str, list[str]] = {}
        for b in sorted(set(snap.files) | set(snap.deltas), key=int):
            base = list(snap.files.get(b, []))
            deltas = list(snap.deltas.get(b, []))
            entries = store.load_bucket(b)

            def may(rel: str) -> bool:
                e = entries.get(rel)
                return e is None or B.any_key_maybe_present(e, h1, h2)

            if deltas:
                # MOR soundness rule: all-or-nothing per bucket
                if any(may(rel) for rel in base + deltas):
                    kept.append(int(b))
                    kept_files[b] = base
            else:
                hits = [rel for rel in base if may(rel)]
                if hits:
                    kept.append(int(b))
                    kept_files[b] = hits
        return kept, kept_files

    def read_in(
        self,
        col: str,
        values: list,
        version: int | None = None,
        use_index: bool = True,
    ) -> DataFrame:
        """Live rows where ``col IN values`` for a NON-pk column - the
        lookup the bucketing can't price (it hashes the pk). With a
        secondary index (:meth:`update_secondary_index`) the scan is
        pruned to the buckets whose bitmaps may hold a value - for a
        rare value on a big table that is a handful of buckets, not a
        table scan; without one (or for unindexed new files) every
        bucket is kept and the pushed ``IN`` filter carries alone.
        Always exact: the residual filter applies after the normal
        MOR/LWW resolution, and pruning is bucket-granular (see
        :meth:`_secondary_prune` for why that is the sound unit)."""
        snap = self.snapshot(version)
        if col not in {f.name for f in snap.schema.fields}:
            raise ValueError(f"no such column: {col!r}")
        values = list(values)
        if not values:
            return self.spark.createDataFrame([], snap.schema)
        buckets, file_map = None, None
        if use_index:
            pruned = self._secondary_prune(snap, col, values)
            if pruned is not None:
                buckets, file_map = pruned
        if buckets is None:
            buckets = sorted(
                {int(b) for b in snap.files} | {int(b) for b in snap.deltas}
            )
        if not buckets:
            return self.spark.createDataFrame([], snap.schema)
        df = self._resolved(snap, buckets, file_map=file_map).filter(
            ~F.coalesce(F.col(DELETED_COL), F.lit(False))
        )
        return df.filter(F.col(col).isin(values)).select(
            *[f.name for f in snap.schema.fields]
        )

    def _read_pk_frame(self, rel: str, pk: list[str], renames: dict):
        """pk columns of one data file as a pandas frame in pk order,
        resolving renamed columns through the prior-name map; None when a
        pk column is physically absent under any known name."""
        import pyarrow.parquet as pq

        f = pq.ParquetFile(str(self.root / rel))
        names = set(f.schema_arrow.names)
        cols: list[str] = []
        for c in pk:
            for cand in [c, *renames.get(c, [])]:
                if cand in names:
                    cols.append(cand)
                    break
            else:
                return None
        frame = f.read(columns=cols).to_pandas()
        frame = frame[cols]
        frame.columns = pk
        return frame

    def _bloom_prune(
        self, snap, buckets: list[int], key_tuples: list[tuple]
    ) -> tuple[dict, dict, int] | None:
        """Bloom-test the candidate buckets' files against the requested
        keys: returns (file_map, delta_map, skipped) restricted to
        ``buckets``, or None when no index exists. Files WITHOUT an index
        entry are always kept, so correctness never depends on index
        freshness; files with an entry are dropped only when the bitmap
        PROVES none of the keys is present (no false negatives). Sound
        under merge-on-read: key-pruning keeps every file that may hold a
        requested key, so per-key LWW resolution is unchanged."""
        from dataingestion_spark.lake import bloom as B

        store = B.BloomIndexStore(self.root)
        if store.spec() is None or not key_tuples:
            return None
        h1, h2 = B.key_hashes(key_tuples)
        fmap: dict[str, list[str]] = {}
        dmap: dict[str, list[str]] = {}
        skipped = 0
        for b in buckets:
            entries = store.load_bucket(b)
            for source, out in ((snap.files, fmap), (snap.deltas, dmap)):
                kept = []
                for rel in source.get(str(b), []):
                    e = entries.get(rel)
                    if e is None or B.any_key_maybe_present(e, h1, h2):
                        kept.append(rel)
                    else:
                        skipped += 1
                out[str(b)] = kept
        return fmap, dmap, skipped

    # ------------------------------------------------------------------
    # exactly-once epoch markers
    # ------------------------------------------------------------------
    def last_applied_epoch(self, pipeline_id: str) -> int:
        pipelines = self.snapshot().properties.get("pipelines", {})
        return int(pipelines.get(pipeline_id, {}).get("last_epoch", -1))

    # ------------------------------------------------------------------
    # schema ledger (E5 state machine)
    # ------------------------------------------------------------------
    @property
    def _ledger_path(self) -> Path:
        return self.root / "_meta" / "schema_ledger.json"

    def schema_ledger(self) -> list[dict]:
        if not self._ledger_path.exists():
            return []
        return json.loads(self._ledger_path.read_text())

    def _ledger_append(self, entry: dict) -> None:
        ledger = self.schema_ledger()
        entry = {"recorded_at": time.time(), **entry}
        ledger.append(entry)
        self._ledger_path.parent.mkdir(parents=True, exist_ok=True)
        tmp = self._ledger_path.with_suffix(".tmp")
        tmp.write_text(json.dumps(ledger, indent=1))
        os.replace(tmp, self._ledger_path)

    def _resolve_schema(
        self, snap: Snapshot, batch_schema: T.StructType,
        fail_on_breaking: bool, evolution_policy: str = "full",
    ) -> tuple[T.StructType, int, str | None]:
        """The schema gate run before every merge/append: classify the
        incoming batch schema against the table schema and either continue,
        evolve, or fail fast (reference control flow
        /root/reference/spark/src/main/scala/com/example/Phase2Job.scala:85-97).

        ``evolution_policy`` constrains which NON-BREAKING changes may
        auto-apply (the controlled-evolution knob the reference's
        versioned metastore implies - a PENDING proposal gate per dataset,
        artifacts/lld/LLD.md:89-110 - expressed as a per-apply policy):

          * ``"full"``     additions AND type widenings evolve (default,
                           the reference's inferred-schema behavior)
          * ``"additive"`` new nullable columns evolve; widenings are
                           BLOCKED (frozen types: downstream readers keep
                           their column types forever)
          * ``"frozen"``   any schema change is BLOCKED (serving tables
                           with a pinned contract)

        A policy-blocked change lands in the schema ledger as BLOCKED
        exactly like a breaking one, and obeys ``fail_on_breaking`` the
        same way (raise, or skip evolution and conform the batch).

        A batch field that is NARROWER than the table's (e.g. int arriving
        after the table widened to long) is not a schema change - it
        conforms losslessly by upcast - so it is normalized to the table
        type before classification. Only genuine widenings/additions reach
        the evolution path."""
        table_fields = {f.name: f for f in snap.schema.fields}
        norm_fields = []
        for f in batch_schema.fields:
            tf = table_fields.get(f.name)
            if (
                tf is not None
                and tf.dataType != f.dataType
                and is_compatible_type_change(f.dataType, tf.dataType)
            ):
                f = T.StructField(f.name, tf.dataType, f.nullable)
            norm_fields.append(f)
        batch_schema = T.StructType(norm_fields)
        # A batch column bearing a PRIOR physical name (pre-rename) is a
        # stale producer, not an addition: silently evolving it would fork
        # the renamed column (new files would resurrect the old name that
        # read-time coalesce still resolves). Fail fast with the mapping.
        stale = self._stale_rename_fields(snap, batch_schema)
        if stale:
            detail = "; ".join(
                f"column '{old}' was renamed to '{new}'" for old, new in stale
            )
            self._ledger_append(
                {
                    "schema_version": snap.schema_version,
                    "status": SchemaStatus.BLOCKED.value,
                    "change_type": ChangeType.BREAKING.value,
                    "detail": f"batch uses pre-rename column names: {detail}",
                    "schema_json": json.loads(batch_schema.json()),
                }
            )
            if fail_on_breaking:
                raise SchemaEvolutionError(
                    f"batch uses pre-rename column names: {detail}"
                )
            return snap.schema, snap.schema_version, None
        if evolution_policy not in ("full", "additive", "frozen"):
            raise ValueError(
                f"unknown evolution_policy {evolution_policy!r}; "
                "known: full, additive, frozen"
            )
        cmp = compare_schemas(snap.schema, batch_schema)
        if cmp.change_type == ChangeType.NO_CHANGE:
            return snap.schema, snap.schema_version, None
        if cmp.change_type == ChangeType.NON_BREAKING and (
            evolution_policy == "frozen"
            or (evolution_policy == "additive" and cmp.modified)
        ):
            detail = (
                f"evolution_policy={evolution_policy} rejects non-breaking "
                f"change: {cmp.describe()}"
            )
            self._ledger_append(
                {
                    "schema_version": snap.schema_version,
                    "status": SchemaStatus.BLOCKED.value,
                    "change_type": cmp.change_type.value,
                    "detail": detail,
                    "schema_json": json.loads(batch_schema.json()),
                }
            )
            if fail_on_breaking:
                raise SchemaEvolutionError(detail)
            return snap.schema, snap.schema_version, None
        if cmp.change_type == ChangeType.BREAKING:
            self._ledger_append(
                {
                    "schema_version": snap.schema_version,
                    "status": SchemaStatus.BLOCKED.value,
                    "change_type": cmp.change_type.value,
                    "detail": cmp.describe(),
                    "schema_json": json.loads(batch_schema.json()),
                }
            )
            if fail_on_breaking:
                raise SchemaEvolutionError(
                    f"breaking schema change rejected: {cmp.describe()}"
                )
            return snap.schema, snap.schema_version, None
        # NON_BREAKING: evolve - mark old version OBSOLETE, new ACTIVE. If
        # the evolved schema matches an outstanding PENDING proposal
        # (propose_schema), this apply PROMOTES it - the reference's
        # PENDING -> ACTIVE lifecycle (/root/reference/artifacts/lld/LLD.md:103,110).
        evolved = merge_schemas(snap.schema, batch_schema)
        new_version = snap.schema_version + 1
        evolved_json = json.loads(evolved.json())
        ledger = self.schema_ledger()
        promoted = bool(
            ledger
            and ledger[-1].get("status") == SchemaStatus.PENDING.value
            and ledger[-1].get("schema_json") == evolved_json
        )
        self._ledger_append(
            {
                "schema_version": new_version,
                "status": SchemaStatus.ACTIVE.value,
                "previous_status": (
                    SchemaStatus.PENDING.value
                    if promoted
                    else SchemaStatus.OBSOLETE.value
                ),
                "change_type": cmp.change_type.value,
                "detail": cmp.describe(),
                "schema_json": evolved_json,
            }
        )
        return evolved, new_version, cmp.describe()

    @staticmethod
    def _stale_rename_fields(
        snap: Snapshot, batch_schema: T.StructType
    ) -> list[tuple[str, str]]:
        """(prior_name, current_name) pairs for batch fields that are not
        in the table schema but match a recorded pre-rename physical name."""
        table_names = {f.name for f in snap.schema.fields}
        prior_to_cur = {
            p: cur
            for cur, priors in snap.properties.get("renames", {}).items()
            for p in priors
        }
        return [
            (f.name, prior_to_cur[f.name])
            for f in batch_schema.fields
            if f.name not in table_names and f.name in prior_to_cur
        ]

    def propose_schema(self, schema: T.StructType) -> dict | None:
        """Register a schema-evolution REQUEST as a PENDING version - the
        reference's ADD COLUMN / drop-column admin flow creates a PENDING
        row that the next successful apply promotes to ACTIVE
        (/root/reference/artifacts/lld/LLD.md:103,110,122). Returns the
        ledger entry (None when the proposal is a no-op); raises on a
        breaking proposal, recording it BLOCKED."""
        snap = self.snapshot()
        stale = self._stale_rename_fields(snap, schema)
        if stale:
            detail = "; ".join(
                f"column '{old}' was renamed to '{new}'" for old, new in stale
            )
            raise SchemaEvolutionError(
                f"proposal uses pre-rename column names: {detail}"
            )
        cmp = compare_schemas(snap.schema, schema)
        if cmp.change_type == ChangeType.NO_CHANGE:
            return None
        if cmp.change_type == ChangeType.BREAKING:
            self._ledger_append(
                {
                    "schema_version": snap.schema_version,
                    "status": SchemaStatus.BLOCKED.value,
                    "change_type": cmp.change_type.value,
                    "detail": cmp.describe(),
                    "schema_json": json.loads(schema.json()),
                }
            )
            raise SchemaEvolutionError(
                f"breaking schema proposal rejected: {cmp.describe()}"
            )
        evolved = merge_schemas(snap.schema, schema)
        entry = {
            "schema_version": snap.schema_version + 1,
            "status": SchemaStatus.PENDING.value,
            "change_type": cmp.change_type.value,
            "detail": cmp.describe(),
            "schema_json": json.loads(evolved.json()),
        }
        self._ledger_append(entry)
        return entry

    # ------------------------------------------------------------------
    # writes
    # ------------------------------------------------------------------
    def _single_exchange_layout(
        self,
        df: DataFrame,
        pk: list[str],
        touched: list[int],
        hot: list[str],
        salt_buckets: int,
    ) -> tuple[DataFrame, list[str], int]:
        """Repartition ONCE by the write-layout keys; returns
        (df, layout key names to prepend to the LWW grouping, partition
        count). The grouping must CONTAIN the partitioning keys so
        Catalyst elides the aggregate's own exchange - the fold and the
        per-bucket file write then share one shuffle.

        The cold path (no hot keys) deliberately carries NO salt column:
        ``_salt = lit(0)`` constant-folds, and a HashPartitioning over
        ``Literal(0)`` can never semantically match the aggregate's
        grouping attribute, so Catalyst re-inserts the exchange - sized by
        spark.sql.shuffle.partitions, scattering every bucket across every
        reduce task (measured: 16 files/bucket instead of 1). Bucket-only
        layout keeps the proof intact. The hot path's salt is a real
        when/otherwise expression (operators/salting.py) and survives."""
        if hot and salt_buckets > 1:
            df = with_salt(
                df, hot, salt_buckets,
                key=pk[0], sub_key=pk[1] if len(pk) > 1 else pk[0],
            )
            target_parts = max(len(touched), 1) * salt_buckets
            return (
                df.repartition(target_parts, F.col(BUCKET_COL), F.col(SALT_COL)),
                [BUCKET_COL, SALT_COL],
                target_parts,
            )
        target_parts = max(len(touched), 1)
        return (
            df.repartition(target_parts, F.col(BUCKET_COL)),
            [BUCKET_COL],
            target_parts,
        )

    def _write_data_files(
        self,
        df: DataFrame,
        target_partitions: int,
        pre_partitioned: bool = False,
        cluster_by: list | None = None,
        bloom_cols: list[str] | None = None,
        max_records_per_file: int | None = None,
    ) -> dict[str, list[str]]:
        """Write rows (must carry BUCKET_COL, and SALT_COL if salted) as
        immutable files under a fresh commit dir; returns bucket->files.

        Repartitioning by (_bucket, _salt) makes file writes line up with
        the bucket layout while letting hot buckets fan out across salt
        sub-partitions (the reconcile is metadata-only: all of a bucket's
        salted files are listed under that bucket in the manifest).
        ``pre_partitioned=True`` skips that exchange: the caller already
        partitioned the plan by (_bucket, _salt) - the single-exchange
        merge plans do this BEFORE their per-key aggregate so the fold and
        the file layout share one shuffle.

        ``bloom_cols`` writes parquet BLOOM FILTERS for those columns
        (the Hudi bloom-index analog, executor-side, zero driver cost):
        point lookups with a pushed key predicate then skip row groups
        whose bloom provably lacks the key - the probabilistic complement
        of clustered compaction's min/max sort. Deliberately NOT set on
        the ingest hot path (blooms cost write time per row); compaction
        and DML rewrites - already off the hot path, already read-
        optimizing - pass the pk here."""
        commit_id = uuid.uuid4().hex[:12]
        commit_dir = self.root / "data" / commit_id
        out = df.withColumn(_PARTITION_DIR_COL, F.col(BUCKET_COL))
        if not pre_partitioned:
            part_cols = [BUCKET_COL] + (
                [SALT_COL] if SALT_COL in df.columns else []
            )
            out = out.repartition(
                target_partitions, *[F.col(c) for c in part_cols]
            )
        if SALT_COL in df.columns:
            out = out.drop(SALT_COL)
        if cluster_by:
            # Cluster rows inside each written file: sort by (_pb, keys)
            # so parquet row groups carry tight key/ts ranges for
            # row-group pruning. Entries may be column NAMES or arbitrary
            # Column EXPRESSIONS (the z-order Morton code rides here as a
            # pure sort expression - never materialized as a column, so
            # file schemas stay clean). The partition column leads the
            # sort so the file writer's required ordering is a prefix of
            # ours and it inserts NO second sort of its own.
            out = out.sortWithinPartitions(
                _PARTITION_DIR_COL,
                *[F.col(c) if isinstance(c, str) else c for c in cluster_by],
            )
        writer = out.write
        if max_records_per_file:
            # Split each bucket's sorted run into bounded files: with a
            # z-order/cluster sort upstream, every split file carries a
            # TIGHT min/max sidecar range on the cluster columns, turning
            # in-file row-group pruning into whole-file skipping.
            writer = writer.option("maxRecordsPerFile", int(max_records_per_file))
        if bloom_cols:
            for c in bloom_cols:
                writer = writer.option(
                    f"parquet.bloom.filter.enabled#{c}", "true"
                )
            # Right-size by observed ndv (4x smaller than the fixed 1MB
            # default in measurement). Chunks that stay fully dictionary-
            # encoded skip the bloom entirely - the dictionary is already
            # an exact membership filter - so small tables pay ~0 bytes
            # and blooms appear exactly when cardinality forces plain
            # encoding, i.e. when they start being needed.
            writer = writer.option("parquet.bloom.filter.adaptive.enabled", "true")
        writer.partitionBy(_PARTITION_DIR_COL).mode("append").parquet(
            str(commit_dir)
        )
        files: dict[str, list[str]] = {}
        for bdir in sorted(commit_dir.glob(f"{_PARTITION_DIR_COL}=*")):
            bucket = bdir.name.split("=", 1)[1]
            rels = [
                str(p.relative_to(self.root)) for p in sorted(bdir.glob("*.parquet"))
            ]
            if rels:
                files[bucket] = rels
        if self.COLLECT_FILE_STATS:
            self._write_stats_sidecar(commit_dir, files)
        return files

    # ------------------------------------------------------------------
    # file-level column stats + data skipping (Delta add.stats analog)
    # ------------------------------------------------------------------
    # Per-commit sidecar `data/<commit>/.stats.json`: file -> column ->
    # [min, max] for numeric/timestamp/string columns (timestamps as epoch
    # micros). String bounds are sidecar-size-bounded via BOUND-PRESERVING
    # truncation (_trunc_lower/_trunc_upper - Iceberg's truncate-transform
    # upper-bound adjustment): a plain prefix stays a valid min, the max
    # prefix gets its last code point incremented so it sorts above every
    # string it covers. Wrong-side truncation would prune matching files;
    # these bounds only ever widen.
    # Sidecars ride the commit dir, so the manifest format, chunk sealing,
    # structural sharing and vacuum are untouched, and pre-stats commits
    # degrade to "no pruning for those files" - never a wrong answer.
    COLLECT_FILE_STATS = True

    # read_keys pushes IN(<first pk>) to the scan up to this many distinct
    # values; beyond it the literal list costs more than it prunes and the
    # exact semi-join carries alone.
    PUSHDOWN_MAX_KEYS = 10_000

    # read_keys/read_prefix honor broadcast_keys only up to this many
    # keys (measured on the materialized key relation): an explicit
    # broadcast hint bypasses autoBroadcastJoinThreshold, and a
    # change-volume-sized key set (sync_scd2/sync_aggregate route whole
    # epochs' dirty keys through these reads) must shuffle-join rather
    # than be funneled through the driver onto every executor. 10^6
    # short key rows is a few tens of MB broadcast - comfortably inside
    # executor memory at any table size.
    BROADCAST_KEYS_MAX = 1_000_000

    @staticmethod
    def _stat_value(v):
        import datetime

        if isinstance(v, datetime.datetime):
            if v.tzinfo is None:
                v = v.replace(tzinfo=datetime.timezone.utc)
            # Exact integer epoch-micros. float(timestamp())*1e6 has ~0.24us
            # ulp at the current epoch; a 1us truncation error on EITHER the
            # file stat or the predicate bound can wrongly prune a file whose
            # min/max equals the bound - a wrong answer, not a missed
            # optimization.
            d = v - datetime.datetime(1970, 1, 1, tzinfo=datetime.timezone.utc)
            return d.days * 86_400_000_000 + d.seconds * 1_000_000 + d.microseconds
        if isinstance(v, datetime.date):
            return v.toordinal()
        if isinstance(v, str):
            # UTF-8 byte order == code-point order, and Spark's string
            # comparison is code-point order too, so parquet string
            # min/max are directly comparable to string predicate bounds.
            return v
        if isinstance(v, bool) or not isinstance(v, (int, float)):
            return None
        return v

    _STAT_STR_TRUNC = 64

    @classmethod
    def _trunc_lower(cls, s: str) -> str:
        """Sidecar-size-bounded LOWER bound: a prefix sorts <= the full
        string, so plain truncation keeps min valid."""
        return s[: cls._STAT_STR_TRUNC]

    @classmethod
    def _trunc_upper(cls, s: str) -> str:
        """Sidecar-size-bounded UPPER bound (Iceberg's truncate transform
        for max): a plain prefix would sort BELOW the value it bounds, so
        increment the last incrementable code point of the prefix -
        strictly greater than every string sharing the prefix. Falls back
        to the full value when nothing is incrementable."""
        if len(s) <= cls._STAT_STR_TRUNC:
            return s
        p = s[: cls._STAT_STR_TRUNC]
        for i in range(len(p) - 1, -1, -1):
            c = ord(p[i]) + 1
            if 0xD800 <= c <= 0xDFFF:
                c = 0xE000  # skip the surrogate gap (not JSON-encodable)
            if c <= 0x10FFFF:
                return p[:i] + chr(c)
        return s

    def _write_stats_sidecar(
        self, commit_dir: Path, files: dict[str, list[str]]
    ) -> None:
        """Footer-scan the commit's new files (driver-side, O(new files)
        per epoch - the same order as the manifest write itself). A real
        cluster writer would collect these inline like Iceberg's writers;
        the footer pass is the spark-local stand-in."""
        import pyarrow.parquet as pq

        stats: dict[str, dict[str, list]] = {}
        for rels in files.values():
            for rel in rels:
                md = pq.ParquetFile(str(self.root / rel)).metadata
                cols: dict[str, list] = {}
                for rg in range(md.num_row_groups):
                    g = md.row_group(rg)
                    for ci in range(g.num_columns):
                        c = g.column(ci)
                        s = c.statistics
                        if s is None or not s.has_min_max or "." in c.path_in_schema:
                            continue
                        lo = self._stat_value(s.min)
                        hi = self._stat_value(s.max)
                        if lo is None or hi is None:
                            continue
                        name = c.path_in_schema
                        if name in cols:
                            cols[name] = [min(cols[name][0], lo), max(cols[name][1], hi)]
                        else:
                            cols[name] = [lo, hi]
                for name, (lo, hi) in cols.items():
                    if isinstance(lo, str):
                        # bound-preserving truncation keeps sidecars
                        # small for long text-ish columns
                        cols[name] = [
                            self._trunc_lower(lo), self._trunc_upper(hi)
                        ]
                # Exact file row count (free: the footer is already
                # open). Keyed so it can never collide with a real
                # column; consumers do keyed lookups only. Used by the
                # COW merge's table-vs-batch ratio gate.
                cols["__rows__"] = md.num_rows
                stats[rel] = cols
        (commit_dir / ".stats.json").write_text(json.dumps(stats))

    def _base_rows(self, snap: Snapshot, buckets: list[int]) -> int | None:
        """Exact row count of the BASE files under ``buckets``, from the
        stats sidecars - driver-side, O(files), cached per commit dir.
        None when any file predates row-count sidecars (legacy commits):
        the caller must then assume nothing about table size."""
        rels = [
            f for b in buckets for f in snap.files.get(str(b), [])
        ]
        if not rels:
            return 0
        stats = self._stats_for(rels)
        total = 0
        for rel in rels:
            n = stats.get(rel, {}).get("__rows__")
            if n is None:
                return None
            total += int(n)
        return total

    def _stats_for(self, rel_files: list[str]) -> dict[str, dict[str, list]]:
        """Load the stats covering ``rel_files`` (per-commit sidecars,
        cached per handle). Files without stats simply don't appear."""
        out: dict[str, dict[str, list]] = {}
        dirs = {str(Path(rel).parent.parent) for rel in rel_files}
        for d in dirs:
            if d not in self._stats_cache:
                p = self.root / d / ".stats.json"
                self._stats_cache[d] = (
                    json.loads(p.read_text()) if p.is_file() else {}
                )
                while len(self._stats_cache) > 64:
                    self._stats_cache.pop(next(iter(self._stats_cache)))
        for rel in rel_files:
            s = self._stats_cache.get(str(Path(rel).parent.parent), {}).get(rel)
            if s:
                out[rel] = s
        return out

    @classmethod
    def _bound_value(cls, v):
        """Stat-comparable form of a pruning bound, or None when the bound's
        type has no collected stats (arrays, binary, ...). Unsupported
        bounds never raise: pruning silently keeps every file and the exact
        residual filter decides - so read(where=...) behaves identically
        whether or not the table happens to carry MOR deltas."""
        return cls._stat_value(v)

    def candidate_files(
        self,
        version: int | None = None,
        buckets: list[int] | None = None,
        where: dict[str, tuple] | None = None,
    ) -> tuple[dict[str, list[str]], int]:
        """Stats-pruned base-file map for a read: drop every file whose
        [min, max] for some predicate column cannot intersect the bound.
        Returns (kept file map, total candidate count). Files lacking
        stats for a column are KEPT (legacy commits, string columns)."""
        snap = self.snapshot(version)
        source = (
            snap.files
            if buckets is None
            else {str(b): snap.files.get(str(b), []) for b in buckets}
        )
        total = sum(len(v) for v in source.values())
        if not where:
            return {b: list(fl) for b, fl in source.items() if fl}, total
        bounds: dict[str, tuple] = {}
        for c, (lo, hi) in where.items():
            blo = None if lo is None else self._bound_value(lo)
            bhi = None if hi is None else self._bound_value(hi)
            if (lo is not None and blo is None) or (
                hi is not None and bhi is None
            ):
                # Unsupported bound type for this column: no pruning on it
                # (all files kept), the residual filter stays exact.
                continue
            bounds[c] = (blo, bhi)
        all_files = [f for fl in source.values() for f in fl]
        stats = self._stats_for(all_files)
        # stats sidecars record the column name CURRENT AT WRITE TIME, so a
        # predicate on a renamed column must also consult its prior names
        renames = snap.properties.get("renames", {})
        aliases = {c: [c] + renames.get(c, []) for c in bounds}
        kept: dict[str, list[str]] = {}
        for b, fl in source.items():
            keep = []
            for rel in fl:
                s = stats.get(rel)
                drop = False
                if s:
                    for c, (lo, hi) in bounds.items():
                        name = next((n for n in aliases[c] if n in s), None)
                        if name is not None:
                            fmin, fmax = s[name]
                            ref = hi if hi is not None else lo
                            if isinstance(fmin, str) != isinstance(ref, str):
                                # stat/bound type drift (e.g. legacy sidecar
                                # before a type change): keep the file, the
                                # residual filter stays exact
                                continue
                            if (hi is not None and fmin > hi) or (
                                lo is not None and fmax < lo
                            ):
                                drop = True
                                break
                if not drop:
                    keep.append(rel)
            if keep:
                kept[b] = keep
        return kept, total

    def _conform(self, df: DataFrame, schema: T.StructType) -> DataFrame:
        """Project/cast a batch to the (possibly evolved) table schema:
        missing columns become typed nulls, widenable columns are cast."""
        cols = []
        for f in schema.fields:
            if f.name in df.columns:
                cols.append(F.col(f.name).cast(f.dataType).alias(f.name))
            else:
                cols.append(F.lit(None).cast(f.dataType).alias(f.name))
        extra = [
            c
            for c in df.columns
            if c in (LSN_COL, DELETED_COL, BUCKET_COL, SALT_COL, _OP_COL)
        ]
        return df.select(*cols, *[F.col(c) for c in extra])

    def _append_once(
        self,
        df: DataFrame,
        pipeline_id: str | None = None,
        epoch_id: int | None = None,
        fail_on_breaking: bool = True,
        evolution_policy: str = "full",
        lineage: dict | None = None,
    ) -> Snapshot | None:
        """Insert-only write (the reference's Parquet append mode,
        /root/reference/spark/src/main/scala/com/example/Phase2Job.scala:131-135),
        with the same schema gate and epoch idempotency as merge."""
        snap = self.snapshot()
        if (
            pipeline_id is not None
            and epoch_id is not None
            and epoch_id <= self.last_applied_epoch(pipeline_id)
        ):
            return None
        batch_schema = T.StructType(
            [
                T.StructField(f.name, f.dataType, True)
                for f in df.schema.fields
                if not f.name.startswith("_")
            ]
        )
        schema, schema_version, evo = self._resolve_schema(
            snap, batch_schema, fail_on_breaking, evolution_policy
        )
        data = self._conform(df, schema)
        key = snap.pk_fields[0]
        data = data.withColumn(BUCKET_COL, bucket_expr(key, snap.num_buckets))
        data = data.withColumn(LSN_COL, F.lit(None).cast("long")).withColumn(
            DELETED_COL, F.lit(False)
        )
        new_files = self._write_data_files(data, target_partitions=snap.num_buckets)
        files = {k: list(v) for k, v in snap.files.items()}
        for b, fl in new_files.items():
            files.setdefault(b, [])
            files[b] = files[b] + fl
        return self._commit_write(
            snap, files, schema, schema_version, "append", pipeline_id, epoch_id,
            {"evolution": evo, **(lineage or {})},
        )

    def _commit_write(
        self,
        parent: Snapshot,
        files: dict[str, list[str]],
        schema: T.StructType,
        schema_version: int,
        operation: str,
        pipeline_id: str | None,
        epoch_id: int | None,
        summary: dict,
        deltas: dict[str, list[str]] | None = None,
        partial_buckets_add: list[str] | None = None,
        properties_update: dict | None = None,
    ) -> Snapshot:
        while True:
            props = json.loads(json.dumps(parent.properties))  # deep copy
            if properties_update:
                props.update(json.loads(json.dumps(properties_update)))
            if pipeline_id is not None and epoch_id is not None:
                props.setdefault("pipelines", {})[pipeline_id] = {
                    "last_epoch": int(epoch_id)
                }
            # partial_delta_buckets tracks which buckets' delta chains
            # contain per-column overlay rows (update_mode='partial' MOR
            # commits) and therefore need the partial-aware read
            # resolution. Invariant kept here for EVERY commit: a bucket
            # leaves the set the moment its delta chain is cleared (COW
            # rewrite or compaction folds overlays into full rows).
            eff_deltas = deltas if deltas is not None else parent.deltas
            plist = {
                b
                for b in props.get("partial_delta_buckets", [])
                if eff_deltas.get(str(b))
            }
            plist.update(partial_buckets_add or [])
            if plist:
                props["partial_delta_buckets"] = sorted(plist, key=int)
            else:
                props.pop("partial_delta_buckets", None)
            snap = Snapshot(
                version=parent.version + 1,
                parent=parent.version,
                schema_json=json.loads(schema.json()),
                schema_version=schema_version,
                num_buckets=parent.num_buckets,
                pk_fields=parent.pk_fields,
                order_fields=parent.order_fields,
                files=files,
                properties=props,
                operation=operation,
                summary={k: v for k, v in summary.items() if v is not None},
                deltas=(
                    deltas
                    if deltas is not None
                    else {k: list(v) for k, v in parent.deltas.items()}
                ),
            )
            try:
                return self._commit(snap, parent=parent)
            except CommitConflictError:
                head, files, deltas = self._rebase_onto_head(
                    parent, files, deltas, pipeline_id, epoch_id
                )  # raises the conflict onward when not provably safe
                parent = head

    def _rebase_onto_head(
        self,
        parent: Snapshot,
        files: dict[str, list[str]],
        deltas: dict[str, list[str]] | None,
        pipeline_id: str | None,
        epoch_id: int | None,
    ) -> tuple[Snapshot, dict[str, list[str]], dict[str, list[str]] | None]:
        """Metadata-level commit rebase (Iceberg's cheap retry): after
        losing the snapshot race, re-point this commit's ALREADY-COMPUTED
        outputs at the new head instead of re-running the Spark job -
        valid only when the result provably doesn't depend on what the
        intervening commits changed. Conservative rules; anything else
        re-raises and the operation-level retry recomputes:

          * schema raced -> recompute (the job conformed to a stale
            schema).
          * intervening commits touch NONE of our changed buckets -> our
            outputs are independent of them; splice our bucket lists onto
            the head's.
          * intervening commits touch our buckets but are ALL
            state-preserving compactions (no tombstone purge) -> a COW
            rewrite or a fresh delta computed from the pre-compaction
            rows is still byte-correct against the compacted base (same
            logical rows; delta rows order above any base row), so the
            splice remains valid. An intervening MERGE on our buckets
            always recomputes - its rows must feed our fold.

        Splice rule per changed bucket: an append-style change (our list
        extends the parent's) keeps the head's list plus our new suffix;
        a replace-style change (COW rewrite, compaction, delta clear)
        keeps ours wholesale."""
        try:
            head = self.snapshot()
            if head.schema_version != parent.schema_version:
                raise CommitConflictError("schema raced during commit")
            if head.num_buckets != parent.num_buckets:
                # a rebucket re-hashed the layout: our outputs were bucketed
                # under the OLD transform, so no splice can be valid - even
                # for buckets the naive disjointness check wouldn't flag
                raise CommitConflictError("bucket layout raced during commit")
            if pipeline_id is not None and epoch_id is not None:
                marker = (
                    head.properties.get("pipelines", {})
                    .get(pipeline_id, {})
                    .get("last_epoch", -1)
                )
                if int(marker) >= int(epoch_id):
                    # a racing clone of OUR pipeline already landed this
                    # epoch - splicing would double-apply it; the
                    # operation-level retry skips idempotently instead
                    raise CommitConflictError(
                        f"epoch {epoch_id} of {pipeline_id} committed "
                        "concurrently"
                    )
            eff_deltas = deltas if deltas is not None else dict(parent.deltas)
            ours_f = {
                b
                for b in set(files) | set(parent.files)
                if files.get(b, []) != parent.files.get(b, [])
            }
            ours_d = {
                b
                for b in set(eff_deltas) | set(parent.deltas)
                if eff_deltas.get(b, []) != parent.deltas.get(b, [])
            }
            ours = ours_f | ours_d
            theirs = {str(b) for b in self.changed_buckets(parent.version, head.version)}
            if ours & theirs:
                for v in range(parent.version + 1, head.version + 1):
                    s = self.snapshot(v)
                    if s.operation != "compact" or s.summary.get("purged_below_lsn"):
                        raise CommitConflictError(
                            f"concurrent {s.operation} touched this commit's "
                            "buckets; recompute required"
                        )

            def _splice(ours_set, our_map, par_map, head_map):
                out = {b: list(fl) for b, fl in head_map.items()}
                for b in ours_set:
                    mine = our_map.get(b, [])
                    par = par_map.get(b, [])
                    if par and mine[: len(par)] == par:
                        out[b] = head_map.get(b, []) + mine[len(par):]
                    else:
                        out[b] = list(mine)
                    if not out[b]:
                        out.pop(b, None)
                return out

            new_files = _splice(ours_f, files, parent.files, head.files)
            new_deltas = (
                None
                if deltas is None
                else _splice(ours_d, eff_deltas, parent.deltas, head.deltas)
            )
            return head, new_files, new_deltas
        except CommitConflictError:
            raise
        except Exception as e:  # pragma: no cover - unexpected: stay safe
            raise CommitConflictError(f"rebase aborted: {e!r}") from e

    # ------------------------------------------------------------------
    # MERGE - the heart of the engine
    # ------------------------------------------------------------------
    # Optimistic-concurrency retry (Iceberg's commit loop): a writer that
    # loses the O_EXCL snapshot race re-runs its WHOLE operation against
    # the winner's freshly-committed state - every *_once body re-reads
    # self.snapshot() and re-checks its epoch marker at entry, so a retry
    # after a same-pipeline duplicate commit degrades to the idempotent
    # skip, and a retry after an unrelated commit (compaction racing the
    # ingest writer) recomputes against the new file layout. Data files
    # written by a failed attempt are unreferenced and reclaimed by
    # vacuum().
    #
    # Contention model: a losing commit first tries a METADATA-LEVEL
    # REBASE (_rebase_onto_head - Iceberg's cheap retry): when the
    # intervening commits provably cannot affect this commit's outputs
    # (they touch disjoint buckets, or are state-preserving compactions
    # of ours), the already-computed files are re-pointed at the new head
    # in O(ms) with no Spark re-run - so the ingest writer can never be
    # starved by maintenance. Only a TRUE overlap (a concurrent MERGE
    # into our buckets, a schema race, a purging compaction) falls back
    # to the full recompute below, and only a sustained stream of such
    # overlaps exhausts the budget - at which point CommitConflictError
    # surfaces and maintenance loops treat it as "yield to the writer".
    COMMIT_RETRIES = 3

    def _retry_commit(self, fn):
        for attempt in range(self.COMMIT_RETRIES + 1):
            try:
                return fn()
            except CommitConflictError:
                if attempt == self.COMMIT_RETRIES:
                    # sustained contention: surface it - under a busy
                    # ingest writer a maintenance pass SHOULD yield rather
                    # than spin (callers loop anyway)
                    raise
                # linear backoff so the retry doesn't re-race the very
                # next commit of a busy writer (amount is irrelevant next
                # to the recompute the retry performs)
                time.sleep(0.05 * (attempt + 1))

    def merge(self, changes: DataFrame, **kwargs) -> Snapshot | None:
        """Keyed MERGE upsert with optimistic commit retries; semantics
        and parameters documented on :meth:`_merge_once`."""
        return self._retry_commit(lambda: self._merge_once(changes, **kwargs))

    def append(self, df: DataFrame, **kwargs) -> Snapshot | None:
        """Insert-only append with optimistic commit retries; see
        :meth:`_append_once`."""
        return self._retry_commit(lambda: self._append_once(df, **kwargs))

    def compact(self, **kwargs) -> Snapshot:
        """Compaction with optimistic commit retries (it races ingest
        writers by design - maintenance runs off the hot path); see
        :meth:`_compact_once`."""
        return self._retry_commit(lambda: self._compact_once(**kwargs))

    # ------------------------------------------------------------------
    # table sort order (Iceberg sort-order / Delta OPTIMIZE ZORDER analog)
    # ------------------------------------------------------------------
    def sort_order(self) -> dict | None:
        """The persistent sort order, ``{"cols": [...], "mode":
        "linear"|"zorder"}``, or None when the table keeps the default
        pk clustering."""
        so = self.snapshot().properties.get("sort_order")
        return dict(so) if so else None

    def _validate_cluster_spec(
        self, snap: Snapshot, cols: list[str], mode: str
    ) -> None:
        from dataingestion_spark.lake.zorder import (
            MAX_ZORDER_COLS, is_zorderable,
        )

        if mode not in ("linear", "zorder"):
            raise ValueError(f"unknown cluster mode {mode!r}")
        by_name = {f.name: f.dataType for f in snap.schema.fields}
        unknown = [c for c in cols if c not in by_name]
        if unknown:
            raise ValueError(f"cluster columns not in schema: {unknown}")
        if mode == "zorder":
            if not 1 <= len(cols) <= MAX_ZORDER_COLS:
                raise ValueError(
                    f"zorder takes 1..{MAX_ZORDER_COLS} columns, "
                    f"got {len(cols)}"
                )
            bad = [c for c in cols if not is_zorderable(by_name[c])]
            if bad:
                raise ValueError(
                    "zorder needs numeric/timestamp/date/boolean/string "
                    f"columns; unsupported: {bad}"
                )

    def _resolve_cluster_spec(
        self,
        snap: Snapshot,
        cluster_cols: list[str] | None,
        cluster_mode: str | None,
    ) -> tuple[list[str] | None, str | None]:
        """Effective (cols, mode) for a rewrite: explicit arguments win,
        then the table's persistent sort order, then (None, None) -
        caller falls back to pk clustering."""
        if cluster_cols:
            mode = cluster_mode or "linear"
            self._validate_cluster_spec(snap, list(cluster_cols), mode)
            return list(cluster_cols), mode
        so = snap.properties.get("sort_order")
        if so:
            cols, mode = list(so["cols"]), cluster_mode or so["mode"]
            self._validate_cluster_spec(snap, cols, mode)
            return cols, mode
        if cluster_mode:
            raise ValueError(
                "cluster_mode given without cluster_cols and the table "
                "has no persistent sort order (set_sort_order)"
            )
        return None, None

    def set_sort_order(
        self, cols: list[str] | None, mode: str = "zorder"
    ) -> Snapshot:
        """Declare the table's persistent sort order (Iceberg
        ``ALTER TABLE ... WRITE ORDERED BY`` analog) - METADATA-ONLY:
        no rewrite happens here. Every subsequent compaction without an
        explicit ``cluster_cols`` applies it (including the
        ``maybe_compact`` maintenance policy), so the declared layout is
        restored continuously as ingest dirties buckets, instead of by
        remembering the right flags on every ops invocation.
        ``cols=None`` clears the order (back to pk clustering). The
        rewrite itself stays off the ingest hot path - merges never
        sort; only compaction pays."""

        def _once() -> Snapshot:
            snap = self.snapshot()
            props = json.loads(json.dumps(snap.properties))
            if cols:
                self._validate_cluster_spec(snap, list(cols), mode)
                props["sort_order"] = {"cols": list(cols), "mode": mode}
            else:
                props.pop("sort_order", None)
            out = Snapshot(
                version=snap.version + 1,
                parent=snap.version,
                schema_json=json.loads(snap.schema.json()),
                schema_version=snap.schema_version,
                num_buckets=snap.num_buckets,
                pk_fields=list(snap.pk_fields),
                order_fields=list(snap.order_fields),
                files={k: list(v) for k, v in snap.files.items()},
                properties=props,
                operation="set-sort-order",
                summary={"sort_order": props.get("sort_order")},
                deltas={k: list(v) for k, v in snap.deltas.items()},
            )
            return self._commit(out, parent=snap)

        return self._retry_commit(_once)

    def _zorder_bounds(
        self,
        snap: Snapshot,
        cols: list[str],
        target: list[int],
        df: DataFrame,
    ) -> dict[str, tuple]:
        """Quantization bounds for the z columns, in stat units. Primary
        source: the file-stats sidecars of every referenced file in the
        target buckets (driver-side, zero Spark jobs). Columns some file
        doesn't cover (legacy commits, all-null files) fall back to ONE
        min/max aggregate over the rewrite input - a single extra scan of
        exactly the buckets being rewritten, worst case."""
        from dataingestion_spark.lake.zorder import string_embed

        by_name = {f.name: f.dataType for f in snap.schema.fields}

        def _to_quant(c: str, v):
            """Stat value -> quantization units: strings embed via their
            6-byte UTF-8 prefix (matching norm_expr's executor-side
            embedding; the sidecars' bound-preserving truncation keeps
            min <= data <= max, and the first 6 bytes survive the 64-char
            truncation untouched)."""
            if isinstance(v, str):
                return (
                    string_embed(v)
                    if isinstance(by_name.get(c), T.StringType)
                    else None
                )
            if isinstance(v, bool):
                return int(v)
            return v if isinstance(v, (int, float)) else None

        rels = [
            f
            for b in target
            for f in (
                snap.files.get(str(b), []) + snap.deltas.get(str(b), [])
            )
        ]
        stats = self._stats_for(rels)
        bounds: dict[str, tuple] = {}
        missing: list[str] = []
        for c in cols:
            lo = hi = None
            covered = bool(rels)
            for rel in rels:
                s = stats.get(rel, {}).get(c)
                qlo = _to_quant(c, s[0]) if s else None
                qhi = _to_quant(c, s[1]) if s else None
                if qlo is None or qhi is None:
                    covered = False
                    break
                lo = qlo if lo is None else min(lo, qlo)
                hi = qhi if hi is None else max(hi, qhi)
            if covered and lo is not None:
                bounds[c] = (lo, hi)
            else:
                missing.append(c)
        if missing:
            row = df.select(
                *[F.min(c).alias(f"lo_{c}") for c in missing],
                *[F.max(c).alias(f"hi_{c}") for c in missing],
            ).collect()[0]
            for c in missing:
                lo, hi = row[f"lo_{c}"], row[f"hi_{c}"]
                # booleans and strings quantize on their embeddings; the
                # raw aggregate values convert through the same mapping
                # the sidecar path uses
                lo = _to_quant(c, self._stat_value(lo) if not isinstance(lo, (bool, str)) else lo)
                hi = _to_quant(c, self._stat_value(hi) if not isinstance(hi, (bool, str)) else hi)
                bounds[c] = (lo, hi)
        return bounds

    def rollback(self, version: int | str) -> Snapshot:
        """Roll the table back to an earlier snapshot's state (Iceberg
        ``rollback_to_snapshot`` analog) - the bad-deploy recovery move: a
        broken transformer or misfired DML landed, point the table at the
        last good state and let the stream re-apply from there.

        Implemented as a NEW commit (operation ``rollback``) whose
        files/deltas/schema/properties are the target snapshot's -
        history is preserved (the bad versions remain time-travelable
        until expired) and concurrent writers race through the normal
        optimistic-commit path. The target's PIPELINE EPOCH MARKERS come
        back with it deliberately: epochs applied after the target point
        are no longer marked, so a resumed stream RE-APPLIES them -
        rolling back data without rolling back the exactly-once cursor
        would silently drop those epochs forever. ``version`` may be a
        number or a tag name; the target must still be retained."""

        def _once() -> Snapshot:
            target = self.snapshot(version)
            cur = self.snapshot()
            if target.version == cur.version:
                return cur
            snap = Snapshot(
                version=cur.version + 1,
                parent=cur.version,
                schema_json=json.loads(target.schema.json()),
                schema_version=target.schema_version,
                num_buckets=target.num_buckets,
                pk_fields=target.pk_fields,
                order_fields=target.order_fields,
                files={k: list(v) for k, v in target.files.items()},
                properties=json.loads(json.dumps(target.properties)),
                operation="rollback",
                summary={"rolled_back_to": target.version},
                deltas={k: list(v) for k, v in target.deltas.items()},
            )
            return self._commit(snap, parent=cur)

        return self._retry_commit(_once)

    def rebucket(self, new_num_buckets: int) -> Snapshot:
        """Change the table's bucket count with optimistic commit retries;
        see :meth:`_rebucket_once`."""
        return self._retry_commit(lambda: self._rebucket_once(new_num_buckets))

    def rename_column(self, old: str, new: str) -> Snapshot:
        """Rename a column METADATA-ONLY (Iceberg ``ALTER TABLE ... RENAME
        COLUMN`` analog): no data file is touched. Iceberg carries renames
        via immutable field IDs; parquet-over-directory has only names, so
        the same contract is kept with a PRIOR-NAME MAP
        (``properties["renames"]``: current -> [prior physical names,
        newest first]) that every read resolves through - files written
        before the rename still store the old column name and project as
        ``coalesce(new, old)`` (exact: any one file contains at most one
        of the names). Writes after the rename use the new name; a batch
        still producing the OLD name is rejected by the schema gate with
        the rename mapping in the error (stale-producer fail-fast), and
        adding a fresh column that reuses a prior name is likewise
        refused - that name is still live inside old files, and the
        read-time coalesce could not tell the two columns apart. For the
        same reason renaming BACK to a prior name is refused until
        :meth:`retire_renames` proves no referenced file still carries it.

        Renaming a pk or order field is allowed: bucketing hashes VALUES,
        not names, so the layout is untouched; ``pk_fields`` /
        ``order_fields`` follow the rename atomically in the same commit.

        Scale shape: O(1) driver-side - one snapshot json write; the
        rename never triggers a data rewrite at any table size (the
        Iceberg guarantee). Read-side cost is one codegen'd ``coalesce``
        per renamed column until :meth:`retire_renames`; note filter
        PUSHDOWN on a renamed column is lost while the map is active
        (the predicate sits above the coalesce), the file-level min/max
        skipping in :meth:`candidate_files` still applies via prior-name
        stats lookup."""

        def _once() -> Snapshot:
            snap = self.snapshot()
            names = {f.name for f in snap.schema.fields}
            if old not in names:
                raise ValueError(f"no such column: {old!r}")
            if new in names:
                raise ValueError(f"column already exists: {new!r}")
            if not new or new.startswith("_"):
                raise ValueError(
                    f"invalid column name {new!r}: empty or reserved "
                    "underscore prefix"
                )
            renames = {
                k: list(v)
                for k, v in snap.properties.get("renames", {}).items()
            }
            priors_all = {p for ps in renames.values() for p in ps}
            if new in priors_all:
                raise ValueError(
                    f"{new!r} is a retired physical name still present in "
                    "old data files; run retire_renames() after a full "
                    "rewrite to free it"
                )
            renames[new] = [old] + renames.pop(old, [])
            fields = [
                T.StructField(new if f.name == old else f.name, f.dataType, f.nullable)
                for f in snap.schema.fields
            ]
            schema = T.StructType(fields)
            new_version = snap.schema_version + 1
            self._ledger_append(
                {
                    "schema_version": new_version,
                    "status": SchemaStatus.ACTIVE.value,
                    "previous_status": SchemaStatus.OBSOLETE.value,
                    "change_type": ChangeType.NON_BREAKING.value,
                    "detail": f"RENAMED: {old} -> {new}",
                    "schema_json": json.loads(schema.json()),
                }
            )
            props = json.loads(json.dumps(snap.properties))
            props["renames"] = renames
            # the persistent sort order follows the rename atomically in
            # the same commit, or the next compaction would fail on a
            # column that still exists under its new name
            so = props.get("sort_order")
            if so:
                so["cols"] = [new if c == old else c for c in so["cols"]]
            out = Snapshot(
                version=snap.version + 1,
                parent=snap.version,
                schema_json=json.loads(schema.json()),
                schema_version=new_version,
                num_buckets=snap.num_buckets,
                pk_fields=[new if c == old else c for c in snap.pk_fields],
                order_fields=[new if c == old else c for c in snap.order_fields],
                files={k: list(v) for k, v in snap.files.items()},
                properties=props,
                operation="rename-column",
                summary={"renamed_from": old, "renamed_to": new},
                deltas={k: list(v) for k, v in snap.deltas.items()},
            )
            return self._commit(out, parent=snap)

        committed = self._retry_commit(_once)
        # name-keyed index metadata follows the rename right after the
        # commit (idempotent - the old name simply stops matching on a
        # re-run; a crash in between leaves a stale spec that
        # verify_integrity reports and optimize tolerates)
        self._remap_index_specs(old, new)
        return committed

    def _remap_index_specs(self, old: str, new: str) -> None:
        """Rewrite bloom/NDV index metadata for a column rename. Both
        indexes key by VALUE (bloom hashes pk values; HLL sketches hash
        cell values), so a rename only has to move the NAME - no sketch
        or bitmap is rebuilt."""
        from dataingestion_spark.lake import bloom as B
        from dataingestion_spark.lake import ndv as N

        bstore = B.BloomIndexStore(self.root)
        bspec = bstore.spec()
        if bspec and old in bspec.get("pk_fields", []):
            bspec["pk_fields"] = [
                new if c == old else c for c in bspec["pk_fields"]
            ]
            bstore.write_spec(bspec)
        nstore = N.NdvStore(self.root)
        nspec = nstore.spec()
        if nspec and old in nspec.get("cols", []):
            nspec["cols"] = sorted(
                new if c == old else c for c in nspec["cols"]
            )
            nstore.write_spec(nspec)
            for b in nstore.buckets():
                entry = nstore.load_bucket(b)
                sk = entry.get("sketches", {})
                if old in sk:
                    sk[new] = sk.pop(old)
                    nstore.write_bucket(b, entry)
        # a secondary bloom index is keyed by the column IN ITS DIR NAME:
        # move the whole store and restamp the spec (bitmaps hash values,
        # not names - nothing is rebuilt)
        from dataingestion_spark.lake.shardstore import ShardStore

        sstore = ShardStore(self.root, self._secondary_store_name(old))
        if sstore.spec() is not None:
            target = ShardStore(self.root, self._secondary_store_name(new))
            # os.replace raises ENOTEMPTY when the target dir already
            # exists (stale leftovers of a crashed earlier rename, or an
            # index once built under the new name) - and this runs AFTER
            # the rename commit succeeded, so failing here would leave
            # the table renamed but the call raising. The old index is
            # authoritative for the just-renamed data; clear the stale
            # target and move over it.
            if target.dir.exists():
                shutil.rmtree(target.dir)
            os.replace(sstore.dir, target.dir)
            spec = target.spec()
            spec["col"] = new
            target.write_spec(spec)

    def retire_renames(self) -> list[str]:
        """Drop prior-name mappings whose old physical name no longer
        appears in ANY file referenced by the current snapshot (base or
        delta), freeing the name for reuse and removing the read-time
        coalesce. Proof is footer-exact: the union of the referenced
        files' parquet schemas (footer reads only - no data scan, one
        driver-side listing of O(files) footers) must not contain the
        prior name - true after compaction/rebucket/DML has rewritten
        every pre-rename file. Returns the retired prior names; mappings
        still live in some file are kept (partial retirement of a chain
        is fine - each prior name is judged independently)."""

        def _once() -> list[str]:
            snap = self.snapshot()
            renames = {
                k: list(v)
                for k, v in snap.properties.get("renames", {}).items()
            }
            if not renames:
                return []
            files = [
                str(self.root / f)
                for source in (snap.files, snap.deltas)
                for fl in source.values()
                for f in fl
            ]
            if files:
                physical = {
                    f.name
                    for f in self.spark.read.option("mergeSchema", "true")
                    .parquet(*files)
                    .schema.fields
                }
            else:
                physical = set()
            retired: list[str] = []
            kept: dict[str, list[str]] = {}
            for cur, priors in renames.items():
                live = [p for p in priors if p in physical]
                retired.extend(p for p in priors if p not in physical)
                if live:
                    kept[cur] = live
            if not retired:
                return []
            props = json.loads(json.dumps(snap.properties))
            if kept:
                props["renames"] = kept
            else:
                props.pop("renames", None)
            out = Snapshot(
                version=snap.version + 1,
                parent=snap.version,
                schema_json=dict(snap.schema_json),
                schema_version=snap.schema_version,
                num_buckets=snap.num_buckets,
                pk_fields=list(snap.pk_fields),
                order_fields=list(snap.order_fields),
                files={k: list(v) for k, v in snap.files.items()},
                properties=props,
                operation="retire-renames",
                summary={"retired_prior_names": sorted(retired)},
                deltas={k: list(v) for k, v in snap.deltas.items()},
            )
            self._commit(out, parent=snap)
            return sorted(retired)

        return self._retry_commit(_once)

    def delete_where(self, condition, **kwargs) -> Snapshot | None:
        """Predicate DELETE with optimistic commit retries; see
        :meth:`_dml_once`."""
        return self._retry_commit(lambda: self._dml_once(condition, None, **kwargs))

    def update_where(self, condition, assignments: dict, **kwargs) -> Snapshot | None:
        """Predicate UPDATE with optimistic commit retries; see
        :meth:`_dml_once`."""
        return self._retry_commit(
            lambda: self._dml_once(condition, assignments, **kwargs)
        )

    def apply_retention(self, col: str, cutoff) -> Snapshot | None:
        """Row TTL (Iceberg/Delta retention-delete pattern): tombstone
        every live row with ``col < cutoff`` - the age-out pass a
        transcript lake runs for compliance windows and storage budgets.
        A thin, correctly-priced composition: :meth:`delete_where` with
        the cutoff ALSO passed as a file-stats prune bound, so discovery
        skips every file whose min(col) is already past the cutoff - on
        a time-clustered (or ts-z-ordered) table the rewrite touches
        only the aging boundary region, never the table. Physical
        erasure then completes through the normal chain:
        ``compact(purge_tombstones_below_lsn=...)`` + expiry + vacuum."""
        return self.delete_where(
            F.col(col) < F.lit(cutoff), prune={col: (None, cutoff)}
        )

    @staticmethod
    def _assign_projection(
        df: DataFrame, assignments: dict, hit: Column, schema_cols: dict
    ) -> DataFrame:
        """All SET assignments land in ONE projection (shared by
        update_where's DML arm and merge_into's UPDATE arm): the hit
        mask and every RHS resolve against the PRE-update row, matching
        SQL UPDATE semantics (``SET a=b, b=a`` swaps). Sequential
        withColumn calls would re-resolve ``hit`` after an assignment
        mutates a column it references, silently skipping later SETs.
        An assigned column ABSENT from ``df`` is materialized (hit ->
        value, else the NULL the conform step would have filled) -
        skipping it would null the column on every hit row, the opposite
        of the request."""

        def _set(c):
            v = assignments[c]
            val = v if isinstance(v, Column) else F.lit(v)
            return F.when(hit, val.cast(schema_cols[c]))

        proj = [
            _set(c).otherwise(F.col(c)).alias(c)
            if c in assignments
            else F.col(c)
            for c in df.columns
        ]
        proj += [
            _set(c).otherwise(F.lit(None).cast(schema_cols[c])).alias(c)
            for c in assignments
            if c not in df.columns
        ]
        return df.select(*proj)

    def next_lsn(self) -> int:
        """Smallest lsn strictly greater than every stored ``_lsn`` -
        the change-timeline position a batch DML/MERGE INTO stamps so the
        LWW guard ranks it newer than all applied history. Driver-side
        from the file-stats sidecars when they cover ``_lsn`` in every
        referenced file (zero jobs); one max aggregate over the resolved
        table otherwise."""
        snap = self.snapshot()
        rels = [
            f
            for fl in list(snap.files.values()) + list(snap.deltas.values())
            for f in fl
        ]
        if not rels:
            return 1
        stats = self._stats_for(rels)
        hi, covered = 0, True
        for rel in rels:
            s = stats.get(rel, {}).get(LSN_COL)
            if not s or not isinstance(s[1], (int, float)):
                covered = False
                break
            hi = max(hi, int(s[1]))
        if not covered:
            buckets = sorted(
                {int(b) for b in snap.files} | {int(b) for b in snap.deltas}
            )
            row = (
                self._resolved(snap, buckets).agg(F.max(LSN_COL)).collect()[0]
            )
            hi = int(row[0] or 0)
        return hi + 1

    def merge_into(
        self,
        source: DataFrame,
        when_matched_update=None,
        when_matched_delete=None,
        when_not_matched_insert=True,
        update_assignments: dict | None = None,
        pipeline_id: str | None = None,
        epoch_id: int | None = None,
        **merge_kwargs,
    ) -> Snapshot | None:
        """Declarative batch MERGE (the Delta/Iceberg ``MERGE INTO t
        USING s ON pk WHEN MATCHED [AND cond] THEN UPDATE/DELETE WHEN NOT
        MATCHED [AND cond] THEN INSERT`` user API) for sources that are
        plain row batches, not op-labeled change streams - backfills,
        dimension refreshes, corrections landing beside the CDC feed.

        Each ``when_*`` argument is that clause's condition: ``None`` =
        clause absent, ``True`` = unconditional, a SQL string / Column =
        evaluated over the SOURCE row. Rows matching no applicable clause
        are no-ops. When both matched clauses apply to a row, DELETE wins
        (destructive intent must be explicit, so it is never shadowed).
        ``update_assignments`` optionally maps column -> value for the
        UPDATE arm (``SET col = expr``; RHS sees the SOURCE row,
        evaluated in one projection so assignments never observe each
        other); without it UPDATE is a full-row replace by the source
        row. The source must be pk-unique (fail-fast otherwise: MERGE
        semantics are undefined for multiple source matches - the same
        error Delta raises) and carry the table's payload columns.

        Compilation, all on existing machinery: label source rows
        matched/not-matched with one bucket-pruned point-lookup join
        (:meth:`read_keys` - priced by the SOURCE's buckets, never the
        table; a tombstoned key is NOT matched, so re-insert works),
        compile the clauses into the canonical op column, stamp the
        batch at :meth:`next_lsn` (newer than all applied history, so
        the LWW guard lets it win; a later CDC event with a higher lsn
        still supersedes it - the stream stays the source of truth), and
        run the standard exactly-once :meth:`merge`."""

        def _cond(c):
            if c is None or c is False:
                return None
            if c is True:
                return F.lit(True)
            return F.expr(c) if isinstance(c, str) else c

        upd, dele, ins = (
            _cond(when_matched_update),
            _cond(when_matched_delete),
            _cond(when_not_matched_insert),
        )
        if upd is None and dele is None and ins is None:
            raise ValueError("merge_into needs at least one WHEN clause")
        snap = self.snapshot()
        pk = list(snap.pk_fields)
        reserved = {"op", "_matched"} & set(source.columns)
        if reserved:
            raise ValueError(
                f"source must not carry reserved column(s) {sorted(reserved)}"
            )
        # persist: the source lineage (often a join/aggregate the caller
        # built) is consumed by the dup check, the live-key lookup's
        # collects, the labeled join, and the merge's own passes - cache
        # it once, recoverable via lineage, released in the finally.
        from pyspark import StorageLevel

        source = source.persist(StorageLevel.MEMORY_AND_DISK)
        try:
            return self._merge_into_body(
                source, snap, pk, upd, dele, ins, update_assignments,
                pipeline_id, epoch_id, merge_kwargs,
            )
        finally:
            source.unpersist()

    def _merge_into_body(
        self, source, snap, pk, upd, dele, ins, update_assignments,
        pipeline_id, epoch_id, merge_kwargs,
    ):
        dup = (
            source.groupBy(*pk).count().filter(F.col("count") > 1).take(1)
        )
        if dup:
            raise ValueError(
                f"source is not pk-unique on {pk} (e.g. "
                f"{ {c: dup[0][c] for c in pk} }); MERGE INTO semantics "
                "are undefined for multiple source matches"
            )
        live_keys = self.read_keys(source.select(*pk)).select(
            *pk, F.lit(True).alias("_matched")
        )
        labeled = source.join(live_keys, on=pk, how="left")
        matched = F.coalesce(F.col("_matched"), F.lit(False))
        op = F.lit(None).cast("string")
        if ins is not None:
            op = F.when(~matched & ins, F.lit("INSERT")).otherwise(op)
        if upd is not None:
            op = F.when(matched & upd, F.lit("UPDATE")).otherwise(op)
        if dele is not None:  # last WHEN wins in a when-chain: DELETE first
            op = F.when(matched & dele, F.lit("DELETE")).otherwise(op)
        # materialize op BEFORE assignments so an assignment to a column
        # a clause condition references can never re-resolve the clause
        df = (
            labeled.select(*source.columns, op.alias("op"))
            .filter(F.col("op").isNotNull())
        )
        if update_assignments:
            schema_cols = {f.name: f.dataType for f in snap.schema.fields}
            bad = [
                c
                for c in update_assignments
                if c not in schema_cols or c in pk
            ]
            if bad:
                raise ValueError(
                    f"merge_into cannot assign {bad}: pk or unknown column"
                )
            df = self._assign_projection(
                df, update_assignments, F.col("op") == "UPDATE", schema_cols
            )
        lsn_col = snap.order_fields[0] if snap.order_fields else "lsn"
        df = df.withColumn(lsn_col, F.lit(self.next_lsn()).cast("long"))
        return self.merge(
            df, pipeline_id=pipeline_id, epoch_id=epoch_id, **merge_kwargs
        )

    def _merge_once(
        self,
        changes: DataFrame,
        pipeline_id: str | None = None,
        epoch_id: int | None = None,
        op_col: str = "op",
        fail_on_breaking: bool = True,
        evolution_policy: str = "full",
        hot_key_threshold: float = 0.05,
        hot_key_min_rows: int | None = None,
        salt_buckets: int = 8,
        lineage: dict | None = None,
        write_mode: str = "cow",
        update_mode: str = "full",
        collect_file_stats: bool = False,
        file_col: str = "source_file",
    ) -> Snapshot | None:
        """Apply a batch of keyed INSERT/UPDATE/DELETE change events.

        Semantics (= Iceberg `MERGE INTO t USING s ON pk  WHEN MATCHED AND
        s.op='DELETE' THEN DELETE  WHEN MATCHED THEN UPDATE SET *  WHEN NOT
        MATCHED AND s.op<>'DELETE' THEN INSERT *`, plus an LSN guard so a
        stale source row never overwrites a newer target row):

          1. epoch marker check - re-delivered epochs are skipped whole.
          2. schema gate - evolve or fail fast (metadata only).
          3. ONE (bucket, key) pre-scan job: touched-bucket set, batch
             size, exact hot-key gate (and, for the rare hot epoch, the
             hot keys themselves from the same shuffle).
          4. bucket pruning - only buckets present in the batch are read.
          5. ONE map-side-combining LWW aggregate over (batch ∪ resolved
             current rows of touched buckets), max_by ordered by
             (lsn, source-over-table, ts) - subsumes the in-batch dedup,
             the batch-vs-table probe and the "source wins iff
             s.lsn >= t._lsn" guard of a classic MERGE join. DELETE
             winners are tombstone rows.
          6. salted copy-on-write rewrite of touched buckets; atomic
             snapshot commit referencing untouched buckets' old files.

        ``update_mode="partial"`` switches UPDATE events from full-row
        replace to the reference replay oracle's dict-merge semantics
        (demo/test_pipeline.sh:244-262: ``user_state[pk].update(data)``):
        an UPDATE's NULL payload columns mean "not set" and retain the
        current value; an UPDATE on a missing or deleted key is DROPPED
        (the oracle's ``if primary_key in user_state`` guard); INSERT stays
        a full-row replace and DELETE a full-row tombstone. This makes the
        Mongo ``$set`` adapter (sources/cdc_formats.py) honest end-to-end -
        its unwrapped partial documents no longer null-out unset fields.
        Two caveats, both inherent to the semantics: a partial UPDATE can
        never set a column back to NULL, and cross-epoch ordering assumes
        per-key in-order delivery (the binlog guarantee; the reference
        oracle likewise replays in delivery order). COW partial merges use
        one fold+join plan at every epoch size - the single-max_by union
        plan cannot express per-column folds.

        ``write_mode="mor"`` (merge-on-read, the Hudi-MOR analog) replaces
        steps 5-6 with an append of the batch winners as per-bucket DELTA
        files: write amplification is O(batch) instead of O(table), which
        is what keeps 10^10-event replay sustainable as the table grows;
        the per-key LWW resolution moves to read time (``_resolved``) and
        ``compact()`` folds deltas back into the base. Late/duplicate
        events need no join-time lsn guard here - read-time LWW over
        (_lsn, delta-recency) subsumes it.

        Returns the committed Snapshot, or None if the epoch was already
        applied (idempotent replay).
        """
        import sys

        debug = os.environ.get("SPARK_CDC_DEBUG_TIMING")
        t_start = time.time()

        def _tick(label, t0=[t_start]):
            if debug:
                now = time.time()
                print(f"merge[{epoch_id}] {label}: {now - t0[0]:.2f}s", file=sys.stderr)
                t0[0] = now

        if update_mode not in ("full", "partial"):
            raise ValueError(f"unknown update_mode: {update_mode!r}")
        snap = self.snapshot()
        if (
            pipeline_id is not None
            and epoch_id is not None
            and epoch_id <= self.last_applied_epoch(pipeline_id)
        ):
            return None

        pk = snap.pk_fields
        order_fields = snap.order_fields
        lsn_src = order_fields[0]

        # Small-epoch tuning (see SMALL_EPOCH_EVENTS): start in the tuned
        # regime - the pre-scan is always a tiny collect - and restore the
        # session settings for the write once the pre-scan proves the epoch
        # is large. The tuned window is guarded by _TUNE_LOCK (see its
        # comment): only the lock holder mutates session conf, so the
        # capture/restore pair can never race with a concurrent merge. A
        # merge that cannot take the lock runs untuned under the session
        # conf - same results, small epochs just pay AQE's fixed latency.
        conf = self.spark.conf
        tuned = False
        locked = _TUNE_LOCK.acquire(blocking=False)
        sess_aqe = conf.get("spark.sql.adaptive.enabled", "true")
        sess_sp = conf.get("spark.sql.shuffle.partitions", "200")

        def _tune_small():
            # Pre-scan phase: its shuffle output is O(distinct keys) rows,
            # so reduce-task count is pure scheduling overhead - 8 tasks
            # measured ~2x faster than 32 at 250k-event epochs (the write
            # phase re-sizes via _tune_write once the pre-scan reports the
            # batch size).
            nonlocal tuned
            if not locked:
                return
            conf.set("spark.sql.adaptive.enabled", "false")
            conf.set("spark.sql.shuffle.partitions", str(min(int(sess_sp), 8)))
            tuned = True

        def _tune_write(batch_events: int):
            # Write phase: size the LWW exchange by BATCH VOLUME, not the
            # bucket count - at micro-batch scale (<=1M events) 16 reduce
            # tasks beat 32+ (measured ~0.65s vs ~1.0s per 500k-row LWW at
            # local[32]); large batches grow toward the session setting.
            if not tuned:
                return
            conf.set(
                "spark.sql.shuffle.partitions",
                str(min(int(sess_sp), max(16, batch_events // 16_000))),
            )

        def _restore():
            nonlocal tuned, locked
            if tuned:
                conf.set("spark.sql.adaptive.enabled", sess_aqe)
                conf.set("spark.sql.shuffle.partitions", sess_sp)
                tuned = False
            if locked:
                _TUNE_LOCK.release()
                locked = False

        _tune_small()
        try:
            return self._merge_impl(
                changes, snap, pk, order_fields, lsn_src, pipeline_id,
                epoch_id, op_col, fail_on_breaking, evolution_policy,
                hot_key_threshold, hot_key_min_rows, salt_buckets, lineage,
                write_mode, update_mode, collect_file_stats, file_col,
                _tick, _restore, _tune_write,
            )
        finally:
            _restore()

    def _merge_impl(
        self,
        changes: DataFrame,
        snap: Snapshot,
        pk: list[str],
        order_fields: list[str],
        lsn_src: str,
        pipeline_id: str | None,
        epoch_id: int | None,
        op_col: str,
        fail_on_breaking: bool,
        evolution_policy: str,
        hot_key_threshold: float,
        hot_key_min_rows: int | None,
        salt_buckets: int,
        lineage: dict | None,
        write_mode: str,
        update_mode: str,
        collect_file_stats: bool,
        file_col: str,
        _tick,
        _restore,
        _tune_write,
    ) -> Snapshot | None:

        # Payload schema of the batch = everything except op/ordering/source
        # metadata (ts is both ordering tiebreak and payload - kept) and
        # underscore-prefixed system/provenance columns (e.g. the staged
        # changelog's _meta struct) - those are pipeline plumbing, never
        # table columns. Normalized to all-nullable: an incoming batch
        # being *stricter* than the table is not a schema change.
        drop_from_schema = {op_col, "source_file", lsn_src}
        batch_payload_schema = T.StructType(
            [
                T.StructField(f.name, f.dataType, True)
                for f in changes.schema.fields
                if f.name not in drop_from_schema and not f.name.startswith("_")
            ]
        )
        schema, schema_version, evo = self._resolve_schema(
            snap, batch_payload_schema, fail_on_breaking, evolution_policy
        )
        # A pk TYPE widening (int->long) changes every row's xxhash64, so
        # the stored _bucket values of pre-widening rows no longer match
        # bucket_expr under the new type. Left alone, a later batch would
        # probe the NEW bucket of a key whose row still sits in its OLD
        # bucket - the row isn't read, the merge can't see it, and the key
        # silently duplicates. The one-time fix: the widening epoch runs a
        # FULL-TABLE REBUCKET - every bucket is touched, every current
        # row's bucket is recomputed under the widened type, and the whole
        # table is rewritten into the new layout (copy-on-write even if
        # the pipeline runs merge-on-read, since delta files can't move
        # base rows between buckets). Widenings are rare one-time events;
        # the invariant "stored bucket == bucket_expr(pk) under the
        # current schema" holds at every other time.
        pk_widened = snap.schema[pk[0]].dataType != schema[pk[0]].dataType

        _tick("plan+schema gate")
        # (4) touched-bucket pruning + hot-key detection, cheapest-first:
        # job 1 groups the raw batch by BUCKET only - the map side combines
        # to <= num_buckets rows per partition, so the shuffle is O(maps x
        # buckets) regardless of batch size. That yields the touched set,
        # the exact batch size, and a SOUND hotness pre-gate: a key holding
        # >= hot_key_threshold of the batch forces its bucket's count over
        # the same threshold, so "no bucket above threshold" proves "no hot
        # key" without ever counting per key. Only when a bucket trips the
        # gate (rare: requires real skew or very few buckets) does job 2
        # run the per-key count - and only over the suspect buckets, which
        # keeps the exact per-key hot list while the common case pays one
        # tiny aggregate. (Round-1 shape grouped by (bucket, key) up front:
        # an O(distinct keys) shuffle on every epoch, ~1.5x the pre-scan
        # cost at 250k-event epochs, to compute a max_k that almost every
        # epoch ignores.)
        # The batch is deliberately NOT cached: each auxiliary job reads a
        # column-pruned slice straight from the staged parquet (cheaper than
        # materializing the full batch into executor storage), and the
        # write job below makes exactly one full-width pass.
        # The pre-scan hashes the pk CAST TO THE RESOLVED TABLE TYPE so it
        # agrees with the conformed winners' bucket assignment even across a
        # pk type widening (xxhash64(int) != xxhash64(long) for equal values).
        bucket_stats = changes.groupBy(
            bucket_expr(
                pk[0], snap.num_buckets, key_type=schema[pk[0]].dataType
            ).alias(BUCKET_COL)
        ).agg(F.count(F.lit(1)).alias("_n"))
        file_stats: list[dict] | None = None
        if collect_file_stats and file_col in changes.columns:
            # Fused into the SAME driver action as the pre-scan: the two
            # aggregates read disjoint column slices of the staged batch,
            # so a tagged union costs the same I/O as either alone but one
            # fewer job per epoch (round-2 review item 5). The branches
            # keep their own shuffles; only the collect is shared.
            fstats = changes.groupBy(F.col(file_col).alias("_f")).agg(
                F.min(F.col(lsn_src)).cast("long").alias("_min_lsn"),
                F.max(F.col(lsn_src)).cast("long").alias("_max_lsn"),
                F.count(F.lit(1)).alias("_n"),
            )
            unioned = bucket_stats.select(
                F.lit("b").alias("_t"),
                F.col(BUCKET_COL),
                F.col("_n"),
                F.lit(None).cast("string").alias("_f"),
                F.lit(None).cast("long").alias("_min_lsn"),
                F.lit(None).cast("long").alias("_max_lsn"),
            ).unionByName(
                fstats.select(
                    F.lit("f").alias("_t"),
                    F.lit(None).cast("int").alias(BUCKET_COL),
                    F.col("_n"),
                    F.col("_f"),
                    F.col("_min_lsn"),
                    F.col("_max_lsn"),
                )
            )
            rows = unioned.collect()
            raw_stats = [r for r in rows if r["_t"] == "b"]
            file_stats = [
                {
                    "source_file": r["_f"],
                    "min_lsn": r["_min_lsn"],
                    "max_lsn": r["_max_lsn"],
                    "event_count": r["_n"],
                }
                for r in rows
                if r["_t"] == "f"
            ]
        else:
            raw_stats = bucket_stats.collect()
        touched = sorted(int(r[BUCKET_COL]) for r in raw_stats)
        batch_events = sum(r["_n"] for r in raw_stats)
        if pk_widened:
            # full rebucket: every OLD bucket must be read and every NEW
            # bucket is a legal write target
            touched = list(range(snap.num_buckets))
        _tick("bucket/key pre-scan")
        if batch_events >= self.SMALL_EPOCH_EVENTS:
            _restore()  # large epoch: AQE coalesce/skew-split pay for themselves
        else:
            _tune_write(batch_events)

        hot: list[str] = []
        min_rows = (
            self.HOT_KEY_MIN_ROWS if hot_key_min_rows is None
            else hot_key_min_rows
        )
        hot_floor = max(hot_key_threshold * batch_events, min_rows)
        suspect_buckets = [
            int(r[BUCKET_COL]) for r in raw_stats if r["_n"] >= hot_floor
        ]
        if batch_events > 0 and suspect_buckets:
            # exact per-key pass, restricted to the buckets that COULD
            # contain a hot key (see the gate soundness argument above)
            hot = [
                r["_k"]
                for r in changes.filter(
                    bucket_expr(
                        pk[0], snap.num_buckets, key_type=schema[pk[0]].dataType
                    ).isin(suspect_buckets)
                )
                .groupBy(F.col(pk[0]).alias("_k"))
                .agg(F.count(F.lit(1)).alias("_n"))
                .filter(F.col("_n") >= hot_floor)
                .select("_k")
                .collect()
            ]
        _tick("hot-key detect")

        # batch_events (pre-LWW submitted rows) rides into every commit
        # summary alongside applied_events: the pair is the per-epoch
        # submitted-vs-won lineage a DLQ requeue or an ops dashboard needs,
        # and it is free - the pre-scan already counted it.
        lineage = {**(lineage or {}), "batch_events": int(batch_events)}

        # (3) the conformed source relation: op -> tombstone flag, lsn
        # column, cast to the (possibly evolved) table schema, bucketed.
        src = (
            changes.withColumn(DELETED_COL, F.col(op_col) == F.lit("DELETE"))
            .withColumn(LSN_COL, F.col(lsn_src).cast("long"))
        )
        if update_mode == "partial":
            src = src.withColumn(_OP_COL, F.col(op_col))
        src = self._conform(src, schema).withColumn(
            BUCKET_COL, bucket_expr(pk[0], snap.num_buckets)
        )
        obs = Observation(f"merge_applied_{uuid.uuid4().hex[:8]}")

        if update_mode == "partial":
            snap2 = self._merge_partial(
                src, snap, schema, schema_version, pk, touched, hot,
                salt_buckets, "cow" if pk_widened else write_mode,
                pipeline_id, epoch_id, evo, file_stats, lineage, obs,
            )
            _tick("partial fold + write")
            return snap2

        if write_mode == "mor" and not pk_widened:
            # (5'/6') in-batch LWW winners appended as delta files - no
            # table read, no join; O(batch) write amplification. Rows are
            # stamped with the committing snapshot version so read-time LWW
            # resolves equal-lsn rows across delta commits
            # deterministically (newest commit wins, matching the COW tie
            # rule). The winner count comes out of the write job via the
            # Observation API (no extra action).
            # Single-exchange fold+write (same trick as the small COW
            # plan): repartition once by the write-layout keys, group the
            # LWW by (layout keys + pk) so no second exchange is planned,
            # write pre-partitioned.
            src_s, group_prefix, target_parts = self._single_exchange_layout(
                src, pk, touched, hot, salt_buckets
            )
            winners = lww_dedupe(
                src_s, group_prefix + pk,
                [LSN_COL] + list(order_fields[1:]), strategy="agg",
            )
            winners = winners.observe(obs, F.count(F.lit(1)).alias("applied"))
            winners = winners.withColumn(
                DELTA_SEQ_COL, F.lit(snap.version + 1).cast("long")
            )
            new_files = self._write_data_files(
                winners, target_partitions=target_parts, pre_partitioned=True
            )
            applied = int(obs.get["applied"]) if touched else 0
            _tick("LWW + delta write")
            deltas = {k: list(v) for k, v in snap.deltas.items()}
            for b, fl in new_files.items():
                deltas.setdefault(b, [])
                deltas[b] = deltas[b] + fl
            return self._commit_write(
                snap,
                {k: list(v) for k, v in snap.files.items()},
                schema,
                schema_version,
                "merge-mor",
                pipeline_id,
                epoch_id,
                {
                    "applied_events": applied,
                    "touched_buckets": [int(b) for b in touched],
                    "hot_keys": hot,
                    "evolution": evo,
                    "file_stats": file_stats,
                    "merge_plan": "mor-delta",
                    **(lineage or {}),
                },
                deltas=deltas,
            )

        # (5-pre) COW broadcast-probe plan - the table side is NEVER
        # exchanged (the local storage-partitioned-join analog; round-4
        # verdict item #2). Eligible whenever the epoch is an ordinary
        # cold COW merge: no hot keys (their salting protects exchanges
        # this plan doesn't have, but the salted WRITE layout is the
        # shuffle plans' machinery), no pk widening (needs the full
        # rebucket join), no unresolved deltas under the touched buckets
        # (their read-time fold is itself a shuffle), and no bucket whose
        # batch slice exceeds the broadcast budget.
        bucket_counts = {int(r[BUCKET_COL]): int(r["_n"]) for r in raw_stats}
        base_rows = (
            self._base_rows(snap, touched)
            if self.BROADCAST_MERGE_ENABLED and touched
            else None
        )
        bcast_eligible = (
            self.BROADCAST_MERGE_ENABLED
            and touched
            and not hot
            and not pk_widened
            and not any(snap.deltas.get(str(b)) for b in touched)
            and max(bucket_counts.values(), default=0)
            <= self.BROADCAST_GROUP_EVENTS
            and base_rows is not None
            and base_rows >= self.BROADCAST_TABLE_BATCH_RATIO * batch_events
        )
        # Timing context for the adaptive chooser: started at the plan
        # decision (shared pre-scan excluded), stopped at commit time in
        # _finish_cow_commit; None when this epoch is regime-ineligible
        # (its rate would not be comparable).
        plan_timing = (
            (time.time(), batch_events) if bcast_eligible else None
        )
        if bcast_eligible and self._choose_cow_plan(snap) == "broadcast":
            snap2 = self._merge_cow_broadcast(
                src, snap, schema, schema_version, pk, order_fields,
                touched, bucket_counts, pipeline_id, epoch_id, evo,
                file_stats, lineage, plan_timing=plan_timing,
            )
            _tick("LWW-broadcast + rewrite")
            return snap2

        # (5) COW plan selection - two physically different plans with
        # identical semantics, chosen by epoch size (same threshold as the
        # AQE regime; both measured, see SCALE.md):
        #
        #   * SMALL epochs - ONE map-side-combining LWW aggregate over
        #     (batch ∪ resolved current rows of touched buckets): in-batch
        #     dedup, batch-vs-table probe and the lsn guard collapse into a
        #     single max_by ordered by (lsn, source-over-table, ts). One
        #     shuffle, minimal stage count - wins where fixed per-stage
        #     latency dominates (measured ~1.2x at 250k-event epochs).
        #   * LARGE epochs - classic dedup-then-full-outer-join: the
        #     aggregate's hash state carries the FULL row per key, which
        #     stops fitting the hash-agg memory budget at multi-million-row
        #     epochs (sort-based fallback + spill of wide structs measured
        #     2.6x slower at 8M-event epochs); the join instead streams
        #     sorted narrow-keyed runs and scales with data, not state.
        #
        # Both: equal-lsn ties go to the batch row (the "s.lsn >= t._lsn"
        # rule of a guarded MERGE); a DELETE winner IS the tombstone row.
        current = self._resolved(snap, touched, schema=schema)
        # Recompute the bucket under the CURRENT schema type (a no-op
        # whenever the stored-bucket invariant holds; the healing step of
        # the pk-widening rebucket otherwise) - the union plan groups by
        # it, so both sides must agree for every key.
        current = current.withColumn(
            BUCKET_COL,
            bucket_expr(pk[0], snap.num_buckets, key_type=schema[pk[0]].dataType),
        )
        if batch_events < self.SMALL_EPOCH_EVENTS:
            # SINGLE-exchange plan (round 3): repartition ONCE by the
            # write-layout keys, then run the LWW aggregate GROUPED BY
            # (layout keys + pk). Because the partitioning keys are a
            # subset of the grouping keys, Catalyst proves the exchange
            # satisfies the aggregate's distribution and inserts no second
            # shuffle - the same exchange that co-locates keys for the
            # fold also lays rows out for the per-bucket file write
            # (pre_partitioned=True). Measured ~1.2x per epoch over the
            # former agg-exchange + write-repartition pair at 250k-event
            # epochs.
            union = src.withColumn("_pref", F.lit(1)).unionByName(
                current.withColumn("_pref", F.lit(0))
            )
            union = union.withColumn(
                "_lsn_ord", F.coalesce(F.col(LSN_COL), F.lit(-1))
            )
            union, group_prefix, target_parts = self._single_exchange_layout(
                union, pk, touched, hot, salt_buckets
            )
            merged = lww_dedupe(
                union,
                group_prefix + pk,
                ["_lsn_ord", "_pref"] + list(order_fields[1:]),
                tiebreak_fields=[],
            )
            # applied = keys whose winner came from THIS batch, observed
            # inside the write job (no extra action).
            merged = merged.observe(obs, F.sum("_pref").alias("applied"))
            merged = merged.drop("_pref", "_lsn_ord")
            new_files = self._write_data_files(
                merged, target_partitions=target_parts, pre_partitioned=True
            )
            applied = int(obs.get["applied"] or 0) if touched else 0
            _tick("LWW-union + rewrite")
            return self._finish_cow_commit(
                snap, schema, schema_version, touched, hot, new_files,
                applied, pipeline_id, epoch_id, evo, file_stats,
                {**(lineage or {}), "merge_plan": "cow-union"},
                plan_timing=plan_timing,
            )
        else:
            # In-batch fold on a COALESCED lsn ordinal (null lsn -> -1) so
            # the two plans order null-lsn rows identically (a null-lsn
            # change row is reachable, e.g. a CDC adapter failing to parse
            # an lsn field - parse_mongo_change_stream's regexp_extract).
            winners = lww_dedupe(
                src.withColumn("_lsn_ord", F.coalesce(F.col(LSN_COL), F.lit(-1))),
                pk,
                ["_lsn_ord"] + list(order_fields[1:]),
                strategy="agg",
            ).drop("_lsn_ord")
            winners = winners.observe(obs, F.count(F.lit(1)).alias("applied"))
            payload_cols = [
                f.name for f in schema.fields if f.name not in pk
            ]
            s = winners.select(
                *pk,
                *[F.col(c).alias(f"_s_{c}") for c in payload_cols],
                F.col(LSN_COL).alias("_s_lsn"),
                F.col(DELETED_COL).alias("_s_deleted"),
                F.col(BUCKET_COL).alias("_s_bucket"),
            )
            t = current.select(
                *pk,
                *[F.col(c).alias(f"_t_{c}") for c in payload_cols],
                F.col(LSN_COL).alias("_t_lsn"),
                F.col(DELETED_COL).alias("_t_deleted"),
                F.col(BUCKET_COL).alias("_t_bucket"),
            )
            joined = s.join(t, on=pk, how="full_outer")
            # Row presence is tested on the bucket columns (never null for
            # a present row - pmod(xxhash64) is non-null even for null pk),
            # NOT on lsn: the null-lsn rule must match the small-epoch
            # union plan exactly - null lsn orders as -1, so a null-lsn
            # batch row loses to any real target lsn but beats a null-lsn
            # (append-originated) target row via batch preference. Without
            # this a batch's visible result would depend on which side of
            # SMALL_EPOCH_EVENTS it landed.
            source_wins = F.col("_s_bucket").isNotNull() & (
                F.col("_t_bucket").isNull()
                | (
                    F.coalesce(F.col("_s_lsn"), F.lit(-1))
                    >= F.coalesce(F.col("_t_lsn"), F.lit(-1))
                )
            )
            merged = joined.select(
                *pk,
                *[
                    F.when(source_wins, F.col(f"_s_{c}"))
                    .otherwise(F.col(f"_t_{c}"))
                    .alias(c)
                    for c in payload_cols
                ],
                F.when(source_wins, F.col("_s_lsn"))
                .otherwise(F.col("_t_lsn"))
                .alias(LSN_COL),
                F.when(source_wins, F.col("_s_deleted"))
                .otherwise(F.coalesce(F.col("_t_deleted"), F.lit(False)))
                .alias(DELETED_COL),
                F.coalesce(F.col("_s_bucket"), F.col("_t_bucket")).alias(
                    BUCKET_COL
                ),
            )

        # (6) salted rewrite of touched buckets; outstanding deltas of
        # those buckets are folded in (the join read them) and cleared.
        salted = with_salt(merged, hot, salt_buckets, key=pk[0], sub_key=pk[1] if len(pk) > 1 else pk[0])
        target_parts = max(len(touched), 1) * (salt_buckets if hot else 1)
        new_files = self._write_data_files(salted, target_partitions=target_parts)
        applied = int(obs.get["applied"] or 0) if touched else 0
        _tick("LWW-join + rewrite")
        return self._finish_cow_commit(
            snap, schema, schema_version, touched, hot, new_files, applied,
            pipeline_id, epoch_id, evo, file_stats,
            {**(lineage or {}), "merge_plan": "cow-join"},
            plan_timing=plan_timing,
        )

    def _choose_cow_plan(self, snap: Snapshot) -> str:
        """Pick 'broadcast' or 'shuffle' for an ELIGIBLE steady-state COW
        epoch from the measured rates in the snapshot properties (see
        COW_PLAN_ADAPTIVE). Probe order: broadcast first (the
        cluster-scale design choice, deterministic for the first
        eligible epoch), then one shuffle probe, then exploit the faster
        with a periodic re-probe of the loser."""
        if not self.COW_PLAN_ADAPTIVE:
            return "broadcast"
        rates = snap.properties.get("cow_plan_rates", {})
        b = rates.get("broadcast")
        s = rates.get("shuffle")
        if b is None:
            return "broadcast"
        if s is None:
            return "shuffle"
        fast, slow = ("broadcast", "shuffle") if b >= s else ("shuffle", "broadcast")
        n = int(rates.get("n", 0))
        every = self.COW_PLAN_REPROBE_EVERY
        if every and n % every == every - 1:
            return slow
        return fast

    def _merge_cow_broadcast(
        self,
        src: DataFrame,
        snap: Snapshot,
        schema: T.StructType,
        schema_version: int,
        pk: list[str],
        order_fields: list[str],
        touched: list[int],
        bucket_counts: dict[int, int],
        pipeline_id: str | None,
        epoch_id: int | None,
        evo: str | None,
        file_stats: list | None,
        lineage: dict | None,
        plan_timing: tuple[float, int] | None = None,
    ) -> Snapshot:
        """COW merge with ZERO exchange on the table side - the
        single-box analog of Iceberg's storage-partitioned join
        (SCALE.md: "COW join shuffles the table side every epoch").

        The batch is folded to per-key winners (ONE exchange, over the
        batch only - O(epoch), never O(table)), then each group of
        touched buckets is rewritten by streaming its base files through
        broadcast hash joins:

          updated = scan(group)            LEFT JOIN broadcast(winners)
          present = scan(group, pk-pruned) SEMI JOIN broadcast(winner pks)
          inserts = winners ANTI JOIN broadcast(present)
          new     = updated UNION inserts   -> bucket-dir write, no shuffle

        Scan partitions flow straight into the per-bucket dynamic-
        partition write (pre_partitioned); only the insert sliver - batch
        rows for keys absent from the table - takes a tiny batch-side
        repartition for clean file layout. Groups bound each broadcast to
        BROADCAST_GROUP_EVENTS pre-LWW batch rows, so the plan holds at
        any epoch size: 100 TB of table behind 10^4 buckets still streams
        scan->join->write with the day's changes broadcast group by group.

        Semantics are EXACTLY the full-outer-join plan's: same winners
        fold (in-batch LWW on coalesced lsn ordinal), same source-wins
        guard (s.lsn >= t.lsn on -1-coalesced lsns, so a null-lsn batch
        row loses to any real table lsn), same tombstone carry (a DELETE
        winner IS the tombstone row; an unmatched DELETE inserts one).
        ``applied`` counts keys whose winner came from THIS batch, the
        small-plan rule."""
        payload_cols = [f.name for f in schema.fields if f.name not in pk]
        winners = lww_dedupe(
            src.withColumn(
                "_lsn_ord", F.coalesce(F.col(LSN_COL), F.lit(-1))
            ),
            pk,
            ["_lsn_ord"] + list(order_fields[1:]),
            strategy="agg",
        ).drop("_lsn_ord")
        # Reused by every group (update probe, presence probe, insert
        # anti): fold once, keep the winners hot.
        winners = winners.persist()
        try:
            groups: list[list[int]] = []
            acc: list[int] = []
            acc_n = 0
            for b in touched:
                n = bucket_counts.get(int(b), 0)
                if acc and acc_n + n > self.BROADCAST_GROUP_EVENTS:
                    groups.append(acc)
                    acc, acc_n = [], 0
                acc.append(int(b))
                acc_n += n
            if acc:
                groups.append(acc)

            new_files: dict[str, list[str]] = {}
            applied = 0
            for bs in groups:
                w_g = (
                    winners.filter(F.col(BUCKET_COL).isin(bs))
                    if len(groups) > 1
                    else winners
                )
                s_g = w_g.select(
                    *pk,
                    *[F.col(c).alias(f"_s_{c}") for c in payload_cols],
                    F.col(LSN_COL).alias("_s_lsn"),
                    F.col(DELETED_COL).alias("_s_deleted"),
                    F.col(BUCKET_COL).alias("_s_bucket"),
                )
                cur = self._read_files(snap, bs, schema)
                source_wins = F.col("_s_bucket").isNotNull() & (
                    F.coalesce(F.col("_s_lsn"), F.lit(-1))
                    >= F.coalesce(F.col(LSN_COL), F.lit(-1))
                )
                updated = cur.join(F.broadcast(s_g), on=pk, how="left").select(
                    *pk,
                    *[
                        F.when(source_wins, F.col(f"_s_{c}"))
                        .otherwise(F.col(c))
                        .alias(c)
                        for c in payload_cols
                    ],
                    F.when(source_wins, F.col("_s_lsn"))
                    .otherwise(F.col(LSN_COL))
                    .alias(LSN_COL),
                    F.when(source_wins, F.col("_s_deleted"))
                    .otherwise(F.coalesce(F.col(DELETED_COL), F.lit(False)))
                    .alias(DELETED_COL),
                    F.col(BUCKET_COL),
                    F.when(source_wins, F.lit(1))
                    .otherwise(F.lit(0))
                    .alias("_from_batch"),
                )
                # Presence probe: a SECOND, pk-pruned pass over the same
                # files (parquet reads just the key columns - cheap next
                # to any shuffle of the full rows), semi-joined against
                # the broadcast winner keys, so `present` is at most
                # |winners| rows and itself broadcastable.
                present = cur.select(*pk).join(
                    F.broadcast(w_g.select(*pk)), on=pk, how="leftsemi"
                )
                inserts = (
                    w_g.join(F.broadcast(present), on=pk, how="left_anti")
                    .repartition(max(len(bs), 1), F.col(BUCKET_COL))
                    .select(
                        *pk,
                        *payload_cols,
                        F.col(LSN_COL),
                        F.col(DELETED_COL),
                        F.col(BUCKET_COL),
                        F.lit(1).alias("_from_batch"),
                    )
                )
                out_g = updated.unionByName(inserts)
                obs_g = Observation(f"merge_bcast_{uuid.uuid4().hex[:8]}")
                out_g = out_g.observe(
                    obs_g, F.sum("_from_batch").alias("applied")
                ).drop("_from_batch")
                files_g = self._write_data_files(
                    out_g,
                    target_partitions=max(len(bs), 1),
                    pre_partitioned=True,
                )
                applied += int(obs_g.get["applied"] or 0)
                new_files.update(files_g)
        finally:
            winners.unpersist()
        return self._finish_cow_commit(
            snap, schema, schema_version, touched, [], new_files, applied,
            pipeline_id, epoch_id, evo, file_stats,
            {**(lineage or {}), "merge_plan": "cow-broadcast"},
            plan_timing=plan_timing,
        )

    def _finish_cow_commit(
        self,
        snap: Snapshot,
        schema: T.StructType,
        schema_version: int,
        touched: list[int],
        hot: list,
        new_files: dict[str, list[str]],
        applied: int,
        pipeline_id: str | None,
        epoch_id: int | None,
        evo: str | None,
        file_stats: list | None,
        lineage: dict | None,
        plan_timing: tuple[float, int] | None = None,
    ) -> Snapshot:
        """Shared COW commit tail: stray-bucket safety net, manifest
        bookkeeping (touched buckets replaced, their delta chains cleared),
        snapshot commit. ``plan_timing`` = (t_start, batch_events) of a
        regime-ELIGIBLE epoch: the measured events/s is folded (EWMA)
        into properties["cow_plan_rates"] under 'broadcast'/'shuffle'
        for the adaptive plan chooser."""
        props_update = None
        if plan_timing is not None:
            t0, batch_events = plan_timing
            eps = batch_events / max(time.time() - t0, 1e-9)
            key = (
                "broadcast"
                if (lineage or {}).get("merge_plan") == "cow-broadcast"
                else "shuffle"
            )
            rates = dict(snap.properties.get("cow_plan_rates", {}))
            prev = rates.get(key)
            rates[key] = round(
                eps
                if prev is None
                else (1 - self.COW_PLAN_EWMA) * prev + self.COW_PLAN_EWMA * eps,
                1,
            )
            rates["n"] = int(rates.get("n", 0)) + 1
            props_update = {"cow_plan_rates": rates}
        # Safety net behind the typed pre-scan: a written bucket outside the
        # touched set means its current rows were NOT joined - committing it
        # would lose data. Fail loudly instead.
        stray = set(new_files) - {str(b) for b in touched}
        if stray:
            raise RuntimeError(
                f"merge wrote buckets {sorted(stray)} outside the touched "
                f"set {touched}; pre-scan/winner bucket assignment diverged"
            )
        files = {k: list(v) for k, v in snap.files.items()}
        deltas = {k: list(v) for k, v in snap.deltas.items()}
        for b in touched:
            files[str(b)] = new_files.get(str(b), [])
            deltas.pop(str(b), None)
        return self._commit_write(
            snap,
            files,
            schema,
            schema_version,
            "merge",
            pipeline_id,
            epoch_id,
            {
                "applied_events": applied,
                "touched_buckets": [int(b) for b in touched],
                "hot_keys": hot,
                "evolution": evo,
                "file_stats": file_stats,
                **(lineage or {}),
            },
            deltas=deltas,
            properties_update=props_update,
        )

    # ------------------------------------------------------------------
    # partial-update (dict-merge) MERGE arm
    # ------------------------------------------------------------------
    def _fold_partial(
        self, src: DataFrame, pk: list[str], payload_cols: list[str]
    ) -> DataFrame:
        """Per-key fold of a partial-mode batch in ONE shuffle: a window
        (max barrier lsn per key) followed by a grouped aggregate on the
        same keys - Catalyst reuses the window's hash partitioning, so no
        second exchange. Produces per key:

          _b        the barrier row (latest INSERT/DELETE), null if none
          _max_lsn  max lsn over ALL of the key's events
          _u_<c>    last non-null value of column c among UPDATEs ordered
                    after the barrier (the dict-merge fold)
          _ul_<c>   that update's lsn (for the cross-epoch staleness guard)

        Scale: state per key is one barrier struct + one scalar per column
        - bounded by schema width, never by events per key; hot keys
        collapse map-side like any combinable aggregate... except the
        window pass, which shuffles all rows of the batch once (same cost
        class as the full-mode in-batch dedup)."""
        is_barrier = F.col(_OP_COL) != F.lit("UPDATE")
        lsn_ord = F.coalesce(F.col(LSN_COL), F.lit(-1))
        w = Window.partitionBy(*pk)
        src = src.withColumn(
            "_b_lsn", F.max(F.when(is_barrier, lsn_ord)).over(w)
        )
        after_b = (~is_barrier) & (
            lsn_ord > F.coalesce(F.col("_b_lsn"), F.lit(-(1 << 62)))
        )
        return src.groupBy(*pk).agg(
            F.max_by(
                F.struct(
                    *[F.col(c).alias(c) for c in payload_cols],
                    F.col(DELETED_COL).alias(DELETED_COL),
                    F.col(LSN_COL).alias(LSN_COL),
                ),
                F.when(is_barrier, lsn_ord),
            ).alias("_b"),
            F.max(F.col(LSN_COL)).alias("_max_lsn"),
            F.max(F.col(BUCKET_COL)).alias(BUCKET_COL),  # constant per key
            *[
                F.max_by(
                    F.col(c),
                    F.when(after_b & F.col(c).isNotNull(), lsn_ord),
                ).alias(f"_u_{c}")
                for c in payload_cols
            ],
            *[
                F.max(
                    F.when(after_b & F.col(c).isNotNull(), F.col(LSN_COL))
                ).alias(f"_ul_{c}")
                for c in payload_cols
            ],
        )

    def _merge_partial(
        self,
        src: DataFrame,
        snap: Snapshot,
        schema: T.StructType,
        schema_version: int,
        pk: list[str],
        touched: list[int],
        hot: list,
        salt_buckets: int,
        write_mode: str,
        pipeline_id: str | None,
        epoch_id: int | None,
        evo: str | None,
        file_stats: list | None,
        lineage: dict | None,
        obs: Observation,
    ) -> Snapshot:
        """Apply a folded partial-mode batch (see merge() docstring for the
        semantics; reference oracle demo/test_pipeline.sh:244-262).

        COW: fold + full-outer-join against the touched buckets' resolved
        rows - the per-column dict-merge needs per-column values and lsns
        on the probe side, which the single-max_by union plan cannot carry.
        MOR: the folded rows are appended as delta files; keys WITH an
        in-batch barrier become full rows, keys with only updates become
        _partial overlay rows resolved (and guarded against missing keys)
        at read time by _resolve_partial."""
        payload_cols = [f.name for f in schema.fields if f.name not in pk]
        folded = self._fold_partial(src, pk, payload_cols)
        folded = folded.observe(obs, F.count(F.lit(1)).alias("applied"))
        has_b = F.col("_b").isNotNull()
        b_deleted = F.coalesce(F.col(f"_b.{DELETED_COL}"), F.lit(False))

        if write_mode == "mor":
            rows = folded.select(
                *pk,
                *[
                    F.when(
                        has_b & b_deleted,
                        F.lit(None).cast(schema[c].dataType),
                    )
                    .when(
                        has_b,
                        F.coalesce(F.col(f"_u_{c}"), F.col(f"_b.{c}")),
                    )
                    .otherwise(F.col(f"_u_{c}"))
                    .alias(c)
                    for c in payload_cols
                ],
                F.col("_max_lsn").alias(LSN_COL),
                F.when(has_b, b_deleted).otherwise(F.lit(False)).alias(
                    DELETED_COL
                ),
                F.col(BUCKET_COL),
                (~has_b).alias(PARTIAL_COL),
                F.lit(snap.version + 1).cast("long").alias(DELTA_SEQ_COL),
            )
            salted = with_salt(
                rows, hot, salt_buckets,
                key=pk[0], sub_key=pk[1] if len(pk) > 1 else pk[0],
            )
            target_parts = max(len(touched), 1) * (salt_buckets if hot else 1)
            new_files = self._write_data_files(
                salted, target_partitions=target_parts
            )
            applied = int(obs.get["applied"]) if touched else 0
            deltas = {k: list(v) for k, v in snap.deltas.items()}
            for b, fl in new_files.items():
                deltas.setdefault(b, [])
                deltas[b] = deltas[b] + fl
            return self._commit_write(
                snap,
                {k: list(v) for k, v in snap.files.items()},
                schema,
                schema_version,
                "merge-mor-partial",
                pipeline_id,
                epoch_id,
                {
                    "applied_events": applied,
                    "touched_buckets": [int(b) for b in touched],
                    "hot_keys": hot,
                    "evolution": evo,
                    "file_stats": file_stats,
                    **(lineage or {}),
                },
                deltas=deltas,
                partial_buckets_add=sorted(new_files),
            )

        # COW: dict-merge against the current rows of touched buckets
        current = self._resolved(snap, touched, schema=schema)
        current = current.withColumn(
            BUCKET_COL,
            bucket_expr(pk[0], snap.num_buckets, key_type=schema[pk[0]].dataType),
        )
        t = current.select(
            *pk,
            *[F.col(c).alias(f"_t_{c}") for c in payload_cols],
            F.col(LSN_COL).alias("_t_lsn"),
            F.col(DELETED_COL).alias("_t_deleted"),
            F.col(BUCKET_COL).alias("_t_bucket"),
        )
        joined = folded.join(t, on=pk, how="full_outer")
        s_present = F.col(BUCKET_COL).isNotNull()
        t_present = F.col("_t_bucket").isNotNull()
        t_live = t_present & ~F.coalesce(F.col("_t_deleted"), F.lit(False))
        t_lsn_ord = F.coalesce(F.col("_t_lsn"), F.lit(-1))
        b_lsn_ord = F.coalesce(F.col(f"_b.{LSN_COL}"), F.lit(-1))
        # a barrier takes effect unless it is a stale redelivery (older
        # than the target row); its trailing updates still apply by the
        # per-column lsn guard below
        eff_barrier = (
            s_present & has_b & (~t_present | (b_lsn_ord >= t_lsn_ord))
        )
        # update-on-missing-key is dropped (the reference oracle's
        # `if primary_key in user_state` guard)
        merged = joined.filter(eff_barrier | t_present).select(
            *pk,
            *[
                F.when(
                    eff_barrier & b_deleted,
                    F.lit(None).cast(schema[c].dataType),
                )
                .when(
                    eff_barrier,
                    F.coalesce(F.col(f"_u_{c}"), F.col(f"_b.{c}")),
                )
                .when(
                    t_live
                    & F.col(f"_ul_{c}").isNotNull()
                    & (F.col(f"_ul_{c}") >= t_lsn_ord),
                    F.col(f"_u_{c}"),
                )
                .otherwise(F.col(f"_t_{c}"))
                .alias(c)
                for c in payload_cols
            ],
            F.when(eff_barrier, F.col("_max_lsn"))
            .when(t_live, F.greatest(F.col("_t_lsn"), F.col("_max_lsn")))
            .otherwise(F.col("_t_lsn"))
            .alias(LSN_COL),
            F.when(eff_barrier, b_deleted)
            .otherwise(F.coalesce(F.col("_t_deleted"), F.lit(False)))
            .alias(DELETED_COL),
            F.coalesce(F.col(BUCKET_COL), F.col("_t_bucket")).alias(
                BUCKET_COL
            ),
        )
        salted = with_salt(
            merged, hot, salt_buckets,
            key=pk[0], sub_key=pk[1] if len(pk) > 1 else pk[0],
        )
        target_parts = max(len(touched), 1) * (salt_buckets if hot else 1)
        new_files = self._write_data_files(salted, target_partitions=target_parts)
        applied = int(obs.get["applied"] or 0) if touched else 0
        stray = set(new_files) - {str(b) for b in touched}
        if stray:
            raise RuntimeError(
                f"partial merge wrote buckets {sorted(stray)} outside the "
                f"touched set {touched}"
            )
        files = {k: list(v) for k, v in snap.files.items()}
        deltas = {k: list(v) for k, v in snap.deltas.items()}
        for b in touched:
            files[str(b)] = new_files.get(str(b), [])
            deltas.pop(str(b), None)
        return self._commit_write(
            snap,
            files,
            schema,
            schema_version,
            "merge-partial",
            pipeline_id,
            epoch_id,
            {
                "applied_events": applied,
                "touched_buckets": [int(b) for b in touched],
                "hot_keys": hot,
                "evolution": evo,
                "file_stats": file_stats,
                **(lineage or {}),
            },
            deltas=deltas,
        )

    # ------------------------------------------------------------------
    # maintenance
    # ------------------------------------------------------------------
    def maybe_compact(
        self,
        max_delta_files_per_bucket: int = 8,
        max_base_files_per_bucket: int | None = None,
    ) -> Snapshot | None:
        """Compact ONLY buckets that are due - the operational policy that
        bounds read amplification without rewriting healthy buckets:

          * a merge-on-read delta chain at ``max_delta_files_per_bucket``
            (every read of the bucket resolves its whole chain);
          * optionally, a BASE file list at ``max_base_files_per_bucket``
            - the small-file problem append-heavy tables accumulate (each
            append adds files per bucket; scans then pay per-file open
            cost and the footer-stats pass grows).

        Per-bucket, so at cluster scale compaction parallelizes and runs
        off the ingest path. Returns the compaction snapshot, or None when
        no bucket is due."""
        snap = self.snapshot()
        due = {
            int(b)
            for b, fl in snap.deltas.items()
            if len(fl) >= max_delta_files_per_bucket
        }
        if max_base_files_per_bucket is not None:
            due |= {
                int(b)
                for b, fl in snap.files.items()
                if len(fl) >= max_base_files_per_bucket
            }
        if not due:
            return None
        return self.compact(buckets=sorted(due))

    def verify_integrity(self, check_data: bool = True) -> dict:
        """Table fsck - the invariant audit an operator runs after an
        incident (disk loss, manual surgery, suspected bug) before
        trusting the table again. Metadata checks are driver-side over
        the manifests; ``check_data=True`` adds ONE Spark job asserting
        the live-row pk-uniqueness invariant (the A2 contract every
        merge preserves).

        Checks:
          * every file referenced by the current snapshot exists on disk
            (base, delta, manifests);
          * snapshot chain parents resolve within retained history
            (older parents may be legitimately expired);
          * bucket keys in files/deltas are within ``num_buckets``;
          * index specs (bloom/NDV) agree with the current schema;
          * live rows are pk-unique (data job, optional);
          * orphan count (vacuum dry-run) - informational, not an error.

        Returns ``{"ok": bool, "errors": [...], "warnings": [...],
        "checked_files": n, "orphans": n}``. Never mutates anything."""
        snap = self.snapshot()
        errors: list[str] = []
        warnings: list[str] = []
        refs = [
            ("base", rel)
            for rels in snap.files.values()
            for rel in rels
        ] + [
            ("delta", rel)
            for rels in snap.deltas.values()
            for rel in rels
        ] + [("manifest", ref) for ref in snap.manifest_refs.values()]
        for kind, rel in refs:
            if not (self.root / rel).is_file():
                errors.append(f"missing {kind} file: {rel}")
        retained = set(self.retained_versions())
        for v in retained:
            s = self.snapshot(v)
            if s.parent is not None and s.parent not in retained:
                warnings.append(
                    f"v{v} parent v{s.parent} expired (history truncated)"
                )
        for fmap, label in ((snap.files, "files"), (snap.deltas, "deltas")):
            bad = [b for b in fmap if not 0 <= int(b) < snap.num_buckets]
            if bad:
                errors.append(
                    f"{label} carry out-of-range bucket ids {bad} "
                    f"(num_buckets={snap.num_buckets})"
                )
        from dataingestion_spark.lake import bloom as B
        from dataingestion_spark.lake import ndv as N

        bspec = B.BloomIndexStore(self.root).spec()
        if bspec is not None and bspec.get("pk_fields") != list(snap.pk_fields):
            errors.append(
                f"bloom index built for pk {bspec.get('pk_fields')} but "
                f"table pk is {list(snap.pk_fields)}"
            )
        nspec = N.NdvStore(self.root).spec()
        if nspec is not None:
            gone = [
                c
                for c in nspec.get("cols", [])
                if c not in {f.name for f in snap.schema.fields}
            ]
            if gone:
                warnings.append(f"ndv sketches track dropped column(s) {gone}")
        names = {f.name for f in snap.schema.fields}
        for col in self.secondary_index_cols():
            if col not in names:
                warnings.append(
                    f"secondary index tracks dropped column {col!r}"
                )
        if check_data and not errors:
            pk = list(snap.pk_fields)
            # The uniqueness check runs PRE-resolution, on the base
            # rows: self.read() applies read-time LWW whenever deltas
            # exist, which makes post-resolution rows pk-unique by
            # construction - a tautology that would mask duplicated or
            # mis-bucketed base rows. Base rows are the invariant every
            # COW write maintains (one row per pk); delta rows are
            # legitimately multi-versioned per pk and stay out of scope.
            base = self._read_files(snap, None)
            dup = (
                base.groupBy(*pk)
                .count()
                .filter(F.col("count") > 1)
                .take(1)
            )
            if dup:
                errors.append(
                    f"base rows are NOT pk-unique (e.g. "
                    f"{ {c: dup[0][c] for c in pk} })"
                )
            # mis-bucketing: a base row whose stored _bucket disagrees
            # with bucket_expr(pk) under the current schema, OR a file
            # listed under the WRONG bucket's manifest entry - either
            # way the row is invisible to every touched-bucket merge
            # probe: silent duplication waiting to happen. Manifest
            # placement is checked by joining each row's source file
            # (part-file names are globally unique) against the
            # manifest's file->bucket map, broadcast-sized at O(files).
            # keyed by the last TWO path segments (bucket dir +
            # part-file name): a dynamic-partition task reuses one part
            # name across every bucket dir it writes, so the file name
            # alone is ambiguous within a commit.
            pathmap = self.spark.createDataFrame(
                [
                    (f"{Path(rel).parent.name}/{Path(rel).name}", int(b))
                    for b, rels in snap.files.items()
                    for rel in rels
                ]
                or [("__none__", -1)],
                "_fname string, _mb int",
            ).dropDuplicates(["_fname"])
            parts = F.split(F.input_file_name(), "/")
            mis = (
                base.withColumn(
                    "_fname",
                    F.concat_ws(
                        "/", F.element_at(parts, -2), F.element_at(parts, -1)
                    ),
                )
                .join(F.broadcast(pathmap), "_fname", "left")
                .filter(
                    (
                        F.col(BUCKET_COL)
                        != bucket_expr(
                            pk[0], snap.num_buckets,
                            key_type=snap.schema[pk[0]].dataType,
                        )
                    )
                    | (F.col(BUCKET_COL) != F.col("_mb"))
                )
                .take(1)
            )
            if mis:
                errors.append(
                    f"mis-bucketed base row (e.g. "
                    f"{ {c: mis[0][c] for c in pk} } stored bucket "
                    f"{mis[0][BUCKET_COL]}, manifest bucket "
                    f"{mis[0]['_mb']})"
                )
        orphans = sum(
            len(v) for v in self.vacuum(dry_run=True, older_than_s=0).values()
        )
        return {
            "ok": not errors,
            "errors": errors,
            "warnings": warnings,
            "checked_files": len(refs),
            "orphans": orphans,
        }

    def optimize(
        self,
        max_delta_files_per_bucket: int = 8,
        max_base_files_per_bucket: int | None = 16,
        keep_snapshots: int = 10,
        vacuum_older_than_s: float = 3600.0,
        refresh_indexes: bool = True,
    ) -> dict:
        """ONE maintenance pass (the ``OPTIMIZE`` ops entry point): run
        every upkeep the table needs, in dependency order, each priced by
        what actually changed - the scheduled job a production deployment
        points at a table instead of remembering five commands.

          1. policy compaction (:meth:`maybe_compact` - due buckets only;
             a persistent sort order set via :meth:`set_sort_order` is
             restored automatically by the rewrite),
          2. retire rename mappings the rewrite made obsolete
             (restores predicate pushdown on renamed columns),
          3. refresh the bloom / NDV indexes IF PRESENT (never creates
             them - opting into an index is a separate decision; refresh
             touches only churned buckets),
          4. expire snapshots beyond ``keep_snapshots`` (tags shielded),
          5. vacuum orphans older than the grace window.

        Every step is idempotent and crash-safe on its own (the same
        commit/marker machinery as ingest), so optimize needs no
        transaction around the sequence - a crash mid-pass leaves a
        table a later pass finishes. Returns a step-by-step report."""
        report: dict = {}
        snap = self.maybe_compact(
            max_delta_files_per_bucket=max_delta_files_per_bucket,
            max_base_files_per_bucket=max_base_files_per_bucket,
        )
        report["compacted"] = (
            snap.summary.get("compacted_buckets") if snap else []
        )
        report["retired_renames"] = self.retire_renames()
        report["indexes"] = {}
        if refresh_indexes:
            from dataingestion_spark.lake import bloom as B
            from dataingestion_spark.lake import ndv as N

            # a broken index spec (e.g. stale after a crash mid-rename)
            # must not starve the downstream steps - expiry and vacuum
            # are what keep the table bounded; the error is reported for
            # the operator to repair (fsck names the mismatch)
            bspec = B.BloomIndexStore(self.root).spec()
            if bspec is not None:
                try:
                    report["indexes"]["bloom"] = self.update_bloom_index(
                        bits_per_key=bspec["bits_per_key"], k=bspec["k"]
                    )
                except ValueError as e:
                    report["indexes"]["bloom"] = {"error": str(e)}
            nspec = N.NdvStore(self.root).spec()
            if nspec is not None and nspec.get("cols"):
                try:
                    report["indexes"]["ndv"] = self.update_ndv_sketch(
                        list(nspec["cols"]), lg_k=nspec["lg_k"]
                    )
                except ValueError as e:
                    report["indexes"]["ndv"] = {"error": str(e)}
            from dataingestion_spark.lake.shardstore import ShardStore

            for col in self.secondary_index_cols():
                sspec = ShardStore(
                    self.root, self._secondary_store_name(col)
                ).spec()
                try:
                    report["indexes"][f"secondary:{col}"] = (
                        self.update_secondary_index(
                            col,
                            bits_per_key=sspec["bits_per_key"],
                            k=sspec["k"],
                        )
                    )
                except ValueError as e:
                    report["indexes"][f"secondary:{col}"] = {"error": str(e)}
        report["expired_snapshots"] = self.expire_snapshots(
            keep_last=keep_snapshots
        )
        removed = self.vacuum(older_than_s=vacuum_older_than_s)
        report["vacuumed"] = {k: len(v) for k, v in removed.items()}
        return report

    def meta(self, kind: str, version: int | None = None) -> DataFrame:
        """Queryable METADATA TABLES (Iceberg ``table$files`` /
        ``$snapshots`` / ``$partitions`` / ``$manifests`` analog): the
        table's own bookkeeping as DataFrames, so ops questions ("which
        commit grew the table?", "how skewed are the buckets?", "what
        does epoch 17 reference?") are ordinary Spark queries instead of
        bespoke scripts.

        Kinds:
          - ``snapshots``: one row per RETAINED snapshot - version,
            parent, operation, committed_at, schema_version, num_buckets,
            file/delta counts, tags, summary (JSON string).
          - ``files``: one row per file referenced by the target snapshot
            (base AND delta) - bucket, path, kind, size_bytes, row_count.
          - ``partitions``: per-bucket rollup of ``files``.
          - ``manifests``: bucket -> manifest ref of the target snapshot.

        Cost model matches Iceberg's metadata scans: driver-side over the
        manifests, O(retained snapshots) or O(referenced files) - file
        rows read each parquet FOOTER (row counts/sizes), never data.
        The result is a normal DataFrame; at realistic file counts
        (thousands per table) this is a single small partition."""
        snap = self.snapshot(version)
        if kind == "snapshots":
            by_version: dict[int, list[str]] = {}
            for t, v in self.tags().items():
                by_version.setdefault(int(v), []).append(t)
            rows = [
                (
                    s.version,
                    s.parent,
                    s.operation,
                    datetime.datetime.fromtimestamp(
                        s.committed_at, datetime.timezone.utc
                    ),
                    s.schema_version,
                    s.num_buckets,
                    sum(len(f) for f in s.files.values()),
                    sum(len(f) for f in s.deltas.values()),
                    sorted(by_version.get(s.version, [])),
                    json.dumps(s.summary, sort_keys=True),
                )
                for s in self.history()
            ]
            schema = (
                "version long, parent long, operation string, "
                "committed_at timestamp, schema_version long, "
                "num_buckets long, data_files long, delta_files long, "
                "tags array<string>, summary string"
            )
            return self.spark.createDataFrame(rows, schema)
        if kind == "files":
            import pyarrow.parquet as pq

            rows = []
            for fkind, fmap in (("base", snap.files), ("delta", snap.deltas)):
                for b, rels in fmap.items():
                    for rel in rels:
                        p = self.root / rel
                        md = pq.ParquetFile(str(p)).metadata
                        rows.append(
                            (
                                int(b), rel, fkind,
                                p.stat().st_size, md.num_rows,
                                md.num_row_groups,
                            )
                        )
            schema = (
                "bucket int, path string, kind string, size_bytes long, "
                "row_count long, row_groups long"
            )
            return self.spark.createDataFrame(rows, schema)
        if kind == "partitions":
            files = self.meta("files", version)
            return (
                files.groupBy("bucket")
                .agg(
                    F.sum(F.when(F.col("kind") == "base", 1).otherwise(0))
                    .cast("long").alias("data_files"),
                    F.sum(F.when(F.col("kind") == "delta", 1).otherwise(0))
                    .cast("long").alias("delta_files"),
                    F.sum("size_bytes").alias("size_bytes"),
                    F.sum("row_count").alias("row_count"),
                )
                .orderBy("bucket")
            )
        if kind == "manifests":
            rows = [
                (int(b), ref, len(snap.files.get(b, [])), len(snap.deltas.get(b, [])))
                for b, ref in sorted(
                    snap.manifest_refs.items(), key=lambda kv: int(kv[0])
                )
            ]
            return self.spark.createDataFrame(
                rows,
                "bucket int, manifest string, data_files long, delta_files long",
            )
        if kind == "indexes":
            from dataingestion_spark.lake import bloom as B
            from dataingestion_spark.lake import ndv as N
            from dataingestion_spark.lake.shardstore import ShardStore

            rows = []
            bstore = B.BloomIndexStore(self.root)
            if bstore.spec() is not None:
                rows.append(
                    (
                        "bloom", "pk-bloom",
                        json.dumps(bstore.spec(), sort_keys=True),
                        len(bstore.buckets()),
                    )
                )
            nstore = N.NdvStore(self.root)
            if nstore.spec() is not None:
                rows.append(
                    (
                        "ndv", "hll-ndv",
                        json.dumps(nstore.spec(), sort_keys=True),
                        len(nstore.buckets()),
                    )
                )
            for col in self.secondary_index_cols():
                s = ShardStore(self.root, self._secondary_store_name(col))
                rows.append(
                    (
                        f"secondary:{col}", "column-bloom",
                        json.dumps(s.spec(), sort_keys=True),
                        len(s.buckets()),
                    )
                )
            return self.spark.createDataFrame(
                rows, "name string, kind string, spec string, buckets long"
            )
        raise ValueError(
            f"unknown metadata table {kind!r} "
            "(snapshots|files|partitions|manifests|indexes)"
        )

    def describe(self, version: int | None = None, with_sizes: bool = False) -> dict:
        """Table-health report for operators and maintenance schedulers,
        computed driver-side from the manifests (no Spark job): layout,
        per-bucket file/delta-chain distribution (max + p99-ish top-3, the
        numbers that tell you WHICH policy knob to turn), pipeline epoch
        markers and retained snapshot count. ``with_sizes=True`` adds
        total bytes via per-file stat calls - O(files), fine for a
        maintenance cadence, skipped by default."""
        snap = self.snapshot(version)
        f_counts = sorted((len(fl) for fl in snap.files.values()), reverse=True)
        d_counts = sorted((len(fl) for fl in snap.deltas.values()), reverse=True)
        report = {
            "version": snap.version,
            "operation": snap.operation,
            "schema_version": snap.schema_version,
            "num_buckets": snap.num_buckets,
            "pk_fields": list(snap.pk_fields),
            "data_files": sum(f_counts),
            "delta_files": sum(d_counts),
            "buckets_with_data": len(f_counts),
            "buckets_with_deltas": len(d_counts),
            "max_files_per_bucket": (f_counts[0] if f_counts else 0),
            "top_file_buckets": f_counts[:3],
            "max_delta_chain": (d_counts[0] if d_counts else 0),
            "top_delta_chains": d_counts[:3],
            "partial_delta_buckets": list(
                snap.properties.get("partial_delta_buckets", [])
            ),
            "sort_order": snap.properties.get("sort_order"),
            "pipelines": {
                p: int(v.get("last_epoch", -1))
                for p, v in snap.properties.get("pipelines", {}).items()
            },
            "snapshots_retained": len(self.retained_versions()),
        }
        if with_sizes:
            total = 0
            for fl in list(snap.files.values()) + list(snap.deltas.values()):
                for rel in fl:
                    p = self.root / rel
                    if p.is_file():
                        total += p.stat().st_size
            report["total_bytes"] = total
        return report

    def _rebucket_once(self, new_num_buckets: int) -> Snapshot:
        """Scale the bucket count (Iceberg partition-evolution analog for
        the hidden ``bucket(N, pk)`` transform): rewrite the table under
        ``pmod(xxhash64(pk), new_N)`` in one shuffle and commit a snapshot
        whose ``num_buckets`` is the new count.

        Why it exists: buckets are the unit of merge parallelism, rewrite
        granularity and manifest sharding - a table created at 8 buckets
        that grows to 100 TB needs thousands, and without this operation
        ``num_buckets`` is frozen at creation (SCALE.md sizing note).
        Iceberg solves growth with spec evolution; the equivalent here is
        a single explicit rewrite, run off the ingest path like
        compaction.

        Semantics: the full resolved state (MOR delta chains folded,
        tombstones preserved with their lsns so the LWW redelivery guard
        survives the rewrite) is re-hashed to new buckets, pk-clustered
        per file, and committed as operation ``rebucket``. Epoch markers
        carry over - exactly-once pipelines resume unaffected; subsequent
        merges read ``num_buckets`` from the new snapshot and just work.
        Time travel to pre-rebucket versions reads the old layout (each
        snapshot owns its bucket count). Concurrent writers lose the
        snapshot race and recompute against the new layout (a rebucket
        touches every bucket, so the metadata rebase correctly refuses to
        splice across it)."""
        if new_num_buckets < 1:
            raise ValueError(f"num_buckets must be >= 1, got {new_num_buckets}")
        snap = self.snapshot()
        if new_num_buckets == snap.num_buckets:
            return snap
        pk = snap.pk_fields
        df = self._resolved(snap, None).withColumn(
            BUCKET_COL,
            bucket_expr(
                pk[0], new_num_buckets, key_type=snap.schema[pk[0]].dataType
            ),
        )
        new_files = self._write_data_files(
            df, target_partitions=new_num_buckets, cluster_by=list(pk)
        )
        props = json.loads(json.dumps(snap.properties))
        # every delta chain was folded into full base rows above
        props.pop("partial_delta_buckets", None)
        out = Snapshot(
            version=snap.version + 1,
            parent=snap.version,
            schema_json=json.loads(snap.schema.json()),
            schema_version=snap.schema_version,
            num_buckets=new_num_buckets,
            pk_fields=snap.pk_fields,
            order_fields=snap.order_fields,
            files=new_files,
            properties=props,
            operation="rebucket",
            summary={
                "from_buckets": snap.num_buckets,
                "to_buckets": new_num_buckets,
            },
            deltas={},
        )
        return self._commit(out, parent=snap)

    def _dml_once(
        self,
        condition,
        assignments: dict | None,
        prune: dict[str, tuple] | None = None,
    ) -> Snapshot | None:
        """Predicate DELETE / UPDATE on the table (Iceberg `DELETE FROM t
        WHERE ...` / `UPDATE t SET ... WHERE ...` analog, copy-on-write):
        the out-of-band DML a CDC-fed lake still needs - GDPR erasure,
        backfill corrections, redaction - without synthesizing change
        events.

        ``condition`` is a SQL string or Column over the table's schema,
        evaluated against LIVE rows only. ``assignments`` maps payload
        column -> value (Column or literal; pk and system columns are
        rejected; values are cast to the column's declared type so the
        schema never drifts); ``None`` means DELETE. ``prune`` optionally
        gives ``{col: (lo, hi)}`` ranges for file-level stats skipping
        during bucket discovery (same contract as :meth:`read`).

        Plan shape (scales like compaction, not like a table rewrite):
          1. DISCOVERY - one bucket-pruned scan finds the distinct buckets
             holding matching live rows (predicate pushed into the parquet
             scan; O(buckets) driver result).
          2. REWRITE - only those buckets are read (MOR delta chains
             resolved, so the rewrite doubles as their compaction), hit
             rows are tombstoned (DELETE) or assigned (UPDATE), and the
             buckets' file lists are replaced in one snapshot commit.
        An untouched bucket keeps its manifest by structural sharing; a
        predicate matching nothing commits nothing and returns None.

        LWW placement: DML keeps each row's stored ``_lsn`` - the edit
        sits at the row's existing point in the change timeline. A change
        event with lsn >= the row's still wins (the engine's universal
        newer-source-wins-ties rule; by design the stream stays the source
        of truth for new facts, and an equal-lsn redelivery of the
        original event restores it), while an event with a strictly lower
        lsn cannot resurrect or un-edit. Callers needing DML durable
        against equal-lsn redelivery should quiesce the pipeline past the
        row's lsn first - the same watermark contract
        compact(purge_tombstones_below_lsn=...) documents. DELETE
        tombstones become physical erasure through the normal chain:
        compact(purge) + expire_snapshots + vacuum."""
        snap = self.snapshot()
        cond = F.expr(condition) if isinstance(condition, str) else condition
        schema_cols = {f.name: f.dataType for f in snap.schema.fields}
        if assignments is not None:
            bad = [
                c
                for c in assignments
                if c not in schema_cols or c in snap.pk_fields
            ]
            if bad:
                raise ValueError(
                    f"update_where cannot assign {bad}: pk or unknown column"
                )
        live = self.read(version=snap.version, where=prune, include_system=True)
        target = sorted(
            int(r[0])
            for r in live.filter(cond).select(BUCKET_COL).distinct().collect()
        )
        if not target:
            return None
        df = self._resolved(snap, target)
        hit = (~F.coalesce(F.col(DELETED_COL), F.lit(False))) & cond
        if assignments is None:
            df = df.withColumn(
                DELETED_COL, F.when(hit, F.lit(True)).otherwise(F.col(DELETED_COL))
            )
        else:
            df = self._assign_projection(df, assignments, hit, schema_cols)
        new_files = self._write_data_files(
            df,
            target_partitions=max(len(target), 1),
            cluster_by=list(snap.pk_fields),
            bloom_cols=list(snap.pk_fields),
        )
        files = {k: list(v) for k, v in snap.files.items()}
        deltas = {k: list(v) for k, v in snap.deltas.items()}
        for b in set(target) | {int(b) for b in new_files}:
            files[str(b)] = new_files.get(str(b), [])
            deltas.pop(str(b), None)
        return self._commit_write(
            snap, files, snap.schema, snap.schema_version,
            "delete" if assignments is None else "update", None, None,
            {"dml_buckets": [int(b) for b in target]},
            deltas=deltas,
        )

    def _compact_once(
        self,
        purge_tombstones_below_lsn: int | None = None,
        buckets: list[int] | None = None,
        cluster: bool = True,
        cluster_cols: list[str] | None = None,
        cluster_mode: str | None = None,
        max_records_per_file: int | None = None,
    ) -> Snapshot:
        """Rewrite buckets to merge small files and fold outstanding
        merge-on-read deltas into the base; optionally purge tombstones
        whose _lsn is below a watermark the stream has passed (safe: no
        in-flight event can carry a lower lsn).

        ``cluster`` (default) additionally sorts rows by the pk inside
        each rewritten file so parquet row groups carry tight key ranges -
        point lookups and key-range scans then skip row groups via the
        ordinary parquet pushdown, complementing the file-level stats
        sidecars. ``cluster_cols`` overrides the sort key: clustering by
        a time column instead (e.g. ``["ts"]``) gives each parquet ROW
        GROUP a tight range on that column, so time-range predicates skip
        row groups inside every file the scan does open (file-level
        min/max can't narrow within a bucket's single file; the in-file
        sort is what makes the residual filter cheap) - pick the column
        your dominant read predicate filters on, the same layout choice
        Delta's OPTIMIZE ZORDER makes. Compaction is exactly where
        clustering belongs: the ingest path stays sort-free and the
        background rewrite pays the sort once per file, off the hot
        path.

        ``cluster_mode="zorder"`` interleaves the cluster columns into a
        Morton code (Delta ``OPTIMIZE ZORDER BY`` analog, lake/zorder.py)
        so ONE layout serves range/point predicates on ALL of them;
        combined with ``max_records_per_file`` the sorted run splits into
        bounded files whose stats sidecars carry tight per-dimension
        ranges - multi-column predicates then skip whole files, not just
        row groups. Quantization bounds come from the existing sidecars
        (driver-side, zero jobs) with a one-row aggregate fallback for
        uncovered columns; bound quality affects clustering only, never
        answers. When neither ``cluster_cols`` nor ``cluster_mode`` is
        given, the table's persistent sort order (:meth:`set_sort_order`,
        the Iceberg table-sort-order analog) applies, so routine
        ``maybe_compact`` maintenance keeps the declared layout."""
        snap = self.snapshot()
        if buckets is not None:
            target = buckets
        else:
            target = sorted(
                {int(b) for b in snap.files} | {int(b) for b in snap.deltas}
            )
        df = self._resolved(snap, target)
        if buckets is None:
            # Full compaction also HEALS stored buckets against the current
            # schema's hashing (no-op under the stored-bucket invariant;
            # repairs tables written before the pk-widening rebucket
            # existed). Partial compaction preserves stored buckets - a
            # healed row could land outside the compacted set.
            df = df.withColumn(
                BUCKET_COL,
                bucket_expr(
                    snap.pk_fields[0],
                    snap.num_buckets,
                    key_type=snap.schema[snap.pk_fields[0]].dataType,
                ),
            )
        if purge_tombstones_below_lsn is not None:
            df = df.filter(
                ~(
                    F.coalesce(F.col(DELETED_COL), F.lit(False))
                    & (F.col(LSN_COL) < purge_tombstones_below_lsn)
                )
            )
        sort_cols, sort_mode = self._resolve_cluster_spec(
            snap, cluster_cols, cluster_mode
        )
        if sort_cols and sort_mode == "zorder":
            from dataingestion_spark.lake.zorder import zorder_expr

            bounds = self._zorder_bounds(snap, sort_cols, target, df)
            # pk tiebreak after the Morton code keeps point lookups on
            # row-group dictionary/min-max as sharp as linear clustering
            cluster_by = [zorder_expr(sort_cols, bounds, snap.schema)] + [
                F.col(c) for c in snap.pk_fields
            ]
        elif sort_cols:
            cluster_by = list(sort_cols)
        else:
            cluster_by = list(snap.pk_fields) if cluster else None
        new_files = self._write_data_files(
            df,
            target_partitions=max(len(target), 1),
            cluster_by=cluster_by,
            bloom_cols=list(snap.pk_fields),
            max_records_per_file=max_records_per_file,
        )
        files = {k: list(v) for k, v in snap.files.items()}
        deltas = {k: list(v) for k, v in snap.deltas.items()}
        for b in set(target) | {int(b) for b in new_files}:
            files[str(b)] = new_files.get(str(b), [])
            deltas.pop(str(b), None)
        return self._commit_write(
            snap, files, snap.schema, snap.schema_version, "compact", None, None,
            {
                "compacted_buckets": [int(b) for b in target],
                # rebase guard: a purging compaction is NOT state-preserving,
                # so concurrent commits must recompute rather than splice
                "purged_below_lsn": purge_tombstones_below_lsn,
                **(
                    {"cluster_cols": list(sort_cols), "cluster_mode": sort_mode}
                    if sort_cols
                    else {}
                ),
            },
            deltas=deltas,
        )

    # ------------------------------------------------------------------
    # maintenance: snapshot expiry + orphan-file vacuum
    # ------------------------------------------------------------------
    def expire_snapshots(
        self, keep_last: int = 10, dry_run: bool = False
    ) -> list[int]:
        """Delete snapshot version files older than the newest
        ``keep_last`` (Iceberg's expire_snapshots). Time travel to an
        expired version stops working; the data/manifest/chunk files only
        those versions referenced become orphans, reclaimed by
        ``vacuum()``. The CURRENT version is always retained, and so is
        every TAGGED version (dataset releases outlive retention until
        their tag is dropped). Driver-side metadata ops only -
        O(versions), no Spark job."""
        if keep_last < 1:
            raise ValueError("keep_last must be >= 1")
        versions = self.retained_versions()
        tagged = set(self.tags().values())
        expired = [v for v in versions[:-keep_last] if v not in tagged]
        if not dry_run:
            for v in expired:
                self._snapshot_path(v).unlink()
                self._snap_cache.pop(v, None)
        return expired

    def vacuum(
        self, older_than_s: float = 3600.0, dry_run: bool = False
    ) -> dict[str, list[str]]:
        """Remove orphan data/manifest/chunk files referenced by NO live
        snapshot (failed commits, expired versions, replaced COW files).
        Only files older than ``older_than_s`` seconds are touched: a
        commit writes its data and manifest files BEFORE the O_EXCL
        snapshot publish, so the grace window keeps vacuum safe to run
        concurrently with writers (the remove-orphans ``olderThan``
        contract). Driver-side file ops, O(total files) - a maintenance
        pass scheduled off the ingest path, exactly like compaction."""
        referenced: set[str] = set()
        # every chain's snapshots are live roots: main (v*.json) AND every
        # WAP branch (B-*-v*.json) - a staged branch's data files must
        # survive vacuum until the branch is dropped
        for p in sorted(self._snap_dir.glob("*.json")):
            d = json.loads(p.read_text())
            for ref in (d.get("manifest_refs") or {}).values():
                referenced.add(ref)
                m = json.loads((self.root / ref).read_text())
                for cref in m.get("chunks", []):
                    referenced.add(cref)
                    c = json.loads((self.root / cref).read_text())
                    referenced.update(c.get("files", []))
                    referenced.update(c.get("deltas", []))
                referenced.update(m.get("files", []))
                referenced.update(m.get("deltas", []))
            # legacy snapshots carried file lists inline
            for fl in (d.get("files") or {}).values():
                referenced.update(fl)
            for fl in (d.get("deltas") or {}).values():
                referenced.update(fl)
        cutoff = time.time() - older_than_s
        removed: dict[str, list[str]] = {"data": [], "manifests": []}

        def _sweep(paths, kind):
            for p in paths:
                rel = str(p.relative_to(self.root))
                if rel in referenced:
                    continue
                try:
                    if p.stat().st_mtime > cutoff:
                        continue
                    removed[kind].append(rel)
                    if not dry_run:
                        p.unlink()
                except FileNotFoundError:
                    continue  # concurrent vacuum/writer cleanup - fine

        _sweep(self.root.glob("data/*/*/*.parquet"), "data")
        if self._manifest_dir.is_dir():
            _sweep(self._manifest_dir.glob("*.json"), "manifests")
        if not dry_run:
            # drop commit dirs left holding no parquet (only write-marker
            # files like _SUCCESS remain), respecting the same grace window
            for cdir in self.root.glob("data/*"):
                if not cdir.is_dir() or cdir.stat().st_mtime > cutoff:
                    continue
                if any(cdir.rglob("*.parquet")):
                    continue
                shutil.rmtree(cdir, ignore_errors=True)
        return removed
