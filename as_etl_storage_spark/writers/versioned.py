"""Versioned tables: a minimal transaction-log layer over parquet.

Delta Lake is not available in this environment; this module provides the
subset of its semantics the engine's write modes promise — atomic commits,
snapshot isolation, and time travel — with the same mechanism Delta uses:
an append-only log of manifest files, one per version, each listing the
data files that make up that version.

    <table>/
      _log/00000000.json             {"version": 0, "op": "overwrite",
                                      "files": [...]}    full snapshot
      _log/00000001.json             {"version": 1, "op": "append",
                                      "add": [...]}      delta
      _log/00000010.checkpoint.json  {"files": [...]}    full snapshot
      part-....parquet               data files (immutable once committed)

Commit protocol: write data files first (invisible until referenced), then
create the next manifest with O_EXCL — the filesystem's atomic create is
the commit point, and a concurrent committer loses the race and retries on
a fresh version number (optimistic concurrency, like Delta). Readers list
the log once and pin a version => consistent snapshots for free; old
versions stay readable until vacuumed.

Log scale (the part that must survive a 100 TB table with ~10^6 data
files and an unbounded commit history): an *append* manifest records only
its OWN files (``add``) — commit cost is O(new files), independent of
table size, and two concurrent appends can never lose each other's files
because neither rewrites the full list. Overwrite/replace are full
snapshots by nature (``files``) — they reset the state. A reader
reconstructs version v by walking back from v to the nearest full
snapshot — a ``*.checkpoint.json`` (written best-effort every
CHECKPOINT_EVERY appends, exactly Delta's parquet checkpoint idea) or a
full manifest — then replaying the ``add`` deltas forward; replay depth
is bounded by CHECKPOINT_EVERY. vacuum writes a checkpoint at the oldest
retained version before truncating older manifests, so retained delta
versions never dangle (Delta's rule: never clean the log past the last
checkpoint).
"""

from __future__ import annotations

import json
import os
import time
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


class VersionedTableError(RuntimeError):
    pass


#: best-effort full-snapshot checkpoint cadence: bounds a reader's delta
#: replay depth AND the log prefix vacuum must preserve. Small enough to
#: keep replay trivial, large enough that checkpoint writes (O(files))
#: stay rare on an append-heavy workload.
CHECKPOINT_EVERY = 10


def _layout_only(manifest: dict) -> bool:
    """True for a version that re-packed the SAME rows (compact /
    OPTIMIZE): its manifest carries ``data_change: false`` (Delta's flag
    on OPTIMIZE add-actions), with the op name as the fallback for
    manifests written before the flag existed. Incremental consumers
    (``changes()``, the ``versioned_changes`` stream source) skip these
    versions wholesale — the content delta across any range is exactly
    its append deltas, however the snapshot is packed."""
    return manifest.get("data_change") is False or manifest.get("op") == "compact"


class VersionedTable:
    def __init__(self, spark: SparkSession, path: str):
        self.spark = spark
        self.path = path
        self.log_dir = os.path.join(path, "_log")

    # -- log ------------------------------------------------------------
    def _versions(self) -> list[int]:
        if not os.path.isdir(self.log_dir):
            return []
        out = []
        for f in os.listdir(self.log_dir):
            if f.endswith(".json"):
                try:
                    out.append(int(f[: -len(".json")]))
                except ValueError:
                    continue
        return sorted(out)

    def latest_version(self) -> int | None:
        vs = self._versions()
        return vs[-1] if vs else None

    def _manifest(self, version: int) -> dict:
        with open(os.path.join(self.log_dir, f"{version:08d}.json")) as fh:
            return json.load(fh)

    def _checkpoint_path(self, version: int) -> str:
        return os.path.join(self.log_dir, f"{version:08d}.checkpoint.json")

    def _state(self, version: int) -> list[str]:
        """Full data-file list at ``version``: walk back to the nearest
        full snapshot (checkpoint, or an overwrite/replace manifest
        carrying ``files``), then replay the append ``add`` deltas
        forward. Replay depth is bounded by CHECKPOINT_EVERY on a healthy
        log; a vacuumed log always retains a snapshot at its oldest
        version (see vacuum), so the walk cannot run off the front."""
        adds: list[list[str]] = []
        v = version
        while True:
            cp = self._checkpoint_path(v)
            if os.path.exists(cp):
                with open(cp) as fh:
                    base = json.load(fh)["files"]
                break
            mpath = os.path.join(self.log_dir, f"{v:08d}.json")
            if not os.path.exists(mpath):
                raise VersionedTableError(
                    f"cannot reconstruct version {version}: manifest {v} is "
                    f"missing and no checkpoint covers it — the log was "
                    f"truncated past the last full snapshot"
                )
            with open(mpath) as fh:
                m = json.load(fh)
            if "files" in m:  # full snapshot (overwrite/replace, or v0)
                base = m["files"]
                break
            adds.append(m["add"])
            v -= 1
        for a in reversed(adds):
            base = base + a
        return base

    def _txns_at(self, version: int) -> dict[str, int]:
        """Application → highest committed batch id at ``version`` (Delta
        SetTransaction): the idempotence ledger for streaming appends.
        Full-snapshot manifests and checkpoints embed the accumulated map
        (``txns``) so markers survive overwrite/compact/vacuum; append
        manifests carry their own ``txn`` pair."""
        layers: list[list] = []
        v = version
        while True:
            cp = self._checkpoint_path(v)
            if os.path.exists(cp):
                with open(cp) as fh:
                    base = dict(json.load(fh).get("txns", {}))
                break
            mpath = os.path.join(self.log_dir, f"{v:08d}.json")
            if not os.path.exists(mpath):
                return {}
            with open(mpath) as fh:
                m = json.load(fh)
            if "files" in m:
                base = dict(m.get("txns", {}))
                break
            if "txn" in m:
                layers.append(m["txn"])
            v -= 1
        for app, batch in reversed(layers):
            if batch > base.get(app, -1):
                base[app] = batch
        return base

    def _stats_at(self, version: int) -> dict[str, dict]:
        """File → column-bounds map at ``version``: same walk as _state,
        with append layers overlaying the base snapshot. Old-format
        manifests without ``stats`` contribute nothing — absent stats
        disable skipping for those files, never correctness."""
        layers: list[dict] = []
        v = version
        while True:
            cp = self._checkpoint_path(v)
            if os.path.exists(cp):
                with open(cp) as fh:
                    base = json.load(fh).get("stats", {})
                break
            mpath = os.path.join(self.log_dir, f"{v:08d}.json")
            if not os.path.exists(mpath):
                return {}  # truncated below a snapshot: no skipping
            with open(mpath) as fh:
                m = json.load(fh)
            if "files" in m:
                base = m.get("stats", {})
                break
            layers.append(m.get("stats", {}))
            v -= 1
        for s in reversed(layers):
            base = {**base, **s}
        return base

    def _write_checkpoint(self, version: int) -> None:
        """Best-effort full-snapshot checkpoint AFTER manifest ``version``
        is committed. Crash-safe by construction: readers that don't find
        it replay deltas instead; temp+rename keeps a torn write from ever
        appearing under the checkpoint name."""
        state = self._state(version)
        stats = self._stats_at(version)
        keep = set(state)
        tmp = os.path.join(self.log_dir, f".tmp-{uuid.uuid4().hex[:8]}")
        with open(tmp, "w") as fh:
            json.dump(
                {
                    "version": version,
                    "files": state,
                    "stats": {f: s for f, s in stats.items() if f in keep},
                    "txns": self._txns_at(version),
                },
                fh,
            )
            fh.flush()
            os.fsync(fh.fileno())
        os.replace(tmp, self._checkpoint_path(version))

    def _commit(
        self,
        files: list[str] | None,
        op: str,
        base_version: int | None,
        new_files: list[str] | None = None,
        txn: tuple[str, int] | None = None,
    ) -> int | None:
        """Atomic commit via O_EXCL manifest create with Delta-style
        conflict resolution on version collision. An *append* manifest is
        a DELTA — it records only ``new_files`` under ``add`` — so commit
        cost is O(new files) regardless of table size, and losing the
        race needs no rebase: the delta composes with any winner's state
        by construction (no full list is rewritten, so a concurrent
        winner's files cannot be dropped). A *replace* (merge) fails on
        collision — its kept/updated row split was computed against a
        now-stale snapshot and must be re-run; an *overwrite* is
        whole-table last-writer-wins and retries as-is."""
        os.makedirs(self.log_dir, exist_ok=True)
        # per-file min/max from the footers just written (Delta's add-file
        # stats) — computed once; a commit-race retry reuses them
        stats = self._collect_stats(
            list(new_files or []) if op == "append" else list(files or [])
        )
        for _ in range(50):
            latest = self.latest_version()
            if txn is not None and latest is not None:
                # idempotence check INSIDE the retry loop: a concurrent
                # same-app writer may have landed this batch between
                # attempts (Delta's SetTransaction rule: skip when the
                # app's highest committed batch already covers this one)
                app, batch = txn
                if self._txns_at(latest).get(app, -1) >= batch:
                    return None
            if latest != base_version:
                # someone committed after this writer snapshotted its base
                if op in ("replace", "compact"):
                    raise VersionedTableError(
                        f"concurrent commit advanced the log to {latest} past "
                        f"base {base_version}; {op} was computed against a "
                        f"stale snapshot — re-run the {op}"
                    )
                # append: the delta needs no rebase; overwrite: whole-table
                # last-writer-wins; both just take the next version number
                base_version = latest
            version = (latest + 1) if latest is not None else 0
            if op == "append" and version > 0:
                manifest = {
                    "version": version,
                    "op": op,
                    "add": list(new_files or []),
                    "stats": stats,
                    "base": base_version,
                    "ts": time.time(),
                }
                if txn is not None:
                    manifest["txn"] = [txn[0], txn[1]]
            else:
                # overwrite/replace reset the state — full snapshot; an
                # append creating the table (version 0) is one too
                if files is None:
                    files = list(new_files or [])
                txns = (
                    self._txns_at(latest) if latest is not None else {}
                )
                if txn is not None and txn[1] > txns.get(txn[0], -1):
                    txns[txn[0]] = txn[1]
                manifest = {
                    "version": version,
                    "op": op,
                    "files": files,
                    "stats": stats,
                    "txns": txns,
                    "base": base_version,
                    "ts": time.time(),
                }
                if op == "compact":
                    # Delta's OPTIMIZE flag: same rows, new packing —
                    # incremental consumers skip this version wholesale
                    manifest["data_change"] = False
            target = os.path.join(self.log_dir, f"{version:08d}.json")
            # the manifest must APPEAR atomically complete: a bare
            # O_EXCL-create-then-write has a crash window where the
            # version exists as an empty/torn file, and every later
            # _manifest() then fails — the table is bricked. Write the
            # full manifest to a temp name (fsync'd), then os.link it to
            # the version name: link both fails like O_EXCL when the
            # version exists (the optimistic-concurrency race is
            # unchanged) and exposes only the complete bytes.
            tmp = os.path.join(self.log_dir, f".tmp-{uuid.uuid4().hex[:8]}")
            with open(tmp, "w") as fh:
                json.dump(manifest, fh)
                fh.flush()
                os.fsync(fh.fileno())
            try:
                os.link(tmp, target)
            except FileExistsError:
                os.unlink(tmp)
                continue  # lost the commit race; loop re-reads the log
            os.unlink(tmp)
            if op == "append" and version > 0 and version % CHECKPOINT_EVERY == 0:
                # bound future readers' delta replay. Best-effort AFTER
                # the commit point: the append IS committed, so a failure
                # here (disk full, concurrent vacuum racing the manifest
                # walk) must not surface as a failed append — a caller
                # retrying a "failed" append would duplicate rows.
                try:
                    self._write_checkpoint(version)
                except Exception:  # noqa: BLE001 - readers replay deltas instead
                    pass
            return version
        raise VersionedTableError("could not commit after 50 attempts")

    # -- data files -----------------------------------------------------
    def _write_data_files(self, df: DataFrame) -> list[str]:
        staging = os.path.join(self.path, f"__stage__{uuid.uuid4().hex[:8]}")
        df.write.mode("overwrite").parquet(staging)
        os.makedirs(self.path, exist_ok=True)
        files = []
        for f in sorted(os.listdir(staging)):
            if not f.endswith(".parquet"):
                continue
            name = f"part-{uuid.uuid4().hex[:12]}.parquet"
            os.rename(os.path.join(staging, f), os.path.join(self.path, name))
            files.append(name)
        import shutil

        shutil.rmtree(staging, ignore_errors=True)
        return files

    def _collect_stats(self, files: list[str]) -> dict[str, dict]:
        """Per-file [min, max] for top-level primitive columns, read from
        the parquet footers the write just produced (Delta's per-add-file
        stats). A column missing min/max in ANY row group is dropped for
        that file — absent stats mean "cannot skip", never "no rows".
        Only JSON-faithful primitives are kept (int/float/str/bool):
        timestamps/decimals would round-trip lossily through the manifest
        and a lossy bound is a wrong bound."""
        import pyarrow.parquet as pq

        out: dict[str, dict] = {}
        for name in files:
            f = pq.ParquetFile(os.path.join(self.path, name))
            md = f.metadata
            mins: dict[str, object] = {}
            maxs: dict[str, object] = {}
            dropped: set[str] = set()
            for rg in range(md.num_row_groups):
                row_group = md.row_group(rg)
                for ci in range(row_group.num_columns):
                    col = row_group.column(ci)
                    cname = col.path_in_schema
                    if "." in cname or cname in dropped:
                        continue  # nested leaf — no top-level bound
                    st = col.statistics
                    ok_types = (int, float, str, bool)
                    if (
                        st is None
                        or not st.has_min_max
                        or not isinstance(st.min, ok_types)
                        or not isinstance(st.max, ok_types)
                    ):
                        dropped.add(cname)
                        mins.pop(cname, None)
                        maxs.pop(cname, None)
                        continue
                    if cname not in mins or st.min < mins[cname]:
                        mins[cname] = st.min
                    if cname not in maxs or st.max > maxs[cname]:
                        maxs[cname] = st.max
            out[name] = {c: [mins[c], maxs[c]] for c in mins if c in maxs}
        return out

    # -- write ops ------------------------------------------------------
    def append(
        self, df: DataFrame, txn: tuple[str, int] | None = None
    ) -> int | None:
        """Append as a new version. ``txn=(app_id, batch_id)`` makes the
        append IDEMPOTENT (Delta's txnAppId/txnVersion): a batch id the
        app has already committed is skipped — returns None and removes
        its staged files — which is exactly what a replayed foreachBatch
        micro-batch needs for exactly-once sink semantics. Commit cost
        stays O(new files): the ledger check reads manifests, never
        data."""
        base = self.latest_version()
        if txn is not None and base is not None:
            # cheap pre-check before paying the data write; the
            # authoritative check re-runs inside the commit loop
            if self._txns_at(base).get(txn[0], -1) >= txn[1]:
                return None
        new_files = self._write_data_files(df)
        v = self._commit(None, "append", base, new_files=new_files, txn=txn)
        if v is None:
            # lost an idempotence race after staging: the files are
            # unreferenced by construction — remove them now instead of
            # waiting for vacuum's grace sweep
            for f in new_files:
                try:
                    os.remove(os.path.join(self.path, f))
                except OSError:
                    pass
        return v

    def overwrite(self, df: DataFrame) -> int:
        base = self.latest_version()
        return self._commit(self._write_data_files(df), "overwrite", base)

    def replace(self, df: DataFrame, merge_keys: list[str]) -> int:
        """MERGE-style upsert as a new version: kept-oldies ∪ incoming.
        Readers of prior versions are unaffected (snapshot isolation)."""
        base = self.latest_version()
        if base is None:
            return self.overwrite(df)
        target = self.read()
        if set(target.columns) != set(df.columns):
            raise VersionedTableError(
                f"replace requires identical columns; target {target.columns} "
                f"vs incoming {df.columns}"
            )
        incoming = df.select(*target.columns)
        kept = target.join(
            incoming.select(*merge_keys).distinct(), on=merge_keys, how="left_anti"
        )
        merged = kept.unionByName(incoming)
        return self._commit(self._write_data_files(merged), "replace", base)

    # -- read -----------------------------------------------------------
    _PRUNE_OPS = ("=", "<", "<=", ">", ">=")

    @staticmethod
    def _file_may_match(
        fstats: dict, col: str, op: str, val: object
    ) -> bool:
        """Can a file with these column bounds hold a row satisfying
        ``col op val``? Missing/incomparable bounds → True (cannot skip).
        NULL rows are not covered by parquet min/max, but every supported
        operator is NULL-eliminating (SQL comparison with NULL is never
        true), so skipping on bounds alone stays correct.

        NaN needs care (measured against Spark's writer, not assumed):
        Spark orders NaN GREATEST, writes ``max=NaN`` for any file
        holding one, and ``NaN > x`` is True in Spark SQL while False in
        Python — naive bound math would skip files whose NaN rows match.
        A NaN upper bound therefore means "NaN present, non-NaN ceiling
        unknown": > / >= can never skip, and = / < / <= may use only the
        lower bound (NaN rows cannot equal a non-NaN literal or sort
        below one). A NaN *literal* disables skipping outright."""
        import math

        bounds = fstats.get(col)
        if not bounds:
            return True
        lo, hi = bounds
        if lo is None or hi is None:
            return True
        try:
            if isinstance(val, float) and math.isnan(val):
                return True  # NaN = NaN is true in Spark; never skip
            if isinstance(hi, float) and math.isnan(hi):
                if op == "=":
                    return not val < lo
                if op == "<":
                    return lo < val
                if op == "<=":
                    return lo <= val
                return True  # > / >=: the NaN rows always match
            if op == "=":
                return lo <= val <= hi
            if op == "<":
                return lo < val
            if op == "<=":
                return lo <= val
            if op == ">":
                return hi > val
            return hi >= val  # >=
        except TypeError:
            return True  # literal not comparable to the stored bound

    def _commit_ts(self, version: int) -> float:
        """Commit wall-clock of ``version`` as epoch seconds: the
        manifest's ``ts`` field, falling back to the manifest FILE's
        mtime for logs written before the field existed (the same source
        Delta uses for its pre-InCommitTimestamp tables)."""
        ts = self._manifest(version).get("ts")
        if ts is not None:
            return float(ts)
        return os.path.getmtime(
            os.path.join(self.log_dir, f"{version:08d}.json")
        )

    def resolve_timestamp(self, timestamp: object) -> int:
        """Version whose snapshot was current at ``timestamp`` — the
        LATEST version committed at-or-before it (Delta's timestampAsOf
        rule). Accepts epoch seconds (int/float), a ``datetime`` (naive =
        local time, as ``datetime.timestamp()`` defines), or an ISO-8601
        string. Raises before the first commit: there is no "empty table"
        version to travel to. Commit timestamps are made monotonic with a
        running max before resolving (clock skew between committers must
        not make a LATER version win an EARLIER timestamp — Delta applies
        the same adjustment)."""
        from datetime import datetime

        if isinstance(timestamp, str):
            timestamp = datetime.fromisoformat(timestamp)
        if isinstance(timestamp, datetime):
            timestamp = timestamp.timestamp()
        t = float(timestamp)
        vs = self._versions()
        if not vs:
            raise VersionedTableError(f"no committed versions at {self.path}")
        chosen = None
        running = float("-inf")
        for v in vs:
            running = max(running, self._commit_ts(v))
            if running <= t:
                chosen = v
            else:
                break  # adjusted timestamps are monotonic: done
        if chosen is None:
            raise VersionedTableError(
                f"timestamp {t} precedes the first commit "
                f"({running}, version {vs[0]}) — no snapshot existed yet"
            )
        return chosen

    def read(
        self,
        version_as_of: int | None = None,
        prune: list[tuple[str, str, object]] | None = None,
        timestamp_as_of: object = None,
    ) -> DataFrame:
        """Snapshot read, optionally with manifest-level data skipping:
        ``prune`` is a conjunction of ``(column, op, literal)`` simple
        predicates (ops ``= < <= > >=``). Files whose stored min/max
        bounds cannot satisfy ALL predicates are dropped from the scan
        BEFORE Spark ever lists them — at 10⁶ files a selective predicate
        skips the task launch and footer read per pruned file, which row-
        group pruning inside the scan cannot do. The predicates are also
        applied as real filters, so the result is exactly the filtered
        snapshot (skipping is an optimization, never a semantic).

        ``timestamp_as_of`` (exclusive with ``version_as_of``) is the
        other half of Delta's time travel: the snapshot current at that
        wall-clock instant — see :meth:`resolve_timestamp`."""
        if timestamp_as_of is not None and version_as_of is not None:
            raise VersionedTableError(
                "pass version_as_of OR timestamp_as_of, not both"
            )
        if timestamp_as_of is not None:
            version_as_of = self.resolve_timestamp(timestamp_as_of)
        vs = self._versions()
        if not vs:
            raise VersionedTableError(f"no committed versions at {self.path}")
        version = vs[-1] if version_as_of is None else version_as_of
        if version not in vs:
            raise VersionedTableError(
                f"version {version} not found; available {vs[0]}..{vs[-1]}"
            )
        files = self._state(version)
        kept = files
        if prune:
            for _, op, _v in prune:
                if op not in self._PRUNE_OPS:
                    raise VersionedTableError(
                        f"unsupported prune op {op!r}; one of {self._PRUNE_OPS}"
                    )
            stats = self._stats_at(version)
            kept = [
                f
                for f in files
                if all(
                    self._file_may_match(stats.get(f, {}), c, op, v)
                    for (c, op, v) in prune
                )
            ]
            if not kept:
                # every file skipped: empty result, table schema intact
                from pyspark.sql import functions as F

                return (
                    self.read(version_as_of=version)
                    .where(F.lit(False))
                    .limit(0)
                )
        files = kept
        if not files:
            # unreachable through the write API (Spark emits at least one
            # part file even for an empty frame); a hand-edited manifest
            # gets an error, not a fabricated one-column schema
            raise VersionedTableError(
                f"version {version} references no data files; the schema "
                f"is unrecoverable from an empty manifest"
            )
        paths = [os.path.join(self.path, f) for f in files]
        # mergeSchema: a version committed after additive evolution
        # (evolveSchema) references files with both the old and the new
        # column set — without merging, the table schema would be whatever
        # file happens to be listed first and added columns would silently
        # vanish
        df = self.spark.read.option("mergeSchema", "true").parquet(*paths)
        if prune:
            from pyspark.sql import functions as F

            for c, op, v in prune:
                col = F.col(c)
                df = df.where(
                    {
                        "=": col == F.lit(v),
                        "<": col < F.lit(v),
                        "<=": col <= F.lit(v),
                        ">": col > F.lit(v),
                        ">=": col >= F.lit(v),
                    }[op]
                )
        return df

    def changes(
        self,
        from_version: int | None = None,
        to_version: int | None = None,
        from_timestamp: object = None,
    ) -> DataFrame:
        """Rows ADDED after ``from_version`` up to and including
        ``to_version`` (default: latest) — the incremental-read primitive
        (Delta CDF for the append-only case). A 100 TB training pipeline
        re-reads the table every cycle unless it can ask "what's new since
        the version I last processed?"; this answers from the delta
        manifests alone — O(versions-in-range) metadata, a scan over only
        the NEW files, zero data shuffled or diffed. ``from_version=-1``
        reads from the very first version (a consumer bootstrapping on an
        append-created table gets version 0's rows incrementally).

        A COMPACT version in the range is skipped transparently: it is a
        pure layout rewrite (its manifest carries ``data_change: false``,
        Delta's OPTIMIZE flag) — the rows added in the range are exactly
        the append deltas regardless of how the snapshot was re-packed.
        This is what keeps incremental consumers incremental at 100 TB,
        where OPTIMIZE runs nightly: without the flag every compaction
        would force every downstream consumer into a full re-read.

        Overwrite/replace DO change data: row-level changes cannot be
        derived from their file lists, so those raise, directing the
        caller to a full re-read (the same limitation Delta CDF has when
        CDC files are disabled).

        ``from_timestamp`` (exclusive with ``from_version``; Delta CDF's
        startingTimestamp): rows added after the snapshot current at
        that instant — resolved through :meth:`resolve_timestamp`, an
        instant before the first commit meaning "from the beginning"."""
        if from_timestamp is not None:
            if from_version is not None:
                raise VersionedTableError(
                    "pass from_version OR from_timestamp, not both"
                )
            try:
                from_version = self.resolve_timestamp(from_timestamp)
            except VersionedTableError:
                from_version = -1  # before the first commit
        elif from_version is None:
            raise VersionedTableError(
                "changes() needs from_version or from_timestamp"
            )
        vs = self._versions()
        if not vs:
            raise VersionedTableError(f"no committed versions at {self.path}")
        to_version = vs[-1] if to_version is None else to_version
        if to_version not in vs:
            raise VersionedTableError(
                f"version {to_version} not found; available {vs[0]}..{vs[-1]}"
            )
        if from_version > to_version:
            raise VersionedTableError(
                f"changes range is backwards: from {from_version} "
                f"to {to_version}"
            )
        added: list[str] = []
        for v in range(from_version + 1, to_version + 1):
            if v not in vs:
                raise VersionedTableError(
                    f"version {v} in the changes range was vacuumed; "
                    f"incremental read is impossible — full re-read required"
                )
            m = self._manifest(v)
            if _layout_only(m):
                continue  # compact: same rows, new packing — no change
            if "add" in m:
                added.extend(m["add"])
            elif m["op"] == "append":
                # an append that CREATED the table (version 0) commits a
                # full-snapshot manifest, but its "files" are exactly the
                # appended files — so it IS incremental. Without this, a
                # stream-created table (VersionedStreamWriter batch 0) has
                # no changes() range covering its first batch.
                added.extend(m["files"])
            else:
                raise VersionedTableError(
                    f"version {v} is {m['op']!r}, not an append: row-level "
                    f"changes cannot be derived from file lists across a "
                    f"data-changing rewrite — full re-read required"
                )
        if not added:  # from == to: empty frame with the snapshot's schema
            return self.read(version_as_of=to_version).limit(0)
        paths = [os.path.join(self.path, f) for f in added]
        return self.spark.read.option("mergeSchema", "true").parquet(*paths)

    def compact(
        self,
        target_file_bytes: int = 128 * 1024 * 1024,
        zorder: list[str] | None = None,
        zorder_cells: str = "auto",
    ) -> int:
        """Bin-pack small data files into ~``target_file_bytes`` files as
        a new version (Delta's OPTIMIZE). The append-heavy path that the
        delta log makes cheap also breeds small files — the classic
        100 TB read-amplification problem: a snapshot of 10^6 tiny files
        pays 10^6 footer reads + task launches per scan. Compaction
        rewrites the CURRENT snapshot's data into right-sized files and
        commits a full-snapshot manifest; prior versions still reference
        the old files (snapshot isolation holds), which vacuum reclaims
        once out of retention.

        ``zorder`` (Delta's OPTIMIZE ZORDER BY): rewrite clustered on the
        Morton key over the listed numeric columns instead of a plain
        coalesce. Appends cluster by ARRIVAL, so after N ingest cycles
        every file's min/max spans the whole key space and
        ``read(prune=...)`` skips nothing; the z-ordered rewrite gives
        every output file a tight bound in ALL listed dimensions, making
        the manifest stats (re-collected from the new footers at commit)
        selective again — the layout half of the data-skipping story.
        Costs one range shuffle instead of coalesce's shuffle-free
        narrowing, paid once per OPTIMIZE cycle. A zorder compaction
        always rewrites, even when the file count is already right-sized:
        its purpose is re-clustering, not packing.

        ``zorder_cells`` picks the cell scheme: ``'width'`` = equi-width
        value cells (numeric only; one min/max aggregate, zero sampling),
        ``'ranked'`` = equi-populated quantile cells from one sampled-
        boundary job (any orderable type; the skew-robust choice — force
        it on a power-law numeric column where width cells collapse into
        a handful of buckets), ``'auto'`` (default) = width when every
        z-order column is numeric, ranked otherwise.

        Commits with the replace conflict rule: a concurrent writer
        advancing the log aborts the compaction (its rewrite no longer
        reflects the latest state) rather than clobbering. The manifest
        carries ``data_change: false`` (Delta's OPTIMIZE flag):
        incremental consumers — ``changes()`` and the
        ``versioned_changes`` stream source — skip the version
        wholesale, so layout maintenance never costs consumers a
        re-read. Returns the new version. No-op (returns the current
        version) when the table already has nothing to pack (plain mode
        only)."""
        base = self.latest_version()
        if base is None:
            raise VersionedTableError(f"no committed versions at {self.path}")
        files = self._state(base)
        sizes = []
        for f in files:
            try:
                sizes.append(os.path.getsize(os.path.join(self.path, f)))
            except OSError as e:
                raise VersionedTableError(
                    f"version {base} references missing data file {f}"
                ) from e
        total = sum(sizes)
        n_target = max(1, -(-total // target_file_bytes))  # ceil
        if zorder:
            from pyspark.sql.types import NumericType

            from as_etl_storage_spark.writers.layout import (
                attach_zorder_key_ranked,
                zorder_key,
            )

            if zorder_cells not in ("auto", "width", "ranked"):
                raise ValueError(
                    f"zorder_cells must be auto|width|ranked, got "
                    f"{zorder_cells!r}"
                )
            snap = self.read(version_as_of=base)
            numeric = {
                f.name
                for f in snap.schema.fields
                if isinstance(f.dataType, NumericType)
            }
            if zorder_cells == "width" and not set(zorder) <= numeric:
                raise ValueError(
                    "zorder_cells='width' needs numeric columns for "
                    "equi-width cells; non-numeric in "
                    f"{sorted(set(zorder) - numeric)} — use 'ranked'"
                )
            use_width = (
                zorder_cells == "width"
                or (zorder_cells == "auto" and set(zorder) <= numeric)
            )
            if use_width:
                # equi-width value cells: zero extra jobs beyond one
                # min/max aggregate; right when the columns are numeric
                # and roughly uniform
                row = snap.agg(
                    *[
                        f
                        for c in zorder
                        for f in (
                            F.min(c).alias(f"{c}__lo"),
                            F.max(c).alias(f"{c}__hi"),
                        )
                    ]
                ).collect()[0]
                bounds = {
                    c: (row[f"{c}__lo"], row[f"{c}__hi"]) for c in zorder
                }
                keyed = snap.withColumn("__zkey", zorder_key(zorder, bounds))
            else:
                # strings/dates (or anything the width form can't cell),
                # or zorder_cells='ranked' forcing quantile cells on a
                # skewed numeric column: equi-populated buckets from ONE
                # sampled-boundary job across all listed columns
                keyed = attach_zorder_key_ranked(snap, zorder, "__zkey")
            df = (
                keyed.repartitionByRange(n_target, "__zkey")
                .sortWithinPartitions("__zkey")
                .drop("__zkey")
            )
            return self._commit(self._write_data_files(df), "compact", base)
        if len(files) <= n_target:
            return base  # already right-sized; nothing to rewrite
        # one shuffle-free rewrite: coalesce narrows partitions without an
        # exchange — at 10^6 inputs the scan parallelism stays wide and
        # only the write fan-in narrows
        df = self.read().coalesce(n_target)
        return self._commit(self._write_data_files(df), "compact", base)

    def history(self) -> list[dict]:
        return [self._manifest(v) for v in self._versions()]

    def vacuum(self, retain_last: int = 1, grace_seconds: float = 600.0) -> int:
        """Delete data files unreferenced by the last ``retain_last``
        versions (and their manifests). Returns files removed.

        ``grace_seconds`` (Delta's retention-window idea, scaled to this
        sandbox): files younger than the grace are kept even when
        unreferenced — the commit protocol writes data files FIRST and
        references them only at the O_EXCL manifest commit, so an
        in-flight writer's fresh files are always momentarily
        unreferenced; vacuuming them would let its commit succeed while
        pointing at deleted files. Pass 0 only when no concurrent writer
        can exist."""
        import time as _time

        now = _time.time()

        def _old_enough(full: str) -> bool:
            try:
                return now - os.path.getmtime(full) >= grace_seconds
            except OSError:
                return False  # already gone (concurrent vacuum)

        # orphaned commit temps: a crash between os.link and
        # os.unlink(tmp) leaves a .tmp-* behind — invisible to _versions
        # (no .json suffix) so correctness holds, but nothing else ever
        # deletes it. Swept before the retain_last early-return so even a
        # single-version table gets cleaned; the grace window protects an
        # in-flight committer's temp the same way it protects its files.
        if os.path.isdir(self.log_dir):
            for f in os.listdir(self.log_dir):
                if f.startswith(".tmp-"):
                    full = os.path.join(self.log_dir, f)
                    if _old_enough(full):
                        try:
                            os.remove(full)
                        except OSError:
                            pass  # concurrent vacuum won the race

        vs = self._versions()
        if len(vs) <= retain_last:
            return 0
        keep_versions = vs[-retain_last:]
        keep_files = set()
        for v in keep_versions:
            keep_files.update(self._state(v))
        # Delta's log-cleanup rule: never truncate past the last full
        # snapshot. The oldest RETAINED version must stay reconstructible
        # once the manifests below it are gone — if it is an append delta
        # with no checkpoint, snapshot it now (its state was just computed
        # above; _write_checkpoint re-derives it from the intact log).
        oldest_kept = keep_versions[0]
        if (
            not os.path.exists(self._checkpoint_path(oldest_kept))
            and "files" not in self._manifest(oldest_kept)
        ):
            self._write_checkpoint(oldest_kept)
        removed = 0
        for f in os.listdir(self.path):
            if f.endswith(".parquet") and f not in keep_files:
                full = os.path.join(self.path, f)
                if not _old_enough(full):
                    continue
                os.remove(full)
                removed += 1
        for v in vs[:-retain_last]:
            # the same grace applies to manifests: deleting a young
            # version's manifest while its files are grace-protected
            # would orphan the files AND lose the version early
            mf = os.path.join(self.log_dir, f"{v:08d}.json")
            if _old_enough(mf):
                os.remove(mf)
            # a vacuumed version's checkpoint goes with its manifest
            cp = self._checkpoint_path(v)
            if os.path.exists(cp) and _old_enough(cp):
                os.remove(cp)
        return removed
