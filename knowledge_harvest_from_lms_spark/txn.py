"""Transactional multi-table commits over plain parquet — a minimal
file-based commit log (the Iceberg/Delta *pattern* without the jar).

Closes the crash-window caveats that ROADMAP item 2 parked "until
Iceberg lands" (no Iceberg runtime jar exists in this sandbox and
pypi is unreachable, verified r4): ``stage_overwrite_all``'s torn
multi-table promote, merge_into_graph's mixed-generation replay
caveat, and readers racing an in-place parquet overwrite. The
protocol is the standard log-structured-catalog one (Delta's
``_delta_log`` / Iceberg's metadata pointer), cut down to what the
engine needs:

* **Data is immutable.** Every write lands in a FRESH generation
  directory ``<root>/_data/<table>/g-<version 20d>-<uuid8>/``; no
  parquet dir is ever overwritten in place, so a reader can never
  observe a missing or partially-rewritten table.
* **A commit is ONE file**: ``<root>/_txn/<version 20d>.json``,
  naming the generation dir list of EVERY table in the group
  (unchanged tables carry forward from the parent manifest; an
  *append* adds a dir to a table's list, an *overwrite* replaces the
  list). Readers resolve the highest committed version and read only
  the dirs it names — multi-table atomicity and snapshot isolation
  fall out of the single-pointer design.
* **Commit promotion** stages the manifest bytes to a tmp name and
  publishes with an atomic create-if-absent: on the local FS a POSIX
  hard link (``Files.createLink`` — EEXIST is decided in the kernel,
  no check-then-act window, so two same-version writers serialize
  there: exactly one wins, the loser gets ``ConcurrentCommitError``);
  on HDFS the no-overwrite ``rename`` (atomic on the namenode).
  Object stores should point ``_txn`` at a conditional-PUT store,
  exactly as Delta/Iceberg do.
* **Crash anywhere before the rename** leaves only unreferenced
  generation dirs and a ``.tmp`` manifest; readers still resolve the
  previous version, and :meth:`TxnLog.vacuum` removes the garbage.
  Readers also skip unparseable manifests (a torn local-FS rename
  degrades to "previous version wins", never to a torn table set).

Scale note (100 TB): the manifest holds one short string per
generation dir — a daily-compacted log stays in the kilobytes even
at thousands of commits, and ``vacuum(retain=k)`` bounds both the
manifest count and the dead-file footprint. All data I/O is ordinary
parquet through the Hadoop FileSystem API, so the log works
unchanged on ``hdfs://`` / ``s3a://`` table roots (with the usual
S3 rename caveat: a real deployment points ``_txn`` at a
rename-atomic store or swaps in a conditional-PUT, exactly as
Delta/Iceberg do).
"""

from __future__ import annotations

import json
import uuid

from pyspark.sql import DataFrame, SparkSession

from .fsutil import _fs_and_path, hadoop_delete

_MANIFEST_WIDTH = 20

# string stat bounds longer than this are not recorded (a truncated
# max is an UNSAFE upper bound unless the last char is bumped, the
# Iceberg trick — omitting the stat keeps pruning conservative)
_STATS_MAX_STR = 256


def _stat_encode(v):
    """Encode one min/max bound as a JSON-storable, order-preserving
    primitive; ``None`` = not encodable (the column is then omitted
    from that file's stats, so pruning stays conservative). The SAME
    encoder normalizes user prune bounds, so comparisons are always
    like-for-like."""
    import datetime
    import decimal

    if v is None or isinstance(v, (decimal.Decimal, bytes, bytearray)):
        # Decimal -> float rounds at the boundary, which could wrongly
        # EXCLUDE a file; bytes/arrays/structs aren't orderable here
        return None
    if isinstance(v, bool):
        return int(v)
    if isinstance(v, (int, float)):
        return v
    if isinstance(v, str):
        return v if len(v) <= _STATS_MAX_STR else None
    if isinstance(v, datetime.datetime):
        if v.tzinfo is None:
            v = v.replace(tzinfo=datetime.timezone.utc)
        return v.timestamp()
    if isinstance(v, datetime.date):
        return float(v.toordinal())
    return None


def _file_may_match(fstats: dict, bounds: dict) -> bool:
    """True unless the file's recorded [min, max] PROVES no row can
    satisfy every (lo, hi) range. Missing column stats never prune;
    ``[None, None]`` means the file has zero non-null values for the
    column, so a (null-rejecting) range predicate can't match it."""
    for col, (lo, hi) in bounds.items():
        if lo is None and hi is None:
            # open-open: not a predicate — even an all-null file matches
            continue
        entry = fstats.get(col)
        if entry is None:
            continue
        mn, mx = entry
        if mn is None and mx is None:
            return False
        try:
            if hi is not None and mn is not None and mn > hi:
                return False
            if lo is not None and mx is not None and mx < lo:
                return False
        except TypeError:
            # bound/stat type mismatch (e.g. str vs number): refuse to
            # prune rather than guess an ordering
            continue
    return True


class ConcurrentCommitError(RuntimeError):
    """Another writer claimed the next version first (single-writer
    assumption violated); the staged data dirs are left for vacuum."""


def _read_small_file(sess: SparkSession, path: str) -> bytes:
    fs, p = _fs_and_path(sess, path)
    stream = fs.open(p)
    try:
        data = bytes(
            sess._jvm.org.apache.commons.io.IOUtils.toByteArray(stream)
        )
    finally:
        stream.close()
    return data


def _write_small_file(sess: SparkSession, path: str, data: bytes) -> None:
    fs, p = _fs_and_path(sess, path)
    out = fs.create(p, True)
    try:
        out.write(bytearray(data))
    finally:
        out.close()


def _promote_manifest(sess: SparkSession, tmp: str, final: str) -> bool:
    """Atomically publish ``tmp`` as ``final`` iff ``final`` does not
    already exist; returns False on a lost race (tmp is cleaned up
    either way). This is the commit's conditional PUT:

    * ``file://`` — POSIX hard link: ``link(2)`` fails with EEXIST
      atomically IN THE KERNEL, so two writers racing the same
      version serialize there with no check-then-act window (the
      multi-writer upgrade the r4 docstring named; previously the
      local FS had a narrow exists-then-rename lost-update window).
    * everything else — Hadoop no-overwrite ``rename``, atomic on
      the HDFS namenode; object stores should point ``_txn`` at a
      rename-atomic / conditional-PUT store, as Delta/Iceberg do.
    """
    fs, fp = _fs_and_path(sess, final)
    _, tp = _fs_and_path(sess, tmp)
    if fs.getUri().getScheme() == "file":
        from py4j.protocol import Py4JJavaError

        jvm = sess._jvm
        jfinal = jvm.java.io.File(fp.toUri().getPath()).toPath()
        jtmp = jvm.java.io.File(tp.toUri().getPath()).toPath()
        try:
            jvm.java.nio.file.Files.createLink(jfinal, jtmp)
        except Py4JJavaError as e:
            name = e.java_exception.getClass().getName()
            hadoop_delete(sess, tmp)
            if name.endswith("FileAlreadyExistsException"):
                return False
            raise  # real I/O failure, not a lost race
        hadoop_delete(sess, tmp)
        return True
    if fs.exists(fp) or not fs.rename(tp, fp):
        hadoop_delete(sess, tmp)
        return False
    return True


class TxnLog:
    """A versioned group of parquet tables with atomic multi-table
    commits. One instance per table-group root; cheap to construct
    (state lives entirely on the filesystem)."""

    def __init__(self, sess: SparkSession, root: str):
        self.sess = sess
        self.root = root.rstrip("/")

    # ---- layout -------------------------------------------------
    def _txn_dir(self) -> str:
        return self.root + "/_txn"

    def _manifest_path(self, version: int) -> str:
        return f"{self._txn_dir()}/{version:0{_MANIFEST_WIDTH}d}.json"

    def _gen_dir(self, table: str, version: int) -> str:
        # relative to root so the group can be relocated wholesale
        return f"_data/{table}/g-{version:0{_MANIFEST_WIDTH}d}-{uuid.uuid4().hex[:8]}"

    # ---- log scan -----------------------------------------------
    def versions(self) -> list[int]:
        fs, p = _fs_and_path(self.sess, self._txn_dir())
        if not fs.exists(p):
            return []
        out = []
        for st in fs.listStatus(p):
            name = st.getPath().getName()
            if name.endswith(".json") and not name.startswith("."):
                try:
                    out.append(int(name[: -len(".json")]))
                except ValueError:
                    continue
        return sorted(out)

    def _load(self, version: int) -> dict | None:
        try:
            return json.loads(
                _read_small_file(self.sess, self._manifest_path(version))
            )
        except Exception:
            # torn/unreadable manifest: treat as never committed
            return None

    def latest(self) -> tuple[int, dict]:
        """(version, manifest); (0, empty) for a fresh root. Scans
        from the highest version down, skipping torn manifests."""
        for v in reversed(self.versions()):
            m = self._load(v)
            if m is not None:
                return v, m
        return 0, {"version": 0, "parent": None, "tables": {}, "meta": {}}

    # ---- reads --------------------------------------------------
    def tables(self, version: int | None = None) -> dict[str, list[str]]:
        """table name -> ABSOLUTE generation-dir paths, newest last."""
        if version is None:
            _, m = self.latest()
        else:
            m = self._load(version)
            if m is None:
                raise FileNotFoundError(
                    f"no committed manifest v{version} under {self.root}"
                )
        return {
            t: [f"{self.root}/{d}" for d in dirs]
            for t, dirs in m["tables"].items()
        }

    def read(
        self,
        table: str,
        schema=None,
        version: int | None = None,
        prune: dict[str, tuple] | None = None,
    ) -> DataFrame:
        """Snapshot read: the returned plan lists IMMUTABLE dirs, so
        it stays valid across later commits (no stage/tmp dance is
        needed when a commit's input plans read the previous
        generation). Without an explicit ``schema`` the manifest's
        recorded writer schema pins the read — so an all-empty
        generation (zero-row write → parquet dir with no data files)
        never trips schema inference, and old generations missing a
        later-added column surface it as nulls.

        ``prune={col: (lo, hi)}`` turns the scan into a data-skipping
        read: files whose committed min/max stats (``stats_for`` at
        commit/compact time) exclude the range are dropped from the
        plan BEFORE Spark sees them — at thousands of generation files
        this is the manifest-level skipping Iceberg does, on top of
        (not instead of) parquet row-group pushdown. The equivalent
        exact row filter is re-applied to the surviving files, so the
        result equals ``read(table).filter(...)`` bit-for-bit."""
        if version is None:
            version, m = self.latest()
        else:
            m = self._load(version)
            if m is None:
                raise FileNotFoundError(
                    f"no committed manifest v{version} under {self.root}"
                )
        dirs = m["tables"].get(table)
        if not dirs:
            raise FileNotFoundError(f"table {table!r} not in {self.root} log")
        reader = self.sess.read
        if schema is None and table in m.get("schemas", {}):
            from pyspark.sql import types as T

            schema = T.StructType.fromJson(json.loads(m["schemas"][table]))
        if schema is not None:
            reader = reader.schema(schema)
        if prune is None:
            return reader.parquet(*[f"{self.root}/{d}" for d in dirs])
        from pyspark.sql import functions as F

        selected, _ = self.prune_files(table, prune, version=version)
        if selected:
            df = reader.parquet(*selected)
        elif schema is not None:
            df = self.sess.createDataFrame([], schema)
        else:
            df = self.sess.read.parquet(
                *[f"{self.root}/{d}" for d in dirs]
            ).filter(F.lit(False))
        for c, (lo, hi) in prune.items():
            if lo is not None:
                df = df.filter(F.col(c) >= F.lit(lo))
            if hi is not None:
                df = df.filter(F.col(c) <= F.lit(hi))
        return df

    def has_table(self, table: str) -> bool:
        return table in self.tables()

    # ---- data skipping -------------------------------------------
    def _collect_file_stats(self, rel: str, cols: list[str]) -> dict:
        """Per-file min/max for ``cols`` over one freshly-written
        generation dir, computed ENGINE-SIDE: one column-pruned scan
        grouped by ``input_file_name()`` (portable to any Hadoop FS —
        no parquet-footer JNI — and cheap right after the write while
        the files are hot). Returns {rel_file: {col: [mn, mx]}};
        ``[None, None]`` records an all-null file, an omitted column
        an unencodable bound (both prune-safe, see _file_may_match)."""
        from pyspark.sql import functions as F

        df = self.sess.read.parquet(f"{self.root}/{rel}")
        present = [c for c in cols if c in df.columns]
        if not present:
            return {}
        aggs = []
        for c in present:
            aggs.append(F.min(F.col(c)).alias(f"mn__{c}"))
            aggs.append(F.max(F.col(c)).alias(f"mx__{c}"))
        rows = (
            df.select(F.input_file_name().alias("_f"), *present)
            .groupBy("_f")
            .agg(*aggs)
            .collect()
        )
        out: dict[str, dict] = {}
        for r in rows:
            uri = r["_f"]
            i = uri.rfind("/_data/")
            if i < 0:
                continue
            st: dict[str, list] = {}
            for c in present:
                raw_mn, raw_mx = r[f"mn__{c}"], r[f"mx__{c}"]
                if raw_mn is None and raw_mx is None:
                    st[c] = [None, None]
                    continue
                mn, mx = _stat_encode(raw_mn), _stat_encode(raw_mx)
                if mn is not None and mx is not None:
                    st[c] = [mn, mx]
            out[uri[i + 1:]] = st
        return out

    def prune_files(
        self,
        table: str,
        prune: dict[str, tuple],
        version: int | None = None,
    ) -> tuple[list[str], int]:
        """Plan a data-skipping scan: list ``table``'s data files and
        drop every file whose manifest stats prove it cannot contain a
        row matching all of ``prune`` ({col: (lo, hi)}, either bound
        None for open). Returns (selected ABSOLUTE paths, total file
        count). Files without recorded stats are always selected —
        correctness never depends on stats existing."""
        if version is None:
            version, m = self.latest()
        else:
            m = self._load(version)
            if m is None:
                raise FileNotFoundError(
                    f"no committed manifest v{version} under {self.root}"
                )
        dirs = m["tables"].get(table)
        if not dirs:
            raise FileNotFoundError(f"table {table!r} not in {self.root} log")
        stats = m.get("stats", {}).get(table, {})
        bounds = {
            c: (_stat_encode(lo), _stat_encode(hi))
            for c, (lo, hi) in prune.items()
        }
        selected: list[str] = []
        total = 0
        for rel in dirs:
            fs, p = _fs_and_path(self.sess, f"{self.root}/{rel}")
            if not fs.exists(p):
                continue
            for st in fs.listStatus(p):
                name = st.getPath().getName()
                if name.startswith(("_", ".")) or st.isDirectory():
                    continue
                total += 1
                relf = f"{rel}/{name}"
                fstats = stats.get(relf)
                if fstats is None or _file_may_match(fstats, bounds):
                    selected.append(f"{self.root}/{relf}")
        return selected, total

    def commit_meta(self, version: int) -> dict | None:
        """The ``meta`` dict commit ``version`` recorded (``None`` for
        a torn or vacuumed manifest). Lets incremental consumers find
        their cursor — e.g. the newest commit whose meta carries their
        checkpoint key — without reading any table data."""
        m = self._load(version)
        return None if m is None else dict(m.get("meta", {}))

    # ---- commit -------------------------------------------------
    def commit(
        self,
        overwrites: dict[str, DataFrame] | None = None,
        appends: dict[str, DataFrame] | None = None,
        meta: dict | None = None,
        stats_for: dict[str, list[str]] | None = None,
    ) -> int:
        """Atomically publish a new version: each df materializes to
        a fresh generation dir (reading the PREVIOUS generations —
        safe, they are immutable), then ONE manifest rename makes
        every change visible together. Returns the committed version
        (the snapshot id recorded in stage manifests / lineage).

        Storage contract (same as Iceberg's HadoopCatalog): the
        filesystem must provide an ATOMIC create-if-absent. The local
        FS gets it from ``link(2)`` (EEXIST decided in the kernel —
        two same-version writers from ANY mix of threads/processes
        serialize there, exactly one wins, the loser raises
        ``ConcurrentCommitError`` with no torn state); HDFS from the
        namenode's no-overwrite rename; object stores should point
        ``_txn`` at a conditional-PUT store as Delta/Iceberg do. See
        tests/test_txn.py::test_two_writer_race_exactly_one_wins.

        ``stats_for={table: [col, ...]}`` opts named tables into
        per-file min/max stats (Iceberg's write.metadata.metrics):
        recorded in the manifest, consumed by :meth:`read`'s ``prune``
        / :meth:`prune_files`. Opt-in per column so manifests stay
        KB-sized. Overwriting a table resets its stats; appended
        generations merge into the carried-forward map; files written
        without stats simply never prune."""
        base_v, base = self.latest()
        v = base_v + 1
        stats_for = stats_for or {}
        meta = dict(meta or {})
        # The streaming replay cursor is STICKY: a maintenance or
        # consumer commit that doesn't set its own batch_id carries
        # the parent's forward, so the LATEST manifest always knows
        # the last folded batch and vacuum can never age out every
        # manifest that does (r4 ADVICE: after `maintain(retain=1)`
        # aged out all fold manifests, a replayed batch re-folded and
        # double-counted the additive rollup partials).
        if "batch_id" not in meta and "batch_id" in base.get("meta", {}):
            meta["batch_id"] = base["meta"]["batch_id"]
        tables = {t: list(d) for t, d in base["tables"].items()}
        schemas = dict(base.get("schemas", {}))
        stats = {t: dict(s) for t, s in base.get("stats", {}).items()}
        for name, df in (overwrites or {}).items():
            rel = self._gen_dir(name, v)
            df.write.parquet(f"{self.root}/{rel}")
            tables[name] = [rel]
            schemas[name] = df.schema.json()
            stats.pop(name, None)
            if name in stats_for:
                stats[name] = self._collect_file_stats(rel, stats_for[name])
        for name, df in (appends or {}).items():
            rel = self._gen_dir(name, v)
            df.write.parquet(f"{self.root}/{rel}")
            tables.setdefault(name, []).append(rel)
            schemas[name] = df.schema.json()
            if name in stats_for:
                stats.setdefault(name, {}).update(
                    self._collect_file_stats(rel, stats_for[name])
                )
        # drop stats for generation dirs an overwrite removed from the
        # snapshot (keys are rel FILE paths under a rel dir)
        for name in list(stats):
            live = tables.get(name, [])
            stats[name] = {
                f: s for f, s in stats[name].items()
                if any(f.startswith(d + "/") for d in live)
            }
            if not stats[name]:
                del stats[name]
        manifest = {
            "version": v,
            "parent": base_v or None,
            "tables": tables,
            "schemas": schemas,
            "meta": meta,
            **({"stats": stats} if stats else {}),
        }
        data = json.dumps(manifest, sort_keys=True).encode()
        tmp = f"{self._txn_dir()}/.tmp-{uuid.uuid4().hex}.json"
        _write_small_file(self.sess, tmp, data)
        if not _promote_manifest(self.sess, tmp, self._manifest_path(v)):
            raise ConcurrentCommitError(
                f"version {v} already committed under {self.root}"
            )
        return v

    # ---- changelog ----------------------------------------------
    def read_changes(
        self, table: str, since_version: int, to_version: int | None = None
    ) -> DataFrame:
        """CDC read: exactly the rows appended to ``table`` AFTER
        ``since_version``, up to ``to_version`` (default latest).
        Because appends only ever ADD generation dirs, the delta is
        the set difference of the two manifests' dir lists — an exact,
        metadata-only changelog with zero data scanned beyond the new
        rows themselves (the incremental-consumer pattern: feed only
        new ledger rows / new index entries downstream instead of
        re-reading a table that grows with the stream's lifetime).

        Raises ``ValueError`` if any commit in the range overwrote or
        compacted the table (its old dirs are then no longer part of
        the new snapshot, so "what changed" is no longer expressible
        as added files) — same contract as Delta/Iceberg CDC past a
        rewrite without a row-level changelog."""
        if to_version is None:
            to_version, to_m = self.latest()
        else:
            to_m = self._load(to_version)
            if to_m is None:
                raise FileNotFoundError(
                    f"no committed manifest v{to_version} under {self.root}"
                )
        if since_version == 0:
            old_dirs: list[str] = []
        else:
            since_m = self._load(since_version)
            if since_m is None:
                raise FileNotFoundError(
                    f"no committed manifest v{since_version} under {self.root}"
                )
            old_dirs = since_m["tables"].get(table, [])
        new_dirs = to_m["tables"].get(table, [])
        if not set(old_dirs) <= set(new_dirs):
            raise ValueError(
                f"table {table!r} was overwritten or compacted between "
                f"v{since_version} and v{to_version}; append-changelog is "
                "not expressible past a rewrite"
            )
        from pyspark.sql import types as T

        schema = None
        if table in to_m.get("schemas", {}):
            schema = T.StructType.fromJson(json.loads(to_m["schemas"][table]))
        added = [d for d in new_dirs if d not in set(old_dirs)]
        if not added:
            if schema is None:
                raise FileNotFoundError(
                    f"table {table!r} not in {self.root} log"
                )
            return self.sess.createDataFrame([], schema)
        reader = self.sess.read
        if schema is not None:
            reader = reader.schema(schema)
        return reader.parquet(*[f"{self.root}/{d}" for d in added])

    # ---- maintenance --------------------------------------------
    def _table_bytes(self, dirs: list[str]) -> int:
        total = 0
        for d in dirs:
            fs, p = _fs_and_path(self.sess, f"{self.root}/{d}")
            if fs.exists(p):
                total += fs.getContentSummary(p).getLength()
        return total

    def compact(
        self,
        table: str,
        target_file_bytes: int = 128 * 1024 * 1024,
        sort_by: list[str] | None = None,
        stats_for: list[str] | None = None,
        zorder_by: list[str] | None = None,
        zorder_bits: int = 8,
    ) -> int:
        """Rewrite ``table``'s generation dirs into ONE dir of evenly
        bin-packed files (~``target_file_bytes`` each), committed as an
        overwrite. This is the maintenance half of streaming appends:
        one micro-batch = one small dir, so a month of batches is tens
        of thousands of tiny files unless compacted.

        With ``sort_by``, the rewrite range-partitions on those
        columns and sorts within each file (Iceberg's sorted
        compaction / Delta Z-order's single-key case): files then
        carry disjoint key ranges, so parquet min/max footer stats let
        a key-predicate scan skip every non-matching file — the layout
        the band/variant index probes want. ``stats_for=[col, ...]``
        additionally records per-file min/max in the manifest
        (pair it with ``sort_by`` on the same key: disjoint per-file
        ranges make :meth:`read`'s ``prune`` select ~1 file per point
        lookup instead of opening every footer). Snapshot readers
        pinned to older versions are unaffected (old dirs are
        immutable until :meth:`vacuum`); ``read_changes`` across the
        compaction boundary raises by design. Returns the committed
        version.

        ``zorder_by=[c1, c2, ...]`` clusters on the Morton interleave
        of the columns' quantile-bucket ids instead of a linear sort
        (Delta OPTIMIZE ZORDER / Iceberg z-ordered rewrite): each
        statted column then has file-level locality SIMULTANEOUSLY,
        so a predicate on ANY of them — not just the leading sort key
        — prunes most files via the manifest stats. Mutually
        exclusive with ``sort_by``; ``stats_for`` defaults to the
        z-order columns. Same shuffle count as the sorted rewrite
        (the z-value is just a different range-partition key)."""
        if sort_by and zorder_by:
            raise ValueError("sort_by and zorder_by are mutually exclusive")
        _, m = self.latest()
        dirs = m["tables"].get(table)
        if not dirs:
            raise FileNotFoundError(f"table {table!r} not in {self.root} log")
        nbytes = self._table_bytes(dirs)
        nparts = max(1, -(-nbytes // max(1, target_file_bytes)))
        df = self.read(table)
        zdesc = None
        if zorder_by:
            from pyspark.sql import functions as F

            from .functions.zorder import zorder_key

            if stats_for is None:
                stats_for = list(zorder_by)
            z, zdesc = zorder_key(df, list(zorder_by), bits=zorder_bits)
            df = (
                df.withColumn("__z", z)
                .repartitionByRange(int(nparts), F.col("__z"))
                .sortWithinPartitions("__z")
                .drop("__z")
            )
        elif sort_by:
            from pyspark.sql import functions as F

            cols = [F.col(c) for c in sort_by]
            df = df.repartitionByRange(int(nparts), *cols).sortWithinPartitions(
                *cols
            )
        else:
            df = df.repartition(int(nparts))
        return self.commit(
            overwrites={table: df},
            meta={
                "compaction": {
                    "table": table,
                    "from_dirs": len(dirs),
                    **({"sort_by": list(sort_by)} if sort_by else {}),
                    **({"zorder": zdesc} if zdesc else {}),
                }
            },
            stats_for={table: stats_for} if stats_for else None,
        )


    def vacuum(
        self,
        retain: int = 2,
        inflight_grace_s: int = 3600,
        protect: set[int] | None = None,
    ) -> list[str]:
        """Delete generation dirs no retained manifest references and
        manifests older than the newest ``retain``. Dirs stamped with
        a version NEWER than the latest commit may belong to an
        IN-FLIGHT commit, so they are deleted only once their mtime is
        older than ``inflight_grace_s`` (a crashed commit's orphans
        age out; a live writer's staging dirs do not). Versions in
        ``protect`` are kept beyond the retention window (with their
        referenced dirs) — e.g. an incremental consumer's CDC cursor,
        whose manifest aging out would silently demote the consumer
        to full rescans. Returns the deleted paths."""
        vs = [v for v in self.versions() if self._load(v) is not None]
        if not vs:
            return []
        keep_vs = sorted(set(vs[-retain:]) | {
            v for v in (protect or set()) if v in vs
        })
        latest_v = vs[-1]
        referenced: set[str] = set()
        for v in keep_vs:
            m = self._load(v)
            if m:
                for dirs in m["tables"].values():
                    referenced.update(dirs)
        deleted: list[str] = []
        now_ms = self.sess._jvm.java.lang.System.currentTimeMillis()
        fs, dp = _fs_and_path(self.sess, self.root + "/_data")
        if fs.exists(dp):
            for tdir in fs.listStatus(dp):
                tname = tdir.getPath().getName()
                for gen in fs.listStatus(tdir.getPath()):
                    gname = gen.getPath().getName()
                    rel = f"_data/{tname}/{gname}"
                    if rel in referenced:
                        continue
                    try:
                        gen_v = int(gname.split("-")[1])
                    except (IndexError, ValueError):
                        gen_v = 0
                    aged = (
                        now_ms - gen.getModificationTime()
                        >= inflight_grace_s * 1000
                    )
                    if gen_v <= latest_v or aged:
                        hadoop_delete(self.sess, f"{self.root}/{rel}")
                        deleted.append(rel)
        for v in vs[:-retain] if retain else vs:
            if v not in keep_vs:
                hadoop_delete(self.sess, self._manifest_path(v))
                deleted.append(self._manifest_path(v))
        fs, tp = _fs_and_path(self.sess, self._txn_dir())
        if fs.exists(tp):
            for st in fs.listStatus(tp):
                name = st.getPath().getName()
                aged = (
                    now_ms - st.getModificationTime()
                    >= inflight_grace_s * 1000
                )
                if name.startswith(".tmp-") and aged:
                    hadoop_delete(self.sess, f"{self._txn_dir()}/{name}")
                    deleted.append(f"{self._txn_dir()}/{name}")
        return deleted


# sorted-compaction cluster keys for the engine's own streaming-append
# tables: the probe pattern is an equi-join on these columns, so
# range-partitioned sorted files turn each probe into a footer-stat
# file skip instead of a full scan
DEFAULT_SORT_KEYS: dict[str, list[str]] = {
    "vertex_bands": ["band", "bucket"],
    "vertex_variants": ["k"],
    "harvested_rels": ["rel"],
}


def maintain(
    log: TxnLog,
    max_dirs: int = 8,
    retain: int = 2,
    target_file_bytes: int = 128 * 1024 * 1024,
    sort_keys: dict[str, list[str]] | None = None,
    protect_cursors: bool = True,
    protect: set[int] | None = None,
) -> dict:
    """Routine log maintenance: compact every table whose generation-dir
    count exceeds ``max_dirs`` (streaming appends add one dir per
    micro-batch), then vacuum manifests/dirs beyond ``retain``
    versions. ``sort_keys`` (default :data:`DEFAULT_SORT_KEYS`) maps
    table → cluster columns for sorted compaction; keys naming columns
    the table doesn't carry are ignored.

    ``protect_cursors`` keeps alive the manifests incremental
    consumers resume from: for each distinct meta key, the NEWEST
    commit whose meta records a ``source_version`` (the cursor
    convention ``incremental_rerank_txn`` writes) protects that
    version from the vacuum — otherwise every maintenance pass would
    age the cursor out and silently demote the consumer to full
    rescans. The protection only sees cursors recorded in THIS log's
    metas; a consumer whose cursor into this log is recorded
    elsewhere (e.g. ``incremental_rerank_txn`` writes its
    ``totals_version`` cursor into the HARVEST log, because the
    totals log has its own single writer) must be named explicitly
    via ``protect`` — a set of versions to keep beyond retention —
    or it falls back to a safe-but-full rescan after its cursor
    manifest ages out (``jobs/run_incremental.py --maintain-totals``
    wires this). ``protect_cursors`` also keeps the newest commit
    whose meta carries a streaming ``batch_id``: with the sticky
    cursor in :meth:`TxnLog.commit` this is the latest manifest
    anyway, but pre-sticky logs still need it so the replay guard
    never loses the fold cursor. Safe to run any time the single
    writer is quiescent; snapshot readers of retained versions are
    unaffected. Returns ``{"compacted": [tables], "vacuumed":
    n_paths}``."""
    if sort_keys is None:
        sort_keys = DEFAULT_SORT_KEYS
    compacted = []
    for table, dirs in sorted(log.tables().items()):
        if len(dirs) > max_dirs:
            keys = sort_keys.get(table)
            if keys and not set(keys) <= set(log.read(table).columns):
                keys = None
            log.compact(
                table, target_file_bytes=target_file_bytes, sort_by=keys
            )
            compacted.append(table)
    protect = set(int(v) for v in (protect or ()))
    if protect_cursors:
        seen: set[str] = set()
        batch_cursor_seen = False
        for v in reversed(log.versions()):
            meta = log.commit_meta(v) or {}
            if not batch_cursor_seen and "batch_id" in meta:
                batch_cursor_seen = True
                protect.add(int(v))
            for key, val in meta.items():
                if (
                    key not in seen
                    and isinstance(val, dict)
                    and "source_version" in val
                ):
                    seen.add(key)
                    protect.add(int(val["source_version"]))
    vacuumed = log.vacuum(retain=retain, protect=protect)
    return {"compacted": compacted, "vacuumed": len(vacuumed)}


def is_txn_root(sess: SparkSession, root: str) -> bool:
    """True if ``root`` carries a commit log (used by readers that
    accept either a plain parquet layout or a TxnLog group)."""
    fs, p = _fs_and_path(sess, root.rstrip("/") + "/_txn")
    return fs.exists(p)
