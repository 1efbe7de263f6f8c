"""Engine-native table snapshots: append/overwrite commits, snapshot
listing, and time travel over plain parquet.

The reference's S11 capability is Iceberg snapshot metadata + time
travel (`SELECT * FROM t.snapshots`, rollback by snapshot id --
/root/reference/README.md:301,712). This sandbox has no
iceberg-spark-runtime jar (probe evidence: SCALING.md), so
``io.read_snapshots`` stays capability-gated; THIS module provides the
same contract engine-natively, with the standard log-structured table
format design (the mechanism Iceberg/Delta themselves use):

- Every commit writes its data files ONCE under an immutable,
  uuid-named directory ``<table>/data/<uuid>/`` -- files are never
  mutated or deleted by writers, so readers need no locks, and a lost
  commit race retries only the manifest publish, never the data write.
- A commit then publishes ONE manifest ``<table>/_snapshots/v<N>.json``
  naming the data-directory BASENAMES live at that snapshot (append =
  parent's list + the new dir; overwrite = just the new dir); names
  resolve against the caller's table_dir at read time, so tables can
  move and no path-spelling mismatch can fool the vacuum liveness
  check. The manifest is written complete to a temp file (fsync'd) and
  hard-LINKED to its final name: link() is an atomic exclusive create,
  so two racing writers cannot both publish version N (the loser
  retries at N+1 against the winner's state -- optimistic concurrency
  exactly as Delta's transaction log does it) and no reader can ever
  observe a partial manifest. On an object store, swap the link for a
  conditional PUT (if-none-match). Commit timestamps are clamped
  monotone over the parent so as-of-timestamp reads stay consistent
  under wall-clock steps.
- Reading snapshot N = ``spark.read.parquet(*live_dirs)``: plans,
  pushdown, and pruning are ordinary parquet scans; time travel by
  timestamp picks the newest manifest committed at or before the
  requested instant.

Scale shape: manifests are driver-side metadata (KBs; one tiny JSON
per commit -- the same driver-coordinated commit every table format
performs); data moves only through executor parquet writes. Every
``CHECKPOINT_EVERY`` commits the log folds into a compacted
checkpoint (Delta's ``_last_checkpoint`` idea), so loads parse ONE
checkpoint + the manifest tail instead of O(commits) files -- the
long-lived-CDC-table hot path; vacuum refolds after expiring history
so a checkpoint can never resurrect an expired snapshot. Not provided
(use the real Iceberg runtime in production):
file-level delete vectors, hidden partition transforms, and
multi-table transactions.
"""

from __future__ import annotations

import json
import os
import time
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


#: Fold the log into a compacted checkpoint file every this many
#: commits (Delta's _last_checkpoint idea): loads then parse ONE
#: checkpoint + the tail of newer manifests instead of every manifest
#: ever committed -- a long-lived CDC table commits once per
#: micro-batch, so an O(commits) load would grow linearly with table
#: age on the hottest path.
CHECKPOINT_EVERY = 20


def _manifest_dir(table_dir: str) -> str:
    return os.path.join(table_dir, "_snapshots")


def _manifest_path(table_dir: str, version: int) -> str:
    return os.path.join(_manifest_dir(table_dir), f"v{version:08d}.json")


def _checkpoint_path(table_dir: str, version: int) -> str:
    return os.path.join(_manifest_dir(table_dir), f"c{version:08d}.json")


def _norm_dirs(m: dict) -> dict:
    # Legacy manifests (pre-basename format) stored full or relative
    # dir PATHS; normalize to basenames on load so reads resolve
    # correctly and vacuum's liveness set can never
    # string-compare-miss a live dir and delete it.
    m["dirs"] = [os.path.basename(d.rstrip("/")) for d in m["dirs"]]
    return m


def _load_manifests(table_dir: str) -> list[dict]:
    """All manifests, version-ascending, parsing O(tail): the newest
    readable checkpoint supplies every manifest at or below its
    version in one JSON parse; only newer v<N>.json files are parsed
    individually. A torn/corrupt checkpoint falls back to the next
    older one, then to a full parse -- checkpoints are an index, never
    the source of truth. (The directory listing itself stays
    O(commits) names until a vacuum expires history; names are cheap,
    parses were the cost.)"""
    mdir = _manifest_dir(table_dir)
    if not os.path.isdir(mdir):
        return []
    names = os.listdir(mdir)
    base: list[dict] = []
    base_version = -1
    for cname in sorted(
        (n for n in names if n.startswith("c") and n.endswith(".json")),
        reverse=True,
    ):
        try:
            with open(os.path.join(mdir, cname)) as f:
                cp = json.load(f)
            base = [_norm_dirs(dict(m)) for m in cp["manifests"]]
            base_version = int(cp["version"])
            break
        except (OSError, ValueError, KeyError):
            base, base_version = [], -1
    out = list(base)
    for name in sorted(names):
        if not (name.startswith("v") and name.endswith(".json")):
            continue
        try:
            file_version = int(name[1:-5])
        except ValueError:
            file_version = None  # unexpected spelling: parse and check
        if file_version is not None and file_version <= base_version:
            continue  # already folded into the checkpoint
        with open(os.path.join(mdir, name)) as f:
            m = json.load(f)
        if m["version"] <= base_version:
            continue
        out.append(_norm_dirs(m))
    return out


def _write_checkpoint(
    table_dir: str, version: int, manifests: list[dict] | None = None
) -> bool:
    """Fold every manifest at or below ``version`` into c<version>.json
    (atomic tmp + replace; the .tmp- prefix keeps crash leftovers
    inside the vacuum sweep). Best-effort by contract: the commit that
    triggered it is already durable, so a failed checkpoint write must
    never fail the commit -- the next multiple just tries again. Keeps
    the previous checkpoint as a fallback for a corrupt newest; older
    ones are swept. Returns True iff the fold durably replaced
    c<version>.json -- vacuum's expiry rebuild keys its stale-checkpoint
    sweep exemption on this (a swallowed failure there must NOT leave a
    same-named pre-existing checkpoint in place, since that stale file
    folds just-expired manifests and would resurrect them on reload).

    ``manifests`` lets a caller that already HOLDS the authoritative
    list (vacuum's expiry rebuild, which deletes every checkpoint
    before refolding) bypass the on-disk reload: after a prune_folded
    pass the v-files alone no longer spell the full history, so a
    checkpoint-less reload there would silently forget pruned-but-live
    versions."""
    if manifests is None:
        manifests = [
            m for m in _load_manifests(table_dir) if m["version"] <= version
        ]
    else:
        manifests = [m for m in manifests if m["version"] <= version]
    mdir = _manifest_dir(table_dir)
    tmp = os.path.join(mdir, f".tmp-{uuid.uuid4().hex}")
    try:
        with open(tmp, "w") as f:
            json.dump({"version": version, "manifests": manifests}, f)
            f.flush()
            os.fsync(f.fileno())
        os.replace(tmp, _checkpoint_path(table_dir, version))
    except (OSError, ValueError, KeyError):
        # ValueError/KeyError: _load_manifests hit a corrupt or
        # schema-less v-file while folding -- the triggering commit is
        # already durably linked, so checkpointing must swallow it too
        # (the checkpoint is an index, never the source of truth)
        try:
            os.remove(tmp)
        except FileNotFoundError:
            pass
        return False
    # c<version>.json is durable from here: True no matter what the
    # sweep of superseded checkpoints does below. Returning False for
    # a failed sweep made vacuum's degraded path delete the GOOD
    # checkpoint it had just written (and skip its reload), durably
    # forgetting pruned-folded survivor versions.
    try:
        cpoints = sorted(
            n
            for n in os.listdir(mdir)
            if n.startswith("c") and n.endswith(".json")
        )
        for name in cpoints[:-2]:
            os.remove(os.path.join(mdir, name))
    except OSError:
        pass  # stale checkpoints are re-swept by the next fold
    return True


def _live_paths(table_dir: str, manifest: dict) -> list[str]:
    """Manifests record data-directory BASENAMES (never absolute
    paths): resolved against the caller's table_dir at use time, so a
    table can be moved/renamed, and equivalent-but-different spellings
    of table_dir ('tbl' vs './tbl' vs an absolute path) can never make
    a liveness comparison miss -- a string-compare miss in vacuum would
    delete live data."""
    root = os.path.join(table_dir, "data")
    return [os.path.join(root, d) for d in manifest["dirs"]]


def _publish(table_dir: str, version: int, manifest: dict) -> bool:
    """Atomically publish a manifest: write the full JSON to a hidden
    temp name, fsync, then hard-link to the final name -- link() is an
    atomic exclusive create, so readers can never observe an empty or
    truncated v<N>.json (open('x') + dump would expose one between the
    create and the write, and a writer dying mid-dump would brick every
    subsequent load). Returns False if another writer won the version.

    A ``snapshot_vacuum`` racing outside its documented no-commit-in-
    flight contract can sweep the temp file between the write and the
    link; rather than crash the commit, the FileNotFoundError retries
    the temp write under a fresh uuid (the sweep is also age-gated, so
    a single retry suffices in practice -- the loop is belt-and-braces)."""
    for _ in range(3):
        tmp = os.path.join(
            _manifest_dir(table_dir), f".tmp-{uuid.uuid4().hex}"
        )
        with open(tmp, "w") as f:
            json.dump(manifest, f)
            f.flush()
            os.fsync(f.fileno())
        try:
            os.link(tmp, _manifest_path(table_dir, version))
            if version > 0 and version % CHECKPOINT_EVERY == 0:
                # only the unique winner of version N reaches this, so
                # c<N>.json has exactly one writer
                _write_checkpoint(table_dir, version)
            return True
        except FileExistsError:
            return False
        except FileNotFoundError:
            continue  # a racing vacuum swept tmp: rewrite and relink
        finally:
            try:
                os.remove(tmp)
            except FileNotFoundError:
                pass
    raise OSError(
        f"could not publish manifest v{version}: temp manifests kept "
        "disappearing (a vacuum is racing this commit)"
    )


def _next_ts(manifests: list[dict]) -> int:
    """Commit timestamp, clamped MONOTONE over the parent's: a wall
    clock stepped backwards (NTP) must not let as-of-timestamp reads
    pick a snapshot whose content postdates the requested instant --
    the same invariant Delta/Iceberg enforce."""
    now = time.time_ns()
    return max(now, manifests[-1]["committed_at_ns"] + 1) if manifests else now


class SnapshotConflictError(RuntimeError):
    """A read-modify-write commit (merge) found the table advanced past
    the snapshot it was derived from -- retrying the manifest alone
    would silently erase the concurrent commit's rows, so the whole
    operation must be re-run against the new state (Delta raises
    ConcurrentAppendException for the same situation)."""


def _commit(
    table_dir: str,
    df: DataFrame,
    operation: str,
    expected_parent: int | None = None,
) -> int:
    """Write data ONCE, then publish the next manifest with optimistic
    concurrency. Only the (tiny) manifest publish retries on a lost
    race -- re-running the parquet write per conflict would pay the
    dominant cost N times and orphan N directories; the data dir's name
    is a bare uuid precisely so it is version-independent.

    ``expected_parent`` guards read-modify-write commits: when set, the
    publish only proceeds while the latest version still equals it --
    content derived from snapshot N must not land on top of an unseen
    N+1 (lost update). Blind appends/overwrites pass None: their
    content is base-independent, so retrying at N+1 is always sound.
    On conflict the just-written data dir is left as an orphan for
    ``snapshot_vacuum`` -- never half-referenced."""
    data_root = os.path.join(table_dir, "data")
    os.makedirs(data_root, exist_ok=True)
    os.makedirs(_manifest_dir(table_dir), exist_ok=True)
    new_name = uuid.uuid4().hex
    df.write.mode("overwrite").parquet(os.path.join(data_root, new_name))
    while True:
        manifests = _load_manifests(table_dir)
        version = manifests[-1]["version"] + 1 if manifests else 0
        if expected_parent is not None and version != expected_parent + 1:
            raise SnapshotConflictError(
                f"table at {table_dir} advanced to v{version - 1} while "
                f"a {operation} was computed against v{expected_parent}; "
                "re-run the operation against the current snapshot"
            )
        if operation == "append" and manifests:
            dirs = manifests[-1]["dirs"] + [new_name]
        else:
            dirs = [new_name]
        manifest = {
            "version": version,
            "parent": manifests[-1]["version"] if manifests else None,
            "operation": operation,
            "committed_at_ns": _next_ts(manifests),
            "dirs": dirs,
        }
        if _publish(table_dir, version, manifest):
            return version
        # another writer won version N; retry the manifest only


def snapshot_append(df: DataFrame, table_dir: str) -> int:
    """Commit ``df`` as an APPEND snapshot; returns the new version.
    (No session parameter: commits are the frame's own write plus
    driver-side manifest metadata -- ``df`` carries its session.)"""
    return _commit(table_dir, df, "append")


def snapshot_overwrite(df: DataFrame, table_dir: str) -> int:
    """Commit ``df`` as a full-replace snapshot; returns the version."""
    return _commit(table_dir, df, "overwrite")


def snapshot_rollback(table_dir: str, version: int) -> int:
    """Roll the table back to ``version`` AS A NEW COMMIT (Iceberg's
    rollback semantics): history is never rewritten -- a manifest with
    operation='rollback' republishes the old snapshot's directory list,
    so the bad snapshots stay inspectable and the rollback itself is
    time-travelable."""
    manifests = _load_manifests(table_dir)
    target = next((m for m in manifests if m["version"] == version), None)
    if target is None:
        raise ValueError(f"no snapshot version {version} at {table_dir}")
    while True:
        manifests = _load_manifests(table_dir)
        new_version = manifests[-1]["version"] + 1
        manifest = {
            "version": new_version,
            "parent": manifests[-1]["version"],
            "operation": "rollback",
            "committed_at_ns": _next_ts(manifests),
            "dirs": target["dirs"],
        }
        if _publish(table_dir, new_version, manifest):
            return new_version


def snapshot_vacuum(
    table_dir: str,
    keep_versions: int | None = None,
    tmp_grace_s: float = 3600.0,
    prune_folded: bool = False,
) -> list[str]:
    """Delete data directories no manifest references (orphans from
    lost commit races) and, when ``keep_versions`` is given, expire all
    but the newest N manifests first (their exclusively-held dirs
    become orphans and are swept in the same pass). Returns the deleted
    directory paths.

    The maintenance counterpart of optimistic commits: losers leave
    unreferenced data dirs behind by design (see ``_commit``); readers
    never see them, so the sweep is safe whenever no commit is
    IN FLIGHT -- run it from the single maintenance owner, exactly like
    Iceberg's expire_snapshots/remove_orphan_files pair. History that
    survives ``keep_versions`` remains fully time-travelable.

    ``prune_folded=True`` additionally deletes v-manifest files already
    folded into the SECOND-newest checkpoint: ``_load_manifests``
    parses O(tail), but the directory LISTING stays O(commits) names
    until the folded files go -- on a long-lived CDC table (one commit
    per micro-batch) the listing itself becomes the hot-path cost.
    The bound is the second-newest checkpoint, not the newest, so the
    corrupt-newest fallback keeps working: a torn ``c<N>`` degrades to
    the older checkpoint plus the still-present v-files above it, and
    every folded version stays time-travelable through the checkpoint.
    The trade, stated honestly: after a prune the checkpoints ARE the
    durable spelling of folded history -- losing BOTH retained
    checkpoints at once (the full-parse fallback) would forget the
    pruned versions. Iceberg/Delta make the same call when expiring
    metadata behind their checkpoint files.
    """
    import shutil

    if keep_versions is not None and keep_versions < 1:
        # keep_versions=0 would expire EVERY manifest (current snapshot
        # included) and the sweep would then delete the whole table
        raise ValueError("keep_versions must be >= 1")
    manifests = _load_manifests(table_dir)
    if keep_versions is not None and len(manifests) > keep_versions:
        for m in manifests[: len(manifests) - keep_versions]:
            try:
                os.remove(_manifest_path(table_dir, m["version"]))
            except FileNotFoundError:
                pass  # folded into a checkpoint; no standalone file
        manifests = manifests[len(manifests) - keep_versions :]
        # checkpoints FOLD the expired manifests; left in place they
        # would resurrect them on the next load (and their data dirs
        # are about to be swept). Rebuild under the vacuum's exclusive
        # no-commit-in-flight contract: drop every checkpoint, then
        # re-fold the surviving history.
        # Refold from the in-memory survivors, NOT a reload (after a
        # prune_folded pass the v-files alone no longer spell versions
        # the expiry kept), and write the NEW checkpoint BEFORE removing
        # the stale ones -- no window with zero checkpoints on disk. If
        # the write failed, a checkpoint-less log must still spell
        # EVERY survivor: re-materialize the v-files prune_folded
        # removed before sweeping any checkpoint, and if even that
        # fails, abort the expiry with checkpoints intact -- the
        # expired versions resurrect on the next load (a no-op expiry
        # the caller can retry), which beats durably forgetting
        # survivors whose data dirs the sweep below would then orphan
        # and delete. Sweeping ALL checkpoints in the failure path
        # (not exempting keep_name) stays required: a pre-existing
        # c<keep_ver> from a regular CHECKPOINT_EVERY fold spells the
        # same name but folds the just-expired manifests.
        keep_ver = int(manifests[-1]["version"])
        wrote = _write_checkpoint(table_dir, keep_ver, manifests=manifests)
        keep_name = f"c{keep_ver:08d}.json" if wrote else None
        if not wrote:
            try:
                for m in manifests:
                    vpath = _manifest_path(table_dir, m["version"])
                    if os.path.exists(vpath):
                        continue
                    tmp = os.path.join(
                        _manifest_dir(table_dir),
                        f".tmp-{uuid.uuid4().hex}",
                    )
                    with open(tmp, "w") as f:
                        json.dump(m, f)
                        f.flush()
                        os.fsync(f.fileno())
                    os.replace(tmp, vpath)
            except OSError as ex:
                raise RuntimeError(
                    "snapshot_vacuum could not rebuild the log after a "
                    "failed checkpoint write; expiry aborted with "
                    "checkpoints (and all history) intact -- re-run "
                    "vacuum once the store accepts writes"
                ) from ex
        cdir = _manifest_dir(table_dir)
        if os.path.isdir(cdir):
            for name in sorted(os.listdir(cdir)):
                if (
                    name.startswith("c")
                    and name.endswith(".json")
                    and name != keep_name
                ):
                    os.remove(os.path.join(cdir, name))
        if wrote:
            manifests = _load_manifests(table_dir)
    # liveness compares BASENAMES (what manifests store), immune to
    # table_dir spelling differences
    live = {d for m in manifests for d in m["dirs"]}
    data_root = os.path.join(table_dir, "data")
    removed = []
    if os.path.isdir(data_root):
        for name in sorted(os.listdir(data_root)):
            if name not in live:
                path = os.path.join(data_root, name)
                shutil.rmtree(path)
                removed.append(path)
    # A writer killed between the temp write and os.link leaks a
    # .tmp-<uuid> manifest forever (its finally never ran); no live
    # commit ever references a temp name, so sweeping them is safe.
    # The sweep is AGE-GATED (mtime older than tmp_grace_s): a vacuum
    # run outside the documented no-commit-in-flight contract must not
    # yank the temp file out from under an in-flight _publish (which
    # would also retry, but the gate keeps the common case race-free --
    # no live commit holds a temp file for an hour).
    mdir = _manifest_dir(table_dir)
    if os.path.isdir(mdir):
        cutoff = time.time() - tmp_grace_s
        for name in sorted(os.listdir(mdir)):
            if name.startswith(".tmp-"):
                path = os.path.join(mdir, name)
                try:
                    if os.path.getmtime(path) <= cutoff:
                        os.remove(path)
                        removed.append(path)
                except FileNotFoundError:
                    pass  # the owning writer's finally beat us to it
    if prune_folded and os.path.isdir(mdir):
        # v-files at or below the SECOND-newest checkpoint are doubly
        # folded (present in both retained checkpoints); deleting them
        # bounds the listing at ~CHECKPOINT_EVERY + 2 names without
        # weakening the corrupt-newest-checkpoint fallback. With fewer
        # than two checkpoints there is no doubly-covered range: prune
        # nothing (the full-parse fallback still needs every v-file).
        cvers = sorted(
            int(n[1:-5])
            for n in os.listdir(mdir)
            if n.startswith("c") and n.endswith(".json") and n[1:-5].isdigit()
        )
        if len(cvers) >= 2:
            bound = cvers[-2]
            for name in sorted(os.listdir(mdir)):
                if not (name.startswith("v") and name.endswith(".json")):
                    continue
                try:
                    ver = int(name[1:-5])
                except ValueError:
                    continue  # unexpected spelling: never prune it
                if ver <= bound:
                    path = os.path.join(mdir, name)
                    os.remove(path)
                    removed.append(path)
    return removed


def snapshot_exists(table_dir: str) -> bool:
    """True when at least one manifest is PUBLISHED. Callers must use
    this -- not the existence of the ``_snapshots`` directory -- to
    decide bootstrap-vs-merge: ``_commit`` creates the directory before
    the (slow) data write, so a writer crashing mid-first-commit leaves
    the directory present with zero manifests. A name check only (no
    JSON parse): per-micro-batch callers must not pay O(commits) log
    parsing for a bool."""
    mdir = _manifest_dir(table_dir)
    if not os.path.isdir(mdir):
        return False
    return any(
        n.startswith("v") and n.endswith(".json") for n in os.listdir(mdir)
    )


def snapshot_versions(spark: SparkSession, table_dir: str) -> DataFrame:
    """The `.snapshots` metadata scan: one row per committed snapshot
    (version, parent, operation, committed_at, n_dirs)."""
    rows = [
        (
            m["version"],
            m["parent"],
            m["operation"],
            m["committed_at_ns"],
            len(m["dirs"]),
        )
        for m in _load_manifests(table_dir)
    ]
    return spark.createDataFrame(
        rows,
        "version int, parent int, operation string, "
        "committed_at_ns long, n_dirs int",
    )


def snapshot_read(
    spark: SparkSession,
    table_dir: str,
    version: int | None = None,
    as_of_ns: int | None = None,
    merge_schema: bool = False,
) -> DataFrame:
    """Read the table at a snapshot: latest by default, an explicit
    ``version``, or time travel to the newest snapshot committed at or
    before ``as_of_ns``. Plain parquet scans of the live directories --
    pushdown/pruning behave exactly as any other read. Pass
    ``merge_schema=True`` when appends evolved the schema across
    commits (columns added later read as NULL for older directories --
    the same union-by-name posture as ``io.read_evolving``)."""
    manifests = _load_manifests(table_dir)
    if not manifests:
        raise ValueError(f"no snapshots at {table_dir}")
    if version is not None and as_of_ns is not None:
        raise ValueError("pass version OR as_of_ns, not both")
    if version is not None:
        picked = next(
            (m for m in manifests if m["version"] == version), None
        )
        if picked is None:
            raise ValueError(f"no snapshot version {version} at {table_dir}")
    elif as_of_ns is not None:
        eligible = [
            m for m in manifests if m["committed_at_ns"] <= as_of_ns
        ]
        if not eligible:
            raise ValueError(
                f"no snapshot at or before {as_of_ns} at {table_dir}"
            )
        picked = eligible[-1]
    else:
        picked = manifests[-1]
    reader = spark.read
    if merge_schema:
        reader = reader.option("mergeSchema", "true")
    return reader.parquet(*_live_paths(table_dir, picked))


def snapshot_merge(
    updates: DataFrame,
    table_dir: str,
    key_col: str,
    delete_col: str | None = None,
) -> int:
    """MERGE INTO over the snapshot layer: upsert ``updates`` by
    ``key_col`` -- matched target rows are replaced, unmatched update
    rows are inserted, and (when ``delete_col`` names a boolean column)
    update rows flagged true DELETE their target match instead. One
    commit; the pre-merge state stays time-travelable, which is the
    lakehouse MERGE contract (Iceberg/Delta) this layer mirrors.

    Plan shape: the target's live files are read once, survivors come
    from one ``left_anti`` join against the (pruned) update keys --
    16-byte-key shuffle, never a row-by-row lookup -- and the union
    with the inserts lands as an overwrite commit. NULL-key and
    duplicate-key update rows are rejected in ONE aggregate pass: a
    NULL never matches in the anti-join so each replay would re-insert
    it (the same idempotency rule as
    ``plans.incremental.incremental_dedup_append``), and two source
    rows for one key would both insert -- the "multiple source rows
    matched" error every lakehouse MERGE raises. The target is read
    with mergeSchema so columns added by later appends survive the
    rewrite (the union is by name with missing columns NULL-filled on
    either side). Merge is read-modify-write: the commit pins the base
    version and raises ``SnapshotConflictError`` if the table advanced
    underneath -- silently republishing would erase the concurrent
    commit's rows. At real scale the rewrite cost is the whole table;
    partition the table (one snapshot table per partition) or use real
    Iceberg merge-on-read where update/table ratios are tiny.
    """
    spark = updates.sparkSession
    key_stats = updates.agg(
        F.count(F.lit(1)).alias("n"),
        F.count(key_col).alias("n_nonnull"),
        F.countDistinct(key_col).alias("n_keys"),
    ).first()
    if key_stats["n"] != key_stats["n_nonnull"]:
        raise ValueError(f"NULL {key_col} in updates: not mergeable")
    if key_stats["n_keys"] != key_stats["n_nonnull"]:
        raise ValueError(
            f"duplicate {key_col} in updates: multiple source rows "
            "would match one target row (ambiguous MERGE)"
        )
    if delete_col is not None:
        dtype = updates.schema[delete_col].dataType.simpleString()
        if dtype != "boolean":
            # A lossy cast ('yes' -> NULL) would silently turn an
            # intended update into a delete: the row drops out of
            # incoming while its key still anti-joins the target away.
            raise TypeError(
                f"delete_col {delete_col} must be boolean, got {dtype}"
            )
    manifests = _load_manifests(table_dir)
    if not manifests:
        raise ValueError(f"no snapshots at {table_dir}")
    base_version = manifests[-1]["version"]
    current = snapshot_read(spark, table_dir, merge_schema=True)
    survivors = current.join(
        updates.select(key_col).distinct(), key_col, "left_anti"
    )
    incoming = updates
    if delete_col is not None:
        incoming = updates.where(
            F.coalesce(~F.col(delete_col), F.lit(True))
        ).drop(delete_col)
    merged = survivors.unionByName(incoming, allowMissingColumns=True)
    return _commit(table_dir, merged, "merge", expected_parent=base_version)

