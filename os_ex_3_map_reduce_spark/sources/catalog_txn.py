"""Multi-table ATOMIC transactions — a catalog commit log over
versioned tables.

Single-table lakehouse commits are atomic (versioned.py's manifest
rename), but a pipeline that appends an order batch AND its line
items needs both tables to flip TOGETHER: a reader who sees the new
orders but not their lineitems observes a foreign-key violation that
never existed. The published answer (the Nessie / Iceberg-REST
multi-table transaction model) lifts the same
stage-then-atomically-publish mechanics one level up:

- a CATALOG is a directory of commit manifests ``_catalog/v{N}.json``,
  each mapping table name → (table path, pinned table version);
- a transaction first publishes its per-table commits (those versions
  exist but are UNREFERENCED — exactly like staged data files before
  a manifest publish), then publishes ONE catalog manifest via
  temp-file + ``os.link`` (atomic AND no-clobber; see
  ``versioned._publish_exclusive``): the point at which every table's
  new version becomes visible at once;
- catalog readers resolve a table through the pinned version
  (``vt_read(path, version=...)``), never through the table's own
  HEAD — so a crash between per-table commits and the catalog commit
  leaves the catalog state bit-identical (the torn write is invisible;
  the orphaned table version is vacuum fodder, the same lifecycle as
  orphaned data files).

Concurrency inherits versioned.py's optimistic rule: the catalog
commit refuses to clobber an existing version; the loser rebases —
re-pins its transaction on the winner's catalog version — and
retries. At 100 TB a catalog commit is one small JSON rename
regardless of how many tables or bytes the transaction touched.
"""

from __future__ import annotations

import glob
import json
import os

from pyspark.sql import DataFrame, SparkSession

from .versioned import _publish_exclusive, vt_append, vt_read

_CAT = "_catalog"


def _cat_file(cat_path: str, version: int) -> str:
    return os.path.join(cat_path, _CAT, f"v{version}.json")


def ct_versions(cat_path: str) -> list[int]:
    return sorted(
        int(os.path.basename(p)[1:-5])
        for p in glob.glob(os.path.join(cat_path, _CAT, "v*.json"))
    )


def ct_current(cat_path: str) -> int | None:
    vs = ct_versions(cat_path)
    return vs[-1] if vs else None


def _ct_commit(cat_path: str, version: int, manifest: dict) -> None:
    """Publish one catalog manifest via the shared atomic no-clobber
    primitive (``os.link``, not rename — rename would silently replace
    a racing committer's manifest; ``versioned._publish_exclusive``
    documents the full analysis). Exactly one racer per catalog
    version wins; the loser rebases and retries."""
    _publish_exclusive(
        _cat_file(cat_path, version),
        manifest,
        f"catalog version {version} already committed — rebase and retry",
    )


def _ct_manifest(cat_path: str, version: int) -> dict:
    with open(_cat_file(cat_path, version)) as fh:
        return json.load(fh)


def ct_init(cat_path: str, tables: dict[str, tuple[str, int]]) -> int:
    """Create the catalog at version 0 pinning ``tables`` =
    {name: (table_path, table_version)}."""
    if ct_current(cat_path) is not None:
        raise FileExistsError(f"catalog already exists at {cat_path}")
    _ct_commit(
        cat_path,
        0,
        {
            "version": 0,
            "parent": None,
            "tables": {
                n: {"path": p, "version": v} for n, (p, v) in tables.items()
            },
        },
    )
    return 0


def ct_has_tag(cat_path: str, tag: str) -> bool:
    """True iff some catalog commit carries ``tag`` — the multi-table
    idempotency probe (the vt_has_tag contract one level up): a
    streaming sink checks the tag BEFORE re-running a replayed batch,
    so exactly-once holds across BOTH tables at once."""
    return any(
        _ct_manifest(cat_path, v).get("tag") == tag
        for v in ct_versions(cat_path)
    )


def ct_txn(
    cat_path: str, appends: dict[str, DataFrame], tag: str | None = None
) -> int:
    """Atomically append a batch to EVERY named table: per-table
    commits publish first (unreferenced until the catalog flips),
    then one catalog manifest rename makes all of them visible
    together. ``tag`` (stored in the catalog manifest) makes the
    transaction idempotent via :func:`ct_has_tag`. A crash BETWEEN
    the per-table commits and the catalog commit leaves orphan table
    versions (vacuum fodder) but a bit-identical catalog state — the
    retry simply publishes fresh table versions and commits; the
    orphans are never referenced. Returns the new catalog version."""
    cur = ct_current(cat_path)
    if cur is None:
        raise FileNotFoundError(f"no catalog at {cat_path}")
    man = _ct_manifest(cat_path, cur)
    tables = {n: dict(t) for n, t in man["tables"].items()}
    for name in appends:
        if name not in tables:
            raise KeyError(f"table {name!r} not in catalog")
    # Per-table appends are INDEPENDENT jobs on disjoint table roots
    # (each publishes its own table manifest; nothing is visible until
    # the single catalog commit below), so overlap them from a small
    # thread pool (guide §2.6: actions are only sequential because the
    # driver calls them sequentially) — the second table's scan/stage
    # back-fills executors freed by the first's write tail. Atomicity
    # is untouched: a failure in ANY append aborts before the catalog
    # flip, leaving orphan table versions exactly as the sequential
    # crash story documents. SPARK_GRAFT_TXN_SERIAL=1 restores the
    # sequential loop (A/B switch).
    import os as _os

    if len(appends) > 1 and not _os.environ.get("SPARK_GRAFT_TXN_SERIAL"):
        from concurrent.futures import ThreadPoolExecutor

        with ThreadPoolExecutor(max_workers=min(len(appends), 4)) as pool:
            futs = {
                name: pool.submit(vt_append, df, tables[name]["path"])
                for name, df in appends.items()
            }
            for name, fut in futs.items():
                tables[name]["version"] = fut.result()
    else:
        for name, df in appends.items():
            tables[name]["version"] = vt_append(df, tables[name]["path"])
    new_v = cur + 1
    manifest = {"version": new_v, "parent": cur, "tables": tables}
    if tag is not None:
        manifest["tag"] = tag
    _ct_commit(cat_path, new_v, manifest)
    return new_v


def ct_table_version(
    cat_path: str, name: str, version: int | None = None
) -> tuple[str, int]:
    """The (table path, table version) pair the catalog pins for
    ``name`` at catalog ``version`` (HEAD by default) — the structural
    view a reader resolves through. Two catalog versions whose pins
    are equal are bit-identical views by construction (manifests are
    immutable), so pin equality substitutes for re-reading the data
    when proving a torn write stayed invisible."""
    v = ct_current(cat_path) if version is None else version
    t = _ct_manifest(cat_path, v)["tables"][name]
    return t["path"], t["version"]


def ct_read(
    spark: SparkSession,
    cat_path: str,
    name: str,
    version: int | None = None,
) -> DataFrame:
    """Read ``name`` at the version the catalog pins (HEAD catalog
    version by default) — never the table's own head, which may hold
    torn (uncommitted-at-catalog-level) appends."""
    v = ct_current(cat_path) if version is None else version
    t = _ct_manifest(cat_path, v)["tables"][name]
    return vt_read(spark, t["path"], version=t["version"])


def ct_count(
    spark: SparkSession,
    cat_path: str,
    name: str,
    version: int | None = None,
) -> int:
    """Exact row count of ``name`` at the catalog-pinned version,
    served from parquet footer metadata when the snapshot is
    delete-free (see :func:`..versioned.vt_count`) — a catalog audit
    that counts its tables stops paying a cluster scan per count."""
    from .versioned import vt_count

    path, tv = ct_table_version(cat_path, name, version)
    return vt_count(spark, path, version=tv)


def ct_fk_uncovered(
    spark: SparkSession,
    cat_path: str,
    child: str,
    parent: str,
    child_key: str,
    parent_key: str,
) -> int:
    """Audit the FK invariant over the catalog's WHOLE history in ONE
    pass: the count of (child key, catalog version) pairs whose parent
    key had not arrived by that version — 0 iff ``child_key ⊆
    parent_key`` held at EVERY catalog version.

    Valid for APPEND-ONLY histories (the streaming-ingest shape): a
    child row visible at version v entered at some u <= v, and parents
    only grow, so "orphaned at some version" is EXACTLY "the parent
    key arrives strictly later than the child's entry version, or
    never". That equivalence lets the audit read each data file ONCE
    (the v0 base plus each version's manifest-diff delta via
    vt_changes) instead of re-reading every snapshot per version —
    at 100 TB the difference between an O(data) audit and an
    O(data x versions) one."""
    from pyspark.sql import functions as F

    from .versioned import vt_changes

    n_versions = ct_current(cat_path) + 1

    def keys_by_version(name: str, key: str) -> DataFrame:
        path, prev_tv = ct_table_version(cat_path, name, 0)
        out = (
            ct_read(spark, cat_path, name, version=0)
            .select(F.col(key).alias("k"))
            .withColumn("v", F.lit(0))
        )
        for v in range(1, n_versions):
            _, tv = ct_table_version(cat_path, name, v)
            if tv != prev_tv:
                out = out.unionByName(
                    vt_changes(spark, path, prev_tv, tv)
                    .where(F.col("_change_type") == "insert")
                    .select(F.col(key).alias("k"))
                    .withColumn("v", F.lit(v))
                )
            prev_tv = tv
        return out

    p_first = (
        keys_by_version(parent, parent_key)
        .groupBy("k")
        .agg(F.min("v").alias("vp"))
    )
    c_vers = (
        keys_by_version(child, child_key)
        .select("k", F.col("v").alias("vc"))
        .distinct()
    )
    return (
        c_vers.join(p_first, "k", "left")
        .where(F.col("vp").isNull() | (F.col("vp") > F.col("vc")))
        .count()
    )
