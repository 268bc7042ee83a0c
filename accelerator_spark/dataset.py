"""Dataset: a Parquet directory + JSON manifest.

The reference's dataset is a pickled metadata dict + one gzip file per
(column, slice), hash- or roundrobin-sliced, chained via ``previous``
(/root/reference/accelerator/dataset.py:55-88, 428-441, 1321-1386).

Our mapping (SURVEY.md §1):
- column files / slices   -> Parquet (columnar, splittable); Spark tasks
                             replace the fixed slice count.
- hashlabel               -> ``repartition(n, col)`` before write, recorded
                             in the manifest so downstream steps know the
                             co-partitioning contract.
- previous / chain        -> ``previous`` pointer in the manifest;
                             ``chain()`` resolves it, ``chain_df()`` is the
                             union-of-chain read (SURVEY §2.5).
- per-column min/max      -> computed in the SAME Spark job as the write
                             (one extra agg) and stored in the manifest;
                             Parquet row-group stats additionally give
                             zone-map skipping for free at scan time.
- lines per slice         -> total row count (partition counts are Spark's
                             business; order is preserved by an explicit
                             ``lineno`` column when callers need it,
                             SURVEY §7.4).

At 100 TB: a Dataset is just a directory of Parquet files — reads are
distributed scans with predicate pushdown and column pruning; nothing here
ever collects data to the driver (min/max is a 1-row agg).
"""

from __future__ import annotations

import json
import os
import re
import time
import uuid
from dataclasses import dataclass, field
from typing import Any, Iterator

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .identifiers import qcol as _qcol

MANIFEST_NAME = "dataset.json"
LINENO = "lineno"  # conventional ingest-order column (SURVEY §7.4)

# columns whose min/max we track (matches the reference tracking everything
# orderable — accelerator/dataset.py:875-897)
_MINMAX_TYPES = {
    "tinyint", "smallint", "int", "bigint", "float", "double",
    "date", "timestamp", "string", "boolean",
}


def _json_safe(v: Any) -> Any:
    if hasattr(v, "isoformat"):
        return v.isoformat()
    if isinstance(v, bytes):
        return v.hex()
    if isinstance(v, float) and (v != v):  # NaN
        return "NaN"
    return v


# Chain-resolution cache (reference checkpoints chain metadata every 64
# links — accelerator/dataset.py:955-961 — so resolving a years-long
# chain is O(1)-ish). ``chain_cache`` holds entries for the most recent
# len(cache) ancestors (path + the metadata chain_df needs: lines,
# minmax zone maps, and whether df() is a plain parquet read). Every
# _CHAIN_CHECKPOINT_EVERY-th link is a CHECKPOINT holding its full
# ancestry (capped at _CHAIN_CACHE_MAX); links in between hold only the
# suffix back to the last checkpoint, so total metadata stays O(N) per
# chain (a full list in every manifest would be O(N^2) — review r4).
# Resolution consumes the tip's suffix, then hops checkpoint to
# checkpoint: O(1 + depth/_CHAIN_CACHE_MAX) manifest reads. Appending
# is O(1) at write time except at checkpoints and at the legacy
# boundary (a previous written before the cache existed), which resolve
# the full ancestry once so depth and cache stay exact.
#
# IMMUTABILITY: cached entries snapshot the ancestor's manifest at
# write time (the reference's datasets are immutable job outputs).
# Rewriting an ancestor dataset IN PLACE leaves descendants' cached
# lines/minmax/plain stale; ``chain()`` re-reads manifests and verifies
# linkage (self-healing), while ``chain_entries``/``chain_df`` trust
# the snapshot for speed.
_CHAIN_CACHE_MAX = 4096
_CHAIN_CHECKPOINT_EVERY = 64


def _chain_entry(path: str, manifest: dict) -> dict:
    # string min/max can be arbitrarily long (document text columns) and
    # each entry is replicated into descendants' caches — bound them
    # CONSERVATIVELY (review r4): a prefix of min is <= min, so the
    # "min >= hi" skip stays sound; a truncated max cannot bound above,
    # so that side is dropped (no skip — correct, just less pruning).
    mm = {}
    for c, pair in (manifest.get("minmax") or {}).items():
        mn, mx = (pair or [None, None])[:2]
        if isinstance(mn, str) and len(mn) > 64:
            mn = mn[:64]
        if isinstance(mx, str) and len(mx) > 64:
            mx = None
        mm[c] = [mn, mx]
    return {
        "path": path,
        "id": manifest.get("id"),
        "lines": manifest.get("lines", 0),
        "minmax": mm,
        "plain": not (manifest.get("parent") or manifest.get("bucketing")),
    }


def _chain_meta(previous: "Dataset | str | None") -> dict:
    """chain_depth + chain_cache fields for a manifest being written."""
    if not previous:
        return {"chain_depth": 0}
    prev = previous if isinstance(previous, Dataset) else Dataset.load(previous)
    pm = prev.manifest
    if "chain_depth" in pm:
        depth = pm["chain_depth"] + 1
        # suffix of the NEW dataset's ancestry we have in hand for free
        known = list(pm.get("chain_cache") or [])
        known.append(_chain_entry(prev.path, pm))
    else:
        # legacy boundary: a pre-cache previous may have arbitrary
        # ancestry — resolve it fully ONCE (walks uncached links) so
        # depth is exact; a wrong depth here silently truncated chains
        # at the old/new boundary (review r4)
        known = prev.chain_entries()
        depth = len(known)
    if depth % _CHAIN_CHECKPOINT_EVERY == 0:
        need = min(depth, _CHAIN_CACHE_MAX)
        if len(known) < need:
            # only the newest `need` entries are kept: bounded resolve,
            # not the whole ancestry (review r4 — O(depth) per
            # checkpoint write past the cap)
            known = prev.chain_entries(length=need)
        cache = known[-need:]
    else:
        keep = min(depth % _CHAIN_CHECKPOINT_EVERY, _CHAIN_CACHE_MAX)
        cache = known[-keep:]
    return {"chain_depth": depth, "chain_cache": cache}


def _dump_manifest(path: str, manifest: dict) -> None:
    """Write dataset.json atomically: tmp file + os.rename, so a crash
    mid-dump never leaves a half-written manifest for a concurrent
    reader, and a reader always sees either the old or the new complete
    manifest (review r4). One writer shared by all three write paths so
    the durability behavior can't diverge."""
    os.makedirs(path, exist_ok=True)
    dest = os.path.join(path, MANIFEST_NAME)
    tmp = dest + ".tmp"
    with open(tmp, "w") as f:
        json.dump(manifest, f, indent=1, default=_json_safe)
    os.rename(tmp, dest)


def _valid_table_name(table: str) -> None:
    """Spark's catalog only accepts [A-Za-z0-9_] table names: a
    backtick fails identifier analysis even correctly escaped
    (INVALID_ATTRIBUTE_NAME_SYNTAX) and anything else — dots included —
    fails INVALID_SCHEMA_OR_RELATION_NAME even inside a quoted
    single-part name. One clear error at the boundary instead of a
    deep analyzer failure (ADVICE r4 + review r5)."""
    if not re.fullmatch(r"\w+", table, re.ASCII):
        raise ValueError(
            f"bucketed table name {table!r} is not a valid Spark "
            "catalog name (only letters, digits and _ are accepted)")


def _same_path(a: str | None, b: str | None) -> bool:
    """Path equality for chain links / stop_ds: manifests store paths
    verbatim (datasets stay relocatable), so compare normalized
    absolute forms — './ds1' vs 'ds1' vs a trailing slash must not
    silently defeat stop_ds or chain verification (review r4)."""
    if a is None or b is None:
        return a == b
    return (os.path.normpath(os.path.abspath(a))
            == os.path.normpath(os.path.abspath(b)))


def _entry_range_skips(minmax: dict,
                       range_filter: dict[str, tuple[Any, Any]]) -> bool:
    """True if cached [min,max] proves no row of the dataset matches."""
    for c, (lo, hi) in range_filter.items():
        mn, mx = (minmax.get(c) or [None, None])[:2]
        if mn is None and mx is None:
            continue
        try:
            if hi is not None and mn is not None and mn >= hi:
                return True
            if lo is not None and mx is not None and mx < lo:
                return True
        except TypeError:
            continue
    return False


@dataclass
class Dataset:
    """Handle to a written dataset. Cheap; holds no data."""

    path: str
    manifest: dict[str, Any] = field(default_factory=dict)

    # -- loading ---------------------------------------------------------
    @classmethod
    def load(cls, path: str) -> "Dataset":
        with open(os.path.join(path, MANIFEST_NAME)) as f:
            return cls(path=path, manifest=json.load(f))

    @classmethod
    def exists(cls, path: str) -> bool:
        return os.path.exists(os.path.join(path, MANIFEST_NAME))

    # -- writing ---------------------------------------------------------
    @classmethod
    def write(
        cls,
        df: DataFrame,
        path: str,
        hashlabel: str | None = None,
        previous: "Dataset | str | None" = None,
        caption: str = "",
        partitions: int | None = None,
        collect_minmax: bool = True,
        filename: str | None = None,
    ) -> "Dataset":
        """Write ``df`` as a dataset.

        ``hashlabel`` repartitions on that column first — the analog of the
        reference's hash split writers (accelerator/dataset.py:1362-1368).
        The co-partitioning *contract* (same hashlabel => no shuffle for a
        per-key op) is honored by Spark when the downstream op keys on the
        same column: the exchange is reused or AQE elides it.
        """
        if hashlabel:
            if hashlabel not in df.columns:
                raise ValueError(f"hashlabel {hashlabel!r} not in columns {df.columns}")
            n = partitions or int(df.sparkSession.conf.get("spark.sql.shuffle.partitions"))
            df = df.repartition(n, F.col(hashlabel))
        elif partitions:
            df = df.repartition(partitions)

        # manifest stats (lines, min/max zone maps) ride the write itself
        # via Observation — ONE scan, not write-then-rescan. At 100 TB the
        # old read-back agg pass doubled every write's IO.
        from pyspark.sql import Observation

        aggs = [F.count(F.lit(1)).alias("__lines__")]
        mm_cols = []
        if collect_minmax:
            for f_ in df.schema.fields:
                if f_.dataType.simpleString() in _MINMAX_TYPES:
                    mm_cols.append(f_.name)
                    aggs.append(F.min(_qcol(f_.name)).alias(f"__min_{f_.name}"))
                    aggs.append(F.max(_qcol(f_.name)).alias(f"__max_{f_.name}"))
        obs = Observation()
        df = df.observe(obs, *aggs)

        data_dir = os.path.join(path, "data")
        # invalidate a pre-existing manifest BEFORE replacing the data:
        # a crash between the data overwrite and the manifest dump used
        # to leave the OLD manifest describing the NEW files, whose
        # stale minmax zone-maps silently skipped matching rows (review
        # r4). A missing manifest is a loud, recoverable state.
        old_manifest = os.path.join(path, MANIFEST_NAME)
        if os.path.exists(old_manifest):
            os.remove(old_manifest)
        df.write.mode("overwrite").parquet(data_dir)

        spark = df.sparkSession
        written = spark.read.parquet(data_dir)
        row = obs.get

        manifest = {
            "version": 1,
            "id": uuid.uuid4().hex,
            "created": time.time(),
            "caption": caption,
            "filename": filename,
            "hashlabel": hashlabel,
            "previous": previous.path if isinstance(previous, Dataset) else previous,
            "columns": {f_.name: f_.dataType.simpleString() for f_ in written.schema.fields},
            "nullable": {f_.name: f_.nullable for f_ in written.schema.fields},
            "lines": row["__lines__"],
            "minmax": {
                c: [_json_safe(row[f"__min_{c}"]), _json_safe(row[f"__max_{c}"])]
                for c in mm_cols
            },
        }
        manifest.update(_chain_meta(previous))
        _dump_manifest(path, manifest)
        return cls(path=path, manifest=manifest)

    @classmethod
    def write_bucketed(
        cls,
        df: DataFrame,
        path: str,
        table: str,
        bucket_col: str,
        n_buckets: int = 32,
        previous: "Dataset | str | None" = None,
        caption: str = "",
    ) -> "Dataset":
        """Write with PERSISTED bucketing — the durable form of the
        reference's hashlabel contract (accelerator/dataset.py:1362-1368;
        SURVEY §4 "hash co-partitioning"). ``Dataset.write(hashlabel=)``
        co-partitions for ONE step; each later same-key join or groupBy
        still re-shuffles, because plain parquet carries no layout
        metadata. ``bucketBy`` records the layout in the catalog: every
        downstream join/agg on ``bucket_col`` between tables bucketed the
        same way runs with ZERO exchanges on either side (plan-tested).
        At 100 TB this is the difference between shuffling the fact table
        once at write time and shuffling it in every pipeline step.

        The catalog entry is per-session (in-memory catalog); the layout
        itself lives in the files + manifest, and ``register_bucketed``
        re-creates the table entry in a fresh session from the manifest
        alone.
        """
        from pyspark.sql import Observation

        spark = df.sparkSession
        obs = Observation()
        df = df.observe(obs, F.count(F.lit(1)).alias("__lines__"))
        data_dir = os.path.join(path, "data")
        # Spark's catalog only accepts [A-Za-z0-9_] table names — a
        # backtick fails identifier analysis even correctly escaped and
        # a dot fails INVALID_SCHEMA_OR_RELATION_NAME even inside a
        # quoted single-part name. Fail clearly up front. The quoted
        # form is still used below so the name is always parsed as ONE
        # identifier, never database.table.
        _valid_table_name(table)
        quoted = f"`{table}`"
        # same crash-window rule as write() (review r5: this path and
        # write_overlay missed the r4 fix): invalidate the old manifest
        # BEFORE replacing the data so a crash can't leave stale
        # lines/bucketing metadata describing the new files
        old_manifest = os.path.join(path, MANIFEST_NAME)
        if os.path.exists(old_manifest):
            os.remove(old_manifest)
        (df.write.mode("overwrite").format("parquet")
         .bucketBy(n_buckets, bucket_col).sortBy(bucket_col)
         .option("path", data_dir).saveAsTable(quoted))
        written = spark.table(quoted)
        manifest = {
            "version": 1,
            "id": uuid.uuid4().hex,
            "created": time.time(),
            "caption": caption,
            "filename": None,
            "hashlabel": bucket_col,
            "bucketing": {"table": table, "col": bucket_col, "n": n_buckets},
            "previous": previous.path if isinstance(previous, Dataset) else previous,
            "columns": {f_.name: f_.dataType.simpleString() for f_ in written.schema.fields},
            "nullable": {f_.name: f_.nullable for f_ in written.schema.fields},
            "lines": obs.get["__lines__"],
            "minmax": {},
        }
        manifest.update(_chain_meta(previous))
        _dump_manifest(path, manifest)
        return cls(path=path, manifest=manifest)

    @classmethod
    def write_overlay(
        cls,
        path: str,
        parent: "Dataset | str",
        new_cols: DataFrame | None = None,
        key: str | None = None,
        virtual: dict[str, str] | None = None,
        exclude: list[str] | tuple = (),
        caption: str = "",
        previous: "Dataset | str | None" = None,
    ) -> "Dataset":
        """Zero-copy column overlay — the reference's ``parent=`` /
        ``link_to_here`` (accelerator/dataset.py:864-941, 292-327,
        1132-1148): create a dataset that adds, overrides, or drops
        columns WITHOUT rewriting the parent's files.

        - ``new_cols`` (requires ``key``): a DataFrame of ``key`` + the
          added/overridden columns. ONLY these columns are written; at
          read time they join back to the parent on ``key`` (write the
          parent and the overlay with the same hashlabel/bucketing on
          ``key`` and the join co-partitions). A column name that
          already exists in the parent SHADOWS it, like link overrides.
        - ``virtual``: {name: sql_expr} columns evaluated at scan time —
          zero bytes written, the overlay is pure manifest.
        - ``exclude``: parent columns hidden from the overlay dataset
          (the reference's column discard without copy).

        At 100 TB: adding one column to a wide fact table writes that
        one column, not the table. The parent's files are byte-identical
        afterwards (tested)."""
        parent_ds = parent if isinstance(parent, Dataset) else Dataset.load(parent)
        overlay_meta: dict[str, Any] = {}
        new_col_types: dict[str, str] = {}
        mm = {}
        lines = parent_ds.lines
        if new_cols is not None:
            if not key:
                raise ValueError("write_overlay with new_cols requires key=")
            if key not in new_cols.columns:
                raise ValueError(f"key {key!r} not in new_cols {new_cols.columns}")
            # fail BEFORE the write, not at first read (review r4): the
            # read path joins back to the parent on the key, so a key
            # absent from the parent (or hidden by exclude) makes every
            # later df() raise after the write cost was already paid
            if key not in parent_ds.columns:
                raise ValueError(
                    f"overlay key {key!r} not in parent columns "
                    f"{sorted(parent_ds.columns)}")
            if key in exclude:
                raise ValueError(
                    f"overlay key {key!r} cannot be in exclude= — the "
                    "read-time join needs it")
            from pyspark.sql import Observation

            aggs = [F.count(F.lit(1)).alias("__lines__")]
            mm_cols = []
            for f_ in new_cols.schema.fields:
                if f_.name != key and f_.dataType.simpleString() in _MINMAX_TYPES:
                    mm_cols.append(f_.name)
                    aggs.append(F.min(_qcol(f_.name)).alias(f"__min_{f_.name}"))
                    aggs.append(F.max(_qcol(f_.name)).alias(f"__max_{f_.name}"))
            obs = Observation()
            observed = new_cols.observe(obs, *aggs)
            data_dir = os.path.join(path, "data")
            # see write()/write_bucketed: stale-manifest crash window
            old_manifest = os.path.join(path, MANIFEST_NAME)
            if os.path.exists(old_manifest):
                os.remove(old_manifest)
            observed.write.mode("overwrite").parquet(data_dir)
            row = obs.get
            # duplicate overlay keys would multiply rows at read time
            # while the manifest claims the parent's line count — refuse
            # (tiny agg over the just-written overlay columns only)
            spark = new_cols.sparkSession
            chk = spark.read.parquet(data_dir).agg(
                F.count(F.lit(1)).alias("n"),
                F.count_distinct(F.col(key)).alias("nd"),
                F.count(F.when(F.col(key).isNull(), 1)).alias("nnull"),
            ).collect()[0]
            if chk["nd"] + chk["nnull"] != chk["n"]:
                raise ValueError(
                    f"write_overlay: new_cols key {key!r} is not unique "
                    f"({chk['n']} rows, {chk['nd']} distinct non-null + "
                    f"{chk['nnull']} null) — a read-time join would "
                    "multiply rows")
            mm = {c: [_json_safe(row[f"__min_{c}"]), _json_safe(row[f"__max_{c}"])]
                  for c in mm_cols}
            new_col_types = {
                f_.name: f_.dataType.simpleString()
                for f_ in new_cols.schema.fields if f_.name != key}
            overlay_meta = {"key": key, "cols": list(new_col_types)}
        shadowed = set(new_col_types) | set(exclude)
        resolved = {c: t for c, t in parent_ds.columns.items()
                    if c not in shadowed}
        resolved.update(new_col_types)
        for name in (virtual or {}):
            resolved[name] = "expr"
        manifest = {
            "version": 1,
            "id": uuid.uuid4().hex,
            "created": time.time(),
            "caption": caption,
            "filename": None,
            # an overlay that SHADOWS or excludes the hashlabel column
            # invalidates the parent's co-partitioning claim (the values
            # come from the join, not the parent's hash layout)
            "hashlabel": (parent_ds.hashlabel
                          if parent_ds.hashlabel not in shadowed else None),
            "parent": parent_ds.path,
            "overlay": overlay_meta,
            "virtual": virtual or {},
            "exclude": list(exclude),
            "previous": previous.path if isinstance(previous, Dataset) else previous,
            "columns": resolved,
            "lines": lines,
            "minmax": mm,
        }
        manifest.update(_chain_meta(previous))
        _dump_manifest(path, manifest)
        return cls(path=path, manifest=manifest)

    def register_bucketed(self, spark: SparkSession) -> DataFrame:
        """Re-create the bucketed table entry from the manifest (needed
        once per new session — bucket layout is in the files, but Spark
        only TRUSTS it via a catalog entry). Idempotent — but NOT
        trusting: an existing entry with this name must actually point
        at THIS dataset's files. tableExists also matches temp views,
        so a same-named view (or another bucketed dataset reusing the
        name) used to be returned silently instead of this dataset's
        data (review r4)."""
        b = self.manifest.get("bucketing")
        if not b:
            raise ValueError(f"dataset at {self.path} was not written bucketed")
        data_dir = os.path.join(self.path, "data")
        # a table named a`b used to break out of the CREATE TABLE quotes
        # (ADVICE r4); the catalog itself rejects non-\w names (see
        # write_bucketed), so a hand-edited manifest gets a clear error
        # here instead of an injection or a deep analyzer failure.
        _valid_table_name(b["table"])
        # tableExists/spark.table PARSE their argument as a (possibly
        # multipart) identifier — quoting keeps the name one identifier,
        # never database.table
        quoted = f"`{b['table']}`"
        if spark.catalog.tableExists(quoted):
            rows = spark.sql(
                f"DESCRIBE FORMATTED {quoted}").collect()
            loc = next((r["data_type"] for r in rows
                        if (r["col_name"] or "").strip() == "Location"), None)
            # strip only a leading file: scheme — .replace() used to eat
            # the substring anywhere in the path (ADVICE r4)
            same = loc is not None and (
                os.path.normpath(re.sub(r"^file:(//)?", "", loc))
                == os.path.normpath(os.path.abspath(data_dir)))
            if not same:
                raise ValueError(
                    f"catalog name {b['table']!r} is already bound to "
                    f"{loc or 'a temp view'} — not this dataset's "
                    f"{data_dir}; drop it or rewrite with a distinct "
                    "table name")
        else:
            cols = ", ".join(
                f"`{c.replace('`', '``')}` {t}"
                for c, t in self.manifest["columns"].items()
            )
            bcol = b["col"].replace("`", "``")
            spark.sql(
                f"CREATE TABLE {quoted} ({cols}) USING parquet "
                f"CLUSTERED BY (`{bcol}`) SORTED BY (`{bcol}`) "
                f"INTO {b['n']} BUCKETS "
                f"LOCATION '{data_dir.replace(chr(39), chr(39) * 2)}'"
            )
        return spark.table(quoted)

    # -- reading ---------------------------------------------------------
    def df(self, spark: SparkSession) -> DataFrame:
        parent = self.manifest.get("parent")
        if parent:
            return self._overlay_df(spark, parent)
        b = self.manifest.get("bucketing")
        if b:
            return self.register_bucketed(spark)
        return spark.read.parquet(os.path.join(self.path, "data"))

    def _overlay_df(self, spark: SparkSession, parent: str) -> DataFrame:
        """Resolve a write_overlay dataset: parent scan + (optional)
        overlay-column join on the key + virtual expressions. Parent
        columns stream from the PARENT's files — never copied."""
        base = Dataset.load(parent).df(spark)
        ov = self.manifest.get("overlay") or {}
        exclude = set(self.manifest.get("exclude") or [])
        cols = [c for c in base.columns if c not in exclude]
        if ov.get("cols"):
            key = ov["key"]
            o = spark.read.parquet(os.path.join(self.path, "data"))
            shadowed = set(ov["cols"])
            cols = [c for c in cols if c not in shadowed]
            if key not in cols:
                raise ValueError(
                    f"overlay key {key!r} missing from parent columns")
            base = base.select(*cols).join(o, key, "left")
        else:
            base = base.select(*cols)
        for name, expr in (self.manifest.get("virtual") or {}).items():
            base = base.withColumn(name, F.expr(expr))
        return base

    # -- metadata --------------------------------------------------------
    @property
    def lines(self) -> int:
        return self.manifest.get("lines", 0)

    @property
    def hashlabel(self) -> str | None:
        return self.manifest.get("hashlabel")

    @property
    def columns(self) -> dict[str, str]:
        return self.manifest.get("columns", {})

    def min(self, col: str) -> Any:
        return self.manifest.get("minmax", {}).get(col, [None, None])[0]

    def max(self, col: str) -> Any:
        return self.manifest.get("minmax", {}).get(col, [None, None])[1]

    # -- chains (reference: accelerator/dataset.py:428-446) --------------
    @property
    def previous(self) -> "Dataset | None":
        p = self.manifest.get("previous")
        return Dataset.load(p) if p else None

    def chain_entries(self, length: int = -1,
                      stop_ds: "Dataset | str | None" = None) -> list[dict]:
        """Resolve the ``previous`` chain as lightweight cached entries
        (path, id, lines, minmax, plain), oldest first, using the
        manifest chain cache: consume the tip's suffix, then hop
        checkpoint to checkpoint — O(1 + depth/_CHAIN_CACHE_MAX)
        manifest reads instead of one per link (reference checkpoints
        the same metadata every 64 links —
        accelerator/dataset.py:955-961). Manifests written before the
        cache existed fall back to the link-by-link walk for the
        uncached stretch. Entries snapshot each ancestor's manifest at
        write time — see the immutability note on the cache constants;
        ``chain()`` re-verifies against live manifests."""
        stop = stop_ds.path if isinstance(stop_ds, Dataset) else stop_ds
        if (stop and _same_path(self.path, stop)) or length == 0:
            return []
        rev: list[dict] = [_chain_entry(self.path, self.manifest)]
        cur: Dataset | None = self
        while cur is not None and (length < 0 or len(rev) < length):
            if not cur.manifest.get("previous"):
                break
            cache = cur.manifest.get("chain_cache")
            if not cache:
                # pre-cache manifest: walk one link
                cur = cur.previous
                if (stop and _same_path(cur.path, stop)) or \
                        (length >= 0 and len(rev) >= length):
                    break
                rev.append(_chain_entry(cur.path, cur.manifest))
                continue
            done = False
            for e in reversed(cache):
                if (length >= 0 and len(rev) >= length) or \
                        (stop and _same_path(e["path"], stop)):
                    done = True
                    break
                rev.append(dict(e))
            if done or cur.manifest.get("chain_depth") == len(cache):
                break  # limit hit, or cache covered the whole ancestry
            # ancestry extends beyond cache[0] (suffix segment or capped
            # checkpoint): hop to the oldest cached dataset — its entry
            # is already in rev — and continue consuming ITS cache
            cur = Dataset.load(cache[0]["path"])
        rev.reverse()
        return rev

    def chain(self, length: int = -1, stop_ds: "Dataset | str | None" = None) -> list["Dataset"]:
        """Resolve the ``previous`` chain, newest last (matching the
        reference's iteration order: oldest dataset first). Returns full
        ``Dataset`` handles — one manifest read each; use
        ``chain_entries`` / ``chain_df`` when only chain metadata or the
        unioned frame is needed (those stay O(1)-ish in reads).

        Self-healing: because the handles re-read live manifests, the
        cached resolution is verified against actual ``previous``
        linkage — if an ancestor was rewritten in place (cache entries
        are write-time snapshots), the eager walk re-resolves."""
        entries = self.chain_entries(length=length, stop_ds=stop_ds)
        out = [self if e["path"] == self.path else Dataset.load(e["path"])
               for e in entries]
        ok = all(
            _same_path(out[i + 1].manifest.get("previous"), out[i].path)
            and (entries[i].get("id") is None
                 or entries[i]["id"] == out[i].manifest.get("id"))
            for i in range(len(out) - 1))
        if ok:
            return out
        # snapshot/live mismatch: eager link-by-link walk (the pre-cache
        # behavior), correct for any live chain shape
        stop = stop_ds.path if isinstance(stop_ds, Dataset) else stop_ds
        walk: list[Dataset] = []
        cur: Dataset | None = self
        while cur is not None and (length < 0 or len(walk) < length):
            if stop and _same_path(cur.path, stop):
                break
            walk.append(cur)
            cur = cur.previous
        walk.reverse()
        return walk

    def chain_df(
        self,
        spark: SparkSession,
        length: int = -1,
        stop_ds: "Dataset | str | None" = None,
        range_filter: dict[str, tuple[Any, Any]] | None = None,
        allow_missing_columns: bool = False,
    ) -> DataFrame:
        """Union-of-chain read (the reference's ``iterate_chain``,
        accelerator/dataset.py:443-446).

        ``range_filter={col: (lo, hi)}`` keeps lo <= col < hi AND skips
        whole datasets whose manifest [min,max] misses the range — the
        reference's zone-map skip (accelerator/dataset.py:609-614). Spark's
        parquet row-group stats then skip inside surviving datasets.

        ``allow_missing_columns=True`` opts into schema evolution across
        the chain: a batch that ADDED a column unions with older batches,
        which read NULL for it (the reference requires identical columns;
        this is new surface for long-lived ingest chains whose feed grows
        fields)."""
        entries = self.chain_entries(length=length, stop_ds=stop_ds)
        if range_filter:
            entries = [e for e in entries
                       if not _entry_range_skips(e["minmax"], range_filter)]
        if not entries:
            return self.df(spark).limit(0)
        # plain datasets (no overlay/bucketing) read straight from their
        # data dir — no manifest load; only non-plain survivors and self
        # cost a manifest read
        dfs = [
            self.df(spark) if e["path"] == self.path
            else spark.read.parquet(os.path.join(e["path"], "data"))
            if e["plain"]
            else Dataset.load(e["path"]).df(spark)
            for e in entries
        ]
        out = dfs[0]
        for d in dfs[1:]:
            out = out.unionByName(d, allowMissingColumns=allow_missing_columns)
        if range_filter:
            for c, (lo, hi) in range_filter.items():
                if lo is not None:
                    out = out.filter(F.col(c) >= F.lit(lo))
                if hi is not None:
                    out = out.filter(F.col(c) < F.lit(hi))
        return out

    def _range_skips(self, range_filter: dict[str, tuple[Any, Any]]) -> bool:
        """True if manifest min/max proves no row can match (one
        predicate, shared with the cached-entry path so the skip
        semantics can't diverge)."""
        return _entry_range_skips(self.manifest.get("minmax", {}),
                                  range_filter)

    def iterate(
        self,
        spark: SparkSession,
        columns: list[str] | None = None,
        filters=None,
        range_filter: dict[str, tuple[Any, Any]] | None = None,
    ) -> DataFrame:
        """The single-dataset ``iterate`` surface (SURVEY §2.2) as a
        DataFrame recipe: projection + filter + range, all pushed to the
        scan by Catalyst."""
        df = self.df(spark)
        if range_filter:
            for c, (lo, hi) in range_filter.items():
                if lo is not None:
                    df = df.filter(F.col(c) >= F.lit(lo))
                if hi is not None:
                    df = df.filter(F.col(c) < F.lit(hi))
        if filters is not None:
            df = df.filter(filters)
        if columns:
            df = df.select(*columns)
        return df


def with_lineno(df: DataFrame, col: str = LINENO) -> DataFrame:
    """Attach a monotonically increasing ingest-order id. Not densely
    sequential (per-partition blocks), but strictly ordered within a
    partition and unique — sufficient for stable sort keys and
    original-order recovery (SURVEY §7.4)."""
    return df.withColumn(col, F.monotonically_increasing_id())
