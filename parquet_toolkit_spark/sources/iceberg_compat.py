"""Iceberg table access (gated: no Iceberg runtime in this image).

The north rule targets "Iceberg tables of source-code repositories". This
container ships neither the iceberg-spark runtime jar nor pyiceberg, so
catalog access is stubbed behind an import/config probe — but the engine's
own store already mirrors the Iceberg constructs it needs:

  Iceberg construct          engine equivalent
  ------------------------   ------------------------------------------
  data files per partition   staged pid=N/*.parquet (layout_stage)
  manifest / manifest list   the per-(pid, column) manifest parquet
                             (codec, bytes, checksum, status, run_id)
  snapshot commit            write-temp-then-rename blob commit + full
                             manifest rewrite (atomic swap)
  rewrite_data_files         operators/layout.compact / compact_in_place
  expire_snapshots           superseded pid dirs replaced in place

On a cluster with the iceberg-spark runtime on the classpath,
`read_table` resolves through the catalog; here it raises with the exact
spark-submit flags needed.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

ICEBERG_PACKAGES = "org.apache.iceberg:iceberg-spark-runtime-3.5_2.13:1.5.0"


def iceberg_available(spark: SparkSession) -> bool:
    try:
        spark._jvm.java.lang.Class.forName(
            "org.apache.iceberg.spark.SparkCatalog"
        )
        return True
    except Exception:
        return False


def read_table(spark: SparkSession, identifier: str) -> DataFrame:
    """Read an Iceberg table (catalog.db.table) when the runtime is
    present; informative failure otherwise."""
    if not iceberg_available(spark):
        raise NotImplementedError(
            "Iceberg runtime not on the classpath in this environment. "
            "On a cluster run: spark-submit --packages "
            f"{ICEBERG_PACKAGES} --conf spark.sql.catalog.ptsk="
            "org.apache.iceberg.spark.SparkCatalog ... ; the engine's "
            "parquet-dir staging + manifest store is the drop-in local "
            "equivalent (see module docstring)."
        )
    return spark.read.format("iceberg").load(identifier)


# ------------------------------------------------------- metadata layer
# The Iceberg METADATA layer (vN.metadata.json) is plain JSON (spec v1/v2,
# https://iceberg.apache.org/spec/) and needs no runtime — this pure-python
# reader resolves the current metadata file, the schema (mapped to Spark
# DDL), partition specs and the snapshot log. Only the MANIFEST layer
# (Avro manifest lists) needs a library this image lacks, so exact
# per-snapshot file pruning stays gated; see read_data_fallback.

_ICEBERG_TO_SPARK = {
    "boolean": "boolean", "int": "int", "long": "bigint", "float": "float",
    "double": "double", "date": "date", "time": "bigint",
    "timestamp": "timestamp_ntz", "timestamptz": "timestamp",
    "string": "string", "uuid": "string", "binary": "binary",
}


def _iceberg_type_to_ddl(t) -> str:
    if isinstance(t, str):
        if t in _ICEBERG_TO_SPARK:
            return _ICEBERG_TO_SPARK[t]
        if t.startswith("decimal("):
            return t
        if t.startswith("fixed["):
            return "binary"
        raise ValueError(f"unsupported iceberg type {t!r}")
    kind = t.get("type")
    if kind == "list":
        return f"array<{_iceberg_type_to_ddl(t['element'])}>"
    if kind == "map":
        return (f"map<{_iceberg_type_to_ddl(t['key'])},"
                f"{_iceberg_type_to_ddl(t['value'])}>")
    if kind == "struct":
        inner = ",".join(
            f"{f['name']}:{_iceberg_type_to_ddl(f['type'])}"
            for f in t["fields"]
        )
        return f"struct<{inner}>"
    raise ValueError(f"unsupported iceberg type {t!r}")


def read_table_metadata(table_dir: str, spark: SparkSession | None = None) -> dict:
    """Resolve + parse the current vN.metadata.json of an Iceberg table dir.

    Resolution order (spec-conformant for filesystem tables):
    metadata/version-hint.text -> vN.metadata.json, else the highest
    vN.metadata.json present. All IO goes through the fs shim, so
    hdfs://, s3a:// table locations work when a session is active."""
    import json
    import posixpath
    import re

    from parquet_toolkit_spark.sources.fs import DriverFS

    fs = DriverFS(spark)
    meta_dir = posixpath.join(table_dir.rstrip("/"), "metadata")
    files = {posixpath.basename(p): p for p, _ in fs.list_files(meta_dir)}
    target = None
    if "version-hint.text" in files:
        hint = fs.read_text(files["version-hint.text"]).strip()
        for cand in (f"v{hint}.metadata.json", f"{hint}.metadata.json"):
            if cand in files:
                target = files[cand]
                break
    if target is None:
        versions = sorted(
            (int(m.group(1)), p) for n, p in files.items()
            if (m := re.match(r"v(\d+)\.metadata\.json$", n))
        )
        if not versions:
            raise FileNotFoundError(f"no vN.metadata.json under {meta_dir}")
        target = versions[-1][1]
    md = json.loads(fs.read_text(target))

    schemas = md.get("schemas")
    if schemas is None:  # format-version 1 single-schema layout
        schemas = [md["schema"]]
    cur_schema_id = md.get("current-schema-id", schemas[-1].get("schema-id", 0))
    schema = next(
        (s for s in schemas if s.get("schema-id", 0) == cur_schema_id),
        schemas[-1],
    )
    ddl = ", ".join(
        f"{f['name']} {_iceberg_type_to_ddl(f['type'])}"
        for f in schema["fields"]
    )
    snaps = md.get("snapshots", [])
    return {
        "metadata_file": target,
        "format_version": md.get("format-version"),
        "table_uuid": md.get("table-uuid"),
        "location": md.get("location", table_dir),
        "schema_ddl": ddl,
        "schema_fields": [
            (f["name"], _iceberg_type_to_ddl(f["type"]), f.get("required", False))
            for f in schema["fields"]
        ],
        "partition_specs": md.get("partition-specs",
                                  [{"spec-id": 0, "fields": md.get("partition-spec", [])}]),
        "current_snapshot_id": md.get("current-snapshot-id"),
        "snapshots": [
            {"snapshot_id": s.get("snapshot-id"),
             "timestamp_ms": s.get("timestamp-ms"),
             "manifest_list": s.get("manifest-list"),
             "summary": s.get("summary", {})}
            for s in snaps
        ],
        "properties": md.get("properties", {}),
    }


def read_data_fallback(spark: SparkSession, table_dir: str) -> DataFrame:
    """Read an Iceberg table's data files with the DECLARED schema but
    without manifest pruning (Avro manifest lists need the gated runtime).

    Exact for append-only tables with no replace/delete snapshots — the
    10^12-file source-code corpus shape — and raises when the snapshot
    summary says files were removed (a scan would resurrect them)."""
    md = read_table_metadata(table_dir, spark)
    for s in md["snapshots"]:
        op = s["summary"].get("operation", "append")
        if op not in ("append",):
            raise NotImplementedError(
                f"snapshot {s['snapshot_id']} is {op!r}: exact reads need "
                "manifest pruning (Iceberg runtime / pyiceberg); the "
                "directory scan below is only safe for append-only tables"
            )
    import posixpath

    return (
        spark.read.schema(md["schema_ddl"])
        .option("recursiveFileLookup", "true")
        .parquet(posixpath.join(table_dir.rstrip("/"), "data"))
    )
