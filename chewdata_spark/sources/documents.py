"""Format codecs (reference `Document` trait, src/document/mod.rs:174-214).

Every format the reference reads/writes, mapped Spark-first:

| format  | read                          | write                        |
|---------|-------------------------------|------------------------------|
| json    | spark.read.json multiLine     | df.write.json (array option) |
| jsonl   | spark.read.json (NDJSON)      | df.write.json                |
| csv     | spark.read.csv full dialect   | df.write.csv                 |
| parquet | native                        | native (+writer options)     |
| xml     | native Spark 4 XML source     | native                       |
| yaml    | binaryFile → PyYAML → json DS | per-record docs → text sink  |
| toml    | binaryFile → tomllib → json DS| per-record tables → text sink|
| text    | spark.read.text (wholetext)   | df.write.text                |
| byte    | binaryFile                    | —                            |

YAML/TOML have no JVM source; they are config-scale formats — parsing
happens in Arrow-batched Python over distributed `binaryFile` rows, so
even a directory of thousands of files parallelizes.

Also here: ``entry_path`` drill-in (RFC6901 pointers, reference
src/document/json.rs:139) and ``resolve_value_types`` — the reference's
``Value::resolve`` semantics (string → long/double/bool when the whole
column coerces cleanly), used by CSV-without-inference and XML reads.
"""

from __future__ import annotations

import json as _json
from typing import Any

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

READ_FORMATS = ("json", "jsonl", "csv", "parquet", "orc", "avro", "xml", "yaml", "toml", "text", "byte")
WRITE_FORMATS = ("json", "jsonl", "csv", "parquet", "orc", "avro", "xml", "yaml", "toml", "text", "byte")

CSV_READ_DEFAULTS = {
    "header": "true",
    "sep": ",",
    "quote": '"',
    "escape": '"',
    "multiLine": "true",  # reference CSV supports embedded newlines in quotes
    "mode": "PERMISSIVE",
}


def _concatenated_json_to_lines(batches):
    """Parse whitespace-separated concatenated JSON values per file."""
    import pandas as pd

    dec = _json.JSONDecoder()
    for pdf in batches:
        out = []
        for content in pdf["content"]:
            text = bytes(content).decode("utf-8")
            i, n = 0, len(text)
            while i < n:
                while i < n and text[i].isspace():
                    i += 1
                if i >= n:
                    break
                obj, i = dec.raw_decode(text, i)
                out.append(_json.dumps(obj, ensure_ascii=False))
        yield pd.DataFrame({"json": out})


def _parse_documents_to_json_lines(fmt: str):
    """Return a mapInPandas fn: (path, content) rows → JSON-line strings."""

    def gen(batches):
        import pandas as pd

        for pdf in batches:
            out = []
            for content in pdf["content"]:
                raw = bytes(content)
                if fmt == "yaml":
                    import yaml

                    docs = [d for d in yaml.safe_load_all(raw.decode("utf-8")) if d is not None]
                else:  # toml
                    import tomllib

                    data = tomllib.loads(raw.decode("utf-8"))
                    # array-of-tables under a single key unwraps to records
                    if (
                        len(data) == 1
                        and isinstance(next(iter(data.values())), list)
                        and all(isinstance(x, dict) for x in next(iter(data.values())))
                    ):
                        docs = next(iter(data.values()))
                    else:
                        docs = [data]
                for d in docs:
                    # default=str: PyYAML eagerly types ISO dates
                    out.append(_json.dumps(d, ensure_ascii=False, default=str))
            yield pd.DataFrame({"json": out})

    return gen


_METADATA_TO_SPARK = {
    "delimiter": "sep",
    "quote": "quote",
    "escape": "escape",
    "comment": "comment",
    "terminator": "lineSep",
    "charset": "encoding",
    "compression": "compression",
}


def metadata_options(doc: dict) -> dict[str, str]:
    """Translate the reference's ``Metadata`` block (src/lib.rs:100-114,
    configured as ``document.metadata`` / ``document.meta`` — e.g.
    ``{"has_headers": true, "delimiter": ";", "charset": "utf-8"}``)
    into the equivalent Spark reader/writer options.  Keys the target
    format ignores (e.g. ``sep`` on json) are harmless — Spark drops
    unknown options silently, matching the reference's merge-then-use
    semantics (src/lib.rs:118-132)."""
    meta = dict(doc.get("metadata") or doc.get("meta") or {})
    out: dict[str, str] = {}
    if meta.get("has_headers") is not None:
        out["header"] = "true" if meta["has_headers"] else "false"
    for k, spark_k in _METADATA_TO_SPARK.items():
        if meta.get(k) is not None:
            out[spark_k] = str(meta[k])
    # csv-document-level knobs (src/document/csv.rs:8-33):
    # quote_style ALWAYS/NOT_NUMERIC → quoteAll (Spark has no
    # numeric-only quoting — quoting everything is the safe superset);
    # NEVER → empty quote char disables quoting.  trim ALL/FIELDS →
    # whitespace-ignoring reads.  is_flexible → PERMISSIVE vs FAILFAST.
    qs = str(doc.get("quote_style") or "").upper()
    if qs in ("ALWAYS", "NOT_NUMERIC"):
        out["quoteAll"] = "true"
    elif qs == "NEVER":
        out["quote"] = ""
    tr = str(doc.get("trim") or "").upper()
    if tr in ("ALL", "FIELDS"):
        out["ignoreLeadingWhiteSpace"] = "true"
        out["ignoreTrailingWhiteSpace"] = "true"
    if doc.get("is_flexible") is not None:
        out["mode"] = "PERMISSIVE" if doc["is_flexible"] else "FAILFAST"
    if doc.get("is_pretty") is not None:
        # honored by the single-file json/jsonl writers; Spark's
        # directory writers ignore it (they have no pretty mode)
        out["is_pretty"] = "true" if doc["is_pretty"] else "false"
    # xml-document-level keys (src/document/xml.rs:13-15): the
    # reference's attribute/text markers and fallback root element map
    # onto spark-xml's option names (our defaults already match the
    # reference's @ / $ / root)
    if doc.get("attribute_key"):
        out["attributePrefix"] = str(doc["attribute_key"])
    if doc.get("text_key"):
        out["valueTag"] = str(doc["text_key"])
    if doc.get("root"):
        out["rootTag"] = str(doc["root"])
    return out


def read_document(
    spark: SparkSession,
    path: str | list[str],
    fmt: str,
    *,
    entry_path: str | None = None,
    resolve_types: bool = False,
    options: dict[str, str] | None = None,
) -> DataFrame:
    """Read `path` (file/dir/glob — Spark expands globs natively, the
    reference's wildcard paginator src/connector/paginator/local/wildcard.rs).
    An explicit list of files is accepted too (bucket skip/limit listing)."""
    options = dict(options or {})
    paths = path if isinstance(path, list) else [path]
    if fmt == "json":
        # line-mode first: it handles NDJSON directories (our own writes)
        # and single-line arrays; a pretty-printed array file shows up as
        # one _corrupt_record column → re-read as whole-file JSON.
        # (The reverse order would silently read only the first record
        # of each NDJSON part file.)
        df = spark.read.options(**options).json(path)
        if df.columns == ["_corrupt_record"]:
            df = spark.read.options(multiLine=True, **options).json(path)
    elif fmt == "jsonl":
        df = spark.read.options(**options).json(path)
        if df.columns == ["_corrupt_record"]:
            # the reference writes "pretty" JSONL — concatenated
            # multi-line objects (src/document/jsonl.rs `is_pretty`);
            # stream-parse them Arrow-batched per file
            files = spark.read.format("binaryFile").load(path).select("content")
            jl = files.mapInPandas(_concatenated_json_to_lines, "json string")
            df = spark.read.json(jl.rdd.map(lambda r: r.json))
    elif fmt == "csv":
        opts = {**CSV_READ_DEFAULTS, "inferSchema": "true", **options}
        df = spark.read.options(**opts).csv(path)
    elif fmt == "parquet":
        df = spark.read.options(**options).parquet(*paths)
    elif fmt == "orc":
        df = spark.read.options(**options).orc(*paths)
    elif fmt == "avro":
        # needs the spark-avro module on the cluster classpath (not in
        # this container); Spark raises its own actionable error if absent
        df = spark.read.format("avro").options(**options).load(paths)
    elif fmt == "xml":
        opts = {"rowTag": "item", "attributePrefix": "@", "valueTag": "$", **options}
        df = spark.read.format("xml").options(**opts).load(path)
        # reference xml2json exposes attributes as plain keys in golden
        # tests; strip the attribute prefix
        renames = {c: c.lstrip("@") for c in df.columns if c.startswith("@")}
        df = df.withColumnsRenamed(renames)
        if resolve_types is False:
            resolve_types = True  # XML attributes are untyped strings
    elif fmt in ("yaml", "toml"):
        files = spark.read.format("binaryFile").load(path).select("content")
        jl = files.mapInPandas(_parse_documents_to_json_lines(fmt), "json string")
        df = spark.read.json(jl.rdd.map(lambda r: r.json))
    elif fmt == "text":
        df = spark.read.options(wholetext=True, **options).text(path)
    elif fmt == "byte":
        df = spark.read.format("binaryFile").options(**options).load(path)
    else:
        raise ValueError(f"unknown read format {fmt!r}; expected {READ_FORMATS}")
    if entry_path:
        df = apply_entry_path(df, entry_path)
    if resolve_types:
        df = resolve_value_types(df)
    return df


def write_document(
    df: DataFrame,
    path: str,
    fmt: str,
    *,
    mode: str = "overwrite",
    partition_by: list[str] | None = None,
    options: dict[str, str] | None = None,
) -> None:
    """Write as `fmt`.  Spark writes directories of part files — the
    scale-correct layout; the reference's single-file append/header
    splicing (src/step/writer.rs:205-242) is a single-node concern."""
    options = dict(options or {})
    if fmt == "csv" and any(
        f.dataType.typeName() in ("struct", "array") for f in df.schema.fields
    ):
        # nested records flatten to dotted + positional keys on CSV
        # write (reference csv.rs:384-430 + value.rs:7-82); the header
        # is the union of keys (deepest-record header, distributed)
        from chewdata_spark.functions.objects import flatten as _flatten

        df = _flatten(df, positional=str(options.pop("positional", "true")) != "false")
    writer = df.write.mode(mode)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    if fmt in ("json", "jsonl"):
        writer.options(**options).json(path)
    elif fmt == "csv":
        writer.options(header=True, **options).csv(path)
    elif fmt == "parquet":
        writer.options(**options).parquet(path)
    elif fmt == "orc":
        writer.options(**options).orc(path)
    elif fmt == "avro":
        writer.format("avro").options(**options).save(path)
    elif fmt == "xml":
        opts = {"rowTag": "item", "rootTag": "root", **options}
        writer.format("xml").options(**opts).save(path)
    elif fmt == "yaml":
        rendered = df.mapInPandas(_render_yaml, "doc string")
        rendered.write.mode(mode).text(path)
    elif fmt == "toml":
        rendered = df.mapInPandas(_render_toml, "doc string")
        rendered.write.mode(mode).text(path)
    elif fmt == "text":
        writer.options(**options).text(path)
    elif fmt == "byte":
        _write_bytes(df, path, mode=mode)
    else:
        raise ValueError(f"unknown write format {fmt!r}; expected {WRITE_FORMATS}")


def _write_bytes(df: DataFrame, path: str, *, mode: str = "overwrite") -> None:
    """Raw byte passthrough write (reference byte document,
    src/document/byte.rs): the binary `content` column is written
    verbatim, one file per partition.  Local/NFS paths only (executors
    open the files directly — fine in local mode and shared-FS
    clusters; object stores should use parquet-with-binary instead)."""
    import os as _os
    import shutil

    col = "content" if "content" in df.columns else None
    if col is None:
        bins = [f.name for f in df.schema.fields if f.dataType.typeName() == "binary"]
        if len(bins) != 1:
            raise ValueError(f"byte write needs one binary column, got {df.columns}")
        col = bins[0]
    local = path.removeprefix("file:")
    if mode == "overwrite" and _os.path.isdir(local):
        shutil.rmtree(local)
    _os.makedirs(local, exist_ok=True)

    def save(rows) -> None:
        import os

        from pyspark import TaskContext

        pid = TaskContext.get().partitionId()
        target = os.path.join(local, f"part-{pid:05d}.bin")
        wrote = False
        with open(target, "wb") as fh:
            for r in rows:
                b = r[col]
                if b is not None:
                    fh.write(bytes(b))
                    wrote = True
        if not wrote:
            os.remove(target)

    df.select(col).foreachPartition(save)


# (mime_type, mime_subtype) per document type, mirroring the reference's
# Metadata defaults (json.rs:80-81, jsonl.rs:61,78, csv.rs:96-97,
# text.rs:54-55, toml.rs:53-54, xml.rs:88-89, yaml.rs:39,58,
# byte.rs:52-53, parquet.rs:186,191) — including the text document's
# quirky plain/text ordering.  Drives `{{ metadata.* }}` path holes
# (local.rs dynamic-file example).
MIME_TYPES: dict[str, tuple[str, str]] = {
    "json": ("application", "json"),
    "jsonl": ("application", "x-ndjson"),
    "csv": ("text", "csv"),
    "text": ("plain", "text"),
    "toml": ("application", "toml"),
    "xml": ("text", "xml"),
    "yaml": ("application", "x-yaml"),
    "byte": ("application", "octet-stream"),
    "parquet": ("application", "parquet"),
    "orc": ("application", "orc"),
    "avro": ("application", "avro"),
}


def _hadoop_fs(spark, path: str):
    jvm = spark.sparkContext._jvm
    conf = spark.sparkContext._jsc.hadoopConfiguration()
    p = jvm.org.apache.hadoop.fs.Path(path)
    return jvm, p.getFileSystem(conf), p


def write_single_file(
    df: DataFrame, path: str, fmt: str, *, options: dict[str, str] | None = None
) -> None:
    """Single-file output (the reference appends to ONE file with
    header/footer splicing, src/document/mod.rs:181-205 — a single-node
    concern; directories are the scale-correct layout).  Opt-in helper:
    coalesce(1) → temp directory → promote the part file to `path` via
    the Hadoop FS API (works on any scheme, including s3a)."""
    tmp = path.rstrip("/") + "._single_tmp"
    write_document(df.coalesce(1), tmp, fmt, mode="overwrite", options=options)
    spark = df.sparkSession
    jvm, fs, tmp_path = _hadoop_fs(spark, tmp)
    parts = [
        s.getPath()
        for s in fs.listStatus(tmp_path)
        if s.getPath().getName().startswith("part-")
    ]
    if len(parts) != 1:
        raise RuntimeError(f"expected one part file in {tmp}, found {len(parts)}")
    dest = jvm.org.apache.hadoop.fs.Path(path)
    if fs.exists(dest):
        fs.delete(dest, False)
    fs.rename(parts[0], dest)
    fs.delete(tmp_path, True)


def _fs_read_fully(jvm, fs, p) -> bytes:
    stream = fs.open(p)
    try:
        return bytes(jvm.org.apache.commons.io.IOUtils.toByteArray(stream))
    finally:
        stream.close()


def append_single_file(
    df: DataFrame, path: str, fmt: str, *, options: dict[str, str] | None = None
) -> None:
    """Single-file append with the reference's ``can_append`` splice
    (src/document/mod.rs:181-205).

    - ``json``: records append INSIDE the ``[`` … ``]`` envelope — the
      reference seeks past the footer and splices ``,record…]``
      (header/footer/terminator, src/document/json.rs:282-327); the
      target stays one valid JSON array across appends.
    - ``csv``: the header is written only when the target has no data
      (``has_data`` gate, mod.rs:178-180) — appends drop the fresh part's
      header line.
    - ``xml``: records splice INSIDE the root element — the reference
      seeks past the ``</root>`` footer and inserts fresh ``<item>``
      rows before it (header/footer, src/document/xml.rs:88-116); the
      target stays one well-formed document across appends.
    - ``jsonl`` / ``text``: terminator-separated, append at EOF.

    Single-file output is a single-node concern by construction (the
    scale path is a directory of part files with ``mode=append``), so
    the splice is a bounded driver-side read-modify-write over the
    Hadoop FS API — any scheme works, including object stores where an
    in-place seek-and-write would not.
    """
    if fmt not in ("json", "jsonl", "csv", "text", "xml"):
        raise ValueError(
            f"append_single_file supports json/jsonl/csv/text/xml, got {fmt!r}"
        )
    spark = df.sparkSession
    tmp = path.rstrip("/") + "._append_tmp"
    write_single_file(df, tmp, fmt, options=options)
    jvm, fs, tmp_p = _hadoop_fs(spark, tmp)
    new = _fs_read_fully(jvm, fs, tmp_p).decode("utf-8")
    fs.delete(tmp_p, False)
    if str((options or {}).get("is_pretty", "")).lower() == "true" and fmt == "jsonl":
        # reference jsonl is_pretty: concatenated multi-line objects —
        # pretty-render the fresh records only (existing content may
        # already be pretty and must splice untouched)
        import json as _json

        new = "\n".join(
            _json.dumps(_json.loads(line), indent=2, ensure_ascii=False)
            for line in new.splitlines()
            if line.strip()
        ) + ("\n" if new.strip() else "")
    dest_p = jvm.org.apache.hadoop.fs.Path(path)
    existing = (
        _fs_read_fully(jvm, fs, dest_p).decode("utf-8") if fs.exists(dest_p) else ""
    )
    if fmt == "json":
        # Spark renders JSONL; the single-file envelope is a JSON array
        body = ",".join(line for line in new.splitlines() if line.strip())
        if not existing.strip():
            content = "[" + body + "]"
        else:
            head = existing.rstrip()
            if not head.endswith("]"):
                raise ValueError(f"{path} is not a JSON array document; cannot splice")
            head = head[:-1].rstrip()
            sep = "" if head.endswith("[") or not body else ","
            content = head + sep + body + "]"
    elif fmt == "xml":
        root = (options or {}).get("rootTag", "root")
        open_tag, close_tag = f"<{root}>", f"</{root}>"
        i, j = new.find(open_tag), new.rfind(close_tag)
        if i < 0 or j < 0:
            raise ValueError(f"fresh xml part lacks <{root}> envelope")
        body = new[i + len(open_tag) : j].rstrip("\n")
        if not existing.strip():
            content = new
        else:
            head = existing.rstrip()
            if not head.endswith(close_tag):
                raise ValueError(
                    f"{path} does not end with {close_tag}; cannot splice"
                )
            content = head[: -len(close_tag)].rstrip("\n") + body + "\n" + close_tag + "\n"
    elif fmt == "csv" and existing.strip():
        content = existing
        if not content.endswith("\n"):
            content += "\n"
        content += new.split("\n", 1)[1] if "\n" in new else ""
    else:  # jsonl / text / first csv write
        content = existing
        if content and not content.endswith("\n"):
            content += "\n"
        content += new
    if str((options or {}).get("is_pretty", "")).lower() == "true" and fmt == "json":
        # reference is_pretty (src/document/json.rs:238): human-readable
        # output — the single-file path is driver-side and bounded by
        # construction, so re-rendering the array is safe
        import json as _json

        content = _json.dumps(_json.loads(content), indent=2, ensure_ascii=False)
    out = fs.create(dest_p, True)
    try:
        out.write(bytearray(content.encode("utf-8")))
    finally:
        out.close()


def _render_yaml(batches):
    import pandas as pd
    import yaml

    for pdf in batches:
        docs = [
            "---\n" + yaml.safe_dump(rec, allow_unicode=True, sort_keys=False).rstrip("\n")
            for rec in pdf.to_dict(orient="records")
        ]
        yield pd.DataFrame({"doc": docs})


def _toml_value(v: Any) -> str:
    if isinstance(v, bool):
        return "true" if v else "false"
    if isinstance(v, (int, float)):
        return repr(v)
    if isinstance(v, list):
        return "[" + ", ".join(_toml_value(x) for x in v) + "]"
    if isinstance(v, dict):
        return "{" + ", ".join(f'"{k}" = {_toml_value(x)}' for k, x in v.items()) + "}"
    s = str(v).replace("\\", "\\\\").replace('"', '\\"').replace("\n", "\\n")
    return f'"{s}"'


def _render_toml(batches):
    import pandas as pd

    for pdf in batches:
        docs = []
        for rec in pdf.to_dict(orient="records"):
            lines = ["[[row]]"]
            for k, v in rec.items():
                if v is None:
                    continue
                lines.append(f'"{k}" = {_toml_value(v)}')
            docs.append("\n".join(lines))
        yield pd.DataFrame({"doc": docs})


def apply_entry_path(df: DataFrame, entry_path: str) -> DataFrame:
    """RFC6901-ish drill-in: ``/data/*/items`` — object key = getField,
    ``*`` = explode, integer = array element (reference entry_path,
    src/document/json.rs:139, src/document/mod.rs:206-209).

    A final array result is exploded to records; a final struct result
    is unwrapped to top-level columns.
    """
    col: Column | None = None
    for seg in (s for s in entry_path.split("/") if s):
        if seg == "*":
            src = col if col is not None else _sole_array(df)
            df = df.select(F.explode(src).alias("_w"))
            col = F.col("_w")
        elif seg.isdigit():
            src = col if col is not None else _sole_array(df)
            df = df.select(F.element_at(src, int(seg) + 1).alias("_w"))
            col = F.col("_w")
        else:
            col = F.col(seg) if col is None else col.getField(seg)
    if col is not None:
        df = df.select(col.alias("_w"))
        if df.schema["_w"].dataType.typeName() == "array":
            df = df.select(F.explode("_w").alias("_w"))
        if df.schema["_w"].dataType.typeName() == "struct":
            df = df.select("_w.*")
    return df


def _sole_array(df: DataFrame) -> Column:
    arrays = [f.name for f in df.schema.fields if f.dataType.typeName() == "array"]
    if len(arrays) != 1:
        raise ValueError(f"cannot infer array column for '*' among {df.columns}")
    return F.col(arrays[0])


def resolve_value_types(df: DataFrame) -> DataFrame:
    """The reference's ``Value::resolve`` re-typing (src/updater/tera.rs:182):
    a string column becomes long/double/bool if every non-null value
    coerces.  One aggregate pass decides; casts are then applied
    declaratively (no data collected beyond the 3 counters per column).
    """
    str_cols = [f.name for f in df.schema.fields if f.dataType.typeName() == "string"]
    if not str_cols:
        return df
    aggs = []
    for c in str_cols:
        col = F.col(c)
        nn = col.isNotNull()
        aggs.extend(
            [
                F.sum(F.when(nn & col.try_cast("bigint").isNull(), 1).otherwise(0)).alias(f"{c}!long"),
                F.sum(F.when(nn & col.try_cast("double").isNull(), 1).otherwise(0)).alias(f"{c}!double"),
                F.sum(F.when(nn & col.try_cast("boolean").isNull(), 1).otherwise(0)).alias(f"{c}!bool"),
                F.sum(F.when(nn, 1).otherwise(0)).alias(f"{c}!n"),
            ]
        )
    stats = df.agg(*aggs).collect()[0].asDict()
    casts = {}
    for c in str_cols:
        if not stats[f"{c}!n"]:
            continue
        if stats[f"{c}!long"] == 0:
            casts[c] = "bigint"
        elif stats[f"{c}!double"] == 0:
            casts[c] = "double"
        elif stats[f"{c}!bool"] == 0:
            casts[c] = "boolean"
    if casts:
        df = df.withColumns({c: F.col(c).cast(t) for c, t in casts.items()})
    return df
