"""Pure-Python distributed Avro reader (+ minimal writer for tests).

The reference reads Avro natively (cpp/src/io/avro/, ~4k LoC of decode
kernels; cpp/include/cudf/io/avro.hpp:217). Spark's own `spark-avro`
datasource module is a separate jar that is absent from this environment,
so this module implements the Avro Object Container File spec (public:
https://avro.apache.org/docs/current/specification/) directly:

* files are listed and shipped by Spark's ``binaryFile`` source — one
  task per file, so a directory of Avro part-files decodes in parallel
  across the cluster exactly like any multi-file scan;
* each task parses the header (magic, metadata map with embedded JSON
  schema, 16-byte sync marker) and walks the sync-delimited blocks,
  decoding zigzag-varint primitives per the spec — no row-at-a-time
  Python UDF: decoding happens inside one Arrow ``mapInPandas`` pass;
* ``null`` and ``deflate`` codecs via the stdlib, ``snappy`` via pyarrow.

Scope (documented): top-level record schemas over the primitive types
null/boolean/int/long/float/double/bytes/string plus nullable unions
(["null", T]). Nested records/arrays/maps raise NotImplementedError —
the decode loop is the extension point. Within-file block parallelism is
not implemented (one task per file; Avro part-file layouts at scale are
many-file, so file-level parallelism is the one that matters).
"""

from __future__ import annotations

import io
import json
import struct
import zlib

from pyspark.sql import DataFrame, SparkSession

MAGIC = b"Obj\x01"

_PRIMITIVE_TO_SPARK = {
    "boolean": "boolean",
    "int": "int",
    "long": "long",
    "float": "float",
    "double": "double",
    "bytes": "binary",
    "string": "string",
}


def _read_varint(buf: io.BytesIO) -> int:
    shift, acc = 0, 0
    while True:
        b = buf.read(1)
        if not b:
            raise EOFError("truncated varint")
        acc |= (b[0] & 0x7F) << shift
        if not b[0] & 0x80:
            return acc
        shift += 7


def _read_long(buf: io.BytesIO) -> int:
    n = _read_varint(buf)
    return (n >> 1) ^ -(n & 1)  # zigzag


def _read_bytes(buf: io.BytesIO) -> bytes:
    return buf.read(_read_long(buf))


def _field_type(t):
    """Normalize a field's schema: returns (type_name, nullable)."""
    if isinstance(t, list):  # union — only ["null", T] supported
        non_null = [x for x in t if x != "null"]
        if len(non_null) != 1 or not isinstance(non_null[0], str):
            raise NotImplementedError(f"unsupported union {t!r}")
        return non_null[0], True
    if isinstance(t, str):
        return t, False
    raise NotImplementedError(f"unsupported avro type {t!r}")


def _decode_value(buf: io.BytesIO, type_name: str):
    if type_name == "boolean":
        return buf.read(1) == b"\x01"
    if type_name in ("int", "long"):
        return _read_long(buf)
    if type_name == "float":
        return struct.unpack("<f", buf.read(4))[0]
    if type_name == "double":
        return struct.unpack("<d", buf.read(8))[0]
    if type_name == "bytes":
        return _read_bytes(buf)
    if type_name == "string":
        return _read_bytes(buf).decode("utf-8")
    if type_name == "null":
        return None
    raise NotImplementedError(f"unsupported avro type {type_name!r}")


def _parse_header(buf: io.BytesIO):
    if buf.read(4) != MAGIC:
        raise ValueError("not an Avro object container file")
    meta: dict[str, bytes] = {}
    while True:
        n = _read_long(buf)
        if n == 0:
            break
        if n < 0:  # negative block count: abs count + byte size follows
            n = -n
            _read_long(buf)
        for _ in range(n):
            key = _read_bytes(buf).decode("utf-8")
            meta[key] = _read_bytes(buf)
    sync = buf.read(16)
    schema = json.loads(meta["avro.schema"].decode("utf-8"))
    codec = meta.get("avro.codec", b"null").decode("utf-8")
    return schema, codec, sync


def _decompress(block: bytes, codec: str) -> bytes:
    if codec == "null":
        return block
    if codec == "deflate":
        return zlib.decompress(block, -15)  # raw deflate per spec
    if codec == "snappy":
        import pyarrow as pa

        return pa.Codec("snappy").decompress(block[:-4]).to_pybytes()  # crc32 tail
    raise NotImplementedError(f"unsupported avro codec {codec!r}")


def _decode_file(content: bytes) -> tuple[list[tuple], list[str]]:
    buf = io.BytesIO(content)
    schema, codec, sync = _parse_header(buf)
    if schema.get("type") != "record":
        raise NotImplementedError("only top-level record schemas supported")
    fields = [(f["name"], *_field_type(f["type"])) for f in schema["fields"]]
    rows: list[tuple] = []
    while True:
        head = buf.read(1)
        if not head:
            break
        buf.seek(-1, 1)
        n_objects = _read_long(buf)
        block = _decompress(_read_bytes(buf), codec)
        if buf.read(16) != sync:
            raise ValueError("sync marker mismatch (corrupt block)")
        bbuf = io.BytesIO(block)
        for _ in range(n_objects):
            row = []
            for _name, tname, nullable in fields:
                if nullable:
                    branch = _read_long(bbuf)
                    row.append(None if branch == 0 else _decode_value(bbuf, tname))
                else:
                    row.append(_decode_value(bbuf, tname))
            rows.append(tuple(row))
    return rows, [f[0] for f in fields]


def avro_spark_schema(path: str) -> tuple[str, dict]:
    """DDL schema string from one file's header (driver-side peek; at
    cluster scale read the first part-file through the FileSystem API)."""
    with open(path, "rb") as fh:
        schema, _codec, _sync = _parse_header(io.BytesIO(fh.read(1 << 20)))
    parts = []
    for f in schema["fields"]:
        tname, _nullable = _field_type(f["type"])
        parts.append(f"`{f['name']}` {_PRIMITIVE_TO_SPARK[tname]}")
    return ", ".join(parts), schema


def read_avro(spark: SparkSession, path: str, *, schema_file: str) -> DataFrame:
    """Distributed Avro read: ``binaryFile`` listing + per-file decode in
    one Arrow ``mapInPandas`` pass. ``schema_file`` is any one part-file
    whose header defines the (homogeneous) schema."""
    ddl, _ = avro_spark_schema(schema_file)
    files = spark.read.format("binaryFile").load(path)

    def decode(batches):
        import pandas as pd

        for pdf in batches:
            for content in pdf["content"]:
                rows, names = _decode_file(bytes(content))
                yield pd.DataFrame(rows, columns=names)

    return files.select("content").mapInPandas(decode, schema=ddl)


# ------------------------- writer (tests / fixtures) -------------------------


def _zigzag(n: int) -> bytes:
    n = (n << 1) ^ (n >> 63)
    out = bytearray()
    while True:
        b = n & 0x7F
        n >>= 7
        if n:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def _encode_value(v, type_name: str) -> bytes:
    if type_name == "boolean":
        return b"\x01" if v else b"\x00"
    if type_name in ("int", "long"):
        return _zigzag(int(v))
    if type_name == "float":
        return struct.pack("<f", v)
    if type_name == "double":
        return struct.pack("<d", v)
    if type_name == "bytes":
        return _zigzag(len(v)) + bytes(v)
    if type_name == "string":
        enc = v.encode("utf-8")
        return _zigzag(len(enc)) + enc
    raise NotImplementedError(type_name)


def write_avro(rows, schema: dict, path: str, *, codec: str = "null") -> None:
    """Minimal single-block Avro writer (spec-conformant; for tests)."""
    fields = [(f["name"], *_field_type(f["type"])) for f in schema["fields"]]
    body = bytearray()
    for row in rows:
        for (name, tname, nullable) in fields:
            v = row[name] if isinstance(row, dict) else getattr(row, name)
            if nullable:
                if v is None:
                    body += _zigzag(0)
                    continue
                body += _zigzag(1)
            body += _encode_value(v, tname)
    block = bytes(body)
    if codec == "deflate":
        comp = zlib.compressobj(9, zlib.DEFLATED, -15)
        block = comp.compress(block) + comp.flush()
    elif codec != "null":
        raise NotImplementedError(codec)
    sync = b"0123456789abcdef"  # any 16 bytes
    meta = {
        "avro.schema": json.dumps(schema).encode(),
        "avro.codec": codec.encode(),
    }
    out = bytearray(MAGIC)
    out += _zigzag(len(meta))
    for k, v in meta.items():
        ke = k.encode()
        out += _zigzag(len(ke)) + ke + _zigzag(len(v)) + v
    out += _zigzag(0)
    out += sync
    out += _zigzag(len(rows)) + _zigzag(len(block)) + block + sync
    with open(path, "wb") as fh:
        fh.write(bytes(out))
