"""Minimal Apache Avro container-file codec (pure Python, no avro lib).

Built for one purpose: Apache Iceberg table metadata. Iceberg stores
its manifest lists and manifest files as Avro object-container files
(public spec: https://avro.apache.org/docs/1.11.1/specification/), and
this sandbox ships no avro/fastavro — so `iceberg.py` carries its own
schema-driven reader, plus a writer used to build spec-shaped test
fixtures. Supported (everything the Iceberg manifest schemas use):

- types: null, boolean, int, long (zigzag varints), float, double,
  bytes, string, fixed, record, enum, array, map, union
- container: magic ``Obj\\x01``, file-metadata map (avro.schema JSON +
  avro.codec), 16-byte sync marker, data blocks
- codecs: null, deflate (raw zlib, the two every implementation must
  support)

The varint/zigzag wire format is the same one the ORC codecs implement
(`codecs/varint.py`, `codecs/zigzag.py`); values here are decoded
scalar-at-a-time because Avro records interleave fields (row-oriented),
unlike ORC's columnar streams — these files are a few KB of metadata,
never the data path.
"""

from __future__ import annotations

import io
import json
import os
import struct
import zlib

_MAGIC = b"Obj\x01"


# ---------------------------------------------------------------------------
# primitive wire codec


def _read_long(buf: io.BytesIO) -> int:
    shift = 0
    acc = 0
    while True:
        b = buf.read(1)
        if not b:
            raise ValueError("truncated Avro varint")
        acc |= (b[0] & 0x7F) << shift
        if not b[0] & 0x80:
            break
        shift += 7
        if shift > 70:
            raise ValueError("Avro varint too long")
    return (acc >> 1) ^ -(acc & 1)          # unzigzag


def _write_long(out: bytearray, v: int) -> None:
    u = (v << 1) ^ (v >> 63) if v < 0 else v << 1
    u &= (1 << 64) - 1
    while True:
        b = u & 0x7F
        u >>= 7
        if u:
            out.append(b | 0x80)
        else:
            out.append(b)
            return


def _read_bytes(buf: io.BytesIO) -> bytes:
    n = _read_long(buf)
    if n < 0:
        raise ValueError("negative Avro bytes length")
    data = buf.read(n)
    if len(data) != n:
        raise ValueError("truncated Avro bytes")
    return data


# ---------------------------------------------------------------------------
# schema-driven value codec


def _named(schema):
    """Resolve the schema 'type' discriminator."""
    if isinstance(schema, str):
        return schema
    if isinstance(schema, list):
        return "union"
    return schema["type"]


_PRIMITIVES = {"null", "boolean", "int", "long", "float", "double",
               "bytes", "string"}


def resolve_named(schema, names: dict | None = None):
    """Inline named-type references (Avro allows ``"r102"`` to refer to
    a record/enum/fixed defined earlier — Iceberg's Java writer does
    this for repeated partition-record types). Returns an equivalent
    schema with every reference replaced by its definition."""
    if names is None:
        names = {}
    if isinstance(schema, str):
        if schema in _PRIMITIVES:
            return schema
        if schema in names:
            return names[schema]
        raise ValueError(f"unresolved Avro named type {schema!r}")
    if isinstance(schema, list):
        return [resolve_named(s, names) for s in schema]
    t = schema["type"]
    if t in ("record", "enum", "fixed"):
        out = dict(schema)
        names[schema["name"]] = out
        if "namespace" in schema:
            names[schema["namespace"] + "." + schema["name"]] = out
        if t == "record":
            out["fields"] = [
                {**f, "type": resolve_named(f["type"], names)}
                for f in schema["fields"]]
        return out
    if t == "array":
        return {**schema, "items": resolve_named(schema["items"], names)}
    if t == "map":
        return {**schema, "values": resolve_named(schema["values"], names)}
    if isinstance(t, (dict, list)):      # {"type": {...complex...}}
        return resolve_named(t, names)
    return schema


def read_value(buf: io.BytesIO, schema):
    t = _named(schema)
    if t == "null":
        return None
    if t == "boolean":
        b = buf.read(1)
        if not b:
            raise ValueError("truncated Avro boolean")
        return b[0] != 0
    if t in ("int", "long"):
        return _read_long(buf)
    if t == "float":
        b = buf.read(4)
        if len(b) != 4:
            raise ValueError("truncated Avro float")
        return struct.unpack("<f", b)[0]
    if t == "double":
        b = buf.read(8)
        if len(b) != 8:
            raise ValueError("truncated Avro double")
        return struct.unpack("<d", b)[0]
    if t == "bytes":
        return _read_bytes(buf)
    if t == "string":
        return _read_bytes(buf).decode("utf-8")
    if t == "fixed":
        data = buf.read(schema["size"])
        if len(data) != schema["size"]:
            raise ValueError("truncated Avro fixed")
        return data
    if t == "enum":
        idx = _read_long(buf)
        symbols = schema["symbols"]
        if not 0 <= idx < len(symbols):
            raise ValueError(f"Avro enum index {idx} out of range")
        return symbols[idx]
    if t == "union":
        idx = _read_long(buf)
        branches = schema if isinstance(schema, list) else schema["types"]
        if not 0 <= idx < len(branches):
            raise ValueError(f"Avro union branch {idx} out of range")
        return read_value(buf, branches[idx])
    if t == "record":
        return {f["name"]: read_value(buf, f["type"])
                for f in schema["fields"]}
    if t == "array":
        out = []
        while True:
            n = _read_long(buf)
            if n == 0:
                return out
            if n < 0:           # block with byte-size prefix
                n = -n
                _read_long(buf)
            for _ in range(n):
                out.append(read_value(buf, schema["items"]))
    if t == "map":
        out = {}
        while True:
            n = _read_long(buf)
            if n == 0:
                return out
            if n < 0:
                n = -n
                _read_long(buf)
            for _ in range(n):
                k = _read_bytes(buf).decode("utf-8")
                out[k] = read_value(buf, schema["values"])
    raise NotImplementedError(f"Avro type {t!r}")


def write_value(out: bytearray, schema, value) -> None:
    t = _named(schema)
    if t == "null":
        return
    if t == "boolean":
        out.append(1 if value else 0)
        return
    if t in ("int", "long"):
        _write_long(out, int(value))
        return
    if t == "float":
        out.extend(struct.pack("<f", value))
        return
    if t == "double":
        out.extend(struct.pack("<d", value))
        return
    if t == "bytes":
        _write_long(out, len(value))
        out.extend(value)
        return
    if t == "string":
        enc = value.encode("utf-8")
        _write_long(out, len(enc))
        out.extend(enc)
        return
    if t == "fixed":
        if len(value) != schema["size"]:
            raise ValueError("fixed size mismatch")
        out.extend(value)
        return
    if t == "enum":
        _write_long(out, schema["symbols"].index(value))
        return
    if t == "union":
        branches = schema if isinstance(schema, list) else schema["types"]
        for i, br in enumerate(branches):
            if _matches(br, value):
                _write_long(out, i)
                write_value(out, br, value)
                return
        raise ValueError(f"no union branch for {value!r}")
    if t == "record":
        for f in schema["fields"]:
            if f["name"] not in value and "default" not in f:
                raise ValueError(f"missing record field {f['name']}")
            write_value(out, f["type"], value.get(f["name"],
                                                 f.get("default")))
        return
    if t == "array":
        if value:
            _write_long(out, len(value))
            for v in value:
                write_value(out, schema["items"], v)
        _write_long(out, 0)
        return
    if t == "map":
        if value:
            _write_long(out, len(value))
            for k, v in value.items():
                enc = k.encode("utf-8")
                _write_long(out, len(enc))
                out.extend(enc)
                write_value(out, schema["values"], v)
        _write_long(out, 0)
        return
    raise NotImplementedError(f"Avro type {t!r}")


def _matches(schema, value) -> bool:
    t = _named(schema)
    if t == "null":
        return value is None
    if value is None:
        return False
    if t == "boolean":
        return isinstance(value, bool)
    if t in ("int", "long"):
        return isinstance(value, int) and not isinstance(value, bool)
    if t in ("float", "double"):
        return isinstance(value, float)
    if t in ("bytes", "fixed"):
        return isinstance(value, (bytes, bytearray))
    if t in ("string", "enum"):
        return isinstance(value, str)
    if t == "record":
        return isinstance(value, dict)
    if t == "array":
        return isinstance(value, list)
    if t == "map":
        return isinstance(value, dict)
    return False


# ---------------------------------------------------------------------------
# container files


def read_container(payload: bytes) -> tuple[dict, list]:
    """Decode an Avro object-container file.

    Returns (file_metadata, records); file_metadata values are bytes
    except ``avro.schema`` which is parsed to the schema object.
    """
    buf = io.BytesIO(payload)
    if buf.read(4) != _MAGIC:
        raise ValueError("not an Avro container (bad magic)")
    meta_schema = {"type": "map", "values": "bytes"}
    meta = read_value(buf, meta_schema)
    sync = buf.read(16)
    if len(sync) != 16:
        raise ValueError("truncated Avro header")
    codec = meta.get("avro.codec", b"null").decode()
    if codec not in ("null", "deflate"):
        raise NotImplementedError(f"Avro codec {codec!r}")
    schema = resolve_named(json.loads(meta["avro.schema"].decode("utf-8")))
    records = []
    while True:
        head = buf.read(1)
        if not head:
            break
        buf.seek(-1, 1)
        count = _read_long(buf)
        size = _read_long(buf)
        block = buf.read(size)
        if len(block) != size:
            raise ValueError("truncated Avro block")
        if buf.read(16) != sync:
            raise ValueError("Avro sync marker mismatch")
        if codec == "deflate":
            block = zlib.decompress(block, -15)
        bbuf = io.BytesIO(block)
        for _ in range(count):
            records.append(read_value(bbuf, schema))
        if bbuf.read(1):
            raise ValueError("Avro block has trailing bytes")
    out_meta = dict(meta)
    out_meta["avro.schema"] = schema
    return out_meta, records


def write_container(schema, records, codec: str = "deflate",
                    extra_meta: dict | None = None,
                    sync: bytes | None = None) -> bytes:
    """Encode records as an Avro object-container file (one block)."""
    if codec not in ("null", "deflate"):
        raise NotImplementedError(f"Avro codec {codec!r}")
    wire_schema = schema             # references stay references on disk
    schema = resolve_named(schema)
    # deterministic sync marker (fixtures must be byte-stable run-to-run)
    if sync is None:
        import hashlib
        sync = hashlib.md5(json.dumps(schema, sort_keys=True)
                           .encode()).digest()
    body = bytearray()
    for r in records:
        write_value(body, schema, r)
    block = bytes(body)
    if codec == "deflate":
        block = zlib.compress(block, 6)[2:-4]   # raw deflate
    out = bytearray(_MAGIC)
    meta = {"avro.schema": json.dumps(wire_schema).encode(),
            "avro.codec": codec.encode()}
    for k, v in (extra_meta or {}).items():
        meta[k] = v if isinstance(v, bytes) else str(v).encode()
    write_value(out, {"type": "map", "values": "bytes"}, meta)
    out.extend(sync)
    _write_long(out, len(records))
    _write_long(out, len(block))
    out.extend(block)
    out.extend(sync)
    return bytes(out)


def read_container_file(path: str) -> tuple[dict, list]:
    with open(path, "rb") as f:
        return read_container(f.read())


def write_container_file(path: str, schema, records,
                         codec: str = "deflate",
                         extra_meta: dict | None = None) -> int:
    blob = write_container(schema, records, codec, extra_meta)
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        f.write(blob)
    os.replace(tmp, path)
    return len(blob)
