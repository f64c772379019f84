"""ORC file inspection / rewrite CLI — parity with the reference's
binary (`/root/reference/main/main.hs:20-27`):

    python scripts/orc_tool.py type      INPUT
    python scripts/orc_tool.py json      INPUT
    python scripts/orc_tool.py reencode  INPUT OUTPUT [--compression K]
    python scripts/orc_tool.py roundtrip INPUT OUTPUT [--compression K]
                                         [--chunk-size N]

- ``type``      prints the ORC type tree (Hive-style string) plus the
                file's stripe/row/compression summary
                (reference: `print (types f)`, main.hs:95-99).
- ``json``      streams rows as JSON lines, stripe-at-a-time (constant
                memory). Unions print as {"tag": t, "value": v} and
                maps as [{"key": k, "value": v}, ...], matching the
                reference's pretty-printer
                (src/Orc/Serial/Json/Logical.hs:49-75); binary is
                base64 (the reference escapes raw bytes — a JSON-clean
                deviation, documented here).
- ``reencode``  rewrites striped: each input stripe becomes one output
                stripe, only the compression changes
                (reference Rewrite, main.hs:85-89).
- ``roundtrip`` rewrites via the logical representation, re-chunking
                into ``--chunk-size``-row stripes
                (reference RoundTrip, main.hs:91-93).
"""

from __future__ import annotations

import argparse
import base64
import datetime
import decimal
import json
import sys


_KIND_STR = {
    "BOOLEAN": "boolean", "BYTE": "tinyint", "SHORT": "smallint",
    "INT": "int", "LONG": "bigint", "FLOAT": "float",
    "DOUBLE": "double", "STRING": "string", "BINARY": "binary",
    "TIMESTAMP": "timestamp", "TIMESTAMP_INSTANT":
    "timestamp with local time zone", "DATE": "date",
}


def type_string(types: list[dict], tid: int = 0) -> str:
    """footer['types'] -> Hive-style type string (the form `orc-tools
    meta` and Hive DDL print)."""
    from orc_haskell_spark.orcfile import proto

    t = types[tid]
    kind = proto.KIND_NAME[t.get("kind", 0)]
    if kind == "STRUCT":
        inner = ",".join(
            f"{n}:{type_string(types, s)}"
            for n, s in zip(t.get("fieldNames", []), t.get("subtypes", [])))
        return f"struct<{inner}>"
    if kind == "LIST":
        return f"array<{type_string(types, t['subtypes'][0])}>"
    if kind == "MAP":
        return (f"map<{type_string(types, t['subtypes'][0])},"
                f"{type_string(types, t['subtypes'][1])}>")
    if kind == "UNION":
        inner = ",".join(type_string(types, s)
                         for s in t.get("subtypes", []))
        return f"uniontype<{inner}>"
    if kind == "DECIMAL":
        return f"decimal({t.get('precision', 38)},{t.get('scale', 10)})"
    if kind == "VARCHAR":
        return f"varchar({t.get('maximumLength', 0)})"
    if kind == "CHAR":
        return f"char({t.get('maximumLength', 0)})"
    return _KIND_STR.get(kind, kind.lower())


def _jsonable(v, t):
    """Arrow to_pylist value -> JSON-clean python, guided by the type."""
    import pyarrow as pa

    if v is None:
        return None
    if pa.types.is_struct(t):
        return {f.name: _jsonable(v.get(f.name), f.type) for f in t}
    if pa.types.is_map(t):
        return [{"key": _jsonable(k, t.key_type),
                 "value": _jsonable(val, t.item_type)} for k, val in v]
    if pa.types.is_list(t) or pa.types.is_large_list(t):
        return [_jsonable(x, t.value_type) for x in v]
    if isinstance(v, bytes):
        return base64.b64encode(v).decode("ascii")
    if isinstance(v, (datetime.datetime, datetime.date)):
        return v.isoformat()
    if isinstance(v, decimal.Decimal):
        return str(v)
    return v


def _contains_union(t) -> bool:
    import pyarrow as pa

    if pa.types.is_union(t):
        return True
    if pa.types.is_struct(t):
        return any(_contains_union(f.type) for f in t)
    if pa.types.is_list(t) or pa.types.is_large_list(t):
        return _contains_union(t.value_type)
    if pa.types.is_map(t):
        return _contains_union(t.key_type) or _contains_union(t.item_type)
    return False


def _scalar_json(sc):
    """Scalar walk preserving union tags at ANY nesting depth (the
    to_pylist fast path drops them — it yields the bare value)."""
    import pyarrow as pa

    t = sc.type
    if not sc.is_valid:
        return None
    if pa.types.is_union(t):
        v = sc.value
        return {"tag": sc.type_code,
                "value": _scalar_json(v) if v is not None else None}
    if pa.types.is_struct(t):
        return {f.name: _scalar_json(sc[f.name]) for f in t}
    if pa.types.is_list(t) or pa.types.is_large_list(t):
        return [_scalar_json(x) for x in sc]
    if pa.types.is_map(t):
        entries = sc.values            # StructArray of (key, value)
        return [{"key": _scalar_json(entries.field(0)[i]),
                 "value": _scalar_json(entries.field(1)[i])}
                for i in range(len(entries))]
    return _jsonable(sc.as_py(), t)


def _column_json(arr):
    """One column -> list of JSON-clean values; union-containing types
    take the scalar walk (tags survive at any depth), everything else
    the vectorized to_pylist path."""
    t = arr.type
    if _contains_union(t):
        return [_scalar_json(sc) for sc in arr]
    return [_jsonable(v, t) for v in arr.to_pylist()]


def cmd_type(args) -> None:
    from orc_haskell_spark.orcfile.reader import ORCFile

    f = ORCFile(args.input)
    print(type_string(f.footer["types"]))
    print(f"rows: {f.num_rows}  stripes: {len(f.stripes)}  "
          f"compression: {f.compression}", file=sys.stderr)


def cmd_json(args) -> None:
    from orc_haskell_spark.orcfile.reader import ORCFile

    f = ORCFile(args.input)
    w = sys.stdout
    for i in range(len(f.stripes)):
        b = f.read_stripe(i)
        cols = [_column_json(b.column(j)) for j in range(b.num_columns)]
        names = b.schema.names
        for row in range(b.num_rows):
            w.write(json.dumps(
                {n: c[row] for n, c in zip(names, cols)},
                separators=(", ", ": "), ensure_ascii=False))
            w.write("\n")


def _rewrite(args, chunk_rows: int | None) -> None:
    from orc_haskell_spark.orcfile.reader import ORCFile
    from orc_haskell_spark.orcfile.writer import write_orc

    f = ORCFile(args.input)
    comp = (args.compression or f.compression).upper()
    if chunk_rows is None:
        # stripe-preserving: one input stripe -> one output stripe,
        # exactly (rechunk=False bypasses the merge of small stripes)
        summary = write_orc(
            (f.read_stripe(i) for i in range(len(f.stripes))),
            args.output, compression=comp, schema=f.schema,
            rechunk=False)
    else:
        summary = write_orc(
            (f.read_stripe(i) for i in range(len(f.stripes))),
            args.output, compression=comp, stripe_rows=chunk_rows,
            stripe_bytes=64 << 20, schema=f.schema)
    print(f"wrote {summary['rows']} rows in {summary['stripes']} "
          f"stripe(s), {summary['bytes']} bytes, {comp}",
          file=sys.stderr)


def main(argv=None) -> None:
    ap = argparse.ArgumentParser(
        prog="orc_tool", description=__doc__,
        formatter_class=argparse.RawDescriptionHelpFormatter)
    sub = ap.add_subparsers(dest="cmd", required=True)
    p_type = sub.add_parser("type", help="print the ORC type tree")
    p_type.add_argument("input")
    p_json = sub.add_parser("json", help="print rows as JSON lines")
    p_json.add_argument("input")
    comps = ["none", "snappy", "zlib", "zstd", "lz4"]
    p_re = sub.add_parser("reencode",
                          help="stripe-preserving compression rewrite")
    p_re.add_argument("input")
    p_re.add_argument("output")
    p_re.add_argument("--compression", choices=comps, default=None)
    p_rt = sub.add_parser("roundtrip",
                          help="rewrite via logical rows, re-chunked")
    p_rt.add_argument("input")
    p_rt.add_argument("output")
    p_rt.add_argument("--compression", choices=comps, default=None)
    p_rt.add_argument("--chunk-size", type=int, default=10000)
    args = ap.parse_args(argv)
    try:
        if args.cmd == "type":
            cmd_type(args)
        elif args.cmd == "json":
            cmd_json(args)
        elif args.cmd == "reencode":
            _rewrite(args, None)
        else:
            _rewrite(args, args.chunk_size)
    except BrokenPipeError:             # `orc_tool json f | head` is fine
        import os

        # point stdout's fd at devnull BEFORE interpreter exit: the
        # final flush of the buffered remainder would otherwise hit
        # EPIPE again and CPython exits 120 instead of 0
        devnull = os.open(os.devnull, os.O_WRONLY)
        os.dup2(devnull, sys.stdout.fileno())
        sys.exit(0)


if __name__ == "__main__":
    import os

    sys.path.insert(0, os.path.dirname(
        os.path.dirname(os.path.abspath(__file__))))
    main()
