"""Pure-Python ORC v1 file writer over the engine's codec kernels.

Produces real .orc files readable by the C++ ORC implementation
(pyarrow) — the strongest possible oracle for the encode kernels: every
RLEv2 sub-mode (short-repeat / direct / patched-base / delta), byte-RLE,
bit-packed booleans, string DIRECT_V2 / sorted DICTIONARY_V2, timestamp
second+nano split and decimal varints are decoded by an independent
implementation, not our own mirror decoder.

The reference only READS ORC files plus re-serializes logical tables
(/root/reference/src/Orc/Serial/Binary/Base.hs, putOrcFile in
Striped.hs:700-800); a conforming writer is strictly more than parity.

Layout written: "ORC" header, stripes (data streams + stripe footer;
row indexes disabled via rowIndexStride=0), file footer with minimal
per-column statistics, postscript, postscript length byte.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from orc_haskell_spark.codecs import byte_rle, rle2, varint
from orc_haskell_spark.codecs.bitpack import pack_bools
from orc_haskell_spark.codecs.strings import (dictionary_encode_sorted,
                                              string_parts)
from . import proto
from .compression import compress_stream
from .reader import ORC_EPOCH_SECONDS

MAGIC = b"ORC"


# ------------------------------------------------------------- schema

def _build_types(schema_or_type, types: list[dict]) -> int:
    """Append the ORC Type tree (pre-order) and return this node's id."""
    my_id = len(types)
    t: dict = {}
    types.append(t)

    if isinstance(schema_or_type, pa.Schema):
        t["kind"] = proto.KIND["STRUCT"]
        t["subtypes"], t["fieldNames"] = [], []
        for field in schema_or_type:
            t["fieldNames"].append(field.name)
            t["subtypes"].append(_build_types(field.type, types))
        return my_id

    typ = schema_or_type
    if pa.types.is_boolean(typ):
        t["kind"] = proto.KIND["BOOLEAN"]
    elif pa.types.is_int8(typ):
        t["kind"] = proto.KIND["BYTE"]
    elif pa.types.is_int16(typ):
        t["kind"] = proto.KIND["SHORT"]
    elif pa.types.is_int32(typ):
        t["kind"] = proto.KIND["INT"]
    elif pa.types.is_int64(typ):
        t["kind"] = proto.KIND["LONG"]
    elif pa.types.is_float32(typ):
        t["kind"] = proto.KIND["FLOAT"]
    elif pa.types.is_float64(typ):
        t["kind"] = proto.KIND["DOUBLE"]
    elif pa.types.is_string(typ) or pa.types.is_large_string(typ):
        t["kind"] = proto.KIND["STRING"]
    elif pa.types.is_binary(typ) or pa.types.is_large_binary(typ):
        t["kind"] = proto.KIND["BINARY"]
    elif pa.types.is_timestamp(typ):
        t["kind"] = proto.KIND[
            "TIMESTAMP_INSTANT" if typ.tz else "TIMESTAMP"]
    elif pa.types.is_date32(typ):
        t["kind"] = proto.KIND["DATE"]
    elif pa.types.is_decimal128(typ):
        t["kind"] = proto.KIND["DECIMAL"]
        t["precision"], t["scale"] = typ.precision, typ.scale
    elif pa.types.is_list(typ):
        t["kind"] = proto.KIND["LIST"]
        t["subtypes"] = [_build_types(typ.value_type, types)]
    elif pa.types.is_map(typ):
        t["kind"] = proto.KIND["MAP"]
        t["subtypes"] = [_build_types(typ.key_type, types),
                         _build_types(typ.item_type, types)]
    elif pa.types.is_struct(typ):
        t["kind"] = proto.KIND["STRUCT"]
        t["subtypes"], t["fieldNames"] = [], []
        for field in typ:
            t["fieldNames"].append(field.name)
            t["subtypes"].append(_build_types(field.type, types))
    elif pa.types.is_union(typ):
        t["kind"] = proto.KIND["UNION"]
        t["subtypes"] = [_build_types(field.type, types) for field in typ]
    else:
        raise NotImplementedError(f"arrow type {typ} not writable to ORC")
    return my_id


# ------------------------------------------------------------ encoding

def _zigzag_varint_bytes(values) -> bytes:
    """Unbounded zigzag base-128 varints (python ints, any magnitude)."""
    out = bytearray()
    for v in values:
        z = (v << 1) if v >= 0 else ((-v << 1) - 1)
        while True:
            b = z & 0x7F
            z >>= 7
            if z:
                out.append(b | 0x80)
            else:
                out.append(b)
                break
    return bytes(out)


def _encode_nanos_signed(nanos: np.ndarray) -> np.ndarray:
    """Signed variant of the nano zero-suppression packing: strip
    trailing decimal zeros from |n|, keep the sign on the shifted base
    (two's complement travels through the 'unsigned' RLE unchanged,
    exactly like the C++ writer)."""
    n = np.ascontiguousarray(nanos, dtype=np.int64)
    mag = np.abs(n)
    stripped = mag.copy()
    zeros = np.zeros(n.shape, dtype=np.int64)
    for _ in range(9):
        m = (stripped != 0) & (stripped % 10 == 0)
        if not m.any():
            break
        stripped[m] //= 10
        zeros[m] += 1
    signed_base = np.where(n < 0, -stripped, stripped)
    out = np.where(zeros > 1, (signed_base << 3) | (zeros - 1), n << 3)
    out[n == 0] = 0
    return out


class _ColumnWriter:
    """Encodes one stripe's worth of one column subtree."""

    def __init__(self, types: list[dict], dict_ratio: float = 0.5):
        self.types = types
        self.dict_ratio = dict_ratio
        self.streams: list[tuple[int, str, bytes]] = []  # (col, kind, raw)
        self.encodings: dict[int, dict] = {}
        self.stats: dict[int, dict] = {}  # per-column ColumnStatistics

    def _put(self, col: int, kind: str, data: bytes) -> None:
        # zero-length streams MUST still be declared: the C++ reader
        # aborts with "DATA/LENGTH stream not found" on all-null or
        # all-empty columns otherwise (found by subprocess fuzzing)
        self.streams.append((col, kind, data))

    def _set_enc(self, col: int, name: str, dict_size: int = 0) -> None:
        e: dict = {"kind": proto.ENCODING[name]}
        if dict_size:
            e["dictionarySize"] = dict_size
        self.encodings[col] = e

    def write(self, col: int, arr: pa.Array) -> None:
        arr = arr.combine_chunks() if isinstance(arr, pa.ChunkedArray) else arr
        kind = proto.KIND_NAME[self.types[col].get("kind", 0)]
        # stats are recorded on the array AS WRITTEN at this node (struct
        # children arrive already filtered by parent validity), so nested
        # columns get true value counts and hasNull — third-party readers
        # (e.g. Trino) prune stripes on these
        self.stats[col] = _col_stats(arr, arr.type)
        has_nulls = arr.null_count > 0
        valid = None
        if has_nulls:
            valid = np.asarray(arr.is_valid())
            self._put(col, "PRESENT",
                      byte_rle.encode(np.frombuffer(pack_bools(valid),
                                                    np.uint8)))
        self._set_enc(col, "DIRECT_V2" if kind in (
            "STRING", "BINARY") else "DIRECT")
        dense = arr.drop_null() if has_nulls else arr

        if kind == "STRUCT":
            self._set_enc(col, "DIRECT")
            for i, sub in enumerate(self.types[col].get("subtypes", [])):
                child = arr.field(i)
                if has_nulls:
                    child = child.filter(pa.array(valid))
                self.write(sub, child)
            return

        if kind == "UNION":
            # ORC union: DIRECT encoding, DATA = positional tag bytes,
            # children carry their rows in order (dense-ified)
            self._set_enc(col, "DIRECT")
            tags = np.asarray(arr.type_codes, dtype=np.int8)
            code_to_pos = {int(c): i for i, c in enumerate(arr.type.type_codes)}
            pos_tags = np.array([code_to_pos[int(c)] for c in tags],
                                dtype=np.uint8) if len(tags) else \
                np.zeros(0, np.uint8)
            self._put(col, "DATA", byte_rle.encode(pos_tags))
            dense_mode = arr.type.mode == "dense"
            offsets = (np.asarray(arr.offsets, dtype=np.int64)
                       if dense_mode else None)
            for i, sub in enumerate(self.types[col].get("subtypes", [])):
                code = arr.type.type_codes[i]
                sel = tags == np.int8(code)
                if dense_mode:
                    child = arr.field(i).take(pa.array(offsets[sel]))
                else:
                    child = arr.field(i).filter(pa.array(sel))
                self.write(sub, child)
            return

        if kind in ("LIST", "MAP"):
            self._set_enc(col, "DIRECT_V2")
            offs = np.asarray(dense.offsets)
            lengths = np.diff(offs.astype(np.int64))
            self._put(col, "LENGTH",
                      rle2.encode(lengths.astype(np.int64), False))
            if kind == "LIST":
                self.write(self.types[col]["subtypes"][0], dense.flatten())
            else:
                # MapArray.keys/.items ignore the array's slice window
                # (unlike ListArray.flatten): a per-stripe slice of a
                # map column would silently write stripe 1's entries
                # into every stripe. offsets are always logical into
                # the child, so the [first, last) window is the fix.
                lo = int(offs[0]) if len(offs) else 0
                hi = int(offs[-1]) if len(offs) else 0
                self.write(self.types[col]["subtypes"][0],
                           dense.keys.slice(lo, hi - lo))
                self.write(self.types[col]["subtypes"][1],
                           dense.items.slice(lo, hi - lo))
            return

        if kind == "BOOLEAN":
            self._set_enc(col, "DIRECT")
            bits = np.asarray(dense, dtype=bool)
            self._put(col, "DATA",
                      byte_rle.encode(np.frombuffer(pack_bools(bits),
                                                    np.uint8)))
            return

        if kind == "BYTE":
            self._set_enc(col, "DIRECT")
            vals = np.asarray(dense, dtype=np.int8).view(np.uint8)
            self._put(col, "DATA", byte_rle.encode(vals))
            return

        if kind in ("SHORT", "INT", "LONG"):
            self._set_enc(col, "DIRECT_V2")
            vals = np.asarray(dense.cast(pa.int64()), dtype=np.int64)
            self._put(col, "DATA", rle2.encode(vals, True))
            return

        if kind == "DATE":
            self._set_enc(col, "DIRECT_V2")
            days = np.asarray(dense.cast(pa.int32()), dtype=np.int64)
            self._put(col, "DATA", rle2.encode(days, True))
            return

        if kind in ("FLOAT", "DOUBLE"):
            self._set_enc(col, "DIRECT")
            dt = np.dtype("<f4") if kind == "FLOAT" else np.dtype("<f8")
            self._put(col, "DATA", np.asarray(dense, dtype=dt).tobytes())
            return

        if kind in ("TIMESTAMP", "TIMESTAMP_INSTANT"):
            self._set_enc(col, "DIRECT_V2")
            ns = np.asarray(
                dense.cast(pa.timestamp("ns", tz=dense.type.tz))
                .cast(pa.int64()), dtype=np.int64)
            # C++ writer convention (verified against pyarrow stream
            # dumps): seconds truncated TOWARD ZERO, nanos carry the
            # signed remainder. The C++ reader subtracts a second when
            # it sees negative seconds with POSITIVE nanos (Java-file
            # compat), so floor+positive-nanos files decode wrong —
            # trunc+signed is the only layout all readers agree on.
            secs = np.sign(ns) * (np.abs(ns) // 1_000_000_000)
            nanos = ns - secs * 1_000_000_000  # sign follows ns
            self._put(col, "DATA",
                      rle2.encode(secs - ORC_EPOCH_SECONDS, True))
            self._put(col, "SECONDARY",
                      rle2.encode(_encode_nanos_signed(nanos), False))
            return

        if kind in ("STRING", "BINARY"):
            base = pa.string() if kind == "STRING" else pa.binary()
            dense = dense.cast(base) if dense.type != base else dense
            n = len(dense)
            n_unique = pa.compute.count_distinct(dense).as_py() if n else 0
            if kind == "STRING" and n and n_unique / n <= self.dict_ratio:
                idx, dlens, ddata = dictionary_encode_sorted(dense)
                self._set_enc(col, "DICTIONARY_V2", dict_size=len(dlens))
                self._put(col, "DATA",
                          rle2.encode(idx.astype(np.int64), False))
                self._put(col, "DICTIONARY_DATA", ddata.tobytes())
                self._put(col, "LENGTH",
                          rle2.encode(dlens.astype(np.int64), False))
            else:
                self._set_enc(col, "DIRECT_V2")
                data, lens = string_parts(dense)
                self._put(col, "DATA", data.tobytes())
                self._put(col, "LENGTH", rle2.encode(lens, False))
            return

        if kind == "DECIMAL":
            self._set_enc(col, "DIRECT_V2")
            scale = self.types[col].get("scale", 0)
            precision = self.types[col].get("precision", 38)
            n = len(dense)
            if precision <= 18 and n:
                # mantissas fit int64: read them straight out of the
                # decimal128 storage (lo limb IS the value in two's
                # complement when |v| < 2^63) and emit zigzag varints
                # with the vectorized kernel — no per-row Python
                storage = np.frombuffer(
                    dense.buffers()[1], dtype="<i8",
                    count=2 * (dense.offset + n)).reshape(-1, 2)
                lo = storage[dense.offset:dense.offset + n, 0]
                z = (lo.astype(np.uint64) << np.uint64(1)) \
                    ^ (lo >> np.int64(63)).astype(np.uint64)
                data, _ = varint.encode_unsigned(z)
                self._put(col, "DATA", data)
            else:
                mantissas = [int(v.scaleb(scale))
                             for v in dense.to_pylist()]
                self._put(col, "DATA", _zigzag_varint_bytes(mantissas))
            self._put(col, "SECONDARY",
                      rle2.encode(np.full(len(dense), scale, np.int64),
                                  True))
            return

        raise NotImplementedError(f"ORC writer kind {kind}")


_INDEXABLE_KINDS = ("BOOLEAN", "BYTE", "SHORT", "INT", "LONG", "FLOAT",
                    "DOUBLE", "STRING", "BINARY", "TIMESTAMP",
                    "TIMESTAMP_INSTANT", "DATE", "DECIMAL")


def _indexed_column(types: list[dict], col: int, arr, stride: int,
                    dict_ratio: float):
    """Encode one primitive top-level column with per-row-group
    RESTARTS: every stream starts a fresh run at each stride boundary,
    so every ROW_INDEX position has zero run-carry skips (spec-valid —
    an RLE stream is just a run sequence — at ~2 bytes/group/stream
    ratio cost). stride must be a multiple of 8 so PRESENT bits stay
    byte-aligned at boundaries.

    EXCEPTION: nullable BOOLEAN data. Its bit count per group is the
    group's NON-NULL count, which is not a multiple of 8, so per-group
    restarts would leave padding bits that shift every later value
    (readers consume the stream as one contiguous bitstream). That one
    stream is encoded whole-stripe instead, and its positions carry
    real byte/bit skips (entries[g]["skips"]["DATA"]).

    Returns (streams {kind: bytes}, encoding, column stats,
    entries [{"offsets": {kind: raw_offset},
              "skips": {kind: (byte_skip, bit_skip)}, "stats": ...}]
    per group).
    """
    import pyarrow.compute as pc

    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    kind = proto.KIND_NAME[types[col].get("kind", 0)]
    n = len(arr)
    starts = list(range(0, n, stride))
    has_nulls = arr.null_count > 0
    bufs: dict[str, bytearray] = {}
    entries: list[dict] = [{"offsets": {}, "skips": {}, "stats": None}
                           for _ in starts]

    def put(stream_kind: str, g: int, data: bytes) -> None:
        buf = bufs.setdefault(stream_kind, bytearray())
        entries[g]["offsets"][stream_kind] = len(buf)
        buf += data

    if has_nulls:
        valid = np.asarray(arr.is_valid())
        for g, s in enumerate(starts):
            bits = valid[s:s + stride]
            put("PRESENT", g,
                byte_rle.encode(np.frombuffer(pack_bools(bits), np.uint8)))

    dict_mode = False
    dense = None
    if kind == "STRING":
        dense = arr.drop_null() if has_nulls else arr
        if dense.type != pa.string():
            dense = dense.cast(pa.string())
        nu = pc.count_distinct(dense).as_py() if len(dense) else 0
        dict_mode = len(dense) > 0 and nu / len(dense) <= dict_ratio
    if dict_mode:
        idx, dlens, ddata = dictionary_encode_sorted(dense)
        encoding = {"kind": proto.ENCODING["DICTIONARY_V2"],
                    "dictionarySize": len(dlens)}
        if has_nulls:
            counts = [int(valid[s:s + stride].sum()) for s in starts]
        else:
            counts = [min(stride, n - s) for s in starts]
        lo = 0
        for g, c in enumerate(counts):
            put("DATA", g, rle2.encode(idx[lo:lo + c].astype(np.int64),
                                       False))
            lo += c
        # dictionary streams are whole-stripe: never positioned
        bufs["DICTIONARY_DATA"] = bytearray(ddata.tobytes())
        bufs["LENGTH"] = bytearray(rle2.encode(dlens.astype(np.int64),
                                               False))
    elif kind == "BOOLEAN" and has_nulls:
        # see docstring EXCEPTION: one whole-stripe bitstream; positions
        # carry cumulative dense-bit skips instead of restart offsets
        encoding = {"kind": proto.ENCODING["DIRECT"]}
        bits = np.asarray(arr.drop_null(), dtype=bool)
        bufs["DATA"] = bytearray(
            byte_rle.encode(np.frombuffer(pack_bools(bits), np.uint8)))
        cum = 0
        for g, s in enumerate(starts):
            entries[g]["offsets"]["DATA"] = 0
            entries[g]["skips"]["DATA"] = (cum // 8, cum % 8)
            cum += int(valid[s:s + stride].sum())
    else:
        encoding = None
        for g, s in enumerate(starts):
            group = arr.slice(s, stride)
            sub = _ColumnWriter(types, dict_ratio=-1.0)  # force DIRECT
            sub.write(col, group.drop_null() if group.null_count
                      else group)
            encoding = sub.encodings[col]
            for _, k2, raw in sub.streams:
                if k2 == "PRESENT":
                    continue  # handled above with original validity
                put(k2, g, raw)
    for g, s in enumerate(starts):
        entries[g]["stats"] = _col_stats(arr.slice(s, stride), arr.type)
    return ({k: bytes(v) for k, v in bufs.items()}, encoding,
            _col_stats(arr, arr.type), entries)


def _entry_positions(kind: str, enc_kind: int, has_present: bool,
                     offsets: dict, posmap,
                     entry_skips: dict | None = None) -> list[int]:
    """RowIndexEntry.positions in the exact order C++ readers consume
    them (mirrors reader._seek_streams): PRESENT, DATA, then LENGTH /
    SECONDARY; RLE streams append a zero value-skip, bit-packed streams
    a zero byte-skip + zero bit-skip (restart boundaries carry none —
    except nullable BOOLEAN data, whose whole-stripe bitstream records
    real cumulative skips via ``entry_skips``)."""
    out: list[int] = []
    entry_skips = entry_skips or {}

    def add(stream_kind: str, skips: list[int]) -> None:
        out.extend(posmap(stream_kind, offsets.get(stream_kind, 0)))
        out.extend(entry_skips.get(stream_kind, skips))

    if has_present:
        add("PRESENT", [0, 0])
    if kind == "BOOLEAN":
        add("DATA", [0, 0])
    elif kind in ("BYTE", "SHORT", "INT", "LONG", "DATE"):
        add("DATA", [0])
    elif kind in ("FLOAT", "DOUBLE"):
        add("DATA", [])
    elif kind in ("TIMESTAMP", "TIMESTAMP_INSTANT"):
        add("DATA", [0])
        add("SECONDARY", [0])
    elif kind in ("STRING", "BINARY"):
        if enc_kind in (proto.ENCODING["DICTIONARY"],
                        proto.ENCODING["DICTIONARY_V2"]):
            add("DATA", [0])
        else:
            add("DATA", [])
            add("LENGTH", [0])
    elif kind == "DECIMAL":
        add("DATA", [])
        add("SECONDARY", [0])
    return out


def _col_stats(arr: pa.Array, col_type: pa.DataType) -> dict:
    """Min/max ColumnStatistics for scalar columns (enables stripe
    pruning in readers); counts only for nested types."""
    import pyarrow.compute as pc

    st: dict = {"numberOfValues": len(arr) - arr.null_count,
                "hasNull": 1 if arr.null_count else 0}
    try:
        if pa.types.is_integer(col_type) and len(arr) > arr.null_count:
            st["intStatistics"] = {
                "minimum": pc.min(arr).as_py(),
                "maximum": pc.max(arr).as_py()}
        elif pa.types.is_floating(col_type) and len(arr) > arr.null_count:
            # pc.min/max skip NaN, and Spark orders NaN above every
            # value: min/max stats excluding a present NaN would let a
            # pruning reader drop stripes whose only matches are NaN.
            # Omit the stats instead (never wrong, only less selective).
            if not pc.any(pc.is_nan(arr)).as_py():
                st["doubleStatistics"] = {
                    "minimum": float(pc.min(arr).as_py()),
                    "maximum": float(pc.max(arr).as_py())}
        elif (pa.types.is_string(col_type) or
              pa.types.is_large_string(col_type)) \
                and len(arr) > arr.null_count:
            mn, mx = pc.min(arr).as_py(), pc.max(arr).as_py()
            # cap stat payload: html/text bodies would otherwise embed
            # two full documents per column per stripe into the file
            # tail (truncation would need lowerBound/upperBound
            # semantics to stay prune-correct, so omit instead)
            if len(mn) <= 256 and len(mx) <= 256:
                st["stringStatistics"] = {"minimum": mn, "maximum": mx}
    except Exception:
        pass
    return st


def _merge_stats(agg: list, cs: list[dict]) -> None:
    """Fold one stripe's colStats into the running file-footer stats."""
    for i, s in enumerate(cs):
        a = agg[i]
        if a is None:
            agg[i] = {k: (dict(v) if isinstance(v, dict) else v)
                      for k, v in s.items()}
            continue
        a["numberOfValues"] = (a.get("numberOfValues", 0)
                               + s.get("numberOfValues", 0))
        a["hasNull"] = 1 if (a.get("hasNull") or s.get("hasNull")) else 0
        for key in ("intStatistics", "doubleStatistics", "stringStatistics"):
            if key in a and key in s:
                a[key]["minimum"] = min(a[key]["minimum"], s[key]["minimum"])
                a[key]["maximum"] = max(a[key]["maximum"], s[key]["maximum"])
            elif key in a:  # a later stripe had no values: drop min/max
                del a[key]


def write_raw_stripe(where, types: list[dict],
                     streams: list[tuple[int, str, bytes]],
                     encodings: dict[int, dict], n_rows: int,
                     compression: str = "NONE",
                     block_size: int = 256 * 1024) -> None:
    """Low-level escape hatch: write one stripe from hand-built streams.

    Exists for crafting spec-edge files Arrow cannot represent (e.g.
    UNION columns with null rows — Arrow unions carry no top-level
    validity) to cross-validate reader behavior against the C++
    implementation, and for fuzzing. ``types`` is the ORC Type list
    (pre-order), ``streams`` [(col, kind, raw_bytes)], ``encodings``
    {col: encoding dict}.
    """
    n_cols = len(types)
    out = open(where, "wb") if isinstance(where, str) else where
    try:
        buf = bytearray(MAGIC)
        offset = len(buf)
        stream_protos = []
        for col, kind, raw in streams:
            comp = compress_stream(raw, compression, block_size)
            stream_protos.append({"kind": proto.STREAM_KIND[kind],
                                  "column": col, "length": len(comp)})
            buf += comp
        data_len = len(buf) - offset
        sfoot_c = compress_stream(proto.encode("StripeFooter", {
            "streams": stream_protos,
            "columns": [encodings.get(c, {"kind": 0}) for c in range(n_cols)],
            "writerTimezone": "UTC"}), compression, block_size)
        buf += sfoot_c
        info = {"offset": offset, "indexLength": 0, "dataLength": data_len,
                "footerLength": len(sfoot_c), "numberOfRows": n_rows}
        content_len = len(buf) - len(MAGIC)
        footer_c = compress_stream(proto.encode("Footer", {
            "headerLength": len(MAGIC), "contentLength": content_len,
            "stripes": [info], "types": types, "numberOfRows": n_rows,
            "statistics": [{"numberOfValues": n_rows, "hasNull": 1}
                           for _ in range(n_cols)],
            "rowIndexStride": 0, "writer": 1}), compression, block_size)
        buf += footer_c
        ps = proto.encode("PostScript", {
            "footerLength": len(footer_c),
            "compression": proto.COMPRESSION[compression],
            "compressionBlockSize": block_size, "version": [0, 12],
            "metadataLength": 0, "writerVersion": 1, "magic": "ORC"})
        buf += ps
        buf.append(len(ps))
        out.write(bytes(buf))
    finally:
        if isinstance(where, str):
            out.close()


def _bloom_values(arr: pa.Array, kind: str) -> list:
    """Column values in the ORC bloom hash domain (calibrated against
    the C++ writer): utf8 strings / bytes as-is, integer family and
    DATE as int64, floats widened to double, TIMESTAMP as epoch
    MILLIseconds."""
    dense = arr.drop_null() if arr.null_count else arr
    if kind in ("STRING", "VARCHAR", "CHAR", "BINARY"):
        return dense.to_pylist()
    if kind in ("BYTE", "SHORT", "INT", "LONG"):
        return [int(v) for v in dense.cast(pa.int64()).to_pylist()]
    if kind == "DATE":
        return [int(v) for v in dense.cast(pa.int32()).to_pylist()]
    if kind in ("FLOAT", "DOUBLE"):
        return [float(v) for v in dense.cast(pa.float64()).to_pylist()]
    if kind in ("TIMESTAMP", "TIMESTAMP_INSTANT"):
        # derive epoch millis from the raw int64 in the column's own
        # unit: a safe ns->us cast would RAISE on true-ns values the
        # non-bloom write path stores fine
        unit = dense.type.unit
        div = {"s": 1, "ms": 1, "us": 1000, "ns": 1_000_000}[unit]
        mul = 1000 if unit == "s" else 1
        raw = dense.cast(pa.int64()).to_pylist()
        return [int(v) * mul // div for v in raw]
    raise NotImplementedError(
        f"ORC bloom filters are not written for {kind} columns")


def write_orc(data, where, compression: str = "ZLIB",
              stripe_rows: int = 64 * 1024,
              block_size: int = 256 * 1024,
              dict_ratio: float = 0.5,
              stripe_bytes: int = 64 << 20,
              schema: pa.Schema | None = None,
              row_index_stride: int = 10000,
              bloom_filter_columns: list[str] | None = None,
              bloom_filter_fpp: float = 0.05,
              rechunk: bool = True) -> dict:
    """Write a Table / RecordBatch / ITERATOR of RecordBatches as a real
    ORC file. Returns a summary dict {stripes, bytes, rows}.

    Streams stripe-at-a-time with constant memory: peak footprint is one
    stripe's rows plus its encoded streams, independent of total input
    size — the reference writer's proven property (putOrcStream hylo,
    src/Orc/Serial/Binary/Striped.hs:560-602; leak property
    test/Test/Orc/Memory/Leaks.hs:41-131). ORC needs no backpatching:
    stripes land first, Metadata/Footer/PostScript follow at the end.

    Stripes are bounded by rows AND bytes (html-like bodies are
    log-normal; a row count alone would make stripe memory unbounded).
    ``schema`` is only needed when ``data`` is an empty iterator.
    """
    import itertools

    from orc_haskell_spark.engine import _rechunk

    compression = compression.upper()
    if compression not in ("NONE", "ZLIB", "SNAPPY", "ZSTD", "LZ4"):
        raise ValueError(f"unsupported compression {compression}")

    if isinstance(data, pa.Table):
        schema = data.schema
        batches = iter(data.to_batches())
    elif isinstance(data, pa.RecordBatch):
        schema = data.schema
        batches = iter([data])
    else:
        batches = iter(data)
        first = next(batches, None)
        if first is not None:
            schema = first.schema
            batches = itertools.chain([first], batches)
        elif schema is None:
            raise ValueError("empty batch iterator requires schema=")

    types: list[dict] = []
    _build_types(schema, types)
    n_cols = len(types)

    # ROW_INDEX needs positional seek semantics per stream; emitted for
    # all-primitive schemas (the 100 TB pages shape). Nested columns
    # fall back to stride 0 — an unindexed file, exactly what we wrote
    # before. stride must be a multiple of 8 (bit-packed streams
    # restart byte-aligned at group boundaries).
    if row_index_stride % 8:
        raise ValueError("row_index_stride must be a multiple of 8")
    indexed = bool(row_index_stride) and all(
        proto.KIND_NAME[types[sub].get("kind", 0)] in _INDEXABLE_KINDS
        for sub in types[0].get("subtypes", []))
    if bloom_filter_columns and not indexed:
        raise ValueError("bloom filters require an indexed file "
                         "(row_index_stride > 0, primitive schema)")
    bloom_ids = set()
    if bloom_filter_columns:
        root_names = types[0].get("fieldNames", [])
        for cname in bloom_filter_columns:
            sub = types[0]["subtypes"][root_names.index(cname)]
            kind = proto.KIND_NAME[types[sub].get("kind", 0)]
            if kind == "BOOLEAN" or kind == "DECIMAL":
                raise NotImplementedError(
                    f"ORC bloom filters are not written for {kind}")
            bloom_ids.add(sub)

    out = open(where, "wb") if isinstance(where, str) else where
    pos = 0

    def w(b: bytes) -> None:
        nonlocal pos
        out.write(b)
        pos += len(b)

    try:
        w(MAGIC)
        stripe_infos: list[dict] = []
        stripe_stats: list[dict] = []
        agg_stats: list = [None] * n_cols
        total_rows = 0
        # rechunk=False: one INPUT batch -> one stripe, exactly (the
        # stripe-preserving rewrite shape; _rechunk would merge small
        # leading batches into a later one's budget)
        for chunk in (_rechunk(batches, stripe_rows, stripe_bytes)
                      if rechunk else batches):
            if chunk is None or chunk.num_rows == 0:
                continue
            cw = _ColumnWriter(types, dict_ratio)
            cw.encodings[0] = {"kind": proto.ENCODING["DIRECT"]}
            col_entries: dict[int, list[dict]] = {}
            if indexed:
                for i, sub in enumerate(types[0].get("subtypes", [])):
                    streams, enc, stats, entries = _indexed_column(
                        types, sub, chunk.column(i), row_index_stride,
                        dict_ratio)
                    for skind in ("PRESENT", "DATA", "LENGTH",
                                  "DICTIONARY_DATA", "SECONDARY"):
                        if skind in streams:
                            cw._put(sub, skind, streams[skind])
                    cw.encodings[sub] = enc
                    cw.stats[sub] = stats
                    col_entries[sub] = entries
            else:
                for i, sub in enumerate(types[0].get("subtypes", [])):
                    cw.write(sub, chunk.column(i))

            offset = pos
            stream_protos = []
            index_len = 0
            if indexed:
                from .compression import compress_stream_offsets

                comp_streams = []
                chunkmaps: dict[tuple[int, str], list[int]] = {}
                for col, kind, raw in cw.streams:
                    comp, offs = compress_stream_offsets(
                        raw, compression, block_size)
                    comp_streams.append((col, kind, comp))
                    chunkmaps[(col, kind)] = offs

                n_groups = len(range(0, chunk.num_rows, row_index_stride))

                def mk_posmap(col: int):
                    def posmap(skind: str, b: int) -> tuple:
                        if compression == "NONE":
                            return (b,)
                        offs = chunkmaps.get((col, skind)) or [0]
                        ci = min(b // block_size, len(offs) - 1)
                        return (offs[ci], b - ci * block_size)
                    return posmap

                # index streams first (they ARE the index region)
                for sub in [0] + list(types[0].get("subtypes", [])):
                    if sub == 0:
                        ents = [{"positions": [],
                                 "statistics": {
                                     "numberOfValues": min(
                                         row_index_stride,
                                         chunk.num_rows
                                         - g * row_index_stride),
                                     "hasNull": 0}}
                                for g in range(n_groups)]
                    else:
                        kind = proto.KIND_NAME[types[sub].get("kind", 0)]
                        enck = cw.encodings[sub].get("kind", 0)
                        has_p = any(c == sub and k == "PRESENT"
                                    for c, k, _ in cw.streams)
                        ents = [{"positions": _entry_positions(
                                     kind, enck, has_p,
                                     e["offsets"], mk_posmap(sub),
                                     e.get("skips")),
                                 "statistics": e["stats"]}
                                for e in col_entries[sub]]
                    ri = compress_stream(
                        proto.encode("RowIndex", {"entry": ents}),
                        compression, block_size)
                    stream_protos.append(
                        {"kind": proto.STREAM_KIND["ROW_INDEX"],
                         "column": sub, "length": len(ri)})
                    w(ri)
                    if sub in bloom_ids:
                        from . import bloom as bloom_mod

                        kind2 = proto.KIND_NAME[types[sub].get("kind", 0)]
                        idx2 = types[0]["subtypes"].index(sub)
                        col_arr = chunk.column(idx2)
                        bfs = []
                        for g in range(n_groups):
                            grp = col_arr.slice(g * row_index_stride,
                                                row_index_stride)
                            # hash UNIQUE values only (bloom adds are
                            # idempotent) and use the vectorized Wang
                            # mix for integer-domain columns
                            import pyarrow.compute as pc2

                            uniq = pc2.unique(
                                grp.combine_chunks()
                                if isinstance(grp, pa.ChunkedArray)
                                else grp)
                            vals = _bloom_values(uniq, kind2)
                            bf = bloom_mod.BloomFilterUtf8.build(
                                len(vals), bloom_filter_fpp)
                            if vals and isinstance(vals[0], int):
                                bf.add_hashes(bloom_mod.hash64_long_array(
                                    np.array(vals, np.int64)))
                            elif vals and isinstance(vals[0], (str, bytes)):
                                bf.add_hashes(bloom_mod.hash64_bytes_array(
                                    [v.encode() if isinstance(v, str)
                                     else v for v in vals]))
                            elif vals and isinstance(vals[0], float):
                                # IEEE bits through the Wang mix; -0.0
                                # normalizes first (hash64_double)
                                d = np.array(vals, np.float64)
                                d[d == 0.0] = 0.0
                                bf.add_hashes(bloom_mod.hash64_long_array(
                                    d.view(np.int64)))
                            else:
                                for v in vals:
                                    bf.add_value(v)
                            bfs.append(bf.to_proto())
                        bb = compress_stream(
                            proto.encode("BloomFilterIndex",
                                         {"bloomFilter": bfs}),
                            compression, block_size)
                        stream_protos.append(
                            {"kind":
                             proto.STREAM_KIND["BLOOM_FILTER_UTF8"],
                             "column": sub, "length": len(bb)})
                        w(bb)
                index_len = pos - offset
                for col, kind, comp in comp_streams:
                    stream_protos.append(
                        {"kind": proto.STREAM_KIND[kind],
                         "column": col, "length": len(comp)})
                    w(comp)
            else:
                for col, kind, raw in cw.streams:
                    comp = compress_stream(raw, compression, block_size)
                    stream_protos.append(
                        {"kind": proto.STREAM_KIND[kind],
                         "column": col, "length": len(comp)})
                    w(comp)
            data_len = pos - offset - index_len
            sfoot = proto.encode("StripeFooter", {
                "streams": stream_protos,
                "columns": [cw.encodings.get(c, {"kind": 0})
                            for c in range(n_cols)],
                "writerTimezone": "UTC",
            })
            sfoot_c = compress_stream(sfoot, compression, block_size)
            w(sfoot_c)
            stripe_infos.append({
                "offset": offset, "indexLength": index_len,
                "dataLength": data_len,
                "footerLength": len(sfoot_c),
                "numberOfRows": chunk.num_rows,
            })
            cs: list[dict] = [
                cw.stats.get(c, {"numberOfValues": 0, "hasNull": 1})
                for c in range(n_cols)]
            cs[0] = {"numberOfValues": chunk.num_rows, "hasNull": 0}
            stripe_stats.append({"colStats": cs})
            _merge_stats(agg_stats, cs)
            total_rows += chunk.num_rows

        stats = [a if a is not None else {"numberOfValues": 0, "hasNull": 0}
                 for a in agg_stats]

        content_len = pos - len(MAGIC)  # stripes only, pre-metadata
        metadata_c = b""
        if stripe_stats:
            metadata_c = compress_stream(
                proto.encode("Metadata", {"stripeStats": stripe_stats}),
                compression, block_size)
            w(metadata_c)

        footer = proto.encode("Footer", {
            "headerLength": len(MAGIC),
            "contentLength": content_len,
            "stripes": stripe_infos,
            "types": types,
            "numberOfRows": total_rows,
            "statistics": stats,
            "rowIndexStride": row_index_stride if indexed else 0,
            "writer": 1,
        })
        footer_c = compress_stream(footer, compression, block_size)
        w(footer_c)
        ps = proto.encode("PostScript", {
            "footerLength": len(footer_c),
            "compression": proto.COMPRESSION[compression],
            "compressionBlockSize": block_size,
            "version": [0, 12],
            "metadataLength": len(metadata_c),
            "writerVersion": 1,
            "magic": "ORC",
        })
        w(ps)
        w(bytes([len(ps)]))
    finally:
        if isinstance(where, str):
            out.close()
    return {"stripes": len(stripe_infos), "bytes": pos, "rows": total_rows}
