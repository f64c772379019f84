"""Minimal protobuf wire-format codec + the ORC metadata schemas.

The reference carries ~770 lines of hand-rolled protobuf handling for
the same messages (/root/reference/src/Orc/Schema/Types.hs:1-250 plus
its Data.Serialize instances); here a schema-driven 150-line wire codec
covers the subset ORC uses: varint scalars (uint32/uint64/enums),
length-delimited strings/bytes/submessages, and packed repeated
varints. No external protobuf dependency.

Message shapes follow the public ORC v1 specification
(https://orc.apache.org/specification/ORCv1/), proto definitions
mirrored from orc_proto.proto in the Apache ORC repo.
"""

from __future__ import annotations

# ---------------------------------------------------------------- wire

def _read_varint(buf: bytes, pos: int) -> tuple[int, int]:
    result = 0
    shift = 0
    while True:
        b = buf[pos]
        pos += 1
        result |= (b & 0x7F) << shift
        if not b & 0x80:
            return result, pos
        shift += 7
        if shift > 70:
            raise ValueError("malformed varint")


def _write_varint(out: bytearray, v: int) -> None:
    if v < 0:
        raise ValueError("negative varint")
    while True:
        b = v & 0x7F
        v >>= 7
        if v:
            out.append(b | 0x80)
        else:
            out.append(b)
            return


# Field kinds: "uint" (varint), "string", "bytes", "msg:<Name>".
# A trailing "*" marks repeated; repeated uints accept both packed and
# unpacked encodings on decode and are written packed.

SCHEMAS: dict[str, dict[int, tuple[str, str]]] = {
    "PostScript": {
        1: ("footerLength", "uint"),
        2: ("compression", "uint"),
        3: ("compressionBlockSize", "uint"),
        4: ("version", "uint*"),
        5: ("metadataLength", "uint"),
        6: ("writerVersion", "uint"),
        8000: ("magic", "string"),
    },
    "Footer": {
        1: ("headerLength", "uint"),
        2: ("contentLength", "uint"),
        3: ("stripes", "msg:StripeInformation*"),
        4: ("types", "msg:Type*"),
        5: ("metadata", "bytes*"),       # UserMetadataItem, opaque here
        6: ("numberOfRows", "uint"),
        7: ("statistics", "msg:ColumnStatistics*"),
        8: ("rowIndexStride", "uint"),
        9: ("writer", "uint"),
    },
    "StripeInformation": {
        1: ("offset", "uint"),
        2: ("indexLength", "uint"),
        3: ("dataLength", "uint"),
        4: ("footerLength", "uint"),
        5: ("numberOfRows", "uint"),
    },
    "Type": {
        1: ("kind", "uint"),
        2: ("subtypes", "uint*"),
        3: ("fieldNames", "string*"),
        4: ("maximumLength", "uint"),
        5: ("precision", "uint"),
        6: ("scale", "uint"),
    },
    "StripeFooter": {
        1: ("streams", "msg:Stream*"),
        2: ("columns", "msg:ColumnEncoding*"),
        3: ("writerTimezone", "string"),
    },
    "Stream": {
        1: ("kind", "uint"),
        2: ("column", "uint"),
        3: ("length", "uint"),
    },
    "ColumnEncoding": {
        1: ("kind", "uint"),
        2: ("dictionarySize", "uint"),
    },
    "Metadata": {
        1: ("stripeStats", "msg:StripeStatistics*"),
    },
    "StripeStatistics": {
        1: ("colStats", "msg:ColumnStatistics*"),
    },
    "ColumnStatistics": {
        1: ("numberOfValues", "uint"),
        2: ("intStatistics", "msg:IntegerStatistics"),
        3: ("doubleStatistics", "msg:DoubleStatistics"),
        4: ("stringStatistics", "msg:StringStatistics"),
        10: ("hasNull", "uint"),
    },
    "BloomFilter": {
        1: ("numHashFunctions", "uint"),
        2: ("bitset", "fixed64*"),
        3: ("utf8bitset", "bytes"),
    },
    "BloomFilterIndex": {
        1: ("bloomFilter", "msg:BloomFilter*"),
    },
    "RowIndex": {
        1: ("entry", "msg:RowIndexEntry*"),
    },
    "RowIndexEntry": {
        1: ("positions", "uint*"),
        2: ("statistics", "msg:ColumnStatistics"),
    },
    "IntegerStatistics": {
        1: ("minimum", "sint"),
        2: ("maximum", "sint"),
        3: ("sum", "sint"),
    },
    "DoubleStatistics": {          # wire type 1 (fixed64 doubles)
        1: ("minimum", "double"),
        2: ("maximum", "double"),
        3: ("sum", "double"),
    },
    "StringStatistics": {
        1: ("minimum", "string"),
        2: ("maximum", "string"),
        3: ("sum", "sint"),
    },
}

# enum values from orc_proto.proto
COMPRESSION = {"NONE": 0, "ZLIB": 1, "SNAPPY": 2, "LZO": 3, "LZ4": 4,
               "ZSTD": 5}
COMPRESSION_NAME = {v: k for k, v in COMPRESSION.items()}
KIND = {
    "BOOLEAN": 0, "BYTE": 1, "SHORT": 2, "INT": 3, "LONG": 4, "FLOAT": 5,
    "DOUBLE": 6, "STRING": 7, "BINARY": 8, "TIMESTAMP": 9, "LIST": 10,
    "MAP": 11, "STRUCT": 12, "UNION": 13, "DECIMAL": 14, "DATE": 15,
    "VARCHAR": 16, "CHAR": 17, "TIMESTAMP_INSTANT": 18,
}
KIND_NAME = {v: k for k, v in KIND.items()}
STREAM_KIND = {"PRESENT": 0, "DATA": 1, "LENGTH": 2, "DICTIONARY_DATA": 3,
               "DICTIONARY_COUNT": 4, "SECONDARY": 5, "ROW_INDEX": 6,
               "BLOOM_FILTER": 7, "BLOOM_FILTER_UTF8": 8}
STREAM_KIND_NAME = {v: k for k, v in STREAM_KIND.items()}
ENCODING = {"DIRECT": 0, "DICTIONARY": 1, "DIRECT_V2": 2,
            "DICTIONARY_V2": 3}
ENCODING_NAME = {v: k for k, v in ENCODING.items()}


def decode(msg_name: str, buf: bytes) -> dict:
    """Decode a protobuf message into a dict; unknown fields skipped."""
    schema = SCHEMAS[msg_name]
    out: dict = {}
    pos, end = 0, len(buf)
    while pos < end:
        key, pos = _read_varint(buf, pos)
        field, wire = key >> 3, key & 7
        spec = schema.get(field)
        if wire == 0:
            val, pos = _read_varint(buf, pos)
            if spec is None:
                continue
            name, kind = spec
            if kind.rstrip("*") == "sint":  # zigzag varint
                val = (val >> 1) ^ -(val & 1)
            if kind.endswith("*"):
                out.setdefault(name, []).append(val)
            else:
                out[name] = val
        elif wire == 2:
            ln, pos = _read_varint(buf, pos)
            payload = buf[pos:pos + ln]
            pos += ln
            if spec is None:
                continue
            name, kind = spec
            rep = kind.endswith("*")
            base = kind[:-1] if rep else kind
            if base == "fixed64":  # packed repeated fixed64
                import struct as _struct

                if ln % 8:
                    raise ValueError(
                        f"packed fixed64 field {name} length {ln} "
                        f"is not a multiple of 8 (corrupt message)")
                vals = list(_struct.unpack(f"<{ln // 8}Q", payload))
                out.setdefault(name, []).extend(vals)
                continue
            if base == "uint":  # packed repeated varints
                vals, p = [], 0
                while p < ln:
                    v, p = _read_varint(payload, p)
                    vals.append(v)
                out.setdefault(name, []).extend(vals)
                continue
            if base == "string":
                val = payload.decode("utf-8")
            elif base == "bytes":
                val = bytes(payload)
            elif base.startswith("msg:"):
                val = decode(base[4:], payload)
            else:
                raise ValueError(f"bad schema kind {kind}")
            if rep:
                out.setdefault(name, []).append(val)
            else:
                out[name] = val
        elif wire == 1:
            if spec is not None and spec[1].rstrip("*") in ("double",
                                                            "fixed64"):
                import struct as _struct

                name = spec[0]
                fmt = "<d" if spec[1].rstrip("*") == "double" else "<Q"
                val = _struct.unpack_from(fmt, buf, pos)[0]
                if spec[1].endswith("*"):
                    out.setdefault(name, []).append(val)
                else:
                    out[name] = val
            pos += 8
        elif wire == 5:
            pos += 4
        else:
            raise ValueError(f"unsupported wire type {wire}")
    return out


def encode(msg_name: str, msg: dict) -> bytes:
    """Encode a dict into protobuf bytes per the message schema."""
    schema = SCHEMAS[msg_name]
    by_name = {name: (field, kind) for field, (name, kind) in schema.items()}
    out = bytearray()
    # emit in field-number order (canonical, matches C++ writers)
    for field in sorted(schema):
        name, kind = schema[field]
        if name not in msg or msg[name] is None:
            continue
        val = msg[name]
        rep = kind.endswith("*")
        base = kind[:-1] if rep else kind
        if base in ("uint", "sint"):
            enc = ((lambda v: (int(v) << 1) ^ (int(v) >> 63))
                   if base == "sint" else int)
            if rep:
                if not val:
                    continue
                packed = bytearray()
                for v in val:
                    _write_varint(packed, enc(v))
                _write_varint(out, (field << 3) | 2)
                _write_varint(out, len(packed))
                out += packed
            else:
                _write_varint(out, (field << 3) | 0)
                _write_varint(out, enc(val))
            continue
        if base == "double":
            import struct as _struct

            for item in (val if rep else [val]):
                _write_varint(out, (field << 3) | 1)
                out += _struct.pack("<d", float(item))
            continue
        items = val if rep else [val]
        for item in items:
            if base == "string":
                payload = item.encode("utf-8")
            elif base == "bytes":
                payload = bytes(item)
            elif base.startswith("msg:"):
                payload = encode(base[4:], item)
            else:
                raise ValueError(f"bad schema kind {kind}")
            _write_varint(out, (field << 3) | 2)
            _write_varint(out, len(payload))
            out += payload
    return bytes(out)
