"""Minimal Avro Object Container File codec (pure Python, stdlib only).

The reference reads Avro via fastavro
(pypaimon/pynative/reader/avro_format_reader.py:30-83); this container
has neither fastavro nor the spark-avro DataSource, so the engine ships
its own codec for the subset the table format needs: primitive column
types, nullable via ``["null", T]`` unions, null + deflate codecs.
Wire format follows the Avro 1.11 spec (magic ``Obj\\x01``, metadata
map, sync-marker-delimited blocks, zigzag-varint longs).

Scale shape: the codec itself is single-file, but both directions run
INSIDE Spark tasks — writes via ``mapInPandas`` after the engine's
layout repartition, reads via the ``binaryFile`` source + ``mapInPandas``
decode — so Avro tables distribute exactly like parquet ones, just
without the vectorized fast path.
"""

from __future__ import annotations

import io
import json
import os
import struct
import uuid
import zlib
from typing import Any, List

CODECS = ("null", "deflate")

from pyspark.sql import types as T

MAGIC = b"Obj\x01"

_PRIMITIVES = {
    "LongType": "long",
    "IntegerType": "int",
    "ShortType": "int",
    "ByteType": "int",
    "DoubleType": "double",
    "FloatType": "float",
    "StringType": "string",
    "BooleanType": "boolean",
    "BinaryType": "bytes",
}


def _avro_type(dt: T.DataType) -> str:
    name = type(dt).__name__
    if name not in _PRIMITIVES:
        raise ValueError(f"avro codec: unsupported column type {dt}")
    return _PRIMITIVES[name]


def avro_schema_json(schema: T.StructType) -> str:
    fields = [
        {"name": f.name, "type": ["null", _avro_type(f.dataType)]}
        for f in schema.fields
    ]
    return json.dumps(
        {"type": "record", "name": "row", "fields": fields}, separators=(",", ":")
    )


# ---- primitive encoders/decoders ----


def _zigzag_encode(n: int) -> bytes:
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


def _zigzag_decode(buf: io.BytesIO) -> int:
    shift = 0
    acc = 0
    while True:
        (b,) = buf.read(1)
        acc |= (b & 0x7F) << shift
        if not b & 0x80:
            break
        shift += 7
    return (acc >> 1) ^ -(acc & 1)


def _encode_value(v: Any, avro_type: str, out: bytearray) -> None:
    if avro_type in ("long", "int"):
        out += _zigzag_encode(int(v))
    elif avro_type == "double":
        out += struct.pack("<d", float(v))
    elif avro_type == "float":
        out += struct.pack("<f", float(v))
    elif avro_type == "string":
        b = str(v).encode("utf-8")
        out += _zigzag_encode(len(b))
        out += b
    elif avro_type == "bytes":
        b = bytes(v)
        out += _zigzag_encode(len(b))
        out += b
    elif avro_type == "boolean":
        out.append(1 if v else 0)
    else:  # pragma: no cover
        raise ValueError(avro_type)


def _decode_value(buf: io.BytesIO, avro_type: str) -> Any:
    if avro_type in ("long", "int"):
        return _zigzag_decode(buf)
    if avro_type == "double":
        return struct.unpack("<d", buf.read(8))[0]
    if avro_type == "float":
        return struct.unpack("<f", buf.read(4))[0]
    if avro_type == "string":
        n = _zigzag_decode(buf)
        return buf.read(n).decode("utf-8")
    if avro_type == "bytes":
        n = _zigzag_decode(buf)
        return buf.read(n)
    if avro_type == "boolean":
        return buf.read(1) == b"\x01"
    raise ValueError(avro_type)  # pragma: no cover


# ---- container file ----


def write_avro(
    path: str, rows: List[tuple], schema: T.StructType, codec: str = "null"
) -> None:
    """Write rows (tuples in schema field order) as one Avro OCF.

    ``codec``: ``null`` (raw) or ``deflate`` (RFC 1951 raw DEFLATE per
    the Avro spec — zlib with negative wbits, no header/checksum)."""
    if codec not in CODECS:
        raise ValueError(f"avro codec: unsupported codec {codec!r}; one of {CODECS}")
    atypes = [_avro_type(f.dataType) for f in schema.fields]
    sync = uuid.uuid5(uuid.NAMESPACE_OID, os.path.basename(path)).bytes

    body = bytearray()
    for row in rows:
        for v, at in zip(row, atypes):
            if v is None:
                body += _zigzag_encode(0)  # union branch: null
            else:
                body += _zigzag_encode(1)  # union branch: value
                _encode_value(v, at, body)
    if codec == "deflate":
        comp = zlib.compressobj(6, zlib.DEFLATED, -15)
        body = comp.compress(bytes(body)) + comp.flush()

    meta = {
        "avro.schema": avro_schema_json(schema).encode(),
        "avro.codec": codec.encode(),
    }
    out = bytearray(MAGIC)
    out += _zigzag_encode(len(meta))
    for k, v in meta.items():
        kb = k.encode()
        out += _zigzag_encode(len(kb))
        out += kb
        out += _zigzag_encode(len(v))
        out += v
    out += _zigzag_encode(0)  # end of metadata map
    out += sync
    if rows:
        out += _zigzag_encode(len(rows))
        out += _zigzag_encode(len(body))
        out += body
        out += sync
    tmp = f"{path}.tmp-{uuid.uuid4().hex}"
    with open(tmp, "wb") as f:
        f.write(bytes(out))
    os.replace(tmp, path)


def read_avro(data: bytes, schema: T.StructType = None) -> List[tuple]:
    """Decode an Avro OCF produced by :func:`write_avro` (or any OCF
    with the same record-of-nullable-primitives schema and null codec)
    into row tuples in the file's field order."""
    return read_avro_table(data)[1]


def read_avro_table(data: bytes) -> tuple[List[str], List[tuple]]:
    """Like :func:`read_avro` but also returns the file's column names
    (from its embedded schema)."""
    buf = io.BytesIO(data)
    if buf.read(4) != MAGIC:
        raise ValueError("not an Avro object container file")
    n_meta = _zigzag_decode(buf)
    meta = {}
    while n_meta != 0:
        if n_meta < 0:  # spec: negative count precedes a byte size
            buf.read(abs(_zigzag_decode(buf)))
            n_meta = abs(n_meta)
        for _ in range(n_meta):
            klen = _zigzag_decode(buf)
            k = buf.read(klen).decode()
            vlen = _zigzag_decode(buf)
            meta[k] = buf.read(vlen)
        n_meta = _zigzag_decode(buf)
    codec = meta.get("avro.codec", b"null") or b"null"
    if codec.decode() not in CODECS:
        raise ValueError(f"unsupported avro codec {codec!r}")
    file_schema = json.loads(meta["avro.schema"])
    field_types = []
    for f in file_schema["fields"]:
        t = f["type"]
        if isinstance(t, list):
            non_null = [x for x in t if x != "null"]
            field_types.append((True, non_null[0]))
        else:
            field_types.append((False, t))
    sync = buf.read(16)

    rows: List[tuple] = []
    while True:
        head = buf.read(1)
        if not head:
            break
        buf.seek(-1, os.SEEK_CUR)
        n_records = _zigzag_decode(buf)
        block_bytes = _zigzag_decode(buf)
        block = buf.read(block_bytes)
        if codec == b"deflate":
            block = zlib.decompress(block, -15)
        bbuf = io.BytesIO(block)
        for _ in range(n_records):
            row = []
            for nullable, at in field_types:
                if nullable:
                    branch = _zigzag_decode(bbuf)
                    row.append(None if branch == 0 else _decode_value(bbuf, at))
                else:
                    row.append(_decode_value(bbuf, at))
            rows.append(tuple(row))
        if buf.read(16) != sync:
            raise ValueError("sync marker mismatch — corrupt avro block")
    return [f["name"] for f in file_schema["fields"]], rows
