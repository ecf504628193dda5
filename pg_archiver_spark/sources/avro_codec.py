"""Minimal pure-Python Avro object-container codec (null codec).

The environment ships Spark WITHOUT the external ``spark-avro``
connector (the ``avro`` data-source format), so ``sink_avro_roundtrip``
cannot use ``df.write.format("avro")`` here. Rather than stubbing the
"additional output formats" future-work item (reference README.md:126),
this module implements the Avro 1.x object-container file format
directly from the public specification
(https://avro.apache.org/docs/1.12.0/specification/): magic ``Obj\\x01``,
file-metadata map carrying the writer schema JSON and codec, 16-byte
sync marker, then length-prefixed data blocks of binary-encoded records.

Scope: flat record schemas over ``long`` / ``double`` / ``string`` —
exactly the reference's column-type surface (main.go:29-33). Encoding
rules implemented: zigzag-varint longs, little-endian IEEE-754 doubles,
length-prefixed UTF-8 strings.

Spec compliance is not self-proclaimed: the operator cross-reads files
produced here through the JVM's ``org.apache.avro`` DataFileStream
(avro-1.12.1.jar ships in pyspark/jars), so a malformed container fails
the round-trip, and files written by ANY conformant Avro writer decode
here. Both halves run batch-at-a-time inside mapInPandas — no py4j
per-row chatter, no driver collect.
"""

from __future__ import annotations

import io
import json
import struct

MAGIC = b"Obj\x01"
# Deterministic sync marker: retried tasks rewrite byte-identical files.
SYNC = bytes(range(16))


def _zigzag_encode(n: int) -> bytes:
    """Avro long: zigzag then base-128 varint, little-endian groups."""
    z = (n << 1) ^ (n >> 63)
    out = bytearray()
    while True:
        b = z & 0x7F
        z >>= 7
        if z:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def _zigzag_decode(buf: io.BufferedIOBase) -> int:
    shift = 0
    acc = 0
    while True:
        byte = buf.read(1)
        if not byte:
            raise EOFError("truncated varint")
        b = byte[0]
        acc |= (b & 0x7F) << shift
        if not b & 0x80:
            break
        shift += 7
    return (acc >> 1) ^ -(acc & 1)


def _encode_value(v, typ: str) -> bytes:
    if typ == "long":
        return _zigzag_encode(int(v))
    if typ == "double":
        return struct.pack("<d", float(v))
    if typ == "string":
        raw = str(v).encode("utf-8")
        return _zigzag_encode(len(raw)) + raw
    raise ValueError(f"unsupported avro type: {typ}")


def _decode_value(buf: io.BufferedIOBase, typ: str):
    if typ == "long":
        return _zigzag_decode(buf)
    if typ == "double":
        return struct.unpack("<d", buf.read(8))[0]
    if typ == "string":
        n = _zigzag_decode(buf)
        return buf.read(n).decode("utf-8")
    raise ValueError(f"unsupported avro type: {typ}")


def make_schema(name: str, fields: list[tuple[str, str]]) -> str:
    """Writer-schema JSON for a flat record of long/double/string."""
    return json.dumps(
        {
            "type": "record",
            "name": name,
            "fields": [{"name": n, "type": t} for n, t in fields],
        }
    )


def write_container(
    path: str, schema_json: str, fields: list[tuple[str, str]], rows
) -> int:
    """Write rows (iterable of tuples, field order) as one Avro object
    container file with the null codec. Returns the row count."""
    meta = {
        "avro.schema": schema_json.encode("utf-8"),
        "avro.codec": b"null",
    }
    body = bytearray()
    n = 0
    for row in rows:
        for v, (_, typ) in zip(row, fields):
            body += _encode_value(v, typ)
        n += 1
    with open(path, "wb") as fh:
        fh.write(MAGIC)
        fh.write(_zigzag_encode(len(meta)))
        for k, v in meta.items():
            kraw = k.encode("utf-8")
            fh.write(_zigzag_encode(len(kraw)) + kraw)
            fh.write(_zigzag_encode(len(v)) + v)
        fh.write(_zigzag_encode(0))  # end of metadata map
        fh.write(SYNC)
        if n:
            fh.write(_zigzag_encode(n))
            fh.write(_zigzag_encode(len(body)))
            fh.write(bytes(body))
            fh.write(SYNC)
    return n


def read_container(data: bytes) -> tuple[list[tuple[str, str]], list[tuple]]:
    """Decode one Avro object container (null codec). Returns
    (fields, rows). Validates magic, metadata map, and sync markers."""
    buf = io.BytesIO(data)
    if buf.read(4) != MAGIC:
        raise ValueError("not an avro object container file")
    meta: dict[str, bytes] = {}
    while True:
        count = _zigzag_decode(buf)
        if count == 0:
            break
        if count < 0:
            # Avro spec: a negative block count is followed by a long
            # byte-size for the block; consume it before the entries.
            _zigzag_decode(buf)
        for _ in range(abs(count)):
            klen = _zigzag_decode(buf)
            key = buf.read(klen).decode("utf-8")
            vlen = _zigzag_decode(buf)
            meta[key] = buf.read(vlen)
    codec = meta.get("avro.codec", b"null")
    if codec != b"null":
        raise ValueError(f"unsupported codec: {codec!r}")
    schema = json.loads(meta["avro.schema"].decode("utf-8"))
    fields = [(f["name"], f["type"]) for f in schema["fields"]]
    sync = buf.read(16)
    rows: list[tuple] = []
    while True:
        head = buf.read(1)
        if not head:
            break
        buf.seek(-1, io.SEEK_CUR)
        n = _zigzag_decode(buf)
        _blen = _zigzag_decode(buf)
        for _ in range(n):
            rows.append(tuple(_decode_value(buf, t) for _, t in fields))
        if buf.read(16) != sync:
            raise ValueError("sync marker mismatch — corrupt block")
    return fields, rows
