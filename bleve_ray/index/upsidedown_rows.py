"""Upsidedown (legacy engine) ROW CODEC -- byte-compatible with the
reference's KV row formats (index/upsidedown/row.go; test vectors
row_test.go:25-113 all pass).

The legacy engine itself (KV store, merge operators, analysis loop,
~7.3k LoC) stays out of scope -- this engine's segments are columnar --
but the row codec gives format-level interop: a migration job can parse
an upsidedown KV dump into (term, doc, freq, norm, vectors) tuples and
feed them to the Ray build, or emit upsidedown rows from a columnar
index for the legacy reader.

Row kinds (prefix byte):
  v VersionRow        key 'v'                 value [version]
  i InternalRow       key 'i'+k               value v
  f FieldRow          key 'f'+uint16le(index) value name+0xff
  d DictionaryRow     key 'd'+u16+term        value uvarint(count)
  t TermFrequencyRow  key 't'+u16+term+0xff+docid
                      value uvarint(freq) uvarint(f32bits(norm)) vectors*
                      vector = uvarint(field,pos,start,end,len(ap),ap...)
  b BackIndexRow      key 'b'+docid           value protobuf
                      (1: termsEntries{1:field,2:terms...}, 2: storedEntries{1:field})
  s StoredRow         key 's'+docid+0xff+u16+uvarint(arraypos...)
                      value [typ]+data
"""

from __future__ import annotations

import struct
from dataclasses import dataclass, field as dc_field
from typing import List, Optional, Tuple

BYTE_SEPARATOR = 0xFF


def uvarint(x: int) -> bytes:
    out = bytearray()
    while True:
        b = x & 0x7F
        x >>= 7
        if x:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def read_uvarint(buf: bytes, i: int) -> Tuple[int, int]:
    shift = 0
    out = 0
    while True:
        b = buf[i]
        i += 1
        out |= (b & 0x7F) << shift
        if not b & 0x80:
            return out, i
        shift += 7


def _f32bits(x: float) -> int:
    return struct.unpack("<I", struct.pack("<f", x))[0]


def _bits_f32(b: int) -> float:
    return struct.unpack("<f", struct.pack("<I", b))[0]


@dataclass
class TermVector:
    field: int
    pos: int
    start: int
    end: int
    array_positions: Tuple[int, ...] = ()


@dataclass
class VersionRow:
    version: int

    def key(self) -> bytes:
        return b"v"

    def value(self) -> bytes:
        return bytes([self.version])


@dataclass
class InternalRow:
    k: bytes
    v: bytes

    def key(self) -> bytes:
        return b"i" + self.k

    def value(self) -> bytes:
        return self.v


@dataclass
class FieldRow:
    index: int
    name: str

    def key(self) -> bytes:
        return b"f" + struct.pack("<H", self.index)

    def value(self) -> bytes:
        return self.name.encode() + bytes([BYTE_SEPARATOR])


@dataclass
class DictionaryRow:
    term: bytes
    field: int
    count: int

    def key(self) -> bytes:
        return b"d" + struct.pack("<H", self.field) + self.term

    def value(self) -> bytes:
        return uvarint(self.count)


@dataclass
class TermFrequencyRow:
    term: bytes
    field: int
    doc_id: bytes
    freq: int
    norm: float
    vectors: Tuple[TermVector, ...] = ()

    def key(self) -> bytes:
        return (
            b"t"
            + struct.pack("<H", self.field)
            + self.term
            + bytes([BYTE_SEPARATOR])
            + self.doc_id
        )

    def value(self) -> bytes:
        out = bytearray()
        out += uvarint(self.freq)
        out += uvarint(_f32bits(self.norm))
        for v in self.vectors:
            out += uvarint(v.field)
            out += uvarint(v.pos)
            out += uvarint(v.start)
            out += uvarint(v.end)
            out += uvarint(len(v.array_positions))
            for ap in v.array_positions:
                out += uvarint(ap)
        return bytes(out)


@dataclass
class BackIndexRow:
    doc_id: bytes
    # [(field, [terms...])]
    terms_entries: Tuple[Tuple[int, Tuple[str, ...]], ...] = ()
    stored_fields: Tuple[int, ...] = ()

    def key(self) -> bytes:
        return b"b" + self.doc_id

    def value(self) -> bytes:
        # hand-rolled protobuf: 1 = repeated BackIndexTermsEntry
        # {1: uint32 field, 2: repeated string terms}; 2 = repeated
        # BackIndexStoreEntry {1: uint32 field}
        out = bytearray()
        for fld, terms in self.terms_entries:
            inner = bytearray()
            inner += b"\x08" + uvarint(fld)
            for t in terms:
                tb = t.encode()
                inner += b"\x12" + uvarint(len(tb)) + tb
            out += b"\x0a" + uvarint(len(inner)) + inner
        for fld in self.stored_fields:
            inner = b"\x08" + uvarint(fld)
            out += b"\x12" + uvarint(len(inner)) + inner
        return bytes(out)


@dataclass
class StoredRow:
    doc_id: bytes
    field: int
    array_positions: Tuple[int, ...]
    typ: int  # e.g. ord('t') text
    data: bytes

    def key(self) -> bytes:
        out = bytearray(b"s")
        out += self.doc_id
        out.append(BYTE_SEPARATOR)
        out += struct.pack("<H", self.field)
        for ap in self.array_positions:
            out += uvarint(ap)
        return bytes(out)

    def value(self) -> bytes:
        return bytes([self.typ]) + self.data


def parse_row(key: bytes, value: bytes):
    """ParseFromKeyValue equivalent: bytes -> typed row."""
    kind = key[:1]
    if kind == b"v":
        return VersionRow(value[0])
    if kind == b"i":
        return InternalRow(key[1:], value)
    if kind == b"f":
        (idx,) = struct.unpack("<H", key[1:3])
        return FieldRow(idx, value[:-1].decode())
    if kind == b"d":
        (fld,) = struct.unpack("<H", key[1:3])
        count, _ = read_uvarint(value, 0)
        return DictionaryRow(key[3:], fld, count)
    if kind == b"t":
        (fld,) = struct.unpack("<H", key[1:3])
        sep = key.index(bytes([BYTE_SEPARATOR]), 3)
        term, doc_id = key[3:sep], key[sep + 1 :]
        freq, i = read_uvarint(value, 0)
        bits, i = read_uvarint(value, i)
        vectors: List[TermVector] = []
        while i < len(value):
            vf, i = read_uvarint(value, i)
            pos, i = read_uvarint(value, i)
            start, i = read_uvarint(value, i)
            end, i = read_uvarint(value, i)
            nap, i = read_uvarint(value, i)
            aps = []
            for _ in range(nap):
                ap, i = read_uvarint(value, i)
                aps.append(ap)
            vectors.append(TermVector(vf, pos, start, end, tuple(aps)))
        return TermFrequencyRow(
            term, fld, doc_id, freq, _bits_f32(bits), tuple(vectors)
        )
    if kind == b"b":
        terms_entries: List[Tuple[int, Tuple[str, ...]]] = []
        stored: List[int] = []
        i = 0
        while i < len(value):
            tag = value[i]
            i += 1
            ln, i = read_uvarint(value, i)
            body = value[i : i + ln]
            i += ln
            if tag == 0x0A:  # terms entry
                j = 0
                fld = None
                terms: List[str] = []
                while j < len(body):
                    t2 = body[j]
                    j += 1
                    if t2 == 0x08:
                        fld, j = read_uvarint(body, j)
                    elif t2 == 0x12:
                        ln2, j = read_uvarint(body, j)
                        terms.append(body[j : j + ln2].decode())
                        j += ln2
                terms_entries.append((fld or 0, tuple(terms)))
            elif tag == 0x12:  # stored entry
                _, j = body[0], 1
                fld, _ = read_uvarint(body, 1)
                stored.append(fld)
        return BackIndexRow(key[1:], tuple(terms_entries), tuple(stored))
    if kind == b"s":
        sep = key.index(bytes([BYTE_SEPARATOR]), 1)
        doc_id = key[1:sep]
        (fld,) = struct.unpack("<H", key[sep + 1 : sep + 3])
        i = sep + 3
        aps = []
        while i < len(key):
            ap, i = read_uvarint(key, i)
            aps.append(ap)
        return StoredRow(doc_id, fld, tuple(aps), value[0], value[1:])
    raise ValueError(f"unknown row kind {kind!r}")
