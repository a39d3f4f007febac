"""Upsidedown row codec: all reference row_test.go:25-113 vectors
round-trip byte-identically."""

from bleve_ray.index.upsidedown_rows import (
    BackIndexRow,
    DictionaryRow,
    FieldRow,
    InternalRow,
    StoredRow,
    TermFrequencyRow,
    TermVector,
    VersionRow,
    parse_row,
)

SEP = 0xFF

VECTORS = [
    (VersionRow(1), b"v", bytes([0x1])),
    (FieldRow(0, "name"), bytes([ord("f"), 0, 0]), b"name" + bytes([SEP])),
    (FieldRow(1, "desc"), bytes([ord("f"), 1, 0]), b"desc" + bytes([SEP])),
    (FieldRow(513, "style"), bytes([ord("f"), 1, 2]), b"style" + bytes([SEP])),
    (
        DictionaryRow(b"beer", 0, 27),
        bytes([ord("d"), 0, 0]) + b"beer",
        bytes([27]),
    ),
    (
        TermFrequencyRow(b"beer", 0, b"catz", 3, 3.14),
        bytes([ord("t"), 0, 0]) + b"beer" + bytes([SEP]) + b"catz",
        bytes([3, 195, 235, 163, 130, 4]),
    ),
    (
        TermFrequencyRow(
            b"beer",
            0,
            b"budweiser",
            3,
            3.14,
            (
                TermVector(0, 1, 3, 11),
                TermVector(0, 2, 23, 31),
                TermVector(0, 3, 43, 51),
            ),
        ),
        bytes([ord("t"), 0, 0]) + b"beer" + bytes([SEP]) + b"budweiser",
        bytes(
            [3, 195, 235, 163, 130, 4, 0, 1, 3, 11, 0, 0, 2, 23, 31, 0, 0,
             3, 43, 51, 0]
        ),
    ),
    (
        TermFrequencyRow(
            b"beer",
            0,
            b"budweiser",
            25896,
            3.14,
            (
                TermVector(255, 1, 3, 11),
                TermVector(0, 2198, 23, 31),
                TermVector(0, 3, 43, 51),
            ),
        ),
        bytes([ord("t"), 0, 0]) + b"beer" + bytes([SEP]) + b"budweiser",
        bytes(
            [168, 202, 1, 195, 235, 163, 130, 4, 255, 1, 1, 3, 11, 0, 0,
             150, 17, 23, 31, 0, 0, 3, 43, 51, 0]
        ),
    ),
    (
        TermFrequencyRow(
            b"beer",
            0,
            b"budweiser",
            25896,
            3.14,
            (
                TermVector(255, 1, 3, 11, (0,)),
                TermVector(0, 2198, 23, 31, (1, 2)),
                TermVector(0, 3, 43, 51, (3, 4, 5)),
            ),
        ),
        bytes([ord("t"), 0, 0]) + b"beer" + bytes([SEP]) + b"budweiser",
        bytes(
            [168, 202, 1, 195, 235, 163, 130, 4, 255, 1, 1, 3, 11, 1, 0,
             0, 150, 17, 23, 31, 2, 1, 2, 0, 3, 43, 51, 3, 3, 4, 5]
        ),
    ),
    (
        BackIndexRow(b"budweiser", ((0, ("beer",)),)),
        b"bbudweiser",
        bytes([10, 8, 8, 0, 18, 4]) + b"beer",
    ),
    (
        BackIndexRow(b"budweiser", ((0, ("beer",)), (1, ("beat",)))),
        b"bbudweiser",
        bytes([10, 8, 8, 0, 18, 4]) + b"beer"
        + bytes([10, 8, 8, 1, 18, 4]) + b"beat",
    ),
    (
        BackIndexRow(
            b"budweiser", ((0, ("beer",)), (1, ("beat",))), (3, 4, 5)
        ),
        b"bbudweiser",
        bytes([10, 8, 8, 0, 18, 4]) + b"beer"
        + bytes([10, 8, 8, 1, 18, 4]) + b"beat"
        + bytes([18, 2, 8, 3, 18, 2, 8, 4, 18, 2, 8, 5]),
    ),
    (
        StoredRow(b"budweiser", 0, (), ord("t"), b"an american beer"),
        b"sbudweiser" + bytes([SEP, 0, 0]),
        b"tan american beer",
    ),
    (
        StoredRow(
            b"budweiser", 0, (2, 294, 3078), ord("t"), b"an american beer"
        ),
        b"sbudweiser" + bytes([SEP, 0, 0, 2, 166, 2, 134, 24]),
        b"tan american beer",
    ),
    (
        InternalRow(b"mapping", b'{"mapping":"json content"}'),
        b"imapping",
        b'{"mapping":"json content"}',
    ),
]


def test_rows_encode_reference_vectors():
    for row, key, val in VECTORS:
        assert row.key() == key, row
        assert row.value() == val, row


def test_rows_parse_roundtrip():
    # byte-level roundtrip (norm floats live as float32 in the row, so
    # compare re-encoded bytes, not python float equality)
    for row, key, val in VECTORS:
        back = parse_row(key, val)
        assert back.key() == key, (key, val)
        assert back.value() == val, (key, val)
        assert type(back) is type(row)
