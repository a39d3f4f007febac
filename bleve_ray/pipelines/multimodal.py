"""Multimodal column plumbing (image/audio/video as opaque binary columns).

The decode libraries (PIL/cv2/librosa/ffmpeg) are NOT in this container, so
the decode kernels are stubbed: ``DeterministicFakeDecoder`` produces a
seeded fake "decoded" array from the bytes so the Ray-side plumbing (schema,
actor-pool stage, batch sizing, output layout) is real and testable;
``decode_image_real`` raises NotImplementedError until a codec is present.

Pattern: stateful actor-pool map_batches (model/codec loaded once per actor
in __init__), SMALL batch_size because payloads are large binaries.
"""

from __future__ import annotations

import hashlib
from typing import Optional

import numpy as np
import pyarrow as pa

MULTIMODAL_SCHEMA = pa.schema(
    [
        ("item_id", pa.int64()),
        ("media_type", pa.string()),  # image|audio|video
        ("payload", pa.binary()),  # opaque encoded bytes
        ("meta_json", pa.string()),  # typed metadata (w/h, sample rate, ...)
    ]
)


def have_image_codec() -> bool:
    """Feature detection: is a real image decoder importable?"""
    try:
        import PIL.Image  # noqa: F401

        return True
    except ImportError:
        return False


def decode_image_real(payload: bytes) -> np.ndarray:
    """Real image decode via PIL when present: bytes -> float32 grayscale
    (h, w) array, the same shape contract as the deterministic fake.  On
    codec-less machines (this container) raises NotImplementedError --
    callers feature-detect with have_image_codec()."""
    try:
        import io

        import PIL.Image
    except ImportError:
        raise NotImplementedError(
            "image decode requires PIL, not present in this container; "
            "use DeterministicFakeDecoder / the fake-decode stages for "
            "plumbing tests"
        )
    img = PIL.Image.open(io.BytesIO(payload)).convert("L")
    return (
        np.asarray(img, dtype=np.float32).reshape(img.height, img.width)
        / 255.0
    )


class DeterministicFakeDecoder:
    """Actor-pool stage: payload bytes -> fixed-size feature vector.

    Stands in for decode+feature-extract; deterministic (seeded by content
    hash) so tests can assert output stability.  Use as:
      ds.map_batches(DeterministicFakeDecoder, fn_constructor_args=(dim,),
                     batch_size=16, concurrency=N, batch_format="pyarrow")
    """

    def __init__(self, feature_dim: int = 32):
        self.feature_dim = feature_dim
        # expensive setup (model load) would go here, once per actor

    def __call__(self, batch: pa.Table) -> pa.Table:
        feats = []
        for payload in batch["payload"].to_pylist():
            h = hashlib.blake2b(payload or b"", digest_size=8).digest()
            rng = np.random.default_rng(int.from_bytes(h, "little"))
            feats.append(rng.standard_normal(self.feature_dim).astype(np.float32))
        return pa.table(
            {
                "item_id": batch["item_id"],
                "media_type": batch["media_type"],
                "feature": pa.array(
                    [f.tolist() for f in feats], type=pa.list_(pa.float32())
                ),
            }
        )


def _uniform_indices(n_out: int, n_src: int) -> np.ndarray:
    """Uniform sample/gather indices over [0, n_src) in EXACT integer
    arithmetic (round-half-up of i*(n_src-1)/(n_out-1)), so the DuckDB
    oracle can replay them: (2*i*(n_src-1) + (n_out-1)) // (2*(n_out-1)).
    For spacing >= 1 (n_out <= n_src) the indices are strictly increasing."""
    if n_out <= 1:
        return np.zeros(1, dtype=np.int64)
    i = np.arange(n_out, dtype=np.int64)
    return (2 * i * (n_src - 1) + (n_out - 1)) // (2 * (n_out - 1))


def _fake_decode_array(payload: bytes, h: int, w: int) -> np.ndarray:
    """Deterministic fake image decode: seeded (h, w) float32 array from
    the payload content hash (stands in for PIL/cv2 decode; everything
    downstream of it is real math)."""
    hsh = hashlib.blake2b(payload or b"", digest_size=8).digest()
    rng = np.random.default_rng(int.from_bytes(hsh, "little"))
    return rng.standard_normal((h, w)).astype(np.float32)


class FakeDecodeResizeStage:
    """Actor-pool stage: image payload -> decoded (fake) -> RESIZED pixels.

    The resize itself is real, vectorized nearest-neighbor index sampling
    (np.linspace row/col gather) -- only the byte decode is the
    deterministic stub.  Non-image rows pass through untouched upstream
    (filter before this stage); output is a fixed-shape flattened
    list<float32> plus the output dims, the layout a training-data
    pipeline shards into tensors."""

    def __init__(self, out_h: int = 32, out_w: int = 32,
                 decode: str = "fake"):
        self.out_h, self.out_w = out_h, out_w
        # decode selection happens ONCE per actor: "auto" picks the real
        # PIL decoder when the codec is importable, the deterministic
        # fake otherwise (this container has no codecs)
        if decode == "auto":
            decode = "real" if have_image_codec() else "fake"
        self.decode = decode

    def __call__(self, batch: pa.Table) -> pa.Table:
        import json

        out, src_hs, src_ws, rsums, csums = [], [], [], [], []
        for payload, meta in zip(
            batch["payload"].to_pylist(), batch["meta_json"].to_pylist()
        ):
            if self.decode == "real":
                arr = decode_image_real(payload or b"")
                h, w = arr.shape
            else:
                m = json.loads(meta or "{}")
                h, w = int(m.get("h", 64)), int(m.get("w", 64))
                arr = _fake_decode_array(payload, h, w)
            rows = _uniform_indices(self.out_h, h)
            cols = _uniform_indices(self.out_w, w)
            out.append(arr[rows][:, cols].reshape(-1))
            src_hs.append(h)
            src_ws.append(w)
            rsums.append(int(rows.sum()))
            csums.append(int(cols.sum()))
        n = len(out)
        return pa.table(
            {
                "item_id": batch["item_id"],
                "pixels": pa.array(
                    [o.tolist() for o in out], type=pa.list_(pa.float32())
                ),
                "h": pa.array([self.out_h] * n, type=pa.int32()),
                "w": pa.array([self.out_w] * n, type=pa.int32()),
                # SQL-expressible resize evidence for the driver oracle:
                # source dims + gather-index checksums (the pixel VALUES
                # are the labeled fake decode, asserted in pytest instead)
                "src_h": pa.array(src_hs, type=pa.int64()),
                "src_w": pa.array(src_ws, type=pa.int64()),
                "n_pixels": pa.array(
                    [self.out_h * self.out_w] * n, type=pa.int32()
                ),
                "row_idx_sum": pa.array(rsums, type=pa.int64()),
                "col_idx_sum": pa.array(csums, type=pa.int64()),
            }
        )


class FrameSampleStage:
    """Actor-pool stage: video payload -> N uniformly sampled frames, one
    OUTPUT ROW PER FRAME (the flat_map layout frame-level training data
    needs).  Uniform sampling indices (np.linspace over the source frame
    count) are real; the per-frame feature is the deterministic fake
    decode.  Source frame count derives from the payload size, like a
    container header read."""

    def __init__(self, n_frames: int = 4, feature_dim: int = 16):
        self.n_frames = n_frames
        self.feature_dim = feature_dim

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids, fidx, nsrc, feats = [], [], [], []
        for item_id, payload in zip(
            batch["item_id"].to_pylist(), batch["payload"].to_pylist()
        ):
            payload = payload or b""
            n_src = max(1, len(payload) // 16)
            take = _uniform_indices(min(self.n_frames, n_src), n_src)
            for fi in take:
                seed = hashlib.blake2b(
                    payload + int(fi).to_bytes(4, "little"), digest_size=8
                ).digest()
                rng = np.random.default_rng(int.from_bytes(seed, "little"))
                ids.append(item_id)
                fidx.append(int(fi))
                nsrc.append(n_src)
                feats.append(
                    rng.standard_normal(self.feature_dim).astype(np.float32)
                )
        return pa.table(
            {
                "item_id": pa.array(ids, type=pa.int64()),
                "frame_idx": pa.array(fidx, type=pa.int32()),
                "n_src_frames": pa.array(nsrc, type=pa.int32()),
                "feature": pa.array(
                    [f.tolist() for f in feats], type=pa.list_(pa.float32())
                ),
            }
        )


def resize_images_ds(table: Optional[pa.Table] = None, out_h: int = 32,
                     out_w: int = 32):
    """Filter to image rows -> actor-pool resize (small batches: payloads
    are large binaries)."""
    import pyarrow.compute as pc
    import ray.data

    table = table if table is not None else make_fake_media_table()
    table = table.filter(pc.equal(table["media_type"], "image"))
    ds = ray.data.from_arrow(table)
    return ds.map_batches(
        FakeDecodeResizeStage,
        fn_constructor_args=(out_h, out_w),
        batch_size=16,
        concurrency=2,
        batch_format="pyarrow",
    )


def sample_frames_ds(table: Optional[pa.Table] = None, n_frames: int = 4):
    """Filter to video rows -> actor-pool frame sampling (row-expanding
    stage: one output row per sampled frame)."""
    import pyarrow.compute as pc
    import ray.data

    table = table if table is not None else make_fake_media_table()
    table = table.filter(pc.equal(table["media_type"], "video"))
    ds = ray.data.from_arrow(table)
    return ds.map_batches(
        FrameSampleStage,
        fn_constructor_args=(n_frames,),
        batch_size=16,
        concurrency=2,
        batch_format="pyarrow",
    )


def media_table_from_documents(sf_dir: str, limit: int = 300) -> pa.Table:
    """Deterministic media table DERIVED from the documents table so the
    DuckDB oracle can reproduce every SQL-expressible output column:
    payload = utf-8 text bytes (strlen(text) in SQL), media_type cycles
    image/audio/video by doc_id % 3, meta dims h = 16 + doc_id % 48,
    w = 16 + (doc_id*7) % 48."""
    import json

    import pyarrow.compute as pc
    import pyarrow.parquet as pq

    t = pq.read_table(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    )
    t = t.filter(pc.less(t["doc_id"], limit))
    ids = [int(i) for i in t["doc_id"].to_pylist()]
    texts = t["text"].to_pylist()
    types = ["image", "audio", "video"]
    return pa.table(
        {
            "item_id": pa.array(ids, type=pa.int64()),
            "media_type": pa.array([types[i % 3] for i in ids]),
            "payload": pa.array(
                [(s or "").encode("utf-8") for s in texts], type=pa.binary()
            ),
            "meta_json": pa.array(
                [
                    json.dumps({"h": 16 + i % 48, "w": 16 + (i * 7) % 48})
                    for i in ids
                ]
            ),
        }
    )


def make_fake_media_table(n: int = 32, seed: int = 1) -> pa.Table:
    rng = np.random.default_rng(seed)
    payloads = [rng.bytes(64 + int(rng.integers(0, 64))) for _ in range(n)]
    types = ["image", "audio", "video"]
    return pa.table(
        {
            "item_id": pa.array(range(n), type=pa.int64()),
            "media_type": pa.array([types[i % 3] for i in range(n)]),
            "payload": pa.array(payloads, type=pa.binary()),
            "meta_json": pa.array(['{"w":64,"h":64}'] * n),
        }
    )


def decode_features_ds(table: Optional[pa.Table] = None, feature_dim: int = 32):
    """The full multimodal stage wiring: small batches (large payloads),
    actor pool, typed list<float32> output."""
    import ray.data

    table = table if table is not None else make_fake_media_table()
    ds = ray.data.from_arrow(table)
    return ds.map_batches(
        DeterministicFakeDecoder,
        fn_constructor_args=(feature_dim,),
        batch_size=16,
        concurrency=2,
        batch_format="pyarrow",
    )
