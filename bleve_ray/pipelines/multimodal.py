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


def decode_image_real(payload: bytes) -> np.ndarray:
    try:
        import PIL.Image  # noqa: F401
    except ImportError:
        raise NotImplementedError(
            "image decode requires PIL/cv2, not present in this container; "
            "use DeterministicFakeDecoder for plumbing tests"
        )
    raise NotImplementedError("wire PIL decode here when available")


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
