"""Multimodal span processing: decode / feature-extract / resize /
frame-sample as actor-pool ``map_batches`` stages.

The interleaved-documents table carries media spans (``kind`` in
image/audio/video, ``media_ref`` a URI) alongside text spans; the KG text
stages pass them through untouched (span-sequence invariant).  This module
is the media side: the Ray plumbing — schemas, actor pools, batch sizing,
deterministic outputs — is real and tested; the *codec* itself is stubbed
(no image/audio libraries in this sandbox): each stage tries the real
library import and otherwise uses a clearly-marked deterministic fake
derived from the payload bytes, recording which backend produced the row.

Payload bytes are synthesized deterministically from the media_ref (the
stand-in for an object-store fetch); batch sizes stay small because rows
carry binary payloads (memory-aware batching)."""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa
import ray

MEDIA_SPANS = pa.schema(
    [
        ("doc_id", pa.string()),
        ("span_idx", pa.int32()),
        ("kind", pa.string()),
        ("media_ref", pa.string()),
    ]
)

PAYLOADS = pa.schema(
    [
        ("doc_id", pa.string()),
        ("span_idx", pa.int32()),
        ("kind", pa.string()),
        ("media_ref", pa.string()),
        ("payload", pa.binary()),
    ]
)

FEATURES = pa.schema(
    [
        ("doc_id", pa.string()),
        ("span_idx", pa.int32()),
        ("kind", pa.string()),
        ("media_ref", pa.string()),
        ("frame_idx", pa.int32()),  # 0 for still media
        ("width", pa.int32()),
        ("height", pa.int32()),
        ("feature", pa.list_(pa.float32())),
        ("backend", pa.string()),  # 'pil' | 'fake' | ...
    ]
)

FEATURE_DIM = 16

#: Driver-checkable projection of FEATURES: the float vector replaced by a
#: scalar md5 digest (cross-engine-hashable).
FEATURES_DIGEST = pa.schema(
    [
        ("doc_id", pa.string()),
        ("span_idx", pa.int32()),
        ("kind", pa.string()),
        ("media_ref", pa.string()),
        ("frame_idx", pa.int32()),
        ("width", pa.int32()),
        ("height", pa.int32()),
        ("backend", pa.string()),
        ("feat_fp", pa.string()),
    ]
)


def media_spans(documents: ray.data.Dataset) -> ray.data.Dataset:
    """Explode the interleaved docs into one row per media span (text spans
    are handled by the NLP pipeline)."""

    def explode(batch: pa.Table) -> pa.Table:
        out: dict[str, list] = {k: [] for k in ("doc_id", "span_idx", "kind", "media_ref")}
        for doc_id, spans in zip(batch.column("doc_id").to_pylist(), batch.column("spans").to_pylist()):
            for i, s in enumerate(spans or []):
                if s["kind"] != "text":
                    out["doc_id"].append(doc_id)
                    out["span_idx"].append(i)
                    out["kind"].append(s["kind"])
                    out["media_ref"].append(s["media_ref"])
        return pa.Table.from_pydict(out, schema=MEDIA_SPANS)

    return documents.map_batches(explode, batch_format="pyarrow")


def _synth_payload(media_ref: str, n_bytes: int = 4096) -> bytes:
    """Deterministic pseudo-content for a media_ref (object-store fetch
    stand-in): blake2b keyed stream."""
    out = bytearray()
    counter = 0
    while len(out) < n_bytes:
        out += hashlib.blake2b(f"{media_ref}:{counter}".encode(), digest_size=64).digest()
        counter += 1
    return bytes(out[:n_bytes])


class FetchStage:
    """Actor-pool payload fetch (deterministic synthesis here; an s3/Lance
    blob read in production — the reason this is an actor: connection pools
    live in ``__init__``)."""

    def __init__(self, n_bytes: int = 4096) -> None:
        self.n_bytes = n_bytes

    def __call__(self, batch: pa.Table) -> pa.Table:
        payloads = [_synth_payload(r, self.n_bytes) for r in batch.column("media_ref").to_pylist()]
        return pa.Table.from_pydict(
            {
                "doc_id": batch.column("doc_id"),
                "span_idx": batch.column("span_idx"),
                "kind": batch.column("kind"),
                "media_ref": batch.column("media_ref"),
                "payload": pa.array(payloads, pa.binary()),
            },
            schema=PAYLOADS,
        )


def _fake_decode(payload: bytes, width: int, height: int, frame_idx: int = 0) -> np.ndarray:
    """Deterministic FAKE decode+feature (clearly marked: no codec in this
    sandbox).  Pure function of (payload, w, h, frame) so outputs are
    identical at any parallelism level."""
    h = hashlib.blake2b(payload, digest_size=8, salt=f"{width}x{height}f{frame_idx}".encode()[:16]).digest()
    rng = np.random.default_rng(int.from_bytes(h, "big"))
    return rng.standard_normal(FEATURE_DIM).astype(np.float32)


class DecodeStage:
    """Actor-pool decode + feature extraction.

    Real path: PIL (images) when importable — model/codec handles built
    once per actor in ``__init__``.  Sandbox path: ``_fake_decode``.
    Videos emit ``frames_per_video`` rows (frame sampling); image/audio one.
    """

    def __init__(self, width: int = 64, height: int = 64, frames_per_video: int = 3) -> None:
        self.width = width
        self.height = height
        self.frames = frames_per_video
        try:
            from PIL import Image

            self._pil_image = Image
        except ImportError:
            self._pil_image = None

    def _decode(self, payload: bytes, kind: str, frame_idx: int) -> tuple[np.ndarray, str]:
        """Decode one payload → (feature vector, backend used).

        PIL path (images, when Pillow is importable): open → grayscale →
        resize → FEATURE_DIM mean-pooled row blocks.  Any decode failure —
        Pillow missing, non-image kind, corrupt/synthetic payload — falls
        through to the deterministic fake, recorded per row as
        ``backend='fake'`` (never an exception: a 100-TB run must not die
        on one bad blob)."""
        if self._pil_image is not None and kind == "image":
            try:
                import io

                img = self._pil_image.open(io.BytesIO(payload)).convert("L")
                img = img.resize((self.width, self.height))
                px = np.asarray(img, dtype=np.float32) / 255.0
                # FEATURE_DIM mean-pooled horizontal bands — cheap, deterministic
                bands = np.array_split(px, FEATURE_DIM, axis=0)
                feat = np.array([b.mean() for b in bands], dtype=np.float32)
                return feat, "pil"
            except Exception:
                pass  # not a decodable image — fake fallback below
        return _fake_decode(payload, self.width, self.height, frame_idx), "fake"

    def __call__(self, batch: pa.Table) -> pa.Table:
        out: dict[str, list] = {k: [] for k in (
            "doc_id", "span_idx", "kind", "media_ref", "frame_idx", "width", "height", "feature", "backend"
        )}
        for doc_id, span_idx, kind, ref, payload in zip(
            batch.column("doc_id").to_pylist(),
            batch.column("span_idx").to_pylist(),
            batch.column("kind").to_pylist(),
            batch.column("media_ref").to_pylist(),
            batch.column("payload").to_pylist(),
        ):
            n_frames = self.frames if kind == "video" else 1
            for f in range(n_frames):
                feat, backend = self._decode(payload, kind, f)
                out["doc_id"].append(doc_id)
                out["span_idx"].append(span_idx)
                out["kind"].append(kind)
                out["media_ref"].append(ref)
                out["frame_idx"].append(f)
                out["width"].append(self.width)
                out["height"].append(self.height)
                out["feature"].append(feat.tolist())
                out["backend"].append(backend)
        return pa.Table.from_pydict(out, schema=FEATURES)


def feature_fp(feature: list[float]) -> str:
    """Scalar digest of a feature vector (md5 of the float32 bytes) — used
    by the driver-checkable media query so the oracle comparison hashes a
    string column instead of a list<float> (cross-engine-stable)."""
    return hashlib.md5(np.asarray(feature, dtype=np.float32).tobytes()).hexdigest()


def media_features(
    documents: ray.data.Dataset,
    width: int = 64,
    height: int = 64,
    frames_per_video: int = 3,
    payload_bytes: int = 4096,
    concurrency: tuple[int, int] = (1, 8),
    batch_size: int = 64,  # binary payloads: keep batches small (memory)
) -> ray.data.Dataset:
    """documents → per-media-span (or per-sampled-frame) feature rows."""
    spans = media_spans(documents)
    payloads = spans.map_batches(
        FetchStage,
        fn_constructor_kwargs={"n_bytes": payload_bytes},
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
    )
    return payloads.map_batches(
        DecodeStage,
        fn_constructor_kwargs={"width": width, "height": height, "frames_per_video": frames_per_video},
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
    )
