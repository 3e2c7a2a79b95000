"""Multimodal (image/audio/video) column plumbing.

Media travel as opaque `binary` columns with typed metadata alongside; all
heavy per-item work (decode, resize, feature extraction, frame sampling)
runs as Arrow-batched pandas functions over `mapInPandas` so the bytes
never round-trip through per-row Python.

The actual codecs (PIL/ffmpeg/librosa) are NOT available in this
container, so the decode step is stubbed two ways:
- `decoder="strict"` raises NotImplementedError (prod wiring point)
- `decoder="fake"`  parses the deterministic FAKE1 container written by
  `fake_media_bytes` — which keeps every piece of Spark plumbing (schema,
  batch shape, partitioning, UDF signature) real and testable.

FAKE1 container layout (little-endian):
    magic   4s   b"FAK1"
    kind    u8   0=image 1=audio 2=video
    width   u32  (or sample-rate for audio)
    height  u32  (or n_samples  for audio)
    frames  u32  (1 for image)
    payload u8[] deterministic bytes (seeded from header)
"""

from __future__ import annotations

import struct
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F

MAGIC = b"FAK1"
KIND_IMAGE, KIND_AUDIO, KIND_VIDEO = 0, 1, 2

MEDIA_META_SCHEMA = (
    "media_kind int, width int, height int, n_frames int, n_bytes bigint"
)
FEATURE_SCHEMA = "width int, height int, n_frames int, mean_pixel double"


def fake_media_bytes(seed: int, kind: int = KIND_IMAGE) -> bytes:
    """Deterministic fake media blob — pure function of (seed, kind)."""
    rng = np.random.RandomState(seed & 0x7FFFFFFF)
    if kind == KIND_IMAGE:
        w, h, fr = int(rng.randint(8, 64)), int(rng.randint(8, 64)), 1
        payload = rng.randint(0, 256, size=w * h, dtype=np.int64).astype(np.uint8)
    elif kind == KIND_AUDIO:
        w, h, fr = 16000, int(rng.randint(100, 1000)), 1
        payload = rng.randint(0, 256, size=h, dtype=np.int64).astype(np.uint8)
    else:
        w, h, fr = int(rng.randint(8, 32)), int(rng.randint(8, 32)), int(
            rng.randint(2, 10)
        )
        payload = rng.randint(0, 256, size=w * h * fr, dtype=np.int64).astype(np.uint8)
    head = struct.pack("<4sBIII", MAGIC, kind, w, h, fr)
    return head + payload.tobytes()


def decode_fake(blob: bytes) -> tuple[int, int, int, np.ndarray]:
    magic, kind, w, h, fr = struct.unpack_from("<4sBIII", blob, 0)
    if magic != MAGIC:
        raise ValueError("not a FAKE1 container")
    payload = np.frombuffer(blob, dtype=np.uint8, offset=struct.calcsize("<4sBIII"))
    return w, h, fr, payload


def encode_fake(img: np.ndarray) -> bytes:
    """Inverse of decode_fake for a single grayscale frame (h, w)."""
    h, w = img.shape
    head = struct.pack("<4sBIII", MAGIC, KIND_IMAGE, w, h, 1)
    return head + np.ascontiguousarray(img, dtype=np.uint8).tobytes()


def decode_ppm(blob: bytes) -> tuple[int, int, int, np.ndarray]:
    """A REAL image codec through the injectable-decoder seam: binary
    PGM (P5, grayscale) and PPM (P6, RGB) — the stdlib-only Netpbm
    formats every image tool can write (`convert x.png x.ppm`).  Proves
    the seam end-to-end without PIL: header parse (whitespace + '#'
    comments per the spec), maxval <= 255, then the raster as the
    operator contract's (w, h, 1, uint8 payload); P6 RGB collapses to
    integer Rec.601 luma ((299 R + 587 G + 114 B) // 1000) so a single
    deterministic grayscale frame feeds resize/ahash/features exactly
    like FAKE1 does.  Raises ValueError on malformed input (the
    documented codec contract; ahash64_hex maps ANY decoder raise to
    None)."""
    pos = 0

    def token() -> bytes:
        nonlocal pos
        while pos < len(blob):
            c = blob[pos : pos + 1]
            if c == b"#":
                nl = blob.find(b"\n", pos)
                if nl < 0:
                    raise ValueError("unterminated PPM comment")
                pos = nl + 1
            elif c.isspace():
                pos += 1
            else:
                break
        start = pos
        while pos < len(blob) and not blob[pos : pos + 1].isspace():
            pos += 1
        if start == pos:
            raise ValueError("truncated PPM header")
        return blob[start:pos]

    magic = token()
    if magic not in (b"P5", b"P6"):
        raise ValueError(f"not a binary PGM/PPM: {magic!r}")
    w, h, maxval = int(token()), int(token()), int(token())
    if w <= 0 or h <= 0 or not (0 < maxval < 256):
        raise ValueError("bad PPM dimensions/maxval")
    pos += 1  # exactly ONE whitespace byte separates header and raster
    ch = 3 if magic == b"P6" else 1
    raster = np.frombuffer(blob, dtype=np.uint8, offset=pos, count=-1)
    if raster.size < w * h * ch:
        raise ValueError("truncated PPM raster")
    raster = raster[: w * h * ch]
    if maxval != 255:
        # spec-legal low-maxval files (e.g. 4-bit quantizers write
        # maxval 15) carry samples 0..maxval; rescale to the operator
        # contract's full 0..255 range with round-half-up integer math
        raster = (
            (raster.astype(np.int64) * 255 + maxval // 2) // maxval
        ).astype(np.uint8)
    if ch == 3:
        rgb = raster.reshape(-1, 3).astype(np.int64)
        raster = (
            (299 * rgb[:, 0] + 587 * rgb[:, 1] + 114 * rgb[:, 2]) // 1000
        ).astype(np.uint8)
    return w, h, 1, raster


def encode_ppm(img: np.ndarray, comment: str | None = None) -> bytes:
    """Binary PGM (P5) writer for one grayscale frame (h, w) — the
    inverse of decode_ppm's grayscale path, for tests and fixtures."""
    h, w = img.shape
    head = f"P5\n{'# ' + comment + chr(10) if comment else ''}{w} {h}\n255\n"
    return head.encode("ascii") + np.ascontiguousarray(img, dtype=np.uint8).tobytes()


#: Decoder contract for every operator below: callable(blob: bytes) ->
#: (width, height, n_frames, payload uint8 ndarray of w*h*n_frames).
#: A PIL/ffmpeg-equipped cluster injects its real codec as this callable
#: (it is cloudpickled into the Arrow-batch closure like any other UDF
#: capture) without touching library code; CI keeps using FAKE1.
def _resolve_decoder(decoder, what: str):
    if callable(decoder):
        return decoder
    if decoder == "fake":
        return decode_fake
    if decoder == "ppm":
        return decode_ppm
    if decoder == "strict":
        raise NotImplementedError(
            f"real {what} requires PIL/ffmpeg (absent from this container); "
            "pass decoder=<callable blob -> (w, h, n_frames, uint8 payload)> "
            "to plug a codec in, decoder='ppm' for binary PGM/PPM images, "
            "or decoder='fake' for FAKE1 blobs"
        )
    raise ValueError(
        f"decoder must be 'fake', 'ppm', 'strict', or a callable: {decoder!r}"
    )


def with_media_meta(df: DataFrame, media_col: str = "media") -> DataFrame:
    """Typed metadata via JVM built-ins only — no decode, no Python:
    magic sniff + header field extraction with substring/conv.  At scale
    this runs in the scan stage; a malformed blob yields kind=-1."""
    blob = F.col(media_col)
    is_fake = F.substring(blob, 1, 4) == F.lit(MAGIC)

    def _le32(offset: int):
        # little-endian u32 from 4 header bytes (1-based offsets)
        b = [
            F.conv(F.hex(F.substring(blob, offset + i, 1)), 16, 10).cast("long")
            for i in range(4)
        ]
        return b[0] + b[1] * 256 + b[2] * 65536 + b[3] * 16777216

    kind = F.conv(F.hex(F.substring(blob, 5, 1)), 16, 10).cast("int")
    return (
        df.withColumn("media_kind", F.when(is_fake, kind).otherwise(F.lit(-1)))
        .withColumn("width", F.when(is_fake, _le32(6).cast("int")))
        .withColumn("height", F.when(is_fake, _le32(10).cast("int")))
        .withColumn("n_frames", F.when(is_fake, _le32(14).cast("int")))
        .withColumn("n_bytes", F.octet_length(blob).cast("long"))
    )


def extract_features(
    df: DataFrame,
    media_col: str = "media",
    id_col: str = "doc_id",
    decoder="fake",
) -> DataFrame:
    """Decode + feature-extract over Arrow batches (`mapInPandas`).

    Output: (id_col, width, height, n_frames, mean_pixel).  `decoder=`
    "strict" is the production wiring point for a real codec (PIL etc.)
    and raises NotImplementedError; "fake" parses FAKE1 blobs; a
    CALLABLE with the `_resolve_decoder` contract plugs a real codec in
    (raises at call time on the driver, not mid-job on an executor).
    Column pruning matters: only (id, media) cross the Arrow boundary.
    """
    dec = _resolve_decoder(decoder, "media decoding")
    sdf = df.select(F.col(id_col), F.col(media_col).alias("__media"))
    # the id column passes through with the CALLER'S type (string chunk
    # ids are as valid as numeric doc ids) — a hardcoded `long` schema
    # plus int(i) coercion crashed on non-integer ids
    id_type = df.schema[id_col].dataType.simpleString()
    out_schema = f"`{id_col}` {id_type}, {FEATURE_SCHEMA}"

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ws, hs, frs, mps = [], [], [], []
            for blob in pdf["__media"]:
                w, h, fr, payload = dec(bytes(blob))
                ws.append(w)
                hs.append(h)
                frs.append(fr)
                mps.append(float(payload.mean()) if payload.size else float("nan"))
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col].reset_index(drop=True),
                    "width": pd.Series(ws, dtype="int32"),
                    "height": pd.Series(hs, dtype="int32"),
                    "n_frames": pd.Series(frs, dtype="int32"),
                    "mean_pixel": pd.Series(mps, dtype="float64"),
                }
            )

    return sdf.mapInPandas(run, schema=out_schema)


def resize_images(
    df: DataFrame,
    media_col: str = "media",
    id_col: str = "doc_id",
    target: tuple[int, int] = (32, 32),
    decoder="fake",
    encoder=encode_fake,
) -> DataFrame:
    """Nearest-neighbor resize: real Arrow plumbing, pluggable pixels.
    Output (id, width, height, media binary) with a re-encoded blob —
    the binary-in/binary-out batch transform shape.  `decoder`/`encoder`
    follow the `_resolve_decoder` contract (encoder: (h, w) uint8 frame
    -> bytes; default re-encodes FAKE1)."""
    dec = _resolve_decoder(decoder, "image resize")
    sdf = df.select(F.col(id_col), F.col(media_col).alias("__media"))
    tw, th = target
    id_type = df.schema[id_col].dataType.simpleString()

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            blobs = []
            for blob in pdf["__media"]:
                w, h, fr, payload = dec(bytes(blob))
                if fr == 1 and payload.size == w * h:
                    img = payload.reshape(h, w)
                    ry = (np.arange(th) * h // th).astype(np.int64)
                    rx = (np.arange(tw) * w // tw).astype(np.int64)
                    blobs.append(encoder(img[np.ix_(ry, rx)]))
                else:
                    blobs.append(bytes(blob))
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col].reset_index(drop=True),
                    "width": pd.Series([tw] * len(blobs), dtype="int32"),
                    "height": pd.Series([th] * len(blobs), dtype="int32"),
                    "media": blobs,
                }
            )

    return sdf.mapInPandas(
        run, schema=f"`{id_col}` {id_type}, width int, height int, media binary"
    )


def sample_frames(
    df: DataFrame,
    media_col: str = "media",
    id_col: str = "doc_id",
    every: int = 2,
    decoder="fake",
    encoder=encode_fake,
) -> DataFrame:
    """Frame sampling for videos: one output row per sampled frame
    (id, frame_idx, frame binary) — the explode-shaped batch transform a
    video pipeline needs.  `decoder`/`encoder` follow the
    `_resolve_decoder` contract (a real demuxer plugs in as decoder)."""
    dec = _resolve_decoder(decoder, "video demuxing")
    sdf = df.select(F.col(id_col), F.col(media_col).alias("__media"))
    id_type = df.schema[id_col].dataType.simpleString()

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            pos, idxs, frames = [], [], []
            for n, blob in enumerate(pdf["__media"]):
                w, h, fr, payload = dec(bytes(blob))
                if payload.size != w * h * fr:
                    continue
                vid = payload.reshape(fr, h, w)
                for f in range(0, fr, every):
                    pos.append(n)
                    idxs.append(f)
                    frames.append(encoder(vid[f]))
            yield pd.DataFrame(
                {
                    # positional gather keeps the caller's id dtype even
                    # under the 1:many expansion / malformed-blob drops
                    id_col: pdf[id_col].iloc[pos].reset_index(drop=True),
                    "frame_idx": pd.Series(idxs, dtype="int32"),
                    "frame": frames,
                }
            )

    return sdf.mapInPandas(
        run, schema=f"`{id_col}` {id_type}, frame_idx int, frame binary"
    )


def binary_meta(
    df: DataFrame, binary_col, id_col: str = "doc_id"
) -> DataFrame:
    """Generic opaque-binary metadata: byte length + md5 — the minimal
    contract every media table gets regardless of codec availability."""
    b = F.col(binary_col) if isinstance(binary_col, str) else binary_col
    return df.select(
        F.col(id_col),
        F.octet_length(b).cast("long").alias("n_bytes"),
        F.md5(b).alias("content_md5"),
    )


def ahash64_hex(blob: bytes, dec=decode_fake) -> str | None:
    """Pure-Python aHash of ONE image blob: resize to 8x8 by block
    mean (integer block edges; edge blocks absorb the remainder),
    threshold at the mean, pack 64 bits as a 16-hex string.  Returns
    None for malformed/truncated blobs.  `dec` follows the
    `_resolve_decoder` contract (default FAKE1).

    Shared by `ahash_images` (inside its Arrow batch loop) and by oracle
    generators that need the identical value without a Spark session —
    the hash is a pure function of the blob bytes.

    The hash contract is "None on undecodable": an INJECTED codec is free
    to signal malformed input with whatever its library raises (PIL's
    UnidentifiedImageError is an OSError, ffmpeg adapters raise KeyError
    on container probing, ...), so ANY exception from the decoder maps to
    None here rather than aborting a whole Spark job mid-batch."""
    try:
        w, h, _fr, payload = dec(bytes(blob))
    except Exception:
        return None
    img = payload[: w * h].astype(np.float64)
    if img.size < w * h:
        return None
    img = img.reshape(h, w)
    ys = np.linspace(0, h, 9, dtype=np.int64)
    xs = np.linspace(0, w, 9, dtype=np.int64)
    cells = np.empty((8, 8))
    for r in range(8):
        for c in range(8):
            cells[r, c] = img[ys[r]:ys[r + 1], xs[c]:xs[c + 1]].mean()
    bits = (cells >= cells.mean()).flatten()
    v = 0
    for b in bits:
        v = (v << 1) | int(b)
    return format(v, "016x")


def noisy_image_twin(blob: bytes, flips: int, seed: int) -> bytes:
    """A lightly-perturbed copy of a FAKE1 image: `flips` pixels nudged
    by +8 (deterministic under `seed`).  Perceptually near-identical —
    its aHash lands within a few bits of the original's — so twins built
    with this pair up under `ahash_near_pairs`."""
    w, h, fr, payload = decode_fake(blob)
    rng = np.random.RandomState(seed & 0x7FFFFFFF)
    p = payload.copy()
    idx = rng.choice(p.size, size=min(flips, p.size), replace=False)
    p[idx] = (p[idx].astype(np.int64) + 8).clip(0, 255).astype(np.uint8)
    head = struct.pack("<4sBIII", MAGIC, KIND_IMAGE, w, h, fr)
    return head + p.tobytes()


def ahash_images(
    df: DataFrame,
    media_col: str = "media",
    id_col: str = "doc_id",
    decoder="fake",
) -> DataFrame:
    """Perceptual average-hash (aHash) per image — see `ahash64_hex` for
    the hash itself; visually-near-identical images land within a few
    bits.  Malformed blobs are skipped (their rows are dropped).

    The decode+hash is Arrow-batched `mapInPandas` (the only Python is
    NumPy over decoded pixel arrays); everything downstream is JVM:
    the returned (id, ahash) frame plugs straight into
    `dedup.simhash_near_pairs`-style 16-bit-chunk blocking via
    `ahash_near_pairs`.  `decoder` follows the `_resolve_decoder`
    contract — "strict" raises (real-codec wiring point), a callable
    plugs a PIL-style decoder in."""
    dec = _resolve_decoder(decoder, "image decoding")
    sdf = df.select(F.col(id_col), F.col(media_col).alias("__media"))
    id_type = df.schema[id_col].dataType.simpleString()

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            pos, hashes = [], []
            for n, blob in enumerate(pdf["__media"]):
                hx = ahash64_hex(blob, dec)
                if hx is None:
                    continue
                pos.append(n)
                hashes.append(hx)
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col].iloc[pos].reset_index(drop=True),
                    "ahash": hashes,
                }
            )

    return sdf.mapInPandas(run, schema=f"`{id_col}` {id_type}, ahash string")


def ahash_near_pairs(
    hashed: DataFrame,
    id_col: str = "doc_id",
    max_hamming: int = 3,
    max_bucket: int = 1000,
) -> DataFrame:
    """Near-duplicate image pairs from aHash signatures: identical
    pigeonhole blocking + bucket-guard + exact hamming verification as
    text SimHash — the signatures share the 16-hex shape, so the dedup
    machinery is reused rather than reimplemented."""
    from .dedup import _bounded_buckets

    if max_hamming > 3:
        raise ValueError(
            "4-chunk pigeonhole blocking only guarantees completeness for "
            f"max_hamming <= 3 (got {max_hamming})"
        )
    chunks = hashed.select(
        F.col(id_col),
        F.explode(
            F.array(*[
                F.concat(F.lit(f"{c}:"), F.substring("ahash", c * 4 + 1, 4))
                for c in range(4)
            ])
        ).alias("chunk"),
    )
    buckets = _bounded_buckets(chunks, ("chunk",), id_col, max_bucket)
    pairs = F.flatten(
        F.transform(
            "__ids",
            lambda a, i: F.transform(
                F.slice("__ids", i + 2, F.size("__ids")),
                lambda b: F.struct(a.alias("id_a"), b.alias("id_b")),
            ),
        )
    )
    cand = (
        buckets.select(F.explode(pairs).alias("p"))
        .select("p.id_a", "p.id_b")
        .distinct()
    )
    a = hashed.select(F.col(id_col).alias("id_a"), F.col("ahash").alias("__ha"))
    b = hashed.select(F.col(id_col).alias("id_b"), F.col("ahash").alias("__hb"))
    nib_xor = F.transform(
        F.sequence(F.lit(1), F.lit(16)),
        lambda i: F.bit_count(
            F.conv(F.substring("__ha", i, 1), 16, 10).cast("long")
            .bitwiseXOR(F.conv(F.substring("__hb", i, 1), 16, 10).cast("long"))
        ),
    )
    return (
        cand.join(a, "id_a")
        .join(b, "id_b")
        .withColumn(
            "hamming",
            F.aggregate(nib_xor, F.lit(0), lambda acc, x: acc + x).cast("long"),
        )
        .filter(F.col("hamming") <= max_hamming)
        .select("id_a", "id_b", "hamming")
    )
