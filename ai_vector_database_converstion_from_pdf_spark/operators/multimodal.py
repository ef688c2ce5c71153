"""Multimodal columns — image/audio/video as opaque binary + typed metadata.

Training-data-pipeline extension (BASELINE.json north star). Decode is
REAL for the formats a lib-free container can honestly support — binary
PPM and uncompressed 24-bit BMP via the pure-numpy codecs in
`functions/imagecodec.py`, and mono 16-bit PCM WAV via
`functions/audiocodec.py` (public byte layouts); compressed formats
(PNG/JPEG, mp3/aac) route to PIL/ffmpeg when installed and raise
cleanly when not (`decode_image`, `decode_wav`); `decode_image_stub`
remains for payloads that are declared fake. The Spark-side plumbing — schema, partitioning, UDF
signatures, Arrow batch shapes — is identical across all three paths.

Scale notes: binary payloads ride in their own column so column pruning
keeps metadata-only queries payload-free; decode/feature-extract is
mapInPandas (per-partition batches, no shuffle); payload-heavy stages
should repartition by size estimate to even out skew from mixed media.
"""

from __future__ import annotations

import hashlib
import struct
from typing import Iterable, Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql.types import (
    BinaryType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

MEDIA_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("kind", StringType()),       # image | audio | video
        StructField("mime", StringType()),
        StructField("payload", BinaryType()),     # opaque bytes
        StructField("width", IntegerType()),      # typed metadata (nullable)
        StructField("height", IntegerType()),
        StructField("duration_ms", IntegerType()),
    ]
)


def synthetic_media(spark: SparkSession, n: int = 64) -> DataFrame:
    """Deterministic media rows for exercising the pipeline end-to-end.
    Image payloads are REAL encoded files (PPM and BMP alternating,
    deterministic gradient rasters); audio payloads are REAL mono 16-bit
    PCM WAV files (deterministic sine bursts); video payloads are REAL
    PVDV containers (`functions/videocodec.py`: length-prefixed PPM
    frames behind a fixed header) with deterministic moving-gradient
    frames."""
    from ..functions.audiocodec import encode_wav
    from ..functions.imagecodec import encode_bmp, encode_ppm
    from ..functions.videocodec import encode_video

    rows = []
    kinds = ["image", "audio", "video"]
    for i in range(n):
        kind = kinds[i % 3]
        w = 64 + i % 5 if kind != "audio" else None
        h = 48 + i % 7 if kind != "audio" else None
        if kind == "image":
            yy, xx = np.mgrid[0:h, 0:w]
            raster = np.stack(
                [
                    (xx * 255 // max(w - 1, 1)).astype(np.uint8),
                    (yy * 255 // max(h - 1, 1)).astype(np.uint8),
                    np.full((h, w), i % 256, dtype=np.uint8),
                ],
                axis=2,
            )
            if i % 2 == 0:
                payload, mime = encode_ppm(raster), "image/x-portable-pixmap"
            else:
                payload, mime = encode_bmp(raster), "image/bmp"
        elif kind == "audio":
            sr = 8000
            dur_ms = 100 + 40 * (i % 10)
            t = np.arange(sr * dur_ms // 1000, dtype=np.float64) / sr
            freq = 220.0 * (1 + i % 7)
            wave = (np.sin(2 * np.pi * freq * t) * 12000).astype(np.int16)
            payload, mime = encode_wav(wave, sr), "audio/wav"
        else:
            n_frames = 2 + i % 7
            fps = 1.0 + (i % 3)
            frames = []
            for j in range(n_frames):
                yy, xx = np.mgrid[0:h, 0:w]
                frames.append(
                    np.stack(
                        [
                            ((xx + 4 * j) * 255 // max(w - 1, 1) % 256).astype(np.uint8),
                            (yy * 255 // max(h - 1, 1)).astype(np.uint8),
                            np.full((h, w), (i + 16 * j) % 256, dtype=np.uint8),
                        ],
                        axis=2,
                    )
                )
            payload, mime = encode_video(frames, fps=fps), "video/x-pvdv"
        if kind == "image":
            dur = None
        elif kind == "audio":
            dur = dur_ms
        else:
            dur = int(n_frames / fps * 1000)
        rows.append((i, kind, mime, bytearray(payload), w, h, dur))
    return spark.createDataFrame(rows, MEDIA_SCHEMA)


def decode_image(payload: bytes, mime: str) -> np.ndarray:
    """REAL image decode by mime: PPM/BMP via the pure-numpy codecs;
    PNG/JPEG via PIL when installed, else a clean NotImplementedError.
    Returns HxWx3 uint8 RGB."""
    from ..functions import imagecodec

    if mime in ("image/x-portable-pixmap", "image/ppm"):
        return imagecodec.decode_ppm(payload)
    if mime in ("image/bmp", "image/x-bmp"):
        return imagecodec.decode_bmp(payload)
    try:
        from io import BytesIO

        from PIL import Image  # type: ignore
    except ImportError as e:
        raise NotImplementedError(
            f"decoding {mime} requires PIL (absent in this container); "
            "PPM/BMP decode natively"
        ) from e
    return np.asarray(Image.open(BytesIO(payload)).convert("RGB"))


def decode_image_stub(payload: bytes, width: int, height: int) -> np.ndarray:
    """STUB decode — a real deployment calls PIL.Image.open here
    (lib not present in this container). Produces a deterministic fake
    raster from the payload bytes so downstream stages are testable.
    Raises on non-positive dims like a real decoder would."""
    if not width or not height or width <= 0 or height <= 0:
        raise NotImplementedError(
            "decode requires valid dimensions; real decoder (PIL/ffmpeg) absent in container"
        )
    seed = np.frombuffer(hashlib.md5(payload or b"").digest(), dtype=np.uint8)
    reps = int(np.ceil(width * height * 3 / len(seed)))
    return np.tile(seed, reps)[: width * height * 3].reshape(height, width, 3)


FEATURE_SCHEMA = (
    "media_id long, kind string, n_bytes long, sha1 string, "
    "mean_intensity double, aspect double, frames_sampled int, "
    "rms double, zcr double, sample_rate int"
)


def extract_features(media: DataFrame, frame_stride_ms: int = 5000) -> DataFrame:
    """Decode / feature-extract / frame-sample via mapInPandas. Images:
    mean raster intensity + aspect ratio; video: sampled frame count at
    the stride; audio: REAL PCM-WAV decode (`functions/audiocodec.py`)
    → RMS amplitude + zero-crossing rate + sample rate, with undecodable
    payloads yielding nulls rather than failing the stage. Payload
    column is pruned from the output (features only — the 100 TB
    anti-pattern is carrying payloads past the stage that needs them)."""
    from ..functions import audiocodec

    def per_batch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {
                "media_id": [], "kind": [], "n_bytes": [], "sha1": [],
                "mean_intensity": [], "aspect": [], "frames_sampled": [],
                "rms": [], "zcr": [], "sample_rate": [],
            }
            for r in pdf.itertuples(index=False):
                payload = bytes(r.payload) if r.payload is not None else b""
                out["media_id"].append(r.media_id)
                out["kind"].append(r.kind)
                out["n_bytes"].append(len(payload))
                out["sha1"].append(hashlib.sha1(payload).hexdigest())
                if r.kind == "audio" and r.mime == "audio/wav":
                    try:
                        samples, sr = audiocodec.decode_wav(payload)
                        out["rms"].append(round(audiocodec.rms(samples), 6))
                        out["zcr"].append(
                            round(audiocodec.zero_crossing_rate(samples), 6)
                        )
                        out["sample_rate"].append(sr)
                    except (NotImplementedError, ValueError):
                        out["rms"].append(None)
                        out["zcr"].append(None)
                        out["sample_rate"].append(None)
                else:
                    out["rms"].append(None)
                    out["zcr"].append(None)
                    out["sample_rate"].append(None)
                if r.kind == "image" and r.width and r.height:
                    try:
                        raster = decode_image(payload, r.mime)
                    except (NotImplementedError, ValueError):
                        # undecodable format in this environment: fall
                        # back to the declared-fake raster so the stage
                        # still yields a feature row (a production run
                        # would dead-letter instead)
                        raster = decode_image_stub(payload, int(r.width), int(r.height))
                    out["mean_intensity"].append(float(raster.mean()))
                    out["aspect"].append(round(float(r.width) / float(r.height), 6))
                    out["frames_sampled"].append(1)
                elif r.kind == "video" and r.duration_ms is not None:
                    out["mean_intensity"].append(None)
                    aspect = (
                        round(float(r.width) / float(r.height), 6)
                        if r.width and r.height
                        else None
                    )
                    out["aspect"].append(aspect)
                    if r.mime == "video/x-pvdv":
                        # REAL container: frame count from the O(1)
                        # header, stride converted to whole frames
                        from ..functions.videocodec import video_info

                        try:
                            n_frames, fps = video_info(payload)
                            every = max(1, int(round(frame_stride_ms * fps / 1000)))
                            out["frames_sampled"].append(
                                len(range(0, n_frames, every))
                            )
                        except (ValueError, struct.error):
                            out["frames_sampled"].append(0)
                    else:
                        out["frames_sampled"].append(
                            max(1, int(r.duration_ms) // frame_stride_ms)
                        )
                else:
                    out["mean_intensity"].append(None)
                    out["aspect"].append(None)
                    out["frames_sampled"].append(0)
            yield pd.DataFrame(out)

    return media.mapInPandas(per_batch, FEATURE_SCHEMA)


def resize_images(media: DataFrame, target: tuple[int, int] = (32, 32)) -> DataFrame:
    """REAL resize for decodable formats: decode → nearest-neighbor
    resample → re-encode as PPM (payloads stay self-describing files,
    not raw blobs); undecodable payloads fall back to the declared-fake
    raster. Binary-in/binary-out UDF shape."""
    from ..functions.imagecodec import encode_ppm, nearest_resize

    tw, th = target

    def per_batch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = {"media_id": [], "mime": [], "payload": [], "width": [], "height": []}
            for r in pdf.itertuples(index=False):
                if r.kind != "image" or not r.width or not r.height:
                    continue
                payload = bytes(r.payload)
                try:
                    raster = decode_image(payload, r.mime)
                except (NotImplementedError, ValueError):
                    raster = decode_image_stub(payload, int(r.width), int(r.height))
                small = nearest_resize(raster, tw, th)
                rows["media_id"].append(r.media_id)
                rows["mime"].append("image/x-portable-pixmap")
                rows["payload"].append(encode_ppm(small))
                rows["width"].append(tw)
                rows["height"].append(th)
            yield pd.DataFrame(rows)

    return media.mapInPandas(
        per_batch, "media_id long, mime string, payload binary, width int, height int"
    )


def sample_frames(media: DataFrame, every_n: int = 2) -> DataFrame:
    """Frame sampling as a row-expanding operator: every ``every_n``-th
    frame of each PVDV video becomes ONE output row carrying the frame
    as a self-describing PPM payload — the shape a downstream image
    stage (`extract_features`, `resize_images`, a captioner UDF)
    consumes unchanged.

    Skipped frames are never decoded: the sampler hops the container's
    length prefixes (`videocodec.sample_frame_bytes`), so the cost
    scales with frames KEPT. Map-side mapInPandas, no shuffle; non-video
    and foreign-container rows drop out (a production run would
    dead-letter them)."""
    from ..functions.videocodec import sample_frame_bytes

    def per_batch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = {
                "media_id": [], "frame_idx": [], "kind": [], "mime": [],
                "payload": [], "width": [], "height": [],
            }
            for r in pdf.itertuples(index=False):
                if r.kind != "video" or r.mime != "video/x-pvdv":
                    continue
                try:
                    sampled = sample_frame_bytes(bytes(r.payload), every_n)
                except (ValueError, struct.error):
                    continue
                for idx, blob in sampled:
                    rows["media_id"].append(r.media_id)
                    rows["frame_idx"].append(idx)
                    rows["kind"].append("image")
                    rows["mime"].append("image/x-portable-pixmap")
                    rows["payload"].append(blob)
                    rows["width"].append(r.width)
                    rows["height"].append(r.height)
            yield pd.DataFrame(rows)

    return media.mapInPandas(
        per_batch,
        "media_id long, frame_idx int, kind string, mime string, "
        "payload binary, width int, height int",
    )


def _gray8(raster: "np.ndarray", w: int, h: int) -> "np.ndarray":
    """Grayscale + nearest-resize to (h, w) float64."""
    from ..functions.imagecodec import nearest_resize

    if raster.ndim == 3:
        raster = raster.mean(axis=2)
    return nearest_resize(
        raster.astype(np.uint8)[:, :, None].repeat(3, axis=2), w, h
    ).mean(axis=2).astype(np.float64)


def perceptual_hashes(media: DataFrame) -> DataFrame:
    """Per-image perceptual hashes for near-dup detection on the binary
    column: aHash (8x8 mean-threshold) and dHash (horizontal gradient
    over a 9x8 downsample), each a 64-bit long. Tiny brightness/noise/
    re-encode edits move a handful of bits; unrelated images differ in
    ~32. Map-side mapInPandas decode (payload pruned from the output);
    undecodable rows yield NULL hashes instead of failing the stage.

    Bit order is fixed (row-major, MSB first), so hashes are stable
    across partitionings and sessions."""

    def per_batch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {"media_id": [], "ahash": [], "dhash": []}
            for r in pdf.itertuples(index=False):
                out["media_id"].append(r.media_id)
                if r.kind != "image":
                    out["ahash"].append(None)
                    out["dhash"].append(None)
                    continue
                try:
                    raster = decode_image(bytes(r.payload), r.mime)
                except (NotImplementedError, ValueError):
                    out["ahash"].append(None)
                    out["dhash"].append(None)
                    continue
                a8 = _gray8(raster, 8, 8)
                abits = (a8 > a8.mean()).flatten()
                d98 = _gray8(raster, 9, 8)
                dbits = (d98[:, :-1] > d98[:, 1:]).flatten()
                # MSB-first bit pack, masked to 63 bits so the value
                # stays inside a signed Spark long
                to_int = lambda bits: (
                    sum(int(b) << (len(bits) - 1 - i) for i, b in enumerate(bits))
                    & 0x7FFFFFFFFFFFFFFF
                )
                out["ahash"].append(to_int(abits))
                out["dhash"].append(to_int(dbits))
            yield pd.DataFrame(out)

    return media.mapInPandas(
        per_batch, "media_id long, ahash long, dhash long"
    )


def image_near_dup_pairs(
    media: DataFrame, max_hamming: int = 6, band_bits: int = 9
) -> DataFrame:
    """Image near-dup pairs via pigeonhole banding on the dHash (the
    simhash_pairs idiom applied to the multimodal column): split the
    63-bit hash into n_bands > max_hamming bands; a pair within
    max_hamming cannot differ in every band, so it collides on at least
    one whole band — candidates come from a band equi-join and the
    exact Hamming check runs on candidates only.

    Scale shape: ONE mapInPandas decode pass, band explode (tiny),
    bucket posting-list pair explosion, expression-only verify
    (bit_count(xor)) — no all-pairs image comparison anywhere."""
    ph = perceptual_hashes(media).filter(F.col("dhash").isNotNull())
    n_bands = 63 // band_bits + (1 if 63 % band_bits else 0)
    if max_hamming >= n_bands:
        raise ValueError(
            f"pigeonhole guarantee needs max_hamming < n_bands "
            f"({max_hamming} >= {n_bands}); lower band_bits"
        )
    mask = (1 << band_bits) - 1
    bands = F.array(
        *[
            F.struct(
                F.lit(b).alias("band"),
                F.shiftright("dhash", b * band_bits)
                .bitwiseAND(F.lit(mask))
                .alias("band_val"),
            )
            for b in range(n_bands)
        ]
    )
    exploded = ph.select(
        "media_id", "dhash", F.explode(bands).alias("bk")
    ).select(
        "media_id", "dhash", F.col("bk.band").alias("band"),
        F.col("bk.band_val").alias("band_val"),
    )
    pl = (
        exploded.groupBy("band", "band_val")
        .agg(F.collect_set(F.struct("media_id", "dhash")).alias("ms"))
        .filter(F.size("ms") > 1)
        .select(F.array_sort("ms").alias("ms"))
    )
    pairs = (
        pl.select(
            F.explode(
                F.flatten(
                    F.transform(
                        "ms",
                        lambda x, i: F.transform(
                            F.slice(F.col("ms"), i + 2, F.size(F.col("ms"))),
                            lambda y: F.struct(
                                x["media_id"].alias("id_a"),
                                y["media_id"].alias("id_b"),
                                x["dhash"].alias("ha"),
                                y["dhash"].alias("hb"),
                            ),
                        ),
                    )
                )
            ).alias("p")
        )
        .select("p.id_a", "p.id_b", "p.ha", "p.hb")
        .distinct()
    )
    ham = F.bit_count(F.col("ha").bitwiseXOR(F.col("hb")))
    return (
        pairs.select("id_a", "id_b", ham.alias("hamming"))
        .filter(F.col("hamming") <= F.lit(int(max_hamming)))
    )


def audio_fingerprints(
    media: DataFrame,
    frame_len: int = 256,
    hop: int = 128,
    n_bands: int = 4,
) -> DataFrame:
    """Per-audio spectral fingerprints for near-dup detection on the
    binary column — the audio sibling of perceptual_hashes. Shazam-lite
    scheme: frame the PCM signal (frame_len samples, hop overlap), FFT
    each frame, take the peak frequency bin in each of `n_bands`
    log-spaced bands, and pack the banded peaks into one long per
    frame. The fingerprint is the DISTINCT set of frame hashes —
    invariant to amplitude scaling (argmax is), robust to mild noise,
    and stable across partitionings (pure numpy per row).

    Output: (media_id, fp_hash) exploded — ready for a posting-list
    self-join. Non-audio / undecodable rows yield no fingerprint rows
    instead of failing the stage (the quarantine convention)."""
    from ..functions.audiocodec import decode_wav

    def per_batch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, hashes = [], []
            for r in pdf.itertuples(index=False):
                if r.kind != "audio":
                    continue
                try:
                    samples, _sr = decode_wav(bytes(r.payload))
                except (NotImplementedError, ValueError, struct.error):
                    # struct.error: RIFF header present but a chunk is
                    # truncated — quarantine the row, don't fail the stage
                    continue
                x = samples.astype(np.float64)
                if len(x) < frame_len:
                    continue
                n_frames = 1 + (len(x) - frame_len) // hop
                idx = (
                    np.arange(frame_len)[None, :]
                    + hop * np.arange(n_frames)[:, None]
                )
                mags = np.abs(np.fft.rfft(x[idx] * np.hanning(frame_len), axis=1))
                # log-spaced band edges over the positive spectrum
                # (skip DC); peak bin per band, packed 8 bits/band
                n_bins = mags.shape[1]
                edges = np.unique(
                    np.geomspace(2, n_bins - 1, n_bands + 1).astype(int)
                )
                seen = set()
                for f in range(n_frames):
                    fmax = mags[f].max()
                    h = 0
                    for b in range(len(edges) - 1):
                        lo, hi = edges[b], edges[b + 1]
                        peak = int(lo + np.argmax(mags[f, lo:hi]))
                        # a band contributes only if its peak carries
                        # real energy (>= 10% of the frame max): weak
                        # bands are quantization noise, whose argmax
                        # shifts with amplitude — gating on a RATIO
                        # keeps the hash scale-invariant
                        code = peak if fmax > 0 and mags[f, peak] >= 0.1 * fmax else 0
                        h = (h << 8) | (code & 0xFF)
                    seen.add(h)
                for h in seen:
                    ids.append(r.media_id)
                    hashes.append(h)
            yield pd.DataFrame({"media_id": ids, "fp_hash": hashes})

    return media.mapInPandas(per_batch, "media_id long, fp_hash long")


def audio_near_dup_pairs(
    media: DataFrame, min_matches: int = 3, max_doc_freq: int = 50
) -> DataFrame:
    """Audio near-dup pairs: posting-list self-join on shared
    fingerprint hashes (the word_shingles/ngram-Jaccard idiom applied
    to spectra) — (id_a, id_b, n_matches) for pairs sharing >=
    min_matches distinct frame hashes. Hot hashes (silence, test tones)
    are capped at max_doc_freq exactly like hot shingles, bounding the
    pair explosion at C(cap, 2) per hash.

    Scale shape: ONE mapInPandas decode pass, one hash-keyed groupBy,
    candidate pair counts only — never an all-pairs audio compare."""
    fp = audio_fingerprints(media)
    pl = (
        fp.groupBy("fp_hash")
        .agg(F.collect_set("media_id").alias("ids"))
        .filter(
            (F.size("ids") > 1) & (F.size("ids") <= max_doc_freq)
        )
        .select(F.array_sort("ids").alias("ids"))
    )
    pairs = pl.select(
        F.explode(
            F.filter(
                F.flatten(
                    F.transform(
                        F.col("ids"),
                        lambda a: F.transform(
                            F.col("ids"),
                            lambda b: F.struct(a.alias("id_a"), b.alias("id_b")),
                        ),
                    )
                ),
                lambda s: s["id_a"] < s["id_b"],
            )
        ).alias("p")
    ).select("p.id_a", "p.id_b")
    return (
        pairs.groupBy("id_a", "id_b")
        .agg(F.count("*").cast("long").alias("n_matches"))
        .filter(F.col("n_matches") >= min_matches)
    )
