"""Multimodal columns: image/audio/video as opaque binary columns with
typed metadata, processed via Arrow-batched mapInPandas — plus REAL
pure-python codecs for the three container formats the fixtures carry:

* PNG  — full decoder (chunk walk, IHDR, zlib-inflate IDAT, all five
  scanline filters, grayscale + RGB 8-bit) and a minimal encoder.
* WAV  — RIFF/fmt/data parse to int16 PCM and back.
* MP4  — box walk to moov/mvhd (timescale + duration) and a skeleton
  writer; FRAME decode still needs a video lib (pyav), so only the
  container metadata is real for video.
* JPEG — marker walk to the SOFn frame header (dimensions, component
  count, precision; handles fill bytes, standalone markers, and
  entropy-coded scan data) and a skeleton writer; pixel decode needs a
  huffman+DCT stage, metadata-only like MP4.

``synth_media`` emits real PNG/WAV/MP4 payloads whose pixel/sample
patterns are closed-form in (media_id, x, y) — so the registry query
``media_features`` decodes the actual bytes while its DuckDB oracle
recomputes the identical stats analytically: a true round-trip check of
the decoders, not a hash of plumbing.

Design for 100 TB of media: binary payloads ride in their own column so
Parquet column pruning means metadata-only queries never read the bytes;
``mapInPandas`` with ``spark.sql.files.maxPartitionBytes`` sized so one
Arrow batch of payloads fits executor memory; feature outputs are compact
fixed-width arrays.
"""

from __future__ import annotations

from typing import Callable, Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("kind", T.StringType()),  # image | audio | video
        T.StructField("mime", T.StringType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("duration_ms", T.IntegerType()),
        T.StructField("payload", T.BinaryType()),
    ]
)

FEATURE_DIM = 16

FEATURES_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("kind", T.StringType()),
        T.StructField("n_bytes", T.IntegerType()),
        T.StructField("features", T.ArrayType(T.FloatType())),
    ]
)


# --------------------------------------------------------------------- #
# Real pure-python codecs (struct/zlib only — no media libs needed)
# --------------------------------------------------------------------- #
def encode_png(width: int, height: int, pixels: np.ndarray) -> bytes:
    """Minimal PNG encoder: 8-bit grayscale, filter 0 scanlines.
    pixels: uint8 array shaped (height, width)."""
    import struct
    import zlib

    def chunk(tag: bytes, data: bytes) -> bytes:
        body = tag + data
        return struct.pack(">I", len(data)) + body + struct.pack(
            ">I", zlib.crc32(body) & 0xFFFFFFFF
        )

    ihdr = struct.pack(">IIBBBBB", width, height, 8, 0, 0, 0, 0)
    raw = b"".join(
        b"\x00" + pixels[y].astype(np.uint8).tobytes() for y in range(height)
    )
    return (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(raw))
        + chunk(b"IEND", b"")
    )


def decode_png(payload: bytes) -> tuple[int, int, np.ndarray]:
    """Real PNG decode: chunk walk, IHDR parse, zlib-inflate the IDAT
    stream, undo all five scanline filters. Supports 8-bit grayscale
    (color type 0) and 8-bit RGB (color type 2), no interlace.
    Returns (width, height, samples) with samples shaped
    (height, width * channels) uint8."""
    import struct
    import zlib

    if payload[:8] != b"\x89PNG\r\n\x1a\n":
        raise ValueError("not a PNG")
    pos, width, height, channels, idat = 8, 0, 0, 1, []
    while pos < len(payload):
        (length,) = struct.unpack_from(">I", payload, pos)
        tag = payload[pos + 4 : pos + 8]
        data = payload[pos + 8 : pos + 8 + length]
        pos += 12 + length
        if tag == b"IHDR":
            width, height, depth, color, _, _, interlace = struct.unpack(
                ">IIBBBBB", data
            )
            if depth != 8 or color not in (0, 2) or interlace:
                raise ValueError(f"unsupported PNG: depth={depth} color={color}")
            channels = 3 if color == 2 else 1
        elif tag == b"IDAT":
            idat.append(data)
        elif tag == b"IEND":
            break
    raw = zlib.decompress(b"".join(idat))
    stride = width * channels
    bpp = channels
    out = np.zeros((height, stride), dtype=np.uint8)
    for y in range(height):
        ftype = raw[y * (stride + 1)]
        line = np.frombuffer(
            raw, np.uint8, stride, y * (stride + 1) + 1
        ).astype(np.int32)
        prev = out[y - 1].astype(np.int32) if y else np.zeros(stride, np.int32)
        if ftype == 0:
            rec = line
        elif ftype == 2:  # up
            rec = line + prev
        elif ftype in (1, 3, 4):  # sub / average / paeth need left recursion
            rec = np.zeros(stride, np.int32)
            for x in range(stride):
                left = rec[x - bpp] if x >= bpp else 0
                up = int(prev[x])
                ul = int(prev[x - bpp]) if x >= bpp else 0
                if ftype == 1:
                    pred = left
                elif ftype == 3:
                    pred = (left + up) // 2
                else:
                    p = left + up - ul
                    pa, pb, pc = abs(p - left), abs(p - up), abs(p - ul)
                    pred = left if pa <= pb and pa <= pc else up if pb <= pc else ul
                # mask INSIDE the recursion: an unmasked byte sum > 255
                # would feed a wrong 'left' into the next predictor
                rec[x] = (line[x] + pred) & 0xFF
        else:
            raise ValueError(f"bad PNG filter {ftype}")
        out[y] = rec & 0xFF
    return width, height, out


def encode_wav(samples: np.ndarray, sample_rate: int) -> bytes:
    """Minimal WAV encoder: 16-bit mono PCM."""
    import struct

    data = samples.astype("<i2").tobytes()
    fmt = struct.pack(
        "<HHIIHH", 1, 1, sample_rate, sample_rate * 2, 2, 16
    )
    return (
        b"RIFF"
        + struct.pack("<I", 4 + 8 + len(fmt) + 8 + len(data))
        + b"WAVE"
        + b"fmt "
        + struct.pack("<I", len(fmt))
        + fmt
        + b"data"
        + struct.pack("<I", len(data))
        + data
    )


def decode_wav(payload: bytes) -> tuple[int, np.ndarray]:
    """Real WAV decode: RIFF walk, fmt parse (PCM 16-bit only), data ->
    int16 samples. Returns (sample_rate, samples)."""
    import struct

    if payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError("not a WAV")
    pos, rate, samples = 12, None, None
    while pos + 8 <= len(payload):
        tag = payload[pos : pos + 4]
        (length,) = struct.unpack_from("<I", payload, pos + 4)
        body = payload[pos + 8 : pos + 8 + length]
        pos += 8 + length + (length & 1)
        if tag == b"fmt ":
            fmt_tag, channels, rate, _, _, bits = struct.unpack_from(
                "<HHIIHH", body
            )
            if fmt_tag != 1 or channels != 1 or bits != 16:
                raise ValueError("only 16-bit mono PCM supported")
        elif tag == b"data":
            samples = np.frombuffer(body, dtype="<i2")
    if rate is None or samples is None:
        raise ValueError("missing fmt/data chunk")
    return rate, samples


def encode_jpeg_skeleton(
    width: int,
    height: int,
    n_components: int = 3,
    comment: bytes = b"",
) -> bytes:
    """Minimal structurally-real JPEG: SOI, APP0/JFIF, optional COM,
    DQT, SOF0 (baseline frame header carrying precision/height/width/
    components), SOS header + a token entropy byte, EOI. Dimension and
    component metadata are real and parseable by any JPEG reader; there
    is no DCT pixel payload (full pixel decode needs a huffman+DCT
    stage — out of scope, like MP4 frame decode)."""
    import struct

    def seg(marker: int, body: bytes) -> bytes:
        return bytes([0xFF, marker]) + struct.pack(">H", 2 + len(body)) + body

    app0 = seg(
        0xE0, b"JFIF\x00" + struct.pack(">BBBHHBB", 1, 1, 0, 1, 1, 0, 0)
    )
    com = seg(0xFE, comment) if comment else b""
    dqt = seg(0xDB, bytes([0]) + bytes((k * 7 + 3) % 255 + 1 for k in range(64)))
    comps = b"".join(
        struct.pack(
            ">BBB", c + 1, 0x22 if (c == 0 and n_components > 1) else 0x11, 0
        )
        for c in range(n_components)
    )
    sof0 = seg(
        0xC0, struct.pack(">BHHB", 8, height, width, n_components) + comps
    )
    sos = seg(
        0xDA,
        bytes([n_components])
        + b"".join(struct.pack(">BB", c + 1, 0) for c in range(n_components))
        + bytes([0, 63, 0]),
    )
    return (
        b"\xff\xd8" + app0 + com + dqt + sof0 + sos + b"\x00" + b"\xff\xd9"
    )


def decode_jpeg_sof(payload: bytes) -> dict:
    """Real JPEG marker walk: skip fill bytes and standalone markers,
    honour segment lengths, stop at the first SOFn frame header (any of
    C0-CF except DHT C4 / JPG C8 / DAC CC) and return its
    width/height/n_components/precision. Entropy-coded data after SOS is
    scanned for the next un-stuffed, non-RST marker, so SOF-after-scan
    files (progressive multi-frame) still parse."""
    import struct

    if payload[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG")
    try:
        return _jpeg_sof_walk(payload)
    except (struct.error, IndexError) as e:  # truncated mid-segment
        raise ValueError(f"truncated JPEG: {e}") from e


def _jpeg_sof_walk(payload: bytes) -> dict:
    import struct

    pos, n = 2, len(payload)
    while pos + 4 <= n:
        while pos + 1 < n and payload[pos] == 0xFF and payload[pos + 1] == 0xFF:
            pos += 1  # fill bytes
        if payload[pos] != 0xFF:
            raise ValueError("lost JPEG marker sync")
        marker = payload[pos + 1]
        pos += 2
        if marker == 0xD9:  # EOI
            break
        if marker in (0x01,) or 0xD0 <= marker <= 0xD8:  # standalone
            continue
        (length,) = struct.unpack_from(">H", payload, pos)
        body = payload[pos + 2 : pos + length]
        if 0xC0 <= marker <= 0xCF and marker not in (0xC4, 0xC8, 0xCC):
            precision = body[0]
            height, width = struct.unpack_from(">HH", body, 1)
            return {
                "width": width,
                "height": height,
                "n_components": body[5],
                "precision": precision,
            }
        pos += length
        if marker == 0xDA:  # entropy-coded data until next real marker
            while pos + 1 < n and not (
                payload[pos] == 0xFF
                and payload[pos + 1] != 0x00
                and not (0xD0 <= payload[pos + 1] <= 0xD7)
            ):
                pos += 1
    raise ValueError("no SOF frame header")


def encode_mp4_skeleton(duration_ms: int, timescale: int = 1000) -> bytes:
    """Minimal MP4: ftyp + moov(mvhd) boxes — enough real container
    structure for duration metadata to round-trip through a box parser."""
    import struct

    def box(tag: bytes, body: bytes) -> bytes:
        return struct.pack(">I", 8 + len(body)) + tag + body

    ftyp = box(b"ftyp", b"isom" + struct.pack(">I", 512) + b"isomiso2mp41")
    duration = duration_ms * timescale // 1000
    mvhd_body = (
        struct.pack(">B3x", 0)  # version 0 + flags
        + struct.pack(">IIII", 0, 0, timescale, duration)
        + struct.pack(">IH2x8x36x24xI", 0x00010000, 0x0100, 0)
    )
    return ftyp + box(b"moov", box(b"mvhd", mvhd_body))


def decode_mp4_duration(payload: bytes) -> int:
    """Real MP4 box walk: find moov > mvhd, return duration in ms."""
    import struct

    def walk(buf: bytes, start: int, end: int):
        pos = start
        while pos + 8 <= end:
            (size,) = struct.unpack_from(">I", buf, pos)
            tag = buf[pos + 4 : pos + 8]
            if size < 8:
                break
            yield tag, pos + 8, pos + size
            pos += size

    for tag, s, e in walk(payload, 0, len(payload)):
        if tag == b"moov":
            for tag2, s2, e2 in walk(payload, s, e):
                if tag2 == b"mvhd":
                    version = payload[s2]
                    if version == 0:
                        _, _, timescale, duration = struct.unpack_from(
                            ">IIII", payload, s2 + 4
                        )
                    else:
                        timescale, duration = struct.unpack_from(
                            ">IQ", payload, s2 + 20
                        )
                    return duration * 1000 // timescale
    raise ValueError("no moov/mvhd box")


def decode_media(payload: bytes, kind: str) -> dict:
    """Structural decode of the payload bytes -> typed stats dict.
    Every value comes from parsing the actual container, nothing from
    metadata columns: width/height/mean pixel for PNG, sample count/rate/
    mean sample for WAV, container duration for MP4."""
    if kind == "image":
        if payload[:2] == b"\xff\xd8":  # JPEG: SOF metadata, no pixel pass
            sof = decode_jpeg_sof(payload)
            return {
                "width": sof["width"],
                "height": sof["height"],
                "sample_rate": None,
                "duration_ms": None,
                "n_units": sof["width"] * sof["height"],
                "mean_val": None,
            }
        w, h, px = decode_png(payload)
        return {
            "width": w,
            "height": h,
            "sample_rate": None,
            "duration_ms": None,
            "n_units": w * h,
            "mean_val": float(px.astype(np.float64).mean()),
        }
    if kind == "audio":
        rate, samples = decode_wav(payload)
        return {
            "width": None,
            "height": None,
            "sample_rate": rate,
            "duration_ms": len(samples) * 1000 // rate,
            "n_units": int(len(samples)),
            "mean_val": float(samples.astype(np.float64).mean()),
        }
    if kind == "video":
        return {
            "width": None,
            "height": None,
            "sample_rate": None,
            "duration_ms": decode_mp4_duration(payload),
            "n_units": None,
            "mean_val": None,
        }
    raise ValueError(f"unknown media kind {kind!r}")


def strict_decoder(payload: bytes, kind: str) -> np.ndarray:
    """Real structural decode -> FEATURE_DIM vector (decode_media stats,
    zero-padded). Frame-level video decode (pixels, not container
    metadata) still needs pyav and stays out of scope in this sandbox."""
    d = decode_media(payload, kind)
    vals = [
        d["width"] or 0,
        d["height"] or 0,
        d["sample_rate"] or 0,
        d["duration_ms"] or 0,
        d["n_units"] or 0,
        d["mean_val"] or 0.0,
    ]
    out = np.zeros(FEATURE_DIM, dtype=np.float32)
    out[: len(vals)] = np.asarray(vals, dtype=np.float32)
    return out


def deterministic_fake_features(payload: bytes, kind: str) -> np.ndarray:
    """Deterministic FEATURE_DIM-vector from the payload bytes (blake2b
    seeded), standing in for a real embedding so plumbing is testable."""
    import hashlib

    h = hashlib.blake2b(payload or b"", digest_size=FEATURE_DIM * 4).digest()
    return (
        np.frombuffer(h, dtype=np.uint32).astype(np.float32)
        / np.float32(2**32)
    )


def extract_features(
    df: DataFrame,
    decoder: Callable[[bytes, str], np.ndarray] = deterministic_fake_features,
) -> DataFrame:
    """media table -> (media_id, kind, n_bytes, features[FEATURE_DIM]).

    One Arrow pass over payload batches; the decoder sees raw bytes."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if pdf.empty:
                continue
            feats = [
                decoder(p if p is not None else b"", k).tolist()
                for p, k in zip(pdf["payload"], pdf["kind"])
            ]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "n_bytes": [len(p) if p is not None else 0 for p in pdf["payload"]],
                    "features": feats,
                }
            )

    return df.select("media_id", "kind", "payload").mapInPandas(
        run, FEATURES_SCHEMA
    )


MEDIA_STATS_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("kind", T.StringType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("sample_rate", T.IntegerType()),
        T.StructField("duration_ms", T.IntegerType()),
        T.StructField("n_units", T.LongType()),
        T.StructField("mean_val", T.DoubleType()),
    ]
)


def media_stats(df: DataFrame) -> DataFrame:
    """media table -> per-payload structural stats via the REAL codecs
    (decode_media): one Arrow pass over payload batches, typed scalar
    columns out — the oracle-checkable face of the decoders."""

    NULL_STATS = {
        "width": None,
        "height": None,
        "sample_rate": None,
        "duration_ms": None,
        "n_units": None,
        "mean_val": None,
    }

    import struct
    import zlib

    def one(m, k, p):
        # corrupt/truncated payloads degrade to null stats instead of
        # failing the whole batch — a 100 TB media crawl WILL contain
        # them. Only decode-shaped errors degrade; programming errors
        # still surface loudly.
        try:
            return {"media_id": m, "kind": k, **decode_media(p, k)}
        except (ValueError, struct.error, zlib.error, TypeError, IndexError):
            return {"media_id": m, "kind": k, **NULL_STATS}

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if pdf.empty:
                continue
            rows = [
                one(m, k, p)
                for m, k, p in zip(pdf["media_id"], pdf["kind"], pdf["payload"])
            ]
            yield pd.DataFrame(rows)

    return df.select("media_id", "kind", "payload").mapInPandas(
        run, MEDIA_STATS_SCHEMA
    )


def frame_sample_plan(df: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Video frame-sampling *plan*: (media_id, frame_ts_ms) rows laid out
    without decoding — the explode is metadata-only (duration_ms), so the
    payload column is pruned from the scan entirely."""
    return df.filter(F.col("kind") == "video").select(
        "media_id",
        F.explode(
            F.sequence(
                F.lit(0),
                F.greatest(F.col("duration_ms") - 1, F.lit(0)),
                F.lit(every_ms),
            )
        ).alias("frame_ts_ms"),
    )


AUDIO_RATE = 8000


def synth_payload(i: int) -> tuple[str, str, bytes]:
    """Deterministic REAL payload for media_id ``i``: (kind, mime, bytes).

    Patterns are closed-form in (i, x, y) / (i, j) so a SQL oracle can
    recompute the decoded stats without any codec:
      image  (i%3==0): gray PNG, w=8+(i%9), h=8+((i*7)%9),
                       pixel(x,y) = (x*3 + y*5 + i) % 256
      audio  (i%3==1): 16-bit mono WAV @8000 Hz, n=64+(i%64),
                       sample(j) = ((j*37 + i*11) % 2048) - 1024
      video  (i%3==2): MP4 ftyp+moov/mvhd, duration = (i%30)*1000 ms
    """
    if i % 3 == 0:
        w, h = 8 + (i % 9), 8 + ((i * 7) % 9)
        xs = np.arange(w)[None, :]
        ys = np.arange(h)[:, None]
        px = ((xs * 3 + ys * 5 + i) % 256).astype(np.uint8)
        return "image", "image/png", encode_png(w, h, px)
    if i % 3 == 1:
        ns = 64 + (i % 64)
        j = np.arange(ns)
        samples = ((j * 37 + i * 11) % 2048) - 1024
        return "audio", "audio/wav", encode_wav(samples, AUDIO_RATE)
    return "video", "video/mp4", encode_mp4_skeleton((i % 30) * 1000)


def synth_jpeg_payload(i: int) -> bytes:
    """Deterministic REAL JPEG for media_id ``i``, closed-form metadata:
    width = 16 + (i*3) % 240, height = 16 + (i*5) % 200, components =
    3 if i even else 1, preceded by an i-varying COM segment so the SOF
    offset differs per row — the parser must genuinely walk markers."""
    return encode_jpeg_skeleton(
        16 + (i * 3) % 240,
        16 + (i * 5) % 200,
        n_components=3 if i % 2 == 0 else 1,
        comment=b"c" * (1 + i % 17),
    )


def synth_jpeg_media(spark, n: int = 48) -> DataFrame:
    """Deterministic (media_id, kind, mime, payload) table of real JPEG
    skeletons (synth_jpeg_payload)."""
    rows = [
        (i, "image", "image/jpeg", synth_jpeg_payload(i)) for i in range(n)
    ]
    return spark.createDataFrame(
        rows, "media_id long, kind string, mime string, payload binary"
    )


def synth_media(spark, n: int = 64, seed: int = 42) -> DataFrame:
    """Deterministic media table carrying REAL PNG/WAV/MP4 payloads
    (synth_payload). Metadata columns mirror what the payloads contain so
    payload-pruned metadata queries stay consistent with a real decode."""
    rows = []
    for i in range(n):
        kind, mime, payload = synth_payload(i)
        rows.append(
            (
                i,
                kind,
                mime,
                8 + (i % 9) if kind == "image" else None,
                8 + ((i * 7) % 9) if kind == "image" else None,
                (i % 30) * 1000
                if kind == "video"
                else (64 + (i % 64)) * 1000 // AUDIO_RATE
                if kind == "audio"
                else None,
                payload,
            )
        )
    return spark.createDataFrame(rows, MEDIA_SCHEMA)


def image_ahash(df: DataFrame, grid: int = 8) -> DataFrame:
    """Perceptual average-hash over the image payloads: decode the REAL
    PNG bytes (decode_png), sample a grid×grid nearest-neighbor
    thumbnail (sx = floor(u·w/grid), sy = floor(v·h/grid) — exact
    integer sampling so a closed-form oracle can recompute it), then
    one bit per cell: pixel·grid² > sum(all cells) — the aHash
    mean-threshold in pure integer arithmetic (strict >, ties → 0, no
    float mean anywhere). Output (media_id, phash) with phash a
    grid²-char '0'/'1' string, row-major — portable across engines (no
    int64 sign trap at bit 63).

    The point of aHash: images differing only by a constant brightness
    offset (no wrap) threshold identically, so exact-equality groupBy
    on phash clusters them — the image analogue of text exact-dedup;
    hamming-radius pairing would reuse the SimHash 4-piece blocking
    (ops/dedup.py) over the same bits. One Arrow pass; at 100 TB the
    payload column prunes for every later phash-only query.

    Rows whose payload fails to PNG-decode are emitted with a NULL
    phash (never silently dropped), so callers can count decode
    failures with `phash IS NULL` and downstream dedup counts stay
    honest."""
    out_schema = T.StructType(
        [
            T.StructField("media_id", T.LongType()),
            T.StructField("phash", T.StringType()),
        ]
    )

    import struct
    import zlib

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if pdf.empty:
                continue
            ids, hashes = [], []
            for m, p in zip(pdf["media_id"], pdf["payload"]):
                try:
                    w, h, px = decode_png(bytes(p))
                except (ValueError, struct.error, zlib.error, IndexError):
                    # corrupt payload: keep the row, NULL hash (see
                    # docstring) — decode failures stay countable
                    ids.append(int(m))
                    hashes.append(None)
                    continue
                if px.ndim == 3:  # RGB -> rec601 luma, integer-exact
                    px = (
                        299 * px[:, :, 0].astype(np.int64)
                        + 587 * px[:, :, 1].astype(np.int64)
                        + 114 * px[:, :, 2].astype(np.int64)
                    ) // 1000
                sx = (np.arange(grid) * w) // grid
                sy = (np.arange(grid) * h) // grid
                cells = px.astype(np.int64)[np.ix_(sy, sx)]
                total = int(cells.sum())
                bits = (cells * (grid * grid) > total).astype(np.uint8)
                hashes.append("".join("1" if b else "0" for b in bits.ravel()))
                ids.append(int(m))
            yield pd.DataFrame({"media_id": ids, "phash": hashes})

    return (
        df.filter(F.col("kind") == "image")
        .select("media_id", "payload")
        .mapInPandas(run, out_schema)
    )


def synth_phash_media(spark, n: int = 64) -> DataFrame:
    """Deterministic REAL 16×16 grayscale PNGs in four gradient-direction
    classes (k = i % 4), each image brightness-shifted by i//4:

        k=0: px = 6x + 2y + i//4      k=1: px = 2x + 6y + i//4
        k=2: px = 6(15−x) + 2y + i//4 k=3: px = 6x + 2(15−y) + i//4

    Max value 120 + 15 < 256 — NO wrap, so within a class every image
    is the same pattern up to a constant offset and must aHash
    identically, while the four directions threshold differently:
    exactly four phash clusters of n/4. Closed-form in (i, x, y) for
    the SQL oracle."""
    rows = []
    xs = np.arange(16)[None, :]
    ys = np.arange(16)[:, None]
    for i in range(n):
        k, off = i % 4, i // 4
        if k == 0:
            px = 6 * xs + 2 * ys
        elif k == 1:
            px = 2 * xs + 6 * ys
        elif k == 2:
            px = 6 * (15 - xs) + 2 * ys
        else:
            px = 6 * xs + 2 * (15 - ys)
        payload = encode_png(16, 16, (px + off).astype(np.uint8))
        rows.append((i, "image", "image/png", 16, 16, None, payload))
    return spark.createDataFrame(rows, MEDIA_SCHEMA)
