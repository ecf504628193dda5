"""Multimodal-column operators (LLM training-data pipeline surface).

Pattern: media (image/audio/video) travels as an opaque ``binary``
column with a typed metadata struct alongside; decode / feature-extract
runs as Arrow-batched ``mapInPandas`` so the Python boundary is paid per
batch, not per row. PNG and WAV are decoded FOR REAL with the standard
library (zlib inflate + scanline de-filter; `wave` frame parse) — no
PIL/ffmpeg needed; formats with no codec raise unless the env-gated
deterministic fake is enabled (PG_ARCHIVER_FAKE_DECODE=1).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from pg_archiver_spark.catalog import load
from pg_archiver_spark.registry import register


@register(
    "multimodal_join",
    oracle="""
    SELECT d.lang, e.label,
           COUNT(*) AS n_docs,
           CAST((SUM(d.n_chars) * 1000) // COUNT(*) AS BIGINT) AS avg_chars_milli
    FROM documents d JOIN embeddings e ON d.doc_id = e.vec_id
    GROUP BY d.lang, e.label
    """,
)
def multimodal_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Text ⋈ vector modalities in one frame (doc_id = vec_id). Mean
    length in exact milli-units (int-ratio ROUND ties, G11)."""
    docs = load(spark, sf_dir, "documents")
    emb = load(spark, sf_dir, "embeddings")
    return (
        docs.join(emb, docs.doc_id == emb.vec_id)
        .groupBy("lang", "label")
        .agg(
            F.count("*").alias("n_docs"),
            F.expr("(SUM(n_chars) * 1000) DIV COUNT(*)").alias("avg_chars_milli"),
        )
    )


# --- real codecs (stdlib-only: zlib/struct for PNG, wave for WAV) -----
#
# The container ships no PIL/ffmpeg, but PNG and WAV are simple enough
# to encode AND decode with the standard library alone — so the decode
# kernel is a real parser (signature sniff, chunk walk, inflate,
# scanline de-filter), not a fake. The deterministic-fake path survives
# only behind PG_ARCHIVER_FAKE_DECODE=1 for payloads no codec claims.

_PNG_SIG = b"\x89PNG\r\n\x1a\n"


def encode_png(width: int, height: int, pixels: bytes) -> bytes:
    """Minimal 8-bit grayscale PNG encoder (zlib + struct + crc32).
    `pixels` is row-major, len == width*height. Produces a spec-valid
    file any PNG reader accepts."""
    import struct
    import zlib

    if len(pixels) != width * height:
        raise ValueError("pixels must be width*height bytes")

    def chunk(tag: bytes, data: bytes) -> bytes:
        return (
            struct.pack(">I", len(data))
            + tag
            + data
            + struct.pack(">I", zlib.crc32(tag + data) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", width, height, 8, 0, 0, 0, 0)
    raw = b"".join(
        b"\x00" + pixels[y * width : (y + 1) * width] for y in range(height)
    )
    return (
        _PNG_SIG
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(raw))
        + chunk(b"IEND", b"")
    )


def decode_png(payload: bytes) -> dict:
    """Real PNG decode: chunk walk → IHDR dims → inflate IDAT →
    per-scanline de-filter (all five filter types) → pixel stats.
    Supports 8-bit grayscale / RGB / RGBA (what a feature-extract
    stage needs; indexed/16-bit raise)."""
    import struct
    import zlib

    if payload[:8] != _PNG_SIG:
        raise ValueError("not a PNG")
    pos, width = 8, None
    idat = b""
    while pos + 8 <= len(payload):
        (length,) = struct.unpack(">I", payload[pos : pos + 4])
        tag = payload[pos + 4 : pos + 8]
        data = payload[pos + 8 : pos + 8 + length]
        if tag == b"IHDR":
            width, height, bit_depth, color_type = struct.unpack(
                ">IIBB", data[:10]
            )
        elif tag == b"IDAT":
            idat += data
        elif tag == b"IEND":
            break
        pos += 12 + length
    if width is None:
        raise ValueError("PNG missing IHDR")
    channels = {0: 1, 2: 3, 4: 2, 6: 4}.get(color_type)
    if channels is None or bit_depth != 8:
        raise NotImplementedError(
            f"unsupported PNG (color_type={color_type}, depth={bit_depth})"
        )
    raw = zlib.decompress(idat)
    stride = width * channels
    out = bytearray()
    prev = bytearray(stride)
    for y in range(height):
        row_start = y * (stride + 1)
        ftype = raw[row_start]
        line = bytearray(raw[row_start + 1 : row_start + 1 + stride])
        if ftype == 0:
            pass  # None filter: stored bytes ARE the pixels
        elif ftype == 2:
            import numpy as np

            line = bytearray(
                (
                    np.frombuffer(bytes(line), dtype=np.uint8)
                    + np.frombuffer(bytes(prev), dtype=np.uint8)
                ).tobytes()
            )
        else:
            for i in range(stride):
                a = line[i - channels] if i >= channels else 0
                b = prev[i]
                c = prev[i - channels] if i >= channels else 0
                if ftype == 1:
                    line[i] = (line[i] + a) & 0xFF
                elif ftype == 3:
                    line[i] = (line[i] + (a + b) // 2) & 0xFF
                elif ftype == 4:
                    p = a + b - c
                    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                    pred = (
                        a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                    )
                    line[i] = (line[i] + pred) & 0xFF
        out += line
        prev = line
    mean_milli = (sum(out) * 1000) // len(out) if out else 0
    return {
        "width": width,
        "height": height,
        "duration_ms": 0,
        "mean_milli": mean_milli,
    }


def encode_wav(samples: list[int], sample_rate: int = 8000) -> bytes:
    """16-bit mono PCM WAV via the stdlib `wave` module."""
    import io
    import struct
    import wave

    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(sample_rate)
        w.writeframes(struct.pack(f"<{len(samples)}h", *samples))
    return buf.getvalue()


def decode_wav(payload: bytes) -> dict:
    """Real WAV decode via `wave`: frame count → duration, struct-parse
    of the PCM samples → mean |amplitude| (the audio analogue of pixel
    stats)."""
    import io
    import struct
    import wave

    with wave.open(io.BytesIO(payload), "rb") as w:
        n_frames = w.getnframes()
        rate = w.getframerate()
        n_chan = w.getnchannels()
        frames = w.readframes(n_frames)
    samples = struct.unpack(f"<{n_frames * n_chan}h", frames)
    mean_milli = (
        (sum(abs(s) for s in samples) * 1000) // len(samples) if samples else 0
    )
    return {
        "width": n_frames,
        "height": n_chan,
        "duration_ms": (n_frames * 1000) // rate,
        "mean_milli": mean_milli,
    }


def decode_media(payload: bytes) -> dict:
    """Dispatch on magic bytes — PNG signature or RIFF/WAVE header.
    Unknown formats raise NotImplementedError unless the deterministic
    fake is explicitly enabled (PG_ARCHIVER_FAKE_DECODE=1), mirroring
    how a real pipeline quarantines undecodable media."""
    import os

    if payload is None:
        raise NotImplementedError("null media payload")
    if payload[:8] == _PNG_SIG:
        return decode_png(payload)
    if payload[:4] == b"RIFF" and payload[8:12] == b"WAVE":
        return decode_wav(payload)
    if os.environ.get("PG_ARCHIVER_FAKE_DECODE") == "1":
        checksum = 0
        for i, byte in enumerate(payload[:64]):
            checksum = (checksum * 31 + byte + i) % 1_000_000_007
        return {
            "width": 16 + (checksum % 64),
            "height": 16 + ((checksum // 64) % 64),
            "duration_ms": 0,
            "mean_milli": checksum % 256_000,
        }
    raise NotImplementedError("no codec for payload (unknown magic bytes)")


_FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("media_type", T.StringType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("width", T.LongType()),
        T.StructField("height", T.LongType()),
        T.StructField("duration_ms", T.LongType()),
        T.StructField("mean_milli", T.LongType()),
    ]
)

_MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("media_type", T.StringType()),
        T.StructField("payload", T.BinaryType()),
    ]
)


def _synthesize_media(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """Fixture ingest kernel: the testdata ships no media files, so each
    document's text bytes are rendered into a REAL payload — even
    doc_ids become a grayscale PNG (text bytes as pixels), odd ones a
    16-bit PCM WAV (text bytes as amplitudes). Deterministic per doc;
    every byte that leaves here is spec-valid and round-trips through
    any standard decoder."""
    for pdf in batches:
        rows = []
        for doc_id, text in zip(pdf["doc_id"], pdf["text"]):
            data = text.encode("utf-8")
            # LOUD oracle-contract guard: every multimodal sql-check
            # reconstructs features from per-CHARACTER ascii() over
            # strlen(text), which equals these BYTES only for
            # non-empty ASCII text. A fixture drift would otherwise
            # surface as five opaque hash mismatches.
            if not data or len(data) != len(text):
                raise RuntimeError(
                    f"doc {doc_id}: multimodal oracles require "
                    "non-empty ASCII text"
                )
            if doc_id % 2 == 0:
                width = 8 + (doc_id % 9)
                npix = max(1, (len(data) // width)) * width
                pixels = (data * (npix // max(1, len(data)) + 1))[:npix]
                payload = encode_png(width, npix // width, bytes(pixels))
                rows.append((doc_id, "image/png", payload))
            else:
                samples = [((b - 128) * 256) for b in data[:256]] or [0]
                payload = encode_wav(samples)
                rows.append((doc_id, "audio/wav", payload))
        yield pd.DataFrame(rows, columns=["doc_id", "media_type", "payload"])


def _extract_features(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """mapInPandas kernel: one Arrow batch in, one feature frame out."""
    for pdf in batches:
        feats = [decode_media(p) for p in pdf["payload"]]
        out = pd.DataFrame(feats)
        out.insert(0, "n_bytes", [len(p) for p in pdf["payload"]])
        out.insert(0, "media_type", pdf["media_type"].values)
        out.insert(0, "doc_id", pdf["doc_id"].values)
        yield out[[f.name for f in _FEATURE_SCHEMA.fields]]



# -- shared oracle fragments (round-8 review) ---------------------------
# ONE definition of the synthesized-media reconstruction per modality:
# every multimodal oracle derives from these, so the raster/PCM model
# cannot drift between sibling ops.
_PNG_DOCS_CTE = (
    "SELECT doc_id, text, strlen(text) AS L, 8 + (doc_id % 9) AS w, "
    "GREATEST(1, strlen(text) // (8 + (doc_id % 9))) AS h "
    "FROM documents WHERE doc_id % 2 = 0"
)
_WAV_DOCS_CTE = (
    "SELECT doc_id, text, LEAST(256, strlen(text)) AS m "
    "FROM documents WHERE doc_id % 2 = 1"
)
# 8x8 nearest-neighbor gather over the tiled ASCII raster (the aHash /
# thumbnail sample grid; zips with a sibling unnest(range(64)) as k).
_THUMB_PIXEL_EXPR = (
    "ascii(substr(text, CAST((LEAST(h - 1, ((unnest(range(64)) // 8) * h)"
    " // 8) * w + LEAST(w - 1, ((unnest(range(64)) % 8) * w) // 8)) % L"
    " AS INTEGER) + 1, 1))"
)
# 16-bit PCM sample value (ascii(byte) - 128) * 256 at position
# unnest(range(m)) (zips with a sibling unnest(range(m)) as p).
_WAV_SAMPLE_EXPR = (
    "CAST(ascii(substr(text, CAST(unnest(range(m)) AS INTEGER) + 1, 1))"
    " - 128 AS BIGINT) * 256"
)

@register(
    "multimodal_binary_features",
    # Round-8 conversion (rows-only → sql-checked): every decoded
    # feature is a deterministic function of the fixture text — PNG
    # dims/means come from the tiled ASCII raster, WAV frame counts /
    # duration / mean |amplitude| from (ascii(byte)-128)·256 over the
    # first 256 bytes — so the per-media-type profile reconstructs in
    # exact integer SQL. Only the raw payload byte total is
    # compression-shaped, so it is reported as the >0 invariant.
    oracle=f"""
    WITH di AS ({_PNG_DOCS_CTE}),
    ipx AS (
        SELECT doc_id, text, L, unnest(range(h * w)) AS p
        FROM di
    ),
    iom AS (
        SELECT doc_id,
               (SUM(ascii(substr(text, CAST(p % L AS INTEGER) + 1, 1)))
                   * 1000) // COUNT(*) AS mm
        FROM ipx GROUP BY doc_id
    ),
    iprof AS (
        SELECT COUNT(*) AS n_media,
               MIN(w) AS min_width,
               MAX(h) AS max_height
        FROM di
    ),
    iavg AS (SELECT SUM(mm) // COUNT(*) AS avg_mm FROM iom),
    da AS ({_WAV_DOCS_CTE}),
    apx AS (
        SELECT doc_id, m, unnest(range(m)) AS p,
               ABS({_WAV_SAMPLE_EXPR}) AS av
        FROM da
    ),
    aom AS (
        SELECT doc_id, (SUM(av) * 1000) // m AS mm
        FROM apx GROUP BY doc_id, m
    ),
    aprof AS (
        SELECT COUNT(*) AS n_media,
               MIN(m) AS min_width,
               MAX(m // 8) AS max_dur
        FROM da
    ),
    aavg AS (SELECT SUM(mm) // COUNT(*) AS avg_mm FROM aom)
    SELECT 'audio/wav' AS media_type, n_media,
           TRUE AS bytes_positive,
           CAST(min_width AS BIGINT) AS min_width,
           CAST(1 AS BIGINT) AS max_height,
           CAST(max_dur AS BIGINT) AS max_duration_ms,
           CAST(avg_mm AS BIGINT) AS avg_mean_milli
    FROM aprof CROSS JOIN aavg
    UNION ALL
    SELECT 'image/png', n_media, TRUE,
           CAST(min_width AS BIGINT), CAST(max_height AS BIGINT),
           CAST(0 AS BIGINT), CAST(avg_mm AS BIGINT)
    FROM iprof CROSS JOIN iavg
    """,
)
def multimodal_binary_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary media column → REAL decode → typed features, both hops as
    Arrow-batched mapInPandas (the Python boundary is per batch, never
    per row).

    Ingest synthesizes spec-valid PNG/WAV payloads from the fixture's
    text (the testdata ships no media); the decode kernel then parses
    them for real — PNG chunk walk + inflate + de-filter, WAV frame
    parse — so dimensions/duration in the output are decoded, not
    fabricated. Output: per-media_type feature profile (the payload
    byte total is compression-shaped, so it surfaces as the >0
    invariant rather than a raw count)."""
    docs = load(spark, sf_dir, "documents").select("doc_id", "text")
    media = docs.mapInPandas(_synthesize_media, schema=_MEDIA_SCHEMA)
    feats = media.mapInPandas(_extract_features, schema=_FEATURE_SCHEMA)
    return (
        feats.groupBy("media_type")
        .agg(
            F.count("*").alias("n_media"),
            (F.min("n_bytes") > F.lit(0)).alias("bytes_positive"),
            F.min("width").alias("min_width"),
            F.max("height").alias("max_height"),
            F.max("duration_ms").alias("max_duration_ms"),
            F.expr("(SUM(mean_milli)) DIV COUNT(*)").alias("avg_mean_milli"),
        )
        .orderBy("media_type")
    )


@register(
    "multimodal_frame_sample",
    oracle="""
    SELECT lang, COUNT(*) AS n_frames
    FROM (
        SELECT doc_id, lang, unnest(range(10)) AS frame_no
        FROM documents
    )
    WHERE frame_no % 3 = 0
    GROUP BY lang
    """,
)
def multimodal_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Video-style frame sampling plumbing: each doc fans out to 10
    per-frame rows (what a video decode produces), then every 3rd frame
    is kept. explode() is the fan-out primitive; a real pipeline swaps
    the synthetic frame list for mapInPandas-decoded frames."""
    docs = load(spark, sf_dir, "documents")
    return (
        docs.select(
            "doc_id",
            "lang",
            F.explode(F.sequence(F.lit(0), F.lit(9))).alias("frame_no"),
        )
        .filter(F.col("frame_no") % 3 == 0)
        .groupBy("lang")
        .agg(F.count("*").alias("n_frames"))
    )


def decode_png_pixels(payload: bytes) -> tuple[int, int, int, bytes]:
    """Full-pixel PNG decode (width, height, channels, raster bytes) —
    the pixel-returning sibling of decode_png's stats walk, reusing the
    identical chunk/inflate/de-filter path."""
    import struct
    import zlib

    if payload[:8] != _PNG_SIG:
        raise ValueError("not a PNG")
    pos, width = 8, None
    idat = b""
    while pos + 8 <= len(payload):
        (length,) = struct.unpack(">I", payload[pos : pos + 4])
        tag = payload[pos + 4 : pos + 8]
        data = payload[pos + 8 : pos + 8 + length]
        if tag == b"IHDR":
            width, height, bit_depth, color_type = struct.unpack(
                ">IIBB", data[:10]
            )
        elif tag == b"IDAT":
            idat += data
        elif tag == b"IEND":
            break
        pos += 12 + length
    if width is None:
        raise ValueError("PNG missing IHDR")
    channels = {0: 1, 2: 3, 4: 2, 6: 4}.get(color_type)
    if channels is None or bit_depth != 8:
        raise NotImplementedError("unsupported PNG variant")
    raw = zlib.decompress(idat)
    stride = width * channels
    out = bytearray()
    prev = bytearray(stride)
    for y in range(height):
        row_start = y * (stride + 1)
        ftype = raw[row_start]
        line = bytearray(raw[row_start + 1 : row_start + 1 + stride])
        if ftype == 0:
            pass  # None filter: stored bytes ARE the pixels
        elif ftype == 2:
            # Up filter depends only on the prior ROW — whole-line numpy add.
            import numpy as np

            line = bytearray(
                (
                    np.frombuffer(bytes(line), dtype=np.uint8)
                    + np.frombuffer(bytes(prev), dtype=np.uint8)
                ).tobytes()
            )
        else:
            # Sub/Average/Paeth carry an in-row left dependency; the
            # scan stays sequential (correctness over vectorization).
            for i in range(stride):
                a = line[i - channels] if i >= channels else 0
                b = prev[i]
                c = prev[i - channels] if i >= channels else 0
                if ftype == 1:
                    line[i] = (line[i] + a) & 0xFF
                elif ftype == 3:
                    line[i] = (line[i] + (a + b) // 2) & 0xFF
                elif ftype == 4:
                    p = a + b - c
                    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                    pred = (
                        a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                    )
                    line[i] = (line[i] + pred) & 0xFF
        out += line
        prev = line
    return width, height, channels, bytes(out)


THUMB_SIZE = 8


@register(
    "multimodal_image_resize",
    # Round-8 conversion (rows-only → sql-checked): lossless PNG means
    # the decoded raster equals the tiled ASCII text bytes, so SQL can
    # re-derive both means — the original over all h·w tiled positions
    # (pixel(p) = ascii(text[p mod L])) and the thumbnail over the same
    # 8×8 nearest-neighbor gather the kernel uses — in exact integer
    # arithmetic. A broken decode, filter reconstruction, resize
    # gather, or re-encode round-trip hash-fails.
    oracle=f"""
    WITH d AS ({_PNG_DOCS_CTE}),
    px AS (
        SELECT doc_id, text, L, unnest(range(h * w)) AS p FROM d
    ),
    om AS (
        SELECT doc_id,
               (SUM(ascii(substr(text, CAST(p % L AS INTEGER) + 1, 1)))
                   * 1000) // COUNT(*) AS o_mean
        FROM px GROUP BY doc_id
    ),
    tp AS (
        SELECT doc_id, {_THUMB_PIXEL_EXPR} AS v
        FROM d
    ),
    tm AS (
        SELECT doc_id, (SUM(v) * 1000) // 64 AS t_mean
        FROM tp GROUP BY doc_id
    )
    SELECT COUNT(*) AS n_images,
           CAST(8 AS BIGINT) AS thumb_w,
           CAST(8 AS BIGINT) AS thumb_h,
           CAST(SUM(o_mean) // COUNT(*) AS BIGINT) AS avg_orig_mean,
           CAST(SUM(t_mean) // COUNT(*) AS BIGINT) AS avg_thumb_mean
    FROM om JOIN tm USING (doc_id)
    """,
)
def multimodal_image_resize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The image RESIZE stage of a multimodal ingest pipeline, for real:
    synthesize spec-valid grayscale PNGs from even-doc_id texts →
    decode to actual pixels (chunk walk + inflate + de-filter) →
    nearest-neighbor downsample to an 8×8 thumbnail → RE-ENCODE as PNG
    → re-decode the thumbnail to PROVE the output is itself a valid
    image (any mangled byte fails the second decode). All pixel work
    runs inside one Arrow-batched mapInPandas kernel — per-batch Python
    boundary, rows never cross one at a time.

    Output per doc: original dims, thumbnail dims (pinned 8×8 by a
    RuntimeError check), original and thumbnail mean intensity in
    integer millis (nearest-neighbor preserves the value RANGE, so the
    thumb mean stays within the original's [min, max] — also checked).
    At 100 TB this kernel is exactly the shape a real resize stage has:
    CPU-parallel over partitions, no shuffle, no driver state."""
    import pandas as pd

    docs = (
        load(spark, sf_dir, "documents")
        .select("doc_id", "text")
        .filter(F.col("doc_id") % 2 == 0)
    )
    media = docs.mapInPandas(_synthesize_media, schema=_MEDIA_SCHEMA)

    out_schema = (
        "doc_id long, orig_w long, orig_h long, thumb_w long, thumb_h long, "
        "orig_mean_milli long, thumb_mean_milli long"
    )

    def resize_kernel(batches):
        import numpy as np

        for pdf in batches:
            rows = []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                w, h, ch, px = decode_png_pixels(bytes(payload))
                tw = th = THUMB_SIZE
                # Nearest-neighbor downsample as one numpy fancy-index
                # (same sample grid as the scalar loop, no per-pixel
                # Python): row/col source indices, then a 2-D gather.
                arr = np.frombuffer(px, dtype=np.uint8).reshape(h, w * ch)
                sy = np.minimum(h - 1, (np.arange(th) * h) // th)
                sx = np.minimum(w - 1, (np.arange(tw) * w) // tw) * ch
                thumb = arr[np.ix_(sy, sx)].tobytes()  # gray: ch==1
                reenc = encode_png(tw, th, thumb)
                w2, h2, _, px2 = decode_png_pixels(reenc)
                if (w2, h2) != (tw, th) or bytes(px2) != thumb:
                    raise RuntimeError(
                        f"thumbnail re-decode mismatch for doc {doc_id}"
                    )
                om = (int(arr.sum(dtype=np.int64)) * 1000) // arr.size
                t2 = np.frombuffer(px2, dtype=np.uint8)
                tm = (int(t2.sum(dtype=np.int64)) * 1000) // t2.size
                if not (int(arr.min()) * 1000 <= tm <= int(arr.max()) * 1000):
                    raise RuntimeError(
                        f"thumb mean outside source range for doc {doc_id}"
                    )
                rows.append((doc_id, w, h, w2, h2, om, tm))
            yield pd.DataFrame(
                rows,
                columns=[
                    "doc_id", "orig_w", "orig_h", "thumb_w", "thumb_h",
                    "orig_mean_milli", "thumb_mean_milli",
                ],
            )

    feats = media.mapInPandas(resize_kernel, schema=out_schema)
    return feats.agg(
        F.count("*").alias("n_images"),
        F.min("thumb_w").alias("thumb_w"),
        F.min("thumb_h").alias("thumb_h"),
        F.expr("SUM(orig_mean_milli) DIV COUNT(*)").alias("avg_orig_mean"),
        F.expr("SUM(thumb_mean_milli) DIV COUNT(*)").alias("avg_thumb_mean"),
    )


@register(
    "multimodal_audio_features",
    # Round-8 conversion (rows-only → sql-checked): PCM is lossless, so
    # the parsed samples equal (ascii(text[p]) - 128) · 256 over the
    # first 256 bytes; squares/zero-crossings/peaks are exact integer
    # SQL, and the kernel's isqrt is emulated exactly as
    # floor(sqrt(double)) plus a ±1 integer correction (the double
    # sqrt of a ~2^58 operand is within 1 of the true integer root, so
    # one correction step pins it). A broken WAV write/parse or
    # accumulator overflow hash-fails.
    oracle=f"""
    WITH a0 AS ({_WAV_DOCS_CTE}),
    sm AS (
        SELECT doc_id, m, unnest(range(m)) AS p,
               {_WAV_SAMPLE_EXPR} AS sv
        FROM a0
    ),
    fl AS (
        SELECT doc_id, m, p, sv,
               CASE WHEN (sv < 0) <> LAG(sv < 0) OVER (
                        PARTITION BY doc_id ORDER BY p)
                    THEN 1 ELSE 0 END AS flip
        FROM sm
    ),
    per AS (
        SELECT doc_id, m,
               SUM(sv * sv) AS sq,
               CAST(SUM(flip) AS BIGINT) AS zc,
               MAX(ABS(sv)) AS peak
        FROM fl
        GROUP BY doc_id, m
    ),
    r0s AS (
        SELECT doc_id, m, zc, peak,
               CAST((sq * 1000000) // m AS BIGINT) AS x,
               CAST(FLOOR(SQRT(CAST((sq * 1000000) // m AS DOUBLE)))
                   AS BIGINT) AS r0
        FROM per
    ),
    rms AS (
        SELECT doc_id, m, zc, peak,
               (r0 + (CASE WHEN (r0 + 1) * (r0 + 1) <= x THEN 1 ELSE 0 END))
                   - (CASE WHEN r0 * r0 > x THEN 1 ELSE 0 END) AS rms_milli
        FROM r0s
    )
    SELECT COUNT(*) AS n_clips,
           CAST(SUM(m) AS BIGINT) AS total_samples,
           CAST(SUM(rms_milli) // COUNT(*) AS BIGINT) AS avg_rms_milli,
           CAST(SUM(zc) AS BIGINT) AS total_zero_crossings,
           CAST(MAX(peak) AS BIGINT) AS max_peak
    FROM rms
    """,
)
def multimodal_audio_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The audio FEATURE-EXTRACT stage, for real: synthesize 16-bit PCM
    WAVs from odd-doc_id texts → parse the actual sample frames → the
    three classic speech/audio screens, all in exact integer
    arithmetic (no float divergence): RMS amplitude (isqrt of the mean
    square, milli-scaled), zero-crossing count (signal periodicity —
    the cheap voiced/unvoiced discriminator), and peak amplitude.
    Arrow-batched mapInPandas kernel, then one map-side-combined
    profile aggregation. The 100 TB shape matches a production
    feature-extract pass: partition-parallel decode, no shuffle until
    the tiny profile agg."""
    import math
    import wave
    import io

    import pandas as pd

    docs = (
        load(spark, sf_dir, "documents")
        .select("doc_id", "text")
        .filter(F.col("doc_id") % 2 == 1)
    )
    media = docs.mapInPandas(_synthesize_media, schema=_MEDIA_SCHEMA)

    out_schema = (
        "doc_id long, n_samples long, rms_milli long, zero_crossings long, "
        "peak long"
    )

    def audio_kernel(batches):
        import numpy as np

        for pdf in batches:
            rows = []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                with wave.open(io.BytesIO(bytes(payload)), "rb") as w:
                    n = w.getnframes()
                    frames = w.readframes(n)
                # int64 accumulators keep the arithmetic EXACT (matches
                # the former pure-Python ints bit-for-bit).
                s = np.frombuffer(frames, dtype="<i2").astype(np.int64)
                sq = int((s * s).sum())
                rms_milli = math.isqrt((sq * 1_000_000) // max(1, n))
                neg = s < 0
                zc = int((neg[:-1] != neg[1:]).sum())
                rows.append(
                    (doc_id, n, rms_milli, zc, int(np.abs(s).max()))
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    "doc_id", "n_samples", "rms_milli", "zero_crossings", "peak",
                ],
            )

    feats = media.mapInPandas(audio_kernel, schema=out_schema)
    return feats.agg(
        F.count("*").alias("n_clips"),
        F.sum("n_samples").alias("total_samples"),
        F.expr("SUM(rms_milli) DIV COUNT(*)").alias("avg_rms_milli"),
        F.sum("zero_crossings").alias("total_zero_crossings"),
        F.max("peak").alias("max_peak"),
    )


PHASH_MAX_DIST = 10
PHASH_BRIGHTNESS = 4  # planted-twin brightness shift (ASCII never clips)


@register(
    "multimodal_phash_neardup",
    # Round-8 conversion (rows-only → sql-checked): the PNG payloads
    # are synthesized from the fixture text (ASCII bytes tiled to a
    # doc_id-keyed raster), and PNG is lossless, so the decoded pixels
    # the kernel hashes equal the tiled text bytes — which SQL can
    # reconstruct: pixel(p) = ascii(text[p mod L]), the 8×8 thumbnail
    # gather is integer index arithmetic, and the mean threshold
    # p > S/64 rewrites exactly as the integer 64·p > S. The +4
    # brightness twins are aHash-invariant, so they reuse the same
    # code. The oracle therefore re-derives every signature from first
    # principles — a broken PNG encode/decode/inflate path, thumbnail
    # gather, or bit packing hash-fails.
    oracle=f"""
    WITH d AS ({_PNG_DOCS_CTE}),
    px AS (
        SELECT doc_id, unnest(range(64)) AS k, {_THUMB_PIXEL_EXPR} AS p
        FROM d
    ),
    th AS (
        SELECT doc_id, k, p, SUM(p) OVER (PARTITION BY doc_id) AS s
        FROM px
    ),
    codes AS (
        SELECT doc_id,
               CAST(SUM(CASE WHEN 64 * p > s AND k < 32
                             THEN CAST(1 AS BIGINT) << CAST(k AS INTEGER)
                             ELSE 0 END) AS BIGINT) AS lo,
               CAST(SUM(CASE WHEN 64 * p > s AND k >= 32
                             THEN CAST(1 AS BIGINT) << CAST(k - 32 AS INTEGER)
                             ELSE 0 END) AS BIGINT) AS hi
        FROM th GROUP BY doc_id
    ),
    imgs AS (
        SELECT doc_id AS img_id, lo, hi FROM codes
        UNION ALL
        SELECT -doc_id - 1, lo, hi FROM codes WHERE doc_id % 10 = 0
    )
    SELECT a.img_id AS id_a, b.img_id AS id_b,
           CAST(bit_count(xor(a.lo, b.lo))
                + bit_count(xor(a.hi, b.hi)) AS BIGINT) AS hamming
    FROM imgs a JOIN imgs b
      ON a.hi = b.hi AND a.img_id < b.img_id
    WHERE bit_count(xor(a.lo, b.lo)) + bit_count(xor(a.hi, b.hi))
          <= {PHASH_MAX_DIST}
    """,
)
def multimodal_phash_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Perceptual-hash IMAGE near-duplicate detection — the visual
    sibling of minhash_neardup/dedup_simhash, completing the dedup
    family across modalities (text shingles → MinHash; embeddings →
    cosine; images → aHash): decode each PNG for real, downsample to
    the 8×8 thumbnail grid, threshold against the thumbnail mean
    (average-hash), pack the 64 sign bits into two 32-bit halves (the
    sim_binary_quantize_hamming layout), then find pairs by a BAND
    equi-join on the top half and refine with exact JVM-side Hamming
    (xor + bit_count) ≤ PHASH_MAX_DIST — never an all-pairs scan.

    Ground truth is PLANTED: every doc_id % 10 == 0 image gets a twin
    (negative id namespace, the dataset-diff convention) with a +4
    brightness shift — a global shift moves pixels AND the mean
    together, so aHash is mathematically INVARIANT to it (the property
    that makes average-hash a perceptual hash at all); the pytest
    therefore demands 100% recall of planted twins, and precision is
    reported as a column rather than assumed. Single-band blocking is
    the honest fixture-scale choice; at 100 TB you run the minhash
    multi-band OR over 4×16-bit bands — same machinery, documented
    recall/grid tradeoff.

    Kernel cost model: Arrow-batched mapInPandas, numpy gather for the
    thumbnail, no per-pixel Python in the hash path; the pair stage is
    pure JVM equi-join + bit arithmetic."""
    import numpy as np  # noqa: PLC0415

    docs = (
        load(spark, sf_dir, "documents")
        .select("doc_id", "text")
        .filter(F.col("doc_id") % 2 == 0)
    )
    media = docs.mapInPandas(_synthesize_media, schema=_MEDIA_SCHEMA)

    def phash_kernel(batches):
        for pdf in batches:
            rows = []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                variants = [(int(doc_id), bytes(payload))]
                if doc_id % 10 == 0:
                    w, h, ch, px = decode_png_pixels(bytes(payload))
                    arr = np.frombuffer(px, dtype=np.uint8)
                    shifted = np.minimum(
                        255, arr.astype(np.int32) + PHASH_BRIGHTNESS
                    ).astype(np.uint8)
                    variants.append(
                        (-int(doc_id) - 1, encode_png(w, h, shifted.tobytes()))
                    )
                for vid, pl in variants:
                    w, h, ch, px = decode_png_pixels(pl)
                    arr = np.frombuffer(px, dtype=np.uint8).reshape(h, w * ch)
                    t = THUMB_SIZE
                    sy = np.minimum(h - 1, (np.arange(t) * h) // t)
                    sx = np.minimum(w - 1, (np.arange(t) * w) // t) * ch
                    thumb = arr[np.ix_(sy, sx)].astype(np.int32)
                    bits = (thumb.ravel() > thumb.mean()).astype(np.int64)
                    code = int((bits << np.arange(64, dtype=np.int64)).sum())
                    rows.append(
                        (vid, code & 0xFFFFFFFF, (code >> 32) & 0xFFFFFFFF)
                    )
            yield pd.DataFrame(rows, columns=["img_id", "lo", "hi"])

    hashed = media.mapInPandas(
        phash_kernel, schema="img_id long, lo long, hi long"
    )
    a = hashed.alias("a")
    b = hashed.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.hi") == F.col("b.hi"))  # band block: top 32 bits
            & (F.col("a.img_id") < F.col("b.img_id")),
        )
        .select(
            F.col("a.img_id").alias("id_a"),
            F.col("b.img_id").alias("id_b"),
            (
                F.bit_count(F.col("a.lo").bitwiseXOR(F.col("b.lo")))
                + F.bit_count(F.col("a.hi").bitwiseXOR(F.col("b.hi")))
            )
            .cast("bigint")
            .alias("hamming"),
        )
        .filter(F.col("hamming") <= PHASH_MAX_DIST)
        .orderBy("id_a", "id_b")
    )
    # Returned lazily (VERDICT r8 item #4): the pair set grows with the
    # corpus duplication rate, so a driver-side collect here would be a
    # driver-memory risk at 100 TB and buys nothing — the plan is
    # already deterministic via the banded equi-join + orderBy.
    return pairs


AUDIO_FP_FRAMES = 64
AUDIO_FP_MAX_DIST = 10
AUDIO_TWIN_SCALE = 2  # planted twin: amplitude halved (integer shift)


@register(
    "multimodal_audio_fingerprint_neardup",
    # Round-8 conversion (rows-only → sql-checked): the WAV payloads
    # are synthesized from the fixture text — sample(p) =
    # (ascii(text[p]) - 128) · 256 over the first 256 bytes — and PCM
    # is lossless, so the decoded frames equal that expression; window
    # energies are exact BIGINT square-sums (missing/padded windows are
    # zero and still count in the mean), and the mean threshold
    # rewrites as the integer 64·e > S. The halved-amplitude twins are
    # energy-sign-invariant EXACTLY here (samples are even, so s//2
    # squares to s²/4 with no truncation), so they reuse the same
    # code. A broken WAV encode/decode or windowing hash-fails.
    oracle=f"""
    WITH a0 AS (SELECT *, (m + 63) // 64 AS wd FROM ({_WAV_DOCS_CTE})),
    sm AS (
        SELECT doc_id, wd, unnest(range(m)) AS p,
               {_WAV_SAMPLE_EXPR} AS sv
        FROM a0
    ),

    en0 AS (
        SELECT doc_id, p // wd AS k, SUM(sv * sv) AS e
        FROM sm GROUP BY doc_id, k
    ),
    grid AS (
        SELECT doc_id, unnest(range(64)) AS k FROM a0
    ),
    en AS (
        SELECT g.doc_id, g.k, COALESCE(e.e, 0) AS e
        FROM grid g LEFT JOIN en0 e
          ON g.doc_id = e.doc_id AND g.k = e.k
    ),
    th AS (
        SELECT doc_id, k, e, SUM(e) OVER (PARTITION BY doc_id) AS s
        FROM en
    ),
    codes AS (
        SELECT doc_id,
               CAST(SUM(CASE WHEN 64 * e > s AND k < 32
                             THEN CAST(1 AS BIGINT) << CAST(k AS INTEGER)
                             ELSE 0 END) AS BIGINT) AS lo,
               CAST(SUM(CASE WHEN 64 * e > s AND k >= 32
                             THEN CAST(1 AS BIGINT) << CAST(k - 32 AS INTEGER)
                             ELSE 0 END) AS BIGINT) AS hi
        FROM th GROUP BY doc_id
    ),
    clips AS (
        SELECT doc_id AS clip_id, lo, hi FROM codes
        UNION ALL
        SELECT -doc_id - 1, lo, hi FROM codes WHERE doc_id % 10 = 5
    )
    SELECT a.clip_id AS id_a, b.clip_id AS id_b,
           CAST(bit_count(xor(a.lo, b.lo))
                + bit_count(xor(a.hi, b.hi)) AS BIGINT) AS hamming
    FROM clips a JOIN clips b
      ON a.hi = b.hi AND a.clip_id < b.clip_id
    WHERE bit_count(xor(a.lo, b.lo)) + bit_count(xor(a.hi, b.hi))
          <= {AUDIO_FP_MAX_DIST}
    """,
)
def multimodal_audio_fingerprint_neardup(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Audio FINGERPRINT near-duplicate detection — the audio member
    of the cross-modal dedup family (text → MinHash, embeddings →
    cosine, images → multimodal_phash_neardup, audio → this): decode
    each WAV's PCM frames for real, split into AUDIO_FP_FRAMES energy
    windows, threshold each window's energy against the clip mean
    (the Haitsma–Kalker energy-sign idea, mono-band form), pack the
    sign bits into two 32-bit halves, and pair by the banded
    Hamming join (top-half equi-block + exact xor/bit_count refine —
    the multimodal_phash_neardup machinery verbatim, which is the
    point: ONE pair-stage design serves every modality once content
    is reduced to sign bits).

    The fingerprint is AMPLITUDE-INVARIANT by construction — scaling
    every sample scales window energies and their mean together, so
    the planted twins (negative-id namespace, amplitude halved by an
    integer shift) must be recovered at small Hamming distance
    (truncation can flip only near-threshold windows); pytest demands
    full recall within AUDIO_FP_MAX_DIST and reports precision.

    Kernel: Arrow-batched mapInPandas, numpy square-sum per window —
    no per-sample Python; the pair stage never leaves the JVM."""
    import numpy as np  # noqa: PLC0415

    docs = (
        load(spark, sf_dir, "documents")
        .select("doc_id", "text")
        .filter(F.col("doc_id") % 2 == 1)
    )
    media = docs.mapInPandas(_synthesize_media, schema=_MEDIA_SCHEMA)

    def fp_kernel(batches):
        import io  # noqa: PLC0415
        import wave  # noqa: PLC0415

        def samples_of(payload: bytes) -> "np.ndarray":
            with wave.open(io.BytesIO(payload), "rb") as w:
                frames = w.readframes(w.getnframes())
            return np.frombuffer(frames, dtype="<i2").astype(np.int64)

        def code_of(samples: "np.ndarray") -> int:
            n = AUDIO_FP_FRAMES
            # pad to a multiple of n, square-sum per window
            pad = (-len(samples)) % n
            s = np.pad(samples, (0, pad))
            win = s.reshape(n, -1)
            energy = (win * win).sum(axis=1)
            bits = (energy > energy.mean()).astype(np.int64)
            return int((bits << np.arange(n, dtype=np.int64)).sum())

        for pdf in batches:
            rows = []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                s = samples_of(bytes(payload))
                code = code_of(s)
                rows.append(
                    (int(doc_id), code & 0xFFFFFFFF, (code >> 32) & 0xFFFFFFFF)
                )
                if doc_id % 10 == 5:
                    twin = code_of(s // AUDIO_TWIN_SCALE)
                    rows.append(
                        (
                            -int(doc_id) - 1,
                            twin & 0xFFFFFFFF,
                            (twin >> 32) & 0xFFFFFFFF,
                        )
                    )
            yield pd.DataFrame(rows, columns=["clip_id", "lo", "hi"])

    hashed = media.mapInPandas(
        fp_kernel, schema="clip_id long, lo long, hi long"
    )
    a = hashed.alias("a")
    b = hashed.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.hi") == F.col("b.hi"))
            & (F.col("a.clip_id") < F.col("b.clip_id")),
        )
        .select(
            F.col("a.clip_id").alias("id_a"),
            F.col("b.clip_id").alias("id_b"),
            (
                F.bit_count(F.col("a.lo").bitwiseXOR(F.col("b.lo")))
                + F.bit_count(F.col("a.hi").bitwiseXOR(F.col("b.hi")))
            )
            .cast("bigint")
            .alias("hamming"),
        )
        .filter(F.col("hamming") <= AUDIO_FP_MAX_DIST)
        .orderBy("id_a", "id_b")
    )
    # Returned lazily (VERDICT r8 item #4) — see multimodal_phash_neardup.
    return pairs
