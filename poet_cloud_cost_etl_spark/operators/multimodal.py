"""Multimodal columns (SURVEY §2.11 / BASELINE north star): images /
audio / video ride through the engine as opaque ``binary`` columns
with typed metadata structs; decode / feature-extract / frame-sample
run as Arrow-batched ``mapInPandas`` stages — the sanctioned Python
escape hatch (row-at-a-time UDFs stay banned).

The actual codecs (PIL/ffmpeg/librosa) are NOT in this container, so
the decode kernel is STUBBED: ``decode_images(..., impl="real")``
raises ``NotImplementedError`` with the dependency named, and the
default ``impl="fake"`` produces a deterministic payload-derived fake
so the Spark-side plumbing — schema, partitioning, batch shape,
null handling — is real and tested end-to-end.

The stub is PERMANENT SCOPE for this build (round-8 decision): the
environment forbids package installation (no pip/apt), PIL is absent,
and shipping a hand-rolled PNG decoder would be test-theater — the
engine's contract is the Arrow plumbing, which ``impl="fake"``
exercises fully; ``impl="real"`` stays the documented one-function
integration point for deployments that have the codec libraries.

At 100 TB: binary payloads dominate bytes, so the partitioning rule is
"metadata travels, payloads stay put" — filter/join on the metadata
struct first, decode only the surviving rows (mapInPandas after the
pushdown-friendly filters, never before).
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Literal

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

DECODED_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("channels", T.IntegerType()),
        T.StructField("features", T.ArrayType(T.FloatType())),
    ]
)

FRAME_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("frame_idx", T.IntegerType()),
        T.StructField("frame_bytes", T.IntegerType()),
    ]
)


def attach_payload(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Stand-in ingest: treat the document text's UTF-8 bytes as an
    opaque media payload, with the typed metadata struct a real
    multimodal table would carry."""
    payload = F.encode(F.col(text_col), "utf-8")
    return df.select(
        F.col(id_col).alias("doc_id"),
        payload.alias("payload"),
        F.struct(
            F.lit("application/octet-stream").alias("mime_type"),
            F.octet_length(payload).alias("n_bytes"),
            F.sha2(payload, 256).alias("sha256"),
        ).alias("meta"),
    )


def decode_images(
    df: DataFrame, impl: Literal["fake", "real"] = "fake"
) -> DataFrame:
    """Decode payloads to (dims, feature vector) via mapInPandas.

    ``impl="real"`` is the integration point for an actual image
    library; it raises until one is installed. ``impl="fake"`` derives
    dims/features deterministically from the payload bytes, so tests
    exercise the full Arrow round-trip and output schema.
    """

    def _decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if impl == "real":
                raise NotImplementedError(
                    "real image decode requires PIL/opencv — not available "
                    "in this container; use impl='fake' for plumbing tests"
                )
            payloads = pdf["payload"]
            out = pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "width": payloads.map(lambda b: 1 + (len(b) % 64)).astype("int32"),
                    "height": payloads.map(lambda b: 1 + (b[0] if len(b) else 0)).astype(
                        "int32"
                    ),
                    "channels": payloads.map(lambda b: 3).astype("int32"),
                    "features": payloads.map(
                        lambda b: [float(x) / 255.0 for x in b[:8]]
                    ),
                }
            )
            yield out

    return df.select("doc_id", "payload").mapInPandas(_decode, DECODED_SCHEMA)


def frame_sample(df: DataFrame, frame_size: int = 64, every_k: int = 4) -> DataFrame:
    """Video-style frame sampling: chunk each payload into fixed-size
    'frames', keep every k-th — demonstrates the 1→N mapInPandas shape
    (one input row fans out to many output rows)."""

    def _frames(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows: list[tuple[int, int, int]] = []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                n_frames = (len(payload) + frame_size - 1) // frame_size
                for i in range(0, n_frames, every_k):
                    chunk = payload[i * frame_size : (i + 1) * frame_size]
                    rows.append((doc_id, i, len(chunk)))
            yield pd.DataFrame(rows, columns=["doc_id", "frame_idx", "frame_bytes"]).astype(
                {"frame_idx": "int32", "frame_bytes": "int32"}
            )

    return df.select("doc_id", "payload").mapInPandas(_frames, FRAME_SCHEMA)


def sniff_payload_format(
    df: DataFrame, id_col: str, payload_col: str
) -> DataFrame:
    """X76: magic-byte container sniffing — classify an opaque media
    payload by its leading bytes (PNG \\x89PNG, JPEG \\xFF\\xD8\\xFF,
    RIFF/WAV 'RIFF'), falling back to application/octet-stream.  The
    first gate of every multimodal ingest: upstream-declared MIME
    types lie (mislabeled crawls, renamed extensions), so the
    pipeline routes on sniffed bytes, and the mismatch rate between
    declared and sniffed is a standing data-quality monitor.

    Engine-portable: the comparison runs on the HEX of the payload
    prefix (DuckDB cannot slice BLOBs, both engines hex
    identically), one narrow per-row expression — ZERO shuffle, no
    decode, payload bytes never leave the scan stage.

    Output: (id, mime_sniffed, n_bytes)."""
    pref = F.upper(F.hex(F.expr(f"substring({payload_col}, 1, 4)")))
    mime = (
        F.when(pref.startswith("89504E47"), F.lit("image/png"))
        .when(pref.startswith("FFD8FF"), F.lit("image/jpeg"))
        .when(pref.startswith("52494646"), F.lit("audio/x-riff"))
        .otherwise(F.lit("application/octet-stream"))
    )
    return df.select(
        F.col(id_col),
        mime.alias("mime_sniffed"),
        F.octet_length(F.col(payload_col)).cast("long").alias("n_bytes"),
    )


def image_header_dims(df: DataFrame, id_col: str, payload_col: str) -> DataFrame:
    """X109: image dimensions from HEADER BYTES — parse width/height
    straight out of the PNG IHDR (bytes 17-24, big-endian), GIF
    logical screen descriptor (bytes 7-10, little-endian), and BMP
    DIB header (bytes 19-26, little-endian signed height) with
    nothing but substring+hex+conv inside codegen.  The multimodal
    pre-flight every 100 TB image ingest runs BEFORE any decode:
    resolution histograms, aspect-ratio filters, and
    corrupt-header rejection need dimensions only, and decoding a
    payload to learn its size is ~10⁴× the cost of reading 8 header
    bytes.  No codec library, no UDF, no Python — the payload never
    leaves the scan stage (the X76 sniffing discipline; format
    dispatch reuses the same magic bytes).

    Unsupported/truncated payloads yield NULL dims with the sniffed
    format preserved, so the reject-rate is auditable.  BMP height is
    stored SIGNED (negative = top-down row order); the absolute value
    is reported, matching every viewer's behavior.

    Scale: one narrow projection — ZERO shuffle, prunable to the
    header prefix on formats/sources that support byte-range reads."""

    def be(start: int, n: int) -> Column:
        return F.expr(
            f"CAST(conv(hex(substring({payload_col}, {start}, {n})), 16, 10) "
            "AS BIGINT)"
        )

    def le(start: int, n: int) -> Column:
        # little-endian: per-byte weighted sum.  reverse() on BINARY
        # round-trips through a UTF-8 string and mangles non-ASCII
        # bytes, so the bytes are read individually instead.
        terms = " + ".join(
            f"{256 ** i} * CAST(conv(hex(substring({payload_col}, "
            f"{start + i}, 1)), 16, 10) AS BIGINT)"
            for i in range(n)
        )
        return F.expr(f"({terms})")

    pref = F.upper(F.hex(F.expr(f"substring({payload_col}, 1, 4)")))
    n_bytes = F.octet_length(F.col(payload_col))
    is_png = pref.startswith("89504E47") & (n_bytes >= 24)
    is_gif = pref.startswith("47494638") & (n_bytes >= 10)
    is_bmp = pref.startswith("424D") & (n_bytes >= 26)
    fmt = (
        F.when(is_png, "png").when(is_gif, "gif").when(is_bmp, "bmp")
        .otherwise("unknown")
    )
    # BMP height: int32 LE, signed — fold the two's complement.
    bmp_h_raw = le(23, 4)
    bmp_h = F.when(
        bmp_h_raw >= F.lit(2**31), (F.lit(2**32) - bmp_h_raw)
    ).otherwise(bmp_h_raw)
    width = (
        F.when(is_png, be(17, 4)).when(is_gif, le(7, 2)).when(is_bmp, le(19, 4))
    )
    height = (
        F.when(is_png, be(21, 4)).when(is_gif, le(9, 2)).when(is_bmp, bmp_h)
    )
    return df.select(
        F.col(id_col),
        fmt.alias("format"),
        width.cast("long").alias("width"),
        height.cast("long").alias("height"),
        n_bytes.cast("long").alias("n_bytes"),
    )


def wav_header_info(df: DataFrame, id_col: str, payload_col: str) -> DataFrame:
    """X121: audio stream parameters from WAV HEADER BYTES — channel
    count, sample rate, bit depth, frame count, and duration straight
    out of the RIFF/WAVE fmt+data chunks (canonical 44-byte PCM
    layout: channels @23-24 LE, sample rate @25-28 LE, bits @35-36
    LE, data size @41-44 LE) with substring+hex+conv inside codegen —
    the audio twin of X109: a 100 TB audio ingest filters on
    duration/rate/channels long before any decode, and reading 44
    header bytes is ~10⁵× cheaper than decoding a waveform.  No
    codec, no UDF, ZERO shuffle (the X76/X109 discipline).

    Only the canonical contiguous-fmt PCM layout is parsed (fmt
    chunk at offset 13 with size 16, 'data' at offset 37) — WAVs
    with extension chunks yield is_canonical_wav = false and NULL
    params rather than misread values; the reject-rate is auditable.

    Exactness: n_frames = (8·data_size) div (channels·bits) and
    duration_ms = (1000·8·data_size) div (rate·channels·bits) — two
    exact integer divisions, no floating seconds anywhere.

    Scale: one narrow projection — ZERO shuffle, header-prefix
    prunable."""

    def le(start: int, n: int) -> str:
        # per-byte weighted sum (reverse() on BINARY mangles bytes —
        # the X109 note)
        terms = " + ".join(
            f"{256 ** i} * CAST(conv(hex(substring({payload_col}, "
            f"{start + i}, 1)), 16, 10) AS BIGINT)"
            for i in range(n)
        )
        return f"({terms})"

    hx = f"upper(hex(substring({payload_col}, 1, 44)))"
    wav = (
        f"(substring({hx}, 1, 8) = '52494646' AND "
        f"substring({hx}, 17, 8) = '57415645' AND "
        f"octet_length({payload_col}) >= 44)"
    )
    canon = (
        f"({wav} AND substring({hx}, 25, 8) = '666D7420' AND "
        f"substring({hx}, 33, 8) = '10000000' AND "
        f"substring({hx}, 73, 8) = '64617461')"
    )
    ch, rate, bits, dsize = le(23, 2), le(25, 4), le(35, 2), le(41, 4)
    ok = f"({canon} AND {ch} > 0 AND {rate} > 0 AND {bits} > 0)"
    return df.select(
        F.col(id_col),
        F.expr(wav).alias("is_wav"),
        F.expr(ok).alias("is_canonical_wav"),
        F.expr(f"CASE WHEN {ok} THEN {ch} END").alias("channels"),
        F.expr(f"CASE WHEN {ok} THEN {rate} END").alias("sample_rate_hz"),
        F.expr(f"CASE WHEN {ok} THEN {bits} END").alias("bits_per_sample"),
        F.expr(
            f"CASE WHEN {ok} THEN (8 * {dsize}) div ({ch} * {bits}) END"
        ).alias("n_frames"),
        F.expr(
            f"CASE WHEN {ok} THEN (8000 * {dsize}) div "
            f"({rate} * {ch} * {bits}) END"
        ).alias("duration_ms"),
    )
