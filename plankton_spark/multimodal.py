"""Multimodal column handling (north-star brief).

Pattern: media travels as an opaque BinaryType column + a typed
metadata struct; decode / feature-extract / resize / frame-sample run
as Arrow-batched pandas functions over mapInPandas, so each executor
core processes a batch of blobs without JVM round-trips per row.

The image/audio codecs are NOT in this container, so ``decode_image``
raises NotImplementedError and the pipeline runs with
``fake_decode_meta`` — a deterministic stand-in with the same schema
and batch shape, keeping the Spark-side plumbing (schemas,
partitioning, UDF signatures) real and tested.

At 100 TB: blobs dominate bytes — keep them in their own column so
column pruning skips them unless a stage truly decodes, and size
``spark.sql.files.maxPartitionBytes`` so one task holds only a few
hundred blobs in flight.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MEDIA_SCHEMA = (
    "doc_id long, uri string, media_type string, n_bytes long, payload binary"
)

DECODED_SCHEMA = "doc_id long, media_type string, width int, height int, n_frames int"


def attach_media(documents: DataFrame) -> DataFrame:
    """Manufacture the multimodal column layout from the documents
    fixture: payload = utf-8 bytes of text, media type derived from
    lang (deterministic)."""
    media_type = (
        F.when(F.col("lang").isin("en", "de"), "image/png")
        .when(F.col("lang").isin("es", "fr"), "audio/wav")
        .otherwise("video/mp4")
    )
    return documents.select(
        "doc_id",
        F.concat(F.lit("blob://corpus/"), F.col("doc_id").cast("string")).alias("uri"),
        media_type.alias("media_type"),
        F.octet_length("text").cast("long").alias("n_bytes"),
        F.encode("text", "utf-8").alias("payload"),
    )


_CODEC_UNPROBED = object()
_CODEC = _CODEC_UNPROBED


def image_codec():
    """Capability probe for a real image codec, cached after first call
    (the same gating pattern as the JVM-Avro jar probe in
    sources/avro_ocf.py): returns ("pil", module) or ("cv2", module),
    or None when neither library is importable. decode_image selects
    its path from this at CALL time, so the same code ships unchanged
    to a cluster image with codecs installed."""
    global _CODEC
    if _CODEC is _CODEC_UNPROBED:
        _CODEC = None
        try:
            from PIL import Image  # noqa: PLC0415

            _CODEC = ("pil", Image)
        except ImportError:
            try:
                import cv2  # noqa: PLC0415

                _CODEC = ("cv2", cv2)
            except ImportError:
                _CODEC = None
    return _CODEC


def decode_image(payload: bytes) -> dict:
    """Decode an image payload to typed metadata
    (width/height/n_frames/decoder).

    Codec-gated: with PIL or cv2 present the pixels are REALLY decoded
    (any format the codec supports); without a codec, uncompressed BMP
    still decodes via the pure-Python header parser (real bytes, real
    parse — see decode_bmp_header); anything else raises
    NotImplementedError, because guessing metadata for a compressed
    format without a codec would be silent garbage."""
    codec = image_codec()
    if codec is not None:
        kind, mod = codec
        if kind == "pil":
            import io as _io

            with mod.open(_io.BytesIO(payload)) as im:
                im.load()  # force a real pixel decode, not a lazy header read
                return {
                    "width": im.width,
                    "height": im.height,
                    "n_frames": int(getattr(im, "n_frames", 1)),
                    "decoder": "pil",
                }
        import numpy as _np

        arr = mod.imdecode(_np.frombuffer(payload, _np.uint8), mod.IMREAD_UNCHANGED)
        if arr is None:
            raise ValueError("cv2 could not decode payload")
        return {
            "width": int(arr.shape[1]),
            "height": int(arr.shape[0]),
            "n_frames": 1,
            "decoder": "cv2",
        }
    if payload[:2] == b"BM":
        w, h = decode_bmp_header(payload)
        return {"width": w, "height": h, "n_frames": 1, "decoder": "bmp-header"}
    raise NotImplementedError(
        "no image codec installed (PIL/cv2) and payload is not "
        "uncompressed BMP; install a codec or use fake_decode_meta "
        "for plumbing tests"
    )


def fake_decode_meta(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """Deterministic decode stand-in (same schema/batch shape as a real
    decoder): dimensions derived from payload length."""
    for pdf in batches:
        n = pdf["n_bytes"]
        out = pd.DataFrame(
            {
                "doc_id": pdf["doc_id"],
                "media_type": pdf["media_type"],
                "width": (16 + n % 64).astype("int32"),
                "height": (9 + n % 36).astype("int32"),
                "n_frames": pdf["media_type"].map(
                    lambda m: 1 if m != "video/mp4" else 24
                ),
            }
        )
        yield out


def decode_media(media: DataFrame) -> DataFrame:
    """Arrow-batched decode over mapInPandas (fake decoder)."""
    return media.mapInPandas(fake_decode_meta, schema=DECODED_SCHEMA)


# -- real-bytes path: uncompressed BMP / PCM WAV ----------------------
#
# Compressed codecs (PNG/JPEG/MP4) need libraries this container lacks,
# but BMP and RIFF/WAVE are plain struct layouts — author the bytes in
# pure Python, decode by parsing the actual headers. This makes the
# decode pipeline real end-to-end: payload bytes in, header-derived
# metadata out; a wrong writer OR parser breaks the oracle hash.

import struct

MEDIA_BIN_SCHEMA = "doc_id long, media_type string, payload binary"

DECODED_BIN_SCHEMA = (
    "doc_id long, media_type string, width int, height int, "
    "n_channels int, sample_rate int, n_samples long"
)


def make_bmp(width: int, height: int) -> bytes:
    """Minimal 24bpp uncompressed BMP (BITMAPFILEHEADER +
    BITMAPINFOHEADER + zeroed pixel rows, 4-byte row padding)."""
    row = width * 3
    pad = (-row) % 4
    data = (b"\x00" * (row + pad)) * height
    pixel_offset = 14 + 40
    fh = struct.pack("<2sIHHI", b"BM", pixel_offset + len(data), 0, 0, pixel_offset)
    ih = struct.pack(
        "<IiiHHIIiiII", 40, width, height, 1, 24, 0, len(data), 2835, 2835, 0, 0
    )
    return fh + ih + data


def make_wav(n_samples: int, sample_rate: int, n_channels: int) -> bytes:
    """Minimal PCM16 RIFF/WAVE with zeroed samples."""
    data = b"\x00\x00" * n_samples * n_channels
    fmt = struct.pack(
        "<4sIHHIIHH",
        b"fmt ",
        16,
        1,
        n_channels,
        sample_rate,
        sample_rate * n_channels * 2,
        n_channels * 2,
        16,
    )
    hdr = struct.pack("<4sI4s", b"RIFF", 4 + len(fmt) + 8 + len(data), b"WAVE")
    return hdr + fmt + struct.pack("<4sI", b"data", len(data)) + data


def decode_bmp_header(b: bytes) -> tuple[int, int]:
    if b[:2] != b"BM":
        raise ValueError("not a BMP payload")
    width, height = struct.unpack_from("<ii", b, 18)
    return width, abs(height)


def decode_wav_header(b: bytes) -> tuple[int, int, int]:
    """Returns (n_channels, sample_rate, n_samples) by walking the
    RIFF chunk list to the data chunk."""
    if b[:4] != b"RIFF" or b[8:12] != b"WAVE":
        raise ValueError("not a WAV payload")
    n_channels, sample_rate = struct.unpack_from("<HI", b, 22)
    off = 12
    while off + 8 <= len(b):
        cid, csize = struct.unpack_from("<4sI", b, off)
        if cid == b"data":
            return n_channels, sample_rate, csize // (n_channels * 2)
        off += 8 + csize
    raise ValueError("WAV payload has no data chunk")


def author_media_corpus(documents: DataFrame) -> DataFrame:
    """Deterministic binary corpus from the documents fixture: even
    doc_ids become BMPs sized by n_chars, odd become WAVs — pure
    arithmetic, so an ANSI-SQL oracle can shadow every header field."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads, mtypes = [], []
            for doc_id, n_chars in zip(pdf["doc_id"], pdf["n_chars"]):
                if doc_id % 2 == 0:
                    payloads.append(
                        make_bmp(4 + int(n_chars) % 32, 3 + int(n_chars) % 24)
                    )
                    mtypes.append("image/bmp")
                else:
                    payloads.append(
                        make_wav(
                            100 + int(n_chars) % 1000,
                            8000 * (1 + int(n_chars) % 3),
                            1 + int(n_chars) % 2,
                        )
                    )
                    mtypes.append("audio/wav")
            yield pd.DataFrame(
                {"doc_id": pdf["doc_id"], "media_type": mtypes, "payload": payloads}
            )

    return documents.select("doc_id", "n_chars").mapInPandas(
        gen, schema=MEDIA_BIN_SCHEMA
    )


def decode_media_bin(media: DataFrame) -> DataFrame:
    """Real header decode over mapInPandas: every output value is
    parsed from the payload bytes, never recomputed from metadata."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = {
                "doc_id": [],
                "media_type": [],
                "width": [],
                "height": [],
                "n_channels": [],
                "sample_rate": [],
                "n_samples": [],
            }
            for doc_id, mtype, payload in zip(
                pdf["doc_id"], pdf["media_type"], pdf["payload"]
            ):
                b = bytes(payload)
                rows["doc_id"].append(doc_id)
                rows["media_type"].append(mtype)
                if mtype == "image/bmp":
                    w, h = decode_bmp_header(b)
                    rows["width"].append(w)
                    rows["height"].append(h)
                    rows["n_channels"].append(0)
                    rows["sample_rate"].append(0)
                    rows["n_samples"].append(0)
                else:
                    ch, rate, n = decode_wav_header(b)
                    rows["width"].append(0)
                    rows["height"].append(0)
                    rows["n_channels"].append(ch)
                    rows["sample_rate"].append(rate)
                    rows["n_samples"].append(n)
            out = pd.DataFrame(rows)
            out["width"] = out["width"].astype("int32")
            out["height"] = out["height"].astype("int32")
            out["n_channels"] = out["n_channels"].astype("int32")
            out["sample_rate"] = out["sample_rate"].astype("int32")
            out["n_samples"] = out["n_samples"].astype("int64")
            yield out

    return media.mapInPandas(gen, schema=DECODED_BIN_SCHEMA)


# -- real signal path: tone synthesis + numpy feature extraction ------
#
# The container has no audio codec, but PCM16 WAV is a plain struct
# layout and numpy ships — so SYNTHESIS and FEATURE EXTRACTION are
# fully real here: actual samples in the payload, actual FFT over
# them on the executors. Frequencies are chosen to divide the sample
# rate (integer cycles per window → zero spectral leakage), which is
# what makes the dominant-bin output ANALYTICALLY exact and therefore
# SQL-oracle-checkable.

TONE_N = 4096
TONE_SR = 8192
TONE_AMP = 12000


def tone_freq_for(doc_id: int) -> int:
    """2^(3 + doc_id%8) Hz — 8..1024, every value divides TONE_SR."""
    return 1 << (3 + int(doc_id) % 8)


def make_tone_wav(freq: int, n_samples: int = TONE_N,
                  sample_rate: int = TONE_SR) -> bytes:
    """PCM16 mono WAV carrying a real sine tone (int16-quantized)."""
    import numpy as np

    t = np.arange(n_samples, dtype=np.float64)
    samples = np.round(
        TONE_AMP * np.sin(2.0 * np.pi * freq * t / sample_rate)
    ).astype("<i2")
    data = samples.tobytes()
    fmt = struct.pack(
        "<4sIHHIIHH", b"fmt ", 16, 1, 1, sample_rate,
        sample_rate * 2, 2, 16,
    )
    hdr = struct.pack("<4sI4s", b"RIFF", 4 + len(fmt) + 8 + len(data), b"WAVE")
    return hdr + fmt + struct.pack("<4sI", b"data", len(data)) + data


def _wav_samples(b: bytes):
    import numpy as np

    n_channels, sample_rate, n = decode_wav_header(b)
    off = 12
    while off + 8 <= len(b):
        cid, csize = struct.unpack_from("<4sI", b, off)
        if cid == b"data":
            raw = b[off + 8 : off + 8 + csize]
            return sample_rate, np.frombuffer(raw, dtype="<i2")
        off += 8 + csize
    raise ValueError("WAV payload has no data chunk")


AUDIO_FEATURES_SCHEMA = (
    "doc_id long, n_samples long, sample_rate long, "
    "dom_freq_hz long, zcr long, rms_micro long"
)


def audio_features(media: DataFrame) -> DataFrame:
    """REAL audio feature extraction on the executors (Arrow batches →
    numpy): per payload, the dominant frequency via rFFT argmax (DC
    excluded), the zero-crossing count, and integer micro-RMS from an
    exact int64 sum of squares. No codec, no stub — the samples are
    parsed from the PCM bytes and transformed with numpy."""
    import numpy as np

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                sr, s = _wav_samples(bytes(payload))
                n = len(s)
                spec = np.abs(np.fft.rfft(s.astype(np.float64)))
                dom_bin = int(np.argmax(spec[1:])) + 1
                dom_freq = dom_bin * sr // n
                signs = np.sign(s)
                nz = signs[signs != 0]
                zcr = int(np.count_nonzero(nz[1:] != nz[:-1]))
                ssq = int((s.astype(np.int64) ** 2).sum())
                rms_micro = int(
                    round(np.sqrt(ssq / n) * 1_000_000)
                )
                rows.append(
                    (int(doc_id), n, int(sr), int(dom_freq), zcr, rms_micro)
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    "doc_id", "n_samples", "sample_rate",
                    "dom_freq_hz", "zcr", "rms_micro",
                ],
            )

    return media.select("doc_id", "payload").mapInPandas(
        gen, schema=AUDIO_FEATURES_SCHEMA
    )


def author_tone_corpus(documents: DataFrame) -> DataFrame:
    """Deterministic tone corpus: every doc becomes a PCM16 WAV whose
    sine frequency is 2^(3 + doc_id%8) Hz — integer cycles per
    window, so the FFT's answer is knowable in closed form."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = [
                make_tone_wav(tone_freq_for(d)) for d in pdf["doc_id"]
            ]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "media_type": ["audio/wav"] * len(payloads),
                    "payload": payloads,
                }
            )

    return documents.select("doc_id", "n_chars").mapInPandas(
        gen, schema=MEDIA_BIN_SCHEMA
    )


# -- real pixel path: gradient BMPs + numpy image features ------------


def make_gradient_bmp(width: int, height: int) -> bytes:
    """24bpp BMP whose gray pixel at (x, y) is (x*17 + y*29) % 256 —
    REAL pixel content with a closed-form structure, so aggregate
    image features are SQL-derivable. Rows bottom-up with 4-byte
    padding per the format."""
    import numpy as np

    x = np.arange(width, dtype=np.int64)
    y = np.arange(height, dtype=np.int64)
    gray = ((x[None, :] * 17 + y[:, None] * 29) % 256).astype(np.uint8)
    row_bytes = np.repeat(gray, 3, axis=1)  # B=G=R
    pad = (-(width * 3)) % 4
    if pad:
        row_bytes = np.concatenate(
            [row_bytes, np.zeros((height, pad), dtype=np.uint8)], axis=1
        )
    data = row_bytes[::-1].tobytes()  # bottom-up row order
    pixel_offset = 14 + 40
    fh = struct.pack(
        "<2sIHHI", b"BM", pixel_offset + len(data), 0, 0, pixel_offset
    )
    ih = struct.pack(
        "<IiiHHIIiiII", 40, width, height, 1, 24, 0, len(data), 2835, 2835,
        0, 0,
    )
    return fh + ih + data


def _bmp_gray(b: bytes):
    """Gray plane (top-down, int64) parsed from a 24bpp BMP payload."""
    import numpy as np

    width, height = decode_bmp_header(b)
    pixel_offset = struct.unpack_from("<I", b, 10)[0]
    stride = (width * 3 + 3) // 4 * 4
    raw = np.frombuffer(
        b, dtype=np.uint8, count=stride * height, offset=pixel_offset
    ).reshape(height, stride)
    blue = raw[::-1, : width * 3 : 3]  # flip bottom-up; B channel
    return blue.astype(np.int64)


IMAGE_FEATURES_SCHEMA = (
    "doc_id long, width long, height long, pixel_sum long, edge_sum long"
)


def image_features(media: DataFrame) -> DataFrame:
    """REAL image feature extraction on the executors: the BMP pixel
    rows are parsed with numpy (padding stripped, bottom-up order
    flipped) and reduced to the total brightness and the horizontal
    L1 gradient energy — exact integers, no codec, no stub."""
    import numpy as np

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                g = _bmp_gray(bytes(payload))
                h, w = g.shape
                pixel_sum = int(g.sum())
                edge_sum = int(np.abs(g[:, 1:] - g[:, :-1]).sum())
                rows.append((int(doc_id), w, h, pixel_sum, edge_sum))
            yield pd.DataFrame(
                rows,
                columns=["doc_id", "width", "height", "pixel_sum", "edge_sum"],
            )

    return media.select("doc_id", "payload").mapInPandas(
        gen, schema=IMAGE_FEATURES_SCHEMA
    )


def author_gradient_corpus(documents: DataFrame) -> DataFrame:
    """Deterministic gradient-BMP corpus: width/height derived from
    doc_id, pixels from the closed-form gradient."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = [
                make_gradient_bmp(16 + int(d) % 16, 12 + int(d) % 12)
                for d in pdf["doc_id"]
            ]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "media_type": ["image/bmp"] * len(payloads),
                    "payload": payloads,
                }
            )

    return documents.select("doc_id", "n_chars").mapInPandas(
        gen, schema=MEDIA_BIN_SCHEMA
    )


# -- real motion path: multi-frame gray video + numpy frame diffs -----

VID_MAGIC = b"VID0"


def make_gradient_video(
    width: int, height: int, n_frames: int
) -> bytes:
    """Tiny raw-gray video container (magic + dims + top-down frames):
    frame k's pixel (x, y) is (x*17 + y*29 + k*31) % 256 — a
    closed-form phase shift per frame, so inter-frame motion energy
    is SQL-derivable."""
    import numpy as np

    x = np.arange(width, dtype=np.int64)
    y = np.arange(height, dtype=np.int64)
    base = x[None, :] * 17 + y[:, None] * 29
    frames = [
        ((base + k * 31) % 256).astype(np.uint8).tobytes()
        for k in range(n_frames)
    ]
    hdr = VID_MAGIC + struct.pack("<HHH", width, height, n_frames)
    return hdr + b"".join(frames)


VIDEO_FEATURES_SCHEMA = (
    "doc_id long, width long, height long, n_frames long, "
    "motion_sum long, frame0_sum long"
)


def video_features(media: DataFrame) -> DataFrame:
    """REAL video analysis on the executors: every frame's gray plane
    parsed with numpy, motion = the L1 energy of consecutive frame
    diffs summed over the clip, plus the first frame's brightness —
    exact integers (the decode-resize-framesample plumbing's missing
    half, now with actual pixel arithmetic)."""
    import numpy as np

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                b = bytes(payload)
                if b[:4] != VID_MAGIC:
                    raise ValueError("not a VID0 payload")
                w, h, n = struct.unpack_from("<HHH", b, 4)
                raw = np.frombuffer(
                    b, dtype=np.uint8, count=w * h * n, offset=10
                ).reshape(n, h, w).astype(np.int64)
                motion = int(np.abs(raw[1:] - raw[:-1]).sum())
                rows.append(
                    (int(doc_id), w, h, n, motion, int(raw[0].sum()))
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    "doc_id", "width", "height", "n_frames",
                    "motion_sum", "frame0_sum",
                ],
            )

    return media.select("doc_id", "payload").mapInPandas(
        gen, schema=VIDEO_FEATURES_SCHEMA
    )


def author_video_corpus(documents: DataFrame) -> DataFrame:
    """Deterministic clip corpus: dims and frame count from doc_id."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = [
                make_gradient_video(
                    8 + int(d) % 8, 6 + int(d) % 6, 3 + int(d) % 3
                )
                for d in pdf["doc_id"]
            ]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "media_type": ["video/raw-gray"] * len(payloads),
                    "payload": payloads,
                }
            )

    return documents.select("doc_id", "n_chars").mapInPandas(
        gen, schema=MEDIA_BIN_SCHEMA
    )
