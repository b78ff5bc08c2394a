"""Multimodal (image/audio/video) column plumbing.

Assets are opaque ``binary`` columns with typed metadata — the Spark-native
way to carry media through a 100 TB training-data pipeline (partition by
asset id / shard, never collect). Decode / feature-extract / resize /
frame-sample run as Arrow-batched ``mapInPandas`` operators so codec work
is vectorized per batch and scales with partitions.

The compressed-format codecs (PIL/ffmpeg/soundfile) are NOT in this
container, so those decode kernels are stubbed two ways:
- ``decode_image_meta`` parses our deterministic fake header (magic
  ``FIMG`` + big-endian u32 width/height) — real Spark plumbing (schema,
  batching, null handling) with a fake codec;
- ``decode_image_pixels`` raises ``NotImplementedError`` exactly where a
  real decoder plugs in.

Two UNCOMPRESSED production formats need no external codec at all and are
decoded for real: 24-bit BMP (``decode_bmp_pixels`` — the struct layout
is the whole spec) and PCM WAV (``decode_wav_audio`` — stdlib ``wave``).
Their bytes open in any viewer/player; only JPEG/PNG/MP3-class formats
remain behind the seam.
"""

from __future__ import annotations

import struct
from collections.abc import Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MAGIC = b"FIMG"

ASSET_SCHEMA = T.StructType(
    [
        T.StructField("asset_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),  # image | audio | video
        T.StructField("data", T.BinaryType(), True),
        T.StructField("meta", T.MapType(T.StringType(), T.StringType()), True),
    ]
)

IMAGE_META_SCHEMA = (
    "asset_id long, kind string, width int, height int, n_bytes int, valid boolean"
)


def fake_image_bytes(width: int, height: int, fill: int = 0) -> bytes:
    """Deterministic fake image payload: FIMG + u32 w + u32 h + pixel bytes."""
    return MAGIC + struct.pack(">II", width, height) + bytes([fill % 256]) * (width * height)


def decode_image_meta(assets: DataFrame) -> DataFrame:
    """mapInPandas decode of the fake header → typed metadata columns.

    Real plumbing: Arrow batch in/out, per-row binary parsing, malformed
    payloads surface as valid=false rows instead of task failures.
    """

    def batches(it: Iterator) -> Iterator:
        import pandas as pd

        for pdf in it:
            rows = []
            for aid, kind, data in zip(pdf["asset_id"], pdf["kind"], pdf["data"]):
                ok = data is not None and bytes(data[:4]) == MAGIC and len(data) >= 12
                w, h = struct.unpack(">II", bytes(data[4:12])) if ok else (0, 0)
                rows.append((aid, kind, w, h, len(data) if data is not None else 0, bool(ok)))
            yield pd.DataFrame(
                rows, columns=["asset_id", "kind", "width", "height", "n_bytes", "valid"]
            )

    return assets.mapInPandas(batches, schema=IMAGE_META_SCHEMA)


def decode_image_pixels(assets: DataFrame) -> DataFrame:
    """Full pixel decode — requires a real codec (PIL/libjpeg), absent here."""
    raise NotImplementedError(
        "compressed-format pixel decode needs an image codec (PIL) not "
        "present in this container; decode_bmp_pixels is the REAL no-"
        "dependency decode path (uncompressed 24-bit BMP) and "
        "decode_image_meta exercises the rest of the Spark-side plumbing"
    )


def fake_image_gradient(width: int, height: int, base: int = 0) -> bytes:
    """Fake image whose pixel i is ``(base + i) % 256`` — content the
    feature/resize kernels (and a SQL oracle) can recompute in closed form."""
    px = bytes((base + i) % 256 for i in range(width * height))
    return MAGIC + struct.pack(">II", width, height) + px


IMAGE_FEATURES_SCHEMA = (
    "asset_id long, width int, height int, n_bytes int, "
    "mean_px double, resized_mean_px double, valid boolean"
)


def _parse_fimg(b: bytes):
    """(w, h, px uint8 ndarray) for a well-formed FIMG payload, else
    None. ONE header validation for the image kernels (image_features,
    image_ahash) — the round-8 review found it copy-pasted with
    drift-prone variations."""
    import numpy as np

    if b[:4] != MAGIC or len(b) < 12:
        return None
    w, h = struct.unpack(">II", b[4:12])
    px = np.frombuffer(b[12 : 12 + w * h], dtype=np.uint8)
    if not (px.size == w * h > 0):
        return None
    return w, h, px


def _parse_fvid(b: bytes):
    """(n_frames, w, h) for a well-formed FVID payload (all frames
    present, nonzero area), else None."""
    if b[:4] != VIDEO_MAGIC or len(b) < 16:
        return None
    n, w, h = struct.unpack(">III", b[4:16])
    if w * h == 0 or len(b) < 16 + n * w * h:
        return None
    return n, w, h


def _parse_faud(b: bytes):
    """(rate, samples int64 ndarray) for a well-formed FAUD payload
    (nonzero rate, all samples present), else None."""
    import numpy as np

    if b[:4] != AUDIO_MAGIC or len(b) < 12:
        return None
    rate, n = struct.unpack(">II", b[4:12])
    if rate == 0 or len(b) < 12 + 2 * n:
        return None
    return rate, np.frombuffer(b, dtype=">i2", offset=12, count=n).astype(np.int64)



def image_features(assets: DataFrame, *, resize_to: tuple[int, int] = (8, 8)) -> DataFrame:
    """Decode + feature-extract + nearest-neighbour resize in ONE Arrow pass.

    Real kernels over the fake raster: mean intensity, and the mean of an
    ``resize_to`` NN-downsample (integer index math — ``(r*h)//rh`` — so the
    result is engine-reproducible). Means are exact-int sums divided once in
    IEEE double, so values hash-match a SQL oracle bit-for-bit. Malformed
    payloads → ``valid=false`` rows, never task failures. A real codec swaps
    into the ``frombuffer`` line; everything else (schema, batching,
    partition parallelism) is production plumbing.
    """
    rw, rh = resize_to

    def batches(it: Iterator) -> Iterator:
        import numpy as np
        import pandas as pd

        for pdf in it:
            rows = []
            for aid, data in zip(pdf["asset_id"], pdf["data"]):
                b = bytes(data) if data is not None else b""
                parsed = _parse_fimg(b)
                ok = parsed is not None
                w = h = 0
                mean_px = rmean = 0.0
                if ok:
                    w, h, px = parsed
                    arr = px.reshape(h, w)
                    mean_px = int(px.sum(dtype=np.int64)) / float(w * h)
                    resized = arr[(np.arange(rh) * h) // rh][:, (np.arange(rw) * w) // rw]
                    rmean = int(resized.sum(dtype=np.int64)) / float(rw * rh)
                rows.append((aid, w, h, len(b), mean_px, rmean, bool(ok)))
            yield pd.DataFrame(
                rows,
                columns=[
                    "asset_id", "width", "height", "n_bytes",
                    "mean_px", "resized_mean_px", "valid",
                ],
            )

    return assets.mapInPandas(batches, schema=IMAGE_FEATURES_SCHEMA)


VIDEO_MAGIC = b"FVID"


def fake_video_bytes(width: int, height: int, n_frames: int, base: int = 0) -> bytes:
    """Fake video: FVID + u32 n_frames/w/h + per-frame rasters where frame k
    pixel i is ``(base + 7*k + i) % 256`` (distinct, recomputable frames)."""
    frames = b"".join(
        bytes((base + 7 * k + i) % 256 for i in range(width * height)) for k in range(n_frames)
    )
    return VIDEO_MAGIC + struct.pack(">III", n_frames, width, height) + frames


FRAME_SAMPLE_SCHEMA = "asset_id long, frame_idx int, width int, height int, frame_mean double"


def frame_sample(assets: DataFrame, every_n: int = 10) -> DataFrame:
    """Sample every ``every_n``-th frame of each fake video — a row-exploding
    mapInPandas (1 video in, ceil(n_frames/every_n) frame rows out).

    The Arrow batch shape, frame indexing, and per-frame reduction are the
    real pipeline; ffmpeg would replace the ``frombuffer`` slice. Frame means
    are exact-int sums / IEEE double divide — SQL-oracle reproducible.

    Malformed/truncated payloads yield ZERO frame rows (there is no
    per-frame place for a valid flag) — run :func:`decode_video_meta`
    first when corrupt-asset VISIBILITY matters; this operator's
    contract is frames-of-decodable-assets only.
    """
    if every_n < 1:
        # range(0, n, 0) raises INSIDE the Arrow worker (a task failure,
        # the exact mode this module exists to avoid); negatives would
        # silently emit nothing — validate driver-side like band_size
        raise ValueError(f"frame_sample: every_n ({every_n}) must be >= 1")

    def batches(it: Iterator) -> Iterator:
        import numpy as np
        import pandas as pd

        for pdf in it:
            rows = []
            for aid, data in zip(pdf["asset_id"], pdf["data"]):
                b = bytes(data) if data is not None else b""
                parsed = _parse_fvid(b)
                if parsed is None:
                    continue
                n, w, h = parsed
                fsize = w * h
                for k in range(0, n, every_n):
                    px = np.frombuffer(b[16 + k * fsize : 16 + (k + 1) * fsize], dtype=np.uint8)
                    rows.append((aid, k, w, h, int(px.sum(dtype=np.int64)) / float(fsize)))
            yield pd.DataFrame(
                rows, columns=["asset_id", "frame_idx", "width", "height", "frame_mean"]
            )

    return assets.mapInPandas(batches, schema=FRAME_SAMPLE_SCHEMA)


def filter_valid_images(assets: DataFrame, min_width: int = 1) -> DataFrame:
    """Composable pipeline step: decode meta → keep structurally valid assets."""
    meta = decode_image_meta(assets)
    return meta.filter(F.col("valid") & (F.col("width") >= min_width))


def fake_image_texture(width: int, height: int, mult: int, base: int = 0) -> bytes:
    """Fake image whose pixel i is ``(base + i*mult) % 256`` — wrap-around
    stripe textures whose 8x8 average-hashes genuinely differ across
    parameter tuples (the plain gradient collapses to ONE hash: every ramp
    is below-mean then above-mean), while nearby ``base`` values yield
    hash-identical or near-identical images. Content a SQL oracle can
    recompute in closed form."""
    px = bytes((base + i * mult) % 256 for i in range(width * height))
    return MAGIC + struct.pack(">II", width, height) + px


IMAGE_AHASH_SCHEMA = (
    "asset_id long, ahash long, ahash_hex string, "
    "band0 int, band1 int, band2 int, band3 int, valid boolean"
)


def image_ahash(assets: DataFrame) -> DataFrame:
    """Perceptual average-hash (aHash) per image in ONE Arrow pass: decode
    the fake raster, 8x8 nearest-neighbour downsample (same integer index
    math as :func:`image_features`), then bit k = 1 iff ``64*px_k > sum``
    (exact integer compare — no float mean, so engines can't disagree).

    Returns the hash as a signed int64 (two's-complement wrap of the 64-bit
    pattern) for JVM-side ``bit_count(a ^ b)`` Hamming distance, a hex
    string for human-auditable output, and the four 16-bit bands used by
    the multi-index Hamming join (Manku et al., WWW'07 — a hash pair within
    Hamming distance 3 must agree exactly on at least one of 4 bands, by
    pigeonhole). Real-codec swap point: the ``frombuffer`` line.
    """

    def batches(it: Iterator) -> Iterator:
        import numpy as np
        import pandas as pd

        for pdf in it:
            rows = []
            for aid, data in zip(pdf["asset_id"], pdf["data"]):
                b = bytes(data) if data is not None else b""
                parsed = _parse_fimg(b)
                ok = parsed is not None and parsed[0] >= 8 and parsed[1] >= 8
                if ok:
                    w, h, px = parsed
                if not ok:
                    rows.append((aid, 0, "0" * 16, 0, 0, 0, 0, False))
                    continue
                arr = px.reshape(h, w)
                r = arr[(np.arange(8) * h) // 8][:, (np.arange(8) * w) // 8].reshape(-1)
                s = int(r.sum(dtype=np.int64))
                bits = "".join("1" if 64 * int(v) > s else "0" for v in r)
                val = int(bits, 2)
                signed = val - (1 << 64) if val >= (1 << 63) else val
                bands = [int(bits[16 * j : 16 * j + 16], 2) for j in range(4)]
                rows.append((aid, signed, format(val, "016x"), *bands, True))
            yield pd.DataFrame(
                rows,
                columns=[
                    "asset_id", "ahash", "ahash_hex",
                    "band0", "band1", "band2", "band3", "valid",
                ],
            )

    return assets.mapInPandas(batches, schema=IMAGE_AHASH_SCHEMA)


AUDIO_MAGIC = b"FAUD"

AUDIO_FEATURE_SCHEMA = (
    "asset_id long, sample_rate int, n_samples int, duration_ms long, "
    "peak int, rms double, zero_crossings long, valid boolean"
)


def fake_audio_bytes(sample_rate: int, n_samples: int, base: int = 0) -> bytes:
    """Deterministic fake PCM audio: FAUD + u32 rate + u32 n + i16 samples
    where sample k is ``((base + 13*k) % 4096) - 2048`` — recomputable
    arithmetically by the oracle, byte-parseable by the kernel."""
    samples = b"".join(
        struct.pack(">h", ((base + 13 * k) % 4096) - 2048) for k in range(n_samples)
    )
    return AUDIO_MAGIC + struct.pack(">II", sample_rate, n_samples) + samples


def audio_features(assets: DataFrame) -> DataFrame:
    """Decode fake-PCM audio and extract waveform features in one Arrow
    pass: duration, peak amplitude, RMS energy, zero-crossing count.

    The codec is the documented fake (no audio libs in this container);
    the byte parsing (header unpack + big-endian i16 ``frombuffer``), the
    Arrow batch shape, and the feature arithmetic are real — a real codec
    drops in by replacing the ``frombuffer`` line with a decoder call.

    Integer-exact where possible: energy sums int64, duration is integer
    division; RMS is one sqrt of one division (both correctly rounded
    IEEE, so cross-engine exact before the round)."""
    import math

    def batches(it: Iterator) -> Iterator:
        import numpy as np
        import pandas as pd

        for pdf in it:
            rows = []
            for aid, data in zip(pdf["asset_id"], pdf["data"]):
                b = bytes(data) if data is not None else b""
                # header values are untrusted: a short payload or zero rate
                # degrades to an invalid row, never a task failure
                parsed = _parse_faud(b)
                if parsed is None:
                    rows.append((aid, None, None, None, None, None, None, False))
                    continue
                rate, x = parsed
                n = x.size
                peak = int(np.abs(x).max()) if n else 0
                energy = int((x * x).sum())
                # full-precision double; callers round at the query layer
                # (Python round is banker's, SQL round is not)
                rms = math.sqrt(energy / n) if n else 0.0
                zc = int(((x[:-1] * x[1:]) < 0).sum())
                rows.append((aid, int(rate), int(n), n * 1000 // rate, peak, rms, zc, True))
            yield pd.DataFrame(
                rows,
                columns=[
                    "asset_id",
                    "sample_rate",
                    "n_samples",
                    "duration_ms",
                    "peak",
                    "rms",
                    "zero_crossings",
                    "valid",
                ],
            )

    return assets.select("asset_id", "data").mapInPandas(
        batches, schema=AUDIO_FEATURE_SCHEMA
    )


def audio_frame_energies(assets: DataFrame, *, frame: int = 10) -> DataFrame:
    """Decode fake-PCM audio and emit PER-FRAME energies (``frame``
    samples each, full frames only) in one Arrow pass — the front half
    of voice-activity detection: (asset_id, frame_idx, energy) rows,
    energy = sum of squared i16 samples as int64.

    Same codec seam as :func:`audio_features` (the ``frombuffer`` line is
    the real-decoder drop-in point); the frame aggregation itself is
    exact integer arithmetic, so the VAD thresholding downstream stays
    engine-exact.

    Malformed/truncated payloads yield ZERO frame rows (no per-frame
    place for a valid flag) — run :func:`decode_audio_meta` first when
    corrupt-asset visibility matters.
    """
    if frame < 1:
        raise ValueError(f"audio_frame_energies: frame ({frame}) must be >= 1")

    def batches(it: Iterator) -> Iterator:
        import numpy as np
        import pandas as pd

        for pdf in it:
            aids, fids, energies = [], [], []
            for aid, data in zip(pdf["asset_id"], pdf["data"]):
                b = bytes(data) if data is not None else b""
                parsed = _parse_faud(b)
                if parsed is None:
                    continue
                _, s = parsed
                nf = s.size // frame
                if nf == 0:
                    continue
                e = (s[: nf * frame] ** 2).reshape(nf, frame).sum(axis=1)
                aids.extend([aid] * nf)
                fids.extend(range(nf))
                energies.extend(e.tolist())
            yield pd.DataFrame(
                {"asset_id": aids, "frame_idx": fids, "energy": energies}
            )

    return assets.mapInPandas(
        batches, "asset_id long, frame_idx long, energy long"
    )


# ----------------- real stdlib codecs: BMP and WAV -----------------
#
# PIL/ffmpeg are absent from this container, but two production formats
# need no external codec at all: uncompressed 24-bit BMP (fixed struct
# layout) and PCM WAV (stdlib ``wave``). These decoders are REAL — any
# image viewer / audio player reads the bytes the test helpers emit —
# so the codec seam is closed for the uncompressed formats and the
# NotImplementedError stub now covers only compressed codecs
# (JPEG/PNG/MP3/...).

BMP_PIXEL_SCHEMA = (
    "asset_id long, width int, height int, mean_b double, mean_g double, "
    "mean_r double, valid boolean"
)


def make_bmp_bytes(width: int, height: int, pixels: list[tuple[int, int, int]]) -> bytes:
    """Spec-conformant uncompressed 24-bit BMP (BITMAPINFOHEADER,
    bottom-up rows, 4-byte row padding). ``pixels`` is row-major
    top-to-bottom (r, g, b) triples — what a viewer shows."""
    stride = (width * 3 + 3) // 4 * 4
    body = bytearray()
    for y in range(height - 1, -1, -1):  # bottom-up storage
        row = bytearray()
        for x in range(width):
            r, g, b = pixels[y * width + x]
            row += bytes((b, g, r))  # BGR on disk
        row += b"\x00" * (stride - len(row))
        body += row
    header = struct.pack("<2sIHHI", b"BM", 14 + 40 + len(body), 0, 0, 14 + 40)
    dib = struct.pack("<IiiHHIIiiII", 40, width, height, 1, 24, 0, len(body), 2835, 2835, 0, 0)
    return bytes(header) + dib + bytes(body)


def decode_bmp_pixels(assets: DataFrame) -> DataFrame:
    """REAL image decode, no external codec: parse uncompressed 24-bit
    BMP payloads (the struct layout is the whole spec) and emit exact
    per-channel means in one Arrow pass. Bottom-up and top-down
    (negative height) row orders both handled; palette/compressed/other
    bit depths surface as valid=false rows, never task failures. Channel
    means are int64 sums divided once in IEEE double, so a SQL oracle
    can reproduce them bit-for-bit."""

    def batches(it: Iterator) -> Iterator:
        import numpy as np
        import pandas as pd

        for pdf in it:
            rows = []
            for aid, data in zip(pdf["asset_id"], pdf["data"]):
                b = bytes(data) if data is not None else b""
                out = (aid, None, None, None, None, None, False)
                if len(b) >= 54 and b[:2] == b"BM":
                    offset = struct.unpack_from("<I", b, 10)[0]
                    hdr_sz, w, h = struct.unpack_from("<Iii", b, 14)
                    planes, bpp, comp = struct.unpack_from("<HHI", b, 26)
                    flip = h > 0  # positive height = bottom-up storage
                    h = abs(h)
                    stride = (w * 3 + 3) // 4 * 4
                    if (
                        hdr_sz >= 40 and planes == 1 and bpp == 24
                        and comp == 0 and w > 0 and h > 0
                        and len(b) >= offset + stride * h
                    ):
                        px = np.frombuffer(
                            b, dtype=np.uint8, offset=offset, count=stride * h
                        ).reshape(h, stride)[:, : w * 3].reshape(h, w, 3)
                        if flip:
                            px = px[::-1]
                        sums = px.reshape(-1, 3).sum(axis=0, dtype=np.int64)
                        n = float(w * h)
                        out = (
                            aid, int(w), int(h),
                            int(sums[0]) / n, int(sums[1]) / n, int(sums[2]) / n,
                            True,
                        )
                rows.append(out)
            yield pd.DataFrame(
                rows,
                columns=[
                    "asset_id", "width", "height",
                    "mean_b", "mean_g", "mean_r", "valid",
                ],
            )

    return assets.select("asset_id", "data").mapInPandas(
        batches, schema=BMP_PIXEL_SCHEMA
    )


WAV_FEATURE_SCHEMA = (
    "asset_id long, sample_rate int, n_channels int, sample_width int, "
    "n_frames long, duration_ms long, peak int, rms double, valid boolean"
)


def make_wav_bytes(sample_rate: int, samples: list[int], n_channels: int = 1) -> bytes:
    """Spec-conformant PCM16 WAV via the stdlib ``wave`` writer —
    playable bytes, not a fake container."""
    import io
    import wave

    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(n_channels)
        w.setsampwidth(2)
        w.setframerate(sample_rate)
        w.writeframes(b"".join(struct.pack("<h", s) for s in samples))
    return buf.getvalue()


def decode_wav_audio(assets: DataFrame) -> DataFrame:
    """REAL audio decode, no external codec: stdlib ``wave`` parses the
    RIFF container and the PCM16 payload vectorizes through numpy in one
    Arrow pass — rate/channels/width/frames plus exact peak and RMS
    (int64 energy sum, one IEEE division + sqrt). Non-RIFF, truncated,
    or non-16-bit payloads surface as valid=false rows."""
    import math

    def batches(it: Iterator) -> Iterator:
        import io
        import wave

        import numpy as np
        import pandas as pd

        for pdf in it:
            rows = []
            for aid, data in zip(pdf["asset_id"], pdf["data"]):
                b = bytes(data) if data is not None else b""
                try:
                    with wave.open(io.BytesIO(b)) as w:
                        rate, nch, width, nframes = (
                            w.getframerate(), w.getnchannels(),
                            w.getsampwidth(), w.getnframes(),
                        )
                        pcm = w.readframes(nframes)
                    if width != 2 or rate <= 0:
                        raise ValueError("unsupported wav shape")
                    x = np.frombuffer(pcm, dtype="<i2").astype(np.int64)
                    n = x.size
                    peak = int(np.abs(x).max()) if n else 0
                    rms = math.sqrt(int((x * x).sum()) / n) if n else 0.0
                    rows.append((
                        aid, int(rate), int(nch), int(width), int(nframes),
                        nframes * 1000 // rate, peak, rms, True,
                    ))
                except Exception:  # noqa: BLE001 - malformed rows, not failures
                    rows.append((aid, None, None, None, None, None, None, None, False))
            yield pd.DataFrame(
                rows,
                columns=[
                    "asset_id", "sample_rate", "n_channels", "sample_width",
                    "n_frames", "duration_ms", "peak", "rms", "valid",
                ],
            )

    return assets.select("asset_id", "data").mapInPandas(
        batches, schema=WAV_FEATURE_SCHEMA
    )
