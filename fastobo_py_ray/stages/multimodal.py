"""Multimodal columns: image/audio/video as opaque ``binary`` payloads
with typed metadata, processed by actor-pool ``map_batches`` stages.

Image decode is REAL for binary netpbm (``decoder="ppm"`` ->
:func:`decode_netpbm`: P5/P6 incl. comments and 16-bit samples, pure
numpy, roundtrip-tested), REAL for uncompressed BMP
(``decoder="bmp"`` -> :func:`decode_bmp`: 8/24-bit BI_RGB incl.
top-down rows and row padding, pure numpy, roundtrip-tested), and
REAL for JPEG/PNG/WebP behind optional PIL/pillow
(``decoder="real"`` -> :func:`decode_pil`; when PIL is absent — as in
this container — it raises ``NotImplementedError`` naming the
dependency, pytest ``skipif``-gated otherwise).  Audio decode is REAL
for RIFF/WAVE PCM (``decoder="wav"`` -> :func:`decode_wav`: int
8/16/32 + float32, chunk walk, roundtrip-tested); compressed
audio/video (mp3/ogg/mp4) stays ffmpeg-stubbed the same way.
``decoder="fake"`` is a deterministic pure-Python decode
(payload bytes -> pseudo-pixel array) for arbitrary payloads so the
Ray-side plumbing — schema, broadcast config, actor signature, batch
sizing, output layout — is exercised end-to-end on any input.
Byte-histogram features and frame sampling are NOT stubs: they are
honest, vectorized computations on the binary payload (usable for
content-based near-dup on any media).

Scale notes: media payloads are fat — callers should pass a small
``batch_size`` (64-512) so batch x concurrency fits worker heaps, and
these stages select only (id, payload) columns; payload columns are
dropped from the output (features/metadata only) so downstream stages
never re-ship the bytes.
"""

from __future__ import annotations

from typing import Optional

import numpy as np
import pyarrow as pa

MEDIA_SCHEMA = pa.schema([
    ("media_id", pa.string()),
    ("kind", pa.string()),            # image | audio | video
    ("mime", pa.string()),
    ("payload", pa.binary()),
])

IMAGE_FEATURES_SCHEMA = pa.schema([
    ("media_id", pa.string()),
    ("width", pa.int32()), ("height", pa.int32()),
    ("n_bytes", pa.int64()),
    ("byte_entropy", pa.float32()),
    ("feature", pa.list_(pa.float32(), 64)),   # 64-bin byte histogram
    ("thumb_mean", pa.float32()),  # mean of the thumb x thumb resize
    ("decode_ok", pa.bool_()),
])


def byte_histogram(payload: bytes, bins: int = 64) -> np.ndarray:
    """L1-normalized histogram of payload bytes (vectorized); a real
    content feature: identical payloads -> identical vectors, near-dup
    payloads -> near vectors under cosine."""
    arr = np.frombuffer(payload, dtype=np.uint8)
    if arr.size == 0:
        return np.zeros(bins, dtype=np.float32)
    h = np.bincount(arr >> int(np.log2(256 // bins)), minlength=bins)
    return (h / h.sum()).astype(np.float32)


def byte_entropy(payload: bytes) -> float:
    arr = np.frombuffer(payload, dtype=np.uint8)
    if arr.size == 0:
        return 0.0
    p = np.bincount(arr, minlength=256) / arr.size
    nz = p[p > 0]
    return float(-(nz * np.log2(nz)).sum())


def fake_decode_image(payload: bytes) -> np.ndarray:
    """Deterministic stand-in for a PIL decode: payload bytes tiled into a
    (h, w, 3) uint8 array whose shape derives from the payload length."""
    arr = np.frombuffer(payload, dtype=np.uint8)
    side = max(4, int(np.sqrt(max(arr.size // 3, 16))))
    need = side * side * 3
    tiled = np.resize(arr, need)
    return tiled.reshape(side, side, 3)


def decode_bmp(payload: bytes) -> np.ndarray:
    """REAL image decode — uncompressed BMP (BITMAPINFOHEADER, BI_RGB,
    8-bit grayscale-palette or 24-bit BGR), pure numpy.  Returns uint8
    (h, w) or (h, w, 3) RGB arrays; handles bottom-up (positive
    height) and top-down (negative height) rows and the 4-byte row
    padding.  Raises ValueError on malformed input (collect-don't-raise
    decoder contract)."""
    import struct

    if len(payload) < 54 or payload[:2] != b"BM":
        raise ValueError("not a BMP payload")
    data_off = struct.unpack("<I", payload[10:14])[0]
    hdr_size, w, h = struct.unpack("<Iii", payload[14:26])
    planes, bits = struct.unpack("<HH", payload[26:30])
    compression = struct.unpack("<I", payload[30:34])[0]
    if hdr_size < 40 or compression != 0 or bits not in (8, 24):
        raise ValueError(
            f"unsupported BMP (header {hdr_size}, compression "
            f"{compression}, {bits}-bit): only uncompressed 8/24-bit")
    top_down = h < 0
    h = abs(h)
    if w <= 0 or h == 0:
        raise ValueError(f"bad BMP dimensions {w}x{h}")
    row_bytes = (w * bits // 8 + 3) & ~3
    need = row_bytes * h
    if len(payload) - data_off < need:
        raise ValueError(f"BMP raster truncated: "
                         f"{len(payload) - data_off} < {need}")
    raster = np.frombuffer(payload, dtype=np.uint8, count=need,
                           offset=data_off).reshape(h, row_bytes)
    if not top_down:
        raster = raster[::-1]
    if bits == 8:
        return np.ascontiguousarray(raster[:, :w])
    px = raster[:, :w * 3].reshape(h, w, 3)
    return np.ascontiguousarray(px[:, :, ::-1])   # BGR -> RGB


def encode_bmp(img: np.ndarray) -> bytes:
    """24-bit / 8-bit BMP encoder — test-fixture sibling of
    :func:`decode_bmp` (roundtrip-tested).  8-bit input gets the
    standard identity grayscale palette."""
    import struct

    if img.ndim == 3 and img.shape[2] == 3:
        bits, h, w = 24, img.shape[0], img.shape[1]
        rows = img[:, :, ::-1].astype("u1").reshape(h, w * 3)
        palette = b""
    elif img.ndim == 2:
        bits, h, w = 8, img.shape[0], img.shape[1]
        rows = img.astype("u1")
        palette = b"".join(struct.pack("<BBBB", i, i, i, 0)
                           for i in range(256))
    else:
        raise ValueError(f"expected (h,w) or (h,w,3), got {img.shape}")
    row_bytes = (w * bits // 8 + 3) & ~3
    pad = np.zeros((h, row_bytes - w * bits // 8), dtype=np.uint8)
    raster = np.hstack([rows, pad])[::-1].tobytes()
    data_off = 14 + 40 + len(palette)
    hdr = (b"BM" + struct.pack("<IHHI", data_off + len(raster), 0, 0,
                               data_off)
           + struct.pack("<IiiHHIIiiII", 40, w, h, 1, bits, 0,
                         len(raster), 2835, 2835,
                         256 if bits == 8 else 0, 0))
    return hdr + palette + raster


def decode_wav(payload: bytes):
    """REAL audio decode — RIFF/WAVE PCM (format 1: 8/16/32-bit int;
    format 3: float32), pure stdlib-struct + numpy chunk walk.
    Returns ``(samples, sample_rate)`` with ``samples`` shaped
    ``(n_frames, channels)``.  Raises ValueError on malformed input."""
    import struct

    if len(payload) < 12 or payload[:4] != b"RIFF" \
            or payload[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE payload")
    i, n = 12, len(payload)
    fmt = data = None
    while i + 8 <= n:
        cid = payload[i:i + 4]
        csz = struct.unpack("<I", payload[i + 4:i + 8])[0]
        body = payload[i + 8:i + 8 + csz]
        if cid == b"fmt ":
            if csz < 16:
                raise ValueError("wav: short fmt chunk")
            fmt = struct.unpack("<HHIIHH", body[:16])
        elif cid == b"data":
            data = body
        i += 8 + csz + (csz & 1)          # chunks are word-aligned
    if fmt is None or data is None:
        raise ValueError("wav: missing fmt/data chunk")
    audio_format, channels, rate, _byte_rate, block_align, bits = fmt
    dtype = {(1, 8): "u1", (1, 16): "<i2", (1, 32): "<i4",
             (3, 32): "<f4"}.get((audio_format, bits))
    if dtype is None or channels < 1:
        raise ValueError(
            f"unsupported wav (format {audio_format}, {bits}-bit, "
            f"{channels}ch): PCM 8/16/32-bit int or 32-bit float only")
    if block_align != channels * bits // 8:
        raise ValueError(f"wav: block_align {block_align} != "
                         f"{channels * bits // 8}")
    usable = len(data) // block_align * block_align
    samples = np.frombuffer(data, dtype=dtype,
                            count=usable // (bits // 8))
    return samples.reshape(-1, channels), rate


def encode_wav(samples: np.ndarray, sample_rate: int) -> bytes:
    """PCM WAV encoder — test-fixture sibling of :func:`decode_wav`
    (roundtrip-tested).  ``samples`` is (n, channels) of u1/i2/i4/f4."""
    import struct

    if samples.ndim == 1:
        samples = samples[:, None]
    kind = {"u": (1, 8), "i": (1, samples.dtype.itemsize * 8),
            "f": (3, 32)}[samples.dtype.kind]
    audio_format, bits = kind
    channels = samples.shape[1]
    body = samples.astype(samples.dtype.newbyteorder("<")).tobytes()
    block_align = channels * bits // 8
    fmt = struct.pack("<HHIIHH", audio_format, channels, sample_rate,
                      sample_rate * block_align, block_align, bits)
    return (b"RIFF" + struct.pack("<I", 4 + 8 + len(fmt) + 8 + len(body))
            + b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt
            + b"data" + struct.pack("<I", len(body)) + body)


def demux_avi(payload: bytes):
    """REAL video container demux — RIFF/AVI chunk walk, pure
    stdlib-struct: recurses LIST chunks, reads the frame interval from
    the ``avih`` main header, and indexes every video frame chunk
    (``##db``/``##dc``) inside ``movi`` WITHOUT copying frame bytes.
    Returns ``(frames, fps)`` where ``frames`` is a list of
    ``(offset, size)`` byte ranges into the payload (the frame DATA —
    still codec-compressed; decoding the codec stream needs ffmpeg,
    which stays env-gated).  Raises ValueError on malformed input."""
    import struct

    if len(payload) < 12 or payload[:4] != b"RIFF" \
            or payload[8:12] != b"AVI ":
        raise ValueError("not a RIFF/AVI payload")
    usec_per_frame = None
    frames = []

    def walk(start: int, end: int) -> None:
        nonlocal usec_per_frame
        i = start
        while i + 8 <= end:
            cid = payload[i:i + 4]
            csz = struct.unpack("<I", payload[i + 4:i + 8])[0]
            body = i + 8
            if body + csz > end:
                raise ValueError(f"avi: chunk {cid!r} overruns its "
                                 f"parent ({body + csz} > {end})")
            if cid == b"LIST":
                walk(body + 4, body + csz)
            elif cid == b"avih" and csz >= 4:
                usec_per_frame = struct.unpack(
                    "<I", payload[body:body + 4])[0]
            elif cid[2:4] in (b"db", b"dc"):
                frames.append((body, csz))
            i = body + csz + (csz & 1)    # chunks are word-aligned

    walk(12, len(payload))
    if not usec_per_frame:
        raise ValueError("avi: missing/zero avih frame interval")
    return frames, 1_000_000.0 / usec_per_frame


def encode_avi(frames, fps: int = 30) -> bytes:
    """Minimal-but-well-formed AVI encoder (hdrl with avih + one
    ``vids`` strl, movi with ``00dc`` frame chunks, word-aligned) —
    test-fixture sibling of :func:`demux_avi` (roundtrip-tested)."""
    import struct

    def chunk(cid: bytes, body: bytes) -> bytes:
        return cid + struct.pack("<I", len(body)) + body \
            + (b"\x00" if len(body) & 1 else b"")

    def lst(ltype: bytes, body: bytes) -> bytes:
        return chunk(b"LIST", ltype + body)

    avih = struct.pack("<14I", 1_000_000 // fps, 0, 0, 0, len(frames),
                       0, 1, 0, 0, 0, 0, 0, 0, 0)
    strh = b"vids" + b"\x00" * 52
    strf = struct.pack("<IiiHHIIiiII", 40, 0, 0, 1, 24, 0, 0, 0, 0,
                       0, 0)
    hdrl = lst(b"hdrl", chunk(b"avih", avih)
               + lst(b"strl", chunk(b"strh", strh)
                     + chunk(b"strf", strf)))
    movi = lst(b"movi", b"".join(chunk(b"00dc", f) for f in frames))
    body = b"AVI " + hdrl + movi
    return b"RIFF" + struct.pack("<I", len(body)) + body


def pil_available() -> bool:
    """True when PIL/pillow is importable (this container ships
    without it; real deployments usually have it)."""
    import importlib.util
    return importlib.util.find_spec("PIL") is not None


def pyav_available() -> bool:
    """True when PyAV (``av``, the ffmpeg binding) is importable (this
    container ships without it; real deployments usually have it)."""
    import importlib.util
    return importlib.util.find_spec("av") is not None


def decode_video_av(payload: bytes, picks):
    """REAL video codec-pixel decode via PyAV/ffmpeg (optional
    dependency) — ``(n_src_frames, {src_idx: rgb24 ndarray}, fps)``
    for the requested source-frame indices.

    ONE sequential decode pass that stops at the last requested index
    when the container declares its frame count (the common case), so
    per-row work is bounded by the sample stride, not the video length.
    Raises ``NotImplementedError`` when PyAV is absent (named
    dependency, the engine's env-gate convention — same contract as
    :func:`decode_pil`) and ``ValueError`` on undecodable payloads
    (collect-don't-raise at the stage level)."""
    try:
        import av
    except ImportError as exc:  # pragma: no cover - PyAV absent here
        raise NotImplementedError(
            "real video-codec decode requires ffmpeg/PyAV ('av' is not "
            "installed); decoder='avi' demuxes real RIFF/AVI containers "
            "dependency-free, decoder='fake' samples fixed-size byte "
            "frames") from exc
    # pragma-free body: exercised by the skipif-gated pytest wherever
    # PyAV exists
    import io
    want = set(picks)
    last = max(want, default=-1)
    out = {}
    averror = getattr(av, "AVError", OSError)
    try:
        with av.open(io.BytesIO(payload)) as container:
            stream = container.streams.video[0]
            fps = float(stream.average_rate) if stream.average_rate \
                else 30.0
            n_src = int(stream.frames or 0)
            i = -1
            for frame in container.decode(stream):
                i += 1
                if i in want:
                    out[i] = frame.to_ndarray(format="rgb24")
                if n_src and i >= last:
                    break
            if not n_src:     # count the pass when the header doesn't
                n_src = i + 1
    except (averror, IndexError, OSError, EOFError) as exc:
        raise ValueError(f"undecodable video payload: {exc}") from exc
    return n_src, out, fps


def decode_pil(payload: bytes) -> np.ndarray:
    """REAL JPEG/PNG/WebP/... decode via PIL/pillow (optional
    dependency).  Returns uint8 arrays of shape (h, w) for grayscale
    or (h, w, 3) for everything else (palette/RGBA/CMYK are converted
    to RGB so downstream feature code sees the same two layouts as
    :func:`decode_netpbm`).  Raises ``NotImplementedError`` when PIL
    is absent (named dependency, per the engine's env-gate convention)
    and ``ValueError`` on undecodable payloads — the same
    collect-don't-raise decoder contract as every other decoder here.
    """
    try:
        from PIL import Image, UnidentifiedImageError
    except ImportError as exc:  # pragma: no cover - PIL absent here
        raise NotImplementedError(
            "real JPEG/PNG decode requires PIL/pillow, which is not "
            "installed; pass decoder='ppm' for real netpbm decode or "
            "decoder='fake' for the deterministic test decode") from exc
    import io
    try:
        with Image.open(io.BytesIO(payload)) as im:
            if im.mode not in ("L", "RGB"):
                im = im.convert("RGB")
            return np.asarray(im)
    except (UnidentifiedImageError, OSError, SyntaxError) as exc:
        raise ValueError(f"undecodable image payload: {exc}") from exc


def encode_pil(img: np.ndarray, format: str = "PNG") -> bytes:
    """PIL-based encoder — test-fixture sibling of :func:`decode_pil`
    (PNG roundtrips exactly; JPEG is lossy, dims-only)."""
    from PIL import Image
    import io
    buf = io.BytesIO()
    Image.fromarray(img).save(buf, format=format)
    return buf.getvalue()


def decode_netpbm(payload: bytes) -> np.ndarray:
    """REAL image decode — binary netpbm (P5 grayscale / P6 RGB), pure
    numpy, no image library: header tokens (with ``#`` comment support)
    then one ``frombuffer`` over the raster.  Returns uint8 (maxval <=
    255) or uint16 (big-endian two-byte samples per the spec) arrays of
    shape (h, w) / (h, w, 3).  Raises ValueError on malformed input —
    callers in collect-don't-raise pipelines wrap it like any decoder.
    """
    if len(payload) < 2 or payload[0:1] != b"P" or \
            payload[1:2] not in b"56":
        raise ValueError("not a binary netpbm (P5/P6) payload")
    color = payload[1:2] == b"6"
    # header: magic, width, height, maxval as whitespace-separated
    # tokens; '#' starts a comment running to end-of-line
    tokens, i, n = [], 2, len(payload)
    while len(tokens) < 3:
        while i < n and payload[i] in b" \t\r\n":
            i += 1
        if i < n and payload[i] in b"#":
            while i < n and payload[i] not in b"\n":
                i += 1
            continue
        j = i
        while j < n and payload[j] not in b" \t\r\n#":
            j += 1
        if j == i:
            raise ValueError("truncated netpbm header")
        tokens.append(payload[i:j])
        i = j
    if i >= n:
        raise ValueError("truncated netpbm header")
    # exactly ONE whitespace byte separates header and raster; a '#'
    # here (the token scanner also breaks on it) or any other byte is
    # a malformed file, never silently-shifted pixel data
    if payload[i] not in b" \t\r\n":
        raise ValueError(
            "netpbm: maxval must be followed by a single whitespace "
            f"byte, got {payload[i:i + 1]!r}")
    sep = payload[i]
    i += 1
    w, h, maxval = (int(t) for t in tokens)
    if w <= 0 or h <= 0 or not 0 < maxval < 65536:
        raise ValueError(f"bad netpbm dimensions {w}x{h} maxval={maxval}")
    ch = 3 if color else 1
    dt = np.dtype(">u2") if maxval > 255 else np.dtype("u1")
    need = w * h * ch * dt.itemsize
    # CRLF-writing producers: treat \r\n as one separator when the \n
    # is provably not raster (exactly one surplus byte remains)
    if sep == 0x0D and i < n and payload[i] == 0x0A and n - i - 1 >= need:
        i += 1
    if n - i < need:
        raise ValueError(f"netpbm raster truncated: {n - i} < {need}")
    img = np.frombuffer(payload, dtype=dt, count=w * h * ch, offset=i)
    img = img.reshape(h, w, 3) if color else img.reshape(h, w)
    return img.astype(np.uint16) if maxval > 255 else img


def encode_netpbm(img: np.ndarray) -> bytes:
    """P5/P6 encoder — the test-fixture sibling of
    :func:`decode_netpbm` (roundtrip-tested)."""
    if img.ndim == 3 and img.shape[2] == 3:
        magic = b"P6"
    elif img.ndim == 2:
        magic = b"P5"
    else:
        raise ValueError(f"expected (h,w) or (h,w,3), got {img.shape}")
    if img.dtype == np.uint16:
        maxval, body = 65535, img.astype(">u2").tobytes()
    else:
        maxval, body = 255, img.astype("u1").tobytes()
    hdr = b"%s\n%d %d\n%d\n" % (magic, img.shape[1], img.shape[0],
                                maxval)
    return hdr + body


def resize_nearest(img: np.ndarray, out_h: int, out_w: int) -> np.ndarray:
    """Nearest-neighbour resize, pure numpy (no PIL needed) — real code,
    fake only insofar as the input came from :func:`fake_decode_image`."""
    h, w = img.shape[:2]
    ys = (np.arange(out_h) * h // out_h)
    xs = (np.arange(out_w) * w // out_w)
    return img[ys][:, xs]


class ImageFeatures:
    """Actor-pool stage: media batch -> per-image features.

    Usage::

        ds.map_batches(ImageFeatures, batch_format="pyarrow",
                       fn_constructor_kwargs={"decoder": "fake",
                                              "thumb": 8},
                       concurrency=(2, 8), batch_size=128)

    ``__init__`` (once per actor) resolves the decoder — including the
    PIL import probe, so a missing dependency fails ONCE per actor at
    pool startup, never per batch; ``__call__`` is per batch.
    Decoders: ``"ppm"`` — REAL binary-netpbm decode
    (:func:`decode_netpbm`, pure numpy); ``"bmp"`` — REAL uncompressed
    BMP decode (:func:`decode_bmp`, pure numpy); ``"real"`` — REAL
    JPEG/PNG/... via optional PIL/pillow (:func:`decode_pil`; raises
    ``NotImplementedError`` naming the dependency when PIL is absent,
    as in this container); ``"fake"`` — deterministic byte-tiling
    stand-in for arbitrary payloads.
    """

    def __init__(self, decoder: str = "fake", thumb: Optional[int] = 8):
        if decoder == "real":
            if not pil_available():
                raise NotImplementedError(
                    "real JPEG/PNG decode requires PIL/pillow, which is "
                    "not installed; pass decoder='ppm' for real netpbm "
                    "decode or decoder='fake' for the deterministic test "
                    "decode")
            self.decode = decode_pil
        elif decoder == "ppm":
            self.decode = decode_netpbm
        elif decoder == "bmp":
            self.decode = decode_bmp
        elif decoder == "fake":
            self.decode = fake_decode_image
        else:
            raise ValueError(f"unknown decoder {decoder!r}")
        self.thumb = thumb

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch["media_id"].to_pylist()
        payloads = batch["payload"].to_pylist()
        rows = {k: [] for k in IMAGE_FEATURES_SCHEMA.names}
        for mid, payload in zip(ids, payloads):
            payload = payload or b""
            # collect-don't-raise (engine-wide decoder contract): one
            # corrupt payload must never kill the actor-pool stage —
            # byte-level features still compute, dims go to -1
            try:
                img = self.decode(payload)
                h, w = int(img.shape[0]), int(img.shape[1])
                tmean = float(resize_nearest(
                    img, self.thumb, self.thumb).mean()) \
                    if self.thumb else float(img.mean())
                ok = True
            except ValueError:
                h = w = -1
                tmean = -1.0
                ok = False
            rows["media_id"].append(mid)
            # header dims, BEFORE any thumbnail resize — the decode's
            # ground truth, not the requested thumb size
            rows["height"].append(h)
            rows["width"].append(w)
            rows["n_bytes"].append(len(payload))
            rows["byte_entropy"].append(byte_entropy(payload))
            rows["feature"].append(byte_histogram(payload))
            rows["thumb_mean"].append(tmean)
            rows["decode_ok"].append(ok)
        return pa.table(rows, schema=IMAGE_FEATURES_SCHEMA)


AUDIO_FRAMES_SCHEMA = pa.schema([
    ("media_id", pa.string()),
    ("frame_idx", pa.int32()),
    ("frame", pa.binary()),
    ("n_frames", pa.int32()),
])


class AudioFrameSampler:
    """Actor-pool stage: media batch -> sampled byte frames (flat_map
    layout: one output row per sampled frame).

    Decoders: ``"fake"`` — deterministic equal-stride byte windows over
    the raw payload; ``"wav"`` — REAL RIFF/WAVE PCM decode
    (:func:`decode_wav`, dependency-free): windows are equal-stride
    slices over the DECODED sample axis, aligned to whole sample
    frames, serialized back as little-endian PCM bytes (an undecodable
    payload yields zero frames — collect-don't-raise); ``"real"`` —
    compressed formats (mp3/ogg/flac) need ffmpeg/soundfile, stubbed
    with the dependency named.
    """

    def __init__(self, n_frames: int = 4, frame_bytes: int = 256,
                 decoder: str = "fake"):
        if decoder == "real":
            raise NotImplementedError(
                "real compressed-audio decode requires ffmpeg/soundfile "
                "(not in this container); decoder='wav' decodes real "
                "RIFF/WAVE PCM dependency-free, decoder='fake' samples "
                "raw bytes")
        if decoder not in ("fake", "wav"):
            raise ValueError(f"unknown decoder {decoder!r}")
        self.n_frames = n_frames
        self.frame_bytes = frame_bytes
        self.decoder = decoder

    def _byte_windows(self, payload: bytes):
        n = len(payload)
        if n == 0:
            return []
        stride = max(1, (n - self.frame_bytes) // max(1, self.n_frames - 1))
        out = []
        for i in range(self.n_frames):
            start = min(i * stride, max(0, n - self.frame_bytes))
            out.append(payload[start:start + self.frame_bytes])
        return out

    def _frames(self, payload: bytes):
        if self.decoder == "fake":
            return self._byte_windows(payload)
        try:
            samples, _rate = decode_wav(payload)
        except ValueError:
            return []                      # collect-don't-raise
        if len(samples) == 0:
            return []
        frame_bytes_per_sample = samples.dtype.itemsize * samples.shape[1]
        win = max(1, self.frame_bytes // frame_bytes_per_sample)
        stride = max(1, (len(samples) - win) // max(1, self.n_frames - 1))
        out = []
        for i in range(self.n_frames):
            start = min(i * stride, max(0, len(samples) - win))
            out.append(samples[start:start + win]
                       .astype(samples.dtype.newbyteorder("<"))
                       .tobytes())
        return out

    def __call__(self, batch: pa.Table) -> pa.Table:
        rows = {k: [] for k in AUDIO_FRAMES_SCHEMA.names}
        for mid, payload in zip(batch["media_id"].to_pylist(),
                                batch["payload"].to_pylist()):
            frames = self._frames(payload or b"")
            for i, fr in enumerate(frames):
                rows["media_id"].append(mid)
                rows["frame_idx"].append(i)
                rows["frame"].append(fr)
                rows["n_frames"].append(len(frames))
        return pa.table(rows, schema=AUDIO_FRAMES_SCHEMA)


def synth_media_table(n_rows: int, seed: int = 7,
                      kind: str = "image") -> pa.Table:
    """Deterministic opaque-binary media fixture (no external data)."""
    rng = np.random.RandomState(seed)
    rows = {"media_id": [], "kind": [], "mime": [], "payload": []}
    for i in range(n_rows):
        size = 200 + int(rng.randint(0, 1800))
        payload = rng.randint(0, 256, size=size, dtype=np.uint8).tobytes()
        rows["media_id"].append(f"m{i:06d}")
        rows["kind"].append(kind)
        rows["mime"].append(f"{kind}/fake")
        rows["payload"].append(payload)
    return pa.table(rows, schema=MEDIA_SCHEMA)


VIDEO_FRAMES_SCHEMA = pa.schema([
    ("media_id", pa.string()),
    ("frame_idx", pa.int32()),        # index into the SAMPLED frames
    ("src_frame", pa.int32()),        # index into the source stream
    ("ts_ms", pa.int32()),            # presentation time of src_frame
    ("frame", pa.binary()),
    ("n_src_frames", pa.int32()),
])


class VideoFrameSampler:
    """Actor-pool stage: video batch -> temporally strided frame sample
    (flat_map layout: one output row per sampled frame, with source
    frame index and presentation timestamp).

    Decoders: ``"fake"`` treats the payload as a concatenated stream
    of fixed-size frames at a constant fps — deterministic and
    dependency-free; ``"avi"`` is a REAL RIFF/AVI container demux
    (:func:`demux_avi`): frame boundaries and timestamps come from the
    chunk index and the ``avih`` frame interval, frame PAYLOADS stay
    codec-compressed (an undecodable container yields zero frames —
    collect-don't-raise); ``"real"`` — REAL codec-stream pixel decode
    (H.264/VP9/MJPEG) via PyAV/ffmpeg when importable
    (:func:`decode_video_av`; sampled frames are emitted as
    self-describing BMP bytes so any downstream consumer can
    :func:`decode_bmp` them dependency-free), and an env-gate
    ``NotImplementedError`` naming the dependency otherwise — the
    same probe-in-``__init__`` pattern as :class:`ImageFeatures` PIL.
    Batch-size guidance: video payloads are
    the largest binary columns in a corpus — size ``batch_size`` so
    batch_bytes x concurrency fits the worker heap (tens of rows, not
    thousands).
    """

    def __init__(self, every_nth: int = 10, max_frames: int = 8,
                 frame_bytes: int = 1024, fps: int = 30,
                 decoder: str = "fake"):
        if decoder == "real" and not pyav_available():
            raise NotImplementedError(
                "real video-codec decode requires ffmpeg/PyAV ('av' is "
                "not installed in this container); decoder='avi' "
                "demuxes real RIFF/AVI containers dependency-free, "
                "decoder='fake' samples fixed-size byte frames")
        if decoder not in ("fake", "avi", "real"):
            raise ValueError(f"unknown decoder {decoder!r}")
        self.every_nth = max(1, every_nth)
        self.max_frames = max_frames
        self.frame_bytes = frame_bytes
        self.fps = fps
        self.decoder = decoder

    def _index(self, payload: bytes):
        """(n_src, frame_at(idx) -> bytes, fps) per decoder.  Work per
        row stays O(max_frames) + one header walk — a corpus-scale
        video payload is never copied wholesale."""
        if self.decoder == "real":  # pragma: no cover - PyAV absent here
            cand = [k * self.every_nth for k in range(self.max_frames)]
            try:
                n_src, decoded, fps = decode_video_av(payload, cand)
            except ValueError:
                return 0, None, self.fps
            # a truncated stream can declare more frames than decode
            # (header n_src=12, stream ends at 7): cap the sampled
            # range at what actually decoded so frame_at never hits a
            # missing index — degrade, don't raise (the collect-don't-
            # raise contract the fake/avi decoders already follow)
            if decoded:
                n_src = min(n_src, max(decoded) + 1)
            else:
                n_src = 0
            return n_src, (lambda i: encode_bmp(decoded[i])), fps
        if self.decoder == "avi":
            try:
                frames, fps = demux_avi(payload)
            except ValueError:
                return 0, None, self.fps
            return len(frames), \
                (lambda i: payload[frames[i][0]:
                                   frames[i][0] + frames[i][1]]), fps
        fb = self.frame_bytes
        n_src = -(-len(payload) // fb)    # ceil
        return n_src, (lambda i: payload[i * fb:(i + 1) * fb]), self.fps

    def __call__(self, batch: pa.Table) -> pa.Table:
        rows = {k: [] for k in VIDEO_FRAMES_SCHEMA.names}
        for mid, payload in zip(batch["media_id"].to_pylist(),
                                batch["payload"].to_pylist()):
            n_src, frame_at, fps = self._index(payload or b"")
            picks = range(0, n_src, self.every_nth)[:self.max_frames]
            for out_i, src_i in enumerate(picks):
                rows["media_id"].append(mid)
                rows["frame_idx"].append(out_i)
                rows["src_frame"].append(src_i)
                rows["ts_ms"].append(int(src_i * 1000 / fps))
                rows["frame"].append(frame_at(src_i))
                rows["n_src_frames"].append(n_src)
        return pa.table(rows, schema=VIDEO_FRAMES_SCHEMA)
