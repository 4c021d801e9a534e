"""Pure-Python (Geo)TIFF codec — the engine's bridge to the reference's
native user surface (``.tif`` in, ``.tif`` out; reference
rio_color/scripts/cli.py:81-121 reads/writes GeoTIFF via rasterio).

This container has no rasterio/GDAL/Pillow, so the bridge carries its own
minimal classic-TIFF implementation covering exactly the profile space the
reference's own test rasters use (tests/rgb8.tif, rgb16.tif, rgba8.tif:
little-endian classic TIFF, 32×32 tiles, LZW, chunky planar, uint8/uint16,
GeoTIFF tags) plus the common neighbors:

- compression: none (1), LZW (5, with TIFF early-change), Deflate (8/32946)
- layout: tiled or stripped, chunky (PlanarConfiguration=1)
- samples: uint8 / uint16, 1-4 bands, alpha via ExtraSamples
- predictor: 1 (none) and 2 (horizontal differencing)
- GeoTIFF/GDAL tags preserved byte-for-byte as opaque (type, payload)
  pairs: ModelPixelScale, ModelTiepoint, ModelTransformation, GeoKeys,
  GeoDoubleParams, GeoAsciiParams, GDAL metadata + nodata — the analogue
  of rasterio profile passthrough (reference cli.py:102 ``src.profile``).

JPEG-in-TIFF is a deliberate fail-fast seam (NotImplementedError), same
contract as the stubbed lossy codecs in sources/codec.py.

Scale note: the per-chunk byte ranges exposed by :func:`read_ifd` are what
the Spark bridge parallelizes — tasks read and decode disjoint tile ranges
(sources/tiff_bridge.py), so a large GeoTIFF ingests as a distributed scan
without the driver touching pixel data.
"""

from __future__ import annotations

import struct
import zlib
from dataclasses import dataclass, field

import numpy as np

# -- tag ids -----------------------------------------------------------------
TAG_WIDTH = 256
TAG_HEIGHT = 257
TAG_BITS = 258
TAG_COMPRESSION = 259
TAG_PHOTOMETRIC = 262
TAG_STRIP_OFFSETS = 273
TAG_SPP = 277
TAG_ROWS_PER_STRIP = 278
TAG_STRIP_COUNTS = 279
TAG_PLANAR = 284
TAG_PREDICTOR = 317
TAG_TILE_W = 322
TAG_TILE_H = 323
TAG_TILE_OFFSETS = 324
TAG_TILE_COUNTS = 325
TAG_EXTRASAMPLES = 338
TAG_SAMPLE_FORMAT = 339

#: opaque side-channel tags preserved verbatim (GeoTIFF + GDAL)
GEO_TAGS = (33550, 33922, 34264, 34735, 34736, 34737, 42112, 42113)

COMPRESSION_NONE = 1
COMPRESSION_LZW = 5
COMPRESSION_JPEG = 7
COMPRESSION_DEFLATE = 8
COMPRESSION_DEFLATE_OLD = 32946

#: --co compress=NAME → tag value (jpeg intentionally absent: stub seam)
COMPRESS_NAMES = {
    "none": COMPRESSION_NONE,
    "lzw": COMPRESSION_LZW,
    "deflate": COMPRESSION_DEFLATE,
}

_TYPE_SIZES = {1: 1, 2: 1, 3: 2, 4: 4, 5: 8, 6: 1, 7: 1, 8: 2, 9: 4, 10: 8, 11: 4, 12: 8}


# -- LZW (TIFF flavor: MSB-first bit order, early change) --------------------

_CLEAR, _EOI = 256, 257


def lzw_decode(data: bytes) -> bytes:
    """Decode a TIFF LZW code stream (TIFF 6.0 §13: 9→12 bit codes,
    MSB-first packing, code width increments one code EARLY)."""
    out = bytearray()
    nbits = 9
    bitpos = 0
    nbytes = len(data)
    table: list[bytes] = []
    prev = b""
    while True:
        byte0 = bitpos >> 3
        if byte0 >= nbytes:
            break
        window = int.from_bytes(data[byte0 : byte0 + 4].ljust(4, b"\0"), "big")
        code = (window >> (32 - nbits - (bitpos & 7))) & ((1 << nbits) - 1)
        bitpos += nbits
        if code == _EOI:
            break
        if code == _CLEAR:
            table = [bytes([i]) for i in range(256)] + [b"", b""]
            nbits = 9
            prev = b""
            continue
        if not table:
            raise ValueError("LZW stream does not start with a Clear code")
        if prev:
            if code < len(table):
                entry = table[code]
            elif code == len(table):
                entry = prev + prev[:1]
            else:
                raise ValueError(f"corrupt LZW stream: code {code} beyond table")
            table.append(prev + entry[:1])
        else:
            entry = table[code]
        out += entry
        prev = entry
        # early change: widen as soon as the NEXT table add would need it
        if len(table) == (1 << nbits) - 1 and nbits < 12:
            nbits += 1
    return bytes(out)


class _BitWriter:
    __slots__ = ("buf", "acc", "nacc")

    def __init__(self) -> None:
        self.buf = bytearray()
        self.acc = 0
        self.nacc = 0

    def put(self, code: int, nbits: int) -> None:
        self.acc = (self.acc << nbits) | code
        self.nacc += nbits
        while self.nacc >= 8:
            self.nacc -= 8
            self.buf.append((self.acc >> self.nacc) & 0xFF)
        self.acc &= (1 << self.nacc) - 1

    def flush(self) -> bytes:
        if self.nacc:
            self.buf.append((self.acc << (8 - self.nacc)) & 0xFF)
            self.acc = self.nacc = 0
        return bytes(self.buf)


def lzw_encode(data: bytes) -> bytes:
    """Encode a TIFF LZW code stream (early-change; Clear at table-full,
    matching the decoder above and TIFF 6.0 §13's 4094 reset point)."""
    w = _BitWriter()
    nbits = 9
    w.put(_CLEAR, nbits)
    table: dict[bytes, int] = {bytes([i]): i for i in range(256)}
    next_code = 258
    run = b""
    for i in range(len(data)):
        c = data[i : i + 1]
        rc = run + c
        if rc in table:
            run = rc
            continue
        w.put(table[run], nbits)
        table[rc] = next_code
        next_code += 1
        # widen so the decoder (whose table lags this one by exactly one
        # entry — it reconstructs entry k only upon reading code k+1) sees
        # its early-change condition len==2^nbits-1 at the same stream
        # position: encoder counter 2^nbits ⇔ decoder length 2^nbits - 1.
        # Timing validated against libtiff-written tiles in tests.
        if next_code == (1 << nbits) and nbits < 12:
            nbits += 1
        if next_code == 4094:
            w.put(_CLEAR, nbits)
            table = {bytes([i]): i for i in range(256)}
            next_code = 258
            nbits = 9
        run = c
    if run:
        w.put(table[run], nbits)
    w.put(_EOI, nbits)
    return w.flush()


# -- profile -----------------------------------------------------------------


@dataclass
class TiffProfile:
    """Everything needed to re-create a raster container losslessly —
    the analogue of rasterio's ``src.profile`` + ``src.colorinterp``."""

    width: int
    height: int
    count: int
    dtype: str  # 'uint8' | 'uint16'
    compression: int = COMPRESSION_LZW
    predictor: int = 1
    photometric: int = 2
    extrasamples: tuple[int, ...] = ()
    tiled: bool = True
    tile_width: int = 32
    tile_height: int = 32
    rows_per_strip: int = 0
    #: opaque preserved tags: {tag: (type, count, payload bytes)}
    geo: dict[int, tuple[int, int, bytes]] = field(default_factory=dict)

    @property
    def np_dtype(self) -> np.dtype:
        return np.dtype("<u2") if self.dtype == "uint16" else np.dtype("uint8")

    def colorinterp(self) -> tuple[str, ...]:
        """Band interpretation tuple (reference tests/test_cli.py:199-219
        asserts this survives a color run)."""
        if self.photometric == 2:
            base = ["red", "green", "blue"]
        elif self.photometric in (0, 1):
            base = ["gray"]
        else:
            base = [f"photometric_{self.photometric}"] * min(self.count, 1)
        extras = ["alpha" if e in (1, 2) else "undefined" for e in self.extrasamples]
        out = (base + extras + ["undefined"] * self.count)[: self.count]
        return tuple(out)


@dataclass
class ChunkRef:
    """One decodable unit (tile or strip) as a byte range — the Spark
    bridge's unit of parallelism."""

    index: int
    row0: int  # pixel row of chunk origin
    col0: int
    width: int  # valid (unpadded) pixels
    height: int
    stored_width: int  # padded storage width (tiles pad to tile_width)
    stored_height: int
    offset: int
    nbytes: int


# -- reader ------------------------------------------------------------------


def _read_tag_values(data: bytes, bo: str, typ: int, cnt: int, raw: bytes):
    size = _TYPE_SIZES[typ] * cnt
    if size > 4:
        off = struct.unpack(bo + "I", raw)[0]
        payload = data[off : off + size]
    else:
        payload = raw[:size]
    if typ == 3:
        return list(struct.unpack(bo + "H" * cnt, payload))
    if typ == 4:
        return list(struct.unpack(bo + "I" * cnt, payload))
    if typ in (1, 2, 6, 7):
        return payload
    if typ == 12:
        return list(struct.unpack(bo + "d" * cnt, payload))
    return payload


def read_ifd(data: bytes) -> tuple[TiffProfile, list[ChunkRef]]:
    """Parse the first IFD → (profile, chunk byte-ranges).

    Only the header + tag area is touched; pixel bytes are NOT read. On a
    shared filesystem the driver calls this on the first ~64 KiB and ships
    ChunkRefs to executors.
    """
    if data[:2] not in (b"II", b"MM"):
        raise ValueError("not a TIFF file")
    bo = "<" if data[:2] == b"II" else ">"
    magic, off = struct.unpack(bo + "HI", data[2:8])
    if magic == 43:
        raise NotImplementedError("BigTIFF not supported by the built-in codec")
    if magic != 42:
        raise ValueError("bad TIFF magic")
    tags: dict[int, tuple[int, int, object]] = {}
    n = struct.unpack(bo + "H", data[off : off + 2])[0]
    for i in range(n):
        e = off + 2 + i * 12
        tag, typ, cnt = struct.unpack(bo + "HHI", data[e : e + 8])
        tags[tag] = (typ, cnt, _read_tag_values(data, bo, typ, cnt, data[e + 8 : e + 12]))

    def one(tag: int, default=None):
        if tag not in tags:
            if default is None:
                raise ValueError(f"required TIFF tag {tag} missing")
            return default
        v = tags[tag][2]
        return v[0] if isinstance(v, list) else v

    width, height = one(TAG_WIDTH), one(TAG_HEIGHT)
    spp = one(TAG_SPP, 1)
    bits = tags.get(TAG_BITS, (3, 1, [8]))[2]
    bits = bits if isinstance(bits, list) else [8]
    if len(set(bits)) != 1 or bits[0] not in (8, 16):
        raise NotImplementedError(f"unsupported BitsPerSample {bits}")
    comp = one(TAG_COMPRESSION, COMPRESSION_NONE)
    if comp == COMPRESSION_JPEG:
        raise NotImplementedError(
            "JPEG-in-TIFF requires a codec library not present in this "
            "environment (same seam as sources/codec.py lossy formats)"
        )
    if comp not in (COMPRESSION_NONE, COMPRESSION_LZW, COMPRESSION_DEFLATE, COMPRESSION_DEFLATE_OLD):
        raise NotImplementedError(f"unsupported TIFF compression {comp}")
    if one(TAG_PLANAR, 1) != 1:
        raise NotImplementedError("planar (band-separate) TIFF not supported")
    predictor = one(TAG_PREDICTOR, 1)
    if predictor not in (1, 2):
        raise NotImplementedError(f"unsupported predictor {predictor}")
    extras = tags.get(TAG_EXTRASAMPLES)
    extrasamples = tuple(extras[2]) if extras else ()

    geo = {}
    for t in GEO_TAGS:
        if t in tags:
            typ, cnt, _ = tags[t]
            size = _TYPE_SIZES[typ] * cnt
            # re-read raw payload bytes for byte-exact preservation
            e = None
            for i in range(n):
                ei = off + 2 + i * 12
                if struct.unpack(bo + "H", data[ei : ei + 2])[0] == t:
                    e = ei
                    break
            raw = data[e + 8 : e + 12]
            if size > 4:
                o = struct.unpack(bo + "I", raw)[0]
                payload = data[o : o + size]
            else:
                payload = raw[:size]
            geo[t] = (typ, cnt, payload)

    prof = TiffProfile(
        width=width,
        height=height,
        count=spp,
        dtype="uint16" if bits[0] == 16 else "uint8",
        compression=comp,
        predictor=predictor,
        photometric=one(TAG_PHOTOMETRIC, 1),
        extrasamples=extrasamples,
        geo=geo,
    )

    chunks: list[ChunkRef] = []
    if TAG_TILE_OFFSETS in tags:
        tw, th = one(TAG_TILE_W), one(TAG_TILE_H)
        prof.tiled, prof.tile_width, prof.tile_height = True, tw, th
        offsets = tags[TAG_TILE_OFFSETS][2]
        counts = tags[TAG_TILE_COUNTS][2]
        across = -(-width // tw)
        down = -(-height // th)
        if len(offsets) != across * down:
            raise ValueError("tile count mismatch")
        for idx in range(len(offsets)):
            r, c = divmod(idx, across)
            chunks.append(
                ChunkRef(
                    index=idx,
                    row0=r * th,
                    col0=c * tw,
                    width=min(tw, width - c * tw),
                    height=min(th, height - r * th),
                    stored_width=tw,
                    stored_height=th,
                    offset=offsets[idx],
                    nbytes=counts[idx],
                )
            )
    else:
        rps = one(TAG_ROWS_PER_STRIP, height)
        prof.tiled = False
        prof.rows_per_strip = rps
        offsets = tags[TAG_STRIP_OFFSETS][2]
        counts = tags[TAG_STRIP_COUNTS][2]
        if isinstance(offsets, bytes):  # single short strip edge case
            raise ValueError("unexpected strip offset encoding")
        for idx in range(len(offsets)):
            r0 = idx * rps
            h = min(rps, height - r0)
            chunks.append(
                ChunkRef(
                    index=idx,
                    row0=r0,
                    col0=0,
                    width=width,
                    height=h,
                    stored_width=width,
                    stored_height=h,
                    offset=offsets[idx],
                    nbytes=counts[idx],
                )
            )
    return prof, chunks


def decode_chunk(raw: bytes, prof: TiffProfile, chunk: ChunkRef) -> np.ndarray:
    """Compressed chunk bytes → (count, height, width) ndarray (valid
    region only — tile padding removed)."""
    comp = prof.compression
    if comp == COMPRESSION_LZW:
        buf = lzw_decode(raw)
    elif comp in (COMPRESSION_DEFLATE, COMPRESSION_DEFLATE_OLD):
        buf = zlib.decompress(raw)
    else:
        buf = raw
    dt = prof.np_dtype
    sw, sh, spp = chunk.stored_width, chunk.stored_height, prof.count
    expected = sw * sh * spp * dt.itemsize
    if len(buf) < expected:
        # stripped files may truncate the final strip to valid rows
        expected = chunk.width * chunk.height * spp * dt.itemsize
        sw, sh = chunk.width, chunk.height
        if len(buf) < expected:
            raise ValueError(
                f"chunk {chunk.index}: decoded {len(buf)} bytes < expected {expected}"
            )
    arr = np.frombuffer(buf[:expected], dtype=dt).reshape(sh, sw, spp)
    if prof.predictor == 2:
        arr = np.cumsum(arr.astype(np.int64), axis=1).astype(dt)
    # (h, w, spp) pixel-interleaved → (spp, h, w), padding clipped
    return np.ascontiguousarray(
        arr[: chunk.height, : chunk.width, :].transpose(2, 0, 1)
    )


def encode_chunk(arr: np.ndarray, prof: TiffProfile, stored_w: int, stored_h: int) -> bytes:
    """(count, h, w) ndarray → compressed chunk bytes, zero-padded to the
    stored tile geometry (GDAL pads the same way)."""
    spp, h, w = arr.shape
    dt = prof.np_dtype
    px = np.zeros((stored_h, stored_w, spp), dtype=dt)
    px[:h, :w, :] = arr.transpose(1, 2, 0)
    if prof.predictor == 2:
        px = np.concatenate(
            [px[:, :1, :], np.diff(px.astype(np.int64), axis=1)], axis=1
        ).astype(dt)
    buf = px.tobytes()
    comp = prof.compression
    if comp == COMPRESSION_LZW:
        return lzw_encode(buf)
    if comp in (COMPRESSION_DEFLATE, COMPRESSION_DEFLATE_OLD):
        return zlib.compress(buf, 6)
    return buf


def read_tiff(path: str) -> tuple[np.ndarray, TiffProfile]:
    """Whole-raster read → ((count, height, width) array, profile)."""
    with open(path, "rb") as f:
        data = f.read()
    prof, chunks = read_ifd(data)
    out = np.zeros((prof.count, prof.height, prof.width), dtype=prof.np_dtype)
    for ch in chunks:
        tile = decode_chunk(data[ch.offset : ch.offset + ch.nbytes], prof, ch)
        out[:, ch.row0 : ch.row0 + ch.height, ch.col0 : ch.col0 + ch.width] = tile
    return out, prof


# -- writer ------------------------------------------------------------------


def _chunk_grid(prof: TiffProfile) -> list[tuple[int, int, int, int, int, int]]:
    """(row0, col0, valid_w, valid_h, stored_w, stored_h) per chunk in
    index order."""
    out = []
    if prof.tiled:
        tw, th = prof.tile_width, prof.tile_height
        for r0 in range(0, prof.height, th):
            for c0 in range(0, prof.width, tw):
                out.append(
                    (r0, c0, min(tw, prof.width - c0), min(th, prof.height - r0), tw, th)
                )
    else:
        rps = prof.rows_per_strip or prof.height
        for r0 in range(0, prof.height, rps):
            h = min(rps, prof.height - r0)
            out.append((r0, 0, prof.width, h, prof.width, h))
    return out


def write_tiff_chunks(path: str, payloads: list[bytes], prof: TiffProfile) -> None:
    """Assemble a classic little-endian TIFF from pre-compressed chunk
    payloads (index order must match :func:`_chunk_grid`).

    Split out from :func:`write_tiff` so the Spark export path can
    compress chunks on executors and only stream opaque bytes through the
    driver — the driver never decodes a pixel.
    """
    grid = _chunk_grid(prof)
    if len(payloads) != len(grid):
        raise ValueError(f"expected {len(grid)} chunk payloads, got {len(payloads)}")
    bo = "<"
    bits = 16 if prof.dtype == "uint16" else 8

    entries: list[tuple[int, int, int, bytes]] = []  # (tag, type, count, payload)

    def add(tag: int, typ: int, values) -> None:
        if isinstance(values, (bytes, bytearray)):
            payload, cnt = bytes(values), len(values)
        else:
            vals = values if isinstance(values, (list, tuple)) else [values]
            fmt = {3: "H", 4: "I", 12: "d"}[typ]
            payload = struct.pack(bo + fmt * len(vals), *vals)
            cnt = len(vals)
        entries.append((tag, typ, cnt, payload))

    add(TAG_WIDTH, 3, prof.width)
    add(TAG_HEIGHT, 3, prof.height)
    add(TAG_BITS, 3, [bits] * prof.count)
    add(TAG_COMPRESSION, 3, prof.compression)
    add(TAG_PHOTOMETRIC, 3, prof.photometric)
    add(TAG_SPP, 3, prof.count)
    add(TAG_PLANAR, 3, 1)
    if prof.predictor != 1:
        add(TAG_PREDICTOR, 3, prof.predictor)
    if prof.tiled:
        add(TAG_TILE_W, 3, prof.tile_width)
        add(TAG_TILE_H, 3, prof.tile_height)
    else:
        add(TAG_ROWS_PER_STRIP, 3, prof.rows_per_strip or prof.height)
    if prof.extrasamples:
        add(TAG_EXTRASAMPLES, 3, list(prof.extrasamples))
    add(TAG_SAMPLE_FORMAT, 3, [1] * prof.count)
    for tag, (typ, cnt, payload) in sorted(prof.geo.items()):
        entries.append((tag, typ, cnt, payload))

    # offsets/counts tags appended after layout below
    n_tags = len(entries) + 2
    ifd_off = 8
    ifd_size = 2 + n_tags * 12 + 4
    # tag overflow payload area follows the IFD
    overflow: list[bytes] = []
    overflow_off = ifd_off + ifd_size

    off_tag_typ = 4
    counts = [len(p) for p in payloads]
    data_start = overflow_off  # patched after overflow is sized
    # first pass: compute overflow size with placeholder offset arrays
    placeholder = struct.pack(bo + "I" * len(payloads), *([0] * len(payloads)))
    all_entries = entries + [
        (TAG_TILE_OFFSETS if prof.tiled else TAG_STRIP_OFFSETS, off_tag_typ, len(payloads), placeholder),
        (TAG_TILE_COUNTS if prof.tiled else TAG_STRIP_COUNTS, off_tag_typ, len(payloads), counts_payload := struct.pack(bo + "I" * len(counts), *counts)),
    ]
    all_entries.sort(key=lambda e: e[0])
    ovf = 0
    for _, _, _, payload in all_entries:
        if len(payload) > 4:
            ovf += len(payload) + (len(payload) & 1)
    data_start = overflow_off + ovf
    # chunk offsets now known
    offs = []
    pos = data_start
    for p in payloads:
        offs.append(pos)
        pos += len(p) + (len(p) & 1)
    offsets_payload = struct.pack(bo + "I" * len(offs), *offs)
    all_entries = [
        e
        for e in all_entries
        if e[0] not in (TAG_TILE_OFFSETS, TAG_STRIP_OFFSETS)
    ]
    all_entries.append(
        (TAG_TILE_OFFSETS if prof.tiled else TAG_STRIP_OFFSETS, off_tag_typ, len(payloads), offsets_payload)
    )
    all_entries.sort(key=lambda e: e[0])

    out = bytearray()
    out += b"II" + struct.pack(bo + "HI", 42, ifd_off)
    out += struct.pack(bo + "H", n_tags)
    ovf_cursor = overflow_off
    ovf_buf = bytearray()
    for tag, typ, cnt, payload in all_entries:
        out += struct.pack(bo + "HHI", tag, typ, cnt)
        if len(payload) > 4:
            out += struct.pack(bo + "I", ovf_cursor)
            ovf_buf += payload
            if len(payload) & 1:
                ovf_buf += b"\0"
            ovf_cursor += len(payload) + (len(payload) & 1)
        else:
            out += payload.ljust(4, b"\0")
    out += struct.pack(bo + "I", 0)  # next IFD
    assert len(out) == ifd_off + ifd_size, (len(out), ifd_off + ifd_size)
    out += ovf_buf
    assert len(out) == data_start
    for p in payloads:
        out += p
        if len(p) & 1:
            out += b"\0"
    with open(path, "wb") as f:
        f.write(bytes(out))


def write_tiff(path: str, arr: np.ndarray, prof: TiffProfile) -> None:
    """Whole-raster write: (count, height, width) array → classic TIFF."""
    if arr.ndim != 3:
        raise ValueError(f"expected (bands, h, w), got shape {arr.shape}")
    prof.count, prof.height, prof.width = arr.shape
    payloads = [
        encode_chunk(arr[:, r0 : r0 + vh, c0 : c0 + vw], prof, sw, sh)
        for (r0, c0, vw, vh, sw, sh) in _chunk_grid(prof)
    ]
    write_tiff_chunks(path, payloads, prof)


def apply_creation_options(prof: TiffProfile, co: dict[str, str]) -> TiffProfile:
    """GDAL-style creation options (reference --co, cli.py:85 /
    tests/test_cli.py:121-169) onto a profile copy."""
    import copy

    p = copy.deepcopy(prof)
    for k, v in co.items():
        k = k.lower()
        if k == "compress":
            name = v.lower()
            if name == "jpeg":
                raise NotImplementedError(
                    "compress=jpeg requires a JPEG codec not present in this "
                    "environment (stub seam; lzw/deflate/none supported)"
                )
            if name not in COMPRESS_NAMES:
                raise ValueError(f"unknown compress={v!r}")
            p.compression = COMPRESS_NAMES[name]
        elif k == "predictor":
            p.predictor = int(v)
        elif k == "blockxsize":
            p.tile_width = int(v)
        elif k == "blockysize":
            p.tile_height = int(v)
        elif k == "tiled":
            p.tiled = v.lower() in ("true", "yes", "1")
        # unknown options pass through silently, matching GDAL's tolerance
    return p
