"""Image payload codec for the ``bytes`` column.

The engine treats pixels as an opaque ``binary`` column with typed metadata
(`w`, `h`, `fmt`) — Catalyst never sees pixel data; Arrow moves it to Python
workers where NumPy reinterprets the buffer zero-copy. This mirrors the
reference's raster block model ((bands, rows, cols) ndarray,
/root/reference/rio_color/operations.py:135) with an explicit on-wire codec.

Built-in lossless formats (self-contained; rasterio/Pillow are absent here):

- ``npy8``  — uint8,  3 bands (RGB),  raw C-order (3, h, w) buffer
- ``npy8a`` — uint8,  4 bands (RGBA), raw C-order (4, h, w) buffer
- ``npy16`` — uint16, 3 bands (RGB),  raw C-order (3, h, w) buffer,
  little-endian
- ``npy16a`` — uint16, 4 bands (RGBA), little-endian

Real codecs plug in through the same table: decode is a pure
``bytes, w, h -> ndarray`` function, so registering one entry makes the
whole engine handle that format. ``png*`` (sources/png.py, lossless) and
``jpeg`` (sources/jpeg.py, lossy baseline) are REAL here — both are
self-contained zlib/NumPy implementations. ``webp`` stays a deliberate
fail-fast seam (no codec library in this container); the Spark-side
plumbing (schema, batching, UDF signatures) is identical either way.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np


@dataclass(frozen=True)
class Format:
    name: str
    dtype: np.dtype
    bands: int
    lossless: bool = True
    #: "raw" = C-order (bands, h, w) buffer reinterpreted zero-copy;
    #: "png" / "jpeg" route through the pure-Python codecs
    codec: str = "raw"


_FORMATS = {
    "npy8": Format("npy8", np.dtype("uint8"), 3),
    "npy8a": Format("npy8a", np.dtype("uint8"), 4),
    "npy16": Format("npy16", np.dtype("<u2"), 3),
    "npy16a": Format("npy16a", np.dtype("<u2"), 4),
    "png": Format("png", np.dtype("uint8"), 3, codec="png"),
    "pnga": Format("pnga", np.dtype("uint8"), 4, codec="png"),
    "png16": Format("png16", np.dtype("uint16"), 3, codec="png"),
    "jpeg": Format("jpeg", np.dtype("uint8"), 3, lossless=False, codec="jpeg"),
}

#: formats that would require an external codec library — stubbed here
_STUBBED = {"webp"}


def format_info(fmt: str) -> Format:
    try:
        return _FORMATS[fmt]
    except KeyError:
        if fmt in _STUBBED:
            raise NotImplementedError(
                f"codec {fmt!r} requires an image library not present in this "
                "environment; register a Format + decode hook to enable it"
            )
        raise ValueError(f"unknown image format: {fmt!r}")


def decode(buf: bytes, w: int, h: int, fmt: str) -> np.ndarray:
    """binary payload → (bands, h, w) ndarray (zero-copy view where possible)."""
    info = format_info(fmt)
    if info.codec == "raw":
        expected = info.bands * h * w * info.dtype.itemsize
        if len(buf) != expected:
            raise ValueError(
                f"payload size {len(buf)} != expected {expected} for "
                f"fmt={fmt} w={w} h={h}"
            )
        return np.frombuffer(buf, dtype=info.dtype).reshape(info.bands, h, w)
    if info.codec == "png":
        from rio_color_spark.sources.png import decode_png

        arr = decode_png(bytes(buf))
    else:  # jpeg
        from rio_color_spark.sources import jpeg as J

        px = J.decode_jpeg(bytes(buf))
        if px.ndim == 2:
            px = px[:, :, None]
        arr = np.ascontiguousarray(px.transpose(2, 0, 1))
    if arr.shape != (info.bands, h, w):
        raise ValueError(
            f"decoded shape {arr.shape} != metadata ({info.bands}, {h}, {w}) "
            f"for fmt={fmt}"
        )
    return arr.astype(info.dtype, copy=False)


def encode(arr: np.ndarray, fmt: str) -> bytes:
    """(bands, h, w) ndarray → binary payload."""
    info = format_info(fmt)
    if arr.ndim != 3 or arr.shape[0] != info.bands:
        raise ValueError(f"array shape {arr.shape} incompatible with fmt={fmt}")
    if info.codec == "png":
        from rio_color_spark.sources.png import encode_png

        return encode_png(np.ascontiguousarray(arr, dtype=info.dtype))
    if info.codec == "jpeg":
        from rio_color_spark.sources import jpeg as J

        px = np.ascontiguousarray(
            arr.astype(np.uint8, copy=False).transpose(1, 2, 0)
        )
        return J.encode_jpeg(px)
    return np.ascontiguousarray(arr, dtype=info.dtype).tobytes()


def stack_decode(bufs, h: int, w: int, fmt: str) -> np.ndarray:
    """B same-shaped payloads → ONE (B, bands, h, w) array.

    The shared group-stacking chokepoint for the batch operators
    (operators/color.py, operators/media.py): raw formats reinterpret one
    joined buffer zero-copy (a single ``frombuffer`` per group); codec
    formats decode per row then stack — the per-group NumPy math downstream
    launches once either way."""
    info = format_info(fmt)
    if info.codec == "raw":
        flat = np.frombuffer(b"".join(bufs), dtype=info.dtype)
        return flat.reshape(len(bufs), info.bands, h, w)
    return np.stack([decode(b, w, h, fmt) for b in bufs])


def fmt_for_dtype(dtype, bands: int) -> str:
    """Pick the lossless fmt tag for an output dtype/band count."""
    dt = np.dtype(dtype)
    if dt == np.uint8:
        return "npy8a" if bands == 4 else "npy8"
    if dt == np.uint16:
        return "npy16a" if bands == 4 else "npy16"
    raise ValueError(f"no format for dtype {dt}")
