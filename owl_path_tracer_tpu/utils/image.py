"""Image IO: PNG framebuffer output, LDR texture load, Radiance HDR env maps.

Parity notes vs the reference (``/root/reference/path_tracer/src/utils/image_buffer.cpp``):

* ``write_png_rgba8`` stores the owl ``make_rgba`` quantization
  (``255.99 * clamp(c,0,1)``, device.cu:253) and the store-time vertical flip
  (device.cu:251) is done by the *integrator* handing us image-row-ordered data.
* ``load_texture_rgba8`` reproduces the LDR path incl. the vertical flip on
  load (image_buffer.cpp:49-55 / application.cpp:225-231).
* The reference loads ``environment.hdr`` through the same LDR 8-bit path
  (application.cpp:160, a real quality bug); we default to true float HDR via a
  pure-numpy Radiance ``.hdr`` codec and keep the LDR behaviour available as
  ``ldr_parity=True``.
"""
from __future__ import annotations

import pathlib

import numpy as np


def quantize_rgba8(rgb: np.ndarray) -> np.ndarray:
    """f32 [...,3] linear -> uint8 [...,4] using owl's make_rgba rounding."""
    q = (np.clip(rgb, 0.0, 1.0) * 255.99).astype(np.uint8)
    a = np.full(q.shape[:-1] + (1,), 255, np.uint8)
    return np.concatenate([q, a], axis=-1)


def write_png_rgba8(path, rgba: np.ndarray):
    """rgba uint8 [H,W,4], row 0 = top of image."""
    from PIL import Image

    Image.fromarray(rgba, "RGBA").save(str(path))


def write_png_rgb(path, rgb_f32: np.ndarray):
    write_png_rgba8(path, quantize_rgba8(rgb_f32))


def read_png(path) -> np.ndarray:
    from PIL import Image

    return np.asarray(Image.open(str(path)).convert("RGBA"))


def load_texture_rgba8(path, flip_vertical: bool = True) -> np.ndarray:
    """LDR texture load with the reference's vertical flip; uint8 [H,W,4]."""
    img = read_png(path)
    if flip_vertical:
        img = img[::-1].copy()
    return img


# ── Radiance HDR (.hdr / RGBE) codec, pure numpy ───────────────────────────


def _rgbe_to_float(rgbe: np.ndarray) -> np.ndarray:
    """uint8 [H,W,4] RGBE -> f32 [H,W,3]."""
    rgbe = rgbe.astype(np.int32)
    exp = rgbe[..., 3]
    scale = np.where(exp == 0, 0.0, np.ldexp(1.0, exp - 128 - 8)).astype(np.float32)
    return rgbe[..., :3].astype(np.float32) * scale[..., None]


def _float_to_rgbe(rgb: np.ndarray) -> np.ndarray:
    """f32 [H,W,3] -> uint8 [H,W,4] RGBE."""
    maxc = rgb.max(axis=-1)
    mant, exp = np.frexp(maxc)
    scale = np.where(maxc > 1e-32, mant * 256.0 / np.maximum(maxc, 1e-32), 0.0)
    out = np.zeros(rgb.shape[:-1] + (4,), np.uint8)
    out[..., :3] = np.clip(rgb * scale[..., None] + 0.5, 0, 255).astype(np.uint8)
    out[..., 3] = np.where(maxc > 1e-32, exp + 128, 0).astype(np.uint8)
    return out


def read_hdr(path) -> np.ndarray:
    """Read a Radiance .hdr file -> linear f32 [H,W,3].

    Supports the common ``-Y H +X W`` orientation with adaptive RLE scanlines
    (and the uncompressed fallback).
    """
    data = pathlib.Path(path).read_bytes()
    # header ends at blank line
    pos = data.find(b"\n\n")
    if pos < 0:
        raise ValueError("bad hdr header")
    header = data[:pos].decode("latin-1")
    if "32-bit_rle_rgbe" not in header and not header.startswith("#?"):
        raise ValueError("not an RGBE hdr file")
    body = data[pos + 2 :]
    nl = body.find(b"\n")
    dims = body[:nl].decode("latin-1").split()
    if dims[0] != "-Y" or dims[2] != "+X":
        raise ValueError(f"unsupported orientation {dims}")
    h, w = int(dims[1]), int(dims[3])
    buf = np.frombuffer(body[nl + 1 :], np.uint8)
    img = np.zeros((h, w, 4), np.uint8)
    p = 0
    for y in range(h):
        if w >= 8 and w < 32768 and p + 4 <= len(buf) and buf[p] == 2 and buf[p + 1] == 2:
            # adaptive RLE scanline
            p += 4
            for c in range(4):
                x = 0
                while x < w:
                    count = int(buf[p])
                    p += 1
                    if count > 128:  # run
                        img[y, x : x + count - 128, c] = buf[p]
                        p += 1
                        x += count - 128
                    else:  # literal
                        img[y, x : x + count, c] = buf[p : p + count]
                        p += count
                        x += count
        else:
            flat = buf[p : p + w * 4].reshape(w, 4)
            img[y] = flat
            p += w * 4
    return _rgbe_to_float(img)


def write_hdr(path, rgb: np.ndarray):
    """Write linear f32 [H,W,3] as uncompressed Radiance .hdr."""
    h, w = rgb.shape[:2]
    header = f"#?RADIANCE\nFORMAT=32-bit_rle_rgbe\n\n-Y {h} +X {w}\n".encode("latin-1")
    rgbe = _float_to_rgbe(np.asarray(rgb, np.float32))
    pathlib.Path(path).write_bytes(header + rgbe.tobytes())


def load_environment(path, ldr_parity: bool = False) -> np.ndarray:
    """Load an environment map -> linear f32 [H,W,3].

    ``ldr_parity=True`` mimics the reference bug: decode to 8-bit (tonemapped
    by stb for .hdr inputs) then normalize to [0,1], with vertical flip.
    """
    p = pathlib.Path(path)
    if not p.exists():
        return np.zeros((1, 1, 3), np.float32)
    if p.suffix.lower() == ".hdr" and not ldr_parity:
        img = read_hdr(p)
        return img[::-1].copy()  # reference flips on load (image_buffer.cpp:49)
    img = load_texture_rgba8(p)  # flips
    return (img[..., :3].astype(np.float32) / 255.0)
