#!/usr/bin/env python3
"""Image-fixture generator for the Multimodal decode gate.

Writes deterministic gradient-pattern PNGs using ONLY the python stdlib
(struct + zlib — no PIL, which this container doesn't have and which
would defeat the point: the oracle must be an INDEPENDENT encoder from
the JVM's javax.imageio decoder). Alongside the PNGs it writes
images.csv with the ground-truth decode stats (dimensions, channel
count, per-channel pixel sums) computed from the raw pattern arrays —
the DuckDB side of q_image_decode.

Usage: python3 tools/make_image_fixtures.py [outDir]
Default outDir: src/test/resources/fixtures/images
"""
import os
import struct
import sys
import zlib


def png_chunk(tag: bytes, data: bytes) -> bytes:
    return (struct.pack(">I", len(data)) + tag + data
            + struct.pack(">I", zlib.crc32(tag + data) & 0xFFFFFFFF))


def write_png(path: str, width: int, height: int, color_type: int, rows):
    """color_type: 0=gray, 2=RGB, 6=RGBA; rows = list of bytes scanlines."""
    ihdr = struct.pack(">IIBBBBB", width, height, 8, color_type, 0, 0, 0)
    raw = b"".join(b"\x00" + r for r in rows)  # filter 0 per scanline
    with open(path, "wb") as f:
        f.write(b"\x89PNG\r\n\x1a\n")
        f.write(png_chunk(b"IHDR", ihdr))
        f.write(png_chunk(b"IDAT", zlib.compress(raw, 9)))
        f.write(png_chunk(b"IEND", b""))


def gray_pixel(x, y, s):
    return (x * 3 + y * 7 + s) % 256


def rgb_pixel(x, y, s):
    return ((x * 7 + y * 3 + s) % 256,
            (x * 5 + y * 11 + 2 * s) % 256,
            (x * 13 + y + 3 * s) % 256)


def alpha_pixel(x, y, s):
    # avoid alpha 0: fully transparent pixels may legally zero their
    # color components in some encoders/decoders; keep alpha >= 8
    return 8 + ((x + y + s) % 248)


def main(out_dir: str) -> None:
    os.makedirs(out_dir, exist_ok=True)
    specs = [
        ("g_1x1.png", 1, 1, "gray", 0),
        ("g_16x16.png", 16, 16, "gray", 1),
        ("g_100x7.png", 100, 7, "gray", 2),
        ("rgb_1x1.png", 1, 1, "rgb", 3),
        ("rgb_3x2.png", 3, 2, "rgb", 4),
        ("rgb_64x48.png", 64, 48, "rgb", 5),
        ("rgb_7x100.png", 7, 100, "rgb", 6),
        ("rgb_255x1.png", 255, 1, "rgb", 7),
        ("rgba_16x16.png", 16, 16, "rgba", 8),
        ("rgba_33x9.png", 33, 9, "rgba", 9),
    ]
    csv_rows = ["file_name,width,height,channels,n_px,sum_r,sum_g,sum_b"]
    for name, w, h, kind, seed in specs:
        rows, sr, sg, sb = [], 0, 0, 0
        for y in range(h):
            line = bytearray()
            for x in range(w):
                if kind == "gray":
                    v = gray_pixel(x, y, seed)
                    line.append(v)
                    sr += v; sg += v; sb += v
                else:
                    r, g, b = rgb_pixel(x, y, seed)
                    line += bytes((r, g, b))
                    if kind == "rgba":
                        line.append(alpha_pixel(x, y, seed))
                    sr += r; sg += g; sb += b
            rows.append(bytes(line))
        ctype = {"gray": 0, "rgb": 2, "rgba": 6}[kind]
        nch = {"gray": 1, "rgb": 3, "rgba": 4}[kind]
        write_png(os.path.join(out_dir, name), w, h, ctype, rows)
        csv_rows.append(
            f"{name},{w},{h},{nch},{w * h},{sr},{sg},{sb}")
    with open(os.path.join(out_dir, "images.csv"), "w") as f:
        f.write("\n".join(csv_rows) + "\n")
    print(f"wrote {len(specs)} PNGs + images.csv to {out_dir}")


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1
         else "src/test/resources/fixtures/images")
