#!/usr/bin/env python3
"""Video-container fixture generator for the Multimodal probe gate.

Hand-assembles minimal-but-valid MP4 box structures with the python
stdlib (struct only — an encoder independent of the JVM parser):
`ftyp` + `moov{ mvhd, trak{tkhd}... }`, one tkhd per track with 16.16
fixed-point dimensions — plus header-only RIFF/AVI files whose `avih`
carries the probe's ground truth (brand 'AVI ', timescale =
dwMicroSecPerFrame, duration = dwTotalFrames, n_tracks = dwStreams).
Alongside writes video.csv with the ground truth the probe must
recover: brand, movie timescale, duration (in timescale units), track
count, and the FIRST track's pixel dims.

Usage: python3 tools/make_video_fixtures.py [outDir]
Default outDir: src/test/resources/fixtures/video
"""
import os
import struct
import sys


def box(tag: bytes, payload: bytes) -> bytes:
    return struct.pack(">I", 8 + len(payload)) + tag + payload


def ftyp(brand: bytes) -> bytes:
    return box(b"ftyp", brand + struct.pack(">I", 0) + brand + b"mp41")


def mvhd(timescale: int, duration: int) -> bytes:
    payload = struct.pack(">B3x", 0)                 # version 0 + flags
    payload += struct.pack(">II", 0, 0)              # creation, modification
    payload += struct.pack(">II", timescale, duration)
    payload += struct.pack(">I", 0x00010000)         # rate 1.0
    payload += struct.pack(">H", 0x0100)             # volume 1.0
    payload += b"\x00" * 10                          # reserved
    payload += struct.pack(">9I", 0x00010000, 0, 0, 0, 0x00010000, 0, 0, 0,
                           0x40000000)               # unity matrix
    payload += b"\x00" * 24                          # pre_defined
    payload += struct.pack(">I", 2)                  # next_track_ID
    return box(b"mvhd", payload)


def tkhd(track_id: int, duration: int, w: int, h: int) -> bytes:
    payload = struct.pack(">B3x", 0)
    payload += struct.pack(">II", 0, 0)              # creation, modification
    payload += struct.pack(">I", track_id)
    payload += b"\x00" * 4                           # reserved
    payload += struct.pack(">I", duration)
    payload += b"\x00" * 8                           # reserved
    payload += struct.pack(">HHHH", 0, 0, 0, 0)      # layer, group, volume, rsvd
    payload += struct.pack(">9I", 0x00010000, 0, 0, 0, 0x00010000, 0, 0, 0,
                           0x40000000)
    payload += struct.pack(">II", w << 16, h << 16)  # 16.16 fixed
    return box(b"tkhd", payload)


def trak(track_id: int, duration: int, w: int, h: int) -> bytes:
    return box(b"trak", tkhd(track_id, duration, w, h))


def mp4(brand: bytes, timescale: int, duration: int, tracks) -> bytes:
    moov = mvhd(timescale, duration)
    for i, (w, h) in enumerate(tracks):
        moov += trak(i + 1, duration, w, h)
    # a free box before moov exercises top-level box skipping
    return ftyp(brand) + box(b"free", b"\x00" * 12) + box(b"moov", moov)


def riff_chunk(cc: bytes, payload: bytes) -> bytes:
    data = cc + struct.pack("<I", len(payload)) + payload
    if len(payload) % 2:
        data += b"\x00"                              # pad byte outside size
    return data


def riff_list(list_type: bytes, payload: bytes) -> bytes:
    return riff_chunk(b"LIST", list_type + payload)


def avi(micro_per_frame: int, total_frames: int, streams: int,
        w: int, h: int) -> bytes:
    """Header-only RIFF/AVI: RIFF('AVI '){LIST hdrl{avih}, LIST movi{}}.
    The probe reads only avih (AVIMAINHEADER, all u32le)."""
    avih = riff_chunk(b"avih", struct.pack(
        "<10I", micro_per_frame, 0, 0, 0, total_frames, 0, streams, 0, w, h)
        + b"\x00" * 16)
    # a JUNK chunk before hdrl exercises top-level chunk skipping
    body = (b"AVI " + riff_chunk(b"JUNK", b"\x00" * 11) +
            riff_list(b"hdrl", avih) + riff_list(b"movi", b""))
    return b"RIFF" + struct.pack("<I", len(body)) + body


def main(out_dir: str) -> None:
    os.makedirs(out_dir, exist_ok=True)
    specs = [
        ("v_isom_640.mp4", b"isom", 1000, 5000, [(640, 360)]),
        ("v_mp42_1920.mp4", b"mp42", 90000, 2700000, [(1920, 1080)]),
        ("v_two_tracks.mp4", b"isom", 600, 600, [(320, 240), (0, 0)]),
        ("v_tiny.mp4", b"isom", 1, 1, [(16, 16)]),
    ]
    rows = ["file_name,brand,timescale,duration,n_tracks,width,height"]
    for name, brand, ts, dur, tracks in specs:
        with open(os.path.join(out_dir, name), "wb") as f:
            f.write(mp4(brand, ts, dur, tracks))
        w, h = tracks[0]
        rows.append(f"{name},{brand.decode()},{ts},{dur},{len(tracks)},{w},{h}")
    # RIFF/AVI: brand 'AVI ', timescale = dwMicroSecPerFrame,
    # duration = dwTotalFrames, n_tracks = dwStreams (the avih mapping)
    avi_specs = [
        ("a_cam_30fps.avi", 33333, 900, 2, 640, 480),
        ("a_odd_junk.avi", 40000, 7, 1, 13, 11),
    ]
    for name, mpf, nf, streams, w, h in avi_specs:
        with open(os.path.join(out_dir, name), "wb") as f:
            f.write(avi(mpf, nf, streams, w, h))
        rows.append(f"{name},AVI ,{mpf},{nf},{streams},{w},{h}")
    with open(os.path.join(out_dir, "video.csv"), "w") as f:
        f.write("\n".join(rows) + "\n")
    print(f"wrote {len(specs)} MP4s + {len(avi_specs)} AVIs + video.csv to {out_dir}")


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1
         else "src/test/resources/fixtures/video")
