#!/usr/bin/env python3
"""Video FRAME fixture generator for the Multimodal MJPEG decode gate.

Encodes real baseline JPEGs with the python stdlib (struct only — an
encoder fully independent of the JVM decoder): flat-gray frames whose
8x8 blocks carry only a DC coefficient, written against an all-ones
quantization table (quality 100), so ImageIO must decode every pixel
EXACTLY — ground truth per frame is pure arithmetic (sum = w*h*v).
Frames are concatenated into Motion-JPEG streams, either raw (.mjpeg)
or wrapped in a hand-assembled ISO BMFF container (.mp4) with the mdat
size encodings a real corpus contains: plain 32-bit, size==1 (64-bit
largesize), and size==0 (box runs to EOF).

Alongside writes frames.csv with the ground truth the decoder must
recover: file_name, frame_no, width, height, channels, n_px, and the
per-channel pixel sums (gray decodes r=g=b).

Usage: python3 tools/make_video_frame_fixtures.py [outDir]
Default outDir: src/test/resources/fixtures/video_frames
"""
import os
import struct
import sys

# ---- baseline JPEG encoder for flat gray frames (Annex K tables) ----

DC_BITS = [0, 0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0]  # BITS[1..16]
DC_VALS = list(range(12))
AC_BITS = [0, 0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D]
AC_VALS = [
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41, 0x06,
    0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xA1, 0x08,
    0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0, 0x24, 0x33, 0x62, 0x72,
    0x82, 0x09, 0x0A, 0x16, 0x17, 0x18, 0x19, 0x1A, 0x25, 0x26, 0x27, 0x28,
    0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39, 0x3A, 0x43, 0x44, 0x45,
    0x46, 0x47, 0x48, 0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
    0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75,
    0x76, 0x77, 0x78, 0x79, 0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
    0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3,
    0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6,
    0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9,
    0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1, 0xE2,
    0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF1, 0xF2, 0xF3, 0xF4,
    0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA]


def huff_codes(bits, vals):
    codes, code, k = {}, 0, 0
    for ln in range(1, 17):
        for _ in range(bits[ln]):
            codes[vals[k]] = (code, ln)
            code += 1
            k += 1
        code <<= 1
    return codes


DC_CODES = huff_codes(DC_BITS, DC_VALS)
AC_CODES = huff_codes(AC_BITS, AC_VALS)


class BitWriter:
    def __init__(self):
        self.buf = bytearray()
        self.acc = 0
        self.n = 0

    def put(self, code, length):
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.n += length
        while self.n >= 8:
            b = (self.acc >> (self.n - 8)) & 0xFF
            self.buf.append(b)
            if b == 0xFF:              # byte stuffing in entropy data
                self.buf.append(0x00)
            self.n -= 8
        self.acc &= (1 << self.n) - 1

    def flush(self):
        if self.n:
            pad = 8 - self.n
            self.put((1 << pad) - 1, pad)


def seg(marker, payload):
    return bytes([0xFF, marker]) + struct.pack(">H", 2 + len(payload)) + payload


def dht(cls, tid, bits, vals):
    return bytes([(cls << 4) | tid]) + bytes(bits[1:17]) + bytes(vals)


def encode_flat_gray(w, h, v):
    """One grayscale baseline JPEG, all 8x8 blocks flat at value v."""
    out = bytearray(b"\xff\xd8")                       # SOI
    out += seg(0xE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
    out += seg(0xDB, bytes([0x00]) + bytes([1]) * 64)  # DQT all-ones
    out += seg(0xC0, struct.pack(">BHHB", 8, h, w, 1) + bytes([1, 0x11, 0]))
    out += seg(0xC4, dht(0, 0, DC_BITS, DC_VALS) + dht(1, 0, AC_BITS, AC_VALS))
    out += seg(0xDA, bytes([1, 1, 0x00, 0, 63, 0]))    # SOS
    bw = BitWriter()
    # DCT DC of a flat block = 8*(v-128); quant 1 keeps it verbatim, so
    # the decoder's IDCT reconstructs the flat value exactly.
    dc = 8 * (v - 128)
    prev = 0
    for _ in range(((h + 7) // 8) * ((w + 7) // 8)):
        diff = dc - prev
        prev = dc
        if diff == 0:
            c, ln = DC_CODES[0]
            bw.put(c, ln)
        else:
            s = diff.bit_length() if diff > 0 else (-diff).bit_length()
            c, ln = DC_CODES[s]
            bw.put(c, ln)
            bw.put(diff if diff > 0 else diff + (1 << s) - 1, s)
        c, ln = AC_CODES[0x00]                         # EOB (all AC zero)
        bw.put(c, ln)
    bw.flush()
    out += bw.buf
    out += b"\xff\xd9"                                 # EOI
    return bytes(out)


# ---- minimal ISO BMFF wrapper (same box builders as the probe tool) --

def box(tag, payload):
    return struct.pack(">I", 8 + len(payload)) + tag + payload


def box_largesize(tag, payload):
    """size==1 + 64-bit largesize header — the >4GB box encoding."""
    return struct.pack(">I", 1) + tag + struct.pack(">Q", 16 + len(payload)) + payload


def box_to_eof(tag, payload):
    """size==0 — box extends to end of file (must be the last box)."""
    return struct.pack(">I", 0) + tag + payload


# ---- minimal RIFF/AVI wrapper (little-endian, even-padded chunks) ----

def riff_chunk(cc, payload):
    data = cc + struct.pack("<I", len(payload)) + payload
    if len(payload) % 2:
        data += b"\x00"                    # pad byte OUTSIDE declared size
    return data


def riff_list(list_type, payload):
    return riff_chunk(b"LIST", list_type + payload)


def avih(micro_per_frame, total_frames, streams, w, h):
    """AVIMAINHEADER: MicroSecPerFrame, MaxBytesPerSec, PaddingGranularity,
    Flags, TotalFrames, InitialFrames, Streams, SuggestedBufferSize,
    Width, Height, Reserved[4] — all u32le."""
    p = struct.pack("<10I", micro_per_frame, 0, 0, 0, total_frames, 0,
                    streams, 0, w, h) + b"\x00" * 16
    return riff_chunk(b"avih", p)


def strl_vids(w, h, n_frames):
    """One MJPG video stream header list (AVISTREAMHEADER + BITMAPINFOHEADER)."""
    strh = riff_chunk(b"strh", b"vids" + b"MJPG" +
                      struct.pack("<10I", 0, 0, 0, 0, 1, 30, 0, n_frames, 0, 0) +
                      struct.pack("<4h", 0, 0, w, h))
    strf = riff_chunk(b"strf", struct.pack("<IiiHH4sIiiII",
                      40, w, h, 1, 24, b"MJPG", w * h * 3, 0, 0, 0, 0))
    return riff_list(b"strl", strh + strf)


def avi(frames, w, h, rec_groups=False, audio_chunks=False):
    """RIFF('AVI '){LIST hdrl{avih, LIST strl}, LIST movi{00dc...}}.
    rec_groups wraps each frame chunk in an OpenDML 'rec ' record LIST;
    audio_chunks interleaves '01wb' chunks the frame walk must skip."""
    movi = b""
    for i, f in enumerate(frames):
        c = riff_chunk(b"00dc", f)
        if audio_chunks:
            c += riff_chunk(b"01wb", bytes([i]) * 7)   # odd size: pad path
        movi = movi + (riff_list(b"rec ", c) if rec_groups else c)
    hdrl = riff_list(b"hdrl", avih(33333, len(frames), 1, w, h) +
                     strl_vids(w, h, len(frames)))
    body = b"AVI " + hdrl + riff_list(b"movi", movi)
    return b"RIFF" + struct.pack("<I", len(body)) + body


def ftyp(brand):
    return box(b"ftyp", brand + struct.pack(">I", 0) + brand + b"mp41")


def mvhd(timescale, duration):
    payload = struct.pack(">B3x", 0)
    payload += struct.pack(">II", 0, 0)
    payload += struct.pack(">II", timescale, duration)
    payload += struct.pack(">I", 0x00010000)
    payload += struct.pack(">H", 0x0100)
    payload += b"\x00" * 10
    payload += struct.pack(">9I", 0x00010000, 0, 0, 0, 0x00010000, 0, 0, 0,
                           0x40000000)
    payload += b"\x00" * 24
    payload += struct.pack(">I", 2)
    return box(b"mvhd", payload)


def tkhd(track_id, duration, w, h):
    payload = struct.pack(">B3x", 0)
    payload += struct.pack(">II", 0, 0)
    payload += struct.pack(">I", track_id)
    payload += b"\x00" * 4
    payload += struct.pack(">I", duration)
    payload += b"\x00" * 8
    payload += struct.pack(">HHHH", 0, 0, 0, 0)
    payload += struct.pack(">9I", 0x00010000, 0, 0, 0, 0x00010000, 0, 0, 0,
                           0x40000000)
    payload += struct.pack(">II", w << 16, h << 16)
    return box(b"tkhd", payload)


def moov(timescale, duration, w, h):
    return box(b"moov", mvhd(timescale, duration) + box(b"trak", tkhd(1, duration, w, h)))


def main(out_dir):
    os.makedirs(out_dir, exist_ok=True)
    # file_name -> (frame specs [(w, h, v)...], wrapper)
    specs = [
        # raw Motion-JPEG elementary streams
        ("s_three_frames.mjpeg", [(24, 16, 0), (24, 16, 128), (24, 16, 255)], "raw"),
        ("s_odd_dims.mjpeg", [(13, 9, 200), (13, 9, 77)], "raw"),
        ("s_single.mjpeg", [(8, 8, 42)], "raw"),
        ("s_wide.mjpeg", [(255, 17, 99), (255, 17, 1)], "raw"),
        ("s_many.mjpeg", [(16, 16, (i * 21) % 256) for i in range(12)], "raw"),
        # MJPEG-in-MP4: plain, largesize, and to-EOF mdat encodings
        ("v_plain_mdat.mp4", [(32, 24, 10), (32, 24, 20), (32, 24, 30)], "mp4"),
        ("v_largesize_mdat.mp4", [(24, 24, 250), (24, 24, 5)], "mp4_largesize"),
        ("v_eof_mdat.mp4", [(40, 8, 123), (40, 8, 7)], "mp4_eof"),
        # MJPEG-in-AVI: plain movi chunks, and OpenDML rec-grouped chunks
        # interleaved with audio chunks (odd sizes exercise RIFF padding)
        ("a_basic.avi", [(32, 24, 50), (32, 24, 150), (32, 24, 250)], "avi"),
        ("a_rec_audio.avi", [(13, 11, 33), (13, 11, 77), (13, 11, 222)], "avi_rec"),
    ]
    rows = ["file_name,frame_no,width,height,channels,n_px,sum_r,sum_g,sum_b"]
    for name, frames, wrapper in specs:
        stream = b"".join(encode_flat_gray(w, h, v) for w, h, v in frames)
        w0, h0 = frames[0][0], frames[0][1]
        if wrapper == "raw":
            data = stream
        elif wrapper == "mp4":
            data = ftyp(b"isom") + moov(1000, 100 * len(frames), w0, h0) + box(b"mdat", stream)
        elif wrapper == "mp4_largesize":
            data = ftyp(b"isom") + moov(1000, 100 * len(frames), w0, h0) + box_largesize(b"mdat", stream)
        elif wrapper == "avi":
            data = avi([encode_flat_gray(w, h, v) for w, h, v in frames], w0, h0)
        elif wrapper == "avi_rec":
            data = avi([encode_flat_gray(w, h, v) for w, h, v in frames], w0, h0,
                       rec_groups=True, audio_chunks=True)
        else:  # mp4_eof: size==0 mdat must be last; moov precedes it
            data = ftyp(b"isom") + moov(1000, 100 * len(frames), w0, h0) + box_to_eof(b"mdat", stream)
        with open(os.path.join(out_dir, name), "wb") as f:
            f.write(data)
        for i, (w, h, v) in enumerate(frames):
            s = w * h * v
            rows.append(f"{name},{i},{w},{h},1,{w * h},{s},{s},{s}")
    # a junk file the scan must DROP (deliberately absent from frames.csv)
    with open(os.path.join(out_dir, "junk_not_a_video.mjpeg"), "wb") as f:
        f.write(b"this is not a motion jpeg stream at all")
    # a stream whose second frame is truncated: only frame 0 is decodable
    good = encode_flat_gray(20, 20, 60)
    cut = encode_flat_gray(20, 20, 61)[: 40]
    with open(os.path.join(out_dir, "s_truncated_tail.mjpeg"), "wb") as f:
        f.write(good + cut)
    rows.append(f"s_truncated_tail.mjpeg,0,20,20,1,400,{400 * 60},{400 * 60},{400 * 60}")
    with open(os.path.join(out_dir, "frames.csv"), "w") as f:
        f.write("\n".join(rows) + "\n")
    print(f"wrote {len(specs) + 2} streams + frames.csv to {out_dir}")


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1
         else "src/test/resources/fixtures/video_frames")
