#!/usr/bin/env python3
"""Audio-fixture generator for the Multimodal WAV decode gate.

Writes deterministic PCM WAVs using ONLY the python stdlib (`wave` +
`struct` — an encoder independent of the JVM's javax.sound.sampled
decoder) plus audio.csv with ground-truth decode stats computed from
the raw sample arrays: sample rate, channel count, bit depth, frame
count, and exact per-channel signed-sample sums (8-bit unsigned WAV
samples are recorded center-shifted, v−128, matching the decoder's
signed view).

Usage: python3 tools/make_audio_fixtures.py [outDir]
Default outDir: src/test/resources/fixtures/audio
"""
import os
import struct
import sys
import warnings
import wave

with warnings.catch_warnings():
    warnings.simplefilter("ignore", DeprecationWarning)
    import aifc


def sample16(i, ch, seed):
    return ((i * 131 + ch * 7919 + seed * 104729) % 65536) - 32768


def sample8(i, seed):
    return (i * 17 + seed * 97) % 256


def main(out_dir: str) -> None:
    os.makedirs(out_dir, exist_ok=True)
    specs = [
        ("m16_8k_100.wav", 1, 2, 8000, 100, 0),
        ("m16_16k_977.wav", 1, 2, 16000, 977, 1),
        ("s16_8k_64.wav", 2, 2, 8000, 64, 2),
        ("s16_44k_333.wav", 2, 2, 44100, 333, 3),
        ("m8_8k_50.wav", 1, 1, 8000, 50, 4),
        ("m16_8k_1.wav", 1, 2, 8000, 1, 5),
        # AIFF: big-endian PCM-16 — exercises the decoder's endian branch
        ("a16_8k_80.aiff", 1, 2, 8000, 80, 6),
        ("a16_22k_33.aiff", 2, 2, 22050, 33, 7),
    ]
    rows = ["file_name,sample_rate,channels,bits,n_frames,sum_l,sum_r"]
    for name, nch, width, rate, nframes, seed in specs:
        aiff = name.endswith(".aiff")
        frames = bytearray()
        sums = [0] * nch
        for i in range(nframes):
            for c in range(nch):
                if width == 2:
                    v = sample16(i, c, seed)
                    frames += struct.pack(">h" if aiff else "<h", v)
                else:
                    raw = sample8(i, seed)
                    frames.append(raw)
                    v = raw - 128  # decoder's signed view
                sums[c] += v
        opener = aifc.open if aiff else wave.open
        with opener(os.path.join(out_dir, name), "wb") as w:
            w.setnchannels(nch)
            w.setsampwidth(width)
            w.setframerate(rate)
            w.writeframes(bytes(frames))
        sum_l = sums[0]
        sum_r = sums[1] if nch > 1 else sums[0]
        rows.append(f"{name},{rate},{nch},{width * 8},{nframes},{sum_l},{sum_r}")
    with open(os.path.join(out_dir, "audio.csv"), "w") as f:
        f.write("\n".join(rows) + "\n")
    print(f"wrote {len(specs)} WAVs + audio.csv to {out_dir}")


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1
         else "src/test/resources/fixtures/audio")
