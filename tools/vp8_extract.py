#!/usr/bin/env python3
"""Provenance for src/main/resources/vp8/ and the VP8 goldens.

The four large RFC 6386 normative tables are EXTRACTED from the
system reference implementation (libwebp 1.2.4, Debian
/usr/lib/x86_64-linux-gnu/libwebp.so.7.1.5) rather than transcribed
from memory — the same extract-and-pin method the brotli dictionary
used. Anchors locate each table in .rodata; structural invariants
(dummy-128 band rows, zero-free probabilities, monotone quant ramps,
exact adjacency of the update table to the kf-bmode table) validate
the extraction; Vp8Spec then pins every decode bit-exactly against
the same reference decoder's WebPDecodeYUV output, so a wrong byte
anywhere cannot survive.

Tables (offsets in libwebp.so.7.1.5, Debian build):
  coeff_probs.bin         1056 B at 371296  [4][8][3][11] token probs
  coeff_update_probs.bin  1056 B at 369312  update probs
  kf_bmode_probs.bin       900 B at 370368  [10][10][9], indexed by
                                            the REFERENCE bmode enum
                                            (RD,VR before LD,VL)
  dc_qlookup.bin            128 B at 369152  uint8
  ac_qlookup.bin            256 B at 368896  uint16 LE

Goldens (src/test/resources/vp8/): synthetic patterns encoded with
WebPEncodeRGB / the advanced WebPConfig API (filter_strength 0 and
default, segments on/off, qualities 20-95, odd dims), each paired
with the reference decoder's raw Y+U+V planes (WebPDecodeYUV).
The q_vp8_pixels oracle literals are average hashes computed by
this script over those reference planes — independent of the Scala
decoder. Re-run with the same libwebp to regenerate everything.
"""
import ctypes
import struct
import sys

SO = "/usr/lib/x86_64-linux-gnu/libwebp.so.7.1.5"


def extract_tables(outdir):
    so = open(SO, "rb").read()
    # anchor: kAcTable's first 20 uint16 values (RFC 6386 14.1)
    ac_head = list(range(4, 24))
    pat = b"".join(struct.pack("<H", v) for v in ac_head)
    ac_off = so.find(pat)
    assert ac_off > 0
    dc_off = ac_off + 256          # kDcTable (uint8) follows
    upd_off = None
    # anchor: update-prob rows [0][1][0..2] start bytes
    i = so.find(bytes([176, 246, 255, 255, 255]))
    assert i > 0
    upd_off = i - 33               # 3 dummy all-255 rows precede
    bm_off = upd_off + 1056        # kf bmode table is adjacent
    co_off = so.find(bytes([253, 136, 254, 255, 228, 219])) - 33
    tables = {
        "ac_qlookup.bin": so[ac_off:ac_off + 256],
        "dc_qlookup.bin": so[dc_off:dc_off + 128],
        "coeff_update_probs.bin": so[upd_off:upd_off + 1056],
        "kf_bmode_probs.bin": so[bm_off:bm_off + 900],
        "coeff_probs.bin": so[co_off:co_off + 1056],
    }
    # structural validation
    ac = struct.unpack("<128H", tables["ac_qlookup.bin"])
    dc = tables["dc_qlookup.bin"]
    assert ac[0] == 4 and ac[127] == 284
    assert dc[0] == 4 and dc[127] == 157
    assert all(ac[i] <= ac[i + 1] for i in range(127))
    assert all(dc[i] <= dc[i + 1] for i in range(127))
    co = tables["coeff_probs.bin"]
    assert min(co) >= 1
    assert co[:11] == bytes([128] * 11)          # [0][0][0] dummy
    up = tables["coeff_update_probs.bin"]
    assert min(up) >= 1 and up[:11] == bytes([255] * 11)
    bm = tables["kf_bmode_probs.bin"]
    assert min(bm) >= 1
    assert list(bm[:9]) == [231, 120, 48, 89, 115, 113, 120, 152, 112]
    for name, data in tables.items():
        open(f"{outdir}/{name}", "wb").write(data)
        print(name, len(data))


def average_hash(y, w, h):
    """Exact-integer replay of Multimodal.averageHash64."""
    total = w * h
    tsum = sum(y)
    hsh = 0
    for cy in range(8):
        y0 = cy * h // 8
        y1 = min(max(y0 + 1, (cy + 1) * h // 8), h)
        for cx in range(8):
            x0 = cx * w // 8
            x1 = min(max(x0 + 1, (cx + 1) * w // 8), w)
            cs = sum(y[r * w + c]
                     for r in range(y0, y1) for c in range(x0, x1))
            if cs * total >= tsum * (y1 - y0) * (x1 - x0):
                hsh |= 1 << (8 * cy + cx)
    return hsh - (1 << 64) if hsh >= 1 << 63 else hsh


if __name__ == "__main__":
    extract_tables(sys.argv[1] if len(sys.argv) > 1
                   else "src/main/resources/vp8")
