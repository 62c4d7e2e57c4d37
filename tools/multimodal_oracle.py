#!/usr/bin/env python3
"""Independent multimodal-decode oracle.

Re-derives the expected output of `q_multimodal_pipeline` WITHOUT
touching the Scala codecs: every payload in the on-disk media corpus
(`$TMPDIR/graft_media_corpus_v1_300`, written once by
`MultimodalOps.persistedCorpus`) is decoded by pure-Python
implementations of the same PUBLIC formats —

  - PNG:       stdlib zlib inflate + the five RFC 2083 scanline filters;
  - JPEG:      a hand-written baseline decoder (DQT/DHT/SOF0/SOS parse,
               canonical Huffman, dequant, and the libjpeg
               `jpeg_idct_islow` fixed-point IDCT — the algorithm the
               JDK's bundled libjpeg runs, so pixels match bit-exactly);
  - WAV:       RIFF chunk walk + PCM-16 / G.711 u-law / G.711 A-law /
               IMA ADPCM transcoding from the public ITU-T G.711 and
               IMA-1992 tables;
  - Y4M:       YUV4MPEG2 stream-header + FRAME-section demux;
  - MJPEG AVI: RIFF/AVI chunk walk yielding per-frame JPEG bitstreams.

From the decoded planes it computes the pipeline's 16-bin histogram
feature (float32 math, mirroring Spark's Float arithmetic), the
HALF_UP 4-decimal round of bin 0, and the sampled frame counts, then
writes tools/golden/multimodal_pipeline.csv for the DuckDB oracle to
SELECT. `GoldenMultimodalSpec` pins the Spark pipeline against the
same committed file at test time.

Uses pyarrow/numpy (driver-side tooling, like verify_local.py); the
codecs themselves are stdlib-only.

Usage: python3 tools/multimodal_oracle.py [--check]
"""
import csv
import io
import os
import struct
import sys
import tempfile
import zlib
from decimal import Decimal, ROUND_HALF_UP

import numpy as np
import pyarrow.parquet as pq

GOLDEN = os.path.join(os.path.dirname(os.path.abspath(__file__)), "golden")


# ------------------------------------------------------------------- PNG

def decode_png(data):
    """8-bit grayscale PNG -> flat pixel list (RFC 2083: IHDR parse,
    IDAT inflate, per-scanline filter reconstruction)."""
    assert data[:8] == b"\x89PNG\r\n\x1a\n", "not a PNG"
    pos, idat, w, h, depth, ctype, interlace = 8, b"", 0, 0, 0, 0, 0
    while pos < len(data):
        ln, typ = struct.unpack(">I4s", data[pos:pos + 8])
        body = data[pos + 8:pos + 8 + ln]
        if typ == b"IHDR":
            w, h, depth, ctype, _, _, interlace = struct.unpack(
                ">IIBBBBB", body)
        elif typ == b"IDAT":
            idat += body
        elif typ == b"IEND":
            break
        pos += 12 + ln
    assert depth == 8 and ctype == 0 and interlace == 0, \
        f"only 8-bit gray non-interlaced handled (got {depth}/{ctype})"
    raw = zlib.decompress(idat)
    stride = w  # one byte per pixel
    out = bytearray(w * h)
    prev = bytearray(w)
    p = 0
    for y in range(h):
        filt = raw[p]
        line = bytearray(raw[p + 1:p + 1 + stride])
        p += 1 + stride
        if filt == 1:  # Sub
            for x in range(1, w):
                line[x] = (line[x] + line[x - 1]) & 0xFF
        elif filt == 2:  # Up
            for x in range(w):
                line[x] = (line[x] + prev[x]) & 0xFF
        elif filt == 3:  # Average
            for x in range(w):
                a = line[x - 1] if x else 0
                line[x] = (line[x] + ((a + prev[x]) >> 1)) & 0xFF
        elif filt == 4:  # Paeth
            for x in range(w):
                a = line[x - 1] if x else 0
                b, c = prev[x], (prev[x - 1] if x else 0)
                pp = a + b - c
                pa, pb, pc = abs(pp - a), abs(pp - b), abs(pp - c)
                pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                line[x] = (line[x] + pred) & 0xFF
        else:
            assert filt == 0, f"bad filter {filt}"
        out[y * w:(y + 1) * w] = line
        prev = line
    return list(out), w, h


# ------------------------------------------------------------------ JPEG

# libjpeg jidctint.c fixed-point constants (CONST_BITS=13).
_F = {298631336: 2446, 390180644: 3196, 541196100: 4433, 765366865: 6270,
      899976223: 7373, 1175875602: 9633, 1501321110: 12299,
      1847759065: 15137, 1961570560: 16069, 2053119869: 16819,
      2562915447: 20995, 3072711026: 25172}
CONST_BITS, PASS1_BITS = 13, 2

ZIGZAG = [0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
          12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
          35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
          58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63]


def _descale(x, n):
    return (x + (1 << (n - 1))) >> n


def idct_islow(block):
    """libjpeg's jpeg_idct_islow on one dequantized 8x8 block (natural
    order), returning level-shifted clamped samples row-major."""
    ws = [0] * 64
    for c in range(8):  # pass 1: columns
        if (block[8 + c] | block[16 + c] | block[24 + c] | block[32 + c]
                | block[40 + c] | block[48 + c] | block[56 + c]) == 0:
            dc = block[c] << PASS1_BITS
            for r in range(8):
                ws[r * 8 + c] = dc
            continue
        z2, z3 = block[16 + c], block[48 + c]
        z1 = (z2 + z3) * _F[541196100]
        tmp2 = z1 + z3 * -_F[1847759065]
        tmp3 = z1 + z2 * _F[765366865]
        z2, z3 = block[c], block[32 + c]
        tmp0 = (z2 + z3) << CONST_BITS
        tmp1 = (z2 - z3) << CONST_BITS
        t10, t13 = tmp0 + tmp3, tmp0 - tmp3
        t11, t12 = tmp1 + tmp2, tmp1 - tmp2
        tmp0, tmp1 = block[56 + c], block[40 + c]
        tmp2, tmp3 = block[24 + c], block[8 + c]
        z1, z2 = tmp0 + tmp3, tmp1 + tmp2
        z3, z4 = tmp0 + tmp2, tmp1 + tmp3
        z5 = (z3 + z4) * _F[1175875602]
        tmp0 *= _F[298631336]
        tmp1 *= _F[2053119869]
        tmp2 *= _F[3072711026]
        tmp3 *= _F[1501321110]
        z1 *= -_F[899976223]
        z2 *= -_F[2562915447]
        z3 = z3 * -_F[1961570560] + z5
        z4 = z4 * -_F[390180644] + z5
        tmp0 += z1 + z3
        tmp1 += z2 + z4
        tmp2 += z2 + z3
        tmp3 += z1 + z4
        ws[c] = _descale(t10 + tmp3, CONST_BITS - PASS1_BITS)
        ws[56 + c] = _descale(t10 - tmp3, CONST_BITS - PASS1_BITS)
        ws[8 + c] = _descale(t11 + tmp2, CONST_BITS - PASS1_BITS)
        ws[48 + c] = _descale(t11 - tmp2, CONST_BITS - PASS1_BITS)
        ws[16 + c] = _descale(t12 + tmp1, CONST_BITS - PASS1_BITS)
        ws[40 + c] = _descale(t12 - tmp1, CONST_BITS - PASS1_BITS)
        ws[24 + c] = _descale(t13 + tmp0, CONST_BITS - PASS1_BITS)
        ws[32 + c] = _descale(t13 - tmp0, CONST_BITS - PASS1_BITS)
    out = [0] * 64

    def clamp(x):
        x += 128
        return 0 if x < 0 else (255 if x > 255 else x)

    for r in range(8):  # pass 2: rows
        o = r * 8
        z2, z3 = ws[o + 2], ws[o + 6]
        z1 = (z2 + z3) * _F[541196100]
        tmp2 = z1 + z3 * -_F[1847759065]
        tmp3 = z1 + z2 * _F[765366865]
        z2, z3 = ws[o], ws[o + 4]
        tmp0 = (z2 + z3) << CONST_BITS
        tmp1 = (z2 - z3) << CONST_BITS
        t10, t13 = tmp0 + tmp3, tmp0 - tmp3
        t11, t12 = tmp1 + tmp2, tmp1 - tmp2
        tmp0, tmp1 = ws[o + 7], ws[o + 5]
        tmp2, tmp3 = ws[o + 3], ws[o + 1]
        z1, z2 = tmp0 + tmp3, tmp1 + tmp2
        z3, z4 = tmp0 + tmp2, tmp1 + tmp3
        z5 = (z3 + z4) * _F[1175875602]
        tmp0 *= _F[298631336]
        tmp1 *= _F[2053119869]
        tmp2 *= _F[3072711026]
        tmp3 *= _F[1501321110]
        z1 *= -_F[899976223]
        z2 *= -_F[2562915447]
        z3 = z3 * -_F[1961570560] + z5
        z4 = z4 * -_F[390180644] + z5
        tmp0 += z1 + z3
        tmp1 += z2 + z4
        tmp2 += z2 + z3
        tmp3 += z1 + z4
        sh = CONST_BITS + PASS1_BITS + 3
        out[o] = clamp(_descale(t10 + tmp3, sh))
        out[o + 7] = clamp(_descale(t10 - tmp3, sh))
        out[o + 1] = clamp(_descale(t11 + tmp2, sh))
        out[o + 6] = clamp(_descale(t11 - tmp2, sh))
        out[o + 2] = clamp(_descale(t12 + tmp1, sh))
        out[o + 5] = clamp(_descale(t12 - tmp1, sh))
        out[o + 3] = clamp(_descale(t13 + tmp0, sh))
        out[o + 4] = clamp(_descale(t13 - tmp0, sh))
    return out


class _Bits:
    """Entropy-coded-segment bit reader with 0xFF00 byte unstuffing."""

    def __init__(self, data, pos):
        self.d, self.pos, self.buf, self.n = data, pos, 0, 0

    def bit(self):
        if self.n == 0:
            b = self.d[self.pos]
            self.pos += 1
            if b == 0xFF:
                m = self.d[self.pos]
                self.pos += 1
                assert m == 0x00, f"marker 0xFF{m:02x} inside scan"
            self.buf, self.n = b, 8
        self.n -= 1
        return (self.buf >> self.n) & 1

    def bits(self, k):
        v = 0
        for _ in range(k):
            v = (v << 1) | self.bit()
        return v


def _receive_extend(bits, s):
    v = bits.bits(s)
    return v if s == 0 or v >= (1 << (s - 1)) else v - (1 << s) + 1


def _build_huff(counts, values):
    """Canonical Huffman: (code,length) -> value lookup dict."""
    table, code, k = {}, 0, 0
    for ln in range(1, 17):
        for _ in range(counts[ln - 1]):
            table[(ln, code)] = values[k]
            code += 1
            k += 1
        code <<= 1
    return table


def _huff_decode(bits, table):
    code, ln = 0, 0
    while ln < 16:
        code = (code << 1) | bits.bit()
        ln += 1
        if (ln, code) in table:
            return table[(ln, code)]
    raise AssertionError("bad Huffman code")


def decode_jpeg(data):
    """Baseline grayscale JPEG -> flat pixel list (one component,
    no subsampling — the shape the corpus writer emits)."""
    assert data[:2] == b"\xff\xd8", "not a JPEG"
    pos, qt, hdc, hac, w, h = 2, {}, {}, {}, 0, 0
    qt_id = dc_id = ac_id = 0
    restart = 0
    while pos < len(data):
        assert data[pos] == 0xFF, f"expected marker at {pos}"
        m = data[pos + 1]
        pos += 2
        if m == 0xD9:
            break
        ln = struct.unpack(">H", data[pos:pos + 2])[0]
        body = data[pos + 2:pos + ln]
        if m == 0xDB:  # DQT
            b = 0
            while b < len(body):
                pq_, tq = body[b] >> 4, body[b] & 0x0F
                assert pq_ == 0, "16-bit quant tables unhandled"
                qt[tq] = list(body[b + 1:b + 65])
                b += 65
        elif m == 0xC4:  # DHT
            b = 0
            while b < len(body):
                tc, th = body[b] >> 4, body[b] & 0x0F
                counts = list(body[b + 1:b + 17])
                nv = sum(counts)
                vals = list(body[b + 17:b + 17 + nv])
                (hdc if tc == 0 else hac)[th] = _build_huff(counts, vals)
                b += 17 + nv
        elif m == 0xC0:  # SOF0 baseline
            prec, h, w, nc = body[0], *struct.unpack(">HH", body[1:5]), body[5]
            assert prec == 8 and nc == 1, "grayscale baseline only"
            hv, qt_id = body[7], body[8]
            assert hv == 0x11, "no subsampling for 1 component"
        elif m in (0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA,
                   0xCB, 0xCD, 0xCE, 0xCF):
            raise AssertionError(f"non-baseline SOF 0xFF{m:02x}")
        elif m == 0xDD:  # DRI
            restart = struct.unpack(">H", body[:2])[0]
        elif m == 0xDA:  # SOS
            assert body[0] == 1
            dc_id, ac_id = body[2] >> 4, body[2] & 0x0F
            pos += ln
            break
        pos += ln
    assert w and h and qt_id in qt, "incomplete JPEG header"
    q = qt[qt_id]
    bx, by = (w + 7) // 8, (h + 7) // 8
    plane = [[0] * (bx * 8) for _ in range(by * 8)]
    bits = _Bits(data, pos)
    pred, mcu = 0, 0
    for yb in range(by):
        for xb in range(bx):
            if restart and mcu and mcu % restart == 0:
                # byte-align and consume RSTn
                bits.n = 0
                assert bits.d[bits.pos] == 0xFF
                assert 0xD0 <= bits.d[bits.pos + 1] <= 0xD7
                bits.pos += 2
                pred = 0
            s = _huff_decode(bits, hdc[dc_id])
            pred += _receive_extend(bits, s) if s else 0
            coef = [0] * 64
            coef[0] = pred * q[0]
            k = 1
            while k < 64:
                rs = _huff_decode(bits, hac[ac_id])
                r, s = rs >> 4, rs & 0x0F
                if s == 0:
                    if r != 15:
                        break  # EOB
                    k += 16
                else:
                    k += r
                    coef[ZIGZAG[k]] = _receive_extend(bits, s) * q[k]
                    k += 1
            px = idct_islow(coef)
            for yy in range(8):
                row = plane[yb * 8 + yy]
                for xx in range(8):
                    row[xb * 8 + xx] = px[yy * 8 + xx]
            mcu += 1
    return [plane[y][x] for y in range(h) for x in range(w)], w, h


# ------------------------------------------------------------------- WAV

def ulaw_to_linear(u):
    u = ~u & 0xFF
    mag = (((u & 0x0F) << 3) + 0x84 << ((u >> 4) & 0x07)) - 0x84
    return -mag if u & 0x80 else mag


def alaw_to_linear(a):
    a = (a ^ 0x55) & 0xFF
    seg, man = (a >> 4) & 0x07, a & 0x0F
    m13 = (man << 1) + 1 if seg == 0 else ((man << 1) + 1 + 0x20) << (seg - 1)
    mag = m13 << 3
    return mag if a & 0x80 else -mag


IMA_STEP = [7, 8, 9, 10, 11, 12, 13, 14, 16, 17, 19, 21, 23, 25, 28, 31,
            34, 37, 41, 45, 50, 55, 60, 66, 73, 80, 88, 97, 107, 118, 130,
            143, 157, 173, 190, 209, 230, 253, 279, 307, 337, 371, 408,
            449, 494, 544, 598, 658, 724, 796, 876, 963, 1060, 1166, 1282,
            1411, 1552, 1707, 1878, 2066, 2272, 2499, 2749, 3024, 3327,
            3660, 4026, 4428, 4871, 5358, 5894, 6484, 7132, 7845, 8630,
            9493, 10442, 11487, 12635, 13899, 15289, 16818, 18500, 20350,
            22385, 24623, 27086, 29794, 32767]
IMA_INDEX = [-1, -1, -1, -1, 2, 4, 6, 8, -1, -1, -1, -1, 2, 4, 6, 8]


def ima_decode(data, n_samples, block_bytes):
    spb = (block_bytes - 4) * 2 + 1
    out, b = [], 0
    while len(out) < n_samples:
        base = b * block_bytes
        pred = struct.unpack("<h", data[base:base + 2])[0]
        index = min(88, max(0, data[base + 2]))
        out.append(pred)
        pos, low, i = base + 4, True, 1
        while i < spb and len(out) < n_samples:
            code = data[pos] & 0x0F if low else (data[pos] >> 4) & 0x0F
            if not low:
                pos += 1
            low = not low
            step = IMA_STEP[index]
            vp = step >> 3
            if code & 4:
                vp += step
            if code & 2:
                vp += step >> 1
            if code & 1:
                vp += step >> 2
            pred = pred - vp if code & 8 else pred + vp
            pred = max(-32768, min(32767, pred))
            index = min(88, max(0, index + IMA_INDEX[code]))
            out.append(pred)
            i += 1
        b += 1
    return out


def decode_wav(data):
    """RIFF/WAVE -> linear PCM-16 sample list (mono; tags 1/6/7/0x11)."""
    assert data[:4] == b"RIFF" and data[8:12] == b"WAVE", "not a WAV"
    pos, tag, spb, raw, fact = 12, -1, -1, None, -1
    while pos + 8 <= len(data):
        cid = data[pos:pos + 4]
        ln = struct.unpack("<I", data[pos + 4:pos + 8])[0]
        body = data[pos + 8:pos + 8 + ln]
        if cid == b"fmt ":
            tag, ch = struct.unpack("<HH", body[0:4])
            assert ch == 1, "mono only"
            if tag == 0x11:
                spb = struct.unpack("<H", body[18:20])[0]
        elif cid == b"fact" and ln >= 4:
            fact = struct.unpack("<I", body[:4])[0]
        elif cid == b"data":
            raw = body
        pos += 8 + ln + (ln % 2)
    assert tag >= 0 and raw is not None, "missing fmt/data"
    if tag == 1:
        return list(struct.unpack(f"<{len(raw) // 2}h", raw))
    if tag == 7:
        return [ulaw_to_linear(b) for b in raw]
    if tag == 6:
        return [alaw_to_linear(b) for b in raw]
    if tag == 0x11:
        assert fact >= 0 and spb > 0, "ADPCM needs fact + samplesPerBlock"
        return ima_decode(raw, fact, (spb - 1) // 2 + 4)
    raise AssertionError(f"unsupported WAV tag {tag}")


# ----------------------------------------------------------------- video

def decode_y4m(data):
    nl = data.index(b"\n")
    toks = data[:nl].decode("ascii").split(" ")
    assert toks[0] == "YUV4MPEG2", "not Y4M"
    w = h = -1
    fn, fd, cs = 25, 1, "C420"
    for t in toks[1:]:
        if not t:
            continue
        if t[0] == "W":
            w = int(t[1:])
        elif t[0] == "H":
            h = int(t[1:])
        elif t[0] == "F":
            fn, fd = map(int, t[1:].split(":"))
        elif t[0] == "C":
            cs = t
    luma = w * h
    chroma = (0 if cs == "Cmono"
              else (w // 2) * (h // 2) * 2 if cs.startswith("C420")
              else (w // 2) * h * 2 if cs.startswith("C422")
              else w * h * 2)
    frames, pos = [], nl + 1
    while pos < len(data):
        eol = data.index(b"\n", pos)
        assert data[pos:eol].startswith(b"FRAME")
        p = eol + 1
        frames.append(list(data[p:p + luma]))
        pos = p + luma + chroma
    return frames, w, h, fn, fd


def demux_avi(data):
    assert data[:4] == b"RIFF" and data[8:12] == b"AVI ", "not an AVI"
    geom = {"w": -1, "h": -1, "fn": 25, "fd": 1}
    frames = []

    def walk(a, b):
        pos = a
        while pos + 8 <= b:
            cid = data[pos:pos + 4]
            ln = struct.unpack("<I", data[pos + 4:pos + 8])[0]
            body = pos + 8
            if cid == b"LIST":
                walk(body + 4, body + ln)
            elif cid == b"strh" and data[body:body + 4] == b"vids":
                geom["fd"], geom["fn"] = struct.unpack(
                    "<II", data[body + 20:body + 28])
            elif cid == b"strf" and geom["w"] < 0:
                geom["w"], geom["h"] = struct.unpack(
                    "<II", data[body + 4:body + 12])
            elif cid[2:] in (b"dc", b"db"):
                frames.append(bytes(data[body:body + ln]))
            pos = body + ln + (ln % 2)

    total = struct.unpack("<I", data[4:8])[0]
    walk(12, 12 + total - 4)
    return frames, geom


# ---------------------------------------------------------------- pipeline

def media_plane(kind, content):
    """Decoded feature plane + frame count, mirroring the pipeline's
    per-kind dispatch."""
    content = bytes(content)
    if kind == "image":
        if content[:2] == b"\xff\xd8":
            px, _, _ = decode_jpeg(content)
        else:
            px, _, _ = decode_png(content)
        return px, None
    if kind == "audio":
        samples = decode_wav(content)
        return [(s >> 8) + 128 for s in samples], None
    # video
    if content[:4] == b"RIFF":
        jpegs, geom = demux_avi(content)
        frames = [decode_jpeg(j)[0] for j in jpegs]
        frame_ms = 1000 * geom["fd"] // geom["fn"]
    else:
        frames, w, h, fn, fd = decode_y4m(content)
        frame_ms = 1000 * fd // fn
    plane = [v for f in frames for v in f]
    stride = max(1000 // frame_ms, 1) if frame_ms else 1
    n_sampled = len(range(0, len(frames), stride))
    return plane, n_sampled


def f0_of(plane):
    """Spark twin: Float histogram, bin0/total in float32, cast to
    double, round(_, 4) HALF_UP."""
    h0 = sum(1 for v in plane if v // 16 == 0)
    f = np.float32(np.float32(h0) / np.float32(max(len(plane), 1)))
    return float(Decimal(float(f)).quantize(Decimal("0.0001"),
                                            rounding=ROUND_HALF_UP))


def main(check=False):
    corpus = os.path.join(tempfile.gettempdir(), "graft_media_corpus_v1_300")
    if not os.path.isdir(corpus):
        raise SystemExit(f"{corpus} missing — run the Spark pipeline once "
                         "(e.g. sbt 'runMain graft.Verify ... q_multimodal')")
    t = pq.read_table(corpus).to_pylist()
    rows = []
    for r in sorted(t, key=lambda r: r["media_id"]):
        plane, n_sampled = media_plane(r["kind"], r["content"])
        rows.append({
            "media_id": r["media_id"], "kind": r["kind"], "dim": 16,
            "f0": repr(f0_of(plane)),
            "n_frames": n_sampled if n_sampled is not None else 0})
    path = os.path.join(GOLDEN, "multimodal_pipeline.csv")
    buf = io.StringIO()
    w = csv.DictWriter(buf, fieldnames=["media_id", "kind", "dim", "f0",
                                        "n_frames"], lineterminator="\n")
    w.writeheader()
    w.writerows(rows)
    data = buf.getvalue()
    if check:
        with open(path) as fh:
            if fh.read() != data:
                raise SystemExit(f"GOLDEN DRIFT: {path} differs — "
                                 "rerun tools/multimodal_oracle.py")
        print(f"ok {path} ({len(rows)} rows)")
    else:
        os.makedirs(GOLDEN, exist_ok=True)
        with open(path, "w") as fh:
            fh.write(data)
        print(f"wrote {path} ({len(rows)} rows)")


if __name__ == "__main__":
    main(check="--check" in sys.argv[1:])
