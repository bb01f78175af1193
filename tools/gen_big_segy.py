#!/usr/bin/env python3
"""GB-scale foreign SEG-Y survey generator (stdlib only).

The committed golden fixtures (gen_golden_segy.py) are 25-trace files;
the reference's own end-to-end anchor is a full 3-D survey ingested and
byte-compared after export (tests/integration/test_segy_roundtrip_teapot
.py:151-310). This script synthesizes that scale AT TEST TIME — the file
is never committed — with every sample derived from one closed-form
formula, so a verifier can byte-check ANY region without reading the
whole file:

    v(il, xl, j) = ((il*31 + xl*7 + j) % 65536) - 32768 + 0.5   (j 0-based)

All values are half-integers < 2^16: exactly representable in IEEE
float32, so encode/decode must be bit-perfect with no tolerance.

Layout: standard SEG-Y rev 1, format 5 (IEEE float32 big-endian),
EBCDIC text header, inline at bytes 189-192, crossline at 193-196,
traces in (il, xl) row-major order. il in [2000, 2000+nIl),
xl in [500, 500+nXl).

usage: gen_big_segy.py OUT [nIl nXl ns]     (default 415 415 1500 ~ 1.0 GiB)
Checked by: src/test/scala/graft/sources/BigSurveyIntegrationSpec.scala
(gated behind SPARK_GRAFT_BIG_FIXTURE=1 — the nightly tier).
"""
import struct
import sys

IL0, XL0 = 2000, 500
MOD = 65536

def main():
    out = sys.argv[1]
    n_il = int(sys.argv[2]) if len(sys.argv) > 2 else 415
    n_xl = int(sys.argv[3]) if len(sys.argv) > 3 else 415
    ns = int(sys.argv[4]) if len(sys.argv) > 4 else 1500

    cards = ["C 1 FOREIGN GB-SCALE SYNTHETIC SURVEY - INDEPENDENT PYTHON ENCODER",
             f"C 2 {n_il} INLINES X {n_xl} CROSSLINES X {ns} SAMPLES, FORMAT 5 IEEE",
             "C 3 V(IL,XL,J) = ((IL*31 + XL*7 + J) MOD 65536) - 32768 + 0.5"]
    cards += [f"C{n:2d}" for n in range(4, 41)]
    text = "".join(c.ljust(80)[:80] for c in cards[:40]).encode("cp037")
    assert len(text) == 3200

    bin_hdr = bytearray(400)
    struct.pack_into(">H", bin_hdr, 16, 2000)     # sample interval (us)
    struct.pack_into(">H", bin_hdr, 20, ns)       # samples per trace
    struct.pack_into(">H", bin_hdr, 24, 5)        # format 5 = IEEE float32
    struct.pack_into(">H", bin_hdr, 300, 0x0100)  # rev 1.0

    # one packed master array: master[4k:4k+4] encodes (k % MOD) - 32768 + .5
    # — every trace's payload is then a pure byte SLICE (b = phase index)
    master = b"".join(struct.pack(">f", (k % MOD) - 32768 + 0.5)
                      for k in range(MOD + ns))

    with open(out, "wb") as f:
        f.write(text)
        f.write(bin_hdr)
        seq = 0
        for il in range(IL0, IL0 + n_il):
            rows = []
            for xl in range(XL0, XL0 + n_xl):
                seq += 1
                th = bytearray(240)
                struct.pack_into(">i", th, 0, seq)        # trace seq in line
                struct.pack_into(">h", th, 28, 1)         # trace id: live
                struct.pack_into(">H", th, 114, ns)       # n_samples
                struct.pack_into(">H", th, 116, 2000)     # sample interval
                struct.pack_into(">i", th, 188, il)       # inline 189-192
                struct.pack_into(">i", th, 192, xl)       # crossline 193-196
                b = (il * 31 + xl * 7) % MOD
                rows.append(bytes(th) + master[4 * b: 4 * (b + ns)])
            f.write(b"".join(rows))

    size = 3600 + n_il * n_xl * (240 + 4 * ns)
    print(f"wrote {out}: {size} bytes, {n_il * n_xl} traces x {ns} IEEE32 samples")

if __name__ == "__main__":
    main()
