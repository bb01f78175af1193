#!/usr/bin/env python3
"""Foreign-written golden SEG-Y fixture generator.

Every byte-level check in the repo otherwise reads files the engine's own
writer produced, so complementary encode/decode bugs (both sides wrong the
same way) are invisible to self-roundtrips. This script is an INDEPENDENT
implementation of the public SEG-Y rev-1 layout, written from the spec in
Python stdlib only:

  * EBCDIC text header via the stdlib cp037 codec (the Scala engine uses
    the JDK IBM037 charset - independent codec tables);
  * IBM System/360 hexadecimal float encoding done in exact rational
    arithmetic (fractions.Fraction), normalized per the spec: sign bit,
    7-bit excess-64 base-16 exponent, 24-bit mantissa in [1/16, 1);
  * big-endian struct packing for all header words.

All sample values are chosen to be EXACTLY representable in IBM32 (dyadic,
<= 24 significant mantissa bits after hex normalization), so any correct
encoder must produce these exact bytes and any correct decoder must
recover these exact float values - no tolerance anywhere.

Output (committed): src/test/resources/golden/foreign_rev1_ibm.sgy
Checked by: src/test/scala/graft/sources/GoldenForeignSpec.scala, which
inlines the expected text-header lines, binary-header fields, trace
headers and sample values.
"""
import struct
from fractions import Fraction

OUT = "src/test/resources/golden/foreign_rev1_ibm.sgy"

# ----------------------------------------------------------- IBM32 encode
def ibm32(x):
    """IBM hex float32 bytes of x; x must be exactly representable."""
    if x == 0.0:
        return struct.pack(">I", 0)
    sign = 0x80000000 if x < 0 else 0
    m = Fraction(abs(x))  # exact: x is a Python float read losslessly
    e = 0
    while m >= 1:
        m /= 16
        e += 1
    while m < Fraction(1, 16):
        m *= 16
        e -= 1
    mant = m * (1 << 24)
    if mant.denominator != 1:
        raise ValueError(f"{x} is not exactly representable in IBM32")
    return struct.pack(">I", sign | ((e + 64) << 24) | int(mant))


# ------------------------------------------------------------ text header
# 40 cards x 80 cols, EBCDIC (cp037). Distinct phrasing from anything the
# engine writes, so a decode bug can't be masked by familiar content.
CARDS = [
    "C 1 FOREIGN GOLDEN FIXTURE - WRITTEN BY AN INDEPENDENT PYTHON ENCODER",
    "C 2 SURVEY: SYNTHETIC CROSSCHECK LINE 7",
    "C 3 25 TRACES, 8 SAMPLES/TRACE, FORMAT 1 (IBM FLOAT), 4 MS",
    "C 4 INLINE BYTES 189-192, CROSSLINE BYTES 193-196",
    "C 5 COORD SCALAR -100 AT BYTES 71-72",
]
CARDS += [f"C{n:2d}" for n in range(6, 40)]
CARDS += ["C40 END EBCDIC"]
assert len(CARDS) == 40
text = "".join(c.ljust(80)[:80] for c in CARDS)
assert len(text) == 3200
text_hdr = text.encode("cp037")

# ---------------------------------------------------------- binary header
NS, INTERVAL, FMT = 8, 4000, 1
bin_hdr = bytearray(400)
struct.pack_into(">i", bin_hdr, 0, 7001)       # job id (bytes 3201-3204)
struct.pack_into(">i", bin_hdr, 4, 7)          # line number
struct.pack_into(">H", bin_hdr, 16, INTERVAL)  # sample interval (3217-18)
struct.pack_into(">H", bin_hdr, 20, NS)        # samples per trace (3221-22)
struct.pack_into(">H", bin_hdr, 24, FMT)       # format code (3225-26)
struct.pack_into(">H", bin_hdr, 300, 0x0100)   # rev 1.0 (3501-02)

# ---------------------------------------------------------------- traces
# Exactly-representable IBM32 values covering: zero, +-integers, dyadic
# fractions, hex-power boundaries, large/small exponents, full-mantissa.
BASE = [0.0, 1.0, -1.0, 118.625, -0.15625, 4096.0,
        1.52587890625e-05, -1048576.0]
EXTRA = [0.5, -0.25, 16.0, -256.0, 0.0009765625, 3.5, -0.6875, 2097152.0]

def samples_for(i):
    # rotate through both banks so every value appears at several positions
    pool = BASE if i % 2 == 0 else EXTRA
    return [pool[(j + i) % 8] for j in range(NS)]

records = bytearray()
for i in range(25):
    th = bytearray(240)
    struct.pack_into(">i", th, 0, i + 1)            # trace_seq_line 1-4
    struct.pack_into(">i", th, 8, 9000 + i)         # field_record 9-12
    struct.pack_into(">i", th, 12, i % 5 + 1)       # trace_field 13-16
    struct.pack_into(">i", th, 16, 300 + i // 5)    # source_point 17-20
    struct.pack_into(">h", th, 28, 1)               # trace_id_code 29-30
    struct.pack_into(">i", th, 36, 25 * (i % 5))    # offset 37-40
    struct.pack_into(">h", th, 70, -100)            # coord_scalar 71-72
    struct.pack_into(">i", th, 72, -6200000 - i)    # source_x 73-76
    struct.pack_into(">i", th, 76, 5300000 + 2 * i)  # source_y 77-80
    struct.pack_into(">H", th, 114, NS)             # n_samples 115-116
    struct.pack_into(">H", th, 116, INTERVAL)       # sample_interval 117-118
    struct.pack_into(">i", th, 188, 1700 + i // 5)  # inline 189-192
    struct.pack_into(">i", th, 192, 880 + i % 5)    # crossline 193-196
    records += th
    for v in samples_for(i):
        records += ibm32(v)

with open(OUT, "wb") as f:
    f.write(text_hdr)
    f.write(bin_hdr)
    f.write(records)

print(f"wrote {OUT}: {3600 + len(records)} bytes, 25 traces x {NS} IBM32 samples")

# ------------------------------------------------- extended-header fixture
# A second foreign file exercising rev-1 EXTENDED textual headers (bytes
# 3505-3506 declare N additional 3200-byte records before the first
# trace): format 5 (IEEE32), 2 extended headers, 10 traces x 4 samples.
OUT_EXT = "src/test/resources/golden/foreign_rev1_ext.sgy"
NS_E, FMT_E, N_EXT = 4, 5, 2
bin_e = bytearray(400)
struct.pack_into(">H", bin_e, 16, 2000)     # sample interval
struct.pack_into(">H", bin_e, 20, NS_E)     # samples per trace
struct.pack_into(">H", bin_e, 24, FMT_E)    # format 5 = IEEE float32
struct.pack_into(">h", bin_e, 304, N_EXT)   # extended text headers (3505-06)
struct.pack_into(">H", bin_e, 300, 0x0100)  # rev 1.0
ext_cards = ["C 1 EXTENDED HEADER STANZA %d OF 2 - MUST BE SKIPPED BY READERS" % k
             for k in (1, 2)]
with open(OUT_EXT, "wb") as f:
    f.write(text_hdr)  # reuse the EBCDIC primary header
    f.write(bin_e)
    for card in ext_cards:
        f.write("".join(c.ljust(80)[:80] for c in
                        [card] + [""] * 39).encode("cp037"))
    for i in range(10):
        th = bytearray(240)
        struct.pack_into(">i", th, 188, 4000 + i)   # inline
        struct.pack_into(">i", th, 192, 70 + i)     # crossline
        f.write(th)
        for j in range(NS_E):
            f.write(struct.pack(">f", float(100 * i + j) + 0.25))
print(f"wrote {OUT_EXT}: {3600 + N_EXT * 3200 + 10 * (240 + NS_E * 4)} bytes, "
      f"{N_EXT} extended headers, 10 traces x {NS_E} IEEE32 samples")

# ---------------------------------------------- IBM32 cross-check vectors
# 1000 seeded-random values exactly representable in BOTH IBM32 and
# float32 (24-bit normalized mantissa; hex exponent chosen so the value
# stays a NORMAL float32), written as `float32_bits_hex,ibm32_hex` lines.
# IbmCrosscheckSpec replays them: the engine's decoder must produce the
# float bit-pattern and its encoder must reproduce the IBM word - both
# against THIS independent encoder, not the engine's own inverse.
import random
import struct as _st

OUT_CSV = "src/test/resources/golden/ibm32_crosscheck.csv"
rng = random.Random(0x1B3C)
lines = []
for _ in range(1000):
    e = rng.randint(-25, 30)          # value in [2^-104, 2^120): normal f32
    mant = rng.randint(1 << 20, (1 << 24) - 1)  # normalized: top hex nonzero
    sign = rng.choice([1.0, -1.0])
    val = sign * mant * (16.0 ** e) / float(1 << 24)
    f32 = _st.unpack(">f", _st.pack(">f", val))[0]
    assert f32 == val, (mant, e)      # exactly representable in float32
    ibm = ibm32(val)
    fbits = _st.pack(">f", val).hex()
    lines.append(f"{fbits},{ibm.hex()}")
with open(OUT_CSV, "w") as f:
    f.write("\n".join(lines) + "\n")
print(f"wrote {OUT_CSV}: {len(lines)} cross-check vectors")
# quick self-checks of the independent encoder against known constants
assert ibm32(1.0) == bytes.fromhex("41100000")
assert ibm32(-1.0) == bytes.fromhex("c1100000")
assert ibm32(118.625) == bytes.fromhex("4276a000")
assert ibm32(0.15625) == bytes.fromhex("40280000")
print("encoder spot-checks ok (1.0=41100000, -1.0=C1100000, 118.625=4276A000)")
