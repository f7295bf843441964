"""WKB point geometry decode (SURVEY.md §2a P1, non-GeoArrow fallback).

The reference falls back to per-row decoding when the geometry column is
not GeoArrow-encoded (arrow-helpers.ts:52-62: "Per-row fallback for
non-GeoArrow encoding (WKB, etc.)", NaN fill for unreadable rows).
Standard GeoParquet in the wild is WKB-encoded, so this is the first
thing a user with a real file hits.

WKB 2-D Point layout:

  byte 0      endianness (0 = big, 1 = little)
  bytes 1-4   geometry type uint32 (1 = Point; EWKB sets flag bits —
              0x20000000 adds a 4-byte SRID before the coords)
  bytes 5-12  x (lng) float64
  bytes 13-20 y (lat) float64

Decoded entirely with JVM expressions — hex() → conv() → integer bit math
→ exact IEEE-754 mantissa reconstruction — so the decode stays inside
whole-stage codegen: no UDF, no Python, row-group-parallel at 100 TB. The
reconstruction is EXACT (not approximate): sign/exponent/fraction are
recovered as integers and the value rebuilt as ±(1 + frac/2^52)·2^(e-1023),
every step of which is representable, so decoded doubles are bit-identical
to the encoded ones.

Unreadable rows (wrong type, truncated buffer, null) decode to NULL,
matching the reference's NaN fill (NaN and NULL are both dropped by the
F2 null/NaN filter, filters.py).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_EXP_BIAS = 1023
_FRAC_HI_MASK = 0xFFFFF  # low 20 bits of the high word
_TWO32 = 4294967296.0
_TWO52 = 4503599627370496.0


def _swap8(h: Column) -> Column:
    """Byte-reverse an 8-hex-char (4-byte) string."""
    return F.concat(*[F.substring(h, i, 2) for i in (7, 5, 3, 1)])


def _swap16(h: Column) -> Column:
    """Byte-reverse a 16-hex-char (8-byte) string."""
    return F.concat(*[F.substring(h, i, 2) for i in (15, 13, 11, 9, 7, 5, 3, 1)])


def _bits_hex_to_double(h_be: Column) -> Column:
    """16 big-endian hex chars → the double those 64 bits encode (exact).

    Split into two uint32 halves so conv()'s string result always fits a
    signed long; then sign = bit 63, exponent = bits 52..62, fraction =
    bits 0..51 reassembled in double arithmetic (frac < 2^52 ⇒ exact).
    """
    hi = F.conv(F.substring(h_be, 1, 8), 16, 10).cast("long")
    lo = F.conv(F.substring(h_be, 9, 8), 16, 10).cast("long")
    sign = F.when(hi.bitwiseAND(F.lit(0x80000000)) != 0, F.lit(-1.0)).otherwise(F.lit(1.0))
    exp = F.shiftright(hi, 20).bitwiseAND(F.lit(0x7FF))
    frac = hi.bitwiseAND(F.lit(_FRAC_HI_MASK)).cast("double") * F.lit(_TWO32) + lo.cast(
        "double"
    )
    mant = frac / F.lit(_TWO52) + F.when(exp > 0, F.lit(1.0)).otherwise(F.lit(0.0))
    e = F.when(exp == 0, F.lit(1 - _EXP_BIAS)).otherwise(exp - _EXP_BIAS)
    val = sign * mant * F.pow(F.lit(2.0), e.cast("double"))
    # exp 2047 = Inf (frac 0) / NaN (frac ≠ 0); the reference's NaN fill
    # means either way the row is dropped downstream — emit NaN for both.
    return F.when(exp == 2047, F.lit(float("nan"))).otherwise(val)


def wkb_point_coord(wkb: Column, which: str) -> Column:
    """Decode lng ("x") or lat ("y") from a WKB/EWKB 2-D Point binary.

    NULL for non-point types or buffers too short to hold the coords.
    """
    h = F.hex(wkb)
    n = F.length(h)
    le = F.substring(h, 1, 2) == F.lit("01")
    type_hex = F.substring(h, 3, 8)
    gtype = F.conv(F.when(le, _swap8(type_hex)).otherwise(type_hex), 16, 10).cast("long")
    has_srid = gtype.bitwiseAND(F.lit(0x20000000)) != 0
    base_type = gtype.bitwiseAND(F.lit(0x1FFFFFFF))  # mask EWKB flag bits
    # hex index (1-based) where the x coord starts: 1 endian byte + 4 type
    # bytes = 10 hex chars (+ 8 for an EWKB SRID)
    off = F.when(has_srid, F.lit(19)).otherwise(F.lit(11))
    off = off if which == "x" else off + F.lit(16)
    coord_hex = F.substring(h, off, 16)
    coord = _bits_hex_to_double(F.when(le, _swap16(coord_hex)).otherwise(coord_hex))
    long_enough = n >= F.when(has_srid, F.lit(50)).otherwise(F.lit(42))
    return F.when((base_type == 1) & long_enough, coord)


def decode_wkb_points(
    df: DataFrame, geometry: str = "geometry", lng: str = "lng", lat: str = "lat"
) -> DataFrame:
    """P1 WKB fallback: binary geometry column → flat lng/lat doubles."""
    return df.withColumns(
        {
            lng: wkb_point_coord(F.col(geometry), "x"),
            lat: wkb_point_coord(F.col(geometry), "y"),
        }
    ).drop(geometry)


def encode_wkb_point_udf():
    """TEST-SCAFFOLDING encoder (little-endian WKB Point from lng/lat) —
    used to build fixtures and the q_unpack_wkb round-trip; the production
    surface is the expression DECODER above. struct.pack is independent of
    the decode arithmetic, so round-trip equality genuinely checks it."""
    import struct

    from pyspark.sql.functions import pandas_udf

    @pandas_udf("binary")
    def enc(lng: pd.Series, lat: pd.Series) -> pd.Series:
        out = []
        for g, t in zip(lng, lat):
            if g is None or t is None or pd.isna(g) or pd.isna(t):
                out.append(None)
            else:
                out.append(struct.pack("<BIdd", 1, 1, g, t))
        return pd.Series(out)

    return enc
