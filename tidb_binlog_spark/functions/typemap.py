"""MySQL/TiDB type-surface formatting as pure Catalyst expressions.

Reference semantics mirrored here:
- drainer/translator/mysql.go:252-294 (formatData): temporal /
  decimal / json values go downstream as strings, enum/set go as
  their numeric value, bit as an integer (pingcap/tidb#10988
  workaround);
- drainer/translator/kafka.go:227-294 (DatumToColumn): unsigned
  integer columns must surface as uint64 — TiDB stores them in an
  int64, so a negative value means the top bit is set
  (translator.go:353-361 fixType does uint64(int64));
- drainer/translator/translator.go:125-140 (getEnumDatum /
  ParseEnumName, ParseSetName): the reverse direction, mapping
  enum/set *names* back to their numeric value when back-filling
  column defaults;
- drainer/translator/mysql.go:212-222 (writableColumns): generated
  columns never appear in statements — modeled by
  TableInfo.writable_columns (sinks/sqlgen.py).

Everything is a column expression (whole-stage codegen, no Python in
the row path); all helpers are engine-exact so the DuckDB oracle can
reproduce them bit-for-bit.
"""

from __future__ import annotations

import re

from pyspark.sql import Column
from pyspark.sql import functions as F

# 2^64 as a decimal literal — too large for a BIGINT lit, so it is
# spelled as a string cast. DECIMAL(20,0) holds the full uint64 range.
_UINT64_MODULUS = "CAST('18446744073709551616' AS DECIMAL(20,0))"


def _c(col) -> Column:
    return F.col(col) if isinstance(col, str) else col


def parse_timezone(tz_str: str) -> str:
    """The sink's time_zone setting -> a zone id Spark accepts
    (str2TimezoneOrFromDB, drainer/sync/mysql.go:184-233): named IANA
    zones pass through (time.LoadLocation analog), MySQL offset strings
    '+10:00'/'-6:00' are validated to [-12:59, +14:00] and normalized
    to ±HH:MM; 'SYSTEM'/'Local' are rejected exactly like the
    reference (ambiguous across hosts)."""
    if tz_str in ("SYSTEM", "Local"):
        raise ValueError("'SYSTEM' or 'Local' time_zone is not supported")
    m = re.fullmatch(r"(?P<sign>[+-])(?P<h>\d{1,2}):(?P<m>\d{2})", tz_str)
    if m:
        h, mi = int(m.group("h")), int(m.group("m"))
        total = h * 60 + mi
        if mi > 59 or (m.group("sign") == "-" and total > 12 * 60 + 59) \
                or (m.group("sign") == "+" and total > 14 * 60):
            raise ValueError(f"invalid timezone {tz_str}")
        return f"{m.group('sign')}{h:02d}:{mi:02d}"
    try:
        import zoneinfo
        zoneinfo.ZoneInfo(tz_str)
    except Exception as exc:
        raise ValueError(f"invalid timezone {tz_str}") from exc
    return tz_str


def format_timestamp_tz(nanos_col, tz: str,
                        fmt: str = "yyyy-MM-dd HH:mm:ss") -> Column:
    """TIMESTAMP column rendered as the downstream wall-clock string in
    the sink's time_zone — formatData sends temporals as strings
    through the configured location (mysql.go:252-294 + the loc from
    str2TimezoneOrFromDB). Input is BIGINT nanoseconds (the driver
    parquet's TIMESTAMP(NANOS) surface); session tz is pinned UTC by
    load_tables, so rendering is engine-stable."""
    # exact floor division, no float and no decimal rounding: nanos
    # exceed 2^53 after ~104 days of epoch (double would round), and a
    # decimal quotient rounds HALF_UP at its scale (ns 500ns below a
    # second boundary would land in the NEXT second). Subtracting the
    # positive pmod remainder first makes the decimal division exact.
    ns = _c(nanos_col).cast("long")
    ns_floor = ns - F.pmod(ns, F.lit(1_000_000_000))
    secs = (ns_floor.cast("decimal(38,0)")
            / F.lit(1_000_000_000)).cast("long")
    ts = F.timestamp_seconds(secs)
    return F.date_format(F.from_utc_timestamp(ts, parse_timezone(tz)), fmt)


def unsigned_bigint(col) -> Column:
    """Reinterpret a signed BIGINT carrying unsigned-bigint payload as
    its uint64 value, surfaced as DECIMAL(20,0) (the portable SQL type
    wide enough for the full range). Negative input = top bit set:
    value + 2^64 (translator.go fixType / kafka.go Uint64Value)."""
    c = _c(col)
    d = c.cast("decimal(20,0)")
    return F.when(c < 0, d + F.expr(_UINT64_MODULUS)).otherwise(d)


def bit_to_decimal(col) -> Column:
    """BIT(n) payload (a BINARY column, n <= 64) -> its integer value
    as DECIMAL(20,0) — mysql.go formatData encodes bits as integers to
    avoid pingcap/tidb#10988. conv() parses the hex form as an
    unsigned 64-bit integer."""
    return F.conv(F.hex(_c(col)), 16, 10).cast("decimal(20,0)")


def enum_name(elems, idx) -> Column:
    """Enum numeric value -> its name: 1-based index into the elems
    list; 0 is MySQL's invalid-enum empty string."""
    i = _c(idx)
    return F.when(i <= 0, F.lit("")).otherwise(
        F.element_at(_c(elems), i.cast("int")))


def enum_value(elems, name) -> Column:
    """Enum name -> numeric value (ParseEnumName): 1-based position in
    elems, '' (or a name not in elems) -> 0."""
    return F.array_position(_c(elems), _c(name)).cast("bigint")


def set_names(elems: str, mask: str) -> Column:
    """SET numeric value (bitmask over elems) -> comma-joined member
    names in definition order — MySQL's canonical SET literal form.

    Takes column NAMES (SQL fragments): the bit-count operand of
    shiftright must be an expression, which the typed F.shiftright API
    does not accept, so this is one SQL expression end to end."""
    return F.expr(
        f"array_join(filter(transform(sequence(1, size({elems})), "
        f"i -> IF((shiftright({mask}, CAST(i - 1 AS INT)) & 1) = 1, "
        f"element_at({elems}, CAST(i AS INT)), NULL)), "
        f"x -> x IS NOT NULL), ',')")


def set_value(elems: str, names_csv) -> Column:
    """SET comma-joined names -> numeric bitmask (ParseSetName): sum of
    2^(position-1) per member name; '' -> 0. Unknown names contribute
    0 (guarded by the position > 0 check). BOTH arguments must be SQL
    fragments (column names / expressions) — same reason as set_names;
    a Column object raises TypeError (alias it into a named column
    first and pass the name)."""
    if not isinstance(names_csv, str):
        raise TypeError("set_value takes SQL fragments (column names)")
    return F.expr(
        f"IF({names_csv} = '', CAST(0 AS BIGINT), "
        f"aggregate(transform(split({names_csv}, ','), "
        f"n -> IF(array_position({elems}, n) > 0, "
        f"shiftleft(CAST(1 AS BIGINT), "
        f"CAST(array_position({elems}, n) - 1 AS INT)), "
        f"CAST(0 AS BIGINT))), "
        f"CAST(0 AS BIGINT), (a, b) -> a + b))")
