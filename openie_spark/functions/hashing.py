"""Engine-portable hashing — the md5-lockstep family's single home.

    H(x) = int(md5(x)[:15 hex], 16)          -- 60 bits, fits int64
    Spark : conv(substr(md5(x),1,15),16,10)::long
    DuckDB: CAST('0x' || substr(md5(x),1,15) AS BIGINT)

Every oracle-checked operator that needs a numeric hash (negative
sampling, MIS priorities, rolling fingerprints, sampling thresholds)
derives it from here so the scheme — and its DuckDB twin — can never
fork across call sites.
"""

from __future__ import annotations

from pyspark.sql import functions as F


def portable_hash60(*cols) -> "F.Column":
    """60-bit engine-portable hash: md5 over '|'-joined inputs, first 15
    hex chars as a non-negative bigint.  For a single non-null string
    input, concat_ws is the identity, so H(col) == md5(col)[:15] on both
    engines.  DuckDB twin:
    CAST('0x' || substr(md5(concat_ws('|', ...)),1,15) AS BIGINT)."""
    joined = F.concat_ws(
        "|", *[F.col(c) if isinstance(c, str) else c for c in cols]
    )
    return F.conv(F.substring(F.md5(joined), 1, 15), 16, 10).cast("long")
