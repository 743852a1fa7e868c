"""The canonical cross-engine hash unit: first 8 hex chars of md5 as a
uniform bigint in [0, 2^32).

Every deterministic draw in the engine that must replay identically in
Spark and DuckDB — sampling membership, split assignment, fingerprint
row hashes, sketch cells — reduces to this one expression pair. md5 is
the only hash both engines expose with identical semantics (xxhash64 /
``hash()`` differ across engines), and hex-prefix → integer avoids any
signed/unsigned interpretation gap. Keep the two forms in lockstep:
changing the slice width or cast in one silently breaks every oracle
built on the other.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def md5_prefix_int(col: Column) -> Column:
    """``col`` (already a string expression) → bigint in [0, 2^32)."""
    return F.conv(F.substring(F.md5(col), 1, 8), 16, 10).cast("bigint")


def md5_prefix_int_sql(expr: str) -> str:
    """DuckDB twin of :func:`md5_prefix_int` for oracle strings."""
    return f"('0x' || substr(md5({expr}), 1, 8))::BIGINT"
