"""Portable epoch-millis extraction.

Driver parquet carries TIMESTAMP_NTZ; synthesized frames carry
TIMESTAMP_LTZ. `unix_millis` only accepts LTZ, so cast first — sessions
run with spark.sql.session.timeZone=UTC, making the NTZ->LTZ cast a
pure reinterpretation that matches DuckDB's epoch_ms on naive
timestamps exactly.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def epoch_ms(col: Column | str) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return F.unix_millis(c.cast("timestamp"))
