"""Date/time normalization (SURVEY.md §H).

* ``parse_steam_datetime`` — reference src/SQLinserts.py:716-753 (H1):
  '"Jul 02 2014 01: +0"' -> naive-UTC timestamp, NULL on malformed.
* ``unix_to_timestamp``   — reference parseActivityHTML_utility.py:128 (H2)
* ``hour_label``          — reference DOCUMENTATION.md:225 (H3)
* ``iso8601_utc``         — reference api/responseModels.py:209-217 (H5)

Session timezone must be UTC (tables.pin_session) so these are
timezone-stable; the reference pins UTC at the pool level the same way.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# "Jul 02 2014 01: +0" — month day year hour, trailing colon, tz suffix
# ignored (always +0 / UTC on the wire).
_STEAM_DT_RE = r"^\s*([A-Za-z]{3}) (\d{2}) (\d{4}) (\d{2}):"


def parse_steam_datetime(col: Column) -> Column:
    """H1: Steam history datetime string -> timestamp (NULL on malformed)."""
    rebuilt = F.regexp_replace(
        F.regexp_extract(col, _STEAM_DT_RE, 0), ":\\s*$", ""
    )
    # regexp_extract yields '' on no-match; to_timestamp('') -> NULL via try_
    return F.try_to_timestamp(
        F.when(rebuilt == "", F.lit(None)).otherwise(rebuilt),
        F.lit("MMM dd yyyy HH"),
    )


def unix_to_timestamp(col: Column) -> Column:
    """H2: unix epoch seconds -> timestamp (shared across a snapshot's events)."""
    return F.timestamp_seconds(col)


def hour_label(col: Column) -> Column:
    """H3: hour-bucket label "HH:00"."""
    return F.date_format(col, "HH:00")


def iso8601_utc(col: Column) -> Column:
    """H5: ISO-8601 UTC serialization for the REST/WS edge."""
    return F.date_format(col, "yyyy-MM-dd'T'HH:mm:ssXXX")
