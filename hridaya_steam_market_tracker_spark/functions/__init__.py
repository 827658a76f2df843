"""Column-function library: the reference's locale/currency/date
normalization semantics (SURVEY.md §G/§H) as native Spark expressions.

Everything here is a Column -> Column transform built from
pyspark.sql.functions only — JVM-side, whole-stage-codegen friendly, no
Python UDFs in the hot path. Behavioral parity with the reference is
pinned by golden tests (tests/test_functions.py) and VALUES-oracle
queries (queries/parsers.py).
"""

from hridaya_steam_market_tracker_spark.functions.prices import (  # noqa: F401
    activity_price_and_currency,
    coerce_price,
    extract_currency,
    parse_steam_price,
    parse_volume,
    steam_currency_id_to_iso,
    to_major_units,
)
from hridaya_steam_market_tracker_spark.functions.datetimes import (  # noqa: F401
    hour_label,
    iso8601_utc,
    parse_steam_datetime,
    unix_to_timestamp,
)
from hridaya_steam_market_tracker_spark.functions.activity import (  # noqa: F401
    extract_activity_action,
    extract_activity_price_string,
)
