"""Sources: wire-format normalization and the fetcher seam.

`wire` turns raw API-response DataFrames (one row per poll) into the
storage schema using the §G/§H column functions — the Spark analog of
the reference's store_data routing (src/SQLinserts.py:72-100). The
HTTP fetch itself is a driver-side adapter (rate-limited, stateful
backoff — streaming/ratelimiter + streaming/scheduler); everything
from the JSON onward is a distributed transform.
"""
