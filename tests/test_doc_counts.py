"""The catalog counts quoted in README/COVERAGE must be generated facts,
not hand-edits: round 4 shipped with "184 queries, 173 oracle-checked"
while the registry said 185/174 (`cluster_weighted_sample` landed after
the last doc refresh). This test derives the truth from ``load_all()``
and fails on any future drift, so the docs can only be wrong loudly.
"""

from __future__ import annotations

import os
import re

from hridaya_steam_market_tracker_spark.queries import load_all

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_doc_counts_match_registry():
    reg = load_all()
    n = len(reg)
    n_oracle = sum(1 for q in reg.values() if q.oracle)
    n_rows_only = n - n_oracle

    readme = open(os.path.join(REPO, "README.md"), encoding="utf-8").read()
    coverage = open(os.path.join(REPO, "COVERAGE.md"), encoding="utf-8").read()

    assert f"`queries()` ({n} entries), `oracle_sql()` ({n_oracle}" in readme, (
        f"README.md quotes stale counts; registry says {n} queries / "
        f"{n_oracle} oracle-bearing"
    )
    assert f"{n_oracle} of {n} registered queries" in coverage, (
        f"COVERAGE.md quotes stale counts; registry says {n_oracle} of {n}"
    )
    assert f"{n_rows_only} rows-only by design" in coverage, (
        f"COVERAGE.md rows-only count stale; registry says {n_rows_only}"
    )

    # Any OTHER three-digit query-count-looking claim in the two docs must
    # match the registry too (catches stale numbers in prose we forgot).
    for doc_name, text in (("README.md", readme), ("COVERAGE.md", coverage)):
        for m in re.finditer(r"(\d{3}) (?:registered )?quer", text):
            assert int(m.group(1)) == n, (
                f"{doc_name} claims {m.group(1)} queries; registry says {n}"
            )
