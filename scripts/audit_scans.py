#!/usr/bin/env python
"""Full-registry scan-count audit CLI.

Builds every registered query's plan at the given sf dir, flags any
query that scans a base table more than once, and diffs the flags
against the audited-by-design CLEARED list in plans/scan_audit.py.
Exit 1 when an uncleared multi-scan plan exists (a new defect of the
CTE-recompute class) or a CLEARED entry no longer multi-scans (stale
clearance).

Usage: python scripts/audit_scans.py [sf_dir]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from pyspark.sql import SparkSession  # noqa: E402


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    from dataengineeringworkshop_spark.session import get_spark
    from dataengineeringworkshop_spark.plans.scan_audit import CLEARED, audit_registry

    spark = get_spark(app_name="scan-audit")
    flagged = audit_registry(spark, sf_dir)
    new = {n: c for n, c in flagged.items() if n not in CLEARED}
    stale = sorted(set(CLEARED) - set(flagged))
    print(f"registry queries flagged multi-scan: {len(flagged)}")
    for n in sorted(flagged):
        mark = "CLEARED" if n in CLEARED else "NEW    "
        print(f"  {mark} {n}: {flagged[n]}"
              + (f"  [{CLEARED[n]}]" if n in CLEARED else ""))
    if stale:
        print(f"STALE clearances (no longer multi-scan): {stale}")
    if new:
        print(f"NEW multi-scan plans needing audit: {sorted(new)}")
        return 1
    if stale:
        return 1
    print("SCAN AUDIT CLEAN")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
