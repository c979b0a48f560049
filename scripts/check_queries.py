"""Quick single-query oracle check: python scripts/check_queries.py name [name...]

Runs each named registry query on Spark (local) and its DuckDB oracle at
sf0.01 (override with CHECK_SF_DIR) using the same compare semantics as
tests/oracle_compare.py.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tests"))

from oracle_compare import compare, duck_connection  # noqa: E402

from dataengineeringworkshop_spark.plans.registry import load_all  # noqa: E402
from dataengineeringworkshop_spark.session import get_spark  # noqa: E402


def main() -> None:
    sf_dir = os.environ.get("CHECK_SF_DIR", "/root/testdata/sf0.01")
    names = sys.argv[1:]
    reg = load_all()
    spark = get_spark()
    con = duck_connection(sf_dir)
    bad = 0
    for n in names:
        spec = reg[n]
        df = spec.fn(spark, sf_dir)
        if spec.oracle is None:
            print(f"{n}: rows-only ({df.count()})")
            continue
        problems = compare(df, con, spec.oracle, n)
        if problems:
            bad += 1
            for p in problems:
                print("FAIL", p)
        else:
            print(f"{n}: OK ({df.count()} rows)")
    sys.exit(1 if bad else 0)


if __name__ == "__main__":
    main()
