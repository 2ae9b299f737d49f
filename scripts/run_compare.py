"""Dev harness: run every registry query against its DuckDB oracle."""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from eugl_spark.plans.compare import duck_connection, run_one
from eugl_spark.plans.queries import REGISTRY
from eugl_spark.session import get_spark

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")


def main() -> int:
    names = sys.argv[1:] or list(REGISTRY)
    spark = get_spark("compare", cores=8)
    con = duck_connection(SF_DIR)
    failures = 0
    for name in names:
        t0 = time.time()
        try:
            res = run_one(spark, con, name, SF_DIR)
        except Exception as e:  # noqa: BLE001
            print(f"FAIL {name}: {type(e).__name__}: {str(e)[:400]}")
            failures += 1
            continue
        ok = res["rows_match"] and res["cols_match"] and res["values_match"] in (True, None)
        status = "ok  " if ok else "FAIL"
        print(
            f"{status} {name}: rows={res['rows']}/{res['oracle_rows']} "
            f"values={res['values_match']} ({time.time()-t0:.1f}s)"
        )
        if not ok:
            print("     ", res["diff"])
            failures += 1
    spark.stop()
    return failures


if __name__ == "__main__":
    raise SystemExit(main())
