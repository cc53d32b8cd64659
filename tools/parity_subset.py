"""Oracle-parity spot check for a SUBSET of queries — the per-change
verification loop of the optimization rounds (full rehearsal =
tools/gate_rehearsal.py). Runs the exact driver-style compare
(tests/oracle_utils.assert_matches_oracle) at one or more SFs.

Usage: PYTHONPATH=. python tools/parity_subset.py q1,q2,... [sf_dir ...]
Defaults to /root/testdata/sf0.001 and /root/testdata/sf0.01.
"""

from __future__ import annotations

import pathlib
import sys

REPO = pathlib.Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))


def main() -> None:
    names = [n.strip() for n in sys.argv[1].split(",") if n.strip()]
    sf_dirs = sys.argv[2:] or ["/root/testdata/sf0.001", "/root/testdata/sf0.01"]

    from protarrow_spark.queries import all_oracles, all_queries
    from protarrow_spark.session import get_spark
    from tests.oracle_utils import assert_matches_oracle

    queries, oracles = all_queries(), all_oracles()
    spark = get_spark("parity-subset", cpus=16)
    failed = []
    for sf_dir in sf_dirs:
        for name in names:
            try:
                if name in oracles:
                    assert_matches_oracle(spark, name, sf_dir)
                    print(f"GREEN {name} @ {sf_dir}")
                else:
                    n = int(queries[name](spark, sf_dir).count())
                    print(f"ROWS-ONLY {name} @ {sf_dir}: {n} rows")
            except Exception as exc:  # noqa: BLE001
                failed.append((name, sf_dir))
                print(f"RED   {name} @ {sf_dir}: {type(exc).__name__}: {exc}")
    spark.stop()
    if failed:
        sys.exit(1)


if __name__ == "__main__":
    main()
