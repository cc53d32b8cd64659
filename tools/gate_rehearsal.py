"""Dress rehearsal of the driver's t2 correctness gate: run the
GRADED_FIRST window (the 50 queries the driver actually grades)
through the exact local compare (tests/oracle_utils.py — row count +
schema + dtype-kind + order-insensitive canonical values) at the
driver's SF (0.01), and write CORRECTNESS_LOCAL.json in the driver's
row format. Run before closing a round: a red row here is a red row
in CORRECTNESS_r{N}.json.

Usage: PYTHONPATH=. python tools/gate_rehearsal.py [sf_dir] [--all]

``--all`` rehearses EVERY registered query (not just the graded
window) — run before a rotation so the next round's window can be
drawn from a fully sf0.01-validated pool; writes
CORRECTNESS_LOCAL_ALL.json instead.
"""

from __future__ import annotations

import json
import pathlib
import sys
import traceback

REPO = pathlib.Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))


def main() -> None:
    args = [a for a in sys.argv[1:] if a != "--all"]
    run_all = "--all" in sys.argv[1:]
    sf_dir = args[0] if args else "/root/testdata/sf0.01"

    from protarrow_spark.queries import all_oracles, all_queries
    from protarrow_spark.queries.registry import GRADED_FIRST
    from protarrow_spark.session import get_spark
    from tests.oracle_utils import assert_matches_oracle

    spark = get_spark("gate-rehearsal", cpus=16)
    queries, oracles = all_queries(), all_oracles()
    names = list(queries) if run_all else list(GRADED_FIRST)
    results: dict[str, dict] = {}
    n_green = 0
    for name in names:
        if name not in queries:
            results[name] = {"err": "NOT REGISTERED"}
            continue
        try:
            if name in oracles:
                assert_matches_oracle(spark, name, sf_dir)
                rows = int(queries[name](spark, sf_dir).count())
                results[name] = {
                    "rows_match": True,
                    "schema_match": True,
                    "hash_match": True,
                    "rows": rows,
                    "err": None,
                }
            elif name == "cluster_kmeans_embeddings":
                # The one rows-only entry also carries the r12
                # tolerance gate: counts exact vs the unrolled DuckDB
                # Lloyd's replica, centroids within epsilon.
                from tests.oracle_utils import kmeans_tolerance_report

                rep = kmeans_tolerance_report(spark, sf_dir)
                if not rep["tolerance_ok"]:
                    raise AssertionError(f"kmeans tolerance gate: {rep}")
                results[name] = {"rows_only": rep["rows"], "err": None, **rep}
            else:
                rows = int(queries[name](spark, sf_dir).count())
                results[name] = {"rows_only": rows, "err": None}
            n_green += 1
            print(f"GREEN {name}")
        except Exception as exc:  # noqa: BLE001 — report, don't abort
            results[name] = {"err": f"{type(exc).__name__}: {exc}"}
            print(f"RED   {name}: {exc}")
            traceback.print_exc(limit=2)
    out = REPO / ("CORRECTNESS_LOCAL_ALL.json" if run_all else "CORRECTNESS_LOCAL.json")
    if run_all:
        # Freshness stamp: tests/test_gate_freshness.py recomputes the
        # registry fingerprint and fails if any query was edited or
        # born after this rehearsal — a stale artifact can't ship.
        import datetime

        from protarrow_spark.queries.registry import registry_fingerprint

        results["__meta__"] = {
            "registry_hash": registry_fingerprint(),
            "generated_utc": datetime.datetime.now(
                datetime.timezone.utc
            ).isoformat(timespec="seconds"),
            "n_queries": len(names),
            "sf_dir": sf_dir,
        }
    out.write_text(json.dumps(results, indent=1))
    print(f"\n{n_green}/{len(names)} green -> {out}")
    spark.stop()
    sys.exit(0 if n_green == len(names) else 1)


if __name__ == "__main__":
    main()
