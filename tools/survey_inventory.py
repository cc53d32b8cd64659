"""Regenerate SURVEY.md SS2.4 (the full query-registry inventory) from
the live registry. Run after any birth/rename; tests/test_survey_sync.py
fails the suite if the section drifts from the code."""

from __future__ import annotations

import pathlib
import re
import sys

REPO = pathlib.Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))


def main() -> None:
    from protarrow_spark.queries.registry import all_oracles, all_queries

    names = sorted(all_queries())
    oracles = set(all_oracles())
    fams: dict[str, list[str]] = {}
    for n in names:
        fam = n.split("_")[0]
        if re.match(r"q\d+$", fam):
            fam = "tpch"
        fams.setdefault(fam, []).append(n)

    lines = [
        "### 2.4 Full query-registry inventory (sync-enforced)",
        "",
        "Every name registered in `protarrow_spark/queries/registry.py`, by",
        "family — the authoritative list the driver grades and the judge",
        "audits. `tests/test_survey_sync.py` fails the suite if a registered",
        "query is ever absent from this document or the stated counts drift",
        "from the code (regenerate with `python tools/survey_inventory.py`).",
        "Names without a DuckDB oracle (rows-only driver check) are marked",
        "`*` — currently only the float k-means, whose value-level tolerance",
        "gate is described in its clustering row above.",
        "",
    ]
    for fam in sorted(fams):
        qs = ["`%s`%s" % (n, "" if n in oracles else "*") for n in fams[fam]]
        lines.append(f"- **{fam}** ({len(fams[fam])}): " + ", ".join(qs))
    block = "\n".join(lines) + "\n"

    survey = REPO / "SURVEY.md"
    src = survey.read_text()
    pat = re.compile(
        r"### 2\.4 Full query-registry inventory.*?(?=\n---\n)", re.DOTALL
    )
    assert pat.search(src), "SS2.4 section not found"
    survey.write_text(pat.sub(block, src, count=1))
    print(f"SS2.4 regenerated: {len(names)} queries, {len(fams)} families")


if __name__ == "__main__":
    main()
