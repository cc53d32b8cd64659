"""Full-registry rehearsal freshness gate.

CORRECTNESS_LOCAL_ALL.json (written by ``tools/gate_rehearsal.py
<sf_dir> --all``) is the round's proof that EVERY registered query was
oracle-verified locally at the driver's SF. These guards make it a
first-class artifact: a query edited or born after the last full
rehearsal changes the registry fingerprint and fails here, so it
cannot ship unverified. Regenerate with::

    setsid nohup python tools/gate_rehearsal.py /root/testdata/sf0.01 --all

(~40 min; detach — the run outlives interactive timeouts.)
"""

from __future__ import annotations

import json
import pathlib

import pytest

ARTIFACT = pathlib.Path(__file__).resolve().parent.parent / "CORRECTNESS_LOCAL_ALL.json"


@pytest.fixture(scope="module")
def artifact() -> dict:
    assert ARTIFACT.exists(), (
        "CORRECTNESS_LOCAL_ALL.json missing — run the full-registry "
        "rehearsal (tools/gate_rehearsal.py <sf_dir> --all)"
    )
    return json.loads(ARTIFACT.read_text())


def test_artifact_is_fresh_for_current_registry(artifact):
    from protarrow_spark.queries.registry import registry_fingerprint

    meta = artifact.get("__meta__")
    assert meta is not None, (
        "rehearsal artifact predates the freshness stamp — regenerate "
        "with tools/gate_rehearsal.py --all"
    )
    current = registry_fingerprint()
    assert meta["registry_hash"] == current, (
        "registry changed since the last full rehearsal "
        f"(stamped {meta['generated_utc']}, {meta['n_queries']} queries) "
        "— a query was edited or added after its last sf0.01 "
        "verification; regenerate CORRECTNESS_LOCAL_ALL.json"
    )


def test_every_registered_query_rehearsed_green(artifact):
    from protarrow_spark.queries.registry import all_oracles, all_queries

    queries, oracles = all_queries(), all_oracles()
    rows = {k: v for k, v in artifact.items() if k != "__meta__"}
    missing = sorted(set(queries) - set(rows))
    assert not missing, f"never rehearsed: {missing}"
    red = sorted(n for n, r in rows.items() if n in queries and r.get("err"))
    assert not red, f"red rehearsal rows: {red}"
    weak = sorted(
        n
        for n, r in rows.items()
        if n in oracles and not r.get("hash_match")
    )
    assert not weak, f"oracle queries without hash-green rehearsal: {weak}"
