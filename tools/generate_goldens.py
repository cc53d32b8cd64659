"""One-shot golden fixture generator (the reference's
``scripts/generate_data.py:16-31`` analogue).

Writes checked-in proto-JSONL goldens to ``tests/data/`` — random
messages for the full-matrix shapes (fixed seeds) and handcrafted
instances for the four recursion shapes — plus ``golden_digests.json``
pinning sha256 digests of (a) each corpus's wire-format serialization
and (b) its default-config encoded row rendering. Regenerating after
a codec/converter change that alters ANY byte flips a digest, which
is exactly the cross-version drift the goldens exist to catch; a
deliberate behavior change regenerates with ``--update``.

Run from the repo root:  python tools/generate_goldens.py [--update]
"""

from __future__ import annotations

import hashlib
import json
import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

from protarrow_spark.config import ProtarrowSparkConfig
from protarrow_spark.conversion import messages_to_rows
from protarrow_spark.proto import fixtures
from protarrow_spark.proto.jsonfmt import message_to_json_dict
from protarrow_spark.proto.message import Message, serialize
from tests.random_messages import random_messages

DATA_DIR = pathlib.Path(__file__).resolve().parent.parent / "tests" / "data"


def _self_chain(depth_val: int, levels: int) -> Message:
    mt = fixtures.recursive_self_type()
    msg = Message(mt, depth=depth_val)
    for d in range(1, levels):
        msg = Message(mt, depth=depth_val + d, next=msg)
    return msg


def _cycle_chain(levels: int) -> Message:
    l1, l2, l3 = fixtures.recursive_nested_cycle_types()
    order = [l1, l2, l3]
    msg = None
    for i in range(levels - 1, -1, -1):
        mt = order[i % 3]
        msg = (
            Message(mt, name=f"n{i}")
            if msg is None
            else Message(mt, name=f"n{i}", next=msg)
        )
    return msg


def _repeated_tree() -> list[Message]:
    mt = fixtures.recursive_repeated_type()
    leaf = lambda d: Message(mt, depth=d)  # noqa: E731
    return [
        Message(mt, depth=0),
        Message(mt, depth=1, children=[leaf(2), leaf(3)]),
        Message(mt, depth=4, children=[Message(mt, depth=5, children=[leaf(6)])]),
    ]


def _map_tree() -> list[Message]:
    mt = fixtures.recursive_map_type()
    return [
        Message(mt, name="root"),
        Message(mt, name="a", children_map={"x": Message(mt, name="ax")}),
        Message(
            mt,
            name="b",
            children_map={
                "y": Message(mt, name="by"),
                "z": Message(
                    mt, name="bz", children_map={"w": Message(mt, name="bzw")}
                ),
            },
        ),
    ]


def corpora() -> dict[str, list[Message]]:
    return {
        "Example": random_messages(fixtures.EXAMPLE, 20, seed=20240101),
        "NestedExample": random_messages(
            fixtures.NESTED_EXAMPLE, 20, seed=20240102
        ),
        "RecursiveSelf": [_self_chain(1, 1), _self_chain(11, 2), _self_chain(21, 3)],
        "RecursiveNested1": [_cycle_chain(1), _cycle_chain(2), _cycle_chain(4)],
        "RecursiveRepeated": _repeated_tree(),
        "RecursiveMap": _map_tree(),
    }


def digest_corpus(msgs: list[Message]) -> dict[str, str]:
    wire = hashlib.sha256()
    for m in msgs:
        wire.update(serialize(m))
        wire.update(b"\x00")
    cfg = ProtarrowSparkConfig(skip_recursive_messages=True)
    rows = hashlib.sha256()
    for row in messages_to_rows(msgs, msgs[0].type, cfg):
        rows.update(repr(row).encode())
        rows.update(b"\x00")
    return {"wire_sha256": wire.hexdigest(), "rows_sha256": rows.hexdigest()}


def main() -> int:
    update = "--update" in sys.argv
    DATA_DIR.mkdir(parents=True, exist_ok=True)
    digests: dict[str, dict[str, str]] = {}
    for name, msgs in corpora().items():
        path = DATA_DIR / f"{name}.jsonl"
        lines = [
            json.dumps(message_to_json_dict(m), sort_keys=False) for m in msgs
        ]
        if path.exists() and not update:
            print(f"keep {path} (use --update to overwrite)")
        else:
            path.write_text("\n".join(lines) + "\n")
            print(f"wrote {path} ({len(msgs)} messages)")
        digests[name] = digest_corpus(msgs)
    dig_path = DATA_DIR / "golden_digests.json"
    if dig_path.exists() and not update:
        print(f"keep {dig_path}")
    else:
        dig_path.write_text(json.dumps(digests, indent=1) + "\n")
        print(f"wrote {dig_path}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
