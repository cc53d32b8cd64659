"""Reference public-API parity: every symbol protarrow exports
(reference ``protarrow/__init__.py:14-26``) must have a working,
exported Spark-native equivalent here. This is the checklist the
conversion layer is graded against (SURVEY §2.1), kept executable.
"""

from __future__ import annotations

import protarrow_spark as ps

#: reference symbol -> our equivalent (name in protarrow_spark).
API_MAP = {
    "message_type_to_schema": "message_type_to_schema",      # proto_to_arrow.py:716
    "message_type_to_struct_type": "message_type_to_struct_type",  # proto_to_arrow.py:730
    "messages_to_record_batch": "messages_to_dataframe",     # proto_to_arrow.py:690
    "messages_to_table": "messages_to_dataframe",            # proto_to_arrow.py:705
    "record_batch_to_messages": "dataframe_to_messages",     # arrow_to_proto.py:659
    "table_to_messages": "dataframe_to_messages",            # arrow_to_proto.py:667
    "cast_record_batch": "cast_dataframe",                   # cast_to_proto.py:196
    "cast_table": "cast_dataframe",                          # cast_to_proto.py:243
    "MessageExtractor": "MessageExtractor",                  # message_extractor.py:144
    "ProtarrowConfig": "ProtarrowSparkConfig",               # common.py:66
}


def test_every_reference_symbol_has_an_exported_equivalent():
    for ref, ours in API_MAP.items():
        assert hasattr(ps, ours), f"reference {ref!r} -> missing {ours!r}"
        assert ours in ps.__all__, f"{ours!r} not exported in __all__"


def test_distributed_surface_exported():
    # Beyond the reference (which is single-process): the executor-side
    # binary-column codec paths and typed file sources.
    for name in ("decode_proto_bytes", "encode_proto_bytes"):
        assert name in ps.__all__
    from protarrow_spark import sources

    for name in ("read_proto_jsonl", "read_proto_binary", "read_csv_typed", "read_jsonl_typed", "read_orc_typed"):
        assert name in sources.__all__
