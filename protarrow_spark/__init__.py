"""protarrow-spark: a PySpark-native analytics engine.

Re-expresses the full capability surface of tradewelltech/protarrow
(protobuf <-> columnar conversion; reference at /root/reference,
``protarrow/__init__.py:14-26``) on Spark DataFrames, and layers the
query + LLM-data-pipeline operators on top (SURVEY.md §2).

Design is Spark-first: logical plans are declared with the DataFrame /
SQL API so Catalyst/Tungsten choose the physical strategy; Python only
runs driver-side (schema derivation, message construction) or in
Arrow-batched UDFs where built-ins genuinely can't express the
semantics (the proto wire codec inside ``decode_proto_bytes`` /
``encode_proto_bytes``).

Public API (parity with the reference's 9 symbols, Spark-shaped):

* ``message_type_to_schema`` / ``message_type_to_struct_type``
* ``messages_to_dataframe`` (encode) / ``dataframe_to_messages`` (decode)
* ``cast_dataframe`` (schema conformance)
* ``MessageExtractor`` (compiled row extraction)
* ``decode_proto_bytes`` / ``encode_proto_bytes`` (distributed,
  binary-column paths)
* ``adapt_descriptor`` (real ``google.protobuf`` descriptors -> the
  internal model, when protobuf is installed)
* ``read_descriptor_set`` / ``write_descriptor_set`` (the protoc
  ``--descriptor_set_out`` artifact, parsed/emitted with the engine's
  own wire codec — contracts load with NO protobuf runtime, and the
  written file is what ``decode_proto_column``'s built-in
  ``from_protobuf`` dispatch takes as ``descFilePath``)
"""

from __future__ import annotations

__version__ = "0.2.0"

from protarrow_spark.config import ProtarrowSparkConfig
from protarrow_spark.conversion import (
    MessageExtractor,
    SchemaChange,
    breaking_changes,
    cast_dataframe,
    dataframe_to_messages,
    decode_proto_bytes,
    diff_contracts,
    encode_proto_bytes,
    messages_to_dataframe,
)
from protarrow_spark.proto.adapter import adapt_descriptor
from protarrow_spark.proto.descriptor_set import (
    read_descriptor_set,
    write_descriptor_set,
)
from protarrow_spark.proto.message import Message
from protarrow_spark.schema import message_type_to_schema, message_type_to_struct_type
from protarrow_spark.session import get_spark

__all__ = [
    "Message",
    "MessageExtractor",
    "SchemaChange",
    "ProtarrowSparkConfig",
    "adapt_descriptor",
    "breaking_changes",
    "cast_dataframe",
    "diff_contracts",
    "dataframe_to_messages",
    "decode_proto_bytes",
    "encode_proto_bytes",
    "get_spark",
    "message_type_to_schema",
    "message_type_to_struct_type",
    "messages_to_dataframe",
    "read_descriptor_set",
    "write_descriptor_set",
    "__version__",
]
