"""Distributed proto conversion over binary columns.

This is the engine's scale path (SURVEY §3.1/§3.2 "Spark version"):
data never touches the driver. A DataFrame with a ``binary`` column
of serialized messages (the Kafka value shape, ``docs/faq.md:20-25``
in the reference) decodes into typed columns on executors, and typed
columns serialize back to proto bytes for a Kafka/file sink.

Implementation: ``mapInPandas`` (Arrow-batched, one Python worker per
partition) + the pure-Python wire codec (``proto/message.py``) + the
compiled row/message converters (``conversion/encode.py`` /
``conversion/decode.py``). Spark's built-in ``from_protobuf`` /
``to_protobuf`` would be the zero-Python alternative but requires the
external spark-protobuf jar and compiled descriptor sets; this path
has no such dependency and supports the engine's config policies
(uint64/timestamp/enum rendering) during decode itself.

Scale notes:

* no shuffle — both directions are narrow per-partition maps;
* Arrow batching amortizes serialization (``mapInPandas``), and the
  compiled converters are built once per partition, not per row;
* predicate/column pruning still applies to everything upstream of
  the binary column scan.
"""

from __future__ import annotations

from typing import Any, Iterable, Iterator

import pyspark.sql.functions as F
from pyspark.sql import DataFrame
from pyspark.sql import types as T

from protarrow_spark.config import ProtarrowSparkConfig
from protarrow_spark.conversion.decode import message_builder
from protarrow_spark.conversion.encode import row_builder
from protarrow_spark.proto.message import parse, serialize
from protarrow_spark.proto.model import MessageType
from protarrow_spark.schema import message_type_to_schema


def decode_proto_bytes(
    df: DataFrame,
    bytes_col: str,
    mtype: MessageType,
    config: ProtarrowSparkConfig = ProtarrowSparkConfig(),
    keep_cols: list[str] | None = None,
) -> DataFrame:
    """Binary proto column -> typed columns per ``mtype``'s schema.

    ``keep_cols`` are passed through unchanged (e.g. a Kafka key /
    offset). Runs entirely on executors.
    """
    import pandas as pd

    schema = message_type_to_schema(mtype, config)
    keep = list(keep_cols or [])
    passthrough = [df.schema[c] for c in keep]
    out_schema = T.StructType(passthrough + list(schema.fields))
    out_names = [f.name for f in out_schema.fields]
    src = df.select(*keep, bytes_col)

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        build = row_builder(mtype, config)  # compiled once per partition
        for batch in batches:
            rows = []
            raw = batch[bytes_col]
            kept = [batch[c] for c in keep]
            for i in range(len(batch)):
                msg = parse(bytes(raw.iloc[i]), mtype)
                rows.append(tuple(k.iloc[i] for k in kept) + build(msg))
            yield pd.DataFrame.from_records(rows, columns=out_names)

    return src.mapInPandas(decode, out_schema)


def encode_proto_bytes(
    df: DataFrame,
    mtype: MessageType,
    config: ProtarrowSparkConfig = ProtarrowSparkConfig(),
    output_col: str = "proto",
    keep_cols: list[str] | None = None,
) -> DataFrame:
    """Typed columns -> serialized proto binary column.

    The sink shape: feed the result to Kafka / parquet with one
    ``binary`` column. Columns of ``df`` must match
    ``message_type_to_schema(mtype, config)`` (use
    :func:`protarrow_spark.conversion.cast_dataframe` first when they
    don't). Runs entirely on executors.
    """
    import pandas as pd

    keep = list(keep_cols or [])
    passthrough = [df.schema[c] for c in keep]
    out_schema = T.StructType(
        passthrough + [T.StructField(output_col, T.BinaryType(), nullable=False)]
    )
    out_names = [f.name for f in out_schema.fields]
    field_names = [f.name for f in message_type_to_schema(mtype, config).fields]
    src = df.select(*keep, *field_names)

    def encode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        build = message_builder(mtype, config)
        for batch in batches:
            records = batch.to_dict("records")
            kept = [batch[c] for c in keep]
            rows = []
            for i, rec in enumerate(records):
                data = serialize(build(rec))
                rows.append(tuple(k.iloc[i] for k in kept) + (data,))
            yield pd.DataFrame.from_records(rows, columns=out_names)

    return src.mapInPandas(encode, out_schema)


def proto_roundtrip(
    df: DataFrame,
    mtype: MessageType,
    config: ProtarrowSparkConfig = ProtarrowSparkConfig(),
) -> DataFrame:
    """encode -> wire bytes -> decode, fully distributed. Useful as a
    self-check operator: output equals input modulo the config's
    documented lossiness (ns truncation etc.).

    Fused into ONE ``mapInPandas`` hop: chaining the public
    ``encode_proto_bytes`` -> ``decode_proto_bytes`` plans two Python
    runners per task (double the Arrow JVM<->Python transfer and
    double the worker pool); the fused map exercises the identical
    codec path (message build -> serialize -> parse -> row build) with
    a single hop. In production the two directions are separate jobs
    (produce vs consume), so the fused form is also the honest cost
    model for each side."""
    import pandas as pd

    schema = message_type_to_schema(mtype, config)
    out_names = [f.name for f in schema.fields]
    src = df.select(*out_names)

    def roundtrip(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        to_msg = message_builder(mtype, config)
        to_row = row_builder(mtype, config)
        for batch in batches:
            rows = [
                to_row(parse(serialize(to_msg(rec)), mtype))
                for rec in batch.to_dict("records")
            ]
            yield pd.DataFrame.from_records(rows, columns=out_names)

    return src.mapInPandas(roundtrip, schema)


# ---------------------------------------------------------------------------
# Unified codec entry points: built-in spark-protobuf when present,
# native wire codec otherwise (SURVEY Phase 2's unification promise;
# the reference ecosystem's documented integration pattern is
# from_protobuf over a Kafka binary column, docs/faq.md:13-35).
# ---------------------------------------------------------------------------


def spark_protobuf_available(spark) -> bool:
    """True when Spark's built-in protobuf connector can actually run:
    the python wrapper imports AND the external spark-protobuf jar's
    classes load in the JVM (the wrapper ships with pyspark, the jar
    does not — ``--packages org.apache.spark:spark-protobuf_2.13``)."""
    try:
        from pyspark.sql.protobuf.functions import from_protobuf  # noqa: F401
    except Exception:
        return False
    try:
        spark._jvm.java.lang.Class.forName(
            "org.apache.spark.sql.protobuf.ProtobufDataToCatalyst"
        )
        return True
    except Exception:
        return False


def decode_proto_column(
    df: DataFrame,
    bytes_col: str,
    mtype: MessageType,
    config: ProtarrowSparkConfig = ProtarrowSparkConfig(),
    *,
    desc_file_path: str | None = None,
    message_full_name: str | None = None,
    keep_cols: list[str] | None = None,
) -> DataFrame:
    """Decode a binary proto column with the best available engine.

    Dispatch: when the spark-protobuf jar is live
    (:func:`spark_protobuf_available`) AND the caller supplies the
    compiled descriptor-set file + message full name the built-in
    ``from_protobuf`` runs — zero Python in the row path, Catalyst
    expression all the way. Otherwise (this environment: no jar, no
    protoc) the native Arrow-batched wire codec
    (:func:`decode_proto_bytes`) decodes with identical wire
    semantics.

    Caveat the caller owns: the built-in path uses spark-protobuf's
    fixed type mapping (enums as strings, uint64 as LongType); the
    native path applies this engine's config policies
    (uint64 decimal/long, enum int/string, timestamp flavors). At the
    default config the two differ only on uint64 (decimal vs
    wrapped-long) and enum rendering — pass
    ``ProtarrowSparkConfig(uint64_type="long", enum_type="string")``
    for drop-in parity.
    """
    spark = df.sparkSession
    if (
        desc_file_path is not None
        and message_full_name is not None
        and spark_protobuf_available(spark)
    ):
        from pyspark.sql.protobuf.functions import from_protobuf

        keep = list(keep_cols or [])
        decoded = df.select(
            *keep,
            from_protobuf(bytes_col, message_full_name, desc_file_path).alias(
                "__msg"
            ),
        )
        return decoded.select(*keep, "__msg.*")
    return decode_proto_bytes(df, bytes_col, mtype, config, keep_cols)


def encode_proto_column(
    df: DataFrame,
    mtype: MessageType,
    config: ProtarrowSparkConfig = ProtarrowSparkConfig(),
    *,
    desc_file_path: str | None = None,
    message_full_name: str | None = None,
    output_col: str = "proto",
    keep_cols: list[str] | None = None,
) -> DataFrame:
    """Encode typed columns to a binary proto column — built-in
    ``to_protobuf`` when live (jar + descriptor set), else the native
    wire codec (:func:`encode_proto_bytes`). Same dispatch + type-
    mapping caveats as :func:`decode_proto_column`."""
    spark = df.sparkSession
    if (
        desc_file_path is not None
        and message_full_name is not None
        and spark_protobuf_available(spark)
    ):
        from pyspark.sql.protobuf.functions import to_protobuf

        keep = list(keep_cols or [])
        field_names = [
            f.name for f in message_type_to_schema(mtype, config).fields
        ]
        return df.select(
            *keep,
            to_protobuf(
                F.struct(*field_names), message_full_name, desc_file_path
            ).alias(output_col),
        )
    return encode_proto_bytes(df, mtype, config, output_col, keep_cols)
