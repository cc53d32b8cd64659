from protarrow_spark.proto.model import (
    DURATION,
    EMPTY,
    TIMESTAMP,
    WRAPPER_TYPES,
    EnumType,
    Field,
    Kind,
    MessageType,
    map_field,
)

__all__ = [
    "DURATION",
    "EMPTY",
    "TIMESTAMP",
    "WRAPPER_TYPES",
    "EnumType",
    "Field",
    "Kind",
    "MessageType",
    "map_field",
]
