"""Engine configuration.

Mirrors the policy surface of the reference's ``ProtarrowConfig``
(``/root/reference/protarrow/common.py:47-100``) re-targeted at Spark's
type system (SURVEY.md §1.2):

* Spark has no unsigned ints -> uint32 widens to LongType; uint64 is a
  policy choice (DecimalType(20,0) exact vs LongType reinterpret).
* Spark timestamps are microsecond -> nanosecond fidelity is a policy
  choice (LongType nanos vs TimestampType truncation).
* Spark has no time-of-day type -> LongType nanos-of-day + metadata tag.
* No engine-level dictionary type -> enums are int32 or string.
"""

from __future__ import annotations

import dataclasses

_VALID_ENUM = ("int", "string")
_VALID_UINT64 = ("decimal", "long")
_VALID_TIMESTAMP = ("timestamp", "long_nanos")
_VALID_DURATION = ("interval", "long_nanos")


@dataclasses.dataclass(frozen=True)
class ProtarrowSparkConfig:
    """Type-mapping policy for proto <-> Spark conversion.

    Parallels ``ProtarrowConfig`` (``common.py:47-100`` in the
    reference); knobs that only distinguish Arrow physical layouts
    (``large_string``/``large_binary``/``list_array_type``) have no
    Spark counterpart and are intentionally absent.
    """

    #: "int" -> IntegerType (enum number), "string" -> StringType (enum name).
    enum_type: str = "int"
    #: "decimal" -> DecimalType(20,0) (exact), "long" -> LongType (2^63 wrap).
    uint64_type: str = "decimal"
    #: "timestamp" -> TimestampType (microsecond, truncates ns),
    #: "long_nanos" -> LongType epoch-nanos (lossless round-trip).
    timestamp_type: str = "timestamp"
    #: "interval" -> DayTimeIntervalType (microsecond), "long_nanos" -> LongType.
    duration_type: str = "interval"
    #: proto map<k,v> as MapType (False) or ArrayType(StructType(key,value)) (True).
    #: Mirrors ``map_as_list`` (``proto_to_arrow.py:272-305``).
    map_as_list: bool = False
    #: Relax nullability (the reference's four knobs, ``common.py:53-56``).
    list_nullable: bool = False
    map_nullable: bool = False
    list_value_nullable: bool = False
    map_value_nullable: bool = False
    #: When set, write the proto field number into StructField metadata
    #: under this key (e.g. "PARQUET:field_id"); mirrors ``common.py:59,89-93``.
    field_number_key: str | None = None
    #: Recursive message policy: raise (False) or prune to empty struct (True).
    #: Mirrors ``skip_recursive_messages`` (``proto_to_arrow.py:208-216``).
    skip_recursive_messages: bool = False

    def __post_init__(self) -> None:
        if self.enum_type not in _VALID_ENUM:
            raise ValueError(f"enum_type must be one of {_VALID_ENUM}: {self.enum_type}")
        if self.uint64_type not in _VALID_UINT64:
            raise ValueError(f"uint64_type must be one of {_VALID_UINT64}: {self.uint64_type}")
        if self.timestamp_type not in _VALID_TIMESTAMP:
            raise ValueError(
                f"timestamp_type must be one of {_VALID_TIMESTAMP}: {self.timestamp_type}"
            )
        if self.duration_type not in _VALID_DURATION:
            raise ValueError(
                f"duration_type must be one of {_VALID_DURATION}: {self.duration_type}"
            )
