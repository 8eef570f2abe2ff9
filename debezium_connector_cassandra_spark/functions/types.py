"""Cassandra -> Spark type mapping with handling modes (type-system breadth).

Reference parity:
- type registry            cassandra-4/.../Cassandra4TypeProvider.java:65-105
  (~20 base deserializers, collection/tuple/UDT composition under
  core/.../transforms/type/*)
- decimal.handling.mode    core/.../CassandraConnectorConfig.java:85-159
  (PRECISE -> logical decimal, DOUBLE -> float64, STRING -> formatted string)
- varint.handling.mode     core/.../CassandraConnectorConfig.java:161-238
  (PRECISE -> decimal(38,0), LONG -> int64, STRING -> string)
- round-trip test model    cassandra-4/src/test/.../CassandraTypeDeserializerTest.java:75+

The engine's cells travel as typed Spark SQL values (parquet/Arrow native),
so "deserialization" here is the SCHEMA mapping plus the JSON payload
round-trip (to_json/from_json) used by the commit-log fidelity mode; the
LWW reduction accepts any mapped type (non-orderable payloads like maps ride
through max_by, see operators/lww.py).

Type strings accept Cassandra DDL syntax, e.g.::

    map<text, frozen<list<int>>>
    tuple<int, text, timestamp>
    frozen<address>            -- UDT via the udts registry

"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import types as T


class DecimalMode:
    PRECISE = "precise"  # DecimalType(38, 18)
    DOUBLE = "double"
    STRING = "string"


class VarintMode:
    PRECISE = "precise"  # DecimalType(38, 0)
    LONG = "long"
    STRING = "string"


@dataclass
class TypeMapper:
    """Maps Cassandra type strings to Spark SQL types.

    ``udts``: user-defined-type registry — name -> ordered (field, cassandra
    type string) pairs (the SchemaHolder's UDT knowledge).
    """

    decimal_mode: str = DecimalMode.DOUBLE
    varint_mode: str = VarintMode.LONG
    udts: dict[str, tuple] = field(default_factory=dict)

    # -- scalar base types --------------------------------------------------
    def _scalar(self, name: str) -> T.DataType | None:
        m = {
            "ascii": T.StringType(),
            "text": T.StringType(),
            "varchar": T.StringType(),
            "tinyint": T.ByteType(),
            "smallint": T.ShortType(),
            "int": T.IntegerType(),
            "bigint": T.LongType(),
            "counter": T.LongType(),
            "float": T.FloatType(),
            "double": T.DoubleType(),
            "boolean": T.BooleanType(),
            "timestamp": T.TimestampType(),
            "date": T.DateType(),
            # time-of-day: nanoseconds since midnight (reference TimeType
            # transform emits int64 nanos)
            "time": T.LongType(),
            # duration: months/days/nanos triple (reference DurationType
            # emits Debezium NanoDuration int64; we keep the faithful triple)
            "duration": T.StructType(
                [
                    T.StructField("months", T.IntegerType(), True),
                    T.StructField("days", T.IntegerType(), True),
                    T.StructField("nanos", T.LongType(), True),
                ]
            ),
            "uuid": T.StringType(),
            "timeuuid": T.StringType(),
            "inet": T.StringType(),
            "blob": T.BinaryType(),
        }
        if name in m:
            return m[name]
        if name == "decimal":
            return {
                DecimalMode.PRECISE: T.DecimalType(38, 18),
                DecimalMode.DOUBLE: T.DoubleType(),
                DecimalMode.STRING: T.StringType(),
            }[self.decimal_mode]
        if name == "varint":
            return {
                VarintMode.PRECISE: T.DecimalType(38, 0),
                VarintMode.LONG: T.LongType(),
                VarintMode.STRING: T.StringType(),
            }[self.varint_mode]
        return None

    # -- parser ---------------------------------------------------------------
    def spark_type(self, cassandra_type: str) -> T.DataType:
        toks = _tokenize(cassandra_type)
        dtype, pos = self._parse(toks, 0)
        if pos != len(toks):
            raise ValueError(f"trailing tokens in type: {cassandra_type!r}")
        return dtype

    def _parse(self, toks: list[str], i: int) -> tuple[T.DataType, int]:
        if i >= len(toks):
            raise ValueError("unexpected end of type string")
        name = toks[i]
        i += 1
        if name == "frozen":
            # frozen<> affects Cassandra storage, not the logical type
            i = _expect(toks, i, "<")
            inner, i = self._parse(toks, i)
            i = _expect(toks, i, ">")
            return inner, i
        if name in ("list", "set"):
            i = _expect(toks, i, "<")
            elem, i = self._parse(toks, i)
            i = _expect(toks, i, ">")
            return T.ArrayType(elem, True), i
        if name == "map":
            i = _expect(toks, i, "<")
            k, i = self._parse(toks, i)
            i = _expect(toks, i, ",")
            v, i = self._parse(toks, i)
            i = _expect(toks, i, ">")
            return T.MapType(k, v, True), i
        if name == "tuple":
            i = _expect(toks, i, "<")
            fields, idx = [], 0
            while True:
                elem, i = self._parse(toks, i)
                fields.append(T.StructField(f"_{idx}", elem, True))
                idx += 1
                if toks[i] == ",":
                    i += 1
                    continue
                break
            i = _expect(toks, i, ">")
            return T.StructType(fields), i
        scalar = self._scalar(name)
        if scalar is not None:
            return scalar, i
        if name in self.udts:
            return (
                T.StructType(
                    [
                        T.StructField(fname, self.spark_type(ftype), True)
                        for fname, ftype in self.udts[name]
                    ]
                ),
                i,
            )
        raise ValueError(f"unknown cassandra type: {name!r}")

    def payload_from_ddl(self, columns: list[tuple[str, str]]) -> tuple:
        """(name, cassandra-type-string) pairs -> a TableSpec payload tuple."""
        return tuple((n, self.spark_type(t)) for n, t in columns)


def uuid_str_from_bytes(col):
    """binary(16) -> canonical lowercase uuid string, as a Catalyst
    expression (UuidUtil.asUuid analog, core/.../UuidUtil.java:17-22 —
    big-endian msb/lsb longs == left-to-right hex)."""
    from pyspark.sql import functions as F

    h = F.lower(F.hex(col))
    return F.concat_ws(
        "-",
        F.substring(h, 1, 8),
        F.substring(h, 9, 4),
        F.substring(h, 13, 4),
        F.substring(h, 17, 4),
        F.substring(h, 21, 12),
    )


def uuid_bytes_from_str(col):
    """canonical uuid string -> binary(16) (UuidUtil.asBytes analog,
    UuidUtil.java:24-29)."""
    from pyspark.sql import functions as F

    return F.unhex(F.regexp_replace(col, "-", ""))


def _tokenize(s: str) -> list[str]:
    out, cur = [], []
    for ch in s:
        if ch in "<>,":
            if cur:
                out.append("".join(cur).strip())
                cur = []
            out.append(ch)
        else:
            cur.append(ch)
    if cur:
        out.append("".join(cur).strip())
    return [t.lower() if t not in "<>," else t for t in out if t.strip() or t in "<>,"]


def _expect(toks: list[str], i: int, tok: str) -> int:
    if i >= len(toks) or toks[i] != tok:
        raise ValueError(f"expected {tok!r} at {i} in {toks}")
    return i + 1
