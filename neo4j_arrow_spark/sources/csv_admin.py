"""S6 — neo4j-admin-style CSV reader.

Reference: the Python client's ``pyimport.py`` parses bulk-import CSV
headers (``personId:ID(Person),age:int,active:boolean,vector:float[]``)
into Arrow tables (``python/pyimport.py:28-124``; header spec per the
Neo4j ops manual). Field model parity: the ``FieldType`` enum
(pyimport.py:34-52) plus reserved markers ``:ID(:space)``, ``:LABEL``,
``:START_ID``, ``:END_ID``, ``:TYPE``; array types via ``[]`` suffix
with ``;``-separated values.

Spark translation: parse the header into an explicit schema + rename
plan, then ``spark.read.csv(schema=...)`` — columnar, distributed, and
pushdown-capable, vs the reference's single-process pyarrow.csv parse.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from neo4j_arrow_spark.graph import NodeField, RelField

#: FieldType parity (pyimport.py:34-52); unknown types fall back to
#: string exactly like FieldType.from_str.
_SCALAR_TYPES: dict[str, T.DataType] = {
    "string": T.StringType(),
    "char": T.StringType(),
    "byte": T.ByteType(),
    "short": T.ShortType(),
    "int": T.IntegerType(),
    "long": T.LongType(),
    "float": T.FloatType(),
    "double": T.DoubleType(),
    "boolean": T.BooleanType(),
}

ARRAY_DELIMITER = ";"  # neo4j-admin default --array-delimiter


@dataclass
class Field:
    """One parsed header field (pyimport.py:55-58)."""

    name: str  # output column name
    raw: str  # csv column name used while reading
    kind: str  # 'ID' | 'LABEL' | 'START_ID' | 'END_ID' | 'TYPE' | 'prop'
    dtype: T.DataType
    is_array: bool = False
    id_space: str = "Global"


def parse_field(spec: str, position: int) -> Field:
    """Parse ``name:type``, ``:LABEL``, ``name:ID(Space)``,
    ``vec:float[]`` (pyimport.py:77-90)."""
    if ":" in spec:
        name, type_part = spec.split(":", 1)
    else:
        name, type_part = spec, "string"
    id_space = "Global"
    if "(" in type_part and type_part.endswith(")"):
        type_part, id_space = type_part[:-1].split("(", 1)
    is_array = type_part.endswith("[]")
    if is_array:
        type_part = type_part[:-2]
    raw = name or f"_c{position}"

    if type_part in ("ID", "START_ID", "END_ID", "TYPE", "LABEL"):
        reserved_names = {
            "ID": NodeField.ID,
            "START_ID": RelField.START_ID,
            "END_ID": RelField.END_ID,
            "TYPE": RelField.TYPE,
            "LABEL": NodeField.LABELS,
        }
        dtype = T.StringType() if type_part in ("TYPE", "LABEL") else T.LongType()
        return Field(
            name=reserved_names[type_part],
            raw=raw,
            kind=type_part,
            dtype=dtype,
            is_array=type_part == "LABEL",
            id_space=id_space,
        )
    dtype = _SCALAR_TYPES.get(type_part, T.StringType())
    return Field(name=raw, raw=raw, kind="prop", dtype=dtype, is_array=is_array)


def parse_header(header: str, delimiter: str = ",") -> list[Field]:
    """pyimport.py:93-104."""
    return [parse_field(s.strip(), i) for i, s in enumerate(header.split(delimiter))]


def read_admin_csv(
    spark: SparkSession,
    path: str,
    header: str | None = None,
    delimiter: str = ",",
) -> DataFrame:
    """Read a neo4j-admin import CSV into a graph-convention DataFrame.

    ``header`` overrides the file's first line (neo4j-admin supports
    separate header files); when None, the first line of the file is
    the header. Arrays arrive ``;``-joined and are split + cast here.
    """
    if header is None:
        first = spark.read.text(path).limit(1).collect()
        if not first:
            raise ValueError(f"empty CSV at {path}")
        header = first[0][0]
        skip_header = True
    else:
        skip_header = False

    fields = parse_header(header, delimiter)
    # read everything as string; arrays need the split, and neo4j-admin
    # CSVs quote freely — explicit casts below keep behavior exact.
    read_schema = T.StructType(
        [T.StructField(f.raw, T.StringType(), True) for f in fields]
    )
    df = spark.read.csv(
        path, schema=read_schema, header=skip_header, sep=delimiter
    )

    cols = []
    for f in fields:
        c = F.col(f.raw)
        if f.kind == "LABEL":
            # multi-label rows are ';'-separated in admin CSVs
            col = F.split(c, ARRAY_DELIMITER).alias(NodeField.LABELS)
        elif f.is_array:
            col = F.transform(
                F.split(c, ARRAY_DELIMITER), lambda x: x.cast(f.dtype)
            ).alias(f.name)
        else:
            col = c.cast(f.dtype).alias(f.name)
        cols.append(col)
    return df.select(*cols)


_TYPE_NAMES: dict[type, str] = {
    T.StringType: "string",
    T.ByteType: "byte",
    T.ShortType: "short",
    T.IntegerType: "int",
    T.LongType: "long",
    T.FloatType: "float",
    T.DoubleType: "double",
    T.BooleanType: "boolean",
}


def _type_name(dtype: T.DataType) -> str:
    name = _TYPE_NAMES.get(type(dtype))
    if name is None:
        raise ValueError(f"no admin-CSV spelling for {dtype.simpleString()}")
    return name


def write_admin_csv(
    df: DataFrame,
    path: str,
    kind: str = "nodes",
    delimiter: str = ",",
) -> str:
    """Export a graph-convention DataFrame to the neo4j-admin import
    CSV layout — the writer half of the S6 roundtrip, so a graph built
    here can feed the reference's own bulk importer.

    Data rows land at ``path`` (a distributed header-less CSV write —
    the import tool takes data and header separately, which keeps the
    write parallel); the header spec is returned AND written to
    ``path + ".header"``. Arrays (and LABELS) are ``;``-joined per the
    --array-delimiter default; read_admin_csv(header=...) inverts this
    exactly (tests pin the roundtrip)."""
    if kind not in ("nodes", "rels"):
        raise ValueError(f"kind must be 'nodes' or 'rels', got {kind!r}")
    reserved = {
        NodeField.ID: "ID",
        NodeField.LABELS: "LABEL",
        RelField.START_ID: "START_ID",
        RelField.END_ID: "END_ID",
        RelField.TYPE: "TYPE",
    }
    specs, cols = [], []
    for f in df.schema.fields:
        c = F.col(f.name)
        if f.name in reserved and (
            (kind == "nodes" and f.name in NodeField.RESERVED)
            or (kind == "rels" and f.name in RelField.RESERVED)
        ):
            specs.append(f"{f.name}:{reserved[f.name]}")
            if f.name == NodeField.LABELS:
                c = F.array_join(c, ARRAY_DELIMITER)
        elif isinstance(f.dataType, T.ArrayType):
            specs.append(f"{f.name}:{_type_name(f.dataType.elementType)}[]")
            c = F.array_join(c.cast("array<string>"), ARRAY_DELIMITER)
        else:
            specs.append(f"{f.name}:{_type_name(f.dataType)}")
            c = c.cast("string")
        cols.append(c.alias(f.name))
    header = delimiter.join(specs)
    df.select(*cols).write.mode("overwrite").option("header", False).option(
        "sep", delimiter
    ).csv(path)
    with open(path + ".header", "w") as fh:
        fh.write(header + "\n")
    return header
