from __future__ import annotations

import pytest
from pyspark.sql import types as T

from neo4j_arrow_spark.sources.csv_admin import parse_header, read_admin_csv


def test_parse_header_reference_example():
    """The docstring example from pyimport.py:97-98."""
    fields = parse_header("personId:ID(Person),age:int,active:boolean,name,vector:float[]")
    assert [f.name for f in fields] == ["ID", "age", "active", "name", "vector"]
    assert fields[0].id_space == "Person"
    assert isinstance(fields[1].dtype, T.IntegerType)
    assert isinstance(fields[2].dtype, T.BooleanType)
    assert isinstance(fields[3].dtype, T.StringType)  # untyped -> string
    assert fields[4].is_array and isinstance(fields[4].dtype, T.FloatType)


def test_parse_rel_header():
    fields = parse_header(":START_ID,:END_ID,:TYPE,weight:double")
    assert [f.name for f in fields] == ["START_ID", "END_ID", "TYPE", "weight"]


def test_unknown_type_falls_back_to_string():
    (f,) = parse_header("when:datetime")
    assert isinstance(f.dtype, T.StringType)


@pytest.fixture()
def node_csv(tmp_path):
    p = tmp_path / "nodes_User_0.csv"
    p.write_text(
        "personId:ID,:LABEL,age:int,vector:float[]\n"
        "0,User,30,0.1;0.2\n"
        "1,User;Admin,40,0.3;0.4\n"
    )
    return str(p)


def test_read_admin_csv_nodes(spark, node_csv):
    df = read_admin_csv(spark, node_csv)
    assert df.columns == ["ID", "LABELS", "age", "vector"]
    rows = {r.ID: r for r in df.collect()}
    assert rows[1].LABELS == ["User", "Admin"]
    assert rows[0].age == 30
    assert rows[0].vector == pytest.approx([0.1, 0.2])


def test_read_admin_csv_external_header(spark, tmp_path):
    p = tmp_path / "rels.csv"
    p.write_text("0,1,FOLLOWS,2.5\n")
    df = read_admin_csv(spark, str(p), header=":START_ID,:END_ID,:TYPE,weight:double")
    r = df.collect()[0]
    assert (r.START_ID, r.END_ID, r.TYPE, r.weight) == (0, 1, "FOLLOWS", 2.5)


# ---- writer roundtrip ------------------------------------------------------

def test_write_then_read_nodes_roundtrip(spark, tmp_path):
    from neo4j_arrow_spark.sources.csv_admin import (
        read_admin_csv,
        write_admin_csv,
    )

    nodes = spark.createDataFrame(
        [
            (1, ["Person", "Admin"], "alice", 12.5, [0.1, 0.2]),
            (2, ["Person"], "bob", None, [0.3, 0.4]),
        ],
        "ID long, LABELS array<string>, name string, bal double, "
        "vec array<double>",
    )
    out = str(tmp_path / "nodes_csv")
    header = write_admin_csv(nodes, out, kind="nodes")
    assert header == "ID:ID,LABELS:LABEL,name:string,bal:double,vec:double[]"
    back = read_admin_csv(spark, out, header=header)
    got = {r.ID: r for r in back.collect()}
    assert got[1].LABELS == ["Person", "Admin"] and got[1].name == "alice"
    assert got[1].vec == [0.1, 0.2] and got[2].bal is None
    assert back.schema["vec"].dataType.simpleString() == "array<double>"


def test_write_then_read_rels_roundtrip(spark, tmp_path):
    from neo4j_arrow_spark.sources.csv_admin import (
        read_admin_csv,
        write_admin_csv,
    )

    rels = spark.createDataFrame(
        [(1, 2, "KNOWS", 1.5), (2, 3, "PAYS", 2.0)],
        "START_ID long, END_ID long, TYPE string, weight double",
    )
    out = str(tmp_path / "rels_csv")
    header = write_admin_csv(rels, out, kind="rels")
    assert header == (
        "START_ID:START_ID,END_ID:END_ID,TYPE:TYPE,weight:double"
    )
    back = read_admin_csv(spark, out, header=header)
    got = sorted((r.START_ID, r.END_ID, r.TYPE, r.weight) for r in back.collect())
    assert got == [(1, 2, "KNOWS", 1.5), (2, 3, "PAYS", 2.0)]


def test_write_admin_csv_header_sidecar(spark, tmp_path):
    from neo4j_arrow_spark.sources.csv_admin import write_admin_csv

    df = spark.createDataFrame([(1, ["X"])], "ID long, LABELS array<string>")
    out = str(tmp_path / "n")
    header = write_admin_csv(df, out, kind="nodes")
    assert open(out + ".header").read().strip() == header
