"""File sources -> attributes (reference: src/sources/csv_file.rs,
json_file.rs)."""

from declarative_dataflow_spark import Join, MatchA
from declarative_dataflow_spark.engine import Engine
from declarative_dataflow_spark.sources.files import (
    ColumnSpec,
    register_csv_source,
    register_json_source,
)

from conftest import rows


def test_csv_source(spark, tmp_path):
    p = tmp_path / "people.csv"
    p.write_text("id,name,age\n1,Dipper,12\n2,Mabel,13\n")
    eng = Engine(spark)
    register_csv_source(
        eng,
        "people",
        str(p),
        "id",
        [ColumnSpec(":name", "name", "string"), ColumnSpec(":age", "age", "long")],
    )
    plan = Join(["?e"], MatchA("?e", ":name", "?n"), MatchA("?e", ":age", "?a"))
    assert rows(eng.implement(plan, ["e", "n", "a"])) == [
        (1, "Dipper", 12),
        (2, "Mabel", 13),
    ]


def test_json_source(spark, tmp_path):
    p = tmp_path / "people.json"
    p.write_text(
        '{"id": 1, "name": "Soos", "score": 7}\n'
        '{"id": 2, "name": "Wendy"}\n'
    )
    eng = Engine(spark)
    register_json_source(eng, "peoplej", str(p), "id", aid_prefix="p/")
    # one attribute per key; missing keys yield no (e, v) pair
    assert rows(eng.implement(MatchA("?e", "p/name", "?v"), ["e", "v"])) == [
        (1, "Soos"),
        (2, "Wendy"),
    ]
    assert rows(eng.implement(MatchA("?e", "p/score", "?v"), ["e", "v"])) == [
        (1, 7),
    ]
