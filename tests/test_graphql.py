"""GraphQL front end + AssocIn document assembly
(reference: src/plan/graphql.rs, src/sinks/assoc_in.rs)."""

import json

from declarative_dataflow_spark import Datom
from declarative_dataflow_spark.plan import graphql
from declarative_dataflow_spark.sinks.assoc_in import assoc_in

from conftest import rows


def _hero_engine(engine):
    for a in ("hero/name", "hero/age", "hero/friend", "sidekick/name"):
        engine.create_attribute(a)
    engine.transact(
        [
            Datom.add(1, "hero/name", "Dipper"),
            Datom.add(1, "hero/age", "12"),
            Datom.add(2, "hero/name", "Mabel"),
            Datom.add(2, "hero/age", "13"),
            Datom.add(1, "hero/friend", 10),
            Datom.add(10, "sidekick/name", "Waddles"),
        ]
    )
    return engine


def test_parse_nested_args():
    fields = graphql.parse('query { hero(name: "Dipper", age: 12) { name friend { name } } }')
    assert len(fields) == 1
    hero = fields[0]
    assert hero.arguments == {"name": "Dipper", "age": 12}
    assert [f.name for f in hero.selections] == ["name", "friend"]
    assert hero.selections[1].selections[0].name == "name"


def test_graphql_pull_rows(engine):
    _hero_engine(engine)
    plan = graphql.compile_graphql(
        'query { hero(name: "Dipper") { name age friend { name } } }',
        ref_namespaces={"friend": "sidekick"},
    )
    df = engine.implement(plan, ["root", "child", "a", "v"])
    got = {tuple(r) for r in df.collect()}
    assert got == {
        ("1", None, "hero/name", "Dipper"),
        ("1", None, "hero/age", "12"),
        ("1", "10", "sidekick/name", "Waddles"),
    }


def test_assoc_in_single_level(engine):
    _hero_engine(engine)
    plan = graphql.compile_graphql('query { hero(name: "Mabel") { name age } }')
    df = engine.implement(plan, ["root", "a", "v"])
    docs = {r["root"]: json.loads(r["doc"]) for r in assoc_in(df, ["root"]).collect()}
    assert docs["2"] == {"hero/age": "13", "hero/name": "Mabel"}


def test_assoc_in_nested(engine):
    _hero_engine(engine)
    plan = graphql.compile_graphql(
        'query { hero(name: "Dipper") { name friend { name } } }',
        ref_namespaces={"friend": "sidekick"},
    )
    df = engine.implement(plan, ["root", "child", "a", "v"])
    out = {
        r["root"]: json.loads(r["doc"])
        for r in assoc_in(df, ["root", "child"], links=["hero/friend"]).collect()
    }
    doc = out["1"]
    assert doc["hero/name"] == "Dipper"
    children = json.loads(doc["hero/friend"])
    assert json.loads(children["10"]) == {"sidekick/name": "Waddles"}


def test_graphql_depth_three(engine):
    """Three nesting levels + an argument on a nested field."""

    for a in (
        "hero/name",
        "hero/friend",
        "sidekick/name",
        "sidekick/toy",
        "toy/label",
        "toy/color",
    ):
        engine.create_attribute(a)
    engine.transact(
        [
            Datom.add(1, "hero/name", "Dipper"),
            Datom.add(1, "hero/friend", 10),
            Datom.add(10, "sidekick/name", "Waddles"),
            Datom.add(10, "sidekick/toy", 100),
            Datom.add(10, "sidekick/toy", 101),
            Datom.add(100, "toy/label", "ball"),
            Datom.add(100, "toy/color", "red"),
            Datom.add(101, "toy/label", "bone"),
            Datom.add(101, "toy/color", "red"),
        ]
    )
    plan = graphql.compile_graphql(
        'query { hero(name: "Dipper") { name friend { name toy(color: "red") '
        "{ label } } } }",
        ref_namespaces={"friend": "sidekick"},
    )
    df = engine.implement(plan, ["root", "child", "grandchild", "a", "v"])
    got = {tuple(r) for r in df.collect()}
    assert got == {
        ("1", None, None, "hero/name", "Dipper"),
        ("1", "10", None, "sidekick/name", "Waddles"),
        ("1", "10", "100", "toy/label", "ball"),
        ("1", "10", "101", "toy/label", "bone"),
    }
    out = {
        r["root"]: json.loads(r["doc"])
        for r in assoc_in(
            df,
            ["root", "child", "grandchild"],
            links=["hero/friend", "sidekick/toy"],
        ).collect()
    }
    doc = out["1"]
    assert doc["hero/name"] == "Dipper"
    friend = json.loads(json.loads(doc["hero/friend"])["10"])
    assert friend["sidekick/name"] == "Waddles"
    toys = {
        k: json.loads(v) for k, v in json.loads(friend["sidekick/toy"]).items()
    }
    assert toys == {
        "100": {"toy/label": "ball"},
        "101": {"toy/label": "bone"},
    }


def test_derive_graphql(engine):
    """Derive variant: pull paths become queryable attributes
    (reference: src/derive/graphql.rs)."""

    from declarative_dataflow_spark.plan.plans import MatchA

    _hero_engine(engine)
    created = graphql.derive_graphql(
        engine,
        'query { hero(name: "Dipper") { name friend { name } } }',
        namespace="d",
        ref_namespaces={"friend": "sidekick"},
    )
    assert set(created) == {"d/hero/name", "d/sidekick/name"}
    # The derived attribute composes like any other attribute.
    got = rows(engine.implement(MatchA("?e", "d/sidekick/name", "?v")))
    assert got == [(10, "Waddles", 1)]
    # It tracks input changes: a new friend appears on re-query.
    engine.transact(
        [
            __import__("declarative_dataflow_spark").Datom.add(
                1, "hero/friend", 11
            ),
            __import__("declarative_dataflow_spark").Datom.add(
                11, "sidekick/name", "Gompers"
            ),
        ]
    )
    got = rows(engine.implement(MatchA("?e", "d/sidekick/name", "?v")))
    assert got == [(10, "Waddles", 1), (11, "Gompers", 1)]


def test_assoc_in_cardinality_many(spark):
    """Multi-valued attributes (the reference's :aka,
    query_test.rs:369-377) nest as JSON arrays instead of crashing
    map construction with duplicate keys."""

    from declarative_dataflow_spark.sinks.assoc_in import assoc_in

    df = spark.createDataFrame(
        [
            ("1", "person/aka", "ivolga"),
            ("1", "person/aka", "pi"),
            ("1", "person/name", "Ivan"),
        ],
        ["root", "a", "v"],
    )
    [row] = assoc_in(df, ["root"]).collect()
    doc = json.loads(row["doc"])
    assert doc["person/name"] == "Ivan"
    assert json.loads(doc["person/aka"]) == ["ivolga", "pi"]
