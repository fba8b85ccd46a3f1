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
    out = {r["root"]: json.loads(r["doc"]) for r in assoc_in(df, ["root", "child"]).collect()}
    doc = out["1"]
    assert doc["m"] == {"hero/name": "Dipper"}
    assert json.loads(doc["children"]["10"]) == {"sidekick/name": "Waddles"}
