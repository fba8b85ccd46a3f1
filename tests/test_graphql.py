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
    """Nested levels follow the reference PullLevel shape
    (src/plan/pull.rs:170-226): the link attribute is interleaved into
    the path, the cardinality-single child id is popped from attribute
    rows, and db__id rows carry it instead."""

    _hero_engine(engine)
    plan = graphql.compile_graphql(
        'query { hero(name: "Dipper") { name age friend { name } } }',
        ref_namespaces={"friend": "sidekick"},
    )
    df = engine.implement(plan, ["root", "link", "a", "v"])
    got = {tuple(r) for r in df.collect()}
    assert got == {
        ("1", None, "hero/name", "Dipper"),
        ("1", None, "hero/age", "12"),
        ("1", "hero/friend", "sidekick/name", "Waddles"),
        ("1", "hero/friend", "db__id", "10"),
    }


def test_assoc_in_single_level(engine):
    _hero_engine(engine)
    plan = graphql.compile_graphql('query { hero(name: "Mabel") { name age } }')
    df = engine.implement(plan, ["root", "a", "v"])
    docs = {r["root"]: json.loads(r["doc"]) for r in assoc_in(df, ["root"]).collect()}
    assert docs["2"] == {"hero/age": "13", "hero/name": "Mabel"}


def test_assoc_in_nested(engine):
    """Cardinality-single children nest directly under the link
    attribute (assoc-in semantics, src/sinks/assoc_in.rs:140-231), with
    db__id recording the child entity."""

    _hero_engine(engine)
    plan = graphql.compile_graphql(
        'query { hero(name: "Dipper") { name friend { name } } }',
        ref_namespaces={"friend": "sidekick"},
    )
    df = engine.implement(plan, ["root", "link", "a", "v"])
    out = {
        r["root"]: json.loads(r["doc"])
        for r in assoc_in(df, ["root", "link"]).collect()
    }
    doc = out["1"]
    assert doc["hero/name"] == "Dipper"
    friend = json.loads(doc["hero/friend"])
    assert friend == {"db__id": "10", "sidekick/name": "Waddles"}


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
    # Reference shape: intermediate entity ids stay in deep paths
    # (interleave keeps every path element, pull.rs:52-77); only each
    # level's own child id is popped and re-emitted as db__id.
    df = engine.implement(plan, ["root", "c1", "c2", "c3", "a", "v"])
    got = {tuple(r) for r in df.collect()}
    assert got == {
        ("1", None, None, None, "hero/name", "Dipper"),
        ("1", "hero/friend", None, None, "sidekick/name", "Waddles"),
        ("1", "hero/friend", None, None, "db__id", "10"),
        ("1", "hero/friend", "10", "sidekick/toy", "toy/label", "ball"),
        ("1", "hero/friend", "10", "sidekick/toy", "toy/label", "bone"),
        ("1", "hero/friend", "10", "sidekick/toy", "db__id", "100"),
        ("1", "hero/friend", "10", "sidekick/toy", "db__id", "101"),
    }
    out = {
        r["root"]: json.loads(r["doc"])
        for r in assoc_in(df, ["root", "c1", "c2", "c3"]).collect()
    }
    doc = out["1"]
    assert doc["hero/name"] == "Dipper"
    friend = json.loads(doc["hero/friend"])
    assert friend["sidekick/name"] == "Waddles"
    assert friend["db__id"] == "10"
    toys = json.loads(json.loads(friend["10"])["sidekick/toy"])
    assert json.loads(toys["toy/label"]) == ["ball", "bone"]
    assert json.loads(toys["db__id"]) == ["100", "101"]


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


def test_graphql_alias(engine):
    """Field aliases rename the output key while the scan reads the
    real attribute; the reference parses aliases via graphql_parser but
    its compiler ignores them — we honor response-key semantics."""

    _hero_engine(engine)
    plan = graphql.compile_graphql(
        'query { hero(name: "Dipper") { moniker: name bff: friend { name } } }',
        ref_namespaces={"friend": "sidekick"},
    )
    df = engine.implement(plan, ["root", "link", "a", "v"])
    got = {tuple(r) for r in df.collect()}
    assert got == {
        ("1", None, "moniker", "Dipper"),
        ("1", "bff", "sidekick/name", "Waddles"),
        ("1", "bff", "db__id", "10"),
    }


def test_graphql_fragments(engine):
    """Named fragment spreads splice into the selection set; the
    reference's compiler panics on Definition::Fragment
    (graphql.rs:92-97) — this front-end resolves them."""

    _hero_engine(engine)
    plan = graphql.compile_graphql(
        """
        query { hero(name: "Dipper") { ...basics friend { name } } }
        fragment basics on Hero { name age }
        """,
        ref_namespaces={"friend": "sidekick"},
    )
    df = engine.implement(plan, ["root", "link", "a", "v"])
    got = {tuple(r) for r in df.collect()}
    assert got == {
        ("1", None, "hero/name", "Dipper"),
        ("1", None, "hero/age", "12"),
        ("1", "hero/friend", "sidekick/name", "Waddles"),
        ("1", "hero/friend", "db__id", "10"),
    }


def test_graphql_inline_fragment(engine):
    _hero_engine(engine)
    plan = graphql.compile_graphql(
        'query { hero(name: "Mabel") { ... on Hero { name age } } }'
    )
    df = engine.implement(plan, ["root", "a", "v"])
    got = {tuple(r) for r in df.collect()}
    assert got == {
        ("2", "hero/name", "Mabel"),
        ("2", "hero/age", "13"),
    }


def test_graphql_fragment_cycle_rejected():
    import pytest

    with pytest.raises(ValueError, match="cycle"):
        graphql.compile_graphql(
            "query { hero { ...a } } fragment a on H { ...b } "
            "fragment b on H { ...a }"
        )


def test_graphql_variables(engine):
    """Operation variables substitute into argument values; declared
    defaults apply when the caller omits a name."""

    _hero_engine(engine)
    q = (
        'query Q($who: String = "Mabel") { hero(name: $who) { name age } }'
    )
    by_default = engine.implement(
        graphql.compile_graphql(q), ["root", "a", "v"]
    )
    assert {tuple(r) for r in by_default.collect()} == {
        ("2", "hero/name", "Mabel"),
        ("2", "hero/age", "13"),
    }
    supplied = engine.implement(
        graphql.compile_graphql(q, variables={"who": "Dipper"}),
        ["root", "a", "v"],
    )
    assert {tuple(r) for r in supplied.collect()} == {
        ("1", "hero/name", "Dipper"),
        ("1", "hero/age", "12"),
    }

    import pytest

    with pytest.raises(ValueError, match="missing variable"):
        graphql.compile_graphql(
            "query ($who: String) { hero(name: $who) { name } }"
        )


def test_pull_level_cardinality_many(engine):
    """cardinality_many=True keeps the child entity id in the row and
    emits no db__id (src/plan/pull.rs:173-186)."""

    from declarative_dataflow_spark.plan.plans import (
        AttributeBinding,
        Hector,
        PullLevel,
    )

    for a in ("hero/name", "hero/friend", "sidekick/name"):
        engine.create_attribute(a)
    engine.transact(
        [
            Datom.add(1, "hero/name", "Dipper"),
            Datom.add(1, "hero/friend", 10),
            Datom.add(1, "hero/friend", 11),
            Datom.add(10, "sidekick/name", "Waddles"),
            Datom.add(11, "sidekick/name", "Gompers"),
        ]
    )
    plan = PullLevel(
        ["?h", "?f"],
        Hector(
            ["?h", "?f"],
            [
                AttributeBinding("?h", "hero/friend", "?f"),
            ],
        ),
        "?f",
        ["sidekick/name"],
        path_attributes=["hero/friend"],
        cardinality_many=True,
    )
    df = engine.implement(plan, ["root", "link", "child", "a", "v"])
    got = {tuple(r) for r in df.collect()}
    assert got == {
        (1, "hero/friend", 10, "sidekick/name", "Waddles"),
        (1, "hero/friend", 11, "sidekick/name", "Gompers"),
    }


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


def test_pull_level_reference_case(engine):
    """Ported verbatim from tests/pull_test.rs:108-143 pull_level():
    '[:find (pull ?e [:name :age]) :where [?e :admin? false]]' — rows
    only for entities matching the root plan, absent attributes (300's
    age) simply missing, no row for the non-matching entity 100."""

    from declarative_dataflow_spark.plan.plans import MatchAV, PullLevel

    for a in ("admin?", "name", "age"):
        engine.create_attribute(a)
    engine.transact(
        [
            Datom.add(100, "admin?", True),
            Datom.add(200, "admin?", False),
            Datom.add(300, "admin?", False),
            Datom.add(100, "name", "Mabel"),
            Datom.add(200, "name", "Dipper"),
            Datom.add(300, "name", "Soos"),
            Datom.add(100, "age", 12),
            Datom.add(200, "age", 13),
        ]
    )
    plan = PullLevel(
        ["?e"],
        MatchAV("?e", "admin?", False),
        "?e",
        ["name", "age"],
    )
    df = engine.implement(plan)
    got = {tuple(r)[:3] for r in df.collect()}
    assert got == {
        (200, "age", "13"),
        (200, "name", "Dipper"),
        (300, "name", "Soos"),
    }
