"""Datalog text front-end — queries are the reference's own test
description strings (tests/query_test.rs, aggregation_test.rs,
or_test.rs), run verbatim."""

from declarative_dataflow_spark import Datom
from declarative_dataflow_spark.plan.datalog import query
from declarative_dataflow_spark.plan.plans import (
    BinaryPredicateBinding,
    Predicate,
)

from conftest import rows


def _people(engine):
    for a in ("name", "age"):
        engine.create_attribute(a)
    engine.transact(
        [
            Datom.add(100, "name", "Ivan"),
            Datom.add(100, "age", 15),
            Datom.add(200, "name", "Petr"),
            Datom.add(200, "age", 37),
            Datom.add(300, "name", "Mabel"),
            Datom.add(300, "age", 26),
            Datom.add(400, "name", "Oleg"),
            Datom.add(400, "age", 10),
        ]
    )
    return engine


def test_match_a(engine):
    _people(engine)
    got = rows(query(engine, "[:find ?e ?n :where [?e :name ?n]]"))
    assert got == [
        (100, "Ivan", 1),
        (200, "Petr", 1),
        (300, "Mabel", 1),
        (400, "Oleg", 1),
    ]


def test_match_ea_entity_constant(engine):
    _people(engine)
    got = rows(query(engine, "[:find ?n :where [100 :name ?n]]"))
    assert got == [("Ivan", 1)]


def test_match_av_value_constant(engine):
    _people(engine)
    got = rows(query(engine, "[:find ?e :where [?e :name Mabel]]"))
    assert got == [(300, 1)]


def test_existence_pattern(engine):
    _people(engine)
    got = rows(query(engine, "[:find ?e :where [?e :name]]"))
    assert got == [(100, 1), (200, 1), (300, 1), (400, 1)]


def test_join(engine):
    _people(engine)
    got = rows(query(engine, "[:find ?e ?n ?a :where [?e :age ?a] [?e :name ?n]]"))
    assert got == [
        (100, "Ivan", 15, 1),
        (200, "Petr", 37, 1),
        (300, "Mabel", 26, 1),
        (400, "Oleg", 10, 1),
    ]


def test_predicate_with_constant(engine):
    _people(engine)
    got = rows(query(engine, "[:find ?e ?a :where [?e :age ?a] [(< ?a 18)]]"))
    assert got == [(100, 15, 1), (400, 10, 1)]


def test_predicate_two_vars(engine):
    _people(engine)
    q = (
        "[:find ?e1 ?e2 :where [?e1 :age ?a1] [?e2 :age ?a2] "
        "[(< ?a1 ?a2)] [(< ?e1 ?e2)]]"
    )
    got = {(r[0], r[1]) for r in query(engine, q).collect()}
    # age(100)=15 < age(200)=37 and age(300)=26; other ordered pairs fail.
    assert got == {(100, 200), (100, 300)}


def test_not(engine):
    _people(engine)
    got = rows(
        query(engine, "[:find ?e :where [?e :age ?a] (not [?e :name Mabel])]")
    )
    assert got == [(100,), (200,), (400,)]  # set semantics: no weight col


def test_or(engine):
    _people(engine)
    got = rows(
        query(engine, "[:find ?e :where (or [?e :name Oleg] [?e :age 10])]")
    )
    assert got == [(400,)]


def test_or_two_entities(engine):
    _people(engine)
    got = rows(
        query(engine, "[:find ?e :where (or [?e :name Oleg] [?e :age 15])]")
    )
    assert got == [(100,), (400,)]


def test_global_aggregate(engine):
    _people(engine)
    got = rows(query(engine, "[:find (count ?a) :where [?e :age ?a]]"))
    assert got == [(4,)]


def test_keyed_aggregate(engine):
    _people(engine)
    got = rows(query(engine, "[:find ?e (max ?a) :where [?e :age ?a]]"))
    assert got == [(100, 15), (200, 37), (300, 26), (400, 10)]


def test_sum_with(engine):
    """[:find (sum ?amount) :with ?e ...] — duplicate amounts from
    different entities each contribute (aggregation_test.rs:273)."""

    engine.create_attribute("amount")
    engine.transact(
        [
            Datom.add(1, "amount", 5),
            Datom.add(2, "amount", 5),
            Datom.add(3, "amount", 2),
        ]
    )
    got = rows(
        query(engine, "[:find (sum ?amount) :with ?e :where [?e :amount ?amount]]")
    )
    assert got == [(12,)]


def test_string_constant_quoted(engine):
    _people(engine)
    got = rows(query(engine, '[:find ?e :where [?e :name "Mabel"]]'))
    assert got == [(300, 1)]


def test_rule_invocation(engine):
    """(rulename ?a ?b) references a registered rule (clj-3df rule
    application) and joins with the surrounding patterns."""

    from declarative_dataflow_spark.plan.plans import (
        AttributeBinding,
        ConstantBinding,
        Hector,
    )

    _people(engine)
    engine.register(
        "adults",
        Hector(
            ["?p"],
            [
                AttributeBinding("?p", "age", "?a2"),
                BinaryPredicateBinding(["?lim", "?a2"], Predicate.GTE),  # ?a2 >= ?lim
                ConstantBinding("?lim", 18),
            ],
        ),
    )
    got = rows(query(engine, "[:find ?p ?n :where (adults ?p) [?p :name ?n]]"))
    assert [(r[0], r[1]) for r in got] == [(200, "Petr"), (300, "Mabel")]


def test_four_clause_join(engine):
    """Reference query_test.rs:346-365 verbatim: same-age pairs where
    ?e is named Ivan (with multi-valued name on entity 3)."""

    for a in ("name", "age"):
        engine.create_attribute(a)
    # Reference fixture: 1 Ivan/15, 2 Petr/10, 3 {Ivan, Petr}/10.
    engine.transact(
        [
            Datom.add(1, "name", "Ivan"),
            Datom.add(1, "age", 15),
            Datom.add(2, "name", "Petr"),
            Datom.add(2, "age", 10),
            Datom.add(3, "name", "Ivan"),
            Datom.add(3, "age", 10),
        ]
    )
    got = {
        tuple(r)[:3]
        for r in query(
            engine,
            "[:find ?e ?e2 ?n :where [?e :name Ivan] [?e :age ?a] "
            "[?e2 :age ?a] [?e2 :name ?n]]",
        ).collect()
    }
    # The reference's expectations verbatim (query_test.rs:359-363).
    assert got == {(1, 1, "Ivan"), (3, 3, "Ivan"), (3, 2, "Petr")}


def test_or_and_branches(engine):
    """or with (and ...) branches over shared variables
    (reference or_test.rs:244+)."""

    for a in ("name", "age"):
        engine.create_attribute(a)
    engine.transact(
        [
            Datom.add(1, "name", "Ivan"),
            Datom.add(1, "age", 10),
            Datom.add(2, "name", "Oleg"),
            Datom.add(2, "age", 20),
            Datom.add(3, "name", "Petr"),
            Datom.add(3, "age", 10),
        ]
    )
    got = rows(
        query(
            engine,
            "[:find ?e :where (or (and [?e :name Ivan] [?e :age 10]) "
            "(and [?e :name Oleg] [?e :age 20]))]",
        )
    )
    assert got == [(1,), (2,)]


def test_predicate_constant_first(engine):
    _people(engine)
    got = rows(query(engine, "[:find ?e ?a :where [?e :age ?a] [(< 18 ?a)]]"))
    assert got == [(200, 37, 1), (300, 26, 1)]


def test_or_join_projects_branch_vars(engine):
    """or-join with explicit unification vars: branches may bind
    different variable sets, projected to the join vars."""

    for a in ("name", "age", "likes"):
        engine.create_attribute(a)
    engine.transact(
        [
            Datom.add(1, "name", "Ivan"),
            Datom.add(1, "likes", "pizza"),
            Datom.add(2, "name", "Oleg"),
            Datom.add(2, "age", 30),
            Datom.add(3, "name", "Petr"),
        ]
    )
    got = rows(
        query(
            engine,
            "[:find ?e :where [?e :name ?n] "
            "(or-join [?e] (and [?e :likes ?l]) (and [?e :age ?a]))]",
        )
    )
    assert got == [(1, 1), (2, 1)]
