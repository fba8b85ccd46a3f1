"""End-to-end walkthrough: every way to talk to the engine.

Mirrors the reference README's getting-started flow (README.md:46-88):
create attributes, transact facts, register a rule, subscribe, watch
diffs — then the same rule through the Datalog text syntax, the JSON
wire protocol, and the incremental delta-join path.

Run: python examples/demo.py (from the repo root or anywhere)
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from declarative_dataflow_spark import Datom, Engine, Join, MatchA
from declarative_dataflow_spark.plan.datalog import query
from declarative_dataflow_spark.server import Server
from declarative_dataflow_spark.session import build_session
from declarative_dataflow_spark.streaming.reactive import ReactiveSession


def main() -> None:
    spark = build_session("demo", master="local[4]")

    # 1. Programmatic plans ------------------------------------------------
    eng = Engine(spark)
    eng.create_attribute("name")
    eng.create_attribute("age")
    eng.transact(
        [
            Datom.add(1, "name", "Dipper"),
            Datom.add(1, "age", 12),
            Datom.add(2, "name", "Mabel"),
            Datom.add(2, "age", 13),
        ]
    )
    people = Join(
        ["?e"], MatchA("?e", "name", "?n"), MatchA("?e", "age", "?a")
    )
    print("-- programmatic plan --")
    eng.implement(people, ["e", "name", "age"]).show()

    # 2. Datalog text (clj-3df syntax) ------------------------------------
    print("-- datalog text --")
    query(eng, "[:find ?e ?n :where [?e :name ?n] [?e :age ?a] [(< ?a 13)]]").show()

    # 3. Reactive: transact -> incremental diffs ---------------------------
    print("-- reactive diffs --")
    from declarative_dataflow_spark.plan.plans import AttributeBinding, Hector

    eng.register(
        "people",
        Hector(
            ["?e", "?n", "?a"],
            [
                AttributeBinding("?e", "name", "?n"),
                AttributeBinding("?e", "age", "?a"),
            ],
        ),
    )
    session = ReactiveSession(eng)
    session.interest(
        "people",
        callback=lambda df, epoch: print(f"epoch {epoch}:", df.collect()),
    )
    session.advance()  # replay current state
    session.transact([Datom.add(3, "name", "Soos"), Datom.add(3, "age", 22)])
    session.transact([Datom.retract(3, "age", 22)])

    # 4. The JSON wire protocol (what a reference client sends) ------------
    print("-- wire protocol --")
    srv = Server(spark)
    out = srv.handle(
        [
            {"CreateAttribute": {"name": "color", "config": None}},
            {"Transact": [[{"Eid": 7}, "color", "teal", None, 1]]},
            {"Subscribe": "color"},
            "Status",
        ]
    )
    for o in out:
        print(o)

    spark.stop()


if __name__ == "__main__":
    main()
