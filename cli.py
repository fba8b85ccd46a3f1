"""3DF-style CLI over the JSON-lines TCP transport.

Parity with the reference's cli/ (cli/src/main.rs): each invocation
acts as a client of a running server — `ping` sends Status, `req`
sends raw JSON requests (argument or stdin), `tx` transacts datoms,
`gql` derives attributes from a GraphQL query. Additionally `serve`
starts a server on this machine and `query` runs a one-shot Datalog
text query against local testdata without a server.

    python cli.py serve --port 6262
    python cli.py ping --port 6262
    python cli.py req '[{"CreateAttribute": {"name": "x", "config": null}}]'
    python cli.py tx '[[{"Eid": 1}, "x", {"Number": 5}, null, 1]]'
    python cli.py gql '{ hero(name: "Dipper") { name } }' myns
"""

from __future__ import annotations

import argparse
import json
import socket
import sys


def _send(host: str, port: int, requests: list, ws: bool = False) -> list:
    if ws:
        from declarative_dataflow_spark.ws import WsClient

        client = WsClient(host, port)
        try:
            client.send_text(json.dumps(requests))
            reply = client.recv_text()
            return json.loads(reply) if reply is not None else []
        finally:
            client.close()
    with socket.create_connection((host, port)) as s:
        f = s.makefile("rw")
        f.write(json.dumps(requests) + "\n")
        f.flush()
        return json.loads(f.readline())


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--host", default="127.0.0.1")
    ap.add_argument("--port", type=int, default=6262)
    ap.add_argument(
        "--ws",
        action="store_true",
        help="connect over RFC 6455 WebSocket (the reference's "
        "transport) instead of JSON lines over TCP",
    )
    sub = ap.add_subparsers(dest="cmd", required=True)
    sub.add_parser("ping")
    p_req = sub.add_parser("req")
    p_req.add_argument("request", nargs="?")
    p_tx = sub.add_parser("tx")
    p_tx.add_argument("txdata", nargs="?")
    p_gql = sub.add_parser("gql")
    p_gql.add_argument("query")
    p_gql.add_argument("namespace")
    p_serve = sub.add_parser("serve")
    p_serve.add_argument("--master", default=None)
    p_serve.add_argument(
        "--ws",
        action="store_true",
        # SUPPRESS: without it the subparser's False default would
        # clobber a top-level `--ws` given before the subcommand
        # (argparse copies the sub-namespace over the parent).
        default=argparse.SUPPRESS,
        help="speak RFC 6455 WebSocket (the reference's transport) "
        "instead of JSON lines over TCP",
    )
    p_query = sub.add_parser("query")
    p_query.add_argument("text")
    p_query.add_argument("--sf-dir", default="/root/testdata/sf0.001")
    args = ap.parse_args(argv)

    if args.cmd == "ping":
        out = _send(args.host, args.port, ["Status"], ws=args.ws)
    elif args.cmd == "req":
        raw = args.request if args.request else sys.stdin.read()
        out = _send(args.host, args.port, json.loads(raw), ws=args.ws)
    elif args.cmd == "tx":
        raw = args.txdata if args.txdata else sys.stdin.read()
        out = _send(
            args.host, args.port, [{"Transact": json.loads(raw)}], ws=args.ws
        )
    elif args.cmd == "gql":
        out = _send(
            args.host,
            args.port,
            [{"Derive": [args.query, args.namespace]}],
            ws=args.ws,
        )
    elif args.cmd == "serve":
        from declarative_dataflow_spark.server import Server, serve, serve_ws
        from declarative_dataflow_spark.session import build_session

        spark = build_session("server", master=args.master)
        srv = Server(spark)
        transport = serve_ws if args.ws else serve
        tcp, thread, port = transport(srv, args.host, args.port)
        proto = "ws" if args.ws else "tcp"
        print(f"serving ({proto}) on {args.host}:{port}", flush=True)
        try:
            thread.join()
        except KeyboardInterrupt:
            tcp.shutdown()
        return 0
    else:  # query
        from declarative_dataflow_spark.plan.datalog import query
        from declarative_dataflow_spark.session import build_session
        from declarative_dataflow_spark.sources.testdata import load_engine

        spark = build_session("cli-query")
        eng = load_engine(spark, args.sf_dir)
        for row in query(eng, args.text).collect():
            print(json.dumps(list(row), default=str))
        return 0

    for o in out:
        print(json.dumps(o))
    return 0


if __name__ == "__main__":
    sys.exit(main())
