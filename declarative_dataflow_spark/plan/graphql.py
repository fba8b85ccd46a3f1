"""GraphQL front-end: parse a GraphQL selection document and compile it
to Pull plans over engine attributes.

Parity with the reference's GraphQl plan (src/plan/graphql.rs:22-57;
selection_set_to_paths 143-234): each nesting level becomes a
PullLevel whose base plan is a Hector constrained by parent-child
attribute bindings, and field arguments become constant bindings. The
reference reassembles nested JSON in the AssocIn sink — here
``sinks.assoc_in`` does the same on the flat path rows.

Attribute naming convention: a field ``f`` under namespace ``ns`` reads
attribute ``ns/f``; an object-valued field's attribute holds the child
entity id, and ``ref_namespaces`` maps the field name to the child's
namespace (the reference derives this from its schema registry).

The parser is a minimal hand-rolled recursive descent over the
GraphQL subset the reference exercises: selection sets, scalar fields,
nested fields, and Int/Float/String arguments.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field
from typing import Any, Optional

from .plans import (
    AttributeBinding,
    ConstantBinding,
    Hector,
    Plan,
    Project,
    Pull,
    PullLevel,
)

_TOKEN = re.compile(
    r"""\s*(?:(?P<punct>[{}():,])|(?P<string>"(?:[^"\\]|\\.)*")"""
    r"""|(?P<number>-?\d+(?:\.\d+)?)|(?P<name>[_A-Za-z][_0-9A-Za-z]*))"""
)


@dataclass
class Field:
    name: str
    arguments: dict[str, Any] = field(default_factory=dict)
    selections: list["Field"] = field(default_factory=list)


def _tokenize(src: str) -> list[tuple[str, str]]:
    out = []
    pos = 0
    while pos < len(src):
        m = _TOKEN.match(src, pos)
        if not m:
            if src[pos:].strip():
                raise ValueError(f"bad GraphQL syntax at {src[pos:pos+20]!r}")
            break
        pos = m.end()
        for kind in ("punct", "string", "number", "name"):
            if m.group(kind) is not None:
                out.append((kind, m.group(kind)))
                break
    return out


class _Parser:
    def __init__(self, tokens: list[tuple[str, str]]):
        self.tokens = tokens
        self.i = 0

    def peek(self) -> Optional[tuple[str, str]]:
        return self.tokens[self.i] if self.i < len(self.tokens) else None

    def eat(self, value: Optional[str] = None) -> tuple[str, str]:
        tok = self.peek()
        if tok is None or (value is not None and tok[1] != value):
            raise ValueError(f"expected {value!r}, got {tok!r}")
        self.i += 1
        return tok

    def parse_document(self) -> list[Field]:
        # optional leading 'query' keyword
        tok = self.peek()
        if tok and tok[1] == "query":
            self.eat()
        self.eat("{")
        fields = self.parse_selections()
        self.eat("}")
        return fields

    def parse_selections(self) -> list[Field]:
        fields = []
        while self.peek() and self.peek()[1] != "}":
            fields.append(self.parse_field())
        return fields

    def parse_field(self) -> Field:
        kind, name = self.eat()
        if kind != "name":
            raise ValueError(f"expected field name, got {name!r}")
        f = Field(name)
        if self.peek() and self.peek()[1] == "(":
            self.eat("(")
            while self.peek() and self.peek()[1] != ")":
                _, arg = self.eat()
                self.eat(":")
                kind, raw = self.eat()
                if kind == "string":
                    val: Any = raw[1:-1].replace('\\"', '"')
                elif kind == "number":
                    val = float(raw) if "." in raw else int(raw)
                elif raw in ("true", "false"):
                    val = raw == "true"
                else:
                    raise ValueError(f"bad argument value {raw!r}")
                f.arguments[arg] = val
                if self.peek() and self.peek()[1] == ",":
                    self.eat(",")
            self.eat(")")
        if self.peek() and self.peek()[1] == "{":
            self.eat("{")
            f.selections = self.parse_selections()
            self.eat("}")
        return f


def parse(query: str) -> list[Field]:
    return _Parser(_tokenize(query)).parse_document()


def _argument_bindings(
    var: str, ns: str, arguments: dict[str, Any]
) -> list[Any]:
    """Field arguments become (attribute, constant) binding pairs on the
    field's entity variable (reference: graphql.rs:190-214)."""

    out: list[Any] = []
    for arg, val in arguments.items():
        arg_var = f"?__arg{var[1:]}_{arg}"
        out.append(AttributeBinding(var, f"{ns}/{arg}", arg_var))
        out.append(ConstantBinding(arg_var, val))
    return out


def _compile_level(
    node: Field,
    ns: str,
    path_vars: list[str],
    path_attrs: list[str],
    bindings: list[Any],
    ref_namespaces: dict[str, str],
    paths: list[PullLevel],
) -> None:
    """Recursive descent: one PullLevel per nesting level, each
    constrained by every binding accumulated along its path
    (reference: graphql.rs:143-234). Arbitrary depth."""

    var = path_vars[-1]
    scalars = [f for f in node.selections if not f.selections]
    objects = [f for f in node.selections if f.selections]
    if scalars:
        paths.append(
            PullLevel(
                list(path_vars),
                Project(list(path_vars), Hector(list(path_vars), list(bindings))),
                var,
                [f"{ns}/{f.name}" for f in scalars],
                path_attributes=list(path_attrs),
            )
        )
    for obj in objects:
        child_ns = ref_namespaces.get(obj.name, obj.name)
        link = f"{ns}/{obj.name}"
        child_var = f"{var}_{obj.name}"
        child_bindings = (
            list(bindings)
            + [AttributeBinding(var, link, child_var)]
            + _argument_bindings(child_var, child_ns, obj.arguments)
        )
        _compile_level(
            obj,
            child_ns,
            path_vars + [child_var],
            path_attrs + [link],
            child_bindings,
            ref_namespaces,
            paths,
        )


def compile_graphql(
    query: str, ref_namespaces: Optional[dict[str, str]] = None
) -> Pull:
    """Compile a GraphQL document to a Pull plan (one PullLevel per
    nesting level, any depth; reference: graphql.rs:143-234)."""

    ref_namespaces = ref_namespaces or {}
    roots = parse(query)
    if len(roots) != 1:
        raise ValueError("exactly one root field supported")
    root = roots[0]
    ns = root.name
    root_var = "?__root"

    bindings = _argument_bindings(root_var, ns, root.arguments)
    scalars = [f for f in root.selections if not f.selections]
    if not bindings:
        if not scalars:
            raise ValueError("root needs an argument or a scalar field")
        bindings.append(
            AttributeBinding(root_var, f"{ns}/{scalars[0].name}", "?__bind0")
        )

    paths: list[PullLevel] = []
    _compile_level(root, ns, [root_var], [], bindings, ref_namespaces, paths)
    return Pull([root_var], paths)


def derive_graphql(
    engine: Any,
    query: str,
    namespace: str,
    ref_namespaces: Optional[dict[str, str]] = None,
) -> list[str]:
    """The reference's Derive variant (src/derive/graphql.rs:34-120):
    every pulled attribute of every nesting level becomes a derived
    attribute ``namespace/<aid>`` registered on the engine, holding the
    (entity, value) pairs the GraphQL constraints select. Returns the
    created attribute ids.

    Spark-first: each derived attribute is a lazily-evaluated plan
    (level constraints joined with the pulled attribute), so it always
    reflects current inputs and composes with any other query.
    """

    from .plans import Join, MatchA

    pull = compile_graphql(query, ref_namespaces)
    created: list[str] = []
    for level in pull.paths:
        pv = level.pull_variable
        for aid in level.pull_attributes:
            val_var = "?__derive_v"
            plan = Project(
                [pv, val_var],
                Join([pv], level.plan, MatchA(pv, aid, val_var)),
            )
            derived = f"{namespace}/{aid}"
            engine.register_derived_attribute(derived, plan, pv, val_var)
            created.append(derived)
    return created
