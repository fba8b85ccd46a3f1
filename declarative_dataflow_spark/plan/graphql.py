"""GraphQL front-end: parse a GraphQL document and compile it to Pull
plans over engine attributes.

Parity with the reference's GraphQl plan (src/plan/graphql.rs:22-57;
selection_set_to_paths 143-234): each nesting level becomes a
PullLevel whose base plan is a Hector constrained by parent-child
attribute bindings, and field arguments become constant bindings.
Nested levels carry ``path_attributes`` and ``cardinality_many=False``
(graphql.rs:225-232), so the compiler interleaves link attributes into
the output path and synthesizes ``db__id`` rows (src/plan/pull.rs:
208-226). The reference reassembles nested JSON in the AssocIn sink —
here ``sinks.assoc_in`` does the same on the flat path rows.

Grammar: the reference parses the full ``graphql_parser`` grammar but
its compiler panics (``unimplemented!``) on fragments and named query
operations (graphql.rs:92-111). This front-end goes further and
actually supports:

- field aliases ``alias: field`` — the alias becomes the output key
  (attribute column / path attribute) while the scan reads the real
  attribute;
- named fragments ``fragment F on T { .. }`` + spreads ``...F`` and
  inline fragments ``... on T { .. }`` / ``... { .. }`` — spliced into
  the enclosing selection set (type conditions are not checked: the
  engine is schema-less, attributes simply don't join when absent);
- operation variables ``query Q($v: Type = default) { .. }`` with
  ``$v`` argument values substituted from the ``variables`` mapping.

Attribute naming convention: a field ``f`` under namespace ``ns`` reads
attribute ``ns/f``; an object-valued field's attribute holds the child
entity id, and ``ref_namespaces`` maps the field name to the child's
namespace (the reference derives this from its schema registry).
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
    r"""\s*(?:(?P<punct>\.\.\.|[{}():,=$!\[\]])"""
    r"""|(?P<string>"(?:[^"\\]|\\.)*")"""
    r"""|(?P<number>-?\d+(?:\.\d+)?)|(?P<name>[_A-Za-z][_0-9A-Za-z]*))"""
)


@dataclass
class Field:
    name: str
    alias: Optional[str] = None
    arguments: dict[str, Any] = field(default_factory=dict)
    selections: list["Field"] = field(default_factory=list)

    @property
    def out_name(self) -> str:
        """The response key: the alias when given, else the field name."""

        return self.alias or self.name


@dataclass
class _Variable:
    """A ``$name`` placeholder inside an argument value."""

    name: str


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
        self.fragments: dict[str, list[Field]] = {}
        self.variable_defaults: dict[str, Any] = {}
        self.variable_names: list[str] = []

    def peek(self, ahead: int = 0) -> Optional[tuple[str, str]]:
        j = self.i + ahead
        return self.tokens[j] if j < len(self.tokens) else None

    def eat(self, value: Optional[str] = None) -> tuple[str, str]:
        tok = self.peek()
        if tok is None or (value is not None and tok[1] != value):
            raise ValueError(f"expected {value!r}, got {tok!r}")
        self.i += 1
        return tok

    def parse_document(self) -> list[Field]:
        """Operations + fragment definitions, in any order; exactly one
        anonymous/`query` operation is supported (like the reference's
        single SelectionSet path)."""

        roots: Optional[list[Field]] = None
        while self.peek():
            tok = self.peek()
            if tok[1] == "fragment":
                self.parse_fragment()
            else:
                if roots is not None:
                    raise ValueError("exactly one query operation supported")
                roots = self.parse_operation()
        if roots is None:
            raise ValueError("no query operation in document")
        # Fragments may be defined after their spreads: resolve now.
        return self._splice(roots, ())

    def parse_operation(self) -> list[Field]:
        tok = self.peek()
        if tok and tok[1] == "query":
            self.eat()
            if self.peek() and self.peek()[0] == "name":
                self.eat()  # operation name
            if self.peek() and self.peek()[1] == "(":
                self.parse_variable_definitions()
        elif tok and tok[1] in ("mutation", "subscription"):
            raise ValueError(f"{tok[1]} operations not supported")
        self.eat("{")
        fields = self.parse_selections()
        self.eat("}")
        return fields

    def parse_variable_definitions(self) -> None:
        self.eat("(")
        while self.peek() and self.peek()[1] != ")":
            self.eat("$")
            _, name = self.eat()
            self.variable_names.append(name)
            self.eat(":")
            self._parse_type()
            if self.peek() and self.peek()[1] == "=":
                self.eat("=")
                self.variable_defaults[name] = self._parse_value()
            if self.peek() and self.peek()[1] == ",":
                self.eat(",")
        self.eat(")")

    def _parse_type(self) -> None:
        """Consume a type reference: ``Name``, ``Name!``, ``[Type]``,
        ``[Type!]!``. Types are not checked (schema-less engine)."""

        if self.peek() and self.peek()[1] == "[":
            self.eat("[")
            self._parse_type()
            self.eat("]")
        else:
            kind, _ = self.eat()
            if kind != "name":
                raise ValueError("expected type name")
        if self.peek() and self.peek()[1] == "!":
            self.eat("!")

    def parse_fragment(self) -> None:
        self.eat("fragment")
        _, name = self.eat()
        if self.peek() and self.peek()[1] == "on":
            self.eat("on")
            self.eat()  # type condition, unchecked
        self.eat("{")
        self.fragments[name] = self.parse_selections()
        self.eat("}")

    def parse_selections(self) -> list[Field]:
        fields: list[Field] = []
        while self.peek() and self.peek()[1] != "}":
            if self.peek()[1] == "...":
                fields.extend(self.parse_spread())
            else:
                fields.append(self.parse_field())
        return fields

    def parse_spread(self) -> list[Field]:
        """``...Name`` / ``... on Type { .. }`` / ``... { .. }``.
        Named spreads resolve lazily (fragments may appear later in the
        document) via a placeholder field."""

        self.eat("...")
        tok = self.peek()
        if tok and tok[1] == "on":
            self.eat("on")
            self.eat()  # type condition, unchecked
            self.eat("{")
            inline = self.parse_selections()
            self.eat("}")
            return inline
        if tok and tok[1] == "{":
            self.eat("{")
            inline = self.parse_selections()
            self.eat("}")
            return inline
        _, name = self.eat()
        return [Field(name="..." + name)]

    def _parse_value(self) -> Any:
        tok = self.peek()
        if tok is None:
            raise ValueError("expected value")
        if tok[1] == "$":
            self.eat("$")
            _, name = self.eat()
            return _Variable(name)
        if tok[1] == "[":
            self.eat("[")
            items = []
            while self.peek() and self.peek()[1] != "]":
                items.append(self._parse_value())
                if self.peek() and self.peek()[1] == ",":
                    self.eat(",")
            self.eat("]")
            return items
        kind, raw = self.eat()
        if kind == "string":
            return raw[1:-1].replace('\\"', '"')
        if kind == "number":
            return float(raw) if "." in raw else int(raw)
        if raw in ("true", "false"):
            return raw == "true"
        if raw == "null":
            return None
        raise ValueError(f"bad argument value {raw!r}")

    def parse_field(self) -> Field:
        kind, name = self.eat()
        if kind != "name":
            raise ValueError(f"expected field name, got {name!r}")
        alias: Optional[str] = None
        if self.peek() and self.peek()[1] == ":":
            self.eat(":")
            kind, real = self.eat()
            if kind != "name":
                raise ValueError(f"expected field name after alias {name!r}")
            alias, name = name, real
        f = Field(name, alias=alias)
        if self.peek() and self.peek()[1] == "(":
            self.eat("(")
            while self.peek() and self.peek()[1] != ")":
                _, arg = self.eat()
                self.eat(":")
                f.arguments[arg] = self._parse_value()
                if self.peek() and self.peek()[1] == ",":
                    self.eat(",")
            self.eat(")")
        if self.peek() and self.peek()[1] == "{":
            self.eat("{")
            f.selections = self.parse_selections()
            self.eat("}")
        return f

    def _splice(
        self, fields: list[Field], seen: tuple[str, ...]
    ) -> list[Field]:
        """Replace fragment-spread placeholders with the fragment's
        selections, recursively; cycles are an error."""

        out: list[Field] = []
        for f in fields:
            if f.name.startswith("..."):
                name = f.name[3:]
                if name in seen:
                    raise ValueError(f"fragment cycle at {name!r}")
                if name not in self.fragments:
                    raise ValueError(f"unknown fragment {name!r}")
                out.extend(
                    self._splice(self.fragments[name], seen + (name,))
                )
            else:
                f.selections = self._splice(f.selections, seen)
                out.append(f)
        return out


def parse(query: str) -> list[Field]:
    return _Parser(_tokenize(query)).parse_document()


def _resolve_arguments(
    parser_fields: list[Field], variables: dict[str, Any]
) -> None:
    """Substitute ``$var`` placeholders in-place throughout the tree."""

    def sub(v: Any) -> Any:
        if isinstance(v, _Variable):
            if v.name not in variables:
                raise ValueError(f"missing variable ${v.name}")
            return variables[v.name]
        if isinstance(v, list):
            return [sub(x) for x in v]
        return v

    for f in parser_fields:
        f.arguments = {k: sub(v) for k, v in f.arguments.items()}
        _resolve_arguments(f.selections, variables)


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
    (reference: graphql.rs:143-234). Arbitrary depth. Nested levels are
    cardinality-single (graphql.rs:231), so the compiler pops the child
    id and synthesizes db__id rows."""

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
                cardinality_many=False,
                pull_aliases=[
                    f.alias if f.alias else f"{ns}/{f.name}" for f in scalars
                ],
            )
        )
    for obj in objects:
        child_ns = ref_namespaces.get(obj.name, obj.name)
        link = f"{ns}/{obj.name}"
        child_var = f"{var}_{obj.out_name}"
        child_bindings = (
            list(bindings)
            + [AttributeBinding(var, link, child_var)]
            + _argument_bindings(child_var, child_ns, obj.arguments)
        )
        _compile_level(
            obj,
            child_ns,
            path_vars + [child_var],
            path_attrs + [obj.alias if obj.alias else link],
            child_bindings,
            ref_namespaces,
            paths,
        )


def compile_graphql(
    query: str,
    ref_namespaces: Optional[dict[str, str]] = None,
    variables: Optional[dict[str, Any]] = None,
) -> Pull:
    """Compile a GraphQL document to a Pull plan (one PullLevel per
    nesting level, any depth; reference: graphql.rs:143-234).

    ``variables`` supplies values for operation variables; declared
    defaults apply when a name is absent.
    """

    ref_namespaces = ref_namespaces or {}
    parser = _Parser(_tokenize(query))
    roots = parser.parse_document()
    resolved = dict(parser.variable_defaults)
    resolved.update(variables or {})
    _resolve_arguments(roots, resolved)
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
