"""Self-contained JMESPath evaluator (no external packages).

Closes the reference-parity gap for rules whose JMESPath goes beyond the
dotted-identifier subset that compiles natively to ``get_json_object``
(reference: full JMESPath via the jmespath crate, src/rules.rs:75-93,
compile at src/connection.rs:293-307).  Implemented from the public
JMESPath specification (jmespath.org/specification.html) as a Pratt
parser + recursive evaluator.

Supported surface:
  identifiers (unquoted + ``"quoted"``), sub-expressions ``a.b``,
  index ``a[0]`` / negative, slices ``a[1:3]`` / ``a[::2]``,
  list projection ``a[*]``, object projection ``a.*``, flatten ``a[]``,
  filter projections ``a[?x == `1`]`` with ``== != < <= > >=``,
  ``&& || !`` and parens, current node ``@``, pipe ``|``,
  multi-select list ``[a, b]`` and hash ``{k: a}``,
  JSON literals ``` `…` ``` and raw strings ``'…'`` (bare numbers are
  also accepted as literals where an operand is expected),
  expression references ``&expr``, and functions: length, contains,
  starts_with, ends_with, keys, values, min, max, sum, avg, abs, floor,
  ceil, join, reverse, sort, sort_by, min_by, max_by, map, merge,
  to_array, to_string, to_number, type, not_null.

Search semantics follow the spec: projections map their RHS over
elements and drop nulls; comparisons between incomparable types yield
null; a runtime type error inside ``search`` yields None rather than
raising (the matcher contract: no match).  ``compile`` raises
``JMESPathSyntaxError`` on malformed expressions — config load must
fail fast, mirroring src/connection.rs:76-82.
"""

from __future__ import annotations

import json
import re
from dataclasses import dataclass
from typing import Any


class JMESPathSyntaxError(ValueError):
    pass


# ---------------------------------------------------------------- lexer

_IDENT = re.compile(r"[A-Za-z_][A-Za-z0-9_]*")
_NUM = re.compile(r"-?\d+")

_SIMPLE = {
    "@": "current", "*": "star", ".": "dot", ",": "comma", ":": "colon",
    "(": "lparen", ")": "rparen", "{": "lbrace", "}": "rbrace",
    "]": "rbracket", "&": "expref", "|": "pipe", "!": "not",
    "<": "lt", ">": "gt", "?": "question",
}
_TWO = {"==": "eq", "!=": "ne", "<=": "lte", ">=": "gte",
        "&&": "and", "||": "or"}

LBP = {
    "eof": 0, "pipe": 1, "or": 2, "and": 3,
    "eq": 5, "ne": 5, "lt": 5, "lte": 5, "gt": 5, "gte": 5,
    "rbracket": 0, "rparen": 0, "rbrace": 0, "comma": 0, "colon": 0,
    "flatten": 9, "star": 20, "filter": 21, "dot": 40, "not": 45,
    "lbracket": 55, "lparen": 60,
    "ident": 0, "quoted": 0, "literal": 0, "number": 0, "current": 0,
    "expref": 0, "lbrace": 0, "question": 0,
}


@dataclass
class Tok:
    kind: str
    value: Any = None


def _tokenize(expr: str) -> list[Tok]:
    toks: list[Tok] = []
    i, n = 0, len(expr)
    while i < n:
        c = expr[i]
        if c.isspace():
            i += 1
            continue
        two = expr[i : i + 2]
        if two in _TWO:
            toks.append(Tok(_TWO[two]))
            i += 2
            continue
        if c == "[":
            if two == "[]":
                toks.append(Tok("flatten"))
                i += 2
            elif two == "[?":
                toks.append(Tok("filter"))
                i += 2
            else:
                toks.append(Tok("lbracket"))
                i += 1
            continue
        if c in _SIMPLE:
            toks.append(Tok(_SIMPLE[c]))
            i += 1
            continue
        if c == "'":
            j = expr.find("'", i + 1)
            if j < 0:
                raise JMESPathSyntaxError(f"unterminated raw string in {expr!r}")
            toks.append(Tok("literal", expr[i + 1 : j]))
            i = j + 1
            continue
        if c == '"':
            j = expr.find('"', i + 1)
            if j < 0:
                raise JMESPathSyntaxError(f"unterminated identifier in {expr!r}")
            toks.append(Tok("quoted", expr[i + 1 : j]))
            i = j + 1
            continue
        if c == "`":
            j = expr.find("`", i + 1)
            if j < 0:
                raise JMESPathSyntaxError(f"unterminated literal in {expr!r}")
            raw = expr[i + 1 : j]
            try:
                toks.append(Tok("literal", json.loads(raw)))
            except json.JSONDecodeError:
                toks.append(Tok("literal", raw))  # spec: fall back to string
            i = j + 1
            continue
        m = _NUM.match(expr, i)
        if m and (c.isdigit() or (c == "-" and i + 1 < n and expr[i + 1].isdigit())):
            toks.append(Tok("number", int(m.group())))
            i = m.end()
            continue
        m = _IDENT.match(expr, i)
        if m:
            toks.append(Tok("ident", m.group()))
            i = m.end()
            continue
        raise JMESPathSyntaxError(f"unexpected character {c!r} in {expr!r}")
    toks.append(Tok("eof"))
    return toks


# --------------------------------------------------------------- parser
# AST nodes are tuples: (kind, *children).

class _Parser:
    def __init__(self, expr: str):
        self.expr = expr
        self.toks = _tokenize(expr)
        self.pos = 0

    def peek(self) -> Tok:
        return self.toks[self.pos]

    def advance(self) -> Tok:
        t = self.toks[self.pos]
        self.pos += 1
        return t

    def expect(self, kind: str) -> Tok:
        t = self.advance()
        if t.kind != kind:
            raise JMESPathSyntaxError(
                f"expected {kind}, got {t.kind} in {self.expr!r}"
            )
        return t

    def parse(self) -> tuple:
        node = self.expression(0)
        if self.peek().kind != "eof":
            raise JMESPathSyntaxError(
                f"unexpected trailing {self.peek().kind} in {self.expr!r}"
            )
        return node

    def expression(self, rbp: int) -> tuple:
        left = self.nud(self.advance())
        while LBP.get(self.peek().kind, 0) > rbp:
            left = self.led(self.advance(), left)
        return left

    # ---- prefix
    def nud(self, t: Tok) -> tuple:
        if t.kind == "ident":
            if self.peek().kind == "lparen":
                self.advance()
                return self._func(t.value)
            return ("field", t.value)
        if t.kind == "quoted":
            return ("field", t.value)
        if t.kind == "literal":
            return ("literal", t.value)
        if t.kind == "number":
            return ("literal", t.value)
        if t.kind == "current":
            return ("identity",)
        if t.kind == "star":
            return ("obj_projection", ("identity",), self._projection_rhs(LBP["star"]))
        if t.kind == "filter":
            return self._filter(("identity",))
        if t.kind == "flatten":
            return ("projection", ("flatten", ("identity",)),
                    self._projection_rhs(LBP["flatten"]))
        if t.kind == "lbracket":
            return self._bracket(("identity",), at_start=True)
        if t.kind == "lbrace":
            return self._multihash()
        if t.kind == "not":
            return ("not", self.expression(LBP["not"]))
        if t.kind == "lparen":
            inner = self.expression(0)
            self.expect("rparen")
            return inner
        if t.kind == "expref":
            return ("expref", self.expression(LBP["expref"]))
        raise JMESPathSyntaxError(f"unexpected token {t.kind} in {self.expr!r}")

    # ---- infix
    def led(self, t: Tok, left: tuple) -> tuple:
        if t.kind == "dot":
            if self.peek().kind == "star":
                self.advance()
                return ("obj_projection", left, self._projection_rhs(LBP["star"]))
            return ("subexpr", left, self._dot_rhs(LBP["dot"]))
        if t.kind == "pipe":
            return ("pipe", left, self.expression(LBP["pipe"]))
        if t.kind == "or":
            return ("or", left, self.expression(LBP["or"]))
        if t.kind == "and":
            return ("and", left, self.expression(LBP["and"]))
        if t.kind in ("eq", "ne", "lt", "lte", "gt", "gte"):
            return ("cmp", t.kind, left, self.expression(LBP[t.kind]))
        if t.kind == "flatten":
            return ("projection", ("flatten", left),
                    self._projection_rhs(LBP["flatten"]))
        if t.kind == "filter":
            return self._filter(left)
        if t.kind == "lbracket":
            return self._bracket(left, at_start=False)
        raise JMESPathSyntaxError(f"unexpected infix {t.kind} in {self.expr!r}")

    # ---- helpers
    def _func(self, name: str) -> tuple:
        args: list[tuple] = []
        if self.peek().kind != "rparen":
            args.append(self.expression(0))
            while self.peek().kind == "comma":
                self.advance()
                args.append(self.expression(0))
        self.expect("rparen")
        return ("func", name, args)

    def _dot_rhs(self, rbp: int) -> tuple:
        k = self.peek().kind
        if k in ("ident", "quoted", "star"):
            # continue precedence-parsing at the caller's binding power so
            # subsequent [idx]/[*]/[?…] bind INTO a projection's RHS
            # (spec: projections absorb ops until a weaker-bound token)
            return self.expression(rbp)
        if k == "lbracket":  # multi-select list after dot
            self.advance()
            return self._multilist()
        if k == "lbrace":
            self.advance()
            return self._multihash()
        raise JMESPathSyntaxError(f"invalid token after '.': {k} in {self.expr!r}")

    def _projection_rhs(self, rbp: int) -> tuple:
        k = self.peek().kind
        if LBP.get(k, 0) < 10:
            return ("identity",)
        if k == "dot":
            self.advance()
            return self._dot_rhs(rbp)
        if k in ("lbracket", "filter", "flatten"):
            return self.expression(rbp)
        raise JMESPathSyntaxError(f"invalid projection rhs {k} in {self.expr!r}")

    def _filter(self, left: tuple) -> tuple:
        cond = self.expression(0)
        self.expect("rbracket")
        return ("filter_projection", left, self._projection_rhs(LBP["filter"]), cond)

    def _bracket(self, left: tuple, at_start: bool) -> tuple:
        k = self.peek().kind
        if k == "star" and self.toks[self.pos + 1].kind == "rbracket":
            self.advance(); self.advance()
            return ("projection", left, self._projection_rhs(LBP["star"]))
        if k in ("number", "colon"):
            return self._index_or_slice(left)
        # multi-select list (only valid at expression start per spec)
        if at_start:
            return self._multilist()
        raise JMESPathSyntaxError(f"invalid bracket content {k} in {self.expr!r}")

    def _index_or_slice(self, left: tuple) -> tuple:
        parts: list[int | None] = [None, None, None]
        idx = 0
        saw_colon = False
        while True:
            k = self.peek().kind
            if k == "number":
                parts[idx] = self.advance().value
            elif k == "colon":
                self.advance()
                idx += 1
                saw_colon = True
                if idx > 2:
                    raise JMESPathSyntaxError(f"too many ':' in slice in {self.expr!r}")
            elif k == "rbracket":
                self.advance()
                break
            else:
                raise JMESPathSyntaxError(f"invalid slice token {k} in {self.expr!r}")
        if not saw_colon:
            return ("index", left, parts[0])
        return ("projection", ("slice", left, parts[0], parts[1], parts[2]),
                self._projection_rhs(LBP["star"]))

    def _multilist(self) -> tuple:
        items = [self.expression(0)]
        while self.peek().kind == "comma":
            self.advance()
            items.append(self.expression(0))
        self.expect("rbracket")
        return ("multilist", items)

    def _multihash(self) -> tuple:
        pairs = []
        while True:
            t = self.advance()
            if t.kind not in ("ident", "quoted"):
                raise JMESPathSyntaxError(f"invalid hash key {t.kind} in {self.expr!r}")
            self.expect("colon")
            pairs.append((t.value, self.expression(0)))
            nxt = self.advance()
            if nxt.kind == "rbrace":
                break
            if nxt.kind != "comma":
                raise JMESPathSyntaxError(f"expected ',' in hash in {self.expr!r}")
        return ("multihash", pairs)


# ------------------------------------------------------------ evaluator

def _truthy(v: Any) -> bool:
    return not (v is None or v is False or v == "" or v == [] or v == {})


_CMP_ORDER = {"lt", "lte", "gt", "gte"}


def _compare(op: str, a: Any, b: Any) -> Any:
    if op == "eq":
        return a == b
    if op == "ne":
        return a != b
    # ordering comparators are defined for numbers only (spec); null otherwise
    num = (int, float)
    if not (isinstance(a, num) and not isinstance(a, bool)
            and isinstance(b, num) and not isinstance(b, bool)):
        return None
    return {"lt": a < b, "lte": a <= b, "gt": a > b, "gte": a >= b}[op]


class _TypeError(Exception):
    pass


def _num_list(v: Any) -> list:
    if not isinstance(v, list) or any(
        not isinstance(x, (int, float)) or isinstance(x, bool) for x in v
    ):
        raise _TypeError
    return v


def _eval_func(name: str, args: list, node_args: list, value: Any) -> Any:
    a = args
    if name == "length":
        if isinstance(a[0], (str, list, dict)):
            return len(a[0])
        raise _TypeError
    if name == "contains":
        if isinstance(a[0], (str, list)):
            return a[1] in a[0]
        raise _TypeError
    if name == "starts_with":
        return isinstance(a[0], str) and a[0].startswith(a[1])
    if name == "ends_with":
        return isinstance(a[0], str) and a[0].endswith(a[1])
    if name == "keys":
        if isinstance(a[0], dict):
            return list(a[0].keys())
        raise _TypeError
    if name == "values":
        if isinstance(a[0], dict):
            return list(a[0].values())
        raise _TypeError
    if name == "min":
        v = _num_list(a[0])
        return min(v) if v else None
    if name == "max":
        v = _num_list(a[0])
        return max(v) if v else None
    if name == "sum":
        return sum(_num_list(a[0]))
    if name == "avg":
        v = _num_list(a[0])
        return sum(v) / len(v) if v else None
    if name == "abs":
        return abs(a[0])
    if name == "floor":
        import math
        return math.floor(a[0])
    if name == "ceil":
        import math
        return math.ceil(a[0])
    if name == "join":
        if not isinstance(a[1], list):
            raise _TypeError
        return a[0].join(a[1])
    if name == "reverse":
        if isinstance(a[0], str):
            return a[0][::-1]
        if isinstance(a[0], list):
            return list(reversed(a[0]))
        raise _TypeError
    if name == "sort":
        if isinstance(a[0], list):
            return sorted(a[0])
        raise _TypeError
    if name == "sort_by":
        ref = a[1]
        return sorted(a[0], key=lambda x: _search_node(ref, x))
    if name == "min_by":
        return min(a[0], key=lambda x: _search_node(a[1], x), default=None)
    if name == "max_by":
        return max(a[0], key=lambda x: _search_node(a[1], x), default=None)
    if name == "map":
        return [_search_node(a[0], x) for x in a[1]]
    if name == "merge":
        out: dict = {}
        for d in a:
            if not isinstance(d, dict):
                raise _TypeError
            out.update(d)
        return out
    if name == "to_array":
        return a[0] if isinstance(a[0], list) else [a[0]] if a[0] is not None else None
    if name == "to_string":
        return a[0] if isinstance(a[0], str) else json.dumps(a[0])
    if name == "to_number":
        try:
            f = float(a[0])
            return int(f) if f.is_integer() else f
        except (TypeError, ValueError):
            return None
    if name == "type":
        v = a[0]
        return ("null" if v is None else "boolean" if isinstance(v, bool)
                else "number" if isinstance(v, (int, float))
                else "string" if isinstance(v, str)
                else "array" if isinstance(v, list) else "object")
    if name == "not_null":
        for x in a:
            if x is not None:
                return x
        return None
    raise JMESPathSyntaxError(f"unknown function {name}()")


def _search_node(node: tuple, value: Any) -> Any:
    kind = node[0]
    if kind == "identity":
        return value
    if kind == "field":
        return value.get(node[1]) if isinstance(value, dict) else None
    if kind == "subexpr":
        base = _search_node(node[1], value)
        return None if base is None else _search_node(node[2], base)
    if kind == "index":
        base = _search_node(node[1], value)
        if not isinstance(base, list):
            return None
        try:
            return base[node[2]]
        except IndexError:
            return None
    if kind == "slice":
        base = _search_node(node[1], value)
        return base[node[2] : node[3] : node[4]] if isinstance(base, list) else None
    if kind == "literal":
        return node[1]
    if kind == "projection":
        base = _search_node(node[1], value)
        if not isinstance(base, list):
            return None
        out = [_search_node(node[2], x) for x in base]
        return [x for x in out if x is not None]
    if kind == "obj_projection":
        base = _search_node(node[1], value)
        if not isinstance(base, dict):
            return None
        out = [_search_node(node[2], x) for x in base.values()]
        return [x for x in out if x is not None]
    if kind == "filter_projection":
        base = _search_node(node[1], value)
        if not isinstance(base, list):
            return None
        kept = [x for x in base if _truthy(_search_node(node[3], x))]
        out = [_search_node(node[2], x) for x in kept]
        return [x for x in out if x is not None]
    if kind == "flatten":
        base = _search_node(node[1], value)
        if not isinstance(base, list):
            return None
        out: list = []
        for x in base:
            out.extend(x) if isinstance(x, list) else out.append(x)
        return out
    if kind == "pipe":
        return _search_node(node[2], _search_node(node[1], value))
    if kind == "or":
        left = _search_node(node[1], value)
        return left if _truthy(left) else _search_node(node[2], value)
    if kind == "and":
        left = _search_node(node[1], value)
        return _search_node(node[2], value) if _truthy(left) else left
    if kind == "not":
        return not _truthy(_search_node(node[1], value))
    if kind == "cmp":
        return _compare(node[1], _search_node(node[2], value),
                        _search_node(node[3], value))
    if kind == "multilist":
        if value is None:
            return None
        return [_search_node(e, value) for e in node[1]]
    if kind == "multihash":
        if value is None:
            return None
        return {k: _search_node(e, value) for k, e in node[1]}
    if kind == "func":
        args = [
            e if e[0] == "expref" else _search_node(e, value) for e in node[2]
        ]
        args = [a[1] if isinstance(a, tuple) and a[0] == "expref" else a
                for a in args]
        return _eval_func(node[1], args, node[2], value)
    if kind == "expref":
        return node
    raise JMESPathSyntaxError(f"unknown node kind {kind}")


class Compiled:
    """A compiled expression; ``search(data)`` evaluates it."""

    def __init__(self, expr: str, ast: tuple):
        self.expression = expr
        self.ast = ast

    def search(self, data: Any) -> Any:
        try:
            return _search_node(self.ast, data)
        except (_TypeError, TypeError, KeyError):
            return None  # runtime type error == no match (matcher contract)


def compile(expr: str) -> Compiled:  # noqa: A001 - mirrors jmespath API
    """Parse ``expr``; raises JMESPathSyntaxError on malformed input."""
    return Compiled(expr, _Parser(expr).parse())


def search(expr: str, data: Any) -> Any:
    return compile(expr).search(data)
