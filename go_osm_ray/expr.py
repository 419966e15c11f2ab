"""DFL-subset expression filter compiler (vectorized + SQL-mirrored).

The reference delegates row filtering to the Dynamic Filter Language
(spatialcurrent/go-dfl), compiled once and evaluated per element against a
context of tag values + element attrs (/root/reference/osm/Filter.go:29-37,
EvaluateExpression.go:19-42; examples ``@craft like brewery`` and
``(@craft like brewery) or (@craft like distillery)`` at
/root/reference/README.md:105,114).

Here the expression is parsed ONCE on the driver into an AST that can be

- ``compile()``d to a vectorized evaluator ``fn(batch: pa.Table) -> bool
  ndarray`` (closure-captured by ``map_batches`` tasks; ``@key`` falls back
  to a tags-column lookup when no physical column named ``key`` exists), and
- rendered ``to_sql()`` for the DuckDB oracle, guaranteeing the engine and
  the oracle agree on semantics by construction.

Supported grammar (the subset the reference's examples exercise, plus the
standard comparators): ``@attr``, string/number literals, ``[a, b]`` lists,
``== != < <= > >= like ilike in``, ``and or not``, parentheses, and
FUNCTION CALLS ``fn(arg, ...)`` over a registered function map — the
engine-side form of the reference's DFL FunctionMap injection
(/root/reference/cmd/osm/main.go:252 ``dfl.NewFuntionMapWithDefaults()``
threaded into every Filter via osm/Filter.go:27-37). Built-ins cover the
string helpers the DFL defaults provide (len/lower/upper/trim/prefix/
suffix); ``register_function`` adds engine+SQL UDF pairs so the DuckDB
oracle mirrors them by construction. NULL semantics are SQL three-valued
(Kleene) with a final NULL->False filter.
"""

from __future__ import annotations

import re
from dataclasses import dataclass

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from . import tags as tagops

_TOKEN = re.compile(r"""
    \s*(?:
      (?P<lparen>\() | (?P<rparen>\)) | (?P<lbrack>\[) | (?P<rbrack>\]) |
      (?P<comma>,) |
      (?P<op>==|!=|<=|>=|<|>) |
      (?P<attr>@[A-Za-z_][A-Za-z0-9_:]*) |
      (?P<num>-?\d+(?:\.\d+)?) |
      (?P<str>'(?:[^'\\]|\\.)*'|"(?:[^"\\]|\\.)*") |
      (?P<word>[A-Za-z_][A-Za-z0-9_:%.]*)
    )""", re.VERBOSE)

_KEYWORDS = {"and", "or", "not", "like", "ilike", "in"}


def _tokenize(s: str) -> list[tuple[str, str]]:
    out, pos = [], 0
    while pos < len(s):
        m = _TOKEN.match(s, pos)
        if not m or m.end() == pos:
            if s[pos:].strip() == "":
                break
            raise ValueError(f"bad token at {s[pos:]!r}")
        pos = m.end()
        kind = m.lastgroup
        text = m.group(kind)
        if kind == "word" and text.lower() in _KEYWORDS:
            out.append((text.lower(), text))
        else:
            out.append((kind, text))
    return out


@dataclass
class Node:
    kind: str          # attr | lit | list | cmp | and | or | not | func
    value: object = None
    left: "Node | None" = None
    right: "Node | None" = None
    op: str | None = None
    args: "list[Node] | None" = None


# ------------------------------------------------------- function registry

def _arr(x):
    return x.combine_chunks() if isinstance(x, pa.ChunkedArray) else x


def _len_any(a):
    """Polymorphic length: codepoints for strings, element count for
    lists (DuckDB's length() covers both, so one SQL mirror serves)."""
    a = _arr(a)
    if pa.types.is_list(a.type) or pa.types.is_large_list(a.type):
        return pc.list_value_length(a)
    return pc.utf8_length(a)


_FUNCTIONS: dict[str, dict] = {
    "len": {"fn": _len_any, "sql": lambda a: f"length({a})"},
    "lower": {"fn": lambda a: pc.utf8_lower(_arr(a)),
              "sql": lambda a: f"lower({a})"},
    "upper": {"fn": lambda a: pc.utf8_upper(_arr(a)),
              "sql": lambda a: f"upper({a})"},
    "trim": {"fn": lambda a: pc.utf8_trim_whitespace(_arr(a)),
             "sql": lambda a: f"trim({a})"},
    "ltrim": {"fn": lambda a: pc.utf8_ltrim_whitespace(_arr(a)),
              "sql": lambda a: f"ltrim({a})"},
    "rtrim": {"fn": lambda a: pc.utf8_rtrim_whitespace(_arr(a)),
              "sql": lambda a: f"rtrim({a})"},
    "prefix": {"fn": lambda a, p: pc.starts_with(_arr(a), pattern=_scalar(p)),
               "sql": lambda a, p: f"starts_with({a}, {p})"},
    "suffix": {"fn": lambda a, p: pc.ends_with(_arr(a), pattern=_scalar(p)),
               "sql": lambda a, p: f"ends_with({a}, {p})"},
    "replace": {"fn": lambda a, o, n: pc.replace_substring(
                    _arr(a), pattern=_scalar(o), replacement=_scalar(n)),
                "sql": lambda a, o, n: f"replace({a}, {o}, {n})"},
    # 1-based start like SQL substr; codeunit slicing matches DuckDB on
    # the ASCII tag/attr values the DFL surface filters
    "substr": {"fn": lambda a, s, n: pc.utf8_slice_codeunits(
                   _arr(a), start=int(_scalar(s)) - 1,
                   stop=int(_scalar(s)) - 1 + int(_scalar(n))),
               "sql": lambda a, s, n: f"substr({a}, {s}, {n})"},
    "split": {"fn": lambda a, sep: pc.split_pattern(
                  _arr(a), pattern=_scalar(sep)),
              "sql": lambda a, sep: f"string_split({a}, {sep})"},
    # || is NULL-propagating in SQL, matching arrow's emit_null default
    # (DuckDB's concat() would skip NULLs — deliberately not mirrored)
    "concat": {"fn": lambda *xs: pc.binary_join_element_wise(
                   *[_arr(x) if not isinstance(x, (str, int, float))
                     else str(x) for x in xs], ""),
               "sql": lambda *xs: "(" + " || ".join(xs) + ")"},
    "int64": {"fn": lambda a: pc.cast(_arr(a), pa.int64()),
              "sql": lambda a: f"CAST({a} AS BIGINT)"},
    "float64": {"fn": lambda a: pc.cast(_arr(a), pa.float64()),
                "sql": lambda a: f"CAST({a} AS DOUBLE)"},
    # dfl.NewFuntionMapWithDefaults remainder (reference
    # cmd/osm/main.go:252): element-wise min/max/abs, substring
    # membership, and list membership over split() arrays
    "min": {"fn": lambda *xs: pc.min_element_wise(
                *[_arr(x) if not isinstance(x, (int, float)) else x
                  for x in xs]),
            "sql": lambda *xs: f"least({', '.join(xs)})"},
    "max": {"fn": lambda *xs: pc.max_element_wise(
                *[_arr(x) if not isinstance(x, (int, float)) else x
                  for x in xs]),
            "sql": lambda *xs: f"greatest({', '.join(xs)})"},
    "abs": {"fn": lambda a: pc.abs(_arr(a)),
            "sql": lambda a: f"abs({a})"},
    "contains": {"fn": lambda a, p: pc.match_substring(
                     _arr(a), pattern=_scalar(p)),
                 "sql": lambda a, p: f"contains({a}, {p})"},
    "has": {"fn": lambda a, v: _list_has(a, v),
            "sql": lambda a, v: f"list_contains({a}, {v})"},
}


def _list_has(a, v):
    """Membership in a list column (e.g. split() output): flatten once,
    compare, and segment-OR with a cumsum over the list offsets — no
    python loop over rows."""
    import numpy as np
    a = _arr(a)
    eq = pc.fill_null(pc.equal(a.flatten(), _scalar(v)), False)
    x = eq.to_numpy(zero_copy_only=False).astype(np.int64)
    off = np.asarray(a.offsets, np.int64)
    off = off - off[0]
    cum = np.concatenate([np.zeros(1, np.int64), np.cumsum(x)])
    return pa.array((cum[off[1:]] - cum[off[:-1]]) > 0)


def _scalar(v):
    return v.as_py() if isinstance(v, pa.Scalar) else v


def register_function(name: str, fn, sql) -> None:
    """Register a UDF usable in filter expressions: ``fn(*arrays) ->
    pa.Array`` (vectorized, arrow in/out) and ``sql(*arg_sqls) -> str``
    (the DuckDB mirror, so oracle parity holds for UDF filters too).
    Mirrors the reference's FunctionMap injection (osm/Filter.go:27-37)."""
    _FUNCTIONS[name] = {"fn": fn, "sql": sql}


class Parser:
    def __init__(self, toks: list[tuple[str, str]]):
        self.toks, self.i = toks, 0

    def peek(self):
        return self.toks[self.i][0] if self.i < len(self.toks) else None

    def next(self):
        if self.i >= len(self.toks):
            raise ValueError(f"unexpected end of expression after {self.toks[-1][1]!r}"
                             if self.toks else "empty expression")
        t = self.toks[self.i]
        self.i += 1
        return t

    def parse(self) -> Node:
        n = self.or_expr()
        if self.i != len(self.toks):
            raise ValueError(f"trailing tokens: {self.toks[self.i:]}")
        return n

    def or_expr(self) -> Node:
        n = self.and_expr()
        while self.peek() == "or":
            self.next()
            n = Node("or", left=n, right=self.and_expr())
        return n

    def and_expr(self) -> Node:
        n = self.not_expr()
        while self.peek() == "and":
            self.next()
            n = Node("and", left=n, right=self.not_expr())
        return n

    def not_expr(self) -> Node:
        if self.peek() == "not":
            self.next()
            return Node("not", left=self.not_expr())
        return self.cmp()

    def cmp(self) -> Node:
        left = self.operand()
        k = self.peek()
        if k in ("op", "like", "ilike", "in"):
            kind, text = self.next()
            op = text.lower() if kind in ("like", "ilike", "in") else text
            right = self.operand()
            return Node("cmp", left=left, right=right, op=op)
        return left

    def operand(self) -> Node:
        k, text = self.next()
        if k == "lparen":
            n = self.or_expr()
            if self.next()[0] != "rparen":
                raise ValueError("expected )")
            return n
        if k == "lbrack":
            items = []
            while self.peek() != "rbrack":
                kk, tt = self.next()
                if kk == "comma":
                    continue
                items.append(_lit_value(kk, tt))
            self.next()
            return Node("list", value=items)
        if k == "attr":
            return Node("attr", value=text[1:])
        if k == "word" and self.peek() == "lparen":
            self.next()  # consume (
            args = []
            while self.peek() != "rparen":
                if self.peek() == "comma":
                    self.next()
                    continue
                args.append(self.operand())
            self.next()  # consume )
            if text not in _FUNCTIONS:
                raise ValueError(f"unknown function {text!r} (register "
                                 f"with expr.register_function)")
            return Node("func", value=text, args=args)
        if k in ("num", "str", "word"):
            return Node("lit", value=_lit_value(k, text))
        raise ValueError(f"unexpected token {text!r}")


def _lit_value(kind: str, text: str):
    if kind == "num":
        return float(text) if "." in text else int(text)
    if kind == "str":
        return re.sub(r"\\(.)", r"\1", text[1:-1])
    return text  # bare word -> string literal (DFL style: @craft like brewery)


# --------------------------------------------------------------- evaluation

def _attr_array(batch: pa.Table, name: str, tags_col: str) -> pa.Array:
    if name in batch.column_names:
        col = batch[name]
        return col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
    if tags_col in batch.column_names:
        return tagops.value_of(batch[tags_col], name)
    raise KeyError(f"attribute {name!r}: no column and no {tags_col!r} column")


def _eval(node: Node, batch: pa.Table, tags_col: str):
    if node.kind == "and":
        return pc.and_kleene(_eval(node.left, batch, tags_col),
                             _eval(node.right, batch, tags_col))
    if node.kind == "or":
        return pc.or_kleene(_eval(node.left, batch, tags_col),
                            _eval(node.right, batch, tags_col))
    if node.kind == "not":
        return pc.invert(_eval(node.left, batch, tags_col))
    if node.kind == "cmp":
        return _eval_cmp(node, batch, tags_col)
    if node.kind == "func":  # boolean-returning function as predicate
        return _operand_value(node, batch, tags_col)
    raise ValueError(f"cannot evaluate bare {node.kind} as predicate")


def _operand_value(node: Node, batch: pa.Table, tags_col: str):
    """Evaluate a comparison/function operand to an arrow array (attr,
    nested func) or python scalar (literal)."""
    if node.kind == "attr":
        return _attr_array(batch, node.value, tags_col)
    if node.kind == "lit":
        return node.value
    if node.kind == "func":
        f = _FUNCTIONS[node.value]
        return f["fn"](*[_operand_value(a, batch, tags_col)
                         for a in node.args or []])
    raise ValueError(f"cannot evaluate {node.kind} as operand")


def _eval_cmp(node: Node, batch: pa.Table, tags_col: str):
    op = node.op
    lhs = node.left
    rhs = node.right
    if lhs.kind not in ("attr", "func"):
        raise ValueError("comparison left side must be @attr or fn(...)")
    arr = _operand_value(lhs, batch, tags_col)
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    if op == "in":
        vals = rhs.value if rhs.kind == "list" else [rhs.value]
        return pc.is_in(arr, value_set=pa.array([str(v) if pa.types.is_string(arr.type) else v
                                                 for v in vals]))
    if op in ("like", "ilike"):
        return pc.match_like(arr, str(rhs.value), ignore_case=(op == "ilike"))
    lit = rhs.value
    if pa.types.is_string(arr.type) and not isinstance(lit, str):
        lit = str(lit)
    elif not pa.types.is_string(arr.type) and isinstance(lit, str):
        arr = pc.cast(arr, pa.string())
    fns = {"==": pc.equal, "!=": pc.not_equal, "<": pc.less,
           "<=": pc.less_equal, ">": pc.greater, ">=": pc.greater_equal}
    return fns[op](arr, pa.scalar(lit))


# --------------------------------------------------------------- SQL mirror

def _sql_attr(name: str, columns: set[str], tags_col: str) -> str:
    if name in columns:
        return name
    # first value of the key in the tags list<struct> column (tags.value_of)
    return (f"(list_filter({tags_col}, _t -> _t.key = '{name}')[1]).value"
            if tags_col else name)


def _sql_lit(v) -> str:
    if isinstance(v, str):
        return "'" + v.replace("'", "''") + "'"
    return repr(v)


def _operand_sql(node: Node, columns: set[str], tags_col: str) -> str:
    if node.kind == "attr":
        return _sql_attr(node.value, columns, tags_col)
    if node.kind == "lit":
        return _sql_lit(node.value)
    if node.kind == "func":
        return _FUNCTIONS[node.value]["sql"](
            *[_operand_sql(a, columns, tags_col) for a in node.args or []])
    raise ValueError(node.kind)


def _to_sql(node: Node, columns: set[str], tags_col: str) -> str:
    if node.kind == "and":
        return f"({_to_sql(node.left, columns, tags_col)} AND {_to_sql(node.right, columns, tags_col)})"
    if node.kind == "or":
        return f"({_to_sql(node.left, columns, tags_col)} OR {_to_sql(node.right, columns, tags_col)})"
    if node.kind == "not":
        return f"(NOT {_to_sql(node.left, columns, tags_col)})"
    if node.kind == "func":  # boolean function as bare predicate
        return _operand_sql(node, columns, tags_col)
    if node.kind == "cmp":
        lhs = _operand_sql(node.left, columns, tags_col)
        op = node.op
        if op == "in":
            vals = node.right.value if node.right.kind == "list" else [node.right.value]
            return f"({lhs} IN ({', '.join(_sql_lit(v) for v in vals)}))"
        if op in ("like", "ilike"):
            return f"({lhs} {op.upper()} {_sql_lit(str(node.right.value))})"
        sql_op = {"==": "=", "!=": "<>"}.get(op, op)
        return f"({lhs} {sql_op} {_sql_lit(node.right.value)})"
    raise ValueError(node.kind)


class Expression:
    """A compiled filter expression: vectorized evaluator + SQL renderer."""

    def __init__(self, text: str):
        self.text = text
        self.ast = Parser(_tokenize(text)).parse()

    def mask(self, batch: pa.Table, tags_col: str = "tags") -> np.ndarray:
        """Boolean numpy mask; SQL WHERE semantics (NULL -> dropped)."""
        res = _eval(self.ast, batch, tags_col)
        if isinstance(res, pa.ChunkedArray):
            res = res.combine_chunks()
        return np.asarray(pc.fill_null(res, False))

    def filter(self, batch: pa.Table, tags_col: str = "tags") -> pa.Table:
        return batch.filter(pa.array(self.mask(batch, tags_col)))

    def to_sql(self, columns: set[str] | None = None, tags_col: str = "tags") -> str:
        return _to_sql(self.ast, columns or set(), tags_col)
