"""Sandboxed mini-JavaScript interpreter for hook execution.

The reference embeds V8 on a dedicated thread (`src/js/deno.rs:77-130`) to
run user `selectEmbeddingProperties(document)` hooks. This image has no JS
engine (no node/deno/quickjs, and none can be downloaded), so dynamic hooks
run on this from-scratch interpreter instead: a tokenizer + Pratt parser +
tree-walking evaluator over a deliberately small JS subset — sandboxed BY
CONSTRUCTION (no host callouts: the evaluator can only touch JSON-shaped
values and a whitelist of string/array/object methods, with a hard step
budget against runaway code).

Supported subset (everything a realistic embedding-selection hook uses):
  - `function name(doc) { ... }`, arrow functions (block or expression body)
  - statements: const/let/var, if/else, return, blocks, expression stmts
  - literals: strings ('/"/`template ${}`), numbers, true/false/null/undefined,
    arrays, objects
  - member access `a.b`, `a?.b`, `a["b"]`, calls, ternary, unary `! - + typeof`,
    binary `+ - * / % == != === !== < <= > >= && || ??`
  - methods: string toLowerCase/toUpperCase/trim/includes/startsWith/endsWith/
    split/slice/concat/replace; array includes/filter/map/join/slice/concat/
    flat/indexOf/length; Object.keys/values/entries, Array.isArray,
    JSON.stringify/parse, String(), Number(), Boolean()

Anything outside the subset raises MiniJsError — callers fall back to the
other hook tiers (engine/hooks.py).
"""

from __future__ import annotations

import json
import re
from typing import Any, Callable, Dict, List, Optional, Tuple


class MiniJsError(Exception):
    pass


_UNDEFINED = object()  # JS undefined (distinct from null=None)


# --- tokenizer ----------------------------------------------------------------

_TOKEN_RE = re.compile(
    r"""
    (?P<ws>\s+|//[^\n]*|/\*.*?\*/)
  | (?P<num>\d+(?:\.\d+)?(?:[eE][+-]?\d+)?)
  | (?P<name>[A-Za-z_$][A-Za-z0-9_$]*)
  | (?P<str>'(?:\\.|[^'\\])*'|"(?:\\.|[^"\\])*")
  | (?P<tmpl>`(?:\\.|[^`\\])*`)
  | (?P<punct>=>|\?\.|\?\?|===|!==|==|!=|<=|>=|&&|\|\||[-+*/%!<>=(){}\[\],.:;?])
    """,
    re.VERBOSE | re.DOTALL,
)

_KEYWORDS = {
    "function", "return", "if", "else", "const", "let", "var", "true",
    "false", "null", "undefined", "typeof",
}


def _tokenize(src: str) -> List[Tuple[str, str]]:
    out: List[Tuple[str, str]] = []
    i = 0
    while i < len(src):
        m = _TOKEN_RE.match(src, i)
        if m is None:
            raise MiniJsError(f"unexpected character {src[i]!r} at {i}")
        i = m.end()
        kind = m.lastgroup
        if kind == "ws":
            continue
        text = m.group()
        if kind == "name" and text in _KEYWORDS:
            out.append(("kw", text))
        else:
            out.append((kind, text))
    out.append(("eof", ""))
    return out


# --- parser (Pratt) -----------------------------------------------------------

_BINARY_PREC = {
    "??": 1, "||": 2, "&&": 3,
    "==": 7, "!=": 7, "===": 7, "!==": 7,
    "<": 8, "<=": 8, ">": 8, ">=": 8,
    "+": 9, "-": 9, "*": 10, "/": 10, "%": 10,
}


class _Parser:
    def __init__(self, tokens: List[Tuple[str, str]]) -> None:
        self.toks = tokens
        self.i = 0

    def peek(self) -> Tuple[str, str]:
        return self.toks[self.i]

    def next(self) -> Tuple[str, str]:
        t = self.toks[self.i]
        self.i += 1
        return t

    def expect(self, text: str) -> None:
        k, t = self.next()
        if t != text:
            raise MiniJsError(f"expected {text!r}, got {t!r}")

    def at(self, text: str) -> bool:
        return self.peek()[1] == text

    def eat(self, text: str) -> bool:
        if self.at(text):
            self.next()
            return True
        return False

    # -- statements -----------------------------------------------------------

    def parse_program(self) -> List[Any]:
        stmts = []
        while self.peek()[0] != "eof":
            stmts.append(self.parse_statement())
        return stmts

    def parse_statement(self) -> Any:
        k, t = self.peek()
        if t == "function":
            return self.parse_function_decl()
        if t in ("const", "let", "var"):
            self.next()
            _, name = self.next()
            init = _UNDEFINED
            if self.eat("="):
                init = self.parse_expression()
            self.eat(";")
            return ("decl", name, init)
        if t == "return":
            self.next()
            if self.at(";") or self.at("}"):
                self.eat(";")
                return ("return", ("lit", _UNDEFINED))
            e = self.parse_expression()
            self.eat(";")
            return ("return", e)
        if t == "if":
            self.next()
            self.expect("(")
            cond = self.parse_expression()
            self.expect(")")
            then = self.parse_statement()
            other = None
            if self.eat("else"):
                other = self.parse_statement()
            return ("if", cond, then, other)
        if t == "{":
            self.next()
            body = []
            while not self.eat("}"):
                body.append(self.parse_statement())
            return ("block", body)
        e = self.parse_expression()
        self.eat(";")
        return ("expr", e)

    def parse_function_decl(self) -> Any:
        self.expect("function")
        _, name = self.next()
        params = self.parse_params()
        self.expect("{")
        body = []
        while not self.eat("}"):
            body.append(self.parse_statement())
        return ("funcdecl", name, params, body)

    def parse_params(self) -> List[str]:
        self.expect("(")
        params = []
        while not self.eat(")"):
            k, t = self.next()
            if k == "name":
                params.append(t)
            elif t == ",":
                continue
            else:
                raise MiniJsError(f"bad parameter {t!r}")
        return params

    # -- expressions ------------------------------------------------------------

    def parse_expression(self) -> Any:
        return self.parse_ternary()

    def parse_ternary(self) -> Any:
        cond = self.parse_binary(0)
        if self.eat("?"):
            a = self.parse_expression()
            self.expect(":")
            b = self.parse_expression()
            return ("ternary", cond, a, b)
        return cond

    def parse_binary(self, min_prec: int) -> Any:
        left = self.parse_unary()
        while True:
            _, t = self.peek()
            prec = _BINARY_PREC.get(t)
            if prec is None or prec < min_prec:
                return left
            self.next()
            right = self.parse_binary(prec + 1)
            left = ("bin", t, left, right)

    def parse_unary(self) -> Any:
        k, t = self.peek()
        if t in ("!", "-", "+"):
            self.next()
            return ("unary", t, self.parse_unary())
        if t == "typeof":
            self.next()
            return ("typeof", self.parse_unary())
        return self.parse_postfix(self.parse_primary())

    def parse_postfix(self, e: Any) -> Any:
        while True:
            if self.eat("."):
                _, name = self.next()
                e = ("member", e, ("lit", name), False)
            elif self.eat("?."):
                _, name = self.next()
                e = ("member", e, ("lit", name), True)
            elif self.eat("["):
                idx = self.parse_expression()
                self.expect("]")
                e = ("member", e, idx, False)
            elif self.eat("("):
                args = []
                while not self.eat(")"):
                    args.append(self.parse_expression())
                    self.eat(",")
                e = ("call", e, args)
            else:
                return e

    def parse_primary(self) -> Any:
        k, t = self.next()
        if k == "num":
            v = float(t)
            return ("lit", int(v) if v.is_integer() else v)
        if k == "str":
            return ("lit", _unescape(t[1:-1]))
        if k == "tmpl":
            return self.parse_template(t[1:-1])
        if k == "kw":
            if t == "true":
                return ("lit", True)
            if t == "false":
                return ("lit", False)
            if t == "null":
                return ("lit", None)
            if t == "undefined":
                return ("lit", _UNDEFINED)
            raise MiniJsError(f"unexpected keyword {t!r}")
        if k == "name":
            # arrow fn:  name => expr
            if self.at("=>"):
                self.next()
                return self.parse_arrow_body([t])
            return ("name", t)
        if t == "(":
            # could be (a, b) => ... or a parenthesized expression
            save = self.i
            try:
                params = []
                while not self.eat(")"):
                    kk, tt = self.next()
                    if kk == "name":
                        params.append(tt)
                    elif tt == ",":
                        continue
                    else:
                        raise MiniJsError("not params")
                if self.eat("=>"):
                    return self.parse_arrow_body(params)
                raise MiniJsError("not arrow")
            except MiniJsError:
                self.i = save
            e = self.parse_expression()
            self.expect(")")
            return e
        if t == "[":
            items = []
            while not self.eat("]"):
                items.append(self.parse_expression())
                self.eat(",")
            return ("array", items)
        if t == "{":
            pairs = []
            while not self.eat("}"):
                kk, key = self.next()
                if kk == "str":
                    key = _unescape(key[1:-1])
                elif kk not in ("name", "num", "kw"):
                    raise MiniJsError(f"bad object key {key!r}")
                self.expect(":")
                pairs.append((key, self.parse_expression()))
                self.eat(",")
            return ("object", pairs)
        raise MiniJsError(f"unexpected token {t!r}")

    def parse_arrow_body(self, params: List[str]) -> Any:
        if self.at("{"):
            self.next()
            body = []
            while not self.eat("}"):
                body.append(self.parse_statement())
            return ("arrow", params, body)
        return ("arrow", params, [("return", self.parse_expression())])

    def parse_template(self, raw: str) -> Any:
        """`a ${x} b` -> concat of parts."""
        parts: List[Any] = []
        i = 0
        buf = ""
        while i < len(raw):
            if raw.startswith("${", i):
                end = raw.index("}", i)
                if buf:
                    parts.append(("lit", buf))
                    buf = ""
                sub = _Parser(_tokenize(raw[i + 2:end]))
                parts.append(("tostr", sub.parse_expression()))
                i = end + 1
            else:
                buf += raw[i]
                i += 1
        if buf:
            parts.append(("lit", buf))
        if not parts:
            return ("lit", "")
        e = parts[0] if parts[0][0] == "lit" else ("tostr", parts[0][1])
        for p in parts[1:]:
            e = ("bin", "+", ("tostr", e) if e[0] != "lit" else e, p)
        return ("tostr", e)


def _unescape(s: str) -> str:
    return (
        s.replace("\\n", "\n").replace("\\t", "\t").replace("\\'", "'")
        .replace('\\"', '"').replace("\\`", "`").replace("\\\\", "\\")
    )


# --- evaluator ------------------------------------------------------------------


class _Env:
    __slots__ = ("vars", "parent")

    def __init__(self, parent: Optional["_Env"] = None) -> None:
        self.vars: Dict[str, Any] = {}
        self.parent = parent

    def get(self, name: str) -> Any:
        e: Optional[_Env] = self
        while e is not None:
            if name in e.vars:
                return e.vars[name]
            e = e.parent
        raise MiniJsError(f"undefined identifier {name!r}")

    def set(self, name: str, value: Any) -> None:
        self.vars[name] = value


class _Return(Exception):
    def __init__(self, value: Any) -> None:
        self.value = value


def _truthy(v: Any) -> bool:
    if v is _UNDEFINED or v is None:
        return False
    if isinstance(v, bool):
        return v
    if isinstance(v, (int, float)):
        return v != 0
    if isinstance(v, str):
        return len(v) > 0
    return True  # objects/arrays are truthy


def _js_str(v: Any) -> str:
    if v is _UNDEFINED:
        return "undefined"
    if v is None:
        return "null"
    if isinstance(v, bool):
        return "true" if v else "false"
    if isinstance(v, float) and v.is_integer():
        return str(int(v))
    if isinstance(v, (dict, list)):
        return json.dumps(v)
    return str(v)


class _Interp:
    MAX_STEPS = 200_000
    MAX_DEPTH = 64

    def __init__(self) -> None:
        self.steps = 0
        self.depth = 0

    def tick(self) -> None:
        self.steps += 1
        if self.steps > self.MAX_STEPS:
            raise MiniJsError("step budget exhausted (runaway hook)")

    # statements
    def run_block(self, stmts: List[Any], env: _Env) -> None:
        for s in stmts:
            self.run_stmt(s, env)

    def run_stmt(self, s: Any, env: _Env) -> None:
        self.tick()
        op = s[0]
        if op == "decl":
            env.set(s[1], self.eval(s[2], env) if s[2] is not _UNDEFINED else _UNDEFINED)
        elif op == "return":
            raise _Return(self.eval(s[1], env))
        elif op == "if":
            if _truthy(self.eval(s[1], env)):
                self.run_stmt(s[2], env)
            elif s[3] is not None:
                self.run_stmt(s[3], env)
        elif op == "block":
            self.run_block(s[1], _Env(env))
        elif op == "expr":
            self.eval(s[1], env)
        elif op == "funcdecl":
            env.set(s[1], ("closure", s[2], s[3], env))
        else:
            raise MiniJsError(f"unsupported statement {op}")

    # expressions
    def eval(self, e: Any, env: _Env) -> Any:
        self.tick()
        op = e[0]
        if op == "lit":
            return e[1]
        if op == "name":
            return env.get(e[1])
        if op == "array":
            return [self.eval(x, env) for x in e[1]]
        if op == "object":
            return {k: self.eval(v, env) for k, v in e[1]}
        if op == "tostr":
            return _js_str(self.eval(e[1], env))
        if op == "ternary":
            return (
                self.eval(e[2], env)
                if _truthy(self.eval(e[1], env))
                else self.eval(e[3], env)
            )
        if op == "unary":
            v = self.eval(e[2], env)
            if e[1] == "!":
                return not _truthy(v)
            if e[1] == "-":
                return -self._num(v)
            return +self._num(v)
        if op == "typeof":
            try:
                v = self.eval(e[1], env)
            except MiniJsError:
                return "undefined"
            if v is _UNDEFINED:
                return "undefined"
            if v is None:
                return "object"
            if isinstance(v, bool):
                return "boolean"
            if isinstance(v, (int, float)):
                return "number"
            if isinstance(v, str):
                return "string"
            if isinstance(v, tuple) and v and v[0] == "closure":
                return "function"
            return "object"
        if op == "bin":
            return self.eval_bin(e[1], e[2], e[3], env)
        if op == "member":
            return self.eval_member(e, env)
        if op == "call":
            return self.eval_call(e, env)
        if op == "arrow":
            return ("closure", e[1], e[2], env)
        raise MiniJsError(f"unsupported expression {op}")

    @staticmethod
    def _num(v: Any) -> float:
        if isinstance(v, bool):
            return 1.0 if v else 0.0
        if isinstance(v, (int, float)):
            return v
        if isinstance(v, str):
            try:
                return float(v)
            except ValueError:
                raise MiniJsError(f"NaN from {v!r}")
        raise MiniJsError(f"not a number: {v!r}")

    def eval_bin(self, opr: str, le: Any, re_: Any, env: _Env) -> Any:
        if opr == "&&":
            lv = self.eval(le, env)
            return self.eval(re_, env) if _truthy(lv) else lv
        if opr == "||":
            lv = self.eval(le, env)
            return lv if _truthy(lv) else self.eval(re_, env)
        if opr == "??":
            lv = self.eval(le, env)
            return self.eval(re_, env) if lv is None or lv is _UNDEFINED else lv
        lv, rv = self.eval(le, env), self.eval(re_, env)
        if opr == "+":
            if isinstance(lv, str) or isinstance(rv, str):
                return _js_str(lv) + _js_str(rv)
            return self._num(lv) + self._num(rv)
        if opr in ("==", "==="):
            return self._eq(lv, rv)
        if opr in ("!=", "!=="):
            return not self._eq(lv, rv)
        if opr in ("<", "<=", ">", ">="):
            if isinstance(lv, str) and isinstance(rv, str):
                pass
            else:
                lv, rv = self._num(lv), self._num(rv)
            return {
                "<": lv < rv, "<=": lv <= rv, ">": lv > rv, ">=": lv >= rv,
            }[opr]
        a, b = self._num(lv), self._num(rv)
        if opr == "-":
            return a - b
        if opr == "*":
            return a * b
        if opr == "/":
            if b == 0:
                raise MiniJsError("division by zero")
            return a / b
        if opr == "%":
            return a % b
        raise MiniJsError(f"unsupported operator {opr}")

    @staticmethod
    def _eq(a: Any, b: Any) -> bool:
        if (a is _UNDEFINED or a is None) and (b is _UNDEFINED or b is None):
            return True
        if isinstance(a, bool) or isinstance(b, bool):
            return a is b
        return a == b

    def eval_member(self, e: Any, env: _Env) -> Any:
        obj = self.eval(e[1], env)
        optional = e[3]
        if obj is _UNDEFINED or obj is None:
            if optional:
                return _UNDEFINED
            raise MiniJsError("member access on null/undefined")
        key = self.eval(e[2], env)
        if isinstance(obj, dict):
            return obj.get(key, _UNDEFINED)
        if isinstance(obj, list):
            if key == "length":
                return len(obj)
            if isinstance(key, (int, float)):
                i = int(key)
                return obj[i] if 0 <= i < len(obj) else _UNDEFINED
            return ("method", obj, key)
        if isinstance(obj, str):
            if key == "length":
                return len(obj)
            return ("method", obj, key)
        raise MiniJsError(f"cannot access {key!r} on {type(obj).__name__}")

    # method/function calls
    def eval_call(self, e: Any, env: _Env) -> Any:
        callee = e[1]
        args = [self.eval(a, env) for a in e[2]]
        # global builtins: Object.keys(x), JSON.stringify(x), ...
        if callee[0] == "member" and callee[1][0] == "name":
            base = callee[1][1]
            key_e = callee[2]
            key = key_e[1] if key_e[0] == "lit" else self.eval(key_e, env)
            if base == "Object" and key in ("keys", "values", "entries"):
                (o,) = args
                if not isinstance(o, dict):
                    raise MiniJsError("Object.* needs an object")
                if key == "keys":
                    return list(o.keys())
                if key == "values":
                    return list(o.values())
                return [[k, v] for k, v in o.items()]
            if base == "JSON" and key == "stringify":
                return json.dumps(_strip_undefined(args[0]))
            if base == "JSON" and key == "parse":
                return json.loads(args[0])
            if base == "Array" and key == "isArray":
                return isinstance(args[0], list)
        if callee[0] == "name" and callee[1] in ("String", "Number", "Boolean"):
            (v,) = args or [_UNDEFINED]
            if callee[1] == "String":
                return _js_str(v)
            if callee[1] == "Number":
                return self._num(v)
            return _truthy(v)
        target = self.eval(callee, env)
        if isinstance(target, tuple) and target and target[0] == "closure":
            return self.call_closure(target, args)
        if isinstance(target, tuple) and target and target[0] == "method":
            return self.call_method(target[1], target[2], args)
        raise MiniJsError("not callable")

    def call_closure(self, closure: Tuple, args: List[Any]) -> Any:
        self.depth += 1
        if self.depth > self.MAX_DEPTH:
            self.depth -= 1
            raise MiniJsError("call depth exhausted (runaway recursion)")
        _, params, body, defenv = closure
        env = _Env(defenv)
        for i, p in enumerate(params):
            env.set(p, args[i] if i < len(args) else _UNDEFINED)
        try:
            self.run_block(body, env)
            return _UNDEFINED
        except _Return as r:
            return r.value
        finally:
            self.depth -= 1

    def call_method(self, obj: Any, name: str, args: List[Any]) -> Any:
        self.tick()
        if isinstance(obj, str):
            table: Dict[str, Callable] = {
                "toLowerCase": lambda: obj.lower(),
                "toUpperCase": lambda: obj.upper(),
                "trim": lambda: obj.strip(),
                "includes": lambda: args[0] in obj,
                "startsWith": lambda: obj.startswith(args[0]),
                "endsWith": lambda: obj.endswith(args[0]),
                "split": lambda: obj.split(args[0]) if args else [obj],
                "slice": lambda: obj[_slice(args, len(obj))],
                "concat": lambda: obj + "".join(_js_str(a) for a in args),
                "replace": lambda: obj.replace(args[0], args[1], 1),
                "replaceAll": lambda: obj.replace(args[0], args[1]),
                "indexOf": lambda: obj.find(args[0]),
                "charAt": lambda: obj[int(args[0])] if 0 <= int(args[0]) < len(obj) else "",
            }
        elif isinstance(obj, list):
            table = {
                "includes": lambda: args[0] in obj,
                "indexOf": lambda: obj.index(args[0]) if args[0] in obj else -1,
                "join": lambda: _js_str(args[0] if args else ",").join(
                    _js_str(x) for x in obj
                ),
                "slice": lambda: obj[_slice(args, len(obj))],
                "concat": lambda: obj + (args[0] if args and isinstance(args[0], list) else list(args)),
                "flat": lambda: _flat(obj),
                "filter": lambda: [
                    x for x in obj if _truthy(self.call_closure(args[0], [x]))
                ],
                "map": lambda: [self.call_closure(args[0], [x]) for x in obj],
                "find": lambda: next(
                    (x for x in obj if _truthy(self.call_closure(args[0], [x]))),
                    _UNDEFINED,
                ),
                "some": lambda: any(
                    _truthy(self.call_closure(args[0], [x])) for x in obj
                ),
                "every": lambda: all(
                    _truthy(self.call_closure(args[0], [x])) for x in obj
                ),
            }
        else:
            raise MiniJsError(f"no methods on {type(obj).__name__}")
        fn = table.get(name)
        if fn is None:
            raise MiniJsError(f"unsupported method .{name}()")
        return fn()


def _slice(args: List[Any], n: int):
    a = int(args[0]) if args else 0
    b = int(args[1]) if len(args) > 1 else n
    return slice(a, b)


def _flat(xs: List[Any]) -> List[Any]:
    out: List[Any] = []
    for x in xs:
        out.extend(x) if isinstance(x, list) else out.append(x)
    return out


def _strip_undefined(v: Any) -> Any:
    if v is _UNDEFINED:
        return None
    if isinstance(v, list):
        return [_strip_undefined(x) for x in v]
    if isinstance(v, dict):
        return {k: _strip_undefined(x) for k, x in v.items() if x is not _UNDEFINED}
    return v


def run_hook(code: str, fn_name: str, document: Dict[str, Any]) -> Any:
    """Parse ``code``, call ``fn_name(document)``, return the JSON-shaped
    result (undefined -> None). Raises MiniJsError on unsupported JS."""
    parser = _Parser(_tokenize(code))
    program = parser.parse_program()
    interp = _Interp()
    env = _Env()
    interp.run_block(program, env)
    fn = env.get(fn_name)
    if not (isinstance(fn, tuple) and fn and fn[0] == "closure"):
        raise MiniJsError(f"{fn_name} is not a function")
    result = interp.call_closure(fn, [document])
    return _strip_undefined(result)
