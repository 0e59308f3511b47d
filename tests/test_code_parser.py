from orama_core_tpu.nlp.code_parser import CodeParser, TokenKind


TSX = """
// top comment
import React from 'react';
import { useState } from 'react';

/* block
   comment */
export function Counter(props: Props) {
  const [count, setCount] = useState(0);
  return <div>{count}</div>;
}

const handler = async (event: Event) => { console.log(event); };

export class Widget extends Base {}
"""

PY = '''
# a python comment
import os
from collections import defaultdict

def process(items, limit=10):
    return items[:limit]

class Pipeline:
    async def run(self, batch):
        pass
'''


def test_tsx_parse():
    tokens = CodeParser().parse(TSX, "tsx")
    kinds = {}
    for t in tokens:
        kinds.setdefault(t.kind, []).append(t)
    comments = [t.text for t in kinds[TokenKind.COMMENT]]
    assert "top comment" in comments
    assert any("block" in c for c in comments)
    imports = [t.name for t in kinds[TokenKind.IMPORT]]
    assert imports.count("react") == 2
    funcs = {t.name: t for t in kinds[TokenKind.FUNCTION]}
    assert "Counter" in funcs and funcs["Counter"].params == ("props",)
    assert "handler" in funcs and funcs["handler"].params == ("event",)
    classes = [t.name for t in kinds[TokenKind.CLASS]]
    assert classes == ["Widget"]
    idents = [t.text for t in kinds[TokenKind.IDENTIFIER]]
    assert "useState" in idents


def test_py_parse():
    tokens = CodeParser().parse(PY, "py")
    kinds = {}
    for t in tokens:
        kinds.setdefault(t.kind, []).append(t)
    assert [t.text for t in kinds[TokenKind.COMMENT]] == ["a python comment"]
    assert {t.name for t in kinds[TokenKind.IMPORT]} == {"os", "collections"}
    funcs = {t.name: t for t in kinds[TokenKind.FUNCTION]}
    assert funcs["process"].params == ("items", "limit")
    assert "run" in funcs
    assert [t.name for t in kinds[TokenKind.CLASS]] == ["Pipeline"]


def test_line_numbers():
    tokens = CodeParser().parse("// c\nfunction f(a) {}", "js")
    fn = next(t for t in tokens if t.kind == TokenKind.FUNCTION)
    assert fn.line == 2
