"""Code-aware parsing for code-search indexing.

Counterpart of the reference's tree-sitter TSX parser
(`src/code_parser/mod.rs:72-140`, token kinds at :22-50: comments, imports,
function declarations with params/JSX, global identifiers). No tree-sitter
runtime ships in this image, so parsing is lexical (language-aware regex
over a comment/string-stripped source) — which covers the token classes the
reference extracts without a full grammar. Like the reference's, this
parser is exposed for code-aware pipelines (the Chunker uses block
splitting; SURVEY.md notes the reference never wired it into the document
path either).
"""

from __future__ import annotations

import dataclasses
import enum
import re
from typing import List, Optional


class TokenKind(str, enum.Enum):
    COMMENT = "comment"
    IMPORT = "import"
    FUNCTION = "function"
    CLASS = "class"
    IDENTIFIER = "identifier"
    STRING = "string"


@dataclasses.dataclass(frozen=True)
class CodeToken:
    kind: TokenKind
    text: str
    name: Optional[str] = None        # function/class/import target
    params: Optional[tuple] = None    # function parameter names
    line: int = 0


_LINE_COMMENT = {
    "ts": "//", "tsx": "//", "js": "//", "jsx": "//", "py": "#",
    "rs": "//", "go": "//", "java": "//", "c": "//", "cpp": "//",
}

_TS_IMPORT = re.compile(
    r"^\s*import\s+(?:(?:[\w*{},\s]+)\s+from\s+)?['\"]([^'\"]+)['\"]", re.M
)
_PY_IMPORT = re.compile(r"^\s*(?:from\s+([\w.]+)\s+import|import\s+([\w.]+))", re.M)
_TS_FUNC = re.compile(
    r"(?:export\s+)?(?:async\s+)?function\s+(\w+)\s*\(([^)]*)\)"
    r"|(?:export\s+)?const\s+(\w+)\s*=\s*(?:async\s*)?\(([^)]*)\)\s*(?::[^=]+)?=>"
)
_PY_FUNC = re.compile(r"^\s*(?:async\s+)?def\s+(\w+)\s*\(([^)]*)\)", re.M)
_TS_CLASS = re.compile(r"(?:export\s+)?class\s+(\w+)")
_PY_CLASS = re.compile(r"^\s*class\s+(\w+)", re.M)
_STRING = re.compile(r"'(?:[^'\\]|\\.)*'|\"(?:[^\"\\]|\\.)*\"|`(?:[^`\\]|\\.)*`")
_IDENT = re.compile(r"\b[A-Za-z_][A-Za-z0-9_]{2,}\b")

_KEYWORDS = frozenset(
    "function const let var return if else for while import export from class "
    "extends implements interface type enum async await new this super def "
    "lambda pass None True False and or not in is elif try except finally with "
    "as yield raise del global nonlocal print self".split()
)


def _params(raw: str) -> tuple:
    out = []
    for p in raw.split(","):
        p = p.strip().split(":")[0].split("=")[0].strip()
        if p and p not in ("self", "cls"):
            out.append(p.lstrip("*"))
    return tuple(out)


def _line_of(src: str, pos: int) -> int:
    return src.count("\n", 0, pos) + 1


class CodeParser:
    """parse(source, language) -> typed token list."""

    def parse(self, source: str, language: str = "tsx") -> List[CodeToken]:
        lang = language.lower().lstrip(".")
        tokens: List[CodeToken] = []

        # comments
        marker = _LINE_COMMENT.get(lang, "//")
        for mo in re.finditer(re.escape(marker) + r"(.*)$", source, re.M):
            text = mo.group(1).strip()
            if text:
                tokens.append(
                    CodeToken(TokenKind.COMMENT, text, line=_line_of(source, mo.start()))
                )
        if lang != "py":
            for mo in re.finditer(r"/\*(.*?)\*/", source, re.S):
                text = mo.group(1).strip()
                if text:
                    tokens.append(
                        CodeToken(
                            TokenKind.COMMENT, text, line=_line_of(source, mo.start())
                        )
                    )

        # strip strings/comments for the structural passes
        stripped = _STRING.sub('""', source)

        # imports (on the raw source — the module path lives in a string)
        import_re = _PY_IMPORT if lang == "py" else _TS_IMPORT
        for mo in import_re.finditer(source):
            name = next(g for g in mo.groups() if g)
            tokens.append(
                CodeToken(
                    TokenKind.IMPORT, mo.group(0).strip(), name=name,
                    line=_line_of(source, mo.start()),
                )
            )

        # functions
        if lang == "py":
            for mo in _PY_FUNC.finditer(stripped):
                tokens.append(
                    CodeToken(
                        TokenKind.FUNCTION, mo.group(0).strip(),
                        name=mo.group(1), params=_params(mo.group(2)),
                        line=_line_of(source, mo.start()),
                    )
                )
            for mo in _PY_CLASS.finditer(stripped):
                tokens.append(
                    CodeToken(
                        TokenKind.CLASS, mo.group(0).strip(), name=mo.group(1),
                        line=_line_of(source, mo.start()),
                    )
                )
        else:
            for mo in _TS_FUNC.finditer(stripped):
                name = mo.group(1) or mo.group(3)
                raw_params = mo.group(2) if mo.group(1) else mo.group(4)
                tokens.append(
                    CodeToken(
                        TokenKind.FUNCTION, mo.group(0).strip(),
                        name=name, params=_params(raw_params or ""),
                        line=_line_of(source, mo.start()),
                    )
                )
            for mo in _TS_CLASS.finditer(stripped):
                tokens.append(
                    CodeToken(
                        TokenKind.CLASS, mo.group(0).strip(), name=mo.group(1),
                        line=_line_of(source, mo.start()),
                    )
                )

        # global identifiers (deduped, keywords removed)
        seen = set()
        for mo in _IDENT.finditer(stripped):
            word = mo.group(0)
            if word in _KEYWORDS or word in seen:
                continue
            seen.add(word)
            tokens.append(
                CodeToken(
                    TokenKind.IDENTIFIER, word, line=_line_of(source, mo.start())
                )
            )
        return tokens
