"""Minimal SQL lexer for the DDL path.

The reference classifies DDL with the full TiDB parser
(drainer/util.go:270-275 getParser, pkg/loader/load.go:380-399 ast
switch). A regex stand-in mis-handles exactly one thing a lexer
handles for free: string literals — a comma inside ``COMMENT 'a,b'``
or a paren inside ``ENUM('a)')`` derails any split/paren-count regex.
This lexer produces a flat token stream where every literal is ONE
token, so structure passes (top-level comma split, paren grouping)
become trivially correct.

Token kinds:
- ``ident``  — backtick-quoted identifier, ``value`` = unquoted text
  (`` `` escapes a backtick inside, MySQL rules);
- ``word``   — bare identifier / keyword (value = text);
- ``string`` — '...'/"..." literal, value = unquoted with '' and \\'
  escapes resolved;
- ``number`` — numeric literal;
- ``punct``  — single structural character: ( ) , . ; = or any other
  symbol.

``start``/``end`` are source offsets so callers can surface the RAW
text of any token span (the skipped-columns audit prints source, not
a token-joined reconstruction).
"""

from __future__ import annotations

from typing import NamedTuple


class Token(NamedTuple):
    kind: str
    text: str    # raw source slice
    value: str   # semantic value (unquoted for ident/string)
    start: int
    end: int     # exclusive


def tokenize(sql: str) -> list[Token]:
    toks: list[Token] = []
    i, n = 0, len(sql)
    while i < n:
        c = sql[i]
        if c.isspace():
            i += 1
            continue
        if c == "`":
            j, buf = i + 1, []
            while j < n:
                if sql[j] == "`":
                    if j + 1 < n and sql[j + 1] == "`":   # `` escape
                        buf.append("`")
                        j += 2
                        continue
                    break
                buf.append(sql[j])
                j += 1
            end = min(j + 1, n)
            toks.append(Token("ident", sql[i:end], "".join(buf), i, end))
            i = end
            continue
        if c in ("'", '"'):
            q = c
            j, buf = i + 1, []
            while j < n:
                if sql[j] == "\\" and j + 1 < n:           # \' escape
                    buf.append(sql[j + 1])
                    j += 2
                    continue
                if sql[j] == q:
                    if j + 1 < n and sql[j + 1] == q:      # '' escape
                        buf.append(q)
                        j += 2
                        continue
                    break
                buf.append(sql[j])
                j += 1
            end = min(j + 1, n)
            toks.append(Token("string", sql[i:end], "".join(buf), i, end))
            i = end
            continue
        if c.isdigit():
            j = i + 1
            while j < n and (sql[j].isdigit() or sql[j] in ".eE"
                             or (sql[j] in "+-" and sql[j - 1] in "eE")):
                j += 1
            toks.append(Token("number", sql[i:j], sql[i:j], i, j))
            i = j
            continue
        if c.isalpha() or c == "_":
            j = i + 1
            while j < n and (sql[j].isalnum() or sql[j] == "_"):
                j += 1
            toks.append(Token("word", sql[i:j], sql[i:j], i, j))
            i = j
            continue
        toks.append(Token("punct", c, c, i, i + 1))
        i += 1
    return toks


def is_punct(t: Token, ch: str) -> bool:
    return t.kind == "punct" and t.value == ch


def kw(t: Token | None) -> str | None:
    """Lower-cased keyword view of a token (words only)."""
    return t.value.lower() if t is not None and t.kind == "word" else None


def split_top_level(toks: list[Token], sep: str = ",") -> list[list[Token]]:
    """Split a token list on ``sep`` punct tokens at paren depth 0.
    String/ident literals are single tokens, so their contents can
    never open, close, or split anything."""
    parts: list[list[Token]] = [[]]
    depth = 0
    for t in toks:
        if t.kind == "punct":
            if t.value == "(":
                depth += 1
            elif t.value == ")":
                depth -= 1
            elif t.value == sep and depth == 0:
                parts.append([])
                continue
        parts[-1].append(t)
    return parts


def paren_group(toks: list[Token], i: int) -> tuple[list[Token], int] | None:
    """If ``toks[i]`` opens a paren group, return (inside, index after
    the closing paren); else None."""
    if i >= len(toks) or not is_punct(toks[i], "("):
        return None
    depth = 0
    for k in range(i, len(toks)):
        if is_punct(toks[k], "("):
            depth += 1
        elif is_punct(toks[k], ")"):
            depth -= 1
            if depth == 0:
                return toks[i + 1:k], k + 1
    return None


def raw_span(sql: str, toks: list[Token]) -> str:
    """The raw source text covered by a token span."""
    if not toks:
        return ""
    return sql[toks[0].start:toks[-1].end]
