"""One quote-aware scanner for the SQL front door.

``catalog.py`` grew four hand-rolled character loops that each tracked
"am I inside a quoted span?" with slightly different rules
(``_split_top_level``, ``_ansi_quotes``, ``_scan_balanced``, the
``sql_script`` statement splitter). Each new statement form risked a
fifth (VERDICT r10 next #8). This module is the single source of truth:
``spans()`` tokenizes a statement into text runs and quoted spans, and
every front-door scanning primitive is a small pure function over it.

Quoting rules (shared by every consumer, matching Spark + ANSI):
  * ``'...'``  string literal, ``''`` escapes a quote inside
  * ``"..."``  ANSI identifier, ``""`` escapes
  * `` `...` `` Spark identifier, ``````` `` `` `````` escapes
  * a quote span runs to its closing delimiter; an UNTERMINATED span
    extends to end-of-string (callers that must refuse pass
    ``strict=``).

No regexes here — the scanners are exact, and Hypothesis round-trip
tests pin them (tests/test_sqltext.py)."""

from __future__ import annotations

from typing import Iterator

QUOTES = "'\"`"


def spans(
    s: str,
    quotes: str = QUOTES,
    strict: str = "",
    comments: bool = False,
) -> Iterator[tuple[str, int, int]]:
    """Tokenize ``s`` into ``(kind, start, end)`` half-open spans.

    ``kind`` is ``"text"`` for a maximal run outside quotes, the quote
    character itself for a quoted span (delimiters INCLUDED), or
    ``"comment"`` (with ``comments=True``) for a ``--`` line comment
    up to but NOT including its newline. Comments and quotes are
    recognized in ONE pass — a quote inside a comment does not open a
    span, and ``--`` inside a quoted literal is data (the bug class a
    two-pass design invites). Doubled delimiters inside a span escape;
    a span whose closing delimiter is missing extends to ``len(s)``
    unless its quote char is listed in ``strict``, in which case
    ValueError names the offset. Concatenating ``s[start:end]`` over
    all spans reproduces ``s`` exactly (property-tested)."""
    i, n = 0, len(s)
    text_start = 0
    while i < n:
        c = s[i]
        if c in quotes:
            if text_start < i:
                yield ("text", text_start, i)
            j = i + 1
            while j < n:
                if s[j] == c:
                    if j + 1 < n and s[j + 1] == c:
                        j += 2
                        continue
                    break
                j += 1
            if j >= n:
                if c in strict:
                    raise ValueError(
                        f"unterminated {c}-quoted span at offset {i}: "
                        f"{s[i:i + 40]!r}"
                    )
                yield (c, i, n)
                return
            yield (c, i, j + 1)
            i = j + 1
            text_start = i
        elif comments and c == "-" and i + 1 < n and s[i + 1] == "-":
            if text_start < i:
                yield ("text", text_start, i)
            nl = s.find("\n", i)
            end = n if nl < 0 else nl  # the newline stays text
            yield ("comment", i, end)
            i = end
            text_start = i
        else:
            i += 1
    if text_start < n:
        yield ("text", text_start, n)


def unquote(span: str) -> str:
    """The identifier/literal VALUE of one quoted span produced by
    ``spans()``: delimiters stripped, doubled delimiters un-escaped.
    Tolerates a missing closing delimiter (unterminated span)."""
    if not span or span[0] not in QUOTES:
        return span
    q = span[0]
    body = span[1:]
    if body.endswith(q):
        body = body[:-1]
    return body.replace(q + q, q)


def split_statements(script: str) -> list[str]:
    """Split a ``;``-separated script into statements, quote-aware:
    a ``;`` inside any quoted span stays in its statement, and ``--``
    line comments OUTSIDE quotes are stripped. Preserves everything
    else byte-for-byte (including whitespace), so offsets into a
    statement still mean something to its own parser."""
    stmts: list[str] = []
    buf: list[str] = []
    for kind, start, end in spans(script, comments=True):
        if kind == "comment":
            continue  # stripped; its newline is the next text span's
        if kind != "text":
            buf.append(script[start:end])
            continue
        for c in script[start:end]:
            if c == ";":
                stmts.append("".join(buf))
                buf = []
            else:
                buf.append(c)
    stmts.append("".join(buf))
    return stmts


def split_top_level(s: str, sep: str = ",") -> list[str]:
    """Split on ``sep`` at paren/bracket depth zero outside quotes
    (SET lists and column lists can contain function calls and string
    literals with commas). Parts are stripped; empties dropped."""
    parts: list[str] = []
    buf: list[str] = []
    depth = 0
    for kind, start, end in spans(s):
        if kind != "text":
            buf.append(s[start:end])
            continue
        for c in s[start:end]:
            if c in "([":
                depth += 1
            elif c in ")]":
                depth -= 1
            elif c == sep and depth == 0:
                parts.append("".join(buf))
                buf = []
                continue
            buf.append(c)
    parts.append("".join(buf))
    return [p.strip() for p in parts if p.strip()]


def ansi_quotes(statement: str) -> str:
    """ANSI identifier compat: rewrite every ``"ident"`` span (outside
    single-quoted literals; ``""`` un-escapes) to Spark backtick
    quoting, backtick-escaping any embedded backticks. Single-quoted
    and backtick spans pass through untouched, so an already-Spark
    statement is a fixed point. An unterminated ``"`` span refuses
    loudly (a half-quoted identifier would silently change meaning)."""
    out: list[str] = []
    for kind, start, end in spans(statement, strict='"'):
        if kind == '"':
            ident = unquote(statement[start:end])
            out.append("`" + ident.replace("`", "``") + "`")
        else:
            out.append(statement[start:end])
    return "".join(out)


def scan_balanced(s: str, start: int) -> int:
    """Index just PAST the paren group opening at ``s[start]`` (which
    must be ``(``), quote-aware: parens inside quoted spans don't
    count. Raises on unbalanced input."""
    depth = 0
    for kind, b, e in spans(s):
        if e <= start or kind != "text":
            continue
        for i in range(max(b, start), e):
            c = s[i]
            if c == "(":
                depth += 1
            elif c == ")":
                depth -= 1
                if depth == 0:
                    return i + 1
    raise ValueError(f"unbalanced parentheses in {s[start:start + 40]!r}...")
