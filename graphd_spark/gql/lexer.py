"""Tokenizer for the graph query language.

Token inventory and character classes follow the reference lexer
(ref libgdp/gdp-lexer.c): atoms starting with a letter/underscore
continue over [A-Za-z0-9_] plus interior '-' (trailing dashes are put
back); atoms starting with a digit continue over the numeric-literal
charset (hex digits, '-', '.', ':', 'T', 'Z', 't', 'z') which covers
decimals, GUIDs and timestamps; strings are double-quoted with
backslash escapes (\\\\, \\", \\n; any other escaped char stands for
itself, ref fix_string); symbols: ( ) { } = != ~= < <= > >= <- -> | ||
- +.  '(: ... :)' spans are comments and are skipped (ref
libgdp/gdp-lexer.c consume_comments_and_space).
"""

from __future__ import annotations

import re
from dataclasses import dataclass


class LexError(Exception):
    pass


# token kinds
OPAR, CPAR, OBRC, CBRC = "(", ")", "{", "}"
EQ, NE, FE, LT, LE, GT, GE = "=", "!=", "~=", "<", "<=", ">", ">="
RARR, LARR, BIARR = "->", "<-", "<->"
BOR, LOR = "|", "||"
MINUS, PLUS = "-", "+"
ATOM, STR, VAR, END, ERRTOK = "atom", "str", "var", "end", "errtok"

_OP_KINDS = {EQ, NE, FE, LT, LE, GT, GE}


def _is_alnum_c(c: str) -> bool:
    return c.isalnum() or c == "_"


def _is_num_c(c: str) -> bool:
    # ref is_num_c: alnum/underscore plus - . : (T/Z/t/z are alnum anyway)
    return _is_alnum_c(c) or c in "-.:"


@dataclass(slots=True)
class Token:
    kind: str
    text: str
    pos: int

    def matches(self, word: str) -> bool:
        return self.kind == ATOM and self.text.lower() == word.lower()


# ASCII fast-path scanners (identical charsets to _is_alnum_c /
# _is_num_c for ASCII input; a non-ASCII continuation falls back to
# the per-char loop so unicode-alnum semantics are preserved exactly)
_ATOM_RE = re.compile(r"[\w-]*", re.ASCII)
_NUM_RE = re.compile(r"[\w.:-]*", re.ASCII)


# single-pass master scanner (serving fast path): one compiled-regex
# walk over plain-ASCII lines with no comments, escapes, or invalid
# characters — any gap or non-ASCII input falls back to the exact
# per-char tokenizer below, so unicode continuations, '(: :)' comment
# spans, string escapes, ERRTOK positions and variable dash-putback
# keep their reference semantics bit for bit.
_MASTER_RE = re.compile(
    r"""(?P<ws>\s+)
       |(?P<atom>[A-Za-z_][A-Za-z0-9_]*(?:-+[A-Za-z0-9_]+)*)
       |(?P<num>[0-9][A-Za-z0-9_.:-]*)
       |(?P<str>"[^"\\\n]*")
       |(?P<var>\$[A-Za-z_][A-Za-z0-9_]*(?:-+[A-Za-z0-9_]+)*)
       |(?P<sym><->|->|<-|<=|>=|!=|~=|\|\||[(){}=<>|+-])
    """,
    re.VERBOSE | re.ASCII,
)


def tokenize(s: str) -> list[Token]:
    if not s.isascii() or "(:" in s:
        return _tokenize_slow(s)
    toks: list[Token] = []
    ap = toks.append
    pos = 0
    for m in _MASTER_RE.finditer(s):
        start = m.start()
        if start != pos:
            return _tokenize_slow(s)  # gap: errtok/escape/comment
        pos = m.end()
        k = m.lastgroup
        if k == "ws":
            continue
        if k == "atom" or k == "num":
            ap(Token(ATOM, m.group(), start))
        elif k == "sym":
            t = m.group()
            ap(Token(t, t, start))
        elif k == "str":
            ap(Token(STR, s[start + 1:pos - 1], start))
        else:
            ap(Token(VAR, m.group(), start))
    if pos != len(s):
        return _tokenize_slow(s)
    ap(Token(END, "", len(s)))
    return toks


def _tokenize_slow(s: str) -> list[Token]:
    toks: list[Token] = []
    i, n = 0, len(s)
    while i < n:
        c = s[i]
        if c.isspace():
            i += 1
            continue
        start = i
        if c.isalpha() or c == "_":
            # atom: alnum/_ plus interior dashes; trailing dashes put
            # back.  ASCII regex scan + unicode-continuation fallback.
            j = _ATOM_RE.match(s, i).end()
            while j < n and (s[j] == "-" or _is_alnum_c(s[j])):
                j += 1  # rare: unicode alnum continuation
            while j > i and s[j - 1] == "-":
                j -= 1  # put trailing dashes back
            toks.append(Token(ATOM, s[i:j], start))
            i = j
            continue
        if c.isdigit():
            j = _NUM_RE.match(s, i).end()
            while j < n and _is_num_c(s[j]):
                j += 1  # rare: unicode alnum continuation
            toks.append(Token(ATOM, s[i:j], start))
            i = j
            continue
        if c == '"':
            # fast path: no escapes / newlines before the close quote
            q = s.find('"', i + 1)
            if q >= 0:
                seg = s[i + 1:q]
                if "\\" not in seg and "\n" not in seg:
                    toks.append(Token(STR, seg, start))
                    i = q + 1
                    continue
            j = i + 1
            out = []
            esc = False
            bad = False
            while True:
                if j >= n:
                    # request lines are newline-terminated on the
                    # wire, so EOF inside a string is the same
                    # invalid token a literal newline produces
                    toks.append(
                        Token(ERRTOK, s[start:] + "\n", start)
                    )
                    bad = True
                    break
                ch = s[j]
                if not esc and ch == "\n":
                    # strings cannot contain literal newlines (ref
                    # libgdp/gdp-lexer.c; test/unit/newline.sh): the
                    # token from the opening quote through the
                    # newline is invalid, and lexing stops
                    toks.append(
                        Token(ERRTOK, s[start:j + 1], start)
                    )
                    bad = True
                    break
                if esc:
                    out.append({"\\": "\\", '"': '"', "n": "\n"}.get(ch, ch))
                    esc = False
                elif ch == "\\":
                    esc = True
                elif ch == '"':
                    j += 1
                    break
                else:
                    out.append(ch)
                j += 1
            if bad:
                break
            toks.append(Token(STR, "".join(out), start))
            i = j
            continue
        if c == "$":
            j = i + 1
            if j >= n or not (s[j].isalpha() or s[j] == "_"):
                raise LexError(f"bad variable at {start}")
            dashes = 0
            while j < n:
                ch = s[j]
                if ch == "-":
                    dashes += 1
                elif _is_alnum_c(ch):
                    dashes = 0
                else:
                    break
                j += 1
            j -= dashes
            toks.append(Token(VAR, s[i:j], start))
            i = j
            continue
        # symbols
        two = s[i : i + 2]
        if two == "(:":
            # '(: ... :)' is a comment, skipped entirely (ref
            # libgdp/gdp-lexer.c consume_comments_and_space: scan to the
            # ':)' terminator; EOF inside a comment is a lexical error).
            end = s.find(":)", i + 2)
            if end < 0:
                raise LexError(f"unterminated comment at {start}")
            i = end + 2
        elif s[i:i + 3] == "<->":
            # engine extension: bidirectional linkage arrow (the
            # reference documents the syntax in doc/gr-model.txt:176-181
            # but never implemented it)
            toks.append(Token(BIARR, "<->", start))
            i += 3
        elif two in ("->", "<-", "<=", ">=", "!=", "~=", "||"):
            toks.append(Token(two, two, start))
            i += 2
        elif c in "(){}=<>|+-":
            toks.append(Token(c, c, start))
            i += 1
        else:
            # ref gdp-lexer: unknown symbols are LEXICAL errors with
            # source position (test/unit/link1.sh '~>') — but the
            # reference lexes lazily, so errors BEFORE the bad char
            # win (test/unit/duck.sh 'quack, dammit': the unknown-
            # constraint error outranks the ','). Emit an error token
            # the parser trips over only when it gets there.
            toks.append(Token(ERRTOK, c, start))
            break
    toks.append(Token(END, "", n))
    return toks


def errtok_error(text: str, t: Token) -> LexError:
    """The LEXICAL error an ERRTOK stands for.

    Control characters in the offending token render as octal escapes
    the way the reference logs them ('\\012' for the newline in
    test/unit/newline.out.exp)."""
    line = text[:t.pos].count("\n") + 1
    col = 1
    for ch in text[text.rfind("\n", 0, t.pos) + 1:t.pos]:
        col += 8 if ch == "\t" else 1  # tab = 8 (gdp-lexer.c:33)
    shown = "".join(
        ch if ord(ch) >= 32 else "\\%03o" % ord(ch) for ch in t.text
    )
    e = LexError(
        f"on line {line}, column {col}: '{shown}': invalid token"
    )
    e.code = "LEXICAL"
    return e
