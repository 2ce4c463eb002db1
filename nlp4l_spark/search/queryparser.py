"""Lucene classic QueryParser (the query-string surface,
org.apache.lucene.queryparser.classic) parsed into a composable AST the
Searcher compiles onto its existing primitives.

Supported syntax (the widely-used subset, documented deviations below):

  term                  BM25-scored term (SHOULD by default)
  +term  -term          MUST / MUST_NOT occur prefixes
  a AND b   a OR b      keyword operators (AND promotes BOTH neighbors
                        to MUST; OR keeps SHOULD — the deterministic
                        precedence-free rule; Lucene's own mixed AND/OR
                        resolution is famously position-dependent)
  NOT a                 MUST_NOT
  (…)                   grouping, arbitrarily nested
  term^2.5  (…)^2       boosts on any clause
  "a b c"               exact PhraseQuery clause
  "a b"~N  "a b c"~N    sloppy PhraseQuery, any length (fractional-tf
                        sloppy frame; k-term fold for >2 terms)
  te?m  te*             WildcardQuery clause (constant-score rewrite)
  term~1  term~         FuzzyQuery clause (~ alone = 2 edits)
  [a TO b]  {a TO b}    TermRangeQuery clause (constant-score),
                        inclusive / exclusive bounds, * = open end

AST nodes (dicts):
  {"kind": "term",   "text": t, "boost": f}
  {"kind": "phrase", "text": "a b c", "boost": f}
  {"kind": "wild",   "pattern": p, "boost": f}
  {"kind": "fuzzy",  "text": t, "max_edits": n, "boost": f}
  {"kind": "range",  "lower": a|None, "upper": b|None,
   "incl_lower": bool, "incl_upper": bool, "boost": f}
  {"kind": "bool",   "clauses": [(occur, node), ...], "boost": f}
    occur in {"must", "should", "must_not"}
"""

from __future__ import annotations

import re

_TOKEN_RE = re.compile(
    r"""
    "(?P<phrase>[^"]*)"(?:~(?P<pslop>\d*))?  # quoted phrase, opt "…"~N slop
  | (?P<lparen>\()
  | (?P<rparen>\))
  | (?P<range>[\[{][^\]}]+[\]}])            # [a TO b] / {a TO b}
  | (?P<word>[^\s()"\^]+)                   # term / wildcard / fuzzy
  | \^(?P<boost>[0-9]*\.?[0-9]+)            # ^boost suffix
    """,
    re.VERBOSE,
)


def _lex(q: str) -> list[tuple[str, object]]:
    out = []
    for m in _TOKEN_RE.finditer(q):
        if m.group("phrase") is not None:
            ps = m.group("pslop")
            out.append(("phrase", (m.group("phrase"), int(ps) if ps else 0)))
            continue
        kind = m.lastgroup
        out.append((kind, m.group(kind)))
    return out


def parse(q: str) -> dict:
    """Parse a query string -> AST root (a bool node, or the single
    clause if the query has exactly one SHOULD clause)."""
    toks = _lex(q)
    node, pos = _parse_group(toks, 0, top=True)
    if pos != len(toks):
        raise ValueError(f"unbalanced ')' at token {pos} in {q!r}")
    return node


def _attach_boost(toks, pos, node):
    if pos < len(toks) and toks[pos][0] == "boost":
        node["boost"] = float(toks[pos][1])
        pos += 1
    return node, pos


def _parse_group(toks, pos, top=False):
    clauses: list[tuple[str, dict]] = []
    pending_occur: str | None = None
    promote_next = False  # the token after AND
    closed = top  # a sub-group must find its ')'
    while pos < len(toks):
        kind, val = toks[pos]
        if kind == "rparen":
            if top:
                raise ValueError("unbalanced ')'")
            pos += 1
            closed = True
            break
        if kind == "word" and val in ("AND", "&&"):
            if clauses:  # promote the previous clause to MUST
                occ, nd = clauses[-1]
                if occ == "should":
                    clauses[-1] = ("must", nd)
            promote_next = True
            pos += 1
            continue
        if kind == "word" and val in ("OR", "||"):
            pos += 1
            continue
        if kind == "word" and val in ("NOT", "!"):
            pending_occur = "must_not"
            pos += 1
            continue
        if kind == "word" and val in ("+", "-"):
            # bare prefix before a parenthesized clause: "+(a b)"
            pending_occur = "must" if val == "+" else "must_not"
            pos += 1
            continue
        occur = pending_occur or "should"
        pending_occur = None
        if kind == "word" and val.startswith("+"):
            occur, val = "must", val[1:]
        elif kind == "word" and val.startswith("-"):
            occur, val = "must_not", val[1:]
        if promote_next and occur == "should":
            occur = "must"
        promote_next = False

        if kind == "lparen":
            sub, pos = _parse_group(toks, pos + 1)
            sub, pos = _attach_boost(toks, pos, sub)
            clauses.append((occur, sub))
            continue
        if kind == "phrase":
            text, slop = val
            node = {"kind": "phrase", "text": text, "slop": slop, "boost": 1.0}
            pos += 1
            node, pos = _attach_boost(toks, pos, node)
            clauses.append((occur, node))
            continue
        if kind == "range":
            node = _parse_range(val)
            pos += 1
            node, pos = _attach_boost(toks, pos, node)
            clauses.append((occur, node))
            continue
        if kind == "word":
            if not val:
                pos += 1
                continue
            node = _parse_word(val)
            pos += 1
            node, pos = _attach_boost(toks, pos, node)
            clauses.append((occur, node))
            continue
        if kind == "boost":
            raise ValueError(f"dangling boost ^{val}")
        raise AssertionError(kind)
    if not closed:
        raise ValueError("unbalanced '(': group never closed")
    root = {"kind": "bool", "clauses": clauses, "boost": 1.0}
    if len(clauses) == 1 and clauses[0][0] == "should":
        return clauses[0][1], pos
    return root, pos


def _parse_word(val: str) -> dict:
    m = re.fullmatch(r"(.+?)~([0-2])?", val)
    if m:
        edits = int(m.group(2)) if m.group(2) else 2
        return {
            "kind": "fuzzy", "text": m.group(1),
            "max_edits": edits, "boost": 1.0,
        }
    if "*" in val or "?" in val:
        return {"kind": "wild", "pattern": val, "boost": 1.0}
    return {"kind": "term", "text": val, "boost": 1.0}


# --------------------------------------------------------------------- #
# ES simple_query_string / Lucene SimpleQueryParser
# (org.apache.lucene.queryparser.simple.SimpleQueryParser): the LENIENT
# query-string surface — `+` AND, `|` OR, `-` negate, "..." phrase,
# trailing-* prefix, ( ) groups, word~N fuzzy. Its defining property is
# that it NEVER raises: stray ')', unterminated '(', dangling operators
# and empty groups all degrade to whatever text the parser can use
# (Lucene javadoc: "will never throw an exception, and discards invalid
# syntax"). Shares the classic parser's AST + deterministic operator
# rule (`+` promotes both neighbors to MUST, `|` keeps SHOULD).
# Documented deviations: "a b"~N slop compiles to the sloppy-phrase
# frame (search_sloppy_phrase's fractional tf for two terms, the
# k-term fold of search_sloppy_phrase_multi beyond — session 13 closed
# the old fall-through-to-exact). Internal * / ? are literal text
# (only the trailing * is an operator), exactly as SimpleQueryParser's
# PREFIX_OPERATOR defines.
# --------------------------------------------------------------------- #
_SIMPLE_TOKEN_RE = re.compile(
    r"""
    "(?P<phrase>[^"]*)"(?:~(?P<slop>\d+))?
  | (?P<lparen>\()
  | (?P<rparen>\))
  | (?P<andop>\+)
  | (?P<orop>\|)
  | (?P<word>[^\s()"+|]+)
    """,
    re.VERBOSE,
)


def parse_simple(q: str) -> dict | None:
    """Parse a simple_query_string -> AST root (same node dicts as
    parse()), or None when no usable clause survives. Never raises."""
    toks = []
    for m in _SIMPLE_TOKEN_RE.finditer(q):
        if m.group("phrase") is not None:
            s = m.group("slop")
            toks.append(("phrase", (m.group("phrase"), int(s) if s else 0)))
            continue
        toks.append((m.lastgroup, m.group(m.lastgroup)))
    node, _ = _parse_simple_group(toks, 0, top=True)
    return node


def _parse_simple_word(val: str) -> dict | None:
    m = re.fullmatch(r"(.+?)~(\d*)", val)
    if m:
        return {
            "kind": "fuzzy",
            "text": m.group(1),
            "max_edits": min(int(m.group(2)), 2) if m.group(2) else 2,
            "boost": 1.0,
        }
    if val.endswith("*") and len(val) > 1:
        return {"kind": "wild", "pattern": val, "boost": 1.0}
    if not val.strip("*?~"):
        return None  # operator debris, nothing usable
    return {"kind": "term", "text": val, "boost": 1.0}


def _parse_simple_group(toks, pos, top=False):
    clauses: list[tuple[str, dict]] = []
    promote_next = False
    neg_next = False
    while pos < len(toks):
        kind, val = toks[pos]
        if kind == "rparen":
            pos += 1
            if top:
                continue  # lenient: stray ')' discarded
            break
        if kind == "andop":
            if clauses:
                occ, nd = clauses[-1]
                if occ == "should":
                    clauses[-1] = ("must", nd)
            promote_next = True
            pos += 1
            continue
        if kind == "orop":
            pos += 1
            continue
        occur = "should"
        if kind == "word" and val == "-":
            neg_next = True  # negated group: "-(a b)"
            pos += 1
            continue
        if kind == "word" and val.startswith("-") and len(val) > 1:
            occur, val = "must_not", val[1:]
        if neg_next:
            occur = "must_not"
        elif promote_next and occur == "should":
            occur = "must"
        promote_next = False
        neg_next = False
        if kind == "lparen":
            sub, pos = _parse_simple_group(toks, pos + 1)
            if sub is not None:
                clauses.append((occur, sub))
            continue
        if kind == "phrase":
            text, slop = val
            if text.strip():
                clauses.append(
                    (occur, {"kind": "phrase", "text": text, "slop": slop, "boost": 1.0})
                )
            pos += 1
            continue
        node = _parse_simple_word(val)
        if node is not None:
            clauses.append((occur, node))
        pos += 1
    # lenient: an unterminated '(' group simply ends at end-of-input
    if not clauses:
        return None, pos
    if len(clauses) == 1 and clauses[0][0] == "should":
        return clauses[0][1], pos
    return {"kind": "bool", "clauses": clauses, "boost": 1.0}, pos


def _parse_range(val: str) -> dict:
    incl_lower = val[0] == "["
    incl_upper = val[-1] == "]"
    body = val[1:-1]
    m = re.fullmatch(r"\s*(\S+)\s+TO\s+(\S+)\s*", body)
    if not m:
        raise ValueError(f"bad range syntax: {val!r}")
    lo = None if m.group(1) == "*" else m.group(1)
    hi = None if m.group(2) == "*" else m.group(2)
    return {
        "kind": "range", "lower": lo, "upper": hi,
        "incl_lower": incl_lower, "incl_upper": incl_upper, "boost": 1.0,
    }
