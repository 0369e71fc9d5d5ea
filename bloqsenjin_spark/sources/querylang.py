"""Lucene-style query-language front end.

The engine's ranked forms (24+ variants) are all driven by positional tuple
protocols
((qid, terms, mode, k, negs, boosts, groups), (qid, phrase, k, slop), …).
This module is the user-facing string syntax that compiles onto those
EXISTING forms — it adds no new execution path, so every kernel property
(exact block-max pruning, tie-breaks, oracle parity) is inherited, and a
parsed batch dispatches through the same operator entry points the driver
verifies.

Reference shape: the reference's entire front end is a parser from a
positional IR onto its data layer — URL segment routing
(/root/reference/pkg/http/router.go:31-59, pkg/rest/server.go:256-266) and
form/body ingestion (/root/reference/pkg/auth/http/log.go:48-92). This is
the text-query analog: string → IR → operator dispatch.

Syntax (flat boolean, Lucene-inspired)::

    spark engine              implicit mode (default_op: 'or' or 'and')
    spark OR engine           explicit disjunction   (uppercase keyword)
    spark AND engine          explicit conjunction
    -nsfw                     MUST_NOT (prohibited term; needs a positive)
    +spark +engine            '+' = required → the whole query is an AND
    spark^2.5                 per-term boost (≥ 0)
    "data engine"             exact phrase (tokenizer-normalized)
    "data engine"~2           ordered proximity, slop 2
    "engine data"~2u          unordered proximity (symmetric window)
    pre*                      prefix expansion
    or?er c*tom*              wildcard term (? = one char, * = any run;
                              leading wildcards refuse)
    wrod~1                    fuzzy (Levenshtein ≤ 1); bare ~ defaults to 2
    helo~1 wrold~1            multi-word fuzzy (one shared distance)
    title:spark title:fast    single-field query (runs on that field's index)
    (a b) (c d)               OR-groups, AND-combined — Lucene's +(a b) +(c d)
                              (kernel grouped-conjunctive; OR mode flattens)
    -(a b) spark              MUST_NOT group: ¬(a ∨ b) = ¬a ∧ ¬b

Terms and phrase bodies are normalized with THE engine tokenizer regex
(config.TOKEN_SPLIT_REGEX) — ``"The, FAST!"`` parses identically to
``"the fast"``. A word that normalizes to more than one token (``foo.bar``)
is a syntax error, not a silent phrase.

Two error classes, both loud:

- ``QueryParseError``: the string is malformed (unbalanced quote, dangling
  operator, empty phrase, multi-token word).
- ``UnsupportedQueryError``: the string parses, but no composed operator
  exists for the combination (phrase mixed with loose terms, terms across
  two different fields, boost on an expansion form…). The message names the
  COMPOSITION.md cell so the refusal is auditable.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field as _dc_field

from bloqsenjin_spark.config import TOKEN_SPLIT_REGEX

_SPLIT = re.compile(TOKEN_SPLIT_REGEX)
_FIELD_RE = re.compile(r"[a-z_][a-z0-9_]*")
_DEFAULT_FUZZY_DIST = 2  # Lucene's FuzzyQuery default maximum edit distance


class QueryParseError(ValueError):
    """The query string is syntactically malformed."""


class UnsupportedQueryError(ValueError):
    """Valid syntax, but the combination has no composed operator
    (COMPOSITION.md documents the matrix)."""


@dataclass(frozen=True)
class Term:
    text: str
    field: "str | None" = None
    boost: "float | None" = None
    prefix: bool = False
    fuzzy: "int | None" = None
    wild: bool = False  # text is a wildcard pattern (* = run, ? = one char)
    required: bool = False
    prohibited: bool = False


@dataclass(frozen=True)
class Phrase:
    tokens: tuple
    field: "str | None" = None
    slop: int = 0
    ordered: bool = True


@dataclass(frozen=True)
class Group:
    """One parenthesized OR-group of plain terms — Lucene's nested SHOULD
    clause: ``(a b)`` matches when ANY member does. Groups combine
    conjunctively under AND/implicit-AND (``(a b) (c d)`` = Lucene's
    ``+(a b) +(c d)``), flatten under OR, and a ``-`` prefix turns the
    whole group into MUST_NOT terms (¬(a ∨ b) = ¬a ∧ ¬b)."""

    members: tuple  # of Term (plain, optionally boosted)
    required: bool = False
    prohibited: bool = False


@dataclass(frozen=True)
class ParsedQuery:
    clauses: tuple
    op: str  # 'and' | 'or'


def _norm_word(raw: str, pos: int) -> str:
    toks = [t for t in _SPLIT.split(raw.lower()) if t]
    if len(toks) != 1:
        raise QueryParseError(
            f"word {raw!r} at position {pos} normalizes to {len(toks)} "
            f"tokens under the engine tokenizer; quote it as a phrase or "
            f"split it"
        )
    return toks[0]


def _norm_wildcard(raw: str, pos: int) -> str:
    """Normalize a wildcard pattern: literal segments must each be ONE
    clean token under the engine tokenizer (no silently-dropped
    punctuation inside a pattern); runs of '*' collapse."""
    out = []
    for seg in re.split(r"([*?])", raw.lower()):
        if seg in ("*", "?"):
            out.append(seg)
            continue
        if not seg:
            continue
        toks = [t for t in _SPLIT.split(seg) if t]
        if toks != [seg]:
            raise QueryParseError(
                f"wildcard pattern {raw!r} at position {pos}: literal "
                f"segment {seg!r} is not a single clean token under the "
                "engine tokenizer"
            )
        out.append(seg)
    return re.sub(r"\*{2,}", "*", "".join(out))


_WORD_RE = re.compile(r'[^\s"^~]+')
_SLOP_RE = re.compile(r"~(\d+)(u?)")
_FUZZ_RE = re.compile(r"~(\d*)")
_BOOST_RE = re.compile(r"\^(\d+(?:\.\d+)?)")


def parse(text: str, default_op: str = "or") -> ParsedQuery:
    """Parse a query string into the flat boolean IR. ``default_op`` sets
    the mode when neither OR nor AND appears ('or' mirrors Lucene's default;
    'and' is the web-search reading)."""
    if default_op not in ("or", "and"):
        raise ValueError(f"default_op must be 'or' or 'and', got {default_op!r}")
    clauses: list = []
    saw_or = saw_and = False
    i, n = 0, len(text)
    while i < n:
        if text[i].isspace():
            i += 1
            continue
        # explicit operators (uppercase keywords only; 'or' is a term)
        for kw in ("OR", "AND"):
            if text.startswith(kw, i) and (
                i + len(kw) == n or text[i + len(kw)].isspace()
            ):
                if not clauses:
                    raise QueryParseError(f"{kw} with no left operand")
                if kw == "OR":
                    saw_or = True
                else:
                    saw_and = True
                i += len(kw)
                break
        else:
            clause, i = _parse_clause(text, i)
            clauses.append(clause)
            continue
    if saw_or and saw_and:
        raise QueryParseError(
            "mixed AND/OR in one query — the engine's boolean forms are "
            "flat (one mode per query)"
        )
    if not clauses:
        raise QueryParseError("empty query")
    if not any(
        not (isinstance(c, (Term, Group)) and c.prohibited) for c in clauses
    ):
        raise QueryParseError(
            "query has no positive clause (pure MUST_NOT cannot rank)"
        )
    required = [c for c in clauses
                if isinstance(c, (Term, Group)) and c.required]
    positives = [
        c for c in clauses
        if not (isinstance(c, (Term, Group)) and c.prohibited)
    ]
    if required and len(required) != len(positives):
        raise QueryParseError(
            "mixed required (+) and optional terms — mark every positive "
            "term with + (pure AND) or none (mode from OR/AND/default_op)"
        )
    op = "or" if saw_or else "and" if saw_and else default_op
    if required:
        if saw_or:
            raise QueryParseError("+required terms contradict OR mode")
        op = "and"
    return ParsedQuery(tuple(clauses), op)


def _parse_clause(text: str, i: int):
    n = len(text)
    required = prohibited = False
    if text[i] in "+-":
        required = text[i] == "+"
        prohibited = text[i] == "-"
        i += 1
        if i >= n or text[i].isspace():
            raise QueryParseError(f"dangling {'+' if required else '-'} sign")
    if text[i] == "(":
        return _parse_group(text, i, required, prohibited)
    fieldname = None
    m = _FIELD_RE.match(text, i)
    if m and m.end() < n and text[m.end()] == ":":
        fieldname = m.group(0)
        i = m.end() + 1
        if i >= n or text[i].isspace():
            raise QueryParseError(f"field '{fieldname}:' with no value")
    if i < n and text[i] == '"':
        return _parse_phrase(text, i, fieldname, required, prohibited)
    m = _WORD_RE.match(text, i)
    if not m:
        raise QueryParseError(
            f"unexpected character {text[i]!r} at position {i}"
        )
    raw, i = m.group(0), m.end()
    if ":" in raw:
        raise QueryParseError(
            f"stray ':' in {raw!r} — fields are lowercase identifiers "
            f"(field:term)"
        )
    prefix = wild = False
    fuzzy = None
    if raw.endswith("*") and "*" not in raw[:-1] and "?" not in raw:
        word = _norm_word(raw[:-1], m.start())
        prefix = True
    elif "*" in raw or "?" in raw:
        word = _norm_wildcard(raw, m.start())
        wild = True
    else:
        word = _norm_word(raw, m.start())
    if not (prefix or wild) and i < n and text[i] == "~":
        fm = _FUZZ_RE.match(text, i)
        fuzzy = int(fm.group(1)) if fm.group(1) else _DEFAULT_FUZZY_DIST
        i = fm.end()
    boost = None
    if i < n and text[i] == "^":
        bm = _BOOST_RE.match(text, i)
        if not bm:
            raise QueryParseError(f"malformed boost at position {i}")
        boost = float(bm.group(1))
        i = bm.end()
    if i < n and not text[i].isspace():
        raise QueryParseError(
            f"unexpected character {text[i]!r} after term at position {i}"
        )
    return (
        Term(word, field=fieldname, boost=boost, prefix=prefix, fuzzy=fuzzy,
             wild=wild, required=required, prohibited=prohibited),
        i,
    )


def _parse_group(text, i, required, prohibited):
    """Parse ``(word[^boost] word ...)`` — a flat OR-group of plain terms.
    No nesting, no phrases/fields/expansions inside (each would need a
    per-member kernel the grouped form doesn't have); members may carry
    ^boosts."""
    n = len(text)
    end = text.find(")", i + 1)
    if end < 0:
        raise QueryParseError(f"unbalanced '(' at position {i}")
    body = text[i + 1:end]
    if "(" in body:
        raise QueryParseError(
            f"nested '(' at position {i + 1 + body.index('(')} — groups "
            "are one level deep (the kernel's group model is flat)"
        )
    members = []
    for raw in body.split():
        if raw[0] in "+-":
            raise UnsupportedQueryError(
                f"{raw[0]!r} inside a group: +/- apply to whole clauses — "
                "prefix the group itself"
            )
        if any(ch in raw for ch in ('"', ":", "*", "?", "~")):
            raise UnsupportedQueryError(
                f"group member {raw!r}: groups hold plain terms only "
                "(phrases/fields/expansions inside a group have no "
                "composed operator)"
            )
        word, boost = raw, None
        bm = _BOOST_RE.search(raw)
        if "^" in raw:
            if not bm or bm.start() != raw.index("^") or bm.end() != len(raw):
                raise QueryParseError(f"malformed boost in group member {raw!r}")
            word, boost = raw[: bm.start()], float(bm.group(1))
        members.append(Term(_norm_word(word, i), boost=boost))
    if not members:
        raise QueryParseError(f"empty group at position {i}")
    i = end + 1
    if i < n and not text[i].isspace():
        raise QueryParseError(
            f"unexpected character {text[i]!r} after group at position {i}"
        )
    return Group(tuple(members), required=required, prohibited=prohibited), i


def _parse_phrase(text, i, fieldname, required, prohibited):
    n = len(text)
    end = text.find('"', i + 1)
    if end < 0:
        raise QueryParseError(f"unbalanced quote at position {i}")
    body = text[i + 1:end]
    toks = tuple(t for t in _SPLIT.split(body.lower()) if t)
    if not toks:
        raise QueryParseError(f"empty phrase at position {i}")
    i = end + 1
    slop, ordered = 0, True
    if i < n and text[i] == "~":
        sm = _SLOP_RE.match(text, i)
        if not sm:
            raise QueryParseError(f"malformed slop at position {i}")
        slop = int(sm.group(1))
        ordered = not sm.group(2)
        i = sm.end()
    if i < n and not text[i].isspace():
        raise QueryParseError(
            f"unexpected character {text[i]!r} after phrase at position {i}"
        )
    if required or prohibited:
        raise UnsupportedQueryError(
            "+/- on a phrase: MUST/MUST_NOT phrase clauses have no composed "
            "operator (COMPOSITION.md: phrase × boolean)"
        )
    return Phrase(toks, field=fieldname, slop=slop, ordered=ordered), i


def to_string(q: ParsedQuery) -> str:
    """Canonical printer — parse(to_string(q), default_op=q.op) == q
    (property-tested)."""
    parts = []
    for c in q.clauses:
        if isinstance(c, Group):
            s = ("+" if c.required else "-" if c.prohibited else "") + "(" \
                + " ".join(
                    m.text + (f"^{m.boost:g}" if m.boost is not None else "")
                    for m in c.members
                ) + ")"
        elif isinstance(c, Phrase):
            s = (f"{c.field}:" if c.field else "") + \
                '"' + " ".join(c.tokens) + '"'
            if c.slop or not c.ordered:
                s += f"~{c.slop}" + ("" if c.ordered else "u")
        else:
            s = ("+" if c.required else "-" if c.prohibited else "") + (
                f"{c.field}:" if c.field else ""
            ) + c.text
            if c.prefix:
                s += "*"
            # (wild: c.text already is the pattern)
            if c.fuzzy is not None:
                s += f"~{c.fuzzy}"
            if c.boost is not None:
                s += f"^{c.boost:g}"
        parts.append(s)
    sep = " OR " if q.op == "or" and len(parts) > 1 else " "
    return sep.join(parts)


# ---- compilation onto the operator tuple forms -------------------------------


@dataclass(frozen=True)
class Compiled:
    """One query compiled to an operator form. ``kind`` selects the operator;
    ``payload`` is the operator's own tuple (qid first); ``field`` routes to
    a field index (None = whole-document index)."""

    qid: int
    kind: str  # plain | phrase | near | prefix | fuzzy | fuzzy_multi
    payload: tuple
    field: "str | None" = None
    mode: str = "disjunctive"          # plain / fuzzy_multi
    ordered: bool = True               # phrase / near
    must_not: tuple = _dc_field(default_factory=tuple)


def compile_query(qid: int, parsed: ParsedQuery, k: int = 10) -> Compiled:
    """Map a parsed query onto the one operator form that answers it, or
    refuse loudly. The mapping is total over the shipped operator set —
    every Compiled.kind corresponds to a driver-verified queries() form."""
    phrases = [c for c in parsed.clauses if isinstance(c, Phrase)]
    terms = [c for c in parsed.clauses if isinstance(c, Term)]
    grps = [c for c in parsed.clauses if isinstance(c, Group)]
    pos = [t for t in terms if not t.prohibited]
    negs = [t for t in terms if t.prohibited]
    pos_groups = [g for g in grps if not g.prohibited]
    neg_groups = [g for g in grps if g.prohibited]
    for t in negs:
        if t.prefix or t.wild or t.fuzzy is not None or t.boost is not None:
            raise UnsupportedQueryError(
                "MUST_NOT supports plain terms only (exclusion reads doc "
                "ids, not expansions)"
            )
    for g in neg_groups:
        if any(m.boost is not None for m in g.members):
            raise UnsupportedQueryError(
                "boost inside a MUST_NOT group: exclusion reads doc ids, "
                "not scores"
            )
    # ¬(a ∨ b) = ¬a ∧ ¬b: a prohibited group IS a MUST_NOT term list
    neg_texts = tuple(dict.fromkeys(
        [t.text for t in negs]
        + [m.text for g in neg_groups for m in g.members]
    ))

    if phrases:
        if len(phrases) > 1 or pos or pos_groups:
            raise UnsupportedQueryError(
                "a phrase clause must be the only positive clause — "
                "phrase × loose-term composition has no operator "
                "(COMPOSITION.md: phrase column)"
            )
        if negs or neg_groups:
            raise UnsupportedQueryError(
                "phrase × MUST_NOT has no composed operator "
                "(COMPOSITION.md: phrase × boolean)"
            )
        p = phrases[0]
        body = " ".join(p.tokens)
        if p.slop == 0 and p.ordered:
            return Compiled(qid, "phrase", (qid, body, int(k)),
                            field=p.field)
        return Compiled(qid, "near", (qid, body, int(k), int(p.slop)),
                        field=p.field, ordered=p.ordered)

    fields = {t.field for t in terms}
    if len(fields) > 1:
        raise UnsupportedQueryError(
            f"terms span fields {sorted(f or '(doc)' for f in fields)} — "
            "qualify every term with the SAME field (one field's index) or "
            "none (whole-document / BM25F ranking); cross-field per-term "
            "routing has no composed operator"
        )
    fld = next(iter(fields)) if fields else None

    prefixes = [t for t in pos if t.prefix]
    wilds = [t for t in pos if t.wild]
    fuzzies = [t for t in pos if t.fuzzy is not None]
    plains = [t for t in pos
              if not t.prefix and not t.wild and t.fuzzy is None]

    if pos_groups:
        return _compile_grouped(qid, parsed, pos_groups, plains, prefixes,
                                wilds, fuzzies, fld, neg_texts, k)

    if wilds:
        if len(wilds) > 1 or prefixes or fuzzies or plains:
            raise UnsupportedQueryError(
                "a wildcard term must be the only positive clause "
                "(multi-wildcard / wildcard × term composition has no "
                "operator)"
            )
        t = wilds[0]
        if t.boost is not None:
            raise UnsupportedQueryError(
                "boost on a wildcard term: expansion forms rank with the "
                "expansion's own df order, not user boosts"
            )
        if t.text[0] in "*?":
            raise UnsupportedQueryError(
                f"leading wildcard in {t.text!r} forces a full-vocabulary "
                "scan — anchor the pattern with at least one literal "
                "character (Lucene's allowLeadingWildcard=false default)"
            )
        return Compiled(qid, "wildcard", (qid, t.text, int(k)), field=fld,
                        must_not=neg_texts)

    if prefixes:
        if len(prefixes) > 1 or fuzzies or plains:
            raise UnsupportedQueryError(
                "a prefix term must be the only positive clause "
                "(multi-prefix / prefix × term composition has no operator)"
            )
        t = prefixes[0]
        if t.boost is not None:
            raise UnsupportedQueryError(
                "boost on a prefix term: expansion forms rank with the "
                "expansion's own df order, not user boosts"
            )
        return Compiled(qid, "prefix", (qid, t.text, int(k)), field=fld,
                        must_not=neg_texts)

    if fuzzies:
        if plains:
            raise UnsupportedQueryError(
                "fuzzy and exact terms in one query: per-word distances "
                "are not supported — write every word with ~N (multi-word "
                "fuzzy) or none"
            )
        if any(t.boost is not None for t in fuzzies):
            raise UnsupportedQueryError(
                "boost on a fuzzy term: expansion forms weight by "
                "distance decay, not user boosts"
            )
        dists = {t.fuzzy for t in fuzzies}
        if len(dists) > 1:
            raise UnsupportedQueryError(
                f"differing fuzzy distances {sorted(dists)} in one query — "
                "the multi-word form expands every word at ONE distance"
            )
        d = dists.pop()
        if len(fuzzies) == 1:
            return Compiled(qid, "fuzzy",
                            (qid, fuzzies[0].text, int(d), int(k)),
                            field=fld, must_not=neg_texts)
        mode = "conjunctive" if parsed.op == "and" else "disjunctive"
        return Compiled(
            qid, "fuzzy_multi",
            (qid, [t.text for t in fuzzies], int(d), int(k)),
            field=fld, mode=mode, must_not=neg_texts,
        )

    if not plains:
        raise QueryParseError("query has no positive clause")
    mode = "conjunctive" if parsed.op == "and" else "disjunctive"
    texts = [t.text for t in plains]
    boosts = {t.text: float(t.boost) for t in plains if t.boost is not None}
    if any(b < 0 for b in boosts.values()):
        raise UnsupportedQueryError("negative boosts are not rankable")
    if boosts:
        payload = (qid, texts, mode, int(k), neg_texts, boosts)
    elif neg_texts:
        payload = (qid, texts, mode, int(k), neg_texts)
    else:
        payload = (qid, texts, mode, int(k))
    return Compiled(qid, "plain", payload, field=fld, mode=mode,
                    must_not=neg_texts)


def _compile_grouped(qid, parsed, pos_groups, plains, prefixes, wilds,
                     fuzzies, fld, neg_texts, k):
    """Compile a query with parenthesized OR-groups onto the kernel's
    grouped-conjunctive form (the 7th-slot groups map the fuzzy-multi AND
    already uses): under AND/implicit-AND, every group (and every loose
    term, as a singleton group) must match via SOME member — Lucene's
    ``+(a b) +(c d)``; under explicit OR, groups flatten into one
    disjunction (``(a b) OR (c d)`` ≡ ``a b c d`` — OR of ORs). Scoring is
    over DISTINCT terms (a term in two groups satisfies both, scored
    once — the engine's set semantics, shared with every conjunctive
    form)."""
    if prefixes or wilds or fuzzies:
        raise UnsupportedQueryError(
            "group × expansion (prefix/wildcard/fuzzy) composition has no "
            "operator — groups hold exact terms"
        )
    if fld is not None:
        raise UnsupportedQueryError(
            "field-qualified terms beside a group: groups run on the "
            "whole-document index (or across the fielded profile's fields)"
        )
    boosts: dict = {}
    for t in [m for g in pos_groups for m in g.members] + list(plains):
        if t.boost is None:
            continue
        b = float(t.boost)
        if b < 0:
            raise UnsupportedQueryError("negative boosts are not rankable")
        if boosts.setdefault(t.text, b) != b:
            raise UnsupportedQueryError(
                f"term {t.text!r} carries conflicting boosts "
                f"{sorted((boosts[t.text], b))} — one boost per term "
                "(the kernel's boost map is per-term)"
            )
    if parsed.op == "or":
        texts = sorted({m.text for g in pos_groups for m in g.members}
                       | {t.text for t in plains})
        if boosts:
            payload = (qid, texts, "disjunctive", int(k), neg_texts, boosts)
        elif neg_texts:
            payload = (qid, texts, "disjunctive", int(k), neg_texts)
        else:
            payload = (qid, texts, "disjunctive", int(k))
        return Compiled(qid, "plain", payload, mode="disjunctive",
                        must_not=neg_texts)
    group_lists = [[m.text for m in g.members] for g in pos_groups] + [
        [t.text] for t in plains
    ]
    texts = sorted({t for gl in group_lists for t in gl})
    gmap = {
        t: tuple(gi for gi, gl in enumerate(group_lists) if t in gl)
        for t in texts
    }
    payload = (qid, texts, "conjunctive", int(k), neg_texts, boosts, gmap)
    return Compiled(qid, "plain", payload, mode="conjunctive",
                    must_not=neg_texts)


def compile_batch(
    queries: "list[tuple[int, str]] | list[tuple[int, str, int]]",
    default_op: str = "or",
    k: int = 10,
) -> list[Compiled]:
    """(qid, text[, k]) rows → Compiled list. Duplicate qids are refused
    here once (the per-operator guards would each refuse them later)."""
    qids = [q[0] for q in queries]
    if len(set(qids)) != len(qids):
        raise ValueError("duplicate query_ids in a DSL batch")
    out = []
    for row in queries:
        qid, text = int(row[0]), row[1]
        kk = int(row[2]) if len(row) > 2 else int(k)
        out.append(compile_query(qid, parse(text, default_op), k=kk))
    return out


# ---- dispatch ----------------------------------------------------------------


def _group(compiled: list[Compiled]) -> dict:
    """Group a compiled batch so each operator runs ONCE per distinct
    (kind, field, batch-level param) — mode only splits fuzzy_multi (it's a
    batch param there; plain queries carry mode inside their tuples) and
    ordered only splits near."""
    groups: dict = {}
    for c in compiled:
        mode = c.mode if c.kind == "fuzzy_multi" else ""
        ordered = c.ordered if c.kind == "near" else True
        groups.setdefault((c.kind, c.field, mode, ordered), []).append(c)
    return groups


def _index_for(index, fielded_indexes, fld: "str | None", kind: str):
    if fld is None:
        return index
    if not fielded_indexes or fld not in fielded_indexes:
        have = sorted(fielded_indexes or ())
        raise UnsupportedQueryError(
            f"query targets field {fld!r} but the dispatch has field "
            f"indexes {have} (pass fielded_indexes=)"
        )
    return fielded_indexes[fld]


def run_query_batch(
    index,
    compiled: list[Compiled],
    *,
    fielded_indexes: "dict | None" = None,
    field_weights: "dict | None" = None,
    max_expansions: int = 50,
    distance_decay: "float | None" = None,
    tomb_map=None,
    allow_map=None,
):
    """Execute a compiled DSL batch on Spark → ONE DataFrame (query_id,
    rank, doc_id, score). Queries are grouped so each operator runs ONCE per
    (kind, field, mode/ordered) group — a 100-query mixed batch costs the
    same handful of Spark jobs as the hand-written tuple batches; within a
    group, mixed tuple arities (boosted/negated/plain) share the one kernel
    pass exactly as the driver-verified entries do.

    ``index``: plans.build.Index (or any object with postings/doc_lens/
    term_stats/avgdl). ``fielded_indexes``: {field: Index} for field-
    qualified queries — a field's index IS an index, so single-field forms
    run on it directly (COMPOSITION.md).

    ``field_weights``: the FIELDED PROFILE — unqualified queries rank
    ACROSS the weighted fields instead of on ``index`` (which may then be
    None): plain → bm25f_topk (DSL ^boosts multiply into the field
    weights), prefix/fuzzy → the cross-field expansion operators
    (bm25f_prefix_topk / bm25f_fuzzy_topk — expansion on the cross-field
    vocabulary). Unqualified phrases refuse loudly (cross-field phrase has
    no composed operator — qualify with a field); field-qualified queries
    run on that field's index exactly as without the profile."""
    from functools import reduce

    from bloqsenjin_spark.operators import wand

    if field_weights is not None and not fielded_indexes:
        raise ValueError("field_weights needs fielded_indexes")
    if len({c.qid for c in compiled}) != len(compiled):
        raise ValueError("duplicate query_ids in a DSL batch")
    groups = _group(compiled)
    outs = []
    for (kind, fld, mode, ordered), cs in sorted(
        groups.items(), key=lambda kv: str(kv[0])
    ):
        payloads = [c.payload for c in cs]
        negs = {c.qid: list(c.must_not) for c in cs if c.must_not}
        if field_weights is not None and fld is None:
            outs.append(_run_fielded_group(
                fielded_indexes, field_weights, kind, mode, ordered,
                payloads, negs, max_expansions, distance_decay, tomb_map,
                allow_map))
            continue
        idx = _index_for(index, fielded_indexes, fld, kind)
        args = (idx.postings, idx.doc_lens, idx.term_stats, idx.avgdl)
        kw = dict(tomb_map=tomb_map, allow_map=allow_map)
        if kind == "plain":
            # mode rides in each tuple; grouped only for determinism
            df = wand.bm25_wand_topk(*args, payloads, idx.cfg, **kw)
        elif kind == "phrase":
            df = wand.phrase_bm25_topk(*args, payloads, idx.cfg, **kw)
        elif kind == "near":
            df = wand.near_bm25_topk(*args, payloads, idx.cfg,
                                     ordered=ordered, **kw)
        elif kind == "prefix":
            df = wand.prefix_bm25_topk(*args, payloads, idx.cfg,
                                       max_expansions=max_expansions,
                                       must_not=negs or None, **kw)
        elif kind == "wildcard":
            df = wand.wildcard_bm25_topk(*args, payloads, idx.cfg,
                                         max_expansions=max_expansions,
                                         must_not=negs or None, **kw)
        elif kind == "fuzzy":
            df = wand.fuzzy_bm25_topk(*args, payloads, idx.cfg,
                                      max_expansions=max_expansions,
                                      must_not=negs or None, **kw)
        elif kind == "fuzzy_multi":
            df = wand.fuzzy_multi_bm25_topk(
                *args, payloads, idx.cfg, max_expansions=max_expansions,
                distance_decay=distance_decay, mode=mode,
                must_not=negs or None, **kw)
        else:  # pragma: no cover — compile_query is the only producer
            raise AssertionError(f"unknown compiled kind {kind!r}")
        outs.append(df)
    return reduce(lambda a, b: a.unionByName(b), outs)


def _run_fielded_group(fielded_indexes, field_weights, kind, mode, ordered,
                       payloads, negs, max_expansions, distance_decay,
                       tomb_map, allow_map):
    """Fielded-profile executor for ONE unqualified group — the cross-field
    operators take the SAME payload tuples the single-index forms do
    (fuzzy's single-word payload lifts to the 1-word multi form, which is
    its exact identity; phrase/near route to the cross-field weighted-sum
    phrase ranking, bm25f_phrase_topk)."""
    from bloqsenjin_spark.operators import fielded

    cfg = next(iter(fielded_indexes.values())).cfg
    kw = dict(tomb_map=tomb_map, allow_map=allow_map)
    if kind == "plain":
        return fielded.bm25f_topk(fielded_indexes, payloads, field_weights,
                                  cfg, **kw)
    if kind == "prefix":
        return fielded.bm25f_prefix_topk(
            fielded_indexes, payloads, field_weights, cfg,
            max_expansions=max_expansions, must_not=negs or None, **kw)
    if kind == "wildcard":
        return fielded.bm25f_wildcard_topk(
            fielded_indexes, payloads, field_weights, cfg,
            max_expansions=max_expansions, must_not=negs or None, **kw)
    if kind == "fuzzy":
        lifted = [(q, [w], d, k) for q, w, d, k in payloads]
        return fielded.bm25f_fuzzy_topk(
            fielded_indexes, lifted, field_weights, cfg,
            max_expansions=max_expansions, must_not=negs or None, **kw)
    if kind == "fuzzy_multi":
        return fielded.bm25f_fuzzy_topk(
            fielded_indexes, payloads, field_weights, cfg,
            max_expansions=max_expansions, distance_decay=distance_decay,
            mode=mode, must_not=negs or None, **kw)
    if kind == "phrase":
        return fielded.bm25f_phrase_topk(fielded_indexes, payloads,
                                         field_weights, cfg, **kw)
    if kind == "near":
        return fielded.bm25f_phrase_topk(fielded_indexes, payloads,
                                         field_weights, cfg,
                                         ordered=ordered, **kw)
    raise AssertionError(f"unknown compiled kind {kind!r}")  # pragma: no cover


def serve_query_batch(
    server,
    compiled: list[Compiled],
    *,
    field_servers: "dict | None" = None,
    field_weights: "dict | None" = None,
    max_expansions: int = 50,
    distance_decay: "float | None" = None,
    allowed_doc_ids=None,
) -> list[tuple]:
    """Serving-tier dispatch of the same compiled batch → [(query_id, rank,
    doc_id, score)] sorted by (query_id, rank) — row-identical to
    run_query_batch on the same index (pytest-pinned), because every kind
    maps to the serving twin of the Spark operator it maps to above.

    ``field_weights``: the fielded profile — ``server`` must then be a
    FieldedIndexServer; unqualified queries rank across its weighted
    fields (query_batch / prefix_topk_batch / fuzzy_topk_batch), and
    field-qualified queries default to its per-field servers when
    ``field_servers`` is not given."""
    if len({c.qid for c in compiled}) != len(compiled):
        raise ValueError("duplicate query_ids in a DSL batch")
    if field_weights is not None and field_servers is None:
        field_servers = getattr(server, "servers", None)
    groups = _group(compiled)
    rows: list[tuple] = []
    for (kind, fld, mode, ordered), cs in sorted(
        groups.items(), key=lambda kv: str(kv[0])
    ):
        if field_weights is not None and fld is None:
            payloads = [c.payload for c in cs]
            negs = {c.qid: list(c.must_not) for c in cs if c.must_not}
            rows += _serve_fielded_group(
                server, field_weights, kind, mode, ordered, payloads, negs,
                max_expansions, distance_decay, allowed_doc_ids)
            continue
        if fld is None:
            srv = server
        elif not field_servers or fld not in field_servers:
            raise UnsupportedQueryError(
                f"query targets field {fld!r} but the dispatch has field "
                f"servers {sorted(field_servers or ())} (pass field_servers=)"
            )
        else:
            srv = field_servers[fld]
        payloads = [c.payload for c in cs]
        negs = {c.qid: list(c.must_not) for c in cs if c.must_not}
        kw = dict(allowed_doc_ids=allowed_doc_ids)
        if kind == "plain":
            rows += srv.query_batch(payloads, **kw)
        elif kind == "phrase":
            rows += srv.phrase_topk_batch(payloads, **kw)
        elif kind == "near":
            rows += srv.near_topk_batch(payloads, ordered=ordered, **kw)
        elif kind == "prefix":
            rows += srv.prefix_topk_batch(payloads,
                                          max_expansions=max_expansions,
                                          must_not=negs or None, **kw)
        elif kind == "wildcard":
            rows += srv.wildcard_topk_batch(payloads,
                                            max_expansions=max_expansions,
                                            must_not=negs or None, **kw)
        elif kind == "fuzzy":
            rows += srv.fuzzy_topk_batch(payloads,
                                         max_expansions=max_expansions,
                                         must_not=negs or None, **kw)
        elif kind == "fuzzy_multi":
            rows += srv.fuzzy_multi_topk_batch(
                payloads, max_expansions=max_expansions,
                distance_decay=distance_decay, mode=mode,
                must_not=negs or None, **kw)
        else:  # pragma: no cover
            raise AssertionError(f"unknown compiled kind {kind!r}")
    return sorted(rows, key=lambda r: (r[0], r[1]))


def _serve_fielded_group(server, field_weights, kind, mode, ordered,
                         payloads, negs, max_expansions, distance_decay,
                         allowed_doc_ids):
    """Serving twin of _run_fielded_group over a FieldedIndexServer."""
    kw = dict(allowed_doc_ids=allowed_doc_ids)
    if kind == "plain":
        return server.query_batch(payloads, field_weights, **kw)
    if kind == "prefix":
        return server.prefix_topk_batch(
            payloads, field_weights, max_expansions=max_expansions,
            must_not=negs or None, **kw)
    if kind == "wildcard":
        return server.wildcard_topk_batch(
            payloads, field_weights, max_expansions=max_expansions,
            must_not=negs or None, **kw)
    if kind == "fuzzy":
        lifted = [(q, [w], d, k) for q, w, d, k in payloads]
        return server.fuzzy_topk_batch(
            lifted, field_weights, max_expansions=max_expansions,
            must_not=negs or None, **kw)
    if kind == "fuzzy_multi":
        return server.fuzzy_topk_batch(
            payloads, field_weights, max_expansions=max_expansions,
            distance_decay=distance_decay, mode=mode,
            must_not=negs or None, **kw)
    if kind == "phrase":
        return server.phrase_topk_batch_cross(payloads, field_weights, **kw)
    if kind == "near":
        return server.phrase_topk_batch_cross(payloads, field_weights,
                                              ordered=ordered, **kw)
    raise AssertionError(f"unknown compiled kind {kind!r}")  # pragma: no cover
