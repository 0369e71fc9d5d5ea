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
    title:spark body:fast     PER-TERM field routing — each clause ranks on
                              its named field's index (bm25f_routed_topk)
    "data engine" spark -nsfw phrase × loose terms — Lucene's BooleanQuery
                              with a phrase clause (phrase_terms_bm25_topk);
                              AND = phrase ∧ every term, OR = phrase ∨ any
    spark -"data engine"      MUST_NOT phrase — the phrase match set becomes
                              a per-shard exclusion bitmap OR-merged into
                              the tombstone side-input (exact, pre-top-k)
    (a b) (c d)               OR-groups, AND-combined — Lucene's +(a b) +(c d)
                              (kernel grouped-conjunctive; OR mode flattens)
    -(a b) spark              MUST_NOT group: ¬(a ∨ b) = ¬a ∧ ¬b
    a AND (b OR (c AND d))    nested boolean over plain terms — flattened to
                              CNF by distributivity (exact; ≤ 63 groups, the
                              kernel's bitmask cap — loud past it)

Terms and phrase bodies are normalized with THE engine tokenizer regex
(config.TOKEN_SPLIT_REGEX) — ``"The, FAST!"`` parses identically to
``"the fast"``. A word that normalizes to more than one token (``foo.bar``)
is a syntax error, not a silent phrase.

Two error classes, both loud:

- ``QueryParseError``: the string is malformed (unbalanced quote or paren,
  dangling/consecutive operators, empty phrase, multi-token word, a +/-
  sign after ``field:`` where normalization would silently eat it).
- ``UnsupportedQueryError``: the string parses, but no composed operator
  exists for the combination (two phrases, expansion terms inside groups or
  routed queries, boost on an expansion form…). The message names the
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
    prohibited: bool = False  # -"a b": MUST_NOT phrase (exclusion bitmap)


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
class BoolNode:
    """A parenthesized boolean sub-expression DEEPER than one flat OR-group:
    ``(a AND b)``, ``(b OR (c AND d))``. Children are Term / Group /
    BoolNode; ``op`` combines them ('or' | 'and' — one operator kind per
    nesting level, explicit AND or the level's implicit OR). Leaves are
    plain terms only (phrases/fields/expansions inside parens have no
    composed operator — same rule as Group). Compilation flattens the whole
    positive expression to CNF by distributivity (exact; bounded by the
    kernel's 63-group cap) onto the SAME grouped-conjunctive kernel form
    flat groups use."""

    children: tuple
    op: str  # 'or' | 'and'
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


_WORD_RE = re.compile(r'[^\s"^~()]+')
_SLOP_RE = re.compile(r"~(\d+)(u?)")
_FUZZ_RE = re.compile(r"~(\d*)")
_BOOST_RE = re.compile(r"\^(\d+(?:\.\d+)?)")


def parse(text: str, default_op: str = "or") -> ParsedQuery:
    """Parse a query string into the boolean IR. ``default_op`` sets the
    mode when neither OR nor AND appears ('or' mirrors Lucene's default;
    'and' is the web-search reading). One operator kind per NESTING LEVEL
    (explicit OR or AND between that level's clauses); parentheses nest
    recursively — ``a AND (b OR (c AND d))`` — with plain terms at the
    leaves, and compilation flattens the tree to CNF onto the kernel's
    grouped-conjunctive form."""
    if default_op not in ("or", "and"):
        raise ValueError(f"default_op must be 'or' or 'and', got {default_op!r}")
    clauses, op, explicit_or, i = _parse_level(text, 0, default_op, 0)
    if i < len(text):  # depth-0 scan stopped on a ')' it cannot own
        raise QueryParseError(f"unbalanced ')' at position {i}")
    if not clauses:
        raise QueryParseError("empty query")
    if all(getattr(c, "prohibited", False) for c in clauses):
        raise QueryParseError(
            "query has no positive clause (pure MUST_NOT cannot rank)"
        )
    required = [c for c in clauses
                if isinstance(c, (Term, Group, BoolNode)) and c.required]
    # phrases are exempt from the +-balance rule: they cannot carry '+',
    # and under the AND mode that required terms force, the phrase clause
    # IS a MUST clause anyway ('"data engine" +x' ≡ conjunctive
    # phrase×terms — exactly what the +-on-phrase refusal recommends)
    positives = [
        c for c in clauses
        if isinstance(c, (Term, Group, BoolNode)) and not c.prohibited
    ]
    if required and len(required) != len(positives):
        raise QueryParseError(
            "mixed required (+) and optional terms — mark every positive "
            "term with + (pure AND) or none (mode from OR/AND/default_op)"
        )
    if required:
        if explicit_or:
            raise QueryParseError("+required terms contradict OR mode")
        op = "and"
    return ParsedQuery(tuple(clauses), op)


def _parse_level(text: str, i: int, default_op: str, depth: int):
    """Parse one nesting level until end of text or an unconsumed ')' →
    (clauses, op, explicit_or, i). Each OR/AND must sit BETWEEN two clauses — dangling
    or consecutive operators are syntax errors, and one level uses one
    operator kind (the implicit op is ``default_op`` at the top level and
    OR inside parentheses, preserving ``(a b)`` = Lucene's SHOULD group)."""
    n = len(text)
    clauses: list = []
    saw_or = saw_and = False
    pending_op = None
    while i < n:
        if text[i].isspace():
            i += 1
            continue
        if text[i] == ")":
            break  # owned by the enclosing paren clause (or an error at top)
        # explicit operators (uppercase keywords only; 'or' is a term)
        kw_found = None
        for kw in ("OR", "AND"):
            if text.startswith(kw, i) and (
                i + len(kw) == n or text[i + len(kw)].isspace()
                or text[i + len(kw)] == ")"
            ):
                kw_found = kw
                break
        if kw_found:
            if not clauses:
                raise QueryParseError(f"{kw_found} with no left operand")
            if pending_op is not None:
                raise QueryParseError(
                    f"operator {kw_found} at position {i} follows operator "
                    f"{pending_op} — each OR/AND needs a clause between"
                )
            pending_op = kw_found
            if kw_found == "OR":
                saw_or = True
            else:
                saw_and = True
            i += len(kw_found)
            continue
        clause, i = _parse_clause(text, i, default_op, depth)
        clauses.append(clause)
        pending_op = None
    if pending_op is not None:
        raise QueryParseError(
            f"dangling operator {pending_op} — expected a clause after it"
        )
    if saw_or and saw_and:
        raise QueryParseError(
            "mixed AND/OR at one nesting level — each level uses one "
            "operator kind; parenthesize the tighter-binding side"
        )
    implicit = default_op if depth == 0 else "or"
    op = "or" if saw_or else "and" if saw_and else implicit
    return clauses, op, saw_or, i


def _parse_clause(text: str, i: int, default_op: str, depth: int):
    n = len(text)
    required = prohibited = False
    if text[i] in "+-":
        if depth > 0:
            raise UnsupportedQueryError(
                f"{text[i]!r} inside a group: +/- apply to whole clauses — "
                "prefix the group itself"
            )
        required = text[i] == "+"
        prohibited = text[i] == "-"
        i += 1
        if i >= n or text[i].isspace():
            raise QueryParseError(f"dangling {'+' if required else '-'} sign")
    if text[i] == "(":
        return _parse_parens(text, i, default_op, depth, required, prohibited)
    fieldname = None
    m = _FIELD_RE.match(text, i)
    if m and m.end() < n and text[m.end()] == ":":
        fieldname = m.group(0)
        i = m.end() + 1
        if i >= n or text[i].isspace():
            raise QueryParseError(f"field '{fieldname}:' with no value")
        if text[i] in "+-":
            # 'title:-x' would silently LOSE the exclusion under tokenizer
            # normalization — the sign goes before the field
            raise QueryParseError(
                f"{text[i]!r} after '{fieldname}:' — put +/- before the "
                f"field ({text[i]}{fieldname}:...)"
            )
        if depth > 0:
            raise UnsupportedQueryError(
                f"group member {fieldname}:…: groups hold plain terms only "
                "(phrases/fields/expansions inside a group have no "
                "composed operator)"
            )
    if i < n and text[i] == '"':
        if depth > 0:
            raise UnsupportedQueryError(
                "group member is a phrase: groups hold plain terms only "
                "(phrases/fields/expansions inside a group have no "
                "composed operator)"
            )
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
    if i < n and not text[i].isspace() and text[i] != ")":
        raise QueryParseError(
            f"unexpected character {text[i]!r} after term at position {i}"
        )
    if depth > 0 and (prefix or wild or fuzzy is not None):
        raise UnsupportedQueryError(
            f"group member {raw!r}: groups hold plain terms only "
            "(phrases/fields/expansions inside a group have no "
            "composed operator)"
        )
    return (
        Term(word, field=fieldname, boost=boost, prefix=prefix, fuzzy=fuzzy,
             wild=wild, required=required, prohibited=prohibited),
        i,
    )


def _parse_parens(text, i, default_op, depth, required, prohibited):
    """Parse a parenthesized sub-expression recursively → Group (flat
    OR of plain terms — the kernel's native group) or BoolNode (anything
    deeper); same-op nesting flattens by associativity."""
    n = len(text)
    open_pos = i
    clauses, op, _explicit, i = _parse_level(text, i + 1, default_op,
                                             depth + 1)
    if i >= n or text[i] != ")":
        raise QueryParseError(f"unbalanced '(' at position {open_pos}")
    i += 1
    if not clauses:
        raise QueryParseError(f"empty group at position {open_pos}")
    if i < n and not text[i].isspace() and text[i] != ")":
        raise QueryParseError(
            f"unexpected character {text[i]!r} after group at position {i}"
        )
    # associativity: fold same-op children into this level so e.g.
    # (a (b c)) IS the flat OR-group a ∨ b ∨ c
    flat: list = []
    for c in clauses:
        if isinstance(c, BoolNode) and c.op == op:
            flat.extend(c.children)
        elif isinstance(c, Group) and op == "or":
            flat.extend(c.members)
        else:
            flat.append(c)
    if len(flat) == 1 and isinstance(flat[0], Term):
        t = flat[0]
        return Term(t.text, boost=t.boost, required=required,
                    prohibited=prohibited), i
    if op == "or" and all(isinstance(c, Term) for c in flat):
        return Group(tuple(flat), required=required,
                     prohibited=prohibited), i
    if prohibited:
        raise UnsupportedQueryError(
            "-( … AND … ): ¬(a ∧ b) is an OR of exclusions, which has no "
            "composed operator — MUST_NOT groups must be flat ORs of plain "
            "terms (¬(a ∨ b) = ¬a ∧ ¬b)"
        )
    return BoolNode(tuple(flat), op, required=required,
                    prohibited=prohibited), i


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
    if required:
        raise UnsupportedQueryError(
            "+ on a phrase: write the phrase with loose +terms in AND mode "
            "instead (the phrase clause of a conjunctive query IS a MUST "
            "clause)"
        )
    return Phrase(toks, field=fieldname, slop=slop, ordered=ordered,
                  prohibited=prohibited), i


def _term_str(m: Term) -> str:
    return m.text + (f"^{m.boost:g}" if m.boost is not None else "")


def _node_str(c) -> str:
    """Parenthesized printer for Group/BoolNode sub-expressions (inner
    clauses carry no +/- by grammar)."""
    if isinstance(c, Group):
        return "(" + " ".join(_term_str(m) for m in c.members) + ")"
    if isinstance(c, BoolNode):
        sep = " AND " if c.op == "and" else " "
        return "(" + sep.join(
            _term_str(x) if isinstance(x, Term) else _node_str(x)
            for x in c.children
        ) + ")"
    return _term_str(c)


def to_string(q: ParsedQuery) -> str:
    """Canonical printer — parse(to_string(q), default_op=q.op) == q
    (property-tested)."""
    parts = []
    for c in q.clauses:
        if isinstance(c, (Group, BoolNode)):
            s = ("+" if c.required else "-" if c.prohibited else "") \
                + _node_str(c)
        elif isinstance(c, Phrase):
            s = ("-" if c.prohibited else "") + \
                (f"{c.field}:" if c.field else "") + \
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
    kind: str  # plain | phrase | near | phrase_terms | routed | prefix | …
    payload: tuple
    field: "str | None" = None
    mode: str = "disjunctive"          # plain / fuzzy_multi
    ordered: bool = True               # phrase / near / phrase_terms
    must_not: tuple = _dc_field(default_factory=tuple)
    # MUST_NOT phrase clauses — (body, slop, ordered) triples compiled to a
    # per-shard exclusion bitmap at dispatch (plain kind only)
    must_not_phrases: tuple = _dc_field(default_factory=tuple)


def compile_query(qid: int, parsed: ParsedQuery, k: int = 10) -> Compiled:
    """Map a parsed query onto the one operator form that answers it, or
    refuse loudly. The mapping is total over the shipped operator set —
    every Compiled.kind corresponds to a driver-verified queries() form."""
    all_phrases = [c for c in parsed.clauses if isinstance(c, Phrase)]
    phrases = [c for c in all_phrases if not c.prohibited]
    neg_phrases = [c for c in all_phrases if c.prohibited]
    terms = [c for c in parsed.clauses if isinstance(c, Term)]
    grps = [c for c in parsed.clauses if isinstance(c, Group)]
    nodes = [c for c in parsed.clauses if isinstance(c, BoolNode)]
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

    mnp = ()
    if neg_phrases:
        # MUST_NOT phrase — spark -"data engine": the phrase match set
        # becomes a per-shard exclusion bitmap at dispatch (COMPOSITION.md
        # note 4); composes with plain positive terms
        if nodes or phrases or pos_groups:
            raise UnsupportedQueryError(
                'a -"…" clause beside a positive phrase/group/nested '
                "expression has no composed operator — MUST_NOT phrase "
                "composes with plain positive terms (COMPOSITION.md note 4)"
            )
        if any(t.prefix or t.wild or t.fuzzy is not None for t in pos):
            raise UnsupportedQueryError(
                "MUST_NOT phrase × expansion (prefix/wildcard/fuzzy) has "
                "no composed operator"
            )
        nfields = {p.field for p in neg_phrases} | {t.field for t in pos}
        if len(nfields) > 1:
            raise UnsupportedQueryError(
                "a MUST_NOT phrase must target the SAME field as the "
                "positive terms (or none)"
            )
        mnp = tuple((" ".join(p.tokens), int(p.slop), bool(p.ordered))
                    for p in neg_phrases)

    if nodes:
        if phrases:
            raise UnsupportedQueryError(
                "nested boolean × phrase composition has no operator — "
                "nested boolean expressions hold plain terms"
            )
        if any(t.field is not None for t in negs):
            raise UnsupportedQueryError(
                "field-qualified MUST_NOT beside a nested boolean "
                "expression: nested booleans run on the whole-document "
                "index, so a -field:term exclusion has no composed "
                "operator there"
            )
        return _compile_nested(qid, parsed, nodes, pos, pos_groups,
                               neg_texts, k)

    if phrases:
        if len(phrases) > 1:
            raise UnsupportedQueryError(
                "multiple phrase clauses in one query have no composed "
                "operator (COMPOSITION.md: phrase column)"
            )
        if pos_groups:
            raise UnsupportedQueryError(
                "phrase × group composition has no operator — groups and "
                "phrases cannot mix in one query"
            )
        p = phrases[0]
        body = " ".join(p.tokens)
        if pos or negs or neg_groups:
            # Lucene's BooleanQuery with a phrase clause — loose terms and
            # MUST_NOT compose onto the phrase×terms operator
            # (wand.phrase_terms_bm25_topk; loose=[] is the pure
            # phrase + MUST_NOT case)
            if any(t.prefix or t.wild or t.fuzzy is not None for t in pos):
                raise UnsupportedQueryError(
                    "phrase × expansion (prefix/wildcard/fuzzy) "
                    "composition has no operator"
                )
            pfields = {t.field for t in pos} | {p.field}
            if len(pfields) > 1:
                raise UnsupportedQueryError(
                    "phrase and loose terms must target the SAME field "
                    "(one field's index) or none"
                )
            fld = next(iter(pfields))
            if any(t.field != fld for t in negs):
                raise UnsupportedQueryError(
                    "MUST_NOT terms beside a phrase must target the SAME "
                    "field as the phrase (the exclusion runs on that "
                    "field's index) — qualify them identically or not at "
                    "all"
                )
            boosts = {t.text: float(t.boost) for t in pos
                      if t.boost is not None}
            if any(bv < 0 for bv in boosts.values()):
                raise UnsupportedQueryError(
                    "negative boosts are not rankable")
            mode = "conjunctive" if parsed.op == "and" else "disjunctive"
            texts = [t.text for t in pos]
            payload: tuple = (qid, body, texts, mode, int(k))
            if neg_texts or boosts or p.slop:
                payload += (neg_texts,)
            if boosts or p.slop:
                payload += (boosts,)
            if p.slop:
                payload += (int(p.slop),)
            return Compiled(qid, "phrase_terms", payload, field=fld,
                            mode=mode, ordered=p.ordered,
                            must_not=neg_texts)
        if p.slop == 0 and p.ordered:
            return Compiled(qid, "phrase", (qid, body, int(k)),
                            field=p.field)
        return Compiled(qid, "near", (qid, body, int(k), int(p.slop)),
                        field=p.field, ordered=p.ordered)

    fields = {t.field for t in terms}
    if len(fields) > 1:
        # PER-TERM field routing — Lucene's 'title:spark body:fast': each
        # clause ranks on its named field's index (fielded.bm25f_routed_topk)
        if neg_phrases:
            raise UnsupportedQueryError(
                'a -"…" clause beside per-term field routing has no '
                "composed operator — the phrase exclusion bitmap is built "
                "against ONE index; drop the routing or the phrase "
                "exclusion"
            )
        return _compile_routed(qid, parsed, pos, negs, pos_groups,
                               neg_groups, k)
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
                    must_not=neg_texts, must_not_phrases=mnp)


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


def _compile_routed(qid, parsed, pos, negs, pos_groups, neg_groups, k):
    """Compile a query whose terms span several named fields onto the
    per-term-routed operator (fielded.bm25f_routed_topk): each clause
    (field, term) scores on its field's statistics × its own ^boost; an
    UNQUALIFIED MUST_NOT term excludes on any field. Payload:
    ``(qid, [(field, term), ...], mode, k[, negs[, boosts]])`` with negs =
    ((field | None, term), ...) and boosts = {(field, term): w}."""
    if pos_groups:
        raise UnsupportedQueryError(
            "group × per-term field routing has no composed operator"
        )
    if any(t.prefix or t.wild or t.fuzzy is not None for t in pos):
        raise UnsupportedQueryError(
            "expansion (prefix/wildcard/fuzzy) × per-term field routing "
            "has no composed operator — routed clauses are exact terms"
        )
    if any(t.field is None for t in pos):
        raise UnsupportedQueryError(
            "terms span several fields with some unqualified — qualify "
            "EVERY positive term with its field (title:a body:b) for "
            "per-term routing, or use one/no field for the single-index "
            "forms"
        )
    clauses = [(t.field, t.text) for t in pos]
    boosts: dict = {}
    for t in pos:
        if t.boost is None:
            continue
        b = float(t.boost)
        if b < 0:
            raise UnsupportedQueryError("negative boosts are not rankable")
        if boosts.setdefault((t.field, t.text), b) != b:
            raise UnsupportedQueryError(
                f"clause {t.field}:{t.text} carries conflicting boosts "
                f"{sorted((boosts[(t.field, t.text)], b))} — one boost "
                "per clause"
            )
    neg_clauses = tuple(dict.fromkeys(
        [(t.field, t.text) for t in negs]
        + [(None, m.text) for g in neg_groups for m in g.members]
    ))
    mode = "conjunctive" if parsed.op == "and" else "disjunctive"
    payload: tuple = (qid, clauses, mode, int(k))
    if neg_clauses or boosts:
        payload += (neg_clauses,)
    if boosts:
        payload += (boosts,)
    return Compiled(qid, "routed", payload, mode=mode)


_CNF_GROUP_CAP = 63  # the kernel's grouped-conjunctive bitmask width


def _cnf_of(clause) -> list:
    """Bottom-up CNF of one positive sub-expression → list of OR-groups
    (each a sorted tuple of distinct term texts). AND concatenates the
    children's CNFs; OR distributes (every way of picking one group per
    child, unioned) — exact by distributivity, with the blow-up capped at
    the kernel's 63-group bitmask so the refusal is loud, not a hang."""
    if isinstance(clause, Term):
        return [(clause.text,)]
    if isinstance(clause, Group):
        return [tuple(sorted({m.text for m in clause.members}))]
    child = [_cnf_of(c) for c in clause.children]
    if clause.op == "and":
        out = [g for cc in child for g in cc]
    else:
        out = [()]
        for cc in child:
            out = [
                tuple(sorted(set(acc) | set(g))) for acc in out for g in cc
            ]
            if len(out) > _CNF_GROUP_CAP:
                raise UnsupportedQueryError(
                    f"nested boolean expression flattens to more than "
                    f"{_CNF_GROUP_CAP} CNF groups (the kernel's group-"
                    "bitmask cap) — simplify the expression"
                )
    if len(out) > _CNF_GROUP_CAP:
        raise UnsupportedQueryError(
            f"nested boolean expression flattens to more than "
            f"{_CNF_GROUP_CAP} CNF groups (the kernel's group-bitmask "
            "cap) — simplify the expression"
        )
    return out


def _iter_leaf_terms(clause):
    if isinstance(clause, Term):
        yield clause
    elif isinstance(clause, Group):
        yield from clause.members
    else:
        for c in clause.children:
            yield from _iter_leaf_terms(c)


def _compile_nested(qid, parsed, nodes, plains, pos_groups, neg_texts, k):
    """Compile a query containing nested boolean sub-expressions: the whole
    positive expression (top-level op over loose terms, flat groups and
    BoolNodes) flattens to CNF — AND of OR-groups — by distributivity,
    which the kernel's grouped-conjunctive form evaluates exactly.
    Match semantics are the boolean expression's (CNF is equivalence-
    preserving); scoring is the engine's set semantics shared by every
    conjunctive form — Σ contributions of the DISTINCT query terms present
    in the doc, regardless of which branch satisfied the match."""
    positives: list = list(plains) + list(pos_groups) + list(nodes)
    for t in plains:
        if t.prefix or t.wild or t.fuzzy is not None:
            raise UnsupportedQueryError(
                "nested boolean × expansion (prefix/wildcard/fuzzy) "
                "composition has no operator — nested boolean expressions "
                "hold exact terms"
            )
    if any(t.field is not None
           for c in positives for t in _iter_leaf_terms(c)):
        raise UnsupportedQueryError(
            "field-qualified terms inside a nested boolean expression: "
            "nested booleans run on the whole-document index"
        )
    boosts: dict = {}
    for t in (x for c in positives for x in _iter_leaf_terms(c)):
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
    top = BoolNode(tuple(positives), parsed.op)
    groups = _cnf_of(top)
    # dedupe identical OR-groups (idempotence) deterministically
    groups = sorted(set(groups))
    texts = sorted({t for g in groups for t in g})
    if len(groups) == 1:
        # single OR-group: plain disjunction
        if boosts:
            payload = (qid, texts, "disjunctive", int(k), neg_texts, boosts)
        elif neg_texts:
            payload = (qid, texts, "disjunctive", int(k), neg_texts)
        else:
            payload = (qid, texts, "disjunctive", int(k))
        return Compiled(qid, "plain", payload, mode="disjunctive",
                        must_not=neg_texts)
    if all(len(g) == 1 for g in groups):
        # pure conjunction of terms: the ungrouped conjunctive form
        if boosts:
            payload = (qid, texts, "conjunctive", int(k), neg_texts, boosts)
        elif neg_texts:
            payload = (qid, texts, "conjunctive", int(k), neg_texts)
        else:
            payload = (qid, texts, "conjunctive", int(k))
        return Compiled(qid, "plain", payload, mode="conjunctive",
                        must_not=neg_texts)
    gmap = {
        t: tuple(gi for gi, g in enumerate(groups) if t in g) for t in texts
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
        ordered = c.ordered if c.kind in ("near", "phrase_terms") else True
        # MUST_NOT-phrase exclusion bitmaps are batch-wide side-inputs, so
        # queries sharing one exclusion set share one kernel pass
        mnp = c.must_not_phrases if c.kind == "plain" else ()
        groups.setdefault((c.kind, c.field, mode, ordered, mnp),
                          []).append(c)
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
    vocabulary), unqualified phrase/proximity → bm25f_phrase_topk (the
    cross-field weighted-sum phrase ranking); field-qualified queries
    run on that field's index exactly as without the profile."""
    from functools import reduce

    from bloqsenjin_spark.operators import wand

    if field_weights is not None and not fielded_indexes:
        raise ValueError("field_weights needs fielded_indexes")
    if len({c.qid for c in compiled}) != len(compiled):
        raise ValueError("duplicate query_ids in a DSL batch")
    groups = _group(compiled)
    outs = []
    for (kind, fld, mode, ordered, mnp), cs in sorted(
        groups.items(), key=lambda kv: str(kv[0])
    ):
        payloads = [c.payload for c in cs]
        negs = {c.qid: list(c.must_not) for c in cs if c.must_not}
        if kind == "routed":
            # per-term routing needs the per-field indexes regardless of
            # any profile — routing replaces the fielded profile
            from bloqsenjin_spark.operators import fielded

            if not fielded_indexes:
                raise UnsupportedQueryError(
                    "per-term field-routed queries need fielded_indexes "
                    "(a {field: Index} map)"
                )
            cfg = next(iter(fielded_indexes.values())).cfg
            outs.append(fielded.bm25f_routed_topk(
                fielded_indexes, payloads, cfg, tomb_map=tomb_map,
                allow_map=allow_map))
            continue
        if field_weights is not None and fld is None:
            if mnp:
                raise UnsupportedQueryError(
                    'a -"…" clause under a fielded profile has no composed '
                    "operator — run MUST_NOT-phrase queries on a single "
                    "index (or one field)"
                )
            outs.append(_run_fielded_group(
                fielded_indexes, field_weights, kind, mode, ordered,
                payloads, negs, max_expansions, distance_decay, tomb_map,
                allow_map))
            continue
        idx = _index_for(index, fielded_indexes, fld, kind)
        args = (idx.postings, idx.doc_lens, idx.term_stats, idx.avgdl)
        kw = dict(tomb_map=tomb_map, allow_map=allow_map)
        if mnp:
            # MUST_NOT phrases: the union of their match sets becomes a
            # per-shard exclusion bitmap OR-merged into the tombstone
            # side-input — exact (masked before per-shard k-truncation)
            from bloqsenjin_spark.operators.bitmaps import or_bitmap_maps

            excl = None
            for olabel in (True, False):
                sub = [(b, s) for b, s, o in mnp if o is olabel]
                if sub:
                    m_ = wand.neg_phrase_exclusion_map(
                        idx.postings, sub, idx.cfg, ordered=olabel)
                    excl = m_ if excl is None else or_bitmap_maps(excl, m_)
            kw["tomb_map"] = (excl if tomb_map is None
                              else or_bitmap_maps(tomb_map, excl))
        if kind == "plain":
            # mode rides in each tuple; grouped only for determinism
            df = wand.bm25_wand_topk(*args, payloads, idx.cfg, **kw)
        elif kind == "phrase":
            df = wand.phrase_bm25_topk(*args, payloads, idx.cfg, **kw)
        elif kind == "near":
            df = wand.near_bm25_topk(*args, payloads, idx.cfg,
                                     ordered=ordered, **kw)
        elif kind == "phrase_terms":
            df = wand.phrase_terms_bm25_topk(*args, payloads, idx.cfg,
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
    if kind == "phrase_terms":
        raise UnsupportedQueryError(
            "cross-field phrase × loose-terms has no composed operator "
            "under a fielded profile — qualify the whole query with a "
            "field (field:\"…\" field:term) to run on that field's index"
        )
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
    for (kind, fld, mode, ordered, mnp), cs in sorted(
        groups.items(), key=lambda kv: str(kv[0])
    ):
        if kind == "routed":
            rb = getattr(server, "routed_batch", None)
            if rb is None:
                raise UnsupportedQueryError(
                    "per-term field-routed queries need a "
                    "FieldedIndexServer (per-field index replicas)"
                )
            rows += rb([c.payload for c in cs],
                       allowed_doc_ids=allowed_doc_ids)
            continue
        if field_weights is not None and fld is None:
            if mnp:
                raise UnsupportedQueryError(
                    'a -"…" clause under a fielded profile has no composed '
                    "operator — run MUST_NOT-phrase queries on a single "
                    "index (or one field)"
                )
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
            if mnp:
                # serving twin of the exclusion bitmap: the phrases' match
                # set (positional verify) excluded like tombstones — ONE
                # batched positional pass per orientation
                excl_ids: set = set()
                for olabel in (True, False):
                    sub = [(i2, b, s) for i2, (b, s, o) in enumerate(mnp)
                           if o is olabel]
                    if sub:
                        excl_ids.update(
                            d for _q, d in srv.near_batch(sub,
                                                          ordered=olabel))
                kw["excluded_doc_ids"] = excl_ids
            rows += srv.query_batch(payloads, **kw)
        elif kind == "phrase":
            rows += srv.phrase_topk_batch(payloads, **kw)
        elif kind == "near":
            rows += srv.near_topk_batch(payloads, ordered=ordered, **kw)
        elif kind == "phrase_terms":
            rows += srv.phrase_terms_topk_batch(payloads, ordered=ordered,
                                                **kw)
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
    if kind == "phrase_terms":
        raise UnsupportedQueryError(
            "cross-field phrase × loose-terms has no composed operator "
            "under a fielded profile — qualify the whole query with a "
            "field (field:\"…\" field:term) to run on that field's index"
        )
    raise AssertionError(f"unknown compiled kind {kind!r}")  # pragma: no cover
