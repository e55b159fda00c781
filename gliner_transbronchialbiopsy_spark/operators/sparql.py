"""SPARQL-subset text front-end for the KG query composer.

The composer (operators/composer.py) made "BGP + paths + modifiers"
one declarative plan, but its API is a Python dataclass; the natural
user-facing surface for a KG engine is SPARQL text — the reference's
analogue is the dashboard's free-form query controls
(/root/reference/src/streamlit/app/app.py:349-442), which compose
filters ad hoc. This module parses a well-defined SPARQL 1.1 subset
into a :class:`composer.KGQuery` and delegates execution to
:func:`composer.compose` / :func:`composer.compose_construct`, so the
text form inherits every documented semantic (set-semantic scans,
NULL-rejecting OPTIONAL, the MINUS shared-variable rule, path-closure
caps) without restating any of them — the parser owns ONLY syntax.

Supported subset (everything the composer can plan):

- ``SELECT [DISTINCT] ?v ... | * | (expr AS ?alias)``,
  ``CONSTRUCT { template } WHERE { ... }``,
  ``ASK [WHERE] { ... }`` (one boolean ``ask`` row; the body plan is
  LIMIT 1 — Spark stops the scan at the first solution) and
  ``DESCRIBE ?v ... term ... [WHERE { ... }]`` (subject-oriented
  concise bounded description: every triple whose subject is a
  described resource — see composer.compose_describe)
- triple blocks with ``;`` predicate-object lists and ``,`` object
  lists; terms are ``?vars``, bare words (``[A-Za-z_][\\w:#-]*``) or
  double-quoted literals
- property paths in predicate position: ``/`` sequence, ``|``
  alternation, ``^`` inverse, ``+`` / ``?`` / ``*`` postfix, parens
- ``OPTIONAL { ... }``, ``MINUS { ... }``, any number of
  ``{ ... } UNION { ... }`` chains (each chain bag-unions its
  branches, then joins the accumulated solutions on its shared
  variables — conjunctive between chains), ``FILTER (expr)``,
  ``FILTER [NOT] EXISTS { ... }`` (semi/anti join on the shared
  variables; with disjoint domains the divergent SPARQL specs are
  honored — MINUS removes nothing, NOT EXISTS removes everything
  when the group matches), ``BIND (expr AS ?v)`` (fresh variables
  only, the SPARQL scope rule),
  ``VALUES ?v { ... }`` / ``VALUES (?a ?b) { (..) (..) }`` with
  ``UNDEF`` cells (partial mappings, compiled per defined-column
  mask group — bgp._values_with_undef)
- ``GROUP BY``, ``HAVING (constraint) ...`` (inline aggregates are
  rewritten to hidden agg aliases filtered after the aggregation),
  ``ORDER BY [ASC|DESC(?v)]``, ``OFFSET``, ``LIMIT``
- subqueries: ``{ SELECT ... WHERE { ... } mods }`` inside a WHERE
  group (SPARQL 1.1 bottom-up evaluation: the nested SELECT runs in
  isolation and its projected relation natural-joins the outer
  solutions — the aggregate-then-join idiom)

FILTER / aggregate expressions are translated token-wise to Spark SQL
(``?var`` -> column, ``&&``/``||``/``!`` -> AND/OR/NOT, double- ->
single-quoted strings, REGEX -> regexp_like, STRLEN -> length,
LCASE/UCASE -> lower/upper, BOUND -> isnotnull, STR -> string cast,
STRSTARTS/STRENDS -> startswith/endswith; COALESCE, IF, CONTAINS,
CONCAT, SUBSTR, ABS, CEIL, FLOOR, ROUND, IN pass through under the
same names) and evaluated by ``F.expr`` — the subset is exactly what
the composer's ``filters``/``aggs`` fields accept. Non-aggregate
projection expressions go through BIND; ``(expr AS ?v)`` inside
SELECT is the aggregate projection form.

- ``GRAPH <term> { plain triples }`` groups matching within the
  named-graph quad relation (pass ``quads=`` to the executors; a
  variable graph term binds, a ground term partition-prunes)
- SPARQL 1.1 Update via :func:`sparql_update` (INSERT DATA / DELETE
  DATA / DELETE..INSERT..WHERE / DELETE WHERE)

Unsupported SPARQL (explicit errors, never silent misparse): prefixed
IRI declarations, ``<>`` IRIs, blank nodes, SERVICE, and property
paths inside GRAPH groups.
"""

from __future__ import annotations

import re
from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .composer import (
    KGQuery,
    Path,
    compose,
    compose_construct,
    compose_describe,
)

_TOKEN_RE = re.compile(
    r"""
    \s+
  | \#[^\n]*                          # comment to end of line
  | (?P<STRING>"(?:[^"\\]|\\.)*")
  | (?P<VAR>\?[A-Za-z_]\w*)
  | (?P<NUM>-?\d+(?:\.\d+)?)
  | (?P<WORD>[A-Za-z_][\w:#-]*)
  | (?P<PUNCT><=|>=|!=|&&|\|\||[{}().;,/|^+*?<>=!])
    """,
    re.VERBOSE,
)

_KEYWORDS = {
    "SELECT", "CONSTRUCT", "WHERE", "OPTIONAL", "MINUS", "UNION",
    "FILTER", "VALUES", "GROUP", "ORDER", "BY", "ASC", "DESC",
    "LIMIT", "DISTINCT", "AS", "ASK", "DESCRIBE", "HAVING", "OFFSET",
    "BIND", "EXISTS", "NOT", "INSERT", "DELETE", "GRAPH",
}

_UNSUPPORTED_WORDS = {
    "PREFIX", "BASE", "SERVICE",
}

#: aggregate function heads recognized inside HAVING constraints —
#: each call is rewritten to a hidden agg alias (see _having_expr)
_AGG_FNS = {"count", "sum", "min", "max", "avg"}

#: SPARQL builtin -> Spark SQL function, applied inside expressions.
#: SAMPLE is implementation-defined by the SPARQL spec; this engine
#: defines it as min() so results are deterministic and restatable.
#: BOUND maps to isnotnull (SPARQL's unbound IS this engine's NULL —
#: OPTIONAL left joins produce NULLs for unmatched groups); STR is the
#: string cast. COALESCE / IF / ABS / CEIL / FLOOR / ROUND / CONCAT /
#: SUBSTR pass through untouched — identical names in Spark SQL.
_FN_MAP = {"regex": "regexp_like", "strlen": "length",
           "lcase": "lower", "ucase": "upper", "sample": "min",
           "bound": "isnotnull", "str": "string",
           "strstarts": "startswith", "strends": "endswith"}


@dataclass(frozen=True)
class ParsedQuery:
    """Result of :func:`parse`: the query form, the composed logical
    query, and (for CONSTRUCT) the head templates."""

    form: str  # "select" | "construct" | "ask" | "describe"
    query: KGQuery
    heads: tuple | None = None
    targets: tuple | None = None  # DESCRIBE resources (?vars / terms)


@dataclass(frozen=True)
class ParsedUpdate:
    """Result of :func:`parse_update`: DELETE / INSERT template lists
    and the WHERE body (None for the ground DATA forms)."""

    delete: tuple
    insert: tuple
    where: KGQuery | None


class SparqlSyntaxError(ValueError):
    pass


@dataclass(frozen=True)
class _Group:
    """Parsed WHERE-level group: every block kind _group_body accepts."""

    where: list
    union: list
    optional: list
    minus: list
    exists: list
    not_exists: list
    binds: list
    filters: list
    values: tuple | None
    subqueries: list
    union_chains: list
    graphs: list

    def to_query(self, **mods) -> KGQuery:
        return KGQuery(
            where=tuple(self.where),
            graphs=tuple(self.graphs),
            union=tuple(self.union),
            union_chains=tuple(tuple(c) for c in self.union_chains),
            subqueries=tuple(self.subqueries),
            optional=tuple(self.optional),
            minus=tuple(self.minus),
            exists=tuple(self.exists),
            not_exists=tuple(self.not_exists),
            binds=tuple(self.binds),
            filters=tuple(self.filters),
            values=self.values,
            **mods,
        )


@dataclass(frozen=True)
class _Tok:
    kind: str  # STRING | VAR | NUM | WORD | KW | PUNCT
    value: str
    pos: int


def _tokenize(text: str) -> list[_Tok]:
    toks: list[_Tok] = []
    i = 0
    while i < len(text):
        m = _TOKEN_RE.match(text, i)
        if m is None:
            raise SparqlSyntaxError(
                f"unrecognized character {text[i]!r} at offset {i}"
            )
        i = m.end()
        kind = m.lastgroup
        if kind is None:
            continue  # whitespace / comment
        v = m.group(kind)
        if kind == "STRING":
            v = re.sub(r"\\(.)", r"\1", v[1:-1])
        elif kind == "WORD":
            up = v.upper()
            if up in _UNSUPPORTED_WORDS:
                raise SparqlSyntaxError(
                    f"{up} is outside the supported SPARQL subset "
                    "(see operators/sparql.py docstring)"
                )
            if up in _KEYWORDS:
                kind, v = "KW", up
        toks.append(_Tok(kind, v, m.start()))
    return toks


class _Parser:
    def __init__(self, text: str):
        self.toks = _tokenize(text)
        self.i = 0

    # -- token stream helpers -------------------------------------
    def _peek(self, k: int = 0) -> _Tok | None:
        j = self.i + k
        return self.toks[j] if j < len(self.toks) else None

    def _next(self) -> _Tok:
        t = self._peek()
        if t is None:
            raise SparqlSyntaxError("unexpected end of query")
        self.i += 1
        return t

    def _expect(self, kind: str, value: str | None = None) -> _Tok:
        t = self._next()
        if t.kind != kind or (value is not None and t.value != value):
            raise SparqlSyntaxError(
                f"expected {value or kind} at offset {t.pos}, "
                f"got {t.value!r}"
            )
        return t

    def _at(self, kind: str, value: str | None = None) -> bool:
        t = self._peek()
        return (
            t is not None
            and t.kind == kind
            and (value is None or t.value == value)
        )

    # -- entry ------------------------------------------------------
    def parse(self) -> ParsedQuery:
        if self._at("KW", "SELECT"):
            pq = self._select_query()
        elif self._at("KW", "CONSTRUCT"):
            pq = self._construct_query()
        elif self._at("KW", "ASK"):
            pq = self._ask_query()
        elif self._at("KW", "DESCRIBE"):
            pq = self._describe_query()
        elif self._at("KW", "DELETE") or self._at("KW", "INSERT"):
            raise SparqlSyntaxError(
                "update forms (DELETE/INSERT) run through "
                "sparql_update(), not sparql()"
            )
        else:
            t = self._peek()
            raise SparqlSyntaxError(
                f"query must start with SELECT, CONSTRUCT, ASK or "
                f"DESCRIBE, got {t.value!r}" if t else "empty query"
            )
        if self._peek() is not None:
            t = self._peek()
            raise SparqlSyntaxError(
                f"trailing input at offset {t.pos}: {t.value!r}"
            )
        return pq

    # -- SPARQL 1.1 Update forms ------------------------------------
    def _at_word(self, word: str) -> bool:
        t = self._peek()
        return (
            t is not None and t.kind == "WORD" and t.value.upper() == word
        )

    def parse_update(self) -> ParsedUpdate:
        """``INSERT DATA { }`` / ``DELETE DATA { }`` /
        ``DELETE { } INSERT { } WHERE { }`` (either template clause
        optional) / ``DELETE WHERE { }`` sugar. DATA is matched as a
        bare word, not a reserved keyword, so ``data`` stays usable
        as a term elsewhere."""
        if self._at("KW", "INSERT"):
            self._next()
            if self._at_word("DATA"):
                self._next()
                pu = ParsedUpdate((), tuple(self._template_triples()), None)
            else:
                insert = tuple(self._template_triples())
                pu = ParsedUpdate((), insert, self._update_where())
        elif self._at("KW", "DELETE"):
            self._next()
            if self._at_word("DATA"):
                self._next()
                pu = ParsedUpdate(tuple(self._template_triples()), (), None)
            elif self._at("KW", "WHERE"):
                # DELETE WHERE sugar: the group IS the template list,
                # so only a plain conjunctive triple group is legal
                # (SPARQL 1.1 Update QuadPattern grammar).
                self._next()
                grp = self._group_body()
                if (
                    grp.graphs or grp.union or grp.union_chains or grp.optional
                    or grp.minus or grp.exists or grp.not_exists
                    or grp.binds or grp.filters or grp.values is not None
                    or grp.subqueries
                    or any(isinstance(it, Path) for it in grp.where)
                ):
                    raise SparqlSyntaxError(
                        "DELETE WHERE takes a plain triple-pattern "
                        "group (no paths, OPTIONAL, UNION, MINUS, "
                        "FILTER, BIND, VALUES or subqueries) — use "
                        "DELETE { } ... WHERE { } for the general form"
                    )
                pu = ParsedUpdate(
                    tuple(grp.where), (), grp.to_query(select=None)
                )
            else:
                delete = tuple(self._template_triples())
                insert: tuple = ()
                if self._at("KW", "INSERT"):
                    self._next()
                    insert = tuple(self._template_triples())
                pu = ParsedUpdate(delete, insert, self._update_where())
        else:
            t = self._peek()
            raise SparqlSyntaxError(
                f"update must start with INSERT or DELETE, got "
                f"{t.value!r}" if t else "empty update"
            )
        if self._peek() is not None:
            t = self._peek()
            raise SparqlSyntaxError(
                f"trailing input at offset {t.pos}: {t.value!r}"
            )
        return pu

    def _template_triples(self) -> list:
        self._expect("PUNCT", "{")
        heads: list[tuple] = []
        while not self._at("PUNCT", "}"):
            heads.extend(self._triple_block(allow_paths=False))
        self._expect("PUNCT", "}")
        if not heads:
            raise SparqlSyntaxError("empty update template")
        return heads

    def _update_where(self) -> KGQuery:
        self._expect("KW", "WHERE")
        # solution modifiers after the group fall through to
        # parse_update's trailing-input error — an update evaluates
        # raw solutions, so GROUP/ORDER/LIMIT are never legal here.
        return self._group_body().to_query(select=None)

    def _select_query(self) -> ParsedQuery:
        self._expect("KW", "SELECT")
        distinct = False
        if self._at("KW", "DISTINCT"):
            self._next()
            distinct = True
        select: list[str] | None = []
        aggs: list[tuple] = []
        if self._at("PUNCT", "*"):
            self._next()
            select = None
        else:
            while True:
                if self._at("VAR"):
                    select.append(self._next().value[1:])
                elif self._at("PUNCT", "("):
                    expr, alias = self._agg_projection()
                    aggs.append((expr, alias))
                    select.append(alias)
                else:
                    break
            if not select:
                raise SparqlSyntaxError("SELECT needs ?vars, (..AS ?v) or *")
        body = self._where_and_mods(distinct=distinct, select=select,
                                    aggs=tuple(aggs))
        return ParsedQuery("select", body)

    def _construct_query(self) -> ParsedQuery:
        self._expect("KW", "CONSTRUCT")
        self._expect("PUNCT", "{")
        heads: list[tuple] = []
        while not self._at("PUNCT", "}"):
            heads.extend(self._triple_block(allow_paths=False))
        self._expect("PUNCT", "}")
        if not heads:
            raise SparqlSyntaxError("CONSTRUCT template is empty")
        body = self._where_and_mods(distinct=False, select=None, aggs=())
        if body.group_by or body.aggs or body.limit is not None:
            raise SparqlSyntaxError(
                "CONSTRUCT takes raw solutions: GROUP BY / aggregates "
                "/ LIMIT are not supported on the WHERE body"
            )
        return ParsedQuery("construct", body, tuple(heads))

    def _describe_query(self) -> ParsedQuery:
        self._expect("KW", "DESCRIBE")
        targets: list[str] = []
        while True:
            if self._at("VAR"):
                targets.append(self._next().value)
            elif self._at("WORD") or self._at("STRING") or self._at("NUM"):
                targets.append(self._next().value)
            else:
                break
        if not targets:
            raise SparqlSyntaxError("DESCRIBE needs ?vars or ground terms")
        q = KGQuery()
        if self._at("KW", "WHERE") or self._at("PUNCT", "{"):
            if self._at("KW", "WHERE"):
                self._next()
            q = self._group_body().to_query(select=None)
        if any(t.startswith("?") for t in targets) and not (
            q.where or q.union or q.graphs
        ):
            raise SparqlSyntaxError("DESCRIBE ?var needs a WHERE group")
        # solution modifiers after the group fall through to parse()'s
        # trailing-input error — a DESCRIBE result is a set-semantic
        # graph, so slicing the bindings would nondeterministically
        # change WHICH nodes get described (composer docstring).
        return ParsedQuery("describe", q, targets=tuple(targets))

    def _ask_query(self) -> ParsedQuery:
        self._expect("KW", "ASK")
        if self._at("KW", "WHERE"):  # ASK { } and ASK WHERE { } both legal
            self._next()
        grp = self._group_body()
        # solution modifiers are SELECT-form syntax; any GROUP/ORDER/
        # LIMIT after the group falls through to parse()'s trailing-
        # input error, matching the SPARQL grammar (AskQuery has no
        # SolutionModifier in this subset). limit=1 is the PLAN: an
        # existence check needs one solution, so Spark can stop the
        # scan at the first match instead of enumerating all bindings.
        return ParsedQuery("ask", grp.to_query(select=None, limit=1))

    # -- WHERE group + solution modifiers ---------------------------
    def _where_and_mods(self, distinct: bool, select, aggs) -> KGQuery:
        self._expect("KW", "WHERE")
        grp = self._group_body()
        group_by: list[str] = []
        order_by: list = []
        having: list[str] = []
        agg_list: list[tuple] = list(aggs)
        limit: int | None = None
        offset: int | None = None
        while self._peek() is not None:
            if self._at("KW", "HAVING"):
                self._next()
                got = False
                while self._at("PUNCT", "("):
                    having.append(self._having_expr(agg_list))
                    got = True
                if not got:
                    raise SparqlSyntaxError("HAVING needs (expr) groups")
            elif self._at("KW", "OFFSET"):
                self._next()
                offset = int(self._expect("NUM").value)
            elif self._at("KW", "GROUP"):
                self._next()
                self._expect("KW", "BY")
                while self._at("VAR"):
                    group_by.append(self._next().value[1:])
                if not group_by:
                    raise SparqlSyntaxError("GROUP BY needs ?vars")
            elif self._at("KW", "ORDER"):
                self._next()
                self._expect("KW", "BY")
                got = False
                while True:
                    if self._at("KW", "ASC") or self._at("KW", "DESC"):
                        d = self._next().value.lower()
                        self._expect("PUNCT", "(")
                        v = self._expect("VAR").value[1:]
                        self._expect("PUNCT", ")")
                        order_by.append((v, d))
                        got = True
                    elif self._at("VAR"):
                        order_by.append((self._next().value[1:], "asc"))
                        got = True
                    else:
                        break
                if not got:
                    raise SparqlSyntaxError("ORDER BY needs ?vars")
            elif self._at("KW", "LIMIT"):
                self._next()
                t = self._expect("NUM")
                limit = int(t.value)
            else:
                break
        if having and not group_by and not agg_list:
            raise SparqlSyntaxError(
                "HAVING requires GROUP BY or aggregates (use FILTER "
                "for per-solution constraints)"
            )
        if (group_by or having) and select is None:
            raise SparqlSyntaxError(
                "SELECT * cannot be grouped: project ?vars explicitly"
            )
        if agg_list and not group_by and select is not None:
            # pure-aggregate SELECT: every projection must be an agg
            non_agg = [s for s in select
                       if s not in {a for _, a in agg_list}]
            if non_agg:
                raise SparqlSyntaxError(
                    f"non-aggregated ?{non_agg[0]} in SELECT requires "
                    "GROUP BY"
                )
        if group_by and select is not None:
            alias_set = {a for _, a in agg_list}
            for s in select:
                if s not in alias_set and s not in group_by:
                    raise SparqlSyntaxError(
                        f"?{s} in SELECT is neither grouped nor "
                        "aggregated"
                    )
        return grp.to_query(
            group_by=tuple(group_by),
            aggs=tuple(agg_list),
            having=tuple(having),
            select=tuple(select) if select is not None else None,
            distinct=distinct,
            order_by=tuple(order_by),
            offset=offset,
            limit=limit,
        )

    def _group_body(self):
        """Parse ``{ ... }`` at the WHERE level: triples/paths,
        OPTIONAL/MINUS groups, UNION chains, subqueries, FILTER,
        BIND, VALUES."""
        self._expect("PUNCT", "{")
        where: list = []
        union: list = []
        union_chains: list = []
        subqueries: list = []
        optional: list = []
        minus: list = []
        exists: list = []
        not_exists: list = []
        binds: list = []
        filters: list = []
        values = None
        graphs: list = []
        while not self._at("PUNCT", "}"):
            if self._at("KW", "OPTIONAL"):
                self._next()
                optional.append(tuple(self._braced_triples()))
            elif self._at("KW", "MINUS"):
                self._next()
                minus.append(tuple(self._braced_triples()))
            elif self._at("KW", "BIND"):
                self._next()
                # same (expr AS ?alias) surface as an agg projection
                binds.append(self._agg_projection())
            elif self._at("KW", "FILTER"):
                self._next()
                neg = False
                if self._at("KW", "NOT"):
                    self._next()
                    self._expect("KW", "EXISTS")
                    neg = True
                elif self._at("KW", "EXISTS"):
                    self._next()
                else:
                    filters.append(self._filter_expr())
                    continue
                grp = tuple(self._braced_triples())
                (not_exists if neg else exists).append(grp)
            elif self._at("KW", "GRAPH"):
                # GRAPH <term> { ... } — matches within the named-graph
                # quad relation (composer.graphs). A ground term takes
                # the full group grammar incl. property paths (the
                # group compiles against the graph-restricted view); a
                # variable term takes plain triples only (a path
                # closure is per-graph — composer docstring)
                self._next()
                gterm = self._term()
                inner = self._braced_triples()
                if gterm.startswith("?") and any(
                    isinstance(it, Path) for it in inner
                ):
                    raise SparqlSyntaxError(
                        "property paths under a VARIABLE graph term "
                        "are outside the supported subset (ground the "
                        "GRAPH term to use paths)"
                    )
                graphs.append((gterm, tuple(inner)))
            elif self._at("KW", "VALUES"):
                if values is not None:
                    raise SparqlSyntaxError(
                        "only one VALUES block per query is supported"
                    )
                self._next()
                values = self._values_block()
            elif self._at("PUNCT", "{") and (
                (nxt := self._peek(1)) is not None
                and nxt.kind == "KW"
                and nxt.value == "SELECT"
            ):
                # SPARQL 1.1 subquery: { SELECT ... WHERE { ... } mods }
                # — parsed with the full SELECT grammar, evaluated
                # bottom-up by the composer and natural-joined on its
                # projected variables
                self._next()
                sub = self._select_query()
                self._expect("PUNCT", "}")
                subqueries.append(sub.query)
            elif self._at("PUNCT", "{"):
                # a braced subgroup: must be a UNION chain
                branches = [tuple(self._braced_triples())]
                while self._at("KW", "UNION"):
                    self._next()
                    branches.append(tuple(self._braced_triples()))
                if len(branches) < 2:
                    raise SparqlSyntaxError(
                        "braced subgroup without UNION — inline its "
                        "triples in the WHERE block instead"
                    )
                if union:
                    # further chains are independent bag-unions, each
                    # joined onto the solutions on its shared variables
                    union_chains.append(branches)
                else:
                    union = branches
            else:
                where.extend(self._triple_block(allow_paths=True))
        self._expect("PUNCT", "}")
        if not where and not union and not subqueries and not graphs:
            raise SparqlSyntaxError("WHERE block binds no patterns")
        return _Group(
            where, union, optional, minus, exists, not_exists, binds,
            filters, values, subqueries, union_chains, graphs,
        )

    def _braced_triples(self) -> list:
        self._expect("PUNCT", "{")
        items: list = []
        while not self._at("PUNCT", "}"):
            items.extend(self._triple_block(allow_paths=True))
        self._expect("PUNCT", "}")
        if not items:
            raise SparqlSyntaxError("empty pattern group")
        return items

    # -- triples and paths ------------------------------------------
    def _term(self) -> str:
        t = self._next()
        if t.kind == "VAR":
            return t.value
        if t.kind in ("WORD", "STRING", "NUM"):
            return t.value
        raise SparqlSyntaxError(
            f"expected a term at offset {t.pos}, got {t.value!r}"
        )

    def _triple_block(self, allow_paths: bool) -> list:
        """One subject with ``;``/``,`` lists, terminated by ``.`` (the
        final ``.`` before ``}`` is optional, as in SPARQL)."""
        items: list = []
        subj = self._term()
        while True:
            pred_ast, is_plain = self._path(allow_paths)
            while True:
                obj = self._term()
                if is_plain:
                    items.append((subj, pred_ast[1], obj))
                else:
                    items.append(Path(subj, pred_ast, obj))
                if self._at("PUNCT", ","):
                    self._next()
                    continue
                break
            if self._at("PUNCT", ";"):
                self._next()
                if self._at("PUNCT", ".") or self._at("PUNCT", "}"):
                    break  # trailing ';' tolerated
                continue
            break
        if self._at("PUNCT", "."):
            self._next()
        return items

    def _path(self, allow_paths: bool):
        """Parse predicate position. Returns (ast, is_plain) where
        is_plain means a bare predicate (compiles to a triple pattern
        scan, not a path relation)."""
        start = self.i
        ast = self._path_alt()
        used_ops = any(
            t.kind == "PUNCT" and t.value in "/|^+*?"
            for t in self.toks[start:self.i]
        )
        if ast[0] == "pred" and not used_ops:
            return ast, True
        if not allow_paths:
            raise SparqlSyntaxError(
                "property paths are not allowed in CONSTRUCT templates"
            )
        return ast, False

    def _path_alt(self):
        parts = [self._path_seq()]
        while self._at("PUNCT", "|"):
            self._next()
            parts.append(self._path_seq())
        return parts[0] if len(parts) == 1 else ("alt", *parts)

    def _path_seq(self):
        parts = [self._path_unary()]
        while self._at("PUNCT", "/"):
            self._next()
            parts.append(self._path_unary())
        return parts[0] if len(parts) == 1 else ("seq", *parts)

    def _path_unary(self):
        if self._at("PUNCT", "!"):
            # negated property set: !p or !(p1|p2|...) — forward
            # members only (inverse members ^p inside a negated set
            # are outside the subset and raise, never misparse)
            self._next()
            if self._at("PUNCT", "("):
                self._next()
                preds = [self._neg_member()]
                while self._at("PUNCT", "|"):
                    self._next()
                    preds.append(self._neg_member())
                self._expect("PUNCT", ")")
            else:
                preds = [self._neg_member()]
            ast = ("neg", *preds)
            return self._path_postfix(ast)
        if self._at("PUNCT", "^"):
            self._next()
            return ("inv", self._path_unary())
        if self._at("PUNCT", "("):
            self._next()
            inner = self._path_alt()
            self._expect("PUNCT", ")")
            ast = inner
        else:
            t = self._next()
            if t.kind == "VAR":
                raise SparqlSyntaxError(
                    f"variable predicate ?{t.value[1:]} is not in the "
                    "supported subset (offset {})".format(t.pos)
                )
            if t.kind not in ("WORD", "STRING"):
                raise SparqlSyntaxError(
                    f"expected a predicate at offset {t.pos}, got "
                    f"{t.value!r}"
                )
            ast = ("pred", t.value)
        return self._path_postfix(ast)

    def _path_postfix(self, ast):
        while True:
            if self._at("PUNCT", "+"):
                self._next()
                ast = ("plus", ast)
            elif self._at("PUNCT", "?"):
                self._next()
                ast = ("opt", ast)
            elif self._at("PUNCT", "*"):
                self._next()
                ast = ("opt", ("plus", ast))
            elif self._at("PUNCT", "{"):
                # bounded repetition p{n}, p{n,}, p{n,m} — desugared
                # by paths.repeat onto seq/opt/plus (no new evaluator
                # cases); the Jena/RDF4J extension form
                from . import paths as _paths_mod

                self._next()
                t = self._expect("NUM")
                if not t.value.isdigit():
                    raise SparqlSyntaxError(
                        f"repetition bound must be a non-negative "
                        f"integer, got {t.value!r}"
                    )
                lo = int(t.value)
                hi: int | None = lo
                if self._at("PUNCT", ","):
                    self._next()
                    if self._at("NUM"):
                        tv = self._next().value
                        if not tv.isdigit():
                            raise SparqlSyntaxError(
                                f"repetition bound must be a non-"
                                f"negative integer, got {tv!r}"
                            )
                        hi = int(tv)
                    else:
                        hi = None
                self._expect("PUNCT", "}")
                try:
                    ast = _paths_mod.repeat(ast, lo, hi)
                except ValueError as ex:
                    raise SparqlSyntaxError(str(ex)) from ex
            else:
                return ast

    def _neg_member(self) -> str:
        if self._at("PUNCT", "^"):
            raise SparqlSyntaxError(
                "inverse members (^p) inside a negated property set "
                "are outside the supported subset"
            )
        t = self._next()
        if t.kind not in ("WORD", "STRING"):
            raise SparqlSyntaxError(
                f"negated property set expects predicates, got "
                f"{t.value!r} at offset {t.pos}"
            )
        return t.value

    # -- FILTER / VALUES / aggregate expressions ---------------------
    def _sql_of_tokens(self, toks: list[_Tok]) -> str:
        out: list[str] = []
        for k, t in enumerate(toks):
            if t.kind == "VAR":
                out.append(t.value[1:])
            elif t.kind == "STRING":
                out.append("'" + t.value.replace("'", "''") + "'")
            elif t.kind == "PUNCT" and t.value == "&&":
                out.append("AND")
            elif t.kind == "PUNCT" and t.value == "||":
                out.append("OR")
            elif t.kind == "PUNCT" and t.value == "!":
                out.append("NOT")
            elif t.kind == "WORD" and t.value.lower() in _FN_MAP:
                nxt = toks[k + 1] if k + 1 < len(toks) else None
                if nxt is not None and nxt.kind == "PUNCT" and nxt.value == "(":
                    out.append(_FN_MAP[t.value.lower()])
                else:
                    out.append(t.value)
            elif t.kind == "KW":
                out.append(t.value)
            else:
                out.append(t.value)
        # tight function-call spacing: "f (" -> "f(" is unnecessary for
        # F.expr; plain space-join parses fine.
        return " ".join(out)

    def _balanced_paren_tokens(self) -> list[_Tok]:
        self._expect("PUNCT", "(")
        depth = 1
        taken: list[_Tok] = []
        while depth:
            t = self._next()
            if t.kind == "PUNCT" and t.value == "(":
                depth += 1
            elif t.kind == "PUNCT" and t.value == ")":
                depth -= 1
                if depth == 0:
                    break
            taken.append(t)
        return taken

    def _filter_expr(self) -> str:
        toks = self._balanced_paren_tokens()
        if not toks:
            raise SparqlSyntaxError("empty FILTER expression")
        return self._sql_of_tokens(toks)

    def _having_expr(self, agg_list: list) -> str:
        """One parenthesized HAVING constraint. SPARQL HAVING states
        aggregates inline (``HAVING (count(*) > 2)``) but a DataFrame
        filter runs AFTER the aggregation, so each aggregate call is
        rewritten to a hidden agg alias appended to ``agg_list`` (the
        composer applies ``having`` before the SELECT projection, so
        hidden columns never reach the output). A call textually
        identical to a declared SELECT aggregate reuses its alias —
        no duplicate aggregate columns."""
        toks = self._balanced_paren_tokens()
        if not toks:
            raise SparqlSyntaxError("empty HAVING expression")
        out: list[str] = []
        k = 0
        while k < len(toks):
            t = toks[k]
            if (
                t.kind == "WORD"
                and t.value.lower() in _AGG_FNS
                and k + 1 < len(toks)
                and toks[k + 1].kind == "PUNCT"
                and toks[k + 1].value == "("
            ):
                depth = 0
                j = k + 1
                while True:
                    tt = toks[j]
                    if tt.kind == "PUNCT" and tt.value == "(":
                        depth += 1
                    elif tt.kind == "PUNCT" and tt.value == ")":
                        depth -= 1
                        if depth == 0:
                            break
                    j += 1
                    if j >= len(toks):
                        raise SparqlSyntaxError(
                            "unbalanced parens in HAVING aggregate"
                        )
                call_sql = self._sql_of_tokens(toks[k:j + 1])
                alias = next(
                    (a for e, a in agg_list if e == call_sql), None
                )
                if alias is None:
                    alias = f"_hv{len(agg_list)}"
                    agg_list.append((call_sql, alias))
                out.append(alias)
                k = j + 1
            else:
                out.append(self._sql_of_tokens([t]))
                k += 1
        return " ".join(out)

    def _agg_projection(self) -> tuple[str, str]:
        toks = self._balanced_paren_tokens()
        # split on the top-level AS
        depth = 0
        as_idx = None
        for k, t in enumerate(toks):
            if t.kind == "PUNCT" and t.value == "(":
                depth += 1
            elif t.kind == "PUNCT" and t.value == ")":
                depth -= 1
            elif depth == 0 and t.kind == "KW" and t.value == "AS":
                as_idx = k
        if as_idx is None or as_idx + 1 >= len(toks):
            raise SparqlSyntaxError(
                "aggregate projection needs (expr AS ?alias)"
            )
        alias_tok = toks[as_idx + 1]
        if alias_tok.kind != "VAR" or as_idx + 2 != len(toks):
            raise SparqlSyntaxError(
                "aggregate alias must be a single ?var"
            )
        expr_toks = toks[:as_idx]
        if (
            expr_toks
            and expr_toks[0].kind == "WORD"
            and expr_toks[0].value.lower() == "group_concat"
        ):
            expr = self._group_concat_sql(expr_toks)
        else:
            expr = self._sql_of_tokens(expr_toks)
        if not expr:
            raise SparqlSyntaxError("empty aggregate expression")
        return expr, alias_tok.value[1:]

    def _group_concat_sql(self, toks: list[_Tok]) -> str:
        """``GROUP_CONCAT([DISTINCT] ?v [; SEPARATOR = "sep"])`` ->
        deterministic Spark SQL. SPARQL leaves the concatenation order
        undefined; this engine defines it as ASCENDING value order
        (array_sort before array_join), so the result is bit-identical
        at any parallelism and restatable in SQL oracles
        (string_agg(... ORDER BY ...))."""
        j = 1

        def nxt(kind=None, value=None):
            nonlocal j
            if j >= len(toks):
                raise SparqlSyntaxError("malformed GROUP_CONCAT")
            t = toks[j]
            if kind and (t.kind != kind or (value and t.value != value)):
                raise SparqlSyntaxError(
                    f"malformed GROUP_CONCAT near {t.value!r}"
                )
            j += 1
            return t

        nxt("PUNCT", "(")
        distinct = False
        if j < len(toks) and toks[j].kind == "KW" and toks[j].value == "DISTINCT":
            distinct = True
            j += 1
        var = nxt("VAR").value[1:]
        sep = " "
        if j < len(toks) and toks[j].kind == "PUNCT" and toks[j].value == ";":
            j += 1
            w = nxt("WORD")
            if w.value.lower() != "separator":
                raise SparqlSyntaxError(
                    "GROUP_CONCAT modifier must be SEPARATOR"
                )
            nxt("PUNCT", "=")
            sep = nxt("STRING").value
        nxt("PUNCT", ")")
        if j != len(toks):
            raise SparqlSyntaxError("trailing tokens in GROUP_CONCAT")
        collect = "collect_set" if distinct else "collect_list"
        sep_sql = sep.replace("'", "''")
        return f"array_join(array_sort({collect}({var})), '{sep_sql}')"

    def _values_block(self):
        if self._at("VAR"):
            cols = (self._next().value[1:],)
            self._expect("PUNCT", "{")
            rows = []
            while not self._at("PUNCT", "}"):
                rows.append((self._values_term(),))
            self._next()
            return cols, tuple(rows)
        self._expect("PUNCT", "(")
        cols = []
        while self._at("VAR"):
            cols.append(self._next().value[1:])
        self._expect("PUNCT", ")")
        if not cols:
            raise SparqlSyntaxError("VALUES needs at least one ?var")
        self._expect("PUNCT", "{")
        rows = []
        while not self._at("PUNCT", "}"):
            self._expect("PUNCT", "(")
            row = []
            while not self._at("PUNCT", ")"):
                row.append(self._values_term())
            self._next()
            if len(row) != len(cols):
                raise SparqlSyntaxError(
                    f"VALUES row arity {len(row)} != {len(cols)} vars"
                )
            rows.append(tuple(row))
        self._next()
        return tuple(cols), tuple(rows)

    def _values_term(self):
        """A VALUES cell: a ground term, or UNDEF -> None (the
        partial-mapping wildcard the composer compiles per
        defined-column mask group)."""
        t = self._peek()
        if t is not None and t.kind == "WORD" and t.value.upper() == "UNDEF":
            self._next()
            return None
        return self._term()


def parse(text: str) -> ParsedQuery:
    """Parse SPARQL-subset text into a :class:`ParsedQuery` (the
    logical :class:`composer.KGQuery` plus CONSTRUCT templates)."""
    return _Parser(text).parse()


def parse_update(text: str) -> ParsedUpdate:
    """Parse a SPARQL 1.1 Update operation (INSERT DATA / DELETE DATA
    / DELETE..INSERT..WHERE / DELETE WHERE) into a
    :class:`ParsedUpdate`."""
    return _Parser(text).parse_update()


def sparql_update(
    triples: DataFrame,
    text: str,
    subj: str = "subj",
    pred: str = "pred",
    obj: str = "obj",
    allow_cartesian: bool = False,
    max_closure_rows: int | None = None,
    stats=None,
    quads: DataFrame | None = None,
    graph_col: str = "g",
) -> DataFrame:
    """Parse and apply a SPARQL Update operation, returning the
    post-update store (operators/update.update_apply semantics:
    ``(G \\ D) ∪ I`` with both template sets evaluated against the
    pre-update graph)."""
    from . import paths as _paths
    from . import update as _update

    cap = (
        max_closure_rows
        if max_closure_rows is not None
        else _paths.DEFAULT_MAX_CLOSURE_ROWS
    )
    pu = parse_update(text)
    return _update.update_apply(
        triples, where=pu.where, delete=pu.delete, insert=pu.insert,
        subj=subj, pred=pred, obj=obj, allow_cartesian=allow_cartesian,
        max_closure_rows=cap, stats=stats, quads=quads,
        graph_col=graph_col,
    )


def sparql(
    triples: DataFrame,
    text: str,
    subj: str = "subj",
    pred: str = "pred",
    obj: str = "obj",
    allow_cartesian: bool = False,
    max_closure_rows: int | None = None,
    stats=None,
    quads: DataFrame | None = None,
    graph_col: str = "g",
) -> DataFrame:
    """Parse and execute ``text`` against ``triples`` — the one-call
    text surface over :func:`composer.compose` /
    :func:`composer.compose_construct`. ``stats`` (an
    operators/kgstats.TripleStats, computed once per snapshot)
    switches join ordering to the cost-based optimizer; results are
    identical either way."""
    from . import paths as _paths

    cap = (
        max_closure_rows
        if max_closure_rows is not None
        else _paths.DEFAULT_MAX_CLOSURE_ROWS
    )
    pq = parse(text)
    if pq.form == "construct":
        return compose_construct(
            triples, pq.query, pq.heads, subj=subj, pred=pred, obj=obj,
            allow_cartesian=allow_cartesian, max_closure_rows=cap,
            stats=stats, quads=quads, graph_col=graph_col,
        )
    if pq.form == "describe":
        return compose_describe(
            triples, pq.query, pq.targets, subj=subj, pred=pred,
            obj=obj, allow_cartesian=allow_cartesian,
            max_closure_rows=cap, stats=stats, quads=quads,
            graph_col=graph_col,
        )
    sol = compose(
        triples, pq.query, subj=subj, pred=pred, obj=obj,
        allow_cartesian=allow_cartesian, max_closure_rows=cap,
        stats=stats, quads=quads, graph_col=graph_col,
    )
    if pq.form == "ask":
        # the composed plan is LIMIT 1, so this count scans at most one
        # solution; count over 0/1 rows -> exactly one boolean row.
        return sol.agg((F.count(F.lit(1)) > 0).alias("ask"))
    return sol
