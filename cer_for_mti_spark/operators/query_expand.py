"""Query expansion: prefix (wildcard) and fuzzy (edit-distance) term
rewrite against the corpus term dictionary — the Lucene
PrefixQuery / FuzzyQuery surface, SCORING_BOOLEAN rewrite: each
expanded dictionary term is OR'd into the query and scored with its own
df-based idf, so ranking is exactly BM25 over the rewritten
disjunction.

Design for scale:

- Expansion runs against the TERM DICTIONARY (vocabulary-sized, Heaps'
  law — orders of magnitude smaller than the corpus), never the
  postings. Patterns are broadcast; the dictionary is scanned once.
- The from-index variants derive the dictionary from the written runs
  relation with a `startswith` predicate that PUSHES DOWN into the
  parquet scan (PushedFilters: StringStartsWith) — prefix queries touch
  only matching row groups; fuzzy queries get the same pruning from
  their `prefix_len` guard (Lucene's prefixLength, default 1 here
  precisely because it makes the dictionary scan prunable).
- Every pattern's expansion is CAPPED (`max_expansions`, Lucene's
  maxExpansions) with a deterministic order, so the rewritten query is
  bounded however hot the prefix — "t*" cannot fan out into a million
  terms and a million posting fetches.
- The result is a rewritten (query_id, query) DataFrame whose query
  string is the space-joined sorted term set. Analyzed terms never
  contain whitespace (every tokenizer mode splits on it), so the
  rewritten string re-tokenizes to exactly the expanded term set in
  "simple" mode — ALL existing scorer paths (naive / WAND / sharded /
  from-index, tombstone-aware) accept it unchanged.

Semantics notes:

- Expansion order: prefix = (df DESC, term ASC); fuzzy =
  (edit distance ASC, df DESC, term ASC). Deterministic, mirrored
  exactly by the DuckDB oracles (__spark_entry__._bm25_expand_sql).
- Fuzzy always unions the literal pattern itself (an OOV pattern simply
  scores nothing), so dist=0 degrades to plain BM25.
- A trailing '*' marks a prefix token; there is no escape — a literal
  trailing-asterisk term is not queryable through expand_prefix
  (analyzed webtext vocabularies don't contain one).

Reference anchor: the reference engine's retrieval surface is exact
term lookup only (run_tool_evaluation.py builds dict-keyed candidate
sets); prefix/fuzzy retrieval is an engine addition from the public
Lucene feature set, re-expressed as declarative DataFrame expansion +
the existing BM25 paths.
"""
from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _split_patterns(queries: DataFrame) -> DataFrame:
    """(query_id, query) -> (query_id, pat, is_prefix): whitespace
    split; a trailing '*' (with a non-empty stem) marks a prefix
    pattern. Distinct per query — duplicate tokens expand once."""
    toks = queries.select(
        "query_id",
        F.explode(F.filter(F.split(F.col("query"), r"\s+"),
                           lambda t: t != "")).alias("tok"),
    )
    return (
        toks.withColumn(
            "is_prefix",
            F.col("tok").endswith("*") & (F.length("tok") > 1),
        )
        .withColumn(
            "pat",
            F.when(F.col("is_prefix"),
                   F.expr("substring(tok, 1, length(tok) - 1)"))
            .otherwise(F.col("tok")),
        )
        .select("query_id", "pat", "is_prefix")
        .distinct()
    )


def _rejoin(qt: DataFrame, queries: DataFrame) -> DataFrame:
    """(query_id, term) -> (query_id, query) with the space-joined
    sorted distinct term set; queries whose expansion is empty keep an
    empty string (scorers then return no rows for them)."""
    joined = qt.groupBy("query_id").agg(
        F.concat_ws(" ", F.array_sort(F.collect_set("term"))).alias("query")
    )
    return (
        queries.select("query_id")
        .distinct()
        .join(joined, "query_id", "left")
        .select("query_id", F.coalesce("query", F.lit("")).alias("query"))
    )


def expand_prefix(queries: DataFrame, term_dict: DataFrame,
                  max_expansions: int = 50) -> DataFrame:
    """Rewrite '*'-suffixed tokens into their top-`max_expansions`
    dictionary completions (df DESC, term ASC); literal tokens pass
    through. term_dict: (term, df) — build_doc_terms.groupBy or the
    pruned index scan (expand_prefix_from_index). Returns the rewritten
    (query_id, query) batch."""
    pats = _split_patterns(queries)
    pre = pats.filter("is_prefix").select("query_id", "pat")
    lit = pats.filter(~F.col("is_prefix")).select(
        "query_id", F.col("pat").alias("term"))
    # broadcast the tiny pattern set against the vocabulary-sized dict;
    # the theta-join predicate is a prefix match (a sorted dictionary
    # would make this a range probe — the parquet scan variant gets the
    # equivalent via StringStartsWith pushdown)
    cand = term_dict.join(
        F.broadcast(pre),
        F.col("term").startswith(F.col("pat")),
    )
    w = Window.partitionBy("query_id", "pat").orderBy(
        F.desc("df"), F.asc("term"))
    exp = (
        cand.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= max_expansions)
        .select("query_id", "term")
    )
    return _rejoin(exp.unionByName(lit), queries)


def expand_fuzzy(queries: DataFrame, term_dict: DataFrame,
                 max_dist: int = 1, prefix_len: int = 1,
                 max_expansions: int = 50) -> DataFrame:
    """Rewrite EVERY token into dictionary terms within Levenshtein
    distance `max_dist` that share its first `prefix_len` characters
    (Lucene FuzzyQuery's prefixLength), capped at `max_expansions` per
    token by (distance ASC, df DESC, term ASC); the literal token is
    always kept. The length band |len(term)-len(pat)| <= max_dist and
    the shared prefix prune the dictionary scan before the O(n*m)
    distance runs."""
    pats = _split_patterns(queries).select("query_id", "pat")
    cand = term_dict.join(
        F.broadcast(pats),
        (F.expr(f"substring(term, 1, {int(prefix_len)})")
         == F.expr(f"substring(pat, 1, {int(prefix_len)})"))
        & (F.abs(F.length("term") - F.length("pat")) <= max_dist),
    ).withColumn("dist", F.levenshtein("term", "pat"))
    w = Window.partitionBy("query_id", "pat").orderBy(
        F.asc("dist"), F.desc("df"), F.asc("term"))
    exp = (
        cand.filter(F.col("dist") <= max_dist)
        .withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= max_expansions)
        .select("query_id", "term")
    )
    lit = pats.select("query_id", F.col("pat").alias("term"))
    return _rejoin(exp.unionByName(lit), queries)


def expand_fuzzy_symspell(queries: DataFrame, cand: DataFrame,
                          max_dist: int = 1,
                          max_expansions: int = 50) -> DataFrame:
    """Fuzzy rewrite from a SymSpell candidate superset — RANK-IDENTICAL
    to expand_fuzzy with prefix_len=0 (edits allowed anywhere, including
    the first character) but at vocabulary scale: `cand` is the
    (pat, term, df) delete-neighborhood superset from
    fuzzy_dict.read_fuzzy_candidates (persisted sidecar probe) or
    fuzzy_dict.symspell_candidates (open dictionary), and the exact
    Levenshtein filter runs over those candidates only — never the
    dictionary. Cap order (distance ASC, df DESC, term ASC) and the
    always-kept literal token mirror expand_fuzzy exactly."""
    pats = _split_patterns(queries).select("query_id", "pat")
    scored = (cand.withColumn("dist", F.levenshtein("term", "pat"))
              .filter(F.col("dist") <= max_dist)
              .join(F.broadcast(pats), "pat"))
    w = Window.partitionBy("query_id", "pat").orderBy(
        F.asc("dist"), F.desc("df"), F.asc("term"))
    exp = (
        scored.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= max_expansions)
        .select("query_id", "term")
    )
    lit = pats.select("query_id", F.col("pat").alias("term"))
    return _rejoin(exp.unionByName(lit), queries)


def bm25_fuzzy_symspell(queries: DataFrame, doc_terms: DataFrame,
                        doc_stats: DataFrame, n_docs: int, avgdl: float,
                        k: int = 10, max_dist: int = 1,
                        max_expansions: int = 50) -> DataFrame:
    """SymSpell-expanded BM25 over the open relations (the DuckDB-oracle
    twin): delete-neighborhood candidates off the derived dictionary,
    exact-verify, then the declarative naive scorer. Equivalent by
    construction to bm25_fuzzy with prefix_len=0 — the shape that
    brute-force expansion cannot serve at a real vocabulary."""
    from cer_for_mti_spark.operators import bm25
    from cer_for_mti_spark.operators.fuzzy_dict import symspell_candidates

    q_rows = queries.collect()
    stems, lits = _patterns_driver_side(q_rows)
    cand = symspell_candidates(
        term_dict_from_doc_terms(doc_terms), sorted({*stems, *lits}),
        max_dist=max_dist)
    expanded = expand_fuzzy_symspell(queries, cand, max_dist=max_dist,
                                     max_expansions=max_expansions)
    return bm25.bm25_naive(expanded, doc_terms, doc_stats, n_docs, avgdl,
                           k=k, mode="simple")


def _levenshtein_py(a: str, b: str) -> int:
    """Plain DP edit distance — the driver-side twin of F.levenshtein
    for the (tiny, short-string) candidate sets the symspell probe
    returns."""
    if a == b:
        return 0
    if len(a) < len(b):
        a, b = b, a
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, start=1):
        cur = [i]
        for j, cb in enumerate(b, start=1):
            cur.append(min(prev[j] + 1, cur[j - 1] + 1,
                           prev[j - 1] + (ca != cb)))
        prev = cur
    return prev[-1]


def expand_symspell_driver(q_rows, cand_rows, max_dist: int = 1,
                           max_expansions: int = 50) -> list:
    """(query_id, query) rewrite computed ENTIRELY driver-side from the
    probe's candidate superset — result-identical to
    expand_fuzzy_symspell (tested) with zero extra Spark jobs: the
    candidate set is bounded by the patterns' delete neighborhoods, so
    the exact verify, the (distance ASC, df DESC, term ASC) cap, and
    the always-kept-literal union are plain Python.
    cand_rows: collected (pat, term, df) rows."""
    by_pat: dict[str, list] = {}
    for r in cand_rows:
        d = _levenshtein_py(r["term"], r["pat"])
        if d <= int(max_dist):
            by_pat.setdefault(r["pat"], []).append(
                (d, -int(r["df"]), r["term"]))
    exp: dict[str, list[str]] = {}
    for pat, scored in by_pat.items():
        scored.sort()
        exp[pat] = [t for _, _, t in scored[: int(max_expansions)]]
    out = []
    for r in q_rows:
        terms: set[str] = set()
        for tok in dict.fromkeys((r["query"] or "").split()):
            terms.add(tok)  # literal always kept (OOV scores nothing)
            terms.update(exp.get(tok, ()))
        out.append((int(r["query_id"]), " ".join(sorted(terms))))
    return out


def bm25_fuzzy_symspell_from_index(spark, index_path: str,
                                   queries: DataFrame, n_docs: int,
                                   avgdl: float, k: int = 10,
                                   num_shards: int | None = None,
                                   max_dist: int = 1,
                                   max_expansions: int = 50,
                                   tombstones="auto") -> DataFrame:
    """The 10^12-doc / 10^8-term fuzzy-query shape: pattern delete
    variants (driver-side, a handful) probe the index's persisted
    fuzzy_dict sidecar with a pushed IN range seek (ONE tiny job —
    PLANS.md PLAN 10), the exact verify + cap + rewrite run driver-side
    over the bounded candidate set, and the rewritten disjunction runs
    through the sharded block-max scorer. No shared-prefix constraint at
    all (Lucene prefixLength=0 semantics) and no vocabulary scan —
    rank-identical to bm25_fuzzy(prefix_len=0) over the same corpus."""
    from cer_for_mti_spark.operators import bm25
    from cer_for_mti_spark.operators.fuzzy_dict import read_fuzzy_candidates

    q_rows = queries.collect()
    stems, lits = _patterns_driver_side(q_rows)
    cand_rows = read_fuzzy_candidates(
        spark, index_path, sorted({*stems, *lits}),
        max_dist=max_dist).collect()
    expanded = spark.createDataFrame(
        expand_symspell_driver(q_rows, cand_rows, max_dist=max_dist,
                               max_expansions=max_expansions),
        "query_id int, query string")
    return bm25.bm25_wand_sharded_from_index(
        spark, index_path, expanded, n_docs, avgdl, k=k, mode="simple",
        num_shards=num_shards, tombstones=tombstones)


def term_dict_from_doc_terms(doc_terms: DataFrame) -> DataFrame:
    """(term, df) from the uncompressed (doc_id, term, tf) relation."""
    return doc_terms.groupBy("term").agg(F.count(F.lit(1)).alias("df"))


# --- generalized wildcard (Lucene WildcardQuery) -------------------------

def _wildcard_literal_prefix(pat: str) -> str:
    """Characters before the first wildcard ('*' or '?') — Lucene's
    automaton seek point: the dictionary enumeration starts at this
    prefix, and everything outside it is pruned without inspection."""
    for i, c in enumerate(pat):
        if c in "*?":
            return pat[:i]
    return pat


def _wildcard_literal_suffix(pat: str) -> str:
    """Characters after the LAST wildcard — the seek point on a REVERSED
    dictionary (Solr ReversedWildcardFilter): '*tion' seeks 'noit*'."""
    for i in range(len(pat) - 1, -1, -1):
        if pat[i] in "*?":
            return pat[i + 1:]
    return pat


def _wildcard_regex(pat: str) -> str:
    """Anchored Java/RE2 regex for a glob pattern: '*' -> '.*',
    '?' -> '.', literal runs quoted with \\Q...\\E (both engines honor
    the quoting, so chemistry tokens with brackets/dashes stay
    literal)."""
    out, lit = ["^"], []

    def flush():
        if lit:
            out.append("\\Q" + "".join(lit) + "\\E")
            lit.clear()

    for c in pat:
        if c == "*":
            flush()
            out.append(".*")
        elif c == "?":
            flush()
            out.append(".")
        else:
            lit.append(c)
    flush()
    out.append("$")
    return "".join(out)


def _split_wildcards_driver_side(queries_rows):
    """Per-batch (wildcard pats, literal toks) — a token is a wildcard
    pattern iff it contains '*' or '?'. A pattern whose literal content
    is empty ('*', '**', '?' alone would rewrite to MatchAllDocs /
    single-char-vocabulary scans) is refused: its expansion is unbounded
    in the vocabulary and never what a retrieval query means."""
    pats, lits = set(), set()
    for r in queries_rows:
        for tok in (r["query"] or "").split():
            if "*" in tok or "?" in tok:
                if not tok.replace("*", "").replace("?", ""):
                    raise ValueError(
                        f"wildcard pattern {tok!r} has no literal "
                        "characters — refusing the match-all rewrite")
                pats.add(tok)
            else:
                lits.add(tok)
    return sorted(pats), sorted(lits)


def expand_wildcard(queries: DataFrame, term_dict: DataFrame,
                    max_expansions: int = 50) -> DataFrame:
    """Lucene WildcardQuery rewrite: tokens containing '*' (any run) or
    '?' (exactly one char) anywhere — leading, infix, trailing, mixed —
    expand to the dictionary terms matching the anchored glob, capped
    per pattern by (df DESC, term ASC) like expand_prefix; literal
    tokens pass through. 'foo*' through here equals expand_prefix
    exactly (tested). The expansion itself is a broadcast of the few
    patterns against the vocabulary-sized dictionary with an rlike
    verify; what makes it cheap at a real vocabulary is the caller
    pruning the dictionary to each pattern's literal PREFIX first
    (bm25_wildcard_sharded_from_index)."""
    q_rows = queries.select("query_id", "query").collect()
    spark = queries.sparkSession
    pat_rows = []
    for r in q_rows:
        wilds, lits = _split_wildcards_driver_side([r])
        for p in wilds:
            pat_rows.append((int(r["query_id"]), p, _wildcard_regex(p),
                             True))
        for t in lits:
            pat_rows.append((int(r["query_id"]), t, "", False))
    if not pat_rows:
        return _rejoin(
            spark.createDataFrame([], "query_id int, term string"), queries)
    pv = spark.createDataFrame(
        pat_rows, "query_id int, pat string, rx string, is_wild boolean")
    lit = (pv.filter(~F.col("is_wild"))
           .select("query_id", F.col("pat").alias("term")))
    cand = term_dict.join(
        F.broadcast(pv.filter("is_wild")),
        F.expr("rlike(term, rx)"),
    )
    w = Window.partitionBy("query_id", "pat").orderBy(
        F.desc("df"), F.asc("term"))
    exp = (
        cand.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= int(max_expansions))
        .select("query_id", "term")
    )
    return _rejoin(exp.unionByName(lit), queries)


REGEX_META = set(".?*+{}[]()|\\^$")


def _has_top_level_alternation(pat: str) -> bool:
    """True when the pattern has a '|' at nesting depth 0 (outside any
    group or character class): 'data|dog' — each branch then has its own
    prefix and no single literal prefix is mandatory."""
    depth = 0
    in_class = False
    i = 0
    while i < len(pat):
        c = pat[i]
        if c == "\\":
            i += 2
            continue
        if in_class:
            if c == "]":
                in_class = False
        elif c == "[":
            in_class = True
        elif c == "(":
            depth += 1
        elif c == ")":
            depth = max(0, depth - 1)
        elif c == "|" and depth == 0:
            return True
        i += 1
    return False


def _regex_literal_prefix(pat: str) -> str:
    """Mandatory literal prefix of a regex — the characters every match
    must start with (Lucene RegexpQuery seeks the automaton's common
    prefix; this is the conservative approximation: stop at the first
    metacharacter, and don't count a literal whose NEXT char is a
    quantifier, since `ab?` matches 'a'). A top-level alternation
    ('data|dog') voids any prefix: the leading literal binds only to the
    FIRST branch, so seeking it would silently drop every other
    branch's matches."""
    if _has_top_level_alternation(pat):
        return ""
    out = []
    for i, c in enumerate(pat):
        if c in REGEX_META:
            break
        if i + 1 < len(pat) and pat[i + 1] in "*?+{":
            break
        out.append(c)
    return "".join(out)


def _split_regexps_driver_side(queries_rows):
    """Per-batch (regex patterns, literal toks): a token wrapped in
    slashes (/re/ — the Lucene/Solr RegexpQuery syntax) is a regex
    pattern matched against WHOLE terms (anchored). Patterns are
    validated eagerly (a bad regex raises here, not inside a task) and
    an empty pattern is refused."""
    import re as _re

    pats, lits = set(), set()
    for r in queries_rows:
        for tok in (r["query"] or "").split():
            if len(tok) >= 2 and tok.startswith("/") and tok.endswith("/"):
                body = tok[1:-1]
                if not body:
                    raise ValueError("regexp token '//' is empty")
                try:
                    _re.compile(body)
                except _re.error as e:
                    raise ValueError(
                        f"invalid regexp token {tok!r}: {e}") from e
                pats.add(body)
            else:
                lits.add(tok)
    return sorted(pats), sorted(lits)


def expand_regexp(queries: DataFrame, term_dict: DataFrame,
                  max_expansions: int = 50) -> DataFrame:
    """Lucene RegexpQuery rewrite: '/re/'-wrapped tokens expand to the
    dictionary terms the ANCHORED regex fully matches, capped per
    pattern by (df DESC, term ASC); literal tokens pass through. Same
    SCORING_BOOLEAN shape as expand_wildcard — the wildcard rewrite is
    in fact the special case of this one with globs compiled down."""
    q_rows = queries.select("query_id", "query").collect()
    spark = queries.sparkSession
    rows = []
    for r in q_rows:
        pats, lits = _split_regexps_driver_side([r])
        for p in pats:
            rows.append((int(r["query_id"]), p, f"^(?:{p})$", True))
        for t in lits:
            rows.append((int(r["query_id"]), t, "", False))
    if not rows:
        return _rejoin(
            spark.createDataFrame([], "query_id int, term string"), queries)
    pv = spark.createDataFrame(
        rows, "query_id int, pat string, rx string, is_re boolean")
    lit = (pv.filter(~F.col("is_re"))
           .select("query_id", F.col("pat").alias("term")))
    cand = term_dict.join(F.broadcast(pv.filter("is_re")),
                          F.expr("rlike(term, rx)"))
    w = Window.partitionBy("query_id", "pat").orderBy(
        F.desc("df"), F.asc("term"))
    exp = (cand.withColumn("_rn", F.row_number().over(w))
           .filter(F.col("_rn") <= int(max_expansions))
           .select("query_id", "term"))
    return _rejoin(exp.unionByName(lit), queries)


def bm25_regexp(queries: DataFrame, doc_terms: DataFrame,
                doc_stats: DataFrame, n_docs: int, avgdl: float,
                k: int = 10, max_expansions: int = 50) -> DataFrame:
    """Regexp-expanded BM25 over the open relations (the DuckDB-oracle
    twin — RE2 and Java regex agree on the conservative pattern subset
    the oracles use)."""
    from cer_for_mti_spark.operators import bm25

    expanded = expand_regexp(
        queries, term_dict_from_doc_terms(doc_terms), max_expansions)
    return bm25.bm25_naive(expanded, doc_terms, doc_stats, n_docs, avgdl,
                           k=k, mode="simple")


def bm25_regexp_sharded_from_index(spark, index_path: str,
                                   queries: DataFrame, n_docs: int,
                                   avgdl: float, k: int = 10,
                                   num_shards: int | None = None,
                                   max_expansions: int = 50,
                                   allow_full_scan: bool = False,
                                   tombstones="auto") -> DataFrame:
    """Index-scan regexp retrieval: each pattern's MANDATORY literal
    prefix seeks the sorted term_dict (pushed StartsWith), the anchored
    regex verifies the pruned slice, and the rewritten disjunction runs
    through the sharded block-max scorer. A pattern with no mandatory
    prefix ('/[ab]c+/', '/.*x/') cannot prune the dictionary — refused
    unless allow_full_scan=True makes the vocabulary enumeration
    explicit (the reversed sidecar doesn't help here: regex suffixes
    aren't mandatory-literal in general)."""
    from cer_for_mti_spark.operators import bm25

    q_rows = queries.collect()
    pats, _lits = _split_regexps_driver_side(q_rows)
    seeks = {_regex_literal_prefix(p) for p in pats}
    if "" in seeks and not allow_full_scan:
        raise ValueError(
            "regexp pattern(s) have no mandatory literal prefix to seek "
            "— the dictionary scan is unprunable; pass "
            "allow_full_scan=True to accept the full-vocabulary "
            "enumeration."
        )
    td = term_dict_from_runs_index(
        spark, index_path, None if "" in seeks else sorted(seeks))
    expanded = expand_regexp(queries, td, max_expansions)
    return bm25.bm25_wand_sharded_from_index(
        spark, index_path, expanded, n_docs, avgdl, k=k, mode="simple",
        num_shards=num_shards, tombstones=tombstones)


def bm25_wildcard(queries: DataFrame, doc_terms: DataFrame,
                  doc_stats: DataFrame, n_docs: int, avgdl: float,
                  k: int = 10, max_expansions: int = 50) -> DataFrame:
    """Wildcard-expanded BM25 over the open relations (the DuckDB-oracle
    twin — the oracle rewrites the glob to LIKE with the same cap)."""
    from cer_for_mti_spark.operators import bm25

    expanded = expand_wildcard(
        queries, term_dict_from_doc_terms(doc_terms), max_expansions)
    return bm25.bm25_naive(expanded, doc_terms, doc_stats, n_docs, avgdl,
                           k=k, mode="simple")


def bm25_wildcard_sharded_from_index(spark, index_path: str,
                                     queries: DataFrame, n_docs: int,
                                     avgdl: float, k: int = 10,
                                     num_shards: int | None = None,
                                     max_expansions: int = 50,
                                     allow_leading: bool = False,
                                     tombstones="auto") -> DataFrame:
    """Index-scan wildcard retrieval: each pattern's literal PREFIX (the
    characters before its first wildcard — Lucene's automaton seek
    point) prunes the sorted term_dict sidecar as a pushed StartsWith
    range seek, the residual glob verifies by regex on the pruned slice,
    and the rewritten disjunction runs through the sharded block-max
    scorer. A LEADING-wildcard pattern ('*tion') has an empty seek
    prefix; if the index carries the REVERSED-dictionary sidecar
    (rev_dict.write_rev_dict — Solr's ReversedWildcardFilter), its
    literal SUFFIX seeks that layout as the prefix 'noit*' instead, so
    the probe stays a range seek. A pattern open at BOTH ends
    ('*data*'), or a leading wildcard on an index without the sidecar,
    is unprunable and REFUSED unless allow_leading=True makes the
    full-vocabulary enumeration explicit."""
    from cer_for_mti_spark.operators import bm25
    from cer_for_mti_spark.operators.rev_dict import (
        has_rev_dict,
        read_rev_dict_terms,
    )

    q_rows = queries.collect()
    wilds, _lits = _split_wildcards_driver_side(q_rows)
    use_rev = has_rev_dict(index_path)
    fwd_seeks, rev_seeks, unprunable = set(), set(), []
    for p in wilds:
        pre = _wildcard_literal_prefix(p)
        if pre:
            fwd_seeks.add(pre)
            continue
        suf = _wildcard_literal_suffix(p)
        if suf and use_rev:
            rev_seeks.add(suf)
        else:
            unprunable.append(p)
    if unprunable and not allow_leading:
        raise ValueError(
            f"wildcard pattern(s) {unprunable!r} have no literal prefix "
            "to seek"
            + ("" if use_rev else
               " and this index has no reversed-dictionary sidecar "
               "(rev_dict.write_rev_dict)")
            + " — the dictionary scan is unprunable; pass "
            "allow_leading=True to accept the full-vocabulary "
            "enumeration."
        )
    if unprunable:
        td = term_dict_from_runs_index(spark, index_path, None)
    else:
        parts = []
        if fwd_seeks:
            parts.append(term_dict_from_runs_index(
                spark, index_path, sorted(fwd_seeks)))
        if rev_seeks:
            parts.append(read_rev_dict_terms(
                spark, index_path, sorted(rev_seeks)))
        if not parts:
            parts = [term_dict_from_runs_index(spark, index_path, [])]
        td = parts[0]
        for extra in parts[1:]:
            td = td.unionByName(extra)
        # both sources carry the same global df per term; collapse the
        # overlap so the per-pattern cap never counts a term twice
        td = td.groupBy("term").agg(F.max("df").alias("df"))
    expanded = expand_wildcard(queries, td, max_expansions)
    return bm25.bm25_wand_sharded_from_index(
        spark, index_path, expanded, n_docs, avgdl, k=k, mode="simple",
        num_shards=num_shards, tombstones=tombstones)


def _patterns_driver_side(queries_rows) -> tuple[list[str], list[str]]:
    """(prefix stems, literal/fuzzy pats) from a collected query batch —
    mirrors _split_patterns for the from-index scan pruning."""
    stems, lits = set(), set()
    for r in queries_rows:
        for tok in (r["query"] or "").split():
            if tok.endswith("*") and len(tok) > 1:
                stems.add(tok[:-1])
            else:
                lits.add(tok)
    return sorted(stems), sorted(lits)


def term_dict_from_runs_index(spark, index_path: str,
                              prefixes: list[str]) -> DataFrame:
    """(term, df) for dictionary terms matching ANY of the given
    prefixes, from a written runs index. Prefers the index's SORTED
    term_dict sidecar (range-partitioned by term — the OR-of-startswith
    predicate prunes whole files and row groups, a genuine range seek);
    pre-sidecar indexes fall back to scanning the runs relation's
    (term, df) columns with the same pushdown. Run-local / per-batch df
    deltas sum to the global df the scorer needs either way."""
    from cer_for_mti_spark.operators.index_build import read_term_dict

    return read_term_dict(spark, index_path, prefixes=prefixes)


def bm25_prefix(queries: DataFrame, doc_terms: DataFrame,
                doc_stats: DataFrame, n_docs: int, avgdl: float,
                k: int = 10, max_expansions: int = 50) -> DataFrame:
    """Prefix-expanded BM25 over the open relations — expansion against
    the derived dictionary, then the declarative naive scorer (the
    DuckDB-oracle twin)."""
    from cer_for_mti_spark.operators import bm25

    expanded = expand_prefix(
        queries, term_dict_from_doc_terms(doc_terms), max_expansions)
    return bm25.bm25_naive(expanded, doc_terms, doc_stats, n_docs, avgdl,
                           k=k, mode="simple")


def bm25_fuzzy(queries: DataFrame, doc_terms: DataFrame,
               doc_stats: DataFrame, n_docs: int, avgdl: float,
               k: int = 10, max_dist: int = 1, prefix_len: int = 1,
               max_expansions: int = 50) -> DataFrame:
    """Fuzzy-expanded BM25 over the open relations."""
    from cer_for_mti_spark.operators import bm25

    expanded = expand_fuzzy(
        queries, term_dict_from_doc_terms(doc_terms),
        max_dist=max_dist, prefix_len=prefix_len,
        max_expansions=max_expansions)
    return bm25.bm25_naive(expanded, doc_terms, doc_stats, n_docs, avgdl,
                           k=k, mode="simple")


def bm25_prefix_sharded_from_index(spark, index_path: str,
                                   queries: DataFrame, n_docs: int,
                                   avgdl: float, k: int = 10,
                                   num_shards: int | None = None,
                                   max_expansions: int = 50,
                                   tombstones="auto") -> DataFrame:
    """The 10^12-doc prefix-query shape: expand against the index's own
    dictionary (StringStartsWith-pruned runs scan), then the sharded
    block-max scorer over the shard/term-pruned postings fetch —
    rank-identical to bm25_prefix over the open relations (same
    dictionary, same cap order, same scoring)."""
    from cer_for_mti_spark.operators import bm25

    q_rows = queries.collect()  # query batch is small by definition
    stems, _lits = _patterns_driver_side(q_rows)
    td = term_dict_from_runs_index(spark, index_path, stems)
    expanded = expand_prefix(queries, td, max_expansions)
    return bm25.bm25_wand_sharded_from_index(
        spark, index_path, expanded, n_docs, avgdl, k=k, mode="simple",
        num_shards=num_shards, tombstones=tombstones)


def bm25_fuzzy_sharded_from_index(spark, index_path: str,
                                  queries: DataFrame, n_docs: int,
                                  avgdl: float, k: int = 10,
                                  num_shards: int | None = None, max_dist: int = 1,
                                  prefix_len: int = 1,
                                  max_expansions: int = 50,
                                  tombstones="auto") -> DataFrame:
    """Fuzzy twin of bm25_prefix_sharded_from_index. prefix_len >= 1 is
    what keeps the dictionary scan prunable (the shared first characters
    become the same StringStartsWith pushdown); prefix_len=0 would need
    a full-vocabulary scan and is refused here — use the open-relation
    bm25_fuzzy for that shape."""
    from cer_for_mti_spark.operators import bm25

    if prefix_len < 1:
        raise ValueError(
            "bm25_fuzzy_sharded_from_index needs prefix_len >= 1 (the "
            "shared prefix is the index-scan pruning predicate); use "
            "bm25_fuzzy over open relations for prefix_len=0."
        )
    q_rows = queries.collect()
    stems, lits = _patterns_driver_side(q_rows)
    probes = sorted({t[: int(prefix_len)] for t in stems + lits if t})
    td = term_dict_from_runs_index(spark, index_path, probes)
    expanded = expand_fuzzy(queries, td, max_dist=max_dist,
                            prefix_len=prefix_len,
                            max_expansions=max_expansions)
    return bm25.bm25_wand_sharded_from_index(
        spark, index_path, expanded, n_docs, avgdl, k=k, mode="simple",
        num_shards=num_shards, tombstones=tombstones)
