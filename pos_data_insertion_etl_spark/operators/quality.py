"""Declarative data-quality checks compiled into ONE scan.

The reference validates inputs imperatively (record-length and
emptiness guards, /root/reference/main.py:216,318,558-565) and aborts
the run on surprise. At warehouse scale the useful contract is a
REPORT: every rule evaluated over the whole batch in a single pass,
violations counted, the load/quarantine decision made downstream (see
operators/fixedwidth.py's quarantine channel for the row-level analog).

Two rule kinds:

* scan rules -- a boolean violation predicate per row (nullness, range,
  domain). All of them compile into one aggregate over one scan:
  SUM(CASE WHEN violated THEN 1 END) per rule, so adding a rule costs
  one column, never another pass.
* referential rules -- an anti join against a dimension counts rows
  whose key has no match (orphans). One equi join per rule; the
  dimension side broadcasts when small.

Output is long-form [rule, n_violations, n_rows] so reports union and
store uniformly regardless of rule count.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..lineage import cut_lineage

REPORT_COLS = ("rule", "n_violations", "n_rows")

#: ASCII punctuation as explicit ranges -- identical semantics in Java
#: regex (Spark) and RE2 (DuckDB), unlike \p{Punct}/[[:punct:]] whose
#: definitions differ across engines.
_PUNCT = r"[!-/:-@\[-`{-~]"


def quality_report(
    df: DataFrame,
    scan_rules: Sequence[tuple[str, Column]],
    ref_rules: Sequence[tuple[str, Column, DataFrame]] = (),
) -> DataFrame:
    """Evaluate rules over `df`; return [rule, n_violations, n_rows].

    `scan_rules`: (name, violation_predicate) pairs -- the predicate is
    True for BAD rows. `ref_rules`: (name, join_condition, dimension)
    triples counting `df` rows with no dimension match.
    """
    if not scan_rules:
        raise ValueError("at least one scan rule is required")
    aggs = [F.count(F.lit(1)).alias("n_rows")] + [
        F.sum(F.when(cond, 1).otherwise(0)).alias(f"r{i}")
        for i, (_, cond) in enumerate(scan_rules)
    ]
    one_row = df.agg(*aggs)
    # Long-form via explode(array(struct...)), not a stack() SQL string:
    # rule names are data, and interpolating them into selectExpr would
    # let a quote inside a name break (or inject into) the expression.
    pairs = F.array(
        *[
            F.struct(
                F.lit(name).alias("rule"),
                F.col(f"r{i}").alias("n_violations"),
            )
            for i, (name, _) in enumerate(scan_rules)
        ]
    )
    report = one_row.select(
        F.explode(pairs).alias("_p"), "n_rows"
    ).select("_p.rule", "_p.n_violations", "n_rows")
    for name, cond, dim in ref_rules:
        orphans = df.join(F.broadcast(dim), cond, "left_anti").agg(
            F.count(F.lit(1)).alias("n_violations")
        )
        row = (
            orphans.crossJoin(F.broadcast(one_row.select("n_rows")))
            .select(F.lit(name).alias("rule"), "n_violations", "n_rows")
        )
        report = report.unionByName(row)
    return report


# ---------------------------------------------------------------------------
# Document-level heuristic quality rules (Gopher/C4-style).


#: Stopword probe set (Gopher's "contains >= 2 of these" rule).
GOPHER_STOPWORDS = ("the", "be", "to", "of", "and", "that", "have", "with")


def gopher_quality_flags(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_words: int = 50,
    max_words: int = 100_000,
    stopwords: tuple[str, ...] = GOPHER_STOPWORDS,
    min_stopword_hits: int = 2,
    keep_input: bool = False,
) -> DataFrame:
    """Rule-based document quality in ONE expression-only pass -- the
    Gopher/C4 heuristic filter family (word-count bounds, mean word
    length, symbol ratio, bullet/ellipsis line fractions, alphabetic
    word fraction, stopword presence) as per-document metrics + flags.

    Complements unigram_lm_scores (statistical) and quality_report
    (schema-level): this is the cheap row-wise gate that runs FIRST in a
    curation pipeline, before anything that shuffles. Everything here is
    built-in string/array expressions inside whole-stage codegen -- zero
    shuffles, zero Python, so at 100 TB it is scan-bound.

    Determinism: ratios are computed from exact integer counts and
    rounded to 1e-6; NULL (not a crash, not a flag pass) when a
    denominator is zero -- matching the DuckDB oracle exactly.
    """
    if keep_input:
        # With F.col('*') in the projection, an input column named like
        # a metric would yield DUPLICATE output names, and the caller's
        # conventional drop(*GOPHER_METRIC_COLS) would then silently
        # remove the caller's own column too (ADVICE r10). Fail loudly
        # instead, mirroring the _salt guards in skew.py.
        clash = sorted(set(df.columns) & set(GOPHER_METRIC_COLS))
        if clash:
            raise ValueError(
                "gopher_quality_flags(keep_input=True): input columns "
                f"{clash} collide with the metric/flag columns this "
                "operator adds; rename them first"
            )
    # Regex trim, NOT F.trim: trim() strips only ASCII spaces, so a
    # "\n"-only document would tokenize to two empty words. The regex
    # form strips all whitespace, matching Python str.strip().
    t = F.regexp_replace(F.col(text_col), r"^\s+|\s+$", "")
    words = F.split(t, r"\s+")
    n_words = F.when(t == "", F.lit(0)).otherwise(F.size(words))
    # total word characters = text with ALL whitespace removed
    n_word_chars = F.length(F.regexp_replace(t, r"\s+", ""))
    # Probe form of each word: lowercased, leading/trailing punctuation
    # stripped -- so 'The' and 'the,' count as the stopword 'the', and
    # ALL-CAPS words still count as alphabetic (ADVICE r5). The raw
    # word array keeps feeding the length/char metrics unchanged.
    probe_words = F.transform(
        words,
        lambda x: F.regexp_replace(
            F.lower(x), f"^{_PUNCT}+|{_PUNCT}+$", ""
        ),
    )
    n_alpha_words = F.size(F.filter(probe_words, lambda x: x.rlike("[a-z]")))
    lines = F.split(F.col(text_col), "\n")
    n_lines = F.size(lines)
    n_bullet = F.size(
        F.filter(
            lines,
            lambda x: F.substring(F.trim(x), 1, 2).isin("- ", "* ", "• "),
        )
    )
    n_ellipsis = F.size(
        F.filter(lines, lambda x: F.rtrim(x).endswith("..."))
    )
    n_symbols = (
        F.length(t) - F.length(F.replace(t, F.lit("#"), F.lit("")))
        + F.length(t) - F.length(F.replace(t, F.lit("…"), F.lit("")))
    )
    # The probe set is a parameter: Gopher's English defaults are wrong
    # for other languages/domains, and the rule must stay meaningful
    # there (the flag thresholds travel with the list).
    stop_hits = sum(
        (F.array_contains(probe_words, w).cast("int") for w in stopwords),
        F.lit(0),
    )

    def ratio(num, den):
        return F.when(
            den > 0, F.round(num.cast("double") / den.cast("double"), 6)
        )

    # keep_input=True keeps every input column alongside the metrics so
    # a gate can FILTER in place -- no flags-back-to-rows self-join, no
    # shuffle; the caller drops GOPHER_METRIC_COLS afterwards. The
    # default (id + metrics only) is the audit/report form q128 hashes.
    lead = [F.col("*")] if keep_input else [F.col(id_col)]
    out = df.select(
        *lead,
        n_words.alias("n_words"),
        ratio(n_word_chars, n_words).alias("mean_word_len"),
        ratio(n_symbols, n_words).alias("symbol_word_ratio"),
        ratio(n_bullet, n_lines).alias("bullet_line_frac"),
        ratio(n_ellipsis, n_lines).alias("ellipsis_line_frac"),
        ratio(n_alpha_words, n_words).alias("alpha_word_frac"),
        stop_hits.cast("long").alias("stopword_hits"),
    )
    flags = {
        "flag_word_count": F.col("n_words").between(min_words, max_words),
        "flag_mean_word_len": F.col("mean_word_len").between(3.0, 10.0),
        "flag_symbol_ratio": F.col("symbol_word_ratio") < 0.1,
        "flag_bullet_lines": F.col("bullet_line_frac") <= 0.9,
        "flag_ellipsis_lines": F.col("ellipsis_line_frac") <= 0.3,
        "flag_alpha_words": F.col("alpha_word_frac") >= 0.8,
        "flag_stopwords": F.col("stopword_hits") >= min_stopword_hits,
    }
    for name, cond in flags.items():
        out = out.withColumn(name, F.coalesce(cond, F.lit(False)))
    gopher_pass = F.lit(True)
    for name in flags:
        gopher_pass = gopher_pass & F.col(name)
    return out.withColumn("gopher_pass", gopher_pass)


#: Every column gopher_quality_flags ADDS -- what a keep_input=True
#: caller drops after filtering on gopher_pass.
GOPHER_METRIC_COLS = (
    "n_words",
    "mean_word_len",
    "symbol_word_ratio",
    "bullet_line_frac",
    "ellipsis_line_frac",
    "alpha_word_frac",
    "stopword_hits",
    "flag_word_count",
    "flag_mean_word_len",
    "flag_symbol_ratio",
    "flag_bullet_lines",
    "flag_ellipsis_lines",
    "flag_alpha_words",
    "flag_stopwords",
    "gopher_pass",
)


# Invisible/format characters that break exact dedup and tokenization:
# zero-width space/joiner/non-joiner, BOM, soft hyphen, word joiner.
_INVISIBLES = "​‌‍﻿­⁠"
#: typographic lookalikes normalized to ASCII (the subset that matters
#: for dedup keys; full NFKC needs ICU, unavailable engine-side).
_LOOKALIKES = {
    "‘": "'", "’": "'", "“": '"', "”": '"',
    "–": "-", "—": "-", " ": " ", "　": " ",
}


def normalize_text(col: Column) -> Column:
    """Canonicalize text before fingerprinting/dedup: strip invisible
    format characters, map typographic quotes/dashes/spaces to ASCII,
    collapse whitespace runs, trim. Two visually identical documents
    that differ only in these characters would otherwise dedup as
    distinct -- this is the canonical-form step that runs BEFORE
    exact_dedup/fingerprint in a curation pipeline.

    Pure JVM expressions (translate + regexp_replace): zero shuffle,
    scan-bound, and identical semantics in the DuckDB oracle.
    """
    # two translate passes: the first DELETES invisibles (translate
    # drops source chars beyond the target string's length), the second
    # maps lookalikes one-to-one
    out = F.translate(col, _INVISIBLES, "")
    out = F.translate(
        out, "".join(_LOOKALIKES), "".join(_LOOKALIKES.values())
    )
    out = F.regexp_replace(out, r"\s+", " ")
    return F.regexp_replace(out, r"^\s+|\s+$", "")


#: HTML entity decode map, applied in order; `&amp;` LAST so an
#: escaped ampersand never re-decodes what it produced.
_HTML_ENTITIES = (
    ("&lt;", "<"),
    ("&gt;", ">"),
    ("&quot;", '"'),
    ("&#39;", "'"),
    ("&nbsp;", " "),
    ("&amp;", "&"),
)


def html_text_extract(col: Column) -> Column:
    """Extract readable text from raw HTML: drop script/style blocks
    and comments, strip tags, decode the common entities, collapse
    whitespace -- the first transform a web-crawl curation pipeline
    applies to fetched pages before any quality gate or dedup.

    Pure JVM regex/replace expressions (zero shuffle, scan-bound), and
    every pattern is portable between Java regex and RE2: inline
    (?is) flags and lazy `.*?` only -- NO backreferences (RE2 has
    none), so script and style get one pass each.
    """
    x = F.regexp_replace(col, r"(?is)<script[^>]*>.*?</script>", " ")
    x = F.regexp_replace(x, r"(?is)<style[^>]*>.*?</style>", " ")
    x = F.regexp_replace(x, r"(?s)<!--.*?-->", " ")
    x = F.regexp_replace(x, r"<[^>]+>", " ")
    for ent, ch in _HTML_ENTITIES:
        x = F.replace(x, F.lit(ent), F.lit(ch))
    x = F.regexp_replace(x, r"\s+", " ")
    return F.regexp_replace(x, r"^\s+|\s+$", "")


def badword_filter(
    df: DataFrame,
    blocklist: tuple[str, ...],
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """C4-style blocklist gate: probe each document's words (lowercased,
    end-punctuation stripped -- the gopher_quality_flags probe form)
    against a small blocklist; report occurrence and distinct counts,
    the first hit, and the keep/drop decision.

    The blocklist rides as a literal array (blocklists are a few
    thousand entries at most), so the whole gate is expression-only --
    zero shuffle, scan-bound, the cheap filter that runs before
    anything expensive.

    Returns [id, n_bad_tokens, n_bad_distinct, first_bad, clean].
    """
    if not blocklist:
        raise ValueError("blocklist must name at least one word")
    t = F.regexp_replace(F.col(text_col), r"^\s+|\s+$", "")
    probe = F.transform(
        F.split(t, r"\s+"),
        lambda x: F.regexp_replace(F.lower(x), f"^{_PUNCT}+|{_PUNCT}+$", ""),
    )
    blocked = F.array(*[F.lit(w.lower()) for w in blocklist])
    hits = F.filter(probe, lambda x: F.array_contains(blocked, x))
    return df.select(
        F.col(id_col),
        F.size(hits).cast("long").alias("n_bad_tokens"),
        F.size(F.array_intersect(blocked, probe))
        .cast("long")
        .alias("n_bad_distinct"),
        # try_ form: ANSI mode makes plain element_at THROW on an empty
        # array, and clean documents are the common case
        F.try_element_at(hits, F.lit(1)).alias("first_bad"),
        (F.size(hits) == 0).alias("clean"),
    )


def dup_ngram_stats(
    df: DataFrame,
    n: int = 5,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Cross-document duplicate n-gram fraction per document -- the
    RefinedWeb/Gopher-style "how much of this document also exists
    elsewhere" metric that drives dedup threshold tuning: for each
    document, the fraction of its n-gram OCCURRENCES whose n-gram also
    appears in at least one OTHER document.

    Scale shape: n-grams are md5-hashed per position (map-side HOF over
    the token array), the per-gram distinct-document count is one
    shuffle keyed on the 128-bit digest (never on text), and the
    verdict joins back on the same key. Documents shorter than ``n``
    tokens have no n-grams and drop out.

    Returns [id, n_grams, n_dup_grams, dup_frac].
    """
    from ..functions.text import tokens

    toks = tokens(text_col)
    grams = (
        df.select(F.col(id_col), toks.alias("_t"))
        .filter(F.size("_t") >= n)
        .select(
            F.col(id_col),
            F.explode(
                F.transform(
                    F.sequence(F.lit(1), F.size("_t") - (n - 1)),
                    lambda i: F.md5(
                        F.concat_ws(" ", F.slice(F.col("_t"), i, n))
                    ),
                )
            ).alias("gram"),
        )
    )
    # Aggregate BEFORE the shuffle-heavy stages (r15 optimization round,
    # guide §2.3): collapse occurrence rows to one (id, gram, _occ) row
    # first -- the per-gram document count is then a plain count (the
    # rows ARE distinct (id, gram) pairs, replacing distinct+count with
    # one aggregate), and the verdict join + per-doc rollup ship one row
    # per distinct gram instead of one per occurrence. The lineage cut
    # materializes the md5 n-gram explode once for its two consumers.
    # n_grams = sum(_occ) and n_dup_grams = sum(_occ where _nd >= 2)
    # reproduce the occurrence-level counts exactly.
    g1 = (
        grams.groupBy(id_col, "gram")
        .agg(F.count(F.lit(1)).alias("_occ"))
        .transform(cut_lineage, eager=False)
    )
    gram_docs = g1.groupBy("gram").agg(F.count(F.lit(1)).alias("_nd"))
    return (
        g1.join(gram_docs, "gram")
        .groupBy(id_col)
        .agg(
            F.sum("_occ").cast("long").alias("n_grams"),
            F.sum(F.when(F.col("_nd") >= 2, F.col("_occ")).otherwise(F.lit(0)))
            .cast("long")
            .alias("n_dup_grams"),
        )
        .select(
            F.col(id_col),
            F.col("n_grams"),
            "n_dup_grams",
            F.round(
                F.col("n_dup_grams").cast("double") / F.col("n_grams"), 6
            ).alias("dup_frac"),
        )
    )


def normalize_url(col: Column) -> Column:
    """Canonicalize a URL for dedup/blocklist keys: lowercase the
    scheme+host, strip a default port, drop the fragment, strip
    tracking parameters (utm_*, fbclid, gclid), sort the surviving
    query parameters, and trim a trailing slash from the path. Two
    crawl records of the same page with different tracking decorations
    then share one key -- the URL analog of normalize_text.

    Pure JVM expressions: regex splits + array ops, RE2-compatible
    patterns (no backreferences, no lookarounds), zero shuffle.
    """
    # scheme://host[:port] is case-insensitive; path/query are not
    head = F.regexp_extract(col, r"^([a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]*)", 1)
    rest = F.substring(col, F.length(head) + 1, F.lit(1 << 30))
    head = F.lower(head)
    head = F.regexp_replace(head, r"^(https://[^/?#]*):443$", "$1")
    head = F.regexp_replace(head, r"^(http://[^/?#]*):80$", "$1")
    rest = F.regexp_replace(rest, r"#.*$", "")  # fragment
    path = F.regexp_extract(rest, r"^([^?]*)", 1)
    # absent path and bare root must share one key ('http://a.com' ==
    # 'http://a.com/', the most common duplicate pair -- ADVICE r6):
    # canonical form is the explicit root slash.
    path = F.when(path == "", F.lit("/")).otherwise(path)
    path = F.regexp_replace(path, r"(.)/$", "$1")  # trailing slash (not root)
    query = F.regexp_extract(rest, r"\?(.*)$", 1)
    params = F.filter(
        F.split(query, "&"),
        lambda p: (p != "")
        & ~p.rlike(r"^(utm_[^=]*|fbclid|gclid)(=|$)"),
    )
    canon_q = F.array_join(F.array_sort(params), "&")
    return F.concat(
        head,
        path,
        F.when(canon_q != "", F.concat(F.lit("?"), canon_q)).otherwise(
            F.lit("")
        ),
    )


def html_page_metadata(col: Column) -> Column:
    """Extract crawl-control metadata from raw HTML as a struct:
    [title, meta_robots, canonical_url, noindex] -- the fields a
    curation pipeline consults BEFORE extracting text (a noindex or
    canonical-elsewhere page is usually dropped or re-keyed).

    Case-insensitive RE2-compatible regexes only; absent fields are
    empty strings (noindex false)."""
    title = F.regexp_extract(col, r"(?is)<title[^>]*>(.*?)</title>", 1)
    robots = F.regexp_extract(
        col,
        r"""(?is)<meta[^>]*name\s*=\s*["']robots["'][^>]*content\s*=\s*["']([^"']*)["']""",
        1,
    )
    canonical = F.regexp_extract(
        col,
        r"""(?is)<link[^>]*rel\s*=\s*["']canonical["'][^>]*href\s*=\s*["']([^"']*)["']""",
        1,
    )
    noindex = F.lower(robots).contains("noindex")
    clean_title = F.regexp_replace(
        F.regexp_replace(title, r"\s+", " "), r"^\s+|\s+$", ""
    )
    return F.struct(
        clean_title.alias("title"),
        F.lower(robots).alias("meta_robots"),
        canonical.alias("canonical_url"),
        noindex.alias("noindex"),
    )


def robots_allowed(
    df: DataFrame,
    robots_col: str,
    path_col: str,
    user_agent: str = "*",
) -> Column:
    """Evaluate the Robots Exclusion Protocol for each (robots.txt
    content, URL path) row: returns a boolean column, True when the
    path may be fetched by ``user_agent``.

    Semantics follow the de-facto REP standard (RFC 9309): the most
    specific matching user-agent group applies (exact agent name over
    ``*``); within the group the LONGEST matching rule wins, with
    Allow beating Disallow on equal length; rules support ``*``
    wildcards and a ``$`` end anchor; an empty/missing robots file or
    an unmatched path allows.

    Robots parsing is genuinely imperative, so this is an Arrow-batched
    pandas UDF with PER-BATCH memoization keyed on the robots text
    (operators/bpe.py's apply pattern): a corpus holds millions of
    pages but few distinct robots files, so each batch parses each
    distinct file once.
    """
    import re as _re

    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    ua = user_agent.lower()

    def parse(robots: str):
        groups: dict[str, list[tuple[str, bool]]] = {}
        current: list[str] = []
        seen_rule = True
        for raw in (robots or "").splitlines():
            line = raw.split("#", 1)[0].strip()
            if not line or ":" not in line:
                continue
            field, _, value = line.partition(":")
            field = field.strip().lower()
            value = value.strip()
            if field == "user-agent":
                if seen_rule:
                    current = []
                    seen_rule = False
                current.append(value.lower())
                for agent in current:
                    groups.setdefault(agent, [])
            elif field in ("allow", "disallow"):
                seen_rule = True
                if not current:
                    continue
                if value == "" and field == "disallow":
                    continue  # "Disallow:" empty = allow all
                for agent in current:
                    groups.setdefault(agent, []).append(
                        (value, field == "allow")
                    )
            else:
                seen_rule = True
        rules = groups.get(ua, groups.get("*", []))
        compiled = []
        for pat, allow in rules:
            rx = _re.escape(pat).replace(r"\*", ".*")
            if rx.endswith(r"\$"):
                rx = rx[:-2] + "$"
            compiled.append((len(pat), allow, _re.compile("^" + rx)))
        return compiled

    @pandas_udf("boolean")
    def evaluate(robots, paths):  # pd.Series pair -> pd.Series
        # (untyped on purpose: pandas_udf's hint resolver cannot see
        # the function-local `pd` alias)
        cache: dict[str, list] = {}
        out = []
        for rb, path in zip(robots, paths):
            key = rb or ""
            if key not in cache:
                cache[key] = parse(key)
            best = None  # (specificity, allow)
            for spec, allow, rx in cache[key]:
                if rx.match(path or ""):
                    # longest rule wins; Allow beats Disallow on ties
                    cand = (spec, allow)
                    if best is None or cand > best:
                        best = cand
            out.append(True if best is None else best[1])
        return pd.Series(out)

    return evaluate(F.col(robots_col), F.col(path_col))


def profile_table(
    df: DataFrame,
    top_k_values: int = 5,
) -> DataFrame:
    """One-scan column profile -- the rule-free companion to
    quality_report (which checks declared expectations; this DESCRIBES
    whatever arrives, the first thing run against an unfamiliar
    delivery): per column the row/null/distinct counts, min/max
    rendered as strings, and the top value share.

    Long-form [column, n_rows, n_nulls, n_distinct, min_value,
    max_value, top_value, top_share]. Numeric/string/date columns
    profile alike (values render via CAST AS STRING with exact
    min/max computed in the native type first). Complex-typed columns
    (arrays/structs/maps/binary) are skipped -- profile their fields.

    Cost: ONE aggregate pass for counts/min/max over all columns
    simultaneously + one groupBy per column capped to the top value
    (count-distinct is exact -- swap approx_count_distinct in at
    100 TB if the exactness isn't worth the shuffle; the plan shape
    is otherwise identical).
    """
    import pyspark.sql.types as T

    simple = [
        f.name
        for f in df.schema.fields
        if not isinstance(
            f.dataType, (T.ArrayType, T.MapType, T.StructType, T.BinaryType)
        )
    ]
    if not simple:
        raise ValueError("no simple-typed columns to profile")
    aggs = [F.count(F.lit(1)).alias("_n")]
    for c in simple:
        aggs += [
            F.sum(F.col(c).isNull().cast("long")).alias(f"_null_{c}"),
            F.countDistinct(F.col(c)).alias(f"_dist_{c}"),
            F.min(F.col(c)).cast("string").alias(f"_min_{c}"),
            F.max(F.col(c)).cast("string").alias(f"_max_{c}"),
        ]
    one = df.agg(*aggs)
    rows = F.array(
        *[
            F.struct(
                F.lit(c).alias("column"),
                F.col("_n").cast("long").alias("n_rows"),
                F.col(f"_null_{c}").cast("long").alias("n_nulls"),
                F.col(f"_dist_{c}").cast("long").alias("n_distinct"),
                F.col(f"_min_{c}").alias("min_value"),
                F.col(f"_max_{c}").alias("max_value"),
            )
            for c in simple
        ]
    )
    base = one.select(F.explode(rows).alias("_r")).select("_r.*")
    # top value per column: one tiny union of per-column top-1 aggs
    top = None
    for c in simple:
        t = (
            df.groupBy(F.col(c).cast("string").alias("top_value"))
            .agg(F.count(F.lit(1)).alias("_cnt"))
            .filter(F.col("top_value").isNotNull())
            .orderBy(F.desc("_cnt"), "top_value")
            .limit(1)
            .select(
                F.lit(c).alias("column"),
                "top_value",
                F.col("_cnt").cast("long").alias("_top_cnt"),
            )
        )
        top = t if top is None else top.unionByName(t)
    return (
        base.join(top, "column", "left")
        .select(
            "column",
            "n_rows",
            "n_nulls",
            "n_distinct",
            "min_value",
            "max_value",
            "top_value",
            F.round(
                F.col("_top_cnt").cast("double") / F.col("n_rows"), 6
            ).alias("top_share"),
        )
    )


def sitemap_urls(df: DataFrame, xml_col: str, id_col: str) -> DataFrame:
    """Extract URL entries from sitemap XML (urlset or sitemapindex):
    one output row per <loc>, with the sibling <lastmod> when present
    and whether the entry points at another sitemap -- the crawl
    frontier's seed-expansion step.

    Regex extraction only (RE2-compatible, case-insensitive): sitemap
    files are machine-generated and flat, the one XML family where
    regex parsing is the honest right tool. Zero shuffle; explode per
    entry.
    """
    # Capture the WHOLE entry including its opening tag: is_sitemap must
    # come from the enclosing tag (<sitemap> vs <url>), not from a
    # 'sitemap' substring in the loc URL -- a <sitemapindex> child named
    # 'part-1.xml.gz' is still a sitemap, and a page URL containing
    # 'sitemap' is not (ADVICE r6).
    entries = F.expr(
        f"regexp_extract_all({xml_col}, "
        "'(?is)(<(?:url|sitemap)>.*?</(?:url|sitemap)>)', 1)"
    )
    staged = df.select(F.col(id_col), F.explode_outer(entries).alias("_e"))
    loc = F.regexp_extract(F.col("_e"), r"(?is)<loc>\s*(.*?)\s*</loc>", 1)
    lastmod = F.regexp_extract(
        F.col("_e"), r"(?is)<lastmod>\s*(.*?)\s*</lastmod>", 1
    )
    is_nested = F.lower(F.col("_e")).startswith("<sitemap>")
    return (
        staged.filter(F.col("_e").isNotNull())
        .select(
            F.col(id_col),
            loc.alias("url"),
            F.when(lastmod != "", lastmod).alias("lastmod"),
            is_nested.alias("is_sitemap"),
        )
        .filter(F.col("url") != "")
    )


def code_switch_report(
    df: DataFrame,
    text_col: str,
    id_col: str,
    window_tokens: int = 20,
) -> DataFrame:
    """Per-document code-switch / language-consistency screen: slice
    the token stream into fixed windows, language-ID each window with
    the q53 stopword-overlap heuristic, and report how consistent the
    document is -- mixed-language pages are poison for monolingual
    training mixes yet pass whole-document langid easily (the majority
    language still wins globally).

    Everything is JVM higher-order functions on ONE explode: windows
    come from slice() over the token array, per-window stopword hits
    from size(filter(...)), the window label from q53's deterministic
    argmax (fixed en>es>de>fr tie order). Majority share is an exact
    1e-6 integer division; ties on the majority label break
    lexicographically.

    Output: [id, n_windows, n_langs, majority_lang,
    majority_share_fp, is_code_switched] (is_code_switched = more
    than one NON-'und' window label present).
    """
    from ..functions.text import STOPWORDS

    toks = F.filter(
        F.split(F.lower(F.trim(F.col(text_col))), r"\s+"),
        lambda x: x != "",
    )
    base = df.select(
        F.col(id_col).alias("id"), toks.alias("_t")
    ).filter(F.size("_t") > 0)
    n_win = (F.size("_t") + F.lit(window_tokens - 1)).cast("long") / F.lit(
        window_tokens
    )
    windows = base.select(
        "id",
        F.explode(
            F.transform(
                F.sequence(
                    F.lit(0),
                    F.floor(n_win).cast("int") - F.lit(1),
                ),
                lambda i: F.slice(
                    F.col("_t"), i * window_tokens + 1, window_tokens
                ),
            )
        ).alias("_w"),
    )
    hits = {
        lang: F.size(
            F.filter(F.col("_w"), lambda x: x.isin(*STOPWORDS[lang]))
        )
        for lang in STOPWORDS
    }
    e, s, d, f_ = (hits[lang] for lang in ("en", "es", "de", "fr"))
    label = (
        F.when((e >= s) & (e >= d) & (e >= f_) & (e > 0), "en")
        .when((s >= d) & (s >= f_) & (s > 0), "es")
        .when((d >= f_) & (d > 0), "de")
        .when(f_ > 0, "fr")
        .otherwise("und")
    )
    labeled = windows.select("id", label.alias("_lang"))
    per_lang = labeled.groupBy("id", "_lang").agg(
        F.count(F.lit(1)).alias("c")
    )
    from pyspark.sql.window import Window as W

    best = F.row_number().over(
        W.partitionBy("id").orderBy(F.desc("c"), "_lang")
    )
    agg = per_lang.withColumn("_rn", best)
    stats = agg.groupBy("id").agg(
        F.sum("c").cast("long").alias("n_windows"),
        F.count(F.lit(1)).cast("long").alias("n_langs"),
        F.max(F.when(F.col("_rn") == 1, F.col("_lang"))).alias(
            "majority_lang"
        ),
        F.max(F.when(F.col("_rn") == 1, F.col("c"))).alias("_mc"),
        F.sum(
            F.when(F.col("_lang") != "und", 1).otherwise(0)
        ).alias("_n_real"),
        F.countDistinct(
            F.when(F.col("_lang") != "und", F.col("_lang"))
        ).alias("_n_real_langs"),
    )
    return stats.select(
        "id",
        "n_windows",
        "n_langs",
        "majority_lang",
        F.expr("(_mc * 1000000) div n_windows")
        .cast("long")
        .alias("majority_share_fp"),
        (F.col("_n_real_langs") > 1).alias("is_code_switched"),
    )


def char_class_profile(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Character-class composition per document: letters, digits,
    spaces, other -- the alphabet-level quality signal under langid
    and mojibake checks (a "text" document that is 40% non-alnum bytes
    is markup, a dump, or a decode casualty).

    Classes are EXPLICIT ASCII ranges ([A-Za-z], [0-9], literal space)
    via the length-difference idiom -- never \\s / \\w / POSIX classes,
    whose membership is engine- and version-dependent (the q131
    lesson). Counts are exact; ratios are 1e-6 fixed point over the
    character length. Pure projection: no shuffle, codegen end to end.

    Output [id, n_chars, n_letters, n_digits, n_spaces, n_other,
    letter_ppm, alnum_ppm].
    """
    t = F.col(text_col)
    n = F.length(t).cast("long")
    letters = (n - F.length(F.regexp_replace(t, "[A-Za-z]", ""))).cast(
        "long"
    )
    digits = (n - F.length(F.regexp_replace(t, "[0-9]", ""))).cast("long")
    spaces = (n - F.length(F.regexp_replace(t, " ", ""))).cast("long")
    return docs.select(
        F.col(id_col),
        n.alias("n_chars"),
        letters.alias("n_letters"),
        digits.alias("n_digits"),
        spaces.alias("n_spaces"),
        (n - letters - digits - spaces).cast("long").alias("n_other"),
    ).select(
        id_col,
        "n_chars",
        "n_letters",
        "n_digits",
        "n_spaces",
        "n_other",
        F.expr("n_letters * 1000000 div nullif(n_chars, 0)")
        .cast("long")
        .alias("letter_ppm"),
        F.expr(
            "(n_letters + n_digits) * 1000000 div nullif(n_chars, 0)"
        )
        .cast("long")
        .alias("alnum_ppm"),
    )


def compression_gate(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    level: int = 6,
    overhead_bytes: int = 64,
) -> DataFrame:
    """DEFLATE-compressibility gate: compress each document with zlib
    (stdlib, deterministic for a fixed level) inside one Arrow
    mapInPandas pass -- the classic cheap redundancy detector
    (boilerplate dumps and generator spam compress far below prose;
    near-random noise barely compresses at all).

    Certification is INVARIANT-FORM (the q63/q64 pattern): zlib has no
    SQL replica, so the certified columns are the exact anchors
    (doc_id, raw UTF-8 byte length) plus booleans a theorem pins TRUE
    -- DEFLATE stored-block framing bounds output <= input +
    overhead_bytes + input/1000 (stored blocks cost 5 bytes per
    64 KiB ~ input/13107 plus the 6-byte zlib wrapper, so the
    input/1000 term holds at ANY document size -- a flat +64 alone
    would go false past ~760 KB of incompressible input), compression
    never emits empty output, and decompress(compress(x)) == x. The
    compressed size itself stays library-side (``compressed_bytes``
    is returned for pipeline use but NOT part of the oracle contract
    -- register gates over the booleans).

    Scale: whole-batch Arrow transfer, per-doc CPU, zero shuffle.
    Output [id, raw_bytes, compressed_bytes, ratio_ppm,
    compressed_nonempty, bounded_overhead, roundtrip_ok].
    """
    from collections.abc import Iterator

    import pandas as pd

    def gate(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import zlib

        for pdf in batches:
            ids, raws, comps, ne, bo, rt = [], [], [], [], [], []
            for doc_id, text in zip(pdf[id_col], pdf[text_col]):
                data = ("" if text is None else str(text)).encode("utf-8")
                z = zlib.compress(data, level)
                ids.append(doc_id)
                raws.append(len(data))
                comps.append(len(z))
                ne.append(len(z) > 0)
                bo.append(
                    len(z) <= len(data) + overhead_bytes + len(data) // 1000
                )
                rt.append(zlib.decompress(z) == data)
            yield pd.DataFrame(
                {
                    id_col: ids,
                    "raw_bytes": raws,
                    "compressed_bytes": comps,
                    "compressed_nonempty": ne,
                    "bounded_overhead": bo,
                    "roundtrip_ok": rt,
                }
            )

    out = docs.select(id_col, text_col).mapInPandas(
        gate,
        f"{id_col} long, raw_bytes long, compressed_bytes long, "
        "compressed_nonempty boolean, bounded_overhead boolean, "
        "roundtrip_ok boolean",
    )
    return out.select(
        id_col,
        "raw_bytes",
        "compressed_bytes",
        F.expr("compressed_bytes * 1000000 div nullif(raw_bytes, 0)")
        .cast("long")
        .alias("ratio_ppm"),
        "compressed_nonempty",
        "bounded_overhead",
        "roundtrip_ok",
    )
