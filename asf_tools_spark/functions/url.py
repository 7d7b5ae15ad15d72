"""URL normalization + domain extraction — the key hygiene every
URL-keyed web corpus needs before url-level dedup or per-domain policy
(crawl dedup keys on the NORMALIZED url; domain rollups drive
budget/blocklist decisions).

Emitter-style like asf_tools_spark.oracle: ONE SQL template per value,
rendered for either dialect, so Spark and DuckDB agree bit-for-bit — the
registry query and its oracle both call these. All regexes are
anchored/greedy ASCII, written to behave identically under Java regex
(Spark replaces all matches; anchored patterns match at most once) and
RE2/DuckDB (replaces first match).

Normalization rules (the common canonicalizer subset):
  lowercase -> strip scheme -> strip leading www. -> drop #fragment ->
  drop ?query -> collapse trailing slashes.
"""

from __future__ import annotations

from .. import oracle


def synth_url_sql(key_expr: str, dialect: str) -> str:
    """Deterministic messy URL per key — mixed scheme case, optional www,
    per-key site + path, optional tracking query and fragment. Shared by
    the Spark query and the DuckDB oracle (hash8 family)."""
    h1 = oracle.hash8_sql(key_expr, dialect, salt="url-a")
    h2 = oracle.hash8_sql(key_expr, dialect, salt="url-b")
    cat = "CONCAT" if dialect == oracle.SPARK else "concat"
    return f"""{cat}(
      CASE {h1} % 3 WHEN 0 THEN 'http://' WHEN 1 THEN 'https://' ELSE 'HTTPS://' END,
      CASE WHEN {h2} % 2 = 0 THEN 'www.' ELSE '' END,
      'Site', CAST({h1} % 40 AS STRING), '.example.COM',
      '/articles/page-', CAST({key_expr} AS STRING),
      CASE WHEN {h2} % 3 = 0 THEN {cat}('?utm_source=feed&ref=', CAST({h1} % 7 AS STRING)) ELSE '' END,
      CASE WHEN {h1} % 5 = 0 THEN '#section-2' ELSE '' END,
      CASE WHEN {h2} % 4 = 0 THEN '/' ELSE '' END
    )""".replace("AS STRING", "AS STRING" if dialect == oracle.SPARK else "AS VARCHAR")


def normalize_url_sql(expr: str, dialect: str) -> str:
    """Canonical URL: the nested regexp_replace chain (see module doc).

    Backslash escaping is DIALECT-SPECIFIC: Spark SQL string literals
    process C-style escapes (regex ``\\.`` must be written ``'\\\\.'``),
    DuckDB literals are SQL-standard (write ``'\\.'``). Getting this wrong
    is silent and catastrophic — under DuckDB a ``'\\\\?.*$'`` pattern
    means "optional backslash then anything", which matches at position 0
    and replaces the ENTIRE url with ''."""
    b = "\\\\" if dialect == oracle.SPARK else "\\"
    s = f"LOWER({expr})"
    s = f"regexp_replace({s}, '^[a-z][a-z0-9+.-]*://', '')"   # scheme
    s = f"regexp_replace({s}, '^www{b}.', '')"                # leading www.
    s = f"regexp_replace({s}, '#.*$', '')"                    # fragment
    s = f"regexp_replace({s}, '{b}?.*$', '')"                 # query string
    s = f"regexp_replace({s}, '/+$', '')"                     # trailing /s
    return s


def domain_sql(norm_expr: str, dialect: str) -> str:
    """Host part of an already-normalized URL (text before the first /)."""
    return f"regexp_extract({norm_expr}, '^([^/]+)', 1)"
