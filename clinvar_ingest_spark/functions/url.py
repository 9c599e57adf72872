"""URL canonicalization — the key-normalization step in front of a
web-CDC keyed table (key-partitioned MERGE on ``url`` is only correct
if equivalent spellings of one page hash to ONE key).

Common Crawl's canonical-URL practice (and the reference's synthetic-id
normalization, orchestration/scripts/request-release-date-snapshot.py
slug reformat) motivate the ruleset; every rule is a pure column
expression (JVM, codegen'd, zero Python) and each is mirrorable 1:1 in
ANSI/DuckDB SQL so results are oracle-checkable:

1. drop the fragment (``#...`` never reaches the server);
2. lowercase scheme + authority (host names are case-insensitive;
   paths are NOT touched);
3. drop the scheme's default port (``https://h:443`` ≡ ``https://h``,
   ``http://h:80`` ≡ ``http://h``);
4. drop tracking query params (``utm_*``, ``gclid``, ``fbclid``),
   keeping all others in their original order — and the whole ``?`` if
   nothing survives;
5. strip trailing slashes from a non-root path; an empty path
   canonicalizes to ``/``.

Deliberately NOT done (unsafe without fetching): percent-decoding,
query-param reordering, ``www.`` stripping, scheme upgrades.
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F

#: tracking params dropped by rule 4 — plain alternation, no
#: lookarounds or backreferences, so the same pattern runs identically
#: under Java regex (Spark) and RE2 (DuckDB with the 'g' flag).
TRACKING_RE = r"(?:utm_[a-z]+|gclid|fbclid)"

#: one-or-more consecutive "<tracking>=<v>&" pairs. The enclosing rules
#: anchor this to a literal '?' or '&' so a param whose NAME merely
#: contains a tracking name (e.g. ``xgclid``, ``custom_utm_source``) is
#: never touched; the + consumes runs in one scan because the regex
#: cursor resumes AFTER the kept delimiter, which would hide the next
#: pair's anchor from a single-pair pattern.
_TRACKING_RUN = r"(?:" + TRACKING_RE + r"=[^&]*&)+"


def canonical_url(col: Column) -> Column:
    """Canonical form of ``col`` per the module ruleset."""
    # 1. fragment off (first '#' onward; '#' is illegal elsewhere)
    u = F.substring_index(col, "#", 1)
    # split authority head ('scheme://host[:port]') from the rest
    head = F.regexp_extract(u, r"^([a-zA-Z][a-zA-Z0-9+.\-]*://[^/?#]*)", 1)
    rest = F.substring(u, F.length(head) + 1, F.lit(2**30))
    # 2-3. lowercase head, strip default port for the matching scheme
    head = F.lower(head)
    head = F.regexp_replace(head, r"^(https://[^/?#:]*):443$", "$1")
    head = F.regexp_replace(head, r"^(http://[^/?#:]*):80$", "$1")
    # split rest into path and query ('?' first occurrence)
    path = F.substring_index(rest, "?", 1)
    query = F.when(
        F.instr(rest, "?") > 0,
        F.substring(rest, F.instr(rest, "?"), F.lit(2**30)),
    ).otherwise(F.lit(""))
    # 4. tracking params out — every rule anchors the param NAME to a
    #    preceding '?' or '&' (an unanchored "gclid=..." would also hit
    #    params merely CONTAINING a tracking name, e.g. "xgclid",
    #    merging distinct pages into one canonical key): runs of
    #    "p=v&" pairs after '?' / after '&' (delimiter kept, no
    #    backreference so Spark and RE2 agree), then trailing
    #    "?p=v"/"&p=v" runs, then a dangling lone '?'
    query = F.regexp_replace(query, r"\?" + _TRACKING_RUN, "?")
    query = F.regexp_replace(query, r"&" + _TRACKING_RUN, "&")
    query = F.regexp_replace(
        query, r"(?:[?&]" + TRACKING_RE + r"=[^&]*)+$", ""
    )
    query = F.when(query == "?", F.lit("")).otherwise(query)
    # 5. trailing slashes off a non-root path; empty path -> '/'
    path = F.regexp_replace(path, r"/+$", "")
    path = F.when(path == "", F.lit("/")).otherwise(path)
    return F.concat(head, path, query)
