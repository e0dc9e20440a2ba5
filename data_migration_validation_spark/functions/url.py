"""URL canonicalization — the first projection of any web-crawl pipeline.

Dedup by URL is meaningless until equivalent spellings collapse:
``HTTP://WWW.Example.COM:80/a?utm_source=x&b=2&a=1#frag`` and
``http://www.example.com/a?a=1&b=2`` are the same resource. Rules (the
common core of crawler canonicalizers, cf. RFC 3986 §6):

1. scheme and host lowercase;
2. default port stripped (``:80`` for http, ``:443`` for https —
   non-default ports kept);
3. fragment dropped;
4. query parameters: tracking params (``utm_*``) removed, the rest
   sorted byte-wise; an emptied query drops its ``?``.

Pure Column expressions (whole-stage codegen — at 100 TB this runs at
scan speed), with a DuckDB twin generated from the same rules so the
oracle pins both engines to identical outputs.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def canonicalize_url_expr(url_sql: str) -> Column:
    """Spark Column from a SQL snippet naming the url column/expression —
    one F.expr keeps position arithmetic readable and lets both the
    Column API and SQL registration share a single implementation."""
    return F.expr(_spark_sql(url_sql))


def _spark_sql(u: str) -> str:
    scheme = f"lower(substring_index({u}, '://', 1))"
    rest = f"substring({u}, instr({u}, '://') + 3)"
    # host[:port] = up to the first '/', path+query the remainder
    hostport = (
        f"lower(CASE WHEN instr({rest}, '/') > 0 "
        f"THEN substring({rest}, 1, instr({rest}, '/') - 1) ELSE {rest} END)"
    )
    pathq = (
        f"CASE WHEN instr({rest}, '/') > 0 "
        f"THEN substring({rest}, instr({rest}, '/')) ELSE '' END"
    )
    host = (
        f"CASE WHEN {scheme} = 'http' AND {hostport} LIKE '%:80' "
        f"THEN substring({hostport}, 1, length({hostport}) - 3) "
        f"WHEN {scheme} = 'https' AND {hostport} LIKE '%:443' "
        f"THEN substring({hostport}, 1, length({hostport}) - 4) "
        f"ELSE {hostport} END"
    )
    nofrag = f"CASE WHEN instr({pathq}, '#') > 0 THEN substring({pathq}, 1, instr({pathq}, '#') - 1) ELSE {pathq} END"
    path = (
        f"CASE WHEN instr({nofrag}, '?') > 0 "
        f"THEN substring({nofrag}, 1, instr({nofrag}, '?') - 1) ELSE {nofrag} END"
    )
    query = (
        f"CASE WHEN instr({nofrag}, '?') > 0 "
        f"THEN substring({nofrag}, instr({nofrag}, '?') + 1) ELSE '' END"
    )
    params = (
        f"array_sort(filter(split({query}, '&'), "
        f"p -> p != '' AND NOT startswith(p, 'utm_')))"
    )
    qpart = (
        f"CASE WHEN size({params}) > 0 "
        f"THEN concat('?', array_join({params}, '&')) ELSE '' END"
    )
    return f"concat({scheme}, '://', {host}, {path}, {qpart})"


def canonicalize_url_sql(u: str) -> str:
    """DuckDB twin of the same rules."""
    scheme = f"lower(split_part({u}, '://', 1))"
    rest = f"substring({u}, strpos({u}, '://') + 3)"
    hostport = (
        f"lower(CASE WHEN strpos({rest}, '/') > 0 "
        f"THEN substring({rest}, 1, strpos({rest}, '/') - 1) ELSE {rest} END)"
    )
    pathq = (
        f"CASE WHEN strpos({rest}, '/') > 0 "
        f"THEN substring({rest}, strpos({rest}, '/')) ELSE '' END"
    )
    host = (
        f"CASE WHEN {scheme} = 'http' AND {hostport} LIKE '%:80' "
        f"THEN substring({hostport}, 1, length({hostport}) - 3) "
        f"WHEN {scheme} = 'https' AND {hostport} LIKE '%:443' "
        f"THEN substring({hostport}, 1, length({hostport}) - 4) "
        f"ELSE {hostport} END"
    )
    nofrag = (
        f"CASE WHEN strpos({pathq}, '#') > 0 "
        f"THEN substring({pathq}, 1, strpos({pathq}, '#') - 1) ELSE {pathq} END"
    )
    path = (
        f"CASE WHEN strpos({nofrag}, '?') > 0 "
        f"THEN substring({nofrag}, 1, strpos({nofrag}, '?') - 1) ELSE {nofrag} END"
    )
    query = (
        f"CASE WHEN strpos({nofrag}, '?') > 0 "
        f"THEN substring({nofrag}, strpos({nofrag}, '?') + 1) ELSE '' END"
    )
    params = (
        f"list_sort([p for p in string_split({query}, '&') "
        f"if p <> '' and not starts_with(p, 'utm_')])"
    )
    qpart = (
        f"CASE WHEN len({params}) > 0 "
        f"THEN '?' || array_to_string({params}, '&') ELSE '' END"
    )
    return f"{scheme} || '://' || {host} || {path} || {qpart}"
