#!/usr/bin/env python3
"""One-shot sweep: replace engine round(x, 6) with the tie-free %.6f snap
(format_string on Spark / printf on DuckDB) in the indicator layer.

Scala:  round(E, 6)                     -> snap6(E)
        round(E, 6).cast("decimal(18,6)") -> snap6dec(E)
SQL:    round(E, 6)                     -> printf('%.6f', E)::DOUBLE
        round(E, 6)::DECIMAL(18,6)      -> printf('%.6f', E)::DECIMAL(18,6)
        CAST(round(E, 6) AS DECIMAL...) -> CAST(printf('%.6f', E) AS DECIMAL...)

A round( occurrence is SQL iff its line (after leading ws) starts with | or \"\"\".
Only applies when the last argument is literally 6.
"""
import re, sys

def find_round_spans(text):
    """Yield (start, open_paren_idx, close_idx) for each round( call."""
    for m in re.finditer(r'\bround\(', text):
        start = m.start()
        i = m.end()  # index just after '('
        depth = 1
        j = i
        while depth > 0 and j < len(text):
            c = text[j]
            if c == '(':
                depth += 1
            elif c == ')':
                depth -= 1
            j += 1
        yield start, i, j - 1  # content is text[i:j-1]

def line_prefix(text, idx):
    ls = text.rfind('\n', 0, idx) + 1
    return text[ls:idx].lstrip()

def transform(path, sql_allowed):
    text = open(path).read()
    out = []
    pos = 0
    n_scala = n_sql = 0
    spans = list(find_round_spans(text))
    for start, ci, cj in spans:
        if start < pos:
            continue
        content = text[ci:cj]
        # must end with ", 6" possibly across margin lines
        mm = re.search(r',\s*(?:\|\s*)?6\s*$', content)
        if not mm:
            continue
        inner = content[:mm.start()]
        prefix = line_prefix(text, start)
        is_sql = prefix.startswith('|') or prefix.startswith('"""') or prefix.startswith('THEN') or prefix.startswith('s"""')
        after = text[cj + 1:cj + 64]
        out.append(text[pos:start])
        if is_sql:
            if not sql_allowed:
                raise RuntimeError(f"SQL round in non-SQL file at {start}")
            out.append(f"printf('%.6f', {inner})")
            pos = cj + 1
            # keep an existing ::DECIMAL / AS DECIMAL cast; else add ::DOUBLE
            if not (after.startswith('::DECIMAL') or re.match(r'\s*AS\s+DECIMAL', after)):
                out.append('::DOUBLE')
            n_sql += 1
        else:
            cast = re.match(r'\s*\.cast\("decimal\(18,6\)"\)', after)
            if cast:
                out.append(f"snap6dec({inner})")
                pos = cj + 1 + cast.end()
            else:
                out.append(f"snap6({inner})")
                pos = cj + 1
            n_scala += 1
    out.append(text[pos:])
    open(path, 'w').write(''.join(out))
    print(f"{path}: {n_scala} scala, {n_sql} sql sites converted")

transform('/root/repo/src/main/scala/graft/operators/Indicators.scala', sql_allowed=False)
transform('/root/repo/src/main/scala/graft/queries/IndicatorQueries.scala', sql_allowed=True)
