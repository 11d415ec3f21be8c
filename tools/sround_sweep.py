#!/usr/bin/env python3
"""Second-generation round-parity sweep.

Spark's round(x, n) on DOUBLE is BigDecimal.valueOf(x).setScale(n, HALF_UP)
— HALF_UP on the SHORTEST decimal repr. DuckDB's float-path round() diverges
near ties; printf('%.nf') (fmt, exact-value half-even) diverges at exact
dyadic ties. The bit-exact DuckDB twin (0/140578 adversarial diffs, |x|<9e9):

    round((x)::VARCHAR::DECIMAL(38,23), n)

(::VARCHAR = shortest repr, DECIMAL round = half away from zero = HALF_UP.)

Pass A: revert the snap6()/snap6dec()/printf sweep in the indicator layer
        back to plain Spark round / sround oracles.
Pass B: convert every remaining DuckDB round(<expr>, n) (SQL margin lines,
        n in {2,6,9}) in the query files to the sround form.
"""
import re, sys

SROUND = "::VARCHAR::DECIMAL(38,23)"

def find_calls(text, name):
    for m in re.finditer(r'\b' + name + r'\(', text):
        i = m.end(); depth = 1; j = i
        while depth > 0 and j < len(text):
            c = text[j]
            if c == '(':
                depth += 1
            elif c == ')':
                depth -= 1
            j += 1
        yield m.start(), i, j - 1

def line_prefix(text, idx):
    ls = text.rfind('\n', 0, idx) + 1
    return text[ls:idx].lstrip()

def pass_a(path):
    text = open(path).read()
    # snap6dec(E) -> round(E, 6).cast("decimal(18,6)")
    for name, repl in [("snap6dec", 'round({inner}, 6).cast("decimal(18,6)")'),
                       ("snap6", 'round({inner}, 6)')]:
        while True:
            spans = [s for s in find_calls(text, name)]
            if not spans:
                break
            start, ci, cj = spans[0]
            inner = text[ci:cj]
            text = text[:start] + repl.format(inner=inner) + text[cj + 1:]
    # printf('%.Nf', E)[::DOUBLE] -> round((E)::VARCHAR::DECIMAL(38,23), N)[::DOUBLE]
    while True:
        spans = [s for s in find_calls(text, "printf")]
        done = True
        for start, ci, cj in spans:
            content = text[ci:cj]
            m = re.match(r"'%\.(\d)f',\s*", content, re.S)
            if not m:
                continue
            n = m.group(1)
            inner = content[m.end():]
            after = text[cj + 1:cj + 16]
            repl = f"round(({inner}){SROUND}, {n})"
            if after.startswith('::DOUBLE'):
                text = text[:start] + repl + text[cj + 1:]
            else:
                text = text[:start] + repl + text[cj + 1:]
            done = False
            break
        if done:
            break
    open(path, 'w').write(text)
    print(f"pass A done: {path}")

def pass_b(path):
    text = open(path).read()
    out = []; pos = 0; n_conv = 0
    for start, ci, cj in find_calls(text, "round"):
        if start < pos:
            continue
        content = text[ci:cj]
        mm = re.search(r',\s*(?:\|\s*)?([269])\s*$', content)
        if not mm:
            continue
        scale = mm.group(1)
        inner = content[:mm.start()]
        if SROUND in inner:
            continue  # already converted
        prefix = line_prefix(text, start)
        is_sql = (prefix.startswith('|') or prefix.startswith('"""')
                  or prefix.startswith('s"""'))
        if not is_sql:
            continue  # Scala side keeps native round()
        after = text[cj + 1:cj + 40]
        out.append(text[pos:start])
        out.append(f"round(({inner}){SROUND}, {scale})")
        pos = cj + 1
        # keep an existing decimal cast; otherwise force ::DOUBLE (round on
        # DECIMAL returns DECIMAL, but the Spark twin emits DOUBLE)
        if not (after.startswith('::DECIMAL') or re.match(r'\s*AS\s+DECIMAL', after)):
            out.append('::DOUBLE')
        n_conv += 1
    out.append(text[pos:])
    open(path, 'w').write(''.join(out))
    print(f"pass B: {path}: {n_conv} sites")

base = '/root/repo/src/main/scala/graft/'
pass_a(base + 'operators/Indicators.scala')
pass_a(base + 'queries/IndicatorQueries.scala')
for f in ['queries/IndicatorQueries.scala', 'queries/TradingQueries.scala',
          'queries/StreamQueries.scala', 'queries/PipelineQueries.scala',
          'queries/StarQueries.scala', 'queries/LlmQueries.scala']:
    pass_b(base + f)
