#!/usr/bin/env python3
"""Mechanical DuckDB-dialect -> shared-ANSI rewriter for the oracle SQL
texts (round-16 item 2).

Transforms applied (in this order; each is a pure text rewrite that must
keep the DuckDB answer bit-identical — tools/dialect_lab.py arbitrates):

  1. hexcast : CAST('0x' || E AS BIGINT)  ->  positional hex-digit fold
               via instr('0123456789abcdef', ...) (both engines parse;
               exact for the corpus' <=12-digit widths)
  2. typearr : X::T[]                     ->  list_transform(X, v -> CAST(v AS T))
  3. bracket : [...] literal              ->  list_value(...)
               B[i]                       ->  list_extract(B, i)
               B[a:b] / B[a:] / B[:b]     ->  list_slice(B, a, b)
  4. intdiv  : A // B (with * / % chain)  ->  divide(A, B)  (DuckDB's
               function form of integer //; Spark aliases it to `div`)
  5. varchar : AS VARCHAR                 ->  AS STRING  (DuckDB accepts STRING)
  6. lateral : FROM x, unnest(...) AS t(c) -> ..., LATERAL unnest(...) AS t(c)
               (DuckDB accepts LATERAL; Spark needs it when correlated)

The same `transform()` runs over rendered SQL (candidate generation for
the lab) and over the triple-quoted literals in the Scala sources
(application), so validated text == applied text. Margin pipes
(`\n  |` from stripMargin) and `${...}` interpolations are treated as
whitespace / opaque atoms so the source pass is safe.

Usage:
  python3 tools/rewrite_dialect.py render <oracle.json> <out.json> [names...]
  python3 tools/rewrite_dialect.py apply  <scala-file> [...]
"""
import sys, json, re

IDENT = re.compile(r'[A-Za-z0-9_$]')

def is_margin_pipe(s, i):
    """s[i] == '|' that is a stripMargin margin (newline + spaces before)."""
    j = i
    while j > 0 and s[j-1] in ' \t':
        j -= 1
    return j > 0 and s[j-1] == '\n'

def skip_ws_fwd(s, i):
    while i < len(s):
        c = s[i]
        if c in ' \t\n':
            i += 1
        elif c == '|' and is_margin_pipe(s, i):
            i += 1
        else:
            break
    return i

def skip_ws_back(s, i):
    """i is exclusive end; return new exclusive end with trailing ws/margins skipped."""
    while i > 0:
        c = s[i-1]
        if c in ' \t\n':
            i -= 1
        elif c == '|' and is_margin_pipe(s, i-1):
            i -= 1
        else:
            break
    return i

def skip_string_fwd(s, i):
    """s[i] == \"'\": return index after the closing quote ('' escapes)."""
    i += 1
    while i < len(s):
        if s[i] == "'":
            if i + 1 < len(s) and s[i+1] == "'":
                i += 2
                continue
            return i + 1
        i += 1
    raise ValueError("unterminated SQL string")

def balanced_fwd(s, i):
    """s[i] in '([{': return index after the matching closer."""
    opens = {'(': ')', '[': ']', '{': '}'}
    closer = opens[s[i]]
    depth = 0
    while i < len(s):
        c = s[i]
        if c == "'":
            i = skip_string_fwd(s, i)
            continue
        if c in opens:
            depth += 1
        elif c in ')]}':
            depth -= 1
            if depth == 0:
                if c != closer:
                    raise ValueError(f"mismatched bracket at {i}")
                return i + 1
        i += 1
    raise ValueError("unbalanced brackets")

def balanced_back(s, i):
    """s[i-1] in ')]}': return index of the matching opener."""
    closes = {')': '(', ']': '[', '}': '{'}
    depth = 0
    j = i
    while j > 0:
        c = s[j-1]
        if c == "'":
            # walk back over the string literal ('' escapes make a pure
            # backward scan ambiguous; rescan forward from each prior quote)
            k = j - 2
            while k >= 0:
                if s[k] == "'" and (k == 0 or s[k-1] != "'"):
                    # candidate opener; verify by forward scan
                    try:
                        if skip_string_fwd(s, k) == j:
                            j = k
                            break
                    except ValueError:
                        pass
                k -= 1
            else:
                raise ValueError("unterminated backward string")
            continue
        if c in ')]}':
            depth += 1
        elif c in '([{':
            depth -= 1
            if depth == 0:
                return j - 1
        j -= 1
    raise ValueError("unbalanced backward")

def atom_back(s, i):
    """Return start index of the operand atom whose exclusive end is i.
    Atom = [ident/interp] ( '(...)' | string ) with dotted chains."""
    i0 = skip_ws_back(s, i)
    j = i0
    while True:
        if j > 0 and s[j-1] in ')]}':
            j = balanced_back(s, j)
            # function-call name / interpolation prefix
            if j > 0 and s[j-1] == '$':      # ${...}
                j -= 1
            else:
                k = j
                while k > 0 and IDENT.match(s[k-1]):
                    k -= 1
                j = k
        elif j > 0 and s[j-1] == "'":
            # string atom — find its opener
            k = j - 2
            while k >= 0:
                if s[k] == "'" and (k == 0 or s[k-1] != "'"):
                    try:
                        if skip_string_fwd(s, k) == j:
                            j = k
                            break
                    except ValueError:
                        pass
                k -= 1
        elif j > 0 and IDENT.match(s[j-1]):
            while j > 0 and IDENT.match(s[j-1]):
                j -= 1
        else:
            raise ValueError(f"cannot scan atom back at ...{s[max(0,i0-40):i0]!r}")
        # dotted chain (a.b, t.col)
        if j > 0 and s[j-1] == '.':
            j -= 1
            continue
        return j

def atom_fwd(s, i):
    """Return exclusive end of the operand atom starting at/after i."""
    i = skip_ws_fwd(s, i)
    j = i
    if j < len(s) and s[j] == '-':
        j = skip_ws_fwd(s, j + 1)
    if j < len(s) and s[j] == "'":
        j = skip_string_fwd(s, j)
    elif j < len(s) and s[j] in '([':
        j = balanced_fwd(s, j)
    elif j < len(s) and (IDENT.match(s[j]) or s[j] == '$'):
        if s[j] == '$' and j + 1 < len(s) and s[j+1] == '{':
            j = balanced_fwd(s, j + 1)
        else:
            while j < len(s) and IDENT.match(s[j]):
                j += 1
            # number forms 1.5 / 1e6 handled by IDENT approx (e6 included);
            # explicit fraction:
            if j < len(s) and s[j] == '.' and j + 1 < len(s) and s[j+1].isdigit():
                j += 1
                while j < len(s) and s[j].isdigit():
                    j += 1
        k = skip_ws_fwd(s, j)
        if k < len(s) and s[k] == '(':   # function call
            j = balanced_fwd(s, k)
    else:
        raise ValueError(f"cannot scan atom fwd at {s[i:i+40]!r}")
    # dotted chain
    while j < len(s) and s[j] == '.' and j + 1 < len(s) and IDENT.match(s[j+1]):
        j += 1
        while j < len(s) and IDENT.match(s[j]):
            j += 1
        k = skip_ws_fwd(s, j)
        if k < len(s) and s[k] == '(':
            j = balanced_fwd(s, k)
    return j

def scan_code_positions(s):
    """Yield indices of chars OUTSIDE single-quoted SQL strings."""
    i = 0
    while i < len(s):
        if s[i] == "'":
            i = skip_string_fwd(s, i)
            continue
        yield i
        i += 1

def find_outside_strings(s, needle, start=0):
    i = start
    while i < len(s):
        if s[i] == "'":
            i = skip_string_fwd(s, i)
            continue
        if s.startswith(needle, i):
            return i
        i += 1
    return -1

# ---------- pass 1: hex cast ----------
HEXRE = re.compile(r"CAST\(\s*(\()?\s*'0x'\s*\|\|\s*")

def pass_hexcast(s):
    out = s
    while True:
        m = HEXRE.search(out)
        if m is None:
            return out
        p = m.start()
        parenthesized = m.group(1) is not None
        e_start = m.end()
        e_end = atom_fwd(out, e_start)
        k = skip_ws_fwd(out, e_end)
        if parenthesized:
            if out[k] != ')':
                raise ValueError(f"hexcast paren tail not found: {out[e_end:e_end+30]!r}")
            k = skip_ws_fwd(out, k + 1)
        if not out.startswith("AS BIGINT)", k):
            raise ValueError(f"hexcast tail not found: {out[e_end:e_end+30]!r}")
        tail = k + len("AS BIGINT)")
        e = out[e_start:e_end]
        m = re.search(r',\s*(\d+)\s*\)$', e)
        if not m:
            raise ValueError(f"hexcast width not literal: {e!r}")
        width = int(m.group(1))
        if width == 1:
            rep = f"CAST(instr('0123456789abcdef', {e}) - 1 AS BIGINT)"
        else:
            rep = (f"list_sum(list_transform(range(1, {width + 1}), hxi -> "
                   f"CAST(instr('0123456789abcdef', substring({e}, CAST(hxi AS INT), 1)) - 1 AS BIGINT)"
                   f" * CAST(pow(16, {width} - hxi) AS BIGINT)))")
        out = out[:p] + rep + out[tail:]

# ---------- pass 2: X::T[] and CAST(X AS T[]) ----------
def pass_typearr(s):
    out = pass_typearr_cast(s)
    while True:
        m = re.search(r'::\s*(\w+)\s*\[\]', out)
        if m is None:
            return out
        # make sure we're outside strings
        if find_outside_strings(out, out[m.start():m.end()]) != m.start():
            # inside a string (shouldn't happen in the corpus) — bail loudly
            raise ValueError("::T[] inside a string literal")
        typ = m.group(1)
        if typ.upper() == 'VARCHAR':
            typ = 'STRING'
        x_start = atom_back(out, m.start())
        x = out[x_start:m.start()]
        rep = f"list_transform({x}, tav -> CAST(tav AS {typ}))"
        out = out[:x_start] + rep + out[m.end():]

def at_top_level(s, pos):
    depth = 0
    i = 0
    while i < pos:
        c = s[i]
        if c == "'":
            i = skip_string_fwd(s, i)
            continue
        if c in '([{':
            depth += 1
        elif c in ')]}':
            depth -= 1
        i += 1
    return depth == 0

def pass_typearr_cast(s):
    out = s
    i = 0
    while True:
        p = find_outside_strings(out, 'CAST(', i)
        if p < 0:
            return out
        end = balanced_fwd(out, p + 4)
        inner = out[p+5:end-1]
        m = re.search(r'\s+AS\s+(\w+)\s*\[\]\s*$', inner)
        if m is None or not at_top_level(inner, m.start()):
            # no array-typed AS, or the AS belongs to a nested expression
            i = p + 5
            continue
        typ = m.group(1)
        if typ.upper() == 'VARCHAR':
            typ = 'STRING'
        x = inner[:m.start()].strip()
        out = out[:p] + f"list_transform({x}, tav -> CAST(tav AS {typ}))" + out[end:]
KEYWORDS = {'THEN', 'ELSE', 'WHEN', 'SELECT', 'IN', 'AND', 'OR', 'NOT',
            'ON', 'BY', 'WHERE', 'HAVING', 'RETURN', 'UNION', 'ALL',
            'DISTINCT', 'BETWEEN', 'CASE', 'FROM', 'USING'}

def bracket_kind(s, open_i):
    """'literal' if [ starts a list literal, else 'index'."""
    j = skip_ws_back(s, open_i)
    if j == 0:
        return 'literal'
    c = s[j-1]
    if IDENT.match(c):
        k = j
        while k > 0 and IDENT.match(s[k-1]):
            k -= 1
        if s[k:j].upper() in KEYWORDS:
            return 'literal'
        return 'index'
    if c in ')]':
        return 'index'
    return 'literal'

def top_level_colon(s):
    """Index of a top-level single ':' in bracket content, or -1."""
    depth = 0
    i = 0
    while i < len(s):
        c = s[i]
        if c == "'":
            i = skip_string_fwd(s, i)
            continue
        if c in '([{':
            depth += 1
        elif c in ')]}':
            depth -= 1
        elif c == ':' and depth == 0:
            if i + 1 < len(s) and s[i+1] == ':':
                i += 2
                continue
            if i > 0 and s[i-1] == ':':
                i += 1
                continue
            return i
        i += 1
    return -1

def pass_brackets(s):
    out = s
    while True:
        # find an innermost '[' outside strings
        target = -1
        i = 0
        while i < len(out):
            if out[i] == "'":
                i = skip_string_fwd(out, i)
                continue
            if out[i] == '[':
                end = balanced_fwd(out, i)
                inner = out[i+1:end-1]
                if find_outside_strings(inner, '[') < 0:
                    target = i
                    break
                i += 1
                continue
            i += 1
        if target < 0:
            return out
        end = balanced_fwd(out, target)
        inner = out[target+1:end-1]
        kind = bracket_kind(out, target)
        if kind == 'literal':
            rep_start, rep_end = target, end
            rep = f"list_value({inner.strip()})" if inner.strip() else "list_value()"
        else:
            b_start = atom_back(out, target)
            base = out[b_start:target]
            colon = top_level_colon(inner)
            if colon < 0:
                rep = f"list_extract({base}, {inner.strip()})"
            else:
                lo = inner[:colon].strip()
                hi = inner[colon+1:].strip()
                lo = lo if lo else '1'
                hi = hi if hi else '1000000000'
                rep = f"list_slice({base}, {lo}, {hi})"
            rep_start, rep_end = b_start, end
        out = out[:rep_start] + rep + out[rep_end:]

# ---------- pass 4: // ----------
MULDIV = set('*/%')

def pass_intdiv(s):
    out = s
    while True:
        p = find_outside_strings(out, '//')
        if p < 0:
            return out
        # left operand: atom chain over * / %
        l_start = atom_back(out, p)
        while True:
            j = skip_ws_back(out, l_start)
            if j > 0 and out[j-1] in MULDIV and not (j > 1 and out[j-2] == '/') \
               and not (j < len(out) and out[j] == '/' and out[j-1] == '/'):
                l_start = atom_back(out, j - 1)
            else:
                break
        # unary minus directly attached to the chain start
        j = skip_ws_back(out, l_start)
        if j > 0 and out[j-1] == '-':
            k = skip_ws_back(out, j - 1)
            if k == 0 or out[k-1] in '(,=<>+*/%' or out[k-1] == 'N':  # crude: operator/open before
                sys.stderr.write(f"[rewrite] WARNING unary-minus before // chain: ...{out[max(0,l_start-30):p+10]!r}\n")
        r_end = atom_fwd(out, p + 2)
        left = out[l_start:p].rstrip().rstrip('|').rstrip()
        right = out[skip_ws_fwd(out, p + 2):r_end]
        # divide() is DuckDB's function form of integer `//` (truncating,
        # int64-exact — a FLOOR(a/b) form loses exactness past 2^53 and
        # floors where `//` truncates); fractional-operand sites fail
        # loudly on both engines and get a manual FLOOR rewrite
        rep = f"divide({left}, {right})"
        out = out[:l_start] + rep + out[r_end:]

# ---------- pass 5: varchar ----------
def pass_varchar(s):
    return re.sub(r'\bAS\s+VARCHAR\b(?!\s*[\(\[])', lambda m: m.group(0).replace('VARCHAR', 'STRING'), s)

# ---------- pass 6: lateral ----------
def pass_lateral(s):
    out = s
    i = 0
    while True:
        p = find_outside_strings(out, 'unnest(', i)
        if p < 0:
            return out
        # preceded by a comma (FROM-list position)?
        j = skip_ws_back(out, p)
        if not (j > 0 and out[j-1] == ','):
            i = p + 7
            continue
        # already LATERAL?
        # (the comma check above means it is not)
        end = balanced_fwd(out, p + 6)
        k = skip_ws_fwd(out, end)
        if re.match(r'AS\s+\w+\s*\(', out[k:k+40]):
            out = out[:p] + 'LATERAL ' + out[p:]
            i = p + len('LATERAL unnest(')
        else:
            i = p + 7
    return out

# ---------- pass 7: datediff('day', a, b) ----------
# Spark's parser intercepts datediff/date_diff before the function
# registry and rejects the quoted unit, so the day-boundary diff is
# spelled via epoch() (graft-aliased on Spark, native on DuckDB):
# day-aligned DATE casts make the 86400 division exact on both engines.
def pass_datediff(s):
    out = s
    while True:
        p = find_outside_strings(out, "datediff('day',")
        if p < 0:
            return out
        a_start = skip_ws_fwd(out, p + len("datediff('day',"))
        a_end = arg_end(out, a_start)
        b_start = skip_ws_fwd(out, a_end + 1)
        b_end = arg_end(out, b_start)
        k = skip_ws_fwd(out, b_end)
        if out[k] != ')':
            raise ValueError(f"datediff tail: {out[b_end:b_end+30]!r}")
        a, b = out[a_start:a_end].strip(), out[b_start:b_end].strip()
        rep = (f"divide(CAST(epoch(CAST({b} AS DATE)) AS BIGINT)"
               f" - CAST(epoch(CAST({a} AS DATE)) AS BIGINT), 86400)")
        out = out[:p] + rep + out[k+1:]

def arg_end(s, i):
    """Exclusive end of a top-level function argument starting at i."""
    depth = 0
    while i < len(s):
        c = s[i]
        if c == "'":
            i = skip_string_fwd(s, i)
            continue
        if c in '([{':
            depth += 1
        elif c in ')]}':
            if depth == 0:
                return i
            depth -= 1
        elif c == ',' and depth == 0:
            return i
        i += 1
    raise ValueError("unterminated argument")

def transform(sql):
    s = pass_hexcast(sql)
    s = pass_typearr(s)
    s = pass_brackets(s)
    s = pass_intdiv(s)
    s = pass_varchar(s)
    s = pass_lateral(s)
    s = pass_datediff(s)
    return s

# ---------- drivers ----------
def cmd_render(oracle_path, out_path, names):
    o = json.load(open(oracle_path))
    todo = names or sorted(o)
    res = {}
    for n in todo:
        try:
            t = transform(o[n])
            if t != o[n]:
                res[n] = t
        except Exception as e:
            sys.stderr.write(f"[rewrite] {n}: {e}\n")
    json.dump(res, open(out_path, 'w'), indent=1)
    print(f"{len(res)} transformed, {len(todo) - len(res)} unchanged/failed -> {out_path}")

def find_triple_quoted(src):
    spans = []
    i = 0
    while True:
        a = src.find('"""', i)
        if a < 0:
            return spans
        b = src.find('"""', a + 3)
        if b < 0:
            return spans
        # extend over trailing quotes ("""" edge) — Scala allows """ followed by "
        while b + 3 < len(src) and src[b+3] == '"':
            b += 1
        spans.append((a + 3, b))
        i = b + 3

def cmd_apply(paths):
    for path in paths:
        src = open(path).read()
        out_parts = []
        last = 0
        changed = 0
        for a, b in find_triple_quoted(src):
            body = src[a:b]
            if not re.search(r'\b(SELECT|WITH)\b', body):
                continue
            try:
                new = transform(body)
            except Exception as e:
                sys.stderr.write(f"[rewrite] {path}@{a}: {e}\n")
                continue
            if new != body:
                out_parts.append(src[last:a])
                out_parts.append(new)
                last = b
                changed += 1
        out_parts.append(src[last:])
        if changed:
            open(path, 'w').write(''.join(out_parts))
        print(f"{path}: {changed} literals rewritten")

def find_normal_quoted(src):
    """Spans of content inside normal double-quoted Scala strings
    (NOT triple-quoted; skips escaped quotes)."""
    spans = []
    i = 0
    n = len(src)
    while i < n:
        if src.startswith('"""', i):
            b = src.find('"""', i + 3)
            if b < 0:
                break
            while b + 3 < n and src[b+3] == '"':
                b += 1
            i = b + 3
            continue
        if src[i] == '"':
            j = i + 1
            while j < n:
                if src[j] == '\\':
                    j += 2
                    continue
                if src[j] == '"':
                    break
                j += 1
            spans.append((i + 1, j))
            i = j + 1
            continue
        i += 1
    return spans

def cmd_rangeapply(path, lo, hi):
    """Transform every string literal whose span intersects lines [lo, hi]."""
    src = open(path).read()
    starts = [0]
    for k, ch in enumerate(src):
        if ch == '\n':
            starts.append(k + 1)
    def lineno(pos):
        import bisect
        return bisect.bisect_right(starts, pos)
    spans = sorted(find_triple_quoted(src) + find_normal_quoted(src))
    out_parts, last, changed = [], 0, 0
    for a, b in spans:
        if lineno(b) < lo or lineno(a) > hi:
            continue
        body = src[a:b]
        try:
            new = transform(body)
        except Exception as e:
            sys.stderr.write(f"[rewrite] {path}:{lineno(a)}: {e}\n")
            continue
        if new != body:
            out_parts.append(src[last:a])
            out_parts.append(new)
            last = b
            changed += 1
            sys.stderr.write(f"[rewrite] {path}:{lineno(a)} transformed\n")
    out_parts.append(src[last:])
    if changed:
        open(path, 'w').write(''.join(out_parts))
    print(f"{path} [{lo},{hi}]: {changed} literals rewritten")

if __name__ == '__main__':
    if sys.argv[1] == 'render':
        cmd_render(sys.argv[2], sys.argv[3], sys.argv[4:])
    elif sys.argv[1] == 'apply':
        cmd_apply(sys.argv[2:])
    elif sys.argv[1] == 'rangeapply':
        cmd_rangeapply(sys.argv[2], int(sys.argv[3]), int(sys.argv[4]))
    else:
        sys.exit("unknown subcommand")
