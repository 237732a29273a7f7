"""String functions — Daft-name parity over pyspark.sql.functions.

Reference surface: ``daft/functions/str.py`` (1,997 LoC, ~60 fns at
str.py:369-1965). Near-1:1 built-in mapping per SURVEY §2.6; the gaps
(jaro/damerau/hamming, case conversions) are implemented as expressions
or documented pandas-UDF fallbacks.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _c(col: Column | str) -> Column:
    return F.col(col) if isinstance(col, str) else col


# --- direct built-in parity (reference str.py names -> Spark) ---------------
def contains(col, pat):  # str.py contains
    return _c(col).contains(pat)


def startswith(col, pat):
    return _c(col).startswith(pat)


def endswith(col, pat):
    return _c(col).endswith(pat)


def split(col, pat, regex=False):
    import re

    return F.split(_c(col), pat if regex else re.escape(pat))


def lower(col):
    return F.lower(_c(col))


def upper(col):
    return F.upper(_c(col))


def lstrip(col):
    return F.ltrim(_c(col))


def rstrip(col):
    return F.rtrim(_c(col))


def strip(col):
    return F.trim(_c(col))


def reverse(col):
    return F.reverse(_c(col))


def capitalize(col):
    return F.initcap(_c(col))


def left(col, n):
    return F.left(_c(col), F.lit(n))


def right(col, n):
    return F.right(_c(col), F.lit(n))


def lpad(col, length, pad=" "):
    return F.lpad(_c(col), length, pad)


def rpad(col, length, pad=" "):
    return F.rpad(_c(col), length, pad)


def repeat(col, n):
    return F.repeat(_c(col), n)


def like(col, pat):
    return _c(col).like(pat)


def ilike(col, pat):
    return _c(col).ilike(pat)


def substr(col, start, length=None):
    # reference substr is 0-based; Spark substring is 1-based
    return F.substring(_c(col), start + 1, length if length is not None else 2147483647)


def length(col):
    return F.length(_c(col))


def length_bytes(col):
    return F.octet_length(_c(col))


def find(col, substring):
    """0-based index of substring, -1 if absent (reference str.py find)."""
    return F.instr(_c(col), substring) - 1


def regexp(col, pat):
    return _c(col).rlike(pat)


def regexp_count(col, pat):
    return F.regexp_count(_c(col), F.lit(pat))


def regexp_extract(col, pat, idx=0):
    return F.regexp_extract(_c(col), pat, idx)


def regexp_extract_all(col, pat, idx=0):
    return F.regexp_extract_all(_c(col), F.lit(pat), F.lit(idx))


def regexp_split(col, pat):
    return F.split(_c(col), pat)


def regexp_replace(col, pat, replacement):
    return F.regexp_replace(_c(col), pat, replacement)


def replace(col, search, newstr):
    return F.replace(_c(col), F.lit(search), F.lit(newstr))


def translate(col, matching, replace_str):
    return F.translate(_c(col), matching, replace_str)


def substring_index(col, delim, count):
    return F.substring_index(_c(col), delim, count)


def soundex(col):
    return F.soundex(_c(col))


def ascii_(col):
    return F.ascii(_c(col))


def chr_(col):
    return F.char(_c(col))


def space(n):
    return F.repeat(F.lit(" "), n)


def format_string(fmt, *cols):
    return F.format_string(fmt, *[_c(c) for c in cols])


def concat_ws(sep, *cols):
    return F.concat_ws(sep, *[_c(c) for c in cols])


def levenshtein_distance(a, b):
    return F.levenshtein(_c(a), _c(b))


def normalize(col, *, remove_punct=True, lowercase=True, nfd_unicode=False, white_space=True):
    """reference str.py normalize: lowercase/strip-punct/collapse-ws."""
    c = _c(col)
    if lowercase:
        c = F.lower(c)
    if remove_punct:
        c = F.regexp_replace(c, r"[^\p{L}\p{N}\s]", "")
    if white_space:
        c = F.trim(F.regexp_replace(c, r"\s+", " "))
    return c


def count_matches(col, patterns, whole_words=False, case_sensitive=True):
    """reference str.py count_matches — occurrences of any pattern."""
    flags = "" if case_sensitive else "(?i)"
    body = "|".join(__import__("re").escape(p) for p in patterns)
    pat = rf"{flags}\b(?:{body})\b" if whole_words else f"{flags}(?:{body})"
    return F.regexp_count(_c(col), F.lit(pat))


# --- gap fills (no Spark built-in) ------------------------------------------
def hamming_distance_str(a, b):
    """Per-char Hamming distance of equal-length strings (reference
    str.py hamming_distance); null when lengths differ."""
    ca, cb = _c(a), _c(b)
    pairs = F.zip_with(F.split(ca, ""), F.split(cb, ""), lambda x, y: (x != y).cast("int"))
    return F.when(F.length(ca) == F.length(cb), F.aggregate(pairs, F.lit(0), lambda acc, x: acc + x))


def jaro_winkler_similarity(a, b):
    """reference str.py jaro_winkler_similarity — Python UDF fallback
    (no vectorizable closed form); avoid in 100 TB hot paths."""
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("double")
    def _jw(sa, sb):
        import pandas as pd

        def jw(x, y):
            if x is None or y is None:
                return None
            # Jaro
            if x == y:
                return 1.0
            lx, ly = len(x), len(y)
            if not lx or not ly:
                return 0.0
            match_dist = max(lx, ly) // 2 - 1
            xm = [False] * lx
            ym = [False] * ly
            matches = 0
            for i, cx in enumerate(x):
                lo, hi = max(0, i - match_dist), min(ly, i + match_dist + 1)
                for j in range(lo, hi):
                    if not ym[j] and y[j] == cx:
                        xm[i] = ym[j] = True
                        matches += 1
                        break
            if not matches:
                return 0.0
            t = 0
            k = 0
            for i in range(lx):
                if xm[i]:
                    while not ym[k]:
                        k += 1
                    if x[i] != y[k]:
                        t += 1
                    k += 1
            jaro = (matches / lx + matches / ly + (matches - t / 2) / matches) / 3
            prefix = 0
            for cx, cy in zip(x, y):
                if cx == cy and prefix < 4:
                    prefix += 1
                else:
                    break
            return jaro + prefix * 0.1 * (1 - jaro)

        return pd.Series([jw(x, y) for x, y in zip(sa, sb)])

    return _jw(_c(a), _c(b))


def to_snake_case(col):
    c = F.regexp_replace(_c(col), r"([a-z0-9])([A-Z])", r"$1_$2")
    c = F.regexp_replace(c, r"[\s\-]+", "_")
    return F.lower(c)


def to_kebab_case(col):
    return F.regexp_replace(to_snake_case(col), "_", "-")


def to_camel_case(col):
    """lowerCamelCase from snake/kebab/space-separated."""
    parts = F.split(F.lower(F.regexp_replace(_c(col), r"[\s\-_]+", " ")), " ")
    rebuilt = F.concat_ws(
        "",
        F.element_at(parts, 1),
        F.array_join(F.transform(F.slice(parts, 2, 2147483646), F.initcap), ""),
    )
    return rebuilt


def to_title_case(col):
    """reference str.py to_title_case — capitalize each word."""
    return F.initcap(_c(col))


def to_upper_snake_case(col):
    return F.upper(to_snake_case(col))


def to_upper_kebab_case(col):
    return F.upper(to_kebab_case(col))


def to_upper_camel_case(col):
    """UpperCamelCase (PascalCase) from snake/kebab/space-separated."""
    return F.concat_ws(
        "",
        F.transform(F.split(to_snake_case(col), "_"), lambda w: F.initcap(w)),
    )


def jaro_similarity(a, b):
    """reference str.py jaro_similarity — Jaro WITHOUT the Winkler
    common-prefix boost. Python UDF fallback like jaro_winkler."""
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("double")
    def _j(sa, sb):
        import pandas as pd

        def jaro(x, y):
            if x is None or y is None:
                return None
            if x == y:
                return 1.0
            lx, ly = len(x), len(y)
            if not lx or not ly:
                return 0.0
            match_dist = max(lx, ly) // 2 - 1
            xm = [False] * lx
            ym = [False] * ly
            matches = 0
            for i, cx in enumerate(x):
                lo, hi = max(0, i - match_dist), min(ly, i + match_dist + 1)
                for j in range(lo, hi):
                    if not ym[j] and y[j] == cx:
                        xm[i] = ym[j] = True
                        matches += 1
                        break
            if not matches:
                return 0.0
            t = 0
            k = 0
            for i in range(lx):
                if xm[i]:
                    while not ym[k]:
                        k += 1
                    if x[i] != y[k]:
                        t += 1
                    k += 1
            return (matches / lx + matches / ly + (matches - t / 2) / matches) / 3

        return pd.Series([jaro(x, y) for x, y in zip(sa, sb)])

    return _j(_c(a), _c(b))


def damerau_levenshtein_distance(a, b):
    """reference str.py damerau_levenshtein_distance (optimal string
    alignment: edits + adjacent transpositions). Python UDF fallback —
    no vectorizable closed form; avoid in 100 TB hot paths."""
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("int")
    def _dl(sa, sb):
        import pandas as pd

        def dl(x, y):
            if x is None or y is None:
                return None
            lx, ly = len(x), len(y)
            d = [[0] * (ly + 1) for _ in range(lx + 1)]
            for i in range(lx + 1):
                d[i][0] = i
            for j in range(ly + 1):
                d[0][j] = j
            for i in range(1, lx + 1):
                for j in range(1, ly + 1):
                    cost = 0 if x[i - 1] == y[j - 1] else 1
                    d[i][j] = min(d[i - 1][j] + 1, d[i][j - 1] + 1, d[i - 1][j - 1] + cost)
                    if i > 1 and j > 1 and x[i - 1] == y[j - 2] and x[i - 2] == y[j - 1]:
                        d[i][j] = min(d[i][j], d[i - 2][j - 2] + cost)
            return d[lx][ly]

        return pd.Series([dl(x, y) for x, y in zip(sa, sb)], dtype="object")

    return _dl(_c(a), _c(b))
