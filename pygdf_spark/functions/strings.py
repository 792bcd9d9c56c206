"""cuDF ``.str`` accessor surface → Spark Column expressions
(SURVEY.md §2.9-strings; reference: python/cudf/cudf/core/column/string.py,
cpp/include/cudf/strings/*).

Every function takes/returns ``pyspark.sql.Column`` so it composes inside
whole-stage codegen — no Python row loop anywhere. Names follow the cuDF
accessor; line references point at the reference implementation.
"""

from __future__ import annotations

import re

from pyspark.sql import Column
from pyspark.sql import functions as F


def _c(col) -> Column:
    return F.col(col) if isinstance(col, str) else col


# --- size / basic (string.py:310,332) ----------------------------------

def len_(col) -> Column:
    """str.len — character count (string.py:310)."""
    return F.length(_c(col))


def byte_count(col) -> Column:
    """str.byte_count (string.py:332) — UTF-8 byte length."""
    return F.octet_length(_c(col))


def cat(*cols, sep: str = "") -> Column:
    """str.cat (string.py:369) — concatenate columns."""
    return F.concat_ws(sep, *[_c(c) for c in cols])


def repeat(col, n) -> Column:
    """strings::repeat_strings (repeat_strings.hpp:54)."""
    return F.repeat(_c(col), n)


def reverse(col) -> Column:
    return F.reverse(_c(col))


# --- case (case.hpp:42-77, capitalize.hpp:58,89) -----------------------

def lower(col) -> Column:
    return F.lower(_c(col))


def upper(col) -> Column:
    return F.upper(_c(col))


def capitalize(col) -> Column:
    """capitalize.hpp:58 — first char upper, rest lower."""
    c = _c(col)
    return F.concat(F.upper(F.substring(c, 1, 1)), F.lower(F.substring(c, F.lit(2), F.length(c))))


def title(col) -> Column:
    """capitalize.hpp:89 title() — initcap per whitespace word."""
    return F.initcap(_c(col))


def swapcase(col) -> Column:
    """case.hpp swapcase — per-char case flip, built from codegen'd
    transform over the exploded char array (no Python)."""
    c = _c(col)
    return F.array_join(
        F.transform(
            F.split(c, ""),
            lambda ch: F.when(ch == F.upper(ch), F.lower(ch)).otherwise(F.upper(ch)),
        ),
        "",
    )


# --- find / contains (find.hpp:102-189, contains.hpp:50) ---------------

def contains(col, pat: str, regex: bool = True) -> Column:
    """str.contains (string.py:735)."""
    c = _c(col)
    return c.rlike(pat) if regex else c.contains(pat)


def startswith(col, pat: str) -> Column:
    return _c(col).startswith(pat)


def endswith(col, pat: str) -> Column:
    return _c(col).endswith(pat)


def find(col, sub: str) -> Column:
    """str.find (string.py:3615) — 0-based, -1 when absent (cuDF
    semantics; Spark instr is 1-based/0-absent)."""
    return F.instr(_c(col), sub) - 1


def rfind(col, sub: str) -> Column:
    c = _c(col)
    rev_pos = F.instr(F.reverse(c), sub[::-1])
    return F.when(rev_pos == 0, F.lit(-1)).otherwise(F.length(c) - rev_pos - len(sub) + 1)


def find_multiple(col, subs: list[str]) -> Column:
    """find_multiple.hpp:52 — array of 0-based positions."""
    return F.array(*[find(col, s) for s in subs])


# --- regex (extract.hpp:53, replace_re.hpp:46, findall.hpp:55) ---------

def extract(col, pat: str, group: int = 1) -> Column:
    return F.regexp_extract(_c(col), pat, group)


def findall(col, pat: str, group: int = 0) -> Column:
    """findall.hpp:55 — all full matches (group 0 by default)."""
    return F.regexp_extract_all(_c(col), F.lit(pat), group)


def count_re(col, pat: str) -> Column:
    """str.count (string.py:3293)."""
    return F.regexp_count(_c(col), F.lit(pat))


def match(col, pat: str) -> Column:
    """matches_re (string.py:3849) — anchored at start. The whole
    pattern is grouped: a bare '^' + prefix would anchor only the FIRST
    alternative ('^cat|dog' matches 'hotdog')."""
    p = pat if pat.startswith("^") else f"^(?:{pat})"
    return _c(col).rlike(p)


def replace(col, pat: str, repl: str, regex: bool = True) -> Column:
    """str.replace (string.py:871; replace.hpp:63 / replace_re.hpp:46)."""
    c = _c(col)
    if regex:
        return F.regexp_replace(c, pat, repl)
    return F.replace(c, F.lit(pat), F.lit(repl))


def replace_with_backrefs(col, pat: str, repl: str) -> Column:
    """string.py:981 — Spark regexp_replace supports $1 backrefs."""
    return F.regexp_replace(_c(col), pat, repl)


# --- slice / substring (substring.hpp:58) ------------------------------

def slice_(col, start: int, stop: int | None = None) -> Column:
    """str.slice (string.py:1011) — 0-based [start, stop), negative
    indices count from the end (Python slicing, which pandas/cuDF
    follow; Spark substring's negative pos is end-relative but
    1-convention-shifted, so both bounds resolve via length)."""
    c = _c(col)
    if start >= 0 and stop is None:
        return F.substring(c, F.lit(start + 1), F.length(c))
    if start >= 0 and stop is not None and stop >= 0:
        return F.substring(c, start + 1, max(stop - start, 0))
    ln = F.length(c)
    s_ = F.greatest(ln + F.lit(start), F.lit(0)) if start < 0 else F.lit(start)
    if stop is None:
        e_ = ln
    else:
        e_ = F.greatest(ln + F.lit(stop), F.lit(0)) if stop < 0 else F.least(F.lit(stop), ln)
    return F.substring(c, (s_ + 1).cast("int"), F.greatest(e_ - s_, F.lit(0)).cast("int"))


def get(col, i: int) -> Column:
    """str.get (string.py:2147) — single character at 0-based index;
    negative indices count from the end (Python semantics)."""
    c = _c(col)
    if i >= 0:
        return F.substring(c, i + 1, 1)
    return F.substring(c, (F.length(c) + F.lit(i + 1)).cast("int"), 1)


def slice_replace(col, start: int, stop: int, repl: str) -> Column:
    """string.py:2010."""
    c = _c(col)
    return F.concat(F.substring(c, 1, start), F.lit(repl), F.substring(c, F.lit(stop + 1), F.length(c)))


# --- pad / strip (padding.hpp:64,93, strip.hpp:69) ---------------------

def pad(col, width: int, side: str = "left", fillchar: str = " ") -> Column:
    """Python/pandas/cuDF padding: strings already >= width pass through
    UNCHANGED (Spark's lpad/rpad silently truncate to width)."""
    c = _c(col)
    if side == "left":
        padded = F.lpad(c, width, fillchar)
    elif side == "right":
        padded = F.rpad(c, width, fillchar)
    else:
        # both: center (string.py:2838). Python's str.center (which
        # pandas and cuDF follow) puts the EXTRA fill char on the left
        # when both the margin and the width are odd:
        # left = marg//2 + (marg & width & 1)
        total = F.lit(width) - F.length(c)
        left = (F.floor(total / 2) + (total % 2) * F.lit(width % 2)).cast("int")
        padded = F.rpad(F.lpad(c, (F.length(c) + F.greatest(left, F.lit(0))).cast("int"), fillchar), width, fillchar)
    return F.when(F.length(c) >= width, c).otherwise(padded)


def zfill(col, width: int) -> Column:
    c = _c(col)
    return F.when(F.length(c) >= width, c).otherwise(F.lpad(c, width, "0"))


def center(col, width: int, fillchar: str = " ") -> Column:
    """str.center (string.py:2838; padding.hpp:64 side=BOTH) — an odd
    margin's extra fill char goes LEFT when the target width is also
    odd, else right: left = margin//2 + (margin & width & 1), matching
    CPython's str.center (which pandas follows)."""
    return pad(col, width, "both", fillchar)


def insert(col, start: int, repl: str) -> Column:
    """str.insert (string.py:2010 region) — splice `repl` in before the
    0-based position; start=-1 appends (the cuDF default)."""
    c = _c(col)
    if start == -1:
        return F.concat(c, F.lit(repl))
    return F.concat(
        F.substring(c, 1, start), F.lit(repl), F.substring(c, F.lit(start + 1), F.length(c))
    )


def ljust(col, width: int, fillchar: str = " ") -> Column:
    c = _c(col)
    return F.when(F.length(c) >= width, c).otherwise(F.rpad(c, width, fillchar))


def rjust(col, width: int, fillchar: str = " ") -> Column:
    c = _c(col)
    return F.when(F.length(c) >= width, c).otherwise(F.lpad(c, width, fillchar))


def _chclass(chars: str) -> str:
    return "[" + re.escape(chars) + "]"


def strip(col, to_strip: str | None = None) -> Column:
    c = _c(col)
    return F.trim(c) if to_strip is None else F.btrim(c, F.lit(to_strip))


def lstrip(col, to_strip: str | None = None) -> Column:
    c = _c(col)
    if to_strip is None:
        return F.ltrim(c)
    if to_strip == "":
        return c  # Python semantics: stripping nothing is a no-op
    return F.regexp_replace(c, f"^{_chclass(to_strip)}+", "")


def rstrip(col, to_strip: str | None = None) -> Column:
    c = _c(col)
    if to_strip is None:
        return F.rtrim(c)
    if to_strip == "":
        return c
    return F.regexp_replace(c, f"{_chclass(to_strip)}+$", "")


# --- split / partition (split.hpp:52-229, partition.hpp:58,90) ---------

def split(col, pat: str | None = None, limit: int = -1) -> Column:
    """str.split. With no separator (pandas/cuDF whitespace mode) the
    edges are trimmed first so leading/trailing whitespace yields no
    phantom '' tokens; an explicit pattern keeps raw split semantics
    (pandas str.split(' ') also keeps edge empties)."""
    c = _c(col)
    if pat is None:
        t = F.regexp_replace(c, r"^\s+|\s+$", "")
        return F.when(
            t == "", F.array().cast("array<string>")
        ).otherwise(F.split(t, r"\s+", limit))
    return F.split(c, pat, limit)


def rsplit(col, sep: str = " ", limit: int = -1) -> Column:
    """str.rsplit (string.py:2403; split.hpp:229 rsplit_record) — split
    on a LITERAL separator counting splits from the right (`limit` caps
    the piece count like Spark's split). Built entirely from codegen'd
    exprs by the reverse trick: reverse the string, left-split on the
    reversed separator, then reverse each piece and the piece order."""
    c = _c(col)
    rev = F.split(F.reverse(c), re.escape(sep[::-1]), limit)
    return F.reverse(F.transform(rev, lambda x: F.reverse(x)))


def rpartition(col, sep: str) -> Column:
    """partition.hpp:90 — struct(head, sep, tail) split at the LAST
    occurrence; no match ⇒ ('', '', whole) per pandas/cuDF."""
    c = _c(col)
    rpos = F.instr(F.reverse(c), sep[::-1])
    start = F.length(c) - rpos - len(sep) + 2  # 1-based start of last match
    return F.struct(
        F.when(rpos > 0, F.substring(c, F.lit(1), start - 1)).otherwise(F.lit("")).alias("head"),
        F.when(rpos > 0, F.lit(sep)).otherwise(F.lit("")).alias("sep"),
        F.when(rpos > 0, F.substring(c, start + len(sep), F.length(c))).otherwise(c).alias("tail"),
    )


def partition(col, sep: str) -> Column:
    """partition.hpp:58 — struct(head, sep, tail)."""
    c = _c(col)
    pos = F.instr(c, sep)
    return F.struct(
        F.when(pos > 0, F.substring(c, 1, pos - 1)).otherwise(c).alias("head"),
        F.when(pos > 0, F.lit(sep)).otherwise(F.lit("")).alias("sep"),
        F.when(pos > 0, F.substring(c, pos + len(sep), F.length(c))).otherwise(F.lit("")).alias("tail"),
    )


# --- character classes (char_types.hpp:93; string.py:1082-1722) --------

def isinteger(col) -> Column:
    return _c(col).rlike(r"^[+-]?[0-9]+$")


def isfloat(col) -> Column:
    return _c(col).rlike(r"^[+-]?([0-9]+\.?[0-9]*|\.[0-9]+)([eE][+-]?[0-9]+)?$")


def isdigit(col) -> Column:
    c = _c(col)
    return (F.length(c) > 0) & c.rlike(r"^[0-9]+$")


def isdecimal(col) -> Column:
    return isdigit(col)


def isnumeric(col) -> Column:
    return isdigit(col)


def isalpha(col) -> Column:
    c = _c(col)
    return (F.length(c) > 0) & c.rlike(r"^[\p{L}]+$")


def isalnum(col) -> Column:
    c = _c(col)
    return (F.length(c) > 0) & c.rlike(r"^[\p{L}0-9]+$")


def isspace(col) -> Column:
    c = _c(col)
    return (F.length(c) > 0) & c.rlike(r"^\s+$")


def isupper(col) -> Column:
    c = _c(col)
    return (F.length(c) > 0) & (c == F.upper(c)) & c.rlike(r"\p{L}")


def islower(col) -> Column:
    c = _c(col)
    return (F.length(c) > 0) & (c == F.lower(c)) & c.rlike(r"\p{L}")


def isempty(col) -> Column:
    return F.length(_c(col)) == 0


def isipv4(col) -> Column:
    octet = r"(25[0-5]|2[0-4][0-9]|1[0-9][0-9]|[1-9]?[0-9])"
    return _c(col).rlike(rf"^{octet}\.{octet}\.{octet}\.{octet}$")


def ishex(col) -> Column:
    return _c(col).rlike(r"^(0[xX])?[0-9a-fA-F]+$")


#: strptime directives → Spark datetime pattern letters (the subset the
#: reference's istimestamp grammar covers; convert_datetime.hpp:41)
_STRPTIME_TO_SPARK = {
    "%Y": "yyyy", "%y": "yy", "%m": "MM", "%d": "dd",
    "%H": "HH", "%M": "mm", "%S": "ss", "%f": "SSSSSS", "%j": "DDD",
}


def istimestamp(col, fmt: str = "%Y-%m-%d") -> Column:
    """str.istimestamp (string.py:1082 family) — does the string parse
    under the strptime-style format. Directives rewrite to Spark's
    pattern letters; LITERAL letters are quoted (an unquoted 'T' in an
    ISO format is a reserved pattern letter Spark rejects at runtime);
    an unsupported %-directive raises a clear error instead of leaking
    a raw letter into the pattern."""
    out = []
    i = 0
    while i < len(fmt):
        if fmt[i] == "%" and i + 1 < len(fmt):
            d = fmt[i : i + 2]
            if d == "%%":
                out.append("%")
            elif d in _STRPTIME_TO_SPARK:
                out.append(_STRPTIME_TO_SPARK[d])
            else:
                raise ValueError(
                    f"istimestamp: unsupported strptime directive {d!r} "
                    f"(supported: {sorted(_STRPTIME_TO_SPARK)})"
                )
            i += 2
        elif fmt[i].isalpha():
            j = i
            while j < len(fmt) and fmt[j].isalpha():
                j += 1
            out.append("'" + fmt[i:j] + "'")  # quote literal letter runs
            i = j
        else:
            out.append(fmt[i])
            i += 1
    return F.try_to_timestamp(_c(col), F.lit("".join(out))).isNotNull()


# --- conversions (convert_*.hpp) ---------------------------------------

def htoi(col) -> Column:
    """convert_ipv4.hpp:53 region — hex string to int."""
    return F.conv(_c(col), 16, 10).cast("long")


def ip2int(col) -> Column:
    c = _c(col)
    parts = F.split(c, r"\.")
    return (
        parts.getItem(0).cast("long") * 16777216
        + parts.getItem(1).cast("long") * 65536
        + parts.getItem(2).cast("long") * 256
        + parts.getItem(3).cast("long")
    )


def url_encode(col) -> Column:
    return F.url_encode(_c(col))


def url_decode(col) -> Column:
    return F.url_decode(_c(col))


def code_points(col) -> Column:
    """string.py:3955 — array of code points. Empty-string input yields
    [] (split('','') is [''], whose ascii would emit a spurious 0).
    BMP caveat: F.ascii reports UTF-16 units, so astral-plane chars
    come back as surrogate halves."""
    return F.transform(
        F.filter(F.split(_c(col), ""), lambda ch: ch != ""),
        lambda ch: F.ascii(ch),
    )


def translate(col, table: dict[str, str | None]) -> Column:
    """translate.hpp:55 — char map; deletions = chars mapped to None OR
    '' (both spellings delete — a '' value concatenated into the dst
    string would silently shift every later mapping's alignment).
    Values must be single characters (char-to-char map, like cuDF's
    code-point table)."""
    for k, v in table.items():
        if len(k) != 1 or (v not in (None, "") and len(v) != 1):
            raise ValueError(
                f"translate maps single characters; got {k!r} -> {v!r}"
            )
    keep_src = "".join(k for k, v in table.items() if v not in (None, ""))
    keep_dst = "".join(v for v in table.values() if v not in (None, ""))
    delete = "".join(k for k, v in table.items() if v in (None, ""))
    base = _c(col)
    if delete:
        base = F.translate(base, delete, "")
    return F.translate(base, keep_src, keep_dst) if keep_src else base


def filter_characters(col, keep_pattern: str) -> Column:
    """strings/translate.hpp filter_characters (string.py:4038) — keep
    only chars matching the class."""
    return F.regexp_replace(_c(col), f"[^{keep_pattern}]", "")


def filter_alphanum(col, repl: str = "") -> Column:
    """string.py:1928."""
    return F.regexp_replace(_c(col), r"[^\p{L}0-9]", repl)


def get_json_object(col, path: str) -> Column:
    """strings/json.hpp:116."""
    return F.get_json_object(_c(col), path)


def wrap(col, width: int) -> Column:
    """string.py:3199 — greedy wrap at width via regex insertion; the
    end-of-string branch's newline is stripped (pandas/cuDF wrap never
    appends a trailing newline)."""
    wrapped = F.regexp_replace(_c(col), rf"(.{{1,{width}}})( +|$)", "$1\n")
    return F.regexp_replace(wrapped, r"\n$", "")


def edit_distance(col, other) -> Column:
    """nvtext edit_distance.hpp:59 → levenshtein."""
    other_c = F.lit(other) if isinstance(other, str) else _c(other)
    return F.levenshtein(_c(col), other_c)


def character_tokenize(col) -> Column:
    """nvtext tokenize.hpp:175 character_tokenize — every character
    (whitespace included) as one token, per string."""
    return F.filter(F.split(_c(col), ""), lambda ch: ch != "")


def detokenize(col, sep: str = " ") -> Column:
    """nvtext tokenize.hpp:212 detokenize — reassemble a token array
    into one string."""
    return F.array_join(_c(col), sep)



