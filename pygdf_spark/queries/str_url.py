"""URL conversion + wrap queries (SURVEY.md §2.9-strings:
url_encode/url_decode convert_urls.hpp:44,65 / string.py:3894,3924;
wrap string.py:3199).

DuckDB has no url_encode, so the encode expectations are golden VALUES
(standard form-urlencoding, independently verifiable); the decode is
checked as a computed round-trip and wrap is the same regex evaluated
by both engines.
"""

from __future__ import annotations

from pyspark.sql import functions as F

_ROWS = [
    (1, "a b&c"),
    (2, "hello/world?x=1"),
    (3, "100% sure"),
    (4, "plain"),
    (5, "key=val&k2=v 2"),
]

_GOLDEN_ENC = {
    1: "a+b%26c",
    2: "hello%2Fworld%3Fx%3D1",
    3: "100%25+sure",
    4: "plain",
    5: "key%3Dval%26k2%3Dv+2",
}


def str_url_wrap_pack(spark, sf_dir):
    df = spark.createDataFrame(_ROWS, "id int, s string")
    enc = F.url_encode("s")
    return df.select(
        "id",
        "s",
        enc.alias("enc"),
        F.url_decode(enc).alias("roundtrip"),
        F.regexp_replace("s", "(.{1,8}) +", "$1\n").alias("wrapped"),
    ).orderBy("id")


_VALUES = ", ".join(
    f"({i}, '{s.replace(chr(39), chr(39) * 2)}', '{_GOLDEN_ENC[i]}')" for i, s in _ROWS
)

STR_URL_WRAP_SQL = rf"""
SELECT id, s, enc, s AS roundtrip,
       regexp_replace(s, '(.{{1,8}}) +', '\1' || chr(10), 'g') AS wrapped
FROM (VALUES {_VALUES}) t(id, s, enc)
ORDER BY id
"""


QUERIES = {"str_url_wrap_pack": str_url_wrap_pack}
ORACLE = {"str_url_wrap_pack": STR_URL_WRAP_SQL}
