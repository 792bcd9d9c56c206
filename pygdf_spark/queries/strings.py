"""String-function queries (SURVEY.md §2.9-strings), built on the
``pygdf_spark.functions.strings`` compatibility layer (cuDF .str
accessor → codegen'd Spark expressions; see that module for file:line
parity citations). All JVM-side — no Python UDFs.
"""

from __future__ import annotations

from pyspark.sql import functions as F

import pygdf_spark.functions.strings as S
from pygdf_spark.queries._util import T


def str_basic_pack(spark, sf_dir):
    """len/byte_count/upper/lower/slice/get/pad/zfill/repeat/reverse/cat."""
    p = T(spark, sf_dir, "part").filter(F.col("p_partkey") < 300)
    return p.select(
        "p_partkey",
        S.len_("p_name").alias("name_len"),
        S.byte_count("p_name").alias("name_bytes"),
        S.upper("p_name").alias("name_upper"),
        S.capitalize("p_name").alias("name_cap"),
        S.slice_("p_name", 0, 5).alias("name_first5"),
        S.get("p_name", 2).alias("name_char2"),
        S.rjust("p_brand", 12, ".").alias("brand_rjust"),
        S.zfill(F.col("p_size").cast("string"), 4).alias("size_z"),
        S.repeat(S.get("p_brand", 0), 3).alias("b3"),
        S.reverse("p_brand").alias("brand_rev"),
        S.cat("p_brand", "p_type", sep="/").alias("brand_type"),
    ).orderBy("p_partkey")


STR_BASIC_SQL = """
SELECT p_partkey,
       LENGTH(p_name) AS name_len,
       octet_length(encode(p_name)) AS name_bytes,
       UPPER(p_name) AS name_upper,
       UPPER(SUBSTR(p_name,1,1)) || LOWER(SUBSTR(p_name,2)) AS name_cap,
       SUBSTR(p_name, 1, 5) AS name_first5,
       SUBSTR(p_name, 3, 1) AS name_char2,
       LPAD(p_brand, 12, '.') AS brand_rjust,
       LPAD(CAST(p_size AS VARCHAR), 4, '0') AS size_z,
       REPEAT(SUBSTR(p_brand,1,1), 3) AS b3,
       REVERSE(p_brand) AS brand_rev,
       p_brand || '/' || p_type AS brand_type
FROM part WHERE p_partkey < 300 ORDER BY p_partkey
"""


def str_find_pack(spark, sf_dir):
    """contains/startswith/endswith/find/rfind/instr (find.hpp family)."""
    p = T(spark, sf_dir, "part").filter(F.col("p_partkey") < 300)
    return p.select(
        "p_partkey",
        S.contains("p_name", "id", regex=False).alias("has_id"),
        S.startswith("p_type", "PRO").alias("is_promo"),
        S.endswith("p_name", "bolt").alias("is_bolt"),
        S.find("p_name", "e").alias("find_e"),
        S.rfind("p_name", "e").alias("rfind_e"),
        F.instr(F.col("p_name"), " ").alias("space_at"),
    ).orderBy("p_partkey")


STR_FIND_SQL = """
SELECT p_partkey,
       contains(p_name, 'id') AS has_id,
       starts_with(p_type, 'PRO') AS is_promo,
       ends_with(p_name, 'bolt') AS is_bolt,
       CAST(strpos(p_name, 'e') - 1 AS INT) AS find_e,
       CAST(CASE WHEN strpos(REVERSE(p_name), 'e') = 0 THEN -1
                 ELSE LENGTH(p_name) - strpos(REVERSE(p_name), 'e') END AS INT) AS rfind_e,
       CAST(strpos(p_name, ' ') AS INT) AS space_at
FROM part WHERE p_partkey < 300 ORDER BY p_partkey
"""


def str_regex_pack(spark, sf_dir):
    """extract/replace/count/match/findall-size (regex family)."""
    c = T(spark, sf_dir, "customer").filter(F.col("c_custkey") < 300)
    return c.select(
        "c_custkey",
        S.extract("c_name", r"#(\d+)", 1).alias("cust_num"),
        S.replace("c_name", r"0+", "0").alias("name_squeezed"),
        S.count_re("c_name", "0").cast("int").alias("n_zeros"),
        S.match("c_name", "Customer").alias("is_cust"),
        F.size(S.findall("c_name", r"[0-9]")).alias("n_digit_chars"),
        S.replace_with_backrefs("c_name", r"Customer#(\d{3})(\d+)", "$2@$1").alias("backref"),
    ).orderBy("c_custkey")


STR_REGEX_SQL = """
SELECT c_custkey,
       regexp_extract(c_name, '#(\\d+)', 1) AS cust_num,
       regexp_replace(c_name, '0+', '0', 'g') AS name_squeezed,
       CAST(len(regexp_extract_all(c_name, '0')) AS INT) AS n_zeros,
       regexp_matches(c_name, '^Customer') AS is_cust,
       CAST(len(regexp_extract_all(c_name, '[0-9]')) AS INT) AS n_digit_chars,
       regexp_replace(c_name, 'Customer#(\\d{3})(\\d+)', '\\2@\\1') AS backref
FROM customer WHERE c_custkey < 300 ORDER BY c_custkey
"""


def str_split_pack(spark, sf_dir):
    """split/partition (split.hpp:52, partition.hpp:58)."""
    p = T(spark, sf_dir, "part").filter(F.col("p_partkey") < 300)
    parts = S.split("p_name", " ")
    part3 = S.partition("p_brand", "#")
    return p.select(
        "p_partkey",
        parts.getItem(0).alias("word0"),
        parts.getItem(1).alias("word1"),
        F.size(parts).alias("n_words"),
        part3.getField("head").alias("brand_head"),
        part3.getField("tail").alias("brand_tail"),
    ).orderBy("p_partkey")


STR_SPLIT_SQL = """
SELECT p_partkey,
       string_split_regex(p_name, '\\s+')[1] AS word0,
       string_split_regex(p_name, '\\s+')[2] AS word1,
       CAST(len(string_split_regex(p_name, '\\s+')) AS INT) AS n_words,
       string_split(p_brand, '#')[1] AS brand_head,
       string_split(p_brand, '#')[2] AS brand_tail
FROM part WHERE p_partkey < 300 ORDER BY p_partkey
"""


def str_is_pack(spark, sf_dir):
    """character-class predicates (char_types.hpp:93)."""
    p = T(spark, sf_dir, "part").filter(F.col("p_partkey") < 300)
    num = S.extract("p_brand", r"#(\d+)", 1)
    return p.select(
        "p_partkey",
        S.isdigit(num).alias("num_isdigit"),
        S.isalpha(S.slice_("p_type", 0, 3)).alias("type_isalpha"),
        S.isalnum(S.replace("p_name", " ", "", regex=False)).alias("name_isalnum"),
        S.isempty(S.extract("p_name", r"(zzz)", 1)).alias("no_zzz"),
        S.isinteger(num).alias("num_isint"),
        S.isupper("p_type").alias("type_isupper"),
        S.islower("p_name").alias("name_islower"),
    ).orderBy("p_partkey")


STR_IS_SQL = """
SELECT p_partkey,
       regexp_matches(regexp_extract(p_brand, '#(\\d+)', 1), '^[0-9]+$') AS num_isdigit,
       regexp_matches(SUBSTR(p_type,1,3), '^[A-Za-z]+$') AS type_isalpha,
       regexp_matches(REPLACE(p_name, ' ', ''), '^[A-Za-z0-9]+$') AS name_isalnum,
       LENGTH(regexp_extract(p_name, '(zzz)', 1)) = 0 AS no_zzz,
       regexp_matches(regexp_extract(p_brand, '#(\\d+)', 1), '^[+-]?[0-9]+$') AS num_isint,
       LENGTH(p_type) > 0 AND p_type = UPPER(p_type) AND regexp_matches(p_type, '[A-Za-z]') AS type_isupper,
       LENGTH(p_name) > 0 AND p_name = LOWER(p_name) AND regexp_matches(p_name, '[A-Za-z]') AS name_islower
FROM part WHERE p_partkey < 300 ORDER BY p_partkey
"""


def str_translate_strip(spark, sf_dir):
    """translate (translate.hpp:55) / filter_characters / strip family."""
    c = T(spark, sf_dir, "customer").filter(F.col("c_custkey") < 300)
    return c.select(
        "c_custkey",
        S.translate("c_name", {"0": "o", "#": None}).alias("name_tr"),
        S.filter_characters("c_name", "0-9").alias("digits_only"),
        S.strip(S.rjust("c_name", 25, "x"), "x").alias("restrip"),
        S.lstrip("c_name", "Cust").alias("lstripped"),
        S.rstrip("c_name", "0123456789").alias("rstripped"),
    ).orderBy("c_custkey")


STR_TRANSLATE_SQL = """
SELECT c_custkey,
       translate(REPLACE(c_name, '#', ''), '0', 'o') AS name_tr,
       regexp_replace(c_name, '[^0-9]', '', 'g') AS digits_only,
       trim(LPAD(c_name, 25, 'x'), 'x') AS restrip,
       regexp_replace(c_name, '^[Cust]+', '') AS lstripped,
       regexp_replace(c_name, '[0123456789]+$', '') AS rstripped
FROM customer WHERE c_custkey < 300 ORDER BY c_custkey
"""


def str_json_pack(spark, sf_dir):
    """get_json_object (strings/json.hpp:116) over events.props."""
    e = T(spark, sf_dir, "events")
    k = S.get_json_object("props", "$.k")
    return (
        e.select("event_id", k.cast("int").alias("k"))
        .groupBy((F.col("k") % 10).alias("k_mod"))
        .agg(F.count(F.lit(1)).alias("n"), F.sum("k").alias("sum_k"))
        .orderBy("k_mod")
    )


STR_JSON_SQL = """
SELECT CAST(json_extract_string(props, '$.k') AS INT) % 10 AS k_mod,
       COUNT(*) AS n, CAST(SUM(CAST(json_extract_string(props, '$.k') AS INT)) AS BIGINT) AS sum_k
FROM events GROUP BY 1 ORDER BY k_mod
"""


def str_distance(spark, sf_dir):
    """nvtext edit_distance (edit_distance.hpp:59) → levenshtein."""
    o = T(spark, sf_dir, "orders")
    return (
        o.select("o_orderpriority").distinct()
        .select(
            "o_orderpriority",
            S.edit_distance("o_orderpriority", "1-URGENT").alias("dist_urgent"),
            S.len_("o_orderpriority").alias("len"),
        )
        .orderBy("o_orderpriority")
    )


STR_DISTANCE_SQL = """
SELECT o_orderpriority, levenshtein(o_orderpriority, '1-URGENT') AS dist_urgent,
       LENGTH(o_orderpriority) AS len
FROM (SELECT DISTINCT o_orderpriority FROM orders) ORDER BY o_orderpriority
"""


def str_rsplit_pack(spark, sf_dir):
    """rsplit/rpartition (split.hpp:229, partition.hpp:90), center/insert
    (padding.hpp:64, string.py:2010), istimestamp (string.py:1082
    family), character_tokenize/detokenize (nvtext tokenize.hpp:175,212)."""
    p = T(spark, sf_dir, "part").filter(
        (F.col("p_partkey") < 300) & F.col("p_name").contains(" ")
    )
    rp = S.rpartition("p_type", " ")
    datestr = F.concat(
        F.lit("2024-01-"), F.lpad((F.col("p_partkey") % 40).cast("string"), 2, "0")
    )
    # rsplit's reverse-transform HOF is staged once; two inline getItem
    # references would run it twice per row
    p = p.withColumn("__rs", S.rsplit("p_name", " ", 2))
    return p.select(
        "p_partkey",
        F.col("__rs").getItem(0).alias("rs_head"),
        F.col("__rs").getItem(1).alias("rs_last"),
        rp.getField("head").alias("rp_head"),
        rp.getField("tail").alias("rp_tail"),
        S.center("p_brand", 12, "*").alias("brand_center"),
        S.insert("p_brand", 5, "-XYZ").alias("brand_insert"),
        S.istimestamp(datestr, "%Y-%m-%d").alias("is_ts"),
        F.size(S.character_tokenize("p_name")).alias("n_chars"),
        S.detokenize(F.split(F.col("p_name"), " "), "_").alias("detok"),
    ).orderBy("p_partkey")


STR_RSPLIT_SQL = """
SELECT p_partkey,
       regexp_replace(p_name, ' [^ ]*$', '') AS rs_head,
       regexp_extract(p_name, '[^ ]*$') AS rs_last,
       CASE WHEN p_type LIKE '% %'
            THEN regexp_replace(p_type, ' [^ ]*$', '') ELSE '' END AS rp_head,
       regexp_extract(p_type, '[^ ]*$') AS rp_tail,
       rpad(lpad(p_brand,
                 CAST(length(p_brand) + GREATEST((12 - length(p_brand)) // 2, 0) AS INT),
                 '*'), 12, '*') AS brand_center,
       substr(p_brand, 1, 5) || '-XYZ' || substr(p_brand, 6) AS brand_insert,
       try_strptime('2024-01-' || lpad(CAST(p_partkey % 40 AS VARCHAR), 2, '0'),
                    '%Y-%m-%d') IS NOT NULL AS is_ts,
       CAST(length(p_name) AS INT) AS n_chars,
       replace(p_name, ' ', '_') AS detok
FROM part WHERE p_partkey < 300 AND p_name LIKE '% %' ORDER BY p_partkey
"""


def str_like_pack(spark, sf_dir):
    """SQL pattern matching family (strings/contains.hpp like();
    cuDF Series.str.like): LIKE with %/_ wildcards, case-insensitive
    ILIKE, a custom ESCAPE char on a derived underscore column, NOT
    LIKE, and startswith/endswith as the degenerate patterns. Pure
    row-level predicates — whole-stage codegen, trivially partitionable."""
    p = T(spark, sf_dir, "part").filter(F.col("p_partkey") < 400)
    return p.select(
        "p_partkey",
        F.col("p_name").like("%o_i%").cast("int").alias("like_oXi"),
        F.col("p_name").ilike("%BLUSH%").cast("int").alias("ilike_blush"),
        F.col("p_name").like("almond%").cast("int").alias("starts_almond"),
        F.col("p_name").like("%ivory").cast("int").alias("ends_ivory"),
        (~F.col("p_name").like("%e%")).cast("int").alias("not_like_e"),
        F.expr("replace(p_name, ' ', '_') LIKE '%!_rose%' ESCAPE '!'")
        .cast("int").alias("esc_underscore_rose"),
    ).orderBy("p_partkey")


STR_LIKE_SQL = """
SELECT p_partkey,
       CAST(p_name LIKE '%o_i%' AS INT) AS like_oXi,
       CAST(p_name ILIKE '%BLUSH%' AS INT) AS ilike_blush,
       CAST(p_name LIKE 'almond%' AS INT) AS starts_almond,
       CAST(p_name LIKE '%ivory' AS INT) AS ends_ivory,
       CAST(p_name NOT LIKE '%e%' AS INT) AS not_like_e,
       CAST(replace(p_name, ' ', '_') LIKE '%!_rose%' ESCAPE '!' AS INT) AS esc_underscore_rose
FROM part WHERE p_partkey < 400 ORDER BY p_partkey
"""


QUERIES = {
    "str_like_pack": str_like_pack,
    "str_rsplit_pack": str_rsplit_pack,
    "str_basic_pack": str_basic_pack,
    "str_find_pack": str_find_pack,
    "str_regex_pack": str_regex_pack,
    "str_split_pack": str_split_pack,
    "str_is_pack": str_is_pack,
    "str_translate_strip": str_translate_strip,
    "str_json_pack": str_json_pack,
    "str_distance": str_distance,
}

ORACLE = {
    "str_like_pack": STR_LIKE_SQL,
    "str_rsplit_pack": STR_RSPLIT_SQL,
    "str_basic_pack": STR_BASIC_SQL,
    "str_find_pack": STR_FIND_SQL,
    "str_regex_pack": STR_REGEX_SQL,
    "str_split_pack": STR_SPLIT_SQL,
    "str_is_pack": STR_IS_SQL,
    "str_translate_strip": STR_TRANSLATE_SQL,
    "str_json_pack": STR_JSON_SQL,
    "str_distance": STR_DISTANCE_SQL,
}
