"""String scalar-function coverage — libcudf strings namespace
(cpp/src/strings/, 20,343 LoC; SURVEY §2.8) re-expressed with
``pyspark.sql.functions`` plus the shims in cudf_spark.functions.strings.

Everything stays JVM-side (codegen); regex patterns restricted to the
Java ∩ RE2 common dialect (libcudf has its own regex engine,
cpp/src/strings/regex/ — SURVEY §7 hard-part 5).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from cudf_spark.catalog import load
from cudf_spark.functions.hashing import hash60, hash60_sql
from cudf_spark.functions.strings import swapcase, title, zfill
from cudf_spark.queries.registry import register


@register(
    "str_basic",
    oracle="""
    SELECT p_partkey,
           upper(p_name)                         AS uname,
           lower(p_brand)                        AS lbrand,
           length(p_name)                        AS len,
           substr(p_name, 1, 4)                  AS prefix,
           concat_ws('-', p_brand, p_type)       AS label,
           reverse(p_name)                       AS rname,
           repeat(p_type, 2)                     AS twice,
           lpad(CAST(p_size AS VARCHAR), 5, '0') AS padded,
           trim(concat(' ', p_name, ' '))        AS trimmed,
           translate(p_name, 'aeiou', 'AEIOU')   AS voweled
    FROM part ORDER BY p_partkey
    """,
    doc="case/length/slice/concat/pad/strip/translate/repeat/reverse "
    "(strings/case.hpp, slice.hpp, combine.hpp, padding.hpp, strip.hpp, "
    "translate.hpp, repeat_strings.hpp, reverse.hpp).",
)
def str_basic(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = load(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        F.upper("p_name").alias("uname"),
        F.lower("p_brand").alias("lbrand"),
        F.length("p_name").alias("len"),
        F.substring("p_name", 1, 4).alias("prefix"),
        F.concat_ws("-", "p_brand", "p_type").alias("label"),
        F.reverse("p_name").alias("rname"),
        F.repeat("p_type", 2).alias("twice"),
        F.lpad(F.col("p_size").cast("string"), 5, "0").alias("padded"),
        F.trim(F.concat(F.lit(" "), F.col("p_name"), F.lit(" "))).alias("trimmed"),
        F.translate("p_name", "aeiou", "AEIOU").alias("voweled"),
    ).orderBy("p_partkey")


@register(
    "str_case_shims",
    oracle="""
    SELECT p_partkey,
           array_to_string(list_transform(string_split(p_name, ' '),
               w -> upper(w[1:1]) || lower(w[2:])), ' ')                   AS titled,
           array_to_string(list_transform(string_split(p_brand, ''),
               c -> CASE WHEN upper(c) = c THEN lower(c) ELSE upper(c) END), '') AS swapped,
           CASE WHEN length(CAST(p_size - 25 AS VARCHAR)) >= 6
                THEN CAST(p_size - 25 AS VARCHAR)
                WHEN substr(CAST(p_size - 25 AS VARCHAR), 1, 1) IN ('-', '+')
                THEN substr(CAST(p_size - 25 AS VARCHAR), 1, 1) ||
                     lpad(substr(CAST(p_size - 25 AS VARCHAR), 2), 5, '0')
                ELSE lpad(CAST(p_size - 25 AS VARCHAR), 6, '0') END        AS zfilled
    FROM part ORDER BY p_partkey
    """,
    doc="title (capitalize.hpp:53), swapcase (case.hpp), sign-aware zfill "
    "(padding.hpp:82) — pure-expression shims, no UDFs.",
)
def str_case_shims(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = load(spark, sf_dir, "part")
    signed = (F.col("p_size") - 25).cast("string")
    return p.select(
        "p_partkey",
        title(F.col("p_name")).alias("titled"),
        swapcase(F.col("p_brand")).alias("swapped"),
        zfill(signed, 6).alias("zfilled"),
    ).orderBy("p_partkey")


@register(
    "str_find",
    oracle="""
    SELECT p_partkey,
           starts_with(p_name, 'small')      AS sw,
           ends_with(p_name, 'bolt')         AS ew,
           contains(p_name, 'wid')           AS has_wid,
           instr(p_name, 'o')                AS pos_o,
           p_name LIKE '%bo%'                AS like_bo
    FROM part ORDER BY p_partkey
    """,
    doc="find/contains/starts/ends (strings/find.hpp) + LIKE (contains.hpp:155).",
)
def str_find(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = load(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        F.startswith(F.col("p_name"), F.lit("small")).alias("sw"),
        F.endswith(F.col("p_name"), F.lit("bolt")).alias("ew"),
        F.contains(F.col("p_name"), F.lit("wid")).alias("has_wid"),
        F.instr(F.col("p_name"), "o").alias("pos_o"),
        F.col("p_name").like("%bo%").alias("like_bo"),
    ).orderBy("p_partkey")


@register(
    "str_regex",
    oracle="""
    SELECT doc_id,
           regexp_extract(text, '([a-z]+)', 1)            AS first_word,
           len(regexp_extract_all(text, 'scan'))          AS n_scan,
           regexp_matches(text, 'join.*merge')            AS has_jm,
           regexp_replace(substr(text, 1, 40), '[aeiou]', '_', 'g') AS devoweled
    FROM documents ORDER BY doc_id
    """,
    doc="regex extract/count/matches/replace (strings/extract.hpp:54, "
    "contains.hpp:50, replace_re.hpp:48) — common Java∩RE2 dialect only.",
)
def str_regex(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        F.regexp_extract("text", r"([a-z]+)", 1).alias("first_word"),
        F.size(F.regexp_extract_all("text", F.lit("scan"), 0)).alias("n_scan"),
        F.col("text").rlike("join.*merge").alias("has_jm"),
        F.regexp_replace(F.substring("text", 1, 40), "[aeiou]", "_").alias("devoweled"),
    ).orderBy("doc_id")


@register(
    "str_split",
    oracle="""
    SELECT doc_id,
           len(string_split(text, ' '))                          AS n_tokens,
           split_part(text, ' ', 2)                              AS second_tok,
           array_to_string((string_split(text, ' '))[1:5], '|')  AS first5
    FROM documents ORDER BY doc_id
    """,
    doc="split/split_part/slice-join (strings/split/split.hpp:47, "
    "partition.hpp; lists slice via F.slice).",
)
def str_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents")
    toks = F.split("text", " ")
    return d.select(
        "doc_id",
        F.size(toks).alias("n_tokens"),
        F.split_part(F.col("text"), F.lit(" "), F.lit(2)).alias("second_tok"),
        F.array_join(F.slice(toks, 1, 5), "|").alias("first5"),
    ).orderBy("doc_id")


@register(
    "str_levenshtein",
    oracle="""
    SELECT a.p_partkey AS k1, b.p_partkey AS k2,
           levenshtein(a.p_name, b.p_name) AS dist
    FROM part a JOIN part b ON b.p_partkey = a.p_partkey + 1
    ORDER BY k1
    """,
    doc="edit distance (nvtext/edit_distance.hpp:52) — Spark builtin "
    "levenshtein.",
)
def str_levenshtein(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = load(spark, sf_dir, "part")
    a, b = p.alias("a"), p.alias("b")
    return (
        a.join(b, F.col("b.p_partkey") == F.col("a.p_partkey") + 1)
        .select(
            F.col("a.p_partkey").alias("k1"),
            F.col("b.p_partkey").alias("k2"),
            F.levenshtein(F.col("a.p_name"), F.col("b.p_name")).alias("dist"),
        )
        .orderBy("k1")
    )


@register(
    "str_hashing",
    oracle=f"""
    SELECT c_custkey,
           md5(c_name)                    AS h_md5,
           sha256(c_name)                 AS h_sha256,
           {hash60_sql('c_name', seed=7)} AS h60
    FROM customer ORDER BY c_custkey
    """,
    doc="hash functions (hashing.hpp:87 md5, :101 sha256) + the md5-derived "
    "60-bit cross-engine hash used by minhash dedup. Spark F.hash IS "
    "murmur3_x86_32 (hashing.hpp:53) and F.xxhash64 matches :194 — asserted "
    "in pytest, not oracle-comparable (DuckDB lacks them).",
)
def str_hashing(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load(spark, sf_dir, "customer")
    return c.select(
        "c_custkey",
        F.md5("c_name").alias("h_md5"),
        F.sha2(F.col("c_name"), 256).alias("h_sha256"),
        hash60(F.col("c_name"), seed=7).alias("h60"),
    ).orderBy("c_custkey")


@register(
    "str_casts",
    oracle="""
    SELECT p_partkey,
           CAST(CAST(p_retailprice AS VARCHAR) AS DOUBLE)     AS roundtrip,
           -- mirror try_to_number(name, '999'): the format accepts ONLY
           -- 1-3 bare digits (no sign/decimal/4+ digits), while a plain
           -- try_cast would accept '1234' and round '12.5'
           CASE WHEN regexp_matches(p_name, '^[0-9]{1,3}$')
                THEN CAST(p_name AS INT) END                  AS bad_int,
           CAST(try_cast(CAST(p_size AS VARCHAR) AS INT) IS NOT NULL AS BOOLEAN) AS is_int,
           CAST(('0x' || lpad(CAST(p_size AS VARCHAR), 2, '0')) AS BIGINT) AS from_hexish
    FROM part ORDER BY p_partkey
    """,
    doc="string<->numeric casts + is_integer validation "
    "(strings/convert/convert_integers.hpp, convert_floats.hpp) via "
    "try_cast idiom; hex via conv.",
)
def str_casts(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = load(spark, sf_dir, "part")
    size_str = F.col("p_size").cast("string")
    return p.select(
        "p_partkey",
        F.col("p_retailprice").cast("string").cast("double").alias("roundtrip"),
        F.try_to_number(F.col("p_name"), F.lit("999")).cast("int").alias("bad_int"),
        F.try_to_number(size_str, F.lit("99")).isNotNull().alias("is_int"),
        F.conv(F.lpad(size_str, 2, "0"), 16, 10).cast("long").alias("from_hexish"),
    ).orderBy("p_partkey")


@register(
    "str_json",
    oracle="""
    SELECT event_id,
           CAST(json_extract_string(props, '$.k') AS INT) AS k,
           json_extract_string(props, '$.missing')        AS missing
    FROM events ORDER BY event_id
    """,
    doc="JSONPath extraction (cpp/include/cudf/json/json.hpp:158 "
    "get_json_object) — exact Spark builtin match.",
)
def str_json(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load(spark, sf_dir, "events")
    return e.select(
        "event_id",
        F.get_json_object("props", "$.k").cast("int").alias("k"),
        F.get_json_object("props", "$.missing").alias("missing"),
    ).orderBy("event_id")


@register(
    "str_ipv4",
    oracle="""
    SELECT p_partkey,
           CAST((p_partkey * 7919) % 4294967296 // 16777216 AS VARCHAR) || '.' ||
           CAST(((p_partkey * 7919) % 16777216) // 65536 AS VARCHAR) || '.' ||
           CAST(((p_partkey * 7919) % 65536) // 256 AS VARCHAR) || '.' ||
           CAST((p_partkey * 7919) % 256 AS VARCHAR)              AS ip_str,
           (p_partkey * 7919) % 4294967296                         AS ip_int
    FROM part ORDER BY p_partkey
    """,
    doc="integers_to_ipv4 (strings/convert/convert_ipv4.hpp) — octet "
    "decomposition as pure integer arithmetic.",
)
def str_ipv4(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = load(spark, sf_dir, "part")
    ip = (F.col("p_partkey") * 7919) % F.lit(4294967296)
    ip_str = F.concat_ws(
        ".",
        (ip / 16777216).cast("long").cast("string"),
        ((ip % 16777216) / 65536).cast("long").cast("string"),
        ((ip % 65536) / 256).cast("long").cast("string"),
        (ip % 256).cast("string"),
    )
    return p.select("p_partkey", ip_str.alias("ip_str"), ip.alias("ip_int")).orderBy("p_partkey")


@register(
    "str_bytes_base64",
    oracle="""
    SELECT c_custkey,
           base64(encode(c_name))        AS b64,
           octet_length(encode(c_name))  AS n_bytes
    FROM customer ORDER BY c_custkey
    """,
    doc="byte_cast / binary round-trip (reshape.hpp:99 byte_cast; "
    "strings code_points) — utf8 encode + base64 + byte length.",
)
def str_bytes_base64(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load(spark, sf_dir, "customer")
    return c.select(
        "c_custkey",
        F.base64(F.encode(F.col("c_name"), "UTF-8")).alias("b64"),
        F.octet_length(F.col("c_name")).alias("n_bytes"),
    ).orderBy("c_custkey")


@register(
    "str_url",
    oracle="""
    SELECT p_partkey,
           array_to_string(list_transform(
               string_split(p_name || '/q?x=' || CAST(p_partkey AS VARCHAR), ''),
               c -> CASE WHEN c = ' ' THEN '+'
                         WHEN regexp_matches(c, '^[a-zA-Z0-9.*_-]$') THEN c
                         -- one '%' PER UTF-8 BYTE: a multi-byte char
                         -- must encode '%C3%A9', not '%C3A9'
                         ELSE regexp_replace(upper(hex(encode(c))),
                                             '(..)', '%\\1', 'g') END), '') AS enc,
           p_name || '/q?x=' || CAST(p_partkey AS VARCHAR)           AS dec
    FROM part ORDER BY p_partkey
    """,
    doc="url_encode/url_decode (strings/convert/convert_urls.hpp) — Spark "
    "3.5+ builtins; DuckDB 1.0 lacks url_encode, so the oracle replays "
    "java URLEncoder semantics (space→'+', [a-zA-Z0-9.*_-] kept, %XX "
    "upper-hex otherwise) per character. Decode closes the round-trip.",
)
def str_url(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = load(spark, sf_dir, "part")
    s = F.concat(F.col("p_name"), F.lit("/q?x="), F.col("p_partkey").cast("string"))
    enc = F.url_encode(s)
    return p.select(
        "p_partkey", enc.alias("enc"), F.url_decode(enc).alias("dec")
    ).orderBy("p_partkey")


WRAP_W = 12
FM_TARGETS = ("lavender", "spring", "metallic")


@register(
    "str_wrap_find_multiple",
    oracle=f"""
    WITH w AS (
        SELECT p_partkey, p_name,
               regexp_replace(p_name, '(.{{1,{WRAP_W}}}) ',
                              '\\1' || chr(10), 'g') AS wrapped
        FROM part)
    SELECT p_partkey,
           CAST(len(string_split(wrapped, chr(10))) AS BIGINT)       AS n_lines,
           CAST(list_max(list_transform(string_split(wrapped, chr(10)),
                                        x -> length(x))) AS BIGINT)  AS max_line,
           string_split(wrapped, chr(10))[1]                          AS line1,
           {" || '|' || ".join(
               f"CAST(strpos(p_name, '{t}') - 1 AS VARCHAR)" for t in FM_TARGETS
           )}                                                         AS find_pos,
           regexp_replace(p_name, '[^a-m ]', '', 'g')                 AS filtered
    FROM w ORDER BY p_partkey
    """,
    doc="three reference string APIs in one pass: wrap "
    "(strings/wrap.hpp — greedy line fill at width "
    f"{WRAP_W}, whitespace becomes the break, words never split; "
    "reported as line count / max line length / first line, which pins "
    "the exact break positions without embedding newlines in the "
    "output), find_multiple (strings/find_multiple.hpp — first 0-based "
    "occurrence of each target, -1 when absent, '|'-joined per the "
    "scalar output contract), and filter_characters "
    "(strings/translate.hpp:filter_characters — keep only [a-m ]). All "
    "map-only whole-stage-codegen projections; the wrap regex "
    "'(.{1,W}) ' produces identical greedy fills under Java regex and "
    "RE2 (both Perl-greedy for bounded quantifiers).",
)
def str_wrap_find_multiple(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = load(spark, sf_dir, "part")
    wrapped = F.regexp_replace("p_name", f"(.{{1,{WRAP_W}}}) ", "$1\n")
    lines = F.split(wrapped, "\n")
    find_pos = F.concat_ws(
        "|",
        *[(F.instr("p_name", t) - 1).cast("string") for t in FM_TARGETS],
    )
    return p.select(
        "p_partkey",
        F.size(lines).cast("bigint").alias("n_lines"),
        F.array_max(F.transform(lines, F.length)).cast("bigint").alias("max_line"),
        F.element_at(lines, 1).alias("line1"),
        find_pos.alias("find_pos"),
        F.regexp_replace("p_name", "[^a-m ]", "").alias("filtered"),
    ).orderBy("p_partkey")
