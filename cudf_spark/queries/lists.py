"""List/array and struct scalar-function coverage — libcudf lists namespace
(cpp/src/lists/, 4,776 LoC; cpp/src/structs/; SURVEY §2.10). Spark's
ArrayType + higher-order functions are near-exact matches.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from cudf_spark.catalog import load
from cudf_spark.queries.registry import register

TOKENS = "string_split(text, ' ')"  # DuckDB-side tokenization


@register(
    "list_embedding_ops",
    oracle="""
    SELECT vec_id,
           len(embedding)                                   AS dim,
           round(CAST(embedding[1] AS DOUBLE), 6)           AS first_el,
           round(list_sum(list_transform(embedding,
                 x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))), 4) AS sq_norm,
           round(CAST(list_max(embedding) AS DOUBLE), 6)    AS max_el,
           round(CAST(list_min(embedding) AS DOUBLE), 6)    AS min_el
    FROM embeddings ORDER BY vec_id
    """,
    doc="count_elements (lists/count_elements.hpp:45), extract_list_element "
    "(extract.hpp:59), reduction over list (F.aggregate — the Spark analogue "
    "of segmented reductions, reduction.hpp:175).",
)
def list_embedding_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load(spark, sf_dir, "embeddings")
    sq = F.aggregate(
        F.col("embedding"),
        F.lit(0.0),
        lambda acc, x: acc + x.cast("double") * x.cast("double"),
    )
    return e.select(
        "vec_id",
        F.size("embedding").alias("dim"),
        F.round(F.element_at("embedding", 1).cast("double"), 6).alias("first_el"),
        F.round(sq, 4).alias("sq_norm"),
        F.round(F.array_max("embedding").cast("double"), 6).alias("max_el"),
        F.round(F.array_min("embedding").cast("double"), 6).alias("min_el"),
    ).orderBy("vec_id")


@register(
    "list_setops_pairs",
    oracle=f"""
    SELECT a.doc_id AS d1, b.doc_id AS d2,
           len(list_distinct(list_intersect({TOKENS.replace('text','a.text')},
                                            {TOKENS.replace('text','b.text')}))) AS n_common,
           len(list_distinct(list_concat({TOKENS.replace('text','a.text')},
                                         {TOKENS.replace('text','b.text')})))    AS n_union,
           len(list_distinct(list_filter({TOKENS.replace('text','a.text')},
                 x -> NOT list_contains({TOKENS.replace('text','b.text')}, x)))) AS n_only_a
    FROM documents a JOIN documents b ON b.doc_id = a.doc_id + 1
    ORDER BY d1
    """,
    doc="per-row list set ops (lists/set_operations.hpp:52-163: "
    "intersect_distinct, union_distinct, difference_distinct) → "
    "array_intersect/union/except sizes.",
)
def list_setops_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents")
    a = d.select(F.col("doc_id").alias("d1"), F.split("text", " ").alias("ta"))
    b = d.select(F.col("doc_id").alias("d2"), F.split("text", " ").alias("tb"))
    return (
        a.join(b, b.d2 == a.d1 + 1)
        .select(
            "d1",
            "d2",
            F.size(F.array_intersect("ta", "tb")).alias("n_common"),
            F.size(F.array_union("ta", "tb")).alias("n_union"),
            F.size(F.array_except("ta", "tb")).alias("n_only_a"),
        )
        .orderBy("d1")
    )


@register(
    "list_explode_tokens",
    oracle=f"""
    SELECT tok, count(*) AS freq
    FROM (SELECT unnest({TOKENS}) AS tok FROM documents)
    WHERE tok != ''
    GROUP BY tok
    ORDER BY freq DESC, tok
    LIMIT 20
    """,
    doc="explode (lists/explode.hpp:64) → token frequency; the scatter side "
    "of tokenize (nvtext/tokenize.hpp:51).",
)
def list_explode_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents")
    return (
        d.select(F.explode(F.split("text", " ")).alias("tok"))
        .filter(F.col("tok") != "")
        .groupBy("tok")
        .agg(F.count("*").alias("freq"))
        .orderBy(F.desc("freq"), "tok")
        .limit(20)
    )


@register(
    "list_posexplode",
    oracle=f"""
    SELECT d.doc_id, g.i - 1 AS pos, (string_split(d.text, ' '))[g.i] AS tok
    FROM documents d,
         (SELECT unnest(generate_series(1, 5)) AS i) g
    WHERE d.doc_id < 10 AND g.i <= len(string_split(d.text, ' '))
    ORDER BY d.doc_id, pos
    """,
    doc="explode_position (lists/explode.hpp:110) → posexplode (0-based).",
)
def list_posexplode(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents").filter(F.col("doc_id") < 10)
    return (
        d.select("doc_id", F.posexplode(F.slice(F.split("text", " "), 1, 5)).alias("pos", "tok"))
        .orderBy("doc_id", "pos")
    )


@register(
    "list_fill_sequence",
    oracle="""
    SELECT doc_id,
           array_to_string(list_transform(generate_series(1, 1 + n_chars % 5),
                                          i -> CAST(i AS VARCHAR)), ',') AS seq_str,
           array_to_string(list_transform(generate_series(1, 1 + doc_id % 3),
                                          i -> lang), ',')               AS repeated
    FROM documents ORDER BY doc_id
    """,
    doc="sequences (lists/filling.hpp:59) + repeat (filling.hpp:117 / "
    "array_repeat).",
)
def list_fill_sequence(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents")
    seq = F.sequence(F.lit(1), (F.lit(1) + F.col("n_chars") % 5).cast("int"))
    rep = F.array_repeat(F.col("lang"), (F.lit(1) + F.col("doc_id") % 3).cast("int"))
    return d.select(
        "doc_id",
        F.array_join(F.transform(seq, lambda i: i.cast("string")), ",").alias("seq_str"),
        F.array_join(rep, ",").alias("repeated"),
    ).orderBy("doc_id")


@register(
    "list_sort_distinct",
    oracle=f"""
    SELECT doc_id,
           array_to_string(list_sort(list_distinct({TOKENS}))[1:8], ',')   AS sorted8,
           array_to_string(list_reverse_sort(list_distinct({TOKENS}))[1:3], ',') AS top3_rev,
           len(list_distinct({TOKENS}))                                    AS n_distinct,
           list_contains({TOKENS}, 'the')                                  AS has_the,
           coalesce(list_position({TOKENS}, 'scan'), 0)                    AS pos_scan
    FROM documents ORDER BY doc_id
    """,
    doc="sort_lists (lists/sorting.hpp:48), distinct (stream_compaction.hpp:119), "
    "reverse (reverse.hpp:43), contains/index_of (contains.hpp:42-168).",
)
def list_sort_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents")
    toks = F.split("text", " ")
    dd = F.array_distinct(toks)
    return d.select(
        "doc_id",
        F.array_join(F.slice(F.array_sort(dd), 1, 8), ",").alias("sorted8"),
        F.array_join(F.slice(F.reverse(F.array_sort(dd)), 1, 3), ",").alias("top3_rev"),
        F.size(dd).alias("n_distinct"),
        F.array_contains(toks, "the").alias("has_the"),
        F.array_position(toks, "scan").cast("int").alias("pos_scan"),
    ).orderBy("doc_id")


@register(
    "list_higher_order",
    oracle=f"""
    SELECT doc_id,
           len(list_filter({TOKENS}, t -> length(t) > 4))                    AS n_long,
           array_to_string(list_transform({TOKENS}[1:4], t -> upper(t)), ',') AS up4,
           CAST(list_sum(list_transform({TOKENS}, t -> length(t))) AS BIGINT) AS total_chars
    FROM documents ORDER BY doc_id
    """,
    doc="higher-order fns over lists: apply_boolean_mask "
    "(lists/stream_compaction.hpp:55) → filter; per-element transform; "
    "reduce (segmented reduction).",
)
def list_higher_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents")
    toks = F.split("text", " ")
    return d.select(
        "doc_id",
        F.size(F.filter(toks, lambda t: F.length(t) > 4)).alias("n_long"),
        F.array_join(F.transform(F.slice(toks, 1, 4), F.upper), ",").alias("up4"),
        F.aggregate(toks, F.lit(0), lambda acc, t: acc + F.length(t)).cast("long").alias("total_chars"),
    ).orderBy("doc_id")


@register(
    "struct_ops",
    oracle="""
    SELECT o_orderkey,
           struct_extract(struct_pack(k := o_custkey, p := round(o_totalprice, 2)), 'k') AS sk,
           struct_extract(struct_pack(k := o_custkey, p := round(o_totalprice, 2)), 'p') AS sp
    FROM orders ORDER BY o_orderkey
    """,
    doc="struct create + field access (structs/structs_column_view.hpp; "
    "polars StructFunction dsl/expressions/struct.py).",
)
def struct_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders")
    st = F.struct(
        F.col("o_custkey").alias("k"), F.round("o_totalprice", 2).alias("p")
    )
    return o.select(
        "o_orderkey",
        st.getField("k").alias("sk"),
        st.getField("p").alias("sp"),
    ).orderBy("o_orderkey")


@register(
    "list_explode_outer",
    oracle="""
    WITH t AS (
        SELECT doc_id,
               list_filter(string_split(text, ' '), x -> length(x) >= 7) AS arr
        FROM documents WHERE doc_id < 500),
    f AS (SELECT doc_id, list_concat(arr, list_reverse(arr)) AS flat FROM t)
    SELECT doc_id, u.pos AS pos, u.tok AS tok
    FROM (SELECT doc_id,
                 unnest(list_transform(generate_series(1, len(flat)),
                     i -> struct_pack(pos := i - 1, tok := flat[i]))) AS u
          FROM f WHERE len(flat) > 0)
    UNION ALL
    SELECT doc_id, NULL AS pos, NULL AS tok FROM f WHERE len(flat) = 0
    ORDER BY doc_id, pos NULLS LAST
    """,
    doc="posexplode_outer + flatten (lists/explode.hpp explode_outer_"
    "position + combine.hpp concatenate_list_elements): a nested "
    "array-of-arrays flattens, then explodes WITH 0-based positions, and "
    "rows whose array is empty SURVIVE as (null, null) instead of "
    "vanishing — the outer-join flavor of Generate. The fixture filter "
    "(tokens >= 7 chars) leaves ~20% of docs with empty arrays so both "
    "paths are exercised.",
)
def list_explode_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents").filter(F.col("doc_id") < 500)
    arr = F.filter(F.split("text", " "), lambda x: F.length(x) >= 7)
    flat = F.flatten(F.array(arr, F.reverse(arr)))
    return (
        d.select("doc_id", F.posexplode_outer(flat).alias("pos", "tok"))
        .orderBy("doc_id", F.col("pos").asc_nulls_last())
    )


@register(
    "map_ops",
    # Dynamic oracle over whatever keys props actually holds (sorted-key
    # union with the two column-derived entries) — the previous oracle
    # hardcoded n_keys=3/'k,type,uid'/2, which held only while props was
    # exactly {"k": <int>}. Everything is ordered BY KEY (matching the
    # engine's array_sort(map_entries(m)) since map keys are distinct —
    # sorting 'k=v' STRINGS would misorder prefix keys whose next char
    # sorts below '='); values come through JSON POINTERS ('/' || key,
    # with ~0/~1 escapes) so dotted/bracketed keys resolve literally,
    # not as nested paths; NULL-valued entries keep the bare key via
    # concat_ws on both engines; NULL/invalid props degrade to the empty
    # object exactly like the engine's coalesce.
    oracle="""
    WITH e AS (
        SELECT event_id, event_type, user_id,
               CASE WHEN props IS NOT NULL AND json_valid(props)
                    THEN props ELSE '{}' END AS pj
        FROM events WHERE event_id < 2000
    ), jk AS (
        -- list_distinct: json_keys emits a duplicated JSON key once per
        -- occurrence; the engine rebuilds its parsed map keep-FIRST per
        -- key, and the JSON-pointer lookup below also returns the first
        -- occurrence — both sides agree on duplicated keys
        SELECT event_id, unnest(list_distinct(list_filter(json_keys(pj),
                                            k -> k NOT IN ('type', 'uid')))) AS k
        FROM e
    ), kv AS (
        SELECT j.event_id, j.k,
               json_extract_string(e.pj,
                   '/' || replace(replace(j.k, '~', '~0'), '/', '~1')) AS v
        FROM jk j JOIN e USING (event_id)
        UNION ALL
        SELECT event_id, 'type', event_type FROM e
        UNION ALL
        SELECT event_id, 'uid', CAST(user_id AS VARCHAR) FROM e
    ), agg AS (
        SELECT event_id,
               CAST(count(*) AS INT) AS n_keys,
               string_agg(k, ',' ORDER BY k) AS keys_csv,
               string_agg(concat_ws('=', k, v), ',' ORDER BY k) AS entries_csv,
               CAST(count(*) FILTER (WHERE k != 'uid') AS INT) AS n_after_filter
        FROM kv GROUP BY event_id
    )
    SELECT e.event_id, a.n_keys, a.keys_csv,
           -- mirror Spark try_cast: integral-format strings only (an
           -- unguarded DuckDB CAST aborts on 'abc' and ROUNDS '4.5')
           -- padding class includes \\x7f: Spark's UTF8String.trimAll
           -- trims every ASCII control char (DEL included), nothing
           -- above — and the padding is stripped before TRY_CAST, since
           -- DuckDB's parser only tolerates plain spaces itself
           CASE WHEN regexp_matches(
                    coalesce(json_extract_string(e.pj, '/k'), ''),
                    '^[\\x00-\\x20\\x7f]*[+-]?[0-9]+[\\x00-\\x20\\x7f]*$')
                THEN TRY_CAST(regexp_replace(
                         json_extract_string(e.pj, '/k'),
                         '^[\\x00-\\x20\\x7f]+|[\\x00-\\x20\\x7f]+$', '', 'g')
                     AS INT)
           END AS k_val,
           a.entries_csv, a.n_after_filter
    FROM e JOIN agg a USING (event_id)
    ORDER BY e.event_id
    """,
    doc="Native MapType surface (SURVEY §2.10 maps; polars/cudf struct-of-"
    "pairs columns): create_map from columns + from_json into "
    "map<string,string>, map_concat merge (parsed props drop keys that "
    "collide with the column-derived 'type'/'uid' entries — columns win, "
    "and Spark's default mapKeyDedupPolicy=EXCEPTION would otherwise "
    "abort the job on the first colliding document), map_keys/"
    "map_entries (key-sorted for engine determinism), element_at lookup, "
    "map_filter. The oracle rebuilds the same scalars from the raw "
    "columns for ANY props key set. Embarrassingly parallel; zero "
    "shuffles beyond the sort.",
)
def map_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load(spark, sf_dir, "events").filter(F.col("event_id") < 2000)
    # NULL/unparseable props degrade to the EMPTY map, not a NULL map —
    # map_concat(m, NULL) nulls the whole merged map, which would erase
    # the two column-derived entries the oracle still emits
    raw = F.coalesce(
        F.from_json("props", "map<string,string>"),
        F.from_json(F.lit("{}"), "map<string,string>"),
    )
    # from_json does NOT dedup a duplicated JSON key — it emits a map
    # with duplicate entries, and the first downstream map-building op
    # aborts under Spark's default mapKeyDedupPolicy=EXCEPTION. Rebuild
    # keep-FIRST per key (dropping 'type'/'uid' collisions in the same
    # pass) — first-occurrence is also what the oracle's JSON-pointer
    # lookup returns, so the engines agree on duplicated keys too. The
    # nested scan is O(n²) in the per-row key count, trivially small.
    ients = F.transform(
        F.map_entries(raw),
        lambda ent, i: F.struct(
            ent["key"].alias("k"), ent["value"].alias("v"), i.alias("i")
        ),
    )
    kept = F.filter(
        ients,
        lambda ent: ~ent["k"].isin("type", "uid")
        & (
            ent["i"]
            == F.array_min(
                F.transform(
                    F.filter(ients, lambda x: x["k"] == ent["k"]),
                    lambda x: x["i"],
                )
            )
        ),
    )
    parsed = F.map_from_entries(
        F.transform(
            kept, lambda ent: F.struct(ent["k"].alias("key"), ent["v"].alias("value"))
        )
    )
    m = F.map_concat(
        F.create_map(
            F.lit("type"), F.col("event_type"),
            F.lit("uid"), F.col("user_id").cast("string"),
        ),
        parsed,
    )
    entries = F.transform(
        F.array_sort(F.map_entries(m)),
        lambda s: F.concat_ws("=", s["key"], s["value"]),
    )
    return (
        e.select(
            "event_id",
            F.size(m).alias("n_keys"),
            F.concat_ws(",", F.array_sort(F.map_keys(m))).alias("keys_csv"),
            # try_cast, not cast: ANSI mode (Spark 4 default) aborts the
            # whole job on a non-integer props.k value
            F.element_at(m, F.lit("k")).try_cast("int").alias("k_val"),
            F.concat_ws(",", entries).alias("entries_csv"),
            F.size(F.map_filter(m, lambda k, v: k != F.lit("uid"))).alias(
                "n_after_filter"
            ),
        )
        .orderBy("event_id")
    )
