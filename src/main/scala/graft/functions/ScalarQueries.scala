package graft.functions

import graft.{GraftQuery, Tables}
import org.apache.spark.sql.functions._

/** Scalar function surface: string, date/time, math, array (incl.
  * higher-order), JSON, conditional (SURVEY.md §2.2 "Scalar functions").
  *
  * Scale design: everything here is a built-in Catalyst expression inside
  * whole-stage codegen — per-row cost is a few JIT'd instructions, no UDF
  * serialization boundary, and the projections are narrow so ReadSchema
  * prunes the parquet scan to the referenced columns only.
  */
object ScalarQueries {

  val all: Seq[GraftQuery] = Seq(

    GraftQuery(
      "q27_string_funcs",
      Some("""SELECT p_partkey,
             |       upper(p_brand)                          AS brand_u,
             |       substring(p_name, 1, 8)                 AS name8,
             |       concat_ws('|', p_brand, p_type)         AS brand_type,
             |       CAST(length(p_name) AS BIGINT)          AS name_len,
             |       CAST(levenshtein(p_brand, 'Brand#13') AS BIGINT) AS lev,
             |       regexp_extract(p_name, '([a-z]+)$', 1)  AS last_word,
             |       replace(p_type, 'PROMO', 'P')           AS type_r,
             |       CAST(len(string_split(p_name, ' ')) AS BIGINT) AS n_words
             |FROM part
             |ORDER BY p_partkey""".stripMargin),
      "Codegen'd string kernels over a narrow projection — no UDF boundary."
    ) { (s, dir) =>
      Tables.part(s, dir)
        .select(col("p_partkey"),
          upper(col("p_brand")).as("brand_u"),
          substring(col("p_name"), 1, 8).as("name8"),
          concat_ws("|", col("p_brand"), col("p_type")).as("brand_type"),
          length(col("p_name")).cast("long").as("name_len"),
          levenshtein(col("p_brand"), lit("Brand#13")).cast("long").as("lev"),
          regexp_extract(col("p_name"), "([a-z]+)$", 1).as("last_word"),
          regexp_replace(col("p_type"), "PROMO", "P").as("type_r"),
          size(split(col("p_name"), " ")).cast("long").as("n_words"))
        .orderBy("p_partkey")
    },

    GraftQuery(
      "q28_date_funcs",
      Some("""SELECT o_orderkey,
             |       CAST(date_trunc('month', o_orderdate) AS DATE)       AS order_month,
             |       CAST(year(o_orderdate) AS BIGINT)                    AS yr,
             |       CAST(month(o_orderdate) AS BIGINT)                   AS mth,
             |       CAST(day(o_orderdate) AS BIGINT)                     AS dom,
             |       CAST(datediff('day', DATE '1995-01-01', o_orderdate) AS BIGINT) AS days_since,
             |       last_day(o_orderdate)                                AS month_end
             |FROM orders
             |ORDER BY o_orderkey""".stripMargin),
      "Date kernels; date_trunc/year are monotone in the partition column " +
        "at scale, so partition pruning still applies when filtered."
    ) { (s, dir) =>
      Tables.orders(s, dir)
        .select(col("o_orderkey"),
          date_trunc("month", col("o_orderdate")).cast("date").as("order_month"),
          year(col("o_orderdate")).cast("long").as("yr"),
          month(col("o_orderdate")).cast("long").as("mth"),
          dayofmonth(col("o_orderdate")).cast("long").as("dom"),
          datediff(col("o_orderdate"), lit("1995-01-01").cast("date")).cast("long").as("days_since"),
          last_day(col("o_orderdate")).as("month_end"))
        .orderBy("o_orderkey")
    },

    GraftQuery(
      "q29_math_funcs",
      Some("""SELECT l_orderkey, l_linenumber,
             |       round(pow(l_quantity, 2), 2)      AS qty_sq,
             |       round(ln(l_extendedprice), 6)     AS ln_price,
             |       round(log10(l_extendedprice), 6)  AS log10_price,
             |       round(abs(l_discount - 0.05), 4)  AS disc_dev,
             |       CAST(ceil(l_extendedprice) AS BIGINT)  AS price_ceil,
             |       CAST(floor(l_extendedprice) AS BIGINT) AS price_floor,
             |       round(sqrt(l_quantity), 6)        AS qty_sqrt
             |FROM lineitem
             |ORDER BY l_orderkey, l_linenumber""".stripMargin),
      "Math kernels; note Spark log() is natural log (DuckDB ln), log10 is " +
        "explicit in both — a classic oracle-drift trap, pinned here."
    ) { (s, dir) =>
      Tables.lineitem(s, dir)
        .select(col("l_orderkey"), col("l_linenumber"),
          round(pow(col("l_quantity"), 2), 2).as("qty_sq"),
          round(log(col("l_extendedprice")), 6).as("ln_price"),
          round(log10(col("l_extendedprice")), 6).as("log10_price"),
          round(abs(col("l_discount") - 0.05), 4).as("disc_dev"),
          ceil(col("l_extendedprice")).as("price_ceil"),
          floor(col("l_extendedprice")).as("price_floor"),
          round(sqrt(col("l_quantity")), 6).as("qty_sqrt"))
        .orderBy("l_orderkey", "l_linenumber")
    },

    GraftQuery(
      "q30_array_funcs",
      Some("""SELECT doc_id,
             |       CAST(len(string_split(text, ' ')) AS BIGINT) AS n_toks,
             |       string_split(text, ' ')[1] AS first_tok,
             |       CAST(list_contains(string_split(text, ' '), 'data') AS BIGINT) AS has_data,
             |       array_to_string(list_slice(list_sort(string_split(text, ' ')), 1, 3), ',') AS first3_sorted,
             |       round(list_aggregate(list_transform(string_split(text, ' '),
             |             t -> CAST(length(t) AS DOUBLE)), 'sum')
             |             / len(string_split(text, ' ')), 4) AS avg_tok_len
             |FROM documents
             |ORDER BY doc_id""".stripMargin),
      "Array + higher-order functions (transform/aggregate) — lambda " +
        "expressions evaluate inside codegen, no row-at-a-time UDF; arrays " +
        "never leave the task."
    ) { (s, dir) =>
      val toks = split(col("text"), " ")
      Tables.documents(s, dir)
        .select(col("doc_id"),
          size(toks).cast("long").as("n_toks"),
          element_at(toks, 1).as("first_tok"),
          array_contains(toks, "data").cast("long").as("has_data"),
          array_join(slice(sort_array(toks), 1, 3), ",").as("first3_sorted"),
          round(
            aggregate(transform(toks, t => length(t).cast("double")), lit(0.0), (acc, x) => acc + x)
              / size(toks), 4).as("avg_tok_len"))
        .orderBy("doc_id")
    },

    GraftQuery(
      "q31_json_funcs",
      Some("""SELECT event_id,
             |       CAST(json_extract_string(props, '$.k') AS BIGINT) AS k_path,
             |       json_transform(props, '{"k": "BIGINT"}').k AS k_map
             |FROM events
             |ORDER BY event_id""".stripMargin),
      "JSON path extraction (get_json_object) and full parse to a typed map " +
        "(from_json) — both codegen-capable; at scale parse once into a " +
        "struct column rather than per-predicate re-parsing. The oracle " +
        "derives the two columns through DIFFERENT DuckDB paths (string " +
        "extraction vs typed json_transform) so the from_json route is " +
        "checked independently, not merely for agreement with " +
        "get_json_object."
    ) { (s, dir) =>
      Tables.events(s, dir)
        .select(col("event_id"),
          get_json_object(col("props"), "$.k").cast("long").as("k_path"),
          element_at(
            from_json(col("props"), org.apache.spark.sql.types.MapType(
              org.apache.spark.sql.types.StringType, org.apache.spark.sql.types.LongType)),
            lit("k")).as("k_map"))
        .orderBy("event_id")
    },

    GraftQuery(
      "q32_conditional",
      Some("""SELECT c_custkey,
             |       CASE WHEN c_acctbal < 0 THEN 'overdrawn'
             |            WHEN c_acctbal < 3000 THEN 'low'
             |            WHEN c_acctbal < 7000 THEN 'mid'
             |            ELSE 'high' END AS tier,
             |       coalesce(nullif(c_mktsegment, 'BUILDING'), 'OTHER') AS seg,
             |       CAST((c_acctbal IS NOT DISTINCT FROM 0.0) AS BIGINT) AS zero_bal
             |FROM customer
             |ORDER BY c_custkey""".stripMargin),
      "CASE/coalesce/nullif/null-safe-eq — pure codegen conditionals."
    ) { (s, dir) =>
      Tables.customer(s, dir)
        .select(col("c_custkey"),
          when(col("c_acctbal") < 0, "overdrawn")
            .when(col("c_acctbal") < 3000, "low")
            .when(col("c_acctbal") < 7000, "mid")
            .otherwise("high").as("tier"),
          coalesce(nullif(col("c_mktsegment"), lit("BUILDING")), lit("OTHER")).as("seg"),
          col("c_acctbal").eqNullSafe(lit(0.0)).cast("long").as("zero_bal"))
        .orderBy("c_custkey")
    },

    GraftQuery(
      "q74_posexplode",
      Some("""WITH t AS (
             |  SELECT doc_id, list_slice(string_split(text, ' '), 1, 5) w
             |  FROM documents WHERE doc_id < 100
             |)
             |SELECT doc_id, unnest(range(0, len(w))) AS pos, unnest(w) AS tok
             |FROM t
             |ORDER BY doc_id, pos""".stripMargin),
      "Ordinal-preserving generator (posexplode ≡ zipped unnest): one row " +
        "per element WITH its position, the fan-out primitive for " +
        "order-sensitive token processing. A pipelined Generate inside the " +
        "scan stage — row multiplication, zero shuffle."
    ) { (s, dir) =>
      Tables.documents(s, dir)
        .filter(col("doc_id") < 100)
        .select(col("doc_id"),
          posexplode(slice(split(col("text"), " "), 1, 5)))
        .select(col("doc_id"), col("pos").cast("long").as("pos"), col("col").as("tok"))
        .orderBy("doc_id", "pos")
    },

    GraftQuery(
      "q80_binary_funcs",
      Some("""SELECT event_id,
             |       to_base64(encode(event_type)) AS b64,
             |       hex(user_id) AS hx,
             |       user_id & 255 AS and_lo,
             |       xor(user_id, event_id) AS xor_ids,
             |       user_id << 3 AS shl3,
             |       event_id >> 2 AS shr2
             |FROM events
             |ORDER BY event_id""".stripMargin),
      "Binary/bitwise surface: base64, hex, AND/XOR masks and shifts — the " +
        "primitives for packed flags, content addressing and binary " +
        "payload handling. All codegen'd row-local expressions; hex/base64 " +
        "byte-for-byte compatible with the oracle engine's."
    ) { (s, dir) =>
      Tables.events(s, dir)
        .select(col("event_id"),
          base64(encode(col("event_type"), "utf-8")).as("b64"),
          hex(col("user_id")).as("hx"),
          col("user_id").bitwiseAND(lit(255L)).as("and_lo"),
          col("user_id").bitwiseXOR(col("event_id")).as("xor_ids"),
          shiftleft(col("user_id"), 3).as("shl3"),
          shiftright(col("event_id"), 2).as("shr2"))
        .orderBy("event_id")
    }
  )
}
