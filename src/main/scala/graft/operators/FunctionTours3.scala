package graft.operators

import org.apache.spark.sql.functions._
import graft.{Q, Tables}

/** Third function tour (SURVEY.md §2.2): datetime parse/format
  * (`pd.to_datetime` analog), printf-style string formatting, and array
  * algebra (sort/union/intersect/flatten) — arrays surfaced as joined
  * strings so the cross-engine compare stays scalar.
  *
  * Reference capability: pandas to_datetime/str.format/list ops via the
  * deployed image (dask_ssh_docker/__init__.py:307; SURVEY §2.2 Tier B).
  */
object FunctionTours3 {

  /** Format → parse roundtrip (dask `pd.to_datetime` + strftime):
    * timestamps rendered to strings and parsed back, plus ISO week/day
    * formatting. Spark uses Java patterns, DuckDB strftime/strptime —
    * field-equivalent patterns chosen on each side. */
  val qDatetimeParse: Q = Q(
    "q84_datetime_parse_format",
    """SELECT o_orderkey,
      |  strftime(o_orderdate, '%Y-%m-%d') AS iso_day,
      |  strftime(o_orderdate, '%d/%m/%Y') AS eu_day,
      |  strptime(strftime(o_orderdate, '%Y-%m-%d'), '%Y-%m-%d') AS reparsed,
      |  CAST(strftime(o_orderdate, '%j') AS BIGINT) AS day_of_year
      |FROM orders WHERE o_orderkey < 500 ORDER BY o_orderkey""".stripMargin
  ) { (s, d) =>
    Tables.orders(s, d).filter(col("o_orderkey") < 500)
      .select(col("o_orderkey"),
        date_format(col("o_orderdate"), "yyyy-MM-dd").as("iso_day"),
        date_format(col("o_orderdate"), "dd/MM/yyyy").as("eu_day"),
        to_timestamp(date_format(col("o_orderdate"), "yyyy-MM-dd"), "yyyy-MM-dd")
          .as("reparsed"),
        dayofyear(col("o_orderdate")).cast("long").as("day_of_year"))
      .orderBy(col("o_orderkey"))
  }

  /** printf-style formatting (pandas `str.format`/`%` analog): Spark
    * format_string ≡ DuckDB printf. */
  val qFormatStrings: Q = Q(
    "q85_format_strings",
    """SELECT c_custkey,
      |  printf('%s#%05d', c_mktsegment, c_custkey) AS tag,
      |  printf('balance=%.2f', c_acctbal) AS bal_str,
      |  printf('%d-%d', c_nationkey, CAST(c_custkey % 10 AS INTEGER)) AS bucket
      |FROM customer WHERE c_custkey <= 100 ORDER BY c_custkey""".stripMargin
  ) { (s, d) =>
    Tables.customer(s, d).filter(col("c_custkey") <= 100)
      .select(col("c_custkey"),
        format_string("%s#%05d", col("c_mktsegment"), col("c_custkey")).as("tag"),
        format_string("balance=%.2f", col("c_acctbal")).as("bal_str"),
        format_string("%d-%d", col("c_nationkey"), (col("c_custkey") % 10).cast("int"))
          .as("bucket"))
      .orderBy(col("c_custkey"))
  }

  /** Array algebra: sort / distinct-union / intersect / flatten over token
    * arrays, surfaced via array_join for scalar comparison. */
  val qArrayAlgebra: Q = Q(
    "q86_array_algebra",
    """SELECT doc_id,
      |  array_to_string(list_sort(list_distinct(string_split(text, ' ')))[1:5], ',')
      |    AS first5_sorted,
      |  len(list_distinct(list_concat(string_split(text, ' '),
      |      ['spark', 'join']))) AS n_union,
      |  len(list_filter(list_distinct(string_split(text, ' ')),
      |      x -> list_contains(['spark', 'join', 'window'], x))) AS n_common,
      |  len(flatten([string_split(text, ' '), ['x']])) AS n_flat
      |FROM documents WHERE doc_id < 100 ORDER BY doc_id""".stripMargin
  ) { (s, d) =>
    val toks = split(col("text"), " ")
    Tables.documents(s, d).filter(col("doc_id") < 100)
      .select(col("doc_id"),
        array_join(slice(array_sort(array_distinct(toks)), 1, 5), ",")
          .as("first5_sorted"),
        size(array_union(toks, array(lit("spark"), lit("join")))).cast("long")
          .as("n_union"),
        size(array_intersect(toks, array(lit("spark"), lit("join"), lit("window"))))
          .cast("long").as("n_common"),
        size(flatten(array(toks, array(lit("x"))))).cast("long").as("n_flat"))
      .orderBy(col("doc_id"))
  }

  /** Regex family (pandas `str.extract`/`str.replace`/`str.contains`
    * analogs): extract, global replace, boolean match, match count.
    * Patterns restricted to the POSIX-safe subset that Java regex (Spark)
    * and RE2-style (DuckDB) interpret identically; DuckDB's
    * regexp_replace needs the explicit 'g' flag to match Spark's
    * replace-all default. */
  val qRegexFamily: Q = Q(
    "q91_regex_family",
    """SELECT doc_id,
      |  regexp_extract(text, '[a-z]{6,}', 0) AS first_long_word,
      |  regexp_replace(substr(text, 1, 40), '[aeiou]', '*', 'g') AS masked_prefix,
      |  regexp_matches(text, ' [a-z]{4} ') AS has_4letter_word,
      |  CAST(len(regexp_extract_all(text, '[a-z]+a')) AS BIGINT) AS n_a_words
      |FROM documents WHERE doc_id < 200 ORDER BY doc_id""".stripMargin
  ) { (s, d) =>
    Tables.documents(s, d).filter(col("doc_id") < 200)
      .select(col("doc_id"),
        regexp_extract(col("text"), "[a-z]{6,}", 0).as("first_long_word"),
        regexp_replace(substring(col("text"), 1, 40), "[aeiou]", "*")
          .as("masked_prefix"),
        col("text").rlike(" [a-z]{4} ").as("has_4letter_word"),
        regexp_count(col("text"), lit("[a-z]+a")).cast("long").as("n_a_words"))
      .orderBy(col("doc_id"))
  }

  /** Timezone conversion family (pandas `tz_convert` / Spark
    * `from_utc_timestamp` + `convert_timezone`): UTC event instants
    * rendered as wall time in named IANA zones, including a fractional-
    * offset zone (Kathmandu +05:45). Both engines resolve zone rules
    * from the IANA tzdb, so formatted wall times compare exactly; output
    * is formatted strings + an hour column so no TIMESTAMP_TZ type
    * crosses the oracle boundary. Pure map stage — no shuffle. */
  val qTimezones: Q = Q(
    "q119_timezone_family",
    """SELECT event_id,
      |  strftime(ts, '%Y-%m-%d %H:%M:%S') AS utc_wall,
      |  strftime((ts AT TIME ZONE 'UTC') AT TIME ZONE 'America/New_York',
      |           '%Y-%m-%d %H:%M:%S') AS ny_wall,
      |  strftime((ts AT TIME ZONE 'UTC') AT TIME ZONE 'Asia/Tokyo',
      |           '%Y-%m-%d %H:%M:%S') AS tokyo_wall,
      |  strftime((ts AT TIME ZONE 'UTC') AT TIME ZONE 'Asia/Kathmandu',
      |           '%Y-%m-%d %H:%M:%S') AS ktm_wall,
      |  CAST(hour((ts AT TIME ZONE 'UTC') AT TIME ZONE 'America/New_York')
      |       AS BIGINT) AS ny_hour
      |FROM events WHERE event_id < 300 ORDER BY event_id""".stripMargin
  ) { (s, d) =>
    val fmt = "yyyy-MM-dd HH:mm:ss"
    val e = Tables.events(s, d).filter(col("event_id") < 300)
    def wall(zone: String) = date_format(from_utc_timestamp(col("ts"), zone), fmt)
    e.select(col("event_id"),
        date_format(col("ts"), fmt).as("utc_wall"),
        wall("America/New_York").as("ny_wall"),
        wall("Asia/Tokyo").as("tokyo_wall"),
        wall("Asia/Kathmandu").as("ktm_wall"),
        hour(from_utc_timestamp(col("ts"), "America/New_York")).cast("long")
          .as("ny_hour"))
      .orderBy(col("event_id"))
  }

  /** pandas `str.extractall` — EVERY regex match becomes its own row
    * with a per-source match index (q91 extracts the first match and
    * counts the rest; this is the exploding form). One
    * `posexplode(regexp_extract_all(...))` projection — no shuffle
    * before the presentation sort; both engines use leftmost
    * non-overlapping match semantics, so the match lists align
    * position-for-position. */
  val qExtractAll: Q = Q(
    "q141_extractall",
    """SELECT doc_id, CAST(i AS BIGINT) AS match_idx, ms[i + 1] AS m
      |FROM (SELECT doc_id, regexp_extract_all(text, 's[a-z]+') AS ms,
      |        unnest(range(0, len(regexp_extract_all(text, 's[a-z]+')))) AS i
      |      FROM documents WHERE doc_id < 60)
      |ORDER BY doc_id, match_idx""".stripMargin
  ) { (s, d) =>
    Tables.documents(s, d).filter(col("doc_id") < 60)
      .select(col("doc_id"),
        posexplode(regexp_extract_all(col("text"), lit("s[a-z]+"), lit(0)))
          .as(Seq("match_idx", "m")))
      .select(col("doc_id"), col("match_idx").cast("long").as("match_idx"),
        col("m"))
      .orderBy(col("doc_id"), col("match_idx"))
  }

  val all: Seq[Q] = Seq(qDatetimeParse, qFormatStrings, qArrayAlgebra, qRegexFamily,
    qTimezones, qExtractAll)
}
