package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.Tables
import graft.functions.F1Functions

/** Scalar-function operators from SURVEY.md §2.H / §2.J, exercised through
  * the graft function library so the oracle check covers the same Column
  * expressions the F1 transforms use.
  *
  * The reference implements several of these as Python scalar UDFs
  * (`src/jobs/utils/transformations/common.py:24-142,265-318` in
  * /root/reference); here they are native, codegen-friendly Column
  * expressions — no UDF in the hot path.
  */
object ScalarQueries {

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // H1: when/otherwise points-table ladder (race_results_transform.py:
    // 157-171) keyed on line number 1..7 standing in for finish position.
    "h1_points_ladder" -> { (s, dir) =>
      Tables.lineitem(s, dir).select(
        col("l_orderkey"), col("l_linenumber"),
        F1Functions.pointsForPosition(col("l_linenumber")).as("points"))
    },

    // H2: array size / element_at parsing with short-array guard
    // (qualifying duration [Q1,Q2,Q3] parse, qualifying_transform.py:134-182).
    "h2_array_parse" -> { (s, dir) =>
      Tables.embeddings(s, dir).select(
        col("vec_id"),
        size(col("embedding")).cast("bigint").as("dim"),
        (element_at(col("embedding"), 1).cast("double") * 1000).as("e1_scaled"),
        when(size(col("embedding")) >= 2,
          element_at(col("embedding"), 2).cast("double") * 1000).as("e2_scaled"))
    },

    // H3: coalesce ladder (best quali time = coalesce(Q3,Q2,Q1),
    // qualifying_transform.py:172-182).
    "h3_coalesce" -> { (s, dir) =>
      Tables.orders(s, dir).select(
        col("o_orderkey"),
        coalesce(nullif(col("o_orderstatus"), lit("O")), lit("OPEN"))
          .as("status_resolved"))
    },

    // H4: time arithmetic — epoch seconds, day diff (session duration
    // minutes, sessions_transform.py:224-229).
    "h4_time_arith" -> { (s, dir) =>
      Tables.orders(s, dir).select(
        col("o_orderkey"),
        unix_timestamp(col("o_orderdate")).as("epoch_s"),
        datediff(col("o_orderdate"), lit("1995-01-01").cast("date"))
          .cast("bigint").as("days_since_1995"))
    },

    // H8: millis → "M:SS.mmm" lap-time formatting
    // (laps_transform.py:150-204), on the price column read as millis.
    // (Was keyed h4_lap_format through round 11, colliding with
    // h4_time_arith's prefix — renamed to the free slot, round-11
    // directive 8; semantics unchanged.)
    "h8_lap_format" -> { (s, dir) =>
      Tables.lineitem(s, dir).select(
        col("l_orderkey"), col("l_linenumber"),
        F1Functions.formatLapTimeMillis(col("l_extendedprice"))
          .as("lap_time_str"))
    },

    // H5: grand-prix-style name normalization (strip suffix, lowercase,
    // underscores — common.py:24-55), native instead of a Python UDF.
    "h5_name_normalize" -> { (s, dir) =>
      Tables.part(s, dir).select(
        col("p_partkey"),
        F1Functions.normalizeName(col("p_name")).as("name_norm"))
    },

    // H7: keyword-bucket status standardization via rlike ladder
    // (common.py:265-318), on order priority strings.
    "h7_status_ladder" -> { (s, dir) =>
      Tables.orders(s, dir).select(
        col("o_orderkey"),
        F1Functions.bucketPriority(col("o_orderpriority")).as("priority_bucket"))
    },

    // H6: team-name standardization (common.py:58-142) — the raw names
    // cycle through a literal roster covering every keyword row (incl. the
    // word-anchored "rb" and the title-case fallback); the oracle carries
    // the EXPECTED canon per raw name, so the whole strip+match ladder is
    // hash-checked, not just exercised.
    "h6_team_canon" -> { (s, dir) =>
      val raw = element_at(typedLit(rawTeams),
        (col("c_custkey") % rawTeams.size + 1).cast("int"))
      Tables.customer(s, dir).select(
        col("c_custkey"), raw.as("team_raw"),
        F1Functions.standardizeTeam(raw).as("team_canon"))
    },

    // H9: time-string parser (common.py:145-206) over all three shapes —
    // "SS.mmm", "M:SS.mmm", "H:MM:SS.mmm" — plus the null passthrough,
    // on strings built from integer columns (exact in both engines).
    "h9_time_parse" -> { (s, dir) =>
      val secStr = concat(
        lpad((col("l_orderkey") % 60).cast("string"), 2, "0"), lit("."),
        lpad((col("l_partkey") % 1000).cast("string"), 3, "0"))
      val timeStr = when(col("l_linenumber") === 7,
          lit(null).cast("string"))
        .when(col("l_linenumber") === 1, secStr)
        .when(col("l_linenumber") === 2,
          concat((col("l_suppkey") % 3).cast("string"), lit(":"),
            lpad((col("l_orderkey") % 60).cast("string"), 2, "0"),
            lit(":"), secStr))
        .otherwise(concat(col("l_linenumber").cast("string"), lit(":"),
          secStr))
      Tables.spread(Tables.lineitem(s, dir)).select(
        col("l_orderkey"), col("l_linenumber"), timeStr.as("time_str"),
        F1Functions.timeStringToMillis(timeStr).as("millis"))
    },

    // H11: regexp_extract from a JSON-ish payload (partition value recovery
    // pattern, sessions_transform.py:115-125).
    "h11_regexp_extract" -> { (s, dir) =>
      // no-match extracts return '' — NULL it before the cast (ANSI
      // throws on CAST('' AS BIGINT); the oracle already NULLIFs)
      val ex = regexp_extract(col("props"), "\"k\": (\\d+)", 1)
      Tables.events(s, dir).select(
        col("event_id"),
        when(ex =!= "", ex).cast("bigint").as("k_value"))
    },

    // H16 (beyond reference): PROPER JSON-path extraction from the props
    // payload — both the untyped path probe (get_json_object) and the
    // schema'd parse (from_json → typed struct field). The h11 regex is
    // the partition-recovery trick; this is the semi-structured operator.
    "h16_json_extract" -> { (s, dir) =>
      import org.apache.spark.sql.types.{LongType, StructField, StructType}
      val schema = StructType(Seq(StructField("k", LongType)))
      Tables.events(s, dir).select(
        col("event_id"),
        get_json_object(col("props"), "$.k").cast("bigint").as("k_path"),
        from_json(col("props"), schema).getField("k").as("k_typed"))
    },

    // H17 (beyond reference): URL decomposition with Spark's native
    // parse_url — host/path/query-param extraction, the first transform
    // of every web-corpus ingest. URLs are synthesized deterministically
    // from doc_id (tx7's fixture trick), so the oracle can state the
    // expected components CLOSED-FORM — it verifies the parser against
    // ground truth rather than mirroring another parser's quirks.
    "h17_url_parse" -> { (s, dir) =>
      val url = concat(lit("https://host"),
        (col("doc_id") % 7).cast("string"), lit(".example.org/docs/"),
        col("doc_id").cast("string"), lit("?lang="), col("lang"),
        lit("&ref=graft"))
      Tables.documents(s, dir).select(col("doc_id"), col("lang"))
        .withColumn("url", url)
        .select(col("doc_id"), col("url"),
          expr("parse_url(url, 'HOST')").as("host"),
          expr("parse_url(url, 'PATH')").as("path"),
          expr("parse_url(url, 'QUERY', 'lang')").as("q_lang"))
    },

    // H12 (beyond reference): generator — explode the part-name words into
    // rows, then aggregate word frequencies. Generate runs inside
    // whole-stage codegen; no UDTF.
    "h12_explode_words" -> { (s, dir) =>
      Tables.part(s, dir)
        .select(explode(split(col("p_name"), " ")).as("word"))
        .groupBy("word").agg(count(lit(1)).as("n"))
    },

    // H13 (beyond reference): string-distance join — nation-name pairs
    // within edit distance 6 (both engines implement classic Levenshtein).
    // 25×25 self-pair space via broadcast; deterministic key order.
    "h13_levenshtein" -> { (s, dir) =>
      val a = Tables.nation(s, dir).select(col("n_name").as("name_a"))
      val b = Tables.nation(s, dir).select(col("n_name").as("name_b"))
      a.crossJoin(broadcast(b))
        .filter(col("name_a") < col("name_b"))
        .select(col("name_a"), col("name_b"),
          levenshtein(col("name_a"), col("name_b")).cast("bigint").as("dist"))
        .filter(col("dist") <= 6)
    },

    // H19 (beyond reference): JARO–WINKLER similarity — the prefix-
    // rewarding name comparator Spark lacks (h13 covers edit distance),
    // implemented as a native codegen BinaryExpression
    // ([[graft.functions.JaroWinkler]]) that bit-mirrors the RapidFuzz
    // arithmetic DuckDB embeds, so the oracle compares RAW doubles — no
    // quantization anywhere. Probes: an in-name transposition (the
    // classic typo JW rewards), a deletion, and an unrelated string.
    // Pure narrow per-row compute inside whole-stage codegen.
    // H21 (beyond reference): SOUNDEX phonetic blocking census — the
    // homophone-tolerant blocking key the ER tier lacks (er1's n-gram
    // blocks catch typos, not Smith/Smyth). Native codegen expression
    // ([[graft.functions.Soundex4]], full Ashcraft→A261 H/W rule) over
    // the part-name vocabulary, plus each code's BLOCK SIZE — the
    // number that prices a soundex-blocked fuzzy join before running
    // it. Vocabulary grain is domain-bounded (≈100 color words at any
    // corpus size); the block rollup is code-grain, broadcast back.
    "h21_soundex" -> { (s, dir) =>
      import graft.functions.StringSimilarity.soundex4
      val toks = Tables.part(s, dir)
        .select(explode(split(col("p_name"), " ")).as("tok"))
        .filter(length(col("tok")) > 0)
        .groupBy("tok").agg(count(lit(1)).as("n"))
      val coded = toks
        .select(col("tok"), col("n"), soundex4(col("tok")).as("code"))
        .filter(col("code").isNotNull)
      val blocks = coded.groupBy(col("code").as("c2"))
        .agg(count(lit(1)).as("block_size"))
      coded.join(broadcast(blocks), col("code") === col("c2"))
        .select(col("tok"), col("n"), col("code"), col("block_size"))
    },

    "h19_jaro_winkler" -> { (s, dir) =>
      import graft.functions.StringSimilarity.jaroWinkler
      val swap = expr("concat(substring(c_name, 1, 9), " +
        "substring(c_name, 11, 1), substring(c_name, 10, 1), " +
        "substring(c_name, 12))")
      val drop = expr("concat(substring(c_name, 1, 9), " +
        "substring(c_name, 11))")
      Tables.customer(s, dir).select(col("c_custkey"),
        jaroWinkler(col("c_name"), swap).as("jw_swap"),
        jaroWinkler(col("c_name"), drop).as("jw_drop"),
        jaroWinkler(col("c_name"), col("c_mktsegment")).as("jw_seg"))
    },

    // H20 (beyond reference): DAMERAU–LEVENSHTEIN — edit distance that
    // prices an adjacent transposition at 1 (plain levenshtein charges
    // 2), the correct typo model for the ER tier's name matching. The
    // swap probe shows the gap directly: dl_swap = 1 where
    // lev_swap = 2. Native codegen expression
    // ([[graft.functions.DamerauLevenshtein]]), exact integer output.
    "h20_damerau" -> { (s, dir) =>
      import graft.functions.StringSimilarity.damerauLevenshtein
      val swap = expr("concat(substring(c_name, 1, 9), " +
        "substring(c_name, 11, 1), substring(c_name, 10, 1), " +
        "substring(c_name, 12))")
      Tables.customer(s, dir).select(col("c_custkey"),
        damerauLevenshtein(col("c_name"), swap).cast("bigint")
          .as("dl_swap"),
        levenshtein(col("c_name"), swap).cast("bigint").as("lev_swap"),
        damerauLevenshtein(col("c_name"), col("c_mktsegment"))
          .cast("bigint").as("dl_seg"))
    },

    // H15 (beyond reference): n-ary conditional scalars — greatest/least
    // across columns plus nullif/nvl round-trips.
    "h15_greatest_least" -> { (s, dir) =>
      Tables.lineitem(s, dir).select(
        col("l_orderkey"), col("l_linenumber"),
        greatest(col("l_quantity"), col("l_discount") * 100,
          col("l_tax") * 100).as("g3"),
        least(col("l_quantity"), col("l_discount") * 100,
          col("l_tax") * 100).as("l3"))
    },

    // H14 (beyond reference): array higher-order functions — transform /
    // filter / exists over the split word list, all codegen-safe scalar
    // ops per row (no explode, no shuffle).
    "h14_array_hof" -> { (s, dir) =>
      val words = split(col("p_name"), " ")
      Tables.part(s, dir).select(
        col("p_partkey"),
        size(words).cast("bigint").as("n_words"),
        size(filter(words, w => length(w) > 5)).cast("bigint").as("n_long"),
        array_max(transform(words, w => length(w))).cast("bigint").as("max_len"),
        array_contains(words, "green").as("has_green"))
    },

    // H18: calendar-function family — year/quarter/month/day, ISO week,
    // month-end, and month-clamped date addition (Jan 31 + 3 months =
    // Apr 30 in BOTH engines: Spark's add_months and DuckDB's
    // date + INTERVAL share the clamp-to-month-end rule). The fiscal/
    // reporting scalar surface every partition scheme and cohort rollup
    // leans on; pure per-row codegen, no shuffle.
    "h18_calendar" -> { (s, dir) =>
      val d = col("o_orderdate").cast("date")
      Tables.orders(s, dir).select(
        col("o_orderkey"),
        year(d).cast("bigint").as("y"),
        quarter(d).cast("bigint").as("q"),
        month(d).cast("bigint").as("m"),
        dayofmonth(d).cast("bigint").as("dom"),
        weekofyear(d).cast("bigint").as("iso_week"),
        last_day(d).cast("string").as("month_end"),
        add_months(d, 3).cast("string").as("plus_quarter"))
    },
  )

  /** Raw team-name roster for h6 and the canon each must map to
    * (common.py:62-121 keyword table; "Brawn" exercises the title-case
    * fallback, the two RB forms the word-anchored keyword). */
  private val teamPairs: Seq[(String, String)] = Seq(
    "Oracle Red Bull Racing" -> "Red Bull Racing",
    "Scuderia Ferrari" -> "Ferrari",
    "Mercedes-AMG PETRONAS F1 Team" -> "Mercedes",
    "McLaren Formula 1 Team" -> "McLaren",
    "Aston Martin Aramco Cognizant F1 Team" -> "Aston Martin",
    "BWT Alpine F1 Team" -> "Alpine",
    "Williams Racing" -> "Williams",
    "Scuderia AlphaTauri" -> "AlphaTauri",
    "Visa Cash App RB F1 Team" -> "RB",
    "RB F1 Team" -> "RB",
    "Stake F1 Team Kick Sauber" -> "Sauber",
    "Alfa Romeo ORLEN" -> "Alfa Romeo",
    "MoneyGram Haas F1 Team" -> "Haas",
    "Brawn GP Racing" -> "Brawn")
  private val rawTeams: Seq[String] = teamPairs.map(_._1)

  def oracleSql: Map[String, String] = Map(
    "h6_team_canon" -> {
      val raws = rawTeams.map(x => s"'$x'").mkString("[", ", ", "]")
      val canons = teamPairs.map(x => s"'${x._2}'").mkString("[", ", ", "]")
      s"""SELECT c_custkey,
         |($raws)[CAST(c_custkey % ${rawTeams.size} + 1 AS INTEGER)] AS team_raw,
         |($canons)[CAST(c_custkey % ${rawTeams.size} + 1 AS INTEGER)] AS team_canon
         |FROM customer""".stripMargin
    },
    "h9_time_parse" ->
      """WITH b AS (
        |  SELECT l_orderkey, l_linenumber, l_suppkey,
        |    lpad(CAST(l_orderkey % 60 AS VARCHAR), 2, '0') || '.' ||
        |    lpad(CAST(l_partkey % 1000 AS VARCHAR), 3, '0') AS sec_str
        |  FROM lineitem),
        |t AS (
        |  SELECT l_orderkey, l_linenumber,
        |    CASE WHEN l_linenumber = 7 THEN NULL
        |         WHEN l_linenumber = 1 THEN sec_str
        |         WHEN l_linenumber = 2 THEN CAST(l_suppkey % 3 AS VARCHAR)
        |           || ':' || lpad(CAST(l_orderkey % 60 AS VARCHAR), 2, '0')
        |           || ':' || sec_str
        |         ELSE CAST(l_linenumber AS VARCHAR) || ':' || sec_str
        |    END AS time_str
        |  FROM b),
        |p AS (SELECT l_orderkey, l_linenumber, time_str,
        |  string_split(time_str, ':') AS parts FROM t)
        |SELECT l_orderkey, l_linenumber, time_str,
        |CASE WHEN time_str IS NULL OR time_str = '' THEN NULL
        |  ELSE CAST(round((
        |    (CASE WHEN len(parts) >= 3 THEN CAST(parts[len(parts)-2] AS DOUBLE) ELSE 0.0 END) * 3600 +
        |    (CASE WHEN len(parts) >= 2 THEN CAST(parts[len(parts)-1] AS DOUBLE) ELSE 0.0 END) * 60 +
        |    CAST(parts[len(parts)] AS DOUBLE)) * 1000) AS BIGINT) END AS millis
        |FROM p""".stripMargin,
    "h1_points_ladder" ->
      """SELECT l_orderkey, l_linenumber,
        |CASE l_linenumber WHEN 1 THEN 25 WHEN 2 THEN 18 WHEN 3 THEN 15
        |  WHEN 4 THEN 12 WHEN 5 THEN 10 WHEN 6 THEN 8 WHEN 7 THEN 6
        |  WHEN 8 THEN 4 WHEN 9 THEN 2 WHEN 10 THEN 1 ELSE 0 END AS points
        |FROM lineitem""".stripMargin,
    "h2_array_parse" ->
      """SELECT vec_id, CAST(len(embedding) AS BIGINT) AS dim,
        |CAST(embedding[1] AS DOUBLE) * 1000 AS e1_scaled,
        |CASE WHEN len(embedding) >= 2
        |  THEN CAST(embedding[2] AS DOUBLE) * 1000 END AS e2_scaled
        |FROM embeddings""".stripMargin,
    "h3_coalesce" ->
      """SELECT o_orderkey,
        |COALESCE(NULLIF(o_orderstatus, 'O'), 'OPEN') AS status_resolved
        |FROM orders""".stripMargin,
    "h4_time_arith" ->
      """SELECT o_orderkey,
        |CAST(epoch(o_orderdate) AS BIGINT) AS epoch_s,
        |date_diff('day', DATE '1995-01-01', o_orderdate) AS days_since_1995
        |FROM orders""".stripMargin,
    "h8_lap_format" ->
      """SELECT l_orderkey, l_linenumber,
        |CAST(FLOOR(l_extendedprice / 60000) AS BIGINT) || ':' ||
        |lpad(CAST(CAST(FLOOR(l_extendedprice / 1000) AS BIGINT) % 60 AS VARCHAR), 2, '0') || '.' ||
        |lpad(CAST(CAST(FLOOR(l_extendedprice) AS BIGINT) % 1000 AS VARCHAR), 3, '0') AS lap_time_str
        |FROM lineitem""".stripMargin,
    "h5_name_normalize" ->
      """SELECT p_partkey,
        |regexp_replace(trim(lower(regexp_replace(p_name, ' (widget|bolt|gear)$', ''))), ' +', '_', 'g') AS name_norm
        |FROM part""".stripMargin,
    "h7_status_ladder" ->
      """SELECT o_orderkey,
        |CASE WHEN lower(o_orderpriority) LIKE '%urgent%' THEN 'CRITICAL'
        |     WHEN lower(o_orderpriority) LIKE '%high%' THEN 'ELEVATED'
        |     WHEN lower(o_orderpriority) SIMILAR TO '.*(medium|low).*' THEN 'ROUTINE'
        |     ELSE 'UNKNOWN' END AS priority_bucket
        |FROM orders""".stripMargin,
    "h11_regexp_extract" ->
      """SELECT event_id,
        |CAST(NULLIF(regexp_extract(props, '"k": (\d+)', 1), '') AS BIGINT) AS k_value
        |FROM events""".stripMargin,
    "h17_url_parse" ->
      """SELECT doc_id,
        |  'https://host' || CAST(doc_id % 7 AS VARCHAR) ||
        |    '.example.org/docs/' || CAST(doc_id AS VARCHAR) ||
        |    '?lang=' || lang || '&ref=graft' AS url,
        |  'host' || CAST(doc_id % 7 AS VARCHAR) || '.example.org' AS host,
        |  '/docs/' || CAST(doc_id AS VARCHAR) AS path,
        |  lang AS q_lang
        |FROM documents""".stripMargin,
    "h16_json_extract" ->
      """SELECT event_id,
        |CAST(json_extract_string(props, '$.k') AS BIGINT) AS k_path,
        |CAST(json_extract_string(props, '$.k') AS BIGINT) AS k_typed
        |FROM events""".stripMargin,
    "h12_explode_words" ->
      """SELECT word, COUNT(*) AS n FROM
        |(SELECT unnest(string_split(p_name, ' ')) AS word FROM part)
        |GROUP BY word""".stripMargin,
    "h13_levenshtein" ->
      """SELECT a.n_name AS name_a, b.n_name AS name_b,
        |CAST(levenshtein(a.n_name, b.n_name) AS BIGINT) AS dist
        |FROM nation a, nation b
        |WHERE a.n_name < b.n_name
        |  AND levenshtein(a.n_name, b.n_name) <= 6""".stripMargin,
    "h21_soundex" ->
      """WITH toks AS (
        |  SELECT tok, CAST(COUNT(*) AS BIGINT) AS n FROM (
        |    SELECT unnest(string_split(p_name, ' ')) AS tok FROM part) z
        |  WHERE length(tok) > 0 GROUP BY 1),
        |up AS (SELECT tok, n,
        |    regexp_replace(upper(tok), '[^A-Z]', '', 'g') AS u
        |  FROM toks),
        |ds AS (SELECT tok, n, u,
        |    translate(u, 'ABCDEFGHIJKLMNOPQRSTUVWXYZ',
        |      '01230129022455012623019202') AS d
        |  FROM up WHERE length(u) > 0),
        |pos AS (SELECT tok, i, substr(d, i, 1) AS di
        |  FROM ds, unnest(generate_series(1, length(d))) AS s(i)),
        |pv AS (SELECT tok, i, di,
        |    MAX(CASE WHEN di <> '9' THEN i END) OVER (PARTITION BY tok
        |      ORDER BY i ROWS BETWEEN UNBOUNDED PRECEDING AND
        |      1 PRECEDING) AS pj
        |  FROM pos),
        |pd AS (SELECT a.tok, a.i, a.di, b.di AS prev_d
        |  FROM pv a LEFT JOIN pos b ON a.tok = b.tok AND a.pj = b.i),
        |kept AS (SELECT tok, i, di FROM pd
        |  WHERE i > 1 AND di IN ('1', '2', '3', '4', '5', '6')
        |    AND (prev_d IS NULL OR di <> prev_d)),
        |digits AS (SELECT tok, string_agg(di, '' ORDER BY i) AS dd
        |  FROM kept GROUP BY 1),
        |coded AS (SELECT ds.tok, ds.n,
        |    substr(ds.u, 1, 1) || substr(COALESCE(dd, '') || '000', 1, 3)
        |      AS code
        |  FROM ds LEFT JOIN digits USING (tok)),
        |blocks AS (SELECT code, CAST(COUNT(*) AS BIGINT) AS block_size
        |  FROM coded GROUP BY 1)
        |SELECT tok, n, coded.code, block_size
        |FROM coded JOIN blocks USING (code)""".stripMargin,
    "h19_jaro_winkler" ->
      """SELECT c_custkey,
        |  jaro_winkler_similarity(c_name,
        |    substr(c_name, 1, 9) || substr(c_name, 11, 1) ||
        |    substr(c_name, 10, 1) || substr(c_name, 12)) AS jw_swap,
        |  jaro_winkler_similarity(c_name,
        |    substr(c_name, 1, 9) || substr(c_name, 11)) AS jw_drop,
        |  jaro_winkler_similarity(c_name, c_mktsegment) AS jw_seg
        |FROM customer""".stripMargin,
    "h20_damerau" ->
      """SELECT c_custkey,
        |  CAST(damerau_levenshtein(c_name,
        |    substr(c_name, 1, 9) || substr(c_name, 11, 1) ||
        |    substr(c_name, 10, 1) || substr(c_name, 12)) AS BIGINT)
        |    AS dl_swap,
        |  CAST(levenshtein(c_name,
        |    substr(c_name, 1, 9) || substr(c_name, 11, 1) ||
        |    substr(c_name, 10, 1) || substr(c_name, 12)) AS BIGINT)
        |    AS lev_swap,
        |  CAST(damerau_levenshtein(c_name, c_mktsegment) AS BIGINT)
        |    AS dl_seg
        |FROM customer""".stripMargin,
    "h15_greatest_least" ->
      """SELECT l_orderkey, l_linenumber,
        |GREATEST(l_quantity, l_discount * 100, l_tax * 100) AS g3,
        |LEAST(l_quantity, l_discount * 100, l_tax * 100) AS l3
        |FROM lineitem""".stripMargin,
    "h14_array_hof" ->
      """SELECT p_partkey,
        |CAST(len(string_split(p_name, ' ')) AS BIGINT) AS n_words,
        |CAST(len(list_filter(string_split(p_name, ' '),
        |  w -> strlen(w) > 5)) AS BIGINT) AS n_long,
        |CAST(list_max(list_transform(string_split(p_name, ' '),
        |  w -> strlen(w))) AS BIGINT) AS max_len,
        |list_contains(string_split(p_name, ' '), 'green') AS has_green
        |FROM part""".stripMargin,
    "h18_calendar" ->
      """SELECT o_orderkey,
        |  CAST(year(CAST(o_orderdate AS DATE)) AS BIGINT) AS y,
        |  CAST(quarter(CAST(o_orderdate AS DATE)) AS BIGINT) AS q,
        |  CAST(month(CAST(o_orderdate AS DATE)) AS BIGINT) AS m,
        |  CAST(day(CAST(o_orderdate AS DATE)) AS BIGINT) AS dom,
        |  CAST(weekofyear(CAST(o_orderdate AS DATE)) AS BIGINT) AS iso_week,
        |  CAST(CAST(last_day(CAST(o_orderdate AS DATE)) AS DATE)
        |    AS VARCHAR) AS month_end,
        |  CAST(CAST(CAST(o_orderdate AS DATE) + INTERVAL 3 MONTH AS DATE)
        |    AS VARCHAR) AS plus_quarter
        |FROM orders""".stripMargin,
  )
}
