package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.Tables
import graft.functions.F1Functions
import graft.gold.GoldTransforms

/** End-to-end oracle coverage for the Gold F1 transforms
  * (championship_tracker_transform.py:170-353 and
  * race_weekend_insights_transform.py:170-395 in /root/reference).
  *
  * The F1-shaped inputs are derived DETERMINISTICALLY from the harness
  * star schema — 25 race weekends from `nation` (split over two seasons),
  * 100 drivers from `supplier`, and a full grid per race whose finishing
  * order is a bijective affine permutation (17 and 23 are coprime with
  * 100, so every position 1..100 appears exactly once per session). The
  * frames then flow through the REAL GoldTransforms code, and the DuckDB
  * oracle re-derives the same season from the same tables — so running
  * points, round numbers, championship rank with tie-break, gap to
  * leader, pole/winner/pole-to-win and finisher/DNF counts are all
  * hash-checked, not just fixture-asserted. All point values are small
  * integers carried as doubles, so running sums are exact in any
  * accumulation order.
  */
object GoldQueries {

  /** One row per race weekend: keys, season, date. Two seasons exercise
    * the year partitioning of round numbers and running points. */
  private def weekends(s: SparkSession, dir: String): DataFrame =
    Tables.nation(s, dir).select(
      col("n_nationkey").as("wk"),
      (col("n_nationkey") * 100 + 2).as("race_key"),
      (col("n_nationkey") * 100 + 1).as("quali_key"),
      when(col("n_nationkey") < 13, 2024).otherwise(2025).as("year"),
      col("n_name").as("grand_prix_name"),
      when(col("n_nationkey") < 13,
        date_add(to_date(lit("2024-03-01")),
          (col("n_nationkey") * 7).cast("int")))
        .otherwise(date_add(to_date(lit("2025-03-01")),
          ((col("n_nationkey") - 13) * 7).cast("int")))
        .as("race_date"))

  /** Sessions silver stand-in: one Race + one Qualifying per weekend. */
  private def sessions(s: SparkSession, dir: String): DataFrame = {
    val w = weekends(s, dir)
    val race = w.select(col("race_key").as("session_key"),
      lit("Race").as("session_type"), col("race_date").as("date_start"),
      col("year"), col("grand_prix_name"))
    val quali = w.select(col("quali_key").as("session_key"),
      lit("Qualifying").as("session_type"), col("race_date").as("date_start"),
      col("year"), col("grand_prix_name"))
    race.unionByName(quali)
  }

  /** Drivers dimension: all current (SCD2 current-row shape). */
  private def drivers(s: SparkSession, dir: String): DataFrame =
    Tables.supplier(s, dir).select(
      col("s_suppkey").as("driver_number"),
      col("s_name").as("full_name"),
      concat(lit("Team "), (col("s_nationkey") % 10).cast("string"))
        .as("team_name"),
      lit(true).as("is_current"))

  /** Bijective finishing position for (driver, weekend): mult coprime
    * with the 100-driver grid → a permutation of 1..100 per session. */
  private def position(mult: Int, shift: Int): org.apache.spark.sql.Column =
    (col("driver_number") * mult + col("wk") * shift) % 100 + 1

  /** Race results fact: full grid per race, ladder points, DNF tail;
    * grid position = the qualifying permutation, so positions_gained is
    * a real quali-vs-race delta. */
  private def raceResults(s: SparkSession, dir: String): DataFrame =
    weekends(s, dir).select("wk", "race_key")
      .crossJoin(drivers(s, dir).select("driver_number"))
      .select(col("race_key").as("session_key"), col("driver_number"),
        position(17, 31).as("position"),
        position(23, 7).as("grid_position"))
      .withColumn("points",
        F1Functions.pointsForPosition(col("position")).cast("double"))
      .withColumn("validated_points", lit(null).cast("double"))
      .withColumn("positions_gained",
        F1Functions.positionsGained(col("grid_position"), col("position")))
      .withColumn("standardized_status",
        when(col("position") > 80, "DNF").otherwise("Finished"))

  /** Qualifying fact: same grid, independent permutation; gap to pole in
    * exact quarter-second steps. */
  private def qualifying(s: SparkSession, dir: String): DataFrame =
    weekends(s, dir).select("wk", "quali_key")
      .crossJoin(drivers(s, dir).select("driver_number"))
      .select(col("quali_key").as("session_key"), col("driver_number"),
        position(23, 7).as("position"))
      .withColumn("gap_to_pole_millis", (col("position") - 1) * 250)

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Championship tracker end-to-end: running season points, per-race
    // rank with driver_number tie-break, gap to leader.
    // (race_date is surfaced as timestamp: the comparison harness
    // renders a bare DATE inconsistently across engines.)
    "gold1_championship" -> { (s, dir) =>
      GoldTransforms.championshipTracker(
          sessions(s, dir), raceResults(s, dir), drivers(s, dir))
        .drop("created_at", "updated_at")
        .withColumn("race_date", col("race_date").cast("timestamp"))
    },

    // Race weekend insights end-to-end: pole sitter, winner, pole-to-win
    // flag, finisher/DNF counts.
    "gold2_weekend_insights" -> { (s, dir) =>
      GoldTransforms.raceWeekendInsights(
          sessions(s, dir), qualifying(s, dir), raceResults(s, dir),
          drivers(s, dir))
        .drop("created_at", "updated_at")
        .withColumn("race_date", col("race_date").cast("timestamp"))
    },

    // Driver race performance end-to-end: per-(session, driver) line with
    // grid/finish, positions gained, running season points.
    "gold3_driver_race" -> { (s, dir) =>
      GoldTransforms.driverPerformanceRace(
          sessions(s, dir), raceResults(s, dir), drivers(s, dir))
        .drop("created_at", "updated_at")
        .withColumn("race_date", col("race_date").cast("timestamp"))
    },

    // Driver qualifying performance end-to-end: gap to pole (clamped,
    // decimal seconds), made-Q3 flag, running season average position.
    // The decimal columns are surfaced as double (the comparison harness
    // renders engine-native decimals inconsistently); the DECIMAL casts
    // inside the transform still round both sides identically first.
    "gold4_driver_quali" -> { (s, dir) =>
      GoldTransforms.driverPerformanceQualifying(
          sessions(s, dir), qualifying(s, dir), drivers(s, dir))
        .drop("created_at", "updated_at")
        .withColumn("race_date", col("race_date").cast("timestamp"))
        .withColumn("gap_to_pole_seconds",
          col("gap_to_pole_seconds").cast("double"))
        .withColumn("season_avg_qualifying_position",
          col("season_avg_qualifying_position").cast("double"))
    },
  )

  /** Shared oracle CTEs re-deriving the synthetic season in DuckDB. */
  private val seasonCtes =
    """w AS (
      |  SELECT n_nationkey AS wk,
      |    n_nationkey * 100 + 2 AS race_key,
      |    n_nationkey * 100 + 1 AS quali_key,
      |    CASE WHEN n_nationkey < 13 THEN 2024 ELSE 2025 END AS year,
      |    n_name AS grand_prix_name,
      |    CASE WHEN n_nationkey < 13
      |      THEN DATE '2024-03-01' + CAST(n_nationkey * 7 AS INTEGER)
      |      ELSE DATE '2025-03-01' + CAST((n_nationkey - 13) * 7 AS INTEGER)
      |    END AS race_date
      |  FROM nation),
      |d AS (
      |  SELECT s_suppkey AS driver_number, s_name AS full_name,
      |    'Team ' || CAST(s_nationkey % 10 AS VARCHAR) AS team_name
      |  FROM supplier),
      |rr AS (
      |  SELECT w.wk, w.year, w.grand_prix_name, w.race_date,
      |    d.driver_number, d.full_name, d.team_name,
      |    (d.driver_number * 17 + w.wk * 31) % 100 + 1 AS position
      |  FROM w CROSS JOIN d),
      |rpts AS (
      |  SELECT *,
      |    CAST(CASE position WHEN 1 THEN 25 WHEN 2 THEN 18 WHEN 3 THEN 15
      |      WHEN 4 THEN 12 WHEN 5 THEN 10 WHEN 6 THEN 8 WHEN 7 THEN 6
      |      WHEN 8 THEN 4 WHEN 9 THEN 2 WHEN 10 THEN 1 ELSE 0 END
      |      AS DOUBLE) AS race_points,
      |    CASE WHEN position > 80 THEN 'DNF' ELSE 'Finished' END
      |      AS standardized_status,
      |    CAST(dense_rank() OVER (PARTITION BY w.year ORDER BY w.race_date)
      |      AS INTEGER) AS round_number
      |  FROM rr w)""".stripMargin

  def oracleSql: Map[String, String] = Map(
    "gold1_championship" ->
      s"""WITH $seasonCtes,
         |run AS (
         |  SELECT *,
         |    SUM(race_points) OVER (PARTITION BY driver_number, year
         |      ORDER BY race_date, round_number
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
         |      AS season_points_total
         |  FROM rpts)
         |SELECT CAST(race_date AS TIMESTAMP) AS race_date,
         |  round_number, driver_number, full_name,
         |  team_name, race_points, season_points_total,
         |  CAST(rank() OVER (PARTITION BY year, race_date
         |    ORDER BY season_points_total DESC, driver_number ASC)
         |    AS INTEGER) AS championship_position,
         |  MAX(season_points_total) OVER (PARTITION BY year, race_date)
         |    - season_points_total AS points_gap_to_leader,
         |  year, grand_prix_name
         |FROM run""".stripMargin,
    "gold2_weekend_insights" ->
      s"""WITH $seasonCtes,
         |q AS (
         |  SELECT w.year, w.grand_prix_name, d.full_name,
         |    (d.driver_number * 23 + w.wk * 7) % 100 + 1 AS position
         |  FROM w CROSS JOIN d),
         |pole AS (
         |  SELECT year, grand_prix_name, full_name AS pole_position_driver
         |  FROM q WHERE position = 1),
         |winner AS (
         |  SELECT year, grand_prix_name,
         |    full_name AS race_winner_driver, team_name AS race_winner_team
         |  FROM rpts WHERE position = 1),
         |stats AS (
         |  SELECT year, grand_prix_name,
         |    CAST(COUNT(CASE WHEN position BETWEEN 1 AND 20 THEN 1 END)
         |      AS INTEGER) AS total_finishers,
         |    CAST(COUNT(CASE WHEN standardized_status = 'DNF' THEN 1 END)
         |      AS INTEGER) AS dnf_count
         |  FROM rpts GROUP BY year, grand_prix_name)
         |SELECT wk.year, wk.grand_prix_name,
         |  CAST(wk.race_date AS TIMESTAMP) AS race_date,
         |  pole_position_driver, race_winner_driver, race_winner_team,
         |  COALESCE(pole_position_driver IS NOT NULL AND
         |   pole_position_driver = race_winner_driver, FALSE) AS pole_to_win,
         |  total_finishers, dnf_count
         |FROM (SELECT DISTINCT year, grand_prix_name, race_date FROM w) wk
         |LEFT JOIN pole USING (year, grand_prix_name)
         |LEFT JOIN winner USING (year, grand_prix_name)
         |LEFT JOIN stats USING (year, grand_prix_name)""".stripMargin,
    "gold3_driver_race" ->
      s"""WITH $seasonCtes,
         |run AS (
         |  SELECT *,
         |    SUM(race_points) OVER (PARTITION BY driver_number, year
         |      ORDER BY race_date, round_number
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
         |      AS season_points_total
         |  FROM rpts)
         |SELECT wk * 100 + 2 AS session_key, driver_number, full_name,
         |  team_name, CAST(race_date AS TIMESTAMP) AS race_date,
         |  round_number,
         |  (driver_number * 23 + wk * 7) % 100 + 1 AS grid_position,
         |  position AS finish_position, race_points,
         |  (driver_number * 23 + wk * 7) % 100 + 1 - position
         |    AS positions_gained,
         |  season_points_total, year, grand_prix_name
         |FROM run""".stripMargin,
    "gold4_driver_quali" ->
      s"""WITH $seasonCtes,
         |q AS (
         |  SELECT wk, year, grand_prix_name, race_date, driver_number,
         |    full_name, team_name, round_number,
         |    (driver_number * 23 + wk * 7) % 100 + 1 AS qpos
         |  FROM rpts),
         |run AS (
         |  SELECT *,
         |    AVG(CAST(qpos AS DOUBLE)) OVER (PARTITION BY driver_number, year
         |      ORDER BY race_date, round_number
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS avg_pos
         |  FROM q)
         |SELECT wk * 100 + 1 AS session_key, driver_number, full_name,
         |  team_name, CAST(race_date AS TIMESTAMP) AS race_date,
         |  round_number, qpos AS qualifying_position,
         |  CAST(CAST((qpos - 1) * 250 / 1000.0 AS DECIMAL(5,3)) AS DOUBLE)
         |    AS gap_to_pole_seconds,
         |  qpos <= 10 AS made_q3,
         |  CAST(CAST(avg_pos AS DECIMAL(4,1)) AS DOUBLE)
         |    AS season_avg_qualifying_position,
         |  year, grand_prix_name
         |FROM run""".stripMargin,
  )
}
