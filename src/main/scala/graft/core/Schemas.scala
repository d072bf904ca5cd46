package graft.core

import org.apache.spark.sql.types._

/** Declared schemas for the Silver and Gold tables, mirroring the
  * reference's schema registry (`utils/table_management/schemas.py:16-221`
  * in /root/reference) as `StructType` constants. Audit columns
  * (`created_at`/`updated_at`) ride on every table.
  */
object Schemas {

  private def audit: Seq[StructField] = Seq(
    StructField("created_at", TimestampType),
    StructField("updated_at", TimestampType))

  // ---- Silver (schemas.py:16-135) ----

  val sessionsSilver: StructType = StructType(Seq(
    StructField("session_key", LongType),
    StructField("session_type", StringType),
    StructField("session_name", StringType),
    StructField("meeting_key", LongType),
    StructField("grand_prix_name", StringType),
    StructField("date_start", TimestampType),
    StructField("date_end", TimestampType),
    StructField("year", IntegerType),
    StructField("session_duration_minutes", DoubleType),
    StructField("is_sprint_weekend", BooleanType)) ++ audit)

  val driversSilver: StructType = StructType(Seq(
    StructField("driver_number", IntegerType),
    StructField("broadcast_name", StringType),
    StructField("full_name", StringType),
    StructField("team_name", StringType),
    StructField("country_code", StringType),
    StructField("team_colour", StringType),
    StructField("name_acronym", StringType),
    StructField("total_races", IntegerType),
    StructField("valid_from", TimestampType),
    StructField("valid_to", TimestampType),
    StructField("is_current", BooleanType)) ++ audit)

  val qualifyingResultsSilver: StructType = StructType(Seq(
    StructField("session_key", LongType),
    StructField("driver_number", IntegerType),
    StructField("position", IntegerType),
    StructField("q1_time_millis", LongType),
    StructField("q2_time_millis", LongType),
    StructField("q3_time_millis", LongType),
    StructField("fastest_qualifying_time_millis", LongType),
    StructField("gap_to_pole_millis", LongType),
    StructField("qualifying_status", StringType),
    StructField("year", IntegerType),
    StructField("grand_prix_name", StringType)) ++ audit)

  val raceResultsSilver: StructType = StructType(Seq(
    StructField("session_key", LongType),
    StructField("driver_number", IntegerType),
    StructField("position", IntegerType),
    StructField("grid_position", IntegerType),
    StructField("points", DoubleType),
    StructField("validated_points", DoubleType),
    StructField("positions_gained", IntegerType),
    StructField("time", StringType),
    StructField("gap_to_winner_millis", LongType),
    StructField("status", StringType),
    StructField("standardized_status", StringType),
    StructField("year", IntegerType),
    StructField("grand_prix_name", StringType)) ++ audit)

  val lapsSilver: StructType = StructType(Seq(
    StructField("session_key", LongType),
    StructField("driver_number", IntegerType),
    StructField("lap_number", IntegerType),
    StructField("lap_time", StringType),
    StructField("lap_time_millis", LongType),
    StructField("position_at_lap", IntegerType),
    StructField("gap_to_leader_millis", LongType),
    StructField("interval_to_ahead_millis", LongType),
    StructField("is_personal_best", BooleanType),
    StructField("is_fastest_lap", BooleanType),
    StructField("tire_compound", StringType),
    StructField("track_status", StringType),
    StructField("year", IntegerType),
    StructField("grand_prix_name", StringType),
    StructField("session_type", StringType)) ++ audit)

  val pitstopsSilver: StructType = StructType(Seq(
    StructField("session_key", LongType),
    StructField("driver_number", IntegerType),
    StructField("lap_number", IntegerType),
    StructField("pit_duration", DecimalType(6, 3)),
    StructField("positions_lost_gained", IntegerType),
    StructField("undercut_attempt", BooleanType),
    StructField("safety_car_stop", BooleanType),
    StructField("tire_compound_old", StringType),
    StructField("tire_compound_new", StringType),
    StructField("year", IntegerType),
    StructField("grand_prix_name", StringType)) ++ audit)

  // ---- Gold (schemas.py:141-221) ----

  val driverPerformanceSummaryQualifying: StructType = StructType(Seq(
    StructField("session_key", LongType),
    StructField("driver_number", IntegerType),
    StructField("full_name", StringType),
    StructField("team_name", StringType),
    StructField("race_date", DateType),
    StructField("round_number", IntegerType),
    StructField("qualifying_position", IntegerType),
    StructField("gap_to_pole_seconds", DecimalType(5, 3)),
    StructField("made_q3", BooleanType),
    StructField("season_avg_qualifying_position", DecimalType(4, 1)),
    StructField("year", IntegerType),
    StructField("grand_prix_name", StringType)) ++ audit)

  val driverPerformanceSummaryRace: StructType = StructType(Seq(
    StructField("session_key", LongType),
    StructField("driver_number", IntegerType),
    StructField("full_name", StringType),
    StructField("team_name", StringType),
    StructField("race_date", DateType),
    StructField("round_number", IntegerType),
    StructField("grid_position", IntegerType),
    StructField("finish_position", IntegerType),
    StructField("race_points", DoubleType),
    StructField("positions_gained", IntegerType),
    StructField("season_points_total", DoubleType),
    StructField("year", IntegerType),
    StructField("grand_prix_name", StringType)) ++ audit)

  val championshipTracker: StructType = StructType(Seq(
    StructField("race_date", DateType),
    StructField("round_number", IntegerType),
    StructField("driver_number", IntegerType),
    StructField("full_name", StringType),
    StructField("team_name", StringType),
    StructField("race_points", DoubleType),
    StructField("season_points_total", DoubleType),
    StructField("championship_position", IntegerType),
    StructField("points_gap_to_leader", DoubleType),
    StructField("year", IntegerType),
    StructField("grand_prix_name", StringType)) ++ audit)

  val raceWeekendInsights: StructType = StructType(Seq(
    StructField("year", IntegerType),
    StructField("grand_prix_name", StringType),
    StructField("race_date", DateType),
    StructField("pole_position_driver", StringType),
    StructField("race_winner_driver", StringType),
    StructField("race_winner_team", StringType),
    StructField("pole_to_win", BooleanType),
    StructField("total_finishers", IntegerType),
    StructField("dnf_count", IntegerType)) ++ audit)
}
