package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.silver.SilverTransforms

class SilverSpec extends SparkSpec {
  import graft.core.F1Fixtures._

  private def sessionsBronze: DataFrame = {
    import spark.implicits._
    // duplicate every row to exercise the distinct() (per-driver dumps)
    (sessionRows ++ sessionRows).toDF()
  }

  test("sessions: distinct, normalized GP, duration, sprint flag") {
    val out = SilverTransforms.sessions(sessionsBronze).cache()
    assert(out.count() == 6)
    val byKey = out.collect().map(r =>
      r.getAs[Long]("session_key") -> r).toMap
    assert(byKey(201).getAs[String]("grand_prix_name") == "sao_paulo")
    assert(byKey(301).getAs[String]("grand_prix_name") == "emilia_romagna")
    assert(byKey(101).getAs[Int]("session_duration_minutes") == 60)
    assert(byKey(102).getAs[Int]("session_duration_minutes") == 105)
    // sao_paulo is on the sprint calendar; bahrain is not
    assert(byKey(201).getAs[Boolean]("is_sprint_weekend"))
    assert(!byKey(101).getAs[Boolean]("is_sprint_weekend"))
    assert(byKey(102).getAs[String]("session_type") == "race")
  }

  test("qualifying: array parse incl short arrays, gap to pole, status") {
    import spark.implicits._
    val out = SilverTransforms.qualifying(qualiRows.toDF()).cache()
    assert(out.count() == 6)
    val k = out.collect().map(r =>
      (r.getAs[Long]("session_key"), r.getAs[Int]("driver_number")) -> r)
      .toMap
    assert(k((101L, 44)).getAs[Long]("q3_time_millis") == 79351L)
    assert(k((101L, 44)).getAs[Long]("gap_to_pole_millis") == 351L)
    assert(k((101L, 44)).getAs[String]("qualifying_status") == "Q3")
    // len-2 array: no Q3, fastest = Q2
    assert(k((201L, 44)).isNullAt(k((201L, 44)).fieldIndex("q3_time_millis")))
    assert(k((201L, 44)).getAs[Long]("fastest_qualifying_time_millis") == 69900L)
    assert(k((201L, 44)).getAs[String]("qualifying_status") == "Q2-OUT")
    assert(k((201L, 44)).getAs[Long]("gap_to_pole_millis") == 900L)
    // len-1 array: Q1 only
    assert(k((301L, 44)).getAs[String]("qualifying_status") == "Q1-OUT")
    assert(k((301L, 44)).getAs[Long]("gap_to_pole_millis") == 2000L)
    // pole rows gap 0
    assert(k((101L, 1)).getAs[Long]("gap_to_pole_millis") == 0L)
  }

  test("race results: validated points, gained, status, time format") {
    import spark.implicits._
    val out = SilverTransforms.raceResults(raceRows.toDF()).cache()
    assert(out.count() == 6)
    val k = out.collect().map(r =>
      (r.getAs[Long]("session_key"), r.getAs[Int]("driver_number")) -> r)
      .toMap
    // raw 19.0 vs ladder 18.0 for P2
    assert(k((102L, 44)).getAs[Double]("points") == 19.0)
    assert(k((102L, 44)).getAs[Double]("validated_points") == 18.0)
    assert(k((202L, 44)).getAs[Int]("positions_gained") == 1)
    assert(k((302L, 1)).getAs[Int]("positions_gained") == 0) // DNF
    assert(k((302L, 1)).getAs[String]("standardized_status") == "DNF")
    assert(k((102L, 1)).getAs[String]("standardized_status") == "Finished")
    assert(k((102L, 1)).getAs[String]("time") == "01:30:00.123")
    assert(k((102L, 44)).getAs[Long]("gap_to_winner_millis") == 5377L)
  }

  test("laps: sector fallback, tie-broken fastest lap, personal bests") {
    import spark.implicits._
    val out = SilverTransforms.laps(lapRows.toDF()).cache()
    assert(out.count() == 4) // null-time lap dropped
    assert(!out.columns.contains("segments_sector_1"))
    val k = out.collect().map(r =>
      (r.getAs[Int]("driver_number"), r.getAs[Int]("lap_number")) -> r).toMap
    assert(k((44, 1)).getAs[Long]("lap_time_millis") == 83300L)
    // tie at 80000 ms: driver 1 wins the fastest-lap flag
    assert(k((1, 2)).getAs[Boolean]("is_fastest_lap"))
    assert(!k((44, 2)).getAs[Boolean]("is_fastest_lap"))
    assert(k((44, 2)).getAs[Boolean]("is_personal_best"))
    assert(!k((1, 1)).getAs[Boolean]("is_personal_best"))
    assert(k((1, 2)).getAs[String]("lap_time") == "1:20.000")
  }

  test("pitstops: validity window and decimal seconds") {
    import spark.implicits._
    val out = SilverTransforms.pitstops(pitRows.toDF()).cache()
    assert(out.count() == 1)
    val r = out.head()
    assert(r.getAs[java.math.BigDecimal]("pit_duration")
      .compareTo(new java.math.BigDecimal("22.456")) == 0)
    assert(r.getAs[Boolean]("undercut_attempt"))
  }
}
