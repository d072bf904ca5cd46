package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.gold.GoldTransforms
import graft.io.Scd2
import graft.silver.SilverTransforms

/** End-to-end bronze → silver → gold on the mini season. */
class GoldSpec extends SparkSpec {
  import graft.core.F1Fixtures._

  private lazy val silver: (DataFrame, DataFrame, DataFrame, DataFrame) = {
    import spark.implicits._
    val sessions = SilverTransforms.sessions(sessionRows.toDF()).cache()
    val quali = SilverTransforms.qualifying(qualiRows.toDF()).cache()
    val race = SilverTransforms.raceResults(raceRows.toDF()).cache()
    val drivers = Scd2.buildHistorical(driverObs.toDF()).cache()
    (sessions, quali, race, drivers)
  }

  test("championship tracker: running points, tie-break rank, leader gap") {
    val (sessions, _, race, drivers) = silver
    val ct = GoldTransforms.championshipTracker(sessions, race, drivers)
      .cache()
    assert(ct.count() == 6)
    val k = ct.collect().map(r =>
      (r.getAs[java.sql.Date]("race_date").toString,
        r.getAs[Int]("driver_number")) -> r).toMap
    // after r2 both on 43 — countback tie-break gives distinct positions
    // (lower driver number first), but the points gap to the leader is 0
    assert(k(("2025-04-01", 1)).getAs[Double]("season_points_total") == 43.0)
    assert(k(("2025-04-01", 44)).getAs[Double]("season_points_total") == 43.0)
    assert(k(("2025-04-01", 1)).getAs[Int]("championship_position") == 1)
    assert(k(("2025-04-01", 44)).getAs[Int]("championship_position") == 2)
    assert(k(("2025-04-01", 44)).getAs[Double]("points_gap_to_leader") == 0.0)
    // r3: #44 wins title leg, #1 DNF keeps 43
    assert(k(("2025-05-01", 44)).getAs[Double]("season_points_total") == 68.0)
    assert(k(("2025-05-01", 44)).getAs[Int]("championship_position") == 1)
    assert(k(("2025-05-01", 1)).getAs[Double]("season_points_total") == 43.0)
    assert(k(("2025-05-01", 1)).getAs[Int]("championship_position") == 2)
    assert(k(("2025-05-01", 1)).getAs[Double]("points_gap_to_leader") == 25.0)
    // round numbers chronological
    assert(k(("2025-03-01", 1)).getAs[Int]("round_number") == 1)
    assert(k(("2025-05-01", 1)).getAs[Int]("round_number") == 3)
  }

  test("driver performance qualifying: gap seconds + running avg") {
    val (sessions, quali, _, drivers) = silver
    val q = GoldTransforms.driverPerformanceQualifying(sessions, quali,
      drivers).cache()
    assert(q.count() == 6)
    val k = q.collect().map(r =>
      (r.getAs[Long]("session_key"), r.getAs[Int]("driver_number")) -> r)
      .toMap
    assert(k((101L, 44)).getAs[java.math.BigDecimal]("gap_to_pole_seconds")
      .compareTo(new java.math.BigDecimal("0.351")) == 0)
    assert(k((101L, 44)).getAs[Boolean]("made_q3"))
    assert(k((301L, 44))
      .getAs[java.math.BigDecimal]("season_avg_qualifying_position")
      .compareTo(new java.math.BigDecimal("2.0")) == 0)
    assert(k((301L, 1))
      .getAs[java.math.BigDecimal]("season_avg_qualifying_position")
      .compareTo(new java.math.BigDecimal("1.0")) == 0)
  }

  test("driver performance race: season totals and finish data") {
    val (sessions, _, race, drivers) = silver
    val r = GoldTransforms.driverPerformanceRace(sessions, race, drivers)
      .cache()
    assert(r.count() == 6)
    val k = r.collect().map(row =>
      (row.getAs[Long]("session_key"), row.getAs[Int]("driver_number")) -> row)
      .toMap
    // validated points used over raw (19 → 18)
    assert(k((102L, 44)).getAs[Double]("race_points") == 18.0)
    assert(k((302L, 44)).getAs[Double]("season_points_total") == 68.0)
    assert(k((302L, 1)).isNullAt(k((302L, 1)).fieldIndex("finish_position")))
  }

  test("race weekend insights: pole, winner, pole-to-win, dnf counts") {
    val (sessions, quali, race, drivers) = silver
    val w = GoldTransforms.raceWeekendInsights(sessions, quali, race,
      drivers).cache()
    assert(w.count() == 3)
    val k = w.collect().map(r => r.getAs[String]("grand_prix_name") -> r)
      .toMap
    assert(k("bahrain").getAs[String]("pole_position_driver") ==
      "Max Verstappen")
    assert(k("bahrain").getAs[String]("race_winner_driver") ==
      "Max Verstappen")
    assert(k("bahrain").getAs[Boolean]("pole_to_win"))
    assert(k("bahrain").getAs[Int]("total_finishers") == 2)
    assert(k("bahrain").getAs[Int]("dnf_count") == 0)
    assert(k("emilia_romagna").getAs[String]("race_winner_driver") ==
      "Lewis Hamilton")
    assert(!k("emilia_romagna").getAs[Boolean]("pole_to_win"))
    assert(k("emilia_romagna").getAs[Int]("total_finishers") == 1)
    assert(k("emilia_romagna").getAs[Int]("dnf_count") == 1)
    assert(k("emilia_romagna").getAs[String]("race_winner_team") ==
      "Scuderia Ferrari")
  }
}
