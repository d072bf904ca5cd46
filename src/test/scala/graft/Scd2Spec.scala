package graft

import org.apache.spark.sql.functions._

import graft.io.Scd2

class Scd2Spec extends SparkSpec {
  import graft.core.F1Fixtures._

  private def obsDF(obs: Seq[DriverObs]) = {
    import spark.implicits._
    obs.toDF()
  }

  test("historical build: one row per stint, closed by successor") {
    val dim = Scd2.buildHistorical(obsDF(driverObs)).cache()
    assert(dim.count() == 3) // #1 x1, #44 x2
    val d44 = dim.filter(col("driver_number") === 44)
      .orderBy("valid_from").collect()
    assert(d44.length == 2)
    val (merc, ferrari) = (d44(0), d44(1))
    assert(merc.getAs[String]("team_name") ==
      "Mercedes-AMG PETRONAS F1 Team")
    assert(merc.getAs[java.sql.Timestamp]("valid_to") ==
      ferrari.getAs[java.sql.Timestamp]("valid_from"))
    assert(!merc.getAs[Boolean]("is_current"))
    assert(ferrari.getAs[Boolean]("is_current"))
    assert(ferrari.isNullAt(ferrari.fieldIndex("valid_to")))
    // career total spans stints
    assert(d44.forall(_.getAs[Int]("total_races") == 3))
  }

  test("incremental merge: new driver, team change, no change, re-run") {
    val existing = Scd2.buildHistorical(
      obsDF(driverObs.filter(_.session_key < 300))).cache()
    assert(existing.count() == 2)

    val batch = obsDF(driverObs.filter(_.session_key >= 300) :+
      DriverObs(81, "McLaren Formula 1 Team", "O PIASTRI", "Oscar Piastri",
        "AUS", "#FF8000", "PIA", ts("2025-05-01 15:00:00"), "Race", 302))

    val merged = Scd2.merge(existing, batch).cache()
    assert(merged.count() == 4)

    // no change: #1 untouched, still one current row
    val d1 = merged.filter(col("driver_number") === 1).collect()
    assert(d1.length == 1 && d1(0).getAs[Boolean]("is_current"))

    // team change: Mercedes row closed at batch date, Ferrari row current
    val d44 = merged.filter(col("driver_number") === 44)
      .orderBy("valid_from").collect()
    assert(d44.length == 2)
    assert(!d44(0).getAs[Boolean]("is_current"))
    assert(d44(0).getAs[java.sql.Timestamp]("valid_to") ==
      ts("2025-05-01 15:00:00"))
    assert(d44(1).getAs[String]("team_name") == "Scuderia Ferrari")
    assert(d44(1).getAs[Boolean]("is_current"))

    // new driver inserted current, with total_races from the batch
    val d81 = merged.filter(col("driver_number") === 81).collect()
    assert(d81.length == 1 && d81(0).getAs[Boolean]("is_current"))
    assert(d81(0).getAs[Int]("total_races") == 1)
    // team-change insert carries prior career races + batch races
    assert(d44(1).getAs[Int]("total_races") == 3)

    // idempotent re-run: same batch again changes nothing
    val again = Scd2.merge(merged, batch)
    assert(again.count() == 4)
    assert(again.filter(col("is_current") === true).count() == 3)
  }

  test("merge with raceHistory: total_races grows for NO_CHANGE drivers") {
    val existing = Scd2.buildHistorical(
      obsDF(driverObs.filter(_.session_key < 300))).cache()
    val batch = obsDF(driverObs.filter(_.session_key >= 300))
    val history = obsDF(driverObs)

    val merged = Scd2.merge(existing, batch, Some(history)).cache()
    // #1 stayed at Red Bull (NO_CHANGE) but raced in all 3 races
    val d1 = merged.filter(col("driver_number") === 1).collect()
    assert(d1.length == 1 && d1(0).getAs[Boolean]("is_current"))
    assert(d1(0).getAs[Int]("total_races") == 3)
    // team-change driver's new current row also carries the career total
    val d44cur = merged.filter(col("driver_number") === 44 &&
      col("is_current")).collect()
    assert(d44cur.length == 1)
    assert(d44cur(0).getAs[Int]("total_races") == 3)
    // closed rows keep their historical snapshot
    val d44old = merged.filter(col("driver_number") === 44 &&
      !col("is_current")).collect()
    assert(d44old.length == 1)

    // re-running the same batch with the same history is a no-op:
    // countDistinct over session_key dedupes re-counted races
    val again = Scd2.merge(merged, batch, Some(history)).cache()
    assert(again.count() == merged.count())
    assert(again.filter(col("driver_number") === 1)
      .head().getAs[Int]("total_races") == 3)
  }
}
