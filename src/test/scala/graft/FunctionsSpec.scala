package graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

import graft.functions.F1Functions._

/** Golden pairs from the reference docstrings (FIXTURES.md). */
class FunctionsSpec extends SparkSpec {

  private def eval(c: Column): Any =
    spark.range(1).select(c.as("v")).head().get(0)

  test("normalizeGrandPrix strips suffix, accents, case") {
    assert(eval(normalizeGrandPrix(lit("Bahrain Grand Prix"))) == "bahrain")
    assert(eval(normalizeGrandPrix(lit("São Paulo Grand Prix"))) == "sao_paulo")
    assert(eval(normalizeGrandPrix(lit("Emilia Romagna Grand Prix"))) ==
      "emilia_romagna")
  }

  test("standardizeTeam maps long forms to canonical names") {
    // golden pairs from the reference docstring (common.py:62-67)
    assert(eval(standardizeTeam(lit("Oracle Red Bull Racing"))) ==
      "Red Bull Racing")
    assert(eval(standardizeTeam(lit("Scuderia Ferrari"))) == "Ferrari")
    assert(eval(standardizeTeam(lit("Mercedes-AMG PETRONAS F1 Team"))) ==
      "Mercedes")
    assert(eval(standardizeTeam(
      lit("Aston Martin Aramco Cognizant F1 Team"))) == "Aston Martin")
    // rebrand entries (common.py:110-121): AlphaTauri→RB era, Sauber
    assert(eval(standardizeTeam(lit("Scuderia AlphaTauri"))) == "AlphaTauri")
    assert(eval(standardizeTeam(lit("RB F1 Team"))) == "RB")
    assert(eval(standardizeTeam(lit("Stake F1 Team"))) == "Sauber")
    assert(eval(standardizeTeam(lit("Alfa Romeo F1 Team"))) == "Alfa Romeo")
    // unmapped names fall back to the title-cased cleaned form
    assert(eval(standardizeTeam(lit("Brawn GP Racing"))) == "Brawn")
  }

  test("points ladder: 25-18-15..., 0 beyond P10 and for null") {
    val expected = Map(1 -> 25, 2 -> 18, 3 -> 15, 4 -> 12, 5 -> 10, 6 -> 8,
      7 -> 6, 8 -> 4, 9 -> 2, 10 -> 1, 11 -> 0, 20 -> 0)
    expected.foreach { case (pos, pts) =>
      assert(eval(pointsForPosition(lit(pos))) == pts, s"pos $pos")
    }
    assert(eval(pointsForPosition(lit(null).cast("int"))) == 0)
  }

  test("race points: fastest-lap bonus gated on top-10 and race session") {
    // reference docstring examples (business_logic.py:55-64)
    assert(eval(racePoints(lit(1), lit(true), lit("Race"))) == 26)
    assert(eval(racePoints(lit(1), lit(false), lit("Race"))) == 25)
    assert(eval(racePoints(lit(1), lit(true), lit("Qualifying"))) == 0)
    assert(eval(racePoints(lit(11), lit(true), lit("Race"))) == 0)
    assert(eval(racePoints(lit(10), lit(true), lit("Race"))) == 2)
    assert(eval(racePoints(lit(10), lit(null).cast("boolean"),
      lit("Race"))) == 1)
    // case-sensitive session gate, like the reference (business_logic.py:66)
    assert(eval(racePoints(lit(1), lit(true), lit("race"))) == 0)
    assert(eval(racePoints(lit(1), lit(true), lit("RACE"))) == 0)
    assert(eval(racePoints(lit(1), lit(true),
      lit(null).cast("string"))) == 0)
  }

  test("status buckets") {
    assert(eval(standardizeStatus(lit("Engine"))) == "DNF")
    assert(eval(standardizeStatus(lit("Collision"))) == "DNF")
    assert(eval(standardizeStatus(lit("Power Unit"))) == "DNF")
    assert(eval(standardizeStatus(lit("Damage"))) == "DNF")
    assert(eval(standardizeStatus(lit("disqualified"))) == "DSQ")
    assert(eval(standardizeStatus(lit("Excluded"))) == "DSQ")
    assert(eval(standardizeStatus(lit("Not started"))) == "DNS")
    assert(eval(standardizeStatus(lit("retired"))) == "Retired")
    assert(eval(standardizeStatus(lit("Withdrawn"))) == "Withdrawn")
    assert(eval(standardizeStatus(lit("+2 laps"))) == "Finished")
    assert(eval(standardizeStatus(lit("Lapped"))) == "Finished")
    // reference fallback: unmatched statuses pass through trimmed
    assert(eval(standardizeStatus(lit("  Puncture "))) == "Puncture")
    assert(eval(standardizeStatus(lit(null).cast("string"))) == "Unknown")
    assert(eval(standardizeStatus(lit(""))) == "Unknown")
  }

  test("md5_prefix60 equals the hex-chain formulation bit for bit") {
    import graft.functions.HashExpressions.md5Prefix60
    val samples = Seq("", "a", "abc", "the quick brown fox", "0:shingle",
      "São Paulo", "日本語テキスト", "x" * 500)
    samples.foreach { s =>
      val fused = eval(md5Prefix60(lit(s)))
      val chain = eval(conv(substring(md5(lit(s)), 1, 15), 16, 10)
        .cast("long"))
      assert(fused == chain, s"mismatch for '$s'")
    }
  }

  test("time string to millis") {
    assert(eval(timeStringToMillis(lit("1:23.456"))) == 83456L)
    assert(eval(timeStringToMillis(lit("23.456"))) == 23456L)
    assert(eval(timeStringToMillis(lit("1:23:45.678"))) == 5025678L)
  }

  test("time formatting round-trips") {
    assert(eval(formatLapTimeMillis(lit(83456.0))) == "1:23.456")
    assert(eval(formatRaceTimeMillis(lit(5025678.0))) == "01:23:45.678")
  }

  test("sprint detection matches raw and normalized location forms") {
    // normalized form (what SilverTransforms.sessions passes)
    assert(eval(detectSprintWeekend(lit("Race"), lit("united_states"))) == true)
    // raw meeting name (what the reference matches against)
    assert(eval(detectSprintWeekend(lit("Race"),
      lit("United States Grand Prix"))) == true)
    // circuit aliases from the reference list
    assert(eval(detectSprintWeekend(lit("Race"), lit("Interlagos"))) == true)
    assert(eval(detectSprintWeekend(lit("Race"), lit("Spielberg"))) == true)
    // explicit sprint mention wins regardless of location
    assert(eval(detectSprintWeekend(lit("Sprint Shootout"),
      lit("Monaco Grand Prix"))) == true)
    assert(eval(detectSprintWeekend(lit("Race"),
      lit("Monaco Grand Prix"))) == false)
    // word-anchored: a location merely CONTAINING a sprint token must not
    // fire ("austrian" ≠ "austria" as an underscore-delimited word)
    assert(eval(detectSprintWeekend(lit("Race"),
      lit("Austrian Village Grand Prix"))) == false)
    assert(eval(detectSprintWeekend(lit("Race"), lit("Austria"))) == true)
    // all-null input → false (reference returns False for empty), not null
    assert(eval(detectSprintWeekend(lit(null).cast("string"),
      lit(null).cast("string"))) == false)
  }

  test("madeQ3 / positionsGained") {
    assert(eval(madeQ3(lit(10))) == true)
    assert(eval(madeQ3(lit(11))) == false)
    assert(eval(positionsGained(lit(5), lit(2))) == 3)
    assert(eval(positionsGained(lit(null).cast("int"), lit(2))) == 0)
  }

  test("jaroWinkler bit-matches the DuckDB/RapidFuzz golden values") {
    import graft.functions.StringSimilarity.jaroWinkler
    def jw(a: String, b: String): Double =
      eval(jaroWinkler(lit(a), lit(b))).asInstanceOf[Double]
    // goldens captured from duckdb.jaro_winkler_similarity (exact
    // doubles — the h19 oracle compares unquantized)
    assert(jw("martha", "marhta") == 0.9611111111111111)
    assert(jw("DWAYNE", "DUANE") == 0.8400000000000001)
    assert(jw("DIXON", "DICKSONX") == 0.8133333333333332)
    assert(jw("CRATE", "TRACE") == 0.7333333333333334)
    assert(jw("hello world", "hello word") == 0.9818181818181818)
    // boost fires only above jaro 0.7, prefix capped at 4
    assert(jw("abcdxxxx", "abcdyyyy") == 0.6666666666666666)
    assert(jw("ab", "abcdefgh") == 0.8)
    assert(jw("aaaaaaaaaa", "aaaa") == 0.88)
    assert(jw("prefix_same", "prefix_diff") == 0.8545454545454545)
    assert(jw("abcde", "abxyz") == 0.6)
    // degenerate shapes: empties and zero-window length-1/2 strings
    assert(jw("abc", "abc") == 1.0)
    assert(jw("", "abc") == 0.0)
    assert(jw("", "") == 0.0)
    assert(jw("a", "b") == 0.0)
    assert(jw("ab", "ba") == 0.0)
    // null propagates (BinaryExpression null-safety)
    assert(eval(jaroWinkler(lit(null).cast("string"), lit("x"))) == null)
  }

  test("soundex4 implements the full H/W-transparent American rule") {
    import graft.functions.StringSimilarity.soundex4
    def sx(s: String): Any = eval(soundex4(lit(s)))
    def str(s: String): String = sx(s).toString
    // the canonical NARA examples, including the two the lossy
    // adjacent-only variant gets wrong (Ashcraft, Tymczak)
    assert(str("Robert") == "R163")
    assert(str("Rupert") == "R163")
    assert(str("Ashcraft") == "A261") // c after h collapses into s
    assert(str("Ashcroft") == "A261")
    assert(str("Tymczak") == "T522") // cz same-code adjacent collapse
    assert(str("Pfister") == "P236") // f collapses into same-code P
    assert(str("Honeyman") == "H555")
    assert(str("Smith") == str("Smyth"))
    // vowel separation repeats a code; single letters zero-pad
    assert(str("Sassy") == "S200")
    assert(str("Searches") == "S622")
    assert(str("a") == "A000")
    // case/noise handling and the letterless → NULL contract
    assert(str("o'Brien") == str("OBRIEN"))
    assert(sx("123") == null)
    assert(sx("") == null)
    assert(eval(soundex4(lit(null).cast("string"))) == null)
  }

  test("HilbertIndex is a true Hilbert curve on the full 32x32 grid") {
    import graft.functions.HilbertIndex.compute
    val n = 32
    // bijective onto [0, n²)
    val m = (for (x <- 0 until n; y <- 0 until n)
      yield compute(x, y, 5) -> (x, y)).toMap
    assert(m.size == n * n)
    assert(m.keys.min == 0L && m.keys.max == (n * n - 1).toLong)
    // the Hilbert property: consecutive indexes are grid-ADJACENT
    // (Manhattan step exactly 1) — Morton fails this at every
    // power-of-two seam, which is the whole point of z5 vs z1
    for (d <- 0L until (n * n - 1).toLong) {
      val (x1, y1) = m(d); val (x2, y2) = m(d + 1)
      assert(math.abs(x1 - x2) + math.abs(y1 - y2) == 1,
        s"jump at d=$d: ($x1,$y1) -> ($x2,$y2)")
    }
    // codegen path agrees with the interpreted path
    import graft.functions.SpatialExpressions.hilbertIndex
    val viaExpr = eval(hilbertIndex(lit(7L), lit(19L), 5))
    assert(viaExpr == compute(7L, 19L, 5))
  }

  test("damerauLevenshtein matches DuckDB's unrestricted-DL goldens") {
    import graft.functions.StringSimilarity.damerauLevenshtein
    def dl(a: String, b: String): Int =
      eval(damerauLevenshtein(lit(a), lit(b))).asInstanceOf[Int]
    // unrestricted (Lowrance–Wagner), NOT OSA: CA→ABC is 2, not 3
    assert(dl("CA", "ABC") == 2)
    assert(dl("ab", "ba") == 1)
    assert(dl("abc", "acb") == 1)
    assert(dl("kitten", "sitting") == 3)
    assert(dl("abcdef", "abdcfe") == 2)
    assert(dl("", "ab") == 2)
    assert(dl("a", "a") == 0)
    assert(eval(damerauLevenshtein(lit("x"),
      lit(null).cast("string"))) == null)
  }
}
