package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. Accepts one
  * or more (sfDir, outDir) pairs — extra pairs rerun the full dump
  * against further fixtures IN THE SAME JVM (preflight's edge/empty
  * sweeps ride along instead of paying two more JVM + session
  * startups; the driver's 2-arg invocation is unchanged). */
object Verify {
  def main(args: Array[String]): Unit = {
    require(args.length >= 2 && args.length % 2 == 0,
      "usage: Verify <sfDir> <outDir> [<sfDir2> <outDir2> ...]")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      Runtime.getRuntime.availableProcessors().toString)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.extensions", "graft.core.GraftExtensions")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      // If events.parquet carries TIMESTAMP(NANOS) (one of the fixture's
      // historical contracts), surface it as long nanos instead of
      // rejecting it; a timestamp[us] fixture ignores this flag and
      // Tables.eventsUs adapts either way.
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // Optional comma-separated filter for fast local iteration (absent on
    // driver runs → full catalog; oracle_sql.json always covers it all).
    val only = sys.env.get("SPARK_GRAFT_ONLY")
      .map(_.split(',').map(_.trim).filter(_.nonEmpty).toSet)
    // exit code stays 0 even on per-query failures — the per-pair
    // errors.json and the "[verify] … failed" stderr lines are the
    // contract callers (driver, preflight's grep) consume
    // strict map THEN filter — running the fixture dump inside a
    // pattern guard would tie single-evaluation to collect's
    // applyOrElse contract
    val pairResults = args.grouped(2).toSeq.map { case Array(sfDir, outDir) =>
      sfDir -> runPair(spark, sfDir, outDir, only)
    }
    val failedPairs = pairResults.collect { case (sfDir, true) => sfDir }
    if (failedPairs.nonEmpty && args.length > 2)
      System.err.println(s"[verify] failures in ${failedPairs.size}/${
        args.length / 2} fixture pairs: ${failedPairs.mkString(", ")}")
    spark.stop()
  }

  /** Dump one fixture's full catalog + oracle/errors json; returns
    * whether any query failed. */
  private def runPair(spark: SparkSession, sfDir: String, outDir: String,
                      only: Option[Set[String]]): Boolean = {
    new java.io.File(outDir).mkdirs()
    // A throwing query must leave a driver-visible record, not a silent
    // gap: every failure lands in errors.json (always written, {} when
    // clean) so a registered query with no output dir reads as FAIL, not
    // as "not run" (round-5 lesson: 26 broken queries hid behind an
    // all-green 216-row report).
    val errors = scala.collection.mutable.LinkedHashMap[String, String]()
    SparkEntry.queries
      .filter { case (name, _) => only.forall(_.contains(name)) }
      .foreach { case (name, fn) =>
      // per-query owner scope: GlobalRank layout checkpoints free at the
      // query boundary (the result parquet is fully written; the frame
      // is discarded) without touching any other owner's layouts
      try graft.operators.GlobalRank.withScope {
        fn(spark, sfDir).coalesce(1).write.mode("overwrite")
          .parquet(s"$outDir/$name")
      }
      catch { case e: Throwable =>
        System.err.println(s"[verify] $name failed: ${e.getMessage}")
        errors(name) =
          Option(e.getMessage).getOrElse(e.getClass.getName).take(500)
      }
    }
    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val json = SparkEntry.oracleSql
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    val errJson = errors
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/errors.json"), errJson)
    if (errors.nonEmpty)
      System.err.println(s"[verify] ${errors.size} quer${
        if (errors.size == 1) "y" else "ies"} FAILED: ${
        errors.keys.mkString(", ")}")
    errors.nonEmpty
  }
}
