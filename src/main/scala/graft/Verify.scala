package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {
  def main(args: Array[String]): Unit = {
    val Array(sfDir, outDir) = args
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      // events.ts is TIMESTAMP(NANOS); Spark 4 needs this to read it at all
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()
    // optional focus filter (same contract as Bench): comma-separated name
    // substrings — lets a local correctness spot-check dump one query
    // instead of all of them. The driver never sets it.
    val only = sys.env.get("SPARK_GRAFT_ONLY").map(_.split(',').toSeq)
    val selected = SparkEntry.queries.filter { case (name, _) =>
      only.forall(_.exists(name.contains))
    }
    selected.foreach { case (name, fn) =>
      // operators cache() internally and never unpersist — without this the
      // cached relations of all 56 queries accumulate in one executor heap
      // (fine at sf0.01, memory pressure at sf0.1+). Bench does the same.
      spark.catalog.clearCache()
      // no coalesce(1): a single-partition write funnels large results
      // through one task (and one heap); the driver's DuckDB compare globs
      // the directory, so a partitioned dump reads identically
      try fn(spark, sfDir).write.mode("overwrite")
        .parquet(s"$outDir/$name")
      catch { case e: Throwable =>
        System.err.println(s"[verify] $name failed: ${e.getMessage}")
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
      .filter { case (k, _) => selected.contains(k) }
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    // One-time artifact-build costs paid during THIS verify pass (r16
    // verdict item 3: builds paid in Verify were invisible — Bench's later
    // drain found an already-warm store and published an empty builds map).
    // Same drain Bench uses; written next to oracle_sql.json AND printed as
    // one JSON line so a cold-store verify's true cost is auditable from
    // either the dump dir or the captured log.
    val builds = graft.pipeline.ArtifactStore.drainBuildTimes()
    val buildsJson = builds
      .map { case (n, sec) => s"${q(n)}: ${f"$sec%.2f"}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/builds.json"), buildsJson)
    if (builds.nonEmpty)
      println(s"""{"verifyBuilds":$buildsJson,"bt":${f"${builds.map(_._2).sum}%.2f"},"bn":${builds.size}}""")
    spark.stop()
  }
}
