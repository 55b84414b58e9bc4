package graft.tools

import graft.pipeline.GraftConfig
import org.apache.spark.sql.SparkSession

/** CLI entry point (reference E1): `graft.tools.Cli [--config <path>]
  * [--dry-run]` — the Spark analog of the reference's typer command
  * (`vectrekker/main.py:126-134`, `pyproject.toml` console script): load the
  * TOML config, run one incremental sync, print the report.
  *
  * Deliberate divergence (SURVEY §0, documented reference bug): the
  * reference's `--dry-run` prints "Dry run complete, exiting" but falls
  * through and indexes anyway (`main.py:155-156` — missing `return`); here a
  * dry run REALLY performs no writes ([[graft.pipeline.Sync]] short-circuits
  * before the index upsert and state write-back).
  */
object Cli {
  def main(args: Array[String]): Unit = {
    var configPath: java.nio.file.Path = GraftConfig.defaultPath
    var dryRun = false
    var i = 0
    while (i < args.length) {
      args(i) match {
        case "--config"  => require(i + 1 < args.length, "--config needs a path"); configPath = java.nio.file.Paths.get(args(i + 1)); i += 2
        case "--dry-run" => dryRun = true; i += 1
        case other => throw new IllegalArgumentException(
          s"unknown argument '$other' (usage: graft.tools.Cli [--config <path>] [--dry-run])")
      }
    }
    val cfg  = GraftConfig.load(configPath)
    val sync = GraftConfig.sync(cfg)
    val spark = SparkSession.builder()
      .master(sys.env.getOrElse("SPARK_MASTER", "local[4]"))
      .appName("graft-sync")
      .config("spark.sql.shuffle.partitions", sys.env.getOrElse("SPARK_GRAFT_CPUS", "4"))
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    try {
      val r = sync.run(spark, dryRun)
      println(s"[graft] scanned=${r.scanned} changed=${r.changed} " +
        s"skippedTooLong=${r.skippedTooLong} indexed=${r.indexed} " +
        s"deleted=${r.deleted} dryRun=${r.dryRun}")
      if (r.changed == 0 && r.deleted == 0) println("[graft] No files have changed, exiting")
      else if (dryRun) println("[graft] Dry run complete, exiting (no writes performed)")
    } finally spark.stop()
  }
}
