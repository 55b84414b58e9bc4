package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Corpus scan (SURVEY.md §2.1 S1-S3, §2.2 P1): recursive directory walk +
  * regex path filter + whole-file read + mtime projection.
  *
  * The reference walks the tree in a single-threaded Python generator
  * (reference `vectrekker/main.py:62-68,139-141`) and reads each file later
  * (`main.py:174`). Spark's `binaryFile` source gives the same record shape —
  * `(path, modificationTime, length, content)` — with distributed listing and
  * reading; the regex filter applies before content is materialized
  * (column pruning: a plan that only uses `path`/`mtime` never reads bytes).
  */
object FileScan {

  /** One row per matching file: (path, mtime epoch-seconds, text). */
  def scan(spark: SparkSession, rootDir: String,
           pathRegex: String = ".*\\.md$"): DataFrame =
    spark.read.format("binaryFile")
      .option("recursiveFileLookup", "true")
      .load(rootDir)
      .filter(col("path").rlike(pathRegex))
      .select(
        col("path"),
        // epoch seconds, matching the reference's int(getmtime) (main.py:59)
        unix_timestamp(col("modificationTime")).as("mtime"),
        decode(col("content"), "UTF-8").as("text"))
}
