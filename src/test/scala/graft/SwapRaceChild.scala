package graft

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileSystem, Path}

/** Child process of [[ArtifactStoreSpec]]'s cross-process swap race (r12
  * verdict task 6): the in-JVM `synchronized` lock cannot serialize two
  * PROCESSES, so the cross-process story rests on [[graft.pipeline.StagedSwap]]
  * alone — this main hammers staged promotions against a shared live path
  * from a separate JVM. Each generation is `nFiles` content files all
  * carrying the same tag plus a `_SUCCESS` marker; a racing loser's
  * sys.error is caught and counted, the loop continues. Exit: writes
  * "<ok>/<attempts>" to the report file; the parent asserts progress and
  * final-state integrity.
  *
  * Plain Hadoop FS only (no Spark session) — the race under test is the
  * rename choreography, not parquet writing.
  */
object SwapRaceChild {
  def main(args: Array[String]): Unit = {
    val Array(liveStr, procId, itersStr, reportStr) = args
    val iters = itersStr.toInt
    val fs = FileSystem.getLocal(new Configuration()).getRawFileSystem
    val live = new Path(liveStr)
    var ok = 0
    for (i <- 1 to iters) {
      val tag = s"gen-$procId-$i"
      val tmp = new Path(liveStr + s".tmp-$procId-$i")
      try {
        fs.mkdirs(tmp)
        for (k <- 0 until 6) {
          val out = fs.create(new Path(tmp, s"part-$k.txt"), true)
          out.write(tag.getBytes("UTF-8")); out.close()
        }
        fs.create(new Path(tmp, "_SUCCESS"), true).close()
        graft.pipeline.StagedSwap.swap(fs, tmp, live,
          new Path(liveStr + s".old-$procId"))
        ok += 1
      } catch { case _: Throwable => () } // racing loser: documented outcome
    }
    val rep = new java.io.FileWriter(reportStr)
    rep.write(s"$ok/$iters"); rep.close()
  }
}
