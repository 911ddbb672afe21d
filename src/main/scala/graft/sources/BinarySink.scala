package graft.sources

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.DataFrame

/** Raw-bytes sinks — the reference's whole-file output path
  * (`NontabularFileLoader`, reference:
  * engine/wprdc_etl/pipeline/loaders.py:694-727, and the filestore
  * upload, loaders.py:188-330): "copy the artifact as-is", no tabular
  * interpretation.
  *
  * Two shapes:
  *  - [[copyFile]]: one source file → one destination file (the
  *    reference's exact semantics — its loader writes a single staged
  *    file object). Driver-side streaming copy; file-level I/O has no
  *    distributed component.
  *  - [[writeRows]]: a DataFrame of (name, content binary) rows →
  *    one file per row, written FROM THE EXECUTORS via foreachPartition —
  *    the distributed generalization the multimodal pack needs (q31/q32
  *    carry binary columns; at 100 TB the artifacts leave the cluster
  *    from every task, never through the driver).
  */
object BinarySink {

  /** Stream `in` into a new file at `dest` in 64 KiB chunks. On ANY
    * failure the partial output is deleted — the package invariant:
    * never leave a silently-truncated artifact behind. Does not close
    * `in` (caller's stream, caller's lifecycle). The single copy loop
    * shared by every file-producing path in this package, so the
    * cleanup invariant cannot drift between copies. */
  private[graft] def streamToFile(in: java.io.InputStream,
      fs: org.apache.hadoop.fs.FileSystem, dest: Path,
      overwrite: Boolean = true): Unit = {
    val out = fs.create(dest, overwrite)
    var ok = false
    try {
      val buf = new Array[Byte](65536)
      Iterator.continually(in.read(buf)).takeWhile(_ >= 0)
        .foreach(n => out.write(buf, 0, n))
      ok = true
    } finally {
      out.close()
      if (!ok) fs.delete(dest, false)
    }
  }

  /** Stream-copy `srcPath` to `destPath` (any Hadoop-visible FS pair).
    * `wipe` mirrors the loader's clear_first/wipe_data pre-truncate. */
  def copyFile(spark: org.apache.spark.sql.SparkSession, srcPath: String,
      destPath: String, wipe: Boolean = true): Unit = {
    val conf = spark.sessionState.newHadoopConf()
    val src = new Path(srcPath)
    val dst = new Path(destPath)
    val sfs = src.getFileSystem(conf)
    val dfs = dst.getFileSystem(conf)
    if (!wipe) require(!dfs.exists(dst), s"$destPath exists and wipe=false")
    Option(dst.getParent).foreach(dfs.mkdirs)
    val in = sfs.open(src)
    try streamToFile(in, dfs, dst, wipe) finally in.close()
  }

  /** Write each row of `df` — columns (`nameCol`: string, `contentCol`:
    * binary) — as `destDir/<name>`. Executor-side: every partition opens
    * its own FS handle and writes its rows directly; no collect, no
    * driver bottleneck. Names must be unique (caller's contract, as with
    * any file sink). */
  def writeRows(df: DataFrame, destDir: String,
      nameCol: String = "name", contentCol: String = "content"): Unit = {
    val confSer = new org.apache.spark.util.SerializableConfiguration(
      df.sparkSession.sessionState.newHadoopConf())
    val dest = destDir
    df.select(nameCol, contentCol).foreachPartition {
      (rows: Iterator[org.apache.spark.sql.Row]) =>
        val fs = new Path(dest).getFileSystem(confSer.value)
        fs.mkdirs(new Path(dest))
        rows.foreach { r =>
          val name = r.getString(0)
          require(name != null && name.nonEmpty,
            "binary sink: null/empty name cell")
          val bytes = r.getAs[Array[Byte]](1)
          require(bytes != null,
            s"binary sink: null content for '$name' - filter or coalesce " +
              "null artifacts before the sink")
          val p = new Path(dest, name)
          val out = fs.create(p, true)
          var ok = false
          try { out.write(bytes); ok = true }
          finally {
            out.close()
            // the package invariant: a failed write never leaves a
            // truncated artifact for downstream readers
            if (!ok) fs.delete(p, false)
          }
        }
    }
  }
}
