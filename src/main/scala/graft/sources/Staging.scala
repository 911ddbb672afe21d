package graft.sources

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession

/** The remote-source staging seam. The reference's connector stack
  * (HTTP / SFTP / FTP / GCS, reference:
  * engine/wprdc_etl/pipeline/connectors.py:132-272) all reduces to one
  * contract: "materialize the remote object into a local staging path,
  * then the tabular extractors take over". Spark has no HTTP/SFTP
  * source, so the distributed pipeline starts AT the staged file — this
  * trait is the explicit boundary where a deployment plugs in its
  * fetchers (an HTTP impl is a ~10-line `URL#openStream` copy; an SFTP
  * impl wraps its client the same way; both are untestable in this
  * zero-egress sandbox, which is why only the contract + the local impl
  * live here).
  *
  * Implementations MUST be idempotent per (uri, stagingDir): re-fetching
  * the same uri overwrites the same staged path, mirroring the
  * reference's checksum-gated re-runs (connectors.py:30-38).
  */
trait Staging {
  /** Fetch `uri` into `stagingDir`; returns the staged file path. */
  def fetch(spark: SparkSession, uri: String, stagingDir: String): String
}

/** Local/Hadoop-visible files: "fetching" is a stream copy through the
  * FS layer (works for file:, hdfs:, or any mounted FS). The reference's
  * `FileConnector` analog (connectors.py:52-100). */
object LocalFileStaging extends Staging {
  def fetch(spark: SparkSession, uri: String, stagingDir: String): String = {
    val src = new Path(uri)
    val dest = new Path(stagingDir, src.getName)
    BinarySink.copyFile(spark, uri, dest.toString, wipe = true)
    dest.toString
  }
}

/** ZIP members as a staging source: fetch = extract the named member
  * (the `CompressedFileExtractor` shape, composed from the same seam). */
final class ZipMemberStaging(zipPath: String, member: String) extends Staging {
  def fetch(spark: SparkSession, uri: String, stagingDir: String): String =
    Extractors.zipMember(spark, zipPath, member, stagingDir)
}
