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
  * fetchers. [[HttpStaging]] covers http/https/ftp/file (tested against
  * REAL loopback HTTP and FTP servers — zero egress); an SFTP impl
  * wraps its client's InputStream in the same copy loop (no client jar
  * exists offline, so SFTP deploys through [[CommandStaging]]'s argv
  * seam instead).
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

/** URL staging over `URL#openStream` — the reference's
  * `RemoteFileConnector` (reference:
  * engine/wprdc_etl/pipeline/connectors.py:132-183): stream the remote
  * object into the staging path, then hand off to the extractors. The
  * JDK's protocol handlers supply http/https in a deployment; this
  * zero-egress sandbox exercises the identical code path (protocol
  * resolution, stream copy, truncation cleanup) through `file:` URLs.
  * Streams in 64 KiB chunks — the body is never materialized in memory
  * (the reference's stream-to-temp-file spill, connectors.py:199-209).
  * Idempotent per (uri, stagingDir): a refetch overwrites the same
  * staged path. `ftp://` uris cover the reference's `FTPConnector`
  * (connectors.py:228-272) with zero extra code — in a Spark JVM,
  * SharedState installs Hadoop's `FsUrlStreamHandlerFactory`
  * process-wide, so `URL#openStream` on ftp resolves through Hadoop's
  * `FTPFileSystem` (a full commons-net client: login, SYST, passive or
  * PORT data connections) and streams through the identical copy loop;
  * outside Spark the JDK's own `FtpURLConnection` handler takes over.
  * Tested END-TO-END against a loopback FTP server
  * (RemoteSourcesSpec / TestFtp — real sockets, zero egress). SFTP/GCS
  * need client jars and wrap their InputStream in the same loop behind
  * [[Staging]]. */
object HttpStaging extends Staging {
  def fetch(spark: SparkSession, uri: String, stagingDir: String): String = {
    val url = new java.net.URI(uri).toURL
    val name = new Path(
      if (url.getPath == null || url.getPath.isEmpty) "download"
      else url.getPath).getName
    val dest = new Path(stagingDir, if (name.isEmpty) "download" else name)
    val fs = dest.getFileSystem(spark.sessionState.newHadoopConf())
    fs.mkdirs(dest.getParent)
    val in = url.openStream()
    // shared copy loop: deletes the partial stage on any failure
    try BinarySink.streamToFile(in, fs, dest, overwrite = true)
    finally in.close()
    dest.toString
  }
}
