package graft.sources

import java.net.{HttpURLConnection, URI, URL}

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs._
import org.apache.hadoop.fs.permission.FsPermission
import org.apache.hadoop.util.Progressable
import org.apache.spark.sql.SparkSession

/** `graftshare://` — a READ-ONLY Hadoop FileSystem over presigned
  * HTTP urls, the transport under [[DeltaSharing]]'s parquet scans.
  *
  * A path EMBEDS everything a task needs:
  * `graftshare://h/<size>/<url-safe-base64 of the presigned url>` —
  * no driver-side registry to ship, so any executor on any node can
  * open the file it was handed (the property that makes the scheme
  * survive a real cluster; delta-sharing's own client uses the same
  * trick of a synthetic path per presigned url). Reads serve ranged
  * `GET`s (`Range: bytes=a-b`) through a buffered window, so a
  * parquet footer + column-chunk access pattern costs a handful of
  * requests, not one per page; `getFileStatus` answers from the
  * embedded size with no round-trip at all. Every mutating verb
  * refuses by name. */
class GraftShareFs extends FileSystem {

  private var uri: URI = URI.create("graftshare://h/")

  override def initialize(name: URI, conf: Configuration): Unit = {
    super.initialize(name, conf)
    setConf(conf)
    uri = URI.create("graftshare://" +
      Option(name.getAuthority).getOrElse("h") + "/")
  }

  override def getUri: URI = uri

  override def getScheme: String = "graftshare"

  private def decode(f: Path): (String, Long) = {
    val parts = f.toUri.getPath.stripPrefix("/").split('/')
    require(parts.length == 2,
      s"malformed graftshare path $f — expected " +
        "graftshare://h/<size>/<base64url>")
    val size = java.lang.Long.parseLong(parts(0))
    val url = new String(
      java.util.Base64.getUrlDecoder.decode(parts(1)),
      java.nio.charset.StandardCharsets.UTF_8)
    (url, size)
  }

  override def open(f: Path, bufferSize: Int): FSDataInputStream = {
    val (url, size) = decode(f)
    new FSDataInputStream(new GraftShareFs.HttpRangeStream(url, size))
  }

  override def getFileStatus(f: Path): FileStatus = {
    val (_, size) = decode(f)
    new FileStatus(size, false, 1, 128L * 1024 * 1024, 0L, f)
  }

  override def listStatus(f: Path): Array[FileStatus] =
    Array(getFileStatus(f))

  override def getWorkingDirectory: Path = new Path(uri.toString)

  override def setWorkingDirectory(newDir: Path): Unit = ()

  private def readOnly(op: String): Nothing =
    throw new UnsupportedOperationException(
      s"graftshare is a read-only presigned-url filesystem — $op is " +
        "not a thing a shared-table consumer can do")

  override def create(f: Path, permission: FsPermission,
      overwrite: Boolean, bufferSize: Int, replication: Short,
      blockSize: Long, progress: Progressable): FSDataOutputStream =
    readOnly("create")

  override def append(f: Path, bufferSize: Int,
      progress: Progressable): FSDataOutputStream = readOnly("append")

  override def rename(src: Path, dst: Path): Boolean = readOnly("rename")

  override def delete(f: Path, recursive: Boolean): Boolean =
    readOnly("delete")

  override def mkdirs(f: Path, permission: FsPermission): Boolean =
    readOnly("mkdirs")
}

object GraftShareFs {

  /** Wrap a file url as a graftshare path when it needs the HTTP
    * transport; `file:`/schemeless urls read directly (a provider
    * sharing a local warehouse hands out plain paths). */
  def wrap(url: String, size: Long): String = {
    val scheme = Option(URI.create(url).getScheme).getOrElse("")
    if (scheme == "http" || scheme == "https") {
      val b64 = java.util.Base64.getUrlEncoder.withoutPadding()
        .encodeToString(url.getBytes(
          java.nio.charset.StandardCharsets.UTF_8))
      s"graftshare://h/$size/$b64"
    } else url
  }

  /** Register the scheme on the session's Hadoop conf (idempotent). */
  def install(spark: SparkSession): Unit = {
    val conf = spark.sparkContext.hadoopConfiguration
    if (conf.get("fs.graftshare.impl") == null)
      conf.set("fs.graftshare.impl", classOf[GraftShareFs].getName)
  }

  /** Seekable ranged-GET stream with a buffered readahead window:
    * parquet's footer-then-column-chunks pattern lands a few
    * hundred-KB requests instead of thousands of page-sized ones. */
  private final class HttpRangeStream(url: String, size: Long)
      extends FSInputStream {

    private val Readahead = 256 * 1024
    private var pos = 0L
    // the buffered window [winStart, winStart + winLen)
    private var window: Array[Byte] = Array.emptyByteArray
    private var winStart = 0L

    override def seek(newPos: Long): Unit = {
      if (newPos < 0 || newPos > size)
        throw new java.io.EOFException(
          s"seek to $newPos outside [0, $size] of $url")
      pos = newPos
    }

    override def getPos: Long = pos

    override def seekToNewSource(targetPos: Long): Boolean = false

    private def fetch(from: Long, len: Int): Unit = {
      val to = math.min(from + math.max(len, Readahead), size) - 1
      val conn = new URL(url).openConnection()
        .asInstanceOf[HttpURLConnection]
      conn.setConnectTimeout(10000)
      conn.setReadTimeout(60000)
      conn.setRequestProperty("Range", s"bytes=$from-$to")
      val code = conn.getResponseCode
      if (code != 200 && code != 206)
        throw new java.io.IOException(
          s"ranged GET $url [$from-$to] failed: HTTP $code")
      val in = conn.getInputStream
      try {
        val want = (to - from + 1).toInt
        val buf = new Array[Byte](want)
        var got = 0
        while (got < want) {
          val n = in.read(buf, got, want - got)
          if (n < 0)
            throw new java.io.IOException(
              s"ranged GET $url [$from-$to] truncated at $got bytes")
          got += n
        }
        window = buf
        winStart = from
      } finally in.close()
    }

    override def read(): Int = {
      val one = new Array[Byte](1)
      val n = read(one, 0, 1)
      if (n < 0) -1 else one(0) & 0xff
    }

    override def read(b: Array[Byte], off: Int, len: Int): Int = {
      if (pos >= size) return -1
      val inWindow = pos >= winStart && pos < winStart + window.length
      if (!inWindow) fetch(pos, len)
      val winOff = (pos - winStart).toInt
      val n = math.min(len, window.length - winOff)
      System.arraycopy(window, winOff, b, off, n)
      pos += n
      n
    }

    override def close(): Unit = {
      window = Array.emptyByteArray
      super.close()
    }
  }
}
