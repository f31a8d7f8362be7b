package graft.sources

import org.apache.hadoop.fs.Path

/** HTTP-level conditional-put [[ManifestLake.CommitPrimitive]] for
  * S3-compatible object stores.
  *
  * The publish-if-absent the lake's commit safety rests on maps onto
  * one documented REST call: `PUT` the manifest bytes with
  * `If-None-Match: *`, which S3 (and S3-compatible stores) accepts
  * only when no object exists at the key —
  *  - `2xx`   → the object was created: this committer WON the version;
  *  - `412 Precondition Failed` → the key already exists: LOST the
  *    race (same meaning as GCS `ifGenerationMatch=0`'s 412);
  *  - `409 Conflict` → another conditional write on the same key was
  *    in flight; S3 documents it as retryable, but for a manifest
  *    commit "someone else is publishing this version right now" loses
  *    the race either way, so it maps to false — the caller re-reads
  *    the log and retries at the NEXT version, which is both safe and
  *    what a retry-at-same-version would discover anyway;
  *  - anything else → raised (a commit must never silently vanish).
  *
  * Data files don't come through here: they're staged by the table's
  * Hadoop FileSystem under writer-unique names where last-write-wins
  * is harmless (see [[ManifestLake.write]]); only the manifest publish
  * needs the conditional primitive.
  *
  * Usage (once at startup, like the ES sink's endpoint wiring):
  * {{{
  *   ManifestLake.installCommitPrimitive(
  *     S3Commit.httpConditionalPut("https://s3.region.amazonaws.com"))
  * }}}
  * Request signing is deployment-specific (SigV4 headers via a proxy or
  * an injected `sign` hook) and orthogonal to the commit semantics
  * pinned here; the stub-server spec (S3CommitSpec) exercises the
  * protocol end-to-end the same way EsSinkSpec does for the ES sink.
  */
object S3Commit {

  /** Build the conditional-put primitive against `endpoint`
    * (path-style addressing: `endpoint/<bucket>/<key>`, the form every
    * S3-compatible store accepts). `sign` can add auth headers to each
    * request; default none. */
  def httpConditionalPut(endpoint: String,
                         schemes: Set[String] = Set("s3a", "s3"),
                         sign: java.net.HttpURLConnection => Unit = _ => ())
      : ManifestLake.ConditionalPutCommit =
    new ManifestLake.ConditionalPutCommit(schemes, (target, bytes) => {
      val uri = target.toUri
      val url = s"${endpoint.stripSuffix("/")}/${uri.getHost}${uri.getPath}"
      putIfAbsent(url, bytes, sign)
    })

  /** One conditional PUT. Returns true iff the object was created. */
  private[sources] def putIfAbsent(url: String, bytes: Array[Byte],
                                   sign: java.net.HttpURLConnection => Unit): Boolean = {
    val conn = new java.net.URL(url).openConnection()
      .asInstanceOf[java.net.HttpURLConnection]
    try {
      conn.setConnectTimeout(5000)
      conn.setReadTimeout(60000)
      conn.setRequestMethod("PUT")
      conn.setRequestProperty("Content-Type", "application/octet-stream")
      conn.setRequestProperty("If-None-Match", "*")
      sign(conn)
      conn.setDoOutput(true)
      val out = conn.getOutputStream
      try out.write(bytes) finally out.close()
      conn.getResponseCode match {
        case ok if ok / 100 == 2 => true
        case 412 | 409 => false
        case other =>
          val err = Option(conn.getErrorStream).map(s =>
            try scala.io.Source.fromInputStream(s, "UTF-8").mkString.take(500)
            finally s.close()).getOrElse("")
          throw new java.io.IOException(
            s"conditional PUT $url failed: HTTP $other $err")
      }
    } finally conn.disconnect()
  }
}
