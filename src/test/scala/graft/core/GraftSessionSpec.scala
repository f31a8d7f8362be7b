package graft.core

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.SparkSpec

class GraftSessionSpec extends AnyFunSuite with Matchers with SparkSpec {

  test("s3a conf map carries exactly the caller's values — no hardcoding") {
    val m = GraftSession.s3aConfMap(GraftSession.S3aConf(
      endpoint = "http://object-store.test:9000",
      accessKey = "test-access", secretKey = "test-secret",
      pathStyleAccess = true))
    m("spark.hadoop.fs.s3a.endpoint") shouldBe "http://object-store.test:9000"
    m("spark.hadoop.fs.s3a.access.key") shouldBe "test-access"
    m("spark.hadoop.fs.s3a.secret.key") shouldBe "test-secret"
    m("spark.hadoop.fs.s3a.path.style.access") shouldBe "true"
    m("spark.hadoop.fs.s3.impl") shouldBe
      "org.apache.hadoop.fs.s3a.S3AFileSystem"
  }

  test("cluster session factory lands the S3A surface in the session conf") {
    spark // force the shared local session; cluster() then reuses its context
    val s = GraftSession.cluster(appName = "graft-cluster-test",
      s3a = Some(GraftSession.S3aConf(
        endpoint = "http://object-store.test:9000",
        accessKey = "test-access", secretKey = "test-secret")))
    s.conf.get("spark.hadoop.fs.s3a.endpoint") shouldBe
      "http://object-store.test:9000"
    s.conf.get("spark.hadoop.fs.s3a.access.key") shouldBe "test-access"
    s.conf.get("spark.hadoop.fs.s3a.secret.key") shouldBe "test-secret"
    // engine confs unchanged: UTC + nanos contract holds in cluster mode
    s.conf.get("spark.sql.session.timeZone") shouldBe "UTC"
    s.conf.get("spark.sql.legacy.parquet.nanosAsLong") shouldBe "true"
  }
}
