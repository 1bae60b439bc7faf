package graft

import graft.sources.Warc
import java.nio.charset.StandardCharsets.ISO_8859_1
import java.nio.file.Files

/** The WARC source: byte-exact record framing, both transports (plain
  * and gzip), and the quarantine contract — one torn record costs one
  * quarantine row, never its file (the JsonlSpec bar, binary edition).
  */
class WarcSpec extends SparkSpec {

  private def fixtureRecords = Seq(
    ("response", "http://example.org/a", "2024-01-01T00:00:00Z", "text/html",
      "<html>alpha</html>".getBytes(ISO_8859_1)),
    ("response", "http://example.org/b", "2024-01-02T00:00:00Z", "text/html",
      // embedded fake boundary: Content-Length framing must carry the
      // payload straight through, not split a record here
      "x\r\n\r\nWARC/1.0\r\nWARC-Type: fake\r\n".getBytes(ISO_8859_1)),
    ("metadata", "http://example.org/c", "2024-01-03T00:00:00Z",
      "application/warc-fields", "fetch-ms: 7".getBytes(ISO_8859_1)))

  private def write(dir: java.nio.file.Path, name: String,
                    recs: Seq[(String, String, String, String, Array[Byte])]) = {
    val p = dir.resolve(name)
    Warc.writeFixture(p, recs)
    p
  }

  test("round-trip: every header field and payload byte survives; offsets are record starts") {
    val dir = Files.createTempDirectory("graft-warc1")
    write(dir, "a.warc", fixtureRecords)
    val (recs, quar) = Warc.readWithQuarantine(spark, dir.resolve("a.warc").toString)
    assert(quar.count() == 0L)
    val rows = recs.orderBy("offset").collect()
    assert(rows.length == 3)
    assert(rows.map(_.getAs[String]("warc_type")).toSeq ==
      Seq("response", "response", "metadata"))
    assert(rows.map(_.getAs[String]("url")).toSeq ==
      Seq("http://example.org/a", "http://example.org/b", "http://example.org/c"))
    assert(rows.map(_.getAs[String]("warc_date")).forall(_.startsWith("2024-01-0")))
    assert(rows(0).getAs[String]("content_type") == "text/html")
    assert(rows(0).getAs[String]("record_id").startsWith("<urn:uuid:"))
    // payload bytes EXACT — including the one embedding a fake boundary
    rows.zip(fixtureRecords).foreach { case (r, (_, _, _, _, payload)) =>
      assert(r.getAs[Array[Byte]]("payload").sameElements(payload))
      assert(r.getAs[Long]("content_length") == payload.length.toLong)
    }
    // offsets: first record at 0, later ones strictly increasing
    val offs = rows.map(_.getAs[Long]("offset"))
    assert(offs.head == 0L && offs.sliding(2).forall(p => p(0) < p(1)))
  }

  test("gzip transport parses byte-identically to plain") {
    val dir = Files.createTempDirectory("graft-warc2")
    val plain = write(dir, "a.warc", fixtureRecords)
    Warc.gzipFixture(plain, dir.resolve("a.warc.gz"))
    def canon(path: String) = Warc.read(spark, path).drop("file")
      .orderBy("offset").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(3),
        r.getAs[Array[Byte]]("payload").toSeq)).toSeq
    assert(canon(dir.resolve("a.warc.gz").toString) == canon(plain.toString))
  }

  test("multi-member gzip (one member per record — the Common-Crawl layout) parses fully") {
    // real .warc.gz files are CONCATENATED per-record gzip members so
    // readers can seek to member boundaries; the source's claim is
    // that the JDK stream reads across members transparently — pin it,
    // because a single-member-only reader would silently return just
    // the FIRST record of every Common-Crawl file
    val dir = Files.createTempDirectory("graft-warc-mm")
    val out = new java.io.ByteArrayOutputStream()
    fixtureRecords.zipWithIndex.foreach { case (r, i) =>
      val tmp = dir.resolve(s"r$i.warc")
      Warc.writeFixture(tmp, Seq(r))
      val gz = new java.util.zip.GZIPOutputStream(out)
      gz.write(Files.readAllBytes(tmp))
      gz.finish() // member trailer only — the next record starts a new member
    }
    Files.write(dir.resolve("mm.warc.gz"), out.toByteArray)
    val (recs, quar) = Warc.readWithQuarantine(spark, dir.resolve("mm.warc.gz").toString)
    assert(quar.count() == 0L)
    val rows = recs.orderBy("offset").collect()
    assert(rows.length == fixtureRecords.length,
      s"multi-member read returned ${rows.length} of ${fixtureRecords.length} records")
    rows.zip(fixtureRecords).foreach { case (row, (wtype, url, _, _, payload)) =>
      assert(row.getAs[String]("warc_type") == wtype)
      assert(row.getAs[String]("url") == url)
      assert(row.getAs[Array[Byte]]("payload").sameElements(payload))
    }
  }

  test("garbage between records: one quarantine row, the records after it still parse") {
    val dir = Files.createTempDirectory("graft-warc3")
    val h = write(dir, "h.tmp", fixtureRecords.take(2))
    val t = write(dir, "t.tmp", fixtureRecords.drop(2))
    val target = dir.resolve("spliced.warc")
    Files.write(target, Files.readAllBytes(h) ++
      "NOT WARC\r\nnoise line\r\n".getBytes(ISO_8859_1) ++ Files.readAllBytes(t))
    val (recs, quar) = Warc.readWithQuarantine(spark, target.toString)
    assert(recs.count() == 3L) // nothing lost around the splice
    val q = quar.collect()
    assert(q.length == 1 && q(0).getAs[String]("reason").contains("resync"))
    // read() is the silent-drop variant
    assert(Warc.read(spark, target.toString).count() == 3L)
  }

  test("truncated payload and missing Content-Length quarantine without killing the file") {
    val dir = Files.createTempDirectory("graft-warc4")
    // truncated: cut the file 10 bytes short mid-payload
    val full = Files.readAllBytes(write(dir, "f.tmp", fixtureRecords.take(1)))
    val cut = dir.resolve("cut.warc")
    Files.write(cut, full.take(full.length - 10))
    val (r1, q1) = Warc.readWithQuarantine(spark, cut.toString)
    assert(r1.count() == 0L)
    assert(q1.collect().map(_.getAs[String]("reason")).toSeq
      .exists(_.contains("truncated")))
    // missing Content-Length: hand-built record, then a VALID record —
    // the parser can't frame the first, must resync into the second
    val noLen = ("WARC/1.0\r\nWARC-Type: response\r\n" +
      "WARC-Target-URI: http://example.org/x\r\n\r\npayload\r\n\r\n").getBytes(ISO_8859_1)
    val mixed = dir.resolve("mixed.warc")
    Files.write(mixed, noLen ++ Files.readAllBytes(write(dir, "v.tmp", fixtureRecords.take(1))))
    val (r2, q2) = Warc.readWithQuarantine(spark, mixed.toString)
    // ONE row for the whole torn record (header + unskippable payload
    // coalesce into the resync run), not one per symptom
    val q2rows = q2.collect()
    assert(q2rows.length == 1 &&
      q2rows.head.getAs[String]("reason").contains("Content-Length"))
    assert(r2.collect().map(_.getAs[String]("url")).toSeq
      == Seq("http://example.org/a")) // the valid record survived

    // a NEGATIVE length is a quarantine, not a NegativeArraySizeException
    // killing the task
    val negLen = ("WARC/1.0\r\nWARC-Type: response\r\n" +
      "Content-Length: -7\r\n\r\nxxx\r\n\r\n").getBytes(ISO_8859_1)
    val neg = dir.resolve("neg.warc")
    Files.write(neg, negLen ++ Files.readAllBytes(dir.resolve("v.tmp")))
    val (r3, q3) = Warc.readWithQuarantine(spark, neg.toString)
    assert(q3.collect().map(_.getAs[String]("reason")).toSeq
      .exists(_.contains("Content-Length")))
    assert(r3.collect().map(_.getAs[String]("url")).toSeq
      == Seq("http://example.org/a"))
  }

  test("payloads over the cap are skipped and quarantined; later records parse") {
    val dir = Files.createTempDirectory("graft-warc5")
    val big = ("big", "http://example.org/big", "2024-01-04T00:00:00Z",
      "application/octet-stream", Array.fill[Byte](4096)('z'.toByte))
    write(dir, "b.warc", Seq(big) ++ fixtureRecords.take(1))
    val (recs, quar) = Warc.readWithQuarantine(spark,
      dir.resolve("b.warc").toString, maxPayloadBytes = 1024L)
    assert(recs.collect().map(_.getAs[String]("url")).toSeq ==
      Seq("http://example.org/a"))
    val q = quar.collect()
    assert(q.length == 1 && q(0).getAs[String]("reason").contains("exceeds cap"))
  }
}
