package graft

import graft.sources.Warc
import org.scalacheck.{Gen, Properties}
import org.scalacheck.Prop.forAll

/** WARC framing laws, checked on the pure parser (no Spark plan): for
  * ANY record list with ARBITRARY binary payloads — CRLFs, fake
  * "WARC/1.0" boundaries, empty payloads, high bytes — a
  * writeFixture→parse round trip must return exactly the records
  * written, byte-identical payloads, strictly increasing offsets, and
  * zero quarantine rows. Content-Length framing is the property under
  * test: payload CONTENT must never influence record boundaries.
  */
object WarcPropertiesSpec extends Properties("WarcFraming") {

  private val token: Gen[String] =
    Gen.chooseNum(1, 12).flatMap(n => Gen.stringOfN(n, Gen.alphaNumChar))

  private val genRecord: Gen[(String, String, String, String, Array[Byte])] = for {
    wtype <- Gen.oneOf("response", "request", "metadata", "resource")
    host <- token
    path <- token
    day <- Gen.chooseNum(1, 28)
    ctype <- Gen.oneOf("text/html", "application/octet-stream", "text/plain")
    // arbitrary bytes, deliberately seeded with boundary-looking runs
    payload <- Gen.oneOf(
      Gen.containerOf[Array, Byte](Gen.chooseNum(Byte.MinValue, Byte.MaxValue)),
      Gen.const("\r\n\r\nWARC/1.0\r\nWARC-Type: fake\r\n\r\n"
        .getBytes(java.nio.charset.StandardCharsets.ISO_8859_1)),
      Gen.const(Array.empty[Byte]))
  } yield (wtype, s"http://$host.example/$path", f"2024-01-$day%02dT00:00:00Z",
    ctype, payload)

  property("writeFixture -> parse round-trips any payload bytes") =
    forAll(Gen.chooseNum(0, 10).flatMap(n => Gen.listOfN(n, genRecord))) { records =>
      val f = java.nio.file.Files.createTempFile("graft-warc-prop", ".warc")
      try {
        Warc.writeFixture(f, records)
        val parsed = Warc.parseStream(f.toString,
          java.nio.file.Files.newInputStream(f), 64L << 20)
        val ok = parsed.length == records.length &&
          parsed.forall(_.corrupt_reason.isEmpty) &&
          parsed.zip(records).forall { case (p, (wtype, url, date, ctype, payload)) =>
            p.warc_type.contains(wtype) && p.url.contains(url) &&
              p.warc_date.contains(date) && p.content_type.contains(ctype) &&
              p.content_length.contains(payload.length.toLong) &&
              p.payload.exists(_.sameElements(payload))
          } &&
          parsed.map(_.offset).sliding(2).forall(w => w.length < 2 || w(0) < w(1))
        ok
      } finally java.nio.file.Files.deleteIfExists(f)
    }

  property("appending garbage after valid records quarantines ONE run, loses no record") =
    forAll(Gen.chooseNum(1, 5).flatMap(n => Gen.listOfN(n, genRecord)),
      Gen.stringOfN(20, Gen.alphaNumChar)) { (records, junk) =>
      val f = java.nio.file.Files.createTempFile("graft-warc-prop2", ".warc")
      try {
        Warc.writeFixture(f, records)
        java.nio.file.Files.write(f,
          s"$junk\r\n".getBytes(java.nio.charset.StandardCharsets.ISO_8859_1),
          java.nio.file.StandardOpenOption.APPEND)
        val parsed = Warc.parseStream(f.toString,
          java.nio.file.Files.newInputStream(f), 64L << 20)
        parsed.count(_.corrupt_reason.isEmpty) == records.length &&
          parsed.count(_.corrupt_reason.isDefined) == 1
      } finally java.nio.file.Files.deleteIfExists(f)
    }
}
