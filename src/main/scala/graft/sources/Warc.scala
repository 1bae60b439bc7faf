package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import java.io.InputStream

/** WARC corpus source (ISO 28500 — the Common-Crawl container; the
  * ingestion format a web-scale training-data pipeline reads first,
  * beyond-reference per the builder brief). Parses response/request/
  * metadata records into typed rows with the payload as an opaque
  * BINARY column, quarantining corrupt records in the scan stage —
  * the [[Jsonl.readWithQuarantine]] contract: at 100 TB a torn record
  * must cost one quarantine row, never the ingest job.
  *
  * Execution shape: `spark.read.format("binaryFile")` hands each WARC
  * file to one task, and a typed `flatMap` stream-parses its records.
  * Per-FILE parallelism is the honest maximum for this format — the
  * real corpus ships as per-record-gzipped members (not splittable at
  * arbitrary byte offsets) in ~1 GiB files, so Common-Crawl-scale
  * Spark readers all parallelize by file; 100 TB ≈ 100k files keeps
  * every executor busy. The flatMap is genuine per-partition
  * imperative logic over a binary stream — the one shape the
  * DataFrame algebra can't express (the [[graft.operators.Multimodal]]
  * precedent); everything downstream of the parse is ordinary
  * Column-programmable data.
  *
  * Gzip transport (`.warc.gz`) is handled with the JDK's multi-member
  * `GZIPInputStream` — per-record gzip members concatenate into one
  * stream, which is exactly how Common Crawl writes them.
  */
object Warc {

  /** One parsed row: a record (corrupt_reason null) or a quarantine
    * entry (corrupt_reason set, record fields null). `offset` is the
    * byte position of the record's version line in the (decompressed)
    * stream — replay/forensics coordinates, the quarantine analogue of
    * [[Jsonl.readWithQuarantine]]'s raw line. Public only because the
    * encoder's GENERATED serializer code (a separate janino class)
    * must call its accessors — a private class silently demotes the
    * whole serialization stage to the interpreted fallback.
    */
  final case class Parsed(
      file: String, offset: Long,
      warc_type: Option[String], record_id: Option[String],
      url: Option[String], warc_date: Option[String],
      content_type: Option[String], content_length: Option[Long],
      payload: Option[Array[Byte]], corrupt_reason: Option[String])

  /** Read `path` (glob ok; plain `.warc` or gzipped `.warc.gz`),
    * returning only well-formed records:
    * (file, offset, warc_type, record_id, url, warc_date,
    * content_type, content_length, payload). Corrupt records are
    * silently dropped — [[readWithQuarantine]] accounts for them.
    */
  def read(spark: SparkSession, path: String,
           maxPayloadBytes: Long = 64L << 20): DataFrame =
    readWithQuarantine(spark, path, maxPayloadBytes)._1

  /** Read `path` as (records, quarantine): quarantine rows are
    * (file, offset, reason) — truncated headers/payloads, missing or
    * negative Content-Length, payloads over `maxPayloadBytes`
    * (skipped, never buffered), non-WARC bytes where a version line
    * was expected. After a malformed record the parser resyncs by
    * scanning for the next version line, so one torn record costs ONE
    * quarantine row, not the rest of its file — with one honest
    * caveat: a record whose LENGTH is unreadable cannot have its
    * payload skipped precisely, so the resync scan may stop early at
    * payload bytes that look like a version line and read what
    * follows as records (inherent to the format; a correct length is
    * what delimits payload bytes). Both frames derive from the one
    * binaryFile scan (two passes, like the JSONL split).
    */
  def readWithQuarantine(spark: SparkSession, path: String,
                         maxPayloadBytes: Long = 64L << 20): (DataFrame, DataFrame) = {
    import spark.implicits._
    val parsed = spark.read.format("binaryFile").load(path)
      .select(col("path"), col("content")).as[(String, Array[Byte])]
      .flatMap { case (file, bytes) =>
        val in: InputStream = new java.io.ByteArrayInputStream(bytes)
        val stream =
          if (file.endsWith(".gz")) new java.util.zip.GZIPInputStream(in)
          else in
        parseStream(file, stream, maxPayloadBytes)
      }
    val df = parsed.toDF()
    (df.filter(col("corrupt_reason").isNull)
      .select(col("file"), col("offset"),
        col("warc_type").cast("string"), col("record_id").cast("string"),
        col("url").cast("string"), col("warc_date").cast("string"),
        col("content_type").cast("string"), col("content_length").cast("long"),
        col("payload")),
      df.filter(col("corrupt_reason").isNotNull)
        .select(col("file"), col("offset"), col("corrupt_reason").as("reason")))
  }

  /** Stream-parse one WARC file. Record grammar (ISO 28500 §4): a
    * `WARC/<v>` version line, `Name: Value` header lines, one blank
    * line, `Content-Length` payload bytes, two CRLFs. Headers are
    * ASCII; names compare case-insensitively. Eager per file — the
    * binaryFile scan already holds the file's bytes, so buffering its
    * parsed records adds nothing asymptotic.
    */
  private[graft] def parseStream(file: String, in: InputStream,
                                 maxPayload: Long): Seq[Parsed] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[Parsed]
    val cur = new Cursor(in)
    def quarantine(off: Long, reason: String): Unit =
      out += Parsed(file, off, None, None, None, None, None, None, None, Some(reason))
    var line: String = null
    var lineStart = 0L
    def nextLine(): Unit = { lineStart = cur.pos; line = cur.readLine() }
    nextLine()
    var desyncAt = -1L // first offset of an unrecognized byte run, if any
    var pendingReason: String = null // why the run began, when known
    def emitDesync(): Unit = if (desyncAt >= 0) {
      quarantine(desyncAt,
        Option(pendingReason).getOrElse("skipped non-WARC bytes (resync)"))
      desyncAt = -1L
      pendingReason = null
    }
    while (line != null) {
      if (line.isEmpty) nextLine() // inter-record CRLFs
      else if (!line.startsWith("WARC/")) {
        // not a version line where one belongs: remember where the
        // garbage began, scan forward to the next version line, and
        // quarantine the skipped run as ONE entry
        if (desyncAt < 0) desyncAt = lineStart
        nextLine()
      } else {
        emitDesync()
        val recordStart = lineStart
        // headers to the blank line
        val headers = scala.collection.mutable.Map.empty[String, String]
        var truncated = false
        var malformed = false
        nextLine()
        while (line != null && line.nonEmpty) {
          val i = line.indexOf(':')
          if (i <= 0) malformed = true
          else headers.put(line.substring(0, i).trim.toLowerCase,
            line.substring(i + 1).trim)
          nextLine()
        }
        if (line == null) truncated = true
        // a NEGATIVE length is as unusable as a missing one (and would
        // otherwise reach readN/skipN as a crash or a cursor
        // corruption); both fall to the resync path below
        val clen = headers.get("content-length").flatMap(_.toLongOption)
          .filter(_ >= 0)
        if (truncated) quarantine(recordStart, "truncated record header")
        else if (clen.isEmpty) {
          // can't locate the record's end without a usable length: the
          // skipped run (this record's un-skippable payload included)
          // coalesces into ONE quarantine row via the resync scanner
          // (pendingReason) — payload bytes that happen to look like a
          // version line can still end the run early; that heuristic
          // is the price of a torn length, documented on the class
          pendingReason = "missing or invalid Content-Length (resync)"
          desyncAt = recordStart
        } else if (malformed) {
          // stay synced (length known): skip the payload, quarantine
          cur.skipN(clen.get)
          quarantine(recordStart, "malformed header line")
        } else if (clen.get > maxPayload || clen.get > Int.MaxValue - 8L) {
          // over the caller's cap — or over what a byte array can hold
          // at all (readN's Int length would wrap if a caller raised
          // the Long-typed cap past 2 GiB): skip, never buffer. The
          // reason names whichever limit actually applied.
          val skipped = cur.skipN(clen.get)
          if (skipped < clen.get) quarantine(recordStart, "truncated payload")
          else if (clen.get > maxPayload) quarantine(recordStart,
            s"payload ${clen.get} bytes exceeds cap $maxPayload")
          else quarantine(recordStart,
            s"payload ${clen.get} bytes exceeds the single-buffer limit")
        } else {
          val payload = cur.readN(clen.get.toInt)
          if (payload == null) quarantine(recordStart, "truncated payload")
          else out += Parsed(file, recordStart,
            headers.get("warc-type"), headers.get("warc-record-id"),
            headers.get("warc-target-uri"), headers.get("warc-date"),
            headers.get("content-type"), clen,
            Some(payload), None)
        }
        if (line != null) nextLine()
      }
    }
    emitDesync()
    out.toSeq
  }

  /** Byte cursor over a stream: tracks the decompressed offset, reads
    * CRLF/LF-terminated ASCII lines and exact-length byte runs.
    */
  private final class Cursor(in: InputStream) {
    var pos = 0L

    /** Bytes to the next LF (stripping a trailing CR), decoded
      * ISO-8859-1 (header lines are ASCII by spec; lone high bytes
      * must not explode into replacement chars that shift offsets).
      * Null at EOF with nothing read.
      */
    def readLine(): String = {
      val buf = new java.io.ByteArrayOutputStream(80)
      var b = in.read()
      if (b < 0) return null
      while (b >= 0 && b != '\n') { buf.write(b); b = in.read() }
      pos += buf.size() + (if (b >= 0) 1 else 0)
      val bytes = buf.toByteArray
      val n = if (bytes.nonEmpty && bytes.last == '\r') bytes.length - 1 else bytes.length
      new String(bytes, 0, n, java.nio.charset.StandardCharsets.ISO_8859_1)
    }

    /** Exactly `n` bytes, or null on a short read (truncated file). */
    def readN(n: Int): Array[Byte] = {
      val buf = new Array[Byte](n)
      var got = 0
      while (got < n) {
        val r = in.read(buf, got, n - got)
        if (r < 0) { pos += got; return null }
        got += r
      }
      pos += got
      buf
    }

    /** Skip up to `n` bytes; returns how many were actually skipped. */
    def skipN(n: Long): Long = {
      var left = n
      val buf = new Array[Byte](8192)
      while (left > 0) {
        val r = in.read(buf, 0, math.min(left, buf.length.toLong).toInt)
        if (r < 0) { val done = n - left; pos += done; return done }
        left -= r
      }
      pos += n
      n
    }
  }

  /** Serialize records as one plain WARC/1.0 file — the deterministic
    * fixture writer the specs and the `x_source_warc` demo query use
    * (driver-side, fixture-scale by contract; a production WARC writer
    * would be a foreachPartition sink). Each record is
    * (warcType, url, date, contentType, payload).
    */
  def writeFixture(path: java.nio.file.Path,
                   records: Seq[(String, String, String, String, Array[Byte])]): Unit = {
    val out = new java.io.BufferedOutputStream(java.nio.file.Files.newOutputStream(path))
    try {
      records.zipWithIndex.foreach { case ((wtype, url, date, ctype, payload), i) =>
        val hdr = new StringBuilder()
          .append("WARC/1.0\r\n")
          .append(s"WARC-Type: $wtype\r\n")
          .append(f"WARC-Record-ID: <urn:uuid:${i}%08d-0000-0000-0000-000000000000>\r\n")
          .append(s"WARC-Date: $date\r\n")
          .append(s"WARC-Target-URI: $url\r\n")
          .append(s"Content-Type: $ctype\r\n")
          .append(s"Content-Length: ${payload.length}\r\n")
          .append("\r\n")
        out.write(hdr.toString.getBytes(java.nio.charset.StandardCharsets.ISO_8859_1))
        out.write(payload)
        out.write("\r\n\r\n".getBytes(java.nio.charset.StandardCharsets.ISO_8859_1))
      }
    } finally out.close()
  }

  /** Gzip a fixture file (single member — the JDK stream reads both
    * single- and multi-member transparently, and the parser only sees
    * decompressed bytes).
    */
  def gzipFixture(src: java.nio.file.Path, dst: java.nio.file.Path): Unit = {
    val out = new java.util.zip.GZIPOutputStream(
      java.nio.file.Files.newOutputStream(dst))
    try out.write(java.nio.file.Files.readAllBytes(src))
    finally out.close()
  }
}
