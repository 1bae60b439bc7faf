package graft.api

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import com.fasterxml.jackson.databind.node.{ArrayNode, ObjectNode}
import graft.model._
import org.apache.spark.sql.{DataFrame, Row}
import scala.jdk.CollectionConverters._

/** JSON wire protocol matching the reference's aeson derivations:
  * schema-strict (`rejectUnknownFields = True`,
  * /root/reference/server/src/Repository/Model.hs:197-201), the
  * all-optional QueryModel (Model.hs:104-116), and the three QueryR
  * result shapes (Model.hs:63-75, JSON keys "group"/"result" at
  * Model.hs:187-195).
  *
  * Uses Jackson (ships with Spark) — no extra dependencies.
  */
object QueryJson {
  import QueryError.IllegalQuery

  private val mapper = new ObjectMapper()

  private val qmFields = Set("gt", "ge", "lt", "le", "tsEq", "tagEq",
    "aggFunc", "groupBy", "sort", "limit")

  private def parseJson(body: String): Either[QueryError, JsonNode] =
    try Right(mapper.readTree(body))
    catch { case e: Exception => Left(IllegalQuery(s"Malformed JSON: ${e.getMessage}")) }

  // explicit JSON null decodes as absent, like aeson's Maybe fields
  private def longField(n: JsonNode, f: String): Either[QueryError, Option[Long]] =
    Option(n.get(f)) match {
      case None => Right(None)
      case Some(v) if v.isNull => Right(None)
      case Some(v) if v.isNumber && v.canConvertToExactIntegral && v.canConvertToLong =>
        Right(Some(v.asLong())) // aeson parity: 1e3/1000.0 are integers too
      case Some(_) => Left(IllegalQuery(s"Field '$f' must be an integer."))
    }

  private def strField(n: JsonNode, f: String): Either[QueryError, Option[String]] =
    Option(n.get(f)) match {
      case None => Right(None)
      case Some(v) if v.isNull => Right(None)
      case Some(v) if v.isTextual => Right(Some(v.asText()))
      case Some(_) => Left(IllegalQuery(s"Field '$f' must be a string."))
    }

  private def enumField[A](n: JsonNode, f: String, parse: String => Option[A])
      : Either[QueryError, Option[A]] =
    strField(n, f).flatMap {
      case None => Right(None)
      case Some(s) => parse(s).map(a => Right(Some(a)))
        .getOrElse(Left(IllegalQuery(s"Invalid value for '$f': $s")))
    }

  /** Strict QueryModel decode + validation (parse errors and illegal
    * combinations both surface as the reference's HTTP-400 semantics).
    */
  def parseQueryModel(body: String): Either[QueryError, QueryModel] =
    for {
      node <- parseJson(body)
      _ <- if (!node.isObject) Left(IllegalQuery("Expected a JSON object."))
           else node.fieldNames.asScala.find(!qmFields.contains(_))
             .map(f => Left(IllegalQuery(s"Unknown field: $f")))
             .getOrElse(Right(()))
      gt <- longField(node, "gt"); ge <- longField(node, "ge")
      lt <- longField(node, "lt"); le <- longField(node, "le")
      tsEq <- longField(node, "tsEq")
      tagEq <- strField(node, "tagEq")
      agg <- enumField(node, "aggFunc", Agg.parse)
      grp <- enumField(node, "groupBy", GroupBy.parse)
      sort <- enumField(node, "sort", SortDir.parse)
      limit <- longField(node, "limit")
      // clamp like Haskell's take: negative => nothing, huge => everything
      clamped = limit.map(v => math.max(0L, math.min(v, Int.MaxValue.toLong)).toInt)
      qm <- Validation.validate(QueryModel(gt, ge, lt, le, tsEq, tagEq,
        agg, grp, sort.getOrElse(SortDir.Asc), clamped))
    } yield qm

  private def tsFields = Set("timestamp", "tag", "value")
  private def keyFields = Set("timestamp", "tag")

  /** Strict decode of an insert/update body: `[{timestamp, tag, value}]`. */
  def parseTsBatch(body: String): Either[QueryError, Seq[TS]] =
    parseJson(body).flatMap {
      case arr: ArrayNode =>
        arr.asScala.toSeq.foldLeft[Either[QueryError, Vector[TS]]](Right(Vector())) {
          (acc, n) => acc.flatMap { v =>
            n.fieldNames.asScala.find(!tsFields.contains(_)) match {
              case Some(f) => Left(IllegalQuery(s"Unknown field: $f"))
              case None =>
                // typed, like aeson: never coerce "abc" to 0
                if (!n.hasNonNull("timestamp") || !n.get("timestamp").isNumber ||
                    !n.get("timestamp").canConvertToExactIntegral ||
                    !n.get("timestamp").canConvertToLong)
                  Left(IllegalQuery("Field 'timestamp' must be an integer."))
                else if (!n.hasNonNull("tag") || !n.get("tag").isTextual)
                  Left(IllegalQuery("Field 'tag' must be a string."))
                else if (!n.hasNonNull("value") || !n.get("value").isNumber)
                  Left(IllegalQuery("Field 'value' must be a number."))
                else Right(v :+ TS(n.get("timestamp").asLong(),
                  n.get("tag").asText(), n.get("value").asDouble()))
            }
          }
        }
      case _ => Left(IllegalQuery("Expected a JSON array."))
    }

  /** Strict decode of a delete body: `[{timestamp, tag}]`; `[]` is the
    * reference's truncate command.
    */
  def parseKeyBatch(body: String): Either[QueryError, Seq[TSKey]] =
    parseJson(body).flatMap {
      case arr: ArrayNode =>
        arr.asScala.toSeq.foldLeft[Either[QueryError, Vector[TSKey]]](Right(Vector())) {
          (acc, n) => acc.flatMap { v =>
            n.fieldNames.asScala.find(!keyFields.contains(_)) match {
              case Some(f) => Left(IllegalQuery(s"Unknown field: $f"))
              case None =>
                if (!n.hasNonNull("timestamp") || !n.get("timestamp").isNumber ||
                    !n.get("timestamp").canConvertToExactIntegral ||
                    !n.get("timestamp").canConvertToLong)
                  Left(IllegalQuery("Field 'timestamp' must be an integer."))
                else if (!n.hasNonNull("tag") || !n.get("tag").isTextual)
                  Left(IllegalQuery("Field 'tag' must be a string."))
                else Right(v :+ TSKey(n.get("timestamp").asLong(), n.get("tag").asText()))
            }
          }
        }
      case _ => Left(IllegalQuery("Expected a JSON array."))
    }

  /** Error bodies are RAW TEXT like the reference's servant handlers
    * (errBody = C.pack …, Api.hs:51,79): mutation errors newline-joined
    * with a trailing newline (Haskell `unlines`), everything else the
    * bare message.
    */
  def encodeError(e: QueryError): String = e match {
    case QueryError.MutationErrors(msgs) => msgs.mkString("", "\n", "\n")
    case other => other.message
  }

  /** aeson parity: non-finite Doubles (±Infinity/NaN) encode as JSON
    * null — reachable via min/max mempty over empty input.
    */
  private def putDouble(o: ObjectNode, name: String, v: Double): Unit =
    if (java.lang.Double.isFinite(v)) { o.put(name, v); () } else { o.putNull(name); () }

  /** The ONE row encoder per result shape — shared by [[encodeResult]]
    * and [[streamResult]] so the wire format cannot diverge between the
    * query response and the export download.
    */
  private def rowEncoder(shape: ResultShape): (ObjectNode, Row) => Unit = shape match {
    case ResultShape.Collect => (o, r) => {
      o.put("timestamp", r.getLong(0)); o.put("tag", r.getString(1))
      putDouble(o, "value", r.getDouble(2))
    }
    case ResultShape.Grouped(GroupBy.Tag) => (o, r) => {
      o.put("group", r.getString(0)); putDouble(o, "result", r.getDouble(1))
    }
    case ResultShape.Grouped(GroupBy.Timestamp) => (o, r) => {
      o.put("group", r.getLong(0)); putDouble(o, "result", r.getDouble(1))
    }
    case ResultShape.Scalar => (o, r) => putDouble(o, "result", r.getDouble(0))
  }

  /** Stream a query result to `out` in exactly the bytes
    * [[encodeResult]] would produce, but row-by-row via
    * `toLocalIterator` — driver memory is bounded by one partition, not
    * the result, which is what the export download needs for large
    * collects.
    */
  def streamResult(qm: QueryModel, df: DataFrame, out: java.io.OutputStream): Unit = {
    val w = new java.io.BufferedWriter(
      new java.io.OutputStreamWriter(out, java.nio.charset.StandardCharsets.UTF_8))
    val shape = ResultShape.of(qm)
    val encode = rowEncoder(shape)
    def obj(r: Row): String = {
      val o = mapper.createObjectNode()
      encode(o, r)
      mapper.writeValueAsString(o)
    }
    shape match {
      case ResultShape.Scalar => w.write(obj(df.collect().head))
      case _ =>
        w.write("[")
        var first = true
        df.toLocalIterator().asScala.foreach { r =>
          if (!first) w.write(",")
          first = false
          w.write(obj(r))
        }
        w.write("]")
    }
    w.flush()
  }

  /** Encode a dashboard series response (the `?points=` / `?window=`
    * routes — [[Server]]'s beyond-reference surface): `{"width": W,
    * "slide": S, "series": [{window_start, tag, cnt, sum_val, min_val,
    * max_val}, …]}`. `cnt` is exact-integral; the float partials use
    * the same non-finite→null rule as the QueryR encoders.
    */
  def encodeSeries(width: Long, slide: Long, df: DataFrame): String = {
    val root: ObjectNode = mapper.createObjectNode()
    root.put("width", width)
    root.put("slide", slide)
    val arr = root.putArray("series")
    df.collect().foreach { r =>
      val o = arr.addObject()
      o.put("window_start", r.getLong(0))
      o.put("tag", r.getString(1))
      o.put("cnt", r.getLong(2))
      putDouble(o, "sum_val", r.getDouble(3))
      putDouble(o, "min_val", r.getDouble(4))
      putDouble(o, "max_val", r.getDouble(5))
    }
    mapper.writeValueAsString(root)
  }

  /** AggR / [GroupAggR] for the sketch routes (`?percentile` /
    * `?distinct`) — the same wire shapes as the parity query path, with
    * NULL results (empty windows) encoded as JSON null. */
  def encodeAggRows(df: DataFrame, grouped: Boolean): String = {
    val rows = df.collect()
    if (!grouped) {
      val o: ObjectNode = mapper.createObjectNode()
      if (rows.head.isNullAt(0)) o.putNull("result")
      else putDouble(o, "result", rows.head.getDouble(0))
      mapper.writeValueAsString(o)
    } else {
      val arr = mapper.createArrayNode()
      rows.foreach { r =>
        val o = arr.addObject()
        o.put("group", r.getString(0))
        if (r.isNullAt(1)) o.putNull("result")
        else putDouble(o, "result", r.getDouble(1))
      }
      mapper.writeValueAsString(arr)
    }
  }

  /** Schema-driven row encoding for the counter-family routes
    * (`?increase` / `?twa`): every column by name, nulls preserved,
    * non-finite doubles → null like the fixed shapes. */
  def encodeRows(df: DataFrame): String = {
    val fields = df.schema.fields
    val arr = mapper.createArrayNode()
    df.collect().foreach { r =>
      val o = arr.addObject()
      fields.zipWithIndex.foreach { case (f, i) =>
        import org.apache.spark.sql.types._
        if (r.isNullAt(i)) { o.putNull(f.name); () }
        else f.dataType match {
          case LongType    => o.put(f.name, r.getLong(i)); ()
          case IntegerType => o.put(f.name, r.getInt(i).toLong); ()
          case DoubleType  => putDouble(o, f.name, r.getDouble(i))
          case StringType  => o.put(f.name, r.getString(i)); ()
          case other => throw new IllegalStateException(
            s"encodeRows: unhandled column type $other for '${f.name}'")
        }
      }
    }
    mapper.writeValueAsString(arr)
  }

  /** Encode top-k frequent values (`?top=k` route): `[{group?, rank,
    * item, est}]` — est is the serving path's count (exact on the raw
    * fallback, within the Misra-Gries band when sketch-routed). */
  def encodeTop(df: DataFrame, grouped: Boolean): String = {
    val arr = mapper.createArrayNode()
    df.collect().foreach { r =>
      val o = arr.addObject()
      val base = if (grouped) { o.put("group", r.getString(0)); 1 } else 0
      o.put("rank", r.getLong(base))
      o.put("item", r.getString(base + 1)) // sketch items are strings
      putDouble(o, "est", r.getDouble(base + 2))
    }
    mapper.writeValueAsString(arr)
  }

  /** Encode OHLC bars (`?ohlc=` route): `{"width": W, "series":
    * [{window_start, tag, open, high, low, close}, …]}`. */
  def encodeOhlc(width: Long, df: DataFrame): String = {
    val root: ObjectNode = mapper.createObjectNode()
    root.put("width", width)
    val arr = root.putArray("series")
    df.collect().foreach { r =>
      val o = arr.addObject()
      o.put("window_start", r.getLong(0))
      o.put("tag", r.getString(1))
      putDouble(o, "open", r.getDouble(2))
      putDouble(o, "high", r.getDouble(3))
      putDouble(o, "low", r.getDouble(4))
      putDouble(o, "close", r.getDouble(5))
    }
    mapper.writeValueAsString(root)
  }

  /** Encode a gap-filled series (`?gapfill=` route): `{"grain": G,
    * "series": [{tag, bucket_start, value}, …]}` — value null where the
    * fill leaves a bucket empty (Fill.None, one-sided Interp edges). */
  def encodeGapFill(grain: Long, df: DataFrame): String = {
    val root: ObjectNode = mapper.createObjectNode()
    root.put("grain", grain)
    val arr = root.putArray("series")
    df.collect().foreach { r =>
      val o = arr.addObject()
      o.put("tag", r.getString(0))
      o.put("bucket_start", r.getLong(1))
      if (r.isNullAt(2)) o.putNull("value") else putDouble(o, "value", r.getDouble(2))
    }
    mapper.writeValueAsString(root)
  }

  /** Encode a query result in the reference's QueryR JSON: rows /
    * [{group, result}] / {result}, chosen by the query shape.
    */
  def encodeResult(qm: QueryModel, df: DataFrame): String = {
    val rows = df.collect()
    val shape = ResultShape.of(qm)
    val encode = rowEncoder(shape)
    shape match {
      case ResultShape.Scalar => // AggR
        val o: ObjectNode = mapper.createObjectNode()
        encode(o, rows.head)
        mapper.writeValueAsString(o)
      case _ => // CollectR / [GroupAggR]
        val arr = mapper.createArrayNode()
        rows.foreach(r => encode(arr.addObject(), r))
        mapper.writeValueAsString(arr)
    }
  }
}
