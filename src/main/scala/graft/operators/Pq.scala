package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Product quantization for embedding columns — the candidate-I/O
  * lever past int8: a `dim`-float vector (256 bytes at dim=64) encodes
  * to `m` sub-space codeword ids (one byte each — 8 bytes at m=8,
  * ~32×), and probes score candidates STRAIGHT OFF THE CODES with a
  * per-query lookup table, reconstructing nothing. At 100 TB that is
  * the difference between postings that fit the page cache and
  * postings that don't ([[AnnIndexStore]] stores the codes alongside
  * its IVF lists and probes them via [[AnnIndexStore.probePq]]).
  *
  * Training is k-means per sub-space, all `m` sub-spaces at once in
  * ONE exploded frame (vec_id, m, sub) — hash-sampled seeds,
  * `iters` Lloyd steps (assignment = an `aggregate` argmin fold over
  * the codebook literal — a generated LOOP, not m×ksub unrolled
  * expressions, so codegen stays within method limits; update = dsub
  * codegen'd avgs per (m, k) group). Deterministic: seeds come from
  * xxhash64 order, ties break on codeword id — the same
  * no-stored-model discipline as [[Similarity]]'s hyperplanes and
  * centroids. L2 is the training metric (sub-vector reconstruction is
  * a magnitude question; cosine is only meaningful on full vectors).
  *
  * Encoding emits (vec_id, code: array<tinyint>, recon_norm) — the
  * reconstruction's norm is fixed at encode time, so the ADC cosine
  * needs no second lookup table: cos(q, v̂) = ADC_dot / (|q|·|v̂|).
  */
object Pq {

  /** Trained codebooks: `books(m)(k)` is sub-space m's k-th codeword
    * (dsub doubles). Tiny by construction (m·ksub·dsub doubles) —
    * ships as a literal into encode/probe expressions.
    */
  final case class Codebooks(m: Int, dsub: Int, books: Seq[Seq[Seq[Double]]]) {
    require(books.length == m && books.forall(_.forall(_.length == dsub)),
      s"codebooks shape mismatch: expected $m x * x $dsub")
    def ksub: Int = books.head.length
  }

  private def l2(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => (x - y) * (x - y)), lit(0.0), (acc, v) => acc + v)

  /** (vec_id, m, sub) — every vector split into its m sub-vectors, the
    * frame both training and encoding run over. Explode-to-rows, not
    * m-wide projections: the [[Similarity.withBuckets]] codegen lesson.
    */
  private def subVectors(corpus: DataFrame, m: Int, dsub: Int,
                         vecCol: String, idCol: String): DataFrame =
    corpus.select(col(idCol).as("vec_id"),
        Similarity.asDouble(col(vecCol)).as("v"))
      .withColumn("m", explode(sequence(lit(0), lit(m - 1))))
      .select(col("vec_id"), col("m"),
        slice(col("v"), col("m") * dsub + 1, lit(dsub)).as("sub"))

  /** The argmin codeword id for `sub` against `books[mCol]` — ONE
    * aggregate fold carrying a (best id, best distance) struct;
    * distance ties break on the lower id (deterministic replay).
    */
  private def nearestCode(booksLit: Column, mCol: Column, sub: Column, ksub: Int): Column =
    aggregate(sequence(lit(0), lit(ksub - 1)),
      struct(lit(-1).cast("int").as("k"), lit(Double.MaxValue).as("d")),
      (acc, k) => {
        val d = l2(sub, element_at(element_at(booksLit, mCol + 1), k + 1))
        when(d < acc.getField("d"),
          struct(k.cast("int").as("k"), d.as("d"))).otherwise(acc)
      }).getField("k")

  /** Train `m` codebooks of `ksub` codewords over the corpus.
    * `ksub` ≤ 128 so codes fit `tinyint`. One pass per Lloyd step; the
    * per-step collect is m·ksub·dsub doubles (tiny, deterministic
    * order).
    */
  def train(corpus: DataFrame, m: Int = 8, ksub: Int = 32, iters: Int = 2,
            dim: Int = 64, vecCol: String = "embedding",
            idCol: String = "vec_id"): Codebooks = {
    require(dim % m == 0, s"m=$m must divide dim=$dim")
    require(ksub >= 2 && ksub <= 128, s"ksub=$ksub out of [2,128] (tinyint codes)")
    val dsub = dim / m
    val subs = graft.Materialize.checkpoint(
      subVectors(corpus, m, dsub, vecCol, idCol))
    // hash-sampled seeds, ksub per sub-space
    val w = Window.partitionBy(col("m")).orderBy(xxhash64(col("vec_id")), col("vec_id"))
    val seedRows = subs.withColumn("rn", row_number().over(w))
      .filter(col("rn") <= ksub)
      .select(col("m"), (col("rn") - 1).cast("long").as("k"), col("sub"))
      .collect()
    var books: Seq[Seq[Seq[Double]]] = (0 until m).map { mi =>
      val byK = seedRows.filter(_.getInt(0) == mi)
        .map(r => r.getLong(1) -> r.getSeq[Double](2).toSeq).toMap
      // a corpus with fewer rows than ksub pads by repeating the first
      // codeword — harmless (argmin ties break low) and only reachable
      // on degenerate fixtures
      (0L until ksub.toLong).map(k => byK.getOrElse(k, byK(0L)))
    }
    (0 until iters).foreach { _ =>
      val booksLit = typedlit(books)
      val assigned = subs.withColumn("k",
        nearestCode(booksLit, col("m"), col("sub"), ksub).cast("long"))
      val updated = assigned.groupBy(col("m"), col("k"))
        .agg(array((0 until dsub).map(i =>
          avg(element_at(col("sub"), i + 1))): _*).as("sub"))
        .collect()
      val prev = books
      books = (0 until m).map { mi =>
        val byK = updated.filter(_.getInt(0) == mi)
          .map(r => r.getLong(1) -> r.getSeq[Double](2).toSeq).toMap
        // empty cells (no row assigned) keep their previous codeword
        (0 until ksub).map(k => byK.getOrElse(k.toLong, prev(mi)(k)))
      }
    }
    Codebooks(m, dsub, books)
  }

  /** Encode every vector: (vec_id, code array<tinyint>[m], recon_norm).
    * recon_norm = |v̂| of the codeword reconstruction — stored with the
    * code so ADC cosine needs no per-probe norm table. Pure scan-stage
    * compute against the codebook literal; the only shuffle is the
    * (vec_id)-grouped code assembly.
    */
  def encode(corpus: DataFrame, cb: Codebooks,
             vecCol: String = "embedding", idCol: String = "vec_id"): DataFrame = {
    val booksLit = typedlit(cb.books)
    val coded = subVectors(corpus, cb.m, cb.dsub, vecCol, idCol)
      .withColumn("k", nearestCode(booksLit, col("m"), col("sub"), cb.ksub))
      .withColumn("cw", element_at(element_at(booksLit, col("m") + 1), col("k") + 1))
      .withColumn("nd", aggregate(transform(col("cw"), x => x * x),
        lit(0.0), (acc, v) => acc + v))
    coded.groupBy(col("vec_id"))
      .agg(
        // collect_list order is nondeterministic — reassemble by m
        transform(array_sort(collect_list(struct(col("m"), col("k")))),
          s => s.getField("k").cast("tinyint")).as("code"),
        sqrt(sum(col("nd"))).as("recon_norm"))
  }

  /** The per-query ADC lookup table: lut(m)(k) = dot(q_m, books(m)(k)).
    * Driver-side (queries are collected by the store probes anyway);
    * m·ksub doubles per query.
    */
  def lookupTable(q: Seq[Double], cb: Codebooks): Seq[Seq[Double]] =
    (0 until cb.m).map { mi =>
      val qs = q.slice(mi * cb.dsub, (mi + 1) * cb.dsub)
      cb.books(mi).map(cw => cw.iterator.zip(qs.iterator).map { case (a, b) => a * b }.sum)
    }

  /** ADC cosine of a coded row against a query's `lut` column:
    * Σ_m lut[m][code[m]] / (qnorm · recon_norm). One aggregate fold of
    * m dynamic lookups — no reconstruction, no vector reads.
    */
  def adcCosine(lut: Column, code: Column, reconNorm: Column, qnorm: Column): Column = {
    val dot = aggregate(sequence(lit(0), size(code) - 1), lit(0.0),
      (acc, mi) => acc +
        element_at(element_at(lut, mi + 1), element_at(code, mi + 1).cast("int") + 1))
    when(reconNorm === 0.0 || qnorm === 0.0, lit(0.0))
      .otherwise(dot / (reconNorm * qnorm))
  }
}
