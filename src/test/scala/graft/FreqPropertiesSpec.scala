package graft

import graft.functions.MgOps
import org.apache.spark.unsafe.types.UTF8String
import org.scalacheck.{Gen, Properties}
import org.scalacheck.Prop.forAll

/** The Misra-Gries laws the 100 TB plan relies on, checked on the pure
  * state machine (no Spark plan): for ANY stream and ANY chunking into
  * partial summaries merged in order,
  *
  *  - no overcount: est(x) <= true(x) for every tracked item;
  *  - bounded undercount: est(x) >= true(x) - N/(capacity+1), counting
  *    absent items as est 0 (mergeable-summaries bound, Agarwal et al.);
  *  - retention: any item with true(x) > N/(capacity+1) is tracked —
  *    the guarantee [[graft.operators.Frequency.heavyHitterTopK]]'s
  *    candidate stage hands to its exact recount.
  */
object FreqPropertiesSpec extends Properties("MisraGries") {

  private val genCase: Gen[(Seq[String], Seq[Int], Int)] = for {
    n <- Gen.choose(1, 400)
    // skewed alphabet: low ids drawn far more often (freq ~ 1/(id+1))
    toks <- Gen.listOfN(n, Gen.frequency(
      (0 until 30).map(i => (30 - i, Gen.const(s"t$i"))): _*))
    nChunks <- Gen.choose(1, 5)
    cuts <- Gen.listOfN(nChunks - 1, Gen.choose(0, n))
    capacity <- Gen.choose(1, 12)
  } yield (toks, cuts.sorted :+ n, capacity)

  property("merged summaries keep the MG bounds for any chunking") =
    forAll(genCase) { case (toks, cuts, capacity) =>
      val chunks = (0 +: cuts).sliding(2).map { w =>
        toks.slice(w.head, w.last)
      }.toSeq
      val partials = chunks.map { chunk =>
        val s = scala.collection.mutable.HashMap.empty[UTF8String, Long]
        chunk.foreach(t => MgOps.update(s, UTF8String.fromString(t), capacity))
        s
      }
      val merged = partials.head
      partials.tail.foreach(p => MgOps.merge(merged, p, capacity))

      val truth = toks.groupBy(identity).map { case (k, v) => (k, v.size.toLong) }
      val n = toks.size.toDouble
      val bound = n / (capacity + 1)
      val est = merged.map { case (k, v) => (k.toString, v) }.toMap

      val sizeOk = merged.size <= capacity
      val noOver = est.forall { case (k, e) => e <= truth.getOrElse(k, 0L) }
      val bounded = truth.forall { case (k, t) =>
        est.getOrElse(k, 0L) >= t - bound - 1e-9
      }
      val retained = truth.forall { case (k, t) =>
        t <= bound + 1e-9 || est.contains(k)
      }
      sizeOk && noOver && bounded && retained
    }
}
