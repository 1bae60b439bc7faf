package graft

import graft.operators.{ClusterIndex, Dedup}
import java.nio.file.Files

/** Incremental duplicate-cluster maintenance: merging a batch's edges
  * into the stored assignment must be BIT-IDENTICAL to one-shot
  * connected components over the union of all edges — min-id labels
  * are canonical, so there is no "modulo relabeling" escape hatch.
  */
class ClusterIndexSpec extends SparkSpec {
  import spark.implicits._

  private def edges(ps: (Long, Long)*) = ps.toDF("id_a", "id_b")

  private def assignRows(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(r => (r.getLong(0), r.getLong(1))).toSeq.sorted

  // history: {1,2,3} (chain), {10,11}, {20} singleton-self
  private val e1 = edges(1L -> 2L, 2L -> 3L, 10L -> 11L, 20L -> 20L)

  test("append == one-shot CC over the edge union, including cross-batch merges of existing clusters") {
    val p = Files.createTempDirectory("graft-ci1").toString
    val ix = new ClusterIndex(spark, p)
    assert(ix.write(e1) == 0L)
    // batch: new docs 30/31 join cluster {10,11}; new pair {40,41};
    // and an edge MERGING existing clusters {1,2,3} and {10,11}
    val e2 = edges(30L -> 10L, 30L -> 31L, 40L -> 41L, 3L -> 11L)
    assert(ix.append(e2) == 1L)
    val oneShot = assignRows(Dedup.connectedComponents(e1.unionByName(e2)))
    assert(assignRows(ix.assignment()) == oneShot)
    // fresh session reads the same fold off disk
    assert(assignRows(new ClusterIndex(spark.newSession(), p).assignment()) == oneShot)
    // survivors mirror the one-shot helper
    assert(ix.survivors().collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq ==
      Dedup.clusterSurvivors(e1.unionByName(e2))
        .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq)
    // batch cost on disk: v1's assign dir holds ONLY the new ids
    assert(spark.read.parquet(s"$p/v1/assign").count() == 4L) // 30,31,40,41
  }

  test("chained merges resolve transitively through the remap chain; compact folds it; vacuum reaps") {
    val p = Files.createTempDirectory("graft-ci2").toString
    val ix = new ClusterIndex(spark, p)
    ix.write(e1)
    val e2 = edges(30L -> 10L)            // 30 joins {10,11}
    val e3 = edges(10L -> 2L, 50L -> 51L) // then {10,11,30} merges into {1,2,3}
    ix.append(e2)
    ix.append(e3)
    val oneShot = assignRows(Dedup.connectedComponents(
      e1.unionByName(e2).unionByName(e3)))
    assert(assignRows(ix.assignment()) == oneShot)
    // {1,2,3,10,11,30} all label 1 after the transitive merge
    assert(assignRows(ix.assignment()).filter(_._1 == 30L).head._2 == 1L)
    val v = ix.compact()
    assert(assignRows(new ClusterIndex(spark.newSession(), p).assignment()) == oneShot)
    ix.vacuum(0)
    assert(ix.versions == Seq(v))
    assert(assignRows(ix.assignment()) == oneShot)
  }

  test("randomized: arbitrary edge sets split across arbitrary appends == one-shot (seeded)") {
    // the exactness law under adversarial shapes a hand fixture can't
    // cover: random multigraphs (self-loops, repeated edges, chains
    // that merge across batch boundaries) split into 1-4 appends must
    // reproduce one-shot CC bit for bit. Seeded — replays identically.
    val rnd = new scala.util.Random(20260813L)
    (1 to 5).foreach { trial =>
      val nNodes = 30 + rnd.nextInt(40)
      val nEdges = 20 + rnd.nextInt(60)
      val all = Seq.fill(nEdges)(
        (rnd.nextInt(nNodes).toLong, rnd.nextInt(nNodes).toLong))
      val nBatches = 1 + rnd.nextInt(4)
      val batches = all.grouped(math.max(1, all.size / nBatches)).toSeq
      val p = Files.createTempDirectory(s"graft-ci-rand$trial").toString
      val ix = new ClusterIndex(spark, p)
      ix.write(edges(batches.head: _*))
      batches.tail.foreach(b => ix.append(edges(b: _*)))
      assert(assignRows(ix.assignment()) ==
        assignRows(Dedup.connectedComponents(edges(all: _*))),
        s"trial $trial diverged (nodes=$nNodes edges=$nEdges batches=${batches.size})")
    }
  }

  test("deep chain: 30 appends with repeated cross-history merges == one-shot; compact mid-chain invisible") {
    // the streaming-cadence scenario at depth: a long uncompacted
    // chain folds one remap join per dir, and every remap must apply
    // to everything EARLIER — a positional fold bug (remap applied to
    // the wrong prefix, or transitivity broken across 30 links) only
    // shows up past the 1-4-append shapes the randomized law covers.
    // Each batch links a fresh chain of 3 ids and merges it into a
    // PRIOR batch's cluster (round-robin over the 5 oldest), forcing
    // remaps whose targets are themselves remapped later.
    val p = Files.createTempDirectory("graft-ci-deep").toString
    val ix = new ClusterIndex(spark, p)
    def batch(b: Int): Seq[(Long, Long)] = {
      val base = 100L * b
      val own = Seq(base -> (base + 1), (base + 1) -> (base + 2))
      if (b == 0) own
      else own :+ (base -> (100L * (b % math.min(b, 5))))
    }
    ix.write(edges(batch(0): _*))
    (1 until 30).foreach { b =>
      ix.append(edges(batch(b): _*))
      if (b == 15) ix.compact() // mid-chain fold must change nothing
    }
    val all = (0 until 30).flatMap(batch)
    val oneShot = assignRows(Dedup.connectedComponents(edges(all: _*)))
    assert(assignRows(ix.assignment()) == oneShot)
    // and a fresh session reads the same chain identically
    assert(assignRows(new ClusterIndex(spark.newSession(), p).assignment()) == oneShot)
  }

  test("pinned reader survives compact + retention vacuum; 0-retention vacuum fails it loudly") {
    // the vacuum contract the older stores spec and the new ones must
    // share (round-7 verdict #8): a reader pinned to version N keeps
    // working through a compact (pure rewrite, deletes nothing) and
    // through any vacuum whose retention window still covers N; only a
    // 0-retention reap makes N unprobeable — and then loudly, never as
    // silently-wrong data.
    val p = Files.createTempDirectory("graft-ci4").toString
    val ix = new ClusterIndex(spark, p)
    ix.write(e1)
    ix.append(edges(30L -> 10L))
    val vPinned = ix.currentVersion.get
    val pinnedRows = assignRows(ix.assignment(Some(vPinned)))
    val preBuilt = ix.assignment(Some(vPinned)) // plan compiled pre-compact
    val vC = ix.compact()
    assert(vC > vPinned)
    // compact deleted nothing: the pinned probe AND the already-built
    // plan both still read, bit-identically
    assert(assignRows(ix.assignment(Some(vPinned))) == pinnedRows)
    assert(assignRows(preBuilt) == pinnedRows)
    // a retention-window vacuum spares the superseded-but-recent
    // version — the concurrent reader's grace window
    assert(ix.vacuum(retentionMs = 3600000L) == 0)
    assert(assignRows(ix.assignment(Some(vPinned))) == pinnedRows)
    // 0-retention reap: the pinned version is gone, and probing it is
    // a loud IllegalStateException naming the cause
    assert(ix.vacuum(0) >= 1)
    val err = intercept[IllegalStateException](ix.assignment(Some(vPinned)))
    assert(err.getMessage.contains("not a probeable version"))
    // the compacted survivor still serves the same assignment
    assert(assignRows(ix.assignment()) == pinnedRows)
  }

  test("no-op and edgeless batches commit nothing; append before write fails loudly") {
    val p = Files.createTempDirectory("graft-ci3").toString
    val ix = new ClusterIndex(spark, p)
    intercept[IllegalStateException](ix.append(e1))
    val v0 = ix.write(e1)
    // edges entirely inside one existing cluster: nothing changes
    assert(ix.append(edges(1L -> 3L)) == v0)
    // empty batch: nothing
    assert(ix.append(edges()) == v0)
    assert(ix.versions == Seq(0L))
    assert(assignRows(ix.assignment()) == assignRows(Dedup.connectedComponents(e1)))
  }
}
