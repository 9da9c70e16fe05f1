package graft

import scala.concurrent.{Await, Future}
import scala.concurrent.duration._
import scala.concurrent.ExecutionContext.Implicits.global

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.core.{DatasetMeta, DvRef, Fetch, Mutations, Publish, Versions}

/** File-level optimistic concurrency for mutations (the Delta conflict-
  * detection shape, r15): mutations take no lock — two DELETEs on
  * disjoint file sets both commit; conflicting commits lose LOUDLY with
  * ConcurrentModificationException, never a silent clobber.
  */
class ConcurrentMutationSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def fresh(tag: String): String = {
    val root = TestSpark.tmpDir(tag)
    Publish.publishVersioned(spark,
      (0 until 300).map(i => (i.toLong, s"p${i % 3}", i * 10L)).toDF("k", "part", "v"),
      root, Seq("part"))
    root
  }

  private def meta(root: String): DatasetMeta =
    DatasetMeta.read(spark, root).get

  private def fileIn(root: String, part: String): String =
    Versions.snapshotFullAt(spark, root,
      Versions.latestVersion(spark, root).get)._1
      .find(_.contains(s"part=$part")).get

  test("two DELETEs on disjoint partitions race and BOTH commit") {
    val root = fresh("occ_disjoint")
    val fa = Future(Mutations.deleteWhere(spark, root,
      col("part") === "p0" && col("k") < 30))
    val fb = Future(Mutations.deleteWhere(spark, root,
      col("part") === "p1" && col("k") < 30))
    val (ra, rb) = (Await.result(fa, 120.seconds), Await.result(fb, 120.seconds))
    assert(Set(ra.version, rb.version) == Set(2, 3),
      s"both must land as consecutive versions, got ${ra.version}/${rb.version}")
    val left = Fetch.fetch(spark, root).select("k").as[Long].collect().toSet
    val expected = (0L until 300L).filterNot(k =>
      k < 30 && (k % 3 == 0 || k % 3 == 1)).toSet
    assert(left == expected, "the final snapshot reflects BOTH deletes")
  }

  test("overlapping rewrite loses loudly: file removed by a concurrent commit") {
    val root = fresh("occ_overlap")
    val f = fileIn(root, "p0")
    Mutations.deleteWhere(spark, root, col("part") === "p0" && col("k") % 2 === 0)
    val e = intercept[java.util.ConcurrentModificationException] {
      Versions.commit(spark, root, "rewrite", Nil, meta(root),
        removedRel = Seq(f), baseVersion = Some(1))
    }
    assert(e.getMessage.contains("rewritten/removed"))
  }

  test("a DV landing on a rewritten file blocks the stale rewrite (no resurrection)") {
    val root = fresh("occ_dv_vs_rewrite")
    val f = fileIn(root, "p0")
    Mutations.deleteWhereDv(spark, root, col("part") === "p0" && col("k") === 0L)
    val e = intercept[java.util.ConcurrentModificationException] {
      Versions.commit(spark, root, "rewrite", Nil, meta(root),
        removedRel = Seq(f), baseVersion = Some(1))
    }
    assert(e.getMessage.contains("deletion vector"))
  }

  test("stacked delete_dv on one file commutes (still legal)") {
    val root = fresh("occ_dv_stack")
    val f = fileIn(root, "p0")
    Mutations.deleteWhereDv(spark, root, col("part") === "p0" && col("k") === 0L)
    // a second DELETE-dv computed against v1 still lands: deletes union
    val v = Versions.commit(spark, root, "delete_dv", Nil, meta(root),
      dvs = Seq(DvRef("_graft_dv/occ-test-empty", Nil)), baseVersion = Some(1))
    assert(v == 3)
  }

  test("update_dv conflicts with a concurrent DV on the same file (lost update)") {
    val root = fresh("occ_dv_vs_dv")
    val f = fileIn(root, "p0")
    Mutations.deleteWhereDv(spark, root, col("part") === "p0" && col("k") === 0L)
    val e = intercept[java.util.ConcurrentModificationException] {
      Versions.commit(spark, root, "update_dv", Nil, meta(root),
        dvs = Seq(DvRef("_graft_dv/occ-test", Seq(f))), baseVersion = Some(1))
    }
    assert(e.getMessage.contains("concurrent row changes"))
  }

  test("metadata changes conflict: constraints added after the base read") {
    val root = fresh("occ_constraint")
    val f = fileIn(root, "p2")
    Versions.addConstraint(spark, root, "v_pos", "v >= 0")
    val e = intercept[java.util.ConcurrentModificationException] {
      Versions.commit(spark, root, "rewrite", Nil, meta(root),
        removedRel = Seq(f), baseVersion = Some(1))
    }
    assert(e.getMessage.contains("constraints changed"))
  }

  test("a guarded re-layout overwrite refuses to discard a newer commit") {
    val root = fresh("occ_compact")
    Publish.publishVersioned(spark, Seq((900L, "p0", 1L)).toDF("k", "part", "v"),
      root, Seq("part"), mode = "append")
    val e = intercept[java.util.ConcurrentModificationException] {
      Versions.commit(spark, root, "overwrite", Nil, meta(root),
        baseVersion = Some(1))
    }
    assert(e.getMessage.contains("stale"))
    // unguarded user overwrites stay last-writer-wins by contract
    Publish.publishVersioned(spark, Seq((1L, "p0", 1L)).toDF("k", "part", "v"),
      root, Seq("part"))
    assert(Fetch.fetch(spark, root).count() == 1)
  }

  // ---- READ-SET validation (r16): file-level checks can't see a
  // concurrent commit's ADDED files, so rows landing inside a mutation's
  // predicate/key read set after its locate pass must conflict — the
  // Delta ConcurrentAppend rule. preCommitHook holds the stale-read
  // window open deterministically.

  private def withHook[A](body: () => Unit)(run: => A): A = {
    Mutations.preCommitHook = () => { Mutations.preCommitHook = () => (); body() }
    try run finally Mutations.preCommitHook = () => ()
  }

  test("an append landing rows inside a DELETE's predicate fails the delete loudly") {
    val root = fresh("occ_rs_append_in")
    val e = intercept[java.util.ConcurrentModificationException] {
      withHook(() => Publish.publishVersioned(spark,
        Seq((900L, "p0", 5L)).toDF("k", "part", "v"), root, Seq("part"),
        mode = "append")) {
        Mutations.deleteWhere(spark, root, col("part") === "p0")
      }
    }
    assert(e.getMessage.contains("read set"))
    // the loser left no trace: all 300 originals plus the racer's append
    assert(Fetch.fetch(spark, root).count() == 301)
  }

  test("an append OUTSIDE the predicate commutes with the delete") {
    val root = fresh("occ_rs_append_out")
    withHook(() => Publish.publishVersioned(spark,
      Seq((900L, "p9", 5L)).toDF("k", "part", "v"), root, Seq("part"),
      mode = "append")) {
      Mutations.deleteWhere(spark, root, col("part") === "p0")
    }
    val got = Fetch.fetch(spark, root).select("k", "part")
      .as[(Long, String)].collect()
    assert(!got.exists(_._2 == "p0") && got.exists(_._1 == 900L))
    assert(got.length == 201, "both commits landed")
  }

  test("two MERGEs inserting one new key cannot double-insert (rewrite + DV modes)") {
    def src(v: Long) = Seq((999L, "p0", v)).toDF("k", "part", "v")
    val root = fresh("occ_rs_merge")
    val e = intercept[java.util.ConcurrentModificationException] {
      withHook(() => Mutations.merge(spark, root, src(2L), Seq("k"))) {
        Mutations.merge(spark, root, src(1L), Seq("k"))
      }
    }
    assert(e.getMessage.contains("read set"))
    val rows = Fetch.fetch(spark, root).where(col("k") === 999L)
      .select("v").as[Long].collect()
    assert(rows.toSeq == Seq(2L), "exactly the winner's row")
    // DV-backed merge: same key race, same loud loss
    val root2 = fresh("occ_rs_merge_dv")
    intercept[java.util.ConcurrentModificationException] {
      withHook(() => Mutations.mergeDv(spark, root2, src(2L), Seq("k"))) {
        Mutations.mergeDv(spark, root2, src(1L), Seq("k"))
      }
    }
    assert(Fetch.fetch(spark, root2).where(col("k") === 999L).count() == 1)
  }

  test("DV delete misses a concurrently updated row → conflicts, not a silent skip") {
    val root = fresh("occ_rs_dv_update")
    // the racer flips a row INTO the delete's predicate (v: 2000 → -1);
    // the predicate also matches k=0 (v=0) so the delete reaches its commit
    val e = intercept[java.util.ConcurrentModificationException] {
      withHook(() => Mutations.updateWhere(spark, root,
        col("k") === 200L, Map("v" -> lit(-1L)))) {
        Mutations.deleteWhereDv(spark, root, col("v") < 10L)
      }
    }
    assert(e.getMessage.contains("read set"))
  }

  // ---- OPTIMIZE under OCC (r16): small-file compaction is a guarded
  // REWRITE of exactly its input files — it commutes with appends and
  // loses loudly to anything touching those inputs.

  test("OPTIMIZE racing an optimistic append: BOTH commit") {
    val root = fresh("occ_opt_append")
    // ≥2 small files so the pack has inputs
    Publish.publishVersioned(spark, Seq((500L, "p0", 1L)).toDF("k", "part", "v"),
      root, Seq("part"), mode = "append")
    val vBefore = Versions.latestVersion(spark, root).get
    // the append's write->commit window holds while OPTIMIZE runs to
    // completion: compaction reads the committed snapshot, never the
    // uncommitted bytes, and the append lands on top
    Publish.postWriteHook = () => {
      Publish.postWriteHook = () => ()
      Versions.compactSmall(spark, root, smallBytes = 1L << 30)
    }
    try Publish.publishVersioned(spark, Seq((600L, "p1", 2L)).toDF("k", "part", "v"),
      root, Seq("part"), mode = "append")
    finally Publish.postWriteHook = () => ()
    assert(Versions.latestVersion(spark, root).get == vBefore + 2,
      "compaction AND append both committed")
    val got = Fetch.fetch(spark, root).select("k").as[Long].collect().toSet
    assert(got == (0L until 300L).toSet + 500L + 600L)
  }

  test("OPTIMIZE racing an overlapping DV delete: the stale side loses loudly") {
    val root = fresh("occ_opt_dv")
    Publish.publishVersioned(spark, Seq((500L, "p0", 1L)).toDF("k", "part", "v"),
      root, Seq("part"), mode = "append")
    // the DV delete's locate pass ran; OPTIMIZE then rewrites (removes)
    // the very file the DV covers — the delete must conflict, because
    // its (file, row_index) pairs name a file that no longer exists
    val e = intercept[java.util.ConcurrentModificationException] {
      withHook(() => Versions.compactSmall(spark, root, smallBytes = 1L << 30)) {
        Mutations.deleteWhereDv(spark, root, col("k") === 0L)
      }
    }
    assert(e.getMessage.contains("rewritten/removed"))
    // the winner's state is intact: all rows live, nothing deleted
    assert(Fetch.fetch(spark, root).count() == 301)
    // and a re-run of the loser against the fresh snapshot succeeds
    Mutations.deleteWhereDv(spark, root, col("k") === 0L)
    assert(Fetch.fetch(spark, root).count() == 300)
  }

  test("a commit landing between read and CAS fails the racer, not the data") {
    // serialized equivalent of the interleaving: the conflict check runs
    // against the CURRENT latest on every CAS attempt, so a mutation that
    // lost the interleaving race can never silently clobber — verified
    // end-to-end by racing an overlapping pair repeatedly
    val root = fresh("occ_pair")
    val results = Seq(
      Future(try Right(Mutations.deleteWhere(spark, root, col("k") % 2 === 0))
             catch { case e: java.util.ConcurrentModificationException => Left(e) }),
      Future(try Right(Mutations.deleteWhere(spark, root, col("k") % 2 === 1))
             catch { case e: java.util.ConcurrentModificationException => Left(e) })
    ).map(Await.result(_, 120.seconds))
    // every file contains both parities → the file sets fully overlap:
    // exactly one succeeds when truly interleaved; both succeed when
    // timing serialized them. Either way the survivors are consistent.
    val okCount = results.count(_.isRight)
    assert(okCount >= 1, "at least one mutation must commit")
    val left = Fetch.fetch(spark, root).select("k").as[Long].collect().toSet
    if (okCount == 2) assert(left.isEmpty)
    else {
      val parity = left.headOption.map(_ % 2)
      assert(parity.forall(p => left.forall(_ % 2 == p)),
        "a lost race must leave the winner's result intact, not a mix")
    }
  }
}
