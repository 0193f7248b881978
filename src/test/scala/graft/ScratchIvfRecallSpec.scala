package graft

import graft.functions.Similarity

/** SCRATCH (delete before commit): measure trained-IVF planted-dup gate. */
class ScratchIvfRecallSpec extends SparkTestBase {
  test("trained IVF planted-dup recall measurement") {
    for (dir <- Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01",
        "/root/testdata/sf0.1")) {
      val rows = Similarity.annIvfRecall(spark, dir).collect()
      println(s"[$dir] " + rows.map(r =>
        s"${r.getLong(0)}:${r.getLong(1)}").mkString(" "))
      assert(rows.length == 8)
    }
  }
}
