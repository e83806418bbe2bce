package graft

import org.scalatest.funsuite.AnyFunSuite

/** Locks tools/smoke.sql (the zero-Scala spark-sql deployment smoke)
  * against drift: every keyed query in the file must be the VERBATIM
  * text SqlFrontend.sqlFor serves for that key — the same texts the
  * oracle gate validates — so the deployment demo can never silently
  * diverge from the gated semantics.
  */
class SmokeSqlSpec extends AnyFunSuite {
  private val smoke =
    new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get("tools/smoke.sql")), "UTF-8")

  private val keyed = raw"-- key: (\w+)".r.findAllMatchIn(smoke).map(_.group(1)).toSeq

  test("smoke.sql carries keyed queries and each is sqlFor's verbatim text") {
    assert(keyed.nonEmpty, "no '-- key:' markers found in tools/smoke.sql")
    keyed.foreach { key =>
      val sql = SqlFrontend.sqlFor(key)
      assert(sql.isDefined, s"$key: no SQL path resolves via SqlFrontend.sqlFor")
      assert(smoke.contains(sql.get),
        s"$key: tools/smoke.sql text drifted from SqlFrontend.sqlFor($key)")
    }
  }

  test("smoke.sql exercises the extension-injected kernels") {
    // the deployment claim is functions-from-conf; keep at least two
    // injected kernel calls in the file
    Seq("simhash64(", "cosine_similarity(").foreach { f =>
      assert(smoke.contains(f), s"smoke.sql no longer calls $f")
    }
  }
}
