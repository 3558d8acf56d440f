package graft.operators

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** Batch upsert/merge semantics (the reference's Hudi op-mode family as
  * engine transforms): latest-wins changelog apply and SCD2 dimension
  * maintenance. */
class UpsertSpec extends SparkTestBase {

  test("applyChangelog: latest event per key wins — a later delete beats " +
    "an earlier update, an update lands its full row image, inserts land, " +
    "untouched keys copy through") {
    val s = spark; import s.implicits._
    val base = Seq((1L, "a", 10.0), (2L, "b", 20.0), (3L, "c", 30.0))
      .toDF("k", "name", "v")
    val log = Seq(
      (1L, "a2", 11.0, "U", 1L), // update k=1
      (2L, "b", 20.0, "U", 1L),  // update then...
      (2L, "b", 20.0, "D", 2L),  // ...a LATER delete: delete wins
      (3L, "cX", 99.0, "D", 5L), // delete then...
      (3L, "c2", 31.0, "U", 7L), // ...a LATER re-insert: update wins
      (4L, "d", 40.0, "U", 1L))  // brand-new key
      .toDF("k", "name", "v", "op", "seq")
    val out = Upsert.applyChangelog(base, log, Seq("k"))
      .collect().map(r => r.getLong(0) -> ((r.getString(1), r.getDouble(2))))
      .toMap
    assert(out == Map(
      1L -> (("a2", 11.0)),
      3L -> (("c2", 31.0)),
      4L -> (("d", 40.0))), s"got $out")
  }

  test("applyChangelog rejects a base that carries the control columns") {
    val s = spark; import s.implicits._
    val base = Seq((1L, 1L)).toDF("k", "seq")
    val log = Seq((1L, 2L, "U", 1L)).toDF("k", "seq2", "op", "seq")
    intercept[IllegalArgumentException](
      Upsert.applyChangelog(base, log, Seq("k")))
  }

  test("scd2Merge: a real change closes the current row and inserts the " +
    "new version; a NO-OP re-statement does not version; a new key " +
    "inserts fresh; history rows carry byte-identical") {
    val s = spark; import s.implicits._
    val dim = Seq(
      // k=1: one closed history row + the current row
      (1L, 100.0, 0L, 5L, false),
      (1L, 110.0, 5L, 99999999L, true),
      (2L, 200.0, 0L, 99999999L, true),
      (3L, 300.0, 0L, 99999999L, true))
      .toDF("k", "bal", "valid_from", "valid_to", "is_current")
    val updates = Seq(
      (1L, 120.0), // real change
      (2L, 200.0), // no-op re-statement (daily full re-extract)
      (9L, 900.0)) // brand-new key
      .toDF("k", "bal")
    val out = Upsert.scd2Merge(dim, updates, Seq("k"), Seq("bal"),
      effectiveDate = 10L)
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getLong(2),
        r.getLong(3), r.getBoolean(4))).toSet
    assert(out == Set(
      (1L, 100.0, 0L, 5L, false),          // history carries
      (1L, 110.0, 5L, 10L, false),         // current closed at eff date
      (1L, 120.0, 10L, 99999999L, true),   // new version open-ended
      (2L, 200.0, 0L, 99999999L, true),    // no-op: untouched
      (3L, 300.0, 0L, 99999999L, true),    // not in batch: untouched
      (9L, 900.0, 10L, 99999999L, true)),  // fresh insert
      s"got $out")
  }

  test("scd2Merge: null-safe change detection — null->value and " +
    "value->null both version; null->null is a no-op") {
    val s = spark; import s.implicits._
    val dim = Seq[(java.lang.Long, java.lang.Double, Long, Long, Boolean)](
      (1L, null, 0L, 99999999L, true),
      (2L, 2.0, 0L, 99999999L, true),
      (3L, null, 0L, 99999999L, true))
      .toDF("k", "bal", "valid_from", "valid_to", "is_current")
    val updates = Seq[(java.lang.Long, java.lang.Double)](
      (1L, 1.5), (2L, null), (3L, null)).toDF("k", "bal")
    val out = Upsert.scd2Merge(dim, updates, Seq("k"), Seq("bal"),
      effectiveDate = 7L)
    assert(out.where(col("k") === 3L).count() == 1,
      "null->null must not version")
    assert(out.where(col("k") === 1L).count() == 2 &&
      out.where(col("k") === 2L).count() == 2,
      "null->value and value->null must both version")
    assert(out.where(col("k") === 2L && col("is_current"))
      .select("bal").head().isNullAt(0))
  }

  test("scd2Merge fails fast on a batch that states a key twice (it " +
    "would insert two open rows — unrepairable later)") {
    val s = spark; import s.implicits._
    val dim = Seq((1L, 1.0, 0L, 99999999L, true))
      .toDF("k", "bal", "valid_from", "valid_to", "is_current")
    val updates = Seq((1L, 2.0), (1L, 3.0)).toDF("k", "bal")
    intercept[IllegalArgumentException](
      Upsert.scd2Merge(dim, updates, Seq("k"), Seq("bal"), 5L))
  }
}
