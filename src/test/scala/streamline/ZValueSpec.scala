package streamline

import graft.SparkSuite
import org.apache.spark.sql.functions._

/** The z-order curve is only as good as the bit interleave: check the
  * Column-expression implementation against a plain-Scala reference on
  * random inputs (fixed seed — deterministic CI, same convention as
  * CepPropertySpec), and pin the property that makes z-ordering work
  * at all — a contiguous z-range maps to a bounded box, because each
  * z-bit halves one dimension. */
class ZValueSpec extends SparkSuite {

  private def ref(a: Long, b: Long, bits: Int): Long =
    (0 until bits).foldLeft(0L) { (acc, i) =>
      acc |
        (((a >> i) & 1L) << (2 * i)) |
        (((b >> i) & 1L) << (2 * i + 1))
    }

  test("expression interleave matches the reference on random inputs") {
    val sp = spark
    import sp.implicits._
    val rnd = new scala.util.Random(42)
    val pairs = Seq.fill(64)((rnd.nextInt(1 << 16).toLong,
      rnd.nextInt(1 << 16).toLong)) ++
      Seq((0L, 0L), (65535L, 65535L), (0L, 65535L), (65535L, 0L))
    val got = pairs.toDF("a", "b")
      .select($"a", $"b",
        streamline.batch.Relational.zvalue($"a", $"b").as("z"))
      .collect()
    got.foreach { r =>
      val (a, b) = (r.getLong(0), r.getLong(1))
      assert(r.getLong(2) == ref(a, b, 16), s"interleave($a, $b)")
    }
  }

  test("interleave is strictly monotone in each dimension's high bit") {
    // The top z-bit comes from b's top bit, the next from a's: any
    // point with b >= 2^15 z-sorts after every point with b < 2^15 —
    // the halving property a range exchange on z relies on.
    val sp = spark
    import sp.implicits._
    val rows = Seq((0L, 40000L), (65535L, 10000L), (123L, 32768L),
      (456L, 32767L)).toDF("a", "b")
      .select($"a", $"b", streamline.batch.Relational.zvalue($"a", $"b").as("z"))
      .collect()
    val (hi, lo) = rows.partition(_.getLong(1) >= 32768L)
    assert(hi.map(_.getLong(2)).min > lo.map(_.getLong(2)).max)
  }
}
