package graft

import scala.util.Random

import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.Timing
import graft.ingest.{SpanMerger, SpanRecord}
import graft.store.{SchemaRegistry, TimePrefix}

/** Property-style randomized suites (seeded, deterministic) over the
  * pure components — the SURVEY §5 property plan: merge laws, parse
  * round-trips, prefix-set invariants.
  */
class PropertySpec extends AnyFunSuite {

  private val rnd = new Random(42)

  test("parse_duration inverts suffix construction for any non-negative n") {
    (0 until 500).foreach { _ =>
      val n = rnd.nextLong(1000000L).abs
      assert(Timing.parseDuration(s"${n}us").contains(n))
      assert(Timing.parseDuration(s"${n}ms").contains(n * 1000L))
      assert(Timing.parseDuration(s"${n}s").contains(n * 1000000L))
    }
  }

  test("format_timing_value unit boundaries hold for random inputs") {
    (0 until 2000).foreach { _ =>
      val us = rnd.nextLong(100000000L).abs
      val out = Timing.formatTimingValue(us)
      if (us < 1000) assert(out == s"${us}us")
      else if (us < 1000000) assert(out.endsWith("ms") && !out.endsWith("sms"))
      else assert(out.endsWith("s") && !out.endsWith("ms"))
    }
  }

  test("BottomKAgg merge laws: reference semantics, associative, commutative") {
    // the order-statistics fold BottomKAgg carries through batch
    // partial-agg trees AND streaming state must be a true
    // commutative monoid up to the k-cap, or partitioning/arrival
    // order would leak into the sketch
    val agg = graft.functions.BottomKAgg(
      org.apache.spark.sql.catalyst.expressions.Literal(0L), k = 16)
    def fold(xs: Seq[Long]): Array[Long] =
      xs.foldLeft(agg.createAggregationBuffer()) { (b, v) =>
        // drive insert via merge with a singleton (update() needs an
        // InternalRow; merge is the same algebra)
        agg.merge(b, Array(v))
      }
    def ref(xs: Seq[Long]): Seq[Long] = xs.distinct.sorted.take(16)
    (0 until 300).foreach { _ =>
      val n = rnd.nextInt(60)
      val xs = Seq.fill(n)(rnd.nextLong(40)) // dense → many duplicates
      val ys = Seq.fill(rnd.nextInt(60))(rnd.nextLong(40))
      val zs = Seq.fill(rnd.nextInt(60))(rnd.nextLong(40))
      assert(fold(xs).toSeq == ref(xs))
      val (a, b, c) = (fold(xs), fold(ys), fold(zs))
      // merge == reference on the union
      assert(agg.merge(a.clone(), b.clone()).toSeq == ref(xs ++ ys))
      // commutative and associative
      assert(agg.merge(a.clone(), b.clone()).toSeq ==
        agg.merge(b.clone(), a.clone()).toSeq)
      assert(
        agg.merge(agg.merge(a.clone(), b.clone()), c.clone()).toSeq ==
          agg.merge(a.clone(), agg.merge(b.clone(), c.clone())).toSeq)
      // serde round-trip
      assert(agg.deserialize(agg.serialize(a)).toSeq == a.toSeq)
    }
  }

  test("schema merge is monotone, idempotent, and order-preserving") {
    def randSchema(): StructType = StructType(
      rnd.shuffle((0 until 20).toList).take(rnd.nextInt(10) + 1)
        .map(i => StructField(s"f$i", if (i % 2 == 0) LongType else StringType)))
    (0 until 200).foreach { _ =>
      val (a, b) = (randSchema(), randSchema())
      val m = SchemaRegistry.merge(a, b)
      // monotone: every field of both inputs survives with its type
      (a.fields ++ b.fields).foreach { f =>
        assert(m(f.name).dataType == f.dataType)
      }
      // base prefix preserved, then additions in arrival order
      assert(m.fields.take(a.length).map(_.name).sameElements(a.fieldNames))
      // idempotent
      assert(SchemaRegistry.merge(m, b) == m)
      assert(SchemaRegistry.merge(m, a) == m)
    }
  }

  test("span merge: last end wins, first identity wins, tags accumulate") {
    (0 until 300).foreach { _ =>
      val id = rnd.nextLong()
      val n = rnd.nextInt(5) + 1
      val recs = (0 until n).map { i =>
        SpanRecord(i.toLong, id,
          if (rnd.nextBoolean()) Some(rnd.nextLong()) else None,
          trace_id = 1, name = s"n$i", process_id = "p", start = 100L + i,
          end = if (rnd.nextBoolean()) Some(rnd.nextLong().abs) else None,
          tags = Map(s"k${rnd.nextInt(3)}" -> graft.model.TagValue.str(i.toString)))
      }
      val m = SpanMerger.mergeAll(recs)
      assert(m.name == "n0" && m.start == 100L) // first record pins identity
      assert(m.end == recs.last.end) // end mirrors the last record
      // each tag key holds the value of the LAST record that wrote it
      m.tags.foreach { case (k, v) =>
        val lastWriter = recs.lastIndexWhere(_.tags.contains(k))
        assert(recs(lastWriter).tags(k) == v)
      }
      val present = recs.flatMap(_.parent_id).lastOption
      assert(m.parent_id == present) // parent: last non-null, never erased
    }
  }

  test("prefix sets are distinct, ordered, and at most range-bounded") {
    (0 until 300).foreach { _ =>
      val start = 1600000000000000L + rnd.nextLong(100000000000000L).abs
      val span = rnd.nextLong(3L * 86400 * 1000000L).abs + 1
      val got = TimePrefix.generatePrefixes(start, start + span)
      assert(got.distinct == got)
      assert(got == got.sorted, s"prefixes not sorted for $start+$span")
      // a range of m whole minutes can never need more than m+2 prefixes
      val minutes = span / 60000000L + 2
      assert(got.size <= minutes + 2)
    }
  }
}
