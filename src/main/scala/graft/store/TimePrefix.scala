package graft.store

import java.time.{Instant, LocalDate, LocalDateTime, ZoneOffset}

/** Time-range → minimal partition-prefix set
  * (reference: duo/src/utils.rs:36-181, behavior pinned by the 9 rstest
  * cases at duo/src/utils.rs:200-265).
  *
  * Catalyst's hive partition pruning makes this unnecessary for the
  * hive-layout read path ([[ParquetStore.read]]); it is kept for the
  * reference's exact multi-path layout (one `ListingTable` over explicit
  * prefixes, duo/src/partition/query.rs:38-60) and exercised by
  * [[ParquetStore.readPrefixes]].
  *
  * Semantics notes (quirks preserved deliberately):
  *  - `end` minute is bumped iff end has nonzero seconds; a sub-minute
  *    range aligned to :00 yields no prefixes (same as the reference).
  *  - a full 0..60 minute sweep collapses to the hour prefix; a full
  *    0..24 hour sweep collapses to the date prefix.
  */
object TimePrefix {

  private def minuteSlot(minute: Int, g: Int): Option[String] = {
    if (minute >= 60) None
    else {
      val blockStart = minute / g * g
      if (g == 1) Some(f"$blockStart%02d")
      else Some(f"$blockStart%02d-${blockStart + g - 1}%02d")
    }
  }

  def generatePrefixes(startUs: Long, endUs: Long, granularity: Int = 1): Seq[String] = {
    val start = LocalDateTime.ofInstant(
      Instant.ofEpochSecond(Math.floorDiv(startUs, 1000000L)), ZoneOffset.UTC)
    val end = LocalDateTime.ofInstant(
      Instant.ofEpochSecond(Math.floorDiv(endUs, 1000000L)), ZoneOffset.UTC)
    val endMinute = end.getMinute + (if (end.getSecond > 0) 1 else 0)
    datePrefixes(start.toLocalDate, end.toLocalDate,
      (start.getHour, start.getMinute), (end.getHour, endMinute), granularity)
  }

  private def minutePrefixes(prefix: String, startMin: Int, endMin: Int,
      g: Int): Seq[String] = {
    if (startMin == endMin) return Nil
    val (startBlock, endBlock) = (startMin / g, endMin / g)
    if (endBlock - startBlock >= 60 / g) return Seq(prefix)
    val blocks =
      if (g > 1) startBlock to endBlock
      else startBlock until endBlock
    blocks.flatMap(b => minuteSlot(b * g, g).map(s => s"${prefix}minute=$s/"))
  }

  private def hourPrefixes(prefix: String, startHour: Int, startMin: Int,
      endHour: Int, endMin: Int, g: Int): Seq[String] = {
    if (endHour - startHour >= 24) return Seq(prefix)
    (startHour to endHour).takeWhile(_ < 24).flatMap { h =>
      val hp = f"${prefix}hour=$h%02d/"
      val isStart = h == startHour
      val isEnd = h == endHour
      if (isStart || isEnd)
        minutePrefixes(hp, if (isStart) startMin else 0, if (isEnd) endMin else 60, g)
      else Seq(hp)
    }
  }

  private def datePrefixes(startDate: LocalDate, endDate: LocalDate,
      startTime: (Int, Int), endTime: (Int, Int), g: Int): Seq[String] = {
    Iterator.iterate(startDate)(_.plusDays(1))
      .takeWhile(!_.isAfter(endDate))
      .flatMap { d =>
        val prefix = s"date=$d/"
        val isStart = d == startDate
        val isEnd = d == endDate
        if (isStart || isEnd) {
          val (sh, sm) = if (isStart) startTime else (0, 0)
          val (eh, em) = if (isEnd) endTime else (24, 60)
          hourPrefixes(prefix, sh, sm, eh, em, g)
        } else Seq(prefix)
      }
      .toSeq
  }
}
