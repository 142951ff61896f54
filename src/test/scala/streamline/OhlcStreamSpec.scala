package streamline

import graft.{SparkEntry, SparkSuite}

/** Pins q_stream_ohlc against its batch twin: every candle the stream
  * emits must equal q_win_ohlc's candle for that (type, day), and the
  * emitted set must be exactly the watermark-closed windows — a
  * restated candle, a min_by/max_by tie divergence, or an unclosed
  * window leaking out all fail here. */
class OhlcStreamSpec extends SparkSuite {

  test("streamed candles equal the batch twin on closed windows") {
    val streamed = SparkEntry.queries("q_stream_ohlc")(spark, sfDir)
      .collect().map { r =>
        val day = r.getAs[java.time.LocalDateTime](0)
          .toEpochSecond(java.time.ZoneOffset.UTC) / 86400
        (day, r.getString(1)) ->
          ((r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5),
            r.getLong(6)))
      }.toMap
    val batch = SparkEntry.queries("q_win_ohlc")(spark, sfDir)
      .collect().map(r => (r.getLong(1), r.getString(0)) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5),
          r.getLong(6)))).toMap
    streamed.foreach { case (k, v) =>
      assert(batch(k) == v, s"candle $k diverges from the batch twin")
    }
    // closed-window set: everything except days the watermark left open
    val lastDay = batch.keys.map(_._1).max
    val openDays = batch.keys.map(_._1).toSet -- streamed.keys.map(_._1)
    assert(openDays.forall(_ >= lastDay - 1),
      s"only the tail day(s) may be open, got $openDays")
    assert(streamed.size >= batch.size - 10,
      "at most the final day's candles (5 types x <=2 days) may be cut")
  }
}
