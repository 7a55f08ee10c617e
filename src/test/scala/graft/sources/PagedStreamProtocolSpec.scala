package graft.sources

import scala.collection.concurrent.TrieMap

import org.apache.spark.sql.connector.read.streaming.ReadLimit
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.scalatest.funsuite.AnyFunSuite

/** Drives the MicroBatchStream protocol by hand (no Spark session):
  * offset JSON round-trip, the crash-replay path (a fresh instance with
  * a cold cache re-fetches EXACTLY the planned range, payload-identical),
  * and commit's cache hygiene.
  */
class PagedStreamProtocolSpec extends AnyFunSuite {

  private class FakeApi extends PagedStream.MediaPagedApi {
    val fetches = TrieMap[(String, Long), Int]()
    // m1: pages "a","b","c" — "c" short; sizes 2,2,1 with perPage 2
    private val pages = Vector("a", "b", "c")
    def mediaIds: Seq[String] = Seq("m1")
    def fetch(media: String, page: Long): PagedSource.Page = {
      fetches.updateWith((media, page))(c => Some(c.getOrElse(0) + 1))
      val p = pages((page - 1).toInt)
      PagedSource.Page(p, if (p == "c") 1L else 2L, None, Some(2L))
    }
  }

  private def opts(key: String) = new CaseInsensitiveStringMap(
    java.util.Map.of("apiRegistry", key, "maxPagesPerTrigger", "2"))

  private def payloadsOf(parts: Array[org.apache.spark.sql.connector.read.InputPartition])
      : Seq[(String, Long, String)] = {
    val rf = new PagedReaderFactory
    parts.toSeq.flatMap { p =>
      val r = rf.createReader(p)
      val out = scala.collection.mutable.ArrayBuffer.empty[(String, Long, String)]
      while (r.next()) {
        val row = r.get()
        out += ((row.getUTF8String(0).toString, row.getLong(1),
          row.getUTF8String(2).toString))
      }
      out.toSeq
    }
  }

  test("offset round-trip, budgeted advance, crash replay refetches " +
      "exactly the planned range") {
    val api = new FakeApi
    PagedStream.register("proto-api", api)
    try {
      val s1 = new PagedMicroBatchStream(opts("proto-api"))
      val o0 = s1.initialOffset()
      val o1 = s1.latestOffset(o0, ReadLimit.allAvailable())
      // budget 2 of 3 pages: cursor at page 3, not complete
      assert(o1.json().contains(""""next":3"""))
      assert(o1.json().contains(""""complete":false"""))
      val served = payloadsOf(s1.planInputPartitions(o0, o1))
      assert(served == Seq(("m1", 1L, "a"), ("m1", 2L, "b")))
      assert(api.fetches.toMap == Map(("m1", 1L) -> 1, ("m1", 2L) -> 1),
        "the batch is served from the latestOffset cache — no re-fetch")

      // crash before commit: a FRESH instance (cold cache) replays the
      // same offset range from the log — identical pages, via re-fetch
      val s2 = new PagedMicroBatchStream(opts("proto-api"))
      val o0r = s2.deserializeOffset(o0.json())
      val o1r = s2.deserializeOffset(o1.json())
      assert(o1r.json() == o1.json(), "offset JSON round-trips")
      val replayed = payloadsOf(s2.planInputPartitions(o0r, o1r))
      assert(replayed == served, "replay is page-for-page identical")
      assert(api.fetches.toMap == Map(("m1", 1L) -> 2, ("m1", 2L) -> 2))

      // next trigger on the recovered instance: the short page 3
      // completes the media; a further trigger advances nothing
      val o2 = s2.latestOffset(o1r, ReadLimit.allAvailable())
      assert(o2.json().contains(""""complete":true"""))
      assert(payloadsOf(s2.planInputPartitions(o1r, o2)) ==
        Seq(("m1", 3L, "c")))
      val o3 = s2.latestOffset(o2, ReadLimit.allAvailable())
      assert(o3 == o2, "a complete media never advances or re-fetches")
      assert(api.fetches.get(("m1", 3L)).contains(1))
      s1.stop(); s2.stop()
    } finally PagedStream.unregister("proto-api")
  }

  test("a query without its registered api fails loudly, not silently empty") {
    val s = new PagedMicroBatchStream(opts("never-registered"))
    val e = intercept[IllegalArgumentException] { s.initialOffset() }
    assert(e.getMessage.contains("never-registered"))
  }
}
