package graft.ingestion

import java.nio.file.Files

import graft.SparkSpec
import graft.schema.TemplateRegistry
import graft.storage.MdioDataset
import org.apache.spark.sql.DataFrame

/** Integration test mirroring the reference's mock 4-D streamer-shot SEG-Y
  * (`tests/integration/conftest.py:22-160`, FIXTURES.md §A2): shots
  * {2,3,5,6,7,8,9} × cables {0,3,5,7} with {1,5,7,5} receivers per cable,
  * channel numbering variant A (per-cable 1..N) vs B (sequential across
  * cables). The full pipeline with AutoChannelWrap must normalize BOTH
  * variants to the identical grid.
  */
class StreamerIntegrationSpec extends SparkSpec {
  import spark.implicits._

  private val shots = Seq(2, 3, 5, 6, 7, 8, 9)
  private val cables = Seq(0, 3, 5, 7)
  private val receivers = Seq(1, 5, 7, 5)

  /** variant A: channel restarts per cable; variant B: sequential. */
  private def mockStreamer(variant: String): DataFrame = {
    val rows = for {
      shot <- shots
      (cable, nRecv) <- cables.zip(receivers)
      r <- 1 to nRecv
    } yield {
      val chanA = r
      val chanB = cables.zip(receivers).takeWhile(_._1 != cable)
        .map(_._2).sum + r
      val chan = if (variant == "A") chanA else chanB
      val ordinal = shot * 10000 + chan * 10 + cable
      (shot, cable, chan, ordinal, shot + chan / 100.0)
    }
    rows.toDF("shot_point", "cable", "channel", "ordinal", "amplitude")
  }

  private val template = TemplateRegistry.instance.get("StreamerShotGathers3D")

  private def ingest(variant: String): (IngestPipeline.IngestResult, DataFrame) = {
    val path = Files.createTempDirectory(s"streamer$variant").toString
    val r = IngestPipeline.ingest(spark, mockStreamer(variant), template,
      GridOverrides(autoChannelWrap = true), path,
      ordinal = Seq("ordinal"), valueCol = "amplitude",
      sparsityError = 100.0) // ragged cables → sparse by construction
    (r, MdioDataset.open(spark, path).df)
  }

  test("variant A (per-cable channels) ingests unchanged") {
    val (r, df) = ingest("A")
    assert(r.nTraces == shots.length * receivers.sum) // 7 × 18 = 126
    assert(r.schema.dimensions == Seq("shot_point", "cable", "channel", "time"))
    val byCableMax = df.groupBy("cable").max("channel")
      .as[(Int, Int)].collect().toMap
    assert(byCableMax == cables.zip(receivers).toMap)
  }

  test("variant B (sequential channels) is rebased to the variant-A grid") {
    val (_, dfA) = ingest("A")
    val (rB, dfB) = ingest("B")
    assert(rB.nTraces == 126 && rB.nCells == 126)
    // after AutoChannelWrap, both variants occupy the IDENTICAL grid cells
    val cellsA = dfA.select("shot_point", "cable", "channel")
      .as[(Int, Int, Long)].collect().toSet
    val cellsB = dfB.select("shot_point", "cable", "channel")
      .as[(Int, Long, Long)].collect().map(c => (c._1, c._2.toInt, c._3)).toSet
    assert(cellsB == cellsA.map(c => (c._1, c._2, c._3)))
    // stats identical: same amplitudes ingested either way? (values depend
    // on original channel numbers, so only counts/grid agree)
    assert(dfA.count() == dfB.count())
  }
}
