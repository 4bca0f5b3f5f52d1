package graft.streaming

import java.sql.Timestamp

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, Encoders, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

import graft.etl.Writers
import graft.queries.Geo

/** Always-on proximity monitor — the streaming form of the batch q264
  * (`Geo.proximityPairs`): each micro-batch's positions probe a
  * PERSISTED (hour, cell) position index for earlier vessels within
  * the radius, then append their own points — live encounter detection
  * where the batch query is the retrospective report.
  *
  * The startFuzzy/startMedia discipline: pairing is strictly
  * new-vs-earlier (`batch < bid` on the index read), so within-batch
  * pairs are the BATCH query's job and every cross-batch pair alerts
  * exactly once — when its later endpoint arrives; both the alert
  * partition and the index partition land under `batch=<id>` with
  * overwrite, so a crash-replayed batch reproduces itself (its own
  * prior index write is excluded by the `batch < bid` filter).
  * Zero streaming state — the index IS the state, compactable like
  * any parquet table.
  *
  * Per-batch cost: the batch's points (one representative per
  * (vessel, hour), the q264 pick) against the index partitions via the
  * same 3x3 smallest-complete-cell band join — proportional to batch
  * x index-cell occupancy, never index². Hot (port) cells ride
  * [[Geo.bandedPairs]]' occupancy-aware salting, exactly as in the
  * batch form — one mega-cell-hour spreads over salt lanes instead of
  * one quadratic straggler task; hotness comes from INCREMENTAL
  * per-batch occupancy summaries (`occ/batch=<id>`, cell-grid-sized,
  * replay-idempotent) so finding ports costs a KB-scale summary read
  * per micro-batch, never a second full index scan.
  */
object StreamingGeo {

  final case class GeoEv(event_id: Long, user_id: Long, ts: Timestamp)

  /** One representative point per (vessel, hour) with band cells —
    * THE q264 derivation ([[Geo.bandedPoints]]), shared so the batch
    * and streaming joins can never drift. */
  private def points(batch: DataFrame): DataFrame =
    Geo.bandedPoints(batch)

  def start(spark: SparkSession, landingDir: String, outDir: String,
      radiusM: Long = 500L,
      trigger: Trigger = Trigger.AvailableNow(),
      hotOccupancy: Long = 1024L, saltBuckets: Int = 16): StreamingQuery = {
    require(radiusM * 9 <= 5000L,
      s"radiusM=$radiusM exceeds the 5,000-µdeg cell's completeness bound")
    val evs = spark.readStream
      .schema(Encoders.product[GeoEv].schema)
      .parquet(landingDir)
    evs.writeStream
      .option("checkpointLocation", s"$outDir/_checkpoint")
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, bid: Long) =>
        val fs = new Path(outDir)
          .getFileSystem(spark.sparkContext.hadoopConfiguration)
        val indexDir = s"$outDir/index"
        val occDir = s"$outDir/occ"
        val pts = points(batch)
        if (fs.exists(new Path(indexDir))) {
          val earlier = spark.read.parquet(indexDir)
            .filter(col("batch") < bid)
          // hot (port) cells from the INCREMENTAL per-batch occupancy
          // summaries — cell-grid-sized reads, so finding ports never
          // re-scans the whole position index each micro-batch
          val hot =
            if (fs.exists(new Path(occDir)))
              Some(spark.read.parquet(occDir)
                .filter(col("batch") < bid)
                .groupBy(col("hour"), col("cy"), col("cx"))
                .agg(sum(col("n")).as("occ"))
                .filter(col("occ") > hotOccupancy)
                .select(col("hour"), col("cy"), col("cx")))
            else None
          // THE q264 band join ([[Geo.bandedPairs]]): 3x3 probe
          // replication, exact verify, and the occupancy-salted
          // hot-cell path — the port mega-cell spreads over salt
          // lanes here exactly as in the batch form
          Geo.bandedPairs(pts, earlier, radiusM, hotOccupancy,
              saltBuckets, hot)
            .filter(col("u1") =!= col("u2"))
            .select(col("u1").as("u_new"), col("u2").as("u_old"),
              col("hour"), col("m"))
            .distinct()
            .write.mode("overwrite")
            .option("compression", Writers.DefaultCompression)
            .parquet(s"$outDir/alerts/batch=$bid")
        } else
          // land an empty alert partition so readers see every batch
          pts.limit(0)
            .select(col("user_id").as("u_new"),
              col("user_id").as("u_old"), col("hour"),
              lit(0L).as("m"))
            .write.mode("overwrite")
            .option("compression", Writers.DefaultCompression)
            .parquet(s"$outDir/alerts/batch=$bid")
        // per-batch occupancy summary beside the index (batch=<id>
        // overwrite, replay-idempotent like everything else here)
        pts.groupBy(col("hour"), col("cy"), col("cx"))
          .agg(count(lit(1)).as("n"))
          .write.mode("overwrite")
          .option("compression", Writers.DefaultCompression)
          .parquet(s"$occDir/batch=$bid")
        pts.write.mode("overwrite")
          .option("compression", Writers.DefaultCompression)
          .parquet(s"$indexDir/batch=$bid")
        ()
      }
      .start()
  }
}
