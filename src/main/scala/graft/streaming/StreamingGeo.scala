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
  * x index-cell occupancy, never index². Hot cells are the q184
  * caveat, exactly as in the batch form.
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
      trigger: Trigger = Trigger.AvailableNow()): StreamingQuery = {
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
        val pts = points(batch)
        if (fs.exists(new Path(indexDir))) {
          val earlier = spark.read.parquet(indexDir)
            .filter(col("batch") < bid)
          val probe = pts
            .withColumn("dy", explode(array(lit(-1L), lit(0L), lit(1L))))
            .withColumn("dx", explode(array(lit(-1L), lit(0L), lit(1L))))
            .select(col("user_id").as("u_new"), col("hour"),
              col("lat_e6").as("la1"), col("lon_e6").as("lo1"),
              (col("cy") + col("dy")).as("cy"),
              (col("cx") + col("dx")).as("cx"))
          probe.join(earlier
              .select(col("user_id").as("u_old"), col("hour"),
                col("lat_e6").as("la2"), col("lon_e6").as("lo2"),
                col("cy"), col("cx")),
              Seq("hour", "cy", "cx"))
            .filter(col("u_new") =!= col("u_old"))
            .select(col("u_new"), col("u_old"), col("hour"),
              round(Geo.haversineM(col("la1"), col("lo1"),
                col("la2"), col("lo2"))).cast("long").as("m"))
            .filter(col("m") <= radiusM)
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
        pts.write.mode("overwrite")
          .option("compression", Writers.DefaultCompression)
          .parquet(s"$indexDir/batch=$bid")
        ()
      }
      .start()
  }
}
