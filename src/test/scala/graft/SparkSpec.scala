package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Shared local SparkSession for specs (one JVM-wide session — Spark's
  * getOrCreate reuses it across suites, keeping `sbt test` fast). */
trait SparkSpec extends AnyFunSuite with BeforeAndAfterAll {
  lazy val spark: SparkSession = SparkSpec.session
  // overridable so plan-shape suites (PlanAuditSpec) can re-assert
  // against scaled data (ScaleBench's target/scale10) — "no plan flips
  // at 10× data" is part of the scale-stress evidence
  def sfDir = sys.env.getOrElse("SPARK_GRAFT_TEST_SF_DIR",
    "/root/testdata/sf0.001")
}

object SparkSpec {
  lazy val session: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .appName("graft-test")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config(graft.streaming.NioCheckpointFileManager.ConfKey,
        graft.streaming.NioCheckpointFileManager.ConfValue)
      // let AQE re-plan INSIDE cached plans: persisted intermediates
      // otherwise pin tiny tables at the full shuffle-partition count,
      // and every later pass re-schedules those near-empty tasks
      .config("spark.sql.optimizer.canChangeCachedPlanOutputPartitioning",
        "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    s
  }
}
