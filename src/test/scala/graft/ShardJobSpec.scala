package graft

import graft.jobs.ShardJob
import org.apache.spark.sql.functions._

/** The partitioned fact-table layout contract: data survives the rewrite,
  * time-bounded reads prune partitions AT PLANNING TIME (directory-level,
  * before any file is opened), and each partition is a bounded file set. */
class ShardJobSpec extends GraftSuite {

  private lazy val outPath = {
    val p = java.nio.file.Files.createTempDirectory("shard").toString
    ShardJob.writePartitioned(spark, sf, p)
    p
  }

  test("partitioned rewrite preserves the row multiset") {
    val src = Tables.events(spark, sf)
    val back = spark.read.parquet(outPath)
    assert(back.count() === src.count())
    // spot-check a per-user aggregate survives the re-layout
    val a = src.groupBy(col("user_id")).agg(sum(col("value")).as("s"))
      .orderBy(col("user_id")).collect().map(r => (r.getLong(0), r.getDouble(1)))
    val b = back.groupBy(col("user_id")).agg(sum(col("value")).as("s"))
      .orderBy(col("user_id")).collect().map(r => (r.getLong(0), r.getDouble(1)))
    assert(a.length === b.length)
    a.zip(b).foreach { case ((u1, s1), (u2, s2)) =>
      assert(u1 === u2); assert(math.abs(s1 - s2) < 1e-9)
    }
  }

  test("a period filter prunes partitions in the plan and the file set") {
    val back = spark.read.parquet(outPath)
    val periods = back.select(col("period")).distinct().count()
    assert(periods > 3, s"fixture should span days, got $periods")
    val bounded = back.filter(col("period") === "2024-01-15")
    val plan = bounded.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters"), s"no partition filters:\n$plan")
    assert(plan.contains("period"), s"period not in partition filters:\n$plan")
    // pruning is visible physically: the executed scan reads exactly the
    // matching partition's files, not the table's (inputFiles is computed
    // pre-pruning, so read the scan node's own metrics)
    // collect() runs THIS Dataset's cached QueryExecution (count() would
    // build and execute a different plan, leaving these metrics at zero)
    assert(bounded.collect().nonEmpty)
    val scan = bounded.queryExecution.executedPlan.collectLeaves()
      .collectFirst { case f: org.apache.spark.sql.execution.FileSourceScanExec => f }
      .getOrElse(fail(s"no file scan in:\n$plan"))
    val nFiles = scan.metrics("numFiles").value
    val totalFiles = back.inputFiles.length.toLong
    assert(nFiles < totalFiles,
      s"scan read $nFiles of $totalFiles files - no pruning")
    assert(scan.metrics("numPartitions").value === 1L,
      "scan touched more than the one matching partition")
  }

  test("each partition is a bounded file set (no per-task file explosion)") {
    val back = spark.read.parquet(outPath)
    val byPartition = back.inputFiles.groupBy(f =>
      f.split("/").find(_.startsWith("period=")).getOrElse("?"))
    byPartition.foreach { case (p, files) =>
      assert(files.length <= 2, s"$p has ${files.length} files")
    }
  }
}
