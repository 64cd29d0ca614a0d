package graft.tools

import org.apache.spark.sql.SparkSession

import graft.etl.CopyDb
import graft.store.{JsonFileStore, StoreRegistry, TableStore}

/** Command-line full-database copy — the `aerovaldbcp` console script
  * analogue (`/root/reference/src/aerovaldb/utils/copy.py:53-72`).
  *
  * Usage: `runMain graft.tools.CopyCli <source> <dest> [--bulk]`
  * where resources are `json_files:<path>` / `table_store:<path>` /
  * bare paths (json_files). `--bulk` uses the distributed import
  * (json_files → table_store only).
  */
object CopyCli {
  def main(args: Array[String]): Unit = {
    val positional = args.filterNot(_.startsWith("--"))
    if (positional.length != 2) {
      System.err.println("usage: CopyCli <source-resource> <dest-resource> [--bulk]")
      sys.exit(2)
    }
    val bulk = args.contains("--bulk")
    val spark = SparkSession.builder()
      .master(sys.env.getOrElse("SPARK_MASTER", "local[4]"))
      .appName("graft-copy")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_CPUS", "4"))
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    try {
      val src = StoreRegistry.open(positional(0), Some(spark))
      val dst = StoreRegistry.open(positional(1), Some(spark))
      (src, dst) match {
        case (j: JsonFileStore, t: TableStore) if bulk =>
          val n = CopyDb.bulkImport(spark, j, t)
          println(s"bulk-imported $n assets")
        case _ =>
          if (bulk) System.err.println("--bulk requires json_files -> table_store; falling back to point copy")
          CopyDb.copyDbContents(src, dst)
          println(s"copied ${dst.listAll().size} assets")
      }
      src.close(); dst.close()
    } finally spark.stop()
  }
}
