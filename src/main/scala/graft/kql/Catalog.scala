package graft.kql

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, TimestampNTZType}

/** Table-name → DataFrame resolution over a directory of parquet files
  * (the driver fixture layout, TESTDATA.md). At cluster scale the same
  * interface fronts a real metastore; here each table is one parquet
  * path so Catalyst gets full pushdown/pruning on the scan.
  */
final class Catalog(spark: SparkSession, dir: String,
                    extra: Map[String, DataFrame] = Map.empty) {
  private val cache = scala.collection.mutable.Map[String, DataFrame]()

  def table(name: String): DataFrame =
    extra.getOrElse(name, cache.getOrElseUpdate(name, load(name)))

  /** Parquet is the primary at-rest format; CSV/JSON fall back by file
    * extension (ADX ingest formats, SURVEY §2.1). Local-FS existence
    * check — a metastore fronts this on a real cluster. */
  private def load(name: String): DataFrame = {
    def exists(p: String) = java.nio.file.Files.exists(java.nio.file.Paths.get(p))
    if (exists(s"$dir/$name.parquet")) normalize(spark.read.parquet(s"$dir/$name.parquet"))
    else if (exists(s"$dir/$name.csv"))
      normalize(spark.read.option("header", "true").option("inferSchema", "true")
        .csv(s"$dir/$name.csv"))
    else if (exists(s"$dir/$name.json"))
      normalize(spark.read.json(s"$dir/$name.json"))
    else normalize(spark.read.parquet(s"$dir/$name.parquet")) // error path
  }

  /** Parquet TIMESTAMP(NANOS) is unreadable by Spark 4 unless
    * `spark.sql.legacy.parquet.nanosAsLong=true`, which surfaces it as a
    * ns-epoch long. Normalize such columns back to TimestampType (µs) so
    * KQL datetime semantics apply. Fixture `events.ts` is the only case
    * (FIXTURES.md); the name-based rule keeps this metadata-free. */
  private def normalize(df: DataFrame): DataFrame =
    df.schema.fields.foldLeft(df) { (d, f) =>
      if (f.dataType == LongType && f.name == "ts")
        // integral div: Column./ is double division, which loses ULPs on
        // 1.7e18-scale ns epochs (up to ±128 ns → off-by-1µs truncations)
        d.withColumn(f.name, timestamp_micros(expr(s"`${f.name}` div 1000")))
      // KQL datetime is a single UTC instant type; fold parquet
      // TIMESTAMP_NTZ into session-UTC TIMESTAMP so every datetime op
      // sees one type (session TZ is pinned UTC ⇒ same wall values).
      else if (f.dataType == TimestampNTZType)
        d.withColumn(f.name, col(f.name).cast("timestamp"))
      else d
    }

  def withTable(name: String, df: DataFrame): Catalog =
    new Catalog(spark, dir, extra + (name -> df))
}

object Catalog {
  def apply(spark: SparkSession, dir: String): Catalog = new Catalog(spark, dir)
}
