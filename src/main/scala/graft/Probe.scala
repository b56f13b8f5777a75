package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
object Probe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions","32")
      .config("spark.sql.session.timeZone","UTC")
      .config("spark.sql.extensions","graft.functions.GraftExtensions")
      .config("spark.ui.enabled","false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.1"
    def time(label: String)(f: => Long): Unit = {
      val t0 = System.nanoTime(); val n = f
      println(f"[probe] $label%-30s ${(System.nanoTime()-t0)/1e9}%8.2fs rows=$n")
    }
    val hashedShingles =
      "array_sort(array_distinct(transform(sequence(1, greatest(length(text) - 19, 1)), " +
        "i -> CAST(conv(substr(md5(substring(text, i, 20)), 1, 15), 16, 10) AS BIGINT))))"
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    val sh = docs.selectExpr("doc_id", "n_chars", s"$hashedShingles AS sh", "n_chars div 20 AS bucket")
    time("shingle-hash only")(sh.selectExpr("sum(size(sh))").head().getLong(0))
    val a = sh.select(col("doc_id").as("doc_a"), col("n_chars").as("len_a"), col("sh").as("sh_a"), col("bucket").as("bucket_a"))
    val b = sh.select(col("doc_id").as("doc_b"), col("n_chars").as("len_b"), col("sh").as("sh_b"),
      explode(array(col("bucket")-1, col("bucket"), col("bucket")+1)).as("probe"))
    val joined = a.join(b, col("bucket_a")===col("probe") && col("doc_a")<col("doc_b") && abs(col("len_a")-col("len_b"))<=20)
    time("join, count only")(joined.count())
    time("join + intersect")(joined.withColumn("i", expr("sorted_intersect_count(sh_a, sh_b)")).agg(sum("i")).head().getLong(0))
    spark.stop()
  }
}
