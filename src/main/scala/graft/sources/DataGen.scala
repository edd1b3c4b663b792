package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Distributed synthetic-data generator — the reference's `menu.py`
  * re-expressed Spark-first (ref `/root/reference/menu.py`): instead
  * of a single-process CSV writer, rows derive deterministically from
  * `spark.range` ids (pure column expressions, seeded by id), so any
  * scale factor generates fully parallel with no driver involvement.
  */
object DataGen {

  val categories: Seq[String] =
    Seq("Appetizers", "Main Course", "Desserts", "Beverages", "Snacks")

  val itemNames: Map[String, Seq[String]] = Map(
    "Appetizers" -> Seq("Samosa", "Paneer Tikka", "Chicken Tikka", "Aloo Tikki", "Spring Rolls"),
    "Main Course" -> Seq("Butter Chicken", "Dal Makhani", "Biryani", "Palak Paneer", "Fish Curry"),
    "Desserts" -> Seq("Gulab Jamun", "Rasgulla", "Kheer", "Jalebi", "Kulfi"),
    "Beverages" -> Seq("Masala Chai", "Lassi", "Cold Coffee", "Coconut Water", "Buttermilk"),
    "Snacks" -> Seq("Pav Bhaji", "Bhel Puri", "Vada Pav", "Dhokla", "Kachori"))

  private val nonVeg = Set("Chicken Tikka", "Butter Chicken", "Biryani", "Fish Curry")

  /** Deterministic menu table of `n` rows: menu_id, restaurant_id,
    * item_name, price (cents), category, item_type, created_date.
    */
  def menu(spark: SparkSession, n: Long): DataFrame = {
    val catArr = array(categories.map(lit): _*)
    val nameArr = array(categories.flatMap(c => itemNames(c).map(lit)): _*)
    val base = spark.range(n)
      .withColumn("menu_id", col("id") + 1)
      .withColumn("restaurant_id", pmod(xxhash64(col("id"), lit(1)), lit(51)) + 100)
      .withColumn("cat_idx", pmod(xxhash64(col("id"), lit(2)), lit(categories.size)).cast("int"))
      .withColumn("category", element_at(catArr, col("cat_idx") + 1))
      .withColumn("item_idx",
        col("cat_idx") * 5 + pmod(xxhash64(col("id"), lit(3)), lit(5)).cast("int"))
      .withColumn("item_name", element_at(nameArr, col("item_idx") + 1))
      .withColumn("price_cents", pmod(xxhash64(col("id"), lit(4)), lit(45001)) + 5000)
      .withColumn("item_type",
        when(col("item_name").isin(nonVeg.toSeq.map(x => x: Any): _*), "Non-Veg")
          .otherwise("Veg"))
      .withColumn("created_date",
        date_add(lit("2023-01-01").cast("date"),
          pmod(xxhash64(col("id"), lit(5)), lit(700)).cast("int")))
    base.select("menu_id", "restaurant_id", "item_name", "price_cents",
      "category", "item_type", "created_date")
  }

  // ------------------------------------------------------------------
  // LLM-corpus tables (soak / arbitrary-SF synthesis)
  // ------------------------------------------------------------------

  private val vocab: Seq[String] = Seq(
    "spark", "batch", "stream", "table", "column", "row", "key", "value",
    "join", "group", "agg", "window", "sort", "hash", "scan", "filter",
    "merge", "part", "order", "line", "data", "query", "fast", "slow",
    "big", "small", "a", "the")

  private val langs = Seq("en", "fr", "es", "zh", "de")

  /** Deterministic documents table (doc_id, text, lang, source,
    * n_chars — the test corpus schema) at any row count: text is a
    * seeded word sequence, ~5% of rows re-derive their words from a
    * nearby earlier doc and append one extra word — planted NEAR-
    * duplicates so dedup operators do real work at soak scale. Pure
    * column expressions over spark.range: generation parallelizes to
    * any cluster size with zero driver involvement.
    */
  def documents(spark: SparkSession, n: Long): DataFrame = {
    val vocabArr = array(vocab.map(lit): _*)
    val langArr = array(langs.map(lit): _*)
    val base = spark.range(n)
      .withColumn("near_dup",
        pmod(xxhash64(col("id"), lit(7)), lit(100)) < 5 && col("id") >= 3)
      .withColumn("seed_id",
        when(col("near_dup"), col("id") - 3).otherwise(col("id")))
      .withColumn("n_words",
        (pmod(xxhash64(col("seed_id"), lit(8)), lit(53)) + 8).cast("int"))
    val words = transform(sequence(lit(1), col("n_words")),
      w => element_at(vocabArr,
        (pmod(xxhash64(col("seed_id"), w), lit(vocab.size)) + 1).cast("int")))
    base
      .withColumn("text0", concat_ws(" ", words))
      .withColumn("text",
        when(col("near_dup"), concat(col("text0"), lit(" extra")))
          .otherwise(col("text0")))
      .withColumn("doc_id", col("id"))
      .withColumn("lang", element_at(langArr,
        (pmod(xxhash64(col("id"), lit(9)), lit(langs.size)) + 1).cast("int")))
      .withColumn("source",
        concat(lit("src_"), pmod(xxhash64(col("id"), lit(10)), lit(20))))
      .withColumn("n_chars", length(col("text")))
      .select("doc_id", "text", "lang", "source", "n_chars")
  }

  /** Deterministic embeddings table (vec_id, embedding float[dim],
    * label) with CLUSTER STRUCTURE: each vector is a label-seeded
    * centroid plus per-id noise, so IVF/PQ/LSH operators see the
    * clusterable geometry they exploit in real corpora rather than
    * uniform noise.
    */
  def embeddings(spark: SparkSession, n: Long, dim: Int = 64,
                 labels: Int = 10): DataFrame = {
    val idx = sequence(lit(0), lit(dim - 1))
    val label = pmod(xxhash64(col("id"), lit(11)), lit(labels)).cast("int")
    spark.range(n)
      .withColumn("label", label)
      .withColumn("embedding", transform(idx, j =>
        ((pmod(xxhash64(col("label"), j, lit(12)), lit(1001)) - 500) / lit(1500.0) +
          (pmod(xxhash64(col("id"), j, lit(13)), lit(2001)) - 1000) / lit(10000.0))
          .cast("float")))
      .withColumn("vec_id", col("id"))
      .select("vec_id", "embedding", "label")
  }

  /** Deterministic events table (event_id, ts, user_id, event_type,
    * value, props — the test stream schema): per-user event times
    * advance in ~37 s strides with jitter, so sessionization and
    * windowed operators find realistic gaps at any scale.
    */
  def events(spark: SparkSession, n: Long, users: Long = 5000L): DataFrame = {
    val types = Seq((50, "view"), (75, "click"), (85, "purchase"),
      (95, "signup"), (100, "error"))
    val draw = pmod(xxhash64(col("id"), lit(14)), lit(100))
    val eventType = types.foldRight(lit("error"): org.apache.spark.sql.Column) {
      case ((bound, t), acc) => when(draw < bound, t).otherwise(acc)
    }
    spark.range(n)
      .withColumn("event_id", col("id"))
      .withColumn("user_id", pmod(xxhash64(col("id"), lit(15)), lit(users)))
      .withColumn("ts", timestamp_seconds(
        lit(1704067200L) + (col("id") / users).cast("long") * 37L +
          pmod(xxhash64(col("id"), lit(16)), lit(30))))
      .withColumn("event_type", eventType)
      .withColumn("value",
        (pmod(xxhash64(col("id"), lit(17)), lit(100000)) / lit(100.0)))
      .withColumn("props",
        concat(lit("{\"k\": "), pmod(xxhash64(col("id"), lit(18)), lit(100)), lit("}")))
      .select("event_id", "ts", "user_id", "event_type", "value", "props")
  }
}
