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
}
