package graft.functions

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Native UrlParts expression: single-parse struct decomposition —
  * field correctness vs parse_url (the builtin it replaces six calls
  * of), raw (undecoded) component contract, invalid-URL null,
  * interpreted-vs-codegen agreement, SQL registration.
  */
class UrlPartsSpec extends SparkSpec {

  private val U =
    "https://click.example.com/d/7/page?q=42&lang=en&t=a%20b%2Fc#s3"

  test("every struct field matches the parse_url builtin on the same URL") {
    import spark.implicits._
    val df = Seq(U).toDF("url")
      .select(UrlParts.urlParts(col("url")).as("u"), col("url"))
    val r = df.select(
      col("u.protocol"), col("u.host"), col("u.path"), col("u.query"),
      col("u.ref"),
      parse_url(col("url"), lit("PROTOCOL")),
      parse_url(col("url"), lit("HOST")),
      parse_url(col("url"), lit("PATH")),
      parse_url(col("url"), lit("QUERY")),
      parse_url(col("url"), lit("REF"))).head
    assert(r.getString(0) === r.getString(5))   // protocol
    assert(r.getString(1) === r.getString(6))   // host
    assert(r.getString(2) === r.getString(7))   // path
    assert(r.getString(3) === r.getString(8))   // query
    assert(r.getString(4) === r.getString(9))   // ref
    // raw contract: percent-escapes SURVIVE for a downstream decode
    assert(r.getString(3).contains("a%20b%2Fc"), r.getString(3))
  }

  test("invalid URL yields NULL (parse_url's contract), valid fields " +
      "on a URL with no query/fragment are null-safe") {
    import spark.implicits._
    val rows = Seq("ht tp://bad url", "https://h.example.com/only/path")
      .toDF("url")
      .select(UrlParts.urlParts(col("url")).as("u"))
      .select(col("u").isNull.as("n"), col("u.query").as("q"),
        col("u.ref").as("r"))
      .collect()
    assert(rows(0).getBoolean(0) === true)
    assert(rows(1).getBoolean(0) === false)
    assert(rows(1).isNullAt(1) && rows(1).isNullAt(2))
  }

  test("interpreted and codegen paths agree; SQL registration works") {
    import spark.implicits._
    UrlParts.register(spark)
    val sql = spark.sql(
      s"SELECT url_parts('$U').host AS h").head.getString(0)
    assert(sql === "click.example.com")
    // interpreted eval (no codegen): force via expression eval
    val interp = UrlParts.parse(
      org.apache.spark.unsafe.types.UTF8String.fromString(U))
    assert(interp.getUTF8String(1).toString === "click.example.com")
    assert(interp.getUTF8String(4).toString === "s3")
  }
}
