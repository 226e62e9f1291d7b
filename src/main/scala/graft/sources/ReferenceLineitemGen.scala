package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One generated lineitem row (column set and types per the reference's
  * page layout, TpchDataGenerator.java:62-97: price/discount doubles,
  * shipdate a 10-char date string, quantity a long). Top-level so the
  * product encoder is derivable. */
final case class GenRow(price: Double, discount: Double,
    shipdate: String, quantity: Long)

/** Faithful Scala port of the reference's in-memory lineitem generator —
  * the last literal link to the reference (SURVEY.md §5 item 5,
  * VERDICT r3 item 6): the driver testdata's shipdate range makes the
  * reference's 1994 filter window empty, so only data generated with the
  * SAME formulas AND the same RNG stream can reproduce the reference's
  * deterministic Q6 result. (The in-source golden comment at
  * TpchQuery6.java:38-39 — 3.0645958657700088E7 / 28,201 rows — turned
  * out NOT to be reproducible from the code as published; GoldenSpec's
  * parity test records the verified actual output and the evidence.)
  *
  * Ported formulas (each cited to /root/reference):
  *  - row draw order quantity → discount → partKey → orderDate →
  *    shipDate from ONE java.util.Random(0) (TpchDataGenerator.java:21,
  *    76-94) — the sequence IS the data, so draw order is load-bearing;
  *  - randomInt/randomLong/nextLong incl. the rejection loop
  *    (TpchDataGenerator.java:99-120);
  *  - generatePartPrice (TpchDataGenerator.java:122-130);
  *  - the yyy*1000+day "julian" calendar with dbgen's DELIBERATE
  *    no-%400 leap rule (TpchDataGenerator.java:184-205) and the
  *    2557-entry date-string index (TpchDataGenerator.java:148-177).
  *
  * Distribution strategy: a sequential RNG stream cannot be split
  * algebraically, but it CAN be split by deterministic replay — each
  * partition builds its own Random(0), burns the rows before its slice
  * (drawing and discarding with the exact same call pattern, so the
  * rejection loop stays in sync), then emits its slice. Replay cost is
  * O(N·P/2) cheap RNG draws, embarrassingly parallel, zero driver
  * memory — the generator never materializes outside executors. This is
  * the standard pattern for porting any sequential-seed generator onto
  * a cluster without changing its output.
  */
object ReferenceLineitemGen {

  // constants: TpchDataGenerator.java:37-53
  private val Scale = 10
  private val QtyMin = 1; private val QtyMax = 50
  private val DcntMin = 0; private val DcntMax = 10
  private val SdteMin = 1; private val SdteMax = 121
  private val RdteMax = 30
  private val PkeyMin = 1L; private val PkeyMax = 200000L * Scale
  private val StartDate = 92001
  private val TotDate = 2557
  private val OdateMin = StartDate
  private val OdateMax = StartDate + TotDate - (SdteMax + RdteMax) - 1

  /** Reference row volume: 5,000 pages × 1,000 rows
    * (TpchDataGenerator.java:16-17). */
  val ReferenceRows: Long = 5000L * 1000L

  // TpchDataGenerator.java:202-205 — dbgen's leap rule is deliberately
  // missing the %400 Gregorian exception; do not "fix" it.
  private def isLeapYear(year: Int): Boolean =
    year % 4 == 0 && year % 100 != 0

  // TpchDataGenerator.java:184-200 — dates encode as year*1000 + dayOfYear.
  private def julian(date: Int): Int = {
    var offset = date - StartDate
    var result = StartDate
    var done = false
    while (!done) {
      val year = result / 1000
      val yearEnd = year * 1000 + 365 + (if (isLeapYear(year)) 1 else 0)
      if (result + offset <= yearEnd) done = true
      else {
        offset -= yearEnd - result + 1
        result += 1000
      }
    }
    result + offset
  }

  // TpchDataGenerator.java:132-146
  private val monthYearDayStart =
    Array(0, 31, 59, 90, 120, 151, 181, 212, 243, 273, 304, 334, 365)

  // TpchDataGenerator.java:165-182
  private def makeDate(index: Int): String = {
    val y = julian(index + StartDate - 1) / 1000
    val d = julian(index + StartDate - 1) % 1000
    var m = 0
    def leapAdj(month: Int) = if (isLeapYear(y) && month >= 2) 1 else 0
    while (d > monthYearDayStart(m) + leapAdj(m)) m += 1
    val dy = d - monthYearDayStart(m - 1) - (if (isLeapYear(y) && m > 2) 1 else 0)
    f"19$y%02d-$m%02d-$dy%02d"
  }

  // TpchDataGenerator.java:148-163 — 2557 shared strings; every row
  // references an index entry, nothing is formatted per row.
  private lazy val dateIndex: Array[String] =
    Array.tabulate(TotDate)(i => makeDate(i + 1))

  // TpchDataGenerator.java:99-120 — incl. the modulo-bias rejection loop.
  private def randomInt(r: java.util.Random, low: Int, high: Int): Int =
    r.nextInt(1 + high - low) + low

  private def randomLong(r: java.util.Random, low: Long, high: Long): Long =
    nextLong(r, 1 + high - low) + low

  private def nextLong(r: java.util.Random, n: Long): Long = {
    var bits = 0L; var v = 0L
    while ({
      bits = (r.nextLong() << 1) >>> 1
      v = bits % n
      bits - v + (n - 1) < 0L
    }) ()
    v
  }

  // TpchDataGenerator.java:122-130
  private def generatePartPrice(partKey: Long): Long =
    90000L + (partKey / 10) % 20001 + (partKey % 1000) * 100

  /** One row off the stream — TpchDataGenerator.java:76-94, draw order
    * preserved exactly. */
  private def nextRow(r: java.util.Random): GenRow = {
    val quantity = randomInt(r, QtyMin, QtyMax)
    val discount = randomInt(r, DcntMin, DcntMax) / 100.0
    val partKey = randomLong(r, PkeyMin, PkeyMax)
    val extendedPrice = generatePartPrice(partKey) * quantity / 100.0
    val orderDate = randomInt(r, OdateMin, OdateMax)
    val shipDate = randomInt(r, SdteMin, SdteMax) + orderDate
    GenRow(extendedPrice, discount, dateIndex(shipDate - StartDate), quantity)
  }

  /** Distributed replay-split generation of the reference's 5M-row
    * lineitem table (or any prefix of the stream). */
  def generate(spark: SparkSession, totalRows: Long = ReferenceRows,
      parts: Int = 8): DataFrame = {
    import spark.implicits._
    val bounds = (0 to parts).map(p => totalRows * p / parts)
    spark.range(0, parts, 1, parts)
      .flatMap { p =>
        val r = new java.util.Random(0) // TpchDataGenerator.java:21
        val start = bounds(p.toInt); val end = bounds(p.toInt + 1)
        var i = 0L
        while (i < start) { nextRow(r); i += 1 }
        new Iterator[GenRow] {
          private var remaining = end - start
          def hasNext: Boolean = remaining > 0
          def next(): GenRow = { remaining -= 1; nextRow(r) }
        }
      }
      .toDF()
  }
}
