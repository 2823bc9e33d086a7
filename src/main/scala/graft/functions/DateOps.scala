package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Calendar-bucketing helpers — the reference's quarter-date functions
  * (`/root/reference/utils.js:126-143`), used by its reporting pipelines for
  * year/quarter keys (`examples/bor-dwc.js:712-713`).
  *
  * The reference's quarter codes include two composite values kept here for
  * fidelity: `34` means the second half-year (start = Jul 1, end = Dec 31)
  * and `12` the first half-year (start = Jan 1, end = Jun 30). Everything is
  * a `when` chain over `make_date` — codegen'd, no UDF.
  */
object DateOps {

  /** `startQuarterDate` (`utils.js:126-134`): first day of quarter code
    * 1|2|3|4|34 (34 starts with Q3); any other code → Jan 1.
    */
  def quarterStartDate(year: Column, quarter: Column): Column =
    when(quarter === 2, make_date(year, lit(4), lit(1)))
      .when(quarter === 3 || quarter === 34, make_date(year, lit(7), lit(1)))
      .when(quarter === 4, make_date(year, lit(10), lit(1)))
      .otherwise(make_date(year, lit(1), lit(1)))

  /** `endQuarterDate` (`utils.js:135-143`): last day of quarter code
    * 1|2|3|4|12 (12 ends with Q2); any other code → Dec 31.
    */
  def quarterEndDate(year: Column, quarter: Column): Column =
    when(quarter === 1, make_date(year, lit(3), lit(31)))
      .when(quarter === 2 || quarter === 12, make_date(year, lit(6), lit(30)))
      .when(quarter === 3, make_date(year, lit(9), lit(30)))
      .otherwise(make_date(year, lit(12), lit(31)))
}
