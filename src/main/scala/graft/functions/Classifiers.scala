package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Status-label classifiers for the reporting pivot (SURVEY.md §2.5 A6;
  * reference runner.py:816-833). The Vietnamese alternations — including
  * the diacritic-less spelling variants — ARE the business semantics and
  * are preserved verbatim. Each classifier takes the raw status string
  * and normalizes with LOWER(TRIM(...)) exactly as the reference does.
  */
object Classifiers {

  private def norm(status: Column): Column = lower(trim(status))

  /** `LIKE '%zalo%'` (runner.py:820). */
  def isKetBanZalo(status: Column): Column = norm(status).like("%zalo%")

  /** IN ('có nhu cầu','co nhu cau') OR REGEXP on the "needs follow-up"
    * variants (runner.py:821-822).
    */
  def isCoNhuCau(status: Column): Column =
    norm(status).isin("có nhu cầu", "co nhu cau") ||
      norm(status).rlike(
        "không đủ điều kiện|khong du dieu kien|suy nghĩ thêm|suy nghi them")

  /** The rejection alternation (runner.py:824-825). */
  def isTuChoi(status: Column): Column =
    norm(status).rlike(
      "không nhu cầu|khong nhu cau|không có nhu cầu|khong co nhu cau|" +
        "khách chửi nhân viên|khach chui nhan vien|tắt máy ngang|tat may ngang|" +
        "khách không tương tác|khach khong tuong tac|đã có thẻ|da co the")

  /** No-answer alternation OR IN ('bận','ban') (runner.py:827-829). */
  def isKhongNgheMay(status: Column): Column =
    norm(status).rlike(
      "máy không nghe được|may khong nghe duoc|không nghe máy|khong nghe may|" +
        "thuê bao|thue bao") ||
      norm(status).isin("bận", "ban")

  /** The four pivot counters as aggregate expressions
    * (SUM(CASE WHEN ... THEN 1 ELSE 0 END), runner.py:818-830).
    */
  def statusPivotAggs(status: Column): Seq[Column] = Seq(
    sum(when(isKetBanZalo(status), 1).otherwise(0)).as("SoSDT_KetBanZalo"),
    sum(when(isCoNhuCau(status), 1).otherwise(0)).as("SoSDT_CoNhuCau"),
    sum(when(isTuChoi(status), 1).otherwise(0)).as("SoSDT_TuChoi"),
    sum(when(isKhongNgheMay(status), 1).otherwise(0)).as("SoSDT_KhongNgheMay"))
}
