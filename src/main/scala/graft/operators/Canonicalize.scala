package graft.operators

import java.security.MessageDigest
import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Deterministic canonical dataset hash (SURVEY.md §4.3 / §5.2): the
  * engine-side twin of the driver's oracle-compare canonicalization —
  * columns sorted by name, rows totally ordered, cells formatted by fixed
  * rules (6dp doubles, ISO-µs UTC timestamps, `\N` nulls, hex binaries),
  * fields joined with \x01, rows with \n, SHA-256 over the byte stream.
  *
  * Distributed: rows are range-sorted, each partition digests its own
  * chunk, and the driver folds the ordered per-partition digests — the
  * full dataset never moves to the driver (a 100 TB table hashes with one
  * sort-shuffle plus a tiny collect of per-partition digests).
  */
object Canonicalize {

  def formatCell(v: Any): String = v match {
    case null => "\\N"
    case d: Double => f"$d%.6f"
    case f: Float => f"${f.toDouble}%.6f"
    case t: java.sql.Timestamp =>
      t.toInstant.atZone(java.time.ZoneOffset.UTC)
        .format(java.time.format.DateTimeFormatter.ofPattern("yyyy-MM-dd'T'HH:mm:ss.SSSSSS"))
    case b: Array[Byte] => b.map("%02x".format(_)).mkString
    case s: scala.collection.Seq[_] => s.map(formatCell).mkString("[", ",", "]")
    case m: scala.collection.Map[_, _] =>
      m.map { case (k, v2) => s"${formatCell(k)}=${formatCell(v2)}" }.toSeq.sorted.mkString("{", ",", "}")
    case r: Row => r.toSeq.map(formatCell).mkString("(", ",", ")")
    case x => x.toString
  }

  /** SHA-256 hex of the canonical form of `df`. */
  def hash(df: DataFrame): String = {
    val cols = df.columns.sorted
    val ordered = df.select(cols.map(col): _*)
      .orderBy(cols.map(col): _*)
    // per-partition digest, folded in partition order on the driver
    val partDigests = ordered.rdd
      .mapPartitionsWithIndex { (idx, rows) =>
        val md = MessageDigest.getInstance("SHA-256")
        var any = false
        rows.foreach { r =>
          any = true
          md.update(r.toSeq.map(formatCell).mkString("").getBytes("UTF-8"))
          md.update('\n'.toByte)
        }
        if (any) Iterator((idx, md.digest())) else Iterator.empty
      }
      .collect().sortBy(_._1)
    val outer = MessageDigest.getInstance("SHA-256")
    partDigests.foreach { case (_, d) => outer.update(d) }
    outer.digest().map("%02x".format(_)).mkString
  }
}
