package graft.core

import org.apache.hadoop.fs.{FileSystem, Path}
import org.json4s.{JInt, JObject, JString, JValue}

/** Deletion vectors — the MERGE-ON-READ half of row-level DML on manifest
  * tables (the Delta/Iceberg "positional delete" pattern). A DELETE that
  * touches one row of a 1 GB file writes a few-hundred-byte sidecar naming
  * the dead row POSITIONS instead of rewriting the file; scans subtract
  * the positions at read time. The copy-on-write path (rewrite the file)
  * remains the default — merge-on-read is opt-in per table, and
  * `purge_deletes` / `compact` materialize the vectors back into clean
  * files when the read-side debt is worth collecting.
  *
  * A vector file is one data file's COMPLETE current set of deleted row
  * positions (replacement semantics, like Delta: a new vector for a file
  * supersedes the old one — readers never chain vectors). Format: magic
  * `GDV1`, count, then `count` strictly-increasing int64 positions, all
  * big-endian. Positions are parquet file-absolute row indexes (what
  * `_metadata.row_index` serves), valid forever because manifest data
  * files are immutable once a marker references them.
  *
  * Vector files live in `d-dv-<uuid>/` pool directories under the table
  * root — the same lifecycle as data pools: invisible until a commit
  * marker references them, protected from [[ManifestTable.vacuum]] while
  * any surviving version references them, swept as orphans otherwise.
  */
object DeletionVectors {

  /** One file's attached vector: `path` (dir-relative vector file) and
    * `count` (number of positions in it — kept in the log so metadata
    * queries and exact-row-count planning never open the vector). */
  final case class DvRef(path: String, count: Long)

  val PoolPrefix = "d-dv-"

  private val Magic = 0x47445631 // "GDV1"

  def toJson(ref: DvRef): JValue =
    JObject(List("f" -> JString(ref.path), "n" -> JInt(ref.count)))

  def fromJson(j: JValue): Option[DvRef] = j match {
    case o: JObject =>
      val m = o.obj.toMap
      for {
        f <- m.get("f").collect { case JString(s) => s }
        n <- m.get("n").collect { case JInt(i) => i.toLong }
      } yield DvRef(f, n)
    case _ => None
  }

  def render(ref: DvRef): String =
    org.json4s.jackson.JsonMethods.compact(
      org.json4s.jackson.JsonMethods.render(toJson(ref)))

  def parse(s: String): Option[DvRef] =
    scala.util.Try(org.json4s.jackson.JsonMethods.parse(s)).toOption
      .flatMap(fromJson)

  /** Write `positions` (must be sorted strictly ascending) as the vector
    * file `rel` under `dir`. */
  def write(fs: FileSystem, dir: String, rel: String,
            positions: Array[Long]): Unit = {
    var i = 1
    while (i < positions.length) {
      require(positions(i) > positions(i - 1),
        s"deletion vector positions must be sorted and distinct " +
          s"(${positions(i - 1)} then ${positions(i)})")
      i += 1
    }
    val out = new java.io.DataOutputStream(
      new java.io.BufferedOutputStream(fs.create(new Path(dir, rel), false)))
    try {
      out.writeInt(Magic)
      out.writeLong(positions.length.toLong)
      positions.foreach(out.writeLong)
    } finally out.close()
  }

  /** Read a vector file's positions (sorted ascending). Loud on
    * corruption — a half-read vector would silently resurrect rows. */
  def read(fs: FileSystem, dir: String, rel: String): Array[Long] = {
    val p = new Path(dir, rel)
    val in = new java.io.DataInputStream(
      new java.io.BufferedInputStream(fs.open(p)))
    try {
      require(in.readInt() == Magic, s"$p is not a deletion vector file")
      val n = in.readLong()
      require(n >= 0 && n <= Int.MaxValue, s"$p: corrupt position count $n")
      val positions = new Array[Long](n.toInt)
      var i = 0
      var prev = Long.MinValue
      while (i < n) {
        positions(i) = in.readLong()
        require(positions(i) > prev, s"$p: positions out of order at $i")
        prev = positions(i)
        i += 1
      }
      positions
    } finally in.close()
  }

  /** Union of two sorted position arrays, sorted and distinct. */
  def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    if (a.isEmpty) return b
    if (b.isEmpty) return a
    val out = new Array[Long](a.length + b.length)
    var i = 0; var j = 0; var k = 0
    while (i < a.length && j < b.length) {
      val c = java.lang.Long.compare(a(i), b(j))
      if (c < 0) { out(k) = a(i); i += 1 }
      else if (c > 0) { out(k) = b(j); j += 1 }
      else { out(k) = a(i); i += 1; j += 1 }
      k += 1
    }
    while (i < a.length) { out(k) = a(i); i += 1; k += 1 }
    while (j < b.length) { out(k) = b(j); j += 1; k += 1 }
    if (k == out.length) out else java.util.Arrays.copyOf(out, k)
  }
}
