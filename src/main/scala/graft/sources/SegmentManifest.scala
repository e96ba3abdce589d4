package graft.sources

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.SparkSession

import java.nio.charset.StandardCharsets

/** Archive manifest parsing + per-segment completion bookkeeping — the
  * Spark analogue of the reference's import orchestration: `InitImport`
  * parses `wat.paths.gz` into a segment/file list (wat.go:147-219),
  * `SelectSegmentToImport` picks the next unimported segment
  * (wat.go:979), and per-segment `.imported` marker files make the
  * whole import restartable ("you can restart the process multiple
  * times", reference README; importer/main.go:193-260).
  *
  * A manifest is a text file (plain or .gz — decompressed by extension,
  * like the reference's wat.paths.gz) with one WAT file path per line.
  * Common Crawl lines carry the segment id in the `segments/<id>/` path
  * component; for ad-hoc local manifests the parent directory stands in.
  * Blank lines and `#` comments are ignored.
  *
  * All marker IO goes through the Hadoop FileSystem of the store path,
  * so the same bookkeeping works on local disk, HDFS or object stores.
  */
object SegmentManifest {

  final case class Segment(id: String, files: Seq[String])

  /** Marker filename written into a segment's store directory when the
    * segment has fully imported (the `.imported` analogue).
    */
  val Marker = "_IMPORTED"

  private val SegmentsComponent = raw".*/segments/([^/]+)/.*".r

  /** Segment id of one manifest line: the `segments/<id>` path
    * component when present (Common Crawl layout), else the parent
    * directory name, else the bare filename.
    */
  def segmentId(path: String): String = path match {
    case SegmentsComponent(id) => id
    case _ =>
      val norm = path.stripSuffix("/")
      val parent = norm.lastIndexOf('/') match {
        case -1 => norm
        case cut =>
          val dir = norm.substring(0, cut)
          dir.substring(dir.lastIndexOf('/') + 1)
      }
      if (parent.isEmpty) norm else parent
  }

  /** Parse a manifest into segments, in first-appearance order (the
    * reference imports segments in list order). `baseDir` resolves
    * relative manifest entries (the reference prepends its download
    * root to wat.paths lines the same way).
    */
  def parse(spark: SparkSession, manifestPath: String, baseDir: Option[String] = None): Seq[Segment] = {
    val lines = spark.read.textFile(manifestPath).collect().toSeq
      .map(_.trim)
      .filter(l => l.nonEmpty && !l.startsWith("#"))
      .map { l =>
        if (l.contains("://") || l.startsWith("/")) l
        else baseDir.fold(l)(b => s"${b.stripSuffix("/")}/$l")
      }
      // a repeated manifest line would read (and qty-count) the file
      // twice — dedupe, keeping first-appearance order
      .distinct
    val byId = lines.groupBy(segmentId)
    lines.map(segmentId).distinct.map(id => Segment(id, byId(id)))
  }

  /** Numeric segment ordinal — the reference's `SegmentID`:
    * `strconv.Atoi(strings.Split(segment, ".")[1])` (wat.go:209), i.e.
    * the token between the first and second dot of a Common Crawl
    * segment name like `1687947420.12` → 12. None when the id carries
    * no all-digit second token (ad-hoc local manifests), where Go's
    * InitImport would reject the whole archive.
    */
  def segmentOrdinal(id: String): Option[Int] = {
    val tokens = id.split("\\.", -1)
    if (tokens.length < 2) None
    else {
      val t = tokens(1)
      if (t.nonEmpty && t.forall(_.isDigit))
        try Some(t.toInt)
        catch { case _: NumberFormatException => None } // > Int.MaxValue
      else None
    }
  }

  /** Parse a command-line segment selector into ordinals — the
    * reference's `parseSegmentInput` (importer/main.go:660-704):
    * a comma list `1,3,5`, an inclusive range `2-7` (two parts only,
    * start ≤ end), or a single number. The comma branch wins first, so
    * `1-3,5` fails on `"1-3"` exactly like Go's Atoi does.
    */
  def parseSelector(selector: String): Seq[Int] = {
    val parts = selector.split(",", -1)
    if (parts.length > 1) parts.toSeq.map(_.toInt)
    else if (selector.contains("-")) {
      val r = selector.split("-", -1)
      require(r.length == 2, s"invalid range: $selector")
      val (start, end) = (r(0).toInt, r(1).toInt)
      require(start <= end, s"invalid range: $selector")
      start to end
    } else Seq(selector.toInt)
  }

  /** Store directory of one segment under the import root. */
  def segmentDir(outDir: String, id: String): String =
    s"${outDir.stripSuffix("/")}/segments/$id"

  private def fs(spark: SparkSession, path: String): FileSystem =
    new Path(path).getFileSystem(spark.sparkContext.hadoopConfiguration)

  def isImported(spark: SparkSession, outDir: String, id: String): Boolean =
    fs(spark, outDir).exists(new Path(segmentDir(outDir, id), Marker))

  /** Write the completion marker — the LAST step of a segment import,
    * so a crash mid-segment leaves no marker and the rerun redoes the
    * whole segment (idempotent overwrite). The marker records the
    * imported file list for auditability.
    */
  def markImported(spark: SparkSession, outDir: String, seg: Segment): Unit = {
    val out = fs(spark, outDir).create(new Path(segmentDir(outDir, seg.id), Marker), true)
    try out.write(seg.files.mkString("", "\n", "\n").getBytes(StandardCharsets.UTF_8))
    finally out.close()
  }

  /** Ids of all segments whose marker exists under `outDir` — the only
    * segments readers may see (a half-written segment without its
    * marker stays invisible).
    */
  def completedSegments(spark: SparkSession, outDir: String): Seq[String] = {
    val root = new Path(s"${outDir.stripSuffix("/")}/segments")
    val f = fs(spark, outDir)
    if (!f.exists(root)) Seq.empty
    else
      f.listStatus(root).toSeq
        .filter(_.isDirectory)
        .map(_.getPath.getName)
        .filter(id => f.exists(new Path(root, s"$id/${Marker}")))
        .sorted
  }
}
