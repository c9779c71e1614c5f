package graft.sinks

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Connector-shaped twin of the reference's Google-Sheets sink family —
  * the K3/K4/K5 surface (google_sheets.py:8-105) over any Hadoop
  * filesystem instead of the Sheets API. The contract says CSV/Parquet
  * is the parity sink (SURVEY.md §2.2 K3), so this is deliberately a
  * SHAPE demo: same operations, same bounds, same failure semantics —
  * a real connector swaps the FS writes for API calls behind the same
  * four methods.
  *
  *  - a "spreadsheet" is a base URI; a "tab" is `<base>/<tab>.csv`;
  *  - [[upload]] is K3's full replace (google_sheets.py:33-36) with the
  *    hardcoded Sheets range bound enforced (≤ 498 rows × 5 cols,
  *    `:78-80` — a connector that silently truncates loses data, so
  *    exceeding the bound THROWS, it doesn't clip);
  *  - [[refreshFormulas]] is K4's find-'='-replace-'=' recompute
  *    trigger (`:47-60`) — a documented no-op here: Spark's lazy
  *    evaluation recomputes derived columns by construction;
  *  - [[rangeCopyValues]] is K5's values-only range copy (`:65-94`):
  *    skip the two header-ish rows, take rows 3-500 of columns A-E,
  *    land them in the destination tab MATERIALIZED (PASTE_VALUES ≡
  *    the write forcing computed columns to values);
  *  - failure semantics are the reference's task contract
  *    (`:103-105`): log and re-raise for the orchestrator's retry —
  *    and every method here is idempotent under that retry
  *    (staging + delete-then-rename promotion, same as
  *    [[Sinks.writeCsvRenamed]]).
  *
  * Scale note: this sink is bounded at 498×5 BY THE TARGET — it exists
  * for human-facing summary tables, never data movement; the repartition
  * to one file is therefore correct here and wrong everywhere else.
  */
object SheetsShaped {

  /** Sheets range bound from google_sheets.py:78-80 (rows 3-500 × A-E). */
  val MaxRows = 498
  val MaxCols = 5

  private def fs(spark: SparkSession, uri: String) =
    new org.apache.hadoop.fs.Path(uri)
      .getFileSystem(spark.sessionState.newHadoopConf())

  /** K3: full-replace upload of a bounded summary table into a tab.
    * The input is typically the tail of an expensive pipeline, so it is
    * pinned for the duration: the row-bound check and the write are two
    * actions over ONE computation, not two runs of the whole plan
    * (reviewer finding).
    */
  def upload(df: DataFrame, baseUri: String, tab: String): Unit = {
    val nCols = df.columns.length
    require(nCols <= MaxCols,
      s"tab '$tab': $nCols columns exceed the $MaxCols-column Sheets range")
    val pinned = df.persist()
    try {
      val n = pinned.count()
      require(n <= MaxRows,
        s"tab '$tab': $n rows exceed the $MaxRows-row Sheets range")
      uploadPinned(pinned, baseUri, tab)
    } finally pinned.unpersist(false)
  }

  private def uploadPinned(df: DataFrame, baseUri: String, tab: String): Unit = {
    val staging = s"$baseUri/_staging_$tab"
    df.coalesce(1).write
      .option("header", true).option("emptyValue", "")
      .mode(SaveMode.Overwrite).csv(staging)
    val hfs = fs(df.sparkSession, baseUri)
    val stagingPath = new org.apache.hadoop.fs.Path(staging)
    val part = hfs.listStatus(stagingPath).map(_.getPath)
      .find(_.getName.startsWith("part-"))
      .getOrElse(throw new java.io.IOException(s"no part file staged for tab '$tab'"))
    val dest = new org.apache.hadoop.fs.Path(baseUri, s"$tab.csv")
    hfs.delete(dest, false)
    if (!hfs.rename(part, dest))
      throw new java.io.IOException(s"failed to promote $part to $dest")
    hfs.delete(stagingPath, true)
  }

  /** K4: formula refresh — a Spark no-op by design (lazy evaluation
    * recomputes derived values; there is no stored formula to poke).
    * Kept on the surface so a caller porting from the reference finds
    * the operation where they expect it.
    */
  def refreshFormulas(spark: SparkSession, baseUri: String, tab: String): Unit = ()

  /** K5: values-only range copy — rows 3-500 × columns A-E of the
    * source tab, materialized into the destination tab. offset(1)
    * skips the post-header filler row the reference's range starts
    * after; the CSV header row itself is not data.
    */
  def rangeCopyValues(spark: SparkSession, baseUri: String,
                      srcTab: String, destTab: String): Unit = {
    val src = spark.read.option("header", true)
      .csv(s"$baseUri/$srcTab.csv")
    val sliced = src
      .select(src.columns.take(MaxCols).toIndexedSeq.map(org.apache.spark.sql.functions.col): _*)
      .offset(1)
      .limit(MaxRows)
    upload(sliced, baseUri, destTab)
  }
}
