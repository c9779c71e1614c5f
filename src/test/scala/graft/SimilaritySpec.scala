package graft

import graft.operators.Similarity

/** Similarity search on planted vectors: a scaled copy (cosine 1) must
  * surface as the top neighbor, and identical vectors must share an LSH
  * bucket and appear as a near-pair.
  */
class SimilaritySpec extends SparkTestBase {
  import spark.implicits._

  private lazy val embDir: String = {
    val dir = tempDir("sim_emb")
    def v(xs: Double*): Seq[Float] = xs.map(_.toFloat)
    val vecs: Seq[(Long, Seq[Float], Int)] = Seq(
      (0L, v(0.9, 0.1, -0.2, 0.3), 0),
      (1L, v(-0.4, 0.8, 0.1, -0.1), 0),
      (2L, v(0.2, -0.7, 0.5, 0.1), 1),
      (3L, v(1.8, 0.2, -0.4, 0.6), 1),   // = 2 × vec 0 → cosine exactly 1
      (4L, v(-0.3, -0.2, 0.9, 0.4), 2),
      (5L, v(0.5, 0.5, 0.3, -0.6), 2),
      (6L, v(-0.8, 0.3, -0.3, 0.2), 3),
      (7L, v(0.1, 0.9, 0.4, 0.5), 3),
      (8L, v(0.6, -0.5, -0.7, 0.2), 4),
      (9L, v(0.3, 0.4, 0.8, -0.5), 4),
      (10L, v(0.3, 0.4, 0.8, -0.5), 4),  // exact copy of 9
      (11L, v(-0.6, -0.6, 0.2, 0.7), 4))
    vecs.toDF("vec_id", "embedding", "label")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    // d8 joins back to the documents table (doc_id ≡ vec_id).
    vecs.map { case (id, _, _) => (id, s"doc body $id", "en", s"src${id % 3}", 11L) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/documents.parquet")
    dir
  }

  test("sim_topk: scaled copy ranks first with cosine 1000; ranks well-formed") {
    val rows = Similarity.simTopk(spark, embDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val byQuery = rows.groupBy(_._1)
    assert(byQuery.keySet === (0L until Similarity.NumQueries).toSet)
    byQuery.values.foreach { rs =>
      assert(rs.map(_._2).sorted.toSeq === (1L to Similarity.TopK)) // ranks 1..k
      assert(rs.forall(r => r._3 != r._1))                          // self excluded
      // cos_milli non-increasing in rank
      val sorted = rs.sortBy(_._2)
      assert(sorted.map(_._4).toSeq === sorted.map(_._4).sortBy(-_).toSeq)
    }
    val q0top = byQuery(0L).minBy(_._2)
    assert(q0top._3 === 3L && q0top._4 === 1000L) // the scaled copy
  }

  test("native cosine_milli expression matches the interpreted HOF formulation") {
    import org.apache.spark.sql.functions._
    val pairs = spark.read.parquet(s"$Sf/embeddings.parquet")
      .select(col("vec_id"), expr("transform(embedding, x -> cast(x as double))").as("ea"))
      .crossJoin(
        spark.read.parquet(s"$Sf/embeddings.parquet")
          .filter(col("vec_id") < 20)
          .select(col("vec_id").as("vb"), expr("transform(embedding, x -> cast(x as double))").as("eb")))
    val diff = pairs
      .select(
        expr("cosine_milli(ea, eb)").as("native"),
        expr(Similarity.hofCosMilli("ea", "eb")).as("hof"))
      .filter(col("native") =!= col("hof"))
      .count()
    assert(diff === 0L)
  }

  test("native dot_double expression matches the interpreted HOF formulation") {
    import org.apache.spark.sql.functions._
    val pairs = spark.read.parquet(s"$Sf/embeddings.parquet")
      .select(col("vec_id"), expr("transform(embedding, x -> cast(x as double))").as("ea"))
      .crossJoin(
        spark.read.parquet(s"$Sf/embeddings.parquet")
          .filter(col("vec_id") < 20)
          .select(col("vec_id").as("vb"), expr("transform(embedding, x -> cast(x as double))").as("eb")))
    val diff = pairs
      .select(
        expr("dot_double(ea, eb)").as("native"),
        expr("aggregate(zip_with(ea, eb, (x, y) -> x * y), cast(0 as double), (acc, v) -> acc + v)").as("hof"))
      .filter(col("native") =!= col("hof"))
      .count()
    assert(diff === 0L)
  }

  test("dot_double edge semantics match the HOF: length mismatch and null elements → NULL") {
    import org.apache.spark.sql.functions._
    val rows = Seq(
      ("equal", Seq[java.lang.Double](1.0, 2.0), Seq[java.lang.Double](3.0, 4.0)),
      ("shorter_b", Seq[java.lang.Double](1.0, 2.0, 3.0), Seq[java.lang.Double](1.0, 1.0)),
      ("null_elem", Seq[java.lang.Double](1.0, null), Seq[java.lang.Double](1.0, 1.0)))
      .toDF("label", "ea", "eb")
    val got = rows.select(
        col("label"),
        expr("dot_double(ea, eb)").as("native"),
        expr("aggregate(zip_with(ea, eb, (x, y) -> x * y), cast(0 as double), (acc, v) -> acc + v)").as("hof"))
      .collect()
      .map(r => r.getString(0) -> (Option(r.get(1)), Option(r.get(2)))).toMap
    assert(got("equal") === (Some(11.0), Some(11.0)))
    // zip_with pads the shorter array with null → the fold goes null; the
    // pre-fix native expression truncated to min length instead.
    assert(got("shorter_b") === (None, None))
    assert(got("null_elem") === (None, None))
  }

  test("sim_lsh_pairs: identical vectors share a bucket and pair at cosine 1000") {
    val pairs = Similarity.simLshPairs(spark, embDir).collect()
      .map(r => (r.getLong(1), r.getLong(2)) -> r.getLong(3)).toMap
    assert(pairs.get((9L, 10L)) === Some(1000L))
  }

  test("d8 embed near-dup: planted duplicates elect the lower id as canonical; singletons keep their own") {
    val rows = Similarity.d8EmbedNeardup(spark, embDir).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(rows.keySet === (0L to 11L).toSet) // every document decided
    // The exact copy (9, 10) and the scaled copy (0, 3) are cosine-1000
    // pairs in shared buckets: the higher ids must NOT survive as
    // canonical.
    assert(rows(10L)._1 >= 1L && rows(10L)._2 <= 9L)
    assert(rows(3L)._1 >= 1L && rows(3L)._2 === 0L)
    // One-hop election invariant: canonical never exceeds the doc's own id.
    rows.foreach { case (id, (_, canon)) => assert(canon <= id) }
    // A doc with zero near-dups is its own canonical.
    rows.collect { case (id, (0L, canon)) => assert(canon === id) }
  }
}
