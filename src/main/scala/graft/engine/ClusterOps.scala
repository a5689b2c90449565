package graft.engine

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Relational k-means (Lloyd 1982) over the embedding table — the
  * clustering step corpus curation uses for cluster-balanced sampling
  * (SemDeDup's cell structure, IVF codebook training). Expressed entirely
  * as joins + aggregations so it scales as Spark scales: the K×64
  * centroid table is broadcast (bytes), the only shuffle per iteration is
  * the per-cluster mean — partial aggregation means executors ship K×64
  * partial sums, never raw vectors.
  *
  * Cross-engine determinism (the q_llm_ann_pq recipe): distances are
  * fixed-order left-associative double folds (identical IEEE op sequence
  * in both engines); assignment is a lexicographic struct-MIN argmin with
  * cluster-id tie-break; recomputed centroid dims are round-6 means (the
  * q_udaf_vec_mean precedent — rounding sits far above double-sum
  * reassociation noise); inertia is an order-blind DECIMAL sum of round-9
  * per-point distances.
  */
object ClusterOps {

  val KmeansK = 8
  val KmeansIters = 2
  val EmbDims = 64

  private def el(j: Int) = element_at(col("embedding"), j).cast("double")

  /** Fixed-order L2²: ((x1-c1)²+ (x2-c2)²)+ … — left-assoc, matching the
    * generated oracle chain term for term. */
  private def d2Expr = (1 to EmbDims)
    .map(j => (el(j) - col(s"c$j")) * (el(j) - col(s"c$j")))
    .reduceLeft(_ + _)

  /** Argmin assignment of every vector to its nearest centroid. */
  private def assign(emb: DataFrame, cents: DataFrame): DataFrame =
    emb.crossJoin(broadcast(cents))
      .select(col("vec_id"), col("embedding"), col("cl"), d2Expr.as("d2"))
      .groupBy(col("vec_id"))
      .agg(min(struct(col("d2"), col("cl"))).as("m"))
      .select(col("vec_id"), col("m.cl").as("cl"), col("m.d2").as("d2"))

  /** 2 Lloyd iterations from deterministic seeds (vectors 0..7), then a
    * final assignment: per-cluster size + exact-decimal inertia. */
  def q_llm_kmeans(s: SparkSession, dir: String): DataFrame = {
    val emb = Tables.embeddings(s, dir)
    var cents = emb.filter(col("vec_id") < KmeansK)
      .select(col("vec_id").as("cl") +: (1 to EmbDims).map(j => el(j).as(s"c$j")): _*)
    for (_ <- 1 to KmeansIters) {
      val a = assign(emb, cents)
      val means = (1 to EmbDims).map(j => round(avg(el(j)), 6).as(s"c$j"))
      cents = a.join(emb, "vec_id")
        .groupBy(col("cl"))
        .agg(means.head, means.tail: _*)
    }
    assign(emb, cents)
      .groupBy(col("cl").as("cluster"))
      .agg(count(lit(1)).as("n_members"),
        round(sum(round(col("d2"), 9).cast("decimal(24,9)")).cast("double"), 4)
          .as("inertia"))
      .orderBy("cluster")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_llm_kmeans" -> q_llm_kmeans _
  )

  // ── DuckDB oracle (generated: 64-term distance chains, unrolled Lloyd) ──

  private def chain(embAlias: String, centAlias: String): String =
    (1 to EmbDims)
      .map(j => s"(CAST($embAlias.embedding[$j] AS DOUBLE) - $centAlias.c$j) * " +
        s"(CAST($embAlias.embedding[$j] AS DOUBLE) - $centAlias.c$j)")
      .mkString(" + ")

  private def assignCte(i: Int, centsCte: String): String =
    s"""a$i AS MATERIALIZED (SELECT vec_id, cl, d2 FROM (
       |  SELECT vec_id, cl, d2, ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY d2, cl) AS rn
       |  FROM (SELECT e.vec_id, c.cl, ${chain("e", "c")} AS d2
       |        FROM embeddings e CROSS JOIN $centsCte c))
       |WHERE rn = 1)""".stripMargin

  private def centsCte(i: Int, fromAssign: Int): String = {
    val means = (1 to EmbDims)
      .map(j => s"ROUND(AVG(CAST(e.embedding[$j] AS DOUBLE)), 6) AS c$j")
      .mkString(", ")
    s"""cents$i AS MATERIALIZED (SELECT a.cl, $means
       |  FROM a$fromAssign a JOIN embeddings e USING (vec_id) GROUP BY a.cl)""".stripMargin
  }

  val oracle: Map[String, String] = Map(
    "q_llm_kmeans" -> {
      val c0 = (1 to EmbDims).map(j => s"CAST(embedding[$j] AS DOUBLE) AS c$j").mkString(", ")
      s"""WITH cents0 AS MATERIALIZED (
         |  SELECT vec_id AS cl, $c0 FROM embeddings WHERE vec_id < $KmeansK),
         |${assignCte(1, "cents0")},
         |${centsCte(1, 1)},
         |${assignCte(2, "cents1")},
         |${centsCte(2, 2)},
         |${assignCte(3, "cents2")}
         |SELECT cl AS cluster, COUNT(*) AS n_members,
         |  ROUND(CAST(SUM(CAST(ROUND(d2, 9) AS DECIMAL(24,9))) AS DOUBLE), 4) AS inertia
         |FROM a3 GROUP BY cl ORDER BY cluster""".stripMargin
    }
  )
}
