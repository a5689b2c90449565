package graft.engine

import graft.engine.Ckpt.CkptOps

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Streaming graph partitioning (SURVEY.md §0.1): greedy HDRF-style edge
  * assignment (High-Degree Replicated First — Petroni et al., CIKM 2015),
  * the vertex-cut partitioner the Flink streaming-GNN line of work uses to
  * place edge streams across workers (`/root/reference/README.md:1-2`).
  *
  * The kernel is inherently SEQUENTIAL — each assignment depends on every
  * prior one through partial degrees, replica sets, and partition loads.
  * That is also how it deploys at 100 TB: one greedy instance per ingest
  * stream shard, each folding its own shard's edge order (the paper's
  * multi-loader setup relaxes degree-table freshness across instances).
  * The contract query runs ONE instance over a deterministically ordered
  * bounded prefix of the co-purchase edge stream, which pins the exact
  * greedy rule cross-engine: the DuckDB oracle replays the same fold as a
  * recursive CTE over list-typed state (sizes, replica set, degree table).
  *
  * Scoring (λ tuned so balance competes with replication, per the paper):
  *   θ(u)   = d(u) / (d(u) + d(v))          — partial-degree fraction
  *   g(u,p) = 2 − θ(u)  if u replicated on p else 0
  *   bal(p) = λ · (maxsize − size(p)) / (ε + maxsize − minsize)
  *   score  = (g(u,p) + g(v,p)) + bal(p);  argmax, lowest p wins ties.
  * High-degree vertices get the LOWER g bonus, so the partitioner prefers
  * cutting (replicating) them — the heavy tail carries the replication
  * budget, which is what bounds the replication factor on power-law
  * graphs.
  */
object PartitionOps {

  /** Number of target partitions for the contract query. */
  val HdrfK = 4

  /** Oracle-checked prefix length (the recursive-CTE replay is O(steps ×
    * state size); the full-stream behavior is covered by the scale
    * property test in Round7Spec). */
  val HdrfEdges = 1000

  /** Balance weight λ = 1 (the paper's default). Measured on the sf0.01
    * co-purchase stream (round-5 notes): k=8 gives partition sizes within
    * max−min = 10 of each other over 59k edges at replication factor
    * 4.92, vs 7.82 for a random edge-hash cut — λ=1 already balances on
    * real streams because new-vertex edges (score 0 everywhere) fall to
    * the balance term. Larger λ (e.g. 4) drives RF ABOVE the hash cut by
    * scattering replicated vertices round-robin. */
  val HdrfLambda = 1.0

  /** Balance denominator ε. */
  val HdrfEps = 1.0

  /** Sequential greedy HDRF fold. Double arithmetic is kept in EXACTLY
    * the order the DuckDB oracle uses (θ division, 2−θ, g-sum, then
    * + λ·balance) so the argmax — including float ties broken by lowest
    * partition index — picks the same partition in both engines. */
  def hdrfAssign(edges: Iterator[(Long, Long)], k: Int): (Array[Long], Array[Long]) = {
    val deg = scala.collection.mutable.HashMap.empty[Long, Long]
    val reps = scala.collection.mutable.HashMap.empty[Long, java.util.BitSet]
    val sizes = new Array[Long](k)
    edges.foreach { case (u, v) =>
      val du = deg.getOrElse(u, 0L) + 1; deg(u) = du
      val dv = deg.getOrElse(v, 0L) + 1; deg(v) = dv
      val repU = reps.getOrElseUpdate(u, new java.util.BitSet(k))
      val repV = reps.getOrElseUpdate(v, new java.util.BitSet(k))
      val maxS = sizes.max; val minS = sizes.min
      var p = 0; var best = 0; var bestScore = Double.NegativeInfinity
      while (p < k) {
        val gu = if (repU.get(p)) 2 - du.toDouble / (du + dv) else 0.0
        val gv = if (repV.get(p)) 2 - dv.toDouble / (du + dv) else 0.0
        val score = (gu + gv) +
          HdrfLambda * ((maxS - sizes(p)) / (HdrfEps + (maxS - minS)))
        if (score > bestScore) { best = p; bestScore = score }
        p += 1
      }
      sizes(best) += 1
      repU.set(best); repV.set(best)
    }
    val replicas = Array.tabulate(k)(p => reps.valuesIterator.count(_.get(p)).toLong)
    (sizes, replicas)
  }

  /** Driver-contract query: one greedy instance over the first
    * `HdrfEdges` co-purchase edges in (src, dst) order; customer and part
    * key spaces are disjoint-encoded (2·src / 2·dst+1). Output is the
    * per-partition edge count and vertex-replica count — the two numbers
    * a partitioner is judged on (balance and replication factor). */
  def q_graph_partition_hdrf(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val k = HdrfK
    GraphOps.edges(s, dir)
      .orderBy(col("src"), col("dst")).limit(HdrfEdges)
      .select((col("src") * 2).as("u"), (col("dst") * 2 + 1).as("v"))
      .as[(Long, Long)]
      .repartition(1).sortWithinPartitions("u", "v")
      .mapPartitions { it =>
        val (sizes, replicas) = hdrfAssign(it, k)
        (0 until k).iterator.map(p => (p, sizes(p), replicas(p)))
      }
      .toDF("partition", "n_edges", "n_replicas")
      .orderBy("partition")
  }

  /** 2D grid side for the hash-partitioning comparison (total parts =
    * Grid² = 16, equal for both strategies). */
  val Grid = 4

  /** STATELESS edge-partitioning accounting (round 10) — 1D source-hash
    * vs 2D grid (the GraphX EdgePartition2D / "grid" vertex-cut,
    * Gonzalez et al. OSDI 2012 §5.1): edge (u,v) lands in h(u) mod 16
    * (1D) or cell (h(u) mod 4, h(v) mod 4) (2D). The 2D bound: a vertex
    * replicates into at most one grid ROW (as source) + one COLUMN (as
    * destination) = O(2·√P) replicas, vs O(P) for the 1D cut's
    * destination side. Unlike HDRF's sequential greedy, both are pure
    * hash functions — embarrassingly parallel at any scale, which is
    * exactly the trade this query quantifies: per strategy, edge-load
    * balance (max/min over NON-EMPTY parts) and the vertex replication
    * factor. md5-derived hashes so the assignment is cross-engine
    * exact; all-integer accounting, one round-6 display division. */
  def q_graph_partition_2d(s: SparkSession, dir: String): DataFrame = {
    val e = GraphOps.edges(s, dir)
      .select((col("src") * 2).as("u"), (col("dst") * 2 + 1).as("v"))
    val hu = pmod(Dsl.md5Hash60(concat(lit("p2:"), col("u").cast("string"))), lit(Grid.toLong))
    val hv = pmod(Dsl.md5Hash60(concat(lit("p2:"), col("v").cast("string"))), lit(Grid.toLong))
    val h1 = pmod(Dsl.md5Hash60(concat(lit("p1:"), col("u").cast("string"))),
      lit((Grid * Grid).toLong))
    val asg = e.select(col("u"), col("v"), h1.as("p1"),
      (hu * Grid + hv).as("p2")).ckpt()
    def account(pcol: String, name: String): DataFrame = {
      val loads = asg.groupBy(col(pcol).as("p")).agg(count(lit(1)).as("load"))
        .agg(sum(col("load")).as("n_edges"), max(col("load")).as("max_load"),
          min(col("load")).as("min_load"))
      val reps = asg.select(col("u").as("x"), col(pcol).as("p"))
        .union(asg.select(col("v").as("x"), col(pcol).as("p")))
        .distinct().groupBy(col("x")).agg(count(lit(1)).as("r"))
        .agg(count(lit(1)).as("n_vertices"), sum(col("r")).as("sum_replicas"))
      loads.crossJoin(reps).select(lit(name).as("strategy"), col("n_edges"),
        col("max_load"), col("min_load"), col("n_vertices"), col("sum_replicas"),
        round(col("sum_replicas").cast("double") / col("n_vertices").cast("double"), 6)
          .as("repl_factor"))
    }
    account("p1", "1d_hash").unionByName(account("p2", "2d_grid"))
      .orderBy("strategy")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_graph_partition_2d" -> q_graph_partition_2d _,
    "q_graph_partition_hdrf" -> q_graph_partition_hdrf _
  )
}
