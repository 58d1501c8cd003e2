package graft.ops

import org.apache.spark.sql.{DataFrame, functions => F}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Link-graph analytics over edge lists — the natural consumer of
  * `TextOps.extractLinks` ∘ `UrlOps.registeredDomain` (the out-domain
  * edges a crawl produces). Reference scope: the reference pipeline has
  * no graph stage; this is part of the training-data-pipeline extension
  * surface (crawl frontier prioritization, spam-domain demotion).
  *
  * Scale design: every frame that iterates is NODE/EDGE-domain sized
  * (registrable domains — millions, not the 100 TB of payloads). The
  * edge+outdegree frame is computed once and persisted across
  * iterations (the kmeans lesson: never rescan lineage inside a loop);
  * each iteration is one edges⋈ranks equi-join (both sides hash-
  * partitioned on the join key) + one dst-keyed partial-agged sum —
  * no payload ever enters the loop.
  */
object Graph {

  /** Edge-count gate for the driver-side small-graph fast path shared by
    * [[pageRank]] / [[hitsScores]] / [[topoLevels]] — the
    * `Dedup.connectedComponents` driver-union-find hybrid applied to the
    * fixed-iteration scorers: a registrable-domain graph is usually
    * MILLIONS of edges while the corpus is 100 TB, and a
    * couple-million-edge loop is orders of magnitude cheaper as driver
    * arrays than as per-round exchanges (each AQE exchange is a full
    * job). Above the gate the existing distributed loop runs unchanged.
    * Override with SPARK_GRAFT_GRAPH_DRIVER_MAX_EDGES; 0 forces the
    * distributed path. */
  private[ops] val defaultDriverMaxEdges: Long =
    sys.env.get("SPARK_GRAFT_GRAPH_DRIVER_MAX_EDGES")
      .flatMap(_.toLongOption).getOrElse(2000000L)

  /** Deterministic cross-engine ordering for collected node ids (the
    * Dedup.idOrdering convention): strings compare as UTF-8 bytes —
    * Spark's UTF8String/array_sort order — numerics naturally; nulls
    * last (array_sort's rule). Used to fix the driver loops' edge visit
    * order so float folds are run-over-run deterministic. */
  private[ops] def anyOrdering(dt: org.apache.spark.sql.types.DataType)
      : Option[Ordering[Any]] = {
    import org.apache.spark.sql.types._
    val base: Option[Ordering[Any]] = dt match {
      case LongType | IntegerType | ShortType | ByteType =>
        Some(Ordering.by((a: Any) => a.asInstanceOf[Number].longValue))
      case StringType =>
        Some(new Ordering[Any] {
          def compare(x: Any, y: Any): Int = {
            val a = x.asInstanceOf[String].getBytes("UTF-8")
            val b = y.asInstanceOf[String].getBytes("UTF-8")
            var i = 0
            val n = math.min(a.length, b.length)
            while (i < n) {
              val c = (a(i) & 0xff) - (b(i) & 0xff)
              if (c != 0) return c
              i += 1
            }
            a.length - b.length
          }
        })
      case _ => None
    }
    base.map(o => new Ordering[Any] {
      def compare(x: Any, y: Any): Int =
        if (x == null && y == null) 0
        else if (x == null) 1
        else if (y == null) -1
        else o.compare(x, y)
    })
  }

  /** Collects the (already distinct) edge frame when it passes the gate:
    * one count on the persisted frame, one bounded collect. Returns None
    * above the gate (frame stays persisted for the distributed loop). */
  private def collectIfSmall(e: DataFrame, maxEdges: Long)
      : Option[Array[(Any, Any)]] = {
    if (maxEdges <= 0) return None
    if (e.count() > maxEdges) return None
    val srcOrd = anyOrdering(e.schema.fields(0).dataType)
    val dstOrd = anyOrdering(e.schema.fields(1).dataType)
    val rows = e.collect().map(r => (r.get(0), r.get(1)))
    Some((srcOrd, dstOrd) match {
      case (Some(so), Some(do_)) =>
        rows.sortWith((a, b) => {
          val c = so.compare(a._1, b._1)
          if (c != 0) c < 0 else do_.compare(a._2, b._2) < 0
        })
      case _ => rows
    })
  }

  private def twoColDf(spark: org.apache.spark.sql.SparkSession,
                       rows: Seq[org.apache.spark.sql.Row],
                       schema: org.apache.spark.sql.types.StructType)
      : DataFrame = {
    import scala.jdk.CollectionConverters._
    spark.createDataFrame(rows.asJava, schema)
  }

  /** PageRank in the original unnormalized Google formulation:
    *
    *   rank'(v) = (1 - damping) + damping * Σ_{u→v} rank(u) / outdeg(u)
    *
    * over a fixed iteration count (no convergence test — deterministic
    * plan depth, the form large-scale implementations batch). Nodes are
    * src ∪ dst of the (deduplicated) edge list; self-loops count like
    * any edge; multi-edges collapse (`distinct`). Dangling nodes (no
    * out-edges) keep receiving teleport mass but contribute nothing —
    * the unnormalized variant lets that mass decay rather than
    * redistributing it, so ranks stay a pure function of the in-link
    * structure (documented trade-off vs the stochastic-matrix form).
    *
    * Determinism note: when every outdegree is a power of two and
    * `damping` is dyadic (e.g. 0.5), all intermediate values are dyadic
    * rationals well inside 53-bit precision, so floating-point addition
    * is EXACT and the result is bit-identical regardless of aggregation
    * order or engine — the property q155's oracle relies on. General
    * graphs get the usual last-ulp aggregation-order wobble.
    */
  def pageRank(edges: DataFrame, iterations: Int = 3,
               damping: Double = 0.5,
               srcCol: String = "src", dstCol: String = "dst",
               driverMaxEdges: Long = defaultDriverMaxEdges): DataFrame = {
    require(iterations >= 1, "iterations must be at least 1")
    require(damping > 0.0 && damping < 1.0, "damping must be in (0,1)")
    val e0 = edges.select(col(srcCol).as("src"), col(dstCol).as("dst"))
      .filter(col("src").isNotNull && col("dst").isNotNull)
      .distinct().persist(StorageLevel.MEMORY_AND_DISK)
    // small-graph driver fast path: same update expression per node —
    // rank(u)·(1/outdeg(u)) terms accumulated then (1−d) + d·mass —
    // so dyadic graphs (the determinism note above) are bit-identical
    // to the distributed loop, and non-dyadic graphs see the same
    // aggregation-order wobble both paths always had
    collectIfSmall(e0, driverMaxEdges).foreach { rows =>
      import scala.collection.mutable
      val spark = edges.sparkSession
      val srcType = e0.schema.fields(0).dataType
      e0.unpersist(false)
      val outdeg = mutable.HashMap.empty[Any, Long]
      rows.foreach { case (u, _) =>
        outdeg.update(u, outdeg.getOrElse(u, 0L) + 1L)
      }
      val w = outdeg.map { case (u, d) => (u, 1.0 / d) }
      val nodeSeq = mutable.LinkedHashSet.empty[Any]
      rows.foreach { case (u, v) => nodeSeq += u; nodeSeq += v }
      var rank = mutable.HashMap.empty[Any, Double]
      nodeSeq.foreach(n => rank.update(n, 1.0))
      for (_ <- 1 to iterations) {
        val mass = mutable.HashMap.empty[Any, Double]
        rows.foreach { case (u, v) =>
          mass.update(v, mass.getOrElse(v, 0.0) + rank(u) * w(u))
        }
        val next = mutable.HashMap.empty[Any, Double]
        nodeSeq.foreach { n =>
          next.update(n,
            (1.0 - damping) + damping * mass.getOrElse(n, 0.0))
        }
        rank = next
      }
      import org.apache.spark.sql.Row
      import org.apache.spark.sql.types.{DoubleType, StructField, StructType}
      return twoColDf(spark,
        nodeSeq.toSeq.map(n => Row(n, rank(n))),
        StructType(Seq(StructField("node", srcType),
          StructField("rank", DoubleType))))
    }
    val e = e0
    val nodes = e.select(col("src").as("node"))
      .unionAll(e.select(col("dst").as("node")))
      .distinct()
      .persist(StorageLevel.MEMORY_AND_DISK)
    // outdegree rides the edge row so the loop joins ONE persisted frame
    val weighted = e
      .join(e.groupBy("src").agg(count(lit(1)).as("outdeg")), Seq("src"))
      .select(col("src"), col("dst"),
        (lit(1.0) / col("outdeg")).as("w"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    weighted.count() // materialize once, outside the loop
    var ranks = nodes.select(col("node"), lit(1.0).as("rank"))
    for (_ <- 1 to iterations) {
      val contrib = weighted
        .join(ranks.withColumnRenamed("node", "src"), Seq("src"))
        .groupBy(col("dst").as("node"))
        .agg(sum(col("rank") * col("w")).as("in_mass"))
      val next = nodes
        .join(contrib, Seq("node"), "left")
        .select(col("node"),
          (lit(1.0 - damping) +
            lit(damping) * coalesce(col("in_mass"), lit(0.0))).as("rank"))
        .persist(StorageLevel.MEMORY_AND_DISK)
      next.count() // cut lineage growth: each iteration reads a
      ranks.unpersist(false) // materialized predecessor, not the chain
      ranks = next
    }
    weighted.unpersist(false)
    nodes.unpersist(false)
    e.unpersist(false)
    ranks
  }

  /** HITS hubs & authorities (Kleinberg 1999, JACM) — [[pageRank]]'s
    * bidirectional sibling, the hub/spam-directory signal crawl
    * prioritization reads alongside rank: per iteration auth'(v) =
    * Σ_{u→v} hub(u) then hub'(u) = Σ_{u→v} auth'(v) (the updated
    * auths — Kleinberg's I/O operation order).
    *
    * This is the EXACT-INTEGER unnormalized variant: hub₀ = 1 and every
    * subsequent score is an integer sum of integers, so the whole
    * computation is bit-portable across engines and aggregation orders
    * with no float story at all; the output ships each score plus its
    * fraction of the round's maximum (ONE IEEE division per row — the
    * portable normalization, since per-round L1/L2 normalizing would put
    * order-dependent float sums inside the loop). Scores grow like
    * (d_in·d_out)^iterations — with the default 2 (Kleinberg's ranking
    * stabilizes in a handful of rounds) any graph with degree products
    * under ~10⁹ stays far inside long range, and ANSI mode makes an
    * overflow abort loudly rather than corrupt. Multi-edges collapse;
    * nodes = src ∪ dst.
    *
    * Scale shape: the [[pageRank]] loop ledger — the distinct edge list
    * persists across rounds; each round is two edges⋈scores equi-joins +
    * two partial-agged sums over NODE/EDGE-domain frames (registrable
    * domains, never payloads); localCheckpoint per round truncates
    * lineage. Output: (node, auth, hub, auth_frac, hub_frac). */
  def hitsScores(edges: DataFrame, iterations: Int = 2,
                 srcCol: String = "src", dstCol: String = "dst",
                 driverMaxEdges: Long = defaultDriverMaxEdges)
      : DataFrame = {
    require(iterations >= 1 && iterations <= 6,
      "iterations out of the exact-integer range")
    val e = edges.select(col(srcCol).as("src"), col(dstCol).as("dst"))
      .filter(col("src").isNotNull && col("dst").isNotNull)
      .distinct().persist(StorageLevel.MEMORY_AND_DISK)
    // small-graph driver fast path: exact-integer scores, so the result
    // is bit-identical to the distributed loop by construction
    collectIfSmall(e, driverMaxEdges).foreach { rows =>
      import scala.collection.mutable
      val spark = edges.sparkSession
      val srcType = e.schema.fields(0).dataType
      e.unpersist(false)
      val nodeSeq = mutable.LinkedHashSet.empty[Any]
      rows.foreach { case (u, v) => nodeSeq += u; nodeSeq += v }
      var hub = mutable.HashMap.empty[Any, Long]
      var auth = mutable.HashMap.empty[Any, Long]
      nodeSeq.foreach { n => hub.update(n, 1L); auth.update(n, 1L) }
      for (_ <- 1 to iterations) {
        val a2 = mutable.HashMap.empty[Any, Long]
        rows.foreach { case (u, v) =>
          a2.update(v, Math.addExact(a2.getOrElse(v, 0L), hub(u)))
        }
        auth = mutable.HashMap.empty[Any, Long]
        nodeSeq.foreach(n => auth.update(n, a2.getOrElse(n, 0L)))
        val h2 = mutable.HashMap.empty[Any, Long]
        rows.foreach { case (u, v) =>
          h2.update(u, Math.addExact(h2.getOrElse(u, 0L), auth(v)))
        }
        hub = mutable.HashMap.empty[Any, Long]
        nodeSeq.foreach(n => hub.update(n, h2.getOrElse(n, 0L)))
      }
      val ma = if (nodeSeq.isEmpty) 0L else nodeSeq.map(auth).max
      val mh = if (nodeSeq.isEmpty) 0L else nodeSeq.map(hub).max
      import org.apache.spark.sql.Row
      import org.apache.spark.sql.types.{DoubleType, LongType, StructField, StructType}
      return twoColDf(spark,
        nodeSeq.toSeq.map { n =>
          Row(n, auth(n), hub(n),
            if (ma == 0L) 0.0 else auth(n).toDouble / ma.toDouble,
            if (mh == 0L) 0.0 else hub(n).toDouble / mh.toDouble)
        },
        StructType(Seq(StructField("node", srcType),
          StructField("auth", LongType), StructField("hub", LongType),
          StructField("auth_frac", DoubleType),
          StructField("hub_frac", DoubleType))))
    }
    val nodes = e.select(col("src").as("node"))
      .union(e.select(col("dst").as("node"))).distinct()
      .persist(StorageLevel.MEMORY_AND_DISK)
    nodes.count()
    var hub = nodes.withColumn("v", lit(1L)).localCheckpoint()
    var auth = hub
    for (_ <- 1 to iterations) {
      auth = nodes
        .join(e.join(hub, e("src") === hub("node"))
          .groupBy(col("dst").as("node")).agg(sum("v").as("_s")),
          Seq("node"), "left")
        .select(col("node"), coalesce(col("_s"), lit(0L)).as("v"))
        .localCheckpoint()
      hub = nodes
        .join(e.join(auth, e("dst") === auth("node"))
          .groupBy(col("src").as("node")).agg(sum("v").as("_s")),
          Seq("node"), "left")
        .select(col("node"), coalesce(col("_s"), lit(0L)).as("v"))
        .localCheckpoint()
    }
    e.unpersist(false)
    nodes.unpersist(false)
    val joined = auth.withColumnRenamed("v", "auth")
      .join(hub.withColumnRenamed("v", "hub"), "node")
    val maxes = joined.agg(max("auth").as("_ma"), max("hub").as("_mh"))
    joined.crossJoin(F.broadcast(maxes))
      .select(col("node"), col("auth"), col("hub"),
        when(col("_ma") === 0L, lit(0.0))
          .otherwise(col("auth").cast("double") / col("_ma").cast("double"))
          .as("auth_frac"),
        when(col("_mh") === 0L, lit(0.0))
          .otherwise(col("hub").cast("double") / col("_mh").cast("double"))
          .as("hub_frac"))
  }

  /** Degree statistics per node — the cheap link-graph report (spam
    * heuristics read in/out ratios before anything iterative runs):
    * one distinct edge pass, two tiny grouped counts, one full-outer
    * node join. Exact integers throughout. */
  /** DEPENDENCY-DEPTH LEVELING (topological stratification) — the
    * repo-level code-pretraining ordering step: given `src depends-on
    * dst` edges among a repo's files, level(f) = length of the longest
    * dependency chain below f (0 for leaves), so emitting files in
    * (level, id) order puts every definition before its first use — the
    * "dependencies first" context layout repo-level code models train
    * on. Runs `iterations` rounds of level(f) = 1 + max(level(deps));
    * on a DAG whose longest chain fits in `iterations` this is exact,
    * and nodes still RISING at the last round are flagged `unstable = 1`
    * (a cycle, or a chain deeper than the budget — the caller breaks
    * those ties by id and moves on; no driver-side cycle detection).
    * Nodes = src ∪ dst; multi-edges collapse.
    *
    * Scale shape: the [[pageRank]] loop ledger verbatim — the
    * deduplicated edge list persists across rounds; each round is one
    * edges⋈levels equi-join + one src-keyed partial-agged max over
    * NODE/EDGE-domain frames. Levels are small integers: exact in any
    * engine, no float story at all. */
  def topoLevels(edges: DataFrame, iterations: Int = 4,
                 srcCol: String = "src", dstCol: String = "dst",
                 driverMaxEdges: Long = defaultDriverMaxEdges)
      : DataFrame = {
    require(iterations > 0, "iterations must be positive")
    val e = edges.select(col(srcCol).as("src"), col(dstCol).as("dst"))
      .distinct().persist(StorageLevel.MEMORY_AND_DISK)
    // small-graph driver fast path: small-integer levels — exact, so
    // bit-identical to the distributed loop by construction
    collectIfSmall(e, driverMaxEdges).foreach { rows =>
      import scala.collection.mutable
      val spark = edges.sparkSession
      val srcType = e.schema.fields(0).dataType
      e.unpersist(false)
      val nodeSeq = mutable.LinkedHashSet.empty[Any]
      rows.foreach { case (u, v) => nodeSeq += u; nodeSeq += v }
      var levels = mutable.HashMap.empty[Any, Long]
      nodeSeq.foreach(n => levels.update(n, 0L))
      var prev = levels
      for (_ <- 1 to iterations) {
        prev = levels
        val up = mutable.HashMap.empty[Any, Long]
        rows.foreach { case (u, v) =>
          val cand = levels(v) + 1L
          if (cand > up.getOrElse(u, Long.MinValue)) up.update(u, cand)
        }
        levels = mutable.HashMap.empty[Any, Long]
        nodeSeq.foreach(n => levels.update(n, up.getOrElse(n, 0L)))
      }
      import org.apache.spark.sql.Row
      import org.apache.spark.sql.types.{IntegerType, LongType, StructField, StructType}
      return twoColDf(spark,
        nodeSeq.toSeq.map { n =>
          Row(n, levels(n), if (levels(n) > prev(n)) 1 else 0)
        },
        StructType(Seq(StructField("node", srcType),
          StructField("level", LongType),
          StructField("unstable", IntegerType))))
    }
    val nodes = e.select(col("src").as("node"))
      .union(e.select(col("dst").as("node"))).distinct()
      .persist(StorageLevel.MEMORY_AND_DISK)
    nodes.count()
    // per-round localCheckpoint (the connectedComponents loop idiom):
    // each round's frame is lineage-free, so no exponential re-derive
    // and no manual per-round persist bookkeeping
    var levels = nodes.withColumn("level", lit(0L)).localCheckpoint()
    var prev = levels
    for (_ <- 1 to iterations) {
      prev = levels
      levels = nodes
        .join(e.join(levels, e("dst") === levels("node"))
          .groupBy(col("src").as("node"))
          .agg((max("level") + 1L).as("_up")), Seq("node"), "left")
        .select(col("node"), coalesce(col("_up"), lit(0L)).as("level"))
        .localCheckpoint()
    }
    // final + penultimate rounds are checkpointed (lineage-free), so
    // the loop inputs can go before the caller ever runs the result
    e.unpersist(false)
    nodes.unpersist(false)
    // unstable: still rising between the last two rounds
    levels
      .join(prev.withColumnRenamed("level", "_prev"), "node")
      .select(col("node"), col("level"),
        (col("level") > col("_prev")).cast("int").as("unstable"))
  }

  def degreeStats(edges: DataFrame, srcCol: String = "src",
                  dstCol: String = "dst"): DataFrame = {
    val e = edges.select(col(srcCol).as("src"), col(dstCol).as("dst"))
      .filter(col("src").isNotNull && col("dst").isNotNull)
      .distinct()
    val out = e.groupBy(col("src").as("node"))
      .agg(count(lit(1)).as("out_degree"))
    val in = e.groupBy(col("dst").as("node"))
      .agg(count(lit(1)).as("in_degree"))
    out.join(in, Seq("node"), "full_outer")
      .select(col("node"),
        coalesce(col("out_degree"), lit(0L)).as("out_degree"),
        coalesce(col("in_degree"), lit(0L)).as("in_degree"))
  }
}
