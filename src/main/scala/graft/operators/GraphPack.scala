package graft.operators

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Reply-tree / transitive-chain resolution — the reference's hardest
  * operator (reference: streams/BuildReplyTreeProcessFunction.scala:28-409:
  * comments know their post, replies know only their parent comment; the
  * operator resolves reply→…→comment→post chains transitively, enforcing
  * causality — a child with ts earlier than its parent is marked invalid —
  * and drops chains that never reach a root).
  *
  * Here the batch form (SURVEY §7.4 Plan B): iterative delta-join to
  * fixpoint. The edge relation is derived deterministically from `events`:
  * 'click' events are replies whose parent is `event_id - 1 - (k mod 4)`
  * (k from props); everything else is a root. The DuckDB oracle is the
  * same fixpoint as a recursive CTE.
  *
  * Scale design (100 TB): each round joins ONLY the unresolved frontier
  * against the previous round's newly-resolved delta (semi-naive
  * evaluation — never re-joins the full resolved set); per-round persists
  * truncate lineage so plans stay bounded; rounds are bounded by the max
  * reply depth (data-bounded, ~6 here), not by data volume. Each round is
  * one shuffle on the parent key.
  */
object GraphPack {
  type Q = (SparkSession, String) => DataFrame

  private val MAX_ROUNDS = 64

  /** events annotated with parent pointer (NULL for roots). */
  private def edges(s: SparkSession, d: String): DataFrame =
    Tables.events(s, d)
      .select(col("event_id"), col("ts"),
        when(col("event_type") === "click",
          col("event_id") - 1 - (regexp_extract(col("props"), "(\\d+)", 1).cast("long") % 4))
          .otherwise(lit(null).cast("long")).as("parent_id"))

  private val sqlEdges: String =
    """SELECT event_id, ts,
      |    CASE WHEN event_type = 'click'
      |         THEN event_id - 1 - (CAST(regexp_extract(props, '(\d+)', 1) AS BIGINT) % 4)
      |         ELSE NULL END AS parent_id
      |  FROM events""".stripMargin

  /** Resolve every event to its root: (event_id, root_id, depth, causal).
    * Dangling chains (parent id below 0 or pointing at nothing) are dropped,
    * matching the reference's watermark-evicted dangling replies
    * (BuildReplyTreeProcessFunction.scala:288-317).
    */
  def resolveRoots(s: SparkSession, d: String): DataFrame = {
    // localCheckpoint (eager) after every round: materializes the round AND
    // truncates lineage — without it each round replans the whole history
    // and runtime grows combinatorially with depth. (On a production
    // cluster with executor churn, swap for reliable checkpoint() to a
    // checkpoint dir; semantics identical.)
    val e = edges(s, d).localCheckpoint()
    val replies = e.filter(col("parent_id").isNotNull)
      .select(col("event_id"), col("ts"), col("parent_id"))
      .localCheckpoint()

    // round 0: roots resolve to themselves
    var delta = e.filter(col("parent_id").isNull)
      .select(col("event_id"), col("event_id").as("root_id"),
        lit(0).as("depth"), lit(true).as("causal"), col("ts"))
      .localCheckpoint()
    var resolved = Vector(delta)
    var round = 0
    var progressing = delta.limit(1).count() > 0

    while (progressing && round < MAX_ROUNDS) {
      // semi-naive: the full reply set joins only the last delta — a reply's
      // parent lands in exactly ONE delta round, so each reply still
      // resolves exactly once and no frontier-shrinking anti-join is needed
      val next = replies.as("f")
        .join(delta.as("r"), col("f.parent_id") === col("r.event_id"))
        .select(col("f.event_id"),
          col("r.root_id"),
          (col("r.depth") + 1).as("depth"),
          (col("r.causal") && col("f.ts") >= col("r.ts")).as("causal"),
          col("f.ts"))
        .localCheckpoint()
      progressing = next.limit(1).count() > 0
      if (progressing) {
        resolved = resolved :+ next
        delta = next
      }
      round += 1
    }
    resolved.reduce(_ unionByName _)
      .select(col("event_id"), col("root_id"), col("depth"), col("causal"))
  }

  private val sqlResolve: String =
    s"""WITH RECURSIVE e AS (
       |  $sqlEdges
       |), r AS (
       |  SELECT event_id, event_id AS root_id, 0 AS depth, true AS causal, ts
       |  FROM e WHERE parent_id IS NULL
       |  UNION ALL
       |  SELECT c.event_id, r.root_id, r.depth + 1,
       |         r.causal AND c.ts >= r.ts, c.ts
       |  FROM e c JOIN r ON c.parent_id = r.event_id
       |)""".stripMargin

  val queries: Map[String, Q] = Map(
    // R1 reply-tree resolution: every event → its transitive root, chain
    // depth, and whole-chain causality flag.
    "q45_reply_tree_roots" -> ((s, d) =>
      resolveRoots(s, d).orderBy(col("event_id"))),

    // Per-root tree statistics (the shape Task 1 consumes: per-post counts
    // over the resolved tree — reference ActivePostStatisticsJob comment
    // vs reply discrimination, P1).
    "q46_reply_tree_stats" -> ((s, d) =>
      resolveRoots(s, d)
        .groupBy(col("root_id"))
        .agg((count(lit(1)) - 1).as("n_descendants"),
          max(col("depth")).as("max_depth"),
          count(when(!col("causal"), 1)).as("n_noncausal"))
        .filter(col("n_descendants") > 0)
        .orderBy(col("root_id")))
  )

  val oracle: Map[String, String] = Map(
    "q45_reply_tree_roots" ->
      s"""$sqlResolve
         |SELECT event_id, root_id, depth, causal FROM r ORDER BY event_id""".stripMargin,

    "q46_reply_tree_stats" ->
      s"""$sqlResolve
         |SELECT root_id, count(*) - 1 AS n_descendants, max(depth) AS max_depth,
         |  count(*) FILTER (NOT causal) AS n_noncausal
         |FROM r GROUP BY root_id HAVING count(*) > 1 ORDER BY root_id""".stripMargin
  )
}
