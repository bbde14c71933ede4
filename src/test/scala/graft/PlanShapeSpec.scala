package graft

import java.nio.charset.StandardCharsets.UTF_8
import java.nio.file.{Files, Paths}

/** r5: plan-shape snapshot over EVERY declared query (r4 verdict item 5).
  *
  * [[PlanLintSpec]] catches the two outright anti-patterns; this spec
  * pins the whole operator SHAPE of each query — join strategy, exchange
  * kind and count, aggregate flavor, window/generate/expand nodes — to a
  * checked-in snapshot, so an optimizer upgrade or a refactor that loses
  * a broadcast (BHJ→SMJ), adds a shuffle, or drops a partial aggregate
  * fails a test naming the query instead of only drifting the bench.
  *
  * Regenerate intentionally with GRAFT_REGEN_PLANS=1 (rewrites the
  * snapshot file, then passes); the diff then shows up in `git diff`
  * where a reviewer adjudicates it. Full formatted plans are dumped to
  * target/plans/<query>.txt on every run for human diffing. */
class PlanShapeSpec extends SparkSpec {

  val sf = "/root/testdata/sf0.001"
  private val snapshotPath = Paths.get("src/test/resources/plan_shapes.tsv")
  private val dumpDir = Paths.get("target/plans")

  /** Operator classes worth pinning; \b keeps Window from matching
    * WindowGroupLimit and Sort from matching SortMergeJoin. */
  private val ops = Seq(
    "BroadcastHashJoin", "SortMergeJoin", "ShuffledHashJoin",
    "BroadcastNestedLoopJoin", "CartesianProduct",
    "BroadcastExchange", "HashAggregate", "ObjectHashAggregate",
    "SortAggregate", "Window", "WindowGroupLimit", "WindowInPandas",
    "Generate", "Expand", "Sort")
  private val exchanges = Seq(
    "shuffle_hash" -> "Exchange hashpartitioning",
    "shuffle_range" -> "Exchange rangepartitioning",
    "shuffle_single" -> "Exchange SinglePartition")

  private def shapeOf(plan: String): String = {
    val opCounts = ops.flatMap { op =>
      val n = ("\\b" + op + "\\b").r.findAllIn(plan).size
      if (n > 0) Some(s"$op=$n") else None
    }
    val exCounts = exchanges.flatMap { case (label, pat) =>
      val n = java.util.regex.Pattern.quote(pat).r.findAllIn(plan).size
      if (n > 0) Some(s"$label=$n") else None
    }
    (opCounts ++ exCounts).mkString(" ")
  }

  test("every declared query's plan shape matches the checked-in snapshot") {
    // shapes must be the COLD plans: a dedup/text frame memoized by an
    // earlier suite in this JVM shows up as InMemoryRelation and swallows
    // its build-side exchanges, making the snapshot depend on suite order
    ext.Dedup.clearSharedCache(spark)
    spark.catalog.clearCache()
    Files.createDirectories(dumpDir)
    val current = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      val plan = fn(spark, sf).queryExecution.executedPlan.toString
      Files.write(dumpDir.resolve(s"$name.txt"), plan.getBytes(UTF_8))
      name -> shapeOf(plan)
    }
    val rendered = current.map { case (n, s) => s"$n\t$s" }.mkString("\n") + "\n"

    if (sys.env.contains("GRAFT_REGEN_PLANS")) {
      Files.createDirectories(snapshotPath.getParent)
      Files.write(snapshotPath, rendered.getBytes(UTF_8))
      info(s"snapshot regenerated: $snapshotPath (${current.size} queries)")
    } else {
      assert(Files.exists(snapshotPath),
        s"no snapshot at $snapshotPath — run once with GRAFT_REGEN_PLANS=1")
      val want = new String(Files.readAllBytes(snapshotPath), UTF_8)
        .linesIterator.filter(_.nonEmpty).map { l =>
          val Array(n, s @ _*) = l.split("\t", 2): @unchecked
          n -> s.headOption.getOrElse("")
        }.toMap
      val diffs = scala.collection.mutable.ListBuffer.empty[String]
      current.foreach { case (name, got) =>
        want.get(name) match {
          case None => diffs += s"$name: NEW query — regenerate the snapshot"
          case Some(exp) if exp != got =>
            diffs += s"$name:\n  snapshot: $exp\n  current : $got"
          case _ => ()
        }
      }
      want.keySet.diff(current.map(_._1).toSet).foreach { gone =>
        diffs += s"$gone: query removed — regenerate the snapshot"
      }
      assert(diffs.isEmpty,
        s"plan shapes drifted (GRAFT_REGEN_PLANS=1 to accept):\n${diffs.mkString("\n")}")
    }
  }
}
