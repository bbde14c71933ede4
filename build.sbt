ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "meshtasticairsensordatabasespark"
// Spark jars ship with the image at /opt/spark/jars (zero-egress):
unmanagedBase := file("/opt/spark/jars")
// Test-only deps resolve from the pre-warmed coursier cache; anything
// else is intentionally not resolvable (COURSIER_MODE=offline).
libraryDependencies ++= Seq(
  "org.scalatest" %% "scalatest" % "3.2.19" % Test,
  "org.scalacheck" %% "scalacheck" % "1.18.0" % Test,
)
Test / fork := true
run / fork := true
// The bench driver tails stdout for the final compact JSON line; sbt's
// "[success] Total time ..." epilogue must not land after it.
Global / showSuccess := false
Global / excludeLintKeys += showSuccess
// Spark 4.x on JDK 17 needs these when SparkSession is created outside
// spark-submit (which normally injects them). Matches
// org.apache.spark.launcher.JavaModuleOptions.defaultModuleOptions().
val jdk17AddOpens = Seq(
  "java.base/java.lang", "java.base/java.lang.invoke",
  "java.base/java.lang.reflect", "java.base/java.io",
  "java.base/java.net", "java.base/java.nio",
  "java.base/java.util", "java.base/java.util.concurrent",
  "java.base/java.util.concurrent.atomic",
  "java.base/sun.nio.ch", "java.base/sun.nio.cs",
  "java.base/sun.security.action", "java.base/sun.util.calendar",
).flatMap(p => Seq("--add-opens", s"$p=ALL-UNNAMED"))
javaOptions ++= jdk17AddOpens ++ Seq(
  "-Dspark.ui.enabled=false",
  "-Dspark.sql.session.timeZone=UTC",
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "16g")}",
)
// The 5M-event soak gets its own forked JVM: after ~40 suites the shared
// test JVM carries heap/GC/state-store residue that starves the stream's
// progress (passes isolated, flakes in-suite — r6 verdict item 1). One
// group per concern + ForkedTestGroup limit 1 ⇒ the soak always runs in
// the same fresh-JVM conditions as an isolated `testOnly`.
Test / testGrouping := {
  val tests = (Test / definedTests).value
  val opts = (Test / javaOptions).value.toVector
  val forkOpts = ForkOptions().withRunJVMOptions(opts)
  val (soak, rest0) = tests.partition(_.name.endsWith("SoakStreamSpec"))
  // Plan-shape snapshots also fork alone: the shapes are defined as the
  // COLD plans, but 40 suites of shared-session residue (a sticky
  // setCheckpointDir from CcCheckpointSpec, memoized frames) can swap a
  // checkpoint scan for an exchange in a handful of dedup plans —
  // in-suite shapes then differ from an isolated `testOnly` run (r7).
  val (plans, rest) = rest0.partition(_.name.endsWith("PlanShapeSpec"))
  Seq(
    Tests.Group("main", rest, Tests.SubProcess(forkOpts)),
    Tests.Group("soak", soak, Tests.SubProcess(forkOpts)),
    Tests.Group("plans", plans, Tests.SubProcess(forkOpts)),
  ).filter(_.tests.nonEmpty)
}
Global / concurrentRestrictions += Tags.limit(Tags.ForkedTestGroup, 1)
