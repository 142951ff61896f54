package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Shared local SparkSession for all suites (one JVM-wide session keeps
  * `sbt test` fast; suites must not stop() it).
  *
  * Teardown-safe: a fatal error on a scheduler/RPC thread stops the
  * SparkContext (DAGScheduler's event loop calls stop() on any
  * uncaught error), which under a plain `lazy val` would poison every
  * remaining suite in the JVM — observed once in a driver run as a
  * single "Job cancelled because SparkContext was shut down" failure
  * in StreamScalingSpec. The accessor therefore revives the session
  * when the shared context has died: one test may still fail on the
  * transient itself (see SparkSuite.withReviveRetry for the heavy
  * streaming specs), but the death can no longer cascade. */
object SparkTestBase {
  @volatile private var current: SparkSession = null

  private def build(): SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .appName("graft-tests")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }

  def spark: SparkSession = synchronized {
    if (current == null || current.sparkContext.isStopped) {
      if (current != null)
        System.err.println("[SparkTestBase] shared SparkContext was " +
          "stopped; building a fresh session")
      // getOrCreate() would hand back the stopped default session —
      // clear it first so the builder really constructs a new context.
      SparkSession.clearActiveSession()
      SparkSession.clearDefaultSession()
      current = build()
    }
    current
  }
  val sfDir = "/root/testdata/sf0.001"
}

/** Stable implicits path for FILE-scope imports (a def's `.implicits`
  * member is not a stable identifier): delegates to the CURRENT shared
  * session, so encoders keep working across a session revival. */
object TestImplicits extends org.apache.spark.sql.classic.SQLImplicits {
  override def session: org.apache.spark.sql.classic.SparkSession =
    SparkTestBase.spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
}

abstract class SparkSuite extends AnyFunSuite {
  def spark: SparkSession = SparkTestBase.spark
  def sfDir: String = SparkTestBase.sfDir

  /** Retries `body` once when it fails because the shared SparkContext
    * was shut down mid-flight (a transient the session accessor above
    * recovers from, e.g. a state-store commit race killing the
    * scheduler loop) — for long multi-query tests whose earlier work
    * would otherwise be thrown away by one context death. Any other
    * failure propagates unchanged. */
  def withReviveRetry[A](body: => A): A =
    try body
    catch {
      case e: Throwable if {
        var c: Throwable = e; var hit = false
        while (c != null && !hit) {
          hit = Option(c.getMessage)
            .exists(_.contains("SparkContext was shut down"))
          c = c.getCause
        }
        hit
      } =>
        System.err.println(s"[SparkSuite] retrying after context death: $e")
        spark // touch the accessor so the session is rebuilt before retry
        body
    }
}
