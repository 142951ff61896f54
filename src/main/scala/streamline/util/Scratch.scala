package streamline.util

/** Scratch paths for queries that demonstrate durable write + re-read.
  * Always suffixed with the (sanitized) source dir so two harness runs
  * at different scale factors on one machine never clobber each
  * other's files (same convention as the bucketed-join scratch). */
object Scratch {
  def dir(name: String, srcDir: String): String =
    s"${sys.props("java.io.tmpdir")}/graft_${name}_" +
      srcDir.replaceAll("[^A-Za-z0-9._-]", "_")
}
