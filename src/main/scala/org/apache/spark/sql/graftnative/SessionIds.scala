package org.apache.spark.sql.graftnative

import org.apache.spark.sql.SparkSession

/** Bridge for the `private[sql]` session UUID — a stable unique key for
  * per-session caches (an identity hash could collide across sessions in
  * one JVM). Falls back to identity for non-classic sessions (e.g.
  * Connect client stubs), which never share a JVM cache anyway.
  */
object SessionIds {
  def uuid(s: SparkSession): String = s match {
    case c: org.apache.spark.sql.classic.SparkSession => c.sessionUUID
    case other => String.valueOf(System.identityHashCode(other))
  }
}
