package org.apache.spark.graft

import org.apache.spark.unsafe.types.UTF8String

/** Narrow bridge to `private[spark]` core internals a compat expression
  * genuinely needs (the SqlShims idiom — a one-object package escape
  * hatch, not a fork). */
object CoreShims {

  /** The task-local input file path (what input_file_name() reads) —
    * InputFileBlockHolder is private[spark]. */
  def inputFilePath: UTF8String =
    org.apache.spark.rdd.InputFileBlockHolder.getInputFilePath
}
