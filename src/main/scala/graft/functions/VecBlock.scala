package graft.functions

/** One block of the distributed block-nested-loop cosine join
  * ([[VectorFunctions.cosinePairsDistributed]]): a chunk id plus the
  * chunk's vectors, ids sorted ascending. Top-level and public — Spark's
  * encoder codegen (Janino) cannot reference nested or private classes.
  */
case class VecBlock(chunk: Int, ids: Array[Long], vecs: Array[Array[Float]])
