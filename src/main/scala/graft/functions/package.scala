package graft

import org.apache.spark.sql.Column

/** Public column-function surface of the engine. */
package object functions {
  /** ES 5.x routing-hash functions (see org.apache.spark.sql.graft). */
  object EsHash {
    def esMurmur3(c: Column): Column =
      org.apache.spark.sql.graft.EsHashFunctions.esMurmur3(c)
    def esShard(c: Column, numShards: Int): Column =
      org.apache.spark.sql.graft.EsHashFunctions.esShard(c, numShards)
    def esRouting(c: Column, numShards: Int): Column =
      org.apache.spark.sql.graft.EsHashFunctions.esRouting(c, numShards)
  }
}
