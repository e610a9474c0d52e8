package graft.core

import org.apache.spark.sql.types.{IntegerType, LongType, StructField, StructType}

/** A dictionary-encoded RDF triple.
  *
  * Capability parity with the reference's fixed 3-column integer schema
  * (`/root/reference/src/main/java/com/github/nkoutroumanis/PartitionQueryingSubject.java:118-121`),
  * re-expressed as a case class so `Dataset[Triple]` gets a Catalyst encoder.
  * Columns keep the reference's names (`Subject`, `Predicate`, `Object`) so
  * its SQL runs verbatim against our temp views.
  */
final case class Triple(Subject: Int, Predicate: Int, Object: Int)

/** Wide-id triple for 100 TB vocabularies (SURVEY §1.2): same column names
  * and semantics, 64-bit id space. Every layout/engine entry point takes a
  * DataFrame and is type-agnostic, so the two widths share one API — see
  * LongTripleSpec for the reference Q1 shape running on this schema.
  */
final case class TripleL(Subject: Long, Predicate: Long, Object: Long)

object TripleSchema {
  val subject = "Subject"
  val predicate = "Predicate"
  val objekt = "Object"
  /** 4th column of a QUAD store (named graphs): the encoded graph id. */
  val graph = "Graph"

  /** Reference-parity schema: three nullable IntegerType columns. */
  val schema: StructType = StructType(Seq(
    StructField(subject, IntegerType, nullable = true),
    StructField(predicate, IntegerType, nullable = true),
    StructField(objekt, IntegerType, nullable = true),
  ))

  /** 64-bit variant of [[schema]] — the id width a 100 TB vocabulary needs
    * (int ids overflow at sf ≈ 300 with the bridge's offsets,
    * [[graft.sources.RdfBridge]]).
    */
  val schemaLong: StructType = StructType(Seq(
    StructField(subject, LongType, nullable = true),
    StructField(predicate, LongType, nullable = true),
    StructField(objekt, LongType, nullable = true),
  ))

  /** ID 0 is reserved: the SPARQL translator encodes unbound variables as 0
    * (reference `MyOpVisitorBase.java:71-78`); the dictionary must never
    * assign it to a real term.
    */
  val VariableSentinel: Int = 0
}
