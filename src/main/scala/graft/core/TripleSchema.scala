package graft.core

import org.apache.spark.sql.types.{IntegerType, StructField, StructType}

/** A dictionary-encoded RDF triple.
  *
  * Capability parity with the reference's fixed 3-column integer schema
  * (`/root/reference/src/main/java/com/github/nkoutroumanis/PartitionQueryingSubject.java:118-121`),
  * re-expressed as a case class so `Dataset[Triple]` gets a Catalyst encoder.
  * Columns keep the reference's names (`Subject`, `Predicate`, `Object`) so
  * its SQL runs verbatim against our temp views.
  */
final case class Triple(Subject: Int, Predicate: Int, Object: Int)

object TripleSchema {
  val subject = "Subject"
  val predicate = "Predicate"
  val objekt = "Object"

  /** Reference-parity schema: three nullable IntegerType columns. */
  val schema: StructType = StructType(Seq(
    StructField(subject, IntegerType, nullable = true),
    StructField(predicate, IntegerType, nullable = true),
    StructField(objekt, IntegerType, nullable = true),
  ))

  /** ID 0 is reserved: the SPARQL translator encodes unbound variables as 0
    * (reference `MyOpVisitorBase.java:71-78`); the dictionary must never
    * assign it to a real term.
    */
  val VariableSentinel: Int = 0
}
