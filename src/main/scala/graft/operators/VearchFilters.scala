package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.json4s._
import org.json4s.jackson.JsonMethods

/** vearch filter-spec compiler: the JSON filter DSL
  * `{"operator":"AND"|"OR","conditions":[{operator, field, value}]}`
  * (reference internal/entity/request/search_doc.go:55-64, parsed in
  * internal/router/document/doc_query.go:85-163) compiled to one Catalyst
  * `Column` predicate.
  *
  * The reference's per-field interval merging (AND: collapse to [min,max],
  * doc_query.go:803-1101; OR: interval union, doc_query.go:368-801) is NOT
  * reimplemented — Catalyst's CombineFilters/constraint propagation plus
  * parquet min/max pushdown performs the same optimization on the
  * declarative tree (SURVEY §4).
  *
  * Range ops apply to numeric/date fields, IN/NOT IN to string fields
  * (doc_query.go:1123-1130, 1160-1167). For array-typed fields, IN means
  * "any element matches" — vearch stringArray term semantics
  * (internal/engine/table/inverted_index.cc) — mapped to `arrays_overlap`.
  */
object VearchFilters {

  /** `arrayFields`: fields with stringArray semantics (IN → overlap). */
  def parse(json: String, arrayFields: Set[String] = Set.empty): Column =
    compile(JsonMethods.parse(json), arrayFields)

  private def literal(v: JValue): Any = v match {
    case JInt(x)     => x.toLong
    case JLong(x)    => x
    case JDouble(x)  => x
    case JDecimal(x) => x.toDouble
    case JString(x)  => x
    case JBool(x)    => x
    case other => throw new IllegalArgumentException(s"unsupported literal: $other")
  }

  private def literals(v: JValue): Seq[Any] = v match {
    case JArray(xs) => xs.map(literal)
    case single     => Seq(literal(single))
  }

  private def condition(c: JValue, arrayFields: Set[String]): Column = {
    val JString(op) = (c \ "operator"): @unchecked
    val JString(field) = (c \ "field"): @unchecked
    val value = c \ "value"
    val f = col(field)
    op.toUpperCase match {
      case ">"          => f > lit(literal(value))
      case ">="         => f >= lit(literal(value))
      case "<"          => f < lit(literal(value))
      case "<="         => f <= lit(literal(value))
      case "="          => f === lit(literal(value))
      case "!=" | "<>"  => f =!= lit(literal(value))
      case "IN" =>
        if (arrayFields.contains(field))
          arrays_overlap(f, array(literals(value).map(lit): _*))
        else f.isin(literals(value): _*)
      case "NOT IN" =>
        if (arrayFields.contains(field))
          !arrays_overlap(f, array(literals(value).map(lit): _*))
        else !f.isin(literals(value): _*)
      case other => throw new IllegalArgumentException(s"unsupported operator: $other")
    }
  }

  private def compile(j: JValue, arrayFields: Set[String]): Column = {
    val combine = (j \ "operator") match {
      case JString(op) if op.equalsIgnoreCase("OR") => (a: Column, b: Column) => a || b
      case _ => (a: Column, b: Column) => a && b // AND is the default
    }
    (j \ "conditions") match {
      case JArray(cs) if cs.nonEmpty =>
        cs.map(condition(_, arrayFields)).reduceLeft(combine)
      case _ => lit(true)
    }
  }
}
