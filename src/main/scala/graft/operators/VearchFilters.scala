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

  /** `arrayFields`: fields with stringArray semantics (IN → overlap).
    * `dateFields`: fields with vearch date semantics — range values that
    * are numbers are epoch SECONDS scaled ×1e9 to UnixNano, strings are
    * parsed as dates/timestamps (doc_query.go:1033-1045); the column
    * itself stores the ns-epoch long (schema.Space date mapping).
    */
  def parse(
      json: String,
      arrayFields: Set[String] = Set.empty,
      dateFields: Set[String] = Set.empty): Column =
    compile(JsonMethods.parse(json), arrayFields, dateFields)

  /** vearch date-value coercion → UnixNano (doc_query.go:1033-1045). */
  private[operators] def toUnixNano(v: Any): Long = v match {
    case l: Long   => l * 1000000000L // epoch seconds ×1e9
    case d: Double => (d * 1e9).toLong
    case s: String =>
      val inst =
        try java.time.Instant.parse(s)
        catch {
          case _: Exception =>
            try java.time.LocalDateTime.parse(s.replace(' ', 'T'))
              .toInstant(java.time.ZoneOffset.UTC)
            catch {
              case _: Exception =>
                java.time.LocalDate.parse(s).atStartOfDay
                  .toInstant(java.time.ZoneOffset.UTC)
            }
        }
      inst.getEpochSecond * 1000000000L + inst.getNano
    case other => throw new IllegalArgumentException(s"bad date value: $other")
  }

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

  private def condition(
      c: JValue, arrayFields: Set[String], dateFields: Set[String]): Column = {
    val JString(op) = (c \ "operator"): @unchecked
    val JString(field) = (c \ "field"): @unchecked
    val value = c \ "value"
    val f = col(field)
    def rangeLit(v: JValue): Column =
      if (dateFields.contains(field)) lit(toUnixNano(literal(v)))
      else lit(literal(v))
    op.toUpperCase match {
      case ">"          => f > rangeLit(value)
      case ">="         => f >= rangeLit(value)
      case "<"          => f < rangeLit(value)
      case "<="         => f <= rangeLit(value)
      case "="          => f === rangeLit(value)
      case "!=" | "<>"  => f =!= rangeLit(value)
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

  private def compile(
      j: JValue, arrayFields: Set[String], dateFields: Set[String]): Column = {
    val combine = (j \ "operator") match {
      case JString(op) if op.equalsIgnoreCase("OR")  => (a: Column, b: Column) => a || b
      case JString(op) if op.equalsIgnoreCase("AND") => (a: Column, b: Column) => a && b
      // absent operator defaults to AND; an UNKNOWN one must fail loud —
      // a typo ("ORR", "NOT") silently compiling to AND returns
      // confidently wrong results (condition-level ops already throw)
      case JNothing | JNull => (a: Column, b: Column) => a && b
      case JString(other) =>
        throw new IllegalArgumentException(s"unsupported logical operator: $other")
      case other =>
        throw new IllegalArgumentException(s"bad logical operator: $other")
    }
    (j \ "conditions") match {
      case JArray(cs) if cs.nonEmpty =>
        cs.map(condition(_, arrayFields, dateFields)).reduceLeft(combine)
      case _ => lit(true)
    }
  }
}
